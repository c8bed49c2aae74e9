"""Text-analysis queries over the ``documents`` fixture (SURVEY.md §2.3;
driver-mandated LLM-pipeline surface): token counting, language-ID, quality
scoring, fingerprinting. All JVM-side built-ins (wholestage codegen) — at
100 TB these are map-only passes with full column pruning."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators import shared
from hadrodb_spark.operators.dedup import _EXACT_MOD, _EXACT_OFFSET
from hadrodb_spark.operators.relational import load


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics."""
    docs = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    tok_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        X.token_count(F.col("text")).alias("n_tokens"),
        X.distinct_token_count(F.col("text")).alias("n_uniq_tokens"),
        F.round(tok_chars.cast("double") / F.size(toks), 6).alias("avg_token_len"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + alphanumeric-regex token counts and a BPE-ish estimate
    (chars/4 heuristic — the public rule-of-thumb for English BPE)."""
    docs = load(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != ""))
    return docs.select(
        "doc_id",
        ws.cast("bigint").alias("n_ws_tokens"),
        X.token_count(F.col("text")).alias("n_re_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("bigint").alias("est_bpe_tokens"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language identification. The fixture's text is
    English-ish for every label, so deterministic stopword-rich documents
    are PLANTED per language (ids 300000+) — the oracle plants identically,
    and the hash-match verifies those are classified correctly while the
    organic docs get the tie-break default."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    planted = spark.createDataFrame(
        [
            (300000 + i, lang, " ".join(X.STOPWORDS[lang] * 3))
            for i, lang in enumerate(sorted(X.STOPWORDS))
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    base = docs.unionByName(planted)
    toks = X.tokens(F.col("text"))
    return base.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.lang_id(toks).alias("pred_lang"),
        *[X.stopword_hits(toks, l).alias(f"hits_{l}") for l in X.STOPWORDS],
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: stopword ratio + length band + alpha ratio
    (the standard cheap pre-filters for training-data curation)."""
    docs = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    n_tok = F.size(toks).cast("double")
    stop_ratio = X.stopword_hits(toks, "en").cast("double") / F.greatest(n_tok, F.lit(1.0))
    len_score = F.least(n_tok, F.lit(100.0)) / F.lit(100.0)
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    alpha_ratio = alpha_chars.cast("double") / F.greatest(F.length("text"), F.lit(1)).cast("double")
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(len_score, 6).alias("len_score"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(
            F.lit(0.4) * stop_ratio + F.lit(0.3) * len_score + F.lit(0.3) * alpha_ratio, 6
        ).alias("quality"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-text md5 fingerprint (the rolling-hash/document-signature
    primitive; md5 is the cross-engine-stable choice)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fp"),
        F.substring(X.fingerprint(F.col("text")), 1, 8).alias("fp_short"),
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level rollup per (lang, source): doc counts, char totals,
    mean quality inputs — the curation dashboard query."""
    docs = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    return (
        docs.select("lang", "source", "n_chars", F.size(toks).alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_tok").cast("bigint").alias("min_tokens"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        )
    )


def tokenize_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization categories (letters / digits / other runs
    via regexp_extract_all — the public GPT-2-style split, simplified to a
    dialect-portable pattern) with per-category counts."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+"), 0)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]")))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_pretokens"),
        alpha.cast("bigint").alias("n_alpha"),
        (F.size(toks) - alpha).cast("bigint").alias("n_numeric"),
    )


def ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams — the n-gram LM data-prep aggregation:
    explode per-doc bigram sets, count, rank with deterministic tiebreak.
    One shuffle on the bigram; counts are map-side combined."""
    docs = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    bigrams = (
        docs.withColumn("toks", toks)
        .select(F.explode(X.shingles(F.col("toks"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return bigrams.orderBy(F.col("n_docs").desc(), F.col("bigram")).limit(20)


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty — how much of a source's trigram
    vocabulary is corpus-UNIQUE (document frequency 1). High novelty
    flags fresh content worth crawling deeper; low novelty flags
    templated/boilerplate sources — the source-scoring signal next to
    dedup_rate_by_source's copy pressure.

    Scale shape: NO gram-level join. Per-doc distinct shingles explode
    once; df(gram) is one map-side-combinable count; a df==1 gram's
    owning source is recovered as min(source) over its single occurrence
    (exact by definition), so novelty-by-source is a second tiny agg
    over the vocab relation, and total-by-source a count over the same
    exploded lineage. The only join is |sources| × |sources|. The ratio
    is exact integer fixed-point (ppm via DIV), no float division.

    The exploded gram relation feeds BOTH aggregations and Catalyst
    shares no common subplans, so it is persisted once via the shared
    registry (the tfidf/dedup-signature discipline) — without it every
    run tokenizes and shingles the whole corpus twice."""
    from hadrodb_spark.operators import shared

    docs = load(spark, sf_dir, "documents")
    grams = shared.shared_persist(
        ("ngram_novelty_grams", spark.sparkContext.applicationId, sf_dir),
        lambda: docs.select(
            "source",
            F.explode(X.shingles(X.tokens(F.col("text")), 3)).alias("g"),
        ),
    )
    vocab = grams.groupBy("g").agg(
        F.count(F.lit(1)).alias("df"),
        F.min("source").alias("only_source"),
    )
    novel = (
        vocab.filter(F.col("df") == 1)
        .groupBy(F.col("only_source").alias("source"))
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    total = grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_grams")
    )
    return (
        total.join(novel, "source", "left")
        .select(
            "source",
            F.col("total_grams").cast("bigint").alias("total_grams"),
            F.coalesce("novel_grams", F.lit(0)).cast("bigint").alias("novel_grams"),
            F.expr(
                "CAST((1000000 * COALESCE(novel_grams, 0)) DIV total_grams AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("source")
    )


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate pressure — which sources produce dup-heavy
    content (the signal that drives source-level recrawl/dedup budget):
    per source, doc count, docs sharing a canonical fingerprint with ≥1
    other doc (corpus-wide, so cross-source copies count for both), and
    the dup rate as one exact-count division. Exact copies are planted
    (the dedup_exact scheme) so the relation is non-vacuous. One shuffle
    on the fingerprint for the frequency window, one on source for the
    rollup."""
    from hadrodb_spark.operators.dedup import _with_exact_copies

    base = _with_exact_copies(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    docs = base.join(
        src, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("source", F.lit("planted")).alias("source"),
        X.fingerprint(F.col("text")).alias("fp"),
    )
    from pyspark.sql.window import Window

    n_fp = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    flagged = docs.select(
        "source", (n_fp > 1).cast("int").alias("is_dup")
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_dup_docs"),
        F.round(
            F.sum("is_dup").cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


# Cohen's kappa derived stats — ONE shared SQL text (used via F.expr on
# the Spark side, verbatim in DuckDB) so every double division runs in
# the identical op order; the inputs are exact integer counts.
_KAPPA_PO = "(CAST(n11 + n00 AS DOUBLE) / n)"
_KAPPA_PE = (
    "((CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)"
    " + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n))"
)


def classifier_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-gate agreement (Cohen's kappa) between two cheap curation
    classifiers — the evaluation step before trusting a filter ensemble:
    gate A = document long enough (≥ 40 tokens), gate B = English-like
    (stopword ratio ≥ 0.10, tested as the INTEGER cross-multiplication
    ``hits * 10 ≥ n_tokens`` so no float ever enters a decision). The
    2×2 confusion counts are exact; po/pe/kappa are fixed-op-order
    divisions of those counts, rounded at output. Map-only gates + one
    global aggregate — scales trivially."""
    docs = load(spark, sf_dir, "documents").select("text")
    toks = X.tokens(F.col("text"))
    gated = docs.select(
        (X.token_count(F.col("text")) >= 40).alias("g1"),
        (X.stopword_hits(toks, "en") * 10 >= X.token_count(F.col("text"))).alias(
            "g2"
        ),
    )
    counts = gated.agg(
        F.count(F.when(F.col("g1") & F.col("g2"), 1)).alias("n11"),
        F.count(F.when(F.col("g1") & ~F.col("g2"), 1)).alias("n10"),
        F.count(F.when(~F.col("g1") & F.col("g2"), 1)).alias("n01"),
        F.count(F.when(~F.col("g1") & ~F.col("g2"), 1)).alias("n00"),
        F.count(F.lit(1)).alias("n"),
    )
    return counts.select(
        F.col("n11").cast("bigint").alias("n11"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n00").cast("bigint").alias("n00"),
        F.expr(f"ROUND({_KAPPA_PO}, 6)").alias("po"),
        F.expr(f"ROUND({_KAPPA_PE}, 6)").alias("pe"),
        F.expr(
            f"ROUND(({_KAPPA_PO} - {_KAPPA_PE}) / (1 - {_KAPPA_PE}), 6)"
        ).alias("kappa"),
    )


_VOCAB_K = 500


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage — the standard sizing metric when
    fixing a vocab before training: what fraction of all corpus token
    OCCURRENCES the top-K most frequent terms cover, plus OOV mass and
    full vocab size. One explode + one term aggregation; the rank is a
    window over the POST-aggregation vocab relation (tiny — |vocab|, not
    |tokens|), and the coverage division happens once on two exact bigint
    sums. The single-partition rank window is fine at any corpus size
    because vocabulary grows sub-linearly (Heaps' law); if it ever isn't,
    the swap is a TakeOrdered top-K + broadcast anti-join."""
    docs = load(spark, sf_dir, "documents").select("text")
    tc = (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql.window import Window

    ranked = tc.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("cnt"), F.col("term")))
    )
    agg = ranked.agg(
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("rk") <= _VOCAB_K, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("covered_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    return agg.select(
        "total_tokens",
        "covered_tokens",
        "vocab_size",
        F.round(
            F.col("covered_tokens").cast("double") / F.col("total_tokens"), 6
        ).alias("coverage_rate"),
    )


_TOKS = X.sql_tokens("text")

ORACLE: dict[str, str] = {
    "dedup_rate_by_source": f"""
        WITH base AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {_EXACT_OFFSET} AS doc_id, text
          FROM documents WHERE doc_id % {_EXACT_MOD} = 0
        ),
        docs AS (
          SELECT b.doc_id,
                 COALESCE(d.source, 'planted') AS source,
                 {X.sql_fingerprint('b.text')} AS fp
          FROM base b LEFT JOIN documents d ON b.doc_id = d.doc_id
        ),
        flagged AS (
          SELECT source,
                 CASE WHEN COUNT(*) OVER (PARTITION BY fp) > 1
                      THEN 1 ELSE 0 END AS is_dup
          FROM docs
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
               ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate
        FROM flagged GROUP BY source
    """,
    "classifier_agreement_kappa": f"""
        WITH gated AS (
          SELECT CAST(len({X.sql_tokens('text')}) AS BIGINT) >= 40 AS g1,
                 {X.sql_stopword_hits(X.sql_tokens('text'), 'en')} * 10
                   >= CAST(len({X.sql_tokens('text')}) AS BIGINT) AS g2
          FROM documents
        ),
        counts AS (
          SELECT CAST(COUNT(CASE WHEN g1 AND g2 THEN 1 END) AS BIGINT) AS n11,
                 CAST(COUNT(CASE WHEN g1 AND NOT g2 THEN 1 END) AS BIGINT) AS n10,
                 CAST(COUNT(CASE WHEN NOT g1 AND g2 THEN 1 END) AS BIGINT) AS n01,
                 CAST(COUNT(CASE WHEN NOT g1 AND NOT g2 THEN 1 END) AS BIGINT) AS n00,
                 COUNT(*) AS n
          FROM gated
        )
        SELECT n11, n10, n01, n00,
               ROUND({_KAPPA_PO}, 6) AS po,
               ROUND({_KAPPA_PE}, 6) AS pe,
               ROUND(({_KAPPA_PO} - {_KAPPA_PE}) / (1 - {_KAPPA_PE}), 6) AS kappa
        FROM counts
    """,
    "vocab_coverage": f"""
        WITH tc AS (
          SELECT term, COUNT(*) AS cnt
          FROM (SELECT UNNEST({_TOKS}) AS term FROM documents)
          GROUP BY term
        ),
        ranked AS (
          SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk
          FROM tc
        ),
        agg AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
                 CAST(SUM(CASE WHEN rk <= {_VOCAB_K} THEN cnt ELSE 0 END)
                   AS BIGINT) AS covered_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size
          FROM ranked
        )
        SELECT total_tokens, covered_tokens, vocab_size,
               ROUND(CAST(covered_tokens AS DOUBLE) / total_tokens, 6)
                 AS coverage_rate
        FROM agg
    """,
    "tokenize_categories": """
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_pretokens,
               CAST(len(list_filter(tk, t -> regexp_matches(t, '^[a-z]'))) AS BIGINT)
                 AS n_alpha,
               CAST(len(tk) - len(list_filter(tk, t -> regexp_matches(t, '^[a-z]')))
                 AS BIGINT) AS n_numeric
        FROM (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+|[0-9]+') AS tk
          FROM documents WHERE doc_id < 300
        )
    """,
    "ngram_novelty": f"""
        WITH grams AS (
          SELECT source, UNNEST({X.sql_shingles(_TOKS, 3)}) AS g
          FROM documents
        ),
        vocab AS (
          SELECT g, COUNT(*) AS df, MIN(source) AS only_source
          FROM grams GROUP BY g
        ),
        novel AS (
          SELECT only_source AS source, COUNT(*) AS novel_grams
          FROM vocab WHERE df = 1 GROUP BY only_source
        ),
        total AS (
          SELECT source, COUNT(*) AS total_grams FROM grams GROUP BY source
        )
        SELECT t.source,
               CAST(t.total_grams AS BIGINT) AS total_grams,
               CAST(COALESCE(n.novel_grams, 0) AS BIGINT) AS novel_grams,
               CAST((1000000 * COALESCE(n.novel_grams, 0)) // t.total_grams
                    AS BIGINT) AS novelty_ppm
        FROM total t LEFT JOIN novel n ON t.source = n.source
        ORDER BY t.source
    """,
    "ngram_freq": f"""
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM (
          SELECT UNNEST({X.sql_shingles(_TOKS, 2)}) AS bigram FROM documents
        )
        GROUP BY bigram
        ORDER BY n_docs DESC, bigram
        LIMIT 20
    """,
    "corpus_stats": f"""
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MIN(len({_TOKS})) AS BIGINT) AS min_tokens,
               CAST(MAX(len({_TOKS})) AS BIGINT) AS max_tokens,
               CAST(SUM(len({_TOKS})) AS DOUBLE) / COUNT(*) AS avg_tokens
        FROM documents GROUP BY lang, source
    """,
    "text_stats": f"""
        SELECT doc_id, lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_uniq_tokens,
               ROUND(CAST(list_sum(list_transform({_TOKS}, x -> length(x))) AS DOUBLE)
                     / len({_TOKS}), 6) AS avg_token_len
        FROM documents
    """,
    "token_count": f"""
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
                    AS BIGINT) AS n_ws_tokens,
               CAST(len({_TOKS}) AS BIGINT) AS n_re_tokens,
               CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
        FROM documents
    """,
    "lang_id": f"""
        WITH documents AS (
          SELECT doc_id, lang, text FROM main.documents
          UNION ALL
          SELECT 300000 AS doc_id, 'de' AS lang, 'der die das und ist nicht ein mit von zu der die das und ist nicht ein mit von zu der die das und ist nicht ein mit von zu' AS text UNION ALL SELECT 300001 AS doc_id, 'en' AS lang, 'the and of to in is that it for was the and of to in is that it for was the and of to in is that it for was' AS text UNION ALL SELECT 300002 AS doc_id, 'es' AS lang, 'el la de que y en un es no por el la de que y en un es no por el la de que y en un es no por' AS text UNION ALL SELECT 300003 AS doc_id, 'fr' AS lang, 'le la et les des un est pas que dans le la et les des un est pas que dans le la et les des un est pas que dans' AS text
        )
        SELECT doc_id, lang AS labeled_lang,
               CASE WHEN {X.sql_stopword_hits(_TOKS, 'en')} >= {X.sql_stopword_hits(_TOKS, 'de')}
                     AND {X.sql_stopword_hits(_TOKS, 'en')} >= {X.sql_stopword_hits(_TOKS, 'es')}
                     AND {X.sql_stopword_hits(_TOKS, 'en')} >= {X.sql_stopword_hits(_TOKS, 'fr')} THEN 'en'
                    WHEN {X.sql_stopword_hits(_TOKS, 'de')} >= {X.sql_stopword_hits(_TOKS, 'es')}
                     AND {X.sql_stopword_hits(_TOKS, 'de')} >= {X.sql_stopword_hits(_TOKS, 'fr')} THEN 'de'
                    WHEN {X.sql_stopword_hits(_TOKS, 'es')} >= {X.sql_stopword_hits(_TOKS, 'fr')} THEN 'es'
                    ELSE 'fr' END AS pred_lang,
               CAST({X.sql_stopword_hits(_TOKS, 'en')} AS BIGINT) AS hits_en,
               CAST({X.sql_stopword_hits(_TOKS, 'de')} AS BIGINT) AS hits_de,
               CAST({X.sql_stopword_hits(_TOKS, 'es')} AS BIGINT) AS hits_es,
               CAST({X.sql_stopword_hits(_TOKS, 'fr')} AS BIGINT) AS hits_fr
        FROM documents
    """,
    "quality_score": f"""
        SELECT doc_id,
               ROUND(CAST({X.sql_stopword_hits(_TOKS, 'en')} AS DOUBLE)
                     / GREATEST(CAST(len({_TOKS}) AS DOUBLE), 1.0), 6) AS stop_ratio,
               ROUND(LEAST(CAST(len({_TOKS}) AS DOUBLE), 100.0) / 100.0, 6) AS len_score,
               ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                     / CAST(GREATEST(length(text), 1) AS DOUBLE), 6) AS alpha_ratio,
               ROUND(0.4 * (CAST({X.sql_stopword_hits(_TOKS, 'en')} AS DOUBLE)
                            / GREATEST(CAST(len({_TOKS}) AS DOUBLE), 1.0))
                   + 0.3 * (LEAST(CAST(len({_TOKS}) AS DOUBLE), 100.0) / 100.0)
                   + 0.3 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                            / CAST(GREATEST(length(text), 1) AS DOUBLE)), 6) AS quality
        FROM documents
    """,
    "doc_fingerprint": f"""
        SELECT doc_id,
               {X.sql_fingerprint('text')} AS fp,
               substring({X.sql_fingerprint('text')}, 1, 8) AS fp_short
        FROM documents
    """,
}


# --- rake_keywords ----------------------------------------------------------
# RAKE (Rose et al. 2010): candidate phrases are maximal stopword-free token
# runs; a word's score is deg/freq (degree = Σ lengths of phrases containing
# it); a phrase's score is the sum of its member words' scores.  The English
# stopword profile doubles as the delimiter set.  Everything is exact
# integer ppm: word score = (deg·10⁶) DIV freq, phrase score = Σ word ppm.
_RAKE_MAX_LEN = 4
_RAKE_TOPK = 15
_RAKE_STOPS = tuple(X.STOPWORDS["en"])


def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus: top-`_RAKE_TOPK` candidate
    phrases by the classic degree/frequency score — the unsupervised
    keyphrase pass a curation pipeline runs to label domains/topics
    (tfidf_top_terms ranks single terms; RAKE surfaces multi-word units).

    Exactness: runs split on the shared stopword literals via a cumulative
    per-document counter; phrase strings assemble position-sorted; word
    degree/frequency are exact corpus integers; scores are integer ppm
    (positive-operand DIV) summed exactly per phrase — zero floats.

    Scale: one posexplode into per-doc-bounded windows (run id + phrase
    length), ONE persisted stopword-free word relation feeding both the
    word-stat aggregate and the phrase aggregate, one equi-join of phrase
    members to the vocab-sized stat relation.  Phrase length caps at
    `_RAKE_MAX_LEN`, so phrase strings stay bounded.
    """
    from pyspark.sql.window import Window

    stops = F.array(*[F.lit(w) for w in _RAKE_STOPS])
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(X.tokens(F.col("text"))).alias("i", "tok"))
        .withColumn("is_stop", F.array_contains(stops, F.col("tok")))
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    words = shared.shared_persist(
        ("rake_words", spark.sparkContext.applicationId, sf_dir),
        lambda: (
            toks.withColumn(
                "run", F.sum(F.col("is_stop").cast("int")).over(wrun)
            )
            .filter(~F.col("is_stop"))
            .withColumn(
                "plen",
                F.count(F.lit(1)).over(Window.partitionBy("doc_id", "run")),
            )
        ),
    )
    # deg·10⁶ runs in DECIMAL(38,0): deg is an uncapped Σ of run lengths,
    # and a BIGINT numerator would silently wrap past ~9.2e12 while the
    # DuckDB twin computes exactly in HUGEINT (the cusum overflow class;
    # Spark's DIV truncates identically on DECIMAL — verified).
    wstats = words.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    ).select(
        "tok",
        F.expr(
            "CAST((CAST(deg AS DECIMAL(38,0)) * 1000000) DIV freq AS BIGINT)"
        ).alias("wscore"),
    )
    phrases = (
        words.groupBy("doc_id", "run")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") <= _RAKE_MAX_LEN)
        .groupBy("phrase")
        .agg(
            F.max("n_words").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
    )
    member = phrases.select(
        "phrase", F.explode(F.split(F.col("phrase"), " ")).alias("tok")
    )
    scored = (
        member.join(wstats, "tok")
        .groupBy("phrase")
        .agg(F.sum("wscore").cast("bigint").alias("score_ppm"))
    )
    return (
        phrases.join(scored, "phrase")
        .select("phrase", "n_words", "n_occurrences", "score_ppm")
        .orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(_RAKE_TOPK)
    )


_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)
ORACLE["rake_keywords"] = f"""
    WITH base AS (
      SELECT doc_id, {X.sql_tokens("text")} AS ts FROM documents
    ),
    toks AS (
      SELECT doc_id, i, ts[i] AS tok,
             ts[i] IN ({_RAKE_STOP_SQL}) AS is_stop
      FROM (SELECT doc_id, ts, UNNEST(generate_series(1, len(ts))) AS i
            FROM base WHERE len(ts) >= 1)
    ),
    runs AS (
      SELECT doc_id, i, tok, is_stop,
             SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM toks
    ),
    words AS (
      SELECT doc_id, run, i, tok,
             COUNT(*) OVER (PARTITION BY doc_id, run) AS plen
      FROM runs WHERE NOT is_stop
    ),
    wstats AS (
      SELECT tok,
             (SUM(plen) * CAST(1000000 AS BIGINT)) // COUNT(*) AS wscore
      FROM words GROUP BY tok
    ),
    phrase_inst AS (
      SELECT doc_id, run, string_agg(tok, ' ' ORDER BY i) AS phrase,
             COUNT(*) AS n_words
      FROM words GROUP BY doc_id, run
    ),
    phrases AS (
      SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM phrase_inst WHERE n_words <= {_RAKE_MAX_LEN} GROUP BY phrase
    ),
    member AS (
      SELECT phrase, UNNEST(string_split(phrase, ' ')) AS tok FROM phrases
    ),
    scored AS (
      SELECT phrase, CAST(SUM(wscore) AS BIGINT) AS score_ppm
      FROM member JOIN wstats USING (tok) GROUP BY phrase
    )
    SELECT p.phrase, p.n_words, p.n_occurrences, s.score_ppm
    FROM phrases p JOIN scored s USING (phrase)
    ORDER BY score_ppm DESC, phrase
    LIMIT {_RAKE_TOPK}
"""
