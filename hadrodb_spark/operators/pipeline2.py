"""Second batch of training-data-pipeline operators (SURVEY.md §2.3 scope,
round 2): corpus statistics and curation steps a 100 TB pretraining pipeline
runs between raw crawl and tokenizer — TF-IDF term scoring, deterministic
stratified sampling, sequence-length bucketing, benchmark-contamination
detection, and PII redaction.

All queries are pure JVM built-ins (no Python UDFs) with exact DuckDB oracle
twins. Cross-engine determinism follows the repo contract: md5 is the shared
hash primitive, counts/ratios are exact integer/rational math, and only
genuinely transcendental values (ln in TF-IDF) are rounded to 6 decimals.

Scale design:
- tfidf_top_terms: two hash shuffles (doc-term tf, term df) + one broadcast
  of the tiny df relation; top-k per doc is a rank window partitioned by
  doc_id — no global sort.
- stratified_sample: map-only predicate on md5(doc_id) — the canonical
  reproducible-sampling plan (no sampleBy/seed RNG, so re-runs and retries
  select the identical rows on any cluster size).
- length_buckets: single hash-shuffle agg on a derived bucket key.
- contamination_ngram: the benchmark n-gram set is tiny by construction
  (eval suites are KB-MB, corpora are TB) — broadcast hash join, map-only
  over the corpus.
- pii_redact: map-only regexp scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators.dedup import _EXACT_MOD, _EXACT_OFFSET
from hadrodb_spark.operators.relational import load

_TFIDF_TOPN = 3
_SAMPLE_HEX = "33333333"   # keep docs with md5[:8] < 0x33333333 ≈ 20%
_BUCKET_WIDTH = 16
_BUCKET_MAX = 7
_SEQ_CAP = 128             # packing target length for pack_efficiency
_BENCH_MOD = 97            # doc_id % 97 == 0 → "benchmark/eval" doc
_CONTAM_MOD = 89           # doc_id % 89 == 3 → planted contaminated doc
_SNIPPET_TOKS = 8          # contaminated docs copy doc 0's first 8 tokens
_NGRAM = 5
_EMAIL_MOD = 23            # doc_id % 23 == 5 → planted email
_PHONE_MOD = 31            # doc_id % 31 == 7 → planted phone
_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


def _tf_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) term frequencies, persisted via the shared-relation
    registry — the materialized-dataset shape a production TF-IDF stage has
    (built once, read by tf scoring AND the df/vocab derivation)."""
    from hadrodb_spark.operators import shared

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        return (
            docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    key = (spark.sparkContext.applicationId, sf_dir, "tfidf_tf")
    return shared.shared_persist(key, build)


def _tfidf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The broadcast side of TF-IDF scoring, persisted: one row per term
    with its document frequency plus the corpus size replicated on — so a
    warm query does exactly one broadcast hash join against cached rows.
    df comes from the map-side-combinable ``tf.groupBy(term).count()``
    (the exchange carries one partial count per (term, partition), bounded
    by the vocabulary — skew-immune no matter how Zipf-heavy the corpus)."""
    from hadrodb_spark.operators import shared

    tf = _tf_relation(spark, sf_dir)

    def build() -> DataFrame:
        n_docs = (
            load(spark, sf_dir, "documents")
            .select("doc_id")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        vocab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        return vocab.crossJoin(F.broadcast(n_docs))

    key = (spark.sparkContext.applicationId, sf_dir, "tfidf_stats")
    return shared.shared_persist(key, build)


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) with N = corpus size.

    Skew-safe shape (the r4 VERDICT fix — this module's earlier
    ``repartition("term")`` carried PRE-aggregation exploded rows,
    forfeiting map-side combine and concentrating each Zipf-head
    stopword's entire occurrence stream on one executor):

    * tf aggregates on the composite ``(doc_id, term)`` key — no single
      hot key, partial aggregation active — and persists via the
      shared-relation registry (one build per session, like the dedup
      signature relation);
    * the broadcast side (``_tfidf_stats``: term → df, with the 1-row
      corpus size replicated on) is likewise persisted, its df computed
      map-side-combinably — ONE broadcast hash join scores everything;
    * only the final per-doc rank window shuffles row-scale data, keyed
      on ``doc_id`` — uniform by construction — and its top-k prunes via
      WindowGroupLimit before the exchange.

    No stage is ever partitioned by bare ``term`` carrying row-scale
    data, which is the property the plan test pins."""
    tf = _tf_relation(spark, sf_dir)
    stats = _tfidf_stats(spark, sf_dir)
    scored = (
        tf.join(F.broadcast(stats), "term")
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _TFIDF_TOPN)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample: keep a doc iff the first 8 hex chars of
    md5(doc_id) sort below 0x33333333. Hash-threshold sampling is the
    reproducible alternative to seeded RNG — identical selection on any
    partitioning, any cluster, any retry."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return (
        docs.withColumn("bucket_hex", bucket)
        .filter(F.col("bucket_hex") < _SAMPLE_HEX)
        .select("doc_id", "lang", "source", "bucket_hex")
    )


def length_gate_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile length gate — drop outlier-length documents (the standard
    curation step against fragments and concatenation junk): keep docs whose
    token count lies within the [p5, p95] DISCRETE percentiles. percentile_disc
    is a pure order statistic (smallest value with cumulative fraction ≥ p —
    verified identical in Spark and DuckDB, including the sub-1/n edge), so
    unlike interpolated percentiles at non-binary fractions it is engine-exact
    on integer inputs. Thresholds are a 1-row aggregate broadcast onto the
    corpus; the gate itself is map-only."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", X.token_count(F.col("text")).alias("n_tokens")
    )
    th = d.agg(
        F.expr(
            "CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT)"
        ).alias("lo"),
        F.expr(
            "CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT)"
        ).alias("hi"),
    )
    return (
        d.crossJoin(F.broadcast(th))
        .filter(F.col("n_tokens").between(F.col("lo"), F.col("hi")))
        .select("doc_id", "n_tokens", "lo", "hi")
    )


def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram for batch packing: bucket docs by token
    count (width 16, clamped to 8 buckets), report per-bucket counts and the
    packing efficiency against a 128-token context (= fraction of slots a
    naive one-doc-per-row batcher fills)."""
    docs = load(spark, sf_dir, "documents")
    ntok = X.token_count(F.col("text"))
    bucket = F.least(F.floor(ntok / _BUCKET_WIDTH), F.lit(_BUCKET_MAX)).cast(
        "bigint"
    )
    return (
        docs.select(ntok.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            (
                F.sum(F.least(F.col("n_tokens"), F.lit(_SEQ_CAP))).cast("double")
                / (F.count(F.lit(1)) * _SEQ_CAP)
            ).alias("pack_efficiency"),
        )
    )


def _with_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus with planted benchmark leakage: docs with doc_id % 89 == 3 get
    the first 8 tokens of doc 0 (a benchmark doc: 0 % 97 == 0) appended."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    snippet = (
        docs.filter(F.col("doc_id") == 0)
        .select(
            F.concat_ws(
                " ", F.slice(X.tokens(F.col("text")), 1, _SNIPPET_TOKS)
            ).alias("snippet")
        )
    )
    return (
        docs.crossJoin(F.broadcast(snippet))
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % _CONTAM_MOD == 3,
                F.concat_ws(" ", F.col("text"), F.col("snippet")),
            ).otherwise(F.col("text")),
        )
        .select("doc_id", "text")
    )


def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check: which corpus docs share a 5-gram with the
    benchmark set (doc_id % 97 == 0)? The benchmark gram set is tiny, so it
    broadcasts; the corpus side is a map-only explode — the plan a 100 TB
    decontamination sweep wants."""
    corpus = _with_contamination(spark, sf_dir)
    grams = corpus.select(
        "doc_id",
        F.explode(X.shingles(X.tokens(F.col("text")), _NGRAM)).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.col("doc_id").alias("bench_id"), "gram")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: plant deterministic emails/phones, count and redact them.
    Map-only regexp pass; output is the redaction fingerprint so the full
    cleaned text is verified without shipping it."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.col("text"),
            F.when(
                F.col("doc_id") % _EMAIL_MOD == 5,
                F.concat(
                    F.lit("contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ),
            F.when(
                F.col("doc_id") % _PHONE_MOD == 7,
                F.concat(
                    F.lit("call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" ok"),
                ),
            ),
        ),
    )
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    return planted.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("bigint").alias(
            "n_emails"
        ),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RE)).cast("bigint").alias(
            "n_phones"
        ),
        F.md5(cleaned).alias("clean_fp"),
    )


_QUALITY_MIN = 0.42  # ≈ corpus median — filters roughly half


def curation_gates(docs: DataFrame) -> DataFrame:
    """The map-only gate stack of the curation funnel (language-ID +
    quality threshold), usable on BATCH or STREAMING DataFrames alike —
    no window, no shuffle, so Structured Streaming accepts it unchanged
    (see :mod:`hadrodb_spark.streaming.curation`). Input needs (doc_id,
    text); output adds quality, n_tokens and the dedup fingerprint."""
    toks = X.tokens(F.col("text"))
    n_tok = F.size(toks).cast("double")
    stop_ratio = X.stopword_hits(toks, "en").cast("double") / F.greatest(
        n_tok, F.lit(1.0)
    )
    len_score = F.least(n_tok, F.lit(100.0)) / F.lit(100.0)
    alpha_chars = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    alpha_ratio = alpha_chars.cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    ).cast("double")
    quality = F.round(
        F.lit(0.4) * stop_ratio + F.lit(0.3) * len_score + F.lit(0.3) * alpha_ratio,
        6,
    )
    return docs.select(
        "doc_id",
        X.lang_id(toks).alias("pred_lang"),
        quality.alias("quality"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        X.fingerprint(F.col("text")).alias("fp"),
    ).filter((F.col("pred_lang") == "en") & (F.col("quality") >= _QUALITY_MIN))


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition — the single-query version of the
    standard pretraining funnel: language-ID gate → quality-score gate →
    exact dedup (keep lowest doc_id per canonical fingerprint). Exact copies
    are planted (same scheme as dedup_exact) so the dedup stage is
    non-vacuous.

    Every stage is a map-only expression except the final per-fingerprint
    window — one hash shuffle total, after the gates have already shrunk the
    corpus (filter-early is the point of the composition)."""
    from hadrodb_spark.operators.dedup import _with_exact_copies

    gated = curation_gates(_with_exact_copies(spark, sf_dir))
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "quality", "n_tokens")
    )


def profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution profile: per return-flag quartiles of lineitem
    quantity, plus min/max/count — one aggregation pass.

    Exact `percentile` (not approx_percentile) keeps this oracle-checkable:
    quartile fractions are exact binary (1/4, 1/2, 3/4) and l_quantity is
    integer-valued, so the linear interpolation is bit-identical regardless
    of how each engine associates `a + (b-a)·f` — the one shape of exact
    quantile that is cross-engine safe. At 100 TB exact percentile sorts
    within groups; swap in approx_percentile (t-digest) and keep this as
    the verification anchor on samples."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_quantity").cast("double").alias("q_min"),
        F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").alias("qs"),
        F.max("l_quantity").cast("double").alias("q_max"),
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        "q_min",
        F.element_at("qs", 1).alias("q1"),
        F.element_at("qs", 2).alias("median"),
        F.element_at("qs", 3).alias("q3"),
        "q_max",
    )


# ------------------------------------------------------------------ oracles
_TOKS = X.sql_tokens("text")

ORACLE: dict[str, str] = {
    "profile_quantiles": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(l_quantity) AS DOUBLE) AS q_min,
               quantile_cont(l_quantity, 0.25) AS q1,
               quantile_cont(l_quantity, 0.5) AS median,
               quantile_cont(l_quantity, 0.75) AS q3,
               CAST(MAX(l_quantity) AS DOUBLE) AS q_max
        FROM lineitem GROUP BY l_returnflag
    """,
    "tfidf_top_terms": f"""
        WITH terms AS (
          SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
        ),
        tf AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM terms GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 ROUND(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)), 6)
                   AS score
          FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, score, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC
                 ) AS BIGINT) AS rk
          FROM scored
        ) WHERE rk <= {_TFIDF_TOPN}
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, source,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS bucket_hex
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_SAMPLE_HEX}'
    """,
    "length_gate_disc": f"""
        WITH d AS (
          SELECT doc_id, CAST(len({X.sql_tokens('text')}) AS BIGINT) AS n_tokens
          FROM documents
        ),
        th AS (
          SELECT CAST(quantile_disc(n_tokens, 0.05) AS BIGINT) AS lo,
                 CAST(quantile_disc(n_tokens, 0.95) AS BIGINT) AS hi
          FROM d
        )
        SELECT doc_id, n_tokens, lo, hi
        FROM d, th
        WHERE n_tokens BETWEEN lo AND hi
    """,
    "length_buckets": f"""
        SELECT CAST(LEAST(FLOOR(len({_TOKS}) / {_BUCKET_WIDTH}), {_BUCKET_MAX})
                    AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS sum_tokens,
               CAST(MIN(len({_TOKS})) AS BIGINT) AS min_tokens,
               CAST(MAX(len({_TOKS})) AS BIGINT) AS max_tokens,
               CAST(SUM(LEAST(len({_TOKS}), {_SEQ_CAP})) AS DOUBLE)
                 / (COUNT(*) * {_SEQ_CAP}) AS pack_efficiency
        FROM documents
        GROUP BY 1
    """,
    "contamination_ngram": f"""
        WITH snippet AS (
          SELECT array_to_string(({_TOKS})[1:{_SNIPPET_TOKS}], ' ') AS snippet
          FROM documents WHERE doc_id = 0
        ),
        corpus AS (
          SELECT doc_id,
                 CASE WHEN doc_id % {_CONTAM_MOD} = 3
                      THEN text || ' ' || snippet ELSE text END AS text
          FROM documents CROSS JOIN snippet
        ),
        grams AS (
          SELECT doc_id, UNNEST({X.sql_shingles(_TOKS, _NGRAM)}) AS gram
          FROM corpus
        ),
        bench AS (
          SELECT DISTINCT doc_id AS bench_id, gram FROM grams
          WHERE doc_id % {_BENCH_MOD} = 0
        )
        SELECT g.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM grams g JOIN bench b USING (gram)
        WHERE g.doc_id % {_BENCH_MOD} <> 0
        GROUP BY g.doc_id, b.bench_id
    """,
    "curation_pipeline": f"""
        WITH documents2 AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {_EXACT_OFFSET} AS doc_id, text FROM documents
          WHERE doc_id % {_EXACT_MOD} = 0
        ),
        scored AS (
          SELECT doc_id,
                 CASE WHEN {X.sql_stopword_hits(_TOKS, 'en')} >= {X.sql_stopword_hits(_TOKS, 'de')}
                       AND {X.sql_stopword_hits(_TOKS, 'en')} >= {X.sql_stopword_hits(_TOKS, 'es')}
                       AND {X.sql_stopword_hits(_TOKS, 'en')} >= {X.sql_stopword_hits(_TOKS, 'fr')} THEN 'en'
                      WHEN {X.sql_stopword_hits(_TOKS, 'de')} >= {X.sql_stopword_hits(_TOKS, 'es')}
                       AND {X.sql_stopword_hits(_TOKS, 'de')} >= {X.sql_stopword_hits(_TOKS, 'fr')} THEN 'de'
                      WHEN {X.sql_stopword_hits(_TOKS, 'es')} >= {X.sql_stopword_hits(_TOKS, 'fr')} THEN 'es'
                      ELSE 'fr' END AS pred_lang,
                 ROUND(0.4 * (CAST({X.sql_stopword_hits(_TOKS, 'en')} AS DOUBLE)
                              / GREATEST(CAST(len({_TOKS}) AS DOUBLE), 1.0))
                     + 0.3 * (LEAST(CAST(len({_TOKS}) AS DOUBLE), 100.0) / 100.0)
                     + 0.3 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                              / CAST(GREATEST(length(text), 1) AS DOUBLE)), 6) AS quality,
                 CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                 {X.sql_fingerprint('text')} AS fp
          FROM documents2
        )
        SELECT doc_id, quality, n_tokens FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM scored
          WHERE pred_lang = 'en' AND quality >= {_QUALITY_MIN}
        ) WHERE rn = 1
    """,
    "pii_redact": f"""
        WITH planted AS (
          SELECT doc_id,
                 concat_ws(' ', text,
                   CASE WHEN doc_id % {_EMAIL_MOD} = 5
                        THEN 'contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com now' END,
                   CASE WHEN doc_id % {_PHONE_MOD} = 7
                        THEN 'call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                             || ' ok' END) AS text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
                 AS n_phones,
               md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                                  '{_PHONE_RE}', '[PHONE]', 'g')) AS clean_fp
        FROM planted
    """,
}
