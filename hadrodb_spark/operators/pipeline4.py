"""Fourth batch of training-data-pipeline operators (SURVEY.md §2.3 scope):
RAG-style document chunking, deterministic dataset splits, duplicate-cluster
statistics, multi-signal quality gating, language-ID evaluation, BM25
retrieval scoring, and per-label embedding outlier detection.

All pure JVM built-ins with exact DuckDB oracle twins, following the repo
contract: integer/rational math exact, transcendental values rounded to 6
decimals BEFORE any cross-row aggregation (rounded decimals sum exactly in
both engines regardless of accumulation order), unique tiebreakers in every
ranking.

Scale design:
- chunk_documents: map-only — tokenization, chunk-start sequence, slice and
  fingerprint all happen inside one projection; output is |chunks| rows with
  no shuffle at all. The canonical RAG/pretraining chunker at 100 TB.
- train_val_split: md5-prefix range split is pure map + one small agg; every
  engine, partition, and retry assigns a row the same split (no RNG state),
  which is the property a reproducible 100 TB split actually needs.
- dedup_cluster_hist: two hash aggs (fingerprint → size, size → histogram);
  the first is the same shuffle exact dedup already pays, the second is
  |distinct sizes| rows.
- quality_filter_ensemble: map-only signal computation + verdicts; one scan.
- langid_confusion: map-only prediction then a |langs|² agg.
- bm25_score: the tf pass filters to the query's terms BEFORE the explode
  shuffle (array_intersect prunes ~all tokens map-side); df/N/avgdl are
  broadcast 1-row/3-row relations; top-k is TakeOrdered, never a full sort.
- embedding_outliers: posexplode to (row × dim), one agg to |labels|×|dims|
  centroid sums (broadcast back), one decimal agg per vector for the
  distance, rank window per label for the top-5. At 100 TB the explode is
  the scalable formulation — no per-row Python, no driver-side vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.functions import vectors as V
from hadrodb_spark.operators.relational import load

_CHUNK = 64            # tokens per chunk
_STRIDE = 48           # chunk stride (CHUNK - STRIDE = 16-token overlap)
_TRAIN_HEX = "'e6'"    # md5-prefix thresholds: <e6 train (~89.8%),
_VAL_HEX = "'f3'"      # <f3 val (~5.1%), else test (~5.1%)
_MIN_TOKENS = 10       # quality gates
_MAX_TOKENS = 100000
_MIN_MEAN_TOK = 2.0
_MAX_MEAN_TOK = 12.0
_MAX_DUP_FRAC = 0.6
_BM25_TERMS = ("spark", "join", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20
_OUTLIER_TOPK = 5
_RAG_QUERY_IDS = (0, 1, 2)   # embeddings doubling as query vectors
_RAG_TOPK = 5                # retrieved passages per query
_RAG_BUDGET = 120            # context token budget per query


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunks (64-token windows, 48-token
    stride) with an md5 fingerprint per chunk — the RAG / pretraining
    chunking pass. Chunk generation is `sequence` + `transform` + `explode`:
    range math stays on executors, nothing is driver-side."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    starts = F.sequence(F.lit(0), F.size("toks") - 1, F.lit(_STRIDE))
    chunks = docs.select(
        "doc_id",
        F.col("toks"),
        F.explode(starts).alias("s"),
    ).select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("bigint").alias("chunk_id"),
        F.slice(F.col("toks"), F.col("s") + 1, _CHUNK).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").cast("bigint").alias("chunk_len"),
        F.md5(F.concat_ws(" ", "chunk")).alias("chunk_md5"),
    )


def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split via md5-prefix ranges —
    the reproducible-split contract (stable under reshuffling, retries, and
    engine choice) — summarized per (split, lang)."""
    docs = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < F.expr(_TRAIN_HEX), "train")
        .when(h2 < F.expr(_VAL_HEX), "val")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


def dedup_cluster_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: group docs by canonical-text
    fingerprint, then histogram the cluster sizes — the corpus-health
    summary run after every dedup pass (how much mass sits in clusters of
    size 2, 3, ...)."""
    docs = load(spark, sf_dir, "documents")
    sizes = docs.groupBy(X.fingerprint(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.count(F.lit(1)) * F.first("cluster_size")).cast("bigint").alias("n_docs"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )


def quality_filter_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality gate: token count, mean token length, and
    duplicate-token fraction, each with a pass/fail rule, plus the overall
    verdict and the FIRST failing rule as the reject reason — the
    composable filter stack every curation pipeline ends with."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", X.tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks").cast("bigint")
    chars = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    mean_tok = F.round(chars.cast("double") / n, 6)
    dup_frac = F.round(
        1.0 - F.size(F.array_distinct("toks")).cast("double") / n, 6
    )
    sig = docs.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        mean_tok.alias("mean_tok_len"),
        dup_frac.alias("dup_frac"),
    )
    len_ok = F.col("n_tokens").between(_MIN_TOKENS, _MAX_TOKENS)
    tok_ok = F.col("mean_tok_len").between(_MIN_MEAN_TOK, _MAX_MEAN_TOK)
    dup_ok = F.col("dup_frac") <= _MAX_DUP_FRAC
    return sig.select(
        "doc_id",
        "lang",
        "n_tokens",
        "mean_tok_len",
        "dup_frac",
        (len_ok & tok_ok & dup_ok).alias("keep"),
        F.when(~len_ok, "length")
        .when(~tok_ok, "token_shape")
        .when(~dup_ok, "repetition")
        .otherwise("ok")
        .alias("reason"),
    )


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion counts of the stopword-profile
    predictor against the labeled ``lang`` column (the labeled set includes
    languages the predictor can't emit, e.g. zh — those rows measure its
    out-of-coverage behavior)."""
    docs = load(spark, sf_dir, "documents")
    pred = X.lang_id(X.tokens(F.col("text")))
    return (
        docs.select(F.col("lang").alias("actual"), pred.alias("pred"))
        .groupBy("actual", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed 3-term query (k1=1.2, b=0.75) — the lexical
    retrieval baseline. Per-(doc, term) scores are rounded to 6 decimals
    and summed as DECIMAL so the engines agree bit-for-bit; tf filtering
    happens BEFORE the explode (``array_intersect`` with the broadcast
    query terms prunes map-side)."""
    qterms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    dl = docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        F.array_intersect(F.col("toks"), qterms).alias("hit_terms"),
        F.filter(F.col("toks"), lambda x: F.array_contains(qterms, x)).alias("hits"),
    )
    stats = dl.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    )
    tf = (
        dl.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.round(
                F.col("idf")
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B
                        * F.col("dl")
                        * F.col("n_docs")
                        / F.col("total_dl")
                    )
                ),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("double").alias("score"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
    )
    return per_doc.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_BM25_TOPK)


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: squared euclidean distance of every
    vector to its label centroid, top-5 per label — the semantic
    data-cleaning pass that surfaces mislabeled / anomalous vectors.

    Determinism: per-dim values round to 6 decimals as DECIMAL before any
    cross-row sum (centroid sums exact), and each vector's per-dim squared
    deviation rounds to 6 before the per-vector DECIMAL sum — so the
    distance is identical in both engines despite float inputs."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim") + 1).alias("dim"),
        F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)").alias("v"),
    )
    cent = dims.groupBy("label", "dim").agg(
        F.sum("v").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = dims.join(F.broadcast(cent), ["label", "dim"]).select(
        "vec_id",
        "label",
        F.round(
            F.pow(
                F.col("v").cast("double")
                - F.col("s").cast("double") / F.col("n"),
                2,
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("d2"),
    )
    dist = dev.groupBy("vec_id", "label").agg(
        F.sum("d2").cast("double").alias("dist2")
    )
    w = Window.partitionBy("label").orderBy(F.col("dist2").desc(), F.col("vec_id"))
    return (
        dist.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _OUTLIER_TOPK)
        .select("label", "vec_id", F.round("dist2", 6).alias("dist2"), "rk")
    )


_PHRASE = ("table", "hash")


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search ("{w1} {w2}"): build posting lists for the
    phrase's terms only (map-side prune before the explode, the bm25
    pattern), then an equi-join on (doc, adjacent position). Per matching
    doc: occurrence count and first match position (0-based).

    Scale: posting lists for TWO terms are a sliver of the corpus; the
    adjacency join is an equi hash join on doc_id — the inverted-index
    plan, not a per-doc array scan. The oracle deliberately uses the
    opposite formulation (per-doc higher-order-function scan) so the two
    engines verify each other through independent algorithms."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")
        ).alias("pos", "tok"),
    )
    a = toks.filter(F.col("tok") == _PHRASE[0]).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    b = toks.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, "doc_id")
        .filter(F.col("pos_b") == F.col("pos_a") + 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.min("pos_a").cast("int").alias("first_pos"),
        )
    )


def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly end-to-end in one plan: per query vector,
    retrieve the top-5 passages by exact cosine, join their text, and
    greedy-pack them in rank order into a 120-token context budget
    (running token sum; a passage ships iff the budget still covers it).

    Scale: the 3 query vectors broadcast against one corpus scan (the
    vector_topk_batch plan); the text join is a hash join on the retrieval
    output (k×|queries| rows, trivially small relative to the corpus); the
    pack is a window over ≤k rows per query. No driver-side loops."""
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    q = (
        emb.filter(F.col("vec_id").isin(*_RAG_QUERY_IDS))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    scored = (
        emb.filter(~F.col("vec_id").isin(*_RAG_QUERY_IDS))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            F.round(V.cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    top = (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _RAG_TOPK)
    )
    joined = top.join(docs, top.vec_id == docs.doc_id).withColumn(
        "n_tokens", X.token_count(F.col("text"))
    )
    wc = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("cum_tokens", F.sum("n_tokens").over(wc).cast("bigint"))
        .filter(F.col("cum_tokens") <= _RAG_BUDGET)
        .select("query_id", "rnk", "doc_id", "n_tokens", "cum_tokens", "cos_sim")
    )


# ------------------------------------------------------------------ oracles
_TOKS = X.sql_tokens("text")
_QLIST = ", ".join(f"'{t}'" for t in _BM25_TERMS)

ORACLE: dict[str, str] = {
    "chunk_documents": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        starts AS (
          SELECT doc_id, t,
                 UNNEST(generate_series(0, len(t) - 1, {_STRIDE})) AS s
          FROM toks
        )
        SELECT doc_id,
               CAST(s / {_STRIDE} AS BIGINT) AS chunk_id,
               CAST(len(t[s + 1 : s + {_CHUNK}]) AS BIGINT) AS chunk_len,
               md5(array_to_string(t[s + 1 : s + {_CHUNK}], ' ')) AS chunk_md5
        FROM starts
    """,
    "train_val_split": f"""
        WITH tagged AS (
          SELECT lang, n_chars,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_TRAIN_HEX}
                        THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_VAL_HEX}
                        THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        )
        SELECT split, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM tagged GROUP BY split, lang
    """,
    "dedup_cluster_hist": f"""
        WITH sizes AS (
          SELECT {X.sql_fingerprint('text')} AS fp, COUNT(*) AS cluster_size
          FROM documents GROUP BY fp
        )
        SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM sizes GROUP BY cluster_size
    """,
    "quality_filter_ensemble": f"""
        WITH sig AS (
          SELECT doc_id, lang,
                 CAST(len(t) AS BIGINT) AS n_tokens,
                 ROUND(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                       / len(t), 6) AS mean_tok_len,
                 ROUND(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                   AS dup_frac
          FROM (SELECT doc_id, lang, {_TOKS} AS t FROM documents)
        )
        SELECT doc_id, lang, n_tokens, mean_tok_len, dup_frac,
               (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS})
                 AND (mean_tok_len BETWEEN {_MIN_MEAN_TOK} AND {_MAX_MEAN_TOK})
                 AND (dup_frac <= {_MAX_DUP_FRAC}) AS keep,
               CASE WHEN NOT (n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS})
                      THEN 'length'
                    WHEN NOT (mean_tok_len BETWEEN {_MIN_MEAN_TOK} AND {_MAX_MEAN_TOK})
                      THEN 'token_shape'
                    WHEN dup_frac > {_MAX_DUP_FRAC} THEN 'repetition'
                    ELSE 'ok' END AS reason
        FROM sig
    """,
    "langid_confusion": f"""
        WITH pred AS (
          SELECT lang AS actual,
                 CASE
                   WHEN {X.sql_stopword_hits('t', 'en')} >= {X.sql_stopword_hits('t', 'de')}
                    AND {X.sql_stopword_hits('t', 'en')} >= {X.sql_stopword_hits('t', 'es')}
                    AND {X.sql_stopword_hits('t', 'en')} >= {X.sql_stopword_hits('t', 'fr')}
                     THEN 'en'
                   WHEN {X.sql_stopword_hits('t', 'de')} >= {X.sql_stopword_hits('t', 'es')}
                    AND {X.sql_stopword_hits('t', 'de')} >= {X.sql_stopword_hits('t', 'fr')}
                     THEN 'de'
                   WHEN {X.sql_stopword_hits('t', 'es')} >= {X.sql_stopword_hits('t', 'fr')}
                     THEN 'es'
                   ELSE 'fr' END AS pred
          FROM (SELECT lang, {_TOKS} AS t FROM documents)
        )
        SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY actual, pred
    """,
    "bm25_score": f"""
        WITH d AS (
          SELECT doc_id, t,
                 CAST(len(t) AS BIGINT) AS dl,
                 list_filter(t, x -> list_contains([{_QLIST}], x)) AS hits
          FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
        ),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_dl
          FROM d
        ),
        tf AS (
          SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, dl, UNNEST(hits) AS term FROM d)
          GROUP BY doc_id, dl, term
        ),
        dfq AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
        ),
        scored AS (
          SELECT doc_id,
                 CAST(ROUND(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * ({_BM25_K1} + 1))
                   / (tf + {_BM25_K1}
                      * (1 - {_BM25_B}
                         + {_BM25_B} * dl * n_docs / CAST(total_dl AS DOUBLE))),
                   6) AS DECIMAL(18,6)) AS term_score
          FROM tf JOIN dfq USING (term) CROSS JOIN stats
        )
        SELECT doc_id,
               CAST(SUM(term_score) AS DOUBLE) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM scored
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT {_BM25_TOPK}
    """,
    "embedding_outliers": f"""
        WITH dims AS (
          SELECT vec_id, label, dim,
                 CAST(ROUND(CAST(val AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
          FROM (SELECT vec_id, label,
                       UNNEST(embedding) AS val,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings)
        ),
        cent AS (
          SELECT label, dim, SUM(v) AS s, COUNT(*) AS n
          FROM dims GROUP BY label, dim
        ),
        dev AS (
          SELECT vec_id, dims.label,
                 CAST(ROUND(pow(CAST(v AS DOUBLE)
                                - CAST(s AS DOUBLE) / n, 2), 6)
                      AS DECIMAL(18,6)) AS d2
          FROM dims JOIN cent USING (label, dim)
        ),
        dist AS (
          SELECT vec_id, label, CAST(SUM(d2) AS DOUBLE) AS dist2
          FROM dev GROUP BY vec_id, label
        )
        SELECT label, vec_id, ROUND(dist2, 6) AS dist2, rk FROM (
          SELECT label, vec_id, dist2,
                 CAST(ROW_NUMBER() OVER (
                        PARTITION BY label ORDER BY dist2 DESC, vec_id
                      ) AS BIGINT) AS rk
          FROM dist
        ) WHERE rk <= {_OUTLIER_TOPK}
    """,
    "phrase_search": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
        ),
        hits AS (
          SELECT doc_id,
                 list_filter(generate_series(1, len(t) - 1),
                             i -> t[i] = '{_PHRASE[0]}'
                                  AND t[i + 1] = '{_PHRASE[1]}') AS hs
          FROM toks
        )
        SELECT doc_id,
               CAST(len(hs) AS BIGINT) AS n_matches,
               CAST(list_aggregate(hs, 'min') - 1 AS INT) AS first_pos
        FROM hits WHERE len(hs) > 0
    """,
    "rag_context_pack": f"""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_emb
          FROM embeddings WHERE vec_id IN ({", ".join(map(str, _RAG_QUERY_IDS))})
        ),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 ROUND({V.sql_cosine('e.embedding', 'q.q_emb')}, 6) AS cos_sim
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id NOT IN ({", ".join(map(str, _RAG_QUERY_IDS))})
        ),
        ranked AS (
          SELECT query_id, vec_id, cos_sim,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
                 ) AS INT) AS rnk
          FROM scored
        ),
        joined AS (
          SELECT t.query_id, t.rnk, d.doc_id, t.cos_sim,
                 CAST(len({_TOKS}) AS BIGINT) AS n_tokens
          FROM ranked t JOIN documents d ON t.vec_id = d.doc_id
          WHERE t.rnk <= {_RAG_TOPK}
        ),
        packed AS (
          SELECT query_id, rnk, doc_id, cos_sim, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                     PARTITION BY query_id ORDER BY rnk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS cum_tokens
          FROM joined
        )
        SELECT query_id, rnk, doc_id, n_tokens, cum_tokens, cos_sim
        FROM packed WHERE cum_tokens <= {_RAG_BUDGET}
    """,
}


def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: the BM25 lexical
    top-20 (``bm25_score``) and the exact-cosine semantic top-10
    (``similarity.vector_topk``, vec_id ≡ doc_id) fuse by
    RRF(d) = Σ_legs 1/(60 + rank_leg(d)) — the standard hybrid-search
    combiner (Cormack et al., SIGIR'09) and the retrieval front half of
    a RAG pipeline (``rag_context_pack`` is the back half).  Both legs
    are the REGISTRY's own verified queries, composed — the oracle wraps
    their exact oracle texts as CTEs, so fusion can never drift from the
    certified leg semantics.

    Exactness: leg ranks are row_number over (rounded score DESC, id) on
    the ≤20-row leg outputs; the RRF contribution is the exact integer
    ppm 10⁶ DIV (60 + rank) — no floats anywhere in the fusion itself.

    Scale: each leg already reduces to a bounded top-K (broadcast query
    vector / pruned term postings); fusion joins two ≤20-row relations.
    """
    from hadrodb_spark.operators import similarity as S

    wlex = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex = bm25_score(spark, sf_dir).select(
        "doc_id", F.row_number().over(wlex).alias("lex_rank")
    )
    wsem = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    sem = S.vector_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wsem).alias("sem_rank"),
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .withColumn(
            "rrf_ppm",
            F.coalesce(
                F.expr("CAST(1000000 AS BIGINT) DIV (60 + lex_rank)"),
                F.lit(0),
            )
            + F.coalesce(
                F.expr("CAST(1000000 AS BIGINT) DIV (60 + sem_rank)"),
                F.lit(0),
            ),
        )
    )
    return (
        fused.select(
            "doc_id",
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("sem_rank").cast("bigint").alias("sem_rank"),
            F.col("rrf_ppm").cast("bigint").alias("rrf_ppm"),
        )
        .orderBy(F.col("rrf_ppm").desc(), "doc_id")
        .limit(10)
    )


# Composed oracle: both legs ARE the registry's verified oracle texts,
# wrapped as CTEs.  NOTE: this runs AT IMPORT TIME (the ORACLE assignment
# below calls it) — the function-local similarity import keeps the
# dependency out of pipeline4's module header but is NOT lazy and gives
# no circular-import protection; similarity must never import pipeline4.
def _rrf_oracle() -> str:
    from hadrodb_spark.operators import similarity as _S

    return f"""
        WITH lex_top AS ({ORACLE["bm25_score"]}),
        sem_top AS ({_S.ORACLE["vector_topk"]}),
        lex AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                   AS lex_rank
          FROM lex_top
        ),
        sem AS (
          SELECT vec_id AS doc_id,
                 ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id)
                   AS sem_rank
          FROM sem_top
        )
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               CAST(lex_rank AS BIGINT) AS lex_rank,
               CAST(sem_rank AS BIGINT) AS sem_rank,
               CAST(COALESCE(CAST(1000000 AS BIGINT) // (60 + lex_rank), 0)
                    + COALESCE(CAST(1000000 AS BIGINT) // (60 + sem_rank), 0)
                    AS BIGINT) AS rrf_ppm
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        ORDER BY rrf_ppm DESC, doc_id
        LIMIT 10
    """


ORACLE["hybrid_rrf_fusion"] = _rrf_oracle()
