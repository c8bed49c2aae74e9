"""Round-8 training-data-pipeline additions (SURVEY.md §2.3 scope):
importance-resampling data selection (the DSIR family) and a bigram-LM
cross-entropy quality scorer — the two standard "pick the target-like,
well-formed slice of the crawl" primitives the existing gates don't cover
(unigram_logprob is context-free; the curation gates are rule-based).

Both follow the repo's cross-engine exactness contract: counts stay
integer, every transcendental is ONE shared-text ``LN`` over
deterministically-ordered double operands rounded to 6 decimals, rounded
values accumulate as DECIMAL (order-independent), and every ranking sorts
on the rounded value with a unique tiebreak.

Scale design:
- dsir_importance: the per-(doc, bucket) counts relation is ONE map-side-
  combined shuffle; bucket statistics collapse to ≤ 2·_DSIR_BUCKETS rows
  (broadcast back), so the scoring join moves nothing wider than a
  64-bucket histogram per doc.  At 100 TB this is the published DSIR
  recipe: hashed-feature counts, closed-form log-ratio weights, top-K
  selection — no model, no iteration, no driver state.
- bigram_xent: one explode to (doc, bigram) counts (map-side combined),
  corpus bigram/context counts derive from it via two window sums over
  the term partitioning, the vocab scalar is a separate map-only scan
  reduced to one broadcast row, and the add-1-smoothed −ln p aggregates
  per doc exactly as unigram_logprob does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators.relational import load

ROWS_ONLY: tuple[str, ...] = ()

_DSIR_BUCKETS = 64     # hashed-unigram feature space (md5 % 64)
_DSIR_TARGET = "src0"  # the "high-quality" exemplar domain
_DSIR_TOPK = 20

# ONE shared text for the per-bucket smoothed log-likelihood ratio: the
# double divides/multiplies run in the identical op order on both engines.
# Operands cast to DOUBLE before any product so bigint overflow can never
# differ between engines (counts × counts would pass int64 at ~3·10⁹ docs).
_DSIR_LR = (
    "ROUND(LN((CAST(n_t + 1 AS DOUBLE) * CAST(nr_tot + {b} AS DOUBLE))"
    " / (CAST(n_r + 1 AS DOUBLE) * CAST(nt_tot + {b} AS DOUBLE))), 6)"
)


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) — rank raw-pool documents by how target-like their
    hashed n-gram distribution is.  log w(x) = Σ_b c_b(x) · ln(p̂_t(b) /
    p̂_r(b)) over `_DSIR_BUCKETS` hashed unigram buckets with add-1
    smoothing, target = the `_DSIR_TARGET` source, raw = everything else.
    Output: the top-`_DSIR_TOPK` raw docs by log-weight — the slice an
    importance-resampling pass would keep first.

    Exactness: bucket ids are the md5 idiom (`shard_balance`'s
    engine-identical hash); all counts are exact bigints; the ONLY float
    is the per-bucket `_DSIR_LR` log-ratio (shared text, rounded at 6,
    DECIMAL(18,6)); per-doc weights are exact decimal dot products
    c_b · lr_b, ranked with doc_id tiebreak.

    Scale: explode → (doc, bucket) counts is one map-side-combined
    shuffle keyed wider than the bucket space only by doc_id; the
    128-row bucket-stat relation and the 1-row totals broadcast; scoring
    is a broadcast join + one per-doc aggregate.  The top-K is
    TakeOrdered.  Nothing grows faster than the corpus's token count.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    buckets = docs.select(
        "doc_id",
        (F.col("source") == _DSIR_TARGET).alias("is_t"),
        F.explode(X.tokens(F.col("text"))).alias("term"),
    ).select(
        "doc_id",
        "is_t",
        F.expr(
            f"CAST(conv(substring(md5(term), 1, 4), 16, 10) AS BIGINT)"
            f" % {_DSIR_BUCKETS}"
        ).alias("b"),
    )
    dc = buckets.groupBy("doc_id", "is_t", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    # bucket stats: n_t / n_r per bucket (≤ 2·_DSIR_BUCKETS rows) + totals
    bstats = (
        dc.groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(F.lit(0))).alias("n_t"),
            F.sum(F.when(~F.col("is_t"), F.col("c")).otherwise(F.lit(0))).alias("n_r"),
        )
    )
    totals = bstats.groupBy().agg(
        F.sum("n_t").alias("nt_tot"), F.sum("n_r").alias("nr_tot")
    )
    lr = (
        bstats.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.expr(_DSIR_LR.format(b=_DSIR_BUCKETS))
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    scored = (
        dc.filter(~F.col("is_t"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr")).alias("logw"),
        )
    )
    out = (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_tokens", F.col("logw").cast("double").alias("dsir_logw"))
        .orderBy(F.col("dsir_logw").desc(), F.col("doc_id"))
        .limit(_DSIR_TOPK)
    )
    return out


# Shared text for the smoothed bigram −ln p: count(bigram)+1 over
# count(context)+V, V = corpus distinct-unigram count (exact integer).
_BG_NLP = (
    "ROUND(LN((CAST(ctx_cnt + vocab AS DOUBLE))"
    " / (CAST(bg_cnt + 1 AS DOUBLE))), 6)"
)


def bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus BIGRAM language model
    with add-1 smoothing — the context-aware upgrade of
    ``unigram_logprob``'s perplexity proxy (a document of real phrases
    scores low; shuffled-token soup scores high even when its unigram
    profile is typical — exactly what the unigram gate cannot see).

    Exactness: bigram and context counts are exact bigints from ONE
    (doc, bigram) aggregate; the smoothed −ln p is the `_BG_NLP` shared
    text rounded at 6 and summed as DECIMAL(18,6); xent is one final
    division rounded at 6.  Output ranks the 20 most-perplexing docs
    (highest xent — the filter-first tail) with doc_id tiebreak.

    Scale: the (doc, bigram) counts relation is the only big shuffle
    (map-side combined); corpus bigram totals and context totals are
    window sums over its term partitioning — no extra aggregate of the
    gram relation.  Vocab size is a separate map-only scan reduced to one
    broadcast row (the ``unigram_logprob`` total-tokens pattern).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", X.tokens(F.col("text")).alias("ts")).filter(
        F.size("ts") >= 2
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ts", 1, F.size("ts") - 1),
                F.slice("ts", 2, F.size("ts") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    ).select(
        "doc_id", "bg", F.split(F.col("bg"), " ").getItem(0).alias("w1")
    )
    tf = grams.groupBy("doc_id", "bg", "w1").agg(F.count(F.lit(1)).alias("tc"))
    vocab = (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("t"))
        .agg(F.count_distinct("t").alias("vocab"))
    )
    bg_cnt = F.sum("tc").over(Window.partitionBy("bg"))
    ctx_cnt = F.sum("tc").over(Window.partitionBy("w1"))
    scored = (
        tf.withColumn("bg_cnt", bg_cnt)
        .withColumn("ctx_cnt", ctx_cnt)
        .crossJoin(F.broadcast(vocab))
        .withColumn("nlp", F.expr(_BG_NLP).cast("decimal(18,6)"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tc").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("tc") * F.col("nlp")).alias("sum_nlp"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("sum_nlp").cast("double") / F.col("n_bigrams"), 6).alias(
                "bigram_xent"
            ),
        )
        .orderBy(F.col("bigram_xent").desc(), F.col("doc_id"))
        .limit(20)
    )


_TOKS = X.sql_tokens("text")

ORACLE: dict[str, str] = {
    "dsir_importance": f"""
        WITH buckets AS (
          SELECT doc_id, source = '{_DSIR_TARGET}' AS is_t,
                 CAST(('0x' || substring(md5(term), 1, 4)) AS BIGINT)
                   % {_DSIR_BUCKETS} AS b
          FROM (SELECT doc_id, source, UNNEST({_TOKS}) AS term
                FROM documents)
        ),
        dc AS (
          SELECT doc_id, is_t, b, COUNT(*) AS c
          FROM buckets GROUP BY doc_id, is_t, b
        ),
        bstats AS (
          SELECT b,
                 SUM(CASE WHEN is_t THEN c ELSE 0 END) AS n_t,
                 SUM(CASE WHEN NOT is_t THEN c ELSE 0 END) AS n_r
          FROM dc GROUP BY b
        ),
        tot AS (SELECT SUM(n_t) AS nt_tot, SUM(n_r) AS nr_tot FROM bstats),
        lr AS (
          SELECT b,
                 CAST({_DSIR_LR.format(b=_DSIR_BUCKETS)}
                      AS DECIMAL(18,6)) AS lr
          FROM bstats CROSS JOIN tot
        ),
        scored AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 SUM(c * lr) AS logw
          FROM dc JOIN lr USING (b)
          WHERE NOT is_t
          GROUP BY doc_id
        )
        SELECT s.doc_id, d.source, s.n_tokens,
               CAST(s.logw AS DOUBLE) AS dsir_logw
        FROM scored s JOIN documents d USING (doc_id)
        ORDER BY dsir_logw DESC, s.doc_id
        LIMIT {_DSIR_TOPK}
    """,
    "bigram_xent": f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS ts FROM documents
        ),
        grams AS (
          SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS bg, ts[i] AS w1
          FROM (SELECT doc_id, ts,
                       UNNEST(generate_series(1, len(ts) - 1)) AS i
                FROM toks WHERE len(ts) >= 2)
        ),
        tf AS (
          SELECT doc_id, bg, w1, COUNT(*) AS tc
          FROM grams GROUP BY doc_id, bg, w1
        ),
        voc AS (
          SELECT COUNT(DISTINCT term) AS vocab
          FROM (SELECT UNNEST({_TOKS}) AS term FROM documents)
        ),
        scored AS (
          SELECT doc_id, tc,
                 SUM(tc) OVER (PARTITION BY bg) AS bg_cnt,
                 SUM(tc) OVER (PARTITION BY w1) AS ctx_cnt
          FROM tf
        ),
        nlps AS (
          SELECT doc_id, tc,
                 CAST({_BG_NLP} AS DECIMAL(18,6)) AS nlp
          FROM scored CROSS JOIN voc
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(SUM(tc) AS BIGINT) AS n_bigrams,
                 SUM(tc * nlp) AS sum_nlp
          FROM nlps GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               ROUND(CAST(sum_nlp AS DOUBLE) / n_bigrams, 6) AS bigram_xent
        FROM per_doc
        ORDER BY bigram_xent DESC, doc_id
        LIMIT 20
    """,
}
