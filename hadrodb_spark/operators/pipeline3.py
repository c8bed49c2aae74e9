"""Third batch of training-data-pipeline operators (SURVEY.md §2.3 scope):
repetition-based quality gating (the Gopher-rules family), temperature-based
domain mixture weighting, greedy sequence packing for fixed context windows,
and batched multi-query ANN.

All queries are pure JVM built-ins with exact DuckDB oracle twins, following
the repo contract: integer/rational math exact, transcendental values
(pow/cosine) rounded to 6 decimals, unique tiebreakers in every ranking.

Scale design:
- repetition_gates: explode + two hash aggs with map-side combine; the
  per-(doc, term) relation is the same shape a 100 TB tf pass produces.
- mixture_weights: per-domain agg collapses the corpus to |domains| rows,
  then a broadcast of the 1-row total — nothing driver-side.
- pack_greedy: one window cumsum per domain partition (shuffle on lang) —
  the standard concat-then-split packing used for pretraining batches;
  bin assignment is integer math, no iteration, no driver loop.
- vector_topk_batch: Q query vectors broadcast to a map-only corpus scan;
  per-query rank window shuffles only (corpus × Q) scored rows on q_id —
  at 100 TB you shard queries, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.functions import vectors as V
from hadrodb_spark.operators.relational import load

_DUP_FRAC_MAX = 0.5    # gate: fail docs where >50% of tokens are repeats
_GAPFILL_USERS = 20    # gap-fill the first 20 users (bounds the dense grid)
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_MIX_ALPHA = 0.7       # mixture temperature (pow exponent on domain counts)
_MIX_SCALE = 100000    # target sample size the weights are scaled to
_PACK_BUDGET = 512     # context-window token budget for packing
_BATCH_Q = 5           # vec_id < 5 are the query vectors
_BATCH_TOPK = 3


def repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-repetition quality gates per document: duplicate-token
    fraction, most-frequent-token fraction, and the pass/fail verdict at
    the 50% duplicate threshold — the token-level core of the published
    Gopher repetition rules."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    terms = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
    tc = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    per = tc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_uniq"),
        F.max("cnt").alias("top_cnt"),
    )
    dup_frac = F.round(
        1.0 - F.col("n_uniq").cast("double") / F.col("n_tokens"), 6
    )
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_uniq").cast("bigint").alias("n_uniq"),
        dup_frac.alias("dup_token_frac"),
        F.round(F.col("top_cnt").cast("double") / F.col("n_tokens"), 6).alias(
            "top_token_frac"
        ),
        (dup_frac <= _DUP_FRAC_MAX).alias("passes"),
    )


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture: per-language doc counts reweighted
    by count^0.7 (the multilingual-sampling temperature trick — upweights
    tail domains) and scaled to a 100k-doc target budget."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    powed = counts.withColumn(
        "p", F.pow(F.col("n_docs").cast("double"), F.lit(_MIX_ALPHA))
    )
    tot = powed.groupBy().agg(F.sum("p").alias("p_tot"))
    return (
        powed.crossJoin(F.broadcast(tot))
        .withColumn("weight", F.round(F.col("p") / F.col("p_tot"), 6))
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "weight",
            F.floor(F.col("weight") * _MIX_SCALE).cast("bigint").alias("target_docs"),
        )
    )


def mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature mixture: deterministically downsample
    each language to ``mixture_weights``'s target count by keeping the
    ``target`` lowest-md5 docs (rank-based, so the kept set hits the
    target EXACTLY and is identical on any cluster/run — seeded RNG
    sampling is neither). One shuffle on lang for the rank window plus the
    tiny weights broadcast. The per-lang partitions are coarse (|langs|
    ≈ 5); at 100 TB the swap is hash-THRESHOLD preselection (map-only,
    slightly over target) followed by a rank top-off on the small
    overshoot — same keep-set, no coarse-key window over the full corpus."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    # budget = half the corpus, so the targets bind at every SF; a lang
    # whose upweighted target exceeds its supply keeps everything (the
    # sampling-without-replacement cap)
    ntot = docs.agg(F.count(F.lit(1)).alias("n_total"))
    targets = (
        mixture_weights(spark, sf_dir)
        .select("lang", "weight")
        .crossJoin(F.broadcast(ntot))
        .select(
            "lang",
            F.expr("CAST(FLOOR((weight * n_total) / 2) AS BIGINT)").alias("target"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rn") <= F.col("target"))
        .select("lang", "doc_id")
    )


def pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate each language's docs in doc_id
    order and split at 512-token boundaries (the concat-then-chunk packing
    every pretraining batcher uses). A doc belongs to the bin its first
    token lands in; ``n_straddlers`` counts docs crossing a boundary.
    Integer window math only — exact in both engines."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", X.token_count(F.col("text")).alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    packed = docs.withColumn("bin", F.floor(before / _PACK_BUDGET)).withColumn(
        "straddles",
        F.floor(before / _PACK_BUDGET)
        != F.floor((before + F.col("n_tokens") - 1) / _PACK_BUDGET),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.sum(F.col("straddles").cast("long")).cast("bigint").alias("n_straddlers"),
    )


def time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: densify per-user hourly activity onto the full
    hour grid (``F.sequence`` + explode — range generation stays on
    executors, no driver loop) and carry the last observed hourly total
    forward into silent hours. The hypertable-rollup shape: grid size is
    |users| × |hours| (dimension-bounded, not data-bounded), the event agg
    is one hash shuffle, the fill is one window per user."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < _GAPFILL_USERS)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
    )
    hourly = ev.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").alias("sv"),
    )
    bounds = ev.groupBy().agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    hours = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h")
    )
    grid = ev.select("user_id").distinct().crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .withColumn("carry", F.last("sv", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm").alias("hour"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("sv"), F.lit(0)).cast("double").alias("hour_value"),
            F.coalesce(F.col("carry"), F.lit(0)).cast("double").alias("carry_value"),
        )
    )


def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measures in ONE scan:
    all first/second moments accumulate as exact DECIMAL sums (one hash-free
    global agg with map-side partials), then the correlation formula runs
    on identical exact inputs in both engines — so the doubles match
    bit-for-bit despite being float math. The built-in ``corr()`` aggregate
    would be order-dependent; this is the scalable exact formulation."""
    li = load(spark, sf_dir, "lineitem")
    dec = {c: F.col(c).cast("decimal(18,2)") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec[c]).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(dec[c] * dec[c]).cast("double").alias(f"ss_{c}"))
    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum(dec[a] * dec[b]).cast("double").alias(f"sp_{a}_{b}"))
    moments = li.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n")
        num = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")) * F.sqrt(
            n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        )
        return F.round(num / den, 6)

    stacked = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                corr_expr(a, b).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return moments.select(F.explode(stacked).alias("p")).select("p.*")


_ANOM_MIN_N = 20       # prior observations required before flagging
_ANOM_SIGMA = 3.0      # |z| threshold
_RESERVOIR_K = 25      # docs kept per language


def reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: keep the 25 docs per language
    whose md5(doc_id) sorts lowest — the balanced-subset step after
    mixture weighting decides per-domain budgets. Hash order is a uniform
    random order that every engine, partitioning, and retry agrees on
    (same contract as ``stratified_sample``'s global threshold); one rank
    window per group, no RNG state."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .select("doc_id", "lang", "source", "rk")
    )


def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user streaming-style anomaly detection, batch formulation: flag
    each event whose value deviates >3σ from that user's EXPANDING history
    (only events strictly before it, in time order) — exactly the state a
    streaming detector carries, expressed as window cumulatives.

    Determinism: the expanding sums accumulate as DECIMAL (exact, so the
    engines agree bit-for-bit), and the mean/σ math runs on those exact
    inputs. One shuffle on user_id; history never materializes anywhere."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = ev.select(
        "event_id",
        "user_id",
        F.col("v").cast("double").alias("value"),
        F.count(F.lit(1)).over(w).alias("pre_n"),
        F.sum("v").over(w).cast("double").alias("pre_s"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("double").alias("pre_ss"),
    )
    mean = F.col("pre_s") / F.col("pre_n")
    var = (F.col("pre_ss") - F.col("pre_s") * F.col("pre_s") / F.col("pre_n")) / F.col(
        "pre_n"
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        pre.filter(F.col("pre_n") >= _ANOM_MIN_N)
        .withColumn("z", F.round(z, 6))
        .filter(F.abs(F.col("z")) > _ANOM_SIGMA)
        .select("user_id", "event_id", "value", "z")
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy against the corpus unigram LM — the
    cheap perplexity proxy used to quality-rank crawl text (low = generic
    or repetitive, high = rare-token soup; both tails get filtered).

    Cross-engine determinism: each token's −ln p is rounded to 6 decimals
    and summed as DECIMAL(18,6) — order-independent exact addition — so the
    float-sum nondeterminism of a plain double aggregate never appears.
    Plan: the heavy lineage — explode → (doc, term, count) → per-term
    window count → per-doc agg — is consumed exactly ONCE (a DAG with two
    consumers of the tf relation would recompute it: Catalyst shares no
    common subplans and AQE defeated ReuseExchange here, measured 3 corpus
    scans before this shape). Per-term corpus counts come from a window
    over the term partitioning instead of a vocab join; the ONE global
    scalar (total tokens) comes from a separate map-only scan (no explode
    shuffle) broadcast as a 1-row relation. A token's contribution is
    count × −ln p — exact decimal by integer arithmetic."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    terms = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tc"))
    total = docs.groupBy().agg(
        F.sum(X.token_count(F.col("text"))).alias("total")
    )
    cnt = F.sum("tc").over(Window.partitionBy("term"))
    scored = (
        tf.withColumn("cnt", cnt)
        .crossJoin(F.broadcast(total))
        .withColumn(
            "neg_logp",
            F.round(F.log(F.col("total").cast("double") / F.col("cnt")), 6).cast(
                "decimal(18,6)"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tc").cast("bigint").alias("n_tokens"),
        F.sum(F.col("tc") * F.col("neg_logp")).alias("sum_nlp"),
    )
    xent = F.round(F.col("sum_nlp").cast("double") / F.col("n_tokens"), 6)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        xent.alias("xent"),
        F.round(F.exp(xent), 6).alias("ppl"),
    )


def profile_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via ``approx_percentile`` (Greenwald-Khanna,
    bounded memory per group) — the 100 TB path where exact quantiles'
    full sort is off the table. Sketch internals are engine-specific, so
    the oracle checks the *guarantee* instead of the estimate: GK with
    accuracy=10000 returns an element whose rank is within n/10000 of the
    target, so the returned value must lie between the exact interpolated
    quantiles at p ∓ 0.002 (20× the rank guarantee — monotonicity of the
    sorted sequence makes the bracket sound). The exact quartiles are
    cross-checked value-for-value; the ``*_ok`` booleans are TRUE in the
    oracle, so a hash match proves the sketch honours its error bound."""
    li = load(spark, sf_dir, "lineitem")
    approx = F.expr(
        "approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 10000)"
    )
    exact = F.expr(
        "percentile(l_quantity, array(0.248D, 0.25D, 0.252D,"
        " 0.498D, 0.5D, 0.502D, 0.748D, 0.75D, 0.752D))"
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        approx.alias("a"),
        exact.alias("e"),
    )

    def ok(i: int) -> F.Column:
        a = F.col("a")[i].cast("double")
        return (F.col("e")[3 * i] <= a) & (a <= F.col("e")[3 * i + 2])

    return agg.select(
        "l_returnflag",
        "n_rows",
        F.round(F.col("e")[1], 6).alias("q1_exact"),
        F.round(F.col("e")[4], 6).alias("median_exact"),
        F.round(F.col("e")[7], 6).alias("q3_exact"),
        ok(0).alias("q1_ok"),
        ok(1).alias("median_ok"),
        ok(2).alias("q3_ok"),
    )


def vector_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN: exact cosine top-3 for EACH of 5 query vectors in one
    pass — the query side broadcasts, the corpus is scanned once, and the
    rank window shuffles only the scored rows on q_id."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _BATCH_Q).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.filter(F.col("vec_id") >= _BATCH_Q)
        .crossJoin(F.broadcast(queries))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.round(V.cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _BATCH_TOPK)
        .select("q_id", "vec_id", "label", "cos_sim", "rk")
    )


# ------------------------------------------------------------------ oracles
# Jensen-Shannon divergence — group split and the per-term contribution,
# ONE shared SQL text used verbatim by both engines so the double op
# sequence (divides, ln, multiplies) is textually identical; the
# transcendental result is rounded then summed as exact DECIMAL (the
# unigram_logprob discipline), so accumulation order can't differ.
_JS_GRP = "CASE WHEN CAST(SUBSTR(source, 4) AS INT) < 10 THEN 'a' ELSE 'b' END"
_JS_PA = "(CAST(na AS DOUBLE) / tot_a)"
_JS_PB = "(CAST(nb AS DOUBLE) / tot_b)"
_JS_M = f"(({_JS_PA} + {_JS_PB}) / 2)"
_JS_CONTRIB = (
    f"CAST(ROUND("
    f"(CASE WHEN na > 0 THEN 0.5 * {_JS_PA} * ln({_JS_PA} / {_JS_M}) ELSE 0.0 END)"
    f" + "
    f"(CASE WHEN nb > 0 THEN 0.5 * {_JS_PB} * ln({_JS_PB} / {_JS_M}) ELSE 0.0 END)"
    f", 12) AS DECIMAL(28,14))"
)


def source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of two
    source halves (src0-9 vs src10-19) — the distribution-shift metric
    used when planning mixture weights or detecting source drift.

    Plan: one explode → one term aggregation with per-group conditional
    counts (a SINGLE shuffle carries both distributions); group token
    totals come from a separate map-only scan broadcast as one row; the
    per-term JS contribution is a fixed double op sequence rounded to 12
    decimals and summed as exact DECIMAL. Scales: the vocab relation is
    post-aggregation (|vocab| rows), and nothing else leaves the map
    side."""
    docs = load(spark, sf_dir, "documents").select(
        F.expr(_JS_GRP).alias("g"), "text"
    )
    counts = (
        docs.select("g", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.when(F.col("g") == "a", 1)).alias("na"),
            F.count(F.when(F.col("g") == "b", 1)).alias("nb"),
        )
    )
    totals = docs.agg(
        F.sum(F.when(F.col("g") == "a", X.token_count(F.col("text")))).alias("tot_a"),
        F.sum(F.when(F.col("g") == "b", X.token_count(F.col("text")))).alias("tot_b"),
    )
    scored = counts.crossJoin(F.broadcast(totals)).withColumn(
        "contrib", F.expr(_JS_CONTRIB)
    )
    return scored.agg(
        F.round(F.sum("contrib").cast("double"), 9).alias("js_nats"),
        F.count(F.when(F.col("na") > 0, 1)).cast("bigint").alias("n_terms_a"),
        F.count(F.when(F.col("nb") > 0, 1)).cast("bigint").alias("n_terms_b"),
        F.count(F.when((F.col("na") > 0) & (F.col("nb") > 0), 1))
        .cast("bigint")
        .alias("n_shared_terms"),
    )


_TOKS = X.sql_tokens("text")

ROWS_ONLY: tuple[str, ...] = ()

def _corr_matrix_oracle() -> str:
    moment_cols = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        moment_cols.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}"
        )
        moment_cols.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS ss_{c}"
        )
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]]
    for a, b in pairs:
        moment_cols.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS DOUBLE) AS sp_{a}_{b}"
        )
    selects = " UNION ALL ".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
               ROUND((n * sp_{a}_{b} - s_{a} * s_{b})
                     / (sqrt(n * ss_{a} - s_{a} * s_{a})
                        * sqrt(n * ss_{b} - s_{b} * s_{b})), 6) AS corr
            FROM m"""
        for a, b in pairs
    )
    return f"WITH m AS (SELECT {', '.join(moment_cols)} FROM lineitem) {selects}"


ORACLE: dict[str, str] = {
    "profile_quantiles_approx": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS q1_exact,
               ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS median_exact,
               ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS q3_exact,
               TRUE AS q1_ok, TRUE AS median_ok, TRUE AS q3_ok
        FROM lineitem GROUP BY l_returnflag
    """,
    "time_gapfill": f"""
        WITH ev AS (
          SELECT user_id, date_trunc('hour', ts) AS h,
                 CAST(value AS DECIMAL(18,2)) AS v
          FROM events WHERE user_id < {_GAPFILL_USERS}
        ),
        hourly AS (
          SELECT user_id, h, CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS sv
          FROM ev GROUP BY user_id, h
        ),
        b AS (SELECT min(h) AS mn, max(h) AS mx FROM ev),
        hours AS (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b),
        grid AS (
          SELECT u.user_id, hours.h
          FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN hours
        )
        SELECT user_id, strftime(h, '%Y-%m-%d %H:%M') AS hour,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               CAST(COALESCE(sv, 0) AS DOUBLE) AS hour_value,
               CAST(COALESCE(last_value(sv IGNORE NULLS) OVER (
                      PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ), 0) AS DOUBLE) AS carry_value
        FROM grid LEFT JOIN hourly USING (user_id, h)
    """,
    "corr_matrix": _corr_matrix_oracle(),
    "reservoir_per_group": f"""
        SELECT doc_id, lang, source, rk FROM (
          SELECT doc_id, lang, source,
                 CAST(ROW_NUMBER() OVER (
                        PARTITION BY lang
                        ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                      ) AS BIGINT) AS rk
          FROM documents
        ) WHERE rk <= {_RESERVOIR_K}
    """,
    "anomaly_zscore": f"""
        WITH pre AS (
          SELECT event_id, user_id,
                 CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
                 COUNT(*) OVER w AS pre_n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS pre_s,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))
                          * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS pre_ss
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id, value,
               ROUND((value - pre_s / pre_n)
                     / sqrt((pre_ss - pre_s * pre_s / pre_n) / pre_n), 6) AS z
        FROM pre
        WHERE pre_n >= {_ANOM_MIN_N}
          AND ABS(ROUND((value - pre_s / pre_n)
                        / sqrt((pre_ss - pre_s * pre_s / pre_n) / pre_n), 6))
              > {_ANOM_SIGMA}
    """,
    "source_js_divergence": f"""
        WITH docs AS (
          SELECT {_JS_GRP} AS g, text FROM documents
        ),
        counts AS (
          SELECT term,
                 COUNT(CASE WHEN g = 'a' THEN 1 END) AS na,
                 COUNT(CASE WHEN g = 'b' THEN 1 END) AS nb
          FROM (SELECT g, UNNEST({_TOKS}) AS term FROM docs)
          GROUP BY term
        ),
        totals AS (
          SELECT SUM(CASE WHEN g = 'a'
                     THEN CAST(len({_TOKS}) AS BIGINT) END) AS tot_a,
                 SUM(CASE WHEN g = 'b'
                     THEN CAST(len({_TOKS}) AS BIGINT) END) AS tot_b
          FROM docs
        ),
        scored AS (
          SELECT {_JS_CONTRIB} AS contrib, na, nb
          FROM counts CROSS JOIN totals
        )
        SELECT ROUND(CAST(SUM(contrib) AS DOUBLE), 9) AS js_nats,
               CAST(COUNT(CASE WHEN na > 0 THEN 1 END) AS BIGINT) AS n_terms_a,
               CAST(COUNT(CASE WHEN nb > 0 THEN 1 END) AS BIGINT) AS n_terms_b,
               CAST(COUNT(CASE WHEN na > 0 AND nb > 0 THEN 1 END) AS BIGINT)
                 AS n_shared_terms
        FROM scored
    """,
    "unigram_logprob": f"""
        WITH terms AS (
          SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tc FROM terms GROUP BY doc_id, term
        ),
        vocab AS (
          SELECT term, SUM(tc) AS cnt FROM tf GROUP BY term
        ),
        tot AS (SELECT SUM(cnt) AS total FROM vocab),
        logp AS (
          SELECT term,
                 CAST(ROUND(ln(CAST(total AS DOUBLE) / cnt), 6)
                      AS DECIMAL(18,6)) AS neg_logp
          FROM vocab CROSS JOIN tot
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(SUM(tc) AS BIGINT) AS n_tokens,
                 SUM(tc * neg_logp) AS sum_nlp
          FROM tf JOIN logp USING (term)
          GROUP BY doc_id
        )
        SELECT doc_id, n_tokens,
               ROUND(CAST(sum_nlp AS DOUBLE) / n_tokens, 6) AS xent,
               ROUND(exp(ROUND(CAST(sum_nlp AS DOUBLE) / n_tokens, 6)), 6) AS ppl
        FROM per_doc
    """,
    "repetition_gates": f"""
        WITH terms AS (
          SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
        ),
        tc AS (
          SELECT doc_id, term, COUNT(*) AS cnt FROM terms GROUP BY doc_id, term
        ),
        per AS (
          SELECT doc_id,
                 CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_uniq,
                 MAX(cnt) AS top_cnt
          FROM tc GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_uniq,
               ROUND(1.0 - CAST(n_uniq AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
               ROUND(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_token_frac,
               ROUND(1.0 - CAST(n_uniq AS DOUBLE) / n_tokens, 6) <= {_DUP_FRAC_MAX}
                 AS passes
        FROM per
    """,
    "mixture_apply": f"""
        WITH counts AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
        ),
        powed AS (
          SELECT lang, pow(CAST(n_docs AS DOUBLE), {_MIX_ALPHA}) AS p
          FROM counts
        ),
        tot AS (SELECT SUM(p) AS p_tot FROM powed),
        ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
        targets AS (
          SELECT lang,
                 CAST(FLOOR((ROUND(p / p_tot, 6) * n_total) / 2) AS BIGINT)
                   AS target
          FROM powed CROSS JOIN tot CROSS JOIN ntot
        ),
        ranked AS (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        )
        SELECT lang, doc_id
        FROM ranked JOIN targets USING (lang)
        WHERE rn <= target
    """,
    "mixture_weights": f"""
        WITH counts AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
        ),
        powed AS (
          SELECT lang, n_docs, pow(CAST(n_docs AS DOUBLE), {_MIX_ALPHA}) AS p
          FROM counts
        ),
        tot AS (SELECT SUM(p) AS p_tot FROM powed)
        SELECT lang, n_docs,
               ROUND(p / p_tot, 6) AS weight,
               CAST(FLOOR(ROUND(p / p_tot, 6) * {_MIX_SCALE}) AS BIGINT)
                 AS target_docs
        FROM powed CROSS JOIN tot
    """,
    "pack_greedy": f"""
        WITH toks AS (
          SELECT doc_id, lang, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
          FROM documents
        ),
        packed AS (
          SELECT lang,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) - n_tokens
                   AS before_toks,
                 n_tokens
          FROM toks
        )
        SELECT lang,
               CAST(FLOOR(before_toks / {_PACK_BUDGET}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(SUM(CASE WHEN FLOOR(before_toks / {_PACK_BUDGET})
                              <> FLOOR((before_toks + n_tokens - 1) / {_PACK_BUDGET})
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM packed
        GROUP BY lang, FLOOR(before_toks / {_PACK_BUDGET})
    """,
    "vector_topk_batch": f"""
        SELECT q_id, vec_id, label, cos_sim, rk FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id, e.label,
                 ROUND({V.sql_cosine('e.embedding', 'q.embedding')}, 6) AS cos_sim,
                 CAST(ROW_NUMBER() OVER (
                        PARTITION BY q.vec_id
                        ORDER BY ROUND({V.sql_cosine('e.embedding', 'q.embedding')}, 6)
                                   DESC, e.vec_id
                      ) AS BIGINT) AS rk
          FROM embeddings e
          CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id < {_BATCH_Q}) q
          WHERE e.vec_id >= {_BATCH_Q}
        ) WHERE rk <= {_BATCH_TOPK}
    """,
}
