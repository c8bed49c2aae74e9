"""Round-7-queue pipeline operators, batch 3: ranking agreement, shard
balance, and classical seasonal decomposition.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
stores records and defers analytics upstream; these extend the SURVEY.md
§2.3 dataset-ops tier: "do my two term-importance rankers agree?", "are
my training shards balanced?", "split the daily series into
trend/seasonal/residual".

Exact-arithmetic discipline throughout: integer counts, fixed-point ppm
scores via integer DIV over non-negative operands (Spark DIV truncates,
DuckDB ``//`` floors — identical only there), rank determinism via unique
tiebreaks, md5 hex as the cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.functions import text as X
from hadrodb_spark.operators.pipeline8 import _sdiv as _p8_sdiv
from hadrodb_spark.operators.relational import load, spread
from hadrodb_spark.operators.shared import shared_persist

# --- ranker_overlap_topk ---------------------------------------------------
# Two term-importance rankers over the same corpus: RAW frequency (total
# tf) vs a rarity-weighted score.  The rarity score is fixed-point integer
# — score = (1e6 * tf) DIV df — so BOTH rankings are engine-exact (a float
# idf would expose ln() rounding to the rank boundary).  Ties break on the
# term string; K values fixed.
_RANK_KS = (5, 10, 20)
_RANK_TOP = 20


def ranker_overlap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement between two term-importance rankers — top-K overlap and
    Jaccard at K ∈ {5, 10, 20}: the sanity check before swapping the
    scoring function of a keyword extractor (``tfidf_top_terms``'s float
    scores are for consumption; this comparison runs on the integer
    twin so the ranking itself is cross-engine exact).

    Exactness: tf/df are exact integers from ONE grouped aggregate over
    a single token explode (tf = count, df = distinct doc count); the
    rarity score is fixed-point ppm; both top-20 lists rank on
    (score, term) — total orders, no float anywhere.  The Jaccard
    denominator is the TRUE union size (n_f + n_g − overlap), so the
    metric stays correct even when the vocabulary is smaller than K.

    Scale shape: one token explode feeds ONE groupBy(term) producing
    (tf, df) together, PERSISTED via the shared registry — without the
    persist, Catalyst plans each TakeOrdered ranking as its own corpus
    scan (two tokenizations of 100 TB); with it, both rankings are
    TakeOrdered limits over the one materialized vocab relation
    (bounded by |vocab|, not corpus size).  The two ≤20-row ranked
    lists full-outer-join on term and broadcast onto the 3-row K
    relation.
    """
    docs = load(spark, sf_dir, "documents")
    scored = shared_persist(
        ("ranker_vocab_scored", spark.sparkContext.applicationId, sf_dir),
        lambda: docs.select(
            "doc_id", F.explode(X.tokens(F.col("text"))).alias("term")
        )
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .select(
            "term",
            "tf",
            F.expr("CAST((1000000 * tf) DIV df AS BIGINT)").alias("score_ppm"),
        ),
    )
    top_freq = (
        scored.orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(_RANK_TOP)
        .select("term", F.expr("ROW_NUMBER() OVER (ORDER BY tf DESC, term ASC)").alias("rf"))
    )
    top_rare = (
        scored.orderBy(F.col("score_ppm").desc(), F.col("term").asc())
        .limit(_RANK_TOP)
        .select(
            "term",
            F.expr(
                "ROW_NUMBER() OVER (ORDER BY score_ppm DESC, term ASC)"
            ).alias("rg"),
        )
    )
    both = top_freq.join(top_rare, "term", "full_outer")
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _RANK_KS])).alias("k")
    )
    joined = (
        ks.crossJoin(F.broadcast(both))
        .groupBy("k")
        .agg(
            F.sum(F.expr("CASE WHEN rf <= k THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_f"),
            F.sum(F.expr("CASE WHEN rg <= k THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_g"),
            F.sum(F.expr("CASE WHEN rf <= k AND rg <= k THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_overlap"),
        )
    )
    return joined.select(
        "k",
        "n_overlap",
        F.expr(
            "CAST((1000000 * n_overlap) DIV (n_f + n_g - n_overlap) AS BIGINT)"
        ).alias("jaccard_ppm"),
    ).orderBy("k")


# --- shard_balance ---------------------------------------------------------
_N_SHARDS = 64


def shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment audit: assign every document to one of
    64 shards by md5(doc_id) and report the balance — max/min/expected
    shard size and the max shard's overshoot in ppm.  Shard skew is
    straggler time on the training cluster; md5 gives the uniformity a
    naive ``doc_id % 64`` (sequential ids → correlated shards under
    range-partitioned writes) does not guarantee.

    Exactness: the shard id is the first 4 md5 hex digits (engine-
    identical string md5) mod 64 via integer arithmetic; all outputs are
    exact integers over non-negative operands.  ``min_shard`` is 0 when
    any of the 64 shards is EMPTY (the occupied-only minimum would hide
    exactly the imbalance the audit exists to surface);
    ``expected_shard`` is the uniform n_docs DIV 64 target.

    Scale shape: map-only assignment into ONE map-side-combined
    groupBy(shard) — 64 rows out regardless of corpus size; the final
    reduce runs on those 64 rows.
    """
    docs = load(spark, sf_dir, "documents")
    shards = (
        docs.select(
            F.expr(
                f"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10)"
                f" AS BIGINT) % {_N_SHARDS}"
            ).alias("shard")
        )
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return shards.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards_used"),
        F.sum("c").cast("bigint").alias("n_docs"),
        F.min("c").cast("bigint").alias("min_occupied"),
        F.max("c").cast("bigint").alias("max_shard"),
    ).select(
        "n_shards_used",
        "n_docs",
        F.expr(
            f"CAST(CASE WHEN n_shards_used < {_N_SHARDS} THEN 0"
            " ELSE min_occupied END AS BIGINT)"
        ).alias("min_shard"),
        "max_shard",
        F.expr(f"CAST(n_docs DIV {_N_SHARDS} AS BIGINT)").alias(
            "expected_shard"
        ),
        F.expr(
            f"CAST((1000000 * {_N_SHARDS} * max_shard) DIV n_docs AS BIGINT)"
        ).alias("max_load_ppm"),
    )


# --- seasonal_decompose_daily -----------------------------------------------
# Classical additive decomposition on the DAILY revenue series: trend = the
# 7-CALENDAR-day centered moving average — a RANGE window on the day
# number, so a gap in the series shrinks the window instead of silently
# stretching it across more than 7 calendar days; trend is emitted only
# where all 7 days are present (the textbook full-window convention) —
# detrended = value − trend, seasonal(dow) = mean of detrended over that
# weekday, residual = detrended − seasonal.  Every mean is an integer-cents
# division of a sum that can be negative, spelled via pipeline8's _sdiv
# (sign-factored, so Spark's truncating DIV ≡ DuckDB's flooring //).
_MA_WIN = "(ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)"


def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical trend/seasonal/residual decomposition of daily event
    revenue — the first diagnostic on any business time series, and the
    additive counterpart of ``seasonal_dow_index``'s multiplicative
    profile (``autocorr_daily`` measures what's left in the residual).

    Exactness: daily totals are exact integer cents; the centered MA is
    a 7-value integer sum over a CALENDAR-day RANGE window (gaps shrink
    the window — days spanning a gap emit NULL trend rather than a
    stretched average), divided sign-factored; seasonal means divide
    exact sums of possibly-negative detrended cents the same way.  No
    floats anywhere.

    Scale shape: the corpus reduces to one row per DAY in ONE map-side-
    combined aggregate; every window (centered MA, seasonal mean) runs
    over that bounded daily relation — days, not rows, bound all
    downstream work exactly as in ``autocorr_daily``.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(
                "CAST(FLOOR((unix_micros(ts) DIV 1000000) / 86400) AS BIGINT)"
            ).alias("day"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = f"SUM(rev_cents) OVER {_MA_WIN}"
    n = f"COUNT(*) OVER {_MA_WIN}"
    trended = daily.select(
        "day",
        "rev_cents",
        F.expr(
            f"CASE WHEN {n} = 7 THEN "
            + _p8_sdiv(f"({w})", "7", "DIV")
            + " ELSE NULL END"
        ).alias("trend_cents"),
    ).select(
        "*",
        F.expr("(day + 3) % 7").alias("dow"),
        F.expr("rev_cents - trend_cents").alias("detr_cents"),
    )
    seas = trended.filter(F.col("trend_cents").isNotNull()).groupBy("dow").agg(
        F.sum("detr_cents").alias("s_sum"),
        F.count(F.lit(1)).alias("s_n"),
    ).select(
        "dow",
        F.expr(_p8_sdiv("s_sum", "s_n", "DIV")).alias("seasonal_cents"),
    )
    return (
        trended.join(F.broadcast(seas), "dow")
        .filter(F.col("trend_cents").isNotNull())
        .select(
            "day",
            "rev_cents",
            "trend_cents",
            "seasonal_cents",
            F.expr("detr_cents - seasonal_cents").alias("residual_cents"),
        )
        .orderBy("day")
    )



# --- score_calibration_bins --------------------------------------------------
# Decile assignment via the score HISTOGRAM (the score_auc_dup discipline):
# bin(s) = (10 * cum_rows_below_s) DIV N, so tied scores share a bin and the
# boundary is pure integer arithmetic — no global rank window over raw rows.
_CAL_BINS = 10


def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a curation score: bucket the corpus into
    score deciles and report the observed positive (planted-duplicate)
    rate per bucket — the calibration companion to ``score_auc_dup``
    (AUC says *discrimination*; this says whether the score's LEVELS
    mean anything).  Score and label deliberately mirror score_auc_dup
    so the two reports describe the same classifier.

    Exactness: deciles come from integer cumulative counts over the
    score histogram (ties share a bin — the only convention that is
    total-order-free); rates and mean scores are fixed-point floor
    divisions of non-negative bigints.

    Scale shape: one keyed aggregate reduces the corpus to the score
    histogram (bounded by |distinct scores|, not rows); the cumulative
    window and the decile re-aggregate run on that relation.  No global
    rank over raw rows, no joins.
    """
    from pyspark.sql.window import Window

    scored = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("score"),
        F.when(F.col("doc_id") % 50 == 0, 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n1")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    binned = hist.select(
        "score",
        "n",
        "n1",
        F.expr(f"SUM(n) OVER ()").alias("total"),
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum"),
    ).select(
        "score",
        "n",
        "n1",
        F.expr(f"CAST(({_CAL_BINS} * cum) DIV total AS BIGINT)").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum("n1").cast("bigint").alias("n_pos"),
            F.min("score").cast("bigint").alias("min_score"),
            F.max("score").cast("bigint").alias("max_score"),
            F.sum(F.expr("score * n")).alias("s_sum"),
        )
        .select(
            "bin",
            "n_rows",
            "n_pos",
            "min_score",
            "max_score",
            F.expr("CAST((1000000 * n_pos) DIV n_rows AS BIGINT)").alias(
                "pos_rate_ppm"
            ),
            F.expr("CAST(s_sum DIV n_rows AS BIGINT)").alias("mean_score"),
        )
        .orderBy("bin")
    )


# --- poisson_bootstrap_ci ----------------------------------------------------
# The scalable bootstrap: per (row, replicate) weight ~ Poisson(1) drawn
# DETERMINISTICALLY from md5(row:replicate) via the inverse CDF on a 65536
# grid (thresholds below are round(CDF(k) * 65536) for k = 0..5; mass above
# is capped at 6 — P(w > 6) < 1e-4 at the grid's resolution).  Every weight
# is therefore identical on any engine, partitioning, or retry — the
# weighted_sample_ares determinism discipline applied to resampling.
_BOOT_B = 32
_BOOT_THRESH = (24109, 48219, 60273, 64292, 65296, 65497)
_BOOT_W = (
    "CASE WHEN u < 24109 THEN 0 WHEN u < 48219 THEN 1 WHEN u < 60273 THEN 2"
    " WHEN u < 64292 THEN 3 WHEN u < 65296 THEN 4 WHEN u < 65497 THEN 5"
    " ELSE 6 END"
)


def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value via the
    Poisson bootstrap — the resampling scheme that works on data too
    large to sample n-out-of-n (each row contributes an independent
    Poisson(1) count per replicate, so no replicate ever needs a global
    view).  Reports the point mean and the [p05, p95] band over 32
    replicate means.

    Exactness: weights are md5-derived integers (header note) — fully
    deterministic; replicate means are floor divisions of non-negative
    integer-cents sums; the band is a data-valued discrete percentile
    over the 32-row replicate relation.  Replicates that drew total
    weight 0 (possible only on toy inputs) are excluded, documented.

    Scale shape: the 32× expansion is map-side explode feeding ONE
    map-side-combined groupBy(replicate) — 32 groups out regardless of
    corpus size; no shuffle carries expanded rows.  At 100 TB this is
    32 passes' worth of map work in one scan and a 32-row reduce — the
    textbook reason the Poisson bootstrap exists.  Hash cost is 4 md5s
    per row, not 32: one 32-hex digest yields EIGHT independent 4-hex
    u16 draws, so the digest is computed per hash GROUP (b DIV 8) and
    sliced per replicate (b % 8) — measured 8× cheaper at sf0.1 with
    identical statistical properties.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    # the 32×-explode + per-group md5 is the heavy map work here; spread
    # the (unsplittable single-row-group) scan first so it parallelizes
    # (r12 optimization — measured: the whole expansion ran as ONE task)
    reps = (
        spread(spark, orders).select(
            "o_orderkey",
            "cents",
            F.explode(F.expr(f"sequence(0, {_BOOT_B // 8 - 1})")).alias("g"),
        )
        .select(
            "cents",
            "g",
            F.expr(
                "md5(concat(CAST(o_orderkey AS STRING), ':',"
                " CAST(g AS STRING)))"
            ).alias("h"),
        )
        .select(
            "cents",
            "g",
            "h",
            F.explode(F.expr("sequence(0, 7)")).alias("s"),
        )
        .select(
            F.expr("g * 8 + s").alias("b"),
            "cents",
            F.expr(
                "CAST(conv(substring(h, 4 * s + 1, 4), 16, 10) AS BIGINT)"
            ).alias("u"),
        )
    )
    means = (
        reps.select("b", "cents", F.expr(_BOOT_W).alias("w"))
        .groupBy("b")
        .agg(F.sum("w").alias("sw"), F.sum(F.expr("w * cents")).alias("swc"))
        .filter(F.col("sw") > 0)
        .select(F.expr("CAST(swc DIV sw AS BIGINT)").alias("rep_mean"))
    )
    point = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.expr("CAST(SUM(cents) DIV COUNT(*) AS BIGINT)").alias("mean_cents"),
    )
    band = means.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.expr(
            "CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY rep_mean)"
            " AS BIGINT)"
        ).alias("ci_lo_cents"),
        F.expr(
            "CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY rep_mean)"
            " AS BIGINT)"
        ).alias("ci_hi_cents"),
    )
    return point.crossJoin(F.broadcast(band))


ORACLE: dict[str, str] = {
    "score_calibration_bins": f"""
        WITH scored AS (
          SELECT CAST(n_chars AS BIGINT) AS score,
                 CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END AS y
          FROM documents
        ),
        hist AS (
          SELECT score, COUNT(*) AS n, SUM(y) AS n1 FROM scored GROUP BY score
        ),
        binned AS (
          SELECT score, n, n1,
                 CAST(({_CAL_BINS} * COALESCE(SUM(n) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                      // (SUM(n) OVER ()) AS BIGINT) AS bin
          FROM hist
        )
        SELECT bin,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(n1) AS BIGINT) AS n_pos,
               CAST(MIN(score) AS BIGINT) AS min_score,
               CAST(MAX(score) AS BIGINT) AS max_score,
               CAST((1000000 * SUM(n1)) // SUM(n) AS BIGINT) AS pos_rate_ppm,
               CAST(SUM(score * n) // SUM(n) AS BIGINT) AS mean_score
        FROM binned
        GROUP BY bin
        ORDER BY bin
    """,
    "poisson_bootstrap_ci": f"""
        WITH o AS (
          SELECT o_orderkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        reps AS (
          SELECT g * 8 + s AS b, cents,
                 CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
                        || ':' || CAST(g AS VARCHAR)), 4 * s + 1, 4))
                      AS BIGINT) AS u
          FROM o,
               (SELECT unnest(generate_series(0, {_BOOT_B // 8 - 1})) AS g),
               (SELECT unnest(generate_series(0, 7)) AS s)
        ),
        means AS (
          SELECT CAST(SUM(w * cents) // SUM(w) AS BIGINT) AS rep_mean
          FROM (SELECT b, cents, {_BOOT_W} AS w FROM reps)
          GROUP BY b HAVING SUM(w) > 0
        ),
        point AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents
          FROM o
        ),
        band AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
                 CAST(quantile_disc(rep_mean, 0.05) AS BIGINT) AS ci_lo_cents,
                 CAST(quantile_disc(rep_mean, 0.95) AS BIGINT) AS ci_hi_cents
          FROM means
        )
        SELECT * FROM point, band
    """,

    "ranker_overlap_topk": f"""
        WITH scored AS (
          SELECT term, COUNT(*) AS tf,
                 CAST((1000000 * COUNT(*)) // COUNT(DISTINCT doc_id)
                      AS BIGINT) AS score_ppm
          FROM (
            SELECT doc_id, unnest({X.sql_tokens("text")}) AS term
            FROM documents
          ) GROUP BY term
        ),
        top_freq AS (
          SELECT term, ROW_NUMBER() OVER (ORDER BY tf DESC, term ASC) AS rf
          FROM scored ORDER BY tf DESC, term ASC LIMIT {_RANK_TOP}
        ),
        top_rare AS (
          SELECT term,
                 ROW_NUMBER() OVER (ORDER BY score_ppm DESC, term ASC) AS rg
          FROM scored ORDER BY score_ppm DESC, term ASC LIMIT {_RANK_TOP}
        ),
        merged AS (
          SELECT COALESCE(f.term, g.term) AS term, f.rf, g.rg
          FROM top_freq f FULL OUTER JOIN top_rare g ON f.term = g.term
        ),
        ks AS (SELECT unnest([{", ".join(str(k) for k in _RANK_KS)}]) AS k),
        agg AS (
          SELECT k,
                 SUM(CASE WHEN rf <= k THEN 1 ELSE 0 END) AS n_f,
                 SUM(CASE WHEN rg <= k THEN 1 ELSE 0 END) AS n_g,
                 SUM(CASE WHEN rf <= k AND rg <= k THEN 1 ELSE 0 END) AS ov
          FROM ks CROSS JOIN merged
          GROUP BY k
        )
        SELECT k,
               CAST(ov AS BIGINT) AS n_overlap,
               CAST((1000000 * ov) // (n_f + n_g - ov) AS BIGINT)
                 AS jaccard_ppm
        FROM agg
        ORDER BY k
    """,
    "shard_balance": f"""
        WITH shards AS (
          SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                      AS BIGINT) % {_N_SHARDS} AS shard,
                 COUNT(*) AS c
          FROM documents
          GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_shards_used,
               CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(CASE WHEN COUNT(*) < {_N_SHARDS} THEN 0 ELSE MIN(c) END
                    AS BIGINT) AS min_shard,
               CAST(MAX(c) AS BIGINT) AS max_shard,
               CAST(SUM(c) // {_N_SHARDS} AS BIGINT) AS expected_shard,
               CAST((1000000 * {_N_SHARDS} * MAX(c)) // SUM(c) AS BIGINT)
                 AS max_load_ppm
        FROM shards
    """,
    "seasonal_decompose_daily": f"""
        WITH daily AS (
          SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev_cents
          FROM events GROUP BY 1
        ),
        trended AS (
          SELECT day, rev_cents,
                 CASE WHEN COUNT(*) OVER w = 7 THEN
                   {_p8_sdiv("(SUM(rev_cents) OVER w)", "7", "//")}
                 ELSE NULL END AS trend_cents,
                 (day + 3) % 7 AS dow
          FROM daily
          WINDOW w AS {_MA_WIN}
        ),
        detr AS (
          SELECT *, rev_cents - trend_cents AS detr_cents FROM trended
        ),
        seas AS (
          SELECT dow,
                 {_p8_sdiv("SUM(detr_cents)", "COUNT(*)", "//")}
                   AS seasonal_cents
          FROM detr WHERE trend_cents IS NOT NULL GROUP BY dow
        )
        SELECT day,
               CAST(rev_cents AS BIGINT) AS rev_cents,
               CAST(trend_cents AS BIGINT) AS trend_cents,
               CAST(seasonal_cents AS BIGINT) AS seasonal_cents,
               CAST(detr_cents - seasonal_cents AS BIGINT) AS residual_cents
        FROM detr JOIN seas USING (dow)
        WHERE trend_cents IS NOT NULL
        ORDER BY day
    """,
}
