"""Round-9 statistical-audit tier 2: the multi-group / association /
calibration statistics that complete the round-8 hypothesis-test family —
Kruskal-Wallis (k-group rank ANOVA), Kendall tau-b (monotone association
without Spearman's raw-rank joins), Brown-Forsythe/Levene (variance
homogeneity — the precondition the plain ANOVA silently assumes),
split-conformal coverage (finite-sample prediction-interval calibration,
the modern ML-ops audit), and an embedding pair-cosine histogram (the
representation-collapse diagnostic for embedding pipelines).

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
is a record store that defers analytics upstream; SURVEY.md §2.3 scopes
dataset-health audits on top of it.

Exactness discipline (the repo invariant): counts, rank sums, and tie
terms stay exact integers (cent/ppm fixed point, DECIMAL(38,0) routing
for anything ~N² — the r8/r9 overflow class); every division or
transcendental runs ONCE under a SHARED op-order text, rounded at 6;
every ORDER BY/LIMIT ranks on exact integers or rounded values with a
unique tiebreak; NULL inputs are excluded BEFORE any rank/count grid
(the engines' default NULL sort positions differ).

Scale design (per-query stories in the docstrings): every statistic
reduces to a bounded-cardinality aggregate before any window or join —
cent-quantized rank grids, a constant 512×512 censored dominance grid,
|types|-row moment relations, a 512-row md5-selected pair sample.  The
only full-data shuffles are map-side-combined counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import text as X
from hadrodb_spark.functions import vectors as V
from hadrodb_spark.operators import shared
from hadrodb_spark.operators.relational import load

ROWS_ONLY: tuple[str, ...] = ()

ORACLE: dict[str, str] = {}


# --- kruskal_wallis_value --------------------------------------------------
# Doubled midranks over the GLOBAL cent grid: 2r(v) = 2·lt(v) + ct(v) + 1
# (lt/ct = counts below / at v across ALL groups), so per-group doubled
# rank sums are exact integers.  H uses the computational form
#   H = 12/(N(N+1)) · Σ Rᵢ²/nᵢ − 3(N+1)   (Rᵢ = two_rᵢ/2)
# with the tie correction C = 1 − Σ(t³−t)/(N³−N).

_KW_TERM = (
    "ROUND(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)"
    " / 4.0 / CAST(n_i AS DOUBLE), 6)"
)
_KW_H = (
    "ROUND(12.0 * CAST(term_sum AS DOUBLE)"
    " / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0))"
    " - 3.0 * (CAST(n_tot AS DOUBLE) + 1.0), 6)"
)
_KW_HC = (
    "ROUND(h / (1.0 - CAST(tie_sum AS DOUBLE)"
    " / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)"
    "    * CAST(n_tot AS DOUBLE) - CAST(n_tot AS DOUBLE))), 6)"
)


def kruskal_wallis_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test of `value` across ALL event types at once —
    the k-group completion of ``mannwhitney_shift`` (MW answers pairwise
    vs 'purchase'; KW answers "does ANY type's value distribution sit
    elsewhere" without k² pairwise tests), and the nonparametric twin of
    ``anova_value_by_type``.  NULL values are excluded up front (no rank
    for missing data; engine NULL orderings differ).

    Exactness: values quantize to exact cents; doubled midranks come from
    the global per-cent count grid (2r = 2·lt + ct + 1 — all integers);
    per-group doubled rank sums accumulate as DECIMAL(38,0) (the ~2N²
    overflow class); Σ Rᵢ²/nᵢ is one shared float text per group rounded
    at 6 and DECIMAL-summed; H and the tie-corrected H (correction from
    the exact Σ(t³−t) grid sum) are single shared float texts.  Both are
    NULL on degenerate inputs (N ≤ 1 or all values tied ⇒ C = 0).

    Scale: ONE map-side-combined (event_type, cents) count is the only
    full-data shuffle; the global rank window runs over the per-cent
    grid (bounded by the cent domain — the source_ks_shift argument);
    everything else is |types|-row arithmetic.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    counts = shared.shared_persist(
        ("kw_counts", spark.sparkContext.applicationId, sf_dir),
        lambda: ev.groupBy("event_type", "cents").agg(
            F.count(F.lit(1)).alias("c")
        ),
    )
    vtot = counts.groupBy("cents").agg(F.sum("c").alias("ct"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    vrank = vtot.select(
        "cents",
        "ct",
        F.coalesce(F.sum("ct").over(w), F.lit(0)).alias("lt"),
    )
    per_group = (
        counts.join(vrank, "cents")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_i"),
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * (2 * F.col("lt") + F.col("ct") + 1)
            ).alias("two_r"),
        )
    )
    glob = vtot.groupBy().agg(
        F.sum("ct").cast("bigint").alias("n_tot"),
        F.sum(
            F.col("ct").cast("decimal(38,0)")
            * F.col("ct")
            * F.col("ct")
            - F.col("ct")
        ).alias("tie_sum"),
    )
    reduced = (
        per_group.select(
            "event_type",
            "n_i",
            "two_r",
            F.expr(_KW_TERM).cast("decimal(38,6)").alias("term"),
        )
        .crossJoin(F.broadcast(glob))
    )
    wall = Window.partitionBy()
    scored = (
        reduced.withColumn("term_sum", F.sum("term").over(wall))
        .withColumn("k_types", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn(
            "h",
            F.expr(
                f"CASE WHEN n_tot <= 1 THEN NULL ELSE {_KW_H} END"
            ),
        )
        .withColumn(
            "h_tie_corrected",
            F.expr(
                "CASE WHEN h IS NULL OR tie_sum ="
                " CAST(n_tot AS DECIMAL(38,0)) * n_tot * n_tot - n_tot"
                f" THEN NULL ELSE {_KW_HC} END"
            ),
        )
    )
    return scored.select(
        "event_type",
        "n_i",
        F.col("two_r").cast("bigint").alias("two_r"),
        "k_types",
        "n_tot",
        "h",
        "h_tie_corrected",
    ).orderBy("event_type")


ORACLE["kruskal_wallis_value"] = f"""
    WITH counts AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
             COUNT(*) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    vrank AS (
      SELECT cents, ct,
             COALESCE(SUM(ct) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
      FROM (SELECT cents, SUM(c) AS ct FROM counts GROUP BY cents)
    ),
    per_group AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n_i,
             SUM(CAST(c AS HUGEINT) * (2 * lt + ct + 1)) AS two_r
      FROM counts JOIN vrank USING (cents)
      GROUP BY event_type
    ),
    gtot AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS n_tot,
             SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS tie_sum
      FROM (SELECT cents, SUM(c) AS ct FROM counts GROUP BY cents)
    ),
    reduced AS (
      SELECT event_type, n_i, two_r,
             CAST({_KW_TERM} AS DECIMAL(38,6)) AS term
      FROM per_group CROSS JOIN gtot
    ),
    scored AS (
      SELECT event_type, n_i, two_r, n_tot, tie_sum,
             SUM(term) OVER () AS term_sum,
             CAST(COUNT(*) OVER () AS BIGINT) AS k_types
      FROM reduced CROSS JOIN gtot
    ),
    with_h AS (
      SELECT *,
             CASE WHEN n_tot <= 1 THEN NULL ELSE {_KW_H} END AS h
      FROM scored
    )
    SELECT event_type, n_i, CAST(two_r AS BIGINT) AS two_r, k_types, n_tot,
           h,
           CASE WHEN h IS NULL OR tie_sum =
                CAST(n_tot AS HUGEINT) * n_tot * n_tot - n_tot
                THEN NULL ELSE {_KW_HC} END AS h_tie_corrected
    FROM with_h
    ORDER BY event_type
"""


# --- kendall_tau_censored --------------------------------------------------
_TAU_CAP = 511  # censored domain 0..511 ⇒ a CONSTANT 512×512 dominance grid

_TAU_EXPR = (
    "CASE WHEN (n_pairs_x2 - t2x) <= 0 OR (n_pairs_x2 - t2y) <= 0 THEN NULL"
    " ELSE ROUND(2.0 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))"
    " / SQRT((CAST(n_pairs_x2 AS DOUBLE) - CAST(t2x AS DOUBLE))"
    "      * (CAST(n_pairs_x2 AS DOUBLE) - CAST(t2y AS DOUBLE))), 6) END"
)


def kendall_tau_censored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between document LENGTH and TOKEN COUNT — the
    concordance twin of ``spearman_rank_corr`` (Spearman measures rank
    linearity; tau-b counts concordant vs discordant pairs, far more
    robust to a few extreme ranks).  Computed WITHOUT touching row pairs:
    values censor to a constant 512-bucket domain (LEAST(v, 511) — the
    ``source_ks_shift`` censoring contract: the censored tau IS the
    certified statistic, and every doc participates), observed (x, y)
    cells reduce to counts, and concordant/discordant pair totals come
    from 2D prefix sums over the CONSTANT 512×512 dense grid:

      conc = Σ n(x,y) · P(x−1, y−1)          (pairs strictly below-left)
      disc = Σ n(x,y) · (Px(x−1) − P(x−1, y)) (strictly below, strictly right)

    anchored at the larger x, so each unordered pair counts exactly once
    and ties (equal x or y) fall out of both — exactly tau-b's
    definition.  NULL x/y rows are excluded up front.

    Exactness: all pair totals are DECIMAL(38,0) sums of bigint products;
    tie terms t2x = Σ cx(cx−1), t2y likewise, and N(N−1) are exact; tau-b
    is ONE shared two-SQRT float text rounded at 6, NULL when either
    margin is fully tied.

    Scale: one map-side-combined (xb, yb) count is the only full-data
    shuffle; the dominance grid is 262 144 rows BY CONSTRUCTION with two
    512-partition windows; the three P-lookups are equi-joins of the
    sparse observed cells against that bounded grid.
    """
    base = (
        load(spark, sf_dir, "documents")
        .select(
            F.col("n_chars").alias("x"),
            X.token_count(F.col("text")).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .select(
            F.least(F.col("x"), F.lit(_TAU_CAP)).cast("long").alias("xb"),
            F.least(F.col("y"), F.lit(_TAU_CAP)).cast("long").alias("yb"),
        )
    )
    cells = shared.shared_persist(
        ("tau_cells", spark.sparkContext.applicationId, sf_dir),
        lambda: base.groupBy("xb", "yb").agg(F.count(F.lit(1)).alias("n")),
    )
    side = _TAU_CAP + 1
    grid = (
        spark.range(side)
        .select(F.col("id").alias("xb"))
        .crossJoin(spark.range(side).select(F.col("id").alias("yb")))
        .join(cells, ["xb", "yb"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    wy = (
        Window.partitionBy("xb")
        .orderBy("yb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wx = (
        Window.partitionBy("yb")
        .orderBy("xb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pfull = shared.shared_persist(
        ("tau_pfull", spark.sparkContext.applicationId, sf_dir),
        lambda: grid.withColumn("cy", F.sum("n").over(wy)).withColumn(
            "p", F.sum("cy").over(wx)
        ),
    )
    p_ll = pfull.select(
        (F.col("xb") + 1).alias("xb"),
        (F.col("yb") + 1).alias("yb"),
        F.col("p").alias("p_ll"),
    )
    p_l = pfull.select(
        (F.col("xb") + 1).alias("xb"),
        F.col("yb"),
        F.col("p").alias("p_l"),
    )
    p_row = pfull.filter(F.col("yb") == _TAU_CAP).select(
        (F.col("xb") + 1).alias("xb"), F.col("p").alias("px")
    )
    pairs = (
        cells.join(p_ll, ["xb", "yb"], "left")
        .join(p_l, ["xb", "yb"], "left")
        .join(F.broadcast(p_row), ["xb"], "left")
        .select(
            F.col("n").cast("decimal(38,0)").alias("n"),
            F.coalesce("p_ll", F.lit(0)).alias("p_ll"),
            F.coalesce("p_l", F.lit(0)).alias("p_l"),
            F.coalesce("px", F.lit(0)).alias("px"),
        )
        .groupBy()
        .agg(
            F.sum(F.col("n") * F.col("p_ll")).alias("conc"),
            F.sum(F.col("n") * (F.col("px") - F.col("p_l"))).alias("disc"),
        )
    )
    margins = cells.groupBy().agg(
        F.sum("n").cast("decimal(38,0)").alias("nd"),
    )
    tx = (
        cells.groupBy("xb")
        .agg(F.sum("n").alias("cx"))
        .groupBy()
        .agg(
            F.sum(
                F.col("cx").cast("decimal(38,0)") * (F.col("cx") - 1)
            ).alias("t2x")
        )
    )
    ty = (
        cells.groupBy("yb")
        .agg(F.sum("n").alias("cy"))
        .groupBy()
        .agg(
            F.sum(
                F.col("cy").cast("decimal(38,0)") * (F.col("cy") - 1)
            ).alias("t2y")
        )
    )
    return (
        pairs.crossJoin(F.broadcast(margins))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            F.col("nd").cast("bigint").alias("n_docs"),
            (F.col("nd") * (F.col("nd") - 1)).cast("decimal(38,0)").alias("_np2"),
            F.col("conc").cast("bigint").alias("concordant"),
            F.col("disc").cast("bigint").alias("discordant"),
            F.col("t2x").cast("bigint").alias("t2x"),
            F.col("t2y").cast("bigint").alias("t2y"),
        )
        .withColumn("n_pairs_x2", F.col("_np2").cast("bigint"))
        .drop("_np2")
        .withColumn(
            "tau_b",
            F.expr(
                _TAU_EXPR.replace("conc", "concordant").replace(
                    "disc", "discordant"
                )
            ),
        )
    )


ORACLE["kendall_tau_censored"] = f"""
    WITH base AS (
      SELECT LEAST(n_chars, {_TAU_CAP}) AS xb,
             LEAST(CAST(len({{toks}}) AS BIGINT), {_TAU_CAP}) AS yb
      FROM documents
      WHERE n_chars IS NOT NULL
        AND CAST(len({{toks}}) AS BIGINT) IS NOT NULL
    ),
    cells AS (
      SELECT xb, yb, COUNT(*) AS n FROM base GROUP BY xb, yb
    ),
    grid AS (
      SELECT gx.xb, gy.yb, COALESCE(cells.n, 0) AS n
      FROM (SELECT UNNEST(generate_series(0, {_TAU_CAP})) AS xb) gx
      CROSS JOIN (SELECT UNNEST(generate_series(0, {_TAU_CAP})) AS yb) gy
      LEFT JOIN cells USING (xb, yb)
    ),
    pfull AS (
      SELECT xb, yb,
             SUM(cy) OVER (PARTITION BY yb ORDER BY xb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM (
        SELECT xb, yb,
               SUM(n) OVER (PARTITION BY xb ORDER BY yb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cy
        FROM grid
      )
    ),
    pairs AS (
      SELECT SUM(CAST(c.n AS HUGEINT) * COALESCE(pll.p, 0)) AS conc,
             SUM(CAST(c.n AS HUGEINT)
                 * (COALESCE(prow.p, 0) - COALESCE(pl.p, 0))) AS disc
      FROM cells c
      LEFT JOIN pfull pll ON pll.xb = c.xb - 1 AND pll.yb = c.yb - 1
      LEFT JOIN pfull pl  ON pl.xb  = c.xb - 1 AND pl.yb  = c.yb
      LEFT JOIN (SELECT xb, p FROM pfull WHERE yb = {_TAU_CAP}) prow
             ON prow.xb = c.xb - 1
    ),
    margins AS (
      SELECT CAST(SUM(n) AS HUGEINT) AS nd FROM cells
    ),
    tx AS (
      SELECT SUM(CAST(cx AS HUGEINT) * (cx - 1)) AS t2x
      FROM (SELECT xb, SUM(n) AS cx FROM cells GROUP BY xb)
    ),
    ty AS (
      SELECT SUM(CAST(cy AS HUGEINT) * (cy - 1)) AS t2y
      FROM (SELECT yb, SUM(n) AS cy FROM cells GROUP BY yb)
    )
    SELECT CAST(nd AS BIGINT) AS n_docs,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           CAST(t2x AS BIGINT) AS t2x,
           CAST(t2y AS BIGINT) AS t2y,
           CAST(nd * (nd - 1) AS BIGINT) AS n_pairs_x2,
           {_TAU_EXPR.replace("conc", "concordant").replace("disc", "discordant").replace("n_pairs_x2", "CAST(nd * (nd - 1) AS BIGINT)")} AS tau_b
    FROM pairs CROSS JOIN margins CROSS JOIN tx CROSS JOIN ty
"""


# --- levene_variance_homogeneity -------------------------------------------
_LEV_GTERM = (
    "CAST(ROUND(CAST(ni * qi - si * si AS DOUBLE) / CAST(ni AS DOUBLE), 6)"
    " AS DECIMAL(38,6))"
)
_LEV_W = (
    # k = 1 (a single group) has no between-group variance to test —
    # NULL, not a /(k-1) ANSI divide-by-zero (hypothesis-caught).
    "CASE WHEN ssw_sum = 0 OR k <= 1 OR CAST(n_dec AS BIGINT) = k THEN NULL"
    " ELSE ROUND(((CAST(q_tot AS DOUBLE)"
    " - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)"
    "   / CAST(n_dec AS DOUBLE))"
    " - CAST(ssw_sum AS DOUBLE))"
    " / (k - 1)"
    " / (CAST(ssw_sum AS DOUBLE) / (CAST(n_dec AS BIGINT) - k)), 6)"
    " END"
)


def levene_variance_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    homogeneity for `value` across event types — the precondition
    ``anova_value_by_type`` silently assumes: ANOVA's F compares means
    under equal variances, and this W statistic is the standard gate
    (an ANOVA on the absolute deviations from each group's MEDIAN —
    median-centered per Brown-Forsythe, the robust-to-skew variant).

    Exactness: the group median is ``percentile_disc(0.5)`` (a data
    value — the only total-order-free convention, the ``winsorized``
    pattern); deviations |cents − median| are exact bigints; the ANOVA
    runs on exact DECIMAL moments with the same shared float texts as
    ``anova_value_by_type`` (NULL W on degenerate inputs).  NULL values
    are excluded up front.

    Scale: one keyed percentile aggregate (map-side partial) + one
    map-side-combined moment aggregate over the deviation column; all
    arithmetic on the |types|-row relation.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
        )
    )
    med = ev.groupBy("event_type").agg(
        F.expr(
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)"
        ).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("c") - F.col("med")).alias("z")
    )
    per_type = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ni"),
        F.sum(F.col("z").cast("decimal(38,0)")).alias("si"),
        F.sum(
            F.col("z").cast("decimal(38,0)") * F.col("z").cast("decimal(38,0)")
        ).alias("qi"),
    )
    reduced = per_type.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ni").alias("n_dec"),
        F.sum("si").alias("s_tot"),
        F.sum("qi").alias("q_tot"),
        F.sum(F.expr(_LEV_GTERM)).alias("ssw_sum"),
    )
    return reduced.select(
        "k",
        F.col("n_dec").cast("bigint").alias("n"),
        F.expr("CAST(k - 1 AS BIGINT)").alias("df_between"),
        F.expr("CAST(CAST(n_dec AS BIGINT) - k AS BIGINT)").alias("df_within"),
        F.expr(_LEV_W).alias("w_stat"),
    )


ORACLE["levene_variance_homogeneity"] = f"""
    WITH ev AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)
               AS med
      FROM ev GROUP BY event_type
    ),
    dev AS (
      SELECT ev.event_type, ABS(c - med) AS z
      FROM ev JOIN med USING (event_type)
    ),
    per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS ni,
             SUM(CAST(z AS DECIMAL(38,0))) AS si,
             SUM(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS qi
      FROM dev GROUP BY event_type
    ),
    reduced AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(ni) AS n_dec,
             SUM(si) AS s_tot,
             SUM(qi) AS q_tot,
             SUM({_LEV_GTERM}) AS ssw_sum
      FROM per_type
    )
    SELECT k,
           CAST(n_dec AS BIGINT) AS n,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(CAST(n_dec AS BIGINT) - k AS BIGINT) AS df_within,
           {_LEV_W} AS w_stat
    FROM reduced
"""


# --- conformal_coverage_audit ----------------------------------------------


def conformal_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration audit per event type: calibrate a
    one-sided upper bound on `value` at 90% on the even-event_id half
    with the FINITE-SAMPLE correction — q̂ = the ⌈(n_cal+1)·0.9⌉-th
    smallest calibration value, the split-conformal quantile (Vovk;
    Lei et al.) — then measure the ppm coverage it actually achieves on
    the odd half.  This is the modern ML-ops answer to "is my
    prediction-interval machinery calibrated on this data slice?".

    Exactness: the conformal rank k = ⌈(n_cal+1)·9/10⌉ is exact integer
    arithmetic ((9·(n_cal+1) + 9) DIV 10); q̂ is a DATA VALUE — the first
    cent value whose cumulative calibration count reaches k (computed on
    the bounded per-cent count grid, never a raw-row sort); coverage is
    an exact DECIMAL-DIV ppm.  When k exceeds n_cal (tiny groups), the
    bound is vacuous (+∞): q̂ is NULL and coverage 10⁶ by convention on
    both engines.  NULL values are excluded up front.

    Scale: one map-side-combined (type, parity, cents) count is the only
    full-data shuffle; the cumulative window runs per type over the
    bounded cent grid; everything downstream is |types|-row arithmetic.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("event_id") % 2 == 0).alias("is_cal"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
    )
    counts = shared.shared_persist(
        ("conformal_counts", spark.sparkContext.applicationId, sf_dir),
        lambda: ev.groupBy("event_type", "is_cal", "cents").agg(
            F.count(F.lit(1)).alias("c")
        ),
    )
    cal = counts.filter(F.col("is_cal")).select("event_type", "cents", "c")
    test = counts.filter(~F.col("is_cal")).select("event_type", "cents", "c")
    n_cal = cal.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_cal")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cal_cum = cal.withColumn("cum", F.sum("c").over(wc))
    ranked = cal_cum.join(F.broadcast(n_cal), "event_type").withColumn(
        "k_rank", F.expr("(9 * (n_cal + 1) + 9) DIV 10")
    )
    qhat = (
        ranked.filter(F.col("cum") >= F.col("k_rank"))
        .groupBy("event_type")
        .agg(F.min("cents").alias("qhat_cents"))
    )
    test_tot = test.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_test")
    )
    covered = (
        test.join(F.broadcast(qhat), "event_type")
        .filter(F.col("cents") <= F.col("qhat_cents"))
        .groupBy("event_type")
        .agg(F.sum("c").cast("bigint").alias("n_cov"))
    )
    return (
        n_cal.join(test_tot, "event_type", "full")
        .join(qhat, "event_type", "left")
        .join(covered, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_cal", F.lit(0)).alias("n_cal"),
            F.coalesce("n_test", F.lit(0)).alias("n_test"),
            F.expr("(9 * (COALESCE(n_cal, 0) + 1) + 9) DIV 10").alias("k_rank"),
            "qhat_cents",
            F.expr(
                "CASE WHEN COALESCE(n_test, 0) = 0 THEN NULL"
                " WHEN qhat_cents IS NULL THEN 1000000"
                " ELSE (CAST(COALESCE(n_cov, 0) AS DECIMAL(38,0)) * 1000000)"
                "      DIV n_test END"
            )
            .cast("bigint")
            .alias("coverage_ppm"),
        )
        .orderBy("event_type")
    )


ORACLE["conformal_coverage_audit"] = """
    WITH ev AS (
      SELECT event_type, event_id % 2 = 0 AS is_cal,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT event_type, is_cal, cents, COUNT(*) AS c
      FROM ev GROUP BY 1, 2, 3
    ),
    n_cal AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_cal
      FROM counts WHERE is_cal GROUP BY event_type
    ),
    cal_cum AS (
      SELECT event_type, cents,
             SUM(c) OVER (PARTITION BY event_type ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM counts WHERE is_cal
    ),
    qhat AS (
      SELECT cal_cum.event_type, MIN(cents) AS qhat_cents
      FROM cal_cum JOIN n_cal USING (event_type)
      WHERE cum >= (9 * (n_cal + 1) + 9) // 10
      GROUP BY cal_cum.event_type
    ),
    test_tot AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_test
      FROM counts WHERE NOT is_cal GROUP BY event_type
    ),
    covered AS (
      SELECT counts.event_type, CAST(SUM(c) AS BIGINT) AS n_cov
      FROM counts JOIN qhat USING (event_type)
      WHERE NOT is_cal AND cents <= qhat_cents
      GROUP BY counts.event_type
    )
    SELECT event_type,
           COALESCE(n_cal, 0) AS n_cal,
           COALESCE(n_test, 0) AS n_test,
           CAST((9 * (COALESCE(n_cal, 0) + 1) + 9) // 10 AS BIGINT) AS k_rank,
           qhat_cents,
           CAST(CASE WHEN COALESCE(n_test, 0) = 0 THEN NULL
                WHEN qhat_cents IS NULL THEN 1000000
                ELSE (CAST(COALESCE(n_cov, 0) AS HUGEINT) * 1000000)
                     // n_test END AS BIGINT) AS coverage_ppm
    FROM n_cal
    FULL JOIN test_tot USING (event_type)
    LEFT JOIN qhat USING (event_type)
    LEFT JOIN covered USING (event_type)
    ORDER BY event_type
"""


# --- embedding_pair_cosine_hist --------------------------------------------
_PAIR_K = 256  # deterministic pairs; sample = 2K vectors by md5 rank


def embedding_pair_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representation-collapse diagnostic: the cosine histogram over 256
    DETERMINISTIC random-ish vector pairs.  Healthy embedding spaces put
    random-pair cosine in a band around 0; a histogram piling up near
    +1 means the encoder collapsed (every doc maps to the same
    direction) — the standard audit before trusting ANN recall or
    semantic-dedup numbers at 100 TB.

    Determinism: the 2K-vector sample is the 512 smallest
    md5(vec_id) values (the repo's reproducible-sample convention);
    pair i joins the md5-rank-i vector with rank i+256 — no RNG, both
    engines select the identical pair set.  Cosine is the shared
    ``V.cosine``/``V.sql_cosine`` op order rounded at 6; the bin is
    FLOOR(cos·10) on that rounded double (identical doubles ⇒ identical
    bins); shares are exact ppm integers.

    Scale: the sample is a distributed TakeOrdered top-512 (no global
    sort materializes); the rank window runs over 512 rows BY
    CONSTRUCTION; the pair join is 256×256-row broadcast territory.
    """
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.md5(F.col("vec_id").cast("string")).alias("r"),
    )
    sample = shared.shared_persist(
        ("paircos_sample", spark.sparkContext.applicationId, sf_dir),
        lambda: emb.orderBy("r", "vec_id").limit(2 * _PAIR_K),
    )
    w = Window.orderBy("r", "vec_id")
    ranked = sample.withColumn("rk", F.row_number().over(w))
    a = ranked.filter(F.col("rk") <= _PAIR_K).select(
        F.col("rk").alias("pair_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = ranked.filter(F.col("rk") > _PAIR_K).select(
        (F.col("rk") - _PAIR_K).alias("pair_id"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
    )
    scored = a.join(F.broadcast(b), "pair_id").select(
        F.round(V.cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos")
    )
    return (
        scored.select(
            F.expr("CAST(FLOOR(cos * 10) AS BIGINT)").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn(
            "share_ppm",
            F.expr(
                f"(CAST(n_pairs AS DECIMAL(38,0)) * 1000000) DIV {_PAIR_K}"
            ).cast("bigint"),
        )
        .orderBy("bin")
    )


ORACLE["embedding_pair_cosine_hist"] = f"""
    WITH sample AS (
      SELECT vec_id, embedding, md5(CAST(vec_id AS VARCHAR)) AS r
      FROM embeddings
      ORDER BY r, vec_id
      LIMIT {2 * _PAIR_K}
    ),
    ranked AS (
      SELECT vec_id, embedding,
             ROW_NUMBER() OVER (ORDER BY r, vec_id) AS rk
      FROM sample
    ),
    pairs AS (
      SELECT a.embedding AS emb_a, b.embedding AS emb_b
      FROM (SELECT rk AS pair_id, embedding FROM ranked
            WHERE rk <= {_PAIR_K}) a
      JOIN (SELECT rk - {_PAIR_K} AS pair_id, embedding FROM ranked
            WHERE rk > {_PAIR_K}) b USING (pair_id)
    ),
    scored AS (
      SELECT ROUND({V.sql_cosine("emb_a", "emb_b")}, 6) AS cos
      FROM pairs
    )
    SELECT CAST(FLOOR(cos * 10) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST((CAST(COUNT(*) AS HUGEINT) * 1000000) // {_PAIR_K}
                AS BIGINT) AS share_ppm
    FROM scored
    GROUP BY 1
    ORDER BY bin
"""

# substitute the shared DuckDB tokens expression
ORACLE["kendall_tau_censored"] = ORACLE["kendall_tau_censored"].format(
    toks=X.sql_tokens("text")
)


# --- cochran_q_gates --------------------------------------------------------
_COCHRAN_Q = (
    "CASE WHEN (3 * sl - ll2) = 0 THEN NULL"
    " ELSE ROUND(2.0 * (3.0 * CAST(gg2 AS DOUBLE)"
    " - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))"
    " / (3.0 * CAST(sl AS DOUBLE) - CAST(ll2 AS DOUBLE)), 6) END"
)


def cochran_q_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across THREE curation gates at once — the k-treatment
    completion of ``mcnemar_gate_disagreement`` (McNemar compares two
    gates; Q asks "do ANY of the k gates pass different proportions of
    the same docs?" without k² pairwise tests).  Gates: length ≥ 200
    chars, type-token ratio ≥ ½ (both exactly the McNemar pair), and
    token count ≥ 40 — three binary verdicts on the SAME documents, the
    matched-design requirement Q exists for.

    Exactness: Q = (k−1)·(k·ΣGⱼ² − (ΣGⱼ)²) / (k·ΣLᵢ − ΣLᵢ²) is integer
    arithmetic end-to-end (Gⱼ = per-gate pass counts, Lᵢ = per-doc pass
    count ∈ {0..3}); the one division is a single shared float text
    rounded at 6, NULL when every doc passes all or none (denominator
    0).

    Scale: ONE map-side-combined aggregate over per-doc integer gate
    expressions — no grid, no join, no window.  |output| = 1 row.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.expr("CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END").alias("g1"),
        (
            (2 * X.distinct_token_count(F.col("text")))
            >= X.token_count(F.col("text"))
        )
        .cast("int")
        .alias("g2"),
        (X.token_count(F.col("text")) >= 40).cast("int").alias("g3"),
    )
    agg = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("g1").cast("bigint").alias("g1_pass"),
        F.sum("g2").cast("bigint").alias("g2_pass"),
        F.sum("g3").cast("bigint").alias("g3_pass"),
        F.sum(
            (F.col("g1") + F.col("g2") + F.col("g3"))
            * (F.col("g1") + F.col("g2") + F.col("g3"))
        )
        .cast("bigint")
        .alias("ll2"),
    )
    return agg.select(
        "n_docs",
        "g1_pass",
        "g2_pass",
        "g3_pass",
        F.expr(
            "g1_pass * g1_pass + g2_pass * g2_pass + g3_pass * g3_pass"
        ).alias("_gg2"),
        F.expr("g1_pass + g2_pass + g3_pass").alias("_sl"),
        "ll2",
    ).selectExpr(
        "n_docs",
        "g1_pass",
        "g2_pass",
        "g3_pass",
        "ll2",
        "CAST(2 AS BIGINT) AS df",
        _COCHRAN_Q.replace("gg2", "_gg2").replace("sl", "_sl") + " AS q_stat",
    )


ORACLE["cochran_q_gates"] = f"""
    WITH docs AS (
      SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS g1,
             CASE WHEN 2 * len(list_distinct({{toks}})) >= len({{toks}})
                  THEN 1 ELSE 0 END AS g2,
             CASE WHEN len({{toks}}) >= 40 THEN 1 ELSE 0 END AS g3
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(g1) AS BIGINT) AS g1_pass,
             CAST(SUM(g2) AS BIGINT) AS g2_pass,
             CAST(SUM(g3) AS BIGINT) AS g3_pass,
             CAST(SUM((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS ll2
      FROM docs
    )
    SELECT n_docs, g1_pass, g2_pass, g3_pass, ll2,
           CAST(2 AS BIGINT) AS df,
           {_COCHRAN_Q.replace("gg2", "(g1_pass * g1_pass + g2_pass * g2_pass + g3_pass * g3_pass)").replace("sl", "(g1_pass + g2_pass + g3_pass)")} AS q_stat
    FROM agg
"""


# --- readability_flesch ------------------------------------------------------
_FLESCH = (
    "ROUND(206.835"
    " - 1.015 * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))"
    " - 84.6 * (CAST(sylls AS DOUBLE) / CAST(words AS DOUBLE)), 6)"
)


def readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source — the classic readability gate
    quality-filter stacks use alongside length/stopword/entropy gates
    (very low ease flags boilerplate/legalese; impossibly high flags
    word-salad).  Syllables are the deterministic vowel-group count
    ([aeiouy]+ runs in the lowercased text) — the standard heuristic,
    engine-identical because both regex dialects agree on this class;
    sentences are terminal-punctuation runs, floored at 1 per doc.

    Exactness: per-source word / sentence / syllable totals are exact
    integer sums; the pooled Flesch score (computed from SOURCE-level
    totals — the deterministic aggregate formulation, documented as
    such) is ONE shared float text rounded at 6, NULL-free because
    words ≥ 1 docs are guaranteed by the words > 0 filter.

    Scale: map-only per-doc integer features + one map-side-combined
    groupBy(source).  |output| = |sources|.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "source",
            X.token_count(F.col("text")).alias("words"),
            F.greatest(
                F.expr("size(regexp_extract_all(text, '[.!?]+', 0))"),
                F.lit(1),
            )
            .cast("bigint")
            .alias("sents"),
            F.expr(
                "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
                " AS BIGINT)"
            ).alias("sylls"),
        )
        .filter(F.col("words") > 0)
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sents").cast("bigint").alias("sents"),
        F.sum("sylls").cast("bigint").alias("sylls"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sents",
        "sylls",
        F.expr(_FLESCH).alias("flesch_pooled"),
    ).orderBy("source")


ORACLE["readability_flesch"] = f"""
    WITH docs AS (
      SELECT source,
             CAST(len({{toks}}) AS BIGINT) AS words,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                           AS BIGINT), 1) AS sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS sylls
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS words,
           CAST(SUM(sents) AS BIGINT) AS sents,
           CAST(SUM(sylls) AS BIGINT) AS sylls,
           {_FLESCH.replace("words", "CAST(SUM(words) AS BIGINT)").replace("sents", "CAST(SUM(sents) AS BIGINT)").replace("sylls", "CAST(SUM(sylls) AS BIGINT)")} AS flesch_pooled
    FROM docs
    WHERE words > 0
    GROUP BY source
    ORDER BY source
"""


# --- jackknife_source_sensitivity -------------------------------------------


def jackknife_source_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out sensitivity of the corpus mean length — the
    "which source is dragging my distribution" audit: for each source,
    the corpus mean n_chars recomputed WITHOUT it, exactly, from totals
    (a closed-form jackknife — no resampling, no second scan).  A source
    whose removal shifts the mean far from the pooled value dominates
    the corpus statistics and is the first place to look when a drift
    monitor fires.

    Exactness: per-source (count, Σchars) are exact integers; pooled and
    leave-one-out means surface as centichar fixed point (100·T DIV N —
    non-negative operands, floor = trunc on both engines); the shift is
    an exact integer difference.  NULL when a source IS the whole corpus.

    Scale: ONE map-side-combined groupBy(source); globals derive from
    that |sources|-row relation via a broadcast 1-row cross join.
    """
    per = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("chars"),
        )
    )
    tot = per.groupBy().agg(
        F.sum("n_docs").cast("bigint").alias("n_tot"),
        F.sum("chars").alias("t_tot"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("chars").cast("bigint").alias("chars"),
            F.expr("(100 * t_tot) DIV n_tot").cast("bigint").alias(
                "mean_centichar"
            ),
            F.expr(
                "CASE WHEN n_tot = n_docs THEN NULL"
                " ELSE (100 * (t_tot - chars)) DIV (n_tot - n_docs) END"
            )
            .cast("bigint")
            .alias("loo_mean_centichar"),
        )
        .withColumn(
            "shift_centichar",
            (F.col("loo_mean_centichar") - F.col("mean_centichar")).cast(
                "bigint"
            ),
        )
        .orderBy("source")
    )


ORACLE["jackknife_source_sensitivity"] = """
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(CAST(n_chars AS HUGEINT)) AS chars
      FROM documents WHERE n_chars IS NOT NULL
      GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot, SUM(chars) AS t_tot
      FROM per
    )
    SELECT source, n_docs,
           CAST(chars AS BIGINT) AS chars,
           CAST((100 * t_tot) // n_tot AS BIGINT) AS mean_centichar,
           CAST(CASE WHEN n_tot = n_docs THEN NULL
                ELSE (100 * (t_tot - chars)) // (n_tot - n_docs) END
                AS BIGINT) AS loo_mean_centichar,
           CAST(CASE WHEN n_tot = n_docs THEN NULL
                ELSE (100 * (t_tot - chars)) // (n_tot - n_docs)
                     - (100 * t_tot) // n_tot END
                AS BIGINT) AS shift_centichar
    FROM per CROSS JOIN tot
    ORDER BY source
"""


# --- autocorr_lag_grid -------------------------------------------------------
_LAG_MAX = 7


def autocorr_lag_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full autocorrelation profile (lags 1..7) of daily revenue per
    event type — ``autocorr_daily`` gives the lag-1 scalar; the ACF
    SHAPE separates trend (slow decay) from weekly seasonality (a lag-7
    spike) from noise (flat), which is what an ops dashboard actually
    plots.  Pairs come from an exact epoch-day self-join (day t with
    day t+lag — calendar gaps pair nothing, never a silent shift).

    Exactness: daily totals are exact integer cents on epoch-day
    integers; the 7-lag pair grid is an equi-join of the bounded daily
    relation with itself; all five moments are exact DECIMAL(38,0)
    sums; Pearson r is the shared pipeline7 fixed-op-order text, NULL
    on constant series.

    Scale: one map-side-combined (type, day) aggregate; the lag
    explode × self-join runs on that |types|·|days| relation — bounded
    by the calendar, not the corpus.
    """
    from hadrodb_spark.operators.pipeline7 import _AC_DEN, _AC_NUM

    daily = shared.shared_persist(
        ("acf_daily", spark.sparkContext.applicationId, sf_dir),
        lambda: load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("(unix_micros(ts) DIV 1000000) DIV 86400").alias("d"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("total")),
    )
    lags = spark.range(1, _LAG_MAX + 1).select(F.col("id").alias("lag"))
    lhs = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("d") + F.col("lag")).alias("d2"),
        F.col("total").alias("x"),
    )
    pairs = lhs.join(
        daily.select("event_type", F.col("d").alias("d2"), F.col("total").alias("y")),
        ["event_type", "d2"],
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    return agg.selectExpr(
        "event_type",
        "CAST(lag AS BIGINT) AS lag",
        "CAST(n AS BIGINT) AS n_pairs",
        f"CASE WHEN {_AC_DEN} = 0 THEN NULL"
        f" ELSE ROUND({_AC_NUM} / {_AC_DEN}, 6) END AS r",
    ).orderBy("event_type", "lag")


def _acf_oracle() -> str:
    from hadrodb_spark.operators.pipeline7 import _AC_DEN, _AC_NUM

    return f"""
    WITH daily AS (
      SELECT event_type,
             (epoch_us(ts) // 1000000) // 86400 AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total
      FROM events
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, l.lag, a.total AS x, b.total AS y
      FROM daily a
      CROSS JOIN (SELECT UNNEST(generate_series(1, {_LAG_MAX})) AS lag) l
      JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + l.lag
    ),
    agg AS (
      SELECT event_type, lag,
             COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
             SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
      FROM pairs
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN {_AC_DEN} = 0 THEN NULL
                ELSE ROUND({_AC_NUM} / {_AC_DEN}, 6) END AS r
    FROM agg
    ORDER BY event_type, lag
"""


ORACLE["autocorr_lag_grid"] = _acf_oracle()

# substitute the shared DuckDB tokens expression into the gate oracles
ORACLE["cochran_q_gates"] = ORACLE["cochran_q_gates"].format(
    toks=X.sql_tokens("text")
)
ORACLE["readability_flesch"] = ORACLE["readability_flesch"].format(
    toks=X.sql_tokens("text")
)


# --- gate_phi_matrix ---------------------------------------------------------
_PHI = (
    "CASE WHEN (a + b) = 0 OR (c + d) = 0 OR (a + c) = 0 OR (b + d) = 0"
    " THEN NULL"
    " ELSE ROUND((CAST(a AS DOUBLE) * CAST(d AS DOUBLE)"
    " - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    " / SQRT((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))"
    " * (CAST(c AS DOUBLE) + CAST(d AS DOUBLE))"
    " * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))"
    " * (CAST(b AS DOUBLE) + CAST(d AS DOUBLE))), 6) END"
)


def gate_phi_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise phi coefficients among the three curation gates — the
    gate-redundancy audit that closes the gate-analysis family (McNemar
    tests ONE pair's marginal disagreement, Cochran's Q tests all k at
    once; phi says which pairs are measuring the same thing, i.e. which
    gate a funnel can drop without changing the kept set).

    Exactness: per-doc gate verdicts collapse into an 8-bin bitmap
    histogram in ONE map-side aggregate; each pair's 2×2 cells are exact
    integer sums over those 8 bins; phi is one shared float text rounded
    at 6, NULL when a gate is constant.

    Scale: one map-side-combined 8-group aggregate; the pair matrix is
    a 3-row inline expansion of that constant-size relation.
    """
    docs = load(spark, sf_dir, "documents").select(
        F.expr(
            "CASE WHEN n_chars >= 200 THEN 4 ELSE 0 END"
        ).alias("b1"),
        F.when(
            (2 * X.distinct_token_count(F.col("text")))
            >= X.token_count(F.col("text")),
            2,
        )
        .otherwise(0)
        .alias("b2"),
        F.when(X.token_count(F.col("text")) >= 40, 1).otherwise(0).alias("b3"),
    )
    hist = docs.groupBy(
        (F.col("b1") + F.col("b2") + F.col("b3")).alias("pat")
    ).agg(F.count(F.lit(1)).alias("n"))
    # bit 4 = gate1 (length), bit 2 = gate2 (TTR), bit 1 = gate3 (tokens)
    cells = hist.groupBy().agg(
        *[
            F.sum(
                F.when(
                    (
                        F.col("pat")
                        .bitwiseAND(F.lit(hi))
                        .cast("boolean")
                        == F.lit(hv)
                    )
                    & (
                        F.col("pat")
                        .bitwiseAND(F.lit(lo))
                        .cast("boolean")
                        == F.lit(lv)
                    ),
                    F.col("n"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"{name}_{cell}")
            for name, hi, lo in (
                ("g12", 4, 2),
                ("g13", 4, 1),
                ("g23", 2, 1),
            )
            for cell, hv, lv in (
                ("a", True, True),
                ("b", True, False),
                ("c", False, True),
                ("d", False, False),
            )
        ]
    )
    pairs = cells.selectExpr(
        "inline(array("
        "struct('len_ttr' AS pair, g12_a AS a, g12_b AS b, g12_c AS c, g12_d AS d),"
        "struct('len_tok' AS pair, g13_a AS a, g13_b AS b, g13_c AS c,"
        " g13_d AS d),"
        "struct('ttr_tok' AS pair, g23_a AS a, g23_b AS b, g23_c AS c,"
        " g23_d AS d)))"
    )
    return pairs.selectExpr(
        "pair", "a", "b", "c", "d", f"{_PHI} AS phi"
    ).orderBy("pair")


ORACLE["gate_phi_matrix"] = f"""
    WITH docs AS (
      SELECT (CASE WHEN n_chars >= 200 THEN 4 ELSE 0 END)
             + (CASE WHEN 2 * len(list_distinct({{toks}})) >= len({{toks}})
                     THEN 2 ELSE 0 END)
             + (CASE WHEN len({{toks}}) >= 40 THEN 1 ELSE 0 END) AS pat
      FROM documents
    ),
    hist AS (SELECT pat, COUNT(*) AS n FROM docs GROUP BY pat),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN (pat & 4) <> 0 AND (pat & 2) <> 0 THEN n ELSE 0 END) AS BIGINT) AS g12_a,
        CAST(SUM(CASE WHEN (pat & 4) <> 0 AND (pat & 2) = 0 THEN n ELSE 0 END) AS BIGINT) AS g12_b,
        CAST(SUM(CASE WHEN (pat & 4) = 0 AND (pat & 2) <> 0 THEN n ELSE 0 END) AS BIGINT) AS g12_c,
        CAST(SUM(CASE WHEN (pat & 4) = 0 AND (pat & 2) = 0 THEN n ELSE 0 END) AS BIGINT) AS g12_d,
        CAST(SUM(CASE WHEN (pat & 4) <> 0 AND (pat & 1) <> 0 THEN n ELSE 0 END) AS BIGINT) AS g13_a,
        CAST(SUM(CASE WHEN (pat & 4) <> 0 AND (pat & 1) = 0 THEN n ELSE 0 END) AS BIGINT) AS g13_b,
        CAST(SUM(CASE WHEN (pat & 4) = 0 AND (pat & 1) <> 0 THEN n ELSE 0 END) AS BIGINT) AS g13_c,
        CAST(SUM(CASE WHEN (pat & 4) = 0 AND (pat & 1) = 0 THEN n ELSE 0 END) AS BIGINT) AS g13_d,
        CAST(SUM(CASE WHEN (pat & 2) <> 0 AND (pat & 1) <> 0 THEN n ELSE 0 END) AS BIGINT) AS g23_a,
        CAST(SUM(CASE WHEN (pat & 2) <> 0 AND (pat & 1) = 0 THEN n ELSE 0 END) AS BIGINT) AS g23_b,
        CAST(SUM(CASE WHEN (pat & 2) = 0 AND (pat & 1) <> 0 THEN n ELSE 0 END) AS BIGINT) AS g23_c,
        CAST(SUM(CASE WHEN (pat & 2) = 0 AND (pat & 1) = 0 THEN n ELSE 0 END) AS BIGINT) AS g23_d
      FROM hist
    ),
    pairs AS (
      SELECT 'len_ttr' AS pair, g12_a AS a, g12_b AS b, g12_c AS c, g12_d AS d FROM cells
      UNION ALL
      SELECT 'len_tok', g13_a, g13_b, g13_c, g13_d FROM cells
      UNION ALL
      SELECT 'ttr_tok', g23_a, g23_b, g23_c, g23_d FROM cells
    )
    SELECT pair, a, b, c, d, {_PHI} AS phi
    FROM pairs
    ORDER BY pair
"""


# --- mixture_ess -------------------------------------------------------------


def mixture_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of length-weighted sampling per source —
    the importance-weighting health check (DSIR/mixture pipelines weight
    documents; ESS = (Σw)²/Σw² says how many EFFECTIVE documents survive
    the weighting: ESS ≪ n means a few heavy docs dominate and the
    weighted estimate is noise).  Weights here are capped char lengths
    (LEAST(n_chars, 4096)) — the canonical token-budget weighting.

    Exactness: Σw and Σw² are exact DECIMAL(38,0) sums of bounded
    integers; the normalized ESS ratio is EXACT integer ppm via the
    cross-multiplied form 10⁶·(Σw)² DIV (n·Σw²); the absolute ESS is one
    shared float text rounded at 6.  NULL on all-zero weights.

    Scale: ONE map-side-combined groupBy(source) — no join, no window.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select(
            "source",
            F.least(F.col("n_chars"), F.lit(4096)).cast("long").alias("w"),
        )
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("w").cast("decimal(38,0)")).alias("sw"),
        F.sum(
            F.col("w").cast("decimal(38,0)") * F.col("w").cast("decimal(38,0)")
        ).alias("sw2"),
    )
    return agg.select(
        "source",
        "n_docs",
        F.col("sw").cast("bigint").alias("sum_w"),
        F.col("sw2").cast("bigint").alias("sum_w2"),
        F.expr(
            "CASE WHEN sw2 = 0 THEN NULL"
            " ELSE ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)"
            " / CAST(sw2 AS DOUBLE), 6) END"
        ).alias("ess"),
        F.expr(
            "CASE WHEN sw2 = 0 THEN NULL"
            " ELSE (1000000 * sw * sw) DIV (n_docs * sw2) END"
        )
        .cast("bigint")
        .alias("ess_ratio_ppm"),
    ).orderBy("source")


ORACLE["mixture_ess"] = """
    WITH docs AS (
      SELECT source, LEAST(n_chars, 4096) AS w
      FROM documents WHERE n_chars IS NOT NULL
    ),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(CAST(w AS DECIMAL(38,0))) AS sw,
             SUM(CAST(w AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))) AS sw2
      FROM docs GROUP BY source
    )
    SELECT source, n_docs,
           CAST(sw AS BIGINT) AS sum_w,
           CAST(sw2 AS BIGINT) AS sum_w2,
           CASE WHEN sw2 = 0 THEN NULL
                ELSE ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                           / CAST(sw2 AS DOUBLE), 6) END AS ess,
           CAST(CASE WHEN sw2 = 0 THEN NULL
                ELSE (1000000 * CAST(sw AS HUGEINT) * CAST(sw AS HUGEINT))
                     // (n_docs * CAST(sw2 AS HUGEINT)) END
                AS BIGINT) AS ess_ratio_ppm
    FROM agg
    ORDER BY source
"""

ORACLE["gate_phi_matrix"] = ORACLE["gate_phi_matrix"].format(
    toks=X.sql_tokens("text")
)
