"""Round-7-queue pipeline operators, batch 6: revenue concentration,
one-way ANOVA, and cross-table fulfilment-lag distributions.

Reference parity: the reference (mabel-dev/hadrodb, ``hadro/engine.py``)
stores records and defers analytics upstream; these extend the SURVEY.md
§2.3 analytics tier: "how concentrated is revenue across customers?",
"does order value actually differ between event types?", "how long from
order to ship, by priority?".

Exact-arithmetic discipline throughout: integer cents, DECIMAL(38,0)
power sums (cents² overflows bigint at row scale), data-valued discrete
percentiles, ppm fixed-point via integer DIV over non-negative operands,
one shared float text per transcendental-free statistic rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import load

# --- revenue_pareto_curve ----------------------------------------------------
# Customers bucketed by the DECIMAL-DIGIT COUNT of their lifetime revenue
# cents (an exact integer order-of-magnitude bucket — length(CAST(x AS
# STRING)) is engine-identical for positive integers), cumulating from the
# TOP bucket down: the Lorenz/Pareto report at bucket resolution, with no
# global per-customer rank window.


def revenue_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) report: customers grouped by the
    order of magnitude of their lifetime spend, cumulated top-down — the
    "what share of revenue do the biggest spenders carry?" view.
    Complements ``source_concentration``'s one-row Gini/HHI with the
    full curve.

    Exactness: per-customer revenue is an exact cents sum; the bucket is
    the decimal digit count of that integer (engine-identical string
    length); shares are integer ppm; cumulative shares are windows over
    the ≤ a-dozen-bucket relation.

    Scale shape: ONE groupBy(custkey) reduces the corpus (the only
    row-scale shuffle — the same cardinality any per-customer metric
    needs); the digit bucket collapses that to ≤ 12 rows, where every
    window runs.  No global rank over customers (the `score_auc_dup`
    histogram discipline applied to the Lorenz curve).
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("cents").alias("rev")
    )
    buckets = (
        per_cust.select(
            F.expr("length(CAST(rev AS STRING))").alias("digits"), "rev"
        )
        .groupBy("digits")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").alias("bucket_cents"),
        )
    )
    w = "(ORDER BY digits DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    return (
        buckets.select(
            "digits",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("bucket_cents").cast("bigint").alias("bucket_cents"),
            F.expr("SUM(n_customers) OVER ()").alias("total_cust"),
            F.expr("SUM(bucket_cents) OVER ()").alias("total_cents"),
            F.expr(f"SUM(n_customers) OVER {w}").alias("cum_cust"),
            F.expr(f"SUM(bucket_cents) OVER {w}").alias("cum_cents"),
        )
        .select(
            "digits",
            "n_customers",
            "bucket_cents",
            F.expr(
                "CAST((1000000 * cum_cust) DIV total_cust AS BIGINT)"
            ).alias("cum_customers_ppm"),
            F.expr(
                "CAST((1000000 * cum_cents) DIV total_cents AS BIGINT)"
            ).alias("cum_revenue_ppm"),
        )
        .orderBy(F.col("digits").desc())
    )


# --- anova_value_by_type -----------------------------------------------------
# Classic one-way ANOVA from exact DECIMAL(38,0) moments: F = (SSB/(k-1)) /
# (SSW/(n-k)).  Every sum is exact; each group's SSW term (nᵢ·qᵢ − sᵢ²)/nᵢ
# and the final F are fixed-op-order float texts shared verbatim with the
# oracle (the PSI-term discipline: round at 6, DECIMAL-sum the terms).


def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types — the statistical
    gate before trusting a per-type mean difference (``agg_stats`` gives
    the means; this says whether they differ beyond noise).  Between/
    within sums of squares from exact integer-cents moments.

    Exactness: per-type n / Σcents / Σcents² are exact DECIMAL(38,0)
    sums (cents² overflows bigint at row scale; SSW terms are
    DECIMAL(38,6) — 1e32 integer headroom, far above any n·variance);
    each group's SSW term
    (nᵢ·qᵢ − sᵢ²)/nᵢ is one shared float text rounded at 6 and
    DECIMAL-summed; SST − SSW and the F ratio are a single shared
    fixed-op-order float text rounded at 6.

    Scale shape: ONE map-side-combined groupBy(type) reduces the corpus
    to |types| rows; the final reduce and all arithmetic run there.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    )
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ni"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("si"),
        F.sum(
            (F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
        ).alias("qi"),
    )
    # (nᵢ·qᵢ − sᵢ²) = nᵢ²·varᵢ is exact decimal; the one division by nᵢ
    # happens inside this shared float text, rounded at 6, DECIMAL-summed.
    gterm = (
        "CAST(ROUND(CAST(ni * qi - si * si AS DOUBLE) / CAST(ni AS DOUBLE), 6)"
        " AS DECIMAL(38,6))"
    )
    reduced = per_type.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ni").alias("n_dec"),
        F.sum("si").alias("s_tot"),
        F.sum("qi").alias("q_tot"),
        F.sum(F.expr(gterm)).alias("ssw_sum"),
    )
    return reduced.select(
        "k",
        F.col("n_dec").cast("bigint").alias("n"),
        F.expr("CAST(k - 1 AS BIGINT)").alias("df_between"),
        F.expr("CAST(CAST(n_dec AS BIGINT) - k AS BIGINT)").alias("df_within"),
        F.expr(
            # SST = Σq − s²/n; SSB = SST − SSW.  One fixed float op order.
            # Degenerate inputs (zero within-group variance, or n = k) have
            # no finite F — emit NULL identically on both engines instead
            # of exposing IEEE-Infinity vs engine-error divergence.
            "CASE WHEN ssw_sum = 0 OR k <= 1 OR CAST(n_dec AS BIGINT) = k"
            " THEN NULL"
            " ELSE ROUND(((CAST(q_tot AS DOUBLE)"
            " - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)"
            "   / CAST(n_dec AS DOUBLE))"
            " - CAST(ssw_sum AS DOUBLE))"
            " / (k - 1)"
            " / (CAST(ssw_sum AS DOUBLE) / (CAST(n_dec AS BIGINT) - k)), 6)"
            " END"
        ).alias("f_stat"),
    )


# --- ship_lag_percentiles ----------------------------------------------------


def ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfilment lag distribution per order priority —
    the cross-table temporal-lag report (every lineitem joined back to
    its order's date): p50/p90/p99 discrete percentiles + mean days.

    Exactness: the lag is an exact whole-day calendar-date difference
    (both engines truncate to DATE first); percentiles are data-valued order statistics; the mean
    is an integer floor division (lags are non-negative in the fixture;
    a negative lag would need the sign-factored division — asserted by
    the min_lag_days column the oracle cross-checks).

    Scale shape: ONE equi shuffle join of two projected key columns
    (the legitimate fact-to-fact join any lag metric needs — AQE
    broadcasts the smaller side when it fits), then one keyed aggregate
    with an order-statistic buffer bounded by the distinct-lag domain.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("CAST(l_shipdate AS DATE)").alias("ship_d")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        F.expr("CAST(o_orderdate AS DATE)").alias("order_d"),
    )
    lag = li.join(o, "l_orderkey").select(
        "o_orderpriority",
        F.expr("CAST(datediff(ship_d, order_d) AS BIGINT)").alias("lag"),
    )
    return (
        lag.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.min("lag").cast("bigint").alias("min_lag_days"),
            F.expr(
                "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lag)"
                " AS BIGINT)"
            ).alias("p50_days"),
            F.expr(
                "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag)"
                " AS BIGINT)"
            ).alias("p90_days"),
            F.expr(
                "CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY lag)"
                " AS BIGINT)"
            ).alias("p99_days"),
            F.sum("lag").alias("lag_sum"),
        )
        .select(
            "o_orderpriority",
            "n_lineitems",
            "min_lag_days",
            "p50_days",
            "p90_days",
            "p99_days",
            F.expr("CAST(lag_sum DIV n_lineitems AS BIGINT)").alias(
                "mean_lag_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


ORACLE: dict[str, str] = {
    "revenue_pareto_curve": """
        WITH per_cust AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
          FROM orders GROUP BY o_custkey
        ),
        buckets AS (
          SELECT length(CAST(rev AS VARCHAR)) AS digits,
                 COUNT(*) AS n_customers,
                 SUM(rev) AS bucket_cents
          FROM per_cust GROUP BY 1
        ),
        cum AS (
          SELECT digits, n_customers, bucket_cents,
                 SUM(n_customers) OVER () AS total_cust,
                 SUM(bucket_cents) OVER () AS total_cents,
                 SUM(n_customers) OVER (ORDER BY digits DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cust,
                 SUM(bucket_cents) OVER (ORDER BY digits DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents
          FROM buckets
        )
        SELECT digits,
               CAST(n_customers AS BIGINT) AS n_customers,
               CAST(bucket_cents AS BIGINT) AS bucket_cents,
               CAST((1000000 * cum_cust) // total_cust AS BIGINT)
                 AS cum_customers_ppm,
               CAST((1000000 * cum_cents) // total_cents AS BIGINT)
                 AS cum_revenue_ppm
        FROM cum
        ORDER BY digits DESC
    """,
    "anova_value_by_type": """
        WITH per_type AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DECIMAL(38,0)) AS ni,
                 SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                     AS DECIMAL(38,0))) AS si,
                 SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS DECIMAL(38,0))
                     * CAST(CAST(ROUND(value * 100) AS BIGINT)
                            AS DECIMAL(38,0))) AS qi
          FROM events GROUP BY event_type
        ),
        reduced AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 SUM(ni) AS n_dec,
                 SUM(si) AS s_tot,
                 SUM(qi) AS q_tot,
                 SUM(CAST(ROUND(CAST(ni * qi - si * si AS DOUBLE)
                                / CAST(ni AS DOUBLE), 6)
                     AS DECIMAL(38,6))) AS ssw_sum
          FROM per_type
        )
        SELECT k,
               CAST(n_dec AS BIGINT) AS n,
               CAST(k - 1 AS BIGINT) AS df_between,
               CAST(CAST(n_dec AS BIGINT) - k AS BIGINT) AS df_within,
               CASE WHEN ssw_sum = 0 OR k <= 1 OR CAST(n_dec AS BIGINT) = k
                    THEN NULL
               ELSE ROUND(((CAST(q_tot AS DOUBLE)
                       - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                         / CAST(n_dec AS DOUBLE))
                      - CAST(ssw_sum AS DOUBLE))
                     / (k - 1)
                     / (CAST(ssw_sum AS DOUBLE)
                        / (CAST(n_dec AS BIGINT) - k)), 6) END AS f_stat
        FROM reduced
    """,
    "ship_lag_percentiles": """
        WITH lag AS (
          SELECT o.o_orderpriority,
                 CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               CAST(MIN(lag) AS BIGINT) AS min_lag_days,
               CAST(quantile_disc(lag, 0.5) AS BIGINT) AS p50_days,
               CAST(quantile_disc(lag, 0.9) AS BIGINT) AS p90_days,
               CAST(quantile_disc(lag, 0.99) AS BIGINT) AS p99_days,
               CAST(SUM(lag) // COUNT(*) AS BIGINT) AS mean_lag_days
        FROM lag
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}
