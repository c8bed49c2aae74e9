"""Product-analytics operators over ``events`` / ``orders`` — the cohort /
segmentation workload family (the reference delegates all query processing
to its host engine, ``/root/reference/README.md:5``; these round out the
behavioral-analytics surface next to sessionize/funnel_conversion).

Repo contract: no raw timestamps in outputs (strings), DECIMAL sums for
money, unique tiebreakers inside every window, aliases identical across
the Spark plan and the DuckDB oracle.

Scale design:

- retention_cohorts: two hash aggregations — (user → cohort week) and
  ((cohort, offset) → distinct users). The first-touch agg is the shuffle
  retention always pays; the second groups |users|×|active weeks| rows
  down to a |cohorts|×|offsets| grid. Both are map-side combinable; no
  window functions, no self-join (the naive formulation joins activity
  against first-touch — here the cohort rides along in one relation).
- rfm_segments: one aggregation to per-customer R/F/M, three ntile
  windows over the SAME small relation (|customers| rows, one Exchange
  reused), then a tiny segment rollup. Each ntile orders by (metric,
  custkey) — the unique tiebreak that makes quartile boundaries
  deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.operators.relational import load

_RFM_REF = "2002-01-01"   # recency reference date (after the data's range)


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-activity week
    (cohort), counted once per (cohort, week-offset) they return in."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = ev.distinct().join(first, "user_id")
    return (
        activity.select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary rolled to
    deterministic quartiles (ntile over metric + custkey), then the
    customer count and exact-DECIMAL revenue per R/F/M cell."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(_RFM_REF).cast("date"), F.max("o_orderdate"))
        .cast("int")
        .alias("recency_days"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    seg = per_cust.select(
        "o_custkey",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .cast("int")
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), "o_custkey"))
        .cast("int")
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), "o_custkey"))
        .cast("int")
        .alias("m_q"),
    )
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary").cast("double").alias("revenue"),
    )


ORACLE: dict[str, str] = {
    "retention_cohorts": """
        WITH ev AS (
          SELECT user_id, date_trunc('week', ts) AS wk FROM events
        ),
        first AS (
          SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id
        ),
        activity AS (
          SELECT DISTINCT e.user_id, e.wk, f.cohort_wk
          FROM ev e JOIN first f ON e.user_id = f.user_id
        )
        SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', cohort_wk, wk) / 7 AS INT) AS week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM activity
        GROUP BY cohort_week, week_offset
    """,
    "rfm_segments": f"""
        WITH per_cust AS (
          SELECT o_custkey,
                 CAST(date_diff('day', MAX(o_orderdate),
                                TIMESTAMP '{_RFM_REF}') AS INT) AS recency_days,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
          FROM orders GROUP BY o_custkey
        ),
        seg AS (
          SELECT o_custkey, monetary,
                 CAST(NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS INT) AS r_q,
                 CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_q,
                 CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_q
          FROM per_cust
        )
        SELECT r_q, f_q, m_q,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary) AS DOUBLE) AS revenue
        FROM seg GROUP BY r_q, f_q, m_q
    """,
}
