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


_PATH_LEN = 3
_PATH_TOPK = 15


def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first 3 event types (by time,
    event_id tiebreak) concatenated into a path, counted across users.
    The path is assembled from rank-pivoted columns (MAX(CASE rn=k)), not
    an ordered collect — no dependency on any engine's aggregation order.

    Scale: one rank window on user_id (the shuffle), a pivot agg on the
    same partitioning, then a tiny path rollup + TakeOrdered."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PATH_LEN
    )
    steps = ranked.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("rn") == k, F.col("event_type"))).alias(f"e{k}")
            for k in range(1, _PATH_LEN + 1)
        ]
    )
    return (
        steps.filter(F.col(f"e{_PATH_LEN}").isNotNull())
        .select(
            F.concat_ws(">", *[f"e{k}" for k in range(1, _PATH_LEN + 1)]).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOPK)
    )


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent event_type per user-activity
    hour (ties → lexicographically smallest) — the count-then-rank
    formulation every engine agrees on, unlike native mode()'s
    unspecified tie behavior."""
    ev = load(spark, sf_dir, "events").select(
        F.hour("ts").alias("hr"), "event_type"
    )
    counts = ev.groupBy("hr", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("hr").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("hr", F.col("event_type").alias("mode_type"), "cnt")
    )


def cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count by day via the first-touch trick: only
    a user's FIRST event increments the cumulative count, turning
    "COUNT(DISTINCT) OVER time" (unsupported as a window; state-heavy as a
    stream) into one per-user agg + a cumsum over |days| rows. The final
    unpartitioned window runs on the tiny daily relation — the 100 TB
    heavy lifting is all in the first hash aggregation."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("first_day"))
    daily = first.groupBy("first_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.withColumn(
        "cumulative_users", F.sum("new_users").over(w).cast("bigint")
    ).select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "new_users",
        "cumulative_users",
    )


ORACLE: dict[str, str] = {
    "cumulative_users": """
        WITH first AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
          FROM events GROUP BY user_id
        ),
        daily AS (
          SELECT first_day, CAST(COUNT(*) AS BIGINT) AS new_users
          FROM first GROUP BY first_day
        )
        SELECT strftime(first_day, '%Y-%m-%d') AS day,
               new_users,
               CAST(SUM(new_users) OVER (
                   ORDER BY first_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cumulative_users
        FROM daily
    """,
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
    "event_paths": f"""
        WITH ranked AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                 ) AS rn
          FROM events
        ),
        steps AS (
          SELECT user_id,
                 {", ".join(f"MAX(CASE WHEN rn = {k} THEN event_type END) AS e{k}" for k in range(1, _PATH_LEN + 1))}
          FROM ranked WHERE rn <= {_PATH_LEN}
          GROUP BY user_id
        )
        SELECT {" || '>' || ".join(f"e{k}" for k in range(1, _PATH_LEN + 1))} AS path,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM steps WHERE e{_PATH_LEN} IS NOT NULL
        GROUP BY path
        ORDER BY n_users DESC, path
        LIMIT {_PATH_TOPK}
    """,
    "mode_per_group": """
        WITH counts AS (
          SELECT CAST(hour(ts) AS INT) AS hr, event_type,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY hr, event_type
        )
        SELECT hr, event_type AS mode_type, cnt
        FROM (
          SELECT hr, event_type, cnt,
                 ROW_NUMBER() OVER (
                     PARTITION BY hr ORDER BY cnt DESC, event_type
                 ) AS rn
          FROM counts
        ) WHERE rn = 1
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
