"""Batch sessionization over the event log — the gap-based session operator
(streaming twin: ``hadrodb_spark.streaming.events.session_windows``) built
from window functions: lag → gap flag → cumulative sum = session id.

One shuffle on ``user_id``; the cumsum is computed within each partition's
sorted run — the standard scalable sessionization plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.operators.relational import dec, load

_GAP_MIN = 30  # session gap, minutes


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign session ids and aggregate per session."""
    # cross-engine determinism: order and gap on SECOND-floored epoch —
    # Spark reads the ns fixture truncated to µs while DuckDB keeps ns, so
    # raw-ts ordering/diffs could disagree below the second
    w = Window.partitionBy("user_id").orderBy("ets", "event_id")
    events = load(spark, sf_dir, "events").withColumn(
        "ets", F.unix_timestamp("ts")
    )
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "ets",
        "value",
        F.when(
            (F.col("ets") - F.lag("ets", 1).over(w)) > _GAP_MIN * 60,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # Hash-stable output discipline (r3 driver red-row fix): epochs as
    # bigint seconds, money as exact bigint cents — no doubles, no
    # formatted timestamps, so no renderer/float sensitivity cross-engine.
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ets").alias("session_start_epoch"),
            F.max("ets").alias("session_end_epoch"),
            (F.sum(dec("value")) * 100).cast("bigint").alias("session_value_cents"),
        )
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: users who signup then later purchase —
    min-timestamp comparison per user (two conditional aggregates, one
    shuffle)."""
    # second-floored epochs for cross-engine comparison stability (µs vs ns)
    events = load(spark, sf_dir, "events").withColumn("ets", F.unix_timestamp("ts"))
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ets"))).alias("first_signup"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ets"))).alias("last_purchase"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    return per_user.select(
        "user_id",
        F.col("first_signup").isNotNull().alias("signed_up"),
        (
            F.col("first_signup").isNotNull()
            & F.col("last_purchase").isNotNull()
            & (F.col("last_purchase") > F.col("first_signup"))
        ).alias("converted"),
        "n_purchases",
    )


ORACLE: dict[str, str] = {
    "sessionize": f"""
        WITH base AS (
          SELECT *, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ets FROM events
        ),
        flagged AS (
          SELECT user_id, event_id, ts, ets, value,
                 CASE WHEN ets - LAG(ets, 1) OVER w > {_GAP_MIN * 60}
                      THEN 1 ELSE 0 END AS new_session
          FROM base
          WINDOW w AS (PARTITION BY user_id ORDER BY ets, event_id)
        ),
        sess AS (
          SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ets, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        SELECT user_id,
               -- DuckDB types an un-cast window SUM over INTEGER as HUGEINT
               -- (int128); Spark emits bigint.  The r4 driver red row was
               -- exactly this type-encoding mismatch (values identical).
               CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ets) AS session_start_epoch,
               MAX(ets) AS session_end_epoch,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS session_value_cents
        FROM sess GROUP BY user_id, session_id
    """,
    "funnel_conversion": """
        WITH per_user AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup'
                     THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS first_signup,
                 MAX(CASE WHEN event_type = 'purchase'
                     THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END) AS last_purchase,
                 CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
                   AS n_purchases
          FROM events GROUP BY user_id
        )
        SELECT user_id,
               first_signup IS NOT NULL AS signed_up,
               (first_signup IS NOT NULL AND last_purchase IS NOT NULL
                AND last_purchase > first_signup) AS converted,
               n_purchases
        FROM per_user
    """,
}
