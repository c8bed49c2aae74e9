"""As-of (nearest-earlier) join — the canonical time-series operator Spark's
built-ins lack (SURVEY driver contract: custom operators as compositions of
DataFrame ops where semantics allow).

Implementation is the scalable union+window idiom, NOT a per-row lookup:

    tag left rows kind=1, right rows kind=0 → union → window over
    (key, ORDER BY t, kind, tiebreak) → last_value(right cols, ignorenulls)
    → keep kind=1 rows

One shuffle on the key, linear in |left|+|right| — no range-join blowup, no
broadcast requirement, skew handled by AQE. Tie semantics: a right row at
exactly t matches (inclusive ≤), ties broken by the right tiebreak column so
results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.operators.relational import load


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_t: str,
    right_t: str,
    right_vals: list[str],
    tiebreak: str,
) -> DataFrame:
    """Generic as-of join: for each left row, the right row with the greatest
    ``(right_t, tiebreak)`` such that ``right_t <= left_t`` and keys match.
    Returns all left columns plus ``right_vals`` (null when no match)."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_t).alias("_t"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_vals],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_t).alias("_t"),
        F.lit(0).alias("_kind"),
        F.col(tiebreak).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_kind", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_vals
        ],
    )
    return merged.filter(F.col("_kind") == 1).select(
        *lcols, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_vals]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_t: str,
    right_t: str,
    right_vals: list[str],
    tiebreak: str,
) -> DataFrame:
    """Forward as-of: for each left row, the right row with the smallest
    ``(right_t, tiebreak)`` such that ``right_t >= left_t`` (inclusive).
    Same union+window idiom — one shuffle on the key; the sort places left
    rows before right rows at equal ``t`` so an exact-``t`` match lands in
    the following frame."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_t).alias("_t"),
        F.lit(0).alias("_kind"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_vals],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_t).alias("_t"),
        F.lit(1).alias("_kind"),
        F.col(tiebreak).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_kind", "_tb")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = l.unionByName(r).select(
        "*",
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_vals
        ],
    )
    return merged.filter(F.col("_kind") == 0).select(
        *lcols, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_vals]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_t: str,
    right_t: str,
    right_vals: list[str],
    tiebreak: str,
) -> DataFrame:
    """Nearest as-of: the right row minimizing ``|right_t - left_t|``, ties
    going to the earlier (backward) side, then that side's tiebreak rule.
    Both directional passes run over ONE union with the same hash
    partitioning on the key — Catalyst plans a single Exchange with two
    local sorts (the backward sort puts right rows before left at equal
    ``t``; the forward sort inverts that), never a second shuffle."""
    vals_t = [*right_vals, "__rt"]
    r2 = right.withColumn("__rt", F.col(right_t).cast("long"))
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_t).alias("_t"),
        F.lit(1).alias("_kind_b"),
        F.lit(0).alias("_kind_f"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(r2.schema[c].dataType).alias(f"_r_{c}") for c in vals_t],
    )
    r = r2.select(
        F.col(key).alias("_k"),
        F.col(right_t).alias("_t"),
        F.lit(0).alias("_kind_b"),
        F.lit(1).alias("_kind_f"),
        F.col(tiebreak).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in vals_t],
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy("_t", "_kind_b", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_t", "_kind_f", "_tb")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = l.unionByName(r).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}") for c in vals_t],
        *[F.first(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}") for c in vals_t],
    )
    lt = F.col("_t").cast("long")
    use_bwd = F.col("_b___rt").isNotNull() & (
        F.col("_f___rt").isNull()
        | ((lt - F.col("_b___rt")) <= (F.col("_f___rt") - lt))
    )
    picked = [
        F.when(use_bwd, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")).alias(f"asof_{c}")
        for c in right_vals
    ]
    return merged.filter(F.col("_kind_b") == 1).select(*lcols, *picked)


def asof_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order joined to the customer's most recent event at or before
    the order date (second-floored epochs for cross-engine stability)."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.unix_timestamp("o_orderdate").alias("o_ets"),
        )
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("event_type"),
        F.unix_timestamp("ts").alias("e_ets"),
    )
    out = asof_join(
        orders.withColumnRenamed("o_custkey", "key"),
        events.withColumnRenamed("user_id", "key"),
        key="key",
        left_t="o_ets",
        right_t="e_ets",
        right_vals=["event_id", "event_type"],
        tiebreak="event_id",
    )
    return out.select(
        "o_orderkey",
        F.col("key").alias("o_custkey"),
        F.col("asof_event_id").alias("last_event_id"),
        F.col("asof_event_type").alias("last_event_type"),
    )


def _orders_events(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("key"),
            F.unix_timestamp("o_orderdate").alias("o_ets"),
        )
    )
    events = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("event_id"),
        F.col("event_type"),
        F.unix_timestamp("ts").alias("e_ets"),
    )
    return orders, events


def asof_events_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order joined to the customer's next event at or after the order
    date — the forward mirror of ``asof_orders_events``."""
    orders, events = _orders_events(spark, sf_dir)
    out = asof_join_forward(
        orders, events,
        key="key", left_t="o_ets", right_t="e_ets",
        right_vals=["event_id", "event_type"], tiebreak="event_id",
    )
    return out.select(
        "o_orderkey",
        F.col("key").alias("o_custkey"),
        F.col("asof_event_id").alias("next_event_id"),
        F.col("asof_event_type").alias("next_event_type"),
    )


def asof_events_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order joined to the customer's closest event in absolute time,
    ties to the earlier side."""
    orders, events = _orders_events(spark, sf_dir)
    out = asof_join_nearest(
        orders, events,
        key="key", left_t="o_ets", right_t="e_ets",
        right_vals=["event_id", "event_type"], tiebreak="event_id",
    )
    return out.select(
        "o_orderkey",
        F.col("key").alias("o_custkey"),
        F.col("asof_event_id").alias("near_event_id"),
        F.col("asof_event_type").alias("near_event_type"),
    )


def join_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join — each event joined to the dimension
    VERSION valid at its timestamp (orders as the type-2 dimension:
    version n is valid from its order date until the customer's next
    order, the ``scd2_intervals`` derivation).

    The load-bearing identity: a point-in-time join against half-open
    [valid_from, valid_to) intervals IS a backward as-of on valid_from —
    the latest version with valid_from ≤ t automatically satisfies
    t < valid_to because valid_to is the NEXT version's valid_from. So no
    interval table is materialized and no range join runs: one
    union+window pass, one shuffle on the customer key, null dimension
    columns for events before the first version — the scalable shape for
    snapshotting mutable dimensions under a 100 TB fact stream."""
    orders, events = _orders_events(spark, sf_dir)
    fact = events.filter(F.col("key") <= 200).select(
        "key", "event_id", "e_ets"
    )
    dim = orders.select("key", "o_orderkey", "o_ets")
    out = asof_join(
        fact, dim,
        key="key", left_t="e_ets", right_t="o_ets",
        right_vals=["o_orderkey"], tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        F.col("key").alias("user_id"),
        F.col("asof_o_orderkey").alias("dim_orderkey"),
    )


_ASOF_TOL_S = 7 * 86400  # 7-day lookback bound


def asof_events_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a lookback TOLERANCE (pandas ``merge_asof(...,
    tolerance=...)`` semantics): the customer's most recent event at or
    before the order date, but only if it is within 7 days — otherwise
    null. Implemented as the same one-shuffle union+window pass carrying
    the matched event time, then a map-only null-out of matches beyond the
    bound — tolerance costs nothing over the unbounded as-of."""
    orders, events = _orders_events(spark, sf_dir)
    out = asof_join(
        orders, events,
        key="key", left_t="o_ets", right_t="e_ets",
        right_vals=["event_id", "event_type", "e_ets"], tiebreak="event_id",
    )
    within = (F.col("o_ets") - F.col("asof_e_ets")) <= _ASOF_TOL_S
    return out.select(
        "o_orderkey",
        F.col("key").alias("o_custkey"),
        F.when(within, F.col("asof_event_id")).alias("recent_event_id"),
        F.when(within, F.col("asof_event_type")).alias("recent_event_type"),
    )


ORACLE: dict[str, str] = {
    "join_scd2_temporal": """
        SELECT e.event_id, e.user_id, o.o_orderkey AS dim_orderkey
        FROM (SELECT user_id, event_id,
                     CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_ets
              FROM events WHERE user_id <= 200) e
        LEFT JOIN LATERAL (
          SELECT o_orderkey
          FROM (SELECT o_custkey, o_orderkey,
                       CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS o_ets
                FROM orders) o
          WHERE o.o_custkey = e.user_id AND o.o_ets <= e.e_ets
          ORDER BY o.o_ets DESC, o.o_orderkey DESC
          LIMIT 1
        ) o ON TRUE
    """,
    "asof_events_tolerance": f"""
        SELECT o.o_orderkey, o.o_custkey,
               e.event_id AS recent_event_id,
               e.event_type AS recent_event_type
        FROM (SELECT o_orderkey, o_custkey,
                     CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS o_ets
              FROM orders WHERE o_custkey <= 200) o
        LEFT JOIN LATERAL (
          SELECT event_id, event_type
          FROM (SELECT user_id, event_id, event_type,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_ets FROM events) ev
          WHERE ev.user_id = o.o_custkey AND ev.e_ets <= o.o_ets
            AND o.o_ets - ev.e_ets <= {_ASOF_TOL_S}
          ORDER BY ev.e_ets DESC, ev.event_id DESC
          LIMIT 1
        ) e ON TRUE
    """,
    "asof_orders_events": """
        SELECT o.o_orderkey, o.o_custkey,
               e.event_id AS last_event_id,
               e.event_type AS last_event_type
        FROM (SELECT o_orderkey, o_custkey,
                     CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS o_ets
              FROM orders WHERE o_custkey <= 200) o
        LEFT JOIN LATERAL (
          SELECT event_id, event_type
          FROM (SELECT user_id, event_id, event_type,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_ets FROM events) ev
          WHERE ev.user_id = o.o_custkey AND ev.e_ets <= o.o_ets
          ORDER BY ev.e_ets DESC, ev.event_id DESC
          LIMIT 1
        ) e ON TRUE
    """,
    "asof_events_forward": """
        SELECT o.o_orderkey, o.o_custkey,
               e.event_id AS next_event_id,
               e.event_type AS next_event_type
        FROM (SELECT o_orderkey, o_custkey,
                     CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS o_ets
              FROM orders WHERE o_custkey <= 200) o
        LEFT JOIN LATERAL (
          SELECT event_id, event_type
          FROM (SELECT user_id, event_id, event_type,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_ets FROM events) ev
          WHERE ev.user_id = o.o_custkey AND ev.e_ets >= o.o_ets
          ORDER BY ev.e_ets ASC, ev.event_id ASC
          LIMIT 1
        ) e ON TRUE
    """,
    "asof_events_nearest": """
        SELECT o.o_orderkey, o.o_custkey,
               e.event_id AS near_event_id,
               e.event_type AS near_event_type
        FROM (SELECT o_orderkey, o_custkey,
                     CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS o_ets
              FROM orders WHERE o_custkey <= 200) o
        LEFT JOIN LATERAL (
          SELECT event_id, event_type
          FROM (SELECT user_id, event_id, event_type,
                       CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_ets FROM events) ev
          WHERE ev.user_id = o.o_custkey
          ORDER BY ABS(ev.e_ets - o.o_ets) ASC,
                   ev.e_ets ASC,
                   CASE WHEN ev.e_ets <= o.o_ets
                        THEN -ev.event_id ELSE ev.event_id END ASC
          LIMIT 1
        ) e ON TRUE
    """,
}
