"""Streaming joins (SURVEY §2.2 streaming row, completed):

- stream-static: enrich a stream against a static dimension — the dim is
  re-read per micro-batch (fresh LWW view when it's a HadroCollection scan);
  broadcast keeps the stream side shuffle-free.
- stream-stream: inner join of two event streams with watermarks on BOTH
  sides + a time-bound join condition, so state for unmatched rows is
  bounded and evicted — the only formulation that survives unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static equi-join (dim broadcast; re-evaluated each batch)."""
    return events.join(F.broadcast(dim), on, "left")


def left_outer_purchases(
    signups: DataFrame, purchases: DataFrame, within: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER stream-stream join: every signup, with its purchase if one
    arrived within the horizon, else null-extended ONCE the watermark passes
    (outer rows emit only when the state is provably complete)."""
    s = signups.select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
    ).withWatermark("s_ts", within)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", within)
    return s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {within}")),
        "left_outer",
    ).select(
        F.col("s_user").alias("user_id"), "signup_id", "purchase_id", "s_ts", "p_ts"
    )


def purchases_after_signup(
    signups: DataFrame, purchases: DataFrame, within: str = "2 hours"
) -> DataFrame:
    """Stream-stream join: purchases within ``within`` AFTER a signup by the
    same user. Watermarks on both inputs bound the join state."""
    s = signups.select(
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    ).withWatermark("s_ts", within)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value"),
    ).withWatermark("p_ts", within)
    return s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        F.col("s_user").alias("user_id"),
        "purchase_id",
        F.col("s_ts"),
        F.col("p_ts"),
        "value",
    )
