"""Skew-handling join patterns (SURVEY driver contract: salting for skew;
AQE's skew-join split is ON in the session factory — salting is the explicit
fallback for keys too hot even for AQE, e.g. a single tenant owning 30% of a
100 TB fact table).

``salted_join`` replicates the build side ``salt`` times and scatters the
probe side across the replicas: the hot key's rows spread over ``salt``
tasks instead of one straggler. Semantically transparent — the oracle is the
PLAIN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.operators.relational import dec, load


def salted_join(
    left: DataFrame, right: DataFrame, key: str, salt: int = 8
) -> DataFrame:
    """Inner equi-join with the left (large/skewed) side salted.

    left gets a random-ish but DETERMINISTIC salt (hash of a unique row
    attribute mod ``salt``); right is replicated ``salt`` times. Join on
    (key, salt) then drop the salt — same rows as the plain join."""
    salted_l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    replicas = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return salted_l.join(replicas, [key, "_salt"]).drop("_salt")


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders with the fact side salted 8 ways — result must equal
    the plain join (the oracle), proving salting is semantics-preserving."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_linenumber")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    joined = salted_join(li, orders, "l_orderkey", salt=8)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
    )


def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with time-bucket blocking: events within ±30 min of a
    purchase by the same user. Naive theta join is |purchases|×|events| per
    user; bucketing by 30-min epochs turns it into an equi-join on
    (user, bucket) with each purchase exploded to its 3 adjacent buckets —
    linear shuffle, exact results."""
    width = 1800
    events = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id"),
        F.col("event_type"),
        F.unix_timestamp("ts").alias("ets"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ets").alias("p_ets"),
    )
    exploded = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("p_ets") / width).cast("long") - 1,
                (F.col("p_ets") / width).cast("long"),
                (F.col("p_ets") / width).cast("long") + 1,
            )
        ),
    )
    near = events.withColumn("bucket", (F.col("ets") / width).cast("long"))
    return (
        exploded.join(near, ["user_id", "bucket"])
        .filter(
            (F.abs(F.col("ets") - F.col("p_ets")) <= width)
            & (F.col("event_id") != F.col("purchase_id"))
        )
        .select("user_id", "purchase_id", "event_id", "event_type")
        .distinct()
    )


ORACLE: dict[str, str] = {
    "join_salted": """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
    "join_interval_bucketed": """
        WITH ev AS (
          SELECT user_id, event_id, event_type,
                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS ets
          FROM events
        ),
        p AS (
          SELECT user_id, event_id AS purchase_id, ets AS p_ets
          FROM ev WHERE event_type = 'purchase'
        )
        SELECT DISTINCT p.user_id, p.purchase_id, e.event_id, e.event_type
        FROM p JOIN ev e
          ON p.user_id = e.user_id
         AND ABS(e.ets - p.p_ets) <= 1800
         AND e.event_id <> p.purchase_id
    """,
}
