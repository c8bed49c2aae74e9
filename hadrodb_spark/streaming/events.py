"""Structured Streaming over collections — the reference's ``.tweets`` event
collection use case (an empty streaming collection shipped at the repo root,
``/root/reference/.tweets/00000000.data``; SURVEY.md §2.2 streaming row).

A HadroCollection's segment directory doubles as a streaming source: new
Parquet segments appended by writers are discovered by ``readStream`` —
exactly the Bitcask "append-only log as event stream" idiom, Spark-first.

All operators are standard Structured Streaming: watermarks bound state,
windowed aggregations pre-aggregate map-side, and
``dropDuplicatesWithinWatermark`` gives at-least-once dedup with bounded
state — each scales horizontally because state is hash-partitioned by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, path: str, schema: T.StructType = EVENT_SCHEMA) -> DataFrame:
    """Open a collection segment directory as a stream (one file per commit
    ⇒ one micro-batch unit; maxFilesPerTrigger bounds batch size)."""
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 8).parquet(path)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event counts with late-data drop via watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, window: str = "2 hours", slide: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Sliding-window per-type counts/totals — each event updates
    window/slide OVERLAPPING window states (4 at the defaults), the state
    shape ``tumbling_counts`` never exercises."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_avg(events: DataFrame, window: str = "2 hours", slide: str = "1 hour", watermark: str = "4 hours") -> DataFrame:
    """Sliding-window per-user average (each event lands in window/slide
    overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events", "avg_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows: activity bursts per user separated by >gap idle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def trending_topk_sink(
    counts: DataFrame,
    out_dir: str,
    checkpoint: str,
    k: int = 3,
):
    """Per-window trending top-k — the rank-on-emit idiom: append-mode
    windowed aggregation finalizes every window exactly once (all its
    event_type rows close together when the watermark passes window end),
    so ranking inside ``foreachBatch`` is exact with NO extra streaming
    state. Use over :func:`tumbling_counts` output; streaming DataFrames
    can't host window functions, which is exactly why the rank belongs in
    the per-batch (plain batch) plan.

    Scale: each emitted batch holds only newly-closed windows (|types| rows
    per window); the rank window partitions by window_start — bounded work
    per trigger however large the stream history.

    Delivery contract — STRUCTURALLY idempotent, no marker: each batch
    OVERWRITES its own ``batch=N`` subdirectory, so a WAL replay (crash
    anywhere between the write and the checkpoint commit) rewrites the
    same directory with the same deterministic content instead of
    double-appending — there is no ordering window at all, unlike a
    marker written before (loses the batch) or after (double-appends on
    a crash in between) the data. Read the log back with
    :func:`read_trending`, which hides the partitioning column. Under
    CHECKPOINT LOSS the sink is at-least-once by design: renumbered
    redelivery overwrites low batch dirs but cannot clear stale
    higher-numbered ones — an unkeyed log has nothing to dedup on; feed
    a keyed collection via ``ingest.stream_merge_into_collection`` when
    redelivery dedup is required."""
    from pyspark.sql.window import Window

    def rank_batch(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), "event_type"
        )
        (
            batch.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= k)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch={batch_id}")
        )

    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(rank_batch)
        .trigger(availableNow=True)
        .start()
    )


def read_trending(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the trending-top-k log written by :func:`trending_topk_sink`,
    hiding the per-batch idempotency partitioning."""
    return spark.read.parquet(out_dir).drop("batch")


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: state holds only
    keys newer than the watermark, so memory is bounded at any scale."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(stream: DataFrame, name: str, mode: str = "append") -> None:
    """Drain all available input into an in-memory table (test/driver
    convenience; uses availableNow so the query terminates)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
