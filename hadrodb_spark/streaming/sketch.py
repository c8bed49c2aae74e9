"""Incremental sketch maintenance over a stream — the count-min counters
from ``operators/sketch.py`` kept up to date per micro-batch in a
HadroCollection, so the sketch is queryable BETWEEN batches and survives
restarts (the collection's LWW log is the state store).

Per trigger: (1) hash the batch's keys into (j, bucket) partial counts —
map-side, d×w rows max; (2) read the current 1024-row counter relation
from the collection; (3) sum and append the new counter versions (LWW
makes the append an upsert). The idempotency marker follows the
stream_into_collection contract (checkpoint-scoped batch ids), so a
replayed batch never double-counts.

Scale: the per-batch delta aggregation is the only work proportional to
input; the state read/write is O(d×w) rows regardless of stream history —
the property that makes a sketch the right streaming accumulator."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from hadrodb_spark.sources.collection import HadroCollection

CMS_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.StringType(), False),
        T.StructField("j", T.IntegerType(), True),
        T.StructField("bucket", T.StringType(), True),
        T.StructField("c", T.LongType(), True),
    ]
)

_D = 4     # hash functions (2-hex-char md5 slices, as in operators/sketch)
_W = 256   # buckets per function


def _delta_counts(batch: DataFrame, key_col: str) -> DataFrame:
    """Map-side (j, bucket) partial counts for one micro-batch."""
    keyed = batch.select(
        F.md5(F.col(key_col).cast("string")).alias("h")
    )
    j = F.explode(F.array(*[F.lit(i) for i in range(_D)])).alias("j")
    return (
        keyed.select("h", j)
        .select(
            "j",
            F.expr("substring(h, 1 + 2 * j, 2)").alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_stream(
    stream: DataFrame,
    coll: HadroCollection,
    key_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain count-min counters in ``coll`` (schema: slot STRING key,
    j INT, bucket STRING, c LONG) incrementally from a stream."""
    marker = os.path.join(coll.path, "_hadro_cms_batch.json")
    ckpt_id = os.path.abspath(checkpoint)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            with open(marker) as f:
                state = json.load(f)
            if state.get("checkpoint") == ckpt_id and batch_id <= state["last_batch"]:
                return
        delta = _delta_counts(batch, key_col)
        cur = coll.scan(columns=["slot", "c"]).select(
            F.col("slot"), F.col("c").alias("c_old")
        )
        merged = (
            delta.withColumn("slot", F.concat_ws("|", "j", "bucket"))
            .join(cur, "slot", "left")
            .select(
                "slot",
                "j",
                "bucket",
                (F.col("c") + F.coalesce("c_old", F.lit(0))).alias("c"),
            )
        )
        coll.append_df(merged, key_col="slot")
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"checkpoint": ckpt_id, "last_batch": batch_id}, f)
        os.replace(tmp, marker)

    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
