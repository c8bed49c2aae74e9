"""Streaming curation: the pretraining funnel as a continuous pipeline.

Raw document segments land in a directory; ``readStream`` discovers them,
the map-only gate stack (language-ID + quality, shared verbatim with the
batch ``curation_pipeline`` via :func:`~hadrodb_spark.operators.pipeline2.
curation_gates`) filters in-flight, and each micro-batch commits the
survivors into a curated :class:`HadroCollection` after exact dedup:

- within-batch: keep the lowest ``doc_id`` per canonical fingerprint
  (one window over the — already gate-shrunk — batch);
- across batches: left-anti join against the fingerprints already in the
  collection (first batch wins, matching the batch pipeline's
  keep-lowest-id semantics because the stream replays segments in order).

At scale the anti-join probe is a join against the curated collection's
fingerprint column — merge-on-read with key pushdown; a state-store keyed
by fingerprint (``transformWithStateInPandas``) is the alternative when
the curated set must stay hot in executor memory.

Exactly-once: the same (checkpoint, batch id, content fingerprint)
full-match replay guard as ``stream_into_collection`` — a WAL replay is
skipped, a checkpoint-loss redelivery falls through and is absorbed by
the fingerprint anti-join, so a crash can neither double-ingest nor
silently drop post-crash data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.query import StreamingQuery
from pyspark.sql.window import Window

from hadrodb_spark.operators.pipeline2 import curation_gates
from hadrodb_spark.sources.collection import HadroCollection

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

CURATED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("fp", T.StringType(), False),
    ]
)


def curate_stream(
    spark: SparkSession,
    docs_path: str,
    coll: HadroCollection,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously curate document segments from ``docs_path`` into
    ``coll`` (schema ``CURATED_SCHEMA``, keyed by fingerprint)."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_path)
    )
    return _start_curation(stream, coll, checkpoint, available_now)


def curate_native_stream(
    spark: SparkSession,
    native_dir: str,
    coll: HadroCollection,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """The full round-trip SURVEY §1.4 hints at: documents living in the
    reference's NATIVE on-disk format are consumed incrementally through
    the hadrolog stream reader (frame-aligned offsets — new segments and
    in-place appends both picked up), pushed through the same gate stack
    as the batch pipeline, and committed into a curated collection with
    the same dedup + replay guarantees as :func:`curate_stream`. A user
    whose appender writes `.tweets`-style logs gets a continuously
    curated dataset without ever converting the source."""
    from hadrodb_spark.sources import hadrolog

    hadrolog.register(spark)
    stream = (
        spark.readStream.format("hadrolog")
        .option("path", native_dir)
        .option("ddl", "doc_id bigint, text string")
        .load()
    )
    return _start_curation(stream, coll, checkpoint, available_now)


def _start_curation(
    stream: DataFrame,
    coll: HadroCollection,
    checkpoint: str,
    available_now: bool,
) -> StreamingQuery:
    gated = curation_gates(stream).select("doc_id", "quality", "n_tokens", "fp")

    marker = os.path.join(coll.path, "_hadro_stream_batch.json")
    ckpt_id = os.path.abspath(checkpoint)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        # Skip ONLY a full-match WAL replay (streaming/replay.py — the r5
        # policy). A renumbered redelivery after checkpoint loss falls
        # through and is absorbed by the fp anti-join below, so nothing
        # can double-land OR be dropped.
        from hadrodb_spark.streaming import replay

        bfp = replay.batch_fingerprint(batch)
        if replay.is_wal_replay(marker, ckpt_id, batch_id, bfp):
            return
        w = Window.partitionBy("fp").orderBy("doc_id")
        deduped = (
            batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        seen = coll.scan(columns=["fp"])
        fresh = deduped.join(seen, "fp", "left_anti").select(
            "doc_id", "quality", "n_tokens", "fp"
        )
        coll.append_df(fresh, key_col="fp")
        replay.stamp_marker(marker, ckpt_id, batch_id, bfp)

    writer = (
        gated.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
