"""Incremental sketch maintenance over a stream — the count-min counters
from ``operators/sketch.py`` kept up to date per micro-batch in a
HadroCollection, so the sketch is queryable BETWEEN batches and survives
restarts (the collection's LWW log is the state store).

Per trigger: (1) hash the batch's keys into (j, bucket) partial counts —
map-side, d×w rows max; (2) read the current 1024-row counter relation
from the collection; (3) sum and append the new counter versions (LWW
makes the append an upsert). The last-applied (batch id, content
fingerprint) rides in the SAME commit as the counters (a ``_cms_meta``
row, LWW-upserted like any other slot), so the merge and its replay guard
are atomic: a crash either loses both (the batch replays cleanly against
the old counters) or persists both. This read-modify-write merge is NOT
intrinsically idempotent, so a marker written in a separate step — the
round-2 design — double-counted any batch that crashed between the
counter commit and the marker write.

Replay policy for the non-idempotent accumulators (CMS, MG) — the r4
ADVICE hazard was a bare ``batch_id <= marker`` skip that silently DROPPED
new data after checkpoint loss (a restarted availableNow run renumbers
batches from 0, so a renumbered batch carrying unseen rows matched the
stale marker):

* same batch id AND same content fingerprint → a WAL replay of the batch
  that wrote the marker: skip (the exactly-once path);
* batch id above the marker → normal progress: merge;
* batch id at-or-below the marker with a different fingerprint → the
  checkpoint was lost and the source is being redelivered from offset 0:
  REBUILD (reset the accumulator, apply this batch fresh) — subsequent
  renumbered batches then merge normally, so the final state is an exact
  recount of everything the source retains, old AND new, counted once.
  (A skip-on-full-match-only policy without the rebuild would
  double-count any multi-batch redelivery.)

Rebuild assumes the source can redeliver from the beginning — true for
the file sources these accumulators target (that is exactly what a
post-checkpoint-loss availableNow run does); a retention-limited source
that cannot redeliver history forfeits the pre-loss counts, which no
scalar marker can recover.

Scale: the per-batch delta aggregation is the only work proportional to
input; the state read/write is O(d×w) rows regardless of stream history —
the property that makes a sketch the right streaming accumulator. The
fingerprint is one order-independent agg over the batch (count + summed
xxhash64), map-side combinable."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from hadrodb_spark.functions.sketches import mg_partials_closure
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


META_SLOT = "_cms_meta"  # j = -1; bucket carries JSON {ckpt, n, h}, c the batch id


def content_fingerprint(batch: DataFrame, cols: list[str]) -> tuple[int, int]:
    """Order-independent content fingerprint of a micro-batch over ``cols``:
    (row count, sum of xxhash64) — partitioning- and delivery-order-proof,
    so a WAL replay matches and any content drift does not. The hash sum
    runs in DECIMAL(38,0): raw int64 hashes overflow a LONG sum under
    ANSI mode; JSON and Python ints carry the wide value losslessly.
    Shared by the sketch accumulators here (key-column fingerprints —
    their deltas depend only on the key multiset) and the collection
    sinks in ingest/curation (ALL-column fingerprints — a CDC redelivery
    can repeat a key set with NEW values and must not match)."""
    row = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.xxhash64(
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                        for c in cols
                    ]
                ).cast("decimal(38,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _fingerprint(batch: DataFrame, key_col: str) -> tuple[int, int]:
    return content_fingerprint(batch, [key_col])


def _replay_mode(
    meta_ckpt: str | None,
    meta_batch: int,
    meta_fp: tuple[int, int] | None,
    ckpt_id: str,
    batch_id: int,
    fp: tuple[int, int],
) -> str:
    """'skip' | 'merge' | 'rebuild' per the module-docstring replay policy.

    A DIFFERENT checkpoint identity also rebuilds — deliberately: a new
    query lineage (fresh or relocated checkpoint) consumes its source
    from offset 0, so merging would double-count the redelivered history
    while rebuilding yields the exact recount. The flip side is a
    documented non-feature: TWO live lineages feeding one accumulator
    collection would reset each other — multi-writer accumulation was
    never supported (the read-modify-write merge itself races), so the
    rebuild makes the single-writer contract self-enforcing rather than
    silently wrong. Legacy (pre-r5) markers parse as a foreign lineage
    and rebuild the same way — exact recount, not a crash."""
    if meta_ckpt is None:
        return "merge"  # fresh state: merging with nothing == rebuild
    if meta_ckpt == ckpt_id:
        if batch_id == meta_batch and fp == meta_fp:
            return "skip"  # WAL replay of the marker's own batch
        if batch_id > meta_batch:
            return "merge"
    # renumbered/regressed ids or a new checkpoint identity: the stream is
    # redelivering from the beginning — start the accumulator over
    return "rebuild"


def counters(coll: HadroCollection) -> DataFrame:
    """The live counter relation (meta row excluded) — what queries read."""
    return coll.scan(columns=["slot", "j", "bucket", "c"]).filter(
        F.col("slot") != META_SLOT
    )


def countmin_stream(
    stream: DataFrame,
    coll: HadroCollection,
    key_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain count-min counters in ``coll`` (schema: slot STRING key,
    j INT, bucket STRING, c LONG) incrementally from a stream."""
    ckpt_id = os.path.abspath(checkpoint)

    import json

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        state = coll.scan(columns=["slot", "j", "bucket", "c"])
        # 1-row bounded read: the last (checkpoint, batch, fingerprint) this
        # collection applied — committed atomically WITH its counters
        meta = state.filter(F.col("slot") == META_SLOT).select("bucket", "c").collect()
        try:
            m = json.loads(meta[0]["bucket"]) if meta else {}
        except json.JSONDecodeError:
            # pre-r5 marker format (raw checkpoint path, no fingerprint):
            # treated as a foreign lineage → REBUILD, the exact-recount
            # recovery — never a crash, never a double-count
            m = {"ckpt": "<legacy-pre-r5-marker>"}
        fp = _fingerprint(batch, key_col)
        mode = _replay_mode(
            m.get("ckpt"),
            meta[0]["c"] if meta else -1,
            (m.get("n"), m.get("h")) if meta else None,
            ckpt_id,
            batch_id,
            fp,
        )
        if mode == "skip":
            return
        delta = _delta_counts(batch, key_col).withColumn(
            "slot", F.concat_ws("|", "j", "bucket")
        )
        cur = state.filter(F.col("slot") != META_SLOT)
        if mode == "merge":
            merged = delta.join(
                cur.select("slot", F.col("c").alias("c_old")), "slot", "left"
            ).select(
                "slot",
                "j",
                "bucket",
                (F.col("c") + F.coalesce("c_old", F.lit(0))).alias("c"),
            )
        else:  # rebuild: delta counts stand alone; stored slots not in the
            # delta are zeroed so no stale pre-loss value survives the LWW
            stale = cur.join(delta.select("slot"), "slot", "left_anti").select(
                "slot", "j", "bucket", F.lit(0).cast("long").alias("c")
            )
            merged = delta.select("slot", "j", "bucket", "c").unionByName(stale)
        meta_row = batch.sparkSession.createDataFrame(
            [
                (
                    META_SLOT,
                    -1,
                    json.dumps({"ckpt": ckpt_id, "n": fp[0], "h": fp[1]}),
                    batch_id,
                )
            ],
            CMS_SCHEMA,
        )
        # ONE append_df = ONE collection commit: counters + marker are
        # atomic, so a crash can never persist one without the other
        coll.append_df(merged.unionByName(meta_row), key_col="slot")

    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------- Misra-Gries

MG_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
    ]
)

MG_SLOT = "_mg_summary"   # JSON {term: est}
MG_META_SLOT = "_mg_meta"  # JSON {ckpt, batch} — same commit ⇒ atomic
MG_K = 8                   # counters kept after each merge


def mg_summary(coll: HadroCollection) -> dict:
    """The current heavy-hitter summary as a dict (≤ MG_K entries)."""
    import json

    rows = coll.scan(columns=["slot", "payload"]).filter(
        F.col("slot") == MG_SLOT
    ).collect()
    return json.loads(rows[0]["payload"]) if rows else {}


def mg_stream(
    stream: DataFrame,
    coll: HadroCollection,
    key_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain a Misra-Gries heavy-hitter summary in ``coll``
    incrementally — the frequent-items twin of :func:`countmin_stream`.

    Per trigger: (1) partition-local MG partials via mapInPandas (≤ MG_K
    counters per task — the batch never aggregates its full key space);
    (2) driver-side merge with the stored summary (bounded: ≤ MG_K ×
    partitions + MG_K rows) and the standard compress step (subtract the
    (K+1)-th largest, keep positive); (3) ONE collection commit carrying
    BOTH the new summary and the replay marker (the countmin_stream
    atomicity design — a crash loses both or persists both). Mergeable-
    summaries theorem: total error ≤ n/(K+1) over the whole stream under
    any batching/partitioning, so tests assert the guarantee booleans,
    never raw estimates."""
    import json
    import os as _os

    ckpt_id = _os.path.abspath(checkpoint)

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        state = {
            r["slot"]: r["payload"]
            for r in coll.scan(columns=["slot", "payload"]).collect()
        }
        meta = json.loads(state.get(MG_META_SLOT) or "{}")
        fp = _fingerprint(batch, key_col)
        mode = _replay_mode(
            meta.get("ckpt"),
            meta.get("batch", -1),
            (meta.get("n"), meta.get("h")),
            ckpt_id,
            batch_id,
            fp,
        )
        if mode == "skip":
            return
        # rebuild (checkpoint lost, source redelivering from the start):
        # restart the summary from empty — see the module docstring
        counters = json.loads(state.get(MG_SLOT) or "{}") if mode == "merge" else {}

        # shared BY-VALUE closure factory (functions/sketches.py) — one MG
        # implementation with the batch operator; NULL keys are excluded
        # there (a None dict key would crash the sorted-JSON persistence)
        partials = batch.select(
            F.col(key_col).cast("string").alias("k")
        ).mapInPandas(
            mg_partials_closure(MG_K, "k"), schema="k string, est long"
        )
        for r in partials.collect():  # bounded: ≤ MG_K × partitions rows
            counters[r["k"]] = counters.get(r["k"], 0) + r["est"]
        if len(counters) > MG_K:
            sub = sorted(counters.values(), reverse=True)[MG_K]
            counters = {t: c - sub for t, c in counters.items() if c - sub > 0}
        rows = [
            (MG_SLOT, json.dumps(counters, sort_keys=True)),
            (
                MG_META_SLOT,
                json.dumps(
                    {"ckpt": ckpt_id, "batch": batch_id, "n": fp[0], "h": fp[1]}
                ),
            ),
        ]
        coll.append_df(
            batch.sparkSession.createDataFrame(rows, MG_SCHEMA), key_col="slot"
        )

    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------------------ exact bitmaps

BMD_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.StringType(), False),
        T.StructField("day", T.StringType(), True),
        T.StructField("bkt", T.LongType(), True),
        T.StructField("bm", T.BinaryType(), True),
    ]
)

BMD_META_SLOT = "_bmd_meta"  # day carries the checkpoint id, bkt the batch id


def bitmap_daily_counts(coll: HadroCollection) -> DataFrame:
    """Per-day EXACT distinct counts from the maintained bitmap state —
    what dashboards read between batches, no raw-event rescan."""
    state = coll.scan(columns=["slot", "day", "bkt", "bm"]).filter(
        F.col("slot") != BMD_META_SLOT
    )
    return state.groupBy("day").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_distinct")
    )


def bitmap_distinct_stream(
    stream: DataFrame,
    coll: HadroCollection,
    key_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain EXACT per-day distinct counts incrementally — the third
    streaming accumulator next to countmin_stream (approximate counts)
    and mg_stream (heavy hitters), and the only exact one: per
    (day, 32768-bucket) roaring-style bitmaps, batch deltas OR-merged
    into stored state. Unlike count_distinct over a stream (which needs
    the full key set as state rows), bitmap state is O(|days|×|buckets|)
    fixed-size pages, and merging is associative/commutative/idempotent
    — a replayed batch ORs in bits that are already set, so replays
    cannot double-count. There is deliberately NO batch-id marker here:
    a bare ``batch_id <= marker`` skip silently DROPS data after
    checkpoint loss (availableNow renumbers batches from 0, so a
    renumbered batch carrying unseen rows matches a stale marker), and
    for an idempotent merge the marker buys nothing — re-merging is the
    cheaper and always-correct recovery. The non-idempotent accumulators
    (CMS/MG above) keep a (batch, fingerprint) marker because their
    merges double-count; this one's merge doesn't, so it doesn't.
    The bucket discipline (bitmap_bucket_number) is load-bearing:
    one un-bucketed bitmap drops values at the 32768 boundary."""

    def commit_batch(batch: DataFrame, batch_id: int) -> None:
        state = coll.scan(columns=["slot", "day", "bkt", "bm"])
        delta = (
            batch.select(
                F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
                F.col(key_col).alias("v"),
            )
            .filter(F.col("v").isNotNull())
            .groupBy("day", F.expr("bitmap_bucket_number(v)").alias("bkt"))
            .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(v))").alias("bm"))
        )
        cur = state.filter(F.col("slot") != BMD_META_SLOT).select("day", "bkt", "bm")
        merged = (
            delta.unionByName(cur)
            .groupBy("day", "bkt")
            .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
            .select(
                F.concat_ws("|", "day", "bkt").alias("slot"), "day", "bkt", "bm"
            )
        )
        coll.append_df(merged, key_col="slot")

    return (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
