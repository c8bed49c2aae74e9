"""Multimodal column handling (SURVEY.md §2.3): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
UDFs over ``mapInPandas``.

The decode step itself (image/audio libs) is STUBBED — this container ships
no codecs — behind ``NotImplementedError`` with a deterministic fake
(``fake_decode_features``) so the Spark-side plumbing (schema, batch shape,
partitioning, Arrow transfer) is real and tested.

Scale design: ``mapInPandas`` streams Arrow batches through Python — one
pass, no driver collect; blob columns stay opaque to the optimizer while the
typed metadata columns still prune/push down.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video | text
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),   # JSON metadata
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)


def decode_image(blob: bytes) -> object:
    """Real image decode — requires PIL/libvips, not present in this
    container. Plumbing uses fake_decode_features instead."""
    raise NotImplementedError("image codecs not available in this environment")


def decode_audio(blob: bytes) -> object:
    raise NotImplementedError("audio codecs not available in this environment")


def sample_video_frames(blob: bytes, every_n: int = 30) -> list:
    raise NotImplementedError("video codecs not available in this environment")


def fake_decode_features(blob: bytes) -> dict:
    """Deterministic stand-in for decode+feature-extract: byte length and
    content hash — enough to verify batch shape and Arrow round-tripping."""
    return {
        "n_bytes": len(blob) if blob is not None else None,
        "content_md5": hashlib.md5(blob).hexdigest() if blob is not None else None,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a media DataFrame
    (``MEDIA_SCHEMA`` → ``FEATURE_SCHEMA``)."""

    # NOTE: the closure must be self-contained (stdlib only) — referencing
    # module-level helpers would pickle a by-reference import of
    # hadrodb_spark, which executor Python workers may not have on sys.path.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(b) if b is not None else None for b in pdf["blob"]
                    ],
                    "content_md5": [
                        _hashlib.md5(b).hexdigest() if b is not None else None
                        for b in pdf["blob"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_bytes", T.LongType(), True),
        T.StructField("resized_bytes", T.LongType(), True),
        T.StructField("resized_md5", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def resize_media(media: DataFrame, target_chars: int = 200) -> DataFrame:
    """Arrow-batched "resize": the deterministic stand-in for an image
    resize keeps the first ``target_chars`` code points of the decoded
    blob (a real implementation would swap in PIL here — the schema,
    batch shape, and partitioning are what this exercises). 1→1 rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            orig, resized, digests = [], [], []
            for b in pdf["blob"]:
                if b is None:
                    orig.append(None); resized.append(None); digests.append(None)
                    continue
                small = bytes(b).decode("utf-8")[:target_chars].encode("utf-8")
                orig.append(len(b))
                resized.append(len(small))
                digests.append(_hashlib.md5(small).hexdigest())
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_bytes": _pd.array(orig, dtype="Int64"),
                    "resized_bytes": _pd.array(resized, dtype="Int64"),
                    "resized_md5": digests,
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, frame_chars: int = 64, every_n: int = 4) -> DataFrame:
    """Arrow-batched frame sampling: the blob is treated as a sequence of
    ``frame_chars``-code-point pseudo-frames and every ``every_n``-th frame
    is emitted as its own row — the 1→N batch-expansion shape a real video
    frame sampler produces (codec swap-in point: ``sample_video_frames``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                if b is None:
                    continue
                text = bytes(b).decode("utf-8")
                for i in range(0, len(text), frame_chars):
                    idx = i // frame_chars
                    if idx % every_n:
                        continue
                    frame = text[i : i + frame_chars].encode("utf-8")
                    ids.append(mid)
                    idxs.append(idx)
                    digests.append(_hashlib.md5(frame).hexdigest())
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="int64"),
                    "frame_idx": _pd.array(idxs, dtype="int64"),
                    "frame_md5": digests,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


TILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("tiles", T.ArrayType(T.StringType()), True),
    ]
)

N_TILES = 8


def tile_hashes(media: DataFrame) -> DataFrame:
    """Arrow-batched perceptual tile fingerprints: the decoded blob is cut
    into ``N_TILES`` equal character tiles and each tile is content-hashed
    — the deterministic stand-in for a perceptual tile hash (real image
    near-dup systems match per-tile DCT/aHash signatures the same way;
    the codec swap-in point is ``decode_image``).  1→1 rows, emitting an
    8-element hash array per asset."""

    # N_TILES is captured BY VALUE as a default argument: the closure ships
    # to executors by-value (nested-closure discipline), and a default arg
    # pins the constant at definition time without a module-global lookup.
    def run(
        batches: Iterator[pd.DataFrame], n_tiles: int = N_TILES
    ) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            ids, tile_lists = [], []
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                ids.append(mid)
                if b is None:
                    tile_lists.append(None)
                    continue
                text = bytes(b).decode("utf-8")
                width = (len(text) + n_tiles - 1) // n_tiles
                tile_lists.append(
                    [
                        _hashlib.md5(
                            text[i * width : (i + 1) * width].encode("utf-8")
                        ).hexdigest()
                        for i in range(n_tiles)
                    ]
                )
            yield _pd.DataFrame(
                {"media_id": _pd.array(ids, dtype="int64"), "tiles": tile_lists}
            )

    return media.mapInPandas(run, schema=TILE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as an opaque utf-8 blob — the fixture for
    multimodal plumbing tests (no real media in the test data)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("blob"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )
