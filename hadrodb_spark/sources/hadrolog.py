"""hadrolog — a PySpark Python DataSource for the reference's native
on-disk segment format, for reading EXISTING HadroDB collections in place.

Format (from the reference's scan decoder, ``/root/reference/hadro/engine.py:
147-148,173-176`` and append path ``:131-132``):

    [1B flags][4B big-endian uint32 size][size bytes: msgpack row payload]

- ``flags & 0x01`` marks a tombstone; tombstoned records are skipped at scan
  (``hadro/engine.py:26,169-170``)
- records are framed back-to-back in ``<collection>/00000000.data``; the
  reference reads through an 8 MiB buffer reassembling records that span
  block boundaries (``hadro/engine.py:140,151-167``) — Python file I/O does
  the equivalent buffering here

The payload is an orso ``Row.to_bytes()`` msgpack tuple
(``hadro/engine.py:131``); :mod:`hadrodb_spark.sources.mpack` implements the
codec (pure stdlib, written from the public msgpack spec), so scans decode
to typed rows. Two read modes:

- raw (default): ``(segment, offset, flags, payload BINARY)`` — the log as
  frames, tombstones skippable.
- typed: pass ``.option("ddl", "title STRING, author STRING")`` and each
  live record's payload decodes to those columns positionally — the
  migration path for existing native collections.

Scale note: one Spark input partition per segment file (segments are
append-ordered units, like parquet files in HadroCollection); a 1000-segment
collection fans out across the cluster with no coordination.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DELETED_FLAG = 0x01

LOG_SCHEMA = T.StructType(
    [
        T.StructField("segment", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("flags", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def decode_payload(payload: bytes) -> tuple:
    """Decode an orso ``Row.to_bytes()`` msgpack payload to a value tuple
    (``hadro/engine.py:131,170``)."""
    from hadrodb_spark.sources.mpack import decode_row

    return decode_row(payload)


def encode_record(payload: bytes, deleted: bool = False) -> bytes:
    """Frame a payload exactly as the reference's append path does
    (``hadro/engine.py:131-132``): header then raw bytes."""
    flags = DELETED_FLAG if deleted else 0
    return struct.pack(">BI", flags, len(payload)) + payload


def encode_row_record(values, deleted: bool = False) -> bytes:
    """Frame + payload in one step: msgpack-encode a row tuple the way the
    reference's ``append`` does, ready to write to a ``.data`` segment."""
    from hadrodb_spark.sources.mpack import encode_row

    return encode_record(encode_row(values), deleted)


def iter_records(
    path: str, include_deleted: bool = False
) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, flags, payload) from one segment file, skipping
    tombstones unless asked — the ``hadro/engine.py:139-177`` scan loop."""
    with open(path, "rb") as f:
        offset = 0
        while True:
            header = f.read(5)
            if len(header) < 5:
                return
            flags, size = struct.unpack(">BI", header)
            payload = f.read(size)
            if len(payload) < size:
                return  # torn tail write — ignore, like a crashed appender
            if include_deleted or not (flags & DELETED_FLAG):
                yield offset, flags, payload
            offset += 5 + size


_DDL_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
}


def _parse_ddl(ddl: str) -> T.StructType:
    """Session-free parser for ``name TYPE, name TYPE`` column lists —
    atomic types only (native-format rows are scalar tuples)."""
    fields = []
    for part in ddl.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, typ = part.partition(" ")
        dt = _DDL_TYPES.get(typ.strip().lower())
        if dt is None:
            raise ValueError(
                f"unsupported type in ddl: {typ!r} (atomic types only)"
            )
        fields.append(T.StructField(name, dt, nullable=True))
    if not fields:
        raise ValueError("ddl option produced no columns")
    return T.StructType(fields)


class _SegmentPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class HadroLogReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.dir = options["path"]
        self.include_deleted = options.get("include_deleted", "false") == "true"
        self.typed = "ddl" in options

    def partitions(self) -> list[InputPartition]:
        segs = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".data")
        )
        return [_SegmentPartition(os.path.join(self.dir, s)) for s in segs]

    def read(self, partition: _SegmentPartition) -> Iterator[tuple]:
        # per-task read; raw mode is stdlib-only, typed mode imports the
        # package's codec (register() ships it to executors via addPyFile)
        if self.typed:
            from hadrodb_spark.sources.mpack import decode_row

            for _, _, payload in iter_records(partition.path, False):
                yield decode_row(payload)
            return
        seg = os.path.basename(partition.path)
        for offset, flags, payload in iter_records(
            partition.path, self.include_deleted
        ):
            yield (seg, offset, flags, payload)


class HadroLogDataSource(DataSource):
    """``spark.read.format("hadrolog").option("path", dir)`` over a native
    HadroDB collection directory."""

    @classmethod
    def name(cls) -> str:
        return "hadrolog"

    def schema(self) -> T.StructType:
        ddl = self.options.get("ddl")
        if ddl:
            # parsed without Spark: the DataSource is instantiated in a
            # planning process with no active session (fromDDL needs one)
            return _parse_ddl(ddl)
        return LOG_SCHEMA

    def reader(self, schema: T.StructType) -> HadroLogReader:
        return HadroLogReader(self.options)


def register(spark) -> None:
    """Register the source AND ship the package to executors — the reader
    class is pickled by reference, so executor Python workers must be able
    to import ``hadrodb_spark`` regardless of the driver's cwd."""
    import tempfile
    import zipfile

    import hadrodb_spark

    pkg_dir = os.path.dirname(os.path.abspath(hadrodb_spark.__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.mkdtemp(prefix="hadrolog_"), "hadrodb_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    spark.dataSource.register(HadroLogDataSource)
