"""Drop-in compatibility surface: ``HadroDB`` with the reference's calling
conventions, so code written against the reference runs unchanged.

Reference usage (``/root/reference/tests/test_interface.py:22-44`` and
``INTERFACE.md:3-43``)::

    collection = HadroDB("test_collection")   # no schema ceremony
    collection[key] = {"document": "..."}     # set
    doc = collection[key]                     # get
    key = collection.add(doc)                 # add with generated key
    del collection[key]                       # delete
    key in collection, len(collection), collection.keys()

Differences from the reference, deliberate and documented:

- the reference v0.0.4 HARDCODES a planets schema and coerces any dict
  positionally into it with no validation (``hadro/engine.py:109-126``);
  here the schema is INFERRED from the first appended record (field name →
  Spark type) and then enforced — the ``engine.py:129`` validation intent,
  made real.
- dict fields match by NAME, not position (SURVEY §7 risk 2).
- a SparkSession is created on demand (``get_spark()``) when none is given.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from hadrodb_spark.config import WRITE_CONSISTENCY, WriteConsistency
from hadrodb_spark.session import get_spark
from hadrodb_spark.sources.collection import HadroCollection, HadroError


def _infer_field(name: str, value: Any) -> T.StructField:
    if isinstance(value, bool):
        dt: T.DataType = T.BooleanType()
    elif isinstance(value, int):
        dt = T.LongType()
    elif isinstance(value, float):
        dt = T.DoubleType()
    elif isinstance(value, bytes):
        dt = T.BinaryType()
    elif isinstance(value, list) and value and isinstance(value[0], float):
        dt = T.ArrayType(T.DoubleType())
    else:
        dt = T.StringType()
    return T.StructField(name, dt, nullable=True)


class HadroDB:
    """The reference's entry-point class (``hadro/__init__.py:1`` exports
    ``HadroDB``), Spark-backed. Schema binds lazily on first append when the
    collection is new."""

    def __init__(
        self,
        collection: str,
        spark: SparkSession | None = None,
        consistency: WriteConsistency = WRITE_CONSISTENCY,
    ) -> None:
        self.spark = spark or get_spark()
        self._path = collection
        self._consistency = consistency
        self._coll: HadroCollection | None = None
        # existing collection: bind its stored schema immediately
        import os

        if os.path.exists(os.path.join(collection, "_hadro_schema.json")):
            self._coll = HadroCollection(self.spark, collection, consistency=consistency)

    def _bound(self, record: Mapping[str, Any] | None = None) -> HadroCollection:
        if self._coll is None:
            if record is None:
                raise HadroError("empty collection has no schema yet — append first")
            if not isinstance(record, Mapping):
                raise HadroError("first record must be a dict (schema is inferred from it)")
            schema = T.StructType([_infer_field(k, v) for k, v in record.items()])
            self._coll = HadroCollection(
                self.spark, self._path, schema, consistency=self._consistency
            )
        return self._coll

    def _require(self) -> HadroCollection:
        if self._coll is None:
            raise HadroError("empty collection has no schema yet — append first")
        return self._coll

    # ------------------------------------------------------- reference API
    def append(self, record, key: str | None = None) -> str:
        return self._bound(record).append(record, key=key)

    def add(self, record) -> str:
        return self._bound(record).add(record)

    def set(self, key, record) -> None:
        self._bound(record).set(str(key), record)

    __setitem__ = set

    def get(self, *keys):
        return self._require().get(*[str(k) for k in keys])

    def __getitem__(self, key):
        if isinstance(key, tuple):
            return self.get(*key)
        return self.get(key)

    def delete(self, key) -> None:
        self._require().delete(str(key))

    __delitem__ = delete

    def __contains__(self, key) -> bool:
        return self._coll is not None and str(key) in self._coll

    contains = __contains__

    def keys(self) -> list[str]:
        return [] if self._coll is None else self._coll.ids()

    ids = keys

    def __len__(self) -> int:
        return 0 if self._coll is None else len(self._coll)

    def where(self, predicate):
        return self._require().where(predicate)

    def scan(self, columns=None, predicates=None):
        """Reference signature (``hadro/engine.py:139``) — and here the
        parameters actually work."""
        return self._require().scan(columns=columns, predicate=predicates)

    def transaction(self):
        return self._require().transaction()

    def compact(self) -> None:
        self._require().compact()

    def close(self) -> None:
        if self._coll is not None:
            self._coll.close()
