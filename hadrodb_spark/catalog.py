"""HadroCatalog — SQL over registered collections: the host-engine role the
reference delegates to Opteryx (``/root/reference/README.md:5``, "a database
storage engine for Opteryx"). Collections register as temp views of their
live (LWW, tombstone-filtered) scan; arbitrary Spark SQL runs across them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hadrodb_spark.sources.collection import KEY_COL, HadroCollection


class HadroCatalog:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._collections: dict[str, HadroCollection] = {}

    def create(self, name: str, path: str, schema: T.StructType) -> HadroCollection:
        return self.register(name, HadroCollection(self.spark, path, schema))

    def open(self, name: str, path: str) -> HadroCollection:
        return self.register(name, HadroCollection(self.spark, path))

    def register(self, name: str, coll: HadroCollection) -> HadroCollection:
        self._collections[name] = coll
        return coll

    def __getitem__(self, name: str) -> HadroCollection:
        return self._collections[name]

    def names(self) -> list[str]:
        return sorted(self._collections)

    def refresh(self) -> None:
        """(Re)bind each collection's live view — call after writes so SQL
        sees the latest committed state."""
        for name, coll in self._collections.items():
            coll.scan().drop(KEY_COL).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        """Run SQL over the registered collections' live views."""
        self.refresh()
        return self.spark.sql(query)
