"""hadrodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mabel-dev/hadrodb (reference: Bitcask-style
append-only log store, ``/root/reference/hadro/engine.py``), rebuilt
Spark-first.

Layers:

- :mod:`hadrodb_spark.sources.collection` — the storage layer: a *collection*
  is a directory of Parquet segments with an append-only, last-write-wins,
  tombstone-delete log semantic (the reference's Bitcask model re-expressed
  as merge-on-read Parquet).
- :mod:`hadrodb_spark.operators` — the relational + LLM-data-pipeline query
  surface (joins, aggs, windows, dedup, similarity search) as declarative
  DataFrame plans that Catalyst optimizes.
- :mod:`hadrodb_spark.functions` — scalar/text/vector helpers built on
  ``pyspark.sql.functions`` (JVM-side; no row-at-a-time Python UDFs in hot
  paths).
- :mod:`hadrodb_spark.streaming` — Structured Streaming over collections
  (the reference's ``.tweets`` event-collection use case).
"""

from hadrodb_spark.compat import HadroDB
from hadrodb_spark.config import WriteConsistency
from hadrodb_spark.session import get_spark
from hadrodb_spark.sources.collection import HadroCollection

__version__ = "0.1.0"

__all__ = [
    "HadroCollection",
    "HadroDB",
    "WriteConsistency",
    "get_spark",
    "__version__",
]
