"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`hadrodb_spark`; this module is a thin
adapter over :mod:`hadrodb_spark.queries`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadrodb_spark import queries as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-like) on /root/testdata/sf0.001."""
    return _registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible entry in ``queries()``."""
    return dict(_registry.ORACLE)
