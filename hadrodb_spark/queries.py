"""Query registry — the single source of truth behind ``__spark_entry__``.

``QUERIES`` maps a name from SURVEY.md §2's inventory to a callable
``(spark, sf_dir) -> DataFrame``; ``ORACLE`` maps the same name to the DuckDB
SQL twin (absent ⇒ the driver records a weaker rows-only check — reserved
for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadrodb_spark.operators import (
    asof,
    components,
    dedup,
    kv,
    multimodal_ops,
    relational,
    relational2,
    relational3,
    sessionize,
    similarity,
    skew,
    textops,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(module) -> None:
    oracle = getattr(module, "ORACLE", {})
    rows_only = set(getattr(module, "ROWS_ONLY", ()))
    for name in list(oracle) + list(rows_only):
        fn = getattr(module, name)
        QUERIES[name] = fn
        if name in oracle:
            ORACLE[name] = oracle[name]


_register(relational)
_register(relational2)
_register(relational3)
_register(asof)
_register(kv)
_register(sessionize)
_register(skew)
_register(textops)
_register(dedup)
_register(components)
_register(similarity)
_register(multimodal_ops)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return relational.sql_tpch_q1_like(spark, sf_dir)
