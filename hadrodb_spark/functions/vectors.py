"""Vector column functions over ``array<float>`` embeddings — built-in
higher-order functions only (``zip_with`` + ``aggregate``), evaluated
JVM-side. No UDF, no collect.

Cross-engine determinism: elements are cast to DOUBLE before any arithmetic
and scores are rounded to 6 decimals at the surface — DuckDB's builtin
``list_dot_product`` accumulates in float32 and does NOT match, so oracles
must use the explicit ``list_transform``+``list_sum`` double form mirrored by
``sql_dot``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------- SQL twins
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / ({sql_norm(a)} * {sql_norm(b)}))"
