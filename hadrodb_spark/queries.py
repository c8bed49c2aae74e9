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
    analytics,
    asof,
    components,
    dedup,
    graph,
    kv,
    multimodal_ops,
    pipeline2,
    pipeline3,
    pipeline4,
    pipeline5,
    relational,
    relational2,
    relational3,
    relational4,
    sessionize,
    similarity,
    sketch,
    skew,
    sqlsuite,
    textops,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _register(module, only: list[str] | None = None) -> None:
    oracle = getattr(module, "ORACLE", {})
    rows_only = set(getattr(module, "ROWS_ONLY", ()))
    names = only if only is not None else list(oracle) + list(rows_only)
    for name in names:
        if name in QUERIES:
            continue
        fn = getattr(module, name)
        QUERIES[name] = fn
        if name in oracle:
            ORACLE[name] = oracle[name]


# Registration order matters: the driver verifies the FIRST 50 registry
# entries each round.  Round 1 verified the relational/relational2 tier
# (CORRECTNESS_r01.json, 50/50 green); round 2's window held the KV /
# LLM-pipeline tiers plus pipeline2.  Round 3 therefore front-loads the
# 15 entries still without a driver row — the pipeline3 tier, the
# composite SQL suite, and relational3's post-freeze additions — followed
# by everything NEW this round, with previously-verified tiers last.
_register(pipeline3)
_register(sqlsuite)
_register(relational3, only=["window_analytic_ranks", "fuzzy_pairs_levenshtein"])
# --- new round-3 modules (inside the verification window) ---
_register(pipeline4)
_register(relational4)
# --- new this round (inside the verification window) ---
_register(asof, only=["asof_events_forward", "asof_events_nearest"])
_register(multimodal_ops, only=["multimodal_resize", "multimodal_frames"])
_register(graph)
_register(sketch)
_register(pipeline5)
_register(analytics)
# --- round-2-verified tier ---
_register(kv)
_register(textops)
_register(dedup)
_register(components)
_register(similarity)
_register(multimodal_ops)
_register(sessionize)
_register(skew)
_register(asof)
_register(
    relational2,
    only=["profile_columns", "udf_scalar", "udf_pandas", "agg_approx_distinct"],
)
_register(pipeline2)
_register(relational3)  # its round-2-verified remainder
# --- round-1-verified tier ---
_register(relational)
_register(relational2)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return relational.sql_tpch_q1_like(spark, sf_dir)
