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
    pipeline2,
    pipeline3,
    relational,
    relational2,
    relational3,
    sessionize,
    similarity,
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
# (see CORRECTNESS_r01.json, 50/50 green), so round 2 front-loads the 41
# entries that had no driver row yet — the KV tier, the LLM-pipeline tier
# (dedup / similarity / text / multimodal), and the stragglers — followed
# by any queries new this round, with the already-verified tier last.
_register(kv)
_register(textops)
_register(dedup)
_register(components)
_register(similarity)
_register(multimodal_ops)
_register(sessionize)
_register(skew)
_register(asof)
# pinned list: relational3 later gained entries (window_analytic_ranks,
# fuzzy_pairs_levenshtein) that must NOT shift the already-frozen round-2
# window — they register at the end with the other round-3-queue additions
_register(
    relational3,
    only=[
        "events_hourly_windows",
        "setop_union_all",
        "dedup_drop_duplicates",
        "scalar_array2",
        "null_semantics",
        "join_cross",
    ],
)
_register(
    relational2,
    only=["profile_columns", "udf_scalar", "udf_pandas", "agg_approx_distinct"],
)
# --- new round-2 queries (inside the verification window) ---
_register(pipeline2)
# --- queued for the round-3 window rotation (positions 51+): added after
# the round-2 gate's window was already full of unverified entries, so they
# wait one round for a driver row; the local exact-compare parity suite
# covers them meanwhile ---
_register(pipeline3)
_register(sqlsuite)
_register(relational3)  # its post-freeze additions
# --- round-1-verified tier ---
_register(relational)
_register(relational2)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return relational.sql_tpch_q1_like(spark, sf_dir)
