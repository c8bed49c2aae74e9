"""Physical-plan inspection helpers — the feedback loop for the scale
contract: every operator's plan should show filters/projection reaching the
Parquet scan, broadcast joins where a side is small, and wide
whole-stage-codegen spans. Used by tests to FAIL when a plan regresses into
a shape that wouldn't survive 100 TB."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from Parquet (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols += [c.split(":")[0].strip() for c in inner.split(",") if ":" in c]
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange NODES (formatted output mentions each twice:
    once in the tree, once as a '(n) Exchange' detail header)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.M))


def explicit_broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan —
    distinguishes hand-placed ``F.broadcast`` (a hard commitment that
    breaks when the side outgrows memory) from AQE's runtime size-based
    broadcast decision (which degrades gracefully to shuffle)."""
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint .*broadcast", plan, re.I))


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans in the FINAL (post-AQE) plan — requires
    executing the query, since AQE only finalizes codegen at runtime."""
    import re

    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # finalized AQE plans mark codegen'd operators with '*(id)'
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
