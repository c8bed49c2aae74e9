"""Semantic-guarantee tests for the session-2 operator tier (pipeline6) —
properties the oracle value-equality can't express on its own: the
Misra-Gries theorem holds for EVERY key (not just planted heavies), the
chunking primitive is a partition of the token prefix, the A-Res sample is
invariant to physical partitioning, and the sweep line never exceeds the
per-day user count."""

from __future__ import annotations

import math

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hadrodb_spark.operators import pipeline6 as P6
from hadrodb_spark.operators.relational import load

# Slow tier (hypothesis bruteforce property suite): deselected by the
# default `-m 'not slow'` addopts; run via `pytest -m 'slow or not slow'`.
pytestmark = pytest.mark.slow


def _mg_reference(stream: list, k: int) -> dict:
    """Driver-side Misra-Gries mirror of the mapInPandas closure."""
    c: dict = {}
    for t in stream:
        if t in c:
            c[t] += 1
        elif len(c) < k:
            c[t] = 1
        else:
            dead = []
            for key in c:
                c[key] -= 1
                if not c[key]:
                    dead.append(key)
            for key in dead:
                del c[key]
    return c


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=400),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_theorem_any_stream(stream, k):
    """For ANY stream and ANY K: est ≤ true and true − est ≤ n/(K+1) for
    every key (including absent ones, est=0) — the invariant that makes
    the sketch outputs partitioning-safe."""
    summary = _mg_reference(stream, k)
    n = len(stream)
    true = {}
    for t in stream:
        true[t] = true.get(t, 0) + 1
    for t, cnt in true.items():
        est = summary.get(t, 0)
        assert est <= cnt
        assert (cnt - est) * (k + 1) <= n


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=300),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=150, deadline=None)
def test_misra_gries_merge_preserves_bound(stream, k, parts):
    """Partition the stream arbitrarily, summarize each part, merge by
    summation (what the operator's groupBy-sum does): the merged bound
    true − est ≤ n/(K+1) must still hold for every key — the mergeable-
    summaries property the distributed plan relies on."""
    n = len(stream)
    chunk = max(1, math.ceil(len(stream) / parts)) if stream else 1
    merged: dict = {}
    for i in range(0, max(len(stream), 1), chunk):
        for t, est in _mg_reference(stream[i : i + chunk], k).items():
            merged[t] = merged.get(t, 0) + est
    true = {}
    for t in stream:
        true[t] = true.get(t, 0) + 1
    for t, cnt in true.items():
        est = merged.get(t, 0)
        assert est <= cnt
        assert (cnt - est) * (k + 1) <= n


def test_chunks_partition_token_prefix(spark):
    """Concatenating a doc's chunks must reproduce exactly its first
    8·⌊n/8⌋ tokens — no token lost, duplicated, or reordered; docs under
    one chunk yield an empty array (the sequence(0,-1) guard)."""
    rows = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(17))),   # 2 chunks + tail
            (2, " ".join(f"t{i}" for i in range(8))),    # exactly 1 chunk
            (3, " ".join(f"t{i}" for i in range(7))),    # below one chunk
            (4, ""),                                     # empty
        ],
        "doc_id long, text string",
    )
    from hadrodb_spark.functions import text as X

    out = {
        r["doc_id"]: r["ch"]
        for r in rows.select(
            "doc_id", P6._chunks(X.tokens(F.col("text"))).alias("ch")
        ).collect()
    }
    assert out[1] == [
        " ".join(f"t{i}" for i in range(8)),
        " ".join(f"t{i}" for i in range(8, 16)),
    ]
    assert out[2] == [" ".join(f"t{i}" for i in range(8))]
    assert out[3] == []
    assert out[4] == []


def test_ares_sample_invariant_to_partitioning(spark, sf_dir):
    """The weighted sample must be a pure function of the data — the same
    50 doc_ids whatever the physical SCAN partitioning (TakeOrdered over
    deterministic md5 keys, no RNG state). The plan has zero shuffles, so
    the knob that actually changes its parallel structure is the input
    split size: run once at the session default and once with every row
    in its own tiny split."""
    base = {r["doc_id"] for r in P6.weighted_sample_ares(spark, sf_dir).collect()}
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
        again = {
            r["doc_id"] for r in P6.weighted_sample_ares(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert base == again and len(base) == 50


def test_peak_concurrency_bounded_by_daily_users(spark, sf_dir):
    """The sweep line's peak can never exceed the number of users active
    that day, and is at least 1 on any day with activity."""
    rows = P6.peak_concurrency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["peak_concurrency"] <= r["n_users"]
