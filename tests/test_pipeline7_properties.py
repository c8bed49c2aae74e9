"""Property test for the exact-KS algebra in ``source_ks_shift``: the
cross-multiplied ECDF grid must equal a direct per-source Kolmogorov–Smirnov
computation on arbitrary tiny inputs — including sources that are missing
values present elsewhere (the grid-fill path the fixture barely exercises).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline7 import source_ks_shift

import pytest

# Slow tier (hypothesis bruteforce property suite): deselected by the
# default `-m 'not slow'` addopts; run via `pytest -m 'slow or not slow'`.
pytestmark = pytest.mark.slow

rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 20)),
    min_size=1,
    max_size=40,
)


def _reference_ks(data: list[tuple[str, int]]) -> dict[str, tuple[int, int, int]]:
    """Brute-force per-source KS vs the whole corpus, all-integer."""
    n_total = len(data)
    values = sorted({v for _, v in data})
    out = {}
    for s in sorted({s for s, _ in data}):
        n_s = sum(1 for src, _ in data if src == s)
        best = 0
        for v in values:
            c_s = sum(1 for src, val in data if src == s and val <= v)
            c_all = sum(1 for _, val in data if val <= v)
            best = max(best, abs(c_s * n_total - c_all * n_s))
        out[s] = (n_s, best, (1_000_000 * best) // (n_s * n_total))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_ks_shift_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("ks")
    spark.createDataFrame(
        [(s, v) for s, v in data], "source STRING, n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r["source"]: (r["n_docs"], r["ks_num"], r["ks_ppm"])
        for r in source_ks_shift(spark, str(d)).collect()
    }
    assert got == _reference_ks(data)


cap_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.one_of(
            st.integers(0, 20),  # normal lengths
            st.integers(16380, 16500),  # straddle the clamp boundary
            st.integers(10**6, 10**6 + 3),  # far past it
        ),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=cap_rows)
def test_ks_shift_grid_is_cap_censored(spark, tmp_path_factory, data):
    """The grid-cardinality bound (r7 VERDICT task #4) is a CLAMP, not a
    filter: lengths at or past ``_KS_CAP`` collapse to one ECDF point, and
    the statistic equals brute-force KS over the cap-censored values —
    documents are never dropped, and sub-cap resolution is untouched.
    This drives inputs the parquet fixtures never produce (multi-megabyte
    lengths), proving the bound structurally rather than by data luck."""
    from hadrodb_spark.operators.pipeline7 import _KS_CAP

    d = tmp_path_factory.mktemp("kscap")
    spark.createDataFrame(
        [(s, v) for s, v in data], "source STRING, n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r["source"]: (r["n_docs"], r["ks_num"], r["ks_ppm"])
        for r in source_ks_shift(spark, str(d)).collect()
    }
    censored = [(s, min(v, _KS_CAP)) for s, v in data]
    assert got == _reference_ks(censored)
    # n_docs must count every document — the clamp censors, never drops
    assert sum(n for n, _, _ in got.values()) == len(data)


def test_fragment_stitch_planted_recall_is_total(spark, sf_dir):
    """Every eligible planted split pair must be recalled: the 48-token
    eligibility bound guarantees both fragments pass the 32-token
    fingerprint gate, so planted-pair count == eligible-doc count (the
    contract the code review tightened)."""
    from pyspark.sql import functions as F

    from hadrodb_spark.functions import text as X
    from hadrodb_spark.operators.pipeline7 import fragment_stitch
    from hadrodb_spark.operators.relational import load

    eligible = (
        load(spark, sf_dir, "documents")
        .select(F.size(X.tokens(F.col("text"))).alias("n"), "doc_id")
        .filter((F.col("n") >= 48) & (F.col("doc_id") % 61 == 0))
        .count()
    )
    planted = fragment_stitch(spark, sf_dir).filter("planted").count()
    assert planted == eligible and eligible > 0


skyline_rows = st.lists(
    st.tuples(
        st.sampled_from(["b1", "b2"]),
        st.integers(0, 8),   # cents — small domain forces ties
        st.integers(0, 8),   # size
    ),
    min_size=1,
    max_size=30,
)


def _reference_skyline(data):
    """Dominance by the NOT EXISTS specification, brute force."""
    out = []
    for i, (br, c, sz) in enumerate(data):
        dominated = any(
            b2 == br and c2 <= c and s2 >= sz and (c2 < c or s2 > sz)
            for j, (b2, c2, s2) in enumerate(data)
            if j != i
        )
        if not dominated:
            out.append((br, i, c, sz))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=skyline_rows)
def test_skyline_window_matches_bruteforce(spark, tmp_path_factory, data):
    """The one-pass windowed dominance formulation must equal the NOT
    EXISTS specification on arbitrary tiny inputs — including duplicate
    (cents, size) points and equal-price chains, the tie cases the
    fixtures barely exercise."""
    from hadrodb_spark.operators.pipeline7 import skyline_parts

    d = tmp_path_factory.mktemp("sky")
    spark.createDataFrame(
        [(br, i, float(c) / 100.0, sz) for i, (br, c, sz) in enumerate(data)],
        "p_brand STRING, p_partkey LONG, p_retailprice DOUBLE, p_size INT",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "part.parquet"))
    got = sorted(tuple(r) for r in skyline_parts(spark, str(d)).collect())
    assert got == _reference_skyline(data)
