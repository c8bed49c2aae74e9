"""Property tests for the round-6 additions: the PSI algebra, the
discrete-percentile embargo split, and BFS-level semantics of the
recursive co-purchase query — each checked against a brute-force Python
reference on arbitrary tiny inputs (the pipeline7 discipline)."""

from __future__ import annotations

import datetime
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline8 import (
    _EMBARGO_S,
    _PSI_BINS,
    _PSI_HI,
    _PSI_LO,
    drift_psi_monthly,
    temporal_split_embargo,
)

import pytest

# Slow tier (hypothesis bruteforce property suite): deselected by the
# default `-m 'not slow'` addopts; run via `pytest -m 'slow or not slow'`.
pytestmark = pytest.mark.slow


def _round6(x: float) -> Decimal:
    """HALF_UP at 6 decimals over the double's shortest repr — the
    BigDecimal.valueOf semantics Spark's ROUND applies (Python's round()
    is banker's; never use it to mirror engine output)."""
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _psi_reference(rows: list[tuple[str, float]]) -> dict[str, tuple[int, Decimal]]:
    months = sorted({m for m, _ in rows})
    ref = months[0]

    def bin_of(v: float) -> int:
        if v < _PSI_LO:
            return 0
        if v >= _PSI_HI:
            return _PSI_BINS + 1
        return int(math.floor((v - _PSI_LO) / (_PSI_HI - _PSI_LO) * _PSI_BINS)) + 1

    counts: dict[tuple[str, int], int] = {}
    for m, v in rows:
        counts[(m, bin_of(v))] = counts.get((m, bin_of(v)), 0) + 1
    bins = list(range(_PSI_BINS + 2))  # the CONSTANT data-independent grid
    nb = float(len(bins))
    nq = float(sum(c for (m, _), c in counts.items() if m == ref))
    out = {}
    for m in months:
        nm = float(sum(c for (mm, _), c in counts.items() if mm == m))
        total = Decimal(0)
        for b in bins:
            cm = float(counts.get((m, b), 0))
            cq = float(counts.get((ref, b), 0))
            p = (cm + 1.0) / (nm + nb)
            q = (cq + 1.0) / (nq + nb)
            total += _round6((p - q) * math.log(p / q))
        out[m] = (int(nm), _round6(float(total)))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["1994-01", "1994-02", "1994-03"]),
            st.floats(min_value=-1000.0, max_value=700000.0, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_psi_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("psi")
    spark.createDataFrame(
        [
            (i, datetime.datetime.fromisoformat(f"{m}-15T00:00:00"), v)
            for i, (m, v) in enumerate(data)
        ],
        "o_orderkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    got = {
        r["month"]: (r["n_orders"], _round6(r["psi"]))
        for r in drift_psi_monthly(spark, str(d)).collect()
    }
    assert got == _psi_reference(data)


def _split_reference(rows: list[tuple[int, int]]) -> tuple[int, ...]:
    secs = sorted(s for _, s in rows)
    cut = secs[math.ceil(0.8 * len(secs)) - 1]
    n_tr = sum(1 for _, s in rows if s <= cut)
    n_em = sum(1 for _, s in rows if cut < s <= cut + _EMBARGO_S)
    n_te = sum(1 for _, s in rows if s > cut + _EMBARGO_S)
    tr_users = {u for u, s in rows if s <= cut}
    te_users = {u for u, s in rows if s > cut + _EMBARGO_S}
    both = tr_users & te_users
    ppm = (1_000_000 * len(both)) // len(te_users) if te_users else None
    return (
        n_tr,
        n_em,
        n_te,
        len(tr_users),
        len(te_users),
        len(both),
        ppm,
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10 * 86400)),
        min_size=1,
        max_size=40,
    )
)
def test_embargo_split_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("split")
    epoch = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (i, u, epoch + datetime.timedelta(seconds=s))
            for i, (u, s) in enumerate(data)
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    row = temporal_split_embargo(spark, str(d)).collect()[0]
    assert (
        row["n_train"],
        row["n_embargoed"],
        row["n_test"],
        row["users_train"],
        row["users_test"],
        row["users_overlap"],
        row["overlap_ppm"],
    ) == _split_reference(data)


def test_recursive_copurchase_matches_python_bfs(spark, sf_dir):
    """The recursive CTE's per-level counts must equal a literal Python
    BFS over the order↔part bipartite graph (seed part 1, depth ≤ 2)."""
    import duckdb

    from hadrodb_spark.operators.sqlsuite import sql_recursive_copurchase

    edges = duckdb.connect().execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    by_part: dict[int, set[int]] = {}
    by_order: dict[int, set[int]] = {}
    for o, p in edges:
        by_part.setdefault(p, set()).add(o)
        by_order.setdefault(o, set()).add(p)
    level = {1: 0}
    frontier = {1}
    for hop in (1, 2):
        nxt = set()
        for p in frontier:
            for o in by_part.get(p, ()):
                nxt |= by_order[o]
        frontier = nxt
        for p in frontier:
            level.setdefault(p, hop)
    want = {}
    for p, h in level.items():
        n, lo, hi = want.get(h, (0, None, None))
        want[h] = (
            n + 1,
            p if lo is None else min(lo, p),
            p if hi is None else max(hi, p),
        )
    got = {
        r["hop"]: (r["n_parts"], r["min_part"], r["max_part"])
        for r in sql_recursive_copurchase(spark, sf_dir).collect()
    }
    assert got == want


def test_pca_finds_contrast_component(spark, tmp_path_factory):
    """Regression for the all-ones-seed blind spot: a cloud whose top
    principal component is the contrast (1, -1)/sqrt(2) — exactly
    orthogonal to the constant direction.  In exact fixed-point
    arithmetic an all-ones seed stays orthogonal through every iteration
    and certifies the SECOND component; the md5-sign seed must find the
    contrast.  Verified against numpy's top eigenvector."""
    import numpy as np

    from hadrodb_spark.operators.pipeline8 import embedding_pca_top

    rng = np.random.default_rng(7)
    t = rng.normal(0.0, 0.4, size=200)  # strong contrast signal
    noise = rng.normal(0.0, 0.02, size=(200, 4))
    vecs = np.zeros((200, 4), dtype=np.float32)
    vecs[:, 0] = t + noise[:, 0]
    vecs[:, 1] = -t + noise[:, 1]
    vecs[:, 2] = noise[:, 2]
    vecs[:, 3] = noise[:, 3]

    d = tmp_path_factory.mktemp("pca")
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(200)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    rows = embedding_pca_top(spark, str(d)).collect()
    # the two contrast dims must rank first with OPPOSITE-sign loadings
    top2 = {r["dim"] for r in rows[:2]}
    assert top2 == {1, 2}, rows
    s1 = next(r["loading_fp"] for r in rows if r["dim"] == 1)
    s2 = next(r["loading_fp"] for r in rows if r["dim"] == 2)
    assert s1 * s2 < 0, rows

    # eigenvalue within 5% of numpy's top eigenvalue of the biased-cov
    # matrix (the operator uses the 1/n population covariance)
    x64 = vecs.astype(np.float64)
    cov = np.cov(x64, rowvar=False, bias=True)
    want = float(np.linalg.eigvalsh(cov)[-1])
    got = rows[0]["eigenvalue"]
    assert abs(got - want) / want < 0.05, (got, want)
