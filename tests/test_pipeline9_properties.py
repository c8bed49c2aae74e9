"""Property tests for the round-7-queue batch-2 additions: the Gini/HHI
concentration algebra, winsorized group statistics, the day-of-week index,
gate mutual information, and epoch upsampling — each checked against a
brute-force Python reference on arbitrary tiny inputs (the pipeline7/8
discipline)."""

from __future__ import annotations

import datetime
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline9 import (
    _EPOCH_CAP,
    _MI_CHARS,
    _MI_TOKENS,
    seasonal_dow_index,
    source_concentration,
    gate_mutual_information,
    upsample_epochs,
    winsorized_stats,
)

import pytest

# Slow tier (hypothesis bruteforce property suite): deselected by the
# default `-m 'not slow'` addopts; run via `pytest -m 'slow or not slow'`.
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _round6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def _quantile_disc(sorted_vals: list[int], p: float) -> int:
    """Smallest value whose cumulative fraction ≥ p (both engines'
    discrete-percentile convention, verified in length_gate_disc)."""
    n = len(sorted_vals)
    return sorted_vals[max(0, math.ceil(p * n) - 1)]


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 30), min_size=1, max_size=6),
)
def test_source_concentration_matches_bruteforce(spark, tmp_path_factory, counts):
    d = tmp_path_factory.mktemp("conc")
    rows, did = [], 0
    for s, c in enumerate(counts):
        for _ in range(c):
            rows.append((did, f"src{s}"))
            did += 1
    spark.createDataFrame(rows, "doc_id LONG, source STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    n = len(counts)
    total = sum(counts)
    srt = sorted(counts)
    s_ic = sum((i + 1) * c for i, c in enumerate(srt))
    shares = [(1_000_000 * c) // total for c in counts]
    want = (
        n,
        total,
        max(shares),
        (1_000_000 * (2 * s_ic - (n + 1) * total)) // (n * total),
        sum(s * s for s in shares) // 1_000_000,
    )
    row = source_concentration(spark, str(d)).collect()[0]
    assert (
        row["n_sources"],
        row["n_docs"],
        row["top_share_ppm"],
        row["gini_ppm"],
        row["hhi_ppm"],
    ) == want


@settings(**_SETTINGS)
@given(
    cents=st.lists(st.integers(0, 100_000), min_size=1, max_size=40),
)
def test_winsorized_stats_matches_bruteforce(spark, tmp_path_factory, cents):
    d = tmp_path_factory.mktemp("wins")
    spark.createDataFrame(
        [(i, "1-URGENT", c / 100.0) for i, c in enumerate(cents)],
        "o_orderkey LONG, o_orderpriority STRING, o_totalprice DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))

    exact = sorted(round(c / 100.0 * 100) for c in cents)
    lo, hi = _quantile_disc(exact, 0.05), _quantile_disc(exact, 0.95)
    clamped = [min(hi, max(lo, c)) for c in exact]
    want = (
        len(exact),
        lo,
        hi,
        sum(1 for c in exact if c < lo or c > hi),
        sum(clamped) // len(exact),
    )
    row = winsorized_stats(spark, str(d)).collect()[0]
    assert (
        row["n_orders"],
        row["lo_cents"],
        row["hi_cents"],
        row["n_clamped"],
        row["winsorized_mean_cents"],
    ) == want


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["click", "view"]), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_seasonal_dow_index_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("dow")
    epoch = datetime.datetime(2024, 1, 1)  # a Monday
    spark.createDataFrame(
        [
            (i, t, epoch + datetime.timedelta(days=dd, hours=5))
            for i, (t, dd) in enumerate(data)
        ],
        "event_id LONG, event_type STRING, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    counts: dict[tuple[str, int], int] = {}
    totals: dict[str, int] = {}
    for t, dd in data:
        dow = dd % 7  # 2024-01-01 is a Monday; our encoding has 0=Monday
        counts[(t, dow)] = counts.get((t, dow), 0) + 1
        totals[t] = totals.get(t, 0) + 1
    want = {
        (t, dow): (n, (7_000_000 * n) // totals[t])
        for (t, dow), n in counts.items()
    }
    got = {
        (r["event_type"], r["dow"]): (r["n_events"], r["index_ppm"])
        for r in seasonal_dow_index(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 1200), st.integers(0, 150)),
        min_size=1,
        max_size=40,
    )
)
def test_gate_mi_matches_bruteforce(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp("mi")
    spark.createDataFrame(
        [(i, nc, "tok " * nt) for i, (nc, nt) in enumerate(docs)],
        "doc_id LONG, n_chars LONG, text STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    cells: dict[tuple[int, int], int] = {}
    for nc, nt in docs:
        key = (int(nc >= _MI_CHARS), int(nt >= _MI_TOKENS))
        cells[key] = cells.get(key, 0) + 1
    total = sum(cells.values())
    na = {a: sum(n for (aa, _), n in cells.items() if aa == a) for a in (0, 1)}
    nb = {b: sum(n for (_, bb), n in cells.items() if bb == b) for b in (0, 1)}
    mi = Decimal(0)
    for (a, b), n in cells.items():
        mi += _round6((n / total) * math.log(n * total / (na[a] * nb[b])))
    row = gate_mutual_information(spark, str(d)).collect()[0]
    assert row["n_docs"] == total
    assert (row["n_11"], row["n_10"], row["n_01"], row["n_00"]) == (
        cells.get((1, 1), 0),
        cells.get((1, 0), 0),
        cells.get((0, 1), 0),
        cells.get((0, 0), 0),
    )
    assert _round6(row["mi_nats"]) == _round6(float(mi))


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 25), min_size=1, max_size=5),
)
def test_upsample_epochs_matches_bruteforce(spark, tmp_path_factory, counts):
    d = tmp_path_factory.mktemp("ups")
    rows, did = [], 0
    srcs: dict[str, list[int]] = {}
    for s, c in enumerate(counts):
        name = f"src{s}"
        for _ in range(c):
            rows.append((did, name))
            srcs.setdefault(name, []).append(did)
            did += 1
    spark.createDataFrame(rows, "doc_id LONG, source STRING").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    total, n_src = sum(counts), len(counts)
    want = {}
    for name, ids in srcs.items():
        k = min(_EPOCH_CAP, max(1, total // (n_src * len(ids))))
        fp = sum(i * e for i in ids for e in range(1, k + 1))
        want[name] = (k, len(ids), len(ids) * k, fp)
    got = {
        r["source"]: (r["k_epochs"], r["n_before"], r["n_after"], r["fingerprint"])
        for r in upsample_epochs(spark, str(d)).collect()
    }
    assert got == want
