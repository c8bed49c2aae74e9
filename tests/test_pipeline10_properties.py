"""Property tests for the round-7-queue batch-3 additions: ranker top-K
agreement, md5 shard balance, and the classical seasonal decomposition —
each checked against a brute-force Python reference on arbitrary tiny
inputs (the pipeline7/8/9 discipline)."""

from __future__ import annotations

import datetime
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline10 import (
    _N_SHARDS,
    _RANK_KS,
    _RANK_TOP,
    ranker_overlap_topk,
    seasonal_decompose_daily,
    shard_balance,
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

_TERMS = [f"t{i}" for i in range(30)]


def _sdiv(num: int, den: int) -> int:
    return -((-num) // den) if num < 0 else num // den


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_TERMS), min_size=1, max_size=12),
        min_size=1,
        max_size=25,
    )
)
def test_ranker_overlap_matches_bruteforce(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp("rank")
    spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id LONG, text STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    tf: dict[str, int] = {}
    df: dict[str, int] = {}
    for toks in docs:
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    scored = [
        (t, tf[t], (1_000_000 * tf[t]) // df[t]) for t in tf
    ]
    top_freq = sorted(scored, key=lambda x: (-x[1], x[0]))[:_RANK_TOP]
    top_rare = sorted(scored, key=lambda x: (-x[2], x[0]))[:_RANK_TOP]
    want = {}
    for k in _RANK_KS:
        fset = {t for t, _, _ in top_freq[:k]}
        gset = {t for t, _, _ in top_rare[:k]}
        ov = len(fset & gset)
        union = len(fset) + len(gset) - ov
        want[k] = (ov, (1_000_000 * ov) // union)
    got = {
        r["k"]: (r["n_overlap"], r["jaccard_ppm"])
        for r in ranker_overlap_topk(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(n_docs=st.integers(1, 120), offset=st.integers(0, 1 << 40))
def test_shard_balance_matches_bruteforce(spark, tmp_path_factory, n_docs, offset):
    d = tmp_path_factory.mktemp("shard")
    ids = [offset + i * 3 for i in range(n_docs)]
    spark.createDataFrame(
        [(i,) for i in ids], "doc_id LONG"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    counts: dict[int, int] = {}
    for i in ids:
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % _N_SHARDS
        counts[sh] = counts.get(sh, 0) + 1
    want = (
        len(counts),
        n_docs,
        min(counts.values()) if len(counts) == _N_SHARDS else 0,
        max(counts.values()),
        n_docs // _N_SHARDS,
        (1_000_000 * _N_SHARDS * max(counts.values())) // n_docs,
    )
    row = shard_balance(spark, str(d)).collect()[0]
    assert (
        row["n_shards_used"],
        row["n_docs"],
        row["min_shard"],
        row["max_shard"],
        row["expected_shard"],
        row["max_load_ppm"],
    ) == want


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-50_000, 50_000)),
        min_size=1,
        max_size=60,
    )
)
def test_seasonal_decompose_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("stl")
    epoch = datetime.datetime(2024, 1, 1)  # Monday; day numbering shared
    spark.createDataFrame(
        [
            (i, epoch + datetime.timedelta(days=dd, hours=7), c / 100.0)
            for i, (dd, c) in enumerate(data)
        ],
        "event_id LONG, ts TIMESTAMP, value DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    base_day = (epoch - datetime.datetime(1970, 1, 1)).days
    daily: dict[int, int] = {}
    for dd, c in data:
        day = base_day + dd
        # mirror the engines: cents = round(value*100) over the double
        cents = round((c / 100.0) * 100)
        daily[day] = daily.get(day, 0) + cents
    trend: dict[int, int] = {}
    for day in daily:
        # RANGE window: all 7 CALENDAR days must be present
        win = [daily[j] for j in range(day - 3, day + 4) if j in daily]
        if len(win) == 7:
            trend[day] = _sdiv(sum(win), 7)
    seas_acc: dict[int, tuple[int, int]] = {}
    for day, tr in trend.items():
        dow = (day + 3) % 7
        s, n = seas_acc.get(dow, (0, 0))
        seas_acc[dow] = (s + (daily[day] - tr), n + 1)
    seasonal = {dow: _sdiv(s, n) for dow, (s, n) in seas_acc.items()}
    want = {
        day: (
            daily[day],
            tr,
            seasonal[(day + 3) % 7],
            (daily[day] - tr) - seasonal[(day + 3) % 7],
        )
        for day, tr in trend.items()
    }
    got = {
        r["day"]: (
            r["rev_cents"],
            r["trend_cents"],
            r["seasonal_cents"],
            r["residual_cents"],
        )
        for r in seasonal_decompose_daily(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 400)),
        min_size=1,
        max_size=60,
    )
)
def test_score_calibration_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline10 import (
        _CAL_BINS,
        score_calibration_bins,
    )

    d = tmp_path_factory.mktemp("cal")
    spark.createDataFrame(
        [(did, nc) for did, nc in docs], "doc_id LONG, n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    hist: dict[int, tuple[int, int]] = {}
    for did, nc in docs:
        n, n1 = hist.get(nc, (0, 0))
        hist[nc] = (n + 1, n1 + (1 if did % 50 == 0 else 0))
    total = len(docs)
    cum = 0
    bins: dict[int, list[tuple[int, int, int]]] = {}
    for score in sorted(hist):
        n, n1 = hist[score]
        b = (_CAL_BINS * cum) // total
        bins.setdefault(b, []).append((score, n, n1))
        cum += n
    want = {}
    for b, rows in bins.items():
        n_rows = sum(n for _, n, _ in rows)
        n_pos = sum(n1 for _, _, n1 in rows)
        want[b] = (
            n_rows,
            n_pos,
            min(s for s, _, _ in rows),
            max(s for s, _, _ in rows),
            (1_000_000 * n_pos) // n_rows,
            sum(s * n for s, n, _ in rows) // n_rows,
        )
    got = {
        r["bin"]: (
            r["n_rows"],
            r["n_pos"],
            r["min_score"],
            r["max_score"],
            r["pos_rate_ppm"],
            r["mean_score"],
        )
        for r in score_calibration_bins(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    cents=st.lists(st.integers(0, 100_000), min_size=1, max_size=40),
)
def test_poisson_bootstrap_matches_bruteforce(spark, tmp_path_factory, cents):
    from hadrodb_spark.operators.pipeline10 import (
        _BOOT_B,
        _BOOT_THRESH,
        poisson_bootstrap_ci,
    )
    from tests.test_pipeline9_properties import _quantile_disc

    d = tmp_path_factory.mktemp("boot")
    spark.createDataFrame(
        [(i, c / 100.0) for i, c in enumerate(cents)],
        "o_orderkey LONG, o_totalprice DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))

    def weight(key: int, b: int) -> int:
        # one md5 per hash GROUP (b // 8), sliced per replicate (b % 8)
        g, s = b // 8, b % 8
        h = hashlib.md5(f"{key}:{g}".encode()).hexdigest()
        u = int(h[4 * s : 4 * s + 4], 16)
        for w, th in enumerate(_BOOT_THRESH):
            if u < th:
                return w
        return 6

    exact = [round((c / 100.0) * 100) for c in cents]
    rep_means = []
    for b in range(_BOOT_B):
        sw = sum(weight(i, b) for i in range(len(exact)))
        if sw == 0:
            continue
        swc = sum(weight(i, b) * c for i, c in enumerate(exact))
        rep_means.append(swc // sw)
    rep_means.sort()
    row = poisson_bootstrap_ci(spark, str(d)).collect()[0]
    assert row["n_orders"] == len(exact)
    assert row["mean_cents"] == sum(exact) // len(exact)
    assert row["n_replicates"] == len(rep_means)
    if rep_means:
        assert row["ci_lo_cents"] == _quantile_disc(rep_means, 0.05)
        assert row["ci_hi_cents"] == _quantile_disc(rep_means, 0.95)
    else:
        assert row["ci_lo_cents"] is None and row["ci_hi_cents"] is None
