"""Property tests for the round-7-queue batch-6 additions: revenue
Pareto curve, one-way ANOVA on exact moments, and ship-lag percentiles —
each checked against a brute-force Python reference (the pipeline7-11
discipline)."""

from __future__ import annotations

import datetime
import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline12 import (
    anova_value_by_type,
    revenue_pareto_curve,
    ship_lag_percentiles,
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


def _qdisc(vals: list[int], p: float) -> int:
    vals = sorted(vals)
    return vals[max(0, math.ceil(p * len(vals)) - 1)]


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 8), st.integers(1, 10_000_000)),
        min_size=1,
        max_size=40,
    )
)
def test_revenue_pareto_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("pareto")
    spark.createDataFrame(
        [(i, cust, c / 100.0) for i, (cust, c) in enumerate(data)],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))

    rev: dict[int, int] = {}
    for cust, c in data:
        rev[cust] = rev.get(cust, 0) + round((c / 100.0) * 100)
    buckets: dict[int, tuple[int, int]] = {}
    for r in rev.values():
        dg = len(str(r))
        n, s = buckets.get(dg, (0, 0))
        buckets[dg] = (n + 1, s + r)
    total_n, total_s = len(rev), sum(rev.values())
    want = {}
    cum_n = cum_s = 0
    for dg in sorted(buckets, reverse=True):
        n, s = buckets[dg]
        cum_n += n
        cum_s += s
        want[dg] = (
            n,
            s,
            (1_000_000 * cum_n) // total_n,
            (1_000_000 * cum_s) // total_s,
        )
    got = {
        r["digits"]: (
            r["n_customers"],
            r["bucket_cents"],
            r["cum_customers_ppm"],
            r["cum_revenue_ppm"],
        )
        for r in revenue_pareto_curve(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]), st.integers(-50_000, 50_000)
        ),
        min_size=4,
        max_size=40,
    ).filter(lambda xs: len({t for t, _ in xs}) >= 2)
)
def test_anova_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("anova")
    epoch = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(i, t, epoch, c / 100.0) for i, (t, c) in enumerate(data)],
        "event_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    groups: dict[str, list[int]] = {}
    for t, c in data:
        groups.setdefault(t, []).append(round((c / 100.0) * 100))
    k = len(groups)
    n = len(data)
    ssw = Decimal(0)
    s_tot = q_tot = 0
    for vals in groups.values():
        ni, si, qi = len(vals), sum(vals), sum(v * v for v in vals)
        s_tot += si
        q_tot += qi
        ssw += _round6(float(ni * qi - si * si) / float(ni))
    row = anova_value_by_type(spark, str(d)).collect()[0]
    assert (row["k"], row["n"], row["df_between"], row["df_within"]) == (
        k,
        n,
        k - 1,
        n - k,
    )
    if n == k or ssw == 0:
        # degenerate: no finite F — both engines emit NULL by contract
        assert row["f_stat"] is None
    else:
        sst = float(q_tot) - float(s_tot) * float(s_tot) / float(n)
        f = ((sst - float(ssw)) / (k - 1)) / (float(ssw) / (n - k))
        assert _round6(row["f_stat"]) == _round6(f)


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "2-HIGH"]),
            st.integers(0, 50),   # order day offset
            st.integers(0, 120),  # ship lag days
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ship_lag_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("lag")
    epoch = datetime.datetime(1995, 1, 1)
    orows, lrows = [], []
    for i, (prio, od, lg) in enumerate(data):
        orows.append((i, prio, epoch + datetime.timedelta(days=od)))
        lrows.append((i, epoch + datetime.timedelta(days=od + lg)))
    spark.createDataFrame(
        orows, "o_orderkey LONG, o_orderpriority STRING, o_orderdate TIMESTAMP"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        lrows, "l_orderkey LONG, l_shipdate TIMESTAMP"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))

    lags: dict[str, list[int]] = {}
    for prio, _, lg in data:
        lags.setdefault(prio, []).append(lg)
    want = {
        p: (
            len(v),
            min(v),
            _qdisc(v, 0.5),
            _qdisc(v, 0.9),
            _qdisc(v, 0.99),
            sum(v) // len(v),
        )
        for p, v in lags.items()
    }
    got = {
        r["o_orderpriority"]: (
            r["n_lineitems"],
            r["min_lag_days"],
            r["p50_days"],
            r["p90_days"],
            r["p99_days"],
            r["mean_lag_days"],
        )
        for r in ship_lag_percentiles(spark, str(d)).collect()
    }
    assert got == want
