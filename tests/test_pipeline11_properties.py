"""Tests for the round-7-queue batch-5 additions: planted-orphan FK
integrity and a brute-force cohort-LTV property check."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline11 import (
    cohort_ltv_curve,
    fk_integrity_audit,
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


def test_fk_integrity_counts_planted_orphans(spark, tmp_path_factory):
    """Plant a known number of orphans on every edge (plus NULL child
    keys, which are NOT violations) and require exact counts."""
    d = tmp_path_factory.mktemp("fk")
    ts = datetime.datetime(1995, 1, 1)

    def write(name, rows, ddl):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"{name}.parquet"))

    write("customer", [(1, 10), (2, 10), (3, 99)],
          "c_custkey LONG, c_nationkey LONG")
    write("nation", [(10,)], "n_nationkey LONG")  # nationkey 99 → 1 orphan
    # orders: custkeys 1,2 valid; 7 missing → 2 orphans; NULL not counted
    write(
        "orders",
        [(100, 1, ts, 10.0), (101, 2, ts, 20.0), (102, 7, ts, 30.0),
         (103, 7, ts, 40.0), (104, None, ts, 50.0)],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    )
    write("part", [(1000,)], "p_partkey LONG")
    write("supplier", [(2000,)], "s_suppkey LONG")
    # lineitem: orderkey 100 valid / 999 orphan; partkey 1000 valid / 1001
    # orphan ×2; suppkey 2000 valid everywhere
    write(
        "lineitem",
        [(100, 1000, 2000), (999, 1001, 2000), (100, 1001, 2000)],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG",
    )

    got = {
        r["relationship"]: (r["n_child_rows"], r["n_orphans"], r["orphan_ppm"])
        for r in fk_integrity_audit(spark, str(d)).collect()
    }
    assert got == {
        "orders.custkey->customer": (4, 2, 500_000),
        "lineitem.orderkey->orders": (3, 1, 333_333),
        "lineitem.partkey->part": (3, 2, 666_666),
        "lineitem.suppkey->supplier": (3, 0, 0),
        "customer.nationkey->nation": (3, 1, 333_333),
    }


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 5),          # customer
            st.integers(0, 11),         # month offset from 1994-01
            st.integers(1, 100_000),    # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cohort_ltv_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("ltv")
    rows = []
    for i, (cust, mo, cents) in enumerate(data):
        dt = datetime.datetime(1994 + mo // 12, mo % 12 + 1, 15)
        rows.append((i, cust, dt, cents / 100.0))
    spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP, o_totalprice DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))

    ym = {}
    cents_of = {}
    for i, (cust, mo, cents) in enumerate(data):
        y, m = 1994 + mo // 12, mo % 12 + 1
        ym[i] = y * 12 + m
        cents_of[i] = round((cents / 100.0) * 100)
    first = {}
    for i, (cust, _, _) in enumerate(data):
        first[cust] = min(first.get(cust, 1 << 60), ym[i])
    sizes = {}
    for c, f in first.items():
        sizes[f] = sizes.get(f, 0) + 1
    curve = {}
    for i, (cust, _, _) in enumerate(data):
        key = (first[cust], ym[i] - first[cust])
        curve[key] = curve.get(key, 0) + cents_of[i]
    want = {}
    for cohort in {k[0] for k in curve}:
        cum = 0
        for age in sorted(a for c, a in curve if c == cohort):
            cum += curve[(cohort, age)]
            label = f"{(cohort - 1) // 12:04d}-{(cohort - 1) % 12 + 1:02d}"
            want[(label, age)] = (
                sizes[cohort],
                curve[(cohort, age)],
                cum,
                cum // sizes[cohort],
            )
    got = {
        (r["cohort_month"], r["age_months"]): (
            r["n_customers"],
            r["rev_cents"],
            r["cum_rev_cents"],
            r["ltv_per_customer_cents"],
        )
        for r in cohort_ltv_curve(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.lists(st.sampled_from([f"w{i}" for i in range(20)]),
                     min_size=1, max_size=8),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_source_vocab_overlap_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline11 import source_vocab_overlap

    d = tmp_path_factory.mktemp("vocab")
    spark.createDataFrame(
        [(i, s, " ".join(toks)) for i, (s, toks) in enumerate(docs)],
        "doc_id LONG, source STRING, text STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    vocab: dict[str, set[str]] = {}
    for s, toks in docs:
        vocab.setdefault(s, set()).update(toks)
    want = {}
    srcs = sorted(vocab)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            shared = len(vocab[sa] & vocab[sb])
            union = len(vocab[sa]) + len(vocab[sb]) - shared
            want[(sa, sb)] = (
                len(vocab[sa]),
                len(vocab[sb]),
                shared,
                (1_000_000 * shared) // union,
            )
    got = {
        (r["src_a"], r["src_b"]): (
            r["vocab_a"],
            r["vocab_b"],
            r["n_shared"],
            r["jaccard_ppm"],
        )
        for r in source_vocab_overlap(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["a", "b", "c", "d"])),
        min_size=1,
        max_size=40,
    )
)
def test_user_entropy_matches_bruteforce(spark, tmp_path_factory, data):
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from hadrodb_spark.operators.pipeline11 import (
        _ENT_BUCKET_E6,
        user_entropy_histogram,
    )

    def round6(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    d = tmp_path_factory.mktemp("ent")
    epoch = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(i, u, t, epoch) for i, (u, t) in enumerate(data)],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    counts: dict[tuple[int, str], int] = {}
    totals: dict[int, int] = {}
    for u, t in data:
        counts[(u, t)] = counts.get((u, t), 0) + 1
        totals[u] = totals.get(u, 0) + 1
    ent: dict[int, int] = {}
    for u, n in totals.items():
        s = Decimal(0)
        for (uu, _), c in counts.items():
            if uu == u:
                s += round6((c / n) * math.log(n / c))
        ent[u] = int(s * 1_000_000)
    want: dict[int, tuple[int, int, int, int]] = {}
    for u, e in ent.items():
        b = e // _ENT_BUCKET_E6
        nu, ne, lo, hi = want.get(b, (0, 0, None, None))
        want[b] = (
            nu + 1,
            ne + totals[u],
            e if lo is None else min(lo, e),
            e if hi is None else max(hi, e),
        )
    got = {
        r["bucket"]: (
            r["n_users"],
            r["n_events"],
            r["min_entropy_e6"],
            r["max_entropy_e6"],
        )
        for r in user_entropy_histogram(spark, str(d)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 40)),  # (user, day)
        min_size=1,
        max_size=50,
    )
)
def test_dau_wau_mau_matches_bruteforce(spark, tmp_path_factory, data):
    from hadrodb_spark.operators.pipeline11 import (
        _MAU_DAYS,
        _WAU_DAYS,
        dau_wau_mau,
    )

    d = tmp_path_factory.mktemp("dwm")
    epoch = datetime.datetime(2024, 1, 1)
    base_day = (epoch - datetime.datetime(1970, 1, 1)).days
    spark.createDataFrame(
        [
            (i, u, epoch + datetime.timedelta(days=dd, hours=3))
            for i, (u, dd) in enumerate(data)
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    by_day: dict[int, set[int]] = {}
    for u, dd in data:
        by_day.setdefault(base_day + dd, set()).add(u)
    want = {}
    for day in by_day:
        dau = len(by_day[day])
        wau = len(set().union(*[by_day.get(day - o, set())
                                for o in range(_WAU_DAYS)]))
        mau = len(set().union(*[by_day.get(day - o, set())
                                for o in range(_MAU_DAYS)]))
        want[day] = (dau, wau, mau, (1_000_000 * dau) // mau)
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"], r["stickiness_ppm"])
        for r in dau_wau_mau(spark, str(d)).collect()
    }
    assert got == want
