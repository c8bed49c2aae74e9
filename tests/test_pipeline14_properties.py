"""Property tests for the pipeline14 statistical-audit tier: brute-force
mirrors of chi-square independence, Mann-Whitney midranks, CUSUM prefix
algebra, the Benford grid, and the Kaplan-Meier risk-set bookkeeping on
adversarial tiny inputs the parquet fixtures never produce (single-level
factors, empty comparison groups, all-tied values, same-day censoring,
terminal survival-to-zero steps).

Float discipline in the brute mirrors: Spark's ROUND is HALF-UP on the
double's decimal rendering, Python's round() is banker's — so every
rounding goes through Decimal(repr(x)).quantize(..., ROUND_HALF_UP), and
every float expression replays the SHARED op-order text exactly."""

from __future__ import annotations

import datetime
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline14 import (
    _BENFORD_PPM,
    benford_first_digit,
    chisq_independence,
    cusum_changepoint,
    mannwhitney_shift,
    survival_km_daily,
)

import pytest

# Slow tier (hypothesis bruteforce property suite): deselected by the
# default `-m 'not slow'` addopts; run via `pytest -m 'slow or not slow'`.
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _r6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


# --------------------------------------------------------------- chisq
def _brute_chisq(pairs):
    cells = Counter(pairs)
    r = Counter(s for s, _ in pairs)
    c = Counter(lg for _, lg in pairs)
    n = len(pairs)
    dof = (len(r) - 1) * (len(c) - 1)
    rows = []
    for s in r:
        for lg in c:
            obs = cells.get((s, lg), 0)
            num = n * obs - r[s] * c[lg]
            contrib = _r6(
                (float(num) * float(num))
                / ((float(n) * float(r[s])) * float(c[lg]))
            )
            rows.append(
                (s, lg, obs, (r[s] * c[lg] * 1000000) // n, contrib, dof)
            )
    chi2 = float(sum(row[4] for row in rows))
    rows.sort(key=lambda t: (-t[4], t[0], t[1]))
    return [
        (s, lg, obs, ppm, float(cb), chi2, d)
        for s, lg, obs, ppm, cb, d in rows[:15]
    ]


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB", "sC"]),
            st.sampled_from(["en", "de", "zh"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_chisq_matches_bruteforce(spark, tmp_path_factory, pairs):
    d = tmp_path_factory.mktemp("chi")
    spark.createDataFrame(
        [(i, s, lg, "t", 1) for i, (s, lg) in enumerate(pairs)],
        "doc_id LONG, source STRING, lang STRING, text STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in chisq_independence(spark, str(d)).collect()]
    assert got == _brute_chisq(pairs)


# --------------------------------------------------------- mannwhitney
def _brute_mw(rows):
    p = sorted(c for t, c in rows if t == "purchase")
    out = []
    for t in sorted({t for t, _ in rows if t != "purchase"}):
        o = sorted(c for tt, c in rows if tt == t)
        both = p + o
        two_r1 = sum(
            2 * sum(1 for x in both if x < v)
            + sum(1 for x in both if x == v)
            + 1
            for v in p
        )
        n1, n2 = len(p), len(o)
        u2 = two_r1 - n1 * (n1 + 1)
        rb = None if n1 == 0 or n2 == 0 else (u2 * 1000000) // (n1 * n2) - 1000000
        out.append((t, n1, n2, u2, rb))
    return out


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click", "view"]),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_mannwhitney_matches_bruteforce(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("mw")
    epoch = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(i, t, c / 100.0, epoch) for i, (t, c) in enumerate(rows)],
        "event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = [tuple(r) for r in mannwhitney_shift(spark, str(d)).collect()]
    assert got == _brute_mw(rows)


# --------------------------------------------------------------- cusum
def _brute_cusum(day_cents):
    daily: dict[int, int] = {}
    for day, cents in day_cents:
        daily[day] = daily.get(day, 0) + cents
    days = sorted(daily)
    total = sum(daily.values())
    n = len(days)
    rows = []
    prefix = 0
    for t, day in enumerate(days, start=1):
        prefix += daily[day]
        s = n * prefix - t * total
        s_cents = (-1 if s < 0 else 1) * (abs(s) // n)
        rows.append(
            (
                (datetime.date(2024, 1, 1) + datetime.timedelta(days=day))
                .isoformat(),
                t,
                daily[day],
                s_cents,
                s,
            )
        )
    rows.sort(key=lambda r: (-abs(r[4]), r[0]))
    return [r[:4] for r in rows[:5]]


@settings(**_SETTINGS)
@given(
    day_cents=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cusum_matches_bruteforce(spark, tmp_path_factory, day_cents):
    d = tmp_path_factory.mktemp("cusum")
    base = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (i, 1, "O", cents / 100.0, base + datetime.timedelta(days=day), "1-URGENT")
            for i, (day, cents) in enumerate(day_cents)
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    got = [tuple(r) for r in cusum_changepoint(spark, str(d)).collect()]
    assert got == _brute_cusum(day_cents)


# ------------------------------------------------------------- benford
def _brute_benford(cents_list):
    pos = [abs(c) for c in cents_list if c != 0]
    obs = Counter(int(str(c)[0]) for c in pos)
    n = len(pos)
    if n == 0:
        return [(d, 0, ppm, None, None) for d, ppm in _BENFORD_PPM]
    rows = []
    for digit, ppm in _BENFORD_PPM:
        o = obs.get(digit, 0)
        num = 1000000 * o - n * ppm
        contrib = _r6(
            (float(num) * float(num)) / ((1e6 * float(n)) * ppm)
        )
        rows.append((digit, o, ppm, contrib))
    chi2 = float(sum(r[3] for r in rows))
    return [(d, o, ppm, float(cb), chi2) for d, o, ppm, cb in rows]


@settings(**_SETTINGS)
@given(
    cents_list=st.lists(
        st.integers(min_value=-99_999, max_value=99_999),  # refunds + zeros
        min_size=1,
        max_size=40,
    )
)
def test_benford_matches_bruteforce(spark, tmp_path_factory, cents_list):
    d = tmp_path_factory.mktemp("benford")
    base = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(i, 1, "O", c / 100.0, base, "1-URGENT") for i, c in enumerate(cents_list)],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    got = [tuple(r) for r in benford_first_digit(spark, str(d)).collect()]
    assert got == _brute_benford(cents_list)


def test_benford_ppm_sums_to_one_million():
    assert sum(p for _, p in _BENFORD_PPM) == 1_000_000
    for d, p in _BENFORD_PPM:
        assert p == round(math.log10(1 + 1 / d) * 1_000_000)


# ------------------------------------------------------------ survival
def _brute_km(users):
    """users: list of (user_id, [(offset_s, is_purchase), ...])."""
    durations = []
    for _, evs in users:
        t0 = min(s for s, _ in evs)
        tps = [s for s, p in evs if p]
        tlast = max(s for s, _ in evs)
        if tps:
            durations.append(((min(tps) - t0) // 86400, True))
        else:
            durations.append(((tlast - t0) // 86400, False))
    steps: dict[int, list[int]] = {}
    for dur, conv in durations:
        e, c = steps.get(dur, [0, 0])
        steps[dur] = [e + (1 if conv else 0), c + (0 if conv else 1)]
    n_total = len(durations)
    removed = 0
    lnsum = Decimal(0)
    s_zero = 0
    rows = []
    for dur in sorted(steps):
        e, c = steps[dur]
        n_risk = n_total - removed
        removed += e + c
        if e == 0:
            continue
        if n_risk == e:
            s_zero = 1
        else:
            lnsum += _r6(math.log(float(n_risk - e) / float(n_risk)))
        rows.append(
            (
                dur,
                n_risk,
                e,
                s_zero,
                None if s_zero else float(lnsum),
            )
        )
    return rows[:30]


@settings(**_SETTINGS)
@given(
    users=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=4 * 86400),
                    st.booleans(),
                ),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda u: u[0],
    )
)
def test_survival_km_matches_bruteforce(spark, tmp_path_factory, users):
    d = tmp_path_factory.mktemp("km")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (j, u, "purchase" if p else "view", base + datetime.timedelta(seconds=s))
        for j, (u, s, p) in enumerate(
            (u, s, p) for u, evs in users for s, p in evs
        )
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = [tuple(r) for r in survival_km_daily(spark, str(d)).collect()]
    assert got == _brute_km(users)


# ----------------------------------------------------------- plan pins
def test_pipeline14_plan_shapes(spark, sf_dir):
    """No cartesian products or unbroadcast nested-loop joins anywhere in
    the tier; the MW rank grid's only wide joins are broadcastable."""
    from hadrodb_spark.operators.pipeline14 import (
        cohens_d_by_type,
        mcnemar_gate_disagreement,
        permutation_test_diff,
        spearman_rank_corr,
        theil_sen_slope,
    )

    for fn in (
        chisq_independence,
        mannwhitney_shift,
        cusum_changepoint,
        benford_first_digit,
        survival_km_daily,
        theil_sen_slope,
        cohens_d_by_type,
        permutation_test_diff,
        mcnemar_gate_disagreement,
        spearman_rank_corr,
    ):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (fn.__name__, plan)


# ----------------------------------------------------------- theil-sen
def _disc(vals, q):
    if not vals:
        return None
    s = sorted(vals)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def _brute_theil_sen(day_cents, window=128):
    daily: dict[int, int] = {}
    for day, cents in day_cents:
        daily[day] = daily.get(day, 0) + cents
    xmax = max(daily)
    recent = sorted((x, r) for x, r in daily.items() if x > xmax - window)
    slopes = []
    for i, (x1, r1) in enumerate(recent):
        for x2, r2 in recent[i + 1 :]:
            d = r2 - r1
            slopes.append(
                (-1 if d < 0 else 1) * ((abs(d) * 1000000) // (x2 - x1))
            )
    return [
        (
            len(slopes),
            _disc(slopes, 0.25),
            _disc(slopes, 0.5),
            _disc(slopes, 0.75),
        )
    ]


@settings(**_SETTINGS)
@given(
    day_cents=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # crosses the 128 cap
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_theil_sen_matches_bruteforce(spark, tmp_path_factory, day_cents):
    from hadrodb_spark.operators.pipeline14 import (
        _TS_WINDOW_DAYS,
        theil_sen_slope,
    )

    d = tmp_path_factory.mktemp("ts")
    base = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (i, 1, "O", cents / 100.0, base + datetime.timedelta(days=day), "1-URGENT")
            for i, (day, cents) in enumerate(day_cents)
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    got = [tuple(r) for r in theil_sen_slope(spark, str(d)).collect()]
    assert got == _brute_theil_sen(day_cents, window=_TS_WINDOW_DAYS)


# ------------------------------------------------------------ cohens d
def _brute_cohens_d(rows):
    by_type: dict[str, list[int]] = {}
    for t, c in rows:
        by_type.setdefault(t, []).append(c)
    if "purchase" not in by_type:
        return []
    p = by_type["purchase"]
    n1, s1, q1 = len(p), sum(p), sum(c * c for c in p)
    out = []
    for t in sorted(k for k in by_type if k != "purchase"):
        o = by_type[t]
        n2, s2, q2 = len(o), sum(o), sum(c * c for c in o)
        v1, v2 = n1 * q1 - s1 * s1, n2 * q2 - s2 * s2
        if n1 + n2 - 2 <= 0 or (v1 == 0 and v2 == 0):
            d = None
        else:
            d = float(
                _r6(
                    (float(s1) / float(n1) - float(s2) / float(n2))
                    / math.sqrt(
                        (float(v1) / float(n1) + float(v2) / float(n2))
                        / (float(n1) + float(n2) - 2.0)
                    )
                )
            )
        out.append((t, n1, n2, d))
    return out


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click", "view"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_cohens_d_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline14 import cohens_d_by_type

    d = tmp_path_factory.mktemp("cd")
    epoch = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(i, t, c / 100.0, epoch) for i, (t, c) in enumerate(rows)],
        "event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = [tuple(r) for r in cohens_d_by_type(spark, str(d)).collect()]
    assert got == _brute_cohens_d(rows)


# ------------------------------------------------------- hybrid RRF
def test_hybrid_rrf_fuses_its_own_legs(spark, sf_dir):
    """The fused ranking must be exactly recomputable from the two leg
    queries it composes — same rank windows, integer-ppm RRF, top-10 by
    (rrf DESC, doc_id).  Guards the leg/fusion contract the composed
    oracle encodes (both CTEs are the legs' verified oracle texts)."""
    from hadrodb_spark.operators import similarity as S
    from hadrodb_spark.operators.pipeline4 import bm25_score, hybrid_rrf_fusion

    lex_rows = bm25_score(spark, sf_dir).collect()
    lex_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(lex_rows, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    sem_rows = S.vector_topk(spark, sf_dir).collect()
    sem_rank = {
        r["vec_id"]: i + 1
        for i, r in enumerate(
            sorted(sem_rows, key=lambda r: (-r["cos_sim"], r["vec_id"]))
        )
    }
    expect = []
    for d in set(lex_rank) | set(sem_rank):
        rrf = (1000000 // (60 + lex_rank[d]) if d in lex_rank else 0) + (
            1000000 // (60 + sem_rank[d]) if d in sem_rank else 0
        )
        expect.append((d, lex_rank.get(d), sem_rank.get(d), rrf))
    expect.sort(key=lambda t: (-t[3], t[0]))
    got = [tuple(r) for r in hybrid_rrf_fusion(spark, sf_dir).collect()]
    assert got == expect[:10]
    # both legs contribute to the fused list at this fixture
    assert any(r[1] is not None for r in got)
    assert any(r[2] is not None for r in got)


# ---------------------------------------------------------------- RAKE
def _brute_rake(texts):
    import re
    from collections import defaultdict

    from hadrodb_spark.operators.textops import (
        _RAKE_MAX_LEN,
        _RAKE_STOPS,
        _RAKE_TOPK,
    )

    stops = set(_RAKE_STOPS)
    words = []
    for d, t in enumerate(texts):
        run = 0
        for i, w in enumerate(
            w for w in re.split(r"[^a-z0-9]+", t.lower()) if w
        ):
            if w in stops:
                run += 1
            else:
                words.append((d, run, i, w))
    plen = Counter((d, r) for d, r, _, _ in words)
    freq = Counter(w for *_, w in words)
    deg = Counter()
    for d, r, _, w in words:
        deg[w] += plen[(d, r)]
    wscore = {w: (deg[w] * 1000000) // freq[w] for w in freq}
    inst = defaultdict(list)
    for d, r, i, w in words:
        inst[(d, r)].append((i, w))
    phr = Counter()
    nwords = {}
    for ws in inst.values():
        ws.sort()
        if len(ws) <= _RAKE_MAX_LEN:
            p = " ".join(w for _, w in ws)
            phr[p] += 1
            nwords[p] = len(ws)
    rows = [
        (p, nwords[p], c, sum(wscore[w] for w in p.split(" ")))
        for p, c in phr.items()
    ]
    rows.sort(key=lambda t: (-t[3], t[0]))
    return rows[:_RAKE_TOPK]


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["the", "of", "to", "spark", "join", "scan", "fast", "key"]
            ),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_rake_matches_bruteforce(spark, tmp_path_factory, texts):
    from hadrodb_spark.operators.textops import rake_keywords

    d = tmp_path_factory.mktemp("rake")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in rake_keywords(spark, str(d)).collect()]
    assert got == _brute_rake(texts)


# ------------------------------------------------------- permutation
def _brute_perm(rows):
    import hashlib

    from hadrodb_spark.operators.pipeline14 import _PERM_R

    base = [
        (i, t == "purchase", c)
        for i, (t, c) in enumerate(rows)
        if t in ("purchase", "click")
    ]
    if not base:
        return [(None, None, None, None, None, None)]
    n_p = sum(1 for _, p, _ in base if p)
    s_p = sum(c for _, p, c in base if p)
    n_c = len(base) - n_p
    s_c = sum(c for _, p, c in base if not p)
    diff_obs = (
        _r6(float(s_p) / float(n_p) - float(s_c) / float(n_c))
        if n_p and n_c
        else None
    )
    n_valid = n_extreme = 0
    for r in range(_PERM_R):
        n1 = s1 = n0 = s0 = 0
        for eid, _, c in base:
            coin = int(hashlib.md5(f"{eid}:{r}".encode()).hexdigest()[0], 16) % 2
            if coin:
                n1 += 1
                s1 += c
            else:
                n0 += 1
                s0 += c
        if n1 == 0 or n0 == 0:
            continue
        diff_r = _r6(float(s1) / float(n1) - float(s0) / float(n0))
        if diff_obs is not None:
            n_valid += 1
            if abs(diff_r) >= abs(diff_obs):
                n_extreme += 1
    p = None if n_valid == 0 else (n_extreme * 1000000) // n_valid
    return [
        (
            n_p,
            n_c,
            None if diff_obs is None else float(diff_obs),
            n_valid,
            n_extreme,
            p,
        )
    ]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click", "view"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_permutation_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline14 import permutation_test_diff

    d = tmp_path_factory.mktemp("perm")
    epoch = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(i, t, c / 100.0, epoch) for i, (t, c) in enumerate(rows)],
        "event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = [tuple(r) for r in permutation_test_diff(spark, str(d)).collect()]
    assert got == _brute_perm(rows)


# ------------------------------------------------------------- mcnemar
def _toks(t):
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _brute_mcnemar(rows):
    a = b = c = d = 0
    for n_chars, text in rows:
        g1 = n_chars >= 200
        ts = _toks(text)
        g2 = 2 * len(set(ts)) >= len(ts)
        if g1 and g2:
            a += 1
        elif g1:
            b += 1
        elif g2:
            c += 1
        else:
            d += 1
    if b + c == 0:
        x2, share = None, None
    else:
        ab = abs(float(b) - c)
        x2 = float(_r6(((ab - 1.0) * (ab - 1.0)) / (float(b) + c)))
        share = (b * 1000000) // (b + c)
    return [(a, b, c, d, x2, share)]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=6
            ).map(" ".join),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_mcnemar_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline14 import mcnemar_gate_disagreement

    d = tmp_path_factory.mktemp("mcn")
    spark.createDataFrame(
        [(i, t, "en", "src0", n) for i, (n, t) in enumerate(rows)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in mcnemar_gate_disagreement(spark, str(d)).collect()]
    assert got == _brute_mcnemar(rows)


# ------------------------------------------------------------ spearman
def _brute_spearman(rows):
    xs = [n for n, _ in rows]
    ys = [len(_toks(t)) for _, t in rows]

    def ranks2(vals):
        out = []
        for v in vals:
            lt = sum(1 for u in vals if u < v)
            eq = sum(1 for u in vals if u == v)
            out.append(2 * lt + eq + 1)
        return out

    rx, ry = ranks2(xs), ranks2(ys)
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx == 0 or vy == 0:
        rho = None
    else:
        rho = float(
            _r6(
                float(n * sxy - sx * sy)
                / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
            )
        )
    return [(n, rho)]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=8
            ).map(" ".join),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_spearman_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline14 import spearman_rank_corr

    d = tmp_path_factory.mktemp("spr")
    spark.createDataFrame(
        [(i, t, "en", "src0", n) for i, (n, t) in enumerate(rows)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in spearman_rank_corr(spark, str(d)).collect()]
    assert got == _brute_spearman(rows)
