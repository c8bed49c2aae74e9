"""Property tests for the pipeline16 statistical-audit tier 3:
brute-force mirrors of the Bowker pair-folding, the Markov entropy-rate
algebra, the Mann-Kendall pair/tie bookkeeping, the Wald-Wolfowitz runs
counting, Cramér's V over the full marginal grid, and the Welch moment
arithmetic — on adversarial tiny inputs (single users, self-loop-only
streams, single-day series, all-tied values, groups below n=2, single-row
grids) the parquet fixtures never produce.

Float discipline in the brute mirrors: Spark's ROUND is HALF-UP on the
double's decimal rendering, Python's round() is banker's — so every
rounding goes through Decimal(repr(x)).quantize(..., ROUND_HALF_UP), and
every float expression replays the SHARED op-order text exactly."""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline16 import (
    bowker_symmetry,
    cramers_v_priority_status,
    mann_kendall_trend,
    markov_entropy_rate,
    runs_test_updown,
    welch_t_value,
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

_EPOCH = datetime.datetime(2024, 1, 1)
_TYPES = ["click", "error", "purchase", "signup", "view"]


def _r6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


# ------------------------------------------------------------ event fixtures
def _write_events(spark, d, rows):
    """rows: list of (event_id, user_id, event_type, cents-or-None); ts
    increases with event_id so the (ts, event_id) stream order is the
    row order within each user."""
    spark.createDataFrame(
        [
            (
                i,
                _EPOCH + datetime.timedelta(seconds=i),
                u,
                t,
                None if c is None else c / 100.0,
            )
            for i, u, t, c in rows
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG,"
        " event_type STRING, value DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))


def _transitions(rows):
    """Exact (from_type, to_type) transition counts per the certified
    (user, ts, event_id) stream order."""
    per_user = defaultdict(list)
    for i, u, t, _ in sorted(rows):
        per_user[u].append(t)
    trans = Counter()
    for seq in per_user.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    return trans


_STREAMS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=1,
    max_size=40,
)


def _stream_rows(stream):
    return [(i, u, _TYPES[t], 100) for i, (u, t) in enumerate(stream)]


# ------------------------------------------------------------------- bowker
def _brute_bowker(rows):
    trans = _transitions(rows)
    pairs = defaultdict(lambda: [0, 0])
    for (a, b), n in trans.items():
        if a == b:
            continue
        i, j = min(a, b), max(a, b)
        pairs[(i, j)][0 if a < b else 1] += n
    if not pairs:
        return (0, None, None)
    n_pairs = len(pairs)
    n_trans = sum(u + v for u, v in pairs.values())
    b_ppm = sum(
        ((u - v) * (u - v) * 1_000_000) // (u + v) for u, v in pairs.values()
    )
    return (n_pairs, n_trans, b_ppm)


@settings(**_SETTINGS)
@given(stream=_STREAMS)
def test_bowker_matches_bruteforce(spark, tmp_path_factory, stream):
    d = tmp_path_factory.mktemp("bowker")
    rows = _stream_rows(stream)
    _write_events(spark, d, rows)
    got = [tuple(r) for r in bowker_symmetry(spark, str(d)).collect()]
    assert got == [_brute_bowker(rows)]


def test_bowker_symmetric_stream_is_zero(spark, tmp_path_factory):
    # a perfect A→B→A→B… stream has n_up == n_dn for its one pair
    d = tmp_path_factory.mktemp("bowker0")
    rows = [(i, 1, _TYPES[i % 2], 100) for i in range(9)]
    _write_events(spark, d, rows)
    (row,) = bowker_symmetry(spark, str(d)).collect()
    assert (row.n_pairs, row.n_transitions, row.b_ppm) == (1, 8, 0)


# ------------------------------------------------------------- entropy rate
def _brute_entropy(rows):
    trans = _transitions(rows)
    row_tot = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    out = []
    wsum = Decimal(0)
    n_tot = sum(row_tot.values())
    hs = {}
    for a in sorted(row_tot):
        h = Decimal(0)
        rt = row_tot[a]
        for (x, _), n in trans.items():
            if x != a:
                continue
            h += _r6(float(n) / float(rt) * math.log2(float(rt) / float(n)))
        hs[a] = h
        wsum += Decimal(rt) * h
    rate = float(_r6(float(wsum) / float(n_tot))) if row_tot else None
    for a in sorted(row_tot):
        out.append((a, row_tot[a], float(hs[a]), rate))
    return out


@settings(**_SETTINGS)
@given(stream=_STREAMS)
def test_entropy_rate_matches_bruteforce(spark, tmp_path_factory, stream):
    d = tmp_path_factory.mktemp("entropy")
    rows = _stream_rows(stream)
    _write_events(spark, d, rows)
    got = [tuple(r) for r in markov_entropy_rate(spark, str(d)).collect()]
    assert got == _brute_entropy(rows)


def test_entropy_rate_deterministic_stream_is_zero(spark, tmp_path_factory):
    # A→B→A→B…: every row has exactly one successor ⇒ rate is exactly 0
    d = tmp_path_factory.mktemp("entropy0")
    rows = [(i, 1, _TYPES[i % 2], 100) for i in range(10)]
    _write_events(spark, d, rows)
    res = markov_entropy_rate(spark, str(d)).collect()
    assert all(r.h_bits == 0.0 and r.entropy_rate_bits == 0.0 for r in res)


# ------------------------------------------------------------ order fixtures
def _write_orders(spark, d, day_cents, priority_status=None):
    """day_cents: list of (day, cents).  priority_status: optional
    parallel list of (priority, status) tuples (defaults to constants)."""
    ps = priority_status or [("1-URGENT", "O")] * len(day_cents)
    spark.createDataFrame(
        [
            (i, 1, s, c / 100.0, _EPOCH + datetime.timedelta(days=day), p)
            for i, ((day, c), (p, s)) in enumerate(zip(day_cents, ps))
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))


def _daily(day_cents):
    tot = Counter()
    for day, c in day_cents:
        tot[day] += c
    return [tot[d] for d in sorted(tot)]


_DAY_CENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=-500, max_value=500),
    ),
    min_size=1,
    max_size=40,
)


# ------------------------------------------------------------- mann-kendall
def _brute_mk(day_cents):
    xs = _daily(day_cents)
    n = len(xs)
    conc = disc = tied = 0
    for i in range(n):
        for j in range(i + 1, n):
            if xs[j] > xs[i]:
                conc += 1
            elif xs[j] < xs[i]:
                disc += 1
            else:
                tied += 1
    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
    )
    s = conc - disc
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    if var18 <= 0:
        z = None
    elif s > 0:
        z = float(_r6((float(s) - 1.0) / math.sqrt(float(var18) / 18.0)))
    elif s < 0:
        z = float(_r6((float(s) + 1.0) / math.sqrt(float(var18) / 18.0)))
    else:
        z = 0.0
    return (n, conc, disc, tied, s, var18, z)


@settings(**_SETTINGS)
@given(day_cents=_DAY_CENTS)
def test_mann_kendall_matches_bruteforce(spark, tmp_path_factory, day_cents):
    d = tmp_path_factory.mktemp("mk")
    _write_orders(spark, d, day_cents)
    got = [tuple(r) for r in mann_kendall_trend(spark, str(d)).collect()]
    assert got == [_brute_mk(day_cents)]


def test_mann_kendall_monotone_series(spark, tmp_path_factory):
    # strictly increasing daily revenue ⇒ every pair concordant
    d = tmp_path_factory.mktemp("mk_mono")
    day_cents = [(day, 100 + day) for day in range(10)]
    _write_orders(spark, d, day_cents)
    (row,) = mann_kendall_trend(spark, str(d)).collect()
    assert row.s_stat == row.n_concordant == 45
    assert row.n_discordant == row.n_tied_pairs == 0
    assert row.z > 0


# ---------------------------------------------------------------- runs test
def _brute_runs(day_cents):
    xs = _daily(day_cents)
    signs = []
    for a, b in zip(xs, xs[1:]):
        if b != a:
            signs.append(1 if b > a else -1)
    if not signs:
        return (None, None, None, 0, None, None)
    n_up = signs.count(1)
    n_dn = signs.count(-1)
    n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    if n_up == 0 or n_dn == 0:
        e = None
    else:
        e = float(
            _r6(2.0 * float(n_up) * n_dn / (float(n_up) + n_dn) + 1.0)
        )
    if n_up == 0 or n_dn == 0 or 2 * n_up * n_dn <= n_up + n_dn:
        z = None
    else:
        ef = 2.0 * float(n_up) * n_dn / (float(n_up) + n_dn) + 1.0
        var = (
            2.0
            * float(n_up)
            * n_dn
            * (2.0 * float(n_up) * n_dn - n_up - n_dn)
            / (
                (float(n_up) + n_dn)
                * (float(n_up) + n_dn)
                * (float(n_up) + n_dn - 1.0)
            )
        )
        z = float(_r6((float(n_runs) - ef) / math.sqrt(var)))
    return (n_up + n_dn, n_up, n_dn, n_runs, e, z)


@settings(**_SETTINGS)
@given(day_cents=_DAY_CENTS)
def test_runs_matches_bruteforce(spark, tmp_path_factory, day_cents):
    d = tmp_path_factory.mktemp("runs")
    _write_orders(spark, d, day_cents)
    got = [tuple(r) for r in runs_test_updown(spark, str(d)).collect()]
    assert got == [_brute_runs(day_cents)]


def test_runs_alternating_series(spark, tmp_path_factory):
    # up-down-up-down…: every delta flips sign ⇒ n_runs == n_signs
    d = tmp_path_factory.mktemp("runs_alt")
    day_cents = [(day, 100 if day % 2 else 200) for day in range(9)]
    _write_orders(spark, d, day_cents)
    (row,) = runs_test_updown(spark, str(d)).collect()
    assert row.n_runs == row.n_signs == 8
    assert row.z > 0  # far more runs than E[R]


# ----------------------------------------------------------------- cramér V
_GRID_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # priority index
        st.integers(min_value=0, max_value=2),  # status index
    ),
    min_size=1,
    max_size=40,
)
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
_STATS = ["F", "O", "P"]


def _brute_cramer(pairs):
    cells = Counter(pairs)
    rmarg = Counter(p for p, _ in pairs)
    cmarg = Counter(s for _, s in pairs)
    n = len(pairs)
    chi2 = Decimal(0)
    for p in rmarg:
        for s in cmarg:
            obs = cells.get((p, s), 0)
            num = n * obs - rmarg[p] * cmarg[s]
            chi2 += _r6(
                (float(num) * float(num))
                / (float(n) * float(rmarg[p]) * cmarg[s])
            )
    mindim = min(len(rmarg) - 1, len(cmarg) - 1)
    v = (
        None
        if n == 0 or mindim <= 0
        else float(_r6(math.sqrt(float(chi2) / (float(n) * mindim))))
    )
    return (n, len(rmarg), len(cmarg), float(chi2), v)


@settings(**_SETTINGS)
@given(grid=_GRID_ROWS)
def test_cramers_v_matches_bruteforce(spark, tmp_path_factory, grid):
    d = tmp_path_factory.mktemp("cramer")
    ps = [(_PRIOS[p], _STATS[s]) for p, s in grid]
    _write_orders(spark, d, [(0, 100)] * len(ps), ps)
    got = [
        tuple(r) for r in cramers_v_priority_status(spark, str(d)).collect()
    ]
    assert got == [_brute_cramer(ps)]


def test_cramers_v_single_row_grid_is_null(spark, tmp_path_factory):
    # one priority level ⇒ min(r−1, c−1) = 0 ⇒ V undefined (NULL), χ² = 0
    d = tmp_path_factory.mktemp("cramer1")
    ps = [("1-URGENT", s) for s in ["F", "O", "P", "O"]]
    _write_orders(spark, d, [(0, 100)] * len(ps), ps)
    (row,) = cramers_v_priority_status(spark, str(d)).collect()
    assert row.cramers_v is None and row.n_priorities == 1


# ------------------------------------------------------------------- welch
_WELCH_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["purchase", "click", "view"]),
        st.one_of(
            st.none(), st.integers(min_value=-10_000, max_value=10_000)
        ),
    ),
    min_size=1,
    max_size=40,
)


def _brute_welch(rows):
    def moments(t):
        xs = [c for tt, c in rows if tt == t and c is not None]
        return len(xs), sum(xs), sum(x * x for x in xs)

    n1, sx1, sxx1 = moments("purchase")
    n2, sx2, sxx2 = moments("click")
    ssq1 = n1 * sxx1 - sx1 * sx1
    ssq2 = n2 * sxx2 - sx2 * sx2
    u1 = (
        None
        if n1 < 2
        else _r6(float(ssq1) / (float(n1) * n1 * (n1 - 1.0)))
    )
    u2 = (
        None
        if n2 < 2
        else _r6(float(ssq2) / (float(n2) * n2 * (n2 - 1.0)))
    )
    md = (
        None
        if n1 == 0 or n2 == 0
        else float(_r6(float(sx1) / n1 - float(sx2) / n2))
    )
    if u1 is None or u2 is None or float(u1) + float(u2) <= 0:
        t = df = None
    else:
        us = float(u1) + float(u2)
        t = float(
            _r6((float(sx1) / n1 - float(sx2) / n2) / math.sqrt(us))
        )
        df = float(
            _r6(
                us
                * us
                / (
                    float(u1) * float(u1) / (n1 - 1.0)
                    + float(u2) * float(u2) / (n2 - 1.0)
                )
            )
        )
    return (n1, n2, md, t, df)


@settings(**_SETTINGS)
@given(rows=_WELCH_ROWS)
def test_welch_matches_bruteforce(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("welch")
    ev = [(i, 1, t, c) for i, (t, c) in enumerate(rows)]
    _write_events(spark, d, ev)
    got = [tuple(r) for r in welch_t_value(spark, str(d)).collect()]
    assert got == [_brute_welch(rows)]


def test_welch_small_group_is_null(spark, tmp_path_factory):
    # n_click = 1 < 2 ⇒ u2 undefined ⇒ t/df NULL, mean diff still defined
    d = tmp_path_factory.mktemp("welch1")
    ev = [
        (0, 1, "purchase", 100),
        (1, 1, "purchase", 300),
        (2, 1, "click", 200),
    ]
    _write_events(spark, d, ev)
    (row,) = welch_t_value(spark, str(d)).collect()
    assert row.t_welch is None and row.df_welch is None
    assert row.mean_diff_cents == 0.0


# ----------------------------------------------------- graph batch (r9 s3)
def _write_lineitem_graph(spark, d, orders):
    """orders: list of part-id lists; one synthetic order per list."""
    rows = [
        (100 + i, int(p), 1)
        for i, parts in enumerate(orders)
        for p in parts
    ]
    spark.createDataFrame(
        rows, "l_orderkey LONG, l_partkey LONG, l_quantity LONG"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))


def test_clustering_triangle_plus_star(spark, tmp_path_factory):
    """K3 on {1,2,3} plus a 3-leaf star at 10: the triangle nodes close
    their one wedge each (local = 10⁶), the hub closes none (local = 0),
    leaves (deg 1) are ineligible."""
    from hadrodb_spark.operators.graph import graph_clustering_coefficient

    d = tmp_path_factory.mktemp("cc3")
    _write_lineitem_graph(
        spark, d, [[1, 2, 3], [10, 11], [10, 12], [10, 13]]
    )
    (row,) = graph_clustering_coefficient(spark, str(d)).collect()
    assert tuple(row) == (7, 6, 6, 1, 500000, 750000)


def test_clustering_complete_graph_is_one(spark, tmp_path_factory):
    # K4: every wedge closes ⇒ global and mean-local are exactly 10⁶
    from hadrodb_spark.operators.graph import graph_clustering_coefficient

    d = tmp_path_factory.mktemp("cc4")
    _write_lineitem_graph(spark, d, [[1, 2, 3, 4]])
    (row,) = graph_clustering_coefficient(spark, str(d)).collect()
    assert tuple(row) == (4, 6, 12, 4, 1000000, 1000000)


def test_clustering_triangle_free_is_zero(spark, tmp_path_factory):
    from hadrodb_spark.operators.graph import graph_clustering_coefficient

    d = tmp_path_factory.mktemp("ccstar")
    _write_lineitem_graph(spark, d, [[1, 2], [2, 3], [3, 4]])
    (row,) = graph_clustering_coefficient(spark, str(d)).collect()
    assert row.n_triangles == 0 and row.global_c_ppm == 0
    assert row.mean_local_c_ppm == 0


def test_adamic_adar_path_and_clique(spark, tmp_path_factory):
    """Path 1—2—3: the one non-edge (1,3) scores 1/ln(deg 2).  A K3 has
    no candidate (every wedge pair is already an edge ⇒ empty)."""
    from hadrodb_spark.operators.graph import graph_adamic_adar_topk

    d = tmp_path_factory.mktemp("aa_path")
    _write_lineitem_graph(spark, d, [[1, 2], [2, 3]])
    (row,) = graph_adamic_adar_topk(spark, str(d)).collect()
    assert (row.node_u, row.node_v, row.n_common) == (1, 3, 1)
    assert row.aa_score == float(_r6(1.0 / math.log(2.0)))

    d2 = tmp_path_factory.mktemp("aa_k3")
    _write_lineitem_graph(spark, d2, [[1, 2, 3]])
    assert graph_adamic_adar_topk(spark, str(d2)).count() == 0


def test_adamic_adar_prefers_rare_neighbors(spark, tmp_path_factory):
    """(1,3) share the degree-2 center 2; (4,6) share the degree-5 hub 5:
    1/ln 2 > 1/ln 5, so the rare-neighbor pair must rank first."""
    from hadrodb_spark.operators.graph import graph_adamic_adar_topk

    d = tmp_path_factory.mktemp("aa_rare")
    _write_lineitem_graph(
        spark,
        d,
        [[1, 2], [2, 3], [4, 5], [5, 6], [5, 7], [5, 8], [5, 9]],
    )
    rows = graph_adamic_adar_topk(spark, str(d)).collect()
    assert (rows[0].node_u, rows[0].node_v) == (1, 3)
    assert rows[0].aa_score > rows[1].aa_score


# ---------------------------------------------------------- documents batch
def _write_documents(spark, d, rows):
    """rows: list of (doc_id, source, text-or-None, n_chars-or-None)."""
    spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING, n_chars LONG"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )


# ------------------------------------------------------- quantile profile
def _brute_qp(rows):
    per = defaultdict(list)
    for _, s, _, n in rows:
        if n is not None:
            per[s].append(min(n, 65536))
    if not per:
        return []
    qv = {}
    for s, xs in per.items():
        xs.sort()
        n = len(xs)
        for q in range(5, 100, 5):
            k = (q * n + 99) // 100
            qv[(q, s)] = xs[k - 1]
    out = []
    for q in range(5, 100, 5):
        vals = [qv[(q, s)] for s in per]
        spread = max(vals) - min(vals)
        for s in sorted(per):
            out.append((q, s, qv[(q, s)], spread))
    return out


_QP_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.one_of(
            st.none(), st.integers(min_value=0, max_value=100_000)
        ),
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(rows=_QP_ROWS)
def test_quantile_profile_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline16 import quantile_profile_sources

    d = tmp_path_factory.mktemp("qp")
    docs = [
        (i, f"src{s}", "x", n) for i, (s, n) in enumerate(rows)
    ]
    _write_documents(spark, d, docs)
    got = [
        tuple(r) for r in quantile_profile_sources(spark, str(d)).collect()
    ]
    assert got == _brute_qp(docs)


# ------------------------------------------------------- token budget pack
def _brute_pack(docs):
    per = defaultdict(list)
    for doc_id, s, text, n_chars in docs:
        if text is None or n_chars is None:
            continue
        tok = len([t for t in text.lower().split() if t])
        per[s].append((-n_chars, doc_id, tok))
    out = []
    for s in sorted(per):
        items = sorted(per[s])
        cum = 0
        kept = tokens_kept = 0
        for _, _, tok in items:
            cum += tok
            if cum <= 5000:
                kept += 1
                tokens_kept += tok
        total_tok = sum(t for _, _, t in items)
        out.append(
            (
                s,
                len(items),
                kept,
                total_tok,
                tokens_kept,
                (tokens_kept * 1_000_000) // 5000,
            )
        )
    return out


_PACK_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.one_of(st.none(), st.integers(min_value=0, max_value=3000)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
    ),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(rows=_PACK_ROWS)
def test_token_budget_pack_matches_bruteforce(
    spark, tmp_path_factory, rows
):
    from hadrodb_spark.operators.pipeline16 import token_budget_pack

    d = tmp_path_factory.mktemp("pack")
    docs = [
        (
            i,
            f"src{s}",
            None if k is None else "tok " * k,
            n,
        )
        for i, (s, k, n) in enumerate(rows)
    ]
    _write_documents(spark, d, docs)
    got = [tuple(r) for r in token_budget_pack(spark, str(d)).collect()]
    assert got == _brute_pack(docs)


def test_token_budget_pack_prefix_is_greedy(spark, tmp_path_factory):
    # budget 5000: the 3000-token doc fits, the next (2500) would overflow
    # the prefix, and nothing after it can re-enter (prefix, not knapsack)
    from hadrodb_spark.operators.pipeline16 import token_budget_pack

    d = tmp_path_factory.mktemp("packg")
    docs = [
        (0, "s", "tok " * 3000, 3000),
        (1, "s", "tok " * 2500, 2500),
        (2, "s", "tok " * 1000, 1000),
    ]
    _write_documents(spark, d, docs)
    (row,) = token_budget_pack(spark, str(d)).collect()
    assert (row.n_docs_kept, row.tokens_kept) == (1, 3000)


# ----------------------------------------------------------------- binseg
def _brute_binseg(day_cents):
    tot = Counter()
    for day, c in day_cents:
        tot[19723 + day] += c  # fixture base 2024-01-01 = epoch day 19723
    days = sorted(tot)
    xs = [tot[d] for d in days]
    n = len(xs)

    def split(seq_days, seq_xs):
        m = len(seq_xs)
        if m < 2:
            return None
        total = sum(seq_xs)
        best = None
        prefix = 0
        for i in range(1, m):  # split AFTER index i (1-based)
            prefix += seq_xs[i - 1]
            abs_s = abs(m * prefix - i * total)
            key = (-abs_s, seq_days[i - 1])
            if best is None or key < best[0]:
                best = (key, i, seq_days[i - 1], abs_s)
        _, i, d, abs_s = best
        return i, d, abs_s // m

    rows = []
    root = split(days, xs)
    if root is None:
        rows.append(("root", n, days[0], days[-1], None, None))
        return rows
    si, sd, sc = root
    rows.append(("root", n, days[0], days[-1], sd, sc))
    for name, lo, hi in (("left", 0, si), ("right", si, n)):
        seg_days, seg_xs = days[lo:hi], xs[lo:hi]
        child = split(seg_days, seg_xs)
        rows.append(
            (
                name,
                len(seg_xs),
                seg_days[0],
                seg_days[-1],
                None if child is None else child[1],
                None if child is None else child[2],
            )
        )
    return sorted(rows)


@settings(**_SETTINGS)
@given(day_cents=_DAY_CENTS)
def test_binseg_matches_bruteforce(spark, tmp_path_factory, day_cents):
    from hadrodb_spark.operators.pipeline16 import changepoint_binseg

    d = tmp_path_factory.mktemp("binseg")
    _write_orders(spark, d, day_cents)
    got = [tuple(r) for r in changepoint_binseg(spark, str(d)).collect()]
    assert got == _brute_binseg(day_cents)


def test_binseg_single_day_root_only(spark, tmp_path_factory):
    from hadrodb_spark.operators.pipeline16 import changepoint_binseg

    d = tmp_path_factory.mktemp("binseg1")
    _write_orders(spark, d, [(3, 100), (3, 200)])
    got = [tuple(r) for r in changepoint_binseg(spark, str(d)).collect()]
    assert got == [("root", 1, 19726, 19726, None, None)]


def test_binseg_finds_planted_step(spark, tmp_path_factory):
    # 10 days at 100 then 10 days at 10 000: root split must land on the
    # step boundary (last low-variance prefix day = day 9)
    from hadrodb_spark.operators.pipeline16 import changepoint_binseg

    d = tmp_path_factory.mktemp("binsegp")
    day_cents = [(day, 100) for day in range(10)] + [
        (day, 10_000) for day in range(10, 20)
    ]
    _write_orders(spark, d, day_cents)
    rows = {r.segment: r for r in changepoint_binseg(spark, str(d)).collect()}
    epoch0 = 19723  # 2024-01-01
    assert rows["root"].split_day == epoch0 + 9
    assert rows["left"].n_days == 10 and rows["right"].n_days == 10


# ------------------------------------------------------------------- hurst
def _brute_hurst(day_cents):
    tot = Counter()
    for day, c in day_cents:
        tot[day] += c
    xs = [tot[d] for d in sorted(tot)]
    pts = []
    for k in (16, 32, 64, 128):
        terms = []
        for b in range(len(xs) // k):
            blk = xs[b * k:(b + 1) * k]
            s = sum(blk)
            den = k * sum(x * x for x in blk) - s * s
            prefix = 0
            kds = []
            for j, x in enumerate(blk, start=1):
                prefix += x
                kds.append(k * prefix - j * s)
            rk = max(kds) - min(kds)
            if den > 0 and rk > 0:
                rs = float(_r6(float(rk) / math.sqrt(float(den))))
                terms.append(_r6(math.log(rs)))
        if terms:
            ln_sum = sum(terms)
            mean = _r6(float(ln_sum) / float(len(terms)))
            x = _r6(math.log(float(k)))
            pts.append((k, len(terms), x, mean))
    if not pts:
        return []
    # the slope combines the EXACT decimal sums under ONE float text —
    # replay the shared op order on floats of those sums
    m = float(len(pts))
    sx = float(sum(p[2] for p in pts))
    sy = float(sum(p[3] for p in pts))
    sxy = float(sum(p[2] * p[3] for p in pts))
    sxx = float(sum(p[2] * p[2] for p in pts))
    den = m * sxx - sx * sx
    slope = (
        None
        if den <= 0
        else float(_r6((m * sxy - sx * sy) / (m * sxx - sx * sx)))
    )
    return [(k, nb, float(y), slope) for k, nb, _, y in pts]


@settings(**_SETTINGS)
@given(
    day_cents=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90),
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_hurst_matches_bruteforce(spark, tmp_path_factory, day_cents):
    from hadrodb_spark.operators.pipeline16 import hurst_rescaled_range

    d = tmp_path_factory.mktemp("hurst")
    _write_orders(spark, d, day_cents)
    got = [tuple(r) for r in hurst_rescaled_range(spark, str(d)).collect()]
    assert got == _brute_hurst(day_cents)


# -------------------------------------------------------------------- hill
def _brute_hill(cents_list):
    pos = sorted(
        [(-c, i) for i, c in enumerate(cents_list) if c is not None and c > 0]
    )
    top = [(-nc, i) for nc, i in pos[:101]]
    m = len(top)
    if m < 2:
        return (0, None, None, None)
    x_ref = top[-1][0]
    terms = [
        _r6(math.log(float(c) / x_ref)) for c, _ in top[:-1]
    ]
    n_top = len(terms)
    lnsum = sum(terms)
    alpha = (
        None
        if float(lnsum) <= 0
        else float(_r6(float(n_top) / float(lnsum)))
    )
    return (n_top, x_ref, float(lnsum), alpha)


@settings(**_SETTINGS)
@given(
    cents_list=st.lists(
        st.one_of(
            st.none(), st.integers(min_value=-1000, max_value=100_000)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_hill_matches_bruteforce(spark, tmp_path_factory, cents_list):
    from hadrodb_spark.operators.pipeline16 import hill_tail_alpha

    d = tmp_path_factory.mktemp("hill")
    # written directly (not via _write_orders) to carry NULL totals
    spark.createDataFrame(
        [
            (
                i,
                1,
                "O",
                None if c is None else c / 100.0,
                _EPOCH,
                "1-URGENT",
            )
            for i, c in enumerate(cents_list)
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    got = [tuple(r) for r in hill_tail_alpha(spark, str(d)).collect()]
    assert got == [_brute_hill(cents_list)]


def test_hill_all_tied_is_null(spark, tmp_path_factory):
    from hadrodb_spark.operators.pipeline16 import hill_tail_alpha

    d = tmp_path_factory.mktemp("hill0")
    _write_orders(spark, d, [(0, 500)] * 5)
    (row,) = hill_tail_alpha(spark, str(d)).collect()
    assert row.alpha is None and row.ln_sum == 0.0


# -------------------------------------------------------- seasonal strength
def test_seasonal_strength_pure_weekly_cycle(spark, tmp_path_factory):
    """A noiseless weekly cycle decomposes to zero residual (42 days of
    rev = f(dow) with constant weekly total ⇒ flat trend), so
    F_seasonal must be exactly 1.0."""
    from hadrodb_spark.operators.pipeline16 import seasonal_strength_weekly

    d = tmp_path_factory.mktemp("sstr")
    cyc = [100, 700, 300, 900, 500, 1100, 200]
    spark.createDataFrame(
        [
            (i, _EPOCH + datetime.timedelta(days=i), 1, "purchase",
             cyc[(i + 3) % 7] / 100.0, "{}")
            for i in range(42)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    (row,) = seasonal_strength_weekly(spark, str(d)).collect()
    assert row.f_seasonal == 1.0
    # flat trend + zero residual ⇒ Var(T+R) = 0 ⇒ F_trend is 0/0 ⇒ NULL
    assert row.f_trend is None


def test_seasonal_strength_constant_series_is_null(spark, tmp_path_factory):
    # constant revenue: every component variance is 0 ⇒ both F undefined
    from hadrodb_spark.operators.pipeline16 import seasonal_strength_weekly

    d = tmp_path_factory.mktemp("sstr0")
    spark.createDataFrame(
        [
            (i, _EPOCH + datetime.timedelta(days=i), 1, "purchase",
             5.0, "{}")
            for i in range(21)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    (row,) = seasonal_strength_weekly(spark, str(d)).collect()
    assert row.f_seasonal is None and row.f_trend is None


# -------------------------------------------------------- cochran-armitage
def _brute_ca(docs):
    buckets = defaultdict(lambda: [0, 0])
    for _, _, text, n_chars in docs:
        if text is None or n_chars is None:
            continue
        w = min(n_chars // 1024, 3)
        tok = len([t for t in text.lower().split() if t])
        buckets[w][0] += 1
        buckets[w][1] += 1 if tok >= 40 else 0
    if not buckets:
        return []
    n_tot = sum(n for n, _ in buckets.values())
    r_tot = sum(r for _, r in buckets.values())
    swn = sum(w * n for w, (n, _) in buckets.items())
    swr = sum(w * r for w, (_, r) in buckets.items())
    swwn = sum(w * w * n for w, (n, _) in buckets.items())
    t_num = n_tot * swr - r_tot * swn
    rr = r_tot * (n_tot - r_tot)
    sw = n_tot * swwn - swn * swn
    if rr <= 0 or sw <= 0:
        z = None
    else:
        z = float(
            _r6(
                float(t_num)
                * math.sqrt(float(n_tot))
                / (math.sqrt(float(rr)) * math.sqrt(float(sw)))
            )
        )
    return [
        (w, n, r, (r * 1_000_000) // n, z)
        for w, (n, r) in sorted(buckets.items())
    ]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),  # n_chars
            st.integers(min_value=0, max_value=80),    # token count
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cochran_armitage_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline16 import cochran_armitage_trend

    d = tmp_path_factory.mktemp("ca")
    docs = [
        (i, "s", "tok " * k, n) for i, (n, k) in enumerate(rows)
    ]
    _write_documents(spark, d, docs)
    got = [
        tuple(r) for r in cochran_armitage_trend(spark, str(d)).collect()
    ]
    assert got == _brute_ca(docs)


# ------------------------------------------------------- absorbing funnel
def _brute_funnel(rows):
    trans = _transitions(rows)
    row_tot = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    pm = {
        (a, b): (1_000_000 * n) // row_tot[a] for (a, b), n in trans.items()
    }
    types = sorted({a for a, _ in trans} | {b for _, b in trans})
    h = {t: 1_000_000 if t == "purchase" else 0 for t in types}
    hist = []
    for _ in range(3):
        nxt = {}
        for t in types:
            if t == "purchase":
                nxt[t] = 1_000_000
            else:
                flow = sum(
                    p * h[b] for (a, b), p in pm.items() if a == t
                )
                nxt[t] = flow // 1_000_000
        h = nxt
        hist.append(dict(h))
    return [
        (t, hist[0][t], hist[1][t], hist[2][t]) for t in types
    ]


@settings(**_SETTINGS)
@given(stream=_STREAMS)
def test_absorbing_funnel_matches_bruteforce(
    spark, tmp_path_factory, stream
):
    from hadrodb_spark.operators.pipeline16 import markov_absorbing_funnel

    d = tmp_path_factory.mktemp("funnel")
    rows = _stream_rows(stream)
    _write_events(spark, d, rows)
    got = [
        tuple(r) for r in markov_absorbing_funnel(spark, str(d)).collect()
    ]
    assert got == _brute_funnel(rows)


def test_absorbing_funnel_deterministic_path(spark, tmp_path_factory):
    # view→purchase always: one hop converts with certainty
    from hadrodb_spark.operators.pipeline16 import markov_absorbing_funnel

    d = tmp_path_factory.mktemp("funnel1")
    rows = [(i, 1, ["view", "purchase"][i % 2], 100) for i in range(8)]
    _write_events(spark, d, rows)
    res = {r.event_type: r for r in markov_absorbing_funnel(spark, str(d)).collect()}
    assert res["view"].p_hit1_ppm == 1_000_000
    assert res["purchase"].p_hit3_ppm == 1_000_000


# ------------------------------------------------------ capture-recapture
def test_capture_recapture_consistent_with_method_eval(spark, sf_dir):
    """The capture counts must equal dedup_method_eval's per-method
    detected counts on the same fixture, and Chapman must satisfy its
    closed form exactly."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.dedup import (
        capture_recapture_dedup,
        dedup_method_eval,
    )

    try:
        (row,) = capture_recapture_dedup(spark, sf_dir).collect()
        ev = {r.method: r for r in dedup_method_eval(spark, sf_dir).collect()}
        assert row.n_lsh == ev["lsh"].n_detected
        assert row.n_simhash == ev["simhash"].n_detected
        assert row.n_actual == ev["lsh"].n_truth
        assert row.n_both <= min(row.n_lsh, row.n_simhash)
        assert row.chapman_estimate == (
            (row.n_lsh + 1) * (row.n_simhash + 1)
        ) // (row.n_both + 1) - 1
    finally:
        shared.release_shared()


# ----------------------------------------------------------- privacy audits
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
_SEGS = ["AUTO", "BUILDING"]


def _write_orders_customers(spark, d, rows):
    """rows: list of (custkey, seg_idx, nation, prio_idx); one order per
    row, one customer per distinct custkey (seg/nation from first row)."""
    seen = {}
    for ck, s, n, _ in rows:
        seen.setdefault(ck, (s, n))
    spark.createDataFrame(
        [
            (i, ck, "O", 1.0, _EPOCH, _PRIORITIES[p])
            for i, (ck, _, _, p) in enumerate(rows)
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [
            (ck, _SEGS[s], n, 0.0)
            for ck, (s, n) in sorted(seen.items())
        ],
        "c_custkey LONG, c_mktsegment STRING, c_nationkey LONG,"
        " c_acctbal DOUBLE",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "customer.parquet")
    )


def _qi_counts(rows):
    seen = {}
    for ck, s, n, _ in rows:
        seen.setdefault(ck, (s, n))
    cnt = Counter()
    for ck, _, _, p in rows:
        s, n = seen[ck]
        cnt[(_SEGS[s], n, _PRIORITIES[p])] += 1
    return cnt


def _brute_ldiv(rows):
    cnt = _qi_counts(rows)
    groups = defaultdict(dict)
    for (s, n, p), c in cnt.items():
        groups[(s, n)][p] = c
    n_groups = len(groups)
    n_orders = sum(sum(g.values()) for g in groups.values())
    dls, hs, below_rows = [], [], 0
    below = 0
    for g in groups.values():
        ng = sum(g.values())
        dl = len(g)
        dls.append(dl)
        h = sum(
            (_r6(float(c) / float(ng) * math.log2(float(ng) / float(c))))
            for c in g.values()
        )
        hs.append(h)
        if dl < 3:
            below += 1
            below_rows += ng
    return (
        n_groups,
        n_orders,
        min(dls),
        below,
        float(min(hs)),
        (below_rows * 1_000_000) // n_orders,
    )


_QI_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # custkey
        st.integers(min_value=0, max_value=1),   # segment
        st.integers(min_value=0, max_value=1),   # nation
        st.integers(min_value=0, max_value=2),   # priority
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(rows=_QI_ROWS)
def test_l_diversity_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline16 import l_diversity_audit

    d = tmp_path_factory.mktemp("ldiv")
    _write_orders_customers(spark, d, rows)
    got = [tuple(r) for r in l_diversity_audit(spark, str(d)).collect()]
    assert got == [_brute_ldiv(rows)]


def _brute_tclose(rows):
    cnt = _qi_counts(rows)
    dom = sorted({p for (_, _, p) in cnt})
    k = len(dom)
    gmarg = {p: sum(c for (s, n, pp), c in cnt.items() if pp == p) for p in dom}
    n_tot = sum(gmarg.values())
    groups = sorted({(s, n) for (s, n, _) in cnt})
    out = []
    for s, n in groups:
        gc = {p: cnt.get((s, n, p), 0) for p in dom}
        ng = sum(gc.values())
        ci = gi = 0
        t_num = 0
        for p in dom:
            ci += gc[p]
            gi += gmarg[p]
            t_num += abs(n_tot * ci - ng * gi)
        t = (
            None
            if k < 2 or ng == 0
            else (t_num * 1_000_000) // ((k - 1) * ng * n_tot)
        )
        out.append((s, n, ng, t))
    return out


@settings(**_SETTINGS)
@given(rows=_QI_ROWS)
def test_t_closeness_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline16 import t_closeness_audit

    d = tmp_path_factory.mktemp("tclose")
    _write_orders_customers(spark, d, rows)
    got = [tuple(r) for r in t_closeness_audit(spark, str(d)).collect()]
    assert got == _brute_tclose(rows)


def test_t_closeness_identical_group_is_zero(spark, tmp_path_factory):
    # a group whose distribution equals the global one has EMD exactly 0
    from hadrodb_spark.operators.pipeline16 import t_closeness_audit

    d = tmp_path_factory.mktemp("tclose0")
    rows = [
        (ck, sg, 0, p)
        for sg in (0, 1)
        for ck, p in [(0 + sg * 10, 0), (1 + sg * 10, 1), (2 + sg * 10, 2)]
    ]
    _write_orders_customers(spark, d, rows)
    res = t_closeness_audit(spark, str(d)).collect()
    assert all(r.t_ppm == 0 for r in res)


# ------------------------------------------------------- nprobe recall curve
def test_nprobe_recall_curve_is_monotone(spark, sf_dir):
    """More probed cells can only add candidates: recall and result count
    must be non-decreasing in nprobe, and the 3-probe row must agree
    with what vector_topk_ivf certifies."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.similarity import ann_nprobe_recall_curve

    try:
        rows = ann_nprobe_recall_curve(spark, sf_dir).collect()
        assert [r.nprobe for r in rows] == [1, 2, 4]
        for a, b in zip(rows, rows[1:]):
            assert b.hits >= a.hits
            assert b.n_results >= a.n_results
        for r in rows:
            assert 0 <= r.hits <= r.n_results <= r.k
            assert r.recall_ppm == (1_000_000 * r.hits) // r.k
    finally:
        shared.release_shared()
