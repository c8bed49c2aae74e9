"""Property tests for the pipeline15 statistical-audit tier 2:
brute-force mirrors of the Kruskal-Wallis doubled-midrank algebra, the
Kendall tau-b dominance-grid pair counting, the Brown-Forsythe
median-deviation ANOVA, and the split-conformal quantile/coverage
bookkeeping on adversarial tiny inputs (single groups, all-tied values,
NULLs, values crossing the censoring cap, empty test halves) — plus a
planted-collapse check for the embedding pair-cosine histogram.

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

from hadrodb_spark.operators.pipeline15 import (
    _PAIR_K,
    _TAU_CAP,
    conformal_coverage_audit,
    embedding_pair_cosine_hist,
    kendall_tau_censored,
    kruskal_wallis_value,
    levene_variance_homogeneity,
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


def _r6(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _write_events(spark, d, rows):
    """rows: list of (event_id, event_type, cents-or-None)."""
    spark.createDataFrame(
        [
            (i, t, None if c is None else c / 100.0, _EPOCH)
            for i, t, c in rows
        ],
        "event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))


# ------------------------------------------------------------ kruskal-wallis
def _brute_kw(rows):
    vals = [(t, c) for _, t, c in rows if c is not None]
    if not vals:
        return []
    allc = sorted(c for _, c in vals)
    n = len(allc)
    ct = Counter(allc)
    types = sorted({t for t, _ in vals})
    k = len(types)
    tie_sum = sum(c * c * c - c for c in ct.values())
    per = []
    term_sum = Decimal(0)
    for t in types:
        mine = [c for tt, c in vals if tt == t]
        n_i = len(mine)
        two_r = sum(
            2 * sum(1 for x in allc if x < v) + ct[v] + 1 for v in mine
        )
        term = _r6(float(two_r) * float(two_r) / 4.0 / float(n_i))
        term_sum += term
        per.append((t, n_i, two_r))
    if n <= 1:
        h = None
    else:
        h = float(
            _r6(
                12.0
                * float(term_sum)
                / (float(n) * (float(n) + 1.0))
                - 3.0 * (float(n) + 1.0)
            )
        )
    if h is None or tie_sum == n * n * n - n:
        hc = None
    else:
        hc = float(
            _r6(
                h
                / (
                    1.0
                    - float(tie_sum)
                    / (float(n) * float(n) * float(n) - float(n))
                )
            )
        )
    return [(t, n_i, two_r, k, n, h, hc) for t, n_i, two_r in per]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click", "view"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_kruskal_wallis_matches_bruteforce(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("kw")
    _write_events(spark, d, [(i, t, c) for i, (t, c) in enumerate(rows)])
    got = [tuple(r) for r in kruskal_wallis_value(spark, str(d)).collect()]
    assert got == _brute_kw([(i, t, c) for i, (t, c) in enumerate(rows)])


# --------------------------------------------------------------- kendall tau
def _brute_tau(docs):
    pts = [(min(x, _TAU_CAP), min(y, _TAU_CAP)) for x, y in docs]
    n = len(pts)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx == 0 or dy == 0:
                continue
            if (dx > 0) == (dy > 0):
                conc += 1
            else:
                disc += 1
    cx = Counter(x for x, _ in pts)
    cy = Counter(y for _, y in pts)
    t2x = sum(c * (c - 1) for c in cx.values())
    t2y = sum(c * (c - 1) for c in cy.values())
    np2 = n * (n - 1)
    if np2 - t2x <= 0 or np2 - t2y <= 0:
        tau = None
    else:
        tau = float(
            _r6(
                2.0
                * (float(conc) - float(disc))
                / math.sqrt(
                    (float(np2) - float(t2x)) * (float(np2) - float(t2y))
                )
            )
        )
    return [(n, conc, disc, t2x, t2y, np2, tau)]


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),  # crosses the 511 cap
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_kendall_tau_matches_bruteforce(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp("tau")
    spark.createDataFrame(
        [
            (i, "w " * y, "en", "s", x)
            for i, (x, y) in enumerate(docs)
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in kendall_tau_censored(spark, str(d)).collect()]
    assert got == _brute_tau(docs)


# ------------------------------------------------------------------- levene
def _pdisc(sorted_vals, p):
    """percentile_disc: smallest value whose cumulative share ≥ p."""
    n = len(sorted_vals)
    return sorted_vals[math.ceil(p * n) - 1]


def _brute_levene(rows):
    vals = [(t, c) for _, t, c in rows if c is not None]
    if not vals:
        return []
    types = sorted({t for t, _ in vals})
    k = len(types)
    n = len(vals)
    s_tot = Decimal(0)
    q_tot = Decimal(0)
    ssw = Decimal(0)
    for t in types:
        mine = sorted(c for tt, c in vals if tt == t)
        med = _pdisc(mine, 0.5)
        zs = [abs(c - med) for c in mine]
        ni, si, qi = len(zs), sum(zs), sum(z * z for z in zs)
        s_tot += si
        q_tot += qi
        ssw += _r6(float(ni * qi - si * si) / float(ni))
    if ssw == 0 or k == 1 or n == k:
        w = None
    else:
        w = float(
            _r6(
                (
                    (
                        float(q_tot)
                        - float(s_tot) * float(s_tot) / float(n)
                    )
                    - float(ssw)
                )
                / (k - 1)
                / (float(ssw) / (n - k))
            )
        )
    return [(k, n, k - 1, n - k, w)]


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_levene_matches_bruteforce(spark, tmp_path_factory, rows):
    rows = [(i, t, c) for i, (t, c) in enumerate(rows)]
    if all(c is None for _, _, c in rows):
        return  # empty statistic: the aggregate relation has no rows
    d = tmp_path_factory.mktemp("lev")
    _write_events(spark, d, rows)
    got = [tuple(r) for r in levene_variance_homogeneity(spark, str(d)).collect()]
    assert got == _brute_levene(rows)


def test_levene_all_tied_is_null(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("lev0")
    _write_events(
        spark, d, [(i, "click" if i % 2 else "view", 500) for i in range(12)]
    )
    (row,) = levene_variance_homogeneity(spark, str(d)).collect()
    assert row["w_stat"] is None  # zero within-group deviation everywhere


# ---------------------------------------------------------------- conformal
def _brute_conformal(rows):
    vals = [(i, t, c) for i, t, c in rows if c is not None]
    types = sorted({t for _, t, _ in vals})
    out = []
    for t in types:
        cal = sorted(c for i, tt, c in vals if tt == t and i % 2 == 0)
        test = [c for i, tt, c in vals if tt == t and i % 2 == 1]
        n_cal, n_test = len(cal), len(test)
        k = (9 * (n_cal + 1) + 9) // 10
        qhat = cal[k - 1] if k <= n_cal else None
        if n_test == 0:
            cov = None
        elif qhat is None:
            cov = 1000000
        else:
            cov = sum(1 for c in test if c <= qhat) * 1000000 // n_test
        out.append((t, n_cal, n_test, k, qhat, cov))
    return out


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["purchase", "click", "view"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_conformal_matches_bruteforce(spark, tmp_path_factory, rows):
    rows = [(i, t, c) for i, (t, c) in enumerate(rows)]
    d = tmp_path_factory.mktemp("conf")
    _write_events(spark, d, rows)
    got = [tuple(r) for r in conformal_coverage_audit(spark, str(d)).collect()]
    assert got == _brute_conformal(rows)


# ----------------------------------------------------- pair-cosine histogram
def _write_embeddings(spark, d, vecs):
    spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    ).coalesce(2).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))


def test_pair_cosine_hist_planted_collapse(spark, tmp_path_factory):
    """A fully collapsed space (every vector identical) must put all 256
    pairs in the +1.0 bin with exactly-10⁶-ppm share — the diagnostic the
    histogram exists to surface."""
    d = tmp_path_factory.mktemp("cosA")
    _write_embeddings(spark, d, [[0.5, 0.25, 0.125, 1.0]] * (2 * _PAIR_K + 77))
    got = [tuple(r) for r in embedding_pair_cosine_hist(spark, str(d)).collect()]
    assert got == [(10, _PAIR_K, 1000000)]


def test_pair_cosine_hist_structure_and_determinism(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cosB")
    # deterministic non-collapsed vectors, all coordinates dyadic (exact
    # in float32): direction varies with vec_id
    vecs = [
        [((i * 7 + j * 13) % 31 - 15) / 16.0 for j in range(8)]
        for i in range(2 * _PAIR_K + 50)
    ]
    _write_embeddings(spark, d, vecs)
    got = [tuple(r) for r in embedding_pair_cosine_hist(spark, str(d)).collect()]
    assert sum(r[1] for r in got) == _PAIR_K
    assert all(-10 <= r[0] <= 10 for r in got)
    assert all(r[2] == r[1] * 1000000 // _PAIR_K for r in got)
    assert len({r[0] for r in got}) > 1  # genuinely spread, not collapsed
    again = [
        tuple(r) for r in embedding_pair_cosine_hist(spark, str(d)).collect()
    ]
    assert got == again


# ------------------------------------------------------------- cochran's Q
def _brute_cochran(docs):
    """docs: list of (n_chars, token list)."""
    n = len(docs)
    g1s = g2s = g3s = ll2 = 0
    for n_chars, toks in docs:
        g1 = 1 if n_chars >= 200 else 0
        g2 = 1 if 2 * len(set(toks)) >= len(toks) else 0
        g3 = 1 if len(toks) >= 40 else 0
        g1s, g2s, g3s = g1s + g1, g2s + g2, g3s + g3
        ll2 += (g1 + g2 + g3) ** 2
    gg2 = g1s * g1s + g2s * g2s + g3s * g3s
    sl = g1s + g2s + g3s
    if 3 * sl - ll2 == 0:
        q = None
    else:
        q = float(
            _r6(
                2.0
                * (3.0 * float(gg2) - float(sl) * float(sl))
                / (3.0 * float(sl) - float(ll2))
            )
        )
    return [(n, g1s, g2s, g3s, ll2, 2, q)]


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=1,
                max_size=50,
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_cochran_q_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline15 import cochran_q_gates

    d = tmp_path_factory.mktemp("cq")
    spark.createDataFrame(
        [
            (i, " ".join(toks), "en", "s", n_chars)
            for i, (n_chars, toks) in enumerate(docs)
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in cochran_q_gates(spark, str(d)).collect()]
    assert got == _brute_cochran(docs)


# --------------------------------------------------------------- flesch
def _brute_flesch(docs):
    """docs: list of (source, text) with [a-z .!?] content only."""
    import re as _re

    per = {}
    for src, text in docs:
        words = len([t for t in _re.split("[^a-z0-9]+", text.lower()) if t])
        if words == 0:
            continue
        sents = max(len(_re.findall(r"[.!?]+", text)), 1)
        sylls = len(_re.findall(r"[aeiouy]+", text.lower()))
        n, w, s, y = per.get(src, (0, 0, 0, 0))
        per[src] = (n + 1, w + words, s + sents, y + sylls)
    out = []
    for src in sorted(per):
        n, w, s, y = per[src]
        fl = float(
            _r6(206.835 - 1.015 * (float(w) / float(s)) - 84.6 * (float(y) / float(w)))
        )
        out.append((src, n, w, s, y, fl))
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB"]),
            st.text(
                alphabet=list("abcou .!?"), min_size=0, max_size=60
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_flesch_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline15 import readability_flesch

    d = tmp_path_factory.mktemp("fl")
    spark.createDataFrame(
        [(i, text, "en", src, len(text)) for i, (src, text) in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in readability_flesch(spark, str(d)).collect()]
    assert got == _brute_flesch(docs)


# ------------------------------------------------------------- jackknife
def _brute_jackknife(docs):
    """docs: list of (source, n_chars-or-None)."""
    per = {}
    for src, c in docs:
        if c is None:
            continue
        n, t = per.get(src, (0, 0))
        per[src] = (n + 1, t + c)
    n_tot = sum(n for n, _ in per.values())
    t_tot = sum(t for _, t in per.values())
    out = []
    for src in sorted(per):
        n, t = per[src]
        mean = (100 * t_tot) // n_tot
        if n_tot == n:
            loo = shift = None
        else:
            loo = (100 * (t_tot - t)) // (n_tot - n)
            shift = loo - mean
        out.append((src, n, t, mean, loo, shift))
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB", "sC"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=5000)),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_jackknife_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline15 import jackknife_source_sensitivity

    if all(c is None for _, c in docs):
        return  # empty corpus: no aggregate rows to compare
    d = tmp_path_factory.mktemp("jk")
    spark.createDataFrame(
        [(i, "t", "en", src, c) for i, (src, c) in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in jackknife_source_sensitivity(spark, str(d)).collect()]
    assert got == _brute_jackknife(docs)


# ------------------------------------------------------------ ACF lag grid
def _brute_acf(rows):
    """rows: list of (event_type, day, cents)."""
    daily = {}
    for t, day, c in rows:
        daily[(t, day)] = daily.get((t, day), 0) + c
    out = []
    types = sorted({t for t, _ in daily})
    for t in types:
        days = {d: v for (tt, d), v in daily.items() if tt == t}
        for lag in range(1, 8):
            pairs = [
                (days[d], days[d + lag]) for d in sorted(days) if d + lag in days
            ]
            if not pairs:
                continue
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            den = math.sqrt(
                float(n) * float(sxx) - float(sx) * float(sx)
            ) * math.sqrt(float(n) * float(syy) - float(sy) * float(sy))
            if den == 0.0:
                r = None
            else:
                num = float(n) * float(sxy) - float(sx) * float(sy)
                r = float(_r6(num / den))
            out.append((t, lag, n, r))
    return out


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.integers(min_value=0, max_value=12),  # epoch day
            st.integers(min_value=0, max_value=500),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_acf_grid_matches_bruteforce(spark, tmp_path_factory, rows):
    from hadrodb_spark.operators.pipeline15 import autocorr_lag_grid

    d = tmp_path_factory.mktemp("acf")
    spark.createDataFrame(
        [
            (
                i,
                t,
                c / 100.0,
                datetime.datetime(1970, 1, 1)
                + datetime.timedelta(days=day, hours=5),
            )
            for i, (t, day, c) in enumerate(rows)
        ],
        "event_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = [tuple(r) for r in autocorr_lag_grid(spark, str(d)).collect()]
    assert got == _brute_acf(rows)


# ------------------------------------------------------- graph batch (r9)
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


def test_kcore_peels_chain_keeps_clique(spark, tmp_path_factory):
    """A K5 clique (every node degree 4) plus a 4-node chain (degrees
    ≤ 2): the 3-core must be exactly the clique, reached at a fixpoint."""
    from hadrodb_spark.operators.graph import graph_kcore

    d = tmp_path_factory.mktemp("kcore")
    _write_lineitem_graph(
        spark, d, [[1, 2, 3, 4, 5], [10, 11], [11, 12], [12, 13]]
    )
    (row,) = graph_kcore(spark, str(d)).collect()
    assert tuple(row) == (3, 4, 5, 10, 4, True)


def test_kcore_cascade_needs_iteration(spark, tmp_path_factory):
    """A pendant chain hanging off a clique peels ROUND BY ROUND (each
    removal drops the next node's degree below k) — the case a single
    degree filter gets wrong and the unrolled iteration exists for."""
    from hadrodb_spark.operators.graph import graph_kcore

    d = tmp_path_factory.mktemp("kcasc")
    # K4 on {1..4}; chain 4-20-21 where 20 initially has degree 2,
    # 21 degree 1: removing 21 drops 20 to degree 1, needing round 2.
    _write_lineitem_graph(
        spark, d, [[1, 2, 3, 4], [4, 20], [20, 21], [20, 22]]
    )
    (row,) = graph_kcore(spark, str(d)).collect()
    assert tuple(row) == (3, 4, 4, 6, 3, True)


def test_kcore_convergent_beats_fixed_unroll_on_deep_fuse(spark, tmp_path_factory):
    """Planted graph whose peel depth EXCEEDS the 4 unrolled rounds
    (r9 VERDICT task #6): K4 core {1..4} plus a 6-node fuse 11..16 where
    node 11 starts at degree 2 and each removal drops exactly the next
    fuse node below k=3 — one node per round, 6 removal rounds.  The
    unrolled entry must honestly report converged=False with an
    over-counted core; ``graph_kcore_convergent`` must return the true
    3-core (exactly the K4) with converged=True."""
    from hadrodb_spark.operators.graph import graph_kcore, graph_kcore_convergent

    d = tmp_path_factory.mktemp("kdeep")
    _write_lineitem_graph(
        spark,
        d,
        # K4 + chain edges x_i—x_{i+1} + each x_i—1 (so deg(x_i)=3 while
        # x_{i-1} lives) + the chain-end anchor 16—2 (so the fuse can only
        # peel from the 11 end, one node per round)
        [[1, 2, 3, 4],
         [11, 12], [12, 13], [13, 14], [14, 15], [15, 16],
         [11, 1], [12, 1], [13, 1], [14, 1], [15, 1], [16, 1],
         [16, 2]],
    )
    (u,) = graph_kcore(spark, str(d)).collect()
    # 4 peels remove only 11..14; 16 still has degree 3 ⇒ over-counted,
    # and the flag surfaces it
    assert u["converged"] is False and u["n_core_nodes"] > 4
    (c,) = graph_kcore_convergent(spark, str(d)).collect()
    assert tuple(c) == (3, 7, 4, 6, 3, True)


def test_kcore_convergent_agrees_with_unroll_when_converged(spark, tmp_path_factory):
    """On a fixture the unroll converges on, both variants must agree on
    every field except the rounds counter."""
    from hadrodb_spark.operators.graph import graph_kcore, graph_kcore_convergent

    d = tmp_path_factory.mktemp("kagree")
    _write_lineitem_graph(
        spark, d, [[1, 2, 3, 4], [4, 20], [20, 21], [20, 22]]
    )
    (u,) = graph_kcore(spark, str(d)).collect()
    (c,) = graph_kcore_convergent(spark, str(d)).collect()
    assert u["converged"] is True and c["converged"] is True
    for f in ("k", "n_core_nodes", "n_core_edges", "min_core_degree"):
        assert u[f] == c[f]


def test_assortativity_star_vs_ring(spark, tmp_path_factory):
    from hadrodb_spark.operators.graph import graph_degree_assortativity

    d = tmp_path_factory.mktemp("star")
    _write_lineitem_graph(spark, d, [[1, k] for k in range(2, 8)])
    (row,) = graph_degree_assortativity(spark, str(d)).collect()
    assert row["n_nodes"] == 7 and row["n_edges"] == 6
    assert row["assortativity"] == -1.0  # pure hub-to-leaf mixing

    d2 = tmp_path_factory.mktemp("ring")
    _write_lineitem_graph(
        spark, d2, [[1, 2], [2, 3], [3, 4], [1, 4]]
    )
    (row2,) = graph_degree_assortativity(spark, str(d2)).collect()
    # regular graph: zero degree variance ⇒ undefined, NULL on both engines
    assert row2["assortativity"] is None


# ---------------------------------------------------------- phi matrix / ESS
def _brute_phi(docs):
    """docs: list of (n_chars, token list) — mirrors cochran's gates."""
    cells = {p: [0, 0, 0, 0] for p in ("len_ttr", "len_tok", "ttr_tok")}
    for n_chars, toks in docs:
        g1 = n_chars >= 200
        g2 = 2 * len(set(toks)) >= len(toks)
        g3 = len(toks) >= 40
        for pair, (u, v) in (
            ("len_ttr", (g1, g2)),
            ("len_tok", (g1, g3)),
            ("ttr_tok", (g2, g3)),
        ):
            idx = 0 if (u and v) else 1 if u else 2 if v else 3
            cells[pair][idx] += 1
    out = []
    for pair in sorted(cells):
        a, b, c, d = cells[pair]
        if a + b == 0 or c + d == 0 or a + c == 0 or b + d == 0:
            phi = None
        else:
            phi = float(
                _r6(
                    (float(a) * float(d) - float(b) * float(c))
                    / math.sqrt(
                        (float(a) + float(b))
                        * (float(c) + float(d))
                        * (float(a) + float(c))
                        * (float(b) + float(d))
                    )
                )
            )
        out.append((pair, a, b, c, d, phi))
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.lists(
                st.sampled_from(["aa", "bb", "cc"]), min_size=1, max_size=50
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_gate_phi_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline15 import gate_phi_matrix

    d = tmp_path_factory.mktemp("phi")
    spark.createDataFrame(
        [
            (i, " ".join(toks), "en", "s", n_chars)
            for i, (n_chars, toks) in enumerate(docs)
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in gate_phi_matrix(spark, str(d)).collect()]
    assert got == _brute_phi(docs)


def _brute_ess(docs):
    per = {}
    for src, c in docs:
        if c is None:
            continue
        w = min(c, 4096)
        n, sw, sw2 = per.get(src, (0, 0, 0))
        per[src] = (n + 1, sw + w, sw2 + w * w)
    out = []
    for src in sorted(per):
        n, sw, sw2 = per[src]
        if sw2 == 0:
            ess = ppm = None
        else:
            ess = float(_r6(float(sw) * float(sw) / float(sw2)))
            ppm = (1000000 * sw * sw) // (n * sw2)
        out.append((src, n, sw, sw2, ess, ppm))
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9000)),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_mixture_ess_matches_bruteforce(spark, tmp_path_factory, docs):
    from hadrodb_spark.operators.pipeline15 import mixture_ess

    if all(c is None for _, c in docs):
        return
    d = tmp_path_factory.mktemp("ess")
    spark.createDataFrame(
        [(i, "t", "en", src, c) for i, (src, c) in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in mixture_ess(spark, str(d)).collect()]
    assert got == _brute_ess(docs)
