"""Property tests for the round-8 additions: brute-force mirrors of
``dsir_importance`` and ``bigram_xent`` on adversarial tiny inputs the
parquet fixtures never produce (all-target corpora, empty raw pools,
token-free documents, single-bigram docs), plus the shared-truth reuse
contract of the ANN audits.

Float discipline in the brute mirrors: Spark's ROUND is HALF-UP on the
double's decimal rendering, Python's round() is banker's — so every
rounding here goes through Decimal(str(x)).quantize(..., ROUND_HALF_UP)
(the NEXT.md ema_per_user lesson)."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hadrodb_spark.operators.pipeline13 import (
    _DSIR_BUCKETS,
    _DSIR_TARGET,
    _DSIR_TOPK,
    bigram_xent,
    dsir_importance,
)

import pytest

# Slow tier (hypothesis bruteforce property suite): deselected by the
# default `-m 'not slow'` addopts; run via `pytest -m 'slow or not slow'`.
pytestmark = pytest.mark.slow

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


def _r6(x: float) -> Decimal:
    return Decimal(str(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _toks(text: str) -> list[str]:
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _bucket(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:4], 16) % _DSIR_BUCKETS


doc = st.tuples(
    st.sampled_from([_DSIR_TARGET, "srcA", "srcB"]),
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
)


def _brute_dsir(data):
    """(doc_id, source, text) rows -> expected top-K output tuples."""
    nt = {}
    nr = {}
    per_doc = {}
    for i, (src, text) in enumerate(data):
        is_t = src == _DSIR_TARGET
        for t in _toks(text):
            b = _bucket(t)
            (nt if is_t else nr)[b] = (nt if is_t else nr).get(b, 0) + 1
            if not is_t:
                per_doc.setdefault(i, {})[b] = per_doc.get(i, {}).get(b, 0) + 1
    nt_tot, nr_tot = sum(nt.values()), sum(nr.values())
    lr = {
        b: _r6(
            math.log(
                (float(nt.get(b, 0) + 1) * float(nr_tot + _DSIR_BUCKETS))
                / (float(nr.get(b, 0) + 1) * float(nt_tot + _DSIR_BUCKETS))
            )
        )
        for b in set(nt) | set(nr)
    }
    rows = []
    for i, bs in per_doc.items():
        n_tokens = sum(bs.values())
        logw = sum(c * lr[b] for b, c in bs.items())
        rows.append((i, data[i][0], n_tokens, float(logw)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:_DSIR_TOPK]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(doc, min_size=1, max_size=25))
def test_dsir_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("dsir")
    spark.createDataFrame(
        [(i, src, text, "en", len(text)) for i, (src, text) in enumerate(data)],
        "doc_id LONG, source STRING, text STRING, lang STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in dsir_importance(spark, str(d)).collect()]
    assert got == _brute_dsir(data)


def _brute_bigram(data):
    grams = {}
    ctx = {}
    per_doc = {}
    vocab = set()
    for i, text in enumerate(data):
        ts = _toks(text)
        vocab.update(ts)
        if len(ts) < 2:
            continue
        for a, b in zip(ts, ts[1:]):
            bg = f"{a} {b}"
            grams[bg] = grams.get(bg, 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
            per_doc.setdefault(i, {})[bg] = per_doc.get(i, {}).get(bg, 0) + 1
    v = len(vocab)
    rows = []
    for i, bgs in per_doc.items():
        n = sum(bgs.values())
        s = sum(
            c * _r6(math.log(float(ctx[bg.split(" ")[0]] + v) / float(grams[bg] + 1)))
            for bg, c in bgs.items()
        )
        rows.append((i, n, float(_r6(float(s) / n))))
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows[:20]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=6).map(" ".join),
        min_size=1,
        max_size=20,
    )
)
def test_bigram_xent_matches_bruteforce(spark, tmp_path_factory, data):
    d = tmp_path_factory.mktemp("bgx")
    spark.createDataFrame(
        [(i, text, "en", "src0", len(text)) for i, text in enumerate(data)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [tuple(r) for r in bigram_xent(spark, str(d)).collect()]
    assert got == _brute_bigram(data)


def test_ann_audits_share_one_truth_relation(spark, sf_dir):
    """ann_recall_audit and dim_truncation_recall must resolve the SAME
    persisted truth (one brute scan per app+sf), via the single
    _shared_ann_truth helper — the round-8 review's drift guard."""
    from hadrodb_spark.operators import shared
    from hadrodb_spark.operators.similarity import (
        ann_recall_audit,
        dim_truncation_recall,
    )

    key = ("ann_truth", spark.sparkContext.applicationId, sf_dir)
    shared.release_shared()
    ann_recall_audit(spark, sf_dir).collect()
    dim_truncation_recall(spark, sf_dir).collect()
    with shared._LOCK:
        hits = [k for k in shared._REGISTRY if k == key]
    assert len(hits) == 1
