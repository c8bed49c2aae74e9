"""Behavioral tests for LLM-pipeline operators beyond the DuckDB oracle:
ANN recall, planted-duplicate discovery, decode-stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadrodb_spark.functions import multimodal as MM
from hadrodb_spark.operators import dedup, similarity


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    exact = {r["vec_id"] for r in similarity.vector_topk(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in similarity.vector_topk_ivf(spark, sf_dir).collect()}
    # IVF probes 3/10 cells; recall@10 must be well above random (3/10)
    assert len(approx) == 10
    assert len(exact & approx) >= 5


def test_dedup_near_finds_planted_mutants(spark, sf_dir):
    pairs = dedup.dedup_near(spark, sf_dir).collect()
    planted = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] == r["id_a"] + 100000}
    # every planted near-dup (last token dropped) should be caught
    n_planted_expected = (
        dedup._with_near_dups(spark, sf_dir).filter(F.col("doc_id") >= 100000).count()
    )
    assert n_planted_expected > 0
    assert len(planted) >= int(0.8 * n_planted_expected)


def test_dedup_exact_finds_planted_copies(spark, sf_dir):
    groups = dedup.dedup_exact(spark, sf_dir).collect()
    assert all(g["n_copies"] >= 2 for g in groups)
    assert any(g["keeper"] % dedup._EXACT_MOD == 0 for g in groups)


def test_dedup_embedding_finds_planted_vectors(spark, sf_dir):
    pairs = similarity.dedup_embedding(spark, sf_dir).collect()
    planted = {(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] == r["id_a"] + 100000}
    assert len(planted) == similarity._DUP_MAX  # every planted dup found at cos=1
    assert all(abs(r["cos_sim"] - 1.0) < 1e-4 or r["id_b"] < 100000 for r in pairs)


def test_decode_stubs_raise(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"RIFF")
    with pytest.raises(NotImplementedError):
        MM.sample_video_frames(b"\x00")


def test_media_schema_roundtrip(spark, sf_dir):
    from hadrodb_spark.operators.relational import load

    media = MM.documents_as_media(load(spark, sf_dir, "documents").limit(50))
    assert media.schema == MM.MEDIA_SCHEMA or [f.name for f in media.schema.fields] == [
        f.name for f in MM.MEDIA_SCHEMA.fields
    ]
    feats = MM.extract_features(media).collect()
    assert len(feats) == 50
    assert all(f["n_bytes"] > 0 and len(f["content_md5"]) == 32 for f in feats)


def test_approx_distinct_error_bound(spark, sf_dir):
    from hadrodb_spark.operators.relational2 import agg_approx_distinct

    rows = agg_approx_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the bound |approx - exact| <= 5*rsd*exact is asserted in-query
        assert r["within_bound"] is True
        assert r["exact_parts"] > 0


def test_kmeans_ivf_recall(spark, sf_dir):
    [row] = similarity.vector_topk_kmeans_ivf(spark, sf_dir).collect()
    assert row["k"] == 10 and row["count_ok"] is True
    # 3/8 cells probed; measured recall 8-10 of 10, asserted in-query
    assert row["recall_ok"] is True


def test_lang_id_classifies_planted_docs(spark, sf_dir):
    from hadrodb_spark.operators.textops import lang_id

    rows = {r["doc_id"]: r for r in lang_id(spark, sf_dir).collect() if r["doc_id"] >= 300000}
    assert len(rows) == 4
    for r in rows.values():
        assert r["pred_lang"] == r["labeled_lang"], r


def test_sq_and_pq_recall_vs_brute_force(spark, sf_dir):
    """Quantized ANN variants must rank real neighbors, not noise. The
    fixture vectors are near-random (brute-force top-1 cosine ≈ 0.33 with a
    FLAT tail), so absolute recall is the quantizer's information limit,
    not a bug bar: SQ (32 B/vec) reconstructs well enough for full recall;
    PQ (16 B/vec) is asserted above chance (random 30-of-500 preselect
    would overlap the exact top-10 by 0.6 in expectation; measured 2-9
    across fixtures). The exact rerank guarantees preselect∩exact always
    survives to the final 10."""
    exact = {r["vec_id"] for r in similarity.vector_topk(spark, sf_dir).collect()}
    sq = {r["vec_id"] for r in similarity.vector_topk_sq(spark, sf_dir).collect()}
    pq = {r["vec_id"] for r in similarity.vector_topk_pq(spark, sf_dir).collect()}
    assert len(sq) == 10 and len(pq) == 10
    assert len(exact & sq) >= 5
    assert len(exact & pq) >= 2


def test_approx_quantiles_error_bound(spark, sf_dir):
    from hadrodb_spark.operators import pipeline2, pipeline3

    exact = {
        r["l_returnflag"]: r for r in pipeline2.profile_quantiles(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in pipeline3.profile_quantiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        assert a["n_rows"] == e["n_rows"]
        # the rank-bracket bound is asserted in-query; the exact quartiles
        # must agree with the independent profile_quantiles computation
        for col in ("q1_ok", "median_ok", "q3_ok"):
            assert a[col] is True, (flag, col)
        for pair in (("q1_exact", "q1"), ("median_exact", "median"), ("q3_exact", "q3")):
            assert abs(a[pair[0]] - e[pair[1]]) < 1e-6, (flag, pair)


def test_dedup_threshold_curve_separates_planted_mass(spark, sf_dir):
    """The tuning curve must put every planted near-mutant pair in a
    high-Jaccard bucket (>= 0.5 → bucket >= 10) and keep bucket
    populations consistent (planted <= total, buckets within [0, 19])."""
    rows = dedup.dedup_threshold_curve(spark, sf_dir).collect()
    assert rows, "curve empty"
    for r in rows:
        assert 0 <= r["bucket"] <= 19
        assert 0 <= r["n_planted"] <= r["n_pairs"]
        assert r["jaccard_lo_ppm"] == r["bucket"] * 50000
    planted_low = sum(r["n_planted"] for r in rows if r["bucket"] < 10)
    planted_total = sum(r["n_planted"] for r in rows)
    assert planted_total > 0, rows
    assert planted_low == 0, rows
