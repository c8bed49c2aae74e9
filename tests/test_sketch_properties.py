"""Semantic-guarantee tests for the sketch / featurization / training tier —
the properties the oracles' value-equality can't express on their own:
count-min NEVER undercounts (any key), bloom has NO false negatives, the
hashing trick conserves mass, BPE merge counts are monotone."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadrodb_spark.operators import pipeline5, sketch
from hadrodb_spark.operators.relational import load


def test_countmin_never_undercounts_any_key(spark, sf_dir):
    """est ≥ truth must hold for EVERY key, not just the reported top-25:
    recompute the estimate join without the LIMIT and assert the CMS
    inequality corpus-wide."""
    body = sketch._CMS_SQL[: sketch._CMS_SQL.index("ORDER BY")]
    for t in ("events",):
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    full = spark.sql(body.format(p="v_"))
    bad = full.filter(F.col("cms_est") < F.col("true_cnt")).count()
    assert bad == 0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """The (maybe=false, present=true) confusion cell must be absent —
    the one guarantee a bloom filter actually makes."""
    rows = {(r["bloom_maybe"], r["truly_present"]): r["n_customers"]
            for r in sketch.sketch_bloom(spark, sf_dir).collect()}
    assert (False, True) not in rows
    assert rows.get((True, True), 0) > 0  # members are detected


def test_feature_hashing_conserves_mass(spark, sf_dir):
    """|Σ signs| per bucket can never exceed the token count, and the
    total L1 mass across docs is bounded by the corpus token count;
    nnz ≤ dimension."""
    fh = pipeline5.feature_hashing(spark, sf_dir)
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
        )).alias("n_toks"),
    )
    joined = fh.join(toks, "doc_id")
    assert joined.filter(F.col("l1") > F.col("n_toks")).count() == 0
    assert joined.filter(F.col("nnz") > 16).count() == 0


def test_bpe_merge_counts_monotone_nonincreasing(spark, sf_dir):
    """Each BPE step merges the argmax pair of the REWRITTEN corpus, so
    step counts can only stay equal or decrease."""
    rows = sorted(
        pipeline5.bpe_train_merges(spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["merged"] == r["pair"].replace(" ", "") for r in rows)


def test_weighted_median_within_group_range(spark, sf_dir):
    from hadrodb_spark.operators import relational4 as R4

    med = {r["l_returnflag"]: r["weighted_median"]
           for r in R4.weighted_median(spark, sf_dir).collect()}
    bounds = {
        r["l_returnflag"]: (r["lo"], r["hi"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for g, m in med.items():
        lo, hi = bounds[g]
        assert lo <= m <= hi


def test_ml_minhash_recovers_planted_dups(spark, sf_dir):
    """The pyspark.ml LSH path must recover every planted near-dup pair
    and agree with the hand-built shingle-Jaccard path on what a dup is
    (noise bounded: every reported pair clears the Jaccard threshold)."""
    from hadrodb_spark.operators import dedup

    [row] = dedup.dedup_ml_minhash(spark, sf_dir).collect()
    n_planted = (
        dedup._with_near_dups(spark, sf_dir)
        .filter(F.col("doc_id") >= 100000)
        .count()
    )
    assert row["n_truth"] == n_planted > 0
    assert row["all_planted_recovered"] is True
    assert row["all_above_threshold"] is True
