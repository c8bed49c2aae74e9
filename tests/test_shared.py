"""Shared-relation registry lifecycle: bounded, memoizing, releasable."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadrodb_spark.operators import dedup, shared


def test_shared_registry_memoizes_and_bounds(spark, sf_dir):
    shared.release_shared()
    r1 = sorted(map(tuple, dedup.dedup_near(spark, sf_dir).collect()))
    n_after_first = len(shared._REGISTRY)
    assert n_after_first >= 1
    # repeated calls reuse the persisted signature relation — no growth
    r2 = sorted(map(tuple, dedup.dedup_near(spark, sf_dir).collect()))
    assert len(shared._REGISTRY) == n_after_first
    assert r1 == r2
    # the whole dedup family shares at most one relation per (sf_dir, variant)
    dedup.dedup_containment(spark, sf_dir).collect()
    dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    assert len(shared._REGISTRY) <= 1 + n_after_first + 1


def test_release_shared_empties_registry(spark, sf_dir):
    dedup.dedup_near(spark, sf_dir).collect()
    assert shared.release_shared() >= 1
    assert len(shared._REGISTRY) == 0
    # queries still work after release (relation rebuilds on demand)
    assert dedup.dedup_near(spark, sf_dir).limit(1).collect() is not None


def test_shared_registry_evicts_lru(spark, sf_dir):
    shared.release_shared()
    docs = None
    for i in range(shared._MAX_SHARED + 3):
        key = ("test_evict", spark.sparkContext.applicationId, sf_dir, i)
        docs = shared.shared_persist(
            key, lambda: spark.range(10).withColumn("x", F.col("id") * 2)
        )
    assert len(shared._REGISTRY) == shared._MAX_SHARED
    assert docs.count() == 10
    shared.release_shared()
