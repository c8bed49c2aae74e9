"""Tests for relational.spread — the conditional repartition used in front
of compute-heavy projections over unsplittable single-row-group fixture
files (r12 optimization), plus partition-layout invariance of its one
current consumer (poisson_bootstrap_ci)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadrodb_spark.operators.pipeline10 import poisson_bootstrap_ci
from hadrodb_spark.operators.relational import load, spread


def test_spread_widens_narrow_plans(spark):
    df = spark.range(0, 1000, 1, 1)
    out = spread(spark, df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # row set unchanged (round-robin only moves rows)
    assert out.count() == 1000
    assert out.agg(F.sum("id")).collect()[0][0] == 499500


def test_spread_is_noop_at_target_parallelism(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, target)
    out = spread(spark, df)
    # no exchange added: the identical plan object comes back
    assert out is df


def test_poisson_bootstrap_partition_invariant(spark, sf_dir):
    """The spread in poisson_bootstrap_ci must not change the result: the
    md5-derived weights are per-row deterministic and every aggregate is
    exact-integer, so any partition layout yields the same relation."""
    import hadrodb_spark.operators.pipeline10 as P

    got = {tuple(r) for r in poisson_bootstrap_ci(spark, sf_dir).collect()}
    real_spread = P.spread
    try:
        P.spread = lambda s, d: d  # layout as the scan provides it
        want = {tuple(r) for r in poisson_bootstrap_ci(spark, sf_dir).collect()}
    finally:
        P.spread = real_spread
    assert got == want
