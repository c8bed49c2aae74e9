"""Sketch-style summaries expressed as relational plans — the bounded-memory
aggregation family a 100 TB pipeline leans on (the reference delegates all
query processing to its host engine, ``/root/reference/README.md:5``; Spark
ships HLL via ``approx_count_distinct`` — covered by ``agg_approx_distinct``
— but no count-min or bloom surface, so these build them from first
principles as DataFrame-plannable SQL).

Cross-engine determinism: md5 is the shared hash (the repo contract — see
operators/pipeline2.py); a "hash function" j is the 2-hex-char slice at
offset 2j of md5(key), giving 256 buckets per function with NO hex→int
conversion — bucket ids stay strings, which both engines group and join on
identically.

Scale design:

- sketch_countmin: the counter table is d×w = 4×256 rows built by one hash
  aggregation over (j, bucket) — at 100 TB this is the classic map-side-
  combinable sketch build (every partition contributes partial counts;
  the reduce is 1024 rows regardless of input size). The estimate probe
  broadcasts the 1024-row counter relation against the true top-k; the
  only unbounded shuffle is the truth aggregation the query needs anyway
  to report estimate-vs-truth. CMS guarantees est ≥ truth; the driver
  check pins the exact overestimates, not just the inequality.
- sketch_bloom: k=3 positions per key over a 256-slot bit set, built as a
  DISTINCT (j, pos) relation (≤768 rows however large the build side);
  the probe LEFT-joins that tiny relation (broadcast) and a key is
  "maybe present" iff all 3 of its positions are set. Output is the
  4-cell confusion matrix vs ground truth — the no-false-negative row
  (maybe=false ∧ present=true) must be absent, and the parity check pins
  the exact false-positive count under this hash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hadrodb_spark.operators.relational import load

_CMS_SQL = """
    WITH keyed AS (
        SELECT user_id, md5(CAST(user_id AS STRING)) AS h
        FROM {p}events
    ),
    counters AS (
        SELECT j, substring(h, 1 + 2 * j, 2) AS bucket, COUNT(*) AS c
        FROM keyed CROSS JOIN (VALUES (0), (1), (2), (3)) t(j)
        GROUP BY j, substring(h, 1 + 2 * j, 2)
    ),
    truth AS (
        SELECT user_id, h, COUNT(*) AS true_cnt
        FROM keyed
        GROUP BY user_id, h
    ),
    est AS (
        SELECT t.user_id, t.true_cnt, MIN(c.c) AS cms_est
        FROM truth t
        JOIN counters c ON c.bucket = substring(t.h, 1 + 2 * c.j, 2)
        GROUP BY t.user_id, t.true_cnt
    )
    SELECT user_id,
           CAST(true_cnt AS BIGINT) AS true_cnt,
           CAST(cms_est AS BIGINT) AS cms_est
    FROM est
    ORDER BY true_cnt DESC, user_id
    LIMIT 25
"""

_BLOOM_SQL = """
    WITH bits AS (
        SELECT DISTINCT j,
               substring(md5(CAST(o_custkey AS STRING)), 1 + 2 * j, 2) AS pos
        FROM {p}orders CROSS JOIN (VALUES (0), (1), (2)) t(j)
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= TIMESTAMP '2001-01-01'
    ),
    probe AS (
        SELECT c_custkey, md5(CAST(c_custkey AS STRING)) AS h
        FROM {p}customer
    ),
    hits AS (
        SELECT p.c_custkey, COUNT(b.pos) AS k_hit
        FROM probe p
        LEFT JOIN bits b ON b.pos = substring(p.h, 1 + 2 * b.j, 2)
        GROUP BY p.c_custkey
    ),
    verdicts AS (
        SELECT h.c_custkey,
               h.k_hit = 3 AS bloom_maybe,
               h.c_custkey IN (
                   SELECT o_custkey FROM {p}orders
                   WHERE o_orderpriority = '1-URGENT'
                     AND o_orderdate >= TIMESTAMP '2001-01-01'
               ) AS truly_present
        FROM hits h
    )
    SELECT bloom_maybe, truly_present,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM verdicts
    GROUP BY bloom_maybe, truly_present
    ORDER BY bloom_maybe, truly_present
"""


def _run(spark: SparkSession, sf_dir: str, body: str, tables: tuple[str, ...]) -> DataFrame:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(body.format(p="v_"))


def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=256) over event user_ids: build the counter
    table in one map-side-combinable aggregation, then report estimate vs
    truth for the 25 most frequent keys (CMS guarantees est ≥ truth)."""
    return _run(spark, sf_dir, _CMS_SQL, ("events",))


def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (k=3, 256 slots) for urgent-order customers:
    build the bit set as a ≤768-row DISTINCT relation, probe every
    customer, and emit the confusion matrix vs ground truth — the
    (maybe=false, present=true) cell must be empty (no false negatives)."""
    return _run(spark, sf_dir, _BLOOM_SQL, ("orders", "customer"))


ORACLE: dict[str, str] = {
    "sketch_countmin": _CMS_SQL.format(p=""),
    "sketch_bloom": _BLOOM_SQL.format(p=""),
}
