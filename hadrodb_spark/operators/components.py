"""Connected-components clustering of near-duplicate pairs — the step after
pairwise dedup: groups of mutually-similar documents collapse to one keeper
(the min doc_id in each component).

Spark side: iterative min-label propagation over the (tiny, pairs-only)
edge set — the standard large-graph connected-components loop. Each
iteration is one join + one aggregate; iteration count is the component
diameter (near-dup components are chains of length ≤ a few). Convergence is
checked exactly (no changed labels), with a hard cap as a safety bound.

Oracle: a DuckDB recursive CTE computing min-reachable-id — the same fixed
point, derived by transitive closure. Both engines converge to identical
labels, so this iterative, non-SQL-shaped Spark computation still gets a
full hash-match check.

Scale: edges come from LSH candidates (linear), never n². Label propagation
shuffles |V| rows per iteration; ``localCheckpoint`` truncates the growing
lineage each step — without it the plan doubles per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.operators import dedup

_MAX_ITERS = 15


def _components(edges: DataFrame) -> DataFrame:
    """Min-label connected components for an undirected edge list (a, b)."""
    both = edges.selectExpr("a AS src", "b AS dst").unionByName(
        edges.selectExpr("b AS src", "a AS dst")
    )
    labels = (
        both.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(_MAX_ITERS):
        prop = (
            both.join(labels, both.src == labels.id)
            .select(F.col("dst").alias("id"), "label")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the MinHash-LSH near-dup pairs into components: one row per
    clustered document with its component keeper (min doc_id)."""
    pairs = dedup.dedup_near(spark, sf_dir).select(
        F.col("id_a").cast("long").alias("a"), F.col("id_b").cast("long").alias("b")
    )
    labels = _components(pairs)
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("component")
    )


def dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical representative per near-dup cluster: the longest member
    (token count, doc_id tiebreak) survives; the rest map to it. The last
    stage of the dedup pipeline — LSH pairs → components → one kept doc —
    emitting per component its canonical id, member count, and kept size.

    Scale: adds one token-count join (on the clustered docs only — a tiny
    fraction of the corpus) and one rank window per component to the
    component labeling run."""
    labels = dedup_components(spark, sf_dir)
    corpus = dedup._with_near_dups(spark, sf_dir).select(
        "doc_id",
        F.size(F.expr(
            "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
        )).cast("bigint").alias("n_tokens"),
    )
    joined = labels.join(corpus, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_tokens"), F.col("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("component")).cast("bigint"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("canonical_id"),
            "n_members",
            F.col("n_tokens").alias("canonical_tokens"),
        )
    )


ORACLE: dict[str, str] = {
    # reuse dedup_near's oracle as the edge list, then transitive closure
    "dedup_components": f"""
        WITH RECURSIVE pairs AS ({dedup.ORACLE["dedup_near"]}),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
        ),
        undirected AS (
          SELECT a AS src, b AS dst FROM edges
          UNION ALL SELECT b AS src, a AS dst FROM edges
        ),
        reach(origin, node) AS (
          SELECT src, src FROM undirected
          UNION
          SELECT r.origin, u.dst FROM reach r JOIN undirected u ON u.src = r.node
        )
        SELECT origin AS doc_id, MIN(node) AS component
        FROM reach GROUP BY origin
    """,
    "dedup_canonicalize": f"""
        WITH RECURSIVE pairs AS ({dedup.ORACLE["dedup_near"]}),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
        ),
        undirected AS (
          SELECT a AS src, b AS dst FROM edges
          UNION ALL SELECT b AS src, a AS dst FROM edges
        ),
        reach(origin, node) AS (
          SELECT src, src FROM undirected
          UNION
          SELECT r.origin, u.dst FROM reach r JOIN undirected u ON u.src = r.node
        ),
        labels AS (
          SELECT origin AS doc_id, MIN(node) AS component
          FROM reach GROUP BY origin
        ),
        corpus AS (
          SELECT doc_id, CAST(len({dedup._TOKS}) AS BIGINT) AS n_tokens
          FROM ({dedup._NEAR_BASE})
        ),
        ranked AS (
          SELECT l.component, l.doc_id, c.n_tokens,
                 ROW_NUMBER() OVER (
                     PARTITION BY l.component
                     ORDER BY c.n_tokens DESC, l.doc_id
                 ) AS rn,
                 COUNT(*) OVER (PARTITION BY l.component) AS n_members
          FROM labels l JOIN corpus c ON l.doc_id = c.doc_id
        )
        SELECT component,
               doc_id AS canonical_id,
               CAST(n_members AS BIGINT) AS n_members,
               n_tokens AS canonical_tokens
        FROM ranked WHERE rn = 1
    """,
}
