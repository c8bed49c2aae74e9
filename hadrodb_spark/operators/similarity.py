"""Similarity search over the ``embeddings`` fixture (SURVEY.md §2.3):
brute-force cosine top-k (the correctness baseline) and an IVF-style
cell-probed variant (the scale path), plus embedding-cosine near-dup pairs.

Scale design:
- brute-force top-k against ONE query vector is a map-only scan + TakeOrdered
  — at 100 TB this is the correct plan (no shuffle at all).
- the IVF variant mirrors a real ANN index: partition vectors into cells
  (here the fixture's ``label`` is the cell id; in production, k-means
  centroids), compute cell centroids, probe only the nearest ``nprobe``
  cells — the scan shrinks by ncells/nprobe.
- near-dup pairs use blocking (same cell) before any pairwise math, so the
  join is |cell|² per cell, never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadrodb_spark.functions import vectors as V
from hadrodb_spark.operators.relational import load

_TOPK = 10
_QUERY_ID = 0          # embedding of vec_id 0 is the query vector
_DUP_MAX = 20          # vec_id < 20 get planted duplicate at +100000
_NEARDUP_ID_MAX = 1000 # blocking bound for the pairwise near-dup query


def vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the query vector (exact baseline)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(V.cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(_TOPK)


def vector_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: centroids per cell (label), probe the 3 nearest cells,
    exact top-k within them. Centroids use EXACT decimal element sums (cast
    through DOUBLE so both engines round the same binary value), making the
    whole plan — including probe selection — DuckDB-oracle-checkable."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    # centroid per cell: element-wise mean via posexplode + exact-decimal sum
    # (shuffles ncells×dim rows — tiny), re-assembled sorted by position
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select("label", V.cosine(F.col("centroid"), F.col("q_emb")).alias("c_sim"))
        .orderBy(F.col("c_sim").desc(), F.col("label"))
        .limit(3)
        .select("label")
    )
    scored = (
        emb.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(V.cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(_TOPK)


def _kmeans_cells(emb: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """Deterministic mini k-means over embeddings, pure DataFrame ops (no
    MLlib): init = the k lowest vec_ids, then iters of assign/update. Each
    iteration is one broadcast crossJoin (argmin over k centroids — map
    side) plus one ncells×dim aggregate — the exact shape a 100 TB index
    build uses. Returns (vec_id, cell)."""
    centroids = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid"))
    )
    for _ in range(iters):
        # assign: nearest centroid by cosine (vectors are unit-normalized)
        scored = (
            emb.crossJoin(F.broadcast(centroids))
            .withColumn("sim", V.dot(F.col("embedding"), F.col("centroid")))
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
        assign = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cell", "embedding")
        )
        # update: element-wise mean per cell
        centroids = (
            assign.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda x: x["m"]).alias("centroid"))
            .localCheckpoint()
        )
    scored = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", V.dot(F.col("embedding"), F.col("centroid")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def vector_topk_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with TRAINED cells: k-means index build + 3-cell probe + exact
    top-k within probed cells (rows-only; recall asserted by unit test)."""
    emb = load(spark, sf_dir, "embeddings")
    cells = _kmeans_cells(emb, k=8, iters=3)
    indexed = emb.join(cells, "vec_id")
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    cent = (
        indexed.select("cell", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda x: x["m"]).alias("centroid"))
    )
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select("cell", V.cosine(F.col("centroid"), F.col("q_emb")).alias("c_sim"))
        .orderBy(F.col("c_sim").desc(), F.col("cell"))
        .limit(3)
        .select("cell")
    )
    return (
        indexed.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != _QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell",
            F.round(V.cosine(F.col("embedding"), F.col("q_emb")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(_TOPK)
    )


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs with planted duplicates and same-cell
    blocking — finds each planted (v, v+100000) pair at cos≈1."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _NEARDUP_ID_MAX)
    dups = emb.filter(F.col("vec_id") < _DUP_MAX).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    base = emb.unionByName(dups)
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("lbl_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lbl_b"),
        F.col("embedding").alias("emb_b"),
    )
    return (
        a.join(b, (F.col("lbl_a") == F.col("lbl_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn(
            "cos_sim", F.round(V.cosine(F.col("emb_a"), F.col("emb_b")), 6)
        )
        .filter(F.col("cos_sim") >= 0.99)
        .select("id_a", "id_b", F.col("lbl_a").alias("label"), "cos_sim")
    )


def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding preprocessing check: dimension, L2 norm, unit-norm flag —
    the map-only hygiene pass before any similarity work."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(V.norm(F.col("embedding")), 6).alias("l2_norm"),
        (F.abs(V.norm(F.col("embedding")) - 1.0) < 0.001).alias("is_unit"),
    )


_Q = f"(SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID})"

ROWS_ONLY = ("vector_topk_kmeans_ivf",)

ORACLE: dict[str, str] = {
    "vector_topk_ivf": f"""
        WITH exploded AS (
          SELECT label, UNNEST(embedding) AS v,
                 UNNEST(generate_series(1, len(embedding))) AS pos
          FROM embeddings
        ),
        cent AS (
          SELECT label, pos,
                 CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*) AS m
          FROM exploded GROUP BY label, pos
        ),
        centv AS (
          SELECT label, array_agg(m ORDER BY pos) AS centroid
          FROM cent GROUP BY label
        ),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_QUERY_ID}),
        probed AS (
          SELECT label FROM centv, q
          ORDER BY {V.sql_cosine('centroid', 'q_emb')} DESC, label
          LIMIT 3
        )
        SELECT vec_id, label,
               ROUND({V.sql_cosine('embedding', 'q.q_emb')}, 6) AS cos_sim
        FROM embeddings JOIN probed USING (label), q
        WHERE vec_id <> {_QUERY_ID}
        ORDER BY cos_sim DESC, vec_id
        LIMIT {_TOPK}
    """,
    "vector_norms": f"""
        SELECT vec_id, label,
               CAST(len(embedding) AS BIGINT) AS dim,
               ROUND({V.sql_norm('embedding')}, 6) AS l2_norm,
               (ABS({V.sql_norm('embedding')} - 1.0) < 0.001) AS is_unit
        FROM embeddings
    """,
    "vector_topk": f"""
        SELECT vec_id, label,
               ROUND({V.sql_cosine('embedding', 'q.q_emb')}, 6) AS cos_sim
        FROM embeddings, (SELECT embedding AS q_emb FROM embeddings
                          WHERE vec_id = {_QUERY_ID}) q
        WHERE vec_id <> {_QUERY_ID}
        ORDER BY cos_sim DESC, vec_id
        LIMIT {_TOPK}
    """,
    "dedup_embedding": f"""
        WITH base AS (
          SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < {_NEARDUP_ID_MAX}
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, label, embedding FROM embeddings
          WHERE vec_id < {_DUP_MAX}
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
               ROUND({V.sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
        FROM base a JOIN base b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND({V.sql_cosine('a.embedding', 'b.embedding')}, 6) >= 0.99
    """,
}
