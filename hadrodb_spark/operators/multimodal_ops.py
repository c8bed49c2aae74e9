"""Multimodal pipeline query: documents → opaque blobs → Arrow-batched
feature extraction (``mapInPandas``). The oracle reproduces the features in
SQL (md5 of utf-8 text ≡ md5 of the blob), so the hash-match proves the
Pandas-UDF path computes exactly what the declarative twin would."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.functions.multimodal import (
    N_TILES,
    documents_as_media,
    extract_features,
    resize_media,
    sample_frames,
    tile_hashes,
)
from hadrodb_spark.operators.relational import load
from hadrodb_spark.operators.shared import shared_persist

# Same-length single-character mutation for the planted perceptual
# near-dups — ONE shared text so Spark and the oracle mutate identically;
# preserving length keeps tile boundaries stable, so exactly one tile's
# fingerprint changes.
_MUT = (
    "CASE WHEN length(text) >= 10"
    " THEN substr(text, 1, 9) || '~' || substr(text, 11)"
    " ELSE text END"
)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs))
    return feats.select("media_id", "kind", "n_bytes", "content_md5")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-fake resize over Arrow batches (1→1); the oracle
    recomputes the truncation declaratively, proving the Pandas path."""
    docs = load(spark, sf_dir, "documents")
    return resize_media(documents_as_media(docs))


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-fake frame sampling (1→N row expansion inside
    mapInPandas) — every 4th 64-char pseudo-frame per document."""
    docs = load(spark, sf_dir, "documents")
    return sample_frames(documents_as_media(docs))


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup of opaque media blobs: byte-level md5 groupBy —
    the decode-free exact-dedup plan for image/audio corpora (identical
    bytes ⇒ identical asset, no pixel decode needed). Planted duplicate
    blobs at media_id+200000 make the check non-vacuous; one hash shuffle,
    the dedup_exact plan over binary."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    copies = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    media = documents_as_media(docs.unionByName(copies))
    return (
        media.groupBy(F.md5("blob").alias("content_md5"))
        .agg(
            F.min("media_id").alias("keeper"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over opaque media blobs: the Arrow
    UDF computes 8 per-tile content fingerprints per asset (the
    decode+tile-hash step a real image near-dup system runs over DCT/aHash
    signatures — codec swap-in point ``decode_image``), then a banded
    self-join (4 bands × 2 tiles) blocks candidates and an exact tile
    comparison keeps pairs differing in ≤ 1 tile.  Complements
    ``multimodal_dedup``'s byte-exact matching: a re-encoded or
    slightly-edited asset changes its md5 but not 7 of its 8 tiles.

    Planted same-length single-char mutants at media_id+300000 (shared
    mutation text with the oracle) guarantee true near-dups exist and
    differ in EXACTLY one tile.

    Scale shape: tile hashing is one Arrow pass (map-only); blocking is
    the LSH band discipline — candidates only ever come from shared-band
    buckets (a ≤1-tile difference forces ≥3 of 4 bands identical, so
    recall on true near-dups is structural, pigeonhole, not
    probabilistic); the verify step joins the 8-hash arrays back for
    candidates only.  No all-pairs anywhere.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    mutants = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .withColumn("text", F.expr(_MUT))
        .withColumn("doc_id", F.col("doc_id") + 300000)
    )
    media = documents_as_media(docs.unionByName(mutants))
    # Persist the tile relation: three plan subtrees consume it (bands,
    # tiles_a, tiles_b) and would otherwise each re-run the Arrow
    # decode+hash pass over the full corpus.  NULL-tile assets (NULL
    # blob) are dropped HERE: they can never be near-dups, and leaving
    # them in gives Spark's concat_ws an empty-string band value (DuckDB's
    # || yields NULL) — every NULL asset landing in ONE bucket is the
    # quadratic blow-up the banding exists to avoid.
    tl = shared_persist(
        ("phash_tiles", spark.sparkContext.applicationId, sf_dir),
        lambda: tile_hashes(media).filter(F.col("tiles").isNotNull()),
    )
    bands = tl.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.concat_ws(
                            "|", F.col("tiles")[2 * i], F.col("tiles")[2 * i + 1]
                        ).alias("band_val"),
                    )
                    for i in range(N_TILES // 2)
                ]
            )
        ).alias("b"),
    ).select("media_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_val").alias("band_val"))
    left = bands.select(
        F.col("media_id").alias("id_a"), "band_idx", "band_val"
    )
    right = bands.select(
        F.col("media_id").alias("id_b"), "band_idx", "band_val"
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ta = tl.select(F.col("media_id").alias("id_a"), F.col("tiles").alias("tiles_a"))
    tb = tl.select(F.col("media_id").alias("id_b"), F.col("tiles").alias("tiles_b"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with(
                    "tiles_a",
                    "tiles_b",
                    lambda x, y: F.when(x != y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("bigint").alias("n_diff_tiles"),
        )
        .filter(F.col("n_diff_tiles") <= 1)
        .orderBy("id_a", "id_b")
    )


def _phash_tiles_sql() -> str:
    """The oracle's tile array: N_TILES md5(substr(...)) entries over the
    SAME ceil-width character tiling the Arrow UDF computes (one shared
    constant — the UDF, the banding, and this SQL all derive from it)."""
    tiles = ", ".join(
        f"md5(substr(text, {i} * w + 1, w))" for i in range(N_TILES)
    )
    return f"[{tiles}]"


ORACLE: dict[str, str] = {
    "multimodal_phash_neardup": f"""
        WITH m AS (
          SELECT doc_id AS media_id, text FROM documents
          UNION ALL
          SELECT doc_id + 300000, {_MUT} FROM documents WHERE doc_id % 50 = 0
        ),
        tl AS (
          SELECT media_id, {_phash_tiles_sql()} AS tiles
          FROM (SELECT media_id, text,
                       CAST(CEIL(length(text) / {float(N_TILES)}) AS BIGINT) AS w
                FROM m)
        ),
        bands AS (
          SELECT media_id,
                 b.i AS band_idx,
                 tiles[2 * b.i + 1] || '|' || tiles[2 * b.i + 2] AS band_val
          FROM tl, (SELECT UNNEST(generate_series(0, {N_TILES // 2 - 1})) AS i) b
        ),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
          FROM bands a
          JOIN bands b ON a.band_idx = b.band_idx
                      AND a.band_val = b.band_val
                      AND a.media_id < b.media_id
        )
        SELECT id_a, id_b,
               CAST(len(list_filter(list_zip(ta.tiles, tb.tiles),
                                    t -> t[1] <> t[2])) AS BIGINT)
                 AS n_diff_tiles
        FROM cand
        JOIN tl ta ON ta.media_id = cand.id_a
        JOIN tl tb ON tb.media_id = cand.id_b
        WHERE len(list_filter(list_zip(ta.tiles, tb.tiles),
                              t -> t[1] <> t[2])) <= 1
        ORDER BY id_a, id_b
    """,
    "multimodal_dedup": """
        WITH media AS (
          SELECT doc_id AS media_id, text FROM documents
          UNION ALL
          SELECT doc_id + 200000, text FROM documents WHERE doc_id % 50 = 0
        )
        SELECT md5(text) AS content_md5,
               MIN(media_id) AS keeper,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM media
        GROUP BY md5(text)
        HAVING COUNT(*) > 1
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               'text' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
    """,
    "multimodal_resize": """
        SELECT doc_id AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
               CAST(octet_length(encode(substr(text, 1, 200))) AS BIGINT)
                 AS resized_bytes,
               md5(substr(text, 1, 200)) AS resized_md5
        FROM documents
    """,
    "multimodal_frames": """
        SELECT doc_id AS media_id,
               CAST(f.i AS BIGINT) AS frame_idx,
               md5(substr(text, CAST(f.i * 64 + 1 AS BIGINT), 64)) AS frame_md5
        FROM documents,
             LATERAL (
               SELECT UNNEST(generate_series(
                 0, CAST(CEIL(length(text) / 64.0) AS BIGINT) - 1)) AS i
             ) f
        WHERE f.i % 4 = 0
    """,
}
