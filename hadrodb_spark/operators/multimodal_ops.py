"""Multimodal pipeline query: documents → opaque blobs → Arrow-batched
feature extraction (``mapInPandas``). The oracle reproduces the features in
SQL (md5 of utf-8 text ≡ md5 of the blob), so the hash-match proves the
Pandas-UDF path computes exactly what the declarative twin would."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.functions.multimodal import (
    documents_as_media,
    extract_features,
    resize_media,
    sample_frames,
)
from hadrodb_spark.operators.relational import load


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


ORACLE: dict[str, str] = {
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
