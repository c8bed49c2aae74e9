"""Multimodal pipeline query: documents → opaque blobs → Arrow-batched
feature extraction (``mapInPandas``). The oracle reproduces the features in
SQL (md5 of utf-8 text ≡ md5 of the blob), so the hash-match proves the
Pandas-UDF path computes exactly what the declarative twin would."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadrodb_spark.functions.multimodal import documents_as_media, extract_features
from hadrodb_spark.operators.relational import load


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs))
    return feats.select("media_id", "kind", "n_bytes", "content_md5")


ORACLE: dict[str, str] = {
    "multimodal_features": """
        SELECT doc_id AS media_id,
               'text' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents
    """,
}
