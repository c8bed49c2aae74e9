"""Bucketed tables — Spark's co-located join primitive (the analog of the
reference's planned secondary indexes for JOIN access paths, SURVEY §2.1 S17).

Writing both sides bucketed by the join key into the same bucket count lets
SortMergeJoin read co-located buckets with NO Exchange on either side — at
100 TB this removes the dominant cost of repeated fact⋈fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an in-memory catalog forgets tables across sessions but their
    # warehouse directories survive — clear any orphaned location
    import shutil

    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    shutil.rmtree(f"{loc}/{table}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free."""
    return spark.table(left).join(spark.table(right), key)
