"""Object-store / filesystem parquet source+sink (Tier A A13-A17).

The reference uploads a pandas frame to GCS (ingest_data.py:109-113),
appends to BigQuery (:116-122), then *downloads the parquet back to
local disk* (:129-136). Spark-first: the copy steps disappear — Spark
reads and writes ``gs://`` / ``s3a://`` / ``file://`` URIs directly
through the Hadoop connectors, so "upload then re-download" is just
``write.parquet(uri)`` + ``read.parquet(uri)``. BigQuery is the same
writer with ``.format("bigquery")`` when the connector jar is on the
classpath (not in this sandbox).

The partitioned layout replaces the reference's hand-built
``{output_dir}/{color}_taxi/{year}/{month}`` directories
(ingest_data.py:20-22): ``partitionBy`` gives the identical on-disk
hierarchy plus free partition pruning on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet_partitioned(
    df: DataFrame,
    uri: str,
    partition_cols: list[str] | None = None,
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """Parquet sink with the reference's gzip compression
    (ingest_data.py:103-106) and Hive-style partition layout."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(uri)


def read_parquet_any(spark: SparkSession, uri: str) -> DataFrame:
    """Parquet scan over any supported URI scheme. Partition columns in
    the directory layout come back as real columns, and filters on them
    prune directories before any file is opened."""
    return spark.read.parquet(uri)
