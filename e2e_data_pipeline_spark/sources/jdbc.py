"""JDBC source/sink (Tier A A8/A9/A11).

The reference loads Postgres via SQLAlchemy ``to_sql`` in a hand-rolled
100k-row chunk loop (/root/reference/ingest_data.py:54-85) and reads
back with ``read_sql_table(chunksize=...)`` (:100). Spark-first:

- the chunk loop disappears — ``df.write.format("jdbc")`` writes every
  partition concurrently, with ``batchsize`` controlling per-round-trip
  rows (the 100k analog);
- the read side becomes a *partitioned* JDBC scan
  (partitionColumn/lowerBound/upperBound/numPartitions) so the read is
  parallel too, instead of a single cursor;
- schema-only DDL (ingest_data.py:52, ``head(n=0).to_sql``) is
  ``df.limit(0).write`` with mode=overwrite.

No database exists in this sandbox, so these builders return fully
configured reader/writer objects; ``.save()``/``.load()`` is the
caller's last step. Tests assert the built plans/options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

DEFAULT_BATCH_SIZE = 100_000  # reference chunk size, ingest_data.py:54-56


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> DataFrameWriter:
    """Configured JDBC writer (append mode = reference if_exists='append')."""
    w = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        w = w.option(k, v)
    return w


def jdbc_schema_only_ddl(
    df: DataFrame, url: str, table: str, **options: str
) -> DataFrameWriter:
    """Create/replace the target table from the DataFrame header only
    (0 rows) — the reference's ``df.head(n=0).to_sql(if_exists=
    'replace')`` (ingest_data.py:52)."""
    return jdbc_writer(df.limit(0), url, table, mode="overwrite", **options)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    **options: str,
) -> DataFrameReader:
    """Configured (optionally partitioned) JDBC reader."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r
