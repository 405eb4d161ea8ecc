"""Fixture-table catalog: parquet readers with pinned schemas.

``load_table`` is the single entry point every operator uses to scan a
fixture table. Reading through one function keeps the scan declarative
(plain ``spark.read.parquet``) so Catalyst retains predicate pushdown
and column pruning — callers ``select``/``where`` on the returned
DataFrame and the parquet scan only materializes what survives.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e2e_data_pipeline_spark.schemas import TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table as a DataFrame.

    The schema is *not* passed to ``spark.read.schema(...)`` on purpose:
    parquet already carries its own schema, and supplying a slightly
    different one (e.g. TIMESTAMP vs TIMESTAMP_NTZ) would force a
    rebase/convert. We validate against :data:`TABLES` instead.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {sorted(TABLES)}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) surfaced as int64 nanos (see
        # session.py nanosAsLong note). Truncate ns→us — exactly what
        # DuckDB does when it casts the column to TIMESTAMP — and keep
        # it NTZ so no session-timezone shift applies.
        # `div` (integer division) — a plain `/` goes through DOUBLE,
        # which cannot represent ~1.7e18 ns exactly and corrupts the
        # low microseconds.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
