"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for
the 1000-executor / 100 TB case and merely *also* works locally:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  broadcast decisions survive a 100x scale-up where static plans don't).
- Arrow enabled for the pandas-UDF paths (vectorized Python transfer).
- Session timezone pinned to UTC so timestamp semantics are identical
  across engines (and match the DuckDB oracle).
- ``spark.sql.shuffle.partitions`` small locally; on a real cluster AQE
  coalesces from a high initial number, so we set the *initial* number
  from the environment rather than hardcoding cluster assumptions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "e2e-data-pipeline-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet timestamps in the fixtures are naive (isAdjustedToUTC
        # = false). Read them as TIMESTAMP_NTZ so no session-timezone
        # shift is ever applied — matches DuckDB's naive TIMESTAMP.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Some fixture generations store events.ts as parquet
        # TIMESTAMP(NANOS), which Spark's vectorized reader rejects
        # outright. Read nanos as int64 and derive a microsecond
        # timestamp in the catalog (matches DuckDB, which truncates
        # ns→us on read). Harmless when the fixture ships MICROS — the
        # conf only affects NANOS columns, and catalog.load_table
        # branches on the dtype actually read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Catalyst analyzes/optimizes expression trees recursively on
        # py4j handler threads; the wide-decimal limb-split projections
        # (registry.wide_dbl — dq_outlier_votes stacks three of them)
        # sit near the default 1 MB thread stack and overflow
        # nondeterministically depending on the caller's stack depth
        # (observed under pytest, not under a bare driver). 16 MB is
        # the standard remedy and applies to every NEW JVM thread.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-Xss16m"),
        )
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    return builder.getOrCreate()
