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
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_PKG_DIR)


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make ``e2e_data_pipeline_spark`` importable on Python workers
    regardless of the driver's cwd.

    ~23 operators ship pickled functions (Python DataSources, UDTFs,
    Arrow codec ``mapInPandas`` bodies, ``scan_avro_py``) that
    cloudpickle serializes BY REFERENCE — the worker re-imports the
    module. Workers inherit neither the driver's ``sys.path`` nor its
    cwd, so a driver launched outside the repo root used to fail
    worker-side with ModuleNotFoundError (round-7 verdict item 2).

    ``addPyFile`` of a package zip is the remedy that (a) works on an
    already-running bare session the driver built itself and (b) is
    the same mechanism that ships the package to a real 1000-executor
    cluster. Idempotent per SparkContext; the zip is rebuilt per
    process and written atomically so concurrent sessions can't race.
    """
    sc = spark.sparkContext
    if getattr(sc, "_e2e_pyfile_added", False):
        return
    zpath = os.path.join(
        tempfile.gettempdir(), f"e2e_data_pipeline_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for dirpath, _dirs, files in os.walk(_PKG_DIR):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fname)
                    z.write(full, os.path.relpath(full, _REPO_ROOT))
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._e2e_pyfile_added = True


def get_spark(app_name: str = "e2e-data-pipeline-spark") -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Belt next to the addPyFile suspenders: our own sessions also put
    # the repo root on every worker's PYTHONPATH (local-mode daemons
    # inherit the driver env; real executors read executorEnv).
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + pp if pp else "")
        )
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
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    )
    spark = builder.getOrCreate()
    ensure_worker_imports(spark)
    return spark
