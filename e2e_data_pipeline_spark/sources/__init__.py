"""Source/sink connector layer (SURVEY.md §2.1 Tier A).

Local-filesystem and HTTP-staging connectors are fully functional; the
JDBC and BigQuery connectors build correct writer/reader plans but need
a live endpoint (none in this sandbox — SURVEY.md §7 risk register), so
they are exercised structurally in tests and guarded at call time.
"""

from e2e_data_pipeline_spark.sources.staging import fetch_to_staging
from e2e_data_pipeline_spark.sources.jdbc import (
    jdbc_reader,
    jdbc_schema_only_ddl,
    jdbc_writer,
)
from e2e_data_pipeline_spark.sources.object_store import (
    apply_sink_plan,
    bigquery_sink_plan,
    gcs_parquet_sink_plan,
    read_parquet_any,
    write_parquet_partitioned,
)

__all__ = [
    "apply_sink_plan",
    "bigquery_sink_plan",
    "fetch_to_staging",
    "gcs_parquet_sink_plan",
    "jdbc_reader",
    "jdbc_schema_only_ddl",
    "jdbc_writer",
    "read_parquet_any",
    "write_parquet_partitioned",
]
