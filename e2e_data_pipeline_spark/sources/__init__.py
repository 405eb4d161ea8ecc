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
    read_parquet_any,
    write_parquet_partitioned,
)

__all__ = [
    "fetch_to_staging",
    "jdbc_reader",
    "jdbc_schema_only_ddl",
    "jdbc_writer",
    "read_parquet_any",
    "write_parquet_partitioned",
]
