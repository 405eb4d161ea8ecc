"""End-to-end ETL flow — full Tier A parity with the reference's
``main_flow`` (/root/reference/ingest_data.py:139-170), re-expressed
Spark-first.

Reference stage → this flow:

| Reference (ingest_data.py)                  | Here                         |
|---------------------------------------------|------------------------------|
| download_csv via curl (:16-26)              | fetch_to_staging (A1)        |
| chunked pd.read_csv gzip (:49,54-56)  A2/A3 | one spark.read.csv; gzip is  |
|                                             | unsplittable → repartition   |
| passenger_count != 0 filter (:34)      A4   | .where (pushed to scan)      |
| pre/post metric counts (:32,36)        A5   | Observation on the write     |
|                                             | pass (zero extra scans)      |
| column-existence guard (:67-70)        A6   | set(cols) <= df.columns      |
| to_datetime casts (:71-76)             A7   | F.to_timestamp withColumns   |
| head(0).to_sql DDL / append loop (:52,78)   | jdbc_schema_only_ddl/_writer |
|   A8/A9 — optional, no DB in sandbox        |   (built, .save() by caller) |
| per-chunk timing prints (:61,80-81)    A10  | per-stage wall-clock dict    |
| read_sql_table chunked (:100)          A11  | partitioned re-read          |
| first-chunk-only export (:102)         A12  | .limit(export_limit)         |
| to_parquet gzip (:103-106)             A13  | write_parquet_partitioned    |
| GCS upload/download (:109-113,129-136)      | direct URI read/write (A14-  |
|                                             | A16: no copy steps needed)   |
| {color}/{year}/{month} dirs (:20-22)   A17  | partitionBy(color,year,month)|
| param'd orchestration (:139-170)       A18  | main_flow(**params) + CLI    |

Scale notes: the 100k-row chunk machinery does not survive contact
with Spark — partitions already bound memory, and the JDBC batchsize
option covers the per-round-trip concern. A gzip CSV is one
unsplittable task, so the flow repartitions immediately after read
(at real scale the fix is "don't use gzip CSV"; the partitioned
parquet this flow emits IS that fix).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from e2e_data_pipeline_spark.sources import (
    fetch_to_staging,
    read_parquet_any,
    write_parquet_partitioned,
)

#: Columns cast to timestamps when present — the reference's guarded
#: tpep_*/lpep_* handling (yellow vs green schemas), ingest_data.py:67-76.
TIMESTAMP_CANDIDATES = (
    ("tpep_pickup_datetime", "tpep_dropoff_datetime"),
    ("lpep_pickup_datetime", "lpep_dropoff_datetime"),
)

FILTER_COLUMN = "passenger_count"  # ingest_data.py:32-36


@dataclass
class EtlResult:
    output_path: str
    rows_in: int
    rows_filtered: int
    rows_out: int
    exported_rows: int
    timings_s: dict[str, float] = field(default_factory=dict)


def clean(df: DataFrame) -> DataFrame:
    """A4 + A6 + A7: drop zero-passenger rows (when the column exists)
    and apply guarded timestamp casts. Schema is dynamic per input file
    exactly like the reference — both taxi colors flow through one code
    path."""
    if FILTER_COLUMN in df.columns:
        df = df.where(F.col(FILTER_COLUMN) != 0)
    for pair in TIMESTAMP_CANDIDATES:
        if set(pair) <= set(df.columns):
            df = df.withColumns({c: F.to_timestamp(F.col(c)) for c in pair})
    return df


def quality_metrics(df: DataFrame) -> dict[str, int]:
    """A5 as a standalone aggregate (kept for ad-hoc use): rows with
    passenger_count == 0, one aggregate, no collect loop. The flow
    itself uses :func:`observe_ingest` instead — zero extra passes."""
    if FILTER_COLUMN not in df.columns:
        return {"zero_passenger_rows": 0}
    row = df.agg(
        F.sum(F.when(F.col(FILTER_COLUMN).isin(0), 1).otherwise(0)).alias("z")
    ).collect()[0]
    return {"zero_passenger_rows": int(row.z or 0)}


def observe_ingest(df: DataFrame) -> tuple[DataFrame, Observation]:
    """A5 + A10, Spark-first: attach an ``Observation`` so the row
    count and the zero-passenger data-quality metric are collected
    DURING whatever action consumes the frame — at 100 TB an input is
    scanned once, not re-counted per metric. The reference pays two
    extra passes for its prints (ingest_data.py:32,36); this pays
    zero."""
    obs = Observation("ingest")
    zero = (
        F.sum(F.when(F.col(FILTER_COLUMN).isin(0), 1).otherwise(0))
        if FILTER_COLUMN in df.columns
        else F.lit(0)
    )
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            zero.alias("zero_passenger_rows"),
        ),
        obs,
    )


def main_flow(
    spark: SparkSession,
    source_url: str,
    output_dir: str,
    taxi_color: str = "green",
    year: int = 2019,
    month: int = 11,
    export_limit: int = 100_000,
    jdbc_url: str | None = None,
) -> EtlResult:
    """The reference's parametrized DAG (A18) as one driver function.

    fetch → scan → metrics → clean → partitioned gzip parquet →
    re-read (pruned) → limited export. When ``jdbc_url`` is given, the
    cleaned frame is also DDL'd + appended to
    ``{taxi_color}-{year}-{month}`` like ingest_data.py:159.
    """
    timings: dict[str, float] = {}

    t0 = time.time()
    staged = fetch_to_staging(
        source_url, f"{output_dir}/staging/{taxi_color}_taxi/{year}/{month}"
    )
    timings["fetch"] = time.time() - t0

    t0 = time.time()
    raw = (
        spark.read.option("header", True)
        .option("inferSchema", True)  # reference parity; pass a schema at scale
        .csv(staged)
        .repartition(32)  # gzip csv = 1 task until repartitioned
    )
    raw, ingest_obs = observe_ingest(raw)
    timings["scan"] = time.time() - t0

    t0 = time.time()
    cleaned = clean(raw).withColumns(
        {
            "taxi_color": F.lit(taxi_color),
            "year": F.lit(year),
            "month": F.lit(month),
        }
    )
    out_path = f"{output_dir}/curated"
    write_parquet_partitioned(
        cleaned, out_path, partition_cols=["taxi_color", "year", "month"]
    )
    # The write was the only pass: metrics piggybacked on it.
    ingest_metrics = ingest_obs.get
    rows_in = int(ingest_metrics["rows_in"])
    metrics = {"zero_passenger_rows": int(ingest_metrics["zero_passenger_rows"] or 0)}
    timings["clean_write"] = time.time() - t0

    if jdbc_url:  # pragma: no cover - no DB in sandbox
        from e2e_data_pipeline_spark.sources import (
            jdbc_schema_only_ddl,
            jdbc_writer,
        )

        table = f"{taxi_color}-{year}-{month}"
        jdbc_schema_only_ddl(cleaned, jdbc_url, table).save()
        jdbc_writer(cleaned, jdbc_url, table).save()

    t0 = time.time()
    back = read_parquet_any(spark, out_path).where(
        (F.col("taxi_color") == taxi_color)
        & (F.col("year") == year)
        & (F.col("month") == month)
    )
    rows_out = back.count()
    export = back.limit(export_limit)
    export_path = f"{output_dir}/export/{taxi_color}_{year}_{month}"
    export.write.mode("overwrite").option("compression", "gzip").parquet(export_path)
    exported_rows = read_parquet_any(spark, export_path).count()
    timings["readback_export"] = time.time() - t0

    return EtlResult(
        output_path=out_path,
        rows_in=rows_in,
        rows_filtered=metrics["zero_passenger_rows"],
        rows_out=rows_out,
        exported_rows=exported_rows,
        timings_s=timings,
    )


if __name__ == "__main__":  # pragma: no cover - CLI parity (A18)
    import argparse

    from e2e_data_pipeline_spark.session import get_spark

    p = argparse.ArgumentParser(description="Parametrized ETL flow")
    p.add_argument("--source_url", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--taxi_color", default="green")
    p.add_argument("--year", type=int, default=2019)
    p.add_argument("--month", type=int, default=11)
    p.add_argument("--jdbc_url")
    args = p.parse_args()
    result = main_flow(get_spark("etl-flow"), **vars(args))
    print(result)
