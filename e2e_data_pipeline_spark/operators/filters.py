"""Projection / filter / predicate operators (SURVEY.md §2.2).

Generalizes the reference's only predicate — ``df[df["passenger_count"]
!= 0]`` (/root/reference/ingest_data.py:34) — onto the fixture tables,
plus IN/IS NULL/CASE WHEN handling and computed projections.

Scale notes: all three queries are pure narrow transformations — no
shuffle at all. The filters and the column pruning reach the parquet
scan (check ``.explain``: PushedFilters + ReadSchema), so at 100 TB
Spark reads only the row groups and columns that can match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.operators.registry import register


@register(
    "filter_ne",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
    FROM lineitem
    WHERE l_quantity <> 0 AND l_discount BETWEEN 0.05 AND 0.07
    """,
)
def filter_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 generalized: inequality + BETWEEN predicates, pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") != 0) & F.col("l_discount").between(0.05, 0.07)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


@register(
    "project_expr",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           (l_extendedprice * (1 - l_discount)) AS revenue,
           ((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) AS charge,
           (l_quantity * 10) AS qty10
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections. Per-row IEEE double arithmetic is
    deterministic and identical across engines as long as the
    association order matches the SQL parenthesization."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.where(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 10).alias("qty10"),
    )


@register(
    "filter_in_null",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS is_building,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    """,
)
def filter_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate, NULL production/testing, CASE WHEN banding."""
    cust = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return cust.where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    ).select(
        "c_custkey",
        "c_mktsegment",
        seg_or_null.alias("seg_or_null"),
        seg_or_null.isNull().alias("is_building"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
    )
