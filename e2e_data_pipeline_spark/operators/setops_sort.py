"""Sort/limit and set-operation operators (SURVEY.md §2.2).

Scale notes: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
each task keeps a k-row heap and the driver merges per-partition
top-ks; no global sort materializes. Ties are broken by the unique key
so the returned SET is deterministic (the driver's hash is
order-insensitive, but the *membership* of a LIMIT must not flap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.operators.registry import register


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (deterministic tie-break on the key)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "set_union",
    oracle="""
    SELECT 'union_distinct' AS grp, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 7500
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    UNION ALL
    SELECT 'union_all' AS grp, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 7500
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) vs UNION ALL of two customer slices, labeled."""
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.where(F.col("c_acctbal") > 7500).select("c_custkey")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    distinct = (
        rich.union(building).distinct().select(F.lit("union_distinct").alias("grp"), "c_custkey")
    )
    union_all = rich.union(building).select(F.lit("union_all").alias("grp"), "c_custkey")
    return distinct.unionByName(union_all)


@register(
    "set_intersect_except",
    oracle="""
    SELECT 'intersect' AS grp, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders
    )
    UNION ALL
    SELECT 'except' AS grp, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    )
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT of key sets, labeled in one result."""
    cust = load_table(spark, sf_dir, "customer")
    rich = cust.where(F.col("c_acctbal") > 5000).select("c_custkey")
    orderers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    inter = rich.intersect(orderers).select(F.lit("intersect").alias("grp"), "c_custkey")
    exc = rich.subtract(orderers).select(F.lit("except").alias("grp"), "c_custkey")
    return inter.unionByName(exc)


@register(
    "sort_nulls",
    oracle="""
    WITH v AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    )
    SELECT 'nulls_first' AS grp, c_custkey, bal FROM (
        SELECT * FROM v ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 30
    )
    UNION ALL
    SELECT 'nulls_last' AS grp, c_custkey, bal FROM (
        SELECT * FROM v ORDER BY bal DESC NULLS LAST, c_custkey LIMIT 30
    )
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST/LAST ordering through a LIMIT.

    Engines disagree on default null placement (Spark: nulls first for
    ASC; DuckDB: nulls last) — silent drift that only bites when a
    limit selects different rows. Both directions are pinned explicitly
    here; the limit makes the ordering semantics observable to the
    order-insensitive hash.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    first = (
        cust.orderBy(F.col("bal").asc_nulls_first(), "c_custkey")
        .limit(30)
        .select(F.lit("nulls_first").alias("grp"), "c_custkey", "bal")
    )
    last = (
        cust.orderBy(F.col("bal").desc_nulls_last(), "c_custkey")
        .limit(30)
        .select(F.lit("nulls_last").alias("grp"), "c_custkey", "bal")
    )
    return first.unionByName(last)


@register(
    "set_symmetric_diff",
    oracle="""
    WITH a AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    b AS (
        SELECT c_custkey FROM customer WHERE c_nationkey < 12
    ),
    sd AS (
        SELECT c_custkey, 'only_a' AS side FROM (
            SELECT c_custkey FROM a EXCEPT ALL SELECT c_custkey FROM b
        )
        UNION ALL
        SELECT c_custkey, 'only_b' AS side FROM (
            SELECT c_custkey FROM b EXCEPT ALL SELECT c_custkey FROM a
        )
    )
    SELECT side,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(c_custkey) AS BIGINT) AS first_custkey,
           CAST(MAX(c_custkey) AS BIGINT) AS last_custkey
    FROM sd
    GROUP BY side
    """,
)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with multiplicity (EXCEPT ALL in both
    directions, labeled) — the set-reconciliation completion of
    set_union/set_intersect_except: which members are in exactly one
    of two populations, preserving duplicate counts (audience overlap
    analysis, feed diffing). Spark's ``exceptAll`` keeps bag
    semantics like SQL's EXCEPT ALL; both legs shuffle once on the
    key and the labeled union aggregates to a 2-row report.
    """
    cust = load_table(spark, sf_dir, "customer")
    a = cust.where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select("c_custkey")
    b = cust.where(F.col("c_nationkey") < 12).select("c_custkey")
    sd = (
        a.exceptAll(b)
        .select("c_custkey", F.lit("only_a").alias("side"))
        .unionByName(
            b.exceptAll(a).select("c_custkey", F.lit("only_b").alias("side"))
        )
    )
    return sd.groupBy("side").agg(
        F.count("*").alias("n_customers"),
        F.min("c_custkey").alias("first_custkey"),
        F.max("c_custkey").alias("last_custkey"),
    )


@register(
    "sort_partial_cluster",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def sort_partial_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions — the write-layout clustering primitive:
    rows are ordered by (l_orderkey, l_linenumber) INSIDE each
    partition with NO global exchange, which is how you lay out
    parquet files for row-group min/max skipping (each file covers a
    tight key range) without paying a cluster-wide range sort. The
    result SET is unchanged (the oracle is the plain selection; the
    driver's hash is row-order-insensitive); the plan property —
    Sort[global=false] and zero added Exchange — is pinned by
    test_plans.py. At 100 TB this is the difference between a
    terasort and a free mapper-side pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


@register(
    "set_union_by_name",
    oracle="""
    SELECT src, nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bal_c) AS BIGINT) AS bal_c,
           CAST(SUM(CASE WHEN has_segment = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_segment
    FROM (
        SELECT 'crm' AS src, c_nationkey AS nationkey,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
               1 AS has_segment
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL BY NAME
        SELECT 'legacy' AS src,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
               c_nationkey AS nationkey,
               0 AS has_segment
        FROM customer WHERE c_custkey % 2 = 1
    )
    GROUP BY src, nationkey
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent union — ``unionByName`` with differently
    ORDERED (and in real feeds, differently evolved) schemas: the
    two customer feeds project their columns in different orders,
    and a positional UNION would silently zip nationkey into the
    balance column (the classic multi-feed ingestion bug this
    operator exists to prevent). DuckDB proves the same semantics
    natively with ``UNION ALL BY NAME``. Aggregated per (feed,
    nation) so column mixups would flip every row of the hash.

    Scale: projection + one partial-agg shuffle; unionByName is
    plan-free (just a projection alignment).
    """
    cust = load_table(spark, sf_dir, "customer")
    crm = cust.where(F.col("c_custkey") % 2 == 0).select(
        F.lit("crm").alias("src"),
        F.col("c_nationkey").alias("nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
        F.lit(1).alias("has_segment"),
    )
    legacy = cust.where(F.col("c_custkey") % 2 == 1).select(
        F.lit("legacy").alias("src"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit(0).alias("has_segment"),
    )
    return (
        crm.unionByName(legacy)
        .groupBy("src", "nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("bal_c").alias("bal_c"),
            F.sum(
                F.when(F.col("has_segment") == 1, 1).otherwise(0)
            ).alias("n_with_segment"),
        )
    )
