"""Aggregation operators (SURVEY.md §2.2).

Generalizes the reference's single aggregate — the predicate count
``df['passenger_count'].isin([0]).sum()``
(/root/reference/ingest_data.py:32,36) — into the full family: global,
grouped (TPC-H Q1 shape), distinct, approximate, rollup/cube, HAVING.

All float sums go through DECIMAL (exact, order-insensitive) and cast
back to DOUBLE — see registry.py. Grouped aggregation in Spark is
partial (map-side combine) + final after a shuffle on the group keys;
with a handful of groups the shuffled volume is tiny regardless of
input scale, which is exactly the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.operators.frame_cache import events_daily
from e2e_data_pipeline_spark.operators.registry import (
    dec_avg,
    dec_sum,
    global_rank,
    ntile_from_rank,
    register,
    wide_dbl,
)


@register(
    "agg_global",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_discount,
           strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_shipdate,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_shipdate
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate incl. the reference's predicate-count metric (A5)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        dec_sum("l_quantity").alias("sum_qty"),
        dec_avg("l_quantity").alias("avg_qty"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0)).alias(
            "n_zero_discount"
        ),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_shipdate"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_shipdate"),
    )


@register(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (grouped sums/averages/count)."""
    li = load_table(spark, sf_dir, "lineitem", parallelize_scan=True).where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity").alias("sum_qty"),
        dec_sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
        F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
        dec_avg("l_quantity").alias("avg_qty"),
        dec_avg("l_extendedprice").alias("avg_price"),
        dec_avg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped COUNT(DISTINCT) — Spark expands to a two-phase plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register("agg_approx")  # approximate → rows-only check (no oracle SQL)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event_type.

    At 100 TB this is THE way to count distincts: fixed-size sketch per
    group, mergeable map-side, no exact-distinct shuffle explosion.
    Accuracy is asserted against the exact count in unit tests
    (tests/test_aggregates.py), not via the hash oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_rollup_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping-set id and subtotal rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_rows"),
            dec_sum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_spent"),
        )
        .where(F.col("n_orders") >= 15)
    )


@register(
    "agg_stats",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           ROUND(sx / n, 6) AS mean_price,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_price,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_price_qty
    FROM m
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed second moments: stddev and correlation, exact.

    Built-in ``stddev``/``corr`` accumulate doubles in partition order,
    so their low digits differ run-to-run and engine-to-engine. Here
    the raw moments (Σx, Σx², Σxy, …) are DECIMAL sums — the products
    of 2-decimal prices and integer-ish quantities are exactly
    representable, so every sum is exact and order-insensitive — and
    the closed forms combine them identically in both engines. This is
    also the scale story: moments are one map-side-combinable pass,
    and the final arithmetic is per-group constant work.
    """
    li = load_table(spark, sf_dir, "lineitem", parallelize_scan=True)
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum(y.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((y * y).cast("decimal(28,4)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(28,4)")).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_price"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_price"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_price_qty"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: two non-hierarchical groupings in one
    pass — not expressible as ROLLUP or CUBE (which would add the
    combined and grand-total sets). Spark expands each row once per
    set before the partial aggregate, so the shuffle still carries
    only group totals."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_rows"),
            dec_sum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderpriority,
           CAST(arg_max(o_orderkey, ROUND(o_totalprice, 2)) AS BIGINT) AS biggest_order,
           CAST(arg_min(o_orderkey, ROUND(o_totalprice, 2)) AS BIGINT) AS smallest_order,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(MIN(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregation (max_by / min_by, DuckDB arg_max/
    arg_min): the key of the extreme row without a self-join or window
    — one partial-aggregable pass, where the rank-then-filter
    formulation costs a full shuffle+sort.

    Caveat pinned by this query: ties on the ordering value make
    max_by nondeterministic in both engines; the fixture's rounded
    2-decimal prices are unique per priority group (asserted by the
    hash staying green), and production use should order by a
    tie-broken struct instead.
    """
    orders = load_table(spark, sf_dir, "orders")
    price = F.round("o_totalprice", 2)
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", price).alias("biggest_order"),
        F.min_by("o_orderkey", price).alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


@register(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any — SQL bool_and/bool_or): assert
    data-contract invariants per group in one partial-aggregable pass
    instead of counting violations and comparing to zero."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )


@register("agg_sketch_merge")  # sketch-based → rows-only check (no oracle SQL)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable cardinality sketches (Apache DataSketches HLL):
    build one sketch per (day, event_type) cell, then MERGE the binary
    sketches across days per event_type and estimate.

    This two-level shape is the 100 TB pattern the plain
    ``approx_count_distinct`` can't express: the per-cell sketches are
    a materializable intermediate (e.g., a daily rollup table), and any
    coarser cardinality — weekly, monthly, all-time — comes from
    merging those few-KB binaries WITHOUT rescanning raw events.
    Accuracy floor vs exact distinct is asserted in
    tests/test_llm_ops.py; the driver records a rows-only check
    (estimates are not SQL-portable)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_daily_sketches"),
        )
    )


@register("agg_approx_percentile")  # approximate → rows-only check
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) of order value
    per priority class — the scale path for quantiles, next to the
    exact `agg_percentile`.

    Exact percentiles need a full sort per group; the GK sketch is a
    bounded-size, mergeable summary built map-side, so quantiles over
    100 TB cost one normal aggregation. `accuracy=10000` bounds rank
    error at 1/10000 of the group — asserted against the exact
    interpolated percentile in tests/test_llm_ops.py, not via the hash
    oracle (sketch internals are implementation-defined).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias(
            "approx_pcts"
        ),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(strftime(date_trunc('day', ts), '%Y-%m-%d') AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    GROUP BY event_type, day
    UNION ALL
    SELECT event_type, '<all>' AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct counting via bitmaps — the exact
    counterpart to `agg_sketch_merge`'s HLL: per-(type, day, bucket)
    bitmaps built map-side (`bitmap_construct_agg` over bit positions),
    OR-merged across buckets, then popcounted. Unlike COUNT(DISTINCT),
    the bitmaps are mergeable state: daily rollups can be combined into
    weekly/monthly counts WITHOUT re-touching raw data, and unlike HLL
    the answer is exact. Cost model: dense ids → bounded bitmap bytes
    per bucket; the shuffle carries bitmaps, never raw ids. The oracle
    is plain COUNT(DISTINCT) — the bitmap path must agree exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    per_bucket = (
        ev.select(
            "event_type",
            day,
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "day", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    daily = per_bucket.groupBy("event_type", "day").agg(
        F.sum(F.bitmap_count("bm")).alias("distinct_users")
    )
    # Re-aggregation: OR-merge the DAILY bitmap state into an all-days
    # rollup — raw events are never touched again. Buckets partition
    # the id space, so popcounts add across buckets after the merge.
    total = (
        per_bucket.groupBy("event_type", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("distinct_users"))
        .withColumn("day", F.lit("<all>"))
    )
    return daily.unionByName(total.select("event_type", "day", "distinct_users"))


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment AS mode_segment, n AS mode_count
    FROM (
        SELECT *, row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY n DESC, c_mktsegment) AS rn
        FROM counts
    ) WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: the most frequent market segment
    per nation, ties broken lexicographically. Built-in ``mode()`` is
    free to return ANY maximal value (engine/partitioning dependent) —
    useless under a cross-engine hash; count-then-argmax with an
    explicit tiebreak is the portable construction. Two aggregations,
    both with map-side partials; the argmax runs on the counts frame
    (nations × segments), which is bounded by the category product,
    not the row count.
    """
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    # min_by over (-n, segment): structs compare lexicographically, so
    # the minimum is (highest n, then lexicographically first segment).
    return (
        counts.groupBy("c_nationkey")
        .agg(
            F.min_by(
                F.struct(
                    F.col("c_mktsegment").alias("mode_segment"),
                    F.col("n").alias("mode_count"),
                ),
                F.struct((-F.col("n")).alias("neg_n"), F.col("c_mktsegment")),
            ).alias("m")
        )
        .select("c_nationkey", "m.*")
    )


@register(
    "agg_corr_regr",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(user_id AS DECIMAL(18,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(user_id AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(user_id AS DECIMAL(18,0))
                        * CAST(user_id AS DECIMAL(18,0))) AS DOUBLE) AS syy
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n,
           (n*sxy - sx*sy)
               / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)) AS corr_xy,
           (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
           (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx))*sx) / n AS intercept
    FROM s
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope/intercept per group, computed
    from EXACT decimal sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) with the closed forms evaluated on doubles via the identical
    expression tree on both engines. The built-in ``corr``/``regr_*``
    aggregates are NOT cross-engine deterministic (each engine folds
    doubles in its own order); decimal accumulation is exact and
    order-insensitive, so this is bit-reproducible — the same
    construction as agg_stats/win_zscore, extended to two variables.

    Scale: one partial-aggregate shuffle carrying 6 numbers per group
    — the map-side-combine shape; sufficient statistics are also
    mergeable across batches/streams by construction. The decimal
    products stay far from DECIMAL(38) overflow at any realistic group
    size (Σxy < 1e13 per 1e9 rows at these magnitudes).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = F.col("value").cast("decimal(18,2)")
    y = F.col("user_id").cast("decimal(18,0)")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    corr = cov_n / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    slope = cov_n / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return g.select(
        "event_type",
        "n",
        corr.alias("corr_xy"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


@register(
    "agg_histogram",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CAST(least(floor(value / 10), 50) AS INT) AS bin,
               value
        FROM events
        WHERE value IS NOT NULL
    ),
    h AS (
        SELECT event_type, bin,
               CAST(bin * 10 AS INT) AS bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM b
        GROUP BY event_type, bin
    )
    SELECT event_type, bin, bin_lo, n, sum_value,
           n / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
    FROM h
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group with an overflow clamp and
    per-group share — the distribution-profiling primitive for
    training-data audits (detects value drift/spikes without a sort).
    Binning is spelled as explicit arithmetic (``least(floor(v/10),
    50)``) rather than an engine histogram built-in, so both engines
    evaluate the identical IEEE expression; the share divides exact
    BIGINT counts, and the per-bin sum uses the DECIMAL construction
    (registry.dec_sum rationale).

    Scale: groupBy on (group, bin) is bounded at |groups|×52 cells —
    pure map-side combine; the share's window runs over that tiny
    aggregate, never over raw rows. No sort, no quantile state,
    mergeable across batches.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bin_col = F.least(F.floor(F.col("value") / 10), F.lit(50)).cast("int")
    h = (
        ev.select("event_type", bin_col.alias("bin"), "value")
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").alias("n"),
            dec_sum("value").alias("sum_value"),
        )
        .select(
            "event_type",
            "bin",
            (F.col("bin") * 10).cast("int").alias("bin_lo"),
            "n",
            "sum_value",
        )
    )
    from pyspark.sql import Window

    total = F.sum("n").over(Window.partitionBy("event_type"))
    return h.select(
        "event_type",
        "bin",
        "bin_lo",
        "n",
        "sum_value",
        (F.col("n") / total.cast("double")).alias("share"),
    )


@register(
    "agg_countmin_freq",
    oracle="""
    WITH keyed AS (
        SELECT concat(event_type, ':', CAST(user_id % 50 AS VARCHAR)) AS k
        FROM events
    ),
    depths AS (SELECT UNNEST([0, 1, 2, 3]) AS depth),
    cms AS (
        SELECT depth,
               CAST(concat('0x', substr(md5(concat(CAST(depth AS VARCHAR), ':', k)), 1, 8))
                    AS BIGINT) % 64 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM keyed, depths
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS true_count FROM keyed GROUP BY k
    ),
    probe AS (
        SELECT t.k, t.true_count, d.depth,
               CAST(concat('0x', substr(md5(concat(CAST(d.depth AS VARCHAR), ':', t.k)), 1, 8))
                    AS BIGINT) % 64 AS bucket
        FROM truth t, depths d
    )
    SELECT p.k,
           MIN(c.cnt) AS est_count,
           CAST(MIN(p.true_count) AS BIGINT) AS true_count,
           MIN(c.cnt) - MIN(p.true_count) AS overestimate
    FROM probe p
    JOIN cms c ON c.depth = p.depth AND c.bucket = p.bucket
    GROUP BY p.k
    """,
)
def agg_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, built and probed as an
    explicit (depth x width) counter table — the mergeable
    heavy-hitter primitive for unbounded key spaces.

    The sketch is d=4 rows x w=64 buckets: each event lands in one
    bucket per depth (4x row expansion BEFORE the partial aggregate,
    so the shuffle carries at most 256 cells per map task, same
    map-side-combine property as any groupBy). Estimates are
    min-over-depths of the bucket counters; CMS guarantees
    est >= true, so ``overestimate`` is provably >= 0 — the query
    output self-validates the sketch bound, and the exact hash oracle
    checks both sides compute the identical sketch.

    The seeded bucket hash is the engine-portable 32-bit md5 prefix:
    Spark ``conv(substr(md5(seed:key),1,8),16,10)`` == DuckDB
    ``CAST('0x'||substr(md5(seed:key),1,8) AS BIGINT)``. At 100 TB the
    sketch stays 256 cells no matter the key cardinality; the probe
    join is an equi-join against those 256 rows (broadcast).
    """
    ev = load_table(spark, sf_dir, "events", parallelize_scan=True)
    k = F.concat(
        F.col("event_type"), F.lit(":"), (F.col("user_id") % 50).cast("string")
    )
    keyed = ev.select(k.alias("k"))
    depths = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3)))

    def bucket(depth_col, key_col):
        seeded = F.concat(depth_col.cast("string"), F.lit(":"), key_col)
        h = F.conv(F.substring(F.md5(seeded.cast("binary")), 1, 8), 16, 10)
        return (h.cast("long") % 64).alias("bucket")

    expanded = keyed.select("k", depths.alias("depth"))
    cms = (
        expanded.select("depth", bucket(F.col("depth"), F.col("k")))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    truth = keyed.groupBy("k").agg(F.count("*").alias("true_count"))
    probe = truth.select(
        "k", "true_count", depths.alias("depth")
    ).select("k", "true_count", "depth", bucket(F.col("depth"), F.col("k")))
    return (
        probe.join(F.broadcast(cms), ["depth", "bucket"])
        .groupBy("k")
        .agg(
            F.min("cnt").alias("est_count"),
            F.min("true_count").alias("true_count"),
            (F.min("cnt") - F.min("true_count")).alias("overestimate"),
        )
    )


@register(
    "agg_skew_kurt",
    oracle="""
    WITH d AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(9,2))) AS d1,
               SUM(CAST(CAST(value AS DECIMAL(9,2))
                        * CAST(value AS DECIMAL(9,2)) AS DECIMAL(14,4))) AS d2,
               SUM(CAST(CAST(CAST(CAST(value AS DECIMAL(9,2))
                             * CAST(value AS DECIMAL(9,2)) AS DECIMAL(14,4))
                             AS DECIMAL(19,4))
                        * CAST(value AS DECIMAL(9,2)) AS DECIMAL(20,6))) AS d3,
               SUM(CAST(CAST(CAST(CAST(value AS DECIMAL(9,2))
                             * CAST(value AS DECIMAL(9,2)) AS DECIMAL(14,4))
                             AS DECIMAL(19,4))
                        * CAST(CAST(value AS DECIMAL(9,2))
                               * CAST(value AS DECIMAL(9,2)) AS DECIMAL(14,4))
                        AS DECIMAL(28,8))) AS d4
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type
    ),
    s AS (
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               CAST(d1 AS DOUBLE) AS s1,
               CAST(d2 AS DOUBLE) AS s2,
               CAST(CAST(FLOOR(d3) AS BIGINT) AS DOUBLE)
                   + CAST(d3 % 1 AS DOUBLE) AS s3,
               CAST(CAST(FLOOR(d4) AS BIGINT) AS DOUBLE)
                   + CAST(d4 % 1 AS DOUBLE) AS s4
        FROM d
    )
    SELECT event_type, n,
           ((s3 / n) - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
               / (((s2 / n) - (s1 / n) * (s1 / n))
                  * sqrt((s2 / n) - (s1 / n) * (s1 / n))) AS skewness_pop,
           ((s4 / n) - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n)
            - 3 * ((s1 / n) * (s1 / n)) * ((s1 / n) * (s1 / n)))
               / (((s2 / n) - (s1 / n) * (s1 / n))
                  * ((s2 / n) - (s1 / n) * (s1 / n))) - 3 AS kurtosis_excess
    FROM s
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-reproducible skewness + excess kurtosis per group from EXACT
    decimal raw moments (n, Sx, Sx2, Sx3, Sx4) - the agg_stats /
    agg_corr_regr construction extended to 3rd/4th moments. Built-in
    ``skewness``/``kurtosis`` fold doubles engine-arbitrarily; here
    every power is an explicitly-capped decimal product (each cast
    exact for |x| < 1e5; the fixture max is ~560), the shuffle carries
    5 numbers per group, and the closed forms run on doubles via the
    IDENTICAL expression tree on both engines (sqrt-multiplied instead
    of pow(x, 1.5), since pow implementations may differ in the last
    ulp).

    Two portability subtleties, learned the hard way:
    - the left operand of each big product re-widens to DECIMAL(19,4):
      a result width over 18 digits forces DuckDB's HUGEINT decimal
      kernel (its int64 kernel overflows on d(14)*d(14) products);
    - the 3rd/4th-moment sums convert to double via an integer/fraction
      SPLIT (floor part through BIGINT, remainder separately). Casting
      a wide decimal directly diverges: DuckDB converts the HUGEINT
      significand to double first and divides by 10^scale after (two
      roundings), Spark's BigDecimal rounds once. Splitting makes each
      piece exactly representable (or one correctly-rounded op), so
      both engines produce identical bits.

    The moments are mergeable across partitions/batches by
    construction - at 100 TB this is one map-side-combine shuffle, and
    the same 5-tuple can roll up daily -> monthly without re-reading
    raw data.
    """
    ev = load_table(spark, sf_dir, "events", parallelize_scan=True).where(
        F.col("value").isNotNull()
    )
    x = F.col("value").cast("decimal(9,2)")
    x2 = (x * x).cast("decimal(14,4)")
    x2w = x2.cast("decimal(19,4)")
    x3 = (x2w * x).cast("decimal(20,6)")
    x4 = (x2w * x2).cast("decimal(28,8)")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(x3).alias("d3"),
        F.sum(x4).alias("d4"),
    )

    def split_double(c):
        # `c % 1` (not `c - floor(c)`): Spark's decimal subtraction
        # against the wide floor overflows precision 38 and silently
        # ROUNDS the remainder to scale 6; mod keeps the full scale
        # exactly on both engines.
        return F.floor(c).cast("bigint").cast("double") + (c % F.lit(1)).cast(
            "double"
        )

    g = g.select(
        "event_type",
        "n",
        "s1",
        "s2",
        split_double(F.col("d3")).alias("s3"),
        split_double(F.col("d4")).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    m2r = F.col("s2") / n
    m3r = F.col("s3") / n
    m4r = F.col("s4") / n
    var = m2r - m1 * m1
    skew = (m3r - F.lit(3) * m1 * m2r + F.lit(2) * m1 * m1 * m1) / (
        var * F.sqrt(var)
    )
    kurt = (
        m4r
        - F.lit(4) * m1 * m3r
        + F.lit(6) * m1 * m1 * m2r
        - F.lit(3) * (m1 * m1) * (m1 * m1)
    ) / (var * var) - F.lit(3)
    return g.select(
        "event_type", "n", skew.alias("skewness_pop"), kurt.alias("kurtosis_excess")
    )


@register(
    "agg_gini",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey, o.o_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c_nationkey, cents,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY cents, o_custkey) AS rnk
        FROM spend
    ),
    agg AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s0,
               CAST(SUM(rnk * cents) AS BIGINT) AS s1
        FROM ranked GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           (2 * CAST(s1 AS DOUBLE) - (n + 1) * CAST(s0 AS DOUBLE))
               / (n * CAST(s0 AS DOUBLE)) AS gini
    FROM agg
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation — the revenue-
    concentration / inequality diagnostic (0 = uniform, →1 = one
    customer is the whole market), computed from the rank formula
    G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending-sorted spend.

    Everything is INTEGER CENTS until the final O(1) ratio: the rank
    window is per-nation (one shuffle shared with both aggregations),
    Σi·xᵢ stays far inside int64, and the bigint→double casts are
    exact below 2^53 — so the hash needs no epsilon. Ties rank by
    custkey for engine-identical ordering.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "o_custkey")
    ranked = spend.select(
        "c_nationkey", "cents", F.row_number().over(w).cast("long").alias("rnk")
    )
    agg = ranked.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s0"),
        F.sum(F.col("rnk") * F.col("cents")).alias("s1"),
    )
    n = F.col("n")
    gini = (
        F.lit(2) * F.col("s1").cast("double")
        - (n + 1) * F.col("s0").cast("double")
    ) / (n * F.col("s0").cast("double"))
    return agg.select("c_nationkey", "n", gini.alias("gini"))


@register(
    "agg_pareto_share",
    oracle="""
    WITH spend AS (
        SELECT c.c_nationkey, o.o_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c_nationkey, cents,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY cents DESC, o_custkey) AS rnk,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        FROM spend
    )
    SELECT c_nationkey,
           CAST(MIN(n) AS BIGINT) AS n_customers,
           CAST(CAST(FLOOR((MIN(n) + 9) / 10.0) AS BIGINT) AS BIGINT) AS top_k,
           CAST(SUM(CASE WHEN rnk <= CAST(FLOOR((n + 9) / 10.0) AS BIGINT)
                         THEN cents ELSE 0 END) AS DOUBLE)
               / CAST(SUM(cents) AS DOUBLE) AS top_decile_share
    FROM ranked
    GROUP BY c_nationkey
    """,
)
def agg_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration report: the revenue share captured by the
    top 10% of customers per nation — the business-facing twin of
    agg_gini (answers "how 80/20 is this market" directly).

    Same exact-integer-cents machinery as agg_gini: one per-nation
    window pass provides both the descending rank and the group size,
    the top-k cutoff ceil(n/10) is computed with identical
    floor((n+9)/10.0) arithmetic on both engines, and the final share
    is one exact-int→double ratio. One shuffle total; output is one
    row per nation.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("long")
            .alias("cents")
        )
    )
    wr = Window.partitionBy("c_nationkey").orderBy(
        F.desc("cents"), F.col("o_custkey").asc()
    )
    wn = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        "cents",
        F.row_number().over(wr).cast("long").alias("rnk"),
        F.count("*").over(wn).alias("n"),
    )
    k = F.floor((F.col("n") + 9) / F.lit(10.0)).cast("long")
    return ranked.groupBy("c_nationkey").agg(
        F.min("n").alias("n_customers"),
        F.floor((F.min("n") + 9) / F.lit(10.0)).cast("long").alias("top_k"),
        (
            F.sum(F.when(F.col("rnk") <= k, F.col("cents")).otherwise(0)).cast(
                "double"
            )
            / F.sum("cents").cast("double")
        ).alias("top_decile_share"),
    )


@register(
    "ml_linreg_normal_eq",
    oracle="""
    WITH d AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(9,2))) AS s1,
               SUM(CAST(l_discount AS DECIMAL(9,2))) AS s2,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
               SUM(CAST(CAST(l_quantity AS DECIMAL(19,2))
                        * CAST(l_quantity AS DECIMAL(9,2)) AS DECIMAL(20,4))) AS s11,
               SUM(CAST(CAST(l_quantity AS DECIMAL(19,2))
                        * CAST(l_discount AS DECIMAL(9,2)) AS DECIMAL(20,4))) AS s12,
               SUM(CAST(CAST(l_discount AS DECIMAL(19,2))
                        * CAST(l_discount AS DECIMAL(9,2)) AS DECIMAL(20,4))) AS s22,
               SUM(CAST(CAST(l_quantity AS DECIMAL(19,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS s1y,
               SUM(CAST(CAST(l_discount AS DECIMAL(19,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS s2y,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(28,4))) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    ),
    s AS (
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
               CAST(sy AS DOUBLE) AS sy,
               CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
               CAST(s22 AS DOUBLE) AS s22,
               CAST(CAST(FLOOR(s1y) AS BIGINT) AS DOUBLE)
                   + CAST(s1y % 1 AS DOUBLE) AS s1y,
               CAST(s2y AS DOUBLE) AS s2y,
               CAST(CAST(FLOOR(syy) AS BIGINT) AS DOUBLE)
                   + CAST(syy % 1 AS DOUBLE) AS syy
        FROM d
    )
    SELECT l_returnflag, n,
           (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
            + s2 * (s1y * s12 - s11 * s2y))
           / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2)) AS beta0,
           (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
            + s2 * (s1 * s2y - s1y * s2))
           / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2)) AS beta_qty,
           (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
            + sy * (s1 * s12 - s11 * s2))
           / (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s12 - s11 * s2)) AS beta_disc
    FROM s
    """,
)
def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS (price ~ quantity + discount, per returnflag)
    solved in closed form from the NORMAL EQUATIONS — the distributed
    "ML training step" pattern: one map-side-combine pass accumulates
    the exact decimal sufficient statistics (n, Σx, ΣxᵢxⱼE, Σxᵢy), and
    the 3x3 system is solved per group with Cramer's rule in O(1)
    double arithmetic — no gradient loop, no driver-side math library,
    bit-identical across engines (the agg_corr_regr construction
    lifted to multivariate).

    The portability discipline is the hard-won aggregates playbook:
    every decimal product pre-widens its left operand past 18 digits
    (forces DuckDB's HUGEINT kernel), and the two sums whose scaled
    integers can exceed 2^53 (Σqty·price, Σprice²) convert to double
    via the floor/mod-1 split. At 100 TB the shuffle carries ten
    numbers per group and the sufficient statistics merge across
    batches — the same state a streaming retrain would keep.
    """
    li = load_table(spark, sf_dir, "lineitem", parallelize_scan=True)
    q = F.col("l_quantity").cast("decimal(9,2)")
    qw = F.col("l_quantity").cast("decimal(19,2)")
    dd = F.col("l_discount").cast("decimal(9,2)")
    dw = F.col("l_discount").cast("decimal(19,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    yw = F.col("l_extendedprice").cast("decimal(19,2)")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(dd).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((qw * q).cast("decimal(20,4)")).cast("double").alias("s11"),
        F.sum((qw * dd).cast("decimal(20,4)")).cast("double").alias("s12"),
        F.sum((dw * dd).cast("decimal(20,4)")).cast("double").alias("s22"),
        F.sum((qw * y).cast("decimal(24,4)")).alias("d1y"),
        F.sum((dw * y).cast("decimal(24,4)")).cast("double").alias("s2y"),
        F.sum((yw * y).cast("decimal(28,4)")).alias("dyy"),
    )

    def split_double(c):
        return F.floor(c).cast("bigint").cast("double") + (c % F.lit(1)).cast(
            "double"
        )

    g = g.select(
        "l_returnflag", "n", "s1", "s2", "sy", "s11", "s12", "s22", "s2y",
        split_double(F.col("d1y")).alias("s1y"),
        split_double(F.col("dyy")).alias("syy"),
    )
    n = F.col("n")
    s1, s2, sy = F.col("s1"), F.col("s2"), F.col("sy")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    beta0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    ) / det
    beta_qty = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    ) / det
    beta_disc = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    ) / det
    return g.select(
        "l_returnflag",
        "n",
        beta0.alias("beta0"),
        beta_qty.alias("beta_qty"),
        beta_disc.alias("beta_disc"),
    )


@register(
    "stats_ab_ztest",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value > 300
                        THEN 1 ELSE 0 END) AS converted
        FROM events
        GROUP BY user_id
    ),
    v AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM assign GROUP BY variant
    ),
    wide AS (
        SELECT MIN(CASE WHEN variant = 0 THEN n_users END) AS n0,
               MIN(CASE WHEN variant = 0 THEN n_converted END) AS c0,
               MIN(CASE WHEN variant = 1 THEN n_users END) AS n1,
               MIN(CASE WHEN variant = 1 THEN n_converted END) AS c1
        FROM v
    )
    SELECT n0 AS control_users, c0 AS control_conversions,
           n1 AS treat_users, c1 AS treat_conversions,
           ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS control_rate,
           ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS treat_rate,
           CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
                ELSE ROUND((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                     / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                            * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1)), 6) END AS z_score
    FROM wide
    """,
)
def stats_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users split by a
    deterministic hash (id parity), conversion = any high-value
    purchase (>300),
    pooled-variance z statistic — the experimentation-platform readout
    computed entirely from two exact integer 4-tuples (the same
    mergeable-sufficient-statistic discipline as the moment ops; a
    streaming experiment would keep exactly this state).

    One distinct-user aggregation (the only real shuffle), then a
    2-row pivot and an O(1) rounded formula. Engine-identical because
    every input to the float math is an exact integer.
    """
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 300), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    v = assign.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = v.agg(
        F.min(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.min(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.min(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.min(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    n0, c0 = F.col("n0"), F.col("c0")
    n1, c1 = F.col("n1"), F.col("c1")
    r0 = c0.cast("double") / n0
    r1 = c1.cast("double") / n1
    pp = (c0 + c1).cast("double") / (n0 + n1)
    # degenerate experiment (nobody / everybody converted): pooled
    # variance is 0, the statistic is undefined -> NULL, not a crash.
    z = F.when(
        (c0 + c1 == 0) | (c0 + c1 == n0 + n1), F.lit(None).cast("double")
    ).otherwise(
        (r1 - r0)
        / F.sqrt(pp * (1 - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
    )
    return wide.select(
        n0.alias("control_users"),
        c0.alias("control_conversions"),
        n1.alias("treat_users"),
        c1.alias("treat_conversions"),
        F.round(r0, 6).alias("control_rate"),
        F.round(r1, 6).alias("treat_rate"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "stats_cramers_v",
    oracle="""
    WITH obs AS (
        SELECT o_orderpriority AS a, l_returnflag AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    margins AS (
        SELECT a, b, n,
               SUM(n) OVER (PARTITION BY a) AS ra,
               SUM(n) OVER (PARTITION BY b) AS cb,
               SUM(n) OVER () AS tot
        FROM obs
    ),
    chi AS (
        SELECT CAST(MIN(tot) AS BIGINT) AS tot,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS n_rows_cat,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS n_cols_cat,
               ROUND(SUM(
                   (n - CAST(ra AS DOUBLE) * cb / tot)
                   * (n - CAST(ra AS DOUBLE) * cb / tot)
                   / (CAST(ra AS DOUBLE) * cb / tot)
               ), 6) AS chi2
        FROM margins
    )
    SELECT tot AS n_obs, n_rows_cat, n_cols_cat, chi2,
           ROUND(sqrt(chi2 / (tot * (least(n_rows_cat, n_cols_cat) - 1))), 6)
               AS cramers_v
    FROM chi
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between two categoricals (order priority
    × return flag) via the chi-square statistic over the contingency
    table — the screening test for "are these columns independent"
    (feature selection, leakage hunting, schema profiling).

    The contingency table is a bounded aggregate (|A|x|B| cells);
    margins come from window sums over those cells, and the chi²
    fold runs over ≤15 cells of exact integer counts — rounded at 6dp
    for summation-order ulp (corpus_entropy discipline). The only real
    shuffle is the fact-table groupBy.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    obs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_orderpriority").alias("a"),
            F.col("l_returnflag").alias("b"),
        )
        .agg(F.count("*").alias("n"))
    )
    m = obs.select(
        "a",
        "b",
        "n",
        F.sum("n").over(Window.partitionBy("a")).alias("ra"),
        F.sum("n").over(Window.partitionBy("b")).alias("cb"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    exp = F.col("ra").cast("double") * F.col("cb") / F.col("tot")
    chi = m.agg(
        F.min("tot").alias("tot"),
        F.countDistinct("a").alias("n_rows_cat"),
        F.countDistinct("b").alias("n_cols_cat"),
        F.round(
            F.sum((F.col("n") - exp) * (F.col("n") - exp) / exp), 6
        ).alias("chi2"),
    )
    v = F.sqrt(
        F.col("chi2")
        / (F.col("tot") * (F.least("n_rows_cat", "n_cols_cat") - 1))
    )
    return chi.select(
        F.col("tot").alias("n_obs"),
        "n_rows_cat",
        "n_cols_cat",
        "chi2",
        F.round(v, 6).alias("cramers_v"),
    )


@register(
    "agg_leadtime_pct",
    oracle="""
    WITH lt AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
                   AS lead_days
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(lead_days, 0.5) AS p50_days,
           quantile_cont(lead_days, 0.9) AS p90_days,
           CAST(MAX(lead_days) AS BIGINT) AS max_days
    FROM lt GROUP BY o_orderpriority
    """,
)
def agg_leadtime_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead-time distribution per priority class (p50 /
    p90 / max in days) — the supply-chain SLA report, and the pattern
    for any duration-percentile metric (latency, time-to-convert).

    Lead times are exact integer days, so percentile interpolation is
    dyadic-exact cross-engine (the dq_anomaly_iqr cents argument) and
    no rounding epsilon is needed anywhere. One fact join + one
    groupBy; the exact per-group percentile sort is the only
    super-aggregate cost (switch to approx_percentile at 100 TB —
    agg_approx_percentile is the registered scale path).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("lead_days"),
    )
    return lt.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.percentile("lead_days", F.lit(0.5)).alias("p50_days"),
        F.percentile("lead_days", F.lit(0.9)).alias("p90_days"),
        F.max("lead_days").alias("max_days"),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH pts AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    cells AS (
        SELECT l_returnflag, price_cents, CAST(SUM(w) AS BIGINT) AS w
        FROM pts GROUP BY 1, 2
    ),
    cum AS (
        SELECT l_returnflag, price_cents, w,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY price_cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM cells
    )
    SELECT l_returnflag,
           CAST(MIN(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_cents END) AS BIGINT)
               AS weighted_median_cents
    FROM cum
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    quantile no engine ships as a built-in aggregate: the answer is
    the smallest price whose cumulative weight reaches half the total
    (lower weighted median — a pinned, interpolation-free definition,
    so the result is an exact integer-cents value on both engines).

    The running-weight window runs over the (flag, price) AGGREGATE
    cells, not raw rows — distinct prices bound the sort. Everything
    is int64; no float enters the query at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "price_cents"
        ),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    cells = pts.groupBy("l_returnflag", "price_cents").agg(
        F.sum("w").alias("w")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.select(
        "l_returnflag",
        "price_cents",
        "w",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.min("tw").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_cents"))
        ).alias("weighted_median_cents"),
    )


@register(
    "stats_ks_test",
    oracle="""
    WITH pts AS (
        SELECT CAST(user_id % 2 AS INT) AS grp,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    sizes AS (
        SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM pts
    ),
    steps AS (
        SELECT v,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1
        FROM pts GROUP BY v
    ),
    ecdf AS (
        SELECT v,
               CAST(SUM(c0) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS e0,
               CAST(SUM(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS e1
        FROM steps
    )
    SELECT s.n0, s.n1,
           CAST(MAX(abs(e.e0 * s.n1 - e.e1 * s.n0)) AS BIGINT) AS max_gap_scaled,
           ROUND(CAST(MAX(abs(e.e0 * s.n1 - e.e1 * s.n0)) AS DOUBLE)
                 / (s.n0 * s.n1), 6) AS ks_statistic
    FROM ecdf e CROSS JOIN sizes s
    GROUP BY s.n0, s.n1
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (hash-split groups over
    event values) — the distribution-drift detector every data-quality
    and experiment pipeline wants beyond mean comparisons.

    The KS gap is computed ENTIRELY in integers: at each distinct
    value, the ECDF difference is the cross-multiplied
    |e0*n1 - e1*n0| (an exact int64), and the statistic divides the
    integer max ONCE at the end — so the supremum location can never
    flip on a float ulp. One groupBy on distinct values + one ordered
    series-level window over the step function (O(distinct values)
    rows, not raw events).
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    pts = ev.select(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    sizes = pts.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
    )
    steps = pts.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = steps.select(
        F.sum("c0").over(w).alias("e0"), F.sum("c1").over(w).alias("e1")
    )
    gap = F.abs(F.col("e0") * F.col("n1") - F.col("e1") * F.col("n0"))
    return (
        ecdf.crossJoin(F.broadcast(sizes))
        .groupBy("n0", "n1")
        .agg(
            F.max(gap).alias("max_gap_scaled"),
            F.round(
                F.max(gap).cast("double") / (F.col("n0") * F.col("n1")), 6
            ).alias("ks_statistic"),
        )
        .select("n0", "n1", "max_gap_scaled", "ks_statistic")
    )


@register(
    "stats_mannwhitney",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    per_cents AS (
        SELECT cents,
               CAST(SUM(grp) AS BIGINT) AS n_a,
               CAST(COUNT(*) AS BIGINT) AS n_c
        FROM pop GROUP BY cents
    ),
    ranked AS (
        SELECT cents, n_a, n_c,
               SUM(n_c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   - n_c AS cnt_less
        FROM per_cents
    ),
    agg AS (
        SELECT SUM(n_a * (CAST(cnt_less AS DOUBLE)
                          + (CAST(n_c AS DOUBLE) + 1.0) / 2.0)) AS r1,
               CAST(SUM(n_a) AS BIGINT) AS n1,
               CAST(SUM(n_c) - SUM(n_a) AS BIGINT) AS n2,
               CAST(SUM(n_c) AS BIGINT) AS n,
               CAST(SUM(n_c * n_c * n_c - n_c) AS BIGINT) AS tie_sum
        FROM ranked
    )
    SELECT n1, n2,
           r1 - (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u1,
           (r1 - (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
            - (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 2.0)
           / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                  * ((CAST(n AS DOUBLE) + 1.0)
                     - CAST(tie_sum AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
               AS z
    FROM agg
    """,
)
def stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (purchase vs click values) with
    tie correction — the nonparametric A/B companion to
    ``stats_ab_ztest``.

    Distributed ranking without a global row window: group by the
    integer-cents value, take a prefix sum over the (bounded) distinct
    values, and each member's average rank is cnt_less + (ties+1)/2.
    Every rank term is a dyadic rational (halves), exactly
    representable in double, so the rank-sum is EXACT regardless of
    Spark's summation order — the reason for cents, not raw doubles.
    The z statistic is then a fixed scalar chain over six exact
    aggregates, written operation-for-operation identically in the
    oracle (sqrt is IEEE-correctly-rounded on both engines, so the
    chain is bit-stable).
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    pop = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_cents = pop.groupBy("cents").agg(
        F.sum("grp").alias("n_a"), F.count("*").alias("n_c")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_cents.select(
        "cents",
        "n_a",
        "n_c",
        (F.sum("n_c").over(w) - F.col("n_c")).alias("cnt_less"),
    )
    avg_rank = F.col("cnt_less").cast("double") + (
        F.col("n_c").cast("double") + F.lit(1.0)
    ) / F.lit(2.0)
    agg = ranked.agg(
        F.sum(F.col("n_a") * avg_rank).alias("r1"),
        F.sum("n_a").alias("n1"),
        (F.sum("n_c") - F.sum("n_a")).alias("n2"),
        F.sum("n_c").alias("n"),
        F.sum(
            F.col("n_c") * F.col("n_c") * F.col("n_c") - F.col("n_c")
        ).alias("tie_sum"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = F.col("n").cast("double")
    u1 = F.col("r1") - (n1d * (n1d + F.lit(1.0))) / F.lit(2.0)
    z = (u1 - (n1d * n2d) / F.lit(2.0)) / F.sqrt(
        (n1d * n2d / F.lit(12.0))
        * (
            (nd + F.lit(1.0))
            - F.col("tie_sum").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    return agg.select("n1", "n2", u1.alias("u1"), z.alias("z"))


@register(
    "agg_bitmap_retention",
    oracle="""
    WITH mu AS (
        SELECT DISTINCT date_trunc('month', ts) AS m, user_id FROM events
    ),
    act AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n FROM mu GROUP BY m),
    ret AS (
        SELECT a.m AS m0, CAST(COUNT(*) AS BIGINT) AS retained
        FROM mu a JOIN mu b
          ON b.user_id = a.user_id AND b.m = a.m + INTERVAL 1 MONTH
        GROUP BY a.m
    )
    SELECT strftime(act.m, '%Y-%m') AS month,
           act.n AS active_users,
           COALESCE(ret.retained, 0) AS retained_next,
           CAST(COALESCE(ret.retained, 0) AS DOUBLE) / CAST(act.n AS DOUBLE)
               AS retention_rate
    FROM act LEFT JOIN ret ON ret.m0 = act.m
    """,
)
def agg_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month retained users via BITMAP SET ALGEBRA — the
    sketch-native way to intersect activity sets without re-touching
    raw events (the oracle is the equivalent COUNT(DISTINCT) self-join,
    so the bitmap path is hash-verified, the agg_bitmap_distinct
    contract).

    Spark ships OR-merge (`bitmap_or_agg`) but no AND, so intersection
    uses inclusion-exclusion per id bucket: |A∩B| = |A|+|B|−|A∪B|.
    Each month's per-bucket bitmap is built ONCE, then contributes to
    both its pairs (as current and as next month) — a 2× explode of
    tiny bitmap state, never of events. Popcounts add across buckets
    because buckets partition the id space. The rate is one exact
    int64 division. At 100 TB the bitmap state is O(users/2^15
    buckets × months) — the monthly frames a warehouse would persist.
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            F.date_trunc("month", "ts").alias("m"),
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("m", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
        .withColumn("cnt", F.bitmap_count("bm"))
    )
    act = per_bucket.groupBy("m").agg(F.sum("cnt").alias("active_users"))
    # Each month participates in pair(m) as A and pair(m-1 month) as B.
    a_rows = per_bucket.select(
        F.col("m").alias("pair"), "bucket", "bm", F.col("cnt").alias("cnt_a"),
        F.lit(None).cast("long").alias("cnt_b"),
    )
    b_rows = per_bucket.select(
        (F.col("m") - F.expr("INTERVAL 1 MONTH")).alias("pair"),
        "bucket",
        "bm",
        F.lit(None).cast("long").alias("cnt_a"),
        F.col("cnt").alias("cnt_b"),
    )
    both = a_rows.unionByName(b_rows)
    per_pair_bucket = both.groupBy("pair", "bucket").agg(
        F.sum("cnt_a").alias("ca"),
        F.sum("cnt_b").alias("cb"),
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("cu"),
    )
    # inclusion-exclusion only where BOTH months touched the bucket;
    # buckets seen by one month contribute 0 to the intersection.
    ret = (
        per_pair_bucket.where(F.col("ca").isNotNull() & F.col("cb").isNotNull())
        .groupBy("pair")
        .agg(F.sum(F.col("ca") + F.col("cb") - F.col("cu")).alias("retained"))
    )
    return (
        act.join(ret, act.m == ret.pair, "left")
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "active_users",
            F.coalesce("retained", F.lit(0)).alias("retained_next"),
            (
                F.coalesce("retained", F.lit(0)).cast("double")
                / F.col("active_users").cast("double")
            ).alias("retention_rate"),
        )
    )


@register(
    "ml_eval_auc",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    per_cents AS (
        SELECT cents,
               CAST(SUM(grp) AS BIGINT) AS n_a,
               CAST(COUNT(*) AS BIGINT) AS n_c
        FROM pop GROUP BY cents
    ),
    ranked AS (
        SELECT n_a, n_c,
               SUM(n_c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   - n_c AS cnt_less
        FROM per_cents
    ),
    agg AS (
        SELECT SUM(n_a * (CAST(cnt_less AS DOUBLE)
                          + (CAST(n_c AS DOUBLE) + 1.0) / 2.0)) AS r1,
               CAST(SUM(n_a) AS BIGINT) AS n1,
               CAST(SUM(n_c) - SUM(n_a) AS BIGINT) AS n2
        FROM ranked
    )
    SELECT n1 AS n_pos, n2 AS n_neg,
           (r1 - (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0)
               / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc
    FROM agg
    """,
)
def ml_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of `value` as a purchase-vs-click classifier, computed
    EXACTLY through the rank identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₂)
    — no threshold sweep, no trapezoid approximation, and ties get
    the standard ½ credit automatically via average ranks.

    Same distributed tie-aware ranking as stats_mannwhitney (per-cents
    prefix sums; every rank term dyadic → order-independent exact
    sums); the final expression is two exact operands and one IEEE
    division. One groupBy + one bounded window at any scale.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    pop = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_cents = pop.groupBy("cents").agg(
        F.sum("grp").alias("n_a"), F.count("*").alias("n_c")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_cents.select(
        "n_a",
        "n_c",
        (F.sum("n_c").over(w) - F.col("n_c")).alias("cnt_less"),
    )
    avg_rank = F.col("cnt_less").cast("double") + (
        F.col("n_c").cast("double") + F.lit(1.0)
    ) / F.lit(2.0)
    agg = ranked.agg(
        F.sum(F.col("n_a") * avg_rank).alias("r1"),
        F.sum("n_a").alias("n1"),
        (F.sum("n_c") - F.sum("n_a")).alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    auc = (F.col("r1") - (n1d * (n1d + F.lit(1.0))) / F.lit(2.0)) / (n1d * n2d)
    return agg.select(
        F.col("n1").alias("n_pos"), F.col("n2").alias("n_neg"), auc.alias("auc")
    )


@register(
    "agg_hhi",
    oracle="""
    WITH seg_cust AS (
        SELECT c.c_mktsegment AS seg, c.c_custkey,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    ),
    seg_tot AS (
        SELECT seg, CAST(SUM(cents) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM seg_cust GROUP BY seg
    ),
    shares AS (
        SELECT s.seg, (c.cents * 1000000) // s.total AS ppm
        FROM seg_cust c JOIN seg_tot s ON s.seg = c.seg
    )
    SELECT s.seg AS segment, t.n_cust,
           CAST(SUM(s.ppm * s.ppm) AS DOUBLE) / 1e12 AS hhi
    FROM shares s JOIN seg_tot t ON t.seg = s.seg
    GROUP BY s.seg, t.n_cust
    """,
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market segment —
    "is this segment's revenue dominated by a few customers?" (the
    antitrust statistic, equally at home measuring corpus-source or
    shard-key concentration).

    Shares are fixed-point ppm integers ((cents·10⁶) div total — the
    text_lm_score contract), so Σshare² is an exact int64 sum (ppm² ≤
    10¹², × customers ≪ 2⁶³) and the index is ONE division by 10¹².
    The naive Σ(cents²)/total² route would need DECIMAL(38) sums and
    hit the wide-decimal→double divergence (CLAUDE.md gotcha); ppm
    floor-quantization is deterministic on both engines and bounds the
    quantization error at n_cust·2·10⁻⁶ — document, don't approximate
    silently. Two keyed aggregates, one broadcastable totals join.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    orders = load_table(spark, sf_dir, "orders")
    seg_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("seg", "c_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    seg_tot = seg_cust.groupBy("seg").agg(
        F.sum("cents").alias("total"), F.count("*").alias("n_cust")
    )
    shares = seg_cust.join(F.broadcast(seg_tot), "seg").select(
        "seg", "n_cust", F.expr("(cents * 1000000L) div total").alias("ppm")
    )
    return shares.groupBy("seg", "n_cust").agg(
        (F.sum(F.col("ppm") * F.col("ppm")).cast("double") / F.lit(1e12)).alias(
            "hhi"
        )
    ).select(F.col("seg").alias("segment"), "n_cust", "hhi")


@register(
    "stats_srm_check",
    oracle="""
    WITH counts AS (
        SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
               / CAST(n_a + n_b AS DOUBLE) AS chi2,
           CASE WHEN (n_a - n_b) * (n_a - n_b) * 100
                     > 384 * (n_a + n_b)
                THEN 1 ELSE 0 END AS srm_flag
    FROM counts
    """,
)
def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard for a 50/50 experiment split — the
    first sanity check every experimentation platform runs before
    reading any metric (a biased assignment invalidates everything
    downstream). χ² = (n_a−n_b)²/(n_a+n_b) against the 3.84 critical
    value (α=0.05, 1 df), with the DECISION taken on the
    cross-multiplied INTEGER inequality (n_a−n_b)²·100 > 384·(n_a+n_b)
    so the flag never rides a float boundary. Assignment here is the
    deterministic user_id parity split; one distinct-users aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    counts = users.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n_b"),
    )
    diff = F.col("n_a") - F.col("n_b")
    tot = F.col("n_a") + F.col("n_b")
    return counts.select(
        "n_a",
        "n_b",
        ((diff * diff).cast("double") / tot.cast("double")).alias("chi2"),
        F.when(diff * diff * 100 > 384 * tot, 1).otherwise(0).alias("srm_flag"),
    )


@register(
    "stats_dispersion_poisson",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS s2
        FROM daily
    )
    SELECT n, s,
           (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) AS dispersion_index,
           CASE WHEN n * s2 - s * s > 2 * n * s THEN 1 ELSE 0 END
               AS overdispersed
    FROM agg
    """,
)
def stats_dispersion_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion check on the daily event-count series:
    index = variance/mean (≈1 for a Poisson process, >1 = bursty,
    <1 = throttled/regular) — the quick triage before fancier burst
    detection (``ts_burst_detect``) is worth running.

    Sufficient statistics (n, Σx, Σx²) are int64; the index is a
    fixed scalar chain over them, and the over-dispersion FLAG is the
    cross-multiplied integer inequality n·Σx² − (Σx)² > 2·n·Σx, so
    the decision never touches a float boundary. One day-grain
    aggregate, one 1-row reduction.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d")).agg(
        F.count("*").alias("x")
    )
    agg = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    s2d = F.col("s2").cast("double")
    return agg.select(
        "n",
        "s",
        ((nd * s2d - sd * sd) / (nd * sd)).alias("dispersion_index"),
        F.when(
            F.col("n") * F.col("s2") - F.col("s") * F.col("s")
            > 2 * F.col("n") * F.col("s"),
            1,
        )
        .otherwise(0)
        .alias("overdispersed"),
    )


@register(
    "stats_chi2_gof",
    oracle="""
    WITH slot AS (
        SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS BIGINT) AS dow,
               event_type
        FROM events
    ),
    o AS (
        SELECT dow, event_type, CAST(COUNT(*) AS BIGINT) AS o
        FROM slot GROUP BY dow, event_type
    ),
    s AS (
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(o) AS BIGINT) AS total,
               CAST(SUM(o * o) AS BIGINT) AS sum_sq
        FROM o GROUP BY dow
    )
    SELECT dow,
           k,
           total,
           CAST(k - 1 AS BIGINT) AS df,
           CAST((k * sum_sq - total * total) * 1000000 // total AS BIGINT)
               AS chi2_ppm,
           CAST(CASE WHEN (k * sum_sq - total * total) * 1000000 // total >
                          CASE k - 1 WHEN 1 THEN 3841459 WHEN 2 THEN 5991465
                               WHEN 3 THEN 7814728 WHEN 4 THEN 9487729
                               WHEN 5 THEN 11070498 WHEN 6 THEN 12591587
                               WHEN 7 THEN 14067140 WHEN 8 THEN 15507313
                               ELSE 16918978 END
                     THEN 1 ELSE 0 END AS BIGINT) AS reject_uniform
    FROM s
    """,
)
def stats_chi2_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit against a uniform category
    distribution, per day-of-week slice: is the event-type mix on each
    weekday consistent with "all types equally likely"?

    Integer-exact trick: with uniform expectation e = T/k, the
    statistic collapses algebraically to chi2 = (k*sum(o^2) - T^2) / T,
    a single exact rational reported in ppm fixed point (floor
    division is identical for the positive operands on both engines —
    Cauchy-Schwarz makes the numerator non-negative). The alpha=0.05
    critical values are ppm literals per df, so the reject flag is an
    integer comparison, no float CDF. Two map-side-combining
    aggregations; the second runs over k*7 rows — free at any scale.
    The weekday label is days-since-epoch mod 7 (0 = Thursday) because
    the engines disagree on dayofweek() numbering (Spark Sunday=1,
    DuckDB Sunday=0) but share integer date arithmetic exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")) % 7
    )
    o = (
        ev.select(dow.cast("long").alias("dow"), "event_type")
        .groupBy("dow", "event_type")
        .agg(F.count("*").alias("o"))
    )
    s = o.groupBy("dow").agg(
        F.count("*").alias("k"),
        F.sum("o").alias("total"),
        F.sum(F.col("o") * F.col("o")).alias("sum_sq"),
    )
    chi2 = F.expr("(k * sum_sq - total * total) * 1000000 div total")
    crit = F.expr(
        "CASE k - 1 WHEN 1 THEN 3841459 WHEN 2 THEN 5991465"
        " WHEN 3 THEN 7814728 WHEN 4 THEN 9487729 WHEN 5 THEN 11070498"
        " WHEN 6 THEN 12591587 WHEN 7 THEN 14067140 WHEN 8 THEN 15507313"
        " ELSE 16918978 END"
    )
    return s.select(
        "dow",
        "k",
        "total",
        (F.col("k") - 1).alias("df"),
        chi2.alias("chi2_ppm"),
        F.when(chi2 > crit, 1).otherwise(0).cast("long").alias("reject_uniform"),
    )


@register(
    "ml_eval_calibration",
    oracle="""
    WITH scored AS (
        SELECT CAST(CAST('0x' || substr(md5('cal:' || CAST(o_orderkey AS VARCHAR)),
                         1, 8) AS BIGINT) % 1000000 AS BIGINT) AS score_ppm,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        FROM orders
    ),
    bins AS (
        SELECT score_ppm // 100000 AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(label) AS BIGINT) AS pos,
               CAST(SUM(score_ppm) AS BIGINT) AS score_sum
        FROM scored GROUP BY score_ppm // 100000
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, pos,
           CAST(pos * 1000000 // n AS BIGINT) AS rate_ppm,
           CAST(score_sum // n AS BIGINT) AS mean_score_ppm,
           CAST(abs(pos * 1000000 // n - score_sum // n) AS BIGINT)
               AS gap_ppm
    FROM bins
    """,
)
def ml_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability-diagram table: decile-binned
    predicted probability vs observed positive rate, plus the per-bin
    |confidence − accuracy| gap (the ingredient of expected
    calibration error). The "model scores" are the engine-portable
    32-bit md5-prefix hash in ppm (deterministic, identical bits on
    both engines — the repo's standard stand-in for a model column the
    sandbox can't produce); labels are a real data property.

    All ratios are positive-integer floor divisions — exact on both
    engines. One groupBy over 10 bins with map-side combine: at 100 TB
    the shuffle carries ≤10 rows per task. Swap the hash for a real
    score column and nothing else changes.
    """
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cal:"), F.col("o_orderkey").cast("string")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    scored = orders.select(
        (h % 1000000).alias("score_ppm"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    bins = scored.groupBy(
        F.expr("score_ppm div 100000").cast("bigint").alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.sum("label").alias("pos"),
        F.sum("score_ppm").alias("score_sum"),
    )
    return bins.select(
        "bin",
        "n",
        "pos",
        F.expr("pos * 1000000 div n").cast("bigint").alias("rate_ppm"),
        F.expr("score_sum div n").cast("bigint").alias("mean_score_ppm"),
        F.expr("abs(pos * 1000000 div n - score_sum div n)")
        .cast("bigint")
        .alias("gap_ppm"),
    )


@register(
    "stats_permutation_test",
    oracle="""
    WITH base AS (
        SELECT event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    obs AS (
        SELECT CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN g = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN g = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1
        FROM base
    ),
    perms AS (
        SELECT p.p,
               CASE WHEN CAST('0x' || substr(md5(CAST(p.p AS VARCHAR) || ':'
                        || CAST(b.event_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
                    = 0 THEN 0 ELSE 1 END AS g,
               b.cents
        FROM base b
        CROSS JOIN (SELECT unnest(range(0, 100)) AS p) p
    ),
    pstats AS (
        SELECT p,
               SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN g = 0 THEN cents ELSE 0 END) AS s0,
               SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN g = 1 THEN cents ELSE 0 END) AS s1
        FROM perms GROUP BY p
    ),
    extreme AS (
        SELECT CAST(SUM(CASE WHEN p.n0 = 0 OR p.n1 = 0 THEN 1
                    WHEN CAST(abs(p.s0 * p.n1 - p.s1 * p.n0) AS HUGEINT)
                         * (o.n0 * o.n1)
                         >= CAST(abs(o.s0 * o.n1 - o.s1 * o.n0) AS HUGEINT)
                           * (p.n0 * p.n1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM pstats p CROSS JOIN obs o
    )
    SELECT o.n0, o.s0 AS s0_cents, o.n1, o.s1 AS s1_cents,
           e.n_extreme,
           CAST((1 + e.n_extreme) * 1000000 // 101 AS BIGINT) AS p_value_ppm
    FROM obs o CROSS JOIN extreme e
    """,
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation) test for a difference in group
    means, made hash-exact: 100 deterministic label reshuffles via the
    engine-portable 60-bit md5 hash, and the per-replicate decision
    |m0−m1| ≥ |m0−m1|_obs evaluated by cross-multiplication —
    |s0·n1 − s1·n0| · (n0ᵒn1ᵒ) ≥ |s0ᵒn1ᵒ − s1ᵒn0ᵒ| · (n0·n1) — in
    wide integers (DECIMAL(38,0) / HUGEINT), so no float mean ever
    exists and the p-value is an exact add-one-smoothed ppm integer.
    Degenerate replicates (a group emptied) count as extreme on both
    engines.

    Scale shape: the replicate axis is an explode BEFORE the partial
    aggregate, so each map task pre-reduces its rows into ≤100
    (replicate × group) cells — the shuffle carries 200 numbers per
    task no matter the row count (the count-min / bootstrap pattern).
    The md5 is the portability tax; swap for xxhash64 when the oracle
    twin isn't needed.
    """
    from e2e_data_pipeline_spark.catalog import rebalance_cpu

    # r10: the 100-replicate explode does ~100 md5 hashes per input
    # row before its partial aggregate — CPU-bound, so the
    # single-row-group fixture scan must be re-spread (layout-gated;
    # no-op at production layouts). 3.5 s -> sub-second at sf0.1.
    base = (
        rebalance_cpu(
            spark, load_table(spark, sf_dir, "events"), sf_dir, "events"
        )
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )

    def gstats(df: DataFrame, *keys: str) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("g") == 0, F.col("cents")).otherwise(0)).alias("s0"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("g") == 1, F.col("cents")).otherwise(0)).alias("s1"),
        )

    obs = gstats(base)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("p").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    perms = base.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(99))).alias("p"),
    ).select("p", "cents", (h % 2).alias("g"))
    pstats = gstats(perms, "p")
    o = obs.select(
        F.col("n0").alias("on0"),
        F.col("s0").alias("os0"),
        F.col("n1").alias("on1"),
        F.col("s1").alias("os1"),
    )
    extreme = (
        pstats.crossJoin(F.broadcast(o))
        .select(
            F.when((F.col("n0") == 0) | (F.col("n1") == 0), 1)
            .when(
                F.expr(
                    "CAST(abs(s0 * n1 - s1 * n0) AS DECIMAL(38,0))"
                    " * CAST(on0 * on1 AS DECIMAL(38,0))"
                    " >= CAST(abs(os0 * on1 - os1 * on0) AS DECIMAL(38,0))"
                    " * CAST(n0 * n1 AS DECIMAL(38,0))"
                ),
                1,
            )
            .otherwise(0)
            .alias("x")
        )
        .agg(F.sum("x").alias("n_extreme"))
    )
    return (
        obs.crossJoin(F.broadcast(extreme))
        .select(
            "n0",
            F.col("s0").alias("s0_cents"),
            "n1",
            F.col("s1").alias("s1_cents"),
            "n_extreme",
            F.expr("(1 + n_extreme) * 1000000 div 101")
            .cast("bigint")
            .alias("p_value_ppm"),
        )
    )


@register(
    "stats_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY epoch_us(ts) // 86400000000
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                             WHEN b.cents < a.cents THEN -1
                             ELSE 0 END) AS BIGINT) AS s
        FROM daily a JOIN daily b ON a.day < b.day
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    ties AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
            AS tie_adj
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY cents)
        WHERE t > 1
    )
    SELECT n.n, s.s,
           CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_adj AS BIGINT)
               AS var18,
           CAST(CASE WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
                     WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END
                / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_adj
                            AS DOUBLE) / 18) AS DOUBLE) AS z_score
    FROM n CROSS JOIN s CROSS JOIN ties t
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on the daily revenue series —
    the nonparametric "is it really trending" answer behind
    win_rolling_slope's point estimates, robust to outliers and
    distribution shape. S sums pairwise order signs over the
    day-grain series; the tie-corrected variance stays ×18 as an exact
    integer column (var18), and the continuity-corrected z is three
    portable float steps on exact integers (divide, sqrt — IEEE
    correctly-rounded on both engines — divide), so even the float is
    bit-identical.

    The pairwise self-join runs on the DAILY aggregate (one row per
    day — bounded by calendar span, not data volume); the fact scan
    reduces map-side first. This is the sanctioned place for an O(k²)
    kernel: k = days, never rows.
    """
    daily = events_daily(spark, sf_dir).select("day", "cents")
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(
            F.when(F.col("b.cents") > F.col("a.cents"), 1)
            .when(F.col("b.cents") < F.col("a.cents"), -1)
            .otherwise(0)
        ).alias("s")
    )
    n = daily.agg(F.count("*").alias("n"))
    ties = (
        daily.groupBy("cents")
        .agg(F.count("*").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            ).alias("tie_adj")
        )
    )
    return (
        n.crossJoin(s)
        .crossJoin(ties)
        # empty in, empty out: var18 = 0 (n = 0 on a zero-row input,
        # or a fully-tied degenerate series) would raise ANSI
        # DIVIDE_BY_ZERO in the z projection; any real day series
        # keeps the row
        .where(F.expr("n * (n - 1) * (2 * n + 5) - tie_adj > 0"))
        .select(
            "n",
            "s",
            F.expr("n * (n - 1) * (2 * n + 5) - tie_adj")
            .cast("bigint")
            .alias("var18"),
            F.expr(
                "CAST(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)"
                " WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)"
                " ELSE CAST(0 AS DOUBLE) END"
                " / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS DOUBLE)"
                " / 18) AS DOUBLE)"
            ).alias("z_score"),
        )
    )


@register(
    "stats_bootstrap_ci",
    oracle="""
    WITH base AS (
        SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    obs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents) * 1000000 // COUNT(*) AS BIGINT) AS mean_ppm
        FROM base
    ),
    reps AS (
        SELECT b.p,
               CASE
                 WHEN b.h < 367879 THEN 0 WHEN b.h < 735759 THEN 1
                 WHEN b.h < 919699 THEN 2 WHEN b.h < 981012 THEN 3
                 ELSE 4 END AS w,
               b.cents
        FROM (
            SELECT b.event_id, b.cents, p.p,
                   CAST('0x' || substr(md5('boot:' || CAST(p.p AS VARCHAR)
                        || ':' || CAST(b.event_id AS VARCHAR)), 1, 15)
                        AS BIGINT) % 1000000 AS h
            FROM base b
            CROSS JOIN (SELECT unnest(range(0, 100)) AS p) p
        ) b
    ),
    rstats AS (
        SELECT p,
               SUM(w * cents) * 1000000 // NULLIF(SUM(w), 0) AS mean_ppm
        FROM reps GROUP BY p
    ),
    ranked AS (
        SELECT mean_ppm,
               row_number() OVER (ORDER BY mean_ppm, p) AS rn
        FROM rstats
    )
    SELECT o.n, o.s AS s_cents, o.mean_ppm,
           CAST(MIN(CASE WHEN r.rn = 5 THEN r.mean_ppm END) AS BIGINT)
               AS ci_lo_ppm,
           CAST(MIN(CASE WHEN r.rn = 95 THEN r.mean_ppm END) AS BIGINT)
               AS ci_hi_ppm
    FROM ranked r CROSS JOIN obs o
    GROUP BY o.n, o.s, o.mean_ppm
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poissonized bootstrap confidence interval for the mean purchase
    value, hash-exact: each of 100 replicates draws a deterministic
    Poisson(1) weight per row by inverting the CDF on the portable
    md5 hash (ppm thresholds 367879/735759/919699/981012 — the
    streaming-friendly "online bootstrap" that avoids with-replacement
    sampling entirely), replicate means are floor-divided ppm
    integers, and the 90% CI is the 5th/95th order statistic of the
    100 means — discrete ranks, no interpolation, no floats anywhere.

    Scale shape: identical to stats_permutation_test — the replicate
    axis explodes below the partial aggregate, so each map task ships
    ≤100 (replicate, sum, count) cells; the 100-row rank window is
    driver-trivial. The md5 is again the oracle-portability tax.
    """
    base = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    obs = base.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.expr("SUM(cents) * 1000000 div COUNT(*)").cast("bigint").alias("mean_ppm"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("p").cast("string"),
                    F.lit(":"),
                    F.col("event_id").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    reps = (
        base.select(
            "event_id", "cents", F.explode(F.sequence(F.lit(0), F.lit(99))).alias("p")
        )
        .select("p", "cents", (h % 1000000).alias("h"))
        .select(
            "p",
            "cents",
            F.when(F.col("h") < 367879, 0)
            .when(F.col("h") < 735759, 1)
            .when(F.col("h") < 919699, 2)
            .when(F.col("h") < 981012, 3)
            .otherwise(4)
            .alias("w"),
        )
    )
    rstats = reps.groupBy("p").agg(
        F.expr("SUM(w * cents) * 1000000 div NULLIF(SUM(w), 0)").alias("mean_ppm")
    )
    ranked = rstats.select(
        "mean_ppm", F.row_number().over(Window.orderBy("mean_ppm", "p")).alias("rn")
    )
    ci = ranked.agg(
        F.min(F.when(F.col("rn") == 5, F.col("mean_ppm"))).alias("ci_lo_ppm"),
        F.min(F.when(F.col("rn") == 95, F.col("mean_ppm"))).alias("ci_hi_ppm"),
    )
    return obs.crossJoin(F.broadcast(ci)).select(
        "n",
        F.col("s").alias("s_cents"),
        "mean_ppm",
        F.col("ci_lo_ppm").cast("bigint").alias("ci_lo_ppm"),
        F.col("ci_hi_ppm").cast("bigint").alias("ci_hi_ppm"),
    )


@register(
    "agg_lorenz_points",
    oracle="""
    WITH c AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS rn,
               SUM(cents) OVER (ORDER BY cents, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents
        FROM c
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        FROM c
    )
    SELECT CAST((r.rn - 1) * 20 // t.n + 1 AS BIGINT) AS ventile,
           CAST(MAX(r.rn) * 1000000 // t.n AS BIGINT) AS pop_share_ppm,
           CAST(CAST(MAX(r.cum_cents) AS HUGEINT) * 1000000 // t.s AS BIGINT)
               AS wealth_share_ppm
    FROM ranked r CROSS JOIN tot t
    GROUP BY (r.rn - 1) * 20 // t.n, t.n, t.s
    """,
)
def agg_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve sample points: customers ranked by spend, the
    cumulative wealth share at each exact population ventile — the
    chart-ready companion to agg_gini's scalar (same exact-integer
    machinery: cents, deterministic (cents, custkey) tie-break,
    running sums, ppm floor divisions). Each of the 20 ventile
    buckets contributes its LAST rank (cumulative share is monotone in
    the rank order, so MAX(rn) and MAX(cum) coincide), giving exactly
    20 rows for any customer count n — no divisibility assumption —
    with every share an exact rational in ppm.

    One customer aggregate, then the DISTRIBUTED global rank+prefix-sum
    (``registry.global_rank``: range-repartition + per-partition
    offsets — no single-partition Exchange), with the grand totals
    coming out of the same per-partition collect as literals.
    """
    c = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "cents"
            )
        )
    )
    ranked, n, sums = global_rank(
        c, [F.col("cents").asc(), F.col("o_custkey").asc()], sum_cols=("cents",)
    )
    n = max(n, 1)
    s = max(sums["cents"], 1)
    return (
        ranked.groupBy(
            F.expr(f"(rn - 1) * 20 div {n} + 1").cast("bigint").alias("ventile")
        )
        .agg(
            F.expr(f"MAX(rn) * 1000000 div {n}")
            .cast("bigint")
            .alias("pop_share_ppm"),
            # widen before the x1e6 product: cum_cents * 1e6 can pass
            # 2^63 (Spark DECIMAL(38) div bigint == DuckDB HUGEINT //)
            F.expr(
                f"CAST(MAX(cum_cents) AS DECIMAL(38,0)) * 1000000 div {s}"
            )
            .cast("bigint")
            .alias("wealth_share_ppm"),
        )
        .select("ventile", "pop_share_ppm", "wealth_share_ppm")
    )


@register(
    "ml_split_stratified",
    oracle="""
    WITH assigned AS (
        SELECT o_orderpriority,
               CASE WHEN CAST('0x' || substr(md5('split:'
                        || CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
                        % 100 < 80
                    THEN 'train' ELSE 'test' END AS split
        FROM orders
    ),
    cells AS (
        SELECT o_orderpriority, split, CAST(COUNT(*) AS BIGINT) AS n
        FROM assigned GROUP BY o_orderpriority, split
    ),
    strata AS (
        SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS stratum_n
        FROM cells GROUP BY o_orderpriority
    )
    SELECT c.o_orderpriority, c.split, c.n,
           CAST(c.n * 1000000 // s.stratum_n AS BIGINT) AS share_ppm
    FROM cells c JOIN strata s USING (o_orderpriority)
    """,
)
def ml_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/test split with a stratification audit —
    the data-prep step every ML pipeline starts with, done the only
    way that survives reruns and backfills: membership is a pure
    function of the row key (portable 60-bit md5 hash mod 100, 80/20),
    never a random() that reshuffles on every execution. The audit
    reports each stratum's achieved split share in exact ppm so
    drift from 800000 is a number, not a vibe.

    Hash-assign is map-only; the audit is one grouped count plus a
    stratum-total join (k×2 rows). At 100 TB membership never
    materializes — any consumer recomputes it from the key, which is
    the point of hash splits.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("split:"), F.col("o_orderkey").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    assigned = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(h % 100 < 80, "train").otherwise("test").alias("split"),
    )
    cells = assigned.groupBy("o_orderpriority", "split").agg(
        F.count("*").alias("n")
    )
    strata = cells.groupBy("o_orderpriority").agg(
        F.sum("n").alias("stratum_n")
    )
    return cells.join(F.broadcast(strata), "o_orderpriority").select(
        "o_orderpriority",
        "split",
        "n",
        F.expr("n * 1000000 div stratum_n").cast("bigint").alias("share_ppm"),
    )


@register(
    "agg_recency_score",
    oracle="""
    WITH mx AS (SELECT MAX(epoch_us(ts) // 1000000) AS mx FROM events),
    scored AS (
        SELECT user_id,
               CAST(ROUND(value * 100, 0) AS BIGINT)
                   >> CAST(least(((SELECT mx FROM mx)
                        - epoch_us(ts) // 1000000) // 86400 // 7, 40)
                        AS BIGINT) AS decayed
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(decayed) AS BIGINT) AS recency_score
    FROM scored GROUP BY user_id
    ORDER BY recency_score DESC, user_id LIMIT 20
    """,
)
def agg_recency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score with a 7-day half-life —
    exponential time decay made EXACT by restricting the decay base to
    powers of two: weight(age) = 2^-(age/7 days) becomes an integer
    right-shift of the cent value by (age_days div 7), capped at 40
    shifts (past ~9 months everything is 0). No exp(), no float decay
    drift, and the score is additive so it map-side combines like any
    sum — the trick that lets a leaderboard over trillions of events
    keep exact integer semantics.

    One scan with a broadcast global max timestamp, one groupBy,
    top-20 via TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    mx = ev.agg(F.max(sec).alias("mx"))
    scored = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(
            "CAST(ROUND(value * 100, 0) AS BIGINT)"
            " >> CAST(least((mx - CAST(CAST(ts AS TIMESTAMP) AS LONG))"
            " div 86400 div 7, 40) AS BIGINT)"
        ).alias("decayed"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("decayed").alias("recency_score"),
        )
        .orderBy(F.desc("recency_score"), "user_id")
        .limit(20)
    )


@register(
    "ml_target_encoding",
    oracle="""
    WITH labeled AS (
        SELECT o_orderpriority AS cat,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    g AS (
        SELECT cat,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS s_g
        FROM labeled GROUP BY cat
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
        FROM labeled
    )
    SELECT g.cat, g.n_g, g.s_g,
           CAST(g.s_g * 1000000 // g.n_g AS BIGINT) AS raw_rate_ppm,
           CAST(CAST(g.s_g * t.n + 10 * t.s AS DOUBLE)
                / CAST(t.n * (g.n_g + 10) AS DOUBLE) AS DOUBLE)
               AS enc_smoothed
    FROM g CROSS JOIN tot t
    """,
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding for a categorical feature — the
    high-cardinality-categorical workhorse: encode(cat) =
    (s_g + m·prior)/(n_g + m) with m=10 shrinking rare categories
    toward the global rate. The two-division float form drifts across
    engines, so the expression is algebraically collapsed to ONE
    division of exact integers: (s_g·N + m·S) / (N·(n_g + m)) — both
    engines perform the identical single IEEE rounding, making even
    the double output hash-exact (the win_rolling_slope recipe).

    Two aggregates (category-sized + 1-row broadcast) and O(k) final
    arithmetic. At serving time this table broadcasts as the encoder
    dim — the same artifact a feature store would materialize.
    """
    labeled = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = labeled.groupBy("cat").agg(
        F.count("*").alias("n_g"), F.sum("y").alias("s_g")
    )
    tot = labeled.agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    return g.crossJoin(F.broadcast(tot)).select(
        "cat",
        "n_g",
        "s_g",
        F.expr("s_g * 1000000 div n_g").cast("bigint").alias("raw_rate_ppm"),
        F.expr(
            "CAST(CAST(s_g * n + 10 * s AS DOUBLE)"
            " / CAST(n * (n_g + 10) AS DOUBLE) AS DOUBLE)"
        ).alias("enc_smoothed"),
    )


@register(
    "agg_kmv_sketch",
    oracle="""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type,
               CAST('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                    1, 15) AS BIGINT) AS h
        FROM du
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hashed
    ),
    kth AS (
        SELECT event_type, CAST(h AS BIGINT) AS h_k
        FROM ranked WHERE rn = 64
    ),
    exact AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM du GROUP BY event_type
    )
    SELECT e.event_type, e.n_exact,
           CAST(COALESCE(k.h_k, 0) AS BIGINT) AS h_k,
           CAST(CASE WHEN k.h_k IS NULL THEN e.n_exact
                ELSE CAST(63 AS HUGEINT) * 1152921504606846976 // k.h_k
                END AS BIGINT) AS kmv_estimate,
           CAST(abs(CASE WHEN k.h_k IS NULL THEN e.n_exact
                    ELSE CAST(63 AS HUGEINT) * 1152921504606846976 // k.h_k
                    END - e.n_exact) * 1000000 // e.n_exact AS BIGINT)
               AS err_ppm
    FROM exact e LEFT JOIN kth k USING (event_type)
    """,
)
def agg_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch — the mergeable
    cardinality estimator that, unlike HLL, is fully DETERMINISTIC
    given a hash function, so with the engine-portable 60-bit hash the
    sketch itself is oracle-checkable bit for bit (agg_approx's HLL
    gets only a rows-only check; this is the exact-verifiable
    alternative). Estimate = (k−1)·2⁶⁰ div h₍ₖ₎ with k=64 — the
    numerator needs 66 bits, done in DECIMAL(38) on Spark and HUGEINT
    in DuckDB (verified identical integral division). Types with
    fewer than k members fall back to their exact count. The achieved
    error vs the true distinct count rides along in ppm — the sketch
    audits itself in the same query.

    Scale: a KMV sketch is a bounded k-row state per group — the
    per-type top-64-smallest is a WindowGroupLimit (rank ≤ k pushes
    into the sort), and sketches MERGE by keeping the k smallest of a
    union, the property that makes distributed/partial aggregation
    work at 100 TB.
    """
    du = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("kmv:"), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = du.select("event_type", h.alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 64)
        .select("event_type", F.col("h").alias("h_k"))
    )
    exact = du.groupBy("event_type").agg(F.count("*").alias("n_exact"))
    est = (
        "CASE WHEN h_k IS NULL THEN n_exact"
        " ELSE CAST(63 AS DECIMAL(38,0))"
        " * CAST(1152921504606846976 AS DECIMAL(38,0))"
        " div CAST(h_k AS DECIMAL(38,0)) END"
    )
    return (
        exact.join(kth, "event_type", "left")
        .select(
            "event_type",
            "n_exact",
            F.coalesce(F.col("h_k"), F.lit(0)).cast("bigint").alias("h_k"),
            F.expr(est).cast("bigint").alias("kmv_estimate"),
            F.expr(f"abs(({est}) - n_exact) * 1000000 div n_exact")
            .cast("bigint")
            .alias("err_ppm"),
        )
    )


@register(
    "agg_kmv_jaccard",
    oracle="""
    WITH views AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    ),
    buys AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    uni AS (
        SELECT user_id FROM views UNION SELECT user_id FROM buys
    ),
    hashed AS (
        SELECT u.user_id,
               CAST('0x' || substr(md5('kmv:' || CAST(u.user_id AS VARCHAR)),
                    1, 15) AS BIGINT) AS h,
               CASE WHEN v.user_id IS NOT NULL AND b.user_id IS NOT NULL
                    THEN 1 ELSE 0 END AS in_both
        FROM uni u
        LEFT JOIN views v ON v.user_id = u.user_id
        LEFT JOIN buys b ON b.user_id = u.user_id
    ),
    bottomk AS (
        SELECT in_both FROM (
            SELECT in_both, row_number() OVER (ORDER BY h) AS rn FROM hashed
        ) WHERE rn <= 64
    ),
    est AS (
        SELECT CAST(SUM(in_both) AS BIGINT) AS k_both,
               CAST(COUNT(*) AS BIGINT) AS k_used
        FROM bottomk
    ),
    exact AS (
        SELECT CAST(SUM(in_both) AS BIGINT) AS n_inter,
               CAST(COUNT(*) AS BIGINT) AS n_union
        FROM hashed
    )
    SELECT x.n_inter, x.n_union,
           CAST(x.n_inter * 1000000 // x.n_union AS BIGINT)
               AS jaccard_exact_ppm,
           e.k_both, e.k_used,
           CAST(e.k_both * 1000000 // e.k_used AS BIGINT)
               AS jaccard_kmv_ppm
    FROM exact x CROSS JOIN est e
    """,
)
def agg_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity estimation from merged KMV sketches: the Jaccard
    of (viewers, purchasers) estimated as the fraction of the union's
    k minimum hash values that belong to both sets — the classic
    bottom-k estimator whose whole point at scale is that each side
    keeps only k=64 hashes, yet here it's fully deterministic and the
    oracle checks both the estimate AND the exact Jaccard it
    approximates in one result row (self-auditing, like
    agg_kmv_sketch). All ratios are exact ppm floor divisions.

    Scale shape: both membership flags ride one union + two
    broadcast-joinable distinct sets; the bottom-k is a single
    64-row WindowGroupLimit. In a real deployment the two sketches
    arrive pre-built from different pipelines and merge in O(k) —
    this query IS that merge, just with the build inline.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("user_id").distinct()
    buys = (
        ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    uni = views.unionAll(buys).distinct()
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("kmv:"), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = (
        uni.join(views.withColumn("v", F.lit(1)), "user_id", "left")
        .join(buys.withColumn("b", F.lit(1)), "user_id", "left")
        .select(
            h.alias("h"),
            F.when(F.col("v").isNotNull() & F.col("b").isNotNull(), 1)
            .otherwise(0)
            .alias("in_both"),
        )
    )
    w = Window.orderBy("h")
    bottomk = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 64
    )
    est = bottomk.agg(
        F.sum("in_both").alias("k_both"), F.count("*").alias("k_used")
    )
    exact = hashed.agg(
        F.sum("in_both").alias("n_inter"), F.count("*").alias("n_union")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_inter",
        "n_union",
        F.expr("n_inter * 1000000 div n_union").cast("bigint").alias(
            "jaccard_exact_ppm"
        ),
        "k_both",
        "k_used",
        F.expr("k_both * 1000000 div k_used").cast("bigint").alias(
            "jaccard_kmv_ppm"
        ),
    )


@register(
    "ml_decision_stump",
    oracle="""
    WITH pts AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               o_orderstatus AS cls
        FROM orders
    ),
    ranked AS (
        SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM pts
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pts),
    cands AS (
        SELECT DISTINCT 2 * r.cents AS t2
        FROM ranked r CROSS JOIN nn
        JOIN (SELECT unnest(range(1, 10)) AS k) ks
          ON r.rn = greatest(1, (nn.c * ks.k) // 10)
    ),
    cells AS (
        SELECT c.t2,
               CASE WHEN 2 * p.cents <= c.t2 THEN 0 ELSE 1 END AS side,
               p.cls, CAST(COUNT(*) AS BIGINT) AS n
        FROM pts p CROSS JOIN cands c
        GROUP BY c.t2, side, p.cls
    ),
    sides AS (
        SELECT t2, side, CAST(SUM(n) AS BIGINT) AS n_side,
               CAST(SUM(n * n) AS BIGINT) AS sum_sq
        FROM cells GROUP BY t2, side
    ),
    scored AS (
        SELECT l.t2,
               l.n_side AS nl, r.n_side AS nr,
               CAST(CAST(l.sum_sq * r.n_side + r.sum_sq * l.n_side AS DOUBLE)
                    / CAST(l.n_side * r.n_side AS DOUBLE) AS DOUBLE)
                   AS purity
        FROM sides l JOIN sides r ON r.t2 = l.t2
        WHERE l.side = 0 AND r.side = 1
    )
    SELECT t2 AS threshold_half_cents, nl, nr, purity
    FROM (
        SELECT *, row_number() OVER (ORDER BY purity DESC, t2) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training (the boosting base learner and the
    one-feature CART step): pick the split threshold on order value
    that best separates order-status classes by Gini impurity.
    Minimizing weighted Gini ≡ maximizing Σ|left classes|²/n_left +
    Σ|right|²/n_right, evaluated as ONE division of exact integer
    sums (numerator < 2⁵³, so the double sort key is bit-identical —
    the win_rolling_slope recipe again). Candidate thresholds are the
    DISCRETE decile order statistics (rank (n·k) div 10 — interpolated
    quantiles were rejected: a 0.9 fractional weight is not dyadic and
    the engines' interpolation formulas differ by 1 ulp); argmax
    tie-breaks on the threshold.

    Scale: candidates broadcast, one (threshold × side × class)
    grouped count over the data — 9·2·k cells per map task — then
    O(9) scoring. Deeper trees = iterate the same split primitive
    per node partition.
    """
    pts = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.col("o_orderstatus").alias("cls"),
    )
    ranked = pts.select(
        "cents", F.row_number().over(Window.orderBy("cents")).alias("rn")
    )
    nn = pts.agg(F.count("*").alias("c"))
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    cands = (
        ranked.crossJoin(F.broadcast(nn))
        .join(
            F.broadcast(ks),
            F.col("rn") == F.greatest(F.lit(1), F.expr("(c * k) div 10")),
        )
        .select((2 * F.col("cents")).alias("t2"))
        .distinct()
    )
    cells = (
        pts.crossJoin(F.broadcast(cands))
        .groupBy(
            "t2",
            F.when(2 * F.col("cents") <= F.col("t2"), 0).otherwise(1).alias(
                "side"
            ),
            "cls",
        )
        .agg(F.count("*").alias("n"))
    )
    sides = cells.groupBy("t2", "side").agg(
        F.sum("n").alias("n_side"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    left = sides.where(F.col("side") == 0).select(
        "t2", F.col("n_side").alias("nl"), F.col("sum_sq").alias("lsq")
    )
    right = sides.where(F.col("side") == 1).select(
        "t2", F.col("n_side").alias("nr"), F.col("sum_sq").alias("rsq")
    )
    scored = left.join(right, "t2").select(
        "t2",
        "nl",
        "nr",
        F.expr(
            "CAST(CAST(lsq * nr + rsq * nl AS DOUBLE)"
            " / CAST(nl * nr AS DOUBLE) AS DOUBLE)"
        ).alias("purity"),
    )
    w = Window.orderBy(F.desc("purity"), "t2")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("t2").alias("threshold_half_cents"), "nl", "nr", "purity"
        )
    )


@register(
    "stats_cuped",
    oracle="""
    WITH bounds AS (
        SELECT (MIN(epoch_us(ts) // 86400000000)
              + MAX(epoch_us(ts) // 86400000000) + 1) // 2 AS mid
        FROM events
    ),
    per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000
                                  < (SELECT mid FROM bounds)
                        THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000
                                  >= (SELECT mid FROM bounds)
                        THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y,
               CAST('0x' || substr(md5('cuped:' || CAST(user_id AS VARCHAR)),
                    1, 15) AS BIGINT) % 2 AS variant
        FROM events GROUP BY user_id
    ),
    pooled AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx
        FROM per_user
    ),
    theta AS (
        SELECT n, sx,
               (SELECT ((c - ((c % v) + v) % v) // v)
                FROM (SELECT (n * sxy - sx * sy) * 1048576 AS c,
                             n * sxx - sx * sx AS v)) AS theta_micro
        FROM pooled
    ),
    per_variant AS (
        SELECT variant,
               CAST(COUNT(*) AS HUGEINT) AS nv,
               CAST(SUM(x) AS HUGEINT) AS sxv,
               CAST(SUM(y) AS HUGEINT) AS syv
        FROM per_user GROUP BY variant
    )
    SELECT CAST(v.variant AS BIGINT) AS variant,
           CAST(v.nv AS BIGINT) AS n_users,
           CAST(v.syv AS BIGINT) AS post_cents,
           CAST(t.theta_micro AS BIGINT) AS theta_micro,
           CAST(CAST(v.syv AS DOUBLE) / CAST(v.nv AS DOUBLE) AS DOUBLE)
               AS raw_mean_cents,
           CAST((CAST(v.syv AS DOUBLE) * 1048576.0 * CAST(t.n AS DOUBLE)
                 - CAST(t.theta_micro AS DOUBLE)
                   * (CAST(v.sxv AS DOUBLE) * CAST(t.n AS DOUBLE)
                      - CAST(t.sx AS DOUBLE) * CAST(v.nv AS DOUBLE)))
                / (CAST(v.nv AS DOUBLE) * CAST(t.n AS DOUBLE) * 1048576.0)
               AS DOUBLE) AS cuped_mean_cents
    FROM per_variant v CROSS JOIN theta t
    """,
)
def stats_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the experimentation-platform
    workhorse: adjust each variant's post-period metric by
    θ·(X − E[X]) using pre-period covariate X, shrinking variance by
    the pre/post correlation². All moments are exact wide integers
    (HUGEINT / DECIMAL(38) — Σxy overflows int64 at real user
    counts); θ is kept as a ×2²⁰ fixed-point integer via the
    pmod-floor division (C can be negative — trunc vs floor differs
    across engines), and each reported mean is ONE double division of
    exact scale-0 integers, so even the floats hash identically (the
    wide-decimal→double hazard only bites at nonzero decimal scale).
    Variant assignment is the rerun-stable md5 split of
    ml_split_stratified.

    One per-user aggregate, a 1-row pooled-moment reduce, and O(2)
    final arithmetic — the entire adjustment is map-side-combinable
    sums, which is why CUPED scales to every experiment at once.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400")
    bounds = ev.agg(
        ((F.min(day) + F.max(day) + 1) / 2).cast("long").alias("mid")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("cuped:"), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.when(day < F.col("mid"), cents).otherwise(0).alias("xc"),
            F.when(day >= F.col("mid"), cents).otherwise(0).alias("yc"),
        )
        .groupBy("user_id")
        .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y"))
        .select("user_id", "x", "y", (h % 2).alias("variant"))
    )
    d = "DECIMAL(38,0)"
    pooled = per_user.agg(
        F.expr(f"CAST(COUNT(*) AS {d})").alias("n"),
        F.expr(f"CAST(SUM(x) AS {d})").alias("sx"),
        F.expr(f"CAST(SUM(y) AS {d})").alias("sy"),
        F.expr(f"SUM(CAST(x AS {d}) * CAST(y AS {d}))").alias("sxy"),
        F.expr(f"SUM(CAST(x AS {d}) * CAST(x AS {d}))").alias("sxx"),
    )
    theta = pooled.select(
        "n",
        "sx",
        F.expr(
            "((n * sxy - sx * sy) * 1048576"
            " - pmod((n * sxy - sx * sy) * 1048576, n * sxx - sx * sx))"
            " div (n * sxx - sx * sx)"
        ).alias("theta_micro"),
    )
    per_variant = per_user.groupBy("variant").agg(
        F.expr(f"CAST(COUNT(*) AS {d})").alias("nv"),
        F.expr(f"CAST(SUM(x) AS {d})").alias("sxv"),
        F.expr(f"CAST(SUM(y) AS {d})").alias("syv"),
    )
    return per_variant.crossJoin(F.broadcast(theta)).select(
        F.col("variant").cast("bigint").alias("variant"),
        F.col("nv").cast("bigint").alias("n_users"),
        F.col("syv").cast("bigint").alias("post_cents"),
        F.col("theta_micro").cast("bigint").alias("theta_micro"),
        F.expr("CAST(CAST(syv AS DOUBLE) / CAST(nv AS DOUBLE) AS DOUBLE)").alias(
            "raw_mean_cents"
        ),
        F.expr(
            "CAST((CAST(syv AS DOUBLE) * 1048576.0 * CAST(n AS DOUBLE)"
            " - CAST(theta_micro AS DOUBLE)"
            " * (CAST(sxv AS DOUBLE) * CAST(n AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(nv AS DOUBLE)))"
            " / (CAST(nv AS DOUBLE) * CAST(n AS DOUBLE) * 1048576.0)"
            " AS DOUBLE)"
        ).alias("cuped_mean_cents"),
    )


@register(
    "stats_diff_in_diff",
    oracle="""
    WITH mid AS (
        SELECT (MIN(epoch_us(ts) // 86400000000)
              + MAX(epoch_us(ts) // 86400000000) + 1) // 2 AS mid
        FROM events
    ),
    cells AS (
        SELECT CAST('0x' || substr(md5('did:' || CAST(user_id AS VARCHAR)),
                    1, 15) AS BIGINT) % 2 AS treated,
               CASE WHEN epoch_us(ts) // 86400000000
                         >= (SELECT mid FROM mid) THEN 1 ELSE 0 END AS post,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    m AS (
        SELECT treated, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM cells GROUP BY treated, post
    ),
    wide AS (
        SELECT
          MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s_t1,
          MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t1,
          MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s_t0,
          MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t0,
          MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s_c1,
          MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c1,
          MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s_c0,
          MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c0
        FROM m
    )
    SELECT s_t1, n_t1, s_t0, n_t0, s_c1, n_c1, s_c0, n_c0,
           CAST(((CAST(s_t1 AS DOUBLE) * CAST(n_t0 AS DOUBLE)
                   - CAST(s_t0 AS DOUBLE) * CAST(n_t1 AS DOUBLE))
                  * (CAST(n_c1 AS DOUBLE) * CAST(n_c0 AS DOUBLE))
                  - (CAST(s_c1 AS DOUBLE) * CAST(n_c0 AS DOUBLE)
                     - CAST(s_c0 AS DOUBLE) * CAST(n_c1 AS DOUBLE))
                    * (CAST(n_t1 AS DOUBLE) * CAST(n_t0 AS DOUBLE)))
                / ((CAST(n_t1 AS DOUBLE) * CAST(n_t0 AS DOUBLE))
                   * (CAST(n_c1 AS DOUBLE) * CAST(n_c0 AS DOUBLE)))
               AS DOUBLE) AS did_cents
    FROM wide
    """,
)
def stats_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: (treated post−pre) − (control
    post−pre) mean change, the causal-inference baseline for staged
    rollouts. The four cell means collapse algebraically into ONE
    double division of exact integer products (int64: s·n ≤ 4e9·1e5 =
    4e14, times the other pair's n-product ≤ 1e10 → wait — that's
    2.4e24; the numerator therefore computes in DECIMAL(38) inside
    the CAST) — both engines round identically once. Treated
    assignment is the rerun-stable md5 hash; the period split is the
    data's midpoint day.

    One (treated × post) grouped aggregate over the scan, a 4-row
    pivot, O(1) arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400")
    mid = ev.agg(((F.min(day) + F.max(day) + 1) / 2).cast("long").alias("mid"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("did:"), F.col("user_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    cells = ev.crossJoin(F.broadcast(mid)).select(
        (h % 2).alias("treated"),
        F.when(day >= F.col("mid"), 1).otherwise(0).alias("post"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    m = cells.groupBy("treated", "post").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    wide = m.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p),
                    F.col(c),
                )
            ).alias(f"{c}_{'t' if t else 'c'}{p}")
            for t in (1, 0)
            for p in (1, 0)
            for c in ("s", "n")
        ]
    )
    return wide.select(
        "s_t1",
        "n_t1",
        "s_t0",
        "n_t0",
        "s_c1",
        "n_c1",
        "s_c0",
        "n_c0",
        F.expr(
            "CAST(((CAST(s_t1 AS DOUBLE) * CAST(n_t0 AS DOUBLE)"
            " - CAST(s_t0 AS DOUBLE) * CAST(n_t1 AS DOUBLE))"
            " * (CAST(n_c1 AS DOUBLE) * CAST(n_c0 AS DOUBLE))"
            " - (CAST(s_c1 AS DOUBLE) * CAST(n_c0 AS DOUBLE)"
            " - CAST(s_c0 AS DOUBLE) * CAST(n_c1 AS DOUBLE))"
            " * (CAST(n_t1 AS DOUBLE) * CAST(n_t0 AS DOUBLE)))"
            " / ((CAST(n_t1 AS DOUBLE) * CAST(n_t0 AS DOUBLE))"
            " * (CAST(n_c1 AS DOUBLE) * CAST(n_c0 AS DOUBLE)))"
            " AS DOUBLE)"
        ).alias("did_cents"),
    )


@register(
    "agg_metric_decomp",
    oracle="""
    WITH mid AS (
        SELECT (MIN(epoch_us(ts) // 86400000000)
              + MAX(epoch_us(ts) // 86400000000) + 1) // 2 AS mid
        FROM events
    ),
    purch AS (
        SELECT CASE WHEN epoch_us(ts) // 86400000000
                         >= (SELECT mid FROM mid) THEN 1 ELSE 0 END AS period,
               user_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT period,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS buyers,
               CAST(COUNT(*) AS BIGINT) AS orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM purch GROUP BY period
    )
    SELECT period, buyers, orders, revenue_cents,
           CAST(CAST(orders AS DOUBLE) / CAST(buyers AS DOUBLE) AS DOUBLE)
               AS orders_per_buyer,
           CAST(CAST(revenue_cents AS DOUBLE) / CAST(orders AS DOUBLE)
                AS DOUBLE) AS aov_cents,
           CAST(b.buyers_ratio_ppm AS BIGINT) AS buyers_ratio_ppm,
           CAST(b.freq_ratio_ppm AS BIGINT) AS freq_ratio_ppm,
           CAST(b.aov_ratio_ppm AS BIGINT) AS aov_ratio_ppm
    FROM m CROSS JOIN (
        SELECT
          MAX(CASE WHEN period = 1 THEN buyers END) * 1000000
            // MAX(CASE WHEN period = 0 THEN buyers END) AS buyers_ratio_ppm,
          MAX(CASE WHEN period = 1 THEN orders END)
            * MAX(CASE WHEN period = 0 THEN buyers END) * 1000000
            // (MAX(CASE WHEN period = 0 THEN orders END)
                * MAX(CASE WHEN period = 1 THEN buyers END))
              AS freq_ratio_ppm,
          MAX(CASE WHEN period = 1 THEN revenue_cents END)
            * MAX(CASE WHEN period = 0 THEN orders END) * 1000000
            // (MAX(CASE WHEN period = 0 THEN revenue_cents END)
                * MAX(CASE WHEN period = 1 THEN orders END))
              AS aov_ratio_ppm
        FROM m
    ) b
    """,
)
def agg_metric_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star metric decomposition: revenue = buyers ×
    orders/buyer × AOV, with the period-over-period change factored
    into the three drivers — the "why did revenue move" report. Each
    driver's period ratio is an exact ppm via cross-multiplied
    integer division (no intermediate float means), and their product
    telescopes back to the revenue ratio by construction — the
    multiplicative identity auditors recompute. Per-period level
    columns ride along as single-division doubles (bit-identical on
    exact ints).

    One grouped aggregate (a distinct-users leg + counts + sums), a
    2-row pivot, O(1) arithmetic.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) div 86400")
    mid = ev.agg(((F.min(day) + F.max(day) + 1) / 2).cast("long").alias("mid"))
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .select(
            F.when(day >= F.col("mid"), 1).otherwise(0).alias("period"),
            "user_id",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    m = purch.groupBy("period").agg(
        F.countDistinct("user_id").alias("buyers"),
        F.count("*").alias("orders"),
        F.sum("cents").alias("revenue_cents"),
    )
    b = m.agg(
        F.expr(
            "MAX(CASE WHEN period = 1 THEN buyers END) * 1000000"
            " div MAX(CASE WHEN period = 0 THEN buyers END)"
        ).alias("buyers_ratio_ppm"),
        F.expr(
            "MAX(CASE WHEN period = 1 THEN orders END)"
            " * MAX(CASE WHEN period = 0 THEN buyers END) * 1000000"
            " div (MAX(CASE WHEN period = 0 THEN orders END)"
            " * MAX(CASE WHEN period = 1 THEN buyers END))"
        ).alias("freq_ratio_ppm"),
        F.expr(
            "MAX(CASE WHEN period = 1 THEN revenue_cents END)"
            " * MAX(CASE WHEN period = 0 THEN orders END) * 1000000"
            " div (MAX(CASE WHEN period = 0 THEN revenue_cents END)"
            " * MAX(CASE WHEN period = 1 THEN orders END))"
        ).alias("aov_ratio_ppm"),
    )
    return m.crossJoin(F.broadcast(b)).select(
        "period",
        "buyers",
        "orders",
        "revenue_cents",
        F.expr(
            "CAST(CAST(orders AS DOUBLE) / CAST(buyers AS DOUBLE) AS DOUBLE)"
        ).alias("orders_per_buyer"),
        F.expr(
            "CAST(CAST(revenue_cents AS DOUBLE) / CAST(orders AS DOUBLE)"
            " AS DOUBLE)"
        ).alias("aov_cents"),
        F.col("buyers_ratio_ppm").cast("bigint").alias("buyers_ratio_ppm"),
        F.col("freq_ratio_ppm").cast("bigint").alias("freq_ratio_ppm"),
        F.col("aov_ratio_ppm").cast("bigint").alias("aov_ratio_ppm"),
    )


@register(
    "agg_log2_histogram",
    oracle="""
    WITH cents AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders
        WHERE o_totalprice > 0
    ),
    bucketed AS (
        SELECT length(format('{:b}', c)) - 1 AS bucket, c FROM cents
    )
    SELECT CAST(bucket AS BIGINT) AS log2_bucket,
           CAST((1::BIGINT) << CAST(bucket AS INT) AS BIGINT) AS bucket_floor,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c) AS BIGINT) AS min_val,
           CAST(MAX(c) AS BIGINT) AS max_val
    FROM bucketed GROUP BY bucket
    """,
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (HDR-style) histogram: bucket = ⌊log₂(cents)⌋
    computed EXACTLY as the bit length of the integer
    (length(bin(x)) − 1) — no float log whose boundary values
    (x = 2^k exactly) would round differently across engines. This
    is the latency/value-distribution shape observability systems
    use: exponential buckets, O(64) of them ever, constant-size
    mergeable state. Min/max per bucket ride along to show the
    bucket's true span.

    One scan, one ≤64-cell groupBy with map-side combine — the
    cheapest useful distribution summary that exists.
    """
    cents = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"))
    )
    bucketed = cents.select(
        (F.length(F.bin("c")) - 1).alias("bucket"), "c"
    )
    return bucketed.groupBy(
        F.col("bucket").cast("bigint").alias("log2_bucket")
    ).agg(
        F.expr("CAST(CAST(1 AS BIGINT) << CAST(log2_bucket AS INT) AS BIGINT)")
        .alias("bucket_floor"),
        F.count("*").alias("n"),
        F.min("c").alias("min_val"),
        F.max("c").alias("max_val"),
    )


@register(
    "agg_var_es",
    oracle="""
    WITH pnl AS (
        SELECT CAST(ROUND(value * 100, 0) AS BIGINT)
               * CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS cents
        FROM events WHERE event_type IN ('purchase', 'error')
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents) AS rn,
               COUNT(*) OVER () AS n
        FROM pnl
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = greatest(1, n * 5 // 100) THEN cents END)
                AS BIGINT) AS var95_cents,
           CAST(SUM(CASE WHEN rn <= greatest(1, n * 5 // 100) THEN cents
                    ELSE 0 END) AS BIGINT) AS tail_sum_cents,
           CAST(SUM(CASE WHEN rn <= greatest(1, n * 5 // 100) THEN 1
                    ELSE 0 END) AS BIGINT) AS tail_n,
           CAST(CAST(SUM(CASE WHEN rn <= greatest(1, n * 5 // 100)
                         THEN cents ELSE 0 END) AS DOUBLE)
                / CAST(SUM(CASE WHEN rn <= greatest(1, n * 5 // 100)
                           THEN 1 ELSE 0 END) AS DOUBLE) AS DOUBLE)
               AS es95_cents
    FROM ranked
    """,
)
def agg_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Expected Shortfall at 95% on a signed P&L
    stream (purchases credit, errors debit): VaR is the exact 5th-
    percentile ORDER STATISTIC (rank (n·5) div 100 — discrete, no
    interpolation, the ml_decision_stump lesson), and ES is the mean
    of the tail at-or-below it — the coherent risk measure Basel
    moved to precisely because VaR alone ignores tail shape. Tail sum
    and count are exact integers; ES is their single double division.

    The rank is the DISTRIBUTED two-pass construction
    (``registry.global_rank``: range-repartition on cents +
    per-partition offsets — no single-partition Exchange), then a
    single conditional aggregate — no second pass over the tail. The
    total count n comes out of the same per-partition collect, so the
    tail cutoff is a literal and the tail filter prunes partitions.
    """
    pnl = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "error"))
        .select(
            (
                F.round(F.col("value") * 100, 0).cast("bigint")
                * F.when(F.col("event_type") == "purchase", 1).otherwise(-1)
            ).alias("cents")
        )
    )
    ranked, n, _ = global_rank(pnl, [F.col("cents").asc()])
    k = max(1, n * 5 // 100)
    return ranked.agg(
        F.lit(n).cast("bigint").alias("n"),
        F.max(F.expr(f"CASE WHEN rn = {k} THEN cents END")).alias(
            "var95_cents"
        ),
        F.sum(F.expr(f"CASE WHEN rn <= {k} THEN cents ELSE 0 END")).alias(
            "tail_sum_cents"
        ),
        F.sum(F.expr(f"CASE WHEN rn <= {k} THEN 1 ELSE 0 END")).alias(
            "tail_n"
        ),
        F.expr(
            f"CAST(CAST(SUM(CASE WHEN rn <= {k} THEN cents ELSE 0 END)"
            f" AS DOUBLE) / CAST(SUM(CASE WHEN rn <= {k} THEN 1 ELSE 0 END)"
            f" AS DOUBLE) AS DOUBLE)"
        ).alias("es95_cents"),
    )


@register(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY epoch_us(ts) // 86400000000
    ),
    diffs AS (
        SELECT day,
               CASE WHEN cents > lag(cents) OVER (ORDER BY day) THEN 1
                    WHEN cents < lag(cents) OVER (ORDER BY day) THEN -1
                    END AS d
        FROM daily
    ),
    seq AS (
        SELECT day, d, lag(d) OVER (ORDER BY day) AS prev_d
        FROM diffs WHERE d IS NOT NULL
    ),
    m AS (
        SELECT CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(1 + SUM(CASE WHEN prev_d IS NOT NULL AND d <> prev_d
                            THEN 1 ELSE 0 END) AS BIGINT) AS runs
        FROM seq
    )
    SELECT n1, n2, runs,
           CAST(CAST((runs - 1) * (n1 + n2) - 2 * n1 * n2 AS DOUBLE)
                / CAST(n1 + n2 AS DOUBLE)
                / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
                       / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)
                              AS DOUBLE)) AS DOUBLE) AS z_score
    FROM m
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily revenue direction
    sequence — "are up/down days random, or does the series trend /
    mean-revert?" — the nonparametric randomness check that
    complements stats_mann_kendall's monotonic-trend view. Runs are
    counted with one lag pass (1 + sign changes); the z-score is a
    fixed-order chain (int→double, divide, divide, sqrt, divide) of
    EXACT integers, written with identical text on both sides, so
    even the float is bit-identical — no closed-form here needs
    anything beyond the IEEE-correctly-rounded primitives.

    Day-grain pre-aggregate map-side combines; both lags ride one
    tiny ordered window over the calendar-bounded daily frame.
    """
    daily = events_daily(spark, sf_dir).select("day", "cents")
    w = Window.orderBy("day")
    diffs = daily.select(
        "day",
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .when(F.col("cents") < F.lag("cents").over(w), -1)
        .alias("d"),
    )
    seq = diffs.where(F.col("d").isNotNull()).select(
        "day", "d", F.lag("d").over(w).alias("prev_d")
    )
    m = seq.agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev_d").isNotNull()
                    & (F.col("d") != F.col("prev_d")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    return m.select(
        "n1",
        "n2",
        "runs",
        F.expr(
            "CAST(CAST((runs - 1) * (n1 + n2) - 2 * n1 * n2 AS DOUBLE)"
            " / CAST(n1 + n2 AS DOUBLE)"
            " / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)"
            " / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE))"
            " AS DOUBLE)"
        ).alias("z_score"),
    )


@register(
    "ml_threshold_sweep",
    oracle="""
    WITH scored AS (
        SELECT CAST(CAST('0x' || substr(md5('cal:' || CAST(o_orderkey
                         AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS BIGINT)
                   AS score_ppm,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        FROM orders
    ),
    sweep AS (
        SELECT t.t * 100000 AS threshold_ppm,
               CAST(SUM(CASE WHEN s.score_ppm >= t.t * 100000 AND s.label = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN s.score_ppm >= t.t * 100000 AND s.label = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN s.score_ppm < t.t * 100000 AND s.label = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM scored s CROSS JOIN (SELECT unnest(range(1, 10)) AS t) t
        GROUP BY t.t
    ),
    f1 AS (
        SELECT threshold_ppm, tp, fp, fn,
               CAST(CAST(2 * tp AS DOUBLE)
                    / CAST(2 * tp + fp + fn AS DOUBLE) AS DOUBLE) AS f1
        FROM sweep
    )
    SELECT CAST(threshold_ppm AS BIGINT) AS threshold_ppm, tp, fp, fn, f1,
           CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM (
        SELECT *, row_number() OVER (ORDER BY f1 DESC, threshold_ppm) AS rn
        FROM f1
    )
    """,
)
def ml_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold sweep: confusion counts and F1 at nine
    candidate thresholds over the portable-hash scores, with the
    F1-argmax flagged — the operating-point selection step between
    ml_eval_auc (threshold-free ranking quality) and
    ml_eval_confusion (one fixed matrix). F1 = 2TP/(2TP+FP+FN) is a
    single double division of exact counts, so even the float column
    and the argmax ordering are bit-identical; ties break on the
    threshold.

    The nine thresholds ride ONE scan: explode-then-partial-aggregate
    (9× row expansion before map-side combine, the permutation-test
    shape), never nine passes.
    """
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("cal:"), F.col("o_orderkey").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    scored = orders.select(
        (h % 1000000).alias("score_ppm"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    sweep = (
        scored.select(
            "score_ppm",
            "label",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("t"),
        )
        .groupBy((F.col("t") * 100000).alias("threshold_ppm"))
        .agg(
            F.sum(
                F.when(
                    (F.col("score_ppm") >= F.col("t") * 100000)
                    & (F.col("label") == 1),
                    1,
                ).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(
                    (F.col("score_ppm") >= F.col("t") * 100000)
                    & (F.col("label") == 0),
                    1,
                ).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(
                    (F.col("score_ppm") < F.col("t") * 100000)
                    & (F.col("label") == 1),
                    1,
                ).otherwise(0)
            ).alias("fn"),
        )
    )
    f1 = sweep.select(
        F.col("threshold_ppm").cast("bigint").alias("threshold_ppm"),
        "tp",
        "fp",
        "fn",
        F.expr(
            "CAST(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)"
            " AS DOUBLE)"
        ).alias("f1"),
    )
    w = Window.orderBy(F.desc("f1"), "threshold_ppm")
    return f1.withColumn(
        "is_best",
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).cast("bigint"),
    )


@register(
    "agg_apportionment",
    oracle="""
    WITH pop AS (
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer GROUP BY c_nationkey
    ),
    tot AS (SELECT CAST(SUM(n_cust) AS BIGINT) AS total FROM pop),
    quotas AS (
        SELECT p.c_nationkey, p.n_cust,
               p.n_cust * 100 // t.total AS floor_seats,
               p.n_cust * 100 % t.total AS remainder
        FROM pop p CROSS JOIN tot t
    ),
    shortfall AS (
        SELECT CAST(100 - SUM(floor_seats) AS BIGINT) AS extra FROM quotas
    ),
    ranked AS (
        SELECT q.*,
               row_number() OVER (ORDER BY q.remainder DESC, q.c_nationkey)
                   AS rr
        FROM quotas q
    )
    SELECT r.c_nationkey, r.n_cust,
           CAST(r.floor_seats AS BIGINT) AS floor_seats,
           CAST(r.remainder AS BIGINT) AS remainder,
           CAST(r.floor_seats
                + CASE WHEN r.rr <= s.extra THEN 1 ELSE 0 END AS BIGINT)
               AS seats
    FROM ranked r CROSS JOIN shortfall s
    """,
)
def agg_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: divide 100 seats
    among nations proportionally to customer count — the quota
    algorithm behind election seats, budget allocation, and sharded
    capacity assignment, where naive rounding either over- or
    under-allocates. Floor quotas first; the shortfall seats go to
    the largest remainders with a deterministic key tie-break. Every
    quantity is integer (seats sum to exactly 100 by construction —
    the invariant the oracle hash certifies).

    One grouped count, a broadcast total, a 25-row ranking window —
    allocation math is never the bottleneck; getting it exactly
    consistent across engines is the point.
    """
    pop = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust")
    )
    tot = pop.agg(F.sum("n_cust").alias("total"))
    quotas = pop.crossJoin(F.broadcast(tot)).select(
        "c_nationkey",
        "n_cust",
        F.expr("n_cust * 100 div total").alias("floor_seats"),
        F.expr("n_cust * 100 % total").alias("remainder"),
    )
    shortfall = quotas.agg(
        (100 - F.sum("floor_seats")).cast("bigint").alias("extra")
    )
    w = Window.orderBy(F.desc("remainder"), "c_nationkey")
    ranked = quotas.withColumn("rr", F.row_number().over(w))
    return ranked.crossJoin(F.broadcast(shortfall)).select(
        "c_nationkey",
        "n_cust",
        F.col("floor_seats").cast("bigint").alias("floor_seats"),
        F.col("remainder").cast("bigint").alias("remainder"),
        (
            F.col("floor_seats")
            + F.when(F.col("rr") <= F.col("extra"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    )


@register(
    "agg_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, cents,
               SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_cents,
               SUM(cents) OVER () AS total
        FROM rev
    ),
    classed AS (
        SELECT l_partkey, cents,
               CASE WHEN cum_cents * 100 <= total * 80 THEN 'A'
                    WHEN cum_cents * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc
        FROM ranked
    )
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents,
           CAST(MIN(cents) AS BIGINT) AS min_part_cents
    FROM classed GROUP BY abc
    """,
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    up to 80% of cumulative revenue, B to 95%, C the tail — the
    Pareto-bucketing every supply-chain and SKU-rationalization
    review starts from (agg_pareto_share reports the curve; this
    assigns the operational labels). Class boundaries are
    cross-multiplied integer comparisons on exact cumulative cents —
    a part never flips class from float drift.

    One keyed aggregate, then the DISTRIBUTED revenue-ordered running
    sum (``registry.global_rank``: range-repartition + per-partition
    prefix offsets — no single-partition Exchange); the grand total
    falls out of the same collect as a literal. O(3) output rows.
    """
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    ranked, _, sums = global_rank(
        rev,
        [F.col("cents").desc(), F.col("l_partkey").asc()],
        sum_cols=("cents",),
    )
    total = sums["cents"]
    classed = ranked.select(
        "l_partkey",
        "cents",
        F.when(F.col("cum_cents") * 100 <= F.lit(total) * 80, "A")
        .when(F.col("cum_cents") * 100 <= F.lit(total) * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count("*").alias("n_parts"),
        F.sum("cents").alias("class_cents"),
        F.min("cents").alias("min_part_cents"),
    )


@register(
    "stats_power_analysis",
    oracle="""
    WITH purch AS (
        SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               SUM(CAST(cents AS HUGEINT) * cents) AS s2
        FROM purch
    )
    SELECT n, s,
           CAST((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS DOUBLE)
               AS var_cents2,
           CAST(ceil(
               (1.959964 + 0.841621) * (1.959964 + 0.841621)
               * 2.0
               * ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
               / ((0.02 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * (0.02 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
           ) AS BIGINT) AS n_required_per_arm
    FROM m
    """,
)
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test power analysis: the sample size per arm needed to
    detect a 2% lift in mean purchase value at α=0.05 / 80% power —
    n = 2(z_α/2+z_β)²σ²/δ², the pre-registration number every
    experiment review asks for first. The z constants are double
    literals; the sample variance comes from exact HUGEINT/DECIMAL(38)
    moments (Σx² overflows int64 at real volume), and the whole
    formula is a fixed written-order float chain over exact inputs —
    both engines produce bit-identical doubles, and ceil() then lands
    on the same integer (a half-ulp boundary would need δ² to conspire
    with σ² to within 10⁻¹⁶ — and the hash would catch it).

    One map-side-combining moment aggregate; O(1) arithmetic after.
    """
    purch = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"))
    )
    d = "DECIMAL(38,0)"
    m = purch.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.expr(f"SUM(CAST(cents AS {d}) * CAST(cents AS {d}))").alias("s2"),
    )
    var = (
        "CAST((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS DOUBLE)"
    )
    return m.select(
        "n",
        "s",
        F.expr(var).alias("var_cents2"),
        F.expr(
            "CAST(ceil("
            "(1.959964 + 0.841621) * (1.959964 + 0.841621)"
            " * 2.0"
            f" * ({var})"
            " / ((0.02 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " * (0.02 * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))"
            ") AS BIGINT)"
        ).alias("n_required_per_arm"),
    )


@register(
    "agg_switching_matrix",
    oracle="""
    WITH mid AS (
        SELECT (MIN(datediff('day', DATE '1970-01-01', o_orderdate))
              + MAX(datediff('day', DATE '1970-01-01', o_orderdate)) + 1) // 2
                   AS mid
        FROM orders
    ),
    pref AS (
        SELECT o_custkey,
               CASE WHEN datediff('day', DATE '1970-01-01', o_orderdate)
                         < (SELECT mid FROM mid) THEN 0 ELSE 1 END AS half,
               o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_custkey, half, o_orderpriority
    ),
    dominant AS (
        SELECT o_custkey, half, o_orderpriority AS pref FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey, half
                ORDER BY n DESC, o_orderpriority) AS rn
            FROM pref
        ) WHERE rn = 1
    ),
    matrix AS (
        SELECT a.pref AS from_pref, b.pref AS to_pref,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM dominant a
        JOIN dominant b ON b.o_custkey = a.o_custkey
        WHERE a.half = 0 AND b.half = 1
        GROUP BY a.pref, b.pref
    ),
    fromtot AS (
        SELECT from_pref, CAST(SUM(n_cust) AS BIGINT) AS tot
        FROM matrix GROUP BY from_pref
    )
    SELECT m.from_pref, m.to_pref, m.n_cust,
           CAST(m.n_cust * 1000000 // f.tot AS BIGINT) AS share_ppm,
           CAST(CASE WHEN m.from_pref = m.to_pref THEN 1 ELSE 0 END
                AS BIGINT) AS retained
    FROM matrix m JOIN fromtot f USING (from_pref)
    """,
)
def agg_switching_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-switching matrix: each customer's DOMINANT order
    priority in the first half of history vs the second, cross-
    tabulated — the brand/plan-switching analysis behind churn-driver
    and loyalty work (the diagonal is stickiness; off-diagonal flows
    say where leavers go). Dominance is a deterministic argmax
    (count desc, then priority); row-share in exact ppm. Distinct
    from agg_markov_transition (adjacent-event transitions): this is
    period-over-period REGIME change per entity.

    Two grouped counts + per-(customer, half) argmax windows + a
    self-join on customer — all keyed operations; the matrix is k²
    rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    mid = orders.agg(
        ((F.min(day) + F.max(day) + 1) / 2).cast("long").alias("mid")
    )
    pref = (
        orders.crossJoin(F.broadcast(mid))
        .select(
            "o_custkey",
            F.when(day < F.col("mid"), 0).otherwise(1).alias("half"),
            "o_orderpriority",
        )
        .groupBy("o_custkey", "half", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("o_custkey", "half").orderBy(
        F.desc("n"), "o_orderpriority"
    )
    dominant = (
        pref.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "half", F.col("o_orderpriority").alias("pref"))
    )
    a = dominant.where(F.col("half") == 0).select(
        "o_custkey", F.col("pref").alias("from_pref")
    )
    b = dominant.where(F.col("half") == 1).select(
        "o_custkey", F.col("pref").alias("to_pref")
    )
    matrix = a.join(b, "o_custkey").groupBy("from_pref", "to_pref").agg(
        F.count("*").alias("n_cust")
    )
    fromtot = matrix.groupBy("from_pref").agg(F.sum("n_cust").alias("tot"))
    return matrix.join(F.broadcast(fromtot), "from_pref").select(
        "from_pref",
        "to_pref",
        "n_cust",
        F.expr("n_cust * 1000000 div tot").cast("bigint").alias("share_ppm"),
        F.when(F.col("from_pref") == F.col("to_pref"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("retained"),
    )


@register(
    "stats_wilson_ci",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                        THEN user_id END) AS BIGINT) AS k
        FROM events
    )
    SELECT n, k,
           CAST(k * 1000000 // n AS BIGINT) AS rate_ppm,
           CAST((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 + 1.959964 * 1.959964 / (2.0 * CAST(n AS DOUBLE))
                 - 1.959964 * sqrt(
                     (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE)
                     + 1.959964 * 1.959964
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE)) AS DOUBLE)
               AS wilson_lo,
           CAST((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                 + 1.959964 * 1.959964 / (2.0 * CAST(n AS DOUBLE))
                 + 1.959964 * sqrt(
                     (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE)
                     + 1.959964 * 1.959964
                       / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE)) AS DOUBLE)
               AS wilson_hi
    FROM m
    """,
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval for the user-conversion rate — the
    proportion CI that behaves at extreme rates and small n where the
    naive Wald interval collapses (the reason every ranking/review
    system quotes Wilson, not p±1.96σ). The closed form is one fixed
    written-order float chain over two exact integers (k converting
    users, n users), identical text both engines ⇒ bit-identical
    bounds; the point rate rides along in exact ppm.

    One distinct-users aggregate with a conditional distinct leg.
    """
    m = load_table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("n"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("k"),
    )
    wilson = (
        "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
        " + 1.959964 * 1.959964 / (2.0 * CAST(n AS DOUBLE))"
        " {sign} 1.959964 * sqrt("
        "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
        " / CAST(n AS DOUBLE)"
        " + 1.959964 * 1.959964"
        " / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
        " / (1.0 + 1.959964 * 1.959964 / CAST(n AS DOUBLE))"
    )
    # empty in, empty out: the degenerate n=0 aggregate row exists
    # only on zero-row input and would raise ANSI DIVIDE_BY_ZERO
    m = m.where(F.col("n") > 0)
    return m.select(
        "n",
        "k",
        F.expr("k * 1000000 div n").cast("bigint").alias("rate_ppm"),
        F.expr(f"CAST({wilson.format(sign='-')} AS DOUBLE)").alias("wilson_lo"),
        F.expr(f"CAST({wilson.format(sign='+')} AS DOUBLE)").alias("wilson_hi"),
    )


@register(
    "agg_sequence_pairs",
    oracle="""
    WITH cat_orders AS (
        SELECT o.o_custkey,
               l.l_partkey % 10 AS cat,
               MIN(datediff('day', DATE '1970-01-01', o.o_orderdate))
                   AS first_day
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey, l.l_partkey % 10
    ),
    pairs AS (
        SELECT a.cat AS cat_from, b.cat AS cat_to,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM cat_orders a
        JOIN cat_orders b ON b.o_custkey = a.o_custkey
                         AND (a.first_day < b.first_day
                              OR (a.first_day = b.first_day
                                  AND a.cat < b.cat))
        GROUP BY a.cat, b.cat
    ),
    base AS (
        SELECT cat, CAST(COUNT(*) AS BIGINT) AS n FROM cat_orders
        GROUP BY cat
    )
    SELECT p.cat_from, p.cat_to, p.n_cust,
           CAST(p.n_cust * 1000000 // f.n AS BIGINT)
               AS follow_rate_ppm
    FROM pairs p JOIN base f ON f.cat = p.cat_from
    ORDER BY n_cust DESC, cat_from, cat_to LIMIT 20
    """,
)
def agg_sequence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential purchase patterns: "customers who adopt category A
    later adopt category B" — directional category-pair counts by
    FIRST-adoption order (with a deterministic same-day tie rule), the
    sequence-mining primitive behind next-best-offer models, and the
    directional complement to agg_basket_affinity's same-basket
    co-occurrence. Follow rate is exact ppm over the source
    category's adopter base; top-20 by support.

    First-adoption collapses each (customer, category) to ONE row
    before pairing, so the self-join is bounded by categories² per
    customer (10 here), never by order count — the same
    distinct-before-pairing move as text_cooccur_lift.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cat_orders = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "o_custkey", (F.col("l_partkey") % 10).alias("cat")
        )
        .agg(
            F.min(
                F.datediff(
                    F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
                )
            ).alias("first_day")
        )
    )
    a, b = cat_orders.alias("a"), cat_orders.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (
                (F.col("a.first_day") < F.col("b.first_day"))
                | (
                    (F.col("a.first_day") == F.col("b.first_day"))
                    & (F.col("a.cat") < F.col("b.cat"))
                )
            ),
        )
        .groupBy(
            F.col("a.cat").alias("cat_from"), F.col("b.cat").alias("cat_to")
        )
        .agg(F.count("*").alias("n_cust"))
    )
    base = cat_orders.groupBy(F.col("cat").alias("cat_from")).agg(
        F.count("*").alias("n")
    )
    return (
        pairs.join(F.broadcast(base), "cat_from")
        .select(
            "cat_from",
            "cat_to",
            "n_cust",
            F.expr("n_cust * 1000000 div n").cast("bigint").alias(
                "follow_rate_ppm"
            ),
        )
        .orderBy(F.desc("n_cust"), "cat_from", "cat_to")
        .limit(20)
    )


@register(
    "agg_price_elasticity",
    oracle="""
    WITH mid AS (
        SELECT (MIN(datediff('day', DATE '1970-01-01', l_shipdate))
              + MAX(datediff('day', DATE '1970-01-01', l_shipdate)) + 1) // 2
                   AS mid
        FROM lineitem
    ),
    halves AS (
        SELECT l_partkey % 10 AS cat,
               CASE WHEN datediff('day', DATE '1970-01-01', l_shipdate)
                         < (SELECT mid FROM mid) THEN 0 ELSE 1 END AS h,
               CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY cat, h
    ),
    wide AS (
        SELECT cat,
               MAX(CASE WHEN h = 0 THEN qty END) AS q1,
               MAX(CASE WHEN h = 1 THEN qty END) AS q2,
               MAX(CASE WHEN h = 0 THEN cents END) AS c1,
               MAX(CASE WHEN h = 1 THEN cents END) AS c2
        FROM halves GROUP BY cat
    )
    SELECT cat, q1, q2, c1, c2,
           CAST((CAST(q2 - q1 AS DOUBLE)
                 * (CAST(c1 AS DOUBLE) * CAST(q2 AS DOUBLE)
                    + CAST(c2 AS DOUBLE) * CAST(q1 AS DOUBLE)))
                / NULLIF((CAST(c2 AS DOUBLE) * CAST(q1 AS DOUBLE)
                          - CAST(c1 AS DOUBLE) * CAST(q2 AS DOUBLE))
                         * CAST(q1 + q2 AS DOUBLE), 0.0)
               AS DOUBLE) AS arc_elasticity
    FROM wide
    """,
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc price elasticity of demand per category between history
    halves: %Δquantity over %Δunit-price with midpoint bases. Unit
    price is revenue/quantity, so the algebra is cleared of ALL
    nested divisions first — e = (q₂−q₁)(c₁q₂+c₂q₁) /
    ((c₂q₁−c₁q₂)(q₁+q₂)) — then evaluated as a fixed-order DOUBLE
    chain where every operand enters exact (< 2⁵³): converting the
    wide-integer products instead diverged by 1 ulp at sf0.1, because
    the engines' 128-bit→double conversions round differently past
    2⁵³. NULLIF guards the no-price-change case identically. The economics primitive behind
    markdown and pricing decisions, done without a single float mean.

    One (category × half) grouped sum over the scan, a k-row pivot,
    O(k) arithmetic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    day = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    mid = li.agg(((F.min(day) + F.max(day) + 1) / 2).cast("long").alias("mid"))
    halves = (
        li.crossJoin(F.broadcast(mid))
        .groupBy(
            (F.col("l_partkey") % 10).alias("cat"),
            F.when(day < F.col("mid"), 0).otherwise(1).alias("h"),
        )
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("qty"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("cents"),
        )
    )
    wide = halves.groupBy("cat").agg(
        F.max(F.when(F.col("h") == 0, F.col("qty"))).alias("q1"),
        F.max(F.when(F.col("h") == 1, F.col("qty"))).alias("q2"),
        F.max(F.when(F.col("h") == 0, F.col("cents"))).alias("c1"),
        F.max(F.when(F.col("h") == 1, F.col("cents"))).alias("c2"),
    )
    d = "DECIMAL(38,0)"
    return wide.select(
        "cat",
        "q1",
        "q2",
        "c1",
        "c2",
        F.expr(
            "CAST((CAST(q2 - q1 AS DOUBLE)"
            " * (CAST(c1 AS DOUBLE) * CAST(q2 AS DOUBLE)"
            " + CAST(c2 AS DOUBLE) * CAST(q1 AS DOUBLE)))"
            " / NULLIF((CAST(c2 AS DOUBLE) * CAST(q1 AS DOUBLE)"
            " - CAST(c1 AS DOUBLE) * CAST(q2 AS DOUBLE))"
            " * CAST(q1 + q2 AS DOUBLE), 0.0) AS DOUBLE)"
        ).alias("arc_elasticity"),
    )


@register(
    "agg_safety_stock",
    oracle="""
    WITH daily AS (
        SELECT l_partkey % 10 AS cat,
               datediff('day', DATE '1970-01-01', l_shipdate) AS day,
               CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
                   AS qty
        FROM lineitem GROUP BY cat, day
    ),
    m AS (
        SELECT cat,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(qty) AS BIGINT) AS s,
               SUM(CAST(qty AS HUGEINT) * qty) AS s2
        FROM daily GROUP BY cat
    )
    SELECT cat, n_days, s,
           CAST(ceil(
               CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) * 7.0
               + 1.644854
                 * sqrt((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n_days AS DOUBLE)
                           * CAST(n_days - 1 AS DOUBLE)))
                 * sqrt(7.0)
           ) AS BIGINT) AS reorder_point_units,
           CAST(ceil(
               1.644854
               * sqrt((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n_days AS DOUBLE)
                         * CAST(n_days - 1 AS DOUBLE)))
               * sqrt(7.0)
           ) AS BIGINT) AS safety_stock_units
    FROM m
    """,
)
def agg_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder point per category at a 7-day lead
    time and 95% service level: ROP = μ_d·LT + z·σ_d·√LT — the
    inventory-policy formula every replenishment system materializes.
    Daily-demand variance comes from exact HUGEINT/DECIMAL(38)
    moments; the z·σ·√LT chain is fixed-written-order floats over
    exact integers (sqrt is IEEE-correctly-rounded), so the ceil
    lands on the same unit count on both engines.

    Day-grain demand aggregate map-side combines; the per-category
    moment reduce is k rows; O(k) closed-form arithmetic after.
    """
    li = load_table(spark, sf_dir, "lineitem")
    day = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
    daily = (
        li.groupBy((F.col("l_partkey") % 10).alias("cat"), day.alias("day"))
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("qty"))
    )
    d = "DECIMAL(38,0)"
    m = daily.groupBy("cat").agg(
        F.count("*").alias("n_days"),
        F.sum("qty").alias("s"),
        F.expr(f"SUM(CAST(qty AS {d}) * CAST(qty AS {d}))").alias("s2"),
    )
    sd = (
        "sqrt((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        " / (CAST(n_days AS DOUBLE) * CAST(n_days - 1 AS DOUBLE)))"
    )
    return m.select(
        "cat",
        "n_days",
        "s",
        F.expr(
            "CAST(ceil(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE) * 7.0"
            f" + 1.644854 * {sd} * sqrt(7.0)) AS BIGINT)"
        ).alias("reorder_point_units"),
        F.expr(
            f"CAST(ceil(1.644854 * {sd} * sqrt(7.0)) AS BIGINT)"
        ).alias("safety_stock_units"),
    )


@register(
    "agg_score_percentile",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
        FROM orders
    ),
    marks AS (
        SELECT unnest([5000000::BIGINT, 15000000::BIGINT,
                       30000000::BIGINT]) AS mark
    )
    SELECT c.o_orderpriority,
           m.mark AS mark_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN c.c <= m.mark THEN 1 ELSE 0 END) AS BIGINT)
               AS n_at_or_below,
           CAST(SUM(CASE WHEN c.c <= m.mark THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS percentile_ppm
    FROM cents c CROSS JOIN marks m
    GROUP BY c.o_orderpriority, m.mark
    """,
)
def agg_score_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse percentile ("where does $X fall?"): the empirical-CDF
    value of reference amounts ($50k/$150k/$300k) within each
    priority class — the question percentile functions answer
    backwards (they map rank→value; dashboards and threshold reviews
    need value→rank). Exact ppm via count-at-or-below over the group
    count; the mark set broadcasts and expands BEFORE the partial
    aggregate (the threshold-sweep shape), so all marks ride one
    scan.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    marks = spark.createDataFrame(
        [(5000000,), (15000000,), (30000000,)], "mark long"
    )
    return (
        cents.crossJoin(F.broadcast(marks))
        .groupBy("o_orderpriority", F.col("mark").alias("mark_cents"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("c") <= F.col("mark"), 1).otherwise(0)).alias(
                "n_at_or_below"
            ),
            F.expr(
                "SUM(CASE WHEN c <= mark THEN 1 ELSE 0 END) * 1000000"
                " div COUNT(*)"
            )
            .cast("bigint")
            .alias("percentile_ppm"),
        )
    )


@register(
    "agg_shapley_channels",
    oracle="""
    WITH exposure AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT v, c,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS k
        FROM exposure GROUP BY v, c
    ),
    wide AS (
        SELECT
          MAX(CASE WHEN v = 0 AND c = 0 THEN k END) AS k00,
          MAX(CASE WHEN v = 0 AND c = 0 THEN n END) AS n00,
          MAX(CASE WHEN v = 1 AND c = 0 THEN k END) AS k10,
          MAX(CASE WHEN v = 1 AND c = 0 THEN n END) AS n10,
          MAX(CASE WHEN v = 0 AND c = 1 THEN k END) AS k01,
          MAX(CASE WHEN v = 0 AND c = 1 THEN n END) AS n01,
          MAX(CASE WHEN v = 1 AND c = 1 THEN k END) AS k11,
          MAX(CASE WHEN v = 1 AND c = 1 THEN n END) AS n11
        FROM cells
    )
    SELECT k00, n00, k10, n10, k01, n01, k11, n11,
           CAST(((CAST(k10 AS DOUBLE) / CAST(n10 AS DOUBLE)
                  - CAST(k00 AS DOUBLE) / CAST(n00 AS DOUBLE))
                 + (CAST(k11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                    - CAST(k01 AS DOUBLE) / CAST(n01 AS DOUBLE))) / 2.0
               AS DOUBLE) AS shapley_view,
           CAST(((CAST(k01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                  - CAST(k00 AS DOUBLE) / CAST(n00 AS DOUBLE))
                 + (CAST(k11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                    - CAST(k10 AS DOUBLE) / CAST(n10 AS DOUBLE))) / 2.0
               AS DOUBLE) AS shapley_click
    FROM wide
    """,
)
def agg_shapley_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution for the two-channel game:
    each channel's credit is its average marginal contribution to the
    conversion rate over both join orders — φ_view = [(r_V − r_∅) +
    (r_VC − r_C)]/2 — the game-theoretically fair split that
    last-touch and linear attribution only approximate, computed
    EXACTLY here because the 2-player game needs just the four
    exposure-cell rates (2^k cells generally — the reason production
    Shapley attribution samples coalitions; at k=2 it's closed-form).
    Each rate is a single-rounded division of exact counts, the
    marginal sums a fixed-order chain, and /2.0 is lossless — the
    doubles hash bit-identically.

    One per-user exposure aggregate, a 4-cell pivot, O(1) arithmetic.
    By construction φ_view + φ_click = r_full − r_none (efficiency
    axiom) — auditable from the emitted cells.
    """
    exposure = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "c"
        ),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    cells = exposure.groupBy("v", "c").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    wide = cells.agg(
        *[
            F.max(
                F.when((F.col("v") == v) & (F.col("c") == c), F.col(x))
            ).alias(f"{x}{v}{c}")
            for v in (0, 1)
            for c in (0, 1)
            for x in ("k", "n")
        ]
    )
    r = lambda k, n: f"CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE)"
    return wide.select(
        "k00",
        "n00",
        "k10",
        "n10",
        "k01",
        "n01",
        "k11",
        "n11",
        F.expr(
            f"CAST((({r('k10','n10')} - {r('k00','n00')})"
            f" + ({r('k11','n11')} - {r('k01','n01')})) / 2.0 AS DOUBLE)"
        ).alias("shapley_view"),
        F.expr(
            f"CAST((({r('k01','n01')} - {r('k00','n00')})"
            f" + ({r('k11','n11')} - {r('k10','n10')})) / 2.0 AS DOUBLE)"
        ).alias("shapley_click"),
    )


@register(
    "stats_sign_test",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY epoch_us(ts) // 86400000000
    ),
    diffs AS (
        SELECT CASE WHEN cents > lag(cents) OVER (ORDER BY day) THEN 1
                    WHEN cents < lag(cents) OVER (ORDER BY day) THEN 0
                    END AS up
        FROM daily
    ),
    m AS (
        SELECT CAST(COUNT(up) AS BIGINT) AS nn,
               CAST(SUM(up) AS BIGINT) AS s
        FROM diffs WHERE up IS NOT NULL
    ),
    binom(k, c) AS (
        SELECT CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        UNION ALL
        SELECT b.k + 1, (b.c * (m.nn - b.k)) // (b.k + 1)
        FROM binom b, m WHERE b.k < m.nn
    ),
    tail AS (
        SELECT CAST(SUM(b.c) AS BIGINT) AS tail_paths
        FROM binom b, m
        WHERE b.k >= greatest(m.s, m.nn - m.s)
    )
    SELECT m.nn AS n_days, m.s AS n_up,
           t.tail_paths,
           CAST((CAST(1 AS BIGINT) << CAST(m.nn AS INT)) AS BIGINT)
               AS total_paths,
           CAST(t.tail_paths * 1000000
                // (CAST(1 AS BIGINT) << CAST(m.nn AS INT)) AS BIGINT)
               AS p_one_sided_ppm
    FROM m CROSS JOIN tail t
    """,
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT binomial sign test on daily revenue direction — no
    normal approximation, no float CDF: the binomial coefficients
    come from a RECURSIVE CTE walking Pascal's row with the
    multiplicative identity C(n,k+1) = C(n,k)·(n−k)/(k+1) (each step
    exactly divisible, so integer floor division stays exact), the
    tail mass Σ C(n,j) for j ≥ max(s, n−s) is an exact int64, the
    denominator is a bit shift, and the p-value is a dyadic rational
    in exact ppm. The same recursive text runs on Spark 4's native
    WITH RECURSIVE and DuckDB. Complements stats_runs_test (pattern)
    and stats_mann_kendall (monotonic trend) with the exact-small-n
    member of the family — usable whenever n ≤ 62 days (the shift
    bound), which is exactly the regime where the normal
    approximation is worst.

    The data-sized work is one day-grain aggregate; the Pascal walk is
    n steps of O(1) arithmetic.

    r10 optimization: the Spark side folds Pascal's row with
    ``aggregate()`` over ``sequence(1, nn)`` instead of a recursive
    CTE (one distributed join per coefficient — 5.1 s at sf0.1,
    ~0.4 s after): same multiplicative identity, same exact integer
    floor divisions, so every coefficient (and the dyadic ppm tail)
    is identical. The oracle keeps the recursive text — the hash
    match cross-checks the rewrite. NULL/zero edges replicated: nn=0
    (no diffs) keeps tail_paths NULL via the explicit guard, exactly
    the empty-SUM the recursion produced.
    """
    daily = events_daily(spark, sf_dir).select("day", "cents")
    w = Window.orderBy("day")
    diffs = daily.select(
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .when(F.col("cents") < F.lag("cents").over(w), 0)
        .alias("up")
    )
    m = diffs.where(F.col("up").isNotNull()).agg(
        F.count("up").alias("nn"), F.sum("up").alias("s")
    )
    binom = m.select(
        "nn",
        "s",
        F.expr(
            """
            CASE WHEN nn = 0 THEN array(CAST(1 AS BIGINT))
                 ELSE aggregate(
                   sequence(CAST(1 AS BIGINT), nn),
                   array(CAST(1 AS BIGINT)),
                   (acc, k) -> array_append(acc,
                     (element_at(acc, CAST(k AS INT)) * (nn - k + 1)) div k))
            END
            """
        ).alias("binom"),
    )
    tailed = binom.select(
        "nn",
        "s",
        F.expr(
            """
            CASE WHEN s IS NULL THEN CAST(NULL AS BIGINT)
                 ELSE aggregate(
                   zip_with(binom, sequence(CAST(0 AS BIGINT), nn),
                     (c, k) -> IF(k >= greatest(s, nn - s), c,
                                  CAST(0 AS BIGINT))),
                   CAST(0 AS BIGINT), (a, x) -> a + x)
            END
            """
        ).alias("tail_paths"),
    )
    return tailed.select(
        F.col("nn").alias("n_days"),
        F.col("s").alias("n_up"),
        "tail_paths",
        F.expr("CAST((CAST(1 AS BIGINT) << CAST(nn AS INT)) AS BIGINT)").alias(
            "total_paths"
        ),
        F.expr(
            "CAST(tail_paths * 1000000"
            " div (CAST(1 AS BIGINT) << CAST(nn AS INT)) AS BIGINT)"
        ).alias("p_one_sided_ppm"),
    )


@register(
    "stats_anova_f",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
        FROM orders
    ),
    per_group AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               SUM(CAST(c AS HUGEINT) * c) AS s2
        FROM cents GROUP BY grp
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(s) AS BIGINT) AS ss,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(s AS HUGEINT) * s // n) AS group_term,
               SUM(CAST(s2 AS HUGEINT)) AS sum_sq
        FROM per_group
    )
    SELECT nn AS n, k,
           CAST((group_term - CAST(ss AS HUGEINT) * ss // nn)
                * (nn - k) * 1000000
                // ((sum_sq - group_term) * (k - 1)) AS BIGINT)
               AS f_ppm
    FROM tot
    """,
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic: does mean order value differ across
    priority classes? Between-group and within-group sums of squares
    assemble from exact per-group moments kept ENTIRELY in wide
    integers: each group's s²/n is floor-divided in HUGEINT/
    DECIMAL(38) (≤1 cent² quantization, identical both engines — the
    first attempt summed doubles and diverged immediately: double
    sums are reduction-order-dependent), and F emerges as one exact
    integer ppm division. No float ever exists. Completes the
    hypothesis-test family: t/z, chi², KS, Mann-Whitney, runs, sign,
    permutation, bootstrap — and now the k-sample F.

    One grouped moment aggregate (map-side combining), a k-row
    reduce, O(1) arithmetic.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    d = "DECIMAL(38,0)"
    per_group = cents.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.expr(f"SUM(CAST(c AS {d}) * CAST(c AS {d}))").alias("s2"),
    )
    tot = per_group.agg(
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.count("*").alias("k"),
        # decimal `div` returns BIGINT and silently wraps past 2^63
        # (observed: ss^2 div nn went negative at sf0.01) — use exact
        # decimal division of the pre-subtracted remainder instead
        F.sum(
            F.expr(
                f"CAST((CAST(s AS {d}) * s - CAST(s AS {d}) * s % n) / n"
                f" AS {d})"
            )
        ).alias("group_term"),
        F.sum(F.expr(f"CAST(s2 AS {d})")).alias("sum_sq"),
    )
    return tot.select(
        F.col("nn").alias("n"),
        "k",
        F.expr(
            f"CAST(((group_term"
            f" - CAST((CAST(ss AS {d}) * ss - CAST(ss AS {d}) * ss % nn) / nn"
            f" AS {d}))"
            f" * CAST(nn - k AS {d}) * 1000000"
            f" - pmod((group_term"
            f" - CAST((CAST(ss AS {d}) * ss - CAST(ss AS {d}) * ss % nn) / nn"
            f" AS {d}))"
            f" * CAST(nn - k AS {d}) * 1000000,"
            f" CAST((sum_sq - group_term) * (k - 1) AS {d})))"
            f" / CAST((sum_sq - group_term) * (k - 1) AS {d}) AS BIGINT)"
        ).alias("f_ppm"),
    )


@register(
    "agg_ar_aging",
    oracle="""
    WITH book AS (SELECT MAX(o_orderdate) AS today FROM orders),
    open_items AS (
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
               datediff('day', o.o_orderdate, a.today) AS age_days
        FROM orders o CROSS JOIN book a
        WHERE o.o_orderstatus = 'O'
    ),
    bucketed AS (
        SELECT CASE WHEN age_days <= 30 THEN '0-030'
                    WHEN age_days <= 60 THEN '031-060'
                    WHEN age_days <= 90 THEN '061-090'
                    ELSE '090+' END AS bucket,
               cents
        FROM open_items
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM bucketed)
    SELECT b.bucket,
           CAST(COUNT(*) AS BIGINT) AS n_invoices,
           CAST(SUM(b.cents) AS BIGINT) AS cents,
           CAST(SUM(b.cents) * 1000000 // t.t AS BIGINT) AS share_ppm
    FROM bucketed b CROSS JOIN tot t
    GROUP BY b.bucket, t.t
    """,
)
def agg_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging report: open orders bucketed by days
    outstanding as of the book's latest date (0–30/31–60/61–90/90+),
    with exact-cents balances and ppm shares — the collections
    report every finance close produces, and the padded bucket
    labels ('0-030') sort correctly as strings so the report needs
    no separate ordering column. Integer date arithmetic against a
    broadcast as-of scalar; one grouped sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    asof = orders.agg(F.max("o_orderdate").alias("today"))
    open_items = (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
                "cents"
            ),
            F.datediff(F.col("today"), F.col("o_orderdate")).alias("age_days"),
        )
    )
    bucketed = open_items.select(
        F.when(F.col("age_days") <= 30, "0-030")
        .when(F.col("age_days") <= 60, "031-060")
        .when(F.col("age_days") <= 90, "061-090")
        .otherwise("090+")
        .alias("bucket"),
        "cents",
    )
    tot = bucketed.agg(F.sum("cents").alias("t"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("bucket", "t")
        .agg(F.count("*").alias("n_invoices"), F.sum("cents").alias("cents"))
        .select(
            "bucket",
            "n_invoices",
            "cents",
            F.expr("cents * 1000000 div t").cast("bigint").alias("share_ppm"),
        )
    )


@register(
    "agg_comparable_growth",
    oracle="""
    WITH mid AS (
        SELECT (MIN(datediff('day', DATE '1970-01-01', o_orderdate))
              + MAX(datediff('day', DATE '1970-01-01', o_orderdate)) + 1) // 2
                   AS mid
        FROM orders
    ),
    halves AS (
        SELECT o_custkey,
               CASE WHEN datediff('day', DATE '1970-01-01', o_orderdate)
                         < (SELECT mid FROM mid) THEN 0 ELSE 1 END AS h,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey, h
    ),
    comp AS (
        SELECT a.o_custkey, a.cents AS c1, b.cents AS c2
        FROM halves a JOIN halves b
          ON b.o_custkey = a.o_custkey AND a.h = 0 AND b.h = 1
    ),
    all_tot AS (
        SELECT CAST(SUM(CASE WHEN h = 0 THEN cents ELSE 0 END) AS BIGINT)
                   AS t1,
               CAST(SUM(CASE WHEN h = 1 THEN cents ELSE 0 END) AS BIGINT)
                   AS t2
        FROM halves
    ),
    comp_tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_comp,
               CAST(SUM(c1) AS BIGINT) AS c1,
               CAST(SUM(c2) AS BIGINT) AS c2
        FROM comp
    )
    SELECT c.n_comp, c.c1 AS comp_h1_cents, c.c2 AS comp_h2_cents,
           a.t1 AS all_h1_cents, a.t2 AS all_h2_cents,
           CAST(c.c2 * 1000000 // c.c1 AS BIGINT) AS comp_growth_ppm,
           CAST(a.t2 * 1000000 // a.t1 AS BIGINT) AS all_growth_ppm
    FROM comp_tot c CROSS JOIN all_tot a
    """,
)
def agg_comparable_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparable ("same-store") growth: period-over-period revenue
    growth restricted to customers active in BOTH halves, reported
    beside the headline all-customer growth — the retail metric that
    separates organic growth from acquisition mix (headline up while
    comp is down = you're buying growth). Both ratios are exact ppm;
    the comp base is a self-join of the per-customer half aggregates.

    One (customer × half) grouped sum, a keyed self-join on the
    customer, two 1-row reduces.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    mid = orders.agg(((F.min(day) + F.max(day) + 1) / 2).cast("long").alias("mid"))
    halves = (
        orders.crossJoin(F.broadcast(mid))
        .groupBy(
            "o_custkey",
            F.when(day < F.col("mid"), 0).otherwise(1).alias("h"),
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    a = halves.where(F.col("h") == 0).select(
        "o_custkey", F.col("cents").alias("c1")
    )
    b = halves.where(F.col("h") == 1).select(
        "o_custkey", F.col("cents").alias("c2")
    )
    comp_tot = a.join(b, "o_custkey").agg(
        F.count("*").alias("n_comp"),
        F.sum("c1").alias("c1"),
        F.sum("c2").alias("c2"),
    )
    all_tot = halves.agg(
        F.sum(F.when(F.col("h") == 0, F.col("cents")).otherwise(0)).alias("t1"),
        F.sum(F.when(F.col("h") == 1, F.col("cents")).otherwise(0)).alias("t2"),
    )
    return comp_tot.crossJoin(F.broadcast(all_tot)).select(
        "n_comp",
        F.col("c1").alias("comp_h1_cents"),
        F.col("c2").alias("comp_h2_cents"),
        F.col("t1").alias("all_h1_cents"),
        F.col("t2").alias("all_h2_cents"),
        F.expr("c2 * 1000000 div c1").cast("bigint").alias("comp_growth_ppm"),
        F.expr("t2 * 1000000 div t1").cast("bigint").alias("all_growth_ppm"),
    )


@register(
    "agg_cr4",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents DESC, l_suppkey) AS rn,
               SUM(cents) OVER () AS total
        FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MAX(total) AS BIGINT) AS total_cents,
           CAST(CAST(SUM(CASE WHEN rn <= 4 THEN cents ELSE 0 END)
                AS HUGEINT) * 1000000 // MAX(total) AS BIGINT) AS cr4_ppm,
           CAST(CAST(SUM(CASE WHEN rn <= 8 THEN cents ELSE 0 END)
                AS HUGEINT) * 1000000 // MAX(total) AS BIGINT) AS cr8_ppm,
           CAST(CAST(SUM(CASE WHEN rn <= 20 THEN cents ELSE 0 END)
                AS HUGEINT) * 1000000 // MAX(total) AS BIGINT) AS cr20_ppm
    FROM ranked
    """,
)
def agg_cr4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration ratios CR4/CR8/CR20 — the antitrust/supply-risk
    view of supplier revenue share (agg_hhi's scalar squares every
    share; regulators and procurement read the top-k cumulative
    shares directly). One ranked pass with conditional sums at the
    three cutoffs — not three queries — and every share an exact ppm.

    Supplier-grain aggregate then the DISTRIBUTED global rank
    (``registry.global_rank`` — range-repartition + per-partition
    offsets, no single-partition Exchange); count and grand total come
    out of the same collect as literals, so there is no
    count-over-everything window either.
    """
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    ranked, n, sums = global_rank(
        rev, [F.col("cents").desc(), F.col("l_suppkey").asc()], sum_cols=("cents",)
    )
    total = max(sums["cents"], 1)
    return ranked.agg(
        F.lit(n).cast("bigint").alias("n_suppliers"),
        F.lit(sums["cents"]).cast("bigint").alias("total_cents"),
        # widen before the x1e6 product: tail sums * 1e6 can pass 2^63
        # (Spark DECIMAL(38) div bigint == DuckDB HUGEINT //)
        F.expr(
            f"CAST(SUM(CASE WHEN rn <= 4 THEN cents ELSE 0 END)"
            f" AS DECIMAL(38,0)) * 1000000 div {total}"
        )
        .cast("bigint")
        .alias("cr4_ppm"),
        F.expr(
            f"CAST(SUM(CASE WHEN rn <= 8 THEN cents ELSE 0 END)"
            f" AS DECIMAL(38,0)) * 1000000 div {total}"
        )
        .cast("bigint")
        .alias("cr8_ppm"),
        F.expr(
            f"CAST(SUM(CASE WHEN rn <= 20 THEN cents ELSE 0 END)"
            f" AS DECIMAL(38,0)) * 1000000 div {total}"
        )
        .cast("bigint")
        .alias("cr20_ppm"),
    )


@register(
    "agg_fifo_cogs",
    oracle="""
    WITH layers AS (
        SELECT l_partkey % 10 AS cat,
               datediff('day', DATE '1970-01-01', l_shipdate) AS day,
               l_orderkey, l_linenumber,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        FROM lineitem
    ),
    demand AS (
        SELECT cat, CAST(SUM(qty) * 6 // 10 AS BIGINT) AS sold_qty
        FROM layers GROUP BY cat
    ),
    swept AS (
        SELECT l.cat, l.qty, l.cents, d.sold_qty,
               SUM(l.qty) OVER (PARTITION BY l.cat
                    ORDER BY l.day, l.l_orderkey, l.l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_qty
        FROM layers l JOIN demand d USING (cat)
    ),
    costed AS (
        SELECT cat, sold_qty,
               CASE
                 WHEN cum_qty <= sold_qty THEN cents
                 WHEN cum_qty - qty < sold_qty
                   THEN (sold_qty - (cum_qty - qty)) * cents // qty
                 ELSE 0 END AS consumed_cents,
               CASE
                 WHEN cum_qty <= sold_qty THEN qty
                 WHEN cum_qty - qty < sold_qty
                   THEN sold_qty - (cum_qty - qty)
                 ELSE 0 END AS consumed_qty
        FROM swept
    )
    SELECT CAST(cat AS BIGINT) AS cat, sold_qty,
           CAST(SUM(consumed_qty) AS BIGINT) AS consumed_qty,
           CAST(SUM(consumed_cents) AS BIGINT) AS fifo_cogs_cents
    FROM costed GROUP BY cat, sold_qty
    """,
)
def agg_fifo_cogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO cost-of-goods-sold: purchase layers consume in receipt
    order until the sold quantity (60% of supply per category) is
    covered — whole layers at full cost, the boundary layer prorated
    (floor-divided cents, documented ≤1-cent quantization). The
    inventory-costing recurrence looks sequential but is ONE
    prefix-sum classification: a layer is fully consumed iff its
    cumulative quantity ≤ demand, partially iff the boundary crosses
    it — the same running-sum algebra as win_clamped_balance, applied
    to accounting. Consumed-quantity sums prove coverage equals
    demand exactly (the audit column).

    A per-category ordered window over the layer stream (total order
    via (day, orderkey, linenumber)) and one grouped sum — no loop,
    no recursion.
    """
    layers = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 10).alias("cat"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    demand = layers.groupBy("cat").agg(
        F.expr("SUM(qty) * 6 div 10").cast("bigint").alias("sold_qty")
    )
    w = Window.partitionBy("cat").orderBy(
        "day", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    swept = layers.join(F.broadcast(demand), "cat").select(
        "cat",
        "qty",
        "cents",
        "sold_qty",
        F.sum("qty").over(w).alias("cum_qty"),
    )
    costed = swept.select(
        "cat",
        "sold_qty",
        F.expr(
            "CASE WHEN cum_qty <= sold_qty THEN cents"
            " WHEN cum_qty - qty < sold_qty"
            " THEN (sold_qty - (cum_qty - qty)) * cents div qty"
            " ELSE 0 END"
        ).alias("consumed_cents"),
        F.expr(
            "CASE WHEN cum_qty <= sold_qty THEN qty"
            " WHEN cum_qty - qty < sold_qty"
            " THEN sold_qty - (cum_qty - qty)"
            " ELSE 0 END"
        ).alias("consumed_qty"),
    )
    return costed.groupBy(
        F.col("cat").cast("bigint").alias("cat"), "sold_qty"
    ).agg(
        F.sum("consumed_qty").alias("consumed_qty"),
        F.sum("consumed_cents").alias("fifo_cogs_cents"),
    )


@register(
    "agg_price_ladder",
    oracle="""
    WITH cents AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c FROM orders
    ),
    digits AS (
        SELECT c, c % 100 AS cent_part,
               (c // 100) % 10 AS dollar_last
        FROM cents
    )
    SELECT CAST(cent_part AS BIGINT) AS cent_ending,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM cents)
                AS BIGINT) AS share_ppm,
           CAST(SUM(CASE WHEN dollar_last = 9 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nine_dollar
    FROM digits GROUP BY cent_part
    ORDER BY n DESC, cent_ending LIMIT 10
    """,
)
def agg_price_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-point ladder analysis: the distribution of cent endings
    (.99, .95, .00 …) and nine-ending dollar digits — the
    psychological-pricing audit that distinguishes deliberate price
    architecture from arithmetic artifacts (a uniform cent
    distribution, as in this synthetic fixture, is itself the
    finding: no pricing policy exists). Shares in exact ppm; top-10
    endings with a deterministic tie order. A digit-distribution
    sibling of dq_benford_digits aimed at pricing instead of fraud.

    One modular-arithmetic scan and a 100-cell groupBy.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c")
    )
    tot = cents.agg(F.count("*").alias("t"))
    digits = cents.select(
        (F.col("c") % 100).alias("cent_part"),
        F.expr("(c div 100) % 10").alias("dollar_last"),
    )
    return (
        digits.crossJoin(F.broadcast(tot))
        .groupBy(F.col("cent_part").cast("bigint").alias("cent_ending"), "t")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("dollar_last") == 9, 1).otherwise(0)).alias(
                "n_nine_dollar"
            ),
        )
        .select(
            "cent_ending",
            "n",
            F.expr("n * 1000000 div t").cast("bigint").alias("share_ppm"),
            "n_nine_dollar",
        )
        .orderBy(F.desc("n"), "cent_ending")
        .limit(10)
    )


@register(
    "agg_discount_response",
    oracle="""
    WITH b AS (
        SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc_pct,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
        FROM lineitem
    )
    SELECT disc_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(SUM(qty) * 1000000 // COUNT(*) AS BIGINT)
               AS qty_per_line_micro,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM b GROUP BY disc_pct
    """,
)
def agg_discount_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-depth response curve: volume per line at each discount
    percentage — the merchandising question behind every promo
    calendar ("does 7% move more units than 5%?"), and the tabular
    input to agg_price_elasticity's scalar. Discount percentages are
    exact integers (the fixture's discounts are hundredths), units
    per line is an exact micro-units floor ratio, and a flat curve —
    as synthetic data produces — is the "discounts don't drive
    volume here" finding.

    One modular scan and a ≤11-cell groupBy with map-side combine.
    """
    b = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("disc_pct"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    return b.groupBy("disc_pct").agg(
        F.count("*").alias("n_lines"),
        F.sum("qty").alias("total_qty"),
        F.expr("SUM(qty) * 1000000 div COUNT(*)").cast("bigint").alias(
            "qty_per_line_micro"
        ),
        F.sum("cents").alias("revenue_cents"),
    )


@register(
    "agg_otif",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey,
               CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
                    THEN 1 ELSE 0 END AS on_time,
               CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END AS in_full
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    per_supplier AS (
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(on_time * in_full) AS BIGINT) AS n_otif
        FROM shipped GROUP BY l_suppkey
        HAVING COUNT(*) >= 50
    )
    SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, n_lines, n_otif,
           CAST(n_otif * 1000000 // n_lines AS BIGINT) AS otif_ppm
    FROM per_supplier
    ORDER BY otif_ppm, l_suppkey LIMIT 15
    """,
)
def agg_otif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Time-In-Full supplier scorecard: lines shipped within 30
    days of order AND not returned, as an exact ppm per supplier —
    the procurement KPI behind vendor penalties, reported as the
    WORST 15 qualified suppliers (the review targets; a ≥50-line
    floor keeps small-sample suppliers out of the penalty list — the
    cross-multiplied alternative would be a Wilson lower bound,
    stats_wilson_ci's machinery). Both conditions are integer flags;
    the conjunction is their product.

    One fact join on the order key (orders side pruned to two
    columns), a supplier-grain aggregate, TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    shipped = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.when(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, 1
        )
        .otherwise(0)
        .alias("on_time"),
        F.when(F.col("l_returnflag") != "R", 1).otherwise(0).alias("in_full"),
    )
    per_supplier = (
        shipped.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("on_time") * F.col("in_full")).alias("n_otif"),
        )
        .where(F.col("n_lines") >= 50)
    )
    return (
        per_supplier.select(
            F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
            "n_lines",
            "n_otif",
            F.expr("n_otif * 1000000 div n_lines").cast("bigint").alias(
                "otif_ppm"
            ),
        )
        .orderBy("otif_ppm", "l_suppkey")
        .limit(15)
    )


@register(
    "agg_cross_sell_gap",
    oracle="""
    WITH owned AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey % 10 AS cat
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    base AS (
        SELECT cat, CAST(COUNT(*) AS BIGINT) AS owners
        FROM owned GROUP BY cat
    ),
    both_cats AS (
        SELECT a.cat AS cat_a, b.cat AS cat_b,
               CAST(COUNT(*) AS BIGINT) AS own_both
        FROM owned a JOIN owned b
          ON b.o_custkey = a.o_custkey AND a.cat <> b.cat
        GROUP BY a.cat, b.cat
    )
    SELECT bc.cat_a, bc.cat_b,
           ba.owners AS owners_a,
           CAST(ba.owners - bc.own_both AS BIGINT) AS gap_customers,
           CAST((ba.owners - bc.own_both) * 1000000 // ba.owners AS BIGINT)
               AS gap_ppm
    FROM both_cats bc JOIN base ba ON ba.cat = bc.cat_a
    ORDER BY gap_ppm DESC, cat_a, cat_b LIMIT 15
    """,
)
def agg_cross_sell_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sell whitespace: for every ordered category pair, the
    customers who own A but not B — the gap matrix sales teams
    actually work from (agg_basket_affinity says what goes together;
    this says where the untapped pairs are). Gap = owners(A) −
    owners(A∧B), computed from one distinct-ownership frame and its
    self-join; gap share in exact ppm, top-15 worst gaps.

    Distinct-before-pairing keeps the self-join categories²-bounded
    per customer; the category bases broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    owned = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", (F.col("l_partkey") % 10).alias("cat"))
        .distinct()
    )
    base = owned.groupBy("cat").agg(F.count("*").alias("owners"))
    a, b = owned.alias("a"), owned.alias("b")
    both_cats = (
        a.join(
            b,
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (F.col("a.cat") != F.col("b.cat")),
        )
        .groupBy(F.col("a.cat").alias("cat_a"), F.col("b.cat").alias("cat_b"))
        .agg(F.count("*").alias("own_both"))
    )
    return (
        both_cats.join(
            F.broadcast(base.withColumnRenamed("cat", "cat_a")), "cat_a"
        )
        .select(
            "cat_a",
            "cat_b",
            F.col("owners").alias("owners_a"),
            (F.col("owners") - F.col("own_both")).cast("bigint").alias(
                "gap_customers"
            ),
            F.expr("(owners - own_both) * 1000000 div owners")
            .cast("bigint")
            .alias("gap_ppm"),
        )
        .orderBy(F.desc("gap_ppm"), "cat_a", "cat_b")
        .limit(15)
    )


@register(
    "agg_subscription_detect",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               datediff('day', lag(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey), o_orderdate) AS g
        FROM orders
    ),
    m AS (
        SELECT o_custkey,
               CAST(COUNT(g) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS s,
               CAST(SUM(g * g) AS BIGINT) AS s2
        FROM gaps WHERE g IS NOT NULL
        GROUP BY o_custkey HAVING COUNT(g) >= 5
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_qualified,
           CAST(SUM(CASE WHEN 4 * (n * s2 - s * s) < s * s
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_regular,
           CAST(SUM(CASE WHEN 4 * (n * s2 - s * s) < s * s
                    THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
               AS regular_ppm,
           CAST(MIN(CASE WHEN 4 * (n * s2 - s * s) < s * s
                    THEN s // n END) AS BIGINT) AS min_regular_cadence_days
    FROM m
    """,
)
def agg_subscription_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subscription-behavior detection: customers whose order cadence
    is REGULAR — coefficient of variation of inter-order gaps below
    1/2 — found without a single float: CV² < 1/4 cross-multiplies to
    4·(n·Σg² − (Σg)²) < (Σg)² over exact integer day gaps (the
    biased-variance form keeps one n factor; fine for a threshold).
    ≥5 gaps to qualify. Regular cadence is the replenishment /
    subscription signal that retention teams treat differently from
    impulse buyers.

    One per-customer lag window and moment aggregate; the decision is
    O(customers) integer comparisons.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    m = (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("g").alias("n"),
            F.sum("g").alias("s"),
            F.sum(F.col("g") * F.col("g")).alias("s2"),
        )
        .where(F.col("n") >= 5)
    )
    regular = F.expr("4 * (n * s2 - s * s) < s * s")
    return m.agg(
        F.count("*").alias("n_qualified"),
        F.sum(F.when(regular, 1).otherwise(0)).alias("n_regular"),
        F.expr(
            "SUM(CASE WHEN 4 * (n * s2 - s * s) < s * s THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*)"
        )
        .cast("bigint")
        .alias("regular_ppm"),
        F.min(F.when(regular, F.expr("s div n"))).cast("bigint").alias(
            "min_regular_cadence_days"
        ),
    )


@register(
    "stats_welch_ttest",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    m AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(CAST(cents AS DECIMAL(38,0))
                        * CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS s2
        FROM pop GROUP BY grp
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN grp = 1 THEN n END) AS n1,
            MAX(CASE WHEN grp = 1 THEN s END) AS s1,
            MAX(CASE WHEN grp = 1 THEN s2 END) AS q1,
            MAX(CASE WHEN grp = 0 THEN n END) AS n2,
            MAX(CASE WHEN grp = 0 THEN s END) AS s2_,
            MAX(CASE WHEN grp = 0 THEN s2 END) AS q2
        FROM m
    )
    SELECT n1, n2,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
           CAST(s2_ AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
           (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(s2_ AS DOUBLE) / CAST(n2 AS DOUBLE))
           / sqrt(
               ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
               / CAST(n1 AS DOUBLE)
               + ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
                   - CAST(s2_ AS DOUBLE) * CAST(s2_ AS DOUBLE))
                  / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
               / CAST(n2 AS DOUBLE)) AS t_welch
    FROM wide
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic (purchase vs click value)
    — the parametric sibling of stats_mannwhitney. Sufficient
    statistics are exact: integer-cent sums in int64 and squared sums
    through DECIMAL(38,0) (cents-squared escapes int64 at sf0.1;
    scale-0 decimal -> double is a single IEEE rounding on both
    engines, so the cast is safe where scaled decimals are not). The
    t statistic is one fixed written-order chain of mul/sub/div/sqrt
    over those exact scalars — bit-portable. One partial-aggregated
    shuffle on a 2-value key; nothing else moves.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    pop = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    d38 = "decimal(38,0)"
    m = pop.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents").cast(d38))
        .cast(d38)
        .alias("s2"),
    )
    wide = m.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("grp") == 1, F.col("s2"))).alias("q1"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == 0, F.col("s"))).alias("s2_"),
        F.max(F.when(F.col("grp") == 0, F.col("s2"))).alias("q2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    s1 = F.col("s1").cast("double")
    s2_ = F.col("s2_").cast("double")
    q1 = F.col("q1").cast("double")
    q2 = F.col("q2").cast("double")
    v1 = (n1 * q1 - s1 * s1) / (n1 * (n1 - F.lit(1.0)))
    v2 = (n2 * q2 - s2_ * s2_) / (n2 * (n2 - F.lit(1.0)))
    t = (s1 / n1 - s2_ / n2) / F.sqrt(v1 / n1 + v2 / n2)
    return wide.select(
        "n1",
        "n2",
        (s1 / n1).alias("mean1"),
        (s2_ / n2).alias("mean2"),
        t.alias("t_welch"),
    )


@register(
    "stats_kruskal_wallis",
    oracle="""
    WITH pop AS (
        SELECT event_type AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('purchase', 'click', 'view')
          AND value IS NOT NULL
    ),
    per_cents AS (
        SELECT cents, grp, CAST(COUNT(*) AS BIGINT) AS n_gc
        FROM pop GROUP BY cents, grp
    ),
    per_val AS (
        SELECT cents, CAST(SUM(n_gc) AS BIGINT) AS n_c
        FROM per_cents GROUP BY cents
    ),
    ranked AS (
        SELECT cents, n_c,
               SUM(n_c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
                   - n_c AS cnt_less
        FROM per_val
    ),
    rank_sums AS (
        SELECT pc.grp,
               CAST(SUM(pc.n_gc) AS BIGINT) AS n_j,
               CAST(2.0 * SUM(CAST(pc.n_gc AS DOUBLE)
                   * (CAST(r.cnt_less AS DOUBLE)
                      + (CAST(r.n_c AS DOUBLE) + 1.0) / 2.0)) AS BIGINT)
                   AS rr_j
        FROM per_cents pc JOIN ranked r ON r.cents = pc.cents
        GROUP BY pc.grp
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN grp = 'purchase' THEN n_j END) AS n1,
            MAX(CASE WHEN grp = 'purchase' THEN rr_j END) AS rr1,
            MAX(CASE WHEN grp = 'click' THEN n_j END) AS n2,
            MAX(CASE WHEN grp = 'click' THEN rr_j END) AS rr2,
            MAX(CASE WHEN grp = 'view' THEN n_j END) AS n3,
            MAX(CASE WHEN grp = 'view' THEN rr_j END) AS rr3
        FROM rank_sums
    ),
    ties AS (
        SELECT CAST(SUM(n_c) AS BIGINT) AS n,
               CAST(SUM(n_c * n_c * n_c - n_c) AS BIGINT) AS tie_sum
        FROM per_val
    ),
    parts AS (
        SELECT t.n, t.tie_sum,
               CAST(rr1 * rr1 // (4 * n1) + rr2 * rr2 // (4 * n2)
                    + rr3 * rr3 // (4 * n3) AS BIGINT) AS a_int,
               CAST((rr1 * rr1 % (4 * n1)) * n2 * n3
                    + (rr2 * rr2 % (4 * n2)) * n1 * n3
                    + (rr3 * rr3 % (4 * n3)) * n1 * n2 AS BIGINT) AS f_num,
               CAST(4 * n1 * n2 * n3 AS BIGINT) AS f_den
        FROM wide w CROSS JOIN ties t
    ),
    h AS (
        SELECT n, tie_sum,
               12.0 * (CAST(a_int AS DOUBLE)
                       + CAST(f_num AS DOUBLE) / CAST(f_den AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
               - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h_raw
        FROM parts
    )
    SELECT CAST(n AS BIGINT) AS n, h_raw,
           h_raw / (1.0 - CAST(tie_sum AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
               AS h_corrected
    FROM h
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (3-group rank ANOVA: purchase vs click vs
    view) with tie correction — the k-group extension of
    stats_mannwhitney, sharing its distributed-rank machinery:
    group by integer-cents, prefix-sum the bounded distinct-value
    frame, average rank = cnt_less + (ties+1)/2 (dyadic halves, sum
    EXACT in any order). A float SUM(r_j^2/n_j) over the three groups
    is order-dependent (it DID diverge 1 ulp on one fixture
    generation), so the three groups are pivoted into one row and
    sum(r_j^2/n_j) is split exactly: with R_j = 2*r_j (exact int64),
    integer part = sum R_j^2 div (4*n_j), fractional part = the
    remainders over the common denominator 4*n1*n2*n3 — every
    intermediate < 2^53, so the closing
    12*(a + fn/fd)/(n(n+1)) - 3(n+1) is a fixed-order float chain
    with identical bits on both engines.

    Scale: one shuffle to per-(cents,grp) cells, one to the
    distinct-cents frame; no global row window anywhere.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click", "view")
        & F.col("value").isNotNull()
    )
    pop = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    per_cents = pop.groupBy("cents", "grp").agg(F.count("*").alias("n_gc"))
    per_val = per_cents.groupBy("cents").agg(F.sum("n_gc").alias("n_c"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_val.select(
        "cents",
        "n_c",
        (F.sum("n_c").over(w) - F.col("n_c")).alias("cnt_less"),
    )
    avg_rank = F.col("cnt_less").cast("double") + (
        F.col("n_c").cast("double") + F.lit(1.0)
    ) / F.lit(2.0)
    rank_sums = (
        per_cents.join(ranked, "cents")
        .groupBy("grp")
        .agg(
            F.sum("n_gc").alias("n_j"),
            (
                F.lit(2.0)
                * F.sum(F.col("n_gc").cast("double") * avg_rank)
            )
            .cast("long")
            .alias("rr_j"),
        )
    )
    wide = rank_sums.agg(
        *[
            F.max(F.when(F.col("grp") == g, F.col(c))).alias(f"{c[0]}{i}")
            for i, g in enumerate(["purchase", "click", "view"], start=1)
            for c in ("n_j", "rr_j")
        ]
    ).toDF("n1", "rr1", "n2", "rr2", "n3", "rr3")
    ties = per_val.agg(
        F.sum("n_c").alias("n"),
        F.sum(
            F.col("n_c") * F.col("n_c") * F.col("n_c") - F.col("n_c")
        ).alias("tie_sum"),
    )
    parts = wide.crossJoin(F.broadcast(ties)).select(
        "n",
        "tie_sum",
        F.expr(
            "CAST(rr1 * rr1 div (4 * n1) + rr2 * rr2 div (4 * n2)"
            " + rr3 * rr3 div (4 * n3) AS BIGINT)"
        ).alias("a_int"),
        F.expr(
            "CAST((rr1 * rr1 % (4 * n1)) * n2 * n3"
            " + (rr2 * rr2 % (4 * n2)) * n1 * n3"
            " + (rr3 * rr3 % (4 * n3)) * n1 * n2 AS BIGINT)"
        ).alias("f_num"),
        F.expr("CAST(4 * n1 * n2 * n3 AS BIGINT)").alias("f_den"),
    )
    nd = F.col("n").cast("double")
    t_exact = F.col("a_int").cast("double") + F.col("f_num").cast(
        "double"
    ) / F.col("f_den").cast("double")
    h = parts.select(
        "n",
        "tie_sum",
        (
            F.lit(12.0) * t_exact / (nd * (nd + F.lit(1.0)))
            - F.lit(3.0) * (nd + F.lit(1.0))
        ).alias("h_raw"),
    )
    return h.select(
        F.col("n").cast("long").alias("n"),
        "h_raw",
        (
            F.col("h_raw")
            / (
                F.lit(1.0)
                - F.col("tie_sum").cast("double") / (nd * nd * nd - nd)
            )
        ).alias("h_corrected"),
    )


@register(
    "stats_jarque_bera",
    oracle="""
    WITH pop AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s2,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
                        * CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s3,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
                        * CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s4
        FROM pop GROUP BY event_type
    ),
    r AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS r1,
               (CAST(CAST((s2 - (((s2 % 9007199254740992)
                                  + 9007199254740992) % 9007199254740992))
                          / 9007199254740992 AS BIGINT) AS DOUBLE)
                * 9007199254740992.0
                + CAST(CAST((((s2 % 9007199254740992) + 9007199254740992)
                             % 9007199254740992) AS BIGINT) AS DOUBLE))
               / CAST(n AS DOUBLE) AS r2,
               (CAST(CAST((s3 - (((s3 % 9007199254740992)
                                  + 9007199254740992) % 9007199254740992))
                          / 9007199254740992 AS BIGINT) AS DOUBLE)
                * 9007199254740992.0
                + CAST(CAST((((s3 % 9007199254740992) + 9007199254740992)
                             % 9007199254740992) AS BIGINT) AS DOUBLE))
               / CAST(n AS DOUBLE) AS r3,
               (CAST(CAST((s4 - (((s4 % 9007199254740992)
                                  + 9007199254740992) % 9007199254740992))
                          / 9007199254740992 AS BIGINT) AS DOUBLE)
                * 9007199254740992.0
                + CAST(CAST((((s4 % 9007199254740992) + 9007199254740992)
                             % 9007199254740992) AS BIGINT) AS DOUBLE))
               / CAST(n AS DOUBLE) AS r4
        FROM m
    )
    SELECT event_type, n,
           (r3 - 3.0 * r1 * r2 + 2.0 * r1 * r1 * r1)
               / sqrt((r2 - r1 * r1) * (r2 - r1 * r1) * (r2 - r1 * r1))
               AS skewness,
           (r4 - 4.0 * r1 * r3 + 6.0 * r1 * r1 * r2
            - 3.0 * r1 * r1 * r1 * r1)
               / ((r2 - r1 * r1) * (r2 - r1 * r1)) - 3.0
               AS excess_kurtosis
    FROM r
    """,
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normality diagnostics (skewness, excess kurtosis — the
    Jarque-Bera ingredients) per event type from exact raw moments:
    integer cents powers summed through DECIMAL(38,0). The wide sums
    CANNOT be cast to double directly — past 2^53 Spark's
    BigDecimal->double and DuckDB's HUGEINT->double round differently
    (observed on this very op: 1-ulp kurtosis drift at sf0.01) — so
    each sum is split hi/lo at 2^53 with sign-safe pmod arithmetic:
    hi = (s - pmod(s, 2^53)) / 2^53 (exact decimal division of a
    divisible numerator), lo = pmod(s, 2^53); both halves are < 2^53
    => exact in double, and hi * 2^53 is a power-of-two scale (exact),
    leaving ONE rounding at the final add — identical on both
    engines. Central moments then expand from r1..r4 in one fixed
    written-order chain; the m2^1.5 denominator is written
    sqrt(m2*m2*m2) so the chain stays in div/mul/sqrt (pow is not
    portable).

    Scale: one partial-aggregated shuffle on a 2-value key.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    d38 = "decimal(38,0)"
    c = F.round(F.col("value") * 100).cast("long")
    pop = ev.select("event_type", c.alias("c"))
    cd = F.col("c").cast(d38)
    m = pop.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(cd * cd).cast(d38).alias("s2"),
        F.sum(cd * cd * cd).cast(d38).alias("s3"),
        F.sum(cd * cd * cd * cd).cast(d38).alias("s4"),
    )

    def wide_over_n(col: str) -> F.Column:
        # (hi * 2^53 + lo) / n with hi/lo both < 2^53: bit-portable
        # double rendering of a DECIMAL(38,0) magnitude (see docstring)
        return F.expr(
            f"(CAST(CAST(({col} - pmod({col}, 9007199254740992))"
            f" / 9007199254740992 AS BIGINT) AS DOUBLE)"
            f" * 9007199254740992.0D"
            f" + CAST(CAST(pmod({col}, 9007199254740992) AS BIGINT)"
            f" AS DOUBLE)) / CAST(n AS DOUBLE)"
        )

    r = m.select(
        "event_type",
        "n",
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias("r1"),
        wide_over_n("s2").alias("r2"),
        wide_over_n("s3").alias("r3"),
        wide_over_n("s4").alias("r4"),
    )
    r1 = F.col("r1")
    r2 = F.col("r2")
    r3 = F.col("r3")
    r4 = F.col("r4")
    m2 = r2 - r1 * r1
    m3 = r3 - F.lit(3.0) * r1 * r2 + F.lit(2.0) * r1 * r1 * r1
    m4 = (
        r4
        - F.lit(4.0) * r1 * r3
        + F.lit(6.0) * r1 * r1 * r2
        - F.lit(3.0) * r1 * r1 * r1 * r1
    )
    return r.select(
        "event_type",
        "n",
        (m3 / F.sqrt(m2 * m2 * m2)).alias("skewness"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("excess_kurtosis"),
    )


@register(
    "stats_levene_bf",
    oracle="""
    WITH pop AS (
        SELECT event_type AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('purchase', 'click', 'view')
          AND value IS NOT NULL
    ),
    per_cents AS (
        SELECT grp, c, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM pop GROUP BY grp, c
    ),
    cum AS (
        SELECT grp, c, n_c,
               SUM(n_c) OVER (PARTITION BY grp ORDER BY c
                              ROWS UNBOUNDED PRECEDING) AS cum_n,
               SUM(n_c) OVER (PARTITION BY grp) AS n_g
        FROM per_cents
    ),
    med AS (
        SELECT grp,
               CAST(MIN(CASE WHEN cum_n >= (n_g + 1) // 2 THEN c END)
                    + MIN(CASE WHEN cum_n >= (n_g + 2) // 2 THEN c END)
                    AS BIGINT) AS med2
        FROM cum GROUP BY grp
    ),
    dev AS (
        SELECT p.grp, abs(2 * p.c - m.med2) AS z2
        FROM pop p JOIN med m ON m.grp = p.grp
    ),
    gstats AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
               CAST(SUM(z2) AS BIGINT) AS s_j,
               CAST(SUM(CAST(z2 AS DECIMAL(38,0)) * CAST(z2 AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS q_j
        FROM dev GROUP BY grp
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(SUM(s_j) AS BIGINT) AS s
        FROM gstats
    ),
    terms AS (
        SELECT t.n, t.k,
               g.grp,
               (CAST(g.s_j AS DOUBLE) / CAST(g.n_j AS DOUBLE)
                - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
               * (CAST(g.s_j AS DOUBLE) / CAST(g.n_j AS DOUBLE)
                  - CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
               * CAST(g.n_j AS DOUBLE) AS ssb_t,
               CAST(g.q_j AS DOUBLE)
               - CAST(g.s_j AS DOUBLE) * CAST(g.s_j AS DOUBLE)
                 / CAST(g.n_j AS DOUBLE) AS ssw_t
        FROM gstats g CROSS JOIN tot t
    )
    SELECT n, k,
           (list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
                                    list(ssb_t ORDER BY grp)),
                        (a, x) -> a + x)
            / (CAST(k AS DOUBLE) - 1.0))
           / (list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
                                      list(ssw_t ORDER BY grp)),
                          (a, x) -> a + x)
              / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_bf
    FROM terms
    GROUP BY n, k
    """,
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test for equal spread
    across the three event types — the variance-homogeneity guard
    that should precede any ANOVA. Per-group medians come from the
    per-cents cumulative-count frame (no global row sort): the two
    central order statistics are min-cents-with-cum>=k, doubled into
    med2 = 2*median so ties at .5 stay INTEGER. Deviations
    |2c - med2| are integers; the one-way F over them uses exact
    sums (squares through DECIMAL(38,0)) and a fixed final chain.
    The 3-term between/within sums are GRP-ORDERED FOLDS, not SUMs —
    a free-order 3-double reduction diverged by 1 ulp at sf0.001
    (caught by the parity suite); folding in group order makes the
    addition sequence identical on both engines.

    Scale: two shuffles on (grp, cents) cells + one broadcast-back
    median join; never a per-row window.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click", "view")
        & F.col("value").isNotNull()
    )
    pop = ev.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    per_cents = pop.groupBy("grp", "c").agg(F.count("*").alias("n_c"))
    wc = (
        Window.partitionBy("grp")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy("grp")
    cum = per_cents.select(
        "grp",
        "c",
        F.sum("n_c").over(wc).alias("cum_n"),
        F.sum("n_c").over(wg).alias("n_g"),
    )
    med = cum.groupBy("grp").agg(
        (
            F.min(
                F.when(
                    F.col("cum_n") >= F.expr("(n_g + 1) div 2"), F.col("c")
                )
            )
            + F.min(
                F.when(
                    F.col("cum_n") >= F.expr("(n_g + 2) div 2"), F.col("c")
                )
            )
        ).alias("med2")
    )
    dev = pop.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.lit(2) * F.col("c") - F.col("med2")).alias("z2")
    )
    d38 = "decimal(38,0)"
    gstats = dev.groupBy("grp").agg(
        F.count("*").alias("n_j"),
        F.sum("z2").alias("s_j"),
        F.sum(F.col("z2").cast(d38) * F.col("z2").cast(d38))
        .cast(d38)
        .alias("q_j"),
    )
    tot = gstats.agg(
        F.count("*").alias("k"),
        F.sum("n_j").alias("n"),
        F.sum("s_j").alias("s"),
    )
    j = gstats.crossJoin(F.broadcast(tot))
    mean_j = F.col("s_j").cast("double") / F.col("n_j").cast("double")
    gmean = F.col("s").cast("double") / F.col("n").cast("double")
    ssb_term = (mean_j - gmean) * (mean_j - gmean) * F.col("n_j").cast("double")
    ssw_term = F.col("q_j").cast("double") - F.col("s_j").cast("double") * F.col(
        "s_j"
    ).cast("double") / F.col("n_j").cast("double")
    terms = j.select(
        "n", "k", "grp", ssb_term.alias("ssb_t"), ssw_term.alias("ssw_t")
    )
    # grp-ORDERED folds: a plain 3-term SUM reduces in engine-specific
    # order and diverged by 1 ulp at sf0.001 — the fold pins the order
    ordered_sum = (
        "aggregate(transform(array_sort(collect_list(struct(grp, {c}))),"
        " s -> s.{c}), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    out = terms.groupBy("n", "k").agg(
        F.expr(ordered_sum.format(c="ssb_t")).alias("ssb"),
        F.expr(ordered_sum.format(c="ssw_t")).alias("ssw"),
    )
    return out.select(
        "n",
        "k",
        (
            (F.col("ssb") / (F.col("k").cast("double") - F.lit(1.0)))
            / (
                F.col("ssw")
                / (F.col("n").cast("double") - F.col("k").cast("double"))
            )
        ).alias("f_bf"),
    )


@register(
    "stats_kendall_tau",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS m,
               CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
        FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    cnt AS (
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n0,
            CAST(SUM(CASE WHEN (xa < xb AND ya < yb)
                         OR (xa > xb AND ya > yb) THEN 1 ELSE 0 END)
                 AS BIGINT) AS c,
            CAST(SUM(CASE WHEN (xa < xb AND ya > yb)
                         OR (xa > xb AND ya < yb) THEN 1 ELSE 0 END)
                 AS BIGINT) AS d,
            CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS tx,
            CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT) AS ty
        FROM pairs
    )
    SELECT n0, c, d,
           (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
           / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
                  * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))) AS tau_b
    FROM cnt
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between monthly click and purchase revenue —
    concordance-based trend association, robust where Pearson is
    not. All-pairs comparison is QUADRATIC by definition, so it runs
    on the CALENDAR-bounded monthly reducer (k months -> k(k-1)/2
    pairs — bounded by time span, never by data volume; the fact
    table pays one aggregation). Pure integer pair counts; tau-b is
    one sub/div/sqrt chain — portable bits.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0).cast(
        "bigint"
    )
    monthly = ev.groupBy(
        F.date_trunc("month", "ts").cast("date").alias("m")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0))
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .alias("y"),
    )
    a = monthly.select(
        F.col("m").alias("ma"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = monthly.select(
        F.col("m").alias("mb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("ma") < F.col("mb"))
    conc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb")))
    )
    disc = (
        ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
        | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb")))
    )
    cnt = pairs.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(conc, 1).otherwise(0)).alias("c"),
        F.sum(F.when(disc, 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0)).alias("ty"),
    )
    return cnt.select(
        "n0",
        "c",
        "d",
        (
            (F.col("c").cast("double") - F.col("d").cast("double"))
            / F.sqrt(
                (F.col("n0").cast("double") - F.col("tx").cast("double"))
                * (F.col("n0").cast("double") - F.col("ty").cast("double"))
            )
        ).alias("tau_b"),
    )


@register(
    "stats_spearman",
    oracle="""
    WITH pop AS (
        SELECT CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS xc,
               CAST(n_chars AS BIGINT) AS yc
        FROM events e JOIN documents d ON d.doc_id = e.user_id
        WHERE e.value IS NOT NULL
    ),
    rx AS (
        SELECT xc,
               CAST(2 * (SUM(cnt) OVER (ORDER BY xc ROWS UNBOUNDED
                    PRECEDING) - cnt) + cnt + 1 AS BIGINT) AS rx2
        FROM (SELECT xc, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM pop GROUP BY xc)
    ),
    ry AS (
        SELECT yc,
               CAST(2 * (SUM(cnt) OVER (ORDER BY yc ROWS UNBOUNDED
                    PRECEDING) - cnt) + cnt + 1 AS BIGINT) AS ry2
        FROM (SELECT yc, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM pop GROUP BY yc)
    ),
    joined AS (
        SELECT rx.rx2, ry.ry2
        FROM pop p JOIN rx ON rx.xc = p.xc JOIN ry ON ry.yc = p.yc
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx2) AS BIGINT) AS sx,
               CAST(SUM(ry2) AS BIGINT) AS sy,
               CAST(SUM(CAST(rx2 AS DECIMAL(38,0))
                        * CAST(ry2 AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxy,
               CAST(SUM(CAST(rx2 AS DECIMAL(38,0))
                        * CAST(rx2 AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS sxx,
               CAST(SUM(CAST(ry2 AS DECIMAL(38,0))
                        * CAST(ry2 AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS syy
        FROM joined
    )
    SELECT n,
           (CAST(n AS DOUBLE) * (CAST(CAST((sxy - sxy % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((sxy % 1000000000000000000 - sxy % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(sxy % 1000000000 AS BIGINT) AS DOUBLE))
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * (CAST(CAST((sxx - sxx % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((sxx % 1000000000000000000 - sxx % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(sxx % 1000000000 AS BIGINT) AS DOUBLE))
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / sqrt(CAST(n AS DOUBLE) * (CAST(CAST((syy - syy % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((syy % 1000000000000000000 - syy % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(syy % 1000000000 AS BIGINT) AS DOUBLE))
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS rho
    FROM s
    """,
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (event value vs joined document
    length) with tie-averaged ranks — monotone association without
    Pearson's linearity assumption. Distributed ranking, twice: each
    variable's tie-averaged rank comes from its per-value
    cumulative-count frame (the stats_mannwhitney construction) and
    joins back by value — no global row-number sort. Ranks are kept
    DOUBLED (2r is integer: 2*cnt_less + ties + 1) so every rank is
    int64-exact; moment sums go through DECIMAL(38,0) rendered via
    registry.wide_dbl's limb split (bare scale-0 casts are 1-ulp
    unsafe past 2^53), and Pearson-on-ranks is the fixed
    mul/sub/div/sqrt chain. The doubling
    cancels in the correlation, so rho needs no rescaling.

    Scale: two per-value aggregations + two equi-joins back on the
    value key; all shuffles carry distinct-value frames.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.col("n_chars").cast("long").alias("yc")
    )
    pop = ev.join(docs, ev.user_id == docs.doc_id).select(
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
        .cast("long")
        .alias("xc"),
        "yc",
    )

    def rank2(df: DataFrame, col: str, out: str) -> DataFrame:
        per = df.groupBy(col).agg(F.count("*").alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return per.select(
            col,
            (
                F.lit(2) * (F.sum("cnt").over(w) - F.col("cnt"))
                + F.col("cnt")
                + F.lit(1)
            ).cast("long").alias(out),
        )

    rx = rank2(pop, "xc", "rx2")
    ry = rank2(pop, "yc", "ry2")
    joined = pop.join(rx, "xc").join(ry, "yc").select("rx2", "ry2")
    d38 = "decimal(38,0)"
    s = joined.agg(
        F.count("*").alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2").cast(d38) * F.col("ry2").cast(d38))
        .cast(d38)
        .alias("sxy"),
        F.sum(F.col("rx2").cast(d38) * F.col("rx2").cast(d38))
        .cast(d38)
        .alias("sxx"),
        F.sum(F.col("ry2").cast(d38) * F.col("ry2").cast(d38))
        .cast(d38)
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    # wide_dbl: bare decimal->double casts diverge 1 ulp past 2^53
    num = nd * F.expr(wide_dbl("sxy")) - sx * sy
    denx = F.sqrt(nd * F.expr(wide_dbl("sxx")) - sx * sx)
    deny = F.sqrt(nd * F.expr(wide_dbl("syy")) - sy * sy)
    return s.select("n", (num / denx / deny).alias("rho"))


@register(
    "stats_t_paired",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT)
               - CAST(SUM(CASE WHEN event_type = 'view'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS diff
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(diff) AS BIGINT) AS sd_,
               CAST(SUM(CAST(diff AS DECIMAL(38,0))
                        * CAST(diff AS DECIMAL(38,0))) AS DECIMAL(38,0))
                   AS q
        FROM daily
    )
    SELECT n,
           CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_diff_usd,
           (CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt(((CAST(n AS DOUBLE) * (CAST(CAST((q - q % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q % 1000000000000000000 - q % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q % 1000000000 AS BIGINT) AS DOUBLE))
                    - CAST(sd_ AS DOUBLE) * CAST(sd_ AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  / CAST(n AS DOUBLE)) AS t_paired
    FROM s
    """,
)
def stats_t_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t statistic on day-matched differences (click minus
    view revenue per day) — the within-subject design where each day
    is its own control, removing day-level variance that the
    independent-samples test would drown in. Differences are exact
    integer cents; squared sums ride DECIMAL(38,0); t is the fixed
    mean/sd/sqrt chain. One aggregation over the fact table, one
    1-row scalar reduction.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0).cast(
        "bigint"
    )
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        (
            F.sum(F.when(F.col("event_type") == "click", cents).otherwise(0))
            - F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        ).alias("diff")
    )
    d38 = "decimal(38,0)"
    s = daily.agg(
        F.count("*").alias("n"),
        F.sum("diff").alias("sd_"),
        F.sum(F.col("diff").cast(d38) * F.col("diff").cast(d38))
        .cast(d38)
        .alias("q"),
    )
    nd = F.col("n").cast("double")
    sdd = F.col("sd_").cast("double")
    var = (nd * F.expr(wide_dbl("q")) - sdd * sdd) / (
        nd * (nd - F.lit(1.0))
    )
    return s.select(
        "n",
        (sdd / nd / F.lit(100.0)).alias("mean_diff_usd"),
        ((sdd / nd) / F.sqrt(var / nd)).alias("t_paired"),
    )


@register(
    "ml_ridge_closed_form",
    oracle="""
    WITH pop AS (
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS sx1,
               CAST(SUM(x2) AS BIGINT) AS sx2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(x1 AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s11,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s12,
               CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s22,
               CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s1y,
               CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS s2y
        FROM pop
    ),
    c AS (
        SELECT n,
               (CAST(CAST((s11 - s11 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s11 % 1000000000000000000 - s11 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s11 % 1000000000 AS BIGINT) AS DOUBLE)) - CAST(sx1 AS DOUBLE)
                   * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) + 1000.0 AS a11,
               (CAST(CAST((s12 - s12 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s12 % 1000000000000000000 - s12 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s12 % 1000000000 AS BIGINT) AS DOUBLE)) - CAST(sx1 AS DOUBLE)
                   * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) AS a12,
               (CAST(CAST((s22 - s22 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s22 % 1000000000000000000 - s22 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s22 % 1000000000 AS BIGINT) AS DOUBLE)) - CAST(sx2 AS DOUBLE)
                   * CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) + 1000.0 AS a22,
               (CAST(CAST((s1y - s1y % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s1y % 1000000000000000000 - s1y % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s1y % 1000000000 AS BIGINT) AS DOUBLE)) - CAST(sx1 AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b1,
               (CAST(CAST((s2y - s2y % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s2y % 1000000000000000000 - s2y % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s2y % 1000000000 AS BIGINT) AS DOUBLE)) - CAST(sx2 AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b2,
               CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
        FROM s
    )
    SELECT n,
           (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) AS beta1,
           (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) AS beta2,
           my - (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) * m1
              - (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) * m2
               AS intercept
    FROM c
    """,
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (2 features + intercept, lambda=1000) in
    closed form: centered normal equations solved by Cramer's rule —
    the L2-regularized upgrade of ml_linreg_normal_eq, numerically
    safe where plain OLS is near-singular (collinear features). All
    sufficient statistics are exact (int64 / DECIMAL(38,0) with
    scale-0 casts); the 2x2 solve is a fixed written-order double
    chain, so coefficients are bit-identical across engines. ONE
    distributed pass (a 9-term partial aggregate), O(1) driver math
    — the classic "ML as an aggregation" shape that scales to any
    row count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pop = li.select(
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    d38 = "decimal(38,0)"

    def dd(a: str, b: str):
        return F.sum(F.col(a).cast(d38) * F.col(b).cast(d38)).cast(d38)

    s = pop.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        dd("x1", "x1").alias("s11"),
        dd("x1", "x2").alias("s12"),
        dd("x2", "x2").alias("s22"),
        dd("x1", "y").alias("s1y"),
        dd("x2", "y").alias("s2y"),
    )
    nd = F.col("n").cast("double")
    sx1 = F.col("sx1").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy = F.col("sy").cast("double")
    lam = F.lit(1000.0)
    a11 = F.expr(wide_dbl("s11")) - sx1 * sx1 / nd + lam
    a12 = F.expr(wide_dbl("s12")) - sx1 * sx2 / nd
    a22 = F.expr(wide_dbl("s22")) - sx2 * sx2 / nd + lam
    b1 = F.expr(wide_dbl("s1y")) - sx1 * sy / nd
    b2 = F.expr(wide_dbl("s2y")) - sx2 * sy / nd
    det = a11 * a22 - a12 * a12
    beta1 = (b1 * a22 - b2 * a12) / det
    beta2 = (b2 * a11 - b1 * a12) / det
    m1 = sx1 / nd
    m2 = sx2 / nd
    my = sy / nd
    return s.select(
        "n",
        beta1.alias("beta1"),
        beta2.alias("beta2"),
        (my - beta1 * m1 - beta2 * m2).alias("intercept"),
    )


@register(
    "ml_cross_val_folds",
    oracle="""
    WITH pop AS (
        SELECT CAST(('0x' || substr(md5('cv:' || CAST(o_orderkey AS VARCHAR)),
                    1, 15)) AS BIGINT) % 5 AS fold,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    per_fold AS (
        SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_f,
               CAST(SUM(y) AS BIGINT) AS s_f,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                    AS DECIMAL(38,0)) AS q_f
        FROM pop GROUP BY fold
    ),
    tot AS (
        SELECT CAST(SUM(n_f) AS BIGINT) AS n,
               CAST(SUM(s_f) AS BIGINT) AS s,
               CAST(SUM(q_f) AS DECIMAL(38,0)) AS q
        FROM per_fold
    )
    SELECT CAST(p.fold AS INT) AS fold, p.n_f,
           (CAST(t.s AS DOUBLE) - CAST(p.s_f AS DOUBLE))
           / (CAST(t.n AS DOUBLE) - CAST(p.n_f AS DOUBLE)) / 100.0
               AS train_mean_usd,
           sqrt((CAST(p.q_f AS DOUBLE)
                 - 2.0 * ((CAST(t.s AS DOUBLE) - CAST(p.s_f AS DOUBLE))
                          / (CAST(t.n AS DOUBLE) - CAST(p.n_f AS DOUBLE)))
                   * CAST(p.s_f AS DOUBLE)
                 + CAST(p.n_f AS DOUBLE)
                   * ((CAST(t.s AS DOUBLE) - CAST(p.s_f AS DOUBLE))
                      / (CAST(t.n AS DOUBLE) - CAST(p.n_f AS DOUBLE)))
                   * ((CAST(t.s AS DOUBLE) - CAST(p.s_f AS DOUBLE))
                      / (CAST(t.n AS DOUBLE) - CAST(p.n_f AS DOUBLE))))
                / CAST(p.n_f AS DOUBLE)) / 100.0 AS rmse_usd
    FROM per_fold p CROSS JOIN tot t
    """,
)
def ml_cross_val_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation harness with a train-mean baseline
    model: folds assigned by portable 60-bit md5 hash (stable across
    engines, runs, and partitionings — NEVER rand()), each fold
    scored by the mean of the OTHER four folds. Train statistics are
    derived by subtraction (total - fold) so one aggregation pass
    serves all five folds — no per-fold scan. Fold RMSE expands as
    sqrt((q - 2mS + n m^2)/n): exact integer/decimal sums in, fixed
    double chain out, bit-portable. The harness shape (hash-fold +
    sufficient statistics + leave-fold-out by subtraction) carries
    unchanged to any linear model at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    pop = orders.select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cv:"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).cast("int").alias("fold"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    d38 = "decimal(38,0)"
    per_fold = pop.groupBy("fold").agg(
        F.count("*").alias("n_f"),
        F.sum("y").alias("s_f"),
        F.sum(F.col("y").cast(d38) * F.col("y").cast(d38))
        .cast(d38)
        .alias("q_f"),
    )
    tot = per_fold.agg(
        F.sum("n_f").alias("n"),
        F.sum("s_f").alias("s"),
        F.sum("q_f").cast(d38).alias("q"),
    )
    j = per_fold.crossJoin(F.broadcast(tot))
    m = (F.col("s").cast("double") - F.col("s_f").cast("double")) / (
        F.col("n").cast("double") - F.col("n_f").cast("double")
    )
    sse = (
        F.col("q_f").cast("double")
        - F.lit(2.0) * m * F.col("s_f").cast("double")
        + F.col("n_f").cast("double") * m * m
    )
    return j.select(
        "fold",
        "n_f",
        (m / F.lit(100.0)).alias("train_mean_usd"),
        (F.sqrt(sse / F.col("n_f").cast("double")) / F.lit(100.0)).alias(
            "rmse_usd"
        ),
    )


@register(
    "ml_feature_gini",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
               CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END AS f_smallqty,
               CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS f_bigdisc,
               CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END AS f_hightax
        FROM lineitem
    ),
    feats AS (
        SELECT 'f_smallqty' AS feature, f_smallqty AS f, label FROM pop
        UNION ALL
        SELECT 'f_bigdisc', f_bigdisc, label FROM pop
        UNION ALL
        SELECT 'f_hightax', f_hightax, label FROM pop
    ),
    cells AS (
        SELECT feature, f,
               CAST(COUNT(*) AS BIGINT) AS n_c,
               CAST(SUM(label) AS BIGINT) AS pos_c
        FROM feats GROUP BY feature, f
    ),
    split AS (
        SELECT feature,
               CAST(SUM(n_c) AS BIGINT) AS n,
               CAST(SUM(pos_c) AS BIGINT) AS pos,
               SUM(2.0 * CAST(pos_c AS DOUBLE)
                   * (CAST(n_c AS DOUBLE) - CAST(pos_c AS DOUBLE))
                   / CAST(n_c AS DOUBLE)) AS weighted_child_gini_n
        FROM cells GROUP BY feature
    )
    SELECT feature, n, pos,
           2.0 * CAST(pos AS DOUBLE)
           * (CAST(n AS DOUBLE) - CAST(pos AS DOUBLE)) / CAST(n AS DOUBLE)
           / CAST(n AS DOUBLE) AS parent_gini,
           (2.0 * CAST(pos AS DOUBLE)
            * (CAST(n AS DOUBLE) - CAST(pos AS DOUBLE)) / CAST(n AS DOUBLE)
            - weighted_child_gini_n) / CAST(n AS DOUBLE) AS gini_gain
    FROM split
    """,
)
def ml_feature_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-impurity feature ranking for three candidate binary
    splits against the returns label — the split-scoring kernel of
    tree learners, run feature-parallel (ml_decision_stump optimizes
    ONE feature's threshold; this ranks features against each other).
    Binary-class gini 1 - p^2 - q^2 simplifies to 2p(1-p) =
    2·pos·neg/n², so the whole score is counts + a fixed double
    chain — no entropy/ln (not portable). The 3-way feature
    replication is a projection union (3 passes over cached cells,
    one over the fact table); at 100 TB you'd widen to one pass with
    a struct-array explode, the shape already used by
    text_word_length_profile.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pop = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        F.when(F.col("l_quantity") <= 25, 1).otherwise(0).alias("f_smallqty"),
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("f_bigdisc"),
        F.when(F.col("l_tax") >= 0.04, 1).otherwise(0).alias("f_hightax"),
    )
    feats = None
    for name in ("f_smallqty", "f_bigdisc", "f_hightax"):
        part = pop.select(
            F.lit(name).alias("feature"),
            F.col(name).alias("f"),
            "label",
        )
        feats = part if feats is None else feats.unionAll(part)
    cells = feats.groupBy("feature", "f").agg(
        F.count("*").alias("n_c"), F.sum("label").alias("pos_c")
    )
    child = (
        F.lit(2.0)
        * F.col("pos_c").cast("double")
        * (F.col("n_c").cast("double") - F.col("pos_c").cast("double"))
        / F.col("n_c").cast("double")
    )
    split = cells.groupBy("feature").agg(
        F.sum("n_c").alias("n"),
        F.sum("pos_c").alias("pos"),
        F.sum(child).alias("weighted_child_gini_n"),
    )
    nd = F.col("n").cast("double")
    posd = F.col("pos").cast("double")
    parent_n = F.lit(2.0) * posd * (nd - posd) / nd
    return split.select(
        "feature",
        "n",
        "pos",
        (parent_n / nd).alias("parent_gini"),
        ((parent_n - F.col("weighted_child_gini_n")) / nd).alias("gini_gain"),
    )


@register(
    "agg_npv_monthly",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS m,
               CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END)
                    - SUM(CASE WHEN event_type = 'view'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS DOUBLE) / 100.0 AS cf
        FROM events GROUP BY 1
    ),
    series AS (SELECT list(cf ORDER BY m) AS cfs FROM monthly)
    SELECT CAST(len(cfs) AS INT) AS n_months,
           list_reduce(
               list_concat([[CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)]],
                           list_transform(cfs, v -> [v, v])),
               (acc, e) -> [acc[1] + e[1] * (acc[2] / 1.01),
                            acc[2] / 1.01]
           )[1] AS npv_usd
    FROM series
    """,
)
def agg_npv_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net present value of the monthly net cash-flow stream
    (purchase inflow minus view-serving cost) at 1%/month — discount
    factors built by RECURRENCE (df /= 1.01 each step) inside an
    ordered [npv, df] array fold, never pow() (not portable across
    engines). Each fold step is two divisions/multiply/add in fixed
    order over exact-cents-derived doubles => bit-identical NPV.
    The ordered fold also fixes the summation order — a plain SUM of
    discounted terms would be partition-order-dependent.

    Scale: fact table pays one conditional aggregation; the fold
    runs over the calendar-bounded monthly list.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0).cast(
        "bigint"
    )
    monthly = ev.groupBy(
        F.date_trunc("month", "ts").cast("date").alias("m")
    ).agg(
        (
            (
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", cents
                    ).otherwise(0)
                )
                - F.sum(
                    F.when(F.col("event_type") == "view", cents).otherwise(0)
                )
            ).cast("double")
            / F.lit(100.0)
        ).alias("cf")
    )
    series = monthly.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(m, cf))), s -> s.cf)"
        ).alias("cfs")
    )
    npv = F.expr(
        "element_at("
        " aggregate(cfs,"
        "   array(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),"
        "   (acc, v) -> array("
        "       element_at(acc, 1) + v * (element_at(acc, 2) / 1.01),"
        "       element_at(acc, 2) / 1.01)),"
        " 1)"
    )
    return series.select(
        F.size("cfs").alias("n_months"), npv.alias("npv_usd")
    )


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH pop AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    per_c AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_c
              FROM pop GROUP BY c),
    cum AS (
        SELECT c, n_c,
               SUM(n_c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum_n,
               SUM(n_c) OVER () AS n
        FROM per_c
    ),
    bounds AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum_n >= n * 5 // 100 + 1 THEN c END)
                    AS BIGINT) AS lo,
               CAST(MIN(CASE WHEN cum_n >= n * 95 // 100 THEN c END)
                    AS BIGINT) AS hi
        FROM cum
    )
    SELECT b.n, b.lo, b.hi,
           CAST(SUM(p.n_c * p.c) AS DOUBLE) / CAST(b.n AS DOUBLE) / 100.0
               AS raw_mean_usd,
           CAST(SUM(p.n_c * GREATEST(b.lo, LEAST(b.hi, p.c)))
                AS DOUBLE) / CAST(b.n AS DOUBLE) / 100.0
               AS winsorized_mean_usd
    FROM per_c p CROSS JOIN bounds b
    GROUP BY b.n, b.lo, b.hi
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorized mean of order value — the robust-mean
    estimator that clamps (not drops) the tails, so n stays constant
    and the result is defined even when 10% of the data is junk.
    Percentile bounds are DISCRETE order statistics from the
    per-cents cumulative frame (min value whose cumulative count
    crosses the cut — no interpolation, no single-partition row
    sort), clamping is integer GREATEST/LEAST, and the mean is one
    exact-int division. Everything shuffles at the distinct-cents
    grain.
    """
    pop = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
    )
    per_c = pop.groupBy("c").agg(F.count("*").alias("n_c"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per_c.select(
        "c",
        "n_c",
        F.sum("n_c").over(wcum).alias("cum_n"),
        F.sum("n_c").over(wall).alias("n"),
    )
    bounds = cum.agg(
        F.max("n").alias("n"),
        F.min(
            F.when(
                F.col("cum_n") >= F.expr("n * 5 div 100") + 1, F.col("c")
            )
        ).alias("lo"),
        F.min(
            F.when(F.col("cum_n") >= F.expr("n * 95 div 100"), F.col("c"))
        ).alias("hi"),
    )
    j = per_c.crossJoin(F.broadcast(bounds))
    clamped = F.greatest(
        F.col("lo"), F.least(F.col("hi"), F.col("c"))
    )
    out = j.groupBy("n", "lo", "hi").agg(
        (
            F.sum(F.col("n_c") * F.col("c")).cast("double")
            / F.col("n").cast("double")
            / F.lit(100.0)
        ).alias("raw_mean_usd"),
        (
            F.sum(F.col("n_c") * clamped).cast("double")
            / F.col("n").cast("double")
            / F.lit(100.0)
        ).alias("winsorized_mean_usd"),
    )
    return out.select(
        "n", "lo", "hi", "raw_mean_usd", "winsorized_mean_usd"
    )


@register(
    "stats_capability_cpk",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_events) AS BIGINT) AS s1,
               CAST(SUM(n_events * n_events) AS BIGINT) AS s2
        FROM daily
    )
    SELECT k,
           CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS mu,
           sqrt((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
               / CAST(k AS DOUBLE) AS sigma,
           (0.15 * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)))
           / (3.0 * (sqrt((CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
                     / CAST(k AS DOUBLE))) AS cpk
    FROM s
    """,
)
def stats_capability_cpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-capability index Cpk for the daily event-volume
    "process" against relative spec limits at ±15% of the
    centerline (absolute limits would not survive a scale factor
    change; relative ones make the index comparable across SFs).
    Cpk = nearest-spec margin / 3sigma, from exact integer moments
    and the fixed div/sqrt chain — the pairing op to ts_spc_rules:
    SPC says "is it in control", Cpk says "is control good enough".
    One aggregation; O(1) scalar math.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n_events"))
    s = daily.agg(
        F.count("*").alias("k"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    kd = F.col("k").cast("double")
    mu = F.col("s1").cast("double") / kd
    sigma = (
        F.sqrt(
            kd * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / kd
    )
    return s.select(
        "k",
        mu.alias("mu"),
        sigma.alias("sigma"),
        ((F.lit(0.15) * mu) / (F.lit(3.0) * sigma)).alias("cpk"),
    )


@register(
    "sample_weighted_det",
    oracle="""
    WITH pop AS (
        SELECT event_id, event_type,
               CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT) AS cents
        FROM events WHERE COALESCE(value, 0) > 0
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM pop),
    kept AS (
        SELECT p.event_type, p.cents
        FROM pop p CROSS JOIN tot t
        WHERE CAST(('0x' || substr(md5('ws:' || CAST(p.event_id AS VARCHAR)),
                    1, 15)) AS BIGINT)
              * CAST(t.total_cents AS DECIMAL(38,0))
              < CAST(1000 AS DECIMAL(38,0)) * CAST(p.cents AS DECIMAL(38,0))
                * CAST(1152921504606846976 AS DECIMAL(38,0))
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) AS BIGINT) AS kept_cents
    FROM kept GROUP BY event_type
    """,
)
def sample_weighted_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling
    (expected 1000 rows, P(keep) ∝ value): keep iff
    hash60(id)/2^60 < 1000·w/W, evaluated as a DECIMAL(38)
    cross-multiplication — no division, no floats, no rand().
    Reproducible across engines, retries, and partitionings (the
    three ways rand() burns you), and the high-value rows a revenue
    sample must not miss are kept with certainty once
    1000·w ≥ W·2^60/2^60. One broadcast total + a map-side filter.
    """
    pop = load_table(spark, sf_dir, "events").where(
        F.coalesce(F.col("value"), F.lit(0.0)) > 0
    ).select(
        "event_id",
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    tot = pop.agg(F.sum("cents").alias("total_cents"))
    d38 = "decimal(38,0)"
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ws:"), F.col("event_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    kept = pop.crossJoin(F.broadcast(tot)).where(
        h60.cast(d38) * F.col("total_cents").cast(d38)
        < F.lit(1000).cast(d38)
        * F.col("cents").cast(d38)
        * F.lit(1152921504606846976).cast(d38)
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.sum("cents").alias("kept_cents"),
    )


@register(
    "stats_cochran_armitage",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN l_quantity <= 15 THEN 0
                    WHEN l_quantity <= 30 THEN 1
                    WHEN l_quantity <= 45 THEN 2
                    ELSE 3 END AS dose,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    g AS (
        SELECT dose, CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(y) AS BIGINT) AS r_i
        FROM pop GROUP BY dose
    ),
    tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n, CAST(SUM(r_i) AS BIGINT) AS r,
               CAST(SUM(n_i * dose) AS BIGINT) AS snw,
               CAST(SUM(n_i * dose * dose) AS BIGINT) AS snw2,
               CAST(SUM(r_i * dose) AS BIGINT) AS srw
        FROM g
    )
    SELECT n, r,
           (CAST(srw AS DOUBLE) - CAST(r AS DOUBLE) * CAST(snw AS DOUBLE)
                / CAST(n AS DOUBLE))
           / sqrt((CAST(r AS DOUBLE) * (CAST(n AS DOUBLE)
                   - CAST(r AS DOUBLE)) / CAST(n AS DOUBLE))
                  * (CAST(snw2 AS DOUBLE) - CAST(snw AS DOUBLE)
                     * CAST(snw AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(n AS DOUBLE)) AS z_trend
    FROM tot
    """,
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does return probability increase
    MONOTONICALLY across ordered quantity bands? One degree of
    freedom aimed at the ordering — far more powerful than the
    omnibus chi-square (stats_chi2_gof) when the alternative is a
    dose-response trend. Integer dose weights keep every sufficient
    statistic int64-exact; z is the standard fixed chain. One
    4-cell aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pop = li.select(
        F.when(F.col("l_quantity") <= 15, 0)
        .when(F.col("l_quantity") <= 30, 1)
        .when(F.col("l_quantity") <= 45, 2)
        .otherwise(3)
        .alias("dose"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    g = pop.groupBy("dose").agg(
        F.count("*").alias("n_i"), F.sum("y").alias("r_i")
    )
    tot = g.agg(
        F.sum("n_i").alias("n"),
        F.sum("r_i").alias("r"),
        F.sum(F.col("n_i") * F.col("dose")).alias("snw"),
        F.sum(F.col("n_i") * F.col("dose") * F.col("dose")).alias("snw2"),
        F.sum(F.col("r_i") * F.col("dose")).alias("srw"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    snw = F.col("snw").cast("double")
    z = (F.col("srw").cast("double") - rd * snw / nd) / F.sqrt(
        (rd * (nd - rd) / nd)
        * (F.col("snw2").cast("double") - snw * snw / nd)
        / nd
    )
    return tot.select("n", "r", z.alias("z_trend"))


@register(
    "ml_one_rule",
    oracle="""
    WITH base AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(month(o_orderdate) AS VARCHAR) AS mth,
               CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         > 15000000 THEN 1 ELSE 0 END AS hi
        FROM orders
    ),
    melted AS (
        SELECT 'status' AS feature, o_orderstatus AS val, hi FROM base
        UNION ALL
        SELECT 'priority' AS feature, o_orderpriority AS val, hi FROM base
        UNION ALL
        SELECT 'month' AS feature, mth AS val, hi FROM base
    ),
    cells AS (
        SELECT feature, val, hi, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM melted GROUP BY feature, val, hi
    ),
    per_value AS (
        SELECT feature, val,
               CAST(MAX(cnt) AS BIGINT) AS correct,
               CAST(SUM(cnt) AS BIGINT) AS total
        FROM cells GROUP BY feature, val
    ),
    per_feature AS (
        SELECT feature,
               CAST(SUM(correct) AS BIGINT) AS n_correct,
               CAST(SUM(total) AS BIGINT) AS n_total
        FROM per_value GROUP BY feature
    )
    SELECT feature, n_correct, n_total,
           CAST((n_total - n_correct) * 1000000 // n_total AS BIGINT)
               AS error_ppm,
           CAST(ROW_NUMBER() OVER (
               ORDER BY (n_total - n_correct) * 1000000 // n_total,
                        feature) AS BIGINT) AS rnk
    FROM per_feature
    """,
)
def ml_one_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OneR baseline classifier (Holte 1993): for each candidate
    categorical feature (order status, priority, order month) predict
    the high-value label (> $150k) by the per-value majority class;
    the feature with the lowest total error wins. The majority-class
    correct count per value is just MAX(cnt) over the (feature,
    value, label) cells, so the whole model fit is two integer
    aggregations and an error ppm floor-division — the sanity
    baseline every fancier model (ml_decision_stump, ml_naive_bayes)
    must beat.

    Scale: one melt projection (3x fan-out) + two partial-agg
    shuffles over bounded-cardinality cells.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderstatus",
        "o_orderpriority",
        F.month("o_orderdate").cast("string").alias("mth"),
        F.when(
            F.round(F.col("o_totalprice") * 100).cast("long") > 15000000, 1
        )
        .otherwise(0)
        .alias("hi"),
    )
    melted = base.selectExpr(
        "stack(3, 'status', o_orderstatus, 'priority', o_orderpriority,"
        " 'month', mth) AS (feature, val)",
        "hi",
    )
    cells = melted.groupBy("feature", "val", "hi").agg(
        F.count("*").alias("cnt")
    )
    per_value = cells.groupBy("feature", "val").agg(
        F.max("cnt").alias("correct"), F.sum("cnt").alias("total")
    )
    per_feature = per_value.groupBy("feature").agg(
        F.sum("correct").alias("n_correct"),
        F.sum("total").alias("n_total"),
    )
    err = F.expr("(n_total - n_correct) * 1000000 div n_total")
    return per_feature.select(
        "feature",
        "n_correct",
        "n_total",
        err.cast("long").alias("error_ppm"),
        F.row_number()
        .over(Window.orderBy(err, "feature"))
        .cast("long")
        .alias("rnk"),
    )


@register(
    "stats_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                    AS BIGINT) AS di,
               CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT))
                    // 100 AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    slopes AS (
        SELECT a.di AS di_a, b.di AS di_b,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.di - a.di AS DOUBLE)
                   AS slope
        FROM daily a JOIN daily b ON b.di > a.di
    ),
    ranked AS (
        SELECT slope, di_a, di_b,
               CAST(row_number() OVER (ORDER BY slope, di_a, di_b)
                    AS BIGINT) AS rnk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
        FROM slopes
    )
    SELECT n_pairs, slope AS theil_sen_slope, di_a, di_b
    FROM ranked WHERE rnk = (n_pairs + 1) // 2
    """,
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator on the daily revenue series:
    the MEDIAN of all pairwise slopes (y_j−y_i)/(d_j−d_i) — immune
    to outliers that wreck least squares (ml_linreg_normal_eq's
    complement). Every slope is ONE division of exact integer-valued
    operands (daily dollars, day indexes), so each is a single
    correctly-rounded double — identical bits, identical ORDER — and
    the median is the discrete lower-median order statistic with a
    (di_a, di_b) tiebreak, never an interpolation. The fixture's
    ~30-day span gives ~435 pairs; the pair join and rank are
    calendar-bounded (documented: this estimator is O(days²) by
    definition — at scale you'd subsample days first).
    """
    daily = events_daily(spark, sf_dir).select(
        F.col("day").alias("di"),
        F.expr("CAST(COALESCE(cents, 0) div 100 AS BIGINT)").alias("y"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(b, F.col("b.di") > F.col("a.di")).select(
        F.col("a.di").alias("di_a"),
        F.col("b.di").alias("di_b"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.di") - F.col("a.di")).cast("double")
        ).alias("slope"),
    )
    ranked = slopes.select(
        "slope",
        "di_a",
        "di_b",
        F.row_number()
        .over(Window.orderBy("slope", "di_a", "di_b"))
        .cast("long")
        .alias("rnk"),
        F.count("*").over(Window.partitionBy()).alias("n_pairs"),
    )
    return ranked.where(
        F.col("rnk") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "n_pairs", F.col("slope").alias("theil_sen_slope"), "di_a", "di_b"
    )


_FISHER_SQL = """
WITH RECURSIVE flags AS (
    SELECT c_nationkey AS nk,
           CASE WHEN SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                     > 460000 * COUNT(*) THEN 1 ELSE 0 END AS fa
    FROM customer GROUP BY c_nationkey
),
tab AS (
    SELECT f.fa,
           CASE WHEN n.n_regionkey <= 2 THEN 1 ELSE 0 END AS fb
    FROM flags f JOIN nation n ON n.n_nationkey = f.nk
),
cells AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN fa = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
           CAST(SUM(CASE WHEN fb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k,
           CAST(SUM(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS a_obs
    FROM tab
),
ms AS (
    SELECT DISTINCT m FROM (
        SELECT r1 AS m FROM cells
        UNION ALL SELECT n - r1 FROM cells
        UNION ALL SELECT n FROM cells
    ) t
),
binom AS (
    SELECT m, CAST(0 AS BIGINT) AS j, CAST(1 AS BIGINT) AS v FROM ms
    UNION ALL
    SELECT m, j + 1, CAST((v * (m - j)) / (j + 1) AS BIGINT)
    FROM binom WHERE j < m
),
support AS (
    SELECT c.a_obs, c.r1, c.k, c.n, b1.j AS a2,
           b1.v * b2.v AS num
    FROM cells c
    JOIN binom b1 ON b1.m = c.r1 AND b1.j <= c.k
    JOIN binom b2 ON b2.m = c.n - c.r1 AND b2.j = c.k - b1.j
),
obs AS (
    SELECT num AS num_obs FROM support WHERE a2 = a_obs
)
SELECT MAX(s.n) AS n, MAX(s.r1) AS r1, MAX(s.k) AS k,
       MAX(s.a_obs) AS a_obs,
       CAST(MAX(o.num_obs) AS BIGINT) AS num_obs,
       CAST(SUM(CASE WHEN s.num <= o.num_obs THEN s.num ELSE 0 END)
            AS BIGINT) AS num_extreme,
       CAST(MAX(d.v) AS BIGINT) AS denom,
       CAST(SUM(CASE WHEN s.num <= o.num_obs THEN s.num ELSE 0 END)
            AS DOUBLE) / CAST(MAX(d.v) AS DOUBLE) AS p_two_sided
FROM support s
CROSS JOIN obs o
JOIN binom d ON d.m = s.n AND d.j = s.k
"""


@register("stats_fisher_exact", oracle=_FISHER_SQL)
def stats_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's EXACT test (two-sided) on a 2x2 nation-grain table —
    rich-nation (avg customer balance > $4,600) vs old-world region —
    computed with NO approximation and NO special functions: the
    hypergeometric numerators C(r1,a)·C(n−r1,k−a) are exact integers
    built by a RECURSIVE-CTE multiplicative Pascal walk (C(m,j+1) =
    C(m,j)·(m−j)/(j+1) — the intermediate product ≤ 1.3e8 makes the
    double division exact, so the walk is integer-exact on both
    engines), the two-sided tail sums numerators with num ≤ num_obs
    (an INTEGER comparison — same denominator cancels), and the only
    float op is the final division. The IDENTICAL query text runs on
    Spark 4's recursive-CTE planner and DuckDB (the sql_recursive_cte
    / stats_sign_test discipline).

    Scale: margins are bounded by the DIMENSION cardinality (25
    nations) at any fact scale, so the recursion depth and support
    size never grow; the fact work is one partial aggregation.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_FISHER_SQL)


@register(
    "ml_isotonic_calibration",
    oracle="""
    WITH labeled AS (
        SELECT o.o_orderkey,
               LEAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                     // 1000000, 49) AS bin,
               CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS y
        FROM orders o
        LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                   WHERE l_returnflag = 'R') r
          ON r.l_orderkey = o.o_orderkey
    ),
    bins AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS w,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM labeled GROUP BY bin
    ),
    pre AS (
        SELECT bin, w, pos,
               CAST(SUM(w) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cw,
               CAST(SUM(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cp
        FROM bins
    ),
    pairs AS (
        SELECT j.bin AS j, k.bin AS k,
               CAST(k.cp - j.cp + j.pos AS DOUBLE)
                   / CAST(k.cw - j.cw + j.w AS DOUBLE) AS avg_jk
        FROM pre j JOIN pre k ON j.bin <= k.bin
    ),
    step1 AS (
        SELECT i.bin AS i, p.j, MIN(p.avg_jk) AS m_ij
        FROM pre i JOIN pairs p ON p.j <= i.bin AND p.k >= i.bin
        GROUP BY i.bin, p.j
    ),
    iso AS (
        SELECT i, MAX(m_ij) AS iso_rate FROM step1 GROUP BY i
    )
    SELECT b.bin, b.w AS n_orders, b.pos AS n_returned,
           CAST(b.pos AS DOUBLE) / CAST(b.w AS DOUBLE) AS raw_rate,
           s.iso_rate
    FROM bins b JOIN iso s ON s.i = b.bin
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of return rate against order-value
    bins — the monotone-regression step of every probability
    calibrator (Zadrozny/Elkan), computed EXACTLY via the minimax
    identity iso_i = max_{j<=i} min_{k>=i} avg(y[j..k]) instead of
    the sequential pool-adjacent-violators stack (which no SQL fold
    can express): block averages come from integer prefix sums, each
    is ONE division (identical bits), and min/max are pure
    comparisons — so the fitted monotone curve is bit-identical on
    both engines. O(bins^3) triples, but bins are CAPPED at 50, so
    the cubic term is a constant 125k rows at any fact scale.

    Scale: fact work = one labeled partial agg + the distinct-return
    semi-join; everything after is 50-row dim-grain.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    labeled = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left"
    ).select(
        F.least(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 1000000"),
            F.lit(49),
        ).alias("bin"),
        F.when(F.col("l_orderkey").isNotNull(), 1).otherwise(0).alias("y"),
    )
    bins = labeled.groupBy("bin").agg(
        F.count("*").alias("w"), F.sum("y").alias("pos")
    )
    wp = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bin",
        "w",
        "pos",
        F.sum("w").over(wp).alias("cw"),
        F.sum("pos").over(wp).alias("cp"),
    )
    j = pre.alias("j")
    k = pre.alias("k")
    pairs = j.join(k, F.col("j.bin") <= F.col("k.bin")).select(
        F.col("j.bin").alias("j"),
        F.col("k.bin").alias("k"),
        (
            (F.col("k.cp") - F.col("j.cp") + F.col("j.pos")).cast("double")
            / (F.col("k.cw") - F.col("j.cw") + F.col("j.w")).cast("double")
        ).alias("avg_jk"),
    )
    i = pre.select(F.col("bin").alias("i"))
    step1 = (
        i.join(
            pairs,
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("m_ij"))
    )
    iso = step1.groupBy("i").agg(F.max("m_ij").alias("iso_rate"))
    return bins.join(iso, bins.bin == iso.i).select(
        "bin",
        F.col("w").alias("n_orders"),
        F.col("pos").alias("n_returned"),
        (F.col("pos").cast("double") / F.col("w").cast("double")).alias(
            "raw_rate"
        ),
        "iso_rate",
    )


@register(
    "agg_chain_ladder",
    oracle="""
    WITH claims AS (
        SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                   AS cohort,
               (year(l.l_shipdate) * 12 + month(l.l_shipdate))
                 - (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                   AS age,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS paid_c
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    tri AS (
        SELECT cohort, age, CAST(SUM(paid_c) AS BIGINT) AS inc
        FROM claims WHERE age BETWEEN 0 AND 5
        GROUP BY cohort, age
    ),
    cum AS (
        SELECT cohort, age,
               CAST(SUM(inc) OVER (PARTITION BY cohort ORDER BY age
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        FROM tri
    ),
    dev AS (
        SELECT a.age,
               CAST(COUNT(*) AS BIGINT) AS n_cohorts,
               CAST(SUM(a.cum_c) AS BIGINT) AS sum_cur,
               CAST(SUM(b.cum_c) AS BIGINT) AS sum_next
        FROM cum a
        JOIN cum b ON b.cohort = a.cohort AND b.age = a.age + 1
        GROUP BY a.age
    )
    SELECT age, n_cohorts, sum_cur, sum_next,
           CAST(sum_next AS DOUBLE) / CAST(sum_cur AS DOUBLE)
               AS dev_factor
    FROM dev
    """,
)
def agg_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development factors — the actuarial reserving
    primitive: build the (cohort month × development age) cumulative
    payment triangle from order/ship dates, then f_age =
    Σ cum_{age+1} / Σ cum_age over cohorts observed at both ages
    (the volume-weighted all-cohort estimator). Integer month
    arithmetic for cohort/age (no date subtraction ambiguity),
    exact cent sums, ONE division per factor — portable bits.

    Scale: one (cohort, age) partial agg over the o⋈l join; the
    triangle is bounded by calendar-months × 6 ages.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    claims = orders.join(
        li, li.l_orderkey == orders.o_orderkey
    ).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias(
            "cohort"
        ),
        (
            F.year("l_shipdate") * 12
            + F.month("l_shipdate")
            - (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        ).alias("age"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias(
            "paid_c"
        ),
    )
    tri = (
        claims.where(F.col("age").between(0, 5))
        .groupBy("cohort", "age")
        .agg(F.sum("paid_c").alias("inc"))
    )
    wc = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = tri.select(
        "cohort", "age", F.sum("inc").over(wc).alias("cum_c")
    )
    a = cum.alias("a")
    b = cum.alias("b")
    dev = (
        a.join(
            b,
            (F.col("b.cohort") == F.col("a.cohort"))
            & (F.col("b.age") == F.col("a.age") + 1),
        )
        .groupBy(F.col("a.age").alias("age"))
        .agg(
            F.count("*").alias("n_cohorts"),
            F.sum("a.cum_c").alias("sum_cur"),
            F.sum("b.cum_c").alias("sum_next"),
        )
    )
    return dev.select(
        "age",
        "n_cohorts",
        "sum_cur",
        "sum_next",
        (
            F.col("sum_next").cast("double")
            / F.col("sum_cur").cast("double")
        ).alias("dev_factor"),
    )


_BH_FDR_SQL = """
WITH RECURSIVE sample AS (
    SELECT c_nationkey AS nk,
           CASE WHEN CAST(ROUND(c_acctbal * 100) AS BIGINT) > 450000
                THEN 1 ELSE 0 END AS hit,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_custkey) AS rn
    FROM customer
),
per_nation AS (
    SELECT nk, CAST(SUM(hit) AS BIGINT) AS k
    FROM sample WHERE rn <= 20 GROUP BY nk
),
binom AS (
    SELECT CAST(0 AS BIGINT) AS j, CAST(1 AS BIGINT) AS v
    UNION ALL
    SELECT j + 1, CAST((v * (20 - j)) / (j + 1) AS BIGINT)
    FROM binom WHERE j < 20
),
pvals AS (
    SELECT p.nk, p.k,
           CAST(SUM(CASE WHEN b.v <= obs.v THEN b.v ELSE 0 END)
                AS BIGINT) AS p_num
    FROM per_nation p
    JOIN binom obs ON obs.j = p.k
    CROSS JOIN binom b
    GROUP BY p.nk, p.k
),
ranked AS (
    SELECT nk, k, p_num,
           CAST(row_number() OVER (ORDER BY p_num, nk) AS BIGINT) AS rnk,
           CAST(COUNT(*) OVER () AS BIGINT) AS m
    FROM pvals
),
flagged AS (
    SELECT nk, k, p_num, rnk, m,
           CASE WHEN p_num * m * 20 <= rnk * 1048576
                THEN 1 ELSE 0 END AS passes_raw
    FROM ranked
)
SELECT f.nk AS nationkey, f.k AS successes_of_20, f.p_num, f.rnk, f.m,
       CAST(f.p_num AS DOUBLE) / 1048576.0 AS p_exact,
       CASE WHEN f.rnk <= t.k_star THEN 1 ELSE 0 END AS significant_fdr05
FROM flagged f
CROSS JOIN (SELECT COALESCE(MAX(CASE WHEN passes_raw = 1 THEN rnk END),
                            0) AS k_star
            FROM flagged) t
"""


@register("stats_bh_fdr", oracle=_BH_FDR_SQL)
def stats_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction computed with ZERO floating
    point in the decision path: each nation gets an exact two-sided
    binomial sign test ("do the first 20 customers' balances sit
    above $4,500 more often than a fair coin?") whose p-value is an
    exact rational num/2^20 (numerator = sum of the binomial
    coefficients at least as extreme, coefficients from the
    recursive-CTE Pascal walk of stats_fisher_exact); the BH step-up
    rule p_(k) <= k·alpha/m at alpha = 1/20 becomes the INTEGER
    comparison p_num·m·20 <= k·2^20, and the step-up cutoff k* is a
    plain MAX — so the significant/not verdict can never flip on a
    rounding. The p_exact column (one closing division) is display
    only. The IDENTICAL text runs on both engines.

    Scale: the per-nation sample is FIXED at 20 (deterministic
    custkey order), so binomials, p-values, and the BH scan are all
    dim-grain constants at any fact scale; the fact work is one
    windowed sample + partial agg.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_BH_FDR_SQL)


@register(
    "ml_conformal_interval",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y,
               o_orderkey % 4 AS fold
        FROM orders
    ),
    model AS (
        SELECT o_orderpriority,
               CAST(SUM(y) // COUNT(*) AS BIGINT) AS pred
        FROM base WHERE fold <= 1 GROUP BY o_orderpriority
    ),
    calib AS (
        SELECT abs(b.y - m.pred) AS score
        FROM base b JOIN model m USING (o_orderpriority)
        WHERE b.fold = 2
    ),
    qhat AS (
        SELECT CAST(score AS BIGINT) AS q90, n_calib FROM (
            SELECT score,
                   CAST(row_number() OVER (ORDER BY score, score)
                        AS BIGINT) AS rnk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_calib
            FROM calib
        ) WHERE rnk = ((n_calib + 1) * 9 + 9) // 10
    ),
    test AS (
        SELECT abs(b.y - m.pred) AS err
        FROM base b JOIN model m USING (o_orderpriority)
        WHERE b.fold = 3
    )
    SELECT q.n_calib, q.q90,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN t.err <= q.q90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN t.err <= q.q90 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
    FROM test t CROSS JOIN qhat q
    GROUP BY q.n_calib, q.q90
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval — the
    distribution-free uncertainty wrapper (Vovk; Angelopoulos/Bates):
    fit a per-priority mean predictor on folds 0-1, take the
    ceil(0.9(n+1))-th order statistic of absolute calibration
    residuals on fold 2 as the interval half-width q̂, and verify
    ~90% empirical coverage on held-out fold 3. Everything is exact:
    the predictor is an integer floor-mean in cents, residuals are
    exact ints, the conformal quantile is a DISCRETE order statistic
    (rank ((n+1)·9+9) div 10 = ceil without floats), and coverage is
    an integer ppm. The conformal guarantee needs exactly this
    discrete rank — interpolated quantiles would void it AND the
    cross-engine hash.

    Scale: fold splits are scan predicates; the model is a 5-row
    broadcast; the calibration rank is DISTRIBUTED via
    ``registry.global_rank`` (range-partition on score + per-partition
    window + collected offsets — no single-partition sort), and the
    total calibration count comes back from the same pass as a
    literal, so the rank-k row is selected without a COUNT() OVER ()
    global window. Ties on score are rank-order-free for the k-th
    ORDER STATISTIC (any tiebreak yields the same score value).
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
        (F.col("o_orderkey") % 4).alias("fold"),
    )
    model = (
        base.where(F.col("fold") <= 1)
        .groupBy("o_orderpriority")
        .agg(F.expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").alias("pred"))
    )
    calib = (
        base.where(F.col("fold") == 2)
        .join(F.broadcast(model), "o_orderpriority")
        .select(F.abs(F.col("y") - F.col("pred")).alias("score"))
    )
    ranked, n_calib, _ = global_rank(calib, [F.col("score")], rn_name="rnk")
    k90 = ((n_calib + 1) * 9 + 9) // 10
    qhat = ranked.where(F.col("rnk") == F.lit(k90)).select(
        F.col("score").alias("q90"), F.lit(n_calib).cast("long").alias("n_calib")
    )
    test = (
        base.where(F.col("fold") == 3)
        .join(F.broadcast(model), "o_orderpriority")
        .select(F.abs(F.col("y") - F.col("pred")).alias("err"))
    )
    return (
        test.crossJoin(F.broadcast(qhat))
        .groupBy("n_calib", "q90")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(F.col("err") <= F.col("q90"), 1).otherwise(0)
            ).alias("n_covered"),
            F.expr(
                "CAST(SUM(CASE WHEN err <= q90 THEN 1 ELSE 0 END)"
                " * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


@register(
    "stats_emd_1d",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
               CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events
        WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    cells AS (
        SELECT c,
               CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS na_c,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb_c
        FROM pop GROUP BY c
    ),
    tot AS (
        SELECT CAST(SUM(na_c) AS BIGINT) AS na,
               CAST(SUM(nb_c) AS BIGINT) AS nb
        FROM cells
    ),
    walk AS (
        SELECT c,
               CAST(SUM(na_c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_a,
               CAST(SUM(nb_c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_b,
               lead(c) OVER (ORDER BY c) - c AS gap
        FROM cells
    ),
    terms AS (
        SELECT w.c, w.gap,
               abs(w.cum_a * 1000000 // t.na
                   - w.cum_b * 1000000 // t.nb) AS cdf_diff_ppm
        FROM walk w CROSS JOIN tot t
        WHERE w.gap IS NOT NULL
    )
    SELECT t2.na, t2.nb,
           CAST(SUM(tm.cdf_diff_ppm * tm.gap) AS BIGINT)
               AS emd_ppm_cents,
           CAST(SUM(tm.cdf_diff_ppm * tm.gap) AS DOUBLE) / 1000000.0
               / 100.0 AS emd_dollars
    FROM terms tm CROSS JOIN tot t2
    GROUP BY t2.na, t2.nb
    """,
)
def stats_emd_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth mover's (Wasserstein-1) distance between the click
    and purchase value distributions: ∫|CDF_a − CDF_b| dx over the
    merged integer-cents support — the drift measure that reports
    HOW FAR the mass moved in value units (dq_drift_tvd's TVD only
    reports how much mass differs). CDFs are fixed-point integer ppm
    (cum·1e6 div N — a defined estimator, identical on both
    engines), each segment contributes |Δcdf|·gap exactly in int64
    (≤ 1e6·gap·cells, within range at any SF), and the dollar
    rendering is a fixed two-step division of the exact integer.

    Scale: one (value, side) partial agg; the prefix walk runs on
    the bounded distinct-cents frame (the stats_mannwhitney
    machinery), not on events.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    )
    pop = ev.select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias(
            "side"
        ),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    cells = pop.groupBy("c").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("na_c"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("nb_c"),
    )
    tot = cells.agg(
        F.sum("na_c").alias("na"), F.sum("nb_c").alias("nb")
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    walk = cells.select(
        "c",
        F.sum("na_c").over(w).alias("cum_a"),
        F.sum("nb_c").over(w).alias("cum_b"),
        (F.lead("c").over(Window.orderBy("c")) - F.col("c")).alias("gap"),
    )
    terms = (
        walk.crossJoin(F.broadcast(tot))
        .where(F.col("gap").isNotNull())
        .select(
            F.abs(
                F.expr("cum_a * 1000000 div na")
                - F.expr("cum_b * 1000000 div nb")
            ).alias("cdf_diff_ppm"),
            "gap",
            "na",
            "nb",
        )
    )
    return terms.groupBy("na", "nb").agg(
        F.sum(F.col("cdf_diff_ppm") * F.col("gap"))
        .cast("long")
        .alias("emd_ppm_cents"),
        (
            F.sum(F.col("cdf_diff_ppm") * F.col("gap")).cast("double")
            / F.lit(1000000.0)
            / F.lit(100.0)
        ).alias("emd_dollars"),
    )


@register(
    "agg_price_index",
    oracle="""
    WITH per_year AS (
        SELECT l_partkey, year(l_shipdate) AS yr,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
        GROUP BY l_partkey, year(l_shipdate)
    ),
    matched AS (
        SELECT b.l_partkey,
               b.p AS p0, b.q AS q0, c.p AS p1, c.q AS q1
        FROM per_year b
        JOIN per_year c ON c.l_partkey = b.l_partkey AND c.yr = 1996
        WHERE b.yr = 1995
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(p1 * q0) AS BIGINT) AS s_p1q0,
               CAST(SUM(p0 * q0) AS BIGINT) AS s_p0q0,
               CAST(SUM(p1 * q1) AS BIGINT) AS s_p1q1,
               CAST(SUM(p0 * q1) AS BIGINT) AS s_p0q1
        FROM matched
    )
    SELECT n_parts,
           CAST(s_p1q0 AS DOUBLE) / CAST(s_p0q0 AS DOUBLE) AS laspeyres,
           CAST(s_p1q1 AS DOUBLE) / CAST(s_p0q1 AS DOUBLE) AS paasche,
           sqrt((CAST(s_p1q0 AS DOUBLE) / CAST(s_p0q0 AS DOUBLE))
                * (CAST(s_p1q1 AS DOUBLE) / CAST(s_p0q1 AS DOUBLE)))
               AS fisher
    FROM sums
    """,
)
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price index trio between 1995 and 1996 over the matched part
    basket: Laspeyres Σp₁q₀/Σp₀q₀ (base-period weights), Paasche
    Σp₁q₁/Σp₀q₁ (current weights), and Fisher's ideal index — their
    geometric mean — the inflation-measurement primitives. Unit
    prices are FLOORED integer cents (ΣpriceC div Σqty — a defined
    estimator, identical both engines), the four basket sums are
    exact int64 (cents·qty ≤ 1e11 per part), and each index is one
    division; Fisher adds one multiply and one sqrt in fixed order —
    bit-portable throughout.

    Scale: one (part, year) partial agg + a part-keyed self-join;
    the index reduce is a single row.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1995, 1996)
    )
    per_year = li.groupBy(
        "l_partkey", F.year("l_shipdate").alias("yr")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
            " div SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
        ).alias("p"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    )
    b = per_year.where(F.col("yr") == 1995).select(
        "l_partkey",
        F.col("p").alias("p0"),
        F.col("q").alias("q0"),
    )
    c = per_year.where(F.col("yr") == 1996).select(
        F.col("l_partkey").alias("pk1"),
        F.col("p").alias("p1"),
        F.col("q").alias("q1"),
    )
    matched = b.join(c, b.l_partkey == c.pk1)
    sums = matched.agg(
        F.count("*").alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).alias("s_p1q0"),
        F.sum(F.col("p0") * F.col("q0")).alias("s_p0q0"),
        F.sum(F.col("p1") * F.col("q1")).alias("s_p1q1"),
        F.sum(F.col("p0") * F.col("q1")).alias("s_p0q1"),
    )
    lasp = F.col("s_p1q0").cast("double") / F.col("s_p0q0").cast("double")
    paas = F.col("s_p1q1").cast("double") / F.col("s_p0q1").cast("double")
    return sums.select(
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


@register(
    "stats_min_variance_portfolio",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000
                    AS BIGINT) AS di,
               CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) // 100 AS BIGINT) AS a,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT)
                    ELSE 0 END) // 100 AS BIGINT) AS b
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS sa,
               CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(a * a) AS BIGINT) AS saa,
               CAST(SUM(b * b) AS BIGINT) AS sbb,
               CAST(SUM(a * b) AS BIGINT) AS sab
        FROM daily
    )
    SELECT n,
           CAST(n * saa - sa * sa AS BIGINT) AS var_a_n2,
           CAST(n * sbb - sb * sb AS BIGINT) AS var_b_n2,
           CAST(n * sab - sa * sb AS BIGINT) AS cov_n2,
           CAST(n * sbb - sb * sb - (n * sab - sa * sb) AS DOUBLE)
             / CAST((n * saa - sa * sa) + (n * sbb - sb * sb)
                    - 2 * (n * sab - sa * sb) AS DOUBLE) AS w_a
    FROM m
    """,
)
def stats_min_variance_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-asset minimum-variance portfolio weight (Markowitz):
    w_a = (σ_b² − σ_ab) / (σ_a² + σ_b² − 2σ_ab) over the daily
    click/purchase revenue series. All moments are n²-scaled exact
    int64 (daily dollars ≤ 1e6, n·Σx² ≤ ~1e15 < 2^53 — the
    ts_hurst_rs budget), the n² factors cancel in the ratio, and
    w_a is ONE division of exact integers — bit-portable. The
    n²-scaled variance/covariance ride along for the risk report.

    Scale: day-grain partial agg + a 1-row reduce.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import (
        events_daily_by_type,
    )

    daily = (
        events_daily_by_type(spark, sf_dir)
        .groupBy(F.col("day").alias("di"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'click'"
                " THEN COALESCE(cents, 0) ELSE 0 END)"
                " div 100 AS BIGINT)"
            ).alias("a"),
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'purchase'"
                " THEN COALESCE(cents, 0) ELSE 0 END)"
                " div 100 AS BIGINT)"
            ).alias("b"),
        )
    )
    m = daily.agg(
        F.count("*").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    va = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    vb = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    cv = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    return m.select(
        "n",
        va.cast("long").alias("var_a_n2"),
        vb.cast("long").alias("var_b_n2"),
        cv.cast("long").alias("cov_n2"),
        ((vb - cv).cast("double") / (va + vb - 2 * cv).cast("double")).alias(
            "w_a"
        ),
    )


@register(
    "agg_trial_balance",
    oracle="""
    WITH journal AS (
        SELECT o_orderkey AS doc_id, 'AR' AS account,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS debit_c,
               CAST(0 AS BIGINT) AS credit_c
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'REVENUE',
               CAST(0 AS BIGINT),
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'CASH',
               CAST(ROUND(o_totalprice * 100) AS BIGINT),
               CAST(0 AS BIGINT)
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_orderkey, 'AR',
               CAST(0 AS BIGINT),
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT account,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(SUM(debit_c) AS BIGINT) AS debits_c,
           CAST(SUM(credit_c) AS BIGINT) AS credits_c,
           CAST(SUM(debit_c) - SUM(credit_c) AS BIGINT) AS balance_c,
           CAST((SELECT SUM(debit_c) - SUM(credit_c) FROM journal)
                AS BIGINT) AS global_imbalance_c
    FROM journal GROUP BY account
    """,
)
def agg_trial_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-entry trial balance: orders post debit-AR/credit-Revenue
    at booking and debit-Cash/credit-AR at fulfilment (status F), and
    the trial balance per account plus the global imbalance —
    REQUIRED to be zero by construction, and carried as a column so
    the ledger proves its own integrity in the same result the
    accountant reads (the dq self-validating-output discipline,
    applied to bookkeeping). Exact cents throughout.

    Scale: the journal is projection-unions over the fact scan (no
    shuffle until the account-grain aggregate); the imbalance scalar
    is a broadcast 1-row subquery.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    zero = F.lit(0).cast("long")
    j1 = orders.select(
        F.lit("AR").alias("account"), cents.alias("debit_c"),
        zero.alias("credit_c"),
    )
    j2 = orders.select(
        F.lit("REVENUE").alias("account"), zero.alias("debit_c"),
        cents.alias("credit_c"),
    )
    filled = orders.where(F.col("o_orderstatus") == "F")
    j3 = filled.select(
        F.lit("CASH").alias("account"), cents.alias("debit_c"),
        zero.alias("credit_c"),
    )
    j4 = filled.select(
        F.lit("AR").alias("account"), zero.alias("debit_c"),
        cents.alias("credit_c"),
    )
    journal = j1.unionAll(j2).unionAll(j3).unionAll(j4)
    totals = journal.agg(
        (F.sum("debit_c") - F.sum("credit_c")).alias(
            "global_imbalance_c"
        )
    )
    return (
        journal.groupBy("account")
        .agg(
            F.count("*").alias("n_postings"),
            F.sum("debit_c").alias("debits_c"),
            F.sum("credit_c").alias("credits_c"),
            (F.sum("debit_c") - F.sum("credit_c")).alias("balance_c"),
        )
        .crossJoin(F.broadcast(totals))
    )


@register(
    "agg_pvm_bridge",
    oracle="""
    WITH per_year AS (
        SELECT l_partkey, year(l_shipdate) AS yr,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS p,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
        GROUP BY l_partkey, year(l_shipdate)
    ),
    matched AS (
        SELECT b.p AS p0, b.q AS q0, c.p AS p1, c.q AS q1
        FROM per_year b
        JOIN per_year c ON c.l_partkey = b.l_partkey AND c.yr = 1996
        WHERE b.yr = 1995
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(p0 * q0) AS BIGINT) AS rev0_c,
           CAST(SUM(p1 * q1) AS BIGINT) AS rev1_c,
           CAST(SUM((p1 - p0) * q0) AS BIGINT) AS price_effect_c,
           CAST(SUM(p0 * (q1 - q0)) AS BIGINT) AS volume_effect_c,
           CAST(SUM((p1 - p0) * (q1 - q0)) AS BIGINT) AS mix_effect_c,
           CAST(SUM(p1 * q1) - SUM(p0 * q0)
                - SUM((p1 - p0) * q0) - SUM(p0 * (q1 - q0))
                - SUM((p1 - p0) * (q1 - q0)) AS BIGINT) AS residual_c
    FROM matched
    """,
)
def agg_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-Volume-Mix revenue bridge (the FP&A waterfall): the YoY
    revenue change over the matched basket decomposes EXACTLY as
    Δp·q₀ (price) + p₀·Δq (volume) + Δp·Δq (mix/cross), and the
    residual column — the decomposition identity check — is zero by
    algebra and carried in the output as its own proof. Floored-cent
    unit prices (the agg_price_index estimator), all effects exact
    int64 cents.

    Scale: one (part, year) partial agg + part-keyed self-join +
    1-row reduce.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1995, 1996)
    )
    per_year = li.groupBy(
        "l_partkey", F.year("l_shipdate").alias("yr")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
            " div SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
        ).alias("p"),
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
    )
    b = per_year.where(F.col("yr") == 1995).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    c = per_year.where(F.col("yr") == 1996).select(
        F.col("l_partkey").alias("pk1"),
        F.col("p").alias("p1"),
        F.col("q").alias("q1"),
    )
    m = b.join(c, b.l_partkey == c.pk1)
    price = F.sum((F.col("p1") - F.col("p0")) * F.col("q0"))
    volume = F.sum(F.col("p0") * (F.col("q1") - F.col("q0")))
    mix = F.sum((F.col("p1") - F.col("p0")) * (F.col("q1") - F.col("q0")))
    rev0 = F.sum(F.col("p0") * F.col("q0"))
    rev1 = F.sum(F.col("p1") * F.col("q1"))
    return m.agg(
        F.count("*").alias("n_parts"),
        rev0.alias("rev0_c"),
        rev1.alias("rev1_c"),
        price.alias("price_effect_c"),
        volume.alias("volume_effect_c"),
        mix.alias("mix_effect_c"),
        (rev1 - rev0 - price - volume - mix).alias("residual_c"),
    )


def _gbm_round_sql(r: int) -> str:
    """One unrolled boosting round: residual melt -> (feature, bin)
    cells -> exact-quotient gains -> argmax pick -> integer leaves ->
    residual update. Every stage is MATERIALIZED: default CTE
    inlining re-evaluates the whole upstream chain at each reference,
    which is exponential in rounds (the graph_kcore lesson — the
    un-materialized form ran 190s at sf0.01)."""
    return f"""
    cells{r} AS MATERIALIZED (
        SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(res) AS BIGINT) AS s
        FROM (
            SELECT 'f_cust' AS feature, f_cust AS bin, res FROM res{r}
            UNION ALL
            SELECT 'f_month', f_month, res FROM res{r}
            UNION ALL
            SELECT 'f_prio', f_prio, res FROM res{r}
        ) GROUP BY feature, bin
    ),
    gains{r} AS MATERIALIZED (
        SELECT feature,
               SUM((CAST(s AS HUGEINT) * s
                    - (CAST(s AS HUGEINT) * s) % n) // n) AS gain
        FROM cells{r} GROUP BY feature
    ),
    pick{r} AS MATERIALIZED (
        SELECT MIN(feature) AS chosen FROM gains{r}
        WHERE gain = (SELECT MAX(gain) FROM gains{r})
    ),
    leaves{r} AS MATERIALIZED (
        SELECT c.feature, c.bin, c.n,
               CAST((c.s - ((c.s % c.n) + c.n) % c.n) // c.n AS BIGINT)
                   AS leaf_c
        FROM cells{r} c JOIN pick{r} p ON c.feature = p.chosen
    ),
    res{r + 1} AS MATERIALIZED (
        SELECT r.o_orderkey, r.f_prio, r.f_month, r.f_cust,
               r.res - l.leaf_c AS res
        FROM res{r} r
        CROSS JOIN pick{r} p
        JOIN leaves{r} l
          ON l.bin = CASE p.chosen WHEN 'f_cust' THEN r.f_cust
                          WHEN 'f_month' THEN r.f_month
                          ELSE r.f_prio END
    )"""


_GBM_SQL = (
    """
    WITH base AS (
        SELECT o_orderkey,
               o_orderpriority AS f_prio,
               CAST(month(o_orderdate) AS VARCHAR) AS f_month,
               CAST(o_custkey % 8 AS VARCHAR) AS f_cust,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
        FROM orders
    ),
    f0 AS (
        SELECT CAST(SUM(y) // COUNT(*) AS BIGINT) AS f0 FROM base
    ),
    res1 AS MATERIALIZED (
        SELECT b.o_orderkey, b.f_prio, b.f_month, b.f_cust,
               b.y - f.f0 AS res
        FROM base b CROSS JOIN f0 f
    ),"""
    + ",".join(_gbm_round_sql(r) for r in (1, 2, 3))
    + """
    SELECT CAST(1 AS BIGINT) AS round, feature, bin, n, leaf_c
    FROM leaves1
    UNION ALL
    SELECT CAST(2 AS BIGINT), feature, bin, n, leaf_c FROM leaves2
    UNION ALL
    SELECT CAST(3 AS BIGINT), feature, bin, n, leaf_c FROM leaves3
    """
)


@register("ml_gbm_stumps", oracle=_GBM_SQL)
def ml_gbm_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient boosting with categorical one-level stumps, THREE
    unrolled rounds, squared loss — bit-exact on both engines with
    no floats anywhere: the base score and every leaf value are
    PORTABLE FLOOR-DIVided integer cents (residuals go negative, so
    the (s − pmod(s,n)) div n identity is load-bearing), each
    round's feature choice maximizes the exact variance-reduction
    proxy Σ_bins s²/n computed as widened EXACT quotients
    ((s² − s² % n)/n, the stats_anova_f remedy — s²/n exceeds int64
    at scale and Spark's plain decimal div would silently wrap), and
    ties break on feature name. The output IS the fitted model: per
    round, the chosen feature and its integer leaf values — so the
    hash check certifies that both engines learned the identical
    model, not merely similar predictions.

    Scale: each round is one (feature, bin) partial agg over the
    fact residuals, bounded-cell gain/argmax joins, and one
    broadcast leaf join to update residuals — three fixed dataflow
    rounds, no driver-side decisions, no windows.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("f_prio"),
        F.month("o_orderdate").cast("string").alias("f_month"),
        (F.col("o_custkey") % 8).cast("string").alias("f_cust"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    f0 = base.agg(
        F.expr(
            "CAST((SUM(y) - pmod(SUM(y), COUNT(*))) div COUNT(*)"
            " AS BIGINT)"
        ).alias("f0")
    )
    res = (
        base.crossJoin(F.broadcast(f0))
        .select(
            "o_orderkey",
            "f_prio",
            "f_month",
            "f_cust",
            (F.col("y") - F.col("f0")).alias("res"),
        )
        .localCheckpoint()
    )
    out = None
    for rnd in (1, 2, 3):
        melted = res.selectExpr(
            "stack(3, 'f_cust', f_cust, 'f_month', f_month,"
            " 'f_prio', f_prio) AS (feature, bin)",
            "res",
        )
        cells = melted.groupBy("feature", "bin").agg(
            F.count("*").alias("n"), F.sum("res").alias("s")
        )
        q = F.expr(
            "CAST((CAST(s AS DECIMAL(38,0)) * s"
            " - (CAST(s AS DECIMAL(38,0)) * s) % n) / n"
            " AS DECIMAL(38,0))"
        )
        gains = cells.groupBy("feature").agg(F.sum(q).alias("gain"))
        best_gain = gains.agg(F.max("gain").alias("mg"))
        pick = (
            gains.crossJoin(F.broadcast(best_gain))
            .where(F.col("gain") == F.col("mg"))
            .agg(F.min("feature").alias("chosen"))
        )
        leaves = (
            cells.join(F.broadcast(pick), cells.feature == F.col("chosen"))
            .select(
                "feature",
                "bin",
                "n",
                F.expr("CAST((s - pmod(s, n)) div n AS BIGINT)").alias(
                    "leaf_c"
                ),
            )
            .localCheckpoint()
        )
        row = leaves.select(
            F.lit(rnd).cast("long").alias("round"),
            "feature",
            "bin",
            "n",
            "leaf_c",
        )
        out = row if out is None else out.unionAll(row)
        upd = res.crossJoin(F.broadcast(pick)).select(
            "o_orderkey",
            "f_prio",
            "f_month",
            "f_cust",
            F.expr(
                "CASE chosen WHEN 'f_cust' THEN f_cust"
                " WHEN 'f_month' THEN f_month ELSE f_prio END"
            ).alias("bin"),
            "res",
        )
        res = (
            upd.join(F.broadcast(leaves.select("bin", "leaf_c")), "bin")
            .select(
                "o_orderkey",
                "f_prio",
                "f_month",
                "f_cust",
                (F.col("res") - F.col("leaf_c")).alias("res"),
            )
            .localCheckpoint()
        )
    return out


# ---------------------------------------------------------------------------
# Round-4 session-3 additions: classical nonparametric / categorical
# tests re-expressed as exact integer arithmetic (rank sums, count
# cross-multiplications, one final division), so every statistic is
# bit-identical across Spark and DuckDB. Generalizes the reference's
# single predicate-count metric (/root/reference/ingest_data.py:32,36)
# into a hypothesis-testing family over grouped aggregates.
# ---------------------------------------------------------------------------


@register(
    "stats_friedman",
    oracle="""
    WITH cells AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT day, event_type, n_events,
               CAST(2 * rank() OVER (PARTITION BY day ORDER BY n_events)
                    + COUNT(*) OVER (PARTITION BY day, n_events) - 1
                    AS BIGINT) AS rank2
        FROM cells
    ),
    colsums AS (
        SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2_sum,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM ranked GROUP BY event_type
    )
    SELECT CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
           CAST(COUNT(*) AS BIGINT) AS k_treatments,
           CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS sum_r2_sq,
           CAST(3 * SUM(r2_sum * r2_sum)
                - 3 * MAX(n_blocks) * MAX(n_blocks) * COUNT(*)
                  * (COUNT(*) + 1) * (COUNT(*) + 1) AS DOUBLE)
           / (MAX(n_blocks) * COUNT(*) * (COUNT(*) + 1)) AS friedman_chi2
    FROM colsums
    """,
)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (blocked k-treatment comparison): are the
    five event types loaded differently across the 30 day-blocks?
    Within each day the treatments are ranked by event count
    (tie-averaged ranks doubled into exact ints: 2·rank + ties − 1),
    per-treatment rank sums R_j accumulate as int64, and the Friedman
    chi-square 12/(nk(k+1))·ΣR_j² − 3n(k+1) is evaluated with cleared
    denominators — 3ΣR2_j² − 3n²k(k+1)² over nk(k+1) — so the only
    float op is ONE final division (correctly rounded identically on
    both engines; the untied-rank formula, documented, no tie
    correction factor).

    Scale: the day×type cell grid aggregates out of the raw events
    scan (map-side partial), ranking partitions by day (30·k cells —
    trivially parallel), and the final statistic is a k-row fold.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import (
        events_daily_by_type,
    )

    cells = events_daily_by_type(spark, sf_dir).select(
        "day", "event_type", F.col("n").alias("n_events")
    )
    wday = Window.partitionBy("day").orderBy("n_events")
    wtie = Window.partitionBy("day", "n_events")
    ranked = cells.select(
        "event_type",
        (
            2 * F.rank().over(wday) + F.count("*").over(wtie) - 1
        ).cast("long").alias("rank2"),
    )
    colsums = ranked.groupBy("event_type").agg(
        F.sum("rank2").alias("r2_sum"), F.count("*").alias("n_blocks")
    )
    return colsums.agg(
        F.max("n_blocks").cast("long").alias("n_blocks"),
        F.count("*").cast("long").alias("k_treatments"),
        F.sum(F.col("r2_sum") * F.col("r2_sum")).cast("long").alias("sum_r2_sq"),
        (
            (
                3 * F.sum(F.col("r2_sum") * F.col("r2_sum"))
                - 3
                * F.max("n_blocks")
                * F.max("n_blocks")
                * F.count("*")
                * (F.count("*") + 1)
                * (F.count("*") + 1)
            ).cast("double")
            / (F.max("n_blocks") * F.count("*") * (F.count("*") + 1))
        ).alias("friedman_chi2"),
    )


@register(
    "stats_mcnemar",
    oracle="""
    WITH pdays AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) - 19723 AS day
        FROM events WHERE event_type = 'purchase'
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    grid AS (
        SELECT u.user_id, d.day,
               CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM users u
        CROSS JOIN (SELECT unnest(range(0, 30)) AS day) d
        LEFT JOIN pdays p ON p.user_id = u.user_id AND p.day = d.day
    ),
    paired AS (
        SELECT hit AS p1,
               lead(hit) OVER (PARTITION BY user_id ORDER BY day) AS p2
        FROM grid
        QUALIFY lead(hit) OVER (PARTITION BY user_id ORDER BY day)
                IS NOT NULL
    )
    SELECT CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS both_yes,
           CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_discordant,
           CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_discordant,
           CAST(SUM(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS both_no,
           CAST((abs(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                     - SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)) - 1)
                * (abs(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                       - SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END)) - 1)
                AS DOUBLE)
           / NULLIF(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END)
                    + SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END), 0)
           AS mcnemar_chi2
    FROM paired
    """,
)
def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes at user-day grain:
    did the user purchase on day d vs day d+1?  The zero-filled
    user x day incidence grid pairs consecutive days with a lead()
    window, the 2x2 concordance table is pure counting, and the
    continuity-corrected statistic (|b-c|-1)^2/(b+c) is an integer
    square over an integer sum -- ONE final division, bit-identical
    on both engines.  Day 19723 = 2024-01-01 (the fixture's epoch
    start; the 30-day span is a fixture constant, TESTDATA.md).

    Scale: the purchase-day set is a distinct semi-join shaped
    aggregate; the grid is users x 30 (explode, not shuffle); the
    lead pairs within each user partition and the table collapses
    via map-side partial counts.
    """
    events = load_table(spark, sf_dir, "events")
    pdays = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(
                "CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400 - 19723"
            ).alias("day"),
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    users = events.select("user_id").distinct()
    grid = (
        users.select(
            "user_id", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("day")
        )
        .join(pdays, ["user_id", "day"], "left")
        .select(
            "user_id", "day", F.coalesce("hit", F.lit(0)).alias("hit")
        )
    )
    w = Window.partitionBy("user_id").orderBy("day")
    paired = (
        grid.select(
            F.col("hit").alias("p1"), F.lead("hit").over(w).alias("p2")
        )
        .where(F.col("p2").isNotNull())
    )
    b = F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 0), 1).otherwise(0))
    c = F.sum(F.when((F.col("p1") == 0) & (F.col("p2") == 1), 1).otherwise(0))
    return paired.agg(
        F.sum(F.when((F.col("p1") == 1) & (F.col("p2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("both_yes"),
        b.cast("long").alias("b_discordant"),
        c.cast("long").alias("c_discordant"),
        F.sum(F.when((F.col("p1") == 0) & (F.col("p2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("both_no"),
        (
            ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double")
            / F.nullif((b + c).cast("long"), F.lit(0))
        ).alias("mcnemar_chi2"),
    )


@register(
    "stats_mood_median",
    oracle="""
    WITH vals AS (
        SELECT l_linestatus AS grp,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    med AS (
        SELECT cents AS grand_median FROM (
            SELECT cents,
                   CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rnk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM vals
        ) WHERE rnk = (n + 1) // 2
    ),
    tab AS (
        SELECT v.grp,
               CAST(SUM(CASE WHEN v.cents > m.grand_median THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               CAST(SUM(CASE WHEN v.cents <= m.grand_median THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        FROM vals v CROSS JOIN med m
        GROUP BY v.grp
    ),
    wide AS (
        SELECT MAX(CASE WHEN grp = 'F' THEN n_above END) AS a,
               MAX(CASE WHEN grp = 'F' THEN n_below END) AS b,
               MAX(CASE WHEN grp = 'O' THEN n_above END) AS c,
               MAX(CASE WHEN grp = 'O' THEN n_below END) AS d
        FROM tab
    )
    SELECT CAST(a AS BIGINT) AS f_above, CAST(b AS BIGINT) AS f_below,
           CAST(c AS BIGINT) AS o_above, CAST(d AS BIGINT) AS o_below,
           CAST(a + b + c + d AS DOUBLE)
           * CAST(a * d - b * c AS DOUBLE)
           * CAST(a * d - b * c AS DOUBLE)
           / CAST(a + b AS DOUBLE) / CAST(c + d AS DOUBLE)
           / CAST(a + c AS DOUBLE) / CAST(b + d AS DOUBLE) AS mood_chi2
    FROM wide
    """,
)
def stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: do F- and O-status returned lineitems share
    a median price?  The grand median is a DISCRETE order statistic
    (rank (n+1) div 2 over integer cents — no interpolation, no
    floats), the 2×2 above/below table is pure counting, and the
    chi-square N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is evaluated as a
    fixed-order float chain whose every factor is an exact int64:
    ad−bc stays integer, the triple product (which would overflow
    int64 at scale) is never formed, and each int64→double factor
    conversion is ONE rounding, identical on both engines.

    Scale: the grand median uses the repo's global_rank two-pass
    (range-repartition + per-partition offsets) — NO single-partition
    window; the rest is a broadcast of one scalar into a map-side
    2×2 count.
    """
    vals = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(
            F.col("l_linestatus").alias("grp"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
    )
    ranked, n_total, _ = global_rank(
        vals.select("cents"), [F.col("cents").asc()], rn_name="rnk"
    )
    med = ranked.where(F.col("rnk") == (n_total + 1) // 2).select(
        F.col("cents").alias("grand_median")
    )
    tab = (
        vals.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum(
                F.when(F.col("cents") > F.col("grand_median"), 1).otherwise(0)
            ).alias("n_above"),
            F.sum(
                F.when(F.col("cents") <= F.col("grand_median"), 1).otherwise(0)
            ).alias("n_below"),
        )
    )
    wide = tab.agg(
        F.max(F.when(F.col("grp") == "F", F.col("n_above"))).alias("a"),
        F.max(F.when(F.col("grp") == "F", F.col("n_below"))).alias("b"),
        F.max(F.when(F.col("grp") == "O", F.col("n_above"))).alias("c"),
        F.max(F.when(F.col("grp") == "O", F.col("n_below"))).alias("d"),
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    return wide.select(
        a.cast("long").alias("f_above"),
        b.cast("long").alias("f_below"),
        c.cast("long").alias("o_above"),
        d.cast("long").alias("o_below"),
        (
            (a + b + c + d).cast("double")
            * (a * d - b * c).cast("double")
            * (a * d - b * c).cast("double")
            / (a + b).cast("double")
            / (c + d).cast("double")
            / (a + c).cast("double")
            / (b + d).cast("double")
        ).alias("mood_chi2"),
    )


@register(
    "stats_cvm_2sample",
    oracle="""
    WITH pool AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_x
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
          AND o_orderkey % 4 = 0
    ),
    ranked AS (
        SELECT is_x,
               CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS r,
               CAST(row_number() OVER (PARTITION BY is_x ORDER BY cents, o_orderkey)
                    AS BIGINT) AS i
        FROM pool
    ),
    sums AS (
        SELECT CAST(SUM(CASE WHEN is_x = 1 THEN (r - i) * (r - i) END)
                    AS DECIMAL(38,0)) AS sx,
               CAST(SUM(CASE WHEN is_x = 0 THEN (r - i) * (r - i) END)
                    AS DECIMAL(38,0)) AS sy,
               CAST(SUM(is_x) AS BIGINT) AS n,
               CAST(SUM(1 - is_x) AS BIGINT) AS m
        FROM ranked
    )
    SELECT n, m,
           (CAST(CAST((sx - sx % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((sx % 1000000000000000000 - sx % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(sx % 1000000000 AS BIGINT) AS DOUBLE)) / CAST(m * (n + m) AS DOUBLE) / CAST(n AS DOUBLE)
           + (CAST(CAST((sy - sy % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((sy % 1000000000000000000 - sy % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(sy % 1000000000 AS BIGINT) AS DOUBLE)) / CAST(n * (n + m) AS DOUBLE) / CAST(m AS DOUBLE)
           - CAST(4 * m * n - 1 AS DOUBLE) / CAST(6 * (m + n) AS DOUBLE)
               AS cvm_t
    FROM sums
    """,
)
def stats_cvm_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises criterion (Anderson's U form):
    T = U/(nm(n+m)) − (4mn−1)/(6(m+n)) with
    U = n·Σ(r_i−i)² + m·Σ(s_j−j)², comparing URGENT vs LOW order
    price distributions.  Ranks are tie-broken deterministically by
    (cents, orderkey) — documented variant — so r, i are exact ints,
    the statistic is a fixed-order chain of single
    divisions and one subtraction: each op correctly rounded
    identically on both engines ⇒ bit-equal doubles.

    Scale: the global rank r AND the per-sample rank i both come out
    of ONE distributed ``registry.global_rank`` pass (range-partition
    on (cents, o_orderkey), per-partition window + collected offsets —
    no single-partition sort): i for an URGENT row is the running sum
    of is_x over the same total order, and for a LOW row it is
    r − cum_is_x.  Everything downstream is a one-row fold.  The
    Σ(r−i)² sums ride in DECIMAL(38,0) (exact, order-insensitive,
    immune to the ~N³ growth of U), the scale-0 decimal→double render
    is a single rounding on both engines, and T splits into
    sx/(m(n+m))/n + sy/(n(n+m))/m so no 2^53-crossing integer
    PRODUCT is ever cast to double (a %4 orderkey fold additionally
    bounds the pool).
    """
    pool = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
            & (F.col("o_orderkey") % 4 == 0)
        )
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("is_x"),
        )
    )
    granked, _, _ = global_rank(
        pool,
        [F.col("cents"), F.col("o_orderkey")],
        sum_cols=("is_x",),
        rn_name="r",
    )
    ranked = granked.select(
        "is_x",
        "r",
        F.when(F.col("is_x") == 1, F.col("cum_is_x"))
        .otherwise(F.col("r") - F.col("cum_is_x"))
        .alias("i"),
    )
    d2 = (
        (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    ).cast("decimal(38,0)")
    sums = ranked.agg(
        F.sum(F.when(F.col("is_x") == 1, d2))
        .cast("decimal(38,0)")
        .alias("sx"),
        F.sum(F.when(F.col("is_x") == 0, d2))
        .cast("decimal(38,0)")
        .alias("sy"),
        F.sum("is_x").alias("n"),
        F.sum(1 - F.col("is_x")).alias("m"),
    )
    n, m, sx, sy = F.col("n"), F.col("m"), F.col("sx"), F.col("sy")
    return sums.select(
        n.cast("long").alias("n"),
        m.cast("long").alias("m"),
        (
            F.expr(wide_dbl("sx")) / (m * (n + m)).cast("double") / n.cast("double")
            + F.expr(wide_dbl("sy")) / (n * (n + m)).cast("double") / m.cast("double")
            - (4 * m * n - 1).cast("double") / (6 * (m + n)).cast("double")
        ).alias("cvm_t"),
    )


@register(
    "stats_cochran_q",
    oracle="""
    WITH types AS (
        SELECT * FROM (VALUES ('click'), ('view'), ('purchase'),
                              ('signup'), ('error')) t(event_type)
    ),
    users AS (
        SELECT user_id FROM events GROUP BY user_id
        HAVING COUNT(*) >= 40
    ),
    cell AS (
        SELECT u.user_id, t.event_type,
               CASE WHEN e.user_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM users u
        CROSS JOIN types t
        LEFT JOIN (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE CAST(epoch_us(ts) // 86400000000 AS BIGINT) - 19723 < 7
        ) e ON e.user_id = u.user_id AND e.event_type = t.event_type
    ),
    rows_tot AS (
        SELECT user_id, CAST(SUM(hit) AS BIGINT) AS ri
        FROM cell GROUP BY user_id
    ),
    cols_tot AS (
        SELECT event_type, CAST(SUM(hit) AS BIGINT) AS cj
        FROM cell GROUP BY event_type
    ),
    parts AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cols_tot) AS k,
               (SELECT CAST(SUM(cj) AS BIGINT) FROM cols_tot) AS big_n,
               (SELECT CAST(SUM(cj * cj) AS BIGINT) FROM cols_tot) AS sum_cj_sq,
               (SELECT CAST(SUM(ri) AS BIGINT) FROM rows_tot) AS sum_ri,
               (SELECT CAST(SUM(ri * ri) AS BIGINT) FROM rows_tot) AS sum_ri_sq,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_tot) AS n_blocks
    )
    SELECT n_blocks, k, big_n, sum_cj_sq, sum_ri_sq,
           CAST((k - 1) * (k * sum_cj_sq - big_n * big_n) AS DOUBLE)
           / NULLIF(k * sum_ri - sum_ri_sq, 0) AS cochran_q
    FROM parts
    """,
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q — the k-treatment generalization of McNemar: for
    each heavy user (≥40 events), did they touch each of the five
    event types during week 1?  Q = (k−1)(kΣC_j² − N²)/(kΣR_i − ΣR_i²)
    is entirely int64 cross-products over row/column totals of the
    0/1 incidence grid, with ONE final division.

    Scale: the incidence grid is users × 5 — built from a distinct
    semi-join and a 5-row broadcast cross; both marginal folds are
    map-side partial sums.
    """
    events = load_table(spark, sf_dir, "events")
    users = (
        events.groupBy("user_id").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 40)
        .select("user_id")
    )
    types = spark.createDataFrame(
        [("click",), ("view",), ("purchase",), ("signup",), ("error",)],
        ["event_type"],
    )
    week1 = (
        events.where(
            F.expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400 - 19723")
            < 7
        )
        .select("user_id", "event_type")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cell = (
        users.crossJoin(F.broadcast(types))
        .join(week1, ["user_id", "event_type"], "left")
        .select(
            "user_id", "event_type", F.coalesce("hit", F.lit(0)).alias("hit")
        )
    )
    rows_tot = cell.groupBy("user_id").agg(F.sum("hit").alias("ri"))
    cols_tot = cell.groupBy("event_type").agg(F.sum("hit").alias("cj"))
    col_part = cols_tot.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("cj").cast("long").alias("big_n"),
        F.sum(F.col("cj") * F.col("cj")).cast("long").alias("sum_cj_sq"),
    )
    row_part = rows_tot.agg(
        F.sum("ri").cast("long").alias("sum_ri"),
        F.sum(F.col("ri") * F.col("ri")).cast("long").alias("sum_ri_sq"),
        F.count("*").cast("long").alias("n_blocks"),
    )
    parts = col_part.crossJoin(row_part)
    k, cj2 = F.col("k"), F.col("sum_cj_sq")
    bn, sri, sri2 = F.col("big_n"), F.col("sum_ri"), F.col("sum_ri_sq")
    return parts.select(
        "n_blocks",
        "k",
        "big_n",
        "sum_cj_sq",
        "sum_ri_sq",
        (
            ((k - 1) * (k * cj2 - bn * bn)).cast("double")
            / F.nullif((k * sri - sri2).cast("long"), F.lit(0))
        ).alias("cochran_q"),
    )


@register(
    "stats_page_trend",
    oracle="""
    WITH cells AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) - 19723 AS day,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 24 // 6 AS slot,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT day, slot + 1 AS treat_order,
               CAST(2 * rank() OVER (PARTITION BY day ORDER BY n_events)
                    + COUNT(*) OVER (PARTITION BY day, n_events) - 1
                    AS BIGINT) AS rank2
        FROM cells
    ),
    colsums AS (
        SELECT treat_order, CAST(SUM(rank2) AS BIGINT) AS r2_sum
        FROM ranked GROUP BY treat_order
    ),
    lstat AS (
        SELECT CAST(SUM(treat_order * r2_sum) AS BIGINT) AS l2,
               CAST(COUNT(*) AS BIGINT) AS k,
               (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) FROM cells) AS n
        FROM colsums
    )
    SELECT n, k, l2,
           CAST(2 * l2 - n * k * (k + 1) * (k + 1) AS BIGINT) AS z_num4,
           CAST(2 * l2 - n * k * (k + 1) * (k + 1) AS DOUBLE)
           * 3 / sqrt(CAST(n * k * k * (k + 1) * (k * k - 1) AS DOUBLE))
           AS page_z
    FROM lstat
    """,
)
def stats_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's trend test for ordered alternatives: is event volume
    monotonically ordered across the four 6-hour slots of the day,
    blocked by the 30 days?  L = Σ j·R_j over doubled tie-averaged
    ranks (exact int), and the z-score clears its rational moments:
    z = 3·(2L₂ − nk(k+1)²)/sqrt(nk²(k+1)(k²−1)) — one int64→double
    cast each side of ONE sqrt and ONE division in fixed order,
    bit-identical across engines (untied-variance form, documented).

    Scale: day×slot cells fold out of the scan; ranking partitions by
    day; the statistic is a 4-row fold.
    """
    events = load_table(spark, sf_dir, "events")
    cells = (
        events.select(
            F.expr(
                "CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400 - 19723"
            ).alias("day"),
            F.expr(
                "(CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 3600) % 24 div 6"
            ).alias("slot"),
        )
        .groupBy("day", "slot")
        .agg(F.count("*").alias("n_events"))
    )
    wday = Window.partitionBy("day").orderBy("n_events")
    wtie = Window.partitionBy("day", "n_events")
    ranked = cells.select(
        "day",
        (F.col("slot") + 1).alias("treat_order"),
        (2 * F.rank().over(wday) + F.count("*").over(wtie) - 1)
        .cast("long")
        .alias("rank2"),
    )
    colsums = ranked.groupBy("treat_order").agg(F.sum("rank2").alias("r2_sum"))
    n_days = cells.select("day").distinct().count()
    lstat = colsums.agg(
        F.sum(F.col("treat_order") * F.col("r2_sum")).cast("long").alias("l2"),
        F.count("*").cast("long").alias("k"),
        F.lit(n_days).cast("long").alias("n"),
    )
    n, k, l2 = F.col("n"), F.col("k"), F.col("l2")
    return lstat.select(
        "n",
        "k",
        "l2",
        (2 * l2 - n * k * (k + 1) * (k + 1)).cast("long").alias("z_num4"),
        (
            (2 * l2 - n * k * (k + 1) * (k + 1)).cast("double")
            * 3
            / F.sqrt((n * k * k * (k + 1) * (k * k - 1)).cast("double"))
        ).alias("page_z"),
    )


@register(
    "stats_dixon_q",
    oracle="""
    WITH vals AS (
        SELECT c_mktsegment AS grp_key,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
    ),
    stats AS (
        SELECT grp_key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(cents) AS BIGINT) AS lo,
               CAST(MAX(cents) AS BIGINT) AS hi,
               CAST(MIN(CASE WHEN rnk_lo = 2 THEN cents END) AS BIGINT) AS lo2,
               CAST(MIN(CASE WHEN rnk_hi = 2 THEN cents END) AS BIGINT) AS hi2
        FROM (
            SELECT grp_key, cents,
                   row_number() OVER (PARTITION BY grp_key
                                      ORDER BY cents, cents) AS rnk_lo,
                   row_number() OVER (PARTITION BY grp_key
                                      ORDER BY cents DESC, cents DESC) AS rnk_hi
            FROM vals
        ) GROUP BY grp_key
    )
    SELECT grp_key, n, lo, hi,
           CAST(lo2 - lo AS DOUBLE) / NULLIF(hi - lo, 0) AS q_low,
           CAST(hi - hi2 AS DOUBLE) / NULLIF(hi - lo, 0) AS q_high,
           CASE WHEN CAST(lo2 - lo AS DOUBLE) / NULLIF(hi - lo, 0) > 0.45
                  OR CAST(hi - hi2 AS DOUBLE) / NULLIF(hi - lo, 0) > 0.45
                THEN 1 ELSE 0 END AS has_outlier
    FROM stats
    WHERE n >= 4
    ORDER BY grp_key
    """,
)
def stats_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q outlier screen per market segment over customer
    balances:
    Q_low = (x₂−x₁)/(xₙ−x₁), Q_high = (xₙ−xₙ₋₁)/(xₙ−x₁) from the
    extreme order statistics in integer cents — each Q is ONE
    division of exact ints, and the flag compares against the 0.45
    critical value with identical float comparisons on both engines.

    Scale: extremes and runners-up are min/max/conditional-min
    aggregates after a per-group rank — partial-aggregable, no global
    sort; 5 output rows at any input size.
    """
    customer = load_table(spark, sf_dir, "customer")
    vals = customer.select(
        F.col("c_mktsegment").alias("grp_key"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    w_lo = Window.partitionBy("grp_key").orderBy(F.col("cents").asc())
    w_hi = Window.partitionBy("grp_key").orderBy(F.col("cents").desc())
    ranked = vals.select(
        "grp_key",
        "cents",
        F.row_number().over(w_lo).alias("rnk_lo"),
        F.row_number().over(w_hi).alias("rnk_hi"),
    )
    stats = ranked.groupBy("grp_key").agg(
        F.count("*").cast("long").alias("n"),
        F.min("cents").cast("long").alias("lo"),
        F.max("cents").cast("long").alias("hi"),
        F.min(F.when(F.col("rnk_lo") == 2, F.col("cents")))
        .cast("long")
        .alias("lo2"),
        F.min(F.when(F.col("rnk_hi") == 2, F.col("cents")))
        .cast("long")
        .alias("hi2"),
    )
    rng = F.nullif((F.col("hi") - F.col("lo")).cast("long"), F.lit(0))
    q_low = (F.col("lo2") - F.col("lo")).cast("double") / rng
    q_high = (F.col("hi") - F.col("hi2")).cast("double") / rng
    return (
        stats.where(F.col("n") >= 4)
        .select(
            "grp_key",
            "n",
            "lo",
            "hi",
            q_low.alias("q_low"),
            q_high.alias("q_high"),
            F.when((q_low > 0.45) | (q_high > 0.45), 1)
            .otherwise(0)
            .alias("has_outlier"),
        )
        .orderBy("grp_key")
    )


# ---------------------------------------------------------------------------
# Business / operations-research calculators: tax-style marginal
# tiers, amortization, Erlang-C staffing, EOQ / newsvendor inventory
# policy, CAGR — each one re-expressed so the distributed part is a
# plain partial aggregate and the "formula" part is exact integers or
# a fixed-order float chain (portable across engines).
# ---------------------------------------------------------------------------


@register(
    "agg_tax_brackets",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    taxed AS (
        SELECT o_custkey, cents,
               CAST(5 * LEAST(GREATEST(cents - 10000000, 0), 10000000)
                    + 10 * LEAST(GREATEST(cents - 20000000, 0), 10000000)
                    + 15 * GREATEST(cents - 30000000, 0) AS BIGINT) AS fee100,
               CASE WHEN cents >= 30000000 THEN 3
                    WHEN cents >= 20000000 THEN 2
                    WHEN cents >= 10000000 THEN 1
                    ELSE 0 END AS top_bracket
        FROM spend
    )
    SELECT top_bracket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_spend_cents,
           CAST(SUM(fee100) // 100 AS BIGINT) AS total_fee_cents,
           CAST(SUM(fee100) AS DOUBLE) / NULLIF(SUM(cents), 0) AS effective_pct
    FROM taxed
    GROUP BY top_bracket
    ORDER BY top_bracket
    """,
)
def agg_tax_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive marginal-tier calculator (the tax-bracket /
    commission-schedule shape): per-customer lifetime spend runs
    through 0%/5%/10%/15% marginal brackets at 100k/200k/300k
    boundaries.  Each bracket slice is LEAST/GREATEST integer-cents
    arithmetic, the fee stays in fee×100 units so the marginal sum is
    exact int64 (div 100 only at the end), and the effective rate is
    ONE final division.

    Scale: one groupBy(custkey) partial aggregate, then per-row O(1)
    bracket math, then a 4-group fold — no shuffle beyond the two
    grouped aggregations.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    c = F.col("cents")
    fee100 = (
        5 * F.least(F.greatest(c - 10000000, F.lit(0)), F.lit(10000000))
        + 10 * F.least(F.greatest(c - 20000000, F.lit(0)), F.lit(10000000))
        + 15 * F.greatest(c - 30000000, F.lit(0))
    ).cast("long")
    taxed = spend.select(
        "cents",
        fee100.alias("fee100"),
        F.when(c >= 30000000, 3)
        .when(c >= 20000000, 2)
        .when(c >= 10000000, 1)
        .otherwise(0)
        .alias("top_bracket"),
    )
    return (
        taxed.groupBy("top_bracket")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_spend_cents"),
            F.expr("CAST(SUM(fee100) div 100 AS BIGINT)").alias(
                "total_fee_cents"
            ),
            (
                F.sum("fee100").cast("double")
                / F.nullif(F.sum("cents").cast("long"), F.lit(0))
            ).alias("effective_pct"),
        )
        .orderBy("top_bracket")
    )


_AMORT_SQL = """
WITH RECURSIVE sched(region, period, balance, pmt_cents) AS (
    SELECT region, 0, p_cents,
           p_cents * CAST('0.005' AS DOUBLE)
           * CAST('1.0616778118644983' AS DOUBLE)
           / (CAST('1.0616778118644983' AS DOUBLE) - CAST('1.0' AS DOUBLE))
    FROM (
        SELECT r.r_name AS region,
               CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   AS p_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        HAVING SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) > 0
    ) principal
    UNION ALL
    SELECT region, period + 1,
           balance * CAST('1.005' AS DOUBLE) - pmt_cents, pmt_cents
    FROM sched WHERE period < 12
)
SELECT region, CAST(period AS BIGINT) AS period,
       balance AS balance_cents,
       pmt_cents
FROM sched
ORDER BY region, period
"""


@register("agg_amortization", oracle=_AMORT_SQL)
def agg_amortization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loan amortization schedule per region (principal = the
    region's summed customer balances, 0.5%/month, 12 payments):
    pmt = P·r·q/(q−1) with q = 1.005¹² pre-evaluated to its exact
    IEEE double literal (1.0616778118644983 — both engines parse the
    same bits), then the recursive balance walk
    b_t = b_{t−1}·1.005 − pmt is a fixed-order chain of correctly-
    rounded ops ⇒ bit-identical balances on Spark and DuckDB, from
    IDENTICAL recursive-CTE text.

    Scale: principal is a partial aggregate over the dim join; the
    recursion is 12 steps over 5 region rows — depth is the loan
    term, never the data size.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_AMORT_SQL)


_ERLANG_SQL = """
WITH RECURSIVE erlang(k, b, a) AS (
    SELECT 0, CAST('1.0' AS DOUBLE), a
    FROM (
        SELECT CAST(COUNT(*) AS DOUBLE)
               / CAST(30 * 24 AS DOUBLE)
               * CAST('2.5' AS DOUBLE) AS a
        FROM events WHERE event_type = 'purchase'
    ) load_
    UNION ALL
    SELECT k + 1, a * b / (CAST(k + 1 AS DOUBLE) + a * b), a
    FROM erlang WHERE k < 12
)
SELECT k, a AS offered_load, b AS erlang_b,
       CAST(k AS DOUBLE) * b / (CAST(k AS DOUBLE) - a * (CAST('1.0' AS DOUBLE) - b))
           AS erlang_c,
       CASE WHEN CAST(k AS DOUBLE) > a
              AND CAST(k AS DOUBLE) * b
                  / (CAST(k AS DOUBLE) - a * (CAST('1.0' AS DOUBLE) - b))
                  < CAST('0.2' AS DOUBLE)
            THEN 1 ELSE 0 END AS meets_sla
FROM erlang
WHERE k >= 1
ORDER BY k
"""


@register("agg_erlang_c", oracle=_ERLANG_SQL)
def agg_erlang_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C call-center staffing table: offered load a = purchase
    arrivals/hour × 2.5h handle time, then the Erlang-B recursion
    B_k = a·B_{k−1}/(k + a·B_{k−1}) unrolled over k = 1..12 servers
    by a recursive CTE, and C_k = k·B_k/(k − a(1−B_k)) with the
    SLA flag at 20% wait probability.  Every step is a fixed-order
    chain of correctly-rounded double ops seeded from an exact count
    — bit-identical across engines from IDENTICAL query text (float
    constants enter via CAST('…' AS DOUBLE) string literals so
    neither engine routes them through decimal parsing).

    Scale: the load estimate is one counting aggregate; the recursion
    is 12 scalar rows — depth is the server range, never data size.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ERLANG_SQL)


@register(
    "agg_eoq",
    oracle="""
    WITH demand AS (
        SELECT p.p_brand,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS annual_qty,
               CAST(SUM(CAST(ROUND(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents_sum,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, annual_qty, n_lines,
           sqrt(CAST(annual_qty AS DOUBLE) * CAST(n_lines AS DOUBLE)
                / CAST(price_cents_sum AS DOUBLE)
                * CAST(10000000 AS DOUBLE)) AS eoq_units,
           CAST(annual_qty * 7 // 365 AS BIGINT) AS reorder_point_units
    FROM demand
    ORDER BY p_brand
    """,
)
def agg_eoq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand: EOQ = sqrt(2DS/H) with
    D = annual demand (integer units), S = 5000.00 order cost in
    cents, and H = 10% of the brand's average unit price — the
    average clears its denominator so EOQ² = D·n/Σprice_cents·10⁷
    (2S·10 folded into the constant) is a fixed-order double chain
    over sub-2^53 int64 factors followed by ONE sqrt — portable at
    any scale where each FACTOR stays below 2^53 (the int64 product
    form overflowed the 10× smoke).  The reorder point is a
    7-day integer demand floor.

    Scale: one fact-dim broadcast join + brand-grain partial
    aggregate; ~25 output rows at any input size.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    demand = (
        lineitem.join(
            F.broadcast(part), lineitem.l_partkey == part.p_partkey
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("annual_qty"),
            F.sum(F.round(F.col("p_retailprice") * 100).cast("long")).alias(
                "price_cents_sum"
            ),
            F.count("*").alias("n_lines"),
        )
    )
    return demand.select(
        "p_brand",
        F.col("annual_qty").cast("long").alias("annual_qty"),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.sqrt(
            F.col("annual_qty").cast("double")
            * F.col("n_lines").cast("double")
            / F.col("price_cents_sum").cast("double")
            * F.lit(10000000).cast("double")
        ).alias("eoq_units"),
        F.expr("CAST(annual_qty * 7 div 365 AS BIGINT)").alias(
            "reorder_point_units"
        ),
    ).orderBy("p_brand")


@register(
    "agg_newsvendor",
    oracle="""
    WITH daily AS (
        SELECT p.p_brand,
               CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT p_brand, qty,
               CAST(row_number() OVER (PARTITION BY p_brand
                                       ORDER BY qty, day) AS BIGINT) AS rnk,
               CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_days
        FROM daily
    )
    SELECT p_brand, n_days,
           CAST(qty AS BIGINT) AS q_star,
           CAST(rnk AS BIGINT) AS rank_used
    FROM ranked
    WHERE rnk = (n_days * 300 + 399) // 400
    ORDER BY p_brand
    """,
)
def agg_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking policy per brand: with underage cost
    cu = 300 and overage co = 100 cents the critical ratio is
    cu/(cu+co) = 3/4, and the optimal order-up-to level is the
    smallest q with F(q) ≥ 3/4 — the ceil(n·3/4)-th DISCRETE order
    statistic of the daily demand history, located by pure integer
    cross-multiplication rank = (n·300 + 399) div 400 (no float
    quantile, no interpolation).  Ties on qty are broken by day so
    the picked rank is engine-independent.

    Scale: daily demand is a (brand, day) partial aggregate; the
    per-brand rank is a bounded window (≤ 30 day rows per brand).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        lineitem.join(
            F.broadcast(part), lineitem.l_partkey == part.p_partkey
        )
        .select(
            "p_brand",
            F.expr(
                "CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("day"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("p_brand", "day")
        .agg(F.sum("q").alias("qty"))
    )
    w = Window.partitionBy("p_brand").orderBy("qty", "day")
    wn = Window.partitionBy("p_brand")
    ranked = daily.select(
        "p_brand",
        "qty",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count("*").over(wn).cast("long").alias("n_days"),
    )
    return (
        ranked.where(F.col("rnk") == F.expr("(n_days * 300 + 399) div 400"))
        .select(
            "p_brand",
            "n_days",
            F.col("qty").cast("long").alias("q_star"),
            F.col("rnk").cast("long").alias("rank_used"),
        )
        .orderBy("p_brand")
    )


@register(
    "agg_cagr",
    oracle="""
    WITH yearly AS (
        SELECT n.n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE year(o.o_orderdate) IN (1996, 2000)
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT n_name,
               CAST(MAX(CASE WHEN yr = 1996 THEN rev_cents END) AS BIGINT) AS rev0,
               CAST(MAX(CASE WHEN yr = 2000 THEN rev_cents END) AS BIGINT) AS rev4
        FROM yearly GROUP BY n_name
    )
    SELECT n_name, rev0, rev4,
           sqrt(sqrt(CAST(rev4 AS DOUBLE) / rev0)) - CAST('1.0' AS DOUBLE)
               AS cagr_4yr
    FROM wide
    WHERE rev0 IS NOT NULL AND rev4 IS NOT NULL
    ORDER BY n_name
    """,
)
def agg_cagr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-year compound annual growth rate of national revenue
    (1996→2000): CAGR = (rev4/rev0)^(1/4) − 1 evaluated as
    sqrt(sqrt(·)) — division and sqrt are both IEEE correctly-rounded
    single ops, so the whole chain is bit-identical across engines
    WITHOUT pow() (whose rounding is library-dependent).  Revenue
    endpoints are exact integer cents.

    Scale: year filter pushes to the scan, the rest is a two-key
    partial aggregate pivoted to one row per nation (25 rows).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    yearly = (
        orders.where(F.year("o_orderdate").isin(1996, 2000))
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    wide = yearly.groupBy("n_name").agg(
        F.max(F.when(F.col("yr") == 1996, F.col("rev_cents")))
        .cast("long")
        .alias("rev0"),
        F.max(F.when(F.col("yr") == 2000, F.col("rev_cents")))
        .cast("long")
        .alias("rev4"),
    )
    return (
        wide.where(F.col("rev0").isNotNull() & F.col("rev4").isNotNull())
        .select(
            "n_name",
            "rev0",
            "rev4",
            (
                F.sqrt(F.sqrt(F.col("rev4").cast("double") / F.col("rev0")))
                - 1.0
            ).alias("cagr_4yr"),
        )
        .orderBy("n_name")
    )


@register(
    "stats_ansari_bradley",
    oracle="""
    WITH pool AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_x
        FROM orders
        WHERE o_orderstatus IN ('F', 'O') AND o_orderkey % 5 = 0
    ),
    ranked AS (
        SELECT is_x,
               CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS big_n
        FROM pool
    ),
    scored AS (
        SELECT is_x,
               CAST(LEAST(r, big_n + 1 - r) AS BIGINT) AS ab_score,
               big_n
        FROM ranked
    )
    SELECT CAST(SUM(is_x) AS BIGINT) AS n,
           CAST(SUM(1 - is_x) AS BIGINT) AS m,
           CAST(SUM(CASE WHEN is_x = 1 THEN ab_score END) AS BIGINT) AS ab_sum,
           CAST(MAX(big_n) AS BIGINT) AS big_n,
           CAST(4 * MAX(big_n) * SUM(CASE WHEN is_x = 1 THEN ab_score END)
                - SUM(is_x)
                  * (CASE WHEN MAX(big_n) % 2 = 0
                          THEN MAX(big_n) * (MAX(big_n) + 2)
                          ELSE (MAX(big_n) + 1) * (MAX(big_n) + 1) END)
                AS DOUBLE)
           / CAST(4 * MAX(big_n) AS DOUBLE) AS ab_centered
    FROM scored
    """,
)
def stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley dispersion test: rank the pooled F/O order
    prices from BOTH ends (score = min(r, N+1−r), deterministically
    tie-broken by orderkey — documented variant), sum scores for the
    F sample, and report the statistic centered at its null mean —
    n(N+2)/4 for even N, n(N+1)²/(4N) for odd — with BOTH branches
    lifted to the common denominator 4N so everything is int64 until
    ONE closing division.  Exact
    int64 throughout (scores are ≤ N/2+1; the sum is O(N²) ≈ 2^53-
    safe at the 100× smoke thanks to the %5 fold).

    Scale: one global rank (global_rank-distributable), then a pure
    counting fold.
    """
    pool = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderstatus").isin("F", "O")
            & (F.col("o_orderkey") % 5 == 0)
        )
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_x"),
        )
    )
    from e2e_data_pipeline_spark.operators.registry import global_rank

    ranked, big_n, _ = global_rank(
        pool, [F.col("cents").asc(), F.col("o_orderkey").asc()], rn_name="r"
    )
    scored = ranked.select(
        "is_x",
        F.least(F.col("r"), F.lit(big_n) + 1 - F.col("r"))
        .cast("long")
        .alias("ab_score"),
        F.lit(big_n).cast("long").alias("big_n"),
    )
    absum = F.sum(F.when(F.col("is_x") == 1, F.col("ab_score")))
    n = F.sum("is_x")
    bn = F.max("big_n")
    return scored.agg(
        n.cast("long").alias("n"),
        F.sum(1 - F.col("is_x")).cast("long").alias("m"),
        absum.cast("long").alias("ab_sum"),
        bn.cast("long").alias("big_n"),
        (
            (
                4 * bn * absum
                - n
                * F.when(bn % 2 == 0, bn * (bn + 2)).otherwise(
                    (bn + 1) * (bn + 1)
                )
            ).cast("double")
            / (4 * bn).cast("double")
        ).alias("ab_centered"),
    )


@register(
    "ml_eval_pr_auc",
    oracle="""
    WITH pop AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
               CAST(ROUND(value * 100) AS BIGINT) AS score_cents,
               event_id
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    ranked AS (
        SELECT label,
               CAST(row_number() OVER (ORDER BY score_cents DESC, event_id)
                    AS BIGINT) AS k,
               CAST(SUM(label) OVER (ORDER BY score_cents DESC, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS tp_k
        FROM pop
    ),
    terms AS (
        SELECT CAST(SUM(CASE WHEN label = 1
                             THEN tp_k * 1000000 // k END) AS BIGINT)
                   AS ap_num_ppm,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM ranked
    )
    SELECT n_pos, n_total,
           CAST(ap_num_ppm // n_pos AS BIGINT) AS avg_precision_ppm,
           CAST(n_pos * 1000000 // n_total AS BIGINT) AS baseline_ppm
    FROM terms
    """,
)
def ml_eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the PR-AUC estimator rankers report):
    AP = (1/P)·Σ_{k: rel} precision@k over the deterministically
    tie-broken score ranking, held in fixed-point ppm integers —
    floor(tp_k·10⁶/k) per relevant hit, floor-averaged at the end —
    so the result is exact int64 on both engines (documented
    fixed-point variant; ml_eval_rank_metrics holds the exact-lcm
    small-k family, this op covers full-corpus AP).  The random
    baseline P/N rides along for lift context.

    Scale: the global ordering runs on the distributed global_rank
    two-pass (range layout + per-partition offsets feed both the rank
    and the inclusive true-positive prefix sum) — no single-partition
    window — then a counting fold.
    """
    pop = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .select(
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("label"),
            F.round(F.col("value") * 100).cast("long").alias("score_cents"),
            "event_id",
        )
    )
    ranked = global_rank(
        pop,
        [F.col("score_cents").desc(), F.col("event_id").asc()],
        sum_cols=("label",),
        rn_name="k",
    )[0].withColumnRenamed("cum_label", "tp_k")
    terms = ranked.agg(
        F.sum(
            F.when(F.col("label") == 1, F.expr("tp_k * 1000000 div k"))
        )
        .cast("long")
        .alias("ap_num_ppm"),
        F.sum("label").cast("long").alias("n_pos"),
        F.count("*").cast("long").alias("n_total"),
    )
    return terms.select(
        "n_pos",
        "n_total",
        F.expr("CAST(ap_num_ppm div n_pos AS BIGINT)").alias(
            "avg_precision_ppm"
        ),
        F.expr("CAST(n_pos * 1000000 div n_total AS BIGINT)").alias(
            "baseline_ppm"
        ),
    )


@register(
    "stats_hodges_lehmann",
    oracle="""
    WITH sides AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS is_x,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    sampled AS (
        SELECT is_x, cents
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY is_x
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
                   ) AS rnk
            FROM sides
        ) WHERE rnk <= 400
    ),
    diffs AS (
        SELECT a.cents - b.cents AS d
        FROM sampled a JOIN sampled b
          ON a.is_x = 1 AND b.is_x = 0
    ),
    ranked AS (
        SELECT d,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rnk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
        FROM diffs
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(d AS BIGINT) AS hl_shift_cents
    FROM ranked
    WHERE rnk = (n_pairs + 1) // 2
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Hodges–Lehmann shift estimator: the median of all
    pairwise differences between URGENT and LOW order prices — the
    robust location-shift companion to Mann-Whitney.  Each side is
    capped at a FIXED 400-row portable-hash bottom-K sample (md5 of
    the orderkey — same rule both engines, same rows at any scale:
    the stats_bh_fdr bounded-sample pattern), so the pair frame is a
    constant 160k rows no matter the input, and the median is the
    DISCRETE lower-median rank over exact integer differences.

    Scale: sampling is a per-side hash rank; the pair join and the
    pair-frame median are fixed-size work at any input scale.
    """
    sides = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("is_x"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
        )
    )
    ws = Window.partitionBy("is_x").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    sampled = (
        sides.withColumn("rnk", F.row_number().over(ws))
        .where(F.col("rnk") <= 400)
        .select("is_x", "cents")
    )
    a = sampled.where(F.col("is_x") == 1).select(
        F.col("cents").alias("xc")
    )
    b = sampled.where(F.col("is_x") == 0).select(
        F.col("cents").alias("yc")
    )
    diffs = a.crossJoin(b).select((F.col("xc") - F.col("yc")).alias("d"))
    ranked = diffs.select(
        "d",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("rnk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n_pairs"),
    )
    return ranked.where(F.col("rnk") == F.expr("(n_pairs + 1) div 2")).select(
        "n_pairs", F.col("d").cast("long").alias("hl_shift_cents")
    )


@register(
    "agg_break_even",
    oracle="""
    WITH brand AS (
        SELECT p.p_brand,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS units,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, units, rev_cents,
           CAST(rev_cents AS DOUBLE) / CAST(units AS DOUBLE) / 100
               AS avg_unit_price,
           CAST(units AS DOUBLE) * CAST(5000000000 AS DOUBLE)
           / (CAST(rev_cents AS DOUBLE) * 4) AS break_even_units,
           CAST(1250000000 AS DOUBLE)
           / (CAST(rev_cents AS DOUBLE) / CAST(units AS DOUBLE))
               AS payback_orders_of_margin
    FROM brand
    ORDER BY p_brand
    """,
)
def agg_break_even(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Break-even analysis per brand: with fixed costs F = $500k and
    variable cost at 60% of the average unit price, break-even units
    = F/(0.4·p̄) — the averaged price clears its denominator so the
    quantity is units·F·10/(4·Σrev) evaluated as a fixed-order double
    chain over exact int64 sums (never an int64 product that could
    overflow), plus a margin-payback companion ratio.  Single
    divisions per output column.

    Scale: one broadcast dim join + brand partial aggregate, ~25 rows.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("units"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("rev_cents"),
        )
    )
    units_d = F.col("units").cast("double")
    rev_d = F.col("rev_cents").cast("double")
    return brand.select(
        "p_brand",
        F.col("units").cast("long").alias("units"),
        F.col("rev_cents").cast("long").alias("rev_cents"),
        (rev_d / units_d / F.lit(100)).alias("avg_unit_price"),
        (
            units_d * F.lit(5000000000).cast("double")
            / (rev_d * 4)
        ).alias("break_even_units"),
        (F.lit(1250000000).cast("double") / (rev_d / units_d)).alias(
            "payback_orders_of_margin"
        ),
    ).orderBy("p_brand")


@register(
    "ml_eval_pinball",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
        FROM lineitem GROUP BY 1
    ),
    q75 AS (
        SELECT y AS q FROM (
            SELECT y,
                   CAST(row_number() OVER (ORDER BY y, d) AS BIGINT) AS rnk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM daily
        ) WHERE rnk = (n * 3 + 3) // 4
    ),
    losses AS (
        SELECT d.y, q.q,
               CAST(GREATEST(3 * (d.y - q.q), q.q - d.y) AS BIGINT) AS loss4
        FROM daily d CROSS JOIN q75 q
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(q) AS BIGINT) AS q75_units,
           CAST(SUM(loss4) AS BIGINT) AS pinball4_total,
           CAST(SUM(loss4) AS DOUBLE) / (4 * COUNT(*)) AS mean_pinball
    FROM losses
    """,
)
def ml_eval_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss evaluation at τ = 3/4 for the constant
    75th-percentile forecaster of daily shipped quantity: the
    candidate quantile is the DISCRETE ceil(3n/4) order statistic
    (rank (3n+3) div 4, day-tie-broken), and the per-day loss
    max(τ(y−q), (τ−1)(y−q)) is scaled by 4 into exact integers —
    GREATEST(3(y−q), q−y) — so the total is int64 and the mean is
    ONE division.  This is the metric that validates any quantile
    forecast (safety stock, capacity planning).

    Scale: day-grain after a partial aggregate; the quantile rank is
    calendar-bounded; the loss pass is a broadcast of one scalar.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import lineitem_daily

    daily = lineitem_daily(spark, sf_dir).select("d", "y")
    ranked = daily.select(
        "y",
        F.row_number().over(Window.orderBy("y", "d")).cast("long").alias("rnk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    q75 = ranked.where(F.col("rnk") == F.expr("(n * 3 + 3) div 4")).select(
        F.col("y").alias("q")
    )
    losses = daily.crossJoin(F.broadcast(q75)).select(
        "y",
        "q",
        F.greatest(
            3 * (F.col("y") - F.col("q")), F.col("q") - F.col("y")
        )
        .cast("long")
        .alias("loss4"),
    )
    return losses.agg(
        F.count("*").cast("long").alias("n_days"),
        F.max("q").cast("long").alias("q75_units"),
        F.sum("loss4").cast("long").alias("pinball4_total"),
        (F.sum("loss4").cast("double") / (4 * F.count("*"))).alias(
            "mean_pinball"
        ),
    )


@register(
    "agg_xyz_classification",
    oracle="""
    WITH daily AS (
        SELECT p.p_brand,
               CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    moments AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS s,
               CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(14,0)))
                    AS DECIMAL(38,0)) AS s2
        FROM daily GROUP BY p_brand
    )
    SELECT p_brand, n, s AS total_units,
           CASE WHEN CAST(n AS DECIMAL(38,0)) * s2 - CAST(s AS DECIMAL(19,0))
                     * CAST(s AS DECIMAL(14,0))
                     <= CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(14,0))
                        // 25
                THEN 'X'
                WHEN CAST(n AS DECIMAL(38,0)) * s2 - CAST(s AS DECIMAL(19,0))
                     * CAST(s AS DECIMAL(14,0))
                     <= CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(14,0))
                        // 4
                THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           CAST(CAST(n AS DECIMAL(38,0)) * s2 - CAST(s AS DECIMAL(19,0))
                * CAST(s AS DECIMAL(14,0)) AS DOUBLE)
           / CAST(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(14,0))
                  AS DOUBLE) AS cv_squared
    FROM moments
    ORDER BY p_brand
    """,
)
def agg_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification (the companion axis to
    ABC): per brand the squared coefficient of variation
    CV² = (nΣq² − S²)/S² is compared against the 0.04 (X) and 0.25
    (Y) thresholds ENTIRELY in wide-decimal integer cross-
    multiplications — nΣq²−S² ≤ S²/25 ⟺ CV ≤ 0.2 with zero float
    ops — and the reported CV² is ONE division of two scale-0
    decimal→double renders (each a single rounding; a ×10⁶ ppm
    multiply inside DECIMAL(38) silently rounds on Spark — caught by
    the oracle).  Squares ride the d(19)×d(14)
    multiply (forces DuckDB's HUGEINT kernel, survives any scale).

    Scale: (brand, day) partial aggregate then a 25-row moment fold.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.expr(
                "CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("d"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    q = F.col("q")
    moments = daily.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("s"),
        F.sum(q.cast("decimal(19,0)") * q.cast("decimal(14,0)"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    num = F.col("n").cast("decimal(38,0)") * F.col("s2") - F.col("s").cast(
        "decimal(19,0)"
    ) * F.col("s").cast("decimal(14,0)")
    s_sq = F.col("s").cast("decimal(19,0)") * F.col("s").cast("decimal(14,0)")
    return moments.select(
        "p_brand",
        "n",
        F.col("s").alias("total_units"),
        F.when(num <= F.expr(
            "CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(14,0)) div 25"
        ), "X")
        .when(num <= F.expr(
            "CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(14,0)) div 4"
        ), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        (num.cast("double") / s_sq.cast("double")).alias("cv_squared"),
    ).orderBy("p_brand")


@register(
    "ml_learning_curve",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS label,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price,
               CAST(('0x' || substr(md5('lc:' || CAST(o_orderkey AS VARCHAR)),
                                    1, 15))::BIGINT % 100 AS BIGINT) AS slot
        FROM orders
    ),
    sizes AS (SELECT unnest([12, 25, 50]) AS train_pct),
    thresholds AS (
        SELECT s.train_pct,
               CAST(SUM(b.label * b.price) // NULLIF(SUM(b.label), 0)
                    AS BIGINT) AS pos_mean,
               CAST(SUM((1 - b.label) * b.price)
                    // NULLIF(SUM(1 - b.label), 0) AS BIGINT) AS neg_mean
        FROM base b JOIN sizes s ON b.slot < s.train_pct
        GROUP BY s.train_pct
    ),
    evald AS (
        SELECT t.train_pct, t.pos_mean, t.neg_mean,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN (CASE WHEN 2 * b.price
                                             > t.pos_mean + t.neg_mean
                                        THEN 1 ELSE 0 END) = b.label
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM base b CROSS JOIN thresholds t
        WHERE b.slot >= 50
        GROUP BY t.train_pct, t.pos_mean, t.neg_mean
    )
    SELECT train_pct, n_test, n_correct,
           CAST(n_correct * 1000000 // n_test AS BIGINT) AS accuracy_ppm
    FROM evald
    ORDER BY train_pct
    """,
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve for a nearest-class-mean price classifier:
    train on hash slots < {12, 25, 50} percent, always evaluate on
    the held-out half (slots ≥ 50), and report accuracy ppm per
    training size — the diagnostic that says whether more data still
    buys accuracy.  Class means are integer floor-means; the
    midpoint decision 2·price > μ₊+μ₋ is pure integer; the portable
    md5 slot hash gives identical folds on both engines.

    Scale: each curve point is a filtered partial aggregate over the
    SAME scan (Catalyst shares it); evaluation is one broadcast of 3
    threshold rows against the held-out slice.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("label"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("lc:"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("slot"),
    )
    sizes = spark.createDataFrame([(12,), (25,), (50,)], ["train_pct"])
    thresholds = (
        base.join(F.broadcast(sizes), F.col("slot") < F.col("train_pct"))
        .groupBy("train_pct")
        .agg(
            F.expr(
                "CAST(SUM(label * price) div NULLIF(SUM(label), 0) AS BIGINT)"
            ).alias("pos_mean"),
            F.expr(
                "CAST(SUM((1 - label) * price)"
                " div NULLIF(SUM(1 - label), 0) AS BIGINT)"
            ).alias("neg_mean"),
        )
    )
    pred = F.when(
        2 * F.col("price") > F.col("pos_mean") + F.col("neg_mean"), 1
    ).otherwise(0)
    evald = (
        base.where(F.col("slot") >= 50)
        .crossJoin(F.broadcast(thresholds))
        .groupBy("train_pct", "pos_mean", "neg_mean")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.when(pred == F.col("label"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
    )
    return evald.select(
        "train_pct",
        F.col("n_test").cast("long").alias("n_test"),
        F.col("n_correct").cast("long").alias("n_correct"),
        F.expr("CAST(n_correct * 1000000 div n_test AS BIGINT)").alias(
            "accuracy_ppm"
        ),
    ).orderBy("train_pct")


# ---------------------------------------------------------------------------
# Serial-correlation and changepoint test battery. Shared SQL tails
# (the ts_adstock pattern): the dialect-specific part is only the
# day-grain pre-aggregate, injected as a relation name.
# ---------------------------------------------------------------------------

_PETTITT_TAIL = """ranked AS (
    SELECT d, y,
           2 * CAST(rank() OVER (ORDER BY y) AS BIGINT)
             + CAST(count(*) OVER (PARTITION BY y) AS BIGINT) - 1 AS r2
    FROM {daily}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
cum AS (
    SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
           CAST(SUM(r2) OVER (ORDER BY d) AS BIGINT) AS s2
    FROM ranked
),
u AS (
    SELECT d, t, CAST(t * (n + 1) - s2 AS BIGINT) AS u_t, n
    FROM cum CROSS JOIN tot
    WHERE t < n
),
best AS (
    SELECT n, d AS change_day, u_t,
           CASE WHEN u_t >= 0 THEN u_t ELSE -u_t END AS k_stat
    FROM u
    ORDER BY k_stat DESC, d
    LIMIT 1
)
SELECT n, CAST(change_day AS BIGINT) AS change_day, k_stat,
       u_t AS u_at_change,
       CASE WHEN CAST(6 * k_stat * k_stat AS DOUBLE)
                 >= CAST('3.6888794541139363' AS DOUBLE)
                    * CAST(n*n*n + n*n AS DOUBLE)
            THEN 1 ELSE 0 END AS significant
FROM best"""

_DUCK_PURCHASE_DAILY = """
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS y
    FROM events GROUP BY 1
"""


@register(
    "stats_pettitt_change",
    oracle="WITH daily AS ("
    + _DUCK_PURCHASE_DAILY
    + "),\n"
    + _PETTITT_TAIL.format(daily="daily"),
)
def stats_pettitt_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test on the daily purchase series — fully
    integer via the rank identity U_t = t(n+1) − Σ_{i<=t} 2r_i with
    doubled mid-ranks 2r = 2·rank() + ties − 1 (exact under ties, the
    stats_mannwhitney dyadic-rank trick), so K = max|U_t| and the
    changepoint day are hash-exact. The 5%-significance cut
    2·exp(−6K²/(n³+n²)) <= 0.05 is decided by the integer-vs-literal
    cross-multiplication 6K² >= ln(40)·(n³+n²) — no exp() evaluated.

    Scale: ranks/cumsums run on the calendar-bounded daily frame, the
    only full scan is the day-grain pre-aggregate.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import (
        events_daily_by_type,
    )

    daily = (
        events_daily_by_type(spark, sf_dir)
        .groupBy(F.col("day").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("n"))
                .otherwise(0)
            )
            .cast("long")
            .alias("y")
        )
    )
    daily.createOrReplaceTempView("pettitt_daily")
    return spark.sql("WITH " + _PETTITT_TAIL.format(daily="pettitt_daily"))


_DW_TAIL = """lagged AS (
    SELECT d, y, lag(y) OVER (ORDER BY d) AS y1 FROM {daily}
),
moms AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(16,0)))
                AS DECIMAL(38,0)) AS s2,
           CAST(SUM(CASE WHEN y1 IS NULL THEN CAST(0 AS DECIMAL(19,0))
                         ELSE CAST(y - y1 AS DECIMAL(19,0))
                              * CAST(y - y1 AS DECIMAL(16,0)) END)
                AS DECIMAL(38,0)) AS sd2
    FROM lagged
),
fin AS (
    SELECT n,
           CAST(n AS DOUBLE) * (CAST(CAST((sd2 - sd2 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((sd2 % 1000000000000000000 - sd2 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(sd2 % 1000000000 AS BIGINT) AS DOUBLE)) AS num,
           CAST(n AS DOUBLE) * (CAST(CAST((s2 - s2 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s2 % 1000000000000000000 - s2 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s2 % 1000000000 AS BIGINT) AS DOUBLE))
             - (CAST(CAST((s1 - s1 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s1 % 1000000000000000000 - s1 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s1 % 1000000000 AS BIGINT) AS DOUBLE)) * (CAST(CAST((s1 - s1 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((s1 % 1000000000000000000 - s1 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(s1 % 1000000000 AS BIGINT) AS DOUBLE)) AS den
    FROM moms
)
SELECT n, num / den AS dw_stat,
       CAST(1 AS DOUBLE) - (num / den) / 2 AS rho1_approx,
       CASE WHEN num / den < CAST('1.5' AS DOUBLE) THEN 1 ELSE 0 END
           AS positive_autocorr_flag
FROM fin"""

_DUCK_REV_DAILY = """
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
    FROM orders GROUP BY 1
"""


def _rev_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session-cached day-grain revenue rollup (frame_cache.py): one
    # orders pass per session+fixture feeds every daily-revenue consumer
    from e2e_data_pipeline_spark.operators.frame_cache import orders_daily

    return orders_daily(spark, sf_dir).select("d", "y")


@register(
    "stats_durbin_watson",
    oracle="WITH daily AS ("
    + _DUCK_REV_DAILY
    + "),\n"
    + _DW_TAIL.format(daily="daily"),
)
def stats_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation statistic on daily revenue:
    DW = n·Σ(Δy)² / (n·Σy² − S²) with both quadratic forms kept exact
    in DECIMAL(38,0) via the d(19)×d(16) widened multiply (forces
    DuckDB's HUGEINT kernel; int64 would overflow on cents² at
    sf0.1+), then ONE fixed-order double chain — bit-identical across
    engines. rho1_approx = 1 − DW/2 rides the same chain.

    Scale: day-grain pre-aggregate then an O(days) window; the moment
    fold is a single partial-aggregable pass.
    """
    _rev_daily(spark, sf_dir).createOrReplaceTempView("dw_daily")
    return spark.sql("WITH " + _DW_TAIL.format(daily="dw_daily"))


_LB_TAIL = """tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s
    FROM {daily}
),
lagged AS (
    SELECT y,
           lag(y, 1) OVER (ORDER BY d) AS y1,
           lag(y, 2) OVER (ORDER BY d) AS y2,
           lag(y, 3) OVER (ORDER BY d) AS y3
    FROM {daily}
),
cov AS (
    SELECT n,
           SUM(CAST(n * y - s AS DECIMAL(19,0))
               * CAST(n * y - s AS DECIMAL(16,0))) AS c0,
           SUM(CASE WHEN y1 IS NULL THEN CAST(0 AS DECIMAL(19,0))
                    ELSE CAST(n * y - s AS DECIMAL(19,0))
                         * CAST(n * y1 - s AS DECIMAL(16,0)) END) AS c1,
           SUM(CASE WHEN y2 IS NULL THEN CAST(0 AS DECIMAL(19,0))
                    ELSE CAST(n * y - s AS DECIMAL(19,0))
                         * CAST(n * y2 - s AS DECIMAL(16,0)) END) AS c2,
           SUM(CASE WHEN y3 IS NULL THEN CAST(0 AS DECIMAL(19,0))
                    ELSE CAST(n * y - s AS DECIMAL(19,0))
                         * CAST(n * y3 - s AS DECIMAL(16,0)) END) AS c3
    FROM lagged CROSS JOIN tot
    GROUP BY n
),
rho AS (
    SELECT n,
           (CAST(CAST((c1 - c1 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((c1 % 1000000000000000000 - c1 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(c1 % 1000000000 AS BIGINT) AS DOUBLE)) / (CAST(CAST((c0 - c0 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((c0 % 1000000000000000000 - c0 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(c0 % 1000000000 AS BIGINT) AS DOUBLE)) AS r1,
           (CAST(CAST((c2 - c2 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((c2 % 1000000000000000000 - c2 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(c2 % 1000000000 AS BIGINT) AS DOUBLE)) / (CAST(CAST((c0 - c0 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((c0 % 1000000000000000000 - c0 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(c0 % 1000000000 AS BIGINT) AS DOUBLE)) AS r2,
           (CAST(CAST((c3 - c3 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((c3 % 1000000000000000000 - c3 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(c3 % 1000000000 AS BIGINT) AS DOUBLE)) / (CAST(CAST((c0 - c0 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((c0 % 1000000000000000000 - c0 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(c0 % 1000000000 AS BIGINT) AS DOUBLE)) AS r3
    FROM cov
)
SELECT n, r1, r2, r3,
       CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
         * (r1 * r1 / CAST(n - 1 AS DOUBLE)
            + r2 * r2 / CAST(n - 2 AS DOUBLE)
            + r3 * r3 / CAST(n - 3 AS DOUBLE)) AS q_lb,
       CASE WHEN CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
                 * (r1 * r1 / CAST(n - 1 AS DOUBLE)
                    + r2 * r2 / CAST(n - 2 AS DOUBLE)
                    + r3 * r3 / CAST(n - 3 AS DOUBLE))
                 > CAST('7.814727903251179' AS DOUBLE)
            THEN 1 ELSE 0 END AS reject_white_noise
FROM rho"""


@register(
    "stats_ljung_box",
    oracle="WITH daily AS ("
    + _DUCK_REV_DAILY
    + "),\n"
    + _LB_TAIL.format(daily="daily"),
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box white-noise test (lags 1-3) on daily revenue. Each
    autocovariance is denominator-cleared to n²c_k = Σ(ny_t−S)(ny_{t−k}−S)
    — exact DECIMAL(38,0) via widened multiplies — so every ρ_k is ONE
    double division of exact values, and Q = n(n+2)·Σρ_k²/(n−k) is a
    fixed written-order chain (in-expression float sums are portable;
    only cross-ROW double sums are not). Rejection compares Q to the
    χ²(3) 5% literal — no special functions.

    Scale: one day-grain pre-aggregate, three lag columns over ONE
    ordered calendar-bounded window pass, single-row output.
    """
    _rev_daily(spark, sf_dir).createOrReplaceTempView("lb_daily")
    return spark.sql("WITH " + _LB_TAIL.format(daily="lb_daily"))


_PERCEPTRON_TAIL = """
walk(i, w0, w1, w2, w3, mistakes) AS (
    SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT s.i,
           w0 + CASE WHEN s.y * (w0 + w1*s.x1 + w2*s.x2 + w3*s.x3) <= 0
                     THEN s.y ELSE 0 END,
           w1 + CASE WHEN s.y * (w0 + w1*s.x1 + w2*s.x2 + w3*s.x3) <= 0
                     THEN s.y * s.x1 ELSE 0 END,
           w2 + CASE WHEN s.y * (w0 + w1*s.x1 + w2*s.x2 + w3*s.x3) <= 0
                     THEN s.y * s.x2 ELSE 0 END,
           w3 + CASE WHEN s.y * (w0 + w1*s.x1 + w2*s.x2 + w3*s.x3) <= 0
                     THEN s.y * s.x3 ELSE 0 END,
           mistakes + CASE WHEN s.y * (w0 + w1*s.x1 + w2*s.x2 + w3*s.x3) <= 0
                           THEN 1 ELSE 0 END
    FROM walk JOIN {sample} s ON s.i = walk.i + 1
)
SELECT i AS n_seen, w0 AS bias, w1 AS w_qty, w2 AS w_disc, w3 AS w_tax,
       mistakes
FROM walk ORDER BY i DESC LIMIT 1"""

_PERCEPTRON_DUCK_SAMPLE = """
    WITH feat AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y,
               CAST(ROUND(l_quantity) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
               CAST(ROUND(l_tax * 100) AS BIGINT) AS x3,
               md5(CAST(l_orderkey AS VARCHAR) || '#'
                   || CAST(l_linenumber AS VARCHAR) || '#'
                   || CAST(CAST(ROUND(l_quantity) AS BIGINT) AS VARCHAR)
                   || '#'
                   || CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           AS VARCHAR) || '#'
                   || CAST(CAST(ROUND(l_discount * 100) AS BIGINT)
                           AS VARCHAR) || '#'
                   || CAST(CAST(ROUND(l_tax * 100) AS BIGINT) AS VARCHAR)
                   || '#' || l_returnflag) AS h
        FROM lineitem
    )
    SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS i,
           y, x1, x2, x3
    FROM feat ORDER BY h LIMIT 32
"""


@register(
    "ml_perceptron_int",
    oracle="WITH RECURSIVE sample AS ("
    + _PERCEPTRON_DUCK_SAMPLE
    + "),"
    + _PERCEPTRON_TAIL.format(sample="sample"),
)
def ml_perceptron_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One epoch of Rosenblatt's perceptron, entirely in int64: a
    64-row deterministic sample (portable-md5 bottom-k, the
    sample_bottom_k rule), features (qty, discount-cents, tax-cents,
    bias), labels ±1 on returnflag, and the mistake-driven update
    w += y·x folded engine-side — both engines provably learn
    the IDENTICAL model (Spark: one aggregate() array fold; DuckDB
    oracle: a recursive CTE — independent constructions) (hash-checked weights + mistake count), the
    online-learning companion to ml_gbm_stumps' batch boosting.

    Scale: the fixed-size sample bounds recursion depth at 32
    regardless of corpus rows; the only distributed work is the
    bottom-k sample (TakeOrderedAndProject, no full sort). The Spark
    side checkpoints the indexed sample so each recursion step is a
    1-row join, not a rescan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture
    # — the fingerprint must cover every column the model consumes so
    # hash ties are only between indistinguishable rows.
    h = F.md5(
        F.concat_ws(
            "#",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.round("l_quantity").cast("long").cast("string"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .cast("string"),
            F.round(F.col("l_discount") * 100).cast("long").cast("string"),
            F.round(F.col("l_tax") * 100).cast("long").cast("string"),
            F.col("l_returnflag"),
        )
    )
    sample = (
        li.select(
            h.alias("h"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(-1).alias("y"),
            F.round("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
            F.round(F.col("l_tax") * 100).cast("long").alias("x3"),
        )
        .orderBy("h")
        .limit(32)
        .select(
            F.row_number()
            .over(Window.orderBy("h"))
            .cast("long")
            .alias("i"),
            "y",
            "x1",
            "x2",
            "x3",
        )
        .localCheckpoint(eager=True)
    )
    sample.createOrReplaceTempView("perceptron_sample")
    # Spark side folds the 32 examples in ONE JVM aggregate() lambda
    # (a recursive CTE costs ~0.3s/step of scheduler overhead); the
    # oracle keeps the recursive-CTE construction, so the two engines
    # reach the same weights by different machinery — a stronger
    # parity than shared text.
    upd = (
        "s.y * (acc.w0 + acc.w1 * s.x1 + acc.w2 * s.x2 + acc.w3 * s.x3)"
        " <= 0"
    )
    fold = f"""
    aggregate(
      array_sort(collect_list(struct(i, y, x1, x2, x3))),
      named_struct('i', CAST(0 AS BIGINT), 'w0', CAST(0 AS BIGINT),
                   'w1', CAST(0 AS BIGINT), 'w2', CAST(0 AS BIGINT),
                   'w3', CAST(0 AS BIGINT), 'mistakes', CAST(0 AS BIGINT)),
      (acc, s) -> named_struct(
        'i', s.i,
        'w0', acc.w0 + IF({upd}, s.y, CAST(0 AS BIGINT)),
        'w1', acc.w1 + IF({upd}, s.y * s.x1, CAST(0 AS BIGINT)),
        'w2', acc.w2 + IF({upd}, s.y * s.x2, CAST(0 AS BIGINT)),
        'w3', acc.w3 + IF({upd}, s.y * s.x3, CAST(0 AS BIGINT)),
        'mistakes', acc.mistakes + IF({upd}, CAST(1 AS BIGINT),
                                      CAST(0 AS BIGINT)))
    ) AS st
    """
    return spark.sql(
        f"""
        SELECT st.i AS n_seen, st.w0 AS bias, st.w1 AS w_qty,
               st.w2 AS w_disc, st.w3 AS w_tax, st.mistakes AS mistakes
        FROM (SELECT {fold} FROM perceptron_sample)
        """
    )


@register(
    "ml_eval_brier",
    oracle="""
    WITH seg AS (
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, c.c_mktsegment
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    train AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS m,
               CAST(SUM(CASE WHEN o_totalprice > 3000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM seg WHERE o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY c_mktsegment
    ),
    test AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_totalprice > 3000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM seg WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY c_mktsegment
    ),
    j AS (
        SELECT t.c_mktsegment AS segment, t.n, t.c, tr.m, tr.k,
               CAST(tr.k AS DOUBLE) / CAST(tr.m AS DOUBLE) AS pred,
               CAST(t.c AS DOUBLE) / CAST(t.n AS DOUBLE) AS obs
        FROM test t JOIN train tr ON tr.c_mktsegment = t.c_mktsegment
        WHERE tr.m > 0 AND t.n > 0
    )
    SELECT segment, n AS n_test, pred, obs,
           (CAST(c AS DOUBLE) * (CAST(1 AS DOUBLE) - pred)
              * (CAST(1 AS DOUBLE) - pred)
            + CAST(n - c AS DOUBLE) * pred * pred) / CAST(n AS DOUBLE)
               AS brier,
           (pred - obs) * (pred - obs) AS reliability_term
    FROM j
    ORDER BY segment
    """,
)
def ml_eval_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Brier score with the Murphy reliability term:
    predictions are train-period (pre-1998) high-value rates per
    market segment, scored on the holdout. Within a segment the Brier
    sum collapses to the closed form (c(1−p)² + (n−c)p²)/n, so every
    output is a fixed-order chain over exact-integer divisions —
    bit-identical across engines, with NO cross-row float sums (the
    per-segment rows replace a global mean whose denominators would
    not clear).

    Scale: broadcast dim join, two conditional-count partial
    aggregates, 5-row output.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    hi = F.when(F.col("o_totalprice") > 3000, 1).otherwise(0)
    split = "1998-01-01"
    train = (
        seg.where(F.col("o_orderdate") < split)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("m"),
            F.sum(hi).cast("long").alias("k"),
        )
    )
    test = (
        seg.where(F.col("o_orderdate") >= split)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(hi).cast("long").alias("c"),
        )
    )
    j = (
        test.join(train, "c_mktsegment")
        .where((F.col("m") > 0) & (F.col("n") > 0))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "n",
            "c",
            (F.col("k").cast("double") / F.col("m").cast("double")).alias(
                "pred"
            ),
            (F.col("c").cast("double") / F.col("n").cast("double")).alias(
                "obs"
            ),
        )
    )
    one = F.lit(1).cast("double")
    return j.select(
        "segment",
        F.col("n").alias("n_test"),
        "pred",
        "obs",
        (
            (
                F.col("c").cast("double") * (one - F.col("pred"))
                * (one - F.col("pred"))
                + (F.col("n") - F.col("c")).cast("double")
                * F.col("pred")
                * F.col("pred")
            )
            / F.col("n").cast("double")
        ).alias("brier"),
        ((F.col("pred") - F.col("obs")) * (F.col("pred") - F.col("obs"))).alias(
            "reliability_term"
        ),
    ).orderBy("segment")


_JT_TAIL = """
seg AS (
    SELECT CASE c.c_mktsegment
               WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
               WHEN 'FURNITURE' THEN 3 WHEN 'HOUSEHOLD' THEN 4
               ELSE 5 END AS g,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS v
    FROM {orders} o JOIN {customer} c ON c.c_custkey = o.o_custkey
),
grp AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM seg GROUP BY g),
vals AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM seg GROUP BY g, v),
grid AS (
    SELECT dv.v, dg.g
    FROM (SELECT DISTINCT v FROM vals) dv
    CROSS JOIN (SELECT DISTINCT g FROM vals) dg
),
cells AS (
    SELECT grid.v, grid.g, COALESCE(vals.c, 0) AS c
    FROM grid LEFT JOIN vals ON vals.v = grid.v AND vals.g = grid.g
),
le AS (
    SELECT v, g, c,
           SUM(c) OVER (PARTITION BY g ORDER BY v) - c AS lt
    FROM cells
),
pre AS (
    SELECT v, g, c,
           SUM(2 * lt + c) OVER (PARTITION BY v ORDER BY g)
             - (2 * lt + c) AS w
    FROM le
),
jstat AS (SELECT CAST(SUM(c * w) AS BIGINT) AS j2 FROM pre),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn,
           CAST(SUM(n * n) AS BIGINT) AS sn2,
           CAST(SUM(n * n * (2 * n + 3)) AS BIGINT) AS sv
    FROM grp
)
SELECT j2,
       CAST((nn * nn - sn2) AS BIGINT) AS e2x2,
       CAST(nn * nn * (2 * nn + 3) - sv AS BIGINT) AS var72,
       (CAST(j2 AS DOUBLE) - CAST(nn * nn - sn2 AS DOUBLE) / 2)
         / 2
         / sqrt(CAST(nn * nn * (2 * nn + 3) - sv AS DOUBLE)
                / CAST(72 AS DOUBLE)) AS z
FROM jstat CROSS JOIN tot"""


@register(
    "stats_jonckheere",
    oracle="WITH " + _JT_TAIL.format(orders="orders", customer="customer"),
)
def stats_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test across the
    five market segments (the K-group ordered generalization of
    Mann-Whitney): J = Σ_{i<j} U_ij, kept integer as J2 = 2J with the
    tie convention 2·#{greater} + #{equal}. Pairwise U's never
    materialize — per-(value, group) cells get a per-group running
    'less-than' count and a per-VALUE running sum over group index
    folds all i<j pairs at once. z is the (J−E)/sqrt(Var) chain over
    exact ints (div, div, sqrt, div — fixed order, bit-identical);
    a brute-force pairwise unit test pins J2 at sf0.001.

    Scale: windows run over the per-cents reduced grid (distinct
    price cents × 5), bounded by the price DOMAIN, not row count —
    the stats_mannwhitney prefix-sum pattern. Int64 headroom: N³
    terms clear the 10× smoke with 1.4× margin; Spark's ANSI mode
    raises (not corrupts) beyond that.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("jt_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "jt_customer"
    )
    return spark.sql(
        "WITH " + _JT_TAIL.format(orders="jt_orders", customer="jt_customer")
    )


_CMH_SEGS = [
    ("AUTOMOBILE", 1),
    ("BUILDING", 2),
    ("FURNITURE", 3),
    ("HOUSEHOLD", 4),
    ("MACHINERY", 5),
]

_CMH_WIDE = ",\n      ".join(
    f"MAX(CASE WHEN seg = '{s}' THEN a END) AS a{i},\n      "
    f"MAX(CASE WHEN seg = '{s}' THEN r1 END) AS r1{i},\n      "
    f"MAX(CASE WHEN seg = '{s}' THEN c1 END) AS c1{i},\n      "
    f"MAX(CASE WHEN seg = '{s}' THEN n END) AS n{i}"
    for s, i in _CMH_SEGS
)

_CMH_DEV = "\n      + ".join(
    f"(CAST(a{i} AS DOUBLE) - CAST(r1{i} * c1{i} AS DOUBLE)"
    f" / CAST(n{i} AS DOUBLE))"
    for _, i in _CMH_SEGS
)

_CMH_VAR = "\n      + ".join(
    f"(CAST(r1{i} AS DOUBLE) * CAST(n{i} - r1{i} AS DOUBLE)"
    f" * CAST(c1{i} AS DOUBLE) * CAST(n{i} - c1{i} AS DOUBLE)"
    f" / (CAST(n{i} AS DOUBLE) * CAST(n{i} AS DOUBLE)"
    f" * CAST(n{i} - 1 AS DOUBLE)))"
    for _, i in _CMH_SEGS
)

_CMH_TAIL = f"""
cells AS (
    SELECT c.c_mktsegment AS seg,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                          AND o.o_totalprice > 3000 THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS r1,
           CAST(SUM(CASE WHEN o.o_totalprice > 3000 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {{orders}} o JOIN {{customer}} c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
),
wide AS (
    SELECT
      {_CMH_WIDE}
    FROM cells
),
terms AS (
    SELECT
      {_CMH_DEV}
          AS dev,
      {_CMH_VAR}
          AS var_sum
    FROM wide
)
SELECT dev, var_sum, dev * dev / var_sum AS cmh_stat,
       CASE WHEN dev * dev / var_sum > CAST('3.841458820694124' AS DOUBLE)
            THEN 1 ELSE 0 END AS reject_indep
FROM terms"""


@register(
    "stats_cmh",
    oracle="WITH " + _CMH_TAIL.format(orders="orders", customer="customer"),
)
def stats_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified association test: does
    urgent order priority associate with high order value AFTER
    controlling for market segment (Simpson's-paradox-proof 2×2×K)?
    The five per-stratum tables PIVOT into one row (the
    kruskal-wallis rule: never SUM doubles across rows), so the
    deviation Σ(a_k − r1·c1/n) and variance Σ r1·r0·c1·c0/(n²(n−1))
    are single fixed-order in-expression chains — each term one
    division over exact ints (the 4-way count product is evaluated
    in double to dodge the int64 overflow a 10× inflation would hit).

    Scale: one broadcast dim join + conditional-count partial agg;
    everything after is a 5-cell fold.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("cmh_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "cmh_customer"
    )
    return spark.sql(
        "WITH "
        + _CMH_TAIL.format(orders="cmh_orders", customer="cmh_customer")
    )


_MEDIAN_CI_TAIL = """
base AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM {orders}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
percents AS (SELECT v, count(*) AS c FROM base GROUP BY v),
cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM percents),
ranks AS (
    SELECT n,
           CAST(floor((CAST(n AS DOUBLE)
                       - CAST('1.959963984540054' AS DOUBLE)
                         * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT)
               AS lo_rank,
           CAST(ceil(1 + (CAST(n AS DOUBLE)
                          + CAST('1.959963984540054' AS DOUBLE)
                            * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT)
               AS hi_rank,
           (n + 1) {div} 2 AS m1,
           n {div} 2 + 1 AS m2
    FROM tot
),
pick AS (
    SELECT r.n, r.lo_rank, r.hi_rank,
           MIN(CASE WHEN cc >= GREATEST(r.lo_rank, 1) THEN v END) AS lo_v,
           MIN(CASE WHEN cc >= LEAST(r.hi_rank, r.n) THEN v END) AS hi_v,
           MIN(CASE WHEN cc >= r.m1 THEN v END) AS med1,
           MIN(CASE WHEN cc >= r.m2 THEN v END) AS med2
    FROM cum CROSS JOIN ranks r
    GROUP BY r.n, r.lo_rank, r.hi_rank, r.m1, r.m2
)
SELECT n,
       (CAST(med1 AS DOUBLE) + CAST(med2 AS DOUBLE)) / 2 AS median_cents,
       lo_rank, hi_rank,
       CAST(lo_v AS BIGINT) AS ci_lo_cents,
       CAST(hi_v AS BIGINT) AS ci_hi_cents
FROM pick"""


@register(
    "stats_median_ci",
    oracle="WITH " + _MEDIAN_CI_TAIL.format(orders="orders", div="//"),
)
def stats_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median order-value with its distribution-free 95% confidence
    interval: the CI is the pair of ORDER STATISTICS at ranks
    (n ∓ 1.96√n)/2 (the binomial-count argument — no distributional
    assumption, no interpolation), located through the per-cents
    cumulative-count table. The tie-averaged median is exact dyadic;
    rank arithmetic is one sqrt chain on identical doubles, floored
    identically on both engines.

    Scale: the window runs over the per-cents reduced table (price-
    domain bounded, the stats_mannwhitney pattern), not raw rows.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "medci_orders"
    )
    return spark.sql(
        "WITH " + _MEDIAN_CI_TAIL.format(orders="medci_orders", div="div")
    )


_MEDIAN_POLISH_TAIL = """
cells AS (
    SELECT d, hod, CAST(4 * z AS BIGINT) AS a
    FROM {grid}
),
rowmed AS (
    SELECT d, CAST(SUM(pick) AS BIGINT) AS rm
    FROM (
        SELECT d, a,
               CASE WHEN count(*) OVER wd % 2 = 1
                    THEN CASE WHEN row_number() OVER wo
                              = (count(*) OVER wd + 1) {div} 2
                         THEN a ELSE 0 END
                    ELSE CASE WHEN row_number() OVER wo
                              IN (count(*) OVER wd {div} 2,
                                  count(*) OVER wd {div} 2 + 1)
                         THEN a {div} 2 ELSE 0 END
               END AS pick
        FROM cells
        WINDOW wd AS (PARTITION BY d),
               wo AS (PARTITION BY d ORDER BY a)
    ) r
    GROUP BY d
),
resid1 AS (
    SELECT c.d, c.hod, c.a - rowmed.rm AS b
    FROM cells c JOIN rowmed ON rowmed.d = c.d
),
colmed AS (
    SELECT hod, CAST(SUM(pick) AS BIGINT) AS cm
    FROM (
        SELECT hod, b,
               CASE WHEN count(*) OVER wh % 2 = 1
                    THEN CASE WHEN row_number() OVER wo
                              = (count(*) OVER wh + 1) {div} 2
                         THEN b ELSE 0 END
                    ELSE CASE WHEN row_number() OVER wo
                              IN (count(*) OVER wh {div} 2,
                                  count(*) OVER wh {div} 2 + 1)
                         THEN b {div} 2 ELSE 0 END
               END AS pick
        FROM resid1
        WINDOW wh AS (PARTITION BY hod),
               wo AS (PARTITION BY hod ORDER BY b)
    ) r
    GROUP BY hod
)
SELECT r.hod,
       CAST(colmed.cm AS BIGINT) AS col_effect_q,
       CAST(colmed.cm AS DOUBLE) / 4 AS col_effect,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(MAX(CASE WHEN r.b - colmed.cm >= 0 THEN r.b - colmed.cm
                     ELSE colmed.cm - r.b END) AS BIGINT)
           AS max_abs_resid_q
FROM resid1 r JOIN colmed ON colmed.hod = r.hod
GROUP BY r.hod, colmed.cm
ORDER BY r.hod"""

_MEDIAN_POLISH_DUCK_GRID = """(
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 24 AS hod,
               count(*) AS z
        FROM events GROUP BY 1, 2
    ) g"""


@register(
    "agg_median_polish",
    oracle="WITH "
    + _MEDIAN_POLISH_TAIL.format(grid=_MEDIAN_POLISH_DUCK_GRID, div="//"),
)
def agg_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sweep of Tukey's median polish on the day × hour-of-day
    activity matrix: row (day) medians subtract out load level, then
    column (hour) medians expose the robust diurnal effect, with the
    max absolute residual flagging cells neither effect explains —
    the outlier-immune cousin of ts_seasonal_profile's means. All
    exact: cells enter ×4 (quarter units) so BOTH tie-averaged
    medians stay integral, and every `div` operand is even or
    non-negative (floor ≡ truncate — no cross-engine negative-div
    hazard).

    Scale: medians run per day (24 rows) and per hour (days rows) —
    calendar-bounded partitions after the grain collapse.
    """
    events = load_table(spark, sf_dir, "events")
    grid = events.groupBy(
        F.expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400").alias("d"),
        F.expr(
            "pmod(CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 3600, 24)"
        ).alias("hod"),
    ).agg(F.count("*").alias("z"))
    grid.createOrReplaceTempView("polish_grid")
    return spark.sql(
        "WITH "
        + _MEDIAN_POLISH_TAIL.format(grid="polish_grid", div="div")
    )


_TOST_TAIL = """
moms AS (
    SELECT c.c_mktsegment AS seg,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS s,
           CAST(SUM(CAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                         AS DECIMAL(19,0))
                    * CAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                           AS DECIMAL(14,0))) AS DECIMAL(38,0)) AS s2
    FROM {orders} o JOIN {customer} c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    GROUP BY c.c_mktsegment
),
wide AS (
    SELECT
      MAX(CASE WHEN seg = 'AUTOMOBILE' THEN n END) AS n1,
      MAX(CASE WHEN seg = 'AUTOMOBILE' THEN s END) AS s1,
      MAX(CASE WHEN seg = 'AUTOMOBILE' THEN s2 END) AS q1,
      MAX(CASE WHEN seg = 'BUILDING' THEN n END) AS n2,
      MAX(CASE WHEN seg = 'BUILDING' THEN s END) AS s2_,
      MAX(CASE WHEN seg = 'BUILDING' THEN s2 END) AS q2
    FROM moms
),
calc AS (
    SELECT n1, n2,
           CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
           CAST(s2_ AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
           (CAST(n1 AS DOUBLE) * (CAST(CAST((q1 - q1 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q1 % 1000000000000000000 - q1 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q1 % 1000000000 AS BIGINT) AS DOUBLE))
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                * CAST(n1 - 1 AS DOUBLE)) AS vm1,
           (CAST(n2 AS DOUBLE) * (CAST(CAST((q2 - q2 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q2 % 1000000000000000000 - q2 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q2 % 1000000000 AS BIGINT) AS DOUBLE))
              - CAST(s2_ AS DOUBLE) * CAST(s2_ AS DOUBLE))
             / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                * CAST(n2 - 1 AS DOUBLE)) AS vm2
    FROM wide
),
z AS (
    SELECT n1, n2, m1, m2, m1 - m2 AS diff,
           sqrt(vm1 + vm2) AS se,
           ((m1 - m2) + CAST('5000' AS DOUBLE)) / sqrt(vm1 + vm2) AS z_lower,
           (CAST('5000' AS DOUBLE) - (m1 - m2)) / sqrt(vm1 + vm2) AS z_upper
    FROM calc
)
SELECT n1, n2, m1 AS mean_auto_cents, m2 AS mean_bldg_cents, diff, se,
       z_lower, z_upper,
       CASE WHEN z_lower > CAST('1.6448536269514722' AS DOUBLE)
             AND z_upper > CAST('1.6448536269514722' AS DOUBLE)
            THEN 1 ELSE 0 END AS equivalent_within_50
FROM z"""


@register(
    "stats_tost_z",
    oracle="WITH " + _TOST_TAIL.format(orders="orders", customer="customer"),
)
def stats_tost_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-one-sided-tests (TOST) equivalence check: are AUTOMOBILE
    and BUILDING mean order values equivalent within ±$50? The
    inferential inverse of stats_ab_ztest — absence of evidence
    upgraded to evidence of absence, the test launch reviews actually
    need. Large-sample z form: exact int64/decimal moments, per-arm
    variance-of-mean as one fixed-order chain, both one-sided z's
    against the 5% normal literal.

    Scale: one broadcast dim join + a 2-row moment pivot (the
    cross-row-float-sum rule: arms fold in one expression).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "tost_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "tost_customer"
    )
    return spark.sql(
        "WITH "
        + _TOST_TAIL.format(orders="tost_orders", customer="tost_customer")
    )


_BLAND_ALTMAN_TAIL = """
pairs AS (
    SELECT o.m1, l.m2, o.m1 - l.m2 AS dd
    FROM {header} o JOIN {detail} l ON l.k = o.k
),
moms AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(dd) AS BIGINT) AS sd_,
           CAST(SUM(CAST(dd AS DECIMAL(19,0)) * CAST(dd AS DECIMAL(14,0)))
                AS DECIMAL(38,0)) AS q
    FROM pairs
),
stats AS (
    SELECT n,
           CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
           sqrt((CAST(n AS DOUBLE) * (CAST(CAST((q - q % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q % 1000000000000000000 - q % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q % 1000000000 AS BIGINT) AS DOUBLE))
                 - CAST(sd_ AS DOUBLE) * CAST(sd_ AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sdd
    FROM moms
),
loa AS (
    SELECT n, bias, sdd,
           bias - CAST('1.959963984540054' AS DOUBLE) * sdd AS loa_lo,
           bias + CAST('1.959963984540054' AS DOUBLE) * sdd AS loa_hi
    FROM stats
)
SELECT loa.n, bias, sdd AS sd_diff, loa_lo, loa_hi,
       CAST(SUM(CASE WHEN CAST(dd AS DOUBLE) < loa_lo
                       OR CAST(dd AS DOUBLE) > loa_hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outside,
       CAST(SUM(CASE WHEN CAST(dd AS DOUBLE) < loa_lo
                       OR CAST(dd AS DOUBLE) > loa_hi
                     THEN 1 ELSE 0 END) * 1000000 AS BIGINT)
           {div} loa.n AS outside_ppm
FROM pairs CROSS JOIN loa
GROUP BY loa.n, bias, sdd, loa_lo, loa_hi"""


@register(
    "stats_bland_altman",
    oracle="""WITH header AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS m1
        FROM orders
    ),
    detail AS (
        SELECT l_orderkey AS k,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS m2
        FROM lineitem GROUP BY l_orderkey
    ),"""
    + _BLAND_ALTMAN_TAIL.format(header="header", detail="detail", div="//"),
)
def stats_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman agreement analysis between two measurements of
    the same order — the header total vs the summed line details
    (dq_recon_totals asks 'do they match'; this asks 'HOW do they
    disagree': bias, spread, and 95% limits of agreement). Integer
    cent differences, decimal-exact second moment, fixed-order
    bias/LoA chains, and the outside-LoA count compares exact ints
    against identical double bounds.

    Scale: two partial aggs co-partitioned on orderkey, one
    broadcastable 1-row LoA join back over the pairs.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    orders.select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("m1"),
    ).createOrReplaceTempView("ba_header")
    li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("m2")
    ).createOrReplaceTempView("ba_detail")
    return spark.sql(
        "WITH "
        + _BLAND_ALTMAN_TAIL.format(
            header="ba_header", detail="ba_detail", div="div"
        )
    )


_DELONG_TAIL = """
pop AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM {events} WHERE event_type IN ('purchase', 'click')
),
per_cents AS (
    SELECT cents,
           CAST(SUM(grp) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(grp) AS BIGINT) AS n_neg
    FROM pop GROUP BY cents
),
ranked AS (
    SELECT cents, n_pos, n_neg,
           CAST(COALESCE(SUM(n_neg) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS neg_less,
           CAST(COALESCE(SUM(n_pos) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS pos_less
    FROM per_cents
),
tot AS (
    SELECT CAST(SUM(n_pos) AS BIGINT) AS m, CAST(SUM(n_neg) AS BIGINT) AS n
    FROM per_cents
),
pv AS (
    SELECT n_pos, n_neg,
           2 * neg_less + n_neg AS w10,
           2 * (m - pos_less - n_pos) + n_pos AS w01
    FROM ranked CROSS JOIN tot
),
moms AS (
    SELECT
        CAST(SUM(n_pos * w10) AS BIGINT) AS s10,
        CAST(SUM(CAST(n_pos AS DECIMAL(19,0)) * CAST(w10 AS DECIMAL(9,0))
                 * CAST(w10 AS DECIMAL(9,0))) AS DECIMAL(38,0)) AS q10,
        CAST(SUM(n_neg * w01) AS BIGINT) AS s01,
        CAST(SUM(CAST(n_neg AS DECIMAL(19,0)) * CAST(w01 AS DECIMAL(9,0))
                 * CAST(w01 AS DECIMAL(9,0))) AS DECIMAL(38,0)) AS q01
    FROM pv
),
calc AS (
    SELECT m, n,
        CAST(s10 AS DOUBLE) / (2 * CAST(m AS DOUBLE) * CAST(n AS DOUBLE))
            AS auc,
        (CAST(m AS DOUBLE) * (CAST(CAST((q10 - q10 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q10 % 1000000000000000000 - q10 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q10 % 1000000000 AS BIGINT) AS DOUBLE))
           - CAST(s10 AS DOUBLE) * CAST(s10 AS DOUBLE))
          / (CAST(m AS DOUBLE) * CAST(m - 1 AS DOUBLE))
          / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS v10,
        (CAST(n AS DOUBLE) * (CAST(CAST((q01 - q01 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q01 % 1000000000000000000 - q01 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q01 % 1000000000 AS BIGINT) AS DOUBLE))
           - CAST(s01 AS DOUBLE) * CAST(s01 AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
          / (4 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS v01
    FROM moms CROSS JOIN tot
)
SELECT m AS n_pos, n AS n_neg, auc,
       sqrt(v10 / CAST(m AS DOUBLE) + v01 / CAST(n AS DOUBLE)) AS se_delong,
       auc - CAST('1.959963984540054' AS DOUBLE)
           * sqrt(v10 / CAST(m AS DOUBLE) + v01 / CAST(n AS DOUBLE))
           AS ci_lo,
       auc + CAST('1.959963984540054' AS DOUBLE)
           * sqrt(v10 / CAST(m AS DOUBLE) + v01 / CAST(n AS DOUBLE))
           AS ci_hi
FROM calc"""


@register(
    "ml_eval_auc_delong",
    oracle="WITH " + _DELONG_TAIL.format(events="events"),
)
def ml_eval_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC with its DeLong confidence interval — the number reviewers
    demand next to every reported AUC. Placement values (the
    mid-rank fraction of negatives below each positive, and of
    positives above each negative) are kept INTEGER by doubling and
    scaling (w10 = 2·neg_less + ties), their variances exact via
    d(19)×d(9)² decimal moments, and SE/CI close with one fixed
    sqrt chain. AUC itself reproduces ml_eval_auc's rank identity;
    a Python placement-value reference pins SE to the last digit.

    Scale: the per-cents reduced table (score-domain bounded) does
    all ranking — no per-row window over raw events.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "delong_events"
    )
    return spark.sql("WITH " + _DELONG_TAIL.format(events="delong_events"))


_KSU_TAIL = """
hashed AS (
    SELECT {hash60} AS h FROM {customer}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hashed),
ranked AS (
    SELECT h,
           CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS r,
           n
    FROM hashed CROSS JOIN tot
),
devs AS (
    -- D+ = max(r/n - F0(h)), D- = max(F0(h) - (r-1)/n), F0 = h / 2^60.
    -- Each operand is ONE division of exact ints (identical doubles
    -- on both engines), so max/subtract/compare are bit-portable; a
    -- cleared-integer form would overflow int64 at r >= 8.
    SELECT n,
           MAX(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(h AS DOUBLE)
                 / CAST('1152921504606846976' AS DOUBLE)) AS dplus,
           MAX(CAST(h AS DOUBLE) / CAST('1152921504606846976' AS DOUBLE)
               - CAST(r - 1 AS DOUBLE) / CAST(n AS DOUBLE)) AS dminus
    FROM ranked
    GROUP BY n
)
SELECT n,
       GREATEST(dplus, dminus) AS d_stat,
       CAST('1.3581015157406195' AS DOUBLE) / sqrt(CAST(n AS DOUBLE))
           AS d_crit_5pct,
       CASE WHEN GREATEST(dplus, dminus)
                 > CAST('1.3581015157406195' AS DOUBLE)
                   / sqrt(CAST(n AS DOUBLE))
            THEN 1 ELSE 0 END AS reject_uniform
FROM devs"""

_KSU_HASH_DUCK = (
    "CAST(('0x' || substr(md5(c_name), 1, 15)) AS BIGINT)"
)
_KSU_HASH_SPARK = "conv(substr(md5(c_name), 1, 15), 16, 10)"


@register(
    "stats_ks_uniform_hash",
    oracle="WITH "
    + _KSU_TAIL.format(hash60=_KSU_HASH_DUCK, customer="customer"),
)
def stats_ks_uniform_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Kolmogorov-Smirnov test of the engine's portable
    60-bit md5 hash against Uniform(0, 2^60) — the statistical
    soundness certificate for every hash-split, hash-sample, and
    MinHash operator in the registry. D⁺/D⁻ terms are each ONE
    division of exact integers — bit-identical doubles on both
    engines — so the max/subtract/compare chain is portable without
    integer clearing (which would overflow int64 at 2^60·r), and the
    5% decision compares against the asymptotic 1.3581/√n literal.

    Scale: ranking runs on the hash-domain-ordered single pass; for
    row counts beyond int64 headroom the same statistic distributes
    via global_rank.
    """
    cust = load_table(spark, sf_dir, "customer")
    hashed = cust.select(
        F.expr(f"CAST({_KSU_HASH_SPARK} AS BIGINT)").alias("h")
    )
    # Distributed ranking (global_rank range-partitions on h) — a bare
    # row_number() over the whole population is the single-partition
    # sort this repo bans at entity grain.
    ranked, n_total, _ = global_rank(hashed, [F.col("h")], rn_name="r")
    # n_total or 1: on a zero-row input the frame is empty (no output
    # rows either way), but ANSI constant folding still evaluates the
    # d_crit projection's 1.3581/sqrt(n) over the LITERAL and raises
    # DIVIDE_BY_ZERO at plan time — caught by the round-5 plan sweep.
    ranked.withColumn(
        "n", F.lit(n_total or 1).cast("long")
    ).createOrReplaceTempView("ksu_ranked")
    tail = _KSU_TAIL.format(hash60="h", customer="ksu_ranked")
    head, _, rest = tail.partition("devs AS (")
    return spark.sql(
        "WITH devs AS ("
        + rest.replace("FROM ranked", "FROM ksu_ranked")
    )


_CAPREC_TAIL = """
w1 AS (SELECT DISTINCT user_id FROM {base} WHERE d < 15),
w2 AS (SELECT DISTINCT user_id FROM {base} WHERE d >= 15),
counts AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM w1) AS n1,
           (SELECT CAST(count(*) AS BIGINT) FROM w2) AS n2,
           (SELECT CAST(count(*) AS BIGINT)
            FROM w1 JOIN w2 ON w2.user_id = w1.user_id) AS m,
           (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM {base})
               AS true_total
)
SELECT n1, n2, m, true_total,
       CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
         / CAST(CASE WHEN m = 0 THEN 1 ELSE m END AS DOUBLE)
           AS lincoln_petersen,
       CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
         / CAST(m + 1 AS DOUBLE) - 1 AS chapman
FROM counts"""


@register(
    "agg_capture_recapture",
    oracle="""WITH base AS (
        SELECT user_id,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                 - (SELECT MIN(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
                    FROM events) AS d
        FROM events
    ),"""
    + _CAPREC_TAIL.format(base="base"),
)
def agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimate (Lincoln-Petersen +
    Chapman's bias-corrected form): treat the first and second
    half-months of activity as two 'sightings' and estimate the TRUE
    distinct-user population from sample sizes and overlap — the
    ecology estimator data teams reuse to size dedup universes when a
    full COUNT(DISTINCT) is too expensive. true_total rides along so
    the estimator error is visible. One division each, exact-int
    operands.

    Scale: two semi-distinct passes + one co-partitioned overlap
    join; no global structure.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        F.expr("CAST(CAST(ts AS TIMESTAMP) AS BIGINT) div 86400").alias("dd"),
    )
    lo = base.agg(F.min("dd")).collect()[0][0] or 0
    base.select(
        "user_id", (F.col("dd") - F.lit(lo)).alias("d")
    ).createOrReplaceTempView("caprec_base")
    return spark.sql("WITH " + _CAPREC_TAIL.format(base="caprec_base").lstrip())


_WHIPPLE_TAIL = """
digits AS (
    SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) % 10 AS last_digit
    FROM {orders}
),
counts AS (
    SELECT last_digit, CAST(count(*) AS BIGINT) AS c FROM digits GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM counts)
SELECT last_digit, c AS n_amounts,
       CAST(c * 1000000 AS BIGINT) {div} t AS share_ppm,
       CAST((SELECT SUM(CASE WHEN last_digit IN (0, 5) THEN c ELSE 0 END)
             FROM counts) * 5 * 1000000 AS BIGINT) {div} t
           AS whipple_ppm
FROM counts CROSS JOIN tot
ORDER BY last_digit"""


@register(
    "dq_digit_preference",
    oracle="WITH " + _WHIPPLE_TAIL.format(orders="orders", div="//"),
)
def dq_digit_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-digit preference audit (Whipple-style): the
    distribution of the LAST cent digit plus the 0/5-heaping index
    5·(c0+c5)/total — flags hand-keyed or rounded amounts the way
    dq_benford_digits flags fabricated LEADING digits (the two
    forensic ends of a number). Whipple 1,000,000 ppm = no heaping;
    real keyed data runs high. All integer, exact ppm.

    Scale: one conditional-count partial agg, 10-row output.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "whipple_orders"
    )
    return spark.sql(
        "WITH " + _WHIPPLE_TAIL.format(orders="whipple_orders", div="div")
    )


_VR_TAIL = """
diffs AS (
    SELECT d, y - lag(y) OVER (ORDER BY d) AS r1,
           y - lag(y, 5) OVER (ORDER BY d) AS r5
    FROM {daily}
),
moms AS (
    SELECT CAST(count(r1) AS BIGINT) AS n1,
           CAST(SUM(r1) AS BIGINT) AS s1,
           CAST(SUM(CAST(r1 AS DECIMAL(19,0)) * CAST(r1 AS DECIMAL(14,0)))
                AS DECIMAL(38,0)) AS q1,
           CAST(count(r5) AS BIGINT) AS n5,
           CAST(SUM(r5) AS BIGINT) AS s5,
           CAST(SUM(CAST(r5 AS DECIMAL(19,0)) * CAST(r5 AS DECIMAL(14,0)))
                AS DECIMAL(38,0)) AS q5
    FROM diffs
),
vars AS (
    -- n1 > 0 guard: the zero-row frame's degenerate moment row would
    -- raise ANSI DIVIDE_BY_ZERO (shared text: both engines filter
    -- identically; any real series has n1 >= n5 > 0)
    SELECT n1,
           (CAST(n1 AS DOUBLE) * (CAST(CAST((q1 - q1 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q1 % 1000000000000000000 - q1 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q1 % 1000000000 AS BIGINT) AS DOUBLE))
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS v1,
           (CAST(n5 AS DOUBLE) * (CAST(CAST((q5 - q5 % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((q5 % 1000000000000000000 - q5 % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(q5 % 1000000000 AS BIGINT) AS DOUBLE))
              - CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE))
             / (CAST(n5 AS DOUBLE) * CAST(n5 AS DOUBLE)) AS v5
    FROM moms
    WHERE n1 > 0 AND n5 > 0
)
SELECT n1 AS n_returns,
       v5 / (5 * v1) AS vr5,
       (v5 / (5 * v1) - 1)
         / sqrt(CAST(2 * (2 * 5 - 1) * (5 - 1) AS DOUBLE)
                / (CAST(3 * 5 AS DOUBLE) * CAST(n1 AS DOUBLE))) AS z_lm,
       CASE WHEN (v5 / (5 * v1) - 1)
                 / sqrt(CAST(2 * (2 * 5 - 1) * (5 - 1) AS DOUBLE)
                        / (CAST(3 * 5 AS DOUBLE) * CAST(n1 AS DOUBLE)))
                 > CAST('1.959963984540054' AS DOUBLE)
              OR (v5 / (5 * v1) - 1)
                 / sqrt(CAST(2 * (2 * 5 - 1) * (5 - 1) AS DOUBLE)
                        / (CAST(3 * 5 AS DOUBLE) * CAST(n1 AS DOUBLE)))
                 < -CAST('1.959963984540054' AS DOUBLE)
            THEN 1 ELSE 0 END AS reject_random_walk
FROM vars"""


@register(
    "ts_variance_ratio",
    oracle="""WITH daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),"""
    + _VR_TAIL.format(daily="daily"),
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (q=5) on daily revenue: is
    the series a random walk (VR≈1), mean-reverting (VR<1), or
    trending (VR>1)? Overlapping 5-day changes come from one lag
    window; both variances are exact decimal moments closed by
    fixed-order chains, and the homoskedastic z uses only integer
    literals and n.

    Scale: day-grain pre-aggregate then one ordered window pass.
    """
    daily = _rev_daily(spark, sf_dir)
    daily.createOrReplaceTempView("vr_daily")
    return spark.sql("WITH " + _VR_TAIL.format(daily="vr_daily").lstrip())


_CHOW_RSS = """(CAST(n AS DOUBLE) * {syy}
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
            - (CAST(n AS DOUBLE) * {sty}
               - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * {sty}
                 - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))
             / CAST(n AS DOUBLE)""".format(syy='(CAST(CAST((syy - syy % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((syy % 1000000000000000000 - syy % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(syy % 1000000000 AS BIGINT) AS DOUBLE))', sty='(CAST(CAST((sty - sty % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((sty % 1000000000000000000 - sty % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(sty % 1000000000 AS BIGINT) AS DOUBLE))')

_CHOW_TAIL = """
based AS (
    SELECT d - (SELECT MIN(d) FROM {daily}) AS t, y,
           CASE WHEN d < 10227 THEN 1 ELSE 2 END AS regime
    FROM {daily}
),
moms AS (
    SELECT regime,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(t) AS BIGINT) AS st,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(t * t) AS BIGINT) AS stt,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(t AS DECIMAL(14,0)))
                AS DECIMAL(38,0)) AS sty,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(16,0)))
                AS DECIMAL(38,0)) AS syy
    FROM based GROUP BY regime
),
pooled AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(st) AS BIGINT) AS st,
           CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(stt) AS BIGINT) AS stt,
           CAST(SUM(sty) AS DECIMAL(38,0)) AS sty,
           CAST(SUM(syy) AS DECIMAL(38,0)) AS syy
    FROM moms
),
rss AS (
    SELECT 0 AS regime, {rss} AS rss_n, n FROM pooled
    UNION ALL
    SELECT regime, {rss} AS rss_n, n FROM moms
),
wide AS (
    SELECT MAX(CASE WHEN regime = 0 THEN rss_n END) AS rss_p,
           MAX(CASE WHEN regime = 1 THEN rss_n END) AS rss_1,
           MAX(CASE WHEN regime = 2 THEN rss_n END) AS rss_2,
           MAX(CASE WHEN regime = 0 THEN n END) AS n_all
    FROM rss
)
SELECT n_all, rss_p AS rss_pooled, rss_1, rss_2,
       ((rss_p - rss_1 - rss_2) / 2)
         / ((rss_1 + rss_2) / CAST(n_all - 4 AS DOUBLE)) AS chow_f,
       CASE WHEN ((rss_p - rss_1 - rss_2) / 2)
                 / ((rss_1 + rss_2) / CAST(n_all - 4 AS DOUBLE))
                 > CAST(\'2.9957\' AS DOUBLE)
            THEN 1 ELSE 0 END AS break_detected
FROM wide"""


@register(
    "stats_chow_break",
    oracle="""WITH daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),"""
    + _CHOW_TAIL.format(daily="daily", rss=_CHOW_RSS),
)
def stats_chow_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow structural-break test at a known date (1998-01-01): fit
    the revenue-on-time regression pooled and per regime, then
    F = ((RSS_p − RSS_1 − RSS_2)/2) / ((RSS_1+RSS_2)/(n−4)) against
    the F(2, ∞) 5% literal — the econometric complement to
    ts_changepoint_cusum's unknown-date CUSUM. Every RSS is the
    granger-style centered-moment chain; the wide decimal moments
    render to double through registry.wide_dbl's 3-limb split (this
    op is where the bare DECIMAL(38)->DOUBLE cast was first caught
    diverging by 1 ulp: DuckDB's INT128 conversion is not correctly
    rounded). Regime moments ADD into pooled moments exactly, so
    pooling costs no second scan.

    Scale: one day-grain pre-aggregate; the two-regime grouping is a
    partial agg and the test itself is O(1).
    """
    daily = _rev_daily(spark, sf_dir)
    daily.createOrReplaceTempView("chow_daily")
    return spark.sql(
        "WITH "
        + _CHOW_TAIL.format(daily="chow_daily", rss=_CHOW_RSS).lstrip()
    )


_Z95 = 1.959963984540054
_SLICE_AUDIT_TAIL = """
per_slice AS (
    SELECT slice,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT)
               AS k
    FROM {scored} GROUP BY slice
),
wilson AS (
    SELECT slice, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
           (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
            + CAST('{z2h}' AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST('{z}' AS DOUBLE)
              * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     * (1 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                     / CAST(n AS DOUBLE)
                     + CAST('{z2q}' AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           / (1 + CAST('{z2}' AS DOUBLE) / CAST(n AS DOUBLE)) AS wilson_lo
    FROM per_slice
)
SELECT CAST(row_number() OVER (ORDER BY wilson_lo, slice) AS BIGINT)
           AS worst_rank,
       slice, n, k, accuracy, wilson_lo
FROM wilson
ORDER BY worst_rank""".replace("{z2h}", repr(_Z95 * _Z95 / 2)).replace(
    "{z2q}", repr(_Z95 * _Z95 / 4)
).replace("{z2}", repr(_Z95 * _Z95)).replace("{z}", repr(_Z95))


@register(
    "ml_slice_audit",
    oracle="""WITH scored AS (
        SELECT c.c_mktsegment AS slice,
               CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END AS pred,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS label
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    ),"""
    + _SLICE_AUDIT_TAIL.format(scored="scored"),
)
def ml_slice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst-slice model audit: per-segment accuracy of a fixed rule
    ranked by the WILSON LOWER BOUND (not the point estimate, so a
    tiny slice can't look worst on noise alone) — the slicing pass a
    responsible-model review runs before shipping. Wilson constants
    are generated from one Python float (repr-embedded) rather than
    hand-typed: identical-expression ops are parity-blind to literal
    typos, and this op exists because one was caught in review.

    Scale: broadcast dims into the fact join, one conditional-count
    partial agg, 5-row Wilson projection.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    scored = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("slice"),
            F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("pred"),
            F.when(F.col("l_returnflag") == "R", 1)
            .otherwise(0)
            .alias("label"),
        )
    )
    scored.createOrReplaceTempView("slice_scored")
    return spark.sql(
        "WITH " + _SLICE_AUDIT_TAIL.format(scored="slice_scored").lstrip()
    )


def _wilson_expr(k: str, n: str, sign: str) -> str:
    """Wilson interval endpoint as shared SQL text (repr-embedded
    z constants; sign '+' = upper bound, '-' = lower bound)."""
    kd, nd = f"CAST({k} AS DOUBLE)", f"CAST({n} AS DOUBLE)"
    return (
        f"(({kd} / {nd} + CAST('{_Z95 * _Z95 / 2!r}' AS DOUBLE) / {nd} "
        f"{sign} CAST('{_Z95!r}' AS DOUBLE) "
        f"* sqrt(({kd} / {nd}) * (1 - {kd} / {nd}) / {nd} "
        f"+ CAST('{_Z95 * _Z95 / 4!r}' AS DOUBLE) / ({nd} * {nd}))) "
        f"/ (1 + CAST('{_Z95 * _Z95!r}' AS DOUBLE) / {nd}))"
    )


_UPLIFT_TAIL = """
cells AS (
    SELECT seg,
           CAST(SUM(t) AS BIGINT) AS nt,
           CAST(SUM(t * y) AS BIGINT) AS kt,
           CAST(SUM(1 - t) AS BIGINT) AS nc,
           CAST(SUM((1 - t) * y) AS BIGINT) AS kc
    FROM {scored} GROUP BY seg
),
bounds AS (
    SELECT seg, nt, kt, nc, kc,
           CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE)
             - CAST(kc AS DOUBLE) / CAST(nc AS DOUBLE) AS uplift,
           {wl_t} - {wu_c} AS uplift_lo
    FROM cells
    WHERE nt > 0 AND nc > 0
)
SELECT CAST(row_number() OVER (ORDER BY uplift_lo DESC, seg) AS BIGINT)
           AS rnk,
       seg, nt, kt, nc, kc, uplift, uplift_lo
FROM bounds
ORDER BY rnk"""


@register(
    "ml_uplift_segments",
    oracle="""WITH scored AS (
        SELECT p.p_brand AS seg,
               CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END AS t,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
    ),"""
    + _UPLIFT_TAIL.format(
        scored="scored",
        wl_t=_wilson_expr("kt", "nt", "-"),
        wu_c=_wilson_expr("kc", "nc", "+"),
    ),
)
def ml_uplift_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level uplift ranking with a Newcombe-style guard:
    treatment (deep discount) minus control return rates per brand,
    ordered by the CONSERVATIVE bound Wilson_lo(treated) −
    Wilson_hi(control) — a segment only tops the rollout list when
    even its pessimistic uplift beats the others' optimistic reads.
    Wilson endpoints share the repr-generated constants with
    ml_slice_audit (one float literal source, no hand-typed z²).

    Scale: broadcast part dim, one conditional-count partial agg,
    25-row bound projection.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    scored = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("seg"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("t"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    scored.createOrReplaceTempView("uplift_scored")
    return spark.sql(
        "WITH "
        + _UPLIFT_TAIL.format(
            scored="uplift_scored",
            wl_t=_wilson_expr("kt", "nt", "-"),
            wu_c=_wilson_expr("kc", "nc", "+"),
        ).lstrip()
    )


_DHONDT_TAIL = """
quotients AS (
    SELECT party, v, k,
           CAST(v AS DOUBLE) / CAST(2 * k + 1 AS DOUBLE) AS q_sl,
           CAST(v AS DOUBLE) / CAST(k + 1 AS DOUBLE) AS q_dh
    FROM {votes} CROSS JOIN {ks}
),
dh AS (
    SELECT party, row_number() OVER (ORDER BY q_dh DESC, party, k) AS r
    FROM quotients
),
sl AS (
    SELECT party, row_number() OVER (ORDER BY q_sl DESC, party, k) AS r
    FROM quotients
)
SELECT v.party, v.v AS revenue_cents,
       CAST((SELECT count(*) FROM dh
             WHERE dh.party = v.party AND dh.r <= 10) AS BIGINT)
           AS dhondt_seats,
       CAST((SELECT count(*) FROM sl
             WHERE sl.party = v.party AND sl.r <= 10) AS BIGINT)
           AS sainte_lague_seats
FROM {votes} v
ORDER BY v.party"""


@register(
    "agg_divisor_apportionment",
    oracle="""WITH votes AS (
        SELECT c.c_mktsegment AS party,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    ),"""
    + _DHONDT_TAIL.format(
        votes="votes", ks="(SELECT unnest(range(0, 10)) AS k) ks"
    ),
)
def agg_divisor_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Divisor-method seat apportionment — D'Hondt (divisors 1,2,3…)
    and Sainte-Laguë (1,3,5…) side by side, allocating 10 slots by
    segment revenue: the proportional-allocation family's divisor
    branch (agg_apportionment covers Hamilton's largest remainder).
    Quotients are single divisions of exact ints (identical doubles
    both engines — legal ORDER BY keys), ties break
    (party, divisor-index) deterministically.

    Scale: parties × 10 divisor rows; ranking is constant-size after
    the revenue partial agg.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    votes = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("party"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("v")
        )
    )
    votes.createOrReplaceTempView("dhondt_votes")
    spark.range(0, 10).select(F.col("id").alias("k")).createOrReplaceTempView(
        "dhondt_ks"
    )
    return spark.sql(
        "WITH "
        + _DHONDT_TAIL.format(votes="dhondt_votes", ks="dhondt_ks").lstrip()
    )


def _votes_all_days(div: str, qd: str) -> str:
    """dq_outlier_votes' construction WITHOUT its top-20 projection —
    the full per-day vote table for agreement analysis."""
    from e2e_data_pipeline_spark.operators.relational_ext import (
        _OUTLIER_VOTES_TAIL,
    )

    tail = _OUTLIER_VOTES_TAIL.format(daily="{daily}", div=div, qd=qd)
    marker = "ORDER BY n_votes DESC, dev_n DESC, d\nLIMIT 20"
    assert marker in tail, "dq_outlier_votes tail changed — update kappa"
    return tail.replace(marker, "")


_FLEISS_TAIL = """
per AS (
    SELECT (iqr_vote + mad_vote + z_vote) AS x FROM allvotes
),
sums AS (
    SELECT CAST(count(*) AS BIGINT) AS nd,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x + (3 - x) * (3 - x) - 3) AS BIGINT) AS snum
    FROM per
),
calc AS (
    SELECT nd,
           CAST(snum AS DOUBLE) / (6 * CAST(nd AS DOUBLE)) AS p_bar,
           CAST(sx AS DOUBLE) / (3 * CAST(nd AS DOUBLE)) AS p1
    FROM sums
)
SELECT nd AS n_days, p1 AS positive_share, p_bar,
       p1 * p1 + (1 - p1) * (1 - p1) AS p_e,
       (p_bar - (p1 * p1 + (1 - p1) * (1 - p1)))
         / (1 - (p1 * p1 + (1 - p1) * (1 - p1))) AS fleiss_kappa
FROM calc"""


def _fleiss_oracle() -> str:
    daily = """
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    """
    votes = _votes_all_days("//", wide_dbl("q")).format(daily="daily")
    return (
        "WITH daily AS ("
        + daily
        + "), allvotes AS (WITH "
        + votes
        + "),"
        + _FLEISS_TAIL
    )


@register("stats_fleiss_kappa", oracle=_fleiss_oracle())
def stats_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the three outlier detectors (IQR, MAD, 3σ)
    treated as raters of every trading day — chance-corrected
    agreement for the dq_outlier_votes ensemble (percent agreement
    flatters raters who mostly say 'normal'; kappa doesn't). With 3
    raters × 2 categories every P_i numerator is the integer
    x²+(3−x)²−3, so P̄, the marginal shares, and kappa are one
    fixed-order chain over exact int64 sums.

    Scale: inherits the vote construction's per-cents tables; the
    kappa fold is one partial-aggregable pass over day-grain votes.

    The vote table is built STAGEWISE (_votes_frame_staged) on the
    Spark side: the single-statement nested-scalar-subquery form let
    SparkPlanInfo's fromLogicalPlan recursion StackOverflow a cold
    JVM (flaky, JIT-state-dependent — the r6 judge reproduced it;
    the driver-owned session cannot carry -Xss). Day-grain stats are
    bounded by the date domain, so the stage materializations cost
    nothing at any scale. tests/test_plan_depth.py sweeps the
    registry for the hazard; the oracle keeps the nested
    single-statement text (DuckDB has no such cliff).
    """
    from e2e_data_pipeline_spark.operators.relational_ext import (
        _votes_frame_staged,
    )

    daily = _rev_daily(spark, sf_dir)
    _votes_frame_staged(spark, daily, "fleiss")
    return spark.sql(
        "WITH allvotes AS (SELECT * FROM fleiss_votes)," + _FLEISS_TAIL
    )


_BALANCE_TAIL = """
moms AS (
    SELECT cov,
           CAST(SUM(t) AS BIGINT) AS nt,
           CAST(SUM(t * x) AS BIGINT) AS st,
           CAST(SUM(CAST(t * x AS DECIMAL(19,0))
                    * CAST(x AS DECIMAL(14,0))) AS DECIMAL(38,0)) AS qt,
           CAST(SUM(1 - t) AS BIGINT) AS nc,
           CAST(SUM((1 - t) * x) AS BIGINT) AS sc,
           CAST(SUM(CAST((1 - t) * x AS DECIMAL(19,0))
                    * CAST(x AS DECIMAL(14,0))) AS DECIMAL(38,0)) AS qc
    FROM {stacked} GROUP BY cov
),
calc AS (
    SELECT cov, nt, nc,
           CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS m_t,
           CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS m_c,
           (CAST(nt AS DOUBLE) * {qtd}
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
             / (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE)) AS v_t,
           (CAST(nc AS DOUBLE) * {qcd}
              - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
             / (CAST(nc AS DOUBLE) * CAST(nc - 1 AS DOUBLE)) AS v_c
    FROM moms
)
SELECT cov AS covariate, nt AS n_treated, nc AS n_control, m_t, m_c,
       (m_t - m_c) / sqrt((v_t + v_c) / 2) AS smd,
       CASE WHEN (m_t - m_c) / sqrt((v_t + v_c) / 2)
                 > CAST('0.1' AS DOUBLE)
             OR (m_t - m_c) / sqrt((v_t + v_c) / 2)
                 < -CAST('0.1' AS DOUBLE)
            THEN 1 ELSE 0 END AS imbalanced
FROM calc
ORDER BY covariate"""


@register(
    "ml_covariate_balance",
    oracle="""WITH base AS (
        SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS t,
               CAST(ROUND(l_quantity) AS BIGINT) AS qty,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
               CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
        FROM lineitem
    ),
    stacked AS (
        SELECT 'quantity' AS cov, t, qty AS x FROM base
        UNION ALL
        SELECT 'price_cents', t, price_c FROM base
        UNION ALL
        SELECT 'tax_cents', t, tax_c FROM base
    ),"""
    + _BALANCE_TAIL.format(
        stacked="stacked",
        qtd="(CAST(CAST((qt - qt % 1000000000000000000)"
        " / 1000000000000000000 AS BIGINT) AS DOUBLE)"
        " * CAST(1000000000000000000 AS DOUBLE)"
        " + CAST(CAST((qt % 1000000000000000000 - qt % 1000000000)"
        " / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE)"
        " + CAST(CAST(qt % 1000000000 AS BIGINT) AS DOUBLE))",
        qcd="(CAST(CAST((qc - qc % 1000000000000000000)"
        " / 1000000000000000000 AS BIGINT) AS DOUBLE)"
        " * CAST(1000000000000000000 AS DOUBLE)"
        " + CAST(CAST((qc % 1000000000000000000 - qc % 1000000000)"
        " / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE)"
        " + CAST(CAST(qc % 1000000000 AS BIGINT) AS DOUBLE))",
    ),
)
def ml_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance table for the discount 'treatment':
    standardized mean differences (Cohen's d with pooled SD) for
    quantity, price, and tax between treated and control line items,
    with the |SMD| > 0.1 imbalance flag — the diagnostic causal
    analysts print BEFORE trusting any uplift estimate
    (ml_uplift_segments' sanity precondition). Covariates stack into
    rows so one moment fold covers all three; second moments ride
    widened decimals rendered through the wide_dbl limbs.

    Scale: one stacked conditional-moment partial agg (3× scan
    width, one pass), 3-row output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("t"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qty"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias(
            "price_c"
        ),
        F.expr("CAST(ROUND(l_tax * 100) AS BIGINT)").alias("tax_c"),
    )
    stacked = (
        base.select(F.lit("quantity").alias("cov"), "t",
                    F.col("qty").alias("x"))
        .unionAll(
            base.select(F.lit("price_cents").alias("cov"), "t",
                        F.col("price_c").alias("x"))
        )
        .unionAll(
            base.select(F.lit("tax_cents").alias("cov"), "t",
                        F.col("tax_c").alias("x"))
        )
    )
    stacked.createOrReplaceTempView("balance_stacked")
    return spark.sql(
        "WITH "
        + _BALANCE_TAIL.format(
            stacked="balance_stacked",
            qtd=wide_dbl("qt"),
            qcd=wide_dbl("qc"),
        ).lstrip()
    )


@register(
    "agg_log_histogram_quantiles",
    oracle="""
    WITH vals AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    bucketed AS (
        SELECT cents,
               length(bin(cents)) AS msb,
               (cents >> (length(bin(cents)) - 3)) & 3 AS sub
        FROM vals
    ),
    hist AS (
        SELECT msb * 4 + sub AS bucket,
               (1::BIGINT << (msb - 1))
                   + sub * (1::BIGINT << (msb - 3)) AS lo,
               (1::BIGINT << (msb - 1))
                   + (sub + 1) * (1::BIGINT << (msb - 3)) - 1 AS hi,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM bucketed GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT bucket, lo, hi, n,
               SUM(n) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_n,
               (SELECT CAST(SUM(n) AS BIGINT) FROM hist) AS n_total
        FROM hist
    ),
    qs AS (SELECT * FROM (VALUES (50), (95), (99)) t(q_pct)),
    est AS (
        SELECT q.q_pct, c.bucket, c.lo, c.hi, c.n_total
        FROM qs q JOIN cum c
          ON c.cum_n >= (q.q_pct * c.n_total + 99) // 100
         AND c.cum_n - c.n < (q.q_pct * c.n_total + 99) // 100
    ),
    ranked_vals AS (
        SELECT cents,
               SUM(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_v
        FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM vals GROUP BY cents)
    ),
    truth AS (
        SELECT q.q_pct,
               MIN(r.cents) AS true_q
        FROM qs q JOIN ranked_vals r
          ON r.cum_v >= (q.q_pct * (SELECT n_total FROM est LIMIT 1)
                         + 99) // 100
        GROUP BY q.q_pct
    )
    SELECT e.q_pct, e.n_total, e.bucket,
           e.lo AS est_lo_cents, e.hi AS est_hi_cents,
           CAST((e.hi - e.lo) * 1000000 // e.lo AS BIGINT)
               AS rel_err_bound_ppm,
           t.true_q AS true_q_cents,
           CAST(CASE WHEN t.true_q BETWEEN e.lo AND e.hi
                THEN 1 ELSE 0 END AS BIGINT) AS bound_holds
    FROM est e JOIN truth t USING (q_pct)
    """,
)
def agg_log_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-histogram quantile sketch with an IN-QUERY audit:
    values land in base-2^(1/4) buckets derived purely from integer
    bit surgery (msb = length(bin(x)), two sub-bits — `ln()` is NOT
    cross-engine portable, bit twiddling is), the histogram is a
    ~120-cell mergeable state (counts add — partial aggregation and
    cross-day merging work at any scale, the DDSketch idea made
    hash-exact), and p50/p95/p99 come from the cumulative crossing
    bucket with a guaranteed relative-error bound of 2^(1/4)−1 ≈ 19%
    (the bucket width, reported in exact ppm of the lower edge). The
    audit column proves the TRUE discrete quantile (computed on the
    distinct-cents frame, the stats_mannwhitney machinery) falls
    inside the reported bucket — the sketch grades itself in the
    same query.

    Scale: one partial-agg pass to the bucket histogram; the
    cumulative walks run on bounded frames (buckets; distinct cents).
    """
    vals = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    bucketed = vals.select(
        "cents",
        F.length(F.bin("cents")).cast("long").alias("msb"),
        F.expr("(cents >> (length(bin(cents)) - 3)) & 3").alias("sub"),
    )
    hist = (
        bucketed.groupBy(
            (F.col("msb") * 4 + F.col("sub")).alias("bucket"),
            F.expr(
                "(CAST(1 AS BIGINT) << (msb - 1))"
                " + sub * (CAST(1 AS BIGINT) << (msb - 3))"
            ).alias("lo"),
            F.expr(
                "(CAST(1 AS BIGINT) << (msb - 1))"
                " + (sub + 1) * (CAST(1 AS BIGINT) << (msb - 3)) - 1"
            ).alias("hi"),
        )
        .agg(F.count("*").alias("n"))
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = hist.agg(F.sum("n").alias("n_total"))
    cum = hist.withColumn("cum_n", F.sum("n").over(wb)).crossJoin(
        F.broadcast(tot)
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(95), F.lit(99))).alias("q_pct")
    )
    thresh = F.expr("(q_pct * n_total + 99) div 100")
    est = qs.join(
        cum,
        (F.col("cum_n") >= thresh) & (F.col("cum_n") - F.col("n") < thresh),
    )
    wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked_vals = (
        vals.groupBy("cents")
        .agg(F.count("*").alias("cnt"))
        .withColumn("cum_v", F.sum("cnt").over(wv))
    )
    truth = (
        qs.crossJoin(F.broadcast(tot))
        .join(ranked_vals, F.col("cum_v") >= thresh)
        .groupBy("q_pct")
        .agg(F.min("cents").alias("true_q"))
    )
    return est.join(truth, "q_pct").select(
        "q_pct",
        F.col("n_total").cast("long").alias("n_total"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("lo").alias("est_lo_cents"),
        F.col("hi").alias("est_hi_cents"),
        F.expr("(hi - lo) * 1000000 div lo")
        .cast("long")
        .alias("rel_err_bound_ppm"),
        F.col("true_q").alias("true_q_cents"),
        F.when(
            F.col("true_q").between(F.col("lo"), F.col("hi")), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("bound_holds"),
    )


_HLL_TAIL = """
parts AS (
    SELECT h {div} 4503599627370496 AS bucket,
           h % 4503599627370496 AS w
    FROM hashed
),
regs AS (
    -- bin() is unpadded on BOTH engines, so length(bin(w)) is the bit
    -- length; the w=0 case is explicit (NEVER two-arg ltrim here:
    -- Spark's ltrim(a, b) argument order is REVERSED vs DuckDB's)
    SELECT bucket,
           MAX(CASE WHEN w = 0 THEN 53
                    ELSE 53 - length(bin(w)) END) AS m
    FROM parts GROUP BY bucket
),
filled AS (
    SELECT s.b AS bucket, COALESCE(r.m, 0) AS m
    FROM spine s LEFT JOIN regs r ON r.bucket = s.b
),
z AS (
    SELECT CAST(SUM(CAST((CAST(1 AS BIGINT) << (62 - m))
                    AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS zs,
           CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
           CAST(MAX(m) AS BIGINT) AS max_rho
    FROM filled
)
SELECT z.v0 AS n_zero_registers,
       z.max_rho,
       {widez} AS z_scaled,
       CAST('0.7182725932495458' AS DOUBLE) * CAST(65536 AS DOUBLE)
         * CAST(4611686018427387904 AS DOUBLE) / {widez} AS hll_estimate,
       e.n_exact
FROM z CROSS JOIN exact e"""


def _hll_sql(hash_expr: str, spine: str, div: str) -> str:
    return (
        "WITH hashed AS (SELECT "
        + hash_expr
        + " AS h FROM orders), spine AS ("
        + spine
        + "), exact AS (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)"
        " AS n_exact FROM orders),"
        + _HLL_TAIL.format(div=div, widez=wide_dbl("z.zs"))
    )


@register(
    "agg_hll_det",
    oracle=_hll_sql(
        "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))"
        " AS BIGINT)",
        "SELECT unnest(range(0, 256)) AS b",
        "//",
    ),
)
def agg_hll_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog, hash-exact across engines — the
    parity proof of the SKETCH ITSELF that the rows-only `agg_approx`
    (engine HLL++) cannot give. The portable 60-bit md5 hash splits
    into an 8-bit register index and a 52-bit suffix; rho is computed
    WITHOUT log2 (not correctly rounded across engines) as
    ``53 - length(ltrim(bin(w),'0'))`` — bin() is unpadded on both
    engines, so the string length IS the bit length. Registers fold
    with MAX (order-free, merge-safe — the property that makes HLL
    shardable at 100 TB); the harmonic denominator stays EXACT by
    scaling each term to the integer ``1 << (62 - M_j)`` (M ≤ 53 ⇒
    shift ≤ 62, dodging the <<63 wrap/raise divergence) and summing
    in DECIMAL(38,0); the final estimate is a fixed-order float chain
    over that exact integer rendered through registry.wide_dbl (the
    3-limb rule for wide decimals past 2^53). No bias/linear-counting
    correction (ln is not portable); the raw estimator regime holds
    at every fixture sf, and the exact distinct rides along so the
    accuracy is self-documenting.

    Scale: one partial-aggregable GROUP BY over 256 registers — the
    sketch is 256 bytes no matter how many trillion rows feed it.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _hll_sql(
            "CAST(conv(substr(md5(CAST(o_orderkey AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)",
            "SELECT id AS b FROM range(256)",
            "div",
        )
    )


_HLL_ROLLUP_TAIL = """
parts AS (
    SELECT region, c_custkey,
           h {div} 4503599627370496 AS bucket,
           h % 4503599627370496 AS w
    FROM base
),
regs AS (
    SELECT region, bucket,
           MAX(CASE WHEN w = 0 THEN 53
                    ELSE 53 - length(bin(w)) END) AS m
    FROM parts GROUP BY region, bucket
),
merged AS (
    SELECT 'GLOBAL' AS region, bucket, MAX(m) AS m
    FROM regs GROUP BY bucket
),
allregs AS (
    SELECT region, bucket, m FROM regs
    UNION ALL
    SELECT region, bucket, m FROM merged
),
rnames AS (
    SELECT DISTINCT region FROM base
    UNION ALL
    SELECT 'GLOBAL'
),
filled AS (
    SELECT rn.region, s.b AS bucket, COALESCE(a.m, 0) AS m
    FROM rnames rn CROSS JOIN spine s
    LEFT JOIN allregs a ON a.region = rn.region AND a.bucket = s.b
),
z AS (
    SELECT region,
           CAST(SUM(CAST((CAST(1 AS BIGINT) << (62 - m))
                    AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS zs
    FROM filled GROUP BY region
),
exact AS (
    SELECT region, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_exact
    FROM base GROUP BY region
    UNION ALL
    SELECT 'GLOBAL', CAST(COUNT(DISTINCT c_custkey) AS BIGINT) FROM base
)
SELECT z.region,
       CAST('0.7182725932495458' AS DOUBLE) * CAST(65536 AS DOUBLE)
         * CAST(4611686018427387904 AS DOUBLE) / {widez} AS hll_estimate,
       e.n_exact
FROM z JOIN exact e ON e.region = z.region"""


def _hll_rollup_sql(hash_expr: str, spine: str, div: str) -> str:
    return (
        "WITH base AS (SELECT r.r_name AS region, c.c_custkey, "
        + hash_expr
        + " AS h"
        " FROM orders o"
        " JOIN customer c ON c.c_custkey = o.o_custkey"
        " JOIN nation n ON n.n_nationkey = c.c_nationkey"
        " JOIN region r ON r.r_regionkey = n.n_regionkey),"
        " spine AS (" + spine + "),"
        + _HLL_ROLLUP_TAIL.format(div=div, widez=wide_dbl("z.zs"))
    )


@register(
    "agg_hll_merge_rollup",
    oracle=_hll_rollup_sql(
        "CAST(('0x' || substr(md5(CAST(c.c_custkey AS VARCHAR)), 1, 15))"
        " AS BIGINT)",
        "SELECT unnest(range(0, 256)) AS b",
        "//",
    ),
)
def agg_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY across rollup grains — the property that makes
    sketches the 100 TB answer to COUNT(DISTINCT) rollups: per-region
    register tables are built once from the facts, and the GLOBAL
    estimate is computed by MERGING the regional registers
    (``MAX(m) GROUP BY bucket``), never re-touching a fact row. That
    is exactly how a production cube maintains distinct-user counts
    at every grain from one sketch pass (re-aggregation, not
    re-scan). All arithmetic is the agg_hll_det machinery
    (portable md5 hash, log2-free rho, exact integer-shift harmonic
    sum, wide_dbl rendering), so every grain's estimate — INCLUDING
    the merged one — is hash-exact across engines, with the exact
    distinct riding along per grain for self-audit.

    Scale: facts are touched once (one partial-aggregable GROUP BY
    region×256-bucket); every further grain is algebra over ≤
    regions×256 register rows.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _hll_rollup_sql(
            "CAST(conv(substr(md5(CAST(c.c_custkey AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)",
            "SELECT id AS b FROM range(256)",
            "div",
        )
    )


_HLL_SETOP_TAIL = """
parts AS (
    SELECT seg,
           h {div} 4503599627370496 AS bucket,
           h % 4503599627370496 AS w
    FROM base
),
regs AS (
    SELECT seg, bucket,
           MAX(CASE WHEN w = 0 THEN 53
                    ELSE 53 - length(bin(w)) END) AS m
    FROM parts GROUP BY seg, bucket
),
unioned AS (
    SELECT 'UNION' AS seg, bucket, MAX(m) AS m
    FROM regs GROUP BY bucket
),
allregs AS (
    SELECT seg, bucket, m FROM regs
    UNION ALL
    SELECT seg, bucket, m FROM unioned
),
segnames AS (
    SELECT DISTINCT seg FROM base UNION ALL SELECT 'UNION'
),
filled AS (
    SELECT sn.seg, s.b AS bucket, COALESCE(a.m, 0) AS m
    FROM segnames sn CROSS JOIN spine s
    LEFT JOIN allregs a ON a.seg = sn.seg AND a.bucket = s.b
),
z AS (
    SELECT seg,
           CAST(SUM(CAST((CAST(1 AS BIGINT) << (62 - m))
                    AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS zs
    FROM filled GROUP BY seg
),
est AS (
    SELECT seg,
           CAST('0.7182725932495458' AS DOUBLE) * CAST(65536 AS DOUBLE)
             * CAST(4611686018427387904 AS DOUBLE) / {widez} AS e
    FROM z
),
wide AS (
    SELECT MAX(CASE WHEN seg = 'A' THEN e END) AS est_a,
           MAX(CASE WHEN seg = 'B' THEN e END) AS est_b,
           MAX(CASE WHEN seg = 'UNION' THEN e END) AS est_union
    FROM est
),
truth AS (
    SELECT CAST(COUNT(DISTINCT CASE WHEN seg = 'A' THEN c_custkey END)
                AS BIGINT) AS exact_a,
           CAST(COUNT(DISTINCT CASE WHEN seg = 'B' THEN c_custkey END)
                AS BIGINT) AS exact_b,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_union
    FROM base
),
ab AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
    FROM (
        SELECT c_custkey FROM base GROUP BY c_custkey
        HAVING COUNT(DISTINCT seg) = 2
    )
)
SELECT w.est_a, w.est_b, w.est_union,
       w.est_a + w.est_b - w.est_union AS est_intersection,
       t.exact_a, t.exact_b, t.exact_union, ab.exact_intersection
FROM wide w CROSS JOIN truth t CROSS JOIN ab"""


def _hll_setop_sql(hash_expr: str, spine: str, div: str) -> str:
    # cohorts are activity-year-derived so the overlap is PARTIAL
    # (customers active in both years) — an attribute-derived split
    # would be disjoint and a low-selectivity predicate makes one
    # cohort swallow the other; either way the intersection estimate
    # would be degenerate (the vacuous-oracle rule)
    return (
        "WITH base AS ("
        "SELECT 'A' AS seg, o.o_custkey AS c_custkey, "
        + hash_expr
        + " AS h FROM orders o"
        " WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'"
        " AND o.o_orderdate < TIMESTAMP '1997-01-01'"
        " UNION ALL "
        "SELECT 'B' AS seg, o.o_custkey AS c_custkey, "
        + hash_expr
        + " AS h FROM orders o"
        " WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'"
        " AND o.o_orderdate < TIMESTAMP '1998-01-01'),"
        " spine AS (" + spine + "),"
        + _HLL_SETOP_TAIL.format(div=div, widez=wide_dbl("z.zs"))
    )


@register(
    "agg_hll_set_algebra",
    oracle=_hll_setop_sql(
        "CAST(('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))"
        " AS BIGINT)",
        "SELECT unnest(range(0, 256)) AS b",
        "//",
    ),
)
def agg_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA on deterministic HLL registers: |A∪B| comes
    free from the register MAX-merge, and |A∩B| by inclusion–
    exclusion (est_a + est_b − est_union) — how audience-overlap
    questions ("how many buyers shop BOTH segments?") are answered
    at 100 TB without a COUNT DISTINCT over the pair. The cohorts are
    activity years (A = ordered in 1996, B = in 1997) so the overlap
    is PARTIAL by construction — a segment split is disjoint and a
    low-selectivity predicate makes one cohort swallow the other;
    both degenerate cases were hit and rejected while building this
    (the vacuous-oracle rule). The exact A/B/union/intersection
    counts ride along, so the sheet self-documents the estimator's
    error INCLUDING the inflated variance inclusion–exclusion is
    known for. Every number is the agg_hll_det fixed-point machinery
    — hash-exact both engines.

    Scale: one pass over facts builds both cohorts' registers
    (seg×bucket partial agg); union/intersection are algebra over
    512 register rows.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _hll_setop_sql(
            "CAST(conv(substr(md5(CAST(o.o_custkey AS STRING)), 1, 15),"
            " 16, 10) AS BIGINT)",
            "SELECT id AS b FROM range(256)",
            "div",
        )
    )


_GRUBBS_G = (
    "CAST(dev AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE))"
    " / sqrt(CAST(n AS DOUBLE)) / sqrt({widev})"
)

_GRUBBS_MOMS = """
moms AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS s,
           CAST(SUM(CAST(cents AS DECIMAL(19,0))
                    * CAST(cents AS DECIMAL(14,0)))
                AS DECIMAL(38,0)) AS q
    FROM daily
),
var_s AS (
    SELECT n, s,
           CAST(CAST(q AS DECIMAL(30,0)) * CAST(n AS DECIMAL(8,0))
                - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))
                AS DECIMAL(38,0)) AS nq_s2
    FROM moms
)"""


@register(
    "stats_grubbs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),"""
    + _GRUBBS_MOMS
    + """,
    peak AS (
        SELECT (MAX({'a': abs(v.n * dy.cents - v.s), 'b': -dy.d,
                     'c': dy.d, 'e': dy.cents})).c AS peak_day,
               (MAX({'a': abs(v.n * dy.cents - v.s), 'b': -dy.d,
                     'c': dy.d, 'e': dy.cents})).e AS peak_cents,
               (MAX({'a': abs(v.n * dy.cents - v.s), 'b': -dy.d,
                     'c': dy.d, 'e': dy.cents})).a AS dev
        FROM daily dy CROSS JOIN var_s v
    )
    SELECT v.n AS n_days,
           CAST(p.peak_day AS BIGINT) AS peak_day,
           CAST(p.peak_cents AS BIGINT) AS peak_cents,
           CAST(p.dev AS BIGINT) AS dev_scaled,
           """
    + _GRUBBS_G.format(widev=wide_dbl("v.nq_s2"))
    + """ AS grubbs_g
    FROM var_s v CROSS JOIN peak p
    WHERE v.n > 1
    """,
)
def stats_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-studentized-deviate statistic on the daily
    revenue series — the mean-based single-outlier screen beside
    dq_dixon_q's range ratio and dq_mad_outliers' robust fences: G =
    max|x − x̄| / s, reported for the most extreme day. Exactness by
    clearing denominators: the argmax runs on the INTEGER score
    |n·x − S| (identical ordering, no division), the peak is picked
    by the portable MAX(named-struct) argmax with a -day tie-break
    (the ts_m4_downsample construction), and G itself is the fixed
    written-order chain dev·√(n−1)/√n/√(nQ−S²) over exact integer
    moments (Q via the d(19)×d(14) decimal multiply that forces
    DuckDB's HUGEINT kernel; nQ−S² ~5e26 rendered through
    registry.wide_dbl). No verdict column — the t-based critical
    value is not portable arithmetic; G is the evidence, the
    threshold is policy.

    Scale: one partial-aggregable moment pass + one broadcast
    cross-join of two 1-row frames; WHERE n > 1 is the
    empty-in-empty-out guard (n = 1 would divide by √0).
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH daily AS (
            SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT)
                       div 86400 AS d,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),"""
        + _GRUBBS_MOMS
        + """,
        peak AS (
            SELECT MAX(named_struct(
                       'a', abs(v.n * dy.cents - v.s),
                       'b', -dy.d, 'c', dy.d, 'e', dy.cents)).c
                       AS peak_day,
                   MAX(named_struct(
                       'a', abs(v.n * dy.cents - v.s),
                       'b', -dy.d, 'c', dy.d, 'e', dy.cents)).e
                       AS peak_cents,
                   MAX(named_struct(
                       'a', abs(v.n * dy.cents - v.s),
                       'b', -dy.d, 'c', dy.d, 'e', dy.cents)).a
                       AS dev
            FROM daily dy CROSS JOIN var_s v
        )
        SELECT v.n AS n_days,
               CAST(p.peak_day AS BIGINT) AS peak_day,
               CAST(p.peak_cents AS BIGINT) AS peak_cents,
               CAST(p.dev AS BIGINT) AS dev_scaled,
               """
        + _GRUBBS_G.format(widev=wide_dbl("v.nq_s2"))
        + """ AS grubbs_g
        FROM var_s v CROSS JOIN peak p
        WHERE v.n > 1
        """
    )


_LOGREG_TAIL = """
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy
    FROM {base}
),
betas AS (
    SELECT n, sy,
           2 * (CAST(sxx AS DOUBLE)
                  * (2 * CAST(sy AS DOUBLE) - CAST(n AS DOUBLE))
                - CAST(sx AS DOUBLE)
                  * (2 * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta0,
           2 * (CAST(n AS DOUBLE)
                  * (2 * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE))
                - CAST(sx AS DOUBLE)
                  * (2 * CAST(sy AS DOUBLE) - CAST(n AS DOUBLE)))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta1
    FROM m WHERE n > 1
)
SELECT n, sy AS n_pos, beta0, beta1,
       CAST((SELECT COUNT(*) FROM {base} b CROSS JOIN betas
             WHERE beta0 + beta1 * CAST(b.x AS DOUBLE) > 0) AS BIGINT)
           AS n_pred_pos
FROM betas"""


@register(
    "ml_logreg_newton",
    oracle="""WITH base AS (
        SELECT CAST(ROUND(l_quantity) AS BIGINT) AS x,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),"""
    + _LOGREG_TAIL.format(base="base"),
)
def ml_logreg_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EXACT Newton/IRLS step of logistic regression from β = 0 —
    the distributed-GLM building block (a full fit is this step
    iterated; step one is special because p ≡ ½ makes the Hessian
    X'X/4 and the gradient X'(y−½), so β₁ = 4(X'X)⁻¹X'(y−½) is a
    CLOSED FORM over five integer moments). Intercept + one feature
    (quantity) predicting returns: β solves the 2×2 normal equations
    with halves cleared (A = 2Σy − n, B = 2Σxy − Σx keep everything
    integer), each β then ONE fixed-order double chain over exact
    sub-2^53 int64 factors — bit-identical on both engines, so the
    decision boundary count n_pred_pos (β₀ + β₁x > 0, a comparison of
    identical doubles) hash-checks exactly too.

    Scale: one partial-aggregable moment pass over the fact table +
    one broadcast-stats scoring pass — the exact shape a 100 TB GLM
    iteration runs (moments shuffle 5 numbers, never rows). The
    int64→double conversions are single IEEE roundings at any
    magnitude (the repo's integer-sums rule); the n·Sxx products are
    evaluated IN DOUBLES so no int64 overflow exists at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("x"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).createOrReplaceTempView("logreg_base")
    return spark.sql(
        "WITH " + _LOGREG_TAIL.format(base="logreg_base").lstrip()
    )


_BM_RANKS = """
cells AS (
    SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM {base} GROUP BY g, v
),
comb AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cc FROM cells GROUP BY v),
combr AS (
    SELECT v, 2 * SUM(cc) OVER (ORDER BY v) - cc + 1 AS rc2 FROM comb
),
grpr AS (
    SELECT g, v, c,
           2 * SUM(c) OVER (PARTITION BY g ORDER BY v) - c + 1 AS rg2
    FROM cells
),
j AS (
    SELECT gr.g, gr.v, gr.c, cr.rc2, gr.rg2
    FROM grpr gr JOIN combr cr ON cr.v = gr.v
),
tots AS (
    SELECT g, CAST(SUM(c) AS BIGINT) AS n_k,
           CAST(SUM(c * rc2) AS BIGINT) AS u_k
    FROM j GROUP BY g
),
ecells AS (
    SELECT j.g, j.v, j.c,
           t.n_k * (j.rc2 - j.rg2) + t.n_k * (t.n_k + 1) - t.u_k AS e
    FROM j JOIN tots t ON t.g = j.g
),
"""

_BM_FINAL = """
wide AS (
    SELECT MAX(CASE WHEN s.g = 0 THEN CAST(s.n_k AS DOUBLE) END) AS nx,
           MAX(CASE WHEN s.g = 1 THEN CAST(s.n_k AS DOUBLE) END) AS ny,
           MAX(CASE WHEN s.g = 0 THEN CAST(s.u_k AS DOUBLE) END) AS ux,
           MAX(CASE WHEN s.g = 1 THEN CAST(s.u_k AS DOUBLE) END) AS uy,
           MAX(CASE WHEN f.g = 0 THEN f.se END) AS sex,
           MAX(CASE WHEN f.g = 1 THEN f.se END) AS sey
    FROM tots s JOIN folds f ON f.g = s.g
)
SELECT CAST(nx AS BIGINT) AS n_control,
       CAST(ny AS BIGINT) AS n_treated,
       (nx * uy - ny * ux)
         / (2 * (nx + ny)
            * sqrt(sex / (4 * nx * (nx - 1))
                   + sey / (4 * ny * (ny - 1)))) AS bm_stat,
       (uy - ny * (ny + 1)) / (2 * ny * nx) AS p_hat
FROM wide WHERE nx > 1 AND ny > 1"""


@register(
    "stats_brunner_munzel",
    oracle="WITH base AS ("
    "    SELECT CAST(ROUND(l_quantity) AS BIGINT) AS v,"
    "           CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS g"
    "    FROM lineitem"
    "),"
    + _BM_RANKS.format(base="base")
    + """
folds AS (
    SELECT g,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                   list(CAST(c AS DOUBLE)
                        * (CAST(e AS DOUBLE) * CAST(e AS DOUBLE))
                        ORDER BY v)),
               (a, x) -> a + x) AS se
    FROM ecells GROUP BY g
),"""
    + _BM_FINAL,
)
def stats_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel generalized Wilcoxon test (does discounting
    shift the quantity distribution?) — the rank test that, unlike
    Mann-Whitney, stays valid under UNEQUAL variances and ties (the
    Behrens-Fisher situation nonparametrics actually meet in
    production A/B data). Statistic per Brunner & Munzel (2000), the
    scipy.stats.brunnermunzel formulation: combined vs within-group
    midranks, per-group rank variances S², W = nx·ny·(R̄₂−R̄₁) /
    ((nx+ny)·√(nx·S₁²+ny·S₂²)), plus the relative effect p̂ =
    P(X<Y)+½P(X=Y).

    Portability: midranks live in ×2 integer units (2·midrank =
    2·cum_before + c + 1); the centered deviations E_i = n_k(rc2−rg2)
    + n_k(n_k+1) − U_k are EXACT int64 at any realistic scale (ΣE=0
    verified algebraically); the variance sums fold c·E² as doubles
    in FIXED value order over the 50-cell quantity domain (the
    ts_dtw/list-fold pattern — exact operands, identical fold order ⇒
    identical bits, no decimal-width cliff at any scale); the final
    statistic is one fixed-order chain.

    Scale: everything past the (g,v) cell aggregation is 100-row
    arithmetic; the cell agg is one partial-aggregable pass. The
    global cumulative window runs over ≤50 quantity values
    (BOUNDED_GRAIN).
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("v"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("g"),
    ).createOrReplaceTempView("bm_base")
    return spark.sql(
        "WITH "
        + _BM_RANKS.format(base="bm_base").lstrip()
        + """
folds AS (
    SELECT g,
           aggregate(
               transform(
                   sort_array(collect_list(struct(v, c, e))),
                   s -> CAST(s.c AS DOUBLE)
                        * (CAST(s.e AS DOUBLE) * CAST(s.e AS DOUBLE))),
               CAST(0 AS DOUBLE), (a, x) -> a + x) AS se
    FROM ecells GROUP BY g
),"""
        + _BM_FINAL
    )


@register(
    "ml_als_rank1_step",
    oracle="""
    WITH r AS (
        SELECT l_suppkey AS u, l_partkey AS p,
               CAST(ROUND(l_quantity) AS BIGINT) AS rt
        FROM lineitem
    ),
    solved AS (
        SELECT u,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(rt * (8 + p % 7)) AS BIGINT) AS num8,
               CAST(64 + SUM((8 + p % 7) * (8 + p % 7)) AS BIGINT)
                   AS den64,
               8 * CAST(SUM(rt * (8 + p % 7)) AS DOUBLE)
                 / CAST(64 + SUM((8 + p % 7) * (8 + p % 7)) AS DOUBLE)
                   AS factor
        FROM r GROUP BY u
    )
    SELECT u AS suppkey, n_items, num8, den64, factor
    FROM solved
    ORDER BY factor DESC, suppkey
    LIMIT 15
    """,
)
def ml_als_rank1_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EXACT rank-1 ALS half-step — the matrix-factorization
    building block (recommender family): with item factors fixed, the
    ridge-regularized user solve u_i = Σ_j r_ij·x_j / (λ + Σ_j x_j²)
    is a CLOSED FORM per user, computable as one partial-aggregable
    pass (a full ALS fit alternates this shape user↔item; at 100 TB
    each half-step shuffles two numbers per entity, never rows — the
    reason ALS beats SGD on clusters).

    Portability: item factors are EIGHTHS x_j = (8 + p%7)/8, so the
    numerator and ridge denominator clear to pure INT64 sums (num8 =
    Σr·8x, den64 = 64λ + Σ(8x)²) and each factor is ONE fixed-order
    double chain — bit-identical both engines, legal ORDER BY key for
    the top-15 ranking (λ = 1).

    Scale: one groupBy(user) partial agg + TakeOrdered(15); the
    item half-step is the same shape keyed by item.
    """
    li = load_table(spark, sf_dir, "lineitem")
    solved = (
        li.select(
            F.col("l_suppkey").alias("u"),
            F.col("l_partkey").alias("p"),
            F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("rt"),
        )
        .groupBy("u")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.expr("rt * (8 + p % 7)")).cast("long").alias("num8"),
            (
                F.lit(64)
                + F.sum(F.expr("(8 + p % 7) * (8 + p % 7)"))
            )
            .cast("long")
            .alias("den64"),
        )
        .select(
            "*",
            F.expr(
                "8 * CAST(num8 AS DOUBLE) / CAST(den64 AS DOUBLE)"
            ).alias("factor"),
        )
    )
    return (
        solved.select(
            F.col("u").alias("suppkey"),
            "n_items",
            "num8",
            "den64",
            "factor",
        )
        .orderBy(F.desc("factor"), "suppkey")
        .limit(15)
    )


_QINI_TAIL = """
cells AS (
    SELECT bucket, t,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS r
    FROM {scored} GROUP BY bucket, t
),
buckets AS (
    SELECT bucket,
           CAST(COALESCE(MAX(CASE WHEN t = 1 THEN n END), 0) AS BIGINT)
               AS nt,
           CAST(COALESCE(MAX(CASE WHEN t = 0 THEN n END), 0) AS BIGINT)
               AS nc,
           CAST(COALESCE(MAX(CASE WHEN t = 1 THEN r END), 0) AS BIGINT)
               AS rt,
           CAST(COALESCE(MAX(CASE WHEN t = 0 THEN r END), 0) AS BIGINT)
               AS rc
    FROM cells GROUP BY bucket
),
cum AS (
    SELECT bucket,
           SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
           SUM(rt) OVER w AS crt, SUM(rc) OVER w AS crc
    FROM buckets
    WINDOW w AS (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(cnt AS BIGINT) AS n_treated,
       CAST(cnc AS BIGINT) AS n_control,
       CAST(crt AS BIGINT) AS resp_treated,
       CAST(crc AS BIGINT) AS resp_control,
       CAST(crt * cnc - crc * cnt AS BIGINT) AS qini_num,
       CAST(crt AS DOUBLE)
         - CAST(crc AS DOUBLE) * CAST(cnt AS DOUBLE)
           / CAST(GREATEST(1, cnc) AS DOUBLE) AS qini
FROM cum ORDER BY bucket"""


@register(
    "ml_uplift_qini",
    oracle="""
    WITH scored AS (
        SELECT CAST(('0x' || substr(md5('q:'
                    || CAST(l_orderkey AS VARCHAR) || ':'
                    || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
                // 144115188075855872 AS bucket,
               CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS t,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),"""
    + _QINI_TAIL.format(scored="scored"),
)
def ml_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve — the uplift-model evaluation standard
    (ml_uplift_segments ranks segments; this op evaluates a SCORE):
    cumulative incremental responders at each score decile,
    Qini(k) = Rt(k) − Rc(k)·Nt(k)/Nc(k) over 8 score octiles
    (power-of-two range buckets of the 60-bit hash — a ×10 decile
    product would overflow int64), published both as the exact
    integer cross-product Rt·Nc − Rc·Nt (the curve's sign/ordering
    carrier, overflow-free to ~10^9 rows/bucket) and as the double
    (one fixed-order chain). The 'model' is a deterministic 60-bit
    md5 score (the portable-hash recipe) bucketed by range — a
    uniform random model, so the curve hugging zero is itself the
    sanity check; swap any real score column in production.

    Scale: one (bucket, treatment) partial agg — octiles come from
    RANGE-bucketing the uniform hash (a pure projection; no global
    sort/ntile anywhere), the cumulative pass runs over 8 rows
    (BOUNDED_GRAIN).
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        F.expr(
            "conv(substr(md5(concat('q:', CAST(l_orderkey AS STRING),"
            " ':', CAST(l_linenumber AS STRING))), 1, 15), 16, 10)"
            " div 144115188075855872"
        ).alias("bucket"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("t"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).createOrReplaceTempView("qini_scored")
    return spark.sql(
        "WITH " + _QINI_TAIL.format(scored="qini_scored").lstrip()
    )


_TREE2_ORACLE = """
    WITH rows_ AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS d
        FROM lineitem
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s FROM rows_),
    melt AS (SELECT 'q' AS f, q AS v, y FROM rows_
             UNION ALL SELECT 'd', d, y FROM rows_),
    vs AS (SELECT f, v, CAST(COUNT(*) AS BIGINT) AS c,
                  CAST(SUM(y) AS BIGINT) AS sy
           FROM melt GROUP BY 1, 2),
    run AS (
        SELECT f, v,
               SUM(c) OVER w AS nl, SUM(sy) OVER w AS sl,
               MAX(v) OVER (PARTITION BY f) AS mx
        FROM vs
        WINDOW w AS (PARTITION BY f ORDER BY v ROWS UNBOUNDED PRECEDING)
    ),
    cand AS (
        SELECT f, v, nl, sl,
               CAST(t.n AS DECIMAL(19,0)) * CAST(sl AS DECIMAL(19,0))
               - CAST(nl AS DECIMAL(19,0)) * CAST(t.s AS DECIMAL(19,0)) AS A,
               nl * (t.n - nl) AS den
        FROM run, tot t WHERE v < mx
    ),
    scored AS (
        SELECT f, v,
               (CAST(CAST((A - A % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((A % 1000000000000000000 - A % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(A % 1000000000 AS BIGINT) AS DOUBLE)) * (CAST(CAST((A - A % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((A % 1000000000000000000 - A % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(A % 1000000000 AS BIGINT) AS DOUBLE)) / CAST(den AS DOUBLE) AS g
        FROM cand
    ),
    pick1 AS (
        SELECT (MIN(STRUCT_PACK(a := -g, b := f, c := v))).b AS rf,
               (MIN(STRUCT_PACK(a := -g, b := f, c := v))).c AS rt
        FROM scored
    ),
    sided AS (
        SELECT r.y, r.q, r.d, p.rf, p.rt,
               CASE WHEN (p.rf = 'q' AND r.q <= p.rt)
                      OR (p.rf = 'd' AND r.d <= p.rt)
                    THEN 'L' ELSE 'R' END AS side
        FROM rows_ r, pick1 p
    ),
    tot2 AS (SELECT side, CAST(COUNT(*) AS BIGINT) AS n2,
                    CAST(SUM(y) AS BIGINT) AS s2
             FROM sided GROUP BY 1),
    melt2 AS (SELECT side, 'q' AS f, q AS v, y FROM sided
              UNION ALL SELECT side, 'd', d, y FROM sided),
    vs2 AS (SELECT side, f, v, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(y) AS BIGINT) AS sy
            FROM melt2 GROUP BY 1, 2, 3),
    run2 AS (
        SELECT side, f, v,
               SUM(c) OVER w AS nl, SUM(sy) OVER w AS sl,
               MAX(v) OVER (PARTITION BY side, f) AS mx
        FROM vs2
        WINDOW w AS (PARTITION BY side, f ORDER BY v
                     ROWS UNBOUNDED PRECEDING)
    ),
    cand2 AS (
        SELECT r.side, r.f, r.v, r.nl, r.sl,
               CAST(t.n2 AS DECIMAL(19,0)) * CAST(r.sl AS DECIMAL(19,0))
               - CAST(r.nl AS DECIMAL(19,0))
                 * CAST(t.s2 AS DECIMAL(19,0)) AS A,
               r.nl * (t.n2 - r.nl) AS den
        FROM run2 r JOIN tot2 t ON t.side = r.side WHERE r.v < r.mx
    ),
    scored2 AS (
        SELECT side, f, v,
               (CAST(CAST((A - A % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((A % 1000000000000000000 - A % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(A % 1000000000 AS BIGINT) AS DOUBLE)) * (CAST(CAST((A - A % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((A % 1000000000000000000 - A % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(A % 1000000000 AS BIGINT) AS DOUBLE)) / CAST(den AS DOUBLE) AS g
        FROM cand2
    ),
    pick2 AS (
        SELECT side,
               (MIN(STRUCT_PACK(a := -g, b := f, c := v))).b AS lf,
               (MIN(STRUCT_PACK(a := -g, b := f, c := v))).c AS lt
        FROM scored2 GROUP BY side
    ),
    leaves AS (
        SELECT s.side, s.rf, s.rt, p.lf, p.lt, s.y,
               CASE WHEN p.lf IS NULL THEN 'A'
                    WHEN (p.lf = 'q' AND s.q <= p.lt)
                      OR (p.lf = 'd' AND s.d <= p.lt)
                    THEN 'L' ELSE 'R' END AS sub
        FROM sided s LEFT JOIN pick2 p ON p.side = s.side
    ),
    agg AS (
        SELECT side || sub AS leaf,
               MIN(rf) AS root_feat, CAST(MIN(rt) AS BIGINT) AS root_thr,
               MIN(lf) AS leaf_feat, CAST(MIN(lt) AS BIGINT) AS leaf_thr,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0))
                   AS sum_y,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM leaves GROUP BY 1
    )
    SELECT leaf, root_feat, root_thr, leaf_feat, leaf_thr, n_rows,
           (CAST(CAST((CAST(sum_y AS DECIMAL(38,0)) - CAST(sum_y AS DECIMAL(38,0)) % 1000000000000000000) / 1000000000000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000000000000 AS DOUBLE) + CAST(CAST((CAST(sum_y AS DECIMAL(38,0)) % 1000000000000000000 - CAST(sum_y AS DECIMAL(38,0)) % 1000000000) / 1000000000 AS BIGINT) AS DOUBLE) * CAST(1000000000 AS DOUBLE) + CAST(CAST(CAST(sum_y AS DECIMAL(38,0)) % 1000000000 AS BIGINT) AS DOUBLE)) / CAST(cnt AS DOUBLE) AS pred
    FROM agg
"""


@register("ml_regression_tree_depth2", oracle=_TREE2_ORACLE)
def ml_regression_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact depth-2 CART regression tree — the ensemble family\'s
    next rung above `ml_decision_stump`: a root split then the best
    split INSIDE each side, chosen by exact variance-reduction
    algebra. The key identity making a greedy tree hash-exact: a
    node\'s SSE gain needs only integer sums within the node —
    gain ∝ A²/(n_l·(n_s−n_l)) with A = n_s·Σ_left(y) − n_l·S_s, a
    DECIMAL(38,0) integer — so feature/threshold ranking is a
    fixed-order float chain over `registry.wide_dbl` renderings
    (bit-identical both engines), never a sum of per-row doubles.
    Thresholds enumerate each feature\'s value domain via cumulative
    counts partitioned by feature (no single-partition window); ties
    break (gain desc, feature asc, threshold asc) through the
    portable struct-argmin. Leaves report n and the exact-mean
    prediction (wide_dbl single division). A side whose features are
    constant keeps leaf \'A\' (no second split) — the LEFT JOIN path.
    Split choices are pinned against a numpy replay in
    tests/test_cross_consistency.py (shared-derivation rule).

    Scale: two passes of (feature × value) partial aggregation — the
    classic distributed-histogram tree construction (same shape
    XGBoost\'s approx mode uses); candidate frames are value-domain-
    sized, not row-sized.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select(
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("y"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("d"),
    )
    tot = rows.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    melt = rows.selectExpr("\'q\' AS f", "q AS v", "y").unionAll(
        rows.selectExpr("\'d\' AS f", "d AS v", "y")
    )
    vs = melt.groupBy("f", "v").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("y").cast("long").alias("sy"),
    )
    wrun = Window.partitionBy("f").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("f")
    run = vs.select(
        "f",
        "v",
        F.sum("c").over(wrun).alias("nl"),
        F.sum("sy").over(wrun).alias("sl"),
        F.max("v").over(wall).alias("mx"),
    )
    a_expr = (
        "CAST(n AS DECIMAL(19,0)) * CAST(sl AS DECIMAL(19,0))"
        " - CAST(nl AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))"
    )
    cand = (
        run.where(F.col("v") < F.col("mx"))
        .crossJoin(F.broadcast(tot))
        .withColumn("A", F.expr(a_expr))
        .withColumn("den", F.expr("nl * (n - nl)"))
    )
    g_expr = "%s * %s / CAST(den AS DOUBLE)" % (wide_dbl("A"), wide_dbl("A"))
    scored = cand.withColumn("g", F.expr(g_expr))

    def argmin_struct(df, keys):
        p = F.min(
            F.struct(
                (-F.col("g")).alias("a"),
                F.col("f").alias("b"),
                F.col("v").alias("c"),
            )
        ).alias("p")
        return df.groupBy(*keys).agg(p) if keys else df.agg(p)

    pick1 = argmin_struct(scored, []).select(
        F.col("p.b").alias("rf"), F.col("p.c").alias("rt")
    )
    sided = rows.crossJoin(F.broadcast(pick1)).withColumn(
        "side",
        F.expr(
            "CASE WHEN (rf = \'q\' AND q <= rt) OR (rf = \'d\' AND d <= rt)"
            " THEN \'L\' ELSE \'R\' END"
        ),
    )
    tot2 = sided.groupBy("side").agg(
        F.count("*").cast("long").alias("n2"),
        F.sum("y").cast("long").alias("s2"),
    )
    melt2 = sided.selectExpr("side", "\'q\' AS f", "q AS v", "y").unionAll(
        sided.selectExpr("side", "\'d\' AS f", "d AS v", "y")
    )
    vs2 = melt2.groupBy("side", "f", "v").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("y").cast("long").alias("sy"),
    )
    wrun2 = Window.partitionBy("side", "f").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall2 = Window.partitionBy("side", "f")
    run2 = vs2.select(
        "side",
        "f",
        "v",
        F.sum("c").over(wrun2).alias("nl"),
        F.sum("sy").over(wrun2).alias("sl"),
        F.max("v").over(wall2).alias("mx"),
    )
    a2_expr = (
        "CAST(n2 AS DECIMAL(19,0)) * CAST(sl AS DECIMAL(19,0))"
        " - CAST(nl AS DECIMAL(19,0)) * CAST(s2 AS DECIMAL(19,0))"
    )
    cand2 = (
        run2.where(F.col("v") < F.col("mx"))
        .join(tot2, "side")
        .withColumn("A", F.expr(a2_expr))
        .withColumn("den", F.expr("nl * (n2 - nl)"))
    )
    scored2 = cand2.withColumn("g", F.expr(g_expr))
    pick2 = argmin_struct(scored2, ["side"]).select(
        "side", F.col("p.b").alias("lf"), F.col("p.c").alias("lt")
    )
    leaves = sided.join(pick2, "side", "left").withColumn(
        "sub",
        F.expr(
            "CASE WHEN lf IS NULL THEN \'A\'"
            " WHEN (lf = \'q\' AND q <= lt) OR (lf = \'d\' AND d <= lt)"
            " THEN \'L\' ELSE \'R\' END"
        ),
    )
    agg = leaves.groupBy("side", "sub").agg(
        F.min("rf").alias("root_feat"),
        F.min("rt").cast("long").alias("root_thr"),
        F.min("lf").alias("leaf_feat"),
        F.min("lt").cast("long").alias("leaf_thr"),
        F.count("*").cast("long").alias("n_rows"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0))").alias(
            "sum_y"
        ),
        F.count("*").cast("long").alias("cnt"),
    )
    pred_expr = "%s / CAST(cnt AS DOUBLE)" % wide_dbl(
        "CAST(sum_y AS DECIMAL(38,0))"
    )
    return agg.select(
        F.concat("side", "sub").alias("leaf"),
        "root_feat",
        "root_thr",
        "leaf_feat",
        "leaf_thr",
        "n_rows",
        F.expr(pred_expr).alias("pred"),
    )


@register(
    "stats_sprt_sequential",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(SUM(CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 2 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS t
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT strftime(d, '%Y-%m-%d') AS day, s, t,
               SUM(s * 95310 + (t - s) * (-105361)) OVER (
                   ORDER BY d ROWS UNBOUNDED PRECEDING) AS llr
        FROM daily
    ),
    crossing AS (
        SELECT MIN(CASE WHEN llr >= 2944439 OR llr <= -2944439
                        THEN day END) AS dday
        FROM cum
    )
    SELECT c.day, c.s AS successes, c.t AS trials,
           CAST(c.llr AS BIGINT) AS cum_llr_micro,
           x.dday AS decision_day,
           CASE WHEN x.dday IS NULL THEN 'continue'
                WHEN (SELECT llr FROM cum WHERE day = x.dday) >= 2944439
                THEN 'accept_h1' ELSE 'accept_h0' END AS decision
    FROM cum c, crossing x
    """,
)
def stats_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's SEQUENTIAL probability ratio test (SPRT) — the
    always-valid sequential A/B method: monitor the cumulative
    log-likelihood ratio after every day's batch and stop the moment
    it crosses ±ln((1−β)/α), with Type-I/II error guaranteed by
    construction no matter when you peek (the property fixed-horizon
    z-tests lose under continuous monitoring). Bernoulli H0 p=0.5 vs
    H1 p=0.55 over the even-cents indicator; the per-observation LLR
    increments and the ±2.944439 boundary are EXACT integer
    micro-units precomputed as literals (the string-literal-constant
    rule — ln() is not portable, r3), so the whole trajectory is an
    int64 cumulative sum and the stopping day is an exact window
    argmin. Every day reports its LLR plus the sticky decision.

    Scale: day-grain rollup first (distributed), then an O(days)
    bounded cumulative window — the standard calendar-series shape.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.expr("CAST(date_trunc('day', ts) AS DATE)").alias("d"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 2 = 0"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("s"),
            F.count("*").cast("long").alias("t"),
        )
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("s").alias("successes"),
        F.col("t").alias("trials"),
        F.sum(
            F.col("s") * F.lit(95310)
            + (F.col("t") - F.col("s")) * F.lit(-105361)
        )
        .over(wcum)
        .cast("long")
        .alias("cum_llr_micro"),
    )
    crossing = cum.agg(
        F.min(
            F.when(
                (F.col("cum_llr_micro") >= 2944439)
                | (F.col("cum_llr_micro") <= -2944439),
                F.col("day"),
            )
        ).alias("dday")
    )
    # Order-independent decision-LLR resolution (r9, advice fix): a
    # global MAX over the (at most one) crossing-day row always yields
    # exactly one row — NULL when no crossing — unlike the previous
    # unionAll(null-row).limit(1), whose row choice depended on
    # physical fetch order under GlobalLimit-over-Union.
    dec_llr = (
        cum.join(F.broadcast(crossing), F.col("day") == F.col("dday"))
        .agg(F.max("cum_llr_micro").cast("long").alias("dec_llr"))
    )
    return (
        cum.crossJoin(F.broadcast(crossing))
        .crossJoin(F.broadcast(dec_llr))
        .select(
            "day",
            "successes",
            "trials",
            "cum_llr_micro",
            F.col("dday").alias("decision_day"),
            F.when(F.col("dday").isNull(), F.lit("continue"))
            .when(F.col("dec_llr") >= 2944439, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
        )
    )


_GQ_SQL = """
    WITH daily AS (
        SELECT {DAYNUM} AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) {IDIV} 10000
                   AS y
        FROM orders GROUP BY 1
    ),
    bounds AS (
        SELECT MIN(d) AS dmin, MAX(d) AS dmax,
               (MAX(d) - MIN(d) + 1) {IDIV} 3 AS cut
        FROM daily
    ),
    seg AS (
        SELECT CASE WHEN d <= dmin + cut - 1 THEN 1
                    WHEN d >= dmax - cut + 1 THEN 2 END AS s,
               d - dmin AS x, y
        FROM daily, bounds
        WHERE d <= dmin + cut - 1 OR d >= dmax - cut + 1
    ),
    mom AS (
        SELECT s,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                   AS syy
        FROM seg GROUP BY s
    ),
    numer AS (
        SELECT s, n, sx, sy,
               CAST(CAST(n AS DECIMAL(38,0)) * sxx
                    - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))
                   AS sxx_n,
               CAST(CAST(n AS DECIMAL(38,0)) * sxy
                    - CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))
                   AS sxy_n,
               CAST(CAST(n AS DECIMAL(38,0)) * syy
                    - CAST(sy AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))
                   AS syy_n
        FROM mom
    ),
    ssr AS (
        SELECT s, n, sxx_n, sxy_n,
               CAST(syy_n * sxx_n - sxy_n * sxy_n AS DECIMAL(38,0)) AS nk
        FROM numer
    ),
    wide AS (
        SELECT MAX(CASE WHEN s = 1 THEN n END) AS n1,
               MAX(CASE WHEN s = 2 THEN n END) AS n2,
               MAX(CASE WHEN s = 1 THEN sxx_n END) AS sxx1,
               MAX(CASE WHEN s = 2 THEN sxx_n END) AS sxx2,
               MAX(CASE WHEN s = 1 THEN sxy_n END) AS sxy1,
               MAX(CASE WHEN s = 2 THEN sxy_n END) AS sxy2,
               MAX(CASE WHEN s = 1 THEN nk END) AS nk1,
               MAX(CASE WHEN s = 2 THEN nk END) AS nk2
        FROM ssr
    )
    SELECT n1, n2,
           CAST(CAST(sxy1 AS BIGINT) AS DOUBLE)
               / CAST(CAST(sxx1 AS BIGINT) AS DOUBLE) AS slope1,
           CAST(CAST(sxy2 AS BIGINT) AS DOUBLE)
               / CAST(CAST(sxx2 AS BIGINT) AS DOUBLE) AS slope2,
           ({WNK2} * CAST(CAST(n1 * CAST(sxx1 AS BIGINT) * (n1 - 2)
                              AS BIGINT) AS DOUBLE))
               / ({WNK1} * CAST(CAST(n2 * CAST(sxx2 AS BIGINT) * (n2 - 2)
                                    AS BIGINT) AS DOUBLE)) AS f_gq
    FROM wide
    WHERE n1 > 2 AND n2 > 2 AND CAST(sxx1 AS BIGINT) > 0
      AND CAST(sxx2 AS BIGINT) > 0 AND nk1 > 0
"""


@register(
    "stats_goldfeld_quandt",
    oracle=_GQ_SQL.format(
        DAYNUM="CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'"
        " AS BIGINT)",
        IDIV="//",
        WNK1=wide_dbl("nk1"),
        WNK2=wide_dbl("nk2"),
    ),
)
def stats_goldfeld_quandt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOLDFELD-QUANDT heteroskedasticity test over the daily-revenue
    trend: fit OLS (y = daily revenue in hundred-dollar units, x =
    day offset) separately on the LOW and HIGH calendar thirds and
    compare residual variances, F = (SSR2/df2)/(SSR1/df1) — the
    classic pre-modeling diagnostic (variance growing with the level
    breaks every equal-weight regression downstream). Exact
    arithmetic throughout the distributed part: integer day grain,
    SSR numerators via the closed form SSR·n·Sxx = Syy_n·Sxx_n −
    Sxy_n² over DECIMAL(38) moments (the d19×d19 per-row square
    forces DuckDB's HUGEINT kernel, r4 note), and the final F as a
    fixed-order float chain over wide_dbl-rendered decimals and
    int64→double single roundings (both immune rules, r3/r4).
    Calendar split points use integer floor division on positive
    spans (portable), NOT ntile — no global window anywhere.

    Scale: day-grain rollup is partial-aggregable; everything after
    is O(1) rows. Magnitudes are calendar-bounded: hundred-dollar
    daily units keep Syy_n·Sxx_n < 9e33 (the wide_dbl envelope)
    through ~100x the sf0.1 fixture.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _GQ_SQL.format(
            DAYNUM="CAST(datediff(CAST(o_orderdate AS DATE),"
            " DATE '1970-01-01') AS BIGINT)",
            IDIV="div",
            WNK1=wide_dbl("nk1"),
            WNK2=wide_dbl("nk2"),
        )
    )


_LDA_SQL = """
    WITH feat AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2
        FROM lineitem
    ),
    mom AS (
        SELECT g,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1,
               CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(x1 * x1) AS BIGINT) AS q11,
               CAST(SUM(x1 * x2) AS BIGINT) AS q12,
               CAST(SUM(x2 * x2) AS BIGINT) AS q22
        FROM feat GROUP BY g
    ),
    wide AS (
        SELECT MAX(CASE WHEN g = 0 THEN n END) AS n0,
               MAX(CASE WHEN g = 1 THEN n END) AS n1,
               MAX(CASE WHEN g = 0 THEN s1 END) AS s1_0,
               MAX(CASE WHEN g = 1 THEN s1 END) AS s1_1,
               MAX(CASE WHEN g = 0 THEN s2 END) AS s2_0,
               MAX(CASE WHEN g = 1 THEN s2 END) AS s2_1,
               MAX(CASE WHEN g = 0 THEN q11 END) AS q11_0,
               MAX(CASE WHEN g = 1 THEN q11 END) AS q11_1,
               MAX(CASE WHEN g = 0 THEN q12 END) AS q12_0,
               MAX(CASE WHEN g = 1 THEN q12 END) AS q12_1,
               MAX(CASE WHEN g = 0 THEN q22 END) AS q22_0,
               MAX(CASE WHEN g = 1 THEN q22 END) AS q22_1
        FROM mom
    ),
    means AS (
        SELECT n0, n1,
               CAST(s1_0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m1_0,
               CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1_1,
               CAST(s2_0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m2_0,
               CAST(s2_1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m2_1,
               s1_0, s1_1, s2_0, s2_1,
               q11_0, q11_1, q12_0, q12_1, q22_0, q22_1
        FROM wide WHERE n0 > 1 AND n1 > 1
    ),
    scatter AS (
        SELECT n0, n1, m1_0, m1_1, m2_0, m2_1,
               (CAST(q11_0 AS DOUBLE) - CAST(s1_0 AS DOUBLE) * m1_0)
             + (CAST(q11_1 AS DOUBLE) - CAST(s1_1 AS DOUBLE) * m1_1)
                   AS sw11,
               (CAST(q12_0 AS DOUBLE) - CAST(s1_0 AS DOUBLE) * m2_0)
             + (CAST(q12_1 AS DOUBLE) - CAST(s1_1 AS DOUBLE) * m2_1)
                   AS sw12,
               (CAST(q22_0 AS DOUBLE) - CAST(s2_0 AS DOUBLE) * m2_0)
             + (CAST(q22_1 AS DOUBLE) - CAST(s2_1 AS DOUBLE) * m2_1)
                   AS sw22
        FROM means
    ),
    solved AS (
        SELECT n0, n1, sw11, sw12, sw22,
               m1_1 - m1_0 AS d1,
               m2_1 - m2_0 AS d2,
               sw22 * (m1_1 - m1_0) - sw12 * (m2_1 - m2_0) AS w1,
               sw11 * (m2_1 - m2_0) - sw12 * (m1_1 - m1_0) AS w2
        FROM scatter
    )
    SELECT n0, n1, w1, w2,
           ((w1 * d1 + w2 * d2) * (w1 * d1 + w2 * d2))
               / ((w1 * w1) * sw11 + (2.0 * w1) * (w2 * sw12)
                  + (w2 * w2) * sw22) AS fisher_j
    FROM solved
    WHERE (w1 * w1) * sw11 + (2.0 * w1) * (w2 * sw12)
          + (w2 * w2) * sw22 > 0
"""


@register("ml_lda_fisher", oracle=_LDA_SQL)
def ml_lda_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISHER linear discriminant (2-class LDA direction) on the
    returned-vs-kept lineitem population over (quantity, discount):
    w ∝ Sw⁻¹(μ₁−μ₀) via the closed-form 2×2 adjugate — the classic
    supervised projection every churn/fraud feature pipeline computes
    before logistic refinement, plus Fisher's criterion J =
    (wᵀd)²/(wᵀSw·w), the separation score itself. The distributed
    part is six exact int64 moments per class (x ≤ 50, x² ≤ 2500 —
    partial-aggregable, overflow-free to ~1e14 rows); everything
    after is an O(1) fixed-order float chain over single-rounded
    int64→double casts, spelled as IDENTICAL SQL text on both engines
    (each op correctly rounded + same order = same bits). Guarded
    n>1 per class and positive denominator (empty-in, empty-out).

    Independent replay pin: tests/test_cross_consistency.py computes
    w and J from the raw columns with numpy's lstsq-free textbook
    formulas — the audit-required check for shared-derivation ops.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LDA_SQL)


_PVM_SQL = """
    WITH yr AS (
        SELECT (MIN({YEARX}) + MAX({YEARX})) {IDIV} 2 AS pivot
        FROM orders
    ),
    facts AS (
        SELECT p.p_brand AS brand,
               CASE WHEN {YEARO} <= yr.pivot THEN 1 ELSE 2 END AS period,
               CAST(l.l_quantity AS BIGINT) AS q,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS r
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        CROSS JOIN yr
    ),
    agg AS (
        SELECT brand, period,
               CAST(SUM(q) AS BIGINT) AS q,
               CAST(SUM(r) AS BIGINT) AS r
        FROM facts GROUP BY brand, period
    ),
    wide AS (
        SELECT brand,
               MAX(CASE WHEN period = 1 THEN q END) AS q1,
               MAX(CASE WHEN period = 2 THEN q END) AS q2,
               MAX(CASE WHEN period = 1 THEN r END) AS r1,
               MAX(CASE WHEN period = 2 THEN r END) AS r2
        FROM agg GROUP BY brand
    )
    SELECT brand, q1, q2, r1, r2,
           r2 - r1 AS delta_cents,
           {WPEN} / CAST(q1 AS DOUBLE) AS price_effect_cents,
           (CAST(q2 - q1 AS DOUBLE) * CAST(r1 AS DOUBLE))
               / CAST(q1 AS DOUBLE) AS volume_effect_cents
    FROM wide
    WHERE q1 > 0 AND q2 > 0
"""


@register(
    "agg_price_volume_mix",
    oracle=_PVM_SQL.format(
        YEARX="CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)",
        YEARO="CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)",
        IDIV="//",
        WPEN=wide_dbl(
            "CAST(CAST(r2 AS DECIMAL(38,0)) * q1"
            " - CAST(r1 AS DECIMAL(38,0)) * q2 AS DECIMAL(38,0))"
        ),
    ),
)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE-VOLUME variance decomposition per brand between the low
    and high calendar halves — the FP&A 'revenue bridge': ΔR =
    (P₂−P₁)·Q₂ + (Q₂−Q₁)·P₁, the exact two-factor identity every
    margin-variance report walks (price effect on new volume, volume
    effect at old price; the residual-free convention). Average
    prices are rationals, so the price effect is computed from the
    cleared-numerator integer (R₂Q₁ − R₁Q₂) in DECIMAL(38) rendered
    through wide_dbl, divided by the exact double product Q₁·Q₂ —
    a fixed-order chain, bit-identical both engines; the volume
    effect is three single-rounded casts and one division. Period
    split by the derived pivot year (integer floor-div midpoint —
    data-derived, the r4 in-query-parameter rule).

    Scale: one fact join (orders/part broadcast-or-shuffle per
    stats), one partial-aggregable rollup, O(brands) tail.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _PVM_SQL.format(
            YEARX="CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)",
            YEARO="CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)",
            IDIV="div",
            WPEN=wide_dbl(
                "CAST(CAST(r2 AS DECIMAL(38,0)) * q1"
                " - CAST(r1 AS DECIMAL(38,0)) * q2 AS DECIMAL(38,0))"
            ),
        )
    )


_MCC_SQL = """
    WITH scored AS (
        SELECT CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 2 = 0
                    THEN 1 ELSE 0 END AS y,
               CASE WHEN CAST(ROUND(value * 100) AS BIGINT) % 5 <= 1
                    THEN 1 ELSE 0 END AS yhat
        FROM events WHERE value IS NOT NULL
    ),
    cm AS (
        SELECT CAST(SUM(y * yhat) AS BIGINT) AS tp,
               CAST(SUM((1 - y) * yhat) AS BIGINT) AS fp,
               CAST(SUM(y * (1 - yhat)) AS BIGINT) AS fn,
               CAST(SUM((1 - y) * (1 - yhat)) AS BIGINT) AS tn
        FROM scored
    )
    SELECT tp, fp, fn, tn,
           (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
            - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
           / SQRT(((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                   * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)))
                  * ((CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
                     * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)))) AS mcc,
           (CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
            + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE)))
           / 2.0 AS balanced_accuracy
    FROM cm
    WHERE tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
"""


@register("ml_eval_mcc", oracle=_MCC_SQL)
def ml_eval_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient + balanced accuracy — the two
    class-imbalance-proof classifier metrics `ml_eval_confusion`'s
    accuracy/F1 family misses (MCC is the binary-case Pearson φ; the
    only single number that needs all four confusion cells to be
    good). Confusion counts are exact int64 conditional sums over the
    deterministic parity label / residue-class predictor pair; MCC's
    n⁴-sized radicand is evaluated as a fixed-order DOUBLE chain over
    single-rounded counts (each op correctly rounded + identical text
    both engines ⇒ identical bits — the sqrt-portability rule, r3),
    guarded against the four degenerate single-class margins.

    Scale: one conditional-count partial aggregation — map-side
    combine, O(1) tail.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MCC_SQL)


def _welch_anova_sql() -> str:
    """Welch's heteroskedastic one-way ANOVA over the five TPC-H
    order priorities, generated from one Python loop so the 5-group
    pivot and the fixed-order float chains are IDENTICAL text on both
    engines (wide_dbl renders the DECIMAL(38) sum-of-squares; every
    other step is single-rounded casts/div in written order)."""
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pivot = []
    for i, p in enumerate(prios, 1):
        pivot.append(
            f"CAST(SUM(CASE WHEN pr = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n{i},"
            f" CAST(SUM(CASE WHEN pr = '{p}' THEN c ELSE 0 END) AS BIGINT)"
            f" AS s{i},"
            f" SUM(CASE WHEN pr = '{p}'"
            f" THEN CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"
            f" ELSE CAST(0 AS DECIMAL(38,0)) END) AS q{i}"
        )
    terms = []
    for i in range(1, 6):
        qd = wide_dbl(f"q{i}")
        terms.append(
            f"CAST(n{i} AS DOUBLE) AS nd{i},"
            f" CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE) AS m{i},"
            f" ({qd} - (CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
            f" / CAST(n{i} AS DOUBLE)) / (CAST(n{i} AS DOUBLE) - 1.0)"
            f" AS v{i}"
        )
    w = " + ".join(f"(nd{i} / v{i})" for i in range(1, 6))
    mw = " + ".join(f"(nd{i} / v{i}) * m{i}" for i in range(1, 6))
    a = " + ".join(
        f"(nd{i} / v{i}) * ((m{i} - mw) * (m{i} - mw))" for i in range(1, 6)
    )
    g = " + ".join(
        f"(((1.0 - (nd{i} / v{i}) / w) * (1.0 - (nd{i} / v{i}) / w))"
        f" / (nd{i} - 1.0))"
        for i in range(1, 6)
    )
    return f"""
    WITH base AS (
        SELECT o_orderpriority AS pr,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders
    ),
    piv AS (SELECT {', '.join(pivot)} FROM base),
    stats AS (SELECT {', '.join(terms)} FROM piv
              WHERE n1 > 1 AND n2 > 1 AND n3 > 1 AND n4 > 1 AND n5 > 1),
    folded AS (
        SELECT nd1, nd2, nd3, nd4, nd5, m1, m2, m3, m4, m5,
               v1, v2, v3, v4, v5, ({w}) AS w
        FROM stats
        WHERE v1 > 0 AND v2 > 0 AND v3 > 0 AND v4 > 0 AND v5 > 0
    ),
    centered AS (
        SELECT nd1, nd2, nd3, nd4, nd5, m1, m2, m3, m4, m5,
               v1, v2, v3, v4, v5, w, ({mw}) / w AS mw
        FROM folded
    ),
    parts AS (
        SELECT ({a}) / 4.0 AS a_num, ({g}) AS gsum
        FROM centered
    )
    SELECT a_num / (1.0 + (2.0 * 3.0 / 24.0) * gsum) AS f_welch,
           CAST(4 AS BIGINT) AS df1,
           24.0 / (3.0 * gsum) AS df2
    FROM parts
    """


@register("stats_welch_anova", oracle=_welch_anova_sql())
def stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH's one-way ANOVA (unequal variances) across the five
    order priorities — the k-group generalization of
    `stats_welch_ttest` and the robust alternative to
    `stats_anova_f` when group spreads differ (the common real-world
    case classic ANOVA silently mishandles): per-group exact moments
    (int64 counts/sums, DECIMAL(38) sums of d19×d19 squares rendered
    through wide_dbl), then the weighted-means F and the
    Satterthwaite df₂ as one generated fixed-order float chain,
    IDENTICAL text both engines. Generated from a single Python loop
    (the fn_ulid_codec rule) so the five-group pivot can't drift.

    Scale: one conditional-moment partial aggregation (map-side
    combine over 15 cells), O(1) tail.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_welch_anova_sql())


def _feat_corr_ctes() -> str:
    """Shared moment + pairwise-correlation CTE prefix over the
    lineitem feature block (x1=quantity, x2=discount cents, x3=tax
    cents, y=extendedprice cents) — generated once so
    ml_forward_feature_selection and stats_vif stay textually in
    lockstep. All moments exact (int64; the y² cell in DECIMAL(38)
    through d19×d19, rendered via wide_dbl); correlations are
    fixed-order double chains over single-rounded casts, IDENTICAL
    text on both engines."""
    qyy = wide_dbl("qyy")
    pairs = {
        "12": ("sx1", "sx2", "q12", "v1", "v2"),
        "13": ("sx1", "sx3", "q13", "v1", "v3"),
        "23": ("sx2", "sx3", "q23", "v2", "v3"),
        "y1": ("sy", "sx1", "qy1", "vy", "v1"),
        "y2": ("sy", "sx2", "qy2", "vy", "v2"),
        "y3": ("sy", "sx3", "qy3", "vy", "v3"),
    }
    corr_terms = ", ".join(
        f"(nd * CAST({q} AS DOUBLE) - CAST({a} AS DOUBLE)"
        f" * CAST({b} AS DOUBLE)) / SQRT({va} * {vb}) AS r{k}"
        for k, (a, b, q, va, vb) in pairs.items()
    )
    return f"""
    feat AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
               CAST(ROUND(l_tax * 100) AS BIGINT) AS x3,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS sx1,
               CAST(SUM(x2) AS BIGINT) AS sx2,
               CAST(SUM(x3) AS BIGINT) AS sx3,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS q11,
               CAST(SUM(x1 * x2) AS BIGINT) AS q12,
               CAST(SUM(x1 * x3) AS BIGINT) AS q13,
               CAST(SUM(x2 * x2) AS BIGINT) AS q22,
               CAST(SUM(x2 * x3) AS BIGINT) AS q23,
               CAST(SUM(x3 * x3) AS BIGINT) AS q33,
               CAST(SUM(x1 * y) AS BIGINT) AS qy1,
               CAST(SUM(x2 * y) AS BIGINT) AS qy2,
               CAST(SUM(x3 * y) AS BIGINT) AS qy3,
               SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                   AS qyy
        FROM feat
    ),
    vars_ AS (
        SELECT n, sx1, sx2, sx3, sy,
               q12, q13, q23, qy1, qy2, qy3,
               CAST(n AS DOUBLE) AS nd,
               CAST(n AS DOUBLE) * CAST(q11 AS DOUBLE)
                   - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) AS v1,
               CAST(n AS DOUBLE) * CAST(q22 AS DOUBLE)
                   - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) AS v2,
               CAST(n AS DOUBLE) * CAST(q33 AS DOUBLE)
                   - CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE) AS v3,
               CAST(n AS DOUBLE) * {qyy}
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
        FROM mom WHERE n > 2
    ),
    corrs AS (
        SELECT nd, {corr_terms}
        FROM vars_
        WHERE v1 > 0 AND v2 > 0 AND v3 > 0 AND vy > 0
    )"""


def _r2_pair(rj: str, rk: str, rjk: str) -> str:
    """Two-regressor R² closed form (identical-text double chain)."""
    return (
        f"(({rj} * {rj} + {rk} * {rk}) - (2.0 * {rj}) * ({rk} * {rjk}))"
        f" / (1.0 - {rjk} * {rjk})"
    )


@register(
    "ml_forward_feature_selection",
    oracle="WITH " + _feat_corr_ctes() + f""",
    step1 AS (
        SELECT nd, ry1, ry2, ry3, r12, r13, r23,
               CASE WHEN ry1 * ry1 >= ry2 * ry2
                     AND ry1 * ry1 >= ry3 * ry3 THEN 'quantity'
                    WHEN ry2 * ry2 >= ry3 * ry3 THEN 'discount'
                    ELSE 'tax' END AS f1,
               CASE WHEN ry1 * ry1 >= ry2 * ry2
                     AND ry1 * ry1 >= ry3 * ry3 THEN ry1 * ry1
                    WHEN ry2 * ry2 >= ry3 * ry3 THEN ry2 * ry2
                    ELSE ry3 * ry3 END AS r2_1
        FROM corrs
    ),
    step2 AS (
        SELECT f1, r2_1,
               CASE f1
                 WHEN 'quantity' THEN
                   CASE WHEN {_r2_pair('ry1', 'ry2', 'r12')}
                          >= {_r2_pair('ry1', 'ry3', 'r13')}
                        THEN 'discount' ELSE 'tax' END
                 WHEN 'discount' THEN
                   CASE WHEN {_r2_pair('ry2', 'ry1', 'r12')}
                          >= {_r2_pair('ry2', 'ry3', 'r23')}
                        THEN 'quantity' ELSE 'tax' END
                 ELSE
                   CASE WHEN {_r2_pair('ry3', 'ry1', 'r13')}
                          >= {_r2_pair('ry3', 'ry2', 'r23')}
                        THEN 'quantity' ELSE 'discount' END
               END AS f2,
               CASE f1
                 WHEN 'quantity' THEN
                   CASE WHEN {_r2_pair('ry1', 'ry2', 'r12')}
                          >= {_r2_pair('ry1', 'ry3', 'r13')}
                        THEN {_r2_pair('ry1', 'ry2', 'r12')}
                        ELSE {_r2_pair('ry1', 'ry3', 'r13')} END
                 WHEN 'discount' THEN
                   CASE WHEN {_r2_pair('ry2', 'ry1', 'r12')}
                          >= {_r2_pair('ry2', 'ry3', 'r23')}
                        THEN {_r2_pair('ry2', 'ry1', 'r12')}
                        ELSE {_r2_pair('ry2', 'ry3', 'r23')} END
                 ELSE
                   CASE WHEN {_r2_pair('ry3', 'ry1', 'r13')}
                          >= {_r2_pair('ry3', 'ry2', 'r23')}
                        THEN {_r2_pair('ry3', 'ry1', 'r13')}
                        ELSE {_r2_pair('ry3', 'ry2', 'r23')} END
               END AS r2_2
        FROM step1
    )
    SELECT f1 AS step1_feature, r2_1 AS step1_r2,
           f2 AS step2_feature, r2_2 AS step2_r2,
           r2_2 - r2_1 AS gain
    FROM step2
    """,
)
def ml_forward_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy FORWARD feature selection (2 rounds) for predicting
    price from (quantity, discount, tax) — the feature-pipeline
    primitive: round 1 picks the single feature with the highest
    simple R², round 2 the partner maximizing the exact two-regressor
    closed form R²_{jk} = (r_j² + r_k² − 2 r_j r_k r_jk)/(1 − r_jk²).
    All correlations come from one pass of exact integer moments
    (the y² cell via DECIMAL(38)/wide_dbl) folded through IDENTICAL
    fixed-order double chains; argmax ties resolve to the earlier
    feature deterministically; numpy replay pin.

    Scale: ONE partial-aggregable moment pass over the fact table —
    the whole selection is O(1) afterwards (this is why forward
    selection on linear models scales where wrapper methods don't).
    """
    from e2e_data_pipeline_spark.catalog import register_views
    from e2e_data_pipeline_spark.operators.registry import ORACLES

    register_views(spark, sf_dir)
    return spark.sql(ORACLES["ml_forward_feature_selection"])


@register(
    "stats_vif",
    oracle="WITH " + _feat_corr_ctes() + f""",
    vifs AS (
        SELECT 'quantity' AS feature,
               {_r2_pair('r12', 'r13', 'r23')} AS r2_on_others
        FROM corrs
        UNION ALL
        SELECT 'discount', {_r2_pair('r12', 'r23', 'r13')} FROM corrs
        UNION ALL
        SELECT 'tax', {_r2_pair('r13', 'r23', 'r12')} FROM corrs
    )
    SELECT feature, r2_on_others,
           1.0 / (1.0 - r2_on_others) AS vif
    FROM vifs
    WHERE r2_on_others < 1.0
    """,
)
def stats_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE INFLATION FACTORS over the lineitem feature block —
    the multicollinearity preflight every regression pipeline should
    run before trusting coefficients: VIF_j = 1/(1 − R²_j·others),
    with each auxiliary R² from the exact two-regressor closed form
    over pairwise correlations (for feature x1 on {{x2, x3}} the
    pair is (r12, r13) linked by r23, and cyclically). One exact
    integer-moment pass, IDENTICAL fixed-order double chains both
    engines (shares the generated _feat_corr_ctes prefix with
    ml_forward_feature_selection — one derivation, two reports);
    numpy replay pin.

    Scale: ONE partial-aggregable moment pass, O(features²) tail.
    """
    from e2e_data_pipeline_spark.catalog import register_views
    from e2e_data_pipeline_spark.operators.registry import ORACLES

    register_views(spark, sf_dir)
    return spark.sql(ORACLES["stats_vif"])


_COOKS_SQL = """
    WITH daily AS (
        SELECT {DAYNUM} AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(d) AS BIGINT) AS dmin,
               CAST(SUM(d - (SELECT MIN(d) FROM daily)) AS BIGINT) AS sx,
               CAST(SUM((d - (SELECT MIN(d) FROM daily))
                        * (d - (SELECT MIN(d) FROM daily))) AS BIGINT)
                   AS qxx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM((d - (SELECT MIN(d) FROM daily)) * y) AS BIGINT)
                   AS qxy,
               SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                   AS qyy
        FROM daily
    ),
    fit AS (
        SELECT n, dmin, CAST(n AS DOUBLE) AS nd,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
               (CAST(n AS DOUBLE) * CAST(qxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(qxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
               (CAST(n AS DOUBLE) * CAST(qxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS sxx,
               (({WQYY} * CAST(n AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(qxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                - (CAST(n AS DOUBLE) * CAST(qxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(qxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               / ((CAST(n AS DOUBLE) * CAST(qxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 2.0)))
                   AS s2,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
        FROM mom WHERE n > 3
    ),
    scored AS (
        SELECT d.d, d.y,
               CAST(d.y AS DOUBLE)
                 - (f.my + f.b * (CAST(d.d - f.dmin AS DOUBLE) - f.mx))
                   AS e,
               1.0 / f.nd
                 + ((CAST(d.d - f.dmin AS DOUBLE) - f.mx)
                    * (CAST(d.d - f.dmin AS DOUBLE) - f.mx)) / f.sxx
                   AS h,
               f.s2
        FROM daily d CROSS JOIN fit f
        WHERE f.s2 > 0
    )
    SELECT CAST(d AS BIGINT) AS day_num, y AS day_cents,
           e AS residual_cents, h AS leverage,
           ((e * e) * h) / ((2.0 * s2) * ((1.0 - h) * (1.0 - h)))
               AS cooks_d
    FROM scored
    ORDER BY cooks_d DESC, day_num
    LIMIT 15
"""


@register(
    "ml_cooks_distance",
    oracle=_COOKS_SQL.format(
        DAYNUM="CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'"
        " AS BIGINT)",
        WQYY=wide_dbl("qyy"),
    ),
)
def ml_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COOK'S DISTANCE regression diagnostics over the daily-revenue
    trend: per day the residual, leverage h = 1/n + (x−x̄)²/Sxx, and
    influence D = e²h / (p·s²·(1−h)²) (p = 2), publishing the top-15
    most influential days — the 'which observations own my fit'
    audit that belongs next to every slope this engine reports.
    s² comes from the exact closed form SSR·n·Sxx = Syy_n·Sxx_n −
    Sxy_n² over one pass of exact moments (y² through
    DECIMAL(38)/wide_dbl); per-day e/h/D are identical-text double
    chains, and the top-15 is TakeOrderedAndProject on the
    bit-identical doubles.

    Scale: day-grain rollup (distributed) + O(days) scoring against
    one broadcast fit row — the calendar-series shape.
    """
    from e2e_data_pipeline_spark.catalog import register_views
    from e2e_data_pipeline_spark.operators.registry import ORACLES

    register_views(spark, sf_dir)
    return spark.sql(
        _COOKS_SQL.format(
            DAYNUM="CAST(datediff(CAST(o_orderdate AS DATE),"
            " DATE '1970-01-01') AS BIGINT)",
            WQYY=wide_dbl("qyy"),
        )
    )


_CLIFFS_DELTA_SQL = """
    WITH pop AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    cells AS (
        SELECT cents,
               CAST(SUM(grp) AS BIGINT) AS n_a,
               CAST(COUNT(*) - SUM(grp) AS BIGINT) AS n_b
        FROM pop GROUP BY cents
    ),
    tot AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS n1,
               CAST(SUM(n_b) AS BIGINT) AS n2
        FROM cells
    ),
    cum AS (
        SELECT cents, n_a, n_b,
               CAST(SUM(n_b) OVER (ORDER BY cents) - n_b AS BIGINT)
                   AS b_less,
               CAST(SUM(n_b) OVER (ORDER BY cents DESC) - n_b AS BIGINT)
                   AS b_greater
        FROM cells
    ),
    folded AS (
        SELECT CAST(SUM(n_a * b_less) AS BIGINT) AS wins,
               CAST(SUM(n_a * b_greater) AS BIGINT) AS losses,
               CAST(SUM(n_a * n_b) AS BIGINT) AS ties
        FROM cum
    )
    SELECT t.n1, t.n2, f.wins, f.losses, f.ties,
           CAST(f.wins - f.losses AS DOUBLE)
               / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) AS delta,
           CASE WHEN 1000 * abs(f.wins - f.losses) < 147 * t.n1 * t.n2
                    THEN 'negligible'
                WHEN 1000 * abs(f.wins - f.losses) < 330 * t.n1 * t.n2
                    THEN 'small'
                WHEN 1000 * abs(f.wins - f.losses) < 474 * t.n1 * t.n2
                    THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM tot t, folded f
    WHERE t.n1 > 0 AND t.n2 > 0
"""


@register("stats_cliffs_delta", oracle=_CLIFFS_DELTA_SQL)
def stats_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIFF'S DELTA ordinal effect size (purchase vs click values) —
    the magnitude companion to `stats_mannwhitney`'s significance:
    delta = (#(a>b) - #(a<b)) / (n1*n2), with Romano's standard
    negligible/small/medium/large cut points (0.147/0.33/0.474)
    decided by INTEGER cross-multiplication (1000*|W-L| vs k*n1*n2 —
    no float thresholds). Distributed like the U statistic: group by
    integer-cents value, prefix sums over the bounded distinct-value
    frame give each cell's counts of smaller/greater other-group
    members, so wins/losses are exact int64 conditional sums and the
    one division (wins-losses)/(n1*n2) is a single IEEE rounding over
    exact sub-2^53 ints — bit-identical both engines.

    Scale: one conditional-count partial aggregation onto the distinct
    value grain (map-side combine), two prefix sums over that bounded
    frame, O(1) tail. Cross-checked against mannwhitney by the
    delta = 2*U1/(n1*n2) - 1 identity (replay-pinned).
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CLIFFS_DELTA_SQL)


_KUIPER_SQL = """
    WITH pop AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    steps AS (
        SELECT v,
               CAST(SUM(grp) AS BIGINT) AS c1,
               CAST(COUNT(*) - SUM(grp) AS BIGINT) AS c0
        FROM pop GROUP BY v
    ),
    tot AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0,
               CAST(SUM(c1) AS BIGINT) AS n1
        FROM steps
    ),
    ecdf AS (
        SELECT SUM(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS e0,
               SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS e1
        FROM steps
    ),
    gaps AS (
        SELECT CAST(MAX(e0 * t.n1 - e1 * t.n0) AS BIGINT) AS dplus_scaled,
               CAST(MAX(e1 * t.n0 - e0 * t.n1) AS BIGINT) AS dminus_scaled
        FROM ecdf, tot t
        GROUP BY t.n0, t.n1
    )
    SELECT t.n0, t.n1,
           GREATEST(g.dplus_scaled, 0) AS dplus_scaled,
           GREATEST(g.dminus_scaled, 0) AS dminus_scaled,
           GREATEST(g.dplus_scaled, 0) + GREATEST(g.dminus_scaled, 0)
               AS v_scaled,
           CAST(GREATEST(g.dplus_scaled, 0)
                + GREATEST(g.dminus_scaled, 0) AS DOUBLE)
               / (CAST(t.n0 AS DOUBLE) * CAST(t.n1 AS DOUBLE))
               AS kuiper_v
    FROM tot t, gaps g
    WHERE t.n0 > 0 AND t.n1 > 0
"""


@register("stats_kuiper", oracle=_KUIPER_SQL)
def stats_kuiper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KUIPER two-sample statistic V = D+ + D- (purchase vs view
    values) — the rotation-invariant Kolmogorov-Smirnov variant that
    weights both tails equally (the standard choice for cyclic or
    tail-sensitive drift, where KS under-weights whichever tail the
    supremum misses). Both one-sided suprema are computed ENTIRELY in
    integers at each pooled distinct value (cross-multiplied
    e0*n1 - e1*n0, exact int64), clamped at 0 (an empty-side supremum
    is 0, not negative), and the single division of the integer sum by
    n0*n1 is one IEEE rounding over exact sub-2^53 ints — bit-stable
    on both engines.

    Scale: one conditional-count partial aggregation onto the distinct
    value grain + one ordered prefix sum over that bounded step frame
    (same distributed-ECDF shape as `stats_ks_test`), O(1) tail.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_KUIPER_SQL)


_QUADE_TAIL = """
full_days AS (
    SELECT day FROM {cells}
    GROUP BY day HAVING COUNT(*) = 5
),
grid AS (
    SELECT c.day, c.event_type, c.n
    FROM {cells} c JOIN full_days fd ON fd.day = c.day
),
ranked AS (
    SELECT day, event_type, n,
           2 * COUNT(*) OVER (PARTITION BY day ORDER BY n
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - COUNT(*) OVER (PARTITION BY day, n) + 1 AS r2
    FROM grid
),
spans AS (
    SELECT day, CAST(MAX(n) - MIN(n) AS BIGINT) AS rng
    FROM grid GROUP BY day
),
qranks AS (
    SELECT day,
           2 * COUNT(*) OVER (ORDER BY rng
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - COUNT(*) OVER (PARTITION BY rng) + 1 AS q2
    FROM spans
),
scores AS (
    SELECT r.event_type,
           CAST(q.q2 * (r.r2 - 6) AS BIGINT) AS s4
    FROM ranked r JOIN qranks q ON q.day = r.day
),
blocks AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM spans),
a_term AS (
    SELECT CAST(SUM(s4 * s4) AS BIGINT) AS a16 FROM scores
),
t_term AS (
    SELECT CAST(SUM(sj * sj) AS BIGINT) AS t16
    FROM (SELECT CAST(SUM(s4) AS BIGINT) AS sj
          FROM scores GROUP BY event_type) g
)
SELECT b.b AS n_blocks, CAST(5 AS BIGINT) AS k,
       a.a16, t.t16,
       (CAST(b.b - 1 AS DOUBLE) * CAST(t.t16 AS DOUBLE))
           / (CAST(b.b AS DOUBLE) * CAST(a.a16 AS DOUBLE)
              - CAST(t.t16 AS DOUBLE)) AS f_quade,
       CAST(4 AS BIGINT) AS df1,
       CAST(4 * (b.b - 1) AS BIGINT) AS df2
FROM blocks b, a_term a, t_term t
WHERE b.b > 1 AND b.b * a.a16 > t.t16
"""

_QUADE_DUCK_CELLS = """
cells AS (
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
)"""


@register(
    "stats_quade",
    oracle="WITH " + _QUADE_DUCK_CELLS + "," + _QUADE_TAIL.format(
        cells="cells"
    ),
)
def stats_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADE test over the day x event-type activity grid — the
    weighted-blocks cousin of `stats_friedman` (blocks with larger
    within-day spread carry proportionally more evidence, making it
    the more powerful choice for k <= 5 treatments). All rank
    machinery is EXACT dyadic arithmetic lifted to integers: within-
    block midranks and block-range midranks are carried doubled
    (2r = 2*cnt_le - ties + 1), so the Quade score S_ij = Q_i*(r_ij -
    (k+1)/2) is carried as the exact int64 s4 = q2*(r2-6) (quarters,
    k=5), A and T fold as exact int64 sums of squares, and the F
    statistic is one fixed-order double chain over sub-2^53 ints —
    bit-identical both engines. Only complete 5-type days form blocks
    (HAVING COUNT(*)=5), and the degenerate all-tied frame
    (b*A == T) emits no row rather than dividing by zero.

    Scale: rides the session-cached (day, event_type) rollup
    (frame_cache.events_daily_by_type) — zero additional fact-table
    passes; every window is day- or blocks-grain (calendar-bounded).
    Replay-pinned against a scipy-free numpy Quade implementation.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import (
        events_daily_by_type,
    )

    events_daily_by_type(spark, sf_dir).select(
        "day", "event_type", "n"
    ).createOrReplaceTempView("quade_cells")
    return spark.sql("WITH " + _QUADE_TAIL.format(cells="quade_cells").lstrip())


@register(
    "stats_ad_2sample",
    oracle="""
    WITH pool AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey, l_linenumber,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_x
        FROM lineitem
        WHERE l_returnflag IN ('R', 'A') AND l_orderkey % 8 = 0
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nn,
               CAST(COALESCE(SUM(is_x), 0) AS BIGINT) AS nx
        FROM pool
    ),
    ranked AS (
        SELECT is_x,
               CAST(row_number() OVER
                    (ORDER BY cents, l_orderkey, l_linenumber, is_x)
                    AS BIGINT) AS j,
               CAST(SUM(is_x) OVER
                    (ORDER BY cents, l_orderkey, l_linenumber, is_x
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mj
        FROM pool
    ),
    terms AS (
        SELECT CAST(
                 CAST((mj * nn - j * nx) * 1000 AS DECIMAL(19,0))
                 * CAST((mj * nn - j * nx) * 1000 AS DECIMAL(19,0))
                 AS HUGEINT
               ) // (j * (nn - j)) AS term
        FROM ranked CROSS JOIN tot
        WHERE j < nn
    ),
    folded AS (
        SELECT CAST(SUM(CAST(term AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sum_ppm
        FROM terms
    )
    SELECT nx AS n_ret,
           nn - nx AS m_acc,
           CAST(CAST(sum_ppm AS HUGEINT)
                // GREATEST(nx * (nn - nx), 1) AS BIGINT) AS a2_ppm
    FROM folded CROSS JOIN tot
    """,
)
def stats_ad_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling A2 (Pettitt 1976 untied form)
    comparing RETURNED (R) vs ACCEPTED (A) line-item price distributions, reported as
    an EXACT integer ppm — no float ever enters the pipeline:

        A2 = 1/(n*m) * SUM_{j=1}^{N-1} (M_j*N - j*n)^2 / (j*(N-j))

    Ranks are deterministically tie-broken by (cents, l_orderkey,
    l_linenumber, is_x) (remaining ties are full duplicates, so M_j
    is permutation-invariant); each term rides the blessed truncating
    integer division (Spark DECIMAL ``div`` == DuckDB HUGEINT ``//``
    on positive operands, r3/r9 recipe) with the 1e6 ppm factor
    folded INTO the squared operand ((a*1000)^2 = a^2*1e6) so the
    d19*d19 product stays inside DECIMAL(38) and forces DuckDB's
    HUGEINT multiply kernel. Per-term truncation bounds the ppm error
    of the sum by N/(n*m) — sub-ppm at every fixture scale.

    Overflow envelope: |a| = |M_j*N - j*n| <= N*min(j, N-j), so each
    term <= N^2*1e6 — int64-safe to N ~ 3e6 pool rows (the %8 fold +
    two-flag filter keeps the pool at ~lineitem/12, i.e. safe past
    100x fixture scale); the SUM itself rides DECIMAL(38,0).

    Scale: ONE distributed global_rank pass (range partition +
    per-partition window, no single-partition sort) and a 1-row fold;
    n, m embed as literals from the rank pass's bounded collect.
    Replay-pinned against an integer-exact Python implementation plus
    a float AD cross-check in tests/test_cross_consistency.py.
    """
    pool = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_returnflag").isin("R", "A")
            & (F.col("l_orderkey") % 8 == 0)
        )
        .select(
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_x"),
        )
    )
    ranked, nn, sums = global_rank(
        pool,
        [
            F.col("cents"),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("is_x"),
        ],
        sum_cols=("is_x",),
        rn_name="j",
    )
    nx = int(sums.get("is_x", 0) or 0)
    nm = max(nx * (nn - nx), 1)
    terms = ranked.where(F.col("j") < F.lit(nn)).select(
        F.expr(
            f"CAST((cum_is_x * {nn} - j * {nx}) * 1000 AS DECIMAL(19,0))"
            f" * CAST((cum_is_x * {nn} - j * {nx}) * 1000 AS DECIMAL(19,0))"
            f" div (j * ({nn} - j))"
        ).alias("term")
    )
    folded = terms.agg(
        F.sum(F.col("term").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sum_ppm")
    )
    return folded.select(
        F.lit(nx).cast("long").alias("n_ret"),
        F.lit(nn - nx).cast("long").alias("m_acc"),
        F.expr(f"CAST(sum_ppm div {nm} AS BIGINT)").alias("a2_ppm"),
    )


_LOGRANK_TAIL = """g AS (
    SELECT dur,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 - censored ELSE 0 END)
                AS BIGINT) AS d1,
           CAST(SUM(CASE WHEN grp = 0 THEN 1 - censored ELSE 0 END)
                AS BIGINT) AS d2
    FROM {u} GROUP BY dur
),
risk AS (
    SELECT dur, d1, d2,
           CAST(SUM(n1) OVER (ORDER BY dur DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n1r,
           CAST(SUM(n2) OVER (ORDER BY dur DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n2r
    FROM g
),
evt AS (
    SELECT d1, d2, d1 + d2 AS dt, n1r, n2r, n1r + n2r AS nt
    FROM risk WHERE d1 + d2 > 0
),
terms AS (
    SELECT d1,
           (dt * n1r * 1000000) {div} nt AS e1_term,
           CASE WHEN nt > 1 THEN CAST(
               {h}CAST(dt * n1r * 1000 AS DECIMAL(19,0))
               * CAST(n2r * (nt - dt) * 1000 AS DECIMAL(19,0)){hc}
               {div} (nt * nt * (nt - 1)) AS BIGINT)
           ELSE 0 END AS v_term
    FROM evt
),
folded AS (
    SELECT CAST(SUM(d1) AS BIGINT) AS o1,
           CAST(SUM(e1_term) AS BIGINT) AS e1_ppm,
           CAST(SUM(v_term) AS BIGINT) AS v_ppm
    FROM terms
)
SELECT o1, e1_ppm, v_ppm,
       CASE WHEN COALESCE(v_ppm, 0) > 0 THEN
           CAST(o1 * 1000000 - e1_ppm AS DOUBLE)
           * CAST(o1 * 1000000 - e1_ppm AS DOUBLE)
           / CAST(v_ppm AS DOUBLE) / CAST(1000000 AS DOUBLE)
       END AS logrank_chi2
FROM folded"""

_LOGRANK_ORACLE = (
    """
    WITH u AS (
        SELECT CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS grp,
               LEAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE),
                     60) AS dur,
               CASE WHEN CAST(l.l_shipdate AS DATE)
                         - CAST(o.o_orderdate AS DATE) > 60
                    THEN 1 ELSE 0 END AS censored
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
          AND o.o_orderkey % 4 = 0
    ),
    """
    + _LOGRANK_TAIL.format(u="u", div="//", h="CAST(", hc=" AS HUGEINT)")
)


@register("stats_logrank", oracle=_LOGRANK_ORACLE)
def stats_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank (Mantel-Cox) test on order fulfillment
    times — do URGENT orders ship faster than LOW-priority ones?
    Each line item is a subject, time-to-event = ship lag in days
    (l_shipdate - o_orderdate), administratively right-censored at 60
    days (the classic fixed-horizon study design; the fixture's
    user-lifetime framing is fully censored, so the test would be
    vacuous there); at every event time the observed group-1 deaths are
    compared to the hypergeometric expectation E = dt*n1/nt with
    variance V = dt*(n1/nt)*(n2/nt)*(nt-dt)/(nt-1). E and V ride
    exact ppm integers (blessed truncating division: Spark DECIMAL
    ``div`` == DuckDB HUGEINT ``//``, the d19*d19 product forcing
    DuckDB's HUGEINT multiply kernel with the 1e6 folded into the
    operands); chi2 = (O-E)^2/V is a fixed-order double chain over
    sub-2^53 ints (nt=1 rows carry zero variance by the standard
    convention; a zero-variance frame emits NULL chi2, never a
    division). Truncation bounds: each E/V term errs < 1 ppm-unit,
    so chi2 is exact to ~#event-times ppm.

    Scale: one fact join keyed on orderkey (the filtered orders side
    prunes lineitem via the join), a duration-grain pivot (<= 61
    rows), suffix-sum risk sets over that tiny frame (the km trick),
    and a 1-row fold. The shared tail
    SQL text is IDENTICAL on both engines (only the per-user scan
    differs); replay-pinned against a from-scratch Python log-rank
    in tests/test_cross_consistency.py.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
            & (F.col("o_orderkey") % 4 == 0)
        )
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    u = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("grp"),
            F.least(lag, F.lit(60)).alias("dur"),
            F.when(lag > 60, 1).otherwise(0).alias("censored"),
        )
    )
    u.createOrReplaceTempView("logrank_users")
    return spark.sql(
        "WITH "
        + _LOGRANK_TAIL.format(u="logrank_users", div="div", h="", hc="")
    )


def _ipf_sql(cells: str, div: str, h: str, hc: str, rounds: int = 3) -> str:
    """Generated IPF (iterative proportional fitting / raking) CTE
    chain, IDENTICAL text on both engines modulo the four dialect
    tokens: seed = first-half-window (event_type x dow) counts,
    targets = full-window margins, weights held as exact ppm int64
    (every scale factor is the blessed truncating division over a
    d19*d19 decimal product, so both engines walk bit-identical
    integer states)."""
    f_expr = (
        "CAST({h}CAST(t.tgt * 1000000 AS DECIMAL(19,0))"
        " * CAST(1000000 AS DECIMAL(19,0)){hc} {div} m.cur AS BIGINT)"
    ).format(h=h, hc=hc, div=div)
    parts = [
        """full_c AS (
    SELECT et, dow, CAST(SUM(n) AS BIGINT) AS nf FROM {cells} GROUP BY et, dow
),
mid AS (
    SELECT (MIN(day) + MAX(day) + 1) {div} 2 AS mid FROM {cells}
),
seed AS (
    SELECT et, dow, CAST(SUM(n) AS BIGINT) AS n0
    FROM {cells} CROSS JOIN mid WHERE day < mid
    GROUP BY et, dow HAVING SUM(n) > 0
),
rowtgt AS (SELECT et, CAST(SUM(nf) AS BIGINT) AS tgt FROM full_c GROUP BY et),
coltgt AS (SELECT dow, CAST(SUM(nf) AS BIGINT) AS tgt FROM full_c GROUP BY dow),
state0 AS (
    SELECT et, dow, n0, CAST(1000000 AS BIGINT) AS w FROM seed
)""".format(cells=cells, div=div)
    ]
    k = 0
    for _ in range(rounds):
        for key, tgt in (("et", "rowtgt"), ("dow", "coltgt")):
            parts.append(
                """m{k} AS (
    SELECT {key}, CAST(SUM(n0 * w) AS BIGINT) AS cur
    FROM state{k} GROUP BY {key}
),
state{k1} AS (
    SELECT s.et, s.dow, s.n0,
           CAST((s.w * {f}) {div} 1000000 AS BIGINT) AS w
    FROM state{k} s
    JOIN {tgt} t ON t.{key} = s.{key}
    JOIN m{k} m ON m.{key} = s.{key}
)""".format(k=k, k1=k + 1, key=key, tgt=tgt, f=f_expr, div=div)
            )
            k += 1
    tail = """
SELECT s.et AS event_type, s.dow, s.n0, s.w AS w_ppm,
       CAST((s.n0 * s.w) {div} 1000000 AS BIGINT) AS raked
FROM state{k} s
ORDER BY s.et, s.dow""".format(k=k, div=div)
    return "WITH " + ",\n".join(parts) + tail


_IPF_ORACLE = _ipf_sql(
    cells="ev_cells", div="//", h="CAST(", hc=" AS HUGEINT)"
).replace(
    "WITH full_c",
    """WITH ev_cells AS (
    SELECT event_type AS et,
           (epoch_us(ts) // 86400000000) % 7 AS dow,
           epoch_us(ts) // 86400000000 AS day,
           1 AS n
    FROM events
),
full_c""",
)


@register("agg_ipf_raking", oracle=_IPF_ORACLE)
def agg_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking / iterative proportional fitting: calibrate the
    first-half-window (event_type x day-of-week) count grid so its
    margins match the FULL window's margins — the standard weighting
    step for panels, survey post-stratification, and debiasing a
    sampled training corpus against known marginal totals. Three
    row/column rounds (6 scale steps) with weights as exact ppm
    int64: every scale factor f = target*1e12 div current rides the
    blessed truncating division (d19*d19 product forces DuckDB's
    HUGEINT kernel), so both engines walk bit-identical integer
    weight states; no float ever appears. Margin-fit quality after 3
    rounds is property-pinned (strict improvement over the seed
    margins plus a truncation-aware absolute bound) and the full
    integer walk is replay-pinned in tests/test_cross_consistency.py.

    Overflow envelope: tgt*1e6 stays int64 to ~9e12 events; n0*w
    int64 to ~1e13 cell-weight products — two orders past the 30x
    smoke.

    Scale: rides the session-cached (day, event_type) rollup; all
    IPF stages operate on the 35-cell grid (5 types x 7 dows) —
    constant-size regardless of fact scale.

    r10 optimization: the Spark side no longer executes the
    generated 13-stage CTE chain (each scale step = a GROUP-BY plus
    two joins over the 35-cell grid at full shuffle width — ~20 tiny
    stages of pure scheduling, 4.0 s at sf0.1) but folds the SAME
    integer weight walk over the collected grid as 6 chained
    ``transform`` projections on one row: margins via in-lambda
    aggregate/filter (O(35²) per step), scale factors as the
    IDENTICAL d19×d19 decimal-div expressions, so the walked weights
    are bit-identical. The DuckDB oracle keeps the CTE chain — the
    hash match cross-proves the rewrite, and the replay pin walks
    the integers from scratch.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import (
        events_daily_by_type,
    )

    cells = events_daily_by_type(spark, sf_dir).select(
        F.col("event_type").alias("et"),
        (F.col("day") % 7).alias("dow"),
        "day",
        "n",
    )
    mid = cells.agg(F.expr("(MIN(day) + MAX(day) + 1) div 2").alias("mid"))
    seed = (
        cells.crossJoin(F.broadcast(mid))
        .where(F.col("day") < F.col("mid"))
        .groupBy("et", "dow")
        .agg(F.sum("n").cast("long").alias("n0"))
        .where(F.col("n0") > 0)
    )
    rowt = cells.groupBy("et").agg(F.sum("n").cast("long").alias("tgt")).agg(
        F.expr("map_from_entries(collect_list(struct(et, tgt)))").alias("rowt")
    )
    colt = cells.groupBy("dow").agg(F.sum("n").cast("long").alias("tgt")).agg(
        F.expr("map_from_entries(collect_list(struct(dow, tgt)))").alias("colt")
    )
    packed = (
        seed.agg(
            F.expr(
                "collect_list(struct(et, dow, n0,"
                " CAST(1000000 AS BIGINT) AS w))"
            ).alias("state")
        )
        .crossJoin(F.broadcast(rowt))
        .crossJoin(F.broadcast(colt))
    )
    # The 6 scale steps run inside ONE aggregate() fold over the step
    # ids: the evolving grid flows through the fold ACCUMULATOR (a
    # lambda variable), never through chained projections — a first
    # attempt chained 6 transform() selects and Catalyst's project
    # collapse substituted each step's expression into the next,
    # blowing the tree up exponentially (the query never finished
    # planning). `st` is the PRE-step grid, so margins match the CTE
    # stage's m{k} GROUP BY snapshot; even steps scale rows (et),
    # odd steps columns (dow).
    cur = (
        "aggregate(filter(st, x -> CASE WHEN k % 2 = 0"
        " THEN x.et = s.et ELSE x.dow = s.dow END),"
        " CAST(0 AS BIGINT), (a, x) -> a + x.n0 * x.w)"
    )
    tgt = (
        "CASE WHEN k % 2 = 0 THEN element_at(rowt, s.et)"
        " ELSE element_at(colt, s.dow) END"
    )
    f_expr = (
        f"CAST(CAST({tgt} * 1000000 AS DECIMAL(19,0))"
        f" * CAST(1000000 AS DECIMAL(19,0)) div {cur} AS BIGINT)"
    )
    folded = packed.select(
        F.expr(
            "aggregate(sequence(0, 5), state,"
            " (st, k) -> transform(st, s -> struct(s.et AS et,"
            " s.dow AS dow, s.n0 AS n0,"
            f" CAST((s.w * {f_expr}) div 1000000 AS BIGINT) AS w)))"
        ).alias("state")
    )
    return (
        folded.select(F.explode("state").alias("s"))
        .select(
            F.col("s.et").alias("event_type"),
            F.col("s.dow").alias("dow"),
            F.col("s.n0").alias("n0"),
            F.col("s.w").alias("w_ppm"),
            F.expr("CAST((s.n0 * s.w) div 1000000 AS BIGINT)").alias("raked"),
        )
        .orderBy("event_type", "dow")
    )


_HOEFFD_TAIL = """pairsum AS (
    SELECT a.i,
           CAST(SUM(CASE WHEN b.x < a.x THEN 2 WHEN b.x = a.x THEN 1
                    ELSE 0 END) AS BIGINT) AS r2,
           CAST(SUM(CASE WHEN b.y < a.y THEN 2 WHEN b.y = a.y THEN 1
                    ELSE 0 END) AS BIGINT) AS s2,
           CAST(SUM((CASE WHEN b.x < a.x THEN 2 WHEN b.x = a.x THEN 1
                     ELSE 0 END)
                  * (CASE WHEN b.y < a.y THEN 2 WHEN b.y = a.y THEN 1
                     ELSE 0 END)) AS BIGINT) AS q4
    FROM {pts} a JOIN {pts} b ON b.i <> a.i
    GROUP BY a.i
),
folded AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(q4 * (q4 - 4)) AS BIGINT) AS a1,
           CAST(SUM(r2 * (r2 - 2) * s2 * (s2 - 2)) AS BIGINT) AS a2,
           CAST(SUM((r2 - 2) * (s2 - 2) * q4) AS BIGINT) AS a3
    FROM pairsum
)
SELECT n, a1, a2, a3,
       CASE WHEN n >= 5 THEN
           CAST(30 * ((n - 2) * (n - 3) * a1 + a2 - 2 * (n - 2) * a3)
                AS DOUBLE)
           / CAST(16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4) AS DOUBLE)
       END AS hoeffding_d
FROM folded"""

_HOEFFD_ORACLE = (
    """
    WITH pts AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS i,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    """
    + _HOEFFD_TAIL.format(pts="pts")
)


@register("stats_hoeffding_d", oracle=_HOEFFD_ORACLE)
def stats_hoeffding_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D test of (nonlinear) independence between daily
    revenue and daily order count — the classic rank statistic that
    catches dependence Pearson/Spearman miss. Tie handling is the
    phi = 1/(1/2)/0 midrank convention carried in DOUBLED/quadrupled
    integer units (r2 = 2*(midrank_x - 1), q4 = 4*(bivariate rank
    - 1)), so D1, D2, D3 clear their dyadic denominators into the
    exact int64 sums a1, a2, a3 and D is ONE double division of
    exact int64s (int64 -> double is a single IEEE rounding on both
    engines at any magnitude — the INT64-immunity rule). Bounds: with
    n = calendar days (~2.4k, scale-invariant), a2 <= n*(2n)^4 ~
    1.3e18 — inside int64 forever.

    Scale: rides the session-cached day-grain orders rollup; the
    pairwise dominance join is day-grain (~2400^2 = 5.8M comparisons,
    calendar-bounded at ANY fixture scale — never row-count-sized).
    Replay-pinned against a brute-force O(n^2) Python Hoeffding D in
    tests/test_cross_consistency.py.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import orders_daily

    orders_daily(spark, sf_dir).select(
        F.col("d").alias("i"), F.col("y").alias("x"), F.col("n").alias("y")
    ).createOrReplaceTempView("hoeffd_pts")
    return spark.sql("WITH " + _HOEFFD_TAIL.format(pts="hoeffd_pts"))


_PKENDALL_TAIL = """pairs AS (
    SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1
                    WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN -1
                    ELSE 0 END) AS BIGINT) AS txy,
           CAST(SUM(CASE WHEN (a.x - b.x) * (a.z - b.z) > 0 THEN 1
                    WHEN (a.x - b.x) * (a.z - b.z) < 0 THEN -1
                    ELSE 0 END) AS BIGINT) AS txz,
           CAST(SUM(CASE WHEN (a.y - b.y) * (a.z - b.z) > 0 THEN 1
                    WHEN (a.y - b.y) * (a.z - b.z) < 0 THEN -1
                    ELSE 0 END) AS BIGINT) AS tyz,
           CAST(COUNT(*) AS BIGINT) AS m
    FROM {pts} a JOIN {pts} b ON a.i < b.i
)
SELECT m, txy, txz, tyz,
       CASE WHEN (m * m - txz * txz) > 0 AND (m * m - tyz * tyz) > 0 THEN
           CAST(txy * m - txz * tyz AS DOUBLE)
           / SQRT({wd})
       END AS partial_tau
FROM pairs"""


def _pkendall_sql(pts: str, h: str, hc: str) -> str:
    prod = (
        "{h}CAST(m * m - txz * txz AS DECIMAL(19,0))"
        " * CAST(m * m - tyz * tyz AS DECIMAL(19,0)){hc}"
    ).format(h=h, hc=hc)
    return _PKENDALL_TAIL.format(pts=pts, wd=wide_dbl("(" + prod + ")"))


_PKENDALL_ORACLE = (
    """
    WITH pts AS (
        SELECT epoch_us(o_orderdate) // 86400000000 AS i,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                        ELSE 0 END) AS BIGINT) AS z
        FROM orders GROUP BY 1
    ),
    """
    + _pkendall_sql(pts="pts", h="CAST(", hc=" AS HUGEINT)")
)


@register("stats_partial_kendall", oracle=_PKENDALL_ORACLE)
def stats_partial_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial Kendall tau: is daily revenue still associated with
    daily order count once the urgent-order volume is controlled
    for?  tau_xy.z = (Txy*M - Txz*Tyz) / sqrt((M^2-Txz^2)(M^2-Tyz^2))
    over tau-a concordance numerators (ties contribute 0,
    documented): the T sums and M = n(n-1)/2 are exact int64 from a
    day-grain pairwise join, the numerator stays int64 (< 2^53 —
    exactly representable), the radicand rides a d19*d19 decimal
    product rendered through wide_dbl (bit-identical 3-limb fold),
    and SQRT is correctly rounded on both engines — one fixed-order
    chain, bit-equal everywhere. Degenerate perfect correlation
    (|T| = M) emits NULL instead of dividing by zero.

    Scale: one map-side day rollup (+ the cached orders_daily frame
    for x, y), then a calendar-bounded ~2400^2 pairwise join — never
    row-count-sized. Replay-pinned against a brute-force Python
    partial tau in tests/test_cross_consistency.py.
    """
    from e2e_data_pipeline_spark.operators.frame_cache import orders_daily

    base = orders_daily(spark, sf_dir).select(
        F.col("d").alias("i"), F.col("y").alias("x"), F.col("n").alias("y")
    )
    urg = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("i")
        )
        .agg(
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("long")
            .alias("z")
        )
    )
    base.join(urg, "i").createOrReplaceTempView("pkendall_pts")
    return spark.sql(
        "WITH " + _pkendall_sql(pts="pkendall_pts", h="", hc="")
    )
