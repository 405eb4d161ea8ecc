"""Scalar function families (SURVEY.md §2.2 ``fn_*``).

Generalizes the reference's only scalar transform — the conditional
timestamp cast at /root/reference/ingest_data.py:67-76 — into the full
built-in function surface. Everything here is a narrow transformation
(no shuffle) evaluated inside whole-stage codegen; these are the
expressions that must NEVER become Python UDFs in the hot path.

Cross-engine parity notes (hard-won, keep in mind when editing):
- ``round(x, d>0)`` on doubles with short decimal representations is a
  rounding-boundary trap (Spark rounds the shortest decimal repr,
  DuckDB the binary value) — only round *messy* values (ln, norms),
  never 2-decimal prices at coarser scales.
- Spark ``ceil``/``floor`` return BIGINT, DuckDB return DOUBLE — cast
  in the oracle.
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``isodow`` is 1=Monday. We
  emit ISO day-of-week as ``weekday()+1``.
- Spark ``cast(double AS int)`` truncates, DuckDB *rounds* — only cast
  integral-valued doubles (l_quantity) or TRUNC explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from e2e_data_pipeline_spark.catalog import load_table, rebalance_cpu
from e2e_data_pipeline_spark.operators.registry import dec_sum, register


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 4) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           replace(p_type, 'ECONOMY', 'ECO') AS type_short,
           trim('  ' || p_name || ' ') AS trimmed
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, concat, split,
    regexp_extract, replace, trim."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "ECONOMY", "ECO").alias("type_short"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_epoch95,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (A7 generalized): extract, trunc, diff, last_day."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        # ISO day-of-week (1=Mon..7=Sun): Spark weekday() is 0=Mon.
        (F.weekday(d) + 1).alias("iso_dow"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).alias("order_quarter"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000) AS abs_delta,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(l_extendedprice) AS price_round0,
           round(ln(l_extendedprice + 1), 6) AS ln_price,
           sqrt(l_quantity) AS sqrt_qty,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 97 AS BIGINT) AS mod97,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt is IEEE-exact; ln is rounded (libm last-ulp
    drift across engines); pow is expressed as x*x (exact)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 1000).alias("abs_delta"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        F.round(price, 0).alias("price_round0"),
        F.round(F.log(price + 1), 6).alias("ln_price"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 97).alias("mod97"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           label,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(list_min(embedding) AS DOUBLE) AS min_component,
           CAST(list_max(embedding) AS DOUBLE) AS max_component,
           (len(list_filter(embedding, x -> x < 0)) > 0) AS has_negative,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order family over the embedding vectors:
    size, element access, min/max, exists, filter-count, and an L2 norm
    via ``aggregate`` (sequential fold — matches DuckDB's list_sum
    order; result rounded to absorb any fold-order ulp)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    sq_sum = F.aggregate(
        e,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return emb.select(
        "vec_id",
        "label",
        F.size(e).alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_component"),
        F.array_min(e).cast("double").alias("min_component"),
        F.array_max(e).cast("double").alias("max_component"),
        F.exists(e, lambda x: x < 0).alias("has_negative"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props is a JSON object string,
    not a struct) + aggregation by the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("long")
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "fn_cast_cond",
    oracle="""
    SELECT o_orderkey,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
           (o_orderstatus = 'F') AS is_final,
           CASE o_orderstatus WHEN 'F' THEN 'final'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_name,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate_str,
           (o_totalprice > 200000) AS is_big,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending-null') AS status_or_default
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def fn_cast_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast + CASE family (A6/A7 generalized): string→int parse,
    boolean expressions, simple CASE, double→decimal, date→string,
    NULLIF/COALESCE."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 0)
    status = F.col("o_orderstatus")
    return orders.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
        (status == "F").alias("is_final"),
        F.when(status == "F", "final")
        .when(status == "O", "open")
        .otherwise("pending")
        .alias("status_name"),
        # decimal exercised, then back to double: pandas/duckdb surface
        # DECIMAL as object-Decimal vs float64, which breaks hashing.
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("o_orderdate").cast("date").cast("string").alias("orderdate_str"),
        (F.col("o_totalprice") > 200000).alias("is_big"),
        F.coalesce(F.nullif(status, F.lit("P")), F.lit("pending-null")).alias(
            "status_or_default"
        ),
    )


@register(
    "fn_try_cast",
    oracle="""
    WITH raw AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 4 = 0 THEN CAST(ROUND(c_acctbal, 2) AS VARCHAR)
                    WHEN c_custkey % 4 = 1 THEN 'n/a'
                    WHEN c_custkey % 4 = 2 THEN ''
                    ELSE NULL END AS raw_val
        FROM customer
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(TRY_CAST(raw_val AS DOUBLE)) AS BIGINT) AS n_parsed,
           CAST(SUM(CASE WHEN raw_val IS NOT NULL
                          AND TRY_CAST(raw_val AS DOUBLE) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
           CAST(SUM(CAST(COALESCE(TRY_CAST(raw_val AS DOUBLE), 0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_parsed
    FROM raw
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casts over dirty input: TRY_CAST yields NULL instead of
    failing the job on malformed values.

    At 100 TB a hard CAST means one bad record kills a multi-hour job;
    try_cast + a malformed-count metric (the reference's data-quality
    pattern, /root/reference/ingest_data.py:32,36, applied to parsing)
    is the production idiom: quarantine and count, don't crash.
    """
    cust = load_table(spark, sf_dir, "customer")
    raw = cust.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.round("c_acctbal", 2).cast("string"),
        )
        .when(F.col("c_custkey") % 4 == 1, "n/a")
        .when(F.col("c_custkey") % 4 == 2, "")
        .otherwise(None)
        .alias("raw_val"),
    )
    parsed = F.col("raw_val").try_cast("double")
    return raw.agg(
        F.count("*").alias("n_rows"),
        F.count(parsed).alias("n_parsed"),
        F.sum(
            F.when(F.col("raw_val").isNotNull() & parsed.isNull(), 1).otherwise(0)
        ).alias("n_malformed"),
        F.sum(F.coalesce(parsed, F.lit(0.0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_parsed"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey & 255 AS BIGINT) AS low_byte,
           CAST(p_partkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(p_partkey, 21845) AS BIGINT) AS xored,
           CAST(p_partkey << 2 AS BIGINT) AS shifted_l,
           CAST(p_partkey >> 3 AS BIGINT) AS shifted_r,
           CAST(~p_partkey AS BIGINT) AS inverted
    FROM part WHERE p_partkey < 500
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/not — the primitives behind
    bitmap indexes, flag columns, and hash mixing (e.g. the SimHash
    and LSH operators in llm_dedup/llm_similarity)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    k = F.col("p_partkey")
    return part.select(
        "p_partkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bitwise_not(k).alias("inverted"),
    )


@register(
    "fn_hash_digest",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 100
    """,
)
def fn_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests (md5 / sha-256): content-addressed ids
    and dedup fingerprints that must agree across engines and
    languages — unlike engine-internal hashes (xxhash64, DuckDB hash())
    which are implementation details and never portable."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_hex"),
        F.sha2(F.col("text").cast("binary"), 256).alias("sha256_hex"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 91 DAY, '%Y-%m-%d') AS due_91d,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3mo,
           strftime(o_orderdate - INTERVAL 1 YEAR, '%Y-%m-%d') AS minus_1y,
           CAST((1998 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS INT)
               AS months_to_1998,
           strftime(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_36h
    FROM orders
    WHERE o_orderkey % 11 = 0
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: day/month/year/hour offsets and month
    distances. Month addition clamps to month-end identically in both
    engines (Jan 31 + 1 month = Feb 28/29); the month distance uses the
    calendar-component formula rather than Spark's fractional
    ``months_between``, which has no portable SQL twin.

    The day offset is 91 (not 90) deliberately: DuckDB's interval
    equality treats 1 month as 30 days, so INTERVAL 90 DAY and
    INTERVAL 3 MONTH compare equal and its constant deduplication
    folds one onto the other when both appear in a query — 90-day and
    3-month columns silently come back identical. 91 days dodges the
    collision; caught by the oracle hash."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 11 == 0)
    d = F.col("o_orderdate")
    fmt_d = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return orders.select(
        "o_orderkey",
        fmt_d(d + F.expr("INTERVAL 91 DAYS")).alias("due_91d"),
        fmt_d(F.add_months(d, 3)).alias("plus_3mo"),
        fmt_d(F.add_months(d, -12)).alias("minus_1y"),
        ((F.lit(1998) - F.year(d)) * 12 + (F.lit(1) - F.month(d)))
        .cast("int")
        .alias("months_to_1998"),
        F.date_format(d + F.expr("INTERVAL 36 HOURS"), "yyyy-MM-dd HH:mm:ss").alias(
            "plus_36h"
        ),
    )


@register(
    "fn_struct_map",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
               AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
               AS qty_finished,
           CAST(COUNT(DISTINCT l_linestatus) AS INT) AS n_statuses,
           COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
                                  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0)
           + COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
                                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE), 0)
               AS qty_total
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: STRUCT and MAP construction, field access,
    and key lookup, with a flat (hash-comparable) final projection.

    Pivots per-status quantity sums into a ``map<string,double>`` via
    ``map_from_entries(collect_list(struct(...)))``, looks keys up with
    ``element_at`` (NULL for absent keys, like SQL conditional
    aggregation), counts keys with ``size``, and re-packs the two
    lookups into a struct whose fields are added back out. The map
    stays bounded by the l_linestatus domain (2 values), so the
    collect_list is per-group tiny at any scale. The oracle expresses
    the same pivot as CASE-WHEN conditional aggregation — the two
    formulations are semantically identical, which is the point: the
    nested-type pipeline must not drift from plain SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    per_status = li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity").alias("qty")
    )
    mapped = per_status.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.collect_list(F.struct("l_linestatus", "qty"))
        ).alias("m")
    )
    looked_up = mapped.select(
        "l_returnflag",
        F.element_at("m", F.lit("O")).alias("qty_open"),
        F.element_at("m", F.lit("F")).alias("qty_finished"),
        F.size(F.map_keys("m")).alias("n_statuses"),
    ).withColumn(
        "pair",
        F.struct(F.col("qty_open").alias("o"), F.col("qty_finished").alias("f")),
    )
    return looked_up.select(
        "l_returnflag",
        "qty_open",
        "qty_finished",
        "n_statuses",
        (
            F.coalesce(F.col("pair.o"), F.lit(0.0))
            + F.coalesce(F.col("pair.f"), F.lit(0.0))
        ).alias("qty_total"),
    )


@register(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(embedding, x -> x > 2.0)) > 0 AS has_big,
           len(list_filter(embedding, x -> abs(x) >= 10.0)) = 0 AS all_flat,
           CAST(list_max(embedding) AS DOUBLE) AS max_comp,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * 0.5)), 6) AS half_sum
    FROM embeddings
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: lambda filter/exists/forall,
    transform + fold, and element extrema — all JVM-side (whole-stage
    codegen), zero Python in the loop.

    The fold runs on doubles in array order in both engines and the
    O(1)-magnitude result is rounded to 6 digits to absorb fold-order
    ulp drift (casting components to DECIMAL instead trips the
    double→decimal rounding divergence: Spark rounds the shortest
    decimal repr, DuckDB the binary value — see module header). At
    scale this is the pattern for any per-row vector reduction (norms,
    quantization stats): no UDF, no Arrow transfer, no shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    half_sum = F.round(
        F.aggregate(
            F.transform(e, lambda x: x.cast("double") * 0.5),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > 2.0).alias("has_big"),
        F.forall(e, lambda x: F.abs(x) < 10.0).alias("all_flat"),
        F.array_max(e).cast("double").alias("max_comp"),
        half_sum.alias("half_sum"),
    )


@register(
    "fn_posexplode",
    oracle="""
    SELECT doc_id,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS ordinal,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (UNNEST WITH ORDINALITY): one row per token
    WITH its 1-based position — the ordinality is what plain explode
    loses and what sequence models need (position-aware n-grams,
    truncation at max context length). The oracle zips two parallel
    ``unnest`` calls (DuckDB's zip semantics for multiple unnests in
    one SELECT), which is the portable ordinality emulation. Generate
    is narrow — no shuffle; row expansion happens inside the scan's
    stage at any scale."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    ).select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("ordinal"),
        "tok",
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse the ``props`` JSON
    string ONCE into an open VARIANT value, then extract typed fields
    with ``variant_get`` path expressions — the modern alternative to
    per-field ``get_json_object`` re-parsing (compare ``fn_json``).

    At scale this is the right shape for ragged JSON: one parse per
    row regardless of how many fields are later plucked, binary
    (shredded) storage in shuffle/cache instead of strings, and
    missing paths yield NULL instead of failing — the quarantine
    behavior a 100 TB ingest needs. DuckDB has no VARIANT; the oracle
    extracts the same paths from the JSON text, which must agree
    because extraction is type-exact on both sides.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json(F.col("props"))
    )
    return (
        ev.select(
            "event_type",
            F.try_variant_get("v", "$.k", "int").alias("k"),
            F.try_variant_get("v", "$.missing", "int").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias(
                "n_missing"
            ),
        )
    )


@register(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               concat('https://', source, '.example.com/docs/',
                      CAST(doc_id AS VARCHAR), '?lang=', lang) AS url
        FROM documents
    )
    SELECT regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           min(regexp_extract(url, '//[^/]+(/[^?#]*)', 1)) AS first_path,
           min(regexp_extract(url, '[?&]lang=([^&#]*)', 1)) AS first_lang
    FROM urls
    GROUP BY host
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (host / path / query parameter) — the log- and
    crawl-processing staple. Spark side uses the BUILT-IN ``parse_url``
    (JVM, codegen-friendly — never a Python UDF for this); DuckDB has
    no parse_url, so the oracle is the regexp semantic twin, which also
    pins the exact host/path/param semantics the regex must honor.
    URLs are synthesized deterministically from fixture columns (no
    network anywhere).
    """
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    with_url = docs.select(F.col("doc_id"), url.alias("url"))
    return (
        with_url.select(
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("path").alias("first_path"),
            F.min("lang_param").alias("first_lang"),
        )
    )


@register(
    "fn_collation",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type)
                    ELSE p_type END AS p_type_mixed,
               p_retailprice
        FROM part
    )
    SELECT lower(p_type_mixed) AS type_key,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM mixed
    GROUP BY type_key
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4): group mixed-case categories
    under the UTF8_LCASE collation — equality, joins, and GROUP BY
    honor the collation natively instead of wrapping every reference
    in lower() (which blocks stats and sometimes pushdown).

    The fixtures are clean-cased, so a deterministic mixed-case column
    is derived first (even keys lowercased). The emitted group key is
    normalized with lower() because the collation's representative
    value is first-encountered — correct but nondeterministic —
    while the GROUPING itself runs on the collated column. DuckDB has
    no column collations; the oracle is the lower() semantic twin.
    """
    part = load_table(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.lower("p_type")
    ).otherwise(F.col("p_type"))
    return (
        part.select(mixed.alias("p_type_mixed"), "p_retailprice")
        .groupBy(F.collate("p_type_mixed", "UTF8_LCASE").alias("ck"))
        .agg(
            F.count("*").alias("n_parts"),
            dec_sum("p_retailprice").alias("total_price"),
        )
        .select(
            F.lower(F.col("ck")).alias("type_key"), "n_parts", "total_price"
        )
    )


@register(
    "fn_string_format",
    oracle="""
    SELECT p_partkey,
           printf('%s|%05d|%9.2f', p_brand, p_partkey % 100000, p_retailprice)
               AS part_label,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           rpad(p_brand, 12, '.') AS padded_brand,
           repeat(substr(p_type, 1, 2), 3) AS repeated_type,
           reverse(p_name) AS reversed_name,
           translate(p_type, 'AEIOU', 'aeiou') AS folded_type
    FROM part
    WHERE p_partkey % 7 = 0
    """,
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family: printf-style composition, pad, repeat,
    reverse, translate — the label/key-building toolkit (shard names,
    content keys, fixed-width exports). All built-ins (JVM codegen, no
    UDF). Spark's ``format_string`` and DuckDB's ``printf`` share the
    C-printf dialect; %9.2f of a 2-dp-semantics double is unambiguous
    (the binary value is never an exact half at the 3rd decimal), so
    the formatted text is engine-identical.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 7 == 0)
    return part.select(
        "p_partkey",
        F.format_string(
            "%s|%05d|%9.2f",
            F.col("p_brand"),
            (F.col("p_partkey") % 100000).cast("int"),
            F.col("p_retailprice"),
        ).alias("part_label"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("p_brand", 12, ".").alias("padded_brand"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("repeated_type"),
        F.reverse("p_name").alias("reversed_name"),
        F.translate("p_type", "AEIOU", "aeiou").alias("folded_type"),
    )


@register(
    "fn_array_setops",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.toks AS ta, b.toks AS tb
        FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(ta, tb)) AS INT) AS n_common,
           CAST(len(list_distinct(list_concat(ta, tb))) AS INT) AS n_union,
           CAST(len(list_filter(ta, x -> NOT list_contains(tb, x))) AS INT)
               AS n_only_a,
           CAST(len(list_intersect(ta, tb)) AS DOUBLE)
               / len(list_distinct(list_concat(ta, tb))) AS jaccard
    FROM pairs
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — intersect/union/except over token sets of
    adjacent documents, reduced to SIZES and a Jaccard ratio. Sizes
    (not the arrays) are the output on purpose: set-op element ORDER
    is engine-arbitrary (DuckDB's list_intersect returns hash order),
    but cardinalities are well-defined — the same discipline the
    dedup family uses. All JVM built-ins (`array_intersect`/`union`/
    `except` after `array_distinct`); the pair join is a narrow
    key-shift self-join, and the int→double Jaccard is exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a, b = t.alias("a"), t.alias("b")
    pairs = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.toks").alias("ta"),
        F.col("b.toks").alias("tb"),
    )
    common = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_union("ta", "tb"))
    return pairs.select(
        "doc_a",
        "doc_b",
        common.cast("int").alias("n_common"),
        union.cast("int").alias("n_union"),
        F.size(F.array_except("ta", "tb")).cast("int").alias("n_only_a"),
        (common.cast("double") / union).alias("jaccard"),
    )


@register(
    "fn_regexp_extract_all",
    oracle="""
    WITH lines AS (
        SELECT o_orderkey,
               concat('order=', CAST(o_orderkey AS VARCHAR),
                      ' qty=', CAST(o_orderkey % 7 AS VARCHAR),
                      ' amt=', CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                      ' prio=', o_orderpriority) AS log_line
        FROM orders WHERE o_orderkey % 11 = 0
    )
    SELECT o_orderkey,
           CAST(len(regexp_extract_all(log_line, '[0-9]+')) AS INT) AS n_numbers,
           CAST(list_sum(list_transform(regexp_extract_all(log_line, '[0-9]+'),
                                        x -> CAST(x AS BIGINT))) AS BIGINT)
               AS number_sum,
           regexp_extract_all(log_line, '[a-z]+=')[1] AS first_field
    FROM lines
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — pull EVERY match out of semi-structured
    log lines (the log-parsing workhorse next to fn_url_parse's
    structured extraction): numbers are extracted, counted, and summed
    through a higher-order cast+fold, all JVM-side. Lines are
    synthesized deterministically from fixture columns; patterns are
    in the RE2∩Java-regex subset (the text_pii_scrub discipline), and
    element order of extract_all is the match order — well-defined on
    both engines, unlike set-op order.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 11 == 0
    )
    line = F.concat(
        F.lit("order="), F.col("o_orderkey").cast("string"),
        F.lit(" qty="), (F.col("o_orderkey") % 7).cast("string"),
        F.lit(" amt="),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        F.lit(" prio="), F.col("o_orderpriority"),
    )
    lines = orders.select("o_orderkey", line.alias("log_line"))
    nums = F.regexp_extract_all("log_line", F.lit(r"[0-9]+"), 0)
    return lines.select(
        "o_orderkey",
        F.size(nums).cast("int").alias("n_numbers"),
        F.aggregate(
            F.transform(nums, lambda x: x.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("number_sum"),
        F.element_at(
            F.regexp_extract_all("log_line", F.lit(r"[a-z]+="), 0), 1
        ).alias("first_field"),
    )


@register(
    "fn_encode_decode",
    oracle="""
    SELECT p_partkey,
           to_base64(CAST(p_name AS BLOB)) AS name_b64,
           CAST(from_base64(to_base64(CAST(p_name AS BLOB))) AS VARCHAR)
               AS name_roundtrip,
           hex(CAST(p_brand AS BLOB)) AS brand_hex,
           CAST(octet_length(CAST(p_name AS BLOB)) AS INT) AS name_bytes
    FROM part
    WHERE p_partkey % 13 = 0
    """,
)
def fn_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary transport encodings — base64 and hex round trips with
    byte-length accounting (what every API/log/wire-format ingestion
    path needs before the payload becomes typed columns). All JVM
    built-ins; the oracle proves the encodings are byte-identical
    across engines, which is the property a cross-system handoff
    depends on (Spark's base64 follows RFC 4648 like DuckDB's;
    Spark's hex uppercases like DuckDB's blob hex).
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 13 == 0)
    name_bin = F.col("p_name").cast("binary")
    return part.select(
        "p_partkey",
        F.base64(name_bin).alias("name_b64"),
        F.unbase64(F.base64(name_bin)).cast("string").alias("name_roundtrip"),
        F.hex(F.col("p_brand").cast("binary")).alias("brand_hex"),
        F.octet_length(name_bin).cast("int").alias("name_bytes"),
    )


@register(
    "fn_json_nested",
    oracle="""
    WITH j AS (
        SELECT concat('{"order": ', CAST(o_orderkey AS VARCHAR),
                      ', "items": [',
                      '{"ln": 1, "qty": ', CAST(o_orderkey % 10 AS VARCHAR), '}, ',
                      '{"ln": 2, "qty": ', CAST((o_orderkey * 3) % 10 AS VARCHAR), '}, ',
                      '{"ln": 3, "qty": ', CAST((o_orderkey * 7) % 10 AS VARCHAR), '}',
                      ']}') AS doc
        FROM orders WHERE o_orderkey % 17 = 0
    ),
    exploded AS (
        SELECT CAST(json_extract_string(doc, '$.order') AS BIGINT) AS order_id,
               CAST(json_extract_string(doc,
                    concat('$.items[', CAST(i.i AS VARCHAR), '].ln'))
                    AS INT) AS ln,
               CAST(json_extract_string(doc,
                    concat('$.items[', CAST(i.i AS VARCHAR), '].qty'))
                    AS BIGINT) AS qty
        FROM j, (SELECT UNNEST(range(0, 3)) AS i) i
    )
    SELECT ln,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(MIN(order_id) AS BIGINT) AS first_order
    FROM exploded
    GROUP BY ln
    """,
)
def fn_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON documents — an order header with an ARRAY OF ITEM
    STRUCTS parsed into typed rows: ``from_json`` with a nested schema
    then one ``explode`` (the API-payload ingestion shape that flat
    ``get_json_object`` paths can't type). Documents are synthesized
    identically on both engines; DuckDB's oracle walks the same arrays
    with computed JSON paths (it has no nested-schema parser), making
    it the semantic spec while Spark exercises the real nested
    machinery. Parsing is JVM-side Jackson — no UDF — and the explode
    is a narrow transform; totals are exact integers.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 17 == 0
    )
    k = F.col("o_orderkey")
    doc = F.concat(
        F.lit('{"order": '), k.cast("string"),
        F.lit(', "items": [{"ln": 1, "qty": '), (k % 10).cast("string"),
        F.lit('}, {"ln": 2, "qty": '), ((k * 3) % 10).cast("string"),
        F.lit('}, {"ln": 3, "qty": '), ((k * 7) % 10).cast("string"),
        F.lit("}]}"),
    )
    schema = "struct<order: bigint, items: array<struct<ln: int, qty: bigint>>>"
    parsed = orders.select(F.from_json(doc, schema).alias("p"))
    exploded = parsed.select(
        F.col("p.order").alias("order_id"),
        F.explode("p.items").alias("item"),
    )
    return exploded.groupBy(F.col("item.ln").alias("ln")).agg(
        F.count("*").alias("n_orders"),
        F.sum("item.qty").alias("total_qty"),
        F.min("order_id").alias("first_order"),
    )


@register(
    "fn_quadkey_rollup",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               ((c_custkey * 2654435761) % 10000 * 128) // 10000 AS cx,
               ((c_custkey * 40503) % 10000 * 128) // 10000 AS cy
        FROM customer
    ),
    keyed AS (
        SELECT c_custkey,
               array_to_string(
                   list_transform(range(1, 8), i ->
                       CAST(2 * ((cy >> (7 - i)) & 1)
                            + ((cx >> (7 - i)) & 1) AS VARCHAR)),
                   '') AS quadkey
        FROM pts
    )
    SELECT 3 AS level, substr(quadkey, 1, 3) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM keyed GROUP BY substr(quadkey, 1, 3)
    HAVING COUNT(*) >= 2
    UNION ALL
    SELECT 5, substr(quadkey, 1, 5), CAST(COUNT(*) AS BIGINT)
    FROM keyed GROUP BY substr(quadkey, 1, 5)
    HAVING COUNT(*) >= 2
    """,
)
def fn_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadkey (Bing-tile) spatial indexing + hierarchical rollup: each
    point's level-7 quadkey interleaves the x/y cell bits into a
    base-4 string whose PREFIXES are its ancestor tiles — so zoom-out
    aggregation is a plain string-prefix groupBy, no geometry ever
    re-enters. This is how a 100 TB point table serves multi-zoom tile
    counts: one keyed pass, then prefix rollups of the tiny tile
    frame (same coordinates-from-keys synthesis as join_geo_grid; the
    fixtures carry no lat/lon).

    All tile math is integer ((v·128) div 10000, shifts, masks) —
    bit-identical across engines; density floors (HAVING ≥ 2) keep
    the report bounded.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * F.lit(2654435761)) % 10000 * 128) / 10000)
        .cast("long")
        .alias("cx"),
        (((F.col("c_custkey") * F.lit(40503)) % 10000 * 128) / 10000)
        .cast("long")
        .alias("cy"),
    )
    keyed = cust.select(
        "c_custkey",
        F.expr(
            "array_join(transform(sequence(1, 7), i ->"
            " CAST(2 * (shiftright(cy, 7 - i) % 2)"
            "      + (shiftright(cx, 7 - i) % 2) AS STRING)), '')"
        ).alias("quadkey"),
    )
    out = None
    for level in (3, 5):
        leg = (
            keyed.groupBy(
                F.substring("quadkey", 1, level).alias("tile")
            )
            .agg(F.count("*").alias("n_customers"))
            .where(F.col("n_customers") >= 2)
            .select(F.lit(level).alias("level"), "tile", "n_customers")
        )
        out = leg if out is None else out.unionByName(leg)
    return out


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (CAST(l_quantity AS BIGINT) % 7) = 0 THEN NULL
                ELSE CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     // (CAST(l_quantity AS BIGINT) % 7) END
               AS price_per_bucket,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE ROUND(l_tax / l_discount, 6) END AS tax_ratio
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (`try_divide`) — division by zero yields
    NULL instead of killing the 100 TB job at task 31,997 of 32,000.
    The oracle is the explicit CASE guard, which is exactly the
    semantics `try_*` promises; the hash proves Spark's try-functions
    and the guard agree row-for-row, including the NULL placement.
    Integer leg uses exact cents // bucket; float leg is one division
    rounded at O(1) width.
    """
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    bucket = F.col("l_quantity").cast("long") % 7
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "try_divide(CAST(ROUND(l_extendedprice * 100) AS BIGINT),"
            " CAST(l_quantity AS BIGINT) % 7)"
        )
        .cast("long")
        .alias("price_per_bucket"),
        F.round(F.expr("try_divide(l_tax, l_discount)"), 6).alias("tax_ratio"),
    )


@register(
    "fn_ip_cidr",
    oracle="""
    WITH ips AS (
        SELECT c_custkey,
               '10.' || CAST(c_custkey % 223 AS VARCHAR) || '.'
                     || CAST((c_custkey * 7 + c_nationkey) % 256 AS VARCHAR)
                     || '.' || CAST(c_custkey * 13 % 254 + 1 AS VARCHAR)
                   AS ip
        FROM customer
    ),
    parsed AS (
        SELECT c_custkey, ip,
               CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
             + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
        FROM ips
    ),
    blocks AS (
        SELECT block_name, net,
               CAST(string_split(net, '.')[1] AS BIGINT) * 16777216
             + CAST(string_split(net, '.')[2] AS BIGINT) * 65536
             + CAST(string_split(net, '.')[3] AS BIGINT) * 256
             + CAST(string_split(net, '.')[4] AS BIGINT) AS net_num,
               plen
        FROM (VALUES ('corp-a', '10.0.0.0', CAST(9 AS BIGINT)),
                     ('corp-b', '10.128.0.0', CAST(9 AS BIGINT)),
                     ('svc-db', '10.64.0.0', CAST(12 AS BIGINT)),
                     ('svc-web', '10.200.0.0', CAST(13 AS BIGINT)),
                     ('host-x', '10.42.7.0', CAST(24 AS BIGINT)))
             AS t(block_name, net, plen)
    ),
    matched AS (
        SELECT p.c_custkey, p.ip_num, b.block_name, b.plen,
               row_number() OVER (
                   PARTITION BY p.c_custkey
                   ORDER BY b.plen DESC, b.block_name
               ) AS rn
        FROM parsed p
        JOIN blocks b ON p.ip_num >> (32 - b.plen) = b.net_num >> (32 - b.plen)
    )
    SELECT block_name, plen,
           CAST(COUNT(*) AS BIGINT) AS n_ips,
           CAST(MIN(ip_num) AS BIGINT) AS min_ip_num,
           CAST(MAX(ip_num) AS BIGINT) AS max_ip_num
    FROM matched WHERE rn = 1
    GROUP BY block_name, plen
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted-quad IP parsing + longest-prefix CIDR classification —
    the firewall/geo-IP enrichment primitive. Synthesizes an IP string
    per customer (so the parse is exercised end to end), splits it back
    into octets, packs a 32-bit integer, and matches against a literal
    CIDR block table with `ip >> (32-plen) == net >> (32-plen)`;
    longest prefix wins via a per-IP window over the tiny candidate
    set. Everything is integer shifts and string splits — exact on
    both engines. At scale the block table broadcasts (routing tables
    are thousands of rows, never big), so classification is a
    map-only nested-loop against a broadcast dim: no shuffle on the
    fact side; the only shuffle is the final per-block aggregate.
    """
    quad = (
        "'10.' || CAST({k} % 223 AS STRING) || '.'"
        " || CAST(({k} * 7 + c_nationkey) % 256 AS STRING)"
        " || '.' || CAST({k} * 13 % 254 + 1 AS STRING)"
    ).format(k="c_custkey")
    ips = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{quad} AS ip"
    )

    def pack(col: str) -> Column:
        oct_ = lambda i: F.element_at(F.split(F.col(col), r"\."), i).cast("bigint")
        return oct_(1) * 16777216 + oct_(2) * 65536 + oct_(3) * 256 + oct_(4)

    parsed = ips.select("c_custkey", "ip", pack("ip").alias("ip_num"))
    blocks = (
        spark.createDataFrame(
            [
                ("corp-a", "10.0.0.0", 9),
                ("corp-b", "10.128.0.0", 9),
                ("svc-db", "10.64.0.0", 12),
                ("svc-web", "10.200.0.0", 13),
                ("host-x", "10.42.7.0", 24),
            ],
            "block_name string, net string, plen long",
        )
        .select("block_name", "plen", pack("net").alias("net_num"))
    )
    cand = parsed.join(
        F.broadcast(blocks),
        F.expr("ip_num >> (32 - plen) = net_num >> (32 - plen)"),
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("plen"), F.col("block_name").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("block_name", "plen")
        .agg(
            F.count("*").alias("n_ips"),
            F.min("ip_num").alias("min_ip_num"),
            F.max("ip_num").alias("max_ip_num"),
        )
    )


@register(
    "fn_tz_convert",
    oracle="""
    WITH localized AS (
        SELECT user_id,
               (CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
                   AT TIME ZONE 'America/New_York' AS local_ts
        FROM events
    )
    SELECT strftime(date_trunc('day', local_ts), '%Y-%m-%d') AS local_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN hour(local_ts) BETWEEN 9 AND 16
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_business_hours,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM localized GROUP BY local_day
    """,
)
def fn_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware bucketing: UTC event instants converted to
    America/New_York wall-clock time, rolled up by local calendar day
    with a business-hours (9:00–16:59 local) split — the reporting
    shape every "daily numbers look wrong" bug traces back to. Both
    engines resolve the IANA zone (DST transitions included) from the
    same tzdata rules: Spark's `from_utc_timestamp` ≡ DuckDB's double
    `AT TIME ZONE` hop, verified bit-equal across the fixture's
    summer/winter offsets (-4/-5).

    Conversion is a scan-local map; the rollup is one grouped count
    with a distinct leg. The session stays UTC — localization happens
    per-expression, never by mutating session state mid-query.
    """
    ev = load_table(spark, sf_dir, "events")
    local = ev.select(
        "user_id",
        F.from_utc_timestamp(F.col("ts").cast("timestamp"), "America/New_York").alias(
            "local_ts"
        ),
    )
    return local.groupBy(
        F.date_format(F.date_trunc("day", "local_ts"), "yyyy-MM-dd").alias(
            "local_day"
        )
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.hour("local_ts").between(9, 16), 1).otherwise(0)
        ).alias("n_business_hours"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "fn_money_parse",
    oracle="""
    WITH cents AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS true_cents
        FROM orders
    ),
    rendered AS (
        SELECT o_orderkey, true_cents,
               CASE WHEN o_orderkey % 7 = 0
                    THEN '(' || format('{:,}', true_cents // 100) || '.'
                         || lpad(CAST(true_cents % 100 AS VARCHAR), 2, '0')
                         || ')'
                    ELSE '$' || format('{:,}', true_cents // 100) || '.'
                         || lpad(CAST(true_cents % 100 AS VARCHAR), 2, '0')
               END AS money
        FROM cents
    ),
    parsed AS (
        SELECT true_cents, money,
               CASE WHEN money LIKE '(%' THEN -1 ELSE 1 END
                 * TRY_CAST(replace(regexp_replace(money, '[$(),]', '', 'g'),
                            '.', '') AS BIGINT) AS parsed_cents
        FROM rendered
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN parsed_cents IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_parse_failures,
           CAST(SUM(CASE WHEN abs(parsed_cents) = true_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_roundtrip_exact,
           CAST(SUM(parsed_cents) AS BIGINT) AS net_cents
    FROM parsed
    """,
)
def fn_money_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounting-format money parsing: render each order total as
    '$1,234.56' (or '(1,234.56)' for the accounting-negative style on
    every 7th key), then parse the strings back — strip currency/
    grouping symbols, map parens to sign, reassemble integer cents —
    and audit the round trip. The render side builds from integer
    cents (never float formatting, whose half-cent rounding differs
    between engines); digit grouping itself is locale-stable
    ('{:,}' ≡ format_number(..,0)). try-cast surfaces malformed rows
    as a count instead of a job failure.

    Pure scan-local string work — the ETL normalization every
    finance feed needs, exercising regexp class replacement, LIKE,
    conditional sign, and TRY_CAST in one pass.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
            "true_cents"
        ),
    )
    body = F.concat(
        F.format_number(F.expr("true_cents div 100"), 0),
        F.lit("."),
        F.lpad((F.col("true_cents") % 100).cast("string"), 2, "0"),
    )
    rendered = cents.select(
        "true_cents",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.concat(F.lit("("), body, F.lit(")")),
        )
        .otherwise(F.concat(F.lit("$"), body))
        .alias("money"),
    )
    parsed = rendered.select(
        "true_cents",
        (
            F.when(F.col("money").like("(%"), -1).otherwise(1)
            * F.expr(
                "TRY_CAST(replace(regexp_replace(money, '[$(),]', ''),"
                " '.', '') AS BIGINT)"
            )
        ).alias("parsed_cents"),
    )
    return parsed.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("parsed_cents").isNull(), 1).otherwise(0)).alias(
            "n_parse_failures"
        ),
        F.sum(
            F.when(F.abs(F.col("parsed_cents")) == F.col("true_cents"), 1)
            .otherwise(0)
        ).alias("n_roundtrip_exact"),
        F.sum("parsed_cents").alias("net_cents"),
    )


@register(
    "fn_semver_sort",
    oracle="""
    WITH vers AS (
        SELECT p_partkey,
               CAST(p_partkey % 5 AS VARCHAR) || '.'
               || CAST(p_size % 12 AS VARCHAR) || '.'
               || CAST(p_partkey * 7 % 20 AS VARCHAR)
               || CASE WHEN p_partkey % 3 = 0
                       THEN '-rc.' || CAST(p_partkey % 4 AS VARCHAR)
                       ELSE '' END AS version
        FROM part
    ),
    parsed AS (
        SELECT p_partkey, version,
               CAST(string_split(string_split(version, '-')[1], '.')[1]
                    AS BIGINT) AS major,
               CAST(string_split(string_split(version, '-')[1], '.')[2]
                    AS BIGINT) AS minor,
               CAST(string_split(string_split(version, '-')[1], '.')[3]
                    AS BIGINT) AS patch,
               CASE WHEN version LIKE '%-rc.%'
                    THEN CAST(string_split(version, 'rc.')[2] AS BIGINT)
                    ELSE NULL END AS rc
        FROM vers
    )
    SELECT version, major, minor, patch,
           CAST(COALESCE(rc, -1) AS BIGINT) AS rc,
           CAST(row_number() OVER (
               ORDER BY major DESC, minor DESC, patch DESC,
                        (rc IS NULL) DESC, rc DESC, p_partkey
           ) AS BIGINT) AS rn
    FROM parsed
    ORDER BY rn LIMIT 20
    """,
)
def fn_semver_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version parsing and precedence ordering — the
    artifact-registry query ("latest release, pre-releases rank
    below the release they precede"): split off the pre-release tag,
    parse the numeric triple, and sort by (major, minor, patch,
    release-before-rc, rc number) exactly as SemVer §11 specifies.
    Versions are synthesized from part attributes so the parse is
    exercised end to end; top-20 with a key tie-break.

    Pure string/integer expressions; the ordering is a
    TakeOrderedAndProject, not a global sort.
    """
    part = load_table(spark, sf_dir, "part")
    vers = part.select(
        "p_partkey",
        F.concat(
            (F.col("p_partkey") % 5).cast("string"),
            F.lit("."),
            (F.col("p_size") % 12).cast("string"),
            F.lit("."),
            (F.col("p_partkey") * 7 % 20).cast("string"),
            F.when(
                F.col("p_partkey") % 3 == 0,
                F.concat(F.lit("-rc."), (F.col("p_partkey") % 4).cast("string")),
            ).otherwise(""),
        ).alias("version"),
    )
    core = F.element_at(F.split("version", "-"), 1)
    parsed = vers.select(
        "p_partkey",
        "version",
        F.element_at(F.split(core, r"\."), 1).cast("bigint").alias("major"),
        F.element_at(F.split(core, r"\."), 2).cast("bigint").alias("minor"),
        F.element_at(F.split(core, r"\."), 3).cast("bigint").alias("patch"),
        F.when(
            F.col("version").like("%-rc.%"),
            F.element_at(F.split("version", r"rc\."), 2).cast("bigint"),
        ).alias("rc"),
    )
    w = Window.orderBy(
        F.desc("major"),
        F.desc("minor"),
        F.desc("patch"),
        F.desc(F.col("rc").isNull()),
        F.desc("rc"),
        F.col("p_partkey").asc(),
    )
    return (
        parsed.select(
            "version",
            "major",
            "minor",
            "patch",
            F.coalesce(F.col("rc"), F.lit(-1)).cast("bigint").alias("rc"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .orderBy("rn")
        .limit(20)
    )


@register(
    "fn_checkdigit",
    oracle="""
    WITH nums AS (
        SELECT c_custkey,
               lpad(CAST(c_custkey * 991 % 1000000000 AS VARCHAR), 9, '0')
                   AS body
        FROM customer
    ),
    digits AS (
        SELECT c_custkey, body,
               unnest(range(1, 10)) AS pos,
               CAST(substr(body, CAST(unnest(range(1, 10)) AS INT), 1)
                    AS BIGINT) AS d
        FROM nums
    ),
    luhn AS (
        SELECT c_custkey, body,
               CAST(SUM(CASE WHEN (9 - pos) % 2 = 0
                        THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9
                             ELSE d * 2 END
                        ELSE d END) AS BIGINT) AS s_luhn,
               CAST(SUM(CASE WHEN pos % 2 = 1 THEN d ELSE 3 * d END)
                    AS BIGINT) AS s_ean
        FROM digits GROUP BY c_custkey, body
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((10 - s_luhn % 10) % 10) AS BIGINT) AS luhn_digit_sum,
           CAST(SUM((10 - s_ean % 10) % 10) AS BIGINT) AS ean_digit_sum,
           CAST(SUM(CASE WHEN (s_luhn + (10 - s_luhn % 10) % 10) % 10 = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS luhn_self_valid
    FROM luhn
    """,
)
def fn_checkdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Check-digit computation — Luhn (payment cards) and EAN/GTIN
    (barcodes) over synthesized 9-digit bodies: the validation kernel
    every ingestion pipeline runs on identifier columns. Both schemes
    are digit-position arithmetic (double-every-second-from-the-right
    with 9-subtraction for Luhn; 1/3 alternating weights for EAN),
    expressed as a position explode + conditional sums — no UDF. The
    luhn_self_valid column proves the construction: appending the
    computed digit always yields a checksum ≡ 0 (mod 10), so the
    count equals n by definition — a self-validating output like the
    CMS/Bloom audits.

    Map-side explode (9 rows per id) with immediate partial
    aggregation; string→digit via substr, portable on both engines.
    """
    nums = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lpad(
            (F.col("c_custkey") * 991 % 1000000000).cast("string"), 9, "0"
        ).alias("body"),
    )
    digits = nums.select(
        "c_custkey",
        "body",
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("pos"),
    ).select(
        "c_custkey",
        "body",
        "pos",
        F.expr("CAST(substr(body, CAST(pos AS INT), 1) AS BIGINT)").alias("d"),
    )
    luhn = digits.groupBy("c_custkey", "body").agg(
        F.sum(
            F.when(
                (9 - F.col("pos")) % 2 == 0,
                F.when(F.col("d") * 2 > 9, F.col("d") * 2 - 9).otherwise(
                    F.col("d") * 2
                ),
            ).otherwise(F.col("d"))
        ).alias("s_luhn"),
        F.sum(
            F.when(F.col("pos") % 2 == 1, F.col("d")).otherwise(3 * F.col("d"))
        ).alias("s_ean"),
    )
    return luhn.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("(10 - s_luhn % 10) % 10")).alias("luhn_digit_sum"),
        F.sum(F.expr("(10 - s_ean % 10) % 10")).alias("ean_digit_sum"),
        F.sum(
            F.when(
                F.expr("(s_luhn + (10 - s_luhn % 10) % 10) % 10 = 0"), 1
            ).otherwise(0)
        ).alias("luhn_self_valid"),
    )


@register(
    "fn_xpath",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction over embedded XML payloads — the "orders
    arrive as XML blobs in a column" integration shape. Each order is
    rendered into an attribute+element document, then everything is
    recovered with `xpath_string` / `xpath_long` (element text,
    attribute, numeric coercion) and re-aggregated; the oracle
    computes the same rollup from the source columns, so a hash match
    proves extraction is lossless. DuckDB has no XPath engine —
    which is exactly why the oracle goes around the XML instead of
    through it.

    The render guards '&' (the only XML metacharacter the priority
    strings could contain is none, but custkey/total are numeric) so
    the documents are well-formed; xpath_* are scan-local JVM
    expressions, not UDFs.

    Parallelism: each xpath_* call re-parses its document, so the
    per-row cost is ~100x a normal projection — the one shape where
    scan parallelism, not bytes, is the bottleneck. The fixture's
    single-row-group orders file scans as ONE task (and its 2.7 MB
    sit under the catalog rebalance's byte gate, which assumes
    normal per-byte cost), which serialized ~450k XML parses on one
    core: 20.3 s in the r10 entry sweep. The layout-gated rebalance
    below (same guard as catalog._maybe_rebalance, byte gate dropped
    because the kernel is CPU-bound, not byte-bound) spreads the
    parse over every core — 20.3 s -> ~0.7 s at sf0.1 — and stays a
    structural no-op at production scale, where the scan already has
    more row groups than the cluster has cores.
    """
    orders = rebalance_cpu(
        spark, load_table(spark, sf_dir, "orders"), sf_dir, "orders"
    )
    rendered = orders.select(
        F.concat(
            F.lit('<order key="'),
            F.col("o_orderkey").cast("string"),
            F.lit('" cust="'),
            F.col("o_custkey").cast("string"),
            F.lit('"><priority>'),
            F.col("o_orderpriority"),
            F.lit("</priority><cents>"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
            F.lit("</cents></order>"),
        ).alias("xml")
    )
    extracted = rendered.select(
        F.expr("xpath_string(xml, '/order/priority')").alias("priority"),
        F.expr("xpath_long(xml, '/order/@cust')").alias("custkey"),
        F.expr("xpath_long(xml, '/order/cents')").alias("cents"),
    )
    return extracted.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.sum("custkey").alias("custkey_sum"),
        F.sum("cents").alias("cents"),
    )


@register(
    "fn_mask_pii",
    oracle="""
    WITH rendered AS (
        SELECT c_custkey,
               'AC-' || lpad(CAST(c_custkey * 7919 % 100000000 AS VARCHAR),
                             8, '0') AS account
        FROM customer
    ),
    masked AS (
        SELECT c_custkey, account,
               regexp_replace(account, '[0-9]', '#', 'g') AS masked_full,
               substr(regexp_replace(account, '[0-9]', '#', 'g'), 1,
                      length(account) - 4)
                 || substr(account, length(account) - 3, 4) AS masked_last4
        FROM rendered
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT masked_full) AS BIGINT)
               AS n_distinct_masked_full,
           CAST(COUNT(DISTINCT masked_last4) AS BIGINT)
               AS n_distinct_masked_last4,
           CAST(SUM(CASE WHEN masked_last4 LIKE 'AC-####%'
                    AND substr(masked_last4, -4) = substr(account, -4)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mask_correct
    FROM masked
    """,
)
def fn_mask_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column masking for PII egress: full-redaction and
    show-last-4 variants over synthesized account numbers, with the
    audit every masking policy needs — distinct-count of the masked
    column (k-anonymity collapse: full masking leaves ONE value;
    last-4 leaves ≤10⁴) and a correctness count proving the kept
    suffix matches the original. Spark's dedicated `mask()` exists,
    but the regexp formulation is used so the DuckDB oracle applies
    the IDENTICAL text — masking must behave the same in every
    engine that touches the data, which is the actual compliance
    requirement.

    Scan-local string work; the distinct legs are the only shuffles.
    """
    rendered = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("AC-"),
            F.lpad(
                (F.col("c_custkey") * 7919 % 100000000).cast("string"), 8, "0"
            ),
        ).alias("account"),
    )
    masked_full = F.regexp_replace("account", "[0-9]", "#")
    masked = rendered.select(
        "account",
        masked_full.alias("masked_full"),
        F.concat(
            F.expr(
                "substr(regexp_replace(account, '[0-9]', '#'), 1,"
                " length(account) - 4)"
            ),
            F.expr("substr(account, length(account) - 3, 4)"),
        ).alias("masked_last4"),
    )
    return masked.agg(
        F.count("*").alias("n"),
        F.countDistinct("masked_full").alias("n_distinct_masked_full"),
        F.countDistinct("masked_last4").alias("n_distinct_masked_last4"),
        F.sum(
            F.when(
                F.col("masked_last4").like("AC-####%")
                & (F.expr("substr(masked_last4, -4) = substr(account, -4)")),
                1,
            ).otherwise(0)
        ).alias("n_mask_correct"),
    )


@register(
    "fn_phone_e164",
    oracle="""
    WITH nums AS (
        SELECT c_custkey,
               500 + c_custkey % 400 AS area,
               100 + c_custkey * 3 % 900 AS exch,
               1000 + c_custkey * 7 % 9000 AS line
        FROM customer
    ),
    rendered AS (
        SELECT c_custkey, area, exch, line,
               CASE c_custkey % 3
                 WHEN 0 THEN '(' || CAST(area AS VARCHAR) || ') '
                      || CAST(exch AS VARCHAR) || '-' || CAST(line AS VARCHAR)
                 WHEN 1 THEN CAST(area AS VARCHAR) || '.'
                      || CAST(exch AS VARCHAR) || '.' || CAST(line AS VARCHAR)
                 ELSE '+1 ' || CAST(area AS VARCHAR) || ' '
                      || CAST(exch AS VARCHAR) || ' ' || CAST(line AS VARCHAR)
               END AS raw
        FROM nums
    ),
    normalized AS (
        SELECT c_custkey, area, exch, line, raw,
               '+1' || substr(regexp_replace(raw, '[^0-9]', '', 'g'),
                              length(regexp_replace(raw, '[^0-9]', '', 'g'))
                              - 9, 10) AS e164
        FROM rendered
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT e164) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN e164 = '+1' || CAST(area AS VARCHAR)
                         || CAST(exch AS VARCHAR) || CAST(line AS VARCHAR)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact,
           CAST(SUM(CASE WHEN length(e164) = 12 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_valid_length
    FROM normalized
    """,
)
def fn_phone_e164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phone-number normalization to E.164: three real-world formats
    ('(555) 123-4567', dotted, already-prefixed international) are
    rendered deterministically per customer, then normalized by
    stripping non-digits and keeping the LAST ten (so a leading
    country code can't double up) — with the round-trip audit proving
    every rendered variant lands on the identical canonical form.
    The entity-resolution prerequisite: phone joins fail silently
    until this step exists.

    Scan-local regexp/substr kernel; the distinct leg is the only
    shuffle.
    """
    nums = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (500 + F.col("c_custkey") % 400).alias("area"),
        (100 + F.col("c_custkey") * 3 % 900).alias("exch"),
        (1000 + F.col("c_custkey") * 7 % 9000).alias("line"),
    )
    a, x, l = (F.col(c).cast("string") for c in ("area", "exch", "line"))
    rendered = nums.select(
        "c_custkey",
        "area",
        "exch",
        "line",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("("), a, F.lit(") "), x, F.lit("-"), l),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(a, F.lit("."), x, F.lit("."), l),
        )
        .otherwise(F.concat(F.lit("+1 "), a, F.lit(" "), x, F.lit(" "), l))
        .alias("raw"),
    )
    digits = F.regexp_replace("raw", "[^0-9]", "")
    normalized = rendered.select(
        "area",
        "exch",
        "line",
        F.concat(
            F.lit("+1"), F.substring(digits, -10, 10)
        ).alias("e164"),
    )
    return normalized.agg(
        F.count("*").alias("n"),
        F.countDistinct("e164").alias("n_distinct"),
        F.sum(
            F.when(
                F.col("e164")
                == F.concat(
                    F.lit("+1"),
                    F.col("area").cast("string"),
                    F.col("exch").cast("string"),
                    F.col("line").cast("string"),
                ),
                1,
            ).otherwise(0)
        ).alias("n_roundtrip_exact"),
        F.sum(F.when(F.length("e164") == 12, 1).otherwise(0)).alias(
            "n_valid_length"
        ),
    )


@register(
    "fn_useragent_parse",
    oracle="""
    WITH ua AS (
        SELECT event_id,
               CASE event_id % 4
                 WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) '
                      || 'Chrome/' || CAST(90 + event_id % 30 AS VARCHAR)
                      || '.0.' || CAST(1000 + event_id % 5000 AS VARCHAR)
                      || '.100 Safari/537.36'
                 WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) '
                      || 'Version/' || CAST(13 + event_id % 5 AS VARCHAR)
                      || '.1 Safari/605.1.15'
                 WHEN 2 THEN 'Mozilla/5.0 (X11; Linux x86_64; rv:'
                      || CAST(78 + event_id % 40 AS VARCHAR)
                      || '.0) Gecko/20100101 Firefox/'
                      || CAST(78 + event_id % 40 AS VARCHAR) || '.0'
                 ELSE 'curl/' || CAST(7 AS VARCHAR) || '.'
                      || CAST(50 + event_id % 40 AS VARCHAR) || '.0'
               END AS ua
        FROM events
    ),
    parsed AS (
        SELECT CASE
                 WHEN ua LIKE '%Chrome/%' THEN 'chrome'
                 WHEN ua LIKE '%Firefox/%' THEN 'firefox'
                 WHEN ua LIKE '%Version/%' THEN 'safari'
                 WHEN ua LIKE 'curl/%' THEN 'curl'
                 ELSE 'other' END AS browser,
               CASE
                 WHEN ua LIKE '%Windows%' THEN 'windows'
                 WHEN ua LIKE '%Mac OS X%' THEN 'macos'
                 WHEN ua LIKE '%Linux%' THEN 'linux'
                 ELSE 'bot' END AS os,
               CAST(COALESCE(regexp_extract(ua,
                    '(?:Chrome|Firefox|Version|curl)/([0-9]+)', 1), '0')
                    AS BIGINT) AS major
        FROM ua
    )
    SELECT browser, os,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(major) AS BIGINT) AS min_major,
           CAST(MAX(major) AS BIGINT) AS max_major
    FROM parsed GROUP BY browser, os
    """,
)
def fn_useragent_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent parsing — the weblog-enrichment kernel: browser
    family by token precedence (Chrome before Safari, because every
    Chrome UA also says Safari — the classic UA-parsing trap, encoded
    in the CASE order), OS by platform token, major version by one
    anchored regexp over the alternation. Four realistic UA templates
    are rendered per event so the parse rules are exercised against
    Chrome/Safari/Firefox/curl shapes including the bot (curl) class.

    Scan-local LIKE + regexp_extract; the rollup is a tiny
    (browser × os) groupBy. Real UA taxonomies are bigger CASE
    ladders, not different plans.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id")
    k = F.col("event_id")
    ua = ev.select(
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/"),
                (90 + k % 30).cast("string"),
                F.lit(".0."),
                (1000 + k % 5000).cast("string"),
                F.lit(".100 Safari/537.36"),
            ),
        )
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15) Version/"),
                (13 + k % 5).cast("string"),
                F.lit(".1 Safari/605.1.15"),
            ),
        )
        .when(
            k % 4 == 2,
            F.concat(
                F.lit("Mozilla/5.0 (X11; Linux x86_64; rv:"),
                (78 + k % 40).cast("string"),
                F.lit(".0) Gecko/20100101 Firefox/"),
                (78 + k % 40).cast("string"),
                F.lit(".0"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("curl/7."), (50 + k % 40).cast("string"), F.lit(".0")
            )
        )
        .alias("ua")
    )
    parsed = ua.select(
        F.when(F.col("ua").like("%Chrome/%"), "chrome")
        .when(F.col("ua").like("%Firefox/%"), "firefox")
        .when(F.col("ua").like("%Version/%"), "safari")
        .when(F.col("ua").like("curl/%"), "curl")
        .otherwise("other")
        .alias("browser"),
        F.when(F.col("ua").like("%Windows%"), "windows")
        .when(F.col("ua").like("%Mac OS X%"), "macos")
        .when(F.col("ua").like("%Linux%"), "linux")
        .otherwise("bot")
        .alias("os"),
        F.coalesce(
            F.regexp_extract("ua", r"(?:Chrome|Firefox|Version|curl)/([0-9]+)", 1),
            F.lit("0"),
        )
        .cast("bigint")
        .alias("major"),
    )
    return parsed.groupBy("browser", "os").agg(
        F.count("*").alias("n"),
        F.min("major").alias("min_major"),
        F.max("major").alias("max_major"),
    )


@register(
    "fn_duration_format",
    oracle="""
    WITH durs AS (
        SELECT o_orderkey, CAST(o_orderkey * 37 % 360000 AS BIGINT) AS secs
        FROM orders
    ),
    rendered AS (
        SELECT secs,
               CAST(secs // 3600 AS VARCHAR) || 'h '
               || lpad(CAST(secs % 3600 // 60 AS VARCHAR), 2, '0') || 'm '
               || lpad(CAST(secs % 60 AS VARCHAR), 2, '0') || 's' AS human
        FROM durs
    ),
    parsed AS (
        SELECT secs, human,
               CAST(string_split(human, 'h ')[1] AS BIGINT) * 3600
             + CAST(string_split(string_split(human, 'h ')[2], 'm ')[1]
                    AS BIGINT) * 60
             + CAST(replace(string_split(human, 'm ')[2], 's', '') AS BIGINT)
                   AS roundtrip
        FROM rendered
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN roundtrip = secs THEN 1 ELSE 0 END) AS BIGINT)
               AS n_roundtrip_exact,
           CAST(MAX(secs) AS BIGINT) AS max_secs,
           CAST(SUM(length(human)) AS BIGINT) AS total_chars
    FROM parsed
    """,
)
def fn_duration_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-readable duration rendering ('27h 05m 03s') and its
    inverse parse — the log/SLA display format that, unlike
    timestamps, has no built-in round trip in either engine, so it's
    integer div/mod chains both ways with a full round-trip audit
    (roundtrip == secs for every row proves the renderer and parser
    compose to the identity — format bugs like a missing lpad break
    the parse-side split and show up as a count, not silence).

    Pure scan-local integer/string work.
    """
    durs = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") * 37 % 360000).cast("bigint").alias("secs")
    )
    rendered = durs.select(
        "secs",
        F.concat(
            F.expr("secs div 3600").cast("string"),
            F.lit("h "),
            F.lpad(F.expr("secs % 3600 div 60").cast("string"), 2, "0"),
            F.lit("m "),
            F.lpad((F.col("secs") % 60).cast("string"), 2, "0"),
            F.lit("s"),
        ).alias("human"),
    )
    parsed = rendered.select(
        "secs",
        "human",
        (
            F.element_at(F.split("human", "h "), 1).cast("bigint") * 3600
            + F.element_at(
                F.split(F.element_at(F.split("human", "h "), 2), "m "), 1
            ).cast("bigint")
            * 60
            + F.regexp_replace(
                F.element_at(F.split("human", "m "), 2), "s", ""
            ).cast("bigint")
        ).alias("roundtrip"),
    )
    return parsed.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("roundtrip") == F.col("secs"), 1).otherwise(0)
        ).alias("n_roundtrip_exact"),
        F.max("secs").alias("max_secs"),
        F.sum(F.length("human")).alias("total_chars"),
    )


@register(
    "fn_fiscal_calendar",
    oracle="""
    WITH fiscal AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CASE WHEN month(o_orderdate) >= 2
                    THEN CAST(year(o_orderdate) AS BIGINT)
                    ELSE CAST(year(o_orderdate) AS BIGINT) - 1 END AS fy,
               (CAST(month(o_orderdate) AS BIGINT) + 10) % 12 // 3 + 1 AS fq
        FROM orders
    )
    SELECT fy, CAST(fq AS BIGINT) AS fq,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM fiscal GROUP BY fy, fq
    """,
)
def fn_fiscal_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiscal calendar mapping — FY starts in FEBRUARY (the retail
    4-5-4 world's favorite trap): fiscal year is the calendar year of
    February-onward months (January belongs to the PRIOR fiscal
    year), fiscal quarter is ((month+10) mod 12) div 3 + 1 — so
    Feb/Mar/Apr = FQ1, Nov/Dec/Jan = FQ4 spanning the calendar
    boundary. Revenue rolled up by (FY, FQ) in exact cents; every
    "why don't our Q4 numbers match finance's" bug is this mapping
    done inconsistently, which is why it's oracle-pinned.

    Pure integer month arithmetic on the scan; one grouped sum.
    """
    fiscal = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        F.when(
            F.month("o_orderdate") >= 2, F.year("o_orderdate").cast("bigint")
        )
        .otherwise(F.year("o_orderdate").cast("bigint") - 1)
        .alias("fy"),
        (
            F.expr("(CAST(month(o_orderdate) AS BIGINT) + 10) % 12 div 3 + 1")
        ).alias("fq"),
    )
    return fiscal.groupBy("fy", F.col("fq").cast("bigint").alias("fq")).agg(
        F.count("*").alias("n_orders"), F.sum("cents").alias("cents")
    )


@register(
    "fn_bitpack",
    oracle="""
    WITH src AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey % 1048576 AS BIGINT) AS part20,
               CAST(l_suppkey % 16384 AS BIGINT) AS supp14,
               CAST(ROUND(l_quantity, 0) AS BIGINT) % 64 AS qty6,
               CAST(l_linenumber AS BIGINT) % 8 AS line3
        FROM lineitem WHERE l_orderkey % 97 = 0
    ),
    packed AS (
        SELECT l_orderkey, l_linenumber, part20, supp14, qty6, line3,
               (part20 << 23) | (supp14 << 9) | (qty6 << 3) | line3
                   AS packed
        FROM src
    ),
    unpacked AS (
        SELECT *,
               (packed >> 23) & 1048575 AS u_part,
               (packed >> 9) & 16383 AS u_supp,
               (packed >> 3) & 63 AS u_qty,
               packed & 7 AS u_line
        FROM packed
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN u_part = part20 AND u_supp = supp14
                    AND u_qty = qty6 AND u_line = line3
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact,
           CAST(COUNT(DISTINCT packed) AS BIGINT) AS n_distinct_packed,
           CAST(MAX(packed) AS BIGINT) AS max_packed
    FROM unpacked
    """,
)
def fn_bitpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-field packing: four small fields (20+14+6+3 = 43 bits)
    packed into one int64 with shifts and ORs, then unpacked with
    shifts and masks — the compact-key/storage trick behind composite
    surrogate keys, sort keys that encode multiple columns, and the
    quadkey/geohash family (fn_quadkey_rollup is this specialized to
    coordinates). The per-row round-trip audit proves field isolation
    (a mask off by one bit shows up as a count); distinct-packed
    equals distinct source tuples, certifying injectivity on this
    domain. All shifts stay below bit 62 (the engines disagree on the
    sign bit).

    Scan-local integer ops; the fixture filter bounds oracle output.
    """
    src = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 97 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_partkey") % 1048576).cast("bigint").alias("part20"),
            (F.col("l_suppkey") % 16384).cast("bigint").alias("supp14"),
            (F.round(F.col("l_quantity"), 0).cast("bigint") % 64).alias("qty6"),
            (F.col("l_linenumber").cast("bigint") % 8).alias("line3"),
        )
    )
    packed = src.withColumn(
        "packed",
        F.expr("(part20 << 23) | (supp14 << 9) | (qty6 << 3) | line3"),
    )
    unpacked = packed.select(
        "part20",
        "supp14",
        "qty6",
        "line3",
        "packed",
        F.expr("(packed >> 23) & 1048575").alias("u_part"),
        F.expr("(packed >> 9) & 16383").alias("u_supp"),
        F.expr("(packed >> 3) & 63").alias("u_qty"),
        F.expr("packed & 7").alias("u_line"),
    )
    return unpacked.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                (F.col("u_part") == F.col("part20"))
                & (F.col("u_supp") == F.col("supp14"))
                & (F.col("u_qty") == F.col("qty6"))
                & (F.col("u_line") == F.col("line3")),
                1,
            ).otherwise(0)
        ).alias("n_roundtrip_exact"),
        F.countDistinct("packed").alias("n_distinct_packed"),
        F.max("packed").alias("max_packed"),
    )


@register(
    "fn_month_end_arith",
    oracle="""
    WITH dated AS (
        SELECT o_orderkey, o_orderdate,
               CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_1m,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
               CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH
                    - INTERVAL 1 DAY AS DATE) AS month_end
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN day(o_orderdate) <> day(plus_1m)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_1m,
           CAST(SUM(CASE WHEN day(o_orderdate) <> day(plus_3m)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_3m,
           CAST(SUM(CASE WHEN o_orderdate = month_end THEN 1 ELSE 0 END)
                AS BIGINT) AS n_on_month_end,
           CAST(SUM(datediff('day', o_orderdate, plus_1m)) AS BIGINT)
               AS total_shift_days
    FROM dated
    """,
)
def fn_month_end_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end date arithmetic audit: add_months clamping (Jan 31 +
    1 month = Feb 28/29 — day-of-month changes), the last-day-of-month
    construction (truncate, +1 month, −1 day), and the actual day
    shift each addition produces — the billing/renewal-date semantics
    that silently drift when one system clamps and another rolls
    over. Spark's add_months and DuckDB's +INTERVAL both clamp, and
    this op PINS that agreement (if either engine changed policy the
    hash breaks — that's the regression the audit exists to catch).

    Scan-local date arithmetic and one aggregate.
    """
    dated = load_table(spark, sf_dir, "orders").select(
        "o_orderdate",
        F.add_months("o_orderdate", 1).alias("plus_1m"),
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.date_sub(
            F.add_months(F.date_trunc("month", "o_orderdate").cast("date"), 1), 1
        ).alias("month_end"),
    )
    return dated.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.dayofmonth("o_orderdate") != F.dayofmonth("plus_1m"), 1
            ).otherwise(0)
        ).alias("n_clamped_1m"),
        F.sum(
            F.when(
                F.dayofmonth("o_orderdate") != F.dayofmonth("plus_3m"), 1
            ).otherwise(0)
        ).alias("n_clamped_3m"),
        F.sum(
            F.when(F.col("o_orderdate") == F.col("month_end"), 1).otherwise(0)
        ).alias("n_on_month_end"),
        F.sum(F.datediff(F.col("plus_1m"), F.col("o_orderdate"))).alias(
            "total_shift_days"
        ),
    )


@register(
    "fn_logline_parse",
    oracle="""
    WITH lines AS (
        SELECT 'ts=' || CAST(epoch_us(ts) // 1000000 AS VARCHAR)
               || ' user=' || CAST(user_id AS VARCHAR)
               || ' type=' || event_type
               || ' cents=' || CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                                    AS VARCHAR)
               || CASE WHEN event_id % 11 = 0 THEN ' retry=true' ELSE '' END
                   AS line
        FROM events
    ),
    parsed AS (
        SELECT CAST(regexp_extract(line, 'user=([0-9]+)', 1) AS BIGINT)
                   AS user_id,
               regexp_extract(line, 'type=([a-z]+)', 1) AS event_type,
               CAST(regexp_extract(line, 'cents=(-?[0-9]+)', 1) AS BIGINT)
                   AS cents,
               CASE WHEN line LIKE '%retry=true%' THEN 1 ELSE 0 END AS retry
        FROM lines
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(retry) AS BIGINT) AS n_retries
    FROM parsed GROUP BY event_type
    """,
)
def fn_logline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """key=value log-line parsing: events rendered into classic
    logfmt ('ts=… user=… type=… cents=…' with an optional trailing
    flag), then recovered field-by-field with anchored capture-group
    regexps and re-aggregated — the observability-pipeline ingest
    shape (fluentd/vector do exactly this), proven lossless because
    the oracle computes the same rollup from the source columns. The
    optional `retry=true` token exercises absent-key handling (LIKE
    flag, not a failed extract).

    Scan-local regexp work; at 100 TB the per-field regexps fuse
    into one whole-stage-codegen pass over the line.
    """
    ev = load_table(spark, sf_dir, "events")
    lines = ev.select(
        F.concat(
            F.lit("ts="),
            F.col("ts").cast("timestamp").cast("long").cast("string"),
            F.lit(" user="),
            F.col("user_id").cast("string"),
            F.lit(" type="),
            F.col("event_type"),
            F.lit(" cents="),
            F.round(F.col("value") * 100, 0).cast("bigint").cast("string"),
            F.when(F.col("event_id") % 11 == 0, " retry=true").otherwise(""),
        ).alias("line")
    )
    parsed = lines.select(
        F.regexp_extract("line", "user=([0-9]+)", 1).cast("bigint").alias(
            "user_id"
        ),
        F.regexp_extract("line", "type=([a-z]+)", 1).alias("event_type"),
        F.regexp_extract("line", "cents=(-?[0-9]+)", 1).cast("bigint").alias(
            "cents"
        ),
        F.when(F.col("line").like("%retry=true%"), 1).otherwise(0).alias(
            "retry"
        ),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("cents").alias("cents"),
        F.sum("retry").alias("n_retries"),
    )


@register(
    "fn_iban_check",
    oracle="""
    WITH acct AS (
        SELECT c_custkey,
               lpad(CAST(c_custkey * 7919 % 10000000000 AS VARCHAR), 10, '0')
                   AS bban
        FROM customer
    ),
    rearranged AS (
        -- IBAN mod-97: BBAN ++ country('DE'->1314) ++ check('00'),
        -- as the integer BBAN*10^6 + 131400, taken mod 97 in chunks
        SELECT c_custkey, bban,
               (CAST(bban AS BIGINT) % 97 * 1000000 + 131400) % 97 AS r
        FROM acct
    ),
    finished AS (
        SELECT c_custkey, bban,
               98 - r AS check_digits,
               ((CAST(bban AS BIGINT) % 97) * 1000000
                + 131400 + (98 - r)) % 97 AS verify
        FROM rearranged
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN verify = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_self_valid,
           CAST(COUNT(DISTINCT check_digits) AS BIGINT)
               AS n_distinct_checks,
           CAST(MIN(check_digits) AS BIGINT) AS min_check,
           CAST(MAX(check_digits) AS BIGINT) AS max_check
    FROM finished
    """,
)
def fn_iban_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBAN check-digit computation by the ISO 7064 mod-97 scheme:
    the rearranged number (BBAN ++ country-as-digits ++ '00') is far
    past int64 for real IBANs, so the residue is taken in CHUNKS —
    (bban mod 97)·10⁶ + tail, re-reduced — the Horner trick that
    makes arbitrary-length mod-97 pure int64 arithmetic. Check
    digits = 98 − r, and re-verifying the finished IBAN ≡ 1 (mod 97)
    for every row is the in-query proof (the Luhn/EAN/Bloom
    self-validation pattern; n_self_valid must equal n).

    Scan-local integer arithmetic; completes the finance-identifier
    family: fn_checkdigit (Luhn/EAN), fn_money_parse, this.
    """
    acct = load_table(spark, sf_dir, "customer").select(
        F.lpad(
            (F.col("c_custkey") * 7919 % 10000000000).cast("string"), 10, "0"
        ).alias("bban")
    )
    finished = acct.select(
        "bban",
        F.expr(
            "98 - (CAST(bban AS BIGINT) % 97 * 1000000 + 131400) % 97"
        ).alias("check_digits"),
        F.expr(
            "((CAST(bban AS BIGINT) % 97) * 1000000 + 131400"
            " + (98 - (CAST(bban AS BIGINT) % 97 * 1000000 + 131400) % 97))"
            " % 97"
        ).alias("verify"),
    )
    return finished.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("verify") == 1, 1).otherwise(0)).alias(
            "n_self_valid"
        ),
        F.countDistinct("check_digits").alias("n_distinct_checks"),
        F.min("check_digits").alias("min_check"),
        F.max("check_digits").alias("max_check"),
    )


@register(
    "fn_time_bucket",
    oracle="""
    SELECT (epoch_us(ts) // 900000000) * 900 AS bucket_s,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100, 0) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM events
    WHERE user_id < 200
    GROUP BY 1, 2
    """,
)
def fn_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-width time bucketing (15-minute bars) via integer
    epoch division — the rollup grain ``date_trunc`` cannot express.
    Spark's ``window()`` produces a struct column; we emit the flat
    bucket-start second instead so the key is a plain BIGINT that
    groups, joins, and range-partitions cheaply at 100 TB (struct
    keys defeat parquet min/max pruning on re-read). Portable: both
    engines floor-divide the microsecond epoch (positive) by 9e8.

    Scale: one partial-aggregated shuffle on (bucket, type); bucket
    count grows with time span, not row count.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    bucket = F.expr("(CAST(CAST(ts AS TIMESTAMP) AS LONG) div 900) * 900")
    return (
        ev.select(
            bucket.alias("bucket_s"),
            "event_type",
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("bucket_s", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("cents").alias("value_cents"),
        )
    )


@register(
    "fn_uuid_v5",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5('doc-ns:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5' ||
           substr(hx, 14, 3) || '-' ||
           CASE CAST(('0x' || substr(hx, 17, 1)) AS INT) % 4
                WHEN 0 THEN '8' WHEN 1 THEN '9'
                WHEN 2 THEN 'a' ELSE 'b' END ||
           substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS uuid5,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_total
    FROM h
    """,
)
def fn_uuid_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic name-based UUIDs (v5-style: namespace + name ->
    stable id) — the idempotency key every ingest pipeline needs so
    re-runs upsert instead of duplicating. Built from md5 hex with
    version nibble pinned to 5 and variant folded into 8/9/a/b; pure
    string surgery, portable across engines, and embarrassingly
    parallel (a project over the scan; the row-count audit column
    rides a 1-row broadcast aggregate, NOT a COUNT() OVER () global
    window — the round-5 registry-wide single-partition sweep caught
    the original window form). Contrast with ``uuid()`` which is
    nondeterministic and breaks retry semantics at scale.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    h = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("doc-ns:"), F.col("doc_id").cast("string"))).alias(
            "hx"
        ),
    )
    variant = (
        F.conv(F.substring("hx", 17, 1), 16, 10).cast("int") % 4
    )
    uuid5 = F.concat(
        F.substring("hx", 1, 8), F.lit("-"),
        F.substring("hx", 9, 4), F.lit("-5"),
        F.substring("hx", 14, 3), F.lit("-"),
        F.when(variant == 0, F.lit("8"))
        .when(variant == 1, F.lit("9"))
        .when(variant == 2, F.lit("a"))
        .otherwise(F.lit("b")),
        F.substring("hx", 18, 3), F.lit("-"),
        F.substring("hx", 21, 12),
    )
    tot = h.agg(F.count("*").cast("long").alias("n_total"))
    return h.select("doc_id", uuid5.alias("uuid5")).crossJoin(
        F.broadcast(tot)
    )


@register(
    "fn_format_bytes",
    oracle="""
    WITH sized AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 1000, 0) AS BIGINT) AS nbytes
        FROM orders WHERE o_orderkey < 3000
    )
    SELECT o_orderkey, nbytes,
           CASE
             WHEN nbytes >= 1073741824 THEN
               CAST(nbytes // 1073741824 AS VARCHAR) || '.' ||
               CAST((nbytes % 1073741824) * 10 // 1073741824 AS VARCHAR)
               || ' GiB'
             WHEN nbytes >= 1048576 THEN
               CAST(nbytes // 1048576 AS VARCHAR) || '.' ||
               CAST((nbytes % 1048576) * 10 // 1048576 AS VARCHAR)
               || ' MiB'
             WHEN nbytes >= 1024 THEN
               CAST(nbytes // 1024 AS VARCHAR) || '.' ||
               CAST((nbytes % 1024) * 10 // 1024 AS VARCHAR) || ' KiB'
             ELSE CAST(nbytes AS VARCHAR) || ' B'
           END AS human
    FROM sized
    """,
)
def fn_format_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Human-readable byte formatting (KiB/MiB/GiB with one decimal)
    without a single float: magnitude CASE + integer div/mod, so the
    rendered string is identical on every engine — the log()/pow()
    formulation would not be (ln is 1-ulp unstable across engines,
    CLAUDE.md). The decimal digit is ``rem * 10 // unit`` (floor), a
    pure integer op. Shuffle-free projection.
    """
    sized = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 3000
    ).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1000, 0).cast("bigint").alias("nbytes"),
    )
    n = F.col("nbytes")

    def _fmt(unit: int, suffix: str) -> Column:
        whole = F.expr(f"nbytes div {unit}").cast("string")
        tenth = F.expr(f"(nbytes % {unit}) * 10 div {unit}").cast("string")
        return F.concat(whole, F.lit("."), tenth, F.lit(" " + suffix))

    human = (
        F.when(n >= 1073741824, _fmt(1073741824, "GiB"))
        .when(n >= 1048576, _fmt(1048576, "MiB"))
        .when(n >= 1024, _fmt(1024, "KiB"))
        .otherwise(F.concat(n.cast("string"), F.lit(" B")))
    )
    return sized.select("o_orderkey", "nbytes", human.alias("human"))


@register(
    "fn_array_zip",
    oracle="""
    WITH pair AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.embedding AS ea, b.embedding AS eb
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 97 = 0
    )
    SELECT id_a, id_b,
           CAST(len(ea) AS INT) AS dim,
           CAST(list_sum(list_transform(list_zip(ea, eb),
                p -> CASE WHEN CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
                               > 0 THEN 1 ELSE 0 END)) AS BIGINT)
               AS n_same_sign,
           CAST(list_sum(list_transform(list_zip(ea, eb),
                p -> CASE WHEN abs(CAST(p[1] AS DOUBLE))
                               >= abs(CAST(p[2] AS DOUBLE))
                          THEN 1 ELSE 0 END)) AS BIGINT) AS n_a_dominant
    FROM pair
    """,
)
def fn_array_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise combination of two vector columns via
    ``zip_with`` — the lane-paired primitive under every vector
    comparison (sign agreement, dominance counts here; deltas,
    hadamard products in general). Spark's zip_with fuses the pair
    walk into one codegen loop; DuckDB's twin is list_zip +
    list_transform. Counting predicates (integers) rather than
    summing float products keeps the result exactly portable. The
    adjacent-id self-join is an equi-join: shuffle on vec_id, linear.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    pair = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    same_sign = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CASE WHEN CAST(x AS DOUBLE)"
        " * CAST(y AS DOUBLE) > 0 THEN 1 ELSE 0 END),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    dominant = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CASE WHEN"
        " abs(CAST(x AS DOUBLE)) >= abs(CAST(y AS DOUBLE))"
        " THEN 1 ELSE 0 END), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return pair.select(
        "id_a",
        "id_b",
        F.size("ea").alias("dim"),
        same_sign.alias("n_same_sign"),
        dominant.alias("n_a_dominant"),
    )


@register(
    "fn_slug_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(
               substr(text, 1, 40)),
               '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g')) AS slug,
           CAST(length(trim(regexp_replace(regexp_replace(lower(
               substr(text, 1, 40)),
               '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g'))) AS INT)
               AS slug_len
    FROM documents WHERE doc_id < 300
    """,
)
def fn_slug_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-slug normalization (lowercase, non-alphanumeric runs
    collapsed to single hyphens, edge hyphens trimmed) of document
    title prefixes — the canonical-id primitive for content URLs
    and file names. Pure lower/regexp/trim chain with character-
    class-only patterns (both engines' regex dialects agree on
    classes and anchors; avoid lookarounds/unicode properties,
    which they do not share). Shuffle-free projection.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 300
    )
    slug = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.substring("text", 1, 40)), "[^a-z0-9]+", "-"
            ),
            "^-+|-+$",
            "",
        )
    )
    return docs.select(
        "doc_id",
        slug.alias("slug"),
        F.length(slug).cast("int").alias("slug_len"),
    )


@register(
    "sql_generate_series",
    oracle="""
    WITH spine AS (
        SELECT unnest(range(0, 24)) AS hod
    ),
    actual AS (
        SELECT CAST(hour(ts) AS BIGINT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    )
    SELECT CAST(s.hod AS BIGINT) AS hod,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_purchases
    FROM spine s LEFT JOIN actual a ON a.hod = s.hod
    """,
)
def sql_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated integer series as a dimension spine (all 24 hours
    LEFT JOINed against observed purchase hours) — the zero-filled
    axis every report needs so empty hours show as 0, not as
    missing rows. Spark's twin of DuckDB range() is
    spark.range()/sequence(); the spine is a LocalRelation-sized
    broadcast, never a shuffle. (ts_gapfill does this for dates
    with interpolation; this is the minimal integer-series surface.)
    """
    spine = spark.range(24).select(F.col("id").alias("hod"))
    actual = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.hour("ts").cast("long").alias("hod"))
        .agg(F.count("*").alias("n_events"))
    )
    return spine.join(actual, "hod", "left").select(
        "hod",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_purchases"),
    )


@register(
    "fn_geohash",
    oracle="""
    WITH geo AS (
        SELECT s_suppkey AS k,
               (s_suppkey * 7919) % 18000 - 9000 AS lat_c,
               (s_suppkey * 104729) % 36000 - 18000 AS lon_c
        FROM supplier
    ),
    q AS (
        SELECT k, lat_c, lon_c,
               CAST((lat_c + 9000) * 32768 // 18000 AS BIGINT) AS ylat,
               CAST((lon_c + 18000) * 32768 // 36000 AS BIGINT) AS xlon
        FROM geo
    ),
    sp1 AS (SELECT *, ((ylat | (ylat << 8)) & 16711935) AS y1,
                      ((xlon | (xlon << 8)) & 16711935) AS x1 FROM q),
    sp2 AS (SELECT *, ((y1 | (y1 << 4)) & 252645135) AS y2,
                      ((x1 | (x1 << 4)) & 252645135) AS x2 FROM sp1),
    sp3 AS (SELECT *, ((y2 | (y2 << 2)) & 858993459) AS y3,
                      ((x2 | (x2 << 2)) & 858993459) AS x3 FROM sp2),
    sp4 AS (SELECT *, ((y3 | (y3 << 1)) & 1431655765) AS y4,
                      ((x3 | (x3 << 1)) & 1431655765) AS x4 FROM sp3),
    z AS (SELECT k, lat_c, lon_c, CAST((x4 << 1) | y4 AS BIGINT) AS morton
          FROM sp4)
    SELECT k AS suppkey, lat_c, lon_c, morton,
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(morton // 33554432 % 32 AS INT) + 1, 1) ||
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(morton // 1048576 % 32 AS INT) + 1, 1) ||
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(morton // 32768 % 32 AS INT) + 1, 1) ||
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(morton // 1024 % 32 AS INT) + 1, 1) ||
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(morton // 32 % 32 AS INT) + 1, 1) ||
           substr('0123456789bcdefghjkmnpqrstuvwxyz',
                  CAST(morton % 32 AS INT) + 1, 1) AS geohash6
    FROM z
    """,
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-character geohash from scratch — quantize lat/lon (synthetic
    centidegrees off the supplier key) to 15-bit cells, interleave
    with the classic magic-mask Morton spread (x|x<<8 & 0x00FF00FF,
    then <<4/<<2/<<1 — four shift-and-mask rounds instead of a 15-term
    bit loop), longitude on the odd bits per the geohash convention,
    and base32-encode the 30-bit code in six substr picks. Everything
    is positive-int64 shift/mask/divmod, so Spark's shiftleft/&/| and
    DuckDB's <<,&,| agree bit-for-bit; the construction is verified
    against a bit-by-bit reference geohash in the unit layer. This is
    also the z-order clustering key you'd bucket or range-partition
    spatial joins on at scale (join_geo_grid's grid, refined).

    Scale: pure map-side projection, no shuffle.
    """
    sup = load_table(spark, sf_dir, "supplier")
    geo = sup.select(
        F.col("s_suppkey").alias("k"),
        ((F.col("s_suppkey") * 7919) % 18000 - 9000).alias("lat_c"),
        ((F.col("s_suppkey") * 104729) % 36000 - 18000).alias("lon_c"),
    )
    q = geo.select(
        "*",
        F.expr("CAST((lat_c + 9000) * 32768 div 18000 AS BIGINT)").alias(
            "ylat"
        ),
        F.expr("CAST((lon_c + 18000) * 32768 div 36000 AS BIGINT)").alias(
            "xlon"
        ),
    )
    out = q
    for name, src, (sh, mask) in [
        ("y1", "ylat", (8, 16711935)),
        ("x1", "xlon", (8, 16711935)),
        ("y2", "y1", (4, 252645135)),
        ("x2", "x1", (4, 252645135)),
        ("y3", "y2", (2, 858993459)),
        ("x3", "x2", (2, 858993459)),
        ("y4", "y3", (1, 1431655765)),
        ("x4", "x3", (1, 1431655765)),
    ]:
        out = out.withColumn(
            name,
            F.expr(f"({src} | shiftleft({src}, {sh})) & {mask}"),
        )
    z = out.select(
        "k",
        "lat_c",
        "lon_c",
        F.expr("CAST(shiftleft(x4, 1) | y4 AS BIGINT)").alias("morton"),
    )
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = [
        F.expr(
            f"substr('{alpha}',"
            f" CAST(morton div {32 ** j} % 32 AS INT) + 1, 1)"
        )
        for j in range(5, -1, -1)
    ]
    return z.select(
        F.col("k").alias("suppkey"),
        "lat_c",
        "lon_c",
        "morton",
        F.concat(*chars).alias("geohash6"),
    )


@register(
    "fn_snowflake_decode",
    oracle="""
    WITH src AS (
        SELECT event_id, user_id,
               epoch_ms(ts) AS ms
        FROM events
    ),
    packed AS (
        SELECT event_id,
               ms * 4194304
                 + (user_id % 1024) * 4096
                 + (event_id % 4096) AS snow_id,
               ms, user_id % 1024 AS worker, event_id % 4096 AS seq
        FROM src
    ),
    decoded AS (
        SELECT snow_id,
               snow_id // 4194304 AS ms_out,
               (snow_id // 4096) % 1024 AS worker_out,
               snow_id % 4096 AS seq_out,
               ms, worker, seq
        FROM packed
    )
    SELECT CAST(worker_out AS BIGINT) AS worker,
           CAST(COUNT(*) AS BIGINT) AS n_ids,
           CAST(MIN(ms_out) AS BIGINT) AS first_ms,
           CAST(MAX(ms_out) AS BIGINT) AS last_ms,
           CAST(SUM(CASE WHEN ms_out = ms AND worker_out = worker
                          AND seq_out = seq THEN 1 ELSE 0 END) AS BIGINT)
               AS n_roundtrip_ok
    FROM decoded
    GROUP BY worker_out
    """,
)
def fn_snowflake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style distributed id pack/unpack: 41-bit epoch-ms |
    10-bit worker | 12-bit sequence, the id scheme every
    high-throughput ingest assigns. Pack is pure multiply/add
    (ms * 2^22 stays under 2^63 through year 2088), decode is
    div/mod by literal powers of two — positive operands, so Spark
    div == DuckDB //. The n_roundtrip_ok column proves
    decode(pack(x)) == x for every row, aggregated per worker shard
    so the output doubles as a shard-balance report.

    Scale: map-side projection + one bounded-cardinality (1024-key)
    aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
    )
    packed = src.select(
        "event_id",
        (
            F.col("ms") * 4194304
            + (F.col("user_id") % 1024) * 4096
            + (F.col("event_id") % 4096)
        ).alias("snow_id"),
        "ms",
        (F.col("user_id") % 1024).alias("worker"),
        (F.col("event_id") % 4096).alias("seq"),
    )
    decoded = packed.select(
        "snow_id",
        F.expr("snow_id div 4194304").alias("ms_out"),
        F.expr("(snow_id div 4096) % 1024").alias("worker_out"),
        (F.col("snow_id") % 4096).alias("seq_out"),
        "ms",
        "worker",
        "seq",
    )
    return decoded.groupBy(
        F.col("worker_out").cast("long").alias("worker")
    ).agg(
        F.count("*").alias("n_ids"),
        F.min("ms_out").cast("long").alias("first_ms"),
        F.max("ms_out").cast("long").alias("last_ms"),
        F.sum(
            F.when(
                (F.col("ms_out") == F.col("ms"))
                & (F.col("worker_out") == F.col("worker"))
                & (F.col("seq_out") == F.col("seq")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_roundtrip_ok"),
    )


@register(
    "fn_round_policies",
    oracle="""
    WITH cents AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ),
    pol AS (
        SELECT o_orderkey, v,
               v // 100 AS q, v % 100 AS r,
               (v + 50) // 100 AS half_up,
               v // 100 + CASE WHEN v % 100 > 50 THEN 1
                               WHEN v % 100 = 50
                                    AND (v // 100) % 2 = 1 THEN 1
                               ELSE 0 END AS half_even,
               v // 100 AS toward_zero
        FROM cents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN r = 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_half_boundary,
           CAST(SUM(half_up) AS BIGINT) AS sum_half_up,
           CAST(SUM(half_even) AS BIGINT) AS sum_half_even,
           CAST(SUM(toward_zero) AS BIGINT) AS sum_truncate,
           CAST(SUM(half_up) - SUM(half_even) AS BIGINT)
               AS half_up_bias_dollars,
           CAST(SUM(CASE WHEN half_up != half_even THEN 1 ELSE 0 END)
                AS BIGINT) AS n_policy_diff
    FROM pol
    """,
)
def fn_round_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-policy audit — half-up vs banker's half-even vs
    truncation, applied to cents→dollars across the order book, with
    the accumulated bias between policies (the number a finance team
    asks for before standardizing rounding). Neither engine's
    round() is trusted: Spark rounds the double's shortest decimal
    repr, DuckDB the binary value (a known divergence class), so all
    three policies are spelled as INTEGER div/mod arithmetic on
    positive cents — half-even is q + (r>50 or (r=50 and q odd)) —
    making every output exact and portable by construction.

    Scale: map-side projection + one global reduce.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    pol = cents.select(
        F.expr("v div 100").alias("q"),
        (F.col("v") % 100).alias("r"),
        F.expr("(v + 50) div 100").alias("half_up"),
        F.expr(
            "v div 100 + CASE WHEN v % 100 > 50 THEN 1"
            " WHEN v % 100 = 50 AND (v div 100) % 2 = 1 THEN 1"
            " ELSE 0 END"
        ).alias("half_even"),
        F.expr("v div 100").alias("toward_zero"),
    )
    return pol.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("r") == 50, 1).otherwise(0)).alias(
            "n_half_boundary"
        ),
        F.sum("half_up").alias("sum_half_up"),
        F.sum("half_even").alias("sum_half_even"),
        F.sum("toward_zero").alias("sum_truncate"),
        (F.sum("half_up") - F.sum("half_even")).alias(
            "half_up_bias_dollars"
        ),
        F.sum(
            F.when(F.col("half_up") != F.col("half_even"), 1).otherwise(0)
        ).alias("n_policy_diff"),
    )


@register(
    "fn_easter_gauss",
    oracle="""
    WITH years AS (
        SELECT DISTINCT year(o_orderdate) AS y FROM orders
    ),
    comp AS (
        SELECT y,
               y % 19 AS a, y // 100 AS b, y % 100 AS c
        FROM years
    ),
    comp2 AS (
        SELECT *, b // 4 AS d, b % 4 AS e,
               (b + 8) // 25 AS f
        FROM comp
    ),
    comp3 AS (
        SELECT *, (b - f + 1) // 3 AS g,
               c // 4 AS i, c % 4 AS k
        FROM comp2
    ),
    comp4 AS (
        SELECT *, (19 * a + b - d - g + 15) % 30 AS h
        FROM comp3
    ),
    comp5 AS (
        SELECT *, (32 + 2 * e + 2 * i - h - k) % 7 AS l
        FROM comp4
    ),
    comp6 AS (
        SELECT *, (a + 11 * h + 22 * l) // 451 AS m
        FROM comp5
    ),
    easter AS (
        SELECT y,
               make_date(CAST(y AS INT),
                         CAST((h + l - 7 * m + 114) // 31 AS INT),
                         CAST((h + l - 7 * m + 114) % 31 + 1 AS INT))
                   AS easter_d
        FROM comp6
    )
    SELECT e.y AS year,
           strftime(e.easter_d, '%Y-%m-%d') AS easter,
           strftime(e.easter_d - 2, '%Y-%m-%d') AS good_friday,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS orders_easter_week
    FROM easter e
    LEFT JOIN orders o
      ON year(o.o_orderdate) = e.y
     AND CAST(o.o_orderdate AS DATE) BETWEEN e.easter_d - 3
                                         AND e.easter_d + 3
    GROUP BY e.y, e.easter_d
    """,
)
def fn_easter_gauss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computus — Easter via the anonymous Gregorian (Meeus/Butcher)
    algorithm, the classic proof that 'moveable feast' calendar
    features need no lookup table: eleven integer div/mod steps per
    year, all operands positive (Spark div == DuckDB //), then
    make_date on both engines. The holiday dates drive a real
    feature join: order volume in each year's Easter week — the
    calendar-feature-engineering every retail forecast needs
    (fn_fiscal_calendar's moveable-date complement).

    Scale: years are a dim-sized distinct; the ±3-day membership
    join prunes to one week per year before counting.
    """
    orders = load_table(spark, sf_dir, "orders")
    years = orders.select(
        F.year("o_orderdate").alias("y")
    ).distinct()
    e = (
        years.withColumn("a", F.col("y") % 19)
        .withColumn("b", F.expr("y div 100"))
        .withColumn("c", F.col("y") % 100)
        .withColumn("d", F.expr("b div 4"))
        .withColumn("e", F.col("b") % 4)
        .withColumn("f", F.expr("(b + 8) div 25"))
        .withColumn("g", F.expr("(b - f + 1) div 3"))
        .withColumn("i", F.expr("c div 4"))
        .withColumn("k", F.col("c") % 4)
        .withColumn("h", (19 * F.col("a") + F.col("b") - F.col("d")
                          - F.col("g") + 15) % 30)
        .withColumn(
            "l",
            (32 + 2 * F.col("e") + 2 * F.col("i") - F.col("h")
             - F.col("k")) % 7,
        )
        .withColumn("m", F.expr("(a + 11 * h + 22 * l) div 451"))
        .withColumn(
            "easter_d",
            F.expr(
                "make_date(CAST(y AS INT),"
                " CAST((h + l - 7 * m + 114) div 31 AS INT),"
                " CAST((h + l - 7 * m + 114) % 31 + 1 AS INT))"
            ),
        )
        .select("y", "easter_d")
    )
    joined = e.join(
        orders,
        (F.year("o_orderdate") == e.y)
        & (
            F.col("o_orderdate")
            .cast("date")
            .between(F.date_sub("easter_d", 3), F.date_add("easter_d", 3))
        ),
        "left",
    )
    return joined.groupBy("y", "easter_d").agg(
        F.count("o_orderkey").alias("orders_easter_week")
    ).select(
        F.col("y").alias("year"),
        F.date_format("easter_d", "yyyy-MM-dd").alias("easter"),
        F.date_format(F.date_sub("easter_d", 2), "yyyy-MM-dd").alias(
            "good_friday"
        ),
        "orders_easter_week",
    )


@register(
    "fn_allen_relations",
    oracle="""
    WITH ship AS (
        SELECT l_orderkey,
               CAST(epoch_us(CAST(MIN(l_shipdate) AS TIMESTAMP))
                    // 86400000000 AS BIGINT) AS b1,
               CAST(epoch_us(CAST(MAX(l_shipdate) AS TIMESTAMP))
                    // 86400000000 AS BIGINT) AS b2
        FROM lineitem GROUP BY l_orderkey
    ),
    pairs AS (
        SELECT CAST(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                    // 86400000000 AS BIGINT) AS a1,
               CAST(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                    // 86400000000 AS BIGINT)
                 + o.o_orderkey % 10 + 1 AS a2,
               s.b1, s.b2
        FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
    ),
    rel AS (
        SELECT CASE
            WHEN a1 = b1 AND a2 = b2 THEN 'equals'
            WHEN a2 < b1 THEN 'before'
            WHEN b2 < a1 THEN 'after'
            WHEN a2 = b1 THEN 'meets'
            WHEN b2 = a1 THEN 'met_by'
            WHEN a1 = b1 AND a2 < b2 THEN 'starts'
            WHEN a1 = b1 AND a2 > b2 THEN 'started_by'
            WHEN a2 = b2 AND a1 > b1 THEN 'finishes'
            WHEN a2 = b2 AND a1 < b1 THEN 'finished_by'
            WHEN a1 > b1 AND a2 < b2 THEN 'during'
            WHEN a1 < b1 AND a2 > b2 THEN 'contains'
            WHEN a1 < b1 AND a2 < b2 THEN 'overlaps'
            ELSE 'overlapped_by' END AS relation
        FROM pairs
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM rel GROUP BY relation
    """,
)
def fn_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra — the complete 13-relation
    classification (before/meets/overlaps/starts/during/finishes,
    their inverses, and equals) between each order's promise window
    and its actual ship window: the temporal-reasoning vocabulary
    every SLA/causality analysis reduces to, evaluated as a single
    mutually-exclusive CASE ladder over integer epoch-day endpoints
    (the ladder order makes the 13 cases total and disjoint — a
    property the classifier MUST have or two engines could disagree
    on boundary ties; here every branch is an exact integer
    comparison).

    Scale: one per-order partial agg + the o⋈s equi-join; the
    report is relation-grain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    day = "CAST(CAST({c} AS TIMESTAMP) AS LONG) div 86400"
    ship = li.groupBy("l_orderkey").agg(
        F.expr(day.format(c="MIN(l_shipdate)")).alias("b1"),
        F.expr(day.format(c="MAX(l_shipdate)")).alias("b2"),
    )
    pairs = orders.join(
        ship, ship.l_orderkey == orders.o_orderkey
    ).select(
        F.expr(day.format(c="o_orderdate")).alias("a1"),
        (
            F.expr(day.format(c="o_orderdate"))
            + F.col("o_orderkey") % 10
            + 1
        ).alias("a2"),
        "b1",
        "b2",
    )
    rel = pairs.select(
        F.when(
            (F.col("a1") == F.col("b1")) & (F.col("a2") == F.col("b2")),
            "equals",
        )
        .when(F.col("a2") < F.col("b1"), "before")
        .when(F.col("b2") < F.col("a1"), "after")
        .when(F.col("a2") == F.col("b1"), "meets")
        .when(F.col("b2") == F.col("a1"), "met_by")
        .when(
            (F.col("a1") == F.col("b1")) & (F.col("a2") < F.col("b2")),
            "starts",
        )
        .when(
            (F.col("a1") == F.col("b1")) & (F.col("a2") > F.col("b2")),
            "started_by",
        )
        .when(
            (F.col("a2") == F.col("b2")) & (F.col("a1") > F.col("b1")),
            "finishes",
        )
        .when(
            (F.col("a2") == F.col("b2")) & (F.col("a1") < F.col("b1")),
            "finished_by",
        )
        .when(
            (F.col("a1") > F.col("b1")) & (F.col("a2") < F.col("b2")),
            "during",
        )
        .when(
            (F.col("a1") < F.col("b1")) & (F.col("a2") > F.col("b2")),
            "contains",
        )
        .when(
            (F.col("a1") < F.col("b1")) & (F.col("a2") < F.col("b2")),
            "overlaps",
        )
        .otherwise("overlapped_by")
        .alias("relation")
    )
    return rel.groupBy("relation").agg(F.count("*").alias("n_orders"))


@register(
    "fn_jwt_decode",
    oracle="""
    WITH minted AS (
        SELECT c_custkey,
               translate(to_base64(CAST('{"alg":"none","typ":"JWT"}' AS BLOB)),
                         '+/', '-_')
               || '.' ||
               translate(to_base64(CAST(
                   '{"sub":' || CAST(c_custkey AS VARCHAR)
                   || ',"seg":"' || c_mktsegment
                   || '","bal":' || CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                                         AS VARCHAR)
                   || '}' AS BLOB)), '+/', '-_')
               || '.' AS token
        FROM customer WHERE c_custkey % 97 = 0
    ),
    decoded AS (
        SELECT c_custkey, token,
               decode(from_base64(translate(
                   string_split(token, '.')[2], '-_', '+/'))) AS claims
        FROM minted
    )
    SELECT c_custkey,
           CAST(json_extract_string(claims, '$.sub') AS BIGINT) AS sub_claim,
           json_extract_string(claims, '$.seg') AS seg_claim,
           CAST(json_extract_string(claims, '$.bal') AS BIGINT) AS bal_cents,
           CAST(length(token) AS BIGINT) AS token_len,
           CASE WHEN CAST(json_extract_string(claims, '$.sub') AS BIGINT)
                     = c_custkey THEN 1 ELSE 0 END AS roundtrip_ok
    FROM decoded
    ORDER BY c_custkey
    """,
)
def fn_jwt_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JWT mint → parse round-trip (unsigned tokens, padded-base64url
    variant — padding kept because DuckDB's from_base64 requires it;
    documented divergence from RFC 7515's unpadded form): claims are
    concatenated JSON built ONLY from integer casts and fixed strings
    (never float rendering), encoded with the url-safe alphabet via
    translate(+/ → -_), split back apart on '.', decoded, and
    json-extracted with a subject-equality audit.

    Scale: pure per-row projection — mint and parse both fuse into
    the scan with no shuffle but the presentation sort.
    """
    customer = load_table(spark, sf_dir, "customer")
    claims_json = F.concat(
        F.lit('{"sub":'),
        F.col("c_custkey").cast("string"),
        F.lit(',"seg":"'),
        F.col("c_mktsegment"),
        F.lit('","bal":'),
        F.round(F.col("c_acctbal") * 100).cast("long").cast("string"),
        F.lit("}"),
    )
    header = F.translate(
        F.base64(F.lit('{"alg":"none","typ":"JWT"}').cast("binary")),
        "+/",
        "-_",
    )
    token = F.concat(
        header,
        F.lit("."),
        F.translate(F.base64(claims_json.cast("binary")), "+/", "-_"),
        F.lit("."),
    )
    minted = customer.where(F.col("c_custkey") % 97 == 0).select(
        "c_custkey", token.alias("token")
    )
    claims = F.unbase64(
        F.translate(F.split(F.col("token"), "[.]").getItem(1), "-_", "+/")
    ).cast("string")
    decoded = minted.select("c_custkey", "token", claims.alias("claims"))
    sub = F.get_json_object("claims", "$.sub").cast("long")
    return decoded.select(
        "c_custkey",
        sub.alias("sub_claim"),
        F.get_json_object("claims", "$.seg").alias("seg_claim"),
        F.get_json_object("claims", "$.bal").cast("long").alias("bal_cents"),
        F.length("token").cast("long").alias("token_len"),
        F.when(sub == F.col("c_custkey"), 1).otherwise(0).alias("roundtrip_ok"),
    ).orderBy("c_custkey")


def _nw_unit(expr: str) -> str:
    """CASE mapping 0-19 -> English words for the SQL expression expr."""
    words = [
        "zero", "one", "two", "three", "four", "five", "six", "seven",
        "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
        "fifteen", "sixteen", "seventeen", "eighteen", "nineteen",
    ]
    cases = " ".join(
        f"WHEN {i} THEN '{w}'" for i, w in enumerate(words)
    )
    return f"(CASE {expr} {cases} END)"


def _nw_tens(expr: str) -> str:
    words = {2: "twenty", 3: "thirty", 4: "forty", 5: "fifty",
             6: "sixty", 7: "seventy", 8: "eighty", 9: "ninety"}
    cases = " ".join(f"WHEN {i} THEN '{w}'" for i, w in words.items())
    return f"(CASE {expr} {cases} END)"


def _nw_two(expr: str, dv: str) -> str:
    """0-99 -> words ('' for 0)."""
    return (
        f"(CASE WHEN {expr} = 0 THEN ''"
        f" WHEN {expr} < 20 THEN {_nw_unit(expr)}"
        f" ELSE {_nw_tens(f'({expr}) {dv} 10')} ||"
        f" (CASE WHEN ({expr}) % 10 > 0"
        f"       THEN '-' || {_nw_unit(f'({expr}) % 10')} ELSE '' END)"
        f" END)"
    )


def _nw_three(expr: str, dv: str) -> str:
    """0-999 -> words ('' for 0)."""
    h = f"({expr}) {dv} 100"
    r = f"({expr}) % 100"
    return (
        f"(CASE WHEN ({expr}) >= 100 THEN {_nw_unit(h)} || ' hundred' ||"
        f" (CASE WHEN {r} > 0 THEN ' ' || {_nw_two(r, dv)} ELSE '' END)"
        f" ELSE {_nw_two(expr, dv)} END)"
    )


def _nw_amount(expr: str, dv: str) -> str:
    """0-999999 -> words; 0 -> 'zero'."""
    th = f"({expr}) {dv} 1000"
    r = f"({expr}) % 1000"
    return (
        f"(CASE WHEN ({expr}) = 0 THEN 'zero'"
        f" WHEN ({expr}) >= 1000 THEN {_nw_three(th, dv)} || ' thousand' ||"
        f" (CASE WHEN {r} > 0 THEN ' ' || {_nw_three(r, dv)} ELSE '' END)"
        f" ELSE {_nw_three(expr, dv)} END)"
    )


_NW_ORACLE = f"""
    WITH amts AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS dollars,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100 AS rem_cents
        FROM orders WHERE o_orderkey % 499 = 0
    )
    SELECT o_orderkey, dollars, rem_cents,
           {_nw_amount('dollars', '//')}
           || ' dollars and '
           || lpad(CAST(rem_cents AS VARCHAR), 2, '0') || '/100'
               AS amount_words
    FROM amts
    ORDER BY o_orderkey
"""


@register("fn_number_to_words", oracle=_NW_ORACLE)
def fn_number_to_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Check-printing amount renderer: integer dollars 0–999,999 to
    English words ('twelve thousand three hundred forty-five dollars
    and 07/100') via nested CASE chains GENERATED from one Python
    template for both dialects (only the integer-division token
    differs: Spark ``div``, DuckDB ``//``).  No float formatting
    anywhere — amounts enter as exact cents and the cents remainder is a
    zero-padded integer.

    Scale: pure per-row string projection fused into the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    amts = orders.where(F.col("o_orderkey") % 499 == 0).select(
        "o_orderkey",
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) div 100"
        ).alias("dollars"),
        F.expr(
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100"
        ).alias("rem_cents"),
    )
    return amts.select(
        "o_orderkey",
        "dollars",
        "rem_cents",
        F.expr(
            _nw_amount("dollars", "div")
            + " || ' dollars and ' || lpad(CAST(rem_cents AS STRING), 2, '0')"
            + " || '/100'"
        ).alias("amount_words"),
    ).orderBy("o_orderkey")


@register(
    "fn_business_days",
    oracle="""
    WITH spans AS (
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS d0,
               CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) AS d1
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey % 101 = 0
    ),
    calc AS (
        SELECT l_orderkey, l_linenumber, d0, d1,
               (d0 + 4) % 7 AS dow0,
               d1 - d0 AS span_days
        FROM spans WHERE d1 >= d0
    )
    SELECT l_orderkey, l_linenumber, span_days,
           CAST(dow0 AS BIGINT) AS start_dow,
           CAST(5 * (span_days // 7)
                + LEAST(span_days % 7, GREATEST(0, 5 - dow0))
                + GREATEST(0, span_days % 7 - (7 - dow0))
               AS BIGINT) AS business_days
    FROM calc
    ORDER BY l_orderkey, l_linenumber
    """,
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day span between order and ship dates: full weeks
    contribute 5 days and the remainder is clamped against the
    weekend window starting from the order's day-of-week — all pure
    integer arithmetic on epoch days with (d+4)%7 weekday numbering
    (Monday=0; the portable form, since engine dayofweek() numbering
    differs).  The remainder term
    LEAST(rem, max(0, 5−dow)) + GREATEST(0, rem−(7−dow)) counts
    pre-weekend and post-weekend weekdays exactly (unit-pinned
    against a brute-force day walk).

    Scale: per-row projection over the join; the %101 fold keeps the
    demo output bounded while the formula itself is O(1) per row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spans = (
        li.where(F.col("l_orderkey") % 101 == 0)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "CAST(CAST(o_orderdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("d0"),
            F.expr(
                "CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT) div 86400"
            ).alias("d1"),
        )
    )
    calc = spans.where(F.col("d1") >= F.col("d0")).select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("d0") + 4) % 7).alias("dow0"),
        (F.col("d1") - F.col("d0")).alias("span_days"),
    )
    rem = F.col("span_days") % 7
    dow0 = F.col("dow0")
    return calc.select(
        "l_orderkey",
        "l_linenumber",
        "span_days",
        dow0.cast("long").alias("start_dow"),
        (
            5 * F.expr("span_days div 7")
            + F.least(rem, F.greatest(F.lit(0), 5 - dow0))
            + F.greatest(F.lit(0), rem - (7 - dow0))
        )
        .cast("long")
        .alias("business_days"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "fn_width_bucket",
    oracle="""
    WITH b AS (
        SELECT CASE WHEN cents < 0 THEN 0
                    WHEN cents >= 60000000 THEN 13
                    ELSE (cents * 12) // 60000000 + 1 END AS bucket
        FROM (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        )
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width bucketing via Spark's NATIVE width_bucket(x, 0,
    600000.00, 12) over order totals in cents — DuckDB has no
    width_bucket, so the oracle is its exact integer definition
    ((x·n) div range + 1 with under/overflow buckets 0 and n+1),
    which doubles as the cross-engine proof of Spark's bucket
    boundary semantics on integer operands (no float edges).

    Scale: projection + 14-group fold.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.expr(
            "width_bucket(CAST(ROUND(o_totalprice * 100) AS BIGINT),"
            " 0, 60000000, 12)"
        )
        .cast("long")
        .alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("bucket")
    )


@register(
    "fn_soundex_match",
    oracle="""
    WITH words AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    clean AS (
        SELECT word FROM words WHERE regexp_full_match(word, '[a-z]+')
    ),
    chars AS (
        SELECT word,
               unnest(string_split(word, '')) AS ch,
               unnest(range(1, length(word) + 1)) AS pos
        FROM clean
    ),
    kept AS (
        SELECT word, ch, pos,
               translate(ch, 'abcdefghijklmnopqrstuvwxyz',
                         '01230120022455012623010202') AS code
        FROM chars
        WHERE pos = 1 OR ch NOT IN ('h', 'w')
    ),
    collapsed AS (
        SELECT word, pos, code,
               lag(code) OVER (PARTITION BY word ORDER BY pos) AS prev_code
        FROM kept
    ),
    digits AS (
        SELECT word, pos, code
        FROM collapsed
        WHERE pos > 1 AND code <> '0'
              AND (prev_code IS NULL OR code <> prev_code)
    ),
    agg AS (
        SELECT c.word,
               upper(substr(c.word, 1, 1))
                 || COALESCE(string_agg(d.code, '' ORDER BY d.pos), '')
                   AS raw
        FROM clean c LEFT JOIN digits d ON d.word = c.word
        GROUP BY c.word
    ),
    coded AS (SELECT word, substr(raw || '000', 1, 4) AS sdx FROM agg)
    SELECT word, sdx,
           CAST(count(*) OVER (PARTITION BY sdx) AS BIGINT) AS n_same_code
    FROM coded
    ORDER BY word
    """,
)
def fn_soundex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic keys over the corpus vocabulary — fuzzy-name
    blocking for record linkage. This is a deliberate INDEPENDENT-
    CONSTRUCTION parity check: Spark uses its built-in ``soundex()``
    (catalyst SoundEx expression) while the DuckDB oracle hand-builds
    American Soundex from first principles (h/w transparency via row
    removal, vowels as adjacency breakers via code '0', duplicate
    collapse via lag(), 3-digit pad) — two implementations agreeing
    bit-for-bit is a far stronger proof than shared SQL text, and a
    unit test additionally pins the classic Ashcraft/Tymczak/Pfister
    edge cases.

    Scale: vocabulary-sized after the distinct; the phonetic key is a
    shuffle-free projection either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .where(F.col("word").rlike("^[a-z]+$"))
    )
    coded = words.select("word", F.soundex("word").alias("sdx"))
    return coded.select(
        "word",
        "sdx",
        F.count("*")
        .over(Window.partitionBy("sdx"))
        .cast("long")
        .alias("n_same_code"),
    ).orderBy("word")


_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

# Unrolled bijective digit math generated once: 8 base-58 digits cover
# ids < 58^8 ≈ 1.28e14. Integer division spelled portably as
# (a - a % b) / b (positive operands), so the SAME text runs on both
# engines.


def _b58_encode_sql(col: str) -> str:
    parts = []
    for i in range(8):
        p = 58 ** (7 - i)
        d = f"CAST(({col} - ({col} % {p})) / {p} AS BIGINT) % 58"
        parts.append(f"substr('{_B58_ALPHABET}', CAST({d} AS INT) + 1, 1)")
    return "concat(" + ", ".join(parts) + ")"


def _b58_decode_sql(col: str) -> str:
    terms = []
    for i in range(8):
        p = 58 ** (7 - i)
        terms.append(
            f"(CAST(instr('{_B58_ALPHABET}', substr({col}, {i + 1}, 1)) "
            f"AS BIGINT) - 1) * CAST({p} AS BIGINT)"
        )
    return " + ".join(terms)


_B58_TAIL = (
    """
codes AS (
    SELECT o_orderkey AS k, {enc} AS code
    FROM {orders}
),
verify AS (
    SELECT k, code, {dec} AS back FROM codes
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN back = k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_roundtrip_ok,
       MIN(code) AS min_code,
       MAX(code) AS max_code,
       min(md5(code)) AS code_digest
FROM verify"""
)


@register(
    "fn_base58_codec",
    oracle="WITH "
    + _B58_TAIL.format(
        orders="orders",
        enc=_b58_encode_sql("o_orderkey"),
        dec=_b58_decode_sql("code"),
    ),
)
def fn_base58_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base58 id codec (the Bitcoin/IPFS alphabet — no 0/O/I/l
    lookalikes): fixed-width 8-digit encode of order keys via
    unrolled positional arithmetic with the portable floor-div
    (a − a%p)/p, decode via instr() positions, and a full round-trip
    proof column. Fixed width keeps codes lexicographically ordered
    like the ids — the property short-link tables index on.

    Scale: shuffle-free projection; the proof aggregates in one
    partial-aggregable pass.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("b58_orders")
    return spark.sql(
        "WITH "
        + _B58_TAIL.format(
            orders="b58_orders",
            enc=_b58_encode_sql("o_orderkey"),
            dec=_b58_decode_sql("code"),
        )
    )


@register(
    "fn_map_ops",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
        SELECT flag, CAST(SUM(c) AS BIGINT) AS t FROM counts GROUP BY flag
    ),
    shares AS (
        SELECT c.flag, c.status, c.c,
               CAST(c.c * 1000000 AS BIGINT) // t.t AS share_ppm
        FROM counts c JOIN tot t ON t.flag = c.flag
    )
    SELECT flag,
           string_agg(status || ':' || CAST(share_ppm AS VARCHAR),
                      ',' ORDER BY status) AS major_entries,
           CAST(count(*) AS BIGINT) AS n_major
    FROM shares
    WHERE share_ppm >= 100000
    GROUP BY flag
    ORDER BY flag
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end-to-end: per returnflag build a
    status->count MAP (map_from_entries over collect_list), convert
    counts to ppm shares with transform_values, drop minor entries
    with map_filter, and render sorted entries — the MapType API
    surface (Spark-only; the DuckDB twin computes the same table
    relationally, so the map pipeline's SEMANTICS are what's
    verified, not shared text).

    Scale: map cardinality = per-flag status domain (bounded);
    everything group-local after one partial agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
    ).agg(F.count("*").cast("long").alias("c"))
    maps = counts.groupBy("flag").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("status", "c")))
        ).alias("m"),
        F.sum("c").cast("long").alias("t"),
    )
    return (
        maps.select(
            "flag",
            F.expr(
                "map_filter(transform_values(m, (k, v) -> "
                "CAST(v * 1000000 div t AS BIGINT)), "
                "(k, v) -> v >= 100000)"
            ).alias("mm"),
        )
        .select(
            "flag",
            F.expr(
                "array_join(transform(map_entries(mm), e -> "
                "concat(e.key, ':', CAST(e.value AS STRING))), ',')"
            ).alias("major_entries"),
            F.expr("CAST(size(mm) AS BIGINT)").alias("n_major"),
        )
        .orderBy("flag")
    )


@register(
    "fn_natural_sort",
    oracle=r"""
    WITH keys AS (
        SELECT c_name,
               regexp_replace(c_name, '([0-9]+)', '0000000000\1', 'g')
                   AS padded_raw
        FROM customer WHERE c_custkey < 60
    ),
    normed AS (
        SELECT c_name,
               regexp_replace(padded_raw, '0*([0-9]{10})', '\1', 'g')
                   AS sort_key
        FROM keys
    )
    SELECT CAST(row_number() OVER (ORDER BY sort_key, c_name) AS BIGINT)
               AS pos,
           c_name, sort_key
    FROM normed
    ORDER BY pos
    """,
)
def fn_natural_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural (alphanumeric) ordering: 'file2' before 'file10' by
    zero-padding every digit run to 10 places inside a derived sort
    key — two class-only regexes (the shared Java/RE2 subset), no
    UDF. The padded key sorts lexicographically exactly as a human
    reads versioned names; original strings ride along untouched.

    Scale: shuffle-free key projection; the sort itself is whatever
    the consumer orders by.
    """
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") < 60
    )
    keys = cust.select(
        "c_name",
        F.regexp_replace(
            F.col("c_name"), "([0-9]+)", "0000000000$1"
        ).alias("padded_raw"),
    )
    normed = keys.select(
        "c_name",
        F.regexp_replace(
            F.col("padded_raw"), r"0*([0-9]{10})", r"$1"
        ).alias("sort_key"),
    )
    w = Window.orderBy("sort_key", "c_name")
    return normed.select(
        F.row_number().over(w).cast("long").alias("pos"),
        "c_name",
        "sort_key",
    ).orderBy("pos")


def _feistel_sql(duck: bool) -> str:
    """Two-round Feistel network over 16-bit halves, emitted per
    dialect (hash60 text and xor spelling differ; structure is
    identical)."""

    def ff(r: str, rnd: int) -> str:
        if duck:
            arg = f"CAST({r} AS VARCHAR) || '#r{rnd}'"
        else:
            arg = f"CAST({r} AS STRING) || '#r{rnd}'"
        if duck:
            return (
                f"(CAST(('0x' || substr(md5({arg}), 1, 15)) AS BIGINT)"
                f" % 65536)"
            )
        return (
            f"(CAST(conv(substr(md5({arg}), 1, 15), 16, 10) AS BIGINT)"
            f" % 65536)"
        )

    x = "xor({a}, {b})" if duck else "({a} ^ {b})"
    dv = "//" if duck else "div"
    return f"""
split AS (
    SELECT k, (k - k % 65536) {dv} 65536 AS l0, k % 65536 AS r0
    FROM {{ids}}
),
enc1 AS (SELECT k, r0 AS l1, {x.format(a='l0', b=ff('r0', 1))} AS r1
         FROM split),
enc2 AS (SELECT k, r1 AS l2, {x.format(a='l1', b=ff('r1', 2))} AS r2
         FROM enc1),
coded AS (SELECT k, l2 * 65536 + r2 AS token FROM enc2),
dec AS (
    SELECT k, token, (token - token % 65536) {dv} 65536 AS l2,
           token % 65536 AS r2
    FROM coded
),
dec1 AS (SELECT k, token, {x.format(a='r2', b=ff('l2', 2))} AS l1,
                l2 AS r1 FROM dec),
dec0 AS (SELECT k, token, {x.format(a='r1', b=ff('l1', 1))} AS l0,
                l1 AS r0 FROM dec1),
back AS (SELECT k, token, l0 * 65536 + r0 AS back_k FROM dec0)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN back_k = k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_roundtrip,
       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(CASE WHEN token = k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fixed_points,
       min(token) AS min_token, max(token) AS max_token
FROM back"""


@register(
    "fn_feistel_permutation",
    oracle="WITH ids AS (SELECT o_orderkey AS k FROM orders),"
    + _feistel_sql(duck=True).format(ids="ids"),
)
def fn_feistel_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-preserving id obfuscation: a 2-round Feistel network
    over 16-bit halves with md5-derived round functions — a BIJECTION
    on 32-bit ids by construction (decode reverses the rounds), so
    obfuscated tokens can be published without a lookup table and
    joined back losslessly. The proof columns certify it on data:
    full round-trip, all tokens distinct, zero fixed points. Each
    dialect spells xor/hash natively; the network structure is
    identical.

    Scale: shuffle-free projection; COUNT(DISTINCT token) is the
    only shuffled aggregate.
    """
    load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    ).createOrReplaceTempView("feistel_ids")
    return spark.sql(
        "WITH " + _feistel_sql(duck=False).format(ids="feistel_ids").lstrip()
    )


def _luhn_terms(base: str) -> str:
    """Σ of Luhn-weighted digits of a 10-char digit string expression
    — identical SQL text on both engines (substr + CAST + CASE).
    Digit i (1-indexed) is doubled when the appended check digit
    makes its position-from-the-right even, i.e. when i is even."""
    terms = []
    for i in range(1, 11):
        d = f"CAST(substr({base}, {i}, 1) AS BIGINT)"
        if i % 2 == 0:
            terms.append(
                f"(CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END)"
            )
        else:
            terms.append(d)
    return " + ".join(terms)


_LUHN_BASE = (
    "lpad(CAST((CAST(c_custkey AS BIGINT) * 37) % 10000000000 AS VARCHAR(20)),"
    " 10, '0')"
)
_LUHN_CORRUPT = (
    "CASE WHEN c_custkey % 13 = 0 THEN"
    " CAST((CAST(substr(acct, 1, 1) AS BIGINT) + 5) % 10 AS VARCHAR(20))"
    " || substr(acct, 2) ELSE acct END"
)


@register(
    "fn_luhn_checksum",
    oracle=f"""
    WITH based AS (
        SELECT c_custkey, {_LUHN_BASE} AS base FROM customer
    ),
    minted AS (
        SELECT c_custkey, base,
               base || CAST((10 - ({_luhn_terms('base')}) % 10) % 10
                            AS VARCHAR(20)) AS acct
        FROM based
    ),
    wired AS (
        SELECT c_custkey, {_LUHN_CORRUPT} AS wire_acct FROM minted
    ),
    validated AS (
        SELECT c_custkey,
               CASE WHEN (({_luhn_terms('wire_acct')})
                          + CAST(substr(wire_acct, 11, 1) AS BIGINT))
                         % 10 = 0
                    THEN 1 ELSE 0 END AS is_valid
        FROM wired
    )
    SELECT is_valid,
           CAST(COUNT(*) AS BIGINT) AS n_accounts,
           CAST(SUM(c_custkey) AS BIGINT) AS custkey_sum
    FROM validated GROUP BY is_valid
    """,
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 check digits — mint a valid account number per
    customer (10 synthetic digits + computed check), corrupt every
    13th one in transit (first digit +5 mod 10 — a non-doubled
    position, so the checksum always catches it), and validate on
    arrival: the card-number / IMEI / national-id ingestion gate.
    The mint→corrupt→validate round proves the validator catches
    exactly the corrupted population and nothing else (unit-pinned
    against Python's textbook Luhn, since Spark and the oracle share
    the digit-surgery text).

    Pure per-row string/integer expressions — embarrassingly
    parallel, no shuffle until the 2-cell audit aggregate.
    """
    cust = load_table(spark, sf_dir, "customer")
    based = cust.select(
        "c_custkey", F.expr(_LUHN_BASE).alias("base")
    )
    minted = based.select(
        "c_custkey",
        F.expr(
            f"base || CAST((10 - ({_luhn_terms('base')}) % 10) % 10"
            " AS VARCHAR(20))"
        ).alias("acct"),
    )
    wired = minted.select(
        "c_custkey", F.expr(_LUHN_CORRUPT).alias("wire_acct")
    )
    validated = wired.select(
        "c_custkey",
        F.expr(
            f"CASE WHEN (({_luhn_terms('wire_acct')})"
            " + CAST(substr(wire_acct, 11, 1) AS BIGINT)) % 10 = 0"
            " THEN 1 ELSE 0 END"
        ).alias("is_valid"),
    )
    return validated.groupBy("is_valid").agg(
        F.count("*").alias("n_accounts"),
        F.sum("c_custkey").cast("long").alias("custkey_sum"),
    )


@register(
    "fn_collation_match",
    oracle="""
    WITH mangled AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
                    ELSE o_orderpriority END AS pr
        FROM orders
    )
    SELECT lower(MIN(pr)) AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN pr = lower(pr) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lowercase
    FROM mangled
    GROUP BY lower(pr)
    ORDER BY priority
    """,
)
def fn_collation_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 COLLATION support as grouping semantics: a feed whose
    priority labels arrive case-mangled (half the rows lowercased —
    the classic multi-producer normalization bug) groups on
    ``UTF8_LCASE``-collated equality instead of hand-folding with
    lower() in every expression; the output counts how mangled each
    label family is.

    Engine note (probed, not assumed): collated keys do not support
    binary equality, so Spark 4.1 falls back from hash- to SORT-based
    strategies for them — fine for GROUP BY (sort aggregates still do
    map-side partials; the shape stays one partial-aggregable pass)
    but NOT for joins (a collated equi-join plans as SortMergeJoin
    even against a 5-row dimension — never broadcastable; this op
    deliberately uses the aggregate form, and a production join on
    collated keys should pre-fold to a binary key). The group
    representative publishes as lower(MIN(pr)) because the collated
    MIN may surface any case variant of a tied group — folding makes
    it deterministic on both engines. The DuckDB oracle spells the
    same semantics with lower() grouping (UTF8_LCASE ≡ lowercase-fold
    equality on this ASCII domain).
    """
    orders = load_table(spark, sf_dir, "orders")
    mangled = orders.select(
        F.expr(
            "CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)"
            " ELSE o_orderpriority END"
        ).alias("pr")
    )
    return (
        mangled.groupBy(F.expr("pr COLLATE UTF8_LCASE").alias("k"))
        .agg(
            F.expr("lower(MIN(pr))").alias("priority"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.when(F.col("pr") == F.lower("pr"), 1).otherwise(0))
            .cast("long")
            .alias("n_lowercase"),
        )
        .select("priority", "n_orders", "n_lowercase")
        .orderBy("priority")
    )


_ULID_ORACLE = """
    WITH base AS (
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   * 86400000 AS ts_ms,
               CAST(('0x' || substr(md5('ulid:' || CAST(o_orderkey AS VARCHAR)), 1, 10)) AS BIGINT) AS r_hi,
               CAST(('0x' || substr(md5('ulid:' || CAST(o_orderkey AS VARCHAR)), 11, 10)) AS BIGINT) AS r_lo
        FROM orders WHERE o_orderkey < 4096
    ),
    minted AS (
        SELECT o_orderkey, ts_ms,
               substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 35184372088832) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 1099511627776) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 34359738368) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 1073741824) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 33554432) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 1048576) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 32768) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 1024) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 32) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms // 1) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 34359738368) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 1073741824) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 33554432) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 1048576) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 32768) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 1024) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 32) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi // 1) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 34359738368) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 1073741824) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 33554432) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 1048576) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 32768) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 1024) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 32) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo // 1) % 32 AS INT) + 1, 1) AS ulid
        FROM base
    )
    SELECT o_orderkey, ulid, ts_ms,
           CAST(((CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 1, 1)) AS BIGINT) - 1) * 35184372088832
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 2, 1)) AS BIGINT) - 1) * 1099511627776
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 3, 1)) AS BIGINT) - 1) * 34359738368
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 4, 1)) AS BIGINT) - 1) * 1073741824
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 5, 1)) AS BIGINT) - 1) * 33554432
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 6, 1)) AS BIGINT) - 1) * 1048576
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 7, 1)) AS BIGINT) - 1) * 32768
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 8, 1)) AS BIGINT) - 1) * 1024
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 9, 1)) AS BIGINT) - 1) * 32
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 10, 1)) AS BIGINT) - 1) * 1) AS BIGINT) AS ts_decoded,
           CAST(CASE WHEN ((CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 1, 1)) AS BIGINT) - 1) * 35184372088832
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 2, 1)) AS BIGINT) - 1) * 1099511627776
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 3, 1)) AS BIGINT) - 1) * 34359738368
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 4, 1)) AS BIGINT) - 1) * 1073741824
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 5, 1)) AS BIGINT) - 1) * 33554432
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 6, 1)) AS BIGINT) - 1) * 1048576
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 7, 1)) AS BIGINT) - 1) * 32768
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 8, 1)) AS BIGINT) - 1) * 1024
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 9, 1)) AS BIGINT) - 1) * 32
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 10, 1)) AS BIGINT) - 1) * 1) = ts_ms
                THEN 1 ELSE 0 END AS BIGINT) AS round_trip_ok
    FROM minted
"""

_ULID_SPARK_SQL = """
    WITH base AS (
        SELECT o_orderkey,
               CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT)
                   * 86400000 AS ts_ms,
               CAST(conv(substr(md5(concat('ulid:', CAST(o_orderkey AS STRING))), 1, 10), 16, 10) AS BIGINT) AS r_hi,
               CAST(conv(substr(md5(concat('ulid:', CAST(o_orderkey AS STRING))), 11, 10), 16, 10) AS BIGINT) AS r_lo
        FROM orders WHERE o_orderkey < 4096
    ),
    minted AS (
        SELECT o_orderkey, ts_ms,
               substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 35184372088832) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 1099511627776) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 34359738368) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 1073741824) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 33554432) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 1048576) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 32768) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 1024) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 32) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((ts_ms div 1) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 34359738368) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 1073741824) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 33554432) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 1048576) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 32768) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 1024) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 32) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_hi div 1) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 34359738368) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 1073741824) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 33554432) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 1048576) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 32768) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 1024) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 32) % 32 AS INT) + 1, 1)
               || substr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', CAST((r_lo div 1) % 32 AS INT) + 1, 1) AS ulid
        FROM base
    )
    SELECT o_orderkey, ulid, ts_ms,
           CAST(((CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 1, 1)) AS BIGINT) - 1) * 35184372088832
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 2, 1)) AS BIGINT) - 1) * 1099511627776
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 3, 1)) AS BIGINT) - 1) * 34359738368
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 4, 1)) AS BIGINT) - 1) * 1073741824
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 5, 1)) AS BIGINT) - 1) * 33554432
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 6, 1)) AS BIGINT) - 1) * 1048576
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 7, 1)) AS BIGINT) - 1) * 32768
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 8, 1)) AS BIGINT) - 1) * 1024
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 9, 1)) AS BIGINT) - 1) * 32
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 10, 1)) AS BIGINT) - 1) * 1) AS BIGINT) AS ts_decoded,
           CAST(CASE WHEN ((CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 1, 1)) AS BIGINT) - 1) * 35184372088832
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 2, 1)) AS BIGINT) - 1) * 1099511627776
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 3, 1)) AS BIGINT) - 1) * 34359738368
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 4, 1)) AS BIGINT) - 1) * 1073741824
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 5, 1)) AS BIGINT) - 1) * 33554432
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 6, 1)) AS BIGINT) - 1) * 1048576
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 7, 1)) AS BIGINT) - 1) * 32768
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 8, 1)) AS BIGINT) - 1) * 1024
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 9, 1)) AS BIGINT) - 1) * 32
                + (CAST(instr('0123456789ABCDEFGHJKMNPQRSTVWXYZ', substr(ulid, 10, 1)) AS BIGINT) - 1) * 1) = ts_ms
                THEN 1 ELSE 0 END AS BIGINT) AS round_trip_ok
    FROM minted
"""


@register("fn_ulid_codec", oracle=_ULID_ORACLE)
def fn_ulid_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ULID mint → decode round trip — the sortable-id codec family
    member alongside `fn_snowflake_decode` and `fn_uuid_v5`: 48-bit
    millisecond timestamp + 80-bit entropy (md5-derived, split into
    two int64-safe 40-bit words — never a 128-bit value) rendered as
    26 Crockford base-32 characters by pure div/mod arithmetic, then
    DECODED back character-by-character (instr against the alphabet)
    and the recovered timestamp equality asserted per row. Encode and
    decode are generated from one Python loop so the 26-term
    expressions cannot drift; the only per-dialect differences are
    the integer-division token and the hex→int idiom (the r3
    portable-hash recipe).

    Scale: one narrow codegen projection, no shuffle, no UDF — id
    minting at ingest speed.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_ULID_SPARK_SQL)


def _hilbert_sql(dialect: str) -> str:
    """Generate the Hilbert-curve codec SQL (256×256 grid) for one
    dialect: encode (x, y) -> d via the standard 8-stage rotate/flip
    walk, then DECODE d back through the 8-stage inverse walk. Both
    chains are unrolled from this one Python loop so the 16 CTE
    stages cannot drift between dialects (the fn_ulid_codec
    generated-text rule). Dialect splits: bitwise xor (Spark `^`,
    DuckDB `xor()` — DuckDB's `^` is POWER), integer division, and
    the hex->int hash idiom.
    """
    if dialect == "spark":
        def xor(a, b):
            return f"({a} ^ {b})"

        idiv = "div"
        h = (
            "CAST(conv(substr(md5(concat('hc:', CAST(o_orderkey"
            " AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
    else:
        def xor(a, b):
            return f"xor({a}, {b})"

        idiv = "//"
        h = (
            "CAST(('0x' || substr(md5('hc:' || CAST(o_orderkey"
            " AS VARCHAR)), 1, 15)) AS BIGINT)"
        )

    ctes = [
        f"pts AS (SELECT o_orderkey, ({h}) % 256 AS x,"
        f" (({h}) {idiv} 256) % 256 AS y"
        f" FROM orders WHERE o_orderkey < 4096)",
        "p0 AS (SELECT o_orderkey, x, y, x AS xs, y AS ys,"
        " CAST(0 AS BIGINT) AS d FROM pts)",
    ]
    prev = "p0"
    s = 128
    i = 0
    while s > 0:
        rx = f"(CASE WHEN (xs & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (ys & {s}) > 0 THEN 1 ELSE 0 END)"
        cur = f"p{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT o_orderkey, x, y,"
            f" CASE WHEN {ry} = 1 THEN xs"
            f" ELSE (CASE WHEN {rx} = 1 THEN {s} - 1 - ys ELSE ys END)"
            f" END AS xs,"
            f" CASE WHEN {ry} = 1 THEN ys"
            f" ELSE (CASE WHEN {rx} = 1 THEN {s} - 1 - xs ELSE xs END)"
            f" END AS ys,"
            f" d + {s * s} * {xor(f'(3 * {rx})', ry)} AS d"
            f" FROM {prev})"
        )
        prev = cur
        s //= 2
        i += 1
    ctes.append(
        f"q0 AS (SELECT o_orderkey, x, y, d, CAST(0 AS BIGINT) AS xd,"
        f" CAST(0 AS BIGINT) AS yd, d AS t FROM {prev})"
    )
    prev = "q0"
    s = 1
    i = 0
    while s < 256:
        rx = f"(1 & (t {idiv} 2))"
        ry = f"(1 & {xor('t', rx)})"
        cur = f"q{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT o_orderkey, x, y, d,"
            f" (CASE WHEN {ry} = 1 THEN xd"
            f" ELSE (CASE WHEN {rx} = 1 THEN {s} - 1 - yd ELSE yd END)"
            f" END) + {s} * {rx} AS xd,"
            f" (CASE WHEN {ry} = 1 THEN yd"
            f" ELSE (CASE WHEN {rx} = 1 THEN {s} - 1 - xd ELSE xd END)"
            f" END) + {s} * {ry} AS yd,"
            f" t {idiv} 4 AS t"
            f" FROM {prev})"
        )
        prev = cur
        s *= 2
        i += 1
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           CAST(d AS BIGINT) AS hilbert_d,
           CAST(xd AS BIGINT) AS x_decoded,
           CAST(yd AS BIGINT) AS y_decoded,
           CAST(CASE WHEN xd = x AND yd = y THEN 1 ELSE 0 END AS BIGINT)
               AS round_trip_ok
    FROM {prev}"""
    )


@register("fn_hilbert_curve", oracle=_hilbert_sql("duckdb"))
def fn_hilbert_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT space-filling-curve codec on a 256×256 grid — the
    locality-preserving big sibling of the Morton interleave
    `sink_zorder_clustered` uses (Hilbert keeps ALL curve-adjacent
    cells spatially adjacent, which is why Iceberg/DataBricks offer
    it for multi-dim clustering): per key a portable-hash point
    (x, y) is ENCODED to its curve position d by the standard 8-stage
    rotate/flip walk and DECODED back by the inverse walk, with the
    per-row round-trip equality in the hash contract. Both 8-stage
    chains are GENERATED from one Python loop per dialect (the
    fn_ulid_codec rule) — only the xor/div/hex tokens differ (DuckDB
    `^` is POWER, not xor — the r9 dialect trap this op documents).

    Scale: 16 chained narrow projections, no shuffle, no UDF —
    cluster-key minting at ingest speed; the round-trip column makes
    the codec self-auditing on every run.
    """
    from e2e_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_hilbert_sql("spark"))
