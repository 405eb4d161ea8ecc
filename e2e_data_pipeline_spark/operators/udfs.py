"""UDF / UDAF / UDTF surface (SURVEY.md §2.2).

UDFs are the slow path by design — everything that CAN be a built-in
expression elsewhere in this engine IS one. These operators exist to
prove the extension mechanics with the fast variants of each kind:

- ``udf_scalar``: Arrow-batched pandas UDF (vectorized transfer,
  10-100x over row-at-a-time Python UDFs).
- ``udaf_grouped``: pandas GROUPED_AGG UDAF.
- ``udtf_explode``: Python UDTF (Spark 4 table function, one row in →
  many out).

Each has an exact SQL oracle: the Python bodies implement
SQL-replicable semantics on purpose so the oracle hash still applies
to the UDF *path* (serialization, batching, null handling), not just
the math.
"""

from __future__ import annotations

import datetime

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.operators.registry import register


def make_normalize_text():
    """Deterministic text normalizer UDF: trim, lowercase, collapse
    runs of whitespace — semantically identical to the SQL
    regexp_replace(lower(trim(x)), '\\s+', ' ').

    Built lazily: pandas_udf parses its return type through the active
    SparkSession, so construction must happen after session startup.
    """

    @pandas_udf("string")
    def normalize_text(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    return normalize_text


@register(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm_text,
           CAST(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS INT)
               AS norm_len
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF on the normalizer."""
    normalize_text = make_normalize_text()
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm_text"),
        F.length(normalize_text(F.col("text"))).alias("norm_len"),
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT lang,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(median(n_chars) AS DOUBLE) AS median_chars
    FROM documents
    GROUP BY lang
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregation as pandas GROUPED_AGG UDAFs.

    Integer sum is exact; median over ints is deterministic in both
    engines (midpoint of two ints is an exact .0/.5 double).
    """

    @pandas_udf("long")
    def total_chars(s: pd.Series) -> int:
        return int(s.sum())

    @pandas_udf("double")
    def median_chars(s: pd.Series) -> float:
        return float(s.median())

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        total_chars("n_chars").alias("total_chars"),
        median_chars("n_chars").alias("median_chars"),
    )


class BigramGenerator:
    """UDTF: one document row → one row per token bigram. The SQL twin
    is the window-lead construction (see dedup_near's shingles).
    Wrapped with ``udtf(...)`` lazily inside udtf_explode (return-type
    parsing needs an active session)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"


@register(
    "udtf_explode",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(pos - 1 AS INT) AS pos,
           concat_ws(' ', tok, lead(tok, 1) OVER w) AS bigram
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    QUALIFY lead(tok, 1) OVER w IS NOT NULL
    """,
)
def udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: bigram generation per document."""
    spark.udtf.register("bigrams", udtf(BigramGenerator, returnType="pos: int, bigram: string"))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM udtf_documents d, LATERAL bigrams(d.text) b
        WHERE d.doc_id < 50
        """
    )


@register(
    "udaf_cogroup",
    oracle="""
    SELECT COALESCE(o.uid, e.uid) AS user_id,
           COALESCE(o.n_orders, 0) AS n_orders,
           CAST(COALESCE(o.revenue, 0) AS DOUBLE) AS revenue,
           COALESCE(e.n_events, 0) AS n_events,
           CAST(COALESCE(e.sum_value, 0) AS DOUBLE) AS sum_value
    FROM (SELECT o_custkey AS uid,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders WHERE o_custkey < 150 GROUP BY o_custkey) o
    FULL JOIN
         (SELECT user_id AS uid,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          FROM events WHERE user_id < 150 GROUP BY user_id) e
    ON o.uid = e.uid
    """,
)
def udaf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped pandas transform: ``groupBy().cogroup().applyInPandas``
    aligns BOTH tables' rows for one key into one Python call — the
    escape hatch for per-entity logic that needs both sides at once
    (custom matching, per-user reconciliation) without a pre-join.

    One shuffle per side on the key, then Arrow batches per key into
    pandas. Money sums ride integer cents inside Python so the result
    is exact and order-insensitive (same trick as the stateful
    operator); the oracle is the equivalent relational FULL JOIN of
    two aggregates.
    """
    import pandas as pd

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 150)
        .select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    )
    events = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 150)
        .select("user_id", "value")
    )

    def reconcile(key, odf: pd.DataFrame, edf: pd.DataFrame):
        rev_c = int((odf["o_totalprice"] * 100).round().astype("int64").sum())
        val_c = int((edf["value"] * 100).round().astype("int64").sum())
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_orders": [len(odf)],
                "revenue": [rev_c / 100.0],
                "n_events": [len(edf)],
                "sum_value": [val_c / 100.0],
            }
        )

    return (
        orders.groupBy("user_id")
        .cogroup(events.groupBy("user_id"))
        .applyInPandas(
            reconcile,
            schema="user_id long, n_orders long, revenue double, "
            "n_events long, sum_value double",
        )
    )


def _arrow_l2_norms(batches):
    """Arrow-native batch kernel: per-row L2 norm of a list<float>
    column, computed with numpy over the flat values buffer — no
    pandas materialization, no per-row Python."""
    import numpy as np
    import pyarrow as pa

    for b in batches:
        emb = b.column(b.schema.get_field_index("embedding"))
        if isinstance(emb, pa.ChunkedArray):  # pragma: no cover
            emb = emb.combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype("float64")
        offsets = emb.offsets.to_numpy()
        sq = flat * flat
        sums = (
            np.add.reduceat(sq, offsets[:-1])
            if len(sq)
            else np.zeros(len(offsets) - 1)
        )
        sums = np.where(offsets[1:] == offsets[:-1], 0.0, sums)
        yield pa.RecordBatch.from_arrays(
            [
                b.column(b.schema.get_field_index("vec_id")),
                b.column(b.schema.get_field_index("label")),
                pa.array(np.round(np.sqrt(sums), 6), type=pa.float64()),
            ],
            ["vec_id", "label", "l2_norm"],
        )


@register(
    "udf_arrow_batch",
    oracle="""
    SELECT e.vec_id, e.label,
           round(sqrt((SELECT SUM(CAST(x AS DOUBLE) * x)
                       FROM unnest(e.embedding) AS t(x))), 6) AS l2_norm
    FROM embeddings e
    """,
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch UDF (``mapInArrow``): per-vector L2 norms
    computed directly on Arrow buffers with numpy — the fastest Python
    escape hatch, one step below ``mapInPandas`` (no pandas object
    materialization, zero-copy into numpy).

    When to use which: built-in higher-order functions (sim ops) stay
    JVM-side and win when expressible; mapInArrow wins for numeric
    kernels over packed array columns (here: one vectorized multiply +
    segmented reduce per 10k-row batch); mapInPandas only when pandas
    semantics are genuinely needed. Square-summation runs in float64
    in list order on both engines; the O(1)-per-row round(6) result is
    cross-engine stable (same pattern as the sim_* cosines).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", "embedding").mapInArrow(
        _arrow_l2_norms, "vec_id long, label int, l2_norm double"
    )


class NgramStats:
    """Polymorphic UDTF: output schema decided at PLAN time by the
    ``analyze`` static method from the constant n argument — for n=2
    the function emits (gram_1, gram_2, n_occurrences), for n=3 a
    4-column row, etc. This is Spark 4's dynamic-schema table-function
    contract (AnalyzeResult), which fixed-signature UDTFs like
    BigramGenerator cannot express."""

    @staticmethod
    def analyze(text, n):  # noqa: D102
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        k = n.value  # constant-foldable argument, available at plan time
        fields = [
            StructField(f"gram_{i + 1}", StringType()) for i in range(k)
        ]
        fields.append(StructField("n_occurrences", IntegerType()))
        return AnalyzeResult(schema=StructType(fields))

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        counts: dict[tuple, int] = {}
        for i in range(len(toks) - n + 1):
            counts[tuple(toks[i : i + n])] = (
                counts.get(tuple(toks[i : i + n]), 0) + 1
            )
        for gram, c in counts.items():
            yield (*gram, c)


@register(
    "udtf_dynamic_schema",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id < 20
    ),
    tri AS (
        SELECT doc_id,
               unnest(t[1:len(t)-2]) AS gram_1,
               unnest(t[2:len(t)-1]) AS gram_2,
               unnest(t[3:len(t)])   AS gram_3
        FROM toks
    )
    SELECT doc_id, gram_1, gram_2, gram_3,
           CAST(COUNT(*) AS INT) AS n_occurrences
    FROM tri
    GROUP BY doc_id, gram_1, gram_2, gram_3
    """,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-output-schema Python UDTF (the ``analyze`` contract):
    called with n=3, the planner receives a 4-column schema computed
    IN PYTHON before any data moves — the mechanism behind
    polymorphic table functions (CSV splitters, pivoting readers)
    that fixed-return-type UDTFs cannot model. The body pre-counts
    per-document trigram occurrences so the lateral output is bounded
    by distinct trigrams, and the oracle rebuilds the same counts with
    the parallel-unnest zip (fn_posexplode pattern)."""
    spark.udtf.register("ngram_stats", udtf(NgramStats))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "udtf_docs_dyn"
    )
    return spark.sql(
        """
        SELECT d.doc_id, g.gram_1, g.gram_2, g.gram_3, g.n_occurrences
        FROM udtf_docs_dyn d, LATERAL ngram_stats(d.text, 3) g
        WHERE d.doc_id < 20
        """
    )


class _GapAudit:
    """Stateful per-partition UDTF kernel for udtf_table_arg: consumes
    one user's events in timestamp order (the engine guarantees the
    PARTITION BY / ORDER BY contract), tracks inter-event gaps, and
    emits a single audit row per user at partition end. Pure-Python
    integer state — no floats, so the oracle twin is exact."""

    def __init__(self) -> None:
        self.uid = None
        self.prev = None
        self.n = 0
        self.max_gap = 0
        self.n_gaps_1h = 0

    def eval(self, row):  # noqa: ANN001 - Row from TABLE argument
        self.uid = row["user_id"]
        self.n += 1
        if self.prev is not None:
            gap = row["sec"] - self.prev
            if gap > self.max_gap:
                self.max_gap = gap
            if gap > 3600:
                self.n_gaps_1h += 1
        self.prev = row["sec"]

    def terminate(self):
        if self.uid is not None:
            yield self.uid, self.n, self.max_gap, self.n_gaps_1h


@register(
    "udtf_table_arg",
    oracle="""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) // 1000000 AS sec, event_id
        FROM events WHERE user_id < 30
    ),
    gaps AS (
        SELECT user_id, sec,
               sec - lag(sec) OVER (PARTITION BY user_id
                                    ORDER BY sec, event_id) AS gap
        FROM ev
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_s,
           CAST(SUM(CASE WHEN gap > 3600 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gaps_1h
    FROM gaps GROUP BY user_id
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument with PARTITION BY /
    ORDER BY — the Spark 4 surface for "give my Python function each
    key's rows, in order, as a stream" (session auditing, custom CDC
    folds, order-dependent state machines) without the groupBy +
    applyInPandas detour. The engine hash-partitions by user and
    sorts within each partition before the UDTF sees a row, so the
    kernel is a trivial O(1)-state scan; the oracle twin re-derives
    the same audit with a lag() window.

    Scale: identical distribution properties to a window function —
    one shuffle on the PARTITION BY key, linear per-key scan. The
    Python-row cost is the price of the imperative-API demonstration;
    the lag() formulation (win_lag_lead) is the JVM-native fast path.
    """
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register(
        "gap_audit",
        _udtf(
            _GapAudit,
            returnType=(
                "user_id bigint, n_events bigint,"
                " max_gap_s bigint, n_gaps_1h bigint"
            ),
        ),
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 30)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("long").alias("sec"),
            "event_id",
        )
    )
    ev.createOrReplaceTempView("udtf_gap_events")
    return spark.sql(
        """
        SELECT * FROM gap_audit(
            TABLE(udtf_gap_events)
            PARTITION BY user_id
            ORDER BY (sec, event_id)
        )
        """
    )


@register(
    "sql_named_params",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_totalprice > 1000.0
    GROUP BY o_orderpriority
    """,
)
def sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL with named parameters — `spark.sql(query,
    args={...})` binds values server-side as typed literals instead of
    string interpolation (the SQL-injection-safe front door an
    application would actually use; parameter markers survive the
    parser, so Catalyst still constant-folds and pushes the predicates
    to the scan). The oracle is the same query with the parameters
    spelled inline — proving binding ≡ literal semantics.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "param_orders"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM param_orders
        WHERE o_orderdate >= :start_date
          AND o_totalprice > :min_price
        GROUP BY o_orderpriority
        """,
        args={"start_date": datetime.date(1996, 1, 1), "min_price": 1000.0},
    )


@register(
    "udf_window_grouped_agg",
    oracle="""
    WITH cents AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trail5_cents
    FROM cents
    ORDER BY user_id, event_id
    LIMIT 500
    """,
)
def udf_window_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF evaluated OVER a bounded window frame —
    the Arrow-vectorized escape hatch when a rolling metric has no
    built-in (here the metric is a plain trailing sum so DuckDB can
    referee the plumbing). Each frame ships to Python as an Arrow
    batch; int64 summation is exact, so the parity is bit-level.
    This is the API row the reference's per-batch pandas loops map
    onto (/root/reference/ingest_data.py:56-66) — same pandas
    semantics, executor-side and frame-scoped instead of
    driver-side.

    Scale: one shuffle on user_id; Python cost is per-frame
    vectorized, and the LIMIT keeps the checked surface stable.
    """

    @pandas_udf("long")
    def trail_sum(v: pd.Series) -> int:
        return int(v.sum())

    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"),
        )
        .withColumn("trail5_cents", trail_sum(F.col("v")).over(w))
        .select("user_id", "event_id", "trail5_cents")
        .orderBy("user_id", "event_id")
        .limit(500)
    )


@register(
    "udf_apply_in_arrow",
    oracle="""
    WITH cents AS (
        SELECT c.c_mktsegment AS seg,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(v) AS BIGINT) AS sum_cents,
           CAST(quantile_disc(v, 0.5) AS BIGINT) AS median_lo_cents,
           CAST(MIN(v) AS BIGINT) AS min_cents,
           CAST(MAX(v) AS BIGINT) AS max_cents
    FROM cents GROUP BY seg
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInArrow`` (Spark 4): the zero-copy sibling of
    applyInPandas — each group arrives as a ``pyarrow.Table`` and the
    kernel runs pyarrow compute directly, skipping the Arrow→pandas
    materialization entirely (no index allocation, no dtype coercion,
    no NaN/None remapping — the classic pandas-tax items). The kernel
    computes per-segment order stats including an EXACT lower-median
    (sorted integer cents, element (n-1)//2 — quantile_disc's
    definition, so the oracle matches bit-for-bit; no interpolation,
    no float anywhere).

    Scale: one shuffle on the group key, then a vectorized C++ sort
    per group inside Arrow. When a grouped kernel only needs
    columnar-friendly ops (sort, sum, take), applyInArrow is the
    faster UDF tier; drop to applyInPandas only when the logic needs
    pandas semantics.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    cents = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("seg", "v")

    def seg_stats(tbl: pa.Table) -> pa.Table:
        v = tbl.column("v").combine_chunks()
        n = len(v)
        sorted_v = v.sort()
        return pa.table(
            {
                "seg": [tbl.column("seg")[0].as_py()],
                "n_orders": [n],
                "sum_cents": [pc.sum(v).as_py()],
                "median_lo_cents": [sorted_v[(n - 1) // 2].as_py()],
                "min_cents": [pc.min(v).as_py()],
                "max_cents": [pc.max(v).as_py()],
            }
        )

    return cents.groupBy("seg").applyInArrow(
        seg_stats,
        "seg string, n_orders long, sum_cents long,"
        " median_lo_cents long, min_cents long, max_cents long",
    )
