"""Structured-Streaming operators with batch/stream parity
(SURVEY.md §2.2 streaming block).

Design: every operator is a plain ``DataFrame -> DataFrame`` transform
written once against the unified Dataset API. Batch execution
(``spark.read`` → the transform) is what the DuckDB oracle checks;
streaming execution (``spark.readStream`` → the same transform →
memory sink, availableNow trigger) is asserted equal to the batch
answer in tests/test_streaming.py. That batch≡stream property is
Structured Streaming's core guarantee, and it's what lets a 100 TB
backfill and the live pipeline share one code path.

Watermarks: the transforms accept a ``watermark`` argument used only
when the input is streaming — event-time watermarks bound the state
store (without one, windowed state grows forever on an unbounded
stream). The reference's closest analog is its manual 100k-row
micro-batch loop (/root/reference/ingest_data.py:54-85) — the same
bounded-memory concern, solved by the engine here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source, explicit schema).

    ts becomes TimestampType (not NTZ): event-time watermarks require
    TIMESTAMP. With the session pinned to UTC the wall-clock values
    match the batch catalog's TIMESTAMP_NTZ exactly, and every
    transform output formats timestamps to strings, so batch/stream
    parity is unaffected by the internal type difference.

    The file source needs an explicit schema; probe it from a batch
    read of the same files, since the fixture generation has shipped
    ts both as parquet TIMESTAMP(NANOS) (int64 nanos under the
    nanosAsLong conf) and as TIMESTAMP(MICROS) (a real timestamp).
    """
    probe = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # glob (not the bare file path): the file source requires basePath
    # to be a directory, and with a glob it resolves to sf_dir.
    raw = spark.readStream.schema(probe).parquet(f"{sf_dir}/events.parq*")
    if probe["ts"].dataType.simpleString() == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


# ---------------------------------------------------------------------------
# Transforms (shared batch/stream)
# ---------------------------------------------------------------------------


def tumbling_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-5-minute tumbling window counts/sums by event_type."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in
    exactly two windows)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            # exact-distinct is not a streaming-capable aggregate;
            # a decimal sum keeps the oracle exact in both modes
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Spark's ``session_window`` end = last event + gap; the oracle
    emulates with gaps-and-islands (lag → new-session flag → running
    session id) and max(ts)+30min.
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("win"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.col("win.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )


def watermark_dedup(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Exactly-once by event_id over an at-least-once stream.

    The input is made deliberately redundant (every 3rd event is
    re-delivered) and deduplicated on event_id. Streaming mode uses
    ``dropDuplicatesWithinWatermark`` so the dedup state store is
    bounded by the watermark horizon instead of growing forever.
    Duplicate rows are byte-identical, so keep-any semantics are
    deterministic.
    """
    redelivered = events.unionByName(events.where(F.col("event_id") % 3 == 0))
    if watermark:
        redelivered = redelivered.withWatermark("ts", watermark)
        deduped = redelivered.dropDuplicatesWithinWatermark(["event_id"])
    else:
        deduped = redelivered.dropDuplicates(["event_id"])
    return deduped.select("event_id", "user_id", "event_type", "value")


def static_join_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream⋈static enrichment: events joined to the customer dim
    (user_id = c_custkey), aggregated by market segment. The static
    side is broadcast every micro-batch — the canonical dimension-join
    shape for streams."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def stream_stream_conversions(
    views: DataFrame,
    purchases: DataFrame,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream⋈stream join: attribute each purchase to the views by the
    same user in the preceding hour (conversion attribution).

    Both inputs are the events stream filtered by type. In streaming
    mode BOTH sides carry watermarks and the join condition bounds
    event-time distance — that pair is what lets Spark expire join
    state: a buffered view can be dropped once the purchase-side
    watermark passes view_ts + 1h, so state is bounded by the
    (watermark + window) horizon instead of growing with the stream.
    Inner join with a time bound runs in append mode, which is also
    why the batch twin is hash-identical: every emitted pair is final.

    ``how="left_outer"`` is the attribution semantics production
    pipelines actually need: views that never converted are emitted
    too, null-padded — in streaming, ONLY once the purchase-side
    watermark passes view_ts + 1h (at that point no future purchase
    can match, so the null row is final; this is why outer
    stream⋈stream REQUIRES both the watermark and the event-time
    bound, not just one). Unconverted views inside the final
    watermark horizon stay buffered — the batch twin minus that tail
    is what streaming parity can assert (tests/test_streaming.py).
    """
    if watermark:
        views = views.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    v = views.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    p = purchases.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = v.join(
        p,
        (v["user_id"] == p["p_user"])
        & (p["purchase_ts"] > v["view_ts"])
        & (p["purchase_ts"] <= v["view_ts"] + F.expr("INTERVAL 1 HOUR")),
        how,
    )
    return joined.select(
        "view_id",
        "purchase_id",
        "user_id",
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts").cast("timestamp"))
        ).alias("us_to_convert"),
    )


# ---------------------------------------------------------------------------
# Streaming harness
# ---------------------------------------------------------------------------


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink and return the sink contents as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"stream {name} did not finish in {timeout_s}s")
    return spark.table(name)


def daily_type_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-(day window, event_type) counts — the streamable half of
    windowed top-k. Window-rank is not a streaming-capable operation,
    so trending-item pipelines aggregate in the stream and rank on the
    (tiny) aggregate downstream — see :func:`rank_topk`."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def rank_topk(day_counts: DataFrame, k: int = 2) -> DataFrame:
    """Batch post-step: top-k event types per day by count (tie-broken
    by type). Runs on the aggregated frame — days × types rows — so
    its cost is independent of stream volume."""
    from pyspark.sql import Window

    w = Window.partitionBy("day").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        day_counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def latest_state(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Changelog compaction: the current state per user — last value,
    last event type, last-change time, change count. The CDC
    "materialized latest" pattern: a keyed update stream collapses to
    one row per key.

    Pure aggregation (max/max_by/count), so the SAME code runs batch
    and streaming (update mode): in streaming, state per key is O(1)
    and each micro-batch emits only changed keys. (user_id, ts) is
    unique in the fixture, so max_by on ts is deterministic.
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
    return events.groupBy("user_id").agg(
        F.max_by("value", "ts").alias("last_value"),
        F.max_by("event_type", "ts").alias("last_event_type"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.count("*").alias("n_changes"),
    )
