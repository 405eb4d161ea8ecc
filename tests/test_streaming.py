"""Batch≡stream parity: every streaming transform must produce the
same result under ``readStream`` (availableNow → memory sink) as under
``spark.read`` — the batch answer is the golden answer (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.streaming import (
    latest_state,
    load_events_stream,
    run_stream_to_memory,
    sessionize,
    sliding_counts,
    static_join_enrich,
    tumbling_counts,
    watermark_dedup,
)
from tests.conftest import SF_SMALL
from tools.check_oracle import canon


def _assert_same(batch_df, stream_df):
    (acols, arows), (bcols, brows) = (
        canon(batch_df.toPandas()),
        canon(stream_df.toPandas()),
    )
    assert acols == bcols
    assert arows == brows


@pytest.mark.parametrize(
    "name,transform,mode",
    [
        ("t_tumbling", tumbling_counts, "complete"),
        ("t_sliding", sliding_counts, "complete"),
        ("t_session", sessionize, "complete"),
    ],
)
def test_windowed_parity(spark, name, transform, mode):
    batch = transform(load_table(spark, SF_SMALL, "events"))
    stream = run_stream_to_memory(
        spark,
        transform(load_events_stream(spark, SF_SMALL), watermark="1 hour"),
        name,
        output_mode=mode,
    )
    _assert_same(batch, stream)


def test_dedup_parity(spark):
    batch = watermark_dedup(load_table(spark, SF_SMALL, "events"))
    stream = run_stream_to_memory(
        spark,
        watermark_dedup(load_events_stream(spark, SF_SMALL), watermark="1 hour"),
        "t_dedup",
        output_mode="append",
    )
    _assert_same(batch, stream)


def test_latest_state_parity(spark):
    """CDC compaction: update-mode streaming agg must converge to the
    batch latest-per-key answer once the whole changelog is consumed
    (memory sink in update mode keeps the LAST row per emitted key,
    so the final table equals the batch compaction)."""
    batch = latest_state(load_table(spark, SF_SMALL, "events"))
    stream = run_stream_to_memory(
        spark,
        latest_state(load_events_stream(spark, SF_SMALL), watermark="1 hour"),
        "t_latest_state",
        output_mode="complete",
    )
    _assert_same(batch, stream)


def test_stateful_custom_operator_parity(spark):
    """applyInPandasWithState snapshots after one availableNow pass
    must equal the batch fold."""
    from e2e_data_pipeline_spark.streaming.stateful import (
        running_user_stats,
        running_user_stats_batch,
    )

    batch = running_user_stats_batch(load_table(spark, SF_SMALL, "events"))
    stream = run_stream_to_memory(
        spark,
        running_user_stats(load_events_stream(spark, SF_SMALL)),
        "t_stateful",
        output_mode="update",
    )
    _assert_same(batch, stream)


def test_static_join_parity(spark):
    customer = load_table(spark, SF_SMALL, "customer")
    batch = static_join_enrich(load_table(spark, SF_SMALL, "events"), customer)
    stream = run_stream_to_memory(
        spark,
        static_join_enrich(load_events_stream(spark, SF_SMALL), customer),
        "t_static_join",
        output_mode="complete",
    )
    _assert_same(batch, stream)


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Late-data semantics, demonstrated rather than assumed: an event
    older than the persisted watermark is DROPPED by the windowed
    streaming aggregation (its window already finalized in append
    mode), while the same event in a batch run lands in its window.
    Two availableNow runs share one checkpoint, which also proves
    watermark state survives restarts."""
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    def windowed(df):
        return (
            df.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.date_format("w.start", "HH:mm").alias("win"), "n")
        )

    out_dir = str(tmp_path / "out")

    def run():
        # file sink, not memory: only the file sink supports resuming
        # from a checkpoint, which is the restart being demonstrated.
        stream = spark.readStream.schema("ts timestamp, user_id long").parquet(
            str(src) + "/*"
        )
        q = (
            windowed(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.schema("win string, n long").parquet(out_dir).collect()
        return {r.win: r.n for r in rows}

    import datetime as dt

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    write_file("a", [(t(10, 0), 1), (t(12, 0), 1)])
    out1 = run()
    # watermark after run1 = 12:00 - 10min; the 10:00 window finalized
    assert out1 == {"10:00": 1}

    write_file("b", [(t(10, 5), 2), (t(12, 30), 2)])  # 10:05 is LATE
    out2 = run()  # cumulative file-sink contents
    # late 10:05 dropped — the 10:00 window count did NOT change; the
    # 12:00 window finalizes now that the watermark passed it
    assert out2.get("10:00") == 1
    assert out2.get("12:00") == 1

    # batch over the same files counts the late event: 10:00 window = 2
    batch = windowed(spark.read.parquet(str(src) + "/*"))
    bmap = {r.win: r.n for r in batch.collect()}
    assert bmap["10:00"] == 2


def test_stream_stream_join_parity(spark):
    """Inner stream⋈stream join with time bounds and watermarks on both
    sides must emit exactly the batch join's pairs (append mode — every
    pair is final once emitted)."""
    from e2e_data_pipeline_spark.streaming import stream_stream_conversions

    ev = load_table(spark, SF_SMALL, "events")
    batch = stream_stream_conversions(ev, ev)
    s1 = load_events_stream(spark, SF_SMALL)
    s2 = load_events_stream(spark, SF_SMALL)
    stream = run_stream_to_memory(
        spark,
        stream_stream_conversions(s1, s2, watermark="1 hour"),
        "t_ss_join",
        output_mode="append",
    )
    _assert_same(batch, stream)


def test_stream_stream_left_outer_watermark_expiry(spark):
    """LEFT OUTER stream⋈stream: matched pairs must equal the batch
    join exactly, and null-padded rows (views that never converted)
    must be emitted for every view old enough that the final watermark
    made 'no match' final — while views inside the watermark horizon
    are allowed to still be buffered (that is watermark semantics, not
    data loss)."""
    from pyspark.sql import functions as F

    from e2e_data_pipeline_spark.streaming import stream_stream_conversions

    ev = load_table(spark, SF_SMALL, "events")
    batch = stream_stream_conversions(ev, ev, how="left_outer")
    s1 = load_events_stream(spark, SF_SMALL)
    s2 = load_events_stream(spark, SF_SMALL)
    stream = run_stream_to_memory(
        spark,
        stream_stream_conversions(s1, s2, watermark="1 hour", how="left_outer"),
        "t_ss_outer",
        output_mode="append",
    )

    b_matched = batch.where(F.col("purchase_id").isNotNull())
    s_matched = stream.where(F.col("purchase_id").isNotNull())
    _assert_same(b_matched, s_matched)

    # Null rows: final watermark = max event ts - 1h delay; a view is
    # expirable once view_ts + 1h < watermark. Every expirable
    # unconverted view must have emitted its null row; no null row may
    # exist for a view the batch join matched.
    max_ts = ev.agg(F.max("ts")).first()[0]
    b_nulls = set(
        r.view_id
        for r in batch.where(F.col("purchase_id").isNull())
        .join(
            ev.select(F.col("event_id").alias("view_id"), "ts"), "view_id"
        )
        .where(
            F.col("ts")
            < F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")  # watermark - window
        )
        .collect()
    )
    s_nulls = set(
        r.view_id for r in stream.where(F.col("purchase_id").isNull()).collect()
    )
    assert b_nulls <= s_nulls, (
        f"{len(b_nulls - s_nulls)} expirable unconverted views missing null rows"
    )
    b_all_nulls = set(
        r.view_id for r in batch.where(F.col("purchase_id").isNull()).collect()
    )
    assert s_nulls <= b_all_nulls, "stream emitted a null row for a matched view"


def test_foreachbatch_idempotent_sink(spark, tmp_path):
    """The canonical exactly-once sink pattern: foreachBatch writes
    each micro-batch to a path KEYED BY batchId with overwrite mode, so
    a replayed batch (failure between sink write and checkpoint commit)
    overwrites its own previous attempt instead of duplicating rows.
    Here we simulate the replay by writing every batch twice."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        target = f"{out}/batch_id={batch_id}"
        # First attempt, then a simulated post-failure replay of the
        # same (batch_id, data): overwrite makes the second write a
        # no-op for correctness.
        batch_df.write.mode("overwrite").parquet(target)
        batch_df.write.mode("overwrite").parquet(target)

    stream = load_events_stream(spark, SF_SMALL).select(
        "event_id", "user_id", "value"
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    written = spark.read.parquet(out)
    batch = load_table(spark, SF_SMALL, "events")
    assert written.count() == batch.count()
    assert written.select(F.countDistinct("event_id")).first()[0] == batch.count()


def test_python_datasource_stream_resumes_from_checkpoint(spark, tmp_path):
    """The custom Python DataSource's stream reader (sources/python_ds
    .py) must drain the bounded feed across RESTARTS: each availableNow
    run picks up from the committed offset, and the union of all runs
    equals the batch read — offsets are durable and replay is
    deterministic (exactly-once)."""
    from e2e_data_pipeline_spark.sources.python_ds import register_python_sources

    register_python_sources(spark)
    opts = {"rows": "1000", "rowsPerBatch": "250"}
    got = []

    def sink(df, _bid):
        got.extend(df.collect())

    runs = 0
    for _ in range(8):
        q = (
            spark.readStream.format("synthetic_events")
            .options(**opts)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        runs += 1
        if len(got) >= 1000:
            break
    assert len(got) == 1000
    assert runs > 1  # offsets resumed across restarts, not one big read
    batch = (
        spark.read.format("synthetic_events").options(**opts).load().collect()
    )
    assert sorted(got) == sorted(batch)


def test_transform_with_state_parity(spark, tmp_path):
    """The second-generation stateful API (transformWithStateInPandas
    + RocksDB state store) must produce the same final snapshots as
    the batch groupBy golden answer — same contract as
    test_stateful_custom_operator_parity, newer machinery.

    Spark's transformWithState driver worker imports protobuf; this
    sandbox doesn't ship it (and installs are out of scope), so the
    test import-gates. The operator itself (streaming/stateful.py
    running_user_stats_tws) is plain DataFrame API and runs wherever
    protobuf exists."""
    pytest.importorskip("google.protobuf.descriptor")
    from e2e_data_pipeline_spark.streaming import load_events_stream
    from e2e_data_pipeline_spark.streaming.stateful import (
        running_user_stats_batch,
        running_user_stats_tws,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        snapshots = {}

        def sink(df, _bid):
            for r in df.collect():
                snapshots[r["user_id"]] = r

        q = (
            running_user_stats_tws(load_events_stream(spark, SF_SMALL))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        batch = running_user_stats_batch(
            load_table(spark, SF_SMALL, "events")
        ).collect()
        assert len(batch) == len(snapshots)
        for r in batch:
            s = snapshots[r["user_id"]]
            assert (s["n_events"], s["total_value"], s["max_value"]) == (
                r["n_events"],
                r["total_value"],
                r["max_value"],
            )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_window_topk_parity(spark):
    """Streamed daily counts + downstream rank must equal the batch
    composition (stream_window_topk's two-stage split)."""
    from e2e_data_pipeline_spark.streaming.core import (
        daily_type_counts,
        rank_topk,
    )

    batch = rank_topk(daily_type_counts(load_table(spark, SF_SMALL, "events")))
    streamed_counts = run_stream_to_memory(
        spark,
        daily_type_counts(load_events_stream(spark, SF_SMALL), watermark="1 hour"),
        "t_window_topk",
        output_mode="complete",
    )
    _assert_same(batch, rank_topk(streamed_counts))


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """A stream restarted from its checkpoint must process ONLY files
    that arrived after the first run — no re-reads, no gaps. This is
    the exactly-once file-source contract every incremental ingestion
    job leans on."""
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "value")
    total = ev.count()
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    half1.repartition(2).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    seen: list[tuple[int, int]] = []

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def record(batch_df, batch_id):
            seen.append((batch_id, batch_df.count()))

        q = (
            stream.writeStream.foreachBatch(record)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    first_run_batches = len(seen)
    first_run_rows = sum(n for _, n in seen)
    assert first_run_rows == half1.count()

    # late arrivals land in the SAME directory; resume from checkpoint
    half2.repartition(2).write.mode("append").parquet(src)
    run_once()

    assert sum(n for _, n in seen) == total, "resume must not re-read or skip"
    batch_ids = [b for b, _ in seen]
    assert len(batch_ids) == len(set(batch_ids)), "no batch may replay"
    assert len(seen) > first_run_batches, "second run must process new files"


def test_foreachbatch_crash_recovery_exactly_once(spark, tmp_path):
    """A foreachBatch sink that CRASHES mid-stream must, on restart
    from the same checkpoint, replay only the uncommitted batch and
    land on exactly the batch answer — the crash-safety property the
    versioned read-old/write-new state layout exists for. The commit
    pointer advances only after a batch's new version is fully
    written, so the failed attempt's partial output is invisible."""
    import os

    import pyspark.sql.functions as F

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(4, F.pmod("event_id", F.lit(4))).write.parquet(src)
    schema = spark.read.parquet(src).schema
    work = str(tmp_path / "state")
    os.makedirs(work, exist_ok=True)
    pointer = os.path.join(work, "_POINTER")
    crash_flag = os.path.join(work, "_CRASH_ONCE")
    open(crash_flag, "w").close()

    def merge(batch_df, batch_id):
        agg = batch_df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        if os.path.exists(pointer):
            with open(pointer) as f:
                prev = f.read().strip()
            old = spark.read.parquet(prev)
            agg = (
                old.unionByName(agg)
                .groupBy("user_id")
                .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
            )
        out = os.path.join(work, f"v_{batch_id}_{os.urandom(4).hex()}")
        agg.write.parquet(out)
        # CRASH INJECTION: die after writing but BEFORE committing the
        # pointer — the classic partial-failure window.
        if batch_id == 2 and os.path.exists(crash_flag):
            os.remove(crash_flag)
            raise RuntimeError("injected sink crash before commit")
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(out)
        os.replace(tmp, pointer)  # atomic commit

    def run():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    import pytest as _pytest

    with _pytest.raises(Exception, match="injected sink crash"):
        run()
    run()  # restart from the same checkpoint — must replay batch 2 only

    with open(pointer) as f:
        final = spark.read.parquet(f.read().strip())
    expect = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    got = {(r.user_id, r.n, r.cents) for r in final.collect()}
    want = {(r.user_id, r.n, r.cents) for r in expect.collect()}
    assert got == want, "crash+restart must yield exactly the batch answer"


def test_dedup_state_expiry_readmits_after_watermark(spark, tmp_path):
    """Out-of-order injection for dropDuplicatesWithinWatermark — the
    semantics the batch twin cannot witness. A redelivery inside the
    watermark horizon is dropped (state still held); once the watermark
    passes seen_ts + delay the dedup state for that key is EVICTED, so
    a later redelivery of the same event_id is re-admitted as new.
    Three availableNow runs share one checkpoint, so eviction is also
    shown to persist across restarts."""
    import datetime as dt

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    src.mkdir()

    def write_file(name, rows):
        spark.createDataFrame(rows, "ts timestamp, event_id long").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / name))

    def run():
        stream = spark.readStream.schema("ts timestamp, event_id long").parquet(
            str(src) + "/*"
        )
        q = (
            stream.withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return (
            spark.read.schema("ts timestamp, event_id long")
            .parquet(out_dir)
            .groupBy("event_id")
            .count()
            .collect()
        )

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    write_file("a", [(t(10, 0), 1), (t(10, 2), 99)])
    out1 = {r.event_id: r["count"] for r in run()}
    assert out1 == {1: 1, 99: 1}

    # duplicate of id 1 inside the horizon -> dropped; id 100 at 11:00
    # advances the watermark to 10:50, evicting id 1's state (10:00+10m)
    write_file("b", [(t(10, 1), 1), (t(11, 0), 100)])
    out2 = {r.event_id: r["count"] for r in run()}
    assert out2 == {1: 1, 99: 1, 100: 1}, out2

    # same event_id redelivered AFTER eviction -> re-admitted
    write_file("c", [(t(11, 5), 1)])
    out3 = {r.event_id: r["count"] for r in run()}
    assert out3 == {1: 2, 99: 1, 100: 1}, out3


def test_statestore_reader_survives_checkpoint_restart(spark, tmp_path):
    """The state-store introspection contract across a RESTART: run a
    streaming agg over the first half of the data, stop, append more
    files, restart from the SAME checkpoint, and verify (a) the
    statestore read now reflects ALL data (state carried over and was
    updated incrementally, not rebuilt), and (b) state-metadata shows
    the committed batch range advancing — the exactly-once evidence an
    on-call engineer reads off a production checkpoint."""
    from pyspark.sql import functions as F

    chunks = tmp_path / "chunks"
    ckpt = str(tmp_path / "ckpt")
    full = load_table(spark, SF_SMALL, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )

    def write_half(which: int) -> None:
        half = full.where(F.pmod("event_id", F.lit(2)) == which)
        half.coalesce(1).write.parquet(str(chunks / f"c{which}"))

    def run_once() -> None:
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, cents long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(chunks) + "/*")
        )
        agg = stream.groupBy("event_type").agg(
            F.sum("cents").alias("s"), F.count("*").alias("n")
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    def read_state():
        st = spark.read.format("statestore").load(ckpt)
        vcols = [f.name for f in st.schema["value"].dataType.fields]
        return {
            r["k"]: (r["s"], r["n"])
            for r in st.select(
                F.col("key.event_type").alias("k"),
                F.col(f"value.{vcols[0]}").cast("long").alias("s"),
                F.col(f"value.{vcols[1]}").cast("long").alias("n"),
            ).collect()
        }

    write_half(0)
    run_once()
    state1 = read_state()
    half_expected = {
        r["event_type"]: (r["s"], r["n"])
        for r in full.where(F.pmod("event_id", F.lit(2)) == 0)
        .groupBy("event_type")
        .agg(F.sum("cents").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert state1 == half_expected

    meta1 = spark.read.format("state-metadata").load(ckpt).collect()[0]

    write_half(1)
    run_once()  # restart from the same checkpoint
    state2 = read_state()
    full_expected = {
        r["event_type"]: (r["s"], r["n"])
        for r in full.groupBy("event_type")
        .agg(F.sum("cents").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert state2 == full_expected

    meta2 = spark.read.format("state-metadata").load(ckpt).collect()[0]
    assert meta2["maxBatchId"] > meta1["maxBatchId"]
    assert meta2["minBatchId"] == 0


def test_statestore_reader_time_travel_batch_option(spark, tmp_path):
    """`batchId` option on the statestore source: reading state AS OF
    an earlier committed batch returns the earlier aggregate — state
    time travel, the post-incident 'what did the job believe at batch
    N' question."""
    from pyspark.sql import functions as F

    chunks = tmp_path / "chunks"
    ckpt = str(tmp_path / "ckpt")
    full = load_table(spark, SF_SMALL, "events").select(
        "event_id", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents")
    )
    for i in range(2):
        full.where(F.pmod("event_id", F.lit(2)) == i).coalesce(1).write.parquet(
            str(chunks / f"c{i}")
        )
    stream = (
        spark.readStream.schema("event_id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks) + "/*")
    )
    agg = stream.groupBy(F.pmod("event_id", F.lit(3)).alias("g")).agg(
        F.sum("cents").alias("s")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    latest = spark.read.format("statestore").load(ckpt)
    asof0 = (
        spark.read.format("statestore").option("batchId", 0).load(ckpt)
    )
    vcol = latest.schema["value"].dataType.fields[0].name
    total_latest = latest.select(F.sum(f"value.{vcol}")).collect()[0][0]
    total_asof0 = asof0.select(F.sum(f"value.{vcol}")).collect()[0][0]
    full_sum = full.agg(F.sum("cents")).collect()[0][0]
    assert total_latest == full_sum
    assert 0 < total_asof0 < full_sum  # batch 0 saw only one file


def test_state_evolution_incompatible_schema_raises(spark, tmp_path):
    """Restarting a checkpoint with a GROWN state value struct (an
    added max aggregate) must fail Spark's state-schema-compat check
    loudly — the negative half of stream_state_evolution's contract.
    A silent pass here would mean a query edit can corrupt persisted
    state."""
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from e2e_data_pipeline_spark.operators.streaming_ops import (
        _state_evolution_run,
    )

    work = str(tmp_path / "evo")
    ckpt, n_files, schema = _state_evolution_run(spark, SF_SMALL, work)
    assert n_files == 4

    # the schema-compat check only fires when a batch actually runs,
    # so give the restarted query one unseen input file
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    ev.limit(100).coalesce(1).write.parquet(f"{work}/chunks/c4")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/chunks/c*")
    )
    grown = stream.groupBy("event_type").agg(
        F.sum("cents").alias("sum_cents"),
        F.count("*").alias("n_events"),
        F.max("cents").alias("max_cents"),  # value struct grows
    )
    with pytest.raises(StreamingQueryException) as ei:
        q = (
            grown.writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    msg = str(ei.value)
    assert "SCHEMA" in msg.upper() and "COMPAT" in msg.upper(), msg
