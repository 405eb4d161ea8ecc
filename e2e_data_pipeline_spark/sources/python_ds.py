"""Custom Python DataSource connector (Spark 4 ``pyspark.sql.datasource``).

The reference's only custom "source" is a hand-rolled HTTP fetch +
chunked CSV iterator (/root/reference/ingest_data.py:16-26 download,
:54-56 100k-row chunk loop) — imperative, single-threaded, driver-bound.
The Spark-first re-expression of "a source the engine doesn't ship" is
the Python DataSource API: declare a schema, split the input into
``InputPartition``s, and let the engine schedule one reader task per
partition on the executors. The chunk loop becomes ``partitions()``;
parallelism, retries, and downstream pushdown come from the engine.

``SyntheticEventsDataSource`` is the in-sandbox stand-in for a remote
feed (no network here): a deterministic LCG event generator. Every row
is a pure function of its index, so (a) any partition can be produced
independently on any executor — the property a real remote connector
needs for ranged/resumable fetches — and (b) a SQL oracle can reproduce
the stream bit-for-bit from ``range()``, giving the connector an exact
cross-engine correctness check (rare for connectors).

Scale notes: ``partitions()`` emits fixed-size ranges, so the source
scales out to any executor count without skew; per-row state is O(1)
and nothing touches the driver. A real HTTP source would map each
partition to a byte-range / page request the same way.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# LCG constants (glibc's rand): x = (A*i + C) mod M. Any fixed affine
# map works — what matters is that both engines compute it exactly in
# 64-bit integer arithmetic.
_A = 1103515245
_C = 12345
_M = 2_147_483_648  # 2^31

DEFAULT_ROWS = 100_000
DEFAULT_ROWS_PER_PARTITION = 12_500


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int) -> None:
        self.lo = lo
        self.hi = hi


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.per_part = int(
            options.get("rowsPerPartition", DEFAULT_ROWS_PER_PARTITION)
        )

    def partitions(self) -> list[InputPartition]:
        # Fixed-size ranges: the engine schedules one task per range, so
        # parallelism = ceil(rows / per_part) regardless of cluster size.
        return [
            _RangePartition(lo, min(lo + self.per_part, self.rows))
            for lo in range(0, self.rows, self.per_part)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            x = (_A * i + _C) % _M
            yield (
                i,  # event_id
                x % 997,  # user_id
                float(x % 100_000) / 100.0,  # value: exact 2-dp double
                i % 16,  # bucket
            )


def _lcg_rows(lo: int, hi: int) -> list[tuple]:
    # A LIST, not a generator: the simple stream reader prefetches rows
    # on the driver and pickles them to executors, so batches must be
    # materialized and small (bounded by rowsPerBatch).
    out = []
    for i in range(lo, hi):
        x = (_A * i + _C) % _M
        out.append((i, x % 997, float(x % 100_000) / 100.0, i % 16))
    return out


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same LCG feed: the offset is just
    the next row index, so a checkpoint restart resumes mid-stream
    exactly — the reference's manual ``while True / next(chunk)`` loop
    (ingest_data.py:59-85) with durable, engine-managed progress
    instead of in-process iterator state."""

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.batch = int(options.get("rowsPerBatch", DEFAULT_ROWS_PER_PARTITION))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.rows)
        return _lcg_rows(lo, hi), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Deterministic replay for recovery: any offset range can be
        # regenerated — the property that makes the source exactly-once.
        return _lcg_rows(int(start["i"]), int(end["i"]))


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` —
    batch and micro-batch stream over one deterministic feed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double, bucket int"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


class ShardedLcgReader(DataSourceReader):
    """Filter-pushdown-capable reader (Spark 4.1 ``pushFilters``): the
    source is laid out in SHARDS keyed by ``bucket`` (shard s owns the
    contiguous id range [s·rows/shards, (s+1)·rows/shards)), so an
    ``EqualTo('bucket', k)`` predicate received at PLANNING time
    (pushFilters runs on the driver, before partition planning) lets
    ``partitions()`` emit ONLY shard k — the task for every other
    shard is never scheduled. That is source-side partition pruning,
    the property that makes a 100 TB remote feed scan one shard
    instead of all of them.

    The reader records what it consumed (``n_pushed``, the pruned
    bucket); those attributes are pickled with the reader to the
    executors AFTER planning, so every emitted row can carry the
    pushdown evidence into the result — which is how the oracle
    hash-verifies that pushdown actually happened (n_pushed = 0 would
    break the hash).
    """

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 64_000))
        self.shards = int(options.get("shards", 8))
        self.bucket_eq: int | None = None
        self.n_pushed = 0

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo

        # eager (NOT a generator): the consumed-filter bookkeeping must
        # run even if the engine never iterates the returned remainder
        remaining = []
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("bucket",)
                and self.bucket_eq is None
            ):
                self.bucket_eq = int(f.value)
                self.n_pushed += 1
            else:
                remaining.append(f)  # unsupported → Spark keeps applying
        return remaining

    def partitions(self) -> list[InputPartition]:
        per = self.rows // self.shards
        if self.bucket_eq is not None:
            # the filter was CONSUMED (removed from `remaining`), so the
            # engine never re-applies it — this reader alone is
            # responsible for honoring it. A bucket no shard can satisfy
            # therefore MUST plan the empty scan, never fall back to a
            # full one (that would return every row for `bucket = 99`).
            if not (0 <= self.bucket_eq < self.shards):
                return [_RangePartition(0, 0)]
            shard_ids = [self.bucket_eq]
        else:
            shard_ids = list(range(self.shards))
        return [
            _RangePartition(s * per, (s + 1) * per) for s in shard_ids
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        per = self.rows // self.shards
        for i in range(partition.lo, partition.hi):
            x = (_A * i + _C) % _M
            yield (i, i // per, x % 100_000, self.n_pushed)


class ShardedLcgDataSource(DataSource):
    """``spark.read.format("sharded_lcg")`` — the pushdown-capable
    batch source behind scan_python_ds_pushdown."""

    @classmethod
    def name(cls) -> str:
        return "sharded_lcg"

    def schema(self) -> str:
        return "id bigint, bucket bigint, val bigint, pushed bigint"

    def reader(self, schema) -> ShardedLcgReader:
        return ShardedLcgReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register all custom Python data sources."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonLinesDirDataSource)
    spark.dataSource.register(ShardedLcgDataSource)


# ---------------------------------------------------------------------------
# Writer half of the connector surface (Spark 4 Python DataSource
# write path). The reference's sinks are all driver-side pandas calls
# (to_sql :78, to_parquet :103-106, to_gbq :116-122 in
# /root/reference/ingest_data.py); the Spark-first shape is a
# DataSourceWriter: each TASK serializes its partition to its own
# file, returns a commit message, and the driver finalizes atomically
# — the same two-phase commit contract a real object-store/DB sink
# implements.
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class JsonLinesDirWriter(DataSourceWriter):
    """JSON-lines directory sink with two-phase commit.

    write(): one file per task, named with a task-unique uuid so
    speculative/retried attempts never collide; the row payload is
    written with sorted keys for determinism. commit(): the driver
    records every task's file in a `_SUCCESS` manifest — readers that
    honor the manifest get exactly-once visibility even if stray files
    from aborted attempts remain. abort(): best-effort cleanup.

    Save modes: `.mode("overwrite")` clears prior data files and the
    manifest on the driver before any task runs, so the committed
    manifest describes exactly this write; `.mode("append")` keeps
    existing files and commit() MERGES the new file list into the
    existing manifest (manifest stays the single source of truth
    across multiple appends).
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        if overwrite and _os.path.isdir(self.path):
            # Driver-side, before any task starts: drop prior data
            # files + manifest so overwrite replaces rather than mixes.
            for f in _os.listdir(self.path):
                if f.endswith(".jsonl") or f == "_SUCCESS":
                    _os.remove(_os.path.join(self.path, f))

    def write(self, iterator) -> _FileCommit:
        _os.makedirs(self.path, exist_ok=True)
        fname = _os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _FileCommit(fname, n)

    def commit(self, messages) -> None:
        files = [m.path for m in messages if m is not None]
        rows = sum(m.n_rows for m in messages if m is not None)
        marker = _os.path.join(self.path, "_SUCCESS")
        if not self.overwrite and _os.path.exists(marker):
            with open(marker, encoding="utf-8") as f:
                prior = _json.load(f)
            files += prior.get("files", [])
            rows += prior.get("rows", 0)
        with open(marker, "w") as f:
            _json.dump({"files": sorted(set(files)), "rows": rows}, f)

    def abort(self, messages) -> None:  # pragma: no cover - failure path
        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class JsonLinesDirDataSource(DataSource):
    """`.format("jsonl_dir")` — writer-only Python DataSource."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> JsonLinesDirWriter:
        return JsonLinesDirWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802
        return JsonLinesDirStreamWriter(self.options)


from pyspark.sql.datasource import DataSourceStreamWriter  # noqa: E402


class JsonLinesDirStreamWriter(DataSourceStreamWriter):
    """Streaming JSON-lines sink (Spark 4 DataSourceStreamWriter):
    write() runs per task per micro-batch (uuid-named files, no
    collisions across retries); commit(messages, batchId) appends one
    manifest entry per COMMITTED batch to `_BATCHES.jsonl` — a reader
    that honors the manifest sees each batch exactly once even if
    aborted attempts left stray data files. abort() deletes that
    batch's files so replays start clean.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        _os.makedirs(self.path, exist_ok=True)
        fname = _os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return _FileCommit(fname, n)

    def commit(self, messages, batchId) -> None:  # noqa: N803
        files = [m.path for m in messages if m is not None]
        rows = sum(m.n_rows for m in messages if m is not None)
        entry = {"batch_id": batchId, "files": sorted(files), "rows": rows}
        with open(_os.path.join(self.path, "_BATCHES.jsonl"), "a") as f:
            f.write(_json.dumps(entry, sort_keys=True) + "\n")

    def abort(self, messages, batchId) -> None:  # pragma: no cover
        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)
