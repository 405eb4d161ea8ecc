"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.2 streaming block; the escape hatch for semantics the
built-in windowed aggregations can't express).

The operator keeps per-user running totals across micro-batches and
emits the updated snapshot for every user seen in a batch. State is a
fixed-size tuple per key — bounded memory, mergeable, exactly the
shape that scales to millions of keys across executors (state lives in
the HDFS-backed state store, partitioned by key).

Batch≡stream parity: with a single availableNow batch the final
snapshots must equal the plain batch groupBy — asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
        StructField("max_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch of one user's events into running state.

    Money is held as integer cents inside the state so cross-batch
    accumulation is exact and order-insensitive (same trick as the
    DECIMAL sums on the SQL side).
    """
    n, total_c, max_c = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        cents = (pdf["value"] * 100).round().astype("int64")
        n += len(pdf)
        total_c += int(cents.sum())
        max_c = max(max_c, int(cents.max()) if len(cents) else 0)
    state.update((n, total_c, max_c))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_c / 100.0],
            "max_value": [max_c / 100.0],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user fold to a STREAMING events frame."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_batch(events: DataFrame) -> DataFrame:
    """Batch golden answer: the same fold as one big group-by (values
    routed through cents so float rounding matches the stateful path).
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents) / 100.0).alias("total_value"),
            (F.max(cents) / 100.0).alias("max_value"),
        )
    )


class UserStatsProcessor:
    """Second-generation stateful operator (Spark 4
    ``transformWithStateInPandas``): the same per-user cents fold as
    :func:`_update_user_stats`, expressed as a ``StatefulProcessor``
    with an explicit typed ValueState handle.

    vs ``applyInPandasWithState``: state is a named, schema'd handle
    (composable — an operator can hold several), timers replace the
    single timeout conf, and the state store must be RocksDB (the
    disk-backed store that holds beyond-memory state at scale).
    Declared lazily in :func:`running_user_stats_tws` so importing this
    module never requires the StatefulProcessor base class.
    """


def _make_processor():
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total_c, max_c = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                cents = (pdf["value"] * 100).round().astype("int64")
                n += len(pdf)
                total_c += int(cents.sum())
                max_c = max(max_c, int(cents.max()) if len(cents) else 0)
            self._state.update((n, total_c, max_c))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_c / 100.0],
                    "max_value": [max_c / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return _Processor()


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The transformWithStateInPandas twin of
    :func:`running_user_stats` (requires the RocksDB state store
    provider on the session)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_make_processor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
