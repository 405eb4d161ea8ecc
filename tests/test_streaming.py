"""Batch≡stream parity: every streaming transform must produce the
same result under ``readStream`` (availableNow → memory sink) as under
``spark.read`` — the batch answer is the golden answer (SURVEY.md §5).
"""

from __future__ import annotations

import pytest

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.streaming import (
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
