from e2e_data_pipeline_spark.streaming.core import (
    load_events_stream,
    run_stream_to_memory,
    sessionize,
    sliding_counts,
    static_join_enrich,
    stream_stream_conversions,
    tumbling_counts,
    latest_state,
    watermark_dedup,
)

__all__ = [
    "load_events_stream",
    "run_stream_to_memory",
    "sessionize",
    "sliding_counts",
    "static_join_enrich",
    "stream_stream_conversions",
    "tumbling_counts",
    "latest_state",
    "watermark_dedup",
]
