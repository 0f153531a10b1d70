"""Structured Streaming variants of the incremental pipeline."""

from martech_pipelines_spark.streaming.stream import (
    stream_events_source,
    streaming_dedup_events,
    streaming_latest_per_key,
    streaming_purchase_after_signup,
    streaming_session_counts,
    streaming_tumbling_counts,
    run_stream_to_memory,
)

__all__ = [
    "stream_events_source",
    "streaming_dedup_events",
    "streaming_latest_per_key",
    "streaming_purchase_after_signup",
    "streaming_session_counts",
    "streaming_tumbling_counts",
    "run_stream_to_memory",
]
