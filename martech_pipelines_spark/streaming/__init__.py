"""Structured Streaming variants of the incremental pipeline."""

from martech_pipelines_spark.streaming.stream import (
    stream_events_source,
    streaming_latest_per_key,
    streaming_tumbling_counts,
    run_stream_to_memory,
)

__all__ = [
    "stream_events_source",
    "streaming_latest_per_key",
    "streaming_tumbling_counts",
    "run_stream_to_memory",
]
