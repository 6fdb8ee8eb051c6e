"""Structured Streaming forms of the reference's incremental core."""

from downloader_spark.streaming.stateful import (
    running_totals,
    streaming_ewma,
    streaming_hll,
    streaming_holt,
    streaming_user_topk,
)
from downloader_spark.streaming.incremental import (
    EVENTS_STREAM_SCHEMA,
    latest_pointer_stream,
    parse_event_log_lines,
    publish_deduped_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_from_parquet_dir,
    streaming_dedup,
    stream_stream_join,
    streaming_late_filter,
    tumbling_counts,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "latest_pointer_stream",
    "parse_event_log_lines",
    "publish_deduped_stream",
    "running_totals",
    "run_to_memory",
    "streaming_ewma",
    "streaming_hll",
    "streaming_holt",
    "streaming_user_topk",
    "session_counts",
    "sliding_counts",
    "stream_from_parquet_dir",
    "streaming_dedup",
    "stream_stream_join",
    "streaming_late_filter",
    "tumbling_counts",
]
