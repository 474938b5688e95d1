"""Structured Streaming surface over the events table."""

from llamadb_spark.streaming.streams import (
    read_events_stream,
    run_to_memory,
    windowed_counts_stream,
)

__all__ = ["read_events_stream", "windowed_counts_stream", "run_to_memory"]
