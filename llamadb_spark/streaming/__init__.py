"""Structured Streaming surface over the events table."""

from llamadb_spark.streaming.cep import cep_matches_stream
from llamadb_spark.streaming.ingest_dedup import ingest_dedup_stream
from llamadb_spark.streaming.ivm import ivm_group_agg_stream
from llamadb_spark.streaming.transitions import transitions_stream
from llamadb_spark.streaming.streams import (
    dedup_stream,
    enriched_counts_stream,
    purchases_with_recent_views_stream,
    purchases_without_recent_views_stream,
    read_events_stream,
    run_to_memory,
    run_with_progress,
    windowed_counts_stream,
)

__all__ = [
    "read_events_stream",
    "windowed_counts_stream",
    "run_to_memory",
    "run_with_progress",
    "dedup_stream",
    "enriched_counts_stream",
    "purchases_with_recent_views_stream",
    "purchases_without_recent_views_stream",
    "cep_matches_stream",
    "transitions_stream",
    "ivm_group_agg_stream",
    "ingest_dedup_stream",
]
