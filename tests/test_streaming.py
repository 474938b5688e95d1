"""Structured Streaming tests: the streaming windowed aggregate over
the events files must reproduce the batch operator exactly
(availableNow drains the finite source)."""

from __future__ import annotations

from llamadb_spark.operators.events import windowed_counts
from llamadb_spark.queries.events import _events
from llamadb_spark.streaming import (
    read_events_stream,
    run_to_memory,
    windowed_counts_stream,
)


def test_stream_matches_batch(spark, sf_dir):
    stream = windowed_counts_stream(read_events_stream(spark, sf_dir))
    got = run_to_memory(stream, "win_counts_test")
    batch = windowed_counts(_events(spark, sf_dir))

    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    got_rows = {key(r): (r.n_events, r.total_value) for r in got.collect()}
    batch_rows = {key(r): (r.n_events, r.total_value) for r in batch.collect()}
    assert got_rows == batch_rows
    assert len(got_rows) > 0
