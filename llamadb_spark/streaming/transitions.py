"""Streaming event-transition extraction (SURVEY §2 #228's streaming
twin): the applyInPandasWithState form of queries/events.py
e21_transition_matrix's lag step — emit one (prev_type, next_type)
row per consecutive event pair in each user's timeline, incrementally
across micro-batches.

A windowed aggregation can't express this: the pair couples each
event to the PREVIOUS one across micro-batch boundaries, so the
operator keeps one string of state per active user (the last event
type seen) — bounded by active-user cardinality, not event volume,
and evicted by processing timeout after an idle period. This is the
multi-key typed-state shape (string state, per-user keys) that
complements sessions.py (longs) and cep.py (two longs).

The downstream Markov aggregation (counts + row-normalized
probabilities) is an ordinary batch/streaming groupBy over the
emitted steps; queries/events.py e24_transition_stream drains this
stream and aggregates, giving a full value-hash oracle against the
batch e21 SQL (stream ≡ batch, driver-attested).

Ordering contract (same as sessions.py / cep.py): a user's events
arrive in event-time order across micro-batches; in-batch rows are
sorted here. The test fixture delivers the events table as one file
= one ordered micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSITIONS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)

_STATE_SCHEMA = "last_type string"

#: Idle eviction: a user silent this long is dropped from the state
#: store; their next event simply starts a fresh chain (exactly the
#: cold-start semantics of the batch lag's first row).
IDLE_TIMEOUT_MS = 6 * 3600 * 1000


def transitions_stream(events: DataFrame) -> DataFrame:
    """Per-user consecutive event-type pairs, keyed on user_id.

    State per user: the last event type (one string). Each micro-
    batch emits one row per event that HAS a predecessor — the exact
    row set of the batch operator's lag-over-(ts, event_id) step.
    """

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return

        last_type = state.get[0] if state.exists else None

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        prev_out: list[str] = []
        next_out: list[str] = []
        ts_out: list = []
        for etype, ts in zip(rows["event_type"], rows["ts"]):
            if last_type is not None:
                prev_out.append(last_type)
                next_out.append(etype)
                ts_out.append(ts)
            last_type = etype

        state.update((last_type,))
        state.setTimeoutDuration(IDLE_TIMEOUT_MS)
        if prev_out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(prev_out),
                    "prev_type": prev_out,
                    "next_type": next_out,
                    "ts": ts_out,
                }
            )

    events = events.select("user_id", "event_id", "event_type", "ts")
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITIONS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
