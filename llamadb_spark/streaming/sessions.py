"""Stateful streaming sessionization (SURVEY §2 #42, streaming form)
via applyInPandasWithState — the custom-stateful-operator escape
hatch when windowed aggregation can't express the semantics
(gap-based sessions have data-dependent window boundaries).

State per user_id: (session_seq, session_start, last_ts, n_events,
total_value). A session closes when the gap since last_ts exceeds
the threshold (emitted on the batch that observes the gap) or when
the state times out after the stream goes quiet.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = (
    "session_seq long, start_us long, last_us long, n_events long, total_value double"
)


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions over a stream keyed by user_id.

    Scale: state is one tuple per active user (not per event);
    timeout eviction bounds it further. Arrow-batched like all
    pandas-with-state operators.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                seq, start_us, last_us, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_seq": [seq],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(last_us, unit="us")],
                        "n_events": [n],
                        "total_value": [total],
                    }
                )
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            seq, start_us, last_us, n, total = state.get
        else:
            seq, start_us, last_us, n, total = 0, None, None, 0, 0.0

        closed: list[tuple] = []
        for ts, value in zip(rows["ts"], rows["value"]):
            t = _us(ts)
            if last_us is None:
                start_us, last_us, n, total = t, t, 1, float(value)
            elif t - last_us > gap_us:
                closed.append((seq, start_us, last_us, n, total))
                seq, start_us, last_us, n, total = seq + 1, t, t, 1, float(value)
            else:
                last_us, n, total = t, n + 1, total + float(value)

        state.update((seq, start_us, last_us, n, total))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_seq": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [c[4] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
