"""Stateful streaming CEP (SURVEY §2 #178, streaming form): the
applyInPandasWithState twin of operators/events.cep_sequence_matches
(A → ¬N → B within T). Windowed aggregation can't express it — the
match condition couples THREE event types with an ordering/negation
constraint — so it's the same custom-stateful escape hatch as
sessionization.

State per user_id: (last_trigger_us, last_negation_us) — two longs
per ACTIVE user regardless of event volume, evicted by processing
timeout once a full window passes with no traffic (a trigger older
than `within` can never match again). Matches are emitted in the
micro-batch that carries the target event, so results are
incremental and exactly-once per match under the normal
checkpointed-sink contract.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

CEP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("match_id", LongType()),
        StructField("trigger_ts", TimestampType()),
        StructField("target_ts", TimestampType()),
        StructField("gap_us", LongType()),
    ]
)

#: -1 encodes "never seen" (state tuples can't hold NULLs portably).
_STATE_SCHEMA = "trig_us long, neg_us long"


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def cep_matches_stream(
    events: DataFrame,
    trigger: str = "view",
    target: str = "purchase",
    negation: str = "error",
    within_seconds: int = 1800,
) -> DataFrame:
    """Streaming pattern-with-negation matches, keyed on user_id.

    Same ordering assumption as the sessionize stream: a user's
    events arrive in event-time order across micro-batches (in-batch
    rows are sorted here; cross-batch disorder is a source-contract
    question, as in any CEP engine). Output rows are identical to
    the batch operator's over the events the stream has seen —
    asserted stream≡batch in tests/test_streaming.py.
    """
    within_us = within_seconds * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return

        if state.exists:
            trig_us, neg_us = state.get
        else:
            trig_us, neg_us = -1, -1

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple] = []
        for eid, etype, ts in zip(
            rows["event_id"], rows["event_type"], rows["ts"]
        ):
            t = _us(ts)
            if etype == target:
                if (
                    trig_us >= 0
                    and t - trig_us <= within_us
                    and (neg_us < trig_us)  # -1 sentinel = no negation
                ):
                    out.append((int(eid), trig_us, t))
            # state transitions AFTER the match check: the batch
            # operator's window frame excludes the current row
            if etype == trigger:
                trig_us = t
            elif etype == negation:
                neg_us = t

        state.update((trig_us, neg_us))
        state.setTimeoutDuration(within_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "match_id": [o[0] for o in out],
                    "trigger_ts": [pd.Timestamp(o[1], unit="us") for o in out],
                    "target_ts": [pd.Timestamp(o[2], unit="us") for o in out],
                    "gap_us": [o[2] - o[1] for o in out],
                }
            )

    events = events.select("user_id", "event_id", "event_type", "ts")
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=CEP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
