"""Custom stateful streaming operator: gap-based sessionization with
`applyInPandasWithState`.

The batch twin is the lag+cumsum sessionizer (entry query
`events_sessionize`); streams cannot use unbounded windows, so the state
store keeps one open session per user key: events extend it while gaps
stay under `gap_sec`, a larger gap (or an event-time timeout past the
watermark) closes and emits it. This is the `applyInPandasWithState`
pattern the reference has no analog for (it is batch-only) — state is
per-key, Arrow-batched, and bounded by the number of live users.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """events(user_id long, ts timestamp) stream -> closed sessions
    (user_id, session_start, session_end, n_events; epoch seconds).

    A session closes when a later event arrives more than `gap_sec` after
    its last event, or when the event-time watermark passes last_ts +
    gap_sec (timeout) — so sessions are emitted exactly once without
    unbounded state.
    """

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return
        ts_list: list[int] = []
        epoch0 = pd.Timestamp("1970-01-01")
        for pdf in pdfs:
            # naive-as-UTC epoch (session tz is UTC); Timestamp.timestamp()
            # would interpret naive values in the WORKER's local tz
            ts_list.extend(
                int((t - epoch0) // pd.Timedelta(seconds=1)) for t in pdf["ts"]
            )
        ts_list.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        out = []
        for t in ts_list:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_sec:
                out.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
            # close by timeout once the watermark passes the gap
            state.setTimeoutTimestamp((last + gap_sec) * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_start": [o[0] for o in out],
                    "session_end": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
