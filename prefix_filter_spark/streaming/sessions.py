"""Streaming sessionization — session-gap windows per user through
``applyInPandasWithState`` with an EVENT-TIME timeout: a session closes
when the event-time watermark passes ``last_event + gap``, exactly the
semantics of the batch lag-split twin (__spark_entry__.q_sessionization)
— the stream emits each closed session once (append-style), and the
pytest gate pins stream == batch on the same input.

State per user is three longs (start/end in epoch-us, n_events) — O(1) regardless
of stream length, the property that keeps the state store bounded at
one row per ACTIVE user. Sessions close through Spark's timeout
mechanism, not by scanning state: when the watermark passes a user's
``end + gap``, that user's update fires with ``hasTimedOut`` and emits.

Late-data contract: events later than the watermark delay are dropped
by Spark upstream; events that arrive within the delay but BEFORE the
open session's last timestamp extend the open session (they cannot
re-split it — the state keeps bounds, not the event list). This is the
standard bounded-state tradeoff; the exact twin is the batch operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """events: streaming DF with (user_id, ts[, ...]). Returns the
    closed-session stream (user_id, session_start, session_end,
    n_events)."""
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend(
                (pdf[ts_col].astype("int64") // 1_000).tolist()
            )
        ts_us.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = ts_us[0], ts_us[0], 0

        out = []
        for t in ts_us:
            if t - end > gap_us and n > 0:
                out.append((start, end, n))
                start, n = t, 0
            start = min(start, t)  # late-but-in-watermark event extends back
            end = max(end, t)
            n += 1
        state.update((start, end, n))
        # timeout API is ms-epoch; round UP so it never fires early
        state.setTimeoutTimestamp((end + gap_us + 999) // 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in out
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in out
                    ],
                    "n_events": [c for _, _, c in out],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, session_start timestamp, "
                "session_end timestamp, n_events long"
            ),
            stateStructType="start long, end long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
