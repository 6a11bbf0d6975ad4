"""Custom stateful streaming operator: incremental sessionization with
applyInPandasWithState.

The batch ``sessionize`` (windows.py) answers the same question with window
functions; this version maintains per-user session state incrementally so a
live stream emits sessions as they CLOSE (gap exceeded) instead of
recomputing history. State per key is O(1) (one open session summary), so
state store size scales with distinct users, not events — the property that
matters for an unbounded 100 TB stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# open-session state: (start_epoch_us, end_epoch_us, n_events, sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sv", T.DoubleType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    evict_idle: bool = False,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if evict_idle and state.hasTimedOut:
        # event-time timeout: the watermark passed this user's open
        # session end + gap, so no in-order event can extend it — emit
        # it CLOSED and free the state (bounded state for idle users)
        start_us, end_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "sum_value": [round(sv, 4)],
            }
        )
        return
    events: list[tuple[int, float]] = []
    for pdf in pdfs:
        ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")).tolist()
        events.extend(zip(ts_us, pdf["value"].tolist()))
    events.sort()

    if state.exists:
        start_us, end_us, n, sv = state.get
    else:
        start_us = end_us = n = 0
        sv = 0.0

    closed: list[tuple[int, int, int, float]] = []
    for ts, val in events:
        if n == 0:
            start_us, end_us, n, sv = ts, ts, 1, float(val or 0.0)
        elif ts - end_us > gap_us:
            closed.append((start_us, end_us, n, sv))
            start_us, end_us, n, sv = ts, ts, 1, float(val or 0.0)
        else:
            end_us = max(end_us, ts)
            n += 1
            sv += float(val or 0.0)
    if n > 0:
        state.update((start_us, end_us, n, sv))
        if evict_idle:
            # fire once the event-time watermark passes the gap after
            # this session's current end
            state.setTimeoutTimestamp((end_us + gap_us) // 1000 + 1)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in closed],
                "n_events": [c for _, _, c, _ in closed],
                "sum_value": [round(v, 4) for _, _, _, v in closed],
            }
        )


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    evict_idle: bool = False,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Incremental sessionization over a (batch or streaming) DataFrame
    grouped by user. Emits CLOSED sessions only; the open tail session per
    user stays in state. Arrow-batched; state is one row per user.

    ``evict_idle=True`` (round 11, streaming only) arms an EVENT-TIME
    timeout per open session: once the watermark passes ``session_end +
    gap``, no in-order event can extend the session, so it is emitted
    CLOSED and its state removed — without this, one idle user pins one
    state row forever, and "O(1) state per key" silently becomes
    O(all-users-ever-seen) on an unbounded stream. A watermark is
    required (Spark rejects event-time timeouts without one);
    ``watermark_delay`` (default = the gap) is applied to ``ts`` here if
    the input does not already carry one. Emission timing: timeouts fire
    in the microbatch AFTER the watermark advances — an availableNow
    replay that ends before another batch runs keeps truly-open tails in
    state, matching the untimed semantics."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us, evict_idle)

    timeout = GroupStateTimeout.NoTimeout
    if evict_idle:
        timeout = GroupStateTimeout.EventTimeTimeout
        if events.isStreaming:
            events = events.withWatermark(
                "ts", watermark_delay or f"{gap_minutes} minutes"
            )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
