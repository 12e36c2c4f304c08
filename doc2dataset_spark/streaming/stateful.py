"""Custom stateful streaming operator: arbitrary-state sessionization via
``applyInPandasWithState``.

The window-based forms in `events.py` cover what `session_window` can
express; this operator is the escape hatch for session logic Spark has no
built-in for (per-session aggregates, custom close conditions, enrichment
carried across micro-batches). State is an explicit (start, last, n,
total_value) tuple per user, checkpointed by Spark — the structured-
streaming equivalent of the reference's only stateful loop, the per-doc
page counter (`downloader.py:148-216`).

Semantics: a session closes when the next event arrives more than ``gap``
after the previous one (same rule as q31_sessionize's lag+cumsum) or when
the user's event-time state times out past the watermark. Closed sessions
are emitted in append mode; the still-open tail session per user stays in
state (on an unbounded stream it closes on timeout; on a finite test input
it never closes — the test oracle drops each user's last batch session to
match, which is exactly the open/closed boundary).

Scale: state lives in the state store keyed by user_id — shuffle-partitioned,
incrementally checkpointed, O(active users) memory, no global sort anywhere.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 30 * 60 * 1_000_000  # 30 minutes, matches q31_sessionize

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n int, total double"


def _sessions_of(ts_us: list[int], values: list[float]) -> list[tuple]:
    """Split an ordered event list into (start, last, n, total) sessions."""
    out: list[tuple] = []
    cur: list[Any] | None = None
    for t, v in zip(ts_us, values):
        if cur is None or t - cur[1] > GAP_US:
            if cur is not None:
                out.append(tuple(cur))
            cur = [t, t, 1, v]
        else:
            cur[1] = t
            cur[2] += 1
            cur[3] += v
    if cur is not None:
        out.append(tuple(cur))
    return out


def sessionize_fn(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator. Merges buffered state with the new
    micro-batch, emits every session closed by a gap, keeps the open tail."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield _emit(user_id, [(start, last, n, total)])
        return

    batches = [pdf for pdf in pdfs if len(pdf)]
    if not batches:
        return
    ev = pd.concat(batches).sort_values(["ts_us", "event_id"])
    ts_us = ev["ts_us"].tolist()
    values = ev["value"].tolist()
    if state.exists:
        start, last, n, total = state.get
        if ts_us and ts_us[0] - last <= GAP_US:
            # open session continues into this batch: prepend its state by
            # folding the accumulators into the first derived session
            sessions = _sessions_of(ts_us, values)
            s0 = sessions[0]
            sessions[0] = (start, s0[1], n + s0[2], total + s0[3])
        else:
            sessions = [(start, last, n, total)] + _sessions_of(ts_us, values)
    else:
        sessions = _sessions_of(ts_us, values)

    closed, open_tail = sessions[:-1], sessions[-1]
    state.update(open_tail)
    state.setTimeoutTimestamp(open_tail[1] // 1000 + GAP_US // 1000)
    if closed:
        yield _emit(user_id, closed)


def _emit(user_id: int, sessions: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
            "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
            "n_events": [s[2] for s in sessions],
            "total_value": [round(s[3], 4) for s in sessions],
        }
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events stream → closed sessions, via arbitrary per-user state.

    Expects the raw events columns; projects to the numeric clock
    (event-time µs) before entering Python so the Arrow batches are narrow.
    """
    from pyspark.sql import functions as F

    prepped = events.withWatermark("ts", "1 hour").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").cast("double").alias("value"),
        "ts",
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        sessionize_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
