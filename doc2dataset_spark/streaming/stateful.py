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
        # Out-of-order (late-but-within-watermark) events need signed-gap
        # care: a naive `ts[0] - last <= GAP` is ALWAYS true for a late
        # event, and folding batch-derived sessions onto the state could
        # regress the stored session end below its start. Instead:
        # 1. events more than a gap BEFORE the open session's start form
        #    their own already-closed session(s);
        # 2. the rest merge-walk the open session, extending it in BOTH
        #    directions (start can move down, end only up), with in-gap
        #    chaining carried forward.
        # (Transitive chains across the early/open split are approximated
        # — summary state cannot re-sessionize full history.)
        early = [(t, v) for t, v in zip(ts_us, values) if t < start - GAP_US]
        rest = [(t, v) for t, v in zip(ts_us, values) if t >= start - GAP_US]
        early_sessions = (
            _sessions_of([t for t, _ in early], [v for _, v in early])
            if early
            else []
        )
        i = 0
        while i < len(rest) and rest[i][0] <= last + GAP_US:
            t, v = rest[i]
            start, last = min(start, t), max(last, t)
            n += 1
            total += v
            i += 1
        sessions = (
            early_sessions
            + [(start, last, n, total)]
            + _sessions_of([t for t, _ in rest[i:]], [v for _, v in rest[i:]])
        )
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
