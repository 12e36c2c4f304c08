"""transformWithState operator: per-user lifetime running totals on the
MODERN arbitrary-state API (Spark 4's ``transformWithStateInPandas``,
SPARK-49564 — the successor to ``applyInPandasWithState``, which
streaming/stateful.py covers for the legacy surface).

What it computes: after every micro-batch, each user whose events
arrived in that batch emits an updated (n_events, total_value) lifetime
row — the always-fresh per-entity profile (feature-store style) whose
state is one ValueState row per user.

Why the new API matters at scale: state is a TYPED handle
(``getValueState`` with a schema) in the per-partition state store —
composable (a processor can hold several value/list/map states and
timers) where the legacy API forced one opaque tuple; and the runtime
can evolve state schemas. Semantics pinned by the test: the LAST update
emitted per user over a finite replay equals the batch groupBy totals
(decimal-exact accumulation is not needed — counts are ints and the
test compares rounded doubles the same on both paths).

Environment gate: the transformWithState runtime talks to its state
server over protobuf (pyspark's transform_with_state_driver_worker
imports google.protobuf), which this container does not ship — the test
importorskips on it, the same recipe-documented gate as the fitz/PIL
codec paths. The module itself imports and plans fine without it; only
stream START needs protobuf.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


class RunningTotalsProcessor(StatefulProcessor):
    """One ValueState row per user: (n, total); every batch folds its
    rows in and emits the refreshed lifetime totals."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        if self._state.exists():
            n, total = self._state.get()
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """events (user_id, value, …) → per-user lifetime totals, refreshed
    each micro-batch (update mode; no event-time semantics needed, so
    timeMode is None and state lives until the query dies)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotalsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
