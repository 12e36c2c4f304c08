"""applyInPandasWithState sessionization vs the batch lag+cumsum oracle.

On a finite input the open tail session per user never closes (no later
event advances its state past the timeout), so the streamed result must
equal the batch sessions minus each user's last session — checking both
the emitted rows and the open/closed boundary itself.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.streaming.events import stream_events
from doc2dataset_spark.streaming.stateful import sessionize_stateful


def _run_append(spark, agg, name):
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_stateful_sessions_match_batch_closed_sessions(spark, sf_dir):
    got = _run_append(
        spark, sessionize_stateful(stream_events(spark, sf_dir)), "stateful_out"
    ).toPandas()

    # batch oracle: q31 session ids → per-session aggregates. A user's last
    # session is emitted only if the final watermark (global max ts - 1h)
    # passed its gap deadline — i.e. the event-time timeout fired; otherwise
    # it is still open in state and must NOT appear.
    ev = REGISTRY["q31_sessionize"].builder(spark, sf_dir)
    from doc2dataset_spark.session import load_table
    from doc2dataset_spark.streaming.stateful import GAP_US

    raw = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    )
    wm_us = (
        raw.agg(F.max("ts_us")).collect()[0][0] - 3600 * 1_000_000
    )
    sessions = ev.join(raw, "event_id").groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.max("ts_us").alias("end_us")
    )
    last = W.partitionBy("user_id")
    want = (
        sessions.withColumn("max_sid", F.max("session_id").over(last))
        .filter(
            (F.col("session_id") < F.col("max_sid"))
            | (F.col("end_us") + F.lit(GAP_US) < F.lit(wm_us))
        )
        .toPandas()
    )

    assert len(got) == len(want)
    g = (
        got.groupby("user_id")["n_events"]
        .apply(lambda s: sorted(s.tolist()))
        .to_dict()
    )
    w = (
        want.groupby("user_id")["n_events"]
        .apply(lambda s: sorted(s.tolist()))
        .to_dict()
    )
    assert g == w


def test_stateful_session_boundaries_respect_gap(spark, sf_dir):
    got = _run_append(
        spark, sessionize_stateful(stream_events(spark, sf_dir)), "stateful_gap"
    ).toPandas()
    # within any emitted session, duration is finite and non-negative;
    # sessions of one user never overlap and are separated by > 30 min
    for _, grp in got.groupby("user_id"):
        grp = grp.sort_values("session_start")
        assert (grp["session_end"] >= grp["session_start"]).all()
        gaps_ns = (
            grp["session_start"].iloc[1:].values
            - grp["session_end"].iloc[:-1].values
        ).astype("timedelta64[ns]").astype("int64")
        assert (gaps_ns > 30 * 60 * 1_000_000_000).all()


class _FakeState:
    """Minimal GroupState stand-in for driving sessionize_fn directly."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts


def test_late_event_never_regresses_session_end():
    """A late-but-within-watermark event must not shrink the open
    session's end below its start (the signed-gap trap: late_ts - last is
    negative, so a naive <= GAP check always merges and then overwrites
    the end with the earlier timestamp)."""
    import pandas as pd

    from doc2dataset_spark.streaming.stateful import GAP_US, sessionize_fn

    t0 = 1_000_000_000_000  # µs
    state = _FakeState((t0, t0, 1, 1.0))  # open session [t0, t0]
    late = t0 - (GAP_US + GAP_US // 2)  # 45 min earlier (gap = 30 min)
    batch = pd.DataFrame(
        {"ts_us": [late], "value": [2.0], "event_id": [7]}
    )
    list(sessionize_fn((42,), iter([batch]), state))
    start, last, n, total = state.get
    assert last >= start  # end never regresses below start
    assert last == t0  # stored end unchanged by the earlier event


def test_late_event_within_gap_extends_start_downward():
    import pandas as pd

    from doc2dataset_spark.streaming.stateful import GAP_US, sessionize_fn

    t0 = 1_000_000_000_000
    state = _FakeState((t0, t0, 1, 1.0))
    late = t0 - GAP_US // 2  # 15 min earlier: inside the gap -> merges
    batch = pd.DataFrame({"ts_us": [late], "value": [2.0], "event_id": [7]})
    out = list(sessionize_fn((42,), iter([batch]), state))
    assert not out  # nothing closed
    start, last, n, total = state.get
    assert (start, last, n) == (late, t0, 2)
