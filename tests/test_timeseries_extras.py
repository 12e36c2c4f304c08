"""Invariant + exact-value tests for the time-series extras; full value
equality is oracle-gated (driver mirror), these pin the semantics the
docstrings claim: interpolation lies on the bracket segment, EWMA is the
power-of-two weighted mean with an adjusted normalizer."""

from __future__ import annotations

from collections import defaultdict
from datetime import date

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.queries.timeseries_extras import EWMA_H


def test_interp_grid_is_gapless_and_bracketed(spark, sf_dir):
    rows = REGISTRY["events_resample_interp"].builder(spark, sf_dir).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        assert r.value_interp is not None
        by_user[r.user_id].append(r)
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        # gapless day grid, first and last days observed by construction
        days = [date.fromisoformat(r.day) for r in series]
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), "grid has a gap"
        assert series[0].observed and series[-1].observed
        # every interpolated value lies within its bracketing segment:
        # between the nearest observed values on each side
        obs_idx = [i for i, r in enumerate(series) if r.observed]
        for lo, hi in zip(obs_idx, obs_idx[1:]):
            a, b = series[lo].value_interp, series[hi].value_interp
            lo_v, hi_v = min(a, b), max(a, b)
            for i in range(lo + 1, hi):
                v = series[i].value_interp
                assert lo_v - 1e-9 <= v <= hi_v + 1e-9
        # strictly linear: second differences vanish inside a gap wider
        # than one day (values sit on one straight line)
        for lo, hi in zip(obs_idx, obs_idx[1:]):
            seg = [series[i].value_interp for i in range(lo, hi + 1)]
            if len(seg) >= 3:
                steps = [b - a for a, b in zip(seg, seg[1:])]
                assert max(steps) - min(steps) < 2e-4  # round-4 quantum


def test_ewma_matches_reference_fold(spark, sf_dir):
    rows = REGISTRY["events_ewma"].builder(spark, sf_dir).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        assert 1 <= r.n_obs <= EWMA_H
        by_user[r.user_id].append(r)
    checked = 0
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        vals = [r.day_value for r in series]
        for t, r in enumerate(series):
            frame = vals[max(0, t - (EWMA_H - 1)) : t + 1]
            assert r.n_obs == len(frame)
            num = den = 0.0
            for x in frame:  # oldest-first fold, as documented
                num = num * 0.5 + x
                den = den * 0.5 + 1.0
            assert abs(r.ewma - round(num / den, 4)) < 1e-9
            checked += 1
    assert checked >= 100


def test_ewma_of_constant_series_is_identity(spark):
    import pyspark.sql.functions as F

    from doc2dataset_spark.queries.timeseries_extras import events_ewma

    # a user with a constant daily value: EWMA must equal that value at
    # every step regardless of horizon truncation (normalizer exactness)
    df = spark.createDataFrame(
        [
            (i, f"2024-01-{d:02d} 12:00:00", 7, "view", 3.25, "{}")
            for i, d in enumerate(range(1, 15))
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(f"{td}/events.parquet")
        out = events_ewma(spark, td).collect()
    assert len(out) == 14
    assert all(r.ewma == 3.25 for r in out)


def test_gapfill_fills_real_gaps_with_locf(spark):
    """rollup_hypertable_gapfill at sf0.001, where 189 of the 720 grid
    hours hold no events: gap rows must emit n_events=0 / total NULL
    with total_locf equal to the nearest earlier observed hour's total,
    observed rows must carry their own total, and the grid must be
    gapless hour-by-hour from the first to the last observed bucket."""
    from datetime import datetime, timedelta

    rows = REGISTRY["rollup_hypertable_gapfill"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 720
    rows.sort(key=lambda r: r.bucket)
    ts = [datetime.strptime(r.bucket, "%Y-%m-%d %H:%M:%S") for r in rows]
    assert all(
        b - a == timedelta(hours=1) for a, b in zip(ts, ts[1:])
    ), "grid has holes or duplicates"
    gaps = [r for r in rows if r.n_events == 0]
    assert len(gaps) == 189
    last_obs = None
    for r in rows:
        if r.n_events > 0:
            assert r.total is not None and r.total_locf == r.total
            last_obs = r.total
        else:
            assert r.total is None
            assert last_obs is not None and r.total_locf == last_obs
