"""The bench stdout-tail contract (round-16): the final compact line
must stay under 1 KB while carrying the most expensive per-query walls,
so the driver's bounded tail capture always ends with parseable JSON
that includes a non-empty "queries" map."""

from __future__ import annotations

import json

from bench import fill_compact_queries


def _base():
    return {
        "metric": "headline_queries_total",
        "value": 90.0,
        "unit": "sec",
        "normalized_total": 88.0,
        "median_calib_sec": 0.33,
        "clean_calib_sec": 0.33,
        "sf": 0.1,
        "n_queries": 94,
        "loadavg_start": 0.5,
        "steal_pct": 0.1,
        "contended": False,
        "cores": 32,
        "detail": "BENCH_detail_r16.json",
    }


def test_line_stays_under_1kb_and_keeps_top_costs():
    timings = {f"query_name_number_{i:03d}": round(0.1 + i * 0.37, 3)
               for i in range(94)}
    compact = _base()
    fill_compact_queries(compact, timings)
    line = json.dumps(compact)
    assert len(line) <= 999
    assert compact["queries_shown"] == len(compact["queries"]) > 0
    # the selected entries are exactly the queries_shown most expensive
    top = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = dict(top[: compact["queries_shown"]])
    assert compact["queries"] == expect
    # round-trip: the line parses and carries the map
    assert json.loads(line)["queries"] == expect


def test_small_suites_fit_entirely():
    timings = {"a": 1.0, "b": 2.0}
    compact = _base()
    fill_compact_queries(compact, timings)
    assert compact["queries"] == timings
    assert compact["queries_shown"] == 2


def test_empty_timings():
    compact = _base()
    fill_compact_queries(compact, {})
    assert compact["queries"] == {}
    assert compact["queries_shown"] == 0
