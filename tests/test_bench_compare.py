"""bench_compare.py contract tests (round-12 verdict, What's wrong #1).

The original failure: bench.py wrote per-query walls only to the
unversioned BENCH_detail.json (overwritten every run) and BENCH_r{N}.json
wrappers carried only a `"detail"` pointer; bench_compare.py resolved the
pointer for BOTH arguments, so `bench_compare.py BENCH_r11.json
BENCH_r12.json` loaded the current detail file twice and printed a
perfect all-1.00 "no per-query regressions" self-comparison. These tests
pin the two refusals that close the hole:

1. two arguments resolving to ONE per-query record is a hard error;
2. a wrapper whose pointer names the unstamped BENCH_detail.json (the
   pre-round-13 format whose history was not preserved) is a hard error
   rather than a silent comparison against whatever ran last.

Pure-python: no Spark session needed.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "bench_compare.py",
)


def _mod():
    spec = importlib.util.spec_from_file_location("bench_compare", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _detail(queries: dict[str, float], total: float | None = None) -> dict:
    return {
        "metric": "headline_queries_total",
        "value": total if total is not None else round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "loadavg_start": 0.1,
        "contended": False,
    }


def _write(path, obj) -> str:
    with open(path, "w") as fh:
        json.dump(obj, fh)
    return str(path)


def test_self_comparison_refused(tmp_path, monkeypatch, capsys):
    """Two wrappers pointing at one detail file must refuse, not print
    all-1.00 ratios (the exact r11-vs-r12 failure)."""
    detail = _write(tmp_path / "BENCH_detail_r12.json", _detail({"q1": 1.0}))
    w1 = _write(
        tmp_path / "BENCH_r11.json",
        {"parsed": {"metric": "x", "value": 1.0, "detail": "BENCH_detail_r12.json"}},
    )
    w2 = _write(
        tmp_path / "BENCH_r12.json",
        {"parsed": {"metric": "x", "value": 1.0, "detail": "BENCH_detail_r12.json"}},
    )
    mod = _mod()
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", w1, w2])
    with pytest.raises(SystemExit) as exc:
        mod.main()
    assert "self-comparison" in str(exc.value)
    assert detail in str(exc.value)


def test_same_file_twice_refused(tmp_path, monkeypatch):
    detail = _write(tmp_path / "BENCH_detail_r13.json", _detail({"q1": 1.0}))
    mod = _mod()
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", detail, detail])
    with pytest.raises(SystemExit) as exc:
        mod.main()
    assert "self-comparison" in str(exc.value)


def test_unstamped_detail_pointer_refused(tmp_path, monkeypatch):
    """A pre-r13 wrapper names the overwritten BENCH_detail.json; loading
    it must refuse even when that file exists (its content is whatever
    ran LAST, not that round's walls)."""
    _write(tmp_path / "BENCH_detail.json", _detail({"q1": 9.9}))
    w = _write(
        tmp_path / "BENCH_r12.json",
        {"parsed": {"metric": "x", "value": 1.0, "detail": "BENCH_detail.json"}},
    )
    mod = _mod()
    with pytest.raises(SystemExit) as exc:
        mod.load(w)
    assert "unstamped" in str(exc.value)


def test_distinct_records_compare_for_real(tmp_path, monkeypatch, capsys):
    """Two distinct per-round records produce real ratios and gate on
    regressions — the check the tool was built for actually runs."""
    old = _write(
        tmp_path / "BENCH_detail_r12.json", _detail({"q1": 1.0, "q2": 2.0})
    )
    new = _write(
        tmp_path / "BENCH_detail_r13.json", _detail({"q1": 1.1, "q2": 4.0})
    )
    mod = _mod()
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", old, new])
    rc = mod.main()
    out = capsys.readouterr().out
    assert rc == 1  # q2 regressed 2.0 -> 4.0 (> 1.5x, above 0.5s floor)
    assert "q2" in out and "REGRESSED" in out
    # q1's 1.1x is under threshold: not flagged
    assert "regressed >1.5x: q2" in out


def test_distinct_records_no_regression_green(tmp_path, monkeypatch, capsys):
    old = _write(tmp_path / "BENCH_detail_r12.json", _detail({"q1": 2.0}))
    new = _write(tmp_path / "BENCH_detail_r13.json", _detail({"q1": 2.1}))
    mod = _mod()
    monkeypatch.setattr(sys, "argv", ["bench_compare.py", old, new])
    rc = mod.main()
    assert rc == 0
    assert "no per-query regressions" in capsys.readouterr().out
