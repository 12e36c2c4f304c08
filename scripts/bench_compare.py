#!/usr/bin/env python
"""Diff two bench.py JSON outputs and flag per-query regressions.

Usage:
    python scripts/bench_compare.py BENCH_r01.json BENCH_r03.json [threshold]

Exit status 1 if any query regressed by more than `threshold` (default
1.5×) AND the newer run was not self-flagged as contended — so a round
can gate on "no unexplained per-query regression" the way round 2's
ngram-jaccard drift should have been caught.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict, str]:
    """Accept bench.py's stdout (since round 10: the full-record line
    followed by a compact summary line — prefer the line that carries
    per-query data), a BENCH_detail*.json full record, or the round
    driver's BENCH_r{N}.json wrapper (whose `parsed` field may hold
    either form). Returns (record, resolved_source_path) so the caller
    can refuse a self-comparison (round-12 verdict, What's wrong #1:
    two wrappers both pointing at one overwritten BENCH_detail.json
    compared that file against itself and printed all-1.00 ratios)."""
    import os

    source = os.path.abspath(path)
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # multi-line stdout capture: scan every JSON line, prefer the
        # one with the per-query map (the compact final line has none)
        d = None
        for line in text.strip().splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                d = cand
                break
            if d is None:
                d = cand
        if d is None:
            raise
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d and d.get("detail"):
        # compact summary line: the per-query map lives in the sibling
        # detail file it names
        if d["detail"] == "BENCH_detail.json":
            # pre-round-13 wrapper: its detail pointer names the
            # UNSTAMPED latest-run file, which has been overwritten by
            # every bench run since — resolving it would compare against
            # whatever ran last, not that round. Refuse loudly.
            raise SystemExit(
                f"{path}: its detail pointer names the unstamped "
                "BENCH_detail.json, which is overwritten every run — "
                "that round's per-query walls were not preserved. Use a "
                "round-stamped BENCH_detail_r{N}.json record (written "
                "since round 13) or a full stdout capture."
            )
        detail = os.path.join(os.path.dirname(os.path.abspath(path)), d["detail"])
        if os.path.exists(detail):
            with open(detail) as f:
                d = json.load(f)
            source = os.path.abspath(detail)
    if "queries" not in d:
        raise SystemExit(
            f"{path}: no per-query data (compact summary only and its "
            "detail file is absent) — pass the BENCH_detail_r{N}.json "
            "record or the full stdout capture"
        )
    return d, source


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    (old, old_src), (new, new_src) = load(sys.argv[1]), load(sys.argv[2])
    if old_src == new_src:
        raise SystemExit(
            f"both arguments resolve to the same per-query record "
            f"({old_src}) — this would be a self-comparison (every ratio "
            "exactly 1.00), not a regression check. Pass two distinct "
            "round-stamped BENCH_detail_r{N}.json records."
        )
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    # Compare CALIBRATION-NORMALIZED walls when both records carry them
    # (bench.py has emitted queries_normalized since round 9) — the
    # standing policy, with the measured host-drift evidence, lives in
    # REGRESSIONS.md; there is deliberately no force-raw flag: raw walls
    # embed the host's CPU speed at run time, and the round-14 close
    # MEASURED that speed drifting 23% within one day (calibration
    # 0.41 -> 0.50 s, BASELINE.md) — a raw-ratio gate then flags dozens
    # of untouched queries. Normalized ratios divide that drift out and
    # flag only code-shaped change. Raw remains the fallback for
    # pre-round-9 records.
    if "queries_normalized" in old and "queries_normalized" in new:
        oq, nq = old["queries_normalized"], new["queries_normalized"]
        basis = "normalized"
    else:
        oq, nq = old["queries"], new["queries"]
        basis = "raw"
    regressed = []
    print(f"per-query basis: {basis}")
    print(f"{'query':30s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in nq:
        if name not in oq:
            print(f"{name:30s} {'—':>8s} {nq[name]:8.2f}   (new)")
            continue
        ratio = nq[name] / oq[name] if oq[name] else float("inf")
        flag = ""
        # floor-effect guard: sub-half-second queries are scheduling
        # noise at sf0.1, not scaling signal
        if ratio > threshold and nq[name] > 0.5:
            flag = "  << REGRESSED"
            regressed.append(name)
        print(f"{name:30s} {oq[name]:8.2f} {nq[name]:8.2f} {ratio:7.2f}{flag}")
    for name in oq:
        if name not in nq:
            print(f"{name:30s} {oq[name]:8.2f} {'—':>8s}   (dropped)")
    print(
        f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s"
        f"  (old load {old.get('loadavg_start', '?')},"
        f" new load {new.get('loadavg_start', '?')})"
    )
    if old.get("contended"):
        # an inflated baseline hides real regressions (ratios all look <1)
        print(
            "OLDER run self-flagged CONTENDED — baseline is inflated, "
            "ratios are meaningless; re-measure the baseline"
        )
        return 1
    if new.get("contended"):
        print("newer run self-flagged CONTENDED — regressions not gated")
        return 0
    if regressed:
        print(f"regressed >{threshold}x: {', '.join(regressed)}")
        return 1
    print("no per-query regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
