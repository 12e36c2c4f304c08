#!/usr/bin/env python
"""One-command interleaved two-tree A/B at a chosen SF — the standing
optimization-bench protocol (round-15 verdict, Next round #3).

For each named query: run HEAD (this checkout) and a BASE git ref in a
worktree, interleaved A/B/B/A across --reps process pairs (each leg a
fresh Spark JVM, min-of---runs count() inside), and compare
full-precision canonicalized result hashes between the trees. A kept
optimization must show (a) identical hashes and (b) a wall win that
survives interleaving; anything else is noise or a bug.

  python scripts/opt_ab.py dedup_cluster_cc graph_kcore \
      --base HEAD~1 --sf .bench_scale/sf0.5 --reps 2

Requires .bench_scale/sf0.5 (python scripts/bench_scaling.py make-big).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "ab_runner.py")


def _leg(tree: str, sf: str, queries: list[str], runs: int, do_hash: bool):
    cmd = [
        sys.executable,
        RUNNER,
        "--tree",
        tree,
        "--sf",
        sf,
        "--queries",
        ",".join(queries),
        "--runs",
        str(runs),
    ]
    if do_hash:
        cmd.append("--hash")
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, check=False
    )
    recs = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            recs[r["query"]] = r
    if not recs:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(f"runner produced no records for tree {tree}")
    return recs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--base", default=None, help="git ref for the base tree")
    ap.add_argument(
        "--sf", default=os.path.join(REPO, ".bench_scale", "sf0.5")
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--no-hash", action="store_true", help="walls only (skip collect)"
    )
    args = ap.parse_args()
    do_hash = not args.no_hash

    trees = {"head": REPO}
    wt = None
    if args.base:
        wt = os.path.join("/tmp", f"ab_base_{args.base.replace('/', '_')}")
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, args.base],
                cwd=REPO,
                check=True,
            )
        trees["base"] = wt

    # hash legs first (also a correctness gate before paying for timing)
    hashes: dict[str, dict[str, tuple]] = {}
    if do_hash:
        for tname, tpath in trees.items():
            recs = _leg(tpath, args.sf, args.queries, 1, True)
            for q, r in recs.items():
                hashes.setdefault(q, {})[tname] = (
                    r.get("hash"),
                    r.get("rows"),
                )
        mismatch = [
            q
            for q, by in hashes.items()
            if len({h for h, _ in by.values()}) != 1
        ]
        for q, by in hashes.items():
            print(f"hash {q}: {by}", flush=True)
        if mismatch:
            print(f"HASH MISMATCH: {mismatch}", flush=True)
            raise SystemExit(1)
        print("hashes identical across trees", flush=True)

    walls: dict[str, dict[str, list[float]]] = {
        q: {t: [] for t in trees} for q in args.queries
    }
    order = list(trees)
    for rep in range(args.reps):
        seq = order if rep % 2 == 0 else list(reversed(order))
        for tname in seq:
            recs = _leg(trees[tname], args.sf, args.queries, args.runs, False)
            for q, r in recs.items():
                walls[q][tname].append(r["wall"])
                print(f"rep{rep} {tname} {q}: {r['wall']}", flush=True)
    print("\n== summary (min over interleaved legs) ==")
    for q in args.queries:
        row = {t: min(v) if v else None for t, v in walls[q].items()}
        if "base" in row and row.get("base") and row.get("head"):
            ratio = round(row["base"] / row["head"], 2)
            print(f"{q}: head={row['head']} base={row['base']} speedup={ratio}x")
        else:
            print(f"{q}: {row}")
    if wt:
        print(f"# base worktree kept at {wt} (git worktree remove to drop)")


if __name__ == "__main__":
    main()
