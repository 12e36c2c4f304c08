#!/usr/bin/env python
"""Single-tree leg of the interleaved A/B harness (scripts/opt_ab.py).

Self-contained: imports doc2dataset_spark from --tree (which may be a
worktree of an older commit), runs each named registry query at --sf
with a min-of-N count() wall, and emits one JSON line per query with
the wall and a FULL-PRECISION canonicalized result hash (floats by bit
pattern via float.hex, rows sorted) — the round-15 scale-validation
protocol, scripted.

Run via opt_ab.py; directly:
  python scripts/ab_runner.py --tree . --sf .bench_scale/sf0.5 \
      --queries dedup_cluster_cc --runs 2
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time


def canon_hash(df) -> tuple[str, int]:
    def c(v):
        if isinstance(v, float):
            return v.hex()
        if isinstance(v, list):
            return tuple(c(x) for x in v)
        return v

    rows = sorted(tuple(c(v) for v in r) for r in df.collect())
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return h, len(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True)
    ap.add_argument("--sf", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--hash", action="store_true")
    args = ap.parse_args()

    tree = os.path.abspath(args.tree)
    sys.path.insert(0, tree)
    from doc2dataset_spark.queries import REGISTRY  # noqa: E402
    from doc2dataset_spark.session import get_spark, load_table  # noqa: E402

    spark = get_spark(app_name=f"ab:{os.path.basename(tree)}")
    load_table(spark, args.sf, "lineitem").count()  # warmup

    for name in args.queries.split(","):
        spec = REGISTRY.get(name)
        if spec is None:
            print(json.dumps({"query": name, "error": "missing"}), flush=True)
            continue
        spark.sparkContext.setJobDescription(f"ab:{name}")
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            spec.builder(spark, args.sf).count()
            best = min(best, time.time() - t0)
        rec = {"query": name, "wall": round(best, 3)}
        if args.hash:
            h, n = canon_hash(spec.builder(spark, args.sf))
            rec.update({"hash": h, "rows": n})
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
