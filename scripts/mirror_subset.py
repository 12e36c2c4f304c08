#!/usr/bin/env python
"""Mirror a SUBSET of registry queries against their DuckDB oracles —
the per-change verification loop of the optimization rounds (full-run
twin: driver_mirror.py). Usage:

  python scripts/mirror_subset.py q1 [q2 ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from doc2dataset_spark.oracle import CompareResult, compare_frames, duck_connect
from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark()
    con = duck_connect(args.sf)
    failed = []
    for name in args.queries:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"[MISSING] {name}")
            failed.append(name)
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, args.sf).toPandas()
            if spec.oracle:
                odf = con.execute(spec.oracle).fetchdf()
                res = compare_frames(name, sdf, odf)
            else:
                res = CompareResult(name, True, len(sdf), -1, "(rows-only)")
        except Exception as exc:  # noqa: BLE001
            print(f"[ERROR] {name}: {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        if not res.ok:
            failed.append(name)
        print(f"{res} ({time.time()-t0:.1f}s)", flush=True)
    print("ALL PASS" if not failed else "FAILED: " + ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
