#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

Times individual registry queries in isolation with BOTH terminal
actions — the bench's count() (the driver-comparable number) and the
noop sink (computes every column; guide §1.4) — min-of-N each, with a
per-query single-core calibration stamp, and optionally dumps
explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/opt_measure.py q1 [q2 ...] [--runs 5] [--sf DIR]
         [--plans plans/r15 --suffix before] [--noop] [--jobdesc]

Prints one line per query:
  <name>  count=<sec>  [noop=<sec>]  rows=<n>  calib=<sec>
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doc2dataset_spark.queries import REGISTRY  # noqa: E402
from doc2dataset_spark.session import get_spark, load_table  # noqa: E402


def _calibrate() -> float:
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    ap.add_argument("--plan-only", action="store_true",
                    help="dump plans without running anything")
    args = ap.parse_args()

    spark = get_spark(app_name="opt_measure")
    if not args.plan_only:
        load_table(spark, args.sf, "lineitem").count()  # warmup (bench parity)

    for name in args.queries:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name}  MISSING", flush=True)
            continue
        if args.plan_only:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.builder(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
            print(f"{name}  plan dumped", flush=True)
            continue
        calib = _calibrate()
        spark.sparkContext.setJobDescription(f"opt:{name}")
        best_c, rows = float("inf"), 0
        for _ in range(args.runs):
            t0 = time.time()
            rows = spec.builder(spark, args.sf).count()
            best_c = min(best_c, time.time() - t0)
        line = f"{name}  count={best_c:.3f}"
        if args.noop:
            best_n = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                (spec.builder(spark, args.sf)
                     .write.format("noop").mode("overwrite").save())
                best_n = min(best_n, time.time() - t0)
            line += f"  noop={best_n:.3f}"
        line += f"  rows={rows}  calib={calib:.3f}"
        print(line, flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.builder(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            out = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
