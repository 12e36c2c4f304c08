#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every registered query
through Spark and DuckDB and compare. Usage:

    python scripts/check_oracle.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from doc2dataset_spark.oracle import run_compare
from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_spark()
    failed = 0
    for name in sorted(REGISTRY):
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            res = run_compare(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001
            failed += 1
            print(f"[ERROR] {name}: {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if not res.ok:
            failed += 1
        print(f"{res} ({dt:.1f}s)")
    print(f"\n{'ALL PASS' if not failed else f'{failed} FAILURES'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
