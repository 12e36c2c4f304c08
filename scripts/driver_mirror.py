#!/usr/bin/env python
"""Drive the repo exactly as the driver does: import __spark_entry__,
smoke entry(spark), then dual-run every queries() entry against its
oracle_sql() on DuckDB at sf0.01 and compare canonicalized results."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # the public boundary, as the driver sees it
from doc2dataset_spark.oracle import compare_frames, duck_connect
from doc2dataset_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark()
    t0 = time.time()
    flag = entrymod.entry(spark)
    rows = flag.count()
    print(f"entry(): {rows} rows, schema={[f.name for f in flag.schema]} "
          f"({time.time()-t0:.1f}s)")
    assert rows >= 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print(f"queries={len(qs)} oracles={len(oracles)}")
    con = duck_connect(SF_DIR)
    failed = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                res = compare_frames(name, sdf, odf)
            else:
                from doc2dataset_spark.oracle import CompareResult

                res = CompareResult(name, True, len(sdf), -1, "(rows-only)")
        except Exception as exc:  # noqa: BLE001
            print(f"[ERROR] {name}: {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        if not res.ok:
            failed.append(name)
        print(f"{res} ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL PASS' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
