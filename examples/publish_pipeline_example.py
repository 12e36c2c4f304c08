"""The full publish path a training-data run executes after extraction:
curate → validate → compact — round-6 operators composed end to end.

    python examples/publish_pipeline_example.py [sf_dir]

1. run the 4-stage curate_corpus chain (repetition gate → cross-source
   head dedup → SemDeDup embedding stage → packing) and land the packed
   manifest as parquet,
2. contract-check the output in ONE aggregate pass (quality_checks):
   key uniqueness, non-null columns, offset sanity, row-count floor,
3. fragment the output on purpose, then compact it back to target-sized
   files with the transactional small-files compactor,
4. print the final layout + the validation report.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from doc2dataset_spark.operators.quality_checks import (
    in_range,
    min_rows,
    not_null,
    run_checks,
    satisfies,
    unique,
)
from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import get_spark
from doc2dataset_spark.sinks.maintenance import compact_parquet

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="publish-pipeline")
    out = os.path.join(
        tempfile.mkdtemp(prefix="publish_"), "packed_manifest"
    )

    curated = REGISTRY["curate_corpus"].builder(spark, sf_dir)
    # deliberately fragmented write — the accretion pattern a long
    # incremental run produces
    curated.repartition(24).write.parquet(out)
    print(f"curated manifest at {out}")

    packed = spark.read.parquet(out)
    report = run_checks(
        packed,
        [
            not_null("doc_id"),
            unique("doc_id"),
            in_range("shard", 0, 7),
            satisfies("offsets_nonneg", F.col("start_off") >= 0),
            satisfies(
                "seq_consistent",
                F.col("seq_id") == F.expr("start_off DIV 512"),
            ),
            min_rows(10),
        ],
    )
    print(f"validation: ok={report.ok} rows={report.total_rows}")
    for r in report.results:
        print(f"  {r.name}: violations={r.violations}")
    if not report.ok:
        sys.exit(1)

    n_before = len(glob.glob(os.path.join(out, "*.parquet")))
    stats = compact_parquet(spark, out, target_bytes=8 * 1024 * 1024)
    print(
        f"compacted {n_before} files -> {stats['files_after']} "
        f"({stats['bytes']} bytes)"
    )
