#!/usr/bin/env python
"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a cheap terminal action (count) so the full plan
runs but driver-side materialization cost is excluded. A warmup query runs
first so JVM/codegen startup is not billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from doc2dataset_spark.queries import REGISTRY  # noqa: E402
from doc2dataset_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward shuffle-heavy plans.
HEADLINE = [
    "q01_project_filter",   # scan + pushdown
    "q08_join_chain",       # multi-join + agg
    "q12_range_join",       # non-equi join
    "q14_tpch_q1",          # wide hash aggregate
    "q19_topk",             # agg + TakeOrdered
    "q22_frame_windows",    # window frames
    "q31_sessionize",       # lag + cumsum
    "q32_asof_join",        # range join + window
    # north-star ops
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ann_hyperplane",
    "q35_term_freq",
    "text_quality_score",
    "text_fingerprint",
    # second-wave scale patterns
    "q12b_bucketed_range_join",  # keyless range join via bucket blocking
    "sim_ann_ivf",               # IVF cells ANN
    "agg_percentiles",           # exact interpolated percentiles
    "text_tfidf_topk",           # two-shuffle TF-IDF
    "sample_deterministic",      # map-side hash sampling
    "dedup_cluster_cc",          # iterative connected components
]

RUNS_PER_QUERY = 2  # report the warm run: steady-state cost, not JIT warmup


def main() -> None:
    spark = get_spark(app_name="bench")
    # warmup: JVM + parquet footer reads
    load_table(spark, SF_DIR, "lineitem").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        best, n = float("inf"), 0
        for _ in range(RUNS_PER_QUERY):
            t0 = time.time()
            n = spec.builder(spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
