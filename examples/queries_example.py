"""Query-surface example: run a few headline operators on the synthetic
testdata tables (the same entry points the driver gate uses).

    python examples/queries_example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="queries-example")
    for name in (
        "q14_tpch_q1",           # flagship hash aggregate
        "dedup_minhash_lsh",     # fuzzy dedup pipeline
        "dedup_cluster_cc",      # pairs → canonical clusters
        "sim_cosine_topk",       # similarity search
        "text_tfidf_topk",       # text analysis
    ):
        print(f"== {name}: {REGISTRY[name].doc.splitlines()[0]}")
        REGISTRY[name].builder(spark, sf_dir).show(5, truncate=False)
