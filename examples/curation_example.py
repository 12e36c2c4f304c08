"""End-to-end corpus curation example: the round-5 training-pipeline ops
composed over the synthetic documents table.

    python examples/curation_example.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-example")
    for name in (
        "corpus_mix_stats",        # what's in the mix, per (source, lang)
        "text_repetition_bigram",  # Gopher repetition flags
        "dedup_boilerplate_spans", # repeated spans to strip
        "dedup_cross_source",      # which copy survives priority dedup
        "curate_corpus",           # the composed chain: gate -> dedup -> pack
        "pack_sequences",          # packing alone, whole corpus
        "length_bucket_batches",   # padding-efficient batch buckets
        "shuffle_deterministic",   # reproducible training order
    ):
        print(f"== {name}: {REGISTRY[name].doc.splitlines()[0]}")
        REGISTRY[name].builder(spark, sf_dir).show(5, truncate=False)
