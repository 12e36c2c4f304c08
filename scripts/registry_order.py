"""Print the driver-gate view of the query registry.

The round driver snapshots only the first 50 registered queries into
CORRECTNESS_r{N}.json, so registration order (set by the import order in
doc2dataset_spark/queries/__init__.py) decides which queries get a
driver-recorded correctness row. Run this after adding/moving any query:

    python scripts/registry_order.py

Exits non-zero if any scale-critical query falls outside the first 50.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

DRIVER_SNAPSHOT_ROWS = 50

# Queries that MUST have a driver-recorded correctness row (round-2 verdict
# "Next round" item 1): the scale-critical ANN/dedup/tfidf surface plus at
# least the q36 Python-boundary flavors and the bucketed range join.
MUST_BE_GATED = {
    "sim_ann_hyperplane",
    "sim_ann_ivf",
    "text_tfidf_topk",
    "q12b_bucketed_range_join",
    "q36_pandas_udf",
    "q36_apply_in_pandas",
    "q36_map_in_pandas",
    "dedup_embedding_cosine",
    "dedup_embedding_cell",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "ml_kmeans_lite",
    "agg_salted_two_phase",
}


def main() -> int:
    from doc2dataset_spark.queries import REGISTRY

    names = list(REGISTRY)
    gated, ungated = names[:DRIVER_SNAPSHOT_ROWS], names[DRIVER_SNAPSHOT_ROWS:]
    print(f"registry: {len(names)} queries; driver gates first {DRIVER_SNAPSHOT_ROWS}")
    for i, n in enumerate(names, 1):
        marker = "GATE" if i <= DRIVER_SNAPSHOT_ROWS else "    "
        print(f"{i:3d} {marker} {n}")
    missing = MUST_BE_GATED - set(gated)
    if missing:
        print(f"\nERROR: scale-critical queries outside the driver gate: {sorted(missing)}")
        return 1
    print(f"\nOK: all {len(MUST_BE_GATED)} scale-critical queries inside the gate; "
          f"{len(ungated)} queries rely on local scripts/check_oracle.py verification.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
