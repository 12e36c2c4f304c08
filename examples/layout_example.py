"""Table-layout maintenance example: the storage-side 100 TB playbook in
one script — bucketed co-located joins, dynamic partition pruning, and
transactional small-file compaction.

The three techniques share one idea: pay a one-time layout cost so every
subsequent query does less work — the join stops shuffling (bucketBy),
the scan stops reading irrelevant partitions (DPP), and the reader stops
opening thousands of tiny files (compaction).

    python examples/layout_example.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from doc2dataset_spark.queries.bucketed_join import (
    _joined,
    join_bucketed_colocated,
)
from doc2dataset_spark.queries.dpp_join import join_dpp_partitioned
from doc2dataset_spark.session import get_spark, load_table
from doc2dataset_spark.sinks.maintenance import compact_parquet

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="layout_example")

    # 1. bucketed co-located join: both sides pre-hashed into 8 buckets
    #    on the join key -> SortMergeJoin with ZERO Exchange
    plan = _joined(spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Exchange" not in plan
    print("bucketed join plan has no Exchange — revenue by priority:")
    join_bucketed_colocated(spark, SF).orderBy("o_orderpriority").show()

    # 2. dynamic partition pruning: the quarter-filtered month dim turns
    #    into a runtime PartitionFilter on the month-partitioned fact
    df = join_dpp_partitioned(spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan
    print("DPP plan prunes the fact scan — monthly revenue, one quarter:")
    df.orderBy("month").show()

    # 3. transactional compaction: many small files -> few, same rows,
    #    readers never see a half-written state
    with tempfile.TemporaryDirectory() as root:
        out = os.path.join(root, "docs")
        docs = load_table(spark, SF, "documents")
        docs.repartition(64).write.parquet(out)  # deliberately fragmented
        n_before = len(
            [f for f in os.listdir(out) if f.endswith(".parquet")]
        )
        compact_parquet(spark, out, target_bytes=64 * 1024 * 1024)
        n_after = len(
            [f for f in os.listdir(out) if f.endswith(".parquet")]
        )
        n_rows = spark.read.parquet(out).count()
        print(f"compacted {n_before} -> {n_after} files, {n_rows} rows")
        assert n_after < n_before and n_rows == docs.count()


if __name__ == "__main__":
    main()
