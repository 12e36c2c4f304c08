"""Bucketed co-located join: plan and equality guarantees.

The claims under test (queries/bucketed_join.py):
1. joining the two co-bucketed twins produces a SortMergeJoin with ZERO
   Exchange anywhere in the join plan (the storage layout satisfies the
   join's distribution requirement on both sides);
2. the bucketed join returns exactly the plain parquet join's rows;
3. an equality filter on the bucket key prunes the scan to 1 of
   N_BUCKETS buckets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.bucketed_join import (
    N_BUCKETS,
    _bucketed_table,
    _joined,
)
from doc2dataset_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_no_exchange(spark):
    plan = _formatted(_joined(spark, SF))
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # both scans report the bucketed layout
    assert plan.count(f"Bucketed: true") == 2, plan


def test_bucketed_join_matches_plain_join(spark):
    bucketed = (
        _joined(spark, SF)
        .select("l_orderkey", "l_linenumber", "o_custkey")
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    )
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    plain = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey")
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    )
    assert bucketed == plain


def test_bucket_pruning_on_key_filter(spark):
    # autoBucketedScan (default on) turns OFF bucketed reading for plans
    # with no shuffle to save — a lone filter qualifies — taking bucket
    # pruning with it; pin it off to observe the pruned scan. (The join
    # tests above run with vanilla confs: there the bucketed scan is
    # what removes the shuffles, so auto keeps it.)
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        li = _bucketed_table(spark, SF, "lineitem", "l_orderkey")
        some_key = li.agg(F.min("l_orderkey")).collect()[0][0]
        plan = _formatted(li.filter(F.col("l_orderkey") == some_key))
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
    finally:
        spark.conf.set(key, prev)
