"""Bottom-k (KMV) sketch: mergeability, determinism, and estimator
accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import REGISTRY
from doc2dataset_spark.queries.sketch_sample import (
    BOTTOMK_K,
    bottomk_sample,
)
from doc2dataset_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _keys(df):
    return [r["h"] for r in df.orderBy("h").collect()]


def test_bottomk_is_mergeable(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    mergeability law that makes per-partition/per-batch partials exact."""
    ev = load_table(spark, SF, "events").select("event_id", "value")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = bottomk_sample(
        bottomk_sample(a, "event_id").unionByName(
            bottomk_sample(b, "event_id")
        ).drop("h", "hv"),
        "event_id",
    )
    direct = bottomk_sample(ev, "event_id")
    assert _keys(merged) == _keys(direct)


def test_bottomk_deterministic_across_partitionings(spark):
    ev = load_table(spark, SF, "events").select("event_id", "value")
    one = bottomk_sample(ev.repartition(1), "event_id")
    many = bottomk_sample(ev.repartition(17), "event_id")
    assert _keys(one) == _keys(many)


def test_kmv_estimate_within_error_band(spark):
    """(k-1)/U on md5 hashes must land within ~3/sqrt(k) of the true
    distinct count (KMV standard error is ~1/sqrt(k-2); 3σ band)."""
    row = (
        REGISTRY["agg_bottomk_sketch"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    true_n = 10_000  # distinct event_ids at sf0.01
    rel_err = abs(row["distinct_est"] - true_n) / true_n
    assert rel_err < 3.0 / (BOTTOMK_K ** 0.5), (row["distinct_est"], rel_err)


def test_derived_partsupp_deterministic_across_partitionings(spark):
    """The synthetic partsupp (queries/tpch_partsupp.py) must be a pure
    function of the shipped tables: identical rows from any input
    partitioning, exactly 4 suppliers per part, all suppkeys real."""
    from doc2dataset_spark.queries.tpch_partsupp import derived_partsupp

    ps = derived_partsupp(spark, SF)
    rows = sorted(
        (r["ps_partkey"], r["ps_suppkey"], r["ps_availqty"],
         r["ps_supplycost"])
        for r in ps.collect()
    )
    again = sorted(
        (r["ps_partkey"], r["ps_suppkey"], r["ps_availqty"],
         r["ps_supplycost"])
        for r in derived_partsupp(spark, SF).repartition(13).collect()
    )
    assert rows == again
    n_parts = load_table(spark, SF, "part").count()
    assert len(rows) == 4 * n_parts
    n_supp = load_table(spark, SF, "supplier").count()
    assert all(0 <= r[1] < n_supp for r in rows)
