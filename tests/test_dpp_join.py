"""Dynamic partition pruning: plan and equality guarantees for
queries/dpp_join.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.dpp_join import (
    DPP_QUARTER,
    join_dpp_partitioned,
    month_dim,
    partitioned_lineitem,
)

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_dpp_subquery_in_partition_filters(spark):
    plan = _formatted(join_dpp_partitioned(spark, SF))
    assert "dynamicpruning" in plan, plan
    # the pruning subquery must sit in the fact scan's PartitionFilters
    scan_part = plan[plan.index("PartitionFilters"):]
    assert "dynamicpruning" in scan_part.split("\n")[0], (
        scan_part.split("\n")[0]
    )


def test_dpp_join_matches_flat_join(spark):
    from doc2dataset_spark.session import load_table

    got = {
        r["month"]: (r["revenue"], r["n_items"])
        for r in join_dpp_partitioned(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem").withColumn(
        "ship_month",
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM"),
    )
    dim = month_dim(spark, SF).filter(F.col("quarter") == DPP_QUARTER)
    want = {
        r["month"]: (float(r["rev"]), r["n"])
        for r in li.join(dim, li["ship_month"] == dim["month"])
        .groupBy("month")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(38,6)")
                ),
                4,
            )
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()
    }
    assert got == want and len(got) == 3  # one quarter = three months


def test_partitioned_twin_has_month_partitions(spark):
    li = partitioned_lineitem(spark, SF)
    assert "ship_month" in li.columns
    plan = _formatted(li.filter(F.col("ship_month") == "1997-01"))
    # static partition pruning on the partition column, no data filter
    assert "PartitionFilters" in plan and "1997-01" in plan, plan
