"""Per-shard statistics (reference A1-A5, `logger.py`).

The reference runs a monitor *process* polling per-shard JSON files every
5 seconds (`logger.py:224-276`); here stats are one aggregation over the
result frame — the same shuffle that any groupBy costs — persisted as the
``_stats`` manifest that also drives incremental resume (P4).

Semantics corrections vs the reference (SURVEY §2.1 quirks): no
ZeroDivision when a doc has zero successful pages (`downloader.py:217`),
counts are exact, and the persisted field name ``failed_to_resize`` (an
img2dataset vestige for what is really failed_to_extract,
`logger.py:162-191`) is kept for schema parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOP_K_ERRORS = 10


def shard_stats(pages: DataFrame) -> DataFrame:
    """count / successes / failures / error histogram per shard."""
    by_status = pages.groupBy("shard_id").agg(
        F.count("*").alias("count"),
        F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias(
            "successes"
        ),
        F.sum(
            F.when(F.col("status") == "failed_to_download", 1).otherwise(0)
        ).alias("failed_to_download"),
        F.sum(
            F.when(F.col("status") == "failed_to_extract", 1).otherwise(0)
        ).alias("failed_to_resize"),  # reference's legacy field name
    )
    # A2/A3: top-k error histogram per shard — exact in Spark (the
    # reference's CappedCounter is a memory-bound approximation,
    # `logger.py:13-43`)
    err_hist = (
        pages.filter(F.col("error_message").isNotNull())
        .groupBy("shard_id", "error_message")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("shard_id").orderBy(
                    F.desc("n"), "error_message"
                )
            ),
        )
        .filter(F.col("rn") <= TOP_K_ERRORS)
        .groupBy("shard_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("error_message", "n"))
            ).alias("status_dict")
        )
    )
    return (
        by_status.join(err_hist, "shard_id", "left")
        .withColumn(
            "success_ratio",
            F.round(F.col("successes") / F.col("count"), 4),
        )
    )


def global_rollup(stats: DataFrame) -> DataFrame:
    """A4/A5: one-row roll-up across shards (the monitor's summary)."""
    return stats.agg(
        F.count("*").alias("n_shards"),
        F.sum("count").alias("count"),
        F.sum("successes").alias("successes"),
        F.sum("failed_to_download").alias("failed_to_download"),
        F.sum("failed_to_resize").alias("failed_to_extract"),
        F.round(F.sum("successes") / F.sum("count"), 4).alias("success_ratio"),
    )
