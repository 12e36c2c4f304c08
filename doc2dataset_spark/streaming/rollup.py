"""Streaming materialized-view maintenance: the daily revenue rollup
kept fresh from a live fact stream, one UNROUNDED-decimal partial per
micro-batch, merged on read.

This is the streaming half of ``rollup_incremental_merge``
(queries/maintenance_ops.py) and imports its exact partial/merge
expressions, so batch refresh, streaming refresh, and the one-pass
recompute are provably the same arithmetic — mergeability of exact
decimal partials is the whole trick, the same law the count-min module
(streaming/sketch.py) proves for counters.

Batch landing follows the established replay discipline:
``batch_id=<n>`` dynamic-overwrite partitions (same-checkpoint restarts
rewrite their batch exactly) plus the fresh-checkpoint stale-batch
sweep (streaming/util.sweep_stale_batches) for the lost-checkpoint
disaster case.

At 100 TB this is the shape of a continuously-maintained metric store:
each partial is ≤ |days touched by the batch| rows regardless of batch
size, the MV read is a merge over (batches × days) tiny rows, and
historical partials compact by simply re-merging and rewriting — no
raw-fact rescan anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2dataset_spark.queries.maintenance_ops import (
    mv_merge_partials,
    mv_partial,
)


def run_rollup_partials(
    spark: SparkSession,
    lineitem_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drive the stream, landing one daily-partials frame per
    micro-batch under ``batch_id=<n>`` (idempotent dynamic overwrite;
    fresh-checkpoint replays sweep stale higher-id partitions)."""
    from doc2dataset_spark import fsio

    ckpt_fs, ckpt_path = fsio.url_to_fs(checkpoint_dir)
    fresh_checkpoint = not ckpt_fs.exists(ckpt_path)
    fired: list[int] = []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        fired.append(batch_id)
        (
            mv_partial(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = (
        lineitem_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    if fresh_checkpoint and fired:
        from doc2dataset_spark.streaming.util import sweep_stale_batches

        sweep_stale_batches(out_dir, max(fired))


def rollup_serve(spark: SparkSession, out_dir: str) -> DataFrame:
    """The served MV: merge all landed partials. Bit-identical to the
    one-pass batch aggregate over the concatenated input (decimal
    addition is exact and associative) — pinned by
    tests/test_streaming_rollup.py."""
    return mv_merge_partials(spark.read.parquet(out_dir))
