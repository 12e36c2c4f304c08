"""Incremental hypertable continuous aggregate: the hourly-partial LOG.

``queries/round12_extras.events_hypertable_rollup`` proves the
granularity chain (hour → day → month re-aggregation is lossless) but
recomputes the hourly partials FROM RAW on every call. A 100 TB cagg
never does that: new events land as per-batch HOURLY PARTIALS
(count + exact-decimal sum — map-side combinable, ≤ |hours touched|
rows per batch regardless of batch size), the served rollup folds the
partial log per hour (decimal addition is exact and associative, so
fold-of-partials == one-pass recompute, bit for bit), and day/month
re-aggregate the folded hours exactly as the batch query does. Raw
events are read once — at ingest.

Pieces, each on an established idiom:

- ``run_hypertable_ingest``   foreachBatch → ``hourly/batch_id=<n>``
                              dynamic-overwrite partitions (the
                              streaming/rollup.py replay discipline:
                              same-checkpoint replays rewrite their own
                              partition; fresh-checkpoint replays sweep
                              stale higher ids).
- ``serve_hypertable``        fold partials per hour, emit the
                              hour/day/month union — SHARED expressions
                              with the batch query (imported from
                              round12_extras), so stream == batch is
                              structural.
- ``compact_hypertable_partials``  merge batches ``<= upto`` into ONE
                              folded ``batch_id=upto`` partition (the
                              log stays O(hours), not O(hours×batches))
                              under the full transactional discipline of
                              operators/index_maintenance: manifest +
                              swap_in_compacted rollback + horizon
                              sidecar written BEFORE the publish.

Batch twins live in queries/round13_extras (``rollup_hypertable_
incremental`` / ``_compacted``), both hash-matched against the SAME
direct-from-raw DuckDB oracle as events_hypertable_rollup — the
external proof that N incremental batches, folded (and compacted),
equal one batch recompute.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2dataset_spark import fsio
from doc2dataset_spark.queries.round12_extras import _ht_emit, _ht_level


def hourly_partial(events: DataFrame) -> DataFrame:
    """One batch's hourly partials: (bucket, n_events, dec_total) with
    the sum kept DECIMAL(38,6) — the exact-mergeable partial the whole
    module rests on (identical expressions to the batch query's hourly
    level, round12_extras.events_hypertable_rollup)."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("dec_total"),
    )


def _hourly_path(out_dir: str) -> str:
    return posixpath.join(out_dir, "hourly")


def run_hypertable_ingest(
    spark: SparkSession,
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Land one hourly-partials frame per micro-batch under
    ``hourly/batch_id=<n>`` (idempotent dynamic overwrite; zero-row
    recomputations delete the stale partition — land_batch_exact;
    fresh-checkpoint replays sweep stale higher-id partitions).

    A fresh-checkpoint replay over a COMPACTED partial log refuses up
    front (round-13 self-review — the same hazard index ingest and the
    as-of view log already refuse): the replay renumbers batches from 0
    and its stale sweep would delete the folded ``batch_id=<horizon>``
    partition, i.e. the entire pre-compaction history."""
    ckpt_fs, ckpt_path = fsio.url_to_fs(checkpoint_dir)
    fresh_checkpoint = not ckpt_fs.exists(ckpt_path)
    fired: list[int] = []
    hdir = _hourly_path(out_dir)
    if fresh_checkpoint:
        from doc2dataset_spark.operators.index_maintenance import (
            compaction_horizon,
        )

        fs_h, hp = fsio.url_to_fs(hdir)
        if fs_h.exists(hp) and compaction_horizon(fs_h, hp) is not None:
            raise RuntimeError(
                f"{hdir!r} has a compaction horizon "
                "(compact_hypertable_partials ran) — a fresh-checkpoint "
                "replay is not supported on a compacted partial log: its "
                "stale-batch sweep would delete the folded history; keep "
                "the original checkpoint or rebuild from the source"
            )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        fired.append(batch_id)
        from doc2dataset_spark.streaming.util import land_batch_exact

        land_batch_exact(hourly_partial(batch_df), hdir, batch_id)
        from doc2dataset_spark.operators.time_travel import record_batch_time

        record_batch_time(hdir, batch_id)

    q = (
        events_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    if fresh_checkpoint and fired:
        from doc2dataset_spark.streaming.util import sweep_stale_batches

        sweep_stale_batches(hdir, max(fired))


def fold_hourly(partials: DataFrame) -> DataFrame:
    """Collapse the partial log to one row per hour — exact decimal
    addition, so the fold equals the one-pass hourly aggregate no
    matter how the batches sliced the events."""
    return partials.groupBy("bucket").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("dec_total").cast("decimal(38,6)").alias("dec_total"),
    )


def _serve_levels(partials: DataFrame) -> DataFrame:
    """Fold raw partials per hour and emit the hour/day/month union —
    ONE serve chain shared by the live and as-of reads, so a future
    change (new level, rounding, checkpoint tweak) can never make a
    snapshot diverge from the live serve."""
    hourly = fold_hourly(partials).localCheckpoint(eager=False)
    daily = _ht_level(hourly, "bucket", "day").localCheckpoint(eager=False)
    monthly = _ht_level(daily, "bucket", "month")
    return (
        _ht_emit(hourly, "hour")
        .unionByName(_ht_emit(daily, "day"))
        .unionByName(_ht_emit(monthly, "month"))
    )


def serve_hypertable(spark: SparkSession, out_dir: str) -> DataFrame:
    """The served cagg: hour/day/month from the folded partial log —
    raw events are never touched. Column-identical to
    events_hypertable_rollup (shared emit/level helpers)."""
    return _serve_levels(
        spark.read.parquet(_hourly_path(out_dir)).drop("batch_id")
    )


def compact_hypertable_partials(
    spark: SparkSession, out_dir: str, upto_batch: int
) -> dict:
    """Fold batches ``<= upto_batch`` into ONE ``batch_id=upto_batch``
    partition holding one row per hour; later batches' partition dirs
    are renamed in untouched (cost O(head)). Unlike
    compact_index_history this REDUCES rows (partials of the same hour
    merge), which is exactly why the serve-side fold stays cheap as
    batches accumulate. Same transactional discipline: manifest before
    the first rename, swap_in_compacted rollback, horizon BEFORE the
    publish (restored on rollback) so the fresh-checkpoint-replay
    refusal can never lag the compaction it guards.

    Returns {batches_before, batches_after, rows_before, rows_after}.
    """
    import uuid

    from doc2dataset_spark.operators.index_maintenance import (
        _batch_of,
        _restore_horizon,
        _write_horizon,
        check_no_leftover_compaction,
        compaction_horizon,
        list_batch_dirs,
        swap_in_compacted,
    )

    hdir = _hourly_path(out_dir)
    fs, p = fsio.url_to_fs(hdir)
    check_no_leftover_compaction(fs, p)
    batch_dirs = list_batch_dirs(fs, p)
    tail_dirs = [d for d in batch_dirs if _batch_of(d) > upto_batch]

    log = spark.read.parquet(hdir)
    rows_before = log.count()
    head = fold_hourly(
        log.filter(F.col("batch_id") <= upto_batch).drop("batch_id")
    ).withColumn("batch_id", F.lit(upto_batch))
    tmp = f"{p.rstrip('/')}__compact_{uuid.uuid4().hex}"
    head.repartition(1, F.col("batch_id")).write.partitionBy(
        "batch_id"
    ).parquet(tmp)

    prev_horizon = compaction_horizon(fs, p)
    _write_horizon(fs, p, upto_batch)
    try:
        swap_in_compacted(fs, p, tmp, tail_dirs)
    except BaseException:
        _restore_horizon(fs, p, prev_horizon)
        raise
    return {
        "batches_before": len(batch_dirs),
        "batches_after": len(list_batch_dirs(fs, p)),
        "rows_before": rows_before,
        "rows_after": spark.read.parquet(hdir).count(),
    }


def serve_hypertable_asof(
    spark: SparkSession, out_dir: str, as_of_batch: int
) -> DataFrame:
    """The cagg as it stood after partial batch N landed: the same
    hour/day/month fold restricted to ``batch_id <= N`` — a
    partition-pruned prefix read of the hourly log, composing the
    hypertable with the time-travel surface (operators/time_travel.py).
    Refuses when N predates the compaction horizon (those partials were
    folded; the finalized-history contract every log family shares)."""
    from doc2dataset_spark.operators.time_travel import read_postings_asof

    return _serve_levels(
        read_postings_asof(spark, _hourly_path(out_dir), as_of_batch).drop(
            "batch_id"
        )
    )


def serve_hypertable_asof_ts(
    spark: SparkSession, out_dir: str, as_of_ts_us: int
) -> DataFrame:
    """serve_hypertable_asof addressed by wall/event time, resolved
    through the hourly log's landing-time manifest (written per batch by
    run_hypertable_ingest and the batch-side builder)."""
    from doc2dataset_spark.operators.time_travel import resolve_asof_ts

    return serve_hypertable_asof(
        spark, out_dir, resolve_asof_ts(_hourly_path(out_dir), as_of_ts_us)
    )
