"""Streaming CDC materialization: a live changelog (upserts +
tombstones) landed idempotently per micro-batch, served as a
latest-wins table — the streaming twin of the batch
``merge_cdc_apply`` (queries/maintenance_ops.py) and the plain-parquet
spelling of a compacted-topic / change-data-feed consumer.

Two halves:

- ``run_cdc_ingest``  lands each micro-batch of change records under
  ``batch_id=<n>`` (dynamic overwrite → same-checkpoint replays rewrite
  their own partition exactly; fresh-checkpoint replays sweep stale
  higher ids — the discipline shared with streaming/rollup.py and
  streaming/sketch.py).
- ``cdc_serve``       materializes the current table: for every key,
  the change with the highest (batch_id, seq) wins (``max_by`` over the
  compound version — one aggregate, no window), and a winning tombstone
  deletes the row. Replaying the whole changelog through this view IS
  the recovery story: state lives in the changelog, not the serving
  layer.

At 100 TB the serve-side aggregate shuffles |changelog| rows once on
the key; periodic compaction (rewrite the served snapshot as batch 0 and
drop older partitions) bounds that — the snapshot-plus-tail layout every
log-structured store converges on. Ordering within one micro-batch is
the ``seq`` column (the CDC feed's own sequence number): (batch_id, seq)
must be unique per key, which the ingest asserts nothing about — it is
the feed's contract, documented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELETE_OP = "delete"


def run_cdc_ingest(
    spark: SparkSession,
    changes_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Land the change stream, one ``batch_id=<n>`` partition per
    micro-batch (idempotent dynamic overwrite + fresh-checkpoint stale
    sweep). The frame must carry ``doc_id``, ``op`` and ``seq`` plus the
    payload columns."""
    from doc2dataset_spark import fsio

    ckpt_fs, ckpt_path = fsio.url_to_fs(checkpoint_dir)
    fresh_checkpoint = not ckpt_fs.exists(ckpt_path)
    fired: list[int] = []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        fired.append(batch_id)
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        from doc2dataset_spark.operators.time_travel import record_batch_time

        record_batch_time(out_dir, batch_id)

    q = (
        changes_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    if fresh_checkpoint and fired:
        from doc2dataset_spark.streaming.util import sweep_stale_batches

        sweep_stale_batches(out_dir, max(fired))


def cdc_serve(spark: SparkSession, out_dir: str) -> DataFrame:
    """The current table: latest (batch_id, seq) change per key wins;
    tombstones drop the row. One ``max_by`` aggregate — no window, no
    self-join; deterministic because (batch_id, seq) is unique per key
    (the feed contract)."""
    changes = spark.read.parquet(out_dir)
    payload = [
        c for c in changes.columns if c not in ("doc_id", "batch_id", "seq")
    ]
    winner = changes.groupBy("doc_id").agg(
        F.expr(
            f"max_by(struct({', '.join(payload)}), struct(batch_id, seq))"
        ).alias("w")
    )
    return (
        winner.filter(F.col("w.op") != DELETE_OP)
        .select("doc_id", *[F.col(f"w.{c}").alias(c) for c in payload])
        .drop("op")
    )


def cdc_compact(spark: SparkSession, out_dir: str) -> dict:
    """Snapshot-plus-tail compaction: collapse every landed batch into
    one snapshot partition holding the served state as plain upserts,
    so the serve-side aggregate shuffles |current table| rows instead of
    |changelog|. ``cdc_serve`` over the compacted log returns exactly
    what it returned before (the equivalence the test pins): winners are
    preserved verbatim, losers and tombstoned keys are dropped — a
    tombstone's work is DONE once compaction lands, so it need not be
    retained (no late reader merges across the compaction boundary; the
    snapshot IS batch 0).

    Transactional shape: the snapshot is written to a tmp sibling first,
    then swapped in with the same rename discipline as
    sinks/maintenance.compact_parquet — readers see the old log or the
    new one, never a mix. The swap uses POSIX directory renames, so this
    function is for LOCAL/NFS changelogs; an object-store changelog
    (no atomic dir rename) needs a manifest-pointer swap instead —
    out of scope here, documented so nobody assumes S3 safety.
    The stream's NEXT batch id keeps growing from the checkpoint (ids
    are never reused), so the snapshot partition (batch_id=0) stays
    strictly oldest.

    Run compaction only while the ingest stream is STOPPED: a batch
    landing between the snapshot read and the directory swap would be
    dropped by the swap (the rename replaces the whole log). A prior
    crashed compaction leaves ``<out>__old_compact`` behind; this call
    then fails fast on the rename (target exists) rather than guessing —
    recover by restoring or deleting the old dir first."""
    import os
    import shutil
    import uuid

    from doc2dataset_spark import fsio
    from doc2dataset_spark.operators.index_maintenance import (
        _batch_of,
        _restore_horizon,
        _write_horizon,
        compaction_horizon,
        list_batch_dirs,
    )

    fs, root = fsio.url_to_fs(out_dir)
    dirs = list_batch_dirs(fs, root)
    if not dirs:
        raise ValueError(
            f"no batch_id=<n> partitions under {out_dir!r} — nothing to "
            "compact (empty or swept changelog)"
        )
    # highest batch the snapshot absorbs — the time-travel horizon
    folded = max(_batch_of(d) for d in dirs)
    served = cdc_serve(spark, out_dir)
    payload = [c for c in served.columns if c != "doc_id"]
    snapshot = served.select(
        "doc_id",
        F.lit("upsert").alias("op"),
        F.lit(0).alias("seq"),
        *payload,
        F.lit(0).alias("batch_id"),
    )
    n = snapshot.count()
    tmp = f"{out_dir.rstrip('/')}__compact_{uuid.uuid4().hex}"
    snapshot.write.partitionBy("batch_id").parquet(tmp)
    old = f"{out_dir.rstrip('/')}__old_compact"
    # Horizon BEFORE publish (round-12 advice): the old order wrote it
    # only after shutil.rmtree(old), so a crash in that window left a
    # compacted batch_id=0 snapshot with no horizon marker and
    # cdc_serve_asof(pre-compaction N) silently served post-compaction
    # merged content as the past. The sidecar is a SIBLING of out_dir
    # (renames don't touch it), so writing it first means the refusal
    # can never lag the compaction it guards; the rollback path restores
    # the prior value so a failed publish doesn't refuse valid reads.
    prev_horizon = compaction_horizon(fs, root)
    _write_horizon(fs, root, folded)
    try:
        os.rename(out_dir, old)
        try:
            os.rename(tmp, out_dir)
        except BaseException:
            os.rename(old, out_dir)  # rollback: the old log returns
            raise
    except BaseException:
        _restore_horizon(fs, root, prev_horizon)
        raise
    shutil.rmtree(old)
    return {"rows": n, "horizon": folded}


def cdc_serve_asof(
    spark: SparkSession, out_dir: str, as_of_batch: int
) -> DataFrame:
    """The table as it stood after changelog batch N — ``cdc_serve``'s
    latest-wins fold restricted to ``batch_id <= N`` (partition-pruned).
    Completes the time-travel surface (operators/time_travel.py) for the
    third persisted log family. ``cdc_compact`` finalizes history into a
    ``batch_id=0`` snapshot: snapshots strictly before its recorded
    horizon raise (the same loud refusal as the index families — never
    silently serve post-compaction content as the past); at-or-after the
    horizon, the snapshot plus later batches reconstruct the state
    exactly."""
    from doc2dataset_spark import fsio
    from doc2dataset_spark.operators.index_maintenance import (
        compaction_horizon,
    )

    fs, root = fsio.url_to_fs(out_dir)
    horizon = compaction_horizon(fs, root)
    if horizon is not None and as_of_batch < horizon:
        raise ValueError(
            f"as_of_batch={as_of_batch} predates the compaction horizon "
            f"({horizon}) of {out_dir!r}: cdc_compact folded those "
            "batches into the snapshot, so earlier snapshots are no "
            "longer reconstructable"
        )
    changes = spark.read.parquet(out_dir).filter(
        F.col("batch_id") <= F.lit(as_of_batch)
    )
    payload = [
        c for c in changes.columns if c not in ("doc_id", "batch_id", "seq")
    ]
    winner = changes.groupBy("doc_id").agg(
        F.expr(
            f"max_by(struct({', '.join(payload)}), struct(batch_id, seq))"
        ).alias("w")
    )
    return (
        winner.filter(F.col("w.op") != DELETE_OP)
        .select("doc_id", *[F.col(f"w.{c}").alias(c) for c in payload])
        .drop("op")
    )


def cdc_serve_asof_ts(
    spark: SparkSession, out_dir: str, as_of_ts_us: int
) -> DataFrame:
    """``cdc_serve_asof`` addressed by wall time: resolve the timestamp
    through the changelog's landing-time manifest (written per batch by
    run_cdc_ingest), then the same partition-pruned latest-wins fold —
    including the compaction-horizon refusal."""
    from doc2dataset_spark.operators.time_travel import resolve_asof_ts

    return cdc_serve_asof(spark, out_dir, resolve_asof_ts(out_dir, as_of_ts_us))
