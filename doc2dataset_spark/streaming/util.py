"""Shared streaming-sink helpers.

``sweep_stale_batches`` is the fresh-checkpoint disaster-recovery guard
used by every batch-partitioned streaming sink (sketch partials, IVF
posting ingest, inverted-index ingest): after a checkpoint loss, a
replay renumbers micro-batches from 0 and may group the input into FEWER
batches than the original incarnation, so dynamic partition overwrite
rewrites only the replayed ids and stale higher-numbered ``batch_id=*``
partitions would survive and double-count downstream. A from-scratch
replay numbers contiguously, so anything above the replay's max id is
provably stale output of the previous incarnation — delete it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doc2dataset_spark import fsio


def land_batch(frame: DataFrame, root: str, batch_id: int) -> None:
    """One micro-batch landed as its own ``batch_id=<n>`` partition via
    dynamic overwrite — the idempotent-replay seam every streaming sink
    here shares."""
    (
        frame.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(root)
    )


def rm_stale_partition(root: str, batch_id: int) -> None:
    fs, p = fsio.url_to_fs(root)
    stale = f"{p.rstrip('/')}/batch_id={batch_id}"
    if fs.exists(stale):
        fs.rm(stale, recursive=True)


def land_batch_exact(frame: DataFrame, root: str, batch_id: int) -> int:
    """land_batch plus the zero-row replay guarantee (round-12 advice):
    dynamic partition overwrite writes NOTHING for an empty frame, so a
    fresh-checkpoint replay over an existing out_dir whose recomputed
    batch is empty would leave the PRIOR incarnation's ``batch_id=<n>``
    partition in place and every cumulative read would serve those
    stale rows. Materialize the frame once (localCheckpoint), and on
    zero rows explicitly delete the existing partition dir instead of
    writing. Returns the row count so callers can reuse it."""
    frame = frame.localCheckpoint(eager=True)
    n = frame.count()
    if n:
        land_batch(frame, root, batch_id)
        return n
    rm_stale_partition(root, batch_id)
    return 0


def sweep_stale_batches(
    out_dir: str, max_id: int, prefix: str = "batch_id="
) -> int:
    """Remove ``<prefix><id>`` partitions with id > max_id under out_dir.
    Returns the number of partitions removed. No-op if out_dir is absent."""
    fs, path = fsio.url_to_fs(out_dir)
    if not fs.exists(path):
        return 0
    removed = 0
    for entry in fs.ls(path, detail=False):
        name = str(entry).rstrip("/").rsplit("/", 1)[-1]
        if name.startswith(prefix):
            try:
                bid = int(name[len(prefix):])
            except ValueError:
                continue
            if bid > max_id:
                fs.rm(entry, recursive=True)
                removed += 1
    if prefix == "batch_id=":
        # the swept batches' landing times must go with them, or a
        # renumbered replay would inherit the dead incarnation's clock.
        # UNCONDITIONAL (round-13 self-review): an empty micro-batch
        # records a landing time but writes no partition, so gating this
        # on removed>0 would let a dead incarnation's empty-batch times
        # survive and misdirect timestamp resolution.
        from doc2dataset_spark.operators.time_travel import (
            drop_batch_times_above,
        )

        drop_batch_times_above(out_dir, max_id)
    return removed
