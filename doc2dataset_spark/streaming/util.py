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

from doc2dataset_spark import fsio


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
    if removed and prefix == "batch_id=":
        # the swept batches' landing times must go with them, or a
        # renumbered replay would inherit the dead incarnation's clock
        from doc2dataset_spark.operators.time_travel import (
            drop_batch_times_above,
        )

        drop_batch_times_above(out_dir, max_id)
    return removed
