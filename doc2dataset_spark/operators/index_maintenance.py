"""Batch-history compaction for the persisted posting indexes.

All four index lifecycles (IVF postings, text postings/doclen, MinHash
bands, winnow fingerprints) append one ``batch_id=<n>`` hive partition
per ingest batch — the idempotence/replay seam. After months of daily
appends that seam becomes the OTHER small-data problem: hundreds of
batch partitions, each with its own directory listing and footers, all
read by every serve-time query (serving prunes on band/tb/cent_id,
never on batch_id, so batch proliferation is pure overhead there).

``compact_index_history`` merges batches ``<= upto_batch`` into ONE
``batch_id=upto_batch`` partition set, leaving later batches byte-
untouched. Semantics after compaction:

- every SERVING read (candidates_from_index, pairs_from_postings,
  probe_*) returns exactly what it returned before — postings rows are
  preserved, only their batch_id labels collapse (equality pytest);
- the incremental seam keeps working for NEW batches: appends continue
  at upto_batch + 1, and new-vs-corpus queries for later batches see
  the same corpus-so-far;
- REPLAY of a batch id < upto_batch is finalized (its partition no
  longer exists separately) — compaction is history finalization, run
  it for batches past the replay window, exactly like checkpoint
  truncation in a log-structured system.

Transactional shape (the sinks/maintenance.compact_parquet discipline):
the compacted copy is written to a sibling tmp dir, then swapped in
with two renames and a deterministic ``__old_compact`` recovery name;
any failure before the swap leaves the index untouched, failure inside
the swap rolls back or leaves the recovery sibling.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from doc2dataset_spark import fsio


def compact_index_history(
    spark: SparkSession,
    postings_path: str,
    upto_batch: int,
    partition_cols: tuple[str, ...] = (),
    shuffle_partitions: int = 1,
) -> dict:
    """Merge ``batch_id <= upto_batch`` partitions into one
    ``batch_id=upto_batch`` set; later batches pass through unchanged.

    ``partition_cols``: the sub-partition columns under batch_id —
    ("band",) for the MinHash index, ("tb",) for text postings,
    ("cent_id",) for IVF postings, () for winnow postings / doclen.

    Returns {batches_before, batches_after, files_before, files_after}.
    """
    fs, p = fsio.url_to_fs(postings_path)
    files_before = sum(1 for f in fs.find(p) if f.endswith(".parquet"))

    df = spark.read.option("mergeSchema", "true").parquet(postings_path)
    batches_before = df.select("batch_id").distinct().count()
    merged = df.withColumn(
        "batch_id",
        F.when(
            F.col("batch_id") <= upto_batch, F.lit(upto_batch)
        ).otherwise(F.col("batch_id")),
    )
    parts = ["batch_id", *partition_cols]
    tmp = f"{p.rstrip('/')}__compact_{uuid.uuid4().hex}"
    # repartition(n, cols) HASH-partitions by cols: all rows of one
    # (batch_id, band/tb/cent_id) combo land in a single task, so each
    # hive partition dir gets exactly one file regardless of n — n only
    # spreads DISTINCT combos across tasks (hence the name: it is the
    # shuffle width, not a files-per-dir knob).
    (
        merged.repartition(
            max(shuffle_partitions, 1), *[F.col(c) for c in parts]
        )
        .write.partitionBy(*parts)
        .mode("overwrite")
        .parquet(tmp)
    )

    old = f"{p.rstrip('/')}__old_compact"
    if fs.exists(old):  # leftover from a previous crashed swap
        raise RuntimeError(
            f"found leftover {old!r} from an interrupted compaction — "
            f"recover it (mv back to {p!r} if {p!r} is missing, else rm) "
            "before compacting again"
        )
    fs.mv(p, old)
    try:
        fs.mv(tmp, p)
    except BaseException:
        fs.mv(old, p)  # roll back: restore the original directory
        raise
    fs.rm(old, recursive=True)

    after = spark.read.parquet(postings_path)
    return {
        "batches_before": batches_before,
        "batches_after": after.select("batch_id").distinct().count(),
        "files_before": files_before,
        "files_after": sum(
            1 for f in fs.find(p) if f.endswith(".parquet")
        ),
    }
