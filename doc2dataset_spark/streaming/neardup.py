"""Incremental near-duplicate detection at ingest: streaming MinHash-LSH.

The batch dedup stack (`queries/dedup.py`) answers "which documents in
this corpus are near-dups of each other". A training-data INGEST pipeline
needs the incremental form: as new documents arrive, flag the ones that
near-duplicate anything already accepted — without re-scanning the
corpus. This module implements that as a ``foreachBatch`` loop over an
accumulating **band directory** (the classic LSH index, persisted as
parquet):

per micro-batch:
  1. band-hash the batch with the SAME signature/banding code the batch
     queries use (`dedup.bands_of` — 16 perms, 4×4 banding, md5 bands);
  2. equi-join (band, bh) against the directory → arrivals colliding with
     any previously accepted doc;
  3. within-batch collisions resolve by min-doc_id-wins (the same
     canonical-survivor rule as ``dedup_exact``);
  4. append the batch's bands to the directory and the per-doc verdicts
     to the output, each under a ``batch=<id>`` subdirectory written with
     overwrite — re-running a batch id after a crash replaces its own
     output instead of duplicating it (idempotent replay, same discipline
     as `streaming/events.run_foreach_batch_upsert`).

Scale: the directory join is a (band, bh) hash equi-join — collision-set
bounded, never all-pairs; the directory grows linearly with accepted docs
(4 rows/doc) and is partition-pruned by nothing but read fully, which is
the honest cost of exact-collision lookup (at 100 TB you'd bucket the
directory by ``bh`` so the join is shuffle-free on the directory side —
same plan shape Spark's bucketing gives the batch q-bucketed join).

DuckDB cannot oracle a stream; the test locks stream == batch: the
flagged set must equal the distinct ``db`` side of the batch LSH
candidate pairs when arrival order matches doc_id order
(test_streaming_neardup.py).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, functions as F

from doc2dataset_spark import fsio
from doc2dataset_spark.queries.dedup import bands_of


def flag_against_directory(
    batch_docs: DataFrame, directory: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """(verdicts, batch_bands) for one micro-batch of (doc_id, text).

    verdicts: (doc_id, is_neardup, matched_earlier) — ``matched_earlier``
    is the collision against the persisted directory only; within-batch
    collisions additionally flag every doc except the minimal doc_id of
    its collision group.
    """
    bands = bands_of(batch_docs)
    if directory is not None:
        dir_hit = bands.join(
            directory.select("band", "bh"), ["band", "bh"], "left_semi"
        )
        earlier = dir_hit.select("doc_id").distinct().withColumn(
            "matched_earlier", F.lit(True)
        )
    else:
        earlier = batch_docs.select("doc_id").limit(0).withColumn(
            "matched_earlier", F.lit(True)
        )
    # within-batch: min doc_id per (band, bh) bucket survives; everyone
    # else in a >1 bucket is a near-dup arrival
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "bh")
    intra = (
        bands.withColumn("keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
        .distinct()
        .withColumn("matched_batch", F.lit(True))
    )
    verdicts = (
        batch_docs.select("doc_id")
        .join(earlier, "doc_id", "left")
        .join(intra, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("matched_earlier", F.lit(False)).alias("matched_earlier"),
            (
                F.coalesce("matched_earlier", F.lit(False))
                | F.coalesce("matched_batch", F.lit(False))
            ).alias("is_neardup"),
        )
    )
    return verdicts, bands


def band_directory_exists(state_dir: str) -> bool:
    """True when the persisted band directory has at least one batch.

    Routes through fsio, NOT os.path: a URL-form state_dir (file:///...)
    is a path Spark's writers accept, and an os.path check on it would be
    silently False forever — disabling all cross-batch detection without
    an error."""
    fs, _ = fsio.url_to_fs(state_dir)
    if not fs.exists(state_dir):
        return False
    return any("batch=" in e for e in fs.find(state_dir))


def run_incremental_neardup(
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Wire the stream: verdicts → ``out_dir``, band directory →
    ``state_dir``, both idempotent per batch id. Returns the
    StreamingQuery (caller awaits/stops)."""
    spark = docs_stream.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        directory = None
        if band_directory_exists(state_dir):
            directory = spark.read.parquet(state_dir)
            # replay safety: a re-delivered batch must not match its own
            # earlier (crashed) write
            directory = directory.filter(F.col("batch") != batch_id)
        verdicts, bands = flag_against_directory(batch_df, directory)
        # the band lineage (tokenize + shingle + 16-perm minhash) feeds
        # BOTH writes and the two collision joins — persist it once
        # instead of re-running the most expensive per-batch subtree
        bands.persist()
        try:
            verdicts.withColumn("batch", F.lit(batch_id)).write.mode(
                "overwrite"
            ).parquet(posixpath.join(out_dir, f"batch={batch_id}"))
            bands.withColumn("batch", F.lit(batch_id)).write.mode(
                "overwrite"
            ).parquet(posixpath.join(state_dir, f"batch={batch_id}"))
        finally:
            bands.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
