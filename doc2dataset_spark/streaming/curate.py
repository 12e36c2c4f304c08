"""Streaming curation: the batch ``curate_corpus`` front half (quality
gate → exact dedup) as an incremental ingest stream.

Per micro-batch of (doc_id, text):

1. **Quality gate** — the SAME row-local Gopher rule evaluation the batch
   query uses (``curation_extras.gopher_flags``), so batch and stream
   cannot drift. Rejected docs are recorded with ``keep_quality=False``
   and never reach the dedup index.
2. **Exact dedup against everything accepted so far** — sha256 digest
   equi-join (left-semi) against the accumulating digest directory (the
   ``streaming/neardup.py`` band-directory pattern with a single exact
   key); within-batch collisions resolve min-doc_id-wins, the
   ``dedup_exact`` canonical rule.
3. **Idempotent landing** — the batch's verdicts and its NEW digests each
   land under ``batch=<id>`` with overwrite: a replayed batch id replaces
   its own output (same discipline as events.run_foreach_batch_upsert).

Scale: the digest join is a hash equi-join on a 32-byte key — the
directory side grows linearly with ACCEPTED docs (1 row each); at 100 TB
you bucket the directory by digest so the lookup is shuffle-free on the
index side. State never holds text, only digests.

DuckDB cannot oracle a stream; tests/test_streaming_curate.py locks
stream == batch: the accepted set must equal the batch composition
(gopher keep ∧ first-occurrence-by-digest) when arrival order matches
doc_id order.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from doc2dataset_spark import fsio
from doc2dataset_spark.queries.curation_extras import gopher_flags


def digest_directory_exists(state_dir: str) -> bool:
    fs, _ = fsio.url_to_fs(state_dir)
    if not fs.exists(state_dir):
        return False
    return any("batch=" in e for e in fs.find(state_dir))


def curate_batch(
    batch_docs: DataFrame, directory: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """(verdicts, new_digests) for one micro-batch of (doc_id, text).

    verdicts: (doc_id, keep_quality, is_dup, accepted); new_digests:
    (digest, doc_id) for accepted rows only — the directory delta."""
    flags = gopher_flags(batch_docs).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    hashed = (
        batch_docs.join(flags, "doc_id")
        .withColumn("digest", F.sha2("text", 256))
    )
    quality = hashed.filter(F.col("keep_quality"))
    if directory is not None:
        earlier = (
            quality.join(
                directory.select("digest"), "digest", "left_semi"
            )
            .select("doc_id")
            .withColumn("dup_earlier", F.lit(True))
        )
    else:
        earlier = quality.select("doc_id").limit(0).withColumn(
            "dup_earlier", F.lit(True)
        )
    w = W.partitionBy("digest")
    intra = (
        quality.withColumn("first", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("first"))
        .select("doc_id")
        .withColumn("dup_batch", F.lit(True))
    )
    verdicts = (
        hashed.select("doc_id", "keep_quality", "digest")
        .join(earlier, "doc_id", "left")
        .join(intra, "doc_id", "left")
        .select(
            "doc_id",
            "keep_quality",
            (
                F.coalesce("dup_earlier", F.lit(False))
                | F.coalesce("dup_batch", F.lit(False))
            ).alias("is_dup"),
            "digest",
        )
        .withColumn(
            "accepted", F.col("keep_quality") & ~F.col("is_dup")
        )
    )
    new_digests = verdicts.filter("accepted").select("digest", "doc_id")
    return verdicts.drop("digest"), new_digests


def run_curate_stream(
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Wire the stream: verdicts → out_dir, digest directory → state_dir,
    both idempotent per batch id. Returns the StreamingQuery."""
    spark = docs_stream.sparkSession

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Crash-replay idempotence: a replayed batch must NOT see the
        # digest partition it wrote before the crash (batch=<batch_id>),
        # or every accepted doc would be flagged dup_earlier against its
        # own digest and then have its state overwritten with an empty
        # frame.  Partition discovery exposes the ``batch`` column, so
        # the directory read is restricted to strictly earlier batches.
        directory = (
            spark.read.parquet(state_dir).filter(
                F.col("batch") < F.lit(int(batch_id))
            )
            if digest_directory_exists(state_dir)
            else None
        )
        verdicts, new_digests = curate_batch(batch_df, directory)
        verdicts.write.mode("overwrite").parquet(
            posixpath.join(out_dir, f"batch={batch_id}")
        )
        new_digests.write.mode("overwrite").parquet(
            posixpath.join(state_dir, f"batch={batch_id}")
        )

    return (
        docs_stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
