"""Streaming ANN index ingest: the persisted IVF index stays fresh as
vectors arrive.

Per micro-batch of (vec_id, embedding float[]): unit-normalize with the
SAME fold-dot math the batch index uses, quantize against the index's
FROZEN saved centroids, land under ``batch_id=<n>/cent_id=<k>`` with
dynamic partition overwrite (``operators/vector_index.append_to_ivf_index``)
— a replayed batch rewrites its own partitions, so crash-and-retry never
duplicates postings. Probes (``probe_ivf_index``) see new vectors the
moment their batch lands; the cent_id partition level keeps probe-side
pruning intact regardless of how many ingest batches accumulate.

The composition closes the loop with streaming curation: accepted
documents' embeddings flow straight from the curate stream into the
serving index — crawl → curate → searchable, all incremental.

DuckDB cannot oracle a stream; tests/test_vector_index.py locks
stream-ingested probes == batch-built probes on the same vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doc2dataset_spark.operators.vector_index import append_to_ivf_index
from doc2dataset_spark.queries.dedup import spark_dot


def normalize_vectors(batch: DataFrame) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, ne): the normalized_embeddings
    math, frame-parameterized for micro-batches."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    nrm = F.sqrt(spark_dot(v, v))
    return batch.select(
        "vec_id", F.transform(v, lambda x: x / nrm).alias("ne")
    )


def run_index_ingest(
    vectors_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
):
    """Wire the stream; the index must already exist (build_ivf_index) —
    ingest only ever quantizes against its frozen centroids. Stream
    batch ids land as ``batch_id + 1`` (batch 0 is the initial build's
    partition). Returns the StreamingQuery."""

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_to_ivf_index(
            batch_df.sparkSession,
            normalize_vectors(batch_df),
            index_dir,
            batch_id=batch_id + 1,
        )

    return (
        vectors_stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
