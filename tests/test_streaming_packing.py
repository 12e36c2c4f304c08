"""Streaming sequence packing == batch pack_sequences on the same input,
including across micro-batch boundaries (state carries each shard's next
offset) — the stream==batch discipline used by every other streaming op
here (DuckDB cannot oracle a stream)."""

from __future__ import annotations

import os
import time

import pytest

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import load_table
from doc2dataset_spark.streaming.packing import pack_stream, stream_documents


@pytest.fixture()
def split_docs_dir(spark, sf_dir, tmp_path):
    """The documents table split into two parquet files by doc_id range,
    mtimes ordered so the low-id file forms micro-batch 1 — per-shard
    arrival order is doc_id order, the equality precondition."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    out = tmp_path / "docs_stream"
    lo = out / "batch0.parquet"
    hi = out / "batch1.parquet"
    os.makedirs(out, exist_ok=True)
    docs.filter(f"doc_id <= {int(mid)}").toPandas().to_parquet(lo.as_posix())
    docs.filter(f"doc_id > {int(mid)}").toPandas().to_parquet(hi.as_posix())
    # explicit mtime gap pins file-source ordering (low-id file first)
    os.utime(hi, (time.time() + 2, time.time() + 2))
    return out.as_posix()


def test_stream_packing_matches_batch_across_batches(
    spark, sf_dir, split_docs_dir, tmp_path
):
    agg = pack_stream(stream_documents(spark, split_docs_dir))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("packed_stream")
        .option("checkpointLocation", (tmp_path / "ckpt").as_posix())
        .start()
    )
    q.processAllAvailable()
    # the equality below is only meaningful if the state actually crossed a
    # micro-batch boundary: maxFilesPerTrigger=1 over two files must yield
    # at least two non-empty micro-batches
    data_batches = [
        p for p in q.recentProgress if p["numInputRows"] > 0
    ]
    q.stop()
    assert len(data_batches) >= 2, "stream collapsed into one micro-batch"
    got = {
        (r.doc_id, r.shard, r.n_tokens, r.start_off, r.seq_id)
        for r in spark.sql("SELECT * FROM packed_stream").collect()
    }
    want = {
        (r.doc_id, r.shard, r.n_tokens, r.start_off, r.seq_id)
        for r in REGISTRY["pack_sequences"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_packing_survives_restart(spark, sf_dir, tmp_path):
    """State recovery: pack batch 1, STOP the query, start a NEW query on
    the same checkpoint after the second file arrives — offsets must
    continue where the stopped query left off (the state store, not the
    process, owns the next_off counters)."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src = tmp_path / "docs_restart"
    os.makedirs(src, exist_ok=True)
    out = (tmp_path / "out").as_posix()
    ckpt = (tmp_path / "ckpt2").as_posix()
    docs.filter(f"doc_id <= {int(mid)}").toPandas().to_parquet(
        (src / "batch0.parquet").as_posix()
    )

    def run_once():
        q = (
            pack_stream(stream_documents(spark, src.as_posix()))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()  # only file 0 exists: first half packed, state checkpointed
    docs.filter(f"doc_id > {int(mid)}").toPandas().to_parquet(
        (src / "batch1.parquet").as_posix()
    )
    run_once()  # restarted query resumes from state and packs file 1

    got = {
        (r.doc_id, r.shard, r.n_tokens, r.start_off, r.seq_id)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.shard, r.n_tokens, r.start_off, r.seq_id)
        for r in REGISTRY["pack_sequences"].builder(spark, sf_dir).collect()
    }
    assert got == want
