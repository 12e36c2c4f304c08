"""Incremental cluster-state maintenance vs the full recompute.

The registered dedup_cluster_incremental row pins the SimHash replay
against the trusted recursive-CTE oracle; these tests exercise the
operator directly on the band-index feed (new_batch_candidates — the
actual daily-batch producer), the replay contract, and compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.operators.cluster_state import (
    apply_batch,
    compact_labels,
    serve_labels,
)
from doc2dataset_spark.operators.minhash_index import (
    append_minhash_batch,
    new_batch_candidates,
)
from doc2dataset_spark.queries.dedup import cc_labels_from_pairs
from doc2dataset_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _setup(spark, sf_dir, tmp_path):
    """Two ingest batches through the band index; returns (state_dir,
    per-batch pair frames, per-batch doc-id frames)."""
    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh")
    append_minhash_batch(spark, b0, idx, batch_id=0)
    p0 = new_batch_candidates(spark, idx, 0).select("da", "db")
    append_minhash_batch(spark, b1, idx, batch_id=1)
    p1 = new_batch_candidates(spark, idx, 1).select("da", "db")
    state = str(tmp_path / "state")
    return state, [p0, p1], [b0.select("doc_id"), b1.select("doc_id")]


def test_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    """Folding each batch's new_batch_candidates into the state serves
    exactly the labels of one CC over the union of all pairs (plus
    self-labeled singletons) — the confluence property the design rests
    on, on the real band-index feed."""
    state, pairs, ids = _setup(spark, sf_dir, tmp_path)
    for b, (p, i) in enumerate(zip(pairs, ids)):
        stats = apply_batch(spark, state, p, i, batch_id=b)
        assert stats["n_upserts"] > 0
    got = _rows(serve_labels(spark, state))

    all_pairs = pairs[0].union(pairs[1])
    full = cc_labels_from_pairs(all_pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    want = _rows(
        docs.join(full, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    assert got == want


def test_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-applying the last batch rewrites exactly its own partition and
    serves the identical state — including the merge upserts (the replay
    must see pre-batch state as prior, not its own earlier output)."""
    state, pairs, ids = _setup(spark, sf_dir, tmp_path)
    apply_batch(spark, state, pairs[0], ids[0], batch_id=0)
    first = apply_batch(spark, state, pairs[1], ids[1], batch_id=1)
    before = _rows(serve_labels(spark, state))
    replay = apply_batch(spark, state, pairs[1], ids[1], batch_id=1)
    assert replay == first
    assert _rows(serve_labels(spark, state)) == before


def test_update_is_subgraph_local(spark, sf_dir, tmp_path):
    """The second batch's fold touches members of affected clusters,
    never the whole corpus: affected members < corpus size, and upserts
    are bounded by batch docs + affected members."""
    state, pairs, ids = _setup(spark, sf_dir, tmp_path)
    apply_batch(spark, state, pairs[0], ids[0], batch_id=0)
    stats = apply_batch(spark, state, pairs[1], ids[1], batch_id=1)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert stats["n_affected_members"] < n_docs / 2  # only batch-0 members
    assert stats["n_upserts"] <= stats["n_affected_members"] + ids[1].count()


def test_compact_labels_preserves_served_state(spark, sf_dir, tmp_path):
    state, pairs, ids = _setup(spark, sf_dir, tmp_path)
    apply_batch(spark, state, pairs[0], ids[0], batch_id=0)
    apply_batch(spark, state, pairs[1], ids[1], batch_id=1)
    before = _rows(serve_labels(spark, state))
    compact_labels(spark, state, upto_batch=1)
    after_log = spark.read.parquet(str(tmp_path / "state" / "labels"))
    assert after_log.select("batch_id").distinct().count() == 1
    # superseded upserts are gone: exactly one row per doc
    assert after_log.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert _rows(serve_labels(spark, state)) == before


def test_empty_batch_writes_only_singletons(spark, sf_dir, tmp_path):
    """A batch whose documents have no near-dup pair still lands its
    docs as self-labeled singletons (the state must cover the corpus)."""
    state = str(tmp_path / "state_empty")
    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(10)
    empty = docs.select(
        F.col("doc_id").alias("da"), F.col("doc_id").alias("db")
    ).limit(0)
    stats = apply_batch(spark, state, empty, docs, batch_id=0)
    assert stats["n_new_pairs"] == 0 and stats["n_upserts"] == 10
    got = _rows(serve_labels(spark, state))
    assert all(d == c for d, c in got) and len(got) == 10
