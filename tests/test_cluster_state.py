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


def test_compact_labels_leaves_tail_batches_byte_untouched(
    spark, sf_dir, tmp_path
):
    """Compacting upto batch 0 with batch 1 still live must rename batch
    1's partition dir into the new root — identical files, never a
    read-modify-rewrite — and the served state is invariant."""
    import os

    from tests.test_index_maintenance import file_inventory

    state, pairs, ids = _setup(spark, sf_dir, tmp_path)
    apply_batch(spark, state, pairs[0], ids[0], batch_id=0)
    apply_batch(spark, state, pairs[1], ids[1], batch_id=1)
    before = _rows(serve_labels(spark, state))
    labels_root = str(tmp_path / "state" / "labels")
    tail_before = file_inventory(os.path.join(labels_root, "batch_id=1"))
    compact_labels(spark, state, upto_batch=0)
    assert (
        file_inventory(os.path.join(labels_root, "batch_id=1"))
        == tail_before
    )
    assert not os.path.exists(labels_root + "__compact_manifest.json")
    assert not os.path.exists(labels_root + "__old_compact")
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


# ---------------------------------------------------------------------------
# forget_docs (right-to-be-forgotten with cluster splits)
# ---------------------------------------------------------------------------
def _pairs_const(spark, rows):
    def pairs_for(members):
        if rows:
            return spark.createDataFrame(rows, "da bigint, db bigint")
        return spark.createDataFrame([], "da bigint, db bigint")

    return pairs_for


def test_forget_splits_bridged_cluster(spark, tmp_path):
    """Chain 1-2-3 (2 is the only bridge): forgetting 2 must SPLIT the
    cluster into singletons {1} and {3} — the semantics plain row
    deletion cannot produce."""
    state = str(tmp_path / "st")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "da bigint, db bigint"
    )
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
    apply_batch(spark, state, pairs, docs, batch_id=0)
    assert _rows(serve_labels(spark, state)) == [(1, 1), (2, 1), (3, 1)]

    from doc2dataset_spark.operators.cluster_state import forget_docs

    stats = forget_docs(
        spark, state, [2], _pairs_const(spark, []), batch_id=1
    )
    assert stats["n_affected_members"] == 2
    assert _rows(serve_labels(spark, state)) == [(1, 1), (3, 3)]


def test_forget_min_label_holder(spark, tmp_path):
    """Forgetting the doc whose id IS the cluster label: survivors must
    be relabeled to their new min, not keep a dangling label."""
    state = str(tmp_path / "st")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "da bigint, db bigint"
    )
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
    apply_batch(spark, state, pairs, docs, batch_id=0)

    from doc2dataset_spark.operators.cluster_state import forget_docs

    forget_docs(
        spark, state, [1], _pairs_const(spark, [(2, 3)]), batch_id=1
    )
    assert _rows(serve_labels(spark, state)) == [(2, 2), (3, 2)]


def test_forget_with_band_index_equals_never_ingested(
    spark, sf_dir, tmp_path
):
    """End-to-end with the real providers: forget docs from the band
    index (delete_docs_minhash) AND the cluster state
    (member_pairs_minhash relabeling) — the served labels must equal a
    full recompute over the post-deletion index for every surviving
    doc."""
    from doc2dataset_spark.operators.cluster_state import (
        forget_docs,
        member_pairs_minhash,
    )
    from doc2dataset_spark.operators.index_maintenance import (
        delete_docs_minhash,
    )
    from doc2dataset_spark.operators.minhash_index import (
        append_minhash_batch,
        candidates_from_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh")
    state = str(tmp_path / "state")
    append_minhash_batch(spark, docs, idx, batch_id=0)
    pairs = candidates_from_index(spark, idx)
    apply_batch(spark, state, pairs, docs.select("doc_id"), batch_id=0)

    # forget a doc that HAS near-dups (so clusters are really affected)
    victim = int(pairs.limit(1).collect()[0]["da"])
    delete_docs_minhash(spark, idx, [victim])
    stats = forget_docs(
        spark, state, [victim], member_pairs_minhash(spark, idx), batch_id=1
    )
    assert stats["n_affected_members"] > 0

    got = _rows(serve_labels(spark, state))
    full = cc_labels_from_pairs(candidates_from_index(spark, idx))
    want = _rows(
        docs.filter(F.col("doc_id") != victim)
        .select("doc_id")
        .join(full, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    assert got == want


def test_forget_tombstone_survives_compaction(spark, tmp_path):
    """Compacting past a forget batch must not resurrect the doc — the
    tombstone's shadowed rows die with it inside the collapsed range."""
    from doc2dataset_spark.operators.cluster_state import forget_docs

    state = str(tmp_path / "st")
    pairs = spark.createDataFrame([(1, 2)], "da bigint, db bigint")
    docs = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    apply_batch(spark, state, pairs, docs, batch_id=0)
    forget_docs(spark, state, [1], _pairs_const(spark, []), batch_id=1)
    before = _rows(serve_labels(spark, state))
    assert before == [(2, 2)]
    compact_labels(spark, state, upto_batch=1)
    assert _rows(serve_labels(spark, state)) == before
    log = spark.read.parquet(str(tmp_path / "st" / "labels"))
    assert log.count() == 1  # the tombstone itself is compacted away


def test_streaming_cluster_ingest_matches_full_recompute(
    spark, sf_dir, tmp_path
):
    """Documents streamed in two micro-batches through
    run_cluster_ingest (band append -> pruned candidates -> state fold
    per batch) must serve the labels of ONE full CC over the complete
    candidate set — the streaming twin of the batch equality test."""
    from doc2dataset_spark.operators.minhash_index import (
        candidates_from_index,
    )
    from doc2dataset_spark.streaming.index_ingest import run_cluster_ingest
    from tests.test_winnow_index import _doc_stream_source

    idx = str(tmp_path / "mh_stream")
    state = str(tmp_path / "state_stream")
    run_cluster_ingest(
        _doc_stream_source(spark, sf_dir, tmp_path),
        idx,
        state,
        str(tmp_path / "ck"),
    )
    got = _rows(serve_labels(spark, state))
    full = cc_labels_from_pairs(candidates_from_index(spark, idx))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    want = _rows(
        docs.join(full, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    assert got == want


def test_forget_replay_is_idempotent(spark, tmp_path):
    """Crash-recovery rerun of the same forget batch: prior must be the
    PRE-forget state (batches < batch_id), or the rewrite keeps only the
    tombstones and survivors silently revert to labels pointing at the
    forgotten doc."""
    from doc2dataset_spark.operators.cluster_state import forget_docs

    state = str(tmp_path / "st")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "da bigint, db bigint"
    )
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
    apply_batch(spark, state, pairs, docs, batch_id=0)
    first = forget_docs(
        spark, state, [1], _pairs_const(spark, [(2, 3)]), batch_id=1
    )
    before = _rows(serve_labels(spark, state))
    assert before == [(2, 2), (3, 2)]
    replay = forget_docs(
        spark, state, [1], _pairs_const(spark, [(2, 3)]), batch_id=1
    )
    assert replay == first
    assert _rows(serve_labels(spark, state)) == before


def test_forget_with_winnow_index_equals_never_ingested(
    spark, sf_dir, tmp_path
):
    """The winnow-fed twin of the band-index forget test: detector
    choice must not matter to the forget contract. Pairs among members
    keep the FULL-corpus df prune (a member-scoped df would admit hub
    fingerprints the serving path prunes)."""
    from doc2dataset_spark.operators.cluster_state import (
        forget_docs,
        member_pairs_winnow,
    )
    from doc2dataset_spark.operators.index_maintenance import (
        delete_docs_winnow,
    )
    from doc2dataset_spark.operators.winnow_index import (
        append_winnow_batch,
        pairs_from_postings,
        read_postings,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "wn")
    state = str(tmp_path / "state")
    append_winnow_batch(spark, docs, idx, batch_id=0)
    pairs = pairs_from_postings(read_postings(spark, idx)).select("da", "db")
    apply_batch(spark, state, pairs, docs.select("doc_id"), batch_id=0)

    victim = int(pairs.limit(1).collect()[0]["da"])
    delete_docs_winnow(spark, idx, [victim])
    stats = forget_docs(
        spark, state, [victim], member_pairs_winnow(spark, idx), batch_id=1
    )
    assert stats["n_affected_members"] > 0

    got = _rows(serve_labels(spark, state))
    full = cc_labels_from_pairs(
        pairs_from_postings(read_postings(spark, idx)).select("da", "db")
    )
    want = _rows(
        docs.filter(F.col("doc_id") != victim)
        .select("doc_id")
        .join(full, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    assert got == want


def test_streaming_cluster_ingest_auto_compaction_serves_same(
    spark, sf_dir, tmp_path
):
    """run_cluster_ingest with compact_past_batches=1 must finalize the
    pre-window batches in BOTH artifacts (band index + label log, on
    their shared batch clock) and serve identical labels to the
    uncompacted twin — compaction is invisible to every reader."""
    import os

    from doc2dataset_spark.operators.minhash_index import (
        _bands_path,
        candidates_from_index,
    )
    from doc2dataset_spark.streaming.index_ingest import run_cluster_ingest
    from tests.test_winnow_index import _doc_stream_source_3

    idx = str(tmp_path / "mh_stream_c")
    state = str(tmp_path / "state_stream_c")
    run_cluster_ingest(
        _doc_stream_source_3(spark, sf_dir, tmp_path),
        idx,
        state,
        str(tmp_path / "ck_c"),
        compact_past_batches=1,
    )

    def _dirs(p):
        return sorted(
            d for d in os.listdir(p) if d.startswith("batch_id=")
        )

    assert _dirs(_bands_path(idx)) == ["batch_id=2", "batch_id=3"]
    assert _dirs(str(tmp_path / "state_stream_c" / "labels")) == [
        "batch_id=2",
        "batch_id=3",
    ]
    got = _rows(serve_labels(spark, state))
    full = cc_labels_from_pairs(candidates_from_index(spark, idx))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    want = _rows(
        docs.join(full, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
    )
    assert got == want
