"""Incremental near-dup cluster maintenance: persisted labels, updated
per ingest batch, provably equal to a full recompute.

``dedup_cluster_cc`` turns pairwise near-dup detections into cluster
labels (min doc_id per connected component) with a full-corpus fixpoint.
Right for a one-shot audit; wrong for the daily-batch serving story the
index lifecycles already deliver everywhere else: the band index hands
back ONLY the candidate pairs touching a new batch
(minhash_index.new_batch_candidates), so re-running CC over the whole
corpus to absorb them throws that pruning away.

This module keeps the cluster labels AS STATE and folds each batch's new
pairs in by running the identical label propagation on just the
AFFECTED SUBGRAPH:

    state_dir/labels/  batch_id=<b>/*.parquet  — (doc_id, cluster_id)

- The label log is an upsert log (the streaming/cdc.py discipline):
  each batch appends one ``batch_id`` partition of (doc_id, new label)
  rows — idempotent per batch_id via dynamic partition overwrite —
  and serving is one latest-wins ``max_by(cluster_id, batch_id)``
  aggregate over the log (labels only ever DECREASE as components
  merge, but latest-wins is the general contract and costs the same).
- A new batch's update touches O(new pairs + members of the clusters
  those pairs connect), never O(corpus): the affected subgraph is the
  new edges plus one (member -> current label) edge per member of every
  affected cluster. A cluster's label is its min member doc_id — itself
  a member — so each affected cluster is one star in the subgraph and
  the propagation's min over a merged component is the TRUE min over
  all merged members (equality pytest vs the full recompute,
  tests/test_cluster_state.py).
- History compaction canNOT reuse index_maintenance.compact_index_
  history: that relabels rows losslessly, but an upsert log must DROP
  superseded rows or the collapsed partition serves stale labels
  non-deterministically. ``compact_labels`` below is serve-then-rewrite:
  the latest-wins state of batches <= k becomes the single batch_id=k
  partition (served state invariant, pytest-pinned).

Registered query twin: ``dedup_cluster_incremental``
(queries/round11_extras.py) replays the SimHash pair set in three
batches through this state machine and must hash-match the
dedup_cluster_cc oracle — the incremental engine is judged against the
trusted full-recompute recursive CTE.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2dataset_spark.queries.dedup import cc_labels_from_pairs


def _labels_path(state_dir: str) -> str:
    return posixpath.join(state_dir, "labels")


def serve_labels(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current (doc_id, cluster_id) state: latest-wins over the upsert
    log — one map-side-combinable aggregate, doc-count-sized."""
    log = spark.read.parquet(_labels_path(state_dir))
    return log.groupBy("doc_id").agg(
        F.expr("max_by(cluster_id, batch_id)").alias("cluster_id")
    )


def apply_batch(
    spark: SparkSession,
    state_dir: str,
    new_pairs: DataFrame,
    new_doc_ids: DataFrame,
    batch_id: int,
) -> dict:
    """Fold one ingest batch into the cluster state.

    ``new_pairs``: (da, db) near-dup pairs TOUCHING the new batch (the
    new_batch_candidates contract: new-vs-corpus plus within-new, never
    old-vs-old — those were folded when their batch arrived).
    ``new_doc_ids``: (doc_id) of every document in the batch — docs with
    no pair become singleton clusters of themselves, so the state covers
    the full corpus, not just paired docs.

    Work is subgraph-local: new edges + every member of every affected
    existing cluster enter one cc_labels_from_pairs fixpoint (the exact
    dedup_cluster_cc propagation); only rows whose label CHANGES (plus
    the new singletons) are appended, under this batch's partition —
    replaying a batch rewrites exactly its own partition (idempotent).

    Returns {n_new_pairs, n_affected_members, n_upserts}.
    """
    new_pairs = new_pairs.select("da", "db").localCheckpoint(eager=True)
    n_new_pairs = new_pairs.count()

    have_state = _has_labels(state_dir)
    if have_state:
        # prior state = batches STRICTLY BEFORE this one: a REPLAY of
        # batch b must see exactly the state its original run saw — if
        # the replayed batch's own earlier upserts were served back as
        # prior, every merge it performed would read as "unchanged",
        # the rewritten partition would lose those rows, and old docs
        # would silently revert to pre-merge labels. (Replaying a batch
        # while LATER batches already exist is not supported — the same
        # replay-finalization contract as the posting indexes.)
        log = spark.read.parquet(_labels_path(state_dir))
        prior = (
            log.filter(F.col("batch_id") < batch_id)
            .groupBy("doc_id")
            .agg(F.expr("max_by(cluster_id, batch_id)").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        touched = (
            new_pairs.select(F.col("da").alias("doc_id"))
            .union(new_pairs.select(F.col("db").alias("doc_id")))
            .distinct()
        )
        affected_clusters = prior.join(touched, "doc_id", "left_semi").select(
            "cluster_id"
        ).distinct()
        members = prior.join(
            affected_clusters, "cluster_id", "left_semi"
        ).localCheckpoint(eager=True)
        # one star per affected cluster: member -> current label (the
        # label is the min member's own doc_id, so it is a node too)
        star = members.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias("da"), F.col("cluster_id").alias("db")
        )
        subgraph = new_pairs.union(star)
    else:
        prior = None
        members = None
        subgraph = new_pairs

    n_members = members.count() if members is not None else 0

    if n_new_pairs > 0:
        fresh = cc_labels_from_pairs(subgraph)
    else:
        fresh = spark.createDataFrame([], "doc_id bigint, cluster_id bigint")

    if prior is not None:
        # only changed labels are upserted; unchanged members keep their
        # old rows (latest-wins serves them untouched)
        changed = (
            fresh.alias("f")
            .join(prior.alias("p"), "doc_id", "left")
            .filter(
                F.col("p.cluster_id").isNull()
                | (F.col("f.cluster_id") != F.col("p.cluster_id"))
            )
            .select("doc_id", F.col("f.cluster_id").alias("cluster_id"))
        )
    else:
        changed = fresh

    singles = (
        new_doc_ids.select("doc_id")
        .join(fresh, "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    upserts = changed.union(singles).localCheckpoint(eager=True)
    n_upserts = upserts.count()
    (
        upserts.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(_labels_path(state_dir))
    )
    return {
        "n_new_pairs": n_new_pairs,
        "n_affected_members": n_members,
        "n_upserts": n_upserts,
    }


def compact_labels(
    spark: SparkSession, state_dir: str, upto_batch: int
) -> None:
    """Collapse label history <= upto_batch into ONE materialized
    partition of the SERVED state. Unlike the posting indexes (where
    compact_index_history relabels rows losslessly), an upsert log must
    drop superseded rows, so compaction here is serve-then-rewrite:
    latest-wins over batches <= upto_batch becomes the batch_id=
    upto_batch partition, later batches stay untouched, and the served
    state is invariant (pytest-pinned)."""
    import uuid

    from doc2dataset_spark import fsio

    fs, p = fsio.url_to_fs(_labels_path(state_dir))
    log = spark.read.parquet(_labels_path(state_dir))
    head = (
        log.filter(F.col("batch_id") <= upto_batch)
        .groupBy("doc_id")
        .agg(F.expr("max_by(cluster_id, batch_id)").alias("cluster_id"))
        .withColumn("batch_id", F.lit(upto_batch))
    )
    tail = log.filter(F.col("batch_id") > upto_batch)
    merged = head.select("doc_id", "cluster_id", "batch_id").union(
        tail.select("doc_id", "cluster_id", "batch_id")
    )
    tmp = f"{p.rstrip('/')}__compact_{uuid.uuid4().hex}"
    (
        merged.repartition(1, F.col("batch_id"))
        .write.partitionBy("batch_id")
        .mode("overwrite")
        .parquet(tmp)
    )
    old = f"{p.rstrip('/')}__old_compact"
    if fs.exists(old):
        raise RuntimeError(
            f"found leftover {old!r} from an interrupted compaction — "
            "recover it before compacting again"
        )
    fs.mv(p, old)
    try:
        fs.mv(tmp, p)
    except BaseException:
        fs.mv(old, p)
        raise
    fs.rm(old, recursive=True)


def _has_labels(state_dir: str) -> bool:
    from doc2dataset_spark import fsio

    fs, p = fsio.url_to_fs(_labels_path(state_dir))
    try:
        return fs.exists(p) and any(
            f.endswith(".parquet") for f in fs.find(p)
        )
    except OSError:
        return False
