"""Clustered-embedding ANN characterization (round-5 verdict, Next round
#6): the recall table in COVERAGE.md is measured on near-uniform vectors
— IVF/PQ's pessimal case. This locks the realistic regime: on a
mixture-of-Gaussians corpus (scripts/make_clustered_embeddings.py,
deterministic seed) the oracle-gated ANN evals stay hash-exact vs DuckDB
AND the IVF defaults earn their keep (recall jumps from ~0.19 uniform to
>0.6 clustered; the full sweep is in scripts/ann_recall_sweep.py and
BASELINE.md)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc2dataset_spark.oracle import run_compare
from doc2dataset_spark.queries import REGISTRY
from scripts.make_clustered_embeddings import make_clustered_embeddings


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clustered_emb"))
    make_clustered_embeddings(out)
    return out


@pytest.mark.parametrize(
    "name",
    ["ann_recall_eval", "ann_pq_recall", "dedup_embedding_cell", "sim_ann_ivf"],
)
def test_embedding_queries_stay_oracle_exact_on_clustered_corpus(
    spark, clustered_dir, name
):
    """The embedding operators' Spark/DuckDB hash equality must not depend
    on the test corpus's (near-uniform) distribution."""
    res = run_compare(spark, clustered_dir, name)
    assert res.ok, f"{name}: {res}"


def test_ivf_recall_is_high_on_clustered_corpus(spark, clustered_dir):
    """IVF defaults justified on realistic data: mean recall@3 ~0.69 at
    nprobe=1 on the clustered fixture (vs ~0.19 on uniform sf0.1) —
    assert a >0.6 floor with headroom for seed drift."""
    mean = (
        REGISTRY["ann_recall_eval"]
        .builder(spark, clustered_dir)
        .agg(F.avg("recall").alias("r"))
        .collect()[0]["r"]
    )
    assert mean > 0.6, mean


def test_rerank_recovers_recall_over_plain_adc(spark, clustered_dir):
    """sim_ann_pq_rerank (round 6): the exact re-rank over the 32-wide
    ADC candidate cut must strictly beat raw ADC recall@5 — measured
    0.23 -> 0.82 clustered, 0.10 -> 0.38 uniform."""
    def mean(q):
        return (
            REGISTRY[q]
            .builder(spark, clustered_dir)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )

    adc, rr = mean("ann_pq_recall"), mean("ann_pq_rerank_recall")
    assert rr > adc + 0.2, (adc, rr)
    assert rr > 0.6, rr


def test_multi_table_lsh_beats_single_table(spark, clustered_dir):
    """Round-7 (verdict Next round #6): L=4-table OR-amplified hyperplane
    LSH must fix the single-table recall hole — measured 0.60 clustered
    at 5 planes/table vs 0.077-0.257 single-table. Assert a 0.5 floor
    and strict improvement over the single-table query, plus oracle
    exactness on this corpus."""
    res = run_compare(spark, clustered_dir, "ann_hyperplane_multi_recall")
    assert res.ok, res

    multi = (
        REGISTRY["ann_hyperplane_multi_recall"]
        .builder(spark, clustered_dir)
        .agg(F.avg("recall").alias("r"))
        .collect()[0]["r"]
    )
    assert multi > 0.5, multi

    # single-table baseline on the same corpus, same truth set
    truth = {
        (r.qid, r.cid)
        for r in REGISTRY["knn_graph_topk"]
        .builder(spark, clustered_dir)
        .select("qid", "cid")
        .collect()
    }
    single = {
        (r.qid, r.cid)
        for r in REGISTRY["sim_ann_hyperplane"]
        .builder(spark, clustered_dir)
        .select("qid", "cid")
        .collect()
    }
    single_recall = len(truth & single) / len(truth)
    assert multi > single_recall + 0.2, (single_recall, multi)
