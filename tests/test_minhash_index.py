"""Warm-path identity: the persisted MinHash band index and the
persisted fixed-point model must serve BIT-IDENTICAL results to their
in-query twins — the property that lets curate_corpus_scored_indexed
and dedup_minhash_indexed share their cold twins' oracles."""

from __future__ import annotations

from doc2dataset_spark.operators.minhash_index import (
    build_minhash_index,
    candidates_from_index,
)
from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.queries.round9_extras import (
    fx_score_from,
    fx_train_score,
    save_fx_model,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_band_index_serves_identical_pairs(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "mh_index")
    build_minhash_index(spark, sf_dir, idx)
    served = _rows(candidates_from_index(spark, idx))
    assert served  # the fixture has near-dup pairs by construction
    cold = _rows(REGISTRY["dedup_minhash_lsh"].builder(spark, sf_dir))
    warm = _rows(REGISTRY["dedup_minhash_indexed"].builder(spark, sf_dir))
    assert warm == cold


def test_fx_model_roundtrip_scores_identical(spark, sf_dir, tmp_path):
    mdir = str(tmp_path / "fx_model")
    save_fx_model(spark, sf_dir, mdir)
    warm = _rows(fx_score_from(spark, sf_dir, mdir))
    cold = _rows(fx_train_score(spark, sf_dir))
    assert warm == cold
    assert warm  # non-empty corpus


def test_scored_curation_warm_equals_cold(spark, sf_dir):
    cold = _rows(REGISTRY["curate_corpus_scored"].builder(spark, sf_dir))
    warm = _rows(
        REGISTRY["curate_corpus_scored_indexed"].builder(spark, sf_dir)
    )
    assert warm == cold
