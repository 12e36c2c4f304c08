"""Freeze the driver-gate query set.

The round driver snapshots only the FIRST 50 registered queries into
CORRECTNESS_r{N}.json. Round 2 learned the hard way that an innocent
mid-module addition silently displaces a scale-critical query from that
gate (dedup_embedding_cell pushed sim_ann_hyperplane out). This test
makes the gate set an explicit contract: changing it requires editing
the frozen list here, in the same diff, on purpose.

New queries belong AFTER the gate (late module in queries/__init__.py or
late registration within a module); promoting one into the gate means
choosing which current member it evicts.
"""

import pytest

from doc2dataset_spark.oracle import run_compare
from doc2dataset_spark.queries import REGISTRY

DRIVER_GATE_SIZE = 50

# the 50 names the driver gates on, in registration order — oracle-backed,
# scale-critical first (dedup/similarity/scale/extras/textops/ml/udfs,
# then the windows surface)
FROZEN_GATE = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cell",
    "dedup_cluster_cc",
    "dedup_ngram_containment",
    "sim_cosine_topk",
    "sim_ann_hyperplane",
    "sim_ann_ivf",
    "agg_salted_two_phase",
    "q12b_bucketed_range_join",
    "agg_percentiles",
    "q37_recursive_cte",
    "text_tfidf_topk",
    "sample_deterministic",
    "join_cbo_reordered",
    "quality_psi_drift",
    "events_resample_interp",
    "q74_higher_order_fns",
    "events_ewma",
    "q40_listagg",
    "dedup_jaccard_prefix",
    "graph_clustering_coef",
    "text_quality_score",
    "graph_kcore",
    "sample_temperature_mix",
    "text_boilerplate",
    "ml_kmeans_lite",
    "q36_pandas_udf",
    "q36_apply_in_pandas",
    "text_lm_perplexity",
    "quality_dsir_weights",
    "quality_classifier_lr",
    "text_bpe_merges",
    # round-7 rotations (verdict Next round #2, applied twice): 13
    # round-1-stable windows rows demoted to the tail (mirror+pytest keep
    # covering them); the round-5/6 flagships and the round-7 session's
    # new flagships (TPC-H Q7/Q8, bucketed join, CDC merge, MV refresh)
    # take their slots for driver-recorded hash rows
    "q45_tpch_q3",
    "q46_tpch_q5",
    "q55_tpch_q7",
    "q38_lateral_topk",
    "search_bm25_topk",
    "dedup_substring_rewrite",
    "sim_ann_pq",
    "curate_corpus",
    "text_heavy_hitters",
    "q56_tpch_q8",
    "join_bucketed_colocated",
    "merge_cdc_apply",
    "rollup_incremental_merge",
]


def test_driver_gate_set_is_frozen():
    got = list(REGISTRY)[:DRIVER_GATE_SIZE]
    assert got == FROZEN_GATE, (
        "the first 50 registered queries changed — a new registration "
        "displaced a gate member. Register new queries after the gate, "
        "or update FROZEN_GATE deliberately in the same commit.\n"
        f"evicted: {sorted(set(FROZEN_GATE) - set(got))}\n"
        f"intruded: {sorted(set(got) - set(FROZEN_GATE))}"
    )


def test_gate_members_are_oracle_backed():
    """Every gated query must carry a DuckDB oracle (hash-compared by the
    driver). Round 6 swapped the two rows-only sketches out of the gate
    (queries/__init__.py gate_swap), so no exemptions remain: a clean
    50/50 CORRECTNESS file is the contract."""
    for name in list(REGISTRY)[:DRIVER_GATE_SIZE]:
        spec = REGISTRY[name]
        assert spec.oracle, f"gated query {name} has no oracle SQL"


def _degated_oracle_names() -> list[str]:
    return [
        name
        for name in list(REGISTRY)[DRIVER_GATE_SIZE:]
        if REGISTRY[name].oracle
    ]


@pytest.mark.parametrize("name", _degated_oracle_names())
def test_degated_queries_keep_oracle_parity(spark, sf_dir, name):
    """Queries registered PAST the 50-row driver snapshot (the q01-q19
    relational surface and late additions) lose external verification —
    the driver's CORRECTNESS file never sees them again. This keeps them
    under an automated oracle gate: every de-gated oracle-backed query is
    hash-compared against DuckDB at smoke scale on each test run."""
    res = run_compare(spark, sf_dir, name)
    assert res.ok, f"{name}: {res}"
