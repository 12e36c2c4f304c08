"""Single source of truth for the driver-gate contract.

The round driver snapshots only the FIRST ``DRIVER_GATE_SIZE`` registered
queries into CORRECTNESS_r{N}.json, so registration order (set by the
import order + ``gate_swap`` calls in ``queries/__init__.py``) decides
which queries get an externally-recorded correctness row.

Rounds 7-8 proved why this file exists: the fifth gate rotation edited
``tests/test_registry_gate.py::FROZEN_GATE`` but not
``scripts/registry_order.py::MUST_BE_GATED``, and the two hand-maintained
copies drifted — the repo's own checker exited 1 for two consecutive
rounds (round-8 verdict, "What's wrong" #1). Both lists now live HERE and
only here; the test module and the script both import them, and the
module-load assertions below make a subset violation impossible to
commit: any rotation that displaces a MUST_BE_GATED member without
amending it in the same diff fails at import time, everywhere.

Rotation log (why the current 50 are the current 50):
- r6: promoted q37_recursive_cte/q40_listagg over the two rows-only
  sketches (oracle-less rows read as ``err`` to an outside auditor).
- r7 #2-#5: promoted the TPC-H join flagships, maintenance ops, drift /
  lambda surface, and the model-driven curation quartet over
  round-1-stable windows/textops/relational rows (all demoted rows stay
  hash-checked by tests/test_registry_gate.py's degated-parity sweep and
  scripts/driver_mirror.py).
- r9 #6: promoted q69_tpch_q21 + q64_tpch_q2 (the two join-heaviest
  TPC-H shapes never gate-recorded), dedup_prefix_stats (PPJoin blocking
  contract), sim_ann_hyperplane_multi (OR-amplified multi-table LSH),
  profile_documents (corpus profiling) over five round-1-stable rows
  (agg_percentiles, sample_deterministic, q40_listagg,
  text_quality_score, text_boilerplate).
- r10 #7: promoted the round-9 flagship operators — text_bpe_encode
  (tokenizer train->apply), curate_corpus_scored (fixed-point model
  gate + stage audit), dedup_minhash_indexed (index-served LSH),
  dedup_winnow (MOSS winnowing fingerprints), dedup_winnow_recall (the
  detector-evaluation discipline) — over five round-1-stable rows
  (dedup_exact, dedup_simhash, dedup_simhash_pairs,
  dedup_ngram_containment, sim_cosine_topk). dedup_ngram_jaccard stays
  gated as the detector family's exact ground truth; the demoted
  SimHash rows are now additionally judged end-to-end by the post-gate
  dedup_simhash_recall row, and every demoted row remains hash-checked
  by the degated-parity pytest sweep and scripts/driver_mirror.py.
- r11 #8: promoted the round-10 operators — dedup_simhash_recall +
  dedup_embedding_cell_recall (completing the detector-evaluation
  family: every approximate dedup detector now has an oracle-gated
  precision/recall judge), dedup_winnow_indexed (the index-served
  winnowing twin), curate_split_leakage (train/holdout decontamination
  audit) — over dedup_jaccard_prefix (PPJoin stays gated via
  dedup_prefix_stats), q55_tpch_q7 (TPC-H keeps 5 gated joins),
  q38_lateral_topk and text_heavy_hitters (gate-green since round 7).
- r11 #9 (same round): promoted the round-11 flagships —
  dedup_cluster_keep_best (the retention manifest), 
  dedup_cluster_incremental (the incremental cluster engine judged
  against the full-recompute recursive CTE), curate_ccnet_buckets
  (CCNet perplexity strata + keep policy), embedding_mrl_recall
  (Matryoshka prefix recall) — over sample_temperature_mix,
  graph_clustering_coef, events_resample_interp, text_bpe_merges
  (each family keeps stronger gate representation; bpe_encode's oracle
  embeds the demoted merge training end-to-end).
- r12 #10: promoted the round-11 second wave — dedup_keep_best_incremental
  (the warm state-served retention manifest; shares dedup_cluster_keep_best's
  oracle VERBATIM, so the gate externally proves warm == cold),
  dedup_cluster_stats (per-source dedup health report), sample_token_budget
  (token-budgeted mixture selection) — over curate_corpus (curation keeps
  curate_corpus_scored + ccnet + split_leakage; scored embeds the same
  5-stage chain plus the model gate), q45_tpch_q3 (TPC-H keeps its four
  join-heaviest gated shapes: Q21, Q2, Q5, Q8), and text_lm_perplexity
  (its bigram-LM NLL scoring is embedded end-to-end in
  curate_ccnet_buckets' gated oracle).
- r12 #11 (same round): promoted the round-12 operators —
  events_asof_join (the linear-state AS-OF carry judged against DuckDB's
  NATIVE ASOF LEFT JOIN — the one oracle that is itself a real ASOF
  engine), events_asof_tolerance (as-of + tolerance attribution report
  on the same carry), layout_zorder (Morton layout keys, the OPTIMIZE
  ZORDER primitive) — over events_ewma (the events family UPGRADES its
  gate slot to the as-of pair; ewma stays pytest-pinned by its
  reference-fold identities), q37_recursive_cte (the recursive-CTE
  oracle shape stays gated inside dedup_cluster_cc / the cluster
  family's closure oracles), and profile_documents (corpus profiling is
  gate-represented by dedup_cluster_stats' per-source health report).
  All demoted rows stay hash-checked by the degated-parity pytest sweep
  and scripts/driver_mirror.py.
- r13 #12: promoted the round-12 flagships that were mirror-green but
  absent from the frozen 50 (r12 verdict, Next round #1) —
  events_asof_nearest (two-sided nearest as-of, dual carry),
  events_asof_forward (next-event attribution; also added to the bench
  HEADLINE), events_hypertable_rollup (hour→day→month cagg) — over
  dedup_winnow_recall (detector-eval keeps simhash_recall +
  embedding_cell_recall; winnowing keeps dedup_winnow +
  dedup_winnow_indexed), sim_ann_pq (ANN keeps hyperplane/ivf/
  hyperplane_multi gated), and rollup_incremental_merge (the rollup
  family upgrades its slot to the hypertable cagg, which embeds the
  same partial-merge refresh across three granularities).
- r13 #13 (same round, the r11/r12 same-round-promotion precedent):
  promoted the round-13 flagships — events_asof_strict (the strict
  contract judged against DuckDB's NATIVE strict ASOF),
  events_asof_forward_bucketed (shares events_asof_forward's oracle
  VERBATIM: the gate externally proves bucketed == plain == a real
  ASOF engine), rollup_hypertable_incremental +
  rollup_hypertable_compacted (the incremental cagg and its compacted
  log, both sharing events_hypertable_rollup's direct-from-raw oracle
  VERBATIM: fold-of-partials == recompute, and compaction invisible,
  both driver-recorded) — over events_asof_tolerance (the as-of family
  keeps join/nearest/forward/strict/forward_bucketed gated; the
  tolerance report stays mirror + pytest), dedup_substring_rewrite
  (dedup keeps 13 gate rows), quality_psi_drift (quality keeps
  dsir_weights + classifier_lr), and curate_split_leakage (curation
  keeps corpus_scored + ccnet_buckets).
- r14 #14: promoted rollup_hypertable_asof (r13 verdict Next #2 — the
  time-travel × incremental-cagg composition, mirror-green in r13 but
  never driver-recorded), rollup_hypertable_late (out-of-order replay
  through the watermarked ingest sharing the direct-from-raw rollup
  oracle VERBATIM: re-opened-bucket re-folds == one recompute), and
  rollup_hypertable_final (the sealed-prefix finality surface against
  the oracle's own end-≤-watermark filter) — over
  events_hypertable_rollup (its direct-from-raw SQL IS the shared
  oracle that rollup_hypertable_incremental/_late still hash against in
  the gate, so the same SQL keeps multiple driver-recorded plans; the
  base query stays mirror + degated-parity checked),
  events_asof_forward (events_asof_forward_bucketed shares its oracle
  VERBATIM, so the forward contract keeps an externally-recorded hash
  row; as-of keeps join/nearest/strict/forward_bucketed gated), and
  dedup_winnow_indexed (winnowing keeps dedup_winnow gated; the
  index-served twin stays mirror + pytest).
- r15 #15 (r14 verdict Next #1): promoted the round-14 mirror-only trio
  so every round-14 operator has a driver-recorded hash row —
  events_asof_auto (the bucket="auto" plan chooser sharing
  events_asof_join's native-ASOF oracle VERBATIM with the budget forced
  low: the gate judges the BUCKETED branch of the CBO decision),
  rollup_hypertable_gapfill (TimescaleDB-style gapfill+LOCF served from
  the persisted cagg via the engine's own bucketed as-of join), and
  rollup_hypertable_deadletter (on_late='drop' with the kept set stated
  as a constant oracle predicate) — over three rows gate-green since
  rounds 7-9 whose contracts keep externally-checked twins:
  q74_higher_order_fns (dialect battery, green since rotation #4; the
  HOF surface stays mirror + degated-parity checked),
  join_bucketed_colocated (green since rotation #2; the co-located-join
  family keeps q12b_bucketed_range_join gated — a MUST row — and the
  zero-shuffle plan shape stays pinned by tests/test_bucketed_join),
  and q56_tpch_q8 (TPC-H keeps its three join-heaviest shapes gated:
  Q21, Q2, Q5). All demoted rows stay hash-checked by the
  degated-parity pytest sweep and scripts/driver_mirror.py.
- r15 #16 (same round, after the RTBF build): every ROUND-15 operator
  ships with driver-recorded evidence in its own round — promoted
  rollup_hypertable_rtbf (post-deletion serve vs the direct-from-raw
  oracle over the erased corpus), rollup_hypertable_rtbf_audit (the
  seal-audit journal vs the cohort's predicate-derived hours),
  rollup_hypertable_rtbf_final (the audited sealed prefix, revised
  flag derived independently by the oracle), and
  rollup_hypertable_autocompact (the counter-driven compaction cadence
  sharing the rollup oracle VERBATIM) — over four rows whose contracts
  keep externally-checked twins: rollup_hypertable_compacted
  (autocompact judges compaction-invisibility with the SAME verbatim
  oracle over a log the cadence actually reshaped — a strict superset
  of what _compacted proved; _incremental stays gated),
  dedup_prefix_stats (dedup keeps ngram_jaccard / minhash_lsh /
  minhash_indexed / embedding_cosine+cell / simhash_recall / winnow
  gated), dedup_cluster_stats (clustering keeps cc / incremental /
  keep_best / keep_best_incremental gated), and events_asof_strict
  (as-of keeps nearest / forward_bucketed / auto / join gated). All
  demoted rows stay hash-checked by the degated-parity pytest sweep
  and scripts/driver_mirror.py.
"""

from __future__ import annotations

DRIVER_GATE_SIZE = 50

# The 50 names the driver gates on, in registration order — oracle-backed,
# scale-critical first. Changing this list requires a matching gate_swap
# edit in queries/__init__.py in the same commit (pinned by
# tests/test_registry_gate.py::test_driver_gate_set_is_frozen).
FROZEN_GATE = [
    "text_bpe_encode",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "curate_corpus_scored",
    "dedup_minhash_indexed",
    "dedup_embedding_cosine",
    "dedup_embedding_cell",
    "dedup_cluster_cc",
    "dedup_winnow",
    "events_asof_nearest",
    "sim_ann_hyperplane",
    "sim_ann_ivf",
    "agg_salted_two_phase",
    "q12b_bucketed_range_join",
    "q69_tpch_q21",
    "rollup_hypertable_rtbf_final",
    "text_tfidf_topk",
    "q64_tpch_q2",
    "join_cbo_reordered",
    "events_asof_forward_bucketed",
    "curate_ccnet_buckets",
    "events_asof_auto",
    "events_asof_join",
    "rollup_hypertable_rtbf",
    "dedup_simhash_recall",
    "dedup_cluster_incremental",
    "sim_ann_hyperplane_multi",
    "graph_kcore",
    "dedup_cluster_keep_best",
    "layout_zorder",
    "ml_kmeans_lite",
    "q36_pandas_udf",
    "q36_apply_in_pandas",
    "sample_token_budget",
    "quality_dsir_weights",
    "quality_classifier_lr",
    "embedding_mrl_recall",
    "rollup_hypertable_rtbf_audit",
    "q46_tpch_q5",
    "rollup_hypertable_autocompact",
    "dedup_embedding_cell_recall",
    "search_bm25_topk",
    "rollup_hypertable_incremental",
    "rollup_hypertable_late",
    "dedup_keep_best_incremental",
    "rollup_hypertable_final",
    "rollup_hypertable_gapfill",
    "rollup_hypertable_deadletter",
    "merge_cdc_apply",
    "rollup_hypertable_asof",
]

# Queries that MUST keep a driver-recorded correctness row (round-2
# verdict, "Next round" #1): the scale-critical ANN/dedup/tfidf surface
# plus the Python-boundary representatives and the bucketed range join.
#
# q36 representation rationale (round-9, resolving the r7-r8 drift): of
# the six q36 UDF-surface flavors, exactly TWO hold gate slots —
# q36_pandas_udf (the scalar Arrow-batch boundary) and
# q36_apply_in_pandas (the grouped-frame boundary). q36_map_in_pandas
# exercises the same mapInPandas iterator plumbing that
# multimodal/mapInPandas tests already pin; its hash parity stays
# covered by the degated-parity pytest sweep and scripts/driver_mirror.py,
# so it no longer burns a gate slot.
MUST_BE_GATED = frozenset(
    {
        "sim_ann_hyperplane",
        "sim_ann_ivf",
        "text_tfidf_topk",
        "q12b_bucketed_range_join",
        "q36_pandas_udf",
        "q36_apply_in_pandas",
        "dedup_embedding_cosine",
        "dedup_embedding_cell",
        "dedup_minhash_lsh",
        "dedup_cluster_cc",
        "ml_kmeans_lite",
        "agg_salted_two_phase",
    }
)

# Drift is a committed-code bug, not a runtime condition: fail at import.
# Explicit raises, not assert — `python -O` strips asserts, which would
# silently disable exactly the enforcement this module exists to provide.
if len(FROZEN_GATE) != DRIVER_GATE_SIZE:
    raise RuntimeError(
        f"FROZEN_GATE has {len(FROZEN_GATE)} rows, driver gates "
        f"{DRIVER_GATE_SIZE}"
    )
if len(set(FROZEN_GATE)) != DRIVER_GATE_SIZE:
    raise RuntimeError("duplicate gate rows in FROZEN_GATE")
_missing = MUST_BE_GATED - set(FROZEN_GATE)
if _missing:
    raise RuntimeError(
        f"MUST_BE_GATED members outside FROZEN_GATE: {sorted(_missing)} — "
        "amend both in the same commit (this is the r7-r8 drift this "
        "module exists to prevent)"
    )
