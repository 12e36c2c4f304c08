#!/usr/bin/env python
"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
full JSON record {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, ...} followed by a FINAL compact (<1 KB) summary
line, so a bounded tail capture of stdout always ends with parseable
JSON (the round-9 BENCH record was lost when the full line outgrew the
driver's tail window). The full payload is also written to
BENCH_detail.json beside this script.

Each query is executed with a cheap terminal action (count) so the full plan
runs but driver-side materialization cost is excluded. A warmup query runs
first so JVM/codegen startup is not billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from doc2dataset_spark.queries import REGISTRY  # noqa: E402
from doc2dataset_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward shuffle-heavy plans.
HEADLINE = [
    "q01_project_filter",   # scan + pushdown
    "q08_join_chain",       # multi-join + agg
    "q12_range_join",       # non-equi join
    "q14_tpch_q1",          # wide hash aggregate
    "q19_topk",             # agg + TakeOrdered
    "q22_frame_windows",    # window frames
    "q31_sessionize",       # lag + cumsum
    "q32_asof_join",        # range join + window
    # north-star ops
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",      # same oracle, PPJoin prefix+positional blocking
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",   # exact O(n^2), tile-partitioned
    "dedup_embedding_cell",     # sub-quadratic SemDeDup-style cell blocking
    "sim_cosine_topk",
    "sim_ann_hyperplane",
    "q35_term_freq",
    "text_quality_score",
    "text_fingerprint",
    # second-wave scale patterns
    "q12b_bucketed_range_join",  # keyless range join via bucket blocking
    "sim_ann_ivf",               # IVF cells ANN
    "sim_ann_ivf_probe2",        # IVF nprobe=2 (recall knob cost)
    "agg_percentiles",           # exact interpolated percentiles
    "text_tfidf_topk",           # two-shuffle TF-IDF
    "sample_deterministic",      # map-side hash sampling
    "dedup_cluster_cc",          # iterative connected components
    # round-5 training-pipeline ops (agg-shaped: their work survives the
    # bench's count() action; the window-only extras would be pruned away)
    "dedup_boilerplate_spans",   # repeated-span mining (chunk explode + agg)
    "text_repetition_bigram",    # Gopher top-bigram repetition rule
    "curate_corpus",             # composed quality->dedup->pack chain
    "text_logprob_quality",      # unigram-LM quality proxy (freq join)
    "events_funnel",             # ordered 3-stage funnel (chained aggs)
    "retention_cohorts",         # weekly cohort triangle (distinct agg)
    "graph_triangles",           # near-dup graph triangle enumeration
    # round-5 session-3 ops
    "dedup_substring_rewrite",   # chunk-level rewrite dedup (explode+min+rebuild)
    "sim_ann_pq",                # trained product-quantization ADC search
    "agg_count_min",             # relational CMS build + probe
    # round-6 ops
    "sim_ann_pq_rerank",         # ADC retrieve + exact rerank (production search)
    "text_gopher_rules",         # row-local composite quality rules
    "search_bm25_topk",          # pruned-postings BM25 ranking
    # round-7 ops
    "curate_corpus_indexed",     # curation chain served from persisted IVF
    "text_pmi_pairs",            # PMI collocations (TakeOrdered top-k cuts)
    "sim_ann_hyperplane_multi",  # L=4-table OR-amplified LSH
    "search_bm25_indexed",       # BM25 served from the persisted inverted index
    "search_hybrid_rrf",         # lexical+semantic reciprocal-rank fusion
    "q55_tpch_q7",               # 5-way join, disjunctive nation pairs
    "q56_tpch_q8",               # 8-way snowflake, CASE-sum ratio
    "merge_cdc_apply",           # MERGE semantics: anti-join + union
    "rollup_incremental_merge",  # algebraic MV refresh (partial merge)
    "agg_bottomk_sketch",        # KMV sample sketch (TakeOrdered k rows)
    "basket_pair_lift",          # order-blocked pair association
    "events_resample_interp",    # gapless grid + linear interpolation
    "events_ewma",               # bit-exact bounded-horizon EWMA fold
    "join_cbo_reordered",        # ANALYZE-stats CBO join reorder
    "quality_psi_drift",         # per-source PSI drift monitor
    "q74_higher_order_fns",      # SQL lambda folds (row-local codegen)
    # round-7 session-5/6 ops
    "graph_clustering_coef",     # per-node triangle/degree ratio
    "graph_kcore",               # iterative k-core peeling
    "sample_temperature_mix",    # temperature-scaled source resampling
    "text_lm_perplexity",        # bigram-LM perplexity scoring
    "quality_dsir_weights",      # DSIR importance weights (hashed n-grams)
    "quality_classifier_lr",     # in-engine LR training (GD epochs)
    "text_bpe_merges",           # BPE merge training (closed-form rewrite)
    # round-9 ops
    "text_bpe_encode",           # trained-merge apply + per-doc fertility
    "curate_corpus_scored",      # fixed-point model gate + stage audit
    "dedup_minhash_indexed",     # LSH served from persisted band postings
    "dedup_winnow",              # MOSS winnowing fingerprints (2/(W+1) density)
    "curate_corpus_scored_indexed",  # persisted model + IVF warm path
    # round-10 ops
    "dedup_winnow_indexed",      # winnow served from persisted fp postings
    "dedup_simhash_recall",      # detector-eval: SimHash vs exact Jaccard
    "dedup_embedding_cell_recall",  # detector-eval: cell blocking loss
    # round-11 ops
    "dedup_cluster_keep_best",   # full-corpus retention manifest (CC+argmax)
    "curate_ccnet_buckets",      # per-source perplexity terciles + keep
    "embedding_mrl_recall",      # truncated-dim ANN recall vs full-dim
    "ann_pca_recall",            # trained 32-dim compressor vs prefix
    "dedup_keep_best_incremental",  # manifest served from cluster state
    # round-12 ops
    "events_asof_join",          # linear-state AS-OF carry (vs q32's range join)
    "events_asof_tolerance",     # as-of + tolerance attribution report
    "events_asof_nearest",       # two-sided nearest as-of (dual carry)
    "events_asof_forward",       # forward carry (next-event attribution)
    # round-13 ops
    "events_asof_strict",        # allow_exact_matches=False carry
    "events_asof_forward_bucketed",  # two-phase skew-bounded forward carry
    "rollup_hypertable_incremental",  # cagg served from the partial log
    "rollup_hypertable_compacted",    # ...after partial-log compaction
    "rollup_hypertable_asof",         # cagg time travel (prefix fold)
    "layout_zorder",             # Morton layout keys (map-side bit folds)
    "events_hypertable_rollup",  # cagg: hourly partials -> day -> month
    # round-14 ops
    "rollup_hypertable_late",    # watermarked out-of-order partial ingest
    "rollup_hypertable_final",   # sealed-prefix finality serve
    "rollup_hypertable_gapfill", # gapless grid + LOCF via bucketed as-of
    "rollup_hypertable_deadletter",  # drop-mode ingest, kept-set serve
    # round-15 ops
    "rollup_hypertable_rtbf",        # lawful erasure, post-deletion serve
    "rollup_hypertable_rtbf_final",  # audited sealed prefix (revised flag)
    "rollup_hypertable_autocompact", # counter-driven self-tuned compaction
]

RUNS_PER_QUERY = 3  # report min-of-3: steady-state cost, not JIT warmup

# A loaded machine inflates every timing (round 2's driver run measured
# 46 s for code that takes 27 s idle). The bench can't refuse to run — the
# round driver needs a number — so it (a) waits up to SETTLE_MAX_SEC for
# 1-min loadavg to drop below cores/2, and (b) stamps the load it actually
# ran under into the JSON so a contaminated number is self-identifying.
SETTLE_MAX_SEC = 300
SETTLE_POLL_SEC = 10


def _loadavg1() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:  # pragma: no cover - platform without getloadavg
        return 0.0


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — loadavg can't see
    hypervisor throttling, but steal time can: a run with high steal%
    is inflated by the HOST, not by this machine's own load."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(v) for v in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError):  # pragma: no cover - non-linux
        return 0, 0


def _calibrate_cpu() -> float:
    """Seconds for a fixed single-core python loop — a direct measure of
    effective per-core speed at run time (noisy-neighbor detector: this
    container has measured 2.2-3.3 s for the same loop on different
    occasions). Stamped into the JSON so cross-run comparisons can be
    normalized."""
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.time() - t0, 3)


# Clean-floor value of _calibrate_cpu() on an idle container (measured
# 0.33-0.37 s across quiet rounds; BENCH_r08 stamped 0.369 on the run the
# round-8 verdict adjudicated as clean). The per-query calibration samples
# below are divided by this floor to normalize away HOST-phase slowdowns —
# the r07 bench ran +44% slow on identical code and needed a manual
# verdict-time adjudication; with per-query calib stamps the correction is
# mechanical: normalized_total = sum(t_q * CLEAN_CALIB_SEC / calib_q),
# clamped so a calm host (calib <= floor) never deflates a timing.
CLEAN_CALIB_SEC = 0.33


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    if n == 0:
        return 0.0
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _steal_sample(window_sec: float = 5.0) -> float:
    """steal%% over a short sampling window."""
    s0, t0 = _cpu_ticks()
    time.sleep(window_sec)
    s1, t1 = _cpu_ticks()
    if t1 <= t0:
        return 0.0
    return 100.0 * (s1 - s0) / (t1 - t0)


STEAL_GATE_PCT = 4.0  # measured: quiet windows <1%, noisy windows >10%


def _wait_for_idle(threshold: float) -> float:
    """Wait for BOTH low loadavg (our own load) and low steal%% (the
    host's interference — invisible to loadavg but it inflated a
    measured run 2x). Gives up after SETTLE_MAX_SEC either way and
    stamps whatever it ran under into the JSON."""
    waited = 0.0
    load = _loadavg1()
    while load > threshold and waited < SETTLE_MAX_SEC:
        print(
            f"# loadavg {load:.1f} > {threshold:.1f}, waiting for machine to settle",
            file=sys.stderr,
        )
        time.sleep(SETTLE_POLL_SEC)
        waited += SETTLE_POLL_SEC
        load = _loadavg1()
    while waited < SETTLE_MAX_SEC:
        steal = _steal_sample()
        if steal <= STEAL_GATE_PCT:
            break
        print(
            f"# host steal {steal:.1f}% > {STEAL_GATE_PCT}%, waiting for a quiet window",
            file=sys.stderr,
        )
        time.sleep(SETTLE_POLL_SEC)
        waited += SETTLE_POLL_SEC + 5
    return _loadavg1()


def fill_compact_queries(
    compact: dict, timings: dict[str, float], budget: int = 999
) -> None:
    """Per-query visibility (round-15 verdict, What's wrong #2): the full
    "queries" map (~3 KB at 94 queries) outgrows the driver's stdout
    tail window, so PERF_r15 recorded per_query:{} and an empty scaling
    block. Put the most expensive per-query raw walls INTO the final
    compact line, as many as fit while the line stays under the 1 KB
    contract — the cheap rows it drops are the job-floor ones whose
    round-over-round deltas are noise anyway; the full map is always in
    the detail file."""
    shown: dict[str, float] = {}
    for q, t in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
        trial = dict(compact)
        trial["queries"] = {**shown, q: t}
        trial["queries_shown"] = len(shown) + 1
        if len(json.dumps(trial)) > budget:
            break
        shown[q] = t
    compact["queries"] = shown
    compact["queries_shown"] = len(shown)


def main() -> None:
    host_cores = os.cpu_count() or 1
    # the EFFECTIVE core count: the driver also runs the bench at a lower
    # SPARK_GRAFT_CPUS to measure scaling, and the r15 detail stamped
    # os.cpu_count() for an 8-core run — stamp what Spark actually used
    try:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "") or host_cores)
    except ValueError:
        cores = host_cores
    contention_threshold = host_cores / 2
    # settle harder than the contention flag: even loadavg ~2-4 from
    # just-exited work inflates the first queries by 3-4x (measured:
    # q01 0.62s at loadavg 2.1 vs 0.14s idle); the flag threshold
    # (cores/2) only marks the run as untrustworthy. Round-5's BENCH ran
    # at loadavg 1.95 under the old cores/16=2.0 gate and still needed a
    # ±25% caveat — require a genuinely idle (<1) machine before timing.
    settle_threshold = 0.9
    load_start = _wait_for_idle(settle_threshold)
    steal0, total0 = _cpu_ticks()
    cpu_cal = _calibrate_cpu()

    spark = get_spark(app_name="bench")
    # warmup: JVM + parquet footer reads
    load_table(spark, SF_DIR, "lineitem").count()

    timings: dict[str, float] = {}
    calibs: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        # interleaved single-core probe: a host-phase slowdown that hits
        # only part of the run is visible per-query, not just as one
        # whole-run scalar (the r07-vs-r08 adjudication gap)
        calibs[name] = _calibrate_cpu()
        best, n = float("inf"), 0
        for _ in range(RUNS_PER_QUERY):
            t0 = time.time()
            n = spec.builder(spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(
            f"# {name}: {timings[name]}s ({n} rows, calib {calibs[name]}s)",
            file=sys.stderr,
        )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    load_end = _loadavg1()
    steal1, total1 = _cpu_ticks()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / max(total1 - total0, 1), 2)
        if total1 > total0
        else 0.0
    )
    # loadavg includes this bench's own Spark threads once it starts, so
    # only load_start is a clean contention signal; load_end is context.
    contended = load_start > contention_threshold
    if contended:
        print(
            f"# WARNING: started under load (loadavg {load_start:.1f} > "
            f"{contention_threshold:.1f}); timings are inflated",
            file=sys.stderr,
        )
    # Normalization: scale each query by its own calibration sample vs the
    # clean floor (ratio clamped at 1.0 from below — a fast probe must not
    # deflate a timing), so a host phase that slowed only part of the run
    # is corrected per-query. The session median is stamped too: if
    # median_calib ≈ CLEAN_CALIB_SEC the normalized and raw totals agree
    # and the run needs no adjudication.
    median_calib = _median(list(calibs.values()))
    normalized = {
        q: round(t * CLEAN_CALIB_SEC / max(calibs[q], CLEAN_CALIB_SEC), 3)
        for q, t in timings.items()
    }
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # host-phase-corrected view (see CLEAN_CALIB_SEC comment):
        # compare normalized_total across rounds, raw value within
        # a round
        "normalized_total": round(sum(normalized.values()), 3),
        "queries_normalized": normalized,
        "query_calib_sec": calibs,
        "median_calib_sec": round(median_calib, 3),
        "clean_calib_sec": CLEAN_CALIB_SEC,
        "sf": sf_val,
        "runs_per_query": RUNS_PER_QUERY,
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(load_end, 2),
        "cores": cores,
        "host_cores": host_cores,
        "contended": contended,
        # host-side interference markers (loadavg-invisible):
        # steal% during the run + a fixed single-core calibration
        # loop time measured just before Spark starts
        "steal_pct": steal_pct,
        "cpu_calibration_sec": cpu_cal,
    }
    # Output contract (round-9 verdict, What's wrong #1): the full payload
    # grew past the driver's stdout tail-capture window once per-query
    # calibration landed (68 queries x 3 maps), so BENCH_r09.json recorded
    # parsed:null. The full record goes to a detail file + one human
    # line; the LAST stdout line is a compact (<1 KB) summary so any tail
    # window ends with parseable JSON.
    #
    # History contract (round-12 verdict, What's wrong #1): a single
    # BENCH_detail.json overwritten every run destroyed prior rounds'
    # per-query walls, and bench_compare.py resolved BOTH of its arguments
    # to that one file — a perfect self-comparison. The detail file is now
    # ROUND-STAMPED (BENCH_detail_r{N}.json, N inferred as 1 + the highest
    # committed BENCH_r*.json, since the driver lands BENCH_r{N}.json only
    # at round close) and the compact summary names the stamped file.
    # The unstamped BENCH_detail.json is still written as a latest-run
    # convenience pointer for humans; comparisons must use stamped files.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    import re as _re

    rounds = [
        int(m.group(1))
        for f in os.listdir(repo_dir)
        if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    # collision-proofing (round-15 verdict, What's wrong #3): a
    # reduced-core scaling run gets its own _c{N} suffix so it can never
    # shadow the round's main-core detail file
    suffix = "" if cores == host_cores else f"_c{cores}"
    detail_name = (
        f"BENCH_detail_r{(max(rounds) + 1) if rounds else 0:02d}{suffix}.json"
    )
    detail_written = detail_name
    try:
        with open(os.path.join(repo_dir, detail_name), "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
        with open(os.path.join(repo_dir, "BENCH_detail.json"), "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError as exc:  # read-only checkout: keep benching
        print(f"# {detail_name} not written: {exc}", file=sys.stderr)
        detail_written = None
    print(json.dumps(full))
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "normalized_total": full["normalized_total"],
        "median_calib_sec": full["median_calib_sec"],
        "clean_calib_sec": CLEAN_CALIB_SEC,
        "sf": sf_val,
        "n_queries": len(timings),
        "loadavg_start": full["loadavg_start"],
        "steal_pct": steal_pct,
        "contended": contended,
        "cores": cores,
        "detail": detail_written,
    }
    fill_compact_queries(compact, timings)
    line = json.dumps(compact)
    if len(line) > 1000:  # pragma: no cover - contract guard
        line = json.dumps({k: compact[k] for k in
                           ("metric", "value", "normalized_total",
                            "median_calib_sec", "sf", "n_queries")})
    print(line)


if __name__ == "__main__":
    main()
