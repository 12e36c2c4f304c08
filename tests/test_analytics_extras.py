"""Invariant tests for the event-analytics extras; value equality is
oracle-gated, these pin the semantic claims (ordering, monotonicity)."""

from __future__ import annotations

from collections import defaultdict

from doc2dataset_spark.queries import REGISTRY


def test_funnel_stage_order_is_strict(spark, sf_dir):
    rows = REGISTRY["events_funnel"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.stages_reached in (1, 2, 3)
        # stage presence matches the count, and timestamps are ordered
        assert (r.click_ts is not None) == (r.stages_reached >= 2)
        assert (r.purchase_ts is not None) == (r.stages_reached == 3)
        # strict ordering holds at microsecond precision (oracle-checked);
        # the formatted strings are second-truncated, so same-second
        # transitions legitimately compare equal here
        if r.click_ts is not None:
            assert r.click_ts >= r.view_ts
        if r.purchase_ts is not None:
            assert r.purchase_ts >= r.click_ts
    # the funnel narrows (weakly) at every stage
    n1 = len(rows)
    n2 = sum(1 for r in rows if r.stages_reached >= 2)
    n3 = sum(1 for r in rows if r.stages_reached == 3)
    assert n1 >= n2 >= n3 >= 0


def test_retention_cohorts_shape(spark, sf_dir):
    rows = REGISTRY["retention_cohorts"].builder(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(dict)
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        # nobody is active before their cohort week
        assert r.active_week >= r.cohort_week
        by_cohort[r.cohort_week][r.active_week] = r
    for cohort, weeks in by_cohort.items():
        # the cohort's own week retains (close to) everyone: every user is
        # active in the week of their first event by construction
        assert weeks[cohort].retention == 1.0


def test_logprob_quality_orders_rarity(spark, sf_dir):
    from collections import Counter

    from doc2dataset_spark.session import load_table

    rows = REGISTRY["text_logprob_quality"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mean_nll > 0.0
        assert r.n_tokens > 0
    # the advertised semantics: rare-token documents score HIGHER. Compute
    # each doc's average corpus token frequency independently and check the
    # extremes of mean_nll land on the right side of each other.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {d.doc_id: [t for t in d.text.lower().split() if t] for d in docs}
    freq = Counter(t for ts in toks.values() for t in ts)
    avg_freq = {
        did: sum(freq[t] for t in ts) / len(ts) for did, ts in toks.items() if ts
    }
    by_nll = sorted(rows, key=lambda r: r.mean_nll)
    rarest, commonest = by_nll[-1], by_nll[0]
    assert avg_freq[rarest.doc_id] < avg_freq[commonest.doc_id]


def test_triangles_are_real_and_ordered(spark, sf_dir):
    tris = REGISTRY["graph_triangles"].builder(spark, sf_dir).collect()
    assert tris  # smoke graph has hundreds of triangles; empty = broken join
    edges = {
        (r.da, r.db)
        for r in REGISTRY["dedup_simhash_pairs"].builder(spark, sf_dir).collect()
    }
    for t in tris:
        assert t.x < t.y < t.z  # canonical orientation: each triangle once
        assert (t.x, t.y) in edges
        assert (t.y, t.z) in edges
        assert (t.x, t.z) in edges
    assert len(tris) == len({(t.x, t.y, t.z) for t in tris})


def test_dup_chunk_fraction_bounds(spark, sf_dir):
    rows = REGISTRY["text_dup_chunk_fraction"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_chunks <= r.n_chunks
        assert r.dup_chunks != 1  # a duplicated chunk contributes >= 2
        assert 0.0 <= r.dup_fraction <= 1.0


def test_sliding_counts_cover_each_event_twice(spark, sf_dir):
    from doc2dataset_spark.session import load_table

    rows = REGISTRY["events_sliding_counts"].builder(spark, sf_dir).collect()
    total_events = load_table(spark, sf_dir, "events").count()
    # width/slide = 2 windows per event, conserved exactly
    assert sum(r.n for r in rows) == 2 * total_events


def test_anomaly_robust_flags_only_tail(spark, sf_dir):
    from doc2dataset_spark.queries.analytics_extras import MAD_K
    from doc2dataset_spark.session import load_table

    rows = REGISTRY["events_anomaly_robust"].builder(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    # a MAD_K=3.5 cutoff flags a small tail, never the bulk
    assert 0 < len(rows) < total * 0.25
    for r in rows:
        # the filter uses the unrounded score; rounding to 4dp can land
        # exactly on the threshold, and MAD=0 fallback rows carry NULL
        assert r.mad_score is None or r.mad_score >= MAD_K


def test_minhash_estimate_tracks_truth(spark, sf_dir):
    rows = REGISTRY["dedup_minhash_estimate"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        # jaccard == 0 is legal: a pure-false-positive band collision
        assert 0.0 <= r.jaccard <= 1.0
    # unbiased-sketch sanity on LSH candidates: estimate correlates with
    # truth — the mean absolute estimation error stays inside the
    # 16-permutation sketch's standard error band (~1/sqrt(16) = 0.25)
    mae = sum(abs(r.est_jaccard - r.jaccard) for r in rows) / len(rows)
    assert mae < 0.25, mae
