"""Triangle counting: hand-built-graph exactness and the handshake
identities that hold for ANY graph (the oracle hash pins the corpus
values; these pin the math)."""

from __future__ import annotations

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.queries.graph_extras import triangles_of


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["da", "db"])
    return {r.doc_id: (r.deg, r.tri, r.lcc) for r in triangles_of(df).collect()}


def test_k4_every_node_fully_clustered(spark):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = _run(spark, k4)
    assert got == {n: (3, 3, 1.0) for n in (1, 2, 3, 4)}


def test_path_graph_has_no_triangles(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 4)])
    assert {n: t for n, (_, t, _) in got.items()} == {1: 0, 2: 0, 3: 0, 4: 0}
    assert all(l == 0.0 for (_, _, l) in got.values())


def test_bowtie_counts_each_corner(spark):
    # two triangles sharing node 3: corners 1,2,4,5 → 1 triangle each,
    # node 3 → 2 triangles, deg 4, lcc = 2*2/(4*3) = 0.3333
    bow = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
    got = _run(spark, bow)
    assert got[3] == (4, 2, 0.3333)
    for n in (1, 2, 4, 5):
        assert got[n] == (2, 1, 1.0)


def test_handshake_identities_on_corpus(spark, sf_dir):
    rows = REGISTRY["graph_clustering_coef"].builder(spark, sf_dir).collect()
    assert rows
    # Σ per-node triangle counts = 3 × (number of distinct triangles)
    assert sum(r.tri for r in rows) % 3 == 0
    for r in rows:
        assert 0 <= r.tri <= r.deg * (r.deg - 1) // 2  # tri ≤ C(deg, 2)
        assert 0.0 <= r.lcc <= 1.0
        if r.deg < 2:
            assert r.tri == 0 and r.lcc == 0.0


def test_kcore_toy_graphs(spark):
    from doc2dataset_spark.queries.graph_extras import kcore_of

    # K4 with a pendant node: the K4 is a 3-core, the pendant is peeled
    # (and its removal must not drag any K4 node out)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, ["da", "db"])
    got = {r.doc_id: r.in_core for r in kcore_of(df).collect()}
    assert got == {1: True, 2: True, 3: True, 4: True, 5: False}
    # bowtie: every node's within-subgraph degree collapses below 3 —
    # cascade must empty the core entirely (corners first, center next)
    bow = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)], ["da", "db"]
    )
    got = {r.doc_id: r.in_core for r in kcore_of(bow).collect()}
    assert got == {n: False for n in (1, 2, 3, 4, 5)}


def test_kcore_fixture_matches_unrolled_oracle_depth(spark, sf_dir):
    """oracle-parity pin: the Spark side peels to the survivor-count
    fixpoint, the SQL oracle is a static KCORE_ROUNDS-unrolled CTE chain
    — they agree iff the fixture converges within KCORE_ROUNDS (rounds
    past convergence are no-ops). Assert fixpoint == unrolled at the
    oracle's exact depth, so an oracle-depth shortfall fails HERE before
    it fails as a driver hash mismatch."""
    from doc2dataset_spark.queries.dedup import dedup_simhash_pairs
    from doc2dataset_spark.queries.graph_extras import (
        KCORE_ROUNDS,
        kcore_convergence_depth,
        kcore_of,
    )

    p = dedup_simhash_pairs(spark, sf_dir).select("da", "db").localCheckpoint(eager=True)
    # measure the fixture's actual cascade depth FIRST: a fixture that
    # peels deeper than the oracle's static unroll must fail with an
    # instruction, not as an opaque set mismatch (or worse, a driver
    # hash mismatch at the next round)
    depth = kcore_convergence_depth(p)
    assert depth <= KCORE_ROUNDS, (
        f"fixture peels for {depth} rounds but the SQL oracle unrolls "
        f"only {KCORE_ROUNDS} — raise KCORE_ROUNDS in "
        f"queries/graph_extras.py to at least {depth} (the unrolled "
        f"CTE chain is a no-op past convergence, so raising it is "
        f"always safe; AS MATERIALIZED keeps the oracle linear)"
    )
    a = {(r.doc_id, r.in_core) for r in kcore_of(p).collect()}
    b = {
        (r.doc_id, r.in_core)
        for r in kcore_of(p, rounds=KCORE_ROUNDS).collect()
    }
    assert a == b
    assert any(c for _, c in a) and not all(c for _, c in a)


def test_kcore_deep_cascade_needs_more_than_six_rounds(spark):
    """the round-7/8 hazard, reproduced and fixed: a K5 core with an
    8-link removal cascade (c1 deg-2, c2..c8 each deg-3 hanging on the
    previous link) peels one chain node per round — 8 rounds to the true
    3-core. The old fixed-6 unroll returns a SUPERSET (c7, c8 kept); the
    convergence-probed default gets exactly the K5."""
    from doc2dataset_spark.queries.graph_extras import kcore_of

    k5 = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    # c_i = i (1..8); c1: {c2, K5}; c_i: {c_{i-1}, c_{i+1}, K5};
    # c8: {c7, K5, K5} — every chain node deg-3 except c1 (deg-2)
    chain = [(1, 2), (1, 100)]
    for i in range(2, 8):
        chain += [(i, i + 1), (i, 100 + (i % 5))]
    chain += [(8, 101), (8, 102)]
    df = spark.createDataFrame(k5 + chain, ["da", "db"])

    fixed6 = {r.doc_id: r.in_core for r in kcore_of(df, rounds=6).collect()}
    assert fixed6[7] and fixed6[8], "cascade too shallow to exercise the hazard"

    got = {r.doc_id: r.in_core for r in kcore_of(df).collect()}
    assert got == {**{100 + i: True for i in range(5)},
                   **{i: False for i in range(1, 9)}}
