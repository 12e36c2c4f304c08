"""The round-16 cc_labels_from_pairs rewrite (alternating
large-star/small-star) — pins the internals the oracle rows can't see:
the exact star-forest convergence test and the label fixpoint on
adversarial small graphs (chains, merged components, self-pairs,
duplicate and reversed duplicate edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.dedup import (
    _is_min_star_forest,
    cc_labels_from_pairs,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "da bigint, db bigint")


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def _labels(spark, rows):
    df = cc_labels_from_pairs(_pairs(spark, rows))
    return sorted(tuple(r) for r in df.collect())


def _expected(rows):
    """Brute-force union-find over the pair list."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in parent)


def test_chain_and_two_components(spark):
    # a 6-node chain with ids deliberately out of order + a separate pair
    rows = [(40, 30), (30, 50), (50, 10), (10, 60), (60, 20), (80, 70)]
    assert _labels(spark, rows) == _expected(rows)


def test_duplicate_and_reversed_pairs(spark):
    rows = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2)]
    assert _labels(spark, rows) == [(1, 1), (2, 1), (3, 1)]


def test_self_pair_is_singleton(spark):
    # a self-pair contributes its node to the universe but no edge
    rows = [(5, 5), (7, 8)]
    assert _labels(spark, rows) == [(5, 5), (7, 7), (8, 7)]


def test_star_merge_through_center(spark):
    # two stars bridged by one edge: fixpoint must relabel the whole lot
    rows = [(10, 2), (11, 2), (12, 2), (20, 4), (21, 4), (22, 4), (12, 20)]
    assert _labels(spark, rows) == _expected(rows)


def test_empty_pairs(spark):
    assert _labels(spark, []) == []


def test_min_star_forest_accepts_star(spark):
    assert _is_min_star_forest(
        _edges(spark, [(2, 1), (3, 1), (9, 7), (8, 7)])
    )


def test_min_star_forest_rejects_chain(spark):
    # 3 -> 2 -> 1: node 2 is both a src and a dst
    assert not _is_min_star_forest(_edges(spark, [(3, 2), (2, 1)]))


def test_min_star_forest_rejects_multi_edge_src(spark):
    # src 3 still carries two edges: not yet a star forest
    assert not _is_min_star_forest(_edges(spark, [(3, 1), (3, 2), (2, 1)]))


def test_min_star_forest_accepts_empty(spark):
    assert _is_min_star_forest(
        _edges(spark, []).filter(F.col("src") > 0)
    )
