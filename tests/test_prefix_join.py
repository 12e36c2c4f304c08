"""Prefix-filtered similarity join (AllPairs/PPJoin): physical-rewrite
equality, filter soundness orderings, and the completeness edge cases
the pigeonhole argument rests on.

Hash-level correctness is driver/mirror territory (dedup_jaccard_prefix
shares dedup_ngram_jaccard's oracle literally; dedup_prefix_stats has
its own); these tests pin what the oracle can't see — that the prefix
index, length filter, and positional filter never DROP a true pair on
corpora engineered to sit on the filter boundaries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.queries.prefix_join import (
    _pos_ok,
    _prefix_candidates,
    _prefix_frame,
)


def test_prefix_join_equals_blocked_join(spark, sf_dir):
    """The prefix-filtered join is a pure physical rewrite: same pairs,
    same jaccard values, as the shared-shingle blocked join."""
    a = {
        (r.da, r.db): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard"].builder(spark, sf_dir).collect()
    }
    b = {
        (r.da, r.db): r.jaccard
        for r in REGISTRY["dedup_jaccard_prefix"].builder(spark, sf_dir).collect()
    }
    assert a == b and a


def test_stats_orderings(spark, sf_dir):
    """cand_pos ≤ cand_prefix ≤ cand_block, and no filter chain can
    reach below the true pair count (completeness)."""
    row = REGISTRY["dedup_prefix_stats"].builder(spark, sf_dir).collect()[0]
    assert row.true_pairs <= row.cand_pos <= row.cand_prefix <= row.cand_block
    # the filters actually bite on this corpus (non-vacuous test)
    assert row.cand_pos < row.cand_block


def _pairs_from(spark, docs):
    """run the prefix pipeline on an in-memory (doc_id, text) frame by
    monkeypatching nothing: write through a temp view is unnecessary —
    _prefix_frame only needs load_table, so drive the helpers directly
    on hand-built frames mirroring its internals."""
    from doc2dataset_spark.queries.dedup import shingles_of

    sd = shingles_of(docs)
    cnt = sd.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = sd.groupBy("sh").agg(F.count("*").alias("df"))
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.partitionBy("doc_id").orderBy("df", "sh"))
    ranked = sd.join(dfreq, "sh").select("doc_id", "sh", rk.alias("r"))
    pref = (
        ranked.join(cnt, "doc_id")
        .filter(F.col("r") <= F.col("n") - F.expr("(n + 1) DIV 2") + 1)
        .select("doc_id", "sh", "n", "r")
    )
    cand = _prefix_candidates(pref).filter(_pos_ok())
    sets_ = sd.groupBy("doc_id").agg(F.collect_set("sh").alias("shs"))
    pairs = (
        cand.join(
            sets_.select(F.col("doc_id").alias("da"), F.col("shs").alias("sa")),
            "da",
        )
        .join(
            sets_.select(F.col("doc_id").alias("db"), F.col("shs").alias("sb")),
            "db",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .filter(
            F.col("inter") * 2 >= F.col("na") + F.col("nb") - F.col("inter")
        )
    )
    return {(r.da, r.db) for r in pairs.collect()}


def test_boundary_completeness_tiny_docs(spark):
    """Docs at the filter boundaries: identical docs (J=1), docs at
    exactly J=1/2, a single-shingle doc (prefix size 1), and a pair
    whose only shared shingle is each doc's LAST prefix element — the
    positional filter's tightest legal case."""
    rows = [
        # J = 1: identical 3-shingle docs (5 tokens)
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        # single-shingle docs, identical → J = 1; prefix must index it
        (3, "zeta eta theta"),
        (4, "zeta eta theta"),
        # J exactly 1/2: A = {s1, s2}, B = {s2, s3} shares 1 of 3?
        # that's 1/3 < 1/2 — instead 2 shared of 4 total: A has
        # shingles {x y z, y z w}, B has {x y z, y z w, z w v, w v u}
        # → inter 2, union 4, J = 1/2 exactly (kept, boundary)
        (5, "x y z w"),
        (6, "x y z w v u"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _pairs_from(spark, docs)
    assert (1, 2) in got
    assert (3, 4) in got
    assert (5, 6) in got  # exact-threshold pair survives every filter
    assert all(da < db for da, db in got)


def test_positional_filter_prunes_impossible_pair(spark):
    """Docs 1 and 2 share exactly one shingle ("common link here"),
    engineered (via filler twins raising every other shingle's df) to
    sit at rank 3 of both 3-element prefixes: the candidate IS generated
    by the prefix index, then the positional filter alone proves
    |A∩B| ≤ 1 + min(5−3, 5−3) = 3 < ceil(10/3) = 4 and prunes it before
    verification — while the genuinely identical twin pairs survive."""
    rows = [
        (1, "common link here aa bb cc dd"),
        (2, "common link here ee ff gg hh"),
        (3, "aa bb cc dd"),
        (4, "aa bb cc dd"),
        (5, "ee ff gg hh"),
        (6, "ee ff gg hh"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    from doc2dataset_spark.queries.dedup import shingles_of
    from pyspark.sql import Window as W

    sd = shingles_of(docs)
    cnt = sd.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = sd.groupBy("sh").agg(F.count("*").alias("df"))
    rk = F.row_number().over(W.partitionBy("doc_id").orderBy("df", "sh"))
    pref = (
        sd.join(dfreq, "sh")
        .select("doc_id", "sh", rk.alias("r"))
        .join(cnt, "doc_id")
        .filter(F.col("r") <= F.col("n") - F.expr("(n + 1) DIV 2") + 1)
        .select("doc_id", "sh", "n", "r")
    )
    cand = _prefix_candidates(pref)
    pre = {(r.da, r.db) for r in cand.collect()}
    post = {(r.da, r.db) for r in cand.filter(_pos_ok()).collect()}
    assert (1, 2) in pre  # prefix index generated the candidate
    assert (1, 2) not in post  # positional filter proved it impossible
    # the real near-dup pairs are untouched by the filter
    assert {(3, 4), (5, 6)} <= post
    # and end-to-end output is exactly the twin pairs
    assert _pairs_from(spark, docs) == {(3, 4), (5, 6)}


def test_plan_no_cartesian_and_partitioned_window(spark, sf_dir):
    """the candidate join is an equi-join on the prefix shingle (never
    cartesian) and the rank window is partitioned by doc_id."""
    plan = (
        REGISTRY["dedup_jaccard_prefix"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
