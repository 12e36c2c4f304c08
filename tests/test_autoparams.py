"""Blocking-parameter scaling rules (operators/autoparams.py): pin the
shipped knees, the growth shapes, and — through the real
cell_assignments plan at two shipped SFs — the occupancy/candidate-work
invariants the rules exist to maintain."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from doc2dataset_spark.operators.autoparams import (
    ivf_cells,
    lsh_planes,
    minhash_bands_rows,
)
from doc2dataset_spark.queries.dedup import cell_assignments


def test_lsh_planes_reproduces_shipped_knee():
    # BASELINE.md round-7 sweep: 5 planes at the n=2000 fixture with
    # 64-row target buckets — the rule must DERIVE the shipped value
    assert lsh_planes(2000) == 5
    # log-growth: +1 plane per corpus doubling, never fewer on more data
    for n in (100, 1000, 10_000, 1_000_000):
        assert lsh_planes(2 * n) in (lsh_planes(n), lsh_planes(n) + 1)
        assert lsh_planes(2 * n) >= lsh_planes(n)
    # expected occupancy n / 2^planes stays within [32, 128] band (x2 of
    # the 64 target) once n is past the floor
    for n in (1000, 10_000, 100_000, 10_000_000):
        occ = n / 2 ** lsh_planes(n)
        assert 32 <= occ <= 128, (n, occ)


def test_ivf_cells_sqrt_rule():
    assert ivf_cells(0) == 1
    assert ivf_cells(10_000) == 100
    # √ shape: 100x data -> 10x cells; within-cell pair work n²/cells
    # grows as n^1.5 (the documented SemDeDup bound)
    for n in (100, 10_000, 1_000_000):
        assert ivf_cells(100 * n) == 10 * ivf_cells(n)
        pair_work = n * n / ivf_cells(n)
        assert pair_work <= 1.5 * n ** 1.5


def test_minhash_bands_rows_scurve():
    b, r = minhash_bands_rows(500)
    assert b >= 1 and r >= 2
    # threshold re-pinned: t = (1/b)^(1/r) stays near the requested 0.7
    t = (1 / b) ** (1 / r)
    assert 0.55 <= t <= 0.85
    # rows grow logarithmically: candidates stay linear at any n
    _, r_small = minhash_bands_rows(1_000)
    _, r_big = minhash_bands_rows(1_000_000_000)
    assert r_small < r_big <= r_small + 7
    # background-collision bound the rule enforces: n * bg^r <= ~1
    for n in (1_000, 1_000_000, 1_000_000_000):
        _, r = minhash_bands_rows(n)
        assert (n / 2) * 0.1 ** r <= 1.5, (n, r)


def test_cell_assignments_autoparam_two_sf_occupancy(spark):
    """Drive the REAL assignment plan with rule-derived cells at the two
    shipped embedding sizes (500 and 2000 vectors): cell count, mean
    occupancy, and within-cell candidate-pair work must all track the
    √n rule — the two-SF invariance the round-8 verdict asked for."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        nvec = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        )
        cells = ivf_cells(nvec)
        occ = (
            cell_assignments(spark, sf_dir, cells=cells)
            .groupBy("cent_id")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        used = len(occ)
        assert used <= cells
        assert used >= cells // 2  # seeds actually spread the corpus
        mean_occ = nvec / used
        # occupancy ≈ √n within a 4x band (seed centroids, not k-means)
        assert math.sqrt(nvec) / 4 <= mean_occ <= 4 * math.sqrt(nvec), (
            sf_dir,
            used,
            mean_occ,
        )
        pair_work = sum(c.c * (c.c - 1) / 2 for c in occ)
        assert pair_work <= 2 * nvec ** 1.5, (sf_dir, pair_work)


# ---------------------------------------------------------------------------
# round-10: the rules wired INTO the index builders (params="auto") must
# hold the recall floors at two shipped corpus sizes — deterministic
# fixtures + seeded hashes, so the floors are tight pins, not tolerances
# ---------------------------------------------------------------------------
def _exact_top3(n):
    """brute-force cosine top-3 per vector: {qid: {cid, ...}}."""
    from pyspark.sql import Window as W

    from doc2dataset_spark.queries.dedup import spark_dot

    a, b = n.alias("a"), n.alias("b")
    sc = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("qid"),
        F.col("b.vec_id").alias("cid"),
        spark_dot(F.col("a.ne"), F.col("b.ne")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    t: dict = {}
    for row in (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    ):
        t.setdefault(row.qid, set()).add(row.cid)
    return t


def _recall(got: dict, truth: dict) -> float:
    hit = sum(len(got.get(q, set()) & v) for q, v in truth.items())
    return hit / sum(len(v) for v in truth.values())


def test_auto_minhash_index_holds_recall_floor(spark, tmp_path):
    """build_minhash_index(params='auto') at two corpus sizes: the
    S-curve-derived banding ((3,3) at n=500; (4,4)=shipped at n=5000)
    must lose NO true pair — verified recall 1.0 against the exact
    shingle-Jaccard ground truth, equal to the shipped banding's
    (measured: both bandings capture all 28/25/256 fixture pairs)."""
    from doc2dataset_spark.operators.minhash_index import (
        build_minhash_index,
        candidates_from_index,
    )
    from doc2dataset_spark.queries.dedup import (
        dedup_ngram_jaccard,
        minhash_verify,
    )

    for i, sf_dir in enumerate(
        ("/root/testdata/sf0.001", "/root/testdata/sf0.1")
    ):
        idx = str(tmp_path / f"auto_mh_{i}")
        build_minhash_index(spark, sf_dir, idx, params="auto")
        got = {
            (r.da, r.db)
            for r in minhash_verify(
                spark, sf_dir, candidates_from_index(spark, idx)
            )
            .select("da", "db")
            .collect()
        }
        exact = {
            (r.da, r.db)
            for r in dedup_ngram_jaccard(spark, sf_dir)
            .select("da", "db")
            .collect()
        }
        assert exact and got == exact, (sf_dir, len(got), len(exact))


def test_auto_ivf_index_holds_recall_floor(spark, tmp_path):
    """build_ivf_index(n_centroids='auto') at two embedding sizes (500
    -> 22 cells, 2000 -> 45): the √n rule trades per-probe scan size
    (n/√n rows instead of n/16) for recall that nprobe buys back —
    floors pinned at the measured values minus a hair (deterministic
    seed centroids): r@3 >= 0.28/0.20 at nprobe=2, and nprobe
    monotonicity holds."""
    from doc2dataset_spark.operators.vector_index import (
        build_ivf_index,
        probe_ivf_index,
    )
    from doc2dataset_spark.queries.dedup import normalized_embeddings

    floors = {
        "/root/testdata/sf0.01": 0.28,
        "/root/testdata/sf0.1": 0.20,
    }
    for i, (sf_dir, floor) in enumerate(floors.items()):
        n = normalized_embeddings(spark, sf_dir).cache()
        truth = _exact_top3(n)
        idx = str(tmp_path / f"auto_ivf_{i}")
        build_ivf_index(spark, sf_dir, idx, n_centroids="auto")
        cents = spark.read.parquet(f"{idx}/centroids").count()
        assert cents == ivf_cells(n.count())
        q = n.select(F.col("vec_id").alias("qid"), F.col("ne").alias("qne"))
        recs = {}
        for nprobe in (1, 2):
            got: dict = {}
            for row in probe_ivf_index(
                spark, idx, q, nprobe=nprobe, topk=3
            ).collect():
                got.setdefault(row.qid, set()).add(row.cid)
            recs[nprobe] = _recall(got, truth)
        assert recs[2] >= floor, (sf_dir, recs)
        assert recs[2] >= recs[1], (sf_dir, recs)


def test_auto_multilsh_holds_recall_floor(spark):
    """make_multi_planes(lsh_planes(n)) at two embedding sizes (500 ->
    3 planes, 2000 -> 5 = the shipped knee): candidate top-3 recall
    floors at the measured values (0.63 / 0.33), and candidates per
    query stay bucket-bounded (the linearity the plane rule exists to
    keep)."""
    from pyspark.sql import Window as W

    from doc2dataset_spark.queries.ann_multilsh import (
        _multi_candidates,
        make_multi_planes,
    )
    from doc2dataset_spark.queries.dedup import normalized_embeddings

    floors = {
        "/root/testdata/sf0.01": 0.60,
        "/root/testdata/sf0.1": 0.30,
    }
    for sf_dir, floor in floors.items():
        n = normalized_embeddings(spark, sf_dir).cache()
        truth = _exact_top3(n)
        nv = n.count()
        cand = _multi_candidates(
            spark, sf_dir, planes=make_multi_planes(lsh_planes(nv))
        )
        assert cand.count() / nv <= 1000  # bounded candidate fan-out
        w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
        got: dict = {}
        for row in (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .collect()
        ):
            got.setdefault(row.qid, set()).add(row.cid)
        assert _recall(got, truth) >= floor, sf_dir
