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
