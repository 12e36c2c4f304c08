"""Corpus-size-driven blocking parameters (round-8 verdict, Next round #8).

The shipped dedup/ANN queries pin fixture-tuned constants — 16
IVF/SemDeDup cells, 4 bands x 4 rows MinHash, 5 hyperplanes x 4 LSH
tables — because their DuckDB oracle SQL bakes the same numbers and the
driver hash-compares both sides. Those constants are the CORRECTNESS
anchor, not the scale story. This module encodes the scaling rules the
benchmarks derived (BASELINE.md: "planes scale ~log2(n/occupancy)",
"cells ≈ √n", the MMDS b/r S-curve), so a deployment at another corpus
size computes its parameters instead of inheriting the fixture's:

- ``ivf_cells(n)``            cells ≈ √n: the unique point where the
                              broadcast centroid table (cells rows) and
                              the per-cell scan (n/cells rows) grow at
                              the same √n rate; within-cell pair work is
                              then Σ cells·(n/cells)² = n^1.5 — the
                              documented sub-quadratic SemDeDup bound.
                              (The fixture's 16 is the n/128
                              occupancy-knee choice at n=2000, pinned by
                              the oracles; at that size the √n rule
                              would give 45 — more cells, same bound.)
- ``lsh_planes(n)``           planes = ceil(log2(n / bucket_rows)):
                              keeps expected bucket occupancy at the
                              recall-vs-candidates knee the round-7
                              sweep measured. Reproduces the shipped 5
                              planes exactly at the fixture (n=2000,
                              64-row buckets).
- ``minhash_bands_rows(n)``   (bands, rows) from the MMDS S-curve
                              t ≈ (1/b)^(1/r): rows grow with log(n) so
                              the expected background-Jaccard collisions
                              per band stay O(n) (candidate generation
                              stays linear), then bands = t^-r re-pins
                              the threshold.

All pure integer functions of corpus size — no data access, no Spark —
so they are usable at plan-construction time. Scale-behavior laws
(monotonicity, the √n / log-growth shapes, occupancy invariance when
driven through the real cell_assignments plan at two shipped SFs) are
pytest-locked in tests/test_autoparams.py.
"""

from __future__ import annotations

import math


def ivf_cells(n_vectors: int) -> int:
    """√n cells (FAISS-style nlist rule): balances the broadcast
    centroid table against per-cell scan size and bounds total
    within-cell pair work by n^1.5 for ANY n."""
    return max(1, round(math.sqrt(max(n_vectors, 1))))


def lsh_planes(n_vectors: int, target_bucket_rows: int = 64) -> int:
    """Hyperplanes per LSH table: ceil(log2(n / target_bucket_rows)),
    i.e. enough 2-way splits that the expected bucket holds
    ~target_bucket_rows vectors. 64 is the measured recall-vs-candidate
    knee of the round-7 sweep (BASELINE.md: 5 planes at n=2000 -> 312
    candidates/query at r@3 0.60 with L=4 tables); L stays the recall
    knob and is corpus-size-independent."""
    n = max(n_vectors, 1)
    return max(1, math.ceil(math.log2(max(n / target_bucket_rows, 2.0))))


def minhash_bands_rows(
    n_docs: int, threshold: float = 0.7, bg_jaccard: float = 0.1
) -> tuple[int, int]:
    """(bands, rows_per_band) for the MinHash LSH S-curve (Leskovec/
    Rajaraman/Ullman, MMDS ch. 3): rows r is the smallest value keeping
    expected background collisions per band linear in n
    (C(n,2)·bg^r <= ~n  =>  r >= log(n/2)/log(1/bg)), and bands
    b = round(threshold^-r) re-pins the ~50%-capture threshold at
    t = (1/b)^(1/r). Signature length is b*r minhashes — grows
    O(log² n), the price of keeping candidates linear at any scale."""
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    if not 0 < bg_jaccard < threshold:
        raise ValueError("bg_jaccard must be in (0, threshold)")
    n = max(n_docs, 2)
    r = max(2, math.ceil(math.log(n / 2) / math.log(1 / bg_jaccard)))
    b = max(1, round(threshold ** (-r)))
    return b, r


def asof_bucket_span(
    hot_key_rows: int,
    hot_key_span: int,
    partition_budget: int = 1_000_000,
) -> int | None:
    """Bucket span for ``asof_join(bucket="auto")`` — None means the
    plain carry (one window partition per key) is the winning plan.

    The carry's unit of work is one sorted window partition holding the
    hottest key's full (left + right) history. Up to
    ``partition_budget`` rows that single sort is cheap and the plain
    carry wins — it skips the bucketed path's extra phase-1 aggregation
    and seed union, a roughly constant ~0.5 s overhead that dominates
    small partitions (measured single-key crossover sweep, BASELINE.md
    round-14 table: 0.2M rows plain 1.22 s vs bucketed 1.63 s; 0.9M
    1.01 vs 1.21; 2.2M plain 2.30 vs bucketed 1.18 — crossover between
    ~1M and ~2M on local[32], single-task sort wall growing
    superlinearly past it). Past the budget the hot partition becomes
    one straggler task and the two-phase bucketed carry wins regardless
    of skew, so: split the hot key's time span into
    ceil(rows / budget) buckets — expected per-bucket volume ≈ the
    budget under a roughly uniform-in-time hot key (the bot-user /
    default-tenant shape; a key whose rows also cluster in TIME still
    improves by the clustering factor and never regresses vs plain,
    since every bucket is a subset of the old single partition). The
    1M default is the measured knee's conservative edge on 32 cores; a
    cluster with smaller task memory or stricter straggler SLOs lowers
    it.

    ``hot_key_span`` = (max − min) of the comparable on-values within
    the hottest key. A span of 0 (all rows at one instant) cannot be
    split by time — return None: bucketing would add phases without
    bounding anything.
    """
    if hot_key_rows <= partition_budget or hot_key_span <= 0:
        return None
    # The budget is the SWITCH point, not the task grain: crossing it
    # means one sorted task is too big, and once bucketing, buckets
    # should be fine enough to spread across the cluster — per-bucket
    # overhead (one seed row + its share of the phase-1 agg) is
    # near-zero, so the only cost of finer grain is scheduler overhead.
    # budget/10 per bucket is the measured knee (round-14 crossover
    # sweep: 2.2M-row key, ~750k/bucket span 3.24 s vs ~75k/bucket
    # 1.87 s vs plain 2.74 s).
    n_buckets = math.ceil(hot_key_rows / max(partition_budget // 10, 1))
    return max(1, math.ceil(hot_key_span / n_buckets))
