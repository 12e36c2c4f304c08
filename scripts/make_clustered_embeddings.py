#!/usr/bin/env python
"""Deterministic mixture-of-Gaussians embedding fixture (round-5 verdict,
Next round #6).

The ANN recall table in COVERAGE.md is measured on the driver's
near-uniform synthetic vectors — the PESSIMAL case for IVF/PQ (no cluster
structure for the coarse quantizer to exploit, qualifying neighbors are a
distribution tail). Production embedding corpora are clustered; this
writes an ``embeddings.parquet`` with the same schema (vec_id BIGINT,
embedding FLOAT[], label INT) whose vectors are drawn from K Gaussian
clusters, so the recall characterization covers the realistic regime too:

    python scripts/make_clustered_embeddings.py OUT_DIR [--n 2000]
        [--dim 64] [--k 24] [--sigma 0.12] [--seed 7]

vec_ids are a seeded permutation of cluster membership, so the "first 16
vec_ids" IVF/PQ seeding convention picks a random draw of points (as it
does on real data), not one cluster's members.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make_clustered_embeddings(
    out_dir: str,
    n: int = 2000,
    dim: int = 64,
    k: int = 24,
    sigma: float = 0.12,
    seed: int = 7,
) -> str:
    rng = np.random.default_rng(seed)
    centers = rng.normal(0.0, 1.0, size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + rng.normal(0.0, sigma, size=(n, dim))
    # permute so vec_id order is uncorrelated with cluster membership
    perm = rng.permutation(n)
    vecs, labels = vecs[perm], labels[perm]

    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(table, path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--sigma", type=float, default=0.12)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    path = make_clustered_embeddings(
        args.out_dir, args.n, args.dim, args.k, args.sigma, args.seed
    )
    print(path)


if __name__ == "__main__":
    main()
