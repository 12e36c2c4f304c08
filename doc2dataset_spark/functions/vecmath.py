"""Cogrouped tile kernels for the exact O(n²) embedding pair scans.

The pair kernels (``dedup_embedding_cosine``'s threshold scan,
``knn_edges_from``'s exact top-k graph) used to evaluate the cosine as a
JVM higher-order fold (``queries.dedup.spark_dot`` —
``F.aggregate(F.zip_with(x, y, *), 0.0, +)``) on every row of the joined
pair stream. ArrayAggregate/ZipWith are CodegenFallback, so each of the
O(n²) pairs paid ~2·d interpreted lambda dispatches, and that expression
dominated the wall of every query built on these kernels.

This module keeps the identical tile decomposition (vectors hashed into
B blocks, the B×(B+1)/2 upper-triangular block-pair list broadcast, each
tile one shuffle group — per-task memory is two n/B blocks, never a full
side) but evaluates the tile's pair products in ONE vectorized NumPy
kernel per tile via ``groupBy(tile).cogroup(...).applyInPandas`` (guide
§8 / §4.2): each vector crosses the Python boundary once per tile it
belongs to (O(n·B) rows), never the O(n²) pair expansion, and only the
surviving rows (threshold hits, per-tile top-k) come back.

Two rejected alternatives, measured in this round (OPTIMIZATION_r15.md):

- unrolling the fold into a codegen'd 64-term expression chain — blows
  ``spark.sql.codegen.hugeMethodLimit``; the whole stage falls back to
  interpreted eval and every pair kernel regresses 3-4×;
- a per-pair Arrow ``pandas_udf`` dot — bit-exact, but it ships the
  joined pair stream (two d-dim arrays per pair, ~1 KB × O(n²) rows)
  across the boundary and loses ~30% to the JVM fold.

Bit-exactness: the fold order of ``spark_dot`` is
``((0.0 + x0*y0) + x1*y1) + ... + x{d-1}*y{d-1}``. ``pair_cos_matrix``
accumulates ``C += A[:, j, None] * B[None, :, j]`` column by column from
``C = 0.0``, which performs the same multiplies and the same additions
in the same per-pair sequence (IEEE-754 ops are deterministic; only the
*order* threatens bit-equality, and the order is identical, including
the ``0.0 + z0`` first step). Verified: exact int64-bit equality of
every output double vs the HOF-fold shape at sf0.1, plus the DuckDB
oracle mirrors (list_dot_product) at the shipped SFs.

The n-sized (not n²) fold sites — unit normalization, per-component PCA
projection — keep the JVM fold: their element counts are linear and a
Python crossing would cost more than the interpreted eval saves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# Empty result frames with the exact kernel output dtypes (a tile whose
# side is empty must still return the declared schema).
_EMPTY_PAIRS = {
    "va": pd.Series([], dtype="int64"),
    "vb": pd.Series([], dtype="int64"),
    "cos": pd.Series([], dtype="float64"),
}
_EMPTY_EDGES = {
    "qid": pd.Series([], dtype="int64"),
    "cid": pd.Series([], dtype="int64"),
    "cos": pd.Series([], dtype="float64"),
}


def pair_cos_matrix(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(m,d) × (k,d) → (m,k) pair dot-product matrix with the EXACT
    sequential fold order of ``spark_dot`` (see module docstring)."""
    m = A.shape[0]
    k = B.shape[0]
    C = np.zeros((m, k), dtype=np.float64)
    for j in range(A.shape[1]):
        C += A[:, j][:, None] * B[:, j][None, :]
    return C


def tile_block_frames(n: DataFrame, blocks: int) -> tuple[DataFrame, DataFrame]:
    """The two sides of the tile decomposition of a (vec_id, ne) frame:
    ``left``  = (ba, bb, ua, na) — every vector replicated to the tiles
    where its block is the row coordinate;
    ``right`` = (ba, bb, ub, nb) — same for the column coordinate.
    Built from two independent lineages (fresh tile frames, renamed
    columns) so the cogroup below is not an ambiguous self-join."""
    spark = n.sparkSession
    v = n.select(
        "vec_id", "ne",
        F.pmod(F.col("vec_id"), F.lit(blocks)).cast("int").alias("blk"),
    )
    tiles = [(i, j) for i in range(blocks) for j in range(i, blocks)]
    tl = spark.createDataFrame(tiles, "ba int, bb int")
    tr = spark.createDataFrame(tiles, "ba int, bb int")
    left = v.join(F.broadcast(tl), F.col("blk") == F.col("ba")).select(
        "ba", "bb", F.col("vec_id").alias("ua"), F.col("ne").alias("na")
    )
    vr = n.select(
        F.col("vec_id").alias("vid2"),
        F.col("ne").alias("ne2"),
        F.pmod(F.col("vec_id"), F.lit(blocks)).cast("int").alias("blk2"),
    )
    right = vr.join(F.broadcast(tr), F.col("blk2") == F.col("bb")).select(
        "ba", "bb", F.col("vid2").alias("ub"), F.col("ne2").alias("nb")
    )
    return left, right


def _tile_arrays(key, left: pd.DataFrame, right: pd.DataFrame):
    """Stack one tile's two blocks and the unordered-pair mask (diagonal
    tiles meet each pair twice → keep the ascending order only)."""
    ua = left["ua"].to_numpy()
    ub = right["ub"].to_numpy()
    A = np.stack(left["na"].to_numpy())
    B = np.stack(right["nb"].to_numpy())
    C = pair_cos_matrix(A, B)
    if key[0] == key[1]:
        mask = ua[:, None] < ub[None, :]
    else:
        mask = np.ones_like(C, dtype=bool)
    return ua, ub, C, mask


def cosine_pairs_blocked(n: DataFrame, threshold: float, blocks: int) -> DataFrame:
    """(va, vb, cos): all unordered pairs with cos ≥ threshold — the
    dedup_embedding_cosine kernel. The threshold is applied INSIDE the
    tile kernel (the comparison is on bit-identical doubles, so the kept
    set is identical), so only qualifying pairs ever leave Python."""

    def tile(key, left, right):
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(_EMPTY_PAIRS)
        ua, ub, C, mask = _tile_arrays(key, left, right)
        mask &= C >= threshold
        i, j = np.nonzero(mask)
        a, b = ua[i], ub[j]
        return pd.DataFrame(
            {"va": np.minimum(a, b), "vb": np.maximum(a, b), "cos": C[i, j]}
        )

    left, right = tile_block_frames(n, blocks)
    return (
        left.groupBy("ba", "bb")
        .cogroup(right.groupBy("ba", "bb"))
        .applyInPandas(tile, "va long, vb long, cos double")
    )


def topk_edges_blocked(n: DataFrame, k: int, blocks: int) -> DataFrame:
    """(qid, cid, cos): per-tile top-k directed neighbor candidates — the
    first (per-tile) level of knn_edges_from's hierarchical top-k,
    computed inside the tile kernel. Selection order is exactly the old
    row_number window's ``ORDER BY cos DESC, cid`` (cos bits are
    identical, so ties resolve identically); ≤ k·(tiles per vector)
    candidate rows per query survive for the final global window."""

    def tile(key, left, right):
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(_EMPTY_EDGES)
        ua, ub, C, mask = _tile_arrays(key, left, right)
        i, j = np.nonzero(mask)
        if len(i) == 0:
            return pd.DataFrame(_EMPTY_EDGES)
        a, b, c = ua[i], ub[j], C[i, j]
        # each unordered pair feeds BOTH endpoints' neighbor lists
        qid = np.concatenate([a, b])
        cid = np.concatenate([b, a])
        cos = np.concatenate([c, c])
        order = np.lexsort((cid, -cos, qid))
        q = qid[order]
        new = np.empty(len(q), dtype=bool)
        new[0] = True
        new[1:] = q[1:] != q[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(q)))
        rank = np.arange(len(q)) - np.repeat(starts, sizes)
        keep = order[rank < k]
        return pd.DataFrame({"qid": qid[keep], "cid": cid[keep], "cos": cos[keep]})

    left, right = tile_block_frames(n, blocks)
    return (
        left.groupBy("ba", "bb")
        .cogroup(right.groupBy("ba", "bb"))
        .applyInPandas(tile, "qid long, cid long, cos double")
    )
