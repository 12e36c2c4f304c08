"""Similarity search over the embeddings table (SURVEY §2.3 Q33 + the
north-star ANN path).

- ``sim_cosine_topk``     exact brute-force cosine top-k per query vector —
                          the correctness baseline.
- ``sim_ann_hyperplane``  random-hyperplane LSH: 8 fixed Rademacher planes →
                          256 buckets → top-k within bucket. The scale path:
                          the bucket id is the shuffle key, so candidate
                          generation is an equi-join (never all-pairs) and
                          skew is bounded by bucket occupancy.

Both are exactly oracle-checkable because every float op (sequential-fold
dot products on unit-normalized vectors) is bit-identical between Spark and
DuckDB, and top-k ordering carries a vec_id tiebreaker.
"""

from __future__ import annotations

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import (
    NORM_EMB_DUCK,
    normalized_embeddings,
    spark_dot,
)

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 act as query vectors

# 8 fixed Rademacher (±1) hyperplanes over 64 dims, seed-stable
_rng = random.Random(7)
N_PLANES = 8
DIM = 64
PLANES = [[float(_rng.choice((-1.0, 1.0))) for _ in range(DIM)] for _ in range(N_PLANES)]


# ---------------------------------------------------------------------------
# Q33 — exact cosine top-k
# ---------------------------------------------------------------------------
@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH n AS ({NORM_EMB_DUCK}),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             list_dot_product(q.ne, c.ne) AS cos
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT qid, cid, cos FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "embeddings"),
)
def sim_cosine_topk(spark, sf_dir):
    """exact cosine top-5 neighbors for each of the first 10 vectors
    (brute force — the ANN recall baseline)."""
    n = normalized_embeddings(spark, sf_dir)
    q = n.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = n.alias("c")
    scored = q.join(c, F.col("c.vec_id") != F.col("q.vec_id")).select(
        F.col("q.vec_id").alias("qid"),
        F.col("c.vec_id").alias("cid"),
        spark_dot(F.col("q.ne"), F.col("c.ne")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# ANN via random-hyperplane LSH
# ---------------------------------------------------------------------------
def _plane_sql(plane: list[float]) -> str:
    return "[" + ",".join(repr(v) for v in plane) + "]"


_BUCKET_DUCK = " + ".join(
    f"(CASE WHEN list_dot_product(ne, {_plane_sql(p)}) >= 0 "
    f"THEN {1 << i} ELSE 0 END)"
    for i, p in enumerate(PLANES)
)


@query(
    "sim_ann_hyperplane",
    oracle=f"""
    WITH n AS ({NORM_EMB_DUCK}),
    bucketed AS (
      SELECT vec_id, ne, ({_BUCKET_DUCK}) AS bucket FROM n
    ),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             list_dot_product(q.ne, c.ne) AS cos
      FROM bucketed q JOIN bucketed c
        ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
    )
    SELECT qid, cid, cos FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    tags=("similarity", "embeddings"),
)
def sim_ann_hyperplane(spark, sf_dir):
    """approximate top-3 neighbors per vector via random-hyperplane LSH:
    sign-bucket on 8 fixed planes, equi-join within bucket, window top-k.
    At 100 TB the bucket join replaces the O(n²) pair space with collision
    sets; recall is tuned by planes-per-table × table count (multi-probe)."""
    n = normalized_embeddings(spark, sf_dir)
    bucket = None
    for i, p in enumerate(PLANES):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(spark_dot(F.col("ne"), plane) >= 0, 1 << i).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    bucketed = n.select("vec_id", "ne", bucket.alias("bucket"))
    # NOTE(r15 optimization): the per-bucket NumPy kernel swap
    # (vecmath.group_topk_blocked) was built, oracle-verified, and
    # A/B-measured here — and REJECTED: 8 planes make 256 buckets of ~8
    # vectors at sf0.1, and 256 tiny Python groups cost more than the
    # ~64 interpreted pair-dots per bucket they replace (1.32 s → 2.03 s).
    # The kernel wins only where groups carry real pair volume (IVF
    # cells, the 4×32-bucket multi table, tiles) — see ann_multilsh.py
    # and scale.py for the kept swaps.
    q = bucketed.alias("q")
    c = bucketed.alias("c")
    scored = q.join(
        c,
        (F.col("q.bucket") == F.col("c.bucket"))
        & (F.col("c.vec_id") != F.col("q.vec_id")),
    ).select(
        F.col("q.vec_id").alias("qid"),
        F.col("c.vec_id").alias("cid"),
        spark_dot(F.col("q.ne"), F.col("c.ne")).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
