"""Multi-table random-hyperplane LSH (round-7, verdict Next round #6).

Single-table hyperplane LSH (similarity.sim_ann_hyperplane) is the
weakest ANN recall number in BASELINE.md (r@3 0.077-0.257 even on
clustered data): one 8-plane signature splits near-neighbors across a
bucket boundary with probability ~ 8·θ/π per pair. The standard fix is
OR-amplification — L independent tables, each with its own seeded
planes; a pair is a candidate if it collides in ANY table — which drives
the miss probability to (8θ/π)^L while candidate volume grows only
additively (L × per-table collisions).

- ``sim_ann_hyperplane_multi``   L=4 tables × 5 Rademacher planes,
                                 union-of-tables candidates deduped by
                                 (qid, cid), exact cosine re-rank top-3.
- ``ann_hyperplane_multi_recall`` recall@3 of the above against the
                                 exact k-NN graph (the ann_recall_eval
                                 discipline) — locked on the clustered
                                 fixture in tests/test_clustered_recall.py.

Scale shape: signatures are row-local (L×8 fold-dot products per vector,
one codegen stage); candidate generation is an equi-join on the compound
key (table, bucket) — posexplode makes the corpus L× taller but every
shuffle stays a hash equi-join with bucket-occupancy-bounded skew, never
all-pairs. The (qid, cid) dedup is a map-side-combinable aggregate (cos
is bit-identical across tables, so max == the value). The same recipe
at 100 TB: raise planes-per-table to keep bucket occupancy bounded,
raise L to buy recall.
"""

from __future__ import annotations

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.curation_extras import _KNN_DUCK, KNN_K, _knn_graph
from doc2dataset_spark.queries.dedup import (
    NORM_EMB_DUCK,
    normalized_embeddings,
    spark_dot,
)
from doc2dataset_spark.queries.similarity import DIM, _plane_sql

L_TABLES = 4
# 5 planes/table (32 buckets), NOT the single-table 8: the (planes, L)
# trade was swept offline on the clustered fixture — at L=4, 8 planes
# give r@3 0.27 (49 candidates/query), 5 planes give 0.60 (312), 4 give
# 0.74 (589). 5 is the knee for this corpus size; at larger n, planes
# scale ~log2(n / target_bucket_occupancy) to keep per-bucket pair work
# bounded while L buys back the recall each extra plane costs.
N_PLANES_MULTI = 5
MULTI_TOP_K = 3

# L independent seeded Rademacher plane sets — one RNG per (table, plane)
# so adding tables or planes never perturbs existing signatures


def _make_plane(seed: int) -> list[float]:
    rng = random.Random(seed)
    return [float(rng.choice((-1.0, 1.0))) for _ in range(DIM)]


def make_multi_planes(
    n_planes: int, tables: int = L_TABLES
) -> list[list[list[float]]]:
    """L independent plane sets with per-(table, plane) seeds — the
    builder seam for computed parameters: make_multi_planes(
    autoparams.lsh_planes(n)) sizes buckets to the measured occupancy
    knee at ANY corpus size, while the seed scheme guarantees a wider
    or narrower build shares every plane it has in common with the
    shipped one (adding tables or planes never perturbs existing
    signatures)."""
    return [
        [_make_plane(1000 * (t + 1) + i) for i in range(n_planes)]
        for t in range(tables)
    ]


MULTI_PLANES = make_multi_planes(N_PLANES_MULTI)


def _bucket_duck(planes: list[list[float]]) -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product(ne, {_plane_sql(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def _bucket_spark(planes: list[list[float]]):
    bucket = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(spark_dot(F.col("ne"), plane) >= 0, 1 << i).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return bucket


_TABLES_DUCK = "\n      UNION ALL ".join(
    f"SELECT vec_id, ne, {t} AS tbl, ({_bucket_duck(MULTI_PLANES[t])}) AS bucket FROM n"
    for t in range(L_TABLES)
)


def _multi_candidates(spark, sf_dir, planes=None):
    """(qid, cid, cos): union-of-tables bucket collisions, deduped, with
    the exact cosine attached (computed once inside the pair join).
    ``planes`` defaults to the oracle-pinned MULTI_PLANES; pass
    make_multi_planes(autoparams.lsh_planes(n)) for a corpus-size-scaled
    build (tests/test_autoparams.py pins the recall floor)."""
    n = normalized_embeddings(spark, sf_dir)
    sigs = n.select(
        "vec_id",
        "ne",
        F.posexplode(
            F.array(*[
                _bucket_spark(p)
                for p in (MULTI_PLANES if planes is None else planes)
            ])
        ).alias("tbl", "bucket"),
    )
    # per-(table, bucket) scoring + per-qid top-k preselect as one
    # vectorized NumPy kernel per bucket (vecmath.group_topk_blocked).
    # The preselect is lossless for the consumer's top-MULTI_TOP_K: a
    # bucket's candidates for a query are distinct cids, so a pair beaten
    # by >= k candidates inside any one of its buckets is beaten by >= k
    # distinct candidates globally — the union of per-bucket top-k
    # therefore contains every global top-k winner, with identical cos
    # bits and identical (cos DESC, cid) tie order.
    from doc2dataset_spark.functions.vecmath import group_topk_blocked

    pairs = group_topk_blocked(sigs, ["tbl", "bucket"], MULTI_TOP_K)
    # dedup across tables: cos is bit-identical for every copy of a pair
    # (same fold-dot on the same vectors), so max == the value and the
    # dedup is a partial-aggregatable groupBy, not a distinct-over-arrays
    return pairs.groupBy("qid", "cid").agg(F.max("cos").alias("cos"))


@query(
    "sim_ann_hyperplane_multi",
    oracle=f"""
    WITH n AS ({NORM_EMB_DUCK}),
    b AS (
      {_TABLES_DUCK}
    ),
    cand AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             max(list_dot_product(q.ne, c.ne)) AS cos
      FROM b q JOIN b c
        ON q.tbl = c.tbl AND q.bucket = c.bucket
           AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id
    )
    SELECT qid, cid, cos FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rn
      FROM cand
    ) WHERE rn <= {MULTI_TOP_K}
    """,
    tags=("similarity", "embeddings", "scale"),
)
def sim_ann_hyperplane_multi(spark, sf_dir):
    """Approximate top-3 neighbors per vector via L=4-table OR-amplified
    hyperplane LSH: candidates from any table's bucket collision, exact
    cosine re-rank with vec_id tiebreak. See module docstring for the
    amplification math and 100 TB shape."""
    cand = _multi_candidates(spark, sf_dir)
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MULTI_TOP_K)
        .drop("rn")
    )


@query(
    "ann_hyperplane_multi_recall",
    oracle=f"""
    WITH n AS ({NORM_EMB_DUCK}),
    b AS (
      {_TABLES_DUCK}
    ),
    cand AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             max(list_dot_product(q.ne, c.ne)) AS cos
      FROM b q JOIN b c
        ON q.tbl = c.tbl AND q.bucket = c.bucket
           AND c.vec_id <> q.vec_id
      GROUP BY q.vec_id, c.vec_id
    ),
    ann AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, cid) AS rn
        FROM cand
      ) WHERE rn <= {MULTI_TOP_K}
    ),
    truth AS ({_KNN_DUCK})
    SELECT t.qid,
           count(a.cid)::INT AS n_hits,
           round(count(a.cid) / {KNN_K}.0, 4) AS recall
    FROM truth t LEFT JOIN ann a ON a.qid = t.qid AND a.cid = t.cid
    GROUP BY t.qid
    """,
    tags=("similarity", "embeddings", "evaluation"),
)
def ann_hyperplane_multi_recall(spark, sf_dir):
    """Recall@3 of the multi-table LSH against the exact k-NN graph, per
    query vector — the ann_recall_eval discipline applied to the
    OR-amplified tables, so the L=4 claim is an oracle-gated number, not
    a sweep-script footnote."""
    truth = _knn_graph(spark, sf_dir).select("qid", "cid")
    ann = sim_ann_hyperplane_multi(spark, sf_dir).select(
        "qid", F.col("cid").alias("acid")
    )
    joined = truth.join(
        ann,
        (truth["qid"] == ann["qid"]) & (truth["cid"] == ann["acid"]),
        "left",
    ).select(truth["qid"].alias("qid"), ann["acid"].alias("hit"))
    return joined.groupBy("qid").agg(
        F.count("hit").cast("int").alias("n_hits"),
        F.round(F.count("hit") / float(KNN_K), 4).alias("recall"),
    )
