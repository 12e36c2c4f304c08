"""ANN recall extensions, registered AFTER the frozen driver gate
(tests/test_registry_gate.py) — locally oracle-checked like everything
else via scripts/check_oracle.py.

``sim_ann_ivf_probe2`` is ``sim_ann_ivf`` with nprobe=2, the standard
IVF recall knob: a query vector probes its TWO nearest coarse cells
instead of one, recovering neighbors that sit just across a cell
boundary (the dominant IVF recall failure). Corpus vectors still live in
exactly one cell, so the probe join yields each candidate pair at most
once — no dedup pass. Cost model at 100 TB: candidate volume doubles
(2·n²/k vs n²/k), shuffle shape unchanged (cell-id equi-join, broadcast
centroid table, no window over anything bigger than the k-row per-vector
centroid scores).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import normalized_embeddings, spark_dot
from doc2dataset_spark.queries.scale import IVF_TOP_K, N_CENTROIDS

N_PROBE = 2


@query(
    "sim_ann_ivf_probe2",
    oracle=f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))) AS ne
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cent_id, ne AS ce FROM n
              WHERE vec_id < {N_CENTROIDS}),
    ranked AS (
      SELECT v.vec_id, v.ne, c.cent_id,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_dot_product(v.ne, c.ce) DESC, c.cent_id
             ) AS rn
      FROM n v CROSS JOIN cents c
    ),
    probe AS (SELECT vec_id, ne, cent_id FROM ranked WHERE rn <= {N_PROBE}),
    corpus AS (SELECT vec_id, ne, cent_id FROM ranked WHERE rn = 1),
    scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             list_dot_product(q.ne, c.ne) AS cos
      FROM probe q JOIN corpus c
        ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
    )
    SELECT qid, cid, cos FROM (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rn
      FROM scored
    ) WHERE rn <= {IVF_TOP_K}
    """,
    tags=("similarity", "embeddings", "scale"),
)
def sim_ann_ivf_probe2(spark, sf_dir):
    """IVF ANN with nprobe=2: query side joins its 2 best cells, corpus
    side its 1 best — same broadcast-centroid scoring subtree feeding
    both sides (exchange-reused), same cell equi-join shape as
    ``sim_ann_ivf``. The per-vector top-2 ranking is a window whose
    partitions are exactly N_CENTROIDS rows, so the sort is trivial and
    the shuffle is the same vec_id hash the argmax agg would pay."""
    def _ranked():
        # built fresh per side: the cogrouped kernel below needs the two
        # sides to carry independent lineage (a shared subtree is an
        # ambiguous self-join for the cogroup analyzer); canonicalized
        # plan equality still lets ReuseExchange share the physical work
        n = normalized_embeddings(spark, sf_dir)
        cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("cent_id"), F.col("ne").alias("ce")
        )
        return (
            n.crossJoin(F.broadcast(cents))
            .select(
                "vec_id",
                "ne",
                "cent_id",
                spark_dot(F.col("ne"), F.col("ce")).alias("sim"),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("vec_id").orderBy(F.desc("sim"), "cent_id")
                ),
            )
        )

    probe = _ranked().filter(F.col("rn") <= N_PROBE).select(
        F.col("vec_id").alias("qid"), F.col("ne").alias("qne"), "cent_id"
    )
    corpus = _ranked().filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cid"), F.col("ne").alias("cne"), "cent_id"
    )
    # per-cell probe-vs-corpus scoring + per-(cell, qid) top-k preselect
    # as one vectorized NumPy kernel per cell
    # (vecmath.cogroup_topk_blocked). Lossless for the final top-k: a
    # cell's candidates for a query are distinct cids, so a candidate
    # beaten by >= IVF_TOP_K inside its own cell is beaten by >= that
    # many distinct candidates globally; the final per-qid window ranks
    # the <= N_PROBE·IVF_TOP_K survivors with identical cos bits and
    # identical (cos DESC, cid) tie order.
    from doc2dataset_spark.functions.vecmath import cogroup_topk_blocked

    scored = cogroup_topk_blocked(probe, corpus, ["cent_id"], IVF_TOP_K)
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TOP_K)
        .drop("rn")
    )
