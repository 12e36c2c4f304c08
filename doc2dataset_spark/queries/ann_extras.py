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
    n = normalized_embeddings(spark, sf_dir)
    cents = n.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("ne").alias("ce")
    )
    ranked = (
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
    probe = ranked.filter(F.col("rn") <= N_PROBE).select(
        F.col("vec_id").alias("qid"), F.col("ne").alias("qne"), "cent_id"
    )
    corpus = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cid"), F.col("ne").alias("cne"), "cent_id"
    )
    # USING-form join: probe/corpus derive from the same `ranked` plan, so
    # `probe.cent_id == corpus.cent_id` is an ambiguous self-join reference
    # (Spark warns "trivially true equals predicate"); the string key is
    # unambiguous and keeps the same equi-join shape.
    scored = (
        # SHUFFLE_HASH as in the other embedding pair kernels: hash one
        # cell's worth of build rows instead of sorting both sides
        # (measured ~1.3 s faster at sf0.1). The hint sits on CORPUS so
        # the hash-map build side is the smaller one — probe carries
        # N_PROBE rows per vector, corpus exactly one.
        probe.join(corpus.hint("SHUFFLE_HASH"), "cent_id")
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid", "cid", spark_dot(F.col("qne"), F.col("cne")).alias("cos")
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IVF_TOP_K)
        .drop("rn")
    )
