"""Iterative ML on DataFrames: k-means clustering of the embeddings table,
exactly oracle-checked.

The reference has no ML operators; this is the north-star "iterative
algorithm" capability (the loop shape of MLlib's KMeans) expressed with
the same driver-side pattern as connected components: per iteration one
distributed assignment pass + one tiny centroid collect (k×dim values —
the only data that ever reaches the driver, exactly what MLlib broadcasts
each round).

Exactness across engines comes from integer quantization: vectors are
unit-normalized then quantized to 1e-9 (bigint). Centroid sums are then
exact integer arithmetic; means and distances are doubles derived from
identical integers via identical operation order (three sequential-fold
dot products: |v-c|² = v·v - 2·v·c + c·c), so argmin assignments match
DuckDB bit-for-bit and the oracle can unroll the same two iterations in
SQL. Fixed iteration count keeps both sides in lockstep (no convergence
epsilon to disagree on).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import (
    NORM_EMB_DUCK,
    normalized_embeddings,
    spark_dot,
)

K = 8
ITERS = 2
SCALE = 1_000_000_000  # 1e-9 quantization


def _quantized(spark, sf_dir):
    """(vec_id, qd): unit-normalized embeddings quantized to 1e-9 doubles —
    every downstream float op starts from identical values in both
    engines."""
    n = normalized_embeddings(spark, sf_dir)
    return n.select(
        "vec_id",
        F.transform(
            "ne", lambda x: F.round(x * SCALE).cast("bigint") / F.lit(float(SCALE))
        ).alias("qd"),
    )


# DuckDB twin of _quantized
_QUANT_DUCK = f"""
  SELECT vec_id,
         list_transform(ne, x -> round(x * {SCALE})::BIGINT / {SCALE}.0) AS qd
  FROM ({NORM_EMB_DUCK})
"""

# one assignment pass in SQL: argmin over centroids of |v-c|^2, tiebreak cell
def _assign_sql(cent_cte: str) -> str:
    return f"""
      SELECT vec_id, qd, cell FROM (
        SELECT v.vec_id, v.qd, c.cell,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.qd, v.qd)
                          - 2 * list_dot_product(v.qd, c.ce)
                          + list_dot_product(c.ce, c.ce),
                          c.cell
               ) AS rn
        FROM qv v CROSS JOIN {cent_cte} c
      ) WHERE rn = 1
    """


# centroid recompute in SQL: exact bigint per-dim sums -> double means
# (count per (cell,pos) group == vectors in the cell)
def _recompute_sql(assign_cte: str) -> str:
    return f"""
      SELECT cell, list(mu ORDER BY pos) AS ce FROM (
        SELECT cell, pos,
               CAST(sum(q) AS BIGINT)::DOUBLE / count(*) / {SCALE}.0 AS mu
        FROM (
          SELECT a.cell,
                 generate_subscripts(a.qd, 1) AS pos,
                 round(unnest(a.qd) * {SCALE})::BIGINT AS q
          FROM {assign_cte} a
        )
        GROUP BY cell, pos
      ) GROUP BY cell
    """


# the full 2-iteration CTE chain, shared with the trained-IVF query in
# analytics_extras so the training recipe has one definition per engine
_KMEANS_CTES = f"""
WITH qv AS ({_QUANT_DUCK}),
c0 AS (
  SELECT vec_id AS cell, qd AS ce FROM qv WHERE vec_id < {K}
),
a1 AS ({_assign_sql("c0")}),
c1 AS ({_recompute_sql("a1")}),
a2 AS ({_assign_sql("c1")})
"""

_KMEANS_ORACLE = _KMEANS_CTES + "SELECT vec_id, cell FROM a2"


def kmeans_assign(spark, sf_dir):
    """The trained assignment frame (vec_id, qd, cell) after ITERS
    iterations — shared by ml_kmeans_lite (which projects it) and the
    trained-IVF query (which joins it on the cell key)."""
    qv = _quantized(spark, sf_dir).localCheckpoint(eager=True)

    # init: first k vectors, collected to the driver (k×dim doubles)
    cents = {
        r["vec_id"]: list(r["qd"])
        for r in qv.filter(F.col("vec_id") < K).collect()
    }

    assign = None
    for it in range(ITERS):
        cent_rows = [
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(v) for v in ce]).alias("ce"),
            )
            for cell, ce in sorted(cents.items())
        ]
        c = (
            qv.sparkSession.range(1)
            .select(F.explode(F.array(*cent_rows)).alias("c"))
            .select("c.cell", "c.ce")
        )
        dist = (
            spark_dot(F.col("qd"), F.col("qd"))
            - 2 * spark_dot(F.col("qd"), F.col("ce"))
            + spark_dot(F.col("ce"), F.col("ce"))
        )
        w = W.partitionBy("vec_id").orderBy(dist.asc(), F.col("cell").asc())
        assign = (
            qv.crossJoin(F.broadcast(c))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "qd", "cell")
        )
        if it == ITERS - 1:
            break
        # exact integer per-dim sums; k×dim scalars cross the driver
        sums = (
            assign.select(
                "cell",
                F.posexplode(
                    F.transform(
                        "qd",
                        lambda x: F.round(x * SCALE).cast("bigint"),
                    )
                ).alias("pos", "q"),
            )
            .groupBy("cell", "pos")
            .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        dim = len(next(iter(cents.values())))
        new_cents: dict[int, list[float]] = {}
        for r in sums:
            new_cents.setdefault(r["cell"], [0.0] * dim)
            new_cents[r["cell"]][r["pos"]] = float(r["s"]) / r["n"] / SCALE
        cents = new_cents
    return assign


@query("ml_kmeans_lite", oracle=_KMEANS_ORACLE, tags=("ml", "embeddings", "scale"))
def ml_kmeans_lite(spark, sf_dir):
    """k-means (k=8, 2 fixed iterations, seeded from the first k vectors):
    assignment is a broadcast of k×dim centroid literals against the
    distributed vectors (argmin of |v-c|² with cell tiebreak); the update
    collects only exact per-dim integer sums. The oracle unrolls the same
    two iterations in SQL — assignments must match exactly."""
    return kmeans_assign(spark, sf_dir).select("vec_id", "cell")
