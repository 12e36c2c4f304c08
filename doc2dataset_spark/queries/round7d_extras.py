"""Round-7 session-4 extras: distribution-drift monitoring and the
lambda (higher-order-function) engine surface.

- ``quality_psi_drift``     per-source Population Stability Index of the
                            document-length distribution against the
                            corpus-wide distribution — the standard
                            drift monitor a training-data pipeline runs
                            per ingest batch/source (PSI > 0.2 is the
                            industry "significant drift" rule of thumb).
- ``q74_higher_order_fns``  SQL lambda battery over the embedding
                            column: transform / filter / exists /
                            forall / aggregate (fold), each reduced to
                            a scalar so the DuckDB oracle (list_filter /
                            list_reduce / list_transform) hash-matches
                            bit-exactly.

Reference basis: the reference pipeline has no drift monitoring or
lambda surface at all (its per-doc transforms are a fixed chain,
reference main.py:66-104); both ops are public-Spark-surface extensions
(SPARK-23908 higher-order functions; PSI is standard model-monitoring
practice).

Cross-engine exactness: all ratios are (int + 0.5)/(int + 4.0) doubles
— identical in both engines; ln() on identical doubles + round-to-8dp
per term + exact decimal summation + final round-4 is the proven
text_tfidf_topk/BM25 recipe (order-independent and bit-stable). Array
folds are left-folds in both engines and every element is cast to
DOUBLE before arithmetic, so float→double widening happens identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.session import load_table

# PSI parameters: 8 fixed-width length bins (width 75 covers the
# generator's 48..553 n_chars span; the last bin is open-ended), Laplace
# 0.5 smoothing so no bin is ever empty, 0.2 drift threshold.
PSI_BIN_W = 75
PSI_N_BINS = 8
PSI_THRESHOLD = 0.2
_SM = 0.5 * PSI_N_BINS  # total smoothing mass added per distribution


def binned_docs(docs):
    """(source, bin) projection: the shared binning expression — ONE
    place, so batch query and streaming monitor can never disagree."""
    return docs.select(
        "source",
        F.expr(
            f"CAST(LEAST(n_chars DIV {PSI_BIN_W}, {PSI_N_BINS - 1}) AS INT)"
        ).alias("bin"),
    )


def psi_from_counts(sb, binc, tot):
    """PSI verdict frame from pre-aggregated counts.

    ``sb``  (source, bin, c)  per-source observed bin counts;
    ``binc``(bin, cb)         REFERENCE histogram;
    ``tot`` 1-row (n,)        reference total.
    Returns (source, n_docs, psi, drifted). Shared verbatim by the
    batch query (reference = the corpus itself) and the streaming
    monitor (reference = a frozen snapshot), so stream ≡ batch is an
    identity of expressions, not a tolerance."""
    spark = sb.sparkSession
    src = sb.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_src"))
    bins = spark.range(PSI_N_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = src.crossJoin(F.broadcast(bins))
    terms = (
        grid.join(sb, ["source", "bin"], "left")
        .join(F.broadcast(binc), "bin", "left")
        .crossJoin(F.broadcast(tot))
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + 0.5) / (F.col("n_src") + _SM)
    q = (F.coalesce(F.col("cb"), F.lit(0)) + 0.5) / (F.col("n") + _SM)
    term = F.round((p - q) * F.log(p / q), 8).cast("decimal(38,10)")
    psi = (
        terms.groupBy("source", F.col("n_src").alias("n_docs"))
        .agg(F.round(F.sum(term), 4).cast("double").alias("psi"))
    )
    return psi.select(
        "source", "n_docs", "psi",
        (F.col("psi") > PSI_THRESHOLD).alias("drifted"),
    )


@query(
    "quality_psi_drift",
    oracle=f"""
    WITH b AS (
      SELECT source, LEAST(n_chars // {PSI_BIN_W}, {PSI_N_BINS - 1}) AS bin
      FROM documents
    ),
    sb AS (SELECT source, bin, COUNT(*) AS c FROM b GROUP BY source, bin),
    src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src FROM sb GROUP BY source),
    binc AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS cb FROM sb GROUP BY bin),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM sb),
    bins AS (SELECT unnest(range({PSI_N_BINS})) AS bin),
    grid AS (SELECT s.source, s.n_src, bins.bin FROM src s CROSS JOIN bins),
    terms AS (
      SELECT g.source, g.n_src,
             (COALESCE(sb.c, 0) + 0.5) / (g.n_src + {_SM}) AS p,
             (COALESCE(binc.cb, 0) + 0.5) / (tot.n + {_SM}) AS q
      FROM grid g
      LEFT JOIN sb ON g.source = sb.source AND g.bin = sb.bin
      LEFT JOIN binc ON g.bin = binc.bin
      CROSS JOIN tot
    ),
    psi AS (
      SELECT source, n_src AS n_docs,
             round(SUM(CAST(round((p - q) * ln(p / q), 8)
                            AS DECIMAL(38,10))), 4)::DOUBLE AS psi
      FROM terms GROUP BY source, n_src
    )
    SELECT source, n_docs, psi, psi > {PSI_THRESHOLD} AS drifted FROM psi
    """,
    tags=("quality", "drift", "corpus"),
)
def quality_psi_drift(spark, sf_dir):
    """Per-source PSI of the document-length distribution vs the whole
    corpus: PSI = Σ_bins (p_i - q_i)·ln(p_i/q_i) over 8 fixed-width
    length bins with Laplace-0.5 smoothing, flagged at the standard
    0.2 threshold. The drift monitor a curation pipeline runs per
    source/ingest batch before mixing (streaming/drift.py is the
    per-micro-batch twin against a frozen reference).

    Scale shape: ONE scan of documents feeding a (source, bin) count —
    a uniformly-keyed partial-agg groupBy; everything downstream
    (per-source totals, corpus bin totals, the source×8 grid, the PSI
    fold) re-aggregates those ≤ |sources|×8 rows, with the bin totals
    and the 1-row corpus total broadcast. No second corpus scan, no
    window, no skew (bin keys are near-uniform by construction)."""
    docs = binned_docs(load_table(spark, sf_dir, "documents"))
    sb = docs.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c"))
    binc = sb.groupBy("bin").agg(F.sum("c").cast("bigint").alias("cb"))
    tot = sb.agg(F.sum("c").cast("bigint").alias("n"))
    return psi_from_counts(sb, binc, tot)


HOF_BIG = 0.25  # exactly representable in binary — safe float/double cmp


@query(
    "q74_higher_order_fns",
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           len(list_filter(embedding, x -> x > {HOF_BIG})) > 0 AS has_big,
           len(list_filter(embedding, x -> NOT (abs(x::DOUBLE) < 1.0))) = 0
             AS all_small,
           round(list_reduce(
             list_transform(embedding, x -> abs(x::DOUBLE)),
             (a, x) -> a + x), 4) AS l1,
           round(list_reduce(
             list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
             (a, x) -> a + x), 4) AS sq_sum
    FROM embeddings
    """,
    tags=("relational", "nested", "lambda"),
)
def q74_higher_order_fns(spark, sf_dir):
    """SQL higher-order functions (SPARK-23908) over array<float>:
    filter, exists, forall, and aggregate (fold), each reduced to a
    scalar. The lambda surface q27_array_fns deliberately left out.

    Exactness: elements cast to DOUBLE before arithmetic (identical
    float→double widening both engines); folds are left-folds with an
    exact 0.0 identity, so the accumulation order — and thus the
    rounded result — is bit-identical to DuckDB's list_reduce over
    list_transform. Scale shape: embarrassingly-parallel per-row
    codegen expressions, one scan, no shuffle, no UDF."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
        F.expr(f"exists(embedding, x -> x > {HOF_BIG})").alias("has_big"),
        F.expr("forall(embedding, x -> abs(CAST(x AS DOUBLE)) < 1.0)").alias(
            "all_small"
        ),
        F.round(
            F.expr(
                "aggregate(embedding, 0D, (a, x) -> a + abs(CAST(x AS DOUBLE)))"
            ),
            4,
        ).alias("l1"),
        F.round(
            F.expr(
                "aggregate(embedding, 0D,"
                " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            ),
            4,
        ).alias("sq_sum"),
    )
