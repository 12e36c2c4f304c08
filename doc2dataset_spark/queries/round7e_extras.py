"""Round-7 session-5 extras: temperature-based mixture sampling.

``sample_temperature_mix`` — the XLM-R / mT5 multilingual sampling rule
q_i ∝ p_i^α applied engine-side at α = 1/2: token budget is allocated
across sources proportional to the SQUARE ROOT of their token share
(flattening the source distribution less aggressively than the uniform
target of ``sample_mixture_rebalance``), then documents are kept by
deterministic hash at each source's integer-ppm rate. Downsampling
only: rate capped at 1, upsampling is a training-loader concern.

Why α = 1/2 exactly: IEEE-754 requires sqrt to be CORRECTLY ROUNDED, so
``sqrt(share)`` is bit-identical in Spark and DuckDB, while a general
``pow(share, alpha)`` carries no such guarantee. The per-source weights
are quantized to 1e9-scaled bigints (the pagerank/kmeans recipe) so the
weight SUM is exact-integer, and the rate itself is computed in 128-bit
integer arithmetic — DECIMAL(38,0) ``div`` on the Spark side, HUGEINT
``//`` on the DuckDB side — so no double rounding can shift a rate by
1 ppm and change the kept set (headroom: total·w·1e6 ≤ ~1e28 « 1e38).

Scale shape (same as sample_mixture_rebalance): one map-side-combined
per-source token aggregate (|sources| rows), 1-row totals, a broadcast
rate join back onto documents, and a row-local hash compare. No shuffle
touches document rows.

Reference basis: the reference has no sampling at all; this is the
public multilingual-corpus sampling rule (Conneau et al. XLM-R §3.1,
Xue et al. mT5 §3.2) re-expressed as a deterministic engine operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.dedup import _DTOKS, _TOKS
from doc2dataset_spark.session import load_table

TM_PPM = 1_000_000
TM_WSCALE = 1_000_000_000  # sqrt-weight quantization (1e-9 resolution)


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({_DTOKS})::BIGINT AS n_tokens
      FROM documents
    ), st AS (
      SELECT source, sum(n_tokens)::BIGINT AS src_tokens
      FROM t GROUP BY source
    ), tot AS (
      SELECT sum(src_tokens)::BIGINT AS total FROM st
    ), w AS (
      SELECT source, src_tokens,
             CAST(round(sqrt(src_tokens::DOUBLE / (SELECT total FROM tot))
                        * {TM_WSCALE}) AS BIGINT) AS wi
      FROM st
    ), sw AS (
      SELECT sum(wi)::BIGINT AS sumw FROM w
    ), rates AS (
      SELECT source,
             CAST(least({TM_PPM}::HUGEINT,
                        ((SELECT total FROM tot)::HUGEINT * wi * {TM_PPM})
                        // ((SELECT sumw FROM sw)::HUGEINT * src_tokens))
                  AS BIGINT) AS rate_ppm
      FROM w
    )
    SELECT t.doc_id, t.source, r.rate_ppm
    FROM t JOIN rates r USING (source)
    WHERE ('0x' || substr(md5('tm' || t.doc_id::VARCHAR), 1, 12))::BIGINT
          % {TM_PPM} < r.rate_ppm
    """,
    tags=("pipeline", "sampling", "mixing"),
)
def sample_temperature_mix(spark, sf_dir):
    """α=1/2 temperature mixture: keep rates ∝ min(1, budget_i/tokens_i)
    with budget_i = total·sqrt(p_i)/Σ√p — sqrt-flattened source shares,
    exact-integer ppm rates, deterministic md5 keep set."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.expr(_TOKS)).cast("bigint").alias("n_tokens"),
    )
    st = d.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    tot = st.agg(F.sum("src_tokens").cast("bigint").alias("total"))
    w = st.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tokens",
        "total",
        F.expr(
            f"CAST(round(sqrt(CAST(src_tokens AS DOUBLE) / total)"
            f" * {TM_WSCALE}) AS BIGINT)"
        ).alias("wi"),
    )
    sw = w.agg(F.sum("wi").cast("bigint").alias("sumw"))
    rates = w.crossJoin(F.broadcast(sw)).select(
        "source",
        F.expr(
            f"CAST(least(CAST({TM_PPM} AS DECIMAL(38,0)),"
            f" (CAST(total AS DECIMAL(38,0)) * wi * {TM_PPM})"
            f" div (CAST(sumw AS DECIMAL(38,0)) * src_tokens))"
            f" AS BIGINT)"
        ).alias("rate_ppm"),
    )
    h = F.expr(
        "cast(conv(substring(md5(concat('tm', cast(doc_id AS string))),"
        " 1, 12), 16, 10) AS bigint)"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(h % TM_PPM < F.col("rate_ppm"))
        .select("doc_id", "source", "rate_ppm")
    )
