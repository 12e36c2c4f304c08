"""Bottom-k (KMV) sample sketch: the third mergeable-sketch family
(after count-min and Bloom) — a deterministic uniform sample that
doubles as a distinct-count estimator, and the rare sketch whose CONTENT
is bit-reproducible, so the whole thing is exact-oracle-gated rather
than tolerance-tested.

The k rows with the SMALLEST md5(key) are a uniform sample of the
distinct keys (the hash is the random draw; md5 is fixed, so every
engine, partitioning, and rerun picks the identical k rows). Properties
that matter at 100 TB:

- **Mergeable**: bottom-k of a union == bottom-k of the per-part
  bottom-k's — partials are k rows each regardless of input size
  (pytest-pinned; the streaming twin lands per-batch partials like the
  CMS module).
- **Distributed top-k**: ``orderBy(hash).limit(k)`` compiles to
  TakeOrderedAndProject — per-partition heads merged on the driver-side
  single collect of k rows, never a global sort (the registry's
  no-unpartitioned-window rule).
- **KMV estimator**: with U = k-th smallest hash as a fraction of the
  hash space, distinct ≈ (k-1)/U (Bar-Yossef et al. 2002, the K-Minimum
  Values sketch) — deterministic here, so the estimate itself
  hash-matches the oracle.
- **Sample-based quantiles**: exact interpolated percentiles OF THE
  SAMPLE (Spark ``percentile`` == DuckDB ``quantile_cont``, the
  agg_percentiles precedent) approximate corpus quantiles with k-sample
  error; the VALUES are deterministic, the approximation error is the
  declared semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.session import load_table

BOTTOMK_K = 256
_HASH_SPACE = float(1 << 48)  # 12 hex digits


def _hex_col(key: str):
    return F.md5(F.col(key).cast("string"))


def _hv_col(key: str):
    return F.expr(
        f"cast(conv(substring(md5(cast({key} AS string)), 1, 12), 16, 10)"
        " AS bigint)"
    )


def bottomk_sample(df, key: str, k: int = BOTTOMK_K):
    """The k rows with the smallest md5(key): deterministic uniform
    sample, TakeOrderedAndProject plan. Carries ``h`` (full hex, the
    order key) and ``hv`` (48-bit numeric prefix, the estimator input)."""
    return (
        df.select(
            "*", _hex_col(key).alias("h"), _hv_col(key).alias("hv")
        )
        .orderBy("h")
        .limit(k)
    )


@query(
    "agg_bottomk_sketch",
    oracle=f"""
    WITH s AS (
      SELECT value,
             md5(event_id::VARCHAR) AS h,
             ('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT AS hv
      FROM events ORDER BY h LIMIT {BOTTOMK_K}
    )
    SELECT {BOTTOMK_K} AS k,
           round(({BOTTOMK_K} - 1)
                 / (max(hv)::DOUBLE / {_HASH_SPACE}), 4) AS distinct_est,
           round(quantile_cont(value, 0.5), 4) AS p50_est,
           round(quantile_cont(value, 0.9), 4) AS p90_est
    FROM s
    """,
    tags=("sketch", "events", "sampling"),
)
def agg_bottomk_sketch(spark, sf_dir):
    """One-row KMV sketch summary over events: the k-minimum-values
    distinct estimate plus sample-based p50/p90 of ``value`` — all
    deterministic, so the oracle hash-matches the ESTIMATES, not just
    row counts (KMV truth check: 10k distinct event_ids at sf0.01; the
    estimate lands within the ~1/sqrt(k) ≈ 6% KMV error band, asserted
    in tests/test_sketch_sample.py).

    Scale shape: the sample is TakeOrderedAndProject (k rows per
    partition head, no global sort); the summary aggregates 256 rows.
    At 100 TB the sketch is the only thing that moves — k rows —
    regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    s = bottomk_sample(ev, "event_id")
    return s.agg(
        F.lit(BOTTOMK_K).alias("k"),
        F.round(
            (BOTTOMK_K - 1)
            / (F.max("hv").cast("double") / F.lit(_HASH_SPACE)),
            4,
        ).alias("distinct_est"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_est"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90_est"),
    )
