"""Time-series resampling extras: linear interpolation and bounded EWMA.

Round-7 continuation of the events time-series family
(``events_resample_ffill`` / ``events_max_concurrency`` in
``analytics_extras.py``):

- ``events_resample_interp``  gapless per-user day grid with LINEAR
                              interpolation between observed daily
                              totals — the other standard regularizer
                              next to LOCF, used when the series is a
                              level (not a counter) and forward-fill
                              would bias the model.
- ``events_ewma``             bounded-horizon exponentially weighted
                              moving average (alpha = 1/2, last
                              ``EWMA_H`` observations) over each user's
                              daily series — the classic smoothing
                              feature, made bit-exact cross-engine by
                              power-of-two weights.

Cross-engine exactness discipline (see ``queries/core.py``): daily
totals accumulate in DECIMAL(38,6) and become round-4 doubles; every
subsequent arithmetic step is written with the IDENTICAL operation
order in Spark and DuckDB so IEEE doubles agree bit-for-bit.  The EWMA
uses alpha = 1/2 deliberately: each fold step is ``acc * 0.5 + x``
where the multiply is an exact power-of-two scaling, so the only
rounding is the (identically ordered) additions.

Scale shape: the interpolation grid is bounded by users × span-days (a
parameter-shaped frame, not event count) and every window partitions by
user_id; the EWMA frame is ROWS-bounded at ``EWMA_H``.  No global
sorts, no unpartitioned windows, raw events never pass through a
window — the same discipline the registry plan gate enforces.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.session import load_table

EWMA_H = 8  # EWMA horizon: newest EWMA_H observations, weights 2^-i

_DAILY_SQL = """
      SELECT user_id, date_trunc('day', ts) AS day,
             round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS day_value
      FROM events GROUP BY user_id, day
"""


def _daily_totals(e):
    """Per-user daily value totals as round-4 doubles (exact decimal
    accumulation — the `dsum` contract, kept inline because the grouped
    day column rides along)."""
    return e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(38,6)")), 4)
        .cast("double")
        .alias("day_value")
    )


@query(
    "events_resample_interp",
    oracle=f"""
    WITH b AS (
      SELECT user_id, min(date_trunc('day', ts)) AS lo,
             max(date_trunc('day', ts)) AS hi
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM b
    ), daily AS ({_DAILY_SQL}
    ), joined AS (
      SELECT g.user_id, g.day, d.day_value,
             d.day_value IS NOT NULL AS observed,
             CASE WHEN d.day_value IS NOT NULL THEN g.day END AS obs_day
      FROM grid g LEFT JOIN daily d
        ON d.user_id = g.user_id AND d.day = g.day
    ), carried AS (
      SELECT user_id, day, day_value, observed,
             last_value(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS prv_val,
             last_value(obs_day IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS prv_day,
             first_value(day_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt_val,
             first_value(obs_day IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt_day
      FROM joined
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, observed,
           CASE WHEN observed THEN day_value
                ELSE round(prv_val + (nxt_val - prv_val) *
                     (CAST(date_diff('day', prv_day, day) AS DOUBLE) /
                      CAST(date_diff('day', prv_day, nxt_day) AS DOUBLE)), 4)
           END AS value_interp
    FROM carried
    """,
    tags=("analytics", "events", "timeseries"),
)
def events_resample_interp(spark, sf_dir):
    """Regular-grid resampling with LINEAR interpolation: each user's
    daily value series on a gapless day grid spanning first-to-last
    activity, missing days taking the straight line between the
    bracketing observed days:

        v(day) = prv + (nxt - prv) * (day - prv_day) / (nxt_day - prv_day)

    The grid's first and last days are observed by construction (lo/hi
    come from min/max activity), so interior gaps always have both
    brackets and the division is never 0/0.  Day totals use the exact
    decimal SUM; the interpolation arithmetic is written in the same
    operation order as the DuckDB oracle, so the doubles agree exactly.

    Scale shape: identical to events_resample_ffill — the explode is
    bounded by users × span-days (parameter-shaped), daily totals are
    map-side combinable, and both carry windows partition per user over
    the bounded grid.  Raw events never pass through a window."""
    e = load_table(spark, sf_dir, "events")
    b = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = b.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        ),
    )
    j = grid.join(_daily_totals(e), ["user_id", "day"], "left").select(
        "user_id",
        "day",
        "day_value",
        F.col("day_value").isNotNull().alias("observed"),
        F.when(F.col("day_value").isNotNull(), F.col("day")).alias("obs_day"),
    )
    back = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # forward carry on DESCENDING day: trailing frames are evaluated
    # incrementally, currentRow->unboundedFollowing frames re-aggregate
    # per row — O(span²) per user on multi-year grids (the round-13
    # as-of frame lesson, BASELINE.md "window-frame lesson")
    fwd = (
        W.partitionBy("user_id")
        .orderBy(F.col("day").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = j.select(
        "user_id",
        "day",
        "day_value",
        "observed",
        F.last("day_value", ignorenulls=True).over(back).alias("prv_val"),
        F.last("obs_day", ignorenulls=True).over(back).alias("prv_day"),
        F.last("day_value", ignorenulls=True).over(fwd).alias("nxt_val"),
        F.last("obs_day", ignorenulls=True).over(fwd).alias("nxt_day"),
    )
    frac = F.datediff("day", "prv_day").cast("double") / F.datediff(
        "nxt_day", "prv_day"
    ).cast("double")
    return carried.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "observed",
        F.when(F.col("observed"), F.col("day_value"))
        .otherwise(
            F.round(
                F.col("prv_val")
                + (F.col("nxt_val") - F.col("prv_val")) * frac,
                4,
            )
        )
        .alias("value_interp"),
    )


@query(
    "events_ewma",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}
    ), framed AS (
      SELECT user_id, day, day_value,
             list(day_value) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN {EWMA_H - 1} PRECEDING AND CURRENT ROW) AS arr
      FROM daily
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, day_value,
           CAST(len(arr) AS INT) AS n_obs,
           round(
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr),
                         (acc, x) -> acc * 0.5 + x) /
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list_transform(arr, x -> CAST(1.0 AS DOUBLE))),
               (acc, x) -> acc * 0.5 + x), 4) AS ewma
    FROM framed
    """,
    tags=("analytics", "events", "timeseries"),
)
def events_ewma(spark, sf_dir):
    """Bounded-horizon EWMA (alpha = 1/2) over each user's daily value
    series: the adjusted exponentially weighted mean of the newest
    EWMA_H observations,

        ewma_t = sum_i 2^-i * x_{{t-i}} / sum_i 2^-i   (i = 0..n-1)

    computed as a left fold ``acc * 0.5 + x`` over the frame in day
    order (oldest first): the fold yields exactly the power-of-two
    weighted numerator, and the same fold over ones yields the
    normalizer.  Each multiply is an exact binary scaling, so the only
    rounding is the identically ordered additions — bit-exact across
    engines without a tolerance.

    Scale shape: per-user window with a ROWS frame bounded at EWMA_H —
    state per partition is O(H); daily totals are map-side combinable.
    The fold is a size-≤H array expression inside codegen, not a UDF."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-(EWMA_H - 1), W.currentRow)
    )
    framed = _daily_totals(e).select(
        "user_id",
        "day",
        "day_value",
        F.collect_list("day_value").over(w).alias("arr"),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc * F.lit(0.5) + x
    )
    return framed.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "day_value",
        F.size("arr").alias("n_obs"),
        F.round(
            fold(F.col("arr"))
            / fold(F.transform(F.col("arr"), lambda x: F.lit(1.0))),
            4,
        ).alias("ewma"),
    )
