"""Round-12 queries: the AS-OF join family.

The one canonical "Spark lacks this, compose it" operator the engine
was still missing:

- ``events_asof_join``       backward AS-OF join (attribution): for each
                             purchase, the same user's most recent view
                             at-or-before the purchase instant. Spark has
                             no ASOF JOIN; the scalable rewrite is
                             union-tag + one per-key ordered window with
                             a last-non-null carry — one shuffle, no
                             range explosion (the Flink temporal-join /
                             pandas merge_asof shape). The oracle is
                             DuckDB's native ``ASOF LEFT JOIN``, so the
                             rewrite's equality to a real ASOF engine IS
                             the test. This is the LINEAR-STATE twin of
                             ``q32_asof_join`` (windows.py), which keeps
                             the naive range-join + row_number=1 plan: at
                             100 TB, q32 materializes every (purchase ×
                             all prior views) candidate before discarding
                             all but one, where the carry touches each
                             event exactly once; q32 is also INNER (drops
                             view-less purchases) — this one is LEFT.
- ``events_asof_tolerance``  the attribution report built on the same
                             carry: per-user purchase counts, matches,
                             matches within a 3-day tolerance window
                             (ASOF + tolerance, pandas ``merge_asof
                             (tolerance=...)`` semantics), and the mean
                             attributed view→purchase gap.
(The round also gate-promotes ``layout_zorder`` — pipeline_extras' Morton
layout keys, the OPTIMIZE ZORDER primitive — which was oracle-backed but
never driver-recorded; see gate rotation #11 in queries/__init__.py.)

Reference parity: the reference pipeline (doc2dataset) has no join or
layout surface at all (its one join-adjacent op is a URL
``dropDuplicates``, /root/reference/examples/get_pdf_links_from_cc.py:126);
these extend the declared query families per SURVEY §2.3's growth rule.

Scale shape notes:
- The as-of carry is ONE window partitioned by ``user_id`` ordered by
  ``(ts, side, id)`` — per-key sequential state, massively parallel
  across keys, and the only shuffle is the hash partition by key. No
  inequality join, no per-row range scan, no candidate explosion. A
  severely hot key (one user with millions of events) would call for
  the time-bucketed two-phase variant; event keys here are users, whose
  per-key volume is organically bounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.operators.asof import asof_join
from doc2dataset_spark.queries.core import query
from doc2dataset_spark.session import load_table

# ---------------------------------------------------------------------------
# events_asof_join — backward as-of (attribution) via union + ordered carry
# ---------------------------------------------------------------------------

# Right side deduped to one row per (user_id, ts): DuckDB's ASOF picks
# *a* row at the winning timestamp but does not define which when the
# right side has duplicate (key, ts); collapsing ties with an integer
# argmax (max event_id) makes both engines deterministic on any corpus.
_VIEWS_DUCK = """
  SELECT user_id, ts, max_by(value, event_id) AS v_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
"""

_ASOF_DETAIL_DUCK = f"""
WITH v AS ({_VIEWS_DUCK}),
p AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS p_ts, p.value AS purchase_value,
       v.ts AS v_ts, v.v_value AS last_view_value,
       (epoch_us(p.ts) - epoch_us(v.ts))::BIGINT AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def _asof_carried(spark, sf_dir):
    """Purchases annotated with the last at-or-before view (ts, value)
    and the view→purchase gap in exact integer microseconds — the
    general ``operators/asof.asof_join`` (union-tag + per-key ordered
    carry; see that module for the full semantics and the pandas
    merge_asof parity tests) instantiated for attribution. Views are
    pre-collapsed per (user, ts) by integer argmax, the operator's
    uniqueness contract."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("v_value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    j = asof_join(
        purchases,
        views,
        on="ts",
        by=("user_id",),
        direction="backward",
        how="left",
        suffix="v_",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        "purchase_value",
        F.col("v_ts"),
        F.col("v_v_value").alias("last_view_value"),
        F.col("asof_gap").alias("gap_us"),
    )


@query(
    "events_asof_join",
    oracle=f"""
    SELECT event_id, user_id,
           strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           purchase_value,
           strftime(v_ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts,
           last_view_value, gap_us
    FROM ({_ASOF_DETAIL_DUCK})
    """,
    tags=("events", "join", "asof"),
)
def events_asof_join(spark, sf_dir):
    """Backward AS-OF LEFT join: each purchase picks the same user's
    most recent view at-or-before the purchase instant (ties at the
    exact instant match, per ASOF ``>=``); purchases with no prior view
    survive with NULLs. The oracle is DuckDB's native ASOF LEFT JOIN —
    the union+carry rewrite must reproduce a real ASOF engine exactly,
    including the NULL extension and integer-microsecond gaps."""
    c = _asof_carried(spark, sf_dir)
    return c.select(
        "event_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
        "last_view_value",
        "gap_us",
    )


# ---------------------------------------------------------------------------
# events_asof_tolerance — per-user attribution report with a 3-day window
# ---------------------------------------------------------------------------

ASOF_TOL_US = 3 * 24 * 3600 * 1_000_000  # 3-day attribution tolerance


@query(
    "events_asof_tolerance",
    oracle=f"""
    WITH d AS ({_ASOF_DETAIL_DUCK})
    SELECT user_id,
           count(*)::BIGINT AS n_purchases,
           SUM(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_matched,
           SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= {ASOF_TOL_US}
                    THEN 1 ELSE 0 END)::BIGINT AS n_attributed,
           CASE WHEN SUM(CASE WHEN gap_us IS NOT NULL
                              AND gap_us <= {ASOF_TOL_US}
                         THEN 1 ELSE 0 END) > 0
                THEN round(
                  (SUM(CASE WHEN gap_us IS NOT NULL
                            AND gap_us <= {ASOF_TOL_US}
                       THEN gap_us END)::BIGINT)::DOUBLE
                  / SUM(CASE WHEN gap_us IS NOT NULL
                             AND gap_us <= {ASOF_TOL_US}
                        THEN 1 ELSE 0 END)
                  / 1000000.0, 4)
           END AS avg_gap_seconds
    FROM d GROUP BY user_id
    """,
    tags=("events", "join", "asof", "stats"),
)
def events_asof_tolerance(spark, sf_dir):
    """AS-OF with tolerance (pandas ``merge_asof(tolerance=...)``
    semantics), aggregated into the attribution report: per user — how
    many purchases, how many had ANY prior view, how many had one within
    3 days, and the mean attributed view→purchase gap in seconds. The
    gap mean is exact-integer-summed (microsecond bigints) before the
    one identically-ordered double division, so both engines agree
    bit-for-bit."""
    attributed = F.col("gap_us").isNotNull() & (
        F.col("gap_us") <= F.lit(ASOF_TOL_US)
    )
    c = _asof_carried(spark, sf_dir)
    g = c.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum(F.col("gap_us").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_matched"),
        F.sum(attributed.cast("int")).cast("bigint").alias("n_attributed"),
        F.sum(F.when(attributed, F.col("gap_us")))
        .cast("bigint")
        .alias("sum_gap_us"),
    )
    return g.select(
        "user_id",
        "n_purchases",
        "n_matched",
        "n_attributed",
        F.when(
            F.col("n_attributed") > 0,
            F.round(
                F.col("sum_gap_us").cast("double")
                / F.col("n_attributed")
                / F.lit(1000000.0),
                4,
            ),
        ).alias("avg_gap_seconds"),
    )


# ---------------------------------------------------------------------------
# events_asof_nearest — nearest-direction as-of (two-sided match)
# ---------------------------------------------------------------------------


@query(
    "events_asof_nearest",
    oracle=f"""
    WITH v AS ({_VIEWS_DUCK}),
    p AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT p.event_id, v.ts AS m_ts, v.v_value AS m_val
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    ),
    f AS (
      SELECT p.event_id, v.ts AS m_ts, v.v_value AS m_val
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(CASE
             WHEN b.m_ts IS NULL THEN f.m_ts
             WHEN f.m_ts IS NULL THEN b.m_ts
             WHEN epoch_us(p.ts) - epoch_us(b.m_ts)
                  <= epoch_us(f.m_ts) - epoch_us(p.ts) THEN b.m_ts
             ELSE f.m_ts END, '%Y-%m-%d %H:%M:%S') AS near_view_ts,
           CASE
             WHEN b.m_ts IS NULL THEN f.m_val
             WHEN f.m_ts IS NULL THEN b.m_val
             WHEN epoch_us(p.ts) - epoch_us(b.m_ts)
                  <= epoch_us(f.m_ts) - epoch_us(p.ts) THEN b.m_val
             ELSE f.m_val END AS near_view_value,
           (epoch_us(p.ts) - epoch_us(CASE
             WHEN b.m_ts IS NULL THEN f.m_ts
             WHEN f.m_ts IS NULL THEN b.m_ts
             WHEN epoch_us(p.ts) - epoch_us(b.m_ts)
                  <= epoch_us(f.m_ts) - epoch_us(p.ts) THEN b.m_ts
             ELSE f.m_ts END))::BIGINT AS gap_us
    FROM p LEFT JOIN b ON b.event_id = p.event_id
           LEFT JOIN f ON f.event_id = p.event_id
    """,
    tags=("events", "join", "asof"),
)
def events_asof_nearest(spark, sf_dir):
    """NEAREST-direction as-of: each purchase picks the view closest in
    absolute time, either side, exact ties preferring backward (the
    pandas merge_asof rule, pinned in tests/test_asof_operator.py). The
    Spark side is ONE operator call (asof_join direction='nearest' —
    both carries over the same single exchange); DuckDB has no nearest
    ASOF, so the oracle composes it from its native backward and forward
    ASOF joins plus the tie CASE — the two engines reach the same rows
    by structurally different routes, which is exactly what makes the
    hash equality evidential. gap_us is signed: positive = matched view
    precedes the purchase, negative = it follows."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("v_value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        purchases,
        views,
        on="ts",
        by=("user_id",),
        direction="nearest",
        how="left",
        suffix="v_",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("near_view_ts"),
        F.col("v_v_value").alias("near_view_value"),
        F.col("asof_gap").alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# events_asof_forward — forward-direction as-of (next-view latency)
# ---------------------------------------------------------------------------


@query(
    "events_asof_forward",
    oracle=f"""
    WITH v AS ({_VIEWS_DUCK}),
    p AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS next_view_ts,
           v.v_value AS next_view_value,
           (epoch_us(p.ts) - epoch_us(v.ts))::BIGINT AS gap_us
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
    tags=("events", "join", "asof"),
)
def events_asof_forward(spark, sf_dir):
    """FORWARD-direction as-of: each purchase picks the same user's
    EARLIEST view at-or-after it (post-purchase re-engagement latency —
    the other temporal direction product analytics asks for). One
    operator call exercising asof_join's forward carry (a trailing
    last-non-null scan over DESCENDING time — the frame shape Spark
    evaluates incrementally); the oracle is DuckDB's native forward ASOF LEFT
    JOIN (``p.ts <= v.ts``), completing the trio of externally-judged
    directions: backward and forward against a real ASOF engine, nearest
    against their composition. gap_us keeps the operator's left-minus-
    right sign convention, so forward matches are <= 0."""
    e = load_table(spark, sf_dir, "events")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("v_value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(
        purchases,
        views,
        on="ts",
        by=("user_id",),
        direction="forward",
        how="left",
        suffix="v_",
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("next_view_ts"),
        F.col("v_v_value").alias("next_view_value"),
        F.col("asof_gap").alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# events_hypertable_rollup — multi-granularity continuous aggregate
# ---------------------------------------------------------------------------

_HT_FMT = "yyyy-MM-dd HH:mm:ss"


def _ht_level(df, src_bucket: str, granularity: str):
    """Re-aggregate finer partials into one coarser granularity —
    exact-decimal sums, so the fold is algebraically lossless."""
    return (
        df.groupBy(
            F.date_trunc(granularity, F.col(src_bucket)).alias("bucket")
        )
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("dec_total").cast("decimal(38,6)").alias("dec_total"),
        )
    )


def _ht_emit(df, granularity: str):
    return df.select(
        F.lit(granularity).alias("granularity"),
        F.date_format("bucket", _HT_FMT).alias("bucket"),
        "n_events",
        F.round(F.col("dec_total"), 4).cast("double").alias("total"),
    )


_HT_DUCK_LEVEL = """
  SELECT '{g}' AS granularity,
         strftime(date_trunc('{g}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         count(*)::BIGINT AS n_events,
         round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS total
  FROM events GROUP BY 2
"""


@query(
    "events_hypertable_rollup",
    oracle=" UNION ALL ".join(
        _HT_DUCK_LEVEL.format(g=g) for g in ("hour", "day", "month")
    ),
    tags=("events", "rollup", "timeseries"),
)
def events_hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate (TimescaleDB's cagg /
    materialized rollup shape): ONE pass computes hourly partials
    (count + exact-decimal sum, map-side combinable), then day and
    month are served by RE-AGGREGATING the finer level — hour → day →
    month, each fold algebraically lossless because the partials stay
    DECIMAL(38,6) until the final round. The oracle computes every
    granularity DIRECTLY from raw events, so the hash equality proves
    the re-aggregation chain loses nothing — the contract that lets a
    100 TB deployment persist only hourly partials and serve any
    coarser granularity without touching raw data again. The hourly
    frame is localCheckpoint'd (modeling the materialized partial
    store) so the three-level union reads raw events once."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("dec_total"),
        )
        .localCheckpoint(eager=False)
    )
    daily = _ht_level(hourly, "bucket", "day").localCheckpoint(eager=False)
    monthly = _ht_level(daily, "bucket", "month")
    return (
        _ht_emit(hourly, "hour")
        .unionByName(_ht_emit(daily, "day"))
        .unionByName(_ht_emit(monthly, "month"))
    )
