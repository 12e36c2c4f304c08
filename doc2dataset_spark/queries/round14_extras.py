"""Round-14 queries: late-data handling for the incremental cagg.

The round-13 verdict's one streaming asymmetry: the as-of family has
both ordered-enforced AND watermarked-late variants, but the hypertable
ingest had only the unbounded path — arrival-order-insensitive (the
fold is a commutative monoid) yet with NO finality surface: a consumer
could never cache an hour's row, because any batch may legally touch
any hour forever. streaming/hypertable.py now carries the watermarked
ingest (lateness bound + per-batch wm sidecar + invalidation
accounting + refusal below the watermark) and ``serve_hypertable_final``
(only buckets the watermark has sealed — immutable forever). These two
rows judge it externally:

- ``rollup_hypertable_late``   the full serve over a log built by an
                               OUT-OF-ORDER replay through the late
                               ingest (event_id-mod slices: every batch
                               after the first is almost entirely
                               "late"), hash-matched to the direct-from-
                               raw rollup oracle VERBATIM — re-opened-
                               bucket re-folds equal one recompute.
- ``rollup_hypertable_final``  the SEALED prefix under a real lateness
                               bound over a delayed-arrival slicing;
                               the oracle recomputes per-granularity
                               buckets from raw and keeps only those
                               whose end ≤ (global max ts − bound) —
                               external proof the finality filter
                               seals exactly the provably-complete
                               buckets.
- ``events_asof_auto``         the ``bucket="auto"`` plan chooser
                               (operators/asof.resolve_auto_bucket)
                               sharing events_asof_join's native-ASOF
                               oracle VERBATIM, budget forced low so
                               the gate judges the BUCKETED branch of
                               the decision.

Reference parity: the reference pipeline has no streaming or rollup
surface at all (its incremental seam is re-running the downloader,
/root/reference/doc2dataset/main.py:142-143); these extend the engine's
hypertable family per the training-data-pipeline mandate.

Scale notes: ingest stays ≤|hours touched| partial rows per batch; the
wm sidecar is one row per batch; the finality filter is a per-level
predicate on the folded hours (no extra pass over partials); the
refusal check is one min() over the incoming batch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.session import load_table

_US = 1_000_000
_DAY_US = 24 * 3600 * _US

# rollup_hypertable_late: mod slices are maximally disordered, so the
# bound must cover the full event span (~30 days in the testdata)
_LATE_BOUND_US = 60 * _DAY_US
# rollup_hypertable_final: a REAL bound — events arrive in calendar-week
# order except a delayed mod-cohort that shows up one batch late (up to
# ~7 days after its event time), so the 8-day bound clears the 7-day
# slice width by a full day for ANY event-time distribution; the
# watermark still sweeps across the corpus and seals ~22 of the 30
# days while the tail stays pending
_FINAL_BOUND_US = 8 * _DAY_US
_N_SLICES = 4

# calendar-week slice boundaries (shared by the finality and
# dead-letter fixtures): fixed constants, valid for the January-2024
# event span at every SF
_DL_WEEKS = ["2024-01-08", "2024-01-15", "2024-01-22"]


def _build_ht_late_log(spark, sf_dir, tmp: str) -> None:
    """Out-of-order replay through the REAL watermarked per-batch core
    (ingest_hypertable_late_batch — the same function the streaming
    foreachBatch closure calls): four event_id-mod slices, so every
    batch after the first carries events below the prior max (late) for
    hours that already hold partials (re-opened). The builder asserts
    the disorder was real — late rows and re-opened hours both counted
    by the invalidation accounting."""
    from doc2dataset_spark.streaming.hypertable import (
        ingest_hypertable_late_batch,
    )

    e = load_table(spark, sf_dir, "events")
    late = reopened = 0
    for i in range(_N_SLICES):
        snap = ingest_hypertable_late_batch(
            e.filter(F.pmod("event_id", F.lit(_N_SLICES)) == i),
            tmp,
            batch_id=i,
            lateness_us=_LATE_BOUND_US,
        )
        late += snap["n_late_rows"]
        reopened += snap["n_reopened_hours"]
    assert late > 0 and reopened > 0, (late, reopened)


def _build_ht_final_log(spark, sf_dir, tmp: str) -> None:
    """Realistic late arrival for the finality row: slice events into
    CALENDAR WEEKS (fixed constants — a code-review pass flagged the
    earlier percentile quartiles as data-distribution-dependent: a
    skewed corpus could make one quartile wider than the 8-day bound
    and refuse mid-build), but DELAY a fixed mod-cohort
    (event_id % 8 == 3) of each week into the NEXT batch — those
    events land below the prior batch's max (genuinely late,
    re-opening their hour buckets) yet above the prior watermark (the
    8-day bound exceeds the 7-day slice width by a full day, for ANY
    event-time distribution inside the span), so the replay is
    accepted end to end. The last slice's cohort arrives with its own
    batch (nothing later to delay into)."""
    from doc2dataset_spark.streaming.hypertable import (
        ingest_hypertable_late_batch,
    )

    e = load_table(spark, sf_dir, "events")
    w = [F.to_timestamp(F.lit(d)) for d in _DL_WEEKS]
    cuts = [None, *w, None]
    delayed = F.pmod("event_id", F.lit(8)) == 3

    def in_slice(i):
        cond = F.lit(True)
        if cuts[i] is not None:
            cond = cond & (F.col("ts") >= cuts[i])
        if cuts[i + 1] is not None:
            cond = cond & (F.col("ts") < cuts[i + 1])
        return cond

    late = 0
    for i in range(_N_SLICES):
        arrives_now = in_slice(i) & ~delayed
        if i:
            arrives_now = arrives_now | (in_slice(i - 1) & delayed)
        if i == _N_SLICES - 1:
            arrives_now = arrives_now | (in_slice(i) & delayed)
        snap = ingest_hypertable_late_batch(
            e.filter(arrives_now),
            tmp,
            batch_id=i,
            lateness_us=_FINAL_BOUND_US,
        )
        late += snap["n_late_rows"]
    assert late > 0, "delayed cohort never arrived late — fixture broken"


def _cached_late_log(spark, sf_dir, kind: str, build_fn) -> str:
    from doc2dataset_spark.fsio import (
        artifact_cache_dir,
        ensure_local_cache_dir,
    )

    target = artifact_cache_dir(sf_dir, kind, "events")

    def build(tmp: str) -> None:
        build_fn(spark, sf_dir, tmp)

    return ensure_local_cache_dir(target, "hourly", build)


@query(
    "rollup_hypertable_late",
    oracle=None,  # set below: events_hypertable_rollup's oracle VERBATIM
    tags=("events", "rollup", "timeseries", "streaming", "late-data"),
)
def rollup_hypertable_late(spark, sf_dir):
    """The watermarked cagg ingest under an OUT-OF-ORDER replay
    (round-13 verdict, Next round #1): four event_id-mod slices through
    ingest_hypertable_late_batch — every batch after the first is
    almost entirely below the prior max, so nearly every hour bucket is
    re-opened inside the lateness window and re-folded at serve. The
    oracle is events_hypertable_rollup's direct-from-raw SQL VERBATIM:
    the driver hash row externally proves the invalidation/re-fold path
    loses nothing vs a one-pass recompute. The refusal edge (an event
    BELOW the watermark) and stream==batch over ordered/shuffled/
    late-edge fixtures are pinned by tests/test_streaming_hypertable."""
    from doc2dataset_spark.streaming.hypertable import serve_hypertable

    return serve_hypertable(
        spark, _cached_late_log(spark, sf_dir, "htlate", _build_ht_late_log)
    )


_HT_FINAL_DUCK_LEVEL = f"""
  SELECT '{{g}}' AS granularity,
         strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
         n_events, total
  FROM (
    SELECT date_trunc('{{g}}', ts) AS b,
           count(*)::BIGINT AS n_events,
           round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS total
    FROM events GROUP BY 1
  )
  WHERE epoch_us(b + INTERVAL 1 {{g}})
        <= (SELECT max(epoch_us(ts)) - {_FINAL_BOUND_US} FROM events)
"""


@query(
    "rollup_hypertable_final",
    oracle=" UNION ALL ".join(
        _HT_FINAL_DUCK_LEVEL.format(g=g) for g in ("hour", "day", "month")
    ),
    tags=("events", "rollup", "timeseries", "late-data", "finality"),
)
def rollup_hypertable_final(spark, sf_dir):
    """The SEALED prefix of the watermarked cagg: only buckets whose end
    the watermark (global max event ts − 8-day bound) has passed — the
    rows a downstream cache may hold forever. Built by a
    delayed-arrival replay (calendar weeks with a one-batch-late
    mod-cohort, all inside the bound), served by serve_hypertable_final.
    The oracle
    recomputes each granularity from raw and applies the SAME
    end-≤-watermark filter, so the hash proves the finality surface
    seals exactly the provably-complete buckets — an hour seals when wm
    crosses its end, a day only when its whole day has, a month its
    whole month (January never seals in the 30-day fixture: the month
    level is legitimately empty, which the shared hash also checks)."""
    from doc2dataset_spark.streaming.hypertable import (
        serve_hypertable_final,
    )

    return serve_hypertable_final(
        spark,
        _cached_late_log(spark, sf_dir, "htfinal", _build_ht_final_log),
    )


# share the direct-from-raw oracle VERBATIM (the keep_best /
# hypertable_incremental trick): one SQL string, independently-built
# Spark plans hash-matched to it
from doc2dataset_spark.queries.core import REGISTRY as _REG  # noqa: E402

_REG["rollup_hypertable_late"].oracle = _REG[
    "events_hypertable_rollup"
].oracle


@query(
    "events_asof_auto",
    oracle=None,  # set below: events_asof_join's oracle VERBATIM
    tags=("events", "join", "asof", "cbo"),
)
def events_asof_auto(spark, sf_dir):
    """The backward attribution served by ``bucket="auto"`` (the
    CBO-style plan choice, operators/asof.resolve_auto_bucket): one
    ANALYZE aggregate picks plain-vs-bucketed from the hottest key's
    (rows, time-span), then the chosen carry runs. Shares
    events_asof_join's oracle VERBATIM — the driver hash row externally
    proves auto == plain == DuckDB's native ASOF LEFT JOIN, whichever
    physical plan the stats picked (the warm==cold /
    bucketed==plain gate trick applied to the plan chooser). The budget
    is forced below the corpus's hot-key volume so the row exercises
    the BUCKETED branch of the decision (the plain branch is the
    default everywhere else the oracle already judges)."""
    from doc2dataset_spark.operators.asof import asof_join

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
        bucket="auto",
        auto_partition_budget=8,  # force the bucketed branch
    )
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
        F.col("v_v_value").alias("last_view_value"),
        F.col("asof_gap").alias("gap_us"),
    )


_REG["events_asof_auto"].oracle = _REG["events_asof_join"].oracle


@query(
    "rollup_hypertable_gapfill",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, count(*)::BIGINT AS n,
             round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS t
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT unnest(generate_series((SELECT min(b) FROM h),
                                    (SELECT max(b) FROM h),
                                    INTERVAL 1 HOUR)) AS b
    )
    SELECT strftime(g.b, '%Y-%m-%d %H:%M:%S') AS bucket,
           coalesce(h.n, 0) AS n_events,
           h.t AS total,
           last_value(h.t IGNORE NULLS) OVER (
             ORDER BY g.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS total_locf
    FROM g LEFT JOIN h ON g.b = h.b
    """,
    tags=("events", "rollup", "timeseries", "gapfill"),
)
def rollup_hypertable_gapfill(spark, sf_dir):
    """TimescaleDB's ``time_bucket_gapfill`` + ``locf`` over the SERVED
    cagg: densify the hourly level to a gapless grid (empty hours emit
    n_events=0, total NULL) and carry the last observed total forward.
    Serves from the PERSISTED hourly-partial log (the round-13
    incremental cagg cache — raw events are never read), so this is
    the dashboard query a hypertable deployment actually runs.

    Scale shape: the grid is built with ``sequence()`` from the fold's
    own min/max (one row), and the LOCF carry is the repo's OWN
    ``asof_join`` in its BUCKETED two-phase form (7-day buckets, a
    constant join key): phase-2 windows partition by (key, week) —
    bounded by per-week grid size (168 rows + observed hours) no
    matter how many years of history the cagg holds — and phase 1
    carries week summaries, O(weeks) rows. No unpartitioned window
    anywhere, so the registry-wide single-partition gate holds without
    a whitelist entry; a present hour matches itself (asof_gap 0) and
    a gap hour matches the latest earlier hour — LOCF IS a backward
    as-of join, which is why the operator composes here. The oracle
    recomputes from raw with generate_series + IGNORE-NULLS last_value.
    At sf0.01+ the fixture has no empty hours (the join is the
    identity); the gap behavior itself is pinned by pytest at sf0.001,
    where 189 of 720 grid hours are empty."""
    from doc2dataset_spark.queries.round13_extras import _cached_ht_log
    from doc2dataset_spark.streaming.hypertable import (
        serve_hypertable_gapfill,
    )

    return serve_hypertable_gapfill(
        spark, _cached_ht_log(spark, sf_dir, False)
    )


# --------------------------------------------------------------------------
# dead-letter (on_late="drop") judged externally
# --------------------------------------------------------------------------
# Fixture: four CALENDAR-WEEK slices of January (constants — no
# data-dependent cuts), with week 0's mod-cohort (event_id % 16 == 5)
# withheld until the LAST batch. By then the watermark sits ~8 days
# behind the max non-cohort event of week 3's predecessor (≈ Jan 14),
# a ≥6-day margin above every week-0 timestamp (< Jan 8), so the
# ENTIRE delayed cohort is unambiguously dead-lettered at any SF — the
# kept set is exactly "all events except week-0 cohort members", which
# the oracle can state as a CONSTANT predicate. Week boundaries are the
# module-level _DL_WEEKS constants shared with the finality fixture.


def _build_ht_deadletter_log(spark, sf_dir, tmp: str) -> None:
    from doc2dataset_spark.streaming.hypertable import (
        ingest_hypertable_late_batch,
    )

    e = load_table(spark, sf_dir, "events")
    cohort = F.pmod("event_id", F.lit(16)) == 5
    w = [F.to_timestamp(F.lit(d)) for d in _DL_WEEKS]
    slices = [
        (F.col("ts") < w[0]) & ~cohort,
        (F.col("ts") >= w[0]) & (F.col("ts") < w[1]),
        (F.col("ts") >= w[1]) & (F.col("ts") < w[2]),
        (F.col("ts") >= w[2]) | ((F.col("ts") < w[0]) & cohort),
    ]
    dropped = 0
    for i, cond in enumerate(slices):
        snap = ingest_hypertable_late_batch(
            e.filter(cond),
            tmp,
            batch_id=i,
            lateness_us=_FINAL_BOUND_US,
            on_late="drop",
        )
        dropped += snap["n_dropped_rows"]
    # the whole delayed cohort must have been dead-lettered, and only it
    want = e.filter(cohort & (F.col("ts") < w[0])).count()
    assert dropped == want and dropped > 0, (dropped, want)


@query(
    "rollup_hypertable_deadletter",
    oracle="""
    SELECT * FROM (
    """
    + " UNION ALL ".join(
        """
      SELECT '{g}' AS granularity,
             strftime(date_trunc('{g}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             count(*)::BIGINT AS n_events,
             round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS total
      FROM events
      WHERE NOT (event_id % 16 = 5 AND ts < TIMESTAMP '2024-01-08')
      GROUP BY 2
    """.format(g=g)
        for g in ("hour", "day", "month")
    )
    + ")",
    tags=("events", "rollup", "timeseries", "late-data", "dead-letter"),
)
def rollup_hypertable_deadletter(spark, sf_dir):
    """on_late='drop' judged externally: a calendar-week replay whose
    week-0 mod-cohort arrives three weeks late — far below the
    watermark — through the REAL per-batch core in dead-letter mode.
    The violators divert to the rejected log (the builder asserts the
    dropped count equals the cohort exactly); the serve is hash-matched
    to an oracle whose WHERE clause states the kept set as a constant
    predicate (everything except week-0 cohort members). Proves the two
    sides of the dead-letter contract at once: dropped rows NEVER leak
    into the fold, and nothing else is lost with them. Sealed-bucket
    immutability and the sidecar counts are pytest-pinned
    (tests/test_streaming_hypertable.py drop-mode test)."""
    from doc2dataset_spark.streaming.hypertable import serve_hypertable

    return serve_hypertable(
        spark,
        _cached_late_log(spark, sf_dir, "htdl", _build_ht_deadletter_log),
    )
