"""Round-15 queries: right-to-be-forgotten for the hypertable cagg.

The round-14 verdict's one lifecycle asymmetry: every persisted index
has an RTBF deletion path (operators/index_maintenance), but the cagg
did not — and its new finality surface makes naive deletion WRONG: a
sealed bucket is promised immutable, yet GDPR erasure must re-open it
(TimescaleDB's decompress-and-invalidate problem).
streaming/hypertable.forget_hypertable_rows now carries the erasure —
subtract the forgotten rows' hourly contribution, collapse the
affected hours' per-batch history into the latest touched batch,
journal the revision with per-bucket seal flags, publish via the
transactional compaction swap. These rows judge it externally:

- ``rollup_hypertable_rtbf``        the full serve AFTER erasing a
                                    deterministic cohort from a
                                    watermark-sealed log, hash-matched
                                    to the direct-from-raw rollup
                                    oracle over the POST-DELETION
                                    corpus (``WHERE NOT cohort``) — the
                                    round-12 rollup SQL with one WHERE.
- ``rollup_hypertable_rtbf_audit``  the persisted RTBF journal served
                                    as a DataFrame, hash-matched to the
                                    cohort's own predicate-derived
                                    hours: which buckets were revised,
                                    how much was forgotten, and which
                                    were SEALED at apply time (bucket
                                    end ≤ global max ts − 8-day bound —
                                    the same watermark arithmetic
                                    rollup_hypertable_final's oracle
                                    states).

Reference parity: the reference has no deletion surface at all (a
re-run of /root/reference/doc2dataset/main.py regenerates from the
filtered url_list); this extends the engine's lifecycle mandate — every
persisted artifact must support build / append / compact / RTBF / time
travel.

Scale notes: the forget touches O(affected hours) driver-side state and
rewrites only the batch partitions containing them (untouched
partitions are renamed in); the audit journal is O(requests × affected
hours) — bounded by deletion activity, never corpus size.

Seal-audit semantics, crash-window retries (decided by journaled
pre/post state), as-of conservatism below the anchor, and
RTBF-then-replay idempotence are pinned by tests/test_hypertable_rtbf.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.queries.round14_extras import (
    _FINAL_BOUND_US,
    _build_ht_final_log,
    _cached_late_log,
)
from doc2dataset_spark.session import load_table

# the erasure cohort: deterministic, ~1% of events, spread across the
# corpus so it hits both sealed (pre-watermark) and pending hours
_RTBF_MOD, _RTBF_REM = 101, 7
_RTBF_REQ = "gdpr-r15-fixture"


def _cohort(e):
    return F.pmod("event_id", F.lit(_RTBF_MOD)) == _RTBF_REM


def _build_ht_rtbf_log(spark, sf_dir, tmp: str) -> None:
    """The finality fixture's watermarked log (calendar-week slices, a
    one-batch-late cohort, ~22 of 30 days sealed), then the REAL
    erasure: forget the mod-cohort's rows — asserting the request
    actually revised SEALED buckets (the lawful-revision path is
    exercised, not just the pending tail) and that replaying the same
    request is a no-op (idempotence inside the fixture build itself)."""
    from doc2dataset_spark.streaming.hypertable import (
        forget_hypertable_rows,
    )

    _build_ht_final_log(spark, sf_dir, tmp)
    e = load_table(spark, sf_dir, "events")
    forget = e.filter(_cohort(e))
    res = forget_hypertable_rows(spark, tmp, forget, request_id=_RTBF_REQ)
    assert res["n_sealed_buckets_revised"] > 0, res
    replay = forget_hypertable_rows(
        spark, tmp, forget, request_id=_RTBF_REQ
    )
    assert replay == res, (replay, res)


def _rtbf_log(spark, sf_dir) -> str:
    return _cached_late_log(spark, sf_dir, "htrtbf", _build_ht_rtbf_log)


# round12_extras._HT_DUCK_LEVEL with the cohort erased — the
# direct-from-raw oracle over the POST-DELETION corpus
_HT_RTBF_DUCK_LEVEL = f"""
  SELECT '{{g}}' AS granularity,
         strftime(date_trunc('{{g}}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         count(*)::BIGINT AS n_events,
         round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS total
  FROM events WHERE (event_id % {_RTBF_MOD}) <> {_RTBF_REM} GROUP BY 2
"""


@query(
    "rollup_hypertable_rtbf",
    oracle=" UNION ALL ".join(
        _HT_RTBF_DUCK_LEVEL.format(g=g) for g in ("hour", "day", "month")
    ),
    tags=("events", "rollup", "timeseries", "rtbf", "gdpr"),
)
def rollup_hypertable_rtbf(spark, sf_dir):
    """The cagg after lawful erasure: build the watermarked sealed log,
    forget the mod-cohort (forget_hypertable_rows — subtraction from
    affected hours, history collapsed to the anchor batch, journaled
    seal audit, transactional swap), serve. The oracle recomputes every
    granularity directly from ``events WHERE NOT cohort`` — the hash
    proves erasure removed EXACTLY the cohort's contribution and
    nothing else, through sealed and pending buckets alike."""
    from doc2dataset_spark.streaming.hypertable import serve_hypertable

    return serve_hypertable(spark, _rtbf_log(spark, sf_dir))


_RTBF_FINAL_DUCK_LEVEL = f"""
  SELECT '{{g}}' AS granularity,
         strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket, n_events, total,
         EXISTS (
           SELECT 1 FROM events e2
           WHERE (e2.event_id % {_RTBF_MOD}) = {_RTBF_REM}
             AND date_trunc('{{g}}', e2.ts) = lvl.b
             AND epoch_us(date_trunc('hour', e2.ts) + INTERVAL 1 HOUR)
                 <= (SELECT max(epoch_us(ts)) - {_FINAL_BOUND_US}
                     FROM events)
         ) AS revised
  FROM (
    SELECT date_trunc('{{g}}', ts) AS b, count(*)::BIGINT AS n_events,
           round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE AS total
    FROM events WHERE (event_id % {_RTBF_MOD}) <> {_RTBF_REM} GROUP BY 1
  ) lvl
  WHERE epoch_us(b + INTERVAL 1 {{g}})
        <= (SELECT max(epoch_us(ts)) - {_FINAL_BOUND_US} FROM events)
"""


@query(
    "rollup_hypertable_rtbf_final",
    oracle=" UNION ALL ".join(
        _RTBF_FINAL_DUCK_LEVEL.format(g=g) for g in ("hour", "day", "month")
    ),
    tags=("events", "rollup", "rtbf", "finality", "audit"),
)
def rollup_hypertable_rtbf_final(spark, sf_dir):
    """The AUDITED finality surface after lawful erasure
    (serve_hypertable_final_audited): the sealed prefix of the
    post-deletion cagg with a ``revised`` column flagging — at every
    granularity — the buckets whose sealed hours an applied RTBF
    request re-opened, so a downstream cache holding 'immutable' rows
    learns exactly which pins to refresh. The oracle recomputes the
    sealed prefix from the post-deletion corpus and derives the flag
    independently, as 'this bucket contains a cohort event whose HOUR
    was sealed under the global watermark' — the driver hash row
    externally proves both the revised marking and that every other
    sealed row still serves its plain finality value."""
    from doc2dataset_spark.streaming.hypertable import (
        serve_hypertable_final_audited,
    )

    return serve_hypertable_final_audited(spark, _rtbf_log(spark, sf_dir))


@query(
    "rollup_hypertable_rtbf_audit",
    oracle=f"""
    SELECT '{_RTBF_REQ}' AS request_id,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket,
           n_forgotten, total_forgotten,
           (epoch_us(b + INTERVAL 1 HOUR)
              <= (SELECT max(epoch_us(ts)) - {_FINAL_BOUND_US} FROM events))
             AS was_sealed
    FROM (
      SELECT date_trunc('hour', ts) AS b,
             count(*)::BIGINT AS n_forgotten,
             round(SUM(CAST(value AS DECIMAL(38,6))), 4)::DOUBLE
               AS total_forgotten
      FROM events WHERE (event_id % {_RTBF_MOD}) = {_RTBF_REM}
      GROUP BY 1
    )
    """,
    tags=("events", "rtbf", "gdpr", "audit"),
)
def rollup_hypertable_rtbf_audit(spark, sf_dir):
    """The RTBF journal as the auditor reads it: one row per revised
    hour bucket — how many rows were forgotten, their value sum, and
    whether the bucket was SEALED when the revision landed (the flag
    that lets a downstream cache holding 'immutable' rows learn which
    pins a lawful erasure re-opened). The oracle derives the same rows
    from the cohort predicate over raw events, with the seal flag
    recomputed as bucket end ≤ (global max ts − 8-day bound) — the
    driver hash row externally proves the journal records exactly the
    erased cohort's hours and classifies their finality correctly."""
    from doc2dataset_spark.streaming.hypertable import (
        hypertable_rtbf_audit,
    )

    return hypertable_rtbf_audit(spark, _rtbf_log(spark, sf_dir))


def _build_ht_auto_log(spark, sf_dir, tmp: str) -> None:
    """Six event_id-mod slices through the watermarked per-batch core
    with the compact='auto' wiring EXACTLY as run_hypertable_ingest_late
    applies it (decide from the wm counters after each batch, fold up to
    the previous batch on fire, factor 3 so the knee is crossed inside
    the six-batch fixture) — asserting the self-tuned cadence actually
    fired, so the serve is genuinely reading a log the auto-compactor
    reshaped."""
    from doc2dataset_spark.operators.index_maintenance import (
        compaction_horizon,
    )
    from doc2dataset_spark.streaming.hypertable import (
        _hourly_path,
        compact_hypertable_partials,
        decide_hypertable_compaction,
        ingest_hypertable_late_batch,
    )
    from doc2dataset_spark import fsio

    e = load_table(spark, sf_dir, "events")
    n = 6
    for i in range(n):
        ingest_hypertable_late_batch(
            e.filter(F.pmod("event_id", F.lit(n)) == i),
            tmp,
            batch_id=i,
            lateness_us=60 * 24 * 3600 * 1_000_000,
        )
        if i > 0:
            d = decide_hypertable_compaction(spark, tmp, factor=3)
            if d["fire"]:
                compact_hypertable_partials(spark, tmp, upto_batch=i - 1)
    fs, p = fsio.url_to_fs(_hourly_path(tmp))
    assert compaction_horizon(fs, p) is not None, (
        "auto-compaction never fired — fixture knee miscalibrated"
    )


@query(
    "rollup_hypertable_autocompact",
    oracle=None,  # set below: events_hypertable_rollup's oracle VERBATIM
    tags=("events", "rollup", "timeseries", "compaction", "autoparams"),
)
def rollup_hypertable_autocompact(spark, sf_dir):
    """The cagg served from a log the counter-driven ``compact="auto"``
    cadence reshaped mid-ingest (decide_hypertable_compaction fires from
    the wm sidecar's n_partial_rows counters — the builder asserts it
    actually fired): shares events_hypertable_rollup's direct-from-raw
    oracle VERBATIM, so the driver hash row externally proves the
    self-tuned compaction is invisible to readers — N batches folded at
    a machine-chosen cadence equal one batch recompute, bit for bit."""
    from doc2dataset_spark.streaming.hypertable import serve_hypertable

    return serve_hypertable(
        spark, _cached_late_log(spark, sf_dir, "htauto", _build_ht_auto_log)
    )


from doc2dataset_spark.queries.core import REGISTRY as _REG  # noqa: E402

_REG["rollup_hypertable_autocompact"].oracle = _REG[
    "events_hypertable_rollup"
].oracle
