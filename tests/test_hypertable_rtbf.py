"""Right-to-be-forgotten for the hypertable cagg
(streaming/hypertable.forget_hypertable_rows): lawful erasure must
subtract exactly the forgotten rows' contribution from every serve
surface (live, final, as-of), journal which SEALED buckets it revised
(the finality audit), refuse forget sets that were never ingested, and
be idempotent per request — including across every crash window, where
a retry is decided by comparing the live fold to the journaled pre/post
state rather than by guesswork."""

from __future__ import annotations

import datetime as dt
import json
import shutil

import pytest
from pyspark.sql import functions as F

from doc2dataset_spark.streaming.hypertable import (
    _hourly_path,
    _rtbf_marker,
    compact_hypertable_partials,
    forget_hypertable_rows,
    hypertable_rtbf_audit,
    ingest_hypertable_late_batch,
    recover_hypertable_rtbf,
    serve_hypertable,
    serve_hypertable_asof,
    serve_hypertable_final,
    serve_hypertable_final_audited,
)

_SCHEMA = "event_id bigint, ts timestamp, value double"
_H = dt.datetime(2024, 1, 1, 0, 0, 0)
_LATENESS_US = 3600 * 1_000_000  # 1 hour


def _ev(eid, hour, minute, value):
    return (eid, _H + dt.timedelta(hours=hour, minutes=minute), value)


# three batches over four hours; with a 1h bound the final watermark is
# max ts (03:30) - 1h = 02:30 → hours 00 and 01 are SEALED, 02/03 not
_B0 = [_ev(1, 0, 10, 10.0), _ev(2, 0, 40, 20.0), _ev(3, 1, 5, 1.5)]
_B1 = [_ev(4, 1, 30, 2.5), _ev(5, 2, 10, 100.0)]
_B2 = [_ev(6, 3, 30, 7.0)]
_ALL = _B0 + _B1 + _B2


def _build(spark, out) -> None:
    for i, rows in enumerate((_B0, _B1, _B2)):
        ingest_hypertable_late_batch(
            spark.createDataFrame(rows, _SCHEMA),
            out,
            batch_id=i,
            lateness_us=_LATENESS_US,
        )


def _rows(df):
    return sorted(
        (r["granularity"], r["bucket"], r["n_events"], r["total"])
        for r in df.collect()
    )


def _expected_serve(spark, tmp_path, rows, name):
    """The ground truth: a fresh one-batch log over exactly ``rows``."""
    ref = (tmp_path / name).as_posix()
    ingest_hypertable_late_batch(
        spark.createDataFrame(rows, _SCHEMA),
        ref,
        batch_id=0,
        lateness_us=_LATENESS_US,
    )
    return _rows(serve_hypertable(spark, ref))


def _forget(spark, out, rows, request_id="req-1"):
    return forget_hypertable_rows(
        spark,
        out,
        spark.createDataFrame(rows, _SCHEMA),
        request_id=request_id,
    )


def test_forget_subtracts_exactly_and_noops_on_replay(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    # forget one sealed-hour row (hour 01) and one unsealed (hour 02)
    doomed = [_B1[0], _B1[1]]
    res = _forget(spark, out, doomed)
    assert res["status"] == "applied" and not res["noop"]
    assert res["n_forgotten_rows"] == 2
    assert res["n_buckets_revised"] == 2
    assert res["n_sealed_buckets_revised"] == 1  # hour 01 only
    kept = [e for e in _ALL if e not in doomed]
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark, tmp_path, kept, "ref1"
    )
    # RTBF-then-replay idempotence: same request_id is a pure no-op
    before = _rows(serve_hypertable(spark, out))
    res2 = _forget(spark, out, doomed)
    assert res2["status"] == "applied" and res2["noop"] is False
    assert res2["n_forgotten_rows"] == 2
    assert _rows(serve_hypertable(spark, out)) == before


def test_forget_whole_hour_vanishes_everywhere(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    _forget(spark, out, _B2)  # hour 03 lives only in batch 2
    served = _rows(serve_hypertable(spark, out))
    assert not any("03:00:00" in b for _, b, _, _ in served)
    assert served == _expected_serve(
        spark, tmp_path, _B0 + _B1, "ref2"
    )
    # the vanished batch partition's landing time went with it
    from doc2dataset_spark.operators.time_travel import batch_times

    assert 2 not in batch_times(_hourly_path(out))


def test_forget_never_ingested_refuses(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    with pytest.raises(ValueError, match="never ingested"):
        _forget(spark, out, [_ev(99, 7, 0, 1.0)])  # unknown hour
    with pytest.raises(ValueError, match="not a subset"):
        # known hour, inflated contribution
        _forget(spark, out, [_B2[0], _ev(98, 3, 30, 999.0)])
    # refusals left the log untouched
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark, tmp_path, _ALL, "ref3"
    )


def test_seal_audit_and_final_audited(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    _forget(spark, out, [_B1[0], _B1[1]], request_id="gdpr-7")
    audit = {
        r["bucket"]: (r["n_forgotten"], r["total_forgotten"], r["was_sealed"])
        for r in hypertable_rtbf_audit(spark, out).collect()
    }
    assert audit == {
        "2024-01-01 01:00:00": (1, 2.5, True),
        "2024-01-01 02:00:00": (1, 100.0, False),
    }
    fin = {
        (r["granularity"], r["bucket"]): r["revised"]
        for r in serve_hypertable_final_audited(spark, out).collect()
    }
    # sealed rows: hours 00 and 01 (wm = 02:30); no sealed day/month
    assert fin == {
        ("hour", "2024-01-01 00:00:00"): False,
        ("hour", "2024-01-01 01:00:00"): True,
    }
    # the revised sealed row still serves its post-deletion value
    final = {
        (r["granularity"], r["bucket"]): (r["n_events"], r["total"])
        for r in serve_hypertable_final(spark, out).collect()
    }
    assert final[("hour", "2024-01-01 01:00:00")] == (1, 1.5)


def test_audit_raises_on_clean_log(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    with pytest.raises(ValueError, match="no applied RTBF"):
        hypertable_rtbf_audit(spark, out)


def test_asof_exact_at_anchor_conservative_below(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    # hour 01 spans batches 0 and 1 → anchor is batch 1
    _forget(spark, out, [_B0[2]])
    at1 = _rows(serve_hypertable_asof(spark, out, 1))
    exp1 = _expected_serve(
        spark, tmp_path, [_B0[0], _B0[1], *_B1], "ref4"
    )
    assert at1 == exp1  # N >= anchor: exactly "first N batches minus RTBF"
    at0 = _rows(serve_hypertable_asof(spark, out, 0))
    # N < anchor: the affected hour is omitted, untouched hours intact
    assert not any("01:00:00" == b[11:] for _, b, _, _ in at0)
    hour0 = [r for r in at0 if r[0] == "hour" and "00:00:00" in r[1]]
    assert hour0 == [("hour", "2024-01-01 00:00:00", 2, 30.0)]


def test_crash_retry_decided_by_state(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    pre_copy = (tmp_path / "ht_pre").as_posix()
    shutil.copytree(out, pre_copy)
    doomed = [_B1[1]]
    _forget(spark, out, doomed, request_id="crash-1")
    applied = _rows(serve_hypertable(spark, out))
    marker = _rtbf_marker(_hourly_path(out))

    def _set_pending(path):
        with open(path) as fh:
            log = json.load(fh)
        for r in log["requests"]:
            r["status"] = "pending"
        with open(path, "w") as fh:
            json.dump(log, fh)

    # window A: crash AFTER the swap published, before the journal flip
    # → live fold == journaled post → flip to applied, no re-apply
    _set_pending(marker)
    res = _forget(spark, out, doomed, request_id="crash-1")
    assert res["status"] == "applied"
    assert _rows(serve_hypertable(spark, out)) == applied

    # window B: crash BEFORE the swap published (journal pending, log
    # pre-deletion) → live fold == journaled pre → re-apply
    shutil.copy(marker, _rtbf_marker(_hourly_path(pre_copy)))
    _set_pending(_rtbf_marker(_hourly_path(pre_copy)))
    res = _forget(spark, pre_copy, doomed, request_id="crash-1")
    assert res["status"] == "applied"
    assert _rows(serve_hypertable(spark, pre_copy)) == applied

    # a pending entry whose hours match NEITHER journaled state refuses
    ingest_hypertable_late_batch(
        spark.createDataFrame([_ev(50, 3, 40, 4.0), _ev(51, 2, 50, 1.0)], _SCHEMA),
        pre_copy,
        batch_id=3,
        lateness_us=_LATENESS_US,
    )
    _set_pending(_rtbf_marker(_hourly_path(pre_copy)))
    with pytest.raises(RuntimeError, match="neither"):
        _forget(spark, pre_copy, doomed, request_id="crash-1")


def test_forget_composes_with_compaction(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    doomed = [_B0[1]]
    kept = [e for e in _ALL if e not in doomed]
    # RTBF over a compacted log
    compact_hypertable_partials(spark, out, upto_batch=1)
    _forget(spark, out, doomed)
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark, tmp_path, kept, "ref5"
    )
    # compaction after RTBF: serve stable, journal (a sibling) survives
    compact_hypertable_partials(spark, out, upto_batch=2)
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark, tmp_path, kept, "ref6"
    )
    assert hypertable_rtbf_audit(spark, out).count() == 1


def test_recover_is_noop_on_healthy_log(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    assert recover_hypertable_rtbf(out) == {
        "action": "none",
        "rtbf_request": None,
    }


def test_empty_forget_set_is_an_audited_noop(spark, tmp_path):
    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    res = _forget(spark, out, [])
    assert res["noop"] is True and res["n_buckets_revised"] == 0
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark, tmp_path, _ALL, "ref7"
    )


def test_watermark_never_moves(spark, tmp_path):
    from doc2dataset_spark.streaming.hypertable import hypertable_wm_state

    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    before = hypertable_wm_state(spark, out)
    _forget(spark, out, _B2)  # even erasing the max-ts event
    assert hypertable_wm_state(spark, out) == before


def test_deadletter_log_is_purged_with_the_partials(spark, tmp_path):
    """The GDPR hole on_late='drop' opens: dropped events sit in
    rejected/ as FULL ROWS the partial-side erasure never touches.
    forget_hypertable_rows REFUSES to run over such a log without a
    key_col; with one, the subject's dropped rows are purged from the
    dead-letter log while only the ACCEPTED part of the forget set
    subtracts from the partials."""
    out = (tmp_path / "ht_dl").as_posix()
    ingest_hypertable_late_batch(
        spark.createDataFrame(
            [_ev(1, 10, 5, 3.0), _ev(2, 10, 20, 7.0), _ev(3, 11, 50, 1.0)],
            _SCHEMA,
        ),
        out,
        batch_id=0,
        lateness_us=_LATENESS_US,
    )
    # wm = 11:50 - 1h = 10:50 → the hour-0/1 rows are dead-lettered
    ingest_hypertable_late_batch(
        spark.createDataFrame(
            [_ev(4, 0, 15, 9.0), _ev(5, 1, 30, 4.0), _ev(6, 11, 55, 2.0)],
            _SCHEMA,
        ),
        out,
        batch_id=1,
        lateness_us=_LATENESS_US,
        on_late="drop",
    )
    from doc2dataset_spark.streaming.hypertable import (
        rejected_hypertable_rows,
    )

    assert rejected_hypertable_rows(spark, out).count() == 2

    subject = [_ev(2, 10, 20, 7.0), _ev(4, 0, 15, 9.0)]
    with pytest.raises(ValueError, match="dead-letter"):
        _forget(spark, out, subject)

    res = forget_hypertable_rows(
        spark,
        out,
        spark.createDataFrame(subject, _SCHEMA),
        request_id="dl-1",
        key_col="event_id",
    )
    assert res["n_rejected_purged"] == 1  # id 4 left the rejected log
    assert res["n_forgotten_rows"] == 1  # only id 2 subtracted
    left = rejected_hypertable_rows(spark, out)
    assert [r["event_id"] for r in left.collect()] == [5]
    # partials reflect exactly the accepted survivors (ids 1, 3, 6)
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark,
        tmp_path,
        [_ev(1, 10, 5, 3.0), _ev(3, 11, 50, 1.0), _ev(6, 11, 55, 2.0)],
        "ref_dl",
    )
    # replaying the same request is a no-op (purge included)
    res2 = forget_hypertable_rows(
        spark,
        out,
        spark.createDataFrame(subject, _SCHEMA),
        request_id="dl-1",
        key_col="event_id",
    )
    assert res2 == res
    assert rejected_hypertable_rows(spark, out).count() == 1


def test_all_rows_dead_lettered_forget_still_purges(spark, tmp_path):
    """A subject whose every row was dropped: nothing subtracts from
    partials, but the purge still runs and the journal records it."""
    out = (tmp_path / "ht_dl2").as_posix()
    ingest_hypertable_late_batch(
        spark.createDataFrame([_ev(1, 10, 5, 3.0), _ev(2, 11, 50, 1.0)], _SCHEMA),
        out,
        batch_id=0,
        lateness_us=_LATENESS_US,
    )
    ingest_hypertable_late_batch(
        spark.createDataFrame([_ev(7, 0, 10, 6.0), _ev(8, 1, 10, 6.5)], _SCHEMA),
        out,
        batch_id=1,
        lateness_us=_LATENESS_US,
        on_late="drop",
    )
    before = _rows(serve_hypertable(spark, out))
    res = forget_hypertable_rows(
        spark,
        out,
        spark.createDataFrame([_ev(7, 0, 10, 6.0)], _SCHEMA),
        request_id="dl-2",
        key_col="event_id",
    )
    assert res["n_rejected_purged"] == 1
    assert res["n_forgotten_rows"] == 0
    assert res["noop"] is False
    assert _rows(serve_hypertable(spark, out)) == before
    from doc2dataset_spark.streaming.hypertable import (
        rejected_hypertable_rows,
    )

    assert [
        r["event_id"] for r in rejected_hypertable_rows(spark, out).collect()
    ] == [8]


def test_string_key_deadletter_purge_and_uncastable_refusal(spark, tmp_path):
    """Round-15 close review: delete_from_postings casts probe keys to
    the LOG's own key dtype — a string identity column must purge
    correctly (a hard-coded bigint cast made it all-NULL and silently
    retained the subject's rows), and keys that cannot cast must refuse
    rather than silently survive the deletion."""
    schema = "doc_id string, ts timestamp, value double"

    def _sev(did, hour, minute, value):
        return (did, _H + dt.timedelta(hours=hour, minutes=minute), value)

    out = (tmp_path / "ht_str").as_posix()
    ingest_hypertable_late_batch(
        spark.createDataFrame(
            [_sev("a", 10, 5, 3.0), _sev("b", 11, 50, 1.0)], schema
        ),
        out, batch_id=0, lateness_us=_LATENESS_US,
    )
    ingest_hypertable_late_batch(
        spark.createDataFrame(
            [_sev("c", 0, 10, 6.0), _sev("d", 1, 10, 6.5)], schema
        ),
        out, batch_id=1, lateness_us=_LATENESS_US, on_late="drop",
    )
    res = forget_hypertable_rows(
        spark,
        out,
        spark.createDataFrame([_sev("c", 0, 10, 6.0)], schema),
        request_id="str-1",
        key_col="doc_id",
    )
    assert res["n_rejected_purged"] == 1
    from doc2dataset_spark.streaming.hypertable import (
        rejected_hypertable_rows,
    )

    assert [
        r["doc_id"] for r in rejected_hypertable_rows(spark, out).collect()
    ] == ["d"]
    # bigint log + unparseable string key: refuse, never silently no-op
    from doc2dataset_spark.operators.index_maintenance import (
        delete_from_postings,
    )

    out2 = (tmp_path / "ht_int").as_posix()
    ingest_hypertable_late_batch(
        spark.createDataFrame([_ev(1, 10, 5, 3.0), _ev(2, 11, 50, 1.0)], _SCHEMA),
        out2, batch_id=0, lateness_us=_LATENESS_US,
    )
    ingest_hypertable_late_batch(
        spark.createDataFrame([_ev(3, 0, 10, 6.0)], _SCHEMA),
        out2, batch_id=1, lateness_us=_LATENESS_US, on_late="drop",
    )
    with pytest.raises(ValueError, match="cast"):
        delete_from_postings(
            spark,
            out2 + "/rejected",
            spark.createDataFrame([("not-a-number",)], "event_id string"),
            key_col="event_id",
        )


def test_post_swap_crash_retry_cleans_landing_times(spark, tmp_path):
    """Round-15 close review: the live==post crash-retry path must
    finish the post-swap bookkeeping the crashed run died before — a
    vanished batch's landing-time entry must not survive the retry."""
    from doc2dataset_spark.operators.time_travel import (
        batch_times,
        record_batch_time,
    )

    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    _forget(spark, out, _B2, request_id="crash-2")  # batch 2 vanishes
    hdir = _hourly_path(out)
    assert 2 not in batch_times(hdir)
    # emulate the crash window: swap published (log is post-deletion)
    # but the cleanup + journal flip never ran
    record_batch_time(hdir, 2)  # the stale entry the crash left behind
    marker = _rtbf_marker(hdir)
    with open(marker) as fh:
        log = json.load(fh)
    for r in log["requests"]:
        r["status"] = "pending"
    with open(marker, "w") as fh:
        json.dump(log, fh)
    res = _forget(spark, out, _B2, request_id="crash-2")
    assert res["status"] == "applied"
    assert 2 not in batch_times(hdir)


def test_recover_names_the_inflight_request_and_rolls_back(spark, tmp_path):
    """A hard crash mid-swap leaves __old_compact + the manifest tagged
    with the RTBF request id: recover_hypertable_rtbf must surface the
    tag, reassemble the pre-deletion tree, and leave the log serving its
    original rows — after which the state-decided retry applies cleanly."""
    import json as _json

    from doc2dataset_spark import fsio

    out = (tmp_path / "ht").as_posix()
    _build(spark, out)
    before = _rows(serve_hypertable(spark, out))
    hdir = _hourly_path(out)
    fs, p = fsio.url_to_fs(hdir)

    # fabricate the exact mid-swap debris swap_in_compacted leaves on a
    # hard crash: root renamed away, manifest present, tmp half-built
    tmp_dir = f"{p}__rtbf_deadbeef"
    fs.makedirs(tmp_dir, exist_ok=True)
    with fs.open(f"{p}__compact_manifest.json", "wb") as fh:
        fh.write(
            _json.dumps(
                {
                    "tmp": tmp_dir,
                    "root": p,
                    "tail_dirs": [],
                    "rtbf_request": "gdpr-crashed",
                }
            ).encode()
        )
    fs.mv(p, f"{p}__old_compact")

    res = recover_hypertable_rtbf(out)
    assert res["action"] == "rolled_back"
    assert res["rtbf_request"] == "gdpr-crashed"
    assert _rows(serve_hypertable(spark, out)) == before
    # and the log is fully operational again: the real request applies
    _forget(spark, out, [_B1[1]], request_id="gdpr-crashed")
    assert _rows(serve_hypertable(spark, out)) == _expected_serve(
        spark, tmp_path, [e for e in _ALL if e != _B1[1]], "ref_rec"
    )
