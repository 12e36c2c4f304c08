"""Streaming smoke tests: a finite parquet-backed stream must produce
exactly the batch answer (the strongest oracle available for a stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import load_table
from doc2dataset_spark.streaming.events import (
    run_to_memory,
    sessionize_stream,
    stream_events,
    tumbling_counts,
)


def test_tumbling_counts_match_batch(spark, sf_dir):
    stream = tumbling_counts(stream_events(spark, sf_dir))
    got = run_to_memory(spark, stream, "tumbling_out").toPandas()
    want = (
        REGISTRY["q30_time_bucket"].builder(spark, sf_dir).toPandas()
    )
    got_s = got.sort_values(["bucket", "event_type"]).reset_index(drop=True)
    want_s = want.sort_values(["bucket", "event_type"]).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s["n"].values == want_s["n"].values).all()
    assert (got_s["total_value"].values == want_s["total_value"].values).all()


def test_session_window_stream(spark, sf_dir):
    stream = sessionize_stream(stream_events(spark, sf_dir))
    got = run_to_memory(spark, stream, "sessions_out")
    # session counts must cover every event exactly once
    total = got.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events
    # session ids per user must match the batch lag+cumsum analog
    batch_sessions = (
        REGISTRY["q31_sessionize"]
        .builder(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    stream_sessions = got.groupBy("user_id").agg(
        F.count("*").alias("n_sessions")
    )
    b = batch_sessions.toPandas().set_index("user_id")["n_sessions"]
    s = stream_sessions.toPandas().set_index("user_id")["n_sessions"]
    assert (b.sort_index() == s.sort_index()).all()


def test_stream_dedup_within_watermark(spark, sf_dir):
    """Streamed dedup must equal batch dropDuplicates on the same finite
    input with duplicates injected (every event duplicated once)."""
    from doc2dataset_spark.streaming.events import dedup_stream

    stream = stream_events(spark, sf_dir)
    doubled = stream.union(stream)  # same source twice = exact duplicates
    got = run_to_memory(
        spark, dedup_stream(doubled), "dedup_stream_out", output_mode="append"
    )
    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    n_expected = batch.dropDuplicates(
        ["user_id", "event_type", "ts"]
    ).count()
    assert got.select("user_id", "event_type", "ts").distinct().count() == n_expected
    # no key survives twice
    dupes = (
        got.groupBy("user_id", "event_type", "ts")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dupes == 0


def test_watermark_drops_late_data(spark, tmp_path):
    """The watermark contract, pinned: an event arriving AFTER the
    watermark passed its window must be dropped from the aggregate, and in
    append mode a window is emitted exactly once, when the watermark
    crosses its end. Three hand-ordered micro-batches: batch 1 fills the
    10:00 hour and advances event time to 12:30 (watermark 11:30); batch 2
    (on-time 12:40 event) lets that watermark close and emit the 10:00
    window; batch 3 replays a 10:10 click — late, dropped — plus an
    on-time 12:45 event whose window never closes. The intermediate batch
    matters: eviction runs at the END of the batch where the watermark
    crosses the window, after that batch's input is merged, so a late row
    landing in that same batch would still count — the one-batch
    lateness allowance this test documents."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()

    def _file(name, rows, mtime):
        ts = pa.array(
            [r[2] for r in rows], pa.timestamp("us", tz="UTC")
        )
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int32()),
                "event_type": pa.array([r[1] for r in rows]),
                "ts": ts,
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        path = str(src / name)
        pq.write_table(t, path)
        os.utime(path, (mtime, mtime))

    import datetime as dt

    def u(h, m):
        return dt.datetime(2024, 1, 1, h, m, tzinfo=dt.timezone.utc)

    _file(
        "f1.parquet",
        [
            (1, "click", u(10, 5), 1.0),
            (2, "click", u(10, 20), 2.0),
            (3, "view", u(10, 40), 3.0),
            (4, "click", u(12, 30), 4.0),
        ],
        mtime=1_000,
    )
    _file("f2.parquet", [(6, "view", u(12, 40), 5.0)], mtime=2_000)
    _file(
        "f3.parquet",
        [
            (5, "click", u(10, 10), 9.0),  # late: watermark is 11:30
            (7, "view", u(12, 45), 6.0),
        ],
        mtime=3_000,
    )

    stream = (
        spark.readStream.schema(
            "user_id int, event_type string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = run_to_memory(
        spark, tumbling_counts(stream), "late_out", output_mode="append"
    ).toPandas()

    # only the closed 10:00 window is emitted, WITHOUT the late replay
    counts = {
        (r["bucket"], r["event_type"]): r["n"] for _, r in got.iterrows()
    }
    assert counts == {
        ("2024-01-01 10:00:00", "click"): 2,  # late 10:10 click dropped
        ("2024-01-01 10:00:00", "view"): 1,
    }


def test_foreach_batch_upsert_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch writes land partitioned by batch id; replaying the
    same input into a fresh stream (same batches) produces the same rows,
    and re-running with the same checkpoint adds nothing."""
    from doc2dataset_spark.streaming.events import run_foreach_batch_upsert

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    agg = (
        stream_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    run_foreach_batch_upsert(spark, agg, out, ckpt)
    first = spark.read.parquet(out)
    n_types = first.select("event_type").distinct().count()
    assert n_types == 5

    # same checkpoint, no new data: a restart must not duplicate output
    run_foreach_batch_upsert(spark, agg, out, ckpt)
    again = spark.read.parquet(out)
    assert again.count() == first.count()
    # final counts equal the batch answer
    batch = load_table(spark, sf_dir, "events").groupBy("event_type").count()
    want = {r["event_type"]: r["count"] for r in batch.collect()}
    # take the last batch_id per event_type (update mode emits increments)
    from pyspark.sql import Window as W

    latest = (
        again.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(F.desc("batch_id"))
            ),
        )
        .filter("rn = 1")
    )
    got = {r["event_type"]: r["n"] for r in latest.collect()}
    assert got == want


def test_sliding_stream_matches_batch(spark, sf_dir):
    """Streaming window(2h, 1h) == the batch explode-based
    events_sliding_counts on the same finite input."""
    from doc2dataset_spark.queries import REGISTRY
    from doc2dataset_spark.streaming.events import (
        run_to_memory,
        sliding_counts,
        stream_events,
    )

    got = {
        (r.win_start, r.event_type, r.n)
        for r in run_to_memory(
            spark,
            sliding_counts(stream_events(spark, sf_dir)),
            "sliding_out",
        ).collect()
    }
    want = {
        (r.win_start, r.event_type, r.n)
        for r in REGISTRY["events_sliding_counts"].builder(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream view→click attribution join == the identical batch
    join on the same finite input (append mode: rows emitted once both
    watermarks pass them)."""
    from doc2dataset_spark.session import load_table
    from doc2dataset_spark.streaming.events import (
        interval_join_stream,
        run_to_memory,
        stream_events,
    )

    got = {
        (r.user_id, r.view_id, r.click_id, r.view_ts, r.click_ts)
        for r in run_to_memory(
            spark,
            interval_join_stream(stream_events(spark, sf_dir)),
            "ssjoin_out",
            output_mode="append",
        ).collect()
    }
    want = {
        (r.user_id, r.view_id, r.click_id, r.view_ts, r.click_ts)
        for r in interval_join_stream(
            load_table(spark, sf_dir, "events")
        ).collect()
    }
    assert got and got == want


def test_cms_partials_merge_to_batch_sketch(spark, sf_dir, tmp_path):
    """Streaming count-min: one partial d×w sketch per micro-batch,
    merged by counter addition, must equal the sketch built over the
    whole input in one batch pass — the mergeability law that makes
    sketches the right streaming frequency state. Forced across ≥2
    micro-batches so the merge is real."""
    import os
    import time as _time

    from doc2dataset_spark.streaming.sketch import (
        cms_partial,
        cms_merge,
        run_cms_partials,
    )

    # the sketch keys on user_id only — project before writing so the
    # fixture round-trips without the nanos-timestamp column
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = tmp_path / "events_stream"
    os.makedirs(src, exist_ok=True)
    lo = src / "b0.parquet"
    hi = src / "b1.parquet"
    events.filter(f"event_id <= {int(mid)}").toPandas().to_parquet(
        lo.as_posix()
    )
    events.filter(f"event_id > {int(mid)}").toPandas().to_parquet(
        hi.as_posix()
    )
    os.utime(hi, (_time.time() + 2, _time.time() + 2))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.as_posix())
    )
    out = (tmp_path / "cms_partials").as_posix()
    ckpt = (tmp_path / "cms_ckpt").as_posix()
    run_cms_partials(spark, stream, out, ckpt)

    partials = spark.read.parquet(out)
    n_batches = partials.select("batch_id").distinct().count()
    assert n_batches >= 2, "stream collapsed into one micro-batch"

    got = {
        (r.j, r.bucket): r.c for r in cms_merge(spark, out).collect()
    }
    want = {
        (r.j, r.bucket): r.c for r in cms_partial(events).collect()
    }
    assert got == want  # counter-by-counter equality
    # total mass per depth row = number of events
    n = events.count()
    for j in range(4):
        assert sum(c for (jj, _), c in got.items() if jj == j) == n


def test_cms_partials_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-ingesting the same stream into the same partials directory
    (fresh checkpoint — the disaster-recovery case) rewrites the same
    batch_id partitions instead of appending: the merged sketch still
    equals the single-pass batch sketch, counter for counter."""
    import os

    from doc2dataset_spark.streaming.sketch import (
        cms_partial,
        cms_merge,
        run_cms_partials,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id"
    )
    src = tmp_path / "ev"
    os.makedirs(src, exist_ok=True)
    events.toPandas().to_parquet((src / "b0.parquet").as_posix())

    out = (tmp_path / "partials").as_posix()
    stream = spark.readStream.schema(events.schema).parquet(src.as_posix())
    run_cms_partials(spark, stream, out, (tmp_path / "ck1").as_posix())
    # replay from scratch: new checkpoint, same output directory
    stream2 = spark.readStream.schema(events.schema).parquet(src.as_posix())
    run_cms_partials(spark, stream2, out, (tmp_path / "ck2").as_posix())

    got = {(r.j, r.bucket): r.c for r in cms_merge(spark, out).collect()}
    want = {(r.j, r.bucket): r.c for r in cms_partial(events).collect()}
    assert got == want


def test_cms_fresh_checkpoint_replay_prunes_stale_batches(spark, sf_dir, tmp_path):
    """ADVICE r5 (medium): a fresh-checkpoint replay that groups the input
    into FEWER micro-batches than the original run (here: 2 files ingested
    one-per-trigger, then replayed all-at-once as batch 0) must not leave
    the old incarnation's batch_id=1 partition behind — cms_merge would
    silently double-count it. run_cms_partials now prunes every partition
    beyond the replay's max batch id when it starts from a fresh
    checkpoint."""
    import os
    import time as _time

    from doc2dataset_spark.streaming.sketch import (
        cms_partial,
        cms_merge,
        run_cms_partials,
    )

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    mid = events.agg({"event_id": "avg"}).collect()[0][0]
    src = tmp_path / "ev"
    os.makedirs(src, exist_ok=True)
    lo, hi = src / "b0.parquet", src / "b1.parquet"
    events.filter(f"event_id <= {int(mid)}").toPandas().to_parquet(lo.as_posix())
    events.filter(f"event_id > {int(mid)}").toPandas().to_parquet(hi.as_posix())
    os.utime(hi, (_time.time() + 2, _time.time() + 2))

    out = (tmp_path / "partials").as_posix()
    # original incarnation: one file per trigger -> batches 0 and 1
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.as_posix())
    )
    run_cms_partials(spark, stream, out, (tmp_path / "ck1").as_posix())
    assert spark.read.parquet(out).select("batch_id").distinct().count() >= 2

    # disaster recovery: checkpoint lost, replay everything as batch 0
    stream2 = spark.readStream.schema(events.schema).parquet(src.as_posix())
    run_cms_partials(spark, stream2, out, (tmp_path / "ck2").as_posix())

    assert spark.read.parquet(out).select("batch_id").distinct().count() == 1
    got = {(r.j, r.bucket): r.c for r in cms_merge(spark, out).collect()}
    want = {(r.j, r.bucket): r.c for r in cms_partial(events).collect()}
    assert got == want


def test_bottomk_partials_merge_to_batch_sample(spark, sf_dir, tmp_path):
    """Streaming bottom-k: per-batch k-row partials merged by another
    bottom-k must equal the sample built over the whole input in one
    pass — byte-identical keys, the KMV mergeability law live."""
    import os
    import time as _time

    from doc2dataset_spark.queries.sketch_sample import bottomk_sample
    from doc2dataset_spark.streaming.sketch import (
        bottomk_merge,
        run_bottomk_partials,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "value"
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = tmp_path / "bk_stream"
    os.makedirs(src, exist_ok=True)
    lo = src / "b0.parquet"
    hi = src / "b1.parquet"
    events.filter(f"event_id <= {int(mid)}").toPandas().to_parquet(
        lo.as_posix()
    )
    events.filter(f"event_id > {int(mid)}").toPandas().to_parquet(
        hi.as_posix()
    )
    os.utime(hi, (_time.time() + 2, _time.time() + 2))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.as_posix())
    )
    out = (tmp_path / "bk_partials").as_posix()
    ckpt = (tmp_path / "bk_ckpt").as_posix()
    run_bottomk_partials(spark, stream, out, ckpt)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2

    got = [r["h"] for r in bottomk_merge(spark, out).orderBy("h").collect()]
    want = [
        r["h"]
        for r in bottomk_sample(events, "event_id").orderBy("h").collect()
    ]
    assert got == want


def test_stream_stream_outer_join_watermark_semantics(spark, sf_dir):
    """LEFT OUTER stream-stream join: matched rows must equal the batch
    join exactly; unmatched (null-extended) rows are emitted only for
    views the final watermark has sealed (wm > v_ts + 30min) — asserted
    as a sandwich between the strict and lax boundary readings, with the
    batch outer join as the truth set."""
    import datetime

    from pyspark.sql import functions as F

    from doc2dataset_spark.session import load_table
    from doc2dataset_spark.streaming.events import (
        interval_join_stream_outer,
        run_to_memory,
        stream_events,
    )

    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in run_to_memory(
            spark,
            interval_join_stream_outer(stream_events(spark, sf_dir)),
            "ssjoin_outer_out",
            output_mode="append",
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = interval_join_stream_outer(ev).collect()
    matched_want = {
        (r.user_id, r.view_id, r.click_id)
        for r in batch
        if r.click_id is not None
    }
    matched_got = {t for t in got if t[2] is not None}
    assert matched_got == matched_want

    wm = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(hours=1)
    sealed_strict = wm - datetime.timedelta(minutes=31)
    sealed_lax = wm - datetime.timedelta(minutes=29)
    nulls_by_view = {
        r.view_id: datetime.datetime.strptime(
            r.view_ts, "%Y-%m-%d %H:%M:%S"
        )
        for r in batch
        if r.click_id is None
    }
    null_got = {t[1] for t in got if t[2] is None}
    must_emit = {
        vid for vid, ts in nulls_by_view.items() if ts < sealed_strict
    }
    may_emit = {
        vid for vid, ts in nulls_by_view.items() if ts < sealed_lax
    }
    assert must_emit <= null_got <= may_emit
    assert must_emit, "fixture left no sealed unmatched views — vacuous"
