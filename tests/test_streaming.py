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
