"""transformWithStateInPandas running totals: the final update per user
over a finite two-batch replay must equal the batch groupBy totals.

Env-gated: Spark 4's transformWithState ships its state-server protocol
over protobuf (`transform_with_state_driver_worker.py` imports
google.protobuf), which this container lacks — same class of gate as the
fitz/PIL codec tests. Recipe: `pip install protobuf` (any 4.x/5.x), then
this test runs and the skip count drops by one."""

from __future__ import annotations

import glob as _glob
import os
import shutil as _shutil
import time as _time

import pytest
from pyspark.sql import functions as F

from doc2dataset_spark.session import load_table
from doc2dataset_spark.streaming.tws import running_totals_stream

SF = "/root/testdata/sf0.001"


def test_transform_with_state_running_totals(spark, tmp_path):
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState state-server protocol needs protobuf",
    )
    events = load_table(spark, SF, "events").select("user_id", "value")
    mid = events.approxQuantile("user_id", [0.5], 0.0)[0]
    src = tmp_path / "tws_stream"
    os.makedirs(src, exist_ok=True)
    for fname, pred in (
        ("b0.parquet", f"user_id <= {int(mid)}"),
        ("b1.parquet", f"user_id > {int(mid)} OR user_id <= {int(mid) // 2}"),
    ):
        d = tmp_path / f"slice_{fname}"
        events.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            d.as_posix()
        )
        dst = (src / fname).as_posix()
        _shutil.copy(
            _glob.glob((d / "part-*.parquet").as_posix())[0], dst
        )
    os.utime(
        src / "b1.parquet", (_time.time() + 2, _time.time() + 2)
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.as_posix())
    )
    q = (
        running_totals_stream(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .option(
            "checkpointLocation", (tmp_path / "tws_ckpt").as_posix()
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # last emitted row per user wins (update mode re-emits refreshed
    # totals; memory sink appends, so take the max n_events per user —
    # totals only grow)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in spark.sql(
            """SELECT user_id, max_by(n_events, n_events) AS n_events,
                      max_by(total_value, n_events) AS total_value
               FROM tws_out GROUP BY user_id"""
        ).collect()
    }
    # overlap slice: users <= mid//2 appear in BOTH batches, so their
    # totals must show double counting of the overlap rows — i.e. the
    # state genuinely accumulated across batches
    want_rows = (
        events.unionByName(
            events.filter(f"user_id <= {int(mid) // 2}")
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("value").alias("t"),
        )
        .collect()
    )
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4)) for r in want_rows
    }
    assert got == want
