"""Streaming MV maintenance: merged streaming partials must equal both
the batch incremental refresh AND the one-pass recompute, value for
value — and a crash-replay with the same checkpoint must not change the
answer."""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import functions as F

from doc2dataset_spark.queries.maintenance_ops import mv_partial, mv_merge_partials
from doc2dataset_spark.session import load_table
from doc2dataset_spark.streaming.rollup import (
    rollup_serve,
    run_rollup_partials,
)

COLS = ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]


def _split_stream(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(*COLS)
    mid = li.approxQuantile("l_orderkey", [0.5], 0.0)[0]
    src = tmp_path / "li_stream"
    os.makedirs(src, exist_ok=True)
    # write the slices through Spark (a pandas round-trip would write
    # nano timestamps the stream reader rejects), then lift each part
    # file into the watched dir
    import glob as _glob
    import shutil as _shutil

    for fname, pred in (
        ("b0.parquet", f"l_orderkey <= {int(mid)}"),
        ("b1.parquet", f"l_orderkey > {int(mid)}"),
    ):
        d = tmp_path / f"slice_{fname}"
        li.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            d.as_posix()
        )
        _shutil.copy(
            _glob.glob((d / "part-*.parquet").as_posix())[0],
            (src / fname).as_posix(),
        )
    os.utime(src / "b1.parquet", (_time.time() + 2, _time.time() + 2))
    return li, (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.as_posix())
    )


def _as_dict(rows):
    return {r["day"]: (r["revenue"], r["n_items"]) for r in rows}


def test_streaming_rollup_equals_batch(spark, sf_dir, tmp_path):
    li, stream = _split_stream(spark, sf_dir, tmp_path)
    out = (tmp_path / "mv_partials").as_posix()
    ckpt = (tmp_path / "mv_ckpt").as_posix()
    run_rollup_partials(spark, stream, out, ckpt)

    partials = spark.read.parquet(out)
    assert partials.select("batch_id").distinct().count() >= 2, (
        "stream collapsed into one micro-batch — the merge is not real"
    )

    got = _as_dict(rollup_serve(spark, out).collect())
    want = _as_dict(mv_merge_partials(mv_partial(li)).collect())
    assert got == want


def test_streaming_rollup_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running with the SAME checkpoint (committed batches) must leave
    the served MV unchanged — the restart discipline the module
    docstring promises."""
    li, stream = _split_stream(spark, sf_dir, tmp_path)
    out = (tmp_path / "mv_partials").as_posix()
    ckpt = (tmp_path / "mv_ckpt").as_posix()
    run_rollup_partials(spark, stream, out, ckpt)
    first = _as_dict(rollup_serve(spark, out).collect())

    stream2 = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet((tmp_path / "li_stream").as_posix())
    )
    run_rollup_partials(spark, stream2, out, ckpt)
    assert _as_dict(rollup_serve(spark, out).collect()) == first
