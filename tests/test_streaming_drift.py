"""Streaming PSI drift monitor: stream ≡ batch identity, independent
per-batch scoring against the frozen reference, and replay idempotence."""

from __future__ import annotations

import os
import time as _time

from doc2dataset_spark.queries import REGISTRY
from doc2dataset_spark.session import load_table
from doc2dataset_spark.streaming.drift import (
    batch_verdicts,
    drift_serve,
    reference_histogram,
    run_drift_monitor,
)

COLS = ["doc_id", "source", "n_chars"]


def _write_slices(spark, docs, tmp_path, preds):
    """Land each predicate's slice as one file in a watched dir (files
    ordered by mtime so maxFilesPerTrigger=1 gives one batch each)."""
    import glob as _glob
    import shutil as _shutil

    src = tmp_path / "doc_stream"
    os.makedirs(src, exist_ok=True)
    for i, pred in enumerate(preds):
        d = tmp_path / f"slice_{i}"
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            d.as_posix()
        )
        dst = (src / f"b{i}.parquet").as_posix()
        _shutil.copy(_glob.glob((d / "part-*.parquet").as_posix())[0], dst)
        os.utime(dst, (_time.time() + 2 * i, _time.time() + 2 * i))
    return src


def _stream(spark, schema, src):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src.as_posix())
    )


def _as_dict(rows):
    return {r["source"]: (r["n_docs"], r["psi"], r["drifted"]) for r in rows}


def test_single_batch_stream_equals_batch_query(spark, sf_dir, tmp_path):
    """Whole corpus in ONE micro-batch, reference = the corpus itself
    ⇒ verdicts must equal quality_psi_drift value-for-value."""
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    binc_rows, tot_rows = reference_histogram(docs)
    src = _write_slices(spark, docs, tmp_path, ["doc_id IS NOT NULL"])
    run_drift_monitor(
        spark,
        _stream(spark, docs.schema, src),
        binc_rows,
        tot_rows,
        (tmp_path / "verdicts").as_posix(),
        (tmp_path / "ckpt").as_posix(),
    )
    served = drift_serve(spark, (tmp_path / "verdicts").as_posix())
    batch = REGISTRY["quality_psi_drift"].builder(spark, sf_dir)
    assert _as_dict(served.collect()) == _as_dict(batch.collect())


def test_batches_scored_independently_and_replay_idempotent(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents").select(*COLS)
    binc_rows, tot_rows = reference_histogram(docs)
    mid = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
    preds = [f"n_chars <= {int(mid)}", f"n_chars > {int(mid)}"]
    src = _write_slices(spark, docs, tmp_path, preds)
    out = (tmp_path / "verdicts").as_posix()
    ckpt = (tmp_path / "ckpt").as_posix()
    run_drift_monitor(
        spark, _stream(spark, docs.schema, src), binc_rows, tot_rows,
        out, ckpt,
    )
    served = drift_serve(spark, out)
    assert sorted(
        r.batch_id for r in served.select("batch_id").distinct().collect()
    ) == [0, 1]
    # each batch scored against the SAME frozen reference, independently:
    # the short-doc batch must read as drifted (its mass sits in the low
    # bins while the reference spreads over all 8)
    for bid, pred in enumerate(preds):
        direct = batch_verdicts(docs.filter(pred), binc_rows, tot_rows)
        assert _as_dict(
            served.filter(served.batch_id == bid).collect()
        ) == _as_dict(direct.collect())
    assert all(r.drifted for r in served.collect())
    # same-checkpoint replay (no new files): no duplicate/changed rows
    def by_batch(rows):
        return {(r["batch_id"], r["source"]): (r["n_docs"], r["psi"]) for r in rows}

    before = by_batch(served.collect())
    run_drift_monitor(
        spark, _stream(spark, docs.schema, src), binc_rows, tot_rows,
        out, ckpt,
    )
    assert by_batch(drift_serve(spark, out).collect()) == before
