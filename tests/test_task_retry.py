"""Real-task-retry e2e for the two-phase-commit file sink.

The existing sink tests simulate executor death by planting orphan temp
files; this one makes Spark actually RETRY a failed write task and
proves the commit protocol end-to-end: a write task dies mid-file on its
first attempt (injected via ``TaskContext.attemptNumber``), the retry
re-runs it, and the output is exactly-once — every row present once,
shard files complete, no ``._tmp_*`` litter.

Local mode defaults to 1 task attempt (any failure fails the job), so
the scenario needs its own SparkSession with ``local[4,2]`` — a second
SparkContext cannot coexist in the test JVM, hence the subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_SCRIPT = r"""
import glob, json, os, sys, tarfile

from pyspark.sql import SparkSession

out = sys.argv[1]
N_ROWS, N_SHARDS = 40, 4

spark = (
    SparkSession.builder.master("local[4,2]")  # 2 task attempts
    .appName("task_retry_e2e")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
rows = [
    (i % N_SHARDS, f"k{i:04d}", f"payload-{i}".encode()) for i in range(N_ROWS)
]
frame = spark.createDataFrame(rows, "shard_id int, key string, text binary")

from doc2dataset_spark.sinks.writer import _TarWriter, _write_sharded

failures = []

def open_writer(fs, path):
    return _TarWriter(fs, path)

def add_row(handle, row):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    # die mid-file on every FIRST attempt that handles shard 0: some
    # bytes are already in the temp tar when the task is torn down
    if ctx.attemptNumber() == 0 and row["shard_id"] == 0 and row["key"] >= "k0008":
        raise RuntimeError("injected mid-write failure (first attempt)")
    import io
    data = bytes(row["text"])
    info = tarfile.TarInfo(name=f"{row['key']}.txt")
    info.size = len(data)
    handle.tar.addfile(info, io.BytesIO(data))

_write_sharded(frame, out, "tar", open_writer, add_row)
spark.stop()

# --- assertions happen in the parent; just report the facts ---
seen = {}
for p in sorted(glob.glob(os.path.join(out, "*.tar"))):
    with tarfile.open(p) as t:
        for m in t.getmembers():
            seen[m.name] = seen.get(m.name, 0) + 1
print(json.dumps({
    "files": sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "*"))),
    "members": seen,
}))
"""


def test_write_survives_real_task_retry(tmp_path):
    out = str(tmp_path / "wds_out")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, out],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    # exactly-once: all 40 keys present, each exactly once
    assert len(report["members"]) == 40
    assert all(c == 1 for c in report["members"].values())
    # one complete tar per shard, and no temp litter survived the retry
    tars = [f for f in report["files"] if f.endswith(".tar")]
    assert sorted(tars) == [f"{i:05d}.tar" for i in range(4)]
    assert not [f for f in report["files"] if f.startswith("._tmp_")]
    # the injected failure actually fired: Spark logged the lost task
    assert "injected mid-write failure" in proc.stderr
