"""Remote-storage parity (reference `writer.py:19-20`, `main.py:110-117`):
every driver/executor-side Python IO path routes through fsio's
fsspec-shaped filesystems, so `output_folder="s3://…"` behaves like the
reference instead of crashing on `os.path`.

Hermetic coverage strategy: `memory://` exercises the non-local branch for
all DRIVER-side state (overwrite rm, manifest write, resume read) — it is
per-process by design, exactly like fsspec's MemoryFileSystem, so
EXECUTOR-side sink writes are covered through `file://` URLs instead,
which run the same fsio dispatch + fs.open/mv/rm code in the workers
against a filesystem the assertions can see."""

from __future__ import annotations

import glob
import os
import tarfile

import pytest

from doc2dataset_spark import fsio
from doc2dataset_spark.config import DownloadConfig
from doc2dataset_spark.plans.pipeline import download
from tests.fixtures import build_corpus, write_url_csv


# ---------------------------------------------------------------------------
# filesystem unit semantics
# ---------------------------------------------------------------------------
def test_memoryfs_roundtrip():
    fs, _ = fsio.url_to_fs("memory://t1/a")
    with fs.open("memory://t1/a/x.bin", "wb") as fh:
        fh.write(b"payload")
    assert fs.exists("memory://t1/a/x.bin")
    assert fs.exists("memory://t1/a")  # prefix counts as a "directory"
    with fs.open("memory://t1/a/x.bin", "rb") as fh:
        assert fh.read() == b"payload"
    fs.mv("memory://t1/a/x.bin", "memory://t1/a/y.bin")
    assert not fs.exists("memory://t1/a/x.bin")
    assert fs.find("memory://t1") == ["memory://t1/a/y.bin"]
    fs.rm("memory://t1", recursive=True)
    assert not fs.exists("memory://t1/a/y.bin")
    with pytest.raises(FileNotFoundError):
        fs.open("memory://t1/a/y.bin", "rb")
    # fsspec error contract: mv of a missing source is FileNotFoundError,
    # never a bare KeyError
    with pytest.raises(FileNotFoundError):
        fs.mv("memory://t1/absent", "memory://t1/other")


def test_wasbs_driver_side_ops_route_through_abfs():
    """Spark reads wasbs:// natively, but fsspec/adlfs registers only
    abfs/az — driver-side exists/rm on a wasbs URL must translate the
    scheme instead of failing protocol lookup. adlfs isn't in this
    container, so assert the translated protocol is what reaches fsspec."""
    pytest.importorskip("fsspec")
    with pytest.raises(ImportError, match="abfs|adlfs"):
        fsio.url_to_fs("wasbs://container@acct.blob.core.windows.net/p")


def test_localfs_handles_file_scheme(tmp_path):
    fs, _ = fsio.url_to_fs(f"file://{tmp_path}/d")
    fs.makedirs(f"file://{tmp_path}/d", exist_ok=True)
    with fs.open(f"file://{tmp_path}/d/f.txt", "wb") as fh:
        fh.write(b"x")
    assert (tmp_path / "d" / "f.txt").read_bytes() == b"x"
    assert fs.exists(f"file://{tmp_path}/d/f.txt")
    assert fs.find(f"file://{tmp_path}") == [str(tmp_path / "d" / "f.txt")]


def test_unknown_scheme_names_fsspec():
    with pytest.raises(ValueError, match="fsspec"):
        fsio.url_to_fs("s3://bucket/key")


def test_parquet_helpers_over_memory():
    import pyarrow as pa

    t = pa.table({"shard_id": [0, 1], "n": [4, 5]})
    fsio.write_parquet_file(t, "memory://t2/_stats", "part-0.parquet")
    back = fsio.read_parquet_dir("memory://t2/_stats")
    assert back.sort_by("shard_id").to_pydict() == {
        "shard_id": [0, 1],
        "n": [4, 5],
    }
    assert fsio.read_parquet_dir("memory://t2/absent") is None
    fsio.url_to_fs("memory://t2")[0].rm("memory://t2", recursive=True)


# ---------------------------------------------------------------------------
# e2e through the pipeline
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_fsio"))
    meta = build_corpus(root)
    write_url_csv(root, meta)
    return root, meta


def _cfg(root: str, out: str, **kw) -> DownloadConfig:
    defaults = dict(
        url_list=os.path.join(root, "urls.csv"),
        output_folder=out,
        input_format="csv",
        compute_hash="sha256",
        min_words_per_page=5,
        thread_count=8,
        number_sample_per_shard=4,
    )
    defaults.update(kw)
    return DownloadConfig(**defaults)


def test_download_resume_over_memory_url(spark, corpus):
    """samples(dummy) + _stats + incremental resume entirely through a
    non-local URL: the manifest is written via arrow-over-fs, read back
    for the resume anti-join, and the second run fetches zero documents."""
    root, _ = corpus
    out = "memory://e2e/run1"
    try:
        cfg = _cfg(root, out, output_format="dummy")
        s1 = download(spark, cfg)
        assert s1["successes"] > 0 and s1["rows"] > 0
        fs, _ = fsio.url_to_fs(out)
        parts = [p for p in fs.find(out + "/_stats") if p.endswith(".parquet")]
        assert len(parts) == 1
        # resume: all shards already in the manifest -> nothing recomputed
        _, _, summary2 = download(
            spark, _cfg(root, out, output_format="dummy"), return_frames=True
        )
        roll2 = summary2.collect()[0].asDict()
        assert roll2["successes"] == s1["successes"]  # rollup is cumulative
        assert roll2["count"] == s1["count"]  # zero new rows appended
        # overwrite mode clears the remote folder before writing
        s3 = download(
            spark,
            _cfg(root, out, output_format="dummy", incremental_mode="overwrite"),
        )
        assert s3["rows"] == s1["rows"]
        parts = [p for p in fs.find(out + "/_stats") if p.endswith(".parquet")]
        assert len(parts) == 1
    finally:
        fs, _ = fsio.url_to_fs(out)
        if fs.exists("memory://e2e"):
            fs.rm("memory://e2e", recursive=True)


def test_webdataset_sink_over_file_url(spark, corpus, tmp_path):
    """executor-side fsio: the tar sink's open/mv/rm run in workers against
    a scheme-routed URL (file:// shares the LocalFS code path with any
    fsspec backend)."""
    root, _ = corpus
    out_dir = tmp_path / "wds"
    cfg = _cfg(root, f"file://{out_dir}", output_format="webdataset")
    download(spark, cfg)
    tars = glob.glob(str(out_dir / "*.tar"))
    assert tars
    names = []
    for t in tars:
        with tarfile.open(t) as tar:
            names += tar.getnames()
    assert any(n.endswith(".text") for n in names)
    assert os.path.exists(out_dir / "_meta")


def test_files_sink_over_file_url(spark, corpus, tmp_path):
    root, _ = corpus
    out_dir = tmp_path / "files"
    cfg = _cfg(root, f"file://{out_dir}", output_format="files")
    download(spark, cfg)
    texts = glob.glob(str(out_dir / "*" / "*.text"))
    metas = glob.glob(str(out_dir / "*" / "*.json"))
    assert texts and len(texts) == len(metas)


def test_executor_side_sink_refuses_memory_url(spark, corpus):
    """foreachPartition sinks over memory:// would write into executor-local
    stores the driver can't see — data silently lost. download() must refuse
    up front rather than 'succeed'."""
    root, _ = corpus
    # seed prior output: the refusal must fire BEFORE overwrite-mode's rm,
    # or a doomed run deletes data and then errors
    mfs, _ = fsio.url_to_fs("memory://lost/run")
    with mfs.open("memory://lost/run/prior.bin", "wb") as f:
        f.write(b"keep me")
    for fmt in ("files", "webdataset", "tfrecord"):
        cfg = _cfg(
            root, "memory://lost/run", output_format=fmt,
            incremental_mode="overwrite",
        )
        with pytest.raises(ValueError, match="memory://"):
            download(spark, cfg)
    assert mfs.exists("memory://lost/run/prior.bin"), (
        "overwrite rm ran before the sink-target check"
    )


def test_download_does_not_mutate_callers_config(spark, corpus, tmp_path):
    """download() absolutizes output_folder into a copy; the caller's
    DownloadConfig must come back byte-identical so it can be reused after
    a cwd change."""
    root, _ = corpus
    os.makedirs(tmp_path / "cwd", exist_ok=True)
    old = os.getcwd()
    os.chdir(tmp_path / "cwd")
    try:
        cfg = _cfg(root, "rel_out", output_format="dummy")
        download(spark, cfg)
        assert cfg.output_folder == "rel_out"
    finally:
        os.chdir(old)


def test_ensure_local_cache_dir_atomic_and_race_safe(tmp_path):
    """Build-once semantics: first call builds and publishes atomically;
    a second call is a no-op read; a racing builder that loses the
    rename discards its private copy without clobbering the winner."""
    import os

    from doc2dataset_spark.fsio import ensure_local_cache_dir

    target = str(tmp_path / "cache")
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(os.path.join(tmp, "marker"))
        with open(os.path.join(tmp, "marker", "v"), "w") as fh:
            fh.write("first")

    assert ensure_local_cache_dir(target, "marker", build) == target
    assert open(os.path.join(target, "marker", "v")).read() == "first"
    assert len(calls) == 1

    # ready cache: build not invoked again
    ensure_local_cache_dir(target, "marker", build)
    assert len(calls) == 1

    # simulate a racing loser: target already exists when rename fires
    def build_loser(tmp):
        os.makedirs(os.path.join(tmp, "marker"))
        with open(os.path.join(tmp, "marker", "v"), "w") as fh:
            fh.write("loser")

    # force the race by removing the marker so the builder runs, but the
    # target dir itself still exists non-empty -> rename must fail
    ensure_local_cache_dir(target + "_x", "marker", build)
    os.rename(target + "_x", target + "_y")
    os.makedirs(target + "_x")
    with open(os.path.join(target + "_x", "occupied"), "w") as fh:
        fh.write("winner-was-here")
    ensure_local_cache_dir(target + "_x", "marker", build_loser)
    # winner's content intact, loser's private dir cleaned up
    assert os.path.exists(os.path.join(target + "_x", "occupied"))
    leftovers = [
        d for d in os.listdir(tmp_path) if ".build-" in d
    ]
    assert leftovers == []
