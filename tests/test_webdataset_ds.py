"""WebDataset Python DataSource: round-trip, determinism, commit protocol."""

from __future__ import annotations

import glob
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from doc2dataset_spark.sources import webdataset_ds


@pytest.fixture(scope="module")
def registered(spark):
    webdataset_ds.register(spark)
    return spark


def _sample_df(spark, n=23):
    return (
        spark.range(n)
        .select(
            F.format_string("%05d", F.col("id")).alias("key"),
            F.encode(F.format_string("doc body %d", F.col("id")), "utf-8").alias(
                "text"
            ),
            (F.col("id") % 3 == 0).alias("flag"),
            F.format_string("en-%d", F.col("id") % 2).alias("language"),
        )
        .repartition(4, "key")
    )


def test_roundtrip(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "wds")
    df = _sample_df(spark)
    df.write.format("webdataset").mode("overwrite").save(out)

    # shard layout: one tar per task + manifest, no temp litter
    tars = sorted(glob.glob(os.path.join(out, "part-*.tar")))
    assert tars and not glob.glob(os.path.join(out, "_tmp-*"))
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_samples"] == 23
    assert len(manifest["shards"]) == len(tars)

    back = spark.read.format("webdataset").load(out)
    rows = {r["key"]: r for r in back.collect()}
    assert len(rows) == 23
    assert bytes(rows["00007"]["text"]) == b"doc body 7"
    meta = json.loads(rows["00006"]["meta"])
    assert meta == {"flag": True, "language": "en-0"}


def test_read_partitions_parallel(registered, tmp_path):
    """One input partition per tar shard — the scale contract."""
    spark = registered
    out = str(tmp_path / "wds")
    _sample_df(spark).write.format("webdataset").mode("overwrite").save(out)
    n_tars = len(glob.glob(os.path.join(out, "part-*.tar")))
    df = spark.read.format("webdataset").load(out)
    assert df.rdd.getNumPartitions() == n_tars


def test_deterministic_shards(registered, tmp_path):
    """Same data + partitioning → byte-identical tars (mtime pinned)."""
    spark = registered
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _sample_df(spark).sortWithinPartitions("key")
    df.write.format("webdataset").mode("overwrite").save(a)
    df.write.format("webdataset").mode("overwrite").save(b)
    for pa in sorted(glob.glob(os.path.join(a, "part-*.tar"))):
        pb = os.path.join(b, os.path.basename(pa))
        assert open(pa, "rb").read() == open(pb, "rb").read()


def test_overwrite_replaces_old_shards(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "wds")
    _sample_df(spark, n=23).write.format("webdataset").mode("overwrite").save(out)
    # second write with fewer partitions must not leave orphan shards behind
    small = _sample_df(spark, n=5).coalesce(1)
    small.write.format("webdataset").mode("overwrite").save(out)
    back = spark.read.format("webdataset").load(out)
    assert back.count() == 5


def test_member_naming_webdataset_convention(registered, tmp_path):
    """Members are <key>.text / <key>.json — loadable by the webdataset
    library and the reference's own tar layout (`writer.py:88-126`)."""
    spark = registered
    out = str(tmp_path / "wds")
    _sample_df(spark, n=4).coalesce(1).write.format("webdataset").mode(
        "overwrite"
    ).save(out)
    tar = tarfile.open(glob.glob(os.path.join(out, "part-*.tar"))[0])
    names = sorted(m.name for m in tar.getmembers())
    assert names == sorted(
        [f"{k:05d}.text" for k in range(4)] + [f"{k:05d}.json" for k in range(4)]
    )


def test_stream_reader_incremental_shards(registered, tmp_path):
    """readStream picks up tar shards incrementally: first micro-batch sees
    the initial shards, later batches only the newly-landed ones."""
    import shutil

    spark = registered
    out = str(tmp_path / "stream_src")
    stage = str(tmp_path / "stage")
    _sample_df(spark, n=12).repartition(3, "key").write.format(
        "webdataset"
    ).mode("overwrite").save(stage)
    staged = sorted(glob.glob(os.path.join(stage, "part-*.tar")))
    assert len(staged) == 3
    os.makedirs(out)
    shutil.copy(staged[0], os.path.join(out, "part-00000.tar"))

    stream = spark.readStream.format("webdataset").load(out)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wds_stream")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) FROM wds_stream").collect()[0][0]
        # land two more shards with later names, then drain again
        shutil.copy(staged[1], os.path.join(out, "part-00001.tar"))
        shutil.copy(staged[2], os.path.join(out, "part-00002.tar"))
        q.processAllAvailable()
        n2 = spark.sql("SELECT count(*) FROM wds_stream").collect()[0][0]
    finally:
        q.stop()
    assert 0 < n1 < n2 == 12
    # no sample read twice across micro-batches
    assert (
        spark.sql("SELECT count(DISTINCT key) FROM wds_stream").collect()[0][0]
        == 12
    )


def test_leaked_temp_not_read_as_shard(registered, spark, tmp_path):
    """A temp file orphaned by an executor death (written, never committed)
    must not match the readers' *.tar glob — it would duplicate or corrupt
    every sample in that shard on the next read."""
    out = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [("k1", "text one", "m1"), ("k2", "text two", "m2")],
        "key string, text string, caption string",
    )
    df.coalesce(1).write.format("webdataset").mode("overwrite").save(out)
    n1 = spark.read.format("webdataset").load(out).count()
    # orphan a half-written temp alongside the committed shard
    leaked = os.path.join(out, "_tmp-00000-deadbeef.tar.inprogress")
    with open(leaked, "wb") as fh:
        fh.write(b"torn half-written tar bytes")
    assert spark.read.format("webdataset").load(out).count() == n1


def test_interleaved_members_raise(registered, spark, tmp_path):
    """A foreign tar with INTERLEAVED sample members violates WebDataset's
    adjacency contract; the streaming reader must raise a clear error, not
    silently emit duplicate keys with split samples."""
    out = str(tmp_path / "wds")
    os.makedirs(out)
    with tarfile.open(os.path.join(out, "part-00000.tar"), "w") as tar:
        for name, payload in [
            ("a.text", b"alpha"),
            ("b.text", b"beta"),   # a's members split around b's
            ("a.json", b"{}"),
            ("b.json", b"{}"),
        ]:
            ti = tarfile.TarInfo(name=name)
            ti.size = len(payload)
            import io as _io

            tar.addfile(ti, _io.BytesIO(payload))
    with pytest.raises(Exception, match="non-contiguous sample members"):
        spark.read.format("webdataset").load(out).collect()


def test_key_with_dots_roundtrips(registered, spark, tmp_path):
    """Extensions split from the RIGHT: 'doc.v2' must come back intact,
    not truncated to 'doc' with unmatched extensions."""
    out = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [("doc.v1", "first", "a"), ("doc.v2", "second", "b")],
        "key string, text string, caption string",
    )
    df.coalesce(1).write.format("webdataset").mode("overwrite").save(out)
    got = {
        r["key"]: bytes(r["text"])
        for r in spark.read.format("webdataset").load(out).collect()
    }
    assert got == {"doc.v1": b"first", "doc.v2": b"second"}
