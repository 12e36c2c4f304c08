"""Output sinks (reference W1-W8, `writer.py:13-323`).

Native Spark writers where a format exists (parquet, jsonl.gz, noop);
``foreachPartition`` writers for the sample-per-file formats Spark has no
sink for (webdataset tars, one-file-per-sample, tfrecord). Partition writes
are idempotent under task retry: content is written to a temp path keyed by
partition id and renamed on success.

The reference buffers 100 rows per flush by hand (`writer.py:16-45`);
Spark's writers buffer natively. TFRecord needs no TensorFlow: the record
framing (length + masked CRC-32C) is ~30 lines of stdlib (the reference
lazily imports TF for this, `writer.py:166-267`).
"""

from __future__ import annotations

import io
import json
import struct
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doc2dataset_spark import fsio
from doc2dataset_spark.config import DownloadConfig

META_COLUMNS = (
    "key",
    "status",
    "error_message",
    "exif",
    "language",
    "total_words",
    "images_per_page",
)


# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli) — needed for TFRecord framing; stdlib-only
# ---------------------------------------------------------------------------
_CRC32C_TABLE = []


def _crc32c_table():
    global _CRC32C_TABLE
    if not _CRC32C_TABLE:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
            table.append(crc)
        _CRC32C_TABLE = table
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def tfrecord_frame(payload: bytes) -> bytes:
    """One TFRecord: len + masked_crc(len) + payload + masked_crc(payload)."""
    length = struct.pack("<Q", len(payload))
    return (
        length
        + struct.pack("<I", _masked_crc(length))
        + payload
        + struct.pack("<I", _masked_crc(payload))
    )


def _tf_example(text: bytes, meta: dict) -> bytes:
    """Minimal tf.train.Example proto encoding (bytes/int64 features only) —
    hand-rolled protobuf wire format, no TF import."""

    def _varint(n: int) -> bytes:
        # proto int64 wire format: negatives encode as 10-byte two's
        # complement (a bare `n >>= 7` on a negative Python int never
        # reaches 0 — infinite loop)
        if n < 0:
            n += 1 << 64
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def _bytes_feature(value: bytes) -> bytes:
        # Feature{ bytes_list: BytesList{ value: [v] } }
        inner = b"\x0a" + _varint(len(value)) + value  # BytesList.value
        blist = b"\x0a" + _varint(len(inner)) + inner  # Feature.bytes_list
        return blist

    def _int64_feature(value: int) -> bytes:
        inner = b"\x08" + _varint(value)  # Int64List.value (non-negative)
        ilist = b"\x12" + _varint(len(inner)) + inner  # Feature.int64_list
        return ilist

    feats = b""
    entries = {"text": _bytes_feature(text)}
    for k, v in meta.items():
        if v is None:
            continue
        if isinstance(v, int):
            entries[k] = _int64_feature(v)
        else:
            entries[k] = _bytes_feature(str(v).encode("utf-8"))
    for name, feat in entries.items():
        kbytes = name.encode()
        entry = (
            b"\x0a" + _varint(len(kbytes)) + kbytes
            + b"\x12" + _varint(len(feat)) + feat
        )
        feats += b"\x0a" + _varint(len(entry)) + entry
    features = b"\x0a" + _varint(len(feats)) + feats
    return features


def _meta_of(row, extra_cols: list[str]) -> dict:
    d = row.asDict()
    meta = {c: d[c] for c in META_COLUMNS if c in d}
    for c in extra_cols:
        meta[c] = d.get(c)
    return meta


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------
def _samples_frame(df: DataFrame, cfg: DownloadConfig) -> DataFrame:
    """Successful samples with the text payload as binary, named by
    encode_format (reference `writer.py:68`, `main.py:101`)."""
    return (
        df.filter(F.col("status") == "success")
        .withColumn("_payload", F.col("text").cast("binary"))
        .drop("text")
        .withColumnRenamed("_payload", cfg.encode_format)
    )


def write_parquet(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """W1/W2: sample parquet partitioned by shard (file-per-shard parity
    comes from partitionBy, not manual writer management)."""
    # dynamic partition overwrite: replaces ONLY the shard partitions this
    # run writes — prior runs' shards survive (resume), and a crash-replay
    # of the same shards is idempotent where append would duplicate rows
    _samples_frame(df, cfg).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard_id").parquet(fsio.join(out, "samples"))


def write_orc(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """ORC sink (engine extension; same dynamic-partition-overwrite resume
    discipline as parquet — ORC shares parquet's Spark-native columnar
    writer path)."""
    _samples_frame(df, cfg).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard_id").orc(fsio.join(out, "samples"))


def write_jsonl(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """W4: gzipped jsonl; the binary payload column goes out as utf-8."""
    frame = df.filter(F.col("status") == "success").withColumnRenamed(
        "text", cfg.encode_format
    )
    frame.write.mode("append").option("compression", "gzip").json(
        fsio.join(out, "samples")
    )


def write_files(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """W6: <out>/<shard>/<key>.text + <key>.json per sample."""
    frame = _samples_frame(df, cfg)
    extra = [
        c for c in frame.columns
        if c not in (*META_COLUMNS, cfg.encode_format, "shard_id")
    ]
    enc = cfg.encode_format

    def write_partition(rows) -> None:
        fs, _ = fsio.url_to_fs(out)
        made = set()
        for row in rows:
            d = fsio.join(out, f"{int(row['shard_id']):05d}")
            if d not in made:
                fs.makedirs(d, exist_ok=True)
                made.add(d)
            key = row["key"]
            payload = bytes(row[enc]) if row[enc] is not None else b""
            with fs.open(fsio.join(d, f"{key}.text"), "wb") as fh:
                fh.write(payload)
            with fs.open(fsio.join(d, f"{key}.json"), "wb") as fh:
                fh.write(json.dumps(_meta_of(row, extra), default=str).encode())

    frame.foreachPartition(write_partition)


def _write_meta_sidecar(meta_frame, out: str) -> None:
    """Shard-partitioned parquet metadata next to the payload files.

    Dynamic partition overwrite, NOT append: a run that crashes after the
    payload rename but before the ``_stats`` manifest write gets its shards
    reprocessed on resume — overwrite-by-partition replays them idempotently
    (matching the payload's whole-file-rename discipline) where append would
    stack duplicate metadata rows. Prior runs' shard partitions are never
    touched (dynamic mode only replaces partitions present in this frame)."""
    meta_frame.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("shard_id").parquet(fsio.join(out, "_meta"))


def _sweep_orphan_tmps(fs, out: str, ext: str) -> None:
    """Remove ``._tmp_*.<ext>`` litter left by dead task attempts of a
    PRIOR run (dot-prefixed names are invisible to Spark and this repo's
    readers, so this is cost hygiene on object stores, not correctness).
    Assumes one writing job per output dir — same contract as the rename
    commit protocol itself."""
    try:
        paths = fs.find(out)
    except FileNotFoundError:
        return
    for p in paths:
        base = p.rsplit("/", 1)[-1].rsplit("\\", 1)[-1]
        if base.startswith("._tmp_") and base.endswith(f".{ext}"):
            try:
                fs.rm(p)
            except FileNotFoundError:
                pass


def _write_sharded(frame, out: str, ext: str, open_writer, add_row) -> None:
    """Shared shape for the per-shard file sinks (webdataset/tfrecord):

    - files are named by SHARD id, not partition id — an incremental
      resume run (which only sees NEW shards) can never clobber a prior
      run's output, and the reference's one-file-per-shard contract holds
      even when multiple shards hash into one Spark partition;
    - rows are sorted by shard within each partition and the writer
      rolls to a new file at each shard boundary;
    - temp names carry the task ATTEMPT id, so a speculative or zombie
      duplicate attempt can never interleave writes into the same temp
      file (last rename wins with whole-file contents either way);
    - a failing task closes and removes its own in-flight temp file, and
      job start sweeps any ``._tmp_*`` orphans a killed attempt (no chance
      to run finally) left behind.

    ``open_writer(fs, path) -> handle``; ``add_row(handle, row)``;
    handle must have ``close()``.
    """
    frame = frame.repartition("shard_id").sortWithinPartitions("shard_id", "key")
    fs0, _ = fsio.url_to_fs(out)
    fs0.makedirs(out, exist_ok=True)
    _sweep_orphan_tmps(fs0, out, ext)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        fs, _ = fsio.url_to_fs(out)
        attempt = TaskContext.get().taskAttemptId()
        shard, handle, tmp = None, None, None

        def roll() -> None:
            nonlocal handle
            if handle is None:
                return
            handle.close()
            fs.mv(tmp, fsio.join(out, f"{int(shard):05d}.{ext}"))
            handle = None

        try:
            for row in rows:
                if row["shard_id"] != shard:
                    roll()
                    shard = row["shard_id"]
                    tmp = fsio.join(
                        out, f"._tmp_{int(shard):05d}_{attempt}.{ext}"
                    )
                    handle = open_writer(fs, tmp)
                add_row(handle, row)
            roll()
        except BaseException:
            # close + remove the in-flight temp so a failed/retried task
            # leaves no litter (the retry writes its own attempt-id name)
            if handle is not None:
                try:
                    handle.close()
                except Exception:
                    pass
                try:
                    fs.rm(tmp)
                except FileNotFoundError:
                    pass
            raise

    frame.foreachPartition(write_partition)


class _TarWriter:
    def __init__(self, fs, path):
        self.raw = fs.open(path, "wb")
        self.tar = tarfile.open(fileobj=self.raw, mode="w")

    def close(self):
        self.tar.close()
        self.raw.close()


def write_webdataset(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """W3: one tar PER SHARD with <key>.text + <key>.json members (stdlib
    tarfile — no webdataset dependency needed to *write* the format) + a
    parquet meta sidecar."""
    frame = _samples_frame(df, cfg)
    extra = [
        c for c in frame.columns
        if c not in (*META_COLUMNS, cfg.encode_format, "shard_id")
    ]
    enc = cfg.encode_format

    def add_row(w: _TarWriter, row) -> None:
        key = row["key"]
        payload = bytes(row[enc]) if row[enc] is not None else b""
        ti = tarfile.TarInfo(name=f"{key}.text")
        ti.size = len(payload)
        w.tar.addfile(ti, io.BytesIO(payload))
        mbytes = json.dumps(_meta_of(row, extra), default=str).encode()
        tj = tarfile.TarInfo(name=f"{key}.json")
        tj.size = len(mbytes)
        w.tar.addfile(tj, io.BytesIO(mbytes))

    _write_sharded(frame, out, "tar", _TarWriter, add_row)
    # parquet meta sidecar (reference writes one per tar, `writer.py:88-126`)
    _write_meta_sidecar(frame.drop(enc), out)


def write_tfrecord(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """W5: one TFRecord file PER SHARD with tf.train.Example payloads
    (stdlib framing + hand-rolled proto — TensorFlow is not required)."""
    frame = _samples_frame(df, cfg)
    extra = [
        c for c in frame.columns
        if c not in (*META_COLUMNS, cfg.encode_format, "shard_id")
    ]
    enc = cfg.encode_format

    class _RecWriter:
        def __init__(self, fs, path):
            self.fh = fs.open(path, "wb")

        def close(self):
            self.fh.close()

    def add_row(w, row) -> None:
        payload = bytes(row[enc]) if row[enc] is not None else b""
        example = _tf_example(payload, _meta_of(row, extra))
        w.fh.write(tfrecord_frame(example))

    _write_sharded(frame, out, "tfrecord", _RecWriter, add_row)
    _write_meta_sidecar(frame.drop(enc), out)


def write_dummy(df: DataFrame, cfg: DownloadConfig, out: str) -> None:
    """W7: no-op sink (benchmark fetch/extract alone) — still runs the plan."""
    df.write.format("noop").mode("overwrite").save()


SINKS = {
    "parquet": write_parquet,
    "orc": write_orc,
    "jsonl": write_jsonl,
    "files": write_files,
    "webdataset": write_webdataset,
    "tfrecord": write_tfrecord,
    "dummy": write_dummy,
}

# sinks whose payload is written by executor-side Python (foreachPartition):
# these need a filesystem every executor can reach
_EXECUTOR_SIDE_SINKS = ("files", "webdataset", "tfrecord")


# sinks whose payload goes through Spark's own DataFrame writers: these
# need a Hadoop-resolvable scheme (fsio.SPARK_NATIVE_SCHEMES)
_SPARK_WRITER_SINKS = ("parquet", "orc", "jsonl")


def check_sink_target(cfg: DownloadConfig) -> None:
    """Refuse invalid (format, scheme) combinations BEFORE the pipeline
    does anything destructive — download() calls this ahead of its
    overwrite-mode rm, so a doomed run never deletes prior output."""
    scheme = fsio.scheme_of(cfg.output_folder)
    if cfg.output_format in _EXECUTOR_SIDE_SINKS and scheme == "memory":
        # MemoryFS is per-process: executor writes would land in stores the
        # driver can never see, silently "succeeding" while losing all
        # output. Driver-side state (manifest/resume) supports memory://;
        # executor-side payloads must use a shared filesystem.
        raise ValueError(
            f"output_format={cfg.output_format!r} writes from executors, "
            f"which cannot target memory:// (per-process store — the data "
            f"would be lost); use file:// or an object-store URL"
        )
    if cfg.output_format in _SPARK_WRITER_SINKS and not fsio.is_spark_native(
        cfg.output_folder
    ):
        # Spark's DataFrame writers resolve the path through Hadoop, which
        # has no handler for memory:// or fsspec-only schemes — the write
        # would crash AFTER the overwrite rm destroyed prior output
        raise ValueError(
            f"output_format={cfg.output_format!r} writes through Spark's "
            f"Hadoop layer, which cannot resolve scheme {scheme!r}; use a "
            f"plain path, file://, or a Hadoop scheme "
            f"({', '.join(s for s in fsio.SPARK_NATIVE_SCHEMES if s)})"
        )


def write_output(df: DataFrame, cfg: DownloadConfig) -> None:
    check_sink_target(cfg)
    SINKS[cfg.output_format](df, cfg, cfg.output_folder)
