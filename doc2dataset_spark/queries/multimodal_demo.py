"""Multimodal operators as registered driver-gate queries (rows-only:
binary media has no DuckDB-side table; exact values are pytest-asserted in
tests/test_multimodal.py). Media is generated deterministically in-query."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from doc2dataset_spark.operators.multimodal import (
    encode_image,
    encode_video,
    image_metadata,
    video_frame_sample,
)
from doc2dataset_spark.queries.core import query


def _image(i: int) -> bytes:
    rng = np.random.RandomState(i)
    w, h, c = 4 + (i % 5) * 4, 4 + (i % 3) * 4, (i % 2) * 2 + 1
    return encode_image(rng.randint(0, 255, size=(h, w, c), dtype=np.uint8))


@query("multimodal_image_meta", oracle=None, tags=("multimodal",))
def multimodal_image_meta(spark, sf_dir):
    """decode + feature-extract over a binary image column (mapInPandas)."""
    rows = [(i, _image(i)) for i in range(24)]
    df = spark.createDataFrame(rows, "img_id long, media binary")
    return image_metadata(df).select(
        "img_id", "width", "height", "channels", "n_bytes", "mean_pixel"
    )


@query("multimodal_frame_sample", oracle=None, tags=("multimodal",))
def multimodal_frame_sample(spark, sf_dir):
    """video frame sampling: one row per kept frame + per-frame size."""
    vids = []
    for v in range(6):
        rng = np.random.RandomState(100 + v)
        frames = [
            rng.randint(0, 255, size=(4, 4, 3), dtype=np.uint8)
            for _ in range(4 + v * 2)
        ]
        vids.append((v, encode_video(frames)))
    df = spark.createDataFrame(vids, "vid long, media binary")
    return video_frame_sample(df, every_k=2).select(
        "vid", "frame_no", F.length("frame").alias("frame_bytes")
    )


@query("multimodal_audio_features", oracle=None, tags=("multimodal",))
def multimodal_audio_features(spark, sf_dir):
    """audio decode + feature extraction (duration/RMS/peak) over a binary
    waveform column — integer sample math, deterministic."""
    from doc2dataset_spark.operators.multimodal import audio_features, encode_audio

    clips = []
    for i in range(12):
        rng = np.random.RandomState(200 + i)
        rate = 8000 * (1 + i % 3)
        n = rate // 2 + i * 37
        samples = rng.randint(-3000, 3000, size=(n, 1 + i % 2), dtype=np.int64)
        clips.append((i, encode_audio(samples.astype(np.int16), rate)))
    df = spark.createDataFrame(clips, "clip_id long, media binary")
    return audio_features(df).select(
        "clip_id", "sample_rate", "channels", "n_samples", "duration_s",
        "rms", "peak",
    )


def _phash_corpus() -> list[tuple[int, bytes]]:
    """Deterministic 36-image corpus: 12 base patterns; each base has a
    brightness-shifted twin (dHash-identical — uniform shifts preserve
    adjacent-pixel order) and a patch-edited near-twin (few bits flip)."""
    imgs = []
    for b in range(12):
        rng = np.random.RandomState(300 + b)
        base = rng.randint(0, 200, size=(16, 18, 3), dtype=np.uint8)
        bright = np.clip(base.astype(np.int64) + 30, 0, 255).astype(np.uint8)
        patched = base.copy()
        patched[0:2, 0:2] = 255  # small local edit -> small hamming
        imgs += [
            (b * 3, base),
            (b * 3 + 1, bright),
            (b * 3 + 2, patched),
        ]
    return [(i, encode_image(a)) for i, a in imgs]


@query("multimodal_dedup_phash", oracle=None, tags=("multimodal", "dedup"))
def multimodal_dedup_phash(spark, sf_dir):
    """Image near-dup pairs via perceptual hash: dHash64 per image
    (mapInPandas decode boundary), then PURE JVM-side blocking — 4x16-bit
    bands exploded, equi-join on (band index, band value), hamming <= 6
    verified with bit_count(xor) — the SimHash banding pattern applied to
    pixels. Rows-only (binary media has no DuckDB table); planted
    twin/near-twin recovery is pytest-asserted exactly.

    Scale shape: one Arrow-batched decode pass per image, then the pair
    space is bounded by band collisions (n/2^16 expected bucket size per
    band at corpus scale) — never all-pairs; the verify predicate is a
    single codegen'd xor+popcount."""
    from doc2dataset_spark.operators.multimodal import image_phash

    df = spark.createDataFrame(_phash_corpus(), "img_id long, media binary")
    hashed = image_phash(df).filter(F.col("phash").isNotNull())
    bands = hashed.select(
        "img_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
    ).withColumn(
        # SQL expr: the builtin helper takes only a literal shift amount
        "bandval",
        F.expr("shiftrightunsigned(phash, k * 16) & 65535"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bandval") == F.col("b.bandval"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("ia"),
            F.col("b.img_id").alias("ib"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 6)
    )
    return pairs.orderBy("ia", "ib")


def _audio_corpus() -> list[tuple[int, bytes]]:
    """30 clips: 10 bases, each with an amplitude-halved twin
    (fingerprint-identical — energy order preserved) and a
    tail-silenced near-twin (few energy-delta bits flip)."""
    from doc2dataset_spark.operators.multimodal import encode_audio

    clips = []
    for b in range(10):
        rng = np.random.RandomState(500 + b)
        base = rng.randint(-8000, 8000, size=(4000, 1), dtype=np.int64)
        half = base // 2
        tail = base.copy()
        tail[-300:] = 0
        for j, s in enumerate((base, half, tail)):
            clips.append((b * 3 + j, encode_audio(s.astype(np.int16), 8000)))
    return clips


@query("multimodal_dedup_audio", oracle=None, tags=("multimodal", "dedup"))
def multimodal_dedup_audio(spark, sf_dir):
    """Audio near-dup pairs via energy-delta fingerprint: the image
    phash pipeline's pattern on waveforms — Arrow-batched fingerprint at
    the decode boundary, then JVM-side 4x16-bit banding, equi-join on
    (band, value), hamming <= 6 via bit_count(xor). Rows-only; planted
    amplitude-scaled twin recovery pytest-asserted exactly."""
    from doc2dataset_spark.operators.multimodal import audio_phash

    df = spark.createDataFrame(_audio_corpus(), "clip_id long, media binary")
    hashed = audio_phash(df).filter(F.col("phash").isNotNull())
    bands = hashed.select(
        "clip_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
    ).withColumn(
        "bandval", F.expr("shiftrightunsigned(phash, k * 16) & 65535")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.bandval") == F.col("b.bandval"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .select(
            F.col("a.clip_id").alias("ca"),
            F.col("b.clip_id").alias("cb"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 6)
        .orderBy("ca", "cb")
    )


def _scene_corpus() -> list[tuple[int, bytes]]:
    """6 videos of 12 frames: scenes of 4 near-identical frames (tiny
    noise) with hard cuts between scenes — cut positions are exactly
    frames 4 and 8."""
    vids = []
    for v in range(6):
        frames = []
        for scene in range(3):
            rng = np.random.RandomState(700 + v * 10 + scene)
            base = rng.randint(0, 255, size=(8, 8, 3), dtype=np.uint8)
            for j in range(4):
                jitter = np.clip(
                    base.astype(np.int64) + (j % 2), 0, 255
                ).astype(np.uint8)
                frames.append(jitter)
        vids.append((v, encode_video(frames)))
    return vids


@query("multimodal_scene_cuts", oracle=None, tags=("multimodal", "video"))
def multimodal_scene_cuts(spark, sf_dir):
    """Shot-boundary detection over binary video columns: per-frame mean
    absolute pixel delta vs the previous frame, cut flag above threshold.
    Planted scene structure (3 scenes x 4 near-identical frames per
    video) makes the expected cut set exact — pytest-asserted. Rows-only
    (binary media has no DuckDB table)."""
    from doc2dataset_spark.operators.multimodal import video_scene_cuts

    df = spark.createDataFrame(_scene_corpus(), "vid long, media binary")
    return video_scene_cuts(df).select("vid", "frame_no", "delta", "is_cut")
