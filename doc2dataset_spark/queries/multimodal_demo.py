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
