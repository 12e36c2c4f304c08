"""Multimodal plumbing tests on the deterministic raster/video containers."""

from __future__ import annotations

import numpy as np
import pytest

from doc2dataset_spark.operators.multimodal import (
    decode_raster,
    encode_image,
    encode_video,
    image_metadata,
    image_resize,
    video_frame_sample,
)


def _img(w, h, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(h, w, c), dtype=np.uint8)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, encode_image(_img(8, 4, 3, seed=1))),
        (2, encode_image(_img(16, 16, 1, seed=2))),
        (3, b"not an image"),
    ]
    return spark.createDataFrame(rows, "id long, media binary")


def test_image_metadata(spark, media_df):
    out = {r["id"]: r.asDict() for r in image_metadata(media_df).collect()}
    assert out[1]["width"] == 8 and out[1]["height"] == 4
    assert out[1]["channels"] == 3
    expected_mean = float(round(_img(8, 4, 3, seed=1).mean(), 4))
    assert out[1]["mean_pixel"] == expected_mean
    assert out[2]["channels"] == 1
    # undecodable media degrades to nulls, not a task failure
    assert out[3]["width"] is None and out[3]["n_bytes"] == 12


def test_image_resize_roundtrip(spark, media_df):
    ok = media_df.filter("id < 3")
    out = image_resize(ok, 4, 4).collect()
    for row in out:
        arr = decode_raster(bytes(row["media"]))
        assert arr.shape[:2] == (4, 4)
    # nearest-neighbor on identity size is exact
    same = image_resize(media_df.filter("id = 2"), 16, 16).collect()[0]
    assert np.array_equal(
        decode_raster(bytes(same["media"])), _img(16, 16, 1, seed=2)
    )


def test_video_frame_sample(spark):
    frames = [_img(4, 4, 3, seed=i) for i in range(10)]
    df = spark.createDataFrame(
        [(7, encode_video(frames))], "vid long, media binary"
    )
    out = video_frame_sample(df, every_k=3).collect()
    assert [r["frame_no"] for r in sorted(out, key=lambda r: r["frame_no"])] == [
        0, 3, 6, 9,
    ]
    f0 = decode_raster(bytes(sorted(out, key=lambda r: r["frame_no"])[0]["frame"]))
    assert np.array_equal(f0, frames[0])


def test_audio_features_roundtrip(spark):
    import numpy as np

    from doc2dataset_spark.operators.multimodal import (
        audio_features,
        decode_waveform,
        encode_audio,
    )

    rng = np.random.RandomState(7)
    samples = rng.randint(-2000, 2000, size=(16000, 2), dtype=np.int64).astype(
        np.int16
    )
    blob = encode_audio(samples, 16000)
    arr, rate = decode_waveform(blob)
    assert rate == 16000 and arr.shape == (16000, 2)
    assert (arr == samples).all()

    df = spark.createDataFrame([(1, blob)], "clip_id long, media binary")
    row = audio_features(df).collect()[0]
    assert row["duration_s"] == 1.0
    assert row["channels"] == 2
    assert row["peak"] == int(np.abs(samples).max())
    want_rms = round(float((samples.astype(np.int64) ** 2).sum() / samples.size) ** 0.5, 4)
    assert row["rms"] == want_rms


def test_audio_features_bad_blob_yields_nulls(spark):
    df = spark.createDataFrame(
        [(1, b"not audio")], "clip_id long, media binary"
    )
    row = audio_features_import()(df).collect()[0]
    assert row["sample_rate"] is None and row["rms"] is None


def audio_features_import():
    from doc2dataset_spark.operators.multimodal import audio_features

    return audio_features


def test_null_and_corrupt_media_degrade_not_crash(spark):
    """Every multimodal operator must emit a null row for a corrupt or
    NULL media value (T14 discipline) instead of failing the task."""
    from doc2dataset_spark.operators.multimodal import (
        image_metadata,
        image_resize,
        video_frame_sample,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, None)],
        "id long, media binary",
    )
    meta = image_metadata(df).collect()
    assert len(meta) == 2
    assert all(r["width"] is None for r in meta)
    assert {r["n_bytes"] for r in meta} == {len(b"not an image"), 0}

    resized = image_resize(df, 4, 4).collect()
    assert len(resized) == 2
    assert all(r["media"] is None for r in resized)

    frames = video_frame_sample(df, 2).collect()
    assert len(frames) == 2
    assert all(r["frame"] is None for r in frames)


def test_image_phash_dedup_recovers_planted_twins(spark):
    """dHash banding (round 6): every planted twin pair is recovered,
    no cross-base false positives, and the brightness-shifted twin is
    hash-IDENTICAL (dHash's invariance class)."""
    from doc2dataset_spark.queries import REGISTRY

    rows = (
        REGISTRY["multimodal_dedup_phash"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    # 12 bases x 3 images -> 3 within-base pairs each, nothing across
    assert len(rows) == 36
    assert all(r.ia // 3 == r.ib // 3 for r in rows)
    # (base, bright) pairs: ids (3b, 3b+1) -> hamming exactly 0
    bright = {(b * 3, b * 3 + 1) for b in range(12)}
    assert all(
        r.hamming == 0 for r in rows if (r.ia, r.ib) in bright
    )
    assert all(r.hamming <= 6 for r in rows)


def test_image_phash_null_and_corrupt_degrade(spark):
    from doc2dataset_spark.operators.multimodal import image_phash

    df = spark.createDataFrame(
        [(0, None), (1, b"junkbytes")], "img_id long, media binary"
    )
    got = {r.img_id: r.phash for r in image_phash(df).collect()}
    assert got == {0: None, 1: None}


def test_dhash64_known_properties():
    import numpy as np

    from doc2dataset_spark.operators.multimodal import dhash64

    rng = np.random.RandomState(1)
    a = rng.randint(0, 200, size=(16, 18, 3), dtype=np.uint8)
    h = dhash64(a)
    # deterministic, signed-int64 range, brightness invariant
    assert h == dhash64(a.copy())
    assert -(1 << 63) <= h < (1 << 63)
    shifted = np.clip(a.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    assert dhash64(shifted) == h
    # a structurally different image hashes differently
    b = rng.randint(0, 200, size=(16, 18, 3), dtype=np.uint8)
    assert dhash64(b) != h


def test_audio_fingerprint_dedup_recovers_planted_twins(spark):
    """Energy-delta fingerprint (round 6): all planted twin pairs
    recovered, no cross-base pairs, amplitude-scaled twin is
    fingerprint-identical (the descriptor's invariance class)."""
    from doc2dataset_spark.queries import REGISTRY

    rows = (
        REGISTRY["multimodal_dedup_audio"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 30
    assert all(r.ca // 3 == r.cb // 3 for r in rows)
    halved = {(b * 3, b * 3 + 1) for b in range(10)}
    assert all(r.hamming == 0 for r in rows if (r.ca, r.cb) in halved)


def test_audio_fingerprint64_properties():
    import numpy as np

    from doc2dataset_spark.operators.multimodal import audio_fingerprint64

    rng = np.random.RandomState(2)
    a = rng.randint(-8000, 8000, size=(4000, 2), dtype=np.int64)
    h = audio_fingerprint64(a)
    assert h == audio_fingerprint64(a.copy())
    assert -(1 << 63) <= h < (1 << 63)
    # amplitude scaling preserves energy order -> identical fingerprint
    assert audio_fingerprint64(a // 4) == h
    # a different signal differs; tiny clips don't crash (zero-padded)
    b = rng.randint(-8000, 8000, size=(4000, 2), dtype=np.int64)
    assert audio_fingerprint64(b) != h
    audio_fingerprint64(np.ones((3, 1), dtype=np.int64))


def test_scene_cuts_found_exactly_at_scene_boundaries(spark):
    """Planted 3-scene videos: cuts at frames 4 and 8 only; intra-scene
    deltas are the tiny jitter (<2), inter-scene deltas are large."""
    from doc2dataset_spark.queries import REGISTRY

    rows = (
        REGISTRY["multimodal_scene_cuts"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 6 * 12
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.vid, {})[r.frame_no] = r
    for vid, frames in by_vid.items():
        cuts = {f for f, r in frames.items() if r.is_cut}
        assert cuts == {4, 8}, (vid, cuts)
        assert frames[0].delta == 0.0
        for f, r in frames.items():
            if f not in (0, 4, 8):
                assert r.delta < 2.0, (vid, f, r.delta)
