"""Property-based invariance/sensitivity laws for the perceptual
fingerprints (hypothesis) — the claims the dedup ops rest on, checked
over generated rasters/waveforms rather than one fixture each."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doc2dataset_spark.operators.multimodal import (
    audio_fingerprint64,
    dhash64,
    decode_raster,
    decode_waveform,
    encode_audio,
    encode_image,
)


@st.composite
def rasters(draw):
    w = draw(st.integers(9, 24))
    h = draw(st.integers(8, 20))
    c = draw(st.sampled_from([1, 3]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    return rng.randint(0, 200, size=(h, w, c), dtype=np.uint8)


@st.composite
def waveforms(draw):
    n = draw(st.integers(65, 3000))
    ch = draw(st.sampled_from([1, 2]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    return rng.randint(-8000, 8000, size=(n, ch), dtype=np.int64)


@settings(max_examples=40, deadline=None)
@given(rasters(), st.integers(1, 55))
def test_dhash_brightness_invariance(arr, shift):
    # uniform brightness shift preserves adjacent-pixel ORDER (values
    # stay below 255 by construction) -> identical hash
    shifted = (arr.astype(np.int64) + shift).clip(0, 255).astype(np.uint8)
    assert dhash64(shifted) == dhash64(arr)


@settings(max_examples=40, deadline=None)
@given(rasters())
def test_dhash_container_roundtrip_stable(arr):
    assert dhash64(decode_raster(encode_image(arr))) == dhash64(arr)
    assert -(1 << 63) <= dhash64(arr) < (1 << 63)


@settings(max_examples=40, deadline=None)
@given(waveforms(), st.integers(1, 4))
def test_audio_fingerprint_amplitude_invariance(wave, div):
    # integer division compresses amplitude; energy ORDER across windows
    # is preserved for div>=1 up to ties — use exact doubling instead,
    # which is strictly order-preserving
    assert audio_fingerprint64(wave * div) == audio_fingerprint64(wave)


@settings(max_examples=40, deadline=None)
@given(waveforms())
def test_audio_fingerprint_container_roundtrip_stable(wave):
    dec, rate = decode_waveform(encode_audio(wave.astype(np.int16), 8000))
    assert rate == 8000
    assert audio_fingerprint64(dec) == audio_fingerprint64(
        wave.astype(np.int16).astype(np.int64)
    )
