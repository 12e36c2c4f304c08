"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata structs, processed by Arrow-batched pandas UDFs.

The container has no image/audio libraries, so real-codec decode (JPEG/PNG/
WAV/MP4) is import-gated on PIL and raises a clear NotImplementedError
otherwise — but the *engine* parts (schema, mapInPandas batch shape,
explode of frame samples, numpy kernels) are real and tested on a
deterministic raw-raster container:

    FAKEIMG1 | width u32be | height u32be | channels u8 | pixels (w*h*c)
    FAKEVID1 | n_frames u32be | frames: FAKEIMG1 blobs, length-prefixed

At deployment, swap ``decode_raster`` for the PIL/ffmpeg path; nothing
above the decode boundary changes — exactly how the PDF decoder is split
in operators/extract.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

IMG_MAGIC = b"FAKEIMG1"
VID_MAGIC = b"FAKEVID1"

try:  # pragma: no cover — not in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    Image = None
    _HAS_PIL = False


# ---------------------------------------------------------------------------
# container codec (deterministic test format)
# ---------------------------------------------------------------------------
def encode_image(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return IMG_MAGIC + struct.pack(">IIB", w, h, c) + arr.astype(np.uint8).tobytes()


def decode_raster(data: bytes) -> np.ndarray:
    """bytes → HxWxC uint8 array. Real codecs via PIL when available."""
    if data.startswith(IMG_MAGIC):
        w, h, c = struct.unpack(">IIB", data[8:17])
        return np.frombuffer(data[17 : 17 + w * h * c], dtype=np.uint8).reshape(
            h, w, c
        )
    if _HAS_PIL:  # pragma: no cover
        import io

        return np.asarray(Image.open(io.BytesIO(data)))
    raise NotImplementedError(
        "real image codecs need PIL (not installed); engine tested via the "
        "FAKEIMG raw-raster container"
    )


def encode_video(frames: list[np.ndarray]) -> bytes:
    out = VID_MAGIC + struct.pack(">I", len(frames))
    for f in frames:
        blob = encode_image(f)
        out += struct.pack(">I", len(blob)) + blob
    return out


def decode_video_frames(data: bytes) -> list[bytes]:
    if not data.startswith(VID_MAGIC):
        raise NotImplementedError("real video codecs not available; use FAKEVID")
    (n,) = struct.unpack(">I", data[8:12])
    frames, pos = [], 12
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        frames.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames


# ---------------------------------------------------------------------------
# operators (mapInPandas — Arrow batches of binary columns)
# ---------------------------------------------------------------------------
IMAGE_META_SCHEMA = (
    "width int, height int, channels int, n_bytes long, mean_pixel double"
)


def image_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """decode + feature-extract: typed metadata struct per image
    (the 'decode' stage of a multimodal training pipeline)."""
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    )
    schema = f"{in_fields}, {IMAGE_META_SCHEMA}"
    passthrough = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                try:
                    arr = decode_raster(bytes(rec[media_col]))
                    rows.append(
                        {
                            **base,
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "channels": arr.shape[2],
                            "n_bytes": len(rec[media_col]),
                            "mean_pixel": float(round(arr.mean(), 4)),
                        }
                    )
                except Exception:  # noqa: BLE001
                    raw = rec[media_col]
                    rows.append(
                        {**base, "width": None, "height": None,
                         "channels": None,
                         # the media value may itself be None — the
                         # fallback row must not raise its own TypeError
                         "n_bytes": len(raw) if raw is not None else 0,
                         "mean_pixel": None}
                    )
            yield pd.DataFrame(
                rows,
                columns=[*passthrough, "width", "height", "channels",
                         "n_bytes", "mean_pixel"],
            )

    return df.mapInPandas(run, schema=schema)


def image_resize(
    df: DataFrame, out_w: int, out_h: int, media_col: str = "media"
) -> DataFrame:
    """nearest-neighbor resize (numpy kernel — runs vectorized per image;
    PIL's Lanczos path slots in behind the same UDF at deployment)."""
    # schema unchanged: the media column is replaced in place
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = []
            for data in pdf[media_col]:
                # per-record error capture (T14 discipline, same as
                # image_metadata): one corrupt/null blob degrades to a
                # null row instead of failing the task 4x and the job
                try:
                    arr = decode_raster(bytes(data))
                    h, w, _ = arr.shape
                    yi = (np.arange(out_h) * h // out_h).astype(int)
                    xi = (np.arange(out_w) * w // out_w).astype(int)
                    resized.append(encode_image(arr[np.ix_(yi, xi)]))
                except Exception:  # noqa: BLE001
                    resized.append(None)
            out[media_col] = resized
            yield out

    return df.mapInPandas(run, schema=schema)


def video_frame_sample(
    df: DataFrame, every_k: int, media_col: str = "media"
) -> DataFrame:
    """frame sampling: one output row per kept frame (the T2 fan-out shape
    applied to video)."""
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    )
    schema = f"{in_fields}, frame_no int, frame binary"
    passthrough = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                try:
                    frames = decode_video_frames(bytes(rec[media_col]))
                except Exception:  # noqa: BLE001
                    # corrupt/null blob: a single null-frame row (T14
                    # discipline) instead of killing the task
                    rows.append({**base, "frame_no": None, "frame": None})
                    continue
                for i in range(0, len(frames), every_k):
                    rows.append({**base, "frame_no": i, "frame": frames[i]})
            yield pd.DataFrame(rows, columns=[*passthrough, "frame_no", "frame"])

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# audio: FAKEAUD1 | sample_rate u32be | channels u8 | n_samples u32be |
#        samples int16le (interleaved) — swap decode_waveform for
#        soundfile/ffmpeg at deployment, nothing above the boundary changes
# ---------------------------------------------------------------------------
AUD_MAGIC = b"FAKEAUD1"
AUDIO_META_SCHEMA = (
    "sample_rate int, channels int, n_samples int, duration_s double, "
    "rms double, peak int"
)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: (n, channels) int16 array → FAKEAUD1 bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, c = samples.shape
    return (
        AUD_MAGIC
        + struct.pack(">IBI", sample_rate, c, n)
        + samples.astype("<i2").tobytes()
    )


def decode_waveform(data: bytes) -> tuple[np.ndarray, int]:
    """bytes → ((n, channels) int16 array, sample_rate)."""
    if data.startswith(AUD_MAGIC):
        rate, c, n = struct.unpack(">IBI", data[8:17])
        arr = np.frombuffer(data[17 : 17 + n * c * 2], dtype="<i2")
        return arr.reshape(n, c), rate
    raise NotImplementedError(
        "real audio codecs need soundfile/ffmpeg (not installed); engine "
        "tested via the FAKEAUD1 container"
    )


def audio_features(df: DataFrame, media_col: str = "media") -> DataFrame:
    """decode + feature-extract: duration / RMS energy / peak per clip.
    Integer sample math (sum of squares over int64) keeps the features
    deterministic across partitionings."""
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    )
    schema = f"{in_fields}, {AUDIO_META_SCHEMA}"
    passthrough = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                try:
                    arr, rate = decode_waveform(bytes(rec[media_col]))
                    n = arr.shape[0]
                    sq = int((arr.astype(np.int64) ** 2).sum())
                    rows.append(
                        {
                            **base,
                            "sample_rate": rate,
                            "channels": arr.shape[1],
                            "n_samples": n,
                            "duration_s": round(n / rate, 4),
                            "rms": round((sq / max(arr.size, 1)) ** 0.5, 4),
                            "peak": int(np.abs(arr).max()) if n else 0,
                        }
                    )
                except Exception:  # noqa: BLE001
                    rows.append(
                        {**base, "sample_rate": None, "channels": None,
                         "n_samples": None, "duration_s": None, "rms": None,
                         "peak": None}
                    )
            yield pd.DataFrame(
                rows,
                columns=[*passthrough, "sample_rate", "channels",
                         "n_samples", "duration_s", "rms", "peak"],
            )

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# perceptual hashing: dHash (difference hash) for image near-dup detection
# ---------------------------------------------------------------------------
def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash of an HxWxC uint8 raster: grayscale (integer
    channel mean), nearest-neighbor resample to 9x8, one bit per
    horizontally-adjacent pixel comparison. Deterministic integer math —
    no float resampling — so the hash is identical on every platform.
    Invariant to uniform brightness/contrast shifts (only pixel ORDER
    within each row matters), which is exactly the near-dup class
    re-encoded web images fall into. Returned as SIGNED int64 (Spark
    bigint twos-complement) so the column round-trips exactly."""
    h, w = arr.shape[0], arr.shape[1]
    gray = arr.astype(np.int64).sum(axis=2) // arr.shape[2]
    yi = (np.arange(8) * h // 8).astype(int)
    xi = (np.arange(9) * w // 9).astype(int)
    grid = gray[np.ix_(yi, xi)]
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def image_phash(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Add a ``phash`` bigint column (dHash64) per image — the decode
    boundary of image dedup. Downstream blocking/verification is plain
    JVM-side SQL on the hash column (see multimodal_dedup_phash): band
    the 64 bits, equi-join on bands, verify hamming via bit_count(xor) —
    the SimHash banding pattern applied to pixels."""
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    )
    schema = f"{in_fields}, phash bigint"
    passthrough = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                try:
                    rows.append(
                        {**base,
                         "phash": dhash64(decode_raster(bytes(rec[media_col])))}
                    )
                except Exception:  # noqa: BLE001
                    rows.append({**base, "phash": None})
            yield pd.DataFrame(rows, columns=[*passthrough, "phash"])

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# audio fingerprinting: energy-delta hash for near-dup clip detection
# ---------------------------------------------------------------------------
def audio_fingerprint64(arr: np.ndarray) -> int:
    """64-bit energy-delta fingerprint of an (n, channels) int16 waveform:
    mix to mono (integer channel sum), split into 65 equal windows,
    integer energy (sum of squares) per window, bit k = energy[k+1] >
    energy[k]. The sign-of-energy-delta descriptor is the integer core of
    the classic audio-fingerprint family (Haitsma-Kalker 2002) minus the
    spectral transform; invariant to uniform amplitude scaling (energy
    ORDER is preserved) — the re-encoded/normalized-volume near-dup
    class. Signed int64 for exact Spark bigint round-tripping."""
    mono = arr.astype(np.int64).sum(axis=1)
    n = mono.shape[0]
    if n < 65:
        mono = np.pad(mono, (0, 65 - n))
        n = 65
    bounds = (np.arange(66) * n // 65).astype(int)
    energy = np.array(
        [int((mono[bounds[i]:bounds[i + 1]] ** 2).sum()) for i in range(65)],
        dtype=object,
    )
    val = np.uint64(0)
    for k in range(64):
        val = (val << np.uint64(1)) | np.uint64(energy[k + 1] > energy[k])
    return int(val.astype(np.int64))


def audio_phash(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Add a ``phash`` bigint column (energy-delta fingerprint) per clip —
    the decode boundary of audio dedup; banding/verification downstream
    is the same JVM-side SQL as image_phash."""
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    )
    schema = f"{in_fields}, phash bigint"
    passthrough = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                try:
                    wave, _ = decode_waveform(bytes(rec[media_col]))
                    rows.append({**base, "phash": audio_fingerprint64(wave)})
                except Exception:  # noqa: BLE001
                    rows.append({**base, "phash": None})
            yield pd.DataFrame(rows, columns=[*passthrough, "phash"])

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# video: scene-change detection via inter-frame pixel delta
# ---------------------------------------------------------------------------
def video_scene_cuts(
    df: DataFrame, threshold: float = 40.0, media_col: str = "media"
) -> DataFrame:
    """Detect scene cuts: one row per frame with the mean absolute pixel
    delta vs the previous frame and a ``is_cut`` flag (delta > threshold;
    frame 0 is never a cut). Integer sum / exact division keeps deltas
    deterministic. The shot-boundary primitive a video-training pipeline
    runs before per-scene sampling — frames inside a scene are
    near-duplicates, so sampling per CUT SEGMENT (not per k frames)
    dedups temporally.

    Scale shape: one Arrow batch per video row, state = one previous
    frame inside the row's own decode loop — nothing crosses rows, so
    parallelism is per-video."""
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != media_col
    )
    schema = f"{in_fields}, frame_no int, delta double, is_cut boolean"
    passthrough = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                try:
                    frames = [
                        decode_raster(fb)
                        for fb in decode_video_frames(bytes(rec[media_col]))
                    ]
                except Exception:  # noqa: BLE001
                    rows.append(
                        {**base, "frame_no": None, "delta": None,
                         "is_cut": None}
                    )
                    continue
                prev = None
                for i, fr in enumerate(frames):
                    if prev is None or prev.shape != fr.shape:
                        delta = 0.0
                    else:
                        diff = np.abs(
                            fr.astype(np.int64) - prev.astype(np.int64)
                        )
                        delta = round(float(int(diff.sum()) / diff.size), 4)
                    rows.append(
                        {**base, "frame_no": i, "delta": delta,
                         "is_cut": bool(i > 0 and delta > threshold)}
                    )
                    prev = fr
            yield pd.DataFrame(
                rows,
                columns=[*passthrough, "frame_no", "delta", "is_cut"],
            )

    return df.mapInPandas(run, schema=schema)
