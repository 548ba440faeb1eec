"""Multimodal column operators: opaque binary payloads + typed metadata.

The reference has no multimodal surface; this is part of the LLM-pipeline
extension scope (SURVEY §7.6).  Design contract for 100 TB:

* An *asset* is a row ``(doc_id, modality, payload: binary, meta: struct)``.
  The payload is opaque to Catalyst — filters/joins run on the typed
  metadata columns (pruned + pushed down at the scan), and only the rows
  that survive reach the Python decode stage.
* Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: narrow (no shuffle), pipelined after the scan,
  batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so executor memory stays flat regardless of total data size.
* Two decode paths exist.  ``decode_payload`` is a clearly-marked
  deterministic fake (np.frombuffer of the md5-derived payload) kept for
  ``mm_resize_images``, whose oracle pins the fake's byte order on
  purpose.  ``decode_payload_real`` is REAL and carries every other
  decode query: RIFF/WAVE parses through the stdlib ``wave`` codec,
  8-bit BMP and the VID0 concatenated-frames video container through the
  built-in parsers below (PIL/soundfile remain the optional paths for
  other formats).  All mm_* feature queries drive real container bytes
  through it end-to-end and hash-match a first-principles DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature vector layout produced by :func:`real_asset_features`.
N_HIST_BINS = 8
FEATURE_DIM = 5 + N_HIST_BINS  # mean, std, min, max, median + histogram

RESIZE_W = 16
RESIZE_H = 16
FRAME_STRIDE = 2  # keep every 2nd frame

RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, checksum long"
)


# --------------------------------------------------------------------------
# Asset construction (SQL-expressible on purpose, so it is oracle-checkable)
# --------------------------------------------------------------------------
def asset_meta_cols(doc_id: Column) -> dict[str, Column]:
    """Deterministic typed metadata derived from doc_id.

    modality cycles image/audio/video; dimensions are chosen so payload
    sizes are small but varied.  Mirrored 1:1 in SQL by the oracle of the
    ``mm_assets`` query.
    """
    modality = (
        F.when(doc_id % 3 == 0, "image")
        .when(doc_id % 3 == 1, "audio")
        .otherwise("video")
    )
    width = F.when(modality == "image", 32 + doc_id % 32).when(
        modality == "video", F.lit(16)
    )
    height = F.when(modality == "image", 32 + doc_id % 16).when(
        modality == "video", F.lit(16)
    )
    sample_rate = F.when(modality == "audio", F.lit(8000))
    n_frames = F.when(modality == "video", (8 + doc_id % 9).cast("int"))
    n_samples = F.when(modality == "audio", (1000 + (doc_id % 9) * 500).cast("int"))
    n_bytes = (
        F.when(modality == "image", width * height)
        .when(modality == "audio", n_samples)
        .otherwise(width * height * n_frames)
    ).cast("int")
    return {
        "modality": modality,
        "width": width.cast("int"),
        "height": height.cast("int"),
        "sample_rate": sample_rate.cast("int"),
        "n_frames": n_frames,
        "n_bytes": n_bytes,
    }


def fake_payload(text: Column, n_bytes: Column) -> Column:
    """Opaque deterministic binary payload: md5(text) hex repeated to
    length and unhexed.  Stands in for real image/audio bytes; identical
    construction exists in DuckDB (from_hex/repeat/md5) for the oracle."""
    hex_len = n_bytes * 2
    reps = F.ceil(hex_len / 32).cast("int")
    return F.unhex(F.substring(F.repeat(F.md5(text), reps), 1, hex_len))


def build_assets(documents: DataFrame) -> DataFrame:
    """documents → asset table (doc_id, modality, payload, meta struct).

    Pure JVM-side construction (no UDF): at scale this is a map over the
    scan.  The meta struct carries the typed fields a planner can prune
    and filter on without touching the payload."""
    meta = asset_meta_cols(F.col("doc_id"))
    return documents.select(
        "doc_id",
        meta["modality"].alias("modality"),
        fake_payload(F.col("text"), meta["n_bytes"]).alias("payload"),
        F.struct(
            meta["width"].alias("width"),
            meta["height"].alias("height"),
            meta["sample_rate"].alias("sample_rate"),
            meta["n_frames"].alias("n_frames"),
            meta["n_bytes"].alias("n_bytes"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Decode seam
# --------------------------------------------------------------------------
def decode_payload(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode: reinterpret the opaque bytes as a uint8
    sample/pixel buffer.  The real-codec seam is decode_payload_real()."""
    return np.frombuffer(payload, dtype=np.uint8)


def decode_payload_real(payload: bytes, modality: str) -> np.ndarray:
    """Real decode seam: container-format bytes in, sample/pixel array out.

    Audio: RIFF/WAVE via the stdlib ``wave`` module (a real codec, always
    present) — ``soundfile`` handles any other container when installed.
    Image: ``BM`` magic via the built-in BMP parser (:func:`decode_bmp_gray8`)
    — PIL handles everything else when installed.  Only a payload in a
    format none of those cover raises ``NotImplementedError``."""
    if modality == "audio":
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav_int16(payload)
        try:
            import io

            import soundfile  # type: ignore

            data, _rate = soundfile.read(io.BytesIO(payload))
            return np.asarray(data)
        except ImportError as exc:
            raise NotImplementedError(
                "non-WAV audio decode needs the optional soundfile library"
            ) from exc
    if modality == "image":
        try:
            import io

            from PIL import Image  # type: ignore

            return np.asarray(Image.open(io.BytesIO(payload)))
        except ImportError:
            if payload[:2] == b"BM":
                return decode_bmp_gray8(payload)
            raise NotImplementedError(
                "non-BMP image decode needs the optional PIL library"
            ) from None
    if modality == "video":
        if payload[:4] == VIDEO_MAGIC:
            return decode_video_frames(payload)
        raise NotImplementedError(
            "video decode supports the VID0 concatenated-frames container; "
            "real codecs (mp4/webm) need optional av/ffmpeg libraries"
        )
    raise NotImplementedError(f"no real decoder for modality {modality!r}")


# --------------------------------------------------------------------------
# Real container codecs (no optional dependencies)
# --------------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """16-bit mono PCM RIFF/WAVE container via the stdlib ``wave`` codec."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav_int16(payload: bytes) -> np.ndarray:
    """Parse a 16-bit mono RIFF/WAVE container back to its sample array —
    stdlib ``wave`` does the real container parsing (chunk walk, fmt
    validation, frame extraction)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("decode_wav_int16 expects 16-bit mono PCM")
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2")


_BMP_HEADER = 14  # BITMAPFILEHEADER
_BMP_INFO = 40  # BITMAPINFOHEADER
_BMP_PALETTE = 256 * 4  # 8-bit grayscale palette (BGRA quads)


def encode_bmp_gray8(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as a real 8-bit-palette BMP file:
    BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry grayscale palette +
    BOTTOM-UP rows each padded to a 4-byte boundary (the real format's
    quirks, exercised on purpose)."""
    import struct

    h, w = img.shape
    stride = (w + 3) & ~3
    data_off = _BMP_HEADER + _BMP_INFO + _BMP_PALETTE
    file_size = data_off + stride * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", _BMP_INFO, w, h, 1, 8, 0, stride * h, 2835, 2835, 256, 0
    )
    for i in range(256):  # grayscale palette: B, G, R, reserved
        out += bytes((i, i, i, 0))
    pad = b"\x00" * (stride - w)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        out += img[y].astype(np.uint8).tobytes() + pad
    return bytes(out)


VIDEO_MAGIC = b"VID0"
_VIDEO_HEADER = 16  # magic + 3x uint32 (n_frames, height, width)


def encode_video_frames(frames: np.ndarray) -> bytes:
    """Encode an (n_frames, h, w) uint8 stack as a VID0 container: a
    16-byte header (magic, n, h, w as little-endian uint32) followed by
    the raw frames concatenated in order.  A deliberately trivial but
    REAL container format — the decoder must validate the magic, read the
    dimensions from the header (not from side-channel metadata) and check
    the payload length, exactly like a production demuxer would."""
    import struct

    n, h, w = frames.shape
    return struct.pack("<4sIII", VIDEO_MAGIC, n, h, w) + frames.astype(
        np.uint8
    ).tobytes()


def decode_video_frames(payload: bytes) -> np.ndarray:
    """Parse a VID0 container back to its (n_frames, h, w) uint8 stack."""
    import struct

    magic, n, h, w = struct.unpack_from("<4sIII", payload, 0)
    if magic != VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    if len(payload) != _VIDEO_HEADER + n * h * w:
        raise ValueError(
            f"VID0 length mismatch: header says {n}x{h}x{w}, "
            f"payload has {len(payload) - _VIDEO_HEADER} frame bytes"
        )
    return np.frombuffer(
        payload, dtype=np.uint8, count=n * h * w, offset=_VIDEO_HEADER
    ).reshape(n, h, w)


def decode_bmp_gray8(payload: bytes) -> np.ndarray:
    """Parse an 8-bit-palette BMP back to a 2-D uint8 array — a real
    container parse: header validation, data-offset indirection, bottom-up
    row order, 4-byte row padding."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _fsize, _r1, _r2, data_off) = struct.unpack_from("<2sIHHI", payload, 0)
    (info_size, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", payload, _BMP_HEADER)
    if info_size < _BMP_INFO or bpp != 8:
        raise ValueError(f"decode_bmp_gray8 expects 8-bit BMP (got bpp={bpp})")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or empty BMP not supported")
    stride = (w + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    return rows[::-1, :w].copy()


# --------------------------------------------------------------------------
# mapInPandas operators
# --------------------------------------------------------------------------
def resize_images(assets: DataFrame, out_w: int = RESIZE_W, out_h: int = RESIZE_H) -> DataFrame:
    """Nearest-neighbor resize of image assets to (out_w, out_h) — real
    numpy index arithmetic on the decoded buffer; returns new dims + a
    checksum of the resized pixels (payload itself stays columnar/binary
    in production; the checksum keeps the test deterministic)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                img = decode_payload(bytes(payload)).reshape(h, w)
                ys = (np.arange(out_h) * h // out_h).astype(np.intp)
                xs = (np.arange(out_w) * w // out_w).astype(np.intp)
                resized = img[np.ix_(ys, xs)]
                rows.append((int(doc_id), w, h, out_w, out_h, int(resized.sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width", "out_height", "checksum"],
            )

    images = assets.filter(F.col("modality") == "image")
    return images.mapInPandas(compute, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = "doc_id long, window_idx int, rms double, zero_crossings int"
AUDIO_WINDOW = 256  # samples per analysis window


# --------------------------------------------------------------------------
# Real-codec pipelines: deterministic synthetic signals -> real containers
# -> real decode -> features.  The signal parameters are pure doc_id
# arithmetic so a SQL oracle can regenerate the expected output from first
# principles (UNNEST(range(...))) while the Spark side round-trips actual
# WAV/BMP bytes through actual parsers -- any encode/decode bug (byte
# order, row padding, header arithmetic) breaks the hash match.
# --------------------------------------------------------------------------
WAV_WINDOW = 256  # samples per analysis window; every period divides it


def synth_square_wave(doc_id: int) -> tuple[np.ndarray, int, int]:
    """Deterministic square wave for one doc: returns (samples, amp, half_p).

    half_period in {4,8,16,32} (so the 2*half_p period divides the 256-
    sample analysis window), amplitude in {1000..1400}, length a multiple
    of 256 -- which makes the whole-buffer mean exactly 0 and every
    window's RMS exactly the amplitude."""
    half_p = 4 << (doc_id % 4)
    amp = 1000 + 100 * (doc_id % 5)
    n = 256 * (4 + doc_id % 9)
    idx = np.arange(n)
    samples = np.where((idx // half_p) % 2 == 0, amp, -amp).astype(np.int16)
    return samples, amp, half_p


def synth_gradient_image(doc_id: int) -> np.ndarray:
    """Deterministic grayscale test card: (x*7 + y*13 + doc_id) % 256,
    with width 8..15 (exercises BMP row padding: stride != width for
    non-multiple-of-4 widths) and height 8..11."""
    w = 8 + doc_id % 8
    h = 8 + doc_id % 4
    x = np.arange(w)
    y = np.arange(h)[:, None]
    return ((x * 7 + y * 13 + doc_id) % 256).astype(np.uint8)


def build_wav_assets(documents: DataFrame) -> DataFrame:
    """Audio-modality docs -> (doc_id, payload) where payload is a REAL
    RIFF/WAVE container of the doc's synthetic signal.  Stands in for the
    ingest step of a production pipeline (reading .wav objects); Arrow-
    batched, narrow."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), encode_wav(synth_square_wave(int(doc_id))[0]))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    audio = documents.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    return audio.mapInPandas(encode, schema="doc_id long, payload binary")


def wav_window_features(assets: DataFrame, window: int = WAV_WINDOW) -> DataFrame:
    """Decode REAL WAV containers (stdlib ``wave`` via decode_payload_real)
    and emit per-window RMS + zero-crossings -- same analysis as
    audio_features but fed by a real codec."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = decode_payload_real(bytes(payload), "audio").astype(np.float64)
                centered = buf - buf.mean()
                for i in range(len(buf) // window):
                    w = centered[i * window : (i + 1) * window]
                    rms = float(np.sqrt(np.mean(w * w)))
                    zc = int(np.sum(np.signbit(w[:-1]) != np.signbit(w[1:])))
                    rows.append((int(doc_id), i, rms, zc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_idx", "rms", "zero_crossings"]
            )

    return assets.mapInPandas(compute, schema=AUDIO_SCHEMA)


def build_bmp_assets(documents: DataFrame) -> DataFrame:
    """Image-modality docs -> (doc_id, payload) where payload is a REAL
    8-bit-palette BMP of the doc's synthetic test card."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), encode_bmp_gray8(synth_gradient_image(int(doc_id))))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    images = documents.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return images.mapInPandas(encode, schema="doc_id long, payload binary")


BMP_STATS_SCHEMA = (
    "doc_id long, width int, height int, px_sum long, px_min int, px_max int, "
    "px_mean double"
)


#: Sawtooth half of the real-codec audio family.  Periods are chosen to
#: divide every buffer length (n_samples is always a multiple of 500 and
#: 20|50|100 all divide 500), so the whole-buffer mean is EXACTLY zero —
#: the decoded signal equals its own mean-centered form and every
#: analysis reduction below is an integer sum, making the SQL oracle's
#: floats bit-identical (no tolerance needed).  Values are odd integers
#: (2*(i%P) - (P-1) with even P), so a centered sample is never 0 and
#: zero-crossing semantics can't diverge on sign-of-zero.
SAW_PERIODS = (20, 50, 100)


def synth_sawtooth_wave(doc_id: int) -> np.ndarray:
    """Deterministic odd-valued sawtooth: period P = SAW_PERIODS[doc_id%3],
    s(i) = 2*(i mod P) - (P-1), length 1000 + (doc_id%9)*500 (the legacy
    audio meta n_samples, so window counts stay contract-compatible)."""
    p = SAW_PERIODS[doc_id % 3]
    n = 1000 + (doc_id % 9) * 500
    idx = np.arange(n)
    return (2 * (idx % p) - (p - 1)).astype(np.int16)


def synth_video_frames(doc_id: int) -> np.ndarray:
    """Deterministic video test stack matching the legacy asset meta
    (16x16, n_frames = 8 + doc_id%9): pixel(f,y,x) = (x*7 + y*13 + f*29
    + doc_id) % 256."""
    n = 8 + doc_id % 9
    f = np.arange(n)[:, None, None]
    y = np.arange(16)[None, :, None]
    x = np.arange(16)[None, None, :]
    return ((x * 7 + y * 13 + f * 29 + doc_id) % 256).astype(np.uint8)


def build_saw_wav_assets(documents: DataFrame) -> DataFrame:
    """Audio-modality docs -> (doc_id, payload) where payload is a REAL
    RIFF/WAVE container of the doc's sawtooth signal."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), encode_wav(synth_sawtooth_wave(int(doc_id))))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    audio = documents.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    return audio.mapInPandas(encode, schema="doc_id long, payload binary")


def build_video_assets(documents: DataFrame) -> DataFrame:
    """Video-modality docs -> (doc_id, payload) where payload is a REAL
    VID0 concatenated-frames container of the doc's synthetic stack."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), encode_video_frames(synth_video_frames(int(doc_id))))
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    videos = documents.filter(F.col("doc_id") % 3 == 2).select("doc_id")
    return videos.mapInPandas(encode, schema="doc_id long, payload binary")


REAL_FEATURES_SCHEMA = (
    "doc_id long, modality string, n_values int, features array<double>"
)


def real_asset_features(assets: DataFrame) -> DataFrame:
    """Per-asset 13-dim feature vector over REAL container payloads:
    decode via :func:`decode_payload_real` (BMP / WAV / VID0 parsers),
    then mean, std, min, max, median + 8-bin histogram fractions over the
    decoded value stream.

    Float-parity contract with the SQL oracle: every reduction is either
    an integer sum (order-insensitive, exact in float64) or an identical
    scalar IEEE expression on both sides — std is computed as
    sqrt(E[x^2] - E[x]^2) explicitly, NOT np.std, so DuckDB's
    sqrt(avg(v*v) - avg(v)*avg(v)) produces the bit-identical double."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                buf = (
                    decode_payload_real(bytes(payload), modality)
                    .astype(np.float64)
                    .ravel()
                )
                n = len(buf)
                m = float(buf.sum()) / n
                ex2 = float((buf * buf).sum()) / n
                hist, _ = np.histogram(buf, bins=N_HIST_BINS, range=(0, 256))
                feats = [
                    m,
                    math.sqrt(ex2 - m * m),
                    float(buf.min()),
                    float(buf.max()),
                    float(np.median(buf)),
                ] + (hist / n).tolist()
                rows.append((int(doc_id), modality, n, feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "modality", "n_values", "features"]
            )

    return assets.select("doc_id", "modality", "payload").mapInPandas(
        compute, schema=REAL_FEATURES_SCHEMA
    )


VIDEO_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_mean double, frame_std double"


def video_frame_sample(assets: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Every-``stride``-th-frame sampling over REAL VID0 containers: one
    output row per kept frame with per-frame mean + std (std via the same
    explicit sqrt(E[x^2]-E[x]^2) float-parity form as the oracle; frames
    are 16x16 = 256 pixels, so both divisions are exact)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                vid = decode_payload_real(bytes(payload), "video").astype(np.float64)
                n = vid.shape[0]
                npx = vid.shape[1] * vid.shape[2]
                for idx in range(0, n, stride):
                    frame = vid[idx]
                    m = float(frame.sum()) / npx
                    ex2 = float((frame * frame).sum()) / npx
                    rows.append((int(doc_id), idx, m, math.sqrt(ex2 - m * m)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_mean", "frame_std"]
            )

    return assets.mapInPandas(compute, schema=VIDEO_FRAME_SCHEMA)


def bmp_pixel_stats(assets: DataFrame) -> DataFrame:
    """Decode REAL BMP containers (PIL if present, else the built-in
    parser) and emit per-image pixel statistics."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_payload_real(bytes(payload), "image")
                h, w = img.shape[:2]
                px = img.astype(np.int64)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                        float(px.sum()) / (w * h),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "px_sum", "px_min", "px_max", "px_mean",
                ],
            )

    return assets.mapInPandas(compute, schema=BMP_STATS_SCHEMA)
