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
* The image/audio codecs are NOT in this container.  ``decode_payload``
  is therefore a clearly-marked deterministic fake (np.frombuffer of the
  md5-derived payload); ``decode_payload_real`` shows the real-library
  seam and raises ``NotImplementedError`` unless PIL/soundfile exist.
  Everything around the decode — schemas, UDF signatures, Arrow batch
  iteration, partition behavior — is real and tested.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Feature vector layout produced by :func:`image_features`.
N_HIST_BINS = 8
FEATURE_DIM = 5 + N_HIST_BINS  # mean, std, min, max, median + histogram

RESIZE_W = 16
RESIZE_H = 16
FRAME_STRIDE = 2  # keep every 2nd frame

FEATURES_SCHEMA = (
    "doc_id long, modality string, n_bytes int, features array<double>"
)
RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, checksum long"
)
FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_mean double, frame_std double"
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
    """Real decode seam — requires image/audio codecs not present in this
    container.  Kept so the production swap is one function."""
    try:
        if modality == "image":
            import io

            from PIL import Image  # type: ignore

            return np.asarray(Image.open(io.BytesIO(payload)))
        if modality == "audio":
            import io

            import soundfile  # type: ignore

            data, _rate = soundfile.read(io.BytesIO(payload))
            return np.asarray(data)
    except ImportError as exc:
        raise NotImplementedError(
            f"real {modality} decode needs optional codec libraries"
        ) from exc
    raise NotImplementedError(f"no real decoder for modality {modality!r}")


# --------------------------------------------------------------------------
# mapInPandas operators
# --------------------------------------------------------------------------
def image_features(assets: DataFrame) -> DataFrame:
    """Per-asset feature vector (mean/std/min/max/median + 8-bin histogram
    of the decoded buffer) via Arrow-batched mapInPandas.

    Narrow stage: no shuffle; each task decodes only its partition's
    payloads batch by batch."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                buf = decode_payload(bytes(payload)).astype(np.float64)
                hist, _ = np.histogram(buf, bins=N_HIST_BINS, range=(0, 256))
                feats = [
                    float(buf.mean()),
                    float(buf.std()),
                    float(buf.min()),
                    float(buf.max()),
                    float(np.median(buf)),
                ] + (hist / max(len(buf), 1)).tolist()
                rows.append((int(doc_id), modality, len(buf), feats))
            yield pd.DataFrame(
                rows, columns=["doc_id", "modality", "n_bytes", "features"]
            )

    return assets.select("doc_id", "modality", "payload").mapInPandas(
        compute, schema=FEATURES_SCHEMA
    )


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


def sample_frames(assets: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling for video assets: decode → (n_frames, h, w) → keep
    every ``stride``-th frame → one output row per kept frame with frame
    stats.  Row-expanding mapInPandas (1 video → ⌈n/stride⌉ rows)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                w, h, n = int(meta["width"]), int(meta["height"]), int(meta["n_frames"])
                vid = decode_payload(bytes(payload)).reshape(n, h, w).astype(np.float64)
                for idx in range(0, n, stride):
                    frame = vid[idx]
                    rows.append(
                        (int(doc_id), idx, float(frame.mean()), float(frame.std()))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_mean", "frame_std"]
            )

    videos = assets.filter(F.col("modality") == "video")
    return videos.mapInPandas(compute, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = "doc_id long, window_idx int, rms double, zero_crossings int"
AUDIO_WINDOW = 256  # samples per analysis window


def audio_features(assets: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Windowed audio analysis for audio assets: the decoded sample buffer
    is split into fixed windows and each yields RMS energy + zero-crossing
    count (computed on the mean-centered signal) — one output row per
    window (row-expanding mapInPandas, like frame sampling for video)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = decode_payload(bytes(payload)).astype(np.float64)
                centered = buf - buf.mean()
                n_win = len(buf) // window
                for i in range(n_win):
                    w = centered[i * window : (i + 1) * window]
                    rms = float(np.sqrt(np.mean(w * w)))
                    zc = int(np.sum(np.signbit(w[:-1]) != np.signbit(w[1:])))
                    rows.append((int(doc_id), i, rms, zc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_idx", "rms", "zero_crossings"]
            )

    audio = assets.filter(F.col("modality") == "audio")
    return audio.select("doc_id", "payload").mapInPandas(compute, schema=AUDIO_SCHEMA)
