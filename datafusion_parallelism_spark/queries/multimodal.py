"""Multimodal corpus: opaque binary assets + Pandas-UDF decode pipeline.

``mm_assets_summary`` proves the JVM-side asset construction (binary
payload + typed metadata) bit-for-bit against DuckDB (md5 of the payload
blob is part of the compared result).  The decode / resize / frame-sample
stages run numpy inside Arrow-batched ``mapInPandas`` — not expressible in
SQL, so they register ``oracle=None`` (driver records rows-only checks) and
their determinism is pinned by tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    build_assets,
    image_features,
    resize_images,
    sample_frames,
)
from ..session import load
from .registry import query

_N_BYTES_SQL = """
    CASE WHEN doc_id % 3 = 0 THEN (32 + doc_id % 32) * (32 + doc_id % 16)
         WHEN doc_id % 3 = 1 THEN 1000 + (doc_id % 9) * 500
         ELSE 16 * 16 * (8 + doc_id % 9) END
"""


@query(
    "mm_assets_summary",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             CAST({_N_BYTES_SQL} AS INT) AS n_bytes
      FROM documents
    ),
    assets AS (
      SELECT doc_id, modality, n_bytes,
             from_hex(substr(repeat(md5(text), CAST(ceil(n_bytes * 2 / 32.0) AS INT)),
                             1, n_bytes * 2)) AS payload
      FROM sized
    )
    SELECT modality,
           COUNT(*) AS n_assets,
           SUM(octet_length(payload)) AS total_bytes,
           SUM(n_bytes) AS total_meta_bytes,
           COUNT(DISTINCT md5(lower(hex(payload)))) AS distinct_payloads,
           MIN(md5(lower(hex(payload)))) AS min_payload_md5
    FROM assets
    GROUP BY modality
    """,
)
def mm_assets_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-table plumbing check: payload byte length must equal the typed
    metadata on every row, and the payload BYTES themselves hash-match the
    oracle's independently-constructed blobs.  All JVM-side (no UDF)."""
    assets = build_assets(load(spark, sf_dir, "documents"))
    return assets.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.sum(F.col("meta.n_bytes")).alias("total_meta_bytes"),
        F.countDistinct(F.md5(F.lower(F.hex("payload")))).alias("distinct_payloads"),
        F.min(F.md5(F.lower(F.hex("payload")))).alias("min_payload_md5"),
    )


@query("mm_image_features", oracle=None)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over every asset via Arrow-batched
    mapInPandas (13-dim vector: 5 moments + 8-bin histogram).  Non-SQL
    (numpy in the loop) → rows-only driver check; determinism pinned in
    tests."""
    assets = build_assets(load(spark, sf_dir, "documents"))
    return image_features(assets)


@query("mm_resize_images", oracle=None)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 16x16 resize of image assets (numpy indexing in
    mapInPandas); emits new dims + pixel checksum."""
    assets = build_assets(load(spark, sf_dir, "documents"))
    return resize_images(assets)


@query("mm_frame_sample", oracle=None)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sampling of video assets — row-expanding
    mapInPandas (one row per kept frame with per-frame stats)."""
    assets = build_assets(load(spark, sf_dir, "documents"))
    return sample_frames(assets)


@query("mm_audio_features", oracle=None)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS + zero-crossing analysis of audio assets (256-sample
    windows, row-expanding mapInPandas)."""
    from ..operators.multimodal import audio_features

    assets = build_assets(load(spark, sf_dir, "documents"))
    return audio_features(assets)
