"""Multimodal pipeline: oracle check for asset plumbing, determinism +
schema/shape checks for the Pandas-UDF stages."""

import pytest

from datafusion_parallelism_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_STRIDE,
    build_assets,
)
from datafusion_parallelism_spark.queries import REGISTRY
from datafusion_parallelism_spark.session import load
from datafusion_parallelism_spark.testing import compare_to_oracle


def test_assets_summary_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_assets_summary"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_asset_payload_length_matches_meta(spark, sf_dir):
    assets = build_assets(load(spark, sf_dir, "documents"))
    bad = assets.filter("length(payload) <> meta.n_bytes").count()
    assert bad == 0


def test_image_features_schema_and_dim(spark, sf_dir):
    df = REGISTRY["mm_image_features"].fn(spark, sf_dir)
    assert df.columns == ["doc_id", "modality", "n_values", "features"]
    rows = df.collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # one feature row per asset
    for r in rows[:20]:
        assert len(r.features) == FEATURE_DIM
        # mean: uint8 pixels for image/video, zero-mean sawtooth for audio
        assert 0.0 <= r.features[0] <= 255.0


def test_image_features_deterministic(spark, sf_dir):
    fn = REGISTRY["mm_image_features"].fn
    a = {r.doc_id: r.features for r in fn(spark, sf_dir).collect()}
    b = {r.doc_id: r.features for r in fn(spark, sf_dir).collect()}
    assert a == b


def test_resize_dims_and_checksum_range(spark, sf_dir):
    df = REGISTRY["mm_resize_images"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows, "no image assets"
    for r in rows:
        assert (r.out_width, r.out_height) == (16, 16)
        assert 0 <= r.checksum <= 255 * 16 * 16


def test_frame_sample_counts(spark, sf_dir):
    assets = build_assets(load(spark, sf_dir, "documents"))
    videos = {
        r.doc_id: r["meta"]["n_frames"]
        for r in assets.filter("modality = 'video'").select("doc_id", "meta").collect()
    }
    df = REGISTRY["mm_frame_sample"].fn(spark, sf_dir)
    got = df.groupBy("doc_id").count().collect()
    assert len(got) == len(videos)
    for r in got:
        n = videos[r.doc_id]
        assert r["count"] == -(-n // FRAME_STRIDE)  # ceil(n / stride)


def test_mapinpandas_is_narrow(spark, sf_dir):
    """The decode stage must not introduce a KEYED shuffle: no hash/range
    Exchange between the scan and the Python map stage.  The only
    permitted Exchange is the deliberate round-robin probe spread
    (_docs_spread, BASELINE §Round 10 item 5) that widens the tiny
    input-byte-sized scan to session width before the CPU-bound decode —
    a partitioning choice, not a data-dependency shuffle."""
    df = REGISTRY["mm_image_features"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line


def test_audio_features_window_counts_and_ranges(spark, sf_dir):
    from datafusion_parallelism_spark.operators.multimodal import AUDIO_WINDOW

    assets = build_assets(load(spark, sf_dir, "documents"))
    audio_sizes = {
        r.doc_id: r["meta"]["n_bytes"]
        for r in assets.filter("modality = 'audio'").select("doc_id", "meta").collect()
    }
    df = REGISTRY["mm_audio_features"].fn(spark, sf_dir)
    rows = df.collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, 0)
        got[r.doc_id] += 1
        assert 0.0 <= r.rms <= 128.0
        assert 0 <= r.zero_crossings < AUDIO_WINDOW
    assert got == {d: n // AUDIO_WINDOW for d, n in audio_sizes.items()}


def test_real_decode_seam_raises_without_codecs():
    """The production-decode seam must fail loud (NotImplementedError),
    not silently fall back to the fake."""
    import pytest

    from datafusion_parallelism_spark.operators.multimodal import decode_payload_real

    for modality in ("image", "audio", "video"):
        with pytest.raises(NotImplementedError):
            decode_payload_real(b"\x00" * 16, modality)


# --------------------------------------------------------------------------
# Real container codecs (WAV via stdlib wave; BMP via built-in parser)
# --------------------------------------------------------------------------
def test_wav_roundtrip_exact():
    import numpy as np

    from datafusion_parallelism_spark.operators.multimodal import (
        decode_payload_real,
        encode_wav,
    )

    samples = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int16)
    payload = encode_wav(samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    got = decode_payload_real(payload, "audio")
    assert got.dtype == np.int16
    assert np.array_equal(got, samples)


def test_bmp_roundtrip_exact_with_padding():
    import numpy as np

    from datafusion_parallelism_spark.operators.multimodal import (
        decode_bmp_gray8,
        encode_bmp_gray8,
    )

    # width 13: stride pads to 16 — the parser must strip padding and
    # un-reverse the bottom-up row order.
    rng = np.arange(13 * 5, dtype=np.uint8).reshape(5, 13)
    payload = encode_bmp_gray8(rng)
    assert payload[:2] == b"BM"
    assert np.array_equal(decode_bmp_gray8(payload), rng)


def test_bmp_decode_via_real_seam():
    import numpy as np

    from datafusion_parallelism_spark.operators.multimodal import (
        decode_payload_real,
        encode_bmp_gray8,
        synth_gradient_image,
    )

    img = synth_gradient_image(42)
    got = decode_payload_real(encode_bmp_gray8(img), "image")
    # PIL (when present) returns the same 2-D array as the built-in parser.
    assert np.array_equal(np.asarray(got), img)


def test_square_wave_closed_form_properties():
    import numpy as np

    from datafusion_parallelism_spark.operators.multimodal import synth_square_wave

    for doc_id in (1, 4, 7, 10, 25):
        samples, amp, half_p = synth_square_wave(doc_id)
        buf = samples.astype(np.float64)
        assert buf.mean() == 0.0  # length is a whole number of periods
        w = buf[:256]
        assert float(np.sqrt(np.mean(w * w))) == float(amp)
        zc = int(np.sum(np.signbit(w[:-1]) != np.signbit(w[1:])))
        assert zc == 256 // half_p - 1


def test_wav_query_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_audio_wav_features"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_bmp_query_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_image_bmp_stats"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_resize_query_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_resize_images"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_vid0_roundtrip_exact():
    import numpy as np

    from datafusion_parallelism_spark.operators.multimodal import (
        decode_payload_real,
        encode_video_frames,
        synth_video_frames,
    )

    frames = synth_video_frames(17)
    payload = encode_video_frames(frames)
    assert payload[:4] == b"VID0"
    got = decode_payload_real(payload, "video")
    assert got.shape == frames.shape
    assert np.array_equal(got, frames)


def test_vid0_rejects_truncated_payload():
    import pytest

    from datafusion_parallelism_spark.operators.multimodal import (
        decode_video_frames,
        encode_video_frames,
        synth_video_frames,
    )

    payload = encode_video_frames(synth_video_frames(3))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_video_frames(payload[:-10])


def test_sawtooth_exact_zero_mean():
    """The float-parity contract of the migrated audio oracle: the
    whole-buffer mean is exactly 0 (period divides length) and every
    sample is odd (never zero after centering)."""
    import numpy as np

    from datafusion_parallelism_spark.operators.multimodal import synth_sawtooth_wave

    for doc_id in (1, 4, 7, 10, 25, 100):
        buf = synth_sawtooth_wave(doc_id).astype(np.float64)
        assert buf.sum() == 0.0
        assert np.all(buf.astype(np.int64) % 2 != 0)


# The three queries migrated off the fake decoder in round 4 — each now
# hash-matches a first-principles oracle (exact float parity, see the
# query docstrings).
def test_migrated_features_query_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_image_features"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_migrated_frame_sample_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_frame_sample"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail


def test_migrated_audio_features_matches_oracle(spark, sf_dir_oracle):
    spec = REGISTRY["mm_audio_features"]
    ok, detail = compare_to_oracle(
        spark, spec.fn(spark, sf_dir_oracle), spec.oracle, sf_dir_oracle
    )
    assert ok, detail
