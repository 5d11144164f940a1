"""From-spec FLAC codec (operators/flac.py): lossless roundtrip across
subframe types, stereo decorrelation modes, block/rate encodings; decode
integration through the audio mapInPandas paths; hypothesis fuzz for the
never-raise contract on arbitrary bytes."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ideafast_etl_spark.operators.flac import decode_flac, encode_flac


def _q(x):
    """The encoder's int16 quantisation — decoded output must equal this
    exactly (scaled by 1/32768)."""
    return (np.clip(x, -1.0, 1.0) * 32767.0).round()


def _roundtrip(x, rate=8000, **kw):
    out = decode_flac(encode_flac(x, rate, **kw))
    assert out is not None
    r, nch, y = out
    assert (r, nch) == (rate, x.shape[1])
    assert y.shape == x.shape
    assert np.array_equal(y * 32768.0, _q(x))


def test_smooth_mono_fixed_orders_compress_and_roundtrip():
    t = np.arange(10_000) / 8000.0
    x = (np.sin(2 * np.pi * 440 * t) * 0.5).reshape(-1, 1)
    b = encode_flac(x, 8000)
    assert len(b) < 2 * x.shape[0]  # actually smaller than raw 16-bit
    _roundtrip(x)


def test_noise_flat_tiny_and_forced_subframes():
    rng = np.random.default_rng(7)
    _roundtrip(rng.uniform(-1, 1, (5000, 1)))  # escape/verbatim-ish
    _roundtrip(np.full((3000, 1), 0.25))  # CONSTANT subframe
    _roundtrip(np.full((3000, 1), -1.5))  # clipped constant
    t = np.arange(2000) / 8000.0
    x = (np.sin(2 * np.pi * 200 * t) * 0.3).reshape(-1, 1)
    _roundtrip(x, force_subframe="verbatim")
    _roundtrip(x, force_subframe="lpc")  # decoder's LPC path


@pytest.mark.parametrize("mode", ["independent", "left-side", "mid-side"])
def test_stereo_decorrelation_modes(mode):
    rng = np.random.default_rng(3)
    t = np.arange(6000) / 8000.0
    base = np.sin(2 * np.pi * 440 * t) * 0.4
    x = np.stack([base, base + rng.uniform(-0.01, 0.01, len(t))], axis=1)
    _roundtrip(x, stereo_mode=mode)


def test_partial_last_block_odd_rate_and_44k():
    t = np.arange(4097) / 8000.0
    x = (np.sin(2 * np.pi * 100 * t) * 0.7).reshape(-1, 1)
    _roundtrip(x)  # last block is 1 sample (16-bit block-size encoding)
    _roundtrip(x, rate=44100)  # coded sample rate
    _roundtrip(x, rate=12345)  # explicit 16-bit sample rate
    _roundtrip(x[:3])  # sub-minimum block → verbatim


def test_corruption_and_garbage_return_none():
    assert decode_flac(b"") is None
    assert decode_flac(b"garbage") is None
    assert decode_flac(b"fLaC" + b"\x00" * 10) is None
    t = np.arange(3000) / 8000.0
    good = bytearray(
        encode_flac((np.sin(2 * np.pi * 50 * t) * 0.5).reshape(-1, 1), 8000)
    )
    good[-10] ^= 0xFF  # flip a payload byte → frame CRC-16 must catch it
    assert decode_flac(bytes(good)) is None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_decode_never_raises_on_arbitrary_bytes(data):
    decode_flac(data)
    decode_flac(b"fLaC" + data)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 400),
    st.integers(1, 2),
    st.sampled_from(["independent", "left-side", "mid-side"]),
)
def test_roundtrip_fuzz(n, nch, mode):
    rng = np.random.default_rng(n * 31 + nch)
    x = rng.uniform(-1, 1, (n, nch))
    if nch == 1 and mode != "independent":
        mode = "independent"
    _roundtrip(x, stereo_mode=mode)


def test_audio_features_decodes_flac(spark):
    """Integration: FLAC content flows through the same Arrow
    audio_features path as WAV — no stub hit, exact features."""
    from ideafast_etl_spark.operators import multimodal as mm

    x = np.full((1600, 1), 0.5)
    flac = encode_flac(x, 8000)
    df = spark.createDataFrame([(1, bytearray(flac))], "asset_id long, content binary")
    row = mm.audio_features(df).collect()[0]
    assert row["sample_rate"] == 8000
    assert row["n_channels"] == 1
    assert row["duration_s"] == pytest.approx(0.2)
    q = round(0.5 * 32767) / 32768.0
    assert row["rms"] == pytest.approx(q, abs=1e-12)
    assert row["peak"] == pytest.approx(q, abs=1e-12)
    # and sniff_media_type sees audio/flac from magic bytes (JVM-side)
    mt = df.select(mm.sniff_media_type().alias("t")).collect()[0]["t"]
    assert mt == "audio/flac"


def test_resample_audio_accepts_flac(spark):
    from ideafast_etl_spark.operators import multimodal as mm

    t = np.arange(1600) / 8000.0
    x = (np.sin(2 * np.pi * 440 * t) * 0.4).reshape(-1, 1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_flac(x, 8000)))], "asset_id long, content binary"
    )
    out = mm.resample_audio(df, target_hz=16_000).collect()[0]
    assert out["sample_rate"] == 16_000
    dec = mm.decode_wav(bytes(out["audio"]))
    assert dec is not None and dec[0] == 16_000
    assert dec[2].shape[0] == 3200  # 0.2 s at 16 kHz
