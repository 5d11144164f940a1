"""Multimodal column plumbing: magic-byte sniffing (pure expression),
mapInPandas decode/sample/resample stubs, binaryFile source."""

import pytest

from pyspark.sql import functions as F

from ideafast_etl_spark.operators import multimodal as mm
from ideafast_etl_spark.sources.files import read_binary_files

JPEG = b"\xff\xd8\xff\xe0" + b"J" * 100
PNG = b"\x89PNG\r\n\x1a\n" + b"P" * 2000
WAV = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"W" * 500
MP3 = b"ID3\x03" + b"M" * 300
JUNK = b"\x00\x01\x02" + b"X" * 50


@pytest.fixture(scope="module")
def assets(spark):
    rows = [(1, JPEG), (2, PNG), (3, WAV), (4, MP3), (5, JUNK)]
    return spark.createDataFrame(rows, "asset_id long, content binary")


def test_sniff_media_type_from_magic_bytes(spark, assets):
    out = {r["asset_id"]: r["t"] for r in
           assets.select("asset_id", mm.sniff_media_type().alias("t")).collect()}
    assert out == {
        1: "image/jpeg",
        2: "image/png",
        3: "audio/wav",
        4: "audio/mp3",
        5: "application/octet-stream",
    }


def test_media_metadata_columns(spark, assets):
    meta = mm.with_media_metadata(assets)
    row = meta.filter(F.col("asset_id") == 2).first()
    assert row["n_bytes"] == len(PNG)
    assert len(row["checksum"]) == 64
    # checksum is a dedup identity: identical payloads collide
    dup = spark.createDataFrame([(9, PNG)], "asset_id long, content binary")
    assert mm.with_media_metadata(dup).first()["checksum"] == row["checksum"]


def test_decode_image_features_fake_and_stub(spark, assets):
    feats = mm.decode_image_features(assets, fake=True).collect()
    assert len(feats) == 5
    assert all(64 <= r["width"] <= 319 for r in feats)
    # real decode path is explicitly NotImplemented (no codec libs here)
    with pytest.raises(Exception) as exc_info:
        mm.decode_image_features(assets, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_video_frames_one_to_many(spark, spark_tmp_assets=None):
    big = spark.createDataFrame(
        [(1, b"V" * 90_000), (2, b"W" * 200)], "asset_id long, content binary"
    )
    frames = mm.sample_video_frames(big, every_n=30, fake=True).collect()
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert len(per_asset[1]) == 3  # 90000 // (30*1000)
    assert per_asset[1] == [0, 30, 60]
    assert len(per_asset[2]) == 1


def test_resample_audio_passthrough(spark, assets):
    out = mm.resample_audio(assets, target_hz=16_000, fake=True).collect()
    assert all(r["sample_rate"] == 16_000 for r in out)
    assert len(out) == 5


def _checker_bmp(w=8, h=6):
    import numpy as np

    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[::2, ::2] = 255  # white squares on even (row, col)
    px[1::2, 1::2] = 255
    return px


def test_bmp_decode_roundtrip_and_real_features(spark):
    import numpy as np

    px = _checker_bmp()
    content = mm.encode_bmp(px)
    w, h, decoded = mm.decode_bmp(content)
    assert (w, h) == (8, 6)
    assert np.array_equal(decoded, px)

    df = spark.createDataFrame([(1, content)], "asset_id long, content binary")
    feat = mm.decode_image_features(df, fake=False).first()  # REAL path
    assert (feat["width"], feat["height"]) == (8, 6)
    # exactly half the checkerboard pixels are white → mean luma 0.5
    assert feat["mean_luma"] == pytest.approx(0.5, abs=1e-9)


def test_bmp_resize_nearest_neighbour(spark):
    import numpy as np

    content = mm.encode_bmp(_checker_bmp(8, 6))
    df = spark.createDataFrame([(1, content)], "asset_id long, content binary")
    out = mm.resize_images(df, target_w=4, target_h=3).first()
    assert (out["width"], out["height"]) == (4, 3)
    w, h, px = mm.decode_bmp(bytes(out["content"]))
    assert (w, h) == (4, 3)
    # nearest-neighbour on a 2x downscale picks the even indices → all white
    assert np.all(px == 255)


def _sine_wav(rate=8_000, hz=440.0, seconds=0.25):
    import numpy as np

    t = np.arange(int(rate * seconds)) / rate
    mono = 0.5 * np.sin(2 * np.pi * hz * t)
    return mm.encode_wav(mono[:, None], rate)


def test_wav_audio_features_real_decode(spark):
    content = _sine_wav()
    df = spark.createDataFrame([(1, content)], "asset_id long, content binary")
    row = mm.audio_features(df).first()
    assert row["sample_rate"] == 8_000
    assert row["n_channels"] == 1
    assert row["duration_s"] == pytest.approx(0.25, abs=1e-3)
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert row["rms"] == pytest.approx(0.3535, abs=2e-3)
    assert row["peak"] == pytest.approx(0.5, abs=2e-3)


def test_wav_resample_real_linear_interp(spark):
    content = _sine_wav(rate=8_000, seconds=0.25)
    df = spark.createDataFrame([(1, content)], "asset_id long, content binary")
    out = mm.resample_audio(df, target_hz=16_000, fake=False).first()
    assert out["sample_rate"] == 16_000
    rate, nch, x = mm.decode_wav(bytes(out["audio"]))
    assert rate == 16_000 and nch == 1
    # 2x upsample doubles the frame count and preserves energy
    assert x.shape[0] == pytest.approx(4_000, abs=2)
    import numpy as np

    assert float(np.sqrt((x**2).mean())) == pytest.approx(0.3535, abs=5e-3)


def test_non_wav_audio_still_hits_codec_stub(spark):
    df = spark.createDataFrame([(1, MP3)], "asset_id long, content binary")
    with pytest.raises(Exception) as exc_info:
        mm.audio_features(df).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_binary_file_source_roundtrip(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.jpg").write_bytes(JPEG)
    (d / "b.png").write_bytes(PNG)
    df = read_binary_files(spark, str(d))
    rows = {r["file_name"]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.png"}
    assert bytes(rows["a.jpg"]["content"]) == JPEG
    typed = mm.with_media_metadata(df)
    types = {r["file_name"]: r["media_type"] for r in typed.collect()}
    assert types == {"a.jpg": "image/jpeg", "b.png": "image/png"}


def test_package_shipping_is_idempotent(spark):
    """The oracle driver runs queries under its own session; tables.load
    ships the package zip to its workers exactly once per context."""
    from ideafast_etl_spark.shipping import ensure_package_shipped, _FLAG

    ensure_package_shipped(spark)
    assert getattr(spark.sparkContext, _FLAG) is True
    ensure_package_shipped(spark)  # second call: no re-zip, no error


def test_bseq_roundtrip_and_corruption():
    from ideafast_etl_spark.operators.multimodal import demux_bseq, encode_bseq

    frames = [b"one", b"", b"three-3"]
    packed = encode_bseq(frames)
    assert demux_bseq(packed) == frames
    assert demux_bseq(b"notbseq") is None
    assert demux_bseq(packed[:-2]) is None  # truncated last frame


def test_video_frame_features_real_demux_and_decode(spark):
    import numpy as np

    from ideafast_etl_spark.operators import multimodal as mm

    frames = [
        mm.encode_bmp(np.full((2, 3, 3), v, dtype=np.uint8)) for v in (10, 20, 30)
    ]
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_bseq(frames)))], "asset_id long, content binary"
    )
    out = sorted(
        mm.video_frame_features(df, every_n=2).collect(), key=lambda r: r.frame_idx
    )
    # every 2nd frame of 3 -> indices 0 and 2, decoded for real
    assert [(r.frame_idx, r.width, r.height) for r in out] == [(0, 3, 2), (2, 3, 2)]
    assert out[0].mean_luma == pytest.approx(10 / 255.0)
    assert out[1].mean_luma == pytest.approx(30 / 255.0)


def test_sample_video_frames_real_path_emits_frame_bytes(spark):
    import numpy as np

    from ideafast_etl_spark.operators import multimodal as mm

    frames = [
        mm.encode_bmp(np.full((1, 1, 3), v, dtype=np.uint8)) for v in range(4)
    ]
    df = spark.createDataFrame(
        [(7, bytearray(mm.encode_bseq(frames)))], "asset_id long, content binary"
    )
    out = {r.frame_idx: bytes(r.frame) for r in mm.sample_video_frames(df, every_n=3).collect()}
    assert set(out) == {0, 3}
    assert out[0] == frames[0] and out[3] == frames[3]


def test_g711_and_float_wav_manual_decode():
    """Formats stdlib wave refuses: G.711 mu-law/A-law (numpy LUT per the
    ITU-T expansion) and IEEE-float, via the manual RIFF parser. Spot
    values from the public G.711 tables."""
    import struct

    import numpy as np

    assert mm._ULAW[0xFF] == 0 and mm._ULAW[0x7F] == 0
    assert mm._ULAW[0x80] == 32124 and mm._ULAW[0x00] == -32124
    assert mm._ALAW[0xD5] == 8 and mm._ALAW[0x55] == -8

    codes = np.arange(256, dtype=np.uint8)
    for law, table in (("ulaw", mm._ULAW), ("alaw", mm._ALAW)):
        rate, nch, x = mm.decode_wav(mm.encode_wav_g711(codes, 8000, law))
        assert (rate, nch) == (8000, 1)
        assert np.allclose(x[:, 0] * 32768.0, table[codes])

    f32 = (np.linspace(-0.9, 0.9, 64)).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 2, 16000, 128000, 8, 32)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", f32.nbytes) + f32.tobytes()
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, nch, x = mm.decode_wav(wav)
    assert (rate, nch) == (16000, 2)
    assert np.allclose(x.reshape(-1), f32.astype(np.float64))

    # WAVE_FORMAT_EXTENSIBLE wrapping a mu-law subformat
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8)
    # cbSize=22, validBits=8, channelMask=0, then the 16-byte SubFormat
    # GUID whose first two bytes carry the real format code (7 = mu-law)
    ext += struct.pack("<HHI", 22, 8, 0) + struct.pack("<H", 7) + b"\x00" * 14
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(ext)) + ext
        + b"data" + struct.pack("<I", 4) + bytes([0xFF, 0x80, 0x00, 0x7F])
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, nch, x = mm.decode_wav(wav)
    assert rate == 8000
    assert np.allclose(
        x[:, 0] * 32768.0, mm._ULAW[[0xFF, 0x80, 0x00, 0x7F]]
    )

    # unsupported format code still returns None
    bad = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad)) + bad
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    assert mm.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body) is None
