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
