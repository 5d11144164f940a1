"""AVI demux (operators/avi.py) and its place in the video pipeline."""

import struct

import numpy as np
import pytest

from ideafast_etl_spark.operators import multimodal as mm
from ideafast_etl_spark.operators.avi import demux_avi, encode_avi


def test_roundtrip_exact_including_row_padding():
    rng = np.random.default_rng(9)
    for shape in ((6, 10), (3, 5), (1, 1), (7, 3)):  # odd widths pad rows
        frames = [
            rng.integers(0, 256, (*shape, 3), np.uint8) for _ in range(4)
        ]
        out = demux_avi(encode_avi(frames, fps=10))
        assert out is not None and len(out) == 4
        for orig, bmp in zip(frames, out):
            w, h, px = mm.decode_bmp(bmp)
            assert (w, h) == (shape[1], shape[0])
            assert np.array_equal(px, orig)


def test_demux_rejects_non_avi_and_compressed():
    assert demux_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert demux_avi(b"nope") is None
    good = encode_avi([np.full((4, 4, 3), 7, np.uint8)])
    assert demux_avi(good[:40]) is None  # truncated before movi
    # flip the strf compression field to a codec fourcc → None
    bad = bytearray(good)
    i = bad.find(b"strf")
    # BITMAPINFOHEADER biCompression is at strf body offset 16
    struct.pack_into("<I", bad, i + 8 + 16, 0x34363248)  # 'H264'
    assert demux_avi(bytes(bad)) is None
    # a '00dc' (compressed) frame chunk → None
    bad = bytearray(good)
    j = bad.find(b"00db")
    bad[j : j + 4] = b"00dc"
    assert demux_avi(bytes(bad)) is None


def test_video_frame_features_demuxes_avi(spark):
    frames = [np.full((2, 3, 3), 50 * (j + 1), np.uint8) for j in range(5)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames)))], "asset_id long, content binary"
    )
    got = sorted(
        (r["frame_idx"], r["width"], r["height"], r["mean_luma"])
        for r in mm.video_frame_features(df, every_n=2).collect()
    )
    assert [g[0] for g in got] == [0, 2, 4]
    for idx, w, h, luma in got:
        assert (w, h) == (3, 2)
        assert luma == pytest.approx(50 * (idx + 1) / 255.0, abs=1e-9)


def test_sample_video_frames_yields_decodable_avi_frames(spark):
    frames = [np.full((2, 2, 3), 9 * j, np.uint8) for j in range(4)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames)))], "asset_id long, content binary"
    )
    out = mm.sample_video_frames(df, every_n=3).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 3]
    for r in out:
        w, h, px = mm.decode_bmp(bytes(r["frame"]))
        assert (w, h) == (2, 2)
        assert np.all(px == 9 * r["frame_idx"])


def test_sniff_identifies_avi_container(spark):
    b = encode_avi([np.full((2, 2, 3), 1, np.uint8)])
    df = spark.createDataFrame([(bytearray(b),)], "content binary")
    got = df.select(mm.sniff_media_type("content").alias("t")).first()["t"]
    assert got == "video/avi"
