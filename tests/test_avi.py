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


def test_mjpeg_avi_roundtrip_exact_for_flat_frames():
    """MJPG codec: each chunk is a standalone baseline JPEG; flat q=8
    frames decode bit-exactly through the from-spec JPEG decoder."""
    from ideafast_etl_spark.operators.jpeg import decode_jpeg_baseline

    frames = [np.full((6, 10, 3), 40 * j + 20, np.uint8) for j in range(3)]
    out = demux_avi(encode_avi(frames, codec="MJPG"))
    assert out is not None and len(out) == 3
    for orig, jpg in zip(frames, out):
        assert jpg[:2] == b"\xff\xd8"
        w, h, px = decode_jpeg_baseline(jpg)
        assert (w, h) == (10, 6)
        assert np.array_equal(px, orig)


def test_multistream_avi_tracks_video_stream_ordinal():
    """With a PCM audio stream ahead of the video strl, video chunks are
    '01db'/'01dc' — the demuxer must collect stream 1 only and ignore the
    interleaved '00wb' audio chunks (round-5 ADVICE fix)."""
    frames = [np.full((4, 4, 3), 80 * j, np.uint8) for j in range(3)]
    for codec in ("DIB ", "MJPG"):
        b = encode_avi(frames, codec=codec, audio_stream=True)
        assert b.find(b"01db") > 0 or b.find(b"01dc") > 0
        assert b.find(b"00wb") > 0
        out = demux_avi(b)
        assert out is not None and len(out) == 3, codec


def test_mjpeg_with_wrong_payload_rejected():
    b = bytearray(encode_avi([np.full((4, 4, 3), 5, np.uint8)], codec="MJPG"))
    j = b.find(b"00dc")
    b[j + 8 : j + 10] = b"XX"  # corrupt the SOI marker
    assert demux_avi(bytes(b)) is None
