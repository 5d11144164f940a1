"""ISO-BMFF (MP4) demux/mux (operators/mp4.py): box walk, sample-table
arithmetic (stsz/stsc/stco expansion), hdlr-based track selection, codec
gating, and malformed-input robustness."""

import struct

import numpy as np
import pytest

from ideafast_etl_spark.operators import mp4 as M
from ideafast_etl_spark.operators.multimodal import (
    _decode_any_image,
    _demux_any_video,
)


def _frames(n, w=4, h=3, base=10):
    return [np.full((h, w, 3), (base + 7 * j) % 256, np.uint8) for j in range(n)]


def test_roundtrip_video_only():
    frames = _frames(5)
    b = M.encode_mp4(frames)
    out = M.demux_mp4(b)
    assert out is not None and len(out) == 5
    for j, f in enumerate(out):
        w, h, px = _decode_any_image(f)
        assert (w, h) == (4, 3)
        assert int(px[0, 0, 0]) == (10 + 7 * j) % 256  # flat gray, exact


def test_track_selection_skips_audio():
    """The audio trak comes FIRST in moov; hdlr 'vide' selection must skip
    it, and sample offsets must skip the interleaved audio chunks."""
    frames = _frames(7, base=33)
    b = M.encode_mp4(frames, audio_track=True)
    out = M.demux_mp4(b)
    assert out is not None and len(out) == 7
    assert all(f[:2] == b"\xff\xd8" for f in out)
    _, _, px = _decode_any_image(out[6])
    assert int(px[0, 0, 0]) == (33 + 7 * 6) % 256


def test_stsc_run_expansion():
    """Odd frame count -> a final 1-sample chunk after 2-sample chunks;
    the stsc table carries two runs that must expand correctly."""
    for n in (1, 2, 3, 4, 9):
        out = M.demux_mp4(M.encode_mp4(_frames(n)))
        assert out is not None and len(out) == n


def test_stream_info():
    b = M.encode_mp4(_frames(6), fps=25, audio_track=True)
    info = M.mp4_stream_info(b)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (4, 3)
    assert info["n_frames"] == 6
    assert info["duration_s"] == pytest.approx(6 / 25)
    assert info["media_bytes"] == sum(
        len(f) for f in M.demux_mp4(b)
    )


def test_unsupported_codec_returns_none():
    """Patch the sample-entry fourcc to avc1: container parses but the
    bitstream genuinely needs a codec library -> None (stub path)."""
    b = bytearray(M.encode_mp4(_frames(2)))
    idx = bytes(b).find(b"jpeg", 100)  # the stsd sample-entry fourcc
    b[idx : idx + 4] = b"avc1"
    assert M.demux_mp4(bytes(b)) is None
    assert M.mp4_stream_info(bytes(b))["codec"] == "avc1"


def test_malformed_inputs_never_raise():
    good = M.encode_mp4(_frames(3))
    assert M.demux_mp4(b"") is None
    assert M.demux_mp4(b"\x00" * 40) is None
    assert M.demux_mp4(good[:20]) is None  # truncated: no moov
    # truncate mid-mdat: moov missing -> None
    assert M.demux_mp4(good[: len(good) // 2]) is None
    # corrupt a box size
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, 0xFFFFFFF0)
    assert M.demux_mp4(bytes(bad)) is None


def test_demux_any_video_routes_mp4():
    frames = _frames(4, base=90)
    out = _demux_any_video(M.encode_mp4(frames, audio_track=True))
    assert out is not None and len(out) == 4


def test_sniff_media_type_mp4(spark):
    from ideafast_etl_spark.operators.multimodal import sniff_media_type

    rows = [
        (0, bytearray(M.encode_mp4(_frames(1)))),
        (1, bytearray(b"RIFF\x00\x00\x00\x00AVI LIST")),
        (2, bytearray(b"\xff\xd8\xff\xe0 jpeg")),
    ]
    df = spark.createDataFrame(rows, ["i", "content"])
    got = {
        r.i: r.mt
        for r in df.select("i", sniff_media_type("content").alias("mt")).collect()
    }
    assert got == {0: "video/mp4", 1: "video/avi", 2: "image/jpeg"}
