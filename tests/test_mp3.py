"""MPEG audio frame-header walker (operators/mp3.py): framing arithmetic,
ID3 handling, resync, truncation, VBR/Xing detection."""

import struct

from ideafast_etl_spark.operators.mp3 import (
    _parse_header,
    encode_mp3_silence,
    mp3_stream_info,
)


def test_cbr_mpeg1():
    info = mp3_stream_info(encode_mp3_silence(10))
    assert info["version"] == "1" and info["layer"] == 3
    assert info["n_frames"] == 10 and info["mode"] == "CBR"
    # 128 kbps @ 44.1 kHz: floor(144*128000/44100) = 417 bytes/frame
    assert info["audio_bytes"] == 10 * 417
    assert abs(info["duration_s"] - 10 * 1152 / 44100) < 1e-12


def test_lsf_mpeg2_spf_halved():
    info = mp3_stream_info(
        encode_mp3_silence(8, bitrate_kbps=64, sample_rate=22050)
    )
    assert info["version"] == "2"
    assert abs(info["duration_s"] - 8 * 576 / 22050) < 1e-12
    assert info["audio_bytes"] == 8 * (72 * 64000 // 22050)


def test_id3_tags_skipped_and_flagged():
    b = encode_mp3_silence(6, id3v2_bytes=200, id3v1=True)
    info = mp3_stream_info(b)
    assert info["has_id3v2"] and info["has_id3v1"]
    assert info["n_frames"] == 6
    assert info["audio_bytes"] == 6 * 417  # tags excluded


def test_resync_past_leading_junk():
    info = mp3_stream_info(b"\x00garbage\x12" + encode_mp3_silence(4))
    assert info is not None and info["n_frames"] == 4


def test_truncated_final_frame_not_counted():
    b = encode_mp3_silence(5)
    assert mp3_stream_info(b[:-10])["n_frames"] == 4


def test_vbr_by_bitrate_change():
    b = encode_mp3_silence(3) + encode_mp3_silence(3, bitrate_kbps=192)
    info = mp3_stream_info(b)
    assert info["mode"] == "VBR" and info["n_frames"] == 6


def test_xing_header_overrides_frame_count():
    """Plant a Xing tag (stereo MPEG-1 offset: 4 + 32) declaring 1000
    frames in the first frame; the declared count wins for duration."""
    b = bytearray(encode_mp3_silence(5, bitrate_kbps=320))
    p = 4 + 32
    b[p : p + 4] = b"Xing"
    struct.pack_into(">II", b, p + 4, 0x1, 1000)
    info = mp3_stream_info(bytes(b))
    assert info["n_frames"] == 1000 and info["mode"] == "VBR"
    assert abs(info["duration_s"] - 1000 * 1152 / 44100) < 1e-9


def test_layer1_layer2_header_arithmetic():
    # Layer II, MPEG-1, 192 kbps @ 48 kHz: 144*192000/48000 = 576
    h2 = (0x7FF << 21) | (0b11 << 19) | (0b10 << 17) | (1 << 16) | (10 << 12) | (1 << 10)
    flen, ver, layer, br, rate, _ = _parse_header(struct.pack(">I", h2) + b"\x00" * 4, 0)
    assert (ver, layer, br, rate, flen) == ("1", 2, 192, 48000, 576)
    # Layer I, MPEG-1, 256 kbps @ 44.1 kHz, padding: (12*256000//44100 + 1)*4
    h1 = (0x7FF << 21) | (0b11 << 19) | (0b11 << 17) | (1 << 16) | (8 << 12) | (0 << 10) | (1 << 9)
    flen, ver, layer, br, rate, _ = _parse_header(struct.pack(">I", h1) + b"\x00" * 4, 0)
    assert (ver, layer, br, rate) == ("1", 1, 256, 44100)
    assert flen == (12 * 256000 // 44100 + 1) * 4


def test_non_mpeg_returns_none():
    assert mp3_stream_info(b"") is None
    assert mp3_stream_info(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert mp3_stream_info(b"\xff\xff" * 100) is None  # sync but bad fields
