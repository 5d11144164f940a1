"""Minimal AVI (RIFF) demuxer/muxer for uncompressed-DIB and M-JPEG video
(SURVEY.md §2.13 — real-world video-container leg).

AVI is a RIFF container (public Microsoft 'AVI RIFF File Reference'):
``RIFF('AVI ' LIST('hdrl' avih strl...) LIST('movi' 00db...) [idx1])``.
This demuxer walks the chunk tree, identifies the FIRST 'vids' stream by
its strl position (stream chunk ids are the strl ordinal, per spec), reads
the frame geometry from that stream's ``BITMAPINFOHEADER``, and collects
only that stream's movi chunks — an interleaved audio/text stream can no
longer pollute the frame list. Two codecs decode for real:

- BI_RGB (compression 0): '..db' DIB pixel chunks, re-wrapped as
  standalone BMP files for the shared image decoders.
- MJPG (fourcc 'MJPG'): each '..dc'/'..db' chunk is a complete baseline
  JPEG (OpenDML M-JPEG), returned as-is — ``jpeg.py`` decodes it. This is
  the one compressed-video codec that needs no external library.

Anything else (H.264/MPEG-4 etc.) returns None — that genuinely needs
ffmpeg and stays behind the codec stub.

The muxer writes both shapes (DIB or MJPG frames, fixed fps) for fixtures
and the re-encode leg. Frame payloads match what any AVI tool producing
"full frames (uncompressed)" or "Motion-JPEG" emits.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import decode_bmp, encode_bmp

_MJPG = struct.unpack("<I", b"MJPG")[0]


def _bmp_wrap(dib: bytes, w: int, h: int) -> bytes:
    """Wrap raw bottom-up BI_RGB pixel data in BMP file + info headers."""
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(dib), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(dib), 0, 0, 0, 0)
    return header + dib


def demux_avi(b: bytes) -> list[bytes] | None:
    """Demux a DIB or M-JPEG AVI into per-frame image byte strings (BMP
    for DIB streams, JPEG for MJPG streams). Returns None for non-AVI,
    unsupported-codec, or malformed input — never raises (untrusted
    binary column contract)."""
    try:
        return _demux(b)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _demux(b: bytes) -> list[bytes] | None:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    w = h = None
    compression = None
    # Stream chunk-id prefixes are the strl ordinal ('00db' = stream 0);
    # track which strl is the first 'vids' stream and collect only its
    # chunks, so interleaved audio/text streams can't corrupt frame order.
    stream_counter = 0
    video_stream = None  # strl ordinal of the first 'vids' stream
    awaiting_video_strf = False  # last strh seen was that video stream's
    frames: list[tuple[bytes, bytes]] = []  # (chunk suffix, payload)

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, compression
        nonlocal stream_counter, video_stream, awaiting_video_strf
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + clen, end)
            if cid == b"LIST":
                walk(body_start + 4, body_end)  # skip the list type fourcc
            elif cid == b"strh" and clen >= 4:
                fcc = b[body_start : body_start + 4]
                awaiting_video_strf = fcc == b"vids" and video_stream is None
                if awaiting_video_strf:
                    video_stream = stream_counter
                stream_counter += 1
            elif cid == b"strf" and awaiting_video_strf and clen >= 40:
                (_sz, bw, bh, _planes, bits, comp) = struct.unpack_from(
                    "<IiiHHI", b, body_start
                )
                if comp == _MJPG or bits == 24:
                    w, h, compression = bw, abs(bh), comp
                awaiting_video_strf = False
            elif (
                video_stream is not None
                and cid[:2] == b"%02d" % video_stream
                and cid[2:4] in (b"db", b"dc")
            ):
                frames.append((cid[2:4], b[body_start:body_end]))
            pos = body_start + clen + (clen & 1)  # chunks are word-aligned

    (riff_len,) = struct.unpack_from("<I", b, 4)
    walk(12, min(8 + riff_len, len(b)))
    if w is None or h is None or not frames:
        return None
    if compression == _MJPG:
        # OpenDML M-JPEG: every chunk ('..dc' or '..db') is a standalone
        # baseline JPEG
        if any(f[:2] != b"\xff\xd8" for _sfx, f in frames):
            return None
        return [f for _sfx, f in frames]
    if compression != 0:
        return None  # other codecs genuinely need a codec library
    # BI_RGB declared: a compressed-suffix chunk contradicts the header
    if any(sfx != b"db" for sfx, _f in frames):
        return None
    row_bytes = ((24 * w + 31) // 32) * 4
    if any(len(f) < row_bytes * h for _sfx, f in frames):
        return None
    return [_bmp_wrap(f, w, h) for _sfx, f in frames]


def encode_avi(
    frames_px: list[np.ndarray],
    fps: int = 25,
    codec: str = "DIB ",
    audio_stream: bool = False,
) -> bytes:
    """Mux HxWx3 uint8 BGR frames into an AVI. ``codec`` is 'DIB '
    (uncompressed bottom-up BI_RGB) or 'MJPG' (each frame baseline-JPEG
    encoded — OpenDML Motion-JPEG). ``audio_stream`` prepends a PCM
    'auds' stream (strl ordinal 0) with interleaved '00wb' chunks, making
    the video stream ordinal 1 — the demuxer must track strl order to
    survive that layout."""
    assert frames_px, "need at least one frame"
    h, w = frames_px[0].shape[:2]
    if codec == "MJPG":
        from .jpeg import encode_jpeg_baseline

        payloads = [encode_jpeg_baseline(px) for px in frames_px]
        comp, bits, suffix = _MJPG, 24, b"dc"
    else:
        payloads = [encode_bmp(px)[54:] for px in frames_px]  # strip header
        comp, bits, suffix = 0, 24, b"db"
    buf_size = max(len(d) for d in payloads)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n_streams = 2 if audio_stream else 1
    vid_idx = 1 if audio_stream else 0
    # avih: usec/frame, max bytes/sec, padding, flags, total frames,
    # initial frames, streams, suggested buffer, width, height, reserved×4
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, buf_size * fps, 0, 0,
        len(payloads), 0, n_streams, buf_size, w, h, 0, 0, 0, 0,
    )
    # strh: fccType, fccHandler, flags, priority, language, initial frames,
    # scale, rate, start, length, buffer, quality, sample size, rcFrame
    strh = (
        b"vids"
        + codec.encode("ascii")
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(payloads), buf_size, 0, 0
        )
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bits, comp, len(payloads[0]), 0, 0, 0, 0
    )
    strl_v = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    strls = strl_v
    audio_payload = b""
    if audio_stream:
        # mono 8 kHz 16-bit PCM: strh 'auds' + WAVEFORMATEX strf
        samples_per_frame = 8000 // fps
        strh_a = (
            b"auds"
            + b"\x00\x00\x00\x00"
            + struct.pack(
                "<IHHIIIIIIII",
                0, 0, 0, 0, 1, 8000, 0,
                samples_per_frame * len(payloads), samples_per_frame * 2, 0, 2,
            )
            + struct.pack("<4H", 0, 0, 0, 0)
        )
        strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        strls = (
            lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
            + strl_v
        )
        audio_payload = b"\x00" * (samples_per_frame * 2)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    vid_cid = b"%02d" % vid_idx + suffix
    movi_chunks = []
    for d in payloads:
        if audio_stream:  # interleave audio ahead of each video chunk
            movi_chunks.append(chunk(b"00wb", audio_payload))
        movi_chunks.append(chunk(vid_cid, d))
    movi = lst(b"movi", b"".join(movi_chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
