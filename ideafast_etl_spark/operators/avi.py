"""Minimal AVI (RIFF) demuxer/muxer for uncompressed DIB video
(SURVEY.md §2.13 — real-world video-container leg).

AVI is a RIFF container (public Microsoft 'AVI RIFF File Reference'):
``RIFF('AVI ' LIST('hdrl' avih strl...) LIST('movi' 00db...) [idx1])``.
This demuxer walks the chunk tree, reads the frame geometry from the
stream-format ``BITMAPINFOHEADER``, and yields each uncompressed video
frame ('..db' chunks, BI_RGB bottom-up DIB pixel data) re-wrapped as a
standalone BMP file so the shared image decoders handle it. Compressed
streams ('..dc' with a non-RGB codec) return None — that genuinely needs
ffmpeg and stays behind the codec stub.

The muxer writes the same shape (DIB frames, fixed fps) for fixtures and
the re-encode leg. Frame payloads match what any AVI tool producing
"full frames (uncompressed)" emits.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import decode_bmp, encode_bmp


def _bmp_wrap(dib: bytes, w: int, h: int) -> bytes:
    """Wrap raw bottom-up BI_RGB pixel data in BMP file + info headers."""
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(dib), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(dib), 0, 0, 0, 0)
    return header + dib


def demux_avi(b: bytes) -> list[bytes] | None:
    """Demux an uncompressed-DIB AVI into per-frame BMP byte strings.
    Returns None for non-AVI, compressed-codec, or malformed input —
    never raises (untrusted binary column contract)."""
    try:
        return _demux(b)
    except (struct.error, IndexError, ValueError):
        return None


def _demux(b: bytes) -> list[bytes] | None:
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    w = h = None
    compression = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, compression
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + clen, end)
            if cid == b"LIST":
                walk(body_start + 4, body_end)  # skip the list type fourcc
            elif cid == b"strf" and w is None and clen >= 40:
                (_sz, bw, bh, _planes, bits, comp) = struct.unpack_from(
                    "<IiiHHI", b, body_start
                )
                if bits == 24:
                    w, h, compression = bw, abs(bh), comp
            elif cid[2:4] == b"db" and cid[:2].isdigit():
                frames.append(b[body_start:body_end])
            elif cid[2:4] == b"dc" and cid[:2].isdigit():
                frames.append(None)  # compressed frame marker
            pos = body_start + clen + (clen & 1)  # chunks are word-aligned

    (riff_len,) = struct.unpack_from("<I", b, 4)
    walk(12, min(8 + riff_len, len(b)))
    if w is None or h is None or not frames:
        return None
    if compression != 0 or any(f is None for f in frames):
        return None  # compressed stream: genuinely needs a codec library
    row_bytes = ((24 * w + 31) // 32) * 4
    if any(len(f) < row_bytes * h for f in frames):
        return None
    return [_bmp_wrap(f, w, h) for f in frames]


def encode_avi(frames_px: list[np.ndarray], fps: int = 25) -> bytes:
    """Mux HxWx3 uint8 BGR frames into an uncompressed-DIB AVI."""
    assert frames_px, "need at least one frame"
    h, w = frames_px[0].shape[:2]
    dibs = [encode_bmp(px)[54:] for px in frames_px]  # strip BMP header
    buf_size = max(len(d) for d in dibs)

    # avih: usec/frame, max bytes/sec, padding, flags, total frames,
    # initial frames, streams, suggested buffer, width, height, reserved×4
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, buf_size * fps, 0, 0,
        len(dibs), 0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    # strh: fccType, fccHandler, flags, priority, language, initial frames,
    # scale, rate, start, length, buffer, quality, sample size, rcFrame
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(dibs), buf_size, 0, 0
        )
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(dibs[0]), 0, 0, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
