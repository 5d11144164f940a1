"""Minimal TIFF codec (SURVEY.md §2.13 — fifth real image-decode leg next
to BMP/JPEG/PNG/GIF): baseline uncompressed TIFF per the public TIFF 6.0
spec — both byte orders ('II' little / 'MM' big endian), strip layout,
8-bit grayscale and RGB.

TIFF is an IFD (tag directory) format: header ``II*\\0``/``MM\\0*`` +
first-IFD offset; the IFD is ``count u16`` then 12-byte entries
``(tag u16, type u16, count u32, value-or-offset u32)``. The decoder
reads the baseline tags (width 256, height 257, bits 258, compression
259, photometric 262, strip offsets 273, samples/pixel 277, rows/strip
278, strip byte counts 279), concatenates the strips and reshapes.
LZW/PackBits/JPEG-compressed TIFFs return None (compression 1 only —
honest scope; the adjacent codecs cover the compressed formats).

The encoder writes single- or multi-strip uncompressed files in either
byte order for fixtures and the re-encode leg.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(b: bytes, off: int, e: str) -> dict[int, list[int]] | None:
    if off + 2 > len(b):
        return None
    (n,) = struct.unpack_from(e + "H", b, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        p = off + 2 + 12 * i
        if p + 12 > len(b):
            return None
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, p)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        total = size * cnt
        vp = p + 8
        if total > 4:
            (vp,) = struct.unpack_from(e + "I", b, p + 8)
        if vp + total > len(b):
            return None
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # rationals/ascii not needed for baseline decode
        tags[tag] = list(struct.unpack_from(e + str(cnt) + fmt, b, vp))
    return tags


def decode_tiff(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """(width, height, HxWx3 uint8 BGR) for baseline uncompressed TIFF;
    None for compressed/exotic variants or malformed input — never
    raises (untrusted binary column contract)."""
    try:
        if len(b) < 8:
            return None
        if b[:4] == b"II*\x00":
            e = "<"
        elif b[:4] == b"MM\x00*":
            e = ">"
        else:
            return None
        (ifd_off,) = struct.unpack_from(e + "I", b, 4)
        tags = _read_ifd(b, ifd_off, e)
        if tags is None:
            return None
        w = tags.get(256, [0])[0]
        h = tags.get(257, [0])[0]
        compression = tags.get(259, [1])[0]
        photometric = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bits = tags.get(258, [8])
        offsets = tags.get(273)
        counts = tags.get(279)
        if (
            not w or not h or compression != 1 or offsets is None
            or counts is None or len(offsets) != len(counts)
            or any(x != 8 for x in bits)
            or photometric not in (1, 2)
            or spp not in (1, 3)
            or (photometric == 2) != (spp == 3)
        ):
            return None
        data = b"".join(
            b[o : o + c] for o, c in zip(offsets, counts)
        )
        if len(data) < w * h * spp:
            return None
        px = np.frombuffer(
            data, dtype=np.uint8, count=w * h * spp
        ).reshape(h, w, spp)
        if spp == 1:
            px = np.repeat(px, 3, axis=2)
        else:
            px = px[..., ::-1]  # TIFF stores RGB; engine convention is BGR
        return w, h, np.ascontiguousarray(px)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def encode_tiff(
    px: np.ndarray, big_endian: bool = False, rows_per_strip: int | None = None
) -> bytes:
    """HxWx3 uint8 BGR → baseline uncompressed RGB TIFF; multi-strip when
    ``rows_per_strip`` is set (exercises the strip walk)."""
    h, w, _ = px.shape
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    rgb = px[..., ::-1].tobytes()
    strips = [
        rgb[r * w * 3 : min(r + rps, h) * w * 3]
        for r in range(0, h, rps)
    ]
    n_strips = len(strips)

    header = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        e + "I", 8
    )
    entries = []  # (tag, type, count, value) — offsets patched below
    extra = bytearray()  # out-of-line values + strip data, after the IFD

    def entry(tag: int, typ: int, values: list[int]) -> None:
        size = _TYPE_SIZES[typ] * len(values)
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = struct.pack(e + str(len(values)) + fmt, *values)
            packed += b"\x00" * (4 - size)
            entries.append((tag, typ, len(values), packed, None))
        else:
            entries.append((tag, typ, len(values), None, list(values)))

    n_entries = 8
    ifd_size = 2 + 12 * n_entries + 4
    data_start = 8 + ifd_size

    # lay out out-of-line arrays first, then strip data
    strip_offsets: list[int] = []
    pending: list[tuple[int, int, int, list[int]]] = []

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8, 8, 8])
    entry(259, 3, [1])
    entry(262, 3, [2])
    entry(273, 4, [0] * n_strips)  # patched
    entry(277, 3, [3])
    entry(279, 4, [len(s) for s in strips])

    # resolve out-of-line value offsets
    blobs: list[bytes] = []
    resolved = []
    cursor = data_start
    for tag, typ, cnt, inline, values in entries:
        if inline is not None:
            resolved.append((tag, typ, cnt, inline))
            continue
        fmt = {3: "H", 4: "I"}[typ]
        blob = struct.pack(e + str(cnt) + fmt, *values)
        resolved.append((tag, typ, cnt, struct.pack(e + "I", cursor)))
        blobs.append(blob)
        if tag == 273:
            patch_index = len(blobs) - 1
        cursor += len(blob)
    strip_base = cursor
    off = strip_base
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    # patch the strip-offset blob now that positions are known
    for i, (tag, typ, cnt, _v) in enumerate(resolved):
        if tag == 273 and cnt == n_strips:
            fmt = {3: "H", 4: "I"}[typ]
            if _TYPE_SIZES[typ] * cnt <= 4:
                packed = struct.pack(e + str(cnt) + fmt, *strip_offsets)
                resolved[i] = (tag, typ, cnt, packed + b"\x00" * (4 - len(packed)))
            else:
                blobs[patch_index] = struct.pack(
                    e + str(cnt) + fmt, *strip_offsets
                )

    ifd = struct.pack(e + "H", n_entries)
    for tag, typ, cnt, val in sorted(resolved):
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(e + "I", 0)  # no next IFD
    return header + ifd + b"".join(blobs) + b"".join(strips)
