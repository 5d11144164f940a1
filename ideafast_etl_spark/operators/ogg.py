"""Minimal Ogg container walker (SURVEY.md §2.13 — audio-container leg
next to WAV/FLAC/MP3): page-level metadata per the public spec (RFC 3533),
codec identification from BOS packets (RFC 7845 Opus, Vorbis I spec),
duration from the terminal granule position.

An Ogg stream is a sequence of pages: ``"OggS" version(1) flags(1)
granule(8 LE) serial(4) page_seq(4) crc(4) n_segs(1) lacing[n_segs]
payload``. The first page of a logical stream (flag 0x02 BOS) starts with
the codec's magic: ``OpusHead`` (channel count at byte 9, pre-skip u16 LE
at 10, granules fixed at 48 kHz), ``\\x01vorbis`` (channels at byte 11,
rate u32 LE at 12). The LAST page's granule position gives the stream
length in granule units — so duration costs a header walk, no packet
decode. Opus/Vorbis PCM synthesis genuinely needs libopus/libvorbis and
stays behind the codec stub.
"""

from __future__ import annotations

import struct


def ogg_stream_info(b: bytes) -> dict | None:
    """Walk every Ogg page. Returns codec, channels, rate, granule-derived
    duration, page/stream counts — or None for non-Ogg input. Never
    raises (untrusted binary column contract); CRCs are not validated
    (this is an index scan, not an integrity check)."""
    try:
        if len(b) < 27 or b[:4] != b"OggS":
            return None
        pos = 0
        n_pages = 0
        streams: dict[int, dict] = {}
        while pos + 27 <= len(b):
            if b[pos : pos + 4] != b"OggS":
                break  # trailing junk after the last whole page
            flags = b[pos + 5]
            (granule,) = struct.unpack_from("<q", b, pos + 6)
            (serial,) = struct.unpack_from("<I", b, pos + 14)
            n_segs = b[pos + 26]
            lace_end = pos + 27 + n_segs
            if lace_end > len(b):
                break
            payload_len = sum(b[pos + 27 : lace_end])
            payload = b[lace_end : lace_end + payload_len]
            if lace_end + payload_len > len(b):
                break
            n_pages += 1
            st = streams.setdefault(
                serial,
                {"codec": "", "channels": 0, "rate": 0, "granule": 0,
                 "pre_skip": 0},
            )
            if flags & 0x02:  # BOS: codec magic leads the first packet
                if payload[:8] == b"OpusHead" and len(payload) >= 12:
                    st["codec"] = "opus"
                    st["channels"] = payload[9]
                    (st["pre_skip"],) = struct.unpack_from("<H", payload, 10)
                    st["rate"] = 48000  # Opus granules are always 48 kHz
                elif payload[:7] == b"\x01vorbis" and len(payload) >= 16:
                    st["codec"] = "vorbis"
                    st["channels"] = payload[11]
                    (st["rate"],) = struct.unpack_from("<I", payload, 12)
                elif payload[:5] == b"\x7fFLAC":
                    st["codec"] = "flac"
            if granule > 0:
                st["granule"] = max(st["granule"], granule)
            pos = lace_end + payload_len
        if n_pages == 0 or not streams:
            return None
        # primary stream: the first audio stream with a recognized codec
        primary = next(
            (s for s in streams.values() if s["codec"]),
            next(iter(streams.values())),
        )
        rate = primary["rate"]
        samples = max(0, primary["granule"] - primary["pre_skip"])
        return {
            "codec": primary["codec"] or "unknown",
            "channels": int(primary["channels"]),
            "sample_rate": int(rate),
            "duration_s": (samples / rate) if rate else 0.0,
            "n_pages": n_pages,
            "n_streams": len(streams),
        }
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


# --------------------------------------------------------------------------
# fixture muxer
# --------------------------------------------------------------------------


def _page(
    flags: int, granule: int, serial: int, seq: int, payload: bytes
) -> bytes:
    """One Ogg page; 255-byte lacing; CRC written as 0 (the walker is an
    index scan and does not validate integrity)."""
    segs = []
    rest = payload
    while len(rest) >= 255:
        segs.append(255)
        rest = rest[255:]
    segs.append(len(rest))
    head = (
        b"OggS\x00"
        + bytes([flags])
        + struct.pack("<q", granule)
        + struct.pack("<II", serial, seq)
        + struct.pack("<I", 0)
        + bytes([len(segs)])
        + bytes(segs)
    )
    return head + payload


def encode_ogg_stub(
    codec: str = "opus",
    duration_s: float = 1.0,
    rate: int = 48000,
    channels: int = 2,
    pre_skip: int = 312,
    serial: int = 0x1234,
) -> bytes:
    """Spec-shaped Ogg fixture: BOS page with the codec ID header, one
    opaque data page, and an EOS page whose granule encodes the duration.
    Packet payloads are deliberately opaque — the page index is the real,
    decodable part without libopus/libvorbis."""
    if codec == "opus":
        head = (
            b"OpusHead\x01"
            + bytes([channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", rate)  # input rate (informational)
            + struct.pack("<h", 0)
            + b"\x00"
        )
        granule_rate = 48000
        final_granule = int(round(duration_s * granule_rate)) + pre_skip
    elif codec == "vorbis":
        head = (
            b"\x01vorbis"
            + struct.pack("<I", 0)
            + bytes([channels])
            + struct.pack("<I", rate)
            + struct.pack("<iii", -1, rate, -1)
            + b"\x01"
        )
        pre_skip = 0
        final_granule = int(round(duration_s * rate))
    else:
        raise ValueError(f"fixture codec {codec!r} not supported")
    return (
        _page(0x02, 0, serial, 0, head)
        + _page(0, final_granule // 2, serial, 1, b"\x00" * 64)
        + _page(0x04, final_granule, serial, 2, b"\x00" * 32)
    )
