"""Multimodal columns (SURVEY.md §2.13): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side plumbing is real and tested — schemas, partition-preserving
``mapInPandas`` signatures, batch shapes, metadata extraction from magic
bytes. Codec coverage is split honestly by what the container can decode:

- REAL: uncompressed 24-bit BMP (struct + numpy) and PCM WAV (stdlib
  ``wave`` + numpy linear-interpolation resample) — no third-party codec
  needed, so image feature extraction and audio resampling genuinely
  decode bytes.
- REAL: video demux for BSEQ and uncompressed-DIB AVI (``avi.py`` —
  RIFF chunk-tree walk per the public AVI spec) + every-n frame sampling
  + per-frame image decode (``video_frame_features``) — the full video
  featurizer pipeline on a real-world container.
- REAL: baseline-sequential AND progressive JPEG decode from the public
  T.81 spec (``jpeg.py`` — huffman + dequant + IDCT + chroma upsampling +
  successive-approximation scan machinery in pure numpy), 8-bit PNG
  decode/encode (``png.py`` — stdlib zlib + the five scanline filters),
  and GIF87a/89a first-frame decode (``gif.py`` — full LZW, interlacing,
  palettes), so compressed-image feature extraction genuinely decodes
  bytes. PNG covers 8/16-bit depths and Adam7 interlacing; baseline
  uncompressed TIFF decodes in both byte orders and strip layouts
  (``tiff.py``).
- REAL: FLAC decode/encode from the public spec (``flac.py`` — Rice
  residuals, FIXED/LPC prediction, stereo decorrelation, CRC-8/16), so
  compressed-audio feature extraction and resampling genuinely decode
  bytes; M-JPEG AVI decodes via ``avi.py`` demux + the ``jpeg.py``
  decoder (the one compressed-video codec needing no external library).
- REAL (subset): MPEG-4 Part 2 INTRA video (``mpeg4.py`` — VOL/VOP
  headers, MCBPC/CBPY/DC VLCs, gradient DC prediction, H.263 inverse
  quant, FLC-escaped AC coefficients) decodes I-VOP 'mp4v' tracks
  end-to-end; streams using the B-16 AC VLC table or P/B prediction
  still gate (see mpeg4.py's honest-scope note).
- STUBBED behind ``_require_codec``: compressed-video BITSTREAMS beyond
  M-JPEG and intra mp4v (H.26x, inter-coded MPEG-4 — the AVI and
  MP4/MOV containers themselves demux for real via ``avi.py``/
  ``mp4.py``) and MP3 audio, which need PyAV/ffmpeg absent here. The
  stubs either raise ``NotImplementedError`` (real decode requested) or
  produce a deterministic fake (pipeline testing). Swapping in the
  library changes only the inner function — the distributed shape
  (Arrow batches, no driver collection, spill-safe batch sizes) stays.

Scale posture: content bytes never hit the driver; each executor processes
Arrow record batches (spark.sql.execution.arrow.maxRecordsPerBatch bounds
memory); metadata-only operations (sniffing, size filters) are pure column
expressions that never touch Python.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte signatures → media type; pure JVM-side expression (no UDF)
_MAGIC = {
    "ffd8ff": "image/jpeg",
    "89504e47": "image/png",
    "47494638": "image/gif",
    "52494646": "riff",  # WAV/AVI container — disambiguated by bytes 8-12
    "494433": "audio/mp3",
    "664c6143": "audio/flac",
    "1a45dfa3": "video/webm",
    "4f676753": "audio/ogg",
    "49492a00": "image/tiff",
    "4d4d002a": "image/tiff",
}


def sniff_media_type(content: str | F.Column = "content") -> F.Column:
    """Media type from magic bytes — a column expression, not a UDF."""
    c = F.col(content) if isinstance(content, str) else content
    head = F.lower(F.hex(F.substring(c, 1, 12)))
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC.items()):
        if mtype == "riff":
            is_wave = F.substring(head, 17, 8) == "57415645"  # "WAVE"
            riff = F.when(is_wave, "audio/wav").otherwise("video/avi")
            expr = F.when(head.startswith(magic), riff).otherwise(expr)
        else:
            expr = F.when(head.startswith(magic), F.lit(mtype)).otherwise(expr)
    # ISO BMFF (MP4/MOV): 'ftyp' at byte offset 4, whatever the leading size
    is_bmff = F.substring(head, 9, 8) == "66747970"
    return F.when(is_bmff, F.lit("video/mp4")).otherwise(expr)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach typed metadata columns (media_type, n_bytes, checksum) —
    all JVM-side; the dedup identity generalises X1 to binary payloads."""
    return (
        df.withColumn("media_type", sniff_media_type(content_col))
        .withColumn("n_bytes", F.length(F.col(content_col)).cast("long"))
        .withColumn("checksum", F.sha2(F.col(content_col), 256))
    )


def _require_codec(name: str) -> None:
    raise NotImplementedError(
        f"codec '{name}' not available in this environment — the Spark "
        "plumbing is real; swap in the decode library here"
    )


def decode_bmp(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) into
    (width, height, HxWx3 uint8 BGR array). Returns None for anything
    this pure-python decoder can't handle — callers fall through to the
    codec stub for those. Format per the public BMP spec: 14-byte file
    header (pixel offset at byte 10), 18/22 width/height (positive height
    = bottom-up rows), 28 bpp, 30 compression; rows padded to 4 bytes."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    (off,) = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (comp,) = struct.unpack_from("<I", b, 30)
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    row_bytes = ((24 * w + 31) // 32) * 4
    if off + row_bytes * h > len(b):
        return None
    px = (
        np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=off)
        .reshape(h, row_bytes)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if bottom_up:
        px = px[::-1]
    return w, h, px


def encode_bmp(px: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bmp` (HxWx3 uint8 BGR → 24-bit BMP bytes);
    test-fixture generator and the output leg of a real resize pipeline."""
    h, w, _ = px.shape
    row_bytes = ((24 * w + 31) // 32) * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = px[::-1].reshape(h, w * 3)  # bottom-up rows
    data = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + data


def _decode_any_image(content: bytes) -> tuple[int, int, np.ndarray] | None:
    """Try every real decoder (uncompressed BMP, baseline/progressive
    JPEG, 8-bit PNG, GIF) — (width, height, HxWx3 uint8 BGR) or None for
    unsupported formats."""
    decoded = decode_bmp(content)
    if decoded is None and content[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_baseline

        decoded = decode_jpeg_baseline(content)
    if decoded is None and content[:4] == b"\x89PNG":
        from .png import decode_png

        decoded = decode_png(content)
    if decoded is None and content[:3] == b"GIF":
        from .gif import decode_gif

        decoded = decode_gif(content)
    if decoded is None and content[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff

        decoded = decode_tiff(content)
    if decoded is None and content[:3] == b"\x00\x00\x01":
        from .mpeg4 import decode_mp4v_intra

        decoded = decode_mp4v_intra(content)
    return decoded


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Per-image feature extraction via ``mapInPandas``. Uncompressed BMPs
    baseline and progressive JPEGs, 8-bit PNGs, and GIFs are decoded for
    real (pure numpy — width, height, mean luma from the actual pixels,
    Rec.601 weights; see ``jpeg.py`` / ``png.py`` / ``gif.py`` for the
    from-spec decoders).
    Non-image or unrecognized content: with ``fake=True`` a deterministic
    checksum-derived stand-in keeps the plumbing testable, otherwise the
    decode site raises NotImplementedError."""
    out_schema = f"{id_col} long, width int, height int, mean_luma double"

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                content = bytes(r[content_col])
                decoded = _decode_any_image(content)
                if decoded is not None:
                    w, h, px = decoded
                    luma = (
                        0.114 * px[..., 0]
                        + 0.587 * px[..., 1]
                        + 0.299 * px[..., 2]
                    )
                    rows.append(
                        {
                            id_col: r[id_col],
                            "width": w,
                            "height": h,
                            "mean_luma": float(luma.mean() / 255.0),
                        }
                    )
                    continue
                if not fake:
                    _require_codec("image-decode (unrecognized format)")
                hsh = hashlib.sha256(content).digest()
                rows.append(
                    {
                        id_col: r[id_col],
                        "width": 64 + hsh[0],
                        "height": 64 + hsh[1],
                        "mean_luma": hsh[2] / 255.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_luma"])

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """Nearest-neighbour resize for BMP content — a REAL decode→transform→
    re-encode pipeline in pure numpy (index-grid sampling), emitted as BMP
    bytes again. BMP and baseline JPEG decode; other formats raise at the
    decode site (same stub contract as decode_image_features)."""
    out_schema = f"{id_col} long, width int, height int, content binary"

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                decoded = _decode_any_image(bytes(r[content_col]))
                if decoded is None:
                    _require_codec("image-decode (unrecognized format)")
                w, h, px = decoded
                yi = (np.arange(target_h) * h) // target_h
                xi = (np.arange(target_w) * w) // target_w
                out = px[yi][:, xi]
                rows.append(
                    {
                        id_col: r[id_col],
                        "width": target_w,
                        "height": target_h,
                        "content": encode_bmp(out),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "content"]
            )

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)


BSEQ_MAGIC = b"BSEQ"


def encode_bseq(frames: list[bytes]) -> bytes:
    """Pack frames into the documented BSEQ container: magic + u32 frame
    count + per-frame (u32 length + payload). A deliberately minimal
    video-like container so the DEMUX path (header parse, frame walk,
    every-n sampling) is real and testable without codec libraries —
    the per-frame payloads here are BMPs the real decoder handles."""
    parts = [BSEQ_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def demux_bseq(b: bytes) -> list[bytes] | None:
    """Inverse of :func:`encode_bseq`; None if not a BSEQ payload (callers
    fall through to the codec stub for real video containers)."""
    if len(b) < 8 or b[:4] != BSEQ_MAGIC:
        return None
    (n,) = struct.unpack_from("<I", b, 4)
    off, frames = 8, []
    for _ in range(n):
        if off + 4 > len(b):
            return None
        (ln,) = struct.unpack_from("<I", b, off)
        off += 4
        if off + ln > len(b):
            return None
        frames.append(b[off : off + ln])
        off += ln
    return frames


def _demux_any_video(content: bytes) -> list[bytes] | None:
    """Try every real demuxer (BSEQ container, DIB/M-JPEG AVI, then
    Motion-JPEG MP4/MOV)
    — list of per-frame image byte strings (decodable by
    ``_decode_any_image``) or None for containers needing a codec lib."""
    frames = demux_bseq(content)
    if frames is None and content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        from .avi import demux_avi

        frames = demux_avi(content)
    if frames is None and len(content) >= 12 and content[4:8] == b"ftyp":
        from .mp4 import demux_mp4

        frames = demux_mp4(content)
    return frames


def video_frame_features(
    df: DataFrame,
    every_n: int = 2,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """REAL frame-sampling pipeline: demux the BSEQ container, keep every
    ``every_n``-th frame, decode each kept frame with the real image
    decoders (BMP/JPEG/PNG/GIF) and emit (id, frame_idx, width, height,
    mean_luma) — the 1:N ``mapInPandas`` generator shape a video
    featurizer needs (output rows do not align with input rows; batches
    stream). Containers: BSEQ, DIB/M-JPEG AVI and M-JPEG MP4 demux for real;
    compressed containers hit the codec stub."""
    out_schema = (
        f"{id_col} long, frame_idx int, width int, height int, mean_luma double"
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                content = bytes(r[content_col])
                frames = _demux_any_video(content)
                if frames is None:
                    _require_codec("video-demux (compressed codecs beyond M-JPEG AVI/MP4)")
                for idx in range(0, len(frames), every_n):
                    decoded = _decode_any_image(frames[idx])
                    if decoded is None:
                        _require_codec("video-frame-decode")
                    w, h, px = decoded
                    luma = (
                        0.114 * px[..., 0]
                        + 0.587 * px[..., 1]
                        + 0.299 * px[..., 2]
                    )
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": idx,
                            "width": w,
                            "height": h,
                            "mean_luma": float(luma.mean() / 255.0),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "width", "height", "mean_luma"]
            )

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 30,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1:N mapInPandas —
    the generator shape matters: output batches need not align with input
    rows). Fake mode emits ``n_bytes // (every_n * 1000)`` frames."""
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                content = bytes(r[content_col])
                frames = _demux_any_video(content)
                if frames is not None:  # real demux path (BSEQ / DIB-AVI)
                    for i in range(0, len(frames), every_n):
                        rows.append(
                            {id_col: r[id_col], "frame_idx": i, "frame": frames[i]}
                        )
                    continue
                if not fake:
                    _require_codec("video-demux")
                n_frames = max(1, len(content) // (every_n * 1000))
                for i in range(n_frames):
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": i * every_n,
                            "frame": content[:16],
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)


def _g711_ulaw_table() -> np.ndarray:
    """256-entry μ-law byte → linear int16 table (ITU-T G.711 expansion)."""
    out = np.zeros(256, np.int32)
    for byte in range(256):
        u = ~byte & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out[byte] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _g711_alaw_table() -> np.ndarray:
    """256-entry A-law byte → linear int16 table (ITU-T G.711 expansion)."""
    out = np.zeros(256, np.int32)
    for byte in range(256):
        a = byte ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t += 0x108
            t <<= seg - 1
        out[byte] = t if (a & 0x80) else -t
    return out


_ULAW = _g711_ulaw_table()
_ALAW = _g711_alaw_table()


def _decode_wav_manual(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """RIFF/WAVE parser for the formats stdlib ``wave`` refuses: IEEE
    float (fmt 3), G.711 A-law (6) and μ-law (7), plus their
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrappings."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                return None
            code, nch, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if code == 0xFFFE and len(body) >= 26:
                (code,) = struct.unpack_from("<H", body, 24)  # GUID prefix
            fmt = (code, nch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    code, nch, rate, bits = fmt
    if nch == 0 or rate == 0:
        return None
    if code == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif code == 3 and bits == 64:
        x = np.frombuffer(data, dtype="<f8").astype(np.float64)
    elif code == 7 and bits == 8:  # G.711 μ-law
        x = _ULAW[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    elif code == 6 and bits == 8:  # G.711 A-law
        x = _ALAW[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    else:
        return None
    n = (len(x) // nch) * nch
    return rate, nch, x[:n].reshape(-1, nch)


def _decode_any_audio(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """WAV (stdlib + manual RIFF) then FLAC (from-spec ``flac.py``) —
    (rate, n_channels, float64 samples) or None for codecs genuinely
    needing an external library (MP3)."""
    dec = decode_wav(b)
    if dec is None and b[:4] == b"fLaC":
        from .flac import decode_flac

        dec = decode_flac(b)
    return dec


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """Decode WAV bytes into (sample_rate, n_channels, float64 samples in
    [-1, 1], shape (n_frames, n_channels)). Stdlib ``wave`` handles PCM
    8/16/32-bit; a manual RIFF parser covers IEEE-float and G.711
    μ-law/A-law (numpy LUT expansion). None for non-WAV/other codecs."""
    try:
        with wave.open(io.BytesIO(b)) as wf:
            rate, nch = wf.getframerate(), wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError):
        return _decode_wav_manual(b)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        return _decode_wav_manual(b)
    return rate, nch, x.reshape(-1, nch)


def encode_wav_g711(law_bytes: np.ndarray, rate: int, law: str = "ulaw",
                    n_channels: int = 1) -> bytes:
    """Wrap raw G.711 codeword bytes into a WAV container (fmt 7 = μ-law,
    6 = A-law) — fixture generator for the manual decode path."""
    code = 7 if law == "ulaw" else 6
    payload = law_bytes.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", code, n_channels, rate, rate * n_channels,
                      n_channels, 8)
    out = bytearray(b"RIFF")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    out += struct.pack("<I", len(body)) + body
    return bytes(out)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames, n_channels) float in [-1,1] → 16-bit PCM WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """REAL per-clip audio features from PCM/G.711 WAV or FLAC bytes:
    sample rate, channels, duration, RMS energy, peak amplitude — decoded
    executor-side in Arrow batches. MP3 hits the codec stub."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_channels int, "
        "duration_s double, rms double, peak double"
    )

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                dec = _decode_any_audio(bytes(r[content_col]))
                if dec is None:
                    _require_codec("audio-decode (MP3)")
                rate, nch, x = dec
                rows.append(
                    {
                        id_col: r[id_col],
                        "sample_rate": rate,
                        "n_channels": nch,
                        "duration_s": x.shape[0] / rate,
                        "rms": float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0,
                        "peak": float(np.abs(x).max()) if x.size else 0.0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_channels",
                    "duration_s", "rms", "peak",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)


def resample_audio(
    df: DataFrame,
    target_hz: int = 16_000,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Audio resample via ``mapInPandas``. PCM WAV input is resampled for
    REAL: decode (stdlib wave), per-channel linear interpolation onto the
    target time grid (np.interp — deterministic), re-encode as 16-bit WAV.
    Non-WAV content needs an external codec: fake mode passes bytes
    through with the new rate recorded; otherwise the stub raises."""
    out_schema = f"{id_col} long, sample_rate int, audio binary"

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):  # no per-row Series (iterrows) in the hot path
                content = bytes(r[content_col])
                dec = _decode_any_audio(content)
                if dec is not None:
                    rate, nch, x = dec
                    n_out = max(1, int(round(x.shape[0] * target_hz / rate)))
                    t_out = np.arange(n_out) * (rate / target_hz)
                    t_in = np.arange(x.shape[0], dtype=np.float64)
                    y = np.stack(
                        [np.interp(t_out, t_in, x[:, c]) for c in range(nch)],
                        axis=1,
                    )
                    rows.append(
                        {
                            id_col: r[id_col],
                            "sample_rate": target_hz,
                            "audio": encode_wav(y, target_hz),
                        }
                    )
                    continue
                if not fake:
                    _require_codec("audio-decode (MP3)")
                rows.append(
                    {
                        id_col: r[id_col],
                        "sample_rate": target_hz,
                        "audio": content,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "sample_rate", "audio"])

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)
