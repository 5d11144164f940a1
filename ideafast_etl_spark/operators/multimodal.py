"""Multimodal columns (SURVEY.md §2.13): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side plumbing is real and tested — schemas, partition-preserving
``mapInPandas`` signatures, batch shapes, metadata extraction from magic
bytes. The actual codec work (JPEG decode, resampling, frame extraction) is
STUBBED behind ``_require_codec`` because the image/audio libraries are not
in this container: the stubs either raise ``NotImplementedError`` (real
decode) or produce a deterministic fake (pipeline testing). Swapping in
Pillow/torchaudio/PyAV changes only the inner function — the distributed
shape (Arrow batches, no driver collection, spill-safe batch sizes) stays.

Scale posture: content bytes never hit the driver; each executor processes
Arrow record batches (spark.sql.execution.arrow.maxRecordsPerBatch bounds
memory); metadata-only operations (sniffing, size filters) are pure column
expressions that never touch Python.
"""

from __future__ import annotations

from collections.abc import Iterator

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
    return expr


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


def decode_image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Per-image feature extraction via ``mapInPandas``. With ``fake=True``
    a deterministic stand-in derives (width, height, mean_luma) from the
    checksum so downstream plumbing is testable; otherwise raises
    NotImplementedError at the decode site (STUB — no PIL here)."""
    out_schema = f"{id_col} long, width int, height int, mean_luma double"

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                _require_codec("image-decode")
            rows = []
            for _, r in pdf.iterrows():
                h = hashlib.sha256(bytes(r[content_col])).digest()
                rows.append(
                    {
                        id_col: r[id_col],
                        "width": 64 + h[0],
                        "height": 64 + h[1],
                        "mean_luma": h[2] / 255.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_luma"])

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
            if not fake:
                _require_codec("video-demux")
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r[content_col])
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


def resample_audio(
    df: DataFrame,
    target_hz: int = 16_000,
    content_col: str = "content",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Audio resample stub: same mapInPandas shape; fake mode passes bytes
    through with the new rate recorded."""
    out_schema = f"{id_col} long, sample_rate int, audio binary"

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                _require_codec("audio-resample")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": target_hz,
                    "audio": pdf[content_col],
                }
            )

    return df.select(id_col, content_col).mapInPandas(_batches, schema=out_schema)
