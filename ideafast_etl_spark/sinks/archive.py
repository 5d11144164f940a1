"""Archive/compaction + cleanup (SURVEY.md §2.2 K9/K10, reference
dmp.py:162-177, dags/dreem.py:236-295).

The reference zips each upload group's folder into one artifact, removes the
zip + folder after upload, and runs a final cleanup of the run directory
regardless of upstream outcome (TriggerRule.ALL_DONE). Here the same
lifecycle as plain helpers used inside the sink stage; ``run_scratch``
is the finally-style context the DAG-level cleanup maps to.
"""

from __future__ import annotations

import contextlib
import shutil
import tempfile
import zipfile
from collections.abc import Iterator
from pathlib import Path


def zip_folder(folder: str | Path) -> Path:
    """K9 — zip a folder of downloaded files into one artifact next to it."""
    folder = Path(folder)
    out = folder.with_suffix(".zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(folder.rglob("*")):
            if f.is_file():
                zf.write(f, f.relative_to(folder))
    return out


def rm_local_data(zip_path: str | Path) -> None:
    """K10 — remove the zip artifact and its source folder (idempotent)."""
    zip_path = Path(zip_path)
    zip_path.unlink(missing_ok=True)
    shutil.rmtree(zip_path.with_suffix(""), ignore_errors=True)


@contextlib.contextmanager
def run_scratch(prefix: str = "ideafast-run-") -> Iterator[Path]:
    """Run-scoped scratch dir, removed on exit regardless of outcome —
    the ALL_DONE cleanup task (dags/dreem.py:289-295)."""
    d = Path(tempfile.mkdtemp(prefix=prefix))
    try:
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)


def zip_manifest(
    df,
    content_col: str = "content",
    id_col: str = "doc_id",
):
    """Inverse of the K9 zip sink: list every entry of ZIP payloads held
    in a binary column — (id, entry_name, uncompressed_size,
    compressed_size, crc32, method) — via the central directory only
    (no payload decompression; stdlib ``zipfile`` over an in-memory
    buffer). 1:N Arrow ``mapInPandas``; corrupt/non-zip payloads yield
    no rows instead of failing the batch (untrusted binary contract).

    The training-data use: web archives and device uploads arrive as
    zips — the manifest scan decides what to extract before any bytes
    decompress."""
    import io as _io

    import pandas as pd

    out_schema = (
        f"{id_col} long, entry_name string, uncompressed_size long, "
        "compressed_size long, crc32 long, method string"
    )
    methods = {0: "stored", 8: "deflated", 12: "bzip2", 14: "lzma"}

    def _batches(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                try:
                    with zipfile.ZipFile(_io.BytesIO(bytes(r[content_col]))) as zf:
                        infos = zf.infolist()
                except (zipfile.BadZipFile, OSError, ValueError):
                    continue
                for zi in infos:
                    rows.append(
                        {
                            id_col: r[id_col],
                            "entry_name": zi.filename,
                            "uncompressed_size": zi.file_size,
                            "compressed_size": zi.compress_size,
                            "crc32": zi.CRC,
                            "method": methods.get(
                                zi.compress_type, str(zi.compress_type)
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "entry_name", "uncompressed_size",
                    "compressed_size", "crc32", "method",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(
        _batches, schema=out_schema
    )
