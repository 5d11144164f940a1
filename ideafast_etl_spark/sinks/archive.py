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
