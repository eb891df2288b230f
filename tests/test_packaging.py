"""The deployment artifact (scripts/package.py) must be a working
``--py-files`` zip: importable on a bare interpreter with only the zip
on sys.path, and byte-identical across rebuilds (deterministic publish —
the engine-library analogue of the reference's CI copy step,
reference cloudbuild.yaml:1-9)."""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _build(tmp_path, name):
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package.py"), str(tmp_path / name)],
        check=True,
        capture_output=True,
        text=True,
    )
    return Path(out.stdout.strip())


def test_zip_importable_standalone(tmp_path):
    z = _build(tmp_path, "dist1")
    names = zipfile.ZipFile(z).namelist()
    assert "adventureworks_pysparkjobs_spark/__init__.py" in names
    assert not any("__pycache__" in n for n in names)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import adventureworks_pysparkjobs_spark.operators.packing as m; "
        "print(m.pack_sequences.__name__)"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe, str(z)],
        check=True,
        capture_output=True,
        text=True,
        cwd=tmp_path,  # not the repo root: the zip alone must resolve
    )
    assert out.stdout.strip() == "pack_sequences"


def test_zip_is_deterministic(tmp_path):
    a = _build(tmp_path, "dist1")
    b = _build(tmp_path, "dist2")
    assert a.read_bytes() == b.read_bytes()
