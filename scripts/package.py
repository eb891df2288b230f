#!/usr/bin/env python
"""Build the spark-submit deployment artifact.

The reference ships its jobs by copying ``code_base/`` to a bucket in CI
(reference cloudbuild.yaml:1-9) and pointing the cluster at the scripts.
The engine-library equivalent is a ``--py-files`` zip: one archive of the
package that any ``spark-submit`` / Dataproc / EMR / k8s job can attach,
so the cluster-side deployment step stays a single artifact copy.

Usage:  python scripts/package.py [outdir]   (default: dist/)

Stdlib-only (zipfile) so it runs in CI containers with no build
frontend; the zip is deterministic (fixed timestamps, sorted entries)
so re-publishing an unchanged tree re-uploads an identical artifact.
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

PKG = "adventureworks_pysparkjobs_spark"


def build(outdir: str = "dist") -> pathlib.Path:
    root = pathlib.Path(__file__).resolve().parent.parent
    out = root / outdir
    out.mkdir(exist_ok=True)
    target = out / f"{PKG}.zip"
    files = sorted(
        p
        for p in (root / PKG).rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(root)))
            info.date_time = (2020, 1, 1, 0, 0, 0)  # deterministic artifact
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    return target


if __name__ == "__main__":
    print(build(*sys.argv[1:2]))
