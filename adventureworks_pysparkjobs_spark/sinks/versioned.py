"""Versioned lake tables: atomic publish + time travel without a table
format.

The reference's BigQuery sink gets atomic overwrite for free
(transform_to_bq.py:85–91); a parquet lake's ``mode("overwrite")`` does
not — readers racing a rewrite see partial/missing files. This layout
closes that gap with two primitives every filesystem has:

    table/
      v=1/part-*.parquet      (immutable once written)
      v=2/part-*.parquet
      _LATEST                 (one-line pointer file: "2")

- ``publish_version`` writes the NEW version directory completely,
  then swaps the pointer with an atomic rename — readers see v1 or v2,
  never a half-written table;
- ``read_latest`` / ``read_version`` give current and time-travel
  reads (old versions stay immutable until ``vacuum_versions``);
- works on any Hadoop-compatible FS; on object stores the pointer
  swap maps to a single small-object PUT (the same pattern table
  formats use for their root metadata pointer).

This is deliberately the 80% of Delta/Iceberg the engine's jobs need
(atomic full-snapshot publish + read isolation + rollback), not a
transaction log: concurrent WRITERS still need external coordination,
and partial-file updates belong to the MERGE sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _versions(path: str) -> list[int]:
    try:
        entries = os.listdir(path)
    except FileNotFoundError:
        return []
    out = []
    for e in entries:
        if e.startswith("v=") and e[2:].isdigit():
            out.append(int(e[2:]))
    return sorted(out)


def current_version(path: str) -> int | None:
    """The published version per the pointer file (None = never
    published)."""
    try:
        with open(os.path.join(path, _POINTER)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def publish_version(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next version and atomically repoint
    ``_LATEST`` at it. Returns the new version number.

    The data write happens entirely under the new ``v=N`` directory
    while readers keep using the old pointer; the commit is one
    ``os.replace`` (atomic on POSIX) of the pointer file. A crash
    before the rename leaves an orphan ``v=N`` directory (invisible to
    readers; reclaimed by ``vacuum_versions``), never a corrupt table.
    """
    os.makedirs(path, exist_ok=True)
    n = (max(_versions(path)) if _versions(path) else 0) + 1
    df.write.mode("error").parquet(os.path.join(path, f"v={n}"))
    tmp = os.path.join(path, f"{_POINTER}.tmp.{n}")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, os.path.join(path, _POINTER))
    return n


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time-travel read of an explicit version (immutable)."""
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def read_latest(spark: SparkSession, path: str) -> DataFrame:
    """Read the currently-published version (pointer-isolated: a
    concurrent publish cannot make this read see partial data)."""
    v = current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published version at {path}")
    return read_version(spark, path, v)


def rollback(path: str, version: int) -> None:
    """Repoint ``_LATEST`` at an older (still-present) version — the
    instant undo an overwrite-in-place layout cannot offer."""
    if version not in _versions(path):
        raise ValueError(f"version {version} not present at {path}")
    tmp = os.path.join(path, f"{_POINTER}.tmp.rb{version}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _POINTER))


def vacuum_versions(path: str, keep: int = 2) -> list[int]:
    """Delete version directories older than the newest ``keep``
    (never the pointer target). Returns the removed versions."""
    import shutil

    vs = _versions(path)
    cur = current_version(path)
    removable = [v for v in vs[:-keep] if v != cur] if len(vs) > keep else []
    for v in removable:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    return removable
