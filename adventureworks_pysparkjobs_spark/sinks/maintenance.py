"""Lake maintenance: small-file compaction, sort-clustered writes, and
incremental (dynamic) partition refresh.

The reference's lake is write-once flat directories
(reference: code_base/db_to_parquet.py:166, :196) — fine for an 8-table
demo, but a 100 TB lake accretes small files (streaming micro-batches,
per-partition task output) and pays for them on every scan (task per
file, footer fetch per file). These operators are the standard
counter-measures, all in public Spark + pyarrow.fs (portable across
local/S3/GCS filesystems):

- ``compact_lake_table``: rewrite a table directory into
  size-targeted files (optionally range-clustered), then swap.
- ``clustered_write``: repartitionByRange + sortWithinPartitions so each
  file owns a disjoint key range — parquet min/max stats then let any
  engine skip whole files/row-groups for key predicates (the practical
  80% of Z-ordering for single-key access patterns).
- ``refresh_partitions``: dynamic partition overwrite — replace ONLY the
  partitions present in the incoming frame, leaving the rest of the lake
  untouched (the incremental alternative to the reference's full
  overwrite).
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(path: str):
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def directory_bytes(path: str) -> int:
    """Total data-file bytes under a table directory (recursive;
    ignores _SUCCESS/metadata and hidden files)."""
    from pyarrow import fs as pafs

    fs, p = _fs(path)
    infos = fs.get_file_info(pafs.FileSelector(p, recursive=True))
    return sum(
        i.size
        for i in infos
        if i.type == pafs.FileType.File
        and not i.base_name.startswith(("_", "."))
    )


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int = 1,
) -> str:
    """Write ``df`` as ``n_files`` parquet files, each owning a disjoint
    ``cluster_by`` range and sorted inside — so parquet footer min/max
    stats make key-predicate scans skip non-matching files/row-groups
    entirely. One range-exchange shuffle; the sort is per-partition."""
    out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
        *cluster_by
    )
    out.write.mode("overwrite").parquet(path)
    return path


def zorder_value(
    quantized: list, bits: int = 16
):
    """Interleave the bits of per-column quantized ranks into one
    Z-order (Morton) key — pure integer expressions, no UDF."""
    n = len(quantized)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("long")
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> str:
    """Multi-column clustered write: sort by a Z-order (Morton) curve
    over the ``zorder_by`` columns so parquet footer min/max stats prune
    files for predicates on ANY of the columns — the multi-dimensional
    generalization of ``clustered_write`` (whose single-key sort leaves
    every other column spread across all files, pruning nothing).

    Each column is range-quantized to ``bits`` bits using its global
    min/max (ONE bounded agg collect — 2 numbers per column), the
    quantized ranks are bit-interleaved into the Morton key, and the
    write is a range-partitioned sort on that key: neighbouring files
    own compact hyper-rectangles of the value space. Columns must be
    numeric (cast dates/timestamps to their epoch upstream); NULLs sort
    to cell 0.

    This is the table-format-free version of the lakehouse Z-ORDER
    maintenance command: the same layout trick, done with a plain sort.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}__lo") for c in zorder_by],
        *[F.max(F.col(c).cast("double")).alias(f"{c}__hi") for c in zorder_by],
    ).collect()[0]
    top = (1 << bits) - 1
    quantized = []
    for c in zorder_by:
        lo, hi = stats[f"{c}__lo"], stats[f"{c}__hi"]
        span = (hi - lo) if (hi is not None and hi > lo) else 1.0
        q = F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(top))
        ).cast("long")
        quantized.append(
            F.coalesce(F.greatest(F.least(q, F.lit(top)), F.lit(0)), F.lit(0))
        )
    out = (
        df.withColumn("_z", zorder_value(quantized, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode("overwrite").parquet(path)
    return path


def compact_lake_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite the table at ``path`` into ``ceil(bytes/target)`` files
    (optionally range-clustered on ``cluster_by``) and swap it in place.
    Returns the new file count.

    The swap is write-to-side-directory, delete, rename — not atomic on
    object stores; at real scale run it behind the same
    stage-then-publish discipline as any full-refresh job (the reference
    has the identical non-atomicity in its overwrite publish,
    transform_to_bq.py:85-91).
    """
    n = max(1, math.ceil(directory_bytes(path) / target_file_bytes))
    df = spark.read.parquet(path)
    if cluster_by:
        out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    fs, p = _fs(path)
    _, tp = _fs(tmp)
    fs.delete_dir(p)
    fs.move(tp, p)
    return n


def refresh_partitions(df: DataFrame, path: str, partition_by: str) -> str:
    """Incrementally refresh a partitioned lake table: overwrite ONLY the
    ``partition_by`` values present in ``df`` (dynamic partition
    overwrite), leaving every other partition's files untouched.

    This is the scale-correct replacement for the reference's
    overwrite-everything publish: a daily pipeline rewrites one date
    partition of a 100 TB fact, not the fact."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_by)
        .parquet(path)
    )
    return path
