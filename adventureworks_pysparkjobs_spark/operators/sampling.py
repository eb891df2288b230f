"""Deterministic sampling / capping / filtering operators for training-data
pipelines (north-star extension).

At 100 TB, `df.sample()`'s per-run randomness is a liability: re-runs
produce different corpora, and no other system can reproduce the split.
These operators derive every decision from a content/key hash (MD5 — the
engine-portable primitive used across the dedup family), so samples and
splits are stable across runs, partitionings and engines, and any row's
membership can be audited from its key alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX16 = 16 ** 4  # resolution of the 4-hex-digit hash bucket


def hash_bucket(col: str | Column, buckets: int = HEX16, salt: str = "") -> Column:
    """Stable bucket in [0, buckets) from the MD5 of a key column.
    ``salt`` decorrelates multiple independent samples over the same key."""
    c = F.col(col) if isinstance(col, str) else col
    h4 = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 4)
    return F.conv(h4, 16, 10).cast("int") % buckets


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket falls below fraction * resolution —
    a reproducible, engine-portable Bernoulli sample keyed on content."""
    return df.filter(hash_bucket(key_col, HEX16, salt) < int(fraction * HEX16))


def train_test_split_col(
    key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> Column:
    """'train'/'test' assignment column — same hash family, auditable."""
    return F.when(
        hash_bucket(key_col, HEX16, salt) < int(test_fraction * HEX16), "test"
    ).otherwise("train")


def cap_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = "cap"
) -> DataFrame:
    """Keep at most k rows per group, chosen by deterministic hash order —
    the balanced-corpus cap (limit docs per domain/source) that doesn't
    favor ingestion order or partition layout. One shuffle on the group."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.col(key_col),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
