"""Time-series resampling operators (north-star extension, SURVEY.md
§2.10): regularize an irregular event stream onto a fixed time grid —
the feature-engineering shape between raw events and model-ready
per-entity time series (downsample, gap-fill, forward fill).

Scale design: the grid is generated PER KEY from that key's own
[min, max] bucket span (``sequence`` + ``explode`` — rows bounded by
span/bucket_s per key, never a global calendar cross join), the bucket
aggregation is one partial+final hash agg, and the fill is window work
over the already-gridded frame. Three keyed shuffles total — bucket
agg, per-key bounds, grid join + fill windows (which share ONE sort;
plan-guarded) — all skew-bounded by real per-entity activity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import dec


def _bucket_grid(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    bucket_s: int,
    with_count: bool,
) -> DataFrame:
    """Shared core of the resample family: epoch-floored bucket
    aggregation, per-key [min, max] bounds, grid generation
    (sequence + explode) and the left join of observations onto the
    grid. One construction serves both fill strategies so a bucketing
    fix can never apply to one resampler and not the other."""
    s = F.col(ts_col).cast("bigint")
    bucket = (s - (s % bucket_s)).alias("bucket_s")
    aggs = [F.sum(dec(value_col, 12, 2)).cast("double").alias("total_value")]
    if with_count:
        aggs.insert(0, F.count("*").alias("n_events"))
    agg = df.groupBy(F.col(key), bucket).agg(*aggs)
    bounds = agg.groupBy(key).agg(
        F.min("bucket_s").alias("_lo"), F.max("bucket_s").alias("_hi")
    )
    grid = bounds.select(
        key,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(bucket_s))
        ).alias("bucket_s"),
    )
    return grid.join(agg, [key, "bucket_s"], "left")


def resample_gapfill(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
) -> DataFrame:
    """Resample events onto a fixed ``bucket_s``-second grid per ``key``
    and forward-fill across empty buckets.

    Output, one row per (key, grid bucket) covering each key's observed
    [first, last] activity span:

    - ``n_events``  — events in the bucket (0 on gaps),
    - ``total_value`` — decimal-exact bucket sum as DOUBLE (NULL on
      gaps — the honest raw aggregate),
    - ``total_value_ff`` — the last non-null bucket sum at or before
      this bucket (forward fill / last-observation-carried-forward).

    Deterministic across engines: epoch-floored bucketing, decimal
    accumulation, and a window whose ORDER BY (the grid bucket) is
    unique per key.
    """
    j = _bucket_grid(df, key, ts_col, value_col, bucket_s, with_count=True)
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key,
        "bucket_s",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "total_value",
        F.last("total_value", ignorenulls=True).over(w).alias(
            "total_value_ff"
        ),
    )


def resample_interpolate(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_s: int = 3600,
) -> DataFrame:
    """Like :func:`resample_gapfill` but gaps are LINEARLY interpolated
    between the surrounding observed buckets instead of carried forward
    — the other standard regularization for continuous-valued series.

    ``total_value_li`` on a gap at bucket b with previous observation
    (pb, pv) and next observation (nb, nv) is
    ``pv + (nv - pv) * (b - pb) / (nb - pb)``; observed buckets keep
    their exact value; a leading/trailing gap cannot occur (the grid
    spans [first, last] observation). Same three keyed shuffles as the
    LOCF variant — the backward- and forward-looking anchor windows
    share one sort. Deterministic: one IEEE expression over identical
    operands in any engine.
    """
    j = _bucket_grid(df, key, ts_col, value_col, bucket_s, with_count=False)
    v = F.col("total_value")
    b = F.col("bucket_s")
    wb = (
        Window.partitionBy(key)
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy("bucket_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last(v, ignorenulls=True).over(wb)
    pb = F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(wb)
    nv = F.first(v, ignorenulls=True).over(wf)
    nb = F.first(F.when(v.isNotNull(), b), ignorenulls=True).over(wf)
    frac = (b - pb).cast("double") / (nb - pb).cast("double")
    li = F.when(v.isNotNull(), v).otherwise(pv + (nv - pv) * frac)
    return j.select(key, "bucket_s", "total_value", li.alias("total_value_li"))
