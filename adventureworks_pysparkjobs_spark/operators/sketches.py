"""Mergeable-sketch operators (Apache DataSketches via Spark SQL's
hll_sketch_* family).

The 100 TB pattern this enables: distinct counts do NOT re-aggregate
(distinct users per day can't be summed into distinct users per week),
so a warehouse either re-scans raw events per rollup grain or stores
mergeable sketches at the finest grain and unions them upward. The
sketch table is O(groups × sketch_size) — re-aggregating it to any
coarser grain never touches raw data again.

Correctness contract: the estimate is approximate (engine-specific
binary sketches), so catalog entries expose the `approx_parts_ok`
pattern — an exact count (computed in-plan, cross-engine) plus a
boolean asserting the estimate lands within tolerance. The sketch
bytes themselves never appear in oracle-checked output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct_rollup(
    df: DataFrame,
    col: str,
    fine_keys: Sequence[str],
    coarse_keys: Sequence[str],
    lg_k: int = 12,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Build HLL sketches at ``fine_keys`` grain, merge them up to
    ``coarse_keys`` grain, and verify each merged estimate against the
    exact distinct count.

    ``coarse_keys`` must be a subset of ``fine_keys`` (the rollup must
    be a coarsening — that is what makes the sketch union valid).
    Returns one row per coarse group: the exact distinct count and
    ``estimate_ok`` = |est/exact − 1| <= ``rel_tol``.

    Scale shape: two aggs over the fine sketch table (built with ONE
    pass over raw data, partial-aggregated map-side) plus one exact
    agg for verification. In production the exact branch is dropped
    and ONLY the fine sketch table persists; every coarser rollup is a
    sketch union over it. lg_k=12 → ~1.6% standard error in ~4 KB per
    sketch.
    """
    missing = [k for k in coarse_keys if k not in fine_keys]
    if missing:
        raise ValueError(
            f"coarse_keys {missing} not contained in fine_keys {fine_keys}"
        )
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sk")
    )
    merged = fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = df.groupBy(*coarse_keys).agg(
        F.count_distinct(col).alias("exact_distinct")
    )
    ok = (
        F.abs(
            F.col("est").cast("double")
            / F.col("exact_distinct").cast("double")
            - F.lit(1.0)
        )
        <= F.lit(rel_tol)
    )
    return merged.join(exact, list(coarse_keys)).select(
        *coarse_keys,
        "exact_distinct",
        ok.alias("estimate_ok"),
    )


def _cms_bucket(col, row: int, width: int):
    """Deterministic hash-row bucket: first 8 hex chars of
    md5("{row}|" + key) as an integer, mod width. Engine-portable: the
    DuckDB twin is ``CAST('0x' || substr(md5(...),1,8) AS BIGINT) %
    width`` (both parse ≤ 2^32−1, no sign issues)."""
    h = F.md5(F.concat(F.lit(f"{row}|"), col))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of a key column: a ``depth`` × ``width`` counter
    grid as a DataFrame (h, bucket, c).

    The 100 TB shape: the grid is FIXED-SIZE (depth·width cells) no
    matter the key cardinality, and it is mergeable — grids from two
    corpora/partitions sum cell-wise, so the sketch maintains itself
    incrementally where an exact frequency table is vocabulary-sized
    (1e8–1e9 rows on web text). Each input row expands to ``depth``
    (h, bucket) pairs map-side and partial aggregation collapses them
    before the shuffle, which therefore carries at most depth·width
    partial cells per partition — O(1) in the row count.
    """
    return cms_pairs(df, col, depth, width).groupBy("h", "bucket").agg(
        F.sum("c").alias("c")
    )


def cms_pairs(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """The map-side expansion behind ``cms_build``: each input row as
    ``depth`` (h, bucket, c=1) cells, pre-aggregation. Exposed
    separately so a STREAMING frame can expand cells and let an
    additive-aggregate sink (streaming/events.py
    stream_aggregate_to_lake) maintain the grid incrementally — CMS
    grids are sums, so batch-partial grids merge exactly."""
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        _cms_bucket(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.h", "p.bucket", F.lit(1).cast("long").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate counts for ``keys[col]`` from a ``cms_build``
    grid: min over the ``depth`` hash rows of the key's cell — the
    classic CMS upper bound (never underestimates; overestimates only
    by hash collisions, P[err > 2N/width] < 2^-depth).

    Scale: keys expand ×depth, equi-join the bounded grid (≤
    depth·width rows — AQE broadcasts it), then a min per key. The
    corpus itself is never rescanned: estimation cost is O(|keys|),
    which is the point of carrying the sketch.
    """
    probes = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        _cms_bucket(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(col, "p.h", "p.bucket")
    joined = probes.join(sketch, ["h", "bucket"], "left").select(
        col, F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy(col).agg(F.min("c").alias("cms_count"))


def quantile_sketch_check(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    percentiles: Sequence[float] = (0.5, 0.95),
    accuracy: int = 1000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Mergeable quantile sketch with an in-plan rank-error proof —
    the third member of the sketch family (CMS = frequencies,
    HLL = distincts, this = quantiles).

    Per group and percentile p it reports the EXACT p-quantile — the
    k-th smallest value, k = ceil(p·n), under the total order
    (value, tiebreak) so the reported value is engine-identical — next
    to a boolean checking ``percentile_approx``'s guarantee: the
    sketch value's rank interval [#(<v)+1, #(<=v)] must intersect
    [k − n/accuracy, k + n/accuracy]. At 100 TB the SKETCH is the
    product (one pass, mergeable partials, no sort); the exact rank
    column is the verification rider and costs one per-group sort —
    run it on samples or at audit time, not per query.

    Returns (*group_cols, pct DOUBLE, n BIGINT, k BIGINT,
    exact_value DOUBLE, sketch_ok BOOLEAN).
    """
    gc = list(group_cols)
    tb = tiebreak_col
    order = [F.col(value_col)] + ([F.col(tb)] if tb else [])
    from pyspark.sql import Window

    w = Window.partitionBy(*gc).orderBy(*order)
    ranked = df.select(
        *gc, F.col(value_col).alias("_v"), F.row_number().over(w).alias("_r")
    )
    base = df.groupBy(*gc).agg(
        F.count("*").cast("long").alias("n"),
        F.percentile_approx(
            F.col(value_col), list(percentiles), accuracy
        ).alias("_apx"),
    )
    out = None
    for i, p in enumerate(percentiles):
        k = F.ceil(F.lit(float(p)) * F.col("n")).cast("long")
        apx_i = F.col("_apx").getItem(i)
        # rank interval of the sketch value within each group: one
        # conditional aggregate over the (broadcastable) per-group
        # sketch frame joined back to the raw rows
        ranks = (
            df.select(*gc, F.col(value_col).alias("_x"))
            .join(base.select(*gc, apx_i.alias("_av")), gc)
            .groupBy(*gc)
            .agg(
                F.count_if(F.col("_x") < F.col("_av"))
                .cast("long")
                .alias("_lt"),
                F.count_if(F.col("_x") <= F.col("_av"))
                .cast("long")
                .alias("_le"),
            )
        )
        part = (
            base.select(*gc, "n", k.alias("k"))
            .join(ranked, gc)
            .filter(F.col("_r") == F.col("k"))
            .select(*gc, "n", "k", F.col("_v").alias("exact_value"))
            .join(ranks, gc)
            .select(
                *gc,
                F.lit(float(p)).alias("pct"),
                "n",
                "k",
                F.col("exact_value").cast("double").alias("exact_value"),
                (
                    (
                        F.col("_lt") + F.lit(1)
                        <= F.col("k")
                        + F.ceil(
                            F.col("n").cast("double")
                            / F.lit(float(accuracy))
                        )
                    )
                    & (
                        F.col("_le")
                        >= F.col("k")
                        - F.ceil(
                            F.col("n").cast("double")
                            / F.lit(float(accuracy))
                        )
                    )
                ).alias("sketch_ok"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out
