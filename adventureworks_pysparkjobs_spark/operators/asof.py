"""Generic as-of join (Spark has no native one — SURVEY.md §2.10, common
OLAP pattern: trades⋈quotes, purchase⋈last-click).

Implementation: union-tag + window, not a range join and not pandas —

1. tag rows (right=0/left=1), union both sides on the (key, ts) space;
2. one window per key, ordered so that an eligible right row always sorts
   before the left row it may match, carries the most recent right-side
   payload (``last(..., ignorenulls)`` over an unbounded-to-current frame);
3. keep the left rows: each now holds the latest right row with
   right_ts <= left_ts (or < for strict).

Equal-timestamp semantics are encoded purely in the sort order of the tag:
  non-strict: (ts, tag asc)  — right-at-equal-ts sorts BEFORE left → matches;
  strict:     (ts, tag desc) — right-at-equal-ts sorts AFTER left → excluded.

Cost: ONE shuffle of |L|+|R| rows on the key — linear, skew-tolerant via
AQE, no per-pair work; this is the scalable formulation of merge_asof
(`pd.merge_asof` via applyInPandas would buffer whole key groups in worker
memory; the window formulation streams).

Determinism caveat: if several RIGHT rows share one exact timestamp, which
of them wins is tie-broken by the trailing ``_payload`` struct comparison
order only if included — pass a unique column in ``right_cols`` and treat
ties upstream if that matters (microsecond event streams rarely tie).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row of the same ``on``
    key with right_ts <= left_ts (strictly < when ``strict``). Right
    payload columns come back suffixed with ``suffix``."""
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in [right_ts, *right_cols]])
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *lcols,
    )
    tag_order = F.col("_tag").desc() if strict else F.col("_tag").asc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    return matched.select(
        *lcols,
        *[
            F.col("_match").getField(c).alias(f"{c}{suffix}")
            for c in [right_ts, *right_cols]
        ],
    )
