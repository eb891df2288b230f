"""Table profiling: one-pass per-column data-quality statistics.

A 100 TB ingest needs contract monitoring the reference leaves to its
pinned schemas alone (reference: code_base/db_to_parquet.py:29-144 —
load-time types, but no content checks). ``profile_table`` computes, in
ONE aggregation pass over the table (single job, one shuffle-free
partial+final agg, one result row shipped to the driver before the
per-column explode):

- row count, per-column null count / null fraction,
- distinct cardinality (exact, or HyperLogLog++ at scale),
- min/max rendered as strings (atomic columns only).

Output is long format — one row per profiled column — so profiles land
in a lake table and diff across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# min/max are only well-defined (and engine-portable) for atomic types.
_ORDERABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
    T.BooleanType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, null_fraction,
    n_distinct, min_value, max_value).

    ``exact_distinct=False`` (the scale default) uses
    approx_count_distinct (HLL++, one pass, fixed memory); ``True`` uses
    exact COUNT(DISTINCT) — fine for dims, avoid on 100 TB facts.
    min/max are null for non-atomic columns (arrays/maps/structs/binary).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__nn"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(c)
            ).alias(f"{c}__nd")
        )
        if isinstance(fields[c], _ORDERABLE):
            aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    n = F.col("__n")
    structs = []
    for c in cols:
        orderable = isinstance(fields[c], _ORDERABLE)
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                n.alias("n_rows"),
                (n - F.col(f"{c}__nn")).alias("n_nulls"),
                ((n - F.col(f"{c}__nn")).cast("double") / n).alias(
                    "null_fraction"
                ),
                F.col(f"{c}__nd").alias("n_distinct"),
                (
                    F.col(f"{c}__min")
                    if orderable
                    else F.lit(None).cast("string")
                ).alias("min_value"),
                (
                    F.col(f"{c}__max")
                    if orderable
                    else F.lit(None).cast("string")
                ).alias("max_value"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def key_skew_profile(
    df: DataFrame,
    keys: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter profile of a join/aggregation key — the diagnostic
    run before choosing broadcast vs salted vs plain shuffle for a
    100 TB join. Returns the ``top_n`` hottest key values with
    (key_count, total_rows, share, cum_share, rnk), heaviest first.

    Shape: one partial+final agg on the key (the same shuffle the join
    itself would do, but carrying counts), a TakeOrderedAndProject
    top-n over the counts (per-partition partial top-k + merge — NOT a
    global window over all distinct keys, which would single-reduce a
    billion-key frame), then rank/share/cum_share windows over the
    already-tiny top_n rows plus one broadcast cross join of the 1-row
    total.
    """
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("key_count")
    )
    total = counts.agg(
        F.sum("key_count").cast("bigint").alias("total_rows")
    )
    order = [F.col("key_count").desc(), *[F.col(k) for k in keys]]
    w = Window.orderBy(*order)
    top = (
        counts.orderBy(*order)
        .limit(top_n)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            "share", F.col("key_count").cast("double") / F.col("total_rows")
        )
        .withColumn(
            "cum_share",
            F.sum(F.col("key_count").cast("double") / F.col("total_rows")).over(
                Window.orderBy("rnk").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .select(*keys, "key_count", "total_rows", "share", "cum_share", "rnk")
    )
