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

from pyspark.sql import DataFrame
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
