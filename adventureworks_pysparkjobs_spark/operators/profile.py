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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


def profile_diff(
    old: DataFrame,
    new: DataFrame,
) -> DataFrame:
    """Run-over-run drift report from two ``profile_table`` outputs: one
    row per column naming what changed between snapshots — the check a
    scheduled ingest runs before publishing (a null-fraction jump or a
    vanished column is a broken upstream, caught before it poisons
    downstream consumers).

    Output per column: presence (``added``/``removed``/``common``), old
    and new row/null/distinct numbers, the null-fraction delta, and
    ``min_max_changed``. Both inputs are tiny (one row per column), so
    this is a broadcast full-outer join — cost lives in producing the
    profiles, which is one aggregation pass each.
    """
    o = old.select(
        "column",
        F.col("n_rows").alias("old_n_rows"),
        F.col("n_nulls").alias("old_n_nulls"),
        F.col("null_fraction").alias("old_null_fraction"),
        F.col("n_distinct").alias("old_n_distinct"),
        F.col("min_value").alias("old_min"),
        F.col("max_value").alias("old_max"),
    )
    n = new.select(
        "column",
        F.col("n_rows").alias("new_n_rows"),
        F.col("n_nulls").alias("new_n_nulls"),
        F.col("null_fraction").alias("new_null_fraction"),
        F.col("n_distinct").alias("new_n_distinct"),
        F.col("min_value").alias("new_min"),
        F.col("max_value").alias("new_max"),
    )
    j = o.join(n, "column", "full_outer")
    presence = (
        F.when(F.col("old_n_rows").isNull(), F.lit("added"))
        .when(F.col("new_n_rows").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    return j.select(
        "column",
        presence.alias("presence"),
        "old_n_rows",
        "new_n_rows",
        "old_n_nulls",
        "new_n_nulls",
        (F.col("new_null_fraction") - F.col("old_null_fraction")).alias(
            "null_fraction_delta"
        ),
        "old_n_distinct",
        "new_n_distinct",
        (
            ~(
                F.col("old_min").eqNullSafe(F.col("new_min"))
                & F.col("old_max").eqNullSafe(F.col("new_max"))
            )
        ).alias("min_max_changed"),
    )


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
    # cum_share = (exact integer cumulative count) / total: one division
    # per row over identical operands in any engine — a windowed sum of
    # per-row double shares would depend on the engine's accumulation
    # order in the last ulp.
    cum_count = F.sum("key_count").over(
        Window.orderBy("rnk").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn(
            "share", F.col("key_count").cast("double") / F.col("total_rows")
        )
        .withColumn(
            "cum_share", cum_count.cast("double") / F.col("total_rows")
        )
        .select(*keys, "key_count", "total_rows", "share", "cum_share", "rnk")
    )


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Fixed-width histogram with exact counts — the distribution view
    ``profile_table``'s min/max can't give. One map-side bucket
    expression + one bounded groupBy (output = n_buckets+2 rows incl.
    underflow/overflow), so at 100 TB it costs one scan and a
    partial-aggregated shuffle of at most n_buckets+2 rows per task.

    Bucketing arithmetic is a single IEEE expression over identical
    operands (floor((x - lo) / ((hi - lo) / n))), clamped into
    [-1, n] where -1 = underflow and n = overflow — engine-portable,
    so the counts oracle-check exactly. NULLs are excluded (they are
    ``profile_table``'s business).
    """
    width = (hi - lo) / n_buckets
    x = F.col(col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width))
    bucket = (
        F.when(x < F.lit(float(lo)), F.lit(-1))
        .when(x >= F.lit(float(hi)), F.lit(n_buckets))
        .otherwise(F.least(raw, F.lit(n_buckets - 1)))
        .cast("int")
    )
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(width)).alias(
                "bucket_lo"
            ),
            (
                F.lit(float(lo)) + (F.col("bucket") + F.lit(1)) * F.lit(width)
            ).alias("bucket_hi"),
            "n",
        )
    )


def feature_correlations(
    df: DataFrame,
    cols: dict[str, str],
) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance across numeric
    columns, computed in ONE scan-pass aggregate.

    ``cols`` maps column name -> pinned decimal type (e.g.
    ``"decimal(14,2)"``). Every moment (Σx, Σx², Σxy) accumulates in
    exact decimal arithmetic — partition-order-independent where raw
    double sums are not — and each reported double is a closed-form
    IEEE expression of the sums cast to double, so results are
    bit-identical across engines and partitionings (the
    engine-determinism scheme of catalog.py rules 1-2). Rows with a
    null in ANY profiled column are dropped (listwise deletion) so the
    pair statistics share one consistent n.

    The single aggregate carries k + k(k+1)/2 moment cells — the
    shuffle moves one partial row per partition regardless of row
    count, and the pair explosion happens on the 1-row result. Returns
    one row per unordered pair: (col_a, col_b, n_rows, covar_samp,
    pearson_r).
    """
    names = list(cols)
    if len(names) < 2:
        raise ValueError("feature_correlations: need >= 2 columns")
    # Explicit IsNotNull conjunction, NOT na.drop: na.drop compiles to
    # AtLeastNNonNulls, which parquet cannot push — per-column
    # IsNotNull reaches the scan's PushedFilters.
    all_non_null = F.lit(True)
    for c in names:
        all_non_null = all_non_null & F.col(c).isNotNull()
    d = df.where(all_non_null).select(
        *[F.col(c).cast(t).alias(c) for c, t in cols.items()]
    )
    # decimal->double via exact string render + correctly-rounded parse
    # (a direct cast is one ULP off in DuckDB on large scale-4 sums —
    # see grouped_ols below).
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in names:
        aggs.append(
            F.sum(F.col(c)).cast("string").cast("double").alias(f"s_{c}")
        )
    for i, x in enumerate(names):
        for y in names[i:]:
            aggs.append(
                F.sum(F.col(x) * F.col(y))
                .cast("string")
                .cast("double")
                .alias(f"p_{x}_{y}")
            )
    one = d.agg(*aggs)
    pair_structs = []
    for i, x in enumerate(names):
        for y in names[i + 1:]:
            pair_structs.append(
                F.struct(
                    F.lit(x).alias("col_a"),
                    F.lit(y).alias("col_b"),
                    F.col(f"p_{x}_{y}").alias("sxy"),
                    F.col(f"s_{x}").alias("sx"),
                    F.col(f"s_{y}").alias("sy"),
                    F.col(f"p_{x}_{x}").alias("sxx"),
                    F.col(f"p_{y}_{y}").alias("syy"),
                )
            )
    long = one.select(
        "n", F.explode(F.array(*pair_structs)).alias("p")
    ).select("n", "p.*")
    nn = F.col("n").cast("double")
    # try_divide, not /: ANSI mode errors on a zero divisor, while the
    # cross-engine contract (DuckDB returns NULL for x/0) wants NULL
    # on degenerate inputs — a constant column (zero variance) or a
    # single row (n-1 = 0).
    covar = F.try_divide(
        F.col("sxy") - F.try_divide(F.col("sx") * F.col("sy"), nn),
        nn - F.lit(1.0),
    )
    pearson = F.try_divide(
        nn * F.col("sxy") - F.col("sx") * F.col("sy"),
        F.sqrt(
            (nn * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (nn * F.col("syy") - F.col("sy") * F.col("sy"))
        ),
    )
    return long.select(
        "col_a",
        "col_b",
        F.col("n").cast("long").alias("n_rows"),
        covar.alias("covar_samp"),
        pearson.alias("pearson_r"),
    )


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    x_type: str = "decimal(14,2)",
    y_type: str = "decimal(14,2)",
) -> DataFrame:
    """Per-group simple least-squares regression (the ANSI ``REGR_*``
    family: slope, intercept, r²) in ONE scan-pass aggregate.

    The five moments (n, Σx, Σy, Σx², Σxy, Σy²) accumulate in exact
    decimal arithmetic — partition-order-independent where raw double
    sums are not — and every reported double is one closed-form IEEE
    expression over the moment sums cast to double, so the output is
    bit-identical across engines and partitionings (catalog.py rules
    1-2). ``try_divide`` (not ``/``) yields NULL on the degenerate
    groups (n < 2 or zero x-variance), matching DuckDB's NULL-on-zero
    division.

    Scale: one hash aggregate on the grouping key — the shuffle moves
    one 6-cell partial row per (group, partition); the regression
    arithmetic runs on the aggregated rows only. No window, no second
    pass, no driver collect. Rows with a NULL in x or y are dropped via
    an explicit IsNotNull conjunction (reaches the parquet scan's
    PushedFilters; ``na.drop`` would plan unpushable AtLeastNNonNulls).
    """
    d = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *group_cols,
        F.col(x_col).cast(x_type).alias("_x"),
        F.col(y_col).cast(y_type).alias("_y"),
    )
    # Decimal sums become doubles via an exact string render + one
    # correctly-rounded parse. A direct decimal->double cast is NOT
    # portable: DuckDB converts the unscaled int128 then divides by
    # 10^scale, which can land one ULP off the correctly-rounded value
    # Spark's BigDecimal.doubleValue() produces (observed on scale-4
    # sums ~7e12). String parse is correctly rounded in both engines.
    def d2d(c):  # decimal -> double, engine-portable
        return c.cast("string").cast("double")

    s = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        d2d(F.sum("_x")).alias("sx"),
        d2d(F.sum("_y")).alias("sy"),
        d2d(F.sum(F.col("_x") * F.col("_x"))).alias("sxx"),
        d2d(F.sum(F.col("_x") * F.col("_y"))).alias("sxy"),
        d2d(F.sum(F.col("_y") * F.col("_y"))).alias("syy"),
    )
    nn = F.col("n").cast("double")
    slope = F.try_divide(
        nn * F.col("sxy") - F.col("sx") * F.col("sy"),
        nn * F.col("sxx") - F.col("sx") * F.col("sx"),
    )
    # intercept references the *materialized* slope column so both
    # engines evaluate the identical expression tree over it.
    with_slope = s.select(
        *group_cols,
        F.col("n").cast("long").alias("n_rows"),
        "sx", "sy", "sxx", "sxy", "syy",
        slope.alias("slope"),
    )
    nn2 = F.col("n_rows").cast("double")
    intercept = F.try_divide(
        F.col("sy") - F.col("slope") * F.col("sx"), nn2
    )
    r2 = F.try_divide(
        (nn2 * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (nn2 * F.col("sxy") - F.col("sx") * F.col("sy")),
        (nn2 * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nn2 * F.col("syy") - F.col("sy") * F.col("sy")),
    )
    return with_slope.select(
        *group_cols,
        "n_rows",
        F.col("slope").alias("regr_slope"),
        intercept.alias("regr_intercept"),
        r2.alias("regr_r2"),
    )


def wilson_lower_bound(
    df: DataFrame,
    group_cols: Sequence[str],
    event_col: Column,
    z: float = 1.96,
) -> DataFrame:
    """Rank-by-confidence scoring: per group, the Wilson score lower
    bound of the event rate — the standard fix for 'sort by rate'
    rewarding tiny samples (1/1 failures rank above 40/100 by raw rate;
    the lower bound ranks them correctly).

    Cross-engine determinism note (a NEW idiom in this engine): unlike
    ln/log, every operation here — +, −, ×, ÷ and sqrt — is IEEE-754
    CORRECTLY ROUNDED in both engines, so evaluating the IDENTICAL
    expression tree over identical double inputs is bit-exact without
    retreating to integer arithmetic. The oracle mirrors the tree
    shape, parenthesization, and string-parsed literals exactly.

    One keyed aggregate (map-side partials); the formula is per-group
    scalar math. Returns (*group_cols, n, k, event_rate, wilson_lb).
    """
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(event_col).cast("long").alias("k"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    one, two, four = F.lit(1.0), F.lit(2.0), F.lit(4.0)
    zl = F.lit(float(z))
    zz = zl * zl
    p = kd / nd
    wilson = (
        (p + (zz / (two * nd)))
        - (
            zl
            * F.sqrt(
                ((p * (one - p)) / nd) + (zz / (four * (nd * nd)))
            )
        )
    ) / (one + (zz / nd))
    return agg.select(
        *group_cols,
        "n",
        "k",
        p.alias("event_rate"),
        wilson.alias("wilson_lb"),
    )


def ks_drift(
    df: DataFrame,
    bin_col: Column,
    in_sample_a: Column,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group — the
    distribution-drift companion of profile_diff (which compares
    summary stats; KS bounds the max ECDF gap, catching shape changes
    equal means hide).

    ``bin_col`` must map values onto a BOUNDED ordinal grid (round to
    cents, floor to integer, bucket id...). That is the documented
    100 TB contract, not a shortcut: the exact ECDF of a continuous
    column at value grain is as large as the data, so production drift
    checks bin first — and the KS of the binned distributions is then
    EXACT, computed here with integer arithmetic. Under the contract
    every frame after the first aggregate is (group x bins)-bounded:
    one (group, bin)-keyed count aggregate over the raw rows (the only
    corpus-sized shuffle), a cumulative window over each group's <=B
    bin rows (reduced, never raw data), and a group-grain argmax join.

    The statistic is engine-identical: the per-bin gap numerator
    ``|cum_a*n_b - cum_b*n_a|`` accumulates in DECIMAL(38,0), the max
    is an integer max, and ONE string-parse double division renders
    ``ks_stat`` (DECIMAL->VARCHAR->DOUBLE is correctly rounded in both
    engines). ``ks_at_bin`` is the smallest bin attaining the max
    (deterministic tie-break).

    Returns (*group_cols, n_a BIGINT, n_b BIGINT, ks_at_bin BIGINT,
    ks_stat DOUBLE).
    """
    gc = list(group_cols)
    d38 = "decimal(38,0)"
    counts = (
        df.select(
            *gc,
            bin_col.cast("long").alias("_bin"),
            in_sample_a.cast("int").alias("_a"),
        )
        .groupBy(*gc, "_bin")
        .agg(
            F.sum("_a").cast("long").alias("_na_v"),
            F.sum(1 - F.col("_a")).cast("long").alias("_nb_v"),
        )
    )
    wcum = (
        Window.partitionBy(*gc)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*gc)
    cum = counts.select(
        *gc,
        "_bin",
        F.sum("_na_v").over(wcum).cast("long").alias("_cum_a"),
        F.sum("_nb_v").over(wcum).cast("long").alias("_cum_b"),
        F.sum("_na_v").over(wall).cast("long").alias("_n_a"),
        F.sum("_nb_v").over(wall).cast("long").alias("_n_b"),
    ).select(
        *gc,
        "_bin",
        "_n_a",
        "_n_b",
        F.abs(
            F.col("_cum_a").cast(d38) * F.col("_n_b").cast(d38)
            - F.col("_cum_b").cast(d38) * F.col("_n_a").cast(d38)
        ).cast(d38).alias("_gap"),
    )
    peak = cum.groupBy(*gc).agg(F.max("_gap").alias("_max_gap"))
    # group-grain argmax join; with no groups, peak is a 1-row rider
    joined = (
        cum.join(peak, gc) if gc else cum.crossJoin(F.broadcast(peak))
    )
    at = (
        joined.filter(F.col("_gap") == F.col("_max_gap"))
        .groupBy(*gc)
        .agg(
            F.max("_n_a").alias("n_a"),
            F.max("_n_b").alias("n_b"),
            F.min("_bin").alias("ks_at_bin"),
            F.max("_max_gap").alias("_num"),
        )
    )
    ks = (
        F.col("_num").cast("string").cast("double")
        / (F.col("n_a").cast(d38) * F.col("n_b").cast(d38))
        .cast(d38).cast("string").cast("double")
    )
    return at.select(
        *gc, "n_a", "n_b", "ks_at_bin", ks.alias("ks_stat")
    )


def mad_outliers(
    df: DataFrame,
    value_col: Column,
    group_cols: Sequence[str] = (),
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier audit per group: median, the median
    absolute deviation, and how many rows sit beyond ``k * MAD`` of the
    median — the heavy-tail-safe sibling of the rolling z-score
    detector (mean/stddev are dragged by the very outliers they are
    meant to find; medians are not).

    Determinism contract: ``value_col`` must be on a half-integer-exact
    grid (integers, cents...). Exact percentile interpolation then
    lands on .5-grain doubles, which both engines produce bit-exactly
    whatever their interpolation formula — so median, MAD, and the
    ``|x - med| > k*MAD`` comparisons are engine-identical with no
    float-accumulation anywhere (counts are the only aggregates beyond
    the two medians).

    Scale shape: exact per-group percentiles are sort-based
    aggregations — three passes over the group-partitioned frame
    (median -> MAD -> outlier count), each one keyed exchange on the
    group columns with map-side reduction of everything but the sort.
    With high group cardinality each group's sort is executor-local;
    the 100 TB low-cardinality variant swaps percentile for
    percentile_approx (mergeable sketch, see sketches.py) at a
    documented error bound. An audit runs exact.

    Returns (*group_cols, n BIGINT, med DOUBLE, mad DOUBLE,
    n_outliers BIGINT, outlier_frac DOUBLE).
    """
    gc = list(group_cols)
    v = value_col.cast("double").alias("_v")
    base = df.select(*gc, v)
    med = base.groupBy(*gc).agg(
        F.expr("percentile(_v, 0.5)").alias("_med")
    )
    j1 = base.join(med, gc) if gc else base.crossJoin(F.broadcast(med))
    mad = j1.groupBy(*gc).agg(
        F.expr("percentile(abs(_v - _med), 0.5)").alias("_mad"),
        F.max("_med").alias("_med2"),
    )
    j2 = base.join(mad, gc) if gc else base.crossJoin(F.broadcast(mad))
    out = j2.groupBy(*gc).agg(
        F.count("*").cast("long").alias("n"),
        F.max("_med2").alias("med"),
        F.max("_mad").alias("mad"),
        F.sum(
            (
                F.abs(F.col("_v") - F.col("_med2"))
                > F.lit(float(k)) * F.col("_mad")
            ).cast("int")
        ).cast("long").alias("n_outliers"),
    )
    return out.select(
        *gc, "n", "med", "mad", "n_outliers",
        (
            F.col("n_outliers").cast("double") / F.col("n").cast("double")
        ).alias("outlier_frac"),
    )


def concentration_hhi(
    df: DataFrame,
    group_col: str,
    member_col: str,
    weight_col: Column | str,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per group: with member
    weights w_i (exact integers) and group total W, HHI = Σ(w_i/W)² —
    computed as Σw_i² / W² so BOTH sums stay exact integers and each
    float output is ONE division (the engine's determinism rule; a
    float share squared-then-summed would be accumulation-order-
    dependent). Also emits top_share = max(w_i)/W and the effective
    member count 1/HHI = W²/Σw_i² — again one exact division each.

    The squares and the squared total are DECIMAL(38,0), so the math
    survives group weights up to ~10¹⁹ (a BIGINT intermediate would
    overflow W² past ~3·10⁹ total units — real at 100 TB). The
    decimal→double rendering goes through a string cast, which is
    correctly rounded in both engines where a direct decimal cast is
    not (DuckDB divides unscaled int128).

    Scale shape: reduce to member grain FIRST (map-side partial on the
    weight sum), then one group-keyed aggregate over member rows —
    the raw fact is scanned once and never joined back. Returns
    (group, n_members, total_weight, hhi, top_share, effective_n).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    members = df.groupBy(
        F.col(group_col).alias("grp"),
        F.col(member_col).alias("_member"),
    ).agg(F.sum(w.cast("long")).cast("decimal(38,0)").alias("_w"))
    grouped = members.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("_w").alias("_total"),
        F.sum(F.col("_w") * F.col("_w")).alias("_sum_sq"),
        F.max("_w").alias("_max_w"),
    )
    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")
    total2 = (F.col("_total") * F.col("_total")).cast("decimal(38,0)")
    return grouped.select(
        "grp", "n_members",
        F.col("_total").cast("long").alias("total_weight"),
        (_dbl(F.col("_sum_sq")) / _dbl(total2)).alias("hhi"),
        (_dbl(F.col("_max_w")) / _dbl(F.col("_total"))).alias("top_share"),
        (_dbl(total2) / _dbl(F.col("_sum_sq"))).alias("effective_n"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted (lower) median: the smallest value v such
    that the weight at-or-below v reaches half the group's total —
    exact integer-weight arithmetic throughout (2·cum ≥ total compares
    BIGINTs, never a float quantile), so the result is a pass-through
    member of the value column and bit-portable by construction. This
    is the percentile the built-in approx_percentile can't give you
    exactly and percentile_approx only estimates.

    Scale shape: reduce to (group, value) cells FIRST (map-side
    partial on the weight sum), one window cumsum over the cell grain
    ordered by value, then a reducing min() per group. The raw fact
    never reaches the window.
    """
    cells = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("val")
    ).agg(F.sum(F.col(weight_col).cast("long")).cast("long").alias("_w"))
    wcum = (
        Window.partitionBy("grp").orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("grp")
    scored = cells.select(
        "grp", "val", "_w",
        F.sum("_w").over(wcum).cast("long").alias("_cum"),
        F.sum("_w").over(wall).cast("long").alias("_total"),
        F.count("*").over(wall).cast("long").alias("_n_cells"),
    )
    return (
        scored.filter(F.col("_cum") * 2 >= F.col("_total"))
        .groupBy("grp")
        .agg(
            F.min("val").alias("median_val"),
            F.max("_total").alias("total_weight"),
            F.max("_n_cells").alias("n_distinct_values"),
        )
    )


def pareto_concentration(
    df: DataFrame,
    member_col: str,
    amount_col: Column | str,
    share_num: int = 4,
    share_den: int = 5,
) -> DataFrame:
    """Pareto (80/20) concentration readout over member revenue: the
    member count and fraction needed to cover ``share_num/share_den``
    (default 80%) of the total, and the revenue share held by the top
    20% of members. The threshold test is exact decimal arithmetic
    (den·cum ≥ num·total — never a float cumsum), members are ordered
    (amount DESC, member ASC) so ties are deterministic, and each
    emitted float is ONE division of exact values.

    Scale shape: reduce to member grain first (map-side partial), one
    member-grain window pass (rank + cumsum), then a 1-row reducing
    aggregate. Returns ONE row: (n_members, n_for_share,
    frac_for_share, top20_share).
    """
    amt = F.col(amount_col) if isinstance(amount_col, str) else amount_col
    members = df.groupBy(F.col(member_col).alias("_m")).agg(
        F.sum(amt).alias("_rev")
    )
    wo = Window.orderBy(F.desc("_rev"), F.asc("_m"))
    wall = Window.partitionBy()
    scored = members.select(
        "_m", "_rev",
        F.row_number().over(wo).cast("long").alias("_rank"),
        F.sum("_rev").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_cum"),
        F.sum("_rev").over(wall).alias("_total"),
        F.count("*").over(wall).cast("long").alias("_n"),
    )
    # top-20% member count = ceil(n/5) = floor((n+4)/5); explicit
    # floor() because a bare double->long CAST truncates in Spark but
    # ROUNDS in DuckDB.
    k20 = F.floor((F.col("_n") + 4) / 5).cast("long")
    flagged = scored.select(
        "_rank", "_n",
        F.when(
            F.col("_cum") * share_den >= F.col("_total") * share_num,
            F.col("_rank"),
        ).alias("_hit_rank"),
        F.when(F.col("_rank") <= k20, F.col("_cum")).alias("_cum_t20"),
        "_total",
    )
    return flagged.groupBy().agg(
        F.max("_n").alias("n_members"),
        F.min("_hit_rank").alias("n_for_share"),
        (
            F.min("_hit_rank").cast("double")
            / F.max("_n").cast("double")
        ).alias("frac_for_share"),
        (
            F.max("_cum_t20").cast("double")
            / F.max("_total").cast("double")
        ).alias("top20_share"),
    )


def gini_coefficient(
    df: DataFrame,
    member_col: str,
    amount_col: Column | str,
) -> DataFrame:
    """Gini coefficient of member totals — the inequality scalar
    (0 = perfectly even, →1 = one member holds everything) behind
    revenue-concentration and data-skew audits, computed by the exact
    sorted-cumsum identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with x
    ascending. Σ i·xᵢ and Σx stay exact DECIMAL (equal amounts commute
    — swapping tied ranks leaves Σ i·xᵢ unchanged, so the result is
    order-independent even though ranks aren't); each emitted float is
    ONE division of string-rendered exact values (a direct
    decimal→double cast is not correctly rounded in DuckDB), and the
    final subtraction is one fixed IEEE tree.

    Scale shape: the fact reduces to member grain first (map-side
    partial on the decimal sum); the rank + moment windows run on the
    REDUCED member-grain frame (the engine's accepted post-aggregate
    global-window shape). Returns ONE row (n_members, total_amount
    DOUBLE, gini DOUBLE — NULL when the total is 0).
    """
    amt = F.col(amount_col) if isinstance(amount_col, str) else amount_col
    members = df.groupBy(F.col(member_col).alias("_m")).agg(
        F.sum(amt).alias("_x")
    )
    wo = Window.orderBy(F.asc("_x"), F.asc("_m"))
    ranked = members.select(
        "_x",
        F.row_number().over(wo).cast("decimal(38,0)").alias("_i"),
    )
    sums = ranked.agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_i") * F.col("_x")).alias("_a"),
    )
    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")
    n = F.col("n_members")
    two_a = _dbl(F.col("_a") * F.lit(2))
    ns = _dbl(F.col("_s") * n.cast("decimal(38,0)"))
    gini = (two_a / ns) - (
        (n + 1).cast("double") / n.cast("double")
    )
    return sums.select(
        "n_members",
        _dbl(F.col("_s")).alias("total_amount"),
        F.when(F.col("_s") == 0, F.lit(None).cast("double"))
        .otherwise(gini)
        .alias("gini"),
    )


def category_mix_shift(
    df: DataFrame,
    category_col: str,
    period_col: Column | str,
) -> DataFrame:
    """Categorical mix-shift audit: the chi-square contribution table
    of category × period counts — which categories' shares moved
    between periods, the categorical sibling of the numeric KS drift
    probe. Per cell: observed count, expected count under independence
    (row_total · col_total / grand — one division of exact longs), and
    the (O−E)²/E contribution as one fixed IEEE tree. No total
    chi-square is emitted: summing per-cell doubles is accumulation-
    order-dependent, so the deterministic contract is the per-cell
    table (callers sum it driver-side if they want the statistic).

    Scale shape: the fact reduces to the bounded contingency grid
    FIRST (one keyed aggregate, map-side partial); the marginals are
    windows over grid-grain rows (|categories| × |periods|).
    """
    per = F.col(period_col) if isinstance(period_col, str) else period_col
    cells = df.groupBy(
        F.col(category_col).alias("category"), per.alias("period")
    ).agg(F.count("*").cast("long").alias("observed"))
    wr = Window.partitionBy("category")
    wc = Window.partitionBy("period")
    wall = Window.partitionBy()
    scored = cells.select(
        "category", "period", "observed",
        F.sum("observed").over(wr).cast("long").alias("_row"),
        F.sum("observed").over(wc).cast("long").alias("_col"),
        F.sum("observed").over(wall).cast("long").alias("_grand"),
    )
    expected = (
        (F.col("_row") * F.col("_col")).cast("double")
        / F.col("_grand").cast("double")
    )
    diff = F.col("observed").cast("double") - expected
    return scored.select(
        "category", "period", "observed",
        expected.alias("expected"),
        ((diff * diff) / expected).alias("contribution"),
    )


def lorenz_deciles(
    df: DataFrame,
    member_col: str,
    amount_col: Column | str,
) -> DataFrame:
    """Lorenz-curve decile table of member totals: members sorted by
    value ascending into NTILE(10) buckets, each with its member count,
    exact decile value sum, and the cumulative share of total value —
    the curve behind the Gini scalar (gini_coefficient) and the Pareto
    point (pareto_concentration), read when you need to SEE where the
    concentration lives.

    NTILE assigns the remainder to the lowest buckets in both engines
    (standard SQL), and the (value, member) total order makes bucket
    boundaries deterministic under ties. Value sums stay exact DECIMAL;
    cum_share and pop_share are ONE division each of string-rendered /
    exact operands.

    Scale shape: member-grain reduction first; ntile + cumsum windows
    run on the reduced frame; output is exactly 10 rows.
    """
    amt = F.col(amount_col) if isinstance(amount_col, str) else amount_col
    members = df.groupBy(F.col(member_col).alias("_m")).agg(
        F.sum(amt).alias("_x")
    )
    wo = Window.orderBy(F.asc("_x"), F.asc("_m"))
    tiled = members.select(
        "_x", F.ntile(10).over(wo).cast("int").alias("decile")
    )
    cells = tiled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("_x").alias("_dx"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")
    return cells.select(
        "decile", "n_members",
        _dbl(F.col("_dx")).alias("decile_value"),
        _dbl(F.sum("_dx").over(wcum)).alias("cum_value"),
        (
            _dbl(F.sum("_dx").over(wcum)) / _dbl(F.sum("_dx").over(wall))
        ).alias("cum_share"),
        (
            F.sum("n_members").over(wcum).cast("double")
            / F.sum("n_members").over(wall).cast("double")
        ).alias("pop_share"),
    )


def contingency_chi2(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Chi-square contingency table for two categorical columns: per
    observed (row, col) cell, the count, the independence-model
    expectation row_total·col_total/N, and the cell's chi-square
    contribution (obs − exp)²/exp — the association audit that says
    whether e.g. ship mode and return flag are independent before
    anyone trusts a segmented metric. Contributions are emitted PER
    CELL, not summed: a float sum across cells is order-dependent
    cross-engine, and the per-cell table is what the analyst reads
    anyway (which cells drive the dependence).

    Exactness: counts and totals are exact BIGINTs; row/col/grand
    totals come from window sums OVER THE REDUCED cell-grain frame
    (the temperature_mixture idiom — one scan, no re-aggregation
    joins, and the unpartitioned window carries only |rows|·|cols|
    post-agg cells); expected and contribution are fixed IEEE trees
    over exact casts, bit-identical both engines.

    Returns (row_col, col_col, n BIGINT, expected DOUBLE,
    chi2_contrib DOUBLE).
    """
    cells = (
        df.select(
            F.col(row_col).alias("r"), F.col(col_col).alias("c")
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rt = F.sum("n").over(Window.partitionBy("r")).cast("long")
    ct = F.sum("n").over(Window.partitionBy("c")).cast("long")
    gt = F.sum("n").over(Window.partitionBy()).cast("long")
    with_tot = cells.select(
        "r", "c", "n",
        rt.alias("rt"), ct.alias("ct"), gt.alias("gt"),
    )
    exp = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("gt").cast("double")
    )
    dev = F.col("n").cast("double") - F.col("exp")
    return with_tot.withColumn("exp", exp).select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        "n",
        F.col("exp").alias("expected"),
        (dev * dev / F.col("exp")).alias("chi2_contrib"),
    )


def simpson_diversity(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Simpson concentration / Gini-Simpson diversity of a categorical
    column per group: λ = Σ nᵢ(nᵢ−1) / (n(n−1)) — the exact
    probability that two draws WITHOUT replacement share a category —
    and its complement 1−λ (the diversity a mixture monitor tracks per
    corpus source: is this feed one-language, or balanced?). The
    entropy-based alternative needs ln (not correctly rounded
    cross-engine); Simpson's index is pure integer arithmetic plus ONE
    division, so it is the engine-exact diversity scalar.

    Scale shape: one (group, cat) keyed aggregate, then one group-grain
    aggregate over the category-grain rows — both map-side partial;
    Σnᵢ(nᵢ−1) and n(n−1) carried as DECIMAL(38,0) (BIGINT squares
    overflow past ~3·10⁹ rows per group) and rendered through the
    portable string cast. NULL when the group has < 2 rows. Returns
    (group, n BIGINT, n_categories BIGINT, simpson DOUBLE,
    gini_simpson DOUBLE).
    """
    d38 = "decimal(38,0)"
    cc = (
        df.select(
            F.col(group_col).alias("g"), F.col(cat_col).alias("c")
        )
        .groupBy("g", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sums = cc.groupBy("g").agg(
        F.sum(F.col("n").cast(d38)).alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            (F.col("n").cast(d38) * (F.col("n") - 1)).cast(d38)
        ).alias("num"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    lam = _dbl(F.col("num")) / _dbl(F.col("n") * (F.col("n") - 1))
    return sums.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("k").alias("n_categories"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(lam)
        .alias("simpson"),
        F.when(F.col("n") < 2, F.lit(None).cast("double"))
        .otherwise(F.lit(1.0) - lam)
        .alias("gini_simpson"),
    )


def spearman_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation between two columns — the
    monotone-association companion to :func:`feature_correlations`'s
    Pearson r (robust to outliers and nonlinear-but-monotone
    relationships, the right first question for "does balance predict
    spend?").

    Ties use AVERAGE ranks via the doubled-rank identity
    ``2·avgrank = RANK() + |{rows ≤ value}|`` — RANK() gives the tie
    block's min rank and the default RANGE frame's running count gives
    its max rank, so both integer terms come off the SAME sort (no
    second exchange per axis, no fractional ranks). Spearman rho is
    then Pearson r over the doubled ranks (scaling both axes by 2
    cancels exactly: the numerator picks up 4, each sqrt factor 2).

    Exactness: doubled ranks are integers; all six moments accumulate
    in DECIMAL(38,0); rho is one closed-form IEEE tree over
    string-cast-rendered operands (the assortativity idiom). NULL on
    zero variance (a constant axis). Rows with a NULL in either column
    are dropped pairwise-complete.

    Scale shape: two window sorts (one per axis) over the INPUT grain —
    intended for dimension-sized frames (entity grain, SF-bounded),
    not raw fact rows; reduce to entity grain first. The moment
    aggregate is one keyed hash agg; output is one row per group.
    """
    rows = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    wx = Window.partitionBy("g").orderBy("x")
    wy = Window.partitionBy("g").orderBy("y")
    ranked = rows.select(
        "g",
        (F.rank().over(wx) + F.count(F.lit(1)).over(wx))
        .cast("long")
        .alias("rx"),
        (F.rank().over(wy) + F.count(F.lit(1)).over(wy))
        .cast("long")
        .alias("ry"),
    )
    d38 = "decimal(38,0)"
    rx, ry = F.col("rx"), F.col("ry")
    sums = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(rx.cast(d38)).alias("sx"),
        F.sum(ry.cast(d38)).alias("sy"),
        F.sum((rx * ry).cast(d38)).alias("sxy"),
        F.sum((rx * rx).cast(d38)).alias("sxx"),
        F.sum((ry * ry).cast(d38)).alias("syy"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    num = _dbl(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    var_x = _dbl(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    var_y = _dbl(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    den = F.sqrt(var_x) * F.sqrt(var_y)
    return sums.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_rows"),
        F.when(den == 0.0, F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("spearman_rho"),
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    value: Column,
) -> DataFrame:
    """ABC inventory/revenue classification — the per-class companion
    to :func:`pareto_concentration`: rank members by exact-decimal
    value descending and split at the classic cumulative thresholds
    (A ≤ 80%, B ≤ 95%, C the tail), reporting each class's member
    count, value, and share.

    Boundary semantics (declared, oracle-mirrored): a member belongs
    to the FIRST class whose threshold its INCLUSIVE cumulative value
    still satisfies — the member that crosses 80% starts class B, so
    under extreme concentration class A can be empty. Threshold tests
    are exact integer-decimal cross-multiplications (cum·5 ≤ total·4,
    cum·20 ≤ total·19); ordering is the deterministic (value DESC,
    key) total order; each reported double is one IEEE expression
    over string-rendered decimal sums.

    Scale shape: the fact reduces to key grain map-side first; the
    cumulative window and the global total run over the REDUCED
    member frame (dimension-sized), and the output is ≤ 3 rows.
    """
    members = df.groupBy(F.col(key_col).alias("m")).agg(
        F.sum(value).alias("rev")
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("m")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    scored = members.select(
        "m",
        "rev",
        F.sum("rev").over(w).alias("cum"),
        F.sum("rev").over(Window.partitionBy()).alias("total"),
    )
    cum, total = F.col("cum"), F.col("total")
    cls = (
        F.when(cum * 5 <= total * 4, F.lit("A"))
        .when(cum * 20 <= total * 19, F.lit("B"))
        .otherwise(F.lit("C"))
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    agg = scored.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("rev").alias("_rev"),
        F.max("total").alias("_total"),
    )
    return agg.select(
        "abc_class",
        "n_members",
        _dbl(F.col("_rev")).alias("class_value"),
        (_dbl(F.col("_rev")) / _dbl(F.col("_total"))).alias("value_share"),
    )


def mann_whitney_by_flag(
    df: DataFrame,
    flag_col: str,
    value_col: str,
) -> DataFrame:
    """Mann–Whitney U rank-sum test between the flagged and unflagged
    populations of an integer-valued column — the distribution-free
    "is group A systematically larger?" test (the right tool when the
    value is skewed and a t-test's mean is the wrong summary), with
    full tie correction.

    All rank machinery runs on VALUE grain (the Lorenz pattern — no
    row-level sort): per value, total count t and flagged count d; the
    doubled midrank is ``2·cum_before + t + 1``; the doubled flagged
    rank sum ``2R = Σ d·midrank2`` is an exact DECIMAL(38,0), so
    ``2U = 2R − n1(n1+1)`` is exact. The tie-corrected normal
    approximation

        z = (2U − n1·n2) / (2·sqrt(var)),
        var = n1·n2/12 · ((N+1) − Σ(t³−t)/(N·(N−1)))

    is one fixed IEEE tree over string-rendered exact integers —
    bit-identical in any engine. Effect size is the rank-biserial
    ``r = 2U/(n1·n2) − 1`` ∈ [−1, 1].

    Scale shape: one reduction to value grain (map-side partials), one
    value-grain cumulative window, one global aggregate. Returns ONE
    row: (n_flagged, n_other, u2_flagged, rank_biserial, z). NULL
    z/effect when either group is empty or variance is zero (all
    values tied).
    """
    d38 = "decimal(38,0)"
    flag = F.col(flag_col).cast("boolean")
    v = df.select(
        F.when(flag, F.lit(1)).otherwise(F.lit(0)).alias("f"),
        F.col(value_col).cast("long").alias("v"),
    )
    grain = v.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.sum("f").cast("long").alias("d"),
    )
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = grain.select(
        "v",
        "t",
        "d",
        (F.sum("t").over(wc) - F.col("t")).cast("long").alias("cb"),
    )
    mid2 = (F.lit(2) * F.col("cb") + F.col("t") + 1).cast(d38)
    sums = c.agg(
        F.sum(F.col("d").cast(d38) * mid2).alias("r2"),
        F.sum(F.col("d").cast(d38)).alias("n1"),
        F.sum((F.col("t") - F.col("d")).cast(d38)).alias("n2"),
        F.sum(
            F.col("t").cast(d38) * F.col("t").cast(d38)
            * F.col("t").cast(d38)
            - F.col("t").cast(d38)
        ).alias("ties"),
    )

    def _dbl(col):
        return col.cast("string").cast("double")

    n1, n2 = F.col("n1"), F.col("n2")
    nn = n1 + n2
    u2 = (F.col("r2") - n1 * (n1 + 1)).alias("_u2")
    sums = sums.select("n1", "n2", "ties", u2)
    var = (
        (_dbl(n1) * _dbl(n2) / F.lit(12.0))
        * (
            _dbl(nn + 1)
            - _dbl(F.col("ties")) / (_dbl(nn) * _dbl(nn - 1))
        )
    )
    ok = (n1 > 0) & (n2 > 0)
    return sums.select(
        n1.cast("long").alias("n_flagged"),
        n2.cast("long").alias("n_other"),
        F.col("_u2").cast("long").alias("u2_flagged"),
        F.when(
            ok, _dbl(F.col("_u2")) / (_dbl(n1) * _dbl(n2)) - F.lit(1.0)
        ).alias("rank_biserial"),
        F.when(
            ok & (var > 0.0),
            (_dbl(F.col("_u2")) - _dbl(n1) * _dbl(n2))
            / (F.lit(2.0) * F.sqrt(var)),
        ).alias("z"),
    )


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    precision: int = 12,
    scale: int = 2,
    smoothing_n: int = 0,
    prior_num: int = 0,
    prior_den: int = 1,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Leave-one-out target encoding — the ML feature that replaces a
    high-cardinality category with the mean target of its OTHER
    members: ``enc = (sum_cat − own) / (n_cat − 1)`` — excluding the
    row's own target so the feature cannot leak the label it will be
    asked to predict (the classic target-leakage trap of naive mean
    encoding). Optional additive smoothing toward a prior pulls rare
    categories toward ``prior_num/prior_den``:
    ``enc = (sum−own + m·prior) / (n−1+m)``.

    Exactness: per-category sums accumulate in pinned DECIMAL; the
    encoding is ONE IEEE division per row over string-rendered exact
    operands — deterministic in any engine. Singleton categories
    (n = 1, nothing to leave out) encode NULL unless smoothing is on.

    Scale shape: one keyed reduction to category grain + one keyed
    join back (broadcast-able when the category dimension is small;
    AQE decides) — no window over raw rows, no per-row shuffle
    beyond the join. Adds ``(category, target, n_cat, target_enc)``.
    """
    d = f"decimal({precision},{scale})"
    stats = df.groupBy(F.col(category_col).alias("_c")).agg(
        F.sum(F.col(target_col).cast(d)).alias("_s"),
        F.count(F.lit(1)).cast("long").alias("n_cat"),
    )
    j = df.select(
        *carry_cols,
        F.col(category_col).alias("_c"),
        F.col(target_col).alias("_t"),
    ).join(stats, "_c")

    def _dbl(c):
        return c.cast("string").cast("double")

    num = _dbl(F.col("_s") - F.col("_t").cast(d)) + F.lit(
        float(smoothing_n)
    ) * (F.lit(float(prior_num)) / F.lit(float(prior_den)))
    den = (F.col("n_cat") - 1 + F.lit(int(smoothing_n))).cast("double")
    return j.select(
        *carry_cols,
        F.col("_c").alias(category_col),
        F.col("_t").alias(target_col),
        "n_cat",
        F.when(den == 0.0, F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("target_enc"),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    precision: int = 12,
    scale: int = 2,
) -> DataFrame:
    """Winsorized mean — the robust location estimate that clips the
    tails to exact percentile boundaries instead of dropping them
    (outlier-resistant where the raw mean is one fat-finger order
    away from garbage, and smoother than a median on lumpy data).

    Boundaries are EXACT: percentile p = the smallest value whose
    inclusive cumulative count reaches p% (integer cross-multiply,
    the engine's quantile idiom); both boundaries, the total, and the
    clipped sum all come off ONE value-grain frame via windows — no
    join, no second scan. Values pin to DECIMAL so the clipped sum is
    exact and partition-order-free; each reported mean is one IEEE
    division via the string-render cast.

    Scale shape: one map-side reduction to value grain, one
    value-grain sort shared by the cumulative and global windows,
    one 1-row aggregate. Returns (n_rows, mean, winsorized_mean,
    lo_bound, hi_bound, n_clipped_lo, n_clipped_hi).
    """
    d = f"decimal({precision},{scale})"
    v = df.select(F.col(value_col).cast(d).alias("v")).filter(
        F.col("v").isNotNull()
    )
    grain = v.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    c = grain.select(
        "v",
        "cnt",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("n"),
    )
    lo = F.min(
        F.when(F.col("cum") * 100 >= F.col("n") * int(lo_pct), F.col("v"))
    ).over(wall)
    hi = F.min(
        F.when(F.col("cum") * 100 >= F.col("n") * int(hi_pct), F.col("v"))
    ).over(wall)
    framed = c.select(
        "v", "cnt", "n", lo.alias("lo"), hi.alias("hi")
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))

    def _dbl(col):
        return col.cast("string").cast("double")

    agg = framed.agg(
        F.max("n").alias("n_rows"),
        F.sum(F.col("v") * F.col("cnt")).alias("_sum"),
        F.sum(clipped * F.col("cnt")).alias("_wsum"),
        F.max("lo").alias("lo_b"),
        F.max("hi").alias("hi_b"),
        F.sum(
            F.when(F.col("v") < F.col("lo"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("n_clipped_lo"),
        F.sum(
            F.when(F.col("v") > F.col("hi"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("n_clipped_hi"),
    )
    return agg.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        (_dbl(F.col("_sum")) / F.col("n_rows").cast("double")).alias(
            "mean"
        ),
        (_dbl(F.col("_wsum")) / F.col("n_rows").cast("double")).alias(
            "winsorized_mean"
        ),
        _dbl(F.col("lo_b")).alias("lo_bound"),
        _dbl(F.col("hi_b")).alias("hi_bound"),
        "n_clipped_lo",
        "n_clipped_hi",
    )


def mix_tv_drift(
    df: DataFrame,
    ts_col: str = "ts",
    cat_col: str = "event_type",
) -> DataFrame:
    """Week-over-week total-variation distance of a categorical mix —
    the drift metric for COMPOSITION where ks_drift tracks a value
    distribution's shape: TV(p, q) = max over event subsets of
    |p(S) - q(S)| = half the L1 gap between consecutive weekly
    category shares. A TV of 0.08 reads directly as "8% of this
    week's traffic is differently typed than last week's" — the
    population-mix alarm (new client version, bot wave, logging
    regression) that per-type z-scores fire late on because each type
    is tested alone.

    Exactness: the L1 numerator cross-multiplies integer counts
    (|n_cur*N_prev - n_prev*N_cur| accumulated in DECIMAL(38,0) —
    order-independent), and ONE string-parse double division by
    2*N_cur*N_prev renders the statistic, so the value is
    bit-identical across engines and partition orders (the log-free
    discipline: PSI's ln() is NOT reproducible across JVM/libm,
    TV needs no transcendental and bounds the same drift).

    Scale shape: one (week, category)-keyed count aggregate is the
    only corpus-sized shuffle; everything after runs at week- and
    (week x category)-grain (calendar x enum bounded). The
    consecutive-week pairing is a full-outer self-join of the REDUCED
    frame on (week+7d, category) — absent categories count as 0 on
    either side. Weeks with zero events produce no pair row at all
    (nothing observed, nothing to compare — documented, not silent).

    Returns (week DATE — the LATER week of each pair, n_prev BIGINT,
    n_cur BIGINT, n_types BIGINT — categories in the union,
    tv_distance DOUBLE).
    """
    d38 = "decimal(38,0)"
    wt = (
        df.select(
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
            F.col(cat_col).alias("cat"),
        )
        .groupBy("wk", "cat")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        # lineage cut: wt feeds totals + both pairing sides — without it
        # Catalyst re-derives each use from the raw scan (4x the fact);
        # the frame is (week x category) grain, calendar x enum bounded
        .localCheckpoint()
    )
    totals = wt.groupBy("wk").agg(F.sum("n").cast("long").alias("nt"))
    cur = wt.select(
        F.col("wk").alias("c_wk"), "cat", F.col("n").alias("n_cur")
    )
    prev = wt.select(
        F.date_add(F.col("wk"), 7).alias("c_wk"),
        "cat",
        F.col("n").alias("n_prev"),
    )
    # full outer at (week, category) grain: a category seen in only one
    # of the two weeks contributes its whole share to the gap
    pairs = cur.join(prev, ["c_wk", "cat"], "full_outer").select(
        "c_wk",
        "cat",
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
    )
    # keep only weeks where BOTH endpoints saw traffic (inner joins to
    # the week totals drop the boundary weeks of the observed span)
    tc = totals.select(F.col("wk").alias("c_wk"), F.col("nt").alias("n_cur_t"))
    tp = totals.select(
        F.date_add(F.col("wk"), 7).alias("c_wk"), F.col("nt").alias("n_prev_t")
    )
    framed = pairs.join(tc, "c_wk").join(tp, "c_wk")
    gap = F.abs(
        F.col("n_cur").cast(d38) * F.col("n_prev_t").cast(d38)
        - F.col("n_prev").cast(d38) * F.col("n_cur_t").cast(d38)
    ).cast(d38)
    agg = framed.groupBy(F.col("c_wk").alias("week")).agg(
        F.max("n_prev_t").cast("long").alias("n_prev"),
        F.max("n_cur_t").cast("long").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(gap).cast(d38).alias("_l1_num"),
    )

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    den = (
        F.lit(2).cast(d38)
        * F.col("n_cur").cast(d38)
        * F.col("n_prev").cast(d38)
    ).cast(d38)
    return agg.select(
        "week",
        "n_prev",
        "n_cur",
        "n_types",
        (_dbl(F.col("_l1_num")) / _dbl(den)).alias("tv_distance"),
    )


def cramers_v_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Cramér's V association matrix over categorical columns
    — the feature-association screen (which columns carry the same
    signal?) that contingency_chi2 answers for ONE pair, per cell.
    This operator reduces every unordered column pair to the SCALAR
    chi-square and V = sqrt(chi2 / (N * min(r-1, c-1))), the
    normalized 0..1 association strength feature selection and leakage
    hunts rank by.

    Determinism (the ordered-fold idiom): a chi-square SCALAR sums
    per-cell float contributions, and a floating sum is
    order-dependent — contingency_chi2 therefore stays per-cell. Here
    the per-pair cell set is ENUM-BOUNDED (r*c cells), so the cells
    are collected into an array sorted by (a, b) and folded
    left-to-right with F.aggregate: both engines add the SAME
    IEEE doubles in the SAME order, making the scalar bit-identical
    (the DuckDB twin folds list(... ORDER BY a, b) with list_reduce).
    The fold list is bounded by the category-cardinality product —
    never data-sized; pairs whose cardinality is data-scaled (ids,
    timestamps) are contract-excluded.

    Scale shape: ONE scan of the input explodes each row into its
    column pairs (pairs * rows, pairs = C(k,2) a small constant), one
    (pair, a, b)-keyed count aggregate is the only corpus-sized
    shuffle; windows and the fold run at cell grain. V guards the
    degenerate single-level column with NULL rather than a division
    by zero.

    Returns (col_pair STRING, n BIGINT, r_levels BIGINT,
    c_levels BIGINT, dof BIGINT, chi2 DOUBLE, cramers_v DOUBLE).
    """
    structs = []
    names = list(cols)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            structs.append(
                F.struct(
                    F.lit(f"{a}|{b}").alias("pair"),
                    F.col(a).cast("string").alias("a"),
                    F.col(b).cast("string").alias("b"),
                )
            )
    long = df.select(F.explode(F.array(*structs)).alias("s")).select(
        "s.pair", "s.a", "s.b"
    )
    cells = long.groupBy("pair", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
        # lineage cut: cells feeds the marginals, the grid and the stats
        # frame — without it each use re-scans and re-explodes the input
        # (5x the fact); the frame is cell grain, enum-bounded
    ).localCheckpoint()
    # DENSE r x c grid per pair: chi-square owes mass for STRUCTURAL
    # ZEROS too (a never-observed (a, b) combination under strong
    # association contributes its full expectation) — folding observed
    # cells only understates chi2 and caps V below 1 even for a
    # perfect association. The grid is marginal x marginal within each
    # pair (enum-bounded), built by equi-joins on pair — never a
    # row-level expansion.
    ra = cells.groupBy("pair", "a").agg(F.sum("n").cast("long").alias("rt"))
    cb = cells.groupBy("pair", "b").agg(F.sum("n").cast("long").alias("ct"))
    gtot = cells.groupBy("pair").agg(F.sum("n").cast("long").alias("gt"))
    dense = (
        ra.join(cb, "pair")
        .join(gtot, "pair")
        .join(cells, ["pair", "a", "b"], "left")
        .select(
            "pair",
            "a",
            "b",
            "rt",
            "ct",
            "gt",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("gt").cast("double")
    )
    term = (
        (F.col("n").cast("double") - e) * (F.col("n").cast("double") - e) / e
    )
    tot = dense.select("pair", "a", "b", term.alias("t"))
    agg = (
        cells.groupBy("pair")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.countDistinct("a").cast("long").alias("r_levels"),
            F.countDistinct("b").cast("long").alias("c_levels"),
        )
        .join(
            tot.groupBy("pair").agg(
                F.array_sort(
                    F.collect_list(F.struct("a", "b", "t"))
                ).alias("xs")
            ),
            "pair",
        )
    )
    chi2 = F.aggregate(
        "xs", F.lit(0.0), lambda acc, s: acc + s["t"]
    )
    mind = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    return agg.select(
        F.col("pair").alias("col_pair"),
        "n",
        "r_levels",
        "c_levels",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
        .cast("long")
        .alias("dof"),
        chi2.alias("chi2"),
        F.when(
            mind > 0,
            F.sqrt(
                chi2 / (F.col("n") * mind).cast("double")
            ),
        ).alias("cramers_v"),
    )


def mahalanobis_outliers_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Top-N bivariate Mahalanobis outliers — the CORRELATION-aware
    outlier score the univariate family (MAD, z-score, Tukey fences)
    cannot produce: a point can be unremarkable on each axis yet far
    off the joint distribution's ellipse (high balance + near-zero
    spend), and Mahalanobis distance is the classic detector. The 2x2
    case needs no matrix library: the inverse is closed-form adjugate
    over determinant.

    Exactness: ``x_col``/``y_col`` must be INTEGER-VALUED decimals
    (scale the inputs to cents first — the caller's contract): every
    moment (n, Sx, Sy, Sxx, Syy, Sxy) and every scaled deviation
    (z_x = n*x - Sx) then accumulates in DECIMAL(38,0) with no
    rounding anywhere (integer decimal arithmetic never triggers
    Spark's scale-truncation rules), and the final
    d^2 = (n-1)/n * (zx^2*Cyy - 2*zx*zy*Cxy + zy^2*Cxx) / det(C)
    is ONE fixed closed-form IEEE tree over string-parsed doubles —
    bit-identical cross-engine. The unit scaling cancels in d^2.

    Scale shape: one reducing aggregate to a 1-row moment rider
    (CROSS_OK broadcast), one per-row scoring pass, and a global
    top-N that plans as TakeOrderedAndProject under the
    (d^2 desc, id) total order. Degenerate inputs (det(C) = 0 —
    a constant or perfectly collinear column) return NULL scores
    rather than a division blow-up.

    Returns (id, x, y, maha_sq DOUBLE, rnk INT) — top_n rows.
    """
    d38 = "decimal(38,0)"

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast(d38).alias("x"),
        F.col(y_col).cast(d38).alias("y"),
        # lineage cut: base feeds the moment rider AND the scoring pass —
        # without it the caller's upstream join/aggregate runs twice.
        # This one is ENTITY-grain (data-sized): the materialization is
        # the deliberate persist-vs-recompute call every two-pass
        # algorithm makes; the score pass cannot start before the
        # moments exist anyway.
    ).localCheckpoint()
    m = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast(d38).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
    )
    # 1-row moment rider (CROSS_OK: the grand-total rider pattern)
    j = base.crossJoin(F.broadcast(m))
    zx = _dbl((F.col("n") * F.col("x") - F.col("sx")).cast(d38))
    zy = _dbl((F.col("n") * F.col("y") - F.col("sy")).cast(d38))
    cxx = _dbl((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d38))
    cyy = _dbl((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(d38))
    cxy = _dbl((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d38))
    det = cxx * cyy - cxy * cxy
    quad = zx * zx * cyy - F.lit(2.0) * zx * zy * cxy + zy * zy * cxx
    nn = F.col("n").cast("string").cast("double")
    d2 = F.when(
        det != F.lit(0.0),
        (nn - F.lit(1.0)) / nn * quad / det,
    )
    scored = j.select(
        "id", "x", "y", d2.alias("maha_sq")
    ).orderBy(F.col("maha_sq").desc_nulls_last(), F.col("id")).limit(top_n)
    w = Window.orderBy(F.col("maha_sq").desc_nulls_last(), F.col("id"))
    return scored.select(
        "id", "x", "y", "maha_sq", F.row_number().over(w).cast("int").alias("rnk")
    )
