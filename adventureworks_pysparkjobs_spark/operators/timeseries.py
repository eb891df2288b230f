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


def ewma_daily_counts(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 8,
) -> DataFrame:
    """Exponentially weighted moving average of the per-key daily count
    series with a ONE-DAY HALF-LIFE over a trailing ``window_days``
    window — the smoothed-volume feature behind alerting baselines and
    trend dashboards (yesterday counts half as much as today, the day
    before a quarter, ...).

    Semantics: the series is zero-densified over each key's observed
    [min, max] day span; for day d,
    ``ewma = sum_{k=0..W-1} x_{d-k} * 2^{W-1-k} / (2^W - 1)`` — the
    truncated half-life kernel with an exact power-of-two weight table.
    Only days with a FULL trailing window (d >= d0 + W - 1) are
    emitted, so every output row uses the same 2^W - 1 normalizer.

    Exactness: counts are integers, weights are integer powers of two,
    so the weighted sum is one exact BIGINT; the final ewma is a single
    IEEE division of two exactly-representable operands — bit-identical
    in any engine (no float accumulation order anywhere).

    Scale shape: raw rows reduce to (key, day) grain map-side FIRST;
    the dense spine explodes off a per-key 1-row bounds aggregate; the
    kernel is a W-literal array explode on DAY-GRAIN rows re-aggregated
    by target day — day-grain × W intermediate, thousands of rows per
    key per decade at ANY corpus scale. Two keyed day-grain shuffles
    beyond the initial reduction; no window sort over raw rows.
    """
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
    daily = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = daily.groupBy("k").agg(
        F.min("d").alias("_d0"), F.max("d").alias("_d1")
    )
    spine = bounds.select(
        "k", F.explode(F.sequence("_d0", "_d1")).alias("d")
    )
    dense = spine.join(daily, ["k", "d"], "left").select(
        "k", "d", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    # kernel: a (lag k, weight 2^{W-1-k}) literal table exploded onto
    # day-grain rows — each observation contributes to W target days.
    kernel = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.lit(1 << (window_days - 1 - k)).cast("long").alias("w"),
            )
            for k in range(window_days)
        ]
    )
    contrib = dense.select(
        "k",
        "d",
        "x",
        F.explode(kernel).alias("ker"),
    ).select(
        "k",
        (F.col("d") + F.col("ker.lag")).alias("td"),
        (F.col("x") * F.col("ker.w")).cast("long").alias("wx"),
        F.when(F.col("ker.lag") == 0, F.col("x")).alias("x0"),
    )
    norm = float((1 << window_days) - 1)
    out = (
        contrib.groupBy("k", "td")
        .agg(
            F.sum("wx").cast("long").alias("ewma_scaled"),
            F.sum("x0").cast("long").alias("cnt"),
        )
        .join(bounds, "k")
        .filter(
            (F.col("td") >= F.col("_d0") + (window_days - 1))
            & (F.col("td") <= F.col("_d1"))
        )
    )
    return out.select(
        F.col("k").alias(key_col),
        F.col("td").alias("d"),
        # cnt is never NULL here: every emitted td lies inside the dense
        # span, so the lag-0 contribution always exists (the filter above
        # guarantees td >= _d0 + window_days - 1 >= the first dense day).
        F.col("cnt").cast("long").alias("cnt"),
        "ewma_scaled",
        (F.col("ewma_scaled").cast("double") / F.lit(norm)).alias("ewma"),
    )


def rolling_trend_slope(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 28,
) -> DataFrame:
    """Per-key trailing ``window_days``-day OLS trend of the daily
    count series — the local slope feature ("is this event type
    accelerating?") computed at every observed day, on the SPARSE
    series (only days with activity enter the regression; gaps carry
    no fabricated zeros, so the slope reads through outage days).

    For each (key, day) the regression is over the (epoch_day, count)
    points in ``RANGE BETWEEN window_days-1 PRECEDING AND CURRENT
    ROW``:  ``slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)`` — NULL when
    the frame holds a single day (zero x-variance).

    Exactness: epoch-day x and count y are integers; all frame sums
    are exact BIGINTs (bounded: |frame| ≤ window_days day-grain rows,
    epoch days < 2^16, so every product stays far below 2^63); the
    slope is one IEEE division of two exact BIGINT→DOUBLE conversions
    — bit-identical in any engine.

    Scale shape: raw rows reduce to (key, day) grain map-side FIRST;
    the RANGE frame runs over day-grain rows (one sort per key of
    ~365 rows/year regardless of corpus size). One reduction shuffle +
    one day-grain window exchange.
    """
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
    daily = (
        df.select(F.col(key_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("d")
        .rangeBetween(-(window_days - 1), 0)
    )
    x = F.col("d").cast("long")
    y = F.col("y")
    framed = daily.select(
        "k",
        "d",
        "y",
        F.count(F.lit(1)).over(w).cast("long").alias("n_obs"),
        F.sum(x).over(w).cast("long").alias("sx"),
        F.sum(y).over(w).cast("long").alias("sy"),
        F.sum(x * y).over(w).cast("long").alias("sxy"),
        F.sum(x * x).over(w).cast("long").alias("sxx"),
    )
    num = (
        F.col("n_obs") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("long")
    den = (
        F.col("n_obs") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("long")
    return framed.select(
        F.col("k").alias(key_col),
        "d",
        "y",
        "n_obs",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
    )


def daily_cross_correlation(
    df: DataFrame,
    type_x: str,
    type_y: str,
    max_lag: int = 7,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Lagged cross-correlation between two event types' daily count
    series: for every lag L in [−max_lag, max_lag], the Pearson r of
    (x_d, y_{d+L}) over the zero-densified common day span — "do
    purchases follow clicks, and by how many days?" (the argmax lag is
    the lead-lag readout behind attribution windows and forecasting
    feature selection).

    Exactness: both series densify over the SAME global [min, max] day
    span (so lag L has exactly span−|L| pairs); the lag pairing is a
    keyed EQUI join of the y series exploded over a (2·max_lag+1)-
    literal lag table (no window, no sort); all five moment sums per
    lag are exact DECIMAL(38,0); r is the assortativity-idiom closed
    IEEE form, NULL on zero variance.

    Scale shape: raw events reduce to (type, day) grain map-side
    FIRST; everything after is day-grain × lags (hundreds of rows per
    year at ANY corpus scale): one bounds aggregate, one dense-spine
    left join per series, one lag-keyed equi join, one |lags|-row
    moment aggregate. Returns (lag, n_pairs, xcorr).
    """
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
    daily = (
        df.filter(F.col(type_col).isin([type_x, type_y]))
        .select(F.col(type_col).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bounds = daily.agg(F.min("d").alias("_d0"), F.max("d").alias("_d1"))
    spine = bounds.select(
        F.explode(F.sequence("_d0", "_d1")).alias("d")
    )

    def dense(t: str, out: str) -> DataFrame:
        side = daily.filter(F.col("k") == t).select("d", "x")
        return spine.join(side, "d", "left").select(
            "d", F.coalesce("x", F.lit(0)).cast("long").alias(out)
        )

    dx = dense(type_x, "vx")
    dy = dense(type_y, "vy")
    lags = F.array(
        *[F.lit(lag) for lag in range(-max_lag, max_lag + 1)]
    )
    shifted = dy.select(
        F.explode(lags).alias("lag"), "d", "vy"
    ).select("lag", (F.col("d") - F.col("lag")).alias("d"), "vy")
    pairs = dx.join(shifted, "d").select("lag", "vx", "vy")
    d38 = "decimal(38,0)"
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast(d38).alias("m"),
        F.sum(F.col("vx").cast(d38)).alias("sx"),
        F.sum(F.col("vy").cast(d38)).alias("sy"),
        F.sum((F.col("vx") * F.col("vy")).cast(d38)).alias("sxy"),
        F.sum((F.col("vx") * F.col("vx")).cast(d38)).alias("sxx"),
        F.sum((F.col("vy") * F.col("vy")).cast(d38)).alias("syy"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    num = _dbl(F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
    var_x = _dbl(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    var_y = _dbl(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    den = F.sqrt(var_x) * F.sqrt(var_y)
    return sums.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("m").cast("long").alias("n_pairs"),
        F.when(den == 0.0, F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("xcorr"),
    )


def kendall_tau_daily(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Kendall's tau-b rank correlation between the DAILY COUNT series
    of every pair of keys — the robust "do these two activities move
    together?" statistic (rank-based, so a single spike day cannot
    dominate it the way it dominates Pearson).

    Counting formulation (exact, no ranks needed): over all day pairs
    d1 < d2 within the pair's dense day span, classify the joint move
    (concordant / discordant / tied on x / tied on y / tied on both);
    tau_b = (C - D) / sqrt((n0 - tx)(n0 - ty)) with n0 = the number of
    day pairs, tx/ty = pairs tied on each axis. Missing days count as
    ZERO activity (they carry rank information), via a dense
    day x key grid.

    Exactness: all five pair counts are exact BIGINTs from integer
    comparisons; tau is sqrt of one product of two exact-int-valued
    doubles and one division — +,-,*,/ and sqrt are IEEE correctly
    rounded in both engines, so the identical expression tree is
    bit-exact (the supplier_return_rate_wilson rule). n0 is bounded by
    the calendar (span_days^2 / 2), so the counts stay far below 2^53.

    Scale shape: one (day, key) count aggregation over the fact, a
    calendar-bounded dense grid (distinct-days x distinct-keys — both
    aggregate-reduced), then a day-grain self-join per key pair:
    O(keys^2 * span^2) rows, independent of fact size. Returns
    (key_a, key_b, n_days, n_pairs, concordant, discordant, tau_b).
    """
    daily = df.select(
        F.to_date(F.col(ts_col)).alias("d"),
        F.col(key_col).alias("k"),
    ).groupBy("d", "k").agg(F.count(F.lit(1)).alias("c"))
    days = daily.select("d").distinct()
    keys = daily.select("k").distinct()
    # CROSS_OK: dense day x key grid — both sides aggregate-reduced
    # (calendar-bounded distinct days, enum-bounded distinct keys).
    grid = days.crossJoin(keys)
    dense = grid.join(daily, ["d", "k"], "left").select(
        "d", "k", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    a = dense.select(
        F.col("k").alias("k_a"), F.col("d").alias("d_a"),
        F.col("c").alias("x"),
    )
    b = dense.select(
        F.col("k").alias("k_b"), F.col("d").alias("d_b"),
        F.col("c").alias("y"),
    )
    # per key pair: all day pairs d_a < d_b of the two series
    xa = a.select("k_a", F.col("d_a").alias("d"), "x")
    yb = b.select("k_b", F.col("d_b").alias("d"), "y")
    # localCheckpoint: `joined` is referenced by BOTH sides of the pair
    # self-join below, and Catalyst re-derives a reused lineage from the
    # source (the temperature_mixture lesson) — without the cut the fact
    # would be scanned ~12x. The checkpointed frame is day x pair grain
    # (calendar x keys^2 bounded), trivially small at any corpus scale.
    joined = xa.join(yb, "d").filter(F.col("k_a") < F.col("k_b")).select(
        "k_a", "k_b", "d", "x", "y"
    ).localCheckpoint()
    p1 = joined.select(
        "k_a", "k_b", F.col("d").alias("d1"),
        F.col("x").alias("x1"), F.col("y").alias("y1"),
    )
    p2 = joined.select(
        "k_a", "k_b", F.col("d").alias("d2"),
        F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    pairs = p1.join(p2, ["k_a", "k_b"]).filter(F.col("d1") < F.col("d2"))
    sx = F.col("x2") - F.col("x1")
    sy = F.col("y2") - F.col("y1")
    agg = pairs.groupBy("k_a", "k_b").agg(
        F.countDistinct("d1").alias("_nd1"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(((sx > 0) & (sy > 0)) | ((sx < 0) & (sy < 0)), 1)
            .otherwise(0)
        ).cast("long").alias("concordant"),
        F.sum(
            F.when(((sx > 0) & (sy < 0)) | ((sx < 0) & (sy > 0)), 1)
            .otherwise(0)
        ).cast("long").alias("discordant"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).cast("long").alias("_tx"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).cast("long").alias("_ty"),
    )
    nx = (F.col("n_pairs") - F.col("_tx")).cast("double")
    ny = (F.col("n_pairs") - F.col("_ty")).cast("double")
    den = F.sqrt(nx * ny)
    return agg.select(
        "k_a", "k_b",
        (F.col("_nd1") + F.lit(1)).cast("long").alias("n_days"),
        "n_pairs", "concordant", "discordant",
        F.when(den == 0.0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("concordant") - F.col("discordant")).cast("double") / den
        )
        .alias("tau_b"),
    )


def theilsen_daily_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Theil–Sen trend estimate per key: the MEDIAN of all pairwise
    slopes of the daily count series — the robust alternative to the
    OLS slope (a 29% contamination breakdown point vs OLS's zero; one
    corrupted day cannot move it).

    Missing days count as zero activity via the per-key dense day span
    (gaps carry trend information). Each pairwise slope is ONE IEEE
    division of exact integers ((c2-c1)/(d2-d1)) — identical in both
    engines — and the median is exact rank selection over the slope
    multiset: lower+upper median averaged with one (a+b)/2, so every
    emitted float is a composition of portable operations.

    Scale shape: one (day, key) aggregation over the fact, a per-key
    dense spine (explode of the calendar-bounded span), then a per-key
    day self-join: O(keys * span^2) slope rows — calendar-bounded,
    independent of fact size — ranked by one per-key window. Returns
    (key, n_days, n_slopes, slope_per_day).
    """
    daily = df.select(
        F.to_date(F.col(ts_col)).alias("d"),
        F.col(key_col).alias("k"),
    ).groupBy("k", "d").agg(F.count(F.lit(1)).alias("c"))
    span = daily.groupBy("k").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = span.select(
        "k",
        F.explode(
            F.sequence(F.lit(0), F.datediff("d1", "d0"))
        ).alias("off"),
        F.col("d0"),
    ).select("k", F.date_add("d0", F.col("off")).alias("d"))
    # localCheckpoint: dense is referenced three times (both slope sides
    # + n_days) — cut the lineage so the fact is aggregated once; the
    # frame is day x key grain, calendar-bounded.
    dense = spine.join(daily, ["k", "d"], "left").select(
        "k", "d", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    ).localCheckpoint()
    p1 = dense.select("k", F.col("d").alias("d1"), F.col("c").alias("c1"))
    p2 = dense.select("k", F.col("d").alias("d2"), F.col("c").alias("c2"))
    slopes = (
        p1.join(p2, "k")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "k",
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / F.datediff("d2", "d1").cast("double")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("k").orderBy("s")
    ranked = slopes.withColumn("rn", F.row_number().over(w))
    counts = slopes.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_slopes")
    )
    med = (
        ranked.join(counts, "k")
        .filter(
            # lower median rank (n+1) div 2 and upper median rank
            # n div 2 + 1 — equal for odd n (integer div, not float /)
            (F.col("rn") == F.expr("(n_slopes + 1) div 2"))
            | (F.col("rn") == F.expr("n_slopes div 2 + 1"))
        )
        .groupBy("k", "n_slopes")
        .agg(
            ((F.min("s") + F.max("s")) / F.lit(2.0)).alias("slope_per_day")
        )
    )
    ndays = dense.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return ndays.join(med, "k").select(
        F.col("k").alias(key_col), "n_days", "n_slopes", "slope_per_day"
    )
