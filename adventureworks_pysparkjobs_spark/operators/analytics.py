"""Behavioral / BI analytics operators: market-basket association
rules, sequential funnels, cohort retention, and rolling z-score
anomaly detection.

These extend the reference's aggregate surface (transform_to_bq.py's
groupBy rollup is the only aggregation it ships) with the four
analytics shapes every warehouse team layers on top of a star schema.
Cross-engine determinism follows queries/catalog.py: integer/decimal
aggregation only, each double produced by ONE identically-ordered IEEE
expression over exact operands.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .relational import dec


def pair_counts(
    items: DataFrame,
    min_pair_count: int = 2,
    max_basket_size: int = 200,
) -> DataFrame:
    """Co-occurrence pair counts over a ``(basket, item)`` frame:
    posting-list expansion (sorted per-basket item array, i<j pairs
    exploded inside one codegen stage), capped by ``max_basket_size``
    so a degenerate basket cannot create a quadratic candidate set.
    Input rows MAY repeat — ``collect_set`` dedups inside the basket
    aggregate, so callers need no upstream ``.distinct()`` (fusing the
    dedup into the aggregate removes one full shuffle of the fact
    frame). Returns (item_a, item_b, pair_n) with item_a < item_b.
    Shared by ``basket_pairs`` (association rules) and the co-purchase
    graph feeding ``graph.pagerank`` / ``graph.triangle_counts``."""
    baskets = (
        items.groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("arr"))
        .filter(
            (F.size("arr") >= 2) & (F.size("arr") <= max_basket_size)
        )
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("arr"),
            lambda x, i: F.transform(
                F.slice(F.col("arr"), i + 2, F.size(F.col("arr"))),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.item_a").alias("item_a"),
            F.col("p.item_b").alias("item_b"),
        )
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_count)
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int = 200,
) -> DataFrame:
    """Market-basket co-occurrence mining: support / confidence / lift
    for every item pair appearing in at least ``min_pair_count``
    baskets.

    Pair generation is the same posting-list expansion as
    ``dedup.ngram_jaccard_pairs`` — distinct items per basket are
    collected into one sorted array and i<j pairs explode inside a
    single codegen stage, so the cost is Σ basket_size², bounded by
    ``max_basket_size`` (a degenerate basket holding half the catalog
    cannot create a quadratic candidate set; oversized baskets are
    dropped, a declared semantic mirrored in oracles). Three keyed
    shuffles total (distinct, basket collect, pair count); the two
    item-count joins are vocabulary-sized, so AQE picks their strategy
    — no forced broadcast.

    Metrics: support = pair_n / n_baskets, confidence(a→b) = pair_n /
    n_a (and symmetrically b→a), lift = support / (supp_a · supp_b).
    Every ratio is IEEE division of exact integer counts, in the same
    operand order the SQL oracle uses, so doubles are engine-identical.
    """
    # items (a full fact-table distinct — one keyed shuffle) feeds FOUR
    # consumers below (n_baskets, item_counts via ca AND cb, pair_counts);
    # uncached, each consumer replays the distinct and its fact scan.
    # Cache it MEMORY_AND_DISK (the shingle_arrays argument: reuse saves
    # 3 fact re-scans; eviction merely recomputes). item_counts is
    # item-grain and used twice, so it is cached too. Measured at sf0.1
    # (cached-plan AQE on): best-of-3 1.62 s -> 1.21 s. (Cache lifetime
    # is session-scoped by contract — see bm25_topk's note in text.py.)
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct().cache()
    n_baskets = items.select(
        F.count_distinct("basket").alias("n_baskets")
    )
    item_counts = items.groupBy("item").agg(
        F.count("*").alias("item_n")
    ).cache()
    pairs = pair_counts(items, min_pair_count, max_basket_size)
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("item_n").alias("n_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("item_n").alias("n_b")
    )
    pair_d = F.col("pair_n").cast("double")
    support = pair_d / F.col("n_baskets")
    # lift written exactly as the oracle: (pair/n) / ((na/n) * (nb/n))
    lift = support / (
        (F.col("n_a").cast("double") / F.col("n_baskets"))
        * (F.col("n_b").cast("double") / F.col("n_baskets"))
    )
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .join(F.broadcast(n_baskets))  # 1-row frame
        .select(
            "item_a",
            "item_b",
            "pair_n",
            "n_a",
            "n_b",
            support.alias("support"),
            (pair_d / F.col("n_a")).alias("conf_a_b"),
            (pair_d / F.col("n_b")).alias("conf_b_a"),
            lift.alias("lift"),
        )
    )


def _funnel_entries(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> list[DataFrame]:
    """Shared funnel chain: per stage, the (u, entry_ts) frame of users
    who reached it in order (stage k counts only events strictly after
    the user's stage-(k-1) entry). One keyed MIN agg + one user
    equi-join per stage; survivor frames only shrink. Consumed by
    ``funnel`` (stage counts) and ``funnel_stage_latency`` (gap
    percentiles) so the ordering semantics can never diverge."""
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("k"),
    )
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        cur = ev.filter(F.col("k") == stage).select("u", "t")
        if prev is not None:
            cur = cur.join(
                prev.select("u", F.col("entry_ts").alias("_prev_ts")), "u"
            ).filter(F.col("t") > F.col("_prev_ts"))
        cur = cur.groupBy("u").agg(F.min("t").alias("entry_ts"))
        reached.append(cur)
        prev = cur
    return reached


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users reach each stage, where
    stage k counts only events strictly AFTER the user's stage-(k-1)
    entry time (the classic product funnel, not a bag-of-events count).

    Per stage: filter to that event type (predicate pushes to the
    scan), join the survivors of the previous stage on the user key,
    keep events after the previous entry, take MIN(ts). Each stage is
    one keyed agg + one equi-join on the SAME user key, so the whole
    funnel rides repartitions of one uniform key; survivor frames only
    shrink. MIN over timestamps is exact, and conversion ratios divide
    exact integer counts once.

    Returns one row per stage: (stage_idx, stage, users, conv_from_prev,
    conv_from_first).
    """
    reached = _funnel_entries(df, user_col, ts_col, type_col, stages)
    counts = None
    for i, (stage, frame) in enumerate(zip(stages, reached)):
        c = frame.agg(F.count("*").alias("users")).select(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "users",
        )
        counts = c if counts is None else counts.unionByName(c)
    w = Window.orderBy("stage_idx")
    first_users = F.first("users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    prev_users = F.lag("users").over(w)
    return counts.select(
        "stage_idx",
        "stage",
        "users",
        (F.col("users").cast("double") / prev_users).alias(
            "conv_from_prev"
        ),
        (F.col("users").cast("double") / first_users).alias(
            "conv_from_first"
        ),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort_week, week_offset), how many are
    active and what fraction of the cohort that is.

    Two keyed aggs (first-seen per user; distinct user-weeks) and one
    equi-join on the user key — first-seen is a MIN agg, so both
    inputs partial-aggregate map-side and at 100 TB the join carries
    one row per user, not per event. Week truncation is Monday-based
    `date_trunc` in both engines; offsets are exact integer day
    arithmetic / 7; retention divides exact integers once.
    """
    ev = df.select(
        F.col(user_col).alias("u"),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("wk"),
    )
    first_seen = ev.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    cohort_size = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    activity = (
        active.join(first_seen, "u")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    return activity.join(cohort_size, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        "cohort_users",
        (
            F.col("active_users").cast("double") / F.col("cohort_users")
        ).alias("retention"),
    )


def zscore_from_daily(
    daily: DataFrame,
    lookback: int = 7,
    z_threshold: float = 2.5,
) -> DataFrame:
    """The detector half of ``rolling_zscore``, over an already-built
    (key, day, x DECIMAL(15,2)) daily-total table — so the same
    detector runs on raw events (``rolling_zscore``) OR on a
    streaming-maintained MV (``stream_aggregate_to_lake`` +
    ``read_agg_snapshot``), the production architecture where the
    stream keeps the state table current and the detector is a cheap
    batch pass over O(keys × days) rows."""
    x = F.col("x")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-lookback, -1)
    )
    m = F.count(x).over(w)
    s = F.sum(x).over(w).cast("double")
    q = F.sum((x * x).cast("decimal(31,4)")).over(w).cast("double")
    md = m.cast("double")
    mean = s / md
    var = (q - s * s / md) / (md - F.lit(1.0))
    z = (x.cast("double") - mean) / F.sqrt(var)
    return (
        daily.select(
            "key",
            "day",
            x.cast("double").alias("day_total"),
            m.alias("m"),
            mean.alias("trailing_mean"),
            var.alias("trailing_var"),
            z.alias("z"),
        )
        .filter((F.col("m") >= 3) & (F.col("trailing_var") > 0))
        .select(
            "key",
            "day",
            "day_total",
            "trailing_mean",
            "z",
            (F.abs(F.col("z")) > F.lit(z_threshold)).alias("is_anomaly"),
        )
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    lookback: int = 7,
    z_threshold: float = 2.5,
) -> DataFrame:
    """Daily-total anomaly detection: z-score of each key's daily value
    sum against its own trailing ``lookback``-day window (current day
    excluded), flagging |z| > ``z_threshold``.

    The series is pre-aggregated to one row per (key, day) with exact
    decimal sums BEFORE the window — at 100 TB the window operator sees
    O(keys × days) rows, never raw events, and the single shuffle is
    the daily groupBy (the window reuses its partitioning). Trailing
    mean/variance come from decimal window sums of x and x² (exact,
    frame-order-independent — a double window sum would depend on each
    engine's summation tree), converted to double in ONE closed-form
    expression: var = (q − s²/m) / (m−1). Rows need ≥3 trailing days.
    """
    daily = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.to_date(ts_col).alias("day"),
        )
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(15,2)")
            .alias("x")
        )
    )
    return zscore_from_daily(daily, lookback, z_threshold)


def _global_quartile(df: DataFrame, col: str, id_col: str, out: str) -> DataFrame:
    """Exact global quartile of ``col`` (ties broken by ``id_col``)
    without a single-partition window: scalable ids from
    ``sampling.assign_row_ids`` + bucket = rid*4 div n."""
    from .sampling import assign_row_ids

    ranked = assign_row_ids(df, order_by=[col, id_col], id_name="_rid")
    n = ranked.groupBy().agg(F.count("*").alias("_n"))
    return (
        ranked.join(F.broadcast(n))
        .withColumn(out, F.expr("CAST((_rid * 4) div _n AS INT)"))
        .drop("_rid", "_n")
    )


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    ref_date: str = "1998-12-31",
) -> DataFrame:
    """RFM segmentation: per customer, quartiles of Recency (days since
    last order, lower = better), Frequency (order count) and Monetary
    (decimal-exact lifetime spend), combined into a 3-digit segment —
    the standard CRM cut of a star schema's fact table.

    One fact-table aggregation to customer grain (map-side combined),
    then three exact global quartile passes over the CUSTOMER-grain
    frame (each an assign_row_ids range-sort — no single-partition
    NTILE window, and the frame is dimension-sized, not fact-sized).
    Output: one row per segment with customer count and total
    monetary (exact decimal → one final double cast).
    """
    per_cust = orders.groupBy(F.col(customer_col).alias("cust")).agg(
        F.datediff(
            F.lit(ref_date).cast("date"), F.max(F.col(ts_col)).cast("date")
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(12,2)")).alias("monetary"),
    )
    q = _global_quartile(per_cust, "recency_days", "cust", "r_q")
    q = _global_quartile(q, "frequency", "cust", "f_q")
    q = _global_quartile(q, "monetary", "cust", "m_q")
    # recency: smaller is better -> invert so 3 = most recent tier
    seg = F.concat(
        (F.lit(3) - F.col("r_q")).cast("string"),
        F.col("f_q").cast("string"),
        F.col("m_q").cast("string"),
    )
    return (
        q.withColumn("segment", seg)
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered pair of CONSECUTIVE events of one user,
    count (from_type -> to_type) and the row-normalized transition
    probability — the behavioral-model primitive behind next-action
    prediction, anomaly scoring, and bot detection.

    Sequencing uses a total order (ts, id) so ties are deterministic
    across engines and partitionings. Scale shape: one keyed exchange
    for the per-user lead() window (sequences never leave their
    partition), one reducing groupBy on the (from, to) pair — bounded
    by |types|² rows — and the row marginal comes from a window over
    the AGGREGATED frame (pair-grain rows), never a second corpus scan.
    prob is ONE IEEE division of exact longs.

    Returns (from_type, to_type, n BIGINT, prob DOUBLE), one row per
    observed transition pair.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    )
    pairs = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wm = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(wm).cast("double")
        ).alias("prob"),
    )


def multitouch_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    touch_type: str = "click",
    conversion_type: str = "purchase",
    window_days: int = 7,
    credit_scale: int = 1_000_000,
) -> DataFrame:
    """Linear multi-touch attribution: every touch (click) of a user in
    the ``window_days`` before one of their conversions (purchases)
    shares that conversion's credit equally — the marketing-analytics
    counterpart of last-touch as-of attribution (events_asof_attribution
    keeps ONLY the latest touch; this splits credit across all of them).

    Credit is exact by convention: each touch earns
    ``credit_scale div k`` integer micro-units (k = the conversion's
    touch count), so per-day credit sums are integer-exact and
    engine-identical; the DOUBLE credit column is one IEEE division by
    the scale at the end. (A float 1/k summed across partitions would
    be accumulation-order-dependent — the same reason every other
    ratio in this engine divides once, at the end.)

    Scale shape: one user-keyed range join (touch within [conv−W,
    conv] — CLOSED at both ends: a touch exactly ``window_days``
    before the conversion is credited, matching the oracle), one
    per-conversion count via a window over the JOINED
    frame partitioned by the conversion id (pair-grain, not raw
    events), then a day-keyed aggregate. Returns
    (touch_day DATE, n_touches BIGINT, credit DOUBLE) — credited
    touch-day rows, i.e. the daily spend-effectiveness curve.
    """
    touches = df.filter(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_t_ts"),
        F.to_date(ts_col).alias("touch_day"),
    )
    convs = df.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_cu"),
        F.col(ts_col).alias("_c_ts"),
        F.col(id_col).alias("_cid"),
    )
    pairs = convs.join(
        touches,
        (F.col("_u") == F.col("_cu"))
        & (F.col("_t_ts") <= F.col("_c_ts"))
        & (
            F.col("_t_ts")
            >= F.col("_c_ts") - F.expr(f"INTERVAL {window_days} DAYS")
        ),
        "inner",
    )
    from pyspark.sql import Window

    k = F.count("*").over(Window.partitionBy("_cid"))
    credited = pairs.select(
        "touch_day",
        F.lit(int(credit_scale)).cast("long").alias("_scale"),
        k.alias("_k"),
    ).select(
        "touch_day",
        F.expr("_scale div _k").alias("_credit_micro"),
    )
    return credited.groupBy("touch_day").agg(
        F.count("*").cast("long").alias("n_touches"),
        (
            F.sum("_credit_micro").cast("double")
            / F.lit(float(credit_scale))
        ).alias("credit"),
    )


def top_paths(
    df: DataFrame,
    k: int = 20,
    max_len: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """Top-k user journey paths: the most common per-(user, day)
    ordered event-type sequences, truncated to the first ``max_len``
    events — the path-mining staple behind funnel discovery (the
    engine's events_funnel checks a KNOWN sequence; this surfaces which
    sequences exist and how often).

    Determinism: sequences order by the total order (ts, id) — ties
    can't reorder across engines or partitionings — and the top-k rank
    breaks count ties lexicographically on the path string.

    Scale shape: a per-(user, day) row_number window CAPS each
    session's contribution to ``max_len`` rows BEFORE any list is
    collected (the collect_list state is <= max_len elements, never an
    unbounded user history), the session-grain aggregate reuses the
    window's keyed exchange, paths reduce to a path-grain count, and
    the global top-k plans as TakeOrderedAndProject (per-partition
    heads merged on the driver — no single-partition exchange of the
    path-grain frame). The rank window runs on the k-row limited frame.

    Returns (path STRING, n_sessions BIGINT, rnk INT), rnk 1..k.
    """
    capped = (
        df.select(
            F.col(user_col).alias("_u"),
            F.to_date(ts_col).alias("_day"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(type_col).alias("_ty"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_u", "_day").orderBy("_ts", "_id")
            ),
        )
        .filter(F.col("_rn") <= max_len)
    )
    seqs = capped.groupBy("_u", "_day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_rn", "_ty"))
                ),
                lambda s: s.getField("_ty"),
            ),
            sep,
        ).alias("path")
    )
    pc = seqs.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    top = pc.orderBy(F.desc("n_sessions"), F.asc("path")).limit(k)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn("rnk", F.row_number().over(wr).cast("int"))


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_type",
    id_col: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """Time-series OHLC resampling: per (key, time-bucket) bar with
    open/close (first/last value in the bucket under the total order
    (ts, id)) and low/high/volume — the candlestick primitive behind
    market-data rollups and metric downsampling.

    open/close use ROW_NUMBER over the deterministic (ts, id) total
    order rather than first()/last() aggregates (whose results depend
    on partition arrival order) or min_by on a struct key (not portable
    to the SQL oracle). All five measures are pass-through or min/max
    of the raw doubles — no float accumulation, so bars are bit-exact
    on any partitioning.

    Scale shape: ONE exchange on (key, bucket) serves both window
    passes and the final aggregate (same partitioning expression, so
    Catalyst reuses it); volume gets a map-side partial. Bars are
    bounded by |keys| x |buckets| regardless of row count.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bar_ts")
    base = df.select(
        F.col(key_col).alias("bar_key"), bucket,
        F.col(value_col).alias("_v"),
        F.col(ts_col).alias("_ts"), F.col(id_col).alias("_id"),
    )
    wa = Window.partitionBy("bar_key", "bar_ts").orderBy("_ts", "_id")
    wd = Window.partitionBy("bar_key", "bar_ts").orderBy(
        F.desc("_ts"), F.desc("_id")
    )
    ranked = base.select(
        "bar_key", "bar_ts", "_v",
        F.row_number().over(wa).alias("_rn_a"),
        F.row_number().over(wd).alias("_rn_d"),
    )
    return ranked.groupBy("bar_key", "bar_ts").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col("_v"))).alias("open_v"),
        F.max(F.col("_v")).alias("high_v"),
        F.min(F.col("_v")).alias("low_v"),
        F.max(F.when(F.col("_rn_d") == 1, F.col("_v"))).alias("close_v"),
        F.count("*").cast("long").alias("n_events"),
    )


def ab_conversion_lift(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Two-proportion A/B conversion test: deterministic 50/50 variant
    assignment (user_id parity — the hash-bucket assignment every
    experimentation platform uses, reduced to its portable core; the
    ids must be non-negative, % on negatives is engine-divergent),
    per-variant conversion rates, absolute lift, and the pooled two-
    proportion z statistic.

    Conversion = the user's FIRST event (under the (ts, id) total
    order) is a ``conversion_type`` — the landing-action metric. The
    naive "user has any purchase ever" saturates to 1.0 on any
    engagement-heavy corpus (all-convert → pooled variance 0 → z is
    0/0), which is exactly the degenerate readout a real experiment
    platform guards against; the first-event form stays a proper
    proportion at every scale. z_score is NULL when the pooled
    standard error is 0 (all or none convert in both arms). When a
    variant arm is EMPTY (every user id shares one parity — or the
    input itself is empty), the single readout row is still emitted
    with NULL count/rate/lift/z for the missing side, never zero rows:
    callers get a degenerate readout, not silence.

    Every float is one closed-form IEEE expression over exact longs
    (the supplier_return_rate_wilson determinism idiom): rates are one
    division each; the pooled variance uses (1/n_a + 1/n_b) rewritten
    as (n_a+n_b)/(n_a*n_b) so it is ONE division of exact integer
    products; +,-,*,/ and sqrt are correctly rounded in both engines,
    so the identical expression tree is bit-exact.

    Scale shape: one user-keyed window pass (row_number over the
    user's events) feeding a user-grain aggregate on the SAME
    partitioning (no second exchange), then a (<=2)-row variant
    aggregate folded to one row by a conditional global aggregate —
    no rider cross join, driver-weightless.
    Returns ONE row (n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    abs_lift, z_score).
    """
    wu = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    firsts = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_type"),
        F.row_number().over(wu).alias("_rn"),
    )
    per_user = firsts.groupBy("_u").agg(
        F.max(
            F.when(
                (F.col("_rn") == 1)
                & (F.col("_type") == conversion_type),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("_conv")
    )
    variants = per_user.groupBy(
        (F.col("_u") % 2).cast("int").alias("_variant")
    ).agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("_conv").cast("long").alias("_c"),
    )
    # ONE conditional global aggregate over the (<=2)-row variants
    # frame — no arm-filtered cross, so an empty arm (all user ids one
    # parity) still yields the single degenerate-readout row with NULL
    # counts/rates instead of silence.
    both = variants.agg(
        F.max(F.when(F.col("_variant") == 0, F.col("_n"))).alias("n_a"),
        F.max(F.when(F.col("_variant") == 1, F.col("_n"))).alias("n_b"),
        F.max(F.when(F.col("_variant") == 0, F.col("_c"))).alias("conv_a"),
        F.max(F.when(F.col("_variant") == 1, F.col("_c"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (
        (F.col("conv_a") + F.col("conv_b")).cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    inv_sum = (
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double")
    )
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * inv_sum)
    calc = both.select(
        "n_a", "n_b", "conv_a", "conv_b",
        rate_a.alias("rate_a"), rate_b.alias("rate_b"),
        (rate_a - rate_b).alias("abs_lift"),
        se.alias("_se"),
    )
    return calc.select(
        "n_a", "n_b", "conv_a", "conv_b", "rate_a", "rate_b", "abs_lift",
        F.when(
            F.col("_se") == 0.0, F.lit(None).cast("double")
        ).otherwise(F.col("abs_lift") / F.col("_se")).alias("z_score"),
    )


def cusum_deviation(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """CUSUM-style changepoint scan over the daily volume series: for
    each day k (of n, total N events), the deviation of the observed
    cumulative count from the uniform-rate expectation,
    dev_k = cum_k − k·N/n. The day maximizing |dev| is the single
    most likely level-shift point (the classic max-CUSUM estimator).

    Determinism: cum_k and k·N are exact BIGINT; dev_k is one division
    and one subtraction of exactly-representable values — identical
    IEEE trees both engines. The changepoint flag breaks |dev| ties by
    earliest day via an exact integer key, not a float comparison.

    Scale shape: the raw scan reduces to day grain FIRST (map-side
    partial count), so the window pass (cumsum + row_number over the
    date order) runs on |days| rows — a single tiny exchange no matter
    the event count. Returns one row per day: (day, daily_n, cum_n,
    dev DOUBLE, is_changepoint BOOLEAN).
    """
    daily = (
        df.select(F.to_date(ts_col).alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("daily_n"))
    )
    wo = Window.orderBy("day")
    wall = Window.partitionBy()
    cum = daily.select(
        "day", "daily_n",
        F.sum("daily_n").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("cum_n"),
        F.row_number().over(wo).cast("long").alias("_k"),
        F.sum("daily_n").over(wall).cast("long").alias("_total"),
        F.count("*").over(wall).cast("long").alias("_n_days"),
    )
    dev = F.col("cum_n").cast("double") - (
        (F.col("_k") * F.col("_total")).cast("double")
        / F.col("_n_days").cast("double")
    )
    scored = cum.select(
        "day", "daily_n", "cum_n", dev.alias("dev"),
        F.abs(dev).alias("_adev"),
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("_dayk"),
    )
    # Two window layers (a window result can't feed another window fn
    # in the same select): first the global max |dev|, then the
    # earliest day attaining it.
    wmax = Window.partitionBy()
    with_max = scored.withColumn(
        "_max_adev", F.max("_adev").over(wmax)
    )
    with_cp = with_max.withColumn(
        "_cp_day",
        F.min(
            F.when(F.col("_adev") == F.col("_max_adev"), F.col("_dayk"))
        ).over(wmax),
    )
    return with_cp.select(
        "day", "daily_n", "cum_n", "dev",
        (
            (F.col("_adev") == F.col("_max_adev"))
            & (F.col("_dayk") == F.col("_cp_day"))
        ).alias("is_changepoint"),
    )


def cohort_ltv(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Cohort lifetime-value curves: customers are cohorted by their
    first-order month; for each (cohort_month, months-since-first) cell
    the period revenue, active-customer count, cohort-cumulative
    revenue, and LTV per cohort member — the retention-economics rollup
    every subscription/commerce warehouse derives from its order fact.

    Revenue sums are exact DECIMAL(12,2) (the q1 idiom) cast to DOUBLE
    once per output; ltv_per_customer is ONE further division by the
    exact cohort size. The month age is pure integer arithmetic
    (year*12+month), immune to calendar/interval edge cases.

    Scale shape: first-order month comes from a min() window over the
    custkey partition — ONE exchange on the customer key, reused by
    nothing downstream at raw grain: rows reduce immediately to
    (cohort, age) cells (map-side partial on the decimal sum), and the
    cumulative window + cohort-size window run on cell grain
    (|cohorts| x |ages| rows). No join back to the raw fact.
    """
    wc = Window.partitionBy(cust_col)
    month_idx = F.year(date_col) * 12 + F.month(date_col)
    aged = orders.select(
        F.col(cust_col).alias("_cust"),
        F.min(F.date_trunc("month", F.col(date_col)))
        .over(wc).cast("date").alias("cohort_month"),
        (month_idx - F.min(month_idx).over(wc)).cast("int").alias("age_months"),
        F.col(amount_col).cast("decimal(12,2)").alias("_rev"),
    )
    cells = aged.groupBy("cohort_month", "age_months").agg(
        F.sum("_rev").alias("_rev_sum"),
        F.countDistinct("_cust").cast("long").alias("n_active"),
    )
    wcum = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wfirst = Window.partitionBy("cohort_month")
    # Cohort size = active customers at age 0 (every member's first
    # order lands in their cohort month by construction).
    size0 = F.max(
        F.when(F.col("age_months") == 0, F.col("n_active"))
    ).over(wfirst)
    cum = F.sum("_rev_sum").over(wcum)
    return cells.select(
        "cohort_month", "age_months", "n_active",
        F.col("_rev_sum").cast("double").alias("period_revenue"),
        cum.cast("double").alias("cum_revenue"),
        size0.cast("long").alias("cohort_size"),
        (cum.cast("double") / size0.cast("double")).alias(
            "ltv_per_customer"
        ),
    )


def inter_event_gaps(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-event-time statistics per event type: for every pair of
    CONSECUTIVE same-user events, the gap to the next event, grouped
    by the type of the FROM event — the cadence profile behind
    session-timeout tuning, bot detection, and engagement scoring.

    Gaps are exact BIGINT microseconds (epoch_us diffs under the
    (ts, id) total order); min/max are pass-through integers and every
    emitted float (avg/min/max seconds) is ONE division of exact longs
    by an exact power of ten — the engine's determinism rule.

    Scale shape: one user-keyed exchange for the lead() window
    (sequences never leave their partition), then a reducing groupBy
    bounded by |types| rows with a map-side partial. Returns
    (event_type, n_gaps, min_gap_s, max_gap_s, avg_gap_s).
    """
    wu = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    seq = df.select(
        F.col(type_col).alias("event_type"),
        (F.lead(us).over(wu) - us).alias("_gap_us"),
    )
    grouped = (
        seq.filter(F.col("_gap_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.min("_gap_us").cast("long").alias("_min_us"),
            F.max("_gap_us").cast("long").alias("_max_us"),
            F.sum("_gap_us").cast("long").alias("_sum_us"),
        )
    )
    return grouped.select(
        "event_type", "n_gaps",
        (F.col("_min_us").cast("double") / F.lit(1000000.0)).alias(
            "min_gap_s"
        ),
        (F.col("_max_us").cast("double") / F.lit(1000000.0)).alias(
            "max_gap_s"
        ),
        (
            F.col("_sum_us").cast("double")
            / (F.col("n_gaps") * F.lit(1000000)).cast("double")
        ).alias("avg_gap_s"),
    )


def dau_mau_stickiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 28,
) -> DataFrame:
    """DAU/MAU stickiness curve: for every active day, the distinct
    daily actives, the distinct actives over the trailing
    ``window_days`` window, and their ratio — the engagement headline
    metric. Spark has no COUNT(DISTINCT) over a RANGE window, and a
    raw range join (day list vs user-days) plans a nested-loop scan;
    instead each user-day row EXPLODES into the ≤``window_days``
    target days it serves, which keeps every join/aggregate an
    equi-keyed hash exchange at any event volume.

    Scale shape: the raw fact dedups to user-day grain FIRST (one
    keyed exchange, partial-aggregable); the bounded sequence() fan-out
    happens inside one codegen stage; the semi join restricting
    targets to OBSERVED days is equi on the day key (day list is
    calendar-bounded, broadcast-sized); the distinct-user count is one
    more keyed aggregate. stickiness is ONE IEEE division of exact
    longs.

    Returns (day, dau, mau, stickiness) — mau is named for the default
    28-day window whatever ``window_days`` is.
    """
    ud = df.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
    ).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    reach = ud.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("d"),
    )
    mau = (
        reach.join(days, "d", "left_semi")
        .groupBy("d")
        .agg(F.count_distinct("u").cast("long").alias("mau"))
    )
    return dau.join(mau, "d").select(
        F.col("d").alias("day"), "dau", "mau",
        (
            F.col("dau").cast("double") / F.col("mau").cast("double")
        ).alias("stickiness"),
    )


def adoption_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """User adoption curve: per calendar day, the users first seen that
    day, the cumulative user count, and the fraction of the eventually-
    observed population — the growth chart behind every launch review.

    Scale shape: the raw fact reduces to one row per user (min-day
    aggregate, map-side partial), then to day grain; the cumsum +
    total windows run on |days| rows. cum and total are exact BIGINTs;
    adoption_frac is ONE IEEE division. Returns (day, new_users,
    cum_users, total_users, adoption_frac).
    """
    firsts = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(F.to_date(ts_col)).alias("day")
    )
    daily = firsts.groupBy("day").agg(
        F.count("*").cast("long").alias("new_users")
    )
    wo = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return daily.select(
        "day", "new_users",
        F.sum("new_users").over(wo).cast("long").alias("cum_users"),
        F.sum("new_users").over(wall).cast("long").alias("total_users"),
        (
            F.sum("new_users").over(wo).cast("double")
            / F.sum("new_users").over(wall).cast("double")
        ).alias("adoption_frac"),
    )


def peak_concurrency(
    sessions: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> DataFrame:
    """Peak concurrent sessions per calendar day via the interval-
    stacking sweep: +1 at each session start, −1 at each end, cumsum
    over the timestamp order — the capacity-planning primitive behind
    "how many live sessions must this service hold".

    Deltas aggregate to DISTINCT-timestamp grain first, so the running
    sum needs no tie-break (starts apply before ends within one
    timestamp: peak_at_ts = running_net + ends_at_ts, which counts a
    zero-duration session while it is open). All arithmetic is exact
    BIGINT. A session spanning midnight with no boundary inside a day
    contributes no row that day — peaks are sampled at boundary
    events, the declared semantics of the sweep.

    Scale shape: session rows reduce to timestamp grain map-side; the
    single-ordered cumsum runs on |distinct boundary timestamps| rows
    (already reduced — the same post-aggregate global window shape as
    the engine's other cumulative entries). Returns
    (day, peak_concurrency, n_boundaries).
    """
    deltas = (
        sessions.select(
            F.col(start_col).alias("ts"),
            F.lit(1).alias("s"), F.lit(0).alias("e"),
        )
        .unionAll(
            sessions.select(
                F.col(end_col).alias("ts"),
                F.lit(0).alias("s"), F.lit(1).alias("e"),
            )
        )
        .groupBy("ts")
        .agg(
            F.sum("s").cast("long").alias("starts"),
            F.sum("e").cast("long").alias("ends"),
        )
    )
    wo = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    peaks = deltas.select(
        F.to_date("ts").alias("day"),
        (
            F.sum(F.col("starts") - F.col("ends")).over(wo)
            + F.col("ends")
        ).cast("long").alias("peak_at_ts"),
    )
    return peaks.groupBy("day").agg(
        F.max("peak_at_ts").alias("peak_concurrency"),
        F.count("*").cast("long").alias("n_boundaries"),
    )


def fano_burstiness(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Burstiness (Fano factor = sample variance / mean of the daily
    count series) per key — the dispersion index that separates a
    steady drip (Fano ≈ 1, Poisson-like) from bursty campaign traffic
    (Fano >> 1), the first diagnostic an event-volume anomaly triage
    reads. The series for each key is DENSIFIED over the key's OWN
    active span (min..max day, zero-filled) — declared semantics: a
    key absent for a month in the middle of its span counts those
    zeros, but is not penalized for days before launch or after
    retirement.

    Exactness: days live as epoch-day INTEGERS (no date-type
    divergence), counts and the moment sums Σx, Σx² are exact BIGINTs
    carried as DECIMAL(38,0) (n·Σx² overflows BIGINT for ~10⁹-event
    days), and fano = (n·Σx² − S²) / ((n−1)·S) is ONE division of
    string-cast-rendered exact operands — bit-identical across
    engines. NULL when the span is a single day or the key has no
    events (S = 0 cannot happen for an observed key).

    Scale shape: one (key, day) keyed aggregate off the raw scan; one
    key-grain span aggregate; a bounded per-key explode of the day
    sequence (span-sized, calendar-bounded); one keyed left join of
    the dense spine against the daily counts; one key-grain moment
    aggregate. No windows over raw rows, no cross joins.
    Returns (key, n_days BIGINT, n_events BIGINT, fano DOUBLE).
    """
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01")
    ).alias("d")
    daily = (
        df.select(F.col(key_col).alias("key"), day)
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    span = daily.groupBy("key").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = span.select(
        "key", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    dense = spine.join(daily, ["key", "d"], "left").select(
        "key", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x")
    )
    d38 = "decimal(38,0)"
    sums = dense.groupBy("key").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    num = _dbl(F.col("n") * F.col("sxx") - F.col("s") * F.col("s"))
    den = _dbl((F.col("n") - 1) * F.col("s"))
    return sums.select(
        F.col("key").alias(key_col),
        F.col("n").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("n_events"),
        F.when(den == 0.0, F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("fano"),
    )


def daily_autocorr(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Lag-1 autocorrelation of the global daily event-count series —
    the one-scalar "is today predictive of tomorrow" check that
    separates trending/weekly-cycled traffic (r near ±1) from
    memoryless noise (r ≈ 0), run before anyone fits a forecaster.
    The series is densified over the observed min..max day span
    (zero-filled), then r is the Pearson correlation over the
    (x_d, x_{d+1}) pairs.

    Exactness: epoch-day integers; the consecutive-day pairing is a
    keyed EQUI self-join on d+1 (no window, no sort); all five moment
    sums are exact integers as DECIMAL(38,0); r is one closed-form
    IEEE tree over string-cast-rendered operands (the assortativity
    idiom). NULL when either margin is constant (zero variance).

    Scale shape: raw rows reduce to day grain map-side FIRST; the
    dense spine explodes off a 1-row (min,max) aggregate; everything
    after is day-grain — thousands of rows per decade of data at ANY
    corpus scale. Returns ONE row (n_pairs, autocorr_lag1).
    """
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01")
    ).alias("d")
    daily = (
        df.select(day)
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    spine = daily.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    ).select(F.explode(F.sequence("d0", "d1")).alias("d"))
    dense = spine.join(daily, "d", "left").select(
        "d", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x")
    )
    nxt = dense.select((F.col("d") - 1).alias("d"), F.col("x").alias("y"))
    pairs = dense.join(nxt, "d").select("x", "y")
    d38 = "decimal(38,0)"
    sums = pairs.agg(
        F.count(F.lit(1)).cast(d38).alias("m"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    num = _dbl(F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
    var_x = _dbl(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    var_y = _dbl(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    den = F.sqrt(var_x) * F.sqrt(var_y)
    return sums.select(
        F.col("m").cast("long").alias("n_pairs"),
        F.when(den == 0.0, F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("autocorr_lag1"),
    )


def second_event_hazard(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    bucket_days: int = 30,
) -> DataFrame:
    """Discrete-time hazard table for time-to-SECOND event per key —
    the life-table form of "how long until a new customer orders
    again", with single-event keys correctly treated as CENSORED at
    the observation horizon instead of silently dropped (dropping them
    inflates early hazards, the classic churn-analysis mistake).

    Per key: t0/t1 = first/second event DATE under the (event date, id)
    total order — timestamps are truncated to calendar dates before
    ranking, so same-day events tie-break by id (bucketing is day-grain,
    so sub-day ordering cannot change any bucket; the declared order
    makes the day-grain tie-break explicit). Event keys land in bucket
    (t1−t0) div bucket_days, censored
    keys in (horizon−t0) div bucket_days where horizon = max ts
    overall. Life-table convention (declared): a key censored in
    bucket b still counts at risk in b. hazard_b = events_b /
    at_risk_b with at_risk_b = Σ_{b'>=b}(events+censored) — a reverse
    cumulative sum. The engine-exact sibling of Kaplan-Meier: the
    survival curve is Π(1−h) over buckets, a cross-row float product
    no engine computes portably, so the table ships the exact
    per-bucket hazards and leaves the cumulative product to the
    caller.

    Exactness: day gaps are non-negative ints, `div` truncation ==
    floor on them (engine-portable); counts exact BIGINT; hazard is
    one IEEE division. Scale shape: one key-partitioned window over
    the fact (uniform key), one key-grain reduction, a 1-row
    aggregate-reduced horizon rider, one bucket-grain aggregate, and
    the reverse cumsum window over the BUCKET-grain frame (calendar
    -bounded). Returns (bucket BIGINT, day_lo BIGINT, at_risk,
    n_events, n_censored BIGINT, hazard DOUBLE).
    """
    w = Window.partitionBy("k").orderBy("d", "i")
    ranked = df.select(
        F.col(key_col).alias("k"),
        F.to_date(F.col(ts_col)).alias("d"),
        F.col(id_col).alias("i"),
    ).select("k", "d", F.row_number().over(w).alias("rn"))
    firsts = ranked.filter(F.col("rn") == 1).select(
        "k", F.col("d").alias("t0")
    )
    seconds = ranked.filter(F.col("rn") == 2).select(
        "k", F.col("d").alias("t1")
    )
    horizon = df.agg(
        F.max(F.to_date(F.col(ts_col))).alias("md")
    )
    cohort = (
        firsts.join(seconds, "k", "left")
        .join(F.broadcast(horizon))  # 1-row, aggregate-reduced
    )
    gap = F.when(
        F.col("t1").isNotNull(), F.datediff("t1", "t0")
    ).otherwise(F.datediff("md", "t0"))
    b = cohort.select(
        gap.alias("_gap"),
        F.col("t1").isNotNull().alias("ev"),
    ).select(
        F.expr(f"CAST(_gap DIV {bucket_days} AS BIGINT)").alias("bucket"),
        "ev",
    )
    g = b.groupBy("bucket").agg(
        F.count_if(F.col("ev")).cast("long").alias("n_events"),
        F.count_if(~F.col("ev")).cast("long").alias("n_censored"),
    )
    wb = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ar = g.select(
        "bucket", "n_events", "n_censored",
        F.sum(F.col("n_events") + F.col("n_censored")).over(wb)
        .cast("long").alias("at_risk"),
    )
    return ar.select(
        "bucket",
        (F.col("bucket") * bucket_days).alias("day_lo"),
        "at_risk", "n_events", "n_censored",
        (
            F.col("n_events").cast("double")
            / F.col("at_risk").cast("double")
        ).alias("hazard"),
    )


def triple_counts(
    items: DataFrame,
    min_triple_count: int = 2,
    max_basket_size: int = 50,
    top_k: int = 20,
) -> DataFrame:
    """Frequent 3-itemsets over a ``(basket, item)`` frame — the
    next-size-up of ``pair_counts`` for the associations pairs cannot
    see (A and B each lift C a little; A∧B together lift it a lot).
    Top ``top_k`` triples by basket count with their support fraction.

    Same posting-list shape as the pair miner: distinct items collect
    into one sorted per-basket array and i<j<k index triples explode
    inside one codegen stage — cost Σ basket_size³, which is why the
    basket cap is TIGHTER than the pair miner's (50³ = 125k candidate
    triples per worst-case basket vs 200² = 40k pairs; a declared
    semantic mirrored in the oracle, as oversized baskets are
    catalog-page-shaped noise for itemset mining anyway). One keyed
    triple aggregate; support divides by the distinct-basket count
    attached via a 1-row aggregate-reduced rider; deterministic top-k
    under (count DESC, a, b, c). Returns (item_a, item_b, item_c,
    triple_n BIGINT, support DOUBLE).
    """
    baskets = (
        items.groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("arr"))
        .filter(
            (F.size("arr") >= 3) & (F.size("arr") <= max_basket_size)
        )
    )
    n_baskets = items.select(
        F.count_distinct("basket").alias("n_baskets")
    )
    triple_structs = F.flatten(
        F.transform(
            F.col("arr"),
            lambda x, i: F.flatten(
                F.transform(
                    F.slice(F.col("arr"), i + 2, F.size(F.col("arr"))),
                    lambda y, j: F.transform(
                        F.slice(
                            F.col("arr"), i + j + 3, F.size(F.col("arr"))
                        ),
                        lambda z: F.struct(
                            x.alias("item_a"),
                            y.alias("item_b"),
                            z.alias("item_c"),
                        ),
                    ),
                )
            ),
        )
    )
    triples = (
        baskets.select(F.explode(triple_structs).alias("t"))
        .groupBy(
            F.col("t.item_a").alias("item_a"),
            F.col("t.item_b").alias("item_b"),
            F.col("t.item_c").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("triple_n"))
        .filter(F.col("triple_n") >= min_triple_count)
    )
    return (
        triples.join(F.broadcast(n_baskets))  # 1-row, aggregate-reduced
        .select(
            "item_a", "item_b", "item_c", "triple_n",
            (
                F.col("triple_n").cast("double")
                / F.col("n_baskets").cast("double")
            ).alias("support"),
        )
        .orderBy(
            F.col("triple_n").desc(), "item_a", "item_b", "item_c"
        )
        .limit(top_k)
    )


def haar_energy(
    df: DataFrame,
    ts_col: str = "ts",
    window_days: int = 64,
) -> DataFrame:
    """Haar wavelet energy decomposition of the daily event-count
    series: per resolution level (2-day pairs up to the full window),
    the exact energy Σ detail² of the Haar detail coefficients — the
    multi-resolution "where does the variance live" profile (level 1
    hot = day-to-day jitter, level 3 hot ≈ weekly cycle, top levels
    hot = regime shift) that Fourier analysis can't deliver
    engine-exactly (it needs trig; Haar needs only ± and +).

    The series is the first ``window_days`` days (a power of two) from
    the observed minimum, zero-densified — declared semantics: a fixed
    dyadic analysis window, the wavelet convention. Each level halves
    the series: a_l[i] = a_{l-1}[2i] + a_{l-1}[2i+1] (sums pass up),
    d_l[i] = a_{l-1}[2i] − a_{l-1}[2i+1] (unnormalized Haar details —
    integer-exact; the 1/sqrt(2) normalization is a per-level constant
    callers can apply, dropped to stay in BIGINT).

    Exactness: everything is integer arithmetic end-to-end; energies
    carried as DECIMAL(38,0) (a 10¹⁰-event day squares past BIGINT).
    Scale shape: raw rows reduce to day grain FIRST; the analysis
    window is built off the 1-row min-day aggregate (window min over
    the REDUCED day frame — no rider cross); each level is one keyed
    aggregate over at most ``window_days`` rows. Returns one row per
    level: (level INT, n_coeffs BIGINT, energy DECIMAL(38,0)).
    """
    if window_days & (window_days - 1) or window_days < 2:
        raise ValueError("haar_energy: window_days must be a power of 2")
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01")
    ).alias("d")
    daily = (
        df.select(day)
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    rel = daily.select(
        (
            F.col("d")
            - F.min("d").over(Window.partitionBy())
        ).alias("i"),
        "x",
    ).filter(F.col("i") < window_days)
    spine = (
        daily.agg(F.min("d").alias("_d0"))
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("i")
        )
    )
    frame = spine.join(rel, "i", "left").select(
        F.col("i").cast("long").alias("i"),
        F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("a"),
    )
    d38 = "decimal(38,0)"
    levels = window_days.bit_length() - 1
    out = None
    for lvl in range(1, levels + 1):
        pairs = (
            frame.groupBy(
                # distinct name: the +/- sign inside the aggregate must
                # resolve against the CHILD's i, not the group key
                F.expr("CAST(i DIV 2 AS BIGINT)").alias("i_half")
            )
            .agg(
                F.sum("a").cast("long").alias("a"),
                F.sum(
                    F.when(F.col("i") % 2 == 0, F.col("a")).otherwise(
                        -F.col("a")
                    )
                ).cast("long").alias("dc"),
            )
            .withColumnRenamed("i_half", "i")
        )
        e = pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_coeffs"),
            F.sum((F.col("dc").cast(d38) * F.col("dc")).cast(d38))
            .cast(d38)
            .alias("energy"),
        ).select(F.lit(lvl).alias("level"), "n_coeffs", "energy")
        out = e if out is None else out.unionByName(e)
        frame = pairs.select("i", "a")
    return out


def bootstrap_mean_ci(
    df: DataFrame,
    ts_col: str = "ts",
    n_boot: int = 200,
    alpha_num: int = 25,
    alpha_den: int = 1000,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the MEAN DAILY
    event volume — the distribution-free error bar an on-call report
    puts around "we average N events/day", valid under the bursty,
    non-normal daily counts real traffic has (where the +-1.96·sigma
    interval is fiction). ``n_boot`` resamples of the day series with
    replacement; the CI is the (alpha, 1-alpha) percentile pair of
    the resample means (alpha = alpha_num/alpha_den, default 2.5%).

    DETERMINISTIC bootstrap: draw j of resample b picks day index
    md5("bs|b|j") % n_days — the engine-portable hash idiom instead
    of an RNG, so the resample plan, every mean, and the CI are
    bit-identical across engines and runs (a seeded-RNG bootstrap is
    not even portable across Spark versions). Each resample mean is
    an exact BIGINT sum and ONE division; the CI bounds are exact
    rank selection (k = max(1, floor(alpha·B)) from either end) over
    the B means under the (mean, b) total order.

    Scale shape: raw rows reduce to day grain FIRST; the (b, j) draw
    grid explodes off the 1-row day-count aggregate (B·n_days rows —
    calendar-bounded, independent of event volume) and equi-joins the
    indexed day series; one b-keyed sum; the rank window runs over
    the B-row means frame; the observed mean attaches as a 1-row
    aggregate-reduced rider. Returns ONE row (n_days, n_boot,
    mean_obs, ci_lo, ci_hi).
    """
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.lit("1970-01-01")
    ).alias("d")
    daily = (
        df.select(day)
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    w = Window.orderBy("d")
    series = daily.select(
        (F.row_number().over(w) - 1).cast("long").alias("i"), "x"
    )
    nrow = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
    )
    grid = (
        nrow.select(
            "n",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_boot - 1))
            ).alias("b"),
        )
        .select(
            "n", "b",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1)
            ).alias("j"),
        )
        .select(
            "b",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("bs|"),
                                F.col("b").cast("string"),
                                F.lit("|"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long")
                % F.col("n")
            ).alias("i"),
        )
    )
    means = (
        grid.join(series, "i")
        .groupBy("b")
        .agg(F.sum("x").cast("long").alias("s"))
        .join(F.broadcast(nrow))  # 1-row, aggregate-reduced
        .select(
            "b", "n", "total",
            (F.col("s").cast("double") / F.col("n").cast("double"))
            .alias("m"),
        )
    )
    k_lo = max(1, (alpha_num * n_boot) // alpha_den)
    k_hi = n_boot + 1 - k_lo
    wr = Window.orderBy("m", "b")
    ranked = means.select(
        "n", "total", "m", F.row_number().over(wr).alias("rn")
    )
    return ranked.agg(
        F.max("n").alias("n_days"),
        F.max(F.lit(n_boot)).cast("long").alias("n_boot"),
        (
            F.max("total").cast("double")
            / F.max("n").cast("double")
        ).alias("mean_obs"),
        F.min(F.when(F.col("rn") == k_lo, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == k_hi, F.col("m"))).alias("ci_hi"),
    )


def substitution_candidates(
    parts: DataFrame,
    copurchase: DataFrame,
    key_col: str = "p_partkey",
    type_col: str = "p_type",
    size_col: str = "p_size",
    price_col: str = "p_retailprice",
    band_den: int = 20,
) -> DataFrame:
    """Substitute-product candidates: pairs of parts interchangeable on
    catalog attributes (same type AND size, prices within 1/``band_den``
    of the cheaper one) that customers NEVER bought together — the
    assortment-rationalization / recommend-when-out-of-stock list,
    where actual co-purchase is evidence of complementarity, not
    substitution, and excludes the pair.

    ``copurchase`` is any observed co-occurrence pair frame with
    ``item_a < item_b`` (e.g. ``pair_counts(min_pair_count=1)``).

    Exactness: prices become integer cents via an exact DECIMAL(12,2)
    scale-up, and the price band is the integer cross-multiplication
    ``band_den·|a−b| ≤ min(a,b)`` — no float ratios.

    Scale shape: the candidate join is EQUI on the (type, size) block,
    so a part only meets its own block (bounded by catalog density per
    block, never all-pairs); the exclusion is one keyed LEFT ANTI join
    against the co-purchase frame. Both sides are part/pair grain —
    dimension-scaled, not fact-scaled.
    """
    p = parts.select(
        F.col(key_col).alias("k"),
        F.col(type_col).alias("t"),
        F.col(size_col).alias("s"),
        (dec(price_col, 12, 2) * 100).cast("long").alias("cents"),
    )
    a = p.select(
        F.col("k").alias("part_a"), "t", "s",
        F.col("cents").alias("cents_a"),
    )
    b = p.select(
        F.col("k").alias("part_b"), "t", "s",
        F.col("cents").alias("cents_b"),
    )
    ca, cb = F.col("cents_a"), F.col("cents_b")
    cand = (
        a.join(b, ["t", "s"])
        .filter(F.col("part_a") < F.col("part_b"))
        .filter(
            F.lit(int(band_den)) * F.abs(ca - cb) <= F.least(ca, cb)
        )
    )
    out = cand.join(
        copurchase,
        (cand["part_a"] == copurchase["item_a"])
        & (cand["part_b"] == copurchase["item_b"]),
        "left_anti",
    )
    return out.select(
        "part_a",
        "part_b",
        F.col("t").alias(type_col),
        F.col("s").alias(size_col),
        "cents_a",
        "cents_b",
    )


def user_gap_regularity(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 3,
) -> DataFrame:
    """Per-entity cadence-regularity classification: for every user
    with at least ``min_gaps`` inter-event gaps, the squared
    coefficient of variation of their gap series buckets them as
    ``regular`` (CV² ≤ 1/4 — metronome-like, automation/bot
    suspects), ``poisson`` (CV² ≤ 2 — memoryless human cadence) or
    ``bursty`` (heavy-tailed sessions), and the output is the
    class-level census — the behavioral-mix readout behind bot
    screens and engagement models (the entity-grain companion to the
    type-grain ``inter_event_gaps`` and the window-count Fano factor).

    Exactness: gaps are BIGINT epoch-microsecond diffs under the
    (ts, id) total order; per-user moments Σg, Σg² accumulate in
    DECIMAL(38,0); CV² = (n·Σg² − (Σg)²)/(Σg)² is classified by exact
    integer cross-multiplication (4·num ≤ den and num ≤ 2·den) — no
    float ever decides a class; the only doubles are the final share
    divisions.

    Scale shape: one user-keyed exchange for the lead() window, one
    user-grain reduction, one |classes|-grain census with a global
    window over the 3-row frame. Users with all-identical timestamps
    (zero mean gap) are ``regular`` by declaration (zero variance
    dominates). Returns (regularity_class, n_users, share).
    """
    wu = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    seq = df.select(
        F.col(user_col).alias("u"),
        (F.lead(us).over(wu) - us).alias("g"),
    ).filter(F.col("g").isNotNull())
    d38 = "decimal(38,0)"
    per_user = seq.groupBy("u").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("g").cast(d38)).alias("sg"),
        F.sum(F.col("g").cast(d38) * F.col("g").cast(d38)).alias("sgg"),
    ).filter(F.col("n") >= min_gaps)
    num = F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")
    den = F.col("sg") * F.col("sg")
    cls = (
        F.when(den == 0, F.lit("regular"))
        .when(num * 4 <= den, F.lit("regular"))
        .when(num <= den * 2, F.lit("poisson"))
        .otherwise(F.lit("bursty"))
    )
    census = per_user.groupBy(cls.alias("regularity_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    tot = F.sum("n_users").over(Window.partitionBy()).cast("long")
    return census.select(
        "regularity_class",
        "n_users",
        (F.col("n_users").cast("double") / tot.cast("double")).alias(
            "share"
        ),
    )


def grouped_value_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: Sequence[int] = (50, 90, 99),
    over_threshold: int | None = None,
) -> DataFrame:
    """EXACT per-group percentiles of an integer-valued column, plus an
    optional threshold-breach rate — the SLA table (p50/p90/p99 delay,
    % over contract) that approx sketches can't sign off on when the
    number goes in a customer-facing report.

    Percentile q = the smallest value whose inclusive cumulative count
    reaches q% of the group, tested as the exact integer
    cross-multiplication ``cum·100 ≥ n·q`` (no float at any boundary);
    the breach rate is one IEEE division of exact longs.

    Scale shape: the Lorenz pattern — raw rows reduce to (group,
    VALUE) grain map-side first, the cumulative + total windows run
    over value-grain rows (bounded by the value domain, e.g. days of
    delay, regardless of fact cardinality), and the percentile pivot
    is a conditional-MIN aggregate, not a join. One reduction shuffle
    + one value-grain window exchange.
    """
    v = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wc = (
        Window.partitionBy("g")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = v.select(
        "g",
        "d",
        "cnt",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(Window.partitionBy("g")).cast("long").alias("n"),
    )
    aggs = [F.max("n").alias("n_rows")]
    for q in percentiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("n") * int(q), F.col("d")
                )
            ).alias(f"p{int(q)}")
        )
    if over_threshold is not None:
        aggs.append(
            F.sum(
                F.when(F.col("d") > int(over_threshold), F.col("cnt"))
                .otherwise(F.lit(0))
            ).cast("long").alias("_n_over")
        )
    out = c.groupBy(F.col("g").alias(group_col)).agg(*aggs)
    if over_threshold is not None:
        out = out.select(
            group_col,
            "n_rows",
            *[f"p{int(q)}" for q in percentiles],
            (
                F.col("_n_over").cast("double")
                / F.col("n_rows").cast("double")
            ).alias(f"pct_over_{int(over_threshold)}"),
        )
    return out


def markov_stationary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    iterations: int = 12,
    scale: int = 10**9,
) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    — where the behavioral chain spends its time in the long run, the
    one-vector summary read next to the transition matrix (a type with
    small raw share but large stationary mass is a behavioral sink).

    Declared semantics: states are the types OBSERVED AS TRANSITION
    SOURCES; ``iterations`` synchronous steps of v' ← vᵀP from the
    uniform vector, in integer arithmetic scaled by ``scale`` — each
    term is ``(v_i·n_ij) div rowsum_i`` (exact floor), and each step
    renormalizes v to sum ``scale`` with the same div rule, so
    truncation error cannot compound (O(|types|/scale) per step,
    documented quantization like the integer PageRank). Transitions
    into never-a-source types lose their mass to the renormalizer.

    Scale shape: one user-keyed lead() window exchange + one
    |types|²-bounded count reduction (both SHARED with
    transition_matrix), checkpointed once; each iteration is one
    equi-join + keyed sum over the |types|²-cell frame — driver-free,
    corpus scanned exactly once. Products run in DECIMAL(38,0) so
    fact-scale counts (10¹²) times scaled ranks (10⁹) stay exact.
    Returns (event_type, stationary_scaled, stationary).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    )
    counts = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wm = Window.partitionBy("from_type")
    cells = counts.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wm).cast("long").alias("rs"),
    ).localCheckpoint()
    d38 = "decimal(38,0)"
    wall = Window.partitionBy()
    v = (
        cells.select(F.col("from_type").alias("t"))
        .distinct()
        .withColumn("_nt", F.count(F.lit(1)).over(wall))
        .select(
            "t",
            F.expr(f"CAST({int(scale)} AS BIGINT) div _nt")
            .cast("long")
            .alias("v"),
        )
    )
    for _ in range(iterations):
        stepped = (
            cells.join(v, cells["from_type"] == v["t"])
            .select(
                F.col("to_type").alias("t2"),
                F.expr(
                    "(CAST(v AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))"
                    " div CAST(rs AS DECIMAL(38,0))"
                ).cast(d38).alias("c"),
            )
            .groupBy("t2")
            .agg(F.sum("c").alias("m"))
            .withColumn("_tot", F.sum("m").over(wall).cast(d38))
        )
        v = stepped.select(
            F.col("t2").alias("t"),
            F.expr(
                f"(CAST({int(scale)} AS DECIMAL(38,0)) * m)"
                " div CAST(_tot AS DECIMAL(38,0))"
            ).cast("long").alias("v"),
        )
    return v.select(
        F.col("t").alias(type_col),
        F.col("v").alias("stationary_scaled"),
        (F.col("v").cast("double") / F.lit(float(scale))).alias(
            "stationary"
        ),
    )


def funnel_stage_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    bucket_s: int = 60,
    percentiles: Sequence[int] = (50, 90),
) -> DataFrame:
    """Stage-to-stage conversion latency: for every consecutive funnel
    stage pair, EXACT percentiles of the time between a converted
    user's two entry timestamps — the "where does the funnel stall"
    readout that stage counts alone can't give (a 95% step that takes
    a median of three days is still a stall).

    Latencies are floored to ``bucket_s``-second buckets (integer
    epoch-microsecond div — exact, non-negative) so the percentile
    machinery runs on VALUE grain (:func:`grouped_value_percentiles`
    — cum·100 ≥ n·q integer cross-multiplication, never a float
    boundary). Entry times come from the SAME ordered chain as
    :func:`funnel` via the shared ``_funnel_entries`` helper.

    Scale shape: the funnel chain is per-stage keyed aggs + user
    equi-joins on one uniform key; each transition adds one user
    equi-join of two shrinking survivor frames; percentile windows run
    on (transition, bucket)-grain rows. Returns one row per
    transition: (transition, n_rows = converted users, p{q}...).
    """
    reached = _funnel_entries(df, user_col, ts_col, type_col, stages)
    div_us = int(bucket_s) * 1_000_000
    gaps = None
    for k in range(len(stages) - 1):
        a = reached[k].select("u", F.col("entry_ts").alias("t0"))
        b = reached[k + 1].select("u", F.col("entry_ts").alias("t1"))
        g = a.join(b, "u").select(
            F.lit(f"{stages[k]}->{stages[k + 1]}").alias("transition"),
            F.expr(
                f"(unix_micros(t1) - unix_micros(t0)) div {div_us}"
            ).cast("long").alias("bucket"),
        )
        gaps = g if gaps is None else gaps.unionByName(g)
    return grouped_value_percentiles(
        gaps, "transition", "bucket", percentiles=percentiles
    )


def also_bought_topk(
    items: DataFrame,
    k: int = 3,
    min_pair_count: int = 2,
    max_basket_size: int = 200,
) -> DataFrame:
    """Item-item collaborative filtering over a ``(basket, item)``
    frame: for every item, the top-``k`` co-purchased items by
    cosine-normalized co-occurrence ``n_ab / (√n_a·√n_b)`` — the
    "customers also bought" recommendation table, where the
    normalization stops popular staples from dominating every list
    (raw n_ab is maximal for whatever everyone buys anyway).

    Declared semantics: per-item totals n_i count ALL baskets the item
    appears in, while pair counts only accumulate inside size-eligible
    baskets (2..``max_basket_size``) — so an item's score is slightly
    deflated by its appearances in degenerate baskets, identically in
    engine and oracle.

    Exactness: basket counts are exact integers off the SAME
    posting-list pair expansion as :func:`pair_counts`; the score is
    one IEEE tree (sqrt is correctly rounded) over exact longs —
    bit-identical in any engine; ranking ties break deterministically
    (score DESC, neighbor key ASC).

    Scale shape: pair expansion is basket-bounded (``max_basket_size``
    caps the quadratic); item totals are one keyed reduction of the
    distinct (basket, item) frame; the per-item top-k window runs over
    each item's co-purchase NEIGHBOR list (bounded by observed
    co-purchase degree, not catalog size). Returns
    (item, rank, also_bought, pair_n, score).
    """
    pairs = pair_counts(
        items, min_pair_count=min_pair_count,
        max_basket_size=max_basket_size,
    )
    totals = (
        items.select("basket", "item")
        .distinct()
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    )
    sym = pairs.select(
        F.col("item_a").alias("i"),
        F.col("item_b").alias("j"),
        "pair_n",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("i"),
            F.col("item_a").alias("j"),
            "pair_n",
        )
    )
    scored = (
        sym.join(totals.select(F.col("item").alias("i"),
                               F.col("n_b").alias("n_i")), "i")
        .join(totals.select(F.col("item").alias("j"),
                            F.col("n_b").alias("n_j")), "j")
        .select(
            "i",
            "j",
            "pair_n",
            (
                F.col("pair_n").cast("double")
                / (
                    F.sqrt(F.col("n_i").cast("double"))
                    * F.sqrt(F.col("n_j").cast("double"))
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("score").desc(), F.col("j").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("i").alias("item"),
            F.col("rank").cast("int").alias("rank"),
            F.col("j").alias("also_bought"),
            F.col("pair_n").cast("long").alias("pair_n"),
            "score",
        )
    )


def revenue_bridge(
    li: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    year0: int,
    year1: int,
    group_col: str = "p_brand",
) -> DataFrame:
    """Year-over-year revenue bridge per group — the FP&A waterfall
    decomposition "how much of the revenue change was volume vs
    price": with group-level aggregates R (discounted revenue) and Q
    (quantity) for each year,

        ΔR = (Q1−Q0)·P0  +  Q1·(P1−P0),   P = R/Q

    an exact algebraic identity (volume effect at old prices + price
    effect at new volume). The decomposition uses AGGREGATE prices, so
    every emitted effect is scalar IEEE math over exact decimal sums —
    deterministic in any engine — and the two effects reconcile to ΔR
    up to one rounding ulp each (they are separate IEEE expressions;
    the identity is exact in the reals, not re-added here).

    Groups missing a year zero-fill through the FULL OUTER join;
    effects are NULL when the base year has no volume (P0 undefined).

    Scale shape: one fact scan per year filter (partition-prunable on
    the date), reduced to group grain map-side; the bridge is a
    #groups-row full-outer equi-join + per-row scalar math.
    Returns (group, r0, r1, delta, volume_effect, price_effect).
    """
    def year_agg(y: int, suffix: str) -> DataFrame:
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .filter(F.year("o_orderdate") == y)
            .join(part, li["l_partkey"] == part["p_partkey"])
        )
        return j.groupBy(F.col(group_col).alias("g")).agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * dec(F.lit(1) - F.col("l_discount"), 12, 2)
            ).alias(f"r{suffix}"),
            F.sum(dec("l_quantity", 12, 2)).alias(f"q{suffix}"),
        )
    a0 = year_agg(year0, "0")
    a1 = year_agg(year1, "1")
    j = a0.join(a1, "g", "full")

    def _dbl(c):
        return c.cast("string").cast("double")

    r0 = _dbl(F.coalesce(F.col("r0"), F.lit(0)))
    r1 = _dbl(F.coalesce(F.col("r1"), F.lit(0)))
    q0 = _dbl(F.coalesce(F.col("q0"), F.lit(0)))
    q1 = _dbl(F.coalesce(F.col("q1"), F.lit(0)))
    p0 = r0 / q0
    p1 = r1 / q1
    return j.select(
        F.col("g").alias(group_col),
        r0.alias("r0"),
        r1.alias("r1"),
        (r1 - r0).alias("delta"),
        F.when(q0 == 0.0, F.lit(None).cast("double"))
        .otherwise((q1 - q0) * p0)
        .alias("volume_effect"),
        F.when((q0 == 0.0) | (q1 == 0.0), F.lit(None).cast("double"))
        .otherwise(q1 * (p1 - p0))
        .alias("price_effect"),
    )


def resurrection_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    dormancy_days: int = 7,
) -> DataFrame:
    """Resurrected-user counts per week: events whose same-user
    predecessor lies at least ``dormancy_days`` days back mark a
    RETURN FROM DORMANCY, bucketed by epoch week — the growth-
    accounting lane (new / retained / resurrected / churned) that
    retention matrices and DAU curves don't isolate (a flat DAU can
    hide churn exactly offset by resurrection).

    Weeks are epoch-day ``div`` 7 integers (no engine week-start
    convention in play); the predecessor comes from one per-user
    lag() under the (ts, id) total order; a user resurrects at most
    once per gap (the event closing the gap), counted once per week
    per user in ``n_users``.

    Scale shape: one user-keyed window exchange over the fact, then
    a week-grain reduction. Returns (week, n_resurrections,
    n_users).
    """
    wu = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
    seq = df.select(
        F.col(user_col).alias("u"),
        day.alias("d"),
        F.lag(day).over(wu).alias("pd"),
    )
    res = seq.filter(
        F.col("pd").isNotNull()
        & (F.col("d") - F.col("pd") >= int(dormancy_days))
    ).select("u", F.expr("d div 7").cast("long").alias("week"))
    return res.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_resurrections"),
        F.countDistinct("u").cast("long").alias("n_users"),
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): the rows not DOMINATED in the
    maximize-both sense — row A dominates row B iff x_A >= x_B and
    y_A >= y_B with at least one strict. The multi-criteria shortlist
    operator ("no other order is both bigger AND more recent").

    Window formulation instead of the naive O(n^2) dominance anti-join:
    reduce to x-grain (per distinct x, the max y = the only candidate
    y), take the running max of y over STRICTLY greater x (x-grain
    frame, one lag), and a row survives iff its y equals its x-level's
    max y and beats every higher-x level's best y. Rows tying on both
    coordinates co-survive (neither strictly dominates).

    Exactness: comparisons only — no arithmetic at all, so any ordered
    column types (decimal, date, integer) cross-check bit-for-bit.

    Scale shape: one x-grain aggregation, one x-grain window (bounded
    by distinct x values, not rows), one semi-join back to the input.
    Returns the surviving input rows (id, x, y).
    """
    xg = df.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(F.col(y_col)).alias("_my")
    )
    w = Window.orderBy(F.col("_x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        xg.withColumn("_best_above", F.max("_my").over(w))
        .filter(
            F.col("_best_above").isNull()
            | (F.col("_my") > F.col("_best_above"))
        )
        .select("_x", "_my")
    )
    return df.join(
        frontier,
        (F.col(x_col) == F.col("_x")) & (F.col(y_col) == F.col("_my")),
        "inner",
    ).select(
        F.col(id_col), F.col(x_col), F.col(y_col)
    )


def backlog_timeline(
    opened: DataFrame,
    closed: DataFrame,
    day_col: str = "d",
) -> DataFrame:
    """Daily open-item backlog: how many items have been opened but not
    yet closed as of each day — the queue-depth series behind ops
    dashboards (open orders, unresolved tickets, in-flight shipments).

    ``opened`` / ``closed`` are (day) frames with one row per item
    event (an item missing from ``closed`` stays in the backlog
    forever — the honest semantics for never-completed items). The
    timeline runs over the union of observed days; backlog_d =
    cumulative opens through d minus cumulative closes through d,
    exact BIGINT running sums over the day-grain frame.

    Scale shape: two day-grain aggregations, one day-grain outer
    merge, one ordered day-grain window (calendar-bounded rows — the
    global window sorts days, not items). Returns
    (d, n_opened, n_closed, backlog).
    """
    o = opened.groupBy(F.col(day_col).alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_opened")
    )
    c = closed.groupBy(F.col(day_col).alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_closed")
    )
    merged = o.join(c, "d", "full").select(
        "d",
        F.coalesce("n_opened", F.lit(0)).alias("n_opened"),
        F.coalesce("n_closed", F.lit(0)).alias("n_closed"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return merged.select(
        "d",
        "n_opened",
        "n_closed",
        (F.sum("n_opened").over(w) - F.sum("n_closed").over(w))
        .cast("long")
        .alias("backlog"),
    )


def audience_overlap(
    df: DataFrame,
    key_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """Pairwise audience Jaccard between keys: for every key pair, how
    much their member sets overlap — the segmentation / cannibalization
    audit ("do purchasers and reviewers come from the same users?").

    Posting-list formulation: reduce to the DISTINCT (member, key)
    frame, self-join on member with key_a < key_b for intersection
    sizes, join per-key set sizes, jaccard = inter / (na + nb - inter)
    — exact integers and one IEEE division.

    Scale shape: one distinct reduction (member-keyed shuffle), the
    intersection self-join fans out per member by its key count
    (bounded by the key cardinality, e.g. 5 event types -> <= 10 pair
    rows per member), two broadcast-sized per-key count joins. Never
    materializes member sets as arrays. Returns
    (key_a, key_b, n_a, n_b, n_common, jaccard).
    """
    # cache: mk feeds the per-key sizes AND both self-join sides; without
    # reuse the fact would be scanned and distinct-shuffled three times.
    # (cache, not checkpoint: member-grain can be large; let Spark spill
    # or recompute under pressure.)
    mk = df.select(
        F.col(member_col).alias("m"), F.col(key_col).alias("k")
    ).distinct().cache()
    sizes = mk.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = mk.select("m", F.col("k").alias("key_a"))
    b = mk.select("m", F.col("k").alias("key_b"))
    inter = (
        a.join(b, "m")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("k").alias("key_a"),
                                     F.col("n").alias("n_a"))),
            "key_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("k").alias("key_b"),
                                     F.col("n").alias("n_b"))),
            "key_b",
        )
        .select(
            "key_a", "key_b", "n_a", "n_b", "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                .cast("double")
            ).alias("jaccard"),
        )
    )


def bot_score_heuristic(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    min_events: int = 5,
    flag_min_events: int = 20,
    flag_modal_share: float = 0.5,
) -> DataFrame:
    """Bot-traffic heuristic per user: humans emit irregular inter-event
    gaps, schedulers emit the SAME gap over and over — so the share of
    a user's gaps equal to their single most common (modal) gap is the
    cheap mechanical-traffic screen a training-data events pipeline
    runs before any engagement metric (bots pollute funnels, DAU, and
    behavioral corpora alike). Complements the CV^2 regularity census:
    modal share catches the exact-period scheduler that a low-variance
    test also flags, but stays meaningful for bimodal bots (cron +
    jitter) where variance lies.

    Per user with >= ``min_events`` events: event count, distinct
    types, modal gap (microseconds, deterministic tie-break to the
    SMALLEST gap), modal share of all gaps, and the flag
    (n_events >= flag_min_events AND modal_share > flag_modal_share).
    All counts exact; the share is one division.

    Scale shape: one user-keyed window for the gaps (ordered by
    (ts, id) — unique total order), one (user, gap)-grain count, one
    per-user window for the modal pick, one user-grain join. Returns
    (user, n_events, n_types, modal_gap_us, modal_share, is_bot_like).
    """
    w = Window.partitionBy("u").orderBy("t", "i")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("t"),
        F.col(id_col).alias("i"),
        F.col(type_col).alias("et"),
    )
    per_user = ev.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("et").cast("long").alias("n_types"),
    ).filter(F.col("n_events") >= min_events)
    gaps = (
        ev.withColumn("prev_t", F.lag("t").over(w))
        .filter(F.col("prev_t").isNotNull())
        .select("u", (F.col("t") - F.col("prev_t")).alias("gap_us"))
    )
    gap_counts = gaps.groupBy("u", "gap_us").agg(
        F.count(F.lit(1)).cast("long").alias("n_gap")
    )
    wm = Window.partitionBy("u").orderBy(
        F.col("n_gap").desc(), F.col("gap_us").asc()
    )
    modal = (
        gap_counts.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("u", F.col("gap_us").alias("modal_gap_us"),
                F.col("n_gap").alias("_modal_n"))
    )
    out = per_user.join(modal, "u")
    share = F.col("_modal_n").cast("double") / (
        F.col("n_events") - 1
    ).cast("double")
    return out.select(
        F.col("u").alias(user_col),
        "n_events",
        "n_types",
        "modal_gap_us",
        share.alias("modal_share"),
        (
            (F.col("n_events") >= flag_min_events)
            & (share > F.lit(flag_modal_share))
        ).alias("is_bot_like"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    bin_col: Column,
) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H test across k groups — the
    rank-based "do these k populations differ in location?" test that
    generalizes the two-group Mann-Whitney U (dup_length_mwu) and is
    robust where the mean-based ANOVA entry is whale-dragged.

    ``bin_col`` must map values onto a BOUNDED ordinal grid — the
    ks_drift binning contract: ranking a continuous column at value
    grain is data-sized, so production rank tests bin first, and the
    H of the binned data (midranks over bins) is then EXACT. All rank
    arithmetic is integer: the doubled midrank of bin b is
    2*cum(b) - c(b) + 1 (an integer — no .5 decimals needed), group
    rank sums accumulate cnt * rank2 in DECIMAL(38,0), and the tie
    term sums c^3 - c per bin. The k per-group H terms
    (R_g^2 / n_g = R2_g^2 / (4 n_g)) are each ONE string-parse double
    division of exact decimals, then folded in GROUP-NAME order with
    F.aggregate (the ordered-fold idiom: both engines add the same
    IEEE doubles in the same order — a plain float SUM over groups
    would be partition-order-dependent).

    Scale shape: one (bin, group)-keyed count aggregate is the only
    corpus-sized shuffle; the midrank window runs over the REDUCED
    bin-grain frame; the group frame is k rows; the tie rider is a
    1-row broadcast cross (CROSS_OK pattern).

    Returns ONE row: (n BIGINT, k_groups BIGINT, n_tied_bins BIGINT,
    h DOUBLE, tie_correction DOUBLE, h_corrected DOUBLE,
    epsilon_sq DOUBLE).
    """
    d38 = "decimal(38,0)"

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    vt = (
        df.select(
            F.col(group_col).alias("g"), bin_col.cast("long").alias("b")
        )
        .groupBy("b", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # lineage cut: vt feeds the bin totals AND the group rank sums —
        # the frame is (bin x group) grain, grid-bounded by contract
        .localCheckpoint()
    )
    v = vt.groupBy("b").agg(F.sum("cnt").cast("long").alias("c"))
    wcum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = v.select(
        "b",
        "c",
        (
            F.lit(2) * F.sum("c").over(wcum) - F.col("c") + F.lit(1)
        )
        .cast("long")
        .alias("rank2"),  # doubled midrank: 2*cum - c + 1, exact integer
    )
    groups = (
        vt.join(ranked.select("b", "rank2"), "b")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(F.col("cnt").cast(d38) * F.col("rank2").cast(d38))
            .cast(d38)
            .alias("r2"),
        )
    )
    term = _dbl((F.col("r2") * F.col("r2")).cast(d38)) / _dbl(
        (F.lit(4).cast(d38) * F.col("n_g").cast(d38)).cast(d38)
    )
    folded = groups.select("g", "n_g", term.alias("t")).agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("g", "t"))),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("s_terms"),
    )
    ties = v.agg(
        F.sum(
            F.col("c").cast(d38) * F.col("c").cast(d38) * F.col("c").cast(d38)
            - F.col("c").cast(d38)
        )
        .cast(d38)
        .alias("tie3"),
        F.sum((F.col("c") > 1).cast("int")).cast("long").alias("n_tied_bins"),
    )
    # 1-row tie rider (CROSS_OK: the grand-total rider pattern)
    j = folded.crossJoin(F.broadcast(ties))
    nn1 = (F.col("n").cast(d38) * (F.col("n") + 1).cast(d38)).cast(d38)
    n3n = (
        F.col("n").cast(d38) * F.col("n").cast(d38) * F.col("n").cast(d38)
        - F.col("n").cast(d38)
    ).cast(d38)
    h = (
        F.lit(12.0) * F.col("s_terms") / _dbl(nn1)
        - F.lit(3.0) * (F.col("n") + 1).cast("double")
    )
    tie_corr = F.lit(1.0) - _dbl(F.col("tie3")) / _dbl(n3n)
    return j.select(
        "n",
        "k_groups",
        "n_tied_bins",
        h.alias("h"),
        tie_corr.alias("tie_correction"),
        F.when(tie_corr > 0, h / tie_corr).alias("h_corrected"),
        (h / (F.col("n") - 1).cast("double")).alias("epsilon_sq"),
    )
