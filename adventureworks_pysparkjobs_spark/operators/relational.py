"""Core relational operator helpers.

Thin, deliberately-declarative helpers over the DataFrame API. Everything
here stays inside Catalyst/whole-stage-codegen: no UDFs, no collect().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Pin a (usually double) column to an exact decimal BEFORE arithmetic.

    Decimal addition is exact and associative, which makes aggregate results
    independent of partitioning/visit order — a requirement for
    deterministic cross-engine results and for stable results across
    cluster sizes (local[32] today, 1000 executors at 100 TB).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


def enforce_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Select + cast + nullability-check a frame against a declared schema.

    Strict upgrade of the reference's pre-sink projection, which only
    reorders columns (reference: code_base/transform_to_bq.py:86) and treats
    declared types/nullability as documentation. Here the cast is real and
    non-nullable fields get a runtime guard that poisons the row with a
    raised error at execution time rather than silently writing nulls.
    """
    cols = []
    for f_ in schema.fields:
        c = F.col(f_.name).cast(f_.dataType)
        if not f_.nullable:
            c = F.when(
                c.isNull(),
                F.raise_error(F.lit(f"null in non-nullable column {f_.name}")),
            ).otherwise(c)
        cols.append(c.alias(f_.name))
    return df.select(*cols)


def topk_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via row_number over a window.

    ``order_by`` must be a unique total order within each partition
    (append the PK as the last key) or results are nondeterministic.
    Scale note: this shuffles once on ``partition_by`` and sorts within
    partitions — no global sort, no driver involvement; skewed groups are
    handled by AQE.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    id_col: str | None = None,
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-boundaries formulation — two window
    functions over the same (user, ts) window, one shuffle total.
    ``id_col`` (a PK) is appended to the ordering for a unique total order.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_is_new", is_new).withColumn(
        "session_seq",
        F.sum("_is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_is_new")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left side with a random
    bucket and replicate the right side across all buckets, so one hot key
    spreads over ``salt_buckets`` tasks instead of one straggler.

    AQE's skew-join splitting handles most cases at runtime; explicit
    salting remains the tool when a single key dominates so heavily that
    even split partitions straggle, or when AQE is unavailable (streaming
    state, non-shuffle joins). The salt is rand()-based on the probe side
    only — join results are exact regardless of salt values.
    """
    s_left = left.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    s_right = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = s_left.join(s_right, [key, "_salt"], how)
    return out.drop("_salt")


def upsert_snapshot(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_by: list[str],
) -> DataFrame:
    """MERGE-style full-refresh upsert without a table format: the latest
    row per key wins across base ∪ updates (ties broken by ``order_by``,
    which must be a total order — include a version/ts column).

    This is the Delta/Iceberg-free emulation of MERGE INTO: one union +
    one window shuffle on the keys; at scale it rewrites only the
    partitions touched if the caller partitions the output. Lineage note:
    with equal order_by values, updates win over base (tagged ordering).
    """
    tagged_base = base.withColumn("_src", F.lit(0))
    tagged_upd = updates.withColumn("_src", F.lit(1))
    unioned = tagged_base.unionByName(tagged_upd)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by], F.col("_src").desc()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def scd2_from_changes(
    changes: DataFrame,
    key: str,
    order_by: list[str],
    attrs: list[str],
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change/event
    stream: per ``key``, compress consecutive rows with identical
    ``attrs`` (only real transitions survive), then emit one validity
    interval per surviving version — ``valid_from`` (the change's
    ``order_by[0]`` value), ``valid_to`` (the NEXT change's, NULL while
    current) and ``is_current``.

    The type-2 companion of ``upsert_snapshot`` (type-1 latest-wins):
    where type-1 overwrites, type-2 appends history, which is what
    point-in-time joins and training-data snapshots need. One shuffle on
    the key serves both windows (change compression and interval
    construction); ``order_by`` must be a total order within the key
    (append the PK). Deterministic: transitions and intervals are pure
    functions of the ordered change sequence.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    cur = F.struct(*[F.col(a).alias(a) for a in attrs])
    # lag the struct itself: the first row's previous is a NULL struct
    # (a struct OF lagged fields would be non-null with null fields and
    # break the is-first test).
    chg = (
        changes.withColumn("_prev", F.lag(cur).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != cur))
        .drop("_prev")
    )
    nxt = F.lead(order_by[0]).over(w)
    return chg.select(
        key,
        *attrs,
        F.col(order_by[0]).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    order_col: str,
    attrs: list[str],
    validate: bool = False,
) -> DataFrame:
    """Incrementally apply a new change batch to an existing type-2
    history (``scd2_from_changes`` output shape) — touching ONLY the
    keys present in the batch.

    A key's compressed history rows ARE a change stream (one row per
    version at its ``valid_from``), so the merge re-derives just the
    affected keys: their history rows + the batch's new changes feed
    ``scd2_from_changes`` again, while every untouched key's history
    passes through by anti-join, unread beyond the key column. Per-batch
    cost is O(batch keys' history + batch), not O(all history) — the
    same incremental contract as ``dedup_against`` /
    ``minhash_lsh_pairs_against``. Chainable: output shape = input
    shape, so tomorrow's batch merges into today's result. Equals a
    full rebuild from the concatenated change stream whenever batches
    arrive in ``order_col`` order per key (the same time-ordered arrival
    contract as streaming sessionization).

    ``order_col`` is deliberately a SINGLE column, unlike
    ``scd2_from_changes``'s ``order_by`` list: replayed history rows
    carry only ``valid_from``, so no PK tie-break can survive a merge —
    the version timestamp itself must totally order each key's changes
    (dedupe same-instant changes upstream, e.g. ``dedup_keep_first``).
    A list parameter here would silently drop its tail; the narrower
    signature makes the contract structural.

    ``validate=True`` enforces the time-ordered arrival contract instead
    of merely documenting it: a batch whose ``order_col`` for some key
    is <= that key's history ``max(valid_from)`` would silently produce
    wrong intervals (history rows are replayed only AT their
    ``valid_from``, so an intra-interval late change cannot re-split the
    interval it lands in). The check is one bounded action — per-key
    min(batch) vs max(history) on batch keys only, O(batch + touched
    history), same keyed shuffle shape as the merge itself — and raises
    with a sample of offending keys. Opt-in because it forces an eager
    action where the merge is otherwise fully lazy.
    """
    batch_keys = changes.select(key).distinct()
    if validate:
        bmin = changes.groupBy(key).agg(F.min(order_col).alias("_bmin"))
        hmax = (
            history.join(batch_keys, key, "left_semi")
            .groupBy(key)
            .agg(F.max("valid_from").alias("_hmax"))
        )
        late = (
            bmin.join(hmax, key)
            .filter(F.col("_bmin") <= F.col("_hmax"))
            .limit(5)  # bounded driver collect: a sample to report
            .collect()
        )
        if late:
            sample = [
                (r[key], r["_bmin"], r["_hmax"]) for r in late
            ]
            raise ValueError(
                "scd2_merge: out-of-order batch violates the "
                "time-ordered arrival contract for key(s) "
                f"(key, batch_min, history_max_valid_from) = {sample}; "
                "late-arriving changes cannot re-split already-closed "
                "intervals — rebuild with scd2_from_changes over the "
                "full change stream, or quarantine these keys upstream"
            )
    untouched = history.join(batch_keys, key, "left_anti")
    replay = history.join(batch_keys, key, "left_semi").select(
        key, *attrs, F.col("valid_from").alias(order_col)
    )
    merged_stream = replay.unionByName(
        changes.select(key, *attrs, order_col)
    )
    rebuilt = scd2_from_changes(
        merged_stream, key=key, order_by=[order_col], attrs=attrs
    )
    return untouched.unionByName(rebuilt)


def union_evolved(frames: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas have DRIFTED (multi-source corpora,
    snapshot series across schema changes): the union's schema is the
    ordered union of all input columns (first-seen order), and each
    frame contributes NULL for columns it predates.

    Plain ``unionByName(allowMissingColumns=True)`` pairwise-folds to
    the same rows; building the target column set once keeps the plan a
    flat n-way Union of aligned projections instead of a nested ladder.
    Columns that exist in several frames must agree in type (Spark's
    union type coercion rules apply) — this helper aligns PRESENCE, not
    types; pair it with ``enforce_schema`` at the publish boundary.
    """
    if not frames:
        raise ValueError("union_evolved needs at least one frame")
    all_cols: list[str] = []
    for df in frames:
        for c in df.columns:
            if c not in all_cols:
                all_cols.append(c)
    aligned = []
    for df in frames:
        have = set(df.columns)
        aligned.append(
            df.select(
                *[
                    F.col(c) if c in have else F.lit(None).alias(c)
                    for c in all_cols
                ]
            )
        )
    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    buckets: int = 32,
) -> DataFrame:
    """Skew-proof exact distinct count: two-phase aggregation where the
    value space — not the row space — is salted.

    Spark's built-in ``count_distinct`` shuffles on (keys, value); a
    key with 10⁹ distinct values still funnels them all into that
    key's reducers. Here each distinct value is routed to exactly one
    of ``buckets`` sub-aggregators by its own hash
    (``pmod(xxhash64(value), buckets)``), so phase 1 counts distincts
    per (keys, bucket) — reducer state is bounded by |values|/buckets
    — and phase 2 sums the bucket counts (correct because the bucket
    partition of the value space is disjoint: no distinct value is
    counted twice). Both shuffles carry partial aggregates.

    Returns one row per key group: (*keys, n_distinct).
    """
    salted = df.groupBy(
        *keys,
        F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)).alias("_vbucket"),
    ).agg(F.count_distinct(F.col(col)).alias("_bucket_distinct"))
    return salted.groupBy(*keys).agg(
        F.sum("_bucket_distinct").alias("n_distinct")
    )


def merge_aggregate(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental materialized-view maintenance for an additive
    aggregate: fold a new batch's partial aggregate into the standing
    snapshot without rescanning history.

    Both inputs are already at the aggregate grain (same ``keys``,
    same additive measure columns); the merge is unionByName → one
    keyed re-sum. Because SUM/COUNT are commutative monoids,
    ``merge_aggregate(agg(h1), agg(h2)) == agg(h1 ∪ h2)`` exactly
    (decimal/integer measures — the property test pins it). At 100 TB
    the refresh cost is O(snapshot_groups + batch), never O(history
    rows): the snapshot side is the stored MV, one row per group.
    """
    merged = snapshot.select(*keys, *sum_cols).unionByName(
        delta.select(*keys, *sum_cols)
    )
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def snapshot_cdc(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    include_values: bool = False,
) -> DataFrame:
    """Derive a change stream by diffing two snapshots of the same
    table — CDC extraction for sources that have no change log (the
    reference's nightly full JDBC pull, db_to_parquet.py:154–166, is
    exactly such a source: two consecutive pulls diff into the change
    stream that ``scd2_merge``/``upsert_snapshot`` consume).

    One full-outer equi-join on the keys; per-row change typing is
    null-safe column comparison (pure expressions):
    ``insert`` (key only in new), ``delete`` (key only in old),
    ``update`` (any compared column differs), ``unchanged`` (dropped
    unless ``include_unchanged``). Emits (*keys, change_type,
    changed_cols sorted-array) — the changed-column list is what a
    downstream column-level audit or selective-refresh consumes. With
    ``include_values`` the compared columns' NEW values ride along
    (NULL for deletes), making the stream self-contained:
    ``apply_changes(old, cdc)`` reconstructs ``new`` exactly
    (round-trip property-tested).

    At 100 TB both sides shuffle once on the key (or the new side
    broadcasts if it is a small partition re-pull); comparing structs
    column-by-column stays in whole-stage codegen.
    """
    compare = compare_cols or [c for c in new.columns if c not in keys]
    # presence flags: a snapshot row exists iff its side of the join
    # matched — detected via a non-null marker column per side
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare],
    )
    j = o.join(n, keys, "full_outer")
    diffs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}")),
                        F.lit(c),
                    )
                    for c in compare
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(F.size("changed_cols") > 0, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = (
        j.withColumn("changed_cols", diffs)
        .withColumn("change_type", change)
        .withColumn(
            "changed_cols",
            F.when(
                F.col("change_type") == "update", F.col("changed_cols")
            ).otherwise(F.array().cast("array<string>")),
        )
        .select(
            *keys,
            "change_type",
            "changed_cols",
            *(
                [
                    F.col(f"_new_{c}").alias(c)
                    for c in compare
                ]
                if include_values
                else []
            ),
        )
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def apply_changes(
    old: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """Apply a ``snapshot_cdc(..., include_values=True)`` stream to the
    old snapshot, reconstructing the new one exactly: deletes anti-join
    out, updates/inserts replace-or-add by key (value columns = the
    change rows' payload). Two keyed joins; the inverse-of-diff
    round-trip ``apply_changes(old, snapshot_cdc(old, new)) == new``
    is property-tested."""
    value_cols = [
        c
        for c in changes.columns
        if c not in keys and c not in ("change_type", "changed_cols")
    ]
    if not value_cols:
        raise ValueError(
            "apply_changes needs a values-carrying stream "
            "(snapshot_cdc include_values=True)"
        )
    touched = changes.select(*keys)
    untouched = old.join(touched, keys, "left_anti")
    upserts = changes.filter(
        F.col("change_type").isin("insert", "update")
    ).select(*keys, *value_cols)
    return untouched.select(*keys, *value_cols).unionByName(upserts)


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """As-of lookup against SCD2 history (``scd2_from_changes`` /
    ``scd2_merge`` output): each fact row picks up the dimension
    version whose validity interval covers the fact's timestamp —
    ``valid_from <= ts < valid_to`` (open current version: NULL
    valid_to). THE reason type-2 history exists: joining facts to the
    dimension as it WAS, not as it is (training-data snapshots need
    the same semantics to avoid temporal leakage).

    Intervals per key are non-overlapping by construction, so each
    fact matches at most one version (left join keeps facts preceding
    the first version). Plans as one keyed equi-join carrying the
    range residual; both sides shuffle once on the key, and the
    history side is version-grain (tiny next to facts), so AQE usually
    broadcasts it.
    """
    # alias both sides: facts and history often share lineage (an SCD2
    # built from the same source), where frame[col] references are
    # ambiguous self-join columns
    f, h = facts.alias("_pit_f"), history.alias("_pit_h")
    cond = (
        (F.col(f"_pit_f.{key}") == F.col(f"_pit_h.{key}"))
        & (F.col(f"_pit_f.{ts_col}") >= F.col(f"_pit_h.{valid_from}"))
        & (
            F.col(f"_pit_h.{valid_to}").isNull()
            | (F.col(f"_pit_f.{ts_col}") < F.col(f"_pit_h.{valid_to}"))
        )
    )
    hist_cols = [c for c in history.columns if c != key]
    return f.join(h, cond, "left").select(
        *[F.col(f"_pit_f.{c}") for c in facts.columns],
        *[F.col(f"_pit_h.{c}") for c in hist_cols],
    )


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_suffix_chars: int = 2,
    max_distance: int = 1,
) -> DataFrame:
    """Blocked fuzzy string matching (record linkage): pairs of rows
    whose ``name_col`` values are within Levenshtein distance
    ``max_distance``, found WITHOUT an all-pairs comparison.

    Blocking key = (name minus its last ``block_suffix_chars`` chars,
    name length): candidates must agree on length and shared prefix,
    so only pairs differing inside the suffix window are compared —
    the standard recall/cost trade of blocked linkage (edits earlier
    in the string are missed BY DESIGN; widen the window or add a
    second blocking pass on reversed names for higher recall, each
    pass staying linear in block sizes). One self-equi-join on the
    block key; Levenshtein is an exact integer DP identical across
    engines, so results oracle-check.
    """
    blocked = df.select(
        F.col(id_col).alias("fid"),
        F.col(name_col).alias("fname"),
        F.concat_ws(
            ":",
            F.expr(
                f"substring({name_col}, 1, "
                f"length({name_col}) - {int(block_suffix_chars)})"
            ),
            F.length(name_col).cast("string"),
        ).alias("blk"),
    )
    a = blocked.select(
        F.col("fid").alias("id1"), F.col("fname").alias("name1"), "blk"
    )
    b = blocked.select(
        F.col("fid").alias("id2"), F.col("fname").alias("name2"), "blk"
    )
    dist = F.levenshtein("name1", "name2")
    return (
        a.join(b, "blk")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2", "name1", "name2",
            dist.cast("int").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )
