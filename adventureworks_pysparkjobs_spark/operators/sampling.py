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


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Group-aware train/test split: the unit of assignment is the
    near-dup CLUSTER, not the document, so near-duplicates can never
    straddle the split (the standard leakage guard — a test document's
    paraphrase in train silently inflates eval scores).

    ``pairs`` is any near-dup pair frame (``ngram_jaccard_pairs``,
    ``minhash_lsh_pairs``, ...); clusters come from connected components
    (min-label propagation), singletons fall back to their own id, and
    the split is the same auditable MD5 bucket as
    ``train_test_split_col`` — hashed on the GROUP id. Adds
    ``split_group`` and ``split`` columns. Cost beyond the pair
    computation: the label-propagation joins (pair-frame-sized, tiny
    next to the corpus) + one broadcast-or-shuffle join back.
    """
    from .dedup import dedup_clusters

    clusters = dedup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    j = df.join(clusters, id_col, "left")
    group = F.coalesce(F.col("cluster_id"), F.col(id_col))
    return (
        j.withColumn("split_group", group)
        .withColumn(
            "split",
            train_test_split_col("split_group", test_fraction, salt),
        )
        .drop("cluster_id")
    )


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


def stratified_sample(
    df: DataFrame,
    group_col: str,
    frac: float,
    key_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Keep EXACTLY floor(frac * n_g) rows per group, chosen by
    deterministic hash order — exact per-stratum quotas where
    ``deterministic_sample`` gives only expected fractions (hash
    thresholding binomially wobbles per group; a 1000-doc stratum keeps
    300 here, 280-320 there). The price of exactness is a per-group
    total order: rank and group count share ONE shuffle on the group
    key (both windows partition identically), so cost matches
    ``cap_per_group``. A pathologically hot group serializes its own
    window sort — for corpus strata (source/domain/language) group
    cardinality is bounded and this is the right trade; for skewed or
    unbounded groups use hash thresholding instead. Floor(frac * n) is
    one IEEE multiply of identical operands — engine-portable, so exact
    quotas survive into the SQL oracle."""
    w_ord = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.col(key_col),
    )
    w_grp = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_n", F.count(F.lit(1)).over(w_grp))
        .filter(
            F.col("_rn")
            <= F.floor(F.lit(frac) * F.col("_n").cast("double"))
        )
        .drop("_rn", "_n")
    )


def shuffle_key(col: str | Column, salt: str = "shuffle") -> Column:
    """The export-shuffle order key: ``md5(salt || key)``. ONE definition
    shared by ``deterministic_shuffle`` and any consumer that needs to
    order by the same permutation without re-sorting (e.g. the corpus
    pipeline packs chunks in this order) — and the formula an
    engine-portable oracle inlines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(salt), c.cast("string")))


def deterministic_shuffle(
    df: DataFrame, key_col: str, salt: str = "shuffle"
) -> DataFrame:
    """Reproducible global pseudo-random ordering — the pre-training
    export shuffle: order the corpus by ``shuffle_key`` (tie-broken
    on the key) so every run, engine, and input partitioning emits the
    IDENTICAL order, yet the order is hash-random with respect to any
    source/time locality in the data.

    Catalyst plans this as a range-partitioned sort (sample the hash
    distribution, range-shuffle, sort within partitions) — the scalable
    global sort: no single reducer, and output files are contiguous hash
    ranges that concatenate to the full order. Changing ``salt`` yields
    an independent epoch permutation.
    """
    return df.orderBy(shuffle_key(key_col, salt), F.col(key_col))


def assign_row_ids(
    df: DataFrame, order_by: list[str], id_name: str = "row_id"
) -> DataFrame:
    """Contiguous 0-based global row ids in the total order given by
    ``order_by`` (which must be a unique total order — include the PK),
    WITHOUT the classic bottleneck: a global
    ``row_number() OVER (ORDER BY ...)`` plans a single-partition window
    that funnels 100 TB through one task.

    Scalable shape instead:

    1. global sort = range partition + sort-within (what Catalyst
       already does for ``orderBy``) — no single reducer;
    2. per-partition ``row_number`` windows keyed on the physical
       partition id — every partition numbers itself independently;
    3. partition row-counts (one tiny bounded collect: #partitions
       rows) become cumulative offsets, joined back on the partition id
       (a broadcast of a #partitions-row table).

    The ids depend only on the total order, NOT on where Spark draws
    the range boundaries — offsets absorb partition sizes — so the
    output is deterministic across runs, cluster sizes, and engines
    (oracle: ``ROW_NUMBER() OVER (ORDER BY ...) - 1``). The sorted
    frame is localCheckpoint'ed so the count pass and the numbering
    pass see the identical partitioning (and the sort runs once).
    """
    cols = [F.col(c) for c in order_by]
    sorted_df = df.orderBy(*cols).localCheckpoint()
    pid = F.spark_partition_id().alias("_pid")
    withpid = sorted_df.select("*", pid)
    sizes = sorted(
        (r["_pid"], r["cnt"])
        for r in withpid.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for p, cnt in sizes:
        offsets.append((p, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        withpid.join(F.broadcast(off_df), "_pid")
        .withColumn(
            id_name, F.col("_offset") + F.row_number().over(w) - F.lit(1)
        )
        .drop("_pid", "_offset")
    )


def mixture(
    sources: dict[str, DataFrame],
    rates: dict[str, float],
    key_col: str,
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixture: deterministically subsample each named
    source at its rate (``rates[name]`` is an absolute keep-fraction, not
    a relative proportion), tag rows with the source name, and union.

    Membership is auditable per row (hash of the key, salted by the
    source name so the same document kept in one source is an independent
    draw in another), stable across runs and partitionings — the property
    corpus-mixture reproducibility actually requires. Sampling filters
    push to each source's scan; the union is plan-level (no shuffle).
    """
    parts = [
        deterministic_sample(df, key_col, rates[name], salt=f"mix:{name}")
        .withColumn(source_col, F.lit(name))
        for name, df in sorted(sources.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dsir_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hashed n-gram feature rows (id, feature string): lowered
    whitespace unigrams + space-joined bigrams — per-row array
    expressions, zero shuffles before the explode."""
    from .text import tokens

    t = F.transform(tokens(text_col), lambda x: F.lower(x))
    bigrams = F.when(
        F.size(F.col("_t")) >= 2,
        F.expr(
            "transform(sequence(1, size(_t) - 1), "
            "i -> concat(_t[i - 1], ' ', _t[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), t.alias("_t"))
        .select("id", F.explode(F.concat(F.col("_t"), bigrams)).alias("f"))
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every corpus document by how
    much more likely its hashed n-gram features are under a small
    TARGET distribution than under the raw corpus distribution —
    the cheap proxy for "select web documents that look like the
    high-quality target domain".

    Features are lowered unigrams+bigrams hashed into ``buckets`` MD5
    buckets (``hash_bucket`` — engine-portable, so the exact count
    columns oracle-check cross-engine). Bucket probabilities are
    add-one smoothed; a document's log-weight is
    Σ_b n_b · (ln p_target(b) − ln p_source(b)). Each per-bucket
    log-ratio is one closed-form double expression; the per-document
    sum pins each product to DECIMAL(38,18) before summing, so the
    weight is partition-order-independent (ln itself is last-ulp
    libm-dependent — catalog entries exclude the weight column from
    cross-engine oracles, tests/test_dsir.py pins it in-engine).

    Scale shape: two bucket-count aggregations (bounded output:
    ``buckets`` rows) + one corpus-sized explode → per-doc bucket
    groupBy → join against the bounded bucket table (AQE broadcasts
    it) → per-doc re-aggregation. The target side is typically tiny
    (a benchmark/wiki sample); the corpus is scanned twice (once for
    source counts, once for scoring) — persist the feature frame to
    make it once if the pipeline composes further.

    Returns (id_col, n_features, n_target_hits, logweight).
    """
    corpus_feats = _dsir_features(corpus, id_col, text_col).withColumn(
        "b", hash_bucket(F.col("f"), buckets, salt="dsir")
    )
    target_feats = _dsir_features(target, id_col, text_col).withColumn(
        "b", hash_bucket(F.col("f"), buckets, salt="dsir")
    )
    ct = target_feats.groupBy("b").agg(F.count("*").alias("ct"))
    cs = corpus_feats.groupBy("b").agg(F.count("*").alias("cs"))
    nt = target_feats.agg(F.count("*").alias("nt"))
    ns = corpus_feats.agg(F.count("*").alias("ns"))
    # bucket table: <= buckets rows; source side is the driver (every
    # scored feature exists in the corpus by construction)
    ratio = (
        cs.join(ct, "b", "left")
        .join(F.broadcast(nt))
        .join(F.broadcast(ns))
        .select(
            "b",
            (F.coalesce(F.col("ct"), F.lit(0)) > 0).alias("in_target"),
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast(
                        "double"
                    )
                    / (F.col("nt") + F.lit(buckets)).cast("double")
                )
                - F.log(
                    (F.col("cs") + F.lit(1)).cast("double")
                    / (F.col("ns") + F.lit(buckets)).cast("double")
                )
            ).alias("logratio"),
        )
    )
    doc_buckets = corpus_feats.groupBy("id", "b").agg(
        F.count("*").alias("n_b")
    )
    scored = (
        doc_buckets.join(ratio, "b")
        .groupBy("id")
        .agg(
            F.sum("n_b").alias("n_features"),
            F.sum(F.when(F.col("in_target"), F.col("n_b")).otherwise(0))
            .alias("n_target_hits"),
            F.sum(
                (F.col("n_b") * F.col("logratio")).cast("decimal(38,18)")
            )
            .cast("double")
            .alias("logweight"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce("n_target_hits", F.lit(0)).alias("n_target_hits"),
            F.coalesce("logweight", F.lit(0.0)).alias("logweight"),
        )
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    shard_rows: int,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-shard assignment: rows take the
    ``deterministic_shuffle`` order (hash-random, epoch-salted,
    engine-portable) and fill fixed-size shards in that order —
    ``shard_id = row_id div shard_rows``.

    Built on ``assign_row_ids``; the ids (hence shard boundaries)
    depend only on the keys, never on partitioning, so re-running the
    export — on any cluster size or engine — produces byte-identical
    shard membership. Adds (row_id, shard_id)."""
    with_key = df.withColumn("_sk", shuffle_key(key_col, salt))
    ids = assign_row_ids(with_key, order_by=["_sk", key_col])
    return ids.withColumn(
        "shard_id", F.expr(f"row_id div {int(shard_rows)}")
    ).drop("_sk")


def shard_manifest(
    sharded: DataFrame,
    key_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Verifiable per-shard manifest for an ``assign_shards`` frame:
    (shard_id, n_rows, n_bytes, digest) where digest =
    sha256 over the shard's per-row md5s in row_id order — the
    consumer-side integrity check a training job runs before trusting
    a shard (and the manifest diff that detects a changed re-export).

    Per-row md5s are map-side expressions; the per-shard fold sorts
    the (bounded: ``shard_rows``) collected row digests by row_id, so
    the digest is partition-order-independent. One keyed shuffle.
    """
    row_md5 = F.md5(
        F.concat_ws(
            "|", F.col(key_col).cast("string"),
            *[F.col(c).cast("string") for c in content_cols],
        )
    )
    n_bytes = sum(
        (F.octet_length(F.col(c).cast("string")) for c in content_cols),
        F.lit(0),
    )
    per_row = sharded.select(
        "shard_id",
        "row_id",
        row_md5.alias("_h"),
        n_bytes.alias("_b"),
    )
    ordered_digest = F.sha2(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("row_id", F.col("_h")))
                ),
                lambda s: s["_h"],
            ),
            "",
        ),
        256,
    )
    return per_row.groupBy("shard_id").agg(
        F.count("*").alias("n_rows"),
        F.sum("_b").cast("bigint").alias("n_bytes"),
        ordered_digest.alias("digest"),
    )


def write_shards(
    sharded: DataFrame, path: str
) -> None:
    """Land an ``assign_shards`` frame as one directory per shard
    (``shard_id=N/``) — each shard's rows are range-contiguous in the
    export order, so a training loader streams shard files in row_id
    order and sees the exact global shuffle. Repartitioning by shard
    keeps one writer per shard (files-per-shard = 1 without a
    coalesce gamble)."""
    (
        sharded.repartition("shard_id")
        .sortWithinPartitions("shard_id", "row_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "pps",
) -> DataFrame:
    """Systematic probability-proportional-to-size (PPS) sampling:
    draw ``k`` picks where each row's expected pick count is
    k·w/W (classic survey-sampling systematic selection over the
    cumulative-weight line). The training-data use: sample documents
    proportional to an integer quality/length weight without the
    rejection loops or transcendental keys (``u^(1/w)``) that break
    bit-determinism across engines.

    Fully integer-exact and deterministic: rows are laid on the weight
    line in md5-shuffled order (salted hash of the id, then the id — a
    unique total order, rule 4), and row i is picked
    ``floor(k·cum_i/W) − floor(k·(cum_i−w_i)/W)`` times — computed in
    DECIMAL(38,0)·div arithmetic, which is exact in Spark and mirrors
    DuckDB HUGEINT ``//`` (no double ever enters the decision).
    Σ n_picks = k by telescoping; a row with w > W/k can be picked
    more than once (reported in ``n_picks``, standard PPS semantics).

    Scale shape (the assign_row_ids pattern): the global cumulative sum
    is NOT a single-partition window — the frame range-partitions on
    the sort key, each partition cumsums locally, and per-partition
    weight totals (one bounded collect of #partitions rows) become
    broadcast offsets. Weights must be non-negative integers.

    Returns the picked rows: (id, weight, n_picks).
    """
    hkey = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    ).alias("_hkey")
    w_long = F.col(weight_col).cast("long").alias("_w")
    base = df.select(F.col(id_col), w_long, hkey)
    sorted_df = base.orderBy("_hkey", id_col).localCheckpoint()
    withpid = sorted_df.select(
        "*", F.spark_partition_id().alias("_pid")
    )
    sizes = sorted(
        (r["_pid"], r["s"])
        for r in withpid.groupBy("_pid")
        .agg(F.sum("_w").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for p, s in sizes:
        offsets.append((p, acc))
        acc += int(s or 0)
    total_w = acc
    if total_w <= 0:
        raise ValueError("pps_systematic_sample: total weight must be > 0")
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _offset long"
    )
    win = (
        Window.partitionBy("_pid")
        .orderBy("_hkey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.col("_offset") + F.sum("_w").over(win)).alias("_cum")
    laid = withpid.join(F.broadcast(off_df), "_pid").select(
        id_col, "_w", cum
    )
    kd = f"CAST({int(k)} AS DECIMAL(38,0))"
    wd = f"CAST({int(total_w)} AS DECIMAL(38,0))"
    picks = F.expr(
        f"({kd} * CAST(_cum AS DECIMAL(38,0))) div {wd}"
    ) - F.expr(
        f"({kd} * CAST(_cum - _w AS DECIMAL(38,0))) div {wd}"
    )
    return (
        laid.withColumn("n_picks", picks)
        .filter(F.col("n_picks") >= 1)
        .select(
            id_col,
            F.col("_w").alias(weight_col),
            F.col("n_picks").cast("long").alias("n_picks"),
        )
    )


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str,
    sqrt_steps: int = 1,
    scale: int = 10**6,
) -> DataFrame:
    """Temperature-rebalanced mixture rates over a grouping column —
    the multilingual/multi-source sampling recipe (rate ∝ n^α) that
    up-weights low-resource groups: α = 1/2^``sqrt_steps`` (0.5 by
    default, the XLM-R-style square-root temperature).

    Exactness by construction: α is restricted to 1/2^k so the power
    is k composed ``sqrt`` calls — IEEE-754 REQUIRES sqrt to be
    correctly rounded, so (unlike exp/ln-based pow) every intermediate
    double is bit-identical across engines. Each group's weight then
    becomes ``floor(sqrt^k(n)·scale)`` — an exact integer — and the
    normalizer is an INTEGER sum (associative, partition-order-free
    where a float Σ over groups would be order-dependent). The final
    rate is one IEEE division of identical integer operands.

    One corpus scan total: the normalizer is a global-window sum OVER
    the already-aggregated #groups frame (a #groups-row single-partition
    exchange fed by the count aggregate — never raw data), so the
    source is not scanned a second time for the total as a separate
    ``agg`` lineage would. Group cardinality (languages/sources) is
    bounded by contract. Returns (group, n_rows, weight_scaled, rate)
    with Σ rate ≈ 1.
    """
    if sqrt_steps < 1:
        raise ValueError("temperature_mixture_rates: sqrt_steps >= 1")
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    w = F.col("n_rows").cast("double")
    for _ in range(sqrt_steps):
        w = F.sqrt(w)
    weighted = counts.withColumn(
        "weight_scaled",
        F.floor(w * F.lit(float(scale))).cast("long"),
    )
    tot = F.sum("weight_scaled").over(Window.partitionBy()).cast("long")
    return weighted.select(
        group_col,
        "n_rows",
        "weight_scaled",
        (
            F.col("weight_scaled").cast("double") / tot.cast("double")
        ).alias("rate"),
    )


def token_budget_allocation(
    df: DataFrame,
    group_col: str,
    tokens_col: Column,
    budget_num: int = 3,
    budget_den: int = 2,
    max_epochs: int = 4,
    scale: int = 10**6,
) -> DataFrame:
    """Epoch-capped token-budget allocation across corpus groups — the
    planning step of LLM data mixing: given each group's available
    token mass, a training budget of ``budget_num/budget_den × total
    tokens``, and square-root temperature target shares, how many
    tokens does each group contribute, how many epochs (repeats) does
    that imply, and how much of the target is unrealizable under the
    ``max_epochs`` repetition cap (the "repeating data beyond ~4
    epochs stops helping" rule)?

    Exactness: available-token sums are exact BIGINTs; temperature
    weights are ``floor(sqrt(avail)·scale)`` integers (IEEE sqrt is
    correctly rounded); the budget and each target are DECIMAL(38,0)
    multiply + ``div`` — exact integer arithmetic that mirrors HUGEINT
    ``//`` — so every allocation column is integer-exact and the only
    doubles are one division each (epochs). NULL epochs for an empty
    group.

    Scale shape: ONE corpus scan reducing to group grain map-side;
    the two normalizers are global-window sums over the #groups frame
    (bounded by contract — languages/sources); everything after is
    per-group scalar math. Returns one row per group.
    """
    avail = df.groupBy(group_col).agg(
        F.sum(tokens_col.cast("long")).cast("long").alias("avail_tokens")
    )
    weighted = avail.withColumn(
        "weight_scaled",
        F.floor(
            F.sqrt(F.col("avail_tokens").cast("double"))
            * F.lit(float(scale))
        ).cast("long"),
    )
    win = Window.partitionBy()
    framed = weighted.withColumn(
        "_wtot", F.sum("weight_scaled").over(win).cast("long")
    ).withColumn("_btot", F.sum("avail_tokens").over(win).cast("long"))
    framed = framed.withColumn(
        "_budget",
        F.expr(
            f"(CAST(_btot AS DECIMAL(38,0)) * {int(budget_num)})"
            f" div {int(budget_den)}"
        ).cast("long"),
    )
    target = F.expr(
        "(CAST(_budget AS DECIMAL(38,0))"
        " * CAST(weight_scaled AS DECIMAL(38,0)))"
        " div CAST(_wtot AS DECIMAL(38,0))"
    ).cast("long")
    framed = framed.withColumn("target_tokens", target)
    # Same DECIMAL(38,0) multiply-then-cast idiom as _budget/target above:
    # a BIGINT product would overflow silently for avail_tokens near
    # 2^63/max_epochs, unlike the decimal-carried siblings.
    cap = F.expr(
        f"CAST(avail_tokens AS DECIMAL(38,0)) * {int(max_epochs)}"
    ).cast("long")
    alloc = F.least(F.col("target_tokens"), cap)
    return framed.select(
        group_col,
        "avail_tokens",
        "weight_scaled",
        "target_tokens",
        alloc.alias("alloc_tokens"),
        F.when(F.col("avail_tokens") == 0, F.lit(None).cast("double"))
        .otherwise(
            alloc.cast("double") / F.col("avail_tokens").cast("double")
        )
        .alias("epochs"),
        (F.col("target_tokens") - alloc).cast("long").alias(
            "shortfall_tokens"
        ),
    )
