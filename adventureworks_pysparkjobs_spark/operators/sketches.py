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


def _bloom_pos(col, h: int, m_bits: int):
    """Position of hash ``h`` for a key in an m-bit Bloom filter — the
    CMS bucket idiom (md5 slice -> long % m), one row-tag per hash."""
    hh = F.md5(F.concat(F.lit(f"bl{h}|"), col.cast("string")))
    return F.conv(F.substring(hh, 1, 8), 16, 10).cast("long") % m_bits


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 2,
) -> DataFrame:
    """Build a Bloom filter over a key set as a WORD TABLE: (word_idx,
    word_val) rows, 62 bits per BIGINT word (bits 62/63 unused — no
    sign-bit shifts to reason about cross-engine). The filter a
    runtime pre-filter ships to the fact side of a selective join:
    m/62 rows regardless of key count, built by ONE keyed bit_or
    aggregate over the per-key hash positions (map-side partial OR —
    OR is associative/commutative, so the build is partition-order
    free and engine-exact)."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    _bloom_pos(F.col(key_col), h, m_bits)
                    for h in range(n_hashes)
                ]
            )
        ).alias("p")
    )
    return (
        pos.select(
            F.expr("CAST(p DIV 62 AS BIGINT)").alias("word_idx"),
            # expr form: the python shiftleft wrapper takes only a
            # literal shift amount, not a Column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 62 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word_val"))
    )


def bloom_prefilter_audit(
    member_keys: DataFrame,
    probe: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    n_hashes: int = 2,
) -> DataFrame:
    """Audit of Bloom-filter semi-join pre-filtering — the runtime-
    filter pattern that makes selective joins cheap at 100 TB: build a
    tiny bit table from the dimension side's qualifying keys, probe the
    fact side's keys through it, and pass only probable members to the
    real join. This operator measures the trade on real data: how many
    probe keys pass the filter, how many are true members, and the
    observed false-positive rate (Bloom filters never false-negative —
    the audit would surface a broken hash as n_member > n_pass).

    Determinism: positions are md5-slice hashes (the CMS idiom), the
    filter build is an associative bit_or, membership tests are exact
    bit arithmetic, and fp_rate is ONE division of exact counts —
    bit-identical cross-engine, no probabilistic flakiness (the filter
    is deterministic once built; only its THEORETICAL fp rate is
    probabilistic).

    Scale shape: the word table is m/62 rows — broadcast-sized by
    construction at any SF; each hash probe is one equi-join of the
    DISTINCT probe keys against it; ground truth is one keyed
    left-semi-style join; the readout is one global aggregate.
    Returns ONE row (n_probe, n_member, n_pass_bloom, n_false_pos,
    fp_rate DOUBLE — NULL when every probe key is a member).
    """
    words = bloom_build(member_keys, key_col, m_bits, n_hashes)
    pk = probe.select(F.col(key_col).alias("k")).distinct()
    cur = pk
    for h in range(n_hashes):
        wtab = words.select(
            F.col("word_idx").alias(f"_w{h}"),
            F.col("word_val").alias(f"_v{h}"),
        )
        cur = (
            cur.withColumn("_p", _bloom_pos(F.col("k"), h, m_bits))
            .withColumn(f"_w{h}", F.expr("CAST(_p DIV 62 AS BIGINT)"))
            .withColumn(f"_b{h}", (F.col("_p") % 62).cast("int"))
            .drop("_p")
            .join(wtab, f"_w{h}", "left")
            .withColumn(
                f"_hit{h}",
                F.coalesce(
                    F.expr(
                        f"(_v{h} & shiftleft(CAST(1 AS BIGINT), _b{h}))"
                        " <> CAST(0 AS BIGINT)"
                    ),
                    F.lit(False),
                ),
            )
            .drop(f"_w{h}", f"_v{h}", f"_b{h}")
        )
    passes = cur.withColumn(
        "_pass",
        F.expr(" AND ".join(f"_hit{h}" for h in range(n_hashes))),
    )
    members = member_keys.select(
        F.col(key_col).alias("k")
    ).distinct().withColumn("_m", F.lit(True))
    flagged = passes.join(members, "k", "left").select(
        "_pass", F.coalesce(F.col("_m"), F.lit(False)).alias("_member")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.count_if(F.col("_member")).cast("long").alias("n_member"),
        F.count_if(F.col("_pass")).cast("long").alias("n_pass_bloom"),
        F.count_if(F.col("_pass") & ~F.col("_member"))
        .cast("long")
        .alias("n_false_pos"),
    )
    return agg.select(
        "n_probe", "n_member", "n_pass_bloom", "n_false_pos",
        F.when(
            F.col("n_probe") - F.col("n_member") == 0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.col("n_false_pos").cast("double")
            / (F.col("n_probe") - F.col("n_member")).cast("double")
        )
        .alias("fp_rate"),
    )
