"""Declarative data-quality constraint auditing — the read-side twin
of ``relational.enforce_schema`` (which hard-fails at publish time;
reference parity: the BQ_SCHEMAS nullability flags at
transform_to_bq.py:28–74 are documentation-only there).

An audit runs a rule set against a table and returns one row per rule
with its violation count — the pre-publish gate of a scheduled
pipeline, and the shape monitoring systems ingest.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ForeignKey:
    """FK rule: every non-null ``cols`` tuple must exist in
    ``ref.select(ref_cols)``."""

    name: str
    cols: tuple[str, ...]
    ref: DataFrame
    ref_cols: tuple[str, ...]


def audit_constraints(
    df: DataFrame,
    unique: list[tuple[str, ...]] | None = None,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float | None, float | None]] | None = None,
    predicates: dict[str, Column] | None = None,
    foreign_keys: list[ForeignKey] | None = None,
) -> DataFrame:
    """Run a constraint rule set; return (rule, violations) rows.

    Scale shape: every not_null / range / predicate rule is a
    conditional count inside ONE aggregation over ONE scan of the
    table (a row violating k rules feeds k counters in the same
    pass). Each uniqueness rule costs one keyed agg on its own key;
    each FK costs one left-anti join (dimension sides broadcast-able,
    AQE's call). Output is rules-sized — collect-safe.
    """
    unique = unique or []
    not_null = not_null or []
    ranges = ranges or {}
    predicates = predicates or {}
    foreign_keys = foreign_keys or []

    results: list[DataFrame] = []

    # one-pass conditional counters
    counters: list[Column] = []
    names: list[str] = []
    for c in not_null:
        counters.append(
            F.count_if(F.col(c).isNull()).alias(f"_r{len(counters)}")
        )
        names.append(f"not_null:{c}")
    for c, (lo, hi) in ranges.items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        counters.append(F.count_if(cond).alias(f"_r{len(counters)}"))
        names.append(f"range:{c}")
    for rule_name, pred in predicates.items():
        counters.append(
            F.count_if(~pred).alias(f"_r{len(counters)}")
        )
        names.append(f"predicate:{rule_name}")
    if counters:
        wide = df.agg(*counters)
        long = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("rule"),
                            F.col(f"_r{i}").alias("violations"),
                        )
                        for i, n in enumerate(names)
                    ]
                )
            ).alias("kv")
        ).select("kv.rule", "kv.violations")
        results.append(long)

    for cols in unique:
        dupes = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum("_n"), F.lit(0)).alias("violations")
            )
            .select(
                F.lit(f"unique:{','.join(cols)}").alias("rule"),
                "violations",
            )
        )
        results.append(dupes)

    for fk in foreign_keys:
        # IsNotNull conjunction, not na.drop: na.drop plans
        # AtLeastNNonNulls, which parquet cannot push to the scan.
        non_null = F.lit(True)
        for c in fk.cols:
            non_null = non_null & F.col(c).isNotNull()
        probe = df.select(*fk.cols).where(non_null)
        ref = fk.ref.select(
            *[
                F.col(rc).alias(c)
                for c, rc in zip(fk.cols, fk.ref_cols)
            ]
        ).distinct()
        orphans = (
            probe.join(ref, list(fk.cols), "left_anti")
            .agg(F.count("*").alias("violations"))
            .select(F.lit(f"fk:{fk.name}").alias("rule"), "violations")
        )
        results.append(orphans)

    if not results:
        raise ValueError("audit_constraints: no rules given")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: dict[str, Column],
    k: int,
) -> DataFrame:
    """k-anonymity audit over generalized quasi-identifiers: one row
    per equivalence class (the distinct combination of generalized QI
    values) with its population and whether it meets the k threshold —
    the privacy gate a training-data release runs before publishing
    user-derived tables.

    ``quasi_identifiers`` maps output column name -> generalization
    expression (e.g. a bucketed balance, a truncated zip). The audit is
    ONE keyed aggregate on the generalized values (map-side partials;
    uniform unless the generalization itself is degenerate), so it
    costs a single shuffle of class-count rows at any scale.

    Returns (*qi_cols, class_size BIGINT, is_k_anonymous BOOLEAN).
    """
    if k < 2:
        raise ValueError("k_anonymity_audit: k must be >= 2")
    named = [expr.alias(name) for name, expr in quasi_identifiers.items()]
    return (
        df.select(*named)
        .groupBy(*quasi_identifiers)
        .agg(F.count("*").cast("long").alias("class_size"))
        .withColumn("is_k_anonymous", F.col("class_size") >= F.lit(k))
    )


def k_anonymize(
    df: DataFrame,
    quasi_identifiers: dict[str, Column],
    k: int,
) -> DataFrame:
    """Suppression-model k-anonymization: drop every row whose
    generalized equivalence class holds fewer than ``k`` rows, so any
    published row is indistinguishable from >= k-1 others on the
    quasi-identifiers. Generalization expressions are appended as
    columns (callers project away the raw QIs before release).

    Class sizes come from the ``k_anonymity_audit`` aggregate and
    rejoin on the generalized key — a keyed equi-join AQE broadcasts
    when the class table is small, never a window over raw rows. The
    join is NULL-SAFE on every QI column (``eqNullSafe`` plans the same
    hash join — null-safe equality is still an equi-join key), because
    the audit's groupBy treats a NULL-valued generalized key as a
    normal equivalence class: a plain equi-join would silently suppress
    every row of a NULL-keyed class that the audit reports as passing
    k, making anonymize and audit disagree.
    """
    audit = k_anonymity_audit(df, quasi_identifiers, k)
    keep = audit.where(F.col("is_k_anonymous")).select(
        *[F.col(n).alias(f"__ka_{n}") for n in quasi_identifiers]
    )
    named = [expr.alias(name) for name, expr in quasi_identifiers.items()]
    # a QI alias may shadow the source column it generalizes (e.g. a
    # passthrough {"seg": col("seg")}) — keep exactly one column per name
    base = [df[c] for c in df.columns if c not in quasi_identifiers]
    withqi = df.select(*base, *named)
    cond = None
    for n in quasi_identifiers:
        c = withqi[n].eqNullSafe(keep[f"__ka_{n}"])
        cond = c if cond is None else cond & c
    return withqi.join(keep, cond, "inner").drop(
        *[f"__ka_{n}" for n in quasi_identifiers]
    )


# Benford expected first-digit probabilities log10(1 + 1/d), pinned as
# literals (shared with the SQL oracle verbatim) so no engine evaluates
# a transcendental at runtime — the audit arithmetic stays bit-portable.
BENFORD_P = {
    1: 0.3010299956639812, 2: 0.17609125905568124,
    3: 0.12493873660829993, 4: 0.09691001300805642,
    5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(
    df: DataFrame, col: str, tol: float = 0.02
) -> DataFrame:
    """First-digit (Benford's-law) distribution audit of a positive
    numeric column — the classic fabricated-data / unit-drift smell
    test for financial measures. Returns one row per digit 1-9:
    (digit, n_obs, frac_obs, benford_p, within_tol).

    Counting is exact: the digit is the first SIGNIFICANT digit — the
    first ``[1-9]`` character of the value's own string rendering, so
    0.0042 counts as digit 4 and 9.3e17 as digit 9 (a fixed-width
    decimal cast would misread the former as '0' and overflow the
    latter to NULL, silently dropping both from the 9 digit rows while
    still summing them into n_total). Any faithful rendering — plain or
    scientific, either engine — starts its mantissa with the same
    significant digit, so the extraction is engine-portable without
    touching a transcendental. Rows ≤ 0 or null are excluded, and every
    included row lands in exactly one of the 9 rows, so n_total is
    consistent by construction. ``frac_obs`` is one IEEE division of
    identical integer operands and the expected probabilities are
    pinned literals. One conditional-count aggregate over one scan; the
    9-row result joins a 9-row literal frame. A fabricated or re-scaled
    column shows up as ``within_tol = false`` digits.
    """
    first = F.regexp_extract(
        F.col(col).cast("string"), "[1-9]", 0
    ).cast("int")
    counts = (
        df.where(F.col(col).isNotNull() & (F.col(col) > 0))
        .select(first.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spark = df.sparkSession
    expected = spark.createDataFrame(
        sorted(BENFORD_P.items()), "digit int, benford_p double"
    )
    total = counts.agg(F.sum("n_obs").alias("n_total"))
    frac = F.col("n_obs").cast("double") / F.col("n_total").cast("double")
    return (
        expected.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))  # 1-row frame
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            F.coalesce(frac, F.lit(0.0)).alias("frac_obs"),
            "benford_p",
            (
                F.abs(F.coalesce(frac, F.lit(0.0)) - F.col("benford_p"))
                <= F.lit(tol)
            ).alias("within_tol"),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_identifiers: dict[str, Column],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Distinct l-diversity audit: k-anonymity's necessary companion —
    a k-anonymous class whose members all share ONE sensitive value
    still leaks it (homogeneity attack), so each equivalence class must
    carry at least ``l`` distinct sensitive values before release.

    Same scale shape as ``k_anonymity_audit``: ONE aggregate keyed on
    the generalized quasi-identifiers. The distinct count is exact —
    ``count(DISTINCT sensitive)`` partially aggregates per partition
    (Spark plans it as a two-phase distinct-on-key aggregate), so the
    shuffle carries (class, sensitive)-level rows at worst, never raw
    rows with payload. NULL sensitive values are not a 'value' an
    attacker learns and are excluded from the diversity count (a class
    of all-NULL sensitives has l_distinct = 0 and fails any l >= 1).

    Returns (*qi_cols, class_size BIGINT, l_distinct BIGINT,
    is_l_diverse BOOLEAN).
    """
    if l < 2:
        raise ValueError("l_diversity_audit: l must be >= 2")
    named = [expr.alias(name) for name, expr in quasi_identifiers.items()]
    return (
        df.select(*named, F.col(sensitive_col).alias("_sens"))
        .groupBy(*quasi_identifiers)
        .agg(
            F.count("*").cast("long").alias("class_size"),
            F.count_distinct(F.col("_sens")).cast("long").alias(
                "l_distinct"
            ),
        )
        .withColumn("is_l_diverse", F.col("l_distinct") >= F.lit(l))
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_identifiers: dict[str, Column],
    sensitive_col: str,
    t: float,
) -> DataFrame:
    """t-closeness audit: the third gate of the release trio
    (k-anonymity -> l-diversity -> t-closeness). An l-diverse class can
    still leak through SKEW — if 95% of a class shares one sensitive
    value while the population is uniform, an attacker's posterior
    moves a lot. t-closeness bounds, per equivalence class, the
    distance between the class's sensitive-value distribution and the
    GLOBAL distribution. For categorical sensitives under the
    equal-ground-distance metric, the Earth-Mover's Distance reduces to
    total variation: ``0.5 * sum_v |p_class(v) - p_global(v)|``.

    Engine-identical by construction: the TVD numerator is accumulated
    EXACTLY in DECIMAL(38,0) integer arithmetic —
    ``sum_v |n_cv*N - N_v*n_c|`` over values present in the class, plus
    ``(N - sum_present N_v) * n_c`` for the absent-value tail (absent
    values contribute |0 - N_v/N| each; their sum telescopes, so the
    class never joins against the full value domain) — and the single
    double division happens once at the end through the
    string-parse cast (DECIMAL->VARCHAR->DOUBLE is correctly rounded in
    both engines; a direct decimal->double cast is not, in DuckDB).

    Scale shape: one (QI, sensitive)-grain aggregate over the raw rows
    (the only corpus-sized shuffle), a window re-sum on the QI keys
    that REUSES that exchange's partitioning (class sizes without a
    second scan), a value-grain re-aggregate of the already-reduced
    frame (|V| rows), and a 1-row total rider. NULL sensitive values
    are excluded, matching ``l_diversity_audit``.

    Returns (*qi_cols, class_size BIGINT, t_distance DOUBLE,
    is_t_close BOOLEAN).
    """
    from pyspark.sql import Window

    named = [expr.alias(name) for name, expr in quasi_identifiers.items()]
    qi = list(quasi_identifiers)
    cv = (
        df.select(*named, F.col(sensitive_col).alias("_sens"))
        .filter(F.col("_sens").isNotNull())
        .groupBy(*qi, "_sens")
        .agg(F.count("*").cast("long").alias("n_cv"))
    )
    n_c = F.sum("n_cv").over(Window.partitionBy(*qi)).alias("n_c")
    win = cv.select("*", n_c)
    vg = cv.groupBy("_sens").agg(F.sum("n_cv").cast("long").alias("n_v"))
    tot = vg.agg(F.sum("n_v").cast("long").alias("n_tot"))
    d38 = "decimal(38,0)"
    j = win.join(vg, "_sens").crossJoin(F.broadcast(tot))  # 1-row rider
    present = F.sum(
        F.abs(
            F.col("n_cv").cast(d38) * F.col("n_tot").cast(d38)
            - F.col("n_v").cast(d38) * F.col("n_c").cast(d38)
        )
    )
    absent = (
        F.max("n_tot").cast(d38) - F.sum("n_v").cast(d38)
    ) * F.max("n_c").cast(d38)
    cls = j.groupBy(*qi).agg(
        F.max("n_c").cast("long").alias("class_size"),
        (present + absent).cast(d38).alias("_num"),
        F.max("n_tot").cast("long").alias("_n_tot"),
    )
    denom = (
        F.lit(2).cast(d38)
        * F.col("class_size").cast(d38)
        * F.col("_n_tot").cast(d38)
    )
    t_dist = (
        F.col("_num").cast("string").cast("double")
        / denom.cast(d38).cast("string").cast("double")
    )
    return cls.select(
        *qi,
        "class_size",
        t_dist.alias("t_distance"),
        (t_dist <= F.lit(float(t))).alias("is_t_close"),
    )


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
) -> DataFrame:
    """Predict a join's output size and skew WITHOUT executing it — the
    pre-flight check before an expensive fact⋈fact join: for each key
    value k, an inner equi-join emits l_k·r_k rows, so the exact output
    cardinality, the worst single-key fanout, and both sides' unmatched
    row counts all follow from the two per-key histograms (reduced,
    key-grain frames) full-outer-joined on the key.

    Cost: one keyed aggregate per side + one key-grain join — each
    shuffle carries distinct-key rows, not data rows. The predicted
    row count accumulates in DECIMAL(38,0) (two petabyte-scale facts
    can predict beyond int64) and is also reported as BIGINT when it
    fits (NULL otherwise — a join that big is the finding).

    Returns ONE row: (n_left, n_right, n_join_predicted_exact
    DECIMAL(38,0) as DOUBLE, n_join_predicted BIGINT or NULL,
    max_key_fanout BIGINT, rows_left_unmatched, rows_right_unmatched,
    n_keys_matched BIGINT).
    """
    lk = [F.col(c).alias(f"_k{i}") for i, c in enumerate(left_keys)]
    rk = [F.col(c).alias(f"_k{i}") for i, c in enumerate(right_keys)]
    kn = [f"_k{i}" for i in range(len(left_keys))]
    lh = left.select(*lk).groupBy(*kn).agg(
        F.count("*").cast("long").alias("_ln")
    )
    rh = right.select(*rk).groupBy(*kn).agg(
        F.count("*").cast("long").alias("_rn")
    )
    both = lh.join(rh, kn, "full_outer").select(
        F.coalesce(F.col("_ln"), F.lit(0)).alias("ln"),
        F.coalesce(F.col("_rn"), F.lit(0)).alias("rn"),
    )
    d38 = "decimal(38,0)"
    prod = F.col("ln").cast(d38) * F.col("rn")
    return both.agg(
        F.sum("ln").cast("long").alias("n_left"),
        F.sum("rn").cast("long").alias("n_right"),
        F.sum(prod).alias("_pred"),
        F.max(prod).cast("long").alias("max_key_fanout"),
        F.sum(F.when(F.col("rn") == 0, F.col("ln")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_left_unmatched"),
        F.sum(F.when(F.col("ln") == 0, F.col("rn")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_right_unmatched"),
        F.count_if((F.col("ln") > 0) & (F.col("rn") > 0))
        .cast("long")
        .alias("n_keys_matched"),
    ).select(
        "n_left",
        "n_right",
        F.col("_pred").cast("string").cast("double").alias(
            "n_join_predicted_exact"
        ),
        F.when(
            F.col("_pred") <= F.lit(2**63 - 1).cast(d38),
            F.col("_pred").cast("long"),
        ).alias("n_join_predicted"),
        "max_key_fanout",
        "rows_left_unmatched",
        "rows_right_unmatched",
        "n_keys_matched",
    )


def duplicate_payment_pairs(
    df: DataFrame,
    entity_col: str,
    id_col: str,
    amount_col: str,
    date_col: str,
    band_width: float = 1000.0,
    window_days: int = 90,
) -> DataFrame:
    """Duplicate-payment audit: pairs of records for the same entity
    whose amounts differ by at most ``band_width`` within
    ``window_days`` of each other — the double-billing / double-refund
    sweep every payments team runs. The amount tolerance is enforced
    EXACTLY (``|amount_a - amount_b| <= band_width``, one IEEE
    subtraction — portable): banding is only the join blocking, and
    one side probes its own band plus both neighbors, so
    near-identical amounts straddling a band boundary (999.99 vs
    1000.01 at band_width=1000) are still paired — no boundary
    false-negative class. Band = floor of ONE double division
    (portable for the non-negative amounts a payment fact
    guarantees).

    Scale shape: a self equi-join keyed on (entity, band) with a
    3-band probe-side explode (constant 3x on ONE side, not a pair
    blow-up) — the band key bounds each join group to one entity's
    similar-priced records, so the matched set is per-entity-band
    quadratic, never global; the amount, day-window and id-order
    predicates prune inside the matched group. A pair meets via
    exactly one probe offset (offset = band_b - band_a), so no dedup
    pass is needed. Deterministic pair orientation via id_a < id_b.
    Returns (entity, id_a, id_b, amount_a, amount_b, day_gap).
    """
    band = F.floor(
        F.col(amount_col) / F.lit(float(band_width))
    ).cast("long")
    side = df.select(
        F.col(entity_col).alias("entity"),
        F.col(id_col).alias("_id"),
        F.col(amount_col).alias("_amt"),
        F.col(date_col).alias("_dt"),
        band.alias("_band"),
    )
    a = side.select(
        "entity",
        F.col("_id").alias("id_a"),
        F.col("_amt").alias("amount_a"),
        F.col("_dt").alias("_dt_a"),
        F.explode(
            F.array(
                F.col("_band") - 1, F.col("_band"), F.col("_band") + 1
            )
        ).alias("_probe"),
    )
    b = side.select(
        F.col("entity").alias("_e2"), F.col("_band").alias("_b2"),
        F.col("_id").alias("id_b"),
        F.col("_amt").alias("amount_b"),
        F.col("_dt").alias("_dt_b"),
    )
    gap = F.datediff(F.to_date("_dt_b"), F.to_date("_dt_a"))
    return (
        a.join(
            b,
            (F.col("entity") == F.col("_e2"))
            & (F.col("_probe") == F.col("_b2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(
            (F.abs(gap) <= window_days)
            & (
                F.abs(F.col("amount_a") - F.col("amount_b"))
                <= F.lit(float(band_width))
            )
        )
        .select(
            "entity", "id_a", "id_b", "amount_a", "amount_b",
            gap.cast("int").alias("day_gap"),
        )
    )


def key_gap_islands(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Gaps-and-islands audit of an integer surrogate-key column: the
    ``top_k`` largest runs of MISSING keys between the column's min and
    max — the "did the loader drop a batch / did the sequence skip"
    sweep a warehouse runs on every id-bearing fact. Returns
    (gap_start, gap_end, gap_len BIGINT), largest first, deterministic
    at the limit boundary via the (len DESC, start) total order.

    Scale shape: keys reduce to DISTINCT first (a HashAggregate — also
    the audit-correct move: the column under audit may itself carry
    duplicates), island ends/starts fall out of two keyed self
    anti-joins (k present, k+1 / k-1 absent), and only the BOUNDARY
    frame — two rows per island, not per key — flows through the
    global row_number pairing windows and the final top-k
    (TakeOrderedAndProject). Mostly-contiguous keys (the audit's
    premise) keep that frame tiny; a pathological every-other-key
    input degrades to O(keys), which is exactly the input such an
    audit exists to catch. All arithmetic is exact BIGINT.
    """
    from pyspark.sql import Window

    keys = (
        df.select(F.col(key_col).cast("long").alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
    )
    shifted_up = keys.select((F.col("k") + 1).alias("k"))
    shifted_dn = keys.select((F.col("k") - 1).alias("k"))
    # k is an island END when k+1 is absent <=> k not in (present - 1)
    ends = keys.join(shifted_dn, "k", "left_anti")
    starts = keys.join(shifted_up, "k", "left_anti")
    w = Window.orderBy("k")
    e = ends.select(
        F.col("k").alias("end_k"), F.row_number().over(w).alias("rn")
    )
    s = starts.select(
        F.col("k").alias("start_k"),
        (F.row_number().over(w) - 1).alias("rn"),
    )
    # i-th island end pairs with the (i+1)-th island start; the global
    # max (last end) and min (first start) drop out of the inner join.
    return (
        e.join(s, "rn")
        .select(
            (F.col("end_k") + 1).alias("gap_start"),
            (F.col("start_k") - 1).alias("gap_end"),
            (F.col("start_k") - F.col("end_k") - 1).alias("gap_len"),
        )
        .orderBy(F.col("gap_len").desc(), "gap_start")
        .limit(top_k)
    )


def functional_dependency_audit(
    df: DataFrame,
    dependencies: Sequence[tuple[str, str]],
) -> DataFrame:
    """Audit candidate functional dependencies LHS → RHS: for each
    (lhs, rhs) pair, how many LHS values map to MORE than one distinct
    RHS value — the schema-discovery / data-contract check behind
    "brand determines manufacturer" style assumptions that silently
    break joins and dimensional models when violated.

    Per dependency: ``n_keys`` distinct LHS values, ``n_violating``
    LHS values with ≥ 2 distinct RHS, ``max_rhs_distinct`` (the worst
    fan-out), and ``violation_rate`` (one IEEE division of exact
    longs). NULL LHS rows are excluded (a NULL key determines
    nothing); NULL RHS counts as a value (a key mapping to both NULL
    and non-NULL IS a violation) — the (lhs, rhs) pair-grain
    reduction groups NULL as its own value identically in any engine.

    Scale shape: per dependency one (lhs, rhs)-grain reduction then
    one lhs-grain reduction — two keyed hash aggs with map-side
    partials, output |dependencies| rows unioned at plan level.
    """
    outs = []
    for lhs, rhs in dependencies:
        per_pair = (
            df.filter(F.col(lhs).isNotNull())
            .groupBy(F.col(lhs).alias("k"), F.col(rhs).alias("v"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        per_key = per_pair.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n_rhs")
        )
        outs.append(
            per_key.agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.count_if(F.col("n_rhs") > 1).cast("long").alias(
                    "n_violating"
                ),
                F.max("n_rhs").cast("long").alias("max_rhs_distinct"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_keys",
                "n_violating",
                "max_rhs_distinct",
                (
                    F.col("n_violating").cast("double")
                    / F.col("n_keys").cast("double")
                ).alias("violation_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
