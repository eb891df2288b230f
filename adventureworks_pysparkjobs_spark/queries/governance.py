"""Governance / maintenance catalog entries: declarative constraint
auditing (operators/quality.py), incremental materialized-view merge
(relational.merge_aggregate), and skew-proof distinct counting
(relational.salted_count_distinct).

These make the reference's implicit contracts explicit and testable:
its BQ_SCHEMAS nullability flags (transform_to_bq.py:28–74) are
documentation-only and its daily rollup (transform_to_bq.py:160–165)
is rebuilt from scratch every run — here the contract is audited and
the rollup refreshes incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import ForeignKey, audit_constraints
from ..operators.relational import (
    dec,
    merge_aggregate,
    salted_count_distinct,
)
from ..sources.corpus import load_table, load_tables
from .catalog import query

_CUTOFF = "1997-07-01"


@query(
    "star_constraint_audit",
    oracle="""
    SELECT 'orders' AS tbl, 'not_null:o_custkey' AS rule,
           CAST(COUNT_IF(o_custkey IS NULL) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders', 'range:o_totalprice',
           CAST(COUNT_IF(o_totalprice < 0 OR o_totalprice > 300000)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders', 'unique:o_orderkey',
           CAST(COALESCE(SUM(n), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'orders', 'fk:orders_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem', 'range:l_discount',
           CAST(COUNT_IF(l_discount < 0 OR l_discount > 0.08) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'predicate:price_positive',
           CAST(COUNT_IF(NOT (l_extendedprice > 0)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'fk:lineitem_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    """,
    tags=("governance", "constraints", "audit", "fk", "unique"),
)
def star_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-publish constraint audit over the star's source tables
    (operators/quality.py): per-column rules share ONE scan per table
    (one conditional-counter agg); uniqueness is its own keyed agg;
    FKs are left-anti joins. The o_totalprice and l_discount ranges
    are deliberately tight so the audit reports non-zero violation
    counts — an all-zero audit can't prove the counters fire."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem", "customer"])
    orders_audit = audit_constraints(
        t["orders"],
        unique=[("o_orderkey",)],
        not_null=["o_custkey"],
        ranges={"o_totalprice": (0, 300000)},
        foreign_keys=[
            ForeignKey(
                "orders_customer",
                ("o_custkey",),
                t["customer"],
                ("c_custkey",),
            )
        ],
    ).select(F.lit("orders").alias("tbl"), "rule", "violations")
    lineitem_audit = audit_constraints(
        t["lineitem"],
        ranges={"l_discount": (0, 0.08)},
        predicates={"price_positive": F.col("l_extendedprice") > 0},
        foreign_keys=[
            ForeignKey(
                "lineitem_orders",
                ("l_orderkey",),
                t["orders"],
                ("o_orderkey",),
            )
        ],
    ).select(F.lit("lineitem").alias("tbl"), "rule", "violations")
    return orders_audit.unionByName(lineitem_audit)


@query(
    "fact_daily_agg_incremental",
    oracle=f"""
    SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS total_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_price
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("governance", "incremental", "materialized-view", "merge"),
)
def fact_daily_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh of the reference's daily rollup
    (transform_to_bq.py:160–165): history aggregated once (the stored
    MV), the new period aggregated alone, then
    relational.merge_aggregate folds the batch in — one keyed re-sum
    over group-grain rows, never a history rescan. Additive decimal
    measures make merge ≡ rebuild EXACT, which is what the oracle (a
    straight full aggregation) checks."""
    li = load_table(spark, sf_dir, "lineitem")

    def daily(frame: DataFrame) -> DataFrame:
        return frame.groupBy(
            "l_partkey", F.to_date("l_shipdate").alias("day")
        ).agg(
            F.sum(dec("l_quantity", 12, 2)).alias("total_qty"),
            F.sum(dec("l_extendedprice", 12, 2)).alias("total_price"),
        )

    snapshot = daily(li.filter(F.col("l_shipdate") < _CUTOFF))
    delta = daily(li.filter(F.col("l_shipdate") >= _CUTOFF))
    merged = merge_aggregate(
        snapshot, delta, ["l_partkey", "day"], ["total_qty", "total_price"]
    )
    return merged.select(
        "l_partkey",
        "day",
        F.col("total_qty").cast("double").alias("total_qty"),
        F.col("total_price").cast("double").alias("total_price"),
    )


@query(
    "orders_salted_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders GROUP BY 1
    """,
    tags=("governance", "skew", "distinct", "two-phase"),
)
def orders_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof exact distinct customers per priority
    (relational.salted_count_distinct): the value space is hash-salted
    into 32 disjoint buckets so no single reducer ever holds one key's
    whole distinct set — the two-phase shape that survives a key with
    10⁹ distincts where built-in count_distinct funnels them."""
    orders = load_table(spark, sf_dir, "orders")
    return salted_count_distinct(
        orders, ["o_orderpriority"], "o_custkey", buckets=32
    )


@query(
    "orders_snapshot_cdc",
    oracle="""
    WITH oldsnap AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    ),
    newsnap AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN 'X-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS in_old,
             n.o_orderkey IS NOT NULL AS in_new,
             (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
               AS d_status,
             (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
               AS d_prio
      FROM oldsnap o FULL OUTER JOIN newsnap n USING (o_orderkey)
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'insert'
                WHEN NOT in_new THEN 'delete'
                WHEN d_status OR d_prio THEN 'update'
                ELSE 'unchanged' END AS change_type,
           CASE WHEN in_old AND in_new AND (d_status OR d_prio)
                THEN list_sort(
                       [x FOR x IN [CASE WHEN d_status
                                         THEN 'o_orderstatus' END,
                                    CASE WHEN d_prio
                                         THEN 'o_orderpriority' END]
                        IF x IS NOT NULL])
                ELSE CAST([] AS VARCHAR[]) END AS changed_cols
    FROM j
    WHERE NOT (in_old AND in_new AND NOT d_status AND NOT d_prio)
    """,
    tags=("governance", "cdc", "snapshot-diff", "full-outer"),
)
def orders_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extraction by snapshot diff (relational.snapshot_cdc): the
    reference's nightly full JDBC pull has no change log, so two
    consecutive pulls diff into the insert/update/delete stream that
    scd2_merge / upsert_snapshot consume. The new snapshot is
    synthesized deterministically (priority rewrite on key%7, deletes
    on key%13, inserts on key%17) so both engines derive the same
    stream; one full-outer key join, null-safe column compare in
    codegen, per-row changed-column list."""
    from ..operators.relational import snapshot_cdc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    new = (
        orders.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.lit("X-URGENT")
            ).otherwise(F.col("o_orderpriority")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 17 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10000000)
            )
        )
    )
    return snapshot_cdc(orders, new, ["o_orderkey"])


@query(
    "lineitem_point_in_time_priority",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ),
    chg AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM seq WHERE prev IS NULL OR prev <> o_orderpriority
    ),
    hist AS (
      SELECT o_custkey, o_orderpriority,
             o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS valid_to
      FROM chg
    )
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, l.l_shipdate,
           h.o_orderpriority AS priority_at_ship
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    LEFT JOIN hist h ON h.o_custkey = o.o_custkey
      AND l.l_shipdate >= h.valid_from
      AND (h.valid_to IS NULL OR l.l_shipdate < h.valid_to)
    """,
    tags=("governance", "scd2", "point-in-time", "temporal-join"),
)
def lineitem_point_in_time_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time join (relational.point_in_time_join) against an
    SCD2 history: every line item picks up the customer's order-
    priority state AS OF its ship date — dimension-as-it-was
    semantics, the reason type-2 history exists (and the temporal-
    leakage guard a training snapshot needs). History intervals are
    non-overlapping, so each fact matches at most one version; the
    version-grain history side is AQE-broadcastable."""
    from ..operators.relational import point_in_time_join, scd2_from_changes

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    history = scd2_from_changes(
        t["orders"],
        key="o_custkey",
        order_by=["o_orderdate", "o_orderkey"],
        attrs=["o_orderpriority"],
    ).drop("is_current")
    facts = (
        t["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_linenumber", "o_custkey", "l_shipdate")
    )
    return point_in_time_join(
        facts, history, key="o_custkey", ts_col="l_shipdate"
    ).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        "l_shipdate",
        F.col("o_orderpriority").alias("priority_at_ship"),
    )


@query(
    "orders_price_histogram",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN CAST(o_totalprice AS DOUBLE) < 0.0 THEN -1
                  WHEN CAST(o_totalprice AS DOUBLE) >= 500000.0 THEN 20
                  ELSE LEAST(CAST(FLOOR(
                         (CAST(o_totalprice AS DOUBLE) - 0.0) / 25000.0
                       ) AS INTEGER), 19) END AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           0.0 + bucket * 25000.0 AS bucket_lo,
           0.0 + (bucket + 1) * 25000.0 AS bucket_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
    tags=("governance", "profiling", "histogram", "distribution"),
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (profile.histogram): 20
    exact-count buckets over [0, 500000) plus underflow/overflow rows.
    One map-side bucket expression + a bounded groupBy; the bucketing
    arithmetic is a single IEEE expression over identical operands, so
    counts AND bucket bounds oracle-check bitwise."""
    from ..operators.profile import histogram

    orders = load_table(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", 0.0, 500000.0, 20)


@query(
    "customer_fuzzy_pairs",
    oracle="""
    WITH blocked AS (
      SELECT c_custkey AS fid, c_name AS fname,
             substr(c_name, 1, length(c_name) - 2) || ':'
               || CAST(length(c_name) AS VARCHAR) AS blk
      FROM customer
    )
    SELECT a.fid AS id1, b.fid AS id2,
           a.fname AS name1, b.fname AS name2,
           CAST(levenshtein(a.fname, b.fname) AS INTEGER) AS distance
    FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.fid < b.fid
    WHERE levenshtein(a.fname, b.fname) <= 1
    """,
    tags=("governance", "fuzzy", "record-linkage", "levenshtein"),
)
def customer_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record linkage (relational.fuzzy_match_pairs): customer
    names within edit distance 1, candidates limited to same-length
    same-prefix blocks — one self-equi-join on the block key, never
    all-pairs; the exact-integer Levenshtein DP is engine-identical."""
    from ..operators.relational import fuzzy_match_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_match_pairs(
        cust, "c_custkey", "c_name", block_suffix_chars=2, max_distance=1
    )


@query(
    "lineitem_feature_correlations",
    oracle="""
    WITH d AS (
      SELECT CAST(l_quantity AS DECIMAL(14,2)) AS q,
             CAST(l_extendedprice AS DECIMAL(14,2)) AS e,
             CAST(l_discount AS DECIMAL(14,2)) AS dc,
             CAST(l_tax AS DECIMAL(14,2)) AS tx
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL AND l_tax IS NOT NULL
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS s_q,
             CAST(CAST(SUM(e) AS VARCHAR) AS DOUBLE) AS s_e,
             CAST(CAST(SUM(dc) AS VARCHAR) AS DOUBLE) AS s_d,
             CAST(CAST(SUM(tx) AS VARCHAR) AS DOUBLE) AS s_t,
             CAST(CAST(SUM(q * q) AS VARCHAR) AS DOUBLE) AS p_qq,
             CAST(CAST(SUM(e * e) AS VARCHAR) AS DOUBLE) AS p_ee,
             CAST(CAST(SUM(dc * dc) AS VARCHAR) AS DOUBLE) AS p_dd,
             CAST(CAST(SUM(tx * tx) AS VARCHAR) AS DOUBLE) AS p_tt,
             CAST(CAST(SUM(q * e) AS VARCHAR) AS DOUBLE) AS p_qe,
             CAST(CAST(SUM(q * dc) AS VARCHAR) AS DOUBLE) AS p_qd,
             CAST(CAST(SUM(q * tx) AS VARCHAR) AS DOUBLE) AS p_qt,
             CAST(CAST(SUM(e * dc) AS VARCHAR) AS DOUBLE) AS p_ed,
             CAST(CAST(SUM(e * tx) AS VARCHAR) AS DOUBLE) AS p_et,
             CAST(CAST(SUM(dc * tx) AS VARCHAR) AS DOUBLE) AS p_dt
      FROM d
    ),
    p AS (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             n, p_qe AS sxy, s_q AS sx, s_e AS sy, p_qq AS sxx, p_ee AS syy
      FROM s
      UNION ALL SELECT 'l_quantity', 'l_discount',
             n, p_qd, s_q, s_d, p_qq, p_dd FROM s
      UNION ALL SELECT 'l_quantity', 'l_tax',
             n, p_qt, s_q, s_t, p_qq, p_tt FROM s
      UNION ALL SELECT 'l_extendedprice', 'l_discount',
             n, p_ed, s_e, s_d, p_ee, p_dd FROM s
      UNION ALL SELECT 'l_extendedprice', 'l_tax',
             n, p_et, s_e, s_t, p_ee, p_tt FROM s
      UNION ALL SELECT 'l_discount', 'l_tax',
             n, p_dt, s_d, s_t, p_dd, p_tt FROM s
    )
    SELECT col_a, col_b, n AS n_rows,
           (sxy - sx * sy / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0) AS covar_samp,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)) AS pearson_r
    FROM p
    """,
    tags=("profiling", "correlation", "covariance", "one-pass"),
)
def lineitem_feature_correlations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over lineitem's
    four numeric measures in ONE scan-pass aggregate
    (operators/profile.py:feature_correlations). Moments accumulate as
    exact decimals (partition-order-independent) and each double is a
    closed-form IEEE expression of the moment sums, so the matrix is
    bit-identical to the oracle. The shuffle carries one 15-cell
    partial row per partition regardless of row count."""
    from ..operators.profile import feature_correlations
    from ..sources.corpus import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return feature_correlations(
        li,
        {
            "l_quantity": "decimal(14,2)",
            "l_extendedprice": "decimal(14,2)",
            "l_discount": "decimal(14,2)",
            "l_tax": "decimal(14,2)",
        },
    )


@query(
    "part_brand_price_regression",
    oracle="""
    WITH d AS (
      SELECT p.p_brand AS p_brand,
             CAST(l.l_quantity AS DECIMAL(14,2)) AS x,
             CAST(l.l_extendedprice AS DECIMAL(14,2)) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity IS NOT NULL AND l.l_extendedprice IS NOT NULL
    ),
    s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM d GROUP BY p_brand
    ),
    w AS (
      SELECT p_brand, n AS n_rows, sx, sy, sxx, sxy, syy,
             (CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
      FROM s
    )
    SELECT p_brand, n_rows,
           slope AS regr_slope,
           (sy - slope * sx) / CAST(n_rows AS DOUBLE) AS regr_intercept,
           ((CAST(n_rows AS DOUBLE) * sxy - sx * sy)
            * (CAST(n_rows AS DOUBLE) * sxy - sx * sy))
             / ((CAST(n_rows AS DOUBLE) * sxx - sx * sx)
                * (CAST(n_rows AS DOUBLE) * syy - sy * sy)) AS regr_r2
    FROM w
    """,
    tags=("regression", "regr-family", "one-pass", "broadcast-join"),
)
def part_brand_price_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANSI ``REGR_*`` family: per-brand least-squares regression of
    line price on quantity (slope, intercept, r²) via
    operators/profile.py:grouped_ols. Moments accumulate as exact
    decimals in one hash aggregate; each double is a closed-form IEEE
    expression over the sums, so all 25 brand rows are bit-identical to
    the oracle. part scales with SF, so no broadcast is forced — AQE
    broadcasts it while it fits and shuffles it when it doesn't; the
    reducing exchange is the 25-key group-by carrying 6-cell partials."""
    from ..operators.profile import grouped_ols

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        part.select("p_partkey", "p_brand"),
        li.l_partkey == part.p_partkey,
        "inner",
    )
    return grouped_ols(
        joined,
        ["p_brand"],
        x_col="l_quantity",
        y_col="l_extendedprice",
    )


@query(
    "customer_k_anonymity",
    oracle="""
    SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) >= 5 AS is_k_anonymous
    FROM customer
    GROUP BY 1, 2, 3
    """,
    tags=("governance", "privacy", "k-anonymity", "audit"),
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/quality.py:k_anonymity_audit) over
    generalized customer quasi-identifiers — nation, market segment,
    account-balance band — one row per equivalence class with its size
    and k>=5 verdict: the privacy gate before releasing user-derived
    training tables. One keyed aggregate with map-side partials; the
    band uses floor of an IEEE division so the generalization is
    engine-identical."""
    from ..operators.quality import k_anonymity_audit
    from ..sources.corpus import load_table

    cust = load_table(spark, sf_dir, "customer")
    return k_anonymity_audit(
        cust,
        {
            "nation_key": F.col("c_nationkey"),
            "segment": F.col("c_mktsegment"),
            "balance_band": F.floor(
                F.col("c_acctbal") / F.lit(1000.0)
            ).cast("long"),
        },
        k=5,
    )


@query(
    "customer_l_diversity",
    oracle="""
    SELECT c_nationkey AS nation_key,
           CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT c_mktsegment) >= 3 AS is_l_diverse
    FROM customer
    GROUP BY 1, 2
    """,
    tags=("governance", "privacy", "l-diversity", "audit"),
)
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (operators/quality.py:
    l_diversity_audit): k-anonymity's companion gate — each
    (nation, balance-band) equivalence class must contain >= 3 distinct
    market segments, else a homogeneous class leaks its members'
    segment even when it is k-anonymous. One keyed aggregate; the exact
    distinct plans as a two-phase aggregate so the shuffle carries
    (class, segment)-level rows at worst. Same engine-identical floor
    generalization as the k-anonymity sibling."""
    from ..operators.quality import l_diversity_audit
    from ..sources.corpus import load_table

    cust = load_table(spark, sf_dir, "customer")
    return l_diversity_audit(
        cust,
        {
            "nation_key": F.col("c_nationkey"),
            "balance_band": F.floor(
                F.col("c_acctbal") / F.lit(1000.0)
            ).cast("long"),
        },
        sensitive_col="c_mktsegment",
        l=3,
    )


@query(
    "customer_t_closeness",
    oracle="""
    WITH cv AS (
      SELECT c_nationkey AS nation_key,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band,
             c_mktsegment AS sens, CAST(COUNT(*) AS BIGINT) AS n_cv
      FROM customer WHERE c_mktsegment IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    win AS (
      SELECT *, CAST(SUM(n_cv) OVER (
        PARTITION BY nation_key, balance_band) AS BIGINT) AS n_c
      FROM cv
    ),
    vg AS (SELECT sens, CAST(SUM(n_cv) AS BIGINT) AS n_v
           FROM cv GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n_tot FROM vg),
    cls AS (
      SELECT w.nation_key, w.balance_band,
             CAST(MAX(w.n_c) AS BIGINT) AS class_size,
             SUM(abs(CAST(w.n_cv AS HUGEINT) * t.n_tot
                     - CAST(v.n_v AS HUGEINT) * w.n_c))
             + (CAST(MAX(t.n_tot) AS HUGEINT) - SUM(v.n_v))
               * CAST(MAX(w.n_c) AS HUGEINT) AS num,
             CAST(MAX(t.n_tot) AS BIGINT) AS n_tot
      FROM win w JOIN vg v USING (sens) CROSS JOIN tot t
      GROUP BY 1, 2
    )
    SELECT nation_key, balance_band, class_size,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(2 AS HUGEINT) * class_size * n_tot
                          AS VARCHAR) AS DOUBLE) AS t_distance,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(2 AS HUGEINT) * class_size * n_tot
                          AS VARCHAR) AS DOUBLE)
             <= CAST('0.25' AS DOUBLE) AS is_t_close
    FROM cls
    """,
    tags=("governance", "privacy", "t-closeness", "audit"),
)
def customer_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/quality.py:t_closeness_audit) —
    the third release gate after k-anonymity and l-diversity: each
    (nation, balance-band) class's market-segment distribution must sit
    within total-variation distance 0.25 of the global distribution
    (EMD == TVD for categorical sensitives under equal ground
    distance), closing the skewness leak l-diversity misses. The TVD
    numerator (including the telescoped absent-value tail) accumulates
    exactly in DECIMAL(38,0)/HUGEINT; one string-parse double division
    renders it — bit-identical across engines."""
    from ..operators.quality import t_closeness_audit
    from ..sources.corpus import load_table

    cust = load_table(spark, sf_dir, "customer")
    return t_closeness_audit(
        cust,
        {
            "nation_key": F.col("c_nationkey"),
            "balance_band": F.floor(
                F.col("c_acctbal") / F.lit(1000.0)
            ).cast("long"),
        },
        sensitive_col="c_mktsegment",
        t=0.25,
    )


@query(
    "customer_entity_resolution",
    oracle="""
    WITH RECURSIVE blocked AS (
      SELECT c_custkey AS fid, c_name AS fname,
             substr(c_name, 1, length(c_name) - 2) || ':'
               || CAST(length(c_name) AS VARCHAR) AS blk
      FROM customer
    ),
    pairs AS (
      SELECT a.fid AS id1, b.fid AS id2
      FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.fid < b.fid
      WHERE levenshtein(a.fname, b.fname) <= 1
    ),
    e AS (SELECT id1 AS src, id2 AS dst FROM pairs
          UNION SELECT id2, id1 FROM pairs),
    cc AS (
      SELECT src AS node, src AS lbl FROM e
      UNION
      SELECT e.dst, cc.lbl FROM cc JOIN e ON cc.node = e.src
    ),
    comp AS (SELECT node, MIN(lbl) AS cluster_id FROM cc GROUP BY node),
    asg AS (
      SELECT c.c_custkey,
             COALESCE(comp.cluster_id, c.c_custkey) AS entity_id,
             c.c_name,
             CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer c LEFT JOIN comp ON comp.node = c.c_custkey
    )
    SELECT entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           arg_min(c_name, c_custkey) AS canonical_name,
           CAST(SUM(bal) AS DOUBLE) AS total_acctbal
    FROM asg GROUP BY 1
    """,
    tags=("governance", "entity-resolution", "golden-record", "composed"),
)
def customer_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end — the MDM golden-record build:
    blocked fuzzy matching (edit distance <= 1) finds duplicate
    identities, connected components (dedup_clusters min-label
    propagation with pointer jumping) groups transitive chains, and
    one aggregate per entity emits the survivor record (canonical name
    = min-key member via min_by, exact-decimal balance rollup).
    Singleton customers resolve to themselves through the left join.
    The oracle replays the chain with a recursive CTE."""
    from ..operators.dedup import dedup_clusters
    from ..operators.relational import dec, fuzzy_match_pairs

    cust = load_table(spark, sf_dir, "customer")
    pairs = fuzzy_match_pairs(
        cust, "c_custkey", "c_name", block_suffix_chars=2, max_distance=1
    )
    clusters = dedup_clusters(pairs.select("id1", "id2"))
    id_col = clusters.columns[0]  # node id column of the CC output
    asg = cust.join(
        clusters.select(
            F.col(id_col).alias("c_custkey"), "cluster_id"
        ),
        "c_custkey",
        "left",
    ).select(
        F.coalesce("cluster_id", "c_custkey").alias("entity_id"),
        "c_custkey",
        "c_name",
        dec("c_acctbal", 12, 2).alias("bal"),
    )
    return asg.groupBy("entity_id").agg(
        F.count("*").cast("long").alias("n_members"),
        F.min_by("c_name", "c_custkey").alias("canonical_name"),
        F.sum("bal").cast("double").alias("total_acctbal"),
    )


@query(
    "orders_benford_audit",
    oracle="""
    WITH cnt AS (
      -- first SIGNIFICANT digit: first [1-9] char of the value's own
      -- rendering (mirrors the operator; handles 0.xx and huge values)
      SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]')
                  AS INTEGER) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM cnt),
    exp AS (
      SELECT * FROM (VALUES
        (1, CAST('0.3010299956639812' AS DOUBLE)), (2, CAST('0.17609125905568124' AS DOUBLE)),
        (3, CAST('0.12493873660829993' AS DOUBLE)), (4, CAST('0.09691001300805642' AS DOUBLE)),
        (5, CAST('0.07918124604762482' AS DOUBLE)), (6, CAST('0.06694678963061322' AS DOUBLE)),
        (7, CAST('0.05799194697768673' AS DOUBLE)), (8, CAST('0.05115252244738129' AS DOUBLE)),
        (9, CAST('0.04575749056067514' AS DOUBLE))) AS t(digit, benford_p)
    )
    SELECT e.digit,
           CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
           COALESCE(CAST(c.n_obs AS DOUBLE) / CAST(t.n_total AS DOUBLE),
                    0.0) AS frac_obs,
           e.benford_p,
           abs(COALESCE(CAST(c.n_obs AS DOUBLE) / CAST(t.n_total AS DOUBLE),
                        0.0) - e.benford_p) <= 0.02 AS within_tol
    FROM exp e LEFT JOIN cnt c ON c.digit = e.digit, tot t
    """,
    tags=("governance", "benford", "fraud", "distribution-audit"),
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of o_totalprice
    (operators/quality.py:benford_audit): exact digit counts from one
    conditional-count aggregate; expected probabilities are pinned
    log10(1+1/d) literals shared verbatim with the oracle, so no engine
    evaluates a transcendental at runtime and every row is bit-exact.
    TPC-H totalprice is a sum of uniform draws, so some digits land
    outside Benford tolerance — the audit must REPORT that (a boolean
    column that is always true proves nothing). One scan, one 9-key
    agg, a 1-row total broadcast cross."""
    from ..operators.quality import benford_audit

    orders = load_table(spark, sf_dir, "orders")
    return benford_audit(orders, "o_totalprice", tol=0.02)


@query(
    "orders_join_cardinality_audit",
    oracle="""
    WITH lh AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS ln
      FROM orders GROUP BY 1
    ),
    rh AS (
      SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS rn
      FROM customer GROUP BY 1
    ),
    hist AS (
      SELECT COALESCE(ln, 0) AS ln, COALESCE(rn, 0) AS rn
      FROM lh FULL OUTER JOIN rh USING (k)
    )
    SELECT CAST(SUM(ln) AS BIGINT) AS n_left,
           CAST(SUM(rn) AS BIGINT) AS n_right,
           CAST(CAST(SUM(CAST(ln AS HUGEINT) * rn) AS VARCHAR) AS DOUBLE)
             AS n_join_predicted_exact,
           CAST(SUM(CAST(ln AS HUGEINT) * rn) AS BIGINT)
             AS n_join_predicted,
           CAST(MAX(ln * rn) AS BIGINT) AS max_key_fanout,
           CAST(SUM(CASE WHEN rn = 0 THEN ln ELSE 0 END) AS BIGINT)
             AS rows_left_unmatched,
           CAST(SUM(CASE WHEN ln = 0 THEN rn ELSE 0 END) AS BIGINT)
             AS rows_right_unmatched,
           CAST(COUNT_IF(ln > 0 AND rn > 0) AS BIGINT) AS n_keys_matched
    FROM hist
    """,
    tags=("governance", "join", "cardinality", "skew", "pre-flight"),
)
def orders_join_cardinality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pre-flight join-size/skew prediction
    (operators/quality.py:join_cardinality_audit) for orders⋈customer
    on custkey: exact output cardinality (Σ l_k·r_k over the key
    histograms), worst single-key fanout, unmatched row counts on both
    sides, matched key count — all WITHOUT executing the join. The
    shuffles carry distinct-key rows only; the predictor accumulates in
    DECIMAL(38,0)/HUGEINT and also reports a BIGINT when it fits."""
    from ..operators.quality import join_cardinality_audit

    return join_cardinality_audit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        ["o_custkey"],
        ["c_custkey"],
    )


@query(
    "supplier_return_rate_wilson",
    oracle="""
    WITH agg AS (
      SELECT l_suppkey AS supp_key,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT_IF(l_returnflag = 'R') AS BIGINT) AS k
      FROM lineitem GROUP BY 1
    ),
    v AS (
      SELECT supp_key, n, k,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(n AS DOUBLE) AS nd,
             (CAST('1.96' AS DOUBLE) * CAST('1.96' AS DOUBLE)) AS zz
      FROM agg
    )
    SELECT supp_key, n, k, p AS event_rate,
           ((p + (zz / (CAST('2.0' AS DOUBLE) * nd)))
            - (CAST('1.96' AS DOUBLE)
               * sqrt(((p * (CAST('1.0' AS DOUBLE) - p)) / nd)
                      + (zz / (CAST('4.0' AS DOUBLE) * (nd * nd))))))
             / (CAST('1.0' AS DOUBLE) + (zz / nd)) AS wilson_lb
    FROM v
    """,
    tags=("governance", "wilson", "confidence-bound", "reliability"),
)
def supplier_return_rate_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier reliability scorecard ranked by the Wilson score lower
    bound of the return rate (operators/profile.py:wilson_lower_bound)
    — the small-sample-safe way to flag bad suppliers (a 1-of-1 return
    never outranks 40-of-100). Determinism: +, −, ×, ÷, sqrt are ALL
    IEEE correctly rounded in both engines, so the identical expression
    tree (same parenthesization, string-parsed literals) is bit-exact —
    the float-portability idiom complementing the integer/decimal rule
    everywhere else."""
    from ..operators.profile import wilson_lower_bound

    li = load_table(spark, sf_dir, "lineitem")
    return wilson_lower_bound(
        li.select(F.col("l_suppkey").alias("supp_key"), "l_returnflag"),
        ["supp_key"],
        F.col("l_returnflag") == "R",
        z=1.96,
    )


@query(
    "customer_reident_risk",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey AS nation_key,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balance_band,
             CAST(COUNT(*) AS BIGINT) AS class_size
      FROM customer GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(class_size) AS BIGINT) AS n_records,
             CAST(COUNT(*) AS BIGINT) AS n_classes
      FROM classes
    )
    SELECT k, t.n_classes, t.n_records,
           CAST(SUM(CASE WHEN c.class_size < k THEN 1 ELSE 0 END)
                AS BIGINT) AS classes_below_k,
           CAST(SUM(CASE WHEN c.class_size < k
                    THEN c.class_size ELSE 0 END) AS BIGINT)
             AS records_at_risk,
           CAST(SUM(CASE WHEN c.class_size < k
                    THEN c.class_size ELSE 0 END) AS DOUBLE)
             / CAST(t.n_records AS DOUBLE) AS risk_fraction
    FROM classes c
    CROSS JOIN tot t
    CROSS JOIN (VALUES (CAST(2 AS INTEGER)), (5), (10), (20)) AS ks(k)
    GROUP BY k, t.n_classes, t.n_records
    """,
    tags=("governance", "privacy", "reidentification", "audit"),
)
def customer_reident_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prosecutor re-identification risk curve: for each candidate
    anonymity threshold k in {2, 5, 10, 20}, how many (nation,
    balance-band) equivalence classes fall below k and what fraction
    of RECORDS sits in them — the one-table summary a release review
    reads before picking its k (the k-anonymity audit reports classes;
    this prices thresholds). One keyed aggregate to class grain, then
    a 4-row threshold explode over the CLASS-grain frame (never raw
    rows) and a 1-row total rider; the risk fraction is one IEEE
    division of exact longs."""
    from ..sources.corpus import load_table

    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        F.col("c_nationkey").alias("nation_key"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0))
        .cast("long")
        .alias("balance_band"),
    ).agg(F.count("*").cast("long").alias("class_size"))
    tot = classes.agg(
        F.sum("class_size").cast("long").alias("n_records"),
        F.count("*").cast("long").alias("n_classes"),
    )
    ks = F.explode(
        F.array(*[F.lit(k).cast("int") for k in (2, 5, 10, 20)])
    ).alias("k")
    below = F.col("class_size") < F.col("k")
    return (
        classes.select("class_size", ks)
        .crossJoin(F.broadcast(tot))  # 1-row rider
        .groupBy("k", "n_classes", "n_records")
        .agg(
            F.sum(below.cast("int")).cast("long").alias("classes_below_k"),
            F.sum(F.when(below, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("records_at_risk"),
        )
        .select(
            "k",
            "n_classes",
            "n_records",
            "classes_below_k",
            "records_at_risk",
            (
                F.col("records_at_risk").cast("double")
                / F.col("n_records").cast("double")
            ).alias("risk_fraction"),
        )
    )


@query(
    "nation_supplier_hhi",
    oracle="""
    WITH per_supp AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1),
    members AS (
      SELECT n.n_name AS nation, s.s_suppkey,
             CAST(SUM(qty) AS DECIMAL(38,0)) AS w
      FROM per_supp p
      JOIN supplier s ON s.s_suppkey = p.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    g AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(w) AS DECIMAL(38,0)) AS total,
             CAST(SUM(w * w) AS DECIMAL(38,0)) AS sum_sq,
             CAST(MAX(w) AS DECIMAL(38,0)) AS max_w
      FROM members GROUP BY 1)
    SELECT nation, n_members,
           CAST(total AS BIGINT) AS total_weight,
           CAST(CAST(sum_sq AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(total * total AS DECIMAL(38,0)) AS VARCHAR)
                    AS DOUBLE) AS hhi,
           CAST(CAST(max_w AS VARCHAR) AS DOUBLE)
             / CAST(CAST(total AS VARCHAR) AS DOUBLE) AS top_share,
           CAST(CAST(CAST(total * total AS DECIMAL(38,0)) AS VARCHAR)
                AS DOUBLE)
             / CAST(CAST(sum_sq AS VARCHAR) AS DOUBLE) AS effective_n
    FROM g
    """,
    tags=("governance", "concentration", "hhi", "skew", "audit"),
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration audit: per-nation Herfindahl–Hirschman
    index over suppliers' shipped-quantity shares, plus top-supplier
    share and effective supplier count (1/HHI) — the single-source-risk
    scalar a procurement or skew audit reads first. HHI is computed as
    Σw² / W² so both sums stay exact integers (DECIMAL(38,0) — BIGINT
    squares overflow past ~3·10⁹ total units, real at 100 TB) and each
    float output is ONE division of string-rendered exact values (the
    portable decimal→double idiom). The fact reduces to supplier grain
    map-side BEFORE joining the supplier/nation dims."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty")
    )
    enriched = (
        per_supp.join(su, per_supp["l_suppkey"] == su["s_suppkey"])
        .join(na, su["s_nationkey"] == na["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "s_suppkey", "qty")
    )
    from ..operators.profile import concentration_hhi

    return concentration_hhi(
        enriched, "nation", "s_suppkey", "qty"
    ).withColumnRenamed("grp", "nation")


@query(
    "part_weighted_median_price",
    oracle="""
    WITH joined AS (
      SELECT p.p_brand AS grp, l.l_extendedprice AS val,
             CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    cells AS (
      SELECT grp, val, CAST(SUM(w) AS BIGINT) AS w
      FROM joined GROUP BY 1, 2),
    scored AS (
      SELECT grp, val, w,
        CAST(SUM(w) OVER (PARTITION BY grp ORDER BY val
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum,
        CAST(SUM(w) OVER (PARTITION BY grp) AS BIGINT) AS total,
        CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n_cells
      FROM cells)
    SELECT grp AS p_brand, MIN(val) AS median_price,
           MAX(total) AS total_qty, MAX(n_cells) AS n_price_points
    FROM scored WHERE cum * 2 >= total GROUP BY grp
    """,
    tags=("governance", "quantile", "weighted-median", "exact"),
)
def part_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median line price per brand — the
    weighted percentile approx_percentile only estimates, computed
    with pure integer weight cumsums (2·cum ≥ total) so the median is
    a pass-through member of the price column and bit-portable. The
    fact reduces to (brand, price) cells before the window pass."""
    from ..operators.profile import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    joined = li.join(pa, li["l_partkey"] == pa["p_partkey"]).select(
        "p_brand", "l_extendedprice", "l_quantity"
    )
    return (
        weighted_median(joined, "p_brand", "l_extendedprice", "l_quantity")
        .select(
            F.col("grp").alias("p_brand"),
            F.col("median_val").alias("median_price"),
            F.col("total_weight").alias("total_qty"),
            F.col("n_distinct_values").alias("n_price_points"),
        )
    )


@query(
    "lineitem_pareto_8020",
    oracle="""
    WITH members AS (
      SELECT l_partkey AS m,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY 1),
    scored AS (
      SELECT m, rev,
        CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, m) AS BIGINT) AS rnk,
        SUM(rev) OVER (ORDER BY rev DESC, m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(rev) OVER () AS total,
        CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM members),
    flagged AS (
      SELECT rnk, n,
        CASE WHEN cum * 5 >= total * 4 THEN rnk END AS hit_rank,
        CASE WHEN rnk <= CAST(floor((n + 4) / 5) AS BIGINT)
             THEN cum END AS cum_t20,
        total
      FROM scored)
    SELECT MAX(n) AS n_members,
           MIN(hit_rank) AS n_for_share,
           CAST(MIN(hit_rank) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
             AS frac_for_share,
           CAST(MAX(cum_t20) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
             AS top20_share
    FROM flagged
    """,
    tags=("governance", "concentration", "pareto", "revenue"),
)
def lineitem_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of part revenue: how many parts (count and
    fraction) cover 80% of total revenue, and the revenue share of the
    top 20% of parts — exact-decimal threshold tests (5·cum ≥ 4·total),
    deterministic (revenue DESC, partkey) ordering, one IEEE division
    per emitted float. Reduces the fact to part grain map-side before
    the single window pass."""
    from ..operators.profile import pareto_concentration
    from ..operators.relational import dec

    li = load_table(spark, sf_dir, "lineitem")
    return pareto_concentration(
        li, "l_partkey", dec("l_extendedprice", 12, 2)
    )


@query(
    "orders_duplicate_payments",
    oracle="""
    WITH side AS (
      SELECT o_custkey AS entity, o_orderkey AS id, o_totalprice AS amt,
             CAST(o_orderdate AS DATE) AS dt,
             CAST(floor(o_totalprice / CAST(1000 AS DOUBLE)) AS BIGINT)
               AS band
      FROM orders)
    SELECT a.entity, a.id AS id_a, b.id AS id_b,
           a.amt AS amount_a, b.amt AS amount_b,
           CAST(date_diff('day', a.dt, b.dt) AS INTEGER) AS day_gap
    FROM side a
    JOIN side b
      ON a.entity = b.entity AND a.id < b.id
     AND b.band BETWEEN a.band - 1 AND a.band + 1
    WHERE abs(date_diff('day', a.dt, b.dt)) <= 90
      AND abs(a.amt - b.amt) <= CAST(1000 AS DOUBLE)
    """,
    tags=("governance", "fraud", "duplicate-detection", "self-join"),
)
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-billing sweep over the order fact: same customer, order
    totals within $1000 of each other, within 90 days — a banded self
    equi-join (3-band probe explode, so boundary-straddling amounts
    still pair) whose matched set is bounded per (customer, band)
    group, never global; the exact |amount diff| <= $1000 predicate
    prunes inside the matched group. Band = floor of one portable
    double division (amounts are non-negative by contract)."""
    from ..operators.quality import duplicate_payment_pairs

    od = load_table(spark, sf_dir, "orders")
    return duplicate_payment_pairs(
        od, "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
        band_width=1000.0, window_days=90,
    )


@query(
    "customer_value_gini",
    oracle="""
    WITH members AS (
      SELECT o_custkey AS m,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS x
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT x,
             CAST(ROW_NUMBER() OVER (ORDER BY x ASC, m ASC)
                  AS DECIMAL(38,0)) AS i
      FROM members),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_members,
             SUM(x) AS s,
             SUM(i * x) AS a
      FROM ranked)
    SELECT n_members,
           CAST(CAST(s AS VARCHAR) AS DOUBLE) AS total_amount,
           CASE WHEN s = 0 THEN NULL
                ELSE CAST(CAST(a * 2 AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(s * CAST(n_members AS DECIMAL(38,0))
                                   AS VARCHAR) AS DOUBLE)
                     - CAST(n_members + 1 AS DOUBLE)
                       / CAST(n_members AS DOUBLE)
           END AS gini
    FROM sums
    """,
    tags=("governance", "gini", "inequality", "concentration"),
)
def customer_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime order value via the exact
    sorted-cumsum identity (decimal moment sums, string-rendered
    double casts, one fixed IEEE tree) — the inequality scalar
    complementing the Pareto 80/20 and HHI concentration entries. The
    order fact reduces to customer grain before the rank window."""
    from ..operators.profile import gini_coefficient
    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    return gini_coefficient(od, "o_custkey", dec("o_totalprice", 12, 2))


@query(
    "orders_priority_mix_shift",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS category,
             CASE WHEN o_orderdate < DATE '1998-01-01'
                  THEN 'early' ELSE 'late' END AS period,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM orders GROUP BY 1, 2),
    scored AS (
      SELECT category, period, observed,
             CAST(SUM(observed) OVER (PARTITION BY category) AS BIGINT)
               AS row_t,
             CAST(SUM(observed) OVER (PARTITION BY period) AS BIGINT)
               AS col_t,
             CAST(SUM(observed) OVER () AS BIGINT) AS grand
      FROM cells)
    SELECT category, period, observed,
           CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE)
             AS expected,
           ((CAST(observed AS DOUBLE)
             - CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE))
            * (CAST(observed AS DOUBLE)
               - CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE)))
           / (CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE))
             AS contribution
    FROM scored
    """,
    tags=("governance", "drift", "chi-square", "mix-shift"),
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contribution table of order-priority mix between the
    early (< 1998) and late halves of the order history — the
    categorical sibling of the numeric KS drift probe. Expected counts
    are one division of exact longs; contributions are fixed IEEE
    trees; no float total is emitted (summing per-cell doubles is
    order-dependent — callers sum driver-side)."""
    from ..operators.profile import category_mix_shift

    od = load_table(spark, sf_dir, "orders")
    period = F.when(
        F.col("o_orderdate") < "1998-01-01", F.lit("early")
    ).otherwise(F.lit("late"))
    return category_mix_shift(od, "o_orderpriority", period)


@query(
    "customer_value_lorenz",
    oracle="""
    WITH members AS (
      SELECT o_custkey AS m,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS x
      FROM orders GROUP BY 1),
    tiled AS (
      SELECT x, CAST(NTILE(10) OVER (ORDER BY x ASC, m ASC) AS INTEGER)
               AS decile
      FROM members),
    cells AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_members,
             SUM(x) AS dx
      FROM tiled GROUP BY 1)
    SELECT decile, n_members,
           CAST(CAST(dx AS VARCHAR) AS DOUBLE) AS decile_value,
           CAST(CAST(SUM(dx) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE) AS cum_value,
           CAST(CAST(SUM(dx) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(dx) OVER () AS VARCHAR) AS DOUBLE)
             AS cum_share,
           CAST(SUM(n_members) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE)
             / CAST(SUM(n_members) OVER () AS DOUBLE) AS pop_share
    FROM cells
    """,
    tags=("governance", "lorenz", "inequality", "deciles"),
)
def customer_value_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz decile table of customer lifetime value — the curve
    behind the Gini scalar and Pareto point: 10 rows of (population
    share, cumulative value share) with exact decimal sums and one
    division per emitted float. NTILE boundaries are deterministic
    under the (value, custkey) total order."""
    from ..operators.profile import lorenz_deciles
    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    return lorenz_deciles(od, "o_custkey", dec("o_totalprice", 12, 2))


@query(
    "orders_id_gap_islands",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k FROM orders
      WHERE o_orderkey IS NOT NULL AND o_orderstatus <> 'F'),
    ends AS (
      SELECT a.k FROM keys a
      LEFT JOIN keys b ON b.k = a.k + 1 WHERE b.k IS NULL),
    starts AS (
      SELECT a.k FROM keys a
      LEFT JOIN keys b ON b.k = a.k - 1 WHERE b.k IS NULL),
    e AS (
      SELECT k AS end_k,
             ROW_NUMBER() OVER (ORDER BY k) AS rn FROM ends),
    s AS (
      SELECT k AS start_k,
             ROW_NUMBER() OVER (ORDER BY k) - 1 AS rn FROM starts)
    SELECT e.end_k + 1 AS gap_start,
           s.start_k - 1 AS gap_end,
           s.start_k - e.end_k - 1 AS gap_len
    FROM e JOIN s USING (rn)
    ORDER BY gap_len DESC, gap_start
    LIMIT 10
    """,
    tags=("governance", "data-quality", "gaps-islands", "audit"),
)
def orders_id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key continuity audit
    (operators/quality.py:key_gap_islands): the 10 largest runs of
    missing keys between the observed min and max — the
    dropped-batch / skipped-sequence sweep. The fixture's orderkeys
    are DENSE (0..N-1, zero gaps), so the audit runs over the keys of
    non-finalized orders (o_orderstatus <> 'F'), whose key stream has
    real gaps wherever a finalized order interleaves — mirroring the
    production shape where one logical partition of a sequence is
    audited. Keys reduce to DISTINCT before two keyed anti-joins
    extract island boundaries; only the boundary frame (two rows per
    island) crosses the pairing windows and the deterministic top-k."""
    from ..operators.quality import key_gap_islands

    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    )
    return key_gap_islands(od, "o_orderkey", top_k=10)


@query(
    "orders_status_priority_chi2",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS r, o_orderpriority AS c,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    tot AS (
      SELECT r, c, n,
             CAST(SUM(n) OVER (PARTITION BY r) AS BIGINT) AS rt,
             CAST(SUM(n) OVER (PARTITION BY c) AS BIGINT) AS ct,
             CAST(SUM(n) OVER () AS BIGINT) AS gt
      FROM cells)
    SELECT r AS o_orderstatus, c AS o_orderpriority, n,
           CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE)
             AS expected,
           (CAST(n AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                / CAST(gt AS DOUBLE))
           * (CAST(n AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                / CAST(gt AS DOUBLE))
           / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
              / CAST(gt AS DOUBLE)) AS chi2_contrib
    FROM tot
    """,
    tags=("governance", "chi-square", "contingency", "association"),
)
def orders_status_priority_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square contingency audit of order status vs priority
    (operators/profile.py:contingency_chi2): per observed cell, the
    count, the independence expectation rt·ct/N, and the cell's
    (obs−exp)²/exp contribution — are priorities assigned
    independently of status, read cell by cell. Contributions stay
    per-cell (a cross-cell float sum is order-dependent cross-engine);
    totals come from window sums over the reduced cell-grain frame —
    one scan, one aggregate, no joins."""
    from ..operators.profile import contingency_chi2

    od = load_table(spark, sf_dir, "orders")
    return contingency_chi2(od, "o_orderstatus", "o_orderpriority")


@query(
    "orders_bloom_prefilter",
    oracle="""
    WITH members AS (
      SELECT DISTINCT c_custkey AS k FROM customer
      WHERE c_acctbal > CAST(9000 AS DOUBLE)),
    pos AS (
      SELECT (CAST('0x' || substr(md5('bl0|' || CAST(k AS VARCHAR)),
                   1, 8) AS BIGINT) % 4096) AS p FROM members
      UNION ALL
      SELECT (CAST('0x' || substr(md5('bl1|' || CAST(k AS VARCHAR)),
                   1, 8) AS BIGINT) % 4096) FROM members),
    words AS (
      SELECT p // 62 AS w,
             CAST(bit_or(CAST(1 AS BIGINT)
                         << CAST(p % 62 AS INTEGER)) AS BIGINT) AS v
      FROM pos GROUP BY 1),
    probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
    hashed AS (
      SELECT k,
             (CAST('0x' || substr(md5('bl0|' || CAST(k AS VARCHAR)),
                   1, 8) AS BIGINT) % 4096) AS p0,
             (CAST('0x' || substr(md5('bl1|' || CAST(k AS VARCHAR)),
                   1, 8) AS BIGINT) % 4096) AS p1
      FROM probe),
    checked AS (
      SELECT h.k,
             COALESCE((w0.v & (CAST(1 AS BIGINT)
                << CAST(h.p0 % 62 AS INTEGER))) <> 0, FALSE) AS hit0,
             COALESCE((w1.v & (CAST(1 AS BIGINT)
                << CAST(h.p1 % 62 AS INTEGER))) <> 0, FALSE) AS hit1,
             m.k IS NOT NULL AS member
      FROM hashed h
      LEFT JOIN words w0 ON w0.w = h.p0 // 62
      LEFT JOIN words w1 ON w1.w = h.p1 // 62
      LEFT JOIN members m ON m.k = h.k)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(COUNT_IF(member) AS BIGINT) AS n_member,
           CAST(COUNT_IF(hit0 AND hit1) AS BIGINT) AS n_pass_bloom,
           CAST(COUNT_IF(hit0 AND hit1 AND NOT member) AS BIGINT)
             AS n_false_pos,
           CASE WHEN COUNT(*) = COUNT_IF(member) THEN NULL
                ELSE CAST(COUNT_IF(hit0 AND hit1 AND NOT member)
                          AS DOUBLE)
                     / CAST(COUNT(*) - COUNT_IF(member) AS DOUBLE)
           END AS fp_rate
    FROM checked
    """,
    tags=("sketch", "bloom", "runtime-filter", "semi-join", "audit"),
)
def orders_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter audit
    (operators/sketches.py:bloom_prefilter_audit): a 4096-bit / 2-hash
    filter built from the high-balance customer segment
    (c_acctbal > 9000) by one associative bit_or aggregate, probed by
    the distinct order custkeys — the runtime-filter pattern that
    prunes a 100 TB fact scan down to probable members before the real
    join, with the observed (deterministic) false-positive rate as the
    readout. The word table is 67 rows at ANY scale; probes are two
    equi-joins against it; everything is exact bit/count arithmetic
    plus one division."""
    from ..operators.sketches import bloom_prefilter_audit

    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    members = cust.filter(F.col("c_acctbal") > 9000.0).select("c_custkey")
    return bloom_prefilter_audit(
        members,
        od.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        m_bits=4096,
        n_hashes=2,
    )


@query(
    "customer_spend_spearman",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS k,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS y
      FROM orders GROUP BY 1),
    j AS (
      SELECT c.c_mktsegment AS g, c.c_acctbal AS x, s.y AS y
      FROM customer c JOIN spend s ON s.k = c.c_custkey
      WHERE c.c_acctbal IS NOT NULL AND s.y IS NOT NULL),
    r AS (
      SELECT g,
             RANK() OVER (PARTITION BY g ORDER BY x)
             + COUNT(*) OVER (PARTITION BY g ORDER BY x
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rx,
             RANK() OVER (PARTITION BY g ORDER BY y)
             + COUNT(*) OVER (PARTITION BY g ORDER BY y
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ry
      FROM j),
    m AS (
      SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
      FROM r GROUP BY 1)
    SELECT g AS c_mktsegment, CAST(n AS BIGINT) AS n_rows,
           CASE WHEN sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR)
                               AS DOUBLE))
                     * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR)
                                  AS DOUBLE))
                        * sqrt(CAST(CAST(n * syy - sy * sy AS VARCHAR)
                                    AS DOUBLE)))
           END AS spearman_rho
    FROM m
    """,
    tags=("profile", "correlation", "spearman", "rank"),
)
def customer_spend_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment Spearman rank correlation between a
    customer's account balance and their decimal-exact total order
    spend (operators/profile.py:spearman_correlation) — the
    outlier-robust "does balance predict spend?" readout next to the
    Pearson feature_correlations entry. Average-rank ties via the
    doubled-rank identity (RANK + running count off ONE sort per
    axis); DECIMAL(38,0) moments; one IEEE closed form per rho.
    Customer-dimension grain: spend reduces orders per customer before
    any window."""
    from ..operators.profile import spearman_correlation
    from ..operators.relational import dec

    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    spend = od.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(dec("o_totalprice", 12, 2)).alias("spend")
    )
    j = cust.join(spend, "c_custkey").select(
        "c_mktsegment", "c_acctbal", "spend"
    )
    return spearman_correlation(j, "c_acctbal", "spend", "c_mktsegment")


@query(
    "lineitem_abc_classes",
    oracle="""
    WITH members AS (
      SELECT l_partkey AS m,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY 1),
    scored AS (
      SELECT m, rev,
        SUM(rev) OVER (ORDER BY rev DESC, m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(rev) OVER () AS total
      FROM members),
    cls AS (
      SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                  WHEN cum * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev, total
      FROM scored)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS class_value,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(MAX(total) AS VARCHAR) AS DOUBLE)
             AS value_share
    FROM cls GROUP BY 1
    """,
    tags=("governance", "concentration", "abc", "revenue"),
)
def lineitem_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC revenue classification of parts
    (operators/profile.py:abc_classification): the per-class split at
    the classic 80%/95% cumulative thresholds that the Pareto scalar
    summarizes — which parts an inventory team counts cycle-daily (A)
    vs annually (C). Exact integer-decimal threshold tests over the
    deterministic (revenue DESC, partkey) order; fact reduces to part
    grain map-side before the single reduced-frame window pass;
    ≤ 3 output rows."""
    from ..operators.profile import abc_classification
    from ..operators.relational import dec

    li = load_table(spark, sf_dir, "lineitem")
    return abc_classification(li, "l_partkey", dec("l_extendedprice", 12, 2))


def _fd_oracle_block(table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT_IF(n_rhs > 1) AS BIGINT) AS n_violating,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_distinct,
           CAST(CAST(COUNT_IF(n_rhs > 1) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS violation_rate
    FROM (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rhs FROM (
        SELECT {lhs} AS k, {rhs} AS v FROM {table}
        WHERE {lhs} IS NOT NULL GROUP BY 1, 2)
      GROUP BY 1)"""


_PART_FDS = [
    ("p_brand", "p_type"),
    ("p_type", "p_brand"),
    ("p_name", "p_brand"),
]


@query(
    "part_functional_dependencies",
    oracle="\n    UNION ALL".join(
        _fd_oracle_block("part", lhs, rhs) for lhs, rhs in _PART_FDS
    ),
    tags=("governance", "profiling", "functional-dependency", "audit"),
)
def part_functional_dependencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency audit over the part dimension
    (operators/quality.py:functional_dependency_audit): does brand
    determine type, type determine brand, name determine brand — the
    schema-discovery check behind dimensional-modeling assumptions,
    reporting violating-key counts, worst fan-out, and violation
    rate per candidate dependency. Two keyed reductions per
    dependency, |deps| output rows."""
    from ..operators.quality import functional_dependency_audit

    part = load_table(spark, sf_dir, "part")
    return functional_dependency_audit(part, _PART_FDS)


@query(
    "part_brand_target_encoding",
    oracle="""
    WITH stats AS (
      SELECT p_brand AS c,
             SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_cat
      FROM part GROUP BY 1)
    SELECT p.p_partkey, p.p_brand, p.p_retailprice, st.n_cat,
           CASE WHEN CAST(st.n_cat - 1 + 0 AS DOUBLE) = 0.0 THEN NULL
                ELSE (CAST(CAST(st.s
                           - CAST(p.p_retailprice AS DECIMAL(12,2))
                           AS VARCHAR) AS DOUBLE)
                      + 0.0 * (0.0 / 1.0))
                     / CAST(st.n_cat - 1 + 0 AS DOUBLE)
           END AS target_enc
    FROM part p JOIN stats st ON st.c = p.p_brand
    """,
    tags=("profile", "ml-features", "target-encoding", "leakage"),
)
def part_brand_target_encoding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leave-one-out target encoding of brand by retail price
    (operators/profile.py:target_encode_loo): each part's brand
    feature becomes the mean price of the brand's OTHER parts —
    excluding the row's own value so the feature cannot leak its own
    label (the classic mean-encoding trap). Exact decimal category
    sums, one IEEE division per row, NULL for singleton brands. One
    keyed reduction + one join back; no window over raw rows."""
    from ..operators.profile import target_encode_loo

    part = load_table(spark, sf_dir, "part")
    return target_encode_loo(
        part, "p_brand", "p_retailprice",
        carry_cols=("p_partkey",),
    )


@query(
    "orders_winsorized_value",
    oracle="""
    WITH grain AS (
      SELECT CAST(o_totalprice AS DECIMAL(12,2)) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
    c AS (
      SELECT v, cnt,
             CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM grain),
    framed AS (
      SELECT v, cnt, n,
             MIN(CASE WHEN cum * 100 >= n * 5 THEN v END) OVER () AS lo,
             MIN(CASE WHEN cum * 100 >= n * 95 THEN v END) OVER () AS hi
      FROM c),
    agg AS (
      SELECT MAX(n) AS n_rows,
             SUM(v * cnt) AS s,
             SUM(CASE WHEN v < lo THEN lo
                      WHEN v > hi THEN hi
                      ELSE v END * cnt) AS ws,
             MAX(lo) AS lo_b, MAX(hi) AS hi_b,
             CAST(SUM(CASE WHEN v < lo THEN cnt ELSE 0 END) AS BIGINT)
               AS n_clipped_lo,
             CAST(SUM(CASE WHEN v > hi THEN cnt ELSE 0 END) AS BIGINT)
               AS n_clipped_hi
      FROM framed)
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           CAST(CAST(s AS VARCHAR) AS DOUBLE)
             / CAST(n_rows AS DOUBLE) AS mean,
           CAST(CAST(ws AS VARCHAR) AS DOUBLE)
             / CAST(n_rows AS DOUBLE) AS winsorized_mean,
           CAST(CAST(lo_b AS VARCHAR) AS DOUBLE) AS lo_bound,
           CAST(CAST(hi_b AS VARCHAR) AS DOUBLE) AS hi_bound,
           n_clipped_lo, n_clipped_hi
    FROM agg
    """,
    tags=("profile", "robust-stats", "winsorized", "exact-quantiles"),
)
def orders_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized order-value mean at the exact [p5, p95] boundaries
    (operators/profile.py:winsorized_stats): the robust location
    readout next to the raw mean, with both clip boundaries, the
    clipped-row counts, and everything derived from ONE value-grain
    frame via windows (no join, no second scan). Decimal-exact
    clipped sums; one IEEE division per reported double."""
    from ..operators.profile import winsorized_stats

    od = load_table(spark, sf_dir, "orders")
    return winsorized_stats(od, "o_totalprice", 5, 95)


@query(
    "orders_cramers_v_matrix",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS VARCHAR)
               AS odow,
             CAST(CAST(FLOOR(o_totalprice / 100000.0) AS BIGINT)
                  AS VARCHAR) AS pband
      FROM orders),
    long AS (
      SELECT u.p AS pair, u.a AS a, u.b AS b FROM base, UNNEST([
        struct_pack(p := 'status|priority', a := status, b := priority),
        struct_pack(p := 'status|odow', a := status, b := odow),
        struct_pack(p := 'status|pband', a := status, b := pband),
        struct_pack(p := 'priority|odow', a := priority, b := odow),
        struct_pack(p := 'priority|pband', a := priority, b := pband),
        struct_pack(p := 'odow|pband', a := odow, b := pband)
      ]) AS t(u)),
    cells AS (
      SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM long GROUP BY 1, 2, 3),
    ra AS (
      SELECT pair, a, CAST(SUM(n) AS BIGINT) AS rt
      FROM cells GROUP BY 1, 2),
    cb AS (
      SELECT pair, b, CAST(SUM(n) AS BIGINT) AS ct
      FROM cells GROUP BY 1, 2),
    gtot AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS gt FROM cells GROUP BY 1),
    tot AS (
      SELECT ra.pair, ra.a, cb.b, ra.rt, cb.ct, g.gt,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      FROM ra
      JOIN cb USING (pair)
      JOIN gtot g USING (pair)
      LEFT JOIN cells c
        ON c.pair = ra.pair AND c.a = ra.a AND c.b = cb.b),
    terms AS (
      SELECT pair, a, b,
             (CAST(n AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(gt AS DOUBLE))
             * (CAST(n AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(gt AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                / CAST(gt AS DOUBLE)) AS t
      FROM tot),
    folded AS (
      SELECT pair,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(
                 list(struct_pack(a := a, b := b, t := t) ORDER BY a, b),
                 s -> s.t)),
               (acc, x) -> acc + x) AS chi2
      FROM terms GROUP BY 1),
    stats AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r_levels,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c_levels
      FROM cells GROUP BY 1)
    SELECT s.pair AS col_pair, s.n, s.r_levels, s.c_levels,
           CAST((s.r_levels - 1) * (s.c_levels - 1) AS BIGINT) AS dof,
           f.chi2 AS chi2,
           CASE WHEN LEAST(s.r_levels - 1, s.c_levels - 1) > 0 THEN
             sqrt(f.chi2 / CAST(s.n * LEAST(s.r_levels - 1,
                                            s.c_levels - 1) AS DOUBLE))
           END AS cramers_v
    FROM stats s JOIN folded f USING (pair)
    """,
    tags=("governance", "association", "cramers-v", "feature-selection"),
)
def orders_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cramér's V association matrix over four order
    categoricals — status, priority, order weekday, total-price band
    (operators/profile.py:cramers_v_matrix): the normalized 0..1
    association strength that ranks which columns duplicate each
    other's signal, for feature selection and leakage hunts, where
    orders_status_priority_chi2 reads ONE pair cell-by-cell. The
    chi-square SCALAR is made engine-deterministic by the
    ordered-fold idiom: per-pair cells are enum-bounded, so both
    engines fold the SAME per-cell IEEE terms in the SAME (a, b)
    order (F.aggregate over array_sort(collect_list) ≡ DuckDB
    list_reduce over list(... ORDER BY a, b)) — lifting the
    per-cell-only restriction the chi2 entry documents. The fold runs
    over the DENSE marginal x marginal grid, so structural zeros
    (never-observed combinations) contribute their full expectation —
    folding observed cells only would cap V below 1 for a perfect
    association (pinned by TestCramersVMatrix). One scan explodes
    rows into C(4,2)=6 pairs; one (pair, a, b) count aggregate is the
    only corpus-sized shuffle."""
    from ..operators.profile import cramers_v_matrix

    od = load_table(spark, sf_dir, "orders")
    base = od.select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
        F.dayofweek(F.to_date("o_orderdate")).cast("string").alias("odow"),
        F.floor(F.col("o_totalprice") / F.lit(100000.0))
        .cast("long")
        .cast("string")
        .alias("pband"),
    )
    return cramers_v_matrix(base, ["status", "priority", "odow", "pband"])


@query(
    "lineitem_digit_heaping",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
                       AS DECIMAL(38,0)) % 1000 AS BIGINT) // 100
               AS digit
      FROM lineitem),
    cells AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    tot AS (
      SELECT digit, n, CAST(SUM(n) OVER () AS BIGINT) AS gt FROM cells)
    SELECT CAST(digit AS INTEGER) AS terminal_digit, n,
           CAST(n AS DOUBLE) / CAST(gt AS DOUBLE) AS share,
           CAST(gt AS DOUBLE) / CAST(10 AS DOUBLE) AS expected,
           (CAST(n AS DOUBLE) - CAST(gt AS DOUBLE) / CAST(10 AS DOUBLE))
           * (CAST(n AS DOUBLE) - CAST(gt AS DOUBLE) / CAST(10 AS DOUBLE))
           / (CAST(gt AS DOUBLE) / CAST(10 AS DOUBLE)) AS chi2_contrib
    FROM tot
    """,
    tags=("governance", "heaping", "digit-preference", "data-quality"),
)
def lineitem_digit_heaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-digit heaping audit of order quantities — the
    data-entry-quality sibling of orders_benford_audit (Benford reads
    FIRST digits of organic magnitudes; heaping reads LAST digits,
    where human-entered or system-defaulted values pile onto 0 and 5).
    Each of the 10 terminal digits reports its count, share, uniform
    expectation and per-cell chi-square contribution (the per-cell
    shape of the chi2 entries; exact integer counts, single IEEE
    divisions). The digit is extracted in exact integer-cents
    arithmetic on NON-NEGATIVE values (quantities — Spark % and
    DuckDB % agree there), never by double rounding. One count
    aggregate, one window over the 10-row frame."""
    from ..operators.relational import dec

    d38 = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    digits = li.select(
        (
            ((dec("l_quantity", 12, 2) * 100).cast(d38) % 1000).cast("long")
            / F.lit(100)
        )
        .cast("long")
        .alias("digit")
    )
    from pyspark.sql import Window

    cells = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gt = F.sum("n").over(w_all).cast("long")
    e = gt.cast("double") / F.lit(10).cast("double")
    return cells.select(
        F.col("digit").cast("int").alias("terminal_digit"),
        "n",
        (F.col("n").cast("double") / gt.cast("double")).alias("share"),
        e.alias("expected"),
        (
            (F.col("n").cast("double") - e)
            * (F.col("n").cast("double") - e)
            / e
        ).alias("chi2_contrib"),
    )


@query(
    "lineitem_abc_migration",
    oracle="""
    WITH members AS (
      SELECT l_partkey AS m,
             SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1996-01-01'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS rev1,
             SUM(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS rev2
      FROM lineitem GROUP BY 1),
    c1 AS (
      SELECT m, CASE WHEN cum * 5 <= total * 4 THEN 'A'
                     WHEN cum * 20 <= total * 19 THEN 'B'
                     ELSE 'C' END AS cls
      FROM (
        SELECT m, SUM(rev1) OVER (ORDER BY rev1 DESC, m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(rev1) OVER () AS total
        FROM members WHERE rev1 IS NOT NULL)),
    c2 AS (
      SELECT m, CASE WHEN cum * 5 <= total * 4 THEN 'A'
                     WHEN cum * 20 <= total * 19 THEN 'B'
                     ELSE 'C' END AS cls
      FROM (
        SELECT m, SUM(rev2) OVER (ORDER BY rev2 DESC, m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(rev2) OVER () AS total
        FROM members WHERE rev2 IS NOT NULL))
    SELECT COALESCE(c1.cls, 'none') AS class_from,
           COALESCE(c2.cls, 'none') AS class_to,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM members mm
    LEFT JOIN c1 ON c1.m = mm.m
    LEFT JOIN c2 ON c2.m = mm.m
    GROUP BY 1, 2
    """,
    tags=("governance", "abc", "migration", "concentration"),
)
def lineitem_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-class migration matrix across the 1996 boundary: every part
    classified A/B/C by cumulative revenue share (the
    lineitem_abc_classes thresholds — exact integer-cross-multiplied
    cum*5 <= total*4 cuts, never float shares) in EACH period, plus
    'none' for parts with no period revenue, then the from->to
    transition counts — the assortment-drift report (how much of last
    period's A-class fell out?) that a static ABC snapshot can't
    answer. ONE lineitem scan builds both periods' part revenues via
    conditional aggregation; the class windows run over the
    part-grain frame; the matrix is a (<=4x4)-cell rollup."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1996-01-01").cast("date")
    members = (
        li.groupBy(F.col("l_partkey").alias("m"))
        .agg(
            F.sum(
                F.when(F.to_date("l_shipdate") < cutoff,
                       dec("l_extendedprice", 12, 2))
            ).alias("rev1"),
            F.sum(
                F.when(F.to_date("l_shipdate") >= cutoff,
                       dec("l_extendedprice", 12, 2))
            ).alias("rev2"),
        )
        # part-grain; reused by both class windows + the matrix join.
        # cache, NOT localCheckpoint: the class windows downstream are
        # global, and the advisor needs the Aggregate lineage to see
        # they run over the REDUCED part frame (the quadrants lesson)
        .cache()
    )

    def classify(rev_col: str):
        f = members.filter(F.col(rev_col).isNotNull()).select(
            "m", F.col(rev_col).alias("rev")
        )
        w_cum = Window.orderBy(F.col("rev").desc(), F.col("m")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        scored = f.select(
            "m",
            F.sum("rev").over(w_cum).alias("cum"),
            F.sum("rev").over(w_all).alias("total"),
        )
        return scored.select(
            "m",
            F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
            .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
            .otherwise("C")
            .alias("cls"),
        )

    c1 = classify("rev1").withColumnRenamed("cls", "cls1")
    c2 = classify("rev2").withColumnRenamed("cls", "cls2")
    return (
        members.select("m")
        .join(c1, "m", "left")
        .join(c2, "m", "left")
        .groupBy(
            F.coalesce("cls1", F.lit("none")).alias("class_from"),
            F.coalesce("cls2", F.lit("none")).alias("class_to"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
