"""Relational operator coverage over the TPC-H-ish corpus (SURVEY.md §2).

Each query exercises one or more inventory rows: scans (S2), projections /
filters / predicates (P1-P5), the full join surface (§2.4 + the types the
reference lacks), aggregation surface (§2.5 + count/avg/min/max, distinct,
approx-distinct, rollup/cube/grouping sets, pivot/unpivot, having,
percentiles), window functions / sort / limit / set ops (§2.7), and the
scalar function families (§2.6 + string/date/math).

Determinism rules (queries/catalog.py): all money math is pinned to
DECIMAL(12,2) inputs before arithmetic so intermediate results are exact,
associative and identical across engines and cluster layouts; every FINAL
decimal measure is then cast to DOUBLE on both sides — one IEEE-correct
conversion of identical exact values is bit-identical, and float output
renders identically in any downstream hasher (decimal trailing-zero
renderings do not).

Related queries are folded into single catalog entries (tagged unions /
wide selects) so the whole §2 surface fits inside the driver's checked
window without losing any operator coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import dec, topk_per_group
from ..sources.corpus import load_table
from .catalog import query

D = "DECIMAL(12,2)"  # oracle-side spelling of dec()


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE)                      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE)                 AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS {D}) * CAST(1 - l_discount AS {D}))
                AS DOUBLE)                                                   AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS {D}) * CAST(1 - l_discount AS {D})
                                            * CAST(1 + l_tax AS {D}))
                AS DOUBLE)                                                   AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) / COUNT(*)           AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) / COUNT(*)      AS avg_price,
           CAST(SUM(CAST(l_discount AS {D})) AS DOUBLE) / COUNT(*)           AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby", "sum", "avg", "count"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash aggregate, 2 grouping keys, 8 measures.

    Catalyst plans a partial+final HashAggregate (map-side combine), so the
    shuffle carries one row per (flag, status, partition) — this is the
    at-scale shape: shuffle volume is O(groups x partitions), not O(rows).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-02"
    )
    price = dec("l_extendedprice", 12, 2)
    disc1 = (F.lit(1) - F.col("l_discount")).cast(D)
    tax1 = (F.lit(1) + F.col("l_tax")).cast(D)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", 12, 2)).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * disc1).cast("double").alias("sum_disc_price"),
        F.sum(price * disc1 * tax1).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity", 12, 2)).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(dec("l_discount", 12, 2)).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {D}) * CAST(l_discount AS {D}))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "between", "agg"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: conjunctive range predicates + global aggregate.

    All three predicates push down to the parquet scan (PushedFilters), so
    at 100 TB the scan prunes row groups on l_shipdate statistics.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 12, 2))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "lineitem_flag_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_lines,
           TRUE AS approx_parts_ok,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_quantity, 0.99) AS p99_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct", "approx", "percentile"),
)
def lineitem_flag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts + HyperLogLog++ approx-distinct + exact
    percentiles, one aggregate.

    The HLL++ estimate is engine-specific, so the checkable contract is the
    boolean ``approx_parts_ok`` = |approx - exact| / exact <= 15% (the
    oracle side is TRUE by definition of a working sketch; the tighter
    default-rsd accuracy bound is asserted in tests). Exact distincts plan
    as expand + two-phase agg; percentiles are linear-interpolation
    (Spark percentile() ≡ DuckDB quantile_cont bit-for-bit here).
    """
    li = load_table(spark, sf_dir, "lineitem")
    agged = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_lines"),
        F.approx_count_distinct("l_partkey").alias("_approx_parts"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_quantity", 0.99).alias("p99_qty"),
    )
    ok = (
        F.abs(F.col("_approx_parts") - F.col("n_parts"))
        / F.col("n_parts")
        <= 0.15
    )
    return agged.select(
        "l_returnflag",
        "n_parts",
        "n_supps",
        "n_lines",
        ok.alias("approx_parts_ok"),
        "median_qty",
        "p90_qty",
        "p99_qty",
    )


@query(
    "having_big_parts",
    oracle=f"""
    SELECT l_partkey, CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_quantity AS {D})) > 300
    """,
    tags=("agg", "having"),
)
def having_big_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) on the exact decimal sum; the
    surviving measure is cast to DOUBLE only at output."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("_total_qty_dec"))
        .filter(F.col("_total_qty_dec") > 300)
        .select(
            "l_partkey", F.col("_total_qty_dec").cast("double").alias("total_qty")
        )
    )


@query(
    "rollup_cube_order_stats",
    oracle=f"""
    SELECT 'orders_rollup' AS src, o_orderstatus AS k1, o_orderpriority AS k2,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g1,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g2,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS sum_val,
           CAST(MIN(CAST(o_totalprice AS {D})) AS DOUBLE) AS min_val,
           CAST(MAX(CAST(o_totalprice AS {D})) AS DOUBLE) AS max_val
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'lineitem_cube' AS src, l_returnflag AS k1, l_linestatus AS k2,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g1,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g2,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) AS sum_val,
           CAST(MIN(CAST(l_quantity AS {D})) AS DOUBLE) AS min_val,
           CAST(MAX(CAST(l_quantity AS {D})) AS DOUBLE) AS max_val
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup", "cube", "grouping", "min", "max"),
)
def rollup_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (orders) ∪ CUBE (lineitem) hierarchy totals with GROUPING()
    disambiguation and min/max measures — one tagged union covering both
    multi-grouping operators plus decimal min/max aggregation (the rollup
    total row is the global min/max)."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    price = dec("o_totalprice", 12, 2)
    qty = dec("l_quantity", 12, 2)
    rolled = od.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g1"),
        F.grouping("o_orderpriority").cast("int").alias("g2"),
        F.count("*").alias("n_rows"),
        F.sum(price).cast("double").alias("sum_val"),
        F.min(price).cast("double").alias("min_val"),
        F.max(price).cast("double").alias("max_val"),
    ).select(
        F.lit("orders_rollup").alias("src"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        "g1", "g2", "n_rows", "sum_val", "min_val", "max_val",
    )
    cubed = li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g1"),
        F.grouping("l_linestatus").cast("int").alias("g2"),
        F.count("*").alias("n_rows"),
        F.sum(qty).cast("double").alias("sum_val"),
        F.min(qty).cast("double").alias("min_val"),
        F.max(qty).cast("double").alias("max_val"),
    ).select(
        F.lit("lineitem_cube").alias("src"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        "g1", "g2", "n_rows", "sum_val", "min_val", "max_val",
    )
    return rolled.unionByName(cubed)


@query(
    "pivot_unpivot_roundtrip",
    oracle="""
    SELECT o_orderpriority, measure AS status_col, val AS n_orders FROM (
      UNPIVOT (
        SELECT o_orderpriority,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS st_f,
               CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS st_o,
               CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS st_p
        FROM orders GROUP BY o_orderpriority
      ) ON st_f, st_o, st_p INTO NAME measure VALUE val
    )
    """,
    tags=("pivot", "unpivot", "reshape"),
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list — no extra distinct-values job) then
    unpivot back to long form: both reshape operators in one plan; the
    roundtrip output is the per-(priority, status) count table."""
    od = load_table(spark, sf_dir, "orders")
    p = (
        od.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    wide = p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("st_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("st_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_p"),
    )
    return wide.unpivot(
        "o_orderpriority", ["st_f", "st_o", "st_p"], "status_col", "n_orders"
    )


@query(
    "case_in_order_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus IN ('F', 'P') AND o_orderpriority NOT IN ('5-LOW')
    GROUP BY 1
    """,
    tags=("case", "conditional", "filter", "in"),
)
def case_in_order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN membership predicates + CASE WHEN bucketing + aggregate
    over the derived key — the conditional-expression family in one plan
    (predicates push down; the CASE is evaluated post-scan)."""
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "P")
        & ~F.col("o_orderpriority").isin("5-LOW")
    )
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return od.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice", 12, 2)).cast("double").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q3_unshipped_revenue",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D}))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-03-15'
      AND l.l_shipdate > DATE '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    tags=("join", "agg", "filter"),
    bench=True,
)
def q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with selective dimension filter.

    The filtered customer side scales with SF, so no broadcast is
    forced — AQE broadcasts it while its post-filter size fits and falls
    back to a shuffled hash join beyond that. Filters sit below the
    joins, so Catalyst pushes them into all three scans.
    """
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15"
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1) - F.col("l_discount")).cast(D)
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D}))
                AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "multiway", "agg"),
    bench=True,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join incl. a non-FK equality (s⋈c nation).

    region/nation are broadcast (bounded dims: 5/25 rows at ANY SF);
    supplier scales with SF so its join is left to AQE — broadcast while
    it fits, shuffled hash join at scale.
    """
    rg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, (li.l_suppkey == su.s_suppkey) & (su.s_nationkey == cu.c_nationkey))
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(rg), na.n_regionkey == rg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1) - F.col("l_discount")).cast(D)
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D}))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
    tags=("join", "agg"),
    bench=True,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1) - F.col("l_discount")).cast(D)
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "semi_anti_customers",
    oracle="""
    SELECT 'active' AS side, c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    UNION ALL
    SELECT 'dormant' AS side, c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "semi", "anti"),
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join ∪ NOT EXISTS as a left-anti join, tagged.
    Both sides shuffle keys only — no row multiplication."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    active = (
        cu.join(
            od.filter(F.col("o_orderstatus") == "O"),
            cu.c_custkey == F.col("o_custkey"),
            "left_semi",
        )
        .select(F.lit("active").alias("side"), "c_custkey", "c_name")
    )
    dormant = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .select(F.lit("dormant").alias("side"), "c_custkey", "c_name")
    )
    return active.unionByName(dormant)


@query(
    "outer_join_profiles",
    oracle="""
    SELECT 'cust_orders' AS side,
           CAST(c.c_custkey AS BIGINT) AS key,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_left,
           CAST(NULL AS BIGINT) AS n_right,
           COALESCE(MIN(o.o_orderstatus), 'NONE') AS label
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    UNION ALL
    SELECT 'nation_presence' AS side,
           CAST(COALESCE(cn.nk, sn.nk) AS BIGINT) AS key,
           CAST(COALESCE(cn.n_cust, 0) AS BIGINT) AS n_left,
           CAST(COALESCE(sn.n_supp, 0) AS BIGINT) AS n_right,
           CAST(NULL AS VARCHAR) AS label
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) sn
      ON cn.nk = sn.nk
    """,
    tags=("join", "outer", "full_outer", "coalesce"),
)
def outer_join_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (+ null handling)
    ∪ full outer join of two pre-aggregated sides — the outer-join family
    in one tagged union."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    su = load_table(spark, sf_dir, "supplier")
    left_side = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.min("o_orderstatus"), F.lit("NONE")).alias("label"),
        )
        .select(
            F.lit("cust_orders").alias("side"),
            F.col("c_custkey").cast("bigint").alias("key"),
            F.col("n_orders").alias("n_left"),
            F.lit(None).cast("bigint").alias("n_right"),
            "label",
        )
    )
    cn = cu.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    sn = su.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supp")
    )
    full_side = cn.join(sn, "nk", "full_outer").select(
        F.lit("nation_presence").alias("side"),
        F.coalesce(cn.nk, sn.nk).cast("bigint").alias("key"),
        F.coalesce("n_cust", F.lit(0)).alias("n_left"),
        F.coalesce("n_supp", F.lit(0)).alias("n_right"),
        F.lit(None).cast("string").alias("label"),
    )
    return left_side.unionByName(full_side)


@query(
    "range_join_late_ship",
    oracle="""
    SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_late_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderkey
    """,
    tags=("join", "range"),
)
def range_join_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range predicate (band join): lines shipped > 60 days
    after order. The equi key carries the shuffle; the range predicate is a
    post-join filter, so no O(n^2) blow-up."""
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            od,
            (li.l_orderkey == od.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_late_lines"))
    )


@query(
    "top_orders_above_avg",
    oracle=f"""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price, o_orderdate
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE)
                                 / COUNT(*) FROM orders)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("subquery", "join", "sort", "limit"),
)
def top_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery (orders above the global average price,
    via a broadcast cross-join of the 1-row aggregate — what Catalyst does
    for an uncorrelated scalar subquery anyway) + global top-N: Spark
    plans TakeOrderedAndProject — per-partition heap + driver merge of N
    rows, never a full global sort."""
    od = load_table(spark, sf_dir, "orders")
    avg_price = od.agg(
        (F.sum(dec("o_totalprice", 12, 2)).cast("double") / F.count("*")).alias(
            "avg_price"
        )
    )
    return (
        od.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("total_price"),
            "o_orderdate",
        )
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "setops_nations",
    oracle="""
    SELECT 'union' AS op, CAST(nationkey AS VARCHAR) AS lhs,
           CAST(NULL AS VARCHAR) AS rhs FROM (
      SELECT n_nationkey AS nationkey FROM nation n
      WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
      UNION
      SELECT n_nationkey AS nationkey FROM nation n
      WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    )
    UNION ALL
    SELECT 'except' AS op, CAST(nationkey AS VARCHAR) AS lhs,
           CAST(NULL AS VARCHAR) AS rhs FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT 'intersect' AS op, CAST(nationkey AS VARCHAR) AS lhs,
           CAST(NULL AS VARCHAR) AS rhs FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT 'cross' AS op, r.r_name AS lhs, s.seg AS rhs
    FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    """,
    tags=("setop", "union", "except", "intersect", "in", "join", "cross"),
)
def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The set-operation family in one tagged union — UNION (distinct) of
    two IN-subquery-filtered sides, EXCEPT (nations with customers but no
    suppliers), INTERSECT (nations on both market sides) — plus the
    small-dimensional cross join (the only safe kind at scale) as a
    'cross'-tagged rider: region × distinct market segments, broadcast so
    the plan is a BroadcastNestedLoopJoin of two tiny sides, never a
    shuffled CartesianProduct."""
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    cu_nk = cu.select(F.col("c_nationkey").alias("nationkey"))
    su_nk = su.select(F.col("s_nationkey").alias("nationkey"))
    trading = (
        na.join(cu, na.n_nationkey == cu.c_nationkey, "left_semi")
        .select(F.col("n_nationkey").alias("nationkey"))
        .union(
            na.join(su, na.n_nationkey == su.s_nationkey, "left_semi").select(
                F.col("n_nationkey").alias("nationkey")
            )
        )
        .distinct()
    )
    exc = cu_nk.subtract(su_nk)  # EXCEPT (distinct) semantics, not EXCEPT ALL
    its = cu_nk.intersect(su_nk)
    none_s = F.lit(None).cast("string")

    def side(df: DataFrame, op: str) -> DataFrame:
        return df.select(
            F.lit(op).alias("op"),
            F.col("nationkey").cast("string").alias("lhs"),
            none_s.alias("rhs"),
        )

    cross = (
        load_table(spark, sf_dir, "region")
        .select("r_name")
        .crossJoin(
            F.broadcast(
                cu.select(F.col("c_mktsegment").alias("seg")).distinct()
            )
        )
        .select(
            F.lit("cross").alias("op"),
            F.col("r_name").alias("lhs"),
            F.col("seg").alias("rhs"),
        )
    )
    return (
        side(trading, "union")
        .unionByName(side(exc, "except"))
        .unionByName(side(its, "intersect"))
        .unionByName(cross)
    )


# --------------------------------------------------------------------------
# Window functions / sort / limit
# --------------------------------------------------------------------------

@query(
    "top3_parts_per_brand",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D})) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_partkey
    )
    SELECT p_brand, l_partkey, CAST(revenue AS DOUBLE) AS revenue, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                     ORDER BY revenue DESC, l_partkey) AS INTEGER) AS rnk
      FROM rev
    ) WHERE rnk <= 3
    """,
    tags=("window", "topk", "join", "agg"),
    bench=True,
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: agg → row_number window, unique tie-break on PK.
    The window orders on the EXACT decimal revenue (so ranking is
    engine-identical); the output column is cast to DOUBLE after ranking."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    rev = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1) - F.col("l_discount")).cast(D)
            )
            .cast("decimal(38,4)")
            .alias("revenue")
        )
    )
    return (
        topk_per_group(
            rev,
            ["p_brand"],
            [F.col("revenue").desc(), F.col("l_partkey")],
            k=3,
        )
        .withColumn("rnk", F.col("rnk").cast("int"))
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


@query(
    "window_order_sequences",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {D})) OVER wf AS DOUBLE) AS running_spend,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq,
           CAST(CAST(o_totalprice AS {D}) - LAG(CAST(o_totalprice AS {D}), 1)
               OVER w AS DOUBLE) AS delta_vs_prev,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                CAST(LEAD(o_orderdate) OVER w AS DATE)) AS INTEGER)
               AS days_to_next,
           CAST(RANK() OVER wd AS INTEGER) AS rnk_day,
           CAST(DENSE_RANK() OVER wd AS INTEGER) AS drnk_day,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wd AS (PARTITION BY o_custkey ORDER BY o_orderdate)
    """,
    tags=("window", "running", "lag", "lead", "first_value", "rank", "ntile"),
)
def window_order_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-key window-function family on one shuffle + one sort:
    running total, row_number, lag delta, lead successor, first_value,
    inter-order gap days, rank/dense_rank (over date only, so same-day
    orders produce real ties — rank != row_number is actually exercised)
    and ntile quartiles. lag/lead share the unframed spec w; the running
    sum uses the framed twin wf (Spark rejects lag over a framed spec);
    wd's date-only sort is a prefix of w's, so no extra sort is planned —
    all three specs share one partition-key exchange."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    price = dec("o_totalprice", 12, 2)
    next_date = F.lead("o_orderdate").over(w)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price).over(wf).cast("double").alias("running_spend"),
        F.row_number().over(w).cast("int").alias("order_seq"),
        (price - F.lag(price, 1).over(w)).cast("double").alias("delta_vs_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.datediff(next_date.cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_next"
        ),
        F.rank().over(wd).cast("int").alias("rnk_day"),
        F.dense_rank().over(wd).cast("int").alias("drnk_day"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------

@query(
    "string_math_functions_customer",
    oracle=f"""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('#', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_tag,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(ABS(CAST(c_acctbal AS {D})) AS DOUBLE) AS bal_abs,
           CAST(ROUND(CAST(c_acctbal AS {D}), 1) AS DOUBLE) AS bal_round1,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
           SQRT(ABS(c_acctbal)) AS bal_sqrt,
           1.0 / (ABS(c_acctbal) + 1.0) AS bal_inv,
           c_acctbal * c_acctbal AS bal_sq,
           CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign,
           MOD(c_custkey, 7) AS key_mod7
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
    tags=("scalar", "string", "like", "regex", "math"),
)
def string_math_functions_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (case, length, substring, concat_ws, replace,
    regexp_extract, LIKE) + math family (abs, decimal round, floor/ceil,
    sqrt, division, sign, mod) in one wide per-row select. ROUND only on
    decimals (cross-engine double rounding differs) and only
    IEEE-correctly-rounded double ops (+,-,*,/,sqrt) — libm
    transcendentals (ln, pow, exp) differ across engines in the last ulp."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_name").like("Customer%")
    )
    bal = F.col("c_acctbal")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("#", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("seg_tag"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.abs(dec("c_acctbal", 12, 2)).cast("double").alias("bal_abs"),
        F.round(dec("c_acctbal", 12, 2), 1).cast("double").alias("bal_round1"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (F.lit(1.0) / (F.abs(bal) + F.lit(1.0))).alias("bal_inv"),
        (bal * bal).alias("bal_sq"),
        F.signum(bal).cast("double").alias("bal_sign"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
    )


@query(
    "date_functions_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                AS INTEGER) AS days_to_2002
    FROM orders
    """,
    tags=("scalar", "date"),
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family. dayofweek aligned to Spark's 1=Sunday."""
    od = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return od.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.dayofweek(d).alias("order_dow"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias(
            "days_to_2002"
        ),
    )


@query(
    "grouping_sets_geography",
    oracle="""
    SELECT n.n_name, c.c_mktsegment,
           CAST(GROUPING(n.n_name) AS INTEGER) AS g_nation,
           CAST(GROUPING(c.c_mktsegment) AS INTEGER) AS g_segment,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
    """,
    tags=("agg", "grouping_sets", "sql"),
)
def grouping_sets_geography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube), expressed through
    the engine's SQL entry point (sql.py) — Catalyst plans SQL text and
    DataFrame calls identically, so the catalog can mix both surfaces."""
    from ..sql import sql

    return sql(
        spark,
        """
        SELECT n.n_name, c.c_mktsegment,
               CAST(GROUPING(n.n_name) AS INT) AS g_nation,
               CAST(GROUPING(c.c_mktsegment) AS INT) AS g_segment,
               COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
        """,
        sf_dir=sf_dir,
    )


# --------------------------------------------------------------------------
# Data-quality profiling
# --------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")


@query(
    "orders_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS "column", COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / COUNT(*)
                 AS null_fraction,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
    tags=("profile", "agg", "distinct", "minmax"),
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the orders table — per-column row/null
    counts, null fraction, exact distinct cardinality and min/max — in ONE
    aggregation pass over the scan (operators/profile.py builds a single
    agg of 4x4 measures, then explodes a struct array into the long
    run-over-run diffable layout). Exact distinct here because the driver
    oracle demands determinism; the scale default (exact_distinct=False)
    swaps in one-pass HLL++ sketches, accuracy unit-tested separately.
    min/max are cast to VARCHAR only on engine-stable renderings
    (ints, strings, dates) — never doubles."""
    from ..operators.profile import profile_table

    return profile_table(
        load_table(spark, sf_dir, "orders"),
        columns=list(_PROFILE_COLS),
        exact_distinct=True,
    )
