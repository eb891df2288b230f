"""Relational operator coverage over the TPC-H-ish corpus (SURVEY.md §2).

Each query exercises one or more inventory rows: scans (S2), projections /
filters / predicates (P1-P5), the full join surface (§2.4 + the types the
reference lacks), aggregation surface (§2.5 + count/avg/min/max, distinct,
rollup/cube/grouping sets, pivot, having), window functions / sort / limit /
set ops (§2.7), and the scalar function families (§2.6 + string/date/math).

All money math is pinned to DECIMAL(12,2) inputs before arithmetic (see
queries/catalog.py determinism rules) so results are exact, associative and
identical across engines and cluster layouts.
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
           SUM(CAST(l_quantity AS {D}))                            AS sum_qty,
           SUM(CAST(l_extendedprice AS {D}))                       AS sum_base_price,
           SUM(CAST(l_extendedprice AS {D}) * CAST(1 - l_discount AS {D})) AS sum_disc_price,
           SUM(CAST(l_extendedprice AS {D}) * CAST(1 - l_discount AS {D})
                                            * CAST(1 + l_tax AS {D}))      AS sum_charge,
           CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) / COUNT(*)        AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) / COUNT(*)   AS avg_price,
           CAST(SUM(CAST(l_discount AS {D})) AS DOUBLE) / COUNT(*)        AS avg_disc,
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
        F.sum(dec("l_quantity", 12, 2)).cast("decimal(38,2)").alias("sum_qty"),
        F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
        F.sum(price * disc1).cast("decimal(38,4)").alias("sum_disc_price"),
        F.sum(price * disc1 * tax1).alias("sum_charge"),
        (F.sum(dec("l_quantity", 12, 2)).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(dec("l_discount", 12, 2)).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT SUM(CAST(l_extendedprice AS {D}) * CAST(l_discount AS {D})) AS revenue,
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
            .cast("decimal(38,4)")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "count_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def count_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregates (expand + two-phase agg under the hood)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_lines"),
    )


@query(
    "minmax_order_stats",
    oracle=f"""
    SELECT o_orderstatus,
           MIN(CAST(o_totalprice AS {D})) AS min_price,
           MAX(CAST(o_totalprice AS {D})) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "min", "max"),
)
def minmax_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max over decimal + timestamp columns."""
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.min(dec("o_totalprice", 12, 2)).alias("min_price"),
        F.max(dec("o_totalprice", 12, 2)).alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
    )


@query(
    "having_big_parts",
    oracle=f"""
    SELECT l_partkey, SUM(CAST(l_quantity AS {D})) AS total_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_quantity AS {D})) > 300
    """,
    tags=("agg", "having"),
)
def having_big_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.sum(dec("l_quantity", 12, 2))
            .cast("decimal(38,2)")
            .alias("total_qty")
        )
        .filter(F.col("total_qty") > 300)
    )


@query(
    "rollup_order_mix",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS {D})) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup", "grouping"),
)
def rollup_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING() disambiguation."""
    od = load_table(spark, sf_dir, "orders")
    return od.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("total_price"),
    )


@query(
    "cube_lineitem_mix",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           SUM(CAST(l_quantity AS {D})) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_lineitem_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum(dec("l_quantity", 12, 2)).cast("decimal(38,2)").alias("sum_qty"),
    )


@query(
    "pivot_priority_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS st_f,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS st_o,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS st_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job)."""
    od = load_table(spark, sf_dir, "orders")
    p = (
        od.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("st_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("st_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("st_p"),
    )


@query(
    "case_when_price_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS {D})) AS total_price
    FROM orders GROUP BY 1
    """,
    tags=("case", "conditional"),
)
def case_when_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate over the derived key."""
    od = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return od.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("total_price"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q3_unshipped_revenue",
    oracle=f"""
    SELECT l.l_orderkey,
           SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D})) AS revenue,
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

    The filtered customer side is small → broadcast it so the big
    orders⋈lineitem join is the only shuffle. Filters sit below the joins,
    so Catalyst pushes them into all three scans.
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
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1) - F.col("l_discount")).cast(D)
            )
            .cast("decimal(38,4)")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n.n_name,
           SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D})) AS revenue
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

    region/nation/supplier are broadcast (tiny dims) → lineitem only
    shuffles for the orders join; the rest are map-side hash joins.
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
        .join(F.broadcast(su), (li.l_suppkey == su.s_suppkey) & (su.s_nationkey == cu.c_nationkey))
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(rg), na.n_regionkey == rg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                dec("l_extendedprice", 12, 2)
                * (F.lit(1) - F.col("l_discount")).cast(D)
            )
            .cast("decimal(38,4)")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           SUM(CAST(l.l_extendedprice AS {D}) * CAST(1 - l.l_discount AS {D})) AS revenue
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
            .cast("decimal(38,4)")
            .alias("revenue")
        )
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    tags=("join", "semi"),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (no row multiplication, keys-only shuffle)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cu.join(
        od, cu.c_custkey == od.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "left_join_order_counts",
    oracle="""
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           COALESCE(MIN(o.o_orderstatus), 'NONE') AS first_status
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer", "coalesce"),
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers + null handling."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.min("o_orderstatus"), F.lit("NONE")).alias("first_status"),
        )
    )


@query(
    "full_outer_nation_presence",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           CAST(COALESCE(cn.n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(sn.n_supp, 0) AS BIGINT) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join", "full_outer"),
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides."""
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    cn = cu.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_cust")
    )
    sn = su.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supp")
    )
    return cn.join(sn, "nk", "full_outer").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "cross_join_segment_region",
    oracle="""
    SELECT r.r_name, s.seg FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
    """,
    tags=("join", "cross"),
)
def cross_join_segment_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimensional cross join (the only safe kind at scale)."""
    rg = load_table(spark, sf_dir, "region").select("r_name")
    seg = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return rg.crossJoin(F.broadcast(seg))


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
    "scalar_subquery_above_avg",
    oracle=f"""
    SELECT o_orderkey, CAST(o_totalprice AS {D}) AS total_price
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE)
                                 / COUNT(*) FROM orders)
    """,
    tags=("subquery", "join"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery: orders above the global average price,
    via a broadcast cross-join of the 1-row aggregate (what Catalyst does
    for an uncorrelated scalar subquery anyway)."""
    od = load_table(spark, sf_dir, "orders")
    avg_price = od.agg(
        (F.sum(dec("o_totalprice", 12, 2)).cast("double") / F.count("*")).alias(
            "avg_price"
        )
    )
    return (
        od.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", dec("o_totalprice", 12, 2).alias("total_price"))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "union_trading_nations",
    oracle="""
    SELECT n_nationkey, n_name FROM nation n
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
    UNION
    SELECT n_nationkey, n_name FROM nation n
    WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
    tags=("setop", "union", "in"),
)
def union_trading_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two IN-subquery-filtered sides."""
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    a = na.join(cu, na.n_nationkey == cu.c_nationkey, "left_semi")
    b = na.join(su, na.n_nationkey == su.s_nationkey, "left_semi")
    return a.select("n_nationkey", "n_name").union(
        b.select("n_nationkey", "n_name")
    ).distinct()


@query(
    "except_customer_only_nations",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "except"),
)
def except_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nations with customers but no suppliers."""
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cu.subtract(su)  # EXCEPT (distinct) semantics, not EXCEPT ALL


@query(
    "intersect_both_nations",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "intersect"),
)
def intersect_both_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations present on both sides of the market."""
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cu.intersect(su)


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
    SELECT p_brand, l_partkey, revenue, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                     ORDER BY revenue DESC, l_partkey) AS INTEGER) AS rnk
      FROM rev
    ) WHERE rnk <= 3
    """,
    tags=("window", "topk", "join", "agg"),
    bench=True,
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: agg → row_number window, unique tie-break on PK."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
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
    return topk_per_group(
        rev,
        ["p_brand"],
        [F.col("revenue").desc(), F.col("l_partkey")],
        k=3,
    ).withColumn("rnk", F.col("rnk").cast("int"))


@query(
    "window_customer_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(o_totalprice AS {D})) OVER w AS running_spend,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq,
           CAST(o_totalprice AS {D}) - LAG(CAST(o_totalprice AS {D}), 1)
               OVER w AS delta_vs_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "running", "lag"),
)
def window_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag delta per customer (single shuffle, one sort)."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price = dec("o_totalprice", 12, 2)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price).over(wf).cast("decimal(38,2)").alias("running_spend"),
        F.row_number().over(w).cast("int").alias("order_seq"),
        (price - F.lag(price, 1).over(w)).alias("delta_vs_prev"),
    )


@query(
    "window_rank_nation_acctbal",
    oracle=f"""
    SELECT c_nationkey, c_custkey,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY CAST(c_acctbal AS {D}) DESC, c_custkey)
    """,
    tags=("window", "rank", "ntile"),
)
def window_rank_nation_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over per-nation account balances."""
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        dec("c_acctbal", 12, 2).desc(), F.col("c_custkey")
    )
    return cu.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "top10_orders_global",
    oracle=f"""
    SELECT o_orderkey, CAST(o_totalprice AS {D}) AS total_price, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def top10_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition heap
    + driver merge of N rows, never a full global sort."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            dec("o_totalprice", 12, 2).alias("total_price"),
            "o_orderdate",
        )
    )


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------

@query(
    "string_functions_customer",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CONCAT_WS('#', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_tag,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits
    FROM customer
    WHERE c_name LIKE 'Customer%'
    """,
    tags=("scalar", "string", "like", "regex"),
)
def string_functions_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, length, substring, concat_ws, replace,
    regexp_extract, LIKE predicate."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_name").like("Customer%")
    )
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("#", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("seg_tag"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
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
    "math_functions_balance",
    oracle=f"""
    SELECT c_custkey,
           ABS(CAST(c_acctbal AS {D})) AS bal_abs,
           ROUND(CAST(c_acctbal AS {D}), 1) AS bal_round1,
           CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(CEIL(c_acctbal) AS BIGINT) AS bal_ceil,
           SQRT(ABS(c_acctbal)) AS bal_sqrt,
           1.0 / (ABS(c_acctbal) + 1.0) AS bal_inv,
           c_acctbal * c_acctbal AS bal_sq,
           CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign,
           MOD(c_custkey, 7) AS key_mod7
    FROM customer
    """,
    tags=("scalar", "math"),
)
def math_functions_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family. ROUND only on decimals (cross-engine double
    rounding differs) and only IEEE-correctly-rounded double ops
    (+,-,*,/,sqrt) — libm transcendentals (ln, pow, exp) differ across
    engines in the last ulp."""
    cu = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cu.select(
        "c_custkey",
        F.abs(dec("c_acctbal", 12, 2)).alias("bal_abs"),
        F.round(dec("c_acctbal", 12, 2), 1).alias("bal_round1"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (F.lit(1.0) / (F.abs(bal) + F.lit(1.0))).alias("bal_inv"),
        (bal * bal).alias("bal_sq"),
        F.signum(bal).cast("double").alias("bal_sign"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
    )


@query(
    "in_filter_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus IN ('F', 'P') AND o_orderpriority NOT IN ('5-LOW')
    GROUP BY o_orderpriority
    """,
    tags=("filter", "in"),
)
def in_filter_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN membership predicates."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.filter(
            F.col("o_orderstatus").isin("F", "P")
            & ~F.col("o_orderpriority").isin("5-LOW")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "median_quantity_by_flag",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_quantity, 0.99) AS p99_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark percentile() and
    DuckDB quantile_cont agree bit-for-bit on these inputs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_quantity", 0.99).alias("p99_qty"),
    )


@query(
    "approx_distinct_parts",
    oracle=None,  # HLL++ sketch is engine-specific; rows-only check
    tags=("agg", "approx"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the constant-memory distinct
    count for 100 TB cardinality estimation. Engine-specific sketch, so no
    SQL oracle; accuracy vs exact is asserted in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count("*").alias("n_lines"),
    )


@query(
    "unpivot_order_measures",
    oracle="""
    SELECT o_orderkey, measure, val
    FROM (
      UNPIVOT (SELECT o_orderkey,
                      CAST(o_totalprice AS DOUBLE) AS total_price,
                      CAST(o_custkey AS DOUBLE) AS cust_key
               FROM orders)
      ON total_price, cust_key INTO NAME measure VALUE val
    )
    """,
    tags=("unpivot", "reshape"),
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) of two measure columns."""
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
        F.col("o_custkey").cast("double").alias("cust_key"),
    ).unpivot("o_orderkey", ["total_price", "cust_key"], "measure", "val")


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


@query(
    "window_lead_first_orders",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                CAST(LEAD(o_orderdate) OVER w AS DATE)) AS INTEGER)
               AS days_to_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "lead", "first_value"),
)
def window_lead_first_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value window functions: each order's successor and
    the customer's first order, plus inter-order gap days."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    next_date = F.lead("o_orderdate").over(w)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.datediff(next_date.cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_next"
        ),
    )
