"""TPC-H query shapes 7/8/9/13/14/15/17/18/19/21 over the synthetic
corpus (SURVEY.md §2.4–2.5 extension surface).

Registered AFTER the pinned driver window (queries/__init__.py imports
this module last among the query modules; the window rebuild puts the
50 checked entries first regardless), so these are bonus coverage —
locally oracle-gated like everything else via tests/test_oracle.py.

Fixture adaptations (the synthetic corpus lacks partsupp,
l_commitdate/l_receiptdate and the comment columns):

- Q9's supply cost uses ``p_retailprice`` as the cost basis (partsupp
  does not exist); the shape — LIKE-filtered part, 5-way join, profit
  expression aggregated per (nation, year) — is intact.
- Q21's "kept waiting" predicate is ``l_shipdate > o_orderdate + 60
  days`` (no commit/receipt dates); the shape — self-EXISTS plus
  self-NOT-EXISTS against the same fact with a key-inequality residual
  — is intact.
- Q13 filters ``o_orderpriority`` instead of a comment regex.

Determinism follows the catalog rules (queries/catalog.py): every sum
is decimal-pinned, every ratio is ONE IEEE division of identically
computed double operands, years are cast to INTEGER both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import dec
from ..sources.corpus import load_table, load_tables
from .catalog import query

DEC = "DECIMAL(12,2)"
# volume = extendedprice * (1 - discount), decimal-pinned identically in
# both engines (cast the INPUTS, multiply exactly, never round a double
# product)
_VOL_SQL = f"CAST(l_extendedprice AS {DEC}) * CAST(1 - l_discount AS {DEC})"


def _vol() -> F.Column:
    return dec("l_extendedprice", 12, 2) * (
        F.lit(1) - F.col("l_discount")
    ).cast(DEC)


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             {_VOL_SQL} AS vol
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= DATE '1996-01-01'
        AND l.l_shipdate < DATE '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "self-alias", "disjunction", "year"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per
    year — the nation dim joins TWICE under different aliases (supplier
    side and customer side) with a disjunctive pair predicate. Both
    nation copies broadcast (25-row bounded dim); supplier is AQE's
    choice; the fact shuffles only for the orders join."""
    t = load_tables(
        spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"]
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_VOL_SQL} AS vol,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "join", "8-way", "case-ratio", "region"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share (conditional decimal
    sum / total decimal sum, ONE double division) of a part-type market
    within a region, per order year — an 8-way join where the bounded
    dims (nation, region) broadcast, the SF-scaling dims (part,
    supplier) are AQE's choice, and the fact shuffles once for orders."""
    t = load_tables(
        spark,
        sf_dir,
        ["part", "lineitem", "supplier", "orders", "customer", "nation", "region"],
    )
    n_cust = t["nation"].select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    n_supp = t["nation"].select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    eur = t["region"].filter(F.col("r_name") == "EUROPE")
    vol = _vol().alias("vol")
    base = (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_type") == "ECONOMY"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(eur), F.col("nc_region") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("ns_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "supp_nation")
    )
    zero = F.lit(0).cast(DEC)
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_VOL_SQL}
               - CAST(p.p_retailprice AS {DEC}) * CAST(l.l_quantity AS {DEC})
               AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "like", "profit", "year"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year over a
    LIKE-filtered part subset. The fixture has no partsupp, so
    ``p_retailprice`` stands in for the supply cost — the shape (profit
    expression with a subtraction of two decimal products, 5-way join,
    two-key rollup) is what's exercised. Bounded dims broadcast, the
    SF-scaling ones are AQE's choice; the LIKE filter prunes part
    before its join."""
    t = load_tables(
        spark, sf_dir, ["part", "lineitem", "supplier", "orders", "nation"]
    )
    amount = _vol() - dec("p_retailprice", 12, 2) * dec("l_quantity", 12, 2)
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").like("%red%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "double-agg", "histogram"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram — a left outer
    join whose ON clause filters the RIGHT side only (customers with
    zero matching orders must survive with count 0), then a second
    aggregation over the first's result. COUNT(o_orderkey) counts
    non-null matches only, exactly like the SQL."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    od = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        t["customer"]
        .join(od, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_VOL_SQL}
                                  ELSE CAST(0 AS {DEC}) END) AS DOUBLE))
           / CAST(SUM({_VOL_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-03-01'
      AND l_shipdate < DATE '1997-04-01'
    """,
    tags=("tpch", "case-ratio", "join", "scalar"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage for one month — a
    conditional decimal sum over total decimal sum, scaled by 100 BEFORE
    the single IEEE division so both engines divide identical doubles.
    Part's join strategy is AQE's choice (it scales with SF); the month
    filter pushes to the lineitem scan."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    zero = F.lit(0).cast(DEC)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _vol()).otherwise(zero)
    ).cast("double")
    total = F.sum(_vol()).cast("double")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-03-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(((F.lit(100.0) * promo) / total).alias("promo_revenue"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_VOL_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "view", "scalar-subquery", "argmax"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    a derived revenue view consumed twice (per-supplier rows AND its
    own max as the filter threshold). The max arrives as a 1-row
    broadcast; revenue stays DECIMAL until after the equality compare,
    so ties and the argmax are exact, then casts to double at output."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol()).alias("total_revenue_dec"))
    )
    mx = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_dec") == F.col("max_rev"))
        .join(
            t["supplier"],
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH thr AS (
      SELECT l_partkey AS pk,
             0.2 * (CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE)
                    / COUNT(*)) AS qty_thr
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS {DEC})) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thr   ON thr.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < thr.qty_thr
    """,
    tags=("tpch", "correlated-scalar", "self-join", "avg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — each
    line compares against 20% of ITS part's average quantity (a
    correlated scalar decorrelated into a per-part aggregate joined
    back to the fact). The average is the catalog's pinned form
    (decimal sum cast double / count, one IEEE division), so the
    threshold is bit-identical cross-engine."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    thr = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(dec("l_quantity", 12, 2)).cast("double")
                    / F.count("*")
                )
            ).alias("qty_thr")
        )
    )
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_brand") == "Brand#3"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(thr, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            (F.sum(dec("l_extendedprice", 12, 2)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS {DEC})) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS {DEC})) > 200
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    """,
    tags=("tpch", "in-subquery", "having", "semi-join"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders totaling more than 200
    units — an IN over a grouped-HAVING subquery on the SAME fact,
    planned as a left-semi join of lineitem's re-aggregation against
    itself, then the 5-column rollup. Quantity sums stay decimal until
    output."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("_q"))
        .filter(F.col("_q") > 200)
        .select("l_orderkey")
    )
    return (
        t["lineitem"]
        .join(big, "l_orderkey", "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum(dec("l_quantity", 12, 2)).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_VOL_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "disjunction", "join-residual", "scalar"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a three-way disjunction of
    conjunct groups spanning BOTH join sides — the optimizer must
    extract the common join key and keep the mixed predicate as a join
    residual rather than expanding a cross product. Part's join is
    AQE's choice."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM lo l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM lo l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lo l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s.s_name
    """,
    tags=("tpch", "exists", "not-exists", "self-join", "semi-anti"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone kept finished multi-supplier
    orders waiting — EXISTS (another supplier participated) plus NOT
    EXISTS (no OTHER supplier was late) against the same fact, both
    with a key-inequality residual riding the order-key equi-join.
    "Late" adapts to the fixture as shipped >60 days after order date
    (no commit/receipt dates exist). Planned as one semi and one anti
    join over a shared late-flagged frame, then a distinct-order count
    per supplier."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier"])
    lo = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    l1 = lo.filter(F.col("is_late")).select("l_orderkey", "l_suppkey")
    l2 = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lo.filter(F.col("is_late")).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waited.join(
            t["supplier"],
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20 — the three shapes that need partsupp, which the fixture
# lacks. A derived supplier-part table preserves them:
#
#   partsupp := SELECT l_partkey, l_suppkey,
#                      MIN(decimal l_extendedprice) AS ps_supplycost,
#                      SUM(decimal l_quantity)      AS ps_availqty
#               FROM lineitem GROUP BY 1, 2
#
# ps_supplycost = the cheapest line price ever observed from that supplier
# for that part (a pure decimal MIN — order-independent, engine-exact; a
# unit-price division would round a true double and break the hash gate);
# ps_availqty = total quantity historically supplied. Every downstream
# comparison stays in exact decimal arithmetic.
# ---------------------------------------------------------------------------

_PS_SQL = f"""
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(l_extendedprice AS {DEC})) AS ps_supplycost,
             SUM(CAST(l_quantity AS {DEC}))      AS ps_availqty
      FROM lineitem GROUP BY 1, 2
"""


def _derived_partsupp(lineitem: DataFrame) -> DataFrame:
    """The lineitem-derived partsupp twin of ``_PS_SQL`` (module
    docstring): one uniform-key groupBy, partial-aggregable MIN/SUM, so
    at 100 TB it is a single map-combined shuffle on (part, supp)."""
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(dec("l_extendedprice", 12, 2)).alias("ps_supplycost"),
        F.sum(dec("l_quantity", 12, 2)).alias("ps_availqty"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL}),
    eligible AS (
      SELECT p.p_partkey, p.p_name, p.p_brand, ps.ps_suppkey,
             ps.ps_supplycost, s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN part p     ON p.p_partkey = ps.ps_partkey
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
    )
    SELECT e.p_partkey, e.p_name, e.p_brand,
           e.s_name, e.s_acctbal, e.n_name,
           CAST(e.ps_supplycost AS DOUBLE) AS min_cost
    FROM eligible e
    JOIN (
      SELECT p_partkey AS mk, MIN(ps_supplycost) AS mc
      FROM eligible GROUP BY 1
    ) m ON e.p_partkey = m.mk AND e.ps_supplycost = m.mc
    """,
    tags=("tpch", "correlated-min", "join", "derived-partsupp"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every PROMO size-15 part, the EUROPE
    supplier(s) offering it at minimum cost — a correlated-MIN
    subquery decorrelated into a re-join against a per-part MIN
    aggregate. The eligible frame is computed once and self-joined on
    (partkey, exact decimal cost); bounded dims broadcast and the
    SF-scaling ones are AQE's choice, so the heavy shuffles are the
    derived-partsupp groupBy and the per-part MIN."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"]
    )
    eligible = (
        _derived_partsupp(t["lineitem"])
        .join(
            t["part"].filter(
                (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
            ),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .join(
            t["supplier"],
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t["region"].filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "p_partkey", "p_name", "p_brand", "ps_supplycost",
            "s_name", "s_acctbal", "n_name",
        )
    )
    min_cost = eligible.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("mc")
    )
    return (
        eligible.join(
            min_cost,
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("mc")),
        )
        .select(
            "p_partkey", "p_name", "p_brand", "s_name", "s_acctbal",
            "n_name",
            F.col("ps_supplycost").cast("double").alias("min_cost"),
        )
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL}),
    natps AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS val
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM natps
    GROUP BY ps_partkey
    HAVING SUM(val) > (
      SELECT SUM(val) * CAST(0.002 AS DECIMAL(6,4)) FROM natps
    )
    """,
    tags=("tpch", "scalar-subquery", "having", "derived-partsupp"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_7 inventory value exceeds a
    fraction of the nation's total — a HAVING over a scalar subquery
    of the SAME aggregation input. The nation-filtered value frame is
    built once; the global total is a 1-row aggregate joined by
    (broadcast) cross so the threshold never leaves the plan. All
    value arithmetic (decimal cost x decimal qty, decimal x decimal
    fraction) is exact, so the comparison is engine-portable."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    natps = (
        _derived_partsupp(t["lineitem"])
        .join(
            t["supplier"],
            F.col("ps_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"),
        )
    )
    per_part = natps.groupBy("ps_partkey").agg(F.sum("val").alias("pv"))
    threshold = natps.agg(
        (F.sum("val") * F.lit(0.002).cast("decimal(6,4)")).alias("thr")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("pv") > F.col("thr"))
        .select(
            "ps_partkey", F.col("pv").cast("double").alias("part_value")
        )
    )


@query(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL}),
    shipped AS (
      SELECT l_partkey AS sk_part, l_suppkey AS sk_supp,
             SUM(CAST(l_quantity AS {DEC})) AS qty
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate <  DATE '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        JOIN shipped sh
          ON sh.sk_part = ps.ps_partkey AND sh.sk_supp = ps.ps_suppkey
        WHERE p.p_name LIKE 'small%'
          AND ps.ps_availqty > CAST(0.5 AS DECIMAL(2,1)) * sh.qty
      )
    """,
    tags=("tpch", "nested-in", "correlated", "derived-partsupp"),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers holding excess stock of
    'small%' parts — a nested IN whose inner query correlates the
    derived availqty against half of that (part, supplier)'s 1997
    shipped quantity. Decorrelated: the shipped-quantity aggregate
    joins the derived partsupp on its own grouping key (both sides
    already partitioned on (part, supp) — AQE reuses the
    co-partitioning), the excess predicate is exact decimal, and the
    supplier membership test is a left-semi join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("sk_part"),
            F.col("l_suppkey").alias("sk_supp"),
        )
        .agg(F.sum(dec("l_quantity", 12, 2)).alias("qty"))
    )
    excess = (
        _derived_partsupp(t["lineitem"])
        .join(
            t["part"].filter(F.col("p_name").like("small%")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .join(
            shipped,
            (F.col("sk_part") == F.col("ps_partkey"))
            & (F.col("sk_supp") == F.col("ps_suppkey")),
        )
        .filter(
            F.col("ps_availqty")
            > F.lit(0.5).cast("decimal(2,1)") * F.col("qty")
        )
        .select(F.col("ps_suppkey").alias("xk"))
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == F.col("xk"), "left_semi")
        .select("s_name", "n_name")
        .distinct()
    )


@query(
    "customer_lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice, t.o_orderdate
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
    tags=("sql", "lateral", "correlated-subquery", "topk-per-key"),
)
def customer_lateral_top_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    each customer's two most expensive orders, expressed in the SQL
    surface (both engines run the IDENTICAL query text: Spark through
    the temp-view sql() entry, DuckDB as the oracle). Catalyst
    decorrelates the lateral into a ranked join — per-group top-k
    without a driver loop; the (price desc, orderkey) tie-break is a
    unique total order so results are deterministic under any
    partitioning."""
    from ..sources.corpus import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice, t.o_orderdate
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice, o_orderdate FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


@query(
    "orders_null_safe_join",
    oracle="""
    WITH buckets AS (
      SELECT CASE WHEN o_custkey % 7 = 3 THEN NULL
                  ELSE o_custkey % 7 END AS k,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    dim AS (
      SELECT CASE WHEN i = 3 THEN NULL ELSE i END AS dk,
             'bucket_' || CAST(i AS VARCHAR) AS label
      FROM unnest(range(0, 7)) AS t(i)
    )
    SELECT d.label, b.k, b.n_orders
    FROM buckets b JOIN dim d ON b.k IS NOT DISTINCT FROM d.dk
    """,
    tags=("join", "null-safe", "eqNullSafe", "semantics"),
)
def orders_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (``eqNullSafe`` / SQL ``<=>`` /
    ``IS NOT DISTINCT FROM``): the derived bucket key is NULL for one
    residue class, and the null-safe condition matches it to the
    NULL-keyed dim row where a plain equi-join would drop it. Catalyst
    plans ``<=>`` as a hash-joinable key (Coalesce+IsNull wrapping), so
    the join stays a broadcast/shuffled HASH join — no nested loop.
    One keyed agg + one 7-row dim join."""
    from ..sources.corpus import load_table

    orders = load_table(spark, sf_dir, "orders")
    buckets = (
        orders.select(
            F.nullif(F.col("o_custkey") % 7, F.lit(3)).alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    dim = spark.range(7).select(
        F.nullif(F.col("id"), F.lit(3)).alias("dk"),
        F.concat(F.lit("bucket_"), F.col("id").cast("string")).alias(
            "label"
        ),
    )
    return buckets.join(dim, buckets["k"].eqNullSafe(dim["dk"])).select(
        "label", "k", "n_orders"
    )


@query(
    "window_distribution_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           PERCENT_RANK() OVER wd AS pct_rank,
           CUME_DIST() OVER wd AS cume_dist,
           NTH_VALUE(o_orderkey, 2) OVER wf AS second_orderkey,
           LAST_VALUE(o_orderkey) OVER wf AS latest_so_far
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "percent_rank", "cume_dist", "nth_value",
          "last_value"),
)
def window_distribution_functions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The distribution/positional window functions
    window_order_sequences doesn't cover: percent_rank and cume_dist
    over date-only ordering (ties exercised; each value is ONE IEEE
    division of identical integer rank/count operands — bit-portable),
    plus nth_value(2) and last_value over the explicit running ROWS
    frame (Spark's default frame for last_value is RANGE-to-current,
    which peers tie-groups — the explicit frame pins identical
    semantics in both engines). Both specs share the o_custkey
    exchange; wd's sort is a prefix of wf's."""
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 100 == 0
    )
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    wf = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(wd).alias("pct_rank"),
        F.cume_dist().over(wd).alias("cume_dist"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_orderkey"),
        F.last("o_orderkey").over(wf).alias("latest_so_far"),
    )
