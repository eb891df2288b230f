"""Star-schema builds on the corpus — reference-parity query shapes.

These re-express the reference's warehouse transform
(reference: code_base/transform_to_bq.py:99-167) on the driver corpus:
orders↔salesorderheader, lineitem↔salesorderdetail, customer/nation/region↔
customer/territory hierarchy, part↔product. Semantics preserved from the
reference: inner joins drop unmatched rows (§2.4), dim_date is the DISTINCT
set of observed dates, not a dense calendar (transform_to_bq.py:133-135),
the smart date key is yyyyMMdd cast to int (transform_to_bq.py:137), and
line_total is gross quantity*price with the discount column carried but
unapplied (transform_to_bq.py:155).

The AdventureWorks-schema versions of the same builds (bit-for-bit parity
with the reference's own tables) live in jobs/star_schema.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import dec
from ..sources.corpus import load_table
from .catalog import query

D = "DECIMAL(12,2)"


@query(
    "dim_customer_geo",
    oracle="""
    SELECT c.c_custkey AS customer_key,
           c.c_name AS customer_name,
           c.c_mktsegment AS market_segment,
           n.n_name AS nation_name,
           r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("star", "dim", "join"),
)
def dim_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension: snowflake flatten (customer→nation→region),
    the dim_product build shape of the reference
    (transform_to_bq.py:112-122) — two broadcast hash joins, zero shuffles
    of the fact-sized side."""
    cu = load_table(spark, sf_dir, "customer").alias("c")
    na = load_table(spark, sf_dir, "nation").alias("n")
    rg = load_table(spark, sf_dir, "region").alias("r")
    return (
        cu.join(F.broadcast(na), F.col("c.c_nationkey") == F.col("n.n_nationkey"), "inner")
        .join(F.broadcast(rg), F.col("n.n_regionkey") == F.col("r.r_regionkey"), "inner")
        .select(
            F.col("c.c_custkey").alias("customer_key"),
            F.col("c.c_name").alias("customer_name"),
            F.col("c.c_mktsegment").alias("market_segment"),
            F.col("n.n_name").alias("nation_name"),
            F.col("r.r_name").alias("region_name"),
        )
    )


@query(
    "dim_part",
    oracle=f"""
    SELECT p_partkey AS part_key,
           p_name AS part_name,
           p_brand AS brand,
           p_type AS part_type,
           p_size AS part_size,
           CAST(p_retailprice AS {D}) AS retail_price
    FROM part
    """,
    tags=("star", "dim", "project"),
)
def dim_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only dimension (the dim_territory shape,
    transform_to_bq.py:125-130): rename + type pinning, no joins."""
    pa = load_table(spark, sf_dir, "part")
    return pa.select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        dec("p_retailprice", 12, 2).alias("retail_price"),
    )


@query(
    "dim_date",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
           d AS date,
           CAST(EXTRACT(YEAR FROM d) AS INTEGER) AS year,
           CAST(EXTRACT(MONTH FROM d) AS INTEGER) AS month,
           CAST(EXTRACT(DAY FROM d) AS INTEGER) AS day,
           CAST(dayofweek(d) + 1 AS INTEGER) AS day_of_week
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    """,
    tags=("star", "dim", "distinct", "date"),
)
def dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date dimension from *observed* order dates only (sparse calendar —
    reference semantic, transform_to_bq.py:133-140), with the yyyyMMdd
    smart key and Spark's 1=Sunday day_of_week."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.select(F.to_date("o_orderdate").alias("date"))
        .distinct()
        .select(
            F.date_format("date", "yyyyMMdd").cast("int").alias("date_key"),
            F.col("date"),
            F.year("date").alias("year"),
            F.month("date").alias("month"),
            F.dayofmonth("date").alias("day"),
            F.dayofweek("date").alias("day_of_week"),
        )
    )


@query(
    "fact_order_line",
    oracle=f"""
    SELECT o.o_orderkey AS order_key,
           l.l_linenumber AS line_number,
           CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y%m%d') AS INTEGER) AS date_key,
           o.o_custkey AS customer_key,
           l.l_partkey AS part_key,
           l.l_suppkey AS supplier_key,
           CAST(l.l_quantity AS {D}) AS quantity,
           CAST(l.l_extendedprice AS {D}) AS extended_price,
           CAST(l.l_discount AS {D}) AS discount,
           CAST(CAST(l.l_quantity AS {D}) * CAST(l.l_extendedprice AS {D})
                AS DECIMAL(38,4)) AS line_total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("star", "fact", "join", "arith"),
    bench=True,
)
def fact_order_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-grain fact: the fact_sales_detail build
    (transform_to_bq.py:143-156) — header⋈detail join, smart date key,
    and a *gross* line_total (quantity x price; discount carried, unapplied
    — the reference's deliberate semantic at :155)."""
    li = load_table(spark, sf_dir, "lineitem").alias("l")
    od = load_table(spark, sf_dir, "orders").alias("o")
    return (
        li.join(od, F.col("l.l_orderkey") == F.col("o.o_orderkey"), "inner")
        .select(
            F.col("o.o_orderkey").alias("order_key"),
            F.col("l.l_linenumber").alias("line_number"),
            F.date_format(F.to_date("o.o_orderdate"), "yyyyMMdd")
            .cast("int")
            .alias("date_key"),
            F.col("o.o_custkey").alias("customer_key"),
            F.col("l.l_partkey").alias("part_key"),
            F.col("l.l_suppkey").alias("supplier_key"),
            dec("l.l_quantity", 12, 2).alias("quantity"),
            dec("l.l_extendedprice", 12, 2).alias("extended_price"),
            dec("l.l_discount", 12, 2).alias("discount"),
            (dec("l.l_quantity", 12, 2) * dec("l.l_extendedprice", 12, 2))
            .cast("decimal(38,4)")
            .alias("line_total"),
        )
    )


@query(
    "fact_daily_part_agg",
    oracle=f"""
    SELECT CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y%m%d') AS INTEGER) AS date_key,
           l.l_partkey AS part_key,
           SUM(CAST(l.l_quantity AS {D})) AS total_quantity_sold,
           SUM(CAST(l.l_quantity AS {D}) * CAST(l.l_extendedprice AS {D})) AS total_revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    tags=("star", "fact", "agg"),
    bench=True,
)
def fact_daily_part_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day x part rollup of the line fact (transform_to_bq.py:160-165).

    Unlike the reference — which recomputes the detail join for the
    aggregate because it reuses the lazy DataFrame without caching
    (SURVEY.md §4.4) — callers composing both facts should cache the detail
    frame; standalone, this is a single join + partial/final hash agg."""
    fact = fact_order_line(spark, sf_dir)
    return fact.groupBy("date_key", "part_key").agg(
        F.sum("quantity").cast("decimal(38,2)").alias("total_quantity_sold"),
        F.sum("line_total").cast("decimal(38,4)").alias("total_revenue"),
    )
