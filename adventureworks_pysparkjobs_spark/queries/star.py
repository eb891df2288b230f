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

Decimal rule: arithmetic is pinned to DECIMAL (exact, order-independent);
every final decimal measure is cast to DOUBLE on both sides (see
queries/catalog.py).

``dim_customer_geo`` additionally runs the full K1-K3 sink seam
(enforce_schema → overwrite parquet publish → read-back), so the
warehouse-write path gets a driver-checked correctness row, not just unit
tests.

The AdventureWorks-schema versions of the same builds (bit-for-bit parity
with the reference's own tables) live in jobs/star_schema.py.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.relational import dec
from ..sinks.parquet import write_warehouse_table
from ..sources.corpus import load_table
from .catalog import query

D = "DECIMAL(12,2)"

# Declared publish schema for the customer dimension (the K3 contract the
# sink enforces: cast + non-nullable key guard).
DIM_CUSTOMER_GEO_SCHEMA = T.StructType(
    [
        T.StructField("customer_key", T.LongType(), nullable=False),
        T.StructField("customer_name", T.StringType()),
        T.StructField("market_segment", T.StringType()),
        T.StructField("nation_name", T.StringType()),
        T.StructField("region_name", T.StringType()),
    ]
)

# Lake/warehouse roundtrip area for driver-run queries (inside the repo —
# the only writable base in this environment).
_WAREHOUSE_BASE = str(Path(__file__).resolve().parents[2] / "spark-warehouse" / "driver_roundtrip")


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
    tags=("star", "dim", "join", "sink"),
)
def dim_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension: snowflake flatten (customer→nation→region),
    the dim_product build shape of the reference
    (transform_to_bq.py:112-122) — two broadcast hash joins, zero shuffles
    of the fact-sized side. The result is PUBLISHED through the warehouse
    sink (enforce_schema + mode("overwrite") parquet, the reference's
    write seam transform_to_bq.py:85-91 / db_to_parquet.py:166) and read
    back, so the sink path itself is under the correctness oracle."""
    cu = load_table(spark, sf_dir, "customer").alias("c")
    na = load_table(spark, sf_dir, "nation").alias("n")
    rg = load_table(spark, sf_dir, "region").alias("r")
    dim = (
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
    path = write_warehouse_table(
        dim, _WAREHOUSE_BASE, "dim_customer_geo", DIM_CUSTOMER_GEO_SCHEMA
    )
    return spark.read.parquet(path)


@query(
    "dim_part",
    oracle="""
    SELECT p_partkey AS part_key,
           p_name AS part_name,
           p_brand AS brand,
           p_type AS part_type,
           p_size AS part_size,
           p_retailprice AS retail_price
    FROM part
    """,
    tags=("star", "dim", "project"),
)
def dim_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only dimension (the dim_territory shape,
    transform_to_bq.py:125-130): rename + type pinning, no joins.
    retail_price is carried as the source DOUBLE (no aggregation happens,
    so there is no exactness to protect — and float output renders
    identically everywhere)."""
    pa = load_table(spark, sf_dir, "part")
    return pa.select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_name").alias("part_name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("p_retailprice").alias("retail_price"),
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
           l.l_quantity AS quantity,
           l.l_extendedprice AS extended_price,
           l.l_discount AS discount,
           CAST(CAST(l.l_quantity AS {D}) * CAST(l.l_extendedprice AS {D})
                AS DOUBLE) AS line_total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("star", "fact", "join", "arith"),
    bench=True,
)
def fact_order_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-grain fact: the fact_sales_detail build
    (transform_to_bq.py:143-156) — header⋈detail join, smart date key,
    and a *gross* line_total (quantity x price; discount carried, unapplied
    — the reference's deliberate semantic at :155). The product is
    computed in exact DECIMAL then cast to DOUBLE for output; the carried
    measures stay source DOUBLEs (no arithmetic on them here)."""
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
            F.col("l.l_quantity").alias("quantity"),
            F.col("l.l_extendedprice").alias("extended_price"),
            F.col("l.l_discount").alias("discount"),
            (dec("l.l_quantity", 12, 2) * dec("l.l_extendedprice", 12, 2))
            .cast("double")
            .alias("line_total"),
        )
    )


@query(
    "fact_daily_part_agg",
    oracle=f"""
    SELECT CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y%m%d') AS INTEGER) AS date_key,
           l.l_partkey AS part_key,
           CAST(SUM(CAST(l.l_quantity AS {D})) AS DOUBLE) AS total_quantity_sold,
           CAST(SUM(CAST(l.l_quantity AS {D}) * CAST(l.l_extendedprice AS {D}))
                AS DOUBLE) AS total_revenue
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
    frame; standalone, this is a single join + partial/final hash agg.
    Sums run in exact DECIMAL (cast of the inputs, never of the double
    product) and convert to DOUBLE only at output."""
    li = load_table(spark, sf_dir, "lineitem").alias("l")
    od = load_table(spark, sf_dir, "orders").alias("o")
    qty = dec("l.l_quantity", 12, 2)
    price = dec("l.l_extendedprice", 12, 2)
    return (
        li.join(od, F.col("l.l_orderkey") == F.col("o.o_orderkey"), "inner")
        .groupBy(
            F.date_format(F.to_date("o.o_orderdate"), "yyyyMMdd")
            .cast("int")
            .alias("date_key"),
            F.col("l.l_partkey").alias("part_key"),
        )
        .agg(
            F.sum(qty).cast("double").alias("total_quantity_sold"),
            F.sum(qty * price).cast("double").alias("total_revenue"),
        )
    )
