"""Star-schema warehouse job: AdventureWorks OLTP -> 4 dims + 2 facts.

Re-expresses the reference transform (code_base/transform_to_bq.py:94-169)
as pure, individually-testable DataFrame->DataFrame functions with the
reference's exact semantics:

- inner joins DROP unmatched rows: store-only customers (null personid,
  filter at transform_to_bq.py:103 + join :104) and uncategorized products
  (null productsubcategoryid, join :113) vanish from their dims — intended
  behavior, preserved bit-for-bit;
- dim_date contains only *observed* order dates (DISTINCT, :133-135), not
  a dense calendar; date_key is yyyyMMdd cast to int (:137);
- fact line_total is GROSS orderqty*unitprice — unitpricediscount is
  carried but deliberately not applied (:155);
- the daily aggregate reuses the detail build; unlike the reference —
  which recomputes the detail join because it re-fires the lazy plan per
  write action (SURVEY.md §4.4) — run_star_schema caches the detail frame
  across its two consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas.adventureworks import WAREHOUSE_SCHEMAS
from ..sinks.parquet import read_lake_table, write_warehouse_table


def build_dim_customer(customer: DataFrame, person: DataFrame) -> DataFrame:
    """Person-backed customers only (transform_to_bq.py:102-109)."""
    c = customer.alias("c")
    p = person.alias("p")
    return (
        c.filter(F.col("c.personid").isNotNull())
        .join(p, F.col("c.personid") == F.col("p.businessentityid"), "inner")
        .select(
            F.col("c.customerid").alias("customer_key"),
            F.col("p.firstname").alias("first_name"),
            F.col("p.lastname").alias("last_name"),
        )
    )


def build_dim_product(
    product: DataFrame, subcategory: DataFrame, category: DataFrame
) -> DataFrame:
    """Snowflake flatten product->subcategory->category
    (transform_to_bq.py:112-122); both hops inner, both dims broadcast."""
    p = product.alias("p")
    ps = F.broadcast(subcategory).alias("ps")
    pc = F.broadcast(category).alias("pc")
    return (
        p.join(
            ps,
            F.col("p.productsubcategoryid") == F.col("ps.productsubcategoryid"),
            "inner",
        )
        .join(
            pc,
            F.col("ps.productcategoryid") == F.col("pc.productcategoryid"),
            "inner",
        )
        .select(
            F.col("p.productid").alias("product_key"),
            F.col("p.name").alias("product_name"),
            F.col("ps.name").alias("subcategory_name"),
            F.col("pc.name").alias("category_name"),
            F.col("p.standardcost").alias("standard_cost"),
            F.col("p.listprice").alias("list_price"),
        )
    )


def build_dim_territory(territory: DataFrame) -> DataFrame:
    """Projection-only dim; note the reserved-word source column "group"
    (transform_to_bq.py:125-130)."""
    return territory.select(
        F.col("territoryid").alias("territory_key"),
        F.col("name").alias("territory_name"),
        F.col("countryregioncode").alias("country_region_code"),
        F.col("group").alias("territory_group"),
    )


def build_dim_date(header: DataFrame) -> DataFrame:
    """Sparse calendar of observed order dates (transform_to_bq.py:133-140);
    day_of_week is Spark semantics, 1=Sunday."""
    return (
        header.select(F.to_date(F.col("orderdate")).alias("date"))
        .distinct()
        .select(
            F.date_format(F.col("date"), "yyyyMMdd").cast("int").alias("date_key"),
            F.col("date"),
            F.year("date").alias("year"),
            F.month("date").alias("month"),
            F.dayofmonth("date").alias("day"),
            F.dayofweek("date").alias("day_of_week"),
        )
    )


def build_fact_sales_detail(detail: DataFrame, header: DataFrame) -> DataFrame:
    """Order-line-grain fact (transform_to_bq.py:143-156). line_total =
    orderqty * unitprice — GROSS by design; Short x Decimal(38,18) widens
    per Spark decimal rules, pinned to Decimal(38,6) at the sink."""
    sod = detail.alias("sod")
    soh = header.alias("soh")
    return (
        sod.join(
            soh, F.col("sod.salesorderid") == F.col("soh.salesorderid"), "inner"
        )
        .select(
            F.col("soh.salesorderid").alias("sales_order_id"),
            F.col("sod.salesorderdetailid").alias("sales_order_detail_id"),
            F.date_format(F.to_date(F.col("soh.orderdate")), "yyyyMMdd")
            .cast("int")
            .alias("date_key"),
            F.col("soh.customerid").alias("customer_key"),
            F.col("sod.productid").alias("product_key"),
            F.col("soh.territoryid").alias("territory_key"),
            F.col("sod.orderqty").alias("order_quantity"),
            F.col("sod.unitprice").alias("unit_price"),
            F.col("sod.unitpricediscount").alias("unit_price_discount"),
            (F.col("sod.orderqty") * F.col("sod.unitprice")).alias("line_total"),
        )
    )


def build_fact_sales_agg_daily_product(fact_detail: DataFrame) -> DataFrame:
    """Day x product rollup (transform_to_bq.py:160-165). sum(ShortType)
    -> LongType and sum(Decimal) widening match the declared output
    schema."""
    return fact_detail.groupBy("date_key", "product_key").agg(
        F.sum("order_quantity").alias("total_quantity_sold"),
        F.sum("line_total").alias("total_revenue"),
    )


def build_all(sources: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """All six warehouse tables from a dict of source DataFrames keyed by
    bare table name (the read_source_tables shape, transform_to_bq.py:77-83)."""
    fact_detail = build_fact_sales_detail(
        sources["salesorderdetail"], sources["salesorderheader"]
    )
    return {
        "dim_customer": build_dim_customer(sources["customer"], sources["person"]),
        "dim_product": build_dim_product(
            sources["product"],
            sources["productsubcategory"],
            sources["productcategory"],
        ),
        "dim_territory": build_dim_territory(sources["salesterritory"]),
        "dim_date": build_dim_date(sources["salesorderheader"]),
        "fact_sales_detail": fact_detail,
        "fact_sales_agg_daily_product": build_fact_sales_agg_daily_product(
            fact_detail
        ),
    }


def run_star_schema(
    spark: SparkSession,
    lake_base: str,
    warehouse_base: str,
    fmt: str = "parquet",
) -> dict[str, str]:
    """End-to-end warehouse publish: lake parquet -> 6 enforced tables.

    Differences vs the reference main (transform_to_bq.py:94-169), each a
    deliberate scale/correctness upgrade:
    - fact_sales_detail is cache()'d before its two consumers, so the
      detail join executes once, not once per downstream write (§4.4);
    - every output goes through schema *enforcement* (cast + nullability
      guard), not just column reordering (§1.3).
    Full-refresh overwrite semantics are preserved.
    """
    names = [
        ("person", "person"),
        ("sales", "customer"),
        ("sales", "salesterritory"),
        ("production", "product"),
        ("production", "productsubcategory"),
        ("production", "productcategory"),
        ("sales", "salesorderheader"),
        ("sales", "salesorderdetail"),
    ]
    sources = {
        t: read_lake_table(spark, lake_base, s, t) for s, t in names
    }
    tables = build_all(sources)
    tables["fact_sales_detail"] = tables["fact_sales_detail"].cache()
    tables["fact_sales_agg_daily_product"] = build_fact_sales_agg_daily_product(
        tables["fact_sales_detail"]
    )
    out = {}
    for name, df in tables.items():
        out[name] = write_warehouse_table(
            df, warehouse_base, name, WAREHOUSE_SCHEMAS[name], fmt=fmt
        )
    tables["fact_sales_detail"].unpersist()
    return out
