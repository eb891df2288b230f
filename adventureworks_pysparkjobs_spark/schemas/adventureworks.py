"""Explicit schema registry for the AdventureWorks pipeline.

Re-declares the reference's load-time contracts: the 8 OLTP ingest schemas
(reference: code_base/db_to_parquet.py:29-144, TABLES_TO_INGEST :17-26) and
the 6 warehouse output schemas (code_base/transform_to_bq.py:28-74).
Types preserved exactly — ShortType smallints stay smallint, money is
DecimalType(38,18) (the Postgres numeric mapping; never double), computed
money is DecimalType(38,6), rowguids/XML blobs are strings.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


MONEY = DecimalType(38, 18)

TABLES_TO_INGEST: list[tuple[str, str]] = [
    ("person", "person"),
    ("sales", "customer"),
    ("sales", "salesterritory"),
    ("production", "product"),
    ("production", "productsubcategory"),
    ("production", "productcategory"),
    ("sales", "salesorderheader"),
    ("sales", "salesorderdetail"),
]

TABLE_SCHEMAS: dict[str, StructType] = {
    # db_to_parquet.py:30-56
    "sales.salesorderheader": StructType([
        _f("salesorderid", IntegerType()),
        _f("revisionnumber", ShortType()),
        _f("orderdate", TimestampType()),
        _f("duedate", TimestampType()),
        _f("shipdate", TimestampType()),
        _f("status", ShortType()),
        _f("onlineorderflag", BooleanType()),
        _f("purchaseordernumber", StringType()),
        _f("accountnumber", StringType()),
        _f("customerid", IntegerType()),
        _f("salespersonid", IntegerType()),
        _f("territoryid", IntegerType()),
        _f("billtoaddressid", IntegerType()),
        _f("shiptoaddressid", IntegerType()),
        _f("shipmethodid", IntegerType()),
        _f("creditcardid", IntegerType()),
        _f("creditcardapprovalcode", StringType()),
        _f("currencyrateid", IntegerType()),
        _f("subtotal", MONEY),
        _f("taxamt", MONEY),
        _f("freight", MONEY),
        _f("totaldue", MONEY),
        _f("comment", StringType()),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:57-68
    "sales.salesorderdetail": StructType([
        _f("salesorderid", IntegerType()),
        _f("salesorderdetailid", IntegerType()),
        _f("carriertrackingnumber", StringType()),
        _f("orderqty", ShortType()),
        _f("productid", IntegerType()),
        _f("specialofferid", IntegerType()),
        _f("unitprice", MONEY),
        _f("unitpricediscount", MONEY),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:69-76
    "sales.customer": StructType([
        _f("customerid", IntegerType()),
        _f("personid", IntegerType()),
        _f("storeid", IntegerType()),
        _f("territoryid", IntegerType()),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:77-91
    "person.person": StructType([
        _f("businessentityid", IntegerType()),
        _f("persontype", StringType()),
        _f("namestyle", BooleanType()),
        _f("title", StringType()),
        _f("firstname", StringType()),
        _f("middlename", StringType()),
        _f("lastname", StringType()),
        _f("suffix", StringType()),
        _f("emailpromotion", IntegerType()),
        _f("additionalcontactinfo", StringType()),
        _f("demographics", StringType()),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:92-103 — note reserved-word column "group"
    "sales.salesterritory": StructType([
        _f("territoryid", IntegerType()),
        _f("name", StringType()),
        _f("countryregioncode", StringType()),
        _f("group", StringType()),
        _f("salesytd", MONEY),
        _f("saleslastyear", MONEY),
        _f("costytd", MONEY),
        _f("costlastyear", MONEY),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:104-130
    "production.product": StructType([
        _f("productid", IntegerType()),
        _f("name", StringType()),
        _f("productnumber", StringType()),
        _f("makeflag", BooleanType()),
        _f("finishedgoodsflag", BooleanType()),
        _f("color", StringType()),
        _f("safetystocklevel", ShortType()),
        _f("reorderpoint", ShortType()),
        _f("standardcost", MONEY),
        _f("listprice", MONEY),
        _f("size", StringType()),
        _f("sizeunitmeasurecode", StringType()),
        _f("weightunitmeasurecode", StringType()),
        _f("weight", DecimalType(8, 2)),
        _f("daystomanufacture", IntegerType()),
        _f("productline", StringType()),
        _f("class", StringType()),
        _f("style", StringType()),
        _f("productsubcategoryid", IntegerType()),
        _f("productmodelid", IntegerType()),
        _f("sellstartdate", TimestampType()),
        _f("sellenddate", TimestampType()),
        _f("discontinueddate", TimestampType()),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:131-137
    "production.productsubcategory": StructType([
        _f("productsubcategoryid", IntegerType()),
        _f("productcategoryid", IntegerType()),
        _f("name", StringType()),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
    # db_to_parquet.py:138-143
    "production.productcategory": StructType([
        _f("productcategoryid", IntegerType()),
        _f("name", StringType()),
        _f("rowguid", StringType()),
        _f("modifieddate", TimestampType()),
    ]),
}

# transform_to_bq.py:28-74 — output contracts. Nullability is *enforced*
# by our sink (sinks/parquet.py uses operators.relational.enforce_schema),
# unlike the reference where False flags were documentation only.
WAREHOUSE_SCHEMAS: dict[str, StructType] = {
    "dim_customer": StructType([
        _f("customer_key", IntegerType(), False),
        _f("first_name", StringType()),
        _f("last_name", StringType()),
    ]),
    "dim_product": StructType([
        _f("product_key", IntegerType(), False),
        _f("product_name", StringType()),
        _f("subcategory_name", StringType()),
        _f("category_name", StringType()),
        _f("standard_cost", MONEY),
        _f("list_price", MONEY),
    ]),
    "dim_territory": StructType([
        _f("territory_key", IntegerType(), False),
        _f("territory_name", StringType()),
        _f("country_region_code", StringType()),
        _f("territory_group", StringType()),
    ]),
    "dim_date": StructType([
        _f("date_key", IntegerType(), False),
        _f("date", DateType()),
        _f("year", IntegerType()),
        _f("month", IntegerType()),
        _f("day", IntegerType()),
        _f("day_of_week", IntegerType()),
    ]),
    "fact_sales_detail": StructType([
        _f("sales_order_id", IntegerType(), False),
        _f("sales_order_detail_id", IntegerType(), False),
        _f("date_key", IntegerType()),
        _f("customer_key", IntegerType(), False),
        _f("product_key", IntegerType(), False),
        _f("territory_key", IntegerType()),
        _f("order_quantity", ShortType()),
        _f("unit_price", MONEY),
        _f("unit_price_discount", MONEY),
        _f("line_total", DecimalType(38, 6)),
    ]),
    "fact_sales_agg_daily_product": StructType([
        _f("date_key", IntegerType(), False),
        _f("product_key", IntegerType(), False),
        _f("total_quantity_sold", LongType()),
        _f("total_revenue", DecimalType(38, 6)),
    ]),
}
