"""Reference-parity tests for the star-schema job (SURVEY.md §5.4).

A deterministic synthetic AdventureWorks fixture (seeded, exercising every
semantic trap from FIXTURES.md §A: null personid customers, null
subcategory products, discounts that must NOT hit line_total, smallint-
overflowing quantity groups, multi-year dates incl. Sundays) is written to
a temp lake; the job publishes the warehouse; outputs are compared against
DuckDB SQL oracles over the same lake files, plus explicit semantic
assertions.
"""

from __future__ import annotations

import datetime as dt
import random
from decimal import Decimal

import pytest

from adventureworks_pysparkjobs_spark.jobs.star_schema import run_star_schema
from adventureworks_pysparkjobs_spark.schemas.adventureworks import TABLE_SCHEMAS
from adventureworks_pysparkjobs_spark.sinks.parquet import lake_path, write_lake_table

from .oracle_utils import compare_frames

TS0 = dt.datetime(2013, 5, 1)


def _guid(i: int) -> str:
    return f"00000000-0000-0000-0000-{i:012d}"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    rng = random.Random(42)
    base = str(tmp_path_factory.mktemp("advlake"))

    n_person, n_cust, n_prod, n_orders = 40, 60, 30, 120
    person = [
        (i, "IN", False, None, f"First{i}", None if i % 3 else "M.",
         f"Last{i}", None, i % 3, None, None, _guid(i), TS0)
        for i in range(1, n_person + 1)
    ]
    # ~25% store customers (null personid); some null territoryid
    customer = [
        (100 + i,
         None if i % 4 == 0 else (i % n_person) + 1,
         500 + i if i % 4 == 0 else None,
         None if i % 10 == 0 else (i % 5) + 1,
         _guid(i), TS0)
        for i in range(1, n_cust + 1)
    ]
    territory = [
        (t, f"Territory{t}", ["US", "CA", "FR", "DE", "AU"][t - 1],
         ["North America", "North America", "Europe", "Europe", "Pacific"][t - 1],
         Decimal("100.5"), Decimal("90.25"), Decimal("10.1"), Decimal("9.9"),
         _guid(t), TS0)
        for t in range(1, 6)
    ]
    category = [(c, f"Category{c}", _guid(c), TS0) for c in range(1, 4)]
    subcategory = [
        (s, ((s - 1) % 3) + 1, f"Subcat{s}", _guid(s), TS0) for s in range(1, 7)
    ]
    # ~40% uncategorized products (null productsubcategoryid)
    product = [
        (200 + i, f"Product{i}", f"PN-{i}", bool(i % 2), True,
         None if i % 5 == 0 else "Black",
         100, 75,
         Decimal(f"{10 + i}.{i % 100:02d}"), Decimal(f"{20 + i}.99"),
         None, None, None,
         None if i % 7 == 0 else Decimal(f"{i}.25"),
         3, None, None, None,
         None if i % 5 < 2 else (i % 6) + 1,  # 40% null subcategory
         None, TS0, None, None, _guid(i), TS0)
        for i in range(1, n_prod + 1)
    ]
    # Orders across 2 years incl. Sundays; ~10% null territory; repeated dates
    header = []
    for i in range(1, n_orders + 1):
        od = dt.datetime(2013, 1, 6) + dt.timedelta(days=(i * 7) % 730)
        header.append(
            (1000 + i, 1, od, od + dt.timedelta(days=7),
             od + dt.timedelta(days=3), 5, bool(i % 2), None,
             f"AW{i:08d}", 100 + (i % n_cust) + 1, None,
             None if i % 10 == 0 else (i % 5) + 1,
             1, 1, 1, None, None, None,
             Decimal(f"{100 + i}.50"), Decimal("8.04"), Decimal("2.51"),
             Decimal(f"{111 + i}.05"), None, _guid(i), TS0)
        )
    # Details: qty pairs designed to overflow smallint per (date, product)
    detail = []
    did = 1
    for i in range(1, n_orders + 1):
        for ln in range(rng.randint(1, 5)):
            qty = 30000 if (i % 20 == 0 and ln == 0) else rng.randint(1, 40)
            detail.append(
                (1000 + i, did, None, qty,
                 200 + ((i + ln) % n_prod) + 1, 1,
                 Decimal(f"{5 + (did % 50)}.{did % 100:02d}"),
                 Decimal("0.10") if did % 6 == 0 else Decimal("0"),
                 _guid(did), TS0)
            )
            did += 1
    # Two orders on the SAME date with the same product -> same (date, product)
    # group across orders; plus the 30000-qty rows force sum > smallint max.
    # order 1020 (i=20, ln=0) already has a 30000-qty line for product 221
    # on the same date -> this second line makes the group total 60000.
    detail.append((1020, did, None, 30000, 221, 1, Decimal("7.77"),
                   Decimal("0"), _guid(did), TS0))

    data = {
        ("person", "person"): person,
        ("sales", "customer"): customer,
        ("sales", "salesterritory"): territory,
        ("production", "productcategory"): category,
        ("production", "productsubcategory"): subcategory,
        ("production", "product"): product,
        ("sales", "salesorderheader"): header,
        ("sales", "salesorderdetail"): detail,
    }
    for (schema_name, table_name), rows in data.items():
        df = spark.createDataFrame(
            rows, schema=TABLE_SCHEMAS[f"{schema_name}.{table_name}"]
        )
        write_lake_table(df, base, schema_name, table_name)

    out_base = str(tmp_path_factory.mktemp("advwh"))
    run_star_schema(spark, base, out_base)
    return {"lake": base, "warehouse": out_base}


@pytest.fixture(scope="module")
def advduck(warehouse):
    import duckdb

    con = duckdb.connect()
    for schema_name, table_name in [
        ("person", "person"), ("sales", "customer"),
        ("sales", "salesterritory"), ("production", "product"),
        ("production", "productsubcategory"), ("production", "productcategory"),
        ("sales", "salesorderheader"), ("sales", "salesorderdetail"),
    ]:
        p = lake_path(warehouse["lake"], schema_name, table_name)
        con.execute(
            f"CREATE VIEW {table_name} AS SELECT * FROM '{p}/*.parquet'"
        )
    yield con
    con.close()


ORACLES = {
    "dim_customer": """
        SELECT c.customerid AS customer_key, p.firstname AS first_name,
               p.lastname AS last_name
        FROM customer c JOIN person p ON c.personid = p.businessentityid
        WHERE c.personid IS NOT NULL
    """,
    "dim_product": """
        SELECT p.productid AS product_key, p.name AS product_name,
               ps.name AS subcategory_name, pc.name AS category_name,
               p.standardcost AS standard_cost, p.listprice AS list_price
        FROM product p
        JOIN productsubcategory ps
          ON p.productsubcategoryid = ps.productsubcategoryid
        JOIN productcategory pc
          ON ps.productcategoryid = pc.productcategoryid
    """,
    "dim_territory": """
        SELECT territoryid AS territory_key, name AS territory_name,
               countryregioncode AS country_region_code,
               "group" AS territory_group
        FROM salesterritory
    """,
    "dim_date": """
        SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key, d AS date,
               CAST(EXTRACT(YEAR FROM d) AS INTEGER) AS year,
               CAST(EXTRACT(MONTH FROM d) AS INTEGER) AS month,
               CAST(EXTRACT(DAY FROM d) AS INTEGER) AS day,
               CAST(dayofweek(d) + 1 AS INTEGER) AS day_of_week
        FROM (SELECT DISTINCT CAST(orderdate AS DATE) AS d FROM salesorderheader)
    """,
    "fact_sales_detail": """
        SELECT soh.salesorderid AS sales_order_id,
               sod.salesorderdetailid AS sales_order_detail_id,
               CAST(strftime(CAST(soh.orderdate AS DATE), '%Y%m%d') AS INTEGER)
                   AS date_key,
               soh.customerid AS customer_key,
               sod.productid AS product_key,
               soh.territoryid AS territory_key,
               CAST(sod.orderqty AS SMALLINT) AS order_quantity,
               sod.unitprice AS unit_price,
               sod.unitpricediscount AS unit_price_discount,
               CAST(CAST(sod.orderqty AS DECIMAL(18,0)) *
                    CAST(sod.unitprice AS DECIMAL(18,4)) AS DECIMAL(38,6))
                   AS line_total
        FROM salesorderdetail sod
        JOIN salesorderheader soh ON sod.salesorderid = soh.salesorderid
    """,
    "fact_sales_agg_daily_product": """
        WITH f AS (
          SELECT CAST(strftime(CAST(soh.orderdate AS DATE), '%Y%m%d') AS INTEGER)
                     AS date_key,
                 sod.productid AS product_key,
                 CAST(sod.orderqty AS BIGINT) AS q,
                 CAST(CAST(sod.orderqty AS DECIMAL(18,0)) *
                      CAST(sod.unitprice AS DECIMAL(18,4)) AS DECIMAL(38,6)) AS lt
          FROM salesorderdetail sod
          JOIN salesorderheader soh ON sod.salesorderid = soh.salesorderid
        )
        SELECT date_key, product_key,
               CAST(SUM(q) AS BIGINT) AS total_quantity_sold,
               CAST(SUM(lt) AS DECIMAL(38,6)) AS total_revenue
        FROM f GROUP BY 1, 2
    """,
}


@pytest.mark.parametrize("table", sorted(ORACLES))
def test_warehouse_table_matches_oracle(spark, warehouse, advduck, table):
    out = spark.read.parquet(f"{warehouse['warehouse']}/{table}")
    problems = compare_frames(out, advduck.sql(ORACLES[table]))
    assert not problems, f"{table}: " + "\n".join(problems)


def test_inner_join_drops(spark, warehouse, advduck):
    """Store-only customers and uncategorized products vanish (reference
    semantics: transform_to_bq.py:103-104, :113)."""
    dim_c = spark.read.parquet(f"{warehouse['warehouse']}/dim_customer")
    dim_p = spark.read.parquet(f"{warehouse['warehouse']}/dim_product")
    n_cust = advduck.sql("SELECT count(*) FROM customer").fetchone()[0]
    n_prod = advduck.sql("SELECT count(*) FROM product").fetchone()[0]
    assert 0 < dim_c.count() < n_cust
    assert 0 < dim_p.count() < n_prod


def test_dim_date_sparse_and_dow(spark, warehouse):
    """dim_date = observed dates only; 2013-01-06 was a Sunday -> 1."""
    dd = spark.read.parquet(f"{warehouse['warehouse']}/dim_date")
    rows = {r["date"]: r for r in dd.collect()}
    assert dt.date(2013, 1, 13) in rows
    assert rows[dt.date(2013, 1, 13)]["day_of_week"] == 1  # Sunday
    assert rows[dt.date(2013, 1, 13)]["date_key"] == 20130113


def test_line_total_is_gross(spark, warehouse):
    """Discounted rows still have line_total = qty * unitprice
    (transform_to_bq.py:155 carries the discount but never applies it)."""
    f = spark.read.parquet(f"{warehouse['warehouse']}/fact_sales_detail")
    discounted = f.filter("unit_price_discount > 0").limit(5).collect()
    assert discounted
    for r in discounted:
        assert r["line_total"] == (
            Decimal(r["order_quantity"]) * r["unit_price"]
        ).quantize(Decimal("0.000001"))


def test_sum_widens_past_smallint(spark, warehouse):
    """orderqty is smallint; per-(date,product) totals exceed 32767 and
    land in the declared LongType (transform_to_bq.py:71)."""
    agg = spark.read.parquet(
        f"{warehouse['warehouse']}/fact_sales_agg_daily_product"
    )
    assert dict(agg.dtypes)["total_quantity_sold"] == "bigint"
    assert agg.filter("total_quantity_sold > 32767").count() > 0
