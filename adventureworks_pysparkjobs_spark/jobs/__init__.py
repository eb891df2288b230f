from .star_schema import (
    build_dim_customer,
    build_dim_date,
    build_dim_product,
    build_dim_territory,
    build_fact_sales_agg_daily_product,
    build_fact_sales_detail,
    run_star_schema,
)

__all__ = [
    "build_dim_customer",
    "build_dim_date",
    "build_dim_product",
    "build_dim_territory",
    "build_fact_sales_agg_daily_product",
    "build_fact_sales_detail",
    "run_star_schema",
]
