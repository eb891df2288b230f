from .parquet import read_lake_table, write_lake_table, write_warehouse_table

__all__ = ["read_lake_table", "write_lake_table", "write_warehouse_table"]
