from .maintenance import (
    clustered_write,
    compact_lake_table,
    directory_bytes,
    refresh_partitions,
)
from .parquet import read_lake_table, write_lake_table, write_warehouse_table

__all__ = [
    "clustered_write",
    "compact_lake_table",
    "directory_bytes",
    "read_lake_table",
    "refresh_partitions",
    "write_lake_table",
    "write_warehouse_table",
]
