"""Lake + warehouse sinks.

The reference's sinks are a flat-directory Parquet overwrite
(reference: code_base/db_to_parquet.py:166, layout :196) and a BigQuery
overwrite behind a column-reorder projection (code_base/transform_to_bq.py:85-91).
This module keeps the same seams but portable and scale-aware:

- the lake write can partition by a column (facts by date) so downstream
  reads get partition pruning — the reference's flat layout can't
  (SURVEY.md §4.1 'partition pruning: n/a');
- the warehouse write *enforces* the declared schema (select + cast +
  nullability guard via operators.relational.enforce_schema) instead of
  only reordering columns;
- the warehouse format is pluggable ('parquet' locally; a
  spark-bigquery-connector format string drops in unchanged when the jar
  is on the classpath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..operators.relational import enforce_schema


def lake_path(base: str, schema_name: str, table_name: str) -> str:
    # Same layout as the reference lake: {base}/parquet/{schema}/{table}
    # (db_to_parquet.py:196, mirrored on read transform_to_bq.py:81).
    return f"{base}/parquet/{schema_name}/{table_name}"


def write_lake_table(
    df: DataFrame,
    base: str,
    schema_name: str,
    table_name: str,
    partition_by: str | None = None,
) -> str:
    path = lake_path(base, schema_name, table_name)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)
    return path


def read_lake_table(
    spark: SparkSession, base: str, schema_name: str, table_name: str
) -> DataFrame:
    return spark.read.parquet(lake_path(base, schema_name, table_name))


def write_warehouse_table(
    df: DataFrame,
    base: str,
    table_name: str,
    schema: StructType,
    fmt: str = "parquet",
) -> str:
    """Publish a dim/fact table: enforce the declared output schema, then
    overwrite-write. ``fmt='parquet'`` locally; in a GCP deployment pass
    ``fmt='bigquery'`` plus writer options — the seam matches the
    reference's write_to_bigquery."""
    out = enforce_schema(df, schema)
    path = f"{base}/{table_name}"
    if fmt == "versioned":
        # atomic publish: readers never observe a half-written table
        # (sinks/versioned.py — the isolation the reference gets from
        # BigQuery and a plain parquet overwrite lacks); read back with
        # versioned.read_latest
        from .versioned import publish_version

        publish_version(out, path)
    elif fmt == "parquet":
        out.write.mode("overwrite").parquet(path)
    else:
        out.write.format(fmt).mode("overwrite").save(path)
    return path
