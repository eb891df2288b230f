"""adventureworks_pysparkjobs_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo AliaksandraCherkas/adventureworks-pysparkjobs (two PySpark
jobs: JDBC ingest -> Parquet lake, Parquet -> star-schema warehouse
publish), extended with the operators a large-scale (100 TB) LLM training
data pipeline needs: deduplication, similarity search, text analysis,
multimodal columns and structured streaming.

Layers
------
- ``session``    : SparkSession factory with scale-aware defaults (AQE, UTC).
- ``schemas``    : explicit StructType registries (ingest + warehouse + corpus).
- ``sources``    : parquet lake / partitioned JDBC / binary-file readers.
- ``sinks``      : schema-enforcing writers (select + cast + nullability).
- ``operators``  : DataFrame -> DataFrame operator library (relational,
                   dedup, similarity, text, multimodal, as-of).
- ``jobs``       : the two reference jobs re-built portable + partitioned.
- ``queries``    : the query catalog driving the correctness oracle.
- ``streaming``  : Structured Streaming pipelines over the events table.
- ``plans``      : plan inspection helpers (pushdown/broadcast assertions).
"""

__version__ = "0.1.0"
