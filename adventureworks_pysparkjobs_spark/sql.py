"""SQL-string entry point (SURVEY.md §3.3).

The reference has no SQL surface — both jobs are DataFrame programs. This
adds the thin missing layer: register the corpus (or any dict of frames)
as temp views and run ``spark.sql``. Catalyst produces the same plans for
SQL and DataFrame formulations, so the operator library and the SQL
surface are interchangeable per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.corpus import register_views


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a SQL query; if ``sf_dir`` is given, (re)register the corpus
    tables as temp views first so the query can reference them by name."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)


def register(spark: SparkSession, frames: dict[str, DataFrame]) -> None:
    """Register arbitrary DataFrames as temp views (engine-side tables)."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
