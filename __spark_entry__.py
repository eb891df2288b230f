"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are views over the engine's query catalog
(adventureworks_pysparkjobs_spark/queries/) — one entry per implemented
operator from SURVEY.md §2, each Spark builder paired with an equivalent
DuckDB-SQL oracle (or rows-only for genuinely approximate/engine-specific
operators, marked by a None oracle in the catalog).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adventureworks_pysparkjobs_spark.queries import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 6-table star join with
    broadcast dims + nation-level revenue rollup (q5 shape)."""
    return CATALOG["q5_nation_revenue"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in CATALOG.items() if q.oracle is not None
    }
