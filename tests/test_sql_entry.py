"""SQL entry point: same plan/results as the DataFrame formulation."""

from __future__ import annotations

from adventureworks_pysparkjobs_spark.queries import CATALOG
from adventureworks_pysparkjobs_spark.sql import sql

from .conftest import SF_SMOKE


def test_sql_matches_dataframe_builder(spark):
    df_api = CATALOG["q1_pricing_summary"].builder(spark, SF_SMOKE)
    via_sql = sql(
        spark,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
        sf_dir=SF_SMOKE,
    )
    a = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in df_api.collect()
    }
    b = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in via_sql.collect()
    }
    assert a == b


def test_streaming_results_match_batch(spark):
    """The streaming tumbling-window query equals its batch twin."""
    stream = CATALOG["stream_tumbling_counts"].builder(spark, SF_SMOKE)
    batch = CATALOG["events_tumbling_5min"].builder(spark, SF_SMOKE)
    s = {
        (r["bucket_s"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in stream.collect()
    }
    b = {
        (r["bucket_s"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert s == b


def test_stateful_streaming_counts_match_batch(spark):
    """applyInPandasWithState running totals: event counts per user equal
    the batch groupBy on the bounded fixture."""
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        running_user_totals,
    )

    out = running_user_totals(spark, SF_SMOKE)
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = {r["user_id"]: r["count"] for r in batch}
    assert got == want
