"""Composed end-to-end pipeline entries (registered last): whole jobs
under ONE oracle, reusing the per-section oracles already in the
catalog — so the composition itself (plan-level union, column
alignment, shared scan) is what the extra entry actually tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.corpus import load_table
from .catalog import CATALOG, query


def _section(name: str, tag: str) -> str:
    """Wrap an existing catalog oracle as a tagged subquery (a WITH
    clause is legal inside a derived table)."""
    return f"SELECT '{tag}' AS section, * FROM ({CATALOG[name].oracle})"


_EVENTS_ANALYTICS_ORACLE = "\nUNION ALL BY NAME\n".join(
    [
        _section("events_funnel", "funnel"),
        _section("events_retention_cohorts", "retention"),
        _section("events_anomaly_zscore", "anomaly"),
    ]
)


@query(
    "events_analytics_pipeline",
    oracle=_EVENTS_ANALYTICS_ORACLE,
    tags=("composed", "pipeline", "analytics", "union"),
)
def events_analytics_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole behavioral-analytics job (jobs/events_pipeline.py) as
    one section-tagged frame: funnel + cohort retention + rolling
    anomaly flags, unioned at the plan level (union_evolved NULL
    backfill) over one source definition. The oracle is the composed
    UNION ALL BY NAME of the three section oracles — the end-to-end
    job carries the same correctness gate as each piece."""
    from ..jobs.events_pipeline import build_events_analytics

    return build_events_analytics(spark, sf_dir)



@query(
    "stream_anomaly_zscore",
    oracle=None,  # set right below: the batch twin's SQL verbatim
    tags=("streaming", "materialized-view", "anomaly", "composed"),
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production anomaly architecture end-to-end: the stream
    maintains the per-(event_type, day) decimal daily-total MV
    (stream_aggregate_to_lake, replay-idempotent batch partitions);
    the rolling z-score detector (analytics.zscore_from_daily) is a
    cheap batch pass over the snapshot — O(keys x days) rows, never
    raw events. On the bounded fixture the result equals the all-batch
    rolling z-score, which is the oracle."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.analytics import zscore_from_daily
    from ..operators.relational import dec
    from ..streaming.events import (
        read_agg_snapshot,
        read_events_stream,
        stream_aggregate_to_lake,
    )

    tmp = tempfile.mkdtemp(prefix="stream_anom_")
    try:
        stream = read_events_stream(spark, sf_dir).select(
            F.col("event_type").alias("key"),
            F.to_date("ts").alias("day"),
            dec("value", 18, 2).alias("x"),
        )
        stream_aggregate_to_lake(
            stream, f"{tmp}/mv", ["key", "day"], ["x"], f"{tmp}/ckpt"
        )
        daily = read_agg_snapshot(
            spark, f"{tmp}/mv", ["key", "day"], ["x"]
        ).select("key", "day", F.col("x").cast("decimal(15,2)").alias("x"))
        out = zscore_from_daily(daily, lookback=7, z_threshold=2.5)
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# oracle = the batch twin's SQL, registered above in analytics.py
CATALOG["stream_anomaly_zscore"].oracle = CATALOG[
    "events_anomaly_zscore"
].oracle


_ORDERS_AUDIT_ORACLE = "\nUNION ALL BY NAME\n".join(
    [
        _section("orders_duplicate_payments", "duplicate_payments"),
        _section("orders_id_gap_islands", "id_gaps"),
        _section("orders_benford_audit", "benford"),
        _section("orders_status_priority_chi2", "status_priority_chi2"),
    ]
)


@query(
    "orders_audit_pipeline",
    oracle=_ORDERS_AUDIT_ORACLE,
    tags=("composed", "pipeline", "governance", "audit", "union"),
)
def orders_audit_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole order-integrity audit job
    (jobs/order_audit_pipeline.py) as one section-tagged frame:
    duplicate-payment pairs + key gap islands + Benford first-digit
    audit + status x priority chi-square, unioned at the plan level
    (union_evolved NULL backfill) over one orders scan definition. The
    oracle is the composed UNION ALL BY NAME of the four section
    oracles — the end-to-end controls job carries the same correctness
    gate as each piece."""
    from ..jobs.order_audit_pipeline import build_order_audit

    return build_order_audit(spark, sf_dir)


@query(
    "customer_feature_store",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
    o AS (
      SELECT o_custkey AS k,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend,
             MIN(CAST(o_orderdate AS DATE)) AS first_d,
             MAX(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY 1)
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal,
           COALESCE(o.n_orders, 0) AS n_orders,
           CAST(CAST(COALESCE(o.spend, 0) AS VARCHAR) AS DOUBLE)
             AS total_spend,
           CASE WHEN o.k IS NULL THEN NULL
                ELSE CAST(date_diff('day', o.last_d, mx.md) AS BIGINT)
           END AS recency_days,
           CASE WHEN o.k IS NULL THEN NULL
                ELSE CAST(date_diff('day', o.first_d, o.last_d)
                          AS BIGINT)
           END AS span_days,
           CASE WHEN COALESCE(o.n_orders, 0) < 2 THEN NULL
                ELSE CAST(date_diff('day', o.first_d, o.last_d)
                          AS DOUBLE)
                     / CAST(o.n_orders - 1 AS DOUBLE)
           END AS mean_interorder_days
    FROM customer c
    LEFT JOIN o ON o.k = c.c_custkey
    CROSS JOIN mx
    """,
    tags=("composed", "feature-store", "ml-features", "rfm"),
)
def customer_feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-stop churn/LTV feature assembly per customer — the
    feature-store frame a modeling team trains on: order count,
    decimal-exact total spend, recency vs the corpus as-of date,
    active span, and mean inter-order gap (NULL below 2 orders),
    joined onto the customer dimension (customers without orders keep
    NULL temporal features, zero counts). One fact reduction to
    customer grain + one keyed left join + a 1-row broadcast as-of
    rider; every emitted double is one IEEE expression over exact
    operands."""
    ev = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    mx = ev.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    o = ev.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("spend"),
        F.min(F.to_date("o_orderdate")).alias("first_d"),
        F.max(F.to_date("o_orderdate")).alias("last_d"),
    )
    j = cust.join(o, cust["c_custkey"] == o["k"], "left").crossJoin(
        F.broadcast(mx)
    )
    n = F.col("n_orders")
    span = F.datediff(F.col("last_d"), F.col("first_d"))
    return j.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.coalesce(n, F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce(F.col("spend"), F.lit(0))
        .cast("string")
        .cast("double")
        .alias("total_spend"),
        F.when(F.col("k").isNull(), F.lit(None).cast("long"))
        .otherwise(F.datediff(F.col("md"), F.col("last_d")).cast("long"))
        .alias("recency_days"),
        F.when(F.col("k").isNull(), F.lit(None).cast("long"))
        .otherwise(span.cast("long"))
        .alias("span_days"),
        F.when(F.coalesce(n, F.lit(0)) < 2, F.lit(None).cast("double"))
        .otherwise(span.cast("double") / (n - 1).cast("double"))
        .alias("mean_interorder_days"),
    )
