"""Composed end-to-end pipeline entries (registered last): whole jobs
under ONE oracle, reusing the per-section oracles already in the
catalog — so the composition itself (plan-level union, column
alignment, shared scan) is what the extra entry actually tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
