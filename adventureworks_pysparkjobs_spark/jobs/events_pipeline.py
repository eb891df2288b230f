"""End-to-end behavioral-analytics job over the events stream — the
analytics sibling of jobs/corpus_pipeline.py: one pass over
``{sf_dir}/events.parquet`` producing the three summary tables a
product team reads daily (ordered funnel, weekly cohort retention,
rolling anomaly flags), as ONE section-tagged frame.

Composition notes (scale):
- the three sections share one source scan definition; each is a small
  independent aggregation DAG over it, unioned at the PLAN level
  (operators/relational.py union_evolved — flat Union, NULL backfill),
  so Spark schedules them as one job and nothing materializes to the
  driver;
- every section follows the engine's determinism rules, so the WHOLE
  job carries a single composed DuckDB oracle
  (queries/composed.py:events_analytics_pipeline) like the corpus
  pipeline does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics import funnel, retention_cohorts, rolling_zscore
from ..operators.relational import union_evolved
from ..sources.corpus import load_table

FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def build_events_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fun = funnel(ev, "user_id", "ts", "event_type", FUNNEL_STAGES).select(
        F.lit("funnel").alias("section"), "*"
    )
    ret = retention_cohorts(ev, "user_id", "ts").select(
        F.lit("retention").alias("section"), "*"
    )
    anom = rolling_zscore(
        ev, "event_type", "ts", "value", lookback=7, z_threshold=2.5
    ).select(F.lit("anomaly").alias("section"), "*")
    return union_evolved([fun, ret, anom])
