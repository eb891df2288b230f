"""End-to-end order-integrity audit job — the governance sibling of
jobs/events_pipeline.py: one pass over ``{sf_dir}/orders.parquet``
producing the four audit tables a payments/controls team reads daily
(duplicate-payment pairs, surrogate-key gap islands, Benford
first-digit audit, status x priority independence), as ONE
section-tagged frame.

Composition notes (scale):
- the four sections share one source scan definition; each is a small
  independent audit DAG over it, unioned at the PLAN level
  (operators/relational.py union_evolved — flat Union, NULL backfill),
  so Spark schedules them as one job and nothing materializes to the
  driver;
- every section follows the engine's determinism rules, so the WHOLE
  job carries a single composed DuckDB oracle
  (queries/composed.py:orders_audit_pipeline) — the UNION ALL BY NAME
  of the four section oracles already in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import contingency_chi2
from ..operators.quality import (
    benford_audit,
    duplicate_payment_pairs,
    key_gap_islands,
)
from ..operators.relational import union_evolved
from ..sources.corpus import load_table


def build_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    dups = duplicate_payment_pairs(
        od, "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
        band_width=1000.0, window_days=90,
    ).select(F.lit("duplicate_payments").alias("section"), "*")
    # Fixture orderkeys are dense; audit the non-finalized partition of
    # the key sequence so the section exercises real gaps (mirrors the
    # orders_id_gap_islands catalog entry + its oracle).
    gaps = key_gap_islands(
        od.filter(F.col("o_orderstatus") != "F"), "o_orderkey", top_k=10
    ).select(F.lit("id_gaps").alias("section"), "*")
    benford = benford_audit(od, "o_totalprice", tol=0.02).select(
        F.lit("benford").alias("section"), "*"
    )
    chi2 = contingency_chi2(od, "o_orderstatus", "o_orderpriority").select(
        F.lit("status_priority_chi2").alias("section"), "*"
    )
    return union_evolved([dups, gaps, benford, chi2])
