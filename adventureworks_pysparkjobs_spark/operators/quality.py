"""Declarative data-quality constraint auditing — the read-side twin
of ``relational.enforce_schema`` (which hard-fails at publish time;
reference parity: the BQ_SCHEMAS nullability flags at
transform_to_bq.py:28–74 are documentation-only there).

An audit runs a rule set against a table and returns one row per rule
with its violation count — the pre-publish gate of a scheduled
pipeline, and the shape monitoring systems ingest.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ForeignKey:
    """FK rule: every non-null ``cols`` tuple must exist in
    ``ref.select(ref_cols)``."""

    name: str
    cols: tuple[str, ...]
    ref: DataFrame
    ref_cols: tuple[str, ...]


def audit_constraints(
    df: DataFrame,
    unique: list[tuple[str, ...]] | None = None,
    not_null: list[str] | None = None,
    ranges: dict[str, tuple[float | None, float | None]] | None = None,
    predicates: dict[str, Column] | None = None,
    foreign_keys: list[ForeignKey] | None = None,
) -> DataFrame:
    """Run a constraint rule set; return (rule, violations) rows.

    Scale shape: every not_null / range / predicate rule is a
    conditional count inside ONE aggregation over ONE scan of the
    table (a row violating k rules feeds k counters in the same
    pass). Each uniqueness rule costs one keyed agg on its own key;
    each FK costs one left-anti join (dimension sides broadcast-able,
    AQE's call). Output is rules-sized — collect-safe.
    """
    unique = unique or []
    not_null = not_null or []
    ranges = ranges or {}
    predicates = predicates or {}
    foreign_keys = foreign_keys or []

    results: list[DataFrame] = []

    # one-pass conditional counters
    counters: list[Column] = []
    names: list[str] = []
    for c in not_null:
        counters.append(
            F.count_if(F.col(c).isNull()).alias(f"_r{len(counters)}")
        )
        names.append(f"not_null:{c}")
    for c, (lo, hi) in ranges.items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < F.lit(lo))
        if hi is not None:
            cond = cond | (F.col(c) > F.lit(hi))
        counters.append(F.count_if(cond).alias(f"_r{len(counters)}"))
        names.append(f"range:{c}")
    for rule_name, pred in predicates.items():
        counters.append(
            F.count_if(~pred).alias(f"_r{len(counters)}")
        )
        names.append(f"predicate:{rule_name}")
    if counters:
        wide = df.agg(*counters)
        long = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).alias("rule"),
                            F.col(f"_r{i}").alias("violations"),
                        )
                        for i, n in enumerate(names)
                    ]
                )
            ).alias("kv")
        ).select("kv.rule", "kv.violations")
        results.append(long)

    for cols in unique:
        dupes = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum("_n"), F.lit(0)).alias("violations")
            )
            .select(
                F.lit(f"unique:{','.join(cols)}").alias("rule"),
                "violations",
            )
        )
        results.append(dupes)

    for fk in foreign_keys:
        probe = df.select(*fk.cols).na.drop(subset=list(fk.cols))
        ref = fk.ref.select(
            *[
                F.col(rc).alias(c)
                for c, rc in zip(fk.cols, fk.ref_cols)
            ]
        ).distinct()
        orphans = (
            probe.join(ref, list(fk.cols), "left_anti")
            .agg(F.count("*").alias("violations"))
            .select(F.lit(f"fk:{fk.name}").alias("rule"), "violations")
        )
        results.append(orphans)

    if not results:
        raise ValueError("audit_constraints: no rules given")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
