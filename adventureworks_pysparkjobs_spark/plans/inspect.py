"""Physical-plan inspection helpers.

The 100 TB design constraints (SURVEY.md §4.5) are only real if they are
checkable: these helpers turn '.explain and eyeball it' into assertions
tests can make — filters reached the parquet scan, the dim join went
broadcast, no accidental cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def analyzed_plan(df: DataFrame) -> str:
    """Analyzed logical plan — where join-strategy HINTS still appear as
    ResolvedHint nodes (the optimizer folds them into the join later), so
    tests can assert a join is NOT forced to a strategy."""
    return df._jdf.queryExecution().analyzed().toString()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in a PushedFilters list of the plan's
    scans (predicate reached the data source)."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, (
            f"filter {frag!r} not pushed to any scan.\nPushed lines:\n{joined}"
        )


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, (
        f"expected >= {at_least} broadcast joins, found {n}.\n{plan[:2000]}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, (
        "unexpected CartesianProduct in plan\n" + plan[:2000]
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better (more of
    the plan fused into generated code)."""
    return physical_plan(df).count("WholeStageCodegen")
