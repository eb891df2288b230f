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


def _jchildren(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def broadcast_hint_audit(df: DataFrame) -> list:
    """Audit every forced broadcast hint in the analyzed logical plan.

    Returns one dict per ``ResolvedHint (strategy=broadcast)`` node:
    ``{"paths": [source file paths read under the hint],
       "nodes": [logical node class names in the hinted subtree]}``.

    The 100 TB rule this feeds (tests/test_scale_shape.py): a FORCED
    broadcast is only safe when the hinted side is bounded regardless of
    data scale — a fixed-size dim (region/nation), a global/keyed
    Aggregate (reduces to the key domain), a Deduplicate over a bounded
    domain, or an explicit Limit. A hint whose subtree scans an
    SF-scaling table with no reducing node in between pins an OOM at
    scale that AQE would have avoided.
    """
    root = df._jdf.queryExecution().analyzed()
    hints = []
    stack = [root]
    while stack:
        n = stack.pop()
        if (
            n.getClass().getSimpleName() == "ResolvedHint"
            and "broadcast" in n.hints().toString().lower()
        ):
            hints.append(n)
        stack.extend(_jchildren(n))
    audits = []
    for h in hints:
        paths: list[str] = []
        names: list[str] = []
        stack = [h]
        while stack:
            n = stack.pop()
            cls = n.getClass().getSimpleName()
            names.append(cls)
            if cls == "LogicalRelation":
                try:
                    rp = n.relation().location().rootPaths()
                    paths.extend(
                        rp.apply(i).toString() for i in range(rp.size())
                    )
                except Exception:
                    pass  # non-file relation (LocalRelation etc.)
            stack.extend(_jchildren(n))
        audits.append({"paths": paths, "nodes": names})
    return audits
