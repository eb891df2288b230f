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


# Logical nodes that bound the row count of everything beneath them:
# a keyed/global Aggregate reduces to its key domain, Limits are
# explicit bounds, Deduplicate reduces to the distinct-key domain.
# Canonical set — the advisor and the catalog-wide test both import it.
REDUCING_NODES = frozenset(
    {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}
)


def broadcast_hint_audit(df: DataFrame) -> list:
    """Audit every forced broadcast hint in the analyzed logical plan.

    Returns one dict per ``ResolvedHint (strategy=broadcast)`` node:
    ``{"paths": [source file paths read under the hint],
       "nodes": [logical node class names in the hinted subtree],
       "scans": [{"path": p, "reduced": bool}, ...]}``
    where ``reduced`` is True iff a row-count-reducing node
    (``REDUCING_NODES``) lies ON THE PATH from the hint down to THAT
    scan. Subtree membership is not enough: in
    ``broadcast(tiny_agg.join(raw_lineitem))`` the Aggregate bounds only
    the agg branch — the raw lineitem scan still reaches the hint
    unreduced and must be flagged, which a whole-subtree
    ``set(nodes) & reducing`` test would miss.

    The 100 TB rule this feeds (tests/test_scale_shape.py): a FORCED
    broadcast is only safe when the hinted side is bounded regardless of
    data scale — a fixed-size dim (region/nation), a global/keyed
    Aggregate (reduces to the key domain), a Deduplicate over a bounded
    domain, or an explicit Limit. A hint under which an SF-scaling scan
    reaches the hint with no reducing node on its path pins an OOM at
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
        scans: list[dict] = []
        # DFS carrying per-path state: has a reducing node been crossed
        # between the hint and the current node?
        stack2 = [(h, False)]
        while stack2:
            n, reduced = stack2.pop()
            cls = n.getClass().getSimpleName()
            names.append(cls)
            if cls == "LogicalRelation":
                try:
                    rp = n.relation().location().rootPaths()
                    for i in range(rp.size()):
                        p = rp.apply(i).toString()
                        paths.append(p)
                        scans.append({"path": p, "reduced": reduced})
                except Exception:
                    pass  # non-file relation (LocalRelation etc.)
            child_reduced = reduced or cls in REDUCING_NODES
            stack2.extend((c, child_reduced) for c in _jchildren(n))
        audits.append({"paths": paths, "nodes": names, "scans": scans})
    return audits
