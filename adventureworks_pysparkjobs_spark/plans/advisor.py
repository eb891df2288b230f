"""Plan advisor: static scale-anti-pattern detection over a physical
plan — the '.explain and eyeball it' checklist (PLANS.md) as a
callable tool, for the engine's users' OWN queries.

``advise(df)`` returns findings, each a (code, message) pair. It flags
the failure modes that are invisible at test scale and fatal at 100 TB:

- ``cartesian``       — CartesianProduct / non-trivial
                        BroadcastNestedLoopJoin (all-pairs compute)
- ``single-partition``— an Exchange SinglePartition fed by a scan with
                        no partial aggregation / limit in between
                        (the whole dataset through one task)
- ``unpushed-filter`` — a Filter sitting directly on a scan whose
                        PushedFilters list is empty (predicate never
                        reached the source)
- ``python-udf``      — row-at-a-time Python evaluation
                        (BatchEvalPython) in the plan; Arrow-batched
                        pandas evaluation (ArrowEvalPython /
                        FlatMapGroupsInPandas / MapInPandas) is fine
                        and NOT flagged
- ``forced-broadcast``— an explicit broadcast() hint whose subtree
                        scans a file source with no cardinality
                        reducer (Aggregate/Limit/Deduplicate) in
                        between: safe at test scale, an OOM pinned at
                        100x — drop the hint and let AQE choose

This is string-level analysis of the executed plan — a linter, not a
proof; a clean report is necessary, not sufficient. The engine's own
catalog is advisor-clean except for declared small-side crosses
(tests/test_advisor.py pins both directions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .inspect import physical_plan

# operators that legitimately reduce cardinality before a
# SinglePartition exchange (partial agg, top-k, limit)
_REDUCERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "LocalLimit",
    "GlobalLimit",
    "WindowGroupLimit",
)


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" +-:*("))


def advise(
    df: DataFrame,
    bounded_tables: tuple[str, ...] = ("region", "nation"),
) -> list[tuple[str, str]]:
    """Run every detector; return [(code, message), ...] (empty =
    clean). ``bounded_tables`` names sources that are fixed-size at ANY
    data scale (the TPC-H-style 5/25-row dims by default) — forced
    broadcasts of those are correct, not findings; extend it for your
    own bounded-by-contract tables."""
    plan = physical_plan(df)
    lines = plan.splitlines()
    findings: list[tuple[str, str]] = []

    if "CartesianProduct" in plan:
        findings.append(
            (
                "cartesian",
                "CartesianProduct: all-pairs join — add an equi-key, "
                "block/bucket the candidates, or broadcast a provably "
                "tiny side",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            (
                "cartesian",
                "BroadcastNestedLoopJoin: non-equi broadcast join — fine "
                "for a 1-row/bounded side, quadratic otherwise",
            )
        )

    # single-partition exchanges: walk each, look DOWN the WHOLE
    # subtree — flag only when a scan exists with NO cardinality
    # reducer anywhere below the exchange. (Walking to the first
    # scan-or-reducer in print order misfires on multi-branch plans:
    # a bounded Range branch of a join prints before the aggregated
    # branch that actually feeds the exchange.)
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        base = _indent(ln)
        reduced = False
        scan_seen = False
        for sub in lines[i + 1 :]:
            if _indent(sub) <= base and sub.strip():
                break  # left this exchange's subtree
            if any(r in sub for r in _REDUCERS):
                reduced = True
                break
            if "Scan " in sub or "Range " in sub:
                scan_seen = True
        if scan_seen and not reduced:
            findings.append(
                (
                    "single-partition",
                    "Exchange SinglePartition over raw (un-reduced) "
                    "input: the full dataset funnels through one task — "
                    "use partial aggregation, range partitioning, or "
                    "per-partition numbering with offsets",
                )
            )
    # global-sort note: rangepartitioning is fine (not flagged)

    # unpushed filters: Filter whose immediate child is a FILE scan
    # whose own metadata block says PushedFilters: [] (cache scans have
    # no pushdown surface and are not flagged)
    for i, ln in enumerate(lines):
        if "Filter" not in ln or "PushedFilters" in ln:
            continue
        scan_at = next(
            (
                j
                for j in range(i + 1, min(i + 4, len(lines)))
                if "Scan parquet" in lines[j] or "FileScan" in lines[j]
            ),
            None,
        )
        if scan_at is None:
            continue
        scan_block = "\n".join(lines[scan_at : scan_at + 8])
        if "PushedFilters: []" in scan_block:
            findings.append(
                (
                    "unpushed-filter",
                    "Filter directly over a scan with empty "
                    "PushedFilters: the predicate never reached the "
                    "source — check for casts/UDFs in the predicate "
                    "or an unsupported source pushdown",
                )
            )
            break

    # forced broadcast of a potentially unbounded side: every
    # ResolvedHint(broadcast) in the ANALYZED plan under which a file
    # scan reaches the hint with no reducing node ON ITS PATH pins the
    # side in executor + driver memory at any scale. Per-scan, not
    # per-subtree: broadcast(tiny_agg.join(raw_lineitem)) contains an
    # Aggregate, but it bounds only the agg branch — the raw scan is
    # still flagged. (Bounded-dim scans are still file scans — users
    # allowlist those by the hint simply being correct; the engine's
    # own catalog guard additionally knows the bounded table names.)
    from .inspect import broadcast_hint_audit

    def _tbl(p: str) -> str:
        return p.rstrip("/").rsplit("/", 1)[-1].split(".")[0]

    for audit in broadcast_hint_audit(df):
        unreduced = [
            s["path"]
            for s in audit["scans"]
            if not s["reduced"] and _tbl(s["path"]) not in bounded_tables
        ]
        if unreduced:
            findings.append(
                (
                    "forced-broadcast",
                    "broadcast() hint with an unreduced file scan on "
                    f"its path ({', '.join(sorted(unreduced)[:3])}): "
                    "the hinted side scales with the data — drop the "
                    "hint (AQE broadcasts while it fits) unless the "
                    "source is bounded by contract",
                )
            )

    if "BatchEvalPython" in plan:
        findings.append(
            (
                "python-udf",
                "BatchEvalPython: row-at-a-time Python UDF in the plan — "
                "rewrite with built-in expressions or an Arrow-batched "
                "pandas UDF (10-100x)",
            )
        )
    return findings
