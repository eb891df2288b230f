"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints a COMPACT summary JSON as the LAST stdout line (the driver
captures only a bounded stdout tail, so this line must stay well under
2000 chars) and writes the FULL per-query payload — statuses, oracle
timings, all ratios, errors, worst5_ratio, guard prose — to
BENCH_FULL.json next to this script. The summary line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec (2 decimals), ...}, "core13_sec": ..., "sf": ...,
   "n_ok"/"n_partial"/"n_failed": counts,
   "gate2x": {"ratio_all": r, "ratio_excl_pathological": r,
              "pass_2x": bool, "n_dual": n, "n_pathological": n},
   "core13_guard": "ok"|"warn", "full": "BENCH_FULL.json"}

r12 summary-line revision (r11 verdict task 2): the r11 driver artifact
silently shed 27 of 40 per-query timings because the line crossed the
1900-char cap. The line now keeps EVERY per-query timing by spending
its chars on the data instead of prose: per-query seconds are rounded
to 2 decimals IN THE LINE ONLY (BENCH_FULL.json keeps 3),
"worst5_ratio" and the guard WARN prose moved to BENCH_FULL.json (the
guard key survives as "ok"/"warn"). Timing methodology, membership and
all subtotals are UNCHANGED — this is a presentation fix, not a
measurement change.

The headline "value" sums fully-healthy ("ok") queries only; a query
whose repetition 2/3 failed after a good rep 1 keeps its timing in
"queries" but is marked "partial" and excluded from totals, so a
partially-failed measurement is never mistaken for a healthy one.
"core13_sec" and "core_llm10_sec" re-report the two FROZEN subtotals
(R3_CORE_13 and CORE_LLM_10 below) so BENCH artifacts stay comparable
across rounds as the headline set grows; "headline_v1_sec" /
"headline_v2_sec" re-report the two frozen headline revisions
(HEADLINE_V1_34, comparable with BENCH_r03..r10, and HEADLINE_V2_40,
the baseline from r11 on); the headline "value" tracks the growing
set and is only comparable within a round.

The ≤2x-vs-single-node gate is MACHINE-CHECKED in the same artifact:
after the Spark loop, each bench entry's own DuckDB oracle runs in a
fresh subprocess (fresh connection, all cores, $SPARK_GRAFT_ORACLE_CAP
seconds cap, default 60) on the same parquet, and "gate2x" reports the
aggregate Spark/DuckDB ratio twice — over every dual-timed entry, and
excluding the entries whose oracle is a recursive-CTE replay of an
inherently procedural operator (DuckDB-pathological by construction;
detected mechanically as WITH RECURSIVE in the oracle text). A timed-out
oracle is scored AT the cap, which understates DuckDB's time and so
overstates our ratio — conservative in the engine's disfavor.

Each query is timed end-to-end: plan construction + a full
materialization action. Plain count() would let Catalyst prune computed
columns (e.g. a fact's arithmetic measures would never execute); instead
the action aggregates a hash over EVERY output column, so each row is
fully produced — while still shipping only one row to the driver. The
DuckDB side materializes via fetchall() (every cell produced).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from adventureworks_pysparkjobs_spark.queries import CATALOG  # noqa: E402
from adventureworks_pysparkjobs_spark.session import get_spark  # noqa: E402


def materialize(df: DataFrame) -> int:
    """Force full production of every row and column; return the row count.

    count(xxhash64(all columns)) cannot be answered from statistics or a
    pruned projection — every column of every row feeds the hash — and
    xxhash64 is never null, so the count equals the row count.
    """
    agg = df.agg(
        F.count(F.xxhash64(*[F.col(c) for c in df.columns])).alias("n")
    )
    return agg.collect()[0]["n"]


def _reset_session_state(spark) -> None:
    """Drop session state one query left behind before timing the next.

    Operators legitimately cache intermediates (the minhash/jaccard
    shingle frame) or localCheckpoint iteration states (dup-clusters,
    pagerank, the corpus pipeline); those blocks outlive the query's
    Python references and inflate every LATER query's GC/memory
    pressure — measured at sf0.1: the 13-query core ran ~30% slower
    when timed after the heavy extension set without this reset.
    Within one query's best-of-3 reps nothing is cleared, so cache
    reuse across reps (Spark's CacheManager dedupes equal plans) still
    reflects the operator's real steady state.
    """
    import gc

    spark.catalog.clearCache()
    gc.collect()  # release py4j refs so ContextCleaner can reap
    # checkpointed RDD blocks
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # JVM GC nudge is best-effort


# Guard baseline for the core13 subtotal at sf0.1 — DELIBERATE PROTOCOL
# CHANGE in r9 (see BENCH_NOTES.md "r9 guard re-pin"): the historical
# best of 8.25 s was recorded in round 3 on a faster box state with a
# 13-entry bench; the committed artifact then WARNed three rounds
# running (r6 profiling showed the drift is environmental box
# throughput + JIT dilution across the grown 34-entry set, not a plan
# regression — exchange counts verified unchanged). The guard is
# re-pinned to the best reading of the CURRENT 34-entry protocol on
# this box (r8 quiet-box record, 9.87 s); the r3 number is retained
# below as history so the total drift stays visible in the source.
CORE13_BEST_R3_SEC = 8.25   # historical: 13-entry bench, round-3 box state
CORE13_BEST_SEC = 9.643     # current-protocol quiet-box best (round 10;
#                             r8's 9.87 superseded — see BENCH_NOTES.md
#                             "r10 quiet reading")

# FROZEN BENCH CONTRACT (r7 verdict task 5). The headline set grows as
# the catalog grows, which makes round-over-round headline totals
# incomparable by construction. These two subtotals are the cross-round
# contract: their MEMBERSHIP NEVER CHANGES (adding/removing a name here
# is a contract break and must be called out in BENCH_NOTES.md, never
# done silently — tests/test_bench_contract.py pins both lists).
#
# R3_CORE_13: the round-3 headline set — relational + window + dedup +
# similarity representatives, frozen since r3.
R3_CORE_13 = frozenset({
    "q1_pricing_summary", "q3_unshipped_revenue", "q5_nation_revenue",
    "q10_returned_revenue", "top3_parts_per_brand", "fact_order_line",
    "fact_daily_part_agg", "events_sessionize", "doc_chunks",
    "doc_ngram_jaccard_pairs", "doc_minhash_lsh_pairs", "emb_cosine_topk",
    "emb_cosine_topk_vectorized",
})

# CORE_LLM_10: ten LLM-training-data-pipeline flagships (dedup at every
# granularity, semantic dedup, similarity, tokenization, quality gate,
# and the end-to-end corpus job), frozen at r8 membership.
CORE_LLM_10 = frozenset({
    "corpus_training_pipeline", "doc_chunks", "doc_minhash_lsh_pairs",
    "doc_ngram_jaccard_pairs", "doc_dup_clusters", "doc_span_dedup",
    "emb_cosine_topk", "emb_semdedup_kmeans_pipeline",
    "corpus_bpe_encode_stats", "doc_classifier_conformal",
})

# HEADLINE_V1_34: the r3-era headline membership, frozen as-is when the
# set was REVISED in r11 (r10 verdict task 6: none of the r9/r10
# flagships were benched; extending happens via a new frozen revision,
# never in-place). Reported as "headline_v1_sec" for cross-round
# comparability with BENCH_r03..r10.
HEADLINE_V1_34 = frozenset({
    "corpus_bpe_encode_stats", "corpus_export_shards",
    "corpus_heavy_terms_cms", "corpus_training_pipeline", "doc_chunks",
    "doc_classifier_conformal", "doc_dup_clusters",
    "doc_jaccard_histogram", "doc_minhash_lsh_pairs",
    "doc_ngram_jaccard_pairs", "doc_span_dedup", "doc_term_cosine_pairs",
    "emb_contrastive_pairs", "emb_cosine_topk",
    "emb_cosine_topk_vectorized", "emb_nearest_centroid_confusion",
    "emb_semantic_dedup", "emb_semdedup_kmeans_pipeline",
    "events_anomaly_zscore", "events_resample_gapfill",
    "events_sessionize", "events_transition_matrix",
    "fact_daily_part_agg", "fact_order_line", "orders_market_basket",
    "part_copurchase_pagerank", "part_copurchase_triangles",
    "part_hierarchy_rollup", "part_link_prediction",
    "q10_returned_revenue", "q1_pricing_summary", "q3_unshipped_revenue",
    "q5_nation_revenue", "top3_parts_per_brand",
})

# HEADLINE_V2_40: v1 plus six r9/r10-era flagships (intermittent-demand
# forecast, streaming XmR, PQ distortion audit, the MP4 box walk,
# Kaplan-Meier survival, hashed-cosine top-k). The v2 total is the new
# cross-round baseline from r11 on; r11 reports BOTH totals (the
# sanctioned transition round).
HEADLINE_V2_40 = HEADLINE_V1_34 | frozenset({
    "part_croston_forecast", "stream_xmr_control_chart",
    "emb_pq_distortion_audit", "doc_video_mp4_metadata",
    "customer_kaplan_meier", "doc_hashed_cosine_topk",
})


_ORACLE_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _oracle_child(name: str, sf_dir: str) -> None:
    """Subprocess mode: time ONE bench entry's DuckDB oracle on a fresh
    connection and print a JSON line. Run in a child so a runaway oracle
    is hard-capped by the parent's subprocess timeout (DuckDB holds the
    GIL for long stretches; an in-process timer can't preempt it)."""
    import duckdb

    q = CATALOG[name]
    con = duckdb.connect()
    # Bind the views BEFORE t0: view creation is parquet-metadata setup,
    # the Spark side's per-query timing likewise excludes session setup.
    for t in _ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    t0 = time.perf_counter()
    rows = con.sql(q.oracle).fetchall()
    el = time.perf_counter() - t0
    # 1 ms floor: a sub-millisecond oracle must NOT round to 0.0 and
    # silently drop out of the parent's dual-timed set — those are the
    # entries where DuckDB is fastest, i.e. our worst ratios. sec_raw
    # keeps the unfloored elapsed so the artifact records the
    # unflattering ratio too (the floor alone can cut a reported ratio
    # severalfold on the fastest oracles).
    print(json.dumps({
        "sec": round(max(el, 0.001), 3),
        "sec_raw": round(el, 6),
        "rows": len(rows),
    }))


def _time_oracles(
    bench_queries: dict, sf_dir: str
) -> tuple[dict, dict, dict]:
    """Time each bench entry's oracle in its own subprocess. Returns
    (floored sec, raw unfloored sec, status) per entry."""
    import subprocess

    cap = float(os.environ.get("SPARK_GRAFT_ORACLE_CAP", "60"))
    oracle_sec: dict[str, float | None] = {}
    oracle_sec_raw: dict[str, float | None] = {}
    oracle_status: dict[str, str] = {}
    for name, q in sorted(bench_queries.items()):
        if q.oracle is None:
            oracle_sec[name] = None
            oracle_status[name] = "no_oracle"
            continue
        try:
            # +30 s headroom for the child's Python/package import; the
            # child-reported time excludes it.
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--oracle-one", name, sf_dir],
                capture_output=True, text=True, timeout=cap + 30,
            )
            if res.returncode != 0:
                oracle_sec[name] = None
                oracle_status[name] = "error"
                print(f"# oracle {name}: ERROR {res.stderr[-300:]}",
                      file=sys.stderr)
                continue
            payload = json.loads(res.stdout.strip().splitlines()[-1])
            sec = payload["sec"]
            oracle_sec_raw[name] = payload.get("sec_raw", sec)
            if sec > cap:
                oracle_sec[name] = cap
                oracle_status[name] = "timeout"
            else:
                oracle_sec[name] = sec
                oracle_status[name] = "ok"
            print(f"# oracle {name}: {payload['rows']} rows in {sec:.3f}s",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            oracle_sec[name] = cap
            oracle_status[name] = "timeout"
            print(f"# oracle {name}: TIMEOUT >{cap}s", file=sys.stderr)
    return oracle_sec, oracle_sec_raw, oracle_status


SUMMARY_LINE_CAP = 1900  # driver stdout-tail budget; pinned by tests


def compact_summary_line(summary: dict, core13_names: frozenset) -> str:
    """Render the one-line summary JSON, guaranteed under the driver's
    tail-capture cap. Keeps every per-query timing at 2 decimals (full
    3-decimal values live in BENCH_FULL.json); if a future catalog
    growth still overflows the cap, falls back to shedding the
    per-query dict down to the frozen core13 (flagged explicitly so the
    artifact is never silently partial)."""
    summary = dict(summary)
    full_timings = summary["queries"]
    summary["queries"] = {n: round(v, 2) for n, v in full_timings.items()}
    line = json.dumps(summary)
    if len(line) > SUMMARY_LINE_CAP:
        summary["queries"] = {
            n: round(full_timings[n], 2)
            for n in sorted(full_timings)
            if n in core13_names
        }
        summary["queries_truncated_to_core13"] = True
        line = json.dumps(summary)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # non-standard dir name; still bench it
    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in CATALOG.items() if q.bench}

    # Warm-up: run every bench query once at the smallest SF so timings
    # measure the operator, not JVM classloading/JIT of its first use.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name, q in sorted(bench_queries.items()):
            try:
                materialize(q.builder(spark, warm_dir))
            except Exception as e:  # warm-up must never fail the bench
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
        _reset_session_state(spark)

    timings: dict[str, float] = {}
    status: dict[str, str] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(bench_queries.items()):
        # best-of-3: single-JVM local timings are noisy (GC, page cache,
        # sibling processes); the minimum is the steady-state estimate.
        # Per-query fault isolation: one broken query must not cost the
        # round its bench artifact — record the error, keep timing the
        # rest, and always emit the JSON line.
        best, n = None, 0
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = q.builder(spark, sf_dir)
                n = materialize(df)
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            # keep a successful earlier repetition's timing (marked
            # "partial", excluded from totals): a transient failure on
            # rep 2/3 shouldn't discard a real measurement, but it must
            # not masquerade as a healthy query either
            if best is not None:
                timings[name] = round(best, 3)
                status[name] = "partial"
            else:
                status[name] = "failed"
            continue
        timings[name] = round(best, 3)
        status[name] = "ok"
        print(f"# {name}: {n} rows in {timings[name]:.3f}s", file=sys.stderr)
        _reset_session_state(spark)

    ok = {n for n, s in status.items() if s == "ok"}
    total = round(sum(t for n, t in timings.items() if n in ok), 3)
    core13 = round(
        sum(t for n, t in timings.items() if n in ok & R3_CORE_13), 3
    )
    core_llm10 = round(
        sum(t for n, t in timings.items() if n in ok & CORE_LLM_10), 3
    )
    headline_v1 = round(
        sum(t for n, t in timings.items() if n in ok & HEADLINE_V1_34), 3
    )
    headline_v2 = round(
        sum(t for n, t in timings.items() if n in ok & HEADLINE_V2_40), 3
    )

    # Stop Spark BEFORE the oracle pass so the JVM's 32 threads and heap
    # aren't loading the box while DuckDB is being timed (fairness).
    spark.stop()
    oracle_sec, oracle_sec_raw, oracle_status = _time_oracles(
        bench_queries, sf_dir
    )

    dual = {
        n for n in ok
        if oracle_status.get(n) in ("ok", "timeout")
        and oracle_sec.get(n)
    }
    ratio = {
        n: round(timings[n] / oracle_sec[n], 3) for n in sorted(dual)
    }
    # Unfloored ratios: the 1 ms floor (and the view-binding exclusion)
    # understate spark/duck on the fastest oracles — keep the
    # unflattering number in the full artifact alongside the gated one.
    ratio_raw = {
        n: round(timings[n] / oracle_sec_raw[n], 3)
        for n in sorted(dual)
        if oracle_sec_raw.get(n)
    }
    pathological = {
        n for n in dual
        if "RECURSIVE" in (bench_queries[n].oracle or "").upper()
        or oracle_status[n] == "timeout"
    }
    healthy = dual - pathological

    def _agg(names: set) -> dict:
        s = sum(timings[n] for n in names)
        d = sum(oracle_sec[n] for n in names)
        return {
            "n_queries": len(names),
            "spark_sec": round(s, 3),
            "duckdb_sec": round(d, 3),
            "ratio": round(s / d, 3) if d else None,
        }

    gate = {
        "all_dual_timed": _agg(dual),
        "excl_pathological_oracles": _agg(healthy),
        # Continuity metric for the cross-round ~1.8 watch rule, which
        # was calibrated on the v1-34 membership: the same healthy
        # ratio restricted to v1 members. The six v2 additions are
        # structurally oracle-asymmetric (roundtrip-fixture oracles
        # recompute doc_id arithmetic in milliseconds while Spark does
        # the actual byte/stream work), so they shift the unrestricted
        # healthy ratio upward by construction — see BENCH_NOTES.md
        # "r11 gate2x decomposition". pass_2x semantics UNCHANGED.
        "excl_pathological_v1_members": _agg(healthy & HEADLINE_V1_34),
        "pathological": sorted(pathological),
        "cap_sec": float(os.environ.get("SPARK_GRAFT_ORACLE_CAP", "60")),
        "pass_2x": bool(
            healthy
            and _agg(healthy)["ratio"] is not None
            and _agg(healthy)["ratio"] <= 2.0
        ),
    }

    # Regression guard on the frozen core13 subtotal. WARN (never fail)
    # when a run exceeds the current-protocol quiet-box best by >20% so
    # a real plan regression stays visible in every artifact. Baseline
    # re-pinned in r9 (deliberate protocol change — see CORE13_BEST_SEC
    # above and BENCH_NOTES.md "r9 guard re-pin").
    core13_guard = "ok"
    core13_guard_detail = "ok"
    if sf == 0.1 and core13 > CORE13_BEST_SEC * 1.2:
        core13_guard = "warn"
        core13_guard_detail = (
            f"WARN: core13 {core13}s > {CORE13_BEST_SEC}s best +20% "
            f"({round(CORE13_BEST_SEC * 1.2, 2)}s threshold)"
        )
        print(f"# {core13_guard_detail}", file=sys.stderr)

    worst5 = dict(sorted(
        ((n, ratio[n]) for n in healthy),
        key=lambda kv: kv[1], reverse=True,
    )[:5])
    payload = {
        "metric": "catalog_headline_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "status": status,
        "core13_sec": core13,
        "core_llm10_sec": core_llm10,
        "headline_v1_sec": headline_v1,
        "headline_v2_sec": headline_v2,
        "sf": sf,
        "oracle_sec": oracle_sec,
        "oracle_sec_raw": oracle_sec_raw,
        "oracle_status": oracle_status,
        "ratio": ratio,
        "ratio_raw": ratio_raw,
        "gate2x": gate,
        "worst5_ratio": worst5,
        "core13_guard": core13_guard_detail,
    }
    if errors:
        payload["errors"] = errors

    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"# full payload -> {full_path}", file=sys.stderr)

    # Compact summary LAST: the driver records a bounded stdout tail
    # (r5's full payload overflowed it -> BENCH_r05.json parsed:null;
    # r11's 3-decimal line + worst5 + guard prose crossed 1900 chars and
    # shed 27/40 per-query timings -> PERF_r11 lost visibility). All 40
    # timings now always fit: see compact_summary_line.
    summary = {
        "metric": "catalog_headline_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "core13_sec": core13,
        "core_llm10_sec": core_llm10,
        "headline_v1_sec": headline_v1,
        "headline_v2_sec": headline_v2,
        "sf": sf,
        "n_ok": len(ok),
        "n_partial": sum(1 for s in status.values() if s == "partial"),
        "n_failed": sum(1 for s in status.values() if s == "failed"),
        "gate2x": {
            "ratio_all": gate["all_dual_timed"]["ratio"],
            "ratio_excl_pathological":
                gate["excl_pathological_oracles"]["ratio"],
            "ratio_excl_path_v1":
                gate["excl_pathological_v1_members"]["ratio"],
            "pass_2x": gate["pass_2x"],
            "n_dual": gate["all_dual_timed"]["n_queries"],
            "n_pathological": len(pathological),
        },
        "core13_guard": core13_guard,
        "full": "BENCH_FULL.json",
    }
    print(compact_summary_line(summary, R3_CORE_13))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--oracle-one":
        _oracle_child(sys.argv[2], sys.argv[3])
    else:
        main()
