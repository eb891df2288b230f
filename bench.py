"""Benchmark runner: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "status": {name: "ok"|"partial"|"failed"},
   "core13_sec": <r3-comparable subtotal>, "sf": <scale factor>}

The headline "value" sums fully-healthy ("ok") queries only; a query
whose repetition 2/3 failed after a good rep 1 keeps its timing in
"queries" but is marked "partial" and excluded from totals, so a
partially-failed measurement is never mistaken for a healthy one.
"core13_sec" re-reports the round-3 13-query headline subtotal so BENCH
artifacts stay comparable across rounds as the bench set grows.

Each query is timed end-to-end: plan construction + a full
materialization action. Plain count() would let Catalyst prune computed
columns (e.g. a fact's arithmetic measures would never execute); instead
the action aggregates a hash over EVERY output column, so each row is
fully produced — while still shipping only one row to the driver.
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


# The round-3 headline set, frozen for cross-round comparability.
R3_CORE_13 = frozenset({
    "q1_pricing_summary", "q3_unshipped_revenue", "q5_nation_revenue",
    "q10_returned_revenue", "top3_parts_per_brand", "fact_order_line",
    "fact_daily_part_agg", "events_sessionize", "doc_chunks",
    "doc_ngram_jaccard_pairs", "doc_minhash_lsh_pairs", "emb_cosine_topk",
    "emb_cosine_topk_vectorized",
})


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
    payload = {
        "metric": "catalog_headline_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "status": status,
        "core13_sec": core13,
        "sf": sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
