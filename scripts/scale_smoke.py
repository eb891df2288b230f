"""Catalog-wide scale smoke: run EVERY catalog entry once at a target
SF dir (default sf0.1 — 10x the driver's correctness SF), report
failures and the slowest/widest entries.

The correctness gate runs at sf0.01; this sweep is the cheap guard
against behavior that only goes wrong at larger scale — e.g. a
candidate-generation cliff (it caught the 16-bit unigram simhash
emitting 7M chance pairs at sf0.1, invisible at sf0.01). Run:

    python scripts/scale_smoke.py [sf_dir]

sf1 mode (r4 verdict task 7) — one more decade for the HEAVY set:

    python scripts/make_sf.py                 # derive sf1 from sf0.1
    python scripts/scale_smoke.py --sf1 /tmp/spark_graft_sf1 --top 10 \
        [--out SCALE_SMOKE_sf1.json]

picks the --top N costliest entries from the newest BENCH_r*.json,
runs each at BOTH sf0.1 and the sf1 dir, and fails on either cliff
class: output rows growing > 100x across the decade (a 10x input
should grow linear outputs ~10x; quadratic candidate explosions blow
far past 100x) or wall-clock > 10x the linear extrapolation
(t_sf0.1 * 10, with a 2 s floor so JVM fixed costs can't false-flag
sub-second entries).

skew mode (r5 verdict task 6) — the same heavy set on HOT-KEY data:

    python scripts/make_sf.py --skew --dst /tmp/spark_graft_sf1_skew
    python scripts/scale_smoke.py --sf1 /tmp/spark_graft_sf1 \
        --skew /tmp/spark_graft_sf1_skew --top 10 [--out ...]

adds a "skew" section to the artifact: each top entry re-runs on the
skewed sf1 (one user holds ~20% of events, one part ~20% of
lineitem), cliff = wall > 5x the uniform-sf1 run (AQE skew-split +
the salted-join paths should hold the line, not melt); plus an
explicit AQE-skew-join probe (lineitem x part on the hot key as a
sort-merge join with scale-appropriate split thresholds) that must
show "skew=true" in the EXECUTED adaptive plan — proving the runtime
skew handling actually engaged on actually-skewed data.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworks_pysparkjobs_spark.queries import CATALOG  # noqa: E402
from adventureworks_pysparkjobs_spark.session import get_spark  # noqa: E402


def sweep(sf: str) -> int:
    import bench

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, tuple[float, int]] = {}
    fails: dict[str, str] = {}
    for name, q in CATALOG.items():
        t0 = time.perf_counter()
        try:
            n = bench.materialize(q.builder(spark, sf))
            times[name] = (round(time.perf_counter() - t0, 2), n)
        except Exception as e:  # keep sweeping; report at the end
            fails[name] = f"{type(e).__name__}: {e}"[:300]
        bench._reset_session_state(spark)
    for name, err in fails.items():
        print(f"FAIL {name}: {err}")
    print("slowest:")
    for name, (t, n) in sorted(times.items(), key=lambda x: -x[1][0])[:10]:
        print(f"  {t:8.2f}s {n:>10} rows  {name}")
    print("widest output:")
    for name, (t, n) in sorted(times.items(), key=lambda x: -x[1][1])[:5]:
        print(f"  {n:>10} rows {t:8.2f}s  {name}")
    total = sum(t for t, _ in times.values())
    print(f"total {total:.1f}s over {len(times)} entries, {len(fails)} failures")
    return 1 if fails else 0


def _costliest(n: int) -> list[str]:
    """Top-n bench entries by the newest PARSEABLE bench artifact
    (BENCH_FULL.json from a local run, else BENCH_r*.json newest-first
    — r5's driver artifact is tail-truncated and must be skipped, not
    crashed on)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    full = os.path.join(root, "BENCH_FULL.json")
    if os.path.exists(full):
        arts.append(full)
    for path in reversed(arts):
        try:
            with open(path) as fh:
                doc = json.load(fh)
            if "queries" not in doc and "tail" in doc:
                # driver artifact wraps bench.py's JSON line inside a
                # captured stdout tail — unwrap the payload line
                line = doc["tail"][doc["tail"].rindex('{"metric"'):]
                doc = json.loads(line.splitlines()[0])
            timings = doc["queries"]
        except (ValueError, KeyError):
            continue
        ranked = sorted(timings, key=lambda k: -timings[k])
        print(f"# cost ranking from {os.path.basename(path)}",
              file=sys.stderr)
        return [k for k in ranked if k in CATALOG][:n]
    raise SystemExit("no parseable bench artifact to rank cost by")


def _aqe_skew_probe(skew_dir: str) -> dict:
    """Force the hot-key join through a sort-merge join with
    scale-appropriate split thresholds and report whether AQE's runtime
    skew handling engaged ("skew=true" in the EXECUTED adaptive plan).

    Threshold note: the defaults (256 MB skewedPartitionThresholdInBytes)
    are sized for real clusters; at smoke scale the hot partition is
    ~tens of MB, so we lower the thresholds to the smoke's scale — the
    point is to exercise the split machinery on actually-skewed data,
    not to pretend the smoke box is a 1000-executor cluster."""
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="aqe-skew-probe",
        extra_conf={
            # no broadcast escape hatch: skew-join only applies to
            # shuffle joins, and part would otherwise broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "4m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        li = spark.read.parquet(f"{skew_dir}/lineitem.parquet")
        pt = spark.read.parquet(f"{skew_dir}/part.parquet")
        joined = li.join(pt, li.l_partkey == pt.p_partkey).groupBy(
            "p_brand"
        ).agg(F.sum("l_quantity").alias("qty"))
        t0 = time.perf_counter()
        joined.collect()
        sec = round(time.perf_counter() - t0, 2)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return {
            "sec": sec,
            "skew_split_observed": "skew=true" in plan,
            "sort_merge_join": "SortMergeJoin" in plan,
        }
    finally:
        spark.stop()


def sf1_compare(
    sf1_dir: str, top: int, out: str | None, skew_dir: str | None = None,
    factor: int = 10, extra_names: list[str] | None = None,
) -> int:
    """Compare the heavy set between sf0.1 and an amplified dir.

    ``factor`` is the row amplification of sf1_dir relative to sf0.1
    (make_sf.py --k): the linear wall extrapolation and the rows-cliff
    threshold both scale with it. ``extra_names`` appends specific
    catalog entries (e.g. the iterative flagships, which the bench
    headline set deliberately excludes) to the costliest list."""
    import bench

    base_dir = "/root/testdata/sf0.1"
    names = _costliest(top)
    for n in (extra_names or []):
        if n not in CATALOG:
            raise SystemExit(f"--names entry {n!r} not in catalog")
        if n not in names:
            names.append(n)
    spark = get_spark(app_name="scale-smoke-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    bad = []
    for name in names:
        q = CATALOG[name]
        row: dict = {}
        try:
            dirs = [("sf0.1", base_dir), ("sf1", sf1_dir)]
            if skew_dir:
                dirs.append(("sf1_skew", skew_dir))
            for key, d in dirs:
                t0 = time.perf_counter()
                n = bench.materialize(q.builder(spark, d))
                row[key] = {
                    "sec": round(time.perf_counter() - t0, 2), "rows": n,
                }
                bench._reset_session_state(spark)
            rows_ratio = row["sf1"]["rows"] / max(row["sf0.1"]["rows"], 1)
            extrap = max(row["sf0.1"]["sec"] * factor, 2.0)
            wall_ratio = row["sf1"]["sec"] / extrap
            row["rows_ratio"] = round(rows_ratio, 1)
            row["wall_vs_linear_extrapolation"] = round(wall_ratio, 2)
            row["cliff"] = bool(
                rows_ratio > 10 * factor or wall_ratio > 10
            )
            if skew_dir:
                # skew must not melt the operator: allow 5x the
                # uniform-sf1 wall (2 s floor for sub-second entries)
                skew_ratio = row["sf1_skew"]["sec"] / max(
                    row["sf1"]["sec"], 2.0
                )
                row["skew_vs_sf1_wall"] = round(skew_ratio, 2)
                row["cliff"] = row["cliff"] or skew_ratio > 5.0
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:300]
            row["cliff"] = True
        report[name] = row
        if row["cliff"]:
            bad.append(name)
        flag = "CLIFF" if row["cliff"] else "ok"
        print(f"{flag:>5} {name}: {json.dumps(row)}", file=sys.stderr)
    spark.stop()
    payload = {
        "mode": "sf1_compare", "sf1_dir": sf1_dir, "top": top,
        "factor_vs_sf0.1": factor,
        "entries": report, "cliffs": bad,
        # r8 verdict task 5: the amplified fixture (make_sf.py --k)
        # CLONES documents, so true-duplicate PAIR counts grow
        # quadratically per clone group — for pair-grain dedup entries
        # (doc_winnowing_pairs, the minhash/ngram pair families) a
        # rows_ratio above the row-amplification factor is a fixture
        # artifact, not a plan cliff; the wall ratio is the binding
        # check for those entries (the rows-cliff threshold already
        # allows 10x factor for this reason).
        "pass_rule_notes": {
            "pair_grain_entries": (
                "rows_ratio > factor expected on cloned fixtures: "
                "k clones of a doc create O(k^2) true-dup pairs; "
                "judge wall_vs_linear_extrapolation instead"
            ),
        },
    }
    if skew_dir:
        probe = _aqe_skew_probe(skew_dir)
        payload["skew"] = {
            "skew_dir": skew_dir,
            "hot_key_fraction": "~20% of events.user_id and "
            "lineitem.l_partkey (scripts/make_sf.py --skew)",
            "aqe_probe": probe,
        }
        if not probe.get("skew_split_observed"):
            bad.append("aqe_skew_probe")
            payload["cliffs"] = bad
        print(f"skew probe: {json.dumps(probe)}", file=sys.stderr)
    print(json.dumps(payload))
    if out:
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1)
    return 1 if bad else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", help="amplified sf1 dir (scripts/make_sf.py)")
    ap.add_argument(
        "--skew",
        help="skewed sf1 dir (scripts/make_sf.py --skew); adds the "
        "skew section + AQE probe to the sf1 artifact",
    )
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--out", help="write the sf1 JSON artifact here")
    ap.add_argument(
        "--factor", type=int, default=10,
        help="row amplification of --sf1 dir vs sf0.1 (make_sf.py --k)",
    )
    ap.add_argument(
        "--names",
        help="comma-separated catalog entries to append to the heavy set",
    )
    a = ap.parse_args()
    if a.sf1:
        return sf1_compare(
            a.sf1, a.top, a.out, skew_dir=a.skew, factor=a.factor,
            extra_names=a.names.split(",") if a.names else None,
        )
    return sweep(a.sf_dir)


if __name__ == "__main__":
    raise SystemExit(main())
