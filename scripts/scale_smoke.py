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
    """Top-n bench entries by the newest recorded BENCH_r*.json."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    if not arts:
        raise SystemExit("no BENCH_r*.json artifact to rank cost by")
    with open(arts[-1]) as fh:
        doc = json.load(fh)
    if "queries" not in doc and "tail" in doc:
        # driver artifact wraps bench.py's JSON line inside a captured
        # stdout tail — unwrap the payload line
        line = doc["tail"][doc["tail"].rindex('{"metric"'):]
        doc = json.loads(line.splitlines()[0])
    timings = doc["queries"]
    ranked = sorted(timings, key=lambda k: -timings[k])
    return [k for k in ranked if k in CATALOG][:n]


def sf1_compare(sf1_dir: str, top: int, out: str | None) -> int:
    import bench

    base_dir = "/root/testdata/sf0.1"
    names = _costliest(top)
    spark = get_spark(app_name="scale-smoke-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    bad = []
    for name in names:
        q = CATALOG[name]
        row: dict = {}
        try:
            for key, d in (("sf0.1", base_dir), ("sf1", sf1_dir)):
                t0 = time.perf_counter()
                n = bench.materialize(q.builder(spark, d))
                row[key] = {
                    "sec": round(time.perf_counter() - t0, 2), "rows": n,
                }
                bench._reset_session_state(spark)
            rows_ratio = row["sf1"]["rows"] / max(row["sf0.1"]["rows"], 1)
            extrap = max(row["sf0.1"]["sec"] * 10, 2.0)
            wall_ratio = row["sf1"]["sec"] / extrap
            row["rows_ratio"] = round(rows_ratio, 1)
            row["wall_vs_linear_extrapolation"] = round(wall_ratio, 2)
            row["cliff"] = bool(rows_ratio > 100 or wall_ratio > 10)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:300]
            row["cliff"] = True
        report[name] = row
        if row["cliff"]:
            bad.append(name)
        flag = "CLIFF" if row["cliff"] else "ok"
        print(f"{flag:>5} {name}: {json.dumps(row)}", file=sys.stderr)
    payload = {
        "mode": "sf1_compare", "sf1_dir": sf1_dir, "top": top,
        "entries": report, "cliffs": bad,
    }
    print(json.dumps(payload))
    if out:
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1)
    return 1 if bad else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", help="amplified sf1 dir (scripts/make_sf.py)")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--out", help="write the sf1 JSON artifact here")
    a = ap.parse_args()
    if a.sf1:
        return sf1_compare(a.sf1, a.top, a.out)
    return sweep(a.sf_dir)


if __name__ == "__main__":
    raise SystemExit(main())
