"""Catalog-wide scale smoke: run EVERY catalog entry once at a target
SF dir (default sf0.1 — 10x the driver's correctness SF), report
failures and the slowest/widest entries.

The correctness gate runs at sf0.01; this sweep is the cheap guard
against behavior that only goes wrong at larger scale — e.g. a
candidate-generation cliff (it caught the 16-bit unigram simhash
emitting 7M chance pairs at sf0.1, invisible at sf0.01). Run:

    python scripts/scale_smoke.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adventureworks_pysparkjobs_spark.queries import CATALOG  # noqa: E402
from adventureworks_pysparkjobs_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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


if __name__ == "__main__":
    raise SystemExit(main())
