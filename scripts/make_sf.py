"""Amplify a test SF directory K-fold for SCALE SMOKES (not oracles).

The driver ships sf{0.001,0.01,0.1}; the r4 sf0.1 sweep caught a real
operator cliff (unigram-simhash candidate saturation) that sf0.01 could
not see, so one more decade of headroom is cheap insurance. This script
derives an sf1-equivalent directory from the DRIVER'S OWN sf0.1 parquet
(no synthetic distributions invented here) by unioning K key-shifted
replicas:

- every entity key (custkey/orderkey/partkey/suppkey/event_id/user_id/
  doc_id/vec_id) shifts by ``replica * stride`` with one shared stride,
  so PK uniqueness and FK consistency hold within each replica and keys
  are disjoint across replicas — join fan-outs scale linearly, exactly
  like a real SF increase;
- bounded dims (region, nation) are NOT amplified — they are fixed-size
  at any SF, and amplifying them would distort every dim-join plan;
- document text / event props are salted with the replica id so
  dedup-family operators see mostly-novel content (a 10x corpus is new
  data, not 10 copies), while embeddings replicate as-is (vector
  duplicates across replicas just exercise the near-dup path harder).

Distinct-value distributions of non-key attributes repeat across
replicas — fine for a smoke whose failure modes are row-count cliffs
and wall-clock blowups, not value statistics.

Usage: python scripts/make_sf.py [--k 10] [--src /root/testdata/sf0.1]
                                 [--dst /tmp/spark_graft_sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb

BOUNDED = ("region", "nation")
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# text-bearing columns salted per replica so amplified corpora are
# mostly-novel content rather than exact clones
SALTED = {
    "documents": ["text"],
    "events": ["props"],
}


def amplify(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # one shared stride: larger than ANY shifted key in any table, so
    # replica key ranges are disjoint for every entity
    stride = 0
    for t, cols in KEY_SHIFTS.items():
        for c in cols:
            (mx,) = con.sql(
                f"SELECT max({c}) FROM '{src}/{t}.parquet'"
            ).fetchone()
            stride = max(stride, int(mx or 0) + 1)
    for t in BOUNDED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, cols in KEY_SHIFTS.items():
        names = [
            row[0]
            for row in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(k):
            parts = []
            for c in names:
                if c in cols:
                    parts.append(f"{c} + {r * stride} AS {c}")
                elif c in SALTED.get(t, []):
                    # keep NULLs null; salt only replica copies so the
                    # r=0 slice stays byte-identical to the source
                    parts.append(
                        f"CASE WHEN {r} = 0 THEN {c} "
                        f"ELSE {c} || ' r{r}' END AS {c}"
                        if r else f"{c}"
                    )
                else:
                    parts.append(c)
            selects.append(
                f"SELECT {', '.join(parts)} FROM '{src}/{t}.parquet'"
            )
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_sf1")
    a = ap.parse_args()
    amplify(a.src, a.dst, a.k)
    print(a.dst)


if __name__ == "__main__":
    main()
