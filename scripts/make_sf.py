"""Amplify a test SF directory K-fold for SCALE SMOKES (not oracles).

The driver ships sf{0.001,0.01,0.1}; the r4 sf0.1 sweep caught a real
operator cliff (unigram-simhash candidate saturation) that sf0.01 could
not see, so one more decade of headroom is cheap insurance. This script
derives an sf1-equivalent directory from the DRIVER'S OWN sf0.1 parquet
(no synthetic distributions invented here) by unioning K key-shifted
replicas:

- every entity key (custkey/orderkey/partkey/suppkey/event_id/user_id/
  doc_id/vec_id) shifts by ``replica * (max(pk)+1)`` with a PER-ENTITY
  stride, so each entity's key space stays dense and contiguous
  (0..K-1, K..2K-1, ...), PKs stay unique, FKs stay consistent
  (referencing columns shift by the referenced entity's stride), and
  join fan-outs scale linearly — exactly like a real SF increase.
  Density matters: operators that derive structure from key arithmetic
  (the hash-derived part taxonomy's parent(k)) need every smaller key
  to exist;
- bounded dims (region, nation) are NOT amplified — they are fixed-size
  at any SF, and amplifying them would distort every dim-join plan;
- document text / event props get a per-replica substitution cipher
  (rotations of 'etaoinshrdlu') so replica copies are NOT
  near-duplicates of each other or the original — a 10x corpus is new
  data, not 10 shingle-identical copies — while embeddings replicate
  as-is (vector duplicates just exercise the near-dup path harder).

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
# column -> entity: every column of one entity (PK + its FK references)
# shifts by that ENTITY's own stride = max(PK)+... so each entity's key
# space stays DENSE (1..K, K+1..2K, ...) — replica keys are contiguous,
# which matters for operators that derive structure from key arithmetic
# (e.g. the hash-derived part taxonomy: parent(k) must exist for every
# k, so gaps in the key space would dangle parents), while FK
# consistency holds because referencing columns shift by the referenced
# entity's stride.
ENTITY_OF = {
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "p_partkey": "part", "l_partkey": "part",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "event_id": "event", "user_id": "user",
    "doc_id": "doc", "vec_id": "vec",
}
# entity stride is measured on its PK column in its home table
ENTITY_PK = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
TABLES = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)
# text-bearing columns get a per-replica substitution cipher over the
# twelve most frequent letters, so replica copies of a document are NOT
# near-duplicates of each other or the original (a suffix salt leaves
# shingle sets ~identical, which made every dedup-family operator
# correctly report all replicas as one near-dup cluster — a property of
# the amplifier, not new data); a cipher changes most tokens, hence
# most shingles, while staying deterministic and length-preserving.
CIPHER_SRC = "etaoinshrdlu"
# Second independent cipher stage over the next-most-frequent letters:
# the rotation of CIPHER_SRC alone repeats every 12 replicas, so K > 12
# would hand replicas 12 apart IDENTICAL text and the dedup operators
# would (correctly) report the fixture artifact as duplicate clusters —
# observed as a 314x rows_ratio in the first r8 sf3 (K=30) probe.
# Composing two coprime-period rotations (12 x 7 = 84 distinct
# ciphers) keeps every replica's text distinct up to K=84.
CIPHER_SRC2 = "bcfgmpw"
SALTED = {
    "documents": ["text"],
    "events": ["props"],
}


def _cipher(r: int) -> str:
    return CIPHER_SRC[r % 12:] + CIPHER_SRC[: r % 12]


def _cipher2(r: int) -> str:
    k = (r // 12) % 7
    return CIPHER_SRC2[k:] + CIPHER_SRC2[:k]


# Skew mode (r5 verdict task 6): redirect ~20% of the FK traffic of the
# two biggest fact tables onto ONE hot key — a single celebrity user in
# events and a single best-seller part in lineitem. Selector is a
# deterministic mod on a row-stable column; the hot target is the
# MINIMUM existing key (present in replica 0, never shifted), so FK
# integrity holds and PK key spaces stay dense (only FK *references*
# are redirected, never PK values). This is the data the salted-join /
# AQE-skew paths claim to handle; the smoke's skew section actually
# runs them on it.
SKEW_FRACTION_MOD = 5  # 1-in-5 rows -> ~20% on the hot key


def _skew_case(table: str, col: str, shifted: str, hot: int) -> str | None:
    if table == "events" and col == "user_id":
        return (
            f"CASE WHEN event_id % {SKEW_FRACTION_MOD} = 0 "
            f"THEN {hot} ELSE {shifted} END AS user_id"
        )
    if table == "lineitem" and col == "l_partkey":
        return (
            f"CASE WHEN l_orderkey % {SKEW_FRACTION_MOD} = 0 "
            f"THEN {hot} ELSE {shifted} END AS l_partkey"
        )
    return None


def amplify(src: str, dst: str, k: int, skew: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    stride: dict[str, int] = {}
    hot: dict[str, int] = {}
    for ent, (tbl, pk) in ENTITY_PK.items():
        (mx,) = con.sql(
            f"SELECT max({pk}) FROM '{src}/{tbl}.parquet'"
        ).fetchone()
        stride[ent] = int(mx or 0) + 1
        if skew:
            (mn,) = con.sql(
                f"SELECT min({pk}) FROM '{src}/{tbl}.parquet'"
            ).fetchone()
            hot[ent] = int(mn or 0)
    for t in BOUNDED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in TABLES:
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
                if c in ENTITY_OF:
                    off = r * stride[ENTITY_OF[c]]
                    shifted = f"{c} + {off}"
                    sk = (
                        _skew_case(t, c, shifted, hot[ENTITY_OF[c]])
                        if skew
                        else None
                    )
                    parts.append(sk or f"{shifted} AS {c}")
                elif c in SALTED.get(t, []) and r:
                    parts.append(
                        f"translate({c}, "
                        f"'{CIPHER_SRC}{CIPHER_SRC2}', "
                        f"'{_cipher(r)}{_cipher2(r)}') AS {c}"
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
    if skew:
        for tbl, col in (("events", "user_id"), ("lineitem", "l_partkey")):
            (top_n, total) = con.sql(
                f"SELECT max(c), sum(c) FROM (SELECT count(*) AS c "
                f"FROM '{dst}/{tbl}.parquet' GROUP BY {col})"
            ).fetchone()
            print(
                f"skew check {tbl}.{col}: hot key holds "
                f"{top_n}/{total} rows ({top_n / total:.1%})",
                file=sys.stderr,
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_sf1")
    ap.add_argument(
        "--skew", action="store_true",
        help="inject one hot key holding ~20%% of events.user_id and "
        "lineitem.l_partkey rows (use a separate --dst)",
    )
    a = ap.parse_args()
    amplify(a.src, a.dst, a.k, skew=a.skew)
    print(a.dst)


if __name__ == "__main__":
    main()
