"""Catalog-wide non-vacuity guard (r7 verdict task 2).

An oracle comparison that matches 0 rows against 0 rows attests nothing
beyond "both engines found no rows" — `orders_id_gap_islands` shipped in
r7 exactly that way (dense fixture keys → vacuous 0-vs-0 oracle). This
suite pins that every oracle-backed catalog entry produces at least one
row on the fixture it is gated on, so an entry can never silently go
vacuous again.

Runs at SF_ORACLE (same dir as the oracle gate: sf0.001 locally,
sf0.01 when SPARK_GRAFT_TEST_SF_DIR is set for the driver-grade sweep).
`limit(1).count()` keeps the check cheap — Spark stops at the first
produced row for pipelined plans; aggregates still compute, but only
once and without the DuckDB side.

ALLOWED_EMPTY is the commented allowlist for entries that are genuinely
empty on a clean fixture (audits whose whole point is "no violations").
Keep it short and justified per row; an unexplained empty result is a
regression, not a pass.
"""

from __future__ import annotations

import pytest

from adventureworks_pysparkjobs_spark.queries import CATALOG

from .conftest import SF_ORACLE, catalog_entry_params

# name -> why an empty result is the CORRECT output on a clean fixture.
ALLOWED_EMPTY: dict[str, str] = {}

# Entries whose selective filters find no survivors at the tiny local
# sf0.001 fixture but are non-vacuous at the sf0.01 gate fixture
# (verified: all three return rows at sf0.01). Skipped ONLY at sf0.001;
# the driver-grade sweep (SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01)
# still asserts them.
SPARSE_AT_SF0001 = {
    # needs two same-band payments by one customer within 90 days —
    # ~1.5k orders is below the birthday threshold for the 1000-wide band
    "orders_duplicate_payments",
    # value-share cutoff leaves no part group above threshold at ~200 parts
    "q11_important_stock",
    # needs lineitems shipped between two specific nations in a 2-year
    # window — the 5-nation x ~6k-lineitem fixture misses the pairing
    "q7_volume_shipping",
}

WITH_ORACLE = sorted(n for n, q in CATALOG.items() if q.oracle is not None)


def test_allowlist_names_exist():
    stale = sorted(set(ALLOWED_EMPTY) - set(CATALOG))
    assert stale == [], f"ALLOWED_EMPTY names not in catalog: {stale}"


# Lane split (r11 verdict task 1): see conftest.catalog_entry_params.
@pytest.mark.parametrize("name", catalog_entry_params(WITH_ORACLE))
def test_entry_nonvacuous(spark, name):
    if name in ALLOWED_EMPTY:
        pytest.skip(f"declared-empty audit: {ALLOWED_EMPTY[name]}")
    if name in SPARSE_AT_SF0001 and SF_ORACLE.rstrip("/").endswith("sf0.001"):
        pytest.skip("filter has no survivors at sf0.001; asserted at sf0.01")
    q = CATALOG[name]
    n = q.builder(spark, SF_ORACLE).limit(1).count()
    assert n >= 1, (
        f"{name} returned 0 rows at {SF_ORACLE} — its oracle comparison "
        "is vacuous; fix the entry or add a justified ALLOWED_EMPTY row"
    )
