"""t2 replica: every catalog query with an oracle must match DuckDB
bit-for-bit (order-insensitive) on the same parquet inputs."""

from __future__ import annotations

import pytest

from adventureworks_pysparkjobs_spark.queries import CATALOG

from .conftest import SF_ORACLE, catalog_entry_params
from .oracle_utils import compare_frames

WITH_ORACLE = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in CATALOG.items() if q.oracle is None)


# Lane split (r11 verdict task 1): driver-window + bench entries run in
# the default lane; the rest of the catalog carries `slow` and is gated
# in the full lane at round close.
@pytest.mark.parametrize("name", catalog_entry_params(WITH_ORACLE))
def test_oracle_match(spark, duck, name):
    q = CATALOG[name]
    sdf = q.builder(spark, SF_ORACLE)
    rel = duck.sql(q.oracle)
    problems = compare_frames(sdf, rel)
    assert not problems, f"{name}: " + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = CATALOG[name]
    sdf = q.builder(spark, SF_ORACLE)
    assert sdf.count() >= 0 and len(sdf.columns) > 0
