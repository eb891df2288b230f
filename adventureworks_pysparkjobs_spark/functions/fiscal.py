"""4-4-5 fiscal calendar columns (retail/merchandising calendar).

The 4-4-5 calendar divides a fiscal year into 4 quarters of 13 weeks
(periods of 4, 4, and 5 weeks), so every period contains whole weeks and
same-period comparisons aren't skewed by weekday mix — the standard
retail reporting calendar. This implementation is the 52-week
simplification: each fiscal year is exactly 364 days from the epoch
(the occasional 53rd "leap week" of real-world 4-4-5 calendars is NOT
inserted — declared semantics, mirrored in every oracle).

Everything is integer arithmetic on non-negative day offsets from the
fiscal epoch (integer div/mod agree across engines on non-negative
operands — the PPS-sampling portability rule), so fiscal columns are
bit-exact cross-engine and SARGable after materialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Monday 1992-01-06: the first Monday of 1992, before every date in the
# fixture (offsets stay non-negative).
FISCAL_EPOCH = "1992-01-06"
FISCAL_EPOCH_YEAR = 1992


def _off(d: Column) -> Column:
    return F.datediff(d, F.lit(FISCAL_EPOCH))


def _div(c: Column, k: int) -> Column:
    """Exact integer division for non-negative operands: subtract the
    remainder first so the one float division is always by-construction
    exact (numerator a multiple of k), then truncate."""
    return ((c - (c % k)) / k).cast("long")


def fiscal_cols(d: Column) -> dict[str, Column]:
    """All 4-4-5 columns for a date column, as a dict ready for
    ``df.select(..., **fiscal_cols(col))`` style use.

    - fiscal_year: epoch year + completed 52-week years
    - fiscal_quarter: 1..4 (13 weeks each)
    - fiscal_period: 1..12 (4+4+5 weeks inside each quarter)
    - fiscal_week: 1..52 (week within the fiscal year)
    """
    off = _off(d).cast("long")
    # `div` integer division: non-negative offsets, so truncation ==
    # floor == DuckDB // (the portability rule)
    fweek = _div(off, 7)
    fy = _div(fweek, 52)
    wiy = fweek - fy * 52  # 0..51
    q0 = _div(wiy, 13)  # 0..3
    wiq = wiy - q0 * 13  # 0..12
    # 4-4-5 split: weeks 0-3 -> period 1, 4-7 -> 2, 8-12 -> 3
    p0 = (
        F.when(wiq <= 3, F.lit(0))
        .when(wiq <= 7, F.lit(1))
        .otherwise(F.lit(2))
    )
    return {
        "fiscal_year": (F.lit(FISCAL_EPOCH_YEAR) + fy).cast("int"),
        "fiscal_quarter": (q0 + 1).cast("int"),
        "fiscal_period": (q0 * 3 + p0 + 1).cast("int"),
        "fiscal_week": (wiy + 1).cast("int"),
    }


def fiscal_sql(col: str) -> dict[str, str]:
    """DuckDB SQL mirrors of :func:`fiscal_cols` (same integer
    arithmetic, ``//`` == non-negative floor division)."""
    off = f"date_diff('day', DATE '{FISCAL_EPOCH}', CAST({col} AS DATE))"
    fweek = f"({off} // 7)"
    fy = f"({fweek} // 52)"
    wiy = f"({fweek} % 52)"
    q0 = f"({wiy} // 13)"
    wiq = f"({wiy} % 13)"
    p0 = f"(CASE WHEN {wiq} <= 3 THEN 0 WHEN {wiq} <= 7 THEN 1 ELSE 2 END)"
    return {
        "fiscal_year": f"CAST({FISCAL_EPOCH_YEAR} + {fy} AS INTEGER)",
        "fiscal_quarter": f"CAST({q0} + 1 AS INTEGER)",
        "fiscal_period": f"CAST({q0} * 3 + {p0} + 1 AS INTEGER)",
        "fiscal_week": f"CAST({wiy} + 1 AS INTEGER)",
    }
