"""Spark-vs-DuckDB comparison harness mirroring the driver's t2 gate:
row-count + column-set + order-insensitive canonical value comparison.

Stricter than numeric equality on purpose: decimals compare by their string
rendering (so a scale mismatch — e.g. DECIMAL(:,4) vs DECIMAL(:,2) — fails
even when numerically equal), floats compare bit-exactly (the engine's
determinism rules are designed to make that achievable).
"""

from __future__ import annotations

import datetime
import decimal
import math


def canonical_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest repr uniquely identifies the binary value
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return f"{type(v).__name__}:{v}"


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canonical_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_frames(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    a = canonical_rows(s_cols, s_rows)
    b = canonical_rows(d_cols, d_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"values differ (cols sorted {sorted(s_cols)}):\n"
            f"  spark-only: {diff_a}\n  duck-only: {diff_b}"
        )
    return problems
