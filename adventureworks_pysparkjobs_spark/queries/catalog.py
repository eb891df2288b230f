"""Query catalog: the single registry behind ``__spark_entry__``.

Every operator the engine claims (SURVEY.md §2) is exercised by at least one
catalog entry. An entry couples

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first implementation,
  built from the operator library, and
- ``oracle`` — an equivalent ANSI-SQL string executable by DuckDB over the
  same parquet tables (or ``None`` for genuinely non-SQL-expressible
  operators, which get a weaker rows-only check).

Cross-engine determinism rules (see tests/test_oracle.py, derived
empirically — Spark casts double->decimal through the double's shortest
decimal string, DuckDB through the binary value):

1. Never aggregate raw doubles: cast each value to a pinned DECIMAL first,
   then SUM — decimal addition is exact and associative, so partition order
   cannot change the result. Cast *inputs* before multiplying, never the
   double product.
2. Averages: ``CAST(sum_decimal AS DOUBLE) / count`` in BOTH engines — one
   IEEE division of identical operands is bit-identical.
3. DuckDB ``sum(INTEGER)`` returns HUGEINT (int128): wrap integer sums in
   ``CAST(... AS BIGINT)`` on the oracle side.
4. Window ``ORDER BY`` keys must form a unique total order (append the PK);
   Spark sorts NULLs first, DuckDB last, so order on non-null keys only.
5. ``dayofweek``: Spark is 1=Sunday, DuckDB ``dayofweek()`` is 0=Sunday.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogQuery:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


CATALOG: dict[str, CatalogQuery] = {}


def query(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in CATALOG:
            raise ValueError(f"duplicate catalog query {name!r}")
        CATALOG[name] = CatalogQuery(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
            bench=bench,
        )
        return fn

    return deco
