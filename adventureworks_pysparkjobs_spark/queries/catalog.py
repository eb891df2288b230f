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


# ---------------------------------------------------------------------------
# Oracle-independence inventory (r7 verdict task 6).
#
# "Oracle-backed" certifies an INDEPENDENT cross-check: DuckDB derives the
# same result from the same parquet via its own SQL. A few entries dilute
# that certification in a declared, bounded way; this registry names every
# one so the catalog-level claim states exactly what is independently
# cross-checked. Classes:
#
#   embeds-builder-literals — the oracle bakes driver-computed values in
#     as literals, so those columns are self-confirming; only the
#     remaining columns are truly cross-checked.
#   wraps-entry-oracle — the oracle is built from ANOTHER entry's oracle
#     text (verbatim reuse, a CTE extension, or a composed UNION of
#     section oracles). DuckDB still executes it independently, but the
#     wrapped portion re-certifies the parent entry's SQL rather than a
#     second hand-derived formulation (declared anti-drift choice for
#     composed pipelines and batch/stream twins).
#   rows-only — no oracle at all (declared non-SQL-expressible);
#     tracked via CatalogQuery.oracle is None, listed here with the
#     necessity justification.
#
# tests/test_catalog_window.py + scripts/catalog_table.py consume this;
# keep class (a) to a handful — each needs a real justification.
ORACLE_INDEPENDENCE: dict[str, tuple[str, str]] = {
    "doc_lsh_band_tuning": (
        "embeds-builder-literals",
        "theoretical S-curve collision probabilities are driver-computed "
        "floats repr-roundtripped into the SQL (pure math of the (bands, "
        "rows) config, not data); the MEASURED collision/pair counts per "
        "config are the independently cross-checked columns",
    ),
    "doc_dup_cluster_histogram": (
        "wraps-entry-oracle",
        "histogram over doc_dup_clusters' oracle verbatim — declared "
        "anti-drift choice so both entries always describe the same "
        "clustering; the histogram aggregation itself is cross-checked",
    ),
    "doc_dedup_keep_best": (
        "wraps-entry-oracle",
        "cluster assignment CTE reuses doc_dup_clusters' oracle; the "
        "survivorship selection/accounting on top is cross-checked",
    ),
    "corpus_dedup_provenance": (
        "wraps-entry-oracle",
        "cluster assignment CTE reuses doc_dup_clusters' oracle (same "
        "anti-drift rationale as keep_best); the keeper selection and "
        "cross-source drop matrix on top are cross-checked",
    ),
    "stream_anomaly_zscore": (
        "wraps-entry-oracle",
        "batch/stream twin: shares events_anomaly_zscore's oracle, "
        "certifying the streaming path reproduces the batch semantics",
    ),
    "events_analytics_pipeline": (
        "wraps-entry-oracle",
        "composed UNION ALL BY NAME of the funnel/retention/anomaly "
        "section oracles — the end-to-end job carries the same gate as "
        "each piece by construction",
    ),
    "orders_audit_pipeline": (
        "wraps-entry-oracle",
        "composed UNION ALL BY NAME of the four audit section oracles",
    ),
    "emb_cosine_topk_vectorized": (
        "rows-only",
        "numpy pairwise summation differs from the sequential fold in "
        "the last ulp — equality to the exact variant is asserted in "
        "tests instead",
    ),
    "stream_stateful_user_totals": (
        "rows-only",
        "applyInPandasWithState running totals have no SQL equivalent "
        "at the micro-batch grain — batch-twin equality is asserted in "
        "tests instead",
    ),
}
