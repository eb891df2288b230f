"""SQL-string entry point (SURVEY.md §3.3).

The reference has no SQL surface — both jobs are DataFrame programs. This
adds the thin missing layer: register the corpus (or any dict of frames)
as temp views and run ``spark.sql``. Catalyst produces the same plans for
SQL and DataFrame formulations, so the operator library and the SQL
surface are interchangeable per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.corpus import register_views


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a SQL query; if ``sf_dir`` is given, (re)register the corpus
    tables as temp views first so the query can reference them by name."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)


def register(spark: SparkSession, frames: dict[str, DataFrame]) -> None:
    """Register arbitrary DataFrames as temp views (engine-side tables)."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)


def register_catalog_views(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    prefix: str = "op_",
) -> list[str]:
    """Expose catalog operator outputs as SQL temp views — the layer
    that lets a SQL-only consumer query any engine operator
    (``SELECT * FROM op_doc_minhash_lsh_pairs WHERE jaccard > 0.9``)
    and compose operators in SQL.

    Views are LAZY: registering the whole catalog materializes
    nothing; a view's operator pipeline runs only when a query reads
    it, and Catalyst prunes/pushes into the operator plan like any
    subquery. ``names`` restricts the set (default: every batch
    entry; streaming entries are excluded — they run a query to
    completion at build time). Returns the created view names.
    """
    from .queries import CATALOG

    todo = names if names is not None else [
        n for n in CATALOG if not n.startswith("stream_")
    ]
    created = []
    for name in todo:
        view = f"{prefix}{name}"
        CATALOG[name].builder(spark, sf_dir).createOrReplaceTempView(view)
        created.append(view)
    return created
