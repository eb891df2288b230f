"""Round-4 corpus operators beyond the pinned driver window: exact
stratified sampling and inverted-index construction. Same local oracle
gate as everything else (tests/test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ..operators.sampling import stratified_sample
from ..sources.corpus import load_table
from .catalog import query

# Mirrors queries/docs.py:_TOKS (operators/text.py:tokens).
_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"


@query(
    "doc_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM ranked
    WHERE rn <= FLOOR(0.3 * CAST(n AS DOUBLE))
    """,
    tags=("sampling", "stratified", "exact-quota", "window"),
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 30%-per-source stratified sample
    (operators/sampling.py:stratified_sample): every stratum keeps
    exactly floor(0.3 * n) documents, chosen by deterministic md5
    order — where hash-threshold sampling (doc_sampling_pipeline)
    wobbles binomially per stratum. Rank and stratum size share one
    shuffle; membership is a pure function of doc_id, so the SQL oracle
    replays the quota exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return stratified_sample(
        docs, group_col="source", frac=0.3, key_col="doc_id"
    )


@query(
    "corpus_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, t.token
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents),
           unnest(toks) AS t(token)
    ),
    df_tbl AS (
      SELECT token, COUNT(*) AS doc_freq
      FROM tok GROUP BY token
      HAVING COUNT(*) BETWEEN 3 AND 200
    )
    SELECT d.token, d.doc_freq,
           array_to_string(list_sort(list(t.doc_id))[1:20], ',')
             AS postings_csv
    FROM tok t JOIN df_tbl d ON t.token = d.token
    GROUP BY d.token, d.doc_freq
    """,
    tags=("text", "index", "postings", "search"),
)
def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token -> posting-list index (operators/text.py:inverted_index)
    with df in [3, 200] and postings capped at 20 ids: document
    frequency is computed count-only FIRST and out-of-band tokens are
    dropped before any posting list materializes, so stop-token lists
    never exist anywhere in the plan. The capped CSV posting string is
    the engine-portable export shape the oracle reproduces exactly
    (sorted ids, same slice)."""
    return TX.inverted_index(
        load_table(spark, sf_dir, "documents"),
        min_df=3,
        max_df=200,
        max_postings=20,
    )
