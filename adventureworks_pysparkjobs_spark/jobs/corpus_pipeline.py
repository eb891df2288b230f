"""End-to-end training-corpus pipeline: the LLM-data surface composed
into one job, raw documents -> packed training sequences.

This is the "a user could switch" demonstration for the extension
operators (COVERAGE.md §2.10): every stage is one of the tested library
operators, chained the way a 100 TB curation run would chain them, with
every decision a pure function of content keys (reproducible across
runs, partitionings and engines):

1. C4-style quality filter        — pushdown row predicates, no shuffle
2. exact dedup                    — one shuffle on the content digest
3. cross-document span dedup      — partial-aggregable keep-first
4. MinHash-LSH near-dup removal   — banded candidates, cluster rep = min id
5. test-set decontamination       — benchmark n-grams broadcast (optional)
6. weighted source mixture        — per-source salted hash sampling (optional)
7. deterministic shuffle order    — salted-md5 permutation key, realized
                                    as the packing order (zero shuffles:
                                    a physical global sort here would be
                                    discarded by the packing exchange)
8. context-window chunking        — per-row build, then explode
9. greedy sequence packing        — hash-bucketed first-fit, applyInPandas

Shuffle budget of the whole pipeline: digest-groupBy (2), span agg+join
(3-4), LSH bands (5), packing bucket exchange (9) — each keyed on
content hashes (uniform, skew-free by construction). Stages 1, 5, 6, 7,
8 add none.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators import text as TX
from ..operators.dedup import (
    dedup_clusters,
    dedup_spans,
    exact_dedup,
    flag_contamination,
    minhash_lsh_pairs,
)
from ..operators.packing import pack_sequences
from ..operators.sampling import mixture, shuffle_key
from ..sources.corpus import load_table


def c4_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    max_punct_ratio: float = 0.2,
    min_distinct_ratio: float = 0.05,
) -> DataFrame:
    """C4-style quality gate: token-count band, punctuation ceiling,
    distinct-token floor. Pure row predicates — no shuffle, and the
    token-count band prunes before any downstream work."""
    t = TX.tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(text_col)
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ).cast("double") / n_chars
    distinct_ratio = F.size(F.array_distinct(t)).cast("double") / n_tokens
    return df.filter(
        n_tokens.between(min_tokens, max_tokens)
        & (punct_ratio < max_punct_ratio)
        & (distinct_ratio > min_distinct_ratio)
    )


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    benchmark: DataFrame | None = None,
    seen: DataFrame | None = None,
    rates: dict[str, float] | None = None,
    span_tokens: int = 16,
    chunk_tokens: int = 32,
    overlap: int = 8,
    max_seq_tokens: int = 64,
    shuffle_salt: str = "epoch0",
    metrics: dict[str, Observation] | None = None,
    pack_buckets: int = 64,
    pack_bucket_expr: Column | None = None,
) -> DataFrame:
    """Run the full curation pipeline over ``{sf_dir}/documents.parquet``
    and return packed training sequences: one row per chunk with
    (doc_id, chunk_id, chunk_text, n_chunk_tokens, source, seq_id,
    seq_pos).

    ``benchmark`` (optional) drops documents sharing 8-grams with an
    eval set; ``seen`` (optional) is a prior snapshot's digest frame
    (``content_hash`` column, the ``exact_dedup`` output shape) — rows
    whose content was already ingested are dropped before in-batch
    dedup, making the whole pipeline INCREMENTAL across crawl batches;
    ``rates`` (optional) subsamples per source before chunking (keys =
    distinct values of the documents' ``source`` column).

    ``metrics`` (optional) is filled with per-phase ``Observation``
    counters (``{phase: Observation}``; read ``obs.get["rows"]`` after
    materializing the result). Observations are computed INSIDE the same
    actions that run the pipeline — at 100 TB the per-phase row counts a
    curation dashboard needs cost zero extra scans, unlike a count()
    per phase which would replay the whole lineage each time.
    """

    def observe(df: DataFrame, phase: str) -> DataFrame:
        if metrics is None:
            return df
        obs = Observation(phase)
        metrics[phase] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    docs = load_table(spark, sf_dir, "documents")
    kept = observe(c4_quality_filter(docs), "quality")

    # 1b. cross-snapshot dedup: content already in a prior ingest never
    # re-enters. Digest anti-join on the uniform hash — the seen side is
    # a 32-byte-per-doc projection, so at 100 TB this stays a cheap
    # (often broadcast) join, not a re-dedup of history.
    if seen is not None:
        kept = observe(
            kept.withColumn("content_hash", F.sha2(F.col("text"), 256))
            .join(seen.select("content_hash"), "content_hash", "left_anti")
            .drop("content_hash"),
            "seen_dedup",
        )

    # 2. exact dedup: survivor id per content digest, semi-join back.
    # The pre-dedup frame is referenced TWICE here (digest aggregate +
    # semi-join left side) and the post-dedup frame twice again by the
    # span step (span aggregate + rewrite join) — uncached, the C4
    # gate's corpus-wide tokenize/regex work would replay FOUR times
    # before the first lineage cut. Cache both generations
    # MEMORY_AND_DISK; they are explicitly unpersisted right after the
    # span checkpoint materializes, so the extra footprint is bounded
    # to stages 1-3.
    # (Measured and rejected: _spread-ing this frame before the cache.
    # The front-half singles it would parallelize cost ~1.5 s serialized
    # at sf0.1, but the spread exchange plus 32-task scheduling on four
    # downstream map sides cost MORE (best-of-3 4.6 -> 5.6 s); the LSH
    # phase — the corpus-heavy consumer — already _spreads its own input
    # inside shingle_arrays.)
    kept = kept.cache()
    _pre_exact = kept
    survivors = exact_dedup(kept).select(F.col("keep_id").alias("doc_id"))
    kept = observe(
        kept.join(survivors, "doc_id", "left_semi"), "exact_dedup"
    ).cache()
    _pre_span = kept

    # 3. span dedup rewrites text to the surviving spans only. Documents
    # reduced to nothing (pure boilerplate) fall out via the token floor.
    # localCheckpoint truncates the lineage here: the deduped frame feeds
    # FOUR consumers (LSH, anti-join, decontamination, chunking), which
    # would otherwise each replay stages 1-3 (on a cluster this is the
    # point to checkpoint to durable storage between pipeline phases).
    spans = dedup_spans(kept, span_tokens=span_tokens)
    kept = observe(
        kept.drop("text")
        .join(spans.select("doc_id", F.col("text_dedup").alias("text")), "doc_id")
        .filter(F.size(TX.tokens("text")) >= 1),
        "span_dedup",
    ).localCheckpoint()
    _pre_span.unpersist()
    _pre_exact.unpersist()

    # 4. near-dup removal: cluster representatives (min doc_id) survive.
    pairs = minhash_lsh_pairs(kept)
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    kept = observe(kept.join(losers, "doc_id", "left_anti"), "near_dup")

    # 5. decontamination against the eval set (broadcast probe join).
    if benchmark is not None:
        clean = flag_contamination(kept, benchmark, n=8).filter(
            ~F.col("contaminated")
        )
        kept = kept.join(clean.select("doc_id"), "doc_id", "left_semi")

    # 6. weighted source mixture (absolute keep-rates per source).
    if rates is not None:
        kept = mixture(
            {
                name: kept.filter(F.col("source") == name)
                for name in sorted(rates)
            },
            rates,
            key_col="doc_id",
            source_col="mix_source",
        ).drop("mix_source")

    # 7-9. shuffle -> chunk -> pack. The shuffle is realized as the
    # PACKING ORDER, not a physical sort: packing's bucket exchange
    # would destroy any upstream global orderBy anyway (a full-corpus
    # range-sort whose order the next shuffle discards is pure waste at
    # 100 TB), so the md5 permutation key — sampling.py:shuffle_key,
    # the same formula deterministic_shuffle sorts by — orders chunks
    # inside each pack bucket instead. Training sequences thus mix
    # sources/time instead of following ingestion locality, at the cost
    # of zero extra shuffles. Second lineage cut: the survivor set is
    # final here.
    # `source` rides through the chunk explode (carry_cols) instead of
    # re-reading documents.parquet and joining the doc-grain projection
    # back onto the CHUNK-grain frame — the survivor set already carries
    # it, so the join (and the corpus's second doc_id/source scan) was
    # pure waste at 100 TB. Column order is unchanged: carry columns
    # append after the chunk fields, exactly where the join put them.
    chunks = (
        TX.chunk_documents(
            kept.localCheckpoint(), chunk_tokens=chunk_tokens,
            overlap=overlap, carry_cols=("source",),
        )
        .withColumn("_shuffle_ord", shuffle_key("doc_id", shuffle_salt))
    )
    # pack_bucket_expr: default None -> xxhash64 doc buckets; pass a plain
    # modulus (as the catalog's oracle-backed entry does) when the packing
    # must be replayable outside Spark.
    packed = pack_sequences(
        chunks,
        max_tokens=max_seq_tokens,
        order_cols=("_shuffle_ord", "doc_id", "chunk_id"),
        n_buckets=pack_buckets,
        bucket_expr=pack_bucket_expr,
    )
    return observe(packed.drop("_shuffle_ord"), "packed")
