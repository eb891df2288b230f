"""Sequence packing: fill fixed token budgets with document chunks —
the step between chunking and batch assembly in an LLM training
pipeline (maximizes tokens-per-sequence instead of padding).

Greedy packing is inherently sequential state (a chunk lands in the
current sequence iff it fits), so it cannot be a window/agg expression;
the Spark-first shape is: hash-bucket the corpus, pack each bucket
independently with an Arrow-batched applyInPandas, and namespace
sequence ids by bucket. Parallelism = n_buckets; per-task memory = one
bucket's chunk METADATA (ids + sizes — texts stay columnar in Arrow);
determinism = total order inside each bucket + doc-pinned bucket
assignment (xxhash64), independent of input partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    size_col: str = "n_chunk_tokens",
    doc_col: str = "doc_id",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    n_buckets: int = 64,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Assign every chunk row to a training sequence of at most
    ``max_tokens`` total tokens (greedy first-fit in ``order_cols``
    order; an oversized single chunk gets a sequence of its own).

    Output = input columns + ``seq_id`` (long, globally unique:
    bucket << 32 | per-bucket counter) + ``seq_pos`` (0-based position
    inside the sequence). All chunks of one document share a bucket, so
    consecutive chunks of a document pack into the same or adjacent
    sequences.

    ``bucket_expr`` overrides the default ``xxhash64(doc) % n_buckets``
    bucket assignment (any deterministic per-document int in
    ``[0, 2^31)`` — e.g. a plain ``doc_id % n`` when the packing must be
    reproducible outside Spark, as in the engine-portable oracle).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    import pandas as pd  # noqa: F401 — applyInPandas contract

    if bucket_expr is None:
        bucket_expr = F.pmod(F.xxhash64(F.col(doc_col)), F.lit(n_buckets))
    bucketed = df.withColumn("_bucket", bucket_expr)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in bucketed.schema.fields
    ) + ", seq_id long, seq_pos int"
    order = list(order_cols)

    def pack(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        bucket = int(pdf["_bucket"].iloc[0])
        seq_ids, seq_positions = [], []
        local_seq, running, pos = 0, 0, 0
        for size in pdf[size_col]:
            s = int(size)
            if running > 0 and running + s > max_tokens:
                local_seq += 1
                running, pos = 0, 0
            seq_ids.append((bucket << 32) | local_seq)
            seq_positions.append(pos)
            running += s
            pos += 1
        pdf["seq_id"] = seq_ids
        pdf["seq_pos"] = seq_positions
        return pdf

    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(pack, schema=out_schema)
        .drop("_bucket")
    )
