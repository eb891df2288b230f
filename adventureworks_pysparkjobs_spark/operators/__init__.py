"""Operator library: the engine's DataFrame -> DataFrame surface.

Flat re-exports so callers can write
``from adventureworks_pysparkjobs_spark.operators import minhash_lsh_pairs``
without memorizing the module layout. Each name is implemented (and
documented, with scale notes) in its home module.
"""

from .asof import asof_join
from .bpe import bpe_encode, merges_df, train_bpe_merges, word_counts
from .dedup import (
    dedup_against,
    dedup_clusters,
    dedup_keep_first,
    dedup_spans,
    exact_dedup,
    flag_contamination,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_arrays,
    simhash,
    simhash_pairs,
)
from .lm import lm_score, train_bigram_lm
from .multimodal import (
    attach_metadata,
    extract_features,
    payload_stats,
    read_binary_dir,
    resize_images,
    sample_frames,
)
from .relational import (
    dec,
    enforce_schema,
    salted_join,
    sessionize,
    topk_per_group,
    upsert_snapshot,
)
from .sampling import (
    cap_per_group,
    deterministic_sample,
    deterministic_shuffle,
    hash_bucket,
    mixture,
    train_test_split_col,
)
from .packing import pack_sequences
from .profile import key_skew_profile, profile_table
from .similarity import (
    ann_topk_lsh,
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_pandas,
    ivf_topk,
    pq_encode,
    pq_topk,
    pq_train,
    quantize_int8,
    topk_int8,
)
from .text import (
    bpe_tokens,
    chunk_documents,
    clean_lines,
    clean_text,
    fingerprint,
    language_id,
    pii_counts,
    quality_stats,
    redact_pii,
    text_profile,
    token_count,
    tokens,
    winnow_fingerprints,
)

__all__ = [
    "asof_join",
    "bpe_encode",
    "merges_df",
    "train_bpe_merges",
    "word_counts",
    "dedup_against",
    "dedup_clusters",
    "dedup_keep_first",
    "dedup_spans",
    "exact_dedup",
    "flag_contamination",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "shingle_arrays",
    "simhash",
    "simhash_pairs",
    "lm_score",
    "train_bigram_lm",
    "attach_metadata",
    "extract_features",
    "payload_stats",
    "read_binary_dir",
    "resize_images",
    "sample_frames",
    "dec",
    "enforce_schema",
    "salted_join",
    "sessionize",
    "topk_per_group",
    "upsert_snapshot",
    "cap_per_group",
    "deterministic_sample",
    "deterministic_shuffle",
    "hash_bucket",
    "mixture",
    "train_test_split_col",
    "ann_topk_lsh",
    "cosine_near_dup_pairs",
    "cosine_topk",
    "cosine_topk_pandas",
    "ivf_topk",
    "pq_encode",
    "pq_topk",
    "pq_train",
    "quantize_int8",
    "topk_int8",
    "bpe_tokens",
    "clean_lines",
    "clean_text",
    "fingerprint",
    "language_id",
    "pii_counts",
    "quality_stats",
    "redact_pii",
    "text_profile",
    "token_count",
    "tokens",
    "chunk_documents",
    "pack_sequences",
    "key_skew_profile",
    "profile_table",
    "winnow_fingerprints",
]
