"""Frozen bench-contract canary (r7 verdict task 5).

The headline bench set grows as the catalog grows, so round-over-round
headline totals are incomparable by construction. The two FROZEN
subtotals in bench.py — R3_CORE_13 and CORE_LLM_10 — are the
cross-round contract: membership never changes. This suite duplicates
both lists VERBATIM so a drive-by edit to bench.py must consciously
touch this test too (same pattern as tests/test_catalog_window.py).
"""

from __future__ import annotations

import bench

from adventureworks_pysparkjobs_spark.queries import CATALOG

EXPECTED_CORE_13 = frozenset({
    "q1_pricing_summary", "q3_unshipped_revenue", "q5_nation_revenue",
    "q10_returned_revenue", "top3_parts_per_brand", "fact_order_line",
    "fact_daily_part_agg", "events_sessionize", "doc_chunks",
    "doc_ngram_jaccard_pairs", "doc_minhash_lsh_pairs", "emb_cosine_topk",
    "emb_cosine_topk_vectorized",
})

EXPECTED_CORE_LLM_10 = frozenset({
    "corpus_training_pipeline", "doc_chunks", "doc_minhash_lsh_pairs",
    "doc_ngram_jaccard_pairs", "doc_dup_clusters", "doc_span_dedup",
    "emb_cosine_topk", "emb_semdedup_kmeans_pipeline",
    "corpus_bpe_encode_stats", "doc_classifier_conformal",
})


def test_core13_membership_frozen():
    assert bench.R3_CORE_13 == EXPECTED_CORE_13
    assert len(EXPECTED_CORE_13) == 13


def test_core_llm10_membership_frozen():
    assert bench.CORE_LLM_10 == EXPECTED_CORE_LLM_10
    assert len(EXPECTED_CORE_LLM_10) == 10


def test_frozen_members_stay_in_the_bench_set():
    """A frozen member silently losing bench=True (or leaving the
    catalog) would zero its contribution to the subtotal — the exact
    incomparability the contract exists to prevent."""
    for name in sorted(EXPECTED_CORE_13 | EXPECTED_CORE_LLM_10):
        assert name in CATALOG, f"{name} left the catalog"
        assert CATALOG[name].bench, f"{name} lost bench=True"
