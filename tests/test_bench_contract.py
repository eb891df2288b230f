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


# r11 headline revision (r10 verdict task 6): the headline set is now
# ALSO a frozen contract, in two revisions. V1 is the r3-era 34-entry
# membership exactly as benched in BENCH_r03..r10; V2 adds six
# r9/r10-era flagships and is the cross-round baseline from r11 on.
EXPECTED_HEADLINE_V1 = frozenset({
    "corpus_bpe_encode_stats", "corpus_export_shards",
    "corpus_heavy_terms_cms", "corpus_training_pipeline", "doc_chunks",
    "doc_classifier_conformal", "doc_dup_clusters",
    "doc_jaccard_histogram", "doc_minhash_lsh_pairs",
    "doc_ngram_jaccard_pairs", "doc_span_dedup", "doc_term_cosine_pairs",
    "emb_contrastive_pairs", "emb_cosine_topk",
    "emb_cosine_topk_vectorized", "emb_nearest_centroid_confusion",
    "emb_semantic_dedup", "emb_semdedup_kmeans_pipeline",
    "events_anomaly_zscore", "events_resample_gapfill",
    "events_sessionize", "events_transition_matrix",
    "fact_daily_part_agg", "fact_order_line", "orders_market_basket",
    "part_copurchase_pagerank", "part_copurchase_triangles",
    "part_hierarchy_rollup", "part_link_prediction",
    "q10_returned_revenue", "q1_pricing_summary", "q3_unshipped_revenue",
    "q5_nation_revenue", "top3_parts_per_brand",
})

EXPECTED_HEADLINE_V2 = EXPECTED_HEADLINE_V1 | frozenset({
    "part_croston_forecast", "stream_xmr_control_chart",
    "emb_pq_distortion_audit", "doc_video_mp4_metadata",
    "customer_kaplan_meier", "doc_hashed_cosine_topk",
})


def test_headline_v1_membership_frozen():
    assert bench.HEADLINE_V1_34 == EXPECTED_HEADLINE_V1
    assert len(EXPECTED_HEADLINE_V1) == 34


def test_headline_v2_membership_frozen():
    assert bench.HEADLINE_V2_40 == EXPECTED_HEADLINE_V2
    assert len(EXPECTED_HEADLINE_V2) == 40


def test_headline_v2_is_exactly_the_bench_flagged_set():
    """The growing 'value' total and the frozen v2 subtotal must be the
    same measurement until the NEXT revision: every bench=True entry is
    a v2 member and vice versa, so v2 lives in the same artifact with
    zero extra bench cost."""
    flagged = {n for n, q in CATALOG.items() if q.bench}
    assert flagged == EXPECTED_HEADLINE_V2
