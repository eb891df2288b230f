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


def _synthetic_summary(timings):
    """The summary dict exactly as bench.main() builds it, with
    worst-case-width numeric fields."""
    return {
        "metric": "catalog_headline_wall_clock",
        "value": 9999.999,
        "unit": "sec",
        "queries": timings,
        "core13_sec": 9999.999,
        "core_llm10_sec": 9999.999,
        "headline_v1_sec": 9999.999,
        "headline_v2_sec": 9999.999,
        "sf": 0.001,
        "n_ok": 40,
        "n_partial": 0,
        "n_failed": 0,
        "gate2x": {
            "ratio_all": 999.999,
            "ratio_excl_pathological": 999.999,
            "ratio_excl_path_v1": 999.999,
            "pass_2x": False,
            "n_dual": 40,
            "n_pathological": 40,
        },
        "core13_guard": "warn",
        "full": "BENCH_FULL.json",
    }


def test_summary_line_keeps_all_40_queries_under_the_cap():
    """r11 regression (verdict task 2): the one-line summary crossed the
    driver's 1900-char stdout-tail cap and silently shed 27/40 per-query
    timings, so PERF_r11 lost per-query visibility. Pin that the CURRENT
    bench membership with worst-case-width timings renders under the cap
    with every query present and no truncation flag."""
    timings = {n: 100.999 for n in sorted(EXPECTED_HEADLINE_V2)}
    line = bench.compact_summary_line(
        _synthetic_summary(timings), bench.R3_CORE_13
    )
    assert len(line) <= bench.SUMMARY_LINE_CAP == 1900
    import json

    parsed = json.loads(line)
    assert set(parsed["queries"]) == EXPECTED_HEADLINE_V2
    assert "queries_truncated_to_core13" not in parsed
    # 2-decimal rounding in the line (3-decimal values live in
    # BENCH_FULL.json)
    assert parsed["queries"]["q1_pricing_summary"] == 101.0


def test_summary_line_overflow_fallback_is_explicit():
    """If a future catalog grows past the cap anyway, the line must shed
    to core13 WITH the explicit flag — never silently."""
    import json

    timings = {f"padded_query_name_{i:04d}_{'x' * 40}": 1.0
               for i in range(80)}
    timings.update({n: 1.0 for n in sorted(bench.R3_CORE_13)})
    line = bench.compact_summary_line(
        _synthetic_summary(timings), bench.R3_CORE_13
    )
    assert len(line) <= bench.SUMMARY_LINE_CAP
    parsed = json.loads(line)
    assert parsed["queries_truncated_to_core13"] is True
    assert set(parsed["queries"]) == bench.R3_CORE_13
