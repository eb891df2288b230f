"""Driver-window canary.

The driver correctness-checks exactly the first 50 CATALOG entries
(registration order). The window is pinned explicitly in
queries/__init__.py:DRIVER_WINDOW; this suite is the canary that an
innocent module reorder / rename / new registration cannot silently
evict an oracle-backed row from the checked window.
"""

from __future__ import annotations

from adventureworks_pysparkjobs_spark.queries import CATALOG, DRIVER_WINDOW

# The intended window, duplicated VERBATIM from queries/__init__.py on
# purpose: a drive-by edit to DRIVER_WINDOW must also consciously touch
# this test, or the canary fires.
EXPECTED_WINDOW = (
    "q1_pricing_summary",
    "part_copurchase_pagerank",
    "lineitem_flag_stats",
    "corpus_training_pipeline",
    "rollup_cube_order_stats",
    "nation_shift_share",
    "emb_semdedup_kmeans_pipeline",
    "stream_funnel_stages",
    "q5_nation_revenue",
    "stream_xmr_control_chart",
    "corpus_csv_roundtrip",
    "outer_join_profiles",
    "corpus_bm25_topk",
    "doc_bloom_decontamination",
    "orders_cramers_v_matrix",
    "part_forecast_backtest",
    "part_croston_forecast",
    "doc_hashed_cosine_topk",
    "doc_dedup_threshold_curve",
    "part_brand_modularity",
    "events_did_estimator",
    "dim_customer_geo",
    "dim_part",
    "dim_date",
    "fact_order_line",
    "fact_daily_part_agg",
    "events_semistructured",
    "stream_user_state_changes",
    "doc_isotonic_calibration",
    "events_asof_attribution",
    "doc_classifier_conformal",
    "customer_kaplan_meier",
    "doc_audio_flac_metadata",
    "doc_chunks",
    "corpus_source_hellinger",
    "doc_video_mp4_metadata",
    "part_abc_xyz_matrix",
    "doc_image_dimensions",
    "corpus_chinchilla_plan",
    "part_personalized_pagerank",
    "doc_dup_clusters",
    "emb_pq_distortion_audit",
    "emb_pca_top_component",
    "events_conversion_window_curve",
    "stream_tumbling_counts",
    "stream_dedup_keys",
    "stream_session_windows",
    "stream_stateful_sessions",
    "events_resurrections",
    "lineitem_simpson_audit",
)


def test_window_is_exactly_the_intended_50():
    assert list(CATALOG)[:50] == list(EXPECTED_WINDOW)


def test_driver_window_constant_matches():
    assert tuple(DRIVER_WINDOW) == EXPECTED_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_every_window_row_is_oracle_backed():
    """The whole point of the packing: zero rows-only entries inside the
    driver's checked window."""
    missing = [n for n in list(CATALOG)[:50] if CATALOG[n].oracle is None]
    assert missing == [], f"rows-only entries inside the window: {missing}"


def test_beyond_window_entries_still_registered():
    """Demoted rows-only entries must stay in the catalog (they keep
    their local tests and driver rows-only checks beyond the window)."""
    beyond = set(list(CATALOG)[50:])
    for name in (
        "emb_ann_topk",
        "emb_cosine_topk_vectorized",
        "stream_stateful_user_totals",
        "corpus_bpe_merges",
        # r6 out-rotated shape siblings — still catalog + oracle-gated
        "pivot_unpivot_roundtrip",
        "date_functions_orders",
        "string_math_functions_customer",
        "setops_nations",
        # r7 out-rotated shape siblings — still catalog + oracle-gated
        "top_orders_above_avg",
        "window_order_sequences",
        "events_dedup_first_per_key",
        "emb_vector_stats",
        # r8 out-rotated shape siblings — still catalog + oracle-gated
        "q3_unshipped_revenue",
        "events_quantile_sketch",
        "doc_multilingual_resample",
        "doc_line_clean",
        # r8 second rotation — still catalog + oracle-gated
        "events_tumbling_5min",
        "corpus_term_stats",
        "semi_anti_customers",
        "doc_jaccard_histogram",
        # r9 out-rotated shape siblings — still catalog + oracle-gated
        "events_transition_matrix",
        "events_kendall_tau",
        "customer_second_order_hazard",
        "doc_incremental_dedup",
        "orders_profile",
        # r9 second rotation — still catalog + oracle-gated
        "doc_binary_payload",
        "doc_exact_dedup",
        "orders_fiscal_rollup",
        # r10 out-rotated shape siblings — still catalog + oracle-gated
        "orders_bloom_prefilter",
        "top3_parts_per_brand",
        "events_markov_stationary",
        "doc_text_profile",
        "doc_minhash_lsh_pairs",
        "events_resample_gapfill",
        "doc_sampling_pipeline",
        "emb_cosine_topk",
        # r11 out-rotated shape siblings — still catalog + oracle-gated
        "orders_xmr_control_chart",
        "orders_quantile_ci",
        "part_link_prediction",
        "doc_audio_metadata",
        "doc_video_frames",
        "part_newsvendor_stock",
        "corpus_unimax_mixture",
        "emb_centroid_silhouette",
    ):
        assert name in beyond, f"{name} fell out of the catalog"


# Entries that are rows-only BY DECLARED NECESSITY (non-SQL-expressible:
# numpy pairwise-summation scorer, the stateful streaming twin).
# Anything else losing its oracle is a regression. (corpus_bpe_merges
# left this list in r6: the training loop unrolls into n_merges chained
# MATERIALIZED CTE stages — see queries/extras.py:_bpe_oracle.)
ROWS_ONLY_ALLOWED = {
    "emb_cosine_topk_vectorized",
    "stream_stateful_user_totals",
}


def test_oracle_independence_inventory_consistent():
    """r7 verdict task 6: the declared oracle-independence registry must
    (1) name only real catalog entries, (2) cover every rows-only entry
    and nothing oracle-backed under the rows-only class, and (3) keep
    the self-confirming class-(a) set to a handful."""
    from adventureworks_pysparkjobs_spark.queries.catalog import (
        ORACLE_INDEPENDENCE,
    )

    valid = {"embeds-builder-literals", "wraps-entry-oracle", "rows-only"}
    assert set(ORACLE_INDEPENDENCE) <= set(CATALOG)
    for name, (cls, why) in ORACLE_INDEPENDENCE.items():
        assert cls in valid, f"{name}: unknown class {cls}"
        assert len(why) > 20, f"{name}: justification too thin"
    declared_rows_only = {
        n for n, (c, _) in ORACLE_INDEPENDENCE.items() if c == "rows-only"
    }
    actual_rows_only = {n for n, q in CATALOG.items() if q.oracle is None}
    assert declared_rows_only == actual_rows_only
    n_literal = sum(
        1 for c, _ in ORACLE_INDEPENDENCE.values()
        if c == "embeds-builder-literals"
    )
    assert n_literal <= 3, "self-confirming oracle class must stay rare"


def test_whole_catalog_names_unique_and_oracle_backed():
    """Window-eviction insurance: every catalog name is unique (the
    registry raises on duplicates, but this also catches rebuild-time
    clobbering in queries/__init__.py), and every entry beyond the
    window still carries an oracle unless it is on the declared
    rows-only allowlist — so a rename at entry #51+ can never silently
    shift a beyond-window entry into rows-only ambiguity."""
    names = list(CATALOG)
    assert len(names) == len(set(names))
    assert len(names) >= 143, f"catalog shrank to {len(names)} entries"
    missing = sorted(
        n for n, q in CATALOG.items()
        if q.oracle is None and n not in ROWS_ONLY_ALLOWED
    )
    assert missing == [], f"entries silently lost their oracle: {missing}"
    stale = sorted(ROWS_ONLY_ALLOWED - set(names))
    assert stale == [], f"rows-only allowlist names not in catalog: {stale}"
