from .catalog import CATALOG, CatalogQuery, query

# Importing the modules registers their queries into CATALOG. Order is
# the driver's checked window: the first 50 entries each get a driver
# correctness row; later entries are bonus surface (locally oracle-tested
# all the same — tests/test_oracle.py parametrizes the whole CATALOG).
from . import (  # noqa: E402,F401
    tpch, star, events, docs, vectors, stream, extras, tpch_extra,
    corpus_extra, analytics, governance, composed,
)

# Window packing: the driver correctness-checks exactly the first 50
# CATALOG entries, so the window is pinned EXPLICITLY here rather than
# left as an emergent property of module import order. Every name in
# DRIVER_WINDOW carries a full DuckDB oracle (hash-checkable); rows-only
# entries (the mapInPandas scorer, the stateful user-totals twin) live
# beyond the window with their own property / equality tests. tests/test_catalog_window.py is the canary: it pins
# this exact list, order-sensitive, and asserts oracle coverage.
# r6 rotation (verdict task 5): in — events_transition_matrix,
# doc_jaccard_histogram, events_quantile_sketch,
# supplier_return_rate_wilson (the round-5 representatives); out —
# pivot_unpivot_roundtrip, date_functions_orders,
# string_math_functions_customer, setops_nations (redundant shape
# siblings of rows that stay; all four remain oracle-gated locally).
# r7 rotation (same policy): in — orders_bloom_prefilter,
# part_link_prediction, doc_classifier_conformal,
# customer_second_order_hazard (the round-7 representatives); out —
# top_orders_above_avg, window_order_sequences,
# events_dedup_first_per_key, emb_vector_stats (shape siblings whose
# families stay attested by other window rows; all four remain
# catalog + oracle-gated locally).
# r7 second rotation (late-round representatives): in —
# emb_pca_top_component, doc_source_minhash_overlap,
# events_markov_stationary; out — q10_returned_revenue (join-agg
# family stays via q1/q3/q5), doc_ngram_jaccard_pairs (jaccard family
# stays via doc_jaccard_histogram + doc_minhash_lsh_pairs),
# emb_near_dup_pairs (embedding near-dup stays via emb_cosine_topk +
# emb_semdedup_kmeans_pipeline); all three remain oracle-gated
# locally.
# r8 rotation (third-wave representatives, verdict r7 task 1): in —
# stream_funnel_stages (third applyInPandasWithState op deserves driver
# attestation), doc_dedup_threshold_curve, part_brand_modularity,
# events_resurrections; out — q3_unshipped_revenue (TPC-H join-agg
# family stays via q1/q5), events_quantile_sketch (sketch family stays
# via orders_bloom_prefilter; exact-percentile family oracle-gated
# locally), doc_multilingual_resample (sampling family stays via
# doc_sampling_pipeline), doc_line_clean (text-clean family stays via
# doc_text_profile + corpus_training_pipeline which embeds the clean
# stage); all four remain catalog + oracle-gated locally.
# r8 second rotation (round-8 representatives, same two-rotation policy
# as r7): in — stream_user_state_changes (the FOURTH
# applyInPandasWithState operator deserves driver attestation),
# part_personalized_pagerank, events_kendall_tau, orders_fiscal_rollup;
# out — events_tumbling_5min (windowed-agg family stays via
# stream_tumbling_counts + rollup_cube), corpus_term_stats (term-stats
# family stays via corpus_bm25_topk + doc_text_profile),
# semi_anti_customers (join family stays via outer_join_profiles + q5),
# doc_jaccard_histogram (dedup-observability family stays via
# doc_dedup_threshold_curve + doc_minhash_lsh_pairs); all four remain
# catalog + oracle-gated locally.
# r8 third rotation (continuation-wave representatives): in —
# orders_cramers_v_matrix (the ordered-fold determinism idiom deserves
# driver attestation), corpus_source_hellinger (data-mixing source
# distance, ordered sqrt-fold), doc_isotonic_calibration (PAVA
# calibration, the new ML-ops classifier gate); out —
# supplier_return_rate_wilson (closed-form-stat family stays via
# customer_second_order_hazard + events_markov_stationary),
# doc_source_minhash_overlap (source-similarity family succeeded by
# corpus_source_hellinger; minhash family stays via
# doc_minhash_lsh_pairs + doc_dup_clusters), events_sessionize
# (session construction stays attested via stream_session_windows +
# stream_stateful_sessions, which share its CTE shape); all three
# remain catalog + oracle-gated locally.
# r9 rotation (fourth wave, verdict r8 task 1 — attest the
# continuation-wave representatives that have never carried a driver
# row): in — nation_shift_share (ordered-fold decomposition flagship),
# corpus_csv_roundtrip (adversarial CSV ingest),
# events_conversion_window_curve (attribution-window planning, landed
# post-gate in r8), lineitem_simpson_audit (aggregation-grain audit),
# events_did_estimator (causal diff-in-diff); out —
# events_transition_matrix (Markov family stays via
# events_markov_stationary + stream_user_state_changes, its stateful
# twin), events_kendall_tau (association family stays via
# orders_cramers_v_matrix; attested r8), customer_second_order_hazard
# (closed-form-stat family stays via doc_isotonic_calibration +
# orders_cramers_v_matrix; attested r7+r8), doc_incremental_dedup
# (dedup family stays via doc_exact_dedup + doc_dedup_threshold_curve +
# doc_minhash_lsh_pairs + doc_dup_clusters; attested r5–r8),
# orders_profile (profiling family stays via doc_text_profile +
# lineitem_flag_stats; attested r2–r8); all five remain catalog +
# oracle-gated locally.
# r9 second rotation (round-9 representatives, same multi-rotation
# policy as r7/r8): in — doc_image_dimensions (the new multimodal
# default-codec roundtrip, §2.10 image leg), customer_kaplan_meier
# (censoring-aware survival, the ordered-fold product-limit flagship),
# doc_hashed_cosine_topk (text->hashed-vector->cosine with zero
# injected code, the similarity-seam default's checked surface); out —
# doc_binary_payload (binary-payload family strictly superseded in
# coverage by doc_image_dimensions: same shape + magic sniff + header
# parse; attested r4–r8), doc_exact_dedup (dedup family stays via
# doc_dedup_threshold_curve + doc_minhash_lsh_pairs + doc_dup_clusters;
# attested r1–r8), orders_fiscal_rollup (attested r8; calendar/date
# family stays via dim_date + events_conversion_window_curve); all
# three remain catalog + oracle-gated locally.
# r10 rotation (fifth wave, verdict r9 task 1 — driver-attest the r9
# additions that have never carried a driver row): in —
# doc_bloom_decontamination (sketch-grain benchmark decontamination),
# corpus_unimax_mixture (epoch-capped mixture allocation),
# part_newsvendor_stock (critical-fractile stocking),
# orders_xmr_control_chart (Shewhart individuals+MR),
# doc_audio_metadata (WAV RIFF walk, §2.10 audio leg),
# doc_video_frames (GIF frame sampling, §2.10 video leg),
# emb_centroid_silhouette (cluster-quality gate), orders_quantile_ci
# (order-statistic CI); out — orders_bloom_prefilter (bloom family
# stays via doc_bloom_decontamination; attested r7–r9),
# top3_parts_per_brand (ranking-window family stays via
# customer_kaplan_meier + doc_hashed_cosine_topk row_number stages and
# the cumulative windows in part_newsvendor_stock/orders_quantile_ci;
# attested r1–r9), events_markov_stationary (Markov family stays via
# stream_user_state_changes, its stateful twin; attested r7–r9),
# doc_text_profile (text-profile family stays via doc_chunks +
# corpus_training_pipeline which embeds the clean/profile stages;
# attested r1–r9), doc_minhash_lsh_pairs (dedup family stays via
# doc_dedup_threshold_curve + doc_dup_clusters; attested r2–r9),
# events_resample_gapfill (timeseries family stays via
# events_conversion_window_curve + orders_xmr_control_chart incoming;
# attested r4–r9), doc_sampling_pipeline (sampling/mixture family
# stays via corpus_unimax_mixture incoming; attested r3–r9),
# emb_cosine_topk (embedding-similarity family stays via
# doc_hashed_cosine_topk + emb_semdedup_kmeans_pipeline +
# emb_centroid_silhouette incoming; attested r1–r9); all eight remain
# catalog + oracle-gated locally.
# r11 rotation (sixth wave, verdict r10 task 1 — driver-attest the r10
# additions that have never carried a driver row): in —
# part_croston_forecast (SBC-routed intermittent-demand forecast),
# stream_xmr_control_chart (prequential streaming XmR; its fully
# independent prefix-window oracle makes it the strongest stream
# attestation available), emb_pq_distortion_audit (integer-exact PQ
# retrain), part_forecast_backtest (prequential Croston-vs-SBA with
# the r11 MASE extension), doc_video_mp4_metadata (ISO-BMFF box walk,
# the dominant real video container), doc_audio_flac_metadata (FLAC
# STREAMINFO bitfield), part_abc_xyz_matrix (inventory segmentation),
# corpus_chinchilla_plan (token-budget planning); out —
# orders_xmr_control_chart (attested r10; XmR family stays via
# stream_xmr_control_chart, its prequential stream twin),
# orders_quantile_ci (attested r10; order-statistic family stays via
# part_forecast_backtest's value-grain medians + orders_cramers_v_matrix
# + lineitem_simpson_audit), part_link_prediction (attested r7–r10;
# graph family stays via part_copurchase_pagerank +
# part_personalized_pagerank + part_brand_modularity),
# doc_audio_metadata (attested r10; the WAV walk's family stays via
# doc_audio_flac_metadata, which runs the SAME extract_audio_metadata
# stage), doc_video_frames (attested r10; video family stays via
# doc_video_mp4_metadata), part_newsvendor_stock (attested r10;
# inventory family stays via part_abc_xyz_matrix +
# part_croston_forecast), corpus_unimax_mixture (attested r10;
# corpus-planning family stays via corpus_chinchilla_plan),
# emb_centroid_silhouette (attested r10; embedding-audit family stays
# via emb_pq_distortion_audit + emb_semdedup_kmeans_pipeline +
# emb_pca_top_component); all eight remain catalog + oracle-gated
# locally.
DRIVER_WINDOW: tuple[str, ...] = (
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

_missing = [n for n in DRIVER_WINDOW if n not in CATALOG]
if _missing:  # fail at import with a clear message, not a KeyError mid-pop
    raise RuntimeError(
        f"DRIVER_WINDOW names missing from CATALOG: {_missing}; "
        "update queries/__init__.py when renaming catalog entries"
    )

# Rebuild CATALOG in window-first order; beyond-window entries keep their
# existing relative (registration) order.
_packed = {n: CATALOG[n] for n in DRIVER_WINDOW}
_packed.update((n, q) for n, q in CATALOG.items() if n not in _packed)
CATALOG.clear()
CATALOG.update(_packed)

__all__ = ["CATALOG", "CatalogQuery", "DRIVER_WINDOW", "query"]
