"""Plan-shape guarantees across the whole catalog + scale idioms
(bucketed co-located joins, salted skew joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.relational import salted_join
from adventureworks_pysparkjobs_spark.plans.inspect import physical_plan
from adventureworks_pysparkjobs_spark.queries import CATALOG
from adventureworks_pysparkjobs_spark.sources.corpus import load_table

from .conftest import SF_SMOKE, catalog_entry_params

# Queries allowed to contain a broadcast nested-loop/cartesian by design
# (deliberate small-side cross joins).
CROSS_OK = {
    "setops_nations",  # deliberate broadcast cross rider (region x segments)
    "top_orders_above_avg",
    "q22_dormant_rich_customers",  # 1-row scalar-subquery broadcast cross
    "events_key_skew",  # 1-row total-count broadcast cross
    "q11_important_stock",  # 1-row threshold scalar-subquery broadcast cross
    "orders_market_basket",  # 1-row n_baskets broadcast cross
    "orders_market_basket_triples",  # 1-row n_baskets broadcast cross
    "doc_dsir_weights",  # two 1-row feature-total broadcast crosses
    "corpus_collocations",  # 1-row corpus-word-total broadcast cross
    "doc_quality_quartiles",  # 1-row total-count broadcast cross
    "corpus_vocab_growth",  # two 1-row bucket-width broadcast crosses
    "customer_rfm_segments",  # three 1-row quartile-total broadcast crosses
    "customer_value_quadrants",  # two 1-row exact-median broadcast riders
    "orders_benford_audit",  # 1-row total-count broadcast cross
    "orders_audit_pipeline",  # same benford 1-row total cross via composition
    "corpus_bm25_topk",  # 1-row corpus-totals broadcast cross
    "lang_temperature_mixture",  # 1-row normalizer broadcast cross
    "doc_multilingual_resample",  # same normalizer cross via composition
    "corpus_langid_kappa",  # two 1-row riders (totals x marginal-cross)
    "customer_t_closeness",  # 1-row global-total (N) broadcast cross
    "orders_seasonality_index",  # 1-row grand-average broadcast cross
    "customer_reident_risk",  # 1-row class-totals broadcast cross
    "part_copurchase_assortativity",  # 1-row moment-sums x node-count cross
    "doc_tfidf_keywords",  # 1-row doc-count (N) broadcast cross
    "corpus_rank_fusion",  # 1-row corpus-totals cross via bm25 composition
    "customer_second_order_hazard",  # 1-row observation-horizon cross
    "events_bootstrap_ci",  # 1-row day-count/total broadcast cross
    "customer_feature_store",  # 1-row as-of-date broadcast cross
    # dense day x type grid: BOTH sides aggregate-reduced (calendar-
    # bounded distinct days x enum-bounded distinct types) before the
    # cross — grid size is span x |types|, independent of fact rows
    "events_kendall_tau",

    "emb_cosine_topk",
    "emb_contrastive_pairs",  # broadcast-anchor scoring + negative candidates
    "emb_cosine_topk_vectorized",
    # int8/pq methods score broadcast queries against the compressed
    # corpus by design (brute force with 4x/32x less scan width); the
    # LSH/IVF methods in the same union stay bucketed equi-joins.
    "emb_ann_topk",
    # 1-row n_queries broadcast rider + the exact-anchor comparison
    # joining the contract-bounded query sample (emb_ann_topk's shape)
    "emb_ivf_nprobe_curve",
    # same broadcast-query-sample contract as emb_cosine_topk (it IS
    # cosine_topk + a label-vote reduction)
    "emb_knn_label_agreement",
    # B^2 interval expansion + B^3 minimax join over the BIN-GRAIN
    # frame (enum-bounded ~tens of rows regardless of corpus size);
    # the inequality joins plan as broadcast nested loops by design
    "doc_isotonic_calibration",
    "events_value_kruskal_wallis",  # 1-row tie-term broadcast cross
    # same broadcast-query-sample contract as emb_cosine_topk with
    # queries = the audit sample (bounded by contract at scale)
    "emb_hubness_audit",
    "customer_mahalanobis_outliers",  # 1-row moment rider broadcast cross
    # two 1-row riders (xbar/sigma stats, curve array) + the KM-idiom
    # day-frame prefix folds — all broadcast sides are 1-row aggregates
    "orders_ewma_control_chart",
    # 4-row budget enum grid x 1-row corpus-token-supply rider
    "corpus_chinchilla_plan",
    "orders_revenue_runs_test",  # 1-row exact-median broadcast rider
    "lineitem_simpson_audit",  # 1-row pooled-moment broadcast rider
    # same audit-sample broadcast contract as emb_hubness_audit
    "emb_cosine_histogram",
    "orders_revenue_drawdown",  # 1-row worst-drawdown broadcast rider
    "doc_dup_quality_odds",  # 1-row exact-median broadcast rider
    "nation_shift_share",  # 1-row grand-total broadcast rider
    # two 1-row riders (horizon date, gap-day-bounded curve array)
    "customer_kaplan_meier",
    # day x day sign grid: BOTH sides aggregate-reduced to the
    # calendar-bounded day frame before the non-equi join (same
    # contract as events_kendall_tau)
    "events_pettitt_changepoint",
    # 1-row normalizer rider (ordered-fold Σ N_h·S_h + exact total)
    "doc_neyman_allocation",
    # 5-row enum threshold-grid broadcast cross (bounded fan-out, same
    # contract as doc_dedup_threshold_curve's grid)
    "doc_quality_threshold_curve",
    # two 6-row enum degree-grid broadcast crosses (bounded fan-out)
    "part_copurchase_rich_club",
    # 8-row limit-reduced coarse-centroid rider crossed with corpus and
    # query sample; the exact baseline is the broadcast-query-sample
    # contract of emb_ann_topk / emb_cosine_topk (bounded audit sample)
    "emb_ivfpq_adc_recall",
    "emb_ivfpq_rerank_recall",  # same contract + constant 20-row/query rescore
}

BATCH_QUERIES = sorted(
    n for n, q in CATALOG.items() if not n.startswith("stream_")
)


@pytest.mark.parametrize("name", catalog_entry_params(BATCH_QUERIES))
def test_no_unintended_cartesian(spark, name):
    df = CATALOG[name].builder(spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
    if name not in CROSS_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an unintended nested-loop join"
        )


def test_minhash_reuses_cached_shingles(spark):
    """minhash_lsh_pairs derives signatures AND verification from one
    cached shingle-array frame: the plan must read the cache (multiple
    InMemoryTableScans), not re-shingle the corpus per consumer."""
    from adventureworks_pysparkjobs_spark.operators.dedup import minhash_lsh_pairs

    df = minhash_lsh_pairs(
        load_table(spark, SF_SMOKE, "documents"),
        num_hashes=8, bands=4, n=5, threshold=0.5,
    )
    plan = physical_plan(df)
    assert plan.count("InMemoryTableScan") >= 2, (
        "shingle arrays not reused via cache:\n" + plan[:1200]
    )


def test_simhash_sketch_is_shuffle_free(spark):
    """The per-row simhash build must plan NO aggregation exchange and no
    groupBy — the only allowed Exchange is the explicit parallelism
    repartition (_spread)."""
    from adventureworks_pysparkjobs_spark.operators.dedup import simhash

    plan = physical_plan(simhash(load_table(spark, SF_SMOKE, "documents")))
    assert plan.count("Exchange") <= 1, plan[:1200]
    assert "HashAggregate" not in plan, (
        "simhash regressed to explode+groupBy:\n" + plan[:1200]
    )


def test_ann_lsh_is_bucket_equijoin(spark):
    """ann_topk_lsh must join corpus and queries with a hash join on the
    SRP bucket — never a nested loop over all pairs."""
    from adventureworks_pysparkjobs_spark.operators.similarity import ann_topk_lsh
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    plan = physical_plan(ann_topk_lsh(emb, q, k=5, num_planes=4, dim=64))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan[:1200]


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, SF_SMOKE, "orders").select("l_orderkey", "o_totalprice") \
        if False else load_table(spark, SF_SMOKE, "orders") \
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(od, "l_orderkey").count()
    salted = salted_join(li, od, "l_orderkey", salt_buckets=4).count()
    assert plain == salted


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the key
    plans no Exchange on either side."""
    # spark.sql.warehouse.dir is static; the default ./spark-warehouse is
    # fine for a managed-table roundtrip — tables are dropped in finally.
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    # Disable broadcast so the join would need a shuffle if not co-located.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        j.count()
        plan = physical_plan(j)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_lake_write_prunes(spark, tmp_path):
    """Facts written with partitionBy get partition pruning on read:
    the reference's flat lake (SURVEY §4.1 'partition pruning: n/a')
    cannot do this — our sink can."""
    from adventureworks_pysparkjobs_spark.sinks.parquet import write_lake_table
    from adventureworks_pysparkjobs_spark.plans.inspect import physical_plan

    od = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_lake_table(od, str(tmp_path), "sales", "orders", partition_by="order_year")
    back = spark.read.parquet(f"{tmp_path}/parquet/sales/orders").filter(
        F.col("order_year") == 1997
    )
    n = back.count()
    assert n == od.filter(F.year("o_orderdate") == 1997).count() and n > 0
    plan = physical_plan(back)
    assert "PartitionFilters: [" in plan and "order_year" in plan.split(
        "PartitionFilters"
    )[1][:120], "partition filter did not reach the scan"


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """A selective filter on the dim side of a shuffle join injects a
    runtime bloom filter (might_contain over the join key) into the fact
    side's scan stage, pruning fact rows BEFORE the shuffle. At real
    scale this fires out of the box (application-side threshold 10 GB);
    the toy fact is below it, so the thresholds are lowered here only to
    assert the mechanism is available and planned."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    li = load_table(spark, SF_SMOKE, "lineitem")
    od = load_table(spark, SF_SMOKE, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        j = li.join(
            od.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == od.o_orderkey,
        )
        plan = physical_plan(j)
        assert "might_contain" in plan, f"no runtime bloom filter:\n{plan[:1500]}"
        assert "bloom_filter_agg" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_doc_chunks_one_scan_one_pack_exchange(spark):
    """Chunk + pack must be one scan, one shuffle. Chunking is scan +
    project + explode with chunk texts built per-row BEFORE the explode
    (no aggregation, no exchange of its own); the only Exchange in the
    plan is the pack_sequences hashpartitioning on the bucket key
    feeding FlatMapGroupsInPandas."""
    plan = physical_plan(CATALOG["doc_chunks"].builder(spark, SF_SMOKE))
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "_bucket" in plan[plan.index("Exchange"):][:200], plan[:1500]
    assert plan.count("Scan parquet") == 1, plan[:1200]
    assert "FlatMapGroupsInPandas" in plan, plan[:1200]
    assert "HashAggregate" not in plan, plan[:1200]


def test_window_family_shares_one_exchange(spark):
    """All three window specs of window_order_sequences (unframed, framed,
    date-only) partition on o_custkey; the date-only sort is a prefix of
    the full sort, so the whole family must plan exactly ONE Exchange."""
    plan = physical_plan(
        CATALOG["window_order_sequences"].builder(spark, SF_SMOKE)
    )
    assert plan.count("Exchange") == 1, plan[:1500]


def test_orders_profile_single_scan(spark):
    """profile_table computes every per-column measure in one aggregation
    pass: exactly one scan of the input, no joins."""
    plan = physical_plan(CATALOG["orders_profile"].builder(spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_dedup_spans_avoids_window_hotspot(spark):
    """Span keep-first must be the partial-aggregable min(struct) form,
    not a row_number window over span_text (a boilerplate span would
    materialize one giant window partition)."""
    from adventureworks_pysparkjobs_spark.operators.dedup import dedup_spans

    plan = physical_plan(dedup_spans(load_table(spark, SF_SMOKE, "documents")))
    assert "Window" not in plan, plan[:1200]


def test_flag_contamination_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast — the corpus side joins
    without a shuffle (the whole point at 100 TB vs a tiny eval suite)."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        flag_contamination,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = physical_plan(
        flag_contamination(docs, docs.filter(F.col("doc_id") % 100 == 0))
    )
    assert "BroadcastHashJoin" in plan, plan[:1200]


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew handling: a hot join key (1/3 of all rows) makes AQE
    re-plan the sort-merge join with the skewed partition split into
    subpartitions (skew=true in the final adaptive plan) — the engine's
    answer to skewed 100 TB joins, complementing the explicit
    salted_join. Thresholds are lowered to make toy data look skewed;
    results must be identical either way."""
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 3 == 0, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 97).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = left.join(right, "k")
        n = len(j.collect())  # collect() finalizes THIS frame's adaptive plan
        assert n == 300000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_doc_line_clean_single_scan_no_shuffle(spark):
    """Line cleaning + PII redaction is pure per-row expression work:
    one scan of documents, no Exchange, no Python (codegen'd regex/HOF
    only)."""
    plan = physical_plan(CATALOG["doc_line_clean"].builder(spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1, plan[:1200]
    assert "Exchange" not in plan, plan[:1200]
    assert "Python" not in plan, plan[:1200]


def test_doc_incremental_dedup_key_joins_only(spark):
    """Incremental dedup is anti + semi equi-joins on uniform digest/id
    keys — never a cartesian/nested-loop plan, and the snapshot side
    carries only the digest column into the anti-join."""
    plan = physical_plan(
        CATALOG["doc_incremental_dedup"].builder(spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in plan, plan[:1200]
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan[:1500]


def test_events_rolling_features_one_exchange(spark):
    """The RANGE-framed rolling window is one shuffle on user_id and one
    sort; both feature columns share the same window spec."""
    plan = physical_plan(
        CATALOG["events_rolling_features"].builder(spark, SF_SMOKE)
    )
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "Window" in plan, plan[:1200]


def test_doc_global_ids_no_single_partition_window(spark):
    """Global row numbering must never plan the naive global window —
    no Exchange SinglePartition anywhere; numbering windows are keyed on
    the physical partition id and offsets arrive by broadcast."""
    plan = physical_plan(CATALOG["doc_global_ids"].builder(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_exact_dedup_partial_aggregates_hot_digests(spark):
    """A viral document duplicated millions of times is ONE digest key;
    exact_dedup must partially aggregate (map-side combine) before the
    digest exchange so the hot key arrives as one row per upstream
    partition, not as every copy."""
    from adventureworks_pysparkjobs_spark.operators.dedup import exact_dedup

    plan = physical_plan(exact_dedup(load_table(spark, SF_SMOKE, "documents")))
    assert "partial_min" in plan and "partial_count" in plan, plan[:1500]
    # the partial aggregate must sit below the exchange (map side)
    assert plan.index("partial_min") > plan.index("Exchange hashpartitioning"), (
        "partial agg not upstream of the shuffle:\n" + plan[:1500]
    )


def test_term_stats_df_join_not_forced_broadcast(spark):
    """corpus_term_stats' tf->df join: df_ is vocabulary-sized (one row
    per distinct token — unbounded at corpus scale), so the join must
    NOT carry a broadcast hint; AQE picks the strategy at runtime. A
    forced F.broadcast() here pins a driver/executor OOM at 100 TB."""
    from adventureworks_pysparkjobs_spark.plans.inspect import analyzed_plan

    df = CATALOG["corpus_term_stats"].builder(spark, SF_SMOKE)
    logical = analyzed_plan(df)
    assert "ResolvedHint" not in logical and "broadcast" not in logical, (
        "vocabulary-sized df side is hint-forced to broadcast:\n"
        + logical[:1500]
    )


def test_scd2_single_shuffle(spark):
    """SCD2 history: change compression (lag) and interval construction
    (lead) share ONE shuffle on the key — never two window exchanges."""
    plan = physical_plan(
        CATALOG["orders_scd2_status_history"].builder(spark, SF_SMOKE)
    )
    assert plan.count("Exchange") == 1, plan[:1500]


def test_resample_windows_share_one_sort(spark):
    """Resample operators: per-key grid (sequence+explode, no calendar
    cross join) costs three keyed exchanges, and the interpolation's
    backward+forward anchor windows share a single sort."""
    for name in ("events_resample_gapfill", "events_resample_interpolate"):
        plan = physical_plan(CATALOG[name].builder(spark, SF_SMOKE))
        assert plan.count("Exchange") <= 3, (name, plan[:1500])
        assert plan.count("Sort") == 1, (name, plan[:1500])


def test_feature_correlations_one_scan_one_exchange(spark):
    """All k(k+1)/2 moments come from ONE aggregate over ONE scan: the
    shuffle is the single partial->final agg exchange, and the pair
    explosion happens on the 1-row result."""
    from adventureworks_pysparkjobs_spark.queries import CATALOG

    df = CATALOG["lineitem_feature_correlations"].builder(spark, SF_SMOKE)
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan
    # The listwise null filter must reach the scan (na.drop's
    # AtLeastNNonNulls would not — pinned by the advisor finding).
    assert "PushedFilters: []" not in plan


@pytest.mark.parametrize("name", catalog_entry_params(BATCH_QUERIES))
def test_no_unreduced_single_partition_exchange(spark, name):
    """Advisor sweep, catalog-wide: no query may funnel RAW input
    through an Exchange SinglePartition (the driver-bottleneck class —
    global windows/sorts without a reducer). Cartesians are covered by
    test_no_unintended_cartesian; the unpushed-filter advisor class is
    checked per-operator where filters are pushable (computed-column
    filters are legitimate non-pushdowns)."""
    from adventureworks_pysparkjobs_spark.plans.advisor import advise

    df = CATALOG[name].builder(spark, SF_SMOKE)
    flags = [code for code, _ in advise(df) if code == "single-partition"]
    assert not flags, f"{name}: unreduced single-partition exchange"


# --- catalog-wide forced-broadcast audit (r4 verdict task 1) ----------
# A forced F.broadcast() hint is only allowed on a side that is bounded
# regardless of SF: fixed-size dims (region 5 / nation 25 rows at ANY
# scale), frames reduced by an Aggregate / Deduplicate / Limit between
# the hint and any corpus-scale scan, or pure local frames (no file
# scan at all). Everything else must be left to AQE, which broadcasts
# while the side fits and falls back to a shuffled hash join at scale.
_SF_SCALING = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings", "partsupp",
)
_BOUNDED_TABLES = ("region", "nation")
from adventureworks_pysparkjobs_spark.plans.inspect import (  # noqa: E402
    REDUCING_NODES as _REDUCING_NODES,
)
# Hinted sides bounded by an explicit, documented CONTRACT rather than a
# plan-visible reducer (each cites where the bound is enforced/stated).
_CONTRACT_BOUNDED = {
    # query/anchor side bounded by contract + limit(max_fit_rows)-style
    # guards inside operators/similarity.py (docstrings at :84,:219,:430,
    # :526,:624,:1139); the corpus side is never hinted.
    "emb_cosine_topk",
    "emb_near_dup_pairs",
    "emb_cosine_topk_vectorized",
    "emb_ann_topk",
    "emb_contrastive_pairs",
    "emb_int8_topk",
    # audit-sample contract: the hinted query side IS the bounded audit
    # sample (docstrings: whole fixture corpus here; a uniform sample
    # or one IVF cell at 100 TB) — the corpus side is never hinted
    "emb_hubness_audit",
    "emb_cosine_histogram",
    "emb_pq_topk",
    "emb_knn_label_agreement",  # cosine_topk composition, same contract
    # probe-depth sweep over the SAME bounded query sample: the hinted
    # side is the exploded (query x probed-cell) frame, |Q| x max_probe
    # rows by contract (similarity.py:ivf_nprobe_curve docstring); the
    # corpus side is never hinted
    "emb_ivf_nprobe_curve",
}


def _table_of(path: str) -> str:
    base = path.rstrip("/").rsplit("/", 1)[-1]
    return base.split(".")[0]


@pytest.mark.parametrize("name", catalog_entry_params(BATCH_QUERIES))
def test_no_forced_broadcast_of_sf_scaling_side(spark, name):
    from adventureworks_pysparkjobs_spark.plans.inspect import (
        broadcast_hint_audit,
    )

    if name in _CONTRACT_BOUNDED:
        pytest.skip("hinted side bounded by documented contract")
    df = CATALOG[name].builder(spark, SF_SMOKE)
    for audit in broadcast_hint_audit(df):
        # Per-scan, not per-subtree: a reducing node elsewhere in the
        # hinted subtree (broadcast(tiny_agg.join(raw_lineitem))) does
        # NOT bound a scan it isn't on the path of.
        unreduced = {
            _table_of(s["path"])
            for s in audit["scans"]
            if not s["reduced"]
        } & set(_SF_SCALING)
        assert not unreduced, (
            f"{name}: forced broadcast with SF-scaling table(s) "
            f"{sorted(unreduced)} reaching the hint with no reducing "
            f"node on the path — drop the hint and let AQE choose. "
            f"Nodes: {sorted(set(audit['nodes']))}"
        )


def test_broadcast_audit_detects_forced_sf_side(spark):
    """Negative control: the audit must FLAG a hand-built forced
    broadcast of a raw SF-scaling scan (no reducer), and must record
    the reducer when one bounds the hinted side."""
    from adventureworks_pysparkjobs_spark.plans.inspect import (
        broadcast_hint_audit,
    )

    li = load_table(spark, SF_SMOKE, "lineitem")
    od = load_table(spark, SF_SMOKE, "orders")
    bad = od.join(F.broadcast(li), od.o_orderkey == li.l_orderkey)
    audits = broadcast_hint_audit(bad)
    assert len(audits) == 1
    assert any("lineitem" in p for p in audits[0]["paths"])
    assert any(
        "lineitem" in s["path"] and not s["reduced"]
        for s in audits[0]["scans"]
    )

    agged = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    good = od.crossJoin(F.broadcast(agged.limit(3)))
    (a,) = broadcast_hint_audit(good)
    assert all(s["reduced"] for s in a["scans"])

    # The r5-advisor case a whole-subtree membership test misses: an
    # Aggregate exists somewhere under the hint, but the raw lineitem
    # scan reaches the hint on a DIFFERENT, unreduced path.
    tiny = od.groupBy("o_orderstatus").agg(F.count("*").alias("n")).limit(3)
    sneaky = od.join(
        F.broadcast(tiny.crossJoin(li)),  # agg joined to raw scan
        od.o_orderkey == li.l_orderkey,
    )
    (s_audit,) = broadcast_hint_audit(sneaky)
    assert set(s_audit["nodes"]) & _REDUCING_NODES  # subtree test fooled
    li_scans = [
        s for s in s_audit["scans"] if "lineitem" in s["path"]
    ]
    assert li_scans and not any(s["reduced"] for s in li_scans), (
        "per-path audit must flag the raw lineitem scan even though an "
        "Aggregate exists elsewhere in the hinted subtree"
    )
