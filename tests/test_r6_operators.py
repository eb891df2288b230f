"""Unit tests for the round-6 operators: hand-computable micro-fixtures
with exact expected values (the oracle gate covers fixture-scale
correctness; these pin the SEMANTICS on inputs small enough to verify
by hand, including the edge cases the fixtures never hit)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_sparse_cosine_pairs_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        sparse_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),       # tf: apple 2, banana 1
            (2, "apple banana banana"),      # tf: apple 1, banana 2
            (3, "cherry cherry cherry"),     # no shared term with 1/2
            (4, "Apple BANANA"),             # lowercasing: apple 1, banana 1
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id1"], r["id2"]): r["cosine_sim"]
        for r in sparse_cosine_pairs(docs, threshold=0.0).collect()
    }
    # dot(1,2) = 2*1 + 1*2 = 4; |1| = |2| = sqrt(5)
    assert math.isclose(rows[(1, 2)], 4 / 5, rel_tol=1e-12)
    # dot(1,4) = 2+1 = 3; |4| = sqrt(2)
    assert rows[(1, 4)] == 3 / (math.sqrt(5) * math.sqrt(2))
    # cherry appears in only one doc -> df < 2 -> no pairs with doc 3
    assert not any(3 in k for k in rows)
    # ordering contract: id1 < id2 always
    assert all(a < b for a, b in rows)


def test_sparse_cosine_pairs_df_cap_drops_stop_terms(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        sparse_cosine_pairs,
    )

    # 'common' is in all 4 docs; with max_term_df=3 it is a stop term,
    # so only the 'shared' pair (docs 1,2) survives.
    docs = spark.createDataFrame(
        [
            (1, "common shared"),
            (2, "common shared"),
            (3, "common alone1"),
            (4, "common alone2"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id1"], r["id2"])
        for r in sparse_cosine_pairs(
            docs, threshold=0.0, max_term_df=3
        ).collect()
    }
    assert got == {(1, 2)}


def test_t_closeness_hand_distribution(spark):
    from adventureworks_pysparkjobs_spark.operators.quality import (
        t_closeness_audit,
    )

    # g1={A,A,A,B}, g2={B,B,B,A}: global A=4, B=4 (uniform).
    # g1: p=(3/4,1/4) vs (1/2,1/2) -> TVD = 0.25; g2 symmetric.
    rows = [("g1", "A")] * 3 + [("g1", "B")] + [("g2", "B")] * 3 + [
        ("g2", "A")
    ]
    df = spark.createDataFrame(rows, "grp string, sens string")
    out = {
        r["grp"]: r
        for r in t_closeness_audit(
            df, {"grp": F.col("grp")}, "sens", t=0.25
        ).collect()
    }
    for g in ("g1", "g2"):
        assert out[g]["class_size"] == 4
        assert out[g]["t_distance"] == 0.25
        assert out[g]["is_t_close"] is True
    # tighter t flips the boolean
    out2 = t_closeness_audit(
        df, {"grp": F.col("grp")}, "sens", t=0.2
    ).collect()
    assert all(not r["is_t_close"] for r in out2)


def test_t_closeness_absent_value_tail(spark):
    from adventureworks_pysparkjobs_spark.operators.quality import (
        t_closeness_audit,
    )

    # g2 never contains C: the absent-value term must still contribute.
    # Global: A=2, B=1, C=1 (N=4). g2 = {A, B}: p=(1/2,1/2,0) vs
    # (1/2,1/4,1/4) -> TVD = 0.5*(0 + 1/4 + 1/4) = 0.25.
    df = spark.createDataFrame(
        [("g1", "A"), ("g1", "C"), ("g2", "A"), ("g2", "B")],
        "grp string, sens string",
    )
    out = {
        r["grp"]: r["t_distance"]
        for r in t_closeness_audit(
            df, {"grp": F.col("grp")}, "sens", t=0.5
        ).collect()
    }
    assert out["g2"] == 0.25
    # g1 = {A, C}: p=(1/2,0,1/2) -> TVD = 0.5*(0+1/4+1/4) = 0.25
    assert out["g1"] == 0.25


def test_ks_drift_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import ks_drift

    # a = {1,1,2,2}, b = {2,2,3,3}: ECDF gap max at bin 1:
    # |2/4 - 0/4| = 0.5 -> KS = 0.5 at bin 1.
    rows = [(1, True), (1, True), (2, True), (2, True),
            (2, False), (2, False), (3, False), (3, False)]
    df = spark.createDataFrame(rows, "v long, a boolean")
    (r,) = ks_drift(df, F.col("v"), F.col("a")).collect()
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_stat"] == 0.5
    assert r["ks_at_bin"] == 1

    # identical samples -> KS 0
    same = spark.createDataFrame(
        [(1, True), (1, False), (2, True), (2, False)], "v long, a boolean"
    )
    (r0,) = ks_drift(same, F.col("v"), F.col("a")).collect()
    assert r0["ks_stat"] == 0.0


def test_ks_drift_grouped(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import ks_drift

    rows = [("x", 1, True), ("x", 2, False),
            ("y", 5, True), ("y", 5, False)]
    df = spark.createDataFrame(rows, "g string, v long, a boolean")
    out = {r["g"]: r["ks_stat"] for r in ks_drift(
        df, F.col("v"), F.col("a"), group_cols=["g"]
    ).collect()}
    assert out["x"] == 1.0  # disjoint singletons -> max gap
    assert out["y"] == 0.0  # identical -> zero


def test_top_paths_order_and_cap(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        top_paths,
    )

    rows = [
        # user 1 day 1: a,b,c (ordered by ts)
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "c"),
        # user 2 day 1: same path
        (4, 2, "2024-01-01 10:00:00", "a"),
        (5, 2, "2024-01-01 10:01:00", "b"),
        (6, 2, "2024-01-01 10:02:00", "c"),
        # user 1 day 2: b only
        (7, 1, "2024-01-02 00:00:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = [(r["path"], r["n_sessions"], r["rnk"])
           for r in top_paths(df, k=10).collect()]
    assert got[0] == ("a>b>c", 2, 1)
    assert got[1] == ("b", 1, 2)

    # max_len caps the sequence: with max_len=2 the path truncates
    got2 = {r["path"] for r in top_paths(df, k=10, max_len=2).collect()}
    assert "a>b" in got2 and "a>b>c" not in got2

    # tie-break on equal counts is lexicographic on the path string
    tie = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "z"),
         (2, 2, "2024-01-01 00:00:00", "a")],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t = [(r["path"], r["rnk"]) for r in top_paths(tie, k=10).collect()]
    assert t == [("a", 1), ("z", 2)]


def test_readability_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import readability

    docs = spark.createDataFrame(
        [
            (1, "the cat sat."),     # 3 words, 1 sentence run, syl: e/a/a=3
            (2, "aaa"),              # 1 word, 0 terminals -> floor 1, 1 run
            (3, "   "),              # empty after trim -> dropped
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in readability(docs).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (3, 1, 3)
    # FRE = 206.835 - 1.015*3 - 84.6*1 = 119.19 (exact IEEE of same tree)
    assert math.isclose(
        r1["flesch_reading_ease"], 206.835 - 1.015 * 3 - 84.6, rel_tol=1e-12
    )
    r2 = out[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 1)


def test_pq_rerank_shortlist_bounded_plan(spark):
    """The re-rank tail must not force a broadcast of an SF-scaling
    side: the shortlist join is left to AQE (hint-free)."""
    from adventureworks_pysparkjobs_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )
    from adventureworks_pysparkjobs_spark.plans.inspect import (
        broadcast_hint_audit,
    )
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb = pq_train(emb, m=8, k=16, dim=64, seed=42)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    df = pq_topk(pq_encode(emb, cb), q, cb, k=5, rerank=50)
    # exactly the one contract-bounded broadcast(q) hint from the
    # approx pass; the re-rank joins (shortlist->originals, ->queries)
    # must be hint-free so AQE sizes them at runtime
    assert len(broadcast_hint_audit(df)) <= 1


def test_mad_outliers_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        mad_outliers,
    )

    # values 1..9 plus an outlier 100: med=5.5, deviations
    # {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5} -> MAD=2.5;
    # 3*MAD=7.5 -> only 100 (dev 94.5) is out.
    vals = list(range(1, 10)) + [100]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    (r,) = mad_outliers(df, F.col("v")).collect()
    assert r["n"] == 10
    assert r["med"] == 5.5
    assert r["mad"] == 2.5
    assert r["n_outliers"] == 1
    assert r["outlier_frac"] == 0.1


def test_mad_outliers_grouped_zero_mad(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        mad_outliers,
    )

    # constant group: MAD=0 -> any deviation > 0 is an outlier
    rows = [("c", 5), ("c", 5), ("c", 5), ("c", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    (r,) = mad_outliers(df, F.col("v"), group_cols=["g"]).collect()
    assert r["mad"] == 0.0 and r["n_outliers"] == 1


def test_minhash_calibration_self_duplicate(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        minhash_calibration,
    )

    # two identical docs: exact jaccard 1 -> bucket 9, estimate 8/8=1
    # -> within tolerance; an unrelated doc pairs with nothing.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_calibration(docs, num_hashes=8, n=3).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["bucket"] == 9 and r["n_pairs"] == 1
    assert r["n_within_tol"] == 1 and r["frac_within"] == 1.0


def test_bpe_encode_stats_consistency(spark):
    """Engine-level consistency: per-source BPE token counts from the
    catalog entry must equal re-encoding each doc with the returned
    merge rules via the pure-Python reference from test_bpe."""
    from adventureworks_pysparkjobs_spark.queries import CATALOG

    df = CATALOG["corpus_bpe_encode_stats"].builder(
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    assert rows and all(r["n_bpe_tokens"] >= r["n_words"] for r in rows)
    # every word is at least 1 token and at most chars+1 symbols
    for r in rows:
        assert r["tokens_per_word"] >= 1.0
        assert r["chars_per_token"] > 0.0


def test_ngram_novelty_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        ngram_novelty,
    )

    # n=3 shingles: doc1 owns both of its shingles; doc2 repeats doc1's
    # text (0 novel); doc3 shares a suffix shingle with nobody.
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles {a b c, b c d}
            (2, "a b c d"),        # same two -> min id is 1 -> 0 novel
            (3, "b c d e"),        # {b c d (owned by 1), c d e (novel)}
            (4, "x y"),            # < n tokens -> absent from output
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_shingles"], out[1]["n_novel"]) == (2, 2)
    assert out[1]["novelty"] == 1.0
    assert (out[2]["n_shingles"], out[2]["n_novel"]) == (2, 0)
    assert out[2]["novelty"] == 0.0
    assert (out[3]["n_shingles"], out[3]["n_novel"]) == (2, 1)
    assert out[3]["novelty"] == 0.5


def test_reident_risk_monotone(spark):
    """risk_fraction must be monotone non-decreasing in k, and the
    k=2 row counts exactly the singleton classes."""
    from adventureworks_pysparkjobs_spark.queries import CATALOG

    rows = sorted(
        CATALOG["customer_reident_risk"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [2, 5, 10, 20]
    fracs = [r["risk_fraction"] for r in rows]
    assert fracs == sorted(fracs)
    assert all(r["records_at_risk"] <= r["n_records"] for r in rows)


def test_ohlc_bars_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import ohlc_bars

    ev = spark.createDataFrame(
        [
            # one hour bucket, deliberately out of insertion order
            (3, "2024-01-01 10:59:00", 1, "tick", 7.0, None),
            (1, "2024-01-01 10:00:00", 1, "tick", 5.0, None),
            (2, "2024-01-01 10:30:00", 1, "tick", 2.0, None),
            # ts tie: event_id breaks it (id 5 opens, id 6 closes)
            (6, "2024-01-01 11:00:00", 1, "tick", 9.0, None),
            (5, "2024-01-01 11:00:00", 1, "tick", 3.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        str(r["bar_ts"]): r for r in ohlc_bars(ev).collect()
    }
    h10 = rows["2024-01-01 10:00:00"]
    assert (h10["open_v"], h10["close_v"]) == (5.0, 7.0)
    assert (h10["low_v"], h10["high_v"], h10["n_events"]) == (2.0, 7.0, 3)
    h11 = rows["2024-01-01 11:00:00"]
    assert (h11["open_v"], h11["close_v"]) == (3.0, 9.0)


def test_ab_lift_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        ab_conversion_lift,
    )

    # users 0,2 -> variant A; 1,3 -> variant B. First event decides.
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 0, "purchase", 1.0, None),
            (2, "2024-01-01 00:01:00", 0, "click", 1.0, None),
            (3, "2024-01-01 00:00:00", 2, "click", 1.0, None),
            (4, "2024-01-01 00:05:00", 2, "purchase", 1.0, None),  # not first
            (5, "2024-01-01 00:00:00", 1, "purchase", 1.0, None),
            (6, "2024-01-01 00:00:00", 3, "purchase", 1.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = ab_conversion_lift(ev).collect()[0]
    assert (row["n_a"], row["conv_a"]) == (2, 1)   # user 0 yes, user 2 no
    assert (row["n_b"], row["conv_b"]) == (2, 2)
    assert row["rate_a"] == 0.5 and row["rate_b"] == 1.0
    assert row["abs_lift"] == -0.5
    p = 3 / 4
    se = math.sqrt(p * (1 - p) * (4 / 4))
    assert math.isclose(row["z_score"], -0.5 / se, rel_tol=1e-12)


def test_ab_lift_degenerate_se_is_null(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        ab_conversion_lift,
    )

    # everyone's first event is a purchase -> pooled p = 1 -> se = 0
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 0, "purchase", 1.0, None),
            (2, "2024-01-01 00:00:00", 1, "purchase", 1.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = ab_conversion_lift(ev).collect()[0]
    assert row["abs_lift"] == 0.0
    assert row["z_score"] is None


def test_cusum_deviation_flags_single_shift_day(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        cusum_deviation,
    )

    # 4 quiet days of 1 event, then 4 loud days of 9: the max |dev|
    # sits at the last quiet day (k=4: cum 4, expected 4*40/8=20 ->
    # dev -16; every other day is closer to the uniform line).
    rows = []
    eid = 0
    for d in range(1, 5):
        eid += 1
        rows.append((eid, f"2024-01-0{d} 12:00:00", 1, "e", 1.0, None))
    for d in range(5, 9):
        for _ in range(9):
            eid += 1
            rows.append((eid, f"2024-01-0{d} 12:00:00", 1, "e", 1.0, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"]): r for r in cusum_deviation(ev).collect()}
    flagged = [d for d, r in out.items() if r["is_changepoint"]]
    assert flagged == ["2024-01-04"]
    assert out["2024-01-04"]["dev"] == 4 - 4 * 40 / 8
    assert out["2024-01-08"]["cum_n"] == 40


def test_cohort_ltv_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import cohort_ltv

    od = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, "2024-01-05 00:00:00", "1-URGENT"),
            (2, 10, "O", 50.0, "2024-02-10 00:00:00", "1-URGENT"),
            (3, 11, "O", 30.0, "2024-01-20 00:00:00", "1-URGENT"),
            (4, 12, "O", 40.0, "2024-02-01 00:00:00", "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {
        (str(r["cohort_month"]), r["age_months"]): r
        for r in cohort_ltv(od).collect()
    }
    jan0 = out[("2024-01-01", 0)]
    assert jan0["n_active"] == 2 and jan0["cohort_size"] == 2
    assert jan0["period_revenue"] == 130.0 and jan0["cum_revenue"] == 130.0
    jan1 = out[("2024-01-01", 1)]
    assert jan1["n_active"] == 1
    assert jan1["cum_revenue"] == 180.0
    assert jan1["ltv_per_customer"] == 90.0
    feb0 = out[("2024-02-01", 0)]
    assert feb0["cohort_size"] == 1 and feb0["ltv_per_customer"] == 40.0


def test_concentration_hhi_bounds_and_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        concentration_hhi,
    )

    df = spark.createDataFrame(
        [
            ("n1", 1, 3), ("n1", 2, 1),          # shares 3/4, 1/4
            ("n2", 3, 2), ("n2", 4, 2),          # perfectly even
            ("n3", 5, 7),                        # monopoly
        ],
        "grp_in string, member long, w long",
    )
    out = {
        r["grp"]: r
        for r in concentration_hhi(df, "grp_in", "member", "w").collect()
    }
    assert out["n1"]["hhi"] == (9 + 1) / 16
    assert out["n1"]["top_share"] == 0.75
    assert out["n2"]["hhi"] == 0.5 and out["n2"]["effective_n"] == 2.0
    assert out["n3"]["hhi"] == 1.0 and out["n3"]["top_share"] == 1.0
    # bounds: 1/n <= HHI <= 1
    for r in out.values():
        assert 1.0 / r["n_members"] <= r["hhi"] <= 1.0
        assert r["total_weight"] > 0


def test_weighted_median_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        weighted_median,
    )

    df = spark.createDataFrame(
        [
            # g1: values 1(w3), 2(w1), 10(w2) -> total 6, half 3 ->
            # cum(1)=3, 2*3>=6 -> median 1 (lower weighted median)
            ("g1", 1.0, 3), ("g1", 2.0, 1), ("g1", 10.0, 2),
            # g2: 5(w1), 7(w1) -> cum(5)=1, 2*1<2 is false -> 2>=2 ->
            # median 5
            ("g2", 5.0, 1), ("g2", 7.0, 1),
            # g3: weight split across duplicate value rows merges cells
            ("g3", 4.0, 1), ("g3", 4.0, 5), ("g3", 9.0, 2),
        ],
        "grp_in string, val_in double, w long",
    )
    out = {
        r["grp"]: r
        for r in weighted_median(df, "grp_in", "val_in", "w").collect()
    }
    assert out["g1"]["median_val"] == 1.0
    assert out["g1"]["total_weight"] == 6
    assert out["g1"]["n_distinct_values"] == 3
    assert out["g2"]["median_val"] == 5.0
    assert out["g3"]["median_val"] == 4.0       # merged weight 6 of 8
    assert out["g3"]["n_distinct_values"] == 2  # cells merged


def test_pareto_concentration_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        pareto_concentration,
    )

    # revenues 50, 30, 10, 10 (total 100): 80% needs ranks 1+2 (cum 80)
    # -> n_for_share 2; top-20% = ceil(4/5)=1 member -> share 50/100.
    df = spark.createDataFrame(
        [(1, 50), (2, 30), (3, 10), (4, 10)],
        "m long, amt long",
    )
    row = pareto_concentration(
        df, "m", F.col("amt").cast("decimal(12,2)")
    ).collect()[0]
    assert row["n_members"] == 4
    assert row["n_for_share"] == 2
    assert row["frac_for_share"] == 0.5
    assert row["top20_share"] == 0.5


def test_inter_event_gaps_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        inter_event_gaps,
    )

    ev = spark.createDataFrame(
        [
            # user 1: click -> (2s) -> view -> (4s) -> click
            (1, "2024-01-01 00:00:00", 1, "click", 0.0, None),
            (2, "2024-01-01 00:00:02", 1, "view", 0.0, None),
            (3, "2024-01-01 00:00:06", 1, "click", 0.0, None),
            # user 2: click -> (10s) -> click ; last events emit no gap
            (4, "2024-01-01 00:00:00", 2, "click", 0.0, None),
            (5, "2024-01-01 00:00:10", 2, "click", 0.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_type"]: r for r in inter_event_gaps(ev).collect()}
    # gaps attributed to the FROM event's type
    assert out["click"]["n_gaps"] == 2          # 2s (u1), 10s (u2)
    assert out["click"]["min_gap_s"] == 2.0
    assert out["click"]["max_gap_s"] == 10.0
    assert out["click"]["avg_gap_s"] == 6.0
    assert out["view"]["n_gaps"] == 1 and out["view"]["avg_gap_s"] == 4.0


def test_duplicate_payment_pairs_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.quality import (
        duplicate_payment_pairs,
    )

    od = spark.createDataFrame(
        [
            # same cust, same band (1xxx), 5 days apart -> pair
            (1, 10, "O", 1200.0, "2024-01-01 00:00:00", "x"),
            (2, 10, "O", 1900.0, "2024-01-06 00:00:00", "x"),
            # same band but 120 days apart -> outside window
            (3, 10, "O", 1500.0, "2024-05-01 00:00:00", "x"),
            # different band -> no pair
            (4, 10, "O", 3500.0, "2024-01-02 00:00:00", "x"),
            # different customer, would otherwise match -> no pair
            (5, 11, "O", 1200.0, "2024-01-01 00:00:00", "x"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    rows = duplicate_payment_pairs(
        od, "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
        band_width=1000.0, window_days=90,
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["entity"], r["id_a"], r["id_b"]) == (10, 1, 2)
    assert r["day_gap"] == 5


def test_dau_mau_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        dau_mau_stickiness,
    )

    # day1: users {1,2}; day2: {2}; day3: {3}
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "e", 0.0, None),
            (2, "2024-01-01 11:00:00", 1, "e", 0.0, None),  # same user-day
            (3, "2024-01-01 12:00:00", 2, "e", 0.0, None),
            (4, "2024-01-02 10:00:00", 2, "e", 0.0, None),
            (5, "2024-01-03 10:00:00", 3, "e", 0.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r["day"]): r
        for r in dau_mau_stickiness(ev, window_days=2).collect()
    }
    assert (out["2024-01-01"]["dau"], out["2024-01-01"]["mau"]) == (2, 2)
    # day2 trailing-2: users active on day1+day2 = {1,2,2} -> 2
    assert (out["2024-01-02"]["dau"], out["2024-01-02"]["mau"]) == (1, 2)
    assert out["2024-01-02"]["stickiness"] == 0.5
    # day3 trailing-2: day2+day3 = {2,3}
    assert (out["2024-01-03"]["dau"], out["2024-01-03"]["mau"]) == (1, 2)


def test_stream_ohlc_matches_batch_formulation(spark):
    """The streaming min_by/max_by OHLC and the batch row_number OHLC
    must pick identical bars on the same bounded input (the two
    formulations of one total order)."""
    from adventureworks_pysparkjobs_spark.operators.analytics import ohlc_bars
    from adventureworks_pysparkjobs_spark.queries.catalog import CATALOG
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table

    sf = "/root/testdata/sf0.001"
    stream_rows = {
        (r["bar_key"], r["bucket_s"]): (
            r["open_v"], r["high_v"], r["low_v"], r["close_v"],
            r["n_events"],
        )
        for r in CATALOG["stream_ohlc_bars"].builder(spark, sf).collect()
    }
    batch_rows = {
        (r["bar_key"], int(r["bar_ts"].timestamp())): (
            r["open_v"], r["high_v"], r["low_v"], r["close_v"],
            r["n_events"],
        )
        for r in ohlc_bars(load_table(spark, sf, "events")).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) > 0


def test_degree_assortativity_star_and_regular(spark):
    from adventureworks_pysparkjobs_spark.operators.graph import (
        degree_assortativity,
    )

    # star K_{1,3}: hub degree 3, leaves 1 -> perfectly disassortative
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "item_a long, item_b long"
    )
    r = degree_assortativity(star).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (4, 3)
    assert r["assortativity"] == -1.0
    # triangle: degree-regular -> zero variance -> NULL
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "item_a long, item_b long"
    )
    r2 = degree_assortativity(tri).collect()[0]
    assert (r2["n_nodes"], r2["n_edges"]) == (3, 3)
    assert r2["assortativity"] is None


def test_adoption_curve_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        adoption_curve,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "e", 0.0, None),
            (2, "2024-01-02 10:00:00", 1, "e", 0.0, None),  # not new
            (3, "2024-01-02 10:00:00", 2, "e", 0.0, None),
            (4, "2024-01-04 10:00:00", 3, "e", 0.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r["day"]): r for r in adoption_curve(ev).collect()}
    assert len(out) == 3  # day with no NEW users emits no row
    assert (out["2024-01-01"]["new_users"], out["2024-01-01"]["cum_users"]) \
        == (1, 1)
    assert out["2024-01-02"]["cum_users"] == 2
    assert out["2024-01-04"]["adoption_frac"] == 1.0
    assert all(r["total_users"] == 3 for r in out.values())


def test_vocab_overlap_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1", 5),
            (2, "b c d", "en", "s2", 5),      # s1 ∩ s2 = {b,c}
            (3, "x", "en", "s3", 1),          # disjoint from s1/s2
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    rows = {
        (r["group_a"], r["group_b"]): r
        for r in vocab_overlap(docs, "source", "text").collect()
    }
    r12 = rows[("s1", "s2")]
    assert (r12["vocab_a"], r12["vocab_b"], r12["n_common"]) == (3, 3, 2)
    assert r12["jaccard"] == 0.5          # 2 / (3+3-2)
    assert r12["containment_a_in_b"] == 2 / 3
    # disjoint slices emit no pair row (inner join on shared terms)
    assert ("s1", "s3") not in rows and ("s2", "s3") not in rows


def test_peak_concurrency_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        peak_concurrency,
    )

    sess = spark.createDataFrame(
        [
            # three overlapping sessions: peak 3 at 10:20
            (1, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
            (2, "2024-01-01 10:10:00", "2024-01-01 10:40:00"),
            (3, "2024-01-01 10:20:00", "2024-01-01 10:25:00"),
            # zero-duration session still registers (peak 1) next day
            (4, "2024-01-02 09:00:00", "2024-01-02 09:00:00"),
        ],
        "sid long, session_start string, session_end string",
    ).select(
        F.to_timestamp("session_start").alias("session_start"),
        F.to_timestamp("session_end").alias("session_end"),
    )
    out = {str(r["day"]): r for r in peak_concurrency(sess).collect()}
    assert out["2024-01-01"]["peak_concurrency"] == 3
    assert out["2024-01-01"]["n_boundaries"] == 6
    assert out["2024-01-02"]["peak_concurrency"] == 1
    assert out["2024-01-02"]["n_boundaries"] == 1  # start==end merges


def test_gini_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        gini_coefficient,
    )

    # perfectly even: 4 members x 10 -> G = 2*(1+2+3+4)*10/(4*40) - 5/4
    #                                     = 200/160 - 1.25 = 0
    even = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10)], "m long, amt long"
    )
    r = gini_coefficient(
        even, "m", F.col("amt").cast("decimal(12,2)")
    ).collect()[0]
    assert r["gini"] == 0.0 and r["n_members"] == 4
    assert r["total_amount"] == 40.0
    # maximal concentration: one member holds all of it
    # G = 2*(1*0+2*0+3*0+4*40)/(4*40) - 5/4 = 2 - 1.25 = 0.75 = 1-1/n
    mono = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 40)], "m long, amt long"
    )
    r2 = gini_coefficient(
        mono, "m", F.col("amt").cast("decimal(12,2)")
    ).collect()[0]
    assert r2["gini"] == 0.75
    # zero total -> NULL (division guard)
    zero = spark.createDataFrame([(1, 0), (2, 0)], "m long, amt long")
    r3 = gini_coefficient(
        zero, "m", F.col("amt").cast("decimal(12,2)")
    ).collect()[0]
    assert r3["gini"] is None


def test_category_mix_shift_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        category_mix_shift,
    )

    # 2x2: A: 30 early / 10 late ; B: 10 early / 30 late
    rows = (
        [("A", "early")] * 30 + [("A", "late")] * 10
        + [("B", "early")] * 10 + [("B", "late")] * 30
    )
    df = spark.createDataFrame(rows, "cat string, per string")
    out = {
        (r["category"], r["period"]): r
        for r in category_mix_shift(df, "cat", "per").collect()
    }
    # every marginal is 40, grand 80 -> expected 20 everywhere
    for cell, r in out.items():
        assert r["expected"] == 20.0
        assert r["contribution"] == (r["observed"] - 20.0) ** 2 / 20.0
    assert out[("A", "early")]["observed"] == 30
    assert out[("B", "early")]["observed"] == 10


def test_lorenz_deciles_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        lorenz_deciles,
    )

    # 20 members, values 1..20 (as decimals): decile k holds {2k-1, 2k}
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 21)], "m int, amt long"
    )
    rows = {
        r["decile"]: r
        for r in lorenz_deciles(
            df, "m", F.col("amt").cast("decimal(12,2)")
        ).collect()
    }
    total = sum(range(1, 21))  # 210
    assert len(rows) == 10
    assert all(r["n_members"] == 2 for r in rows.values())
    assert rows[1]["decile_value"] == 3.0      # 1+2
    assert rows[10]["decile_value"] == 39.0    # 19+20
    assert rows[10]["cum_share"] == 1.0 and rows[10]["pop_share"] == 1.0
    assert rows[5]["cum_value"] == sum(range(1, 11))  # 55
    assert rows[5]["cum_share"] == 55 / total
    # Lorenz curve is convex: cum_share <= pop_share everywhere
    for r in rows.values():
        assert r["cum_share"] <= r["pop_share"] + 1e-12


def test_new_vs_repeat_revenue_hand_values(spark):
    from adventureworks_pysparkjobs_spark.queries.catalog import CATALOG
    import os, tempfile

    od = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, "2024-01-05 00:00:00", "x"),  # cust 10 new
            (2, 10, "O", 50.0, "2024-01-20 00:00:00", "x"),   # repeat, same mo
            (3, 10, "O", 25.0, "2024-02-01 00:00:00", "x"),   # repeat, feb
            (4, 11, "O", 70.0, "2024-02-10 00:00:00", "x"),   # cust 11 new
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    with tempfile.TemporaryDirectory() as d:
        od.write.parquet(os.path.join(d, "orders.parquet"))
        out = {
            (str(r["month"]), r["customer_kind"]): r
            for r in CATALOG["orders_new_vs_repeat_revenue"]
            .builder(spark, d)
            .collect()
        }
    assert out[("2024-01-01", "new")]["revenue"] == 100.0
    assert out[("2024-01-01", "repeat")]["revenue"] == 50.0
    assert out[("2024-02-01", "repeat")]["revenue"] == 25.0
    assert out[("2024-02-01", "new")]["revenue"] == 70.0
    assert out[("2024-02-01", "new")]["n_orders"] == 1


def test_lorenz_ntile_remainder_distribution(spark):
    """NTILE remainder goes to the LOWEST buckets in both engines
    (cross-checked against DuckDB when this landed) — pin the Spark
    side so the lorenz oracle stays safe at member counts the fixtures
    never exercise (they divide evenly by 10)."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        lorenz_deciles,
    )

    df = spark.createDataFrame(
        [(i, i) for i in range(1, 14)], "m int, amt long"
    )
    rows = {
        r["decile"]: r["n_members"]
        for r in lorenz_deciles(
            df, "m", F.col("amt").cast("decimal(12,2)")
        ).collect()
    }
    assert [rows[k] for k in sorted(rows)] == [2, 2, 2, 1, 1, 1, 1, 1, 1, 1]
