"""Round-7 unit tests: the ADVICE-driven semantics changes
(adjacent-band duplicate-payment matching, empty-arm A/B readout,
retained-vocabulary cosine norms) and the round-7 operators (link
prediction, conformal gate, gap islands, Fano, autocorrelation,
contingency chi2, tf-idf keywords, RRF fusion, Simpson diversity,
second-event hazard, Bloom pre-filter) on hand-computable
micro-fixtures and exact python references."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F


def test_sparse_cosine_norms_exclude_capped_terms(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        sparse_cosine_pairs,
    )

    # "the" has df=4 > cap=3 and is dropped from dots AND norms, so the
    # (1,2) score is exact cosine in the retained vocabulary {apple,
    # cherry, unique}: 1.0 — norms-over-all-terms would have
    # reported 0.5.
    docs = spark.createDataFrame(
        [
            (1, "the apple"),
            (2, "the apple"),
            (3, "the cherry"),
            (4, "the apple unique"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["id1"], r["id2"]): r["cosine_sim"]
        for r in sparse_cosine_pairs(
            docs, threshold=0.0, max_term_df=3
        ).collect()
    }
    assert rows[(1, 2)] == 1.0
    # df==1 terms stay retained vocabulary: "unique" contributes to
    # doc 4's norm (it correctly adds 0 to every dot product).
    assert rows[(1, 4)] == 1 / (1.0 * math.sqrt(2))
    # doc 3 shares only the capped term with anyone -> no pairs.
    assert not any(3 in k for k in rows)


def test_duplicate_payment_pairs_boundary_straddle(spark):
    from adventureworks_pysparkjobs_spark.operators.quality import (
        duplicate_payment_pairs,
    )

    od = spark.createDataFrame(
        [
            # straddles the 1000 band edge, diff 0.02 -> pair (the
            # false-negative class the same-band-only join missed)
            (1, 10, "O", 999.99, "2024-01-01 00:00:00", "x"),
            (2, 10, "O", 1000.01, "2024-01-03 00:00:00", "x"),
            # adjacent bands but diff 1800 > band_width -> no pair
            (3, 11, "O", 1100.0, "2024-01-01 00:00:00", "x"),
            (4, 11, "O", 2900.0, "2024-01-02 00:00:00", "x"),
            # same band, diff < band_width -> pair (unchanged behavior)
            (5, 12, "O", 1200.0, "2024-01-01 00:00:00", "x"),
            (6, 12, "O", 1900.0, "2024-01-06 00:00:00", "x"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    rows = duplicate_payment_pairs(
        od, "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate",
        band_width=1000.0, window_days=90,
    ).collect()
    pairs = sorted((r["id_a"], r["id_b"]) for r in rows)
    # each pair exactly once (a pair meets via exactly one probe offset)
    assert pairs == [(1, 2), (5, 6)]
    by_pair = {(r["id_a"], r["id_b"]): r for r in rows}
    assert by_pair[(1, 2)]["day_gap"] == 2


def test_ab_lift_empty_arm_emits_null_row(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        ab_conversion_lift,
    )

    # every user id is even -> variant B arm is empty; the readout row
    # must still appear with NULLs on the B side, not vanish.
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 0, "purchase", 1.0, None),
            (2, "2024-01-01 00:01:00", 2, "click", 1.0, None),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = ab_conversion_lift(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_a"], r["conv_a"]) == (2, 1)
    assert r["rate_a"] == 0.5
    assert r["n_b"] is None and r["conv_b"] is None
    assert r["rate_b"] is None and r["abs_lift"] is None
    assert r["z_score"] is None


def test_ab_lift_empty_input_emits_null_row(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        ab_conversion_lift,
    )

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = ab_conversion_lift(ev).collect()
    assert len(rows) == 1
    assert all(
        rows[0][c] is None
        for c in ("n_a", "n_b", "conv_a", "conv_b", "rate_a", "rate_b",
                  "abs_lift", "z_score")
    )


def test_link_prediction_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.graph import (
        link_prediction,
    )

    # square 1-2-4-3-1 plus diagonal 2-3: the only non-adjacent pair is
    # (1,4) with common neighbors {2,3}.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "a long, b long"
    )
    rows = link_prediction(edges, "a", "b", top_k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["item_a"], r["item_b"], r["common_neighbors"]) == (1, 4, 2)
    assert (r["deg_a"], r["deg_b"]) == (2, 2)
    assert r["jaccard"] == 1.0  # 2 / (2 + 2 - 2)

    # witness cap below every degree -> no wedges survive
    assert (
        link_prediction(edges, "a", "b", top_k=10, max_witness_degree=1)
        .count()
        == 0
    )


def test_conformal_gate_matches_reference_rank(spark):
    import hashlib

    from adventureworks_pysparkjobs_spark.operators.lm import conformal_gate

    n = 200
    rows = [(i, float(i), True) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, score double, label boolean")
    out = {r["alpha"]: r for r in conformal_gate(df).collect()}
    assert set(out) == {0.05, 0.1, 0.2}

    # replicate the md5-parity split and the k-th-smallest rule in pure
    # python; thresholds and coverage must agree exactly
    def bucket(i):
        return int(hashlib.md5(f"conf:{i}".encode()).hexdigest()[:4], 16) % 2

    cal = sorted(float(i) for i in range(n) if bucket(i) == 0)
    tst = [float(i) for i in range(n) if bucket(i) == 1]
    for num, den in ((1, 20), (1, 10), (1, 5)):
        r = out[num / den]
        k = max(1, (num * (len(cal) + 1)) // den)
        thr = cal[k - 1]
        assert r["n_cal"] == len(cal)
        assert r["cal_rank"] == k
        assert r["threshold"] == thr
        assert r["n_test"] == len(tst)
        assert r["n_covered"] == sum(1 for s in tst if s >= thr)
        assert r["coverage"] == r["n_covered"] / r["n_test"]
        # the conformal promise on an exchangeable split
        assert r["coverage"] >= 1 - num / den - 0.05


def test_key_gap_islands_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.quality import (
        key_gap_islands,
    )

    # keys {1,2,3, 7,8, 20} -> gaps (4..6, len 3) and (9..19, len 11);
    # a duplicate key must not break the pairing
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (7,), (8,), (8,), (20,)], "k long"
    )
    rows = key_gap_islands(df, "k").collect()
    gaps = [(r["gap_start"], r["gap_end"], r["gap_len"]) for r in rows]
    assert gaps == [(9, 19, 11), (4, 6, 3)]  # largest first

    # contiguous keys -> no gaps
    contig = spark.createDataFrame([(i,) for i in range(5)], "k long")
    assert key_gap_islands(contig, "k").count() == 0


def test_fano_burstiness_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        fano_burstiness,
    )

    # type "a": days 1,1,1,3 -> span 1..3 counts [3,0,1]:
    #   n=3, S=4, sumsq=10 -> fano = (3*10-16)/((3-1)*4) = 14/8 = 1.75
    # type "b": single day -> span of 1 -> NULL fano
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 01:00:00", 1, "a"),
        (3, "2024-01-01 02:00:00", 1, "a"),
        (4, "2024-01-03 00:00:00", 1, "a"),
        (5, "2024-01-05 00:00:00", 1, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_type"]: r for r in fano_burstiness(ev).collect()}
    assert (out["a"]["n_days"], out["a"]["n_events"]) == (3, 4)
    assert out["a"]["fano"] == 1.75
    assert out["b"]["n_days"] == 1 and out["b"]["fano"] is None


def test_daily_autocorr_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        daily_autocorr,
    )

    # strictly increasing daily counts 1,2,3,4 -> lag-1 pairs are a
    # perfect line -> r = 1.0 exactly
    rows = []
    eid = 0
    for day, n in zip(range(1, 5), (1, 2, 3, 4)):
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-0{day} 00:00:00", 1, "e"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = daily_autocorr(ev).collect()[0]
    assert r["n_pairs"] == 3
    # m=3 sx=6 sy=9 sxy=20 sxx=14 syy=29 -> num=6, varx=vary=6; the
    # exact IEEE tree gives 6/(sqrt(6)*sqrt(6)), one ulp above 1.0
    assert r["autocorr_lag1"] == 6.0 / (math.sqrt(6.0) * math.sqrt(6.0))

    # constant series -> zero variance -> NULL
    const = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "e"), (2, "2024-01-02 00:00:00", 1, "e")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert daily_autocorr(const).collect()[0]["autocorr_lag1"] is None


def test_contingency_chi2_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        contingency_chi2,
    )

    # 2x2 with counts [[10, 20], [30, 40]]
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 30 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = {(r["r"], r["c"]): r for r in contingency_chi2(df, "r", "c").collect()}
    # expected(a,x) = 30*40/100 = 12; contrib = 4/12
    assert out[("a", "x")]["n"] == 10
    assert out[("a", "x")]["expected"] == 12.0
    assert out[("a", "x")]["chi2_contrib"] == (10.0 - 12.0) ** 2 / 12.0
    assert out[("b", "y")]["expected"] == 70.0 * 60.0 / 100.0


def test_tfidf_keywords_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import (
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "rare rare common"),
            (2, "common other"),
            (3, "common other zebra"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): r
        for r in tfidf_keywords(docs, top_k=2).collect()
    }
    # doc 1: rare tf=2 df=1 -> 2*3/1=6; common tf=1 df=3 -> 1
    r11 = out[(1, 1)]
    assert (r11["term"], r11["tf"], r11["df"], r11["tfidf"]) == (
        "rare", 2, 1, 6.0
    )
    assert out[(1, 2)]["term"] == "common"
    # doc 3: zebra 1*3/1=3 beats other 1*3/2=1.5 beats common 1
    assert out[(3, 1)]["term"] == "zebra"
    assert out[(3, 2)]["term"] == "other"
    # top_k respected: no rank-3 rows
    assert (3, 3) not in out and (1, 3) not in out


def test_rrf_fusion_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import rrf_fusion

    # doc 1: high tf of "hash" (rank 1 in tf); doc 2 mentions both
    # terms once in a short doc (bm25 favors it); doc 3: no query terms
    docs = spark.createDataFrame(
        [
            (1, "hash hash hash hash filler filler filler filler"),
            (2, "hash join"),
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    rows = rrf_fusion(
        docs, ["hash", "join"], k_each=5, k_final=5
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert 3 not in by_id  # never retrieved by either ranker
    # both retrieved docs appear in both rankings
    for i in (1, 2):
        r = by_id[i]
        assert r["rank_bm25"] is not None and r["rank_tf"] is not None
        assert r["rrf_score"] == (
            1.0 / (60 + r["rank_bm25"]) + 1.0 / (60 + r["rank_tf"])
        )
    # doc 1 dominates the tf ranking (tf=4 vs 2)
    assert by_id[1]["rank_tf"] == 1


def test_simpson_diversity_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        simpson_diversity,
    )

    df = spark.createDataFrame(
        [("s1", "en")] * 3 + [("s1", "de")] * 1 + [("s2", "en")],
        "source string, lang string",
    )
    out = {r["source"]: r for r in simpson_diversity(df, "source", "lang").collect()}
    # s1: n=4, sum n_i(n_i-1) = 3*2 + 0 = 6; lambda = 6/12 = 0.5
    assert (out["s1"]["n"], out["s1"]["n_categories"]) == (4, 2)
    assert out["s1"]["simpson"] == 0.5
    assert out["s1"]["gini_simpson"] == 0.5
    # s2: single row -> NULL indexes
    assert out["s2"]["simpson"] is None


def test_second_event_hazard_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        second_event_hazard,
    )

    # c1: second order 10 days later -> event bucket 0
    # c2: second order 40 days later -> event bucket 1
    # c3: one order, horizon (2024-03-01) 60 days after -> censored b2
    rows = [
        (1, 10, "2024-01-01"),
        (2, 10, "2024-01-11"),
        (3, 20, "2024-01-01"),
        (4, 20, "2024-02-10"),
        (5, 30, "2024-01-01"),
        (6, 40, "2024-03-01"),  # 4th customer pins the horizon
    ]
    od = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = {
        r["bucket"]: r
        for r in second_event_hazard(
            od, "o_custkey", "o_orderdate", "o_orderkey"
        ).collect()
    }
    # customer 40 has a single order ON the horizon -> censored in b0.
    # at_risk: b0=4 (everyone), b1=2 (c2 event + c3 censored later),
    # b2=1 (c3 alone)
    assert (out[0]["n_events"], out[0]["n_censored"]) == (1, 1)
    assert out[0]["at_risk"] == 4 and out[0]["hazard"] == 0.25
    assert (out[1]["n_events"], out[1]["at_risk"]) == (1, 2)
    assert out[1]["hazard"] == 0.5
    assert out[2]["n_events"] == 0 and out[2]["n_censored"] == 1
    assert out[2]["at_risk"] == 1 and out[2]["hazard"] == 0.0
    assert out[0]["day_lo"] == 0 and out[1]["day_lo"] == 30


def test_bloom_prefilter_matches_python_reference(spark):
    import hashlib

    from adventureworks_pysparkjobs_spark.operators.sketches import (
        bloom_prefilter_audit,
    )

    m_bits = 256  # small filter -> false positives actually occur
    members = list(range(0, 40))
    probes = list(range(0, 400))
    mdf = spark.createDataFrame([(k,) for k in members], "k long")
    pdf = spark.createDataFrame([(k,) for k in probes], "k long")
    row = bloom_prefilter_audit(
        mdf, pdf, "k", m_bits=m_bits, n_hashes=2
    ).collect()[0]

    def pos(k, h):
        d = hashlib.md5(f"bl{h}|{k}".encode()).hexdigest()[:8]
        return int(d, 16) % m_bits

    bits = set()
    for k in members:
        bits.add(pos(k, 0))
        bits.add(pos(k, 1))
    passes = {
        k for k in probes if pos(k, 0) in bits and pos(k, 1) in bits
    }
    fp = passes - set(members)
    assert row["n_probe"] == len(probes)
    assert row["n_member"] == len(members)
    assert row["n_pass_bloom"] == len(passes)
    assert row["n_false_pos"] == len(fp)
    assert row["fp_rate"] == len(fp) / (len(probes) - len(members))
    # no false negatives, ever
    assert set(members) <= passes
    # the small filter really exercised the fp path
    assert len(fp) > 0


def test_stream_bloom_replay_is_idempotent(spark, tmp_path):
    from adventureworks_pysparkjobs_spark.operators.sketches import (
        bloom_build,
    )
    from adventureworks_pysparkjobs_spark.streaming.events import (
        read_bloom_snapshot,
    )

    keys = spark.createDataFrame([(k,) for k in range(50)], "k long")
    words = bloom_build(keys, "k", m_bits=512, n_hashes=2)
    path = str(tmp_path / "bloom")
    # batch 0 lands, then REPLAYS into the same partition; a second
    # overlapping batch adds more keys
    words.write.mode("overwrite").parquet(f"{path}/batch_id=0")
    words.write.mode("overwrite").parquet(f"{path}/batch_id=0")
    more = spark.createDataFrame([(k,) for k in range(25, 80)], "k long")
    bloom_build(more, "k", m_bits=512, n_hashes=2).write.mode(
        "overwrite"
    ).parquet(f"{path}/batch_id=1")

    snap = {
        r["word_idx"]: r["word_val"]
        for r in read_bloom_snapshot(spark, path).collect()
    }
    allk = spark.createDataFrame([(k,) for k in range(80)], "k long")
    direct = {
        r["word_idx"]: r["word_val"]
        for r in bloom_build(allk, "k", m_bits=512, n_hashes=2).collect()
    }
    # merge-on-read OR of replayed + overlapping partials == one-shot
    # build over the union of keys (OR is idempotent + commutative)
    assert snap == direct


def test_matryoshka_audit_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.similarity import (
        matryoshka_audit,
    )

    emb = spark.createDataFrame(
        [
            (1, [3.0, 4.0, 0.0, 0.0]),   # all mass in the first half
            (2, [1.0, 1.0, 1.0, 1.0]),   # uniform spread
            (3, [0.0, 0.0, 0.0, 0.0]),   # zero vector -> NULLs
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in matryoshka_audit(emb).collect()}
    assert out[1]["dim"] == 4 and out[1]["l2_norm"] == 5.0
    assert out[1]["half_cos"] == 1.0            # prefix holds everything
    assert out[1]["quarter_cos"] == 3.0 / 5.0   # [3.0] prefix
    assert out[2]["half_cos"] == math.sqrt(2.0) / 2.0  # sqrt(1/2) floor
    assert out[3]["half_cos"] is None and out[3]["quarter_cos"] is None


def test_triple_counts_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        triple_counts,
    )

    # baskets: {1,2,3} twice, {1,2,3,4} once, {9} (too small, ignored)
    rows = (
        [(100, i) for i in (1, 2, 3)]
        + [(200, i) for i in (1, 2, 3)]
        + [(300, i) for i in (1, 2, 3, 4)]
        + [(400, 9)]
    )
    items = spark.createDataFrame(rows, "basket long, item long")
    out = {
        (r["item_a"], r["item_b"], r["item_c"]): r
        for r in triple_counts(items, min_triple_count=2).collect()
    }
    # only (1,2,3) appears in >= 2 baskets (three, in fact)
    assert list(out) == [(1, 2, 3)]
    r = out[(1, 2, 3)]
    assert r["triple_n"] == 3
    assert r["support"] == 3.0 / 4.0  # 4 distinct baskets overall


def test_haar_energy_hand_values(spark):
    from decimal import Decimal

    from adventureworks_pysparkjobs_spark.operators.analytics import (
        haar_energy,
    )

    # 4-day window, counts [3, 1, 2, 2]:
    #   level 1: d = [3-1, 2-2] = [2, 0] -> energy 4
    #   level 2: a1 = [4, 4]; d = [4-4] = [0] -> energy 0
    rows = []
    eid = 0
    for day, n in zip((1, 2, 3, 4), (3, 1, 2, 2)):
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-0{day} 00:00:00", 1, "e"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["level"]: r for r in haar_energy(ev, window_days=4).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_coeffs"] == 2
    assert out[1]["energy"] == Decimal(4)
    assert out[2]["n_coeffs"] == 1
    assert out[2]["energy"] == Decimal(0)


def test_bootstrap_mean_ci_matches_python_reference(spark):
    import hashlib

    from adventureworks_pysparkjobs_spark.operators.analytics import (
        bootstrap_mean_ci,
    )

    # 8 days with counts 1..8 (one event per count unit)
    rows = []
    eid = 0
    counts = [1, 2, 3, 4, 5, 6, 7, 8]
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-0{day} 00:00:00", 1, "e"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    B = 40
    r = bootstrap_mean_ci(ev, n_boot=B).collect()[0]

    def idx(b, j, n):
        d = hashlib.md5(f"bs|{b}|{j}".encode()).hexdigest()[:8]
        return int(d, 16) % n

    n = len(counts)
    means = sorted(
        (sum(counts[idx(b, j, n)] for j in range(n)) / n, b)
        for b in range(B)
    )
    k_lo = max(1, (25 * B) // 1000)          # = 1
    k_hi = B + 1 - k_lo                      # = 40
    assert r["n_days"] == n and r["n_boot"] == B
    assert r["mean_obs"] == sum(counts) / n
    assert r["ci_lo"] == means[k_lo - 1][0]
    assert r["ci_hi"] == means[k_hi - 1][0]
    assert r["ci_lo"] <= r["mean_obs"] <= r["ci_hi"]


def test_sniff_media_types_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.multimodal import (
        sniff_media_types,
    )

    rows = [
        (bytes.fromhex("89504E470D0A1A0A") + b"png-body",),
        (bytes.fromhex("FFD8FFE0") + b"jpeg-body",),
        (bytes.fromhex("FFD8FFE1") + b"jpeg-exif-body",),  # FFD8FF prefix
        (b"plain text, no signature",),
    ]
    df = spark.createDataFrame(rows, "content binary")
    out = {r["media_type"]: r for r in sniff_media_types(df).collect()}
    assert out["png"]["n_payloads"] == 1
    assert out["png"]["total_bytes"] == 8 + len(b"png-body")
    assert out["jpeg"]["n_payloads"] == 2  # both FFD8FF variants
    assert out["unknown"]["n_payloads"] == 1


def test_ewma_daily_counts_matches_python_reference(spark):
    from adventureworks_pysparkjobs_spark.operators.timeseries import (
        ewma_daily_counts,
    )

    # type "a": days 0,2,3 active (gap at 1); type "b": single day.
    rows, eid = [], 0
    day_counts = {"a": {0: 2, 2: 1, 3: 3}, "b": {5: 4}}
    for k, dc in day_counts.items():
        for d, c in dc.items():
            for _ in range(c):
                eid += 1
                rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", 1, k))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    W = 4
    out = {
        (r["event_type"], r["d"]): r
        for r in ewma_daily_counts(ev, window_days=W).collect()
    }
    base = 19723  # epoch day of 2024-01-01
    # python reference: zero-densified convolution with weights 2^(W-1-k)
    for k, dc in day_counts.items():
        lo, hi = min(dc), max(dc)
        for td in range(lo + W - 1, hi + 1):
            scaled = sum(
                dc.get(td - lag, 0) * (1 << (W - 1 - lag))
                for lag in range(W)
            )
            r = out[(k, base + td)]
            assert r["ewma_scaled"] == scaled
            assert r["ewma"] == scaled / float((1 << W) - 1)
            assert r["cnt"] == dc.get(td, 0)
    # full-window-only: type a emits days 3..3 (lo=0 -> first full at 3),
    # type b (single day, lo=hi=5) emits nothing.
    assert set(out) == {("a", base + 3)}
    # hand value: day 3 of "a" sees [d3=3, d2=1, d1=0, d0=2] -> 3*8+1*4+0+2*1
    assert out[("a", base + 3)]["ewma_scaled"] == 30


def test_rolling_trend_slope_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.timeseries import (
        rolling_trend_slope,
    )

    # days 0, 1, 4 (gap): counts 1, 3, 2 — sparse regression, no zeros.
    rows, eid = [], 0
    for d, c in {0: 1, 1: 3, 4: 2}.items():
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", 1, "a"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["d"]: r
        for r in rolling_trend_slope(ev, window_days=3).collect()
    }
    base = 19723
    # day 0: single-point frame -> NULL slope
    assert out[base + 0]["n_obs"] == 1 and out[base + 0]["slope"] is None
    # day 1: frame {(0,1),(1,3)} -> slope 2
    assert out[base + 1]["n_obs"] == 2 and out[base + 1]["slope"] == 2.0
    # day 4: frame RANGE [2,4] holds only (4,2) -> NULL again
    assert out[base + 4]["n_obs"] == 1 and out[base + 4]["slope"] is None
    assert set(out) == {base + 0, base + 1, base + 4}


def test_spearman_correlation_ties_and_degenerate(spark):
    import math

    from adventureworks_pysparkjobs_spark.operators.profile import (
        spearman_correlation,
    )

    rows = [
        # group A: x tie at 2 -> avg ranks (1, 2.5, 2.5, 4);
        # y ranks (2, 1, 3, 4) -> rho = 3 / sqrt(4.5 * 5.0)
        ("A", 1.0, 2.0),
        ("A", 2.0, 1.0),
        ("A", 2.0, 5.0),
        ("A", 3.0, 7.0),
        # group B: constant y -> zero variance -> NULL
        ("B", 1.0, 9.0),
        ("B", 2.0, 9.0),
        # group C: a NULL x row is dropped pairwise-complete
        ("C", None, 1.0),
        ("C", 1.0, 1.0),
        ("C", 2.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r["g"]: r for r in spearman_correlation(df, "x", "y", "g").collect()
    }
    assert out["A"]["n_rows"] == 4
    assert abs(
        out["A"]["spearman_rho"] - 3.0 / (math.sqrt(4.5) * math.sqrt(5.0))
    ) < 1e-12
    assert out["B"]["spearman_rho"] is None
    assert out["C"]["n_rows"] == 2  # NULL row dropped
    assert out["C"]["spearman_rho"] == 1.0  # perfectly monotone


def test_abc_classification_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        abc_classification,
    )
    from adventureworks_pysparkjobs_spark.operators.relational import dec

    # values: 50, 30, 15, 4, 1 (total 100). Inclusive-cum classes:
    # 50 (cum 50 <= 80) A, 30 (cum 80 <= 80) A, 15 (cum 95 <= 95) B,
    # 4 (cum 99 > 95) C, 1 (cum 100) C.
    rows = [(1, 50.0), (2, 30.0), (3, 15.0), (4, 4.0), (5, 1.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = {
        r["abc_class"]: r
        for r in abc_classification(df, "k", dec("v", 12, 2)).collect()
    }
    assert out["A"]["n_members"] == 2 and out["A"]["class_value"] == 80.0
    assert out["B"]["n_members"] == 1 and out["B"]["class_value"] == 15.0
    assert out["C"]["n_members"] == 2 and out["C"]["class_value"] == 5.0
    assert out["A"]["value_share"] == 0.8
    # extreme concentration: first member alone crosses 80% -> no A
    df2 = spark.createDataFrame([(1, 90.0), (2, 10.0)], "k long, v double")
    out2 = {
        r["abc_class"]: r
        for r in abc_classification(df2, "k", dec("v", 12, 2)).collect()
    }
    assert "A" not in out2
    assert out2["B"]["n_members"] == 1  # 90 <= 95%
    assert out2["C"]["n_members"] == 1


def test_kcore_peel_hand_graph(spark):
    from adventureworks_pysparkjobs_spark.operators.graph import kcore_peel

    # K4 on {1,2,3,4} (a true 3-core) + a pendant chain 4-5-6 and a
    # triangle {7,8,9} (each node degree 2 -> dissolves under k=3).
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5), (5, 6),                                   # chain
        (7, 8), (7, 9), (8, 9),                           # triangle
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["round"]: r for r in kcore_peel(df, k=3, rounds=3).collect()}
    assert out[0]["nodes"] == 9 and out[0]["edges"] == 11
    # round 1: degree<3 removes 5,6,7,8,9; node 4 keeps degree 3.
    assert out[1]["nodes"] == 4 and out[1]["edges"] == 6
    # converged: K4 survives unchanged.
    assert out[2]["nodes"] == 4 and out[2]["edges"] == 6
    assert out[3]["nodes"] == 4 and out[3]["edges"] == 6


def test_token_budget_allocation_cap_and_shortfall(spark):
    from adventureworks_pysparkjobs_spark.operators.sampling import (
        token_budget_allocation,
    )

    # group A: 10000 tokens, B: 100. budget = 1.5 * 10100 = 15150;
    # weights 100e6 / 10e6 -> targets 13772 / 1377 (floor); B's 4-epoch
    # cap (400) binds -> shortfall 977, epochs exactly 4.0.
    df = spark.createDataFrame(
        [("A", 10000), ("B", 100)], "g string, ntok long"
    )
    out = {
        r["g"]: r
        for r in token_budget_allocation(
            df, "g", F.col("ntok"), budget_num=3, budget_den=2,
            max_epochs=4,
        ).collect()
    }
    assert out["A"]["avail_tokens"] == 10000
    assert out["A"]["target_tokens"] == 15150 * 100 // 110
    assert out["A"]["alloc_tokens"] == out["A"]["target_tokens"]
    assert out["A"]["shortfall_tokens"] == 0
    assert out["B"]["target_tokens"] == 15150 * 10 // 110
    assert out["B"]["alloc_tokens"] == 400
    assert out["B"]["epochs"] == 4.0
    assert out["B"]["shortfall_tokens"] == 15150 * 10 // 110 - 400


def test_source_minhash_overlap_identical_and_disjoint(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        source_minhash_overlap,
    )

    # sources A and B share the exact same text (union shingle sets
    # equal -> every seed matches); C is disjoint (expected ~0 matches;
    # md5 collisions on 3-gram sets this small are effectively
    # impossible). The short doc (< 3 tokens) contributes nothing.
    rows = [
        (1, "alpha beta gamma delta epsilon", "A"),
        (2, "alpha beta gamma delta epsilon", "B"),
        (3, "zeta eta theta iota kappa", "C"),
        (4, "tiny", "A"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_minhash_overlap(df, num_hashes=8).collect()
    }
    assert out[("A", "B")]["n_match"] == 8
    assert out[("A", "B")]["jaccard_est"] == 1.0
    assert out[("A", "C")]["n_match"] == 0
    assert out[("B", "C")]["n_match"] == 0
    assert all(r["n_seeds"] == 8 for r in out.values())


def test_substitution_candidates_band_and_anti_join(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        substitution_candidates,
    )

    parts = spark.createDataFrame(
        [
            # same block (widget, 5): 100.00 / 104.00 within 5%;
            # 100.00 / 120.00 outside; 104.00/120.00 outside (20*1600>10400)
            (1, "widget", 5, 100.00),
            (2, "widget", 5, 104.00),
            (3, "widget", 5, 120.00),
            # different size -> never a candidate even at equal price
            (4, "widget", 6, 100.00),
            # same block as 1/2, in band with 2 but co-purchased with 2
            (5, "widget", 5, 105.00),
        ],
        "p_partkey long, p_type string, p_size int, p_retailprice double",
    )
    cop = spark.createDataFrame([(2, 5)], "item_a long, item_b long")
    out = {
        (r["part_a"], r["part_b"])
        for r in substitution_candidates(parts, cop, band_den=20).collect()
    }
    # (1,2) in band & never co-bought; (1,5) 20*500=10000 <= 10000 in band;
    # (2,5) excluded by co-purchase; (x,3) and (x,4) out of band/block.
    assert out == {(1, 2), (1, 5)}


def test_pca_top_component_matches_numpy(spark):
    import numpy as np

    from adventureworks_pysparkjobs_spark.operators.similarity import (
        pca_top_component,
    )

    rng = np.random.RandomState(7)
    # strong direction u + small isotropic noise, uncentered (mean off 0)
    u = np.array([0.6, -0.8, 0.0, 0.0])
    X = (
        rng.normal(0, 2.0, (200, 1))[:, 0:1] * u[None, :]
        + rng.normal(0, 0.05, (200, 4))
        + 0.3
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    out = (
        pca_top_component(df, iterations=12)
        .orderBy("i")
        .collect()
    )
    v = np.array([r["loading"] for r in out])
    # numpy reference on the float32-rounded data the operator saw
    Xf = X.astype(np.float32).astype(np.float64)
    C = np.cov(Xf, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    cos = abs(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999  # direction match up to sign & quantization
    assert max(abs(r["loading"]) for r in out) == 1.0  # normalized


def test_user_gap_regularity_hand_classes(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        user_gap_regularity,
    )

    def ev(uid, secs):
        return [
            (uid * 100 + i, f"2024-01-01 00:00:{s:02d}", uid, "x")
            for i, s in enumerate(secs)
        ]

    rows = (
        ev(1, [0, 10, 20, 30])       # gaps 10,10,10 -> CV2=0 regular
        + ev(2, [0, 1, 2, 33])       # gaps 1,1,31: mean 11, CV2 = 600/3/121
        + ev(3, [0, 5, 11, 18])      # gaps 5,6,7 -> CV2 small -> regular
        + ev(4, [0, 1, 2])           # only 2 gaps -> excluded
    )
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["regularity_class"]: r
        for r in user_gap_regularity(df, min_gaps=3).collect()
    }
    # user2: n=3, sg=33, sgg=1+1+961=963; num=3*963-1089=1800, den=1089
    # num > 2*den (2178)? 1800 <= 2178 -> poisson
    assert out["regular"]["n_users"] == 2
    assert out["poisson"]["n_users"] == 1
    assert "bursty" not in out
    assert abs(out["regular"]["share"] - 2 / 3) < 1e-15


def test_grouped_value_percentiles_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        grouped_value_percentiles,
    )

    # group A: values 1..10 once each. p50 = smallest v with cum>=5 -> 5;
    # p90 -> 9; p99 -> 10. Over-threshold 8 -> 2 of 10.
    rows = [("A", v) for v in range(1, 11)] + [("B", 7), ("B", 7), ("B", 9)]
    df = spark.createDataFrame(rows, "g string, d int")
    out = {
        r["g"]: r
        for r in grouped_value_percentiles(
            df, "g", "d", percentiles=(50, 90, 99), over_threshold=8
        ).collect()
    }
    a = out["A"]
    assert (a["n_rows"], a["p50"], a["p90"], a["p99"]) == (10, 5, 9, 10)
    assert a["pct_over_8"] == 0.2
    # B: ties at 7 (cum 2 of 3 >= 1.5 -> p50=7), p90/p99 = 9
    b = out["B"]
    assert (b["p50"], b["p90"], b["p99"]) == (7, 9, 9)
    assert abs(b["pct_over_8"] - 1 / 3) < 1e-15


def test_functional_dependency_audit_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.quality import (
        functional_dependency_audit,
    )

    rows = [
        ("b1", "t1"), ("b1", "t1"),          # b1 -> one type: clean
        ("b2", "t1"), ("b2", "t2"), ("b2", None),  # b2 -> 3 values (NULL counts)
        (None, "t9"),                         # NULL lhs excluded
    ]
    df = spark.createDataFrame(rows, "b string, t string")
    out = {
        (r["lhs"], r["rhs"]): r
        for r in functional_dependency_audit(df, [("b", "t")]).collect()
    }
    r = out[("b", "t")]
    assert r["n_keys"] == 2
    assert r["n_violating"] == 1
    assert r["max_rhs_distinct"] == 3
    assert r["violation_rate"] == 0.5


@pytest.mark.slow
def test_markov_stationary_two_state_chain(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        markov_stationary,
    )

    # One user cycling a->a->b->a->a->b... transition counts:
    # a->a 1x per cycle? Build explicit sequence: a a b a a b a a b a
    # transitions: (a,a),(a,b),(b,a) x3 ... counts: a->a 3, a->b 3, b->a 3
    # P(a->a)=.5, P(a->b)=.5, P(b->a)=1 -> stationary (2/3, 1/3)
    types = ["a", "a", "b", "a", "a", "b", "a", "a", "b", "a"]
    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, t) for i, t in enumerate(types)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["event_type"]: r
        for r in markov_stationary(df, iterations=20).collect()
    }
    assert abs(out["a"]["stationary"] - 2 / 3) < 1e-6
    assert abs(out["b"]["stationary"] - 1 / 3) < 1e-6
    # renormalized each step: total stays ~scale
    tot = out["a"]["stationary_scaled"] + out["b"]["stationary_scaled"]
    assert abs(tot - 10**9) <= 2


def test_funnel_stage_latency_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        funnel_stage_latency,
    )

    # user 1: signup 00:00, view 00:05 (5 min), click 01:05 (60 min)
    # user 2: signup 00:00, view 00:25 (25 min), no click
    # user 3: view only (never signed up) -> not in funnel
    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup"),
        (2, "2024-01-01 00:05:00", 1, "view"),
        (3, "2024-01-01 01:05:00", 1, "click"),
        (4, "2024-01-01 00:00:00", 2, "signup"),
        (5, "2024-01-01 00:25:00", 2, "view"),
        (6, "2024-01-01 00:10:00", 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["transition"]: r
        for r in funnel_stage_latency(
            df, "user_id", "ts", "event_type",
            ("signup", "view", "click"), bucket_s=60,
        ).collect()
    }
    sv = out["signup->view"]
    assert sv["n_rows"] == 2
    # gaps 5 and 25 min -> p50 = 5 (cum 1*100 >= 2*50), p90 = 25
    assert (sv["p50"], sv["p90"]) == (5, 25)
    vc = out["view->click"]
    assert vc["n_rows"] == 1 and (vc["p50"], vc["p90"]) == (60, 60)


def test_also_bought_topk_normalization(spark):
    import math

    from adventureworks_pysparkjobs_spark.operators.analytics import (
        also_bought_topk,
    )

    # staple S appears in 4 baskets, niche N1/N2 in 2 each.
    # (S,N1) together 2x, (S,N2) 2x, (N1,N2) 2x.
    baskets = [
        (1, "S"), (1, "N1"), (1, "N2"),
        (2, "S"), (2, "N1"), (2, "N2"),
        (3, "S"), (4, "S"),
    ]
    df = spark.createDataFrame(baskets, "basket long, item string")
    out = {
        (r["item"], r["rank"]): r
        for r in also_bought_topk(df, k=2, min_pair_count=2).collect()
    }
    # For N1: score(N1,N2) = 2/(sqrt(2)*sqrt(2)) = 1.0 beats
    # score(N1,S) = 2/(sqrt(2)*sqrt(4)) ~ 0.707 despite equal pair_n —
    # the normalization at work.
    assert out[("N1", 1)]["also_bought"] == "N2"
    assert out[("N1", 1)]["score"] == 2 / (math.sqrt(2) * math.sqrt(2))
    assert out[("N1", 2)]["also_bought"] == "S"
    assert abs(out[("N1", 2)]["score"] - 2 / (math.sqrt(2) * 2)) < 1e-15
    # S's list is rank-ordered by score then key: N1 before N2 (tie)
    assert out[("S", 1)]["also_bought"] == "N1"
    assert out[("S", 2)]["also_bought"] == "N2"


def test_revenue_bridge_identity_and_nulls(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        revenue_bridge,
    )

    li = spark.createDataFrame(
        [
            # brand B1: y0 sells 10 units for 100; y1 sells 20 for 300
            (1, 101, 10.0, 100.0, 0.0),
            (2, 102, 20.0, 300.0, 0.0),
            # brand B2: appears only in y1 -> NULL effects, delta = rev
            (3, 103, 5.0, 50.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    od = spark.createDataFrame(
        [
            (1, "1999-06-01 00:00:00"),
            (2, "2000-06-01 00:00:00"),
            (3, "2000-07-01 00:00:00"),
        ],
        "o_orderkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    part = spark.createDataFrame(
        [(101, "B1"), (102, "B1"), (103, "B2")],
        "p_partkey long, p_brand string",
    )
    out = {
        r["p_brand"]: r
        for r in revenue_bridge(li, od, part, 1999, 2000, "p_brand")
            .collect()
    }
    b1 = out["B1"]
    # P0 = 10/unit; volume = (20-10)*10 = 100; price = 20*(15-10) = 100
    assert b1["delta"] == 200.0
    assert b1["volume_effect"] == 100.0
    assert b1["price_effect"] == 100.0
    assert b1["volume_effect"] + b1["price_effect"] == b1["delta"]
    b2 = out["B2"]
    assert b2["delta"] == 50.0
    assert b2["volume_effect"] is None and b2["price_effect"] is None


def test_mann_whitney_by_flag_matches_python_reference(spark):
    import math

    from adventureworks_pysparkjobs_spark.operators.profile import (
        mann_whitney_by_flag,
    )

    a = [1, 2, 2, 5]          # flagged
    b = [2, 3, 4, 4, 7]       # other
    rows = [(True, v) for v in a] + [(False, v) for v in b]
    df = spark.createDataFrame(rows, "f boolean, v long")
    r = mann_whitney_by_flag(df, "f", "v").collect()[0]

    # python reference with midranks
    allv = sorted(a + b)
    def midrank(x):
        lo = allv.index(x) + 1
        hi = len(allv) - allv[::-1].index(x)
        return (lo + hi) / 2
    R1 = sum(midrank(x) for x in a)
    n1, n2, N = len(a), len(b), len(a) + len(b)
    U1 = R1 - n1 * (n1 + 1) / 2
    assert r["n_flagged"] == n1 and r["n_other"] == n2
    assert r["u2_flagged"] == int(2 * U1)
    ties = sum(
        t**3 - t for t in (allv.count(x) for x in set(allv))
    )
    var = n1 * n2 / 12 * ((N + 1) - ties / (N * (N - 1)))
    z_ref = (2 * U1 - n1 * n2) / (2 * math.sqrt(var))
    assert abs(r["z"] - z_ref) < 1e-12
    assert abs(r["rank_biserial"] - (2 * U1 / (n1 * n2) - 1)) < 1e-12

    # all-tied input -> zero variance -> NULL z, defined biserial
    df2 = spark.createDataFrame(
        [(True, 5), (False, 5), (False, 5)], "f boolean, v long"
    )
    r2 = mann_whitney_by_flag(df2, "f", "v").collect()[0]
    assert r2["z"] is None
    assert r2["rank_biserial"] == 0.0  # U = n1*n2/2 exactly on full tie


def test_sentiment_scores_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import (
        sentiment_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "Great! this is GOOD, really good."),   # 3+2+2 = 7
            (2, "terrible and broken."),                # -3 + -2 = -5
            (3, "the weather is rainy"),                # no matches
            (4, "good but slow"),                       # 2 - 1 = 1
            (5, ""),                                    # empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sentiment_scores(docs).collect()}
    assert out[1]["sentiment_score"] == 7 and out[1]["n_matched"] == 3
    assert out[1]["sentiment_label"] == "positive"
    assert out[2]["sentiment_score"] == -5
    assert out[2]["sentiment_label"] == "negative"
    assert out[3]["sentiment_score"] == 0 and out[3]["n_matched"] == 0
    assert out[3]["sentiment_label"] == "neutral"
    assert out[4]["sentiment_score"] == 1
    assert out[5]["sentiment_score"] == 0 and out[5]["n_matched"] == 0


def test_khop_reachability_hand_graph(spark):
    from adventureworks_pysparkjobs_spark.operators.graph import (
        khop_reachability,
    )

    # star center 1 (degree 3: 2,3,4) + chain 4-5-6 + isolated edge 8-9.
    # max degree = 1 (deg 3); hop1 reaches {2,3,4}, hop2 {5}, hop3 {6}.
    edges = [(1, 2), (1, 3), (1, 4), (4, 5), (5, 6), (8, 9)]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["hop"]: r for r in khop_reachability(df, hops=4).collect()}
    assert (out[0]["n_reached"], out[0]["n_new"]) == (1, 1)
    assert (out[1]["n_reached"], out[1]["n_new"]) == (4, 3)
    assert (out[2]["n_reached"], out[2]["n_new"]) == (5, 1)
    assert (out[3]["n_reached"], out[3]["n_new"]) == (6, 1)
    # converged: the 8-9 component is unreachable
    assert (out[4]["n_reached"], out[4]["n_new"]) == (6, 0)


def test_target_encode_loo_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        target_encode_loo,
    )

    df = spark.createDataFrame(
        [
            (1, "A", 10.0), (2, "A", 20.0), (3, "A", 30.0),
            (4, "B", 5.0),                       # singleton -> NULL
        ],
        "id long, cat string, y double",
    )
    out = {
        r["id"]: r
        for r in target_encode_loo(
            df, "cat", "y", carry_cols=("id",)
        ).collect()
    }
    # row 1: (60-10)/2 = 25; row 2: (60-20)/2 = 20; row 3: 15
    assert out[1]["target_enc"] == 25.0
    assert out[2]["target_enc"] == 20.0
    assert out[3]["target_enc"] == 15.0
    assert out[4]["target_enc"] is None and out[4]["n_cat"] == 1
    # smoothing toward prior 0 with m=2: row 4 -> (5-5 + 2*0)/(0+2) = 0
    sm = {
        r["id"]: r
        for r in target_encode_loo(
            df, "cat", "y", smoothing_n=2, prior_num=0, prior_den=1,
            carry_cols=("id",),
        ).collect()
    }
    assert sm[4]["target_enc"] == 0.0
    assert sm[1]["target_enc"] == 50.0 / 4  # (60-10+0)/(2+2)


def test_daily_cross_correlation_shifted_series(spark):
    from adventureworks_pysparkjobs_spark.operators.timeseries import (
        daily_cross_correlation,
    )

    # y is exactly x shifted by +2 days: xcorr peaks at lag +2 with
    # r == 1 (up to the closed form's 1-ulp), and pair counts shrink
    # by |lag| off the densified span.
    x_counts = {0: 1, 1: 4, 2: 2, 3: 5, 4: 1, 5: 3}
    rows, eid = [], 0
    for d, c in x_counts.items():
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", 1, "a"))
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-{d + 3:02d} 06:00:00", 1, "b"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["lag"]: r
        for r in daily_cross_correlation(ev, "a", "b", max_lag=3)
            .collect()
    }
    # common span: days 0..7 (8 days). lag L pairs = 8 - |L|
    assert {r for r in out} == set(range(-3, 4))
    for lag, r in out.items():
        assert r["n_pairs"] == 8 - abs(lag)
    assert abs(out[2]["xcorr"] - 1.0) < 5e-16
    assert out[2]["xcorr"] == max(
        r["xcorr"] for r in out.values() if r["xcorr"] is not None
    )


def test_partition_modularity_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.graph import (
        partition_modularity,
    )

    # two triangles {1,2,3} and {4,5,6} joined by one bridge 3-4.
    # communities = the triangles: m=7, m2=14.
    # per community: e_c=3, d_c=7 -> term = (2*14*3 - 49)/196 = 35/196
    # Q = 70/196 = 0.35714...
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    member = [(n, "L" if n <= 3 else "R") for n in range(1, 7)]
    e = spark.createDataFrame(edges, "a long, b long")
    m = spark.createDataFrame(member, "node long, community string")
    rows = partition_modularity(e, m).collect()
    by_c = {r["community"]: r for r in rows}
    for c in ("L", "R"):
        assert by_c[c]["e_c"] == 3 and by_c[c]["d_c"] == 7
        assert by_c[c]["q_term"] == 35.0 / 196.0
    assert by_c[None]["q_term"] == 70.0 / 196.0

    # degenerate: one community holding everything -> Q = 0 exactly
    m_all = spark.createDataFrame(
        [(n, "X") for n in range(1, 7)], "node long, community string"
    )
    rows2 = partition_modularity(e, m_all).collect()
    q_all = {r["community"]: r["q_term"] for r in rows2}
    assert q_all[None] == 0.0  # (2*m2*m - m2^2)/m2^2 with e=m


def test_global_transitivity_hand_graphs(spark):
    from adventureworks_pysparkjobs_spark.operators.graph import (
        global_transitivity,
    )

    # triangle + pendant: nodes 1-2-3 closed, 3-4 open.
    # degrees 2,2,3,1 -> wedges = (1+1+3+0) = 5; triangles = 1
    # transitivity = 3*1/5 = 0.6
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    r = global_transitivity(e).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (4, 4)
    assert (r["n_wedges"], r["n_triangles"]) == (5, 1)
    assert r["transitivity"] == 6.0 / 10.0
    # pure star: wedges but zero triangles -> 0.0
    star = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "a long, b long"
    )
    r2 = global_transitivity(star).collect()[0]
    assert r2["n_triangles"] == 0 and r2["transitivity"] == 0.0
    # single edge: no wedges -> NULL
    r3 = global_transitivity(
        spark.createDataFrame([(1, 2)], "a long, b long")
    ).collect()[0]
    assert r3["transitivity"] is None


def test_customer_feature_store_hand_values(spark):
    from adventureworks_pysparkjobs_spark.queries import CATALOG

    from .conftest import SF_SMOKE

    out = CATALOG["customer_feature_store"].builder(spark, SF_SMOKE)
    rows = out.collect()
    by_k = {r["c_custkey"]: r for r in rows}
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    )
    ref = con.execute(
        """SELECT o_custkey, COUNT(*), MAX(CAST(o_orderdate AS DATE))
           FROM orders GROUP BY 1 ORDER BY 2 DESC LIMIT 1"""
    ).fetchone()
    k, n_orders, _last = ref
    assert by_k[k]["n_orders"] == n_orders
    # n>=2 customers have consistent span/gap identity
    for r in rows:
        if r["n_orders"] >= 2:
            assert r["mean_interorder_days"] == r["span_days"] / (
                r["n_orders"] - 1
            )
            assert r["recency_days"] is not None and r["recency_days"] >= 0
        elif r["n_orders"] == 0:
            assert r["recency_days"] is None
            assert r["total_spend"] == 0.0


def test_script_mix_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import script_mix

    docs = spark.createDataFrame(
        [
            (1, "zh", "你好世界 hello 123"),   # 4 cjk, 5 latin, 3 digit, 2 sp
            (2, "ru", "привет мир"),           # 9 cyrillic, 1 space
            (3, "en", ""),                     # empty -> counts 0
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in script_mix(docs, "lang", "text").collect()}
    zh = out["zh"]
    assert zh["n_chars"] == 14
    assert zh["cjk_share"] == 4 / 14
    assert zh["latin_share"] == 5 / 14
    assert zh["digit_share"] == 3 / 14
    assert zh["other_share"] == 2 / 14
    ru = out["ru"]
    assert ru["cyrillic_share"] == 9 / 10 and ru["latin_share"] == 0.0
    en = out["en"]
    assert en["n_chars"] == 0 and en["latin_share"] is None
    # shares + other == 1 exactly where defined (integer construction)
    for r in (zh, ru):
        assert (
            abs(
                r["latin_share"] + r["cjk_share"] + r["cyrillic_share"]
                + r["digit_share"] + r["other_share"] - 1.0
            )
            < 1e-15
        )


def test_keyness_by_group_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.text import (
        keyness_by_group,
    )

    # source A says "apple" a lot; B says "banana"; both share "the".
    rows = [
        (1, "A", "apple apple apple apple apple the the"),
        (2, "A", "apple apple the"),
        (3, "B", "banana banana banana banana banana the the"),
        (4, "B", "banana the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["source"], r["rank"]): r
        for r in keyness_by_group(
            df, "source", "text", top_k=2, min_count=2
        ).collect()
    }
    # A: 7 apple + 3 the -> n_g = 10; B: 6 banana + 3 the -> n_g = 9;
    # N = 19. apple: c_g=7, c_rest=0 -> 7*(19-10)/(1*10) = 6.3;
    # the(A): 3*9/(4*10) = 0.675; banana: 6*(19-9)/(1*9) = 60/9.
    a1 = out[("A", 1)]
    assert a1["term"] == "apple"
    assert (a1["n_in_group"], a1["n_rest"]) == (7, 0)
    assert a1["rate_ratio"] == 63.0 / 10.0
    assert out[("A", 2)]["term"] == "the"
    assert out[("A", 2)]["rate_ratio"] == 27.0 / 40.0
    b1 = out[("B", 1)]
    assert b1["term"] == "banana" and b1["rate_ratio"] == 60.0 / 9.0


def test_lsh_band_tuning_monotonicity_and_consistency(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        lsh_band_tuning,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
            (4, "one two three four five seven"),
            (5, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_band_tuning(docs, num_hashes=8).collect()
    }
    assert set(rows) == {(8, 1), (4, 2), (2, 4)}
    # more bands with shorter rows can only catch MORE candidates
    c81 = rows[(8, 1)]["n_candidate_pairs"]
    c42 = rows[(4, 2)]["n_candidate_pairs"]
    c24 = rows[(2, 4)]["n_candidate_pairs"]
    assert c81 >= c42 >= c24
    # theoretical S-curve: same python formula
    assert rows[(4, 2)]["p_catch_at_05"] == 1.0 - (1.0 - 0.5**2) ** 4
    assert rows[(2, 4)]["p_catch_at_08"] == 1.0 - (1.0 - 0.8**4) ** 2
    # collisions >= distinct pairs (a pair can collide in many bands)
    for r in rows.values():
        assert r["n_bucket_collisions"] >= r["n_candidate_pairs"]
    # the (4,2) config is exactly what minhash_lsh_pairs bands — its
    # candidate set must cover every verified pair it returns
    verified = minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, threshold=0.0
    ).count()
    assert c42 >= verified


def test_autocorr_spectrum_symmetry_and_lag0(spark):
    from adventureworks_pysparkjobs_spark.operators.timeseries import (
        daily_cross_correlation,
    )

    rows, eid = [], 0
    for d, c in {0: 1, 1: 5, 2: 2, 3: 4, 4: 1, 5: 5, 6: 2}.items():
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", 1, "v"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["lag"]: r
        for r in daily_cross_correlation(ev, "v", "v", max_lag=3).collect()
    }
    # lag 0 of a self-correlation is exactly 1 (num == var terms)
    assert abs(out[0]["xcorr"] - 1.0) < 5e-16
    # symmetric: r(-L) == r(L) (identical pair sets, swapped roles)
    for lag in (1, 2, 3):
        assert out[lag]["n_pairs"] == out[-lag]["n_pairs"]
        assert abs(out[lag]["xcorr"] - out[-lag]["xcorr"]) < 1e-15


def test_dedup_threshold_curve_monotone(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        dedup_threshold_curve,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),        # identical to 1 (J = 1.0)
            (3, "a b c d e f g x"),        # high-sim to 1/2
            (4, "p q r s t u v w"),        # unrelated
        ],
        "doc_id long, text string",
    )
    out = {
        r["threshold"]: r
        for r in dedup_threshold_curve(
            docs, n=3, thresholds=(0.5, 0.9)
        ).collect()
    }
    # identical pair always survives; curve is monotone non-increasing
    assert out[0.5]["n_pairs"] >= out[0.9]["n_pairs"] >= 1
    assert out[0.5]["n_docs_removed"] >= out[0.9]["n_docs_removed"] >= 1
    # at 0.9 only the identical pair (1,2) survives -> doc 2 removed
    assert out[0.9]["n_docs_removed"] == 1
    # removed docs never exceed surviving pairs
    for r in out.values():
        assert r["n_docs_removed"] <= r["n_pairs"]


def test_keep_best_per_cluster_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (7, 200), (8, 200)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10), (8, 10)],
        "doc_id long, n_chars long",
    )
    out = {
        r["cluster_id"]: r
        for r in keep_best_per_cluster(clusters, docs).collect()
    }
    # cluster 100: score tie 90 between 2 and 3 -> keeper = min id 2;
    # removed mass = 90 (doc 3) + 50 (doc 1)
    c1 = out[100]
    assert (c1["n_members"], c1["keeper_id"], c1["keeper_score"]) == (3, 2, 90)
    assert c1["score_removed"] == 140
    # cluster 200: full tie -> keeper 7, removed 10
    c2 = out[200]
    assert (c2["keeper_id"], c2["score_removed"]) == (7, 10)


def test_keep_best_per_cluster_missing_scores_stay_visible(spark):
    """r7 ADVICE: a cluster member absent from `docs` (or with a NULL
    score) must stay in n_members and rank LAST for keeper selection,
    not silently vanish from the accounting."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (7, 200), (8, 200)],
        "doc_id long, cluster_id long",
    )
    # doc 3 missing entirely; cluster 200 has NO scores at all
    docs = spark.createDataFrame(
        [(1, 50), (2, 90)], "doc_id long, n_chars long"
    )
    out = {
        r["cluster_id"]: r
        for r in keep_best_per_cluster(clusters, docs).collect()
    }
    c1 = out[100]
    # all 3 members visible; scoreless doc 3 ranks last, keeper = doc 2
    assert (c1["n_members"], c1["keeper_id"], c1["keeper_score"]) == (3, 2, 90)
    assert c1["score_removed"] == 50  # NULL scores don't add to the sum
    c2 = out[200]
    # fully scoreless cluster: keeper = smallest id, NULL keeper_score
    assert (c2["n_members"], c2["keeper_id"]) == (2, 7)
    assert c2["keeper_score"] is None and c2["score_removed"] == 0


def test_winsorized_stats_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import (
        winsorized_stats,
    )

    # values 1..20: p5 boundary = 1 (cum 1*100 >= 20*5), p95 = 19.
    # clipped sum = sum(1..19) + 19 = 190 + 19 = 209
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 21)], "x double"
    )
    r = winsorized_stats(df, "x", 5, 95).collect()[0]
    assert r["n_rows"] == 20
    assert r["lo_bound"] == 1.0 and r["hi_bound"] == 19.0
    assert r["n_clipped_lo"] == 0 and r["n_clipped_hi"] == 1
    assert r["mean"] == 210.0 / 20.0
    assert r["winsorized_mean"] == 209.0 / 20.0
    # heavy outlier barely moves the winsorized mean
    df2 = spark.createDataFrame(
        [(float(v),) for v in range(1, 20)] + [(10_000_000.0,)],
        "x double",
    )
    r2 = winsorized_stats(df2, "x", 5, 95).collect()[0]
    assert r2["winsorized_mean"] < 30
    assert r2["mean"] > 500_000


def test_resurrection_counts_hand_values(spark):
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        resurrection_counts,
    )

    rows = [
        # user 1: days 0, 1, 10 -> gap 9 >= 7 resurrects on day 10
        (1, "2024-01-01 08:00:00", 1, "x"),
        (2, "2024-01-02 08:00:00", 1, "x"),
        (3, "2024-01-11 08:00:00", 1, "x"),
        # user 2: days 0, 3 -> no dormancy
        (4, "2024-01-01 08:00:00", 2, "x"),
        (5, "2024-01-04 08:00:00", 2, "x"),
        # user 3: two separate resurrections (days 0, 8, 20)
        (6, "2024-01-01 08:00:00", 3, "x"),
        (7, "2024-01-09 08:00:00", 3, "x"),
        (8, "2024-01-21 08:00:00", 3, "x"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["week"]: r for r in resurrection_counts(ev).collect()}
    # epoch day of 2024-01-11 = 19733 -> week 2819; 2024-01-09 = 19731
    # -> week 2818; 2024-01-21 = 19743 -> week 2820
    assert out[19733 // 7]["n_resurrections"] >= 1
    total = sum(r["n_resurrections"] for r in out.values())
    assert total == 3  # user1 once + user3 twice
    assert all(r["n_users"] <= r["n_resurrections"] for r in out.values())
