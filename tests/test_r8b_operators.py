"""Hand-value and property tests for the round-8 continuation wave:
total-variation mix drift, Cramér's V matrix, isotonic calibration,
Kruskal-Wallis, 2-D Mahalanobis outliers, runs test, Hellinger source
distance, vocab coverage, DiD estimator, Simpson audit, digit heaping.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


class TestMixTvDrift:
    def _frame(self, spark, weeks: dict[str, dict[str, int]]):
        rows = []
        for monday, mix in weeks.items():
            base = dt.datetime.fromisoformat(monday + "T10:00:00")
            for cat, n in mix.items():
                rows += [(base, cat)] * n
        return spark.createDataFrame(rows, "ts timestamp, event_type string")

    def test_hand_value(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            mix_tv_drift,
        )

        # 2024-01-01 and 2024-01-08 are Mondays; mixes (3a,1b)->(1a,3b):
        # TV = (|1*4-3*4| + |3*4-1*4|) / (2*4*4) = 0.5
        ev = self._frame(
            spark,
            {"2024-01-01": {"a": 3, "b": 1}, "2024-01-08": {"a": 1, "b": 3}},
        )
        rows = mix_tv_drift(ev).collect()
        assert len(rows) == 1  # boundary weeks pair only once
        r = rows[0]
        assert r["week"] == dt.date(2024, 1, 8)
        assert (r["n_prev"], r["n_cur"], r["n_types"]) == (4, 4, 2)
        assert r["tv_distance"] == 0.5

    def test_disjoint_mixes_give_tv_one(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            mix_tv_drift,
        )

        ev = self._frame(
            spark,
            {"2024-01-01": {"a": 5}, "2024-01-08": {"b": 7}},
        )
        r = mix_tv_drift(ev).collect()[0]
        assert r["n_types"] == 2 and r["tv_distance"] == 1.0

    def test_identical_mix_gives_zero(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            mix_tv_drift,
        )

        ev = self._frame(
            spark,
            {"2024-01-01": {"a": 2, "b": 2}, "2024-01-08": {"a": 4, "b": 4}},
        )
        assert mix_tv_drift(ev).collect()[0]["tv_distance"] == 0.0

    def test_single_week_yields_no_pairs(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            mix_tv_drift,
        )

        ev = self._frame(spark, {"2024-01-01": {"a": 3}})
        assert mix_tv_drift(ev).count() == 0


class TestCramersVMatrix:
    def test_perfect_association_is_one(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            cramers_v_matrix,
        )

        df = spark.createDataFrame(
            [("x", "u"), ("x", "u"), ("y", "v"), ("y", "v")],
            "a string, b string",
        )
        r = cramers_v_matrix(df, ["a", "b"]).collect()[0]
        assert r["col_pair"] == "a|b" and r["dof"] == 1
        assert r["chi2"] == 4.0 and r["cramers_v"] == 1.0

    def test_independent_uniform_is_zero(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            cramers_v_matrix,
        )

        rows = [(a, b) for a in "xy" for b in "uv"]
        df = spark.createDataFrame(rows, "a string, b string")
        r = cramers_v_matrix(df, ["a", "b"]).collect()[0]
        assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0

    def test_constant_column_guards_null(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            cramers_v_matrix,
        )

        df = spark.createDataFrame(
            [("x", "u"), ("x", "v")], "a string, b string"
        )
        r = cramers_v_matrix(df, ["a", "b"]).collect()[0]
        assert r["r_levels"] == 1 and r["cramers_v"] is None

    def test_pair_count_is_k_choose_2(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            cramers_v_matrix,
        )

        df = spark.createDataFrame(
            [("x", "u", "1", "p")], "a string, b string, c string, d string"
        )
        assert cramers_v_matrix(df, ["a", "b", "c", "d"]).count() == 6


class TestKruskalWallis:
    def test_hand_value_no_ties(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            kruskal_wallis,
        )

        # {1,2} vs {3,4}: R1=3, R2=7 -> H = 0.6*29 - 15 = 2.4
        df = spark.createDataFrame(
            [("g1", 1.0), ("g1", 2.0), ("g2", 3.0), ("g2", 4.0)],
            "g string, v double",
        )
        r = kruskal_wallis(df, "g", F.floor(F.col("v"))).collect()[0]
        assert (r["n"], r["k_groups"], r["n_tied_bins"]) == (4, 2, 0)
        assert math.isclose(r["h"], 2.4, rel_tol=1e-12)
        assert r["tie_correction"] == 1.0
        assert r["h_corrected"] == r["h"]

    def test_all_tied_degenerates_to_null(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            kruskal_wallis,
        )

        df = spark.createDataFrame(
            [("g1", 5.0), ("g1", 5.0), ("g2", 5.0), ("g2", 5.0)],
            "g string, v double",
        )
        r = kruskal_wallis(df, "g", F.floor(F.col("v"))).collect()[0]
        assert r["h"] == 0.0
        assert r["tie_correction"] == 0.0
        assert r["h_corrected"] is None

    def test_identical_groups_give_zero_h(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            kruskal_wallis,
        )

        rows = [("g1", float(v)) for v in (1, 2, 3)] + [
            ("g2", float(v)) for v in (1, 2, 3)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = kruskal_wallis(df, "g", F.floor(F.col("v"))).collect()[0]
        assert r["h"] == 0.0 and r["h_corrected"] == 0.0


class TestMahalanobis2d:
    def test_joint_outlier_ranks_first(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            mahalanobis_outliers_2d,
        )

        # tight diagonal cloud + one off-diagonal point: the breaker of
        # the correlation is the top outlier even though both its
        # marginals are in range
        rows = [(i, i, i) for i in range(1, 9)] + [(99, 8, 1)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        df = df.select(
            "id",
            F.col("x").cast("decimal(38,0)").alias("x"),
            F.col("y").cast("decimal(38,0)").alias("y"),
        )
        out = mahalanobis_outliers_2d(df, "id", "x", "y", top_n=3).collect()
        assert out[0]["id"] == 99 and out[0]["rnk"] == 1
        assert [r["rnk"] for r in out] == [1, 2, 3]
        assert out[0]["maha_sq"] > out[1]["maha_sq"]

    def test_collinear_data_guards_null(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            mahalanobis_outliers_2d,
        )

        rows = [(i, i, 2 * i) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        df = df.select(
            "id",
            F.col("x").cast("decimal(38,0)").alias("x"),
            F.col("y").cast("decimal(38,0)").alias("y"),
        )
        out = mahalanobis_outliers_2d(df, "id", "x", "y", top_n=5).collect()
        assert all(r["maha_sq"] is None for r in out)


class TestRunsTestEntry:
    def test_entry_consistency(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        r = CATALOG["orders_revenue_runs_test"].builder(
            spark, SF_SMOKE
        ).collect()[0]
        assert r["n_above"] + r["n_below"] == r["n_days"]
        assert 1 <= r["runs"] <= r["n_days"]
        m2 = 2 * r["n_above"] * r["n_below"]
        assert r["expected_runs"] == 1.0 + m2 / r["n_days"]
        # z reconstruction from the row's own integers
        nd = float(r["n_days"])
        var = m2 * (m2 - nd) / (nd * nd * (nd - 1.0))
        assert r["z_score"] == (r["runs"] - r["expected_runs"]) / math.sqrt(
            var
        )


class TestIsotonicEntry:
    def test_fit_is_monotone_and_bounded(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["doc_isotonic_calibration"]
            .builder(spark, SF_SMOKE)
            .orderBy("score_bin")
            .collect()
        )
        iso = [r["iso_rate"] for r in rows]
        assert iso == sorted(iso)  # PAVA output is non-decreasing
        assert all(0.0 <= v <= 1.0 for v in iso)
        # pooled fit preserves total mass direction: weighted means equal
        num = sum(r["n_docs"] * r["iso_rate"] for r in rows)
        pos = sum(r["n_label_pos"] for r in rows)
        assert math.isclose(
            num, pos, rel_tol=1e-9
        )  # PAVA conserves the total positive mass

    def test_non_monotone_input_pools(self, spark):
        # direct minimax check on a 2-bin decreasing input via the
        # operator-level construction inside the entry is covered by the
        # oracle; here assert the fixture actually exercises pooling
        # (at least one bin's iso_rate differs from its raw rate)
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["doc_isotonic_calibration"]
            .builder(spark, SF_SMOKE)
            .collect()
        )
        assert any(r["iso_rate"] != r["emp_rate"] for r in rows)


class TestHellingerEntry:
    def test_bounds_symmetry_and_pair_count(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["corpus_source_hellinger"]
            .builder(spark, SF_SMOKE)
            .collect()
        )
        sources = {r["source_a"] for r in rows} | {
            r["source_b"] for r in rows
        }
        k = len(sources)
        assert len(rows) == k * (k - 1) // 2
        for r in rows:
            assert r["source_a"] < r["source_b"]
            assert 0.0 <= r["bc_affinity"] <= 1.0 + 1e-12
            assert 0.0 <= r["hellinger"] <= 1.0
            assert r["hellinger"] == math.sqrt(
                max(0.0, 1.0 - r["bc_affinity"])
            )


class TestVocabCoverageEntry:
    def test_curve_shape(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["corpus_vocab_coverage"]
            .builder(spark, SF_SMOKE)
            .orderBy("target_pct")
            .collect()
        )
        assert [r["target_pct"] for r in rows] == [50, 80, 90, 95, 99, 100]
        terms = [r["n_terms"] for r in rows]
        assert terms == sorted(terms)  # more coverage needs more terms
        for r in rows:
            assert r["attained_coverage"] * 100 >= r["target_pct"] - 1e-9
            assert r["covered_tokens"] <= r["total_tokens"]
        assert rows[-1]["covered_tokens"] == rows[-1]["total_tokens"]


class TestDidEntry:
    def test_identity_and_cell_totals(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        r = CATALOG["events_did_estimator"].builder(spark, SF_SMOKE).collect()[
            0
        ]
        n_events = load_table(spark, SF_SMOKE, "events").count()
        assert (
            r["n_ctrl_pre"]
            + r["n_ctrl_post"]
            + r["n_treat_pre"]
            + r["n_treat_post"]
            == n_events
        )
        assert r["did"] == (r["mean_treat_post"] - r["mean_treat_pre"]) - (
            r["mean_ctrl_post"] - r["mean_ctrl_pre"]
        )
        assert r["se"] > 0.0
        assert r["z_score"] == r["did"] / r["se"]


class TestSimpsonAuditEntry:
    def test_pooled_slope_constant_and_flag_consistent(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["lineitem_simpson_audit"]
            .builder(spark, SF_SMOKE)
            .collect()
        )
        pooled = {r["slope_pooled"] for r in rows}
        assert len(pooled) == 1
        for r in rows:
            if r["sign_reversed"]:
                assert r["slope_within"] is not None
                assert (
                    r["slope_within"] > 0 > r["slope_pooled"]
                    or r["slope_within"] < 0 < r["slope_pooled"]
                )


class TestDigitHeapingEntry:
    def test_partition_of_unity(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        rows = (
            CATALOG["lineitem_digit_heaping"].builder(spark, SF_SMOKE)
        ).collect()
        n_lines = load_table(spark, SF_SMOKE, "lineitem").count()
        assert sum(r["n"] for r in rows) == n_lines
        assert {r["terminal_digit"] for r in rows} <= set(range(10))
        assert all(r["chi2_contrib"] >= 0.0 for r in rows)
        assert math.isclose(
            sum(r["share"] for r in rows), 1.0, rel_tol=1e-9
        )


class TestHubnessEntry:
    def test_mass_conservation(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        rows = (
            CATALOG["emb_hubness_audit"].builder(spark, SF_SMOKE)
        ).collect()
        n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
        assert sum(r["n_vectors"] for r in rows) == n_vec
        # every vector emits exactly 5 neighbor slots: total k-occurrence
        # mass is 5 * n_vectors
        assert sum(r["k_occ"] * r["n_vectors"] for r in rows) == 5 * n_vec
        cum = max(r["cum_share"] for r in rows)
        assert math.isclose(cum, 1.0, rel_tol=1e-12)


class TestWinnowingPairs:
    def test_shared_run_is_detected(self, spark):
        from adventureworks_pysparkjobs_spark.operators.text import (
            winnow_fingerprints,
        )

        # two docs sharing a 60-char run MUST share fingerprints
        # (the winnowing guarantee: any run >= k + window - 1 chars
        # shares a selected hash)
        shared = "the quick brown fox jumps over the lazy dog again and"
        df = spark.createDataFrame(
            [
                (1, "AAAA " + shared + " XXXX"),
                (2, "BBBB " + shared + " YYYY"),
                (3, "completely unrelated content zzz qqq www"),
            ],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(df, "text", k=8, window=4)
        rows = {r["doc_id"]: set(r["fingerprints"]) for r in fps.collect()}
        assert rows[1] & rows[2]  # guarantee holds
        assert len(rows[1] & rows[3]) < len(rows[1] & rows[2])

    def test_entry_overlap_bounds(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["doc_winnowing_pairs"].builder(spark, SF_SMOKE)
        ).collect()
        for r in rows:
            assert r["id1"] < r["id2"]
            assert r["n_shared"] >= 3
            assert 0.0 < r["overlap_coefficient"] <= 1.0
            assert r["n_shared"] <= min(r["n_fp_1"], r["n_fp_2"])


class TestAbcMigrationEntry:
    def test_partition_of_parts(self, spark):
        import duckdb

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["lineitem_abc_migration"].builder(spark, SF_SMOKE)
        ).collect()
        n_parts_with_sales = duckdb.sql(
            f"SELECT COUNT(DISTINCT l_partkey) FROM "
            f"'{SF_SMOKE}/lineitem.parquet'"
        ).fetchone()[0]
        assert sum(r["n_parts"] for r in rows) == n_parts_with_sales
        classes = {"A", "B", "C", "none"}
        for r in rows:
            assert r["class_from"] in classes and r["class_to"] in classes
        # 'none' -> 'none' cannot appear: membership requires revenue in
        # at least one period
        assert not any(
            r["class_from"] == "none" and r["class_to"] == "none"
            for r in rows
        )


class TestMaseEntry:
    def test_hand_series(self, spark):
        from adventureworks_pysparkjobs_spark.operators import analytics  # noqa: F401
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        r = CATALOG["events_seasonal_naive_mase"].builder(
            spark, SF_SMOKE
        ).collect()[0]
        assert r["n_scored"] == r["n_days"] - 7  # dense fixture calendar
        assert r["mase"] == r["mae_seasonal"] / r["mae_naive"]


class TestDrawdownEntry:
    def test_invariants(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        r = CATALOG["orders_revenue_drawdown"].builder(
            spark, SF_SMOKE
        ).collect()[0]
        assert r["max_drawdown"] == r["peak_revenue"] - r["trough_revenue"]
        assert r["max_drawdown"] >= 0.0
        assert 0.0 <= r["drawdown_frac"] < 1.0


class TestPartialCorrEntry:
    def test_bounds_and_identity(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        r = CATALOG["doc_length_partial_corr"].builder(
            spark, SF_SMOKE
        ).collect()[0]
        for k in ("r_xy", "r_xz", "r_yz", "partial_r_xy_given_z"):
            assert -1.0 - 1e-12 <= r[k] <= 1.0 + 1e-12
        den = (1.0 - r["r_xz"] ** 2) * (1.0 - r["r_yz"] ** 2)
        assert r["partial_r_xy_given_z"] == (
            r["r_xy"] - r["r_xz"] * r["r_yz"]
        ) / den ** 0.5


class TestCosineHistogramEntry:
    def test_pair_mass(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        rows = (
            CATALOG["emb_cosine_histogram"].builder(spark, SF_SMOKE)
        ).collect()
        n = load_table(spark, SF_SMOKE, "embeddings").count()
        assert sum(r["n_pairs"] for r in rows) == n * (n - 1) // 2
        assert max(r["cum_share"] for r in rows) == 1.0
        for r in rows:
            assert r["bucket_lo"] == r["bucket"] * 0.05


class TestShiftShareEntry:
    def test_decomposition_identity(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["nation_shift_share"].builder(spark, SF_SMOKE)
        ).collect()
        for r in rows:
            # additive identity holds by construction
            assert math.isclose(
                r["national_effect"]
                + r["mix_effect"]
                + r["competitive_effect"],
                r["delta"],
                rel_tol=1e-9,
                abs_tol=1e-6,
            )
            assert r["delta"] == r["rev_post"] - r["rev_pre"]
        # national effects share one growth rate: effect/rev_pre constant
        gs = {
            round(r["national_effect"] / r["rev_pre"], 9)
            for r in rows
            if r["rev_pre"] > 0
        }
        assert len(gs) == 1


class TestAbSampleSizeEntry:
    def test_formula_reconstruction(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        r = CATALOG["events_ab_sample_size"].builder(
            spark, SF_SMOKE
        ).collect()[0]
        z = 1.959963984540054 + 0.8416212335729143
        want = 2.0 * r["pooled_var"] * z * z / (
            r["observed_delta"] * r["observed_delta"]
        )
        assert r["required_n_per_arm"] == want


class TestDupQualityOddsEntry:
    def test_cell_partition(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        r = CATALOG["doc_dup_quality_odds"].builder(
            spark, SF_SMOKE
        ).collect()[0]
        assert (
            r["dup_short"] + r["dup_long"] + r["uniq_short"] + r["uniq_long"]
            == r["n_docs"]
        )
        assert r["dup_short"] + r["dup_long"] == r["n_dup"]
        assert r["dup_short"] + r["uniq_short"] == r["n_short"]


class TestCsvRoundtripEntry:
    def test_adversarial_text_roundtrips(self, spark, tmp_path):
        # direct adversarial check beyond the fixture: commas, quotes,
        # embedded newlines, unicode
        rows = [
            (1, 'a,b,"c"\nnext line', "en", "s1", 18),
            (2, "plain", "fr", "s2", 5),
            (3, '""', "es", "s3", 2),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        p = str(tmp_path / "csv_rt")
        (
            df.write.mode("overwrite").option("header", "true")
            .option("quote", '"').option("escape", '"').csv(p)
        )
        back = (
            spark.read.schema(
                "doc_id long, text string, lang string, source string, "
                "n_chars long"
            )
            .option("header", "true").option("multiLine", "true")
            .option("quote", '"').option("escape", '"').csv(p)
        )
        assert sorted(map(tuple, back.collect())) == sorted(rows)


class TestConversionWindowCurveEntry:
    def test_curve_is_monotone_and_bounded(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["events_conversion_window_curve"]
            .builder(spark, SF_SMOKE)
            .orderBy("window_days")
            .collect()
        )
        assert [r["window_days"] for r in rows] == [1, 3, 7, 14]
        # one signup population shared by every window
        assert len({r["n_signups"] for r in rows}) == 1
        assert len({r["n_converted_ever"] for r in rows}) == 1
        conv = [r["n_converted"] for r in rows]
        assert conv == sorted(conv)  # wider window, never fewer
        for r in rows:
            assert r["n_converted"] <= r["n_converted_ever"] <= r["n_signups"]
            assert r["conversion_rate"] == r["n_converted"] / r["n_signups"]
