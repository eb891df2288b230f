"""Hand-value and property tests for the round-8 operator wave:
Kendall tau-b, Theil–Sen trend, backlog timeline, 2-D skyline,
audience overlap, unicode sanity, degree distribution, personalized
PageRank."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, counts: dict[str, list[int]], d0="2024-01-01"):
    """Build an events-like frame where day i has counts[k][i] rows of
    type k (one row per count unit)."""
    base = dt.date.fromisoformat(d0)
    rows = []
    for k, series in counts.items():
        for i, c in enumerate(series):
            for j in range(c):
                rows.append(
                    (
                        dt.datetime.combine(
                            base + dt.timedelta(days=i),
                            dt.time(1, 0, j % 60),
                        ),
                        k,
                    )
                )
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


class TestKendallTau:
    def test_perfectly_discordant(self, spark):
        from adventureworks_pysparkjobs_spark.operators.timeseries import (
            kendall_tau_daily,
        )

        ev = _events(spark, {"a": [1, 2, 3, 4], "b": [4, 3, 2, 1]})
        r = kendall_tau_daily(ev).collect()
        assert len(r) == 1
        row = r[0]
        assert (row["k_a"], row["k_b"]) == ("a", "b")
        assert row["n_days"] == 4 and row["n_pairs"] == 6
        assert (row["concordant"], row["discordant"]) == (0, 6)
        assert row["tau_b"] == -1.0

    def test_ties_use_tau_b_correction(self, spark):
        from adventureworks_pysparkjobs_spark.operators.timeseries import (
            kendall_tau_daily,
        )

        # x strictly increasing, y = [1,1,2,2]: C=4, D=0, ty=2 ->
        # tau_b = 4 / sqrt(6 * 4)
        ev = _events(spark, {"a": [1, 2, 3, 4], "b": [1, 1, 2, 2]})
        row = kendall_tau_daily(ev).collect()[0]
        assert (row["concordant"], row["discordant"]) == (4, 0)
        assert row["tau_b"] == 4.0 / (6.0 * 4.0) ** 0.5

    def test_missing_day_counts_as_zero(self, spark):
        from adventureworks_pysparkjobs_spark.operators.timeseries import (
            kendall_tau_daily,
        )

        # type b absent on days 2-3 (zero), so its series is [2,0,0,1]
        ev = _events(spark, {"a": [1, 2, 3, 4], "b": [2, 0, 0, 1]})
        row = kendall_tau_daily(ev).collect()[0]
        assert row["n_days"] == 4 and row["n_pairs"] == 6


class TestTheilSen:
    def test_exact_linear_series(self, spark):
        from adventureworks_pysparkjobs_spark.operators.timeseries import (
            theilsen_daily_trend,
        )

        ev = _events(spark, {"a": [0, 2, 4, 6]})
        # day 1 has 0 events -> spine starts at the first OBSERVED day
        # (day 2): series [2,4,6], every pairwise slope exactly 2
        row = theilsen_daily_trend(ev).collect()[0]
        assert row["n_days"] == 3 and row["n_slopes"] == 3
        assert row["slope_per_day"] == 2.0

    def test_outlier_robustness_even_n(self, spark):
        from adventureworks_pysparkjobs_spark.operators.timeseries import (
            theilsen_daily_trend,
        )

        # observed span days 0..3 with counts [1,3,5,100]:
        # slopes: 2, 2, 33, 2, 48.5, 95 -> sorted
        # [2, 2, 2, 33, 48.5, 95]; n=6 even -> (2 + 33) / 2
        ev = _events(spark, {"a": [1, 3, 5, 100]})
        row = theilsen_daily_trend(ev).collect()[0]
        assert row["n_slopes"] == 6
        assert row["slope_per_day"] == (2.0 + 33.0) / 2.0


class TestBacklogTimeline:
    def test_hand_values(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            backlog_timeline,
        )

        opened = spark.createDataFrame(
            [("2024-01-01",), ("2024-01-01",), ("2024-01-02",)],
            "d string",
        ).select(F.to_date("d").alias("d"))
        closed = spark.createDataFrame(
            [("2024-01-02",), ("2024-01-04",)], "d string"
        ).select(F.to_date("d").alias("d"))
        out = {str(r["d"]): r for r in backlog_timeline(opened, closed).collect()}
        assert out["2024-01-01"]["backlog"] == 2
        assert out["2024-01-02"]["backlog"] == 2  # +1 open, -1 close
        assert out["2024-01-04"]["backlog"] == 1
        # one item never closes: final backlog stays positive
        assert out["2024-01-04"]["n_closed"] == 1


class TestSkyline2D:
    def test_dominance_and_tie_cosurvival(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            skyline_2d,
        )

        df = spark.createDataFrame(
            [
                (1, 10, 5),   # dominated by 3 (11 > 10, 5 = 5 strict on x)
                (2, 10, 9),   # skyline (best y at x=10, no higher x beats 9)
                (3, 11, 5),   # skyline
                (4, 11, 5),   # ties 3 on both -> co-survives
                (5, 9, 9),    # dominated by 2 (10 > 9, 9 = 9)
                (6, 12, 1),   # skyline (max x)
            ],
            "id long, x long, y long",
        )
        ids = {r["id"] for r in skyline_2d(df, "x", "y", "id").collect()}
        assert ids == {2, 3, 4, 6}


class TestAudienceOverlap:
    def test_hand_values(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            audience_overlap,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (2, "b"), (3, "b"), (4, "b"),
             (1, "a")],  # duplicate membership must not double-count
            "user_id long, event_type string",
        )
        row = audience_overlap(df).collect()[0]
        assert (row["key_a"], row["key_b"]) == ("a", "b")
        assert (row["n_a"], row["n_b"], row["n_common"]) == (3, 3, 2)
        assert row["jaccard"] == 2.0 / 4.0


class TestUnicodeSanity:
    def test_counts(self, spark):
        from adventureworks_pysparkjobs_spark.operators.text import (
            unicode_sanity,
        )

        df = spark.createDataFrame(
            [
                (1, "clean ascii", "s1"),
                (2, "bad �� here", "s1"),
                (3, "ctrl\x01\x02 and café", "s1"),
                (4, "tab\tand\nnewline ok", "s2"),
            ],
            "doc_id long, text string, source string",
        )
        out = {r["source"]: r for r in unicode_sanity(df).collect()}
        s1 = out["s1"]
        assert s1["n_docs"] == 3
        assert s1["n_replacement"] == 2
        assert s1["n_control"] == 2
        assert s1["n_non_ascii"] == 3  # 2 replacement chars + e-acute
        assert s1["docs_with_damage"] == 2
        s2 = out["s2"]
        assert s2["n_control"] == 0  # \t and \n are whitespace, not damage
        assert s2["docs_with_damage"] == 0


class TestDegreeDistribution:
    def test_power_of_two_buckets(self, spark):
        from adventureworks_pysparkjobs_spark.operators.graph import (
            degree_distribution,
        )

        # node degrees: a->3 edges, b..d->1 each, e->4
        edges = []
        for dstn in ("b", "c", "d"):
            edges += [("a", dstn, 1), (dstn, "a", 1)]
        for dstn in ("a", "b", "c", "d"):
            edges += [("e", dstn, 2), (dstn, "e", 2)]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        out = {r["bucket"]: r for r in degree_distribution(df).collect()}
        # degree(a)=4 -> bucket 3; degree(e)=4 -> bucket 3;
        # degree(b,c,d)=2 -> bucket 2
        assert out[2]["n_nodes"] == 3
        assert out[2]["min_degree"] == 2 and out[2]["max_degree"] == 2
        assert out[3]["n_nodes"] == 2
        assert abs(sum(r["node_share"] for r in out.values()) - 1.0) < 1e-15


class TestPersonalizedPagerank:
    def test_seed_locality_and_determinism(self, spark):
        from adventureworks_pysparkjobs_spark.operators.graph import (
            personalized_pagerank,
        )

        # two disconnected 2-cliques; seed in the first one only
        pairs = [(1, 2, 1), (2, 1, 1), (10, 11, 1), (11, 10, 1)]
        edges = spark.createDataFrame(pairs, "src long, dst long, w long")
        seeds = spark.createDataFrame([(1,)], "node long")
        r1 = {
            r["node"]: r["rank_scaled"]
            for r in personalized_pagerank(edges, seeds, iterations=4).collect()
        }
        # restart mass never reaches the disconnected component
        assert r1[10] == 0 and r1[11] == 0
        assert r1[1] > r1[2] > 0  # seed holds the restart mass
        r2 = {
            r["node"]: r["rank_scaled"]
            for r in personalized_pagerank(edges, seeds, iterations=4).collect()
        }
        assert r1 == r2  # integer arithmetic: bit-identical reruns


class TestDedupProvenance:
    def test_directional_matrix(self, spark):
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            dedup_provenance,
        )

        docs = spark.createDataFrame(
            [
                (1, "A"),  # keeper of group 1
                (5, "B"),  # mirror copy dropped FROM B
                (9, "B"),  # second copy dropped from B
                (2, "B"),  # keeper of group 2
                (7, "A"),  # dropped from A
                (3, "A"),  # unique: not clustered, no provenance row
            ],
            "doc_id long, source string",
        )
        clusters = spark.createDataFrame(
            [(1, 1), (5, 1), (9, 1), (2, 2), (7, 2)],
            "doc_id long, cluster_id long",
        )
        out = {
            (r["source_keep"], r["source_drop"]): r
            for r in dedup_provenance(clusters, docs).collect()
        }
        assert out[("A", "B")]["n_dropped"] == 2
        assert out[("A", "B")]["n_groups"] == 1
        assert out[("B", "A")]["n_dropped"] == 1
        assert ("A", "A") not in out  # no within-source dup here


class TestFisherDims:
    def test_guard_and_ordering_contract(self, spark):
        """Zero summed within-class variance -> fisher NULL -> ranked
        LAST (nulls last), so a finite separator outranks a degenerate
        one."""
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            fisher_dims,
        )

        rows = []
        for i in range(8):
            lab = i % 2
            v0 = 1.0 if lab == 0 else -1.0  # perfect, zero variance -> NULL
            v1 = (1.0 if lab == 0 else -1.0) + 0.25 * (i % 4)  # separating,
            # finite variance
            v2 = 0.25 * (i % 4)  # no separation
            rows.append((i, [v0, v1, v2], lab))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {r["rnk"]: r for r in fisher_dims(emb, top_k=3).collect()}
        assert out[1]["dim"] == 1  # finite separator first
        assert out[1]["fisher"] > out[2]["fisher"] or out[2]["fisher"] is None
        assert out[3]["fisher"] is None and out[3]["dim"] == 0


class TestFiscalCalendar:
    def test_445_boundaries(self, spark):
        from adventureworks_pysparkjobs_spark.functions.fiscal import (
            FISCAL_EPOCH,
            fiscal_cols,
        )

        # epoch day = FY1992 Q1 P1 W1; week 4 (days 21-27) -> P2;
        # week 9 -> P3; week 13 -> Q2 P4; week 52 -> FY1993 W1
        df = spark.createDataFrame(
            [
                ("1992-01-06",),   # epoch -> W1 P1 Q1
                ("1992-01-12",),   # still W1
                ("1992-02-03",),   # day 28 -> W5 -> P2
                ("1992-03-02",),   # day 56 -> W9 -> P3
                ("1992-04-06",),   # day 91 = W14 -> Q2 P4
                ("1993-01-04",),   # day 364 -> FY1993 W1
            ],
            "d string",
        ).select(F.to_date("d").alias("d"))
        fc = fiscal_cols(F.col("d"))
        rows = df.select(
            "d", *(fc[k].alias(k) for k in sorted(fc))
        ).orderBy("d").collect()
        assert FISCAL_EPOCH == "1992-01-06"
        got = [
            (r["fiscal_year"], r["fiscal_quarter"], r["fiscal_period"],
             r["fiscal_week"])
            for r in rows
        ]
        assert got == [
            (1992, 1, 1, 1),
            (1992, 1, 1, 1),
            (1992, 1, 2, 5),
            (1992, 1, 3, 9),
            (1992, 2, 4, 14),
            (1993, 1, 1, 1),
        ]

    def test_period_week_counts_are_445(self, spark):
        """Over one full fiscal year of days, periods must hold exactly
        4/4/5 weeks each (28/28/35 days)."""
        from adventureworks_pysparkjobs_spark.functions.fiscal import (
            fiscal_cols,
        )

        days = spark.createDataFrame(
            [(i,) for i in range(364)], "off int"
        ).select(F.date_add(F.lit("1992-01-06"), F.col("off")).alias("d"))
        fc = fiscal_cols(F.col("d"))
        per = {
            r["fiscal_period"]: r["n"]
            for r in days.select(fc["fiscal_period"].alias("fiscal_period"))
            .groupBy("fiscal_period")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert sorted(per) == list(range(1, 13))
        for p, n in per.items():
            assert n == (35 if p % 3 == 0 else 28), (p, n)


class TestBotHeuristic:
    def test_scheduler_flagged_human_not(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            bot_score_heuristic,
        )

        rows = []
        # bot: 25 events exactly 60s apart, one type
        for i in range(25):
            rows.append((1, 1_000_000 + i * 60_000_000, i, "click"))
        # human: 25 events with all-distinct gaps, three types
        t = 0
        for i in range(25):
            t += (i + 1) * 1_000_000  # strictly growing gaps
            rows.append((2, t, 100 + i, ["view", "click", "purchase"][i % 3]))
        df = spark.createDataFrame(
            rows, "user_id long, us long, event_id long, event_type string"
        ).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "event_id",
            "event_type",
        )
        out = {r["user_id"]: r for r in bot_score_heuristic(df).collect()}
        bot, human = out[1], out[2]
        assert bot["is_bot_like"] and bot["modal_share"] == 1.0
        assert bot["modal_gap_us"] == 60_000_000 and bot["n_types"] == 1
        assert not human["is_bot_like"]
        assert human["modal_share"] == 1.0 / 24.0  # all gaps distinct

    def test_min_events_floor(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            bot_score_heuristic,
        )

        rows = [(1, i * 1_000_000, i, "click") for i in range(4)]
        df = spark.createDataFrame(
            rows, "user_id long, us long, event_id long, event_type string"
        ).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "event_id",
            "event_type",
        )
        assert bot_score_heuristic(df).count() == 0  # below min_events
