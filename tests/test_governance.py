"""Behavioral tests for quality.audit_constraints,
relational.merge_aggregate and relational.salted_count_distinct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.quality import (
    ForeignKey,
    audit_constraints,
)
from adventureworks_pysparkjobs_spark.operators.relational import (
    merge_aggregate,
    salted_count_distinct,
)
from adventureworks_pysparkjobs_spark.plans.inspect import physical_plan


class TestAuditConstraints:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, 10, 5.0),
                (2, 20, -1.0),   # range violation
                (2, None, 3.0),  # dupe id + null fk
                (3, 99, 200.0),  # orphan fk + range violation (hi)
            ],
            ["id", "cust", "amt"],
        )

    def test_all_rule_kinds(self, spark):
        ref = spark.createDataFrame([(10,), (20,)], ["c_id"])
        out = {
            r["rule"]: r["violations"]
            for r in audit_constraints(
                self._df(spark),
                unique=[("id",)],
                not_null=["cust"],
                ranges={"amt": (0, 100)},
                predicates={"amt_nonzero": F.col("amt") != 0},
                foreign_keys=[
                    ForeignKey("cust_fk", ("cust",), ref, ("c_id",))
                ],
            ).collect()
        }
        assert out["unique:id"] == 2          # both rows of the dupe pair
        assert out["not_null:cust"] == 1
        assert out["range:amt"] == 2          # -1 below, 200 above
        assert out["predicate:amt_nonzero"] == 0
        assert out["fk:cust_fk"] == 1         # 99 orphaned; NULL exempt

    def test_clean_table_reports_zeroes(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["id", "v"])
        out = audit_constraints(
            df, unique=[("id",)], not_null=["v"], ranges={"v": (0, 10)}
        ).collect()
        assert all(r["violations"] == 0 for r in out)

    def test_no_rules_raises(self, spark):
        df = spark.createDataFrame([(1,)], ["id"])
        with pytest.raises(ValueError, match="no rules"):
            audit_constraints(df)


class TestMergeAggregate:
    def test_merge_equals_rebuild(self, spark):
        rows = [(k % 5, d % 3, float(k)) for k in range(200) for d in (0, 1)]
        df = spark.createDataFrame(rows, ["k", "d", "v"]).select(
            "k", "d", F.col("v").cast("decimal(12,2)").alias("v")
        )
        h1 = df.filter(F.col("k") < 3)
        h2 = df.filter(F.col("k") >= 3)

        def agg(f):
            return f.groupBy("k", "d").agg(F.sum("v").alias("v"))

        merged = merge_aggregate(agg(h1), agg(h2), ["k", "d"], ["v"])
        rebuilt = agg(df)
        m = {(r["k"], r["d"]): r["v"] for r in merged.collect()}
        b = {(r["k"], r["d"]): r["v"] for r in rebuilt.collect()}
        assert m == b

    def test_new_and_untouched_groups(self, spark):
        snap = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
        delta = spark.createDataFrame([(2, 5), (3, 7)], ["k", "v"])
        out = {
            r["k"]: r["v"]
            for r in merge_aggregate(snap, delta, ["k"], ["v"]).collect()
        }
        assert out == {1: 10, 2: 25, 3: 7}


class TestSaltedCountDistinct:
    def test_matches_builtin(self, spark):
        rows = [(k % 3, v % 37) for k in range(50) for v in range(k)]
        df = spark.createDataFrame(rows, ["g", "v"])
        got = {
            r["g"]: r["n_distinct"]
            for r in salted_count_distinct(df, ["g"], "v", 8).collect()
        }
        want = {
            r["g"]: r["n"]
            for r in df.groupBy("g")
            .agg(F.count_distinct("v").alias("n"))
            .collect()
        }
        assert got == want

    def test_no_expand_no_value_keyed_exchange(self, spark):
        """The whole point: the plan must shuffle on (keys, value-hash
        bucket) — bounded per key — and both aggs partial-aggregate.
        Two HashAggregate pairs, no Expand (count_distinct rewrite)."""
        df = spark.range(1000).select(
            (F.col("id") % 4).alias("g"), (F.col("id") % 97).alias("v")
        )
        plan = physical_plan(salted_count_distinct(df, ["g"], "v", 16))
        assert "Expand" not in plan
        # three exchanges: (g,bucket,v) dedup, (g,bucket) count,
        # (g) bucket-count sum — the last carries <= buckets rows/key,
        # and no exchange before it is keyed on g alone, so no reducer
        # ever holds one key's whole distinct set
        ex = [
            ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
        ]
        assert len(ex) == 3
        # plan prints top-down: ex[0] is the final g-keyed sum; the two
        # upstream exchanges must both be salted with the value bucket
        assert all("_groupingexpression" in ln for ln in ex[1:])
        assert "_groupingexpression" not in ex[0]


class TestSnapshotCdc:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", None)],
            "k long, s string, v int",
        )
        new = spark.createDataFrame(
            [(1, "a", 10),      # unchanged
             (2, "B", 20),      # update s
             (4, "d", 40),      # update v (NULL -> 40, null-safe)
             (5, "e", 50)],     # insert; 3 deleted
            "k long, s string, v int",
        )
        return old, new

    def test_change_typing(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            snapshot_cdc,
        )

        old, new = self._frames(spark)
        got = {
            r["k"]: (r["change_type"], r["changed_cols"])
            for r in snapshot_cdc(old, new, ["k"]).collect()
        }
        assert 1 not in got  # unchanged dropped by default
        assert got[2] == ("update", ["s"])
        assert got[3] == ("delete", [])
        assert got[4] == ("update", ["v"])
        assert got[5] == ("insert", [])

    def test_include_unchanged(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            snapshot_cdc,
        )

        old, new = self._frames(spark)
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_cdc(
                old, new, ["k"], include_unchanged=True
            ).collect()
        }
        assert got[1] == "unchanged"

    def test_roundtrip_apply_changes_reconstructs_new(self, spark):
        """apply_changes(old, snapshot_cdc(old, new, values)) == new —
        the inverse-of-diff property that makes the stream a complete
        replication primitive."""
        import random

        from adventureworks_pysparkjobs_spark.operators.relational import (
            apply_changes,
            snapshot_cdc,
        )

        rng = random.Random(42)
        old_rows = [
            (k, rng.choice("abc"), rng.randint(0, 5)) for k in range(200)
        ]
        new_rows = [
            (k, rng.choice("abc"), rng.randint(0, 5))
            for k in range(200)
            if rng.random() > 0.15  # deletes
        ] + [(k, "n", 1) for k in range(300, 320)]  # inserts
        old = spark.createDataFrame(old_rows, "k long, s string, v long")
        new = spark.createDataFrame(new_rows, "k long, s string, v long")
        cdc = snapshot_cdc(old, new, ["k"], include_values=True)
        rebuilt = apply_changes(old, cdc, ["k"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, new.collect())
        )

    def test_apply_changes_requires_values(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            apply_changes,
            snapshot_cdc,
        )

        old, new = self._frames(spark)
        cdc = snapshot_cdc(old, new, ["k"])  # no values
        with pytest.raises(ValueError, match="values-carrying"):
            apply_changes(old, cdc, ["k"])


class TestPointInTimeJoin:
    def test_version_selection(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            point_in_time_join,
        )

        hist = spark.createDataFrame(
            [
                (1, "v1", 10, 20),
                (1, "v2", 20, None),
                (2, "w1", 5, None),
            ],
            "k long, val string, valid_from long, valid_to long",
        )
        facts = spark.createDataFrame(
            [(1, 5), (1, 10), (1, 19), (1, 20), (1, 99), (2, 4), (3, 50)],
            "k long, ts long",
        )
        got = {
            (r["k"], r["ts"]): r["val"]
            for r in point_in_time_join(facts, hist, "k", "ts").collect()
        }
        assert got[(1, 5)] is None      # before first version
        assert got[(1, 10)] == "v1"     # inclusive valid_from
        assert got[(1, 19)] == "v1"
        assert got[(1, 20)] == "v2"     # exclusive valid_to
        assert got[(1, 99)] == "v2"     # open current version
        assert got[(2, 4)] is None
        assert got[(3, 50)] is None     # unknown key kept (left join)

    def test_exactly_one_match_per_fact(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            point_in_time_join,
        )

        hist = spark.createDataFrame(
            [(1, "a", 0, 10), (1, "b", 10, None)],
            "k long, val string, valid_from long, valid_to long",
        )
        facts = spark.createDataFrame(
            [(1, t) for t in range(0, 30)], "k long, ts long"
        )
        out = point_in_time_join(facts, hist, "k", "ts")
        assert out.count() == 30  # no fan-out from interval overlap


class TestHistogram:
    def test_bucket_edges_and_overflow(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            histogram,
        )

        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (9.99,), (10.0,), (99.99,), (100.0,),
             (250.0,), (None,)],
            "x double",
        )
        got = {
            r["bucket"]: (r["n"], r["bucket_lo"], r["bucket_hi"])
            for r in histogram(df, "x", 0.0, 100.0, 10).collect()
        }
        assert got[-1][0] == 1                # underflow
        assert got[0] == (2, 0.0, 10.0)       # 0.0 and 9.99
        assert got[1][0] == 1                 # 10.0 lands in bucket 1
        assert got[9] == (1, 90.0, 100.0)     # 99.99 in last real bucket
        assert got[10][0] == 2                # 100.0 and 250.0 overflow
        assert sum(n for n, *_ in got.values()) == 7  # NULL excluded


class TestFuzzyMatchPairs:
    def test_blocked_matching(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            fuzzy_match_pairs,
        )

        df = spark.createDataFrame(
            [
                (1, "Acme Corp 01"),
                (2, "Acme Corp 02"),   # distance 1 to id 1, same block
                (3, "Acme Corp 99"),   # distance 2 to both -> excluded
                (4, "Bcme Corp 01"),   # early edit: other block (by design)
                (5, "Acme Inc 0123"),  # different length -> other block
            ],
            ["id", "name"],
        )
        got = {
            (r["id1"], r["id2"]): r["distance"]
            for r in fuzzy_match_pairs(df, "id", "name").collect()
        }
        assert got == {(1, 2): 1}

    def test_plan_is_equi_join(self, spark):
        from adventureworks_pysparkjobs_spark.operators.relational import (
            fuzzy_match_pairs,
        )
        from adventureworks_pysparkjobs_spark.plans.inspect import (
            physical_plan,
        )
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        from .conftest import SF_SMOKE

        cust = load_table(spark, SF_SMOKE, "customer")
        plan = physical_plan(fuzzy_match_pairs(cust, "c_custkey", "c_name"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestCdcRoundtripProperty:
    def test_roundtrip_over_generated_snapshots(self, spark):
        """Hypothesis-style exhaustive small-space sweep: for every
        combination of per-key fates (absent/same/changed in new), the
        cdc → apply round trip reconstructs the new snapshot. Runs as
        one batch (a @given-per-Spark-job loop would take minutes)."""
        import itertools

        from adventureworks_pysparkjobs_spark.operators.relational import (
            apply_changes,
            snapshot_cdc,
        )

        # keys 0..63: bits encode (in_old, in_new, changed)
        old_rows, new_rows = [], []
        for k in range(64):
            in_old, in_new, changed = k & 1, k & 2, k & 4
            if in_old:
                old_rows.append((k, f"v{k}", k % 7))
            if in_new:
                new_rows.append(
                    (k, f"v{k}" + ("'" if changed else ""), k % 7)
                )
        old = spark.createDataFrame(old_rows, "k long, s string, v long")
        new = spark.createDataFrame(new_rows, "k long, s string, v long")
        cdc = snapshot_cdc(old, new, ["k"], include_values=True)
        rebuilt = apply_changes(old, cdc, ["k"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, new.collect())
        )
        # change-typing sanity over the same space
        types = {
            r["k"]: r["change_type"]
            for r in snapshot_cdc(old, new, ["k"]).collect()
        }
        for k in range(64):
            in_old, in_new, changed = bool(k & 1), bool(k & 2), bool(k & 4)
            if not in_old and in_new:
                assert types[k] == "insert"
            elif in_old and not in_new:
                assert types[k] == "delete"
            elif in_old and in_new and changed:
                assert types[k] == "update"
            else:
                assert k not in types  # unchanged or absent everywhere


class TestKAnonymity:
    QI = None  # built per test; dict preserves insertion order

    def _qi(self):
        return {
            "seg": F.col("seg"),
            "band": F.floor(F.col("val") / F.lit(10.0)).cast("long"),
        }

    def _df(self, spark):
        rows = (
            [("a", float(v)) for v in (1, 2, 3, 4, 5)]       # class size 5
            + [("a", 15.0), ("a", 16.0)]                      # size 2
            + [("b", 7.0)]                                    # size 1
        )
        return spark.createDataFrame(rows, "seg string, val double")

    def test_audit_classes_and_verdicts(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            k_anonymity_audit,
        )

        out = {
            (r["seg"], r["band"]): (r["class_size"], r["is_k_anonymous"])
            for r in k_anonymity_audit(
                self._df(spark), self._qi(), k=5
            ).collect()
        }
        assert out[("a", 0)] == (5, True)
        assert out[("a", 1)] == (2, False)
        assert out[("b", 0)] == (1, False)

    def test_anonymize_suppresses_small_classes(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            k_anonymize,
        )

        kept = k_anonymize(self._df(spark), self._qi(), k=5)
        vals = sorted(r["val"] for r in kept.collect())
        assert vals == [1.0, 2.0, 3.0, 4.0, 5.0]
        # Generalized QI columns are appended for release projection.
        assert {"seg", "band", "val"} <= set(kept.columns)

    def test_k_below_two_rejected(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            k_anonymity_audit,
        )

        with pytest.raises(ValueError):
            k_anonymity_audit(self._df(spark), self._qi(), k=1)

    def test_null_keyed_class_agrees_with_audit(self, spark):
        # ADVICE r4: the audit counts a NULL-valued generalized key as a
        # normal equivalence class; anonymize must keep it when it
        # passes k (null-safe join), not silently suppress it.
        from adventureworks_pysparkjobs_spark.operators.quality import (
            k_anonymity_audit,
            k_anonymize,
        )

        rows = [(None, float(v)) for v in range(5)] + [("b", 99.0)]
        df = spark.createDataFrame(rows, "seg string, val double")
        qi = self._qi()
        audit = {
            (r["seg"], r["band"]): r["is_k_anonymous"]
            for r in k_anonymity_audit(df, qi, k=5).collect()
        }
        assert audit[(None, 0)] is True  # 5-member NULL-keyed class
        kept = sorted(
            r["val"] for r in k_anonymize(df, qi, k=5).collect()
        )
        assert kept == [0.0, 1.0, 2.0, 3.0, 4.0]


class TestBenfordAudit:
    def _audit(self, spark, values, tol=0.02):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            benford_audit,
        )

        df = spark.createDataFrame([(float(v),) for v in values], "x double")
        return {r["digit"]: r for r in benford_audit(df, "x", tol).collect()}

    def test_benford_like_data_within_tol(self, spark):
        # geometric growth 1.05^i cycles first digits Benford-like
        out = self._audit(spark, [1.05**i for i in range(400)], tol=0.03)
        assert all(out[d]["within_tol"] for d in range(1, 10))
        assert sum(out[d]["n_obs"] for d in range(1, 10)) == 400

    def test_uniform_data_flagged(self, spark):
        # uniform 100..999: every digit ~1/9=0.111 -> digit 1 (expected
        # 0.301) must be flagged
        out = self._audit(spark, range(100, 1000))
        assert not out[1]["within_tol"]
        assert out[1]["n_obs"] == 100

    def test_nonpositive_and_null_excluded(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            benford_audit,
        )

        df = spark.createDataFrame(
            [(1.0,), (-5.0,), (0.0,), (None,), (2.0,)], "x double"
        )
        out = {r["digit"]: r["n_obs"]
               for r in benford_audit(df, "x").collect()}
        assert out[1] == 1 and out[2] == 1
        assert sum(out.values()) == 2

    def test_sub_one_and_huge_values_counted_by_significant_digit(
        self, spark
    ):
        # ADVICE r4: 0.0042 is digit 4 (not '0'), 9.3e17 is digit 9
        # (not a decimal-overflow NULL); neither may vanish from the 9
        # digit rows while still inflating n_total.
        out = self._audit(
            spark, [0.0042, 0.5, 9.3e17, 123.0, 1e-30], tol=0.5
        )
        n = {d: out[d]["n_obs"] for d in range(1, 10)}
        assert n[4] == 1 and n[5] == 1 and n[9] == 1 and n[1] == 2
        assert sum(n.values()) == 5
        # fractions must be over the SAME total the digits sum to
        assert abs(sum(out[d]["frac_obs"] for d in range(1, 10)) - 1.0) < 1e-12


class TestLDiversity:
    def _df(self, spark):
        rows = (
            [("a", "s1"), ("a", "s2"), ("a", "s3")]    # 3 distinct: ok
            + [("b", "s1"), ("b", "s1"), ("b", "s2")]  # 2 distinct: fail
            + [("c", None), ("c", None)]               # all-null: 0
        )
        return spark.createDataFrame(rows, "seg string, sens string")

    def test_distinct_counts_and_verdicts(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            l_diversity_audit,
        )

        out = {
            r["seg"]: (r["class_size"], r["l_distinct"], r["is_l_diverse"])
            for r in l_diversity_audit(
                self._df(spark), {"seg": F.col("seg")}, "sens", l=3
            ).collect()
        }
        assert out["a"] == (3, 3, True)
        assert out["b"] == (3, 2, False)
        # NULL sensitive values are not attacker-learnable values
        assert out["c"] == (2, 0, False)

    def test_l_below_two_rejected(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            l_diversity_audit,
        )

        with pytest.raises(ValueError):
            l_diversity_audit(
                self._df(spark), {"seg": F.col("seg")}, "sens", l=1
            )


class TestJoinCardinalityAudit:
    def test_predicts_fanout_and_unmatched(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            join_cardinality_audit,
        )

        left = spark.createDataFrame(
            [(1,), (1,), (2,), (3,)], "k long"
        )
        right = spark.createDataFrame(
            [(1,), (1,), (1,), (4,), (4,)], "rk long"
        )
        (row,) = join_cardinality_audit(
            left, right, ["k"], ["rk"]
        ).collect()
        # key 1: 2*3=6 joined rows; keys 2,3 left-only (2 rows); key 4
        # right-only (2 rows)
        assert row["n_left"] == 4 and row["n_right"] == 5
        assert row["n_join_predicted"] == 6
        assert row["n_join_predicted_exact"] == 6.0
        assert row["max_key_fanout"] == 6
        assert row["rows_left_unmatched"] == 2
        assert row["rows_right_unmatched"] == 2
        assert row["n_keys_matched"] == 1
        # the prediction equals the executed join's count
        assert left.join(right, left.k == right.rk).count() == 6
