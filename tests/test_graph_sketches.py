"""Behavioral tests for operators/graph.py (integer PageRank) and
operators/sketches.py (HLL distinct rollup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.graph import pagerank
from adventureworks_pysparkjobs_spark.operators.sketches import (
    sketch_distinct_rollup,
)

SCALE = 10**9


def _sym(spark, pairs):
    rows = [(a, b, w) for a, b, w in pairs] + [
        (b, a, w) for a, b, w in pairs
    ]
    return spark.createDataFrame(rows, ["src", "dst", "w"])


class TestPagerank:
    def test_symmetric_pair_splits_mass_evenly(self, spark):
        out = {
            r["node"]: r["rank_scaled"]
            for r in pagerank(_sym(spark, [(1, 2, 5)])).collect()
        }
        assert out[1] == out[2]
        # total mass stays ~scale (floor losses only)
        assert abs(sum(out.values()) - SCALE) < 100

    def test_hub_outranks_leaves(self, spark):
        # star: node 0 connected to 1..4
        out = {
            r["node"]: r["rank_scaled"]
            for r in pagerank(
                _sym(spark, [(0, k, 1) for k in range(1, 5)])
            ).collect()
        }
        assert all(out[0] > out[k] for k in range(1, 5))
        leaf = {out[k] for k in range(1, 5)}
        assert len(leaf) == 1  # symmetric leaves tie exactly

    def test_weight_bias(self, spark):
        # 1-2 heavy, 1-3 light: 2 must outrank 3
        out = {
            r["node"]: r["rank_scaled"]
            for r in pagerank(
                _sym(spark, [(1, 2, 9), (1, 3, 1)])
            ).collect()
        }
        assert out[2] > out[3]

    def test_partition_independent(self, spark):
        edges = _sym(spark, [(a, a + 1, a + 1) for a in range(1, 30)])
        r1 = {
            (r["node"], r["rank_scaled"])
            for r in pagerank(edges).collect()
        }
        r2 = {
            (r["node"], r["rank_scaled"])
            for r in pagerank(edges.repartition(13)).collect()
        }
        assert r1 == r2

    def test_empty_raises(self, spark):
        empty = spark.createDataFrame([], "src long, dst long, w long")
        with pytest.raises(ValueError, match="empty"):
            pagerank(empty)


class TestSketchRollup:
    def test_estimates_within_tolerance_and_exact_counts(self, spark):
        rows = [
            (g, d, u)
            for g in ("a", "b")
            for d in range(3)
            for u in range(d * 40, d * 40 + 60)  # overlapping day sets
        ]
        df = spark.createDataFrame(rows, ["g", "d", "u"])
        out = sketch_distinct_rollup(
            df, "u", fine_keys=["g", "d"], coarse_keys=["g"]
        ).collect()
        assert len(out) == 2
        for r in out:
            assert r["exact_distinct"] == 140  # union of 0-59,40-99,80-139
            assert r["estimate_ok"]

    def test_coarse_must_be_subset_of_fine(self, spark):
        df = spark.createDataFrame([("a", 1, 2)], ["g", "d", "u"])
        with pytest.raises(ValueError, match="not contained"):
            sketch_distinct_rollup(
                df, "u", fine_keys=["d"], coarse_keys=["g"]
            )

    def test_merge_equals_resketch(self, spark):
        """Unioning daily sketches must estimate the same as sketching
        the coarse group directly — the mergeability contract."""
        rows = [("a", d, u) for d in range(4) for u in range(d, 200, d + 1)]
        df = spark.createDataFrame(rows, ["g", "d", "u"])
        merged = sketch_distinct_rollup(
            df, "u", fine_keys=["g", "d"], coarse_keys=["g"]
        )
        direct = df.groupBy("g").agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("u"), F.lit(12))
            ).alias("est"),
            F.count_distinct("u").alias("exact"),
        )
        m = merged.collect()[0]
        d = direct.collect()[0]
        assert m["exact_distinct"] == d["exact"]
        assert m["estimate_ok"]


class TestDedupClusters:
    def test_path_graph_converges_fast(self, spark):
        """Pointer jumping: a 60-hop duplicate chain must converge in
        O(log diameter) passes, not 60 — the difference between 7 and
        60 full-shuffle iterations at 100 TB."""
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            dedup_clusters,
        )

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(60)], ["id1", "id2"]
        )
        stats: dict = {}
        out = dedup_clusters(pairs, stats=stats).collect()
        assert all(r["cluster_id"] == 0 for r in out)
        assert all(r["cluster_size"] == 61 for r in out)
        assert stats["iterations"] <= 9, stats

    def test_multiple_components_and_sizes(self, spark):
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            dedup_clusters,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
            ["id1", "id2"],
        )
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters(pairs).collect()
        }
        assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
        assert got[10] == (10, 2) and got[11] == (10, 2)
        assert all(got[k] == (20, 4) for k in (20, 21, 22, 23))


class TestTriangleCounts:
    def _counts(self, spark, edges):
        from adventureworks_pysparkjobs_spark.operators.graph import (
            triangle_counts,
        )

        df = spark.createDataFrame(edges, "a int, b int")
        return {
            r["node"]: (r["n_triangles"], r["degree"], r["clustering"])
            for r in triangle_counts(df).collect()
        }

    def test_k4_every_node_in_three_triangles(self, spark):
        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        out = self._counts(spark, k4)
        assert set(out) == {0, 1, 2, 3}
        for t, d, c in out.values():
            assert (t, d) == (3, 3)
            assert c == pytest.approx(1.0)

    def test_path_has_no_triangles(self, spark):
        out = self._counts(spark, [(0, 1), (1, 2), (2, 3)])
        assert out == {}

    def test_shared_edge_triangles(self, spark):
        # Two triangles glued on edge (0,1): 0-1-2 and 0-1-3.
        edges = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
        out = self._counts(spark, edges)
        assert out[0][:2] == (2, 3) and out[1][:2] == (2, 3)
        assert out[2][:2] == (1, 2) and out[3][:2] == (1, 2)
        # Degree-2 nodes close their single wedge: clustering 1.0.
        assert out[2][2] == pytest.approx(1.0)
        # Glue nodes: 2 closed of C(3,2)=3 wedges.
        assert out[0][2] == pytest.approx(2 / 3)

    def test_partition_independent(self, spark):
        import random

        rng = random.Random(7)
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(30), rng.randrange(30))
                    for _ in range(120)
                )
                if a != b
            }
        )
        a = self._counts(spark, edges)
        df = spark.createDataFrame(edges, "a int, b int").repartition(13)
        from adventureworks_pysparkjobs_spark.operators.graph import (
            triangle_counts,
        )

        b = {
            r["node"]: (r["n_triangles"], r["degree"], r["clustering"])
            for r in triangle_counts(df).collect()
        }
        assert a == b


class TestCountMinSketch:
    def _grid(self, spark, values, depth=4, width=64):
        from adventureworks_pysparkjobs_spark.operators.sketches import (
            cms_build,
        )

        df = spark.createDataFrame([(v,) for v in values], "k string")
        return cms_build(df, "k", depth=depth, width=width)

    def test_never_underestimates_and_exact_on_sparse(self, spark):
        from adventureworks_pysparkjobs_spark.operators.sketches import (
            cms_estimate,
        )

        # zipf-ish skew: "hot" appears 50x, tail singletons
        values = ["hot"] * 50 + [f"tail{i}" for i in range(30)]
        grid = self._grid(spark, values, depth=4, width=64)
        keys = spark.createDataFrame(
            [("hot",), ("tail3",), ("absent",)], "k string"
        )
        est = {
            r["k"]: r["cms_count"]
            for r in cms_estimate(grid, keys, "k", depth=4,
                                  width=64).collect()
        }
        assert est["hot"] >= 50
        assert est["tail3"] >= 1
        assert est["absent"] >= 0  # may collide, never negative

    def test_grid_bounded_by_depth_times_width(self, spark):
        grid = self._grid(
            spark, [f"v{i}" for i in range(500)], depth=4, width=32
        )
        assert grid.count() <= 4 * 32
        # total mass per hash row == row count
        per_row = {
            r["h"]: r["s"]
            for r in grid.groupBy("h").agg(
                F.sum("c").alias("s")
            ).collect()
        }
        assert per_row == {0: 500, 1: 500, 2: 500, 3: 500}

    def test_mergeable_cellwise(self, spark):
        a = ["x"] * 5 + ["y"] * 3
        b = ["x"] * 2 + ["z"] * 7
        whole = self._grid(spark, a + b)
        parts = (
            self._grid(spark, a)
            .unionByName(self._grid(spark, b))
            .groupBy("h", "bucket")
            .agg(F.sum("c").alias("c"))
        )
        key = lambda rows: {(r["h"], r["bucket"]): r["c"] for r in rows}
        assert key(whole.collect()) == key(parts.collect())


class TestPathToRoot:
    def _run(self, spark, rows, **kw):
        from adventureworks_pysparkjobs_spark.operators.graph import (
            path_to_root,
        )

        df = spark.createDataFrame(rows, "node long, parent long, w long")
        return {
            r["node"]: (r["root_id"], r["depth"], r["path_w"])
            for r in path_to_root(df, "node", "parent", "w", **kw).collect()
        }

    def test_small_tree_by_hand(self, spark):
        #        1(10)
        #       /    \
        #     2(20)  3(30)
        #      |
        #     4(40)
        rows = [(1, None, 10), (2, 1, 20), (3, 1, 30), (4, 2, 40)]
        out = self._run(spark, rows)
        assert out[1] == (1, 0, 10)
        assert out[2] == (1, 1, 30)
        assert out[3] == (1, 1, 40)
        assert out[4] == (1, 2, 70)

    def test_forest_two_roots(self, spark):
        rows = [(1, None, 1), (2, 1, 2), (10, None, 5), (11, 10, 7)]
        out = self._run(spark, rows)
        assert out[2] == (1, 1, 3)
        assert out[11] == (10, 1, 12)

    def test_deep_chain_converges_in_log_rounds(self, spark):
        n = 200
        rows = [(1, None, 1)] + [(i, i - 1, 1) for i in range(2, n + 1)]
        out = self._run(spark, rows, max_iterations=10)  # 2^10 >= 200
        assert out[n] == (1, n - 1, n)
        assert out[100] == (1, 99, 100)

    def test_cycle_raises(self, spark):
        rows = [(1, None, 1), (2, 3, 1), (3, 2, 1)]
        with pytest.raises(ValueError):
            self._run(spark, rows, max_iterations=4)


def test_path_to_root_dangling_parent_fails_fast(spark):
    """r5 sf1 smoke finding: a parent id with no node row can never
    settle, so the loop used to burn all 64 doubling iterations before
    a misleading 'cycle' error. Now it raises immediately and names the
    actual problem."""
    from adventureworks_pysparkjobs_spark.operators.graph import (
        path_to_root,
    )

    rows = [(1, None, 10), (2, 1, 5), (3, 99, 7)]  # 99 doesn't exist
    tree = spark.createDataFrame(rows, "node long, parent long, w long")
    with pytest.raises(ValueError, match="dangling"):
        path_to_root(tree, "node", "parent", "w")


class TestQuantileSketchCheck:
    def test_exact_ranks_and_guarantee_fixture(self, spark):
        from adventureworks_pysparkjobs_spark.operators.sketches import (
            quantile_sketch_check,
        )

        # values 1..100 in one group: p50 -> k=50 -> 50.0; p95 -> 95.0
        df = spark.createDataFrame(
            [(1, float(v), v) for v in range(1, 101)],
            "g int, value double, event_id long",
        )
        out = {
            r["pct"]: (r["n"], r["k"], r["exact_value"], r["sketch_ok"])
            for r in quantile_sketch_check(
                df, "value", ["g"], percentiles=(0.5, 0.95),
                accuracy=1000, tiebreak_col="event_id",
            ).collect()
        }
        assert out[0.5] == (100, 50, 50.0, True)
        assert out[0.95] == (100, 95, 95.0, True)

    def test_tie_heavy_group_still_exact(self, spark):
        from adventureworks_pysparkjobs_spark.operators.sketches import (
            quantile_sketch_check,
        )

        # all-equal values: every rank holds the same value; the rank
        # interval of the sketch value is the whole group
        df = spark.createDataFrame(
            [(1, 7.0, i) for i in range(10)],
            "g int, value double, event_id long",
        )
        (row,) = quantile_sketch_check(
            df, "value", ["g"], percentiles=(0.5,), tiebreak_col="event_id"
        ).collect()
        assert (row["k"], row["exact_value"], row["sketch_ok"]) == (
            5, 7.0, True,
        )
