"""Behavioral tests for the training-shard export
(sampling.assign_shards / shard_manifest / write_shards)."""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.sampling import (
    assign_shards,
    shard_manifest,
    write_shards,
)


def _docs(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )


class TestAssignShards:
    def test_contiguous_and_sized(self, spark):
        out = assign_shards(_docs(spark), "doc_id", shard_rows=8).collect()
        ids = sorted(r["row_id"] for r in out)
        assert ids == list(range(50))
        for r in out:
            assert r["shard_id"] == r["row_id"] // 8

    def test_partition_independent(self, spark):
        a = {
            (r["doc_id"], r["row_id"], r["shard_id"])
            for r in assign_shards(_docs(spark), "doc_id", 8).collect()
        }
        b = {
            (r["doc_id"], r["row_id"], r["shard_id"])
            for r in assign_shards(
                _docs(spark).repartition(11), "doc_id", 8
            ).collect()
        }
        assert a == b

    def test_salt_changes_order(self, spark):
        a = {r["doc_id"]: r["row_id"] for r in assign_shards(
            _docs(spark), "doc_id", 8, salt="epoch0").collect()}
        b = {r["doc_id"]: r["row_id"] for r in assign_shards(
            _docs(spark), "doc_id", 8, salt="epoch1").collect()}
        assert a != b  # an independent permutation per epoch


class TestShardManifest:
    def test_digest_matches_python_reference(self, spark):
        sharded = assign_shards(_docs(spark), "doc_id", 8)
        man = {
            r["shard_id"]: r
            for r in shard_manifest(sharded, "doc_id", ["text"]).collect()
        }
        rows = sorted(
            (r["row_id"], r["doc_id"], r["text"])
            for r in sharded.collect()
        )
        by_shard: dict[int, list] = {}
        for row_id, doc_id, text in rows:
            by_shard.setdefault(row_id // 8, []).append((doc_id, text))
        for sid, members in by_shard.items():
            h = "".join(
                hashlib.md5(f"{d}|{t}".encode()).hexdigest()
                for d, t in members
            )
            want = hashlib.sha256(h.encode()).hexdigest()
            assert man[sid]["digest"] == want
            assert man[sid]["n_rows"] == len(members)
            assert man[sid]["n_bytes"] == sum(len(t) for _, t in members)

    def test_detects_content_change(self, spark):
        base = assign_shards(_docs(spark), "doc_id", 8)
        tampered = base.withColumn(
            "text",
            F.when(F.col("doc_id") == 7, F.lit("TAMPERED")).otherwise(
                F.col("text")
            ),
        )
        a = {r["shard_id"]: r["digest"]
             for r in shard_manifest(base, "doc_id", ["text"]).collect()}
        b = {r["shard_id"]: r["digest"]
             for r in shard_manifest(tampered, "doc_id", ["text"]).collect()}
        changed = [s for s in a if a[s] != b[s]]
        assert len(changed) == 1  # exactly doc 7's shard


class TestWriteShards:
    def test_layout_and_roundtrip(self, spark, tmp_path):
        out = str(tmp_path / "shards")
        sharded = assign_shards(_docs(spark), "doc_id", 8)
        write_shards(sharded, out)
        dirs = sorted(glob.glob(f"{out}/shard_id=*"))
        assert len(dirs) == 7  # ceil(50 / 8)
        # one data file per shard directory
        for d in dirs:
            assert len(glob.glob(f"{d}/*.parquet")) == 1
        back = spark.read.parquet(out)
        assert back.count() == 50
        got = {
            (r["doc_id"], r["row_id"], int(r["shard_id"]))
            for r in back.collect()
        }
        want = {
            (r["doc_id"], r["row_id"], r["shard_id"])
            for r in sharded.collect()
        }
        assert got == want


class TestLabelCentroids:
    def test_known_values_and_partition_independence(self, spark):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            label_centroids,
        )

        rows = [
            ("a", [1.0, 0.0]),
            ("a", [0.0, 1.0]),
            ("b", [2.0, 2.0]),
        ]
        df = spark.createDataFrame(rows, "label string, embedding array<float>")
        got = {
            (r["label"], r["pos"]): (r["centroid"], r["n_vectors"])
            for r in label_centroids(df).collect()
        }
        assert got[("a", 0)] == (0.5, 2)
        assert got[("a", 1)] == (0.5, 2)
        assert got[("b", 0)] == (2.0, 1)
        re = {
            (r["label"], r["pos"], r["centroid"])
            for r in label_centroids(df.repartition(5)).collect()
        }
        assert re == {
            (label, pos, c) for (label, pos), (c, _) in got.items()
        }
