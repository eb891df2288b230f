"""Lake maintenance operators: compaction, clustered writes, incremental
partition refresh (sinks/maintenance.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.sinks.maintenance import (
    clustered_write,
    compact_lake_table,
    directory_bytes,
    refresh_partitions,
)
from adventureworks_pysparkjobs_spark.sources.corpus import load_table

from .conftest import SF_SMOKE


def _content_hash(df):
    """Order-insensitive content digest: sum of per-row xxhash64 over all
    columns (cast to string for type stability)."""
    cols = [F.col(c).cast("string") for c in df.columns]
    return df.agg(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)"))
    ).collect()[0][0]


def _data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def test_compact_reduces_files_preserves_content(spark, tmp_path):
    path = str(tmp_path / "li")
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.repartition(16).write.parquet(path)
    assert len(_data_files(path)) == 16
    before = _content_hash(spark.read.parquet(path))
    total = directory_bytes(path)
    assert total > 0

    n = compact_lake_table(spark, path, target_file_bytes=total * 2)
    assert n == 1
    assert len(_data_files(path)) == 1
    assert _content_hash(spark.read.parquet(path)) == before


def test_clustered_write_disjoint_file_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "docs")
    docs = load_table(spark, SF_SMOKE, "documents")
    clustered_write(docs, path, cluster_by=["doc_id"], n_files=4)
    files = _data_files(path)
    assert len(files) == 4

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("doc_id")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi < lo2, f"file key ranges overlap: {ranges}"

    # every row still present
    assert (
        _content_hash(spark.read.parquet(path))
        == _content_hash(docs)
    )


def test_refresh_partitions_touches_only_changed(spark, tmp_path):
    path = str(tmp_path / "ev")
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    refresh_partitions(ev, path, partition_by="event_type")

    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    assert len(types) >= 2
    changed, kept = types[0], types[1]
    untouched_before = {
        f: os.stat(f).st_mtime_ns
        for f in _data_files(path)
        if f"event_type={changed}" not in f
    }

    delta = ev.filter(F.col("event_type") == changed).withColumn(
        "value", F.col("value") * 2
    )
    refresh_partitions(delta, path, partition_by="event_type")

    untouched_after = {
        f: os.stat(f).st_mtime_ns
        for f in _data_files(path)
        if f"event_type={changed}" not in f
    }
    assert untouched_after == untouched_before

    got = spark.read.parquet(path)
    assert got.count() == ev.count()
    want_changed = _content_hash(
        delta.select("event_id", "user_id", "value")
    )
    got_changed = _content_hash(
        got.filter(F.col("event_type") == changed).select(
            "event_id", "user_id", "value"
        )
    )
    assert got_changed == want_changed
    want_kept = _content_hash(
        ev.filter(F.col("event_type") == kept).select("event_id", "value")
    )
    got_kept = _content_hash(
        got.filter(F.col("event_type") == kept).select("event_id", "value")
    )
    assert got_kept == want_kept


def test_ingest_increment_merges_and_touches_only_changed(spark, tmp_path):
    """End-to-end incremental ingest with an injected reader: the dim is
    upserted (latest watermark per PK wins), the date-partitioned fact
    rewrites only its touched partition, and untouched partition files
    stay byte-identical on disk."""
    import datetime as dt

    from adventureworks_pysparkjobs_spark.jobs.ingest import ingest_increment
    from adventureworks_pysparkjobs_spark.sinks.parquet import write_lake_table

    jan1, jan2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    feb = dt.datetime(2024, 2, 1)
    dim_schema = "id int, name string, modifieddate timestamp"
    fact_schema = "fid int, orderdate timestamp, amt double, modifieddate timestamp"

    dim0 = spark.createDataFrame([(1, "a", jan1), (2, "b", jan1)], dim_schema)
    write_lake_table(dim0, str(tmp_path), "s", "dim")
    f0 = spark.createDataFrame(
        [(10, jan1, 5.0, jan1), (11, jan2, 6.0, jan2)], fact_schema
    )
    write_lake_table(
        f0.withColumn("ingest_date", F.to_date("orderdate")),
        str(tmp_path),
        "s",
        "fact",
        partition_by="ingest_date",
    )
    day1_before = {
        f: os.stat(f).st_mtime_ns
        for f in _data_files(str(tmp_path))
        if "fact" in f and "ingest_date=2024-01-01" in f
    }
    assert day1_before

    inc_dim = spark.createDataFrame([(2, "b2", feb), (3, "c", feb)], dim_schema)
    inc_fact = spark.createDataFrame(
        [(11, jan2, 7.0, feb), (12, jan2, 8.0, feb)], fact_schema
    )
    counts = ingest_increment(
        spark,
        None,
        str(tmp_path),
        tables=[("s", "dim"), ("s", "fact")],
        schemas={},
        partition_keys={"s.dim": "id", "s.fact": "fid"},
        date_partitioned={"s.fact": "orderdate"},
        reader=lambda full, schema: {"s.dim": inc_dim, "s.fact": inc_fact}[full],
    )
    assert counts == {"s.dim": 2, "s.fact": 2}

    dim = {
        r["id"]: r["name"]
        for r in spark.read.parquet(f"{tmp_path}/parquet/s/dim").collect()
    }
    assert dim == {1: "a", 2: "b2", 3: "c"}

    fact = {
        r["fid"]: r["amt"]
        for r in spark.read.parquet(f"{tmp_path}/parquet/s/fact").collect()
    }
    assert fact == {10: 5.0, 11: 7.0, 12: 8.0}

    day1_after = {
        f: os.stat(f).st_mtime_ns
        for f in _data_files(str(tmp_path))
        if "fact" in f and "ingest_date=2024-01-01" in f
    }
    assert day1_after == day1_before

    # idempotence: re-landing the same increment changes nothing
    ingest_increment(
        spark,
        None,
        str(tmp_path),
        tables=[("s", "dim"), ("s", "fact")],
        schemas={},
        partition_keys={"s.dim": "id", "s.fact": "fid"},
        date_partitioned={"s.fact": "orderdate"},
        reader=lambda full, schema: {"s.dim": inc_dim, "s.fact": inc_fact}[full],
    )
    assert {
        r["fid"]: r["amt"]
        for r in spark.read.parquet(f"{tmp_path}/parquet/s/fact").collect()
    } == {10: 5.0, 11: 7.0, 12: 8.0}


def test_zorder_write_prunes_on_every_dimension(spark, tmp_path):
    """Morton-curve clustering: footer min/max stats prune files for
    predicates on EITHER z-ordered column — single-key clustering leaves
    the second column spread across every file (no pruning at all)."""
    import pyarrow.parquet as pq

    from adventureworks_pysparkjobs_spark.sinks.maintenance import (
        zorder_write,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "n_chars", "source"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "lin")
    zorder_write(docs, zpath, ["doc_id", "n_chars"], n_files=8)
    clustered_write(docs, lpath, cluster_by=["doc_id"], n_files=8)

    def ranges(path, col):
        out = []
        for f in _data_files(path):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            out.append((lo, hi))
        return out

    def touched(path, col, lo, hi):
        return sum(1 for a, b in ranges(path, col) if not (b < lo or a >= hi))

    n_docs = docs.count()
    lo_c, hi_c = docs.agg(F.min("n_chars"), F.max("n_chars")).first()
    mid, quarter = lo_c + (hi_c - lo_c) // 2, (hi_c - lo_c) // 4

    # a box on the SECOND dimension: z-order prunes, linear cannot
    z_touch = touched(zpath, "n_chars", mid, mid + quarter)
    l_touch = touched(lpath, "n_chars", mid, mid + quarter)
    assert l_touch == 8  # n_chars is spread across every doc_id file
    assert z_touch < l_touch

    # the first dimension still prunes under z-order too
    assert touched(zpath, "doc_id", 0, n_docs // 4) < 8

    # layout change only: every row survives byte-identically
    assert _content_hash(spark.read.parquet(zpath)) == _content_hash(docs)


class TestVersionedTable:
    def test_publish_read_time_travel_rollback_vacuum(self, spark, tmp_path):
        from adventureworks_pysparkjobs_spark.sinks.versioned import (
            current_version,
            publish_version,
            read_latest,
            read_version,
            rollback,
            vacuum_versions,
        )

        path = str(tmp_path / "tbl")
        v1 = publish_version(spark.range(10), path)
        v2 = publish_version(spark.range(20), path)
        assert (v1, v2) == (1, 2)
        assert current_version(path) == 2
        assert read_latest(spark, path).count() == 20
        assert read_version(spark, path, 1).count() == 10  # time travel

        rollback(path, 1)
        assert read_latest(spark, path).count() == 10

        publish_version(spark.range(30), path)  # v3; pointer -> 3
        assert read_latest(spark, path).count() == 30
        removed = vacuum_versions(path, keep=1)
        assert removed == [1, 2]
        assert read_latest(spark, path).count() == 30

    def test_crash_before_commit_is_invisible(self, spark, tmp_path):
        """An orphan v=N directory without a pointer swap (crash
        between write and commit) must not affect readers."""
        import os

        from adventureworks_pysparkjobs_spark.sinks.versioned import (
            publish_version,
            read_latest,
        )

        path = str(tmp_path / "tbl")
        publish_version(spark.range(5), path)
        # simulate a crashed publish: data dir exists, pointer not moved
        spark.range(99).write.parquet(os.path.join(path, "v=2"))
        assert read_latest(spark, path).count() == 5
        # the NEXT publish must not collide with the orphan
        v = publish_version(spark.range(7), path)
        assert v == 3
        assert read_latest(spark, path).count() == 7

    def test_read_before_any_publish_raises(self, spark, tmp_path):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.sinks.versioned import (
            read_latest,
        )

        with _pytest.raises(FileNotFoundError):
            read_latest(spark, str(tmp_path / "none"))

    def test_rollback_to_missing_version_raises(self, spark, tmp_path):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.sinks.versioned import (
            publish_version,
            rollback,
        )

        path = str(tmp_path / "tbl")
        publish_version(spark.range(3), path)
        with _pytest.raises(ValueError, match="not present"):
            rollback(path, 9)


def test_warehouse_publish_versioned(spark, tmp_path):
    """write_warehouse_table(fmt='versioned'): schema-enforced atomic
    publish; a second publish supersedes, the first stays readable."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from adventureworks_pysparkjobs_spark.sinks.parquet import (
        write_warehouse_table,
    )
    from adventureworks_pysparkjobs_spark.sinks.versioned import (
        read_latest,
        read_version,
    )

    schema = StructType([StructField("id", LongType(), False)])
    base = str(tmp_path)
    df1 = spark.range(4).select(F.col("id"))
    df2 = spark.range(9).select(F.col("id"))
    write_warehouse_table(df1, base, "dim_x", schema, fmt="versioned")
    write_warehouse_table(df2, base, "dim_x", schema, fmt="versioned")
    assert read_latest(spark, f"{base}/dim_x").count() == 9
    assert read_version(spark, f"{base}/dim_x", 1).count() == 4
