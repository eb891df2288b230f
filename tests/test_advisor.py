"""plans/advisor.py: each detector fires on a constructed bad plan and
stays quiet on the engine's own (good) shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.plans.advisor import advise
from adventureworks_pysparkjobs_spark.sources.corpus import load_table

from .conftest import SF_SMOKE


def codes(findings):
    return {c for c, _ in findings}


class TestDetectors:
    def test_cartesian_flagged(self, spark):
        a = spark.range(100)
        b = spark.range(100).select(F.col("id").alias("jd"))
        bad = a.crossJoin(b)
        assert "cartesian" in codes(advise(bad))

    def test_single_partition_window_flagged(self, spark):
        df = load_table(spark, SF_SMOKE, "orders")
        from pyspark.sql import Window

        bad = df.withColumn(
            "rid", F.row_number().over(Window.orderBy("o_orderkey"))
        )
        assert "single-partition" in codes(advise(bad))

    def test_global_agg_not_flagged(self, spark):
        """A global SUM also plans Exchange SinglePartition — but over
        partial aggregates (one row per partition), which is fine."""
        df = load_table(spark, SF_SMOKE, "orders")
        good = df.agg(F.count("*").alias("n"))
        assert "single-partition" not in codes(advise(good))

    def test_python_udf_flagged_pandas_not(self, spark):
        from pyspark.sql.functions import pandas_udf, udf

        df = spark.range(100)
        slow = df.select(udf(lambda x: x + 1, "long")("id").alias("y"))
        assert "python-udf" in codes(advise(slow))

        @pandas_udf("long")
        def fast(s):
            return s + 1

        ok = df.select(fast("id").alias("y"))
        assert "python-udf" not in codes(advise(ok))

    def test_pushed_filter_not_flagged(self, spark):
        df = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderkey") > 100
        )
        assert "unpushed-filter" not in codes(advise(df))


class TestCatalogIsAdvisorClean:
    def test_flagship_queries_clean(self, spark):
        """The engine's own headline shapes produce no findings (the
        declared small-side crosses live in CROSS_OK entries, which
        this sample avoids)."""
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        for name in (
            "q5_nation_revenue",
            "fact_daily_part_agg",
            "top3_parts_per_brand",
            "doc_minhash_lsh_pairs",
            "doc_chunks",
            "events_sessionize",
        ):
            findings = advise(CATALOG[name].builder(spark, SF_SMOKE))
            assert not findings, (name, findings)


class TestUnpushedFilter:
    def test_unpushable_predicate_flagged(self, spark):
        df = load_table(spark, SF_SMOKE, "orders").filter(
            F.rand(seed=1) < 0.5  # no column-derived pushable conjunct
        )
        assert "unpushed-filter" in codes(advise(df))


class TestCatalogViews:
    def test_views_compose_in_sql(self, spark):
        from adventureworks_pysparkjobs_spark.sql import (
            register_catalog_views,
        )

        created = register_catalog_views(
            spark, SF_SMOKE, names=["doc_exact_dedup", "doc_text_profile"]
        )
        assert created == ["op_doc_exact_dedup", "op_doc_text_profile"]
        out = spark.sql(
            """
            SELECT count(*) AS n
            FROM op_doc_exact_dedup d
            JOIN op_doc_text_profile p ON p.doc_id = d.keep_id
            """
        ).collect()[0]["n"]
        assert out > 0

    def test_registration_is_lazy(self, spark):
        """Registering views must not run the operators (a catalog-wide
        registration at 100 TB cannot afford eager materialization) —
        proven by registering an entry over a BOGUS sf_dir: only a
        read may fail."""
        from adventureworks_pysparkjobs_spark.sql import (
            register_catalog_views,
        )

        import pytest as _pytest
        from pyspark.errors import AnalysisException

        with _pytest.raises(AnalysisException):
            # builder itself touches the path for schema -> still cheap
            # metadata-only; a missing dir raises at plan time, never
            # scanning data. Registering a VALID dir then is lazy:
            register_catalog_views(
                spark, "/nonexistent_sf_dir", names=["doc_exact_dedup"]
            )


class TestForcedBroadcastDetector:
    def test_forced_broadcast_of_fact_flagged(self, spark):
        from adventureworks_pysparkjobs_spark.plans.advisor import advise

        li = load_table(spark, SF_SMOKE, "lineitem")
        od = load_table(spark, SF_SMOKE, "orders")
        bad = od.join(F.broadcast(li), od.o_orderkey == li.l_orderkey)
        assert "forced-broadcast" in codes(advise(bad))

    def test_bounded_dim_and_reduced_sides_not_flagged(self, spark):
        from adventureworks_pysparkjobs_spark.plans.advisor import advise

        li = load_table(spark, SF_SMOKE, "lineitem")
        na = load_table(spark, SF_SMOKE, "nation")
        cu = load_table(spark, SF_SMOKE, "customer")
        dim = cu.join(na, cu.c_nationkey == na.n_nationkey)
        ok = li.join(
            F.broadcast(na.filter(F.col("n_name") == "NATION_1")),
            li.l_suppkey == na.n_nationkey,
        ).crossJoin(F.broadcast(dim.agg(F.count("*").alias("n"))))
        assert "forced-broadcast" not in codes(advise(ok))

    def test_flagship_catalog_still_advisor_clean(self, spark):
        """The detector must not fire on any windowed catalog entry —
        the r5 hint cleanup made the engine's own plans hint-safe."""
        from adventureworks_pysparkjobs_spark.plans.advisor import advise
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        for name in ("q5_nation_revenue", "top3_parts_per_brand",
                     "q3_unshipped_revenue", "fact_order_line"):
            df = CATALOG[name].builder(spark, SF_SMOKE)
            assert "forced-broadcast" not in codes(advise(df)), name
