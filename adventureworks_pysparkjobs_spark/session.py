"""SparkSession factory with scale-aware defaults.

The reference jobs configure nothing beyond an app name
(reference: code_base/db_to_parquet.py:191, code_base/transform_to_bq.py:95-97)
and therefore run with stock Spark defaults. For a 100 TB target we pin the
configs that matter at scale and that make local tests deterministic:

- AQE on (runtime re-planning, partition coalescing, skew-join splitting).
- ``spark.sql.shuffle.partitions`` sized to the local core count rather than
  the stock 200 (on a real cluster this is overridden per-deploy; AQE
  coalescing makes the initial number mostly a ceiling).
- UTC session timezone (oracle comparisons and cross-engine parity).
- Arrow enabled for any pandas interchange (vectorized UDF path).
- ``spark.sql.legacy.parquet.nanosAsLong`` — some fixture vintages store
  events.ts as TIMESTAMP(NANOS), which vanilla Spark 4 refuses to read;
  with the conf the nanos case reads as int64 and the source layer
  normalizes every observed encoding (nanos-as-long / MICROS-NTZ /
  MICROS-UTC) to TimestampType (sources/corpus.py:_normalize_events).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "adventureworks-pysparkjobs-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same code runs
    unchanged under a real cluster manager (pass ``master=None`` and submit
    with ``--master yarn``/``k8s`` — an existing session is reused as-is).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan (coalesce/skew-split) the output partitioning
        # of CACHED plans too (default false for partitioning-stability
        # compatibility): the dedup family caches its shingle frame and
        # several operators cache reused reduced frames — without this,
        # every .cache() materializes at the raw shuffle-partition count
        # and each downstream stage pays the uncoalesced task overhead
        # (measured at sf0.1: basket_pairs ran 310 tasks vs 27). At
        # cluster scale the same flag keeps cached intermediates at the
        # advisory partition size instead of the static ceiling.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif os.environ.get("SPARK_GRAFT_MASTER"):
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
