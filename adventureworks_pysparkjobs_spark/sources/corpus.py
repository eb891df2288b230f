"""Readers for the synthetic test corpus (TESTDATA.md).

Mirrors the reference's lake-read seam ``read_source_tables``
(reference: code_base/transform_to_bq.py:77-83) — a dict of lazily-scanned
DataFrames keyed by table name — generalized to any directory of
``{table}.parquet`` files and with per-table normalization hooks.

The only normalization today is the events table: the fixture's ``ts``
physical encoding has drifted across generator versions — TIMESTAMP(NANOS)
(Spark reads int64 nanos via ``spark.sql.legacy.parquet.nanosAsLong``),
TIMESTAMP(MICROS) not-adjusted-to-UTC (Spark reads TIMESTAMP_NTZ), and
TIMESTAMP(MICROS) adjusted-to-UTC (Spark reads TIMESTAMP). We branch on the
OBSERVED dtype and normalize every case to a session-local TimestampType
column, so downstream second/micro arithmetic, window() and watermark logic
see one type regardless of which fixture vintage is on disk. The session
timezone is pinned UTC (session.py), so NTZ->TIMESTAMP reinterpretation
preserves the instant, matching what DuckDB computes on the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TimestampType whatever the on-disk encoding.

    Works on batch and streaming frames alike (streaming/events.py routes
    through here) — all three branches are pure column expressions.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # int64 epochs: TIMESTAMP(NANOS) via nanosAsLong today, but a
        # future fixture could ship PLAIN int64 micros/millis/seconds
        # with no parquet logical type — same dtype, 1000x-off instants
        # if blindly divided (the r2 failure class). Branch on magnitude
        # PER ROW (pure expression, no data-inspection action): epochs
        # between 1973 and ~2500 occupy disjoint bands per unit —
        # seconds ~1e8..2e10, millis ~1e11..2e13, micros ~1e14..2e16,
        # nanos ~1e17..2e19. A garbage value falling BETWEEN bands
        # (no legit epoch in any unit) classifies as the next-smaller
        # unit — unit-sniffing is inherently ambiguous there, and a
        # whole-column unit vote would cost a full column scan at load.
        # Integer arithmetic throughout: ns values
        # (~1.7e18) exceed double's 2^53 exact range, so a float divide
        # would round the microsecond digit.
        ts = F.col("ts")
        micros = (
            F.when(ts >= F.lit(10**17), F.expr("ts div 1000"))  # nanos
            .when(ts >= F.lit(10**14), ts)                      # micros
            .when(ts >= F.lit(10**11), ts * F.lit(1000))        # millis
            .otherwise(ts * F.lit(1_000_000))                   # seconds
        )
        df = df.withColumn("ts", F.timestamp_micros(micros))
    elif dtype == "timestamp_ntz":
        # TIMESTAMP(MICROS) isAdjustedToUTC=false. Session tz is pinned
        # UTC, so reinterpreting wall-clock NTZ as an instant is exact;
        # TIMESTAMP_NTZ itself rejects cast-to-bigint in Spark 4, which
        # is why it cannot flow through untouched.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    # "timestamp" (MICROS adjusted-to-UTC): already the target type.
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The caller's session may not have been built by session.get_spark
        # (e.g. the external driver harness): the nanos conf is
        # runtime-settable, so pin it here — without it the read throws
        # PARQUET_TYPE_ILLEGAL on the TIMESTAMP(NANOS) column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or CORPUS_TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register each corpus table as a temp view for the SQL entry point."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
