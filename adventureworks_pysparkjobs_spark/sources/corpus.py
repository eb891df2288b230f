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


# Disjoint int64-epoch magnitude bands per unit, for epochs between 1973
# and ~2600: seconds ~1e8..2e10, millis ~1e11..2e13, micros ~1e14..2e16,
# nanos ~1e17..2e19. A value outside every band is not a legitimate epoch
# in ANY unit; a column straddling two bands mixes units. Both are
# generator bugs we refuse to guess around (silently picking a unit
# produces instants up to 1000x off — the r2 failure class).
_EPOCH_BANDS = (
    ("s", 10**8, 2 * 10**10),
    ("ms", 10**11, 2 * 10**13),
    ("us", 10**14, 2 * 10**16),
    ("ns", 10**17, 2 * 10**19),
)


def _epoch_band(v: int) -> str | None:
    for name, lo, hi in _EPOCH_BANDS:
        if lo <= v < hi:
            return name
    return None


def _classify_epoch_unit(df: DataFrame) -> str:
    """Classify a bigint ``ts`` column's epoch unit ONCE per load via a
    single min/max aggregate (one columnar scan of one int64 column —
    trivially cheap next to any query over the table, and row-group
    stats keep it near footer-only). min and max bracket every value, so
    if both land in the same band the whole column is that unit; fail
    loudly on out-of-band or mixed-band columns instead of silently
    producing wrong instants."""
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    if lo is None:
        return "us"  # empty table: any unit maps zero rows identically
    blo, bhi = _epoch_band(lo), _epoch_band(hi)
    if blo is None or bhi is None:
        raise ValueError(
            f"events.ts int64 range [{lo}, {hi}] has no epoch-unit band "
            "(not a plausible s/ms/us/ns epoch between 1973 and ~2600); "
            "refusing to guess a unit — fix the fixture or extend "
            "sources/corpus.py:_EPOCH_BANDS"
        )
    if blo != bhi:
        raise ValueError(
            f"events.ts int64 column mixes epoch units: min {lo} is "
            f"{blo!r} but max {hi} is {bhi!r}; a single column must use "
            "one unit — refusing to normalize mixed-unit instants"
        )
    return blo


def _micros_expr(unit: str):
    ts = F.col("ts")
    # Integer arithmetic throughout: ns values (~1.7e18) exceed double's
    # 2^53 exact range, so a float divide would round the microsecond
    # digit.
    return {
        "ns": F.expr("ts div 1000"),
        "us": ts,
        "ms": ts * F.lit(1000),
        "s": ts * F.lit(1_000_000),
    }[unit]


def _normalize_events(df: DataFrame, probe: DataFrame | None = None) -> DataFrame:
    """Normalize ``ts`` to TimestampType whatever the on-disk encoding.

    Works on batch and streaming frames alike (streaming/events.py routes
    through here). For int64 epochs the unit is classified once per load
    from a min/max aggregate — on ``df`` itself for batch, on ``probe``
    (a batch scan of the same files, which the streaming reader already
    performs for its schema peek) for streaming frames, which cannot be
    aggregated before their sink.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # int64 epochs: TIMESTAMP(NANOS) via nanosAsLong today, but a
        # future fixture could ship PLAIN int64 micros/millis/seconds
        # with no parquet logical type — same dtype, 1000x-off instants
        # if blindly divided (the r2 failure class).
        if df.isStreaming and probe is None:
            raise ValueError(
                "streaming events frame with int64 ts needs a batch "
                "probe frame to classify the epoch unit (pass the "
                "schema-peek scan, as read_events_stream does)"
            )
        unit = _classify_epoch_unit(probe if df.isStreaming else df)
        df = df.withColumn("ts", F.timestamp_micros(_micros_expr(unit)))
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
