"""Ingestion job: OLTP database -> Parquet lake.

Portable re-build of the reference ingest (code_base/db_to_parquet.py:169-202)
with its GCP couplings behind seams and its scale bottleneck fixed:

- credentials come from a caller-supplied resolver (env vars by default)
  instead of hard-wired Secret Manager calls (db_to_parquet.py:147-152,
  175-181) — the same three secrets (user, password, dbname), any backend;
- each table reads range-partitioned on its integer PK instead of over a
  single JDBC connection (SURVEY.md §4.3);
- the big sales tables land date-partitioned in the lake so the transform
  job's scans can prune partitions; small dimension tables stay flat.

The per-table loop shape (schema lookup -> read -> overwrite parquet)
mirrors db_to_parquet.py:194-199.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schemas.adventureworks import TABLE_SCHEMAS, TABLES_TO_INGEST
from ..sources.jdbc import JdbcConfig, read_jdbc_table
from ..sinks.parquet import write_lake_table

# PK per table = first schema column (every AdventureWorks table here has
# an integer PK first; db_to_parquet.py TABLE_SCHEMAS leads with it).
PARTITION_KEYS: dict[str, str] = {
    f"{s}.{t}": TABLE_SCHEMAS[f"{s}.{t}"].fields[0].name
    for s, t in TABLES_TO_INGEST
}

# Facts get a derived date partition column for lake-side pruning.
DATE_PARTITIONED: dict[str, str] = {
    "sales.salesorderheader": "orderdate",
}


def env_secrets(prefix: str = "ADVENTUREWORKS") -> dict[str, str]:
    """Default secret resolver: environment variables."""
    return {
        "user": os.environ.get(f"{prefix}_DB_USER", ""),
        "password": os.environ.get(f"{prefix}_DB_PASSWORD", ""),
        "dbname": os.environ.get(f"{prefix}_DB_NAME", ""),
    }


def jdbc_config_from_secrets(
    resolver: Callable[[], dict[str, str]] = env_secrets,
    host: str = "127.0.0.1",
    port: int = 5432,
    sslmode: str = "disable",
) -> JdbcConfig:
    """Build the JDBC config the way the reference does (proxy-sidecar URL
    shape, db_to_parquet.py:183-188), with pluggable secret resolution."""
    s = resolver()
    return JdbcConfig(
        url=f"jdbc:postgresql://{host}:{port}/{s['dbname']}?sslmode={sslmode}",
        user=s["user"],
        password=s["password"],
    )


def ingest_increment(
    spark: SparkSession,
    cfg: JdbcConfig | None,
    lake_base: str,
    watermarks: dict[str, str | int] | None = None,
    watermark_col: str = "modifieddate",
    num_partitions: int = 16,
    tables: list[tuple[str, str]] = TABLES_TO_INGEST,
    schemas: dict | None = None,
    partition_keys: dict[str, str] | None = None,
    date_partitioned: dict[str, str] = DATE_PARTITIONED,
    reader: Callable[[str, object], object] | None = None,
) -> dict[str, int]:
    """Incremental twin of ``ingest_all``: per table, pull only rows whose
    ``watermark_col`` moved past the last run (DB-side predicate via
    sources.jdbc.read_jdbc_increment), MERGE them into the lake
    (operators.relational.upsert_snapshot — latest watermark per PK wins),
    and rewrite only what changed:

    - date-partitioned facts: merge against ONLY the touched date
      partitions (partition-pruned read) and dynamic-overwrite exactly
      those partitions — a daily run rewrites one day of a 100 TB fact;
    - flat dimensions: merge against the whole (small) dim and overwrite.

    The merged frame is localCheckpoint'ed before the write because it
    reads the same files the write replaces; it is bounded — touched
    partitions plus the increment for facts, the dim itself for dims.

    ``reader(full_table_name, schema) -> DataFrame`` is injectable so
    tests (no live DB here) and non-JDBC sources drop in; the default
    reads the watermark increment over partitioned JDBC. Returns the
    per-table increment row counts (0 = nothing to do, lake untouched).
    """
    from ..operators.relational import upsert_snapshot
    from ..sinks.maintenance import refresh_partitions
    from ..sinks.parquet import lake_path

    schemas = TABLE_SCHEMAS if schemas is None else schemas
    pkeys = PARTITION_KEYS if partition_keys is None else partition_keys
    if reader is None:
        from ..sources.jdbc import read_jdbc_increment

        def reader(full: str, schema):
            return read_jdbc_increment(
                spark,
                cfg,
                full,
                schema,
                watermark_col,
                (watermarks or {})[full],
                pk_col=pkeys.get(full),
                num_partitions=num_partitions,
            )

    out: dict[str, int] = {}
    for schema_name, table_name in tables:
        full = f"{schema_name}.{table_name}"
        inc = reader(full, schemas.get(full))
        n_inc = inc.count()
        out[full] = n_inc
        if n_inc == 0:
            continue
        pk = pkeys[full]
        path = lake_path(lake_base, schema_name, table_name)
        if full in date_partitioned:
            src = date_partitioned[full]
            inc = inc.withColumn("ingest_date", F.to_date(F.col(src)))
            touched = [
                r[0] for r in inc.select("ingest_date").distinct().collect()
            ]
            existing = spark.read.parquet(path).filter(
                F.col("ingest_date").isin(touched)
            )
            merged = upsert_snapshot(
                existing, inc, keys=[pk], order_by=[watermark_col]
            ).localCheckpoint()
            refresh_partitions(merged, path, "ingest_date")
        else:
            existing = spark.read.parquet(path)
            merged = upsert_snapshot(
                existing, inc, keys=[pk], order_by=[watermark_col]
            ).localCheckpoint()
            merged.write.mode("overwrite").parquet(path)
    return out


def ingest_all(
    spark: SparkSession,
    cfg: JdbcConfig,
    lake_base: str,
    num_partitions: int = 16,
) -> dict[str, str]:
    """Ingest every registered table into the lake. One Spark job per
    table (as in the reference driver loop), but each job's scan is
    parallel across PK stripes."""
    out: dict[str, str] = {}
    for schema_name, table_name in TABLES_TO_INGEST:
        full = f"{schema_name}.{table_name}"
        df = read_jdbc_table(
            spark,
            cfg,
            dbtable=full,
            schema=TABLE_SCHEMAS[full],
            pk_col=PARTITION_KEYS[full],
            num_partitions=num_partitions,
        )
        partition_by = None
        if full in DATE_PARTITIONED:
            src = DATE_PARTITIONED[full]
            df = df.withColumn("ingest_date", F.to_date(F.col(src)))
            partition_by = "ingest_date"
        out[full] = write_lake_table(
            df, lake_base, schema_name, table_name, partition_by=partition_by
        )
    return out


def ingest_warc(
    spark: SparkSession,
    warc_path: str,
    lake_base: str,
    schema_name: str = "crawl",
    table_name: str = "records",
) -> str:
    """Land a WARC crawl (sources/warc.py connector) into the parquet
    lake, date-partitioned by crawl day — the web-scale twin of the
    JDBC ingest loop: read once through the Python-source seam, then
    every downstream query runs on pruned columnar scans instead of
    re-parsing WARC. One task per shard in, one pruned parquet
    partition per crawl day out."""
    from ..sources.warc import register_warc

    register_warc(spark)
    df = spark.read.format("warc").load(warc_path)
    dated = df.withColumn("crawl_date", F.to_date("warc_date"))
    return write_lake_table(
        dated, lake_base, schema_name, table_name,
        partition_by="crawl_date",
    )


def ingest_warc_stream(
    spark: SparkSession,
    warc_path: str,
    lake_path: str,
    checkpoint: str,
) -> None:
    """Continuous crawl ingestion: stream newly-landed WARC shards into
    the parquet lake with exactly-once checkpoint resume — re-running
    after new shards land ingests ONLY the new shards (the offset is
    the consumed shard set; a replayed batch re-reads exactly the files
    between checkpointed offsets), and the sink is idempotent under
    batch REPLAY too: each micro-batch overwrites its own
    ``ingest_batch=<batch_id>`` partition, so a crash between write and
    checkpoint commit rewrites the same partition instead of appending
    duplicates. Each availableNow run drains everything new and exits,
    the scheduled-batch deployment shape; the same code runs
    latency-driven with a processing-time trigger."""
    from ..sources.warc import register_warc
    from ..streaming.events import stream_to_parquet

    register_warc(spark)
    stream = spark.readStream.format("warc").load(warc_path)
    dated = stream.withColumn("crawl_date", F.to_date("warc_date"))
    stream_to_parquet(dated, lake_path, checkpoint, exactly_once=True)
