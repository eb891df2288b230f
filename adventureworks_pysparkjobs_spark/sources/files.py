"""Generic file-format sources with schema discipline.

The reference reads only parquet + JDBC; a portable engine also ingests
CSV/JSON/ORC drops. The rule carried over from the reference's ingest
(schema pinned at read, db_to_parquet.py:163) applies doubly here:
schema inference on CSV/JSON means a full extra pass over 100 TB and
type drift between runs — so these readers REQUIRE an explicit schema.

Delta/Iceberg/Hudi need their connector jars; `read_table` raises a
clear error for those formats when the classpath lacks them rather than
failing deep inside the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

LAKE_FORMATS = {"parquet", "orc", "csv", "json"}
CONNECTOR_FORMATS = {"delta", "iceberg", "hudi"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a lake table in any supported format.

    - parquet/orc: schema optional (embedded in the files; passing one
      pins the contract and prunes columns at scan).
    - csv/json: schema REQUIRED (no inference pass).
    """
    fmt = fmt.lower()
    if fmt in CONNECTOR_FORMATS:
        try:
            return spark.read.format(fmt).options(**options).load(path)
        except Exception as e:  # connector jar absent in this build
            raise NotImplementedError(
                f"{fmt} requires its connector jar on the Spark classpath"
            ) from e
    if fmt not in LAKE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in {"csv", "json"}:
        raise ValueError(
            f"{fmt} reads require an explicit schema (no inference at scale)"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
    **options: str,
) -> str:
    fmt = fmt.lower()
    if fmt not in LAKE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    writer.format(fmt).save(path)
    return path


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """JSONL ingest with a corrupt-record quarantine — the realistic
    shape of a web-scraped corpus drop, where some fraction of lines
    is truncated or malformed and a hard-fail (FAILFAST) or silent
    drop (DROPMALFORMED) both lose information at 100 TB.

    PERMISSIVE mode routes each unparseable line's raw text into
    ``corrupt_col``; the return is (good, quarantine):

    - ``good``  — rows matching the schema, corrupt column removed;
    - ``quarantine`` — one ``raw`` string column per bad line, to be
      landed next to the good data for repair/audit (the count is the
      ingest health metric).

    Both frames derive from ONE read (the split is two filters on the
    same scan — Catalyst reuses it per action, and at scale you write
    both outputs in one pass via a partitioned write on the validity
    flag). The schema is REQUIRED like every text-format read here.
    """
    if corrupt_col in {f.name for f in schema.fields}:
        raise ValueError(
            f"schema must not already contain {corrupt_col!r}"
        )
    full = StructType(schema.fields[:]).add(corrupt_col, "string")
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        # Spark refuses a scan whose required schema is ONLY the
        # corrupt column (the parser would re-run and always succeed
        # on the raw line) — its documented workaround is caching the
        # parsed frame, which also makes the good/quarantine split one
        # physical read. At 100 TB, land both sides in one partitioned
        # write on the validity flag instead of keeping the cache.
        .cache()
    )
    good = raw.filter(
        raw[corrupt_col].isNull()
    ).drop(corrupt_col)
    quarantine = raw.filter(raw[corrupt_col].isNotNull()).select(
        raw[corrupt_col].alias("raw")
    )
    return good, quarantine
