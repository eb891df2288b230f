"""WARC (Web ARChive) connector via the public Python Data Source API
(pyspark.sql.datasource, Spark 4) — the ISO 28500 format web crawls
(e.g. Common Crawl) ship in, which Spark has no built-in reader for.

This is the engine's demonstration that the §2.1 source surface is
EXTENSIBLE beyond the reference's jdbc/parquet pair
(db_to_parquet.py:156–165, transform_to_bq.py:77–83) without leaving
public Spark: a `DataSource` subclass registered per session gives a
full planner-integrated `spark.read.format("warc")` / `df.write
.format("warc")` pair.

Scale design:
- one InputPartition per shard file — a 100 TB crawl of ~1 GB .warc.gz
  shards parallelizes to ~100k independent tasks with zero shuffle;
  record parsing streams (header block + Content-Length payload), so
  memory is O(largest record), never O(file);
- gzip is handled transparently for BOTH whole-file compression and
  the Common Crawl convention of one gzip member per record (Python's
  gzip reader concatenates members);
- payloads surface as opaque `binary` columns with typed metadata —
  exactly the multimodal-column contract (operators/multimodal.py)
  downstream decode/feature stages consume;
- the writer emits one shard per partition (repartition upstream to
  size shards), so export parallelism = partition count.

A Python-level source is the honest slow path versus a JVM parquet
scan (every record crosses Py4J/pickle) — it is the INGEST seam that
lands crawl data into the parquet lake once, not a hot-query path.
"""

from __future__ import annotations

import glob
import gzip
import io
import os
import uuid
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("warc_date", TimestampType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("source_file", StringType()),
    ]
)

_CRLF = b"\r\n"


def _open_stream(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # multi-member streams concatenate
    return open(path, "rb")


def parse_warc_stream(stream, source_file: str):
    """Yield one tuple per WARC record, streaming: reads the header
    block line-by-line, then exactly Content-Length payload bytes.
    Tolerates blank separator lines between records; raises on a
    malformed header block (fail loudly, never silently skip data)."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (_CRLF, b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"{source_file}: expected WARC version line, got "
                f"{line[:40]!r}"
            )
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h in (_CRLF, b"\n"):
                break
            if b":" not in h:
                raise ValueError(
                    f"{source_file}: malformed WARC header {h[:60]!r}"
                )
            k, v = h.split(b":", 1)
            headers[k.decode("ascii").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
        n = int(headers.get("content-length", "0"))
        payload = stream.read(n)
        if len(payload) != n:
            raise ValueError(
                f"{source_file}: truncated record — Content-Length {n}, "
                f"got {len(payload)} bytes"
            )
        wd = headers.get("warc-date")
        ts = (
            datetime.strptime(wd, "%Y-%m-%dT%H:%M:%SZ") if wd else None
        )
        yield (
            headers.get("warc-target-uri"),
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            ts,
            headers.get("content-type"),
            n,
            payload,
            source_file,
        )


def _is_landed(path: str) -> bool:
    """Only fully-published shards are readable: the writer's commit
    protocol publishes by renaming a dot-prefixed ``*.inprogress`` temp
    to its final name, so both the batch glob and the streaming file-set
    offset must exclude in-progress names (glob's ``*`` already skips
    dotfiles; the suffix check also covers explicit file patterns)."""
    base = os.path.basename(path)
    return not base.startswith(".") and not base.endswith(".inprogress")


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires a path")
        pattern = (
            os.path.join(path, "*.warc*")
            if os.path.isdir(path)
            else path
        )
        self.files = sorted(
            p for p in glob.glob(pattern) if _is_landed(p)
        )
        if not self.files:
            raise FileNotFoundError(f"warc source: no files match {pattern}")

    def pushFilters(self, filters):
        """File-level pruning: ``source_file = 'x'`` / ``IN (...)``
        predicates drop whole shards at PLANNING time — the partition-
        pruning analogue for a sharded crawl (a 100k-shard corpus with
        a one-shard predicate schedules one task, not 100k). The
        filters are still returned to Spark for re-evaluation, so
        semantics never depend on the pruning."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("source_file",):
                self.files = [
                    p for p in self.files
                    if os.path.basename(p) == f.value
                ]
            elif isinstance(f, In) and f.attribute == ("source_file",):
                wanted = set(f.value)
                self.files = [
                    p for p in self.files
                    if os.path.basename(p) in wanted
                ]
            yield f

    def partitions(self):
        return [_WarcFilePartition(p) for p in self.files]

    def read(self, partition: _WarcFilePartition):
        with _open_stream(partition.path) as stream:
            yield from parse_warc_stream(
                stream, os.path.basename(partition.path)
            )


class _WarcShardCommit(WriterCommitMessage):
    """Names the task's in-progress temp file and the final shard name
    it should be published under at job commit."""

    def __init__(self, tmp_name: str, final_name: str):
        self.tmp_name = tmp_name
        self.final_name = final_name


class WarcWriter(DataSourceWriter):
    """One ``part-<pid>.warc.gz`` shard per input partition. Input rows
    must carry (url, warc_date, content_type, payload); record ids are
    deterministic UUIDv5 of the url so a re-export is byte-stable.

    Tasks write to dot-prefixed ``.{job}-part-*.inprogress`` temp names
    and the job's ``commit()`` publishes each shard with an atomic
    rename — so a failed/retried/speculative task attempt can never
    leave a truncated or duplicate shard visible: the batch glob and
    the streaming file-set offset both exclude dotfiles and
    ``*.inprogress``, and a shard appears under its final name only
    complete, exactly once. ``abort()`` (and a post-commit sweep)
    deletes this job's unpublished temps; the job token keeps
    concurrent writers to one directory from sweeping each other.
    Rename-as-publish assumes reader and writer share one filesystem —
    the same assumption the path-based reader already makes."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a path")
        os.makedirs(self.path, exist_ok=True)
        # Job-unique token, minted on the driver and shipped to every
        # task: names this job's temp files so cleanup is scoped.
        self.job = uuid.uuid4().hex[:12]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Unique shard name per write: a later append with the same
        # partition count must never clobber an earlier wave's shards
        # (landed shards are immutable — the streaming reader's offset
        # contract depends on it). Record CONTENT stays deterministic
        # (uuid5 record ids); only the shard file name is unique. The
        # attempt number salts the temp name so a speculative twin
        # attempt never writes the same temp file concurrently.
        final = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.warc.gz"
        tmp = f".{self.job}-a{ctx.taskAttemptId()}-{final}.inprogress"
        out = os.path.join(self.path, tmp)
        n = 0
        with gzip.open(out, "wb") as fh:
            for row in iterator:
                payload = bytes(row.payload) if row.payload else b""
                ts = row.warc_date or datetime(
                    1970, 1, 1, tzinfo=timezone.utc
                )
                rid = uuid.uuid5(uuid.NAMESPACE_URL, row.url or "")
                head = (
                    b"WARC/1.0\r\n"
                    + b"WARC-Type: response\r\n"
                    + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
                    + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
                    + f"WARC-Target-URI: {row.url}\r\n".encode()
                    + f"Content-Type: {row.content_type or 'application/octet-stream'}\r\n".encode()
                    + f"Content-Length: {len(payload)}\r\n".encode()
                    + b"\r\n"
                )
                fh.write(head + payload + b"\r\n\r\n")
                n += 1
        return _WarcShardCommit(tmp, final)

    def commit(self, messages):
        """Atomic publish: rename each winning attempt's temp to its
        final shard name, then sweep this job's leftover temps (losing
        retried/speculative attempts)."""
        for m in messages:
            if m is None:
                continue
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, m.final_name),
            )
        self._sweep()

    def abort(self, messages):
        """Failed job: nothing was published (no rename happened), so
        deleting this job's temps restores the directory exactly."""
        self._sweep()

    def _sweep(self) -> None:
        for p in glob.glob(
            os.path.join(self.path, f".{self.job}-*.inprogress")
        ):
            try:
                os.remove(p)
            except OSError:
                pass  # a concurrent cleaner got it first


class WarcStreamReader(DataSourceStreamReader):
    """Streaming WARC: continuous crawl ingestion as micro-batches of
    newly-landed shard files, with exactly-once checkpoint resume.

    Offset = the sorted set of shard basenames already consumed (a
    file is the atomic unit, matching how crawlers land complete
    shards). ``latestOffset`` is one driver-side directory listing per
    micro-batch; each new file becomes one InputPartition whose records
    are parsed ON EXECUTORS with the same streaming parser as the
    batch reader — so unlike SimpleDataSourceStreamReader, read
    throughput scales with the cluster, and a restart replays exactly
    the files between the checkpointed offsets (files must be
    immutable once landed — the same contract Spark's own file source
    has). The full-list offset is O(#files); for multi-million-shard
    crawls compact it to a (lexicographic) high-water mark, which
    crawler naming conventions (crawl-id/segment/part-NNNNN) make
    monotone."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("warc stream source requires a path")
        self.dir = path
        self.pattern = (
            os.path.join(path, "*.warc*") if os.path.isdir(path) else path
        )

    def _all_files(self) -> list[str]:
        return sorted(
            os.path.basename(p)
            for p in glob.glob(self.pattern)
            if _is_landed(p)
        )

    def initialOffset(self) -> dict:
        return {"consumed": ""}

    def latestOffset(self) -> dict:
        return {"consumed": ",".join(self._all_files())}

    def partitions(self, start: dict, end: dict):
        done = {f for f in start["consumed"].split(",") if f}
        new = [
            f for f in end["consumed"].split(",") if f and f not in done
        ]
        return [
            _WarcFilePartition(os.path.join(self.dir, f)) for f in new
        ]

    def read(self, partition: _WarcFilePartition):
        with _open_stream(partition.path) as stream:
            yield from parse_warc_stream(
                stream, os.path.basename(partition.path)
            )

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean up


class WarcDataSource(DataSource):
    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcReader(self.options)

    def streamReader(self, schema):
        return WarcStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        expected = {"url", "warc_date", "content_type", "payload"}
        missing = expected - {f.name for f in schema.fields}
        if missing:
            raise ValueError(
                f"warc sink requires columns {sorted(expected)}; "
                f"missing {sorted(missing)}"
            )
        return WarcWriter(self.options, overwrite)


def register_warc(spark) -> None:
    """Register the connector for ``spark.read.format('warc')`` /
    ``.write.format('warc')`` on this session (idempotent). Python-
    source filter pushdown ships conf-gated in Spark 4.1; the reader
    implements ``pushFilters``, so enable it for the session (runtime-
    settable SQL conf — semantics are unchanged either way because the
    reader re-returns every filter for post-scan evaluation)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcDataSource)
