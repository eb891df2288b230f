"""Multimodal column operators (north-star extension, SURVEY.md §2.10).

Design: media are opaque ``binary`` payload columns + a typed metadata
struct, the schema shape that scales to 100 TB of images/audio/video on a
parquet lake — payload bytes stay columnar-compressed and are only
materialized inside Arrow batches in the worker Python processes.

The Spark-side plumbing here (binaryFile source, schema, mapInPandas batch
shape, partitioning) is real and tested. The codec step itself (JPEG
decode, audio resample, video frame-sample) needs media libraries that are
not in this container, so the codec is injected: ``decode_batch`` takes a
``codec`` callable; the default codec raises NotImplementedError and tests
inject a deterministic fake. Swapping in Pillow/librosa/pyav in production
changes one argument, not the dataflow.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modification_time", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = (
    "path string, payload_bytes bigint, payload_sha256 string, "
    "width int, height int, n_channels int, feature array<float>"
)


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """binaryFile source: one row per file with path/mtime/length/content.
    Spark parallelizes over files; pathGlobFilter prunes listing-side."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def default_codec(payload: bytes) -> dict:
    """Placeholder codec — media libraries are not available in this
    environment. Production injects a real decoder with the same contract:
    bytes -> {'width', 'height', 'n_channels', 'feature': list[float]}."""
    raise NotImplementedError(
        "no media codec available in this environment; inject one"
    )


def extract_features(
    df: DataFrame,
    codec: Callable[[bytes], dict] = default_codec,
    content_col: str = "content",
    path_col: str = "path",
    batch_limit_bytes: int = 256 << 20,
) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Arrow streams batches of (path, content) into worker Python; each
    batch is decoded row-by-row through ``codec`` (the codec is the
    CPU-bound part — numpy/PIL internally vectorize per item). Output is
    a flat typed frame. ``spark.sql.execution.arrow.maxRecordsPerBatch``
    and ``batch_limit_bytes`` bound worker memory: at 100 TB the unit of
    parallelism is the file/row-group, never the dataset.
    """
    import hashlib

    import pandas as pd

    out_cols = [
        "path", "payload_bytes", "payload_sha256",
        "width", "height", "n_channels", "feature",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, payload in zip(pdf[path_col], pdf[content_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = codec(payload)
                rows.append(
                    {
                        "path": path,
                        "payload_bytes": len(payload),
                        "payload_sha256": hashlib.sha256(payload).hexdigest(),
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_channels": meta.get("n_channels"),
                        "feature": meta.get("feature"),
                    }
                )
            # columns pinned so an empty Arrow batch still matches the schema
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(path_col, content_col).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "path string, content binary, width int, height int"

FRAME_SCHEMA = (
    "path string, frame_idx int, frame_ts_ms bigint, frame binary, "
    "feature array<float>"
)


def resize_images(
    df: DataFrame,
    codec: Callable[[bytes, int, int], dict] = None,
    target_width: int = 224,
    target_height: int = 224,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Resize image payloads to a target size via mapInPandas — the
    normalize-before-training step. 1 row in → 1 row out; the resized
    bytes replace the payload, so downstream stages see the same
    (path, content) shape and compose freely with extract_features.

    ``codec(payload, w, h) -> {'content': bytes, 'width', 'height'}`` is
    injected (Pillow in production; deterministic fake in tests — no
    media libraries in this container, same seam as default_codec).
    """
    import pandas as pd

    if codec is None:
        def codec(payload: bytes, w: int, h: int) -> dict:  # pragma: no cover
            raise NotImplementedError(
                "no image codec available in this environment; inject one"
            )

    out_cols = ["path", "content", "width", "height"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, payload in zip(pdf[path_col], pdf[content_col]):
                payload = bytes(payload) if payload is not None else b""
                out = codec(payload, target_width, target_height)
                rows.append(
                    {
                        "path": path,
                        "content": out["content"],
                        "width": out.get("width", target_width),
                        "height": out.get("height", target_height),
                    }
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(path_col, content_col).mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    codec: Callable[[bytes], list] = None,
    every_n: int = 1,
    max_frames: int | None = None,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Sample frames from video payloads via mapInPandas — the 1-to-MANY
    batch shape (one video row yields a row per kept frame), which is why
    this is mapInPandas and not a scalar pandas_udf (those must be 1:1).

    ``codec(payload) -> [{'frame_idx', 'frame_ts_ms', 'frame': bytes,
    'feature': list[float]}, ...]`` yields decoded frames in order;
    ``every_n`` keeps every n-th frame and ``max_frames`` caps the output
    per video — both applied AFTER the codec's iterator so a real pyav
    codec can stop decoding early. Injected seam as everywhere in this
    module (no media libs in this container).
    """
    import pandas as pd

    if codec is None:
        def codec(payload: bytes) -> list:  # pragma: no cover
            raise NotImplementedError(
                "no video codec available in this environment; inject one"
            )

    out_cols = ["path", "frame_idx", "frame_ts_ms", "frame", "feature"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, payload in zip(pdf[path_col], pdf[content_col]):
                payload = bytes(payload) if payload is not None else b""
                kept = 0
                for i, fr in enumerate(codec(payload)):
                    if i % every_n != 0:
                        continue
                    if max_frames is not None and kept >= max_frames:
                        break
                    kept += 1
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": fr.get("frame_idx", i),
                            "frame_ts_ms": fr.get("frame_ts_ms"),
                            "frame": fr.get("frame"),
                            "feature": fr.get("feature"),
                        }
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(path_col, content_col).mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def payload_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Pure-JVM payload statistics (no Python, no decode): size + digest
    per payload — the cheap pre-pass that dedups/filters media *before*
    any expensive decode runs."""
    c = F.col(content_col)
    return df.select(
        "*",
        F.octet_length(c).cast("bigint").alias("payload_bytes"),
        F.sha2(c, 256).alias("payload_sha256"),
    ).drop(content_col)


def attach_metadata(
    media: DataFrame,
    metadata: DataFrame,
    on: str = "path",
) -> DataFrame:
    """Join media payloads to a typed metadata sidecar — the canonical
    multimodal layout: payload table + sidecar, one sidecar row per media
    item.  The sidecar scales WITH the payload table, so no broadcast hint
    is forced: AQE picks broadcast when the sidecar is actually small and
    a shuffled hash join (co-partitioned on the key) when it is not."""
    return media.join(metadata, on, "left")


MAGIC_SIGNATURES: tuple[tuple[str, str], ...] = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),      # wav / avi / webp containers
    ("25504446", "pdf"),
    ("1F8B", "gzip"),
    ("504B0304", "zip"),
    ("664C6143", "flac"),
    ("4F676753", "ogg"),
)


def sniff_media_types(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Magic-byte container sniffing over an opaque ``binary`` payload
    column — the first gate of any multimodal ingest: NEVER trust the
    file extension or the upstream content-type header; classify by
    the leading signature bytes and quarantine the ``unknown`` bucket.
    Returns the per-container inventory (media_type, n_payloads
    BIGINT, total_bytes BIGINT) a crawl-triage dashboard reads.

    The classifier is a first-match CASE over well-known signatures
    (PNG/JPEG/GIF/RIFF/PDF/gzip/zip/FLAC/Ogg) applied to the hex of
    the FIRST 8 BYTES only — one in-codegen expression per row, no
    UDF, no decode; real decoding stays behind the codec seam
    (``extract_features``). Exact integer aggregate; bit-portable
    (hex renders uppercase in both engines).
    """
    sig = F.hex(F.expr(f"substring({content_col}, 1, 8)"))
    media = None
    for prefix, name in MAGIC_SIGNATURES:
        cond = sig.startswith(prefix)
        media = (
            F.when(cond, name) if media is None else media.when(cond, name)
        )
    media = media.otherwise("unknown")
    return (
        df.select(
            media.alias("media_type"),
            F.octet_length(F.col(content_col)).cast("long").alias("_b"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_payloads"),
            F.sum("_b").cast("long").alias("total_bytes"),
        )
    )
