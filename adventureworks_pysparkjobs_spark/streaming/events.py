"""Structured Streaming pipelines over the events table (SURVEY.md §2.8).

The reference has no streaming; this is the north-star extension surface:
file-source readStream → watermark → windowed/stateful transformation →
sink. Tests and the oracle harness drive these with a bounded file source
and ``processAllAvailable`` (the documented deterministic pattern for
exercising a streaming query on a finite fixture); the same pipeline code
runs unbounded on a kafka/files source in production.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.corpus import _normalize_events


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events fixture with the same dtype-branched
    timestamp repair as the batch path — the streaming twin of
    sources/corpus.py:load_table('events').

    The file stream source requires an explicit schema; we take it from a
    batch scan of the same file instead of
    pinning one, so whichever ``ts`` physical encoding the fixture carries
    (int64 nanos / MICROS-NTZ / MICROS-UTC) streams through the identical
    ``_normalize_events`` branch as batch. A hard-pinned LongType schema
    here once silently reinterpreted a µs fixture as ns and compressed
    every timestamp 1000× — deriving the schema from the observed file
    makes that drift impossible.
    """
    # Defensive conf pin — see sources/corpus.py:load_table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    glob = f"{sf_dir}/events*.parquet"
    batch_peek = spark.read.parquet(glob)
    observed = batch_peek.schema
    # Glob form: the file stream source needs a directory basePath.
    reader = spark.readStream.format("parquet").schema(observed)
    if max_files_per_trigger is not None:
        # bound each micro-batch (tests use this to force multi-batch
        # runs; production uses it for ingest pacing)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(glob)
    # The batch peek doubles as the epoch-unit classification probe: a
    # streaming frame cannot be aggregated pre-sink, so the int64-ts
    # unit check (min/max band classification, loud failure on
    # mixed/out-of-band) runs against the same files batch-side.
    return _normalize_events(raw, probe=batch_peek)


def run_to_memory(
    streaming_df: DataFrame, output_mode: str, spark: SparkSession
) -> DataFrame:
    """Run a bounded streaming frame to completion into a memory sink and
    return the materialized result as a batch DataFrame."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def tumbling_counts(
    spark: SparkSession, sf_dir: str, window: str = "5 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts, run to completion.

    Complete output mode → every window is emitted after the bounded run,
    which is what makes the batch-SQL oracle (queries/events.py
    events_tumbling_5min) an exact twin. The watermark bounds state size in
    the unbounded deployment; on a bounded fixture it drops nothing.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal accumulation (order-independent), DOUBLE output
            # (queries/catalog.py determinism rules)
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    out = run_to_memory(agg, "complete", spark)
    return out.select(
        F.col("window.start").cast("bigint").alias("bucket_s"),
        "event_type",
        "n_events",
        "total_value",
    )


def sliding_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Watermarked SLIDING-window counts (window length > slide → each
    event lands in window/slide overlapping buckets), run to completion.

    The batch twin of a sliding window is the event exploded into its
    covering buckets then grouped — asserted in tests. State per key is
    bounded by the watermark exactly as for tumbling windows; the only
    cost delta at 100 TB is the window/slide duplication factor in the
    aggregation input, which Spark generates without materializing
    duplicate input rows.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_to_memory(agg, "complete", spark)
    return out.select(
        F.col("window.start").cast("bigint").alias("bucket_s"),
        "event_type",
        "n_events",
    )


def stream_to_parquet(
    streaming_df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    exactly_once: bool = False,
) -> None:
    """Run a bounded streaming frame to completion into a parquet lake
    directory via foreachBatch — the production sink pattern when the
    target needs overwrite/merge semantics or a non-streaming writer
    (JDBC, warehouse connectors).

    foreachBatch hands each micro-batch to ordinary batch-writer code,
    so the same ``sinks/parquet.py`` seams work unchanged under
    streaming — but foreachBatch itself guarantees only AT-LEAST-ONCE:
    a crash between the batch write and the checkpoint commit replays
    the batch, and a plain append then duplicates its rows. With
    ``exactly_once=True`` each batch instead OVERWRITES its own
    ``ingest_batch=<batch_id>`` partition directory (batch ids are
    deterministic under replay), so a replayed batch rewrites the same
    partition byte-for-byte — the overwrite-by-batch-id idempotence
    pattern ``stream_aggregate_to_lake`` uses, at row grain. Readers of
    the root path see the ``ingest_batch`` partition column (useful
    lineage; drop it if unwanted). Plain append remains the default for
    sinks where occasional replay duplicates are acceptable or deduped
    downstream.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if exactly_once:
            batch_df.write.mode("overwrite").parquet(
                f"{path}/ingest_batch={batch_id}"
            )
        else:
            batch_df.write.mode(mode).parquet(path)

    q = (
        streaming_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_to_lake(
    streaming_df: DataFrame,
    path: str,
    keys: list[str],
    order_by: list[str],
    checkpoint: str,
) -> None:
    """Keyed MERGE sink: each micro-batch upserts into a lake table by
    primary key (operators/relational.py upsert_snapshot — latest
    ``order_by`` wins), via foreachBatch.

    This is the exactly-once landing pattern for sinks WITHOUT a
    transactional table format: the checkpointed source offsets make
    each input row enter some batch exactly once, and the keyed merge
    makes a REPLAYED batch (failure between merge and checkpoint commit)
    idempotent — re-merging rows that already won changes nothing. The
    same pattern also turns a CDC/update stream into a continuously
    maintained snapshot (late duplicates lose on ``order_by``).

    The first batch bootstraps the table; later batches merge against
    the current snapshot, localCheckpoint (the merged frame reads the
    files the write replaces), then overwrite. At scale, partition the
    table and merge only touched partitions — jobs/ingest.py
    ingest_increment shows that exact date-partitioned variant; this
    sink keeps the flat-dimension shape.
    """
    from ..operators.relational import upsert_snapshot

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(path)
        except Exception:  # first batch: nothing to merge against yet
            existing = None
        if existing is None:
            # in-batch dedup still applies: latest per key wins
            merged = upsert_snapshot(
                batch_df.limit(0), batch_df, keys=keys, order_by=order_by
            )
        else:
            merged = upsert_snapshot(
                existing,
                batch_df.select(existing.columns),
                keys=keys,
                order_by=order_by,
            ).localCheckpoint()
        merged.write.mode("overwrite").parquet(path)

    q = (
        streaming_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _write_agg_partial(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Write one micro-batch's PARTIAL aggregate into its own
    ``batch_id=<id>`` partition directory, overwriting that partition
    only. Module-level so tests can replay a batch id directly."""
    partial = batch_df.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    partial.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def stream_aggregate_to_lake(
    streaming_df: DataFrame,
    path: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint: str,
) -> None:
    """Additive-aggregate MV sink: streaming incremental maintenance of
    the reference's daily rollup shape (transform_to_bq.py:160-165)
    without a transactional table format.

    Additive measures make replayed batches DANGEROUS for a naive
    merge sink — re-summing a replayed batch double-counts (unlike the
    keyed upsert in ``stream_upsert_to_lake``, whose merge is naturally
    idempotent). So each micro-batch lands its partial aggregate in its
    own ``batch_id=<id>`` partition: the checkpointed source offsets
    pin batch membership, and a replay OVERWRITES its own partition
    instead of adding to it — exactly-once for sums, by layout.

    The queryable snapshot is merge-on-read
    (``read_agg_snapshot`` — one keyed re-sum over group-grain partial
    rows, the relational.merge_aggregate shape), so snapshot cost is
    O(groups x batches), independent of raw event volume; fold old
    partials together periodically (rewrite N batch partitions as one)
    when batch count grows.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _write_agg_partial(batch_df, batch_id, path, keys, sum_cols)

    q = (
        streaming_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_agg_snapshot(
    spark: SparkSession, path: str, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge-on-read view of a ``stream_aggregate_to_lake`` table: fold
    every batch partition's partial aggregate into the current totals
    (one keyed re-sum — partial rows are group-grain, never raw)."""
    partials = spark.read.parquet(path)
    return partials.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type) — unlike plain dropDuplicates, the dedup state
    for a key is dropped once the watermark passes it, so state stays
    bounded on an unbounded stream (re-occurrences further apart than the
    watermark delay are NOT deduped — the declared streaming semantic).
    On the bounded fixture (29-day span < the 60-day delay) it equals a
    global distinct, which is the oracle. Output = the distinct key set
    (the kept-row identity is arrival-order-dependent in a streaming
    setting, so only the key set is the deterministic contract)."""
    ev = read_events_stream(spark, sf_dir)
    dd = ev.withWatermark("ts", "60 days").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = run_to_memory(dd, "append", spark)
    return out.select("user_id", "event_type")


def session_windows(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Native streaming session windows (session_window + watermark):
    per-user sessions closed after ``gap`` of inactivity."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_to_memory(agg, "complete", spark)
    return out.select(
        "user_id",
        F.col("session_window.start").cast("bigint").alias("session_start_s"),
        "n_events",
    )


def enriched_counts(
    spark: SparkSession, sf_dir: str, dim: DataFrame
) -> DataFrame:
    """Stream-static join: enrich the event stream with a static dimension
    (broadcast — the static side is planned per micro-batch, so a small
    dim becomes a broadcast hash join with NO stream-side shuffle), then
    a watermarked count per enrichment key.

    The production shape for attaching user/session/catalog attributes to
    an event stream; at 100 TB/day the static side is refreshed by
    re-planning, not by restarting the stream.
    """
    ev = read_events_stream(spark, sf_dir)
    joined = ev.join(F.broadcast(dim), "user_id", "left")
    agg = (
        joined.withWatermark("ts", "10 minutes")
        .groupBy("cohort")
        .agg(F.count("*").alias("n_events"))
    )
    return run_to_memory(agg, "complete", spark)


def stream_stream_attribution(
    spark: SparkSession, sf_dir: str, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    click by the same user within the preceding ``horizon``.

    Both sides carry watermarks and the join condition bounds click_ts to
    a closed interval ending at purchase_ts — exactly what Structured
    Streaming needs to size its join state: a click can be dropped from
    state once the purchase-side watermark passes click_ts + horizon, so
    state is O(events within the horizon), not O(stream history). The
    join itself is a key-partitioned (user_id) symmetric hash join —
    at scale each micro-batch shuffles only its new events.

    Output: (purchase_id, user_id, purchase_ts, click_id, click_ts).
    """
    # Self-join from ONE stream source: both sides derive from the same
    # readStream, so the file source is scanned once per micro-batch, not
    # twice (at 100 TB/day the second scan is the difference between one
    # and two passes over the day's landing zone).
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", horizon)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", horizon)
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        ),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    return run_to_memory(joined, "append", spark)


def stateful_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_s: int = 1800,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState: the
    hand-rolled counterpart of session_window for session logic the
    built-in can't express (e.g. per-session derived features at close).

    State per user = (current session start epoch-s, last event epoch-s,
    event count) — O(1) regardless of stream length. A new event either
    extends the open session (gap < gap_s) or closes it (emitting the
    finished session) and opens a new one. Every batch also flushes the
    still-open session (a streaming sink can't know which batch is last),
    so a session straddling batch boundaries is emitted once per batch at
    its then-current extent; the post-sink keep-max aggregation per
    (user, session_start) collapses those progressive emissions to the
    final extent — making the result equal batch gap-sessionization on
    ANY batch split of the input, not just a single-batch run (the
    session start is a stable key: re-opening after a gap starts a new,
    later session).

    Events inside one micro-batch are sorted by (ts, event_id) before the
    fold; across micro-batches Spark guarantees per-key grouping, and the
    availableNow bounded run delivers a deterministic batch sequence.
    Arrival contract: batches must be time-ordered per key (a landing
    zone receiving files in time order) — gap-fold state cannot rewind
    for an event older than what it has already folded, the same
    assumption every LOCF-style stateful operator makes.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)

    def update(key, pdfs, state: GroupState):
        start, last, count = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["ts", "event_id"]])
        if rows:
            batch = pd.concat(rows).sort_values(["ts", "event_id"])
            for ts in batch["ts"]:
                s = int(ts.timestamp())
                if start is None:
                    start, last, count = s, s, 1
                elif s - last > gap_s:
                    closed.append((start, last, count))
                    start, last, count = s, s, 1
                else:
                    last, count = s, count + 1
        # bounded fixture: flush the open session at end of the batch
        if start is not None:
            closed.append((start, last, count))
            state.update((start, last, count))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start_s": [c[0] for c in closed],
                "session_end_s": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    out = ev.select("user_id", "ts", "event_id").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, session_start_s long, session_end_s long, "
            "n_events long"
        ),
        stateStructType="start long, last long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = run_to_memory(out, "append", spark)
    # Collapse progressive emissions of a batch-straddling session to its
    # final extent (see docstring) — a no-op on a single-batch run.
    return emitted.groupBy("user_id", "session_start_s").agg(
        F.max("session_end_s").alias("session_end_s"),
        F.max("n_events").alias("n_events"),
    ).select("user_id", "session_start_s", "session_end_s", "n_events")


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event counter + value accumulator kept in explicit
    GroupState across micro-batches, emitting the updated totals each
    batch. The state is two scalars per user — bounded regardless of
    stream length (the hand-rolled counterpart of a windowed aggregate,
    for logic window()/agg() can't express).

    On the bounded fixture (one availableNow batch) the emitted totals
    equal the batch per-user aggregate, which is the oracle contract.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    out = ev.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "append", spark)


def stream_stream_attribution_outer(
    spark: SparkSession, sf_dir: str, horizon: str = "30 minutes"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase with its
    preceding-``horizon`` clicks, AND purchases with no click — the
    null-extended rows a conversion funnel needs ("how many purchases
    arrived cold?").

    Outer stream-stream joins only emit the null side once the
    watermark proves no match can still arrive, so the unmatched tail
    of a BOUNDED stream would sit in state forever. The production
    pattern, reproduced here: a watermark heartbeat — one far-future
    sentinel row per side advances both watermarks past every real
    event at end-of-stream, flushing all pending null-extensions
    (sentinels are filtered from the output; on an unbounded stream
    real traffic plays this role and no sentinel is needed).

    State sizing is identical to the inner variant: a click leaves
    state once the purchase-side watermark passes click_ts + horizon.
    """
    import shutil
    import tempfile

    from ..sources.corpus import load_table

    tmp = tempfile.mkdtemp(prefix="stream_outer_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        def sentinels(days: int) -> DataFrame:
            far = ev.agg(
                (F.max("ts") + F.expr(f"INTERVAL {days} DAYS")).alias(
                    "far_ts"
                )
            )
            return far.select(
                F.lit(-1).cast("long").alias("event_id"),
                F.col("far_ts").alias("ts"),
                F.lit(-1).cast("long").alias("user_id"),
                F.explode(
                    F.array(F.lit("click"), F.lit("purchase"))
                ).alias("event_type"),
            )

        # Three arrival groups with ascending mtimes, streamed one file
        # per trigger: data, heartbeat(+365d), heartbeat(+366d). The
        # watermark the engine uses in batch k comes from batch k-1, so
        # the FIRST heartbeat batch evicts nothing near stream end and
        # the SECOND flushes everything the first proved complete.
        import glob
        import os
        import time

        os.makedirs(f"{tmp}/src")
        for i, frame in enumerate(
            [ev, sentinels(365), sentinels(366)]
        ):
            frame.coalesce(1).write.parquet(f"{tmp}/stage{i}")
            (part,) = glob.glob(f"{tmp}/stage{i}/part-*.parquet")
            dst = f"{tmp}/src/events-{i:03d}.parquet"
            os.rename(part, dst)
            t = time.time() + i * 10  # pin arrival order for the source
            os.utime(dst, (t, t))

        src = read_events_stream(
            spark, f"{tmp}/src", max_files_per_trigger=1
        )
        clicks = (
            src.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", horizon)
        )
        purchases = (
            src.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", horizon)
        )
        joined = (
            purchases.join(
                clicks,
                (F.col("user_id") == F.col("c_user"))
                & (F.col("click_ts") <= F.col("purchase_ts"))
                & (
                    F.col("click_ts")
                    >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
                ),
                "left_outer",
            )
            .select(
                "purchase_id", "user_id", "purchase_ts",
                "click_id", "click_ts",
            )
        )
        out = run_to_memory(joined, "append", spark)
        # Drop the heartbeat rows from the MATERIALIZED batch result,
        # never inside the streaming plan: a stream-side filter on
        # user_id pushes down through the join into both parquet scans
        # (the join key equates the two sides, so `user_id >= 0`
        # reaches the click leg too), which would kill the sentinels
        # at the scan before they ever advance a watermark — silently
        # reverting to the stuck-tail behavior the heartbeat exists to
        # fix.
        out = out.filter(F.col("user_id") >= 0)
        # materialize off the temp source before it is removed
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def tws_user_type_counts(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful streaming via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful successor to applyInPandasWithState,
    with TYPED per-key state primitives instead of one opaque tuple.

    Per user the processor keeps a MapState keyed by event_type whose
    value is (n_events, first_s, last_s) — state is O(distinct types)
    per key, bounded regardless of stream length, and the state-store
    layout is columnar per primitive (the RocksDB-backed design that
    makes huge keyspaces practical at 100 TB). Each micro-batch folds
    the key's rows into the map and emits the map snapshot; counts are
    monotone and first/last are min/max folds, so the post-sink
    collapse (max n, min first, max last) makes the result equal the
    batch aggregate under ANY batch split — the same progressive-
    emission contract as stateful_sessionize, now on the new API.

    All emitted measures are exact integers (counts + epoch seconds),
    so the batch-twin oracle matches bit-for-bit.

    Environment requirements (checked up front, fail loudly):
    transformWithState's Python state client speaks protobuf to the
    JVM state server — the ``protobuf`` package must be installed
    (ships with pyspark's declared requirements on real clusters; NOT
    present in this sandbox, so the functional test importorskips and
    this operator is an env-gated seam like the live-JDBC reads) —
    and the query must run on the RocksDB state-store provider, which
    this function configures on the session.
    """
    import importlib.util

    # find_spec("google.protobuf") raises if the parent namespace pkg
    # is absent entirely — probe the parent first.
    if (
        importlib.util.find_spec("google") is None
        or importlib.util.find_spec("google.protobuf") is None
    ):
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python state client speaks protobuf to the JVM state "
            "server); install protobuf or use the applyInPandasWithState "
            "operators (stateful_sessionize / running_user_totals)"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    class TypeCountsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts",
                "event_type string",
                "n long, first_s long, last_s long",
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for et, grp in pdf.groupby("event_type"):
                    secs = grp["ts"].map(lambda t: int(t.timestamp()))
                    lo, hi, n = int(secs.min()), int(secs.max()), len(grp)
                    if self._counts.containsKey((et,)):
                        pn, pf, pl = self._counts.getValue((et,))
                        n, lo, hi = pn + n, min(pf, lo), max(pl, hi)
                    self._counts.updateValue((et,), (n, lo, hi))
            snap = [
                (key[0], k[0], v[0], v[1], v[2])
                for k, v in self._counts.iterator()
            ]
            yield pd.DataFrame(
                snap,
                columns=[
                    "user_id", "event_type", "n_events",
                    "first_s", "last_s",
                ],
            )

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    out = (
        ev.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TypeCountsProcessor(),
            outputStructType=(
                "user_id long, event_type string, n_events long, "
                "first_s long, last_s long"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
    emitted = run_to_memory(out, "update", spark)
    return emitted.groupBy("user_id", "event_type").agg(
        F.max("n_events").alias("n_events"),
        F.min("first_s").alias("first_s"),
        F.max("last_s").alias("last_s"),
    )


def stateful_transition_counts(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful streaming twin of
    operators/analytics.py:transition_matrix — first-order Markov
    transition counts maintained over a LIVE event stream via
    applyInPandasWithState.

    State per user is O(1): just the type of the user's LAST seen
    event. Each micro-batch sorts its rows by (ts, event_id), emits one
    (from_type, to_type) pair per consecutive event — including the
    BOUNDARY pair that joins the stored last type to the batch's first
    event, which a stateless per-batch lead() would miss — and stores
    the new last type. Pairs are append-only and exact, so the final
    aggregate equals the batch operator on ANY batch split of the
    input. Arrival contract (same as stateful_sessionize): micro-
    batches are time-ordered per key — a pair fold cannot rewind for an
    event older than what it already consumed.

    Returns (from_type, to_type, n BIGINT, prob DOUBLE) exactly like
    the batch operator (marginals via a window over the pair-grain
    aggregate; prob one IEEE division of exact longs).
    """
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)

    def update(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        rows = [pdf[["ts", "event_id", "event_type"]] for pdf in pdfs]
        froms: list[str] = []
        tos: list[str] = []
        if rows:
            batch = pd.concat(rows).sort_values(["ts", "event_id"])
            for t in batch["event_type"]:
                if last is not None:
                    froms.append(last)
                    tos.append(t)
                last = t
        if last is not None:
            state.update((last,))
        yield pd.DataFrame({"from_type": froms, "to_type": tos})

    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="from_type string, to_type string",
            stateStructType="last_type string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    emitted = run_to_memory(pairs, "append", spark)
    counts = emitted.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    wm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(wm).cast("double")
        ).alias("prob"),
    )


def ohlc_stream(
    spark: SparkSession, sf_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Watermarked streaming OHLC bars per (event_type, tumbling
    window), run to completion.

    The batch formulation (operators/analytics.py:ohlc_bars) ranks with
    row_number — unavailable in a streaming aggregate — so open/close
    here are min_by/max_by over the (ts, event_id) struct total order:
    an incrementally-maintainable aggregate whose per-key state is one
    (key, value) pair, merged associatively across micro-batches. Both
    formulations pick the identical first/last row, which is what makes
    the batch OHLC SQL an exact oracle twin. low/high/volume are
    min/max/count — no float accumulation anywhere, so bars are
    bit-exact under any batch arrival order.
    """
    ev = read_events_stream(spark, sf_dir)
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.min_by("value", order_key).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", order_key).alias("close_v"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    out = run_to_memory(agg, "complete", spark)
    return out.select(
        F.col("window.start").cast("bigint").alias("bucket_s"),
        F.col("event_type").alias("bar_key"),
        "open_v", "high_v", "low_v", "close_v", "n_events",
    )


def stream_bloom_to_lake(
    streaming_df: DataFrame,
    key_col: str,
    path: str,
    checkpoint: str,
    m_bits: int = 4096,
    n_hashes: int = 2,
) -> None:
    """Streaming maintenance of a Bloom filter (the runtime pre-filter
    of operators/sketches.py:bloom_prefilter_audit): each micro-batch
    lands ITS OWN word table (bit_or within the batch) in a
    ``batch_id=<id>`` partition; the snapshot is merge-on-read bit_or
    (``read_bloom_snapshot``). Doubly replay-safe: the checkpointed
    offsets pin batch membership and a replay overwrites its own
    partition (the stream_aggregate_to_lake layout), AND — unlike the
    additive sums that sink protects — bit OR is IDEMPOTENT, so even a
    duplicated row inside an at-least-once source cannot corrupt the
    filter. State per batch is m/62 words regardless of key volume —
    the fixed-size-sketch property that makes this streamable at all.
    """
    from ..operators.sketches import bloom_build

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        words = bloom_build(batch_df, key_col, m_bits, n_hashes)
        words.write.mode("overwrite").parquet(
            f"{path}/batch_id={batch_id}"
        )

    q = (
        streaming_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_bloom_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Merge-on-read view of a ``stream_bloom_to_lake`` table: bit_or
    every batch partition's partial words into the current filter (one
    keyed re-OR over word-grain rows — m/62 x batches inputs, never
    raw keys)."""
    partials = spark.read.parquet(path)
    return partials.groupBy("word_idx").agg(
        F.bit_or("word_val").alias("word_val")
    )


def stateful_funnel(
    spark: SparkSession,
    sf_dir: str,
    stages: tuple[str, ...] = ("signup", "view", "click", "purchase"),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stateful streaming twin of the ordered product funnel
    (operators/analytics.py:_funnel_entries): per-user funnel progress
    maintained LIVE via applyInPandasWithState — the "which stage is
    this user on, right now" readout a batch funnel can only give
    after the fact.

    State per user is O(1): (furthest stage index, its entry epoch-µs).
    Each micro-batch replays its rows in (ts, event_id) order; an event
    advances the user exactly when it is the NEXT stage's type and
    strictly later than the stored entry time — the same ordered
    semantics as the batch chain, so the append-only stream of
    stage-reached rows equals the batch entry frames on ANY batch
    split of the input (first qualifying event in (ts, id) order IS
    the MIN-ts qualifier). Arrival contract as the other stateful
    operators: micro-batches time-ordered per key.

    Returns (user_id, stage_idx, stage, entry_us) — one row per user
    per stage reached; the full-oracle compare replays the batch
    chain in SQL.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    stage_list = list(stages)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            idx, entry = state.get
        else:
            idx, entry = -1, -1
        out_idx: list[int] = []
        out_stage: list[str] = []
        out_us: list[int] = []
        frames = [pdf[["ts", "event_id", "event_type"]] for pdf in pdfs]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, et in zip(batch["ts"], batch["event_type"]):
                if idx + 1 >= len(stage_list):
                    break
                us = int(pd.Timestamp(ts).value // 1000)
                if et == stage_list[idx + 1] and (idx < 0 or us > entry):
                    idx += 1
                    entry = us
                    out_idx.append(idx)
                    out_stage.append(stage_list[idx])
                    out_us.append(us)
        if idx >= 0:
            state.update((idx, entry))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_idx),
                "stage_idx": out_idx,
                "stage": out_stage,
                "entry_us": out_us,
            }
        )

    out = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, stage_idx int, stage string, entry_us long"
            ),
            stateStructType="stage_idx int, entry_us long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(out, "append", spark)


def stateful_value_changes(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Fourth applyInPandasWithState showcase: per-user CHANGED-VALUE
    detector (debounce) — emit a row only when a user's event_type
    differs from their previous event under the (ts, event_id) total
    order, carrying the previous type. The streaming form of CDC-style
    "state transitions only" compaction: a 100x-chattier upstream
    costs 100x less downstream when only transitions flow on.

    State per user is O(1): (last event_type, last epoch-µs, last id).
    Each micro-batch replays its rows in (ts, event_id) order and
    compares against the carried last value, so the emitted transition
    stream equals the batch LAG formulation on ANY batch split of the
    input (same arrival contract as the other stateful operators:
    micro-batches time-ordered per key). A user's very first event is
    a transition from NULL — emitted with prev_type NULL, exactly like
    LAG's leading NULL.

    Returns (user_id, ts_us, prev_type, new_type) append-only rows;
    the FULL oracle replays the LAG chain in SQL.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            last_type = state.get[0]
        else:
            last_type = None
        out_us: list[int] = []
        out_prev: list[str | None] = []
        out_new: list[str] = []
        frames = [pdf[["ts", "event_id", "event_type"]] for pdf in pdfs]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, et in zip(batch["ts"], batch["event_type"]):
                if et != last_type:
                    out_us.append(int(pd.Timestamp(ts).value // 1000))
                    out_prev.append(last_type)
                    out_new.append(et)
                    last_type = et
        if last_type is not None:
            state.update((last_type,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_new),
                "ts_us": out_us,
                "prev_type": out_prev,
                "new_type": out_new,
            }
        )

    out = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, ts_us long, prev_type string, "
                "new_type string"
            ),
            stateStructType="last_type string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(out, "append", spark)


def stateful_xmr_chart(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Fifth applyInPandasWithState showcase: a LIVE prequential XmR
    (individuals + moving range) control chart per event_type — the
    streaming form of orders_xmr_control_chart (queries/analytics.py).
    The batch entry draws GLOBAL limits over the whole series; a live
    SPC monitor cannot (future points are unknown), so the streaming
    convention is PREQUENTIAL: point t is judged against natural
    process limits xbar ± 2.66·MRbar derived from the prior t-1 points
    only — today's number never moves the limits that judge it. Points
    are emitted from t = 3 on (two priors = first defined MRbar).

    State per key is O(1) and EXACT: (n points, cent sum, n moving
    ranges, cent MR sum, last cents) — the DECIMAL(12,2)->cents cast
    happens Spark-side BEFORE the stateful op, so state arithmetic is
    pure integer. Each micro-batch replays its rows in (ts, event_id)
    order against the carried state, so the emitted rows equal the
    batch prefix-window formulation on ANY micro-batch split (same
    arrival contract as the other stateful operators). The only float
    work is at emission: two int->double divisions, one string-pinned
    2.66 multiply, one add/sub per limit — single IEEE ops in the same
    order as the oracle SQL, hence bit-identical (cent sums stay far
    below 2^53 at any realistic SF; the int->double conversions are
    exact).

    Returns (event_type, ts_us, seq, value, ucl, lcl, out_of_control)
    append-only rows.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    pts = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, sum_c, n_mr, sum_mr, last_c = state.get
        else:
            n, sum_c, n_mr, sum_mr, last_c = 0, 0, 0, 0, 0
        cols: dict = {
            "ts_us": [], "seq": [], "value": [],
            "ucl": [], "lcl": [], "out_of_control": [],
        }
        frames = [pdf[["ts", "event_id", "cents"]] for pdf in pdfs]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, c in zip(batch["ts"], batch["cents"]):
                c = int(c)
                if n >= 2:  # limits defined by >= 2 priors / >= 1 MR
                    xbar = sum_c / n / 100.0
                    mrbar = sum_mr / n_mr / 100.0
                    ucl = xbar + 2.66 * mrbar
                    lcl = xbar - 2.66 * mrbar
                    v = c / 100.0
                    cols["ts_us"].append(
                        int(pd.Timestamp(ts).value // 1000)
                    )
                    cols["seq"].append(n + 1)
                    cols["value"].append(v)
                    cols["ucl"].append(ucl)
                    cols["lcl"].append(lcl)
                    cols["out_of_control"].append(
                        bool(v > ucl or v < lcl)
                    )
                if n >= 1:
                    sum_mr += abs(c - last_c)
                    n_mr += 1
                sum_c += c
                n += 1
                last_c = c
        if n > 0:
            state.update((n, sum_c, n_mr, sum_mr, last_c))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(cols["seq"]),
                **cols,
            }
        )

    out = pts.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, ts_us long, seq long, value double, "
            "ucl double, lcl double, out_of_control boolean"
        ),
        stateStructType=(
            "n long, sum_c long, n_mr long, sum_mr long, last_c long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "append", spark)


def stateful_holt_monitor(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Sixth applyInPandasWithState showcase: a LIVE prequential Holt
    level+trend monitor per event_type — the streaming twin of
    orders_holt_forecast's smoother. Before each point is absorbed the
    operator emits the ONE-STEP-AHEAD forecast the prior state implied
    (l + b), the arriving value, and the prequential error — the
    forecast is always judged on data it has never seen, so the error
    stream is an honest live accuracy monitor (the same prequential
    convention as stateful_xmr_chart's limits).

    State per key is O(1): (level double, trend double, n long).
    Float state is safe here because the update order is pinned — each
    micro-batch replays its rows in (ts, event_id) order against the
    carried state, so the emitted doubles equal a single ordered fold
    over the whole series on ANY micro-batch split. Every update is
    the identical pinned-constant IEEE chain the DuckDB oracle runs
    (alpha = 0.2, beta = 0.1; the trend update reads only prior state:
    b' = 0.1*(0.2*(x - l) + 0.8*b) + 0.9*b), and the DECIMAL->cents
    cast happens Spark-side before the stateful op, so the value
    itself enters as exact-int-over-100.

    Returns (event_type, ts_us, seq, value, forecast, error)
    append-only rows from the second point per key on.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger)
    pts = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            lvl, trd, n = state.get
        else:
            lvl, trd, n = 0.0, 0.0, 0
        cols: dict = {
            "ts_us": [], "seq": [], "value": [], "forecast": [],
            "error": [],
        }
        frames = [pdf[["ts", "event_id", "cents"]] for pdf in pdfs]
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for ts, c in zip(batch["ts"], batch["cents"]):
                v = int(c) / 100.0
                if n == 0:
                    lvl, trd = v, 0.0
                else:
                    fc = lvl + trd
                    cols["ts_us"].append(
                        int(pd.Timestamp(ts).value // 1000)
                    )
                    cols["seq"].append(n + 1)
                    cols["value"].append(v)
                    cols["forecast"].append(fc)
                    cols["error"].append(v - fc)
                    nl = 0.2 * v + 0.8 * (lvl + trd)
                    nb = (
                        0.1 * (0.2 * (v - lvl) + 0.8 * trd) + 0.9 * trd
                    )
                    lvl, trd = nl, nb
                n += 1
        if n > 0:
            state.update((lvl, trd, n))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(cols["seq"]),
                **cols,
            }
        )

    out = pts.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, ts_us long, seq long, value double, "
            "forecast double, error double"
        ),
        stateStructType="level double, trend double, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, "append", spark)
