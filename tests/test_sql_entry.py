"""SQL entry point: same plan/results as the DataFrame formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.queries import CATALOG
from adventureworks_pysparkjobs_spark.sql import sql

from .conftest import SF_SMOKE


def test_sql_matches_dataframe_builder(spark):
    df_api = CATALOG["q1_pricing_summary"].builder(spark, SF_SMOKE)
    via_sql = sql(
        spark,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
        sf_dir=SF_SMOKE,
    )
    a = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in df_api.collect()
    }
    b = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in via_sql.collect()
    }
    assert a == b


def test_streaming_results_match_batch(spark):
    """The streaming tumbling-window query equals its batch twin."""
    stream = CATALOG["stream_tumbling_counts"].builder(spark, SF_SMOKE)
    batch = CATALOG["events_tumbling_5min"].builder(spark, SF_SMOKE)
    s = {
        (r["bucket_s"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in stream.collect()
    }
    b = {
        (r["bucket_s"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert s == b


def test_sliding_window_matches_batch_expansion(spark):
    """Streaming sliding windows (10 min window, 5 min slide) equal the
    batch formulation where each event is exploded into its two covering
    buckets."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import sliding_counts

    out = sliding_counts(spark, SF_SMOKE, window="10 minutes", slide="5 minutes")
    got = {
        (r["bucket_s"], r["event_type"]): r["n_events"] for r in out.collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    s = F.col("ts").cast("bigint")
    aligned = s - (s % 300)
    batch = (
        ev.select(
            F.explode(F.array(aligned - 300, aligned)).alias("bucket_s"),
            "event_type",
        )
        .groupBy("bucket_s", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    want = {
        (r["bucket_s"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    assert got == want


def test_foreach_batch_parquet_sink(spark, tmp_path):
    """foreachBatch streaming sink: the landed parquet equals the batch
    read of the same source."""
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        read_events_stream,
        stream_to_parquet,
    )

    out_dir = str(tmp_path / "landed")
    stream_to_parquet(
        read_events_stream(spark, SF_SMOKE),
        out_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    landed = spark.read.parquet(out_dir)
    batch = load_table(spark, SF_SMOKE, "events")
    assert landed.count() == batch.count()
    assert sorted(landed.columns) == sorted(batch.columns)
    got = {r["event_id"] for r in landed.select("event_id").collect()}
    want = {r["event_id"] for r in batch.select("event_id").collect()}
    assert got == want


def test_checkpoint_resume_processes_new_files_exactly_once(spark, tmp_path):
    """Exactly-once incremental processing: after a first bounded run,
    adding a new source file and re-running with the SAME checkpoint
    lands only the new rows — nothing reprocessed, nothing missed."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        read_events_stream,
        stream_to_parquet,
    )

    # Build an arrival-simulating source dir from the normalized fixture
    # (stream reader derives its schema from the files it finds, so any
    # ts encoding round-trips).
    raw = load_table(spark, SF_SMOKE, "events")
    half1 = raw.filter(F.col("event_id") % 2 == 0)
    half2 = raw.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    out_dir = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    half1.coalesce(1).write.parquet(str(tmp_path / "h1"))
    half2.coalesce(1).write.parquet(str(tmp_path / "h2"))
    src.mkdir()
    for f in (tmp_path / "h1").glob("part-*.parquet"):
        f.rename(src / "events-000.parquet")
    stream_to_parquet(read_events_stream(spark, str(src)), out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == half1.count()

    for f in (tmp_path / "h2").glob("part-*.parquet"):
        f.rename(src / "events-001.parquet")
    stream_to_parquet(read_events_stream(spark, str(src)), out_dir, ckpt)

    landed = spark.read.parquet(out_dir)
    assert landed.count() == raw.count()  # nothing duplicated or dropped
    got = sorted(r["event_id"] for r in landed.select("event_id").collect())
    want = sorted(r["event_id"] for r in raw.select("event_id").collect())
    assert got == want


def test_stream_upsert_sink_merges_updates_and_replays_idempotently(
    spark, tmp_path
):
    """foreachBatch keyed MERGE sink: a later file UPDATES rows already
    landed (latest ts wins), and a full replay with a fresh checkpoint
    leaves the table unchanged — the idempotence that makes the pattern
    exactly-once without a transactional table format."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        read_events_stream,
        stream_upsert_to_lake,
    )

    raw = load_table(spark, SF_SMOKE, "events")
    half1 = raw.filter(F.col("event_id") % 2 == 0)
    updates = (
        half1.filter(F.col("event_id") % 4 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 20 MINUTES"))
        .withColumn("value", F.lit(-1.0))
    )
    half2 = raw.filter(F.col("event_id") % 2 == 1).unionByName(updates)
    src = tmp_path / "src"
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def land(name: str, df) -> None:
        stage = tmp_path / f"stage-{name}"
        df.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(src / name)

    land("events-000.parquet", half1)
    stream_upsert_to_lake(
        read_events_stream(spark, str(src)), out,
        keys=["event_id"], order_by=["ts"], checkpoint=ckpt,
    )
    assert spark.read.parquet(out).count() == half1.count()

    land("events-001.parquet", half2)
    stream_upsert_to_lake(
        read_events_stream(spark, str(src)), out,
        keys=["event_id"], order_by=["ts"], checkpoint=ckpt,
    )

    def snapshot():
        landed = spark.read.parquet(out)
        assert landed.count() == raw.count()  # one row per key
        return {
            r["event_id"]: (r["ts"], r["value"])
            for r in landed.collect()
        }

    got = snapshot()

    # raw/updates come through load_table, so their ts is already the
    # normalized TimestampType the stream reader lands
    base = {r["event_id"]: (r["ts"], r["value"]) for r in raw.collect()}
    upd = {
        r["event_id"]: (r["ts"], r["value"]) for r in updates.collect()
    }
    assert got == {**base, **upd}  # updated keys carry the new ts/value

    # full replay, fresh checkpoint, same table: merge is idempotent
    stream_upsert_to_lake(
        read_events_stream(spark, str(src)), out,
        keys=["event_id"], order_by=["ts"],
        checkpoint=str(tmp_path / "ckpt2"),
    )
    assert snapshot() == got


def test_stream_static_join_enriched_counts(spark):
    """Stream-static broadcast join: cohort counts equal the batch
    left-join + groupBy on the bounded fixture."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        enriched_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 5).cast("string"))
    )
    out = enriched_counts(spark, SF_SMOKE, dim)
    got = {r["cohort"]: r["n_events"] for r in out.collect()}
    batch = (
        ev.join(dim, "user_id", "left")
        .groupBy("cohort")
        .agg(F.count("*").alias("n_events"))
    )
    want = {r["cohort"]: r["n_events"] for r in batch.collect()}
    assert got == want


def test_stateful_sessionize_matches_batch_gap_sessions(spark):
    """applyInPandasWithState sessionization equals the batch lag +
    cumulative-boundary-sum formulation (operators/relational.py) on the
    bounded fixture: same (user, start, end, count) session set."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.relational import sessionize
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_sessionize,
    )

    out = stateful_sessionize(spark, SF_SMOKE, gap_s=1800)
    got = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in out.collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        sessionize(ev, "user_id", "ts", gap_minutes=30, id_col="event_id")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.col("ts").cast("bigint")).alias("session_start_s"),
            F.max(F.col("ts").cast("bigint")).alias("session_end_s"),
            F.count("*").alias("n_events"),
        )
    )
    want = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in batch.collect()
    }
    assert got == want


def test_stateful_streaming_counts_match_batch(spark):
    """applyInPandasWithState running totals: event counts per user equal
    the batch groupBy on the bounded fixture."""
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        running_user_totals,
    )

    out = running_user_totals(spark, SF_SMOKE)
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = {r["user_id"]: r["count"] for r in batch}
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark):
    """The stream-stream clicks↔purchases interval join equals the same
    interval join run in batch over the bounded fixture."""
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stream_stream_attribution,
    )

    out = stream_stream_attribution(spark, SF_SMOKE, horizon="30 minutes")
    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes")),
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    got = sorted(map(tuple, out.collect()))
    exp = sorted(map(tuple, want.collect()))
    assert len(exp) > 0
    assert got == exp


def test_stateful_sessionize_multi_batch_no_duplicate_sessions(spark, tmp_path):
    """A session straddling micro-batch boundaries is emitted
    progressively (once per batch flush) but the operator's keep-max
    collapse returns each session exactly once with its final extent —
    equal to batch gap-sessionization regardless of the batch split."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.relational import sessionize
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_sessionize,
    )

    # Two source files split at the median TIMESTAMP (files land in time
    # order, as a real landing zone does) -> maxFilesPerTrigger=1 forces
    # two micro-batches, with any session straddling the cut emitted
    # progressively across both.
    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS BIGINT), 0.5) AS c"
    ).collect()[0]["c"]
    src = tmp_path / "src"
    src.mkdir()
    halves = (
        ev.filter(F.col("ts").cast("bigint") <= cut),
        ev.filter(F.col("ts").cast("bigint") > cut),
    )
    for i, half in enumerate(halves):
        stage = tmp_path / f"h{i}"
        half.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(src / f"events-{i:03d}.parquet")

    out = stateful_sessionize(spark, str(src), gap_s=1800, max_files_per_trigger=1)
    got = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in out.collect()
    }
    assert len(got) == out.count()  # one row per session, no duplicates
    batch = (
        sessionize(ev, "user_id", "ts", gap_minutes=30, id_col="event_id")
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.col("ts").cast("bigint")).alias("session_start_s"),
            F.max(F.col("ts").cast("bigint")).alias("session_end_s"),
            F.count("*").alias("n_events"),
        )
    )
    want = {
        (r["user_id"], r["session_start_s"], r["session_end_s"], r["n_events"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_aggregate_sink_incremental_and_replay_idempotent(
    spark, tmp_path
):
    """Additive-MV streaming sink (stream_aggregate_to_lake): partial
    aggregates land per batch partition; the merged snapshot equals a
    batch rebuild over all input; replaying a batch id with the same
    data overwrites its own partition instead of double-counting."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.relational import dec
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        _write_agg_partial,
        read_agg_snapshot,
        read_events_stream,
        stream_aggregate_to_lake,
    )

    raw = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", dec("value", 12, 2).alias("value")
    )
    half1 = raw.filter(F.col("event_id") % 2 == 0)
    half2 = raw.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    out = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    half1.coalesce(1).write.parquet(str(tmp_path / "h1"))
    half2.coalesce(1).write.parquet(str(tmp_path / "h2"))
    src.mkdir()
    for f in (tmp_path / "h1").glob("part-*.parquet"):
        f.rename(src / "events-000.parquet")

    def run():
        stream = (
            read_events_stream(spark, str(src))
            .select("event_type", dec("value", 12, 2).alias("value"))
        )
        stream_aggregate_to_lake(
            stream, out, ["event_type"], ["value"], ckpt
        )

    def snap():
        return {
            r["event_type"]: r["value"]
            for r in read_agg_snapshot(
                spark, out, ["event_type"], ["value"]
            ).collect()
        }

    run()
    want_h1 = {
        r["event_type"]: r["value"]
        for r in half1.groupBy("event_type")
        .agg(F.sum("value").alias("value"))
        .collect()
    }
    assert snap() == want_h1

    # second arrival: only the new file lands, totals now cover all rows
    for f in (tmp_path / "h2").glob("part-*.parquet"):
        f.rename(src / "events-001.parquet")
    run()
    want_all = {
        r["event_type"]: r["value"]
        for r in raw.groupBy("event_type")
        .agg(F.sum("value").alias("value"))
        .collect()
    }
    assert snap() == want_all

    # replay batch 0's data under its original batch id: the partition
    # overwrites itself — totals unchanged (no double counting)
    _write_agg_partial(half1, 0, out, ["event_type"], ["value"])
    assert snap() == want_all


def test_stateful_transition_counts_multi_batch_boundary_pairs(
    spark, tmp_path
):
    """The pair joining a user's last event of batch k to their first
    event of batch k+1 exists ONLY in stored state — a stateless
    per-batch lead() would drop it. Split the fixture at the median
    timestamp, force two micro-batches, and require exact equality
    with the batch transition matrix."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.analytics import (
        transition_matrix,
    )
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_transition_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS BIGINT), 0.5) AS c"
    ).collect()[0]["c"]
    src = tmp_path / "src"
    src.mkdir()
    halves = (
        ev.filter(F.col("ts").cast("bigint") <= cut),
        ev.filter(F.col("ts").cast("bigint") > cut),
    )
    for i, half in enumerate(halves):
        stage = tmp_path / f"h{i}"
        half.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(
            src / f"events-{i:03d}.parquet"
        )

    streamed = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in stateful_transition_counts(
            spark, str(src), max_files_per_trigger=1
        ).collect()
    }
    batch = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in transition_matrix(ev).collect()
    }
    assert streamed == batch


def test_stateful_funnel_two_batch_split_equals_batch(spark, tmp_path):
    """The streaming funnel's append-only stage rows equal the batch
    funnel entry frames even when the input is split into time-ordered
    micro-batches (the cross-batch advance the per-batch chain would
    miss is carried in state)."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.analytics import (
        _funnel_entries,
    )
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_funnel,
    )

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS BIGINT), 0.5) AS c"
    ).collect()[0]["c"]
    src = tmp_path / "src"
    src.mkdir()
    halves = (
        ev.filter(F.col("ts").cast("bigint") <= cut),
        ev.filter(F.col("ts").cast("bigint") > cut),
    )
    for i, half in enumerate(halves):
        stage = tmp_path / f"h{i}"
        half.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(
            src / f"events-{i:03d}.parquet"
        )

    stages = ("signup", "view", "click", "purchase")
    streamed = {
        (r["user_id"], r["stage_idx"], r["stage"], r["entry_us"])
        for r in stateful_funnel(
            spark, str(src), stages=stages, max_files_per_trigger=1
        ).collect()
    }
    batch = set()
    for idx, frame in enumerate(
        _funnel_entries(ev, "user_id", "ts", "event_type", stages)
    ):
        for r in frame.select(
            "u", F.unix_micros("entry_ts").alias("us")
        ).collect():
            batch.add((r["u"], idx, stages[idx], r["us"]))
    assert streamed == batch


def test_stateful_value_changes_two_batch_split_equals_lag(spark, tmp_path):
    """The streaming changed-value detector's transition rows equal the
    batch LAG formulation even when the input is split into
    time-ordered micro-batches: the cross-batch comparison the
    per-batch sort would miss is carried in the (last_type) state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_value_changes,
    )

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS BIGINT), 0.5) AS c"
    ).collect()[0]["c"]
    src = tmp_path / "src"
    src.mkdir()
    halves = (
        ev.filter(F.col("ts").cast("bigint") <= cut),
        ev.filter(F.col("ts").cast("bigint") > cut),
    )
    for i, half in enumerate(halves):
        stage = tmp_path / f"h{i}"
        half.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(
            src / f"events-{i:03d}.parquet"
        )

    streamed = {
        (r["user_id"], r["ts_us"], r["prev_type"], r["new_type"])
        for r in stateful_value_changes(
            spark, str(src), max_files_per_trigger=1
        ).collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = {
        (r["user_id"], r["ts_us"], r["prev_type"], r["new_type"])
        for r in ev.select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("new_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("new_type"))
        )
        .collect()
    }
    assert streamed == batch


def test_stateful_xmr_two_batch_split_equals_prefix_windows(
    spark, tmp_path
):
    """The streaming prequential XmR chart's rows equal the batch
    prefix-window formulation even when the input is split into
    time-ordered micro-batches: the cross-batch carry (point count,
    exact cent sums, last value) lives in GroupState. Floats compare
    EXACTLY — both sides perform the same single IEEE ops on the same
    exact integer state."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_xmr_chart,
    )

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS BIGINT), 0.5) AS c"
    ).collect()[0]["c"]
    src = tmp_path / "src"
    src.mkdir()
    halves = (
        ev.filter(F.col("ts").cast("bigint") <= cut),
        ev.filter(F.col("ts").cast("bigint") > cut),
    )
    for i, half in enumerate(halves):
        stage = tmp_path / f"h{i}"
        half.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(
            src / f"events-{i:03d}.parquet"
        )

    streamed = {
        tuple(r)
        for r in stateful_xmr_chart(
            spark, str(src), max_files_per_trigger=1
        ).collect()
    }

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wprior = w.rowsBetween(Window.unboundedPreceding, -1)
    v = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("c"),
    )
    s = v.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "c",
        F.row_number().over(w).cast("long").alias("seq"),
        F.sum("c").over(wprior).cast("long").alias("sum_prior"),
        F.count("c").over(wprior).alias("n_prior"),
        F.abs(F.col("c") - F.lag("c").over(w)).alias("mr"),
    )
    w2 = Window.partitionBy("event_type").orderBy("seq")
    w2prior = w2.rowsBetween(Window.unboundedPreceding, -1)
    m = s.select(
        "event_type",
        "ts_us",
        "c",
        "seq",
        "sum_prior",
        "n_prior",
        F.sum("mr").over(w2prior).cast("long").alias("sum_mr_prior"),
        F.count("mr").over(w2prior).alias("n_mr_prior"),
    ).filter(F.col("seq") >= 3)
    xbar = F.col("sum_prior").cast("double") / F.col("n_prior") / F.lit(100)
    mrbar = (
        F.col("sum_mr_prior").cast("double")
        / F.col("n_mr_prior")
        / F.lit(100)
    )
    val = F.col("c").cast("double") / F.lit(100)
    ucl = xbar + F.lit(2.66) * mrbar
    lcl = xbar - F.lit(2.66) * mrbar
    batch = {
        tuple(r)
        for r in m.select(
            "event_type",
            "ts_us",
            "seq",
            val.alias("value"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            ((val > ucl) | (val < lcl)).alias("out_of_control"),
        ).collect()
    }
    assert streamed == batch


def test_stateful_holt_two_batch_split_equals_single_fold(
    spark, tmp_path
):
    """The streaming prequential Holt monitor's rows equal a single
    ordered pure-Python fold over the whole series even when the
    input arrives as two time-ordered micro-batches: the cross-batch
    carry (level, trend, count) lives in GroupState as doubles, and
    every update is the same pinned-constant IEEE chain. Floats
    compare EXACTLY."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from adventureworks_pysparkjobs_spark.streaming.events import (
        stateful_holt_monitor,
    )

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.selectExpr(
        "percentile_approx(CAST(ts AS BIGINT), 0.5) AS c"
    ).collect()[0]["c"]
    src = tmp_path / "src"
    src.mkdir()
    halves = (
        ev.filter(F.col("ts").cast("bigint") <= cut),
        ev.filter(F.col("ts").cast("bigint") > cut),
    )
    for i, half in enumerate(halves):
        stage = tmp_path / f"h{i}"
        half.coalesce(1).write.parquet(str(stage))
        next(stage.glob("part-*.parquet")).rename(
            src / f"events-{i:03d}.parquet"
        )

    streamed = {
        tuple(r)
        for r in stateful_holt_monitor(
            spark, str(src), max_files_per_trigger=1
        ).collect()
    }

    # pure-Python single fold over the fully-ordered series
    import decimal

    rows = sorted(
        ev.select("event_type", "ts", "event_id", "value").collect(),
        key=lambda r: (r["event_type"], r["ts"], r["event_id"]),
    )
    state: dict = {}
    expected = set()
    for r in rows:
        cents = int(
            decimal.Decimal(str(r["value"])).quantize(
                decimal.Decimal("0.01"),
                rounding=decimal.ROUND_HALF_UP,
            )
            * 100
        )
        v = cents / 100.0
        lvl, trd, n = state.get(r["event_type"], (0.0, 0.0, 0))
        if n == 0:
            lvl, trd = v, 0.0
        else:
            fc = lvl + trd
            import pandas as pd

            ts_us = int(pd.Timestamp(r["ts"]).value // 1000)
            expected.add(
                (r["event_type"], ts_us, n + 1, v, fc, v - fc)
            )
            nl = 0.2 * v + 0.8 * (lvl + trd)
            nb = 0.1 * (0.2 * (v - lvl) + 0.8 * trd) + 0.9 * trd
            lvl, trd = nl, nb
        state[r["event_type"]] = (lvl, trd, n + 1)

    assert streamed == expected
