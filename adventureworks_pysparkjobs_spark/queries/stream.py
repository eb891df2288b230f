"""Structured Streaming catalog entries (SURVEY.md §2.8).

Each builder runs a real streaming query (readStream → watermark →
stateful op → memory sink, availableNow trigger) to completion and returns
the materialized result, so the driver's oracle harness can compare a
*streaming* computation against batch SQL. The oracles are exact twins:
on a bounded input, complete-mode windowed aggregation ≡ batch GROUP BY,
and streaming keyed dedup's key set ≡ SELECT DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.events import dedup_keys, session_windows, tumbling_counts
from .catalog import query


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 300 * 300 AS bucket_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "watermark"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked tumbling-window aggregate (5-minute windows),
    driven to completion on the bounded fixture."""
    return tumbling_counts(spark, sf_dir, window="5 minutes")


@query(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup", "watermark"),
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed dedup (dropDuplicates under a watermark); the
    deterministic contract is the distinct key set."""
    return dedup_keys(spark, sf_dir)


@query(
    "stream_session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) >= 1800 * 1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_seq
      FROM marked
    )
    SELECT user_id,
           CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_seq
    """,
    tags=("streaming", "session_window", "watermark"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming session windows (30-minute gap). Oracle: batch
    gap-sessionization in exact microsecond arithmetic — a session_window
    merges events whose gap is strictly less than the 30-minute gap."""
    return session_windows(spark, sf_dir, gap="30 minutes")


@query(
    "stream_stateful_user_totals",
    oracle=None,  # float accumulation order in pandas sum() is batch-internal;
    # the exact-count contract is asserted in tests/test_sql_entry.py
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals held in explicit GroupState. Rows-only in the oracle harness
    (pandas' pairwise float summation differs from SQL sum in the last
    ulp); count parity with batch is tested separately."""
    from ..streaming.events import running_user_totals

    return running_user_totals(spark, sf_dir)


@query(
    "stream_agg_mv_snapshot",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    tags=("streaming", "foreachBatch", "materialized-view", "incremental"),
)
def stream_agg_mv_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming additive-MV maintenance end-to-end
    (streaming/events.py stream_aggregate_to_lake): the bounded events
    stream lands per-batch PARTIAL aggregates in replay-idempotent
    batch_id partitions, then the merge-on-read snapshot
    (read_agg_snapshot — one keyed re-sum over group-grain rows) must
    equal the batch rebuild the oracle computes. Decimal partials make
    the two-level summation exact in any batch split."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.relational import dec
    from ..streaming.events import (
        read_agg_snapshot,
        read_events_stream,
        stream_aggregate_to_lake,
    )

    tmp = tempfile.mkdtemp(prefix="stream_agg_mv_")
    try:
        stream = read_events_stream(spark, sf_dir).select(
            "event_type",
            dec("value", 12, 2).alias("total_value"),
            F.lit(1).cast("bigint").alias("n_events"),
        )
        stream_aggregate_to_lake(
            stream,
            f"{tmp}/mv",
            ["event_type"],
            ["total_value", "n_events"],
            f"{tmp}/ckpt",
        )
        snap = read_agg_snapshot(
            spark, f"{tmp}/mv", ["event_type"], ["total_value", "n_events"]
        ).select(
            "event_type",
            F.col("total_value").cast("double").alias("total_value"),
            "n_events",
        )
        # materialize off the temp dir before it is removed
        out = spark.createDataFrame(snap.collect(), snap.schema)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_click_attribution_outer",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events p
    LEFT JOIN events c ON c.user_id = p.user_id
                      AND c.event_type = 'click'
                      AND c.ts <= p.ts
                      AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase'
    """,
    tags=("streaming", "stream-stream", "outer-join", "watermark"),
)
def stream_click_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join
    (streaming/events.py stream_stream_attribution_outer): purchases
    with their preceding-30-minute clicks plus null-extended rows for
    cold purchases, flushed at end-of-stream by a watermark-heartbeat
    sentinel. On the bounded fixture the append-mode run equals the
    batch left interval join — the SQL oracle."""
    from ..streaming.events import stream_stream_attribution_outer

    return stream_stream_attribution_outer(spark, sf_dir, horizon="30 minutes")


@query(
    "stream_heavy_users_cms",
    oracle="""
    WITH hs AS (SELECT unnest([0, 1, 2, 3]) AS h),
    grid AS (
      SELECT hs.h,
             CAST('0x' || substr(md5(CAST(hs.h AS VARCHAR) || '|'
                                     || CAST(e.user_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % 1024 AS bucket,
             COUNT(*) AS c
      FROM events e, hs GROUP BY 1, 2
    ),
    cand AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id LIMIT 20
    ),
    probes AS (
      SELECT c.user_id, c.exact_n, hs.h,
             CAST('0x' || substr(md5(CAST(hs.h AS VARCHAR) || '|'
                                     || CAST(c.user_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % 1024 AS bucket
      FROM cand c, hs
    )
    SELECT p.user_id, p.exact_n,
           CAST(MIN(COALESCE(g.c, 0)) AS BIGINT) AS cms_n,
           MIN(COALESCE(g.c, 0)) >= p.exact_n AS no_underestimate
    FROM probes p LEFT JOIN grid g ON g.h = p.h AND g.bucket = p.bucket
    GROUP BY p.user_id, p.exact_n
    """,
    tags=("streaming", "sketch", "count-min", "foreachBatch",
          "incremental"),
)
def stream_heavy_users_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of a count-min sketch: the bounded events
    stream expands to CMS cells (operators/sketches.py:cms_pairs) and
    the additive-MV sink (stream_aggregate_to_lake) lands per-batch
    partial grids in replay-idempotent batch_id partitions — a CMS grid
    is an additive aggregate on (h, bucket), so the exactly-once
    machinery of stream_agg_mv_snapshot maintains it unchanged. The
    merge-on-read grid then point-estimates the top-20 users, checked
    against exact counts (cms_estimate's no-underestimate guarantee).

    The 100 TB shape: the streamed state is the FIXED-SIZE grid
    (depth·width cells per batch partition), not per-user counters —
    heavy-hitter tracking whose state cannot grow with user
    cardinality. Estimation never rescans events."""
    import shutil
    import tempfile

    from ..operators.sketches import cms_estimate, cms_pairs
    from ..sources.corpus import load_table
    from ..streaming.events import (
        read_agg_snapshot,
        read_events_stream,
        stream_aggregate_to_lake,
    )

    tmp = tempfile.mkdtemp(prefix="stream_cms_")
    try:
        cells = cms_pairs(
            read_events_stream(spark, sf_dir), "user_id",
            depth=4, width=1024,
        )
        stream_aggregate_to_lake(
            cells, f"{tmp}/grid", ["h", "bucket"], ["c"], f"{tmp}/ckpt"
        )
        grid = read_agg_snapshot(
            spark, f"{tmp}/grid", ["h", "bucket"], ["c"]
        )
        events = load_table(spark, sf_dir, "events")
        cand = (
            events.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
            .orderBy(F.col("exact_n").desc(), F.col("user_id"))
            .limit(20)
        )
        est = cms_estimate(
            grid, cand.select("user_id"), "user_id", depth=4, width=1024
        )
        out = cand.join(est, "user_id").select(
            "user_id",
            "exact_n",
            F.col("cms_count").cast("long").alias("cms_n"),
            (F.col("cms_count") >= F.col("exact_n")).alias(
                "no_underestimate"
            ),
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT event_type AS bar_key,
             CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT)
               AS bucket_s,
             value AS v,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT bucket_s, bar_key,
           MAX(CASE WHEN rn_a = 1 THEN v END) AS open_v,
           MAX(v) AS high_v,
           MIN(v) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN v END) AS close_v,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked GROUP BY 1, 2
    """,
    tags=("streaming", "window", "ohlc", "watermark"),
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hourly OHLC bars: open/close via min_by/max_by over
    the (ts, event_id) struct total order — the incrementally-
    maintainable reformulation of the batch row_number ranking, with
    one (key, value) pair of state per bar and side. The batch OHLC
    SQL is an exact twin, so the full bar values are hash-checked."""
    from ..streaming.events import ohlc_stream

    return ohlc_stream(spark, sf_dir)


@query(
    "stream_bloom_filter_build",
    oracle="""
    WITH pos AS (
      SELECT (CAST('0x' || substr(md5('bl0|' || CAST(user_id AS VARCHAR)),
                   1, 8) AS BIGINT) % 4096) AS p
      FROM events
      UNION ALL
      SELECT (CAST('0x' || substr(md5('bl1|' || CAST(user_id AS VARCHAR)),
                   1, 8) AS BIGINT) % 4096)
      FROM events)
    SELECT p // 62 AS word_idx,
           CAST(bit_or(CAST(1 AS BIGINT)
                       << CAST(p % 62 AS INTEGER)) AS BIGINT) AS word_val
    FROM pos GROUP BY 1
    """,
    tags=("streaming", "sketch", "bloom", "foreachBatch", "incremental"),
)
def stream_bloom_filter_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom-filter maintenance
    (streaming/events.py:stream_bloom_to_lake): the bounded events
    stream builds per-micro-batch word tables (bit_or within batch,
    exactly-once batch_id partitions) and the merge-on-read snapshot
    re-ORs them into the live filter — 67 words of state per batch at
    ANY event volume. The final word table is batching-invariant
    (bit OR is associative, commutative AND idempotent — even
    at-least-once duplicates cannot corrupt it), so the streamed
    result carries a FULL oracle: DuckDB rebuilds the identical filter
    from the same events in one pass."""
    import shutil
    import tempfile

    from ..streaming.events import (
        read_bloom_snapshot,
        read_events_stream,
        stream_bloom_to_lake,
    )

    tmp = tempfile.mkdtemp(prefix="stream_bloom_")
    try:
        ev = read_events_stream(spark, sf_dir).select("user_id")
        stream_bloom_to_lake(
            ev, "user_id", f"{tmp}/bloom", f"{tmp}/ckpt",
            m_bits=4096, n_hashes=2,
        )
        words = read_bloom_snapshot(spark, f"{tmp}/bloom")
        return spark.createDataFrame(words.collect(), words.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_user_state_changes",
    oracle="""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT user_id, ts_us, prev_type, event_type AS new_type
    FROM ordered
    WHERE prev_type IS NULL OR prev_type <> event_type
    """,
    tags=("streaming", "stateful", "cdc", "debounce",
          "applyInPandasWithState"),
)
def stream_user_state_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth custom stateful streaming operator
    (streaming/events.py:stateful_value_changes) WITH a full SQL
    oracle: per-user changed-value detection (emit only event_type
    TRANSITIONS under the (ts, event_id) order, first event = a
    transition from NULL) — the streaming compaction that turns a
    chatty upstream into a state-transition log. O(1) state (last
    type); the append-only output equals the batch LAG formulation on
    any micro-batch split, which is exactly what the oracle
    asserts."""
    from ..streaming.events import stateful_value_changes

    return stateful_value_changes(spark, sf_dir)


@query(
    "stream_xmr_control_chart",
    oracle="""
    WITH v AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM events
    ),
    s AS (
      SELECT event_type, ts, c,
             ROW_NUMBER() OVER w AS seq,
             CAST(SUM(c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS BIGINT) AS sum_prior,
             COUNT(c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS n_prior,
             abs(c - LAG(c) OVER w) AS mr
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    m AS (
      SELECT event_type, ts, c, seq, sum_prior, n_prior,
             CAST(SUM(mr) OVER (w2 ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS BIGINT)
               AS sum_mr_prior,
             COUNT(mr) OVER (w2 ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS n_mr_prior
      FROM s
      WINDOW w2 AS (PARTITION BY event_type ORDER BY seq)
    ),
    lim AS (
      SELECT event_type, epoch_us(ts) AS ts_us,
             CAST(seq AS BIGINT) AS seq,
             CAST(c AS DOUBLE) / 100 AS value,
             CAST(sum_prior AS DOUBLE) / n_prior / 100
               + CAST('2.66' AS DOUBLE)
                 * (CAST(sum_mr_prior AS DOUBLE) / n_mr_prior / 100)
               AS ucl,
             CAST(sum_prior AS DOUBLE) / n_prior / 100
               - CAST('2.66' AS DOUBLE)
                 * (CAST(sum_mr_prior AS DOUBLE) / n_mr_prior / 100)
               AS lcl
      FROM m WHERE seq >= 3
    )
    SELECT event_type, ts_us, seq, value, ucl, lcl,
           (value > ucl OR value < lcl) AS out_of_control
    FROM lim
    """,
    tags=("streaming", "stateful", "xmr", "spc", "control-chart",
          "applyInPandasWithState"),
    bench=True,  # frozen headline set v2 (r11)
)
def stream_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth custom stateful streaming operator
    (streaming/events.py:stateful_xmr_chart) WITH a full independent
    SQL oracle: the LIVE prequential twin of orders_xmr_control_chart —
    per-event_type XmR individuals chart where every point is judged
    against xbar ± 2.66·MRbar limits from the PRIOR points only, state
    held in exact integer cents. Prequential limits (unlike the batch
    entry's global ones) are prefix-window-expressible, so the oracle
    is a hand-derived DuckDB formulation rather than a wraps-twin —
    the append-only output equals it on any micro-batch split."""
    from ..streaming.events import stateful_xmr_chart

    return stateful_xmr_chart(spark, sf_dir)


@query(
    "stream_holt_level_monitor",
    oracle="""
    WITH v AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM events
    ),
    arr AS (
      SELECT event_type,
             list([CAST(epoch_us(ts) AS DOUBLE), CAST(c AS DOUBLE)]
                  ORDER BY ts, event_id) AS evs
      FROM v GROUP BY 1
    ),
    folded AS (
      SELECT event_type,
             list_reduce(
               list_concat(
                 [[evs[1][2] / CAST('100' AS DOUBLE),
                   CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)]],
                 evs[2:]),
               (acc, x) -> list_concat(
                 list_concat(
                   [CAST('0.2' AS DOUBLE)
                      * (x[2] / CAST('100' AS DOUBLE))
                    + CAST('0.8' AS DOUBLE) * (acc[1] + acc[2]),
                    CAST('0.1' AS DOUBLE)
                      * (CAST('0.2' AS DOUBLE)
                         * (x[2] / CAST('100' AS DOUBLE) - acc[1])
                         + CAST('0.8' AS DOUBLE) * acc[2])
                    + CAST('0.9' AS DOUBLE) * acc[2],
                    acc[3] + CAST(1 AS DOUBLE)],
                   acc[4:]),
                 [x[1], acc[3] + CAST(1 AS DOUBLE),
                  x[2] / CAST('100' AS DOUBLE), acc[1] + acc[2]])
             ) AS st
      FROM arr
    ),
    em AS (
      SELECT event_type, st,
             CAST((len(st) - 3) // 4 AS INTEGER) AS n_emit
      FROM folded
    )
    SELECT event_type,
           CAST(st[4 + 4 * CAST(k AS INTEGER)] AS BIGINT) AS ts_us,
           CAST(st[5 + 4 * CAST(k AS INTEGER)] AS BIGINT) AS seq,
           st[6 + 4 * CAST(k AS INTEGER)] AS value,
           st[7 + 4 * CAST(k AS INTEGER)] AS forecast,
           st[6 + 4 * CAST(k AS INTEGER)]
             - st[7 + 4 * CAST(k AS INTEGER)] AS error
    FROM em, unnest(range(0, n_emit)) AS u(k)
    """,
    tags=("streaming", "stateful", "holt", "forecast", "prequential",
          "applyInPandasWithState"),
)
def stream_holt_level_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sixth custom stateful streaming operator
    (streaming/events.py:stateful_holt_monitor) WITH a fully
    independent SQL oracle — the second stream entry after
    stream_xmr_control_chart whose oracle is a hand-derived
    formulation rather than a batch-twin wrap: a live prequential Holt
    level+trend monitor per event_type, emitting each point's
    one-step-ahead forecast (from the prior state only), the arriving
    value, and the prequential error. The oracle replays the exact
    smoother with a GROWING alias-free DOUBLE-LIST accumulator (three
    state slots + four appended slots per emission, unnested by index
    arithmetic afterward) — the nonlinear recursion is not
    prefix-window-expressible, so the emission-accumulating fold is
    what makes an independent oracle possible at all. Floats compare
    EXACTLY: both sides run the identical pinned-constant IEEE chain
    on exact cents-over-100 inputs in (ts, event_id) order, and the
    two-batch-split test asserts the micro-batch carry reproduces the
    single fold bit-for-bit."""
    from ..streaming.events import stateful_holt_monitor

    return stateful_holt_monitor(spark, sf_dir)
