"""Event-stream queries in batch form (SURVEY.md §2.8/§2.10): JSON props
extraction (path + map forms), time bucketing, sessionization, as-of
attribution (window + generic operator forms), keyed dedup.

Timestamp arithmetic rule: Spark ``CAST(timestamp AS BIGINT)`` floors to
seconds; DuckDB ``epoch()`` returns fractional seconds — the oracles use
``CAST(FLOOR(epoch(ts)) AS BIGINT)`` to match exactly. Decimal value sums
convert to DOUBLE at output (queries/catalog.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import dedup_keep_first
from ..operators.relational import dec, sessionize
from ..sources.corpus import load_table
from .catalog import query

D = "DECIMAL(12,2)"
_FLOOR_S = "CAST(FLOOR(epoch({c})) AS BIGINT)"


@query(
    "events_semistructured",
    oracle=f"""
    SELECT 'by_event_type' AS kind, event_type AS key,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_v,
           CAST(NULL AS INTEGER) AS min_v,
           CAST(NULL AS INTEGER) AS max_v,
           CAST(SUM(CAST(value AS {D})) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'by_prop_key' AS kind, k AS key,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
                AS BIGINT) AS sum_v,
           CAST(MIN(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
                AS INTEGER) AS min_v,
           CAST(MAX(CAST(json_extract_string(props, '$.' || k) AS INTEGER))
                AS INTEGER) AS max_v,
           CAST(NULL AS DOUBLE) AS total_value
    FROM events, unnest(json_keys(props)) AS t(k)
    GROUP BY k
    """,
    tags=("json", "semistructured", "map", "explode", "agg"),
)
def events_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props, both schema-on-read paths in one tagged
    union: fixed-path extraction (get_json_object — stays JVM-side) per
    event type, and the open-key-set path (from_json → MapType → explode
    to (key, value) rows) aggregated per property key."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    by_type = ev.groupBy("event_type").agg(
        F.count(k).alias("n"),
        F.sum(k).alias("sum_v"),
        F.min(F.lit(None).cast("int")).alias("min_v"),
        F.max(F.lit(None).cast("int")).alias("max_v"),
        F.sum(dec("value", 12, 2)).cast("double").alias("total_value"),
    ).select(
        F.lit("by_event_type").alias("kind"),
        F.col("event_type").alias("key"),
        "n", "sum_v", "min_v", "max_v", "total_value",
    )
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("k", "v")
    )
    by_key = kv.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.max(F.lit(None).cast("double")).alias("total_value"),
    ).select(
        F.lit("by_prop_key").alias("kind"),
        F.col("k").alias("key"),
        "n", "sum_v", "min_v", "max_v", "total_value",
    )
    return by_type.unionByName(by_key)


@query(
    "events_tumbling_5min",
    oracle=f"""
    SELECT CAST({_FLOOR_S.format(c='ts')} // 300 * 300 AS BIGINT) AS bucket_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {D})) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "timebucket", "agg"),
)
def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling 5-minute buckets (epoch-aligned, the same bucketing
    Structured Streaming's window() uses — see queries/stream.py for the
    streaming twin of this query)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.col("ts").cast("bigint") - (F.col("ts").cast("bigint") % 300)).alias(
        "bucket_s"
    )
    return ev.groupBy(bucket, "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(dec("value", 12, 2)).cast("double").alias("total_value"),
    )


@query(
    "events_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR {_FLOOR_S.format(c='ts')} - {_FLOOR_S.format(c='prev_ts')} > 1800
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST({_FLOOR_S.format(c='MAX(ts)')} - {_FLOOR_S.format(c='MIN(ts)')}
                AS BIGINT) AS duration_s
    FROM sessions GROUP BY user_id, session_seq
    """,
    tags=("sessionize", "window", "agg"),
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag + cumulative
    boundary sum (operators/relational.py:sessionize), then session-level
    rollup. One shuffle on user_id serves both windows and the final agg."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30, id_col="event_id")
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max("ts").cast("bigint") - F.min("ts").cast("bigint")).alias(
            "duration_s"
        ),
    )


@query(
    "events_asof_attribution",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
    clicks AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    g AS (
      SELECT p.event_id, p.user_id, p.ts,
             MAX(c.ts) AS last_click_ts,
             arg_max(c.event_id, c.ts) AS asof_click_id
      FROM purchases p
      LEFT JOIN clicks c ON c.user_id = p.user_id AND c.ts < p.ts
      GROUP BY p.event_id, p.user_id, p.ts
    )
    SELECT event_id, user_id, ts, last_click_ts, asof_click_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT)
             - CAST(FLOOR(epoch(last_click_ts)) AS BIGINT) AS click_to_buy_s
    FROM g
    """,
    tags=("asof", "window", "join", "attribution"),
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, BOTH engine formulations in one checked result: for
    every purchase, the most recent strictly-prior click by the same user
    (last-touch attribution).

    - the single-table window formulation (last ignorenulls over an
      unbounded-preceding frame — one shuffle on user_id) produces
      ``last_click_ts`` / ``click_to_buy_s``;
    - the generic two-table operator (operators/asof.py: union-tag +
      window, reusable over any (left, right, key, ts) pair) produces
      ``asof_click_id``.

    Joining them on the purchase PK asserts the two implementations agree
    row-for-row, and the oracle checks both against SQL.
    """
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    attr = (
        ev.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_click_ts",
            (
                F.col("ts").cast("bigint") - F.col("last_click_ts").cast("bigint")
            ).alias("click_to_buy_s"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    gen = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        strict=True,
    ).select("event_id", F.col("event_id_asof").alias("asof_click_id"))
    return attr.join(gen, "event_id").select(
        "event_id", "user_id", "ts", "last_click_ts", "asof_click_id",
        "click_to_buy_s",
    )


@query(
    "events_dedup_first_per_key",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup", "keyed", "window"),
)
def events_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the deterministic first row per (user, type) —
    dropDuplicates with a pinned survivor instead of an arbitrary one."""
    ev = load_table(spark, sf_dir, "events")
    return dedup_keep_first(
        ev, ["user_id", "event_type"], ["ts", "event_id"]
    ).select("event_id", "user_id", "event_type", "ts")


@query(
    "events_variant_shredding",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"et":"' || event_type || '","id":' || event_id
               || ',"props":' || props || '}' AS doc
      FROM events
    ),
    x AS (
      SELECT event_id,
             json_extract_string(doc, '$.et') AS et,
             CAST(json_extract(doc, '$.id') AS BIGINT) AS id_rt,
             CAST(json_extract(doc, '$.props.k') AS INTEGER) AS k
      FROM j
    )
    SELECT et, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN id_rt = event_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_id_roundtrip,
           CAST(COUNT(CASE WHEN k IS NULL THEN 1 END) AS BIGINT)
             AS n_missing_k
    FROM x GROUP BY et
    """,
    tags=("variant", "semistructured", "json", "shredding"),
)
def events_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type: a nested
    JSON document (built from events columns + the props payload) is
    parsed ONCE with ``parse_json`` into Variant's shredded binary
    encoding, then every field access is a ``variant_get`` path lookup
    — no per-access string re-parse, the 100 TB answer to
    string-JSON columns (events_semistructured shows the classic
    get_json_object / from_json paths for contrast). Typed extraction
    (string / bigint / int) feeds an exact aggregate; an id round-trip
    column proves lossless encode→shred→extract."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"et":"'), F.col("event_type"),
        F.lit('","id":'), F.col("event_id").cast("string"),
        F.lit(',"props":'), F.col("props"), F.lit("}"),
    )
    v = ev.select(
        "event_id", F.parse_json(doc).alias("v")
    ).select(
        "event_id",
        F.variant_get("v", "$.et", "string").alias("et"),
        F.variant_get("v", "$.id", "bigint").alias("id_rt"),
        F.variant_get("v", "$.props.k", "int").alias("k"),
    )
    return v.groupBy("et").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(
            F.when(F.col("id_rt") == F.col("event_id"), 1).otherwise(0)
        ).cast("long").alias("n_id_roundtrip"),
        F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias(
            "n_missing_k"
        ),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    pairs AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
                    AS DOUBLE) AS prob
    FROM pairs
    """,
    tags=("events", "markov", "transition", "sequence", "window"),
    bench=True,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences
    (operators/analytics.py:transition_matrix): consecutive-event
    (from_type -> to_type) counts and row-normalized probabilities
    under the deterministic (ts, event_id) total order. One keyed
    exchange for the per-user lead window, one |types|²-bounded pair
    aggregate, marginals from a window over the aggregated frame —
    never a second corpus scan; prob is one IEEE division of exact
    longs."""
    from ..operators.analytics import transition_matrix

    return transition_matrix(load_table(spark, sf_dir, "events"))


@query(
    "events_peak_concurrency",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR {_FLOOR_S.format(c='ts')}
                          - {_FLOOR_S.format(c='prev_ts')} > 1800
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_seq
      FROM marked
    ),
    sess AS (
      SELECT user_id, session_seq,
             MIN(ts) AS session_start, MAX(ts) AS session_end
      FROM numbered GROUP BY 1, 2
    ),
    deltas AS (
      SELECT ts, CAST(SUM(s) AS BIGINT) AS starts,
                 CAST(SUM(e2) AS BIGINT) AS ends
      FROM (
        SELECT session_start AS ts, 1 AS s, 0 AS e2 FROM sess
        UNION ALL
        SELECT session_end, 0, 1 FROM sess
      ) GROUP BY 1
    ),
    peaks AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(starts - ends) OVER (ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  + ends AS BIGINT) AS peak_at_ts
      FROM deltas
    )
    SELECT day, MAX(peak_at_ts) AS peak_concurrency,
           CAST(COUNT(*) AS BIGINT) AS n_boundaries
    FROM peaks GROUP BY 1
    """,
    tags=("analytics", "concurrency", "interval", "capacity"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 30-min sessions per day via the interval-
    stacking sweep (+1 per session start, −1 per end, cumsum at
    distinct-timestamp grain — starts apply before ends within one
    timestamp, so zero-duration sessions still register). Sessions
    reuse the engine's sessionize operator; the cumsum runs on already-
    reduced boundary timestamps."""
    from ..operators.analytics import peak_concurrency
    from ..operators.relational import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30, id_col="event_id")
    sess = s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    return peak_concurrency(sess)


@query(
    "events_session_depth_profile",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR {_FLOOR_S.format(c='ts')}
                          - {_FLOOR_S.format(c='prev_ts')} > 1800
                     THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    sessions AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_seq
      FROM marked
    ),
    depth AS (
      SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sessions GROUP BY 1, 2
    )
    SELECT CAST(LENGTH(bin(n_events)) AS INTEGER) AS bucket,
           MIN(n_events) AS min_depth, MAX(n_events) AS max_depth,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS session_share,
           CAST(SUM(n_events) AS BIGINT) AS event_mass
    FROM depth GROUP BY 1
    """,
    tags=("sessionize", "histogram", "engagement", "observability"),
)
def events_session_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth histogram in power-of-two buckets: how many
    sessions are 1-event bounces vs 2-3, 4-7, ... event engagements,
    with each bucket's share and total event mass — the engagement-
    shape observability table next to the raw sessionize rollup (a
    product where bucket 1 dominates has a bounce problem; a fat tail
    is power-user concentration). Same session construction as
    events_sessionize (shared CTE shape); one session-grain reduction
    + one bucket-grain rollup; portable integer log2 bucketing."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30, id_col="event_id")
    depth = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    b = depth.select(
        F.length(F.bin(F.col("n_events"))).cast("int").alias("bucket"),
        "n_events",
    ).groupBy("bucket").agg(
        F.min("n_events").alias("min_depth"),
        F.max("n_events").alias("max_depth"),
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("event_mass"),
    )
    return b.select(
        "bucket", "min_depth", "max_depth", "n_sessions",
        (
            F.col("n_sessions").cast("double")
            / F.sum("n_sessions").over(w).cast("double")
        ).alias("session_share"),
        "event_mass",
    )
