"""Behavioral-analytics catalog entries (operators/analytics.py):
market-basket association rules over order baskets, an ordered event
funnel, weekly cohort retention, and rolling z-score anomaly
detection — the BI layer a warehouse team builds on the reference's
star schema (transform_to_bq.py ships only the daily rollup at
:160–165).

Registered after the pinned driver window (queries/__init__.py) —
bonus surface, locally oracle-gated via tests/test_oracle.py like
everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics import (
    basket_pairs,
    funnel,
    retention_cohorts,
    rolling_zscore,
)
from ..sources.corpus import load_table
from .catalog import query

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")


@query(
    "orders_market_basket",
    bench=True,
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem
    ),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200
    ),
    pairs AS (
      SELECT i1.item AS item_a, i2.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible e ON e.basket = i1.basket
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    ),
    counts AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS item_n
      FROM items GROUP BY item
    ),
    total AS (
      SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
      FROM items
    )
    SELECT p.item_a, p.item_b, p.pair_n,
           ca.item_n AS n_a, cb.item_n AS n_b,
           CAST(p.pair_n AS DOUBLE) / n_baskets AS support,
           CAST(p.pair_n AS DOUBLE) / ca.item_n AS conf_a_b,
           CAST(p.pair_n AS DOUBLE) / cb.item_n AS conf_b_a,
           (CAST(p.pair_n AS DOUBLE) / n_baskets)
             / ((CAST(ca.item_n AS DOUBLE) / n_baskets)
                * (CAST(cb.item_n AS DOUBLE) / n_baskets)) AS lift
    FROM pairs p
    JOIN counts ca ON ca.item = p.item_a
    JOIN counts cb ON cb.item = p.item_b
    CROSS JOIN total
    """,
    tags=("analytics", "market-basket", "co-occurrence", "association"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: support,
    confidence (both directions) and lift for part pairs co-purchased
    in >= 3 orders. Pair generation is posting-list expansion inside
    one codegen stage (never a row self-join at pair grain), capped by
    basket size so a degenerate basket cannot go quadratic."""
    li = load_table(spark, sf_dir, "lineitem")
    return basket_pairs(
        li, "l_orderkey", "l_partkey", min_pair_count=3, max_basket_size=200
    )


@query(
    "events_funnel",
    oracle="""
    WITH s0 AS (
      SELECT user_id AS u, MIN(ts) AS entry_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    s1 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s0 ON e.user_id = s0.u AND e.ts > s0.entry_ts
      WHERE e.event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.entry_ts
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.entry_ts
      WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    stages AS (
      SELECT 0 AS stage_idx, 'signup' AS stage,
             CAST(COUNT(*) AS BIGINT) AS users FROM s0
      UNION ALL SELECT 1, 'view', CAST(COUNT(*) AS BIGINT) FROM s1
      UNION ALL SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT stage_idx, stage, users,
           CAST(users AS DOUBLE)
             / LAG(users) OVER (ORDER BY stage_idx) AS conv_from_prev,
           CAST(users AS DOUBLE)
             / FIRST_VALUE(users) OVER (ORDER BY stage_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS conv_from_first
    FROM stages
    """,
    tags=("analytics", "funnel", "sequential", "events"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered product funnel signup → view → click → purchase: stage k
    counts only events strictly after the user's stage-(k-1) entry.
    Each stage is one keyed MIN agg + one equi-join on the user key;
    survivor frames only shrink, and the final 4-row window is
    output-sized."""
    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type", _FUNNEL_STAGES)


@query(
    "events_retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    fs AS (SELECT u, MIN(wk) AS cohort_week FROM ev GROUP BY 1),
    act AS (SELECT DISTINCT u, wk FROM ev),
    sz AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM fs GROUP BY 1
    ),
    a AS (
      SELECT fs.cohort_week,
             CAST(date_diff('day', fs.cohort_week, act.wk) / 7 AS INTEGER)
               AS week_offset,
             CAST(COUNT(*) AS BIGINT) AS active_users
      FROM act JOIN fs ON act.u = fs.u
      GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_offset, a.active_users, sz.cohort_users,
           CAST(a.active_users AS DOUBLE) / sz.cohort_users AS retention
    FROM a JOIN sz ON a.cohort_week = sz.cohort_week
    """,
    tags=("analytics", "retention", "cohort", "events"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of each
    user's first event; one row per (cohort_week, week_offset) with the
    active-user count and retention fraction. First-seen partial-
    aggregates map-side, so the activity join carries one row per user,
    not per event."""
    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev, "user_id", "ts")


@query(
    "events_anomaly_zscore",
    bench=True,
    oracle="""
    WITH daily AS (
      SELECT event_type AS key, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(15,2)) AS x
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT key, day, x,
             COUNT(x) OVER win AS m,
             CAST(SUM(x) OVER win AS DOUBLE) AS s,
             CAST(SUM(CAST(x * x AS DECIMAL(31,4))) OVER win AS DOUBLE) AS q
      FROM daily
      WINDOW win AS (PARTITION BY key ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT key, day, CAST(x AS DOUBLE) AS day_total,
           s / CAST(m AS DOUBLE) AS trailing_mean,
           (CAST(x AS DOUBLE) - s / CAST(m AS DOUBLE))
             / sqrt((q - s * s / CAST(m AS DOUBLE))
                    / (CAST(m AS DOUBLE) - 1.0)) AS z,
           abs((CAST(x AS DOUBLE) - s / CAST(m AS DOUBLE))
               / sqrt((q - s * s / CAST(m AS DOUBLE))
                      / (CAST(m AS DOUBLE) - 1.0))) > 2.5 AS is_anomaly
    FROM w
    WHERE m >= 3
      AND (q - s * s / CAST(m AS DOUBLE)) / (CAST(m AS DOUBLE) - 1.0) > 0
    """,
    tags=("analytics", "anomaly", "zscore", "window", "timeseries"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on daily value totals per
    event type: trailing 7-day mean/variance from exact decimal window
    sums of x and x² (frame-order-independent where double window sums
    are not), one closed-form IEEE expression per output double. The
    window sees O(keys × days) pre-aggregated rows, never raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    return rolling_zscore(
        ev, "event_type", "ts", "value", lookback=7, z_threshold=2.5
    )


_PR_SCALE = 10**9
_PR_ITERS = 6


def _pagerank_oracle(iters: int, scale: int) -> str:
    """Unrolled fixed-iteration integer PageRank in ANSI SQL — a
    recursive CTE can't aggregate in its recursive term, so each
    iteration is one chained CTE mirroring the Spark join+agg with //
    floor division (operators/graph.py docstring)."""
    head = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200
    ),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b, CAST(COUNT(*) AS BIGINT) AS w
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT a AS src, b AS dst, w FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst, w FROM pairs
    ),
    ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY 1),
    e AS (SELECT edges.src, edges.dst, edges.w, ow.ow
          FROM edges JOIN ow ON ow.src = edges.src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS r FROM nodes, nn)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
    r{i} AS (
      SELECT n.node,
             CAST((CAST(15 AS BIGINT) * {scale}) // (100 * nn.n)
                  + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM((p.r * e.w) // e.ow) AS s
        FROM e JOIN r{i - 1} p ON p.node = e.src
        GROUP BY 1
      ) c ON c.node = n.node
    )""")
    tail = f"""
    SELECT node AS part_key, r AS rank_scaled,
           CAST(r AS DOUBLE) / {float(scale)} AS pr
    FROM r{iters}
    """
    return head + "".join(steps) + tail


@query(
    "part_copurchase_pagerank",
    bench=True,
    oracle=_pagerank_oracle(_PR_ITERS, _PR_SCALE),
    tags=("graph", "pagerank", "iterative", "integer-exact"),
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the part co-purchase graph (edges =
    basket pairs bought together >= 2 times, symmetrized). Integer-
    scaled arithmetic (operators/graph.py) makes an iterative
    floating-point-free PageRank that is bit-identical across engines
    and partitionings — the oracle replays all iterations in unrolled
    SQL. Per iteration one edge join + one keyed sum; checkpointed
    edges; node-sized rank frame."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )  # pair_counts dedups in-aggregate: no .distinct() shuffle
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    edges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst"), "pair_n"
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("src"),
            F.col("item_a").alias("dst"),
            "pair_n",
        )
    )
    return pagerank(
        edges, "src", "dst", "pair_n",
        iterations=_PR_ITERS, scale=_PR_SCALE,
    ).select(
        F.col("node").alias("part_key"),
        "rank_scaled",
        F.col("rank").alias("pr"),
    )


_PPR_SEEDS = 3


def _ppr_oracle(iters: int, scale: int, n_seeds: int) -> str:
    """Unrolled personalized PageRank: the pagerank oracle's graph CTEs
    plus a deterministic seed set (top weighted degree, node asc
    tie-break); restart mass lands only on seeds."""
    head = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200
    ),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b, CAST(COUNT(*) AS BIGINT) AS w
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT a AS src, b AS dst, w FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst, w FROM pairs
    ),
    ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY 1),
    e AS (SELECT edges.src, edges.dst, edges.w, ow.ow
          FROM edges JOIN ow ON ow.src = edges.src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    seeds AS (SELECT src AS node FROM ow
              ORDER BY ow DESC, src LIMIT {n_seeds}),
    flagged AS (
      SELECT n.node, (s.node IS NOT NULL) AS is_seed
      FROM nodes n LEFT JOIN seeds s ON s.node = n.node
    ),
    r0 AS (
      SELECT node, is_seed,
             CAST(CASE WHEN is_seed THEN {scale} // {n_seeds}
                  ELSE 0 END AS BIGINT) AS r
      FROM flagged)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
    r{i} AS (
      SELECT f.node, f.is_seed,
             CAST(CASE WHEN f.is_seed
                   THEN (CAST(15 AS BIGINT) * {scale}) // (100 * {n_seeds})
                   ELSE 0 END
                  + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
      FROM flagged f
      LEFT JOIN (
        SELECT e.dst AS node, SUM((p.r * e.w) // e.ow) AS s
        FROM e JOIN r{i - 1} p ON p.node = e.src
        GROUP BY 1
      ) c ON c.node = f.node
    )""")
    tail = f"""
    SELECT node AS part_key, r AS rank_scaled,
           CAST(r AS DOUBLE) / {float(scale)} AS ppr
    FROM r{iters}
    WHERE r > 0
    """
    return head + "".join(steps) + tail


@query(
    "part_personalized_pagerank",
    oracle=_ppr_oracle(_PR_ITERS, _PR_SCALE, _PPR_SEEDS),
    tags=("graph", "pagerank", "personalized", "recommendation",
          "iterative", "integer-exact"),
)
def part_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the 3 highest-degree parts of the
    co-purchase graph (operators/graph.py:personalized_pagerank) — the
    "customers who buy THESE also gravitate to..." local ranking, vs
    the global importance of part_copurchase_pagerank. Restart mass
    lands only on the seed set (deterministic: weighted degree DESC,
    part key ASC), so rank decays with graph distance from the seeds;
    nodes never reached in 6 hops stay exactly 0 and are filtered.
    Same integer-scaled exactness contract as pagerank: the oracle
    replays all iterations in unrolled SQL, bit-identical. Per
    iteration one edge equi-join + one keyed sum; the seed flag is a
    broadcast join onto the node frame."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import personalized_pagerank

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    # The symmetrized edge list feeds the seed selection HERE and the
    # operator's own node/out-weight/edge derivations; checkpoint once
    # so pair_counts (two fact shuffles) runs once, not once per branch.
    edges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst"), "pair_n"
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("src"),
            F.col("item_a").alias("dst"),
            "pair_n",
        )
    ).localCheckpoint()
    ow = edges.groupBy("src").agg(
        F.sum(F.col("pair_n").cast("long")).alias("ow")
    )
    seeds = (
        ow.orderBy(F.col("ow").desc(), F.col("src"))
        .limit(_PPR_SEEDS)
        .select(F.col("src").alias("node"))
    )
    return (
        personalized_pagerank(
            edges, seeds, "src", "dst", "pair_n",
            iterations=_PR_ITERS, scale=_PR_SCALE,
        )
        .filter(F.col("rank_scaled") > 0)
        .select(
            F.col("node").alias("part_key"),
            "rank_scaled",
            F.col("rank").alias("ppr"),
        )
    )


@query(
    "part_copurchase_triangles",
    bench=True,
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200
    ),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    tn AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    ),
    tc AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM tn GROUP BY 1
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY 1
    )
    SELECT tc.node AS part_key, tc.n_triangles, deg.degree,
           2.0 * tc.n_triangles
             / (deg.degree * (deg.degree - 1.0)) AS clustering
    FROM tc JOIN deg ON deg.node = tc.node
    """,
    tags=("graph", "triangles", "clustering-coefficient", "orientation"),
)
def part_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts + local clustering coefficient over the
    co-purchase graph (operators/graph.py:triangle_counts). Edges are
    degree-ordered before the wedge self-join — the orientation bounds
    every node's out-degree by O(sqrt(edges)), so a hub part cannot
    create a quadratic wedge set; all joins are keyed equi-joins. The
    oracle counts the same triangles via the a<b<c three-way join."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )  # pair_counts dedups in-aggregate: no .distinct() shuffle
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    return triangle_counts(pairs, "item_a", "item_b").select(
        F.col("node").alias("part_key"),
        "n_triangles",
        "degree",
        "clustering",
    )


@query(
    "events_hll_weekly_users",
    oracle="""
    SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS estimate_ok
    FROM events GROUP BY 1, 2
    """,
    tags=("sketch", "hll", "approx-distinct", "rollup"),
)
def events_hll_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct rollup (operators/sketches.py): daily
    HLL sketches of user_id per event type, unioned up to weekly
    estimates — the pattern that makes distinct counts re-aggregable
    at 100 TB without rescanning raw events. Driver-checkable via the
    approx_parts_ok pattern: exact weekly distincts (cross-engine) +
    a boolean pinning the estimate within 5%."""
    from ..operators.sketches import sketch_distinct_rollup

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.to_date("ts").alias("day"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    )
    return sketch_distinct_rollup(
        ev,
        "user_id",
        fine_keys=["event_type", "week", "day"],
        coarse_keys=["event_type", "week"],
        lg_k=12,
        rel_tol=0.05,
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH pc AS (
      SELECT o_custkey AS cust,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       DATE '1998-12-31') AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT *, CAST(((ROW_NUMBER() OVER (ORDER BY recency_days, cust)
                       - 1) * 4) // COUNT(*) OVER () AS INTEGER) AS r_q
      FROM pc
    ),
    f AS (
      SELECT *, CAST(((ROW_NUMBER() OVER (ORDER BY frequency, cust)
                       - 1) * 4) // COUNT(*) OVER () AS INTEGER) AS f_q
      FROM r
    ),
    m AS (
      SELECT *, CAST(((ROW_NUMBER() OVER (ORDER BY monetary, cust)
                       - 1) * 4) // COUNT(*) OVER () AS INTEGER) AS m_q
      FROM f
    )
    SELECT CAST(3 - r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
             || CAST(m_q AS VARCHAR) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS total_monetary
    FROM m GROUP BY 1
    """,
    tags=("analytics", "rfm", "segmentation", "quartile"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/analytics.py
    rfm_segments): recency/frequency/monetary quartiles per customer
    combined into a 3-digit segment, with per-segment counts and
    decimal-exact total spend. One fact aggregation to customer grain,
    then three exact global quartile passes via scalable row ids —
    never a single-partition NTILE window."""
    from ..operators.analytics import rfm_segments

    orders = load_table(spark, sf_dir, "orders")
    return rfm_segments(orders)


@query(
    "part_hierarchy_rollup",
    oracle="""
    WITH RECURSIVE tree AS (
      SELECT p_partkey AS node,
             CASE WHEN p_partkey = 1 THEN NULL
                  ELSE (CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR)),
                                            1, 8) AS BIGINT)
                        % (p_partkey - 1)) + 1
             END AS parent,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS w
      FROM part
    ),
    chain AS (
      SELECT node, node AS cur, parent AS nxt,
             CAST(0 AS BIGINT) AS depth, w AS path_w
      FROM tree
      UNION ALL
      SELECT c.node, t.node AS cur, t.parent AS nxt,
             c.depth + 1, c.path_w + t.w
      FROM chain c JOIN tree t ON t.node = c.nxt
    )
    SELECT node, cur AS root_id, depth, path_w
    FROM chain WHERE nxt IS NULL
    """,
    tags=("graph", "hierarchy", "binary-lifting", "iterative"),
    bench=True,
)
def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening by pointer doubling
    (operators/graph.py:path_to_root): each part's depth and
    path-to-root cost in a deterministic hash-derived tree
    (parent(k) = md5int(k) mod (k−1) + 1 — a random recursive tree,
    expected depth ~2·ln n). Binary lifting reaches every root in
    O(log depth) self-joins where the per-level walk the oracle's
    recursive CTE performs is O(depth) — the scalable shape for
    40-level BOM/org-chart rollups over billions of rows. Integer-cent
    weights keep path sums associative and engine-exact."""
    from ..operators.graph import path_to_root

    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    parent = F.when(k == 1, F.lit(None).cast("long")).otherwise(
        F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % (k - F.lit(1))
        + F.lit(1)
    )
    tree = part.select(
        k.alias("node"),
        parent.alias("parent"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("w"),
    )
    return path_to_root(tree, "node", "parent", "w")


@query(
    "events_quantile_sketch",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, CAST(0.5 AS DOUBLE) AS pct,
           CAST(n AS BIGINT) AS n,
           CAST(CEIL(0.5 * n) AS BIGINT) AS k,
           CAST(value AS DOUBLE) AS exact_value,
           TRUE AS sketch_ok
    FROM ranked WHERE r = CAST(CEIL(0.5 * n) AS BIGINT)
    UNION ALL
    SELECT event_type, CAST(0.95 AS DOUBLE), CAST(n AS BIGINT),
           CAST(CEIL(0.95 * n) AS BIGINT),
           CAST(value AS DOUBLE), TRUE
    FROM ranked WHERE r = CAST(CEIL(0.95 * n) AS BIGINT)
    """,
    tags=("sketch", "quantile", "percentile-approx", "rank-error"),
)
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with an in-plan rank-error proof
    (operators/sketches.py:quantile_sketch_check): per event type the
    EXACT p50/p95 of value (k-th smallest under the (value, event_id)
    total order — engine-identical) next to a boolean pinning
    percentile_approx's rank guarantee (the sketch value's rank
    interval intersects k ± n/accuracy). The approx_parts_ok pattern:
    exact columns hash-match cross-engine, the sketch quality rides as
    a driver-checked boolean. Completes the mergeable-sketch family
    (CMS frequencies, HLL distincts, quantiles)."""
    from ..operators.sketches import quantile_sketch_check

    ev = load_table(spark, sf_dir, "events")
    return quantile_sketch_check(
        ev,
        "value",
        ["event_type"],
        percentiles=(0.5, 0.95),
        accuracy=1000,
        tiebreak_col="event_id",
    )


@query(
    "events_multitouch_attribution",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, CAST(ts AS DATE) AS touch_day
      FROM events WHERE event_type = 'click'
    ),
    c AS (
      SELECT user_id, ts, event_id FROM events
      WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT t.touch_day, c.event_id AS cid
      FROM c JOIN t
        ON t.user_id = c.user_id
       AND t.ts <= c.ts
       AND t.ts >= c.ts - INTERVAL 7 DAYS
    ),
    credited AS (
      SELECT touch_day,
             1000000 // (COUNT(*) OVER (PARTITION BY cid))
               AS credit_micro
      FROM pairs
    )
    SELECT touch_day, CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(CAST(SUM(credit_micro) AS BIGINT) AS DOUBLE) / 1000000.0
             AS credit
    FROM credited GROUP BY touch_day
    """,
    tags=("events", "attribution", "multitouch", "range-join"),
)
def events_multitouch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear multi-touch attribution (operators/analytics.py
    multitouch_attribution): every click in the 7 days before a user's
    purchase shares that purchase's credit equally — the multi-touch
    counterpart of the engine's last-touch as-of attribution. Credit is
    integer micro-units (scale div k — `div` and `//` agree on these
    non-negative operands) so per-day sums are exact, with ONE IEEE
    division by the scale at the end. One user-keyed range join, one
    pair-grain window per conversion id, one day-keyed aggregate."""
    from ..operators.analytics import multitouch_attribution

    return multitouch_attribution(load_table(spark, sf_dir, "events"))


@query(
    "events_ks_drift",
    oracle="""
    WITH binned AS (
      SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS a
      FROM events
    ),
    counts AS (
      SELECT event_type, bin,
             CAST(SUM(a) AS BIGINT) AS na_v,
             CAST(SUM(1 - a) AS BIGINT) AS nb_v
      FROM binned GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin,
             CAST(SUM(na_v) OVER w AS BIGINT) AS cum_a,
             CAST(SUM(nb_v) OVER w AS BIGINT) AS cum_b,
             CAST(SUM(na_v) OVER p AS BIGINT) AS n_a,
             CAST(SUM(nb_v) OVER p AS BIGINT) AS n_b
      FROM counts
      WINDOW w AS (PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    ),
    gaps AS (
      SELECT event_type, bin, n_a, n_b,
             abs(CAST(cum_a AS HUGEINT) * n_b
                 - CAST(cum_b AS HUGEINT) * n_a) AS gap
      FROM cum
    ),
    peak AS (
      SELECT event_type, MAX(gap) AS max_gap FROM gaps GROUP BY 1
    ),
    at AS (
      SELECT g.event_type,
             MAX(g.n_a) AS n_a, MAX(g.n_b) AS n_b,
             MIN(g.bin) AS ks_at_bin, MAX(p.max_gap) AS num
      FROM gaps g JOIN peak p
        ON g.event_type = p.event_type AND g.gap = p.max_gap
      GROUP BY 1
    )
    SELECT event_type, n_a, n_b, ks_at_bin,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(n_a AS HUGEINT) * n_b AS VARCHAR) AS DOUBLE)
             AS ks_stat
    FROM at
    """,
    tags=("drift", "ks", "distribution", "profile", "events"),
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift per event type
    (operators/profile.py:ks_drift): the value distribution of the
    first half of the month vs the second, binned to the integer grid
    (the documented bounded-domain contract — production drift checks
    bin first, and the KS of the binned ECDFs is then exact). Integer
    gap numerators in DECIMAL(38,0)/HUGEINT, one string-parse double
    division; catches shape drift that mean/stddev profiles hide."""
    from ..operators.profile import ks_drift

    ev = load_table(spark, sf_dir, "events")
    return ks_drift(
        ev,
        bin_col=F.floor(F.col("value")),
        in_sample_a=F.col("ts") < F.lit("2024-01-16").cast("timestamp"),
        group_cols=["event_type"],
    )


@query(
    "events_top_paths",
    oracle="""
    WITH capped AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS rn
      FROM events
    ),
    seqs AS (
      SELECT user_id, day,
             array_to_string(
               list(event_type ORDER BY rn), '>') AS path
      FROM capped WHERE rn <= 8 GROUP BY 1, 2
    ),
    pc AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM seqs GROUP BY 1
    )
    SELECT path, n_sessions, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY n_sessions DESC, path) AS INTEGER) AS rnk
      FROM pc
    ) WHERE rnk <= 20
    """,
    tags=("events", "paths", "journey", "topk", "sequence"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journey paths (operators/analytics.py:top_paths):
    the most common per-(user, day) ordered event-type sequences,
    truncated to the first 8 events by a row_number cap BEFORE any
    list is collected (bounded aggregate state), ordered by the total
    (ts, event_id) order so ties are engine-identical. The global
    top-k plans as TakeOrderedAndProject; the rank window runs on the
    20-row limited frame."""
    from ..operators.analytics import top_paths

    return top_paths(load_table(spark, sf_dir, "events"), k=20, max_len=8)


@query(
    "events_mad_outliers",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(FLOOR(value) AS DOUBLE) AS v FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS m
      FROM base GROUP BY 1
    ),
    mad AS (
      SELECT b.event_type, quantile_cont(abs(b.v - m.m), 0.5) AS d,
             MAX(m.m) AS m2
      FROM base b JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT b.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(a.m2) AS med,
           MAX(a.d) AS mad,
           CAST(SUM(CASE WHEN abs(b.v - a.m2)
                          > CAST('3.0' AS DOUBLE) * a.d
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN abs(b.v - a.m2)
                          > CAST('3.0' AS DOUBLE) * a.d
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS outlier_frac
    FROM base b JOIN mad a USING (event_type)
    GROUP BY 1
    """,
    tags=("profile", "robust", "mad", "outliers", "events"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier audit per event type
    (operators/profile.py:mad_outliers): exact medians on the
    integer-floored value grid (the half-integer-exact contract that
    makes percentile interpolation bit-portable), outliers beyond
    3 * MAD — the heavy-tail-safe sibling of events_anomaly_zscore,
    whose mean/stddev the outliers themselves drag. Three keyed passes
    (median -> MAD -> count), type-grain rider joins sized by AQE."""
    from ..operators.profile import mad_outliers

    ev = load_table(spark, sf_dir, "events")
    return mad_outliers(
        ev.select("event_type", "value"),
        value_col=F.floor(F.col("value")),
        group_cols=["event_type"],
        k=3.0,
    )


@query(
    "orders_seasonality_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS rev
      FROM orders GROUP BY 1, 2
    ),
    by_dow AS (
      SELECT dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(rev) AS DECIMAL(28,2)) AS dow_rev
      FROM daily GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(dow_rev) AS DECIMAL(28,2)) AS all_rev,
             CAST(SUM(n_days) AS BIGINT) AS all_days
      FROM by_dow
    )
    SELECT CAST(d.dow AS INTEGER) AS dow, d.n_days,
           CAST(CAST(d.dow_rev AS VARCHAR) AS DOUBLE)
             / CAST(d.n_days AS DOUBLE) AS avg_daily_rev,
           (CAST(CAST(d.dow_rev AS VARCHAR) AS DOUBLE)
              / CAST(d.n_days AS DOUBLE))
             / (CAST(CAST(t.all_rev AS VARCHAR) AS DOUBLE)
                  / CAST(t.all_days AS DOUBLE)) AS seasonal_index
    FROM by_dow d CROSS JOIN tot t
    """,
    tags=("analytics", "seasonality", "bi", "agg"),
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index: average daily revenue per weekday
    over the grand daily average — the BI primitive behind 'Mondays run
    12% hot' staffing/alerting baselines (an anomaly detector that
    ignores seasonality pages every Monday). Two reducing aggregates
    (day grain -> weekday grain, the second over the already-tiny
    frame) and a 1-row total rider; revenue accumulates in exact
    DECIMAL, each output double is the same two-division IEEE tree in
    both engines (decimal renders through the string-parse cast).
    Spark's dayofweek is 1=Sunday; DuckDB's is 0=Sunday — the oracle
    adds 1 to align the convention, documented here once."""
    ord_ = load_table(spark, sf_dir, "orders")
    from ..operators.relational import dec

    daily = (
        ord_.groupBy(
            F.to_date("o_orderdate").alias("day"),
            F.dayofweek(F.to_date("o_orderdate")).alias("dow"),
        )
        .agg(F.sum(dec("o_totalprice", 18, 2)).alias("rev"))
    )
    by_dow = daily.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("rev").cast("decimal(28,2)").alias("dow_rev"),
    )
    tot = by_dow.agg(
        F.sum("dow_rev").cast("decimal(28,2)").alias("all_rev"),
        F.sum("n_days").cast("long").alias("all_days"),
    )
    avg_daily = (
        F.col("dow_rev").cast("string").cast("double")
        / F.col("n_days").cast("double")
    )
    grand = (
        F.col("all_rev").cast("string").cast("double")
        / F.col("all_days").cast("double")
    )
    return (
        by_dow.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            avg_daily.alias("avg_daily_rev"),
            (avg_daily / grand).alias("seasonal_index"),
        )
    )


@query(
    "events_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT event_type AS bar_key, date_trunc('hour', ts) AS bar_ts,
             value AS v,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT bar_key, bar_ts,
           MAX(CASE WHEN rn_a = 1 THEN v END) AS open_v,
           MAX(v) AS high_v,
           MIN(v) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN v END) AS close_v,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked GROUP BY 1, 2
    """,
    tags=("analytics", "timeseries", "ohlc", "resample", "window"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlestick bars per event type (open/close under
    the deterministic (ts, event_id) total order; high/low/volume).
    All measures are pass-through or min/max doubles — zero float
    accumulation — so bars are bit-exact on any partitioning; one
    (key, hour) exchange serves both window passes and the final
    aggregate."""
    from ..operators.analytics import ohlc_bars

    ev = load_table(spark, sf_dir, "events")
    return ohlc_bars(ev)


@query(
    "events_ab_lift",
    oracle="""
    WITH ranked AS (
      SELECT user_id AS u, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    per_user AS (
      SELECT u,
             MAX(CASE WHEN rn = 1 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS conv
      FROM ranked GROUP BY 1),
    v AS (
      SELECT CAST(u % 2 AS INTEGER) AS variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS c
      FROM per_user GROUP BY 1),
    arms AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
             MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
             MAX(CASE WHEN variant = 0 THEN c END) AS conv_a,
             MAX(CASE WHEN variant = 1 THEN c END) AS conv_b
      FROM v),
    calc AS (
      SELECT n_a, n_b, conv_a, conv_b,
             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
             CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
             CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS abs_lift,
             sqrt(
               (CAST(conv_a + conv_b AS DOUBLE)
                  / CAST(n_a + n_b AS DOUBLE))
               * (CAST(1.0 AS DOUBLE)
                  - CAST(conv_a + conv_b AS DOUBLE)
                    / CAST(n_a + n_b AS DOUBLE))
               * (CAST(n_a + n_b AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE))
             ) AS se
      FROM arms)
    SELECT n_a, n_b, conv_a, conv_b, rate_a, rate_b, abs_lift,
           CASE WHEN se = 0 THEN NULL ELSE abs_lift / se END AS z_score
    FROM calc
    """,
    tags=("analytics", "ab-test", "experiment", "z-test", "lift"),
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion experiment readout: deterministic user_id-parity
    variant split, per-variant first-event-is-purchase conversion
    rates (the landing-action metric — "any purchase ever" saturates
    to 1.0 on this engagement-heavy corpus and degenerates the test),
    absolute lift, and the pooled two-proportion z statistic (NULL at
    zero pooled variance) — every float one closed-form IEEE tree over
    exact longs (the Wilson idiom), so DuckDB and Spark agree
    bit-for-bit. The parity split requires the non-negative user ids
    the events contract guarantees (% on negatives is
    engine-divergent)."""
    from ..operators.analytics import ab_conversion_lift

    ev = load_table(spark, sf_dir, "events")
    return ab_conversion_lift(ev)


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS daily_n
      FROM events GROUP BY 1),
    cum AS (
      SELECT day, daily_n,
        CAST(SUM(daily_n) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_n,
        CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
        CAST(SUM(daily_n) OVER () AS BIGINT) AS total,
        CAST(COUNT(*) OVER () AS BIGINT) AS n_days
      FROM daily),
    scored AS (
      SELECT day, daily_n, cum_n,
        CAST(cum_n AS DOUBLE)
          - CAST(k * total AS DOUBLE) / CAST(n_days AS DOUBLE) AS dev,
        abs(CAST(cum_n AS DOUBLE)
          - CAST(k * total AS DOUBLE) / CAST(n_days AS DOUBLE)) AS adev,
        date_diff('day', DATE '1970-01-01', day) AS dayk
      FROM cum),
    with_max AS (
      SELECT *, MAX(adev) OVER () AS max_adev FROM scored),
    with_cp AS (
      SELECT *, MIN(CASE WHEN adev = max_adev THEN dayk END) OVER ()
               AS cp_day
      FROM with_max)
    SELECT day, daily_n, cum_n, dev,
           (adev = max_adev) AND (dayk = cp_day) AS is_changepoint
    FROM with_cp
    """,
    tags=("analytics", "changepoint", "cusum", "timeseries", "drift"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-CUSUM changepoint scan over the daily event-volume series:
    per-day deviation of the cumulative count from the uniform-rate
    expectation (exact-integer numerators, one division), flagging the
    day that maximizes |dev| (earliest on exact-integer ties). The raw
    scan reduces to day grain map-side before any window touches it."""
    from ..operators.analytics import cusum_deviation

    ev = load_table(spark, sf_dir, "events")
    return cusum_deviation(ev)


@query(
    "customer_cohort_ltv",
    oracle="""
    WITH aged AS (
      SELECT o_custkey AS cust,
        CAST(MIN(date_trunc('month', o_orderdate))
               OVER (PARTITION BY o_custkey) AS DATE) AS cohort_month,
        CAST((year(o_orderdate) * 12 + month(o_orderdate))
             - MIN(year(o_orderdate) * 12 + month(o_orderdate))
                 OVER (PARTITION BY o_custkey) AS INTEGER) AS age_months,
        CAST(o_totalprice AS DECIMAL(12,2)) AS rev
      FROM orders),
    cells AS (
      SELECT cohort_month, age_months, SUM(rev) AS rev_sum,
             CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_active
      FROM aged GROUP BY 1, 2)
    SELECT cohort_month, age_months, n_active,
      CAST(rev_sum AS DOUBLE) AS period_revenue,
      CAST(SUM(rev_sum) OVER (PARTITION BY cohort_month ORDER BY age_months
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS cum_revenue,
      CAST(MAX(CASE WHEN age_months = 0 THEN n_active END)
        OVER (PARTITION BY cohort_month) AS BIGINT) AS cohort_size,
      CAST(SUM(rev_sum) OVER (PARTITION BY cohort_month ORDER BY age_months
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      / CAST(MAX(CASE WHEN age_months = 0 THEN n_active END)
          OVER (PARTITION BY cohort_month) AS DOUBLE) AS ltv_per_customer
    FROM cells
    """,
    tags=("analytics", "cohort", "ltv", "retention", "revenue"),
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves over the order fact: first-order-
    month cohorts x integer month age, period and cohort-cumulative
    revenue (exact DECIMAL(12,2) sums, one double render each), and
    LTV per cohort member (one further exact division). One custkey
    exchange for the cohorting window; everything after runs at
    (cohort, age) cell grain."""
    from ..operators.analytics import cohort_ltv

    od = load_table(spark, sf_dir, "orders")
    return cohort_ltv(od)


@query(
    "events_inter_event_gaps",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               - epoch_us(ts) AS gap_us
      FROM events),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(MIN(gap_us) AS BIGINT) AS min_us,
             CAST(MAX(gap_us) AS BIGINT) AS max_us,
             CAST(SUM(gap_us) AS BIGINT) AS sum_us
      FROM seq WHERE gap_us IS NOT NULL GROUP BY 1)
    SELECT event_type, n_gaps,
           CAST(min_us AS DOUBLE) / CAST(1000000 AS DOUBLE) AS min_gap_s,
           CAST(max_us AS DOUBLE) / CAST(1000000 AS DOUBLE) AS max_gap_s,
           CAST(sum_us AS DOUBLE)
             / CAST(n_gaps * 1000000 AS DOUBLE) AS avg_gap_s
    FROM g
    """,
    tags=("analytics", "timeseries", "cadence", "sessionization"),
)
def events_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-event cadence: min/max/avg gap to the next
    same-user event (exact BIGINT microsecond diffs under the (ts, id)
    total order; each emitted second-value is one IEEE division) —
    the statistic that calibrates session timeouts and flags
    machine-speed actors. One user-keyed window exchange, then a
    |types|-bounded reducing aggregate."""
    from ..operators.analytics import inter_event_gaps

    ev = load_table(spark, sf_dir, "events")
    return inter_event_gaps(ev)


@query(
    "events_dau_mau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
    mau AS (
      SELECT days.d, CAST(COUNT(DISTINCT ud.u) AS BIGINT) AS mau
      FROM days
      JOIN ud ON ud.d >= days.d - 27 AND ud.d <= days.d
      GROUP BY 1)
    SELECT dau.d AS day, dau.dau, mau.mau,
           CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE)
             AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    """,
    tags=("analytics", "engagement", "dau-mau", "range-join"),
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-28-day MAU stickiness per active day. Spark has
    no COUNT(DISTINCT) over a RANGE window, so each user-day explodes
    into the ≤28 target days it serves and the distinct count is an
    equi-keyed aggregate (a raw range join would plan a nested-loop
    scan) — the fact reduces to user-day grain before the bounded
    fan-out."""
    from ..operators.analytics import dau_mau_stickiness

    ev = load_table(spark, sf_dir, "events")
    return dau_mau_stickiness(ev)


@query(
    "part_copurchase_assortativity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY 1),
    xy AS (
      SELECT da.deg AS x, db.deg AS y
      FROM pairs p JOIN deg da ON da.node = p.a
                   JOIN deg db ON db.node = p.b
      UNION ALL
      SELECT db.deg, da.deg
      FROM pairs p JOIN deg da ON da.node = p.a
                   JOIN deg db ON db.node = p.b),
    sums AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM xy),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT nn.n_nodes,
           CAST(m / 2 AS BIGINT) AS n_edges,
           CASE WHEN sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                               AS DOUBLE))
                     * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(CAST(m * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                                  AS DOUBLE))
                        * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                    AS DOUBLE)))
           END AS assortativity
    FROM sums, nn
    """,
    tags=("graph", "assortativity", "correlation", "analytics"),
)
def part_copurchase_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the co-purchase graph (same edge
    construction as the pagerank/triangles entries): the Pearson
    correlation of endpoint degrees over directed stubs, exact
    DECIMAL(38,0) moment sums (BIGINT products overflow past ~10⁹
    edges) rendered through the portable string cast, NULL for a
    degree-regular graph. Answers "do hub parts co-sell with other
    hubs or with long-tail parts"."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import degree_assortativity

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    return degree_assortativity(pairs, "item_a", "item_b")


@query(
    "part_link_prediction",
    bench=True,
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY 1),
    adj AS (
      SELECT p.a AS w, p.b AS nb FROM pairs p
      UNION ALL SELECT p.b, p.a FROM pairs p),
    cadj AS (
      SELECT adj.w, adj.nb FROM adj
      JOIN deg ON deg.node = adj.w AND deg.deg <= 500),
    cand AS (
      SELECT a1.nb AS u, a2.nb AS v, CAST(COUNT(*) AS BIGINT) AS cn
      FROM cadj a1 JOIN cadj a2 ON a1.w = a2.w AND a1.nb < a2.nb
      GROUP BY 1, 2),
    nonedge AS (
      SELECT c.u, c.v, c.cn
      FROM cand c LEFT JOIN pairs p ON c.u = p.a AND c.v = p.b
      WHERE p.a IS NULL)
    SELECT n.u AS item_a, n.v AS item_b, n.cn AS common_neighbors,
           du.deg AS deg_a, dv.deg AS deg_b,
           CAST(n.cn AS DOUBLE)
             / CAST(du.deg + dv.deg - n.cn AS DOUBLE) AS jaccard
    FROM nonedge n
    JOIN deg du ON du.node = n.u
    JOIN deg dv ON dv.node = n.v
    ORDER BY common_neighbors DESC, item_a, item_b
    LIMIT 100
    """,
    tags=("graph", "link-prediction", "recommendation", "jaccard"),
)
def part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-purchase graph (same
    edge construction as the pagerank/triangles/assortativity entries):
    the top-100 NON-adjacent part pairs by shared-companion count, with
    neighborhood Jaccard — "bought alongside the same parts but never
    together yet", the co-sell recommendation candidate list. Witness
    role capped at degree 500 (a hub witnesses every pair and carries
    no signal — the stop-term-cap argument), candidate set bounded by
    sum(deg² over witnesses), never global-quadratic; deterministic
    limit boundary via the (cn DESC, a, b) total order; jaccard is one
    division of exact longs."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import link_prediction

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    return link_prediction(
        pairs, "item_a", "item_b", top_k=100, max_witness_degree=500
    )


@query(
    "events_adoption_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id AS u, MIN(CAST(ts AS DATE)) AS day
      FROM events GROUP BY 1),
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY 1)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users,
           CAST(SUM(new_users) OVER () AS BIGINT) AS total_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE)
             / CAST(SUM(new_users) OVER () AS DOUBLE) AS adoption_frac
    FROM daily
    """,
    tags=("analytics", "adoption", "growth", "cumulative"),
)
def events_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-adoption curve: first-seen users per day, cumulative
    count, and fraction of the eventually-observed population — the
    raw fact reduces to user grain map-side, and every window runs on
    day-grain rows."""
    from ..operators.analytics import adoption_curve

    ev = load_table(spark, sf_dir, "events")
    return adoption_curve(ev)


@query(
    "orders_new_vs_repeat_revenue",
    oracle="""
    WITH ranked AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) = 1
                  THEN 'new' ELSE 'repeat' END AS customer_kind,
             CAST(o_totalprice AS DECIMAL(12,2)) AS rev
      FROM orders)
    SELECT month, customer_kind,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM ranked GROUP BY 1, 2
    """,
    tags=("analytics", "new-vs-repeat", "revenue", "retention"),
)
def orders_new_vs_repeat_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly revenue split between first-time and returning customers
    — the acquisition-vs-retention headline every commerce dashboard
    leads with. The first-order flag is ONE row_number over the
    (custkey, order date, orderkey) total order (a single customer-
    keyed exchange); revenue sums are exact decimals rendered once."""
    od = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    wr = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = od.select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date")
        .alias("month"),
        F.when(F.row_number().over(wr) == 1, F.lit("new"))
        .otherwise(F.lit("repeat"))
        .alias("customer_kind"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("_rev"),
    )
    return ranked.groupBy("month", "customer_kind").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("_rev").cast("double").alias("revenue"),
    )


@query(
    "events_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type AS key,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT key, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
    spine AS (
      SELECT span.key, g.d
      FROM span, unnest(generate_series(span.d0, span.d1)) AS g(d)),
    dense AS (
      SELECT s.key, COALESCE(dy.x, 0) AS x
      FROM spine s
      LEFT JOIN daily dy ON dy.key = s.key AND dy.d = s.d),
    sums AS (
      SELECT key,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM dense GROUP BY 1)
    SELECT key AS event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS n_events,
           CASE WHEN CAST(CAST((n - 1) * s AS VARCHAR) AS DOUBLE) = 0
                THEN NULL
                ELSE CAST(CAST(n * sxx - s * s AS VARCHAR) AS DOUBLE)
                     / CAST(CAST((n - 1) * s AS VARCHAR) AS DOUBLE)
           END AS fano
    FROM sums
    """,
    tags=("analytics", "timeseries", "burstiness", "fano", "dispersion"),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type burstiness (operators/analytics.py:
    fano_burstiness): the Fano dispersion index var/mean of the daily
    count series, zero-densified over each type's own active span —
    steady drip vs campaign bursts in one scalar per type. Epoch-day
    integers, DECIMAL(38,0) moment sums, one string-cast-rendered
    division — bit-exact both engines."""
    from ..operators.analytics import fano_burstiness

    ev = load_table(spark, sf_dir, "events")
    return fano_burstiness(ev)


@query(
    "events_daily_autocorr",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (
      SELECT g.d
      FROM bounds, unnest(generate_series(bounds.d0, bounds.d1)) AS g(d)),
    dense AS (
      SELECT s.d, COALESCE(dy.x, 0) AS x
      FROM spine s LEFT JOIN daily dy USING (d)),
    pairs AS (
      SELECT a.x AS x, b.x AS y
      FROM dense a JOIN dense b ON b.d = a.d + 1),
    sums AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM pairs)
    SELECT CAST(m AS BIGINT) AS n_pairs,
           CASE WHEN sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                               AS DOUBLE))
                     * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(CAST(m * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                                  AS DOUBLE))
                        * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                    AS DOUBLE)))
           END AS autocorr_lag1
    FROM sums
    """,
    tags=("analytics", "timeseries", "autocorrelation", "forecasting"),
)
def events_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the global daily event-count series
    (operators/analytics.py:daily_autocorr): Pearson r over
    zero-densified consecutive-day pairs — is today's volume
    predictive of tomorrow's, the sanity scalar before fitting any
    forecaster. The consecutive-day pairing is a keyed equi self-join
    on d+1 (no global window over raw rows); moments are exact
    DECIMAL(38,0); r is the assortativity-idiom closed form."""
    from ..operators.analytics import daily_autocorr

    ev = load_table(spark, sf_dir, "events")
    return daily_autocorr(ev)


@query(
    "customer_second_order_hazard",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
      FROM orders),
    f AS (SELECT k, d AS t0 FROM ranked WHERE rn = 1),
    s AS (SELECT k, d AS t1 FROM ranked WHERE rn = 2),
    mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
    cohort AS (
      SELECT f.k, f.t0, s.t1, mx.md
      FROM f LEFT JOIN s USING (k), mx),
    b AS (
      SELECT CASE WHEN t1 IS NOT NULL
                  THEN date_diff('day', t0, t1) // 30
                  ELSE date_diff('day', t0, md) // 30 END AS bucket,
             t1 IS NOT NULL AS ev
      FROM cohort),
    g AS (
      SELECT bucket,
             CAST(COUNT_IF(ev) AS BIGINT) AS n_events,
             CAST(COUNT_IF(NOT ev) AS BIGINT) AS n_censored
      FROM b GROUP BY 1),
    ar AS (
      SELECT bucket, n_events, n_censored,
             CAST(SUM(n_events + n_censored)
                  OVER (ORDER BY bucket DESC) AS BIGINT) AS at_risk
      FROM g)
    SELECT bucket, bucket * 30 AS day_lo, at_risk, n_events,
           n_censored,
           CAST(n_events AS DOUBLE) / CAST(at_risk AS DOUBLE) AS hazard
    FROM ar
    """,
    tags=("analytics", "survival", "hazard", "churn", "life-table"),
)
def customer_second_order_hazard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discrete-time hazard table for time-to-second-order per customer
    (operators/analytics.py:second_event_hazard, 30-day buckets):
    single-order customers censor at the observation horizon instead of
    vanishing (dropping them inflates early hazards — the classic churn
    mistake); at_risk is a reverse cumsum over the bucket-grain frame;
    hazard is one exact division per bucket. The engine-exact life
    table underneath Kaplan-Meier — the cumulative Π(1−h) is the one
    cross-row float product left to the caller."""
    from ..operators.analytics import second_event_hazard

    od = load_table(spark, sf_dir, "orders")
    return second_event_hazard(
        od, "o_custkey", "o_orderdate", "o_orderkey", bucket_days=30
    )


@query(
    "orders_market_basket_triples",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    nb AS (
      SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n_baskets
      FROM items),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 3 AND 50),
    tri AS (
      SELECT i1.item AS a, i2.item AS b, i3.item AS c,
             CAST(COUNT(*) AS BIGINT) AS triple_n
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN items i3 ON i1.basket = i3.basket AND i2.item < i3.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
    SELECT a AS item_a, b AS item_b, c AS item_c, triple_n,
           CAST(triple_n AS DOUBLE) / CAST(nb.n_baskets AS DOUBLE)
             AS support
    FROM tri, nb
    ORDER BY triple_n DESC, item_a, item_b, item_c
    LIMIT 20
    """,
    tags=("analytics", "market-basket", "itemsets", "triples"),
)
def orders_market_basket_triples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 frequent part TRIPLES across order baskets
    (operators/analytics.py:triple_counts) — the 3-itemset
    associations pair mining cannot see. Same sorted-array posting
    explode as the pair miner with a tighter basket cap (cost is
    basket³), one keyed triple aggregate, a 1-row basket-count rider
    for support, deterministic (count DESC, a, b, c) top-k."""
    from ..operators.analytics import triple_counts

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    ).distinct()
    return triple_counts(
        items, min_triple_count=2, max_basket_size=50, top_k=20
    )


@query(
    "events_haar_energy",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    d0 AS (SELECT MIN(d) AS m FROM daily),
    spine AS (
      SELECT CAST(g.i AS BIGINT) AS i
      FROM unnest(generate_series(0, 63)) AS g(i)),
    a0 AS (
      SELECT s.i, COALESCE(dy.x, 0) AS a
      FROM spine s
      LEFT JOIN daily dy ON dy.d - (SELECT m FROM d0) = s.i),
    l1 AS (
      SELECT i // 2 AS i, CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS dc
      FROM a0 GROUP BY 1),
    l2 AS (
      SELECT i // 2 AS i, CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS dc
      FROM l1 GROUP BY 1),
    l3 AS (
      SELECT i // 2 AS i, CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS dc
      FROM l2 GROUP BY 1),
    l4 AS (
      SELECT i // 2 AS i, CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS dc
      FROM l3 GROUP BY 1),
    l5 AS (
      SELECT i // 2 AS i, CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS dc
      FROM l4 GROUP BY 1),
    l6 AS (
      SELECT i // 2 AS i, CAST(SUM(a) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS dc
      FROM l5 GROUP BY 1)
    SELECT 1 AS level, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
           CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DECIMAL(38,0)) AS energy
    FROM l1
    UNION ALL SELECT 2, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DECIMAL(38,0)) FROM l2
    UNION ALL SELECT 3, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DECIMAL(38,0)) FROM l3
    UNION ALL SELECT 4, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DECIMAL(38,0)) FROM l4
    UNION ALL SELECT 5, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DECIMAL(38,0)) FROM l5
    UNION ALL SELECT 6, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DECIMAL(38,0)) FROM l6
    """,
    tags=("analytics", "timeseries", "wavelet", "haar",
          "multi-resolution"),
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy profile of the daily event-count series
    (operators/analytics.py:haar_energy, 64-day dyadic window from the
    first observed day): per level, the exact integer energy of the
    unnormalized detail coefficients — which resolution (daily jitter,
    ~weekly, regime) carries the variance. Pure ± integer cascades
    over the day-grain reduced frame; the oracle unrolls the six
    levels as chained CTEs."""
    from ..operators.analytics import haar_energy

    ev = load_table(spark, sf_dir, "events")
    return haar_energy(ev, window_days=64)


@query(
    "events_dow_type_chi2",
    oracle="""
    WITH cells AS (
      SELECT dayofweek(CAST(ts AS DATE)) + 1 AS r, event_type AS c,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT r, c, n,
             CAST(SUM(n) OVER (PARTITION BY r) AS BIGINT) AS rt,
             CAST(SUM(n) OVER (PARTITION BY c) AS BIGINT) AS ct,
             CAST(SUM(n) OVER () AS BIGINT) AS gt
      FROM cells)
    SELECT CAST(r AS INTEGER) AS dow, c AS event_type, n,
           CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE)
             AS expected,
           (CAST(n AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                / CAST(gt AS DOUBLE))
           * (CAST(n AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                / CAST(gt AS DOUBLE))
           / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
              / CAST(gt AS DOUBLE)) AS chi2_contrib
    FROM tot
    """,
    tags=("analytics", "chi-square", "seasonality", "contingency"),
)
def events_dow_type_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the event-type mix independent of weekday? Per-cell
    chi-square contingency (operators/profile.py:contingency_chi2) of
    day-of-week x event_type — the computed-categorical variant of the
    status-priority audit (Spark dayofweek is 1=Sunday, matched by
    DuckDB dayofweek+1, the dim_date convention). Same single-scan,
    window-totals-over-reduced-cells plan."""
    from ..operators.profile import contingency_chi2

    ev = load_table(spark, sf_dir, "events").select(
        F.dayofweek(F.to_date("ts")).alias("dow"), "event_type"
    )
    return contingency_chi2(ev, "dow", "event_type")


@query(
    "events_bootstrap_ci",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    series AS (
      SELECT ROW_NUMBER() OVER (ORDER BY d) - 1 AS i, x FROM daily),
    nrow AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS total FROM daily),
    grid AS (
      SELECT b.b,
             (CAST('0x' || substr(md5('bs|' || CAST(b.b AS VARCHAR)
                    || '|' || CAST(j.j AS VARCHAR)), 1, 8) AS BIGINT)
              % n.n) AS i
      FROM nrow n,
           unnest(generate_series(0, 199)) AS b(b),
           unnest(generate_series(0, n.n - 1)) AS j(j)),
    means AS (
      SELECT g.b, CAST(SUM(s.x) AS BIGINT) AS s
      FROM grid g JOIN series s USING (i) GROUP BY 1),
    m2 AS (
      SELECT b, CAST(s AS DOUBLE) / CAST(n.n AS DOUBLE) AS m,
             n.n AS n, n.total AS total
      FROM means, nrow n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM m2)
    SELECT MAX(n) AS n_days,
           CAST(200 AS BIGINT) AS n_boot,
           CAST(MAX(total) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
             AS mean_obs,
           MIN(CASE WHEN rn = 5 THEN m END) AS ci_lo,
           MIN(CASE WHEN rn = 196 THEN m END) AS ci_hi
    FROM ranked
    """,
    tags=("analytics", "bootstrap", "confidence-interval", "resampling"),
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% percentile-bootstrap CI for the mean daily event volume
    (operators/analytics.py:bootstrap_mean_ci, B=200): a DETERMINISTIC
    bootstrap — resample draws pick day indexes via the md5 hash idiom
    instead of an RNG, so plans, means and CI bounds are bit-identical
    across engines and runs. The draw grid explodes off the 1-row day
    count (B·n_days rows, calendar-bounded); each mean is one exact
    BIGINT sum + one division; the CI is exact rank selection over the
    200-row means frame."""
    from ..operators.analytics import bootstrap_mean_ci

    ev = load_table(spark, sf_dir, "events")
    return bootstrap_mean_ci(ev, n_boot=200)


@query(
    "events_type_user_simpson",
    oracle="""
    WITH cc AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    sums AS (
      SELECT event_type,
             CAST(SUM(CAST(n AS HUGEINT)) AS HUGEINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS num
      FROM cc GROUP BY 1)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           k AS n_categories,
           CASE WHEN n < 2 THEN NULL
                ELSE CAST(CAST(num AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE)
           END AS simpson,
           CASE WHEN n < 2 THEN NULL
                ELSE CAST(1 AS DOUBLE)
                     - CAST(CAST(num AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE)
           END AS gini_simpson
    FROM sums
    """,
    tags=("analytics", "diversity", "simpson", "concentration"),
)
def events_type_user_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user concentration per event type
    (operators/profile.py:simpson_diversity over (event_type,
    user_id)): the exact probability two random events of a type come
    from the SAME user — λ near 1 means a type is one bot/power-user's
    traffic, λ near 1/users means broad adoption; the log-free
    concentration scalar an abuse triage reads per event class."""
    from ..operators.profile import simpson_diversity

    ev = load_table(spark, sf_dir, "events")
    return simpson_diversity(ev, "event_type", "user_id")


@query(
    "events_funnel_by_variant",
    oracle="""SELECT * FROM (
    WITH s0 AS (
      SELECT user_id AS u, MIN(ts) AS entry_ts FROM events
      WHERE event_type = 'signup' AND user_id % 2 = 0 GROUP BY 1
    ),
    s1 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s0 ON e.user_id = s0.u AND e.ts > s0.entry_ts
      WHERE e.event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.entry_ts
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.entry_ts
      WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    stages AS (
      SELECT 0 AS stage_idx, 'signup' AS stage,
             CAST(COUNT(*) AS BIGINT) AS users FROM s0
      UNION ALL SELECT 1, 'view', CAST(COUNT(*) AS BIGINT) FROM s1
      UNION ALL SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT 0 AS variant, stage_idx, stage, users,
           CAST(users AS DOUBLE)
             / LAG(users) OVER (ORDER BY stage_idx) AS conv_from_prev,
           CAST(users AS DOUBLE)
             / FIRST_VALUE(users) OVER (ORDER BY stage_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS conv_from_first
    FROM stages)
    UNION ALL BY NAME
    SELECT * FROM (
    WITH s0 AS (
      SELECT user_id AS u, MIN(ts) AS entry_ts FROM events
      WHERE event_type = 'signup' AND user_id % 2 = 1 GROUP BY 1
    ),
    s1 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s0 ON e.user_id = s0.u AND e.ts > s0.entry_ts
      WHERE e.event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.entry_ts
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.entry_ts
      WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    stages AS (
      SELECT 0 AS stage_idx, 'signup' AS stage,
             CAST(COUNT(*) AS BIGINT) AS users FROM s0
      UNION ALL SELECT 1, 'view', CAST(COUNT(*) AS BIGINT) FROM s1
      UNION ALL SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
      UNION ALL SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    )
    SELECT 1 AS variant, stage_idx, stage, users,
           CAST(users AS DOUBLE)
             / LAG(users) OVER (ORDER BY stage_idx) AS conv_from_prev,
           CAST(users AS DOUBLE)
             / FIRST_VALUE(users) OVER (ORDER BY stage_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS conv_from_first
    FROM stages)
    """,
    tags=("analytics", "funnel", "ab-test", "experiment"),
)
def events_funnel_by_variant(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ordered product funnel split by the A/B parity arm (the
    events_ab_lift assignment): per variant, users reaching each stage
    in order plus step/overall conversion — the stage-level view the
    one-row lift readout cannot give (WHICH step the treatment moved).
    Two shrinking per-arm funnel DAGs (each one keyed MIN agg + user
    equi-join per stage) unioned at the plan level; the arm filter
    composes with the stage-0 aggregate so later stages inherit
    membership through the user join. Non-negative user ids by the
    events contract (parity on negatives is engine-divergent)."""
    from ..operators.relational import union_evolved

    ev = load_table(spark, sf_dir, "events")
    arms = []
    for arm in (0, 1):
        f = funnel(
            ev.filter(F.col("user_id") % 2 == arm),
            "user_id", "ts", "event_type", _FUNNEL_STAGES,
        ).select(F.lit(arm).alias("variant"), "*")
        arms.append(f)
    return union_evolved(arms)


@query(
    "events_user_lifespan_deciles",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             date_diff('day', MIN(CAST(ts AS DATE)),
                       MAX(CAST(ts AS DATE))) + 1 AS span
      FROM events GROUP BY 1),
    v AS (
      SELECT span, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM spans GROUP BY 1),
    c AS (
      SELECT span, cnt,
             CAST(SUM(cnt) OVER (ORDER BY span) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM v),
    deciles AS (SELECT unnest(generate_series(1, 10)) AS d)
    SELECT CAST(d.d AS INTEGER) AS decile,
           MIN(c.span) AS span_days
    FROM deciles d
    JOIN c ON c.cum * 10 >= c.n * d.d
    GROUP BY 1
    """,
    tags=("analytics", "lifespan", "deciles", "distribution"),
)
def events_user_lifespan_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact deciles of the per-user active lifespan (days between
    first and last event, inclusive) — the engagement-duration
    distribution a retention team reads next to the cohort matrix.
    Decile d = the smallest span whose cumulative user count reaches
    d/10 of users, tested as the EXACT integer cross-multiplication
    cum·10 >= n·d (no float at the boundary). Raw users reduce to
    span-VALUE grain before the cumsum window (the Lorenz pattern);
    the decile probe explodes a 10-literal array and equi-reduces by
    decile."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        (
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
            + 1
        ).alias("span")
    )
    v = spans.groupBy("span").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = Window.orderBy("span").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        "span",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    probed = c.select(
        "span", "cum", "n",
        F.explode(
            F.array(*[F.lit(d) for d in range(1, 11)])
        ).alias("decile"),
    ).filter(F.col("cum") * 10 >= F.col("n") * F.col("decile"))
    return probed.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.min("span").alias("span_days")
    )


@query(
    "events_ewma_halflife",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT k, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
    spine AS (
      SELECT b.k, g.d
      FROM bounds b, unnest(generate_series(b.d0, b.d1)) AS g(d)),
    dense AS (
      SELECT s.k, s.d, COALESCE(dy.x, 0) AS x
      FROM spine s LEFT JOIN daily dy ON dy.k = s.k AND dy.d = s.d),
    contrib AS (
      SELECT c.k, c.d + g.lag AS td,
             c.x * (1 << (7 - g.lag)) AS wx,
             CASE WHEN g.lag = 0 THEN c.x END AS x0
      FROM dense c, unnest(generate_series(0, 7)) AS g(lag)),
    agg AS (
      SELECT k, td,
             CAST(SUM(wx) AS BIGINT) AS ewma_scaled,
             CAST(SUM(x0) AS BIGINT) AS cnt
      FROM contrib GROUP BY 1, 2)
    SELECT a.k AS event_type, CAST(a.td AS INTEGER) AS d,
           COALESCE(a.cnt, 0) AS cnt, a.ewma_scaled,
           CAST(a.ewma_scaled AS DOUBLE) / CAST(255 AS DOUBLE) AS ewma
    FROM agg a JOIN bounds b ON b.k = a.k
    WHERE a.td >= b.d0 + 7 AND a.td <= b.d1
    """,
    tags=("analytics", "timeseries", "ewma", "smoothing"),
)
def events_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-day-half-life EWMA of each event type's daily count series
    (operators/timeseries.py:ewma_daily_counts): the smoothed-volume
    baseline behind alerting and trend dashboards, computed with an
    exact power-of-two weight kernel (weights 128..1 over a trailing
    8-day window, normalizer 255) so the weighted sum is one exact
    BIGINT and the EWMA is a single IEEE division — no float
    accumulation order anywhere. Day-grain throughout: raw events
    reduce map-side first; the kernel is an 8-literal array explode on
    day-grain rows."""
    from ..operators.timeseries import ewma_daily_counts

    ev = load_table(spark, sf_dir, "events")
    return ewma_daily_counts(ev, "event_type", "ts", window_days=8)


@query(
    "events_rolling_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    framed AS (
      SELECT k, d, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_obs,
             CAST(SUM(d) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(d * y) OVER w AS BIGINT) AS sxy,
             CAST(SUM(d * d) OVER w AS BIGINT) AS sxx
      FROM daily
      WINDOW w AS (PARTITION BY k ORDER BY d
                   RANGE BETWEEN 27 PRECEDING AND CURRENT ROW))
    SELECT k AS event_type, CAST(d AS INTEGER) AS d, y, n_obs,
           CASE WHEN n_obs * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n_obs * sxy - sx * sy AS DOUBLE)
                     / CAST(n_obs * sxx - sx * sx AS DOUBLE)
           END AS slope
    FROM framed
    """,
    tags=("analytics", "timeseries", "regression", "trend"),
)
def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 28-day OLS trend of each event type's daily counts at
    every observed day (operators/timeseries.py:rolling_trend_slope) —
    the "is this accelerating?" local-slope feature, regressed over
    the SPARSE series via a RANGE frame (outage days contribute no
    fabricated zeros). All five frame moments are exact BIGINTs over
    day-grain rows; the slope is one IEEE division, NULL on
    single-day frames. One reduction shuffle + one day-grain window
    exchange."""
    from ..operators.timeseries import rolling_trend_slope

    ev = load_table(spark, sf_dir, "events")
    return rolling_trend_slope(ev, "event_type", "ts", window_days=28)


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled-CTE replay of the synchronous k-core peel: e0 is the
    same co-purchase pair CTE as the pagerank/triangles oracles; each
    round r filters e{r-1} to endpoints with degree >= k; the stats
    block unions one (round, nodes, edges) aggregate per generation."""
    head = """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    e0 AS MATERIALIZED (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f""",
    s{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT a AS node FROM e{r - 1}
        UNION ALL SELECT b FROM e{r - 1})
      GROUP BY 1 HAVING COUNT(*) >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{r - 1} e
      JOIN s{r} x ON x.node = e.a
      JOIN s{r} y ON y.node = e.b)""")
    stats = "\n    UNION ALL\n    ".join(
        f"""SELECT {r} AS round,
           CAST(COUNT(DISTINCT node) AS BIGINT) AS nodes,
           CAST(COUNT(*) // 2 AS BIGINT) AS edges
    FROM (SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})"""
        for r in range(rounds + 1)
    )
    return head + "".join(steps) + "\n    " + stats


_KCORE_K, _KCORE_ROUNDS = 3, 12


@query(
    "part_copurchase_kcore",
    oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS),
    tags=("graph", "kcore", "iterative", "dense-subgraph"),
)
def part_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous 3-core peel trajectory of the part co-purchase
    graph (operators/graph.py:kcore_peel): per round, delete every
    part with fewer than 3 strong co-purchase partners and report
    (round, nodes, edges) — the dense-cohesive-core extraction whose
    convergence (last two rows equal) is visible in the output. Per
    round one endpoint-grain degree agg + two keyed semi-joins, eager
    checkpoint to keep lineage linear; the oracle replays all rounds
    as unrolled CTEs."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import kcore_peel

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    return kcore_peel(
        pairs.select(F.col("item_a").alias("a"), F.col("item_b").alias("b")),
        k=_KCORE_K,
        rounds=_KCORE_ROUNDS,
    )


@query(
    "part_substitution_candidates",
    oracle="""
    WITH p AS (
      SELECT p_partkey AS k, p_type, p_size,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM part),
    cand AS (
      SELECT a.k AS part_a, b.k AS part_b, a.p_type, a.p_size,
             a.cents AS cents_a, b.cents AS cents_b
      FROM p a JOIN p b ON b.p_type = a.p_type AND b.p_size = a.p_size
           AND a.k < b.k
      WHERE 20 * abs(a.cents - b.cents) <= LEAST(a.cents, b.cents)),
    items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2)
    SELECT c.part_a, c.part_b, c.p_type, c.p_size, c.cents_a, c.cents_b
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM pairs pr
                      WHERE pr.a = c.part_a AND pr.b = c.part_b)
    """,
    tags=("analytics", "retail", "substitution", "anti-join"),
)
def part_substitution_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Substitute-product candidates
    (operators/analytics.py:substitution_candidates): parts of the
    same type and size within 5% price of each other that were NEVER
    bought together — catalog-attribute interchangeability minus
    observed complementarity, the out-of-stock recommendation and
    assortment-rationalization list. Equi-blocked on (type, size) so
    no all-pairs, integer-cents price band, one keyed LEFT ANTI join
    against the co-occurrence pair frame."""
    from ..operators.analytics import pair_counts, substitution_candidates

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    cop = pair_counts(items, min_pair_count=1, max_basket_size=200)
    return substitution_candidates(part, cop, band_den=20)


@query(
    "events_user_regularity",
    oracle="""
    WITH seq AS (
      SELECT user_id AS u,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) - epoch_us(ts) AS g
      FROM events),
    pu AS (
      SELECT u, CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
             CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
      FROM seq WHERE g IS NOT NULL GROUP BY 1
      HAVING COUNT(*) >= 3),
    cls AS (
      SELECT CASE WHEN sg * sg = 0 THEN 'regular'
                  WHEN (n * sgg - sg * sg) * 4 <= sg * sg
                    THEN 'regular'
                  WHEN (n * sgg - sg * sg) <= sg * sg * 2
                    THEN 'poisson'
                  ELSE 'bursty' END AS regularity_class
      FROM pu),
    census AS (
      SELECT regularity_class, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM cls GROUP BY 1)
    SELECT regularity_class, n_users,
           CAST(n_users AS DOUBLE)
             / CAST(CAST(SUM(n_users) OVER () AS BIGINT) AS DOUBLE)
             AS share
    FROM census
    """,
    tags=("analytics", "cadence", "regularity", "bot-detection"),
)
def events_user_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of users by inter-event cadence regularity
    (operators/analytics.py:user_gap_regularity): squared coefficient
    of variation of each user's gap series classifies metronome-like
    automation (CV² ≤ 1/4), memoryless human cadence (≤ 2) and bursty
    sessioning — classes decided by exact integer
    cross-multiplication over DECIMAL(38,0) moments, never a float.
    One user-keyed window exchange + user-grain reduction +
    3-row census."""
    from ..operators.analytics import user_gap_regularity

    ev = load_table(spark, sf_dir, "events")
    return user_gap_regularity(ev, min_gaps=3)


@query(
    "orders_ship_sla_quantiles",
    oracle="""
    WITH j AS (
      SELECT o_orderpriority AS g,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) AS d
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    v AS (
      SELECT g, d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM j GROUP BY 1, 2),
    c AS (
      SELECT g, d, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY d)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM v)
    SELECT g AS o_orderpriority, MAX(n) AS n_rows,
           CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN d END)
                AS INTEGER) AS p50,
           CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN d END)
                AS INTEGER) AS p90,
           CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN d END)
                AS INTEGER) AS p99,
           CAST(CAST(SUM(CASE WHEN d > 60 THEN cnt ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
             / CAST(MAX(n) AS DOUBLE) AS pct_over_60
    FROM c GROUP BY 1
    """,
    tags=("analytics", "sla", "percentiles", "exact-quantiles"),
)
def orders_ship_sla_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-to-ship SLA table per order priority
    (operators/analytics.py:grouped_value_percentiles): p50/p90/p99
    shipping delay in days plus the share of lines over a 60-day
    contract — percentile boundaries decided by exact integer
    cross-multiplication on the value-grain cumulative (the Lorenz
    pattern: the fact reduces to (priority, delay-days) grain
    map-side before any window), the kind of customer-facing number
    an approx sketch can't sign off. One fact-fact equi-join + one
    reduction shuffle + one value-grain window exchange."""
    from ..operators.analytics import grouped_value_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("ship_delay_days"),
    )
    return grouped_value_percentiles(
        j, "o_orderpriority", "ship_delay_days",
        percentiles=(50, 90, 99), over_threshold=60,
    )


def _stationary_oracle(scale: int, iters: int) -> str:
    """Unrolled replay of markov_stationary: shared lead-window counts,
    then ``iters`` integer v' = vP steps with div-floor renormalization."""
    head = f"""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
      FROM events),
    counts AS MATERIALIZED (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
    cells AS MATERIALIZED (
      SELECT from_type, to_type, n,
             CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS rs
      FROM counts),
    nt AS (SELECT CAST(COUNT(DISTINCT from_type) AS BIGINT) AS k
           FROM cells),
    v0 AS (SELECT DISTINCT from_type AS t,
                  CAST(CAST({scale} AS BIGINT) // nt.k AS BIGINT) AS v
           FROM cells, nt)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
    s{i} AS MATERIALIZED (
      SELECT c.to_type AS t2,
             CAST(SUM((CAST(p.v AS HUGEINT) * c.n) // c.rs)
                  AS HUGEINT) AS m
      FROM cells c JOIN v{i - 1} p ON p.t = c.from_type GROUP BY 1),
    tt{i} AS (SELECT CAST(SUM(m) AS HUGEINT) AS tot FROM s{i}),
    v{i} AS (
      SELECT s.t2 AS t,
             CAST((CAST({scale} AS HUGEINT) * s.m) // tt.tot AS BIGINT)
               AS v
      FROM s{i} s, tt{i} tt)""")
    tail = f"""
    SELECT t AS event_type, v AS stationary_scaled,
           CAST(v AS DOUBLE) / {float(scale)} AS stationary
    FROM v{iters}
    """
    return head + "".join(steps) + tail


_MS_SCALE, _MS_ITERS = 10**9, 12


@query(
    "events_markov_stationary",
    oracle=_stationary_oracle(_MS_SCALE, _MS_ITERS),
    tags=("analytics", "markov", "iterative", "integer-exact"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain
    (operators/analytics.py:markov_stationary): 12 integer-scaled
    v' ← vᵀP steps from uniform, with div-floor renormalization each
    step so quantization cannot compound — the long-run "where does
    behavior settle" vector next to the transition matrix. Corpus
    scanned once (the transition-count reduction is shared with
    events_transition_matrix and checkpointed); each step is one
    equi-join + keyed sum over the |types|²-cell frame; the oracle
    replays all 12 steps in unrolled SQL."""
    from ..operators.analytics import markov_stationary

    ev = load_table(spark, sf_dir, "events")
    return markov_stationary(ev, iterations=_MS_ITERS, scale=_MS_SCALE)


@query(
    "events_funnel_latency",
    oracle="""
    WITH s0 AS (
      SELECT user_id AS u, MIN(ts) AS entry_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    s1 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s0 ON e.user_id = s0.u AND e.ts > s0.entry_ts
      WHERE e.event_type = 'view' GROUP BY 1),
    s2 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.entry_ts
      WHERE e.event_type = 'click' GROUP BY 1),
    s3 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS entry_ts
      FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.entry_ts
      WHERE e.event_type = 'purchase' GROUP BY 1),
    gaps AS (
      SELECT 'signup->view' AS transition,
             (epoch_us(b.entry_ts) - epoch_us(a.entry_ts)) // 60000000
               AS d
      FROM s0 a JOIN s1 b USING (u)
      UNION ALL
      SELECT 'view->click',
             (epoch_us(b.entry_ts) - epoch_us(a.entry_ts)) // 60000000
      FROM s1 a JOIN s2 b USING (u)
      UNION ALL
      SELECT 'click->purchase',
             (epoch_us(b.entry_ts) - epoch_us(a.entry_ts)) // 60000000
      FROM s2 a JOIN s3 b USING (u)),
    v AS (
      SELECT transition, d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM gaps GROUP BY 1, 2),
    c AS (
      SELECT transition, d, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY transition ORDER BY d)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY transition) AS BIGINT) AS n
      FROM v)
    SELECT transition, MAX(n) AS n_rows,
           MIN(CASE WHEN cum * 100 >= n * 50 THEN d END) AS p50,
           MIN(CASE WHEN cum * 100 >= n * 90 THEN d END) AS p90
    FROM c GROUP BY 1
    """,
    tags=("analytics", "funnel", "latency", "exact-quantiles"),
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-to-stage conversion latency of the product funnel
    (operators/analytics.py:funnel_stage_latency): exact p50/p90
    minutes between a converted user's consecutive stage entries —
    the "where does the funnel stall" companion to the stage-count
    funnel, sharing its ordered entry chain. Latencies floor to
    minute buckets so percentiles run value-grain with integer
    boundary tests."""
    from ..operators.analytics import funnel_stage_latency

    ev = load_table(spark, sf_dir, "events")
    return funnel_stage_latency(
        ev, "user_id", "ts", "event_type", _FUNNEL_STAGES, bucket_s=60
    )


@query(
    "part_also_bought_topk",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b, CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    totals AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n_b FROM items GROUP BY 1),
    sym AS (
      SELECT a AS i, b AS j, pair_n FROM pairs
      UNION ALL SELECT b, a, pair_n FROM pairs),
    scored AS (
      SELECT s.i, s.j, s.pair_n,
             CAST(s.pair_n AS DOUBLE)
               / (sqrt(CAST(ti.n_b AS DOUBLE))
                  * sqrt(CAST(tj.n_b AS DOUBLE))) AS score
      FROM sym s
      JOIN totals ti ON ti.item = s.i
      JOIN totals tj ON tj.item = s.j),
    r AS (
      SELECT i, j, pair_n, score,
             ROW_NUMBER() OVER (PARTITION BY i
               ORDER BY score DESC, j ASC) AS rnk
      FROM scored)
    SELECT i AS item, CAST(rnk AS INTEGER) AS rank, j AS also_bought,
           pair_n, score
    FROM r WHERE rnk <= 3
    """,
    tags=("analytics", "recommendation", "collaborative-filtering"),
)
def part_also_bought_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Customers also bought" top-3 per part
    (operators/analytics.py:also_bought_topk): cosine-normalized
    co-purchase scores n_ab/(√n_a·√n_b) over the basket-bounded pair
    expansion, ranked per item with a deterministic (score DESC, key)
    tie-break — the item-item collaborative-filtering table, where
    normalization stops popular staples from topping every list. IEEE
    sqrt tree over exact longs; per-item window bounded by co-purchase
    degree."""
    from ..operators.analytics import also_bought_topk

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    return also_bought_topk(items, k=3)


@query(
    "orders_revenue_bridge",
    oracle="""
    WITH y0 AS (
      SELECT p.p_brand AS g,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) AS r0,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q0
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(o.o_orderdate) = 1999 GROUP BY 1),
    y1 AS (
      SELECT p.p_brand AS g,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) AS r1,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q1
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(o.o_orderdate) = 2000 GROUP BY 1),
    j AS (
      SELECT COALESCE(y0.g, y1.g) AS g,
             CAST(CAST(COALESCE(y0.r0, 0) AS VARCHAR) AS DOUBLE) AS r0,
             CAST(CAST(COALESCE(y1.r1, 0) AS VARCHAR) AS DOUBLE) AS r1,
             CAST(CAST(COALESCE(y0.q0, 0) AS VARCHAR) AS DOUBLE) AS q0,
             CAST(CAST(COALESCE(y1.q1, 0) AS VARCHAR) AS DOUBLE) AS q1
      FROM y0 FULL JOIN y1 ON y1.g = y0.g)
    SELECT g AS p_brand, r0, r1, r1 - r0 AS delta,
           CASE WHEN q0 = 0.0 THEN NULL
                ELSE (q1 - q0) * (r0 / q0) END AS volume_effect,
           CASE WHEN q0 = 0.0 OR q1 = 0.0 THEN NULL
                ELSE q1 * ((r1 / q1) - (r0 / q0)) END AS price_effect
    FROM j
    """,
    tags=("analytics", "finance", "bridge", "decomposition"),
)
def orders_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge per brand, 1999 → 2000
    (operators/analytics.py:revenue_bridge): the FP&A waterfall
    ΔR = (Q1−Q0)·P0 + Q1·(P1−P0) splitting each brand's revenue move
    into volume-at-old-prices and price-at-new-volume effects —
    aggregate-level prices so every effect is scalar IEEE math over
    exact decimal sums. Two pruned fact scans reduced to brand grain
    map-side, one #brands-row full-outer join."""
    from ..operators.analytics import revenue_bridge

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    return revenue_bridge(li, od, part, 1999, 2000, "p_brand")


def _khop_oracle(hops: int) -> str:
    """Unrolled replay of khop_reachability on the co-purchase graph:
    deterministic max-degree/min-key seed, then ``hops`` frontier
    expansions with NOT-IN visited exclusion; n_new via one lag."""
    head = """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    e0 AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    sym AS MATERIALIZED (
      SELECT a AS s, b AS d FROM e0
      UNION ALL SELECT b, a FROM e0),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY 1),
    mx AS (SELECT MAX(dg) AS m FROM deg),
    v0 AS MATERIALIZED (
      SELECT MIN(s) AS node FROM deg, mx WHERE deg.dg = mx.m),
    f0 AS (SELECT node FROM v0)"""
    steps = []
    for h in range(1, hops + 1):
        steps.append(f""",
    n{h} AS (
      SELECT DISTINCT sym.d AS node
      FROM sym JOIN f{h - 1} f ON f.node = sym.s),
    f{h} AS MATERIALIZED (
      SELECT node FROM n{h}
      WHERE node NOT IN (SELECT node FROM v{h - 1})),
    v{h} AS MATERIALIZED (
      SELECT node FROM v{h - 1} UNION ALL SELECT node FROM f{h})""")
    traj = "\n      UNION ALL ".join(
        f"SELECT {h} AS hop, (SELECT CAST(COUNT(*) AS BIGINT) "
        f"FROM v{h}) AS n_reached"
        for h in range(hops + 1)
    )
    tail = f""",
    traj AS ({traj})
    SELECT CAST(hop AS INTEGER) AS hop, n_reached,
           CAST(n_reached
                - COALESCE(lag(n_reached) OVER (ORDER BY hop), 0)
                AS BIGINT) AS n_new
    FROM traj
    """
    return head + "".join(steps) + tail


_KHOP_HOPS = 4


@query(
    "part_copurchase_khop",
    oracle=_khop_oracle(_KHOP_HOPS),
    tags=("graph", "bfs", "reachability", "iterative"),
)
def part_copurchase_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ego-network growth from the co-purchase hub part
    (operators/graph.py:khop_reachability): 4 synchronous BFS hops
    from the max-degree node (min-key tie-break), reporting the
    cumulative and per-hop reach — the blast-radius readout behind
    influence and contamination-spread analysis. Per hop one keyed
    frontier join + distinct + anti-join, eagerly checkpointed; the
    oracle replays every hop as unrolled MATERIALIZED CTEs."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import khop_reachability

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    return khop_reachability(
        pairs.select(F.col("item_a").alias("a"), F.col("item_b").alias("b")),
        hops=_KHOP_HOPS,
    )


@query(
    "events_click_purchase_xcorr",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (
      SELECT g.d
      FROM bounds, unnest(generate_series(bounds.d0, bounds.d1))
        AS g(d)),
    dx AS (
      SELECT s.d, COALESCE(a.x, 0) AS vx
      FROM spine s LEFT JOIN daily a
        ON a.k = 'click' AND a.d = s.d),
    dyy AS (
      SELECT s.d, COALESCE(b.x, 0) AS vy
      FROM spine s LEFT JOIN daily b
        ON b.k = 'purchase' AND b.d = s.d),
    sh AS (
      SELECT g.lag, dyy.d - g.lag AS d, dyy.vy
      FROM dyy, unnest(generate_series(-7, 7)) AS g(lag)),
    pairs AS (
      SELECT sh.lag, dx.vx, sh.vy FROM dx JOIN sh ON sh.d = dx.d),
    sums AS (
      SELECT lag,
             CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(CAST(vx AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(vy AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(vx AS HUGEINT) * vy) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(vx AS HUGEINT) * vx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(vy AS HUGEINT) * vy) AS HUGEINT) AS syy
      FROM pairs GROUP BY 1)
    SELECT CAST(lag AS INTEGER) AS lag, CAST(m AS BIGINT) AS n_pairs,
           CASE WHEN sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                               AS DOUBLE))
                     * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(CAST(m * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                                  AS DOUBLE))
                        * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                    AS DOUBLE)))
           END AS xcorr
    FROM sums
    """,
    tags=("analytics", "timeseries", "cross-correlation", "lead-lag"),
)
def events_click_purchase_xcorr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lagged cross-correlation between the click and purchase daily
    series (operators/timeseries.py:daily_cross_correlation): Pearson
    r of (clicks_d, purchases_{d+L}) for L in [−7, 7] over the
    zero-densified common span — the lead-lag readout behind
    attribution-window choice. The lag pairing is a keyed equi join
    of the y series exploded over a 15-literal lag table; exact
    DECIMAL(38,0) moments per lag; day-grain everywhere after the
    map-side reduction."""
    from ..operators.timeseries import daily_cross_correlation

    ev = load_table(spark, sf_dir, "events")
    return daily_cross_correlation(ev, "click", "purchase", max_lag=7)


@query(
    "part_brand_modularity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200),
    e0 AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    tagged AS (
      SELECT pa.p_brand AS ca, pb.p_brand AS cb
      FROM e0
      JOIN part pa ON pa.p_partkey = e0.a
      JOIN part pb ON pb.p_partkey = e0.b),
    deg AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS d_c
      FROM (SELECT ca AS c FROM tagged
            UNION ALL SELECT cb FROM tagged)
      GROUP BY 1),
    i AS (
      SELECT ca AS c, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM tagged WHERE ca = cb GROUP BY 1),
    m2t AS (SELECT CAST(SUM(d_c) AS BIGINT) AS m2 FROM deg),
    terms AS (
      SELECT CAST(deg.c AS VARCHAR) AS community,
             COALESCE(i.e_c, 0) AS e_c, deg.d_c,
             CAST(2 AS HUGEINT) * m2t.m2 * COALESCE(i.e_c, 0)
               - CAST(deg.d_c AS HUGEINT) * deg.d_c AS qn,
             CAST(m2t.m2 AS HUGEINT) * m2t.m2 AS qd
      FROM deg LEFT JOIN i ON i.c = deg.c, m2t)
    SELECT community, e_c, d_c,
           CAST(CAST(qn AS VARCHAR) AS DOUBLE)
             / CAST(CAST(qd AS VARCHAR) AS DOUBLE) AS q_term
    FROM terms
    UNION ALL
    SELECT NULL, NULL, NULL,
           CAST(CAST(SUM(qn) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(MAX(qd) AS VARCHAR) AS DOUBLE)
    FROM terms
    """,
    tags=("graph", "modularity", "community", "integer-exact"),
)
def part_brand_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the BRAND partition of the co-purchase
    graph (operators/graph.py:partition_modularity): per brand the
    within-brand edge share minus its degree-preserving random
    expectation, plus the total Q rider (NULL community row) — "do
    parts co-purchase within their own brand?" scored without any
    community-detection iteration. Every term is the exact rational
    (2·m2·e_c − d_c²)/m2²; Q is one DECIMAL(38,0) numerator sum and
    ONE division — no float accumulation anywhere."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import partition_modularity

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    return partition_modularity(
        pairs.select(F.col("item_a").alias("a"), F.col("item_b").alias("b")),
        part.select(
            F.col("p_partkey").alias("node"),
            F.col("p_brand").alias("community"),
        ),
    )


@query(
    "events_autocorr_spectrum",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type IN ('view', 'view')
      GROUP BY 1, 2),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (
      SELECT g.d
      FROM bounds, unnest(generate_series(bounds.d0, bounds.d1))
        AS g(d)),
    dx AS (
      SELECT s.d, COALESCE(a.x, 0) AS vx
      FROM spine s LEFT JOIN daily a
        ON a.k = 'view' AND a.d = s.d),
    dyy AS (
      SELECT s.d, COALESCE(b.x, 0) AS vy
      FROM spine s LEFT JOIN daily b
        ON b.k = 'view' AND b.d = s.d),
    sh AS (
      SELECT g.lag, dyy.d - g.lag AS d, dyy.vy
      FROM dyy, unnest(generate_series(-14, 14)) AS g(lag)),
    pairs AS (
      SELECT sh.lag, dx.vx, sh.vy FROM dx JOIN sh ON sh.d = dx.d),
    sums AS (
      SELECT lag,
             CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(CAST(vx AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(vy AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(vx AS HUGEINT) * vy) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(vx AS HUGEINT) * vx) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(vy AS HUGEINT) * vy) AS HUGEINT) AS syy
      FROM pairs GROUP BY 1)
    SELECT CAST(lag AS INTEGER) AS lag, CAST(m AS BIGINT) AS n_pairs,
           CASE WHEN sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                               AS DOUBLE))
                     * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                 AS DOUBLE)) = 0
                THEN NULL
                ELSE CAST(CAST(m * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                     / (sqrt(CAST(CAST(m * sxx - sx * sx AS VARCHAR)
                                  AS DOUBLE))
                        * sqrt(CAST(CAST(m * syy - sy * sy AS VARCHAR)
                                    AS DOUBLE)))
           END AS xcorr
    FROM sums
    """,
    tags=("analytics", "timeseries", "autocorrelation", "periodicity"),
)
def events_autocorr_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation spectrum of the view-event daily series —
    daily_cross_correlation with x = y over lags [−14, 14]: the
    periodicity detector (a weekly cycle peaks at ±7) generalizing
    the single-scalar lag-1 autocorr entry. Same day-grain lag-
    explode equi-join machinery and exact DECIMAL(38,0) moments;
    symmetric by construction (lag −L mirrors +L), which doubles as a
    structural self-check in the output."""
    from ..operators.timeseries import daily_cross_correlation

    ev = load_table(spark, sf_dir, "events")
    return daily_cross_correlation(ev, "view", "view", max_lag=14)


@query(
    "events_resurrections",
    oracle="""
    WITH seq AS (
      SELECT user_id AS u,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             lag(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pd
      FROM events),
    res AS (
      SELECT u, d // 7 AS week
      FROM seq WHERE pd IS NOT NULL AND d - pd >= 3)
    SELECT CAST(week AS BIGINT) AS week,
           CAST(COUNT(*) AS BIGINT) AS n_resurrections,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users
    FROM res GROUP BY 1
    """,
    tags=("analytics", "growth-accounting", "resurrection", "retention"),
)
def events_resurrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly resurrected-user counts
    (operators/analytics.py:resurrection_counts): events closing a
    a same-user dormancy gap of ≥3 days (scaled to this fixture's
    30-day event window; production would use 7–14), bucketed by
    epoch week (day div 7 — no week-start convention) — the
    growth-accounting lane a flat DAU curve hides (churn exactly
    offset by resurrection). One user-keyed lag window + week-grain
    reduction."""
    from ..operators.analytics import resurrection_counts

    ev = load_table(spark, sf_dir, "events")
    return resurrection_counts(ev, dormancy_days=3)


@query(
    "events_kendall_tau",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type AS k,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT d FROM daily),
    keys AS (SELECT DISTINCT k FROM daily),
    dense AS (
      SELECT days.d, keys.k, COALESCE(daily.c, 0) AS c
      FROM days CROSS JOIN keys
      LEFT JOIN daily ON daily.d = days.d AND daily.k = keys.k
    ),
    joined AS (
      SELECT a.k AS k_a, b.k AS k_b, a.d, a.c AS x, b.c AS y
      FROM dense a JOIN dense b ON a.d = b.d AND a.k < b.k
    ),
    pairs AS (
      SELECT p1.k_a, p1.k_b, p1.d AS d1,
             p2.x - p1.x AS sx, p2.y - p1.y AS sy
      FROM joined p1 JOIN joined p2
        ON p1.k_a = p2.k_a AND p1.k_b = p2.k_b AND p1.d < p2.d
    ),
    agg AS (
      SELECT k_a, k_b,
             CAST(COUNT(DISTINCT d1) + 1 AS BIGINT) AS n_days,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN (sx > 0 AND sy > 0)
                            OR (sx < 0 AND sy < 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN (sx > 0 AND sy < 0)
                            OR (sx < 0 AND sy > 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
             CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tx,
             CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ty
      FROM pairs GROUP BY 1, 2
    )
    SELECT k_a, k_b, n_days, n_pairs, concordant, discordant,
           CASE WHEN sqrt(CAST(n_pairs - tx AS DOUBLE)
                          * CAST(n_pairs - ty AS DOUBLE)) = 0 THEN NULL
                ELSE CAST(concordant - discordant AS DOUBLE)
                     / sqrt(CAST(n_pairs - tx AS DOUBLE)
                            * CAST(n_pairs - ty AS DOUBLE))
           END AS tau_b
    FROM agg
    """,
    tags=("analytics", "timeseries", "kendall", "rank-correlation",
          "robust"),
)
def events_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between the daily-count series
    of every event-type pair (operators/timeseries.py:
    kendall_tau_daily) — the robust co-movement statistic next to the
    Spearman/Pearson family entries (rank-based via exact pair
    counting, so spike days cannot dominate). Missing days are zero
    activity via the dense calendar x type grid; all five pair
    classifications are exact BIGINTs; tau is one sqrt + one division
    of identical operands in both engines. Day-grain self-join:
    O(types^2 x span^2) pair rows regardless of fact size."""
    from ..operators.timeseries import kendall_tau_daily

    ev = load_table(spark, sf_dir, "events")
    return kendall_tau_daily(ev, "event_type", "ts")


@query(
    "events_theilsen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT k, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
    spine AS (
      SELECT span.k, CAST(gs.g AS DATE) AS d
      FROM span, LATERAL unnest(generate_series(
        CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        INTERVAL 1 DAY)) AS gs(g)
    ),
    dense AS (
      SELECT spine.k, spine.d, COALESCE(daily.c, 0) AS c
      FROM spine LEFT JOIN daily
        ON daily.k = spine.k AND daily.d = spine.d
    ),
    slopes AS (
      SELECT p1.k,
             CAST(p2.c - p1.c AS DOUBLE)
               / CAST(date_diff('day', p1.d, p2.d) AS DOUBLE) AS s
      FROM dense p1 JOIN dense p2
        ON p1.k = p2.k AND p1.d < p2.d
    ),
    ranked AS (
      SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k ORDER BY s) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n_slopes
      FROM slopes
    ),
    med AS (
      SELECT k, n_slopes, (MIN(s) + MAX(s)) / 2.0 AS slope_per_day
      FROM ranked
      WHERE rn = (n_slopes + 1) // 2
         OR rn = n_slopes // 2 + 1
      GROUP BY 1, 2
    ),
    nd AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM dense GROUP BY 1)
    SELECT nd.k AS event_type, nd.n_days, med.n_slopes, med.slope_per_day
    FROM nd JOIN med ON med.k = nd.k
    """,
    tags=("analytics", "timeseries", "theil-sen", "trend", "robust"),
)
def events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type (operators/timeseries.py:
    theilsen_daily_trend): the exact median of all pairwise
    daily-count slopes over the zero-densified day span — the
    29%-breakdown-point alternative to the rolling OLS slope entry.
    Every slope is one IEEE division of exact integers; the median is
    rank selection (lower+upper averaged), so each emitted float is a
    composition of portable operations. Day-grain pair join bounded by
    the calendar, not the fact."""
    from ..operators.timeseries import theilsen_daily_trend

    ev = load_table(spark, sf_dir, "events")
    return theilsen_daily_trend(ev, "event_type", "ts")


@query(
    "orders_backlog_timeline",
    oracle="""
    WITH opened AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n_opened
      FROM orders GROUP BY 1
    ),
    closes AS (
      SELECT MAX(CAST(l_shipdate AS DATE)) AS d
      FROM lineitem GROUP BY l_orderkey
    ),
    closed AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_closed
               FROM closes GROUP BY 1),
    merged AS (
      SELECT COALESCE(o.d, c.d) AS d,
             COALESCE(o.n_opened, 0) AS n_opened,
             COALESCE(c.n_closed, 0) AS n_closed
      FROM opened o FULL OUTER JOIN closed c ON o.d = c.d
    )
    SELECT d, n_opened, n_closed,
           CAST(SUM(n_opened) OVER w - SUM(n_closed) OVER w
                AS BIGINT) AS backlog
    FROM merged
    WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
    tags=("analytics", "backlog", "queue-depth", "timeline"),
)
def orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog (operators/analytics.py:
    backlog_timeline): orders open as of each day, where an order
    opens on o_orderdate and closes when its LAST lineitem ships
    (max l_shipdate per order; an order with no lineitems never
    closes). Exact BIGINT running sums over the day-grain merged
    timeline — the queue-depth series behind fulfillment dashboards.
    Two day-grain aggregations + one calendar-bounded ordered
    window."""
    from ..operators.analytics import backlog_timeline

    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    opened = od.select(F.to_date("o_orderdate").alias("d"))
    closed = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("d")
    ).select("d")
    return backlog_timeline(opened, closed, "d")


@query(
    "part_degree_distribution",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200
    ),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b, CAST(COUNT(*) AS BIGINT) AS w
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (
      SELECT a AS src, b AS dst, w FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst, w FROM pairs
    ),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree,
             CAST(SUM(w) AS BIGINT) AS wsum
      FROM edges GROUP BY 1
    ),
    b AS (
      SELECT CAST(LENGTH(bin(degree)) AS INTEGER) AS bucket,
             MIN(degree) AS min_degree, MAX(degree) AS max_degree,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(wsum) AS BIGINT) AS weight_sum
      FROM deg GROUP BY 1
    )
    SELECT bucket, min_degree, max_degree, n_nodes,
           CAST(n_nodes AS DOUBLE)
             / CAST(SUM(n_nodes) OVER () AS DOUBLE) AS node_share,
           weight_sum,
           CAST(weight_sum AS DOUBLE)
             / CAST(SUM(weight_sum) OVER () AS DOUBLE) AS weight_share
    FROM b
    """,
    tags=("graph", "degree", "histogram", "skew-audit", "planning"),
)
def part_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the part co-purchase graph in power-of-two
    buckets (operators/graph.py:degree_distribution) — the
    hub-structure audit run BEFORE pagerank/triangles/link-prediction:
    mass in high buckets is exactly where per-node joins skew, so this
    is the graph analogue of events_key_skew. Bucketing is the
    portable integer log2 (length of the binary string — no floating
    log in either engine); counts exact; shares one division each over
    the bucket-grain frame."""
    from ..operators.analytics import pair_counts
    from ..operators.graph import degree_distribution

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200)
    edges = pairs.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst"), "pair_n"
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("src"),
            F.col("item_a").alias("dst"),
            "pair_n",
        )
    )
    return degree_distribution(edges, "src", "dst", "pair_n")


@query(
    "part_price_elasticity",
    oracle="""
    WITH sides AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS qty,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l.l_discount AS DECIMAL(12,2)))
                  AS DECIMAL(38,4)) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT lo.brand,
             lo.n_lines AS n_lo, hi.n_lines AS n_hi,
             CAST(CAST(lo.qty AS VARCHAR) AS DOUBLE)
               / CAST(lo.n_lines AS DOUBLE) AS qty_lo,
             CAST(CAST(hi.qty AS VARCHAR) AS DOUBLE)
               / CAST(hi.n_lines AS DOUBLE) AS qty_hi,
             CAST(CAST(lo.rev AS VARCHAR) AS DOUBLE)
               / CAST(CAST(lo.qty AS VARCHAR) AS DOUBLE) AS price_lo,
             CAST(CAST(hi.rev AS VARCHAR) AS DOUBLE)
               / CAST(CAST(hi.qty AS VARCHAR) AS DOUBLE) AS price_hi
      FROM sides lo JOIN sides hi
        ON lo.brand = hi.brand AND lo.hi = 0 AND hi.hi = 1
    )
    SELECT brand, n_lo, n_hi, qty_lo, qty_hi, price_lo, price_hi,
           CASE WHEN (price_hi - price_lo) = 0 THEN NULL
                ELSE ((qty_hi - qty_lo) / (qty_hi + qty_lo))
                     / ((price_hi - price_lo) / (price_hi + price_lo))
           END AS arc_elasticity
    FROM wide
    """,
    tags=("analytics", "commerce", "elasticity", "pricing"),
)
def part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc price elasticity of demand per brand, estimated from the
    discount variation the fixture actually has: lineitems split into
    a low-discount (< 5%) and high-discount (>= 5%) side; per side the
    average line quantity and the average EFFECTIVE unit price
    (discounted revenue / quantity, exact decimal sums divided once);
    elasticity = midpoint %-change in quantity over midpoint %-change
    in price. Every float is a fixed composition of portable IEEE
    divisions of string-cast decimal-exact sums, so the whole chain
    cross-checks bit-for-bit. One grouped aggregation + one brand-grain
    self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    from ..operators.relational import dec

    vol = dec("l_extendedprice", 12, 2) * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,2)")
    sides = (
        # no broadcast hint: part is SF-scaling (AQE picks the strategy;
        # at fixture scale it broadcasts on its own)
        li.join(pt.select("p_partkey", "p_brand"),
                li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.when(F.col("l_discount") >= 0.05, F.lit(1))
            .otherwise(F.lit(0))
            .alias("hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(dec("l_quantity", 12, 2))
            .cast("decimal(38,2)")
            .alias("qty"),
            F.sum(vol).cast("decimal(38,4)").alias("rev"),
        )
    )
    def _dbl(c):
        return c.cast("string").cast("double")

    lo = sides.filter(F.col("hi") == 0).select(
        "brand",
        F.col("n_lines").alias("n_lo"),
        (_dbl(F.col("qty")) / F.col("n_lines").cast("double"))
        .alias("qty_lo"),
        (_dbl(F.col("rev")) / _dbl(F.col("qty"))).alias("price_lo"),
    )
    hi = sides.filter(F.col("hi") == 1).select(
        "brand",
        F.col("n_lines").alias("n_hi"),
        (_dbl(F.col("qty")) / F.col("n_lines").cast("double"))
        .alias("qty_hi"),
        (_dbl(F.col("rev")) / _dbl(F.col("qty"))).alias("price_hi"),
    )
    dp = F.col("price_hi") - F.col("price_lo")
    elast = F.when(dp == 0.0, F.lit(None).cast("double")).otherwise(
        (
            (F.col("qty_hi") - F.col("qty_lo"))
            / (F.col("qty_hi") + F.col("qty_lo"))
        )
        / (dp / (F.col("price_hi") + F.col("price_lo")))
    )
    return lo.join(hi, "brand").select(
        "brand", "n_lo", "n_hi", "qty_lo", "qty_hi",
        "price_lo", "price_hi", elast.alias("arc_elasticity"),
    )


@query(
    "orders_skyline",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ),
    xg AS (SELECT price, MAX(d) AS my FROM pts GROUP BY 1),
    frontier AS (
      SELECT price, my FROM (
        SELECT price, my,
               MAX(my) OVER (ORDER BY price DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS best_above
        FROM xg)
      WHERE best_above IS NULL OR my > best_above
    )
    SELECT p.o_orderkey, p.price, p.d AS order_date
    FROM pts p JOIN frontier f
      ON p.price = f.price AND p.d = f.my
    """,
    tags=("analytics", "skyline", "pareto-frontier", "dominance"),
)
def orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier of orders in (totalprice,
    recency) — the orders no other order beats on BOTH value and
    freshness (operators/analytics.py:skyline_2d), the multi-criteria
    shortlist operator. Window formulation: x-grain reduction, one
    running-max lag over strictly-higher prices, semi-join back —
    O(distinct prices) window rows instead of the naive O(n^2)
    dominance anti-join. Pure comparisons, no arithmetic: bit-exact in
    any engine."""
    from ..operators.analytics import skyline_2d

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.to_date("o_orderdate").alias("order_date"),
    )
    return skyline_2d(od, "price", "order_date", "o_orderkey")


@query(
    "events_audience_overlap",
    oracle="""
    WITH mk AS (
      SELECT DISTINCT user_id AS m, event_type AS k FROM events
    ),
    sizes AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM mk GROUP BY 1),
    inter AS (
      SELECT a.k AS key_a, b.k AS key_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM mk a JOIN mk b ON a.m = b.m AND a.k < b.k
      GROUP BY 1, 2
    )
    SELECT i.key_a, i.key_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.k = i.key_a
    JOIN sizes sb ON sb.k = i.key_b
    """,
    tags=("analytics", "jaccard", "audience", "segmentation"),
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience Jaccard between event types (operators/
    analytics.py:audience_overlap) — how much any two activities share
    their user base, the segmentation/cannibalization audit. Posting-
    list formulation: distinct (user, type) reduction, a per-user
    self-join whose fan-out is bounded by the type cardinality (never
    materializes user sets), exact intersection/set-size integers, one
    division. The set-similarity sibling of doc_source_minhash_overlap
    at exact (non-sketched) cardinalities."""
    from ..operators.analytics import audience_overlap

    ev = load_table(spark, sf_dir, "events")
    return audience_overlap(ev, "event_type", "user_id")


@query(
    "events_hourly_profile",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hr, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
             AS share,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY n DESC, hr) AS INTEGER) AS rnk
    FROM h
    """,
    tags=("analytics", "seasonality", "hour-of-day", "load-shape"),
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load profile per event type: volume, share of the
    type's traffic, and the deterministic peak ranking (count DESC,
    hour ASC) — the intra-day sibling of orders_seasonality_index
    (day-of-week) and the capacity-planning shape behind autoscaling
    schedules. One hour-grain aggregation; shares and ranks from
    windows over the 24 x |types| reduced frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select("event_type", F.hour("ts").alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("hr")
    )
    return h.select(
        "event_type",
        "hr",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double"))
        .alias("share"),
        F.row_number().over(wr).cast("int").alias("rnk"),
    )


def _dow_anova_oracle() -> str:
    """One-way ANOVA effect size with a FIXED-ORDER 7-term SSW sum:
    cross-row float addition is order-dependent, so the per-dow terms
    are pivoted into columns and summed in one literal expression —
    identical parse tree in both engines."""
    cases = []
    for g in range(1, 8):
        cases.append(
            f"CAST(SUM(CASE WHEN dw = {g} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n{g},\n"
            f"         SUM(CASE WHEN dw = {g} THEN x END) AS s{g},\n"
            f"         SUM(CASE WHEN dw = {g} THEN CAST(x AS HUGEINT) * x"
            f" END) AS q{g}"
        )
    ssw_terms = " + ".join(
        f"(CASE WHEN n{g} = 0 THEN 0.0 ELSE "
        f"CAST(CAST(q{g} AS VARCHAR) AS DOUBLE) - "
        f"CAST(CAST(s{g} AS VARCHAR) AS DOUBLE) "
        f"* CAST(CAST(s{g} AS VARCHAR) AS DOUBLE) "
        f"/ CAST(n{g} AS DOUBLE) END)"
        for g in range(1, 8)
    )
    return f"""
    WITH daily AS (
      SELECT event_type AS k, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    tagged AS (
      SELECT k, x, CAST(dayofweek(d) + 1 AS INTEGER) AS dw FROM daily
    ),
    piv AS (
      SELECT k,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(x) AS s_all,
         SUM(CAST(x AS HUGEINT) * x) AS q_all,
         {", ".join(cases)}
      FROM tagged GROUP BY 1
    ),
    e AS (
      SELECT k, n_days,
        CAST(CAST(q_all AS VARCHAR) AS DOUBLE)
          - CAST(CAST(s_all AS VARCHAR) AS DOUBLE)
            * CAST(CAST(s_all AS VARCHAR) AS DOUBLE)
            / CAST(n_days AS DOUBLE) AS sst,
        {ssw_terms} AS ssw
      FROM piv
    )
    SELECT k AS event_type, n_days, sst, ssw,
           CASE WHEN sst = 0 THEN NULL ELSE 1.0 - ssw / sst END
             AS eta_squared
    FROM e
    """


@query(
    "events_dow_anova",
    oracle=_dow_anova_oracle(),
    tags=("analytics", "anova", "seasonality", "effect-size",
          "integer-exact"),
)
def events_dow_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA effect size (eta-squared) of day-of-week on the
    daily count series per event type: how much of the volume variance
    the weekly cycle explains — the scalar that says whether the
    dow_seasonality profile is signal or noise. Exactness: all moments
    are exact integers (squared sums in DECIMAL(38,0)/HUGEINT); SSW is
    a FIXED-ORDER 7-term expression (per-dow terms pivoted to columns
    — a cross-row float sum would be order-dependent, the
    chi2-contribution lesson); sst/ssw/eta are fixed IEEE trees.
    Day-grain everywhere after one daily aggregation."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    tagged = daily.select(
        F.col("event_type").alias("k"),
        "x",
        F.dayofweek("d").cast("int").alias("dw"),
    )
    xx = F.expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("decimal(38,0)").alias("s_all"),
        F.sum(xx).cast("decimal(38,0)").alias("q_all"),
    ]
    for g in range(1, 8):
        cond = F.col("dw") == g
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{g}"),
            F.sum(F.when(cond, F.col("x"))).cast("decimal(38,0)")
            .alias(f"s{g}"),
            F.sum(F.when(cond, xx)).cast("decimal(38,0)").alias(f"q{g}"),
        ]
    piv = tagged.groupBy("k").agg(*aggs)

    def _dbl(name):
        return F.col(name).cast("string").cast("double")

    sst = _dbl("q_all") - _dbl("s_all") * _dbl("s_all") / F.col(
        "n_days"
    ).cast("double")
    ssw = None
    for g in range(1, 8):
        term = F.when(F.col(f"n{g}") == 0, F.lit(0.0)).otherwise(
            _dbl(f"q{g}")
            - _dbl(f"s{g}") * _dbl(f"s{g}") / F.col(f"n{g}").cast("double")
        )
        ssw = term if ssw is None else ssw + term
    out = piv.select(
        F.col("k").alias("event_type"),
        "n_days",
        sst.alias("sst"),
        ssw.alias("ssw"),
    )
    return out.select(
        "event_type", "n_days", "sst", "ssw",
        F.when(F.col("sst") == 0.0, F.lit(None).cast("double"))
        .otherwise(F.lit(1.0) - F.col("ssw") / F.col("sst"))
        .alias("eta_squared"),
    )


@query(
    "part_supplier_price_spread",
    oracle="""
    WITH per AS (
      SELECT l_partkey AS part_key, l_suppkey AS supp_key,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(12,2)))
                  AS DECIMAL(38,4)) AS rev,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    priced AS (
      SELECT part_key, supp_key,
             CAST(CAST(rev AS VARCHAR) AS DOUBLE)
               / CAST(CAST(qty AS VARCHAR) AS DOUBLE) AS unit_price
      FROM per WHERE qty <> 0
    )
    SELECT part_key,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           MIN(unit_price) AS price_min,
           MAX(unit_price) AS price_max,
           MAX(unit_price) - MIN(unit_price) AS spread
    FROM priced
    GROUP BY 1 HAVING COUNT(*) >= 2
    """,
    tags=("analytics", "procurement", "price-spread", "dual-sourcing"),
)
def part_supplier_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-sourcing price audit: per part supplied by >= 2 suppliers,
    the spread between the cheapest and dearest supplier's effective
    unit price (discounted revenue / quantity, decimal-exact sums
    divided once per (part, supplier)) — the procurement table behind
    'consolidate on the cheap supplier' decisions. MIN/MAX over the
    per-supplier doubles are order-independent, so the whole chain
    cross-checks bit-for-bit. One (part, supplier) aggregation + one
    part-grain reduction."""
    from ..operators.relational import dec

    li = load_table(spark, sf_dir, "lineitem")
    vol = dec("l_extendedprice", 12, 2) * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,2)")
    per = (
        li.groupBy(
            F.col("l_partkey").alias("part_key"),
            F.col("l_suppkey").alias("supp_key"),
        )
        .agg(
            F.sum(vol).cast("decimal(38,4)").alias("rev"),
            F.sum(dec("l_quantity", 12, 2)).cast("decimal(38,2)")
            .alias("qty"),
        )
        .filter(F.col("qty") != 0)
    )
    unit = (
        F.col("rev").cast("string").cast("double")
        / F.col("qty").cast("string").cast("double")
    )
    return (
        per.select("part_key", unit.alias("unit_price"))
        .groupBy("part_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.min("unit_price").alias("price_min"),
            F.max("unit_price").alias("price_max"),
            (F.max("unit_price") - F.min("unit_price")).alias("spread"),
        )
        .filter(F.col("n_suppliers") >= 2)
    )


def _fiscal_rollup_oracle() -> str:
    from ..functions.fiscal import fiscal_sql

    fc = fiscal_sql("o_orderdate")
    return f"""
    SELECT {fc['fiscal_year']} AS fiscal_year,
           {fc['fiscal_quarter']} AS fiscal_quarter,
           {fc['fiscal_period']} AS fiscal_period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """


@query(
    "orders_fiscal_rollup",
    oracle=_fiscal_rollup_oracle(),
    tags=("analytics", "fiscal-calendar", "445", "rollup",
          "integer-exact"),
)
def orders_fiscal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup on the 4-4-5 retail fiscal calendar
    (functions/fiscal.py): every period holds whole weeks (4+4+5 per
    13-week quarter), so period-over-period comparisons aren't skewed
    by weekday mix — the merchandising-report calendar, derived with
    pure non-negative integer arithmetic from the fiscal epoch
    (bit-exact cross-engine, SARGable once materialized). Decimal-
    exact revenue, one grouped aggregation."""
    from ..functions.fiscal import fiscal_cols
    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    fc = fiscal_cols(F.to_date("o_orderdate"))
    return (
        od.select(
            fc["fiscal_year"].alias("fiscal_year"),
            fc["fiscal_quarter"].alias("fiscal_quarter"),
            fc["fiscal_period"].alias("fiscal_period"),
            dec("o_totalprice", 12, 2).alias("p"),
        )
        .groupBy("fiscal_year", "fiscal_quarter", "fiscal_period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("p").cast("string").cast("double").alias("revenue"),
        )
    )


@query(
    "orders_total_reconciliation",
    oracle="""
    WITH line AS (
      SELECT l_orderkey,
             CAST(SUM(
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    AS DECIMAL(24,4))
               * CAST(1 + l_tax AS DECIMAL(12,2))
             ) AS DECIMAL(38,6)) AS computed
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(12,2)) AS header_total,
             line.computed,
             CAST(line.computed
                  - CAST(o.o_totalprice AS DECIMAL(12,2))
                  AS DECIMAL(38,6)) AS delta
      FROM orders o JOIN line ON line.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN delta > 0 THEN 'over'
                WHEN delta < 0 THEN 'under'
                ELSE 'exact' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(ABS(delta)) AS VARCHAR) AS DOUBLE)
             AS total_abs_delta,
           CAST(CAST(MAX(ABS(delta)) AS VARCHAR) AS DOUBLE)
             AS max_abs_delta
    FROM j GROUP BY 1
    """,
    tags=("governance", "reconciliation", "double-entry", "audit"),
)
def orders_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines double-entry reconciliation: per order, the
    header o_totalprice against the decimal-exact recomputed line
    total sum(extendedprice x (1-discount) x (1+tax)), bucketed by
    delta sign with exact decimal delta mass — the books-balance audit
    every finance pipeline runs before trusting revenue rollups.
    Every intermediate is a pinned-precision DECIMAL (no float until
    the final reporting casts), so the buckets are bit-exact. One
    order-grain line aggregation + one keyed join + one 3-row
    reduction."""
    from ..operators.relational import dec

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    term = (
        (dec("l_extendedprice", 12, 2)
         * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)"))
        .cast("decimal(24,4)")
        * (F.lit(1) + F.col("l_tax")).cast("decimal(12,2)")
    )
    line = li.groupBy("l_orderkey").agg(
        F.sum(term).cast("decimal(38,6)").alias("computed")
    )
    j = od.join(line, od["o_orderkey"] == line["l_orderkey"]).select(
        (
            F.col("computed") - dec("o_totalprice", 12, 2)
        ).cast("decimal(38,6)").alias("delta")
    )
    bucket = (
        F.when(F.col("delta") > 0, F.lit("over"))
        .when(F.col("delta") < 0, F.lit("under"))
        .otherwise(F.lit("exact"))
    )
    return j.select(bucket.alias("bucket"), "delta").groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.abs(F.col("delta"))).cast("string").cast("double")
        .alias("total_abs_delta"),
        F.max(F.abs(F.col("delta"))).cast("string").cast("double")
        .alias("max_abs_delta"),
    )


@query(
    "events_bot_heuristic",
    oracle="""
    WITH ev AS (
      SELECT user_id AS u, epoch_us(ts) AS t, event_id AS i,
             event_type AS et
      FROM events
    ),
    per_user AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT et) AS BIGINT) AS n_types
      FROM ev GROUP BY 1 HAVING COUNT(*) >= 5
    ),
    gaps AS (
      SELECT u, t - LAG(t) OVER (PARTITION BY u ORDER BY t, i) AS gap_us
      FROM ev
    ),
    gap_counts AS (
      SELECT u, gap_us, CAST(COUNT(*) AS BIGINT) AS n_gap
      FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1, 2
    ),
    modal AS (
      SELECT u, gap_us AS modal_gap_us, n_gap FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY u ORDER BY n_gap DESC, gap_us ASC) AS rn
        FROM gap_counts) WHERE rn = 1
    )
    SELECT p.u AS user_id, p.n_events, p.n_types, m.modal_gap_us,
           CAST(m.n_gap AS DOUBLE) / CAST(p.n_events - 1 AS DOUBLE)
             AS modal_share,
           (p.n_events >= 20 AND
            CAST(m.n_gap AS DOUBLE) / CAST(p.n_events - 1 AS DOUBLE)
              > 0.5) AS is_bot_like
    FROM per_user p JOIN modal m ON m.u = p.u
    """,
    tags=("analytics", "bot-detection", "data-quality", "regularity"),
)
def events_bot_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mechanical-traffic screen (operators/analytics.py:
    bot_score_heuristic): per user, the share of inter-event gaps equal
    to the user's modal gap — schedulers repeat one gap, humans don't.
    The pre-metric hygiene filter for behavioral corpora and funnels;
    complements the CV^2 regularity census (modal share stays
    meaningful for bimodal cron+jitter bots where variance lies).
    Exact integer gap arithmetic under the unique (ts, id) order;
    deterministic modal tie-break; one user-keyed window + one
    (user, gap) count + one modal pick."""
    from ..operators.analytics import bot_score_heuristic

    ev = load_table(spark, sf_dir, "events")
    return bot_score_heuristic(ev)


def _fiscal_yoy_oracle() -> str:
    from ..functions.fiscal import fiscal_sql

    fc = fiscal_sql("o_orderdate")
    return f"""
    WITH per AS (
      SELECT {fc['fiscal_year']} AS fy,
             {fc['fiscal_quarter']} AS fiscal_quarter,
             {fc['fiscal_period']} AS fiscal_period,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1, 2, 3
    )
    SELECT cur.fy AS fiscal_year, cur.fiscal_quarter, cur.fiscal_period,
           CAST(CAST(cur.rev AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(prev.rev AS VARCHAR) AS DOUBLE) AS revenue_prior,
           (CAST(CAST(cur.rev AS VARCHAR) AS DOUBLE)
            - CAST(CAST(prev.rev AS VARCHAR) AS DOUBLE))
             / CAST(CAST(prev.rev AS VARCHAR) AS DOUBLE) AS yoy_growth
    FROM per cur JOIN per prev
      ON prev.fy = cur.fy - 1
     AND prev.fiscal_quarter = cur.fiscal_quarter
     AND prev.fiscal_period = cur.fiscal_period
    """


@query(
    "orders_fiscal_yoy_growth",
    oracle=_fiscal_yoy_oracle(),
    tags=("analytics", "fiscal-calendar", "yoy", "growth"),
)
def orders_fiscal_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per 4-4-5 fiscal period — the
    report the fiscal calendar exists FOR: because every period holds
    the same whole weeks, period-vs-prior-year-period compares like
    with like (no weekday-mix or month-length skew). One fiscal-grain
    aggregation + one self-join on (quarter, period) at year-1; exact
    decimal revenue; growth is a fixed composition of portable
    divisions; periods without a prior-year twin are (honestly)
    absent."""
    from ..functions.fiscal import fiscal_cols
    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    fc = fiscal_cols(F.to_date("o_orderdate"))
    per = (
        od.select(
            fc["fiscal_year"].alias("fy"),
            fc["fiscal_quarter"].alias("fiscal_quarter"),
            fc["fiscal_period"].alias("fiscal_period"),
            dec("o_totalprice", 12, 2).alias("p"),
        )
        .groupBy("fy", "fiscal_quarter", "fiscal_period")
        .agg(F.sum("p").cast("decimal(38,2)").alias("rev"))
    )
    rev_d = F.col("rev").cast("string").cast("double")
    cur = per.select(
        "fy", "fiscal_quarter", "fiscal_period", rev_d.alias("revenue")
    )
    prev = per.select(
        (F.col("fy") + 1).alias("fy"),
        "fiscal_quarter",
        "fiscal_period",
        rev_d.alias("revenue_prior"),
    )
    j = cur.join(prev, ["fy", "fiscal_quarter", "fiscal_period"])
    return j.select(
        F.col("fy").alias("fiscal_year"),
        "fiscal_quarter",
        "fiscal_period",
        "revenue",
        "revenue_prior",
        ((F.col("revenue") - F.col("revenue_prior"))
         / F.col("revenue_prior")).alias("yoy_growth"),
    )


@query(
    "customer_value_quadrants",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey,
             CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal,
             CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0)
                  AS DECIMAL(38,2)) AS spend
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM spend),
    med_bal AS (
      SELECT bal AS m FROM (
        SELECT bal, ROW_NUMBER() OVER (ORDER BY bal, c_custkey) AS rn
        FROM spend), n
      WHERE rn = (n.n + 1) // 2
    ),
    med_spend AS (
      SELECT spend AS m FROM (
        SELECT spend, ROW_NUMBER() OVER (ORDER BY spend, c_custkey) AS rn
        FROM spend), n
      WHERE rn = (n.n + 1) // 2
    )
    SELECT CASE WHEN bal >= mb.m THEN 'hi_bal' ELSE 'lo_bal' END
             || '/' ||
           CASE WHEN spend >= ms.m THEN 'hi_spend' ELSE 'lo_spend' END
             AS quadrant,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(CAST(SUM(spend) AS VARCHAR) AS DOUBLE) AS total_spend
    FROM spend, med_bal mb, med_spend ms
    GROUP BY 1
    """,
    tags=("analytics", "segmentation", "quadrant", "median"),
)
def customer_value_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-split customer quadrants: account balance vs lifetime
    spend, each customer placed above/below the EXACT lower median of
    each axis (deterministic rank selection under a (value, custkey)
    total order; a zero-order customer spends exactly 0, not NULL) —
    the 2x2 segmentation behind "high-potential / under-monetized"
    plays, robust where mean-split segmentation is dragged by whales.
    Two 1-row median riders broadcast-crossed onto the customer-grain
    frame (allowlisted, the rfm/quartile pattern); exact decimal
    spend; one 4-row reduction."""
    from ..operators.relational import dec

    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    spend = (
        cu.join(od, cu["c_custkey"] == od["o_custkey"], "left")
        .groupBy(cu["c_custkey"].alias("ck"),
                 dec("c_acctbal", 12, 2).alias("bal"))
        .agg(
            F.coalesce(
                F.sum(dec("o_totalprice", 12, 2)), F.lit(0)
            ).cast("decimal(38,2)").alias("spend")
        )
    ).cache()  # referenced by both median riders + the quadrant scan
    # (cache, not localCheckpoint: the checkpoint would erase the
    # Aggregate lineage the plan advisor uses to see the global median
    # windows run over a REDUCED customer-grain frame)
    from pyspark.sql import Window

    def _median(col):
        w = Window.orderBy(F.col(col), F.col("ck"))
        ranked = spend.select(
            F.col(col), F.col("ck"), F.row_number().over(w).alias("rn")
        )
        n1 = spend.groupBy().agg(
            F.expr("(count(1) + 1) div 2").alias("mrn")
        )
        return (
            ranked.join(F.broadcast(n1), ranked["rn"] == n1["mrn"])
            .select(F.col(col).alias("m"))
        )
    mb = _median("bal").select(F.col("m").alias("mb"))
    ms = _median("spend").select(F.col("m").alias("ms"))
    # 1-row median riders (CROSS_OK: the rfm/quartile pattern)
    j = spend.crossJoin(F.broadcast(mb)).crossJoin(F.broadcast(ms))
    quadrant = F.concat(
        F.when(F.col("bal") >= F.col("mb"), F.lit("hi_bal"))
        .otherwise(F.lit("lo_bal")),
        F.lit("/"),
        F.when(F.col("spend") >= F.col("ms"), F.lit("hi_spend"))
        .otherwise(F.lit("lo_spend")),
    )
    return j.groupBy(quadrant.alias("quadrant")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("spend").cast("string").cast("double").alias("total_spend"),
    )


@query(
    "events_type_tv_drift",
    oracle="""
    WITH wt AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             event_type AS cat, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    totals AS (
      SELECT wk, CAST(SUM(n) AS BIGINT) AS nt FROM wt GROUP BY 1),
    pairs AS (
      SELECT COALESCE(c.wk, CAST(p.wk + INTERVAL 7 DAY AS DATE)) AS c_wk,
             COALESCE(c.cat, p.cat) AS cat,
             COALESCE(c.n, 0) AS n_cur,
             COALESCE(p.n, 0) AS n_prev
      FROM wt c FULL OUTER JOIN wt p
        ON c.wk = CAST(p.wk + INTERVAL 7 DAY AS DATE) AND c.cat = p.cat),
    framed AS (
      SELECT pr.c_wk, pr.cat, pr.n_cur, pr.n_prev,
             tc.nt AS n_cur_t, tp.nt AS n_prev_t
      FROM pairs pr
      JOIN totals tc ON tc.wk = pr.c_wk
      JOIN totals tp ON CAST(tp.wk + INTERVAL 7 DAY AS DATE) = pr.c_wk)
    SELECT c_wk AS week,
           CAST(MAX(n_prev_t) AS BIGINT) AS n_prev,
           CAST(MAX(n_cur_t) AS BIGINT) AS n_cur,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(CAST(SUM(ABS(CAST(n_cur AS DECIMAL(38,0)) * n_prev_t
                             - CAST(n_prev AS DECIMAL(38,0)) * n_cur_t))
                     AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(2 AS DECIMAL(38,0)) * MAX(n_cur_t)
                         * MAX(n_prev_t) AS VARCHAR) AS DOUBLE)
             AS tv_distance
    FROM framed GROUP BY 1
    """,
    tags=("analytics", "drift", "total-variation", "mix"),
)
def events_type_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week total-variation drift of the event-type mix
    (operators/profile.py:mix_tv_drift): half the L1 gap between
    consecutive weekly type-share vectors — the COMPOSITION-drift
    alarm next to events_ks_drift (value-shape) and
    orders_profile_drift (summary stats). TV reads directly as "x% of
    this week's traffic is differently typed than last week's" and
    needs no transcendental (PSI's ln() is not bit-reproducible
    across JVM/libm): integer cross-multiplied L1 numerator in
    DECIMAL(38,0), one string-parse double division. One (week, type)
    count aggregate is the only corpus-sized shuffle; the pairing is
    a full-outer self-join of the reduced frame on (week+7d, type)."""
    from ..operators.profile import mix_tv_drift

    ev = load_table(spark, sf_dir, "events")
    return mix_tv_drift(ev, "ts", "event_type")


@query(
    "events_value_kruskal_wallis",
    oracle="""
    WITH vt AS (
      SELECT CAST(FLOOR(value) AS BIGINT) AS b, event_type AS g,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    v AS (SELECT b, CAST(SUM(cnt) AS BIGINT) AS c FROM vt GROUP BY 1),
    ranked AS (
      SELECT b, c,
             CAST(2 * SUM(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                  - c + 1 AS BIGINT) AS rank2
      FROM v),
    groups AS (
      SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_g,
             CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * rank2)
                  AS DECIMAL(38,0)) AS r2
      FROM vt JOIN ranked USING (b) GROUP BY 1),
    terms AS (
      SELECT g, n_g,
             CAST(CAST(CAST(r2 * r2 AS DECIMAL(38,0)) AS VARCHAR)
                  AS DOUBLE)
             / CAST(CAST(CAST(CAST(4 AS DECIMAL(38,0)) * n_g
                              AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
               AS t
      FROM groups),
    folded AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k_groups,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list(struct_pack(g := g, t := t)
                                   ORDER BY g), s -> s.t)),
               (acc, x) -> acc + x) AS s_terms
      FROM terms),
    ties AS (
      SELECT CAST(SUM(CAST(c AS DECIMAL(38,0)) * c * c - c)
                  AS DECIMAL(38,0)) AS tie3,
             CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tied_bins
      FROM v),
    expr AS (
      SELECT n, k_groups, n_tied_bins,
             CAST(12 AS DOUBLE) * s_terms
               / CAST(CAST(CAST(CAST(n AS DECIMAL(38,0)) * (n + 1)
                                AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
               - CAST(3 AS DOUBLE) * CAST(n + 1 AS DOUBLE) AS h,
             CAST(1 AS DOUBLE)
               - CAST(CAST(tie3 AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(CAST(CAST(n AS DECIMAL(38,0)) * n * n - n
                                  AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
               AS tie_correction
      FROM folded, ties)
    SELECT n, k_groups, n_tied_bins, h, tie_correction,
           CASE WHEN tie_correction > 0 THEN h / tie_correction END
             AS h_corrected,
           h / CAST(n - 1 AS DOUBLE) AS epsilon_sq
    FROM expr
    """,
    tags=("analytics", "kruskal-wallis", "rank-test", "robust"),
)
def events_value_kruskal_wallis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tie-corrected Kruskal-Wallis H across the five event types on
    the integer-binned value column (operators/analytics.py:
    kruskal_wallis) — the k-group rank test completing the family:
    MWU (two groups, doc_dup_length_mwu), ANOVA (mean-based,
    events_dow_anova), now the k-group location test that is robust
    to heavy tails. Binning follows the ks_drift bounded-grid
    contract (rank tests at raw value grain are data-sized); doubled
    midranks keep every rank integer; the k per-group H terms fold
    in type order (the ordered-fold idiom), and the tie term rides a
    1-row broadcast cross."""
    from ..operators.analytics import kruskal_wallis

    ev = load_table(spark, sf_dir, "events")
    return kruskal_wallis(ev, "event_type", F.floor(F.col("value")))


@query(
    "customer_mahalanobis_outliers",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey AS id,
             CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                  AS DECIMAL(38,0)) AS x,
             CAST(COALESCE(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2))
                                    * 100 AS DECIMAL(38,0))), 0)
                  AS DECIMAL(38,0)) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxy
      FROM spend),
    scored AS (
      SELECT id, x, y,
             CASE WHEN
               (CAST(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0))
                          AS VARCHAR) AS DOUBLE)
                * CAST(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0))
                            AS VARCHAR) AS DOUBLE)
                - CAST(CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0))
                            AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)) <> CAST(0 AS DOUBLE)
             THEN
               (CAST(CAST(n AS VARCHAR) AS DOUBLE) - CAST(1 AS DOUBLE))
               / CAST(CAST(n AS VARCHAR) AS DOUBLE)
               * (CAST(CAST(CAST(n * x - sx AS DECIMAL(38,0)) AS VARCHAR)
                       AS DOUBLE)
                  * CAST(CAST(CAST(n * x - sx AS DECIMAL(38,0)) AS VARCHAR)
                         AS DOUBLE)
                  * CAST(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                  - CAST(2 AS DOUBLE)
                    * CAST(CAST(CAST(n * x - sx AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * y - sy AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)
                  + CAST(CAST(CAST(n * y - sy AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * y - sy AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE))
               / (CAST(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0))
                            AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE))
             END AS maha_sq
      FROM spend, m),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY maha_sq DESC NULLS LAST,
                                        id) AS INTEGER) AS rnk
      FROM scored)
    SELECT id AS c_custkey, x AS bal_cents, y AS spend_cents,
           maha_sq, rnk
    FROM ranked WHERE rnk <= 20
    """,
    tags=("analytics", "outliers", "mahalanobis", "bivariate"),
)
def customer_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 customers by bivariate Mahalanobis distance on (account
    balance, lifetime spend) — the correlation-aware outlier screen
    (operators/profile.py:mahalanobis_outliers_2d) next to the
    univariate MAD/z-score/fence entries and the quadrant
    segmentation: a high-balance-zero-spend account sits inside both
    marginal distributions but far off the joint ellipse. Inputs are
    scaled to integer cents so every moment and deviation is exact
    DECIMAL(38,0) (the scaling cancels in d^2); the score is one
    fixed closed-form IEEE tree; the top-20 plans as
    TakeOrderedAndProject under a (d^2 desc, custkey) total order
    with a 1-row moment rider broadcast cross."""
    from ..operators.profile import mahalanobis_outliers_2d
    from ..operators.relational import dec

    d38 = "decimal(38,0)"
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    spend = (
        cu.join(od, cu["c_custkey"] == od["o_custkey"], "left")
        .groupBy(
            cu["c_custkey"].alias("id"),
            (dec("c_acctbal", 12, 2) * 100).cast(d38).alias("x"),
        )
        .agg(
            F.coalesce(
                F.sum((dec("o_totalprice", 12, 2) * 100).cast(d38)),
                F.lit(0),
            )
            .cast(d38)
            .alias("y")
        )
    )
    out = mahalanobis_outliers_2d(spend, "id", "x", "y", top_n=20)
    return out.select(
        F.col("id").alias("c_custkey"),
        F.col("x").alias("bal_cents"),
        F.col("y").alias("spend_cents"),
        "maha_sq",
        "rnk",
    )


@query(
    "orders_revenue_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    med AS (
      SELECT rev AS m FROM (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, d) AS rn
        FROM daily), n
      WHERE rn = (n.n + 1) // 2),
    signed AS (
      SELECT d, CASE WHEN rev >= med.m THEN 1 ELSE 0 END AS s
      FROM daily, med),
    flips AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY d) IS NOT NULL
                   AND LAG(s) OVER (ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS flip
      FROM signed),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(s) AS BIGINT) AS n_above,
             CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_below,
             CAST(1 + SUM(flip) AS BIGINT) AS runs
      FROM flips),
    ex AS (
      SELECT n_days, n_above, n_below, runs,
             CAST(2 * n_above * n_below AS BIGINT) AS m2
      FROM agg)
    SELECT n_days, n_above, n_below, runs,
           CAST(1 AS DOUBLE)
             + CAST(m2 AS DOUBLE) / CAST(n_days AS DOUBLE)
             AS expected_runs,
           CASE WHEN CAST(m2 AS DOUBLE)
                     * (CAST(m2 AS DOUBLE) - CAST(n_days AS DOUBLE))
                     / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                        * (CAST(n_days AS DOUBLE) - CAST(1 AS DOUBLE)))
                     > CAST(0 AS DOUBLE)
           THEN (CAST(runs AS DOUBLE)
                 - (CAST(1 AS DOUBLE)
                    + CAST(m2 AS DOUBLE) / CAST(n_days AS DOUBLE)))
                / sqrt(CAST(m2 AS DOUBLE)
                       * (CAST(m2 AS DOUBLE) - CAST(n_days AS DOUBLE))
                       / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                          * (CAST(n_days AS DOUBLE)
                             - CAST(1 AS DOUBLE))))
           END AS z_score
    FROM ex
    """,
    tags=("analytics", "runs-test", "randomness", "timeseries"),
)
def orders_revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-revenue series: is the
    above/below-median sign sequence RANDOM, or does it cluster
    (momentum / regime persistence) or alternate (overcorrection)?
    The nonparametric randomness audit next to the autocorrelation
    entries (which measure linear co-movement; the runs test catches
    any sign-pattern deviation). Day-grain exact decimal revenue, the
    quadrant entries' exact lower-median rank selection (1-row
    broadcast rider), one lag window over the day-grain frame, and
    the z-score is one fixed closed-form IEEE tree over exact counts
    — sqrt is correctly rounded, so the statistic is bit-identical
    cross-engine. Variance degenerates (all days on one side) to a
    NULL z rather than a division blow-up."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    daily = (
        od.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(dec("o_totalprice", 12, 2))
            .cast("decimal(38,2)")
            .alias("rev")
        )
    ).cache()  # day-grain (calendar-bounded); reused by the median
    # rider + the sign scan. cache, NOT localCheckpoint: the global
    # median/lag windows run downstream, and the advisor needs the
    # Aggregate lineage to see they run over a REDUCED frame (the
    # quadrants lesson); InMemoryRelation still computes the day
    # aggregate once.
    n1 = daily.groupBy().agg(
        F.expr("(count(1) + 1) div 2").alias("mrn"),
    )
    wmed = Window.orderBy(F.col("rev"), F.col("d"))
    med = (
        daily.select("rev", "d", F.row_number().over(wmed).alias("rn"))
        .join(F.broadcast(n1), F.col("rn") == F.col("mrn"))
        .select(F.col("rev").alias("m"))
    )
    # 1-row exact-median rider (CROSS_OK: the quadrant pattern)
    signed = daily.crossJoin(F.broadcast(med)).select(
        "d", F.when(F.col("rev") >= F.col("m"), 1).otherwise(0).alias("s")
    )
    wd = Window.orderBy("d")
    flips = signed.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNotNull()
            & (F.lag("s").over(wd) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("flip"),
    )
    agg = flips.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("s").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n_below"),
        (F.lit(1) + F.sum("flip")).cast("long").alias("runs"),
    )
    ex = agg.select(
        "n_days",
        "n_above",
        "n_below",
        "runs",
        (F.lit(2) * F.col("n_above") * F.col("n_below"))
        .cast("long")
        .alias("m2"),
    )
    nd = F.col("n_days").cast("double")
    m2 = F.col("m2").cast("double")
    mu = F.lit(1.0) + m2 / nd
    var = m2 * (m2 - nd) / (nd * nd * (nd - F.lit(1.0)))
    return ex.select(
        "n_days",
        "n_above",
        "n_below",
        "runs",
        mu.alias("expected_runs"),
        F.when(
            var > F.lit(0.0),
            (F.col("runs").cast("double") - mu) / F.sqrt(var),
        ).alias("z_score"),
    )


@query(
    "lineitem_simpson_audit",
    oracle="""
    WITH base AS (
      SELECT p.p_brand AS brand,
             CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100
                  AS DECIMAL(38,0)) AS x,
             CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100
                  AS DECIMAL(38,0)) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    g AS (
      SELECT brand,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxy
      FROM base GROUP BY 1),
    pool AS (
      SELECT CAST(SUM(n) AS DECIMAL(38,0)) AS pn,
             CAST(SUM(sx) AS DECIMAL(38,0)) AS psx,
             CAST(SUM(sy) AS DECIMAL(38,0)) AS psy,
             CAST(SUM(sxx) AS DECIMAL(38,0)) AS psxx,
             CAST(SUM(sxy) AS DECIMAL(38,0)) AS psxy
      FROM g),
    nums AS (
      SELECT g.brand, g.n,
             CAST(g.n * g.sxy - g.sx * g.sy AS DECIMAL(38,0)) AS wnum,
             CAST(g.n * g.sxx - g.sx * g.sx AS DECIMAL(38,0)) AS wden,
             CAST(p.pn * p.psxy - p.psx * p.psy AS DECIMAL(38,0)) AS pnum,
             CAST(p.pn * p.psxx - p.psx * p.psx AS DECIMAL(38,0)) AS pden
      FROM g, pool p)
    SELECT brand, CAST(n AS BIGINT) AS n_lines,
           CASE WHEN wden > 0 THEN
             CAST(CAST(wnum AS VARCHAR) AS DOUBLE)
             / CAST(CAST(wden AS VARCHAR) AS DOUBLE) END AS slope_within,
           CASE WHEN pden > 0 THEN
             CAST(CAST(pnum AS VARCHAR) AS DOUBLE)
             / CAST(CAST(pden AS VARCHAR) AS DOUBLE) END AS slope_pooled,
           (wden > 0 AND ((wnum > 0 AND pnum < 0)
                          OR (wnum < 0 AND pnum > 0)))
             AS sign_reversed
    FROM nums
    """,
    tags=("analytics", "simpson-paradox", "aggregation-audit", "ols"),
)
def lineitem_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of the discount->quantity relationship:
    the pooled OLS slope vs each brand's within-group slope, flagging
    brands whose association REVERSES sign against the pooled story —
    the aggregation-reversal trap that makes a daily-rollup dashboard
    lie when group composition confounds the trend (the reason to
    distrust fact_daily_part_agg-style rollups for causal reads).
    Inputs scale to integer hundredths, so every moment and every
    slope NUMERATOR is exact DECIMAL(38,0); the reversal flag
    compares exact decimal signs (never rounded doubles), and each
    reported slope is one string-parse double division. One
    brand-grain moment aggregate after the part join is the only
    corpus-sized shuffle; the pooled moments are a 1-row rider
    broadcast cross re-aggregated from the brand frame (no second
    scan)."""
    from ..operators.relational import dec

    d38 = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    base = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        (dec("l_discount", 4, 2) * 100).cast(d38).alias("x"),
        (dec("l_quantity", 12, 2) * 100).cast(d38).alias("y"),
    )
    g = base.groupBy("brand").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
    ).localCheckpoint()  # brand-grain (enum-bounded); reused by the
    # pooled rider + the per-brand scan — lineage cut so the
    # lineitem-part join runs once
    pool = g.agg(
        F.sum("n").cast(d38).alias("pn"),
        F.sum("sx").cast(d38).alias("psx"),
        F.sum("sy").cast(d38).alias("psy"),
        F.sum("sxx").cast(d38).alias("psxx"),
        F.sum("sxy").cast(d38).alias("psxy"),
    )
    # 1-row pooled-moment rider (CROSS_OK: the grand-total pattern)
    nums = g.crossJoin(F.broadcast(pool)).select(
        "brand",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast(d38)
        .alias("wnum"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast(d38)
        .alias("wden"),
        (F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy"))
        .cast(d38)
        .alias("pnum"),
        (F.col("pn") * F.col("psxx") - F.col("psx") * F.col("psx"))
        .cast(d38)
        .alias("pden"),
    )

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    return nums.select(
        "brand",
        F.col("n").cast("long").alias("n_lines"),
        F.when(F.col("wden") > 0, _dbl(F.col("wnum")) / _dbl(F.col("wden")))
        .alias("slope_within"),
        F.when(F.col("pden") > 0, _dbl(F.col("pnum")) / _dbl(F.col("pden")))
        .alias("slope_pooled"),
        (
            (F.col("wden") > 0)
            & (
                ((F.col("wnum") > 0) & (F.col("pnum") < 0))
                | ((F.col("wnum") < 0) & (F.col("pnum") > 0))
            )
        ).alias("sign_reversed"),
    )


@query(
    "events_did_estimator",
    oracle="""
    WITH base AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS t,
             CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                  THEN 1 ELSE 0 END AS p,
             CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(38,0)) AS x
      FROM events),
    cells AS (
      SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS ss
      FROM base GROUP BY 1, 2),
    one AS (
      SELECT
        MAX(CASE WHEN t = 0 AND p = 0 THEN n END) AS n00,
        MAX(CASE WHEN t = 0 AND p = 1 THEN n END) AS n01,
        MAX(CASE WHEN t = 1 AND p = 0 THEN n END) AS n10,
        MAX(CASE WHEN t = 1 AND p = 1 THEN n END) AS n11,
        MAX(CASE WHEN t = 0 AND p = 0 THEN s END) AS s00,
        MAX(CASE WHEN t = 0 AND p = 1 THEN s END) AS s01,
        MAX(CASE WHEN t = 1 AND p = 0 THEN s END) AS s10,
        MAX(CASE WHEN t = 1 AND p = 1 THEN s END) AS s11,
        MAX(CASE WHEN t = 0 AND p = 0 THEN ss END) AS ss00,
        MAX(CASE WHEN t = 0 AND p = 1 THEN ss END) AS ss01,
        MAX(CASE WHEN t = 1 AND p = 0 THEN ss END) AS ss10,
        MAX(CASE WHEN t = 1 AND p = 1 THEN ss END) AS ss11
      FROM cells),
    m AS (
      SELECT n00, n01, n10, n11,
        CAST(CAST(s00 AS VARCHAR) AS DOUBLE) / CAST(n00 AS DOUBLE) AS m00,
        CAST(CAST(s01 AS VARCHAR) AS DOUBLE) / CAST(n01 AS DOUBLE) AS m01,
        CAST(CAST(s10 AS VARCHAR) AS DOUBLE) / CAST(n10 AS DOUBLE) AS m10,
        CAST(CAST(s11 AS VARCHAR) AS DOUBLE) / CAST(n11 AS DOUBLE) AS m11,
        CASE WHEN n00 > 1 THEN
          CAST(CAST(CAST(n00 * ss00 - s00 * s00 AS DECIMAL(38,0))
               AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(CAST(n00 AS DECIMAL(38,0)) * n00 * (n00 - 1)
               AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) END AS t00,
        CASE WHEN n01 > 1 THEN
          CAST(CAST(CAST(n01 * ss01 - s01 * s01 AS DECIMAL(38,0))
               AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(CAST(n01 AS DECIMAL(38,0)) * n01 * (n01 - 1)
               AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) END AS t01,
        CASE WHEN n10 > 1 THEN
          CAST(CAST(CAST(n10 * ss10 - s10 * s10 AS DECIMAL(38,0))
               AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(CAST(n10 AS DECIMAL(38,0)) * n10 * (n10 - 1)
               AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) END AS t10,
        CASE WHEN n11 > 1 THEN
          CAST(CAST(CAST(n11 * ss11 - s11 * s11 AS DECIMAL(38,0))
               AS VARCHAR) AS DOUBLE)
          / CAST(CAST(CAST(CAST(n11 AS DECIMAL(38,0)) * n11 * (n11 - 1)
               AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) END AS t11
      FROM one)
    SELECT n00 AS n_ctrl_pre, n01 AS n_ctrl_post,
           n10 AS n_treat_pre, n11 AS n_treat_post,
           m00 AS mean_ctrl_pre, m01 AS mean_ctrl_post,
           m10 AS mean_treat_pre, m11 AS mean_treat_post,
           (m11 - m10) - (m01 - m00) AS did,
           CASE WHEN t00 IS NOT NULL AND t01 IS NOT NULL
                 AND t10 IS NOT NULL AND t11 IS NOT NULL
                 AND ((t00 + t01) + t10) + t11 > CAST(0 AS DOUBLE)
           THEN sqrt(((t00 + t01) + t10) + t11) END AS se,
           CASE WHEN t00 IS NOT NULL AND t01 IS NOT NULL
                 AND t10 IS NOT NULL AND t11 IS NOT NULL
                 AND ((t00 + t01) + t10) + t11 > CAST(0 AS DOUBLE)
           THEN ((m11 - m10) - (m01 - m00))
                / sqrt(((t00 + t01) + t10) + t11) END AS z_score
    FROM m
    """,
    tags=("analytics", "causal", "diff-in-diff", "experiment"),
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator on event value: treatment =
    the deterministic user-parity split (the ab_lift convention),
    periods = first vs second half of the observed month. DiD is the
    causal-inference workhorse when treatment wasn't randomized over
    TIME — it nets out both the group baseline and the common time
    trend that a naive post-period comparison (events_ab_lift's
    shape) confounds. All four cell moments are exact integer-cents
    DECIMAL(38,0); means, per-cell variance terms, the estimate and
    its large-sample SE (sqrt of the explicitly-associated 4-term
    sum — a FIXED IEEE tree, not a fold) are deterministic
    cross-engine. One (treat, period) aggregate over the events scan,
    then a 4-cell pivot into a single row."""
    from ..operators.relational import dec

    d38 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 2).cast("int").alias("t"),
        F.when(
            F.to_date("ts") >= F.lit("2024-01-16").cast("date"), 1
        )
        .otherwise(0)
        .alias("p"),
        (dec("value", 18, 2) * 100).cast(d38).alias("x"),
    )
    cells = base.groupBy("t", "p").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast(d38).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("ss"),
    )

    def cell(col: str, t: int, p: int) -> Column:
        return F.max(
            F.when((F.col("t") == t) & (F.col("p") == p), F.col(col))
        )

    one = cells.agg(
        *[
            cell("n", t, p).alias(f"n{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        *[
            cell("s", t, p).alias(f"s{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        *[
            cell("ss", t, p).alias(f"ss{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
    )

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    def mean(t: int, p: int) -> Column:
        return _dbl(F.col(f"s{t}{p}")) / F.col(f"n{t}{p}").cast("double")

    def term(t: int, p: int) -> Column:
        n, s, ss = F.col(f"n{t}{p}"), F.col(f"s{t}{p}"), F.col(f"ss{t}{p}")
        return F.when(
            n > 1,
            _dbl((n * ss - s * s).cast(d38))
            / _dbl((n.cast(d38) * n * (n - 1)).cast(d38)),
        )

    m00, m01, m10, m11 = mean(0, 0), mean(0, 1), mean(1, 0), mean(1, 1)
    t00, t01, t10, t11 = term(0, 0), term(0, 1), term(1, 0), term(1, 1)
    tsum = ((t00 + t01) + t10) + t11
    did = (m11 - m10) - (m01 - m00)
    ok = (
        t00.isNotNull()
        & t01.isNotNull()
        & t10.isNotNull()
        & t11.isNotNull()
        & (tsum > F.lit(0.0))
    )
    return one.select(
        F.col("n00").alias("n_ctrl_pre"),
        F.col("n01").alias("n_ctrl_post"),
        F.col("n10").alias("n_treat_pre"),
        F.col("n11").alias("n_treat_post"),
        m00.alias("mean_ctrl_pre"),
        m01.alias("mean_ctrl_post"),
        m10.alias("mean_treat_pre"),
        m11.alias("mean_treat_post"),
        did.alias("did"),
        F.when(ok, F.sqrt(tsum)).alias("se"),
        F.when(ok, did / F.sqrt(tsum)).alias("z_score"),
    )


@query(
    "events_seasonal_naive_mase",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    lagged AS (
      SELECT d, x,
             LAG(x, 1) OVER (ORDER BY d) AS x1,
             LAG(x, 7) OVER (ORDER BY d) AS x7
      FROM daily),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(COUNT(x7) AS BIGINT) AS n_scored,
             CAST(SUM(CASE WHEN x7 IS NOT NULL
                           THEN ABS(x - x7) END) AS BIGINT) AS ae_seasonal,
             CAST(SUM(CASE WHEN x7 IS NOT NULL
                           THEN ABS(x - x1) END) AS BIGINT) AS ae_naive
      FROM lagged)
    SELECT n_days, n_scored,
           CAST(ae_seasonal AS DOUBLE) / CAST(n_scored AS DOUBLE)
             AS mae_seasonal,
           CAST(ae_naive AS DOUBLE) / CAST(n_scored AS DOUBLE) AS mae_naive,
           CASE WHEN ae_naive > 0 THEN
             CAST(ae_seasonal AS DOUBLE) / CAST(ae_naive AS DOUBLE)
           END AS mase
    FROM agg
    """,
    tags=("analytics", "forecast-eval", "mase", "timeseries"),
)
def events_seasonal_naive_mase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal-naive forecast backtest on daily event volume, scored
    with MASE (mean absolute scaled error — the M-competition metric):
    predict each day with the same weekday last week, scale by the
    one-day-naive error over the SAME scored days, so mase < 1 reads
    "weekly seasonality beats persistence" — the go/no-go check before
    shipping any fancier forecaster, next to the seasonality-index and
    EWMA entries (which describe the pattern; this SCORES whether it
    predicts). Integer daily counts make both error sums exact BIGINTs;
    the two MAEs and the ratio are single IEEE divisions. One day-grain
    aggregate, two lag windows over the reduced frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.count("x7").cast("long").alias("n_scored"),
        F.sum(
            F.when(
                F.col("x7").isNotNull(), F.abs(F.col("x") - F.col("x7"))
            )
        )
        .cast("long")
        .alias("ae_seasonal"),
        F.sum(
            F.when(
                F.col("x7").isNotNull(), F.abs(F.col("x") - F.col("x1"))
            )
        )
        .cast("long")
        .alias("ae_naive"),
    )
    return agg.select(
        "n_days",
        "n_scored",
        (
            F.col("ae_seasonal").cast("double")
            / F.col("n_scored").cast("double")
        ).alias("mae_seasonal"),
        (
            F.col("ae_naive").cast("double")
            / F.col("n_scored").cast("double")
        ).alias("mae_naive"),
        F.when(
            F.col("ae_naive") > 0,
            F.col("ae_seasonal").cast("double")
            / F.col("ae_naive").cast("double"),
        ).alias("mase"),
    )


@query(
    "orders_revenue_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1),
    runpeak AS (
      SELECT d, rev,
             MAX(rev) OVER (ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS peak
      FROM daily),
    dd AS (
      SELECT d, rev, peak, CAST(peak - rev AS DECIMAL(38,2)) AS drawdown
      FROM runpeak),
    worst AS (SELECT MAX(drawdown) AS mdd FROM dd)
    SELECT dd.d AS trough_date,
           CAST(CAST(dd.rev AS VARCHAR) AS DOUBLE) AS trough_revenue,
           CAST(CAST(dd.peak AS VARCHAR) AS DOUBLE) AS peak_revenue,
           CAST(CAST(dd.drawdown AS VARCHAR) AS DOUBLE) AS max_drawdown,
           CAST(CAST(dd.drawdown AS VARCHAR) AS DOUBLE)
             / CAST(CAST(dd.peak AS VARCHAR) AS DOUBLE)
             AS drawdown_frac
    FROM dd, worst
    WHERE dd.drawdown = worst.mdd
    ORDER BY dd.d
    LIMIT 1
    """,
    tags=("analytics", "drawdown", "timeseries", "risk"),
)
def orders_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series: the largest gap
    between a running peak and a later day, with the trough date and
    the fractional fall — the risk/volatility summary (finance's
    classic) that mean/stddev profiles and z-scores miss because it
    measures the worst SEQUENCE, not the worst day. Exact decimal
    daily revenue, an exact decimal running max and gap, exact-decimal
    argmax with the EARLIEST trough as tie-break; doubles appear only
    in the rendered output columns. One day-grain aggregate, one
    running-max window over the reduced frame, a 1-row worst rider
    (CROSS_OK pattern)."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = daily.select(
        "d",
        "rev",
        F.max("rev").over(w).alias("peak"),
    ).select(
        "d",
        "rev",
        "peak",
        (F.col("peak") - F.col("rev")).cast("decimal(38,2)").alias(
            "drawdown"
        ),
    ).localCheckpoint()  # day-grain; reused by the worst rider + argmax
    worst = dd.agg(F.max("drawdown").alias("mdd"))

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    # 1-row worst-drawdown rider (CROSS_OK pattern)
    return (
        dd.crossJoin(F.broadcast(worst))
        .filter(F.col("drawdown") == F.col("mdd"))
        .orderBy("d")
        .limit(1)
        .select(
            F.col("d").alias("trough_date"),
            _dbl(F.col("rev")).alias("trough_revenue"),
            _dbl(F.col("peak")).alias("peak_revenue"),
            _dbl(F.col("drawdown")).alias("max_drawdown"),
            (_dbl(F.col("drawdown")) / _dbl(F.col("peak"))).alias(
                "drawdown_frac"
            ),
        )
    )


@query(
    "events_ab_sample_size",
    oracle="""
    WITH base AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS t,
             CAST(CAST(value AS DECIMAL(18,2)) * 100
                  AS DECIMAL(38,0)) AS x
      FROM events),
    cells AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS ss
      FROM base GROUP BY 1),
    one AS (
      SELECT MAX(CASE WHEN t = 0 THEN n END) AS n0,
             MAX(CASE WHEN t = 1 THEN n END) AS n1,
             MAX(CASE WHEN t = 0 THEN s END) AS s0,
             MAX(CASE WHEN t = 1 THEN s END) AS s1,
             MAX(CASE WHEN t = 0 THEN ss END) AS ss0,
             MAX(CASE WHEN t = 1 THEN ss END) AS ss1
      FROM cells),
    m AS (
      SELECT n0, n1,
             CAST(CAST(s0 AS VARCHAR) AS DOUBLE) / CAST(n0 AS DOUBLE)
               AS m0,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
               AS m1,
             CAST(CAST(CAST(n0 * ss0 - s0 * s0 AS DECIMAL(38,0))
                  AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(CAST(n0 AS DECIMAL(38,0)) * n0 * (n0 - 1)
                  AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS v0,
             CAST(CAST(CAST(n1 * ss1 - s1 * s1 AS DECIMAL(38,0))
                  AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * n1 * (n1 - 1)
                  AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS v1
      FROM one)
    SELECT n0 AS n_ctrl, n1 AS n_treat, m0 AS mean_ctrl, m1 AS mean_treat,
           m1 - m0 AS observed_delta,
           (v0 + v1) / CAST(2 AS DOUBLE) AS pooled_var,
           CASE WHEN (m1 - m0) * (m1 - m0) > CAST(0 AS DOUBLE) THEN
             CAST(2 AS DOUBLE) * ((v0 + v1) / CAST(2 AS DOUBLE))
             * (CAST('1.959963984540054' AS DOUBLE)
                + CAST('0.8416212335729143' AS DOUBLE))
             * (CAST('1.959963984540054' AS DOUBLE)
                + CAST('0.8416212335729143' AS DOUBLE))
             / ((m1 - m0) * (m1 - m0))
           END AS required_n_per_arm
    FROM m
    """,
    tags=("analytics", "power-analysis", "experiment", "planning"),
)
def events_ab_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planner: the per-arm n required to detect the
    OBSERVED treatment-control mean gap at alpha = 0.05 / power = 0.80
    (n = 2*sigma^2*(z_alpha/2 + z_beta)^2 / delta^2 — the two-sample
    normal-approximation formula every experimentation platform
    ships). Reading required_n against the observed arm sizes answers
    "was this test even powered?" BEFORE trusting events_ab_lift's
    verdict. The z constants are UNIVERSAL quantiles (1.96, 0.8416 —
    mathematical constants like pi, pinned as string-parsed double
    literals in both engines, not data-derived); everything else is
    exact integer-cents moments and one fixed IEEE tree. One
    (arm)-keyed aggregate, a 2-cell pivot."""
    from ..operators.relational import dec

    d38 = "decimal(38,0)"
    Z = F.lit("1.959963984540054").cast("double") + F.lit(
        "0.8416212335729143"
    ).cast("double")
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 2).cast("int").alias("t"),
        (dec("value", 18, 2) * 100).cast(d38).alias("x"),
    )
    cells = base.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast(d38).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("ss"),
    )

    def cell(col: str, t: int) -> Column:
        return F.max(F.when(F.col("t") == t, F.col(col)))

    one = cells.agg(
        cell("n", 0).alias("n0"),
        cell("n", 1).alias("n1"),
        cell("s", 0).alias("s0"),
        cell("s", 1).alias("s1"),
        cell("ss", 0).alias("ss0"),
        cell("ss", 1).alias("ss1"),
    )

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    def mean(i: int) -> Column:
        return _dbl(F.col(f"s{i}")) / F.col(f"n{i}").cast("double")

    def var(i: int) -> Column:
        n, s, ss = F.col(f"n{i}"), F.col(f"s{i}"), F.col(f"ss{i}")
        return _dbl((n * ss - s * s).cast(d38)) / _dbl(
            (n.cast(d38) * n * (n - 1)).cast(d38)
        )

    delta = mean(1) - mean(0)
    pooled = (var(0) + var(1)) / F.lit(2.0)
    return one.select(
        F.col("n0").alias("n_ctrl"),
        F.col("n1").alias("n_treat"),
        mean(0).alias("mean_ctrl"),
        mean(1).alias("mean_treat"),
        delta.alias("observed_delta"),
        pooled.alias("pooled_var"),
        F.when(
            delta * delta > F.lit(0.0),
            F.lit(2.0) * pooled * Z * Z / (delta * delta),
        ).alias("required_n_per_arm"),
    )


@query(
    "nation_shift_share",
    oracle="""
    WITH cells AS (
      SELECT n.n_name AS nation, p.p_type AS ptype,
             CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE)
                                < DATE '1996-01-01'
                  THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                  ELSE CAST(0 AS DECIMAL(12,2)) END)
                  AS DECIMAL(38,2)) AS r0,
             CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE)
                                >= DATE '1996-01-01'
                  THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                  ELSE CAST(0 AS DECIMAL(12,2)) END)
                  AS DECIMAL(38,2)) AS r1
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    jt AS (
      SELECT ptype,
             CAST(SUM(r0) AS DECIMAL(38,2)) AS c0,
             CAST(SUM(r1) AS DECIMAL(38,2)) AS c1
      FROM cells GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c0) AS DECIMAL(38,2)) AS t0,
             CAST(SUM(c1) AS DECIMAL(38,2)) AS t1
      FROM jt),
    gj AS (
      SELECT ptype,
             CASE WHEN c0 > 0 THEN
               (CAST(CAST(c1 AS VARCHAR) AS DOUBLE)
                - CAST(CAST(c0 AS VARCHAR) AS DOUBLE))
               / CAST(CAST(c0 AS VARCHAR) AS DOUBLE)
             ELSE CAST(0 AS DOUBLE) END AS g_j
      FROM jt),
    folded AS (
      SELECT c.nation,
             CAST(SUM(c.r0) AS DECIMAL(38,2)) AS rev_pre,
             CAST(SUM(c.r1) AS DECIMAL(38,2)) AS rev_post,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                 list(struct_pack(p := c.ptype,
                                  t := CAST(CAST(c.r0 AS VARCHAR)
                                            AS DOUBLE) * g.g_j)
                      ORDER BY c.ptype),
                 s -> s.t)),
               (acc, x) -> acc + x) AS im_raw
      FROM cells c JOIN gj g USING (ptype)
      GROUP BY 1)
    SELECT f.nation,
           CAST(CAST(f.rev_pre AS VARCHAR) AS DOUBLE) AS rev_pre,
           CAST(CAST(f.rev_post AS VARCHAR) AS DOUBLE) AS rev_post,
           CAST(CAST(f.rev_post AS VARCHAR) AS DOUBLE)
             - CAST(CAST(f.rev_pre AS VARCHAR) AS DOUBLE) AS delta,
           CAST(CAST(f.rev_pre AS VARCHAR) AS DOUBLE)
             * ((CAST(CAST(t.t1 AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(t.t0 AS VARCHAR) AS DOUBLE))
                / CAST(CAST(t.t0 AS VARCHAR) AS DOUBLE))
             AS national_effect,
           f.im_raw
             - CAST(CAST(f.rev_pre AS VARCHAR) AS DOUBLE)
               * ((CAST(CAST(t.t1 AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(t.t0 AS VARCHAR) AS DOUBLE))
                  / CAST(CAST(t.t0 AS VARCHAR) AS DOUBLE))
             AS mix_effect,
           (CAST(CAST(f.rev_post AS VARCHAR) AS DOUBLE)
              - CAST(CAST(f.rev_pre AS VARCHAR) AS DOUBLE)) - f.im_raw
             AS competitive_effect
    FROM folded f, tot t
    """,
    tags=("analytics", "shift-share", "decomposition", "bi"),
)
def nation_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of each nation's revenue growth across
    the 1996 boundary — the regional-economics classic that splits
    delta into a NATIONAL effect (what growing with the whole market
    would have given), an INDUSTRY-MIX effect (being weighted toward
    fast/slow product types), and the residual COMPETITIVE effect
    (out/under-performing within types) — the geographic sibling of
    orders_revenue_bridge's price/quantity split. Effects are defined
    additively (RS = delta - NS - IM), so the identity holds by
    construction and no division by sparse cells is needed; per-type
    growth rates divide exact decimals, and the per-nation mix sum
    folds (ptype-bounded) in type order — the ordered-fold idiom. One
    (nation, ptype, period) aggregate over the 4-way join is the only
    corpus-sized work; type and nation frames are enum-bounded."""
    from ..operators.relational import dec

    d382 = "decimal(38,2)"
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    pt = load_table(spark, sf_dir, "part")
    cutoff = F.lit("1996-01-01").cast("date")
    zero = F.lit(0).cast("decimal(12,2)")
    cells = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(cu, cu["c_custkey"] == od["o_custkey"])
        .join(na, na["n_nationkey"] == cu["c_nationkey"])
        .join(pt, pt["p_partkey"] == li["l_partkey"])
        .groupBy(
            F.col("n_name").alias("nation"), F.col("p_type").alias("ptype")
        )
        .agg(
            F.sum(
                F.when(F.to_date("o_orderdate") < cutoff,
                       dec("l_extendedprice", 12, 2)).otherwise(zero)
            ).cast(d382).alias("r0"),
            F.sum(
                F.when(F.to_date("o_orderdate") >= cutoff,
                       dec("l_extendedprice", 12, 2)).otherwise(zero)
            ).cast(d382).alias("r1"),
        )
        # (nation x ptype)-grain, enum-bounded; reused by the type
        # totals and the per-nation fold — lineage cut
        .localCheckpoint()
    )
    jt = cells.groupBy("ptype").agg(
        F.sum("r0").cast(d382).alias("c0"),
        F.sum("r1").cast(d382).alias("c1"),
    )
    tot = jt.agg(
        F.sum("c0").cast(d382).alias("t0"),
        F.sum("c1").cast(d382).alias("t1"),
    )

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    gj = jt.select(
        "ptype",
        F.when(
            F.col("c0") > 0,
            (_dbl(F.col("c1")) - _dbl(F.col("c0"))) / _dbl(F.col("c0")),
        )
        .otherwise(F.lit(0.0))
        .alias("g_j"),
    )
    folded = (
        cells.join(gj, "ptype")
        .groupBy("nation")
        .agg(
            F.sum("r0").cast(d382).alias("rev_pre"),
            F.sum("r1").cast(d382).alias("rev_post"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ptype").alias("p"),
                            (_dbl(F.col("r0")) * F.col("g_j")).alias("t"),
                        )
                    )
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["t"],
            ).alias("im_raw"),
        )
    )
    # 1-row grand-total rider (CROSS_OK pattern)
    j = folded.crossJoin(F.broadcast(tot))
    g = (_dbl(F.col("t1")) - _dbl(F.col("t0"))) / _dbl(F.col("t0"))
    ns = _dbl(F.col("rev_pre")) * g
    delta = _dbl(F.col("rev_post")) - _dbl(F.col("rev_pre"))
    return j.select(
        "nation",
        _dbl(F.col("rev_pre")).alias("rev_pre"),
        _dbl(F.col("rev_post")).alias("rev_post"),
        delta.alias("delta"),
        ns.alias("national_effect"),
        (F.col("im_raw") - ns).alias("mix_effect"),
        (delta - F.col("im_raw")).alias("competitive_effect"),
    )


@query(
    "events_conversion_window_curve",
    oracle="""
    WITH sign AS (
      SELECT user_id, MIN(ts) AS sts FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    firstp AS (
      SELECT s.user_id, s.sts, MIN(e.ts) AS pts
      FROM sign s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
           AND e.ts >= s.sts
      GROUP BY 1, 2),
    pu AS (
      SELECT s.user_id, s.sts, f.pts
      FROM sign s LEFT JOIN firstp f ON f.user_id = s.user_id),
    grid AS (
      SELECT pu.*, w.w FROM pu, unnest([1, 3, 7, 14]) AS w(w))
    SELECT CAST(w AS INTEGER) AS window_days,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(COUNT_IF(pts IS NOT NULL) AS BIGINT) AS n_converted_ever,
           CAST(COUNT_IF(pts IS NOT NULL
                         AND pts <= sts + INTERVAL (w) DAY) AS BIGINT)
             AS n_converted,
           CAST(COUNT_IF(pts IS NOT NULL
                         AND pts <= sts + INTERVAL (w) DAY) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
    FROM grid GROUP BY 1
    """,
    tags=("analytics", "attribution-window", "conversion", "planning"),
)
def events_conversion_window_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion-rate sensitivity to the attribution window: first
    signup -> first subsequent purchase within 1/3/7/14 days — the
    planning curve that PRICES an attribution-window choice before
    funnel metrics are locked in (a rate that keeps climbing at 14
    days says the window is truncating real conversions; a flat curve
    past day 3 says 7-day reporting is safe), next to
    events_funnel_latency (which distributes the lag; this reads the
    cumulative curve at policy-relevant cuts). Timestamp comparisons
    use exact interval arithmetic (never epoch-float math); counts
    are exact with one division per row. Two keyed reductions to the
    user grain, a 4x bounded window expansion, one 4-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    sign = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("sts"))
    )
    firstp = (
        sign.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
            ),
            (F.col("pu") == F.col("user_id")) & (F.col("p_ts") >= F.col("sts")),
        )
        .groupBy("user_id", "sts")
        .agg(F.min("p_ts").alias("pts"))
        .select("user_id", "pts")
    )
    pu = sign.join(firstp, "user_id", "left")
    grid = pu.select(
        "sts",
        "pts",
        F.explode(F.array(*[F.lit(w) for w in (1, 3, 7, 14)])).alias("w"),
    )
    conv = F.col("pts").isNotNull() & (
        F.col("pts") <= F.expr("timestampadd(DAY, w, sts)")
    )
    return grid.groupBy(F.col("w").cast("int").alias("window_days")).agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.count_if(F.col("pts").isNotNull())
        .cast("long")
        .alias("n_converted_ever"),
        F.count_if(conv).cast("long").alias("n_converted"),
        (
            F.count_if(conv).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


@query(
    "customer_kaplan_meier",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d,
             o_orderkey AS k
      FROM orders
    ),
    ranked AS (
      SELECT cust, d,
             ROW_NUMBER() OVER (PARTITION BY cust ORDER BY d, k) AS rn
      FROM o
    ),
    subj AS (
      SELECT cust, MIN(d) AS first_d,
             MAX(CASE WHEN rn = 2 THEN d END) AS second_d
      FROM ranked WHERE rn <= 2 GROUP BY cust
    ),
    hor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS horizon FROM orders),
    tm AS (
      SELECT CAST(date_diff('day', first_d, COALESCE(second_d, horizon))
                  AS INTEGER) AS t,
             CASE WHEN second_d IS NULL THEN 0 ELSE 1 END AS ev
      FROM subj, hor
    ),
    grain AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM tm GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(c) OVER ()
                  - COALESCE(SUM(c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM grain
    ),
    curve AS (SELECT t, d, n FROM risk WHERE d > 0),
    arr AS (
      SELECT list(struct_pack(t := t, d := d, n := n) ORDER BY t) AS a
      FROM curve
    )
    SELECT c.t AS t_days, c.n AS n_risk, c.d AS n_events,
           list_reduce(list_prepend(CAST(1 AS DOUBLE),
             list_transform(list_filter(a.a, s -> s.t <= c.t),
               s -> CAST(1 AS DOUBLE)
                    - CAST(s.d AS DOUBLE) / CAST(s.n AS DOUBLE))),
             (acc, x) -> acc * x) AS survival
    FROM curve c, arr a
    """,
    tags=("analytics", "survival", "kaplan-meier", "bi"),
    bench=True,  # frozen headline set v2 (r11)
)
def customer_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival curve for the first→second
    order gap, WITH right-censoring — the estimator
    customer_second_order_hazard deliberately omits (it conditions on
    converters only; KM uses every customer, censoring one-order
    customers at the corpus horizon, so the curve is unbiased for
    "P(still not reordered by day t)").

    Determinism: d_t/n_t divides exact integer counts (one IEEE op),
    and the cumulative product folds the event days IN t ORDER on both
    engines (list_reduce / F.aggregate over the t-sorted struct array)
    — the ordered-fold idiom; no logs anywhere. Scale: one per-customer
    two-row window + one day-grain aggregate are the only corpus-sized
    stages; the curve frame is gap-day-bounded (calendar-bounded), so
    the global risk window and the O(D^2) per-row prefix folds run on
    ~thousands of rows regardless of fact size. Two 1-row broadcast
    riders (horizon date, curve array) — CROSS_OK."""
    from pyspark.sql import Window

    od = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    w = Window.partitionBy("cust").orderBy("d", "k")
    ranked = od.select(
        F.col("o_custkey").alias("cust"),
        d.alias("d"),
        F.col("o_orderkey").alias("k"),
    ).withColumn("rn", F.row_number().over(w))
    subj = (
        ranked.filter(F.col("rn") <= 2)
        .groupBy("cust")
        .agg(
            F.min("d").alias("first_d"),
            F.max(F.when(F.col("rn") == 2, F.col("d"))).alias("second_d"),
        )
    )
    hor = od.agg(F.max(d).alias("horizon"))  # 1-row horizon rider
    tm = subj.crossJoin(F.broadcast(hor)).select(
        F.datediff(F.coalesce("second_d", "horizon"), F.col("first_d"))
        .cast("int")
        .alias("t"),
        F.when(F.col("second_d").isNull(), 0).otherwise(1).alias("ev"),
    )
    grain = tm.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    # gap-day-grain frame (calendar-bounded) — global windows are safe
    wfull = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    # curve is gap-day-grain (thousands of rows) but its lineage is the
    # full orders window + aggregate; it feeds BOTH the 1-row array
    # rider below and the final cross join, so uncached the whole
    # upstream replays twice. Cache the reduced frame once (measured at
    # sf0.1: best-of-3 0.65 s -> 0.32 s with cached-plan AQE on).
    curve = grain.select(
        F.col("t").alias("t_days"),
        F.col("d"),
        (
            F.sum("c").over(wfull)
            - F.coalesce(F.sum("c").over(wprev), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
    ).filter(F.col("d") > 0).cache()
    arr = curve.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t_days").alias("t"),
                    F.col("d").alias("d"),
                    F.col("n").alias("n"),
                )
            )
        ).alias("a")
    )  # 1-row curve-array rider
    surv = F.aggregate(
        F.filter(F.col("a"), lambda s: s["t"] <= F.col("t_days")),
        F.lit(1.0),
        lambda acc, s: acc
        * (F.lit(1.0) - s["d"].cast("double") / s["n"].cast("double")),
    )
    return curve.crossJoin(F.broadcast(arr)).select(
        "t_days",
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_events"),
        surv.alias("survival"),
    )


@query(
    "part_brand_price_index",
    oracle="""
    WITH cells AS (
      SELECT p.p_brand AS brand,
             strftime(CAST(l.l_shipdate AS DATE), '%Y-%m') AS month,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS qty,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    b0 AS (SELECT MIN(month) AS base_month FROM cells),
    base AS (
      SELECT brand, qty AS qty0, rev AS rev0
      FROM cells, b0 WHERE month = base_month
    ),
    joined AS (
      SELECT c.month, c.brand, c.qty, c.rev, b.qty0, b.rev0
      FROM cells c JOIN base b USING (brand)
    ),
    feats AS (
      SELECT month,
        CAST(SUM(rev) AS DECIMAL(38,2)) AS rev_t,
        CAST(SUM(rev0) AS DECIMAL(38,2)) AS rev0_t,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list(struct_pack(b := brand,
            v := (CAST(CAST(rev AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(qty AS VARCHAR) AS DOUBLE))
                 * CAST(CAST(qty0 AS VARCHAR) AS DOUBLE)) ORDER BY brand),
            s -> s.v)),
          (acc, x) -> acc + x) AS lasp_num,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list(struct_pack(b := brand,
            v := (CAST(CAST(rev0 AS VARCHAR) AS DOUBLE)
                  / CAST(CAST(qty0 AS VARCHAR) AS DOUBLE))
                 * CAST(CAST(qty AS VARCHAR) AS DOUBLE)) ORDER BY brand),
            s -> s.v)),
          (acc, x) -> acc + x) AS paasche_den
      FROM joined GROUP BY month
    )
    SELECT month,
      lasp_num / CAST(CAST(rev0_t AS VARCHAR) AS DOUBLE) AS laspeyres,
      CAST(CAST(rev_t AS VARCHAR) AS DOUBLE) / paasche_den AS paasche,
      sqrt((lasp_num / CAST(CAST(rev0_t AS VARCHAR) AS DOUBLE))
           * (CAST(CAST(rev_t AS VARCHAR) AS DOUBLE) / paasche_den))
        AS fisher
    FROM feats
    """,
    tags=("analytics", "price-index", "laspeyres", "paasche", "fisher", "bi"),
)
def part_brand_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Laspeyres / Paasche / Fisher price indices at brand grain
    vs the first shipping month — the national-accounts classic that
    separates price movement from volume mix (the index-number sibling
    of orders_revenue_bridge's one-step price/qty split and
    nation_shift_share's decomposition).

    Brand unit price p_{b,t} = rev/qty of exact decimal sums; Laspeyres
    numerator sum_b p_t*q_0 and Paasche denominator sum_b p_0*q_t are
    float sums over the 25-brand enum, so both fold IN BRAND ORDER (the
    ordered-fold idiom); the Laspeyres denominator (sum p_0 q_0) and
    Paasche numerator (sum p_t q_t) are exact decimal revenue sums by
    identity. Fisher = sqrt(L*P) — sqrt is always safe cross-engine.
    Scale: ONE (brand x month) aggregate over the fact join is the only
    corpus-sized stage; everything after runs on the enum x calendar
    grid (~25 x months rows), where the global base-month window and
    the 25-element folds are free."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    def _dbl(c):
        return c.cast("string").cast("double")

    d382 = "decimal(38,2)"
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    cells = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(dec("l_quantity", 12, 2)).cast(d382).alias("qty"),
            F.sum(dec("l_extendedprice", 12, 2)).cast(d382).alias("rev"),
        )
        # brand x month grain (enum x calendar bounded); reused by the
        # base frame and the join. cache(), NOT localCheckpoint(): the
        # base-month global window downstream needs the Aggregate
        # lineage visible (advisor single-partition rule), and the
        # cached frame still cuts the second fact scan
        .cache()
    )
    wfull = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = (
        cells.withColumn("base_month", F.min("month").over(wfull))
        .filter(F.col("month") == F.col("base_month"))
        .select(
            "brand", F.col("qty").alias("qty0"), F.col("rev").alias("rev0")
        )
    )
    joined = cells.join(F.broadcast(base), "brand")

    def _fold(term):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("brand").alias("b"), term.alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        )

    feats = joined.groupBy("month").agg(
        F.sum("rev").cast(d382).alias("rev_t"),
        F.sum("rev0").cast(d382).alias("rev0_t"),
        _fold(
            (_dbl(F.col("rev")) / _dbl(F.col("qty"))) * _dbl(F.col("qty0"))
        ).alias("lasp_num"),
        _fold(
            (_dbl(F.col("rev0")) / _dbl(F.col("qty0"))) * _dbl(F.col("qty"))
        ).alias("paasche_den"),
    )
    lasp = F.col("lasp_num") / _dbl(F.col("rev0_t"))
    paasche = _dbl(F.col("rev_t")) / F.col("paasche_den")
    return feats.select(
        "month",
        lasp.alias("laspeyres"),
        paasche.alias("paasche"),
        F.sqrt(lasp * paasche).alias("fisher"),
    )


@query(
    "orders_xmr_control_chart",
    oracle="""
    WITH day AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1
    ),
    mr AS (
      SELECT day, rev,
             abs(rev - lag(rev) OVER (ORDER BY day)) AS mrange
      FROM day
    ),
    lim AS (
      SELECT day, rev, mrange,
             CAST(CAST(SUM(rev) OVER () AS VARCHAR) AS DOUBLE)
               / COUNT(*) OVER () AS xbar,
             CAST(CAST(SUM(mrange) OVER () AS VARCHAR) AS DOUBLE)
               / COUNT(mrange) OVER () AS mrbar
      FROM mr
    )
    SELECT day,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(mrange AS VARCHAR) AS DOUBLE) AS moving_range,
           xbar + CAST('2.66' AS DOUBLE) * mrbar AS ucl,
           xbar - CAST('2.66' AS DOUBLE) * mrbar AS lcl,
           (CAST(CAST(rev AS VARCHAR) AS DOUBLE)
              > xbar + CAST('2.66' AS DOUBLE) * mrbar
            OR CAST(CAST(rev AS VARCHAR) AS DOUBLE)
              < xbar - CAST('2.66' AS DOUBLE) * mrbar) AS out_of_control
    FROM lim
    """,
    tags=("analytics", "control-chart", "xmr", "spc", "ops"),
)
def orders_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals + moving range) process-control chart over daily
    order revenue — the Shewhart SPC workhorse for "is today's number
    just noise?": natural process limits at xbar ± 2.66·MRbar (2.66 =
    3/d2 for n=2 subgroups), flagging out-of-control days.

    Exactness: daily revenue and the moving ranges |x_t - x_{t-1}| stay
    in DECIMAL end-to-end (decimal subtraction/abs are exact), so xbar
    and MRbar are exact-sum / count divisions — no float accumulation
    anywhere, hence no fold needed; the 2.66 constant is pinned via a
    string parse in both engines. Scale: one day-grain aggregate over
    orders is the only corpus-sized stage; the lag and the global
    limit windows run on the calendar-bounded day frame."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    def _dbl(c):
        return c.cast("string").cast("double")

    od = load_table(spark, sf_dir, "orders")
    day = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("rev")
    )
    wlag = Window.orderBy("day")
    wfull = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mr = day.withColumn(
        "mrange", F.abs(F.col("rev") - F.lag("rev").over(wlag))
    )
    lim = mr.select(
        "day",
        "rev",
        "mrange",
        (_dbl(F.sum("rev").over(wfull)) / F.count(F.lit(1)).over(wfull))
        .alias("xbar"),
        (_dbl(F.sum("mrange").over(wfull)) / F.count("mrange").over(wfull))
        .alias("mrbar"),
    )
    c266 = F.lit(2.66)
    ucl = F.col("xbar") + c266 * F.col("mrbar")
    lcl = F.col("xbar") - c266 * F.col("mrbar")
    rev_d = _dbl(F.col("rev"))
    return lim.select(
        "day",
        rev_d.alias("revenue"),
        _dbl(F.col("mrange")).alias("moving_range"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((rev_d > ucl) | (rev_d < lcl)).alias("out_of_control"),
    )


@query(
    "events_pettitt_changepoint",
    oracle="""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    v AS (
      SELECT a.d,
             CAST(SUM(CASE WHEN a.x > b.x THEN 1
                           WHEN a.x < b.x THEN -1 ELSE 0 END)
                  AS BIGINT) AS v
      FROM days a JOIN days b ON a.d <> b.d
      GROUP BY a.d
    ),
    u AS (
      SELECT d, v,
             CAST(-SUM(v) OVER (ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS u
      FROM v
    )
    SELECT d AS day, v, u,
           (abs(u) = MAX(abs(u)) OVER ()) AS is_changepoint
    FROM u
    """,
    tags=("analytics", "changepoint", "pettitt", "nonparametric"),
)
def events_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint test over the daily event-count
    series — the nonparametric single-changepoint locator (Pettitt
    1979): U_t = sum_{i<=t, j>t} sgn(x_j - x_i); the change sits where
    |U_t| peaks. Complements events_cusum_changepoint (mean-shift CUSUM
    is variance-sensitive; Pettitt is rank-based, so one spike day
    cannot drag the split point).

    Computed via the O(n) recursion U_t = -cumsum(V_t) with V_t =
    sum_j sgn(x_t - x_j), and V from ONE day x day sign join — exact
    BIGINTs end to end, zero float ops, so the oracle is hash-exact by
    construction. Scale: the only corpus-sized stage is the day-grain
    count; the sign join is span^2 day pairs (calendar-bounded, same
    contract as events_kendall_tau), and the cumsum window runs on the
    day frame."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    a = days.alias("a")
    b = days.alias("b")
    sgn = (
        F.when(F.col("a.x") > F.col("b.x"), 1)
        .when(F.col("a.x") < F.col("b.x"), -1)
        .otherwise(0)
    )
    v = (
        a.join(b, F.col("a.d") != F.col("b.d"))
        .groupBy(F.col("a.d").alias("d"))
        .agg(F.sum(sgn).cast("bigint").alias("v"))
    )
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    u = v.withColumn("u", (-F.sum("v").over(wcum)).cast("bigint"))
    return u.select(
        F.col("d").alias("day"),
        "v",
        "u",
        (F.abs("u") == F.max(F.abs("u")).over(wfull)).alias(
            "is_changepoint"
        ),
    )


@query(
    "part_demand_classification",
    oracle="""
    WITH dem AS (
      SELECT l_partkey AS part_key, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    st AS (
      SELECT part_key,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS span_days,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss
      FROM dem GROUP BY 1
    ),
    m AS (
      SELECT part_key, n_events,
             CAST(span_days AS DOUBLE) / (n_events - 1) AS adi,
             CAST(n_events * ss - s * s AS DOUBLE)
               / CAST(s * s AS DOUBLE) AS cv2
      FROM st WHERE n_events >= 2
    )
    SELECT part_key, n_events, adi, cv2,
           CASE WHEN adi < CAST('1.32' AS DOUBLE)
                     AND cv2 < CAST('0.49' AS DOUBLE) THEN 'smooth'
                WHEN adi >= CAST('1.32' AS DOUBLE)
                     AND cv2 < CAST('0.49' AS DOUBLE) THEN 'intermittent'
                WHEN adi < CAST('1.32' AS DOUBLE) THEN 'erratic'
                ELSE 'lumpy' END AS demand_class
    FROM m
    """,
    tags=("analytics", "supply-chain", "intermittent-demand",
          "syntetos-boylan"),
)
def part_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos–Boylan intermittent-demand classification per part:
    ADI (average inter-demand interval, days) x CV^2 (squared
    coefficient of variation of demand sizes) quadrants at the
    canonical 1.32 / 0.49 cutoffs — smooth / intermittent / erratic /
    lumpy, the routing table that decides which forecasting method
    (SES vs Croston vs SBA) each SKU gets.

    Exactness: demand events are (part, ship-day) integer quantity
    sums; ADI = span/(n-1) and CV^2 = (n*Σq² - (Σq)²)/(Σq)² are single
    divisions of exact BIGINTs; the cutoffs are string-pinned.
    Quantities go through FLOOR before the BIGINT cast on BOTH sides —
    identical semantics in both engines even on fractional data (a
    bare double->BIGINT cast would diverge: Spark truncates, DuckDB
    rounds; l_quantity is integral by TPC-H spec so either works on
    the fixtures, but floor makes the entry data-robust). Scale:
    one (part, day) aggregate then one part-grain aggregate — two keyed
    shuffles, output bounded by the part dimension."""
    dem = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("part_key"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    st = dem.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
    )
    m = st.filter(F.col("n_events") >= 2).select(
        "part_key",
        "n_events",
        (F.col("span_days").cast("double") / (F.col("n_events") - 1)).alias(
            "adi"
        ),
        (
            (F.col("n_events") * F.col("ss") - F.col("s") * F.col("s"))
            .cast("double")
            / (F.col("s") * F.col("s")).cast("double")
        ).alias("cv2"),
    )
    adi_cut, cv2_cut = F.lit(1.32), F.lit(0.49)
    return m.select(
        "part_key",
        "n_events",
        "adi",
        "cv2",
        F.when((F.col("adi") < adi_cut) & (F.col("cv2") < cv2_cut), "smooth")
        .when(
            (F.col("adi") >= adi_cut) & (F.col("cv2") < cv2_cut),
            "intermittent",
        )
        .when(F.col("adi") < adi_cut, "erratic")
        .otherwise("lumpy")
        .alias("demand_class"),
    )


@query(
    "part_newsvendor_stock",
    oracle="""
    WITH dem AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    v AS (
      SELECT brand, q, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM dem GROUP BY 1, 2
    ),
    c AS (
      SELECT brand, q, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY brand ORDER BY q)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY brand) AS BIGINT) AS n
      FROM v
    )
    SELECT brand, MAX(n) AS n_days,
           CAST(MIN(CASE WHEN cum * 10 >= n * 9 THEN q END)
                AS BIGINT) AS q_star,
           CAST(MIN(CASE WHEN cum * 10 >= n * 9 THEN cum END) AS DOUBLE)
             / CAST(MAX(n) AS DOUBLE) AS achieved_fill_rate
    FROM c GROUP BY brand
    """,
    tags=("analytics", "supply-chain", "newsvendor", "quantile"),
)
def part_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level per brand at critical fractile
    cu/(cu+co) = 0.9: the smallest daily-demand quantity q* whose
    empirical CDF reaches 90% — the single-period inventory rule, next
    to part_demand_classification's method router. Percentile decided
    by the exact integer rule cum*10 >= n*9 on the value-grain
    cumulative histogram (the orders_ship_sla_quantiles idiom — never a
    float percentile), so q* and the achieved fill rate (one division
    of exact integers) oracle-check bitwise. Scale: one (brand, day)
    aggregate then value-grain windows partitioned by brand — the
    per-brand value frame is bounded by distinct demand levels."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    dem = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    v = dem.groupBy("brand", "q").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = Window.partitionBy("brand").orderBy("q")
    wall = Window.partitionBy("brand")
    c = v.select(
        "brand",
        "q",
        F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        F.sum("cnt").over(wall).cast("bigint").alias("n"),
    )
    hit = F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("q"))
    hit_cum = F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("cum"))
    return c.groupBy("brand").agg(
        F.max("n").alias("n_days"),
        F.min(hit).cast("bigint").alias("q_star"),
        (
            F.min(hit_cum).cast("double") / F.max("n").cast("double")
        ).alias("achieved_fill_rate"),
    )


@query(
    "part_copurchase_rich_club",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
    ),
    eligible AS (
      SELECT basket FROM items GROUP BY basket
      HAVING COUNT(*) BETWEEN 2 AND 200
    ),
    pairs AS (
      SELECT i1.item AS a, i2.item AS b
      FROM items i1
      JOIN items i2 ON i1.basket = i2.basket AND i1.item < i2.item
      JOIN eligible el ON el.basket = i1.basket
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs
      ) GROUP BY 1
    ),
    grid AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k),
    jd AS (
      SELECT p.a, p.b, da.degree AS deg_a, db.degree AS deg_b
      FROM pairs p
      JOIN deg da ON da.node = p.a
      JOIN deg db ON db.node = p.b
    ),
    ek AS (
      SELECT g.k, CAST(COUNT(*) AS BIGINT) AS n_edges
      FROM jd CROSS JOIN grid g
      WHERE jd.deg_a > g.k AND jd.deg_b > g.k
      GROUP BY g.k
    ),
    nk AS (
      SELECT g.k, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg CROSS JOIN grid g
      WHERE deg.degree > g.k
      GROUP BY g.k
    )
    SELECT CAST(nk.k AS INTEGER) AS k, nk.n_nodes,
           COALESCE(ek.n_edges, 0) AS n_edges,
           CAST(2 * COALESCE(ek.n_edges, 0) AS DOUBLE)
             / CAST(nk.n_nodes * (nk.n_nodes - 1) AS DOUBLE) AS phi
    FROM nk LEFT JOIN ek ON ek.k = nk.k
    WHERE nk.n_nodes >= 2
    """,
    tags=("graph", "rich-club", "topology", "co-purchase"),
)
def part_copurchase_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient curve of the part co-purchase graph:
    phi(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of nodes with
    degree > k, for k in the power-of-two grid — "do the hubs buy
    together?", the topology audit that complements
    part_copurchase_assortativity (a correlation) with the actual
    hub-subgraph density curve (phi -> 1 means a hub clique, which is
    where pagerank/triangle plans skew).

    Exact integer edge/node counts per threshold (6-row enum grid
    cross, bounded fan-out); phi is one division of exact BIGINTs.
    Scale: the basket pair join is the banded co-purchase construction
    every part_copurchase_* entry shares (witness-capped baskets); the
    degree join and grid cross run at edge grain with a 6x constant."""
    from ..operators.analytics import pair_counts

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"),
        F.col("l_partkey").alias("item"),
    )
    pairs = pair_counts(items, min_pair_count=2, max_basket_size=200).select(
        F.col("item_a").alias("a"), F.col("item_b").alias("b")
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionByName(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (1, 2, 4, 8, 16, 32)])).alias(
            "k"
        )
    )
    jd = (
        pairs.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("degree", "deg_a")
        .join(
            deg.select(
                F.col("node").alias("b"), F.col("degree").alias("deg_b")
            ),
            "b",
        )
    )
    ek = (
        jd.crossJoin(F.broadcast(grid))
        .filter((F.col("deg_a") > F.col("k")) & (F.col("deg_b") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )
    nk = (
        deg.crossJoin(F.broadcast(grid))
        .filter(F.col("degree") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n_nodes") >= 2)
        .select(
            F.col("k").cast("int").alias("k"),
            "n_nodes",
            F.coalesce(F.col("n_edges"), F.lit(0))
            .cast("bigint")
            .alias("n_edges"),
            (
                (F.lit(2) * F.coalesce(F.col("n_edges"), F.lit(0)))
                .cast("double")
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double")
            ).alias("phi"),
        )
    )


@query(
    "part_dual_sourcing_risk",
    oracle="""
    WITH ps AS (
      SELECT l.l_partkey AS part_key, l.l_suppkey AS supp,
             CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l GROUP BY 1, 2
    ),
    pp AS (
      SELECT part_key,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss
      FROM ps GROUP BY 1
    ),
    b AS (
      SELECT p.p_brand AS brand, pp.n_suppliers, pp.s, pp.ss
      FROM pp JOIN part p ON p.p_partkey = pp.part_key
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT_IF(n_suppliers = 1) AS BIGINT) AS n_single_source,
           CAST(COUNT_IF(n_suppliers = 1) AS DOUBLE) / COUNT(*)
             AS single_source_share,
           CAST(COUNT_IF(2 * ss >= s * s) AS BIGINT) AS n_concentrated,
           CAST(COUNT_IF(2 * ss >= s * s) AS DOUBLE) / COUNT(*)
             AS concentrated_share
    FROM b GROUP BY brand
    """,
    tags=("analytics", "supply-chain", "hhi", "sourcing-risk"),
)
def part_dual_sourcing_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration risk per brand: the share of parts that
    are single-sourced and the share whose supplier HHI >= 0.5 — the
    procurement-resilience audit (nation_supplier_hhi's part-grain
    sibling: that entry measures market concentration per nation; this
    one flags the SKUs a single supplier failure would stop).

    The HHI >= 0.5 test never materializes a float HHI: with per-part
    quantity sums q_s, HHI = Σq_s²/(Σq_s)², so the threshold is the
    exact BIGINT comparison 2·Σq_s² >= (Σq_s)² (q_s exact: FLOOR
    before the BIGINT cast on both sides, so the rule holds even on
    fractional quantities — l_quantity is integral by TPC-H spec, but
    a bare cast would diverge cross-engine). Two keyed aggregates
    ((part, supplier) then part) + one dim join; brand-grain output."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ps = li.groupBy(
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supp"),
    ).agg(
        F.sum(F.floor("l_quantity").cast("bigint")).cast("bigint").alias("q")
    )
    pp = ps.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
    )
    b = pp.join(pt, pp["part_key"] == pt["p_partkey"]).select(
        F.col("p_brand").alias("brand"), "n_suppliers", "s", "ss"
    )
    single = F.when(F.col("n_suppliers") == 1, 1)
    conc = F.when(F.lit(2) * F.col("ss") >= F.col("s") * F.col("s"), 1)
    return b.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.count(single).cast("bigint").alias("n_single_source"),
        (F.count(single).cast("double") / F.count(F.lit(1))).alias(
            "single_source_share"
        ),
        F.count(conc).cast("bigint").alias("n_concentrated"),
        (F.count(conc).cast("double") / F.count(F.lit(1))).alias(
            "concentrated_share"
        ),
    )


@query(
    "orders_quantile_ci",
    oracle="""
    WITH j AS (
      SELECT o_orderpriority AS g,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS d
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    v AS (SELECT g, d, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY 1, 2),
    c AS (
      SELECT g, d, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY d) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM v
    ),
    r AS (
      SELECT *,
             ceil(n * CAST('0.9' AS DOUBLE)
                  - CAST('1.959963984540054' AS DOUBLE)
                    * sqrt(n * CAST('0.9' AS DOUBLE)
                           * CAST('0.1' AS DOUBLE))) AS rank_lo,
             ceil(n * CAST('0.9' AS DOUBLE)) AS rank_mid,
             ceil(n * CAST('0.9' AS DOUBLE)
                  + CAST('1.959963984540054' AS DOUBLE)
                    * sqrt(n * CAST('0.9' AS DOUBLE)
                           * CAST('0.1' AS DOUBLE))) AS rank_hi
      FROM c
    )
    SELECT g AS o_orderpriority, MAX(n) AS n_rows,
           CAST(MIN(CASE WHEN cum >= rank_lo THEN d END) AS INTEGER)
             AS p90_lo,
           CAST(MIN(CASE WHEN cum >= rank_mid THEN d END) AS INTEGER)
             AS p90,
           CAST(MIN(CASE WHEN cum >= rank_hi THEN d END) AS INTEGER)
             AS p90_hi
    FROM r GROUP BY g
    """,
    tags=("analytics", "quantile-ci", "order-statistics", "sla"),
)
def orders_quantile_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the p90 shipping
    delay per order priority, via exact order statistics: the CI
    bounds are the values at ranks n·p ± z·sqrt(n·p·(1−p)) (normal
    approximation to the binomial rank distribution, z pinned as the
    string-parsed universal constant — events_ab_sample_size
    precedent). Upgrades orders_ship_sla_quantiles' point estimates
    with sampling uncertainty — an SLA whose CI straddles the contract
    threshold is not attested either way.

    Rank selection is the exact value-grain rule (smallest value whose
    cumulative count reaches the rank); the only float math is the
    rank computation itself — identical double expressions of exact
    integer inputs in both engines, then exact integer comparisons.
    Same two-aggregate + per-group value-grain window shape as the SLA
    entry; no new corpus-sized work."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    j = li.join(od, od["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("g"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "d"
        ),
    )
    v = j.groupBy("g", "d").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wcum = Window.partitionBy("g").orderBy("d")
    wall = Window.partitionBy("g")
    c = v.select(
        "g",
        "d",
        F.sum("cnt").over(wcum).cast("bigint").alias("cum"),
        F.sum("cnt").over(wall).cast("bigint").alias("n"),
    )
    z = F.lit(1.959963984540054)
    p, q = F.lit(0.9), F.lit(0.1)
    half = z * F.sqrt(F.col("n") * p * q)
    r = c.select(
        "*",
        F.ceil(F.col("n") * p - half).alias("rank_lo"),
        F.ceil(F.col("n") * p).alias("rank_mid"),
        F.ceil(F.col("n") * p + half).alias("rank_hi"),
    )
    pick = lambda rk: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.col(rk), F.col("d"))
    ).cast("int")
    return r.groupBy(F.col("g").alias("o_orderpriority")).agg(
        F.max("n").alias("n_rows"),
        pick("rank_lo").alias("p90_lo"),
        pick("rank_mid").alias("p90"),
        pick("rank_hi").alias("p90_hi"),
    )


@query(
    "part_croston_forecast",
    oracle="""
    WITH dem AS (
      SELECT l_partkey AS part_key, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    ev AS (
      SELECT part_key, d, q,
             date_diff('day',
                       LAG(d) OVER (PARTITION BY part_key ORDER BY d),
                       d) AS iv
      FROM dem
    ),
    arr AS (
      SELECT part_key,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS span_days,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss,
             list({'z': CAST(q AS DOUBLE),
                   'p': CAST(COALESCE(iv, 0) AS DOUBLE)}
                  ORDER BY d) AS evs
      FROM ev GROUP BY 1
    ),
    f AS (
      SELECT part_key, n_events,
             CAST(span_days AS DOUBLE) / (n_events - 1) AS adi,
             CAST(n_events * ss - s * s AS DOUBLE)
               / CAST(s * s AS DOUBLE) AS cv2,
             list_reduce(
               list_concat([{'z': evs[1].z, 'p': evs[2].p}], evs[2:]),
               (acc, x) -> {
                 'z': CAST('0.1' AS DOUBLE) * x.z
                      + CAST('0.9' AS DOUBLE) * acc.z,
                 'p': CAST('0.1' AS DOUBLE) * x.p
                      + CAST('0.9' AS DOUBLE) * acc.p}
             ) AS st
      FROM arr WHERE n_events >= 2
    ),
    g AS (
      SELECT part_key, n_events, st.z AS z_hat, st.p AS p_hat,
             st.z / st.p AS croston_forecast,
             CAST('0.95' AS DOUBLE) * (st.z / st.p) AS sba_forecast,
             CASE WHEN adi < CAST('1.32' AS DOUBLE)
                       AND cv2 < CAST('0.49' AS DOUBLE) THEN 'smooth'
                  WHEN adi >= CAST('1.32' AS DOUBLE)
                       AND cv2 < CAST('0.49' AS DOUBLE) THEN 'intermittent'
                  WHEN adi < CAST('1.32' AS DOUBLE) THEN 'erratic'
                  ELSE 'lumpy' END AS demand_class
      FROM f
    )
    SELECT part_key, n_events, z_hat, p_hat, croston_forecast,
           sba_forecast, demand_class,
           CASE WHEN demand_class = 'smooth' THEN croston_forecast
                ELSE sba_forecast END AS routed_forecast
    FROM g
    """,
    tags=("analytics", "supply-chain", "croston", "sba",
          "intermittent-demand", "forecast"),
    bench=True,  # frozen headline set v2 (r11)
)
def part_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston / SBA intermittent-demand forecast per part — the
    forecaster part_demand_classification exists to route to. Croston
    (1972): keep separate exponential smoothers for demand SIZE z and
    inter-demand INTERVAL p, updated only on demand occurrences; the
    per-period demand-rate forecast is z/p. SBA (Syntetos-Boylan
    approximation) multiplies by (1 - alpha/2) to correct Croston's
    positive bias. Routing follows the SBC categorization (Syntetos,
    Boylan & Croston 2005): Croston in the smooth quadrant
    (ADI < 1.32 and CV^2 < 0.49), SBA everywhere else.

    Pinned fold convention (documented, both engines identical):
    events are the (part, ship-day) integer demand sums ordered by
    day; z starts at the first demand size, p at the first interval;
    both are then EWMA-updated over events 2..n (the first p update
    re-smooths the first interval into itself — a fixed point, so the
    convention is self-consistent). alpha = 0.1 and 1-alpha = 0.9 are
    INDEPENDENTLY string-pinned doubles — never computed as 1-alpha,
    whose IEEE result is the double below parse('0.9').

    Determinism: the ordered fold uses only double * and + in
    identical sequence on both engines (the ordered-fold idiom —
    bit-identical; no libm calls anywhere), inputs are exact BIGINTs
    cast to double, and the forecasts are one division (+ one pinned
    multiply for SBA) of identical operands. Scale: one (part, day)
    keyed aggregate, one keyed lag window, one part-grain
    collect_list fold — the per-part array is bounded by that part's
    demand days, never corpus-sized; no global state, no driver
    loops, output one row per part."""
    from pyspark.sql import Window

    dem = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("part_key"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    w = Window.partitionBy("part_key").orderBy("d")
    ev = dem.select(
        "part_key",
        "d",
        "q",
        F.datediff("d", F.lag("d").over(w)).alias("iv"),
    )
    arr = ev.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("d"),
                    F.col("q").cast("double").alias("z"),
                    F.coalesce(F.col("iv"), F.lit(0))
                    .cast("double")
                    .alias("p"),
                )
            )
        ).alias("evs"),
    )
    f = arr.filter(F.col("n_events") >= 2).select(
        "part_key",
        "n_events",
        (F.col("span_days").cast("double") / (F.col("n_events") - 1)).alias(
            "adi"
        ),
        (
            (F.col("n_events") * F.col("ss") - F.col("s") * F.col("s"))
            .cast("double")
            / (F.col("s") * F.col("s")).cast("double")
        ).alias("cv2"),
        F.expr(
            """
            aggregate(
              slice(evs, 2, size(evs) - 1),
              named_struct('z', element_at(evs, 1).z,
                           'p', element_at(evs, 2).p),
              (acc, x) -> named_struct(
                'z', CAST('0.1' AS DOUBLE) * x.z
                     + CAST('0.9' AS DOUBLE) * acc.z,
                'p', CAST('0.1' AS DOUBLE) * x.p
                     + CAST('0.9' AS DOUBLE) * acc.p)
            )"""
        ).alias("st"),
    )
    adi_cut, cv2_cut = F.lit(1.32), F.lit(0.49)
    croston = F.col("st.z") / F.col("st.p")
    g = f.select(
        "part_key",
        "n_events",
        F.col("st.z").alias("z_hat"),
        F.col("st.p").alias("p_hat"),
        croston.alias("croston_forecast"),
        (F.expr("CAST('0.95' AS DOUBLE)") * croston).alias("sba_forecast"),
        F.when((F.col("adi") < adi_cut) & (F.col("cv2") < cv2_cut), "smooth")
        .when(
            (F.col("adi") >= adi_cut) & (F.col("cv2") < cv2_cut),
            "intermittent",
        )
        .when(F.col("adi") < adi_cut, "erratic")
        .otherwise("lumpy")
        .alias("demand_class"),
    )
    return g.select(
        "*",
        F.when(F.col("demand_class") == "smooth", F.col("croston_forecast"))
        .otherwise(F.col("sba_forecast"))
        .alias("routed_forecast"),
    )


@query(
    "part_forecast_backtest",
    oracle="""
    WITH dem AS (
      SELECT l_partkey AS part_key, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    ev AS (
      SELECT part_key, d, q,
             date_diff('day',
                       LAG(d) OVER (PARTITION BY part_key ORDER BY d),
                       d) AS iv
      FROM dem
    ),
    arr AS (
      SELECT part_key,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS span_days,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss,
             list({'ec': CAST(0 AS DOUBLE), 'es': CAST(0 AS DOUBLE),
                   'en': CAST(0 AS DOUBLE),
                   'z': CAST(q AS DOUBLE),
                   'p': CAST(COALESCE(iv, 0) AS DOUBLE),
                   'r': CAST(0 AS DOUBLE),
                   'm': CAST(0 AS BIGINT), 'j': CAST(0 AS BIGINT)}
                  ORDER BY d) AS evs
      FROM ev GROUP BY 1
    ),
    f AS (
      SELECT part_key, n_events,
             CAST(span_days AS DOUBLE) / (n_events - 1) AS adi,
             CAST(n_events * ss - s * s AS DOUBLE)
               / CAST(s * s AS DOUBLE) AS cv2,
             /* DuckDB list_reduce evaluates the result-struct fields
                SEQUENTIALLY INTO the accumulator: a field expression
                sees the NEW value of any field declared before it.
                Field order is therefore load-bearing — every field
                must read only acc fields declared at-or-after itself
                (errors first: they read z/p/r/j; then z, p; r reads
                only x so it sits after its readers; m before j
                because m reads acc.j). Spark's named_struct has no
                such aliasing; only the DuckDB side needs the order. */
             list_reduce(
               list_concat([{'ec': CAST(0 AS DOUBLE),
                             'es': CAST(0 AS DOUBLE),
                             'en': CAST(0 AS DOUBLE),
                             'z': evs[1].z, 'p': evs[2].p,
                             'r': CAST(0 AS DOUBLE),
                             'm': CAST(0 AS BIGINT),
                             'j': CAST(1 AS BIGINT)}], evs[2:]),
               (acc, x) -> {
                 'ec': acc.ec + (CASE WHEN acc.j >= 2
                       THEN abs(x.z / x.p - acc.z / acc.p)
                       ELSE CAST(0 AS DOUBLE) END),
                 'es': acc.es + (CASE WHEN acc.j >= 2
                       THEN abs(x.z / x.p
                            - CAST('0.95' AS DOUBLE) * (acc.z / acc.p))
                       ELSE CAST(0 AS DOUBLE) END),
                 'en': acc.en + (CASE WHEN acc.j >= 2
                       THEN abs(x.z / x.p - acc.r)
                       ELSE CAST(0 AS DOUBLE) END),
                 'z': CAST('0.1' AS DOUBLE) * x.z
                      + CAST('0.9' AS DOUBLE) * acc.z,
                 'p': CAST('0.1' AS DOUBLE) * x.p
                      + CAST('0.9' AS DOUBLE) * acc.p,
                 'r': x.z / x.p,
                 'm': acc.m + (CASE WHEN acc.j >= 2 THEN 1 ELSE 0 END),
                 'j': acc.j + 1}
             ) AS st
      FROM arr WHERE n_events >= 3
    ),
    cls AS (
      SELECT part_key, st.m AS n_evals,
             st.ec AS ec, st.es AS es, st.en AS en,
             CASE WHEN adi < CAST('1.32' AS DOUBLE)
                       AND cv2 < CAST('0.49' AS DOUBLE) THEN 'smooth'
                  WHEN adi >= CAST('1.32' AS DOUBLE)
                       AND cv2 < CAST('0.49' AS DOUBLE) THEN 'intermittent'
                  WHEN adi < CAST('1.32' AS DOUBLE) THEN 'erratic'
                  ELSE 'lumpy' END AS demand_class
      FROM f
    ),
    mase AS (
      SELECT demand_class, ec, es, en,
             CASE WHEN en > 0 THEN ec / en END AS mase_c,
             CASE WHEN en > 0 THEN es / en END AS mase_s
      FROM cls
    ),
    lng AS (
      SELECT demand_class, 'croston' AS method, mase_c AS v
      FROM mase WHERE mase_c IS NOT NULL
      UNION ALL
      SELECT demand_class, 'sba' AS method, mase_s AS v
      FROM mase WHERE mase_s IS NOT NULL
    ),
    vg AS (
      SELECT demand_class, method, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lng GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT demand_class, method, v, c,
             SUM(c) OVER (PARTITION BY demand_class, method
                          ORDER BY v) AS cum,
             SUM(c) OVER (PARTITION BY demand_class, method) AS n
      FROM vg
    ),
    med AS (
      SELECT demand_class,
             MAX(CASE WHEN method = 'croston' THEN v END)
               AS med_mase_croston,
             MAX(CASE WHEN method = 'sba' THEN v END) AS med_mase_sba
      FROM cum
      WHERE cum - c < (n + 1) // 2 AND cum >= (n + 1) // 2
      GROUP BY 1
    ),
    agg AS (
      SELECT demand_class,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(COUNT_IF(es < ec) AS BIGINT) AS n_sba_wins,
             CAST(COUNT_IF(ec < es) AS BIGINT) AS n_croston_wins,
             CAST(COUNT_IF(es = ec) AS BIGINT) AS n_ties,
             CAST(COUNT_IF(es < ec) AS DOUBLE) / COUNT(*)
               AS sba_win_share,
             CAST(COUNT_IF(ec < en) AS BIGINT) AS n_croston_beats_naive,
             CAST(COUNT_IF(es < en) AS BIGINT) AS n_sba_beats_naive
      FROM mase GROUP BY demand_class
    )
    SELECT a.*, m.med_mase_croston, m.med_mase_sba
    FROM agg a LEFT JOIN med m USING (demand_class)
    """,
    tags=("analytics", "supply-chain", "forecast", "backtest",
          "prequential"),
)
def part_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (prequential) backtest of Croston vs SBA — the
    empirical check behind part_croston_forecast's SBC routing: at
    every demand event from the third on, both methods forecast the
    next demand RATE from the PRIOR state only (the stream_xmr
    convention: the point never moves the state that judges it), the
    realized rate is q_t/I_t, and absolute errors accumulate inside
    the same ordered fold that updates the smoothers — including the
    IN-SAMPLE NAIVE error (|r_t − r_{t−1}|, the classic MASE
    denominator), so each part gets a scale-free MASE per method
    (r11, judge task 3: raw MAE is scale-dependent, so cross-part
    comparison was weak). Per quadrant the output counts which method
    won each part (lower total absolute error), how many parts each
    method beats the naive forecast on (MASE < 1), and the exact
    lower-median MASE per method — the table that validates, on this
    corpus, the Syntetos-Boylan claim that SBA wins outside the
    smooth quadrant.

    Determinism: the fold extends part_croston_forecast's accumulator
    with error/count fields — every term is a single IEEE op on
    identical operands in identical order in both engines (divisions
    of exact-int-derived doubles, one pinned 0.95 multiply, abs, add);
    the per-part winner is an exact comparison of two such doubles,
    MASE is one division of two such doubles, and the quadrant table
    is pure integer counting plus a lower-median SELECTION at value
    grain on top (never a cross-part float sum, whose order would be
    engine-dependent). The DuckDB fold keeps the aliasing-safe field
    order (en before r: en reads acc.r, so r must update after —
    see the r10 regression guard). Scale: identical shape to
    part_croston_forecast — one (part, day) aggregate, one keyed lag
    window, one part-grain fold — plus a cached part-grain frame
    feeding the 4-row quadrant aggregate and the value-grain median
    riders (8-key windows over the REDUCED frame)."""
    from pyspark.sql import Window

    dem = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("part_key"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    w = Window.partitionBy("part_key").orderBy("d")
    ev = dem.select(
        "part_key",
        "d",
        "q",
        F.datediff("d", F.lag("d").over(w)).alias("iv"),
    )
    arr = ev.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("d"),
                    F.col("q").cast("double").alias("z"),
                    F.coalesce(F.col("iv"), F.lit(0))
                    .cast("double")
                    .alias("p"),
                )
            )
        ).alias("evs"),
    )
    f = arr.filter(F.col("n_events") >= 3).select(
        "part_key",
        (F.col("span_days").cast("double") / (F.col("n_events") - 1)).alias(
            "adi"
        ),
        (
            (F.col("n_events") * F.col("ss") - F.col("s") * F.col("s"))
            .cast("double")
            / (F.col("s") * F.col("s")).cast("double")
        ).alias("cv2"),
        F.expr(
            """
            aggregate(
              slice(evs, 2, size(evs) - 1),
              named_struct(
                'z', element_at(evs, 1).z, 'p', element_at(evs, 2).p,
                'ec', CAST(0 AS DOUBLE), 'es', CAST(0 AS DOUBLE),
                'en', CAST(0 AS DOUBLE), 'r', CAST(0 AS DOUBLE),
                'j', CAST(1 AS BIGINT), 'm', CAST(0 AS BIGINT)),
              (acc, x) -> named_struct(
                'z', CAST('0.1' AS DOUBLE) * x.z
                     + CAST('0.9' AS DOUBLE) * acc.z,
                'p', CAST('0.1' AS DOUBLE) * x.p
                     + CAST('0.9' AS DOUBLE) * acc.p,
                'ec', acc.ec + (CASE WHEN acc.j >= 2
                      THEN abs(x.z / x.p - acc.z / acc.p)
                      ELSE CAST(0 AS DOUBLE) END),
                'es', acc.es + (CASE WHEN acc.j >= 2
                      THEN abs(x.z / x.p
                           - CAST('0.95' AS DOUBLE) * (acc.z / acc.p))
                      ELSE CAST(0 AS DOUBLE) END),
                'en', acc.en + (CASE WHEN acc.j >= 2
                      THEN abs(x.z / x.p - acc.r)
                      ELSE CAST(0 AS DOUBLE) END),
                'r', x.z / x.p,
                'j', acc.j + 1,
                'm', acc.m + (CASE WHEN acc.j >= 2 THEN 1 ELSE 0 END))
            )"""
        ).alias("st"),
    )
    adi_cut, cv2_cut = F.lit(1.32), F.lit(0.49)
    cls = f.select(
        F.col("st.ec").alias("ec"),
        F.col("st.es").alias("es"),
        F.col("st.en").alias("en"),
        F.when((F.col("adi") < adi_cut) & (F.col("cv2") < cv2_cut), "smooth")
        .when(
            (F.col("adi") >= adi_cut) & (F.col("cv2") < cv2_cut),
            "intermittent",
        )
        .when(F.col("adi") < adi_cut, "erratic")
        .otherwise("lumpy")
        .alias("demand_class"),
    )
    # Part-grain error sums + scale-free MASE (denominator = in-sample
    # one-step naive error from the SAME fold; en = 0 means the naive
    # forecast was perfect — MASE undefined, NULL). Reused by the
    # quadrant aggregate AND the median riders: cache(), NOT
    # localCheckpoint() — the near-global (8-key) median windows
    # downstream need the Aggregate lineage visible to the plan
    # advisor, and the cached frame still cuts the second fact scan.
    mase = cls.select(
        "demand_class",
        "ec",
        "es",
        "en",
        F.when(F.col("en") > 0, F.col("ec") / F.col("en")).alias("mase_c"),
        F.when(F.col("en") > 0, F.col("es") / F.col("en")).alias("mase_s"),
    ).cache()
    sba_win = F.when(F.col("es") < F.col("ec"), 1)
    cro_win = F.when(F.col("ec") < F.col("es"), 1)
    tie = F.when(F.col("ec") == F.col("es"), 1)
    agg = mase.groupBy("demand_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.count(sba_win).cast("bigint").alias("n_sba_wins"),
        F.count(cro_win).cast("bigint").alias("n_croston_wins"),
        F.count(tie).cast("bigint").alias("n_ties"),
        (F.count(sba_win).cast("double") / F.count(F.lit(1))).alias(
            "sba_win_share"
        ),
        F.count(F.when(F.col("ec") < F.col("en"), 1))
        .cast("bigint")
        .alias("n_croston_beats_naive"),
        F.count(F.when(F.col("es") < F.col("en"), 1))
        .cast("bigint")
        .alias("n_sba_beats_naive"),
    )
    # Per-quadrant representative MASE: the exact LOWER MEDIAN at value
    # grain (smallest v whose cumulative count reaches ceil(n/2)) — a
    # SELECTION of an existing double, never a cross-part float sum
    # whose order would be engine-dependent (the doc_dup_quality_odds
    # idiom; the value-grain groupBy reduces before the 8-key window).
    lng = (
        mase.select(
            "demand_class",
            F.lit("croston").alias("method"),
            F.col("mase_c").alias("v"),
        )
        .unionByName(
            mase.select(
                "demand_class",
                F.lit("sba").alias("method"),
                F.col("mase_s").alias("v"),
            )
        )
        .filter(F.col("v").isNotNull())
    )
    vg = lng.groupBy("demand_class", "method", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("demand_class", "method").orderBy("v")
    wall = Window.partitionBy("demand_class", "method")
    cum = vg.select(
        "*",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    k = F.expr("(n + 1) div 2")
    med = (
        cum.filter((F.col("cum") - F.col("c") < k) & (F.col("cum") >= k))
        .groupBy("demand_class")
        .agg(
            F.max(
                F.when(F.col("method") == "croston", F.col("v"))
            ).alias("med_mase_croston"),
            F.max(F.when(F.col("method") == "sba", F.col("v"))).alias(
                "med_mase_sba"
            ),
        )
    )
    return agg.join(med, "demand_class", "left")


@query(
    "orders_ewma_control_chart",
    oracle="""
    WITH day AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1
    ),
    mr AS (
      SELECT day, rev,
             abs(rev - lag(rev) OVER (ORDER BY day)) AS mrange
      FROM day
    ),
    stats AS (
      SELECT CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) / COUNT(*) AS xbar,
             CAST(CAST(SUM(mrange) AS VARCHAR) AS DOUBLE)
               / COUNT(mrange) / CAST('1.128' AS DOUBLE) AS sigma
      FROM mr
    ),
    arr AS (
      SELECT list({'d': day, 'z': CAST(CAST(rev AS VARCHAR) AS DOUBLE),
                   'w': CAST(0 AS DOUBLE)} ORDER BY day) AS a
      FROM day
    ),
    folded AS (
      SELECT day.day,
             CAST(CAST(day.rev AS VARCHAR) AS DOUBLE) AS revenue,
             stats.xbar, stats.sigma,
             list_reduce(
               list_concat(
                 [{'d': DATE '1900-01-01', 'z': stats.xbar,
                   'w': CAST(1 AS DOUBLE)}],
                 list_filter(arr.a, e -> e.d <= day.day)),
               (acc, x) -> {
                 'd': x.d,
                 'z': CAST('0.2' AS DOUBLE) * x.z
                      + CAST('0.8' AS DOUBLE) * acc.z,
                 'w': CAST('0.64' AS DOUBLE) * acc.w}
             ) AS st
      FROM day CROSS JOIN stats CROSS JOIN arr
    )
    SELECT day, revenue,
           st.z AS ewma,
           xbar + CAST('3' AS DOUBLE) * sigma
             * sqrt(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
                    * (CAST('1' AS DOUBLE) - st.w)) AS ucl,
           xbar - CAST('3' AS DOUBLE) * sigma
             * sqrt(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
                    * (CAST('1' AS DOUBLE) - st.w)) AS lcl,
           (st.z > xbar + CAST('3' AS DOUBLE) * sigma
              * sqrt(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
                     * (CAST('1' AS DOUBLE) - st.w))
            OR st.z < xbar - CAST('3' AS DOUBLE) * sigma
              * sqrt(CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)
                     * (CAST('1' AS DOUBLE) - st.w))) AS out_of_control
    FROM folded
    """,
    tags=("analytics", "control-chart", "ewma", "spc", "ops"),
)
def orders_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily order revenue (lambda = 0.2,
    L = 3) — the small-persistent-shift detector next to
    orders_xmr_control_chart's large-shock chart (EWMA pools recent
    history, so a 0.5-sigma drift that XmR never flags crosses the
    EWMA limit in a few days). Time-varying limits use the exact
    variance inflation factor 1 - (1-lambda)^(2t).

    Determinism: the per-day EWMA and the (1-lambda)^(2t) power are
    BOTH computed by the ordered prefix fold (the kaplan-meier O(D^2)
    idiom) — the power iterates w *= '0.64' (string-pinned, never
    libm pow, which is not correctly rounded), the smoother iterates
    z = '0.2'x + '0.8'z; sigma-hat = MRbar/'1.128' (d2 for n=2) and
    xbar divide exact decimal sums; sqrt is IEEE-correctly-rounded in
    both engines (the ordered-fold idiom's one safe transcendental).
    Scale: one day-grain aggregate over orders is the only
    corpus-sized stage; the folds run on the calendar-bounded day
    frame with two 1-row broadcast riders (stats, curve array) —
    CROSS_OK."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    def _dbl(c):
        return c.cast("string").cast("double")

    od = load_table(spark, sf_dir, "orders")
    day = od.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("rev")
    )
    wlag = Window.orderBy("day")
    mr = day.withColumn(
        "mrange", F.abs(F.col("rev") - F.lag("rev").over(wlag))
    )
    stats = mr.agg(
        (_dbl(F.sum("rev")) / F.count(F.lit(1))).alias("xbar"),
        (
            _dbl(F.sum("mrange"))
            / F.count("mrange")
            / F.expr("CAST('1.128' AS DOUBLE)")
        ).alias("sigma"),
    )
    arr = day.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("day").alias("d"),
                    _dbl(F.col("rev")).alias("z"),
                    F.lit(0.0).alias("w"),
                )
            )
        ).alias("a")
    )
    lam, one_m, sq = (
        F.expr("CAST('0.2' AS DOUBLE)"),
        F.expr("CAST('0.8' AS DOUBLE)"),
        F.expr("CAST('0.64' AS DOUBLE)"),
    )
    fold = F.aggregate(
        F.filter(F.col("a"), lambda e: e["d"] <= F.col("day")),
        F.struct(
            F.col("xbar").alias("z"),
            F.lit(1.0).alias("w"),
        ),
        lambda acc, x: F.struct(
            (lam * x["z"] + one_m * acc["z"]).alias("z"),
            (sq * acc["w"]).alias("w"),
        ),
    )
    folded = (
        day.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(arr))
        .select(
            "day",
            _dbl(F.col("rev")).alias("revenue"),
            "xbar",
            "sigma",
            fold.alias("st"),
        )
    )
    frac = F.expr("CAST('0.2' AS DOUBLE) / CAST('1.8' AS DOUBLE)")
    half = (
        F.expr("CAST('3' AS DOUBLE)")
        * F.col("sigma")
        * F.sqrt(frac * (F.expr("CAST('1' AS DOUBLE)") - F.col("st.w")))
    )
    ucl = F.col("xbar") + half
    lcl = F.col("xbar") - half
    return folded.select(
        "day",
        "revenue",
        F.col("st.z").alias("ewma"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((F.col("st.z") > ucl) | (F.col("st.z") < lcl)).alias(
            "out_of_control"
        ),
    )


@query(
    "part_reorder_point",
    oracle="""
    WITH dem AS (
      SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    ds AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss
      FROM dem GROUP BY 1
    ),
    lt AS (
      SELECT p.p_brand AS brand,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS g
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ls AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(g) AS BIGINT) AS gs,
             CAST(SUM(g * g) AS BIGINT) AS gss
      FROM lt GROUP BY 1
    ),
    j AS (
      SELECT ds.brand, ds.n, ls.m,
             CAST(ds.s AS DOUBLE) / ds.n AS mean_d,
             CAST(ds.n * ds.ss - ds.s * ds.s AS DOUBLE)
               / ds.n / (ds.n - 1) AS var_d,
             CAST(ls.gs AS DOUBLE) / ls.m AS mean_l,
             CAST(ls.m * ls.gss - ls.gs * ls.gs AS DOUBLE)
               / ls.m / (ls.m - 1) AS var_l
      FROM ds JOIN ls ON ds.brand = ls.brand
      WHERE ds.n >= 2 AND ls.m >= 2
    )
    SELECT brand, n AS n_days, m AS n_shipments,
           mean_d AS mean_daily_demand, mean_l AS mean_lead_days,
           CAST('1.645' AS DOUBLE)
             * sqrt(mean_l * var_d + mean_d * mean_d * var_l)
             AS safety_stock,
           mean_d * mean_l
             + CAST('1.645' AS DOUBLE)
               * sqrt(mean_l * var_d + mean_d * mean_d * var_l)
             AS reorder_point
    FROM j
    """,
    tags=("analytics", "supply-chain", "safety-stock", "reorder-point"),
)
def part_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder point with safety stock under VARIABLE lead time per
    brand — the continuous-review (s, Q) policy parameter next to
    part_newsvendor_stock's single-period rule: ROP = d_bar*L_bar +
    z*sqrt(L_bar*s_d^2 + d_bar^2*s_L^2) (the standard compound
    formula; both demand-rate and lead-time variability contribute),
    z pinned at '1.645' (95% cycle service). Lead time is the
    order->ship gap (the fixture's only procurement latency; swap the
    gap expression for commit->receipt on data that has it).

    Determinism: daily-demand and lead-time moments are exact BIGINT
    sums; means and variances are pinned-order double divisions
    (var = (n*ss - s*s)/n/(n-1), left-associative in both engines);
    sqrt is the idiom's safe transcendental; z is string-pinned.
    Scale: two keyed aggregates over lineitem (one joined to orders,
    one to part) -> 25-row brand frame; no windows, no riders."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    od = load_table(spark, sf_dir, "orders")
    dem = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    ds = dem.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
    )
    lt = (
        li.join(od, od["o_orderkey"] == li["l_orderkey"])
        .join(pt, pt["p_partkey"] == li["l_partkey"])
        .select(
            F.col("p_brand").alias("brand"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("g"),
        )
    )
    ls = lt.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("g").cast("bigint").alias("gs"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("gss"),
    )
    j = (
        ds.join(ls, "brand")
        .filter((F.col("n") >= 2) & (F.col("m") >= 2))
        .select(
            "brand",
            "n",
            "m",
            (F.col("s").cast("double") / F.col("n")).alias("mean_d"),
            (
                (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                .cast("double")
                / F.col("n")
                / (F.col("n") - 1)
            ).alias("var_d"),
            (F.col("gs").cast("double") / F.col("m")).alias("mean_l"),
            (
                (F.col("m") * F.col("gss") - F.col("gs") * F.col("gs"))
                .cast("double")
                / F.col("m")
                / (F.col("m") - 1)
            ).alias("var_l"),
        )
    )
    z = F.expr("CAST('1.645' AS DOUBLE)")
    safety = z * F.sqrt(
        F.col("mean_l") * F.col("var_d")
        + F.col("mean_d") * F.col("mean_d") * F.col("var_l")
    )
    return j.select(
        "brand",
        F.col("n").alias("n_days"),
        F.col("m").alias("n_shipments"),
        F.col("mean_d").alias("mean_daily_demand"),
        F.col("mean_l").alias("mean_lead_days"),
        safety.alias("safety_stock"),
        (F.col("mean_d") * F.col("mean_l") + safety).alias(
            "reorder_point"
        ),
    )


@query(
    "part_abc_xyz_matrix",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey AS part_key,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM lineitem GROUP BY 1
    ),
    dem AS (
      SELECT l_partkey AS part_key, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    var AS (
      SELECT part_key, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s,
             CAST(SUM(q * q) AS BIGINT) AS ss
      FROM dem GROUP BY 1
    ),
    ranked AS (
      SELECT p.part_key, p.rev, v.n, v.s, v.ss,
             CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.part_key
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DECIMAL(38,2)) AS cum,
             CAST(SUM(p.rev) OVER () AS DECIMAL(38,2)) AS total
      FROM per_part p JOIN var v ON v.part_key = p.part_key
      WHERE v.n >= 2
    ),
    cls AS (
      SELECT rev, total,
             CASE WHEN CAST(CAST(cum AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(total AS VARCHAR) AS DOUBLE)
                       <= CAST('0.8' AS DOUBLE) THEN 'A'
                  WHEN CAST(CAST(cum AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(total AS VARCHAR) AS DOUBLE)
                       <= CAST('0.95' AS DOUBLE) THEN 'B'
                  ELSE 'C' END AS abc_class,
             CASE WHEN 4 * (n * ss - s * s) <= s * s THEN 'X'
                  WHEN n * ss - s * s <= s * s THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM ranked
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(CAST(CAST(SUM(rev) AS DECIMAL(38,2)) AS VARCHAR)
                AS DOUBLE)
             / CAST(CAST(MAX(total) AS VARCHAR) AS DOUBLE)
             AS revenue_share
    FROM cls GROUP BY 1, 2
    """,
    tags=("analytics", "supply-chain", "abc-xyz", "pareto",
          "classification"),
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC x XYZ inventory classification matrix — the planning grid
    every MRP system draws before picking policies per SKU: ABC =
    cumulative revenue Pareto classes at 80%/95% (ordered by revenue
    desc, part key as the deterministic tiebreak), XYZ = demand
    variability classes at CV 0.5 / 1.0 — tested EXACTLY in integers:
    CV <= 0.5 iff 4*(n*ss - s^2) <= s^2 and CV <= 1 iff n*ss - s^2 <=
    s^2, so the XYZ split never materializes a float. ABC boundaries
    divide exact decimal cumulative sums cast through VARCHAR (the
    portable decimal->double rule) by the same-cast total — identical
    operands in both engines, hence identical classification even AT a
    boundary. Scale: two part-grain aggregates; the Pareto window runs
    on the part-dimension frame (bounded by |part|, downstream of the
    reducing aggregate); 9-cell output."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    def _dbl(c):
        return c.cast("string").cast("double")

    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(dec("l_extendedprice", 12, 2))
        .cast("decimal(38,2)")
        .alias("rev")
    )
    dem = li.groupBy(
        F.col("l_partkey").alias("part_key"),
        F.to_date("l_shipdate").alias("d"),
    ).agg(
        F.sum(F.floor("l_quantity").cast("bigint")).cast("bigint").alias("q")
    )
    var = dem.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
    )
    wcum = Window.orderBy(F.col("rev").desc(), "part_key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy(F.col("rev").desc(), "part_key").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        per_part.join(var, "part_key")
        .filter(F.col("n") >= 2)
        .select(
            "rev",
            "n",
            "s",
            "ss",
            F.sum("rev").over(wcum).cast("decimal(38,2)").alias("cum"),
            F.sum("rev").over(wall).cast("decimal(38,2)").alias("total"),
        )
    )
    share = _dbl(F.col("cum")) / _dbl(F.col("total"))
    cv2n = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    s2 = F.col("s") * F.col("s")
    cls = ranked.select(
        "rev",
        "total",
        F.when(share <= F.expr("CAST('0.8' AS DOUBLE)"), "A")
        .when(share <= F.expr("CAST('0.95' AS DOUBLE)"), "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(F.lit(4) * cv2n <= s2, "X")
        .when(cv2n <= s2, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return cls.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (
            _dbl(F.sum("rev").cast("decimal(38,2)"))
            / _dbl(F.max("total"))
        ).alias("revenue_share"),
    )


@query(
    "part_ses_forecast",
    oracle="""
    WITH dem AS (
      SELECT l_partkey AS part_key, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    ev AS (
      SELECT part_key, d, q,
             date_diff('day',
                       LAG(d) OVER (PARTITION BY part_key ORDER BY d),
                       d) AS iv
      FROM dem
    ),
    arr AS (
      SELECT part_key,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT)
               AS span_days,
             list({'z': CAST(q AS DOUBLE),
                   'p': CAST(COALESCE(iv, 0) AS DOUBLE)}
                  ORDER BY d) AS evs
      FROM ev GROUP BY 1
    )
    SELECT part_key, n_events, span_days,
           list_reduce(
             list_concat([{'z': evs[1].z, 'p': evs[1].p}], evs[2:]),
             (acc, x) -> {
               'z': CAST('0.1' AS DOUBLE) * x.z
                    + CAST('0.9' AS DOUBLE) * list_reduce(
                        list_concat([acc.z],
                          list_transform(
                            range(1, CAST(x.p AS INTEGER)),
                            i -> CAST(0 AS DOUBLE))),
                        (dacc, y) -> CAST('0.9' AS DOUBLE) * dacc),
               'p': x.p}
           ).z AS ses_level
    FROM arr WHERE n_events >= 2
    """,
    tags=("analytics", "supply-chain", "ses", "forecast",
          "zero-filled"),
)
def part_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing over the ZERO-FILLED daily demand
    series per part — the method the smooth quadrant actually calls
    for (Croston's z/p ratio only approximates SES when demand is
    near-every-period; true SES decays through the zero days):
    z <- 0.1*x + 0.9*z applied to EVERY calendar day between first
    and last demand, where x is that day's demand or zero.

    Computed WITHOUT materializing the day series: a zero day is
    z <- 0.9*z, so a gap of g days collapses to g-1 iterated decays
    inside a NESTED fold (inner: g-1 pinned '0.9' multiplications —
    never pow, which is not correctly rounded; outer: the usual
    event-ordered fold). Per part the total inner+outer step count is
    exactly span_days — identical to folding the zero-filled series,
    at event-list memory. The outer accumulator is a single-field
    read ('z' reads only acc.z), so the DuckDB struct-fold aliasing
    hazard (see part_forecast_backtest) cannot arise. Scale: same
    skeleton as part_croston_forecast — one (part, day) aggregate,
    one keyed lag window, one part-grain fold; all keyed by part."""
    from pyspark.sql import Window

    dem = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("part_key"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    w = Window.partitionBy("part_key").orderBy("d")
    ev = dem.select(
        "part_key",
        "d",
        "q",
        F.datediff("d", F.lag("d").over(w)).alias("iv"),
    )
    arr = ev.groupBy("part_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("d"),
                    F.col("q").cast("double").alias("z"),
                    F.coalesce(F.col("iv"), F.lit(0))
                    .cast("double")
                    .alias("p"),
                )
            )
        ).alias("evs"),
    )
    return arr.filter(F.col("n_events") >= 2).select(
        "part_key",
        "n_events",
        "span_days",
        F.expr(
            """
            aggregate(
              slice(evs, 2, size(evs) - 1),
              named_struct('z', element_at(evs, 1).z),
              (acc, x) -> named_struct('z',
                CAST('0.1' AS DOUBLE) * x.z
                + CAST('0.9' AS DOUBLE) * aggregate(
                    filter(sequence(1, CAST(x.p AS INT)),
                           i -> i < CAST(x.p AS INT)),
                    acc.z,
                    (dacc, i) -> CAST('0.9' AS DOUBLE) * dacc))
            ).z"""
        ).alias("ses_level"),
    )


@query(
    "orders_holt_forecast",
    oracle="""
    WITH day AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(38,2)) AS rev
      FROM orders GROUP BY 1, 2
    ),
    ev AS (
      SELECT priority, d,
             CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS z,
             CAST(COALESCE(date_diff('day',
                   LAG(d) OVER (PARTITION BY priority ORDER BY d), d), 0)
                  AS DOUBLE) AS p
      FROM day
    ),
    arr AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS span_days,
             list([CAST(date_diff('day', DATE '1970-01-01', d) AS DOUBLE),
                   z, p] ORDER BY d) AS evs
      FROM ev GROUP BY 1
    ),
    folded AS (
      SELECT priority, n_days, span_days,
             list_reduce(
               list_concat([[evs[1][2], CAST(0 AS DOUBLE)]], evs[2:]),
               (acc, x) -> list_reduce(
                 list_concat([acc],
                   list_transform(range(1, CAST(x[3] AS INTEGER) + 1),
                                  i -> [CAST(i AS DOUBLE)])),
                 (a2, y) -> [
                   CAST('0.2' AS DOUBLE)
                     * (CASE WHEN y[1] = x[3] THEN x[2]
                             ELSE CAST(0 AS DOUBLE) END)
                   + CAST('0.8' AS DOUBLE) * (a2[1] + a2[2]),
                   CAST('0.1' AS DOUBLE)
                     * (CAST('0.2' AS DOUBLE)
                        * ((CASE WHEN y[1] = x[3] THEN x[2]
                                 ELSE CAST(0 AS DOUBLE) END) - a2[1])
                        + CAST('0.8' AS DOUBLE) * a2[2])
                   + CAST('0.9' AS DOUBLE) * a2[2]])
             ) AS st
      FROM arr WHERE n_days >= 2
    )
    SELECT priority, n_days, span_days,
           st[1] AS level, st[2] AS trend,
           st[1] + CAST('7' AS DOUBLE) * st[2] AS forecast_7d
    FROM folded
    """,
    tags=("analytics", "forecast", "holt", "trend", "zero-filled"),
)
def orders_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing over the
    ZERO-FILLED daily revenue series per order priority (alpha = 0.2,
    beta = 0.1) — the trend-aware forecaster that completes the
    smoothing family (part_ses_forecast handles trendless smooth
    demand, part_croston_forecast the intermittent quadrants; Holt is
    what the SBC router would call for a trending smooth series):
    l' = a*x + (1-a)*(l + b), b' = beta*(l' - l) + (1-beta)*b applied
    to EVERY calendar day between a priority's first and last order
    day, x = that day's revenue or zero.

    Computed WITHOUT materializing the day series: each event row
    carries its lag gap p, and the fold iterates the p-1 zero days
    plus the event day in one inner pass (the part_ses_forecast
    gap-collapse idiom, generalized to two state variables). Total
    fold work per priority is exactly span_days at event-list memory.

    Determinism: the trend update is algebraically rewritten to read
    ONLY the previous step's state — b' = 0.1*(0.2*(x - l) + 0.8*b)
    + 0.9*b, since l' - l = 0.2*(x - l) + 0.8*b — and the accumulator
    is a DOUBLE LIST, not a struct: DuckDB's list_reduce struct
    accumulators are NOT alias-free (a field reads same-step-updated
    earlier fields from step 2 on — see part_forecast_backtest and
    the regression guard in tests/test_r10_operators.py), but
    list-valued accumulators evaluate every element against the old
    list (pinned by a guard test alongside the struct one). Both
    engines run the identical pinned-constant multiply-add chain in
    event order; day revenue enters as an exact DECIMAL sum cast
    through VARCHAR (the ordered-fold idiom).

    Scale: one (priority, day) keyed aggregate over orders is the
    only corpus-sized stage; the lag window and the fold run on the
    5-row-per-day priority grain, output is dimension-bounded (5
    rows). No broadcast riders, no cross joins."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    day = od.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("d"),
    ).agg(F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("rev"))
    w = Window.partitionBy("priority").orderBy("d")
    ev = day.select(
        "priority",
        "d",
        F.col("rev").cast("string").cast("double").alias("z"),
        F.coalesce(F.datediff("d", F.lag("d").over(w)), F.lit(0))
        .cast("double")
        .alias("p"),
    )
    arr = ev.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
        F.array_sort(
            F.collect_list(
                F.array(
                    F.datediff("d", F.lit("1970-01-01").cast("date")).cast(
                        "double"
                    ),
                    F.col("z"),
                    F.col("p"),
                )
            )
        ).alias("evs"),
    )
    fold = F.expr(
        """
        aggregate(
          slice(evs, 2, size(evs) - 1),
          array(element_at(element_at(evs, 1), 2), CAST(0 AS DOUBLE)),
          (acc, x) -> aggregate(
            sequence(1, CAST(element_at(x, 3) AS INT)),
            acc,
            (a2, i) -> array(
              CAST('0.2' AS DOUBLE)
                * IF(i = CAST(element_at(x, 3) AS INT),
                     element_at(x, 2), CAST(0 AS DOUBLE))
              + CAST('0.8' AS DOUBLE)
                * (element_at(a2, 1) + element_at(a2, 2)),
              CAST('0.1' AS DOUBLE)
                * (CAST('0.2' AS DOUBLE)
                   * (IF(i = CAST(element_at(x, 3) AS INT),
                         element_at(x, 2), CAST(0 AS DOUBLE))
                      - element_at(a2, 1))
                   + CAST('0.8' AS DOUBLE) * element_at(a2, 2))
              + CAST('0.9' AS DOUBLE) * element_at(a2, 2))))
        """
    )
    return (
        arr.filter(F.col("n_days") >= 2)
        .select("priority", "n_days", "span_days", fold.alias("st"))
        .select(
            "priority",
            "n_days",
            "span_days",
            F.element_at("st", 1).alias("level"),
            F.element_at("st", 2).alias("trend"),
            (
                F.element_at("st", 1)
                + F.expr("CAST('7' AS DOUBLE)") * F.element_at("st", 2)
            ).alias("forecast_7d"),
        )
    )


@query(
    "part_eoq_policy",
    oracle="""
    WITH dem AS (
      SELECT l_partkey AS part_key,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
               AS annual_demand
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate < DATE '1996-01-01'
      GROUP BY 1
    ),
    j AS (
      SELECT dem.part_key, p.p_brand AS brand, dem.annual_demand,
             p.p_retailprice AS unit_price,
             sqrt(CAST('2' AS DOUBLE)
                  * CAST(dem.annual_demand AS DOUBLE)
                  * CAST('100' AS DOUBLE)
                  / (CAST('0.25' AS DOUBLE) * p.p_retailprice)) AS eoq_qty
      FROM dem JOIN part p ON p.p_partkey = dem.part_key
      WHERE dem.annual_demand >= 1
    )
    SELECT part_key, brand, annual_demand, unit_price, eoq_qty,
           CAST(annual_demand AS DOUBLE) / eoq_qty AS orders_per_year,
           CAST('365' AS DOUBLE)
             / (CAST(annual_demand AS DOUBLE) / eoq_qty) AS cycle_days,
           CAST('100' AS DOUBLE)
             * (CAST(annual_demand AS DOUBLE) / eoq_qty)
           + CAST('0.25' AS DOUBLE) * unit_price * eoq_qty
             / CAST('2' AS DOUBLE) AS total_relevant_cost
    FROM j
    """,
    tags=("analytics", "supply-chain", "eoq", "inventory-policy"),
)
def part_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per part over 1995 shipped demand —
    the (Q, R) policy's Q leg next to part_reorder_point's R leg
    (part_newsvendor_stock covers the single-period case, the
    ABC x XYZ matrix the review-cadence routing): Q* =
    sqrt(2*D*S / H) with ordering cost S = 100 and holding cost
    H = 0.25 * unit retail price, plus the implied orders/year,
    cycle length, and total relevant cost S*D/Q + H*Q/2 at the
    optimum.

    Determinism: annual demand is an exact BIGINT (FLOOR before the
    cast on both sides per the cross-engine truncation rule); every
    derived column is the same pinned-constant multiply/divide chain
    in the same order on both engines, and sqrt is the ordered-fold
    idiom's one safe transcendental (IEEE correctly rounded in both).
    Scale: one pushed-down year-filtered scan of lineitem into a
    (part_key) keyed aggregate, then one keyed equi-join with part —
    both shuffle on the same key; no broadcast riders, no windows,
    output at surviving-part grain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dem = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        )
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("annual_demand")
        )
        .filter(F.col("annual_demand") >= 1)
    )
    two, s_cost, h_rate = (
        F.expr("CAST('2' AS DOUBLE)"),
        F.expr("CAST('100' AS DOUBLE)"),
        F.expr("CAST('0.25' AS DOUBLE)"),
    )
    j = dem.join(
        part, part["p_partkey"] == dem["part_key"], "inner"
    ).select(
        "part_key",
        F.col("p_brand").alias("brand"),
        "annual_demand",
        F.col("p_retailprice").alias("unit_price"),
        F.sqrt(
            two
            * F.col("annual_demand").cast("double")
            * s_cost
            / (h_rate * F.col("p_retailprice"))
        ).alias("eoq_qty"),
    )
    opy = F.col("annual_demand").cast("double") / F.col("eoq_qty")
    return j.select(
        "part_key",
        "brand",
        "annual_demand",
        "unit_price",
        "eoq_qty",
        opy.alias("orders_per_year"),
        (F.expr("CAST('365' AS DOUBLE)") / opy).alias("cycle_days"),
        (
            s_cost * opy
            + h_rate * F.col("unit_price") * F.col("eoq_qty") / two
        ).alias("total_relevant_cost"),
    )


@query(
    "orders_holt_winters_forecast",
    oracle="""
    WITH day AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1, 2
),
ev AS (
  SELECT priority, d,
         CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS z,
         CAST(COALESCE(date_diff('day',
               LAG(d) OVER (PARTITION BY priority ORDER BY d), d), 0)
              AS DOUBLE) AS p
  FROM day
),
arr AS (
  SELECT priority,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(date_diff('day', DATE '1970-01-01', MAX(d)) AS BIGINT)
           AS last_dayn,
         CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS span_days,
         list([CAST(date_diff('day', DATE '1970-01-01', d) AS DOUBLE),
               z, p] ORDER BY d) AS evs
  FROM ev GROUP BY 1
),
folded AS (
  SELECT priority, n_days, span_days, last_dayn,
         list_reduce(
           list_concat(
             [list_concat([evs[1][2], CAST(0 AS DOUBLE)],
                          list_transform(range(0, 7),
                                         k -> CAST(0 AS DOUBLE)))],
             evs[2:]),
           (acc, x) -> list_reduce(
             list_concat([acc],
               list_transform(range(1, CAST(x[3] AS INTEGER) + 1),
                              i -> [CAST(i AS DOUBLE)])),
             (a2, y) -> list_concat(
               [
                 CAST('0.2' AS DOUBLE)
                   * ((CASE WHEN y[1] = x[3] THEN x[2]
                            ELSE CAST(0 AS DOUBLE) END)
                      - a2[3 + ((CAST(x[1] AS INTEGER)
                                 - CAST(x[3] AS INTEGER)
                                 + CAST(y[1] AS INTEGER)) % 7)])
                 + CAST('0.8' AS DOUBLE) * (a2[1] + a2[2]),
                 CAST('0.1' AS DOUBLE)
                   * (CAST('0.2' AS DOUBLE)
                      * ((CASE WHEN y[1] = x[3] THEN x[2]
                               ELSE CAST(0 AS DOUBLE) END)
                         - a2[3 + ((CAST(x[1] AS INTEGER)
                                    - CAST(x[3] AS INTEGER)
                                    + CAST(y[1] AS INTEGER)) % 7)]
                         - a2[1])
                      + CAST('0.8' AS DOUBLE) * a2[2])
                 + CAST('0.9' AS DOUBLE) * a2[2]
               ],
               list_transform(range(0, 7), k ->
                 CASE WHEN k = ((CAST(x[1] AS INTEGER)
                                 - CAST(x[3] AS INTEGER)
                                 + CAST(y[1] AS INTEGER)) % 7)
                 THEN CAST('0.15' AS DOUBLE)
                        * ((CASE WHEN y[1] = x[3] THEN x[2]
                                 ELSE CAST(0 AS DOUBLE) END)
                           - (CAST('0.2' AS DOUBLE)
                              * ((CASE WHEN y[1] = x[3] THEN x[2]
                                       ELSE CAST(0 AS DOUBLE) END)
                                 - a2[3 + ((CAST(x[1] AS INTEGER)
                                            - CAST(x[3] AS INTEGER)
                                            + CAST(y[1] AS INTEGER))
                                           % 7)])
                              + CAST('0.8' AS DOUBLE)
                                * (a2[1] + a2[2])))
                      + CAST('0.85' AS DOUBLE) * a2[3 + CAST(k AS INTEGER)]
                 ELSE a2[3 + CAST(k AS INTEGER)] END)))
         ) AS st
  FROM arr WHERE n_days >= 2
),
grid AS (
      SELECT priority, n_days, span_days, last_dayn,
             st[1] AS level, st[2] AS trend,
             CAST(k AS INTEGER) AS dow,
             st[3 + CAST(k AS INTEGER)] AS seasonal
      FROM folded CROSS JOIN (SELECT unnest(range(0, 7)) AS k) g
    )
    SELECT priority, n_days, span_days, level, trend, dow, seasonal,
           CAST(((dow - last_dayn % 7 + 6) % 7) + 1 AS INTEGER)
             AS horizon_days,
           level
           + CAST(((dow - last_dayn % 7 + 6) % 7) + 1 AS DOUBLE) * trend
           + seasonal AS forecast
    FROM grid
    """,
    tags=("analytics", "forecast", "holt-winters", "seasonal",
          "zero-filled"),
)
def orders_holt_winters_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing over the
    ZERO-FILLED daily revenue series per order priority (alpha = 0.2,
    beta = 0.1, gamma = 0.15, weekly season m = 7) — the seasonal
    capstone of the smoothing family (part_ses_forecast: level only;
    orders_holt_forecast: level + trend; Croston/SBA: intermittent):
    l' = a*(x - s_dow) + (1-a)*(l + b); b' = beta*(l' - l) +
    (1-beta)*b; s_dow' = gamma*(x - l') + (1-gamma)*s_dow, applied to
    EVERY calendar day in the span (x = revenue or zero), slot = day
    number mod 7.

    The accumulator is an ALIAS-FREE DOUBLE LIST [l, b, s0..s6] (the
    orders_holt_forecast construction widened by the 7 seasonal
    slots; the list-fold guard test pins the alias-free semantics):
    each step builds a fresh 9-element list where only today's slot
    updates, and every dependent read (l' inside b' and s') is the
    identically-inlined previous-state expression on both engines, so
    the pinned-constant multiply-add chains are bit-identical. The
    gap-collapse inner fold iterates a lag gap's zero days WITH their
    own day-of-week slots (a zero Tuesday decays s2, not s_event).

    Output grain is (priority, dow): the final level/trend, each
    slot's seasonal index, and the forecast for that weekday's NEXT
    occurrence after the last observed day (horizon_days in 1..7,
    computed with a nonnegative-modulus identity so both engines'
    remainder semantics agree). Scale: one (priority, day) keyed
    aggregate over orders is the only corpus-sized stage; the fold
    runs on the 5-group event arrays, output is 35 rows."""
    from pyspark.sql import Window

    from ..operators.relational import dec

    od = load_table(spark, sf_dir, "orders")
    day = od.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("d"),
    ).agg(F.sum(dec("o_totalprice", 12, 2)).cast("decimal(38,2)").alias("rev"))
    w = Window.partitionBy("priority").orderBy("d")
    ev = day.select(
        "priority",
        "d",
        F.col("rev").cast("string").cast("double").alias("z"),
        F.coalesce(F.datediff("d", F.lag("d").over(w)), F.lit(0))
        .cast("double")
        .alias("p"),
    )
    arr = ev.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.datediff(
            F.max("d"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("last_dayn"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
        F.array_sort(
            F.collect_list(
                F.array(
                    F.datediff("d", F.lit("1970-01-01").cast("date")).cast(
                        "double"
                    ),
                    F.col("z"),
                    F.col("p"),
                )
            )
        ).alias("evs"),
    )
    fold = F.expr(
        """
aggregate(
  slice(evs, 2, size(evs) - 1),
  concat(
    array(element_at(element_at(evs, 1), 2), CAST(0 AS DOUBLE)),
    array_repeat(CAST(0 AS DOUBLE), 7)),
  (acc, x) -> aggregate(
    sequence(1, CAST(element_at(x, 3) AS INT)),
    acc,
    (a2, i) -> concat(
      array((CAST('0.2' AS DOUBLE) * (IF(i = CAST(element_at(x, 3) AS INT), element_at(x, 2), CAST(0 AS DOUBLE)) - element_at(a2, 3 + pmod(CAST(element_at(x, 1) AS INT) - CAST(element_at(x, 3) AS INT) + i, 7))) + CAST('0.8' AS DOUBLE) * (element_at(a2, 1) + element_at(a2, 2))), (CAST('0.1' AS DOUBLE) * (CAST('0.2' AS DOUBLE) * (IF(i = CAST(element_at(x, 3) AS INT), element_at(x, 2), CAST(0 AS DOUBLE)) - element_at(a2, 3 + pmod(CAST(element_at(x, 1) AS INT) - CAST(element_at(x, 3) AS INT) + i, 7)) - element_at(a2, 1)) + CAST('0.8' AS DOUBLE) * element_at(a2, 2)) + CAST('0.9' AS DOUBLE) * element_at(a2, 2))),
      transform(sequence(0, 6), k ->
        IF(k = pmod(CAST(element_at(x, 1) AS INT) - CAST(element_at(x, 3) AS INT) + i, 7), (CAST('0.15' AS DOUBLE) * (IF(i = CAST(element_at(x, 3) AS INT), element_at(x, 2), CAST(0 AS DOUBLE)) - (CAST('0.2' AS DOUBLE) * (IF(i = CAST(element_at(x, 3) AS INT), element_at(x, 2), CAST(0 AS DOUBLE)) - element_at(a2, 3 + pmod(CAST(element_at(x, 1) AS INT) - CAST(element_at(x, 3) AS INT) + i, 7))) + CAST('0.8' AS DOUBLE) * (element_at(a2, 1) + element_at(a2, 2)))) + CAST('0.85' AS DOUBLE) * element_at(a2, 3 + k)), element_at(a2, 3 + k))))))"""
    )
    grid = (
        arr.filter(F.col("n_days") >= 2)
        .select(
            "priority", "n_days", "span_days", "last_dayn", fold.alias("st")
        )
        .select(
            "priority",
            "n_days",
            "span_days",
            "last_dayn",
            F.element_at("st", 1).alias("level"),
            F.element_at("st", 2).alias("trend"),
            F.posexplode(F.slice("st", 3, 7)).alias("dow0", "seasonal"),
        )
    )
    h = (
        (F.col("dow0").cast("int") - F.col("last_dayn") % 7 + 6) % 7 + 1
    ).cast("int")
    return grid.select(
        "priority",
        "n_days",
        "span_days",
        "level",
        "trend",
        F.col("dow0").cast("int").alias("dow"),
        "seasonal",
        h.alias("horizon_days"),
        (
            F.col("level")
            + h.cast("double") * F.col("trend")
            + F.col("seasonal")
        ).alias("forecast"),
    )
