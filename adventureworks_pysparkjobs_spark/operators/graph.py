"""Iterative graph operators beyond connected components
(operators/dedup.py:dedup_clusters): weighted PageRank and
degree-oriented triangle counting.

PageRank is normally hopeless to oracle-check across engines — every
implementation sums floating-point contributions in its own order. This
one is **integer-scaled**: ranks live as BIGINTs scaled by ``scale``
(default 10⁹), every transition is integer multiply → integer floor
division, and the damping mix is exact rational arithmetic
(``damping_num/damping_den``). Integer addition is associative, so the
result is bit-identical under any partitioning AND in any engine — the
DuckDB oracle replays the same fixed iteration count with ``//``
arithmetic. The quantization error vs true PageRank is O(iterations /
scale) per node — documented semantics, not noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Weighted PageRank over a directed edge list (symmetrize first
    for undirected graphs), integer-scaled for determinism.

    Per iteration: ONE equi-join of the node-sized rank frame against
    the checkpointed edge list on ``src`` and ONE groupBy(``dst``) sum
    — the classic distributed formulation, O(edges) shuffle per
    iteration with map-side partial sums. Iterations stay LAZY: each
    rank generation references the previous exactly once, so lineage
    grows linearly (unlike dedup_clusters' 3x-per-pass jump join) and
    a fixed-iteration run needs NO per-iteration materialization
    (measured at sf0.1: fully lazy is ~1.5x faster than per-iteration
    checkpointing — the whole run is ONE job AQE schedules stage by
    stage). ``checkpoint_every`` (default 0 = never) bounds plan
    depth/optimizer time for runs of tens of iterations. The driver sees
    only the node count; ranks never leave the cluster.

    Every node must appear as a source (true after symmetrization —
    no dangling-mass redistribution is needed or implemented).

    Returns (node, rank_scaled BIGINT, rank DOUBLE = scaled/scale).
    """
    # Callers pass an EXPENSIVE edge subquery (pair_counts over the fact
    # table, symmetrized); it is referenced four times below (nodes
    # twice, outw, e) before the derived checkpoints exist — cut the
    # lineage once up front so the subquery runs once, not four times.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    outw = edges.groupBy(src).agg(
        F.sum(F.col(weight).cast("long")).alias("ow")
    )
    e = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            F.col(weight).cast("long").alias("w"),
            F.col("ow"),
        )
        .localCheckpoint()
    )
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    r = nodes.select(
        "node", F.lit(scale // n).cast("long").alias("r")
    )
    for i in range(iterations):
        contrib = (
            e.join(r, e["e_src"] == r["node"])
            .select(
                F.col("e_dst").alias("c_node"),
                F.expr("(r * w) div ow").alias("c"),
            )
            .groupBy("c_node")
            .agg(F.sum("c").alias("s"))
        )
        r = nodes.join(
            contrib, nodes["node"] == contrib["c_node"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(s, 0L)) div {damping_den}"
                )
            ).cast("long").alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            r = r.localCheckpoint()
    return r.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
) -> DataFrame:
    """Personalized PageRank: random walk with restart to a SEED set —
    the "related to THESE items" ranking behind item-to-item
    recommendation and local community scoring, vs global importance
    from :func:`pagerank`.

    Identical integer-scaled recurrence, two differences: the initial
    mass and the per-step restart mass ((1-d)/|S|) land only on seed
    nodes (0 elsewhere) instead of uniformly. Same exactness argument:
    integer multiply -> floor division -> associative integer sums, so
    the result is bit-identical across engines and partitionings and
    the oracle replays the iterations in unrolled SQL.

    ``seeds`` is a 1-column (node) frame; it must be SMALL (a seed set,
    broadcast to the node frame) and non-empty. Scale shape per
    iteration: one edge equi-join + one keyed sum, O(edges) shuffle —
    the node frame carries one extra broadcast-joined seed flag.

    Returns (node, rank_scaled BIGINT, rank DOUBLE = scaled/scale).
    """
    # Same lineage cut as pagerank: the caller's edge subquery is
    # referenced four times (nodes twice, outw, e) before the derived
    # checkpoints exist.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    seed_flag = F.broadcast(
        seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    ).withColumn("is_seed", F.lit(True))
    n_seeds = seed_flag.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    outw = edges.groupBy(src).agg(
        F.sum(F.col(weight).cast("long")).alias("ow")
    )
    e = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("e_src"),
            F.col(dst).alias("e_dst"),
            F.col(weight).cast("long").alias("w"),
            F.col("ow"),
        )
        .localCheckpoint()
    )
    flagged = nodes.join(seed_flag, "node", "left").select(
        "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
    ).localCheckpoint()
    base = ((damping_den - damping_num) * scale) // (damping_den * n_seeds)
    seed_base = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
    r = flagged.select(
        "node",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(scale // n_seeds))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(r, e["e_src"] == r["node"])
            .select(
                F.col("e_dst").alias("c_node"),
                F.expr("(r * w) div ow").alias("c"),
            )
            .groupBy("c_node")
            .agg(F.sum("c").alias("s"))
        )
        r = flagged.join(
            contrib, flagged["node"] == contrib["c_node"], "left"
        ).select(
            "node",
            "is_seed",
            (
                seed_base
                + F.expr(
                    f"({damping_num} * coalesce(s, 0L)) div {damping_den}"
                )
            ).cast("long").alias("r"),
        )
    return r.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def triangle_counts(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph given as canonical edges (``a < b``, distinct).

    Uses the standard degree-ordered orientation (the MapReduce
    triangle-counting trick): every edge is directed from its lower
    (degree, id) endpoint to the higher, so each node's out-degree is
    O(sqrt(edges)) regardless of raw degree — a celebrity node with
    10^6 neighbours contributes wedges bounded by its *out*-neighbours,
    not its full adjacency. The wedge self-join and the closing-edge
    join are both plain keyed equi-joins (never a cartesian), and every
    aggregation partial-aggregates map-side, so the whole operator is
    four keyed shuffles independent of skew.

    The count is exact integer arithmetic; ``clustering`` =
    2*T / (deg*(deg-1)) is one closed-form IEEE expression of exact
    operands, so the result is bit-identical across engines and
    partitionings (the doc_lm_quality / pagerank determinism scheme).

    Returns (node, n_triangles BIGINT, degree BIGINT,
    clustering DOUBLE) for nodes in >= 1 triangle.
    """
    # The caller's edge subquery is referenced five times transitively
    # (deg twice via dx/dy with two stub scans inside, plus the with_deg
    # join); deg's two join keys (x vs y) need different distributions,
    # so exchange reuse cannot dedupe them. Cut both lineages once.
    ea = edges.select(F.col(a).alias("x"), F.col(b).alias("y")).localCheckpoint()
    deg = (
        ea.select(F.col("x").alias("node"))
        .union(ea.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .localCheckpoint()
    )
    dx = deg.select(
        F.col("node").alias("x"), F.col("deg").alias("deg_x")
    )
    dy = deg.select(
        F.col("node").alias("y"), F.col("deg").alias("deg_y")
    )
    with_deg = ea.join(dx, "x").join(dy, "y")
    lo_first = (F.col("deg_x") < F.col("deg_y")) | (
        (F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y"))
    )
    oriented = with_deg.select(
        F.when(lo_first, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(lo_first, F.col("y")).otherwise(F.col("x")).alias("dst"),
        F.when(lo_first, F.col("deg_y"))
        .otherwise(F.col("deg_x"))
        .alias("dst_deg"),
    ).localCheckpoint()
    o1 = oriented.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("dst_deg").alias("dv"),
    )
    o2 = oriented.select(
        F.col("src").alias("u"),
        F.col("dst").alias("w"),
        F.col("dst_deg").alias("dw"),
    )
    # Wedge (v, w) out of a shared source u, emitted once in
    # orientation order — the closing edge, if present, is oriented
    # exactly v -> w because orientation is a total order.
    wedges = o1.join(o2, "u").where(
        F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    per_node = (
        tri.select(
            F.explode(F.array("u", "v", "w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return per_node.join(deg, "node").select(
        "node",
        "n_triangles",
        F.col("deg").cast("long").alias("degree"),
        (
            (F.lit(2.0) * F.col("n_triangles"))
            / (F.col("deg") * (F.col("deg") - F.lit(1.0)))
        ).alias("clustering"),
    )


def path_to_root(
    tree: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    weight_col: str = "w",
    max_iterations: int = 64,
) -> DataFrame:
    """Flatten a rooted hierarchy (BOM, org chart, category tree):
    per node, its depth and the total weight along the path to the
    root — by POINTER DOUBLING (binary lifting), not per-level walking.

    ``tree`` has one row per node: (id, parent, weight); roots carry
    ``parent IS NULL``. Forests (several roots) are fine.

    Why doubling: the naive parent-at-a-time loop is O(depth) joins —
    a 40-level BOM costs 40 shuffles and 40 optimizer rounds. Here
    every node tracks (anc = 2^i-th ancestor, edges walked, weight sum
    over (node, anc]); one self-join per iteration composes each
    node's segment with its ancestor's segment, DOUBLING the walked
    distance — O(log depth) shuffles total, each O(nodes). Settled
    rows (anc = a root) pass through unchanged; composing with a
    settled ancestor caps at that root, so mixed depths converge
    independently. The driver sees one unsettled-count per iteration
    (1-row collect); per-iteration localCheckpoint keeps lineage flat.

    Integer weights keep the path sums associative and engine-exact
    (the oracle replays a recursive CTE). Returns
    (id, root_id, depth BIGINT, path_w BIGINT = weight(node) + weights
    of all ancestors to the root). Raises if any chain exceeds
    2^max_iterations edges (a cycle — not a tree), and FAILS FAST on
    dangling parents (a parent id with no node row): a dangling chain
    can never settle, so without the upfront check the doubling loop
    would grind through all max_iterations (each with a checkpoint +
    count) before dying with a misleading 'cycle' error — the r5 sf1
    scale smoke hit exactly that on gap-keyed data. The check is one
    anti-join over the tree, negligible next to the iterations it
    guards.
    """
    ids = tree.select(F.col(id_col).alias("_id"))
    dangling = (
        tree.filter(F.col(parent_col).isNotNull())
        .join(ids, F.col(parent_col) == F.col("_id"), "left_anti")
        .limit(1)
        .count()
    )
    if dangling:
        raise ValueError(
            "path_to_root: parent column references node id(s) with no "
            "node row (dangling parents) — the input is not a rooted "
            "tree/forest; repair the hierarchy or filter orphan edges"
        )
    w_self = tree.select(
        F.col(id_col).alias("_n"), F.col(weight_col).cast("long").alias("_wn")
    )
    t = tree.select(
        F.col(id_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("d"),
        F.lit(0).cast("long").alias("s"),  # weight over (node, anc]
        F.col(parent_col).isNull().alias("settled"),
    )
    # fold the parent's weight into s for non-root nodes
    t = (
        t.join(
            w_self.select(
                F.col("_n").alias("anc"), F.col("_wn").alias("_wp")
            ),
            "anc",
            "left",
        )
        .select(
            "node",
            "anc",
            "d",
            F.when(F.col("settled"), F.lit(0).cast("long"))
            .otherwise(F.col("_wp"))
            .alias("s"),
            "settled",
        )
        .localCheckpoint()
    )
    from pyspark.sql import Observation

    roots = t.filter(F.col("settled")).select(F.col("node").alias("anc"))
    # Per iteration: mark nodes whose anc is already a root as settled,
    # then compose each unsettled node's segment with its ancestor's
    # (the doubling jump). The convergence count rides the SAME
    # checkpoint materialization as an Observation — one job per
    # iteration instead of a separate unsettled-count job + a checkpoint
    # job (the dedup_clusters pattern). On the final pass the jump is an
    # identity on all-settled rows, so fusing it costs nothing and the
    # output rows are unchanged.
    for it in range(max_iterations):
        marked = t.join(
            roots.withColumn("_isroot", F.lit(True)),
            "anc",
            "left",
        ).select(
            "node",
            "anc",
            "d",
            "s",
            (F.col("settled") | F.col("_isroot").isNotNull()).alias(
                "settled"
            ),
        )
        jump = marked.select(
            F.col("node").alias("anc"),
            F.col("anc").alias("_anc2"),
            F.col("d").alias("_d2"),
            F.col("s").alias("_s2"),
        )
        obs = Observation(f"ptr_unsettled_{it}")
        t = (
            marked.join(jump, "anc", "left")
            .select(
                "node",
                F.when(F.col("settled"), F.col("anc"))
                .otherwise(F.col("_anc2"))
                .alias("anc"),
                F.when(F.col("settled"), F.col("d"))
                .otherwise(F.col("d") + F.col("_d2"))
                .alias("d"),
                F.when(F.col("settled"), F.col("s"))
                .otherwise(F.col("s") + F.col("_s2"))
                .alias("s"),
                "settled",
            )
            .observe(obs, F.count_if(~F.col("settled")).alias("unsettled"))
            .localCheckpoint()
        )
        if obs.get["unsettled"] == 0:
            break
    else:
        raise ValueError(
            "path_to_root: chains longer than 2^max_iterations — "
            "the input is not a rooted tree (cycle?)"
        )
    return (
        t.join(w_self, t.node == w_self._n)
        .select(
            F.col("node").alias(id_col),
            F.col("anc").alias("root_id"),
            F.col("d").alias("depth"),
            (F.col("_wn") + F.col("s")).alias("path_w"),
        )
    )


def link_prediction(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    top_k: int = 100,
    max_witness_degree: int = 500,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected canonical
    edge list (``a < b``, distinct): for every NON-adjacent pair
    sharing at least one common neighbor, the common-neighbor count
    and the neighborhood Jaccard cn/(deg_a + deg_b − cn) — the classic
    "parts bought with the same companions but never together yet"
    recommendation primitive. Top ``top_k`` candidates under the total
    order (cn DESC, a, b) — fully deterministic at the limit boundary.

    ``max_witness_degree`` caps which nodes may SERVE AS the common
    neighbor: a hub adjacent to everything witnesses a quadratic
    candidate set while carrying no similarity signal (every pair
    shares it) — the same argument as the stop-term df cap in
    sparse_cosine_pairs. Declared semantics: cn (and therefore
    jaccard) counts only witnesses with degree <= the cap, so reported
    scores are a lower bound on the uncapped values; degrees in the
    denominator stay FULL-graph degrees.

    Scale shape: the wedge self-join is keyed on the witness node and
    its blow-up is sum over witnesses of deg², bounded by the witness
    cap — never global-quadratic; the existing-edge removal is a keyed
    LEFT ANTI join; degree lookups are node-grain equi-joins; the
    top-k is orderBy+limit (TakeOrderedAndProject — per-partition
    heaps, no full sort materialization). jaccard is ONE division of
    exact longs — bit-identical across engines.

    Returns (item_a, item_b, common_neighbors BIGINT, deg_a BIGINT,
    deg_b BIGINT, jaccard DOUBLE).
    """
    # The edge list is referenced (transitively) ~9 times below — stubs
    # twice, the anti-join once, and deg three times with stubs inside it
    # — and callers pass an EXPENSIVE subquery (pair_counts over the
    # fact table). Without a lineage cut every reference replays that
    # whole subtree (measured at sf0.1: 13 parquet scans / ~37 exchanges
    # in one plan); localCheckpoint evaluates it exactly once, the same
    # idiom as triangle_counts' oriented-edge frame. deg is node-grain
    # (two longs per node) and feeds three joins, so it gets its own cut.
    ea = edges.select(
        F.col(a_col).alias("x"), F.col(b_col).alias("y")
    ).localCheckpoint()
    stubs = ea.select(F.col("x").alias("node"), F.col("y").alias("nb")).unionAll(
        ea.select(F.col("y").alias("node"), F.col("x").alias("nb"))
    )
    deg = (
        stubs.groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint()
    )
    witnesses = deg.filter(F.col("deg") <= max_witness_degree).select(
        F.col("node").alias("w")
    )
    adj = stubs.select(F.col("node").alias("w"), F.col("nb")).join(
        witnesses, "w"
    )
    a1 = adj.select("w", F.col("nb").alias("u"))
    a2 = adj.select("w", F.col("nb").alias("v"))
    cand = (
        a1.join(a2, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("cn"))
    )
    non_adjacent = cand.join(
        ea,
        (cand["u"] == ea["x"]) & (cand["v"] == ea["y"]),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_a"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_b"))
    scored = (
        non_adjacent.join(du, "u")
        .join(dv, "v")
        .select(
            F.col("u").alias("item_a"),
            F.col("v").alias("item_b"),
            F.col("cn").alias("common_neighbors"),
            "deg_a",
            "deg_b",
            (
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("common_neighbors").desc(), "item_a", "item_b"
    ).limit(top_k)


def degree_assortativity(
    edges: DataFrame, a_col: str = "item_a", b_col: str = "item_b"
) -> DataFrame:
    """Degree assortativity of an undirected edge list: the Pearson
    correlation of endpoint degrees over all directed edge stubs (each
    undirected edge contributes (d(a),d(b)) AND (d(b),d(a))) — one
    scalar saying whether hubs attach to hubs (r>0, social-network
    shape) or to leaves (r<0, hub-and-spoke shape), the structural
    summary a co-occurrence graph audit reads first.

    r = (m·Σxy − Σx·Σy) / (sqrt(m·Σx² − (Σx)²)·sqrt(m·Σy² − (Σy)²))
    with every sum an exact integer carried as DECIMAL(38,0) — m·Σxy
    overflows BIGINT past ~10⁹ edges with hub degrees, real at 100 TB
    — rendered to DOUBLE through the portable string cast; the final
    expression is one fixed IEEE tree (÷, ×, √ correctly rounded both
    engines).

    Scale shape: degrees come from one stub-grain aggregate; the two
    degree lookups are equi-joins of the edge list against the
    node-grain degree frame; the moment sums are ONE reducing
    aggregate over stub rows. Returns ONE row (n_nodes, n_edges,
    assortativity — NULL for a degree-regular graph, where the
    variance is 0).
    """
    stubs = edges.select(F.col(a_col).alias("node")).unionAll(
        edges.select(F.col(b_col).alias("node"))
    )
    deg = stubs.groupBy("node").agg(
        F.count("*").cast("long").alias("deg")
    )
    da = deg.select(
        F.col("node").alias("_a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("_b"), F.col("deg").alias("deg_b")
    )
    pairs = (
        edges.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .join(da, "_a")
        .join(db, "_b")
    )
    # Symmetrize: each undirected edge contributes both orientations.
    xy = pairs.select(
        F.col("deg_a").alias("x"), F.col("deg_b").alias("y")
    ).unionAll(
        pairs.select(F.col("deg_b").alias("x"), F.col("deg_a").alias("y"))
    )
    d38 = "decimal(38,0)"
    sums = xy.agg(
        F.count("*").cast(d38).alias("m"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
    )
    n_nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    def _dbl(c):
        return c.cast("string").cast("double")
    num = _dbl(F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
    var_x = _dbl(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    var_y = _dbl(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
    den = F.sqrt(var_x) * F.sqrt(var_y)
    return (
        sums.crossJoin(F.broadcast(n_nodes))  # 1-row x 1-row rider
        .select(
            "n_nodes",
            # m counts stubs; undirected edge count is m/2, exact.
            (F.col("m") / F.lit(2)).cast("long").alias("n_edges"),
            F.when(den == 0.0, F.lit(None).cast("double"))
            .otherwise(num / den)
            .alias("assortativity"),
        )
    )


def kcore_peel(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    k: int = 3,
    rounds: int = 8,
) -> DataFrame:
    """k-core decomposition by iterative peeling over an undirected
    edge list (one row per edge, ``a < b``): repeatedly delete nodes
    with degree < ``k`` (and their edges) for a FIXED ``rounds``
    passes, reporting the shrink trajectory — the standard "dense
    cohesive subgraph" extraction (spam/fraud rings, community cores)
    whose fixpoint a bounded unrollable iteration reaches when the
    last round removes nothing.

    Declared semantics: exactly ``rounds`` synchronous peel rounds
    (every round removes ALL currently-under-k nodes at once). The
    output row of the final round equals the true k-core iff the
    trajectory has converged (``edges`` unchanged in the last step) —
    emit enough rounds for your graph's peel depth; convergence is
    visible in the output itself. Deterministic: pure set operations
    on integer keys, no floats, no ordering sensitivity.

    Scale shape: per round ONE endpoint-grain degree aggregation
    (map-side partials over 2|E| rows) + two keyed semi-equi-joins of
    the edge list against the surviving-node set, then an eager
    ``localCheckpoint`` so lineage stays linear in rounds (the
    degree+filter pass reads each edge generation twice). The
    per-round stats are single-row aggregates over the SAME endpoint
    frame (edges = rows/2 — no second scan, no 1-row cross join).
    Returns (round, nodes, edges) — round 0 is the input graph.
    """
    e = edges.select(
        F.col(a).alias("a"), F.col(b).alias("b")
    ).localCheckpoint()

    def _stat(rnd: int, ef: DataFrame) -> DataFrame:
        ends = ef.select(F.col("a").alias("node")).unionAll(
            ef.select(F.col("b").alias("node"))
        )
        return ends.agg(
            F.countDistinct("node").cast("long").alias("nodes"),
            F.expr("count(1) div 2").cast("long").alias("edges"),
        ).select(F.lit(rnd).cast("int").alias("round"), "nodes", "edges")

    stats = [_stat(0, e)]
    for r in range(1, rounds + 1):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        surv = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(surv.select(F.col("node").alias("a")), "a", "semi")
            .join(surv.select(F.col("node").alias("b")), "b", "semi")
            .select("a", "b")
            .localCheckpoint()
        )
        stats.append(_stat(r, e))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


def khop_reachability(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    hops: int = 4,
) -> DataFrame:
    """Hop-by-hop ego-network growth from a DETERMINISTIC hub seed:
    BFS over an undirected edge list (one row per edge, ``a < b``)
    from the maximum-degree node (ties broken by smallest key),
    reporting how many nodes each additional hop reaches — the
    "blast radius" readout behind influence estimation, recall
    expansion, and contamination spread analysis.

    Declared semantics: exactly ``hops`` synchronous frontier
    expansions; ``n_reached`` is cumulative (seed included at hop 0),
    ``n_new`` the freshly discovered nodes. Deterministic: the seed
    is an integer argmax (max degree, min key), every step pure set
    algebra on keys.

    Scale shape: per hop ONE keyed equi-join of the frontier against
    the symmetrized edge list + one distinct + one anti-join against
    the visited set, each eagerly checkpointed so lineage stays
    linear in hops. Frontier and visited frames are node-sized. The
    degree argmax reduces edges to node grain map-side and keeps the
    1-row seed via one reduced-frame window (no collect).
    Returns (hop, n_reached, n_new).
    """
    sym = edges.select(
        F.col(a).alias("s"), F.col(b).alias("d")
    ).unionAll(
        edges.select(F.col(b).alias("s"), F.col(a).alias("d"))
    ).localCheckpoint()
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("dg"))
    w = Window.partitionBy()
    seed = (
        deg.withColumn("_mx", F.max("dg").over(w))
        .filter(F.col("dg") == F.col("_mx"))
        .agg(F.min("s").alias("node"))
        .select("node")
    )
    visited = seed.localCheckpoint()
    frontier = visited
    stats = [
        visited.agg(
            F.count(F.lit(1)).cast("long").alias("n_reached")
        ).select(F.lit(0).cast("int").alias("hop"), "n_reached")
    ]
    for h in range(1, hops + 1):
        neigh = (
            sym.join(frontier, sym["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
        )
        frontier = neigh.join(visited, "node", "anti").localCheckpoint()
        visited = visited.unionAll(frontier).localCheckpoint()
        stats.append(
            visited.agg(
                F.count(F.lit(1)).cast("long").alias("n_reached")
            ).select(F.lit(h).cast("int").alias("hop"), "n_reached")
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    # n_new derives from the cumulative via one lag over the <= hops+1
    # row trajectory frame (no 1-row cross joins)
    wl = Window.orderBy("hop")
    return out.select(
        "hop",
        "n_reached",
        (
            F.col("n_reached")
            - F.coalesce(F.lag("n_reached").over(wl), F.lit(0))
        ).cast("long").alias("n_new"),
    )


def partition_modularity(
    edges: DataFrame,
    membership: DataFrame,
    a: str = "a",
    b: str = "b",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity of a GIVEN node partition over an undirected
    edge list (one row per edge, ``a < b``): per community,
    ``e_c/m − (d_c/(2m))²`` — the within-community edge share minus
    the share expected under degree-preserving random rewiring — and
    the total Q as a rider row (community NULL). Q near 0 = the
    partition explains nothing; toward 1 = strong community
    structure. The evaluation half of community detection: score any
    candidate partition (a catalog attribute, a clustering output)
    without iterating.

    Exactness: m, per-community internal edge counts e_c and degree
    sums d_c are exact integers; each term is a fixed IEEE tree over
    exact-long conversions (one subtraction of two divisions) —
    bit-identical in any engine. Every term is the exact rational
    ``(2·m2·e_c − d_c²) / m2²`` (m2 = 2m): integer numerators over a
    COMMON denominator, so the total Q is one exact DECIMAL(38,0)
    numerator sum and ONE IEEE division — no float accumulation
    order anywhere.

    Scale shape: two keyed joins tag edge endpoints with communities;
    one |communities|-grain reduction for e_c and d_c; the Q rider is
    a running sum over the bounded community frame. Self-loops are
    not expected (a < b input).
    """
    ma = membership.select(
        F.col(node_col).alias("_na"), F.col(community_col).alias("ca")
    )
    mb = membership.select(
        F.col(node_col).alias("_nb"), F.col(community_col).alias("cb")
    )
    tagged = (
        edges.select(F.col(a).alias("_ea"), F.col(b).alias("_eb"))
        .join(ma, F.col("_ea") == F.col("_na"))
        .join(mb, F.col("_eb") == F.col("_nb"))
        .select("ca", "cb")
    )
    wall = Window.partitionBy()
    # degree sum per community: each edge endpoint contributes 1
    deg = (
        tagged.select(F.col("ca").alias("c"))
        .unionAll(tagged.select(F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("d_c"))
    )
    internal = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    per_c = (
        deg.join(internal, "c", "left")
        .select(
            "c",
            F.coalesce("e_c", F.lit(0)).cast("long").alias("e_c"),
            "d_c",
        )
        .withColumn("_m2", F.sum("d_c").over(wall).cast("long"))
    )
    d38 = "decimal(38,0)"
    ec, dc, m2 = F.col("e_c"), F.col("d_c"), F.col("_m2")
    # exact rational: term = (2*m2*e_c - d_c^2) / m2^2  (m2 = 2m), so
    # Q = sum(numerators)/m2^2 — one integer sum, ONE division, no
    # float accumulation order anywhere.
    num = (
        F.lit(2).cast(d38) * m2.cast(d38) * ec.cast(d38)
        - dc.cast(d38) * dc.cast(d38)
    )
    den = m2.cast(d38) * m2.cast(d38)

    def _dbl(c):
        return c.cast("string").cast("double")

    scored = per_c.select(
        F.col("c").cast("string").alias(community_col),
        "e_c",
        "d_c",
        num.alias("_qn"),
        den.alias("_qd"),
    )
    rider = scored.groupBy().agg(
        F.sum("_qn").alias("_qn"), F.max("_qd").alias("_qd")
    ).select(
        F.lit(None).cast("string").alias(community_col),
        F.lit(None).cast("long").alias("e_c"),
        F.lit(None).cast("long").alias("d_c"),
        "_qn",
        "_qd",
    )
    return scored.unionByName(rider).select(
        community_col,
        "e_c",
        "d_c",
        (_dbl(F.col("_qn")) / _dbl(F.col("_qd"))).alias("q_term"),
    )


def global_transitivity(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Global transitivity (clustering coefficient) of an undirected
    graph: ``3·triangles / wedges`` — the fraction of open two-paths
    that close. On a NEAR-DUP pair graph this is the dedup-QA scalar
    that justifies (or indicts) cluster-level dedup: high transitivity
    means near-dup similarity is effectively transitive and connected
    components are safe dedup units; low transitivity means chains of
    pairwise-similar-but-collectively-different docs and CC-level
    dedup over-merges.

    Exactness: wedges = Σ d(d−1)/2 and the triangle total come from
    exact integer aggregates (the per-node triangle counts sum to 3T);
    transitivity = 2·ΣnT / Σd(d−1) is ONE IEEE division of exact
    DECIMAL(38,0) sums. NULL when the graph has no wedge.

    Scale shape: one endpoint-grain degree reduction + the
    degree-oriented triangle join (O(sqrt(E))-bounded wedge sets, see
    :func:`triangle_counts`); the two 1-row aggregates combine via
    union + one max-aggregate — no join of any kind in the combine.
    Returns ONE row (n_nodes, n_edges, n_wedges, n_triangles,
    transitivity).
    """
    d38 = "decimal(38,0)"
    deg = (
        edges.select(F.col(a).alias("node"))
        .unionAll(edges.select(F.col(b).alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d").cast(d38)).alias("_sd"),
        F.sum(F.col("d").cast(d38) * (F.col("d") - 1).cast(d38)).alias(
            "_sdd"
        ),
    ).select("*", F.lit(None).cast(d38).alias("_snt"))
    tri = (
        triangle_counts(edges, a, b)
        .agg(F.sum(F.col("n_triangles").cast(d38)).alias("_snt"))
        .select(
            F.lit(None).cast("long").alias("n_nodes"),
            F.lit(None).cast(d38).alias("_sd"),
            F.lit(None).cast(d38).alias("_sdd"),
            F.coalesce(F.col("_snt"), F.lit(0).cast(d38)).alias("_snt"),
        )
    )
    # combine the two single-row aggregates by union + one max-agg —
    # no join of any kind (a lit-key equi join still plans a BNLJ)
    j = base.unionByName(tri).agg(
        F.max("n_nodes").alias("n_nodes"),
        F.max("_sd").alias("_sd"),
        F.max("_sdd").alias("_sdd"),
        F.max("_snt").alias("_snt"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    return j.select(
        "n_nodes",
        F.expr("_sd div 2").cast("long").alias("n_edges"),
        F.expr("_sdd div 2").cast("long").alias("n_wedges"),
        F.expr("_snt div 3").cast("long").alias("n_triangles"),
        F.when(F.col("_sdd") == 0, F.lit(None).cast("double"))
        .otherwise(
            _dbl(F.lit(2).cast(d38) * F.col("_snt")) / _dbl(F.col("_sdd"))
        )
        .alias("transitivity"),
    )


def degree_distribution(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Degree histogram of a (symmetrized) edge list in power-of-two
    buckets, plus each bucket's share of total incident weight — the
    hub-structure audit that PRECEDES every other graph operator here:
    a heavy tail at high buckets is exactly where a per-node join will
    skew, so this is the "do I need salting / witness caps?" planning
    table (the graph analogue of events_key_skew).

    Bucket = number of binary digits of the degree (1 for degree 1,
    2 for 2-3, 3 for 4-7, ...) — an integer log2 computed PORTABLY as
    ``length(bin(degree))``: no floating log in either engine, so the
    bucketing is bit-exact. All counts/sums exact BIGINTs; shares are
    one division each.

    Scale shape: one node-grain degree aggregation, one bucket-grain
    reduction, a 1-row total window over the BUCKET-grain frame.
    Returns (bucket, min_degree, max_degree, n_nodes, node_share,
    weight_sum, weight_share).
    """
    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum(F.col(weight).cast("long")).alias("wsum"),
    )
    b = deg.select(
        F.length(F.bin(F.col("degree"))).cast("int").alias("bucket"),
        "degree",
        "wsum",
    ).groupBy("bucket").agg(
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("wsum").cast("long").alias("weight_sum"),
    )
    w = Window.partitionBy()
    return b.select(
        "bucket", "min_degree", "max_degree", "n_nodes",
        (
            F.col("n_nodes").cast("double")
            / F.sum("n_nodes").over(w).cast("double")
        ).alias("node_share"),
        "weight_sum",
        (
            F.col("weight_sum").cast("double")
            / F.sum("weight_sum").over(w).cast("double")
        ).alias("weight_share"),
    )
