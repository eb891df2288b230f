"""Embedding similarity-search queries (SURVEY.md §2.10).

The DuckDB oracles reproduce the *same arithmetic* as the Spark operators:
a sequential left-fold dot product in double precision
(Spark ``F.aggregate`` starting at 0.0 ≡ DuckDB ``list_reduce`` — IEEE
addition of identical operands in identical order is bit-identical), so
cosine scores match exactly, not approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.corpus import load_table
from .catalog import query

# DuckDB fragments mirroring operators/similarity.py dot_fold / norm_fold.
_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)


def _cos(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"({_NORM.format(a=a)} * {_NORM.format(a=b)})"
    )


@query(
    "emb_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_cos('q.qv', 'c.embedding')} AS cosine_sim
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    tags=("similarity", "topk", "embedding"),
    bench=True,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for a sampled query set
    (every 50th vector) against the full corpus — broadcast nested loop,
    linear in corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return S.cosine_topk(emb, queries, k=5)


@query(
    "emb_near_dup_pairs",
    oracle=f"""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           {_cos('a.embedding', 'b.embedding')} AS cosine_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos('a.embedding', 'b.embedding')} >= 0.2
    """,
    tags=("similarity", "neardup", "embedding"),
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked embedding near-dup pairs: compare only within a label block
    (the production shape — block key = cluster/LSH bucket), cosine >= 0.2."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(emb, threshold=0.2, block_col="label")


@query(
    "emb_vector_stats",
    oracle=f"""
    WITH s AS (
      SELECT *,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS q8_scale
      FROM embeddings
    ), qz AS (
      SELECT *,
             CASE WHEN q8_scale = 0 THEN
               list_transform(embedding, x -> CAST(0 AS DOUBLE))
             ELSE
               list_transform(embedding, x -> GREATEST(-127.0, LEAST(127.0,
                 FLOOR(CAST(x AS DOUBLE) / q8_scale + 0.5))))
             END AS q8
      FROM s
    ), dq AS (
      SELECT *, list_transform(q8, y -> y * q8_scale) AS dqv FROM qz
    )
    SELECT vec_id,
           list_max(embedding) AS vec_max,
           list_min(embedding) AS vec_min,
           CAST(len(embedding) AS INTEGER) AS dim,
           embedding[1] AS first_val,
           embedding[-1] AS last_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           {_NORM.format(a='embedding')} AS l2_norm,
           q8_scale,
           list_max(list_transform(range(1, len(embedding) + 1),
             i -> abs(CAST(embedding[i] AS DOUBLE) - dqv[i]))) AS q8_max_abs_err,
           CASE WHEN q8_scale = 0 THEN NULL
                ELSE {_cos('embedding', 'dqv')} END AS q8_cos_self,
           label
    FROM dq
    """,
    tags=("array", "scalar", "embedding", "agg", "quantization"),
)
def emb_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over array<float> (max/min/size/element_at
    with 1-based and negative indexes, a lambda filter count), the
    sequential-fold L2 norm, and the int8 quantization round trip
    (operators/similarity.py quantize_int8): per-vector scale, max
    reconstruction error (<= scale/2 by construction), and the
    original-vs-dequantized self-cosine — all Catalyst higher-order
    functions, no UDFs, one per-row pass, every value bit-matched by
    the DuckDB oracle (quantization is deterministic expression
    arithmetic, not a lossy black box)."""
    # _dqv is bound as a named intermediate so the dequantized array is
    # materialized once per row, not re-expanded by each consumer
    # (error, dot, norm) — the same staging trick as text_profile's
    # winnow grams.
    emb = S.quantize_int8(load_table(spark, sf_dir, "embeddings")).withColumn(
        "_dqv", S.dequant(F.col("q8"), F.col("q8_scale"))
    )
    e = F.col("embedding")
    dqv = F.col("_dqv")
    return emb.select(
        "vec_id",
        F.array_max(e).alias("vec_max"),
        F.array_min(e).alias("vec_min"),
        F.size(e).alias("dim"),
        F.element_at(e, 1).alias("first_val"),
        F.element_at(e, -1).alias("last_val"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        S.norm_fold(e).alias("l2_norm"),
        "q8_scale",
        F.array_max(
            F.zip_with(e, dqv, lambda x, y: F.abs(x.cast("double") - y))
        ).alias("q8_max_abs_err"),
        F.when(F.col("q8_scale") == 0.0, F.lit(None).cast("double"))
        .otherwise(
            S.dot_fold(e, dqv) / (S.norm_fold(e) * S.norm_fold(dqv))
        )
        .alias("q8_cos_self"),
        "label",
    )


# Per-method recall floors for emb_ann_topk, set at ~60-70% of the
# recall observed on the synthetic fixtures (sf0.001/sf0.01: srp_lsh
# .14-.16, srp_lsh_mp@p5r2 .78-.80, ivf@nprobe4 .72-.76, int8 .96-.98,
# pq@rerank100 .88) so the booleans are stable under fixture
# regeneration while still failing on a broken index. r6 (verdict task
# 2): ivf multi-cell probing (n_probe 2 -> 4) and the PQ exact-re-rank
# tail lifted those two to >= 0.7 observed, floors 0.5. r7 verdict
# task 3 (closed r8): srp_lsh_mp widened to Hamming radius 2 over 5
# planes (16 of 32 buckets probed = ~2x candidate reduction vs brute
# force; observed .78-.80 vs .42-.46 for the old p4r1) — its floor is
# now 0.5 like every production retrieval path. Single-probe srp_lsh
# stays shipped as an explicitly-tagged EDUCATIONAL BASELINE (the
# textbook one-bucket SRP construction; its floor asserts the bucketing
# works, not production recall — use srp_lsh_mp/ivf/pq to retrieve).
_ANN_RECALL_FLOORS = (
    ("srp_lsh", 0.08),  # baseline tag: see docstring; not a retrieval path
    ("srp_lsh_mp", 0.50),  # radius-2 multi-probe: observed .78-.80
    ("ivf", 0.50),
    ("int8", 0.80),
    ("pq", 0.50),
)


@query(
    "emb_ann_topk",
    oracle="""
    WITH nq AS (SELECT COUNT(*) AS n_queries FROM embeddings
                WHERE vec_id % 50 = 0)
    SELECT m.method, nq.n_queries, CAST(5 AS INTEGER) AS k,
           TRUE AS recall_ok
    FROM (VALUES ('srp_lsh'), ('srp_lsh_mp'), ('ivf'), ('int8'), ('pq')) AS m(method), nq
    """,
    tags=("similarity", "ann", "lsh", "ivf", "kmeans", "recall"),
)
def emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five approximate-nearest-neighbor scale paths, each checked
    in-plan against the exact brute-force top-k:

    - method='srp_lsh': sign-random-projection bucketing (4 planes →
      ~16x candidate reduction), data-independent. EDUCATIONAL
      BASELINE: one-bucket SRP's recall (~0.15 observed) is useless
      for production retrieval — it ships as the reference point the
      multi-probe/IVF/PQ paths are measured against, and its floor
      (0.08) asserts only that the bucketing is not broken;
    - method='srp_lsh_mp': Hamming radius-2 multi-probe over 5 planes
      (probes 16 of 32 buckets = ~2x candidate reduction; observed
      recall@5 ~0.78-0.80, floor 0.5 — a production config);
    - method='ivf': inverted-file index (seeded k-means coarse quantizer
      fit on a deterministic sample, 8 cells, 4 probes — recall ~0.75
      at half the scan of brute force; n_probe is the recall/cost dial
      and at production cell counts (~sqrt(N)) the same probe count is
      a tiny corpus fraction), data-adaptive;
    - method='int8': brute force over the int8-quantized corpus
      (asymmetric distance — 4x less corpus scan I/O, near-exact
      ranking);
    - method='pq': product quantization (8 subspaces x 16 centroids,
      codebooks trained on a deterministic sample, 32x compression) with
      asymmetric-distance scoring against the reconstructed corpus and
      an exact-cosine re-rank of the per-query top-100 shortlist
      (recall ~0.88; the shortlist is O(|Q|) point reads, never a
      second corpus scan).

    Approximate scores are engine-specific, so (the lineitem_flag_stats
    ``approx_parts_ok`` pattern) the checkable contract is the boolean
    ``recall_ok`` = per-method recall@5 against the in-plan exact top-5
    >= a conservative floor — TRUE by definition of a working index on
    the oracle side; every emitted column (method, n_queries, k,
    recall_ok) is deterministic. The full neighbor lists and tighter
    per-method floors are asserted in tests/test_operators.py.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    k = 5
    lsh = S.ann_topk_lsh(emb, queries, k=k, num_planes=4, dim=64, seed=42)
    lsh_mp = S.ann_topk_lsh(
        emb, queries, k=k, num_planes=5, dim=64, seed=42, multiprobe=2
    )
    ivf = S.ivf_topk(emb, queries, k=k, n_cells=8, n_probe=4, seed=42)
    i8 = S.topk_int8(S.quantize_int8(emb), queries, k=k)
    cb = S.pq_train(emb, m=8, k=16, dim=64, seed=42)
    pq = S.pq_topk(S.pq_encode(emb, cb), queries, cb, k=k, rerank=100)
    branches = {
        "srp_lsh": lsh, "srp_lsh_mp": lsh_mp, "ivf": ivf,
        "int8": i8, "pq": pq,
    }
    ann = None
    for name, df in branches.items():
        tagged = df.select(
            F.lit(name).alias("method"), "query_id", "neighbor_id"
        )
        ann = tagged if ann is None else ann.unionByName(tagged)
    exact = S.cosine_topk(emb, queries, k=k).select("query_id", "neighbor_id")
    hits = (
        ann.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("method")
        .agg(F.count("*").alias("_hits"))
    )
    floors = spark.createDataFrame(
        list(_ANN_RECALL_FLOORS), "method string, _floor double"
    )
    # 1-row query-count rider: broadcast cross join, same allowlisted
    # shape as events_key_skew's total-count rider.
    nq = queries.agg(F.count("*").alias("n_queries"))
    return (
        floors.join(hits, "method", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "method",
            "n_queries",
            F.lit(k).cast("int").alias("k"),
            (
                F.coalesce(F.col("_hits"), F.lit(0))
                / (F.col("n_queries") * float(k))
                >= F.col("_floor")
            ).alias("recall_ok"),
        )
    )


@query(
    "emb_cosine_topk_vectorized",
    oracle=None,  # numpy pairwise summation ≠ sequential fold bit-for-bit
    tags=("similarity", "topk", "pandas_udf"),
    bench=True,
)
def emb_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput variant of emb_cosine_topk: Arrow-batched numpy matmul
    via mapInPandas. Same top-k semantics; registered rows-only because
    numpy's pairwise summation differs from the fold in the last ulp.
    Equivalence to the exact variant is asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return S.cosine_topk_pandas(emb, queries, k=5)


@query(
    "emb_contrastive_pairs",
    oracle=f"""
    WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv
               FROM embeddings WHERE vec_id % 50 = 0),
    pos AS (
      SELECT anchor_id, other_id, rnk FROM (
        SELECT q.anchor_id, c.vec_id AS other_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.anchor_id
                 ORDER BY {_cos('q.qv', 'c.embedding')} DESC, c.vec_id
               ) AS rnk
        FROM q JOIN embeddings c ON c.vec_id <> q.anchor_id
      ) WHERE rnk <= 3
    ),
    negcand AS (
      SELECT q.anchor_id, c.vec_id AS other_id,
             md5('neg' || CAST(q.anchor_id AS VARCHAR) || '|'
                 || CAST(c.vec_id AS VARCHAR)) AS hk
      FROM q JOIN embeddings c ON c.vec_id <> q.anchor_id
      WHERE NOT EXISTS (SELECT 1 FROM pos p
                        WHERE p.anchor_id = q.anchor_id
                          AND p.other_id = c.vec_id)
    ),
    neg AS (
      SELECT anchor_id, other_id, rnk FROM (
        SELECT anchor_id, other_id,
               ROW_NUMBER() OVER (PARTITION BY anchor_id
                                  ORDER BY hk, other_id) AS rnk
        FROM negcand
      ) WHERE rnk <= 3
    )
    SELECT anchor_id, other_id, 'pos' AS label, CAST(rnk AS INTEGER) AS rnk
    FROM pos
    UNION ALL
    SELECT anchor_id, other_id, 'neg', CAST(rnk AS INTEGER) FROM neg
    """,
    tags=("similarity", "contrastive", "training-pairs", "embedding"),
    bench=True,
)
def emb_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining
    (operators/similarity.py:contrastive_pairs): per sampled anchor
    (every 50th vector), 3 hard positives by exact cosine + 3
    deterministic hash-sampled negatives (anti-joined against the
    positives, never a collected set). The triples an embedding-model
    contrastive loss trains on, bit-reproducible across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    return S.contrastive_pairs(emb, anchors, k_pos=3, k_neg=3)


@query(
    "emb_matryoshka_audit",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           {_NORM.format(a='embedding')} AS l2_norm,
           CASE WHEN {_NORM.format(a='embedding')} = 0 THEN NULL
                ELSE {_NORM.format(a='embedding[1:len(embedding) // 2]')}
                     / {_NORM.format(a='embedding')}
           END AS half_cos,
           CASE WHEN {_NORM.format(a='embedding')} = 0 THEN NULL
                ELSE {_NORM.format(a='embedding[1:len(embedding) // 4]')}
                     / {_NORM.format(a='embedding')}
           END AS quarter_cos
    FROM embeddings
    """,
    tags=("embedding", "matryoshka", "truncation", "audit"),
)
def emb_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation-readiness audit
    (operators/similarity.py:matryoshka_audit): per vector, the exact
    cosine between the full embedding and its half/quarter prefix
    (= prefix-norm / full-norm — dot(x, pad(p)) = ||p||^2, so one fold
    and one division per readout). Near 1 = truncation-safe MRL-style
    embeddings; ~sqrt(fraction) = mass spread uniformly, truncation
    would cost real recall. Pure per-row map stage, fold-idiom
    oracle-exact."""
    return S.matryoshka_audit(load_table(spark, sf_dir, "embeddings"))


def _pca_oracle(scale: int, cov_scale: int, iterations: int) -> str:
    """Unrolled replay of pca_top_component: quantize, exact integer
    covariance (n·G − s·sᵀ over HUGEINT), max-|cell| renormalization,
    then ``iterations`` MATERIALIZED power-iteration generations."""
    head = f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id, u.i - 1 AS i,
             CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * {float(scale)})
                  AS BIGINT) AS qv
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS u(i)),
    g AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(a.qv AS HUGEINT) * b.qv) AS HUGEINT) AS g
      FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.i >= a.i
      GROUP BY 1, 2),
    s AS (
      SELECT i, CAST(SUM(CAST(qv AS HUGEINT)) AS HUGEINT) AS s,
             CAST(COUNT(*) AS HUGEINT) AS n
      FROM q GROUP BY 1),
    cut AS (
      SELECT g.i, g.j, si.n * g.g - si.s * sj.s AS c
      FROM g JOIN s si ON si.i = g.i JOIN s sj ON sj.i = g.j),
    cov AS (
      SELECT i, j, c FROM cut
      UNION ALL SELECT j, i, c FROM cut WHERE i <> j),
    cm AS (SELECT MAX(abs(c)) AS m FROM cov),
    cn AS MATERIALIZED (
      SELECT i, j,
             CASE WHEN cm.m = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(FLOOR(CAST(CAST(c AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(cm.m AS VARCHAR) AS DOUBLE)
                       * {float(cov_scale)}) AS BIGINT) END AS cq
      FROM cov, cm),
    v0 AS (SELECT DISTINCT i AS dim, CAST({scale} AS BIGINT) AS v
           FROM cn)"""
    steps = []
    for t in range(1, iterations + 1):
        steps.append(f""",
    w{t} AS MATERIALIZED (
      SELECT cn.i AS dim,
             CAST(SUM(CAST(cn.cq AS HUGEINT) * v.v) AS HUGEINT) AS w
      FROM cn JOIN v{t - 1} v ON v.dim = cn.j GROUP BY 1),
    m{t} AS (SELECT MAX(abs(w)) AS m FROM w{t}),
    v{t} AS (
      SELECT w.dim,
             CASE WHEN m.m = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(FLOOR(CAST(CAST(w.w AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(m.m AS VARCHAR) AS DOUBLE)
                       * {float(scale)}) AS BIGINT) END AS v
      FROM w{t} w, m{t} m)""")
    tail = f"""
    SELECT CAST(dim AS INTEGER) AS i, v AS v_scaled,
           CAST(v AS DOUBLE) / {float(scale)} AS loading
    FROM v{iterations}
    """
    return head + "".join(steps) + tail


_PCA_SCALE, _PCA_CSCALE, _PCA_ITERS = 10**6, 10**12, 8


@query(
    "emb_pca_top_component",
    oracle=_pca_oracle(_PCA_SCALE, _PCA_CSCALE, _PCA_ITERS),
    tags=("vectors", "pca", "iterative", "integer-exact"),
)
def emb_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus
    (operators/similarity.py:pca_top_component): micro-unit
    quantization, ONE-pass exact integer covariance (n·G − s·sᵀ in
    DECIMAL(38,0), centering folded in — no mean broadcast, no second
    scan), then 8 quantized power-iteration steps on the d²-cell
    matrix frame. Like the integer PageRank, the whole iteration is
    floating-point-accumulation-free, so the oracle replays it
    bit-for-bit in unrolled SQL. Executor output is d²-bounded
    (≤ 2080 cells) regardless of corpus size."""
    return S.pca_top_component(
        load_table(spark, sf_dir, "embeddings"),
        scale=_PCA_SCALE,
        cov_scale=_PCA_CSCALE,
        iterations=_PCA_ITERS,
    )


@query(
    "emb_fisher_dims",
    oracle="""
    WITH ex AS (
      SELECT (label % 2 = 0) AS cls,
             CAST(gs - 1 AS INTEGER) AS dim,
             CAST(FLOOR(CAST(embedding[gs] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS q
      FROM embeddings,
           LATERAL unnest(generate_series(1, len(embedding))) AS t(gs)
    ),
    per AS (
      SELECT dim,
        CAST(SUM(CASE WHEN cls THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN NOT cls THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        SUM(CASE WHEN cls THEN q END) AS sa,
        SUM(CASE WHEN NOT cls THEN q END) AS sb,
        SUM(CASE WHEN cls THEN CAST(q AS HUGEINT) * q END) AS qa,
        SUM(CASE WHEN NOT cls THEN CAST(q AS HUGEINT) * q END) AS qb
      FROM ex GROUP BY 1
    ),
    scored AS (
      SELECT dim, n_a, n_b,
        CAST(CAST(sa AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE)
          AS mean_a,
        CAST(CAST(sb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE)
          AS mean_b,
        CAST(CAST(qa AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE)
          - (CAST(CAST(sa AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE))
            * (CAST(CAST(sa AS VARCHAR) AS DOUBLE) / CAST(n_a AS DOUBLE))
          AS var_a,
        CAST(CAST(qb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE)
          - (CAST(CAST(sb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE))
            * (CAST(CAST(sb AS VARCHAR) AS DOUBLE) / CAST(n_b AS DOUBLE))
          AS var_b
      FROM per
    ),
    fs AS (
      SELECT dim, n_a, n_b, mean_a, mean_b, var_a, var_b,
        CASE WHEN var_a + var_b = 0 THEN NULL
             ELSE (mean_a - mean_b) * (mean_a - mean_b)
                  / (var_a + var_b) END AS fisher
      FROM scored
    )
    SELECT * FROM (
      SELECT fs.*, CAST(ROW_NUMBER() OVER (
        ORDER BY fisher DESC NULLS LAST, dim) AS INTEGER) AS rnk
      FROM fs)
    WHERE rnk <= 10
    """,
    tags=("similarity", "fisher", "feature-quality", "discriminability"),
)
def emb_fisher_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most class-discriminative embedding dimensions by Fisher
    ratio (operators/similarity.py:fisher_dims): (mean gap)^2 over
    summed within-class variance per coordinate, classes = label
    parity — the feature-quality audit before training a probe on
    pooled embeddings, and the principled basis for a cheap blocking
    key. Values quantized (floor(v * 1e6) — identical IEEE ops both
    engines) so every moment is an exact integer; squared sums carried
    in DECIMAL(38,0)/HUGEINT; the score is one fixed composition of
    divisions. One explode pass, one dim-grain aggregate, one window
    over the 64-row frame."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.fisher_dims(emb, "embedding", "label", top_k=10)


@query(
    "emb_knn_label_agreement",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.query_id, q.ql, c.label AS nl,
             ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY {_cos('q.qv', 'c.embedding')} DESC, c.vec_id)
               AS rnk
      FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    votes AS (
      SELECT query_id, ql, nl, CAST(COUNT(*) AS BIGINT) AS n
      FROM scored WHERE rnk <= 5 GROUP BY 1, 2, 3
    ),
    majority AS (
      SELECT query_id, ql, nl AS pred FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY n DESC, nl ASC) AS vr
        FROM votes) WHERE vr = 1
    )
    SELECT ql AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred = ql THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN pred = ql THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS knn_accuracy
    FROM majority GROUP BY 1
    """,
    tags=("similarity", "knn", "label-quality", "evaluation"),
)
def emb_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label agreement per class: does an
    embedding's neighborhood vote for its own label — the label-noise
    / embedding-quality audit (low agreement for one class means its
    labels or its embeddings are bad) run before anyone trusts the
    space for classification or semantic dedup. Majority vote with a
    deterministic (count DESC, label ASC) tie-break over the exact
    cosine top-5 (same broadcast-bounded query-sample contract as
    emb_cosine_topk); counts exact, accuracy one division."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    top = S.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    lbl = emb.select("vec_id", "label")
    votes = (
        top.join(
            lbl.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nl"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nl")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql import Window

    wv = Window.partitionBy("query_id").orderBy(
        F.col("n").desc(), F.col("nl").asc()
    )
    majority = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("nl").alias("pred"))
    )
    own = lbl.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("ql")
    )
    j = majority.join(own, "query_id")
    correct = F.when(F.col("pred") == F.col("ql"), 1).otherwise(0)
    return j.groupBy(F.col("ql").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(correct).cast("long").alias("n_correct"),
        (
            F.sum(correct).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("knn_accuracy"),
    )


@query(
    "emb_hubness_audit",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY {_cos('q.embedding', 'c.embedding')} DESC,
                        c.vec_id) AS rnk
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id),
    occ AS (
      SELECT neighbor_id AS vec_id, CAST(COUNT(*) AS BIGINT) AS k_occ
      FROM scored WHERE rnk <= 5 GROUP BY 1),
    pv AS (
      SELECT e.vec_id, COALESCE(o.k_occ, 0) AS k_occ
      FROM embeddings e LEFT JOIN occ o USING (vec_id)),
    hist AS (
      SELECT k_occ, CAST(COUNT(*) AS BIGINT) AS n_vectors
      FROM pv GROUP BY 1)
    SELECT k_occ, n_vectors,
           CAST(n_vectors AS DOUBLE)
             / CAST(SUM(n_vectors) OVER () AS DOUBLE) AS share,
           CAST(SUM(n_vectors) OVER (ORDER BY k_occ
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(SUM(n_vectors) OVER () AS DOUBLE) AS cum_share
    FROM hist
    """,
    tags=("similarity", "hubness", "ann-quality", "audit"),
)
def emb_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-occurrence (hubness) audit of the exact cosine 5-NN graph:
    for every vector, how many OTHER vectors' top-5 lists it appears
    in, reported as the k-occurrence histogram with shares and the
    cumulative curve. Hubness is the classic high-dimensional ANN
    pathology — a few "hub" points dominate neighbor lists while
    antihubs (k_occ = 0) never get retrieved — and this distribution
    is the accepted way to detect it before trusting kNN-based
    dedup/labeling (a long tail here says cosine kNN needs local
    scaling or the embedder needs work). Same broadcast-query
    contract as emb_cosine_topk with queries = the AUDIT SAMPLE
    (here the whole fixture corpus; at 100 TB a bounded uniform
    sample or one IVF cell at a time — the query side must fit a
    broadcast by contract). Scoring is shuffle-free; the only
    exchanges are the per-query top-k window and two enum-bounded
    histogram aggregates; zeros come from a left join back to the
    corpus ids, never a dense grid."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    topk = S.cosine_topk(emb, emb, k=5)
    occ = topk.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("long").alias("k_occ")
    )
    pv = (
        emb.select("vec_id")
        .join(occ, "vec_id", "left")
        .select(F.coalesce("k_occ", F.lit(0)).cast("long").alias("k_occ"))
    )
    hist = pv.groupBy("k_occ").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("k_occ").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "k_occ",
        "n_vectors",
        (
            F.col("n_vectors").cast("double")
            / F.sum("n_vectors").over(w_all).cast("double")
        ).alias("share"),
        (
            F.sum("n_vectors").over(w_cum).cast("double")
            / F.sum("n_vectors").over(w_all).cast("double")
        ).alias("cum_share"),
    )


@query(
    "emb_cosine_histogram",
    oracle=f"""
    WITH pairs AS (
      SELECT CAST(FLOOR({_cos('a.embedding', 'b.embedding')} / 0.05
                  ) AS BIGINT) AS bucket
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
    hist AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1)
    SELECT bucket,
           CAST(bucket AS DOUBLE) * 0.05 AS bucket_lo,
           n_pairs,
           CAST(n_pairs AS DOUBLE)
             / CAST(SUM(n_pairs) OVER () AS DOUBLE) AS share,
           CAST(SUM(n_pairs) OVER (ORDER BY bucket
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(SUM(n_pairs) OVER () AS DOUBLE) AS cum_share
    FROM hist
    """,
    tags=("similarity", "histogram", "threshold-planning", "audit"),
)
def emb_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution histogram (0.05-wide buckets with
    shares and the cumulative curve) — the empirical curve that PRICES
    a semantic-dedup threshold before running it (the dense-embedding
    sibling of doc_jaccard_histogram: pick the threshold at the
    distribution's antimode, and read how many pairs a 0.05 shift
    adds). Same audit-sample contract as emb_cosine_topk / the
    hubness audit: the pair scoring is a broadcast loop over the
    BOUNDED sample (the fixture corpus here; a uniform sample or one
    IVF cell at 100 TB). Bucket ids floor a bit-identical IEEE score
    (floor, never integer div — scores go negative); everything after
    the scoring pass is a bounded histogram with exact counts and
    single divisions."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per VECTOR, not per pair (the cosine_topk staging):
    # the pair loop then runs one fold instead of three.
    # The stream side is conditionally _spread: a single-split
    # embeddings scan otherwise runs the ENTIRE O(n^2) pair fold in one
    # task (measured 12.4 s single-core of a 13.3 s query at sf0.1); an
    # already-parallel scan passes through untouched.
    from ..operators.dedup import _spread

    a = _spread(emb).select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("va"),
        S.norm_fold(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("vb"),
        S.norm_fold(F.col("embedding")).alias("nb"),
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.floor(
                (
                    S.dot_fold(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb"))
                )
                / F.lit(0.05)
            )
            .cast("long")
            .alias("bucket")
        )
    )
    hist = pairs.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "bucket",
        (F.col("bucket").cast("double") * F.lit(0.05)).alias("bucket_lo"),
        "n_pairs",
        (
            F.col("n_pairs").cast("double")
            / F.sum("n_pairs").over(w_all).cast("double")
        ).alias("share"),
        (
            F.sum("n_pairs").over(w_cum).cast("double")
            / F.sum("n_pairs").over(w_all).cast("double")
        ).alias("cum_share"),
    )


# Per-depth recall floors for emb_ivf_nprobe_curve, pinned at ~60% of
# the recall observed on the synthetic fixtures (sf0.001/sf0.01:
# n_probe=1 .38-.50, =2 .64, =4 .88-.90, =8 exactly 1.0 — probing all
# 8 cells IS brute force, so the last point is an exact anchor, not a
# statistical floor).
_IVF_CURVE_FLOORS = ((1, 0.20), (2, 0.40), (4, 0.50), (8, 0.999))


@query(
    "emb_ivf_nprobe_curve",
    oracle="""
    WITH nq AS (SELECT COUNT(*) AS n_queries FROM embeddings
                WHERE vec_id % 50 = 0)
    SELECT CAST(p.n_probe AS INTEGER) AS n_probe, nq.n_queries,
           CAST(5 AS INTEGER) AS k,
           (p.n_probe = 8) AS exhaustive,
           TRUE AS recall_ok, TRUE AS monotone_ok
    FROM (VALUES (1), (2), (4), (8)) AS p(n_probe), nq
    """,
    tags=("similarity", "ann", "ivf", "recall", "tuning"),
)
def emb_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall-vs-n_probe sensitivity curve
    (operators/similarity.py:ivf_nprobe_curve) — the probe-count tuning
    table an ANN deployment reads before spending 100 TB of scan budget:
    recall@5 against the in-plan exact top-5 at probe depths 1/2/4/8
    from ONE index fit and ONE corpus-cells join (each candidate pair
    carries the depth at which its cell enters, so depth-p results are
    a filter, not a re-run). Depth 8 probes all 8 cells — brute force —
    so its recall is exactly 1.0 by construction, an anchor the floor
    pins at 0.999; the curve's monotonicity (deeper probing can only
    add candidates, hence hits) is emitted as a checked boolean.
    Approximate recall values are engine-specific (the emb_ann_topk /
    approx_parts_ok pattern), so the oracle-checked contract is the
    boolean columns plus the deterministic enum grid; observed-recall
    floors and the exact exhaustive anchor are additionally asserted in
    tests/test_r10_operators.py."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    k = 5
    pairs = S.ivf_nprobe_curve(emb, queries, k=k, n_cells=8, seed=42)
    hits = pairs.groupBy("n_probe").agg(
        F.sum(F.col("hit").cast("bigint")).alias("_hits")
    )
    floors = spark.createDataFrame(
        [(int(p), float(f)) for p, f in _IVF_CURVE_FLOORS],
        "n_probe int, _floor double",
    )
    nq = queries.agg(F.count("*").alias("n_queries"))
    w = Window.orderBy("n_probe")
    scored = (
        floors.join(hits, "n_probe", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "n_probe",
            "n_queries",
            F.lit(k).cast("int").alias("k"),
            (F.col("n_probe") == 8).alias("exhaustive"),
            (
                F.coalesce(F.col("_hits"), F.lit(0))
                / (F.col("n_queries") * float(k))
            ).alias("_recall"),
            F.col("_floor"),
        )
    )
    return scored.select(
        "n_probe",
        "n_queries",
        "k",
        "exhaustive",
        (F.col("_recall") >= F.col("_floor")).alias("recall_ok"),
        F.coalesce(
            F.col("_recall") >= F.lag("_recall").over(w), F.lit(True)
        ).alias("monotone_ok"),
    )


@query(
    "emb_pq_distortion_audit",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id,
             CASE WHEN sc = 0 THEN
               list_transform(embedding, x -> CAST(0 AS BIGINT))
             ELSE
               list_transform(embedding, x -> CAST(GREATEST(-127.0,
                 LEAST(127.0, FLOOR(CAST(x AS DOUBLE) / sc + 0.5)))
                 AS BIGINT))
             END AS q
      FROM s
    ),
    init AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, q AS cq
      FROM (SELECT * FROM qz ORDER BY vec_id LIMIT 16)
    ),
    g AS (SELECT unnest(range(0, 8)) AS j),
    sub AS (
      SELECT vec_id, j, q[j*8+1 : j*8+8] AS sv FROM qz CROSS JOIN g
    ),
    isub AS (
      SELECT c, j, cq[j*8+1 : j*8+8] AS csv FROM init CROSS JOIN g
    ),
    d2 AS (
      SELECT sub.vec_id, sub.j, isub.c, sub.sv,
             CAST(list_sum(list_transform(range(1, 9),
               i -> (sub.sv[i] - isub.csv[i])
                    * (sub.sv[i] - isub.csv[i]))) AS BIGINT) AS dist2
      FROM sub JOIN isub ON sub.j = isub.j
    ),
    a AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                     ORDER BY dist2, c) AS rn
        FROM d2) WHERE rn = 1
    ),
    dims AS (
      SELECT vec_id, j, c, dist2, i AS pos, sv[i] AS val
      FROM a CROSS JOIN (SELECT unnest(range(1, 9)) AS i) p
    ),
    cent AS (
      SELECT j, c, pos,
             (CAST(SUM(val) AS BIGINT)
              - ((CAST(SUM(val) AS BIGINT) % COUNT(*)) + COUNT(*))
                % COUNT(*))
             // COUNT(*) AS fd
      FROM dims GROUP BY 1, 2, 3
    ),
    err AS (
      SELECT d.j, d.vec_id,
             CAST(SUM((d.val - cent.fd) * (d.val - cent.fd))
                  AS BIGINT) AS e2,
             MAX(d.dist2) AS d2i
      FROM dims d JOIN cent ON d.j = cent.j AND d.c = cent.c
                           AND d.pos = cent.pos
      GROUP BY 1, 2
    )
    SELECT CAST(j AS INTEGER) AS subspace,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(d2i) AS BIGINT) AS sq_err_init,
           CAST(SUM(e2) AS BIGINT) AS sq_err_retrained,
           CAST(CAST(SUM(d2i) AS BIGINT) AS DOUBLE) / COUNT(*)
             AS distortion_init,
           CAST(CAST(SUM(e2) AS BIGINT) AS DOUBLE) / COUNT(*)
             AS distortion_retrained,
           (CAST(SUM(e2) AS BIGINT) <= CAST(SUM(d2i) AS BIGINT))
             AS improved
    FROM err GROUP BY j
    """,
    tags=("similarity", "pq", "quantization", "distortion", "audit"),
    bench=True,  # frozen headline set v2 (r11)
)
def emb_pq_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook distortion audit under an INTEGER-EXACT retrain
    (operators/similarity.py:pq_retrain_int_exact) — per subspace, the
    exact squared reconstruction error of the deterministic seed
    codebook (the 16 smallest-id vectors' int8 subvectors) and of one
    floored-integer-mean Lloyd refinement under the same assignment.
    The float pq_train codebooks are driver-side numpy (their oracle
    class would need baked literals — capped at 1 and not grown);
    making every training quantity an exact BIGINT instead makes the
    WHOLE audit independently SQL-derivable: the DuckDB oracle
    re-derives the int8 quantization, seed pick, integer-distance
    assignment (ties to the lower centroid index), floored means
    ((s - pmod) so truncating and flooring division agree), and both
    error sums from the raw parquet — every column hash-checked, no
    recall booleans needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_retrain_int_exact(emb, m=8, d=8, k_init=16)


@query(
    "emb_ivfpq_adc_recall",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id,
             CASE WHEN sc = 0 THEN
               list_transform(embedding, x -> CAST(0 AS BIGINT))
             ELSE
               list_transform(embedding, x -> CAST(GREATEST(-127.0,
                 LEAST(127.0, FLOOR(CAST(x AS DOUBLE) / sc + 0.5)))
                 AS BIGINT))
             END AS q
      FROM s
    ),
    coarse AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, q AS cq
      FROM (SELECT * FROM qz ORDER BY vec_id LIMIT 8)
    ),
    ad AS (
      SELECT qz.vec_id, qz.q, coarse.c, coarse.cq,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (qz.q[i] - coarse.cq[i]) * (qz.q[i] - coarse.cq[i])))
               AS BIGINT) AS dist2
      FROM qz CROSS JOIN coarse
    ),
    asg AS (
      SELECT vec_id, q, c AS cell,
             list_transform(range(1, 65), i -> q[i] - cq[i]) AS r
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist2, c) AS rn
            FROM ad)
      WHERE rn = 1
    ),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, r AS sr
      FROM (SELECT * FROM asg ORDER BY vec_id LIMIT 32)
    ),
    g AS (SELECT unnest(range(0, 16)) AS j),
    ssub AS (
      SELECT code, j, sr[j*4+1 : j*4+4] AS csv FROM seeds CROSS JOIN g
    ),
    rsub AS (
      SELECT vec_id, j, r[j*4+1 : j*4+4] AS sv FROM asg CROSS JOIN g
    ),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT rsub.vec_id, rsub.j, ssub.code,
               ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.j
                 ORDER BY CAST(list_sum(list_transform(range(1, 5),
                   i -> (rsub.sv[i] - ssub.csv[i])
                        * (rsub.sv[i] - ssub.csv[i]))) AS BIGINT),
                 ssub.code) AS rn
        FROM rsub JOIN ssub ON rsub.j = ssub.j)
      WHERE rn = 1
    ),
    queries AS (
      SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id % 25 = 0
    ),
    qp AS (
      SELECT query_id, qq, c, cq,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (qq[i] - cq[i]) * (qq[i] - cq[i]))) AS BIGINT)
               AS dist2
      FROM queries CROSS JOIN coarse
    ),
    qprobe AS (
      SELECT query_id, c AS cell,
             list_transform(range(1, 65), i -> qq[i] - cq[i]) AS qr
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY dist2, c) AS rn
            FROM qp)
      WHERE rn <= 4
    ),
    qrsub AS (
      SELECT query_id, cell, j, qr[j*4+1 : j*4+4] AS sv
      FROM qprobe CROSS JOIN g
    ),
    lut AS (
      SELECT query_id, cell, qrsub.j, ssub.code,
             CAST(list_sum(list_transform(range(1, 5),
               i -> (qrsub.sv[i] - ssub.csv[i])
                    * (qrsub.sv[i] - ssub.csv[i]))) AS BIGINT) AS d2
      FROM qrsub JOIN ssub ON qrsub.j = ssub.j
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, p.cell
      FROM qprobe p JOIN asg a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id, c.cell,
             CAST(SUM(l.d2) AS BIGINT) AS adc_dist
      FROM cand c
      JOIN enc e ON e.vec_id = c.neighbor_id
      JOIN lut l ON l.query_id = c.query_id AND l.cell = c.cell
                AND l.j = e.j AND l.code = e.code
      GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adc_dist, neighbor_id) AS rnk
        FROM adc) WHERE rnk <= 5
    ),
    exact AS (
      SELECT query_id, _nid FROM (
        SELECT q.query_id, z.vec_id AS _nid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qq[i] - z.q[i]) * (q.qq[i] - z.q[i])))
                   AS BIGINT), z.vec_id) AS rn
        FROM queries q CROSS JOIN qz z WHERE z.vec_id <> q.query_id)
      WHERE rn <= 5
    )
    SELECT t.query_id, CAST(t.rnk AS INTEGER) AS rank, t.neighbor_id,
           CAST(t.cell AS INTEGER) AS cell, t.adc_dist,
           CAST(list_sum(list_transform(range(1, 65),
             i -> (q.qq[i] - z.q[i]) * (q.qq[i] - z.q[i]))) AS BIGINT)
             AS exact_dist,
           e._nid IS NOT NULL AS hit
    FROM top t
    JOIN queries q ON q.query_id = t.query_id
    JOIN qz z ON z.vec_id = t.neighbor_id
    LEFT JOIN exact e ON e.query_id = t.query_id
                     AND e._nid = t.neighbor_id
    """,
    tags=("similarity", "ann", "ivf", "pq", "adc", "recall"),
)
def emb_ivfpq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search with asymmetric distance computation, INTEGER-
    EXACT end to end (operators/similarity.py:ivfpq_adc_topk) — the
    production ANN composition the separately-audited pieces build
    toward: IVF coarse routing (emb_ivf_nprobe_curve's float path)
    over residual PQ codes (emb_pq_distortion_audit's codebook-quality
    leg), scored by per-query (cell, subspace, code) lookup tables.
    Every training quantity lives in the int8 lattice (deterministic
    seed centroids and codebooks from smallest-id vectors, integer
    argmin assignments with pinned tie-breaks), so the DuckDB oracle
    re-derives the ENTIRE index — quantization, cell assignment,
    residuals, codebooks, codes, probe sets, ADC sums, the exact
    brute-force baseline — from the raw parquet and every output
    column is hash-checked: (query_id, rank, neighbor_id, cell,
    adc_dist, exact_dist, hit). No recall floors needed; the hit
    column IS the recall evidence at row grain."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivfpq_adc_topk(
        emb, n_cells=8, m=16, d=4, k_pq=32, n_probe=4, k=5, query_mod=25
    )


@query(
    "emb_ivfpq_rerank_recall",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS sc
      FROM embeddings
    ),
    qz AS (
      SELECT vec_id,
             CASE WHEN sc = 0 THEN
               list_transform(embedding, x -> CAST(0 AS BIGINT))
             ELSE
               list_transform(embedding, x -> CAST(GREATEST(-127.0,
                 LEAST(127.0, FLOOR(CAST(x AS DOUBLE) / sc + 0.5)))
                 AS BIGINT))
             END AS q
      FROM s
    ),
    coarse AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, q AS cq
      FROM (SELECT * FROM qz ORDER BY vec_id LIMIT 8)
    ),
    ad AS (
      SELECT qz.vec_id, qz.q, coarse.c, coarse.cq,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (qz.q[i] - coarse.cq[i]) * (qz.q[i] - coarse.cq[i])))
               AS BIGINT) AS dist2
      FROM qz CROSS JOIN coarse
    ),
    asg AS (
      SELECT vec_id, q, c AS cell,
             list_transform(range(1, 65), i -> q[i] - cq[i]) AS r
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist2, c) AS rn
            FROM ad)
      WHERE rn = 1
    ),
    seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, r AS sr
      FROM (SELECT * FROM asg ORDER BY vec_id LIMIT 32)
    ),
    g AS (SELECT unnest(range(0, 16)) AS j),
    ssub AS (
      SELECT code, j, sr[j*4+1 : j*4+4] AS csv FROM seeds CROSS JOIN g
    ),
    rsub AS (
      SELECT vec_id, j, r[j*4+1 : j*4+4] AS sv FROM asg CROSS JOIN g
    ),
    enc AS (
      SELECT vec_id, j, code FROM (
        SELECT rsub.vec_id, rsub.j, ssub.code,
               ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.j
                 ORDER BY CAST(list_sum(list_transform(range(1, 5),
                   i -> (rsub.sv[i] - ssub.csv[i])
                        * (rsub.sv[i] - ssub.csv[i]))) AS BIGINT),
                 ssub.code) AS rn
        FROM rsub JOIN ssub ON rsub.j = ssub.j)
      WHERE rn = 1
    ),
    queries AS (
      SELECT vec_id AS query_id, q AS qq FROM qz WHERE vec_id % 25 = 0
    ),
    qp AS (
      SELECT query_id, qq, c, cq,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (qq[i] - cq[i]) * (qq[i] - cq[i]))) AS BIGINT)
               AS dist2
      FROM queries CROSS JOIN coarse
    ),
    qprobe AS (
      SELECT query_id, c AS cell,
             list_transform(range(1, 65), i -> qq[i] - cq[i]) AS qr
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY dist2, c) AS rn
            FROM qp)
      WHERE rn <= 4
    ),
    qrsub AS (
      SELECT query_id, cell, j, qr[j*4+1 : j*4+4] AS sv
      FROM qprobe CROSS JOIN g
    ),
    lut AS (
      SELECT query_id, cell, qrsub.j, ssub.code,
             CAST(list_sum(list_transform(range(1, 5),
               i -> (qrsub.sv[i] - ssub.csv[i])
                    * (qrsub.sv[i] - ssub.csv[i]))) AS BIGINT) AS d2
      FROM qrsub JOIN ssub ON qrsub.j = ssub.j
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, p.cell
      FROM qprobe p JOIN asg a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id, c.cell,
             CAST(SUM(l.d2) AS BIGINT) AS adc_dist
      FROM cand c
      JOIN enc e ON e.vec_id = c.neighbor_id
      JOIN lut l ON l.query_id = c.query_id AND l.cell = c.cell
                AND l.j = e.j AND l.code = e.code
      GROUP BY 1, 2, 3
    ),
short AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adc_dist, neighbor_id) AS adc_rank
        FROM adc) WHERE adc_rank <= 20
    ),
    rr AS (
      SELECT sh.query_id, sh.neighbor_id, sh.cell, sh.adc_dist,
             CAST(sh.adc_rank AS INTEGER) AS adc_rank,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (q.qq[i] - z.q[i]) * (q.qq[i] - z.q[i])))
               AS BIGINT) AS exact_dist
      FROM short sh
      JOIN queries q ON q.query_id = sh.query_id
      JOIN qz z ON z.vec_id = sh.neighbor_id
    ),
    top AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY exact_dist, neighbor_id) AS rnk
        FROM rr) WHERE rnk <= 5
    ),
    exact AS (
      SELECT query_id, _nid FROM (
        SELECT q.query_id, z.vec_id AS _nid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qq[i] - z.q[i]) * (q.qq[i] - z.q[i])))
                   AS BIGINT), z.vec_id) AS rn
        FROM queries q CROSS JOIN qz z WHERE z.vec_id <> q.query_id)
      WHERE rn <= 5
    )
    SELECT t.query_id, CAST(t.rnk AS INTEGER) AS rank, t.neighbor_id,
           CAST(t.cell AS INTEGER) AS cell, t.adc_dist, t.adc_rank,
           t.exact_dist,
           e._nid IS NOT NULL AS hit
    FROM top t
    LEFT JOIN exact e ON e.query_id = t.query_id
                     AND e._nid = t.neighbor_id
    """,
    tags=("similarity", "ann", "ivf", "pq", "rerank", "recall"),
)
def emb_ivfpq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact re-ranking — the production refinement knob on
    emb_ivfpq_adc_recall: the ADC shortlist of the 20 best candidates
    per query is RESCORED by exact full-dimension int8 L2 and the
    final top-5 comes from that exact distance, so recall depends only
    on true neighbors REACHING the shortlist (IVF routing + coarse ADC
    ordering), not on the product quantizer distinguishing them at the
    last ulp. adc_rank is kept per survivor as evidence of where it
    sat before refinement. Same integer-exact lattice end to end, so
    the DuckDB oracle re-derives the whole pipeline including the
    rescoring join and every column is hash-checked; compared against
    the ADC-only entry this measures the recall recovered per unit of
    rescoring work (20 exact distances per query vs a full scan).
    Scale: identical index-side plan to the ADC entry (shared
    operator; cached frames) plus ONE more keyed join over the
    query x 20 shortlist — constant per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivfpq_adc_topk(
        emb, n_cells=8, m=16, d=4, k_pq=32, n_probe=4, k=5,
        query_mod=25, rerank_r=20,
    )
