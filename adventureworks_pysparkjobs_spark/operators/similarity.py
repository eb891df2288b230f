"""Embedding similarity-search operators (north-star extension,
SURVEY.md §2.10): brute-force cosine top-k as the exact baseline, a
bucketed random-projection LSH as the approximate scale path, and a
vectorized Pandas-UDF scorer for throughput.

Scale design: similarity search is never all-pairs. The query set is small
relative to the corpus (broadcast it); the corpus side streams. Brute force
is O(|Q| x N) with a broadcast join — linear in the corpus, embarrassingly
parallel. The LSH variant first buckets both sides by sign-random-projection
so each corpus row only scores against queries sharing a bucket.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# One _spread for the whole engine (ADVICE r11: this module's local
# copy was still an unconditional repartition while dedup.py's had gone
# scale-adaptive — same name, different behavior). The conditional
# version no-ops when the scan already lists >= parallelism input files
# (the 100 TB layout), so e.g. ivf_topk's bounded-sample fit no longer
# pays a corpus-wide shuffle at real scale; on few-file local fixtures
# it degenerates to the same unconditional repartition as before.
from .dedup import _spread  # noqa: E402  (re-export for call sites below)


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float> columns in double
    precision. The fold visits indexes in order, making the result
    bit-deterministic regardless of partitioning (and reproducible in any
    engine that folds lists sequentially)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_fold(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (norm_fold(a) * norm_fold(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the query set against the
    corpus, score every (query, corpus) pair, keep k per query via a
    row_number window with a unique (score desc, id) tie-break.

    Shuffle profile: zero shuffles for scoring (broadcast nested loop),
    one shuffle on query_id for the top-k window — the window input is
    already reduced to |Q| x N rows of (id, id, score).
    """
    # Norms are computed once per vector on each side (not per pair):
    # the pair loop then runs a single fold (the dot product) instead of
    # three — same arithmetic, same result, 3x less higher-order-function
    # evaluation.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fold(F.col(vec_col)).alias("q_norm"),
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fold(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fold(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    ``block_col`` restricts comparisons to rows sharing a blocking key
    (e.g. a cluster/label id, an LSH bucket): the join is equi on the block
    key, so cost is the sum of squared block sizes — the declared semantic
    is "near-dups within a block", which is how 100 TB dedup actually runs.
    ``block_col=None`` is the exact-but-quadratic variant for small inputs.
    """
    a = _spread(df).select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        norm_fold(F.col(vec_col)).alias("n1"),
        *([F.col(block_col).alias("bk1")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        norm_fold(F.col(vec_col)).alias("n2"),
        *([F.col(block_col).alias("bk2")] if block_col else []),
    )
    cond = F.col("id1") < F.col("id2")
    if block_col:
        joined = a.join(b, (F.col("bk1") == F.col("bk2")) & cond)
    else:
        joined = a.crossJoin(b).filter(cond)
    sim = dot_fold(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    return joined.select("id1", "id2", sim.alias("cosine_sim")).filter(
        F.col("cosine_sim") >= threshold
    )


def srp_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection LSH bucket id: one bit per hyperplane —
    bit_i = [dot(vec, plane_i) >= 0] — packed into an int. Deterministic
    given fixed planes (callers pass seeded-pseudorandom planes)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec_col,
                # one array literal per plane (a single py4j call), not
                # one F.lit call per coordinate — builder-time chatter,
                # identical plan values
                F.lit([float(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def make_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Seeded pseudorandom hyperplanes (numpy RNG on the driver; the planes
    are tiny constants baked into the plan, not data)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool | int = False,
) -> DataFrame:
    """Approximate top-k: score only (query, corpus) pairs in the same
    sign-random-projection bucket. With p planes, expected candidate count
    is N / 2^p per query times the angular-collision factor — the knob that
    turns O(|Q| x N) into O(|Q| x N / 2^p) at some recall cost.

    ``multiprobe`` is the Hamming probe radius (bool kept for compat:
    True == 1): radius r additionally probes every bucket within r sign
    -bit flips of the query's — a true neighbor lost to up to r marginal
    hyperplane crossings is recovered. Candidate width grows by
    sum_{j<=r} C(p, j) probed buckets of the 2^p total; the radius is
    the standard multi-probe recall/cost dial (r=2 at p=5 probes 16 of
    32 buckets for ~0.7 observed recall@5 on the fixtures — half the
    scan of brute force; see queries/vectors.py:emb_ann_topk). Only the
    (tiny) query side fans out; the corpus is never re-bucketed."""
    from itertools import combinations

    planes = make_planes(num_planes, dim, seed)
    base_bucket = srp_bucket(F.col(vec_col), planes)
    radius = int(multiprobe)
    if radius > 0:
        masks = [
            sum(1 << i for i in combo)
            for r in range(1, radius + 1)
            for combo in combinations(range(num_planes), r)
        ]
        probe_buckets = F.array(
            base_bucket,
            *[base_bucket.bitwiseXOR(F.lit(m)) for m in masks],
        )
        bucket_expr = F.explode(probe_buckets).alias("bucket")
    else:
        bucket_expr = base_bucket.alias("bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fold(F.col(vec_col)).alias("q_norm"),
        bucket_expr,
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fold(F.col(vec_col)).alias("c_norm"),
        srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fold(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput variant of cosine_topk: numpy blocked matrix multiply via
    mapInPandas. The (small) query matrix is captured in the closure and
    shipped once per task; each Arrow batch of corpus vectors is scored as
    one dense matmul — the hot path never leaves vectorized numpy.

    Not oracle-comparable bit-for-bit with the fold variant (numpy uses
    pairwise summation), hence registered rows-only in the catalog.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()  # |Q| is small by contract
    q_ids = np.array([r[id_col] for r in qrows])
    q_mat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ q_mat.T  # (batch, |Q|)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, len(ids)),
                    "neighbor_id": np.tile(ids, len(q_ids)),
                    "cosine_sim": sims.T.ravel(),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float = 0.5,
    max_fit_rows: int = 100_000,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split each vector into ``m``
    subvectors of ``dim//m`` dims and fit ``k`` centroids per subspace
    (seeded Lloyd's iterations over a deterministic hash sample pulled to
    the driver — PQ training is a tiny-sample, tiny-model fit by design,
    exactly FAISS's contract; the driver pull is bounded by
    ``max_fit_rows``). Returns ``codebooks[j][c] = centroid`` as plain
    floats, small enough (m*k*dim/m = k*dim values) to bake into plans
    as literals.
    """
    import numpy as np

    from .sampling import deterministic_sample

    assert dim % m == 0, "dim must divide into m subspaces"
    src = corpus
    if fit_fraction < 1.0:
        src = deterministic_sample(corpus, id_col, fit_fraction, salt="pq")
    # Order-pinned bounded sample (ADVICE r11): a bare limit() takes a
    # partition-layout-dependent prefix — centroids would differ across
    # partitionings and an id-sorted layout would bias the fit set.
    # Ordering by a hash of the id gives a deterministic, unbiased
    # subsample; orderBy+limit plans as TakeOrderedAndProject (top-K
    # merge, no global sort materialization).
    rows = (
        src.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(max_fit_rows)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty fit sample — nothing to train on")
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    d = dim // m
    rng = np.random.default_rng(seed)
    codebooks = []
    for j in range(m):
        sub = x[:, j * d : (j + 1) * d]
        cent = sub[rng.choice(len(sub), size=k, replace=len(sub) < k)]
        for _ in range(iters):
            # Lloyd's: assign to nearest centroid, recompute means.
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        codebooks.append([[float(v) for v in c] for c in cent])
    return codebooks


def _pq_codebook_lit(codebooks: list[list[list[float]]]) -> Column:
    # one nested array literal (a single py4j call) instead of one
    # F.lit call per codebook value — builder-time chatter only,
    # identical plan values
    return F.lit([[list(map(float, c)) for c in cb] for cb in codebooks])


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the index of the nearest
    centroid — ``array<tinyint>`` of length m, a 32x reduction over
    float32 at k<=256. Pure per-row Catalyst folds (squared-L2 to each
    centroid, argmin via array_sort of (dist, idx) structs), zero
    shuffles, deterministic given the codebooks."""
    m, d = len(codebooks), len(codebooks[0][0])

    def sub(vec: Column, j: int) -> Column:
        return F.slice(vec, j * d + 1, d)

    # The whole codebook ships as ONE nested array literal and each
    # subspace's distances come from a transform over it — builder-time
    # only: the previous per-centroid Python loop issued ~1000 py4j
    # calls (one expression chain per (subspace, centroid)) and cost
    # 5.5 s of driver time at m=8, k=16; values, fold order and the
    # (dist, idx) tie rule are identical.
    cb_lit = _pq_codebook_lit(codebooks)

    def code_for(vec: Column, j: int) -> Column:
        dists = F.transform(
            F.element_at(cb_lit, j + 1),
            lambda c: F.aggregate(
                F.zip_with(
                    sub(vec, j),
                    c,
                    lambda a, b: (a.cast("double") - b)
                    * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        best = F.array_sort(
            F.transform(
                dists, lambda x, i: F.struct(x.alias("d"), i.alias("c"))
            )
        )
        return F.element_at(best, 1).getField("c").cast("tinyint")

    codes = F.array(*[code_for(F.col(vec_col), j) for j in range(m)])
    return df.withColumn(code_col, codes)


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    rerank: int = 0,
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-encoded corpus: each corpus
    row is reconstructed from its codes (per-subspace centroid lookup —
    the codebooks are plan literals) and scored against full-precision
    queries by cosine. The corpus side reads m bytes per vector instead
    of 4*dim; same broadcast-nested-loop + one-window shuffle profile as
    the exact variant.

    ``rerank > k`` adds the exact re-rank tail (the FAISS
    IndexIVFPQ+refine idiom): the asymmetric-distance pass keeps a
    top-``rerank`` shortlist per query, the shortlist alone (|Q| x
    rerank rows, bounded by the query-side contract) is equi-joined
    back to the ORIGINAL vectors, and exact cosine re-ranks it to
    top-k. PQ's quantization error then only has to keep true
    neighbors inside the shortlist, not rank them — recall at 32x
    scan compression jumps from ~0.22 (raw PQ ranking) to the
    shortlist's containment rate (~0.9 at rerank=10k on the synthetic
    fixtures). The re-rank join is left to AQE (the shortlist side is
    runtime-tiny; no forced hint), so the corpus is re-read only for
    the shortlisted ids — at 100 TB that is |Q| x rerank point reads,
    not a second scan."""
    cb = _pq_codebook_lit(codebooks)
    recon = F.flatten(
        F.transform(
            F.col(code_col),
            lambda c, j: F.element_at(
                F.element_at(cb, (j + F.lit(1)).cast("int")),
                c.cast("int") + F.lit(1),
            ),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fold(F.col(vec_col)).alias("q_norm"),
    )
    c = _spread(encoded).withColumn("_recon", recon).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_recon").alias("c_vec"),
        norm_fold(F.col("_recon")).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fold(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    if rerank and rerank > k:
        shortlist = (
            scored.withColumn("arnk", F.row_number().over(w))
            .filter(F.col("arnk") <= rerank)
            .select("query_id", "neighbor_id")
        )
        orig = _spread(encoded).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("n_vec"),
            norm_fold(F.col(vec_col)).alias("n_norm"),
        )
        exact = (
            shortlist.join(orig, "neighbor_id")
            .join(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("q_vec2"),
                    norm_fold(F.col(vec_col)).alias("q_norm2"),
                ),
                "query_id",
            )
            .select(
                "query_id",
                "neighbor_id",
                (
                    dot_fold(F.col("q_vec2"), F.col("n_vec"))
                    / (F.col("q_norm2") * F.col("n_norm"))
                ).alias("cosine_sim"),
            )
        )
        return (
            exact.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= k)
        )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an ``array<float>``
    column: ``scale = max(|x|)/127``; ``q_i = clamp(floor(x_i/scale +
    0.5), -127, 127)`` stored as ``array<tinyint>`` alongside the double
    ``scale``. An all-zero vector quantizes to all zeros with scale 0.

    Scale rationale: at 100 TB the embedding column dominates scan I/O
    and shuffle width; int8 + one double per vector is a 4x reduction
    over float32 (16x over float64) at <= scale/2 per-component error.
    The quantized corpus is what gets *persisted*; full-precision
    queries score against it asymmetrically (``topk_int8``), the
    FAISS-style asymmetric-distance layout. Everything here is
    deterministic Catalyst expression arithmetic (division, floor,
    clamp — all IEEE-exact or correctly rounded), so quantized sketches
    are reproducible across runs, partitionings, and engines — the
    DuckDB oracle reproduces them bit-for-bit.
    """
    v = F.col(vec_col)
    with_scale = df.withColumn(
        scale_col,
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
        / F.lit(127.0),
    )
    s = F.col(scale_col)
    q = F.when(
        s == 0.0,
        F.transform(v, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x.cast("double") / s + F.lit(0.5))),
            ).cast("tinyint"),
        )
    )
    return with_scale.withColumn(q_col, q)


def dequant(q_col: Column, scale_col: Column) -> Column:
    """Reconstruct double values from an int8-quantized vector."""
    return F.transform(q_col, lambda y: y.cast("double") * scale_col)


def topk_int8(
    quantized: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Brute-force cosine top-k where the corpus side is int8-quantized
    (output of ``quantize_int8``) and queries stay full precision —
    asymmetric distance computation. Same broadcast-nested-loop /
    single-window shuffle profile as ``cosine_topk``; the corpus scan
    reads 1/4 the bytes. Approximate only through quantization error
    (recall vs the exact variant is asserted in tests)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fold(F.col(vec_col)).alias("q_norm"),
    )
    dq = dequant(F.col(q_col), F.col(scale_col))
    c = _spread(quantized).select(
        F.col(id_col).alias("neighbor_id"),
        dq.alias("c_vec"),
        norm_fold(dq).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fold(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def _lloyd_fit_driver(
    src: DataFrame,
    vec_col: str,
    k: int,
    seed: int,
    max_fit_rows: int = 100_000,
    iters: int = 20,
    order_col: str = "vec_id",
) -> list[list[float]]:
    """Seeded Lloyd's k-means over a driver-collected bounded sample —
    the pq_train fit shape (tiny sample, tiny model, deterministic
    given the seed and sample; the same elementwise distance form as
    pq_train so results are reproducible across BLAS builds). Empty
    clusters keep their previous centroid; the loop early-stops on
    convergence.

    The bounded sample is order-pinned (ADVICE r11): ordering by a hash
    of ``order_col`` before the limit makes the fit set deterministic
    across runs/partitionings AND unbiased w.r.t. id-sorted layouts
    (a bare limit() takes a partition-layout prefix, which at scale can
    be the first file's worth of ids). TakeOrderedAndProject keeps it a
    top-K merge, not a global sort."""
    import numpy as np

    rows = (
        src.orderBy(F.xxhash64(F.col(order_col)), F.col(order_col))
        .limit(max_fit_rows)
        .select(vec_col)
        .collect()
    )
    if not rows:
        raise ValueError(
            "_lloyd_fit_driver: empty fit sample — nothing to cluster"
        )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=k, replace=len(x) < k)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        new = cent.copy()
        for c in range(k):
            mask = assign == c
            if mask.any():
                new[c] = x[mask].mean(axis=0)
        if np.array_equal(new, cent):
            break
        cent = new
    return [list(map(float, c)) for c in cent]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float = 0.5,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into ``n_cells`` cells; each query scores only
    the ``n_probe`` cells whose centroids are nearest to it.

    The centroids are fit once on a deterministic hash-keyed sample of
    ``fit_fraction`` of the corpus (operators/sampling.py —
    reproducible across runs, partitionings and engines, unlike
    ``df.sample``), pulled to the driver (bounded by ``max_fit_rows``)
    and clustered with a seeded numpy Lloyd — the pq_train contract:
    IVF training is a tiny-sample, tiny-model fit by design (FAISS's
    own shape), so the fit costs ONE bounded collect instead of the
    ~25 sequential driver-blocked jobs a distributed k-means spends on
    a sample this size (measured 12 s of the builder at sf0.1). At
    100 TB the multi-pass k-means fit must never scan the full corpus;
    a few-percent sample pins centroids just as well, and the
    assignment pass stays a single linear scan. Query cost drops from
    O(N) to O(N * n_probe / n_cells) per query at recall governed by
    n_probe. Complements the SRP-LSH variant: IVF adapts to the data
    distribution, LSH is data-independent.
    """
    from .sampling import deterministic_sample

    fit_src = _spread(corpus)
    if fit_fraction < 1.0:
        fit_src = deterministic_sample(fit_src, id_col, fit_fraction, salt="ivf")
    centroids = _lloyd_fit_driver(
        fit_src, vec_col, k=n_cells, seed=seed, max_fit_rows=max_fit_rows,
        order_col=id_col,
    )

    def nearest_cells(vec: Column, n: int) -> Column:
        # squared L2 distance to each centroid, computed as a fold;
        # returns the n cell ids with smallest distance.
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.lit([float(x) for x in c]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                for c in centroids
            ]
        )
        idx = F.array_sort(
            F.transform(
                dists, lambda d, i: F.struct(d.alias("d"), i.alias("cell"))
            )
        )
        return F.transform(F.slice(idx, 1, n), lambda s: s.getField("cell"))

    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fold(F.col(vec_col)).alias("c_norm"),
        F.element_at(nearest_cells(F.col(vec_col), 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fold(F.col(vec_col)).alias("q_norm"),
        F.explode(nearest_cells(F.col(vec_col), n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fold(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def hashing_text_encoder(
    texts: list, dim: int = 256, n: int = 3
) -> object:
    """Runnable default encoder (r8 verdict task 4): HashingTF over
    character n-grams — bucket = first 8 hex digits of md5(ngram) mod
    ``dim``, term-frequency weights, float32 ``[len(texts), dim]``.

    Deterministic across processes and engines (md5, never Python's
    salted ``hash``), zero model runtime. Quality is LEXICAL: hashed
    n-gram cosine captures surface similarity (near-dup text, shared
    phrasing), not semantics — production still injects a sentence
    encoder through the same seam when meaning-grade similarity is
    needed. embed_texts L2-normalizes downstream, so the raw counts
    here are the right output."""
    import hashlib

    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        s = "" if t is None else str(t)
        if not s:
            continue
        for j in range(max(len(s) - n + 1, 1)):
            gram = s[j : j + n]
            bucket = (
                int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16)
                % dim
            )
            out[i, bucket] += 1.0
    return out


def default_text_encoder(texts: list) -> object:
    """Default encoder for embed_texts: the hashing n-gram encoder above
    (runnable, dependency-free). A real sentence-embedding model is
    still injected through the same ``encoder(list[str]) ->
    np.ndarray[n, dim] (float32)`` contract when semantic similarity is
    needed."""
    return hashing_text_encoder(texts)


def hashed_ngram_tf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    n: int = 2,
) -> DataFrame:
    """HashingTF in the SPARSE posting-list shape: one (id, bucket, w)
    row per distinct hash bucket a document's word n-grams touch, w =
    term frequency (BIGINT — exact).

    This is the column-ops twin of hashing_text_encoder, and the shape
    that scales: cosine between hashed-TF docs is a bucket-grain
    equi-join + integer dot (see doc_hashed_cosine_topk), never a dense
    dim-wide array per row. All hashing is md5-based and mirrors
    byte-for-byte in DuckDB (same idiom as sampling.md5_bucket).

    The input is spread to full parallelism before the per-row
    shingle/md5 work (the dedup-family _spread, conditional: a single
    parquet split otherwise serializes all hashing into one task —
    measured at sf0.1 the tf materialization ran 3.5 s on one core vs
    ~0.3 s spread; an already-parallel scan passes through)."""
    from . import text as TX
    from .dedup import _spread

    bucket = (
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint")
        % dim
    )
    return (
        _spread(df).select(id_col, F.explode(TX.shingles(text_col, n)).alias("gram"))
        .select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )


def embed_texts(
    df: DataFrame,
    encoder: Callable[[list], object] = default_text_encoder,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Embedding generation: the pipeline step that PRODUCES the
    ``(id, vec array<float>)`` frames the similarity stack consumes
    (cosine_topk / ann / quantization / near-dup all take this shape).

    Output is ``(id_col, embedding array<float>)`` — the embeddings
    table shape every downstream operator defaults to.

    mapInPandas streams Arrow batches of documents into worker Python
    and hands each batch's texts to ``encoder`` in one call — model
    inference wants large batches, and the Arrow batch (bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``) is exactly that
    unit. No shuffle: embedding is per-row work, parallelism is the
    input partitioning. With ``normalize`` the vectors are L2-unit so
    downstream cosine reduces to a dot product.
    """
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            if texts:
                vecs = np.asarray(encoder(texts), dtype=np.float32)
                if vecs.ndim != 2 or vecs.shape[0] != len(texts):
                    raise ValueError(
                        f"encoder returned shape {vecs.shape} for "
                        f"{len(texts)} texts"
                    )
                if normalize:
                    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                    norms[norms == 0.0] = 1.0
                    vecs = vecs / norms
                out_vecs = [v for v in vecs]
            else:
                out_vecs = []
            yield pd.DataFrame(
                {id_col: pdf[id_col], "embedding": out_vecs},
                columns=[id_col, "embedding"],
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, embedding array<float>"
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-label centroid of an embedding column, in long format
    (label, pos, centroid, n_vectors) — the class-prototype table that
    feeds outlier screens, diversity metrics, and nearest-centroid
    labeling.

    Summing float elements directly is partition-order-dependent (and
    engine-divergent); instead each element is quantized ONCE to an
    integer (round(x * quant), half-away-from-zero in both Spark and
    DuckDB), integer sums are exact and associative, and the centroid
    is ONE closed-form double division — so the result is bit-stable
    across partitionings AND engines at 1/quant resolution (documented
    semantics, like graph.pagerank's integer scaling).

    Scale shape: posexplode is a pure map stage; one keyed shuffle on
    (label, pos) with map-side partial integer sums; output is
    labels × dim rows. For wide fleets of labels the same frame
    re-aggregates to whatever coarser prototype grain is needed.
    """
    q = F.lit(int(quant)).cast("double")
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "label",
        "pos",
        F.round(F.col("x").cast("double") * q)
        .cast("bigint")
        .alias("xi"),
    )
    return exploded.groupBy("label", "pos").agg(
        (
            F.sum("xi").cast("double")
            / (F.count("*").cast("double") * q)
        ).alias("centroid"),
        F.count("*").alias("n_vectors"),
    )


def centroid_outliers(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    quant: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` farthest-from-centroid vectors per label — the
    mislabeled/outlier screen run before training on labeled
    embeddings.

    Entirely integer-exact so the ranking is engine/partitioning-
    stable: with quantized elements xi and per-(label,pos) sums S over
    n vectors, the squared distance to the centroid scales to
    Σ_pos (xi·n − S_pos)² — pure integer arithmetic (squares in
    DECIMAL(38,0)); the reported ``dist2`` divides once by n²·quant²
    at the end. Same quantization semantics as ``label_centroids``.

    Scale shape: posexplode map stage → one (label,pos) shuffle for
    the sums → join back (centroid table is labels×dim, AQE
    broadcasts) → per-vector re-sum → per-label top-k window
    (WindowGroupLimit keeps k rows per group pre-shuffle).
    """
    q = F.lit(int(quant)).cast("double")
    exploded = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "vid",
        "label",
        "pos",
        F.round(F.col("x").cast("double") * q).cast("bigint").alias("xi"),
    )
    sums = exploded.groupBy("label", "pos").agg(
        F.sum("xi").alias("s"), F.count("*").alias("n")
    )
    term = (F.col("xi") * F.col("n") - F.col("s")).cast("decimal(19,0)")
    per_vec = (
        exploded.join(sums, ["label", "pos"])
        .select("vid", "label", "n", (term * term).alias("sq"))
        .groupBy("vid", "label", "n")
        .agg(F.sum("sq").alias("d2i"))
        .select(
            "vid",
            "label",
            (
                F.col("d2i").cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double")
                   * q * q)
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist2").desc(), F.col("vid")
    )
    return (
        per_vec.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("vid").alias(id_col), "label", "dist2",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def centroid_silhouette(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-vector simplified (centroid) silhouette: a = distance to the
    own-label centroid, b = min distance to any other label's centroid,
    s = (b - a) / max(a, b) in [-1, 1] — the cluster-quality score that
    asks of every labeled embedding "is it closer to its own prototype
    than to the nearest competing one?". The mean-per-label rollup is a
    trivial rider on this frame; the per-vector grain is the actionable
    output (s < 0 rows are relabel/inspect candidates).

    Same integer-exact distance arithmetic as ``centroid_outliers``
    (Σ_pos (xi·n − S_pos)² in DECIMAL, one sqrt + one division at the
    end), extended to EVERY candidate label: the scaled distances are
    exact, so a, b, and s oracle-check bitwise. No full silhouette
    O(n²) pair scan anywhere — prototypes stand in for clusters.

    Scale shape: posexplode map stage → one (label,pos) shuffle for the
    centroid sums (labels×dim rows, broadcast back) → the score join
    fans each vector element out by |labels| (enum-bounded) → per
    (vector, candidate) re-sum → one per-vector reduction. Linear in
    vectors with a |labels| constant."""
    q = F.lit(int(quant)).cast("double")
    exploded = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("own"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "vid",
        "own",
        "pos",
        F.round(F.col("x").cast("double") * q).cast("bigint").alias("xi"),
    )
    sums = exploded.groupBy(F.col("own").alias("cand"), F.col("pos")).agg(
        F.sum("xi").alias("s"), F.count("*").alias("n")
    )
    term = (F.col("xi") * F.col("n") - F.col("s")).cast("decimal(19,0)")
    dists = (
        exploded.join(F.broadcast(sums), "pos")
        .select("vid", "own", "cand", "n", (term * term).alias("sq"))
        .groupBy("vid", "own", "cand", "n")
        .agg(F.sum("sq").alias("d2i"))
        .select(
            "vid",
            "own",
            "cand",
            (
                F.sqrt(F.col("d2i").cast("double"))
                / (F.col("n").cast("double") * q)
            ).alias("dist"),
        )
    )
    per_vec = dists.groupBy("vid", "own").agg(
        F.max(F.when(F.col("cand") == F.col("own"), F.col("dist"))).alias(
            "a_dist"
        ),
        F.min(F.when(F.col("cand") != F.col("own"), F.col("dist"))).alias(
            "b_dist"
        ),
    )
    g = F.greatest(F.col("a_dist"), F.col("b_dist"))
    return per_vec.select(
        F.col("vid").alias(id_col),
        F.col("own").alias("label"),
        "a_dist",
        "b_dist",
        F.when(g > 0, (F.col("b_dist") - F.col("a_dist")) / g)
        .otherwise(F.lit(0.0))
        .alias("silhouette"),
    )


def nearest_centroid_confusion(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """Nearest-centroid classification of every vector + the
    label-vs-prediction confusion matrix — the 1-NN-to-prototype
    sanity check of a labeled embedding table (a strong off-diagonal
    cell means two labels' embedding clouds overlap, or the labels are
    noisy).

    Distances reuse the ``centroid_outliers`` integer-exact scheme per
    candidate label (Σ(xi·n_L − S_L,pos)² / n_L²q²); each division is
    one IEEE expression over exact integers, so the per-(vector,label)
    doubles — and therefore the argmin — are engine-identical. The
    argmin itself is a min(struct(dist2, label)) partial-aggregable
    fold (ties break to the smaller label).

    Scale shape: the exploded corpus joins the centroid stats table on
    ``pos`` alone — a deliberate L-fold row expansion (L = #labels):
    per-vector scoring against all L prototypes. The stats side is
    L×dim rows (broadcast); with large L switch to a blocked variant
    (score against candidate labels from an ANN prefilter). Output is
    the L×L confusion matrix.
    """
    q = F.lit(int(quant)).cast("double")
    exploded = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("true_label"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "vid",
        "true_label",
        "pos",
        F.round(F.col("x").cast("double") * q).cast("bigint").alias("xi"),
    )
    sums = (
        exploded.groupBy(F.col("true_label").alias("cand"), "pos")
        .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
    )
    term = (F.col("xi") * F.col("n") - F.col("s")).cast("decimal(19,0)")
    scored = (
        exploded.join(F.broadcast(sums), "pos")
        .select("vid", "true_label", "cand", "n", (term * term).alias("sq"))
        .groupBy("vid", "true_label", "cand", "n")
        .agg(F.sum("sq").alias("d2i"))
        .select(
            "vid",
            "true_label",
            "cand",
            (
                F.col("d2i").cast("double")
                / (F.col("n").cast("double") * F.col("n").cast("double")
                   * q * q)
            ).alias("dist2"),
        )
    )
    pred = scored.groupBy("vid", "true_label").agg(
        F.min(F.struct("dist2", "cand")).alias("m")
    ).select("vid", "true_label", F.col("m.cand").alias("pred_label"))
    return pred.groupBy("true_label", "pred_label").agg(
        F.count("*").alias("n")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    threshold_num: int = 95,
    threshold_den: int = 100,
    quant: int = 1_000_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each cluster,
    mark every vector that has a semantic near-duplicate (cosine >=
    threshold) with a LOWER id — keeping exactly the smallest id of
    every duplicate group, the standard greedy-by-id survivor rule.

    ``cluster_col`` is the injected cluster assignment (k-means / IVF
    coarse cells in production — ``ivf_topk``'s assignment step is the
    in-engine path); restricting the pairwise scan to clusters turns
    the O(n²) all-pairs comparison into Σ|cluster|² — n²/k for
    balanced k-way clustering, the SemDeDup scaling argument.

    Exactness: elements quantize once to integers (round(x·quant)),
    dots and norms are exact integer folds, and the threshold test is
    ``den²·dot² >= num²·|a|²·|b|²`` (with dot > 0) in DECIMAL(38,0) —
    algebraically identical to cosine >= num/den but sqrt-free, so the
    verdicts (and the whole output) are bit-identical across engines
    and partitionings. Magnitude contract: both products must fit
    decimal(38,0), i.e. ``|a|²·|b|²·num² < ~1e38`` where |v|² is the
    QUANTIZED norm Σ round(x·quant)² — unit-norm embeddings at
    quant=1e6 (|v|² ≈ 1e12) leave ~10 orders of headroom; inputs that
    would overflow raise a descriptive error in-plan instead of
    silently dropping duplicate pairs (Spark's non-ANSI decimal
    multiply NULLs on overflow).

    Scale shape: one keyed self-join on the cluster key (pair grain
    never materializes vectors longer than the fold), one groupBy on
    the loser id, one left join back — no windows, no driver state.
    Returns one row per input vector: (id, cluster, n_dup_lower,
    is_kept).
    """
    qd = F.lit(int(quant)).cast("double")
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * qd).cast("long"),
    )
    nrm = F.aggregate(
        F.transform(qv, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(cluster_col).alias("cluster"),
        qv.alias("_q"),
        nrm.alias("_n"),
    ).localCheckpoint()
    a = base.select(
        F.col("_id").alias("id_a"),
        "cluster",
        F.col("_q").alias("qa"),
        F.col("_n").alias("na"),
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        "cluster",
        F.col("_q").alias("qb"),
        F.col("_n").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    num2 = int(threshold_num) * int(threshold_num)
    den2 = int(threshold_den) * int(threshold_den)
    pairs = (
        a.join(b, ["cluster"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("cluster", "id_a", "id_b", "na", "nb", dot.alias("dot"))
    )
    d19 = "decimal(19,0)"
    # Overflow guard (fail LOUD, never drop pairs): both decimal
    # products must fit decimal(38,0) — Spark's non-ANSI decimal
    # multiply NULLs on overflow, which would silently score a true
    # duplicate as non-duplicate. A double estimate of each product
    # (relative error ~1e-15, vs the 1e36 margin below) gates the exact
    # compare; out-of-bound rows raise with a rescale hint instead.
    _lim = 9.9e37
    est_lhs = (
        F.col("dot").cast("double") * F.col("dot").cast("double")
        * F.lit(float(den2))
    )
    est_rhs = (
        F.col("na").cast("double") * F.col("nb").cast("double")
        * F.lit(float(num2))
    )
    exact = (F.col("dot") > 0) & (
        F.col("dot").cast(d19) * F.col("dot") * F.lit(den2)
        >= F.col("na").cast(d19) * F.col("nb") * F.lit(num2)
    )
    is_dup = F.when(
        (F.abs(est_lhs) < _lim) & (est_rhs < _lim), exact
    ).otherwise(
        F.raise_error(F.lit(
            "semantic_dedup: decimal(38,0) overflow — "
            "norm2_a*norm2_b*num^2 or dot^2*den^2 exceeds ~1e38 for "
            "this (embedding magnitude, quant) combination; lower "
            "`quant` or normalize the vectors (unit-norm embeddings "
            "with quant=1e6 leave ~10 orders of headroom)"
        ))
    )
    losers = (
        pairs.where(is_dup)
        .groupBy(F.col("id_b").alias("_id"))
        .agg(F.count("*").cast("long").alias("n_dup_lower"))
    )
    return (
        base.select("_id", "cluster")
        .join(losers, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            F.coalesce(F.col("n_dup_lower"), F.lit(0).cast("long")).alias(
                "n_dup_lower"
            ),
            F.col("n_dup_lower").isNull().alias("is_kept"),
        )
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
    quant: int = 1_000_000,
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column with a
    BIT-EXACT cross-engine contract — the iterative-operator family
    (pagerank / connected components / triangles) extended to
    clustering.

    Determinism scheme: elements quantize once to integers; centroid
    STATE is the exact integer pair (per-position sum S, member count
    n) — never a divided mean — and the per-(vector, centroid)
    distance is ``Σ(xi·n − S)² / (n²·q²)``: an exact DECIMAL(38,0)
    numerator and ONE IEEE division (the ``nearest_centroid_confusion``
    scheme), so the argmin — and therefore every assignment, every
    iteration — is identical across engines and partitionings. Ties
    break to the smaller centroid id. Init = the k smallest ids'
    vectors (deterministic, SQL-expressible); a centroid that loses
    all members keeps its previous state (documented semantic the
    oracle mirrors).

    Scale shape: the exploded corpus is cached once; per iteration one
    join against the k×dim integer state table (AQE broadcasts it),
    one (vid) argmin fold, one (cluster, pos) map-combined sum — all
    keyed, O(corpus·k) work, state checkpointed per iteration (the
    carry-over join references it twice). Returns one row per vector:
    (id, cluster BIGINT = init vector id, dist2 DOUBLE).
    """
    q = F.lit(int(quant)).cast("double")
    d19 = "decimal(19,0)"
    id_type = df.schema[id_col].dataType
    xi_arr = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * q).cast("bigint"),
    )
    base = df.select(F.col(id_col).alias("vid"), xi_arr.alias("xi"))
    nonempty = base.where(F.size("xi") > 0)

    # ---- r12 redesign (guide §8 "decide with small rows"): the k-means
    # STATE is k x dim exact integers — bounded METADATA, like init_ids
    # — so it rides the driver between iterations instead of living as
    # a corpus-sized frame. The r11 shape eagerly checkpointed the
    # corpus x dim posexplode and per iteration joined it against the
    # state on pos (a k-fold fan-out: corpus x dim x k rows through an
    # exchange + two hash aggregates). Now each iteration is:
    #   assignment: a row-local projection over the UN-exploded vectors
    #     (fold per centroid over a state literal — zero exchanges),
    #   state update: one posexplode + map-combined (cluster, pos) sum
    #     (the only shuffle: k x dim x maps partial rows),
    #   one bounded collect (k x dim exact ints) to refresh the literal.
    # Arithmetic is EXPRESSION-IDENTICAL to the r2-r11 formulation (and
    # to the unrolled-SQL oracle): xi = round(x*q) as bigint, term =
    # (xi*n - s) in bigint cast DECIMAL(19,0), d2i = null-skipping sum
    # of term^2 in DECIMAL(38,0), ONE IEEE division, argmin by
    # struct(dist2, cid) with ties to the smaller centroid id. Exact
    # integer sums are order-independent, so collecting the state
    # changes nothing. The general per-(cid, n) grouping semantics of
    # the joined formulation (scored grouped by vid, cid AND n — only
    # observable for ragged vector lengths) is preserved by emitting
    # one candidate per distinct n within a centroid.

    # Deterministic seed set: the k smallest ids' quantized vectors,
    # with per-pos (s=xi, n=1) state. TakeOrderedAndProject, bounded.
    state: dict = {}  # cid -> {"s": [bigint per pos], "n": [long per pos]}
    for r in (
        nonempty.orderBy("vid").limit(k).select("vid", "xi").collect()
    ):
        state[r["vid"]] = {
            "s": list(r["xi"]), "n": [1] * len(r["xi"])
        }
    if not state:  # no non-empty vectors: nothing can be assigned
        return base.where(F.lit(False)).select(
            F.col("vid").alias(id_col),
            F.col("vid").alias("cluster"),
            F.lit(0.0).alias("dist2"),
        )

    def _assign_col():
        """Candidate argmin as one row-local expression over xi."""
        cands = []
        for cid in sorted(state):
            st = state[cid]
            # group state positions by their n (uniform-n in practice:
            # one group per centroid; ragged inputs keep the joined
            # formulation's per-(cid, n) candidate split)
            by_n: dict = {}
            for pos, (s_val, n_val) in enumerate(zip(st["s"], st["n"])):
                by_n.setdefault(n_val, []).append([pos, s_val])
            for n_val, ps in sorted(by_n.items()):
                ps_lit = F.lit([[int(p), int(s)] for p, s in ps])
                n_lit = F.lit(int(n_val)).cast("long")
                overlap = F.filter(
                    ps_lit, lambda p: p[0] < F.size(F.col("xi"))
                )

                def _step(acc, p):
                    x = F.element_at(
                        F.col("xi"), (p[0] + 1).cast("int")
                    )
                    t = (x * n_lit - p[1]).cast(d19)
                    sq = t * t
                    return F.struct(
                        F.when(sq.isNull(), acc["d2"])
                        .otherwise(acc["d2"] + sq)
                        .alias("d2"),
                        (
                            acc["nn"]
                            + F.when(sq.isNull(), 0).otherwise(1)
                        ).alias("nn"),
                    )

                folded = F.aggregate(
                    overlap,
                    F.struct(
                        F.lit(0).cast("decimal(38,0)").alias("d2"),
                        F.lit(0).alias("nn"),
                    ),
                    _step,
                )
                d2i = F.when(
                    folded["nn"] == 0,
                    F.lit(None).cast("decimal(38,0)"),
                ).otherwise(folded["d2"])
                dist2 = d2i.cast("double") / (
                    n_lit.cast("double") * n_lit.cast("double") * q * q
                )
                cands.append(
                    F.struct(
                        dist2.alias("dist2"),
                        F.lit(cid).cast(id_type).alias("cid"),
                        F.size(overlap).alias("cnt"),
                    )
                )
        valid = F.filter(F.array(*cands), lambda c: c["cnt"] > 0)
        return F.array_min(
            F.transform(
                valid, lambda c: F.struct(c["dist2"], c["cid"])
            )
        )

    for it in range(iterations):
        assign = base.select(
            "vid", "xi", _assign_col().alias("m")
        ).where(F.col("m").isNotNull())
        if it == iterations - 1:
            break  # final assignment needs no further centroid update
        # State update: the one shuffle per iteration — map-combined
        # (cluster, pos) integer sums, k x dim rows after aggregation,
        # collected exactly (bigint sums are partitioning-independent).
        new_rows = (
            assign.select(
                F.col("m.cid").alias("cid"),
                F.posexplode("xi").alias("pos", "xiv"),
            )
            .groupBy("cid", "pos")
            .agg(
                F.sum("xiv").alias("s2"),
                F.count("*").cast("long").alias("n2"),
            )
            .collect()
        )
        arrived: dict = {}
        for r in new_rows:
            arrived.setdefault(r["cid"], {})[r["pos"]] = (
                int(r["s2"]), int(r["n2"])
            )
        # Empty-cluster carry-over: keep the previous (s, n) where no
        # member arrived this iteration (per position, matching the
        # joined formulation's left-join coalesce).
        for cid, st in state.items():
            got = arrived.get(cid, {})
            for pos in range(len(st["s"])):
                if pos in got:
                    st["s"][pos], st["n"][pos] = got[pos]
    return assign.select(
        F.col("vid").alias(id_col),
        F.col("m.cid").alias("cluster"),
        F.col("m.dist2").alias("dist2"),
    )


def contrastive_pairs(
    corpus: DataFrame,
    anchors: DataFrame,
    k_pos: int = 3,
    k_neg: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "neg",
) -> DataFrame:
    """Contrastive training-pair mining for embedding models: per anchor,
    the ``k_pos`` nearest corpus vectors by exact cosine (hard
    positives) and ``k_neg`` deterministic hash-sampled non-positives
    (random negatives). Returns (anchor_id, other_id, label, rnk) with
    label ∈ {'pos','neg'} — the (anchor, positive, negative) triples a
    contrastive loss consumes, reproducible across runs and engines.

    Positives reuse ``cosine_topk`` (broadcast-anchor scoring, one
    top-k window). Negatives order every non-positive candidate by a
    salted per-(anchor, candidate) md5 and keep the first ``k_neg`` —
    uniform over the corpus, anchor-decorrelated, and exclusion is an
    anti-join on the positive pairs (never a collected set). Anchors
    must be a bounded sample (same contract as ``cosine_topk``); at
    corpus scale, pre-filter negative candidates by a hash prefix
    (keeps the window input at O(corpus/anchors · ε)) before ranking —
    the top-k_neg by hash is unchanged by dropping high-hash rows.
    """
    # The positives frame feeds BOTH the output and the negative
    # exclusion anti-join; Catalyst does not share subtrees across
    # branches, so without a lineage cut the broadcast scoring pass
    # would run once per consumer. It is |anchors|·k_pos rows — tiny by
    # the anchor contract — so materialize it once.
    pos = (
        cosine_topk(
            corpus, anchors, k=k_pos, id_col=id_col, vec_col=vec_col
        )
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("other_id"),
            "rnk",
        )
        .localCheckpoint()
    )
    a_ids = anchors.select(F.col(id_col).alias("anchor_id"))
    cand = (
        _spread(corpus)
        .select(F.col(id_col).alias("other_id"))
        .crossJoin(F.broadcast(a_ids))
        .filter(F.col("other_id") != F.col("anchor_id"))
        .join(pos.select("anchor_id", "other_id"),
              ["anchor_id", "other_id"], "left_anti")
    )
    hk = F.md5(
        F.concat(
            F.lit(salt),
            F.col("anchor_id").cast("string"),
            F.lit("|"),
            F.col("other_id").cast("string"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(hk, F.col("other_id"))
    neg = (
        cand.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k_neg)
    )
    return pos.select(
        "anchor_id", "other_id", F.lit("pos").alias("label"), "rnk"
    ).unionByName(
        neg.select(
            "anchor_id", "other_id", F.lit("neg").alias("label"), "rnk"
        )
    )


def matryoshka_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-readiness audit of an embedding column: per vector,
    the cosine between the full vector and its zero-padded prefix at
    half and quarter dimensionality — the number a retrieval team
    reads before truncating MRL-style embeddings to cut index cost
    4-16x. For a prefix p of x, dot(x, pad(p)) = ‖p‖², so
    cos(x, pad(p)) = ‖p‖/‖x‖ EXACTLY — one prefix-norm fold and ONE
    division per readout, no second pass over the dot product. Scores
    near 1 mean the leading dims carry the mass (truncation-safe);
    uniformly-spread vectors sit near sqrt(fraction) (~0.707 at half,
    0.5 at quarter) — the no-better-than-random floor.

    Determinism: the norms are the sequential left-fold the emb oracle
    family uses (IEEE addition of identical operands in identical
    order ≡ DuckDB list_reduce), the division is one closed form;
    NULL for the zero vector. Pure per-row map stage — no shuffle at
    all. Returns (id, dim INT, l2_norm, half_cos, quarter_cos).
    """
    v = F.col(vec_col)
    full = norm_fold(v)
    half = norm_fold(
        F.slice(v, F.lit(1), F.expr(f"size({vec_col}) div 2"))
    )
    quarter = norm_fold(
        F.slice(v, F.lit(1), F.expr(f"size({vec_col}) div 4"))
    )
    return emb.select(
        F.col(id_col),
        F.size(v).alias("dim"),
        full.alias("l2_norm"),
        F.when(full == 0.0, F.lit(None).cast("double"))
        .otherwise(half / full)
        .alias("half_cos"),
        F.when(full == 0.0, F.lit(None).cast("double"))
        .otherwise(quarter / full)
        .alias("quarter_cos"),
    )


def pca_top_component(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    cov_scale: int = 10**12,
    iterations: int = 8,
) -> DataFrame:
    """Top principal component of an embedding column by distributed
    covariance accumulation + quantized power iteration — the
    dominant-variance direction behind whitening, drift monitoring,
    and "is one feature axis eating the space" embedding audits.

    Pipeline (every step engine-portable, no float accumulation):

    1. QUANTIZE per row: ``q_i = floor(double(x_i)·scale)`` — integer
       micro-units (documented quantization, error 1/scale per coord).
    2. COVARIANCE exactly in integers: one pass accumulates the upper
       triangle ``G_ij = Σ q_i q_j``, the column sums ``s_i`` and the
       count n as DECIMAL(38,0); the (n-scaled) covariance is
       ``C_ij = n·G_ij − s_i·s_j`` — exact, centering included without
       a second pass or a mean broadcast.
    3. RENORMALIZE C to ``cov_scale`` micro-units of its max |cell|
       (floor of one IEEE division — identical in any engine) so the
       iteration's integer products stay far inside DECIMAL(38,0).
    4. POWER ITERATION from the all-ones vector: ``w = C'·v`` is an
       equi-join + keyed sum over the d²-cell matrix frame (d² ≤ 4096
       rows); v renormalizes to ``scale`` micro-units of max |w_i|
       each step. ``iterations`` fixed steps — unrollable, and the
       oracle replays them exactly.

    Scale shape: the corpus is scanned ONCE; the d²-bounded partial
    aggregation means every executor emits ≤ d(d+1)/2 cells regardless
    of row count; everything after runs on d- or d²-row frames. The
    d²-per-row pair explosion is CPU-linear in rows·d² — the classic
    Gram trade, bounded by d=64 here. Returns one row per dimension:
    (i, v_scaled, loading = v/scale ∈ [−1, 1]).
    """
    d38 = "decimal(38,0)"
    qarr = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )
    rows = df.select(qarr.alias("q"))
    # upper-triangle (i, j, q_i*q_j) structs generated per row, 0-based
    tri = F.flatten(
        F.transform(
            F.col("q"),
            lambda x, i: F.transform(
                F.slice(F.col("q"), i + 1, F.size(F.col("q"))),
                lambda y, k: F.struct(
                    i.alias("i"),
                    (i + k).alias("j"),
                    (x * y).alias("p"),
                ),
            ),
        )
    )
    # fold the column sums into the SAME explode via sentinel j = -1
    # rows (value q_i, count = n) so the corpus is scanned exactly once
    single = F.transform(
        F.col("q"),
        lambda x, i: F.struct(
            i.alias("i"), F.lit(-1).alias("j"), x.alias("p")
        ),
    )
    cells = (
        rows.select(
            F.explode(F.concat(tri, single)).alias("c")
        )
        .groupBy(F.col("c.i").alias("i"), F.col("c.j").alias("j"))
        .agg(
            F.sum(F.col("c.p").cast(d38)).alias("g"),
            F.count(F.lit(1)).cast(d38).alias("cnt"),
        )
        .localCheckpoint()
    )
    gram = cells.filter(F.col("j") >= 0).select("i", "j", "g")
    sums = cells.filter(F.col("j") == -1).select(
        "i", F.col("g").alias("s"), F.col("cnt").alias("n")
    )
    si = sums.select(F.col("i").alias("_i"), F.col("s").alias("s_i"), "n")
    sj = sums.select(F.col("i").alias("_j"), F.col("s").alias("s_j"))
    cov_ut = (
        gram.join(si, gram["i"] == si["_i"])
        .join(sj, gram["j"] == sj["_j"])
        .select(
            "i",
            "j",
            (F.col("n") * F.col("g") - F.col("s_i") * F.col("s_j")).alias(
                "c"
            ),
        )
    )
    cov = cov_ut.unionByName(
        cov_ut.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    wmax = Window.partitionBy()
    cmax = F.max(F.abs(F.col("c"))).over(wmax)
    cnorm = cov.select(
        "i",
        "j",
        F.when(cmax == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(
                _dbl(F.col("c")) / _dbl(cmax) * F.lit(float(cov_scale))
            ).cast("long")
        )
        .alias("cq"),
    ).localCheckpoint()
    dims = cnorm.select(F.col("i").alias("dim")).distinct()
    v = dims.select("dim", F.lit(int(scale)).cast("long").alias("v"))
    for _ in range(iterations):
        w = (
            cnorm.join(v, cnorm["j"] == v["dim"])
            .groupBy("i")
            .agg(
                F.sum(F.col("cq").cast(d38) * F.col("v").cast(d38)).alias(
                    "w"
                )
            )
        )
        vmax = F.max(F.abs(F.col("w"))).over(wmax)
        v = w.select(
            F.col("i").alias("dim"),
            F.when(vmax == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    _dbl(F.col("w")) / _dbl(vmax) * F.lit(float(scale))
                ).cast("long")
            )
            .alias("v"),
        )
    return v.select(
        F.col("dim").cast("int").alias("i"),
        F.col("v").alias("v_scaled"),
        (F.col("v").cast("double") / F.lit(float(scale))).alias("loading"),
    )


def fisher_dims(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    quant_scale: int = 1_000_000,
    top_k: int = 10,
) -> DataFrame:
    """Per-dimension Fisher discriminability of an embedding column
    between two classes (labels binarized as ``label % 2 = 0``): which
    coordinates actually separate the classes — the feature-quality
    audit run before anyone trains a probe on pooled embeddings, and
    the principled way to pick dimensions for a cheap blocking key.

    fisher(d) = (m1 - m2)^2 / (v1 + v2) over per-class mean/variance of
    the dimension's values, computed on QUANTIZED values
    (floor(v * quant_scale) — floor(double) and the multiply are
    identical IEEE ops in any engine) so every moment is an exact
    integer: counts and sums BIGINT, squared sums DECIMAL(38,0)
    (overflow-safe at corpus scale), and the final score is one fixed
    composition of IEEE divisions — bit-identical cross-engine.

    Scale shape: one posexplode pass (rows x dim), one dim-grain
    aggregation with map-side partials, one window over the d-row
    frame for the deterministic top-k (score DESC, dim ASC). Returns
    (dim, n_a, n_b, mean_a, mean_b, var_a, var_b, fisher, rnk).
    """
    ex = emb.select(
        (F.col(label_col) % 2 == 0).alias("cls"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select(
        "cls",
        "dim",
        F.floor(F.col("v").cast("double") * F.lit(float(quant_scale)))
        .cast("long")
        .alias("q"),
    )
    qq = F.expr("CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))")
    per = ex.groupBy("dim").agg(
        F.sum(F.when(F.col("cls"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("cls"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("cls"), F.col("q"))).cast("decimal(38,0)")
        .alias("_sa"),
        F.sum(F.when(~F.col("cls"), F.col("q"))).cast("decimal(38,0)")
        .alias("_sb"),
        F.sum(F.when(F.col("cls"), qq)).cast("decimal(38,0)").alias("_qa"),
        F.sum(F.when(~F.col("cls"), qq)).cast("decimal(38,0)").alias("_qb"),
    )

    def _dbl(c):
        return c.cast("string").cast("double")

    ma = _dbl(F.col("_sa")) / F.col("n_a").cast("double")
    mb = _dbl(F.col("_sb")) / F.col("n_b").cast("double")
    va = _dbl(F.col("_qa")) / F.col("n_a").cast("double") - ma * ma
    vb = _dbl(F.col("_qb")) / F.col("n_b").cast("double") - mb * mb
    scored = per.select(
        "dim", "n_a", "n_b",
        ma.alias("mean_a"), mb.alias("mean_b"),
        va.alias("var_a"), vb.alias("var_b"),
        F.when(va + vb == 0.0, F.lit(None).cast("double"))
        .otherwise((ma - mb) * (ma - mb) / (va + vb))
        .alias("fisher"),
    )
    w = Window.orderBy(F.col("fisher").desc_nulls_last(), F.col("dim"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= top_k)
    )


def ivf_nprobe_curve(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    probes: tuple = (1, 2, 4, 8),
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float = 0.5,
) -> DataFrame:
    """IVF recall-vs-n_probe sensitivity sweep — the tuning artifact a
    100 TB ANN deployment reads BEFORE committing to a probe count:
    per probe depth, the recall@k of ivf_topk's index against the
    in-plan exact top-k.

    One index, one scan, every depth: the k-means quantizer is fit
    ONCE, the corpus is cell-assigned ONCE, and each query explodes its
    max(probes) nearest cells WITH their probe rank r, so a candidate
    pair carries the depth at which its cell enters the probe set; a
    depth-p result is the candidates with r <= p. The whole sweep costs
    one corpus-cells join at the DEEPEST setting (plus the |probes|-way
    fan-out of that joined frame) instead of |probes| separate index
    runs — at 8 cells / max probe 8 that deepest setting IS brute
    force, which also makes the last curve point an exact-recall==1
    anchor (probing every cell must reproduce the exact top-k, ties
    broken identically by neighbor_id).

    Returns (n_probe int, query_id, neighbor_id, hit boolean) at the
    (depth, pair) grain; callers aggregate recall per depth.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from .sampling import deterministic_sample

    fit_src = _spread(corpus)
    if fit_fraction < 1.0:
        fit_src = deterministic_sample(
            fit_src, id_col, fit_fraction, salt="ivf"
        )
    # Cached for the same reason as ivf_topk: MLlib's Lloyd loop
    # re-runs the sample filter + vector conversion per iteration
    # against an uncached input. Same data/seed/algorithm — centroids
    # unchanged.
    fitdf = fit_src.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    ).cache()
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(fitdf)
    fitdf.unpersist()
    centroids = [list(map(float, c)) for c in model.clusterCenters()]

    def nearest_cells(vec: Column, n: int) -> Column:
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.lit([float(x) for x in c]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                for c in centroids
            ]
        )
        idx = F.array_sort(
            F.transform(
                dists, lambda d, i: F.struct(d.alias("d"), i.alias("cell"))
            )
        )
        return F.transform(F.slice(idx, 1, n), lambda s: s.getField("cell"))

    max_p = max(probes)
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm_fold(F.col(vec_col)).alias("c_norm"),
        F.element_at(nearest_cells(F.col(vec_col), 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm_fold(F.col(vec_col)).alias("q_norm"),
        F.posexplode(nearest_cells(F.col(vec_col), max_p)).alias(
            "pos", "cell"
        ),
    )
    # each corpus vector lives in exactly one cell and a query's probed
    # cells are distinct, so a (query, neighbor) candidate appears once,
    # carrying r = the probe depth at which its cell enters.
    probes_arr = F.array(*[F.lit(int(p)) for p in sorted(probes)])
    cand = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_fold(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine_sim"),
            (F.col("pos") + 1).alias("r"),
        )
        .select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.explode(
                F.filter(probes_arr, lambda p: p >= F.col("r"))
            ).alias("n_probe"),
        )
    )
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    topk = cand.withColumn("rnk", F.row_number().over(w).cast("int")).filter(
        F.col("rnk") <= k
    )
    exact = cosine_topk(corpus, queries, k=k).select(
        "query_id", F.col("neighbor_id").alias("_exact_nid")
    )
    return topk.join(
        exact,
        (topk["query_id"] == exact["query_id"])
        & (topk["neighbor_id"] == exact["_exact_nid"]),
        "left",
    ).select(
        topk["n_probe"],
        topk["query_id"],
        topk["neighbor_id"],
        exact["_exact_nid"].isNotNull().alias("hit"),
    )


def pq_retrain_int_exact(
    corpus: DataFrame,
    m: int = 8,
    d: int = 8,
    k_init: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-exact PQ distortion audit: quantize the corpus to int8
    (the bit-portable quantize_int8 rule), take the ``k_init`` vectors
    with smallest ids as deterministic per-subspace seed codebooks,
    assign every subvector to its nearest seed centroid by EXACT
    integer squared-L2 (ties to the lower centroid index), then run one
    Lloyd mean-update under that assignment with FLOORED integer means
    — so the reconstruction error before and after the retrain is exact
    BIGINT arithmetic end to end, fully SQL-derivable, unlike pq_train
    whose float k-means lives driver-side (its oracle class would have
    to bake codebook literals).

    This is the codebook-quality gate a PQ deployment reads: how much
    distortion the seed codebook carries and how much one exact
    refinement step removes, per subspace. The floored mean shifts each
    coordinate by < 1 from the true cell mean (which is the exact
    minimizer), so the after-retrain error is within n_vectors*d of
    optimal for the assignment — and both numbers are exact, so the
    comparison is deterministic.

    Floored mean portability: computed as (s - pmod(s, n)) div n — the
    numerator is exactly divisible by n, so truncating and flooring
    division agree and the oracle can use either engine's operator.

    Scale: one corpus scan -> per-(vector, subspace) broadcast
    assignment against m*k_init centroid rows -> dim-grain keyed
    aggregates ((j, c, pos) cells, then (j, vec) errors, then j) —
    linear in corpus size with constant m*d fan-out, no driver-side
    training data pull. Returns one row per subspace: (subspace,
    n_vectors, sq_err_init, sq_err_retrained, distortion_init,
    distortion_retrained, improved).
    """
    qz = quantize_int8(corpus, vec_col=vec_col).select(
        F.col(id_col),
        F.transform(F.col("q8"), lambda y: y.cast("long")).alias("q"),
    )
    subs_expr = (
        f"explode(transform(sequence(0, {m - 1}), "
        f"j -> struct(j AS j, slice({{col}}, j*{d}+1, {d}) AS sv)))"
    )
    sub = qz.select(
        F.col(id_col), F.expr(subs_expr.format(col="q")).alias("e")
    ).select(
        F.col(id_col),
        F.col("e.j").cast("int").alias("j"),
        F.col("e.sv").alias("sv"),
    )
    wseed = Window.orderBy(id_col)
    init = (
        qz.orderBy(id_col)
        .limit(k_init)
        .select(
            (F.row_number().over(wseed) - 1).alias("c"),
            F.col("q").alias("cq"),
        )
    )
    isub = init.select(
        "c", F.expr(subs_expr.format(col="cq")).alias("e")
    ).select(
        "c",
        F.col("e.j").cast("int").alias("j"),
        F.col("e.sv").alias("csv"),
    )
    d2 = sub.join(F.broadcast(isub), "j").select(
        F.col(id_col),
        "j",
        "c",
        "sv",
        F.aggregate(
            F.zip_with(F.col("sv"), F.col("csv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist2"),
    )
    # Nearest-centroid argmin as a partial-aggregable min(struct) — the
    # struct orders (dist2, c, ...) so ties break to the lower centroid
    # index exactly like the former row_number window, but the k_init-fold
    # candidate fan-out now collapses MAP-SIDE before the exchange
    # (k x fewer rows shuffled, no sort). sv is constant per (vec, j) and
    # rides the struct. The assignment feeds BOTH the centroid update and
    # the error join below; cache it so the broadcast-join + fold subtree
    # runs once, not twice.
    a = (
        d2.groupBy(id_col, "j")
        .agg(F.min(F.struct("dist2", "c", "sv")).alias("_m"))
        .select(
            F.col(id_col),
            "j",
            F.col("_m.c").alias("c"),
            F.col("_m.sv").alias("sv"),
            F.col("_m.dist2").alias("dist2"),
        )
        .cache()
    )
    dims = a.select(
        F.col(id_col),
        "j",
        "c",
        "dist2",
        F.posexplode("sv").alias("pos0", "val"),
    ).select(
        F.col(id_col),
        "j",
        "c",
        "dist2",
        (F.col("pos0") + 1).alias("pos"),
        "val",
    )
    cent = dims.groupBy("j", "c", "pos").agg(
        F.sum("val").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).select(
        "j", "c", "pos", F.expr("(s - pmod(s, n)) div n").alias("fd")
    )
    err = (
        dims.join(cent, ["j", "c", "pos"])
        .groupBy("j", id_col)
        .agg(
            F.sum((F.col("val") - F.col("fd")) * (F.col("val") - F.col("fd")))
            .cast("long")
            .alias("e2"),
            F.max("dist2").alias("d2i"),  # constant per (vec, j)
        )
    )
    return err.groupBy(F.col("j").cast("int").alias("subspace")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum("d2i").cast("bigint").alias("sq_err_init"),
        F.sum("e2").cast("bigint").alias("sq_err_retrained"),
    ).select(
        "subspace",
        "n_vectors",
        "sq_err_init",
        "sq_err_retrained",
        (F.col("sq_err_init").cast("double") / F.col("n_vectors")).alias(
            "distortion_init"
        ),
        (
            F.col("sq_err_retrained").cast("double") / F.col("n_vectors")
        ).alias("distortion_retrained"),
        (F.col("sq_err_retrained") <= F.col("sq_err_init")).alias(
            "improved"
        ),
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    d: int = 8,
    k_pq: int = 16,
    n_probe: int = 2,
    k: int = 5,
    query_mod: int = 25,
    rerank_r: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """INTEGER-EXACT IVF-PQ search with asymmetric distance computation
    — the production ANN composition (FAISS's IndexIVFPQ shape) built
    from the audited pieces: IVF coarse routing (ivf_topk /
    ivf_nprobe_curve cover the float path) over RESIDUAL product-
    quantized codes (pq_retrain_int_exact covers codebook quality),
    scored by ADC — per query, one small lookup table of
    (probed cell, subspace, code) -> squared distance, so candidate
    scoring is m table lookups + adds per candidate instead of a
    d-dimensional scan.

    Everything lives in the int8 lattice so both engines re-derive it
    exactly: coarse centroids are the ``n_cells`` smallest-id vectors'
    int8 quantizations; every vector is assigned to its nearest cell
    by exact integer squared-L2 (ties to the lower cell index); PQ
    codebooks per subspace are the RESIDUALS (vector minus its cell
    centroid — exact BIGINTs) of the ``k_pq`` smallest-id vectors;
    codes are integer-argmin assignments (ties to the lower code).
    Queries (``vec_id % query_mod == 0``, corpus members, self
    excluded) probe their ``n_probe`` nearest cells, compute their
    residual against EACH probed cell's centroid, and rank candidates
    by the exact ADC sum with (adc_dist, neighbor_id) tie-breaks.

    With ``rerank_r`` set, the production refinement step runs: the
    ADC shortlist of the R best candidates is RESCORED by exact
    full-dimension int8 L2 and the final rank comes from that exact
    distance (adc_rank is kept as evidence of where each survivor sat
    before refinement) — recall then depends only on the true
    neighbors REACHING the shortlist, not on PQ distinguishing them.

    Returns one row per (query, rank<=k): (query_id, rank,
    neighbor_id, cell, adc_dist[, adc_rank], exact_dist, hit) where
    exact_dist is
    the full-dimension int8 L2 of the returned pair and hit marks
    membership in the global exact top-k (the brute-force baseline —
    the audit's cost is bounded by the fixed query sample, the same
    contract as emb_ann_topk's recall floor).

    Scale: the corpus is scanned once (quantize -> assign -> encode,
    each a broadcast join against n_cells / m*k_pq rider rows); the
    candidate join is keyed on cell (1/n_cells of the corpus per
    probe, the IVF point); the LUT is |queries| * n_probe * m * k_pq
    rows — constant per query. No all-pairs stage outside the
    fixed-sample exact baseline."""
    dim = m * d
    # .cache(), not localCheckpoint: global windows run downstream on
    # the limit-reduced riders and the advisor must still see the
    # aggregate lineage (the r9 rule); qz feeds the assignment, the
    # query sample, and the exact baseline — without the cache the
    # plan re-derives the quantization per consumer (measured 19
    # FileScans at sf0.01; 3 after).
    qz = (
        quantize_int8(_spread(corpus), vec_col=vec_col)
        .select(
            F.col(id_col),
            F.transform(F.col("q8"), lambda y: y.cast("long")).alias("q"),
        )
        .cache()
    )
    wseed = Window.orderBy(id_col)
    coarse = (
        qz.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(wseed) - 1).cast("int").alias("c"),
            F.col("q").alias("cq"),
        )
    )

    def int_l2(a, b) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    wcell = Window.partitionBy(id_col).orderBy("dist2", "c")
    asg = (
        qz.crossJoin(F.broadcast(coarse))
        .select(
            F.col(id_col),
            "q",
            "c",
            "cq",
            int_l2(F.col("q"), F.col("cq")).alias("dist2"),
        )
        .withColumn("rn", F.row_number().over(wcell))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            "q",
            F.col("c").alias("cell"),
            F.zip_with(
                F.col("q"), F.col("cq"), lambda x, y: x - y
            ).alias("r"),
        )
        .cache()  # feeds seeds, the per-subspace encode, and the
        # cell-keyed candidate join — one assignment pass, three reads
    )
    subs_expr = (
        f"explode(transform(sequence(0, {m - 1}), "
        f"j -> struct(j AS j, slice({{col}}, j*{d}+1, {d}) AS sv)))"
    )
    wpq = Window.orderBy(id_col)
    seeds = (
        asg.orderBy(id_col)
        .limit(k_pq)
        .select(
            (F.row_number().over(wpq) - 1).cast("int").alias("code"),
            F.col("r").alias("sr"),
        )
    )
    ssub = (
        seeds.select(
            "code", F.expr(subs_expr.format(col="sr")).alias("e")
        )
        .select(
            "code",
            F.col("e.j").cast("int").alias("j"),
            F.col("e.sv").alias("csv"),
        )
        .cache()  # m*k_pq codebook rows, read by encode + both LUTs
    )
    rsub = asg.select(
        F.col(id_col), F.expr(subs_expr.format(col="r")).alias("e")
    ).select(
        F.col(id_col),
        F.col("e.j").cast("int").alias("j"),
        F.col("e.sv").alias("sv"),
    )
    wenc = Window.partitionBy(id_col, "j").orderBy("d2", "code")
    enc = (
        rsub.join(F.broadcast(ssub), "j")
        .select(
            F.col(id_col),
            "j",
            "code",
            int_l2(F.col("sv"), F.col("csv")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), "j", "code")
    )
    # --- query side ---
    queries = qz.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col("q").alias("qq")
    )
    wprobe = Window.partitionBy("query_id").orderBy("dist2", "c")
    qprobe = (
        queries.crossJoin(F.broadcast(coarse))
        .select(
            "query_id",
            "qq",
            "c",
            "cq",
            int_l2(F.col("qq"), F.col("cq")).alias("dist2"),
        )
        .withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= n_probe)
        .select(
            "query_id",
            F.col("c").alias("cell"),
            F.zip_with(
                F.col("qq"), F.col("cq"), lambda x, y: x - y
            ).alias("qr"),
        )
    )
    qrsub = qprobe.select(
        "query_id",
        "cell",
        F.expr(subs_expr.format(col="qr")).alias("e"),
    ).select(
        "query_id",
        "cell",
        F.col("e.j").cast("int").alias("j"),
        F.col("e.sv").alias("sv"),
    )
    lut = qrsub.join(F.broadcast(ssub), "j").select(
        "query_id",
        "cell",
        "j",
        "code",
        int_l2(F.col("sv"), F.col("csv")).alias("d2"),
    )
    cand = (
        qprobe.select("query_id", "cell")
        .join(asg.select(F.col(id_col).alias("neighbor_id"), "cell"), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    adc = (
        cand.join(
            enc.select(F.col(id_col).alias("neighbor_id"), "j", "code"),
            "neighbor_id",
        )
        .join(lut, ["query_id", "cell", "j", "code"])
        .groupBy("query_id", "neighbor_id", "cell")
        .agg(F.sum("d2").cast("bigint").alias("adc_dist"))
    )
    wtop = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    if rerank_r is not None:
        # --- exact re-ranking: ADC shortlist of R, int8-rescored ---
        qvecs_r = qz.select(
            F.col(id_col).alias("neighbor_id"), F.col("q").alias("nq")
        )
        short = (
            adc.withColumn(
                "adc_rank", F.row_number().over(wtop).cast("int")
            )
            .filter(F.col("adc_rank") <= rerank_r)
            .join(queries, "query_id")
            .join(qvecs_r, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                "cell",
                "adc_dist",
                "adc_rank",
                int_l2(F.col("qq"), F.col("nq")).cast("bigint").alias(
                    "exact_dist"
                ),
            )
        )
        wrr = Window.partitionBy("query_id").orderBy(
            "exact_dist", "neighbor_id"
        )
        top = short.withColumn(
            "rank", F.row_number().over(wrr).cast("int")
        ).filter(F.col("rank") <= k)
    else:
        top = adc.withColumn(
            "rank", F.row_number().over(wtop).cast("int")
        ).filter(F.col("rank") <= k)
    # --- exact baseline: full-dim int8 L2, global top-k ---
    pairs = queries.crossJoin(
        qz.select(F.col(id_col).alias("_nid"), F.col("q").alias("_nq"))
    ).filter(F.col("_nid") != F.col("query_id"))
    wex = Window.partitionBy("query_id").orderBy("edist", "_nid")
    exact = (
        pairs.select(
            "query_id",
            "_nid",
            int_l2(F.col("qq"), F.col("_nq")).alias("edist"),
        )
        .withColumn("rn", F.row_number().over(wex))
        .filter(F.col("rn") <= k)
        .select("query_id", "_nid")
    )
    if rerank_r is not None:
        return top.join(
            exact,
            (top["query_id"] == exact["query_id"])
            & (top["neighbor_id"] == exact["_nid"]),
            "left",
        ).select(
            top["query_id"],
            "rank",
            top["neighbor_id"],
            F.col("cell").cast("int").alias("cell"),
            "adc_dist",
            "adc_rank",
            "exact_dist",
            exact["_nid"].isNotNull().alias("hit"),
        )
    qvecs = qz.select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("nq")
    )
    return (
        top.join(queries, "query_id")
        .join(qvecs, "neighbor_id")
        .join(
            exact,
            (top["query_id"] == exact["query_id"])
            & (top["neighbor_id"] == exact["_nid"]),
            "left",
        )
        .select(
            top["query_id"],
            "rank",
            top["neighbor_id"],
            F.col("cell").cast("int").alias("cell"),
            "adc_dist",
            int_l2(F.col("qq"), F.col("nq")).cast("bigint").alias(
                "exact_dist"
            ),
            exact["_nid"].isNotNull().alias("hit"),
        )
    )
