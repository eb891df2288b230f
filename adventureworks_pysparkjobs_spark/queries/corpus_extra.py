"""Round-4 corpus operators beyond the pinned driver window: exact
stratified sampling and inverted-index construction. Same local oracle
gate as everything else (tests/test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as TX
from ..operators.sampling import stratified_sample
from ..sources.corpus import load_table
from .catalog import query

# Mirrors queries/docs.py:_TOKS (operators/text.py:tokens).
_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"


@query(
    "doc_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM ranked
    WHERE rn <= FLOOR(0.3 * CAST(n AS DOUBLE))
    """,
    tags=("sampling", "stratified", "exact-quota", "window"),
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 30%-per-source stratified sample
    (operators/sampling.py:stratified_sample): every stratum keeps
    exactly floor(0.3 * n) documents, chosen by deterministic md5
    order — where hash-threshold sampling (doc_sampling_pipeline)
    wobbles binomially per stratum. Rank and stratum size share one
    shuffle; membership is a pure function of doc_id, so the SQL oracle
    replays the quota exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return stratified_sample(
        docs, group_col="source", frac=0.3, key_col="doc_id"
    )


@query(
    "corpus_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, t.token
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents),
           unnest(toks) AS t(token)
    ),
    df_tbl AS (
      SELECT token, COUNT(*) AS doc_freq
      FROM tok GROUP BY token
      HAVING COUNT(*) BETWEEN 3 AND 200
    )
    SELECT d.token, d.doc_freq,
           array_to_string(list_sort(list(t.doc_id))[1:20], ',')
             AS postings_csv
    FROM tok t JOIN df_tbl d ON t.token = d.token
    GROUP BY d.token, d.doc_freq
    """,
    tags=("text", "index", "postings", "search"),
)
def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token -> posting-list index (operators/text.py:inverted_index)
    with df in [3, 200] and postings capped at 20 ids: document
    frequency is computed count-only FIRST and out-of-band tokens are
    dropped before any posting list materializes, so stop-token lists
    never exist anywhere in the plan. The capped CSV posting string is
    the engine-portable export shape the oracle reproduces exactly
    (sorted ids, same slice)."""
    return TX.inverted_index(
        load_table(spark, sf_dir, "documents"),
        min_df=3,
        max_df=200,
        max_postings=20,
    )


@query(
    "doc_dsir_weights",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(regexp_split_to_array(trim(text),
                 '\\s+'), x -> x <> ''), x -> lower(x)) AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, f FROM toks, unnest(t) AS u(f)
      UNION ALL
      SELECT doc_id, f FROM (
        SELECT doc_id,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])
                    ELSE CAST([] AS VARCHAR[]) END AS bg
        FROM toks
      ), unnest(bg) AS u(f)
    ),
    fb AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('dsir' || f), 1, 4) AS INTEGER)
               % 1024 AS b
      FROM feats
    ),
    tb AS (SELECT b, COUNT(*) AS ct FROM fb WHERE doc_id % 3 = 0
           GROUP BY 1),
    db AS (SELECT doc_id, b, COUNT(*) AS n_b FROM fb GROUP BY 1, 2),
    scored AS (
      SELECT db.doc_id, SUM(db.n_b) AS n_features,
             SUM(CASE WHEN tb.ct > 0 THEN db.n_b ELSE 0 END)
               AS n_target_hits
      FROM db LEFT JOIN tb USING (b) GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_features, 0) AS BIGINT) AS n_features,
           CAST(COALESCE(s.n_target_hits, 0) AS BIGINT) AS n_target_hits
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
    tags=("sampling", "dsir", "importance", "ngram-features"),
)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (operators/sampling.py
    dsir_weights): hashed unigram+bigram bucket counts score every
    document against a target subset (here the doc_id%3==0 slice
    standing in for a quality domain). The engine-portable MD5 buckets
    make the exact feature/hit counts cross-engine checkable; the
    ln-based logweight column is dropped here (libm last-ulp, same
    declared rule as doc_lm_quality) and pinned by tests/test_dsir.py
    in-engine instead."""
    from ..operators.sampling import dsir_weights

    doc = load_table(spark, sf_dir, "documents")
    target = doc.filter(F.col("doc_id") % 3 == 0)
    return dsir_weights(doc, target, buckets=1024).drop("logweight")


@query(
    "corpus_export_shards",
    bench=True,
    oracle="""
    WITH ordered AS (
      SELECT doc_id, text,
             ROW_NUMBER() OVER (
               ORDER BY md5('shard' || CAST(doc_id AS VARCHAR)), doc_id
             ) - 1 AS row_id
      FROM documents
    ),
    sharded AS (
      SELECT row_id, row_id // 64 AS shard_id,
             md5(CAST(doc_id AS VARCHAR) || '|' || text) AS h,
             strlen(text) AS b
      FROM ordered
    )
    SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(b) AS BIGINT) AS n_bytes,
           sha256(string_agg(h, '' ORDER BY row_id)) AS digest
    FROM sharded GROUP BY 1
    """,
    tags=("export", "shards", "manifest", "integrity"),
)
def corpus_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest (operators/sampling.py
    assign_shards + shard_manifest): documents take the deterministic
    epoch-shuffle order, fill 64-row shards, and each shard gets a
    verifiable digest (sha256 over row-md5s in row order) plus exact
    row/byte counts — the manifest a training loader checks before
    trusting a shard, reproducible bit-for-bit on any cluster size or
    engine. Shard ids ride assign_row_ids (no single-partition
    window); the digest fold sorts each shard's bounded row set."""
    from ..operators.sampling import assign_shards, shard_manifest

    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sharded = assign_shards(doc, "doc_id", shard_rows=64)
    return shard_manifest(sharded, "doc_id", ["text"])


@query(
    "emb_label_centroids",
    oracle="""
    WITH e AS (
      SELECT label, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xi
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    )
    SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(SUM(xi) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM e GROUP BY label, pos
    """,
    tags=("similarity", "centroid", "vector-agg", "integer-exact"),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.py
    label_centroids): element-wise class prototypes via integer-
    quantized exact summation — the float-sum order problem solved the
    same way graph.pagerank solves it, so the centroids oracle-check
    bitwise. Long format (label, pos) keys one uniform shuffle."""
    from ..operators.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroids(emb, "label", "embedding")


@query(
    "emb_centroid_outliers",
    oracle="""
    WITH e AS (
      SELECT vec_id AS vid, label, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xi
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    sums AS (
      SELECT label, pos, CAST(SUM(xi) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY label, pos
    ),
    pv AS (
      SELECT e.vid, e.label, sums.n,
             SUM(CAST(e.xi * sums.n - sums.s AS DECIMAL(19,0))
                 * CAST(e.xi * sums.n - sums.s AS DECIMAL(19,0))) AS d2i
      FROM e JOIN sums ON sums.label = e.label AND sums.pos = e.pos
      GROUP BY e.vid, e.label, sums.n
    ),
    d AS (
      SELECT vid, label,
             CAST(d2i AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * 1000000.0 * 1000000.0) AS dist2
      FROM pv
    )
    SELECT vid AS vec_id, label, dist2, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT vid, label, dist2,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dist2 DESC, vid) AS rnk
      FROM d
    ) WHERE rnk <= 5
    """,
    tags=("similarity", "outliers", "centroid", "integer-exact"),
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label outlier screen (operators/similarity.py
    centroid_outliers): the 5 vectors farthest from their label's
    centroid, ranked by an integer-exact scaled squared distance
    (Σ(xi·n − S)²) so the ordering — and the reported doubles —
    oracle-check bitwise. Centroid table is labels×dim (broadcast);
    the top-k window group-limits before its exchange."""
    from ..operators.similarity import centroid_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_outliers(emb, "label", "embedding", "vec_id", k=5)


@query(
    "corpus_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT list_transform({_TOKS}, x -> lower(x)) AS t FROM documents
    ),
    bg AS (
      SELECT u.s.w1 AS w1, u.s.w2 AS w2
      FROM (
        SELECT CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                         i -> {{'w1': t[i], 'w2': t[i+1]}})
                    ELSE [] END AS pairs
        FROM toks
      ), unnest(pairs) AS u(s)
    ),
    uni AS (SELECT u.w AS w FROM toks, unnest(t) AS u(w)),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words FROM uni),
    uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM uni GROUP BY w),
    bc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM bg GROUP BY w1, w2 HAVING COUNT(*) >= 5
    )
    SELECT bc.w1, bc.w2, bc.n_ab,
           u1.n_w AS n_a, u2.n_w AS n_b,
           (CAST(bc.n_ab AS DOUBLE) * nt.n_words)
             / (CAST(u1.n_w AS DOUBLE) * u2.n_w) AS pmi_ratio
    FROM bc
    JOIN uc u1 ON u1.w = bc.w1
    JOIN uc u2 ON u2.w = bc.w2
    CROSS JOIN nt
    ORDER BY pmi_ratio DESC, bc.w1, bc.w2
    LIMIT 50
    """,
    tags=("text", "collocations", "pmi", "phrase-mining"),
)
def corpus_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations by PMI ratio (operators/text.py
    collocations): phrase mining with exact integer counts and ONE
    IEEE division per score, so ranking and values oracle-check
    bitwise (ln deliberately left to the caller — it is monotone, so
    the ranking is the same). Per-row bigram construction, two
    map-combined count shuffles, TakeOrderedAndProject top-k."""
    from ..operators.text import collocations

    doc = load_table(spark, sf_dir, "documents")
    return collocations(doc, "text", min_count=5, top_k=50)


@query(
    "emb_nearest_centroid_confusion",
    bench=True,
    oracle="""
    WITH e AS (
      SELECT vec_id AS vid, label AS true_label, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xi
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    sums AS (
      SELECT true_label AS cand, pos, CAST(SUM(xi) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY true_label, pos
    ),
    scored AS (
      SELECT e.vid, e.true_label, sums.cand,
             CAST(SUM(CAST(e.xi * sums.n - sums.s AS DECIMAL(19,0))
                      * CAST(e.xi * sums.n - sums.s AS DECIMAL(19,0)))
                  AS DOUBLE)
               / (CAST(sums.n AS DOUBLE) * CAST(sums.n AS DOUBLE)
                  * 1000000.0 * 1000000.0) AS dist2
      FROM e JOIN sums ON sums.pos = e.pos
      GROUP BY e.vid, e.true_label, sums.cand, sums.n
    ),
    pred AS (
      SELECT vid, true_label, cand AS pred_label
      FROM (
        SELECT vid, true_label, cand,
               ROW_NUMBER() OVER (PARTITION BY vid, true_label
                                  ORDER BY dist2, cand) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    """,
    tags=("similarity", "classification", "confusion", "integer-exact"),
)
def emb_nearest_centroid_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nearest-centroid confusion matrix (operators/similarity.py
    nearest_centroid_confusion): every vector classified to its
    closest label prototype under the integer-exact distance scheme,
    cross-tabbed against the true label. The L×dim stats table
    broadcasts; the L-fold scoring expansion and the argmin fold are
    the documented scale trade."""
    from ..operators.similarity import nearest_centroid_confusion

    emb = load_table(spark, sf_dir, "embeddings")
    return nearest_centroid_confusion(emb, "label", "embedding", "vec_id")


@query(
    "doc_quality_quartiles",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS rid,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    b AS (
      SELECT CAST((rid * 4) // n AS INTEGER) AS quartile,
             n_chars
      FROM ranked
    )
    SELECT quartile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM b GROUP BY quartile
    """,
    tags=("sampling", "quantile", "curriculum", "global-order"),
)
def doc_quality_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global quartile bucketing of documents by length — the
    curriculum-binning primitive — WITHOUT the single-partition NTILE
    window: ranks come from sampling.assign_row_ids (range-partitioned
    sort + per-partition numbering + broadcast offsets), so the global
    order costs no one-task funnel at 100 TB; bucket = rid*4 div N is
    a pure expression over the id. The oracle replays the same formula
    with a plain ROW_NUMBER."""
    from ..operators.sampling import assign_row_ids

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    ranked = assign_row_ids(doc, order_by=["n_chars", "doc_id"], id_name="rid")
    n_total = ranked.groupBy().agg(F.count("*").alias("n"))
    return (
        ranked.join(F.broadcast(n_total))
        .select(
            F.expr("CAST((rid * 4) div n AS INT)").alias("quartile"),
            "n_chars",
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


@query(
    "corpus_warc_roundtrip",
    oracle="""
    SELECT doc_id, text AS text_rt,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("connector", "warc", "python-datasource", "multimodal"),
)
def corpus_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC connector round trip (sources/warc.py — public Python Data
    Source API): export the documents table as gzipped WARC shards (one
    per partition, deterministic record ids), read them back with
    ``spark.read.format("warc")`` (one task per shard, streaming record
    parse), and reproduce the original (doc_id, text, byte-length) —
    proving the crawl-ingest seam is lossless. UTF-8 payload bytes are
    the compared length so the oracle (DuckDB ``strlen`` = bytes) is
    engine-identical."""
    import tempfile

    from ..sources.warc import register_warc

    register_warc(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="warc_rt_")
    (
        docs.select(
            F.concat(
                F.lit("http://corpus.local/doc/"), F.col("doc_id")
            ).alias("url"),
            F.lit("2026-01-01 00:00:00").cast("timestamp").alias(
                "warc_date"
            ),
            F.lit("text/plain").alias("content_type"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
        .repartition(4)
        .write.format("warc")
        .mode("append")
        .save(tmp)
    )
    back = spark.read.format("warc").load(tmp)
    return back.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias(
            "doc_id"
        ),
        F.decode("payload", "UTF-8").alias("text_rt"),
        F.col("content_length").alias("n_bytes"),
    )


@query(
    "emb_semantic_dedup",
    bench=True,
    oracle="""
    WITH e AS (
      SELECT vec_id, label, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xi
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    n AS (
      SELECT vec_id, CAST(SUM(xi * xi) AS BIGINT) AS nrm
      FROM e GROUP BY 1
    ),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
             CAST(SUM(a.xi * b.xi) AS BIGINT) AS dot
      FROM e a
      JOIN e b ON a.label = b.label AND a.pos = b.pos
              AND a.vec_id < b.vec_id
      GROUP BY 1, 2, 3
    ),
    losers AS (
      SELECT p.id_b AS vec_id,
             CAST(COUNT(*) AS BIGINT) AS n_dup_lower
      FROM p
      JOIN n na ON na.vec_id = p.id_a
      JOIN n nb ON nb.vec_id = p.id_b
      WHERE p.dot > 0
        AND CAST(p.dot AS HUGEINT) * p.dot * 10000
            >= CAST(na.nrm AS HUGEINT) * nb.nrm * 1225
      GROUP BY 1
    )
    SELECT emb.vec_id, emb.label AS cluster,
           COALESCE(losers.n_dup_lower, 0) AS n_dup_lower,
           losers.n_dup_lower IS NULL AS is_kept
    FROM embeddings emb
    LEFT JOIN losers ON losers.vec_id = emb.vec_id
    """,
    tags=("similarity", "semantic-dedup", "semdedup", "integer-exact"),
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication
    (operators/similarity.py:semantic_dedup): within each cluster
    (label = the injected coarse assignment), a vector is dropped when
    a LOWER-id vector sits within the cosine threshold — greedy
    keep-smallest-id survivors. The sqrt-free integer threshold test
    makes every verdict bit-identical to the oracle. Threshold 0.35 is
    corpus-calibrated (max within-label cosine here is ~0.475 — on
    real embedding corpora the conventional value is ~0.95)."""
    from ..operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", "label",
        threshold_num=35, threshold_den=100,
    )


@query(
    "doc_quality_classifier",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk FROM
        (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t <> '') AS toks
         FROM documents), unnest(toks) AS t(tk)
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('qc:' || tk), 1, 4) AS INTEGER)
               % 4096 AS feature
      FROM tok
    ),
    tf AS (
      SELECT doc_id, feature, CAST(COUNT(*) AS BIGINT) AS tf
      FROM feat GROUP BY 1, 2
    ),
    w AS (
      SELECT DISTINCT feature,
             CAST(CAST('0x' || substr(md5('w:' || feature), 1, 4)
                       AS BIGINT) % 2001 - 1000 AS BIGINT) AS w_scaled
      FROM feat
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf.tf * w.w_scaled) AS BIGINT) AS logit_scaled,
           SUM(tf.tf * w.w_scaled) > 0 AS is_positive
    FROM tf JOIN w ON w.feature = tf.feature
    GROUP BY 1
    """,
    tags=("text", "classifier", "hashing-trick", "quality-filter"),
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality filter scored as pure expressions
    (operators/lm.py:hashed_linear_scores): MD5 hashing-trick features,
    exact integer tf·w logits against a bucket-count weight table
    (pseudo_weights here — the injected-model seam production fills
    with trained weights), sign-threshold verdicts. No UDF, no model
    runtime, bit-identical across engines."""
    from ..operators.lm import hashed_linear_scores, pseudo_weights

    docs = load_table(spark, sf_dir, "documents")
    return hashed_linear_scores(
        docs, pseudo_weights(spark, 4096, "w", 1000)
    )


@query(
    "corpus_warc_stream_ingest",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 0 THEN DATE '2026-03-01'
                ELSE DATE '2026-03-02' END AS crawl_date,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1
    """,
    tags=("connector", "warc", "streaming", "exactly-once"),
)
def corpus_warc_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING WARC ingestion under the oracle gate: documents export
    as two dated WARC shard waves, `ingest_warc_stream` (checkpointed,
    exactly-once) drains them into a parquet lake in TWO successive
    availableNow runs — the second run sees only the late shard — and
    the landed lake's per-crawl-date stats must reproduce the source
    table. Exercises the DataSourceStreamReader offset protocol,
    checkpoint resume, and the foreachBatch lake sink end-to-end."""
    import tempfile

    from ..jobs.ingest import ingest_warc_stream
    from ..sources.warc import register_warc

    register_warc(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    root = tempfile.mkdtemp(prefix="warc_stream_")
    landing, lake, ckpt = (
        f"{root}/landing", f"{root}/lake", f"{root}/ckpt",
    )

    def wave(parity: int, date: str):
        (
            docs.where(F.col("doc_id") % 2 == parity)
            .select(
                F.concat(
                    F.lit("http://corpus.local/doc/"), F.col("doc_id")
                ).alias("url"),
                F.lit(date).cast("timestamp").alias("warc_date"),
                F.lit("text/plain").alias("content_type"),
                F.encode(F.col("text"), "UTF-8").alias("payload"),
            )
            .repartition(2)
            .write.format("warc")
            .mode("append")
            .save(landing)
        )
        ingest_warc_stream(spark, landing, lake, ckpt)

    wave(0, "2026-03-01 00:00:00")  # first shard wave + drain
    wave(1, "2026-03-02 00:00:00")  # late wave: resume ingests only it
    landed = spark.read.parquet(lake)
    return landed.groupBy("crawl_date").agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum("content_length").cast("long").alias("n_bytes"),
    )


_KM_K = 8
_KM_ITERS = 3


def _kmeans_cte(k: int, iters: int) -> str:
    """Unrolled fixed-iteration Lloyd's k-means in ANSI SQL — one CTE
    pair (assign, update) per iteration mirroring the Spark operator's
    integer state exactly (operators/similarity.py kmeans_assign), the
    pagerank-oracle pattern applied to clustering."""
    head = f"""
    WITH e AS (
      SELECT vec_id AS vid, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xi
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    ids AS (SELECT DISTINCT vid FROM e ORDER BY vid LIMIT {k}),
    c0 AS (
      SELECT e.vid AS cid, e.pos, e.xi AS s, CAST(1 AS BIGINT) AS n
      FROM e JOIN ids ON ids.vid = e.vid
    )"""
    parts = []
    for i in range(1, iters + 1):
        parts.append(f""",
    sc{i} AS (
      SELECT e.vid, c.cid, c.n,
             SUM(CAST(e.xi * c.n - c.s AS DECIMAL(19,0))
                 * CAST(e.xi * c.n - c.s AS DECIMAL(19,0))) AS d2i
      FROM e JOIN c{i - 1} c ON c.pos = e.pos
      GROUP BY 1, 2, 3
    ),
    a{i} AS (
      SELECT vid, cid AS cluster, dist2 FROM (
        SELECT vid, cid,
               CAST(d2i AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * 1000000.0 * 1000000.0) AS dist2,
               ROW_NUMBER() OVER (
                 PARTITION BY vid
                 ORDER BY CAST(d2i AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               * 1000000.0 * 1000000.0), cid) AS rn
        FROM sc{i}
      ) WHERE rn = 1
    )""")
        if i < iters:
            parts.append(f""",
    ns{i} AS (
      SELECT a.cluster AS cid, e.pos, CAST(SUM(e.xi) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS n2
      FROM e JOIN a{i} a ON a.vid = e.vid
      GROUP BY 1, 2
    ),
    c{i} AS (
      SELECT p.cid, p.pos, COALESCE(ns.s2, p.s) AS s,
             COALESCE(ns.n2, p.n) AS n
      FROM c{i - 1} p
      LEFT JOIN ns{i} ns ON ns.cid = p.cid AND ns.pos = p.pos
    )""")
    return head + "".join(parts)


def _kmeans_oracle(k: int, iters: int) -> str:
    return _kmeans_cte(k, iters) + f"""
    SELECT vid AS vec_id, cluster, dist2 FROM a{iters}
    """


@query(
    "emb_kmeans_clusters",
    oracle=_kmeans_oracle(_KM_K, _KM_ITERS),
    tags=("similarity", "kmeans", "iterative", "integer-exact"),
)
def emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (operators/similarity.py
    kmeans_assign) with a bit-exact cross-engine oracle: centroid
    state stays the exact integer (sum, count) pair, distances are one
    IEEE division of exact DECIMAL numerators, ties break to the
    smaller centroid id — so every assignment of every iteration is
    engine-identical and the oracle replays all iterations in unrolled
    SQL (the pagerank pattern applied to clustering). Per iteration:
    one join against the k x dim state table, one argmin fold, one
    map-combined state sum."""
    from ..operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(
        emb, "vec_id", "embedding", k=_KM_K, iterations=_KM_ITERS
    )


@query(
    "emb_semdedup_kmeans_pipeline",
    bench=True,
    oracle=_kmeans_cte(_KM_K, _KM_ITERS) + f""",
    nrm AS (
      SELECT vid, CAST(SUM(xi * xi) AS BIGINT) AS nrm
      FROM e GROUP BY 1
    ),
    ec AS (
      SELECT e.vid, a.cluster, e.pos, e.xi
      FROM e JOIN a{_KM_ITERS} a ON a.vid = e.vid
    ),
    p AS (
      SELECT x.vid AS id_a, y.vid AS id_b, x.cluster,
             CAST(SUM(x.xi * y.xi) AS BIGINT) AS dot
      FROM ec x
      JOIN ec y ON x.cluster = y.cluster AND x.pos = y.pos
              AND x.vid < y.vid
      GROUP BY 1, 2, 3
    ),
    losers AS (
      SELECT p.id_b AS vid, CAST(COUNT(*) AS BIGINT) AS n_dup_lower
      FROM p
      JOIN nrm na ON na.vid = p.id_a
      JOIN nrm nb ON nb.vid = p.id_b
      WHERE p.dot > 0
        AND CAST(p.dot AS HUGEINT) * p.dot * 10000
            >= CAST(na.nrm AS HUGEINT) * nb.nrm * 1225
      GROUP BY 1
    )
    SELECT a.vid AS vec_id, a.cluster,
           COALESCE(l.n_dup_lower, 0) AS n_dup_lower,
           l.n_dup_lower IS NULL AS is_kept
    FROM a{_KM_ITERS} a LEFT JOIN losers l ON l.vid = a.vid
    """,
    tags=("similarity", "semdedup", "kmeans", "composed", "pipeline"),
)
def emb_semdedup_kmeans_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full SemDeDup recipe END-TO-END under one chained oracle:
    k-means clusters the corpus (kmeans_assign, 3 exact iterations),
    then semantic_dedup runs its within-cluster pairwise scan on the
    LEARNED clusters instead of injected labels — two iterative/exact
    operators composed, every intermediate bit-identical across
    engines (the corpus_training_pipeline composed-oracle approach
    applied to the vector surface). The pairwise cost is bounded by
    the k-means partition: n²/k for balanced clusters."""
    from ..operators.similarity import kmeans_assign, semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_assign(
        emb, "vec_id", "embedding", k=_KM_K, iterations=_KM_ITERS
    ).select("vec_id", "cluster")
    return semantic_dedup(
        emb.join(clusters, "vec_id"),
        "vec_id",
        "embedding",
        "cluster",
        threshold_num=35,
        threshold_den=100,
    )


@query(
    "corpus_heavy_terms_cms",
    oracle=f"""
    WITH tok AS (
      SELECT t.tk FROM
        (SELECT {_TOKS} AS toks FROM documents), unnest(toks) AS t(tk)
    ),
    hs AS (SELECT unnest([0, 1, 2, 3]) AS h),
    grid AS (
      SELECT hs.h,
             CAST('0x' || substr(md5(CAST(hs.h AS VARCHAR) || '|' || tok.tk),
                                 1, 8) AS BIGINT) % 1024 AS bucket,
             COUNT(*) AS c
      FROM tok, hs GROUP BY 1, 2
    ),
    cand AS (
      SELECT tk AS token, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM tok GROUP BY tk
      ORDER BY exact_n DESC, token LIMIT 50
    ),
    probes AS (
      SELECT c.token, c.exact_n, hs.h,
             CAST('0x' || substr(md5(CAST(hs.h AS VARCHAR) || '|' || c.token),
                                 1, 8) AS BIGINT) % 1024 AS bucket
      FROM cand c, hs
    )
    SELECT p.token, p.exact_n,
           CAST(MIN(COALESCE(g.c, 0)) AS BIGINT) AS cms_n,
           MIN(COALESCE(g.c, 0)) >= p.exact_n AS no_underestimate
    FROM probes p LEFT JOIN grid g ON g.h = p.h AND g.bucket = p.bucket
    GROUP BY p.token, p.exact_n
    """,
    tags=("sketch", "count-min", "heavy-hitters", "mergeable"),
    bench=True,
)
def corpus_heavy_terms_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy-hitter audit over the corpus vocabulary
    (operators/sketches.py:cms_build/cms_estimate): a fixed-size 4×1024
    mergeable counter grid replaces the vocabulary-sized exact frequency
    table, and the top-50 terms' sketch estimates are checked against
    their exact counts (``no_underestimate`` is the CMS guarantee —
    estimates only ever exceed truth, by hash collisions).

    Scale: the grid is O(depth·width) regardless of vocabulary size and
    sums cell-wise across corpus shards; partial aggregation bounds the
    build shuffle at depth·width cells per partition. Estimation joins
    the bounded grid (AQE broadcasts it) — the corpus is never
    rescanned per probe. The exact-count branch exists only for the
    audit at test scale; production keeps the grid alone. Hashes are
    the engine-portable md5-hex-prefix idiom, bit-identical in DuckDB.
    """
    from ..operators.sketches import cms_build, cms_estimate

    doc = load_table(spark, sf_dir, "documents")
    tok = doc.select(F.explode(TX.tokens("text")).alias("token"))
    grid = cms_build(tok, "token", depth=4, width=1024)
    cand = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token"))
        .limit(50)
    )
    est = cms_estimate(grid, cand.select("token"), "token", depth=4,
                       width=1024)
    return cand.join(est, "token").select(
        "token",
        "exact_n",
        F.col("cms_count").cast("long").alias("cms_n"),
        (F.col("cms_count") >= F.col("exact_n")).alias("no_underestimate"),
    )


@query(
    "doc_pps_weighted_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS weight,
             md5('pps' || CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ),
    tot AS (SELECT SUM(weight) AS tw FROM w),
    c AS (
      SELECT doc_id, weight,
             SUM(weight) OVER (
               ORDER BY hkey, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM w
    )
    SELECT doc_id, weight,
           CAST((CAST(100 AS HUGEINT) * cum) // tw
                - (CAST(100 AS HUGEINT) * (cum - weight)) // tw
                AS BIGINT) AS n_picks
    FROM c, tot
    WHERE (CAST(100 AS HUGEINT) * cum) // tw
          - (CAST(100 AS HUGEINT) * (cum - weight)) // tw >= 1
    """,
    tags=("sampling", "pps", "weighted", "integer-exact"),
)
def doc_pps_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: k=100 systematic PPS picks with
    token count as the weight (operators/sampling.py:
    pps_systematic_sample) — longer documents are proportionally more
    likely, expected picks = k·w/W, Σ n_picks = k exactly. The pick
    decision is pure DECIMAL·div integer arithmetic over an
    md5-shuffled cumulative-weight line, so selection is bit-identical
    to the oracle (no u^(1/w) transcendental keys). The global cumsum
    uses the assign_row_ids shape — range-partitioned sort,
    per-partition windows, broadcast offsets — never a single-partition
    window."""
    from ..operators.sampling import pps_systematic_sample

    doc = load_table(spark, sf_dir, "documents")
    weighted = doc.select(
        "doc_id", TX.token_count("text").cast("long").alias("weight")
    )
    return pps_systematic_sample(
        weighted, "doc_id", "weight", k=100, salt="pps"
    )


# Shared 5-gram shingle CTE body (mirrors queries/docs.py:_shingles_cte).
_SH5 = """
    toks AS (SELECT doc_id, list_filter(
               regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS w
             FROM documents),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             list_aggregate(w[i:i+4], 'string_agg', ' ') AS shingle
      FROM toks, unnest(range(1, len(w) - 3)) AS u(i)
      WHERE len(w) >= 5
    )
"""


@query(
    "doc_dedup_method_overlap",
    oracle=f"""
    WITH {_SH5},
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
    rare AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING COUNT(*) <= 1000),
    pruned AS (SELECT sh.id, sh.shingle FROM sh JOIN rare USING (shingle)),
    jinter AS (
      SELECT a.id AS id1, b.id AS id2, COUNT(*) AS n_inter
      FROM pruned a JOIN pruned b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    jac AS (
      SELECT id1, id2 FROM jinter
      JOIN sizes s1 ON jinter.id1 = s1.id
      JOIN sizes s2 ON jinter.id2 = s2.id
      WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= 0.5
    ),
    sig AS (
      SELECT id, u.seed,
             MIN(md5(CAST(u.seed AS VARCHAR) || ':' || shingle)) AS minhash
      FROM sh, unnest([0,1,2,3,4,5,6,7]) AS u(seed)
      GROUP BY id, u.seed
    ),
    band_key AS (
      SELECT id, CAST(seed // 2 AS INTEGER) AS band,
             string_agg(minhash, '|' ORDER BY minhash) AS band_sig
      FROM sig GROUP BY id, seed // 2
    ),
    mcand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM band_key a JOIN band_key b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
    ),
    minter AS (
      SELECT c.id1, c.id2, COUNT(*) AS n_inter
      FROM mcand c
      JOIN sh a ON a.id = c.id1
      JOIN sh b ON b.id = c.id2 AND b.shingle = a.shingle
      GROUP BY c.id1, c.id2
    ),
    mh AS (
      SELECT id1, id2 FROM minter
      JOIN sizes s1 ON minter.id1 = s1.id
      JOIN sizes s2 ON minter.id2 = s2.id
      WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= 0.5
    ),
    stok AS (SELECT id, md5(shingle) AS h FROM sh),
    per_bit AS (
      SELECT id, u.j,
             SUM(CASE WHEN substr(h, u.j, 1) IN
                      ('8','9','a','b','c','d','e','f')
                      THEN 1 ELSE -1 END) AS s
      FROM stok, unnest(range(1, 33)) AS u(j)
      GROUP BY id, u.j
    ),
    sk AS (
      SELECT id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END,
                            '' ORDER BY j) AS simhash
      FROM per_bit GROUP BY id
    ),
    banded AS (
      SELECT id, simhash, b.band,
             substr(simhash, 1 + b.band * 8, 8) AS band_bits
      FROM sk, unnest([0, 1, 2, 3]) AS b(band)
    ),
    scand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2,
             a.simhash AS sh1, b.simhash AS sh2
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_bits = b.band_bits AND a.id < b.id
    ),
    sim AS (
      SELECT id1, id2 FROM scand
      WHERE len(list_filter(range(1, 33),
            i -> substr(sh1, i, 1) <> substr(sh2, i, 1))) <= 3
    ),
    allp AS (
      SELECT id1, id2 FROM jac
      UNION SELECT id1, id2 FROM mh
      UNION SELECT id1, id2 FROM sim
    )
    SELECT j.id1 IS NOT NULL AS by_jaccard,
           m.id1 IS NOT NULL AS by_minhash,
           s.id1 IS NOT NULL AS by_simhash,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM allp p
    LEFT JOIN jac j ON j.id1 = p.id1 AND j.id2 = p.id2
    LEFT JOIN mh m ON m.id1 = p.id1 AND m.id2 = p.id2
    LEFT JOIN sim s ON s.id1 = p.id1 AND s.id2 = p.id2
    GROUP BY 1, 2, 3
    """,
    tags=("dedup", "diagnostic", "composed", "overlap"),
)
def doc_dedup_method_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which near-dup method catches what: the pair sets of exact
    5-gram Jaccard, MinHash-LSH, and banded SimHash over the same
    corpus, bucketed by membership combination — the coverage
    diagnostic that justifies (or retires) each method in a dedup
    stack. On this fixture all three methods converge on the identical
    25 injected near-dup pairs (one all-true bucket) — full three-way
    agreement, which is itself the diagnostic: at these thresholds no
    method admits a false-positive tail the others reject.
    Each method runs as shipped (operators/dedup.py) and the methods
    share semantics with their individual entries; the flags come from
    left joins of the unioned pair set (never collected sets). At
    corpus scale the three would share one cached shingle frame — here
    each caches its own, bounded by the same posting-list caps."""
    from ..operators import dedup as D

    doc = load_table(spark, sf_dir, "documents")
    # Each method's pair list is referenced TWICE below (the union and
    # its own left join) — uncached, every method's whole candidate
    # pipeline replays per reference (~40 repeated stages over the
    # cached shingle frame at sf0.1). The pair lists are near-dup-count
    # sized (tiny by construction), so one eager cut each makes the
    # union + three flag joins trivial.
    jac = D.ngram_jaccard_pairs(
        doc, n=5, threshold=0.5, max_shingle_df=1000
    ).select("id1", "id2").localCheckpoint()
    mh = D.minhash_lsh_pairs(
        doc, num_hashes=8, bands=4, n=5, threshold=0.5
    ).select("id1", "id2").localCheckpoint()
    sim = D.simhash_pairs(
        doc, bits=32, bands=4, max_hamming=3, n=5
    ).select("id1", "id2").localCheckpoint()
    allp = (
        jac.unionByName(mh).unionByName(sim).distinct()
    )
    flag = lambda f, name: f.withColumn(name, F.lit(True))
    out = (
        allp.join(flag(jac, "by_jaccard"), ["id1", "id2"], "left")
        .join(flag(mh, "by_minhash"), ["id1", "id2"], "left")
        .join(flag(sim, "by_simhash"), ["id1", "id2"], "left")
        .select(
            F.coalesce("by_jaccard", F.lit(False)).alias("by_jaccard"),
            F.coalesce("by_minhash", F.lit(False)).alias("by_minhash"),
            F.coalesce("by_simhash", F.lit(False)).alias("by_simhash"),
        )
    )
    return out.groupBy("by_jaccard", "by_minhash", "by_simhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


@query(
    "corpus_bm25_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    stats AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(w)) AS BIGINT) AS total_len FROM toks),
    tf AS (
      SELECT doc_id, t.tk AS token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks, unnest(w) AS t(tk)
      WHERE t.tk IN ('hash', 'join', 'scan')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ((CAST(tf.tf AS DOUBLE) * CAST('2.2' AS DOUBLE))
              / (CAST(tf.tf AS DOUBLE)
                 + CAST('1.2' AS DOUBLE)
                   * (0.25 + 0.75 * (CAST(s.dl * t.n_docs AS DOUBLE)
                                     / CAST(t.total_len AS DOUBLE)))))
             * ((CAST(t.n_docs - d.df AS DOUBLE) + 0.5)
                / (CAST(d.df AS DOUBLE) + 0.5)) AS sc
      FROM tf
      JOIN stats s USING (doc_id)
      JOIN dfreq d USING (token), tot t
    ),
    piv AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN token = 'hash' THEN sc END), 0.0)
               AS s0,
             COALESCE(MAX(CASE WHEN token = 'join' THEN sc END), 0.0)
               AS s1,
             COALESCE(MAX(CASE WHEN token = 'scan' THEN sc END), 0.0)
               AS s2
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, s0 + s1 + s2 AS bm25
    FROM piv ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    tags=("retrieval", "bm25", "scoring", "topk"),
)
def corpus_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for the query {hash, join, scan} under the
    log-free BM25 score (operators/text.py:bm25_topk): every value is a
    closed-form rational expression over exact integer counts, so
    scores AND ranking are bit-identical to the oracle. tf filters the
    token stream before its shuffle; df and corpus totals broadcast;
    the top-k is TakeOrderedAndProject — no global window."""
    from ..operators.text import bm25_topk

    doc = load_table(spark, sf_dir, "documents")
    return bm25_topk(doc, ["hash", "join", "scan"], k=10)


@query(
    "doc_classifier_calibration",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk FROM
        (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t <> '') AS toks
         FROM documents), unnest(toks) AS t(tk)
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('qc:' || tk), 1, 4) AS INTEGER)
               % 4096 AS feature
      FROM tok
    ),
    tf AS (
      SELECT doc_id, feature, CAST(COUNT(*) AS BIGINT) AS tf
      FROM feat GROUP BY 1, 2
    ),
    w AS (
      SELECT DISTINCT feature,
             CAST(CAST('0x' || substr(md5('w:' || feature), 1, 4)
                       AS BIGINT) % 2001 - 1000 AS BIGINT) AS w_scaled
      FROM feat
    ),
    scores AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf.tf * w.w_scaled) AS BIGINT) AS logit_scaled
      FROM tf JOIN w ON w.feature = tf.feature
      GROUP BY 1
    ),
    binned AS (
      SELECT s.doc_id,
             CAST(FLOOR((CAST(s.logit_scaled AS DOUBLE)
                         / CAST(s.n_tokens AS DOUBLE)) / 25.0) AS BIGINT)
               AS score_bin,
             d.lang = 'en' AS label
      FROM scores s JOIN documents d USING (doc_id)
    )
    SELECT score_bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT_IF(label) AS BIGINT) AS n_label_pos,
           CAST(COUNT_IF(label) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS label_rate
    FROM binned GROUP BY 1
    """,
    tags=("text", "classifier", "calibration", "ml-ops"),
)
def doc_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration report for the hashed linear quality classifier
    (doc_quality_classifier's scorer): per-token-normalized logits
    bucket into fixed-width bins and each bin reports its count and the
    rate of a proxy label (lang='en') — the reliability-diagram table
    that decides whether classifier scores can gate a corpus at a
    chosen threshold. The bin id is floor(double-division / width) in
    BOTH engines (never integer `div`, whose negative-value semantics
    differ: Spark truncates toward zero, DuckDB floors); label_rate is
    one IEEE division of identical integer counts. One extra
    aggregation over the classifier's keyed output — no new scan of
    the corpus."""
    from ..operators.lm import hashed_linear_scores, pseudo_weights

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(
        docs, pseudo_weights(spark, 4096, "w", 1000)
    )
    binned = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        F.floor(
            (
                F.col("logit_scaled").cast("double")
                / F.col("n_tokens").cast("double")
            )
            / F.lit(25.0)
        )
        .cast("long")
        .alias("score_bin"),
        (F.col("lang") == "en").alias("label"),
    )
    return binned.groupBy("score_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.col("label")).cast("long").alias("n_label_pos"),
        (
            F.count_if(F.col("label")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("label_rate"),
    )


@query(
    "lang_temperature_mixture",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM documents GROUP BY lang
    ),
    weighted AS (
      SELECT lang, n_rows,
             CAST(FLOOR(sqrt(CAST(n_rows AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS weight_scaled
      FROM counts
    ),
    tot AS (SELECT CAST(SUM(weight_scaled) AS BIGINT) AS t
            FROM weighted)
    SELECT lang, n_rows, weight_scaled,
           CAST(weight_scaled AS DOUBLE) / CAST(t.t AS DOUBLE) AS rate
    FROM weighted, tot t
    """,
    tags=("sampling", "mixture", "temperature", "multilingual"),
)
def lang_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature mixture over document languages
    (operators/sampling.py:temperature_mixture_rates): rate ∝ √n — the
    low-resource up-weighting recipe for multilingual pretraining.
    Bit-exact because IEEE sqrt is correctly rounded (unlike pow) and
    the normalizer sums exact scaled integers, never floats. On the
    fixture, 'en' holds 43.6% of documents but samples at 30.5% —
    the rebalancing is visible, not degenerate."""
    from ..operators.sampling import temperature_mixture_rates

    doc = load_table(spark, sf_dir, "documents")
    return temperature_mixture_rates(doc, "lang", sqrt_steps=1)


@query(
    "doc_multilingual_resample",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM documents GROUP BY lang
    ),
    weighted AS (
      SELECT lang, n_rows,
             CAST(FLOOR(sqrt(CAST(n_rows AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS weight_scaled
      FROM counts
    ),
    tot AS (SELECT CAST(SUM(weight_scaled) AS BIGINT) AS t
            FROM weighted),
    quota AS (
      SELECT lang,
             CAST(FLOOR((CAST(weight_scaled AS DOUBLE)
                         / CAST(t.t AS DOUBLE)) * 200.0) AS BIGINT)
               AS n_keep
      FROM weighted, tot t
    ),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('ml' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.lang, CAST(q.n_keep AS BIGINT) AS lang_quota
    FROM ranked r JOIN quota q USING (lang)
    WHERE r.rn <= q.n_keep
    """,
    tags=("sampling", "mixture", "multilingual", "composed"),
)
def doc_multilingual_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature mixture APPLIED: √-temperature rates
    (temperature_mixture_rates) turn into per-language quotas for a
    200-document budget (floor(rate·budget) — one multiply + floor of
    identical operands) and each language keeps exactly its quota in
    deterministic md5 order (the stratified_sample selection shape:
    rank and quota join share one shuffle on lang). End-to-end this is
    the multilingual resampling job a pretraining mix runs: 'en' is
    capped at 61 of its 218 docs while 'fr' keeps 33 of 64. Every
    decision derives from counts + sqrt + md5 — bit-exact, no RNG."""
    from ..operators.sampling import temperature_mixture_rates

    doc = load_table(spark, sf_dir, "documents")
    rates = temperature_mixture_rates(doc, "lang", sqrt_steps=1)
    quota = rates.select(
        "lang",
        F.floor(F.col("rate") * F.lit(200.0)).cast("long").alias(
            "lang_quota"
        ),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("ml"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    ranked = doc.select(
        "doc_id", "lang", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(quota), "lang")
        .filter(F.col("rn") <= F.col("lang_quota"))
        .select("doc_id", "lang", "lang_quota")
    )


@query(
    "doc_classifier_auc",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk FROM
        (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t <> '') AS toks
         FROM documents), unnest(toks) AS t(tk)
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('qc:' || tk), 1, 4) AS INTEGER)
               % 4096 AS feature
      FROM tok
    ),
    tf AS (
      SELECT doc_id, feature, CAST(COUNT(*) AS BIGINT) AS tf
      FROM feat GROUP BY 1, 2
    ),
    w AS (
      SELECT DISTINCT feature,
             CAST(CAST('0x' || substr(md5('w:' || feature), 1, 4)
                       AS BIGINT) % 2001 - 1000 AS BIGINT) AS w_scaled
      FROM feat
    ),
    scores AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf.tf * w.w_scaled) AS BIGINT) AS logit_scaled
      FROM tf JOIN w ON w.feature = tf.feature
      GROUP BY 1
    ),
    sc AS (
      SELECT CAST(s.logit_scaled AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
               AS score,
             d.lang = 'en' AS label
      FROM scores s JOIN documents d USING (doc_id)
    ),
    per_s AS (
      SELECT score,
             CAST(COUNT_IF(label) AS BIGINT) AS p,
             CAST(COUNT_IF(NOT label) AS BIGINT) AS ng
      FROM sc GROUP BY score
    ),
    cum AS (
      SELECT p, ng,
             COALESCE(SUM(ng) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cn
      FROM per_s
    )
    SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(ng) AS BIGINT) AS n_neg,
           CAST(CAST(SUM(CAST(p AS HUGEINT) * (2 * cn + ng)) AS VARCHAR)
                AS DOUBLE)
             / CAST(CAST(2 * CAST(SUM(p) AS HUGEINT)
                          * CAST(SUM(ng) AS HUGEINT) AS VARCHAR)
                    AS DOUBLE) AS auc
    FROM cum
    """,
    tags=("text", "classifier", "auc", "evaluation", "ml-ops"),
)
def doc_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (tie-corrected) ROC-AUC of the hashed linear quality
    classifier against the lang='en' proxy label — the ranking-quality
    companion to doc_classifier_calibration's reliability diagram.

    AUC = [Σ over distinct scores s of pos(s)·(neg_below(s) +
    neg(s)/2)] / (P·N) — the midrank (Mann-Whitney U with ties)
    formulation. Everything stays integer: the numerator is doubled
    (2U = Σ p·(2·cum_neg + ng)) and accumulates in DECIMAL(38,0)
    (HUGEINT in the oracle), so the single IEEE division
    2U / (2·P·N) — both operands through the portable string->double
    cast — is bit-identical across engines. Scores group on the
    IDENTICAL IEEE double both engines compute (exact bigint->double
    casts, one division), so tie groups agree exactly.

    Scale shape: the scorer is the shared hashed-feature pipeline; the
    per-score aggregate reduces to distinct-score grain before the
    one ordered window (a SinglePartition exchange over reduced rows —
    the allowed pattern), then a 1-row aggregate."""
    from ..operators.lm import hashed_linear_scores, pseudo_weights

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(
        docs, pseudo_weights(spark, 4096, "w", 1000)
    )
    sc = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        (
            F.col("logit_scaled").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("score"),
        (F.col("lang") == "en").alias("label"),
    )
    per_s = sc.groupBy("score").agg(
        F.count_if(F.col("label")).cast("long").alias("p"),
        F.count_if(~F.col("label")).cast("long").alias("ng"),
    )
    d38 = "decimal(38,0)"
    wcum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = per_s.select(
        "p",
        "ng",
        F.coalesce(F.sum("ng").over(wcum), F.lit(0)).alias("cn"),
    )
    t2 = F.col("p").cast(d38) * (
        F.lit(2).cast(d38) * F.col("cn") + F.col("ng")
    )
    return cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("ng").cast("long").alias("n_neg"),
        F.sum(t2).alias("_num2"),
    ).select(
        "n_pos",
        "n_neg",
        (
            F.col("_num2").cast("string").cast("double")
            / (
                F.lit(2).cast(d38)
                * F.col("n_pos")
                * F.col("n_neg")
            ).cast("string").cast("double")
        ).alias("auc"),
    )


@query(
    "corpus_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("connector", "jsonl", "source", "sink", "roundtrip"),
)
def corpus_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus round trip — the de-facto LLM-corpus interchange
    format (one JSON object per line, gzip shards): export the
    documents table as compressed JSONL, read it back with a PINNED
    schema, reproduce the original rows losslessly.

    The pinned ``.schema(...)`` on the read is the load-bearing scale
    decision: schema INFERENCE on JSON is a full extra pass over the
    data (Spark samples or scans to guess types) and silently widens
    types on dirty corpora; a 100 TB ingest declares its schema and
    fails loudly on mismatch. Writer notes: one shard per partition
    (the same parallel layout every other sink here uses), gzip per
    shard (line-splittable at the file level — each shard is one task
    on read, matching the WARC connector's model).
    """
    import tempfile

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="jsonl_rt_")
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(tmp)
    )
    return spark.read.schema(
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).json(tmp).select("doc_id", "text", "lang", "source", "n_chars")


@query(
    "corpus_orc_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("connector", "orc", "source", "sink", "roundtrip"),
)
def corpus_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip — the second columnar format Spark ships
    built-in (a lake migration seam: Hive-era warehouses hand over ORC,
    this engine reads it with the same pushdown/pruning machinery as
    parquet). Export the documents table as ORC shards, read back,
    reproduce the original rows. Columnar self-describes its schema, so
    unlike the JSONL twin no pinned schema is needed; predicate
    pushdown and column pruning work on the ORC scan exactly as on
    parquet (same FileScan machinery — the plan shows
    PushedFilters/ReadSchema on either format)."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="orc_rt_")
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite")
        .orc(tmp)
    )
    return spark.read.orc(tmp).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query(
    "doc_source_vocab_overlap",
    oracle="""
    WITH terms AS (
      SELECT DISTINCT source AS grp, t.x AS term
      FROM documents,
           unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS t(x)),
    sizes AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS vocab
      FROM terms GROUP BY 1),
    common AS (
      SELECT a.grp AS group_a, b.grp AS group_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM terms a JOIN terms b ON a.term = b.term AND a.grp < b.grp
      GROUP BY 1, 2)
    SELECT group_a, group_b,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b, n_common,
           CAST(n_common AS DOUBLE)
             / CAST(sa.vocab + sb.vocab - n_common AS DOUBLE) AS jaccard,
           CAST(n_common AS DOUBLE) / CAST(sa.vocab AS DOUBLE)
             AS containment_a_in_b,
           CAST(n_common AS DOUBLE) / CAST(sb.vocab AS DOUBLE)
             AS containment_b_in_a
    FROM common
    JOIN sizes sa ON sa.grp = group_a
    JOIN sizes sb ON sb.grp = group_b
    """,
    tags=("corpus", "vocabulary", "jaccard", "mixture", "diversity"),
)
def doc_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard/containment between corpus sources —
    the mixture-diversity check run before blending sources into a
    training mix (near-identical vocabularies add volume, not
    coverage). The corpus reduces to the distinct (source, term)
    posting set before the term-keyed self-join; each ratio is one
    division of exact longs."""
    from ..operators.text import vocab_overlap

    docs = load_table(spark, sf_dir, "documents")
    return vocab_overlap(docs, "source", "text")


@query(
    "doc_classifier_conformal",
    bench=True,
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk FROM
        (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t <> '') AS toks
         FROM documents), unnest(toks) AS t(tk)
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('qc:' || tk), 1, 4) AS INTEGER)
               % 4096 AS feature
      FROM tok
    ),
    tf AS (
      SELECT doc_id, feature, CAST(COUNT(*) AS BIGINT) AS tf
      FROM feat GROUP BY 1, 2
    ),
    w AS (
      SELECT DISTINCT feature,
             CAST(CAST('0x' || substr(md5('w:' || feature), 1, 4)
                       AS BIGINT) % 2001 - 1000 AS BIGINT) AS w_scaled
      FROM feat
    ),
    scores AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf.tf * w.w_scaled) AS BIGINT) AS logit_scaled
      FROM tf JOIN w ON w.feature = tf.feature
      GROUP BY 1
    ),
    pos AS (
      SELECT s.doc_id,
             CAST(s.logit_scaled AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
               AS score,
             CAST('0x' || substr(md5('conf:' || s.doc_id), 1, 4)
                  AS INTEGER) % 2 = 0 AS is_cal
      FROM scores s JOIN documents d USING (doc_id)
      WHERE d.lang = 'en'
    ),
    ncal AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM pos WHERE is_cal
    ),
    alphas(num, den) AS (VALUES (1, 20), (1, 10), (1, 5)),
    kf AS (
      SELECT a.num, a.den,
             GREATEST(CAST((a.num * (n.n_cal + 1)) // a.den AS BIGINT),
                      1) AS k,
             n.n_cal
      FROM alphas a, ncal n
    ),
    calv AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pos WHERE is_cal GROUP BY 1
    ),
    cum AS (
      SELECT score, CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum
      FROM calv
    ),
    th AS (
      SELECT kf.num, kf.den, kf.k, kf.n_cal, MIN(c.score) AS threshold
      FROM cum c JOIN kf ON c.cum >= kf.k
      GROUP BY 1, 2, 3, 4
    ),
    tstv AS (
      SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pos WHERE NOT is_cal GROUP BY 1
    ),
    cov AS (
      SELECT th.num, th.den, th.k, th.n_cal, th.threshold,
             CAST(SUM(t.cnt) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN t.score >= th.threshold THEN t.cnt
                           ELSE 0 END) AS BIGINT) AS n_covered
      FROM th, tstv t
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS alpha,
           n_cal, k AS cal_rank, threshold, n_test, n_covered,
           CASE WHEN n_test = 0 THEN NULL
                ELSE CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)
           END AS coverage
    FROM cov
    """,
    tags=("text", "classifier", "conformal", "coverage", "ml-ops"),
)
def doc_classifier_conformal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal gating report for the hashed linear quality
    classifier (operators/lm.py:conformal_gate): on the positive-label
    (lang='en') docs, an md5-parity calibration/test split, the exact
    k-th-smallest-calibration-score threshold per miscoverage level
    alpha in {0.05, 0.1, 0.2}, and the test split's empirical
    coverage — the distribution-free "gate at t keeps >= 1-alpha of
    true positives" guarantee a corpus-filtering team wants before
    thresholding ANY score, calibrated or not. Rank selection runs on
    the value-grain reduced frame (the Lorenz cumsum pattern), alphas
    attach by literal-array explode + equi-join — no nested loops; the
    per-token score and every output float are the engine-portable
    closed forms."""
    from ..operators.lm import (
        conformal_gate,
        hashed_linear_scores,
        pseudo_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(
        docs, pseudo_weights(spark, 4096, "w", 1000)
    )
    scored = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        (
            F.col("logit_scaled").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("score"),
        (F.col("lang") == "en").alias("label"),
    )
    return conformal_gate(scored)


@query(
    "corpus_rank_fusion",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    stats AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM toks),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(w)) AS BIGINT) AS total_len FROM toks),
    tf AS (
      SELECT doc_id, t.tk AS token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks, unnest(w) AS t(tk)
      WHERE t.tk IN ('hash', 'join', 'scan')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ((CAST(tf.tf AS DOUBLE) * CAST('2.2' AS DOUBLE))
              / (CAST(tf.tf AS DOUBLE)
                 + CAST('1.2' AS DOUBLE)
                   * (0.25 + 0.75 * (CAST(s.dl * t.n_docs AS DOUBLE)
                                     / CAST(t.total_len AS DOUBLE)))))
             * ((CAST(t.n_docs - d.df AS DOUBLE) + 0.5)
                / (CAST(d.df AS DOUBLE) + 0.5)) AS sc
      FROM tf
      JOIN stats s USING (doc_id)
      JOIN dfreq d USING (token), tot t
    ),
    piv AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN token = 'hash' THEN sc END), 0.0)
               AS s0,
             COALESCE(MAX(CASE WHEN token = 'join' THEN sc END), 0.0)
               AS s1,
             COALESCE(MAX(CASE WHEN token = 'scan' THEN sc END), 0.0)
               AS s2
      FROM scored GROUP BY doc_id
    ),
    bm AS (
      SELECT doc_id, s0 + s1 + s2 AS bm25
      FROM piv ORDER BY bm25 DESC, doc_id LIMIT 20
    ),
    ra AS (
      SELECT doc_id AS id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                  AS INTEGER) AS rank_bm25
      FROM bm
    ),
    tsum AS (
      SELECT doc_id AS id, CAST(SUM(tf) AS BIGINT) AS n_tf
      FROM tf GROUP BY 1
    ),
    tb AS (
      SELECT id, n_tf FROM tsum ORDER BY n_tf DESC, id LIMIT 20
    ),
    rb AS (
      SELECT id,
             CAST(ROW_NUMBER() OVER (ORDER BY n_tf DESC, id)
                  AS INTEGER) AS rank_tf
      FROM tb
    ),
    fused AS (
      SELECT COALESCE(ra.id, rb.id) AS id, ra.rank_bm25, rb.rank_tf,
             COALESCE(CAST(1 AS DOUBLE)
                      / CAST(60 + ra.rank_bm25 AS DOUBLE),
                      CAST(0 AS DOUBLE))
             + COALESCE(CAST(1 AS DOUBLE)
                        / CAST(60 + rb.rank_tf AS DOUBLE),
                        CAST(0 AS DOUBLE)) AS rrf_score
      FROM ra FULL JOIN rb ON ra.id = rb.id
    )
    SELECT id AS doc_id, rank_bm25, rank_tf, rrf_score
    FROM fused ORDER BY rrf_score DESC, id LIMIT 10
    """,
    tags=("retrieval", "rrf", "fusion", "ranking"),
)
def corpus_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (operators/text.py:rrf_fusion) of the
    log-free BM25 ranking and the raw term-frequency ranking for the
    query {hash, join, scan}: score = Σ 1/(60 + rank) over the
    rankings that contain the doc — the calibration-free lexical
    ranker combiner. Both candidate rankings are TakeOrderedAndProject
    top-20s; the ranking windows and the full-outer fuse run on those
    20-row frames only; every reciprocal and the fixed-order two-term
    sum are bit-matched by the oracle."""
    from ..operators.text import rrf_fusion

    doc = load_table(spark, sf_dir, "documents")
    return rrf_fusion(doc, ["hash", "join", "scan"])


@query(
    "corpus_token_budget",
    oracle=f"""
    WITH avail AS (
      SELECT lang,
             CAST(SUM(len({_TOKS})) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY 1),
    weighted AS (
      SELECT lang, avail_tokens,
             CAST(FLOOR(sqrt(CAST(avail_tokens AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS weight_scaled
      FROM avail),
    tot AS (
      SELECT CAST(SUM(weight_scaled) AS BIGINT) AS wtot,
             CAST(SUM(avail_tokens) AS BIGINT) AS btot
      FROM weighted),
    t AS (
      SELECT lang, avail_tokens, weight_scaled,
             CAST((((CAST(btot AS HUGEINT) * 3) // 2) * weight_scaled)
                  // wtot AS BIGINT) AS target_tokens
      FROM weighted, tot)
    SELECT lang, avail_tokens, weight_scaled, target_tokens,
           LEAST(target_tokens, avail_tokens * 4) AS alloc_tokens,
           CASE WHEN avail_tokens = 0 THEN NULL
                ELSE CAST(LEAST(target_tokens, avail_tokens * 4) AS DOUBLE)
                     / CAST(avail_tokens AS DOUBLE) END AS epochs,
           target_tokens - LEAST(target_tokens, avail_tokens * 4)
             AS shortfall_tokens
    FROM t
    """,
    tags=("sampling", "mixture", "budget", "llm-pipeline"),
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped token-budget plan for a 1.5×-corpus training run
    (operators/sampling.py:token_budget_allocation): per language, the
    sqrt-temperature target token mass, the allocation after the
    4-epoch repetition cap, implied epochs, and the unrealizable
    shortfall — the data-mixing planning table LLM teams read before
    launching a run (low-resource languages hit the epoch cap; the
    shortfall column shows exactly how much up-weighting the cap
    forfeits). Integer-exact: BIGINT token sums, floor(sqrt·scale)
    weights, DECIMAL(38,0)·div targets mirroring HUGEINT //; one
    corpus scan reducing to lang grain map-side."""
    from ..operators.sampling import token_budget_allocation
    from ..operators.text import token_count

    doc = load_table(spark, sf_dir, "documents")
    return token_budget_allocation(
        doc, "lang", token_count("text"),
        budget_num=3, budget_den=2, max_epochs=4,
    )


@query(
    "doc_script_mix",
    oracle="""
    WITH proj AS (
      SELECT lang AS g, CAST(length(text) AS BIGINT) AS n,
             CAST(length(text) - length(regexp_replace(text,
                  '[A-Za-z]', '', 'g')) AS BIGINT) AS c_latin,
             CAST(length(text) - length(regexp_replace(text,
                  '[一-鿿]', '', 'g')) AS BIGINT) AS c_cjk,
             CAST(length(text) - length(regexp_replace(text,
                  '[Ѐ-ӿ]', '', 'g')) AS BIGINT) AS c_cyr,
             CAST(length(text) - length(regexp_replace(text,
                  '[0-9]', '', 'g')) AS BIGINT) AS c_dig
      FROM documents),
    agg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS n_chars,
             CAST(SUM(c_latin) AS BIGINT) AS s_latin,
             CAST(SUM(c_cjk) AS BIGINT) AS s_cjk,
             CAST(SUM(c_cyr) AS BIGINT) AS s_cyr,
             CAST(SUM(c_dig) AS BIGINT) AS s_dig
      FROM proj GROUP BY 1)
    SELECT g AS lang, n_docs, n_chars,
           CASE WHEN n_chars = 0 THEN NULL
                ELSE CAST(s_latin AS DOUBLE) / CAST(n_chars AS DOUBLE)
           END AS latin_share,
           CASE WHEN n_chars = 0 THEN NULL
                ELSE CAST(s_cjk AS DOUBLE) / CAST(n_chars AS DOUBLE)
           END AS cjk_share,
           CASE WHEN n_chars = 0 THEN NULL
                ELSE CAST(s_cyr AS DOUBLE) / CAST(n_chars AS DOUBLE)
           END AS cyrillic_share,
           CASE WHEN n_chars = 0 THEN NULL
                ELSE CAST(s_dig AS DOUBLE) / CAST(n_chars AS DOUBLE)
           END AS digit_share,
           CASE WHEN n_chars = 0 THEN NULL
                ELSE CAST(n_chars - s_latin - s_cjk - s_cyr - s_dig
                          AS DOUBLE) / CAST(n_chars AS DOUBLE)
           END AS other_share
    FROM agg
    """,
    tags=("text", "multilingual", "script", "audit"),
)
def doc_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script composition per labeled language
    (operators/text.py:script_mix): Latin / CJK / Cyrillic / digit
    character shares of each language's text mass — the script-level
    contamination audit that catches mislabeled languages and
    mojibake where token-marker language-ID cannot. Per-row
    regexp-difference char counts (no explode), exact BIGINT sums,
    one IEEE division per share; shares + other sum to 1 by integer
    construction."""
    from ..operators.text import script_mix

    doc = load_table(spark, sf_dir, "documents")
    return script_mix(doc, "lang", "text")


@query(
    "corpus_keyness_by_source",
    oracle=f"""
    WITH toks AS (
      SELECT d.source AS g,
             regexp_replace(lower(u.t), '[^a-z]', '', 'g') AS t
      FROM (SELECT source, {_TOKS} AS w FROM documents) d,
           unnest(d.w) AS u(t)),
    tok2 AS (SELECT g, t FROM toks WHERE t <> ''),
    gt AS (
      SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c_g
      FROM tok2 GROUP BY 1, 2),
    framed AS (
      SELECT g, t, c_g,
             CAST(SUM(c_g) OVER (PARTITION BY t) - c_g AS BIGINT)
               AS c_rest,
             CAST(SUM(c_g) OVER (PARTITION BY g) AS BIGINT) AS n_g,
             CAST(SUM(c_g) OVER () AS BIGINT) AS n_total
      FROM gt),
    scored AS (
      SELECT g, t, c_g, c_rest,
             CAST(CAST(CAST(c_g AS HUGEINT) * (n_total - n_g)
                       AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(c_rest + 1 AS HUGEINT) * n_g
                         AS VARCHAR) AS DOUBLE) AS rate_ratio
      FROM framed WHERE c_g >= 5),
    r AS (
      SELECT g, t, c_g, c_rest, rate_ratio,
             ROW_NUMBER() OVER (PARTITION BY g
               ORDER BY rate_ratio DESC, t ASC) AS rnk
      FROM scored)
    SELECT g AS source, CAST(rnk AS INTEGER) AS rank, t AS term,
           c_g AS n_in_group, c_rest AS n_rest, rate_ratio
    FROM r WHERE rnk <= 5
    """,
    tags=("text", "keyness", "corpus-linguistics", "log-free"),
)
def corpus_keyness_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source
    (operators/text.py:keyness_by_group): top-5 terms most
    over-represented vs the rest of the corpus by the smoothed rate
    ratio (c_g·(N−n_g))/((c_rest+1)·n_g) — log-odds keyness without
    the engine-divergent ln, same ranking for fixed smoothing. One
    corpus scan to (source, term) grain; term and group totals come
    off the SAME aggregate via windows; exact integer
    cross-products, one IEEE division, deterministic tie-break."""
    from ..operators.text import keyness_by_group

    doc = load_table(spark, sf_dir, "documents")
    return keyness_by_group(doc, "source", "text", top_k=5, min_count=5)


@query(
    "emb_ivf_cell_balance",
    oracle=_kmeans_cte(_KM_K, _KM_ITERS) + f"""
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share,
           CAST(COUNT(*) AS DOUBLE) * {_KM_K}
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS load_factor
    FROM a{_KM_ITERS}
    GROUP BY cluster
    """,
    tags=("similarity", "ivf", "balance", "skew-audit", "planning"),
)
def emb_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list balance audit: per coarse-quantizer cell, its
    vector count, corpus share, and load factor (share x k; 1.0 =
    perfectly balanced) — the planning table read before trusting an
    IVF n_probe cost model, because probing a hot cell costs its
    actual list length, not N/k (the embedding-space sibling of
    part_degree_distribution and corpus_shingle_df_profile). Same
    integer-exact k-means state as emb_kmeans_clusters (shared
    oracle-CTE generator, every assignment engine-identical); one
    cell-grain reduction + windows over the k-row frame."""
    from ..operators.similarity import kmeans_assign
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(
        emb, "vec_id", "embedding", k=_KM_K, iterations=_KM_ITERS
    )
    w = Window.partitionBy()
    cells = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    tot = F.sum("n_vectors").over(w).cast("double")
    return cells.select(
        "cluster",
        "n_vectors",
        (F.col("n_vectors").cast("double") / tot).alias("share"),
        (F.col("n_vectors").cast("double") * F.lit(float(_KM_K)) / tot)
        .alias("load_factor"),
    )


@query(
    "doc_isotonic_calibration",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk FROM
        (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t <> '') AS toks
         FROM documents), unnest(toks) AS t(tk)
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('qc:' || tk), 1, 4) AS INTEGER)
               % 4096 AS feature
      FROM tok
    ),
    tf AS (
      SELECT doc_id, feature, CAST(COUNT(*) AS BIGINT) AS tf
      FROM feat GROUP BY 1, 2
    ),
    w AS (
      SELECT DISTINCT feature,
             CAST(CAST('0x' || substr(md5('w:' || feature), 1, 4)
                       AS BIGINT) % 2001 - 1000 AS BIGINT) AS w_scaled
      FROM feat
    ),
    scores AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf.tf * w.w_scaled) AS BIGINT) AS logit_scaled
      FROM tf JOIN w ON w.feature = tf.feature
      GROUP BY 1
    ),
    binned AS (
      SELECT CAST(FLOOR((CAST(s.logit_scaled AS DOUBLE)
                         / CAST(s.n_tokens AS DOUBLE)) / 25.0) AS BIGINT)
               AS score_bin,
             CAST(d.lang = 'en' AS INTEGER) AS label
      FROM scores s JOIN documents d USING (doc_id)
    ),
    bins AS (
      SELECT score_bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS s
      FROM binned GROUP BY 1
    ),
    seq AS (
      SELECT score_bin, n, s,
             CAST(ROW_NUMBER() OVER (ORDER BY score_bin) AS BIGINT) AS i,
             CAST(SUM(n) OVER (ORDER BY score_bin
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
             CAST(SUM(s) OVER (ORDER BY score_bin
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
      FROM bins
    ),
    intervals AS (
      SELECT j.i AS ji, k.i AS ki,
             CAST(k.cs - (j.cs - j.s) AS DOUBLE)
               / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS iavg
      FROM seq j JOIN seq k ON j.i <= k.i
    ),
    minimax AS (
      SELECT b.i, v.ji, MIN(v.iavg) AS m
      FROM seq b JOIN intervals v ON v.ji <= b.i AND v.ki >= b.i
      GROUP BY 1, 2
    ),
    iso AS (SELECT i, MAX(m) AS iso_rate FROM minimax GROUP BY 1)
    SELECT q.score_bin, q.n AS n_docs, q.s AS n_label_pos,
           CAST(q.s AS DOUBLE) / CAST(q.n AS DOUBLE) AS emp_rate,
           iso.iso_rate
    FROM seq q JOIN iso ON iso.i = q.i
    """,
    tags=("text", "classifier", "calibration", "isotonic", "ml-ops"),
)
def doc_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of the hashed quality classifier:
    where doc_classifier_calibration reports RAW per-bin label rates
    (a reliability table that may be non-monotone), this fits the
    monotone non-decreasing rate curve — the standard score->
    probability map for gating corpora by classifier score (a raw
    bin table can tell two thresholds in the wrong order; the
    isotonic fit cannot). Fitted via the PAVA-equivalent minimax
    identity iso_i = max_{j<=i} min_{k>=i} avg(j..k) at BIN grain:
    every interval average is ONE IEEE division of exact integer
    cumulative sums (bit-identical cross-engine), and min/max are
    order-independent — no float accumulation anywhere. The bin
    frame is enum-bounded (~tens of bins regardless of corpus size),
    so the B^2 interval expansion and B^3 minimax join are
    constant-sized; the only corpus-sized work is the classifier's
    own keyed aggregates (shared shape with the calibration entry).
    The B^2/B^3 expansions plan as broadcast nested-loop joins over
    the bin-grain frames by design (CROSS_OK)."""
    from ..operators.lm import hashed_linear_scores, pseudo_weights

    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(
        docs, pseudo_weights(spark, 4096, "w", 1000)
    )
    binned = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        F.floor(
            (
                F.col("logit_scaled").cast("double")
                / F.col("n_tokens").cast("double")
            )
            / F.lit(25.0)
        )
        .cast("long")
        .alias("score_bin"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    bins = binned.groupBy("score_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("s"),
    )
    w = Window.orderBy("score_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = bins.select(
        "score_bin",
        "n",
        "s",
        F.row_number().over(Window.orderBy("score_bin"))
        .cast("long")
        .alias("i"),
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s").over(w).cast("long").alias("cs"),
    ).localCheckpoint()  # bin-grain (tiny); reused by intervals,
    # minimax and the output join — the lineage cut keeps the
    # classifier's keyed aggregates computed ONCE (cache alone lets
    # Catalyst re-derive reused lineage from source, the kendall
    # lesson: 3 corpus scans -> 1)
    j = seq.select(
        F.col("i").alias("ji"),
        (F.col("cs") - F.col("s")).alias("ps"),
        (F.col("cn") - F.col("n")).alias("pn"),
    )
    k = seq.select(
        F.col("i").alias("ki"), F.col("cs").alias("kcs"),
        F.col("cn").alias("kcn"),
    )
    # explicit broadcasts: the checkpointed bin frame carries no size
    # stats, and without them the inequality joins degrade to
    # CartesianProduct instead of broadcast nested loop
    intervals = j.join(F.broadcast(k), F.col("ji") <= F.col("ki")).select(
        "ji",
        "ki",
        (
            (F.col("kcs") - F.col("ps")).cast("double")
            / (F.col("kcn") - F.col("pn")).cast("double")
        ).alias("iavg"),
    )
    b = seq.select(F.col("i").alias("bi"))
    minimax = (
        intervals.join(
            F.broadcast(b),
            (F.col("ji") <= F.col("bi")) & (F.col("ki") >= F.col("bi")),
        )
        .groupBy("bi", "ji")
        .agg(F.min("iavg").alias("m"))
    )
    iso = minimax.groupBy("bi").agg(F.max("m").alias("iso_rate"))
    return seq.join(iso, seq["i"] == iso["bi"]).select(
        "score_bin",
        F.col("n").alias("n_docs"),
        F.col("s").alias("n_label_pos"),
        (F.col("s").cast("double") / F.col("n").cast("double")).alias(
            "emp_rate"
        ),
        "iso_rate",
    )


@query(
    "corpus_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT t.tk FROM
        (SELECT {_TOKS} AS toks FROM documents), unnest(toks) AS t(tk)
    ),
    tf AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
    ranked AS (
      SELECT cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tk) AS BIGINT)
               AS rn,
             CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tk
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS tot
      FROM tf),
    hits AS (
      SELECT g.t AS target_pct, r.rn, r.cum, r.tot
      FROM ranked r, unnest([50, 80, 90, 95, 99, 100]) AS g(t)
      WHERE 100 * r.cum >= CAST(g.t AS BIGINT) * r.tot),
    firsts AS (
      SELECT target_pct, CAST(MIN(rn) AS BIGINT) AS n_terms
      FROM hits GROUP BY 1)
    SELECT CAST(f.target_pct AS INTEGER) AS target_pct, f.n_terms,
           r.cum AS covered_tokens, r.tot AS total_tokens,
           CAST(r.cum AS DOUBLE) / CAST(r.tot AS DOUBLE)
             AS attained_coverage
    FROM firsts f JOIN ranked r ON r.rn = f.n_terms
    """,
    tags=("text", "vocab", "coverage", "tokenizer-budget"),
)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the minimum number of top-frequency
    terms whose cumulative token mass reaches 50/80/90/95/99/100% of
    the corpus — the tokenizer/vocab budget planner (how small can a
    vocab be before OOV mass explodes?) next to corpus_zipf_check
    (fit shape) and corpus_vocab_growth (types over time). Threshold
    hits are EXACT integer comparisons (100*cum >= pct*total — never
    a float share), so the curve is engine-identical; the one double
    division per output row renders the attained coverage. One
    token-count aggregate is the only corpus-sized shuffle; the rank
    window runs over the term-grain reduced frame (the corpus_term
    _stats precedent), and the checkpoint expansion is 6x that frame
    filtered to first hits."""
    from pyspark.sql import Window

    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("tk"))
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = tf.select(
        F.row_number().over(w_rank).cast("long").alias("rn"),
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
        F.sum("cnt").over(w_all).cast("long").alias("tot"),
        # lineage cut: ranked feeds the checkpoint expansion AND the
        # final join-back — term-grain, tokenized once
    ).localCheckpoint()
    hits = (
        ranked.select(
            "rn",
            "cum",
            "tot",
            F.explode(
                F.array(*[F.lit(t) for t in (50, 80, 90, 95, 99, 100)])
            ).alias("target_pct"),
        )
        .filter(
            F.lit(100) * F.col("cum")
            >= F.col("target_pct").cast("long") * F.col("tot")
        )
    )
    firsts = hits.groupBy("target_pct").agg(
        F.min("rn").cast("long").alias("n_terms")
    )
    return firsts.join(ranked, firsts["n_terms"] == ranked["rn"]).select(
        F.col("target_pct").cast("int").alias("target_pct"),
        "n_terms",
        F.col("cum").alias("covered_tokens"),
        F.col("tot").alias("total_tokens"),
        (F.col("cum").cast("double") / F.col("tot").cast("double")).alias(
            "attained_coverage"
        ),
    )


@query(
    "corpus_source_hellinger",
    oracle=f"""
    WITH tok AS (
      SELECT source, t.tk FROM
        (SELECT source, {_TOKS} AS toks FROM documents),
        unnest(toks) AS t(tk)
    ),
    st AS (
      SELECT source, tk, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY 1, 2),
    totals AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens
      FROM st GROUP BY 1),
    topk AS (
      SELECT tk, CAST(ROW_NUMBER() OVER (ORDER BY SUM(cnt) DESC, tk)
                      AS BIGINT) AS i
      FROM st GROUP BY tk
      QUALIFY i <= 300),
    dense AS (
      SELECT st.source, topk.i, st.cnt
      FROM st JOIN topk USING (tk)
      UNION ALL
      SELECT t.source, CAST(0 AS BIGINT) AS i,
             CAST(t.n_tokens - COALESCE(SUM(st.cnt), 0) AS BIGINT) AS cnt
      FROM totals t
      LEFT JOIN (SELECT st.source, st.cnt FROM st JOIN topk USING (tk)) st
        ON st.source = t.source
      GROUP BY t.source, t.n_tokens),
    prods AS (
      SELECT a.source AS sa, b.source AS sb, a.i,
             CAST(a.cnt * b.cnt AS BIGINT) AS p
      FROM dense a JOIN dense b ON a.i = b.i AND a.source < b.source),
    folded AS (
      SELECT sa, sb,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list(struct_pack(i := i, p := p)
                                   ORDER BY i),
                              s -> sqrt(CAST(s.p AS DOUBLE)))),
               (acc, x) -> acc + x) AS bsum
      FROM prods GROUP BY 1, 2)
    SELECT f.sa AS source_a, f.sb AS source_b,
           ta.n_tokens AS n_tokens_a, tb.n_tokens AS n_tokens_b,
           f.bsum / sqrt(CAST(ta.n_tokens AS DOUBLE)
                         * CAST(tb.n_tokens AS DOUBLE)) AS bc_affinity,
           sqrt(GREATEST(CAST(0 AS DOUBLE),
                CAST(1 AS DOUBLE)
                  - f.bsum / sqrt(CAST(ta.n_tokens AS DOUBLE)
                                  * CAST(tb.n_tokens AS DOUBLE))))
             AS hellinger
    FROM folded f
    JOIN totals ta ON ta.source = f.sa
    JOIN totals tb ON tb.source = f.sb
    """,
    tags=("text", "hellinger", "data-mixing", "source-distance"),
)
def corpus_source_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Hellinger distance between source unigram
    distributions over the global top-300 vocabulary plus an OTHER
    rest-mass bucket — the distributional source-distance matrix the
    data-mixing literature weights corpora by, next to
    doc_source_minhash_overlap (set overlap) and
    corpus_keyness_by_source (per-term divergence). Hellinger is the
    log-free f-divergence: BC = sum sqrt(p_i*q_i) needs only sqrt
    (correctly rounded everywhere), where the KL/JSD family's ln()
    is not bit-reproducible across JVM/libm. The cross-source sum of
    sqrt terms IS float accumulation, so it runs as an ordered fold
    over the (term-index)-sorted product list — identical IEEE adds
    in identical order in both engines; truncating to top-K + rest
    keeps the fold ENUM-BOUNDED (301 elements) at any corpus size
    (the truncated distribution is itself the documented statistic;
    integer count products under 2^53 by contract). One (source,
    term) aggregate is the only corpus-sized shuffle; pairing joins
    the K-term frame at term grain (source-pair x K rows, never
    doc-grain)."""
    from pyspark.sql import Window

    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(tokens("text")).alias("tk"))
        .groupBy("source", "tk")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ).localCheckpoint()  # (source, term)-grain (vocab-bounded);
    # reused by totals/topk/dense — the cut keeps the corpus
    # tokenized once (was 3 scans with cache only)
    totals = st.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens")
    )
    w_rank = Window.orderBy(F.col("_g").desc(), F.col("tk"))
    topk = (
        st.groupBy("tk")
        .agg(F.sum("cnt").alias("_g"))
        .select("tk", F.row_number().over(w_rank).cast("long").alias("i"))
        .filter(F.col("i") <= 300)
        .select("tk", "i")
    )
    in_top = st.join(topk, "tk").select(
        "source", "i", "cnt"
        # lineage cut: in_top feeds the rest-mass rollup AND the dense
        # union — (source x <=300)-grain
    ).localCheckpoint()
    rest = (
        totals.join(
            in_top.groupBy("source").agg(
                F.sum("cnt").cast("long").alias("_t")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            F.lit(0).cast("long").alias("i"),
            (F.col("n_tokens") - F.coalesce("_t", F.lit(0)))
            .cast("long")
            .alias("cnt"),
        )
    )
    dense = in_top.unionByName(rest)
    a = dense.select(
        F.col("source").alias("sa"), "i", F.col("cnt").alias("ca")
    )
    b = dense.select(
        F.col("source").alias("sb"), "i", F.col("cnt").alias("cb")
    )
    prods = a.join(b, "i").filter(F.col("sa") < F.col("sb")).select(
        "sa", "sb", "i", (F.col("ca") * F.col("cb")).cast("long").alias("p")
    )
    folded = prods.groupBy("sa", "sb").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", "p"))),
            F.lit(0.0),
            lambda acc, s: acc + F.sqrt(s["p"].cast("double")),
        ).alias("bsum")
    )
    ta = totals.select(
        F.col("source").alias("sa"), F.col("n_tokens").alias("n_tokens_a")
    )
    tb = totals.select(
        F.col("source").alias("sb"), F.col("n_tokens").alias("n_tokens_b")
    )
    bc = F.col("bsum") / F.sqrt(
        F.col("n_tokens_a").cast("double") * F.col("n_tokens_b").cast("double")
    )
    return (
        folded.join(ta, "sa")
        .join(tb, "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "n_tokens_a",
            "n_tokens_b",
            bc.alias("bc_affinity"),
            F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)).alias(
                "hellinger"
            ),
        )
    )


@query(
    "doc_length_partial_corr",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t.tk FROM
        (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            t -> t <> '') AS toks
         FROM documents), unnest(toks) AS t(tk)
    ),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('qc:' || tk), 1, 4) AS INTEGER)
               % 4096 AS feature
      FROM tok
    ),
    tf AS (
      SELECT doc_id, feature, CAST(COUNT(*) AS BIGINT) AS tf
      FROM feat GROUP BY 1, 2
    ),
    w AS (
      SELECT DISTINCT feature,
             CAST(CAST('0x' || substr(md5('w:' || feature), 1, 4)
                       AS BIGINT) % 2001 - 1000 AS BIGINT) AS w_scaled
      FROM feat
    ),
    scores AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf.tf * w.w_scaled) AS BIGINT) AS logit_scaled
      FROM tf JOIN w ON w.feature = tf.feature
      GROUP BY 1
    ),
    base AS (
      SELECT CAST(s.logit_scaled AS DECIMAL(38,0)) AS x,
             CAST(d.n_chars AS DECIMAL(38,0)) AS y,
             CAST(s.n_tokens AS DECIMAL(38,0)) AS z
      FROM scores s JOIN documents d USING (doc_id)
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(z) AS DECIMAL(38,0)) AS sz,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(z * z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x * z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
             CAST(SUM(CAST(y * z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syz
      FROM base
    ),
    r AS (
      SELECT CAST(n AS BIGINT) AS n_docs,
             CAST(CAST(CAST(n * sxy - sx * sy AS DECIMAL(38,0)) AS VARCHAR)
                  AS DOUBLE)
             / sqrt(CAST(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)) AS r_xy,
             CAST(CAST(CAST(n * sxz - sx * sz AS DECIMAL(38,0)) AS VARCHAR)
                  AS DOUBLE)
             / sqrt(CAST(CAST(CAST(n * sxx - sx * sx AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * szz - sz * sz AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)) AS r_xz,
             CAST(CAST(CAST(n * syz - sy * sz AS DECIMAL(38,0)) AS VARCHAR)
                  AS DOUBLE)
             / sqrt(CAST(CAST(CAST(n * syy - sy * sy AS DECIMAL(38,0))
                              AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(CAST(n * szz - sz * sz AS DECIMAL(38,0))
                                AS VARCHAR) AS DOUBLE)) AS r_yz
      FROM m
    )
    SELECT n_docs, r_xy, r_xz, r_yz,
           CASE WHEN (CAST(1 AS DOUBLE) - r_xz * r_xz)
                     * (CAST(1 AS DOUBLE) - r_yz * r_yz)
                     > CAST(0 AS DOUBLE)
           THEN (r_xy - r_xz * r_yz)
                / sqrt((CAST(1 AS DOUBLE) - r_xz * r_xz)
                       * (CAST(1 AS DOUBLE) - r_yz * r_yz))
           END AS partial_r_xy_given_z
    FROM r
    """,
    tags=("text", "partial-correlation", "feature-redundancy", "ml-ops"),
)
def doc_length_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of raw classifier mass (logit_scaled) vs
    character length, CONTROLLING for token count — the
    feature-redundancy diagnostic: a high raw r_xy that collapses when
    z is partialed out says the classifier's unnormalized signal is
    just length, which is exactly why doc_quality_classifier gates on
    the per-token-NORMALIZED logit. All three variables are integers
    (the hashed classifier's scaled logit, n_chars, n_tokens), so
    every moment is exact DECIMAL(38,0); the three Pearson r's and
    the partial r are one fixed closed-form IEEE tree (divisions +
    correctly-rounded sqrt). Degenerate control (|r| = 1) guards to
    NULL. One keyed classifier aggregate + one 1-row moment
    reduction; nothing wider than the scores frame."""
    from ..operators.lm import hashed_linear_scores, pseudo_weights

    d38 = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(
        docs, pseudo_weights(spark, 4096, "w", 1000)
    )
    base = scores.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        F.col("logit_scaled").cast(d38).alias("x"),
        F.col("n_chars").cast(d38).alias("y"),
        F.col("n_tokens").cast(d38).alias("z"),
    )
    m = base.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum("z").cast(d38).alias("sz"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast(d38).alias("syy"),
        F.sum((F.col("z") * F.col("z")).cast(d38)).cast(d38).alias("szz"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("x") * F.col("z")).cast(d38)).cast(d38).alias("sxz"),
        F.sum((F.col("y") * F.col("z")).cast(d38)).cast(d38).alias("syz"),
    )

    def _dbl(c: Column) -> Column:
        return c.cast("string").cast("double")

    def corr(sab: str, saa: str, sa: str, sbb: str, sb: str) -> Column:
        num = _dbl(
            (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)).cast(d38)
        )
        da = _dbl(
            (F.col("n") * F.col(saa) - F.col(sa) * F.col(sa)).cast(d38)
        )
        db = _dbl(
            (F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb)).cast(d38)
        )
        return num / F.sqrt(da * db)

    r_xy = corr("sxy", "sxx", "sx", "syy", "sy")
    r_xz = corr("sxz", "sxx", "sx", "szz", "sz")
    r_yz = corr("syz", "syy", "sy", "szz", "sz")
    den = (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    return m.select(
        F.col("n").cast("long").alias("n_docs"),
        r_xy.alias("r_xy"),
        r_xz.alias("r_xz"),
        r_yz.alias("r_yz"),
        F.when(den > F.lit(0.0), (r_xy - r_xz * r_yz) / F.sqrt(den)).alias(
            "partial_r_xy_given_z"
        ),
    )


@query(
    "corpus_csv_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("connector", "csv", "source", "sink", "roundtrip"),
)
def corpus_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV corpus round trip — the interchange format every upstream
    team still ships — exported with full quoting and read back
    LOSSLESSLY, which is exactly where naive CSV pipelines corrupt
    text corpora: free text carries commas, quotes and newlines, so
    the writer quotes/escapes ("" doubling) and the reader runs in
    multiLine mode with the SAME quote/escape contract plus a pinned
    schema (inference is an extra full pass that silently widens
    types — the jsonl entry's 100 TB rule). gzip per shard, one shard
    per partition. multiLine CSV makes a gzip shard one task on read
    (not line-splittable) — the shard count IS the read parallelism,
    the same model as the WARC and JSONL connectors."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tmp = tempfile.mkdtemp(prefix="csv_rt_")
    (
        docs.select("doc_id", "text", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("compression", "gzip")
        .csv(tmp)
    )
    return (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(tmp)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


@query(
    "corpus_unimax_mixture",
    oracle=f"""
    WITH t AS (
      SELECT lang, CAST(SUM(len({_TOKS})) AS BIGINT) AS toks
      FROM documents GROUP BY lang
    ),
    ranked AS (
      SELECT lang, toks, CAST(2 * toks AS BIGINT) AS cap,
             ROW_NUMBER() OVER (ORDER BY 2 * toks, lang) AS i,
             COUNT(*) OVER () AS n,
             CAST(COALESCE(SUM(2 * toks) OVER (ORDER BY 2 * toks, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_prev,
             CAST((3 * CAST(SUM(toks) OVER () AS BIGINT)) // 2
                  AS BIGINT) AS b
      FROM t
    ),
    flags AS (
      SELECT *, (cap * (n - i + 1) + cum_prev <= b) AS capped
      FROM ranked
    ),
    fin AS (
      SELECT *,
        CAST(COALESCE(SUM(CASE WHEN capped THEN cap END) OVER (), 0)
             AS BIGINT) AS capped_sum,
        CAST(COUNT(*) OVER ()
             - COALESCE(SUM(CASE WHEN capped THEN 1 END) OVER (), 0)
             AS BIGINT) AS n_unc
      FROM flags
    )
    SELECT lang, toks, cap, capped,
      CASE WHEN capped THEN CAST(cap AS DOUBLE)
           ELSE CAST(b - capped_sum AS DOUBLE) / n_unc END AS allocation,
      CASE WHEN capped THEN CAST(cap AS DOUBLE) / toks
           ELSE (CAST(b - capped_sum AS DOUBLE) / n_unc) / toks
      END AS epochs
    FROM fin
    """,
    tags=("corpus", "mixture", "unimax", "sampling", "llm-pipeline"),
)
def corpus_unimax_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation across languages (Chung et al. 2023):
    spread the token budget UNIFORMLY over languages, capping each at
    E=2 epochs of its corpus — the principled alternative to
    lang_temperature_mixture's temperature weights (which over-sample
    head languages and have a free parameter). Budget = 1.5x total
    corpus tokens, so small languages hit their epoch cap and the
    surplus waterfills into the big ones.

    The waterfilling has a closed form on the cap-sorted language list:
    language i (ascending caps) is capped iff even granting every
    not-yet-capped language cap_i each still fits the budget
    (cap_i*(n-i+1) + cum_{i-1} <= B); uncapped languages split the
    remainder evenly. All comparisons are exact BIGINT arithmetic; the
    only float ops are the final two divisions (one IEEE op each).
    Scale: one lang-grain token count over the corpus is the only
    corpus-sized stage; the waterfill runs on the enum-bounded language
    frame via global windows."""
    from pyspark.sql import Window as W

    doc = load_table(spark, sf_dir, "documents")
    t = doc.groupBy("lang").agg(
        F.sum(F.size(TX.tokens("text"))).cast("bigint").alias("toks")
    )
    cap = (F.lit(2) * F.col("toks")).cast("bigint")
    worder = W.orderBy(cap, "lang")
    wprev = worder.rowsBetween(W.unboundedPreceding, -1)
    wfull = W.orderBy("lang").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ranked = t.select(
        "lang",
        "toks",
        cap.alias("cap"),
        F.row_number().over(worder).alias("i"),
        F.count(F.lit(1)).over(wfull).alias("n"),
        F.coalesce(F.sum(cap).over(wprev), F.lit(0))
        .cast("bigint")
        .alias("cum_prev"),
        (F.lit(3) * F.sum("toks").over(wfull))
        .cast("bigint")
        .alias("b3"),
    ).withColumn("b", F.expr("b3 div 2").cast("bigint"))
    flags = ranked.withColumn(
        "capped",
        F.col("cap") * (F.col("n") - F.col("i") + 1) + F.col("cum_prev")
        <= F.col("b"),
    )
    fin = flags.select(
        "*",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap"))).over(wfull),
            F.lit(0),
        )
        .cast("bigint")
        .alias("capped_sum"),
        (
            F.count(F.lit(1)).over(wfull)
            - F.coalesce(
                F.sum(F.when(F.col("capped"), 1)).over(wfull), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("n_unc"),
    )
    alloc_unc = (F.col("b") - F.col("capped_sum")).cast("double") / F.col(
        "n_unc"
    )
    return fin.select(
        "lang",
        "toks",
        "cap",
        "capped",
        F.when(F.col("capped"), F.col("cap").cast("double"))
        .otherwise(alloc_unc)
        .alias("allocation"),
        F.when(
            F.col("capped"), F.col("cap").cast("double") / F.col("toks")
        )
        .otherwise(alloc_unc / F.col("toks"))
        .alias("epochs"),
    )


@query(
    "emb_centroid_silhouette",
    oracle="""
    WITH e AS (
      SELECT vec_id AS vid, label AS own, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS xi
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    sums AS (
      SELECT own AS cand, pos, CAST(SUM(xi) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY own, pos
    ),
    d AS (
      SELECT e.vid, e.own, sums.cand,
             sqrt(CAST(SUM(CAST(e.xi * sums.n - sums.s AS DECIMAL(19,0))
                           * CAST(e.xi * sums.n - sums.s AS DECIMAL(19,0)))
                       AS DOUBLE))
               / (CAST(sums.n AS DOUBLE) * 1000000.0) AS dist
      FROM e JOIN sums ON sums.pos = e.pos
      GROUP BY e.vid, e.own, sums.cand, sums.n
    ),
    pv AS (
      SELECT vid, own,
             MAX(CASE WHEN cand = own THEN dist END) AS a_dist,
             MIN(CASE WHEN cand <> own THEN dist END) AS b_dist
      FROM d GROUP BY vid, own
    )
    SELECT vid AS vec_id, own AS label, a_dist, b_dist,
           CASE WHEN greatest(a_dist, b_dist) > 0
                THEN (b_dist - a_dist) / greatest(a_dist, b_dist)
                ELSE CAST(0 AS DOUBLE) END AS silhouette
    FROM pv
    """,
    tags=("similarity", "silhouette", "cluster-quality", "integer-exact"),
)
def emb_centroid_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette audit of the labeled embedding table
    (operators/similarity.py centroid_silhouette): per-vector
    (b - a)/max(a, b) against label prototypes — the cluster-quality
    gate next to emb_centroid_outliers (farthest-in-own-cluster) and
    emb_nearest_centroid_confusion (hard assignments): silhouette < 0
    rows are the vectors a re-label pass should inspect first. Exact
    scaled integer distances -> bitwise oracle; linear in vectors with
    an enum-bounded |labels| fan-out constant."""
    from ..operators.similarity import centroid_silhouette

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_silhouette(emb, "label", "embedding", "vec_id")


@query(
    "doc_neyman_allocation",
    oracle="""
    WITH st AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents GROUP BY source
    ),
    m AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs * ss - s * s AS DOUBLE)
                  / CAST(n_docs * (n_docs - 1) AS DOUBLE)) AS sd
      FROM st WHERE n_docs >= 2
    ),
    tot AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(
                 list(struct_pack(k := source,
                                  v := CAST(n_docs AS DOUBLE) * sd)
                      ORDER BY source),
                 s -> s.v)),
               (acc, x) -> acc + x) AS wsum,
             CAST(SUM(n_docs) AS BIGINT) AS n_total
      FROM m
    )
    SELECT source, n_docs, sd,
           CAST(n_docs AS DOUBLE) * sd / wsum AS neyman_share,
           CAST(n_docs AS DOUBLE) / n_total AS proportional_share,
           CAST(100 AS DOUBLE)
             * (CAST(n_docs AS DOUBLE) * sd / wsum) AS n_alloc
    FROM m, tot
    """,
    tags=("corpus", "sampling-design", "neyman", "stratified"),
)
def doc_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a 100-doc audit sample across
    sources: n_h ∝ N_h·S_h (stratum size x stddev of doc length), the
    textbook refinement of proportional stratified sampling
    (doc_stratified_sample) that over-samples high-variance sources —
    the sample-design layer for human quality audits of a crawl.

    S_h = sqrt((n·Σx² − (Σx)²)/(n(n−1))) over exact BIGINT n_chars
    sums (sqrt is always safe); the normalizer Σ N_h·S_h is a float
    sum over the enum-bounded source list, folded IN SOURCE ORDER on
    both engines (ordered-fold idiom) on a 1-row normalizer rider. One source-grain aggregate is the only corpus-sized stage."""
    from pyspark.sql import Window as W

    doc = load_table(spark, sf_dir, "documents")
    st = doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("ss"),
    )
    m = st.filter(F.col("n_docs") >= 2).select(
        "source",
        "n_docs",
        F.sqrt(
            (F.col("n_docs") * F.col("ss") - F.col("s") * F.col("s"))
            .cast("double")
            / (F.col("n_docs") * (F.col("n_docs") - 1)).cast("double")
        ).alias("sd"),
    )
    w_col = F.col("n_docs").cast("double") * F.col("sd")
    # 1-row normalizer rider (ordered fold + exact total) — CROSS_OK
    tot = m.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("source").alias("k"), w_col.alias("v"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["v"],
        ).alias("wsum"),
        F.sum("n_docs").cast("bigint").alias("n_total"),
    )
    share = w_col / F.col("wsum")
    return m.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sd",
        share.alias("neyman_share"),
        (F.col("n_docs").cast("double") / F.col("n_total")).alias(
            "proportional_share"
        ),
        (F.lit(100.0) * share).alias("n_alloc"),
    )


@query(
    "corpus_chinchilla_plan",
    oracle="""
    WITH toks AS (
      SELECT CAST(SUM(len(list_filter(
               regexp_split_to_array(trim(text), '\\s+'),
               t -> t <> ''))) AS BIGINT) AS avail
      FROM documents
    ),
    grid AS (
      SELECT * FROM (VALUES
        ('1e18', CAST('1e18' AS DOUBLE)),
        ('1e20', CAST('1e20' AS DOUBLE)),
        ('1e22', CAST('1e22' AS DOUBLE)),
        ('1e24', CAST('1e24' AS DOUBLE))
      ) AS g(budget, flops)
    ),
    plan AS (
      SELECT g.budget, t.avail,
             sqrt(g.flops / CAST('120' AS DOUBLE)) AS n_params,
             CAST('20' AS DOUBLE)
               * sqrt(g.flops / CAST('120' AS DOUBLE)) AS n_tokens
      FROM grid g CROSS JOIN toks t
    )
    SELECT budget, avail AS corpus_tokens, n_params, n_tokens,
           n_tokens / CAST(avail AS DOUBLE) AS epochs_needed,
           (n_tokens / CAST(avail AS DOUBLE) <= CAST('1' AS DOUBLE))
             AS within_one_epoch
    FROM plan
    """,
    tags=("corpus", "scaling-laws", "chinchilla", "planning"),
)
def corpus_chinchilla_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-optimal training plan per FLOP budget (Hoffmann et al.
    2022, "Chinchilla"): with C = 6*N*D and the compute-optimal ratio
    D/N = 20, the optimal model size is N = sqrt(C/120) and the token
    budget D = 20N — the first table a pretraining team draws against
    a corpus: how many epochs of THIS corpus each budget implies, and
    where repetition starts (epochs > 1). The corpus token supply is
    the exact whitespace-token count (the _TOKS idiom).

    Determinism: the budget grid is string-pinned doubles; N = one
    division + one sqrt (IEEE-correctly-rounded in both engines), D =
    one pinned multiply, epochs = one division by the exact BIGINT
    supply — all single ops on identical operands. Scale: ONE
    corpus-sized tokenize aggregate; the 4-row grid rides a broadcast
    cross join (1-row supply rider, CROSS_OK)."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.agg(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: t != "",
                )
            )
        )
        .cast("bigint")
        .alias("avail")
    )
    grid = spark.createDataFrame(
        [("1e18",), ("1e20",), ("1e22",), ("1e24",)], "budget string"
    ).select(
        "budget", F.col("budget").cast("double").alias("flops")
    )
    n_params = F.sqrt(F.col("flops") / F.expr("CAST('120' AS DOUBLE)"))
    n_tokens = F.expr("CAST('20' AS DOUBLE)") * F.sqrt(
        F.col("flops") / F.expr("CAST('120' AS DOUBLE)")
    )
    plan = grid.crossJoin(F.broadcast(toks)).select(
        "budget",
        F.col("avail").alias("corpus_tokens"),
        n_params.alias("n_params"),
        n_tokens.alias("n_tokens"),
    )
    epochs = F.col("n_tokens") / F.col("corpus_tokens").cast("double")
    return plan.select(
        "budget",
        "corpus_tokens",
        "n_params",
        "n_tokens",
        epochs.alias("epochs_needed"),
        (epochs <= F.expr("CAST('1' AS DOUBLE)")).alias(
            "within_one_epoch"
        ),
    )
