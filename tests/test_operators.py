"""Unit tests for the operator library (SURVEY.md §5.4: one test per
inventory row granularity, on a local SparkSession)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adventureworks_pysparkjobs_spark.operators.dedup import dedup_keep_first
from adventureworks_pysparkjobs_spark.operators.multimodal import (
    attach_metadata,
    extract_features,
    payload_stats,
)
from adventureworks_pysparkjobs_spark.operators.relational import (
    enforce_schema,
    sessionize,
    topk_per_group,
)
from adventureworks_pysparkjobs_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
    cosine_topk_pandas,
    quantize_int8,
    topk_int8,
)
from adventureworks_pysparkjobs_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
)
from adventureworks_pysparkjobs_spark.sources.corpus import load_table
from adventureworks_pysparkjobs_spark.sources.jdbc import partition_options

from .conftest import SF_SMOKE


class TestEnforceSchema:
    def test_casts_and_orders(self, spark):
        df = spark.createDataFrame([Row(b="1.5", a=1)])
        schema = T.StructType(
            [
                T.StructField("a", T.LongType(), False),
                T.StructField("b", T.DecimalType(10, 2), True),
            ]
        )
        out = enforce_schema(df, schema)
        assert out.columns == ["a", "b"]
        assert out.schema == schema or [f.dataType for f in out.schema.fields] == [
            T.LongType(),
            T.DecimalType(10, 2),
        ]

    def test_null_in_non_nullable_raises(self, spark):
        df = spark.createDataFrame(
            [Row(a=1), Row(a=None)], schema="a int"
        )
        schema = T.StructType([T.StructField("a", T.IntegerType(), False)])
        with pytest.raises(Exception, match="non-nullable|USER_RAISED"):
            enforce_schema(df, schema).collect()


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [(g, i, float(i % 3)) for g in ("a", "b") for i in range(5)],
        "g string, id int, v double",
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], k=2)
    rows = {(r["g"], r["rnk"]): r["id"] for r in out.collect()}
    # v: ids 2,0,1,3,4 -> values 2.0,0,1,0,1 ... top by (v desc, id): id2 (2.0), id1 (1.0)
    assert rows[("a", 1)] == 2 and rows[("a", 2)] == 1
    assert len(rows) == 4


def test_sessionize_gap(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(minutes=10)),
        (1, 3, t0 + dt.timedelta(minutes=50)),  # 40min gap -> new session
        (2, 4, t0),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap_minutes=30, id_col="event_id")
    seq = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert seq == {1: 1, 2: 1, 3: 2, 4: 1}


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [("k", 2, "b"), ("k", 1, "a"), ("j", 9, "z")],
        "key string, ord int, val string",
    )
    out = dedup_keep_first(df, ["key"], ["ord"])
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {"k": "a", "j": "z"}


class TestJdbcOptions:
    def test_stripes(self):
        o = partition_options("id", 1, 1000, 8)
        assert o == {
            "partitionColumn": "id",
            "lowerBound": "1",
            "upperBound": "1000",
            "numPartitions": "8",
        }

    def test_clamps_to_range(self):
        assert partition_options("id", 5, 6, 64)["numPartitions"] == "2"

    def test_rejects_inverted_bounds(self):
        with pytest.raises(ValueError):
            partition_options("id", 10, 1, 4)

    def test_incremental_subquery(self):
        from adventureworks_pysparkjobs_spark.sources.jdbc import (
            incremental_subquery,
        )

        q = incremental_subquery(
            "sales.salesorderheader", "modifieddate", "2014-01-01 00:00:00"
        )
        assert q == (
            "(SELECT * FROM sales.salesorderheader"
            " WHERE modifieddate > '2014-01-01 00:00:00') inc"
        )
        assert (
            incremental_subquery("t", "version_id", 42)
            == "(SELECT * FROM t WHERE version_id > 42) inc"
        )


class TestMultimodal:
    def _media(self, spark):
        return spark.createDataFrame(
            [("f1.bin", bytearray(b"hello")), ("f2.bin", bytearray(b"worlds!"))],
            "path string, content binary",
        )

    def test_payload_stats(self, spark):
        out = payload_stats(self._media(spark)).collect()
        got = {r["path"]: (r["payload_bytes"], r["payload_sha256"][:8]) for r in out}
        import hashlib

        assert got["f1.bin"] == (5, hashlib.sha256(b"hello").hexdigest()[:8])

    def test_extract_features_with_injected_codec(self, spark):
        def fake_codec(payload: bytes) -> dict:
            return {
                "width": len(payload),
                "height": 2,
                "n_channels": 3,
                "feature": [float(b) for b in payload[:4]],
            }

        out = extract_features(self._media(spark), codec=fake_codec).collect()
        row = {r["path"]: r for r in out}["f1.bin"]
        assert row["payload_bytes"] == 5
        assert row["width"] == 5 and row["n_channels"] == 3
        assert row["feature"] == [104.0, 101.0, 108.0, 108.0]

    def test_default_codec_raises_only_for_unknown_containers(self, spark):
        # r9: the default codec is the pure-Python header parser; the
        # NotImplementedError seam remains only for unknown containers
        # (b"hello" is not a known magic signature).
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            extract_features(self._media(spark)).collect()

    def test_default_codec_parses_real_headers(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_gif_header,
            encode_jpeg_header,
            encode_png,
        )

        media = spark.createDataFrame(
            [
                ("a.png", bytearray(encode_png(13, 7, 3, seed=5))),
                ("b.jpg", bytearray(encode_jpeg_header(640, 480, 3))),
                ("c.gif", bytearray(encode_gif_header(320, 200))),
                ("d.png", bytearray(encode_png(8, 9, 1))),
            ],
            "path string, content binary",
        )
        out = {r["path"]: r for r in extract_features(media).collect()}
        assert (out["a.png"]["width"], out["a.png"]["height"]) == (13, 7)
        assert out["a.png"]["n_channels"] == 3
        assert (out["b.jpg"]["width"], out["b.jpg"]["height"]) == (640, 480)
        assert (out["c.gif"]["width"], out["c.gif"]["height"]) == (320, 200)
        assert out["c.gif"]["n_channels"] == 3
        assert out["d.png"]["n_channels"] == 1

    def test_resize_images_with_injected_codec(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            resize_images,
        )

        def fake_resize(payload: bytes, w: int, h: int) -> dict:
            # deterministic fake: truncate/pad payload to w bytes
            return {
                "content": payload[:w].ljust(w, b"\0"),
                "width": w,
                "height": h,
            }

        out = resize_images(
            self._media(spark), codec=fake_resize, target_width=4, target_height=2
        ).collect()
        got = {r["path"]: r for r in out}
        assert got["f1.bin"]["width"] == 4 and got["f1.bin"]["height"] == 2
        assert bytes(got["f1.bin"]["content"]) == b"hell"
        assert bytes(got["f2.bin"]["content"]) == b"worl"

    def test_sample_frames_one_to_many(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            sample_frames,
        )

        def fake_video(payload: bytes) -> list:
            # one "frame" per byte, ts = 40ms apart
            return [
                {
                    "frame_idx": i,
                    "frame_ts_ms": i * 40,
                    "frame": bytes([b]),
                    "feature": [float(b)],
                }
                for i, b in enumerate(payload)
            ]

        out = sample_frames(
            self._media(spark), codec=fake_video, every_n=2, max_frames=2
        ).collect()
        by_path = {}
        for r in out:
            by_path.setdefault(r["path"], []).append(r)
        # f1 'hello' (5 frames) -> every 2nd = idx 0,2,4 -> capped at 2
        f1 = sorted(by_path["f1.bin"], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in f1] == [0, 2]
        assert [r["frame_ts_ms"] for r in f1] == [0, 80]
        assert bytes(f1[1]["frame"]) == b"l"
        assert f1[1]["feature"] == [float(b"l"[0])]

    def test_attach_metadata(self, spark):
        meta = spark.createDataFrame(
            [("f1.bin", "image/png")], "path string, mime string"
        )
        out = attach_metadata(self._media(spark), meta).collect()
        got = {r["path"]: r["mime"] for r in out}
        assert got == {"f1.bin": "image/png", "f2.bin": None}


class TestPlanShape:
    """The 100 TB constraints as assertions (SURVEY.md §4.5)."""

    def test_filter_pushdown_reaches_scan(self, spark):
        li = load_table(spark, SF_SMOKE, "lineitem").filter(
            F.col("l_quantity") < 5
        ).select("l_orderkey")
        assert_pushed_filters(li, "LessThan(l_quantity")

    def test_dim_join_broadcasts(self, spark):
        cu = load_table(spark, SF_SMOKE, "customer")
        na = load_table(spark, SF_SMOKE, "nation")
        j = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        assert_broadcast_join(j)
        assert_no_cartesian(j)


class TestSimilarity:
    def test_vectorized_matches_fold_topk(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = emb.filter(F.col("vec_id") % 100 == 0)
        a = cosine_topk(emb, q, k=5)
        b = cosine_topk_pandas(emb, q, k=5)
        ka = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in a.collect()}
        kb = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in b.collect()}
        assert ka == kb

    def test_ann_recall_floor(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = emb.filter(F.col("vec_id") % 25 == 0)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_topk_lsh(emb, q, k=5, num_planes=4, dim=64).collect()
        }
        recall = len(exact & approx) / len(exact)
        # 4 planes on 64-dim random data: each true neighbor collides with
        # its query with p >= 1 - 4*theta/pi; assert a conservative floor.
        assert recall >= 0.15, f"ANN recall {recall:.2f} below floor"

    def test_quantize_int8_roundtrip_bound(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        qz = quantize_int8(emb)
        assert qz.schema["q8"].dataType == T.ArrayType(T.ByteType(), False)
        assert isinstance(qz.schema["q8_scale"].dataType, T.DoubleType)
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            dequant,
        )
        err = qz.select(
            F.array_max(
                F.zip_with(
                    F.col("embedding"),
                    dequant(F.col("q8"), F.col("q8_scale")),
                    lambda x, y: F.abs(x.cast("double") - y),
                )
            ).alias("err"),
            "q8_scale",
        )
        bad = err.filter(
            F.col("err") > F.col("q8_scale") * 0.5 * (1 + 1e-9)
        ).count()
        assert bad == 0

    def test_quantize_zero_vector(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 4.0])],
            "vec_id long, embedding array<float>",
        )
        rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
        assert rows[1]["q8_scale"] == 0.0 and rows[1]["q8"] == [0, 0, 0, 0]
        # max |x| maps to exactly +/-127; signs preserved.
        assert rows[2]["q8"][3] == 127 and rows[2]["q8"][1] < 0

    def test_pq_encode_and_recall(self, spark):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        emb = load_table(spark, SF_SMOKE, "embeddings")
        cb = pq_train(emb, m=8, k=16, dim=64, seed=42)
        assert len(cb) == 8 and all(len(s) == 16 for s in cb)
        assert all(len(c) == 8 for s in cb for c in s)
        enc = pq_encode(emb, cb)
        dt = enc.schema["pq_codes"].dataType
        assert isinstance(dt, T.ArrayType) and dt.elementType == T.ByteType()
        codes = enc.select("pq_codes").limit(50).collect()
        assert all(0 <= c <= 15 for r in codes for c in r["pq_codes"])
        # determinism: same seed -> same codebooks -> same codes
        assert cb == pq_train(emb, m=8, k=16, dim=64, seed=42)

        q = emb.filter(F.col("vec_id") % 25 == 0)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_topk(enc, q, cb, k=5).collect()
        }
        recall = len(exact & approx) / len(exact)
        # 32x compression on random 64-dim data is a coarse sketch;
        # assert the same conservative floor as the bucketed ANN paths.
        assert recall >= 0.15, f"PQ recall {recall:.2f} below floor"

        # r6: the exact-re-rank tail (FAISS refine idiom) — PQ only has
        # to keep true neighbors in the top-100 shortlist, exact cosine
        # ranks them. Production floor: observed ~0.88 on the fixture.
        rr = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_topk(enc, q, cb, k=5, rerank=100).collect()
        }
        rr_recall = len(exact & rr) / len(exact)
        assert rr_recall >= 0.6, f"PQ+rerank recall {rr_recall:.2f}"

        # Determinism anchor: with the shortlist as wide as the corpus,
        # the re-rank IS the exact scan — results must match exactly
        # (same scores, same tie-break), not just by recall.
        n_corpus = emb.count()
        full = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_topk(enc, q, cb, k=5, rerank=n_corpus + 1).collect()
        }
        assert full == exact

    def test_int8_topk_near_exact(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = emb.filter(F.col("vec_id") % 25 == 0)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in topk_int8(quantize_int8(emb), q, k=5).collect()
        }
        recall = len(exact & approx) / len(exact)
        # ~0.4% per-component error barely perturbs the ranking: int8
        # brute force is near-exact, unlike the bucketed ANN variants.
        assert recall >= 0.8, f"int8 recall {recall:.2f} below floor"


def test_ivf_recall_floor(spark):
    from adventureworks_pysparkjobs_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, n_cells=8, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"IVF recall {recall:.2f} below floor"

    # r6 production config: multi-cell probing (n_probe=4) — recall
    # observed ~0.72-0.76 on the fixtures; floor at ~60% of observed.
    mp = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, n_cells=8, n_probe=4).collect()
    }
    mp_recall = len(exact & mp) / len(exact)
    assert mp_recall >= 0.55, f"IVF n_probe=4 recall {mp_recall:.2f}"
    # more probes can only widen the candidate set -> recall never drops
    assert mp_recall >= recall


def test_repetition_cols_known_values(spark):
    """Gopher repetition metrics on hand-computable docs: 'a b a b' has
    bigrams [a b, b a, a b] -> top_bigram_frac 2/3, trigrams
    [a b a, b a b] all unique -> dup 0; 'x x x x' duplicates everything;
    a 1-token doc has no n-grams -> NULLs."""
    from adventureworks_pysparkjobs_spark.operators.text import (
        repetition_cols,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "x x x x"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select("doc_id", *repetition_cols("text")).collect()
    }
    assert abs(rows[1]["top_bigram_frac"] - 2 / 3) < 1e-12
    assert rows[1]["dup_trigram_frac"] == 0.0
    assert rows[2]["top_bigram_frac"] == 1.0
    assert rows[2]["dup_trigram_frac"] == 0.5
    assert rows[3]["top_bigram_frac"] is None
    assert rows[3]["dup_trigram_frac"] is None


def test_winnow_fingerprints_match_reference(spark):
    """Spark winnowing == a direct Python reference implementation, and
    documents sharing a long substring share at least one fingerprint
    (the winnowing guarantee)."""
    import hashlib

    from adventureworks_pysparkjobs_spark.operators.text import (
        winnow_fingerprints,
    )

    k, w = 8, 4
    shared = "the quick brown fox jumps over the lazy dog"
    docs = [
        (1, f"AAA {shared} BBB"),
        (2, f"xyz {shared} qqq"),
        (3, "completely unrelated content here with no overlap at all"),
        (4, "tiny"),  # shorter than k -> empty fingerprint set
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (list(r["fingerprints"]), r["n_fingerprints"])
        for r in winnow_fingerprints(df, k=k, window=w).collect()
    }

    def ref(text: str) -> list[str]:
        grams = [
            hashlib.md5(text[i : i + k].encode()).hexdigest()
            for i in range(len(text) - k + 1)
        ]
        if not grams:
            return []
        if len(grams) < w:
            mins = grams
        else:
            mins = [min(grams[i : i + w]) for i in range(len(grams) - w + 1)]
        return sorted(set(mins))

    for doc_id, text in docs:
        assert got[doc_id][0] == ref(text), f"doc {doc_id}"
        assert got[doc_id][1] == len(ref(text))
    # winnowing guarantee: docs 1 and 2 share the 44-char run -> overlap
    assert set(got[1][0]) & set(got[2][0])
    assert not set(got[1][0]) & set(got[3][0])
    assert got[4][0] == []


def test_chunk_documents_matches_duckdb(spark, duck):
    """Token-window chunking equals a generate_series formulation in
    DuckDB: same chunk ids, boundaries, and reassembled chunk texts."""
    from adventureworks_pysparkjobs_spark.operators.text import chunk_documents

    from .conftest import SF_ORACLE
    from .oracle_utils import compare_frames

    docs = load_table(spark, SF_ORACLE, "documents")
    out = chunk_documents(docs, chunk_tokens=16, overlap=4)
    c, stride = 16, 12
    oracle = duck.sql(
        f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ), sized AS (
          SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
        )
        , starts AS (
          SELECT doc_id, t, n,
                 unnest(generate_series(
                   1,
                   CASE WHEN n > {c} THEN n - {c} + {stride} ELSE 1 END,
                   {stride})) AS s
          FROM sized
        )
        SELECT doc_id,
               CAST((s - 1) // {stride} AS INT) AS chunk_id,
               CAST(s AS INT) AS start_token,
               array_to_string(t[s:s+{c}-1], ' ') AS chunk_text,
               CAST(LEAST({c}, n - s + 1) AS INT) AS n_chunk_tokens
        FROM starts
        """
    )
    assert compare_frames(out, oracle) == []


def test_chunk_documents_reconstruction(spark):
    """Every tokenized doc is exactly reassembled by concatenating its
    chunks minus the overlap prefix; chunk ids are dense from 0."""
    from collections import defaultdict

    from adventureworks_pysparkjobs_spark.operators.text import chunk_documents

    docs = load_table(spark, SF_SMOKE, "documents")
    overlap = 4
    rows = chunk_documents(docs, chunk_tokens=16, overlap=overlap).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    want = {
        r["doc_id"]: r["text"].split()
        for r in docs.select("doc_id", "text").collect()
        if r["text"] and r["text"].split()
    }
    assert set(by_doc) == set(want)
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in chunks] == list(range(len(chunks)))
        rec = chunks[0]["chunk_text"].split()
        for r in chunks[1:]:
            rec += r["chunk_text"].split()[overlap:]
        assert rec == want[d]
        assert all(r["n_chunk_tokens"] == len(r["chunk_text"].split()) for r in chunks)


def test_profile_table_matches_duckdb(spark, duck):
    """One-pass per-column profile (exact-distinct mode) equals the
    hand-written DuckDB column aggregates."""
    from adventureworks_pysparkjobs_spark.operators.profile import profile_table

    from .conftest import SF_ORACLE
    from .oracle_utils import compare_frames

    cols = ["o_orderkey", "o_orderpriority", "o_orderdate"]
    out = profile_table(
        load_table(spark, SF_ORACLE, "orders"), columns=cols, exact_distinct=True
    )
    per_col = " UNION ALL ".join(
        f"""
        SELECT '{c}' AS "column", COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_nulls,
               CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / COUNT(*)
                 AS null_fraction,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in cols
    )
    assert compare_frames(out, duck.sql(per_col)) == []


def test_key_skew_profile(spark):
    """Heavy-hitter key diagnostic: the hot key leads with the right
    share/cum_share, and the top-n is a distributed
    TakeOrderedAndProject, not a global window over all keys."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        key_skew_profile,
    )

    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 500, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k")
    )
    prof = key_skew_profile(df, ["k"], top_n=3)
    rows = prof.collect()
    assert [r["rnk"] for r in rows] == [1, 2, 3]
    hot = rows[0]
    # key 7 holds the 500 skewed rows plus its share of the modulo tail.
    assert hot["k"] == 7 and hot["key_count"] == 510
    assert abs(hot["share"] - 0.51) < 1e-12
    assert abs(rows[-1]["cum_share"] - sum(r["share"] for r in rows)) < 1e-12
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_profile_table_skips_minmax_on_complex_types(spark):
    from adventureworks_pysparkjobs_spark.operators.profile import profile_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    prof = {r["column"]: r for r in profile_table(emb).collect()}
    vec_col = next(
        f.name for f in emb.schema.fields
        if isinstance(f.dataType, T.ArrayType)
    )
    assert prof[vec_col]["min_value"] is None
    assert prof[vec_col]["n_distinct"] > 0


def test_pack_sequences_invariants(spark):
    """Greedy sequence packing: every chunk assigned exactly once, no
    sequence exceeds the budget (unless a single oversized chunk), dense
    positions, and assignments independent of input partitioning."""
    from collections import defaultdict

    from adventureworks_pysparkjobs_spark.operators.packing import pack_sequences
    from adventureworks_pysparkjobs_spark.operators.text import chunk_documents

    docs = load_table(spark, SF_SMOKE, "documents")
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    budget = 64
    rows = pack_sequences(chunks, max_tokens=budget, n_buckets=8).collect()
    base = chunks.collect()
    key = lambda r: (r["doc_id"], r["chunk_id"])  # noqa: E731
    assert len(rows) == len(base)
    assert {key(r) for r in rows} == {key(r) for r in base}

    seqs = defaultdict(list)
    for r in rows:
        seqs[r["seq_id"]].append(r)
    for rs in seqs.values():
        rs.sort(key=lambda r: r["seq_pos"])
        assert [r["seq_pos"] for r in rs] == list(range(len(rs)))
        total = sum(r["n_chunk_tokens"] for r in rs)
        assert total <= budget or len(rs) == 1

    again = pack_sequences(
        chunks.repartition(7), max_tokens=budget, n_buckets=8
    ).collect()
    assert {key(r): (r["seq_id"], r["seq_pos"]) for r in rows} == {
        key(r): (r["seq_id"], r["seq_pos"]) for r in again
    }


def test_upsert_snapshot(spark):
    from adventureworks_pysparkjobs_spark.operators.relational import (
        upsert_snapshot,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "id int, v string, ver int"
    )
    upd = spark.createDataFrame(
        [(2, "B", 11), (4, "D", 11), (3, "c-old", 9)], "id int, v string, ver int"
    )
    out = upsert_snapshot(base, upd, keys=["id"], order_by=["ver"])
    got = {r["id"]: (r["v"], r["ver"]) for r in out.collect()}
    assert got == {
        1: ("a", 10),   # untouched
        2: ("B", 11),   # updated
        3: ("c", 10),   # stale update ignored
        4: ("D", 11),   # inserted
    }


class TestFileSources:
    def test_csv_json_roundtrip(self, spark, tmp_path):
        from adventureworks_pysparkjobs_spark.sources.files import (
            read_table,
            write_table,
        )

        na = load_table(spark, SF_SMOKE, "nation")
        schema = na.schema
        for fmt in ("csv", "json", "orc"):
            p = str(tmp_path / fmt)
            write_table(na, p, fmt=fmt)
            back = read_table(spark, p, fmt=fmt, schema=schema)
            assert sorted(map(tuple, back.collect())) == sorted(
                map(tuple, na.collect())
            ), fmt

    def test_csv_requires_schema(self, spark, tmp_path):
        from adventureworks_pysparkjobs_spark.sources.files import read_table

        with pytest.raises(ValueError, match="explicit schema"):
            read_table(spark, str(tmp_path), fmt="csv")

    def test_connector_formats_raise_cleanly(self, spark, tmp_path):
        from adventureworks_pysparkjobs_spark.sources.files import read_table

        with pytest.raises((NotImplementedError, Exception)):
            read_table(spark, str(tmp_path), fmt="delta")


def test_dedup_spans_matches_duckdb(spark, duck):
    """Cross-document span dedup (keep first occurrence corpus-wide,
    reassemble) equals the row_number window formulation in DuckDB."""
    from adventureworks_pysparkjobs_spark.operators.dedup import dedup_spans

    from .conftest import SF_ORACLE
    from .oracle_utils import compare_frames

    docs = load_table(spark, SF_ORACLE, "documents")
    out = dedup_spans(docs, span_tokens=8)
    oracle = duck.sql(
        """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ), sized AS (
          SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
        ), spans AS (
          SELECT doc_id, CAST((s - 1) // 8 AS INT) AS span_no,
                 array_to_string(t[s:s+7], ' ') AS span_text
          FROM (SELECT doc_id, t, n,
                       unnest(generate_series(1, n, 8)) AS s
                FROM sized)
        ), win AS (
          SELECT doc_id, span_no, span_text,
                 ROW_NUMBER() OVER (PARTITION BY span_text
                                    ORDER BY doc_id, span_no) AS rn
          FROM spans
        )
        SELECT doc_id,
               COALESCE(string_agg(CASE WHEN rn = 1 THEN span_text END,
                                   ' ' ORDER BY span_no), '') AS text_dedup,
               COUNT(*) FILTER (WHERE rn = 1) AS n_spans_kept,
               COUNT(*) - COUNT(*) FILTER (WHERE rn = 1) AS n_spans_dropped
        FROM win GROUP BY doc_id
        """
    )
    assert compare_frames(out, oracle) == []


def test_dedup_spans_removes_cross_doc_copy(spark):
    """A span copied into a later document survives only in the first;
    unique spans are untouched and order is preserved."""
    from adventureworks_pysparkjobs_spark.operators.dedup import dedup_spans

    boiler = "a b c d"  # span_tokens=4 -> exactly one span
    rows = [
        (1, f"{boiler} u1 u2 u3 u4"),
        (2, f"v1 v2 v3 v4 {boiler}"),
        (3, "w1 w2 w3 w4"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_spans(df, span_tokens=4).collect()}
    assert set(got) == {1, 2, 3}  # empty doc absent
    assert got[1]["text_dedup"] == f"{boiler} u1 u2 u3 u4"
    assert got[1]["n_spans_kept"] == 2 and got[1]["n_spans_dropped"] == 0
    assert got[2]["text_dedup"] == "v1 v2 v3 v4"  # copied span dropped
    assert got[2]["n_spans_kept"] == 1 and got[2]["n_spans_dropped"] == 1
    assert got[3]["text_dedup"] == "w1 w2 w3 w4"


def test_flag_contamination_matches_duckdb(spark, duck):
    """Benchmark n-gram decontamination equals the DuckDB join
    formulation: per-doc distinct contaminated 8-gram counts + flag."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        flag_contamination,
    )

    from .conftest import SF_ORACLE
    from .oracle_utils import compare_frames

    docs = load_table(spark, SF_ORACLE, "documents")
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    out = flag_contamination(docs, bench, n=8)
    oracle = duck.sql(
        """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '') AS t
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 list_aggregate(t[i:i+7], 'string_agg', ' ') AS gram
          FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
          WHERE len(t) >= 8
        ), bench AS (
          SELECT DISTINCT gram FROM sh WHERE doc_id % 100 = 0
        ), hits AS (
          SELECT s.doc_id, COUNT(DISTINCT s.gram) AS n
          FROM sh s JOIN bench b USING (gram) GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n, 0) AS n_contaminated,
               COALESCE(h.n, 0) >= 1 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        """
    )
    assert compare_frames(out, oracle) == []
    flagged = {r["doc_id"] for r in out.filter("contaminated").collect()}
    assert {0, 100, 200, 300, 400} <= flagged  # benchmark docs self-flag


def test_deterministic_shuffle_stable_and_partition_independent(spark):
    """The export shuffle's global order equals the Python md5 reference
    order, survives any input partitioning, and changes with the salt."""
    import hashlib

    from adventureworks_pysparkjobs_spark.operators.sampling import (
        deterministic_shuffle,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    want = sorted(
        (r["doc_id"] for r in docs.collect()),
        key=lambda i: (
            hashlib.md5(f"shuffle{i}".encode()).hexdigest(),
            i,
        ),
    )
    got = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()]
    assert got == want
    got7 = [
        r["doc_id"]
        for r in deterministic_shuffle(docs.repartition(7), "doc_id").collect()
    ]
    assert got7 == want
    other = [
        r["doc_id"]
        for r in deterministic_shuffle(docs, "doc_id", salt="epoch2").collect()
    ]
    assert other != want and sorted(other) == sorted(want)


def test_mixture_matches_duckdb(spark, duck):
    """Weighted two-source mixture equals the DuckDB hash-bucket
    formulation row-for-row (membership is engine-portable)."""
    from adventureworks_pysparkjobs_spark.operators.sampling import mixture

    from .conftest import SF_ORACLE
    from .oracle_utils import compare_frames

    docs = load_table(spark, SF_ORACLE, "documents")
    out = mixture(
        {
            "even": docs.filter(F.col("doc_id") % 2 == 0),
            "odd": docs.filter(F.col("doc_id") % 2 == 1),
        },
        {"even": 0.5, "odd": 0.25},
        key_col="doc_id",
    ).select("doc_id", "source")
    oracle = duck.sql(
        """
        SELECT doc_id, 'even' AS source FROM documents
        WHERE doc_id % 2 = 0
          AND CAST('0x' || substring(md5('mix:even' || CAST(doc_id AS VARCHAR)), 1, 4)
              AS INTEGER) % 65536 < CAST(0.5 * 65536 AS INTEGER)
        UNION ALL
        SELECT doc_id, 'odd' AS source FROM documents
        WHERE doc_id % 2 = 1
          AND CAST('0x' || substring(md5('mix:odd' || CAST(doc_id AS VARCHAR)), 1, 4)
              AS INTEGER) % 65536 < CAST(0.25 * 65536 AS INTEGER)
        """
    )
    assert compare_frames(out, oracle) == []
    n = out.count()
    assert 0 < n < docs.count()


class TestCleanText:
    """C4-style line cleaning + PII redaction (operators/text.py
    clean_text; cross-engine parity is pinned by the doc_line_clean
    catalog oracle — these are the semantic edge cases)."""

    def _run(self, spark, rows):
        from adventureworks_pysparkjobs_spark.operators.text import clean_text

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in clean_text(df).collect()}

    def test_line_filters(self, spark):
        got = self._run(
            spark,
            [
                (1, 'Good prose line stays put.\nShe said "stop".\n'
                    "ends with bang now!\nis this kept too?"),
                (2, "too short.\nno terminal punctuation here\n"
                    'config {"mode": "full"} is code.\n'
                    "Lorem Ipsum dolor sit amet.\n"
                    "Enable JAVASCRIPT to continue please."),
                (3, ""),
            ],
        )
        # quote/bang/question terminators all count; word floor is 3
        assert got[1]["n_lines"] == 4 and got[1]["n_kept_lines"] == 4
        assert got[1]["clean_text"].count("\n") == 3
        # every line of doc 2 trips a different filter (markers are
        # case-insensitive, curly brace kills code lines)
        assert got[2]["n_lines"] == 5 and got[2]["n_kept_lines"] == 0
        assert got[2]["clean_text"] == ""
        # empty document: split yields one empty line, nothing kept
        assert got[3]["n_lines"] == 1 and got[3]["n_kept_lines"] == 0

    def test_redaction_and_counts(self, spark):
        got = self._run(
            spark,
            [
                (1, "Mail a.b+c@x.co.uk and d@e.io about it.\n"
                    "See https://ex.com/p?q=1#f and http://plain.org soon.\n"
                    "Hosts 10.0.0.1 and 192.168.255.7 respond."),
                (2, "Not emails: foo@bar and @handle stay put.\n"
                    "Version 1.2.3 is not an IP address."),
            ],
        )
        c1 = got[1]["clean_text"]
        assert c1.splitlines() == [
            "Mail <EMAIL> and <EMAIL> about it.",
            "See <URL> and <URL> soon.",
            "Hosts <IP> and <IP> respond.",
        ]
        assert (got[1]["n_email"], got[1]["n_url"], got[1]["n_ipv4"]) == (2, 2, 2)
        # no TLD / bare handle / 3-part version: not PII, left intact
        c2 = got[2]["clean_text"]
        assert "foo@bar" in c2 and "@handle" in c2 and "1.2.3" in c2
        assert (got[2]["n_email"], got[2]["n_url"], got[2]["n_ipv4"]) == (0, 0, 0)

    def test_url_swallows_its_email_shaped_userinfo(self, spark):
        # redaction order: the URL goes first, so credentials-in-URL
        # don't leave a half-redacted tail
        got = self._run(spark, [(1, "Fetch https://user@host.com/path today ok.")])
        assert got[1]["clean_text"] == "Fetch <URL> today ok."
        # ...but the audit count still sees the email-shaped substring
        assert got[1]["n_url"] == 1 and got[1]["n_email"] == 1


def test_dedup_against_incremental(spark):
    """Snapshot anti-join + within-batch keep-first; chains on the
    exact_dedup digest shape (cross-engine parity is pinned by the
    doc_incremental_dedup catalog oracle)."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        dedup_against,
        exact_dedup,
    )

    prior = spark.createDataFrame(
        [(1, "old news"), (2, "evergreen")], "doc_id long, text string"
    )
    seen = exact_dedup(prior).select("content_hash")
    batch = spark.createDataFrame(
        [
            (10, "old news"),      # already ingested -> dropped
            (11, "fresh take"),    # novel
            (12, "fresh take"),    # in-batch dup -> loses to 11
            (13, "evergreen"),     # already ingested -> dropped
            (14, "another one"),   # novel
        ],
        "doc_id long, text string",
    )
    out = dedup_against(batch, seen)
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 14]
    assert out.columns == ["doc_id", "text"]  # digest column projected away

    # chaining: survivors' digests extend the snapshot; re-ingesting the
    # same batch against the extended snapshot yields nothing new
    seen2 = seen.unionAll(
        exact_dedup(out).select("content_hash")
    )
    assert dedup_against(batch, seen2).count() == 0


def test_incremental_near_dup_recall_vs_exact(spark):
    """Batch-vs-snapshot LSH with signature-estimated verification finds
    every cross-parity pair the full exact run confirms at Jaccard>=0.5
    (same bands -> identical candidate generation; the estimator only
    replaces the verify step), and reports pairs in the right
    direction (batch=odd, snapshot=even)."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        minhash_band_snapshot,
        minhash_lsh_pairs,
        minhash_lsh_pairs_against,
    )

    from .conftest import SF_ORACLE

    doc = load_table(spark, SF_ORACLE, "documents")
    snap = minhash_band_snapshot(
        doc.filter(F.col("doc_id") % 2 == 0), num_hashes=8, bands=4, n=5
    )
    inc = minhash_lsh_pairs_against(
        doc.filter(F.col("doc_id") % 2 == 1), snap,
        num_hashes=8, bands=4, n=5, threshold=0.25,
    ).collect()
    assert all(
        r["batch_id"] % 2 == 1 and r["snapshot_id"] % 2 == 0 for r in inc
    )
    assert all(0.25 <= r["est_jaccard"] <= 1.0 for r in inc)

    exact = minhash_lsh_pairs(
        doc, num_hashes=8, bands=4, n=5, threshold=0.5
    ).collect()
    cross = {
        frozenset((r["id1"], r["id2"]))
        for r in exact
        if r["id1"] % 2 != r["id2"] % 2
    }
    got = {frozenset((r["batch_id"], r["snapshot_id"])) for r in inc}
    assert cross <= got  # estimator never loses a confirmed pair here

    # the snapshot state is a few strings per doc — exactly the schema a
    # 100 TB deployment persists and unions batch-over-batch
    assert set(snap.columns) == {"id", "sig", "band", "band_sig"}
    assert snap.filter(F.size("sig") != 8).count() == 0


def test_assign_row_ids_contiguous_and_partition_independent(spark):
    """Global ids are 0..n-1 in the requested total order, equal to the
    naive single-window formulation, and independent of the input's
    partition layout (offsets absorb wherever Spark draws the range
    boundaries)."""
    from adventureworks_pysparkjobs_spark.operators.sampling import (
        assign_row_ids,
    )

    from .conftest import SF_ORACLE

    doc = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    out = assign_row_ids(doc, ["n_chars", "doc_id"]).collect()
    n = len(out)
    assert sorted(r["row_id"] for r in out) == list(range(n))
    want_order = [
        d for _, d in sorted((r["n_chars"], r["doc_id"]) for r in out)
    ]
    got_order = [
        r["doc_id"] for r in sorted(out, key=lambda r: r["row_id"])
    ]
    assert got_order == want_order

    again = assign_row_ids(
        doc.repartition(7, "doc_id"), ["n_chars", "doc_id"]
    ).collect()
    assert {r["doc_id"]: r["row_id"] for r in again} == {
        r["doc_id"]: r["row_id"] for r in out
    }


class TestEmbedTexts:
    """Embedding-generation seam (injected encoder over mapInPandas) —
    produces the (id, vec) shape the whole similarity stack consumes."""

    @staticmethod
    def _fake_encoder(texts):
        import numpy as np

        # deterministic, content-dependent, batch-size-agnostic
        out = np.zeros((len(texts), 8), dtype=np.float32)
        for i, t in enumerate(texts):
            for j, ch in enumerate(t.encode()[:64]):
                out[i, j % 8] += float(ch)
        out += 1.0  # never the zero vector
        return out

    def test_shape_alignment_and_determinism(self, spark):
        import math

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            embed_texts,
        )

        from .conftest import SF_ORACLE

        docs = load_table(spark, SF_ORACLE, "documents").limit(100)
        out = embed_texts(docs, encoder=self._fake_encoder)
        rows = {r["doc_id"]: list(r["embedding"]) for r in out.collect()}
        assert set(rows) == {
            r["doc_id"] for r in docs.select("doc_id").collect()
        }
        assert all(len(v) == 8 for v in rows.values())
        # normalized: unit L2 (float32 tolerance)
        for v in rows.values():
            assert math.isclose(
                sum(x * x for x in v), 1.0, rel_tol=1e-5
            )
        # partitioning (hence Arrow batch boundaries) must not matter
        again = {
            r["doc_id"]: list(r["embedding"])
            for r in embed_texts(
                docs.repartition(7), encoder=self._fake_encoder
            ).collect()
        }
        assert again == rows

    def test_composes_with_similarity_stack(self, spark):
        import math

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            cosine_topk,
            embed_texts,
        )

        # docs 1/2 and 3/4 are textual twins; their embeddings must be
        # each other's nearest neighbour at cosine ~1 (self excluded)
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma"),
                (2, "alpha beta gamma"),
                (3, "delta epsilon"),
                (4, "delta epsilon"),
                (5, "something else entirely here"),
            ],
            "doc_id long, text string",
        )
        emb = embed_texts(docs, encoder=self._fake_encoder).withColumnRenamed(
            "doc_id", "vec_id"
        )
        top = cosine_topk(emb, emb, k=1)
        got = {
            r["query_id"]: (r["neighbor_id"], r["cosine_sim"])
            for r in top.collect()
        }
        for a, b in [(1, 2), (2, 1), (3, 4), (4, 3)]:
            nid, sim = got[a]
            assert nid == b and math.isclose(sim, 1.0, rel_tol=1e-6)

    def test_default_encoder_is_runnable_hashing_tf(self, spark):
        # r9: the default encoder is the md5 hashing n-gram encoder —
        # embed_texts runs end-to-end with zero injected code, and the
        # output is L2-normalized float32 of the default dim.
        import math

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            embed_texts,
        )

        df = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["embedding"] for r in embed_texts(df).collect()}
        assert len(out[1]) == 256
        assert out[1] == out[2]  # deterministic: same text, same vector
        assert math.isclose(
            sum(v * v for v in out[1]), 1.0, rel_tol=1e-5
        )  # unit norm
        assert all(v == 0.0 for v in out[3])  # empty text -> zero vector


def test_profile_diff_flags_drift(spark):
    """Drift report between two snapshot profiles: added/removed
    columns, null-fraction jumps, range changes — the pre-publish gate
    of a scheduled ingest."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        profile_diff,
        profile_table,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )
    # next snapshot: `name` dropped, `flag` added, score grows nulls
    # and a larger max, one extra row
    new = spark.createDataFrame(
        [(1, 99.0, True), (2, None, False), (3, None, True), (4, 20.0, True)],
        "id long, score double, flag boolean",
    )
    diff = {
        r["column"]: r
        for r in profile_diff(
            profile_table(old, exact_distinct=True),
            profile_table(new, exact_distinct=True),
        ).collect()
    }
    assert set(diff) == {"id", "name", "score", "flag"}
    assert diff["name"]["presence"] == "removed"
    assert diff["flag"]["presence"] == "added"
    assert diff["id"]["presence"] == "common"

    s = diff["score"]
    assert s["old_n_nulls"] == 0 and s["new_n_nulls"] == 2
    assert abs(s["null_fraction_delta"] - 0.5) < 1e-12
    assert s["min_max_changed"]  # max 30.0 -> 99.0
    assert s["old_n_distinct"] == 3 and s["new_n_distinct"] == 2

    i = diff["id"]
    assert i["old_n_rows"] == 3 and i["new_n_rows"] == 4
    assert i["min_max_changed"]  # max id 3 -> 4


def test_union_evolved_aligns_drifted_schemas(spark):
    """Snapshot series across schema changes: first-seen column order,
    NULL backfill for columns a frame predates, all rows kept."""
    from adventureworks_pysparkjobs_spark.operators.relational import (
        union_evolved,
    )

    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    )
    v3 = spark.createDataFrame(  # column dropped + new column
        [(3, True, 0.9)], "id long, flag boolean, score double"
    )
    out = union_evolved([v1, v2, v3])
    assert out.columns == ["id", "name", "score", "flag"]
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1]["score"] is None and rows[1]["flag"] is None
    assert rows[2]["score"] == 0.5 and rows[2]["flag"] is None
    assert rows[3]["name"] is None and rows[3]["flag"] is True

    # a flat n-way union, not a nested ladder of projections
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") == 1, plan[:800]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        union_evolved([])


def test_scd2_from_changes_compresses_and_builds_intervals(spark):
    """Type-2 SCD: consecutive identical attribute versions compress to
    one interval; each transition closes the previous interval; the last
    version per key is current (multi-attr: ANY attr change opens a new
    version)."""
    from adventureworks_pysparkjobs_spark.operators.relational import (
        scd2_from_changes,
    )

    rows = [
        # key, seq, status, tier
        (1, 1, "O", "gold"),
        (1, 2, "O", "gold"),     # no change -> compressed away
        (1, 3, "F", "gold"),     # status change
        (1, 4, "F", "silver"),   # tier change (second attr)
        (2, 1, "O", "gold"),     # single-version key
    ]
    df = spark.createDataFrame(
        rows, "k long, seq long, status string, tier string"
    )
    out = {
        (r["k"], r["valid_from"]): (
            r["status"], r["tier"], r["valid_to"], r["is_current"]
        )
        for r in scd2_from_changes(
            df, key="k", order_by=["seq"], attrs=["status", "tier"]
        ).collect()
    }
    assert out == {
        (1, 1): ("O", "gold", 3, False),
        (1, 3): ("F", "gold", 4, False),
        (1, 4): ("F", "silver", None, True),
        (2, 1): ("O", "gold", None, True),
    }


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Every near-dup pair lands in the SAME split (the leakage guard),
    and the split fraction is hash-driven, not order-driven."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from adventureworks_pysparkjobs_spark.operators.sampling import (
        leakage_safe_split,
    )

    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    pairs = ngram_jaccard_pairs(docs, n=5, threshold=0.5, max_shingle_df=1000)
    out = leakage_safe_split(
        docs.select("doc_id", "source"), pairs, test_fraction=0.1
    )
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(split_of) == docs.count()
    crossing = [
        (r["id1"], r["id2"])
        for r in pairs.collect()
        if split_of[r["id1"]] != split_of[r["id2"]]
    ]
    assert crossing == []  # no near-dup pair straddles the split
    assert {"train", "test"} >= set(split_of.values())


def test_scd2_merge_incremental_equals_full_rebuild(spark):
    """Applying the order-status change stream in two time-split batches
    via scd2_merge equals one scd2_from_changes over the full stream —
    including keys untouched by the second batch (anti-join passthrough),
    keys extended by it, and keys first seen in it."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.relational import (
        scd2_from_changes,
        scd2_merge,
    )

    from .conftest import SF_ORACLE

    from adventureworks_pysparkjobs_spark.operators.dedup import (
        dedup_keep_first,
    )

    # honor the merge contract: one change per (key, timestamp) — keep
    # the deterministic first order where a customer ordered twice a day
    orders = dedup_keep_first(
        load_table(spark, SF_ORACLE, "orders"),
        ["o_custkey", "o_orderdate"],
        ["o_orderkey"],
    )
    cut = "1998-01-01"
    early = orders.filter(F.col("o_orderdate") < cut)
    late = orders.filter(F.col("o_orderdate") >= cut)
    hist1 = scd2_from_changes(
        early, key="o_custkey", order_by=["o_orderdate"],
        attrs=["o_orderstatus"],
    )
    merged = scd2_merge(
        hist1, late, key="o_custkey", order_col="o_orderdate",
        attrs=["o_orderstatus"],
    )
    full = scd2_from_changes(
        orders, key="o_custkey", order_by=["o_orderdate"],
        attrs=["o_orderstatus"],
    )

    def rows(df):
        return {
            (r["o_custkey"], r["o_orderstatus"], r["valid_from"],
             r["valid_to"], r["is_current"])
            for r in df.collect()
        }

    assert rows(merged) == rows(full)

    # validate=True on the same in-order merge: contract holds, result
    # unchanged.
    ok = scd2_merge(
        hist1, late, key="o_custkey", order_col="o_orderdate",
        attrs=["o_orderstatus"], validate=True,
    )
    assert rows(ok) == rows(full)


def test_scd2_merge_validate_rejects_out_of_order_batch(spark):
    """A late batch whose changes predate a key's max(valid_from) cannot
    be merged correctly (closed intervals can't re-split); validate=True
    must fail loudly instead of silently producing wrong intervals,
    naming the offending keys."""
    import pytest as _pytest

    from adventureworks_pysparkjobs_spark.operators.relational import (
        scd2_from_changes,
        scd2_merge,
    )

    hist = scd2_from_changes(
        spark.createDataFrame(
            [(1, "A", "2024-01-01"), (1, "B", "2024-03-01"),
             (2, "A", "2024-02-01")],
            "k long, status string, d string",
        ),
        key="k", order_by=["d"], attrs=["status"],
    )
    late_batch = spark.createDataFrame(
        [(1, "C", "2024-02-01")],  # predates key 1's max valid_from
        "k long, status string, d string",
    )
    with _pytest.raises(ValueError, match="out-of-order"):
        scd2_merge(
            hist, late_batch, key="k", order_col="d",
            attrs=["status"], validate=True,
        )
    # without validate the (documented) contract is the caller's job —
    # the merge itself stays lazy and raises nothing
    scd2_merge(
        hist, late_batch, key="k", order_col="d", attrs=["status"]
    ).collect()


def test_stratified_sample_exact_quotas_and_partition_independence(spark):
    """Every stratum keeps EXACTLY floor(frac * n) rows (the operator's
    contract vs hash-threshold sampling's binomial wobble), membership
    is deterministic, and the kept set is independent of the input
    partitioning."""
    from adventureworks_pysparkjobs_spark.operators.sampling import (
        stratified_sample,
    )
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    kept = stratified_sample(docs, "source", 0.3, "doc_id")
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    import math

    assert got == {s: math.floor(0.3 * n) for s, n in totals.items() if n >= 4}
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7, "doc_id"), "source", 0.3, "doc_id"
        ).collect()
    }
    assert ids1 == ids2


def test_inverted_index_filters_df_before_collecting_postings(spark):
    """Correctness: df bounds respected, postings sorted + capped.
    Scale shape: the df-band filter must apply BEFORE the posting-list
    aggregation (the collect_list groupBy consumes a JOIN of the token
    stream with the filtered df table), so a stop token's full posting
    list never materializes."""
    from adventureworks_pysparkjobs_spark.operators.text import inverted_index
    from adventureworks_pysparkjobs_spark.plans.inspect import physical_plan

    rows = [
        (1, "alpha beta common"),
        (2, "alpha gamma common"),
        (3, "beta gamma common"),
        (4, "alpha beta gamma common"),
        (5, "solo common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = inverted_index(df, min_df=2, max_df=4, max_postings=2)
    got = {r["token"]: (r["doc_freq"], r["postings_csv"]) for r in idx.collect()}
    # 'common' (df=5) exceeds max_df; 'solo' (df=1) under min_df
    assert set(got) == {"alpha", "beta", "gamma"}
    assert got["alpha"] == (3, "1,2")  # sorted, capped at 2 of [1,2,4]
    assert got["beta"] == (3, "1,3")
    assert got["gamma"] == (3, "2,3")
    plan = physical_plan(idx)
    # the posting-list aggregate sits above a join, and the df count
    # aggregate below it carries no collect_list
    i_join = min(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin")) \
        if "SortMergeJoin" in plan and "BroadcastHashJoin" in plan \
        else max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
    assert i_join != -1, plan[:1200]
    assert "collect_list" in plan[:plan.find("Join")] or \
        plan.find("collect_list") < i_join, (
        "posting collection does not sit above the df-filter join:\n"
        + plan[:1500]
    )


class TestJsonlQuarantine:
    def test_good_and_bad_lines_split(self, spark, tmp_path):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from adventureworks_pysparkjobs_spark.sources.files import (
            read_jsonl_quarantine,
        )

        p = tmp_path / "docs.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "hello"}\n'
            '{"doc_id": 2, "text": "world"}\n'
            '{"doc_id": 3, "text": "trunca'  # malformed line
            "\n"
            "not json at all\n"
            '{"doc_id": 4, "text": "ok"}\n'
        )
        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )
        good, quarantine = read_jsonl_quarantine(spark, str(p), schema)
        assert {r["doc_id"] for r in good.collect()} == {1, 2, 4}
        bad = [r["raw"] for r in quarantine.collect()]
        assert len(bad) == 2
        assert any("trunca" in b for b in bad)
        assert any("not json" in b for b in bad)

    def test_rejects_schema_with_corrupt_col(self, spark, tmp_path):
        import pytest as _pytest
        from pyspark.sql.types import StringType, StructField, StructType

        from adventureworks_pysparkjobs_spark.sources.files import (
            read_jsonl_quarantine,
        )

        schema = StructType([StructField("_corrupt_record", StringType())])
        with _pytest.raises(ValueError, match="must not already contain"):
            read_jsonl_quarantine(spark, str(tmp_path), schema)


class TestMultiprobeLsh:
    def test_recall_never_worse_and_subset_of_exact_problem(self, spark):
        """Multi-probe candidates are a superset of single-probe, so
        per-query recall vs the exact top-k can only improve."""
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            ann_topk_lsh,
            cosine_topk,
        )
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        from .conftest import SF_SMOKE

        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = emb.limit(8)

        def hits(df):
            return {
                (r["query_id"], r["neighbor_id"]) for r in df.collect()
            }

        exact = hits(cosine_topk(emb, q, k=5))
        single = hits(ann_topk_lsh(emb, q, k=5, num_planes=4, dim=64))
        multi = hits(
            ann_topk_lsh(
                emb, q, k=5, num_planes=4, dim=64, multiprobe=True
            )
        )
        # candidate superset => recalled-set superset: a single-probe
        # hit can only be displaced by a higher-cosine candidate, which
        # is itself an exact top-k member
        assert multi & exact >= single & exact
        # on this fixture (random vectors, weak angular locality) the
        # 1-bit probes must strictly widen the candidate surface
        assert len(multi) >= len(single)

    def test_radius2_production_config_recall(self, spark):
        """The shipped srp_lsh_mp config (5 planes, Hamming radius 2 =
        16 of 32 buckets probed) must clear the same 0.5 recall floor
        the catalog oracle asserts — observed .78-.80 on the fixtures,
        so 0.55 here leaves regeneration margin while failing any
        regression to the old p4r1 config (observed .42-.46)."""
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            ann_topk_lsh,
            cosine_topk,
        )
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        from .conftest import SF_SMOKE

        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = emb.filter(F.col("vec_id") % 50 == 0)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        mp = {
            (r["query_id"], r["neighbor_id"])
            for r in ann_topk_lsh(
                emb, q, k=5, num_planes=5, dim=64, multiprobe=2
            ).collect()
        }
        recall = len(exact & mp) / len(exact)
        assert recall >= 0.55, f"radius-2 recall {recall:.2f} below floor"


class TestShingleSimhash:
    def test_copied_text_matches_scrambled_vocab_does_not(self, spark):
        """The r4 semantic: shingle-feature simhash flags COPIED text,
        not shared vocabulary. A near-verbatim copy lands within the
        Hamming radius; a doc using the same words in scrambled order
        (different shingles) does not."""
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            simhash_pairs,
        )

        base = " ".join(
            f"token{i:03d} word{i % 37} item{i % 53}" for i in range(40)
        )  # 120 words -> ~116 5-gram shingles
        words = base.split()
        scrambled = " ".join(words[::-1])  # same vocab, reversed order
        near_copy = base.replace("token020", "changed020")  # 1-word edit
        df = spark.createDataFrame(
            [(1, base), (2, near_copy), (3, scrambled)],
            ["doc_id", "text"],
        )
        pairs = {
            (r["id1"], r["id2"])
            for r in simhash_pairs(
                df, bits=32, bands=4, max_hamming=3, n=5
            ).collect()
        }
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs


class TestFeatureCorrelations:
    def _run(self, spark, rows):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            feature_correlations,
        )

        df = spark.createDataFrame(rows, "x double, y double, z double")
        out = feature_correlations(
            df,
            {"x": "decimal(14,2)", "y": "decimal(14,2)",
             "z": "decimal(14,2)"},
        )
        return {(r["col_a"], r["col_b"]): r for r in out.collect()}

    def test_linear_and_anti_linear(self, spark):
        rows = [(float(i), 2.0 * i + 1, -3.0 * i) for i in range(10)]
        out = self._run(spark, rows)
        assert out[("x", "y")]["pearson_r"] == pytest.approx(1.0)
        assert out[("x", "z")]["pearson_r"] == pytest.approx(-1.0)
        assert out[("y", "z")]["pearson_r"] == pytest.approx(-1.0)
        assert out[("x", "y")]["n_rows"] == 10

    def test_covariance_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        xs = np.round(rng.uniform(0, 100, 50), 2)
        ys = np.round(rng.uniform(0, 100, 50), 2)
        rows = [(float(a), float(b), float(a)) for a, b in zip(xs, ys)]
        out = self._run(spark, rows)
        exp = float(np.cov(xs, ys, ddof=1)[0][1])
        assert out[("x", "y")]["covar_samp"] == pytest.approx(exp, rel=1e-9)

    def test_null_rows_dropped_listwise(self, spark):
        rows = [(1.0, 2.0, 3.0), (2.0, None, 4.0), (3.0, 6.0, 5.0)]
        out = self._run(spark, rows)
        assert out[("x", "z")]["n_rows"] == 2

    def test_requires_two_columns(self, spark):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            feature_correlations,
        )

        df = spark.range(3).select(F.col("id").cast("double").alias("x"))
        with pytest.raises(ValueError):
            feature_correlations(df, {"x": "decimal(14,2)"})


class TestPPSSystematicSample:
    def _sample(self, spark, rows, k, parts=None):
        from adventureworks_pysparkjobs_spark.operators.sampling import (
            pps_systematic_sample,
        )

        df = spark.createDataFrame(rows, "id long, w long")
        if parts:
            df = df.repartition(parts)
        return {
            r["id"]: r["n_picks"]
            for r in pps_systematic_sample(df, "id", "w", k=k).collect()
        }

    def test_total_picks_is_exactly_k(self, spark):
        rows = [(i, (i % 7) + 1) for i in range(200)]
        out = self._sample(spark, rows, k=40)
        assert sum(out.values()) == 40

    def test_partition_independent(self, spark):
        rows = [(i, (i * 13) % 11 + 1) for i in range(150)]
        assert self._sample(spark, rows, k=25) == self._sample(
            spark, rows, k=25, parts=17
        )

    def test_heavy_row_always_picked_zero_never(self, spark):
        # one row holds > W/k weight -> must be picked (>= 1 time);
        # zero-weight rows can never be picked.
        rows = [(0, 1000)] + [(i, 1) for i in range(1, 50)] + [(99, 0)]
        out = self._sample(spark, rows, k=10)
        assert out[0] >= 1
        assert 99 not in out
        # expected picks for the heavy row ~ k*w/W = 10*1000/1049 ~ 9
        assert out[0] >= 8

    def test_total_weight_zero_raises(self, spark):
        from adventureworks_pysparkjobs_spark.operators.sampling import (
            pps_systematic_sample,
        )

        df = spark.createDataFrame([(1, 0), (2, 0)], "id long, w long")
        with pytest.raises(ValueError):
            pps_systematic_sample(df, "id", "w", k=5)


class TestGroupedOLS:
    def _run(self, spark, rows):
        from adventureworks_pysparkjobs_spark.operators.profile import (
            grouped_ols,
        )

        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = grouped_ols(df, ["g"], "x", "y")
        return {r["g"]: r for r in out.collect()}

    def test_exact_lines_per_group(self, spark):
        rows = [("a", float(i), 2.0 * i + 1) for i in range(10)]
        rows += [("b", float(i), -3.0 * i + 5) for i in range(8)]
        out = self._run(spark, rows)
        assert out["a"]["regr_slope"] == pytest.approx(2.0)
        assert out["a"]["regr_intercept"] == pytest.approx(1.0)
        assert out["a"]["regr_r2"] == pytest.approx(1.0)
        assert out["b"]["regr_slope"] == pytest.approx(-3.0)
        assert out["b"]["regr_intercept"] == pytest.approx(5.0)
        assert out["a"]["n_rows"] == 10 and out["b"]["n_rows"] == 8

    def test_matches_numpy_lstsq(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        xs = np.round(rng.uniform(0, 100, 60), 2)
        ys = np.round(3.5 * xs + rng.normal(0, 10, 60), 2)
        rows = [("g", float(a), float(b)) for a, b in zip(xs, ys)]
        out = self._run(spark, rows)
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0][1]
        assert out["g"]["regr_slope"] == pytest.approx(slope, rel=1e-9)
        assert out["g"]["regr_intercept"] == pytest.approx(
            intercept, rel=1e-9
        )
        assert out["g"]["regr_r2"] == pytest.approx(r * r, rel=1e-9)

    def test_degenerate_groups_yield_null(self, spark):
        rows = [
            ("single", 1.0, 2.0),              # n = 1
            ("flatx", 4.0, 1.0), ("flatx", 4.0, 9.0),  # zero x-variance
        ]
        out = self._run(spark, rows)
        assert out["single"]["regr_slope"] is None
        assert out["flatx"]["regr_slope"] is None
        assert out["flatx"]["regr_r2"] is None

    def test_null_rows_dropped(self, spark):
        rows = [("g", 1.0, 2.0), ("g", None, 9.0), ("g", 3.0, 6.0)]
        out = self._run(spark, rows)
        assert out["g"]["n_rows"] == 2


class TestSemanticDedup:
    def _run(self, spark, rows, num=95, den=100):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            semantic_dedup,
        )

        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = semantic_dedup(
            df, threshold_num=num, threshold_den=den
        )
        return {r["vec_id"]: (r["n_dup_lower"], r["is_kept"])
                for r in out.collect()}

    def test_identical_vectors_keep_smallest_id(self, spark):
        v = [1.0, 0.0, 0.0]
        out = self._run(
            spark, [(3, v, 0), (1, v, 0), (2, v, 0), (9, [0.0, 1.0, 0.0], 0)]
        )
        assert out[1] == (0, True)       # smallest id survives
        assert out[2] == (1, False)      # dup of 1
        assert out[3] == (2, False)      # dup of 1 and 2
        assert out[9] == (0, True)       # orthogonal: kept

    def test_cluster_boundary_blocks_comparison(self, spark):
        v = [1.0, 1.0]
        out = self._run(spark, [(1, v, 0), (2, v, 1)])
        assert out[1] == (0, True) and out[2] == (0, True)

    def test_threshold_excludes_moderate_similarity(self, spark):
        # cos(a,b) = 0.8 — dup at 0.75, not at 0.95.
        a, b = [1.0, 0.0], [0.8, 0.6]
        strict = self._run(spark, [(1, a, 0), (2, b, 0)], num=95, den=100)
        loose = self._run(spark, [(1, a, 0), (2, b, 0)], num=75, den=100)
        assert strict[2][1] is True
        assert loose[2][1] is False

    def test_negative_cosine_never_dup(self, spark):
        out = self._run(
            spark, [(1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 0)], num=0, den=100
        )
        assert out[2][1] is True  # dot < 0 fails the dot > 0 guard

    def test_decimal_overflow_fails_loud_not_silent(self, spark):
        # ADVICE r4: non-unit-norm embeddings big enough that
        # na*nb*num^2 exceeds decimal(38,0) used to NULL the threshold
        # compare and silently drop true duplicate pairs. Now the
        # operator raises with a rescale hint instead.
        import pyspark.errors

        big = [100.0] * 100  # |v|^2 = (1e8)^2*100 = 1e18 quantized
        with pytest.raises(Exception, match="semantic_dedup.*overflow"):
            self._run(spark, [(1, big, 0), (2, big, 0)])

    def test_unit_norm_headroom_unaffected_by_guard(self, spark):
        # the guard must not fire anywhere in the contract's domain
        v = [0.6, 0.8]
        out = self._run(spark, [(1, v, 0), (2, v, 0)])
        assert out[1] == (0, True) and out[2] == (1, False)


class TestKmeansAssign:
    def _run(self, spark, rows, k=2, iterations=3, parts=None):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            kmeans_assign,
        )

        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        if parts:
            df = df.repartition(parts)
        out = kmeans_assign(df, k=k, iterations=iterations)
        return {r["vec_id"]: (r["cluster"], r["dist2"])
                for r in out.collect()}

    def test_two_separated_blobs(self, spark):
        rows = (
            [(0, [0.0, 0.1]), (1, [10.0, 10.1])]   # init: one per blob
            + [(i, [0.2, -0.1]) for i in range(2, 6)]
            + [(i, [10.3, 9.8]) for i in range(6, 10)]
        )
        out = self._run(spark, rows)
        assert {v for i, (v, _) in out.items() if i in (0, 2, 3, 4, 5)} == {0}
        assert {v for i, (v, _) in out.items() if i in (1, 6, 7, 8, 9)} == {1}

    def test_empty_cluster_carries_over_and_reacquires(self, spark):
        # Identical init vectors: iteration 1 ties every point to the
        # smaller centroid id, leaving cluster 1 EMPTY — the carry-over
        # must keep its state (no crash, no NaN), and in iteration 2
        # the carried centroid (still at the origin) legitimately
        # re-acquires the origin points after cluster 0 moves to the
        # global mean. Fixed point: origin points -> 1, outlier -> 0.
        rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])]
        out = self._run(spark, rows)
        assert out[0][0] == 1 and out[1][0] == 1 and out[2][0] == 0
        assert out[0][1] == 0.0  # exact zero distance to the carried centroid

    def test_partition_independent_bitwise(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)
        ]
        a = self._run(spark, rows, k=4)
        b = self._run(spark, rows, k=4, parts=13)
        assert a == b  # incl. bitwise dist2 doubles


class TestNewOperatorEdges:
    def test_triangles_empty_edges(self, spark):
        from adventureworks_pysparkjobs_spark.operators.graph import (
            triangle_counts,
        )

        df = spark.createDataFrame([], "a int, b int")
        assert triangle_counts(df).count() == 0

    def test_kmeans_fewer_vectors_than_k(self, spark):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            kmeans_assign,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id long, embedding array<float>",
        )
        out = {r["vec_id"]: r["cluster"]
               for r in kmeans_assign(df, k=5, iterations=2).collect()}
        # Every vector is its own centroid: identity assignment.
        assert out == {1: 1, 2: 2}

    def test_semantic_dedup_single_row(self, spark):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            semantic_dedup,
        )

        df = spark.createDataFrame(
            [(7, [1.0], 0)], "vec_id long, embedding array<float>, label int"
        )
        [r] = semantic_dedup(df).collect()
        assert (r["vec_id"], r["n_dup_lower"], r["is_kept"]) == (7, 0, True)

    def test_correlations_constant_column_yields_null(self, spark):
        # Zero variance -> 0/0 divisor: NULL (try_divide), matching
        # DuckDB's division-by-zero semantics — not an ANSI error and
        # not a wrong 0.
        from adventureworks_pysparkjobs_spark.operators.profile import (
            feature_correlations,
        )

        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
        )
        [r] = feature_correlations(
            df, {"x": "decimal(14,2)", "y": "decimal(14,2)"}
        ).collect()
        assert r["pearson_r"] is None
        assert r["covar_samp"] == 0.0

    def test_k_anonymize_empty_input(self, spark):
        from adventureworks_pysparkjobs_spark.operators.quality import (
            k_anonymize,
        )

        df = spark.createDataFrame([], "seg string, val double")
        out = k_anonymize(
            df, {"s": F.col("seg")}, k=2
        )
        assert out.count() == 0

    def test_hashed_scores_empty_weights(self, spark):
        from adventureworks_pysparkjobs_spark.operators.lm import (
            hashed_linear_scores,
        )

        weights = spark.createDataFrame([], "feature int, w_scaled long")
        df = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        [r] = hashed_linear_scores(df, weights).collect()
        assert (r["n_tokens"], r["logit_scaled"], r["is_positive"]) == (
            3, 0, False,
        )


class TestContrastivePairs:
    def _pairs(self, spark, n=40, parts=None):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            contrastive_pairs,
        )

        rows = [
            (i, [float((i * 7 + d) % 13) for d in range(4)])
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        if parts:
            df = df.repartition(parts)
        anchors = df.filter(F.col("vec_id") % 10 == 0)
        return contrastive_pairs(df, anchors, k_pos=2, k_neg=3)

    def test_counts_and_disjointness(self, spark):
        out = self._pairs(spark).collect()
        by_anchor = {}
        for r in out:
            by_anchor.setdefault(r["anchor_id"], {"pos": set(), "neg": set()})
            by_anchor[r["anchor_id"]][r["label"]].add(r["other_id"])
        for a, d in by_anchor.items():
            assert len(d["pos"]) == 2 and len(d["neg"]) == 3
            assert not d["pos"] & d["neg"]          # disjoint
            assert a not in d["pos"] | d["neg"]     # no self-pairs

    def test_deterministic_under_partitioning(self, spark):
        key = lambda rows: sorted(
            (r["anchor_id"], r["other_id"], r["label"], r["rnk"])
            for r in rows
        )
        assert key(self._pairs(spark).collect()) == key(
            self._pairs(spark, parts=11).collect()
        )


class TestBM25TopK:
    def _run(self, spark, rows, terms, k=3):
        from adventureworks_pysparkjobs_spark.operators.text import bm25_topk

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return bm25_topk(df, terms, k=k).collect()

    def test_tf_and_rarity_ordering(self, spark):
        rows = [
            (1, "apple apple apple pie"),       # high tf for apple
            (2, "apple banana cherry date"),    # one apple
            (3, "banana banana banana banana"), # no apple
            (4, "kiwi lime mango peach"),
        ]
        out = self._run(spark, rows, ["apple"], k=2)
        assert [r["doc_id"] for r in out] == [1, 2]
        assert out[0]["bm25"] > out[1]["bm25"]

    def test_multi_term_sum_and_k(self, spark):
        rows = [(i, "common filler words here") for i in range(1, 6)]
        rows += [(10, "alpha beta common"), (11, "alpha common filler")]
        out = self._run(spark, rows, ["alpha", "beta"], k=5)
        ids = [r["doc_id"] for r in out]
        # doc 10 matches both terms -> outranks doc 11 (alpha only)
        assert ids[0] == 10 and ids[1] == 11
        assert len(out) <= 5

    def test_empty_terms_raises(self, spark):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.operators.text import bm25_topk

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            bm25_topk(df, [])


class TestTemperatureMixtureRates:
    def _run(self, spark, counts, steps=1):
        from adventureworks_pysparkjobs_spark.operators.sampling import (
            temperature_mixture_rates,
        )

        rows = [(g, i) for g, n in counts.items() for i in range(n)]
        df = spark.createDataFrame(rows, "g string, i int")
        return {
            r["g"]: r
            for r in temperature_mixture_rates(
                df, "g", sqrt_steps=steps
            ).collect()
        }

    def test_sqrt_rebalancing(self, spark):
        import math

        out = self._run(spark, {"big": 400, "small": 100})
        # raw shares 80/20 -> sqrt shares 20/10 = 2/3 vs 1/3
        assert out["big"]["rate"] == pytest.approx(2 / 3, abs=1e-5)
        assert out["small"]["rate"] == pytest.approx(1 / 3, abs=1e-5)
        assert out["big"]["weight_scaled"] == math.floor(
            math.sqrt(400.0) * 10**6
        )

    def test_rates_sum_to_one(self, spark):
        out = self._run(spark, {"a": 7, "b": 19, "c": 3, "d": 101})
        assert sum(r["rate"] for r in out.values()) == pytest.approx(
            1.0, abs=1e-9
        )

    def test_alpha_quarter_flattens_more(self, spark):
        half = self._run(spark, {"big": 400, "small": 25}, steps=1)
        quarter = self._run(spark, {"big": 400, "small": 25}, steps=2)
        assert quarter["small"]["rate"] > half["small"]["rate"]

    def test_invalid_steps_raises(self, spark):
        from adventureworks_pysparkjobs_spark.operators.sampling import (
            temperature_mixture_rates,
        )

        df = spark.createDataFrame([("a", 1)], "g string, i int")
        with pytest.raises(ValueError):
            temperature_mixture_rates(df, "g", sqrt_steps=0)


class TestLangidKappa:
    def test_known_confusion_matrix(self, spark):
        """Hand-checked 2-class kappa: 10 rows, 8 agree, marginals
        pred(en)=6, gold(en)=5 -> cross = 6*5+4*5 = 50,
        kappa = (10*8-50)/(100-50) = 0.6."""
        from adventureworks_pysparkjobs_spark.queries import CATALOG  # noqa: F401
        import adventureworks_pysparkjobs_spark.queries.docs as docs_mod

        rows = []
        # 4 en/en agree, 4 fr/fr agree, 1 gold-en pred-fr, 1 gold-fr pred-en
        # build texts the marker scorer labels deterministically
        en = "the and of to a"
        fr = "le la et les des"
        for i in range(4):
            rows.append((i, en, "en"))
        for i in range(4, 8):
            rows.append((i, fr, "fr"))
        rows.append((8, fr, "en"))   # pred fr, gold en
        rows.append((9, en, "fr"))   # pred en, gold fr
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        import tempfile

        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = CATALOG["corpus_langid_kappa"].builder(spark, d).collect()[0]
        assert out["n"] == 10 and out["n_agree"] == 8
        # marginals: pred en=5, fr=5; gold en=5, fr=5 -> cross=50
        assert out["chance_cross"] == 50
        assert out["kappa"] == (10 * 8 - 50) / (100 - 50)


class TestJaccardHistogram:
    def test_buckets_exact_and_clamped(self, spark):
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            jaccard_histogram,
        )

        rows = [
            (1, "a b c d"),      # with 2: shares shingles
            (2, "a b c d"),      # exact dup of 1 -> jaccard 1 -> bucket 9
            (3, "a b c x"),      # vs 1/2: inter 1 of union 3 -> bucket 3
            (4, "q r s t"),      # no shared shingles: no pair
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["bucket"]: (r["lo"], r["n_pairs"])
            for r in jaccard_histogram(df, n=3).collect()
        }
        # 3-shingles: doc1 = {abc, bcd}; doc3 = {abc, bcx}
        # (1,2): inter 2 union 2 -> 10*2 div 2 = 10 -> clamp 9
        assert out[9] == (0.9, 1)
        # (1,3) and (2,3): inter 1 union 3 -> 10 div 3 = 3
        assert out[3] == (0.3, 2)
        assert set(out) == {3, 9}


class TestLangidPrf:
    def test_hand_checked_confusion(self, spark):
        import tempfile

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        en, fr = "the and of to a", "le la et les des"
        rows = [
            (0, en, "en"), (1, en, "en"),   # 2 en TP
            (2, fr, "en"),                  # pred fr, gold en -> en FN, fr FP
            (3, fr, "fr"),                  # fr TP
            (4, None, "zh"),                # pred und, gold zh
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r["cls"]: (r["tp"], r["fp"], r["fn"], r["precision"],
                       r["recall"], r["f1"])
            for r in CATALOG["corpus_langid_prf"].builder(spark, d).collect()
        }
        assert out["en"] == (2, 0, 1, 1.0, 2 / 3, 0.8)
        assert out["fr"] == (1, 1, 0, 0.5, 1.0, 2 / 3)
        assert out["zh"] == (0, 0, 1, None, 0.0, 0.0)
        assert out["und"] == (0, 1, 0, 0.0, None, 0.0)


class TestDupNgramStats:
    def test_counts_with_within_doc_repeats(self, spark):
        from adventureworks_pysparkjobs_spark.operators.text import (
            dup_ngram_stats,
        )

        rows = [
            (1, "a b a b"),   # 2-grams: 'a b','b a','a b' (within-doc repeat)
            (2, "a b c"),     # 'a b','b c'
            (3, "x"),         # too short: no 2-grams
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        (r,) = dup_ngram_stats(df, n=2).collect()
        # slots: 3 + 2 = 5; distinct: {'a b','b a','b c'} = 3
        # 'a b' occurs 3x -> dup_slots 3, dup_grams 1
        assert (r["n_slots"], r["n_distinct"]) == (5, 3)
        assert (r["dup_slots"], r["dup_grams"]) == (3, 1)
        assert r["dup_slot_fraction"] == 3 / 5


class TestContainmentPairs:
    def test_subset_caught_jaccard_would_miss(self, spark):
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "a b c d"  # 2 trigram shingles, both inside long's set
        long_ = "a b c d " + " ".join(f"w{i}" for i in range(40))
        df = spark.createDataFrame(
            [(1, short), (2, long_), (3, "q r s t u")],
            "doc_id long, text string",
        )
        got = {
            (r["id_small"], r["id_big"]): (
                r["n_inter"], r["n_small"], r["containment"]
            )
            for r in containment_pairs(df, n=3).collect()
        }
        assert got == {(1, 2): (2, 2, 1.0)}  # fully contained
        # symmetric Jaccard at 0.5 misses the same pair entirely
        assert ngram_jaccard_pairs(df, n=3, threshold=0.5).count() == 0

    def test_tie_break_on_equal_sizes(self, spark):
        from adventureworks_pysparkjobs_spark.operators.dedup import (
            containment_pairs,
        )

        df = spark.createDataFrame(
            [(7, "x y z"), (4, "x y z")], "doc_id long, text string"
        )
        (r,) = containment_pairs(df, n=3).collect()
        assert (r["id_small"], r["id_big"]) == (4, 7)
