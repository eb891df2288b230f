"""Round-9 operator tests: the pure-Python image header codec (the r8
verdict task-3 default for the multimodal seam) and its encoders."""

from __future__ import annotations

import struct
import zlib

import pytest

from adventureworks_pysparkjobs_spark.operators.multimodal import (
    default_codec,
    encode_gif_header,
    encode_jpeg_header,
    encode_png,
    parse_image_header,
)


class TestImageHeaderCodec:
    def test_png_roundtrip_all_channel_counts(self):
        for ch in (1, 2, 3, 4):
            p = encode_png(17, 11, ch, seed=3)
            m = parse_image_header(p)
            assert (m["width"], m["height"], m["n_channels"]) == (17, 11, ch)
            assert m["feature"] is None

    def test_png_is_structurally_valid(self):
        """Signature, CRC-correct chunks, IDAT inflates to the exact raw
        scanline size — a real PNG reader would accept this file."""
        w, h, ch = 13, 7, 3
        p = encode_png(w, h, ch, seed=5)
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        i, chunks = 8, {}
        while i < len(p):
            (ln,) = struct.unpack(">I", p[i : i + 4])
            tag, data = p[i + 4 : i + 8], p[i + 8 : i + 8 + ln]
            (crc,) = struct.unpack(">I", p[i + 8 + ln : i + 12 + ln])
            assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF
            chunks[tag] = data
            i += 12 + ln
        assert set(chunks) == {b"IHDR", b"IDAT", b"IEND"}
        assert len(zlib.decompress(chunks[b"IDAT"])) == h * (1 + w * ch)

    def test_png_deterministic(self):
        assert encode_png(9, 5, 3, seed=7) == encode_png(9, 5, 3, seed=7)
        assert encode_png(9, 5, 3, seed=7) != encode_png(9, 5, 3, seed=8)

    def test_jpeg_sof_scan_skips_app_segments(self):
        j = encode_jpeg_header(640, 480, 3)
        m = parse_image_header(j)
        assert (m["width"], m["height"], m["n_channels"]) == (640, 480, 3)

    def test_jpeg_grayscale_component_count(self):
        m = parse_image_header(encode_jpeg_header(100, 60, 1))
        assert m["n_channels"] == 1

    def test_gif_little_endian_dimensions(self):
        m = parse_image_header(encode_gif_header(320, 200))
        assert (m["width"], m["height"], m["n_channels"]) == (320, 200, 3)
        # 320 = 0x0140 LE: a big-endian misread would give 0x4001 = 16385
        assert m["width"] != 16385

    def test_unknown_container_hits_the_seam(self):
        with pytest.raises(NotImplementedError):
            default_codec(b"hello world, not an image")
        with pytest.raises(NotImplementedError):
            default_codec(b"")

    def test_malformed_known_containers_fail_loud(self):
        # JPEG with no SOF before EOI
        with pytest.raises(ValueError):
            parse_image_header(b"\xff\xd8\xff\xe0\x00\x04ab\xff\xd9")
        # PNG signature but IHDR missing
        with pytest.raises(ValueError):
            parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
        # GIF truncated before the screen descriptor
        with pytest.raises(ValueError):
            parse_image_header(b"GIF89a\x01")

    def test_jpeg_truncated_sof_fails_loud(self):
        j = encode_jpeg_header(640, 480, 3)
        sof_at = j.index(b"\xff\xc0")
        with pytest.raises(ValueError):
            parse_image_header(j[: sof_at + 4])

    def test_jpeg_every_truncation_point_raises_valueerror(self):
        """r10 ADVICE fix: ANY truncation of a known-container stream must
        raise ValueError (never IndexError / struct.error), including a
        stream ending inside a 0xFF fill run or mid segment length."""
        j = encode_jpeg_header(64, 48, 3)
        for cut in range(2, len(j)):
            trunc = j[:cut]
            try:
                parse_image_header(trunc)
            except ValueError:
                pass  # the documented contract
        # ends inside a fill-byte run (payload[-1] == 0xFF)
        with pytest.raises(ValueError):
            parse_image_header(b"\xff\xd8\xff\xff\xff")
        # fill run eats the segment-length bytes
        with pytest.raises(ValueError):
            parse_image_header(b"\xff\xd8\xff\xff\xe0")

    def test_gif_frame_walk_truncation_points_raise_valueerror(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_animated_gif,
            parse_gif_frames,
        )

        g = encode_animated_gif(4, 3, 2, delay_cs=7)
        ext_at = g.index(b"\x21\xf9")
        img_at = g.index(b"\x2c", ext_at)
        # mid graphics-control extension (short delay slice)
        with pytest.raises(ValueError):
            parse_gif_frames(g[: ext_at + 3])
        # extension introducer with no label byte
        with pytest.raises(ValueError):
            parse_gif_frames(g[: ext_at + 1])
        # mid image descriptor
        with pytest.raises(ValueError):
            parse_gif_frames(g[: img_at + 5])
        # no truncation point may leak a non-ValueError
        for cut in range(7, len(g)):
            try:
                parse_gif_frames(g[:cut])
            except ValueError:
                pass


class TestHashingEncoder:
    """The r8 verdict task-4 default: md5 hashing n-gram encoder + its
    sparse posting-list twin."""

    def test_encoder_deterministic_across_calls(self):
        import numpy as np

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            hashing_text_encoder,
        )

        a = hashing_text_encoder(["hello world", "abc"], dim=64)
        b = hashing_text_encoder(["hello world", "abc"], dim=64)
        assert np.array_equal(a, b)
        assert a.shape == (2, 64) and a.dtype == np.float32

    def test_encoder_known_bucket_rule(self):
        """The bucket rule is pinned: md5 first-8-hex mod dim — the same
        rule hashed_ngram_tf and the DuckDB oracles use."""
        import hashlib

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            hashing_text_encoder,
        )

        v = hashing_text_encoder(["abc"], dim=64, n=3)[0]
        bucket = int(hashlib.md5(b"abc").hexdigest()[:8], 16) % 64
        assert v[bucket] == 1.0 and v.sum() == 1.0

    def test_short_text_still_produces_a_gram(self):
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            hashing_text_encoder,
        )

        v = hashing_text_encoder(["ab"], dim=64, n=3)[0]  # shorter than n
        assert v.sum() == 1.0

    def test_sparse_tf_matches_dense_reference(self, spark):
        """hashed_ngram_tf (Spark column ops) == a local dense
        reimplementation of the same word-bigram/md5/dim rule."""
        import hashlib
        from collections import Counter

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            hashed_ngram_tf,
        )

        rows = [
            (1, "a b c a b"),
            (2, "a b"),
            (3, "solo"),          # fewer than 2 tokens -> no grams
            (4, "x  y\tz"),       # multi-whitespace splits
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_id"], r["bucket"]): r["w"]
            for r in hashed_ngram_tf(df, dim=64, n=2).collect()
        }
        want = {}
        for did, text in rows:
            toks = text.split()
            grams = Counter(
                " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
            )
            agg = Counter()
            for g, c in grams.items():
                b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 64
                agg[(did, b)] += c
            want.update(agg)
        assert got == dict(want)

    def test_entry_cosine_matches_numpy_dense(self, spark):
        """doc_hashed_cosine_topk's bucket-join cosine == numpy cosine of
        the densified TF vectors (the dense-twin cross-check the entry
        docstring promises)."""
        import numpy as np

        from adventureworks_pysparkjobs_spark.queries import CATALOG
        from adventureworks_pysparkjobs_spark.operators.similarity import (
            hashed_ngram_tf,
        )
        from adventureworks_pysparkjobs_spark.sources.corpus import load_table

        sf = "/root/testdata/sf0.001"
        out = CATALOG["doc_hashed_cosine_topk"].builder(spark, sf).collect()
        assert out, "entry returned no rows at sf0.001"
        tf = hashed_ngram_tf(load_table(spark, sf, "documents"), dim=4096, n=2)
        dense = {}
        for r in tf.collect():
            dense.setdefault(r["doc_id"], np.zeros(4096))[r["bucket"]] = r["w"]
        for r in out:
            q, c = dense[r["query_id"]], dense[r["neighbor_id"]]
            ref = float(q @ c) / (np.linalg.norm(q) * np.linalg.norm(c))
            assert abs(r["cosine_sim"] - ref) < 1e-12, (r, ref)


class TestWavCodec:
    def test_roundtrip(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_wav,
            parse_wav_header,
        )

        m = parse_wav_header(encode_wav(44100, 2, 441, seed=3))
        assert m["sample_rate"] == 44100 and m["n_channels"] == 2
        assert m["bits_per_sample"] == 16 and m["audio_format"] == 1
        assert m["n_samples"] == 441
        assert m["duration_ms"] == 441 * 1000 // 44100  # == 10

    def test_zero_samples(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_wav,
            parse_wav_header,
        )

        m = parse_wav_header(encode_wav(8000, 1, 0))
        assert m["n_samples"] == 0 and m["duration_ms"] == 0

    def test_non_wave_hits_seam(self):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            parse_wav_header,
        )

        with _pytest.raises(NotImplementedError):
            parse_wav_header(b"RIFF\x00\x00\x00\x00AVI ")  # RIFF, not WAVE
        with _pytest.raises(NotImplementedError):
            parse_wav_header(b"hello")

    def test_truncated_fmt_fails_loud(self):
        import struct

        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            parse_wav_header,
        )

        bad = b"RIFF" + struct.pack("<I", 12) + b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
        with _pytest.raises(ValueError):
            parse_wav_header(bad)


class TestDefaultResizeCodec:
    def test_identity_resize_preserves_pixels(self):
        import struct
        import zlib

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            default_resize_codec,
            encode_png,
        )

        def idat(b):
            i, out = 8, bytearray()
            while i < len(b):
                (ln,) = struct.unpack(">I", b[i : i + 4])
                if b[i + 4 : i + 8] == b"IDAT":
                    out += b[i + 8 : i + 8 + ln]
                i += 12 + ln
            return zlib.decompress(bytes(out))

        p = encode_png(20, 12, 3, seed=4)
        same = default_resize_codec(p, 20, 12)
        assert idat(same["content"]) == idat(p)

    def test_downsample_nearest_neighbor_values(self):
        """2x2 downsample of a 4x4 grayscale picks pixels (0,0),(0,2),
        (2,0),(2,2) — values (x+y+seed)%256."""
        import struct
        import zlib

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            default_resize_codec,
            encode_png,
        )

        p = encode_png(4, 4, 1, seed=10)
        out = default_resize_codec(p, 2, 2)["content"]
        i, idat = 8, bytearray()
        while i < len(out):
            (ln,) = struct.unpack(">I", out[i : i + 4])
            if out[i + 4 : i + 8] == b"IDAT":
                idat += out[i + 8 : i + 8 + ln]
            i += 12 + ln
        raw = zlib.decompress(bytes(idat))
        # rows: filter byte + 2 pixels each
        assert list(raw) == [
            0, (0 + 0 + 10) % 256, (2 + 0 + 10) % 256,
            0, (0 + 2 + 10) % 256, (2 + 2 + 10) % 256,
        ]

    def test_non_png_hits_seam(self):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            default_resize_codec,
            encode_jpeg_header,
        )

        with _pytest.raises(NotImplementedError):
            default_resize_codec(encode_jpeg_header(8, 8), 2, 2)

    @pytest.mark.slow
    def test_resize_images_runs_with_default_codec(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_png,
            extract_features,
            resize_images,
        )

        media = spark.createDataFrame(
            [("a", bytearray(encode_png(10, 8, 3))),
             ("b", bytearray(encode_png(5, 5, 1)))],
            "path string, content binary",
        )
        out = {
            r["path"]: r
            for r in extract_features(
                resize_images(media, target_width=4, target_height=3)
            ).collect()
        }
        assert (out["a"]["width"], out["a"]["height"]) == (4, 3)
        assert out["a"]["n_channels"] == 3
        assert out["b"]["n_channels"] == 1


SF = "/root/testdata/sf0.001"


class TestR9EntryProperties:
    """Structural invariants of the r9 analytics wave, beyond the
    hash-exact oracle gates (tests/test_oracle.py covers equality)."""

    def _rows(self, spark, name, sf=SF):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        return CATALOG[name].builder(spark, sf).collect()

    def test_kaplan_meier_curve_shape(self, spark):
        rows = sorted(
            self._rows(spark, "customer_kaplan_meier"),
            key=lambda r: r["t_days"],
        )
        assert rows, "empty KM curve"
        # survival starts at 1 - d1/n1 and is strictly within (0, 1]
        r0 = rows[0]
        assert abs(
            r0["survival"] - (1.0 - r0["n_events"] / r0["n_risk"])
        ) < 1e-15
        surv = [r["survival"] for r in rows]
        assert all(0.0 <= s <= 1.0 for s in surv)
        assert all(a >= b for a, b in zip(surv, surv[1:]))  # non-increasing
        risk = [r["n_risk"] for r in rows]
        assert all(a >= b for a, b in zip(risk, risk[1:]))
        assert all(r["n_events"] >= 1 for r in rows)

    def test_price_index_base_month_is_unity(self, spark):
        rows = self._rows(spark, "part_brand_price_index")
        base = min(r["month"] for r in rows)
        b = next(r for r in rows if r["month"] == base)
        for k in ("laspeyres", "paasche", "fisher"):
            assert abs(b[k] - 1.0) < 1e-12, (k, b[k])
        for r in rows:
            lo, hi = sorted((r["laspeyres"], r["paasche"]))
            assert lo - 1e-12 <= r["fisher"] <= hi + 1e-12

    def test_unimax_waterfill_invariants(self, spark):
        rows = self._rows(spark, "corpus_unimax_mixture")
        total = sum(r["toks"] for r in rows)
        budget = (3 * total) // 2
        assert abs(sum(r["allocation"] for r in rows) - budget) < 1e-6
        capped = [r for r in rows if r["capped"]]
        unc = [r for r in rows if not r["capped"]]
        for r in capped:
            assert r["allocation"] == float(r["cap"])
            assert abs(r["epochs"] - 2.0) < 1e-12
        # waterfill: every uncapped allocation >= every capped cap
        if capped and unc:
            assert min(r["allocation"] for r in unc) >= max(
                r["cap"] for r in capped
            ) - 1e-9

    def test_pettitt_antisymmetry(self, spark):
        rows = sorted(
            self._rows(spark, "events_pettitt_changepoint"),
            key=lambda r: r["day"],
        )
        assert sum(r["v"] for r in rows) == 0  # sgn antisymmetry
        assert rows[-1]["u"] == 0  # U_n = 0 by construction
        kmax = max(abs(r["u"]) for r in rows)
        flagged = [r for r in rows if r["is_changepoint"]]
        assert flagged and all(abs(r["u"]) == kmax for r in flagged)

    def test_newsvendor_fill_rate_and_realizability(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )
        from pyspark.sql import functions as F

        rows = self._rows(spark, "part_newsvendor_stock")
        assert rows
        for r in rows:
            assert r["achieved_fill_rate"] >= 0.9
        # q_star is an actually-realized daily demand level
        li = load_table(spark, SF, "lineitem")
        pt = load_table(spark, SF, "part")
        realized = {
            (x["brand"], x["q"])
            for x in li.join(pt, li["l_partkey"] == pt["p_partkey"])
            .groupBy(
                F.col("p_brand").alias("brand"),
                F.to_date("l_shipdate").alias("d"),
            )
            .agg(
                F.sum(F.col("l_quantity").cast("bigint")).alias("q")
            )
            .select("brand", "q")
            .distinct()
            .collect()
        }
        for r in rows:
            assert (r["brand"], r["q_star"]) in realized

    def test_demand_classification_consistency(self, spark):
        rows = self._rows(spark, "part_demand_classification")
        assert rows
        for r in rows:
            want = (
                "smooth" if r["adi"] < 1.32 and r["cv2"] < 0.49
                else "intermittent" if r["adi"] >= 1.32 and r["cv2"] < 0.49
                else "erratic" if r["adi"] < 1.32
                else "lumpy"
            )
            assert r["demand_class"] == want

    def test_neyman_shares_sum_to_one(self, spark):
        rows = self._rows(spark, "doc_neyman_allocation")
        assert rows
        assert abs(sum(r["neyman_share"] for r in rows) - 1.0) < 1e-9
        assert abs(sum(r["proportional_share"] for r in rows) - 1.0) < 1e-9
        assert abs(sum(r["n_alloc"] for r in rows) - 100.0) < 1e-6

    def test_quality_curve_monotone(self, spark):
        rows = sorted(
            self._rows(spark, "doc_quality_threshold_curve"),
            key=lambda r: r["thr_pct"],
        )
        assert [r["thr_pct"] for r in rows] == [10, 30, 50, 70, 90]
        kept = [r["n_docs_kept"] for r in rows]
        assert all(a >= b for a, b in zip(kept, kept[1:]))
        for r in rows:
            assert 0.0 <= r["token_share_kept"] <= 1.0

    def test_silhouette_bounds_and_ab(self, spark):
        rows = self._rows(spark, "emb_centroid_silhouette")
        assert rows
        for r in rows:
            assert -1.0 <= r["silhouette"] <= 1.0
            assert r["a_dist"] >= 0 and r["b_dist"] >= 0
            if r["b_dist"] > r["a_dist"]:
                assert r["silhouette"] > 0

    def test_rich_club_monotone_in_k(self, spark):
        rows = sorted(
            self._rows(spark, "part_copurchase_rich_club"),
            key=lambda r: r["k"],
        )
        assert rows
        nodes = [r["n_nodes"] for r in rows]
        edges = [r["n_edges"] for r in rows]
        assert all(a >= b for a, b in zip(nodes, nodes[1:]))
        assert all(a >= b for a, b in zip(edges, edges[1:]))
        for r in rows:
            assert 0.0 <= r["phi"] <= 1.0


class TestGifVideoCodec:
    def test_frame_walk_and_timestamps(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_animated_gif,
            parse_gif_frames,
        )

        frames = parse_gif_frames(encode_animated_gif(4, 3, 3, delay_cs=7))
        assert [f["frame_idx"] for f in frames] == [0, 1, 2]
        assert [f["frame_ts_ms"] for f in frames] == [70, 140, 210]
        assert all(f["frame"][0] == 0x2C for f in frames)

    def test_lzw_stream_is_spec_valid(self):
        """Independently LZW-decode frame 0's data: the clear-before-
        every-code stream must reproduce the alternating pixel
        pattern."""
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_animated_gif,
            parse_gif_frames,
        )

        fr = parse_gif_frames(encode_animated_gif(4, 3, 2))[0]["frame"]
        min_code = fr[10]
        assert min_code == 2
        i, data = 11, bytearray()
        while fr[i] != 0:
            data += fr[i + 1 : i + 1 + fr[i]]
            i += 1 + fr[i]
        clear, end, size = 1 << min_code, (1 << min_code) + 1, min_code + 1
        acc = nbits = 0
        out = []
        done = False
        for byte in bytes(data):
            acc |= byte << nbits
            nbits += 8
            while nbits >= size and not done:
                c = acc & ((1 << size) - 1)
                acc >>= size
                nbits -= size
                if c == clear:
                    continue
                if c == end:
                    done = True
                    break
                out.append(c)
        assert out == [p % 2 for p in range(12)]

    def test_header_only_gif_has_no_frames(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_gif_header,
            parse_gif_frames,
        )

        assert parse_gif_frames(encode_gif_header(5, 5)) == []

    def test_non_gif_hits_seam(self):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            parse_gif_frames,
        )

        with _pytest.raises(NotImplementedError):
            parse_gif_frames(b"\x89PNG\r\n\x1a\nrest")

    def test_sample_frames_default_codec_end_to_end(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_animated_gif,
            sample_frames,
        )

        media = spark.createDataFrame(
            [("v1", bytearray(encode_animated_gif(4, 3, 5, delay_cs=3)))],
            "path string, content binary",
        )
        out = sorted(
            (r["frame_idx"], r["frame_ts_ms"])
            for r in sample_frames(media, every_n=2, max_frames=2).collect()
        )
        assert out == [(0, 30), (2, 90)]



def _catalog_rows(spark, name, sf=SF):
    from adventureworks_pysparkjobs_spark.queries import CATALOG

    return CATALOG[name].builder(spark, sf).collect()


class TestR9ContinuationProperties:
    def test_bloom_decontamination_no_false_negatives(self, spark):
        rows = _catalog_rows(spark, "doc_bloom_decontamination")
        assert len(rows) == 1
        r = rows[0]
        # Bloom filters never false-negative: every true member passes
        assert r["n_pass_bloom"] >= r["n_member"]
        assert r["n_false_pos"] == r["n_pass_bloom"] - r["n_member"]
        if r["fp_rate"] is not None:
            assert 0.0 <= r["fp_rate"] <= 1.0

    def test_dual_sourcing_single_implies_concentrated(self, spark):
        rows = _catalog_rows(spark, "part_dual_sourcing_risk")
        assert rows
        for r in rows:
            # single-sourced part has HHI = 1 >= 0.5
            assert r["n_concentrated"] >= r["n_single_source"]
            assert 0.0 <= r["single_source_share"] <= 1.0
            assert r["n_parts"] >= r["n_concentrated"]

    def test_quantile_ci_brackets_point_estimate(self, spark):
        rows = _catalog_rows(spark, "orders_quantile_ci")
        assert rows
        for r in rows:
            assert r["p90_lo"] <= r["p90"] <= r["p90_hi"]


class TestMultimodalIntegration:
    """Cross-leg checks: the magic-byte classifier and the synthesize
    stages agree with the codecs they feed."""

    def test_sniff_classifies_all_synthetic_containers(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_animated_gif,
            encode_jpeg_header,
            encode_png,
            encode_wav,
            sniff_media_types,
        )

        media = spark.createDataFrame(
            [
                ("p", bytearray(encode_png(4, 4, 1))),
                ("j", bytearray(encode_jpeg_header(4, 4))),
                ("g", bytearray(encode_animated_gif(4, 3, 2))),
                ("w", bytearray(encode_wav(8000, 1, 4))),
                ("u", bytearray(b"not media")),
            ],
            "path string, content binary",
        )
        got = {
            r["media_type"]: r["n_payloads"]
            for r in sniff_media_types(media).collect()
        }
        assert got == {"png": 1, "jpeg": 1, "gif": 1, "riff": 1, "unknown": 1}

    def test_synthesize_images_deterministic_across_runs(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            synthesize_images,
        )

        spec = spark.createDataFrame(
            [("7", 9, 5, 3, "png"), ("8", 6, 4, 1, "png")],
            "path string, width int, height int, n_channels int, fmt string",
        )
        a = {r["path"]: bytes(r["content"])
             for r in synthesize_images(spec).collect()}
        b = {r["path"]: bytes(r["content"])
             for r in synthesize_images(spec).collect()}
        assert a == b  # crc32-seeded, never Python hash()

    def test_media_type_col_matches_sniff_grain(self, spark):
        from pyspark.sql import functions as F

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_png,
            encode_wav,
            media_type_col,
        )

        media = spark.createDataFrame(
            [("a", bytearray(encode_png(2, 2, 1))),
             ("b", bytearray(encode_wav(8000, 1, 2)))],
            "path string, content binary",
        )
        got = {
            r["path"]: r["mt"]
            for r in media.select(
                "path", media_type_col("content").alias("mt")
            ).collect()
        }
        assert got == {"a": "png", "b": "riff"}


class TestR9HandValueReferences:
    """Independent pure-Python reference implementations computed from
    the raw parquet (via duckdb, no Spark, no shared code) — the
    strongest cross-check class: a shared-spec bug in builder+oracle
    cannot survive a third formulation."""

    def _duck(self, sql):
        import duckdb

        con = duckdb.connect()
        for t in ("orders", "lineitem", "part", "events", "documents"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
            )
        return con.sql(sql).fetchall()

    def test_kaplan_meier_vs_pure_python(self, spark):
        from collections import Counter

        rows = self._duck(
            "SELECT o_custkey, CAST(o_orderdate AS DATE), o_orderkey "
            "FROM orders"
        )
        by_cust = {}
        for cust, d, k in rows:
            by_cust.setdefault(cust, []).append((d, k))
        horizon = max(d for _, d, _ in rows)
        times = []
        for cust, lst in by_cust.items():
            lst.sort()
            first = lst[0][0]
            if len(lst) >= 2:
                times.append(((lst[1][0] - first).days, 1))
            else:
                times.append(((horizon - first).days, 0))
        d_at = Counter(t for t, ev in times if ev)
        c_at = Counter(t for t, _ in times)
        surv, ref = 1.0, {}
        n_at_risk = len(times)
        for t in sorted(c_at):
            if t in d_at:
                surv *= 1.0 - d_at[t] / n_at_risk
                ref[t] = (n_at_risk, d_at[t], surv)
            n_at_risk -= c_at[t]
        got = {
            r["t_days"]: (r["n_risk"], r["n_events"], r["survival"])
            for r in _catalog_rows(spark, "customer_kaplan_meier")
        }
        assert set(got) == set(ref)
        for t in ref:
            assert got[t][0] == ref[t][0] and got[t][1] == ref[t][1]
            assert abs(got[t][2] - ref[t][2]) < 1e-12, (t, got[t], ref[t])

    def test_pettitt_vs_brute_force(self, spark):
        rows = self._duck(
            "SELECT CAST(ts AS DATE) AS d, COUNT(*) FROM events "
            "GROUP BY 1 ORDER BY 1"
        )
        xs = [int(c) for _, c in rows]
        n = len(xs)

        def sgn(v):
            return (v > 0) - (v < 0)

        ref_u = []
        for t in range(1, n + 1):
            ref_u.append(
                sum(
                    sgn(xs[j] - xs[i])
                    for i in range(t)
                    for j in range(t, n)
                )
            )
        got = sorted(
            _catalog_rows(spark, "events_pettitt_changepoint"),
            key=lambda r: r["day"],
        )
        assert [r["u"] for r in got] == ref_u

    def test_unimax_closed_form_vs_iterative_waterfill(self, spark):
        """The closed-form prefix rule must equal the DEFINITIONAL
        iterative waterfill (repeatedly grant equal shares, cap, and
        redistribute)."""
        rows = self._duck(
            "SELECT lang, SUM(len(list_filter(regexp_split_to_array("
            "trim(text), '\\s+'), t -> t <> ''))) FROM documents GROUP BY 1"
        )
        toks = {lang: int(t) for lang, t in rows}
        caps = {lang: 2 * t for lang, t in toks.items()}
        budget = (3 * sum(toks.values())) // 2
        alloc, remaining, active = {}, float(budget), set(caps)
        while True:
            share = remaining / len(active)
            newly = {s for s in active if caps[s] <= share}
            if not newly:
                for s in active:
                    alloc[s] = share
                break
            for s in newly:
                alloc[s] = float(caps[s])
                remaining -= caps[s]
            active -= newly
            if not active:
                break
        got = {
            r["lang"]: (r["capped"], r["allocation"])
            for r in _catalog_rows(spark, "corpus_unimax_mixture")
        }
        for lang in toks:
            assert abs(got[lang][1] - alloc[lang]) < 1e-6, (
                lang, got[lang], alloc[lang],
            )

    def test_newsvendor_vs_numpy_quantile(self, spark):
        import numpy as np

        rows = self._duck(
            "SELECT p.p_brand, CAST(l.l_shipdate AS DATE), "
            "SUM(CAST(l.l_quantity AS BIGINT)) "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY 1, 2"
        )
        by_brand = {}
        for b, _, q in rows:
            by_brand.setdefault(b, []).append(int(q))
        got = {r["brand"]: r["q_star"]
               for r in _catalog_rows(spark, "part_newsvendor_stock")}
        for b, qs in by_brand.items():
            ref = int(
                np.quantile(np.array(qs), 0.9, method="inverted_cdf")
            )
            assert got[b] == ref, (b, got[b], ref)

    def test_price_index_vs_pandas(self, spark):
        import math

        rows = self._duck(
            "SELECT p.p_brand, strftime(CAST(l.l_shipdate AS DATE), "
            "'%Y-%m'), SUM(CAST(l.l_quantity AS DECIMAL(12,2))), "
            "SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY 1, 2"
        )
        cells = {(b, m): (float(q), float(r)) for b, m, q, r in rows}
        base = min(m for _, m in cells)
        base_c = {b: v for (b, m), v in cells.items() if m == base}
        got = {r["month"]: r for r in
               _catalog_rows(spark, "part_brand_price_index")}
        for m in sorted({m for _, m in cells}):
            num = den = rev_t = rev0 = 0.0
            for b, (q0, r0) in base_c.items():
                if (b, m) not in cells:
                    continue
                q, r = cells[(b, m)]
                num += (r / q) * q0
                den += (r0 / q0) * q
                rev_t += r
                rev0 += r0
            lasp, paasche = num / rev0, rev_t / den
            assert abs(got[m]["laspeyres"] - lasp) < 1e-9
            assert abs(got[m]["paasche"] - paasche) < 1e-9
            assert abs(got[m]["fisher"] - math.sqrt(lasp * paasche)) < 1e-9
