"""Round-10 operator tests: the Croston/SBA intermittent-demand
forecaster (hand-computed fold references, floor semantics, SBC
routing) and the ISO-BMFF (MP4) header codec."""

from __future__ import annotations

import datetime
import struct

import pytest

from adventureworks_pysparkjobs_spark.operators.multimodal import (
    encode_mp4,
    parse_mp4_header,
)


class TestMp4Codec:
    def test_roundtrip_all_fields(self):
        p = encode_mp4("mp42", 90000, 90 * 5400, 640, 360, n_audio_tracks=1)
        m = parse_mp4_header(p)
        assert m == {
            "major_brand": "mp42",
            "timescale": 90000,
            "duration": 486000,
            "duration_ms": 5400,
            "n_tracks": 2,
            "width": 640,
            "height": 360,
        }

    def test_audio_only_has_no_dims(self):
        m = parse_mp4_header(encode_mp4("isom", 1000, 2500, 0, 0))
        assert m["width"] is None and m["height"] is None
        assert m["duration_ms"] == 2500 and m["n_tracks"] == 1

    def test_mdat_is_skipped_not_read(self):
        """Header-only contract: metadata identical whatever mdat holds."""
        a = encode_mp4("isom", 1000, 777, 32, 16, mdat_bytes=8)
        b = encode_mp4("isom", 1000, 777, 32, 16, mdat_bytes=4096)
        assert parse_mp4_header(a) == parse_mp4_header(b)
        assert len(b) - len(a) == 4096 - 8

    def test_largesize_box_walks_correctly(self):
        """A size==1 box carries a 64-bit largesize after the type."""
        base = encode_mp4("isom", 1000, 100, 8, 8)
        body = b"\x00" * 6
        large = (
            struct.pack(">I", 1)
            + b"free"
            + struct.pack(">Q", 16 + len(body))
            + body
        )
        assert parse_mp4_header(base + large) == parse_mp4_header(base)

    def test_mvhd_version1_layout(self):
        """64-bit creation/modification/duration variant of mvhd."""
        def box(t, b):
            return struct.pack(">I", 8 + len(b)) + t + b

        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", 48000)
            + struct.pack(">Q", 48 * 12345)
            + b"\x00" * 80,
        )
        p = box(b"ftyp", b"isom" + b"\x00" * 4) + box(b"moov", mvhd)
        m = parse_mp4_header(p)
        assert (m["timescale"], m["duration_ms"]) == (48000, 12345)

    def test_truncation_sweep_never_leaks(self):
        """Every prefix either raises ValueError/NotImplementedError or
        (when the cut lands on a box boundary past moov — a complete
        file minus trailing boxes, which IS valid ISO-BMFF) parses to
        exactly the full-file metadata. Never IndexError/struct.error."""
        p = encode_mp4("mp42", 2000, 2 * 700, 48, 32, n_audio_tracks=1)
        full = parse_mp4_header(p)
        clean_cuts = 0
        for cut in range(0, len(p)):
            try:
                m = parse_mp4_header(p[:cut])
            except (ValueError, NotImplementedError):
                continue
            assert m == full, f"cut {cut} parsed but differs"
            clean_cuts += 1
        # only whole-box boundaries after moov may parse (free, mdat)
        assert clean_cuts <= 3

    def test_non_bmff_hits_the_seam(self):
        with pytest.raises(NotImplementedError):
            parse_mp4_header(b"RIFFxxxxWAVEfmt ")
        with pytest.raises(NotImplementedError):
            parse_mp4_header(b"")

    def test_zero_timescale_is_malformed(self):
        def box(t, b):
            return struct.pack(">I", 8 + len(b)) + t + b

        mvhd = box(b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 0, 50))
        p = box(b"ftyp", b"isom" + b"\x00" * 4) + box(b"moov", mvhd)
        with pytest.raises(ValueError):
            parse_mp4_header(p)


ALPHA, BETA = 0.1, 0.9  # string-pinned twins of the entry's constants


def _croston_fold(events):
    """Pure-Python reference: events = [(q, iv)] ordered; iv[0] unused."""
    z, p = float(events[0][0]), float(events[1][1])
    for q, iv in events[1:]:
        z = ALPHA * q + BETA * z
        p = ALPHA * iv + BETA * p
    return z, p


class TestCrostonForecast:
    def _run(self, spark, tmp_path, rows):
        df = spark.createDataFrame(
            rows, "l_partkey long, l_shipdate date, l_quantity double"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        return {
            r["part_key"]: r
            for r in CATALOG["part_croston_forecast"]
            .builder(spark, str(tmp_path))
            .collect()
        }

    def test_hand_computed_fold_exact(self, spark, tmp_path):
        d = datetime.date(1995, 3, 1)

        def day(k):
            return d + datetime.timedelta(days=k)

        rows = [
            # part 1: demand days 0, 3, 5, 12 with qtys 4, 6, 2, 10
            (1, day(0), 2.0), (1, day(0), 2.0),
            (1, day(3), 6.0),
            (1, day(5), 2.0),
            (1, day(12), 10.0),
            # part 2: single demand day -> excluded (n_events < 2)
            (2, day(4), 9.0),
        ]
        out = self._run(spark, tmp_path, rows)
        assert set(out) == {1}
        r = out[1]
        z, p = _croston_fold([(4, 0), (6, 3), (2, 2), (10, 7)])
        assert (r["z_hat"], r["p_hat"]) == (z, p)  # bit-exact
        assert r["croston_forecast"] == z / p
        assert r["sba_forecast"] == 0.95 * (z / p)
        # adi = 12/3 = 4 >= 1.32, cv2 = (4*156 - 484)/484 < 0.49
        assert r["demand_class"] == "intermittent"
        assert r["routed_forecast"] == r["sba_forecast"]

    def test_floor_is_per_item_before_the_sum(self, spark, tmp_path):
        """FLOOR applies to each quantity, then the day sums: 2.5 + 2.5
        floors to 4, never floor(5.0) = 5."""
        d = datetime.date(1995, 3, 1)
        rows = [
            (1, d, 2.5), (1, d, 2.5),
            (1, d + datetime.timedelta(days=2), 3.9),
        ]
        r = self._run(spark, tmp_path, rows)[1]
        z, p = _croston_fold([(4, 0), (3, 2)])
        assert (r["z_hat"], r["p_hat"]) == (z, p)

    def test_smooth_quadrant_routes_to_croston(self, spark, tmp_path):
        """Daily equal-size demand: adi = 1 < 1.32, cv2 = 0 < 0.49 ->
        smooth -> routed forecast is plain Croston (SBC 2005)."""
        d = datetime.date(1995, 3, 1)
        rows = [
            (1, d + datetime.timedelta(days=k), 5.0) for k in range(6)
        ]
        r = self._run(spark, tmp_path, rows)[1]
        assert r["demand_class"] == "smooth"
        assert r["routed_forecast"] == r["croston_forecast"]
        # constant series: both smoothers sit at their fixed points
        assert abs(r["z_hat"] - 5.0) < 1e-12
        assert abs(r["p_hat"] - 1.0) < 1e-12
        assert r["sba_forecast"] < r["croston_forecast"]


class TestIvfNprobeCurve:
    def _pairs(self, spark):
        from pyspark.sql import functions as F

        from adventureworks_pysparkjobs_spark.operators import (
            similarity as S,
        )
        from adventureworks_pysparkjobs_spark.sources.corpus import (
            load_table,
        )

        from .conftest import SF_SMOKE

        emb = load_table(spark, SF_SMOKE, "embeddings")
        q = emb.filter(F.col("vec_id") % 50 == 0)
        return S.ivf_nprobe_curve(emb, q, k=5), q.count()

    def test_observed_recall_floors_and_exact_anchor(self, spark):
        from pyspark.sql import functions as F

        pairs, nq = self._pairs(spark)
        rec = {
            r["n_probe"]: (
                r["hits"] / (nq * 5.0),
                r["n_pairs"],
            )
            for r in pairs.groupBy("n_probe")
            .agg(
                F.sum(F.col("hit").cast("int")).alias("hits"),
                F.count("*").alias("n_pairs"),
            )
            .collect()
        }
        assert set(rec) == {1, 2, 4, 8}
        floors = {1: 0.20, 2: 0.40, 4: 0.50, 8: 0.999}
        for p, floor in floors.items():
            assert rec[p][0] >= floor, (p, rec[p][0])
        # probing every cell IS brute force: exact recall, full top-k
        assert rec[8][0] == 1.0
        assert rec[8][1] == nq * 5
        # recall non-decreasing in probe depth
        vals = [rec[p][0] for p in (1, 2, 4, 8)]
        assert all(a <= b for a, b in zip(vals, vals[1:]))

    def test_catalog_entry_booleans_all_true(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        from .conftest import SF_SMOKE

        rows = (
            CATALOG["emb_ivf_nprobe_curve"]
            .builder(spark, SF_SMOKE)
            .collect()
        )
        assert {r["n_probe"] for r in rows} == {1, 2, 4, 8}
        assert all(r["recall_ok"] and r["monotone_ok"] for r in rows)
        assert [r["exhaustive"] for r in sorted(rows, key=lambda r: r["n_probe"])] == [
            False, False, False, True,
        ]


class TestFlacMp3Codecs:
    def test_flac_roundtrip_and_exact_duration(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_flac_header,
            parse_flac_header,
        )

        m = parse_flac_header(encode_flac_header(48000, 2, 480000, 24))
        assert m == {
            "sample_rate": 48000,
            "n_channels": 2,
            "bits_per_sample": 24,
            "n_samples": 480000,
            "duration_ms": 10000,
        }
        # 36-bit total-samples field boundary
        big = parse_flac_header(
            encode_flac_header(44100, 1, (1 << 36) - 1, 16)
        )
        assert big["n_samples"] == (1 << 36) - 1

    def test_mp3_frame_walk_with_and_without_id3(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_mp3,
            parse_mp3_frames,
        )

        m = parse_mp3_frames(encode_mp3(5, 128, 44100, 2, id3_bytes=33))
        assert (m["n_frames"], m["bitrate_kbps"], m["n_channels"]) == (
            5, 128, 2,
        )
        assert m["duration_ms"] == 5 * 1152 * 1000 // 44100
        bare = parse_mp3_frames(encode_mp3(3, 64, 32000, 1))
        assert (bare["n_frames"], bare["sample_rate"]) == (3, 32000)

    def test_truncation_sweeps_never_leak(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_flac_header,
            encode_mp3,
            parse_flac_header,
            parse_mp3_frames,
        )

        # FLAC: every strict prefix is malformed (one mandatory block)
        flac = encode_flac_header(44100, 1, 1000)
        for cut in range(len(flac)):
            try:
                parse_flac_header(flac[:cut])
            except (ValueError, NotImplementedError):
                continue
            raise AssertionError(f"parse_flac_header cut {cut}")
        # MP3: a cut on a frame boundary IS a valid shorter stream —
        # it must parse to the same header fields with fewer frames;
        # every other cut must raise, never leak IndexError.
        mp3 = encode_mp3(4, 128, 44100, 2, id3_bytes=17)
        full = parse_mp3_frames(mp3)
        boundary_cuts = 0
        for cut in range(len(mp3)):
            try:
                m = parse_mp3_frames(mp3[:cut])
            except (ValueError, NotImplementedError):
                continue
            assert m["n_frames"] < full["n_frames"]
            assert {
                k: m[k] for k in ("bitrate_kbps", "sample_rate", "n_channels")
            } == {
                k: full[k]
                for k in ("bitrate_kbps", "sample_rate", "n_channels")
            }
            boundary_cuts += 1
        assert boundary_cuts == full["n_frames"] - 1

    def test_unknown_containers_hit_the_seam(self):
        import pytest as _pytest

        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            parse_flac_header,
            parse_mp3_frames,
        )

        with _pytest.raises(NotImplementedError):
            parse_flac_header(b"RIFFxxxxWAVE")
        with _pytest.raises(NotImplementedError):
            parse_mp3_frames(b"\x89PNG\r\n\x1a\nrest")

    def test_sniffer_classifies_new_containers(self, spark):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_flac_header,
            encode_mp3,
            encode_mp4,
            sniff_media_types,
        )

        rows = [
            (encode_mp3(2, 128, 44100, 2, id3_bytes=9),),
            (encode_mp3(2, 64, 32000, 1),),  # bare 0xFFFB sync
            (encode_mp4("isom", 1000, 500, 16, 16),),
            (encode_flac_header(44100, 1, 100),),
        ]
        df = spark.createDataFrame(
            [(bytearray(r[0]),) for r in rows], "content binary"
        )
        out = {
            r["media_type"]: r["n_payloads"]
            for r in sniff_media_types(df).collect()
        }
        assert out == {"mp3": 2, "mp4": 1, "flac": 1}


def test_duckdb_struct_fold_aliasing_semantics_still_hold():
    """Regression guard for the r10 oracle-field-ordering workaround.
    DuckDB 1.0 list_reduce with a struct accumulator is NOT alias-free
    when a field reads another field the same step writes: the first
    iteration reads a consistent init snapshot, but from the SECOND
    iteration on a field observes the same-step-updated value of any
    field declared before it ('e': acc.e + acc.z with 'z' declared
    first reads the freshly-written z). Measured sequence over
    elements [1,5,7,11] with z += x.z, e += acc.z: alias-free would
    give e = 1, 7, 20; DuckDB gives e = 1, 14, 38 (e_k = e_{k-1} +
    NEW z_k for k >= 2). part_forecast_backtest's oracle orders its
    accumulator fields (derived-before-source) to stay outside the
    hazard. If a DuckDB upgrade makes struct folds alias-free, this
    test fails — the signal to retire the field-order comments (the
    safely-ordered oracles themselves are correct either way)."""
    import duckdb

    def fold(vals):
        els = ", ".join(
            f"{{'z': CAST({v} AS DOUBLE), 'e': CAST(0 AS DOUBLE)}}"
            for v in vals
        )
        return duckdb.sql(
            f"""
            SELECT list_reduce([{els}],
              (acc, x) -> {{'z': acc.z + x.z, 'e': acc.e + acc.z}}) AS f
            """
        ).fetchone()[0]

    observed = [fold([1, 5, 7, 11][:n])["e"] for n in (2, 3, 4)]
    alias_free = [1.0, 7.0, 20.0]
    assert observed == [1.0, 14.0, 38.0], (
        "DuckDB struct-fold aliasing semantics CHANGED: "
        f"{observed} (alias-free would be {alias_free}) — revisit the "
        "field-order workarounds (queries/analytics.py "
        "part_forecast_backtest oracle, verify SKILL.md r10 notes)"
    )
    # safely-ordered twin (derived field declared FIRST): alias-free
    # values at every length — the construction the oracles rely on
    safe = duckdb.sql(
        """
        SELECT list_reduce(
          [{'e': CAST(0 AS DOUBLE), 'z': CAST(1 AS DOUBLE)},
           {'e': CAST(0 AS DOUBLE), 'z': CAST(5 AS DOUBLE)},
           {'e': CAST(0 AS DOUBLE), 'z': CAST(7 AS DOUBLE)}],
          (acc, x) -> {'e': acc.e + acc.z, 'z': acc.z + x.z}
        ) AS f
        """
    ).fetchone()[0]
    assert safe == {"e": 7.0, "z": 13.0}


class TestSesForecast:
    def test_hand_computed_nested_fold_exact(self, spark, tmp_path):
        import datetime as _dt

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        d0 = _dt.date(1995, 3, 1)
        rows = [
            (1, d0, 4.0),
            (1, d0 + _dt.timedelta(days=3), 6.0),
            (1, d0 + _dt.timedelta(days=5), 2.0),
        ]
        spark.createDataFrame(
            rows, "l_partkey long, l_shipdate date, l_quantity double"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        out = {
            r["part_key"]: r
            for r in CATALOG["part_ses_forecast"]
            .builder(spark, str(tmp_path))
            .collect()
        }
        z = 4.0
        for q, iv in [(6.0, 3), (2.0, 2)]:
            dcc = z
            for _ in range(iv - 1):
                dcc = 0.9 * dcc
            z = 0.1 * q + 0.9 * dcc
        assert out[1]["ses_level"] == z  # bit-exact incl. gap decay
        assert out[1]["span_days"] == 5

    def test_equals_explicit_zero_filled_series(self, spark, tmp_path):
        """The nested gap-decay fold must equal SES run day-by-day over
        the explicit zero-filled series — the definition it collapses."""
        import datetime as _dt

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        d0 = _dt.date(1995, 3, 1)
        demands = {0: 7.0, 4: 3.0, 5: 9.0, 11: 1.0}
        rows = [
            (1, d0 + _dt.timedelta(days=k), v) for k, v in demands.items()
        ]
        spark.createDataFrame(
            rows, "l_partkey long, l_shipdate date, l_quantity double"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        got = (
            CATALOG["part_ses_forecast"]
            .builder(spark, str(tmp_path))
            .collect()[0]["ses_level"]
        )
        z = demands[0]
        for day in range(1, 12):
            z = 0.1 * demands.get(day, 0.0) + 0.9 * z
        assert got == z
