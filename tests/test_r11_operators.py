"""Round-11 operator tests: the WebP dimension codec (all three VP8
bitstream flavors), ID3v2 frame-level tag parse (v2.3/v2.4 layouts,
text encodings), the Ogg Opus/Vorbis page walk, the round-11
hardening of the MP3 frame walk (mid-stream version/layer validation,
ID3v2.4 footer skip, trailing ID3v1 tolerance, FFFA sniff), and the
MASE extension of the forecast backtest (hand-computed fold
reference, NULL semantics when the naive forecast is perfect, exact
lower-median selection)."""

from __future__ import annotations

import datetime
import struct

import pytest

from adventureworks_pysparkjobs_spark.operators.multimodal import (
    MAGIC_SIGNATURES,
    encode_id3v2,
    encode_mp3,
    encode_ogg,
    encode_webp,
    parse_id3_tags,
    parse_mp3_frames,
    parse_ogg_header,
    parse_webp_header,
)


class TestWebpCodec:
    @pytest.mark.parametrize(
        "flavor,width,height",
        [
            ("vp8", 320, 240),
            ("vp8", 1, 16383),       # 14-bit field extremes
            ("vp8l", 16383, 1),
            ("vp8l", 7, 11),
            ("vp8x", 16384, 999999),  # beyond 14 bits: only VP8X can
            ("vp8x", 1, 1),
        ],
    )
    def test_roundtrip(self, flavor, width, height):
        m = parse_webp_header(encode_webp(width, height, flavor, filler=9))
        assert m == {"flavor": flavor, "width": width, "height": height}

    def test_vp8_scaling_bits_masked(self):
        """The top 2 bits of each VP8 dim field are upscaling hints and
        must be masked off, not folded into the dimension."""
        p = bytearray(encode_webp(100, 50, "vp8"))
        p[27] |= 0xC0  # set both scaling bits on the width field
        m = parse_webp_header(bytes(p))
        assert (m["width"], m["height"]) == (100, 50)

    def test_header_only_contract(self):
        """Dimensions identical whatever the coded bitstream holds."""
        a = encode_webp(64, 32, "vp8", filler=0)
        b = encode_webp(64, 32, "vp8", filler=4096, seed=9)
        assert parse_webp_header(a) == parse_webp_header(b)

    def test_riff_word_alignment_pad(self):
        """Odd-length chunk data gets a pad byte (RIFF spec)."""
        odd = encode_webp(8, 8, "vp8", filler=1)   # data = 11 bytes
        even = encode_webp(8, 8, "vp8", filler=2)  # data = 12 bytes
        assert len(odd) == len(even)  # pad byte absorbs the difference

    def test_off_format_routes_to_seam(self):
        with pytest.raises(NotImplementedError):
            parse_webp_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 24)
        with pytest.raises(NotImplementedError):
            # RIFF but not WEBP (a WAV) must route to the seam too
            parse_webp_header(b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 20)

    def test_bad_vp8_start_code_raises(self):
        p = bytearray(encode_webp(10, 10, "vp8"))
        p[24] ^= 0xFF
        with pytest.raises(ValueError, match="start code"):
            parse_webp_header(bytes(p))

    def test_bad_vp8l_signature_raises(self):
        p = bytearray(encode_webp(10, 10, "vp8l"))
        p[20] = 0x30
        with pytest.raises(ValueError, match="signature"):
            parse_webp_header(bytes(p))

    def test_unknown_first_chunk_raises(self):
        p = bytearray(encode_webp(10, 10, "vp8"))
        p[12:16] = b"ALPH"
        with pytest.raises(ValueError, match="unknown first chunk"):
            parse_webp_header(bytes(p))

    @pytest.mark.parametrize("flavor", ["vp8", "vp8l", "vp8x"])
    def test_truncation_sweep(self, flavor):
        """Every strict prefix raises loudly (ValueError once the RIFF/
        WEBP identity is established, NotImplementedError before);
        never IndexError/struct.error, never a wrong answer."""
        p = encode_webp(123, 45, flavor, filler=7)
        full = parse_webp_header(p)
        for cut in range(len(p)):
            with pytest.raises((ValueError, NotImplementedError)):
                got = parse_webp_header(p[:cut])
                # a short VP8/VP8L prefix past the header bytes IS the
                # full header — only acceptable non-raise outcome
                assert got == full and cut >= 25
                raise ValueError("complete-header prefix")


class TestId3Tags:
    @pytest.mark.parametrize(
        "version,encoding", [(3, 0), (3, 1), (4, 0), (4, 1), (4, 3)]
    )
    def test_roundtrip_versions_and_encodings(self, version, encoding):
        payload = encode_id3v2(
            "Tráck 9", "Ärtist", "Albüm", encoding=encoding,
            version=version, padding=17,
        ) + encode_mp3(2)
        assert parse_id3_tags(payload) == {
            "id3_version": version,
            "title": "Tráck 9",
            "artist": "Ärtist",
            "album": "Albüm",
        }

    def test_utf16be_frame(self):
        """Encoding byte 2 (UTF-16BE, no BOM) — not emitted by the
        fixture encoder, so build the frame by hand."""
        body = b"\x02" + "Tïtle".encode("utf-16-be")
        frame = b"TIT2" + bytes((0, 0, 0, len(body))) + b"\x00\x00" + body
        tag = b"ID3\x04\x00\x00" + bytes(
            (0, 0, len(frame) >> 7, len(frame) & 0x7F)
        ) + frame
        assert parse_id3_tags(tag)["title"] == "Tïtle"

    def test_missing_frames_stay_null(self):
        payload = encode_id3v2(title="Only title", version=4)
        m = parse_id3_tags(payload)
        assert m["title"] == "Only title"
        assert m["artist"] is None and m["album"] is None

    def test_padding_terminates_walk(self):
        payload = encode_id3v2("T", "A", "B", padding=64)
        assert parse_id3_tags(payload)["album"] == "B"

    def test_v23_plain_vs_v24_synchsafe_frame_sizes(self):
        """A >127-byte frame body distinguishes the two size layouts:
        plain big-endian 0x..80 bytes would be an invalid synchsafe."""
        long_title = "x" * 200
        for version in (3, 4):
            p = encode_id3v2(long_title, version=version)
            assert parse_id3_tags(p)["title"] == long_title

    def test_extended_header_skipped(self):
        for version, ehdr in (
            (3, struct.pack(">I", 6) + b"\x00" * 6),   # size excl. field
            (4, bytes((0, 0, 0, 6)) + bytes((1, 0))),  # synchsafe incl.
        ):
            body = b"\x00Hi"
            frame = b"TIT2" + (
                struct.pack(">I", len(body)) if version == 3
                else bytes((0, 0, 0, len(body)))
            ) + b"\x00\x00" + body
            inner = ehdr + frame
            tag = b"ID3" + bytes((version, 0, 0x40)) + bytes(
                (0, 0, len(inner) >> 7, len(inner) & 0x7F)
            ) + inner
            assert parse_id3_tags(tag)["title"] == "Hi", version

    def test_malformed_raises(self):
        with pytest.raises(NotImplementedError):
            parse_id3_tags(b"RIFF" + b"\x00" * 20)
        with pytest.raises(ValueError, match="truncated tag header"):
            parse_id3_tags(b"ID3\x04\x00")
        with pytest.raises(ValueError, match="unsupported version"):
            parse_id3_tags(b"ID3\x02\x00\x00\x00\x00\x00\x00")
        with pytest.raises(ValueError, match="past payload end"):
            parse_id3_tags(b"ID3\x04\x00\x00\x00\x00\x01\x00")
        # frame size pointing past the tag end
        bad = b"TIT2" + bytes((0, 0, 7, 0)) + b"\x00\x00" + b"\x00Hi"
        tag = b"ID3\x04\x00\x00" + bytes((0, 0, 0, len(bad))) + bad
        with pytest.raises(ValueError, match="past tag end"):
            parse_id3_tags(tag)
        # unknown text encoding byte
        body = b"\x07oops"
        frame = b"TIT2" + bytes((0, 0, 0, len(body))) + b"\x00\x00" + body
        tag = b"ID3\x04\x00\x00" + bytes((0, 0, 0, len(frame))) + frame
        with pytest.raises(ValueError, match="unknown text encoding"):
            parse_id3_tags(tag)


class TestMp3Hardening:
    def test_fffa_signature_sniffs_as_mp3(self):
        assert ("FFFA", "mp3") in MAGIC_SIGNATURES

    def test_crc_protected_first_frame_parses(self):
        """0xFFFA (protection bit 0) is MPEG-1 Layer III too; the CRC
        lives inside the computed frame length, so the walk is
        unchanged."""
        p = bytearray(encode_mp3(3, bitrate_kbps=128, sample_rate=44100))
        for i in range(0, len(p), 144 * 128 * 1000 // 44100):
            assert p[i] == 0xFF
            p[i + 1] = 0xFA
        m = parse_mp3_frames(bytes(p))
        assert m["n_frames"] == 3

    def test_mid_stream_version_switch_raises(self):
        """Frame 2 flips to MPEG-2 Layer II with valid sync and valid
        bitrate/rate indexes — pre-r11 this was measured with MPEG-1
        Layer III tables and miscounted silently."""
        p = bytearray(encode_mp3(3, bitrate_kbps=128, sample_rate=44100))
        flen = 144 * 128 * 1000 // 44100
        p[flen + 1] = 0xF4  # sync + MPEG-2 + Layer II + no protection
        with pytest.raises(ValueError, match="version/layer"):
            parse_mp3_frames(bytes(p))

    def test_id3v24_footer_skipped(self):
        p = encode_mp3(5, id3_bytes=33, id3_footer=True)
        assert parse_mp3_frames(p)["n_frames"] == 5

    def test_trailing_id3v1_tag_tolerated(self):
        p = encode_mp3(4, id3v1_trailer=True)
        assert parse_mp3_frames(p)["n_frames"] == 4

    def test_both_tag_layouts_together(self):
        p = encode_mp3(2, id3_bytes=17, id3_footer=True, id3v1_trailer=True)
        assert parse_mp3_frames(p)["n_frames"] == 2

    def test_non_tag_trailing_bytes_still_raise(self):
        p = encode_mp3(2) + b"\x00" * 128
        with pytest.raises(ValueError, match="lost frame sync"):
            parse_mp3_frames(p)

    def test_short_tag_like_trailer_still_raises(self):
        """'TAG' not exactly 128 bytes from the end is NOT an ID3v1
        block; the walk must not swallow it."""
        p = encode_mp3(2) + b"TAG" + b"\x00" * 60
        with pytest.raises(ValueError, match="lost frame sync"):
            parse_mp3_frames(p)


class TestOggCodec:
    def test_opus_roundtrip(self):
        gran = 312 + 960 * 50
        m = parse_ogg_header(
            encode_ogg("opus", 2, 48000, gran, n_audio_pages=3, filler=70)
        )
        assert m == {
            "codec": "opus",
            "n_channels": 2,
            "sample_rate": 48000,
            "pre_skip": 312,
            "n_pages": 4,
            "granule": gran,
            "duration_ms": 960 * 50 * 1000 // 48000,
        }

    def test_vorbis_roundtrip(self):
        m = parse_ogg_header(
            encode_ogg("vorbis", 1, 44100, 1024 * 200, n_audio_pages=2)
        )
        assert (m["codec"], m["sample_rate"]) == ("vorbis", 44100)
        assert m["pre_skip"] == 0 and m["n_pages"] == 3
        assert m["duration_ms"] == 1024 * 200 * 1000 // 44100

    def test_pre_skip_clamps_duration_at_zero(self):
        m = parse_ogg_header(
            encode_ogg("opus", 1, 48000, 100, n_audio_pages=1, pre_skip=500)
        )
        assert m["duration_ms"] == 0

    def test_multi_lacing_body(self):
        """A >255-byte page body needs multiple lacing values; the
        segment-table sum must still hop to the next page exactly."""
        m = parse_ogg_header(
            encode_ogg("opus", 2, 48000, 960, n_audio_pages=2, filler=700)
        )
        assert m["n_pages"] == 3

    def test_body_skip_contract(self):
        """Metadata identical whatever the audio page bodies hold."""
        a = encode_ogg("vorbis", 2, 48000, 4096, filler=10, seed=1)
        b = encode_ogg("vorbis", 2, 48000, 4096, filler=200, seed=9)
        ma, mb = parse_ogg_header(a), parse_ogg_header(b)
        ma.pop("duration_ms"), mb.pop("duration_ms")
        assert {k: v for k, v in ma.items()} == {
            k: v for k, v in mb.items()
        }

    def test_missing_eos_raises(self):
        p = encode_ogg("opus", 1, 48000, 960, n_audio_pages=2, filler=30)
        # cut the stream at the last page boundary: valid pages, no EOS
        last_body = 30
        last_hdr = 27 + 1  # one lacing value for a 30-byte body
        with pytest.raises(ValueError, match="no EOS"):
            parse_ogg_header(p[: len(p) - last_body - last_hdr])

    def test_missing_bos_raises(self):
        p = bytearray(encode_ogg("opus", 1, 48000, 960))
        p[5] = 0x00  # clear the BOS flag on the first page
        with pytest.raises(ValueError, match="missing BOS"):
            parse_ogg_header(bytes(p))

    def test_bad_structure_version_raises(self):
        p = bytearray(encode_ogg("opus", 1, 48000, 960))
        p[4] = 0x01
        with pytest.raises(ValueError, match="structure version"):
            parse_ogg_header(bytes(p))

    def test_unknown_id_packet_raises(self):
        p = bytearray(encode_ogg("opus", 1, 48000, 960))
        p[28:36] = b"FLACHEAD"
        with pytest.raises(ValueError, match="neither OpusHead"):
            parse_ogg_header(bytes(p))

    def test_off_format_routes_to_seam(self):
        with pytest.raises(NotImplementedError):
            parse_ogg_header(b"fLaC" + b"\x00" * 40)

    def test_truncation_sweep(self):
        """Every strict prefix raises (page-body cuts, header cuts, and
        page-boundary cuts — the EOS requirement catches the latter)."""
        p = encode_ogg("opus", 2, 48000, 2232, n_audio_pages=2, filler=41)
        assert parse_ogg_header(p)["n_pages"] == 3
        for cut in range(len(p)):
            with pytest.raises((ValueError, NotImplementedError)):
                parse_ogg_header(p[:cut])


def _backtest_fold(events):
    """Pure-Python replay of the backtest fold: events = [(q, iv)]
    ordered; iv[0] unused. Returns (ec, es, en) — Croston abs error,
    SBA abs error, in-sample one-step naive abs error (the MASE
    denominator). Same IEEE ops in the same order as both engines."""
    z, p = float(events[0][0]), float(events[1][1])
    ec = es = en = 0.0
    r = 0.0
    j = 1
    for q, iv in events[1:]:
        x_z, x_p = float(q), float(iv)
        if j >= 2:  # prior state judges the point, never the point itself
            rate = x_z / x_p
            ec += abs(rate - z / p)
            es += abs(rate - 0.95 * (z / p))
            en += abs(rate - r)
        z = 0.1 * x_z + 0.9 * z
        p = 0.1 * x_p + 0.9 * p
        r = x_z / x_p
        j += 1
    return ec, es, en


class TestBacktestMase:
    def _run(self, spark, tmp_path, rows):
        df = spark.createDataFrame(
            rows, "l_partkey long, l_shipdate date, l_quantity double"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "lineitem.parquet")
        )
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        return {
            r["demand_class"]: r.asDict()
            for r in CATALOG["part_forecast_backtest"]
            .builder(spark, str(tmp_path))
            .collect()
        }

    def test_hand_mase_null_semantics_and_lower_median(
        self, spark, tmp_path
    ):
        d = datetime.date(1995, 3, 1)

        def day(k):
            return d + datetime.timedelta(days=k)

        rows = [
            # part 1: days 0,3,5,12 qtys 4,6,2,10 -> intermittent
            (1, day(0), 4.0), (1, day(3), 6.0),
            (1, day(5), 2.0), (1, day(12), 10.0),
            # part 2: constant rate (q=5 every 2 days) -> en = 0 ->
            # MASE undefined (NULL), never a beats-naive count
            (2, day(0), 5.0), (2, day(2), 5.0),
            (2, day(4), 5.0), (2, day(6), 5.0),
            # part 3: days 0,4,6,14 qtys 3,9,1,7 -> intermittent too
            (3, day(0), 3.0), (3, day(4), 9.0),
            (3, day(6), 1.0), (3, day(14), 7.0),
        ]
        out = self._run(spark, tmp_path, rows)
        assert set(out) == {"intermittent"}
        r = out["intermittent"]
        ec1, es1, en1 = _backtest_fold([(4, 0), (6, 3), (2, 2), (10, 7)])
        ec3, es3, en3 = _backtest_fold([(3, 0), (9, 4), (1, 2), (7, 8)])
        assert en1 > 0 and en3 > 0
        assert r["n_parts"] == 3
        # part 2 (en = 0) can never beat the perfect naive forecast
        assert r["n_croston_beats_naive"] == sum(
            ec < en for ec, en in [(ec1, en1), (ec3, en3)]
        )
        assert r["n_sba_beats_naive"] == sum(
            es < en for es, en in [(es1, en1), (es3, en3)]
        )
        # lower median of TWO non-null MASE values selects the smaller
        # one bit-exactly (selection, not interpolation); part 2's
        # NULL is excluded from the median population
        assert r["med_mase_croston"] == min(ec1 / en1, ec3 / en3)
        assert r["med_mase_sba"] == min(es1 / en1, es3 / en3)

    def test_all_null_quadrant_has_null_medians(self, spark, tmp_path):
        d = datetime.date(1995, 3, 1)
        rows = [
            (1, d + datetime.timedelta(days=2 * k), 5.0) for k in range(4)
        ]
        r = self._run(spark, tmp_path, rows)["intermittent"]
        assert r["n_parts"] == 1
        assert r["med_mase_croston"] is None
        assert r["med_mase_sba"] is None
        assert r["n_croston_beats_naive"] == 0
        assert r["n_sba_beats_naive"] == 0


class TestMediaRouter:
    def test_routes_every_container_to_its_clock(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_flac_header,
            encode_mp4,
            encode_wav,
            route_media_codec,
        )

        cases = [
            ("wav", encode_wav(8000, 1, 4000), 4000 * 1000 // 8000),
            ("flac", encode_flac_header(44100, 1, 44100), 1000),
            ("mp3", encode_mp3(10), 10 * 1152 * 1000 // 44100),
            ("ogg", encode_ogg("opus", 2, 48000, 312 + 960 * 10), 200),
            ("mp4", encode_mp4("isom", 1000, 2500, 64, 32), 2500),
        ]
        for mtype, payload, dur in cases:
            m = route_media_codec(payload)
            assert m == {"media_type": mtype, "duration_ms": dur}, mtype

    def test_bare_sync_mp3_routes_without_id3(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            route_media_codec,
        )

        assert route_media_codec(encode_mp3(3))["media_type"] == "mp3"

    def test_unrouted_container_hits_the_seam(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            route_media_codec,
        )

        with pytest.raises(NotImplementedError):
            route_media_codec(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)

    def test_misrouting_is_loud_not_wrong(self):
        """Every non-matching parser refuses a foreign container at its
        NotImplementedError seam — the property that makes the router's
        dispatch verifiable: a wrong branch can never return a wrong
        duration silently."""
        payload = encode_ogg("opus", 2, 48000, 960)
        for parser in (parse_mp3_frames, parse_webp_header, parse_id3_tags):
            with pytest.raises(NotImplementedError):
                parser(payload)


def test_duckdb_list_fold_is_alias_free():
    """Companion to the struct-fold aliasing guard in
    test_r10_operators.py: list_reduce with a LIST accumulator
    evaluates every element expression against the OLD list — the
    construction orders_holt_forecast's two mutually-dependent state
    variables rely on. Same probe as the struct guard (z += x,
    e += old z over [1,5,7,11]): alias-free gives e = 20; the struct
    hazard gives 38. If this ever fails, the Holt oracle's list
    accumulator must be re-audited."""
    import duckdb

    r = duckdb.sql(
        """
        SELECT list_reduce(
          [[CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)],
           [CAST(5 AS DOUBLE), CAST(0 AS DOUBLE)],
           [CAST(7 AS DOUBLE), CAST(0 AS DOUBLE)],
           [CAST(11 AS DOUBLE), CAST(0 AS DOUBLE)]],
          (acc, x) -> [acc[1] + x[1], acc[2] + acc[1]]) AS f
        """
    ).fetchone()[0]
    assert r == [24.0, 20.0], (
        f"DuckDB LIST-fold aliasing semantics changed: {r} — re-audit "
        "orders_holt_forecast's oracle accumulator"
    )


class TestHoltForecast:
    def test_hand_computed_fold_exact(self, spark, tmp_path):
        """Three order days with a 3-day gap: the fold must equal the
        explicit zero-filled Holt recursion, bit for bit."""
        import datetime as _dt

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        d0 = _dt.date(1995, 3, 1)
        rows = [
            ("1-URGENT", d0, 100.0),
            ("1-URGENT", d0 + _dt.timedelta(days=1), 130.0),
            ("1-URGENT", d0 + _dt.timedelta(days=4), 40.0),
        ]
        df = spark.createDataFrame(
            [
                (p, _dt.datetime.combine(d, _dt.time()), v, 1, "x")
                for p, d, v in rows
            ],
            "o_orderpriority string, o_orderdate timestamp, "
            "o_totalprice double, o_orderkey int, o_orderstatus string",
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
        out = {
            r["priority"]: r.asDict()
            for r in CATALOG["orders_holt_forecast"]
            .builder(spark, str(tmp_path))
            .collect()
        }
        # explicit replay: series 100, 130, 0, 0, 40 (days 0..4)
        a, bt = 0.2, 0.1
        level, trend = 100.0, 0.0
        for x in [130.0, 0.0, 0.0, 40.0]:
            nl = a * x + (1 - a) * (level + trend)
            nb = bt * (a * (x - level) + (1 - a) * trend) + (1 - bt) * trend
            level, trend = nl, nb
        got = out["1-URGENT"]
        assert got["n_days"] == 3 and got["span_days"] == 4
        assert got["level"] == pytest.approx(level, abs=0, rel=0)
        assert got["trend"] == pytest.approx(trend, abs=0, rel=0)
        assert got["forecast_7d"] == got["level"] + 7.0 * got["trend"]

    def test_trend_positive_on_rising_series(self, spark, tmp_path):
        import datetime as _dt

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        d0 = _dt.date(1995, 3, 1)
        df = spark.createDataFrame(
            [
                (
                    "2-HIGH",
                    _dt.datetime.combine(
                        d0 + _dt.timedelta(days=i), _dt.time()
                    ),
                    100.0 + 10.0 * i,
                    i,
                    "x",
                )
                for i in range(30)
            ],
            "o_orderpriority string, o_orderdate timestamp, "
            "o_totalprice double, o_orderkey int, o_orderstatus string",
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
        row = (
            CATALOG["orders_holt_forecast"]
            .builder(spark, str(tmp_path))
            .collect()[0]
        )
        assert row["trend"] > 0
        assert row["forecast_7d"] > row["level"]


class TestEoqPolicy:
    def test_hand_formula_exact(self, spark, tmp_path):
        import datetime as _dt
        import math

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        li = spark.createDataFrame(
            [
                (1, _dt.date(1995, 6, 1), 10.0),
                (1, _dt.date(1995, 7, 1), 30.0),
                (2, _dt.date(1994, 6, 1), 99.0),  # outside the year
            ],
            "l_partkey bigint, l_shipdate date, l_quantity double",
        )
        pt = spark.createDataFrame(
            [(1, "Brand#11", 50.0), (2, "Brand#22", 10.0)],
            "p_partkey bigint, p_brand string, p_retailprice double",
        )
        li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
        pt.write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
        rows = (
            CATALOG["part_eoq_policy"].builder(spark, str(tmp_path)).collect()
        )
        assert len(rows) == 1  # part 2's demand is outside 1995
        r = rows[0].asDict()
        assert r["annual_demand"] == 40
        eoq = math.sqrt(2.0 * 40.0 * 100.0 / (0.25 * 50.0))
        assert r["eoq_qty"] == eoq
        assert r["orders_per_year"] == 40.0 / eoq
        assert r["total_relevant_cost"] == pytest.approx(
            100.0 * 40.0 / eoq + 0.25 * 50.0 * eoq / 2.0, rel=1e-12
        )
        # at the EOQ optimum, ordering and holding cost halves are equal
        assert 100.0 * 40.0 / eoq == pytest.approx(
            0.25 * 50.0 * eoq / 2.0, rel=1e-12
        )


class TestWebmCodec:
    def test_roundtrip_all_knobs(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_webm, parse_webm_header,
        )

        m = parse_webm_header(
            encode_webm("webm", 1_000_000, 12345, 640, 360,
                        n_audio_tracks=1)
        )
        assert m == {
            "doc_type": "webm", "timecode_scale": 1_000_000,
            "duration_tc": 12345.0, "duration_ms": 12345,
            "n_tracks": 2, "width": 640, "height": 360,
        }
        m2 = parse_webm_header(encode_webm("matroska", 1_000_000, 40, 16, 16))
        assert (m2["doc_type"], m2["n_tracks"]) == ("matroska", 1)

    def test_non_ms_timecode_scale(self):
        """A 100-us TimecodeScale: duration 500 tc units = 50 ms."""
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_webm, parse_webm_header,
        )

        m = parse_webm_header(encode_webm("webm", 100_000, 500, 32, 32))
        assert m["timecode_scale"] == 100_000
        assert m["duration_ms"] == 50

    def test_truncation_sweep_is_loud(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_webm, parse_webm_header,
        )

        p = encode_webm("webm", 1_000_000, 777, 128, 96, n_audio_tracks=1)
        for cut in range(4, len(p)):
            with pytest.raises(ValueError):
                parse_webm_header(p[:cut])

    def test_unknown_size_segment_streaming_layout(self):
        """Live-mux WebM writes the Segment with an all-ones (unknown)
        size; the walk must treat its body as running to end of
        payload — and refuse unknown size anywhere else."""
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_webm, parse_webm_header,
        )

        p = encode_webm("webm", 1_000_000, 12345, 640, 360,
                        n_audio_tracks=1)
        seg = bytes.fromhex("18538067")
        i = p.index(seg)
        n = 9 - p[i + 4].bit_length()
        unknown = p[: i + 4] + bytes([0xFF]) + p[i + 4 + n :]
        m = parse_webm_header(unknown)
        assert m["duration_ms"] == 12345 and m["n_tracks"] == 2
        # unknown-size Info (a child) must raise instead
        info = bytes.fromhex("1549A966")
        j = unknown.index(info)
        n2 = 9 - unknown[j + 4].bit_length()
        bad = unknown[: j + 4] + bytes([0xFF]) + unknown[j + 4 + n2 :]
        with pytest.raises(ValueError):
            parse_webm_header(bad)

    def test_non_ebml_hits_the_seam(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            parse_webm_header,
        )

        with pytest.raises(NotImplementedError):
            parse_webm_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)

    def test_router_routes_webm_and_others_refuse_it(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_webm, parse_id3_tags, parse_mp3_frames,
            parse_mp4_header, parse_webp_header, route_media_codec,
        )

        p = encode_webm("webm", 1_000_000, 2048, 64, 32)
        out = route_media_codec(p)
        assert out == {"media_type": "webm", "duration_ms": 2048}
        for parser in (
            parse_mp4_header, parse_mp3_frames, parse_webp_header,
            parse_id3_tags,
        ):
            with pytest.raises(NotImplementedError):
                parser(p)

    def test_sniff_knows_ebml_magic(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            MAGIC_SIGNATURES,
        )

        assert ("1A45DFA3", "webm") in MAGIC_SIGNATURES


class TestIvfPqAdc:
    def _replay(self, vecs):
        """Pure-Python IVF-PQ replay: quantize, assign, residual-PQ
        encode, probe, ADC rank — the cross-engine diagnose idiom."""
        import math

        def q8(v):
            sc = max(abs(float(x)) for x in v) / 127.0
            if sc == 0:
                return [0] * len(v)
            return [
                int(max(-127.0, min(127.0, math.floor(float(x) / sc + 0.5))))
                for x in v
            ]

        qz = {i: q8(v) for i, v in vecs.items()}
        ids = sorted(qz)
        coarse = {c: qz[ids[c]] for c in range(min(8, len(ids)))}

        def l2(a, b):
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        asg, res = {}, {}
        for i in ids:
            cell = min(coarse, key=lambda c: (l2(qz[i], coarse[c]), c))
            asg[i] = cell
            res[i] = [x - y for x, y in zip(qz[i], coarse[cell])]
        seeds = {c2: res[ids[c2]] for c2 in range(min(16, len(ids)))}

        def sub(v, j):
            return v[j * 8 : j * 8 + 8]

        enc = {
            i: [
                min(
                    seeds,
                    key=lambda c2: (l2(sub(res[i], j), sub(seeds[c2], j)), c2),
                )
                for j in range(8)
            ]
            for i in ids
        }
        out = {}
        for qid in [i for i in ids if i % 25 == 0]:
            probes = sorted(
                coarse, key=lambda c: (l2(qz[qid], coarse[c]), c)
            )[:2]
            scored = []
            for cell in probes:
                qr = [x - y for x, y in zip(qz[qid], coarse[cell])]
                lut = {
                    (j, c2): l2(sub(qr, j), sub(seeds[c2], j))
                    for j in range(8)
                    for c2 in seeds
                }
                for nid in ids:
                    if nid != qid and asg[nid] == cell:
                        scored.append(
                            (
                                sum(
                                    lut[(j, enc[nid][j])] for j in range(8)
                                ),
                                nid,
                                cell,
                            )
                        )
            scored.sort()
            exact = sorted(
                (l2(qz[qid], qz[n]), n) for n in ids if n != qid
            )[:5]
            exact_ids = {n for _, n in exact}
            out[qid] = [
                {
                    "rank": r + 1,
                    "neighbor_id": nid,
                    "cell": cell,
                    "adc_dist": dist,
                    "exact_dist": l2(qz[qid], qz[nid]),
                    "hit": nid in exact_ids,
                }
                for r, (dist, nid, cell) in enumerate(scored[:5])
            ]
        return out

    def test_matches_pure_python_replay(self, spark, tmp_path):
        import random

        from adventureworks_pysparkjobs_spark.operators.similarity import (
            ivfpq_adc_topk,
        )

        rng = random.Random(7)
        vecs = {
            i: [rng.uniform(-1, 1) for _ in range(64)] for i in range(60)
        }
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id bigint, embedding array<float>",
        )
        # the float32 column is what both engines actually see
        f32 = {
            r["vec_id"]: list(r["embedding"]) for r in df.collect()
        }
        expected = self._replay(f32)
        got = {}
        for r in ivfpq_adc_topk(df).collect():
            got.setdefault(r["query_id"], []).append(
                {
                    "rank": r["rank"],
                    "neighbor_id": r["neighbor_id"],
                    "cell": r["cell"],
                    "adc_dist": r["adc_dist"],
                    "exact_dist": r["exact_dist"],
                    "hit": r["hit"],
                }
            )
        for qid in got:
            got[qid].sort(key=lambda x: x["rank"])
        assert got == expected

    def test_recall_reasonable_on_real_table(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        rows = (
            CATALOG["emb_ivfpq_adc_recall"]
            .builder(spark, "/root/testdata/sf0.001")
            .collect()
        )
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        assert all(len(v) == 5 for v in per_q.values())
        assert all(
            sorted(x["rank"] for x in v) == [1, 2, 3, 4, 5]
            for v in per_q.values()
        )
        # Near-uniform synthetic embeddings are PQ's worst case (no
        # low-dim structure to quantize); the tuned entry config
        # (n_probe=4/8, m=16 x d=4, 32 codes) measures 0.27 here vs a
        # 0.85 exact-scoring-in-probed-cells ceiling — the floor
        # guards the implementation, not the data's geometry.
        hits = sum(1 for r in rows if r["hit"])
        assert hits / len(rows) >= 0.15, hits / len(rows)
        assert all(r["adc_dist"] >= 0 for r in rows)


class TestHoltWinters:
    def test_hand_computed_fold_exact(self, spark, tmp_path):
        """Four order days with a 3-day gap: the nested fold must equal
        the explicit zero-filled triple-smoothing recursion bit for
        bit, including which day-of-week slot each zero day decays."""
        import datetime as _dt

        from adventureworks_pysparkjobs_spark.queries import CATALOG

        d0 = _dt.date(1995, 3, 6)  # a Monday; dayn % 7 gives the slot
        rows = [
            ("1-URGENT", d0, 100.0),
            ("1-URGENT", d0 + _dt.timedelta(days=1), 130.0),
            ("1-URGENT", d0 + _dt.timedelta(days=4), 40.0),
            ("1-URGENT", d0 + _dt.timedelta(days=8), 90.0),
        ]
        df = spark.createDataFrame(
            [
                (p, _dt.datetime.combine(d, _dt.time()), v, 1, "x")
                for p, d, v in rows
            ],
            "o_orderpriority string, o_orderdate timestamp, "
            "o_totalprice double, o_orderkey int, o_orderstatus string",
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
        out = {
            r["dow"]: r.asDict()
            for r in CATALOG["orders_holt_winters_forecast"]
            .builder(spark, str(tmp_path))
            .collect()
        }
        # explicit replay over days 0..8 (values at 0,1,4,8; zero else)
        a, bt, gm = 0.2, 0.1, 0.15
        dayn0 = (d0 - _dt.date(1970, 1, 1)).days
        series = {0: 100.0, 1: 130.0, 4: 40.0, 8: 90.0}
        level, trend, s = 100.0, 0.0, [0.0] * 7
        for off in range(1, 9):
            x = series.get(off, 0.0)
            dow = (dayn0 + off) % 7
            nl = a * (x - s[dow]) + (1 - a) * (level + trend)
            nb = bt * (a * (x - s[dow] - level) + (1 - a) * trend) + (
                1 - bt
            ) * trend
            ns = gm * (x - nl) + (1 - gm) * s[dow]
            level, trend, s[dow] = nl, nb, ns
        last = dayn0 + 8
        for dow in range(7):
            got = out[dow]
            assert got["n_days"] == 4 and got["span_days"] == 8
            assert got["level"] == level
            assert got["trend"] == trend
            assert got["seasonal"] == s[dow]
            h = ((dow - last % 7 + 6) % 7) + 1
            assert got["horizon_days"] == h
            assert got["forecast"] == level + float(h) * trend + s[dow]
        assert sorted(r["horizon_days"] for r in out.values()) == list(
            range(1, 8)
        )


class TestAviCodec:
    def test_roundtrip(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_avi, parse_avi_header,
        )

        m = parse_avi_header(encode_avi(40000, 250, 640, 480, 2))
        assert m == {
            "us_per_frame": 40000, "total_frames": 250,
            "duration_ms": 10000, "n_streams": 2, "width": 640,
            "height": 480,
        }

    def test_truncation_sweep_is_loud(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_avi, parse_avi_header,
        )

        p = encode_avi(33333, 777, 320, 240, 1, movi_bytes=23)
        for cut in range(12, len(p)):
            with pytest.raises(ValueError):
                parse_avi_header(p[:cut])

    def test_riff_subtypes_route_distinctly(self):
        """WAVE goes to the WAV walk, 'AVI ' to the AVI walk, and each
        parser refuses the other subtype at its seam — the property
        doc_media_riff_subtypes' triage relies on."""
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_avi, encode_wav, parse_avi_header, parse_wav_header,
            route_media_codec,
        )

        avi = encode_avi(40000, 100, 64, 32)
        wav = encode_wav(8000, 1, 4000, seed=3)
        assert route_media_codec(avi) == {
            "media_type": "avi", "duration_ms": 4000,
        }
        assert route_media_codec(wav)["media_type"] == "wav"
        with pytest.raises(NotImplementedError):
            parse_avi_header(wav)
        with pytest.raises(NotImplementedError):
            parse_wav_header(avi)

    def test_zero_frame_period_is_loud(self):
        from adventureworks_pysparkjobs_spark.operators.multimodal import (
            encode_avi, parse_avi_header,
        )

        with pytest.raises(ValueError):
            parse_avi_header(encode_avi(0, 100, 64, 32))


class TestIvfPqRerank:
    def test_rerank_properties_and_recall_recovery(self, spark):
        from adventureworks_pysparkjobs_spark.queries import CATALOG

        sf = "/root/testdata/sf0.001"
        adc = CATALOG["emb_ivfpq_adc_recall"].builder(spark, sf).collect()
        rr = CATALOG["emb_ivfpq_rerank_recall"].builder(spark, sf).collect()
        per_q: dict = {}
        for r in rr:
            per_q.setdefault(r["query_id"], []).append(r)
        for q, rows in per_q.items():
            rows.sort(key=lambda x: x["rank"])
            assert [x["rank"] for x in rows] == [1, 2, 3, 4, 5]
            dists = [x["exact_dist"] for x in rows]
            assert dists == sorted(dists)  # exact-rescored order
            assert all(1 <= x["adc_rank"] <= 20 for x in rows)
        # the refinement knob must RECOVER recall: everything the ADC
        # ordering surfaced in its top-5 that is truly in the exact
        # top-5 survives rescoring, and shortlist depth 20 adds more
        hits_adc = sum(1 for r in adc if r["hit"])
        hits_rr = sum(1 for r in rr if r["hit"])
        assert hits_rr >= hits_adc
        assert hits_rr / len(rr) >= 0.4  # measured 0.60 vs 0.27 ADC
