"""Fixture-drift canary: the events timestamp layer must survive every
physical encoding the fixture generator has shipped.

The ``ts`` column of events.parquet has drifted across driver versions:
TIMESTAMP(NANOS) (round 1), TIMESTAMP(MICROS) not-adjusted-to-UTC
(round 2 — broke every time-arithmetic query), and plausibly
TIMESTAMP(MICROS) adjusted-to-UTC next. These tests synthesize a tiny
parquet file of each encoding and assert that BOTH the batch source
(sources/corpus.py load_table) and the streaming source
(streaming/events.py read_events_stream) normalize them to the same
TimestampType instants — so the next drift fails here, in seconds, not
in the driver's correctness gate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adventureworks_pysparkjobs_spark.sources.corpus import load_table
from adventureworks_pysparkjobs_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
)

# 2024-03-01T00:00:00Z and one hour later, as epoch microseconds.
EPOCH_US = [1_709_251_200_000_000, 1_709_254_800_000_000]

ENCODINGS = {
    "nanos_as_long": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
    # PLAIN int64 epochs with no parquet timestamp logical type — the
    # magnitude-branched repair must classify each unit correctly.
    # (value = µs * numerator // denominator, integer arithmetic — a
    # float multiply could truncate off-by-one for some µs values)
    "int64_nanos": ("int64", 1_000, 1),
    "int64_micros": ("int64", 1, 1),
    "int64_millis": ("int64", 1, 1_000),
    "int64_seconds": ("int64", 1, 1_000_000),
}


def _write_events(path: str, ts_type) -> None:
    if isinstance(ts_type, tuple):
        _, num, den = ts_type
        ts = pa.array(
            [us * num // den for us in EPOCH_US], type=pa.int64()
        )
    elif ts_type.unit == "ns":
        ts = pa.array([us * 1000 for us in EPOCH_US], type=ts_type)
    else:
        ts = pa.array(EPOCH_US, type=ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 10], type=pa.int64()),
            "event_type": pa.array(["click", "purchase"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_batch_load_normalizes_every_ts_encoding(spark, tmp_path, enc):
    d = tmp_path / enc
    d.mkdir()
    _write_events(str(d / "events.parquet"), ENCODINGS[enc])
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # The instant survives: epoch seconds and the downstream bigint cast
    # (the exact expression the time-bucket queries use) both work.
    rows = df.selectExpr("event_id", "CAST(ts AS BIGINT) AS s").collect()
    got = {r["event_id"]: r["s"] for r in rows}
    assert got == {1: EPOCH_US[0] // 1_000_000, 2: EPOCH_US[1] // 1_000_000}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_stream_read_normalizes_every_ts_encoding(spark, tmp_path, enc):
    d = tmp_path / enc
    d.mkdir()
    _write_events(str(d / "events.parquet"), ENCODINGS[enc])
    ev = read_events_stream(spark, str(d))
    assert dict(ev.dtypes)["ts"] == "timestamp"
    out = run_to_memory(
        ev.selectExpr("event_id", "CAST(ts AS BIGINT) AS s"), "append", spark
    )
    got = {r["event_id"]: r["s"] for r in out.collect()}
    assert got == {1: EPOCH_US[0] // 1_000_000, 2: EPOCH_US[1] // 1_000_000}


@pytest.mark.parametrize(
    "values, kind",
    [
        ([10**9, 2 * 10**18], "mixed"),  # seconds-band min, nanos-band max
        ([5 * 10**10, 6 * 10**10], "out-of-band"),  # between s and ms bands
        ([-5, 10**9], "out-of-band"),  # negative epoch
    ],
)
def test_int64_ts_mixed_or_out_of_band_fails_loudly(
    spark, tmp_path, values, kind
):
    """A plain-int64 ts column whose min/max straddle epoch-unit bands
    (or fall outside every band) is a generator bug: the loader must
    refuse with a clear error, not silently pick a unit and produce
    instants 1000x off (ADVICE r3). Both the batch and streaming readers
    share the classification, so both must raise."""
    d = tmp_path / "bad"
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array(range(1, len(values) + 1), type=pa.int64()),
            "ts": pa.array(values, type=pa.int64()),
            "user_id": pa.array([10] * len(values), type=pa.int64()),
            "event_type": pa.array(["click"] * len(values)),
            "value": pa.array([1.5] * len(values), type=pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(values)),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    with pytest.raises(ValueError, match="epoch"):
        load_table(spark, str(d), "events")
    with pytest.raises(ValueError, match="epoch"):
        read_events_stream(spark, str(d))


DOC_TEXT_TYPES = {
    "string": pa.string(),
    # Arrow large_string maps to the same Spark/DuckDB string type but a
    # different parquet physical layout — the generator could flip to it
    # for >2 GiB row groups at larger SFs.
    "large_string": pa.large_string(),
}


@pytest.mark.parametrize("ty", sorted(DOC_TEXT_TYPES))
@pytest.mark.parametrize("with_nulls", [False, True])
def test_documents_text_encoding_and_nullability_drift(
    spark, tmp_path, ty, with_nulls
):
    """The documents fixture ships non-null string text today; if the
    generator flips to large_string or starts emitting NULL text rows,
    the text stack and its DuckDB oracles must agree unchanged. Runs the
    exact-dedup and text-profile catalog queries against their own
    oracles on a synthesized fixture of each shape."""
    import duckdb

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",  # exact duplicate
        "the quick brown fox jumps over the lazy dog",
        "short one",
    ]
    if with_nulls:
        texts = texts + [None, None]
    n = len(texts)
    table = pa.table(
        {
            "doc_id": pa.array(range(1, n + 1), type=pa.int64()),
            "text": pa.array(texts, type=DOC_TEXT_TYPES[ty]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["web"] * n),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    from adventureworks_pysparkjobs_spark.queries import CATALOG

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    for qname in ("doc_exact_dedup", "doc_text_profile", "doc_line_clean"):
        q = CATALOG[qname]
        sdf = q.builder(spark, str(tmp_path))
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(repr(r[c]) for c in scols) for r in sdf.collect()
        )
        cur = con.execute(q.oracle)
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in scols]
        orows = sorted(
            tuple(repr(r[i]) for i in idx) for r in cur.fetchall()
        )
        assert len(srows) > 0, f"{qname}: empty result"
        assert srows == orows, f"{qname}: spark/oracle mismatch on {ty} nulls={with_nulls}"


DATE_ENCODINGS = {
    "date32": pa.date32(),
    "ts_micros_ntz": pa.timestamp("us"),
    "ts_micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("enc", sorted(DATE_ENCODINGS))
def test_date_predicates_survive_orders_encoding_drift(spark, tmp_path, enc):
    """The generator may ship o_orderdate/l_shipdate as DATE or either
    TIMESTAMP flavor. String-literal comparisons, interval arithmetic and
    calendar functions — the shapes every TPC-H query uses — must work on
    all three. (The events `ts` drift of r2 is this same failure class.)"""
    import datetime

    ty = DATE_ENCODINGS[enc]
    if ty == pa.date32():
        dates = pa.array(
            [datetime.date(1996, 1, 15), datetime.date(1997, 6, 1)], type=ty
        )
        ships = pa.array(
            [datetime.date(1996, 3, 15), datetime.date(1997, 6, 10)], type=ty
        )
    else:
        us = [822_787_200_000_000, 865_123_200_000_000]  # 1996-01-28, 1997-06-01
        dates = pa.array(us, type=ty)
        # strictly more than 30 days late (q4's residual is a strict >)
        ships = pa.array([u + 86_400_000_000 * 35 for u in us], type=ty)
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], type=pa.int64()),
            "o_custkey": pa.array([10, 11], type=pa.int64()),
            "o_orderstatus": pa.array(["O", "F"]),
            "o_totalprice": pa.array([100.0, 200.0], type=pa.float64()),
            "o_orderdate": dates,
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
        }
    )
    lineitem_cols = {
        "l_orderkey": pa.array([1, 2], type=pa.int64()),
        "l_partkey": pa.array([1, 2], type=pa.int64()),
        "l_suppkey": pa.array([1, 2], type=pa.int64()),
        "l_linenumber": pa.array([1, 1], type=pa.int64()),
        "l_quantity": pa.array([5.0, 7.0], type=pa.float64()),
        "l_extendedprice": pa.array([50.0, 70.0], type=pa.float64()),
        "l_discount": pa.array([0.05, 0.02], type=pa.float64()),
        "l_tax": pa.array([0.02, 0.03], type=pa.float64()),
        "l_returnflag": pa.array(["N", "R"]),
        "l_linestatus": pa.array(["O", "F"]),
        "l_shipdate": ships,
    }
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table(lineitem_cols), str(tmp_path / "lineitem.parquet"))

    from adventureworks_pysparkjobs_spark.queries import CATALOG

    # Date-arithmetic-heavy shapes: filter + interval residual semi join,
    # calendar functions. q4's quarter filter + 30-day interval must
    # actually MATCH the first synthesized order (orderdate in Q1-1996,
    # shipped 30+ days later), so the interval comparison executes with
    # data on every encoding — a zero-row pass would only analysis-check.
    q4 = CATALOG["q4_priority_exists"].builder(spark, str(tmp_path))
    assert [r["o_orderpriority"] for r in q4.collect()] == ["1-URGENT"]
    df = CATALOG["date_functions_orders"].builder(spark, str(tmp_path))
    assert df.count() == 2


def test_batch_and_stream_agree_on_the_real_fixture(spark):
    """Whatever encoding /root/testdata currently ships, batch and stream
    read the same instants."""
    from .conftest import SF_SMOKE

    batch = load_table(spark, SF_SMOKE, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp"
    stream = read_events_stream(spark, SF_SMOKE)
    out = run_to_memory(stream.select("event_id", "ts"), "append", spark)
    b = {r["event_id"]: r["ts"] for r in batch.select("event_id", "ts").collect()}
    s = {r["event_id"]: r["ts"] for r in out.collect()}
    assert b == s


def test_minhash_short_docs_never_collide_or_divide_by_zero(spark):
    """Documents with fewer than n tokens have empty shingle sets; they
    must be excluded from LSH banding (their '' band signature would
    otherwise form a giant skew bucket and a 0/0 Jaccard under ANSI mode
    — hit for real at sf0.1 inside the corpus pipeline). Real dups still
    pair; short docs never do."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_against,
        minhash_band_snapshot,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta " * 3
    rows = [
        (1, text),
        (2, text + "iota"),
        (3, "tiny"),          # < 3 tokens -> empty shingle set
        (4, "also tiny"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, n=3, threshold=0.5).collect()
    got = {(r["id1"], r["id2"]) for r in pairs}
    assert (1, 2) in got
    assert all({p[0], p[1]} <= {1, 2} for p in got), got

    snap = minhash_band_snapshot(df.filter(F.col("doc_id") % 2 == 0), n=3)
    inc = minhash_lsh_pairs_against(
        df.filter(F.col("doc_id") % 2 == 1), snap, n=3, threshold=0.25
    ).collect()
    assert {(r["batch_id"], r["snapshot_id"]) for r in inc} == {(1, 2)}


@pytest.mark.parametrize("elem", ["float32", "float64"])
def test_embedding_element_type_drift(spark, tmp_path, elem):
    """The embeddings fixture ships list<float> today; if the generator
    flips to list<double>, the similarity stack (double-precision folds)
    and its oracles must agree unchanged. Runs the exact-cosine catalog
    query against its DuckDB oracle on a synthesized fixture of each
    element type."""
    import duckdb
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 8)).astype(elem)
    ty = pa.float32() if elem == "float32" else pa.float64()
    table = pa.table(
        {
            "vec_id": pa.array(range(40), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], type=pa.list_(ty)
            ),
            "label": pa.array([i % 4 for i in range(40)], type=pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))

    from adventureworks_pysparkjobs_spark.queries import CATALOG

    q = CATALOG["emb_cosine_topk"]
    sdf = q.builder(spark, str(tmp_path))
    srows = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine_sim"], r["rnk"])
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    ocols = [d[0] for d in con.execute(q.oracle).description]
    raw = con.execute(q.oracle).fetchall()
    idx = [ocols.index(c) for c in ("query_id", "neighbor_id", "cosine_sim", "rnk")]
    orows = sorted(tuple(r[i] for i in idx) for r in raw)
    assert len(srows) == len(orows) > 0
    for (sq, sv, ss, sr), (oq, ov, os, orr) in zip(srows, orows):
        assert (sq, sv, sr) == (oq, ov, orr)
        assert ss == os or abs(ss - os) < 1e-12
