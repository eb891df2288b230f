"""End-to-end training-corpus pipeline: composition invariants."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.jobs.corpus_pipeline import (
    build_training_corpus,
    c4_quality_filter,
)
from adventureworks_pysparkjobs_spark.sources.corpus import load_table

from .conftest import SF_SMOKE


def test_build_training_corpus_invariants(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    metrics = {}
    out = build_training_corpus(
        spark, SF_SMOKE, benchmark=bench, metrics=metrics
    ).cache()
    rows = out.collect()
    assert len(rows) > 0

    # Observation counters were computed inside the pipeline's own
    # actions (no extra scans): phases only ever drop documents, and the
    # observed endpoints must equal the materialized truth.
    got = {k: metrics[k].get["rows"] for k in metrics}
    assert set(got) == {
        "quality", "exact_dedup", "span_dedup", "near_dup", "packed"
    }
    assert (
        got["quality"] >= got["exact_dedup"] >= got["span_dedup"]
        >= got["near_dup"] > 0
    )
    assert got["packed"] == len(rows)
    assert got["near_dup"] >= len({r["doc_id"] for r in rows})
    cols = set(out.columns)
    assert {
        "doc_id", "chunk_id", "chunk_text", "n_chunk_tokens",
        "source", "seq_id", "seq_pos",
    } <= cols

    # chunk/pack budgets hold
    assert all(r["n_chunk_tokens"] <= 32 for r in rows)
    seq_tot = (
        out.groupBy("seq_id").agg(F.sum("n_chunk_tokens").alias("t")).collect()
    )
    assert all(r["t"] <= 64 for r in seq_tot)

    # benchmark docs were decontaminated away (they self-match on 8-grams)
    bench_ids = {r["doc_id"] for r in bench.collect()}
    assert bench_ids.isdisjoint({r["doc_id"] for r in rows})

    # every surviving doc passed the quality gate
    quality_ids = {
        r["doc_id"] for r in c4_quality_filter(docs).select("doc_id").collect()
    }
    assert {r["doc_id"] for r in rows} <= quality_ids
    out.unpersist()


@pytest.mark.slow
def test_build_training_corpus_deterministic_and_mixable(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    rates = {s: 0.5 for s in srcs}

    def run():
        return sorted(
            map(
                tuple,
                build_training_corpus(spark, SF_SMOKE, rates=rates)
                .select("doc_id", "chunk_id", "chunk_text", "seq_id", "seq_pos")
                .collect(),
            )
        )

    a, b = run(), run()
    assert a == b and len(a) > 0

    # mixture at 0.5 keeps a strict subset of the quality-gated docs
    n_docs_out = len({t[0] for t in a})
    n_quality = c4_quality_filter(docs).count()
    assert 0 < n_docs_out < n_quality


@pytest.mark.slow
def test_build_training_corpus_incremental_seen(spark):
    """A prior snapshot's digest frame makes the pipeline incremental:
    already-ingested content never re-enters, and a full snapshot drains
    the run to empty (every phase tolerates an empty frame)."""
    from adventureworks_pysparkjobs_spark.operators.dedup import exact_dedup

    docs = load_table(spark, SF_SMOKE, "documents")

    # half snapshot: no surviving chunk comes from a seen document
    half = exact_dedup(docs.filter(F.col("doc_id") % 2 == 0)).select(
        "content_hash"
    )
    metrics = {}
    out = build_training_corpus(
        spark, SF_SMOKE, seen=half, metrics=metrics
    ).cache()
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    assert "seen_dedup" in metrics
    got = {k: metrics[k].get["rows"] for k in metrics}
    assert got["quality"] >= got["seen_dedup"] >= got["exact_dedup"]
    out.unpersist()

    # full snapshot: nothing is novel, the pipeline returns empty
    full = exact_dedup(docs).select("content_hash")
    assert build_training_corpus(spark, SF_SMOKE, seen=full).count() == 0
