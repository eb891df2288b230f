"""Distributed BPE training/encoding vs a pure-Python reference
(Sennrich et al. ACL'16 algorithm: weighted pair stats -> argmax ->
greedy non-overlapping replace, ties broken lexicographically)."""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.bpe import (
    EOW,
    bpe_encode,
    merges_df,
    train_bpe_merges,
    word_counts,
)
from adventureworks_pysparkjobs_spark.sources.corpus import load_table

from .conftest import SF_SMOKE


def _replace(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(counts: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {w: list(w) + [EOW] for w in counts}
    merges = []
    for _ in range(n_merges):
        stats: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += counts[w]
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        vocab = {w: _replace(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def _py_counts(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        c.update(w.lower() for w in t.split())
    return dict(c)


@pytest.mark.slow
def test_train_matches_reference_on_fixture(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    merges, sym = train_bpe_merges(docs, n_merges=8)
    ref_merges, ref_vocab = ref_train(_py_counts(texts), 8)
    assert merges == ref_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in sym.collect()}
    assert got_vocab == ref_vocab

    # determinism: a second run (fresh plans, fresh checkpoints) agrees
    assert train_bpe_merges(docs, n_merges=8)[0] == merges

    # the artifact frame carries ranks in training order
    art = merges_df(spark, merges).collect()
    assert [(r["left"], r["right"], r["pair_count"]) for r in art] == merges
    assert [r["rank"] for r in art] == list(range(len(merges)))


words_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=5),
    min_size=1,
    max_size=12,
)


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(words_strategy, min_size=1, max_size=4))
@pytest.mark.slow
def test_train_matches_reference_on_random_corpora(spark, docs):
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, _ = train_bpe_merges(df, n_merges=5, min_count=1)
    assert merges == ref_train(_py_counts(texts), 5, min_count=1)[0]


def test_encode_roundtrip_and_training_consistency(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    merges, sym = train_bpe_merges(docs, n_merges=8)
    assert len(merges) > 0

    enc = bpe_encode(docs, merges)
    got = {r["doc_id"]: list(r["toks"]) for r in enc.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(texts)
    for did, toks in got.items():
        words = [w.lower() for w in texts[did].split()]
        # lossless: concatenating the tokens reproduces every word with
        # its end-of-word sentinel, in order
        assert "".join(toks) == "".join(w + EOW for w in words)

    # greedy rank-order encoding reproduces the training segmentation
    # for every training word (the standard-BPE consistency property)
    train_seg = {r["word"]: list(r["syms"]) for r in sym.collect()}
    seen = set()
    for did, toks in got.items():
        words = [w.lower() for w in texts[did].split()]
        i = 0
        for w in words:
            n = len(train_seg[w])
            if w not in seen:
                seen.add(w)
                assert toks[i : i + n] == train_seg[w], w
            i += n


def test_word_counts_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert got == _py_counts(texts)


def test_empty_and_unmergeable_corpora(spark):
    # single-char words + min_count beyond any pair count -> no merges
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a")], "doc_id long, text string"
    )
    merges, sym = train_bpe_merges(df, n_merges=5, min_count=100)
    assert merges == []
    # symbolization is still the initial char+EOW split
    got = {r["word"]: list(r["syms"]) for r in sym.collect()}
    assert got == {"a": ["a", EOW], "b": ["b", EOW], "c": ["c", EOW]}

    # empty corpus trains nothing and encodes nothing
    empty = spark.createDataFrame([], "doc_id long, text string")
    merges2, _ = train_bpe_merges(empty, n_merges=3)
    assert merges2 == []
    assert bpe_encode(empty, merges2).count() == 0
