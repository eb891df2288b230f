"""Behavioral tests for sampling.dsir_weights — the ln-based weight
column the catalog oracle declares out of scope (libm last-ulp)."""

from __future__ import annotations

import pytest

import hashlib
import math
from collections import Counter

from adventureworks_pysparkjobs_spark.operators.sampling import dsir_weights

BUCKETS = 64


def _bucket(f: str) -> int:
    return int(hashlib.md5(("dsir" + f).encode()).hexdigest()[:4], 16) % BUCKETS


def _feats(text: str) -> list[int]:
    t = [x.lower() for x in text.split() if x]
    feats = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
    return [_bucket(f) for f in feats]


def _reference_weights(corpus, target):
    cs = Counter(b for _, txt in corpus for b in _feats(txt))
    ct = Counter(b for _, txt in target for b in _feats(txt))
    ns, nt = sum(cs.values()), sum(ct.values())
    out = {}
    for i, txt in corpus:
        w = 0.0
        for b, n in Counter(_feats(txt)).items():
            ratio = math.log((ct.get(b, 0) + 1) / (nt + BUCKETS)) - math.log(
                (cs[b] + 1) / (ns + BUCKETS)
            )
            w += n * ratio
        out[i] = w
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "stock market prices rose sharply on tuesday trading"),
    (3, "a quick brown dog jumps over a lazy fox"),
    (4, "market analysts expect prices to keep rising this quarter"),
    (5, ""),
]
TARGET = [
    (101, "quick foxes and lazy dogs jump over brown fences"),
    (102, "the brown fox and the lazy dog"),
    (103, "a quick brown dog jumps over a lazy fox again"),
]


class TestDsirWeights:
    def _run(self, spark, repartition=None):
        c = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        t = spark.createDataFrame(TARGET, ["doc_id", "text"])
        if repartition:
            c, t = c.repartition(repartition), t.repartition(repartition)
        return {
            r["doc_id"]: r
            for r in dsir_weights(c, t, buckets=BUCKETS).collect()
        }

    def test_target_like_docs_score_higher(self, spark):
        """Per-feature-normalized weight separates the target-like
        (animal) docs from the finance docs — raw sums also depend on
        doc length, so the discriminative signal is weight/feature."""
        out = self._run(spark)

        def norm(i):
            return out[i]["logweight"] / out[i]["n_features"]

        assert min(norm(1), norm(3)) > max(norm(2), norm(4))

    def test_matches_python_reference(self, spark):
        out = self._run(spark)
        want = _reference_weights(CORPUS, TARGET)
        for i, w in want.items():
            assert abs(out[i]["logweight"] - w) < 1e-9, (i, out[i], w)

    def test_empty_doc_zeroes(self, spark):
        out = self._run(spark)
        assert out[5]["n_features"] == 0
        assert out[5]["n_target_hits"] == 0
        assert out[5]["logweight"] == 0.0

    @pytest.mark.slow
    def test_partition_independent(self, spark):
        a = self._run(spark)
        b = self._run(spark, repartition=7)
        assert {
            (k, v["logweight"], v["n_features"]) for k, v in a.items()
        } == {(k, v["logweight"], v["n_features"]) for k, v in b.items()}
