"""Bigram-LM quality scoring vs a pure-Python reference (exact counts,
tolerance-pinned smoothed log-probability)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from adventureworks_pysparkjobs_spark.operators.lm import (
    lm_score,
    train_bigram_lm,
)
from adventureworks_pysparkjobs_spark.sources.corpus import load_table

from .conftest import SF_SMOKE


def _toks(t: str) -> list[str]:
    return [w.lower() for w in t.split()]


def ref_score(train_texts, texts, k=1.0):
    uni: Counter = Counter(w for t in train_texts for w in _toks(t))
    bi: Counter = Counter(
        (ws[i], ws[i + 1])
        for t in train_texts
        for ws in [_toks(t)]
        for i in range(len(ws) - 1)
    )
    vocab = len(uni)
    out = {}
    for did, t in texts.items():
        ws = _toks(t)
        pairs = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if not pairs:
            out[did] = (0, 0, None, None)
            continue
        n_hit = sum(1 for p in pairs if p in bi)
        lps = [
            math.log((bi.get(p, 0) + k) / (uni.get(p[0], 0) + k * vocab))
            for p in pairs
        ]
        out[did] = (
            len(pairs),
            n_hit,
            (len(pairs) - n_hit) / len(pairs),
            sum(lps) / len(lps),
        )
    return out


def test_lm_score_matches_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    uni, bi = train_bigram_lm(train)
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["n_hit"], r["oov_bigram_rate"], r["avg_logprob"]
        )
        for r in lm_score(docs, uni, bi).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = ref_score(
        [texts[d] for d in texts if d % 2 == 0], texts
    )
    assert set(got) == set(want)
    for did in want:
        gn, gh, gr, gl = got[did]
        wn, wh, wr, wl = want[did]
        assert (gn, gh) == (wn, wh), did
        if wr is None:
            assert gr is None and gl is None
        else:
            assert gr == wr, did  # exact int ratio, one IEEE division
            # ln is last-ulp libm-dependent; Spark sums in any order
            assert math.isclose(gl, wl, rel_tol=1e-9), did
    # the held-out half must actually contain unseen bigrams somewhere
    assert any(r[2] and r[2] > 0 for r in got.values())
    # training docs score their own bigrams as seen
    assert all(
        got[d][1] == got[d][0] for d in got if d % 2 == 0
    )


def test_lm_score_short_and_oov_docs(spark):
    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
    )
    uni, bi = train_bigram_lm(train)
    score = spark.createDataFrame(
        [
            (10, "the cat sat"),   # all bigrams known
            (11, "purple cat sat"),  # first bigram OOV
            (12, "one"),          # too short: nothing to score
            (13, ""),             # empty
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in lm_score(score, uni, bi).collect()
    }
    assert got[10]["n_bigrams"] == 2 and got[10]["n_hit"] == 2
    assert got[10]["oov_bigram_rate"] == 0.0
    assert got[11]["n_bigrams"] == 2 and got[11]["n_hit"] == 1
    assert got[11]["oov_bigram_rate"] == 0.5
    # known text scores strictly better than the OOV one
    assert got[10]["avg_logprob"] > got[11]["avg_logprob"]
    for short in (12, 13):
        assert got[short]["n_bigrams"] == 0 and got[short]["n_hit"] == 0
        assert got[short]["oov_bigram_rate"] is None
        assert got[short]["avg_logprob"] is None


class TestHashedLinearScores:
    def test_matches_python_reference(self, spark):
        import hashlib

        from adventureworks_pysparkjobs_spark.operators.lm import (
            hashed_linear_scores,
            pseudo_weights,
        )

        def h4(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)

        docs = [
            (1, "alpha beta alpha"),
            (2, "gamma  delta\nepsilon"),
            (3, "  "),  # whitespace-only: no tokens -> no output row
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {
            r["doc_id"]: (r["n_tokens"], r["logit_scaled"], r["is_positive"])
            for r in hashed_linear_scores(
                df, pseudo_weights(spark, 4096, "w", 1000)
            ).collect()
        }

        def ref(text):
            toks = [t for t in text.split() if t]
            logit = sum(
                h4(f"w:{h4('qc:' + t) % 4096}") % 2001 - 1000 for t in toks
            )
            return (len(toks), logit, logit > 0)

        assert out[1] == ref("alpha beta alpha")
        assert out[2] == ref("gamma  delta\nepsilon")
        assert 3 not in out

    def test_trained_weights_seam(self, spark):
        """Production path: weights come from training, not the pseudo
        table — injecting a one-feature table steers the verdict."""
        import hashlib

        from adventureworks_pysparkjobs_spark.operators.lm import (
            hashed_linear_scores,
        )

        tok_feature = (
            int(hashlib.md5(b"qc:good").hexdigest()[:4], 16) % 4096
        )
        weights = spark.createDataFrame(
            [(tok_feature, 7)], "feature int, w_scaled long"
        )
        df = spark.createDataFrame(
            [(1, "good good"), (2, "unseen")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: (r["logit_scaled"], r["is_positive"])
            for r in hashed_linear_scores(df, weights).collect()
        }
        assert out[1] == (14, True)
        # doc 2's only feature has no weight row: scores 0, kept
        assert out[2] == (0, False)


class TestClassifierAuc:
    def test_hand_checked_auc_with_ties(self, spark):
        """scores: pos={3,2}, neg={2,1}. Pairs: (3>2)=1, (3>1)=1,
        (2==2)=0.5, (2>1)=1 -> U=3.5, AUC=3.5/4=0.875. Built by
        writing a tiny documents table whose hashed-scorer scores are
        irrelevant — instead drive the same midrank math through the
        catalog entry is impractical here, so test the math inline."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rows = [(3.0, True), (2.0, True), (2.0, False), (1.0, False)]
        sc = spark.createDataFrame(rows, "score double, label boolean")
        per_s = sc.groupBy("score").agg(
            F.count_if(F.col("label")).cast("long").alias("p"),
            F.count_if(~F.col("label")).cast("long").alias("ng"),
        )
        w = Window.orderBy("score").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cum = per_s.select(
            "p", "ng",
            F.coalesce(F.sum("ng").over(w), F.lit(0)).alias("cn"),
        )
        row = cum.agg(
            F.sum(
                F.col("p") * (F.lit(2) * F.col("cn") + F.col("ng"))
            ).alias("num2"),
            F.sum("p").alias("P"),
            F.sum("ng").alias("N"),
        ).collect()[0]
        assert row["num2"] == 7  # 2U
        assert row["num2"] / (2 * row["P"] * row["N"]) == 0.875
