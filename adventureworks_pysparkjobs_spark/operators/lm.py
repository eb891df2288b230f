"""N-gram language-model quality scoring (the CCNet-style filter: score
documents against a reference-corpus LM, drop the ones the model finds
surprising — boilerplate, gibberish, wrong-language text).

The production version of this idea trains a 5-gram KenLM on a trusted
corpus and filters by perplexity; this operator is the distributed
primitive underneath: a bigram model with add-k smoothing, trained and
applied entirely as DataFrame ops.

Scale shape:

- training = two aggregations over one tokenized scan of the reference
  corpus (unigram + bigram counts, both map-side partially aggregated on
  uniform token keys);
- scoring = explode each document's bigrams once, ONE join against the
  bigram table and ONE against the unigram table (both plain equi-joins
  on the token keys — AQE broadcasts when the LM is small, shuffles when
  it isn't; no forced hints), then a per-document re-aggregation. Cost
  is O(corpus tokens + LM size), no quadratic term anywhere.

Determinism: counts and hit/OOV ratios are exact integer arithmetic and
one IEEE division — bit-stable across engines (they carry the catalog
oracle). The smoothed ``avg_logprob`` uses ``ln``, which is NOT
correctly-rounded and may differ in the last ulp between libm
implementations — it is pinned to a Python reference with a tolerance in
tests instead of a bit-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles, tokens


def _toks(text_col: str, lowercase: bool):
    t = tokens(text_col)
    return F.transform(t, lambda x: F.lower(x)) if lowercase else t


def _bigram_array(toks):
    """Space-joined bigram array; empty (not a descending-sequence
    artifact) for documents with fewer than two tokens."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(unigrams, bigrams) count frames from a reference corpus:
    ``(w, n_w)`` and ``(bg, n_bg)`` with ``bg`` the space-joined bigram
    (tokens are whitespace-split, so the join key is unambiguous)."""
    toks = _toks(text_col, lowercase)
    base = df.select(toks.alias("t"))
    unigrams = (
        base.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    bigrams = (
        base.select(F.explode(_bigram_array(F.col("t"))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    return unigrams, bigrams


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document LM features: ``n_bigrams``, ``n_hit`` (bigrams the
    model has seen), ``oov_bigram_rate`` and add-k-smoothed
    ``avg_logprob`` (mean ln P(w2|w1), P = (n_bg + k) / (n_w1 + k·V)).

    Documents with fewer than two tokens stay in the output with
    ``n_bigrams = 0`` and NULL rate/logprob (nothing to score — the
    caller's length filter owns them). ``V`` (vocabulary size) is one
    bounded driver-side aggregate over the unigram frame.
    """
    vocab_size = unigrams.count()
    toks = _toks(text_col, lowercase)
    ex = docs.select(
        F.col(id_col), F.explode(_bigram_array(toks)).alias("bg")
    ).withColumn(
        "w1", F.substring_index("bg", " ", 1)
    )
    joined = (
        ex.join(bigrams, "bg", "left")
        .join(unigrams.withColumnRenamed("w", "w1"), "w1", "left")
        .select(
            id_col,
            F.col("n_bg").isNotNull().cast("int").alias("hit"),
            F.log(
                (F.coalesce(F.col("n_bg"), F.lit(0)) + F.lit(k))
                / (
                    F.coalesce(F.col("n_w"), F.lit(0))
                    + F.lit(k) * F.lit(float(vocab_size))
                )
            ).alias("lp"),
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.sum("hit").cast("int").alias("n_hit"),
        F.avg("lp").alias("avg_logprob"),
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.when(
                F.col("n_bigrams") > 0,
                (F.col("n_bigrams") - F.col("n_hit")).cast("double")
                / F.col("n_bigrams"),
            ).alias("oov_bigram_rate"),
            "avg_logprob",
        )
    )


def pseudo_weights(
    spark,
    n_buckets: int = 4096,
    salt: str = "w",
    scale: int = 1000,
) -> DataFrame:
    """Deterministic stand-in weight table for ``hashed_linear_scores``
    — one integer weight in [-scale, scale] per feature bucket, derived
    from the MD5 of the bucket id (engine-portable, auditable). This is
    the injected-model seam: production replaces it with trained
    weights loaded as the same (feature, w_scaled) table."""
    return spark.range(int(n_buckets)).select(
        F.col("id").cast("int").alias("feature"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"), F.col("id").cast("string")
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % (2 * scale + 1)
            - scale
        ).cast("long").alias("w_scaled"),
    )


def hashed_linear_scores(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "qc",
) -> DataFrame:
    """Linear text classifier scored entirely as relational expressions
    — the fastText-style quality-filter pattern (a trained linear model
    over hashed bag-of-words features) run at corpus scale with NO udf
    and NO model runtime.

    Tokens hash into ``n_buckets`` features (MD5 hashing trick — no
    vocabulary table to build, ship, or OOV-miss), term frequencies
    join the (feature, w_scaled BIGINT) weight table — bucket-count
    rows, AQE broadcasts it — and the logit is the exact integer
    Σ tf·w, so scores and verdicts are bit-identical across engines
    and partitionings. Sign thresholding (logit > 0) classifies;
    production calibration happens in weight training, not here.

    Scale shape: tokenize/hash are map stages; one (doc, feature)
    keyed agg with map-side partials; one bucket-keyed join; one doc
    keyed agg. Returns (id, n_tokens, logit_scaled, is_positive).
    """
    # Spread before the per-token md5 work (the dedup-family _spread,
    # conditional): a single parquet split otherwise serializes all
    # hashing into one task (measured 0.7 s single-core at sf0.1); an
    # already-parallel scan passes through untouched.
    from .dedup import _spread

    toks = _spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(
                F.split(F.trim(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    feat = toks.select(
        "_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}:"), F.col("tok"))), 1, 4
                ),
                16,
                10,
            ).cast("int")
            % n_buckets
        ).alias("feature"),
    )
    tf = feat.groupBy("_id", "feature").agg(
        F.count("*").cast("long").alias("tf")
    )
    return (
        tf.join(weights, "feature", "left")  # unweighted feature = 0,
        # so sparse trained-weight tables never silently drop documents
        .groupBy("_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.coalesce(F.col("w_scaled"), F.lit(0)))
            .cast("long")
            .alias("logit_scaled"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            "logit_scaled",
            (F.col("logit_scaled") > 0).alias("is_positive"),
        )
    )


def conformal_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "label",
    alphas: tuple[tuple[int, int], ...] = ((1, 20), (1, 10), (1, 5)),
    split_salt: str = "conf",
) -> DataFrame:
    """Split-conformal gating thresholds for a classifier score, with
    empirical test-split coverage — the distribution-free guarantee a
    corpus-filtering team wants before gating on a score: "keep docs
    with score >= t" retains at least (1 − alpha) of true positives in
    expectation, no matter how miscalibrated the scorer is.

    Standard split conformal on the POSITIVE-labeled rows: an md5
    parity of ``id_col`` (salted — the leakage-safe-split idiom) cuts
    them into calibration/test halves; for each miscoverage level
    alpha = num/den the threshold is the k-th smallest calibration
    score with k = max(1, floor(alpha·(n_cal + 1))) — EXACT integer
    arithmetic ((num·(n_cal+1)) div den on non-negative operands, the
    engine-portable floor) — and the test half reports how many
    positives the gate keeps. Scores may be any double computed
    identically in both engines (ties order identically — the AUC
    idiom); alpha and coverage are one IEEE division each.

    Scale shape: the raw rows reduce to VALUE grain (groupBy score)
    before any window, so the rank-selection cumsum runs over the
    reduced value-grain frame (post-aggregate single-partition window
    — the Lorenz pattern); alphas attach by exploding a 3-literal
    array onto the reduced frames and equi-joining the 1-row-derived
    k table on (num, den) — no nested-loop joins anywhere. Returns one
    row per alpha: (alpha, n_cal, cal_rank, threshold, n_test,
    n_covered, coverage); empty when the calibration or test split has
    no positive rows (degenerate input — nothing to calibrate on).
    """
    from pyspark.sql import Window

    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{split_salt}:"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    # pos is two narrow columns per positive row, but its INPUT is the
    # caller's scorer pipeline (tokenize + hash + two keyed aggregates
    # for the conformal entry); cal feeds kf AND calv and tst feeds
    # tstv, so uncached the scorer replays three times (measured at
    # sf0.1: 6 parquet scans / ~17 exchanges in one plan). Cache the
    # reduced frame once — eviction merely recomputes. (Cache lifetime
    # is session-scoped by contract — see bm25_topk's note in text.py.)
    pos = df.filter(F.col(label_col)).select(
        F.col(score_col).alias("score"), (bucket == 0).alias("_is_cal")
    ).cache()
    cal = pos.filter(F.col("_is_cal"))
    tst = pos.filter(~F.col("_is_cal"))

    alpha_arr = F.array(
        *[
            F.struct(
                F.lit(num).alias("num"), F.lit(den).alias("den")
            )
            for num, den in alphas
        ]
    )
    kf = (
        cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
        .select("n_cal", F.explode(alpha_arr).alias("a"))
        .select(
            F.col("a.num").alias("num"),
            F.col("a.den").alias("den"),
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("(num * (n_cal + 1)) div den"),
            ).alias("k"),
            "n_cal",
        )
    )

    calv = cal.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = calv.select(
        "score", F.sum("cnt").over(w).cast("long").alias("cum")
    ).select(
        "score", "cum", F.explode(alpha_arr).alias("a")
    ).select(
        "score", "cum",
        F.col("a.num").alias("num"), F.col("a.den").alias("den"),
    )
    th = (
        cum.join(kf, ["num", "den"])
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("num", "den", "k", "n_cal")
        .agg(F.min("score").alias("threshold"))
    )

    tstv = (
        tst.groupBy("score")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "score", "cnt", F.explode(alpha_arr).alias("a")
        )
        .select(
            "score", "cnt",
            F.col("a.num").alias("num"), F.col("a.den").alias("den"),
        )
    )
    cov = (
        tstv.join(th, ["num", "den"])
        .groupBy("num", "den", "k", "n_cal", "threshold")
        .agg(
            F.sum("cnt").cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("score") >= F.col("threshold"), F.col("cnt"))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_covered"),
        )
    )
    return cov.select(
        (F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "alpha"
        ),
        "n_cal",
        F.col("k").alias("cal_rank"),
        "threshold",
        "n_test",
        "n_covered",
        F.when(F.col("n_test") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("n_covered").cast("double") / F.col("n_test").cast("double")
        )
        .alias("coverage"),
    )
