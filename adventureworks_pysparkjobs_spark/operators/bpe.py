"""Distributed BPE tokenizer training + encoding (north-star extension:
the tokenizer half of an LLM data pipeline).

Byte-pair encoding training (Sennrich et al., ACL'16; the GPT-2 tokenizer
pipeline) is the canonical ITERATIVE corpus algorithm: each merge rule
depends on the corpus state produced by all previous rules, so it cannot
be one declarative query. The scalable formulation:

1. ONE pass over the corpus pre-aggregates it to a word-frequency table
   (`groupBy(word).count()`). Everything after iterates over the
   VOCABULARY — at 100 TB the corpus is petabytes but the distinct-word
   table is ~10^8 rows, so per-iteration cost is independent of corpus
   size. This is the whole trick; trainers that re-scan raw text per
   merge do not scale.
2. Per iteration (driver loop — the merge LIST is inherently sequential):
   a. weighted adjacent-pair counts: per-row pair expansion over each
      word's current symbol array x word frequency, one groupBy over the
      small vocab table;
   b. deterministic argmax (count desc, then lexicographic pair) via
      TakeOrderedAndProject — a 1-row collect, bounded by contract;
   c. the merge applied to every symbol array as a per-row left-to-right
      `aggregate` fold (greedy, non-overlapping — the reference BPE
      scan) — no shuffle;
   d. `localCheckpoint` truncates the lineage so the plan stays O(1) per
      iteration instead of growing by one fold per merge.
3. Encoding applies the learned rank table with an Arrow-batched
   mapInPandas worker — learned-rule application is dynamic program
   logic over a per-row loop, the one place a vectorized UDF genuinely
   beats Catalyst expressions (a 50-merge expression chain would blow up
   codegen; a broadcast rank dict is a hash probe per pair).

Training is deterministic: pair counts are exact integer sums, ties
break lexicographically, so the merge list is independent of
partitioning and engine (tests pin equality to a pure-Python reference).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# End-of-word sentinel, appended as a standalone symbol so merges can
# learn word-final units ("ing</w>") without crossing word boundaries.
EOW = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """The corpus -> (word, n) frequency table: the single corpus-sized
    shuffle of BPE training (uniform word keys; heavy hitters are fine —
    counts are partially aggregated map-side)."""
    # Spread to full parallelism first (the dedup-family _spread,
    # conditional): a single parquet split otherwise serializes the
    # corpus-sized explode into one task; an already-parallel scan
    # passes through untouched.
    from .dedup import _spread

    w = F.explode(tokens(text_col)).alias("word")
    out = _spread(df).select(w)
    if lowercase:
        out = out.select(F.lower(F.col("word")).alias("word"))
    return out.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the EOW sentinel."""
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), F.lit(0))
    return vocab.select(
        "word",
        "n",
        F.concat(chars, F.array(F.lit(EOW))).alias("syms"),
    )


def _pair_counts(symbolized: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the current symbolization.
    Overlapping occurrences all count (the reference get_stats), each
    weighted by the word's corpus frequency."""
    s = F.col("syms")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.struct(
            F.element_at(s, i).alias("a"),
            F.element_at(s, i + 1).alias("b"),
        ),
    )
    return (
        symbolized.filter(F.size(s) >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _merge_fold(a: str, b: str):
    """Column expression: apply merge (a, b) to a symbol array as a
    greedy left-to-right fold — exactly the reference BPE replacement
    scan (after a merge fires, its output cannot re-merge with the
    following symbol in the same pass)."""
    merged = a + b

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("syms"), F.array().cast("array<string>"), step
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
    lowercase: bool = True,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merge rules from a corpus.

    Returns ``(merges, symbolized_vocab)``: the ordered rule list
    ``[(left, right, pair_count), ...]`` (the tokenizer artifact — tiny
    and inherently driver-side, each iteration's argmax is a 1-row
    collect) and the final ``(word, n, syms)`` vocabulary frame.
    Training stops early when no remaining pair reaches ``min_count``.
    """
    # localCheckpoint still truncates lineage (one fold per plan, codegen
    # never sees nested folds), but eager=False folds the checkpoint's
    # materialization INTO the next iteration's pair-count job instead of
    # running a separate per-merge materialization job: one job per merge
    # instead of two, identical merge list (the argmax reads the same
    # materialized symbolization either way).
    sym = _init_symbols(word_counts(df, text_col, lowercase=lowercase))
    sym = sym.localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(sym)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        sym = sym.select(
            "word", "n", _merge_fold(a, b).alias("syms")
        ).localCheckpoint(eager=False)
    return merges, sym


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned rule list as a rank-ordered DataFrame artifact."""
    return spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Encode documents with a learned merge list: (id, bpe_ids-free
    symbol tokens). Greedy lowest-rank-first application per word — the
    reference BPE encode loop — over Arrow batches via mapInPandas; the
    rank dict ships once per task in the closure, and each batch is
    encoded with a per-word memo cache (Zipf makes the cache hit rate
    enormous).
    """
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out_schema = f"{id_col} long, toks array<string>"

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            # replace ALL non-overlapping occurrences of the best pair,
            # left to right (reference behavior)
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    def run(batches: Iterator) -> Iterator:
        memo: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf["text"]:
                words = (text or "").split()
                if lowercase:
                    words = [w.lower() for w in words]
                enc: list[str] = []
                for w in words:
                    enc.extend(encode_word(w, memo))
                toks.append(enc)
            pdf = pdf[[id_col]].copy()
            pdf["toks"] = toks
            yield pdf

    src = df.select(id_col, F.col(text_col).alias("text"))
    return src.mapInPandas(run, schema=out_schema)
