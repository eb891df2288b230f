"""Text-analysis operators for the documents table (north-star extension,
SURVEY.md §2.10: language-ID, quality scoring, token counting, document
fingerprinting).

Everything is built from Catalyst higher-order array functions + hash
functions — JVM-side, whole-stage-codegen'd, no Python UDFs — so the same
code runs unchanged over 100 TB of documents: per-row work only, no
shuffles except where an operator aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker tokens per language for the heuristic language-ID scorer. A real
# deployment would broadcast a large lexicon table; the mechanism (token
# overlap scoring + deterministic argmax) is the operator under test.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "y", "los", "de"],
    "de": ["der", "die", "und", "das", "ein"],
}

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "on"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization with empty-token filtering."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != F.lit(""))


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, lookahead-free so it runs identically
# under Java regex (Spark) and RE2 (DuckDB): contractions, space-prefixed
# letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'[sdmt]|'ll|'ve|'re| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_tokens(col: str | Column) -> Column:
    """BPE-ish pre-tokenization (the unit LLM token budgets count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0))


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings (empty array if the
    document has fewer than n tokens)."""
    t = tokens(col)
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    return F.when(
        F.size(t) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: char/token counts, mean token length,
    punctuation & digit density, stopword ratio, distinct-token ratio.

    All ratios are integer-count / integer-count double divisions —
    deterministic and engine-independent.
    """
    t = tokens(text_col)
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = F.size(t)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    n_distinct = F.size(F.array_distinct(t))
    return df.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        (
            (n_chars - F.length(F.regexp_replace(c, r"\s", ""))).cast("int")
        ).alias("n_whitespace"),
        (F.length(F.regexp_replace(c, r"\s", "")).cast("double") / n_tokens).alias(
            "mean_token_len"
        ),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_digit.cast("double") / n_chars).alias("digit_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
    )


def repetition_cols(text_col: str | Column) -> list[Column]:
    """Gopher/MassiveText-style within-document repetition signals —
    the filters that catch boilerplate and degenerate generations:

    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over all bigram slots (Gopher rejects > 0.18);
    - ``dup_trigram_frac``: fraction of trigram slots occupied by a
      trigram that already occurred (Gopher's duplicate-n-gram family).

    Both are per-row Catalyst array expressions (counts of exact string
    matches — no floats until the final division), NULL when the
    document is too short to have any n-gram of that order.
    """
    bg = shingles(text_col, 2)
    tg = shingles(text_col, 3)
    top_bg = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda d: F.size(F.filter(bg, lambda x: x == d)),
        )
    )
    return [
        F.when(F.size(bg) > 0, top_bg.cast("double") / F.size(bg))
        .otherwise(F.lit(None).cast("double"))
        .alias("top_bigram_frac"),
        F.when(
            F.size(tg) > 0,
            (F.size(tg) - F.size(F.array_distinct(tg))).cast("double")
            / F.size(tg),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("dup_trigram_frac"),
    ]


def language_scores(text_col: str | Column) -> list[Column]:
    """One score column per candidate language: count of *distinct* marker
    tokens present in the document."""
    t = tokens(text_col)
    out = []
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(
            F.array_intersect(
                F.array_distinct(t), F.array(*[F.lit(m) for m in markers])
            )
        )
        out.append(hits.cast("int").alias(f"score_{lang}"))
    return out


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: marker-token overlap scoring, argmax with a
    deterministic alphabetical tie-break, 'und' (undetermined) when no
    marker hits at all."""
    scored = df.select("doc_id", F.col(text_col), *language_scores(text_col))
    langs = sorted(LANG_MARKERS)  # alphabetical tie-break order
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier alphabetical wins ties
        pred = F.when(
            (best > 0) & (F.col(f"score_{lg}") == best), F.lit(lg)
        ).otherwise(pred)
    return scored.select(
        "doc_id", *[f"score_{lg}" for lg in langs], pred.alias("predicted_lang")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash
    every character ``k``-gram, then keep the minimum hash of each sliding
    ``window`` of consecutive k-gram hashes. The selected set is the
    document's fingerprint — two documents sharing any sufficiently long
    run of text are guaranteed to share a selected hash, which is what
    plagiarism/near-dup detectors index.

    The k-gram hashes use md5 (engine-portable; hex strings of equal
    length order like their numeric value), and the winnow min is an
    order-free array reduction — everything is a per-row Catalyst
    expression: zero shuffles until the caller aggregates/joins the
    fingerprint sets. Output: (doc_id, fingerprints array<string>,
    n_fingerprints) with fingerprints sorted + deduped.
    """
    df2 = df.select("doc_id", _winnow_grams(F.col(text_col), k).alias("_g"))
    fp = _winnow_fp(F.col("_g"), window)
    return df2.select(
        "doc_id",
        fp.alias("fingerprints"),
        F.size(fp).cast("int").alias("n_fingerprints"),
    )


def _winnow_grams(c, k: int):
    """hashes[i] = md5(substr(text, i, k)), for i in 1 .. len-k+1."""
    n = F.length(c)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.md5(F.substr(c, i, F.lit(k))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _winnow_fp(g, window: int):
    """Windows of `window` consecutive k-gram hashes -> min each ->
    distinct, sorted: the winnowing fingerprint set."""
    mins = F.when(
        F.size(g) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(g) - (window - 1)),
            lambda i: F.array_min(F.slice(g, i, window)),
        ),
    ).otherwise(g)
    return F.array_sort(F.array_distinct(mins))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the unit of
    work for embedding/training pipelines (context-window packing).

    Chunk ``i`` starts at token ``1 + i*(chunk_tokens - overlap)``; every
    chunk is full-length except possibly the last, and a chunk is emitted
    only if it extends past the previous one, so each token appears in at
    least one chunk and the token stream is reconstructible by dropping
    the first ``overlap`` tokens of every chunk after the first.

    Scale shape: chunk boundaries, ids, and texts are built per-row inside
    one Catalyst projection (sequence → transform → slice/array_join), and
    only then exploded — each output row carries just its own chunk text,
    so memory per input row stays O(doc length), not O(chunks × doc
    length). Zero shuffles, zero Python.

    Output: (id_col, chunk_id, start_token, chunk_text, n_chunk_tokens
    [, *carry_cols]). ``carry_cols`` names per-document columns to carry
    through the explode unchanged (appended AFTER the chunk fields) —
    a caller that needs document attributes on chunk rows then pays no
    doc-grain join back onto the exploded frame.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = tokens(text_col)
    n = F.size(t)
    last_start = F.when(n > chunk_tokens, n - chunk_tokens + stride).otherwise(
        F.lit(1)
    )
    starts = F.when(
        n > 0, F.sequence(F.lit(1), last_start, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - F.lit(1)) / F.lit(stride)).cast("int").alias("chunk_id"),
            s.cast("int").alias("start_token"),
            F.array_join(F.slice(t, s, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s + 1)
            .cast("int")
            .alias("n_chunk_tokens"),
        ),
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(chunks).alias("_c"),
    ).select(id_col, "_c.*", *carry_cols)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full per-document text-feature frame in ONE narrow plan:
    quality metrics + language-ID scores/argmax + fingerprints (content
    hash, 1-hash MinHash, winnowing summary) + BPE token count. No joins —
    every column is a per-row expression over the same scan, so at 100 TB
    this is a single pass over the corpus (the composed-operator version
    would re-read it five times or shuffle-join five frames). The winnow
    gram/fingerprint arrays are bound as named intermediates so codegen
    computes each once per row, then projects them away."""
    c = F.col(text_col)
    t = tokens(text_col)
    n_chars = F.length(c)
    n_tokens = F.size(t)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    n_stop = F.size(F.filter(t, lambda x: x.isin(STOPWORDS)))
    n_distinct = F.size(F.array_distinct(t))
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " "
    )
    staged = df.withColumn("_wg", _winnow_grams(c, 8)).withColumn(
        "_wfp", _winnow_fp(F.col("_wg"), 4)
    ).select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        (
            (n_chars - F.length(F.regexp_replace(c, r"\s", ""))).cast("int")
        ).alias("n_whitespace"),
        (F.length(F.regexp_replace(c, r"\s", "")).cast("double") / n_tokens).alias(
            "mean_token_len"
        ),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_digit.cast("double") / n_chars).alias("digit_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_tokens).alias("distinct_ratio"),
        *repetition_cols(text_col),
        *language_scores(text_col),
        F.sha2(F.trim(normalized), 256).alias("content_sha256"),
        F.array_min(
            F.transform(shingles(c, 3), lambda s: F.md5(s))
        ).alias("min_shingle_hash"),
        F.array_min(F.col("_wfp")).alias("min_winnow_fp"),
        F.size(F.col("_wfp")).cast("int").alias("n_winnow_fp"),
        F.size(bpe_tokens(text_col)).cast("int").alias("n_bpe_tokens"),
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier alphabetical wins ties
        pred = F.when(
            (best > 0) & (F.col(f"score_{lg}") == best), F.lit(lg)
        ).otherwise(pred)
    return staged.withColumn("predicted_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    - ``content_sha256``: hash of punctuation/case/whitespace-normalized
      text (robust exact-dup key);
    - ``min_shingle_hash``: minimum MD5 over 3-gram shingles — a 1-hash
      MinHash, the winnowing-style compact sketch (equal across docs with
      high shingle overlap with probability ~ their Jaccard similarity).
    """
    c = F.col(text_col)
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", " "), r"\s+", " "
    )
    return df.select(
        "doc_id",
        F.sha2(F.trim(normalized), 256).alias("content_sha256"),
        F.array_min(
            F.transform(shingles(c, 3), lambda s: F.md5(s))
        ).alias("min_shingle_hash"),
    )


# --- Line-level cleaning + PII redaction (C4 / RefinedWeb style) -------
#
# The C4 pipeline (Raffel et al., JMLR'20 §2.2) filters at LINE
# granularity before any document-level dedup: keep only lines that look
# like prose (enough words, terminal punctuation), drop boilerplate
# markers and code-ish lines. RefinedWeb/CCNet add PII scrubbing of the
# survivors. Everything here is per-row Catalyst expressions — split,
# higher-order filter, regexp_replace — so the cleaner runs inside
# whole-stage codegen with zero shuffles and composes with the rest of
# the curation pipeline (dedup_spans handles the cross-document half of
# C4's rules).

# Redaction order matters: URLs first, so an email-shaped userinfo inside
# a URL disappears with the URL instead of leaving a half-redacted tail.
# Patterns are lookahead-free and POSIX-class based so Java regex (Spark)
# and RE2 (DuckDB) agree byte-for-byte.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "url": (r"https?://[^\s]+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
}

# Substring markers whose presence disqualifies a line (C4 §2.2 list,
# lowercased containment).
BOILERPLATE_MARKERS: tuple[str, ...] = (
    "lorem ipsum",
    "javascript",
    "cookie policy",
    "privacy policy",
    "terms of use",
)

TERMINAL_PUNCT = r'[.!?"]$'


def redact_pii(
    col: str | Column, kinds: tuple[str, ...] = ("url", "email", "ipv4")
) -> Column:
    """Replace each PII occurrence with its typed placeholder token.

    One chained regexp_replace per kind — per-row, JVM-side; at 100 TB
    this adds no shuffle and no Python."""
    c = F.col(col) if isinstance(col, str) else col
    for k in kinds:
        pat, repl = PII_PATTERNS[k]
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(
    col: str | Column, kinds: tuple[str, ...] = ("url", "email", "ipv4")
) -> list[Column]:
    """Audit columns: how many occurrences of each PII kind the ORIGINAL
    text contains (counted before redaction, one ``n_<kind>`` per kind)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(PII_PATTERNS[k][0])).cast("int").alias(f"n_{k}")
        for k in kinds
    ]


def clean_lines(
    col: str | Column,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    markers: tuple[str, ...] = BOILERPLATE_MARKERS,
    drop_curly: bool = True,
) -> Column:
    """Array of the lines of ``col`` that pass the C4 prose filters:

    - at least ``min_words`` whitespace-separated words;
    - (optional) trimmed line ends in terminal punctuation ``. ! ? "``;
    - contains none of the lowercased ``markers`` substrings;
    - (optional) contains no ``{`` — C4's cheap code/JS detector.

    Kept lines preserve document order and their original (untrimmed)
    text; reassembly is lossless for the survivors.
    """
    c = F.col(col) if isinstance(col, str) else col

    def keep(line: Column) -> Column:
        t = F.trim(line)
        n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != F.lit("")))
        cond = n_words >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & t.rlike(TERMINAL_PUNCT)
        low = F.lower(line)
        for m in markers:
            cond = cond & ~low.contains(m)
        if drop_curly:
            cond = cond & ~line.contains("{")
        return cond

    return F.filter(F.split(c, "\n"), keep)


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    markers: tuple[str, ...] = BOILERPLATE_MARKERS,
    drop_curly: bool = True,
    pii_kinds: tuple[str, ...] = ("url", "email", "ipv4"),
) -> DataFrame:
    """C4-style line cleaning + PII redaction in one per-row pass.

    Output per document: ``n_lines`` / ``n_kept_lines`` (the filter's
    audit trail), ``clean_text`` (surviving lines re-joined with
    ``\\n``, PII redacted), and one ``n_<kind>`` count per PII kind
    measured on the ORIGINAL text (so redaction stats survive the
    redaction itself). The kept-lines array is bound once via withColumn
    staging — CollapseProject would otherwise inline and re-evaluate the
    higher-order filter for each consumer."""
    c = F.col(text_col)
    kept = clean_lines(
        c,
        min_words=min_words,
        require_terminal_punct=require_terminal_punct,
        markers=markers,
        drop_curly=drop_curly,
    )
    return df.withColumn("_kept", kept).select(
        id_col,
        F.size(F.split(c, "\n")).cast("int").alias("n_lines"),
        F.size("_kept").cast("int").alias("n_kept_lines"),
        redact_pii(F.array_join("_kept", "\n"), pii_kinds).alias("clean_text"),
        *pii_counts(c, pii_kinds),
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 10_000,
    max_postings: int = 100,
) -> DataFrame:
    """Build a token -> posting-list search index over the corpus: one
    row per surviving token with its document frequency and the first
    ``max_postings`` doc ids in sorted order (CSV string — the compact,
    engine-portable export shape).

    Scale shape: document frequency is computed FIRST (count-only
    groupBy, map-side combinable) and tokens outside [min_df, max_df]
    are dropped by a join BEFORE any posting list materializes — a stop
    token's million-document posting list is never collected anywhere
    (the classic inverted-index hotspot; max_df is the standard
    stop-token cut). Two shuffles on the uniform token key: the df
    count, then collect_list over surviving tokens only. Per-doc
    ``array_distinct`` happens row-side before the explode, so a
    token's in-document repetitions never reach a shuffle."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    df_tbl = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq").between(min_df, max_df))
    )
    return (
        tok.join(df_tbl, "token")
        .groupBy("token", "doc_freq")
        .agg(
            F.concat_ws(
                ",",
                F.slice(
                    F.sort_array(F.collect_list(id_col)), 1, max_postings
                ),
            ).alias("postings_csv")
        )
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` bigram collocations by PMI — the phrase-mining
    pass (NPMI/PMI over corpus bigrams) used to build tokenizer merge
    seeds and stop-phrase lists.

    PMI = ln( n_ab·N / (n_a·n_b) ); since ln is monotone, the RANKING
    only needs the ratio — computed as ONE IEEE division of exact
    integer products, so scores and order are engine-identical (no
    libm ln in the oracle-checked surface; callers wanting the log
    take it themselves). ``min_count`` keeps the long tail of
    1-occurrence bigrams from dominating (standard practice and the
    quadratic-blowup guard).

    Scale shape: tokenization and bigram construction are per-row
    array expressions; one shuffle each for bigram and unigram counts
    (both map-side combined, uniform keys); two vocabulary-sized
    joins (AQE's call); final top-k via TakeOrderedAndProject.
    Emits (w1, w2, n_ab, n_a, n_b, pmi_ratio) with N folded in.
    """
    t = F.transform(tokens(text_col), lambda x: F.lower(x))
    toks = df.select(t.alias("t"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = toks.select(F.explode("t").alias("w"))
    n_total = uni.groupBy().agg(F.count("*").alias("n_words"))
    uni_counts = uni.groupBy("w").agg(F.count("*").alias("n_w"))
    bg_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    u1 = uni_counts.select(
        F.col("w").alias("w1"), F.col("n_w").alias("n_a")
    )
    u2 = uni_counts.select(
        F.col("w").alias("w2"), F.col("n_w").alias("n_b")
    )
    ratio = (F.col("n_ab").cast("double") * F.col("n_words")) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    return (
        bg_counts.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(n_total))  # 1-row total
        .select("w1", "w2", "n_ab", "n_a", "n_b", ratio.alias("pmi_ratio"))
        .orderBy(
            F.col("pmi_ratio").desc(), F.col("w1"), F.col("w2")
        )
        .limit(top_k)
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval scoring: top-k documents for a bag-of-terms query under
    a BM25-shaped rational score — the query-time counterpart of the
    inverted index (queries/corpus_extra.py:corpus_inverted_index).

    Per (doc, term): ``tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`` times
    a RATIONAL idf ``(N−df+0.5)/(df+0.5)`` — i.e. BM25 with the log
    around the idf dropped (k1=1.2, b=0.75). The log is monotone, so
    per-term score ORDER is preserved exactly; dropping it keeps every
    value a closed-form rational expression over exact integer counts
    (tf, df, dl, N, Σdl), bit-identical across engines, where ln() is
    not guaranteed correctly rounded. Multi-term totals add per-term
    columns in the fixed query order (no data-dependent float
    summation).

    Scale: tf is one filtered aggregate over the exploded token stream
    (terms pushed as an IN filter before the shuffle); df and the
    corpus totals are bounded frames AQE broadcasts; top-k is
    sort+limit (TakeOrderedAndProject — never a global window).
    Returns (id, bm25) for the k best, score-descending membership
    tie-broken on the id.
    """
    if not terms:
        raise ValueError("bm25_topk: need at least one query term")
    from .dedup import _spread

    # toks feeds FOUR consumers (stats, tot, tf, and dfreq through tf);
    # uncached the corpus tokenize replays per consumer — and on a
    # single-split corpus each replay is one task (conditional _spread
    # parallelizes it; an already-parallel scan passes through). The
    # shingle_arrays argument: tokenize exactly once per pipeline.
    # Lifetime: the operator returns a lazy frame, so it cannot
    # unpersist after "the" action — the cache lives until the caller's
    # session clears it (the engine contract: one query per
    # action; bench.py clears session state between queries). Spark
    # evicts MEMORY_AND_DISK blocks under pressure, so a long-lived
    # session degrades to recompute, never to an OOM.
    toks = _spread(docs).select(
        F.col(id_col), tokens(text_col).alias("_w")
    ).cache()
    stats = toks.select(id_col, F.size("_w").cast("long").alias("dl"))
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("_w")).cast("long").alias("total_len"),
    )
    tf = (
        toks.select(id_col, F.explode("_w").alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    dbl = lambda c: c.cast("double")
    sc = (
        (dbl(F.col("tf")) * F.lit(2.2))
        / (
            dbl(F.col("tf"))
            + F.lit(1.2)
            * (
                F.lit(0.25)
                + F.lit(0.75)
                * (
                    dbl(F.col("dl") * F.col("n_docs"))
                    / dbl(F.col("total_len"))
                )
            )
        )
    ) * (
        (dbl(F.col("n_docs") - F.col("df")) + F.lit(0.5))
        / (dbl(F.col("df")) + F.lit(0.5))
    )
    scored = (
        tf.join(stats, id_col)
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(tot))  # 1-row totals frame
        .select(id_col, "token", sc.alias("sc"))
    )
    piv = scored.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("token") == t, F.col("sc"))),
                F.lit(0.0),
            ).alias(f"_s{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.col("_s0")
    for i in range(1, len(terms)):
        total = total + F.col(f"_s{i}")
    return (
        piv.select(id_col, total.alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def dup_ngram_stats(
    df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Corpus-level duplicate-n-gram exposure — the memorization-risk
    metric of the deduplicating-training-data line of work: what
    fraction of all n-gram SLOTS (occurrences, repeats included) is
    occupied by an n-gram that occurs at least twice in the corpus. A
    corpus can pass document-level dedup and still be saturated with
    repeated boilerplate spans; this is the scalar that says so.

    Scale shape: one corpus scan exploding non-distinct n-grams, one
    keyed aggregate per distinct n-gram (map-side partial combine — the
    shuffle carries (gram, count) partials), then a 1-row global
    aggregate over vocabulary-grain rows. All counts exact longs; the
    fraction is ONE IEEE division.

    Returns one row: (n_slots, n_distinct, dup_slots, dup_grams,
    dup_slot_fraction).
    """
    grams = df.select(
        F.explode(shingles(text_col, n)).alias("g")
    )
    per_gram = grams.groupBy("g").agg(
        F.count("*").cast("long").alias("c")
    )
    return per_gram.agg(
        F.sum("c").cast("long").alias("n_slots"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_slots"),
        F.count_if(F.col("c") >= 2).cast("long").alias("dup_grams"),
    ).select(
        "n_slots",
        "n_distinct",
        "dup_slots",
        "dup_grams",
        (
            F.col("dup_slots").cast("double")
            / F.col("n_slots").cast("double")
        ).alias("dup_slot_fraction"),
    )


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document, with
    the classic vowel-group syllable approximation: a syllable is one
    maximal ``[aeiouy]+`` run in the lowercased text (whitespace breaks
    runs, so the corpus-wide count equals the per-word sum without
    tokenizing twice), a sentence is one ``[.!?]+`` terminal run
    (floored at 1 — a fragment is read as one sentence, and the
    formulas stay defined on punctuation-free text).

    Everything is per-row JVM regex counting — no shuffle at all, the
    scan IS the cost — and each score is a fixed IEEE expression tree
    over exact integer counts (two divisions, fixed-order multiplies /
    subtractions, string-parse-stable constants), so values are
    bit-identical across engines.

    Returns (id, n_words, n_sentences, n_syllables,
    flesch_reading_ease DOUBLE, fk_grade DOUBLE).
    """
    t = F.col(text_col)
    n_words = token_count(text_col).cast("long")
    n_sent = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")).cast("long"), F.lit(1)
    )
    n_syl = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    out = df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast(
        "double"
    )
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast(
        "double"
    )
    fre = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    fkg = (
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    )
    return out.select(
        "id", "n_words", "n_sentences", "n_syllables",
        fre.alias("flesch_reading_ease"),
        fkg.alias("fk_grade"),
    )


def vocab_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between corpus slices (sources,
    languages, shards): for every slice pair, the distinct-term
    intersection, union, Jaccard, and both containment directions —
    the mixture-diversity check run before blending sources into a
    training corpus (two sources with near-identical vocabularies add
    volume, not coverage).

    Scale shape: the corpus reduces to the distinct (slice, term)
    posting set FIRST (one keyed exchange, partial-aggregable); the
    pair intersection is a term-keyed self equi-join of that
    vocabulary-grain frame (bounded by Σ per-term slice-pair counts —
    slices are few by construction); per-slice sizes join back at
    slice grain. Jaccard/containment are ONE division each of exact
    longs (union = |A| + |B| − |A∩B|, never a second scan).

    Returns (group_a, group_b, vocab_a, vocab_b, n_common, jaccard,
    containment_a_in_b, containment_b_in_a) with group_a < group_b.
    """
    terms = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(text_col)).alias("term"),
    ).distinct()
    sizes = terms.groupBy("grp").agg(
        F.count("*").cast("long").alias("vocab")
    )
    a = terms.select(F.col("grp").alias("group_a"), "term")
    b = terms.select(F.col("grp").alias("group_b"), "term")
    common = (
        a.join(b, "term")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(
        F.col("grp").alias("group_a"), F.col("vocab").alias("vocab_a")
    )
    sb = sizes.select(
        F.col("grp").alias("group_b"), F.col("vocab").alias("vocab_b")
    )
    union = F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
    return (
        common.join(sa, "group_a")
        .join(sb, "group_b")
        .select(
            "group_a", "group_b", "vocab_a", "vocab_b", "n_common",
            (F.col("n_common").cast("double") / union.cast("double"))
            .alias("jaccard"),
            (
                F.col("n_common").cast("double")
                / F.col("vocab_a").cast("double")
            ).alias("containment_a_in_b"),
            (
                F.col("n_common").cast("double")
                / F.col("vocab_b").cast("double")
            ).alias("containment_b_in_a"),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Per-document keyword extraction: the ``top_k`` terms by
    rational tf-idf score tf·N/df — the log-free monotone transform of
    classic tf-idf (log is monotone in df, so the per-document RANKING
    of terms is close to the textbook score while every value stays an
    engine-portable closed form; the same trade the BM25 operator
    makes). The per-doc keyword list is the lightweight topic signal a
    corpus browser or dedup-explainer shows next to each document.

    Exactness: tf, df, N are exact BIGINTs; the score is ONE IEEE
    division of the exact product tf·N (cast long — tf ≤ doc length,
    N ≤ corpus docs, product < 2⁶³ through ~10¹⁰-doc corpora with
    ~10⁶-token docs would overflow, so it is carried as DECIMAL(38,0)
    and rendered via the portable string cast); ranking ties break on
    the term string — a total order, so row_number is deterministic.

    Scale shape: one (doc, term) keyed agg; one term-grain df agg
    (AQE sizes the join back); the doc-count rider attaches via a
    window sum over the REDUCED term-grain df frame — no 1-row cross
    join; the final ranking is a doc-keyed window (uniform key).
    Returns (id, rank INT, term, tf BIGINT, df BIGINT, tfidf DOUBLE).
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(text_col)).alias("t"),
        )
        .select("id", F.lower(F.col("t")).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    # N = docs with at least one token (doc grain, double-reduced)
    n_frame = (
        tf.groupBy("id")
        .agg(F.lit(1).alias("_one"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    dfn = dft.join(F.broadcast(n_frame))  # 1-row, aggregate-reduced
    d38 = "decimal(38,0)"
    score = (
        (F.col("tf").cast(d38) * F.col("n").cast(d38))
        .cast("string")
        .cast("double")
        / F.col("df").cast("double")
    )
    scored = tf.join(dfn, "term").select(
        "id", "term", "tf", "df", score.alias("tfidf")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.select(
            "id", F.row_number().over(w).alias("rank"),
            "term", "tf", "df", "tfidf",
        )
        .filter(F.col("rank") <= top_k)
        .withColumnRenamed("id", id_col)
    )


def rrf_fusion(
    docs: DataFrame,
    terms: list[str],
    k_each: int = 20,
    k_final: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings for a
    bag-of-terms query: the log-free BM25 ranking (``bm25_topk``) and
    the raw term-frequency ranking — the standard "combine lexical
    rankers without score calibration" move (RRF: score =
    Σ 1/(rrf_k + rank), Cormack et al.'s robust default k=60). A doc
    absent from one ranking contributes 0 for that term, the classic
    RRF convention.

    Exactness: ranks are deterministic row_numbers over (score DESC,
    id) total orders on the two LIMITed candidate frames; each
    reciprocal is ONE division of exact ints cast to double, and the
    fused score adds the two reciprocals in fixed order — a complete
    IEEE tree identical cross-engine. Final top-``k_final`` under
    (rrf DESC, id).

    Scale shape: both rankings end in TakeOrderedAndProject (k_each
    rows); the ranking windows and the full-outer fuse join run on
    those k_each-row frames only — driver-weightless regardless of
    corpus size. Returns (id, rank_bm25 INT, rank_tf INT,
    rrf_score DOUBLE).
    """
    from pyspark.sql import Window

    a = bm25_topk(docs, terms, k=k_each, id_col=id_col, text_col=text_col)
    wa = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    ranked_a = a.select(
        F.col(id_col).alias("id"), F.row_number().over(wa).alias("rank_bm25")
    )
    tf_sum = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t"))
        .filter(F.col("t").isin(list(terms)))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tf"))
    )
    b = tf_sum.orderBy(F.col("n_tf").desc(), "id").limit(k_each)
    wb = Window.orderBy(F.col("n_tf").desc(), "id")
    ranked_b = b.select(
        "id", F.row_number().over(wb).alias("rank_tf")
    )
    inv = lambda r: (  # noqa: E731 - one reciprocal, fixed tree
        F.lit(1.0) / (F.lit(rrf_k) + F.col(r)).cast("double")
    )
    fused = ranked_a.join(ranked_b, "id", "full").select(
        "id", "rank_bm25", "rank_tf",
        (
            F.coalesce(inv("rank_bm25"), F.lit(0.0))
            + F.coalesce(inv("rank_tf"), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return (
        fused.orderBy(F.col("rrf_score").desc(), "id")
        .limit(k_final)
        .withColumnRenamed("id", id_col)
    )


# AFINN-style valence lexicon (small embedded sample; a production
# deployment would broadcast-join a full lexicon TABLE — the per-row
# map-fold mechanism below is the operator under test and is the right
# shape for any contract-bounded lexicon).
SENTIMENT_LEXICON: dict[str, int] = {
    "good": 2, "great": 3, "excellent": 3, "amazing": 4, "love": 3,
    "happy": 3, "best": 3, "wonderful": 4, "fantastic": 4, "nice": 2,
    "win": 2, "better": 2, "success": 2, "positive": 2, "perfect": 3,
    "improved": 2, "strong": 2, "easy": 1, "fast": 1, "helpful": 2,
    "bad": -3, "terrible": -3, "awful": -3, "hate": -3, "worst": -3,
    "sad": -2, "poor": -2, "fail": -2, "failure": -2, "negative": -2,
    "broken": -2, "slow": -1, "hard": -1, "problem": -2, "error": -2,
    "wrong": -2, "worse": -3, "weak": -2, "angry": -3, "horrible": -3,
}


def sentiment_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lexicon: dict[str, int] | None = None,
) -> DataFrame:
    """Lexicon-based sentiment scoring (the AFINN pattern): per
    document, the sum of valence weights of its matched tokens, the
    match count, and a sign label — the classic pre-LLM sentiment
    baseline, and at corpus scale still the cheapest first-pass
    filter/feature.

    Tokens normalize to lowercase alphabetic cores
    (``regexp_replace(lower(t), '[^a-z]', '')``) before lookup, so
    "Great!" matches "great". The whole computation is a PER-ROW fold
    over a literal map (``element_at`` + ``aggregate``) — zero
    shuffles, zero joins, whole-stage-codegen JVM expressions; the
    lexicon is bounded by contract (swap in a broadcast join for an
    unbounded one). Integer score sums are exact in any engine.

    Returns (id, n_matched, sentiment_score, sentiment_label).
    """
    lex = SENTIMENT_LEXICON if lexicon is None else lexicon
    pairs: list[Column] = []
    for k, v in sorted(lex.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(int(v)))
    lex_map = F.create_map(*pairs)
    norm = F.transform(
        tokens(text_col),
        lambda t: F.regexp_replace(F.lower(t), "[^a-z]", ""),
    )
    weights = F.transform(
        norm, lambda t: F.coalesce(F.element_at(lex_map, t), F.lit(0))
    )
    hits = F.transform(
        norm,
        lambda t: F.when(
            F.element_at(lex_map, t).isNotNull(), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    score = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    matched = F.aggregate(
        hits, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return df.select(
        F.col(id_col),
        matched.alias("n_matched"),
        score.alias("sentiment_score"),
        F.when(score > 0, F.lit("positive"))
        .when(score < 0, F.lit("negative"))
        .otherwise(F.lit("neutral"))
        .alias("sentiment_label"),
    )


def script_mix(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Unicode-script composition per group: the share of Latin, CJK,
    Cyrillic and digit characters in each language's text mass — the
    multilingual-corpus audit that catches mislabeled languages and
    transliteration/mojibake contamination where a token-marker
    language-ID cannot (it sees tokens, not scripts).

    Char counting is per-row and shuffle-free: each class count is
    ``length(s) − length(regexp_replace(s, class, ''))`` — two
    character-length evaluations per class, no explode. Class counts
    sum exactly as BIGINTs per group; each share is one IEEE division
    of exact longs. ``other`` (whitespace/punct/uncounted scripts) is
    the integer remainder, so the four shares + other sum to 1 by
    construction.

    Scale shape: one corpus scan reducing to group grain map-side;
    output is one row per group. Returns (group, n_docs, n_chars,
    latin_share, cjk_share, cyrillic_share, digit_share,
    other_share).
    """
    s = F.col(text_col)
    total = F.length(s).cast("long")

    def cnt(pattern: str) -> Column:
        return (
            F.length(s) - F.length(F.regexp_replace(s, pattern, ""))
        ).cast("long")

    classes = {
        "latin": "[A-Za-z]",
        "cjk": "[一-鿿]",
        "cyrillic": "[Ѐ-ӿ]",
        "digit": "[0-9]",
    }
    proj = df.select(
        F.col(group_col).alias("g"),
        total.alias("_n"),
        *[cnt(p).alias(f"_c_{k}") for k, p in classes.items()],
    )
    agg = proj.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_n").cast("long").alias("n_chars"),
        *[
            F.sum(f"_c_{k}").cast("long").alias(f"_s_{k}")
            for k in classes
        ],
    )
    nch = F.col("n_chars")
    out_cols = [F.col("g").alias(group_col), "n_docs", "n_chars"]
    other = nch
    for k in classes:
        share = (
            F.when(nch == 0, F.lit(None).cast("double"))
            .otherwise(F.col(f"_s_{k}").cast("double") / nch.cast("double"))
        )
        out_cols.append(share.alias(f"{k}_share"))
        other = other - F.col(f"_s_{k}")
    out_cols.append(
        F.when(nch == 0, F.lit(None).cast("double"))
        .otherwise(other.cast("double") / nch.cast("double"))
        .alias("other_share")
    )
    return agg.select(*out_cols)


def keyness_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """Distinctive vocabulary per group (corpus-linguistics keyness):
    for each group, the ``top_k`` terms most over-represented vs the
    REST of the corpus, scored by the smoothed rate ratio
    ``(c_g·(N−n_g)) / ((c_rest+1)·n_g)`` — "what words make this
    source sound like itself", the comparative companion to per-doc
    tf-idf (which has no notion of a contrast corpus).

    Log-free by design: the classic log-odds keyness needs ln (not
    correctly rounded, engine-divergent); the rate ratio preserves
    the SAME ranking for fixed smoothing and is one IEEE division of
    exact integer cross-products. Ties break deterministically
    (ratio DESC, term ASC). ``min_count`` floors c_g so one-off typos
    can't top the list; +1 smoothing keeps terms absent from the
    contrast corpus finite and comparable.

    Scale shape: one corpus scan exploding to (group, term) grain
    with map-side partial counts; term totals derive from the SAME
    aggregate by a term-grain window (no second scan); the top-k
    window runs per group over its min_count-filtered vocabulary.
    Returns (group, rank, term, n_in_group, n_rest, rate_ratio).
    """
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.transform(
                tokens(text_col),
                lambda t: F.regexp_replace(F.lower(t), "[^a-z]", ""),
            )
        ).alias("t"),
    ).filter(F.col("t") != "")
    gt = toks.groupBy("g", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c_g")
    )
    wt = Window.partitionBy("t")
    wg = Window.partitionBy("g")
    framed = gt.select(
        "g",
        "t",
        "c_g",
        (F.sum("c_g").over(wt) - F.col("c_g")).cast("long").alias("c_rest"),
        F.sum("c_g").over(wg).cast("long").alias("n_g"),
    )
    wall = Window.partitionBy()
    framed = framed.withColumn(
        "n_total", F.sum("c_g").over(wall).cast("long")
    )
    d38 = "decimal(38,0)"
    num = F.col("c_g").cast(d38) * (
        F.col("n_total") - F.col("n_g")
    ).cast(d38)
    den = (F.col("c_rest") + 1).cast(d38) * F.col("n_g").cast(d38)

    def _dbl(c):
        return c.cast("string").cast("double")

    scored = framed.filter(F.col("c_g") >= int(min_count)).select(
        "g",
        "t",
        "c_g",
        "c_rest",
        (_dbl(num) / _dbl(den)).alias("rate_ratio"),
    )
    wr = Window.partitionBy("g").orderBy(
        F.col("rate_ratio").desc(), F.col("t").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= int(top_k))
        .select(
            F.col("g").alias(group_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("t").alias("term"),
            F.col("c_g").alias("n_in_group"),
            F.col("c_rest").alias("n_rest"),
            "rate_ratio",
        )
    )


def unicode_sanity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Mojibake / encoding-damage audit per group: how much of each
    slice's text is U+FFFD replacement characters (the scar a lossy
    decode leaves), C0 control characters outside whitespace (binary
    bleed-through), or raw non-ASCII — the first gate a web-scale
    scrape runs before any tokenizer sees the bytes.

    Counts via the length-difference idiom (len(text) minus len(text
    with the class removed)) — portable: Spark and DuckDB both count
    regexp_replace over the same RE2-compatible character classes, and
    character (not byte) lengths are used on both sides. All counts
    exact BIGINTs; shares are one division each.

    Scale shape: one per-row JVM expression pass, one group-grain
    aggregation — zero joins, zero windows. Returns (group, n_docs,
    n_chars, n_replacement, n_control, n_non_ascii, docs_with_damage,
    damage_char_share).
    """
    t = F.col(text_col)
    ln = F.length(t)
    n_repl = ln - F.length(F.regexp_replace(t, "�", ""))
    n_ctrl = ln - F.length(
        F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    )
    n_nonascii = ln - F.length(F.regexp_replace(t, "[^\\x00-\\x7f]", ""))
    per = df.select(
        F.col(group_col).alias("grp"),
        ln.alias("_n"),
        n_repl.alias("_r"),
        n_ctrl.alias("_c"),
        n_nonascii.alias("_na"),
    )
    return per.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_n").cast("long").alias("n_chars"),
        F.sum("_r").cast("long").alias("n_replacement"),
        F.sum("_c").cast("long").alias("n_control"),
        F.sum("_na").cast("long").alias("n_non_ascii"),
        F.sum(
            F.when((F.col("_r") > 0) | (F.col("_c") > 0), 1).otherwise(0)
        ).cast("long").alias("docs_with_damage"),
        (
            (F.sum("_r") + F.sum("_c")).cast("double")
            / F.sum("_n").cast("double")
        ).alias("damage_char_share"),
    ).withColumnRenamed("grp", group_col)
