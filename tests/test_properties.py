"""Property-based tests (hypothesis) for operators with subtle semantics:
the generic as-of join and sessionization are checked against brute-force
Python reference implementations on random inputs, and the MinHash-LSH
near-dup output is checked to be a subset of the exact Jaccard output.
"""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import given, settings, strategies as st

from adventureworks_pysparkjobs_spark.operators.asof import asof_join
from adventureworks_pysparkjobs_spark.operators.relational import sessionize

from .conftest import SF_SMOKE

EPOCH = dt.datetime(2024, 1, 1)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # key
        st.integers(min_value=0, max_value=10_000),  # seconds offset
    ),
    min_size=1,
    max_size=25,
)


def _ts(sec: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


@settings(max_examples=8, deadline=None)
@given(left=rows_strategy, right=rows_strategy, strict=st.booleans())
@pytest.mark.slow
def test_asof_join_matches_bruteforce(spark, left, right, strict):
    ldf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(left)],
        "k int, lid int, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, 1000 + i, _ts(s)) for i, (k, s) in enumerate(right)],
        "k int, rid int, ts timestamp",
    )
    out = asof_join(
        ldf, rdf, on="k", left_ts="ts", right_ts="ts",
        right_cols=["rid"], strict=strict,
    )
    got = {r["lid"]: r["rid_asof"] for r in out.collect()}

    def brute(lk, ls):
        cands = [
            (s, 1000 + i)
            for i, (k, s) in enumerate(right)
            if k == lk and (s < ls if strict else s <= ls)
        ]
        # Latest ts wins; among equal ts the operator picks the one the
        # window visits last — assert on ts, not id, when ts ties exist.
        return max(cands)[0] if cands else None

    for i, (k, s) in enumerate(left):
        want_ts = brute(k, s)
        if want_ts is None:
            assert got[i] is None, (i, k, s)
        else:
            rid = got[i]
            assert rid is not None, (i, k, s)
            # matched right row must have the max eligible timestamp
            assert right[rid - 1000][1] == want_ts, (i, k, s, rid)


@settings(max_examples=8, deadline=None)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=100_000), min_size=1, max_size=30
    ),
    gap_minutes=st.integers(min_value=1, max_value=30),
)
def test_sessionize_invariants(spark, offsets, gap_minutes):
    df = spark.createDataFrame(
        [(7, i, _ts(s)) for i, s in enumerate(offsets)],
        "user_id int, event_id int, ts timestamp",
    )
    out = sessionize(df, "user_id", "ts", gap_minutes=gap_minutes, id_col="event_id")
    rows = sorted(
        ((r["ts"], r["event_id"], r["session_seq"]) for r in out.collect())
    )
    gap = gap_minutes * 60
    for (t1, _, s1), (t2, _, s2) in zip(rows, rows[1:]):
        delta = int(t2.timestamp()) - int(t1.timestamp())
        if s2 == s1:
            assert delta <= gap, "gap inside a session exceeds threshold"
        else:
            assert s2 == s1 + 1
            assert delta > gap, "session split without a real gap"


def test_lsh_pairs_subset_of_exact(spark):
    """LSH has no false positives vs the exact Jaccard pairs (the verify
    stage guarantees it); at these parameters recall is high too."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=5, threshold=0.5).collect()
    }
    lsh = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, n=5, threshold=0.5
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]
    # recall floor at jaccard>=0.5 with 4 bands of r=2: p >= 1-(1-0.25)^4 ≈ 0.68
    if exact:
        assert len(lsh) / len(exact) >= 0.5


def test_minhash_deterministic_across_runs(spark):
    """Regression: salts must be plan-independent literals — a 2-arg
    transform lambda once leaked a Column expression id into the salt,
    making signatures differ between executions of the same query."""
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        minhash_signatures,
    )
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(map(tuple, minhash_signatures(docs, n=5).collect()))
    b = sorted(map(tuple, minhash_signatures(docs, n=5).collect()))
    assert a == b


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab c.xyz",  # small alphabet -> frequent k-gram repeats
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_winnow_fingerprints_property(spark, texts):
    """Winnowing on random strings equals the direct Python reference
    (including the short-document edge cases len<k and n_grams<window)."""
    import hashlib

    from adventureworks_pysparkjobs_spark.operators.text import (
        winnow_fingerprints,
    )

    k, w = 4, 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["fingerprints"])
        for r in winnow_fingerprints(df, k=k, window=w).collect()
    }

    for i, t in enumerate(texts):
        grams = [
            hashlib.md5(t[j : j + k].encode()).hexdigest()
            for j in range(len(t) - k + 1)
        ]
        if not grams:
            want = []
        elif len(grams) < w:
            want = sorted(set(grams))
        else:
            want = sorted(
                {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
            )
        assert got[i] == want, f"text {t!r}"


@pytest.mark.slow
def test_text_profile_equals_composed_operators(spark):
    """The merged single-scan text_profile must agree column-for-column
    with the four standalone operators it fuses (quality_stats,
    language_id, fingerprint, bpe token count) on the real fixture."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators import text as TX
    from adventureworks_pysparkjobs_spark.sources.corpus import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    prof = {r["doc_id"]: r.asDict() for r in TX.text_profile(doc).collect()}

    for r in TX.quality_stats(doc).collect():
        p = prof[r["doc_id"]]
        for c in (
            "n_chars", "n_tokens", "n_whitespace", "mean_token_len",
            "punct_ratio", "digit_ratio", "stopword_ratio", "distinct_ratio",
        ):
            assert p[c] == r[c], (r["doc_id"], c)
    for r in TX.language_id(doc).collect():
        p = prof[r["doc_id"]]
        for c in ("score_de", "score_en", "score_es", "score_fr", "predicted_lang"):
            assert p[c] == r[c], (r["doc_id"], c)
    for r in TX.fingerprint(doc).collect():
        p = prof[r["doc_id"]]
        assert p["content_sha256"] == r["content_sha256"]
        assert p["min_shingle_hash"] == r["min_shingle_hash"]
    for r in doc.select(
        "doc_id", F.size(TX.bpe_tokens("text")).cast("int").alias("n_bpe")
    ).collect():
        assert prof[r["doc_id"]]["n_bpe_tokens"] == r["n_bpe"]
    for r in TX.winnow_fingerprints(doc).collect():
        p = prof[r["doc_id"]]
        assert p["n_winnow_fp"] == r["n_fingerprints"]
        assert p["min_winnow_fp"] == (
            min(r["fingerprints"]) if r["fingerprints"] else None
        )


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c\t.x", min_size=0, max_size=80),
        min_size=1,
        max_size=6,
    ),
    chunk_tokens=st.integers(min_value=2, max_value=10),
    overlap_seed=st.integers(min_value=0, max_value=1_000),
)
def test_chunk_documents_property(spark, texts, chunk_tokens, overlap_seed):
    """Chunking on random whitespace-y strings equals the direct Python
    reference for arbitrary (chunk_tokens, overlap) incl. edge cases:
    empty docs, doc shorter than one chunk, stride-1 maximal overlap."""
    from adventureworks_pysparkjobs_spark.operators.text import chunk_documents

    overlap = overlap_seed % chunk_tokens  # any 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        tuple(r)
        for r in chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    )

    want = []
    for i, t in enumerate(texts):
        toks = t.split()
        n = len(toks)
        if n == 0:
            continue
        starts = [1]
        while starts[-1] + chunk_tokens - 1 < n:
            starts.append(starts[-1] + stride)
        for cid, s in enumerate(starts):
            want.append(
                (
                    i,
                    cid,
                    s,
                    " ".join(toks[s - 1 : s - 1 + chunk_tokens]),
                    min(chunk_tokens, n - s + 1),
                )
            )
    assert got == sorted(want)


@settings(max_examples=6, deadline=None)
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        max_size=40,
    )
)
@pytest.mark.slow
def test_triangle_counts_match_bruteforce(spark, edges):
    from adventureworks_pysparkjobs_spark.operators.graph import (
        triangle_counts,
    )

    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not canon:
        return
    adj: dict[int, set[int]] = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict[int, int] = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v not in adj[u]:
                continue
            for w in nodes:
                if w > v and w in adj[u] and w in adj[v]:
                    for x in (u, v, w):
                        expected[x] = expected.get(x, 0) + 1
    df = spark.createDataFrame(canon, "a int, b int")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # cluster
            st.lists(
                st.integers(min_value=-3, max_value=3),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    num=st.integers(min_value=0, max_value=99),
)
@pytest.mark.slow
def test_semantic_dedup_matches_bruteforce(spark, vecs, num):
    from adventureworks_pysparkjobs_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [
        (i, [float(x) for x in v], c) for i, (c, v) in enumerate(vecs)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["vec_id"]: (r["n_dup_lower"], r["is_kept"])
        for r in semantic_dedup(
            df, threshold_num=num, threshold_den=100
        ).collect()
    }

    q = 1_000_000
    def qv(v):
        return [round(x * q) for x in v]

    expected = {}
    for i, (ci, vi) in enumerate(vecs):
        n_dup = 0
        qi = qv(vi)
        ni = sum(x * x for x in qi)
        for j, (cj, vj) in enumerate(vecs):
            if j >= i or cj != ci:
                continue
            qj = qv(vj)
            nj = sum(x * x for x in qj)
            dot = sum(a * b for a, b in zip(qi, qj))
            if dot > 0 and 10000 * dot * dot >= num * num * ni * nj:
                n_dup += 1
        expected[i] = (n_dup, n_dup == 0)
    assert got == expected


# ---- r5 operators vs brute-force references --------------------------

docs_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=20),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(texts=docs_strategy)
@pytest.mark.slow
def test_jaccard_histogram_matches_bruteforce(spark, texts):
    from adventureworks_pysparkjobs_spark.operators.dedup import (
        jaccard_histogram,
    )

    n = 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["bucket"]: r["n_pairs"]
        for r in jaccard_histogram(
            df, n=n, max_shingle_df=10_000
        ).collect()
    }

    def sh(t):
        w = [x for x in t.strip().split() if x]
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    sets = [sh(t) for t in texts]
    want: dict[int, int] = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue  # not a candidate pair (no shared shingle)
            union = len(sets[i] | sets[j])
            b = min((10 * inter) // union, 9)
            want[b] = want.get(b, 0) + 1
    assert got == want


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # user
        st.integers(min_value=0, max_value=50),  # seconds offset
        st.sampled_from(["x", "y", "z"]),        # type
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_transition_matrix_matches_bruteforce(spark, rows):
    from collections import defaultdict

    from adventureworks_pysparkjobs_spark.operators.analytics import (
        transition_matrix,
    )

    df = spark.createDataFrame(
        [(i, _ts(s), u, t) for i, (u, s, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in transition_matrix(df).collect()
    }

    by_user: dict[int, list] = defaultdict(list)
    for i, (u, s, t) in enumerate(rows):
        by_user[u].append((s, i, t))
    counts: dict[tuple, int] = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    marg: dict[str, int] = defaultdict(int)
    for (a, _), c in counts.items():
        marg[a] += c
    want = {k: (c, c / marg[k[0]]) for k, c in counts.items()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-6 operators vs exact brute-force references
# ---------------------------------------------------------------------------

ks_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # bin
        st.booleans(),                           # in sample A
    ),
    min_size=2,
    max_size=40,
).filter(
    lambda rows: any(a for _, a in rows) and any(not a for _, a in rows)
)


@settings(max_examples=8, deadline=None)
@given(rows=ks_rows_strategy)
@pytest.mark.slow
def test_ks_drift_matches_bruteforce(spark, rows):
    from fractions import Fraction

    import pyspark.sql.functions as F

    from adventureworks_pysparkjobs_spark.operators.profile import ks_drift

    df = spark.createDataFrame(rows, "bin int, is_a boolean")
    out = ks_drift(df, F.col("bin"), F.col("is_a")).collect()
    assert len(out) == 1
    got = out[0]

    a = sorted(b for b, s in rows if s)
    bvals = sorted(b for b, s in rows if not s)
    na, nb = len(a), len(bvals)
    best = Fraction(-1)
    best_bin = None
    for x in sorted({b for b, _ in rows}):
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in bvals if v <= x)
        gap = abs(Fraction(ca, na) - Fraction(cb, nb))
        if gap > best:
            best, best_bin = gap, x
    assert got["n_a"] == na and got["n_b"] == nb
    assert got["ks_at_bin"] == best_bin
    # engine renders num/denom through one correctly-rounded division
    assert got["ks_stat"] == (best.numerator * na * nb // best.denominator) / (na * nb)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
    k=st.sampled_from([1.0, 3.0]),
)
@pytest.mark.slow
def test_mad_outliers_matches_bruteforce(spark, vals, k):
    import statistics

    import pyspark.sql.functions as F

    from adventureworks_pysparkjobs_spark.operators.profile import mad_outliers

    df = spark.createDataFrame([(v,) for v in vals], "v int")
    out = mad_outliers(df, F.col("v"), k=k).collect()
    assert len(out) == 1
    got = out[0]

    # linear-interpolated median of ints lands on the half-integer grid
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    n_out = sum(1 for v in vals if abs(v - med) > k * mad)
    assert got["n"] == len(vals)
    assert got["med"] == float(med)
    assert got["mad"] == float(mad)
    assert got["n_outliers"] == n_out
    assert got["outlier_frac"] == n_out / len(vals)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # qi class
            st.integers(min_value=0, max_value=3),   # sensitive value
        ),
        min_size=1,
        max_size=40,
    ),
)
@pytest.mark.slow
def test_t_closeness_matches_bruteforce(spark, rows):
    from collections import Counter
    from fractions import Fraction

    import pyspark.sql.functions as F

    from adventureworks_pysparkjobs_spark.operators.quality import (
        t_closeness_audit,
    )

    df = spark.createDataFrame(rows, "qi int, sens int")
    out = t_closeness_audit(
        df, {"qi": F.col("qi")}, "sens", t=0.25
    ).collect()
    got = {r["qi"]: (r["class_size"], r["t_distance"], r["is_t_close"]) for r in out}

    glob = Counter(s for _, s in rows)
    n_tot = len(rows)
    for qi in {q for q, _ in rows}:
        cls = Counter(s for q, s in rows if q == qi)
        n_c = sum(cls.values())
        tvd = Fraction(1, 2) * sum(
            abs(Fraction(cls.get(v, 0), n_c) - Fraction(glob[v], n_tot))
            for v in glob
        )
        size, dist, close = got[qi]
        assert size == n_c
        # engine computes num/(2*n_c*n_tot) with one rounded division
        num = tvd * 2 * n_c * n_tot
        assert num.denominator == 1
        assert dist == int(num) / (2 * n_c * n_tot)
        assert close == (dist <= 0.25)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # user
            st.integers(min_value=0, max_value=200_000), # seconds offset
            st.sampled_from(["a", "b", "c"]),            # event type
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.sampled_from([2, 5]),
    max_len=st.sampled_from([2, 4]),
)
@pytest.mark.slow
def test_top_paths_matches_bruteforce(spark, rows, k, max_len):
    from collections import Counter, defaultdict

    from adventureworks_pysparkjobs_spark.operators.analytics import top_paths

    df = spark.createDataFrame(
        [(u, i, _ts(s), t) for i, (u, s, t) in enumerate(rows)],
        "user_id int, event_id int, ts timestamp, event_type string",
    )
    got = [
        (r["path"], r["n_sessions"], r["rnk"])
        for r in top_paths(df, k=k, max_len=max_len).collect()
    ]

    by_sess: dict[tuple, list] = defaultdict(list)
    for i, (u, s, t) in enumerate(rows):
        day = (EPOCH + dt.timedelta(seconds=s)).date()
        by_sess[(u, day)].append((s, i, t))
    paths = Counter()
    for seq in by_sess.values():
        seq.sort()
        paths[">".join(t for _, _, t in seq[:max_len])] += 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == [(p, n, i + 1) for i, (p, n) in enumerate(want)]


@settings(max_examples=8, deadline=None)
@given(
    amounts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25
    )
)
@pytest.mark.slow
def test_gini_bounds_and_brute_force(spark, amounts):
    """Gini ∈ [0, 1−1/n] and matches the O(n²) mean-absolute-difference
    definition G = Σ|xi−xj| / (2·n·Σx)."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        gini_coefficient,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(amounts)], "m int, amt long"
    )
    row = gini_coefficient(
        df, "m", F.col("amt").cast("decimal(18,2)")
    ).collect()[0]
    total = sum(amounts)
    n = len(amounts)
    if total == 0:
        assert row["gini"] is None
        return
    brute = sum(
        abs(a - b) for a in amounts for b in amounts
    ) / (2 * n * total)
    assert abs(row["gini"] - brute) < 1e-9
    assert -1e-12 <= row["gini"] <= 1 - 1 / n + 1e-12


@settings(max_examples=8, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.integers(min_value=0, max_value=50),  # value
            st.integers(min_value=1, max_value=9),  # weight
        ),
        min_size=1,
        max_size=25,
    )
)
@pytest.mark.slow
def test_weighted_median_matches_bruteforce(spark, cells):
    """The operator's lower weighted median equals the brute-force
    smallest value whose at-or-below weight reaches half the total."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        weighted_median,
    )

    df = spark.createDataFrame(cells, "g int, v int, w int")
    got = {
        r["grp"]: r["median_val"]
        for r in weighted_median(df, "g", "v", "w").collect()
    }
    from collections import defaultdict

    groups = defaultdict(lambda: defaultdict(int))
    for g, v, w in cells:
        groups[g][v] += w
    for g, vw in groups.items():
        total = sum(vw.values())
        cum = 0
        for v in sorted(vw):
            cum += vw[v]
            if 2 * cum >= total:
                assert got[g] == v, (g, dict(vw))
                break


@settings(max_examples=8, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),   # start offset s
            st.integers(min_value=0, max_value=500),   # duration s
        ),
        min_size=1,
        max_size=20,
    )
)
@pytest.mark.slow
def test_peak_concurrency_matches_bruteforce(spark, intervals):
    """Peak per day equals the brute-force max, over boundary
    timestamps, of |sessions with start ≤ t ≤ end|."""
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        peak_concurrency,
    )

    sess = [(_ts(s), _ts(s + d)) for s, d in intervals]
    df = spark.createDataFrame(
        sess, "session_start timestamp, session_end timestamp"
    )
    got = {
        str(r["day"]): r["peak_concurrency"]
        for r in peak_concurrency(df).collect()
    }
    boundaries = sorted({t for ab in sess for t in ab})
    brute = {}
    for t in boundaries:
        live = sum(1 for a, b in sess if a <= t <= b)
        d = str(t.date())
        brute[d] = max(brute.get(d, 0), live)
    assert got == brute


@settings(max_examples=6, deadline=None)
@given(
    counts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(1, 50)),
        min_size=2, max_size=10, unique_by=lambda t: t[0],
    ),
    scale=st.integers(2, 7),
)
@pytest.mark.slow
def test_ewma_scaling_linearity(spark, counts, scale):
    """EWMA is linear in the counts: replicating every event `scale`
    times scales ewma_scaled exactly by `scale` (integer kernel —
    no rounding anywhere)."""
    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.timeseries import (
        ewma_daily_counts,
    )

    def build(mult):
        rows, eid = [], 0
        for d, c in counts:
            for _ in range(c * mult):
                eid += 1
                rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", 1, "a"))
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))

    base = {
        r["d"]: r["ewma_scaled"]
        for r in ewma_daily_counts(build(1), window_days=4).collect()
    }
    scaled = {
        r["d"]: r["ewma_scaled"]
        for r in ewma_daily_counts(build(scale), window_days=4).collect()
    }
    assert set(base) == set(scaled)
    for d, v in base.items():
        assert scaled[d] == v * scale


@settings(max_examples=6, deadline=None)
@given(
    xs=st.lists(
        st.integers(-1000, 1000), min_size=3, max_size=30, unique=True
    ),
)
@pytest.mark.slow
def test_spearman_monotone_invariance(spark, xs):
    """Spearman rho is invariant under strictly monotone transforms of
    either axis: rho(x, x) == 1 and rho(x, x^3 + 7) == 1 (ranks are
    all that matter)."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        spearman_correlation,
    )

    rows = [("g", float(x), float(x**3 + 7)) for x in xs]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = spearman_correlation(df, "x", "y", "g").collect()[0]
    # num == var_x == var_y on a perfect fit, but num/(sqrt(v)*sqrt(v))
    # can land 1 ulp past 1.0 — tolerance is the IEEE tree, not noise
    assert abs(r["spearman_rho"] - 1.0) < 5e-16
    rows2 = [("g", float(x), float(-x)) for x in xs]
    df2 = spark.createDataFrame(rows2, "g string, x double, y double")
    r2 = spearman_correlation(df2, "x", "y", "g").collect()[0]
    assert abs(r2["spearman_rho"] + 1.0) < 5e-16


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(0, 100), min_size=1, max_size=60),
)
def test_grouped_percentiles_monotone_and_bracketed(spark, vals):
    """p50 <= p90 <= p99, all three are observed values, and p99 is
    reached by at least 99% of rows."""
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        grouped_value_percentiles,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, d int")
    r = grouped_value_percentiles(df, "g", "d").collect()[0]
    assert r["p50"] <= r["p90"] <= r["p99"]
    assert all(r[p] in vals for p in ("p50", "p90", "p99"))
    n = len(vals)
    assert sum(1 for v in vals if v <= r["p99"]) * 100 >= 99 * n
    assert sum(1 for v in vals if v <= r["p50"]) * 100 >= 50 * n


@settings(max_examples=6, deadline=None)
@given(
    a=st.lists(st.integers(0, 20), min_size=1, max_size=25),
    b=st.lists(st.integers(0, 20), min_size=1, max_size=25),
)
@pytest.mark.slow
def test_mann_whitney_flag_inversion_symmetry(spark, a, b):
    """U1 + U2 = n1*n2 (so the doubled statistics sum to 2*n1*n2) and
    z flips sign exactly when the flag is inverted."""
    from adventureworks_pysparkjobs_spark.operators.profile import (
        mann_whitney_by_flag,
    )

    rows = [(True, v) for v in a] + [(False, v) for v in b]
    df = spark.createDataFrame(rows, "f boolean, v long")
    r1 = mann_whitney_by_flag(df, "f", "v").collect()[0]
    inv = df.selectExpr("NOT f AS f", "v")
    r2 = mann_whitney_by_flag(inv, "f", "v").collect()[0]
    n1, n2 = len(a), len(b)
    assert r1["u2_flagged"] + r2["u2_flagged"] == 2 * n1 * n2
    if r1["z"] is not None:
        # z is exactly antisymmetric (numerators are exact-int doubles,
        # the variance term is symmetric in n1/n2)
        assert r2["z"] == -r1["z"]
        # the biserial divisions round independently: 1-ulp tolerance
        assert abs(r2["rank_biserial"] + r1["rank_biserial"]) < 1e-15


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=40,
    ).map(
        lambda es: sorted(
            {(min(a, b), max(a, b)) for a, b in es if a != b}
        )
    ),
    k=st.integers(2, 4),
)
@pytest.mark.slow
def test_kcore_peel_fixpoint_is_idempotent(spark, edges, k):
    """Once the trajectory stabilizes (two equal consecutive rows),
    every later round is identical, and the stable core (if any) has
    min degree >= k by construction of the peel."""
    from adventureworks_pysparkjobs_spark.operators.graph import kcore_peel

    if not edges:
        return
    df = spark.createDataFrame(edges, "a long, b long")
    rows = sorted(
        (r["round"], r["nodes"], r["edges"])
        for r in kcore_peel(df, k=k, rounds=6).collect()
    )
    stable_from = None
    for i in range(1, len(rows)):
        if rows[i][1:] == rows[i - 1][1:]:
            stable_from = i
            break
    if stable_from is not None:
        for j in range(stable_from, len(rows)):
            assert rows[j][1:] == rows[stable_from][1:]


@settings(max_examples=6, deadline=None)
@given(
    ys=st.lists(st.integers(0, 5), min_size=3, max_size=10),
)
@pytest.mark.slow
def test_kendall_tau_negation_antisymmetry(spark, ys):
    """Reversing one series in time negates the concordant/discordant
    classification of every pair, so tau_b(x, reversed_y) == -tau_b(x, y)
    exactly (the denominator is invariant: pair tie counts are preserved
    under reversal, and x is strictly increasing so tx = 0)."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from adventureworks_pysparkjobs_spark.operators.timeseries import (
        kendall_tau_daily,
    )

    from hypothesis import assume

    assume(any(ys))  # type b must exist somewhere or there is no pair row

    def build(series_b):
        rows, eid = [], 0
        base = _dt.datetime(2024, 1, 1, 6, 0, 0)
        for i in range(len(series_b)):
            # type a strictly increasing: i+1 events on day i
            for _ in range(i + 1):
                eid += 1
                rows.append((base + _dt.timedelta(days=i), "a"))
            for _ in range(series_b[i]):
                eid += 1
                rows.append((base + _dt.timedelta(days=i), "b"))
        return spark.createDataFrame(rows, "ts timestamp, event_type string")

    fwd = kendall_tau_daily(build(ys)).collect()[0]
    rev = kendall_tau_daily(build(ys[::-1])).collect()[0]
    assert fwd["n_pairs"] == rev["n_pairs"]
    assert (fwd["concordant"], fwd["discordant"]) == (
        rev["discordant"], rev["concordant"],
    )
    if fwd["tau_b"] is not None:
        assert fwd["tau_b"] == -rev["tau_b"]


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1, max_size=40,
    ),
)
@pytest.mark.slow
def test_skyline_idempotent_and_correct_vs_bruteforce(spark, pts):
    """skyline(skyline(X)) == skyline(X), and the window formulation
    matches the O(n^2) dominance definition exactly."""
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        skyline_2d,
    )

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {(r["id"]) for r in skyline_2d(df, "x", "y", "id").collect()}

    def dominated(a, b):  # b dominates a
        return (
            b[1] >= a[1] and b[2] >= a[2]
            and (b[1] > a[1] or b[2] > a[2])
        )

    brute = {
        a[0] for a in rows
        if not any(dominated(a, b) for b in rows if b[0] != a[0])
    }
    assert got == brute
    sky = spark.createDataFrame(
        [r for r in rows if r[0] in got], "id long, x long, y long"
    )
    again = {r["id"] for r in skyline_2d(sky, "x", "y", "id").collect()}
    assert again == got


@settings(max_examples=6, deadline=None)
@given(
    members=st.lists(
        st.tuples(st.integers(1, 12), st.sampled_from(["a", "b", "c"])),
        min_size=2, max_size=40,
    ),
)
@pytest.mark.slow
def test_audience_overlap_jaccard_bounds_and_exactness(spark, members):
    """Jaccard from the posting-list formulation matches Python set
    arithmetic exactly for every key pair, and sits in [0, 1]."""
    from adventureworks_pysparkjobs_spark.operators.analytics import (
        audience_overlap,
    )

    df = spark.createDataFrame(
        members, "user_id long, event_type string"
    )
    sets: dict[str, set[int]] = {}
    for u, k in members:
        sets.setdefault(k, set()).add(u)
    got = {
        (r["key_a"], r["key_b"]): r
        for r in audience_overlap(df).collect()
    }
    keys = sorted(sets)
    for i, ka in enumerate(keys):
        for kb in keys[i + 1:]:
            inter = len(sets[ka] & sets[kb])
            if inter == 0:
                assert (ka, kb) not in got  # no row without overlap
                continue
            r = got[(ka, kb)]
            union = len(sets[ka] | sets[kb])
            assert r["n_common"] == inter
            assert r["jaccard"] == inter / union
            assert 0.0 < r["jaccard"] <= 1.0
