"""Edge cases for the corpus-statistics operators (q63/q67/q78/q79)."""

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.operators.corpus import (
    bigram_lm,
    lm_doc_scores,
    tfidf_topk,
    vocabulary,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=0, text="apple banana apple"),
        Row(doc_id=1, text="banana cherry"),
        Row(doc_id=2, text=""),            # empty doc
        Row(doc_id=3, text="solo"),        # single token -> no bigrams
    ])


def test_tfidf_prefers_rare_terms(corpus):
    got = {(r["doc"], r["rank"]): r["token"]
           for r in tfidf_topk(corpus, "text", "doc_id", k=2).collect()}
    # doc 0: apple (tf 2, df 1) must outrank banana (tf 1, df 2)
    assert got[(0, 1)] == "apple" and got[(0, 2)] == "banana"
    # doc 1: cherry (df 1) outranks banana (df 2)
    assert got[(1, 1)] == "cherry"
    # empty doc contributes no rows
    assert not any(doc == 2 for doc, _ in got)


def test_vocabulary_counts_and_rank(corpus):
    rows = {r["token"]: r for r in vocabulary(corpus, "text", "doc_id", top=10).collect()}
    assert rows["apple"]["n_occurrences"] == 2 and rows["apple"]["n_docs"] == 1
    assert rows["banana"]["n_occurrences"] == 2 and rows["banana"]["n_docs"] == 2
    # count tie (apple/banana both 2) breaks alphabetically
    assert rows["apple"]["rank"] == 1 and rows["banana"]["rank"] == 2


def test_bigram_lm_probabilities_sum_per_context(corpus):
    lm = bigram_lm(corpus, "text", "doc_id").collect()
    by_w1 = {}
    for r in lm:
        by_w1.setdefault(r["w1"], []).append(r)
        assert r["p_e6"] == r["c2"] * 1_000_000 // r["c1"]
    # "apple banana" and "banana apple" from doc 0, "banana cherry" doc 1
    apple = {r["w2"]: r for r in by_w1["apple"]}
    assert apple["banana"]["p_e6"] == 1_000_000  # apple -> banana always
    banana = {r["w2"]: r for r in by_w1["banana"]}
    assert banana["apple"]["p_e6"] == 500_000
    assert banana["cherry"]["p_e6"] == 500_000


@pytest.mark.slow
def test_lm_doc_scores_skip_bigramless_docs(corpus):
    got = {r["doc"]: r for r in lm_doc_scores(corpus, "text", "doc_id").collect()}
    assert set(got) == {0, 1}          # empty + single-token docs absent
    assert got[0]["n_bigrams"] == 2
    # doc 0 positions: apple->banana (1e6), banana->apple (5e5) -> avg 750000
    assert got[0]["avg_p_e6"] == 750_000
    from queens_spark.operators.dedup import release_caches

    release_caches()


def test_bm25_rare_term_dominates_and_hand_check(spark):
    """A doc matching the rare term outranks one matching only common
    terms, and one score is reproduced by hand from the integer
    formula."""
    from pyspark.sql import Row

    from queens_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame([
        Row(doc_id=0, text="rare alpha beta"),
        Row(doc_id=1, text="common common alpha"),
        Row(doc_id=2, text="common beta beta"),
        Row(doc_id=3, text="gamma gamma gamma"),
    ])
    got = bm25_topk(df, "text", "doc_id", ["rare", "common"], k=4,
                    scale=100_000).collect()
    rows = {r["doc"]: (r["bm25_e5"], r["n_terms"]) for r in got}
    assert 3 not in rows                      # no query term: absent
    assert got[0]["doc"] == 0                 # rare-term doc wins
    # hand check doc 0: N=4, T=12, dl=3, term 'rare' tf=1 df=1
    n, t, tf, dfd, dl = 4, 12, 1, 1, 3
    num = 100_000 * (2 * n - 2 * dfd + 1) * 44 * tf * t
    den = (2 * dfd + 1) * (20 * tf * t + 6 * t + 18 * dl * n)
    assert rows[0] == (num // den, 1)


def test_bm25_guards(spark):
    from pyspark.sql import Row

    from queens_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame([Row(doc_id=0, text="a b")])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(df, "text", "doc_id", [])
    with pytest.raises(ValueError, match="envelope"):
        bm25_topk(df, "text", "doc_id", ["a"], scale=2**62)


from hypothesis import HealthCheck, given, settings, strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _bm25_reference(docs, terms, scale=100_000):
    """Pure-Python exact-integer BM25 twin of corpus.bm25_topk."""
    toks = {i: t.split() for i, t in docs}
    dl = {i: len(v) for i, v in toks.items() if v}
    n, t_total = len(dl), sum(dl.values())
    out = {}
    for term in sorted(set(terms)):
        df_docs = sum(1 for v in toks.values() if term in v)
        if not df_docs:
            continue
        for i, v in toks.items():
            tf = v.count(term)
            if not tf:
                continue
            num = scale * (2 * n - 2 * df_docs + 1) * 44 * tf * t_total
            den = (2 * df_docs + 1) * (
                20 * tf * t_total + 6 * t_total + 18 * dl[i] * n
            )
            s, c = out.get(i, (0, 0))
            out[i] = (s + num // den, c + 1)
    return out


@pytest.mark.slow
@settings(deadline=None, max_examples=15,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        min_size=2, max_size=8,
    ),
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3),
)
def test_bm25_matches_reference(spark, doc_words, qterms):
    from pyspark.sql import Row

    from queens_spark.operators.corpus import bm25_topk

    docs = [(i, " ".join(w)) for i, w in enumerate(doc_words)]
    got = {r["doc"]: (r["bm25_e5"], r["n_terms"])
           for r in bm25_topk(
               spark.createDataFrame([Row(doc_id=i, text=t)
                                      for i, t in docs]),
               "text", "doc_id", list(qterms), k=len(docs),
           ).collect()}
    assert got == _bm25_reference(docs, qterms)


def test_lm_quality_buckets_semantics(spark):
    from queens_spark.operators.corpus import lm_quality_buckets

    # fluent = repeated template text (high bigram probability under
    # the corpus's own LM); salad = one-off word pairs (low)
    texts = (
        ["the cat sat on the mat"] * 6
        + ["the cat sat on a rug"] * 3
        + ["zebra quark velvet onion gasket prism"]
        + ["onion zebra prism quark gasket velvet"]
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = lm_quality_buckets(df, "text", "doc_id").collect()
    by_doc = {r["doc"]: r for r in rows}
    assert len(rows) == len(texts)

    # same score => same bucket (value-thresholded boundaries)
    seen = {}
    for r in rows:
        if r["avg_p_e6"] in seen:
            assert seen[r["avg_p_e6"]] == r["bucket"]
        seen[r["avg_p_e6"]] = r["bucket"]

    # bucket order is monotone in score: no tail doc outscores a head doc
    rank = {"head": 0, "middle": 1, "tail": 2}
    ordered = sorted(rows, key=lambda r: -r["avg_p_e6"])
    assert [rank[r["bucket"]] for r in ordered] == sorted(
        rank[r["bucket"]] for r in ordered
    )

    # the template docs are the most fluent; the salads score worst
    assert by_doc[0]["avg_p_e6"] > by_doc[10]["avg_p_e6"]
    assert by_doc[10]["bucket"] == "tail"

    # head mass never exceeds a third of total (inclusive threshold)
    total = sum(r["n_bigrams"] for r in rows)
    head = sum(r["n_bigrams"] for r in rows if r["bucket"] == "head")
    assert head * 3 <= total


def test_hashed_alignment_scores_reference(spark):
    from queens_spark.operators.corpus import (
        ALIGN_SCALE,
        hashed_alignment_scores,
    )
    from queens_spark.operators.text import HASH_MOD

    docs = [
        (0, "alpha beta alpha gamma", True),
        (1, "alpha alpha beta beta", True),
        (2, "delta epsilon zeta eta", False),
        (3, "delta delta zeta theta", False),
        (4, "alpha delta beta zeta", False),  # mixed
        (5, "", False),                        # empty: absent from output
    ]
    nb = 64
    df = spark.createDataFrame(docs, ["doc_id", "text", "is_target"])
    got = {
        r["doc"]: (r["n_tokens"], r["align_e9"])
        for r in hashed_alignment_scores(
            df, "text", "doc_id", "is_target", n_buckets=nb
        ).collect()
    }

    def phash(t):
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % HASH_MOD
        return h % nb

    feats = [(d, tgt, phash(t)) for d, txt, tgt in docs
             for t in txt.split()]
    ts = len(feats)
    tt = sum(1 for _, tgt, _ in feats if tgt)
    cs, ct, db = {}, {}, {}
    for d, tgt, b in feats:
        cs[b] = cs.get(b, 0) + 1
        if tgt:
            ct[b] = ct.get(b, 0) + 1
        db[(d, b)] = db.get((d, b), 0) + 1
    exp = {}
    for (d, b), cnt in db.items():
        pt = (ct.get(b, 0) + 1) * ALIGN_SCALE // (tt + nb)
        ps = (cs[b] + 1) * ALIGN_SCALE // (ts + nb)
        n, s = exp.get(d, (0, 0))
        exp[d] = (n + cnt, s + cnt * (pt - ps))
    assert got == exp
    assert 5 not in got  # empty doc has no features
    # target-vocabulary docs outscore off-target ones
    assert min(got[0][1], got[1][1]) > max(got[2][1], got[3][1])


def test_related_terms_reference(spark):
    from queens_spark.operators.corpus import PMI_SCALE, related_terms

    docs = [
        (0, "spark shuffle join spark"),
        (1, "spark shuffle agg"),
        (2, "spark shuffle broadcast"),
        (3, "pandas frame index"),
        (4, "pandas frame merge"),
        (5, "spark solo"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = [
        (r["token"], r["co_df"], r["df_docs"], r["score_e6"])
        for r in related_terms(
            df, "text", "doc_id", "spark", k=10, min_co=2
        ).collect()
    ]
    # brute force
    sets = {d: set(t.split()) for d, t in docs}
    n = len(sets)
    seed_docs = {d for d, s in sets.items() if "spark" in s}
    co, dft = {}, {}
    for d, s in sets.items():
        for t in s:
            dft[t] = dft.get(t, 0) + 1
            if d in seed_docs and t != "spark":
                co[t] = co.get(t, 0) + 1
    exp = sorted(
        (
            (t, c, dft[t], c * n * PMI_SCALE // (len(seed_docs) * dft[t]))
            for t, c in co.items()
            if c >= 2
        ),
        key=lambda r: (-r[3], r[0]),
    )[:10]
    assert got == exp
    # 'shuffle' (3/4 spark docs, df 3) must outrank nothing above it
    assert got[0][0] == "shuffle"


def test_kneser_ney_reference(spark):
    """Exact-integer KN probabilities equal a from-scratch float KN
    reference (within fixed-point truncation), sum to ~1 per context,
    and the envelope guard raises rather than overflowing."""
    import pytest

    from queens_spark.operators.corpus import KN_SCALE, kneser_ney_bigram_lm

    texts = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on a log",
        "the dog ate the bone",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = kneser_ney_bigram_lm(df, "text", "doc_id").collect()

    # reference
    bigrams = {}
    for t in texts:
        w = t.split()
        for a, b in zip(w, w[1:]):
            bigrams[(a, b)] = bigrams.get((a, b), 0) + 1
    D = len(bigrams)
    c1, n1p, cont = {}, {}, {}
    for (a, b), c in bigrams.items():
        c1[a] = c1.get(a, 0) + c
        n1p[a] = n1p.get(a, 0) + 1
        cont[b] = cont.get(b, 0) + 1
    for r in rows:
        a, b = r["w1"], r["w2"]
        c = bigrams[(a, b)]
        exact = (max(4 * c - 3, 0) * D + 3 * n1p[a] * cont[b]) \
            * KN_SCALE // (4 * c1[a] * D)
        assert r["p_kn_e9"] == exact, (a, b)
        ref = (max(c - 0.75, 0) + 0.75 * n1p[a] * (cont[b] / D)) / c1[a]
        assert abs(r["p_kn_e9"] / KN_SCALE - ref) < 2 / KN_SCALE, (a, b)
    # per-context mass sums to <= 1 and is close for observed bigrams
    # (the deficit is the unseen-bigram backoff mass)
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r["w1"], 0)
        by_ctx[r["w1"]] += r["p_kn_e9"]
    assert all(v <= KN_SCALE for v in by_ctx.values())
    # observed mass < 1: the deficit is the discount mass KN reserves
    # for unseen continuations (every 'on X' bigram has c=1 here, so
    # 3/4 of each count is redistributed - that IS the algorithm)
    assert 0 < by_ctx["on"] < KN_SCALE

    with pytest.raises(ValueError, match="envelope"):
        kneser_ney_bigram_lm(df, "text", "doc_id", scale=2**62)
