"""Duplicated-span removal (ExactSubstr dedup, q135): edge cases and
a brute-force Python equivalence sweep.

Reference behavior modeled: Lee et al. 2022 span-level dedup — remove
every token covered by an n-token span whose exact sequence occurs
>= min_count times across the corpus (counting occurrences, so a span
repeated WITHIN one document is duplicated too).
"""

import random

from queens_spark.operators.dedup import remove_duplicated_spans


def _brute_force(corpus, n, min_count):
    """(doc_id -> (n_tokens, n_removed, clean_text)) by direct span
    counting on token tuples (no hashing)."""
    toks = {d: t.split() for d, t in corpus}
    counts = {}
    for tk in toks.values():
        for i in range(len(tk) - n + 1):
            key = tuple(tk[i : i + n])
            counts[key] = counts.get(key, 0) + 1
    out = {}
    for d, tk in toks.items():
        covered = set()
        for i in range(len(tk) - n + 1):
            if counts[tuple(tk[i : i + n])] >= min_count:
                covered.update(range(i, i + n))
        kept = [t for j, t in enumerate(tk) if j not in covered]
        out[d] = (len(tk), len(tk) - len(kept), " ".join(kept))
    return out


def _run(spark, corpus, n, min_count):
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    rows = remove_duplicated_spans(
        df, "text", "doc_id", n=n, min_count=min_count
    ).collect()
    return {
        r["doc"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in rows
    }


def test_edge_cases(spark):
    corpus = [
        (1, "a b c d e f g h x y z"),  # shared prefix with doc 2
        (2, "a b c d e f g h"),  # fully covered
        (3, "one two three"),  # shorter than n
        (4, "q w e r t y u i o p a b c d e f g h tail"),  # dup mid-doc
        (5, ""),  # empty
        (6, "r r r r r r r r r r r r r r r r"),  # within-doc repeat
    ]
    got = _run(spark, corpus, n=8, min_count=2)
    assert got == _brute_force(corpus, 8, 2)
    assert got[2] == (8, 8, "")  # whole duplicated doc vanishes
    assert got[3] == (3, 0, "one two three")  # short docs untouched
    assert got[6][1] == 16  # self-repetition is duplication


def test_overlapping_spans_merge_into_one_interval(spark):
    # "a b c d" appears at starts 0 and 2 of doc 1 (overlap) and in
    # doc 2; coverage is the interval UNION, not double-removal.
    corpus = [(1, "a b a b a b c d x"), (2, "a b a b a b c d y"),
              (3, "k l m n o p")]
    got = _run(spark, corpus, n=4, min_count=2)
    assert got == _brute_force(corpus, 4, 2)


def test_min_count_respects_occurrences_not_docs(spark):
    # The span occurs twice in ONE doc and nowhere else: with
    # min_count=2 it is removed; with min_count=3 it survives.
    corpus = [(1, "p q r s p q r s"), (2, "u v w x y z")]
    assert _run(spark, corpus, n=4, min_count=2)[1][1] == 8
    assert _run(spark, corpus, n=4, min_count=3)[1][1] == 0


def test_random_corpus_matches_brute_force(spark):
    rng = random.Random(135)
    vocab = [f"w{i}" for i in range(12)]
    corpus = []
    for d in range(40):
        n_tok = rng.randrange(0, 30)
        corpus.append(
            (d, " ".join(rng.choice(vocab) for _ in range(n_tok)))
        )
    for n, mc in ((3, 2), (5, 2), (4, 3)):
        assert _run(spark, corpus, n=n, min_count=mc) == _brute_force(
            corpus, n, mc
        ), (n, mc)


def _winnow_ref(text, n, w, mod):
    """Reference winnowing: positional shingle hashes (char-once
    polynomial) + rightmost-min window selection."""
    toks = text.split()
    th = []
    for t in toks:
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % mod
        th.append(h)
    H = []
    for i in range(len(th) - n + 1):
        acc = th[i]
        for k in range(1, n):
            acc = (acc * 131 + th[i + k]) % mod
        H.append(acc)
    L = len(H)
    if L < 1:
        return set()
    out = set()
    for i in range(max(L - w + 1, 1)):
        best = i
        for q in range(i + 1, min(i + w, L)):
            if H[q] <= H[best]:
                best = q
        out.add((best + 1, H[best]))
    return out


def test_winnowing_matches_reference_and_guarantee(spark):
    import random

    from queens_spark.operators.dedup import winnow_fingerprints
    from queens_spark.operators.text import HASH_MOD

    rng = random.Random(147)
    vocab = [f"t{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(9))  # >= w+n-1=7
    docs = []
    for d in range(20):
        words = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
        docs.append((d, " ".join(words)))
    # plant the shared substring in two otherwise-different docs
    docs.append((100, "aa bb " + shared + " cc"))
    docs.append((101, "xx yy zz " + shared))

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = winnow_fingerprints(df, "text", "doc_id", n=4, w=4).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc"], set()).add((r["pos"], r["fp"]))
    for d, t in docs:
        assert got.get(d, set()) == _winnow_ref(t, 4, 4, HASH_MOD), d
    # the winnowing guarantee: a shared >= w+n-1-token substring
    # yields at least one shared fingerprint HASH
    fps100 = {fp for _, fp in got[100]}
    fps101 = {fp for _, fp in got[101]}
    assert fps100 & fps101
