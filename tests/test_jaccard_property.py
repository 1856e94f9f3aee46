"""Property test: the capped n-gram Jaccard pipeline (inverted index +
count-only upper-bound prune + exact verification) returns EXACTLY the
pairs a brute-force reference finds among documents sharing at least
one non-hot shingle — i.e. the prune is sound (never drops a
qualifying pair) and verification is exact."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from queens_spark.operators.dedup import ngram_jaccard_pairs, release_caches
from queens_spark.operators.text import HASH_MOD

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _char_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def _shingle_hashes(text: str, n: int = 3) -> set[int]:
    toks = text.split()
    if len(toks) < n:
        return set()
    out = set()
    for i in range(len(toks) - n + 1):
        acc = _char_hash(toks[i])
        for k in range(1, n):
            acc = (acc * 131 + _char_hash(toks[i + k])) % HASH_MOD
        out.add(acc)
    return out


def _reference_pairs(texts: list[str], threshold: float, max_df: int):
    hs = [_shingle_hashes(t) for t in texts]
    df: dict[int, int] = {}
    for s in hs:
        for h in s:
            df[h] = df.get(h, 0) + 1
    rare = {h for h, c in df.items() if c <= max_df}
    out = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not (hs[a] & hs[b] & rare):
                continue  # no shared rare shingle -> not a candidate
            common = len(hs[a] & hs[b])
            union = len(hs[a]) + len(hs[b]) - common
            if union and common / union >= threshold:
                out.add((a, b, common))
    return out


docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=docs_strategy, threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_capped_pipeline_matches_reference(spark, texts, threshold):
    max_df = 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.id_a, r.id_b, r.common)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=threshold, max_df=max_df
        ).collect()
    }
    release_caches()
    assert got == _reference_pairs(texts, threshold, max_df)
