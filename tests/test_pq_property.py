"""Property tests: the PQ encoder against a plain-Python
re-implementation (hypothesis-driven inputs), and integer-PageRank
mass accounting on random graphs. Mirrors the reference's
property-test strategy (SURVEY.md §5) for the scale tier."""

import math

from hypothesis import given, settings, strategies as st

DIM = 16
M = 4
DSUB = DIM // M
KSUB = 4


def _py_pq_codes(vecs, seeds):
    """Reference implementation in plain Python ints."""
    cb = [[math.floor(float(x) * 1000) for x in v] for v in seeds]
    out = []
    for v in vecs:
        q = [math.floor(float(x) * 1000) for x in v]
        packed = 0
        for s in range(M):
            best = None
            for c in range(KSUB):
                d = sum(
                    (q[s * DSUB + i] - cb[c][s * DSUB + i]) ** 2
                    for i in range(DSUB)
                )
                if best is None or d < best[0]:
                    best = (d, c)
            packed += best[1] << (4 * s)
        out.append(packed)
    return out


finite_vec = st.lists(
    st.floats(
        min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False
    ),
    min_size=DIM,
    max_size=DIM,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(finite_vec, min_size=KSUB, max_size=10))
def test_pq_encode_matches_python_reference(spark, vecs):
    from pyspark.sql import Row

    from queens_spark.operators.similarity import pq_encode

    seeds = vecs[:KSUB]
    df = spark.createDataFrame(
        [Row(vid=i, v=[float(x) for x in vec]) for i, vec in enumerate(vecs)]
    )
    got = {
        r["vid"]: r["pq_code"]
        for r in pq_encode(df, "v", "vid", seeds, m=M).collect()
    }
    expect = _py_pq_codes(vecs, seeds)
    assert [got[i] for i in range(len(vecs))] == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)
        ),
        min_size=1,
        max_size=15,
    )
)
def test_pagerank_mass_never_exceeds_scale(spark, raw_edges):
    from pyspark.sql import Row

    from queens_spark.operators.dedup import release_caches
    from queens_spark.operators.graph import PR_SCALE, integer_pagerank

    edges = [(f"n{s}", f"n{d}", w) for s, d, w in raw_edges if s != d]
    if not edges:
        return
    df = spark.createDataFrame(
        [Row(src=s, dst=d, w=w) for s, d, w in edges]
    )
    ranks = integer_pagerank(df, "src", "dst", "w", iters=4).collect()
    release_caches()
    total = sum(r["rank"] for r in ranks)
    # truncation only ever LOSES mass; dangling nodes lose more —
    # the invariant is a hard ceiling plus positivity
    assert total <= PR_SCALE
    assert all(r["rank"] > 0 for r in ranks)
