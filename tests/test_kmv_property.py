"""Property tests for the KMV sketch algebra: however a key stream is
split into batches, incremental sketch-store appends end bit-identical
to one whole-corpus build (the closure property as a storage
contract), and the sketch itself is the bottom-k of the hashed
distinct set regardless of duplication or ordering."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from queens_spark.operators.kmv import kmv_hash, kmv_sketches
from queens_spark.store.sketch_store import (
    append_sketch_store,
    build_sketch_store,
    load_sketch_store,
)

# small domains force collisions/duplication; two groups exercise the
# per-group independence
keys_st = st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 400)),
    min_size=1,
    max_size=120,
)
cuts_st = st.lists(st.integers(1, 119), min_size=0, max_size=3)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, key bigint")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=keys_st, cuts=cuts_st, k=st.sampled_from([4, 16]))
def test_incremental_appends_equal_one_build(
    spark, tmp_path_factory, rows, cuts, k
):
    import uuid

    base = str(tmp_path_factory.mktemp("kmvp") / uuid.uuid4().hex)
    bounds = sorted({c for c in cuts if c < len(rows)})
    pieces, lo = [], 0
    for b in bounds + [len(rows)]:
        if b > lo:
            pieces.append(rows[lo:b])
            lo = b
    inc_dir, full_dir = base + "_inc", base + "_full"
    build_sketch_store(_df(spark, pieces[0]), "g", "key", inc_dir, "s", k=k)
    for p in pieces[1:]:
        append_sketch_store(spark, _df(spark, p), inc_dir, "s")
    build_sketch_store(_df(spark, rows), "g", "key", full_dir, "s", k=k)
    inc = sorted(
        (r["g"], r["v"])
        for r in load_sketch_store(spark, inc_dir, "s").sketches().collect()
    )
    full = sorted(
        (r["g"], r["v"])
        for r in load_sketch_store(spark, full_dir, "s").sketches().collect()
    )
    assert inc == full


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=keys_st, k=st.sampled_from([4, 16]))
def test_sketch_is_bottom_k_of_hashed_distinct(spark, rows, k):
    df = _df(spark, rows)
    got = {}
    for r in kmv_sketches(df, "g", "key", k).collect():
        got.setdefault(r["g"], []).append(r["v"])
    truth_rows = (
        df.select("g", kmv_hash("key").alias("h")).distinct().collect()
    )
    truth = {}
    for r in truth_rows:
        truth.setdefault(r["g"], []).append(r["h"])
    for g, hs in truth.items():
        assert sorted(got.get(g, [])) == sorted(hs)[:k]
