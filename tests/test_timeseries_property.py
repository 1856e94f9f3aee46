"""Property-based check of the as-of join and range join against
brute-force Python references on hypothesis-generated inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from queens_spark.operators.timeseries import as_of_join, range_join

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=20),   # ts
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=rows_st, right_rows=rows_st)
def test_as_of_join_matches_bruteforce(spark, left_rows, right_rows):
    left = [(k, t, i) for i, (k, t) in enumerate(left_rows)]
    right = [(k, t, 100 + i) for i, (k, t) in enumerate(right_rows)]
    ldf = spark.createDataFrame(left, "k bigint, ts bigint, lid bigint") \
        if left else spark.createDataFrame([], "k bigint, ts bigint, lid bigint")
    rdf = spark.createDataFrame(right, "k bigint, ts bigint, rid bigint") \
        if right else spark.createDataFrame([], "k bigint, ts bigint, rid bigint")

    got = {
        r["lid"]: r["asof_rid"]
        for r in as_of_join(
            ldf, rdf, ["k"], right_cols=("rid", "ts")
        ).collect()
    }

    want = {}
    for k, t, lid in left:
        # latest right row with right.ts <= t; ties by payload order —
        # (rid, ts) struct — so the max rid at the winning ts wins
        cands = [(rt, rid) for rk, rt, rid in right if rk == k and rt <= t]
        want[lid] = max(cands)[1] if cands else None

    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.floats(min_value=0, max_value=100, allow_nan=False),
                    min_size=0, max_size=15),
    ranges=st.lists(
        st.tuples(st.floats(min_value=0, max_value=90, allow_nan=False),
                  st.floats(min_value=0.1, max_value=30, allow_nan=False)),
        min_size=0, max_size=6,
    ),
    bin_width=st.sampled_from([3.0, 10.0, 50.0]),
)
def test_range_join_matches_bruteforce(spark, points, ranges, bin_width):
    pts = [(i, v) for i, v in enumerate(points)]
    rng = [(lo, lo + width, i) for i, (lo, width) in enumerate(ranges)]
    pdf = spark.createDataFrame(pts, "pid bigint, v double") \
        if pts else spark.createDataFrame([], "pid bigint, v double")
    rdf = spark.createDataFrame(rng, "lo double, hi double, band bigint") \
        if rng else spark.createDataFrame([], "lo double, hi double, band bigint")

    got = {
        (r["pid"], r["band"])
        for r in range_join(pdf, rdf, "v", bin_width=bin_width).collect()
    }
    want = {
        (pid, band)
        for pid, v in pts
        for lo, hi, band in rng
        if lo <= v < hi
    }
    assert got == want


comp_edges_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),
              st.integers(min_value=0, max_value=9)),
    min_size=0,
    max_size=10,
)


@pytest.mark.slow
@pytest.mark.parametrize(
    "driver_threshold",
    [5_000_000, 0],
    ids=["driver-union-find", "distributed-min-label"],
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw_edges=comp_edges_st, n_nodes=st.integers(min_value=1, max_value=10))
def test_connected_components_match_union_find(
    spark, driver_threshold, raw_edges, n_nodes
):
    from queens_spark.operators.dedup import connected_components

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges
                    if a != b and a < n_nodes and b < n_nodes})
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id bigint")
    pairs = (
        spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        if edges else spark.createDataFrame([], "id_a bigint, id_b bigint")
    )
    got = {r["doc_id"]: r["component_id"]
           for r in connected_components(
               nodes, pairs, "doc_id",
               driver_threshold=driver_threshold).collect()}

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    roots = {}
    for i in range(n_nodes):
        r = find(i)
        roots.setdefault(r, []).append(i)
    want = {i: min(members) for r, members in roots.items() for i in members}

    assert got == want


def test_resample_gap_fill_semantics(spark):
    """Gaps appear as zero rows with the carry holding the last
    observed sum; spans are per-key; first bucket always observed."""
    import datetime

    from pyspark.sql import Row

    from queens_spark.operators.timeseries import resample_gap_fill

    d = datetime.datetime
    df = spark.createDataFrame([
        Row(k="a", ts=d(2024, 1, 1, 5), value=1.50),
        Row(k="a", ts=d(2024, 1, 1, 9), value=2.25),
        # Jan 2-3 missing
        Row(k="a", ts=d(2024, 1, 4, 1), value=10.00),
        Row(k="b", ts=d(2024, 1, 3, 1), value=0.99),
    ])
    out = {(r["k"], r["bucket"].day):
           (r["n_events"], r["sum_cents"], r["carry_cents"])
           for r in resample_gap_fill(df, "k", "ts", "value").collect()}
    assert out == {
        ("a", 1): (2, 375, 375),
        ("a", 2): (0, 0, 375),     # gap: zero-filled, carry holds
        ("a", 3): (0, 0, 375),
        ("a", 4): (1, 1000, 1000),
        ("b", 3): (1, 99, 99),     # span is per-key (one bucket)
    }


def test_resample_gap_fill_matches_reference(spark):
    """Randomized check vs a pure-Python reference: dense per-key
    spans, zero fills, exact-cents sums, carry semantics."""
    import datetime
    import itertools
    import random

    from pyspark.sql import Row

    from queens_spark.operators.timeseries import resample_gap_fill

    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append(Row(
            k=rng.choice(["a", "b", "c"]),
            ts=datetime.datetime(2024, 1, 1 + rng.randrange(12),
                                 rng.randrange(24)),
            value=round(rng.uniform(-5, 50), 2),
        ))
    got = {(r["k"], r["bucket"].date()):
           (r["n_events"], r["sum_cents"], r["carry_cents"])
           for r in resample_gap_fill(
               spark.createDataFrame(rows), "k", "ts", "value"
           ).collect()}

    import math
    per = {}
    for r in rows:
        key = (r.k, r.ts.date())
        n, s = per.get(key, (0, 0))
        per[key] = (n + 1, s + math.floor(r.value * 100))
    expected = {}
    for k in {r.k for r in rows}:
        days = [d for (kk, d) in per if kk == k]
        carry = None
        d = min(days)
        while d <= max(days):
            n, s = per.get((k, d), (0, 0))
            if (k, d) in per:
                carry = s
            expected[(k, d)] = (n, s, carry)
            d += datetime.timedelta(days=1)
    assert got == expected


def test_resample_gap_fill_grid_guard(spark):
    """A key whose span/unit grid would exceed the per-key cap raises
    BEFORE the explode, naming the key — the documented failure mode
    (multi-year span at minute grain) is enforced, not just warned."""
    import datetime

    import pytest
    from pyspark.sql import Row

    from queens_spark.operators.timeseries import resample_gap_fill

    d = datetime.datetime
    df = spark.createDataFrame([
        Row(k="ok", ts=d(2024, 1, 1), value=1.0),
        Row(k="ok", ts=d(2024, 1, 3), value=1.0),
        Row(k="wide", ts=d(2020, 1, 1), value=1.0),
        Row(k="wide", ts=d(2024, 1, 1), value=1.0),
    ])
    with pytest.raises(ValueError, match="'wide'"):
        resample_gap_fill(df, "k", "ts", "value", unit="day",
                          max_grid_rows_per_key=30)
    # under the cap the operator is unchanged
    out = resample_gap_fill(df, "k", "ts", "value", unit="day",
                            max_grid_rows_per_key=2000)
    assert out.where("k = 'wide'").count() == 1462  # 2020-01-01..2024-01-01
    assert out.where("k = 'ok'").count() == 3
