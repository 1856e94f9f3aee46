"""Integer PageRank: exact-arithmetic determinism (the whole point),
sane rank ordering, mass conservation up to documented truncation."""

import pytest
from pyspark.sql import Row

from queens_spark.operators.graph import PR_SCALE, integer_pagerank


def _edges(spark, rows):
    return spark.createDataFrame([Row(src=s, dst=d, w=w) for s, d, w in rows])


def test_pagerank_deterministic_across_parallelism(spark):
    from queens_spark.operators.dedup import release_caches

    rows = [("a", "b", 3), ("b", "c", 2), ("c", "a", 5), ("a", "c", 1),
            ("c", "b", 4), ("b", "a", 7)]
    e1 = _edges(spark, rows).repartition(1)
    e7 = _edges(spark, rows).repartition(7)
    r1 = {r["node"]: r["rank"] for r in
          integer_pagerank(e1, "src", "dst", "w", iters=6).collect()}
    r7 = {r["node"]: r["rank"] for r in
          integer_pagerank(e7, "src", "dst", "w", iters=6).collect()}
    release_caches()
    assert r1 == r7 and len(r1) == 3


def test_pagerank_hub_ranks_highest_and_mass_bounded(spark):
    from queens_spark.operators.dedup import release_caches

    # every node links to the hub; hub links back to one node only
    rows = [("u1", "hub", 1), ("u2", "hub", 1), ("u3", "hub", 1),
            ("hub", "u1", 1)]
    # 30 iterations: the hub↔u1 2-cycle oscillates with amplitude
    # ~d^k, which must decay below the equilibrium hub−u1 gap before
    # the ordering assertion is meaningful
    ranks = {r["node"]: r["rank"] for r in
             integer_pagerank(_edges(spark, rows), "src", "dst", "w",
                              iters=30, checkpoint_every=10).collect()}
    release_caches()
    assert max(ranks, key=ranks.get) == "hub"
    total = sum(ranks.values())
    # no dangling nodes here: mass ≤ scale, short by at most the
    # per-iteration truncation (< |V| + 2 per node per iteration)
    assert total <= PR_SCALE
    assert total >= PR_SCALE - 30 * (len(ranks) ** 2 + 2 * len(ranks))


def test_pagerank_guards(spark):
    e = _edges(spark, [("a", "b", 1)])
    with pytest.raises(ValueError, match="damping_pct"):
        integer_pagerank(e, "src", "dst", "w", damping_pct=0)
    with pytest.raises(ValueError, match="iters"):
        integer_pagerank(e, "src", "dst", "w", iters=0)
    # fractional weights would truncate in Spark but round in the
    # DuckDB twin — the integral-type guard must reject them up front
    from pyspark.sql import functions as F

    ef = e.withColumn("wf", F.col("w") * 0.5)
    with pytest.raises(ValueError, match="integral"):
        integer_pagerank(ef, "src", "dst", "wf")
    ed = e.withColumn("wd", F.col("w").cast("decimal(10,2)"))
    with pytest.raises(ValueError, match="integral"):
        integer_pagerank(ed, "src", "dst", "wd")
    # missing weight_col: descriptive ValueError, not a bare KeyError
    with pytest.raises(ValueError, match="available columns"):
        integer_pagerank(e, "src", "dst", "nope")


def test_pagerank_weight_col_case_insensitive(spark):
    """Spark resolves columns case-insensitively; the dtype guard
    must match that — 'W' for column 'w' runs, not KeyError."""
    from queens_spark.operators.dedup import release_caches

    e = _edges(spark, [("a", "b", 1), ("b", "a", 2)])
    ranks = {r["node"]: r["rank"] for r in
             integer_pagerank(e, "src", "dst", "W", iters=2).collect()}
    release_caches()
    assert len(ranks) == 2


def test_pagerank_driver_and_distributed_paths_identical(spark):
    """The adaptive driver loop and the distributed join loop run the
    SAME truncating-int recurrence — results must be bit-identical."""
    from queens_spark.operators.dedup import release_caches

    rows = [("a", "b", 3), ("b", "c", 2), ("c", "a", 5), ("a", "c", 1),
            ("c", "b", 4), ("d", "a", 2), ("b", "d", 1)]
    e = _edges(spark, rows)
    drv = {r["node"]: r["rank"] for r in
           integer_pagerank(e, "src", "dst", "w", iters=5).collect()}
    dist = {r["node"]: r["rank"] for r in
            integer_pagerank(e, "src", "dst", "w", iters=5,
                             max_driver_edges=0).collect()}
    release_caches()
    assert drv == dist and len(drv) == 4


def test_pagerank_empty_edges_raises(spark):
    import pytest

    e = _edges(spark, [("a", "b", 1)]).where("w > 99")
    with pytest.raises(ValueError, match="empty"):
        integer_pagerank(e, "src", "dst", "w")


def test_personalized_pagerank_paths_identical_and_seed_semantics(spark):
    """PPR: driver and distributed paths bit-identical; teleport mass
    lands only on seeds (non-seed nodes rank purely via in-links —
    a node with no path from the seeds ranks 0); bad seeds raise."""
    import pytest

    from queens_spark.operators.dedup import release_caches

    rows = [("a", "b", 3), ("b", "c", 2), ("c", "a", 5), ("a", "c", 1),
            ("c", "b", 4), ("d", "a", 2), ("b", "d", 1),
            ("x", "y", 1)]  # x->y island: unreachable from seeds
    e = _edges(spark, rows)
    drv = {r["node"]: r["rank"] for r in
           integer_pagerank(e, "src", "dst", "w", iters=5,
                            seed_nodes=["a"]).collect()}
    dist = {r["node"]: r["rank"] for r in
            integer_pagerank(e, "src", "dst", "w", iters=5,
                             seed_nodes=["a"],
                             max_driver_edges=0).collect()}
    release_caches()
    assert drv == dist and len(drv) == 6
    assert drv["y"] == 0          # island: no seed mass reaches it
    assert drv["a"] > drv["d"]    # the seed holds the teleport mass
    # differs from uniform PageRank (the personalization matters)
    uni = {r["node"]: r["rank"] for r in
           integer_pagerank(e, "src", "dst", "w", iters=5).collect()}
    release_caches()
    assert drv != uni

    with pytest.raises(ValueError, match="subset"):
        integer_pagerank(e, "src", "dst", "w", seed_nodes=["nope"])
    release_caches()
    with pytest.raises(ValueError, match="subset"):
        integer_pagerank(e, "src", "dst", "w", seed_nodes=[])
    release_caches()


def test_oracle_ctes_escape_quoted_seeds(spark):
    """A seed node containing an apostrophe must emit doubled-quote
    SQL ('O''Brien'), parse in DuckDB, and stay bit-identical to the
    Spark path — not produce malformed (injectable) oracle SQL."""
    import duckdb

    from queens_spark.operators.graph import duckdb_pagerank_ctes

    rows = [("o'brien", "b", 2), ("b", "o'brien", 3), ("b", "c", 1)]
    e = _edges(spark, rows)
    got = {r["node"]: r["rank"] for r in
           integer_pagerank(e, "src", "dst", "w", iters=4,
                            seed_nodes=["o'brien"]).collect()}
    from queens_spark.operators.dedup import release_caches
    release_caches()

    def q(v):
        return "'" + v.replace("'", "''") + "'"

    vals = ", ".join(f"({q(s)}, {q(d)}, {w})" for s, d, w in rows)
    ctes = duckdb_pagerank_ctes(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst, w)",
        iters=4, seed_nodes=["o'brien"])
    oracle = dict(duckdb.sql(
        f"WITH {ctes} SELECT node, rank FROM pr").fetchall())
    assert got == oracle
