"""Iterative graph algorithms in portable integer arithmetic.

Connected components live in operators/dedup.py (they serve the dedup
pipeline); this module holds the rank-propagation tier: weighted
PageRank over an edge frame, the classic "importance over a link
graph" primitive a training-data pipeline uses to weight crawl domains
or rank documents for curation.

Why INTEGER PageRank: the textbook algorithm iterates
``r' = (1-d)/N + d·Σ r(src)·w/wout(src)`` in floating point, but a
distributed Σ over doubles is summation-order-dependent — two runs
(or two engines) legally disagree in the last ulps, which both breaks
reproducible curation decisions and makes the operator un-gradeable
against an external oracle. Every quantity here is an int64 in
parts-per-*scale* (default 1e9) with truncating division at TWO fixed
points per iteration (per-edge contribution, and the damping product)
— integer sums commute exactly, so the result is bit-identical on any
engine, at any parallelism, in any order. The truncation loses < N
parts-per-scale of mass per iteration (bounded, one-sided), which is
noise at scale=1e9 — determinism is worth strictly more than the
9th decimal of a score used for ranking.

Scale shape (100 TB graph): per iteration, one join of the rank frame
(|V| rows, counter-width) against the persisted edge frame on ``src``
— broadcast when |V| fits, shuffle-on-src otherwise (AQE decides) —
then one ``dst``-keyed counter-width aggregation. The edge frame with
its precomputed out-weights is persisted ONCE and reused by every
iteration. Dangling mass (nodes with no out-edges) is dropped, the
standard simplification; the oracle does the same. ``checkpoint_every``
breaks lineage with ``localCheckpoint`` every N iterations (default 5
— plan depth and per-iteration planning cost otherwise grow linearly
with the iteration count, the classic iterative-lineage scale
killer); results are identical, pass ``None`` to disable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000_000  # ranks in parts-per-billion

#: adaptive threshold (the connected-components convention,
#: dedup.py): below this many AGGREGATED (src, dst, w) edges the
#: 10-iteration loop runs on the driver in plain Python ints — the
#: arithmetic is already exact integer, so both paths are
#: bit-identical (equality-tested) and the driver path replaces
#: iters× shuffle barriers with one collect
MAX_DRIVER_EDGES = 5_000_000


def integer_pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    iters: int = 10,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    checkpoint_every: int | None = 5,
    max_driver_edges: int = MAX_DRIVER_EDGES,
    seed_nodes: list | None = None,
) -> DataFrame:
    """Weighted PageRank; returns (node, rank) with rank in
    parts-per-*scale*. See module docstring for the exact-arithmetic
    contract; the DuckDB twin is :func:`duckdb_pagerank_ctes`.

    With *seed_nodes*, this is PERSONALIZED PageRank: the teleport
    mass ``(1-d)`` lands only on the seed set (split evenly, same
    truncating division) and the walk starts there — the
    "importance relative to THESE nodes" primitive behind
    graph-based recommendation and seed-expanded curation. Every
    seed must exist in the graph (ValueError otherwise: a typo'd
    seed silently teleporting nowhere would skew all ranks).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # weights must be INTEGRAL: the bit-identical contract with
    # duckdb_pagerank_ctes holds only when neither engine rounds — a
    # fractional weight would truncate here (Spark cast) but round in
    # the twin's CAST, silently diverging. Scale fractional weights to
    # integers (e.g. ×1000) before calling.
    # Spark resolves column references case-insensitively by default,
    # so the dtype lookup must too — and a genuinely missing column
    # should be a descriptive ValueError, not a bare KeyError
    dtypes_ci = {name.lower(): t for name, t in edges.dtypes}
    wtype = dtypes_ci.get(weight_col.lower())
    if wtype is None:
        raise ValueError(
            f"weight_col {weight_col!r} not found in edges frame; "
            f"available columns: {[name for name, _ in edges.dtypes]}"
        )
    if not (
        wtype in ("tinyint", "smallint", "int", "bigint")
        or (wtype.startswith("decimal") and wtype.endswith(",0)"))
    ):
        raise ValueError(
            f"weight_col {weight_col!r} must be an integral type for "
            f"oracle-exact arithmetic, got {wtype}; pre-scale fractional "
            f"weights to integers"
        )
    spark = edges.sparkSession
    # registered in dedup's persist registry: probe + consumer (driver
    # collect or the distributed edge frame) share ONE execution of
    # the upstream; release_caches() frees it after materialization
    from queens_spark.operators.dedup import _persist

    narrow = _persist(
        edges.select(
            F.col(src_col).alias("s"),
            F.col(dst_col).alias("d"),
            F.col(weight_col).cast("bigint").alias("w"),
        )
    )
    # size probe ships ONE number, not up to max_driver_edges rows —
    # on the distributed path those rows would only be discarded
    n_edges = narrow.limit(max_driver_edges + 1).count()
    if n_edges <= max_driver_edges:
        probe = narrow.collect()  # ≤ threshold cached narrow rows
        narrow.unpersist()
        if not probe:
            raise ValueError("edges frame is empty")
        # driver path: same truncating-int recurrence, zero shuffles
        wout: dict = {}
        nodes_set = set()
        for r in probe:
            wout[r["s"]] = wout.get(r["s"], 0) + int(r["w"])
            nodes_set.add(r["s"])
            nodes_set.add(r["d"])
        n = len(nodes_set)
        if seed_nodes is not None:
            seeds = set(seed_nodes)
            missing = seeds - nodes_set
            if not seeds or missing:
                raise ValueError(
                    f"seed_nodes must be a non-empty subset of the "
                    f"graph's nodes; missing: {sorted(missing)}"
                )
            base_seed = ((scale * (100 - damping_pct)) // 100) // len(seeds)
            base_of = {
                v: base_seed if v in seeds else 0 for v in nodes_set
            }
            ranks = {
                v: scale // len(seeds) if v in seeds else 0
                for v in nodes_set
            }
        else:
            base = ((scale * (100 - damping_pct)) // 100) // n
            base_of = {v: base for v in nodes_set}
            ranks = {v: scale // n for v in nodes_set}
        for _ in range(iters):
            agg = {v: 0 for v in nodes_set}
            for r in probe:
                agg[r["d"]] += ranks[r["s"]] * int(r["w"]) // wout[r["s"]]
            ranks = {
                v: base_of[v] + damping_pct * agg[v] // 100
                for v in nodes_set
            }
        return spark.createDataFrame(
            sorted(ranks.items()), "node string, rank bigint"
        ) if probe and isinstance(probe[0]["s"], str) else (
            spark.createDataFrame(
                sorted(ranks.items()), "node bigint, rank bigint"
            )
        )
    # persisted: every iteration's contribution join AND re-base
    # references `nodes` — without the barrier the distinct shuffle
    # re-executes once per iteration per consumer (multi-reference
    # re-run footgun; released via release_caches with the rest)
    nodes = _persist(
        narrow.select(F.col("s").alias("node"))
        .unionByName(narrow.select(F.col("d").alias("node")))
        .distinct()
    )
    # |V| is the node DIMENSION (event types, domains, ...) — a
    # bounded driver count, same convention as the dedup hot list
    n_nodes = nodes.count()
    if seed_nodes is not None:
        seeds = list(dict.fromkeys(seed_nodes))
        present = nodes.where(F.col("node").isin(seeds)).count()
        if not seeds or present != len(seeds):
            raise ValueError(
                "seed_nodes must be a non-empty subset of the graph's "
                "nodes"
            )
        base_seed = ((scale * (100 - damping_pct)) // 100) // len(seeds)
        is_seed = F.col("node").isin(seeds)
        base_col = F.when(is_seed, F.lit(base_seed)).otherwise(
            F.lit(0)
        ).cast("bigint")
        init_col = F.when(
            is_seed, F.lit(scale // len(seeds))
        ).otherwise(F.lit(0)).cast("bigint")
    else:
        base = ((scale * (100 - damping_pct)) // 100) // n_nodes
        base_col = F.lit(base).cast("bigint")
        init_col = F.lit(scale // n_nodes).cast("bigint")
    wout = narrow.groupBy("s").agg(F.sum("w").alias("__wout"))
    # every iteration re-reads this joined frame; release_caches()
    # frees it (and the narrow probe cache) after materialization
    e = _persist(
        narrow.select(
            F.col("s").alias("__src"),
            F.col("d").alias("__dst"),
            F.col("w").alias("__w"),
        ).join(wout.withColumnRenamed("s", "__src"), "__src")
    )
    ranks = nodes.withColumn("rank", init_col)
    for i in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "__src"), "__src")
            # fixed truncation point 1: per-edge integer contribution
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank * __w div __wout").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            # fixed truncation point 2: the damping product
            (
                base_col
                + F.expr(
                    f"{damping_pct} * coalesce(__s, 0L) div 100"
                )
            ).cast("bigint").alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def duckdb_pagerank_ctes(
    edges_cte: str,
    iters: int = 10,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    seed_nodes: list | None = None,
) -> str:
    """DuckDB twin: CTE chain ending in ``pr(node, rank)`` that
    reproduces :func:`integer_pagerank` bit-for-bit. *edges_cte* must
    be a CTE body selecting (src, dst, w). The unrolled iterations are
    the price of exactness — a recursive CTE cannot express the
    per-iteration global re-aggregation cleanly. *seed_nodes* mirrors
    the personalized variant: teleport mass and the start distribution
    land only on the seed set."""

    def lit(v) -> str:
        # escape embedded quotes: a seed like "O'Brien" must emit
        # 'O''Brien', not malformed (injectable) SQL
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    parts = [
        f"predges AS ({edges_cte})",
        "prnodes AS (SELECT DISTINCT node FROM ("
        "SELECT src AS node FROM predges "
        "UNION ALL SELECT dst FROM predges))",
        "prn AS (SELECT count(*) AS n FROM prnodes)",
        "prwout AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout "
        "FROM predges GROUP BY src)",
    ]
    if seed_nodes is not None:
        seeds = list(dict.fromkeys(seed_nodes))
        in_seeds = f"node IN ({', '.join(lit(s) for s in seeds)})"
        n_seeds = len(seeds)
        parts.append(
            f"pr0 AS (SELECT node, CAST(CASE WHEN {in_seeds} THEN "
            f"CAST({scale} AS BIGINT) // {n_seeds} ELSE 0 END AS BIGINT) "
            "AS rank FROM prnodes)"
        )
        base = (
            f"(CASE WHEN nn.node IN ({', '.join(lit(s) for s in seeds)}) "
            f"THEN ((CAST({scale} AS BIGINT) * {100 - damping_pct}) "
            f"// 100) // {n_seeds} ELSE 0 END)"
        )
    else:
        parts.append(
            f"pr0 AS (SELECT node, CAST(CAST({scale} AS BIGINT) // n "
            "AS BIGINT) AS rank FROM prnodes, prn)"
        )
        base = (
            f"((CAST({scale} AS BIGINT) * {100 - damping_pct}) // 100) // n"
        )
    for i in range(iters):
        parts.append(
            f"pr{i + 1} AS (SELECT nn.node, "
            f"CAST({base} + ({damping_pct} * coalesce(s.c, 0)) // 100 "
            f"AS BIGINT) AS rank "
            f"FROM prnodes nn CROSS JOIN prn LEFT JOIN ("
            f"SELECT e.dst AS node, sum((r.rank * e.w) // w.wout) AS c "
            f"FROM predges e "
            f"JOIN pr{i} r ON r.node = e.src "
            f"JOIN prwout w ON w.src = e.src "
            f"GROUP BY e.dst) s ON s.node = nn.node)"
        )
    parts.append(f"pr AS (SELECT node, rank FROM pr{iters})")
    return ",\n    ".join(parts)
