"""Rank fusion: combine retrieval pools from heterogeneous scorers.

The hybrid-retrieval queries (q77, q111) each inline the same motif —
rank two TakeOrdered pools, full-outer-join on the document id, sum
scaled-integer reciprocal ranks. This module is that motif as a
reusable operator, so Engine.hybrid_search (and any future third
pool: phrase, proximity, recency) composes instead of copy-pasting.

Reciprocal-rank fusion is used because it needs NO score calibration
across pools: BM25's integer e5 scores and ADC's integer distances
never meet — only their ranks do, and ⌊1e12/(rrf_k + rank)⌋ is exact
integer arithmetic (summation-order-free, bit-portable), the house
rule for cross-engine comparability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Fixed-point scale for fused RRF scores (q77/q111 convention).
RRF_SCALE = 1_000_000_000_000


def rrf_fuse(
    pools: list[tuple[DataFrame, str, bool]],
    id_col: str,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Fuse ranked *pools* into one top-*k* by scaled-integer
    reciprocal-rank fusion.

    Each pool is ``(df, score_col, ascending)`` — *df* a BOUNDED
    candidate frame (a TakeOrdered head, never a corpus) carrying
    *id_col* and *score_col*; *ascending* True when smaller is better
    (distances) and False when larger is better (scores). Ties break
    on the id everywhere, so fusion is deterministic at any
    parallelism.

    Scale shape: each pool is ranked by a window over ≤|pool| rows;
    the fusion is |pools|−1 full-outer joins over ≤Σ|pool| rows and a
    TakeOrdered finish — nothing corpus-sized moves. Returns
    (*id_col*, rrf_e12, plus one ``rank_i`` column per pool, NULL
    when the pool missed the doc)."""
    if len(pools) < 2:
        raise ValueError(f"need >= 2 pools to fuse, got {len(pools)}")
    ranked = []
    for i, (df, score_col, asc) in enumerate(pools):
        order = (
            F.asc(score_col) if asc else F.desc(score_col),
            F.asc(id_col),
        )
        w = Window.orderBy(*order)
        ranked.append(
            df.select(
                id_col,
                F.row_number().over(w).cast("bigint").alias(f"rank_{i}"),
            )
        )
    fused = ranked[0]
    for r in ranked[1:]:
        fused = fused.join(r, id_col, "full_outer")
    score = None
    for i in range(len(pools)):
        part = F.coalesce(
            F.expr(f"{RRF_SCALE} div ({int(rrf_k)} + rank_{i})"),
            F.lit(0),
        )
        score = part if score is None else (score + part)
    return (
        fused.select(
            id_col,
            score.alias("rrf_e12"),
            *[f"rank_{i}" for i in range(len(pools))],
        )
        .orderBy(F.desc("rrf_e12"), F.asc(id_col))
        .limit(k)
    )


def mmr_rerank(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    pool: int = 50,
    k: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal Marginal Relevance diversity rerank — the standard
    redundancy-aware retrieval finish (RAG context selection, search
    diversification) Spark has no operator for: greedily pick *k*
    results from a relevance *pool*, each maximizing
    ``lam·relevance − (1−lam)·max_similarity_to_already_selected``
    (max over the empty set is 0, so the first pick is the most
    relevant). Without it, a near-duplicate-heavy corpus fills the
    whole top-k with copies of one document.

    Plan shape: relevance (exact quantized-integer cosine to the
    query — the q30 arithmetic) is computed DISTRIBUTED over the
    corpus, and one TakeOrdered keeps the *pool* head; the greedy
    selection is O(k·pool·dim) integer/double arithmetic over the
    COLLECTED pool — the right shape at any corpus size because the
    pool is bounded by construction (it already survived a top-N).
    Every similarity is an exact integer dot over the quantized
    vectors divided as IEEE doubles (Python float == DuckDB double ==
    Spark double, the probe_cells convention), ties break (score
    DESC, id ASC) — so an unrolled-SQL twin reproduces the selection
    bit-for-bit.

    Returns (*id_col*, relevance, mmr_score, mmr_rank), mmr_rank
    1..k in selection order."""
    import math

    from queens_spark.operators.similarity import (
        QUANT,
        cosine_from_ints,
        int_dot,
        int_norm2,
        lit_array,
        quantize,
    )

    if not 0.0 <= float(lam) <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k < 1 or pool < k:
        raise ValueError(f"need pool >= k >= 1, got pool={pool} k={k}")
    qq = [int(math.floor(float(x) * QUANT)) for x in query_vec]
    qlit = lit_array(qq, "bigint")
    head = (
        corpus.select(
            F.col(id_col),
            quantize(vec_col).alias("__q"),
        )
        .withColumn("__n2", int_norm2(F.col("__q")))
        .withColumn(
            "__rel",
            cosine_from_ints(
                int_dot(F.col("__q"), qlit),
                F.col("__n2"),
                F.lit(sum(x * x for x in qq)).cast("bigint"),
            ),
        )
        .orderBy(F.desc("__rel"), F.asc(id_col))
        .limit(int(pool))
        .collect()
    )
    cands = [
        (int(r[id_col]), [int(x) for x in r["__q"]],
         int(r["__n2"]), float(r["__rel"]))
        for r in head
    ]
    bad = [i for i, _, n2, _ in cands if n2 == 0]
    if bad:
        raise ValueError(
            f"pool vectors {bad[:5]} have zero quantized norm; "
            "cosine is undefined — screen them out upstream"
        )
    lam = float(lam)
    selected: list[tuple[int, float, float]] = []  # (id, rel, mmr)
    chosen: list[tuple[list[int], float]] = []     # (q, sqrt(n2))
    remaining = list(cands)
    while remaining and len(selected) < int(k):
        best = None
        for cid, cq, cn2, crel in remaining:
            sn = math.sqrt(float(cn2))
            # max over the EMPTY set is 0 (first pick = most relevant);
            # over a non-empty set it is the true max, negatives kept
            maxsim = max(
                (
                    float(sum(a * b for a, b in zip(cq, sq))) / (sn * ssn)
                    for sq, ssn in chosen
                ),
                default=0.0,
            )
            score = lam * crel - (1.0 - lam) * maxsim
            if best is None or score > best[0] or (
                score == best[0] and cid < best[1]
            ):
                best = (score, cid, cq, cn2, crel)
        score, cid, cq, cn2, crel = best
        selected.append((cid, crel, score))
        chosen.append((cq, math.sqrt(float(cn2))))
        remaining = [c for c in remaining if c[0] != cid]
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [
            (cid, crel, score, i + 1)
            for i, (cid, crel, score) in enumerate(selected)
        ],
        f"{id_col} bigint, relevance double, mmr_score double, "
        "mmr_rank bigint",
    )
