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
