"""Random sign projections (Johnson–Lindenstrauss) with portable
integer arithmetic — the cheap pre-filter tier for nearest-neighbour
work: project e3-quantized embeddings through a fixed ±1 matrix into
a few dimensions, rank candidates by projected L2, and verify only
the short list exactly.

Why signs and not Gaussians: a Rademacher (±1) matrix satisfies the
JL lemma with the same distortion bounds (Achlioptas 2003), and the
projection becomes exact int64 adds/subtracts — reproducible across
engines, no float dot products. The sign matrix derives from the
SHA-based ``sha_const`` stream (operators/text.py), so the
Spark expression and the DuckDB oracle literal-fold the IDENTICAL
matrix by construction.

Magnitude audit: |qv_i| ≤ Q·‖x‖∞ (e3 quantization), a projected
component is ≤ in_dim·max|qv| and the projected squared distance
≤ out_dim·(2·in_dim·max|qv|)² — for unit-ish embeddings at in_dim
4096, out_dim 64: 64·(2·4096·2000)² ≈ 1.7·10¹⁶ < 2⁶³.

Scale shape: projecting is MAP-ONLY (constant-folded matrix); a
batch-query recall harness scores corpus × queries as one exploded
counter-width frame partitioned by query — no cartesian join, no
vector ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from queens_spark.operators.text import sha_const


def rp_signs(in_dim: int, out_dim: int, tag: str = "rp") -> list[list[int]]:
    """out_dim × in_dim Rademacher matrix from the deterministic
    SHA stream — both engines fold the same Python ints."""
    return [
        [
            1 if sha_const(tag, j * in_dim + i, 2) == 1 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def project_ints(ints: list[int], signs: list[list[int]]) -> list[int]:
    """Driver-side twin of :func:`rp_project` for query literals."""
    return [
        sum(x * s for x, s in zip(ints, row)) for row in signs
    ]


def rp_project(vec_col: Column | str, signs: list[list[int]]) -> Column:
    """Project an e3-quantized embedding column through the sign
    matrix: array<bigint> of out_dim exact components, map-only."""
    from queens_spark.operators.similarity import lit_array, quantize

    qv = quantize(vec_col)
    comps = []
    for row in signs:
        lits = lit_array(row, "bigint")
        comps.append(
            F.aggregate(
                F.zip_with(qv, lits, lambda x, s: x * s),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            )
        )
    return F.array(*comps)


def duckdb_rp_project(qv_expr: str, signs: list[list[int]]) -> str:
    """DuckDB twin of :func:`rp_project` over a quantized list expr."""
    comps = []
    for row in signs:
        lits = "[" + ", ".join(str(int(s)) for s in row) + "]"
        comps.append(
            f"list_sum(list_transform(range(1, len({qv_expr}) + 1), "
            f"i -> {qv_expr}[i] * ({lits})[i]))"
        )
    return "[" + ", ".join(comps) + "]"


def sq_dist_to_lits(vec: Column, lits: list[int]) -> Column:
    """Σ(x−c)² between an integer array column and a constant list."""
    from queens_spark.operators.similarity import lit_array

    arr = lit_array(lits, "bigint")
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
