"""Deterministic sampling for training-data pipelines.

``df.sample()`` draws from a per-task RNG: reruns, retries, and
repartitions change the selected rows, which breaks reproducibility
and any join against a previous run's sample. Hash sampling decides
per KEY — the same key is always in or out, on any engine, at any
parallelism — so samples are stable, joinable, and auditable.

The bucket arithmetic is pure int64 modular math (multiplicative
hashing mod a prime), identical in Spark and the DuckDB oracle; no
overflow at any id scale because the key is reduced mod p first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_P = 1_000_000_007
HASH_A = 2_654_435_761  # Knuth's multiplicative constant
BUCKETS = 10_000        # sampling resolution: basis points


def hash_bucket(key: Column | str, salt: int = 0) -> Column:
    """Stable per-key bucket in [0, BUCKETS): ((key mod p)·A + salt)
    mod p mod BUCKETS."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        (c.cast("bigint") % HASH_P * (HASH_A % HASH_P) + F.lit(salt)) % HASH_P
    ) % BUCKETS


def duckdb_hash_bucket(expr: str, salt: int = 0) -> str:
    return (
        f"((CAST({expr} AS BIGINT) % {HASH_P}) * {HASH_A % HASH_P} + {salt}) "
        f"% {HASH_P} % {BUCKETS}"
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction_bp: int, salt: int = 0
) -> DataFrame:
    """Keep rows whose key hashes below *fraction_bp* basis points
    (2000 → a stable 20% sample)."""
    return df.where(hash_bucket(key_col, salt) < fraction_bp)


def hash_split(
    key: Column | str,
    splits: dict[str, int],
    salt: int = 0,
) -> Column:
    """Deterministic dataset-split assignment: *splits* maps split
    name → basis points (must sum to ≤ BUCKETS; any remainder gets
    NULL, i.e. held out). The same key always lands in the same split
    — across reruns, engines, and parallelism — so train/val/test
    membership is stable and leak-free by construction, and a JOIN
    against any prior run's split agrees row-for-row.

    Names are assigned in sorted order over contiguous bucket ranges,
    so the mapping is reproducible from the dict alone."""
    total = sum(splits.values())
    if total > BUCKETS:
        raise ValueError(f"split fractions sum to {total} > {BUCKETS} bp")
    b = hash_bucket(key, salt)
    expr = F.lit(None).cast("string")
    hi = 0
    for name, bp in sorted(splits.items()):
        lo, hi = hi, hi + bp
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return expr


def duckdb_hash_split(expr: str, splits: dict[str, int], salt: int = 0) -> str:
    b = duckdb_hash_bucket(expr, salt)
    cases, hi = [], 0
    for name, bp in sorted(splits.items()):
        lo, hi = hi, hi + bp
        cases.append(f"WHEN __b >= {lo} AND __b < {hi} THEN '{name}'")
    return (
        "(SELECT CASE " + " ".join(cases) + " ELSE NULL END "
        f"FROM (SELECT {b} AS __b) __hs)"
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_bp: dict[str, int],
    default_bp: int = 0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum sampling rates (the data-mixing primitive: e.g.
    keep 50% of English, 25% of German, drop the rest) with the same
    stable per-key decision."""
    threshold = F.lit(default_bp)
    for value, bp in sorted(fractions_bp.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(bp)).otherwise(
            threshold
        )
    return df.where(hash_bucket(key_col, salt) < threshold)
