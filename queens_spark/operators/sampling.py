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
