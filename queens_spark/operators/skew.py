"""Skew-mitigation join: salting for hot keys.

AQE's skew-join (enabled in session.py) splits oversized SORT-MERGE
partitions at runtime, but it only engages when statistics see the
skew and cannot help an aggregation-free shuffle whose single hottest
key exceeds one task's memory. Salting is the explicit, planner-
independent fix: split every hot key's rows across ``n_salts``
sub-partitions by salting the BIG side's join key, and replicate the
OTHER side once per salt so every sub-partition can still find its
match. The shuffle's worst bucket shrinks by ~n_salts at the cost of
an n_salts× blow-up of the replicated side — the right trade exactly
when that side is too big to broadcast but far smaller than the big
side's hot keys.

Determinism: the salt is a pure function of a caller-designated
unique column (portable 64-bit hash mod n_salts), so re-runs and
retries produce identical partitioning — no rand() in the plan.
Results are exactly a plain join's (asserted by the q93 oracle and a
property test); only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join *big* (skewed side) with *other* on *on*, spreading each
    join key over *n_salts* shuffle sub-partitions.

    *salt_from* names a column of *big* whose hash spreads rows (any
    high-cardinality column — a row id, an event id; NOT the join key,
    whose hot values are the problem being solved). *other* is
    replicated n_salts× — keep it the smaller side. ``how`` supports
    the equi-join types where replication is sound for the replicated
    side (inner / left semi-ish shapes via inner; left outer of the
    BIG side works because every big row keeps exactly its salt's
    replica of the match)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(right/full would multiply unmatched replicated rows)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    b = big.withColumn(SALT_COL, salt)
    o = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return b.join(o, keys + [SALT_COL], how).drop(SALT_COL)
