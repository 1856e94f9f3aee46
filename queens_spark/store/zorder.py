"""Z-order (Morton) clustering: multi-column data layout for min/max
scan pruning.

Range-partitioning by ONE column gives perfect pruning on that column
and none on any other; interleaving the bits of n columns into one
Morton key makes file/row-group min-max ranges tight on ALL of them —
an n-D box predicate then skips most files, the same layout trade
Delta's OPTIMIZE ZORDER and Iceberg's sort orders make. This matters
at 100 TB because parquet footer stats are the first pruning tier: a
layout whose per-file bounding boxes are small turns a selective
multi-column predicate into a handful of file reads.

Everything is integer bit arithmetic (shifts/masks), identical in
Spark and DuckDB, so the key itself is oracle-gradable (q94 2-col,
q106 3-col); the locality claim is tested directly by comparing
per-partition bounding boxes of a z-ordered vs a single-column layout
(tests/test_zorder.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bits interleaved per column in the 2-column layout; 2×21 = 42-bit
#: keys stay far from the int64 sign bit
ZBITS = 21


def default_zbits(n_cols: int) -> int:
    """Per-column bit budget for an n-column interleave: the largest
    *bits* with every interleaved position < 63 (bit 63 is the int64
    sign bit; max position is n·bits − 1)."""
    return 63 // n_cols


def zorder_key_n(
    cols: list[Column | str], bits: int | None = None
) -> Column:
    """Morton-interleave the low *bits* of n NON-NEGATIVE integer
    columns: bit i of column j lands at position n·i + j. Values are
    clamped into [0, 2^bits) (min/max pruning only needs
    order-preservation inside the domain; clamping keeps outliers
    from wrapping into the middle of the range). *bits* defaults to
    :func:`default_zbits` — the per-column budget shrinks as columns
    are added, the standard z-order resolution trade."""
    n = len(cols)
    if n < 2:
        raise ValueError(f"need >= 2 columns to interleave, got {n}")
    if bits is None:
        bits = default_zbits(n)
    if n * bits > 63:
        raise ValueError(
            f"bits={bits} over {n} columns overflows int64 interleave "
            f"(max {default_zbits(n)})"
        )
    cap = F.lit((1 << bits) - 1).cast("bigint")

    def clamp(c):
        col = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        return F.least(F.greatest(col, F.lit(0).cast("bigint")), cap)

    clamped = [clamp(c) for c in cols]
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(clamped):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), n * i + j
            )
    return out


def zorder_key(c1: Column | str, c2: Column | str, bits: int = ZBITS) -> Column:
    """Two-column :func:`zorder_key_n` (bit i of c1 at 2i, of c2 at
    2i+1) — kept as the common case with its historical default."""
    if bits * 2 >= 63:
        raise ValueError(f"bits={bits} overflows int64 interleave")
    return zorder_key_n([c1, c2], bits)


def duckdb_zorder_key_n(cols: list[str], bits: int | None = None) -> str:
    """DuckDB twin of :func:`zorder_key_n` (same clamp, same
    interleave, same default budget)."""
    n = len(cols)
    if bits is None:
        bits = default_zbits(n)
    cap = (1 << bits) - 1

    def clamp(c):
        return f"least(greatest(CAST({c} AS BIGINT), 0), {cap})"

    clamped = [clamp(c) for c in cols]
    terms = []
    for i in range(bits):
        for j, c in enumerate(clamped):
            terms.append(f"((({c} >> {i}) & 1) << {n * i + j})")
    return "(" + " + ".join(terms) + ")"


def duckdb_zorder_key(c1: str, c2: str, bits: int = ZBITS) -> str:
    """Two-column :func:`duckdb_zorder_key_n`."""
    return duckdb_zorder_key_n([c1, c2], bits)


def write_zordered_n(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int | None = None,
) -> None:
    """Write *df* clustered by the n-column Morton key: range-partition
    on the key (each output file covers one contiguous z-range, so its
    n-D bounding box is small) and sort within partitions so row-group
    stats are tight too. The key column itself is dropped — it is a
    layout device, not data."""
    z = zorder_key_n(cols, bits).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(n_files, "__z")
        if n_files else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int | None = None,
    bits: int = ZBITS,
) -> None:
    """Two-column :func:`write_zordered_n`."""
    write_zordered_n(df, path, [c1, c2], n_files, bits)
