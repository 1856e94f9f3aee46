"""Z-order (Morton) clustering: multi-column data layout for min/max
scan pruning.

Range-partitioning by ONE column gives perfect pruning on that column
and none on any other; interleaving the bits of two columns into one
Morton key makes file/row-group min-max ranges tight on BOTH — a 2-D
box predicate then skips most files, the same layout trade Delta's
OPTIMIZE ZORDER and Iceberg's sort orders make. This matters at
100 TB because parquet footer stats are the first pruning tier: a
layout whose per-file bounding boxes are small turns a selective
2-column predicate into a handful of file reads.

Everything is integer bit arithmetic (shifts/masks), identical in
Spark and DuckDB, so the key itself is oracle-gradable (q94); the
locality claim is tested directly by comparing per-partition bounding
boxes of a z-ordered vs a single-column layout
(tests/test_zorder.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bits interleaved per column; 2×21 = 42-bit keys stay far from the
#: int64 sign bit
ZBITS = 21


def zorder_key(c1: Column | str, c2: Column | str, bits: int = ZBITS) -> Column:
    """Morton-interleave the low *bits* of two NON-NEGATIVE integer
    columns: bit i of c1 lands at position 2i, bit i of c2 at 2i+1.
    Values are clamped into [0, 2^bits) (min/max pruning only needs
    order-preservation inside the domain; clamping keeps outliers from
    wrapping into the middle of the range)."""
    if bits * 2 >= 63:
        raise ValueError(f"bits={bits} overflows int64 interleave")
    cap = F.lit((1 << bits) - 1).cast("bigint")

    def clamp(c):
        col = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        return F.least(F.greatest(col, F.lit(0).cast("bigint")), cap)

    a, b = clamp(c1), clamp(c2)
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def duckdb_zorder_key(c1: str, c2: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zorder_key` (same clamp, same interleave)."""
    cap = (1 << bits) - 1

    def clamp(c):
        return f"least(greatest(CAST({c} AS BIGINT), 0), {cap})"

    a, b = clamp(c1), clamp(c2)
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int | None = None,
    bits: int = ZBITS,
) -> None:
    """Write *df* clustered by the (c1, c2) Morton key: range-partition
    on the key (each output file covers one contiguous z-range, so its
    (c1, c2) bounding box is small) and sort within partitions so
    row-group stats are tight too. The key column itself is dropped —
    it is a layout device, not data."""
    z = zorder_key(c1, c2, bits).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(n_files, "__z")
        if n_files else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
