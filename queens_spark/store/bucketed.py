"""Bucketed-table layout: pre-shuffle once at WRITE time, join/aggregate
with no exchange forever after.

A bucketed table hash-partitions rows into a fixed number of buckets by
a key at write time and records that layout in the catalog. Every later
join or aggregation on that key reads co-located buckets directly —
Catalyst plans a SortMergeJoin with NO Exchange on either bucketed side
(asserted in tests/test_plans.py). At 100 TB this converts the
recurring cost of a fact-fact join (two full shuffles per query) into a
one-time layout cost, the same trade Delta/Iceberg clustering makes;
pick the bucket count so one bucket ≈ one task's worth of data
(buckets = table_bytes / 128 MiB, rounded to a power of two so two
tables' bucket counts divide evenly).

Scope note: Spark ties bucketing metadata to the catalog, so bucketed
tables live beside the engine's partitioned-parquet warehouse rather
than inside it (the reference's SQLite model has no bucketing analog —
this is a pure scale extension). With the default in-memory catalog the
DATA persists at the external path while the table registration is
per-session; re-register with :func:`write_bucketed` or a Hive/Unity
metastore for cross-session reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Persist *df* as a *key*-bucketed, per-bucket-sorted parquet
    table. ``sortBy(key)`` makes each bucket file key-sorted so
    merge-joins skip (or cheapen) their sort phase."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with equal
    bucket counts Catalyst plans the merge join with ZERO exchanges —
    the write-time layout IS the shuffle."""
    return spark.table(left_table).join(spark.table(right_table), key)
