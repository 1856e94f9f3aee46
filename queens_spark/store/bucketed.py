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
per-session; :func:`write_bucketed` therefore records (table, location,
key, buckets, schema) in a warehouse manifest, and
:func:`restore_bucketed` re-creates the catalog entries — with the
bucketing spec, so the zero-exchange property survives — in any new
session without rewriting a byte. A Hive/Unity metastore subsumes the
manifest where one exists.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "bucketed_manifest.json"


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def _table_location(spark: SparkSession, table: str) -> str:
    for row in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if row["col_name"].strip() == "Location":
            return row["data_type"].strip()
    raise ValueError(f"no Location for table {table!r}")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    manifest_dir: str | None = None,
) -> None:
    """Persist *df* as a *key*-bucketed, per-bucket-sorted parquet
    table. ``sortBy(key)`` makes each bucket file key-sorted so
    merge-joins skip (or cheapen) their sort phase.

    With *manifest_dir*, the layout is also recorded in
    ``bucketed_manifest.json`` there, so a later session can
    :func:`restore_bucketed` the registration (data + bucketing spec)
    without rewriting."""
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
    if manifest_dir:
        spark = df.sparkSession
        mpath = os.path.join(manifest_dir, MANIFEST_NAME)
        entries = {}
        try:
            with open(mpath) as fh:
                entries = json.load(fh)
        except (OSError, ValueError):
            pass
        entries[table] = {
            "location": _table_location(spark, table),
            "key": key,
            "n_buckets": n_buckets,
            "schema": _schema_ddl(df),
        }
        os.makedirs(manifest_dir, exist_ok=True)
        tmp = mpath + "__tmp"
        with open(tmp, "w") as fh:
            json.dump(entries, fh, sort_keys=True)
        os.replace(tmp, mpath)


def restore_bucketed(spark: SparkSession, manifest_dir: str) -> list[str]:
    """Re-register every manifest-recorded bucketed table into THIS
    session's catalog (idempotent: already-registered tables are left
    alone). The CREATE TABLE carries the CLUSTERED BY spec, so joins
    on the bucket key plan with zero exchanges in the new session —
    the write-time shuffle is never repaid. Returns the table names
    newly registered."""
    mpath = os.path.join(manifest_dir, MANIFEST_NAME)
    try:
        with open(mpath) as fh:
            entries = json.load(fh)
    except (OSError, ValueError):
        return []
    restored = []
    for table, e in sorted(entries.items()):
        if spark.catalog.tableExists(table):
            continue
        loc = e["location"].replace("'", "''")
        spark.sql(
            f"CREATE TABLE {table} ({e['schema']}) USING parquet "
            f"CLUSTERED BY (`{e['key']}`) SORTED BY (`{e['key']}`) "
            f"INTO {int(e['n_buckets'])} BUCKETS "
            f"LOCATION '{loc}'"
        )
        restored.append(table)
    return restored


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with equal
    bucket counts Catalyst plans the merge join with ZERO exchanges —
    the write-time layout IS the shuffle."""
    return spark.table(left_table).join(spark.table(right_table), key)
