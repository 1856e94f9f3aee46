"""Persisted KMV sketch store — distinct/overlap profiles that
OUTLIVE the corpus scan that built them.

The point of a mergeable sketch is incremental maintenance: profile
100 TB once, then keep the profile current by sketching only each new
batch and merging k-row tables. This store gives the KMV tier
(operators/kmv.py) the same artifact lifecycle the vector/text
indexes have:

- ``build_sketch_store`` runs the one corpus-scale pass (distinct +
  two-phase ordinal) and persists the per-group bottom-k sketch as a
  versioned parquet + a manifest entry (params, version, token list);
- ``append`` sketches ONLY the new batch, merges with the stored
  k-rows (the KMV closure property: bottom-k of A∪B ⊆ bottom-k(A) ∪
  bottom-k(B)), and flips a new version — bit-identical to a
  from-scratch rebuild on the union (tested), at O(batch) cost;
- appends accept idempotency tokens (the streaming exactly-once
  contract shared with the ledger and indexes): a replayed token
  no-ops;
- every serve (distinct estimates, pairwise union/intersection
  matrices) reads the k·groups-row artifact — the corpus is never
  touched again.

Manifest treatment follows the house pattern (artifacts first,
atomic manifest flip last, monotonic version counter; after each
successful flip the superseded version dir AND any crashed-write
leftovers are GC'd — between a crash and the next write, fsck
reports them as orphans).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from queens_spark.operators.kmv import DEFAULT_K, kmv_sketches

MANIFEST_NAME = "sketch_store.json"


def _manifest_path(store_dir: str) -> str:
    return os.path.join(store_dir, MANIFEST_NAME)


def _read_manifest(store_dir: str) -> dict:
    try:
        with open(_manifest_path(store_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_manifest(store_dir: str, entries: dict) -> None:
    os.makedirs(store_dir, exist_ok=True)
    tmp = _manifest_path(store_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(store_dir))


def _reduce_to_k(sk: DataFrame, k: int) -> DataFrame:
    """Bottom-k distinct values per group over a SKETCH-SCALE frame
    (≤ 2k rows per group after a merge) — a per-group window is the
    right tool here; the corpus-scale ranking lives in kmv_sketches."""
    w = Window.partitionBy("g").orderBy("v")
    return (
        sk.select("g", "v")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select("g", "v")
    )


class SketchStore:
    def __init__(self, spark: SparkSession, store_dir: str, name: str,
                 entry: dict):
        self.spark = spark
        self.store_dir = store_dir
        self.name = name
        self.entry = entry
        self.group_col = entry["group_col"]
        self.k = int(entry["k"])

    def sketches(self) -> DataFrame:
        """(group_col, v) — the stored bottom-k rows, corpus untouched."""
        return self.spark.read.parquet(self.entry["path"]).select(
            F.col("g").alias(self.group_col), "v"
        )

    def distinct_estimates(self) -> DataFrame:
        from queens_spark.operators.kmv import kmv_distinct_estimates

        return kmv_distinct_estimates(
            self.sketches(), self.group_col, self.k
        )

    def pair_overlap(self) -> DataFrame:
        from queens_spark.operators.kmv import kmv_pair_overlap

        return kmv_pair_overlap(self.sketches(), self.group_col, self.k)

    def describe(self) -> dict:
        return {
            "name": self.name,
            "group_col": self.group_col,
            "k": self.k,
            "version": int(self.entry["version"]),
            "n_groups": self.sketches()
            .select(self.group_col)
            .distinct()
            .count(),
            "applied_tokens": len(self.entry.get("applied_tokens") or []),
        }


def _write_version(
    store_dir: str, name: str, version: int, sk: DataFrame
) -> str:
    path = os.path.join(store_dir, name, f"v{version}", "sketch")
    sk.write.mode("overwrite").parquet(path)
    return path


def _gc_superseded(store_dir: str, name: str, keep_version: int) -> None:
    base = os.path.join(store_dir, name)
    if not os.path.isdir(base):
        return
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{keep_version}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def build_sketch_store(
    df: DataFrame,
    group_col: str,
    key_col: str,
    store_dir: str,
    name: str,
    k: int = DEFAULT_K,
    fingerprint: str | None = None,
) -> SketchStore:
    """One corpus pass → persisted per-group sketch. Overwrites any
    prior store of the same name (a fresh build supersedes history —
    use :func:`append_sketch_store` to extend one). *fingerprint*
    (e.g. the source file stat) lets :func:`build_or_load_sketch_store`
    detect a moved corpus instead of serving stale sketches."""
    spark = df.sparkSession
    sk = kmv_sketches(df, group_col, key_col, k).select(
        F.col(group_col).alias("g"), "v"
    )
    entries = _read_manifest(store_dir)
    version = int(entries.get(name, {}).get("version", 0)) + 1
    path = _write_version(store_dir, name, version, sk)
    entries[name] = {
        "group_col": group_col,
        "key_col": key_col,
        "k": int(k),
        "version": version,
        "path": path,
        "applied_tokens": [],
        "fingerprint": fingerprint,
    }
    _write_manifest(store_dir, entries)
    _gc_superseded(store_dir, name, version)
    return SketchStore(spark, store_dir, name, entries[name])


def build_or_load_sketch_store(
    df: DataFrame,
    group_col: str,
    key_col: str,
    store_dir: str,
    name: str,
    k: int = DEFAULT_K,
    fingerprint: str | None = None,
    spark: SparkSession | None = None,
) -> SketchStore:
    """Serve the stored sketch when params AND fingerprint match;
    rebuild otherwise — the build_or_load posture of the vector/text
    indexes: the first run per corpus pays the scan, every later run
    (any session) is a k·groups-row artifact read. *df* may be a
    zero-arg callable returning the source frame (pass *spark*
    alongside): the warm-serve path then skips constructing the
    corpus plan entirely."""
    if callable(df) and spark is None:
        df = df()
    if not callable(df):
        spark = df.sparkSession
    entries = _read_manifest(store_dir)
    entry = entries.get(name)
    if (
        entry
        and entry.get("group_col") == group_col
        and entry.get("key_col") == key_col
        and int(entry.get("k", -1)) == int(k)
        and entry.get("fingerprint") == fingerprint
        and os.path.exists(entry.get("path", ""))
    ):
        return SketchStore(spark, store_dir, name, entry)
    return build_sketch_store(
        df() if callable(df) else df, group_col, key_col, store_dir,
        name, k=k, fingerprint=fingerprint,
    )


def load_sketch_store(
    spark: SparkSession, store_dir: str, name: str
) -> SketchStore:
    entries = _read_manifest(store_dir)
    if name not in entries:
        raise KeyError(f"no sketch store named {name!r} in {store_dir}")
    return SketchStore(spark, store_dir, name, entries[name])


def append_sketch_store(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    name: str,
    token: str | None = None,
) -> SketchStore:
    """Merge the NEW batch's sketch into the stored one — O(batch)
    corpus work plus a k-row reduce, bit-identical to rebuilding on
    the union (the KMV closure property). A *token* already applied
    no-ops (exactly-once under redelivery)."""
    entries = _read_manifest(store_dir)
    if name not in entries:
        raise KeyError(f"no sketch store named {name!r} in {store_dir}")
    entry = entries[name]
    if token is not None and token in (entry.get("applied_tokens") or []):
        return SketchStore(spark, store_dir, name, entry)
    batch = kmv_sketches(
        df, entry["group_col"], entry["key_col"], int(entry["k"])
    ).select(F.col(entry["group_col"]).alias("g"), "v")
    stored = spark.read.parquet(entry["path"])
    merged = _reduce_to_k(stored.unionByName(batch), int(entry["k"]))
    version = int(entry["version"]) + 1
    path = _write_version(store_dir, name, version, merged)
    entry["version"] = version
    entry["path"] = path
    if token is not None:
        entry["applied_tokens"] = list(
            entry.get("applied_tokens") or []
        ) + [str(token)]
    entries[name] = entry
    _write_manifest(store_dir, entries)
    _gc_superseded(store_dir, name, version)
    return SketchStore(spark, store_dir, name, entry)


def mark_retired_pending_rebuild(store_dir: str, name: str) -> bool:
    """Flag the sketch as retired-against-but-not-rebuilt: KMV
    bottom-k sets genuinely cannot subtract an element (the per-doc
    hashes below the kept k are gone), so a takedown leaves the
    sketch over-counting the retired mass until a rebuild. The flag
    makes that staleness VISIBLE — ``Engine.status`` reports it
    instead of silence — and :func:`build_sketch_store` clears it
    (a rebuild overwrites the whole entry). Returns True when a live
    entry was flagged."""
    entries = _read_manifest(store_dir)
    if name not in entries:
        return False
    entries[name]["retired_pending_rebuild"] = True
    _write_manifest(store_dir, entries)
    return True


def clear_applied_tokens(store_dir: str, name: str) -> int:
    """Drop the idempotency-token list — ONLY safe once the ledger has
    compacted (a post-compact replay re-screens to accepted=0, so the
    sketch append never fires; the same argument as the index stores).
    Returns how many tokens were cleared."""
    entries = _read_manifest(store_dir)
    if name not in entries:
        return 0
    n = len(entries[name].get("applied_tokens") or [])
    if n:
        entries[name]["applied_tokens"] = []
        _write_manifest(store_dir, entries)
    return n
