"""Stored dedup cluster map: the near-duplicate component assignment
and per-cluster canonical choice as a persisted warehouse artifact.

The dedup front-end (operators/dedup.py: capped inverted index ∪
MinHash-LSH bands → connected components) is the most expensive pass
in the catalog, and every downstream consumer — duplicate filtering,
canonical selection, cluster-aware splits, leakage audits, cluster
histograms — recomputes it from the corpus. At 100 TB that's the same
multi-hour job run five times. This module gives the dedup tier the
posture the ANN and lexical tiers already have (store/vector_index.py,
store/text_index.py): pay the clustering ONCE, persist the
counter-width outputs, and serve every consumer from pure artifact
reads with staleness fingerprints.

Artifacts per map (versioned dir + atomic manifest flip, the shared
store convention):

- ``members``: one row per document — (id, component_id, quality).
  Bounded at corpus-row width, but each row is three scalars.
- ``canonical``: one row per component — (component_id, best_doc_id,
  best_quality, n_members); the quality-aware keep-list.
- ``edges``: the normalized distinct near-dup/exact-copy edge list
  (a < b) — dedup-output-sized (a few % of a deduplicated corpus);
  what the triangle/leakage audits consume.

The map stores its build params (shingle n, Jaccard threshold) and the
corpus fingerprint; ``build_or_load_cluster_map`` rebuilds on either
mismatch instead of silently serving stale clusters.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from queens_spark.store.vector_index import source_fingerprint  # noqa: F401

MANIFEST_NAME = "cluster_map_manifest.json"

__all__ = [
    "build_cluster_map",
    "load_cluster_map",
    "build_or_load_cluster_map",
    "ClusterMap",
]


def _manifest_path(map_dir: str) -> str:
    return os.path.join(map_dir, MANIFEST_NAME)


def _read_manifest(map_dir: str) -> dict:
    try:
        with open(_manifest_path(map_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_manifest(map_dir: str, entries: dict) -> None:
    os.makedirs(map_dir, exist_ok=True)
    tmp = _manifest_path(map_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(map_dir))


def build_cluster_map(
    df: DataFrame,
    text_col: str,
    id_col: str,
    map_dir: str,
    n: int = 3,
    threshold: float = 0.8,
    fingerprint: str | None = None,
) -> "ClusterMap":
    """One clustering pass → persisted members + canonical tables.
    The edge generation and CC are exactly the inline operators
    (q36/q60 semantics); what's new is only WHERE the result lives."""
    from queens_spark.operators.dedup import (
        _persist,
        connected_components,
        dedup_edges,
    )
    from queens_spark.operators.text import quality_score

    manifest = _read_manifest(map_dir)
    version = int(manifest.get("next_version", 1))
    vdir = os.path.join(map_dir, f"v{version:06d}")
    # a build that crashed before its manifest flip leaves this vdir
    # orphaned (next_version never advanced) — clear it so the retry
    # can rewrite; the manifest never pointed at it, so nothing served
    if os.path.exists(vdir):
        import shutil

        shutil.rmtree(vdir, ignore_errors=True)

    # the edge pipeline feeds both the CC and the persisted edge
    # artifact — persist so the shingle/LSH front-end executes once
    edges = _persist(dedup_edges(df, text_col, id_col, n=n, threshold=threshold))
    comps = connected_components(df, edges, id_col)
    qual = df.select(id_col, quality_score(text_col).alias("quality"))
    members = comps.join(qual, id_col)
    members.write.mode("errorifexists").parquet(os.path.join(vdir, "members"))
    (
        edges.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .distinct()
        .write.mode("errorifexists")
        .parquet(os.path.join(vdir, "edges"))
    )

    spark = df.sparkSession
    stored = spark.read.parquet(os.path.join(vdir, "members"))
    canonical = (
        stored.groupBy("component_id")
        .agg(
            F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component_id",
            (-F.col("best.nid")).cast("bigint").alias("best_doc_id"),
            F.col("best.q").alias("best_quality"),
            "n_members",
        )
    )
    canonical.write.mode("errorifexists").parquet(
        os.path.join(vdir, "canonical")
    )
    manifest.update(
        {
            "current": {
                "version": version,
                "dir": f"v{version:06d}",
                "id_col": id_col,
                "n": int(n),
                "threshold": float(threshold),
                "fingerprint": fingerprint,
            },
            "next_version": version + 1,
        }
    )
    _write_manifest(map_dir, manifest)
    _gc_superseded(map_dir, keep=f"v{version:06d}")
    return ClusterMap(spark, map_dir)


def _gc_superseded(map_dir: str, keep: str) -> None:
    import shutil

    for d in os.listdir(map_dir):
        if d.startswith("v") and d != keep and os.path.isdir(
            os.path.join(map_dir, d)
        ):
            shutil.rmtree(os.path.join(map_dir, d), ignore_errors=True)


def load_cluster_map(
    spark: SparkSession, map_dir: str, expected_fingerprint: str | None = None
) -> "ClusterMap":
    m = _read_manifest(map_dir)
    if not m.get("current"):
        raise FileNotFoundError(f"no cluster map at {map_dir}")
    if (
        expected_fingerprint is not None
        and m["current"].get("fingerprint") != expected_fingerprint
    ):
        raise ValueError("stored cluster map is stale for this corpus")
    return ClusterMap(spark, map_dir)


def build_or_load_cluster_map(
    df: DataFrame,
    text_col: str,
    id_col: str,
    map_dir: str,
    fingerprint: str | None = None,
    n: int = 3,
    threshold: float = 0.8,
) -> "ClusterMap":
    """Serve the stored map when fingerprint AND params match; rebuild
    otherwise — first run pays the clustering, every later session
    reads counter-width artifacts."""
    try:
        cm = load_cluster_map(
            df.sparkSession, map_dir, expected_fingerprint=fingerprint
        )
        e = cm.entry
        if int(e["n"]) != int(n) or float(e["threshold"]) != float(threshold):
            raise ValueError("stored cluster map has different params")
        return cm
    except (FileNotFoundError, ValueError):
        return build_cluster_map(
            df, text_col, id_col, map_dir,
            n=n, threshold=threshold, fingerprint=fingerprint,
        )


class ClusterMap:
    def __init__(self, spark: SparkSession, map_dir: str):
        self.spark = spark
        self.map_dir = map_dir
        self.manifest = _read_manifest(map_dir)
        self.entry = self.manifest["current"]

    def _vdir(self) -> str:
        return os.path.join(self.map_dir, self.entry["dir"])

    def members(self) -> DataFrame:
        """(id, component_id, quality) — pure artifact read."""
        return self.spark.read.parquet(os.path.join(self._vdir(), "members"))

    def canonical(self) -> DataFrame:
        """(component_id, best_doc_id, best_quality, n_members)."""
        return self.spark.read.parquet(
            os.path.join(self._vdir(), "canonical")
        )

    def edges(self) -> DataFrame:
        """Normalized distinct dedup edges (a < b)."""
        return self.spark.read.parquet(os.path.join(self._vdir(), "edges"))
