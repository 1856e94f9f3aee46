"""Per-collection TAKEDOWN artifact: the persisted retired-id set
that makes a document takedown reach the PRIMARY query surface.

``Engine.retire_documents`` tombstones every registered index, cluster
map, and the dedup ledger — but the warehouse raw/prod rows would
otherwise keep serving the retired document's text through
``Engine.query`` / ``query_page`` / exports until a re-ingest. This
store closes that gap the same way the index tier does it:

- the doomed ids land ONCE as a parquet segment (one narrow bigint
  column — the collection's document id), written by
  :func:`record_takedown` with the manifest flipped LAST (a crashed
  retire leaves the previous takedown state intact);
- every segment is COVERAGE-SCOPED: it records the max ingest_id that
  existed at retire time, so the anti-join hides a retired id only in
  rows it could have covered — a later re-ingest of the same id (the
  document-revision route) serves its NEW row, exactly the
  vector/text/cluster tombstone convention;
- :func:`apply_takedowns` is the serving filter (query path and
  ``Warehouse.stage``'s prod rebuild share it), and
  ``Engine.maintain`` applies the segments PHYSICALLY — rewriting the
  affected raw table partitions, restaging, then clearing the
  segments — so retired bytes actually leave disk;
- the segment records which table_name partitions contain doomed rows
  (one column-pruned semi-join of raw at record time), so both the
  incremental stage rewrite and the physical purge stay O(affected
  tables), never a full-collection rebuild.

Scale posture: the doomed set is a FRAME end to end — a legal
takedown is thousands of ids, but a retention purge can retire a
corpus-scale fraction, so nothing here collects the ids to the driver
and no join carries a broadcast hint (AQE broadcasts the small case
and shuffles the large one).

Reference analog: the reference rebuilds prod per table at staging
(queens/core/read_write.py:340-404) but has no takedown surface at
all; this extends its CTAS-rebuild hook with a survivor filter.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_NAME = "manifest.json"

__all__ = [
    "takedown_dir",
    "record_takedown",
    "read_manifest",
    "retired_frame",
    "apply_takedowns",
    "live_segments",
    "tables_changed_since",
    "clear_segments",
]


def takedown_dir(warehouse_root: str, collection: str) -> str:
    return os.path.join(warehouse_root, "system", "takedowns", collection)


def _manifest_path(tdir: str) -> str:
    return os.path.join(tdir, MANIFEST_NAME)


def read_manifest(tdir: str) -> dict:
    try:
        with open(_manifest_path(tdir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_manifest(tdir: str, manifest: dict) -> None:
    os.makedirs(tdir, exist_ok=True)
    tmp = _manifest_path(tdir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(tdir))


def record_takedown(
    spark: SparkSession,
    tdir: str,
    doomed: DataFrame,
    id_col: str,
    raw: DataFrame | None,
    covers_ingest_id: int,
) -> dict:
    """Persist one takedown's doomed-id set as a new coverage-scoped
    segment and return ``{"n_ids": int, "tables": [...], "path": str
    | None}``. The input frame's single column is normalized to
    *id_col* bigint and deduplicated; the stored artifact — not the
    caller's frame — is what every downstream retire verb reads, so
    all stores provably retire the SAME set. *raw* (the collection's
    raw frame, or None when the collection has no warehouse table)
    yields the affected table_name list via one column-pruned
    semi-join. A zero-id takedown leaves no trace."""
    src = doomed.columns[0]
    norm = (
        doomed.select(F.col(src).cast("bigint").alias(id_col))
        .where(F.col(id_col).isNotNull())
        .distinct()
    )
    manifest = read_manifest(tdir)
    seg_id = int(manifest.get("next_seg", 0))
    seg_dir = f"seg_{seg_id:06d}"
    path = os.path.join(tdir, seg_dir)
    norm.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    n_ids = stored.count()
    if n_ids == 0:
        shutil.rmtree(path, ignore_errors=True)
        return {"n_ids": 0, "tables": [], "path": None}
    tables: list[str] = []
    if raw is not None and id_col in raw.columns:
        tables = sorted(
            r["table_name"]
            for r in raw.select(id_col, "table_name")
            .join(stored, id_col, "semi")
            .select("table_name")
            .distinct()
            .collect()
        )
    manifest.setdefault("id_col", id_col)
    if manifest["id_col"] != id_col:
        raise ValueError(
            f"takedown store at {tdir} is keyed on "
            f"{manifest['id_col']!r}; refusing a segment keyed on "
            f"{id_col!r}"
        )
    manifest["segments"] = list(manifest.get("segments") or []) + [
        {
            "dir": seg_dir,
            "n_ids": int(n_ids),
            "covers_ingest_id": int(covers_ingest_id),
            "tables": tables,
            "seq": int(manifest.get("seq", 0)) + 1,
        }
    ]
    manifest["next_seg"] = seg_id + 1
    manifest["seq"] = int(manifest.get("seq", 0)) + 1
    _write_manifest(tdir, manifest)
    return {"n_ids": int(n_ids), "tables": tables, "path": path}


def live_segments(tdir: str) -> list[dict]:
    return list(read_manifest(tdir).get("segments") or [])


def retired_frame(spark: SparkSession, tdir: str) -> DataFrame | None:
    """All live (not yet physically purged) retired ids as
    ``(id_col, __covers)`` — one row per (segment, id), each carrying
    its segment's coverage ingest_id. None when no takedown is
    pending."""
    manifest = read_manifest(tdir)
    segs = manifest.get("segments") or []
    if not segs:
        return None
    id_col = manifest["id_col"]
    out = None
    for seg in segs:
        df = spark.read.parquet(os.path.join(tdir, seg["dir"])).select(
            F.col(id_col),
            F.lit(int(seg["covers_ingest_id"])).alias("__covers"),
        )
        out = df if out is None else out.unionByName(df)
    return out


def apply_takedowns(
    df: DataFrame, spark: SparkSession, tdir: str
) -> DataFrame:
    """The shared serving filter: anti-join *df* against every live
    takedown segment, coverage-scoped (a row survives when its
    ingest_id postdates the segment — the re-ingest-after-takedown
    route). A frame without the id or ingest_id column, or a
    collection with no pending takedown, passes through untouched —
    so catalog plans and collections that never retire keep their
    exact shapes. No broadcast hint: retention purges can be
    corpus-scale; AQE sizes the join."""
    manifest = read_manifest(tdir)
    segs = manifest.get("segments") or []
    if not segs:
        return df
    id_col = manifest["id_col"]
    if id_col not in df.columns or "ingest_id" not in df.columns:
        return df
    retired = retired_frame(spark, tdir)
    cond = (df[id_col] == retired[id_col]) & (
        df["ingest_id"] <= retired["__covers"]
    )
    return df.join(retired, cond, "left_anti")


def tables_changed_since(tdir: str, seq: int) -> set[str]:
    """table_name partitions named by takedown segments recorded after
    *seq* — the incremental-stage diff input: only these tables need a
    prod rewrite when the winner set itself did not change."""
    out: set[str] = set()
    for seg in live_segments(tdir):
        if int(seg.get("seq", 0)) > int(seq):
            out.update(seg.get("tables") or [])
    return out


def clear_segments(tdir: str) -> int:
    """Drop every live segment (called by ``Engine.maintain`` AFTER
    the physical purge + restage — the bytes are gone, so the serving
    filter has nothing left to hide). Bumps ``seq`` so a staged
    manifest recorded against the pre-purge state re-syncs without
    forcing table rewrites (no live segments → no changed tables).
    Returns how many segments were cleared."""
    manifest = read_manifest(tdir)
    segs = manifest.get("segments") or []
    if not segs:
        return 0
    manifest["segments"] = []
    manifest["seq"] = int(manifest.get("seq", 0)) + 1
    _write_manifest(tdir, manifest)
    for seg in segs:
        shutil.rmtree(os.path.join(tdir, seg["dir"]), ignore_errors=True)
    return len(segs)
