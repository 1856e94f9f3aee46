"""Persistent exact-dedup ledger: incremental corpus building.

A training corpus is not built in one run — batches arrive over
weeks, and every batch must be deduplicated against EVERYTHING
already accepted, not just against itself. The batch operators
(operators/dedup.py) answer "what is duplicated inside this frame";
this module adds the cross-run state: a warehouse-persisted ledger of
accepted content fingerprints that each new ingest batch is screened
against and then appended to. It is the batch twin of the streaming
novelty gate (streaming/events.py:novelty_filter — stream-static anti
join on the fingerprint, history on the static side) with the
warehouse's crash-safety rules:

- each accepted batch writes ONE new parquet segment of
  (fingerprint, canonical id); the manifest (segment list) flips
  atomically AFTER the write lands — a crash mid-ingest leaves an
  orphan dir no reader sees (same convention as the ingest flip-flag
  protocol, store/warehouse.py, and vector-index appends);
- the returned fresh-documents frame is anchored on the WRITTEN
  segment (a semi-join against it), so recomputing it after the
  manifest flip cannot self-collide with the fingerprints it just
  added;
- a long segment history merges with :func:`compact_ledger` (pure
  rewrite, content unchanged).

Scale shape: the screen is one hash anti-join of the batch's distinct
fingerprints against the ledger (narrow 32-byte keys; AQE broadcasts
whichever side is small — a daily batch against a years-deep ledger
shuffles batch-sized, not ledger-sized, data after the ledger side's
scan). The in-batch collapse is one fingerprint-keyed aggregation.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from queens_spark.operators.text import doc_fingerprint

MANIFEST_NAME = "dedup_ledger_manifest.json"


def _manifest_path(ledger_dir: str) -> str:
    return os.path.join(ledger_dir, MANIFEST_NAME)


def _read_manifest(ledger_dir: str) -> dict:
    try:
        with open(_manifest_path(ledger_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"segments": []}


def _write_manifest(ledger_dir: str, manifest: dict) -> None:
    os.makedirs(ledger_dir, exist_ok=True)
    tmp = _manifest_path(ledger_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(ledger_dir))


def ledger_fingerprints(
    spark: SparkSession, ledger_dir: str
) -> DataFrame | None:
    """The accepted-content ledger as (fingerprint, id) — None when
    no batch has ever been accepted."""
    segs = _read_manifest(ledger_dir)["segments"]
    if not segs:
        return None
    return spark.read.parquet(*segs)


def ingest_deduped(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ledger_dir: str,
) -> tuple[DataFrame, dict]:
    """Screen *df* against the ledger, accept what is new, record it.

    1. in-batch collapse: one row per distinct normalized-content
       fingerprint (md5 — operators/text.py:doc_fingerprint), keeping
       the min id as canonical;
    2. cross-run screen: LEFT ANTI join of those fingerprints against
       every prior segment;
    3. accept: the survivors' (fingerprint, id) pairs are written as
       a new segment, THEN the manifest flips.

    Returns ``(fresh_df, stats)``: *fresh_df* is *df* semi-joined on
    the written segment's ids (anchored on disk — stable however
    late it is evaluated), and *stats* counts
    ``{"batch", "in_batch_dupes", "ledger_dupes", "accepted"}``.
    """
    spark = df.sparkSession
    fp = df.select(
        F.col(id_col), doc_fingerprint(text_col).alias("fingerprint")
    )
    canon = (
        fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    ).persist()
    try:
        n_batch = fp.count()
        n_unique = canon.count()
        ledger = ledger_fingerprints(spark, ledger_dir)
        new = (
            canon
            if ledger is None
            else canon.join(
                ledger.select("fingerprint"), "fingerprint", "left_anti"
            )
        )
        manifest = _read_manifest(ledger_dir)
        seg = os.path.join(
            ledger_dir, f"seg{len(manifest['segments'])}"
        )
        new.select("fingerprint", F.col(id_col)).write.mode(
            "overwrite"
        ).parquet(seg)
        n_accepted = spark.read.parquet(seg).count()
        manifest["segments"] = manifest["segments"] + [seg]
        _write_manifest(ledger_dir, manifest)
    finally:
        canon.unpersist()
    fresh = df.join(
        spark.read.parquet(seg).select(id_col), id_col, "semi"
    )
    return fresh, {
        "batch": n_batch,
        "in_batch_dupes": n_batch - n_unique,
        "ledger_dupes": n_unique - n_accepted,
        "accepted": n_accepted,
    }


def compact_ledger(spark: SparkSession, ledger_dir: str) -> int:
    """Merge a many-segment ledger into one segment (content
    unchanged): new segment written first, manifest flips to it,
    superseded segment dirs removed after the flip. Returns the
    number of segments merged (0 = no-op)."""
    manifest = _read_manifest(ledger_dir)
    segs = manifest["segments"]
    if len(segs) <= 1:
        return 0
    merged = os.path.join(ledger_dir, f"seg{len(segs)}__compacted")
    spark.read.parquet(*segs).write.mode("overwrite").parquet(merged)
    _write_manifest(ledger_dir, {"segments": [merged]})
    for s in segs:
        shutil.rmtree(s, ignore_errors=True)
    return len(segs)
