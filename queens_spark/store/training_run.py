"""Persisted training runs: the packed-sequence export as a warehouse
artifact.

A training RUN is the deliverable of the whole pipeline — the corpus
screened, filtered, tokenized, packed into fixed ``seq_len`` windows
(operators/packing.py) and written as ``n_shards`` balanced parquet
shards a trainer streams per epoch. This module gives the export the
same lifecycle posture as the vector/text indexes
(store/vector_index.py, store/text_index.py):

- versioned build dirs named by a PERSISTED monotonic counter (never
  ``len(existing)`` — the collision lesson from the dedup ledger),
- an atomic manifest flip (tmp + ``os.replace``) so a crashed build is
  invisible and a reader never sees a half-written run,
- per-shard counters AND portable token checksums recorded at build
  time, so a trainer (or another engine) can verify a shard it
  downloaded without re-reading the corpus,
- deterministic epoch ORDER served at read time from the portable
  seed hash — the data is written once; every epoch's permutation is
  an ORDER BY over one bigint column, not a rewrite.

Reference parity: the reference (alebgz-91/queens) exports plain
per-table files (queens/core/read_write.py export paths); the
run-manifest posture here extends its single-table export contract to
the multi-shard artifact a 100 TB trainer needs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from queens_spark.operators.packing import (
    assign_shards,
    order_hash_col,
    pack_sequences,
)
from queens_spark.operators.text import HASH_MOD, char_poly_hash

MANIFEST_NAME = "training_run_manifest.json"

__all__ = [
    "build_training_run",
    "load_training_run",
    "run_manifest",
    "TrainingRun",
]


def _manifest_path(run_dir: str) -> str:
    return os.path.join(run_dir, MANIFEST_NAME)


def _read_manifest(run_dir: str) -> dict:
    try:
        with open(_manifest_path(run_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_manifest(run_dir: str, entries: dict) -> None:
    os.makedirs(run_dir, exist_ok=True)
    tmp = _manifest_path(run_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(run_dir))


def _seq_checksum() -> F.Column:
    """Order-sensitive portable checksum of a sequence's tokens: fold
    per-token polynomial hashes through a second polynomial (the
    rolling_token_hash shape, over an already-tokenized array)."""
    return F.aggregate(
        F.col("toks"),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 131 + char_poly_hash(t, HASH_MOD)) % F.lit(HASH_MOD),
    )


def build_training_run(
    df: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    runs_dir: str,
    seq_len: int = 2048,
    n_shards: int = 16,
    stratum_col: str | None = None,
    tokens_col=None,
    description: str = "",
) -> "TrainingRun":
    """Pack *df* and persist it as the next version of run *name*.

    The per-token work is one pack shuffle (the output volume itself)
    plus the shard-partitioned write; manifest stats ride counter-width
    aggregates over the packed frame, computed in the same job.
    """
    spark = df.sparkSession
    base = df
    if stratum_col is None:
        stratum_col = "__stratum"
        base = df.withColumn(stratum_col, F.lit("all"))

    run_dir = os.path.join(runs_dir, name)
    manifest = _read_manifest(run_dir)
    version = int(manifest.get("next_version", 1))
    vdir = os.path.join(run_dir, f"v{version:06d}")
    data_dir = os.path.join(vdir, "data")
    # a build that crashed before its manifest flip leaves this vdir
    # orphaned (next_version never advanced) — clear it so the retry
    # can rewrite; the manifest never pointed at it, so nothing served
    if os.path.exists(vdir):
        import shutil

        shutil.rmtree(vdir, ignore_errors=True)

    packed = assign_shards(
        pack_sequences(
            base, text_col, id_col, seq_len, stratum_col, tokens_col=tokens_col
        ),
        n_shards,
    ).withColumn("n_tokens", F.size("toks").cast("bigint"))

    # an empty PARTITIONED parquet write cannot be read back (the
    # store-wide invariant text_index enforces) — an all-empty corpus
    # must fail loudly here, not at the stats read-back
    if packed.limit(1).count() == 0:
        raise ValueError(
            f"training run {name!r}: corpus packs to zero sequences "
            "(no documents with tokens) — refusing an empty build"
        )
    (
        packed.repartition("shard")
        .write.mode("errorifexists")
        .partitionBy("shard")
        .parquet(data_dir)
    )

    # Counter-width manifest stats over the WRITTEN artifact (so the
    # recorded checksums describe the bytes on disk, not the plan).
    stats = (
        spark.read.parquet(data_dir)
        .withColumn("__ck", _seq_checksum())
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("__ck").cast("bigint").alias("checksum"),
            F.countDistinct(stratum_col).cast("bigint").alias("n_strata"),
        )
        .collect()
    )
    shards = {
        str(r["shard"]): {
            "n_seqs": int(r["n_seqs"]),
            "n_tokens": int(r["n_tokens"]),
            "checksum": int(r["checksum"]),
            "n_strata": int(r["n_strata"]),
        }
        for r in stats
    }
    entry = {
        "version": version,
        "dir": f"v{version:06d}",
        "seq_len": int(seq_len),
        "n_shards": int(n_shards),
        "stratum_col": stratum_col,
        "id_col": id_col,
        "description": description,
        "n_seqs": sum(s["n_seqs"] for s in shards.values()),
        "n_tokens": sum(s["n_tokens"] for s in shards.values()),
        "shards": shards,
    }
    # Flip LAST: a crash before this line leaves the new vdir orphaned
    # (invisible to readers, GC'd by the next successful build below).
    manifest.update(
        {"current": entry, "next_version": version + 1, "name": name}
    )
    _write_manifest(run_dir, manifest)
    _gc_superseded(run_dir, keep=f"v{version:06d}")
    return TrainingRun(spark, run_dir)


def _gc_superseded(run_dir: str, keep: str) -> None:
    import shutil

    for d in os.listdir(run_dir):
        if d.startswith("v") and d != keep and os.path.isdir(
            os.path.join(run_dir, d)
        ):
            shutil.rmtree(os.path.join(run_dir, d), ignore_errors=True)


def attach_report(run_dir: str, tables: dict[str, dict]) -> None:
    """Record release-report tables in the run manifest (atomic
    re-flip): {table: {"path": rel_path, "n_rows": int}}. Until this
    flip lands the manifest simply has no ``report`` key, so a crash
    between the run flip and this one is DETECTABLE (incomplete
    bundle) rather than silently passing verification."""
    manifest = _read_manifest(run_dir)
    if not manifest.get("current"):
        raise FileNotFoundError(f"no training run at {run_dir}")
    manifest["current"]["report"] = tables
    _write_manifest(run_dir, manifest)


def run_manifest(run_dir: str) -> dict:
    m = _read_manifest(run_dir)
    if not m.get("current"):
        raise FileNotFoundError(f"no training run at {run_dir}")
    return m


def load_training_run(spark: SparkSession, run_dir: str) -> "TrainingRun":
    run_manifest(run_dir)  # fail loud on missing/half-built
    return TrainingRun(spark, run_dir)


class TrainingRun:
    """Read surface of a persisted run."""

    def __init__(self, spark: SparkSession, run_dir: str):
        self.spark = spark
        self.run_dir = run_dir
        self.manifest = run_manifest(run_dir)
        self.entry = self.manifest["current"]

    def _data_dir(self) -> str:
        return os.path.join(self.run_dir, self.entry["dir"], "data")

    def sequences(self, shard: int | None = None) -> DataFrame:
        """The packed sequences; pass *shard* to read one shard's
        partition directory only (partition-pruned scan)."""
        # partition type-inference is OFF session-wide (session.py), so
        # the shard partition column reads back as string — restore the
        # int type AFTER the pushdown-friendly string filter.
        df = self.spark.read.parquet(self._data_dir())
        if shard is not None:
            df = df.filter(F.col("shard") == str(int(shard)))
        return df.withColumn("shard", F.col("shard").cast("int"))

    def epoch(self, seed: str, shard: int | None = None) -> DataFrame:
        """One epoch's deterministic order: the stored sequences
        sorted by the portable hash of ``seed || ':' || stratum/seq``.
        Same seed → bit-identical order on any engine; the sort key is
        a derived hash, so no skew and no data rewrite per epoch."""
        df = self.sequences(shard=shard)
        key = F.concat_ws(
            "#",
            F.col(self.entry["stratum_col"]),
            F.col("seq_id").cast("string"),
        )
        return df.withColumn("order_hash", order_hash_col(key, seed)).orderBy(
            "order_hash", self.entry["stratum_col"], "seq_id"
        )

    def verify(self) -> dict:
        """Recompute shard counters + checksums from the stored bytes
        and diff against the manifest — the post-download integrity
        check a trainer runs. Returns {shard: 'ok' | 'MISMATCH ...'}."""
        recomputed = (
            self.sequences()
            .withColumn("__ck", _seq_checksum())
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                F.sum("__ck").cast("bigint").alias("checksum"),
            )
            .collect()
        )
        out: dict[str, str] = {}
        want = self.entry["shards"]
        for r in recomputed:
            k = str(r["shard"])
            w = want.get(k)
            if w is None:
                out[k] = "MISMATCH unexpected shard"
            elif (
                int(r["n_seqs"]) != w["n_seqs"]
                or int(r["n_tokens"]) != w["n_tokens"]
                or int(r["checksum"]) != w["checksum"]
            ):
                out[k] = (
                    f"MISMATCH stored n_seqs={r['n_seqs']} "
                    f"n_tokens={r['n_tokens']} checksum={r['checksum']} "
                    f"manifest {w}"
                )
            else:
                out[k] = "ok"
        for k in want:
            out.setdefault(k, "MISMATCH missing shard")
        # release bundles: the report tables' recorded row counts must
        # match the stored bytes too (attach_report)
        for table, meta in (self.entry.get("report") or {}).items():
            p = os.path.join(self.run_dir, self.entry["dir"], meta["path"])
            try:
                n = self.spark.read.parquet(p).count()
            except Exception:
                out[f"report:{table}"] = "MISMATCH unreadable report table"
                continue
            out[f"report:{table}"] = (
                "ok"
                if int(n) == int(meta["n_rows"])
                else f"MISMATCH report rows {n} != {meta['n_rows']}"
            )
        return out
