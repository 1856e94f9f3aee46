"""Persisted mergeable ECDF/quantile profiles: per-group fixed-grid
histogram-CDFs that outlive the corpus scan that built them.

KMV sketches (store/sketch_store.py) answer DISTINCT accounting from
artifacts; percentile calibration (q151) and drift baselines still
recomputed exact ranks from the corpus every run. This store closes
that gap with the same lifecycle posture:

- ``build_ecdf_store`` runs one counter-width histogram pass
  (operators/drift.hist_counts over the shared ``bucketize`` grid) and
  persists the per-(group, bucket) counts as a versioned parquet +
  manifest entry;
- ``append_ecdf_store`` histograms ONLY the new batch and merges by
  per-bucket ADDITION — histogram merge is associative integer math,
  so the append is bit-identical to a rebuild on the union (tested) at
  O(batch) cost. This is the exact-merge fixed grid, deliberately NOT
  a randomized KLL/t-digest: oracle equality is the house rule, and a
  bounded grid (``n_buckets`` counters per group, overflow bucket
  absorbing the tail) is what makes bit-portability trivial;
- appends accept idempotency tokens (the ledger/index/sketch
  exactly-once contract): a replayed token no-ops;
- every serve — the CDF table, percentile thresholds, drift reference
  counters — reads the groups×n_buckets-row artifact; the corpus is
  never touched again.

Threshold semantics (integer-exact on both engines): for a basis-point
fraction ``bp``, the threshold bucket is the SMALLEST grid bucket
whose cumulative count covers ``bp`` of the group
(``cum_n * 10000 >= bp * total``), and the served threshold value is
that bucket's exclusive upper edge ``(bucket+1) * width`` — "values
below this edge cover at least bp of the corpus". Resolution is the
grid width by construction; callers pick the grid when they register
the profile, exactly like the corpus profile's admission histogram.

The value being profiled is stored as a Spark-SQL EXPRESSION string
(``value_sql``) in the manifest, so appends recompute it from the
batch frame with no caller-side configuration — the text/vector-index
column-ownership convention extended to derived values.

Manifest treatment follows the house pattern (artifacts first, atomic
manifest flip last, monotonic version counter, post-flip GC of
superseded dirs; fsck reports crashed-write leftovers as orphans).

Reference parity: the reference (alebgz-91/queens) profiles per-version
column min/max/count inside staging's metadata refresh
(queens/core/read_write.py:464-531); this extends that
derived-statistics-beside-the-data posture to full distribution SHAPE
(grid CDFs) with incremental maintenance, which its pandas/SQLite
engine recomputes from scratch per call.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

MANIFEST_NAME = "ecdf_store.json"

__all__ = [
    "build_ecdf_store",
    "build_ecdf_profiles",
    "append_ecdf_store",
    "load_ecdf_store",
    "build_or_load_ecdf_store",
    "build_or_load_ecdf_profiles",
    "retire_from_ecdf_store",
    "clear_applied_tokens",
    "EcdfStore",
]


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


def _hist(df: DataFrame, entry: dict) -> DataFrame:
    from queens_spark.operators.drift import bucketize, hist_counts

    if "profiles" in entry:
        # MULTI-PROFILE build: N named value expressions histogrammed
        # in ONE corpus scan — each expression evaluates exactly once
        # per row (the struct carries the bigint value; the per-profile
        # bucket grid applies AFTER the explode, so no projection
        # collapse can re-run an expensive expression), then one
        # partial-agg shuffle over (profile, g, bucket) counters.
        profs = sorted(entry["profiles"].items())
        structs = [
            F.struct(
                F.lit(pname).alias("profile"),
                F.expr(p["value_sql"]).cast("bigint").alias("val"),
            )
            for pname, p in profs
        ]
        stacked = (
            df.select(
                F.col(entry["group_col"]).alias("g"),
                F.explode(F.array(*structs)).alias("x"),
            )
            .select("g", "x.profile", "x.val")
            # a bucket is undefined for a NULL value — drop per profile
            # (the single-profile semantics, applied row-wise)
            .where(F.col("val").isNotNull())
        )
        first, rest = profs[0], profs[1:]
        bucket = F.when(
            F.col("profile") == first[0],
            bucketize(
                F.col("val"), int(first[1]["width"]),
                int(first[1]["n_buckets"]),
            ),
        )
        for pname, p in rest:
            bucket = bucket.when(
                F.col("profile") == pname,
                bucketize(
                    F.col("val"), int(p["width"]), int(p["n_buckets"])
                ),
            )
        return (
            stacked.select("profile", "g", bucket.alias("bucket"))
            .groupBy("profile", "g", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    base = df.select(
        F.col(entry["group_col"]).alias("g"),
        F.expr(entry["value_sql"]).alias("__val"),
    )
    # a bucket is undefined for a NULL value — drop explicitly (the
    # score_groups precedent): without this a null-bucket counter row
    # would sort differently across engines and poison every cumulative
    return hist_counts(
        base.where(F.col("__val").isNotNull()),
        F.col("__val"),
        int(entry["width"]),
        int(entry["n_buckets"]),
        group_cols=["g"],
    )


def _write_version(
    store_dir: str, name: str, version: int, hist: DataFrame
) -> str:
    path = os.path.join(store_dir, name, f"v{version}", "hist")
    hist.write.mode("overwrite").parquet(path)
    return path


def _gc_superseded(store_dir: str, name: str, keep_version: int) -> None:
    base = os.path.join(store_dir, name)
    if not os.path.isdir(base):
        return
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{keep_version}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


class EcdfStore:
    """Single- OR multi-profile store. A legacy entry carries one
    (value_sql, width, n_buckets); a multi-profile entry carries
    ``profiles[name] = {value_sql, width, n_buckets}`` histogrammed in
    ONE corpus scan (the hist artifact gains a ``profile`` column).
    Every serve takes an optional *profile* argument — required on a
    multi-profile store, rejected on a single-profile one."""

    def __init__(self, spark: SparkSession, store_dir: str, name: str,
                 entry: dict):
        self.spark = spark
        self.store_dir = store_dir
        self.name = name
        self.entry = entry
        self.group_col = entry["group_col"]
        if "profiles" not in entry:
            self.width = int(entry["width"])
            self.n_buckets = int(entry["n_buckets"])

    def _grid(self, profile: str | None) -> tuple[int, int]:
        if "profiles" in self.entry:
            if profile is None:
                raise ValueError(
                    f"ecdf store {self.name!r} is multi-profile "
                    f"({sorted(self.entry['profiles'])}); pass profile="
                )
            p = self.entry["profiles"][profile]
            return int(p["width"]), int(p["n_buckets"])
        if profile is not None:
            raise ValueError(
                f"ecdf store {self.name!r} is single-profile; "
                "profile= does not apply"
            )
        return self.width, self.n_buckets

    def hist(self, profile: str | None = None) -> DataFrame:
        """(group_col, bucket, n) — the stored counters, corpus
        untouched (filtered to *profile* on a multi-profile store)."""
        self._grid(profile)  # validates the profile argument
        stored = self.spark.read.parquet(self.entry["path"])
        if "profiles" in self.entry:
            stored = stored.where(F.col("profile") == profile)
        return stored.select(
            F.col("g").alias(self.group_col), "bucket", "n"
        )

    def cdf(self, profile: str | None = None) -> DataFrame:
        """(group_col, bucket, lo, hi, n, cum_n, total) — the grid CDF.
        The cumulative window partitions on the group over ≤ n_buckets
        rows each (bounded at any corpus size — this is counter-width
        arithmetic, not a corpus window)."""
        width_v, _ = self._grid(profile)
        w_cum = (
            Window.partitionBy(self.group_col)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_tot = Window.partitionBy(self.group_col)
        width = F.lit(width_v).cast("bigint")
        return self.hist(profile).select(
            self.group_col,
            "bucket",
            (F.col("bucket") * width).alias("lo"),
            ((F.col("bucket") + 1) * width).alias("hi"),
            "n",
            F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
            F.sum("n").over(w_tot).cast("bigint").alias("total"),
        )

    def thresholds(
        self, fractions_bp: dict[str, int], profile: str | None = None
    ) -> DataFrame:
        """Per-group calibration thresholds from the stored grid: for
        each named basis-point fraction, the smallest bucket whose
        cumulative count covers it, served as the bucket's exclusive
        upper edge plus the exact coverage reached there. Integer
        arithmetic end to end (cum_n·10⁴ ≥ bp·total), so any engine
        reproduces it bit-for-bit from the same counters.

        ``saturated`` marks thresholds landing in the LAST grid bucket
        (n_buckets − 1). That bucket absorbs the unbounded tail, so
        when the value domain can exceed the grid top, ``value_lt`` is
        no longer a true exclusive upper edge there — a saturated
        threshold means "grid resolution exhausted; widen the grid (or
        the domain is bounded and this is its top bucket)". Served
        rather than NULLed because for a domain the grid fully covers
        (e.g. the q195 quality grid, values ≤ grid top by
        construction) the edge IS still correct."""
        bad = {k: v for k, v in fractions_bp.items()
               if not 0 < int(v) <= 10000}
        if bad:
            raise ValueError(
                f"threshold fractions must be basis points in (0, 10000]; "
                f"got {bad}"
            )
        _, n_buckets = self._grid(profile)
        # ONE unpivoted plan for every requested fraction: the (name,
        # bp) pairs ride in as a broadcast literal frame crossed with
        # the counter-width CDF, and one window picks each (group,
        # threshold)'s first covering bucket — instead of a per-bp
        # subplan union that grows with the fraction set
        fr = self.spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(fractions_bp.items())],
            "threshold string, bp bigint",
        )
        w = Window.partitionBy(self.group_col, "threshold").orderBy(
            "bucket"
        )
        return (
            self.cdf(profile)
            .crossJoin(F.broadcast(fr))
            .where(F.col("cum_n") * 10000 >= F.col("bp") * F.col("total"))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                self.group_col,
                "threshold",
                F.col("bp").cast("bigint").alias("bp"),
                F.col("hi").alias("value_lt"),
                F.expr("cum_n * 10000 div total").alias("covered_bp"),
                (F.col("bucket") == n_buckets - 1).alias("saturated"),
            )
        )

    def pooled_counters(self, profile: str | None = None) -> dict[int, int]:
        """The whole-corpus histogram (all groups summed) as a
        driver-side counter dict — the STORED baseline a streaming
        monitor gates micro-batches against
        (operators/drift.drift_from_count_frame_vs_reference), so
        batch drift matrices and the stream score against the SAME
        artifact. ≤ n_buckets entries by construction."""
        return {
            int(r["bucket"]): int(r["n"])
            for r in self.hist(profile)
            .groupBy("bucket")
            .agg(F.sum("n").cast("bigint").alias("n"))
            .collect()
        }

    def ref_counters(
        self, group: str, profile: str | None = None
    ) -> dict[int, int]:
        """One group's histogram as a driver-side counter dict — the
        drift-reference shape ``drift_from_counters`` consumes (≤
        n_buckets entries by construction)."""
        return {
            int(r["bucket"]): int(r["n"])
            for r in self.hist(profile)
            .where(F.col(self.group_col) == group)
            .collect()
        }

    def describe(self) -> dict:
        out = {
            "name": self.name,
            "group_col": self.group_col,
            "version": int(self.entry["version"]),
            "applied_tokens": len(self.entry.get("applied_tokens") or []),
        }
        if "profiles" in self.entry:
            out["profiles"] = {
                p: {
                    "value_sql": v["value_sql"],
                    "width": int(v["width"]),
                    "n_buckets": int(v["n_buckets"]),
                }
                for p, v in sorted(self.entry["profiles"].items())
            }
            out["n_groups"] = (
                self.spark.read.parquet(self.entry["path"])
                .select("g").distinct().count()
            )
        else:
            out.update(
                {
                    "value_sql": self.entry["value_sql"],
                    "width": self.width,
                    "n_buckets": self.n_buckets,
                    "n_groups": self.hist()
                    .select(self.group_col)
                    .distinct()
                    .count(),
                }
            )
        return out


def build_ecdf_store(
    df: DataFrame,
    group_col: str,
    value_sql: str,
    store_dir: str,
    name: str,
    width: int = 50,
    n_buckets: int = 40,
    fingerprint: str | None = None,
) -> EcdfStore:
    """One histogram pass → persisted per-group grid. Overwrites any
    prior store of the same name; use :func:`append_ecdf_store` to
    extend one."""
    spark = df.sparkSession
    entries = _read_manifest(store_dir)
    version = int(entries.get(name, {}).get("version", 0)) + 1
    entry = {
        "group_col": group_col,
        "value_sql": str(value_sql),
        "width": int(width),
        "n_buckets": int(n_buckets),
        "version": version,
        "applied_tokens": [],
        "fingerprint": fingerprint,
    }
    hist = _hist(df, entry)
    entry["path"] = _write_version(store_dir, name, version, hist)
    entries[name] = entry
    _write_manifest(store_dir, entries)
    _gc_superseded(store_dir, name, version)
    return EcdfStore(spark, store_dir, name, entry)


def _norm_profiles(profiles: dict) -> dict:
    out = {}
    for pname, p in profiles.items():
        out[str(pname)] = {
            "value_sql": str(p["value_sql"]),
            "width": int(p.get("width", 50)),
            "n_buckets": int(p.get("n_buckets", 40)),
        }
    if not out:
        raise ValueError("build_ecdf_profiles: at least one profile")
    return out


def build_ecdf_profiles(
    df: DataFrame,
    group_col: str,
    profiles: dict,
    store_dir: str,
    name: str,
    fingerprint: str | None = None,
) -> EcdfStore:
    """MULTI-PROFILE build: N named value expressions
    (``profiles[name] = {value_sql, width, n_buckets}``) histogrammed
    per group in ONE corpus scan — at 100 TB the scan dominates, so a
    deployment profiling k values (token length, quality, …) pays 1×
    the I/O instead of k× separate builds. Appends stay exact-merge
    O(batch) and recompute every profile from the one batch scan."""
    spark = df.sparkSession
    entries = _read_manifest(store_dir)
    version = int(entries.get(name, {}).get("version", 0)) + 1
    entry = {
        "group_col": group_col,
        "profiles": _norm_profiles(profiles),
        "version": version,
        "applied_tokens": [],
        "fingerprint": fingerprint,
    }
    hist = _hist(df, entry)
    entry["path"] = _write_version(store_dir, name, version, hist)
    entries[name] = entry
    _write_manifest(store_dir, entries)
    _gc_superseded(store_dir, name, version)
    return EcdfStore(spark, store_dir, name, entry)


def build_or_load_ecdf_profiles(
    df: DataFrame,
    group_col: str,
    profiles: dict,
    store_dir: str,
    name: str,
    fingerprint: str | None = None,
) -> EcdfStore:
    """Serve the stored multi-profile store when group, every
    profile's (value_sql, width, n_buckets), AND the fingerprint
    match; rebuild otherwise."""
    spark = df.sparkSession
    entry = _read_manifest(store_dir).get(name)
    if (
        entry
        and entry.get("group_col") == group_col
        and entry.get("profiles") == _norm_profiles(profiles)
        and entry.get("fingerprint") == fingerprint
        and os.path.exists(entry.get("path", ""))
    ):
        return EcdfStore(spark, store_dir, name, entry)
    return build_ecdf_profiles(
        df, group_col, profiles, store_dir, name, fingerprint=fingerprint
    )


def build_or_load_ecdf_store(
    df: DataFrame,
    group_col: str,
    value_sql: str,
    store_dir: str,
    name: str,
    width: int = 50,
    n_buckets: int = 40,
    fingerprint: str | None = None,
) -> EcdfStore:
    """Serve the stored profile when params AND fingerprint match;
    rebuild otherwise — the build_or_load posture shared with every
    other store in this tier."""
    spark = df.sparkSession
    entry = _read_manifest(store_dir).get(name)
    if (
        entry
        and entry.get("group_col") == group_col
        and entry.get("value_sql") == str(value_sql)
        and int(entry.get("width", -1)) == int(width)
        and int(entry.get("n_buckets", -1)) == int(n_buckets)
        and entry.get("fingerprint") == fingerprint
        and os.path.exists(entry.get("path", ""))
    ):
        return EcdfStore(spark, store_dir, name, entry)
    return build_ecdf_store(
        df, group_col, value_sql, store_dir, name,
        width=width, n_buckets=n_buckets, fingerprint=fingerprint,
    )


def load_ecdf_store(
    spark: SparkSession, store_dir: str, name: str
) -> EcdfStore:
    entries = _read_manifest(store_dir)
    if name not in entries:
        raise KeyError(f"no ecdf store named {name!r} in {store_dir}")
    return EcdfStore(spark, store_dir, name, entries[name])


def append_ecdf_store(
    spark: SparkSession,
    df: DataFrame,
    store_dir: str,
    name: str,
    token: str | None = None,
) -> EcdfStore:
    """Fold a new batch in: histogram the BATCH (O(batch)), add the
    counters bucket-wise to the stored grid — bit-identical to a
    rebuild on the union (histogram addition is associative, exact
    integers). A replayed *token* no-ops."""
    entries = _read_manifest(store_dir)
    if name not in entries:
        raise KeyError(f"no ecdf store named {name!r} in {store_dir}")
    entry = dict(entries[name])
    if token is not None and token in (entry.get("applied_tokens") or []):
        return EcdfStore(spark, store_dir, name, entry)
    batch = _hist(df, entry)
    stored = spark.read.parquet(entry["path"])
    keys = (
        ["profile", "g", "bucket"] if "profiles" in entry
        else ["g", "bucket"]
    )
    merged = (
        stored.unionByName(batch)
        .groupBy(*keys)
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    version = int(entry["version"]) + 1
    entry["path"] = _write_version(store_dir, name, version, merged)
    entry["version"] = version
    if token is not None:
        entry["applied_tokens"] = list(
            entry.get("applied_tokens") or []
        ) + [str(token)]
    entries[name] = entry
    _write_manifest(store_dir, entries)
    _gc_superseded(store_dir, name, version)
    return EcdfStore(spark, store_dir, name, entry)


def retire_from_ecdf_store(
    spark: SparkSession,
    doomed_rows: DataFrame,
    store_dir: str,
    name: str,
) -> EcdfStore:
    """EXACT decremental takedown: histogram the doomed ROWS through
    the store's own manifest expressions (the same ``_hist`` every
    build/append runs) and SUBTRACT the counters bucket-wise.
    Histogram addition over exact integers is associative and
    invertible, so when the doomed rows are exactly rows previously
    folded in — the ``Engine.retire_documents`` path reads them back
    from the warehouse's accepted batches — the result is
    bit-identical to a rebuild on the survivors (property-tested).
    Zeroed counters drop from the artifact (a rebuild never writes
    them); a doomed set that was never added would drive counters
    negative, which readers surface rather than hide. O(doomed batch)
    — one histogram pass over the doomed rows plus a counter-width
    merge; the corpus is never touched."""
    entries = _read_manifest(store_dir)
    if name not in entries:
        raise KeyError(f"no ecdf store named {name!r} in {store_dir}")
    entry = dict(entries[name])
    dec = _hist(doomed_rows, entry).withColumn(
        "n", (-F.col("n")).cast("bigint")
    )
    stored = spark.read.parquet(entry["path"])
    keys = (
        ["profile", "g", "bucket"] if "profiles" in entry
        else ["g", "bucket"]
    )
    merged = (
        stored.unionByName(dec)
        .groupBy(*keys)
        .agg(F.sum("n").cast("bigint").alias("n"))
        .where(F.col("n") != 0)
    )
    version = int(entry["version"]) + 1
    entry["path"] = _write_version(store_dir, name, version, merged)
    entry["version"] = version
    entries[name] = entry
    _write_manifest(store_dir, entries)
    _gc_superseded(store_dir, name, version)
    return EcdfStore(spark, store_dir, name, entry)


def clear_applied_tokens(store_dir: str, name: str) -> int:
    """Drop the idempotency-token list — only safe once the ledger has
    compacted (the shared post-compact-replay argument). Returns how
    many tokens were cleared."""
    entries = _read_manifest(store_dir)
    if name not in entries:
        return 0
    n = len(entries[name].get("applied_tokens") or [])
    if n:
        entries[name]["applied_tokens"] = []
        _write_manifest(store_dir, entries)
    return n
