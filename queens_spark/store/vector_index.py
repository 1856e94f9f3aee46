"""Warehouse-persisted ANN index lifecycle: build once on ingest,
search forever without re-encoding.

The ANN operators in operators/similarity.py are pure functions — they
(re)derive PQ codebooks, packed codes, int8 codes, and IVF centroid
assignments from the raw vectors every time they run. That is right
for oracle-checked catalog queries and wrong for deployment: at 100 TB
the encode pass is a full-corpus scan, and a production retrieval
stack runs it ONCE per ingest, stores the artifacts, and serves every
later query from the (64-256x smaller) stored index. This module is
that lifecycle, following the same manifest treatment bucketed tables
get (store/bucketed.py) and the reference's staged-snapshot-as-
artifact pattern (queens/core/read_write.py:340-404 — stage once,
read the snapshot thereafter):

- :func:`build_vector_index` runs the (one) corpus pass and persists
  per-index, under a VERSIONED directory:
    * ``pq_codes/``   parquet (id, pq_code)            — 4 B/vector
    * ``int8_codes/`` parquet (id, amax, q tinyint[])  — 1 B/dim
    * ``ivf_assign/`` parquet (id, centroid_id), partitioned BY
      centroid_id so a probe's scan prunes to n_probe directories
    * ``centroids/``  parquet (centroid_id, cq bigint[], cn2)
  plus a manifest entry (codebook ints, params, source fingerprint).
  The manifest is replaced ATOMICALLY after all artifact writes land
  (flip-flag convention, store/warehouse.py ingest protocol): a crash
  mid-build leaves the previous version live; stale version dirs are
  garbage-collected on the next successful build.
- :func:`load_vector_index` restores a :class:`VectorIndex` in ANY
  later session from the manifest alone — no touch of the raw
  vectors. An optional expected fingerprint turns a stale index
  (source re-ingested since the build) into a rebuild signal.

Search methods mirror the operator-tier semantics bit-for-bit (same
codebooks -> same codes -> same DuckDB twins), so a catalog query can
swap its inline encode for the stored index without changing its
oracle. All quantities are the exact fixed-point integers of
operators/similarity.py; nothing here introduces new arithmetic.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from queens_spark.operators.similarity import (
    PQ_M,
    QUANT,
    int8_quantize,
    int_norm2,
    pq_adc_lut_int,
    pq_adc_topk,
    pq_encode_int,
    pq_refine_codebooks,
    quantize,
)

MANIFEST_NAME = "vector_index_manifest.json"


def _paths(entry_val) -> list[str]:
    """Artifact path entries are a single dir (initial build) or a
    list of segment dirs (after appends); normalize to a list."""
    return list(entry_val) if isinstance(entry_val, list) else [entry_val]


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def _read_manifest(index_dir: str) -> dict:
    try:
        with open(_manifest_path(index_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_manifest(index_dir: str, entries: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = _manifest_path(index_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(index_dir))


def source_fingerprint(*paths: str) -> str:
    """Cheap re-ingest detector: (size, mtime_ns) of each source path
    (file or directory of parquet parts). Any rewrite of the source
    changes it, so a loader passing the current fingerprint turns a
    stale stored index into a rebuild instead of silently serving
    pre-re-ingest vectors."""
    parts = []
    for p in paths:
        st = os.stat(p)
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.startswith((".", "_")):
                    continue
                fst = os.stat(os.path.join(p, f))
                parts.append(f"{f}:{fst.st_size}:{fst.st_mtime_ns}")
        else:
            parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _write_int8(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    meta_cols: list[str] | None,
    path: str,
) -> None:
    """(id[, meta...], amax, q tinyint[]) — the int8 artifact, meta
    co-located like the PQ codes so filtered searches push down."""
    df.select(
        F.col(id_col),
        *[F.col(c) for c in (meta_cols or [])],
        int8_quantize(vec_col).alias("z"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in (meta_cols or [])],
        F.col("z.amax").alias("amax"),
        F.col("z.q").alias("q"),
    ).write.mode("overwrite").parquet(path)


class VectorIndex:
    """A loaded index: search entry points over the STORED artifacts.

    Construct via :func:`build_vector_index` / :func:`load_vector_index`;
    the instance holds only the manifest entry (paths + the
    driver-scale codebook) — every search is a plan over the parquet
    artifacts, never the raw vectors (stage 2 of
    :meth:`two_stage_search` joins the caller's corpus frame on the
    shortlist ids only).
    """

    def __init__(self, spark: SparkSession, name: str, entry: dict):
        self.spark = spark
        self.name = name
        self.entry = entry
        self.id_col = entry["id_col"]
        self.m = int(entry["m"])
        self.codebook: list[list[int]] = [
            [int(x) for x in row] for row in entry["codebook"]
        ]
        self.fingerprint = entry.get("fingerprint")
        # collected centroid rows, filled on first probe: a query BATCH
        # (q116's ten branches) probes once per query, and the stored
        # centroid frame is version-pinned for this instance's lifetime
        # — one collect serves them all
        self._centroid_rows: list | None = None

    # ------------------------------------------------------ artifacts

    def _tombstones_covering(self, seg_idx: int) -> DataFrame | None:
        """Deleted ids that apply to artifact segment *seg_idx*.
        Tombstones are COVERAGE-SCOPED: each delete records how many
        artifact segments existed when it was written and hides its
        ids only in those — so re-appending a deleted id serves the
        NEW segment's vector while the old physical row stays hidden
        (the latest-version-wins semantics of the warehouse, expressed
        index-side). None when no delete covers the segment (the
        common case: the reader then adds NO join at all, preserving
        the zero-join probe plans)."""
        dels = [
            d for d in (self.entry.get("deletes_path") or [])
            if int(d["covers"]) > seg_idx
        ]
        if not dels:
            return None
        return self.spark.read.parquet(
            *[d["path"] for d in dels]
        ).select(self.id_col)

    def _minus_deleted(self, df: DataFrame, seg_idx: int) -> DataFrame:
        """Anti-join the covering tombstones out of one artifact
        segment's scan. The tombstone side is deletes-sized (AQE
        broadcasts it while it is small — the usual state between
        compactions; a huge tombstone set is the signal to run
        compact_vector_index, which applies deletes physically and
        removes this join entirely)."""
        t = self._tombstones_covering(seg_idx)
        return df if t is None else df.join(t, self.id_col, "left_anti")

    def _read_segments(self, paths_entry) -> DataFrame:
        """Union the artifact segments with per-segment tombstone
        scoping. Without deletes this is ONE multi-path scan (plan
        shape unchanged); with deletes each segment anti-joins only
        the tombstones that cover it."""
        paths = _paths(paths_entry)
        if not (self.entry.get("deletes_path") or []):
            return self.spark.read.parquet(*paths)
        out = None
        for i, p in enumerate(paths):
            df = self._minus_deleted(self.spark.read.parquet(p), i)
            out = df if out is None else out.unionByName(df)
        return out

    def pq_codes(self) -> DataFrame:
        return self._read_segments(self.entry["pq_codes_path"])

    def int8_codes(self) -> DataFrame:
        return self._read_segments(self.entry["int8_codes_path"])

    def ivf_assignment(self) -> DataFrame:
        if not self.entry.get("ivf_assign_path"):
            raise ValueError(f"index {self.name!r} was built without IVF")
        # each segment is its own centroid_id-partitioned root, so
        # segments read separately (multi-root partition discovery
        # conflicts) and union — a cell predicate partition-prunes
        # inside EVERY segment scan, and union adds no exchange
        out = None
        for i, p in enumerate(_paths(self.entry["ivf_assign_path"])):
            df = self._minus_deleted(self.spark.read.parquet(p), i)
            out = df if out is None else out.unionByName(df)
        return out

    def centroids(self) -> DataFrame:
        if not self.entry.get("centroids_path"):
            raise ValueError(f"index {self.name!r} was built without IVF")
        return self.spark.read.parquet(self.entry["centroids_path"])

    # ------------------------------------------------------- searches

    def _filtered(self, df: DataFrame, predicate) -> DataFrame:
        """Apply a metadata *predicate* (Column or SQL string) to an
        index artifact scan. The index must have been built with
        ``meta_cols`` carrying the referenced columns — the predicate
        then PUSHES DOWN into the codes scan (parquet row-group skip),
        the filtered-vector-search shape: restrict first, rank the
        survivors, k never starves the way post-filtering a top-k
        does."""
        if predicate is None:
            return df
        if not self.entry.get("meta_cols"):
            raise ValueError(
                f"index {self.name!r} was built without meta_cols; "
                "rebuild with meta_cols=[...] to filter searches"
            )
        return df.where(
            F.expr(predicate) if isinstance(predicate, str) else predicate
        )

    def adc_topk(
        self, query_vec: list[float], k: int = 10, predicate=None
    ) -> DataFrame:
        """PQ/ADC top-k over the STORED packed codes: the LUT comes
        from the manifest codebook (driver-side ints), the scan reads
        4 B/vector, TakeOrdered keeps the codes frame shuffle-free —
        and no encode stage exists anywhere in the plan. *predicate*
        (over ``meta_cols``) restricts candidates scan-side."""
        lut = pq_adc_lut_int(query_vec, self.codebook, self.m)
        return pq_adc_topk(
            self._filtered(self.pq_codes(), predicate),
            self.id_col, lut, k=k,
        )

    def two_stage_search(
        self,
        corpus: DataFrame,
        vec_col: str,
        query_vec: list[float],
        shortlist: int = 50,
        k: int = 10,
    ) -> DataFrame:
        """q103's deployment shape from the stored index: ADC over the
        stored codes for a *shortlist*-candidate pool (the only pass
        touching every row — of the 4-byte codes, not the vectors),
        then exact integer-cosine re-rank of ONLY those raw vectors
        (a candidate-sized broadcast-join lookup). Bit-identical to
        the inline pipeline on the same codebook, so the q103 oracle
        is unchanged."""
        short = self.adc_topk(query_vec, k=shortlist).select(self.id_col)
        return self._exact_rerank(corpus, vec_col, query_vec, short, k)

    def _exact_rerank(
        self,
        corpus: DataFrame,
        vec_col: str,
        query_vec: list[float],
        short: DataFrame,
        k: int,
    ) -> DataFrame:
        """Stage 2 shared by the two-stage searches: exact integer
        cosine over ONLY the shortlisted raw vectors (broadcast-join
        lookup), TakeOrdered finish."""
        from queens_spark.operators.similarity import (
            cosine_from_ints,
            int_dot,
            lit_array,
        )

        qq = quantize(lit_array(query_vec, "double"))
        v = corpus.join(F.broadcast(short), self.id_col).select(
            self.id_col, quantize(vec_col).alias("vq")
        )
        cos = cosine_from_ints(
            int_dot(F.col("vq"), qq), int_norm2(F.col("vq")), int_norm2(qq)
        )
        return (
            v.select(self.id_col, cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(self.id_col))
            .limit(k)
        )

    def ivfpq_two_stage(
        self,
        corpus: DataFrame,
        vec_col: str,
        query_vec: list[float],
        n_probe: int = 2,
        shortlist: int = 50,
        k: int = 10,
        predicate=None,
    ) -> DataFrame:
        """The full FAISS-style deployment pipeline from the stored
        index: cell-pruned ADC shortlist (:meth:`ivfpq_topk` — one
        partition-pruned scan of 4 B/vector over n_probe cells), then
        exact integer-cosine re-rank of ONLY the shortlisted raw
        vectors. At 100 TB the corpus is touched for *shortlist* rows
        and scanned for n_probe/n_cells of its 4-byte codes — nothing
        else moves."""
        short = self.ivfpq_topk(
            query_vec, n_probe=n_probe, k=shortlist, predicate=predicate
        ).select(self.id_col)
        return self._exact_rerank(corpus, vec_col, query_vec, short, k)

    def int8_topk(
        self, query_ids: list[int], k: int = 10, predicate=None
    ) -> DataFrame:
        """Inner-product top-k over the STORED int8 codes (1 byte/dim
        — 4× less scan than fp32) for a small batch of indexed query
        ids: per-query TakeOrdered branches union into one job, no
        shuffle, no quantize stage — the stored-artifact twin of
        operators/similarity.py:int8_topk_ip."""
        from queens_spark.operators.similarity import int8_topk_ip_codes

        codes = self.int8_codes()
        return int8_topk_ip_codes(
            codes,
            self.id_col,
            query_ids,
            k=k,
            candidates=(
                None
                if predicate is None
                else self._filtered(codes, predicate)
            ),
        )

    def batch_adc_topk(
        self,
        queries_df: DataFrame,
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
        k: int = 10,
        predicate=None,
    ) -> DataFrame:
        """TABLE-driven ADC retrieval over the stored codes: one pass
        of the 4-byte codes artifact scores the whole query block
        (per-query LUTs from the manifest codebook broadcast;
        per-partition running pools; the codes never shuffle — see
        :func:`~queens_spark.operators.similarity.batch_adc_topk`).
        The throughput shape of offline eval / hard-negative mining
        against a deployed index."""
        from queens_spark.operators.similarity import (
            MAX_BATCH_QUERIES,
            batch_adc_topk,
        )

        rows = queries_df.select(
            F.col(query_id_col).alias("qid"),
            F.col(query_vec_col).alias("v"),
        ).limit(MAX_BATCH_QUERIES + 1).collect()
        if len(rows) > MAX_BATCH_QUERIES:
            raise ValueError(
                f"query table exceeds the broadcast cap "
                f"({MAX_BATCH_QUERIES}); shard the query table"
            )
        qids = [int(r["qid"]) for r in rows]
        luts = [
            pq_adc_lut_int(
                [float(x) for x in r["v"]], self.codebook, self.m
            )
            for r in rows
        ]
        return batch_adc_topk(
            self._filtered(self.pq_codes(), predicate),
            self.id_col, qids, luts, k=k,
        )

    def describe(self) -> dict:
        """Manifest summary for ops tooling: what is stored, where,
        how many segments, built with which params."""
        e = self.entry
        return {
            "name": self.name,
            "version": int(e["version"]),
            "m": self.m,
            "vec_col": e["vec_col"],
            "id_col": self.id_col,
            "ivf_cells": len(e.get("centroid_ids") or []),
            "coarse_iters": int(e.get("coarse_iters", 0)),
            "meta_cols": e.get("meta_cols"),
            "segments": len(_paths(e["pq_codes_path"])),
            "tombstone_segments": len(_paths(e.get("deletes_path") or [])),
            "fingerprint": e.get("fingerprint"),
        }

    def cell_stats(self) -> DataFrame:
        """(centroid_id, n_vectors) — the IVF balance audit. Skewed
        cells mean a hot probe scans a disproportionate share of the
        corpus; rebuild with better-spread centroid_ids (or more
        cells) when max/median blows up. One counter-width aggregation
        over the assignment scan."""
        return (
            self.ivf_assignment()
            .groupBy(F.col("centroid_id").cast("bigint").alias("centroid_id"))
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        )

    def probe_cells(
        self, query_vec: list[float], n_probe: int = 2
    ) -> list[int]:
        """Ids of the *n_probe* cells nearest the query (stored coarse
        quantizer) — centroid scoring is a driver-scale pass over the
        stored centroid frame, same exact quantized-cosine arithmetic
        and (cosine DESC, centroid_id ASC) tie-break as
        :func:`~queens_spark.operators.similarity.ivf_assign`."""
        import math

        if self._centroid_rows is None:
            self._centroid_rows = self.centroids().collect()
        cents = self._centroid_rows
        q = [int(math.floor(float(x) * QUANT)) for x in query_vec]
        qn = math.sqrt(float(sum(x * x for x in q)))
        if qn == 0.0:
            raise ValueError(
                "query vector has zero quantized norm (all components "
                f"in [0, 1/{QUANT})); cosine is undefined"
            )
        zero_cells = [int(r["centroid_id"]) for r in cents if not r["cn2"]]
        if zero_cells:
            raise ValueError(
                f"stored centroids {zero_cells} have zero norm; "
                "rebuild the index with non-degenerate centroid_ids"
            )

        def cos(row) -> float:
            dot = sum(int(a) * int(b) for a, b in zip(row["cq"], q))
            return float(dot) / (math.sqrt(float(row["cn2"])) * qn)

        ranked = sorted(
            cents, key=lambda r: (-cos(r), int(r["centroid_id"]))
        )[: int(n_probe)]
        return [int(r["centroid_id"]) for r in ranked]

    def ivf_candidate_ids(
        self, query_vec: list[float], n_probe: int = 2
    ) -> DataFrame:
        """Ids in the *n_probe* probed cells: the assignment scan's
        ``centroid_id IN (...)`` predicate is a PARTITION filter (the
        assignment is partitioned by centroid_id on disk), so only
        the probed cells' files are read."""
        probe = self.probe_cells(query_vec, n_probe)
        return self.ivf_assignment().where(
            F.col("centroid_id").isin(probe)
        ).select(self.id_col)

    def ivfpq_topk(
        self,
        query_vec: list[float],
        n_probe: int = 2,
        k: int = 10,
        predicate=None,
    ) -> DataFrame:
        """FAISS-style IVF-PQ search over the STORED layout: the
        assignment artifact carries each vector's packed PQ code
        co-located in its cell's disk partition, so a probe is ONE
        pruned scan — read only the n_probe probed cells' directories
        (partition filter), ADC-score their 4-byte codes against the
        manifest-codebook LUT, TakeOrdered k. No joins, no shuffles,
        no encode stage, and the fraction of the corpus read is
        n_probe/n_cells of 4 B/vector — the scan shape that keeps a
        100 TB corpus searchable in sub-second from parquet alone."""
        entry_codes = self.ivf_assignment()
        if "pq_code" not in entry_codes.columns:
            raise ValueError(
                f"index {self.name!r} predates the IVF-PQ layout "
                "(no pq_code in the assignment artifact); rebuild"
            )
        probe = self.probe_cells(query_vec, n_probe)
        lut = pq_adc_lut_int(query_vec, self.codebook, self.m)
        return pq_adc_topk(
            self._filtered(
                entry_codes.where(F.col("centroid_id").isin(probe)),
                predicate,
            ),
            self.id_col,
            lut,
            k=k,
        )


def build_vector_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    name: str,
    index_dir: str,
    seed_vecs: list[list[float]] | None = None,
    n_seeds: int = 16,
    m: int = PQ_M,
    refine_iters: int = 0,
    centroid_ids: list[int] | None = None,
    coarse_iters: int = 0,
    fingerprint: str | None = None,
    meta_cols: list[str] | None = None,
) -> VectorIndex:
    """ONE corpus pass per artifact, then the manifest flip.

    Codebook seeds default to the first *n_seeds* vectors by id (the
    q33/q97 convention); *refine_iters* Lloyd rounds
    (:func:`pq_refine_codebooks`) train them in place — the stored
    codebook is whatever the encode used, so ADC LUTs from the
    manifest always match the stored codes. With *centroid_ids*, the
    IVF coarse quantizer (assignment + centroid frame) is persisted
    too, the assignment disk-partitioned by cell for probe-time
    partition pruning; *coarse_iters* Lloyd rounds
    (:func:`~queens_spark.operators.similarity.train_coarse_centroids`)
    TRAIN those cells before anything persists — seed cells are just
    starting points, and trained cells fix the skew that makes a hot
    probe scan half the corpus (audit with :meth:`VectorIndex.cell_stats`).
    *fingerprint* (see :func:`source_fingerprint`)
    records what was indexed, for staleness detection at load.
    *meta_cols* co-locates the named metadata columns with the codes
    (and, via the build join, with the cell-partitioned assignment),
    so searches can take a scan-side ``predicate``.
    """
    entries = _read_manifest(index_dir)
    version = int(entries.get(name, {}).get("version", 0)) + 1
    vdir = os.path.join(index_dir, name, f"v{version}")

    if seed_vecs is None:
        seed_rows = (
            df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
            .orderBy("__id")
            .limit(n_seeds)
            .collect()
        )
        if len(seed_rows) < 2:
            raise ValueError(
                f"need >= 2 vectors to seed a codebook, got {len(seed_rows)}"
            )
        seed_vecs = [[float(x) for x in r["__v"]] for r in seed_rows]
    import math

    if refine_iters:
        cb = _refine_int(df, vec_col, id_col, seed_vecs, m, refine_iters)
    else:
        cb = [
            [int(math.floor(float(x) * QUANT)) for x in v] for v in seed_vecs
        ]

    codes_path = os.path.join(vdir, "pq_codes")
    pq_encode_int(
        df, vec_col, id_col, cb, m, extra_cols=meta_cols
    ).write.mode("overwrite").parquet(codes_path)

    int8_path = os.path.join(vdir, "int8_codes")
    _write_int8(df, vec_col, id_col, meta_cols, int8_path)

    ivf_path = cent_path = None
    if centroid_ids:
        from queens_spark.operators.similarity import ivf_assign

        cent_path = os.path.join(vdir, "centroids")
        if coarse_iters:
            from queens_spark.operators.similarity import (
                train_coarse_centroids,
            )

            trained = train_coarse_centroids(
                df, vec_col, id_col,
                [int(c) for c in centroid_ids], iters=coarse_iters,
            )
            df.sparkSession.createDataFrame(
                [
                    (cid, cq, sum(x * x for x in cq))
                    for cid, cq in trained
                ],
                "centroid_id bigint, cq array<bigint>, cn2 bigint",
            ).write.mode("overwrite").parquet(cent_path)
        else:
            (
                df.where(
                    F.col(id_col).isin([int(c) for c in centroid_ids])
                )
                .select(
                    F.col(id_col).cast("bigint").alias("centroid_id"),
                    quantize(vec_col).alias("cq"),
                )
                .withColumn("cn2", int_norm2(F.col("cq")))
                .write.mode("overwrite")
                .parquet(cent_path)
            )
        ivf_path = os.path.join(vdir, "ivf_assign")
        # The assignment carries each vector's packed PQ code
        # CO-LOCATED in its cell's disk partition (the FAISS IVFPQ
        # layout): an ivfpq_topk probe is then one partition-pruned
        # scan of 4 B/vector — no id join back to the codes artifact.
        # Build-time id join only; read from the already-written codes
        # parquet so the encode pass runs once. Assignment always goes
        # through the WRITTEN centroid frame, so trained and untrained
        # cells take the identical path.
        codes = df.sparkSession.read.parquet(codes_path)
        (
            ivf_assign(
                df, vec_col, id_col,
                centroids_df=df.sparkSession.read.parquet(cent_path),
            )
            .select(F.col(id_col), F.col("centroid_id"))
            .join(codes, id_col)
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(ivf_path)
        )

    entry = {
        "version": version,
        "vec_col": vec_col,
        "id_col": id_col,
        "m": m,
        "codebook": cb,
        "pq_codes_path": codes_path,
        "int8_codes_path": int8_path,
        "ivf_assign_path": ivf_path,
        "centroids_path": cent_path,
        "centroid_ids": [int(c) for c in centroid_ids] if centroid_ids else None,
        "coarse_iters": int(coarse_iters),
        "meta_cols": list(meta_cols) if meta_cols else None,
        "fingerprint": fingerprint,
    }
    entries[name] = entry
    _write_manifest(index_dir, entries)
    # GC superseded versions only AFTER the manifest flip — readers of
    # the old manifest never see a half-deleted tree
    base = os.path.join(index_dir, name)
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{version}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return VectorIndex(df.sparkSession, name, entry)


def _refine_int(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    seed_vecs: list[list[float]],
    m: int,
    iters: int,
) -> list[list[int]]:
    """Iterated Lloyd rounds staying integer-exact end-to-end: round 1
    quantizes the float seeds exactly as the encoder would
    (:func:`pq_refine_codebooks`); every later round feeds the
    refined INTEGER codebook straight back through
    :func:`pq_refine_codebooks_int` — it never round-trips through
    floats, so the stored codebook is bit-portable at any depth."""
    from queens_spark.operators.similarity import pq_refine_codebooks_int

    cb = pq_refine_codebooks(df, vec_col, id_col, seed_vecs, m)
    for _ in range(int(iters) - 1):
        cb = pq_refine_codebooks_int(df, vec_col, id_col, cb, m)
    return cb


def append_vector_index(
    df_new: DataFrame,
    name: str,
    index_dir: str,
    fingerprint: str | None = None,
    token: str | None = None,
) -> VectorIndex:
    """O(new-data) index refresh: encode ONLY *df_new*'s vectors with
    the STORED codebook / quantizers and add them as a new SEGMENT of
    each artifact — the ingest-time shape of a production index
    (codebook trained once; every append is one pass over the batch,
    never the corpus), mirroring the warehouse's incremental staging
    (O(changed-data), store/warehouse.py).

    Bit-equivalence: the stored integer codebook and centroids are
    what a full rebuild over (old ∪ new) would derive when seeds come
    from the original corpus, so appended codes are IDENTICAL to that
    rebuild's — searches cannot tell the difference (tested).

    Crash safety: segment dirs are written first, the manifest flips
    LAST (same convention as the build); a crash mid-append leaves
    unlisted orphan dirs that no reader ever sees. *fingerprint*
    replaces the stored one (the post-append source state). The
    caller owns id novelty for LIVE ids — appending an already-indexed
    live id would surface it twice, exactly like double-ingesting a
    row. Appending a DELETED id is the supported re-ingest path: the
    coverage-scoped tombstone keeps hiding the old segments' row and
    the new segment serves (see :func:`delete_from_vector_index`).
    """
    from queens_spark.operators.similarity import ivf_assign

    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no vector index {name!r} in {index_dir}; build first"
        )
    entry = dict(entries[name])
    # idempotency token: an already-applied token is a no-op (the
    # exactly-once pair of the ledger's token replay)
    if token is not None and str(token) in (
        entry.get("applied_tokens") or []
    ):
        return VectorIndex(df_new.sparkSession, name, entry)
    vec_col, id_col = entry["vec_col"], entry["id_col"]
    meta = entry.get("meta_cols")
    cb = [[int(x) for x in row] for row in entry["codebook"]]
    vdir = os.path.join(index_dir, name, f"v{entry['version']}")
    seg = len(_paths(entry["pq_codes_path"]))

    codes_path = os.path.join(vdir, f"pq_codes_seg{seg}")
    pq_encode_int(
        df_new, vec_col, id_col, cb, int(entry["m"]), extra_cols=meta
    ).write.mode("overwrite").parquet(codes_path)

    int8_path = os.path.join(vdir, f"int8_codes_seg{seg}")
    _write_int8(df_new, vec_col, id_col, meta, int8_path)

    entry["pq_codes_path"] = _paths(entry["pq_codes_path"]) + [codes_path]
    entry["int8_codes_path"] = _paths(entry["int8_codes_path"]) + [int8_path]

    if entry.get("ivf_assign_path"):
        spark = df_new.sparkSession
        cents = spark.read.parquet(entry["centroids_path"])
        ivf_path = os.path.join(vdir, f"ivf_assign_seg{seg}")
        codes = spark.read.parquet(codes_path)
        (
            ivf_assign(df_new, vec_col, id_col, centroids_df=cents)
            .select(F.col(id_col), F.col("centroid_id"))
            .join(codes, id_col)
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(ivf_path)
        )
        entry["ivf_assign_path"] = _paths(entry["ivf_assign_path"]) + [
            ivf_path
        ]

    if token is not None:
        entry["applied_tokens"] = list(
            entry.get("applied_tokens") or []
        ) + [str(token)]
    if fingerprint is not None:
        entry["fingerprint"] = fingerprint
    entries[name] = entry
    _write_manifest(index_dir, entries)
    return VectorIndex(df_new.sparkSession, name, entry)


def delete_from_vector_index(
    spark: SparkSession,
    index_dir: str,
    name: str,
    ids: list | DataFrame | None = None,
    predicate=None,
) -> VectorIndex:
    """Tombstone deletes — the index-side analog of the warehouse's
    latest-version-wins staging: a production index over a re-ingested
    or re-deduped corpus must be able to retire vectors without a
    full rebuild.

    Writes the doomed ids as a new DELETES segment (one narrow id
    column); every artifact reader (pq_codes / int8_codes /
    ivf_assignment) anti-joins the tombstones, so ALL search entry
    points exclude them immediately. The physical rows stay on disk
    until :func:`compact_vector_index`, which applies deletes
    physically and drops the tombstone set (restoring the zero-join
    probe plans). *ids* is an explicit list; *predicate* (Column or
    SQL string over ``meta_cols``) deletes by metadata — resolved
    against the stored codes scan, no raw-vector touch. Crash safety:
    the segment lands first, the manifest flips last (an orphan
    deletes dir no reader sees).

    Tombstones are coverage-scoped (they record how many artifact
    segments existed at delete time and hide their ids only there),
    so deleting an id that was never indexed is a harmless tombstone
    and RE-APPENDING a deleted id via :func:`append_vector_index`
    serves the new segment's vector while the old row stays hidden —
    no tombstone surgery needed."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no vector index {name!r} in {index_dir}; build first"
        )
    entry = dict(entries[name])
    id_col = entry["id_col"]
    idx = VectorIndex(spark, name, entry)
    if (ids is None) == (predicate is None):
        raise ValueError("pass exactly one of ids= or predicate=")
    if isinstance(ids, DataFrame):
        # takedown-artifact route (store/takedown.py): the doomed set
        # stays a frame end to end — never collected to the driver
        doomed = ids.select(
            F.col(ids.columns[0]).cast("bigint").alias(id_col)
        ).distinct()
    elif ids is not None:
        if not list(ids):
            return idx
        doomed = spark.createDataFrame(
            [(int(i),) for i in ids], [id_col]
        ).distinct()
    else:
        doomed = idx._filtered(idx.pq_codes(), predicate).select(id_col)
    vdir = os.path.join(index_dir, name, f"v{entry['version']}")
    # monotonic counter, never reused — an append that rewrites the
    # tombstone set shrinks the PATH LIST, so len() could re-derive a
    # live dir name (the compact→ingest→compact collision class)
    seg = int(entry.get(
        "next_delete_seg", len(_paths(entry.get("deletes_path") or []))
    ))
    del_path = os.path.join(vdir, f"deletes_seg{seg}")
    doomed.write.mode("overwrite").parquet(del_path)
    entry["deletes_path"] = list(entry.get("deletes_path") or []) + [
        {
            "path": del_path,
            "covers": len(_paths(entry["pq_codes_path"])),
        }
    ]
    entry["next_delete_seg"] = seg + 1
    entries[name] = entry
    _write_manifest(index_dir, entries)
    return VectorIndex(spark, name, entry)


def compact_vector_index(
    spark: SparkSession,
    index_dir: str,
    name: str,
    clear_applied_tokens: bool = False,
) -> VectorIndex:
    """Merge a many-segment index (long append history) back into one
    artifact set — the maintenance pass completing the lifecycle the
    way :meth:`Warehouse.compact` does for fragmented tables. Pure
    rewrite of the STORED artifacts (no re-encode, no corpus touch):
    a new version dir gets the unioned codes / assignment / centroids,
    the manifest flips to single-path entries, superseded versions GC
    after the flip. Content is byte-for-byte the same rows, so every
    search is unchanged (tested).

    *clear_applied_tokens* drops the idempotency-token list — ONLY
    safe strictly AFTER ledger compaction cleared its token map (a
    replayed token then re-screens to accepted=0 and never reaches
    the index); see :func:`~queens_spark.store.text_index.compact_text_index`
    for the full tandem contract. ``Engine.maintain`` sequences both."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no vector index {name!r} in {index_dir}; build first"
        )
    entry = dict(entries[name])
    if all(
        len(_paths(entry[key])) == 1
        for key in ("pq_codes_path", "int8_codes_path")
        if entry.get(key)
    ) and (
        not entry.get("ivf_assign_path")
        or len(_paths(entry["ivf_assign_path"])) == 1
    ) and not entry.get("deletes_path"):
        if clear_applied_tokens and entry.get("applied_tokens"):
            entry.pop("applied_tokens", None)
            entries[name] = entry
            _write_manifest(index_dir, entries)
        return VectorIndex(spark, name, entry)  # nothing to merge

    version = int(entry["version"]) + 1
    vdir = os.path.join(index_dir, name, f"v{version}")
    idx = VectorIndex(spark, name, entry)

    codes_path = os.path.join(vdir, "pq_codes")
    idx.pq_codes().write.mode("overwrite").parquet(codes_path)
    int8_path = os.path.join(vdir, "int8_codes")
    idx.int8_codes().write.mode("overwrite").parquet(int8_path)
    entry["pq_codes_path"] = codes_path
    entry["int8_codes_path"] = int8_path
    if entry.get("ivf_assign_path"):
        cent_path = os.path.join(vdir, "centroids")
        idx.centroids().write.mode("overwrite").parquet(cent_path)
        ivf_path = os.path.join(vdir, "ivf_assign")
        # centroid_id comes back as a string partition column
        # (type-inference is off session-wide); restore the written
        # bigint layout
        (
            idx.ivf_assignment()
            .withColumn(
                "centroid_id", F.col("centroid_id").cast("bigint")
            )
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(ivf_path)
        )
        entry["centroids_path"] = cent_path
        entry["ivf_assign_path"] = ivf_path
    # the artifact readers above already anti-joined the tombstones,
    # so the rewritten artifacts hold only live rows — deletes are now
    # applied PHYSICALLY; drop the tombstone set (restores the
    # zero-join probe plans) and reset its counter (fresh version dir:
    # old names cannot collide)
    entry["deletes_path"] = None
    entry["next_delete_seg"] = 0
    if clear_applied_tokens:
        entry.pop("applied_tokens", None)
    entry["version"] = version
    entries[name] = entry
    _write_manifest(index_dir, entries)
    base = os.path.join(index_dir, name)
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{version}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return VectorIndex(spark, name, entry)


def retrain_coarse_quantizer(
    df: DataFrame,
    name: str,
    index_dir: str,
    coarse_iters: int = 1,
) -> VectorIndex:
    """The maintenance op `cell_stats()` points at: when the audit
    shows a hot cell, retrain the coarse quantizer and REASSIGN
    without touching the PQ codebook or re-encoding anything — the
    stored codes are reused row-for-row; only the centroids frame and
    the cell-partitioned assignment rewrite (under a new version dir,
    manifest flips last, old version GC'd). Cost: coarse_iters Lloyd
    passes + one assignment pass over *df* (the indexed corpus) — no
    encode stage anywhere. ADC/int8/two-stage searches are unchanged
    (same codes); only which cells a probe prunes to improves.

    Requires a single-segment, tombstone-free index (compact first):
    the rewritten assignment is one segment, and stitching coverage-
    scoped tombstones or multi-segment code paths onto it would be
    guesswork rather than bookkeeping."""
    spark = df.sparkSession
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no vector index {name!r} in {index_dir}; build first"
        )
    entry = dict(entries[name])
    if not entry.get("centroid_ids"):
        raise ValueError(
            f"index {name!r} was built without IVF; nothing to retrain"
        )
    if entry.get("deletes_path") or len(_paths(entry["pq_codes_path"])) > 1:
        raise ValueError(
            "retrain requires a compacted index (single segment, no "
            "tombstones); run compact_vector_index first"
        )
    from queens_spark.operators.similarity import (
        ivf_assign,
        train_coarse_centroids,
    )

    vec_col, id_col = entry["vec_col"], entry["id_col"]
    trained = train_coarse_centroids(
        df, vec_col, id_col,
        [int(c) for c in entry["centroid_ids"]], iters=coarse_iters,
    )
    version = int(entry["version"]) + 1
    vdir = os.path.join(index_dir, name, f"v{version}")
    cent_path = os.path.join(vdir, "centroids")
    spark.createDataFrame(
        [(cid, cq, sum(x * x for x in cq)) for cid, cq in trained],
        "centroid_id bigint, cq array<bigint>, cn2 bigint",
    ).write.mode("overwrite").parquet(cent_path)
    # reuse the STORED codes verbatim; only the cell key changes
    codes = spark.read.parquet(entry["pq_codes_path"])
    ivf_path = os.path.join(vdir, "ivf_assign")
    (
        ivf_assign(
            df, vec_col, id_col,
            centroids_df=spark.read.parquet(cent_path),
        )
        .select(F.col(id_col), F.col("centroid_id"))
        .join(codes, id_col)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(ivf_path)
    )
    # codes/int8 artifacts stay in their existing version dir (the
    # manifest keeps pointing at them) — retrain therefore does NOT
    # GC old version dirs; superseded IVF dirs are harmless orphans
    # until the next full build/compact sweeps everything
    entry["centroids_path"] = cent_path
    entry["ivf_assign_path"] = ivf_path
    entry["coarse_iters"] = int(entry.get("coarse_iters", 0)) + int(
        coarse_iters
    )
    entry["version"] = version
    entries[name] = entry
    _write_manifest(index_dir, entries)
    return VectorIndex(spark, name, entry)


def rebalance_if_skewed(
    df: DataFrame,
    name: str,
    index_dir: str,
    max_over_median: float = 4.0,
    coarse_iters: int = 1,
) -> tuple[VectorIndex, bool]:
    """The audit→fix loop as one maintenance call: read
    :meth:`VectorIndex.cell_stats`, and when the hottest cell exceeds
    *max_over_median* × the median cell, run
    :func:`retrain_coarse_quantizer` (no re-encode — codes reused).
    Returns ``(index, retrained)``; schedule it after appends the way
    compaction is scheduled after ingests. The threshold is in
    probe-cost terms: a cell k× the median makes a probe that hits it
    read ~k× its fair share of the corpus."""
    spark = df.sparkSession
    idx = load_vector_index(spark, index_dir, name)
    sizes = sorted(
        int(r["n_vectors"]) for r in idx.cell_stats().collect()
    )
    if not sizes:
        return idx, False
    med = sizes[len(sizes) // 2]
    if med == 0 or sizes[-1] <= max_over_median * med:
        return idx, False
    return retrain_coarse_quantizer(
        df, name, index_dir, coarse_iters=coarse_iters
    ), True


def load_vector_index(
    spark: SparkSession,
    index_dir: str,
    name: str,
    expected_fingerprint: str | None = None,
) -> VectorIndex:
    """Restore a built index from the manifest — no corpus touch, no
    encode stage in any subsequent search plan. Raises KeyError if
    *name* was never built here and ValueError if
    *expected_fingerprint* says the source moved since the build (the
    caller rebuilds — serving a stale index would silently drop
    re-ingested vectors from every search)."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no vector index {name!r} in {index_dir}; "
            f"built: {sorted(entries)}"
        )
    entry = entries[name]
    if (
        expected_fingerprint is not None
        and entry.get("fingerprint") != expected_fingerprint
    ):
        raise ValueError(
            f"vector index {name!r} is stale (source fingerprint "
            f"changed since build); rebuild with build_vector_index"
        )
    return VectorIndex(spark, name, entry)


def build_or_load_vector_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    name: str,
    index_dir: str,
    fingerprint: str | None = None,
    spark: SparkSession | None = None,
    **build_kwargs,
) -> VectorIndex:
    """The ingest-hook composition: serve the stored index when its
    fingerprint still matches the source, rebuild otherwise. This is
    what a catalog query calls — first run pays the encode, every
    later session gets pure index reads.

    *df* may be a zero-arg callable returning the source frame (pass
    *spark* alongside): the warm-serve path then never constructs the
    corpus plan at all — plan construction is driver round trips, and
    for per-row-heavy sources it costs more than the artifact read the
    serve actually runs.

    A stored index also rebuilds when the caller asks for MORE than it
    was built with: requesting ``centroid_ids`` against an index built
    without IVF (or with different cells), or a different ``m``,
    upgrades it in place (version bump + manifest flip). Omitting a
    build kwarg means "whatever is stored is fine" — an IVF-capable
    index keeps serving callers that never probe."""
    if callable(df) and spark is None:
        df = df()
    if not callable(df):
        spark = df.sparkSession
    try:
        idx = load_vector_index(
            spark, index_dir, name,
            expected_fingerprint=fingerprint,
        )
        want_cells = build_kwargs.get("centroid_ids")
        if want_cells is not None and [int(c) for c in want_cells] != (
            idx.entry.get("centroid_ids") or []
        ):
            raise ValueError("stored index lacks the requested IVF cells")
        if "m" in build_kwargs and int(build_kwargs["m"]) != idx.m:
            raise ValueError("stored index has a different PQ m")
        if "coarse_iters" in build_kwargs and int(
            build_kwargs["coarse_iters"]
        ) != int(idx.entry.get("coarse_iters", 0)):
            raise ValueError(
                "stored index has a different coarse-quantizer training"
            )
        want_meta = build_kwargs.get("meta_cols")
        if want_meta is not None and not set(want_meta) <= set(
            idx.entry.get("meta_cols") or []
        ):
            raise ValueError("stored index lacks the requested meta_cols")
        return idx
    except (KeyError, ValueError):
        return build_vector_index(
            df() if callable(df) else df, vec_col, id_col, name,
            index_dir, fingerprint=fingerprint, **build_kwargs,
        )
