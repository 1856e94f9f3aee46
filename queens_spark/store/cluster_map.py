"""Stored dedup cluster map: the near-duplicate component assignment
and per-cluster canonical choice as a persisted warehouse artifact —
with O(batch) appends and coverage-scoped retirements.

The dedup front-end (operators/dedup.py: capped inverted index ∪
MinHash-LSH bands → connected components) is the most expensive pass
in the catalog, and every downstream consumer — duplicate filtering,
canonical selection, cluster-aware splits, leakage audits, cluster
histograms — recomputes it from the corpus. At 100 TB that's the same
multi-hour job run five times. This module gives the dedup tier the
posture the ANN and lexical tiers already have (store/vector_index.py,
store/text_index.py): pay the clustering ONCE, persist the
counter-width outputs, serve every consumer from artifact reads with
staleness fingerprints — and keep the map fresh after new ingests by
edging each batch against persisted MATCH ARTIFACTS instead of
re-clustering the corpus.

Exact verified-pair semantics (shared with the inline operators and
their DuckDB oracles): a pair (a, b) is a near-dup edge iff

    jaccard(a, b) >= threshold  AND
    ( a and b share a shingle with document frequency <= max_df
      OR  both carry a hot shingle (df > max_df) AND share an LSH
          band signature )

plus exact-copy edges (rep = min id per content fingerprint). The
candidate prune in operators/dedup.py is sound (never drops a true
pair), so this characterization is the COMPLETE edge definition —
which is what makes incremental maintenance exact.

Why ``max_df`` is FROZEN in the manifest (a matching parameter, like
``n`` and ``threshold``): document frequencies only GROW under
appends, so with a frozen cap an APPEND can only flip a shingle
rare→hot, never back — and every shingle that can still flip has
df <= max_df today, so its full posting list is inside the capped
postings artifact. A per-batch drifting cap would need postings of
already-hot shingles (unbounded, deliberately not stored) to un-flip
them. RETIREMENTS are the one operation that shrinks dfs: a
hot shingle whose df falls back under the frozen cap UN-FLIPS, and
:func:`retire_cluster_map` handles that exactly by recovering the
shingle's carriers from the docs artifact (all of them are hot docs)
and writing postings COMPLETION rows, restoring the
every-live-rare-shingle-has-complete-postings invariant appends rely
on — see its docstring. The cap is resolved from the corpus at build
(``auto_max_df``) and appends/retirements keep it; rebuild when the
corpus has grown enough that 1 % of the OLD size is no longer a sane
stop-shingle cap.

Append cost model (the 100 TB argument): one tokenize→hash pass over
the BATCH only; every old-corpus touch is a columnar artifact scan
(hashes, postings, fingerprints — never source text, never a corpus
re-tokenize) feeding broadcast-style joins that ship only AFFECTED
rows into shuffles. Affected = docs carrying a hotness-flipped
shingle (≤ |flips| × max_df by construction) plus the batch itself.
The graph artifacts (near/copy edges) rewrite per append — they are
dedup-graph-sized (a few % of a deduplicated corpus), not
corpus-sized. members/canonical write DELTA segments (changed docs /
changed components only); serving winner-selects by segment ordinal,
and a single-segment map (fresh build) serves plain artifact reads.

Artifact layout (versioned dir names from persisted monotonic
counters — never ``len(...)``; manifest flips LAST, the house crash
convention):

- ``seg_NNNNNN/`` (append-only; one per build/append/retire):
  ``docs`` (doc, n, hashes, fp) — the tokenize cache;
  ``postings`` (sh_hash, doc, n) — rare-at-write shingle postings
  (plus, on retirement segments, COMPLETION rows for un-flipped
  shingles' hot-era carriers);
  ``dfs`` (sh_hash, df) — this segment's document-frequency partials
  (NEGATIVE decrement rows on retirement segments, so sums stay
  survivor-correct);
  ``hot`` (sh_hash) — shingles that BECAME hot in this segment;
  ``hot_sigs`` (doc, sig) — docs that became hot in this segment;
  ``members`` / ``canonical`` — full tables at build, deltas on
  append/retire (canonical deltas tombstone vanished components with
  n_members = 0).
  Retirement segments additionally hold ``retired`` (coverage-scoped
  doc tombstones), ``unhot`` (shingles whose df fell back under the
  frozen cap), and ``unhot_docs`` (hot-doc demotions) — see
  :func:`retire_cluster_map`.
- ``graph_NNNNNN/``: ``near`` + ``copy`` edge lists, rewritten per
  operation; the superseded graph dir is GC'd after the flip.

Reference analog: derived state refreshed inside the write path
(queens/core/read_write.py:464-531 rebuilds staging metadata inside
the write); here the write is ``Engine.ingest``'s registry refresh.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from queens_spark.store.vector_index import source_fingerprint  # noqa: F401

MANIFEST_NAME = "cluster_map_manifest.json"

__all__ = [
    "build_cluster_map",
    "append_cluster_map",
    "retire_cluster_map",
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


def _clear_dir(path: str) -> None:
    """A build/append that crashed before its manifest flip leaves its
    dirs orphaned (counters never advanced) — clear so the retry can
    rewrite; the manifest never pointed at them, so nothing served."""
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)


def _projection(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """The persisted per-doc match projection: shingle-hash set +
    content fingerprint + quality, computed in ONE tokenize pass (the
    operators/dedup.py ``_shingle_frame`` shape, widened with the fp
    and quality the map also needs). This is the only stage that ever
    reads document TEXT."""
    from queens_spark.operators.dedup import _persist
    from queens_spark.operators.text import (
        doc_fingerprint,
        let_bound,
        quality_score,
    )
    from queens_spark.operators.dedup import shingle_hashes
    from queens_spark.session import ensure_min_partitions

    return _persist(
        ensure_min_partitions(df).select(
            F.col(id_col).alias("doc"),
            let_bound(
                shingle_hashes(text_col, n),
                lambda hs: F.struct(F.size(hs).alias("n"), hs.alias("hashes")),
            ).alias("x"),
            doc_fingerprint(text_col).alias("fp"),
            quality_score(text_col).alias("quality"),
        )
    )


def _write_postings(postings: DataFrame, path: str) -> None:
    """Postings land range-clustered on sh_hash so parquet row-group
    min/max statistics make the append's flipped-shingle lookup (a
    literal IN-list pushed into the scan) skip everything but the few
    row groups holding those hashes — at corpus scale that lookup is
    otherwise a full postings scan per append."""
    (
        postings.repartitionByRange("sh_hash")
        .sortWithinPartitions("sh_hash")
        .write.mode("errorifexists")
        .parquet(path)
    )


def _sig(hashes) -> F.Column:
    from queens_spark.operators.dedup import _signature_from_hashes

    return _signature_from_hashes(hashes)


def _bands(sigs: DataFrame) -> DataFrame:
    """Delegates to the ONE shared signature→band formula
    (operators/dedup.band_frame) — append==rebuild depends on the
    rebuild's banding and the append's bipartite banding staying
    byte-identical, so neither side owns a private copy."""
    from queens_spark.operators.dedup import band_frame

    return band_frame(sigs)


def _canonical_aggs(id_col: str):
    """The quality-aware canonical choice: best member by
    (quality, -id) plus the member count — shared by build and the
    append's per-affected-component recompute so stored and delta
    rows are bit-identical."""
    return [
        F.max(
            F.struct(
                F.col("quality").alias("q"),
                (-F.col(id_col)).alias("nid"),
            )
        ).alias("best"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    ]


def _canonical_select(frame: DataFrame) -> DataFrame:
    return frame.select(
        "component_id",
        (-F.col("best.nid")).cast("bigint").alias("best_doc_id"),
        F.col("best.q").alias("best_quality"),
        "n_members",
    )


def _retirements(entry: dict) -> list[dict]:
    return list(entry.get("retirements") or [])


def _doc_rows(
    spark: SparkSession, map_dir: str, entry: dict, sub: str
) -> DataFrame:
    """Tombstone-resolved union of the per-segment *sub* artifacts
    keyed by ``doc`` ("docs" / "postings" / "hot_sigs" / "members").
    Each retirement hides doc rows only in segments that existed when
    it ran (coverage-scoped — the vector/text tombstone convention),
    so an id re-appended AFTER its retirement serves its NEW rows (the
    document-revision route). hot_sigs additionally drops DEMOTED docs
    (carriers whose every hot shingle un-flipped at that retirement).
    With no retirements this is the plain multi-path read — identical
    plan to the pre-retirement seg_read."""
    rets = _retirements(entry)
    # each retirement's tombstone frame reads ONCE and is reused across
    # every segment it covers — not re-read per (segment × retirement)
    dead_frames = []
    for r in rets:
        dead = spark.read.parquet(
            os.path.join(map_dir, r["seg"], "retired")
        ).select("doc")
        if sub == "hot_sigs":
            dead = dead.union(
                spark.read.parquet(
                    os.path.join(map_dir, r["seg"], "unhot_docs")
                ).select("doc")
            )
        dead_frames.append((int(r["coverage"]), dead))
    frames = []
    for i, s in enumerate(entry["segments"]):
        f = spark.read.parquet(os.path.join(map_dir, s, sub))
        key = "doc" if "doc" in f.columns else entry["id_col"]
        for cov, dead in dead_frames:
            if cov <= i:
                continue
            # no broadcast hint: takedown lists are usually tiny (AQE
            # broadcasts them) but retention purges are not
            f = f.join(dead.withColumnRenamed("doc", key), key, "left_anti")
        frames.append(f)
    out = frames[0]
    for fr in frames[1:]:
        # BY NAME: the anti-join fronts its key, so tombstoned and
        # clean segments disagree on column ORDER — a positional union
        # would cross doc and sh_hash
        out = out.unionByName(fr)
    return out


def _hot_events(
    spark: SparkSession, map_dir: str, entry: dict
) -> DataFrame:
    """(ord, add, sh_hash) hotness events across the segments: build
    and append segments ADD hot shingles, retirement segments REMOVE
    un-flipped ones (``unhot``). Resolution is the ordinal walk in
    :func:`_resolve_hot_rows` — later segments win, so a shingle can
    un-flip at a retirement and legitimately RE-flip at a later
    append."""
    frames = []
    for i, s in enumerate(entry["segments"]):
        segdir = os.path.join(map_dir, s)
        frames.append(
            spark.read.parquet(os.path.join(segdir, "hot")).select(
                F.lit(i).alias("ord"),
                F.lit(True).alias("add"),
                "sh_hash",
            )
        )
        p_un = os.path.join(segdir, "unhot")
        if os.path.exists(p_un):
            frames.append(
                spark.read.parquet(p_un).select(
                    F.lit(i).alias("ord"),
                    F.lit(False).alias("add"),
                    "sh_hash",
                )
            )
    u = frames[0]
    for fr in frames[1:]:
        u = u.union(fr)
    return u


def _resolve_hot_rows(rows) -> set[int]:
    """Fold collected (ord, add, sh_hash) events into the CURRENT hot
    set. A single segment never holds both events for one shingle
    (retirements write only ``unhot``, builds/appends only ``hot``),
    so ordering within a segment is immaterial; across segments the
    ordinal walk applies history in write order."""
    hot: set[int] = set()
    for r in sorted(rows, key=lambda r: int(r["ord"])):
        if r["add"]:
            hot.add(int(r["sh_hash"]))
        else:
            hot.discard(int(r["sh_hash"]))
    return hot


def _resolve_hot(
    spark: SparkSession, map_dir: str, entry: dict
) -> list[int]:
    """The current hot-shingle list — driver-bounded like the build's
    hot list (every live hot shingle has df > max_df, so the set holds
    at most |postings mass| / max_df entries)."""
    return sorted(
        _resolve_hot_rows(_hot_events(spark, map_dir, entry).collect())
    )


def build_cluster_map(
    df: DataFrame,
    text_col: str,
    id_col: str,
    map_dir: str,
    n: int = 3,
    threshold: float = 0.8,
    fingerprint: str | None = None,
    max_df: int | str = "auto",
) -> "ClusterMap":
    """One clustering pass → persisted members + canonical + edges +
    the match artifacts appends edge against. The edge generation and
    CC are exactly the inline operators (q36/q60 semantics —
    operators/dedup.py:_full_recall_pairs + fp-rep copies); what's new
    is only WHERE the result lives. ``max_df`` resolves here
    (auto_max_df of the corpus count) and FREEZES in the manifest —
    see the module docstring for why appends must not drift it."""
    from queens_spark.operators.dedup import (
        _collect_hot,
        _full_recall_pairs,
        _persist,
        auto_max_df,
        connected_components,
    )

    spark = df.sparkSession
    manifest = _read_manifest(map_dir)
    version = int(manifest.get("next_version", 1))
    prior = manifest.get("current") or {}
    n_docs = df.count()
    if isinstance(max_df, str):
        if max_df != "auto":
            raise ValueError(f"max_df must be an int or 'auto'; got {max_df!r}")
        max_df = auto_max_df(n_docs)
    max_df = int(max_df)

    # dir names come from the persisted counters (never len(...)) so a
    # rebuild NEVER writes into a dir the live manifest references: a
    # crash before the flip leaves the old map fully intact and the new
    # dirs as GC-able orphans (the house artifacts-first convention)
    next_seg = int(prior.get("next_seg", 1))
    next_graph = int(prior.get("next_graph", 1))
    seg = f"seg_{next_seg:06d}"
    graph = f"graph_{next_graph:06d}"
    segdir = os.path.join(map_dir, seg)
    graphdir = os.path.join(map_dir, graph)
    # only the retry targets of a previously-crashed build are cleared
    _clear_dir(segdir)
    _clear_dir(graphdir)

    sh = _projection(df, text_col, id_col, n)
    near = _persist(
        _full_recall_pairs(sh, max_df, threshold).select("id_a", "id_b")
    )
    rep = F.min("doc").over(Window.partitionBy("fp"))
    copies = (
        sh.select("doc", rep.alias("rep_id"))
        .where(F.col("doc") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id_a"), F.col("doc").alias("id_b"))
    )
    near.write.mode("errorifexists").parquet(os.path.join(graphdir, "near"))
    copies.write.mode("errorifexists").parquet(os.path.join(graphdir, "copy"))
    stored_near = spark.read.parquet(os.path.join(graphdir, "near"))
    stored_copy = spark.read.parquet(os.path.join(graphdir, "copy"))

    comps = connected_components(
        df, stored_near.union(stored_copy), id_col
    )
    members = comps.join(
        sh.select(F.col("doc").alias(id_col), "quality"), id_col
    )
    members.write.mode("errorifexists").parquet(
        os.path.join(segdir, "members")
    )
    stored_members = spark.read.parquet(os.path.join(segdir, "members"))
    canonical = _canonical_select(
        stored_members.groupBy("component_id").agg(*_canonical_aggs(id_col))
    )
    canonical.write.mode("errorifexists").parquet(
        os.path.join(segdir, "canonical")
    )

    # ------------- match artifacts (what appends edge against) -------
    sh.select(
        "doc", F.col("x.n").alias("n"), F.col("x.hashes").alias("hashes"), "fp"
    ).write.mode("errorifexists").parquet(os.path.join(segdir, "docs"))
    exploded = sh.select(
        "doc", F.col("x.n").alias("n"), F.explode("x.hashes").alias("sh_hash")
    )
    hot = _collect_hot(exploded, max_df)
    hot_df = spark.createDataFrame([(int(h),) for h in hot], "sh_hash bigint")
    _write_postings(
        exploded.join(F.broadcast(hot_df), "sh_hash", "left_anti").select(
            "sh_hash", "doc", "n"
        ),
        os.path.join(segdir, "postings"),
    )
    exploded.groupBy("sh_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    ).write.mode("errorifexists").parquet(os.path.join(segdir, "dfs"))
    hot_df.write.mode("errorifexists").parquet(os.path.join(segdir, "hot"))
    hot_doc_ids = (
        exploded.join(F.broadcast(hot_df), "sh_hash", "left_semi")
        .select("doc")
        .distinct()
    )
    (
        sh.join(hot_doc_ids, "doc")
        .select("doc", _sig(F.col("x.hashes")).alias("sig"))
        .write.mode("errorifexists")
        .parquet(os.path.join(segdir, "hot_sigs"))
    )

    manifest.update(
        {
            "current": {
                "version": version,
                "id_col": id_col,
                "text_col": text_col,
                "n": int(n),
                "threshold": float(threshold),
                "max_df": max_df,
                "fingerprint": fingerprint,
                "n_docs": int(n_docs),
                "segments": [seg],
                "graph": graph,
                "next_seg": next_seg + 1,
                "next_graph": next_graph + 1,
                "applied_tokens": [],
            },
            "next_version": version + 1,
        }
    )
    _write_manifest(map_dir, manifest)
    # post-flip GC: superseded segments/graphs of the prior map AND any
    # pre-append-era v-dirs — the manifest no longer references them
    for d in sorted(os.listdir(map_dir)):
        if d in (seg, graph) or not os.path.isdir(os.path.join(map_dir, d)):
            continue
        if d.startswith(("seg_", "graph_", "v")):
            _clear_dir(os.path.join(map_dir, d))
    return ClusterMap(spark, map_dir)


def append_cluster_map(
    df: DataFrame, map_dir: str, token: str | None = None
) -> "ClusterMap":
    """Fold a NEW batch into the stored map — bit-identical to a full
    rebuild on the union at the map's frozen (n, threshold, max_df)
    (property-tested on random corpora and splits, including splits
    whose second half MERGES pre-existing clusters and flips shingle
    hotness), at O(batch + affected) cost and with zero old-corpus
    TEXT access: every old-corpus touch reads the match artifacts.

    Contract: batch ids must be NOVEL (the Engine.ingest registry path
    appends post-ledger-screen survivors, which guarantees it — the
    same id-novelty contract the vector/text index appends carry). A
    replayed *token* no-ops (the exactly-once redelivery contract).

    Exactness argument (the module docstring's edge characterization
    does the heavy lifting): with max_df frozen, dfs only grow, so
    (1) only shingles IN THE BATCH can flip rare→hot, and every
    flippable shingle's full old posting list is inside the capped
    postings artifact; (2) a stored near pair can DROP out of the
    union's edge set only if every shared rare shingle flipped — both
    endpoints then carry a flipped shingle, i.e. both are AFFECTED
    docs; (3) a brand-new old-old pair needs a newly-hot endpoint
    (affected) whose partner is hot — covered by banding affected+batch
    signatures against the persisted hot-doc signatures. So the append
    recomputes exactly: pairs with an affected-or-batch endpoint, fp
    groups touched by batch fingerprints, and components incident to
    changed edges; everything else is kept verbatim.
    """
    from queens_spark.operators.dedup import (
        _persist,
        _pruned_candidates,
        _rare_pair_counts,
        connected_components,
    )

    spark = df.sparkSession
    manifest = _read_manifest(map_dir)
    entry = manifest.get("current")
    if not entry or "segments" not in entry:
        raise FileNotFoundError(f"no appendable cluster map at {map_dir}")
    if token is not None and token in (entry.get("applied_tokens") or []):
        return ClusterMap(spark, map_dir)
    id_col = entry["id_col"]
    text_col = entry.get("text_col")
    if not text_col:
        raise ValueError(
            "cluster map predates text_col tracking — rebuild to append"
        )
    n, threshold, m = int(entry["n"]), float(entry["threshold"]), int(entry["max_df"])

    seg_name = f"seg_{int(entry['next_seg']):06d}"
    graph_name = f"graph_{int(entry['next_graph']):06d}"
    segdir = os.path.join(map_dir, seg_name)
    graphdir = os.path.join(map_dir, graph_name)
    _clear_dir(segdir)
    _clear_dir(graphdir)

    def seg_read(sub: str) -> DataFrame:
        return spark.read.parquet(
            *[os.path.join(map_dir, s, sub) for s in entry["segments"]]
        )

    B = _projection(df, text_col, id_col, n)
    n_batch = B.count()
    if n_batch == 0:
        if token is not None:
            entry["applied_tokens"] = list(
                entry.get("applied_tokens") or []
            ) + [str(token)]
            manifest["current"] = entry
            _write_manifest(map_dir, manifest)
        return ClusterMap(spark, map_dir)

    expl_B = B.select(
        "doc", F.col("x.n").alias("n"), F.explode("x.hashes").alias("sh_hash")
    )
    df_B = _persist(
        expl_B.groupBy("sh_hash").agg(
            F.count(F.lit(1)).cast("bigint").alias("df_b")
        )
    )
    # df_A for batch shingles only: the stored dfs segments are scanned
    # once, semi-restricted by the (broadcast) batch vocabulary — the
    # whole-vocab aggregate never materializes. Plain multi-path read:
    # retirement segments hold NEGATIVE decrement rows, so the sum is
    # survivor-correct with no tombstone join.
    df_A = (
        seg_read("dfs")
        .join(F.broadcast(df_B.select("sh_hash")), "sh_hash", "left_semi")
        .groupBy("sh_hash")
        .agg(F.sum("df").cast("bigint").alias("df_a"))
    )
    joined_df = df_B.join(df_A, "sh_hash", "left").select(
        "sh_hash",
        F.coalesce("df_a", F.lit(0)).cast("bigint").alias("df_a"),
        "df_b",
    )
    members_now = _members_frame(spark, map_dir, entry, id_col)
    # ONE driver round-trip for the three driver-bounded probes the
    # append needs (each was its own job before — at a streaming
    # micro-batch cadence the small-batch floor is jobs × fixed
    # latency):
    # - flips: rare before (df_a <= m — live hot shingles have
    #   df_a > m, so they self-exclude), hot after. Driver-bounded
    #   like the hot list: each flipped shingle ends with df > m, so
    #   |flips| <= |union postings| / m.
    # - hot events: the ordinal-resolved live hot set (retirements
    #   can have un-flipped stored-hot shingles).
    # - clash: the loud id-novelty guard — the ledger screens
    #   CONTENT, not ids, so a re-crawled id with edited text would
    #   silently leave a STALE docs row whose hash set supports kept
    #   near-pairs, corrupting the map rather than refreshing it.
    #   Retired ids are NOT clashes (their member rows are
    #   tombstoned): retire-then-reappend is the supported revision
    #   route; re-ingesting a LIVE id requires a rebuild.
    probe_rows = (
        joined_df.where(
            (F.col("df_a") <= m) & (F.col("df_a") + F.col("df_b") > m)
        )
        .select(
            F.lit("flip").alias("k"),
            F.col("sh_hash").cast("bigint").alias("v"),
            F.lit(0).alias("ord"),
            F.lit(True).alias("add"),
        )
        .union(
            _hot_events(spark, map_dir, entry).select(
                F.lit("hot").alias("k"),
                F.col("sh_hash").cast("bigint").alias("v"),
                F.col("ord"),
                F.col("add"),
            )
        )
        .union(
            B.select(F.col("doc").alias(id_col))
            .join(members_now.select(id_col), id_col, "left_semi")
            .limit(5)
            .select(
                F.lit("clash").alias("k"),
                F.col(id_col).cast("bigint").alias("v"),
                F.lit(0).alias("ord"),
                F.lit(True).alias("add"),
            )
        )
        .collect()
    )
    clash = [int(r["v"]) for r in probe_rows if r["k"] == "clash"]
    if clash:
        raise ValueError(
            "append_cluster_map: batch ids already present in the map "
            f"(e.g. {clash}) — appends require "
            "NOVEL ids; retire an id first to revise its document, or "
            "rebuild the map to re-ingest wholesale"
        )
    flipped = sorted(
        {int(r["v"]) for r in probe_rows if r["k"] == "flip"}
    )
    hot_stored = _resolve_hot_rows(
        [
            {"ord": r["ord"], "add": r["add"], "sh_hash": r["v"]}
            for r in probe_rows
            if r["k"] == "hot"
        ]
    )
    hot_u = sorted(hot_stored | set(flipped))
    hot_u_df = spark.createDataFrame(
        [(h,) for h in hot_u], "sh_hash bigint"
    )
    flipped_df = spark.createDataFrame(
        [(h,) for h in flipped], "sh_hash bigint"
    )

    stored_postings = _doc_rows(spark, map_dir, entry, "postings")
    # affected old docs: carriers of a flipped shingle. Flipped were
    # rare at EVERY earlier write (dfs only grow), so their postings
    # are complete in the capped artifact (<= |flips| * max_df rows) —
    # and the lookup is a LITERAL IN-list over the range-clustered
    # postings, so parquet row-group stats skip all but the few groups
    # holding those hashes (no full postings scan for this stage)
    if flipped:
        ad_ids = _persist(
            stored_postings.where(
                F.col("sh_hash").isin([int(h) for h in flipped])
            )
            .select("doc")
            .distinct()
        )
    else:
        ad_ids = spark.createDataFrame([], "doc bigint")
    stored_docs = _doc_rows(spark, map_dir, entry, "docs")
    ad_docs = _persist(stored_docs.join(ad_ids, "doc"))

    # ---------------- capped candidates (>=1 affected/batch endpoint)
    re_batch = expl_B.join(F.broadcast(hot_u_df), "sh_hash", "left_anti")
    sp_rare = stored_postings.join(
        F.broadcast(hot_u_df), "sh_hash", "left_anti"
    ).select("doc", "n", "sh_hash")
    re_ad = sp_rare.join(ad_ids, "doc", "left_semi")
    re_expl = _persist(re_batch.select("doc", "n", "sh_hash").union(re_ad))
    non_re = sp_rare.join(ad_ids, "doc", "left_anti")
    p1 = _rare_pair_counts(re_expl, None)
    p2_raw = _rare_pair_counts(re_expl, None, exploded_b=non_re)
    # the bipartite join assumes disjoint id spaces (true here) but not
    # ORDERED ones — normalize to id_a < id_b to match the rebuild
    swap = F.col("id_a") > F.col("id_b")
    p2 = p2_raw.select(
        F.when(swap, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
        F.when(swap, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
        F.when(swap, F.col("nb")).otherwise(F.col("na")).alias("na"),
        F.when(swap, F.col("na")).otherwise(F.col("nb")).alias("nb"),
        "rare_common",
    )
    capped = _pruned_candidates(p1.union(p2), len(hot_u), threshold, "jaccard")

    # ---------------- band candidates (>=1 affected/batch endpoint)
    batch_hot_ids = (
        expl_B.join(F.broadcast(hot_u_df), "sh_hash", "left_semi")
        .select("doc")
        .distinct()
    )
    sig_b = B.join(batch_hot_ids, "doc").select(
        "doc", _sig(F.col("x.hashes")).alias("sig")
    )
    # every affected doc carries a flipped (now hot) shingle → all are
    # hot in the union
    sig_ad = ad_docs.select("doc", _sig(F.col("hashes")).alias("sig"))
    sig_re = _persist(sig_b.union(sig_ad))
    stored_hot_sigs = _doc_rows(spark, map_dir, entry, "hot_sigs")
    all_hot_bands = _bands(stored_hot_sigs.union(sig_re))
    re_bands = _bands(sig_re).select(
        F.col("doc").alias("doc_r"), "band_id", "band_sig"
    )
    banded = (
        all_hot_bands.join(re_bands, ["band_id", "band_sig"])
        .where(F.col("doc") != F.col("doc_r"))
        .select(
            F.least("doc", "doc_r").alias("id_a"),
            F.greatest("doc", "doc_r").alias("id_b"),
        )
        .distinct()
    )

    # ---------------- exact verification (same formula as the rebuild)
    cands = capped.union(banded).distinct()
    endpoints = (
        cands.select(F.col("id_a").alias("doc"))
        .union(cands.select(F.col("id_b").alias("doc")))
        .distinct()
    )
    # the exact-Jaccard verification is dedup._verify_pairs VERBATIM
    # (shared formula — the rebuild verifies through the same code), fed
    # a lookup frame shaped like its (doc, x.hashes) projection
    from queens_spark.operators.dedup import _verify_pairs

    lookup = (
        B.select("doc", F.col("x.hashes").alias("hashes"))
        .union(stored_docs.select("doc", "hashes"))
        .join(endpoints, "doc", "left_semi")
        .select("doc", F.struct(F.col("hashes").alias("hashes")).alias("x"))
    )
    new_near = (
        _verify_pairs(cands, lookup)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )

    graph_old = os.path.join(map_dir, entry["graph"])
    stored_near = spark.read.parquet(os.path.join(graph_old, "near"))
    stored_copy = spark.read.parquet(os.path.join(graph_old, "copy"))
    # keep every stored pair unless BOTH endpoints are affected — only
    # those can lose their edge (exactness argument point 2); survivors
    # among the dropped are regenerated by the recompute above
    fa = ad_ids.select(F.col("doc").alias("id_a"), F.lit(1).alias("__fa"))
    fb = ad_ids.select(F.col("doc").alias("id_b"), F.lit(1).alias("__fb"))
    kept_near = (
        stored_near.join(fa, "id_a", "left")
        .join(fb, "id_b", "left")
        .where(F.col("__fa").isNull() | F.col("__fb").isNull())
        .select("id_a", "id_b")
    )
    near_u = _persist(kept_near.union(new_near).distinct())

    # ---------------- exact-copy edges for batch-touched fingerprints
    # NULL-SAFE fp matching: doc_fingerprint(NULL text) is NULL, and
    # both the build's rep window and the DuckDB twins group NULLs into
    # ONE partition — an equi-semi-join would never match them and a
    # batch NULL-text doc would miss its old NULL-fp group, breaking
    # append==rebuild exactly there
    batch_fps = B.select(F.col("fp").alias("__bfp")).distinct()
    old_grp = _persist(
        stored_docs.select("doc", "fp")
        .join(batch_fps, F.col("fp").eqNullSafe(F.col("__bfp")), "left_semi")
        .select("doc", "fp")
    )
    grp = old_grp.union(B.select("doc", "fp"))
    grp_rep = F.min("doc").over(Window.partitionBy("fp"))
    new_copy = (
        grp.select("doc", grp_rep.alias("rep_id"))
        .where(F.col("doc") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id_a"), F.col("doc").alias("id_b"))
    )
    # an edge's id_a is its fp group's rep, so id_a carries the edge's
    # fingerprint: dropping edges whose id_a sits in a batch-touched
    # group replaces exactly the recomputed groups
    kept_copy = stored_copy.join(
        old_grp.select(F.col("doc").alias("id_a")), "id_a", "left_anti"
    )
    copy_u = _persist(kept_copy.union(new_copy))

    near_u.write.mode("errorifexists").parquet(os.path.join(graphdir, "near"))
    copy_u.write.mode("errorifexists").parquet(os.path.join(graphdir, "copy"))
    near_u_s = spark.read.parquet(os.path.join(graphdir, "near"))
    copy_u_s = spark.read.parquet(os.path.join(graphdir, "copy"))

    # ---------------- component relabel over the changed subgraph
    # exact added/removed edge sets (graph-width set differences —
    # measured FASTER than the endpoint-superset alternative, which
    # widened the re-CC region enough to cost more than the four
    # subtract jobs it saved)
    added = near_u_s.subtract(stored_near).union(copy_u_s.subtract(stored_copy))
    removed = stored_near.subtract(near_u_s).union(
        stored_copy.subtract(copy_u_s)
    )
    changed = added.union(removed)
    touched = (
        changed.select(F.col("id_a").alias(id_col))
        .union(changed.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # components incident to a changed edge (members_now bound above at
    # the novelty guard); stored edges never cross stored components
    # (they were CC inputs), so this set is closed — relabeling happens
    # only inside it plus the batch
    acid = _persist(
        members_now.join(touched, id_col)
        .select("component_id")
        .distinct()
    )
    sub_old = _persist(members_now.join(acid, "component_id"))
    sub_nodes = sub_old.select(id_col).union(
        B.select(F.col("doc").alias(id_col))
    )
    all_edges = near_u_s.union(copy_u_s).distinct()
    sub_edges = all_edges.join(
        sub_nodes.select(F.col(id_col).alias("id_a")), "id_a", "left_semi"
    )
    sub_cc = connected_components(sub_nodes, sub_edges, id_col)
    qual = sub_old.select(id_col, "quality").union(
        B.select(F.col("doc").alias(id_col), "quality")
    )
    members_delta = sub_cc.join(qual, id_col)
    members_delta.write.mode("errorifexists").parquet(
        os.path.join(segdir, "members")
    )
    members_delta_s = spark.read.parquet(os.path.join(segdir, "members"))
    canon_delta = _canonical_select(
        members_delta_s.groupBy("component_id").agg(*_canonical_aggs(id_col))
    )
    # merged-away component ids get a tombstone (n_members = 0) so the
    # winner-select serve stops reporting them
    tombs = (
        acid.join(
            members_delta_s.select("component_id").distinct(),
            "component_id",
            "left_anti",
        )
        .select(
            "component_id",
            F.lit(None).cast("bigint").alias("best_doc_id"),
            F.lit(None).cast("double").alias("best_quality"),
            F.lit(0).cast("bigint").alias("n_members"),
        )
    )
    canon_delta.union(tombs).write.mode("errorifexists").parquet(
        os.path.join(segdir, "canonical")
    )

    # ---------------- match-artifact segments (batch contribution)
    B.select(
        "doc", F.col("x.n").alias("n"), F.col("x.hashes").alias("hashes"), "fp"
    ).write.mode("errorifexists").parquet(os.path.join(segdir, "docs"))
    _write_postings(
        re_batch.select("sh_hash", "doc", "n"),
        os.path.join(segdir, "postings"),
    )
    df_B.select("sh_hash", F.col("df_b").alias("df")).write.mode(
        "errorifexists"
    ).parquet(os.path.join(segdir, "dfs"))
    flipped_df.write.mode("errorifexists").parquet(
        os.path.join(segdir, "hot")
    )
    new_hot_sigs = sig_b.union(
        sig_ad.join(
            stored_hot_sigs.select("doc"), "doc", "left_anti"
        )
    )
    new_hot_sigs.write.mode("errorifexists").parquet(
        os.path.join(segdir, "hot_sigs")
    )

    entry = dict(entry)
    entry["version"] = int(entry["version"]) + 1
    entry["segments"] = list(entry["segments"]) + [seg_name]
    old_graph = entry["graph"]
    entry["graph"] = graph_name
    entry["next_seg"] = int(entry["next_seg"]) + 1
    entry["next_graph"] = int(entry["next_graph"]) + 1
    entry["n_docs"] = int(entry["n_docs"]) + int(n_batch)
    if token is not None:
        entry["applied_tokens"] = list(
            entry.get("applied_tokens") or []
        ) + [str(token)]
    manifest["current"] = entry
    manifest["next_version"] = int(entry["version"]) + 1
    _write_manifest(map_dir, manifest)
    _clear_dir(os.path.join(map_dir, old_graph))
    return ClusterMap(spark, map_dir)


def retire_cluster_map(
    spark: SparkSession, map_dir: str, ids: "list | DataFrame"
) -> "ClusterMap":
    """Coverage-scoped TAKEDOWN: remove *ids* from the stored map —
    members/canonical/edges then serve exactly what a full rebuild on
    the survivor corpus at the frozen (n, threshold, max_df) would
    (property-tested, including component SPLITS, canonical
    re-election, and the hot-shingle UN-FLIP corner below), with zero
    corpus access: every input is a stored artifact.

    What a removal can change, and how each case is covered exactly:

    - edges incident to a retired doc vanish — dropped in the graph
      rewrite; connected components can SPLIT, so members/canonical
      re-run CC over the affected components' STORED edges (the same
      delta machinery appends use), with tombstones hiding the retired
      docs' older member rows;
    - an exact-copy group whose rep (min id) retired re-stars under
      the next-min survivor — the fp groups touched by retired
      fingerprints regenerate null-safely from the docs artifact;
    - document frequencies SHRINK, so a stored-hot shingle can
      UN-FLIP (df back under the frozen cap): carrier pairs that share
      no LSH band — invisible to the band path while the shingle was
      hot — become rare-path edges in the survivor rebuild. The
      un-flip is detected from the dfs partials (this retirement
      writes NEGATIVE decrement rows, so later sums stay
      survivor-correct), the un-flipped shingles' carriers are
      recovered from the docs artifact restricted to HOT docs (every
      carrier of a hot shingle is itself hot), the postings rows
      missing for the hot era are written as COMPLETION partials (the
      rare-postings artifact must stay complete for every live rare
      shingle — the append-exactness invariant), and the new candidate
      pairs verify exact Jaccard through the shared formula
      (operators/dedup._verify_pairs). Hot docs whose EVERY hot
      shingle un-flipped are demoted out of hot_sigs (the band path
      requires both endpoints hot). This is the one stage costing more
      than O(affected): one columnar scan of the HOT-DOC rows of the
      docs artifact, paid only when a retirement actually moves a df
      across the cap.

    Why no other change is possible: dfs only shrink, so rare stays
    rare (stored rare-path edges among survivors keep their edge);
    hotness only shrinks (hot' ⊆ hot) and signatures are per-doc, so
    no NEW band-path edge can appear; and a stored band-path edge
    whose endpoint un-hots had every shared formerly-hot shingle
    un-flip — the rare path takes over, so the edge survives here
    exactly as it survives the rebuild.

    Retired ids may RE-APPEND later (the document-revision route):
    tombstones are coverage-scoped — they hide rows only in segments
    that existed at retire time, the vector/text index convention
    (store/vector_index.py, store/text_index.py) — so a re-appended
    id serves its new rows. Compaction applies tombstones physically
    and clears the retirement list. Ids absent from the map are
    ignored. Reference analog: takedowns-that-stay-down — the
    blocklist posture (store/dedup_ledger.py) extended to the one
    store that lacked takedown visibility."""
    from queens_spark.operators.dedup import (
        _persist,
        _rare_pair_counts,
        _verify_pairs,
        connected_components,
    )

    manifest = _read_manifest(map_dir)
    entry = manifest.get("current")
    if not entry or "segments" not in entry:
        raise FileNotFoundError(f"no appendable cluster map at {map_dir}")
    id_col = entry["id_col"]
    m = int(entry["max_df"])
    threshold = float(entry["threshold"])
    docs_all = _doc_rows(spark, map_dir, entry, "docs")
    # NO forced broadcast on the takedown-scale frames (rid, dec, the
    # tombstone anti-join sides): a legal takedown is thousands of ids,
    # but a retention purge can retire a corpus-scale fraction — AQE
    # broadcasts the small case and shuffles the large one. A frame
    # input (the takedown-artifact route, store/takedown.py) therefore
    # stays a frame end to end — never collected to the driver.
    if isinstance(ids, DataFrame):
        rid = ids.select(
            F.col(ids.columns[0]).cast("bigint").alias("doc")
        ).distinct()
    else:
        id_list = sorted({int(i) for i in (ids or [])})
        if not id_list:
            return ClusterMap(spark, map_dir)
        rid = spark.createDataFrame([(i,) for i in id_list], "doc bigint")
    retired_docs = _persist(docs_all.join(rid, "doc"))
    n_retired = retired_docs.count()
    if n_retired == 0:
        return ClusterMap(spark, map_dir)
    rpres = retired_docs.select("doc")

    seg_name = f"seg_{int(entry['next_seg']):06d}"
    graph_name = f"graph_{int(entry['next_graph']):06d}"
    segdir = os.path.join(map_dir, seg_name)
    graphdir = os.path.join(map_dir, graph_name)
    _clear_dir(segdir)
    _clear_dir(graphdir)

    # ---------------- df decrements and hot-shingle un-flips
    expl_R = retired_docs.select(
        "doc", F.explode("hashes").alias("sh_hash")
    )
    dec = _persist(
        expl_R.groupBy("sh_hash").agg(
            F.count(F.lit(1)).cast("bigint").alias("dec")
        )
    )
    hot_list = _resolve_hot(spark, map_dir, entry)
    hot_df = spark.createDataFrame(
        [(int(h),) for h in hot_list], "sh_hash bigint"
    )
    df_tot = (
        spark.read.parquet(
            *[os.path.join(map_dir, s, "dfs") for s in entry["segments"]]
        )
        .join(dec.select("sh_hash"), "sh_hash", "left_semi")
        .groupBy("sh_hash")
        .agg(F.sum("df").cast("bigint").alias("df_a"))
    )
    # un-flips ⊆ hot ∩ retired vocabulary — driver-bounded both ways
    unflips = sorted(
        int(r["sh_hash"])
        for r in df_tot.join(dec, "sh_hash")
        .join(F.broadcast(hot_df), "sh_hash", "left_semi")
        .where(F.col("df_a") - F.col("dec") <= m)
        .select("sh_hash")
        .collect()
    )

    stored_postings = _doc_rows(spark, map_dir, entry, "postings")
    stored_hot_sigs = _doc_rows(spark, map_dir, entry, "hot_sigs")
    docs_schema = docs_all.schema
    hot_sigs_schema = stored_hot_sigs.schema
    postings_schema = stored_postings.schema

    if unflips:
        unflip_arr = F.array(
            *[F.lit(int(h)).cast("bigint") for h in unflips]
        )
        # survivor hot docs carrying an un-flipped shingle — every
        # carrier of a (formerly) hot shingle is itself hot, so the
        # docs scan restricts to hot docs before touching hashes
        cand_docs = _persist(
            docs_all.join(
                stored_hot_sigs.select("doc"), "doc", "left_semi"
            )
            .join(rid, "doc", "left_anti")
            .where(F.arrays_overlap("hashes", unflip_arr))
        )
        unflip_df = spark.createDataFrame(
            [(h,) for h in unflips], "sh_hash bigint"
        )
        carriers = _persist(
            cand_docs.select(
                "doc", "n", F.explode("hashes").alias("sh_hash")
            ).join(F.broadcast(unflip_df), "sh_hash", "left_semi")
        )
        completion = carriers.select("sh_hash", "doc", "n").join(
            stored_postings.select("sh_hash", "doc"),
            ["sh_hash", "doc"],
            "left_anti",
        )
        # pairs sharing a NEWLY-rare shingle, verified exactly — the
        # only edges the survivor rebuild has that the stored graph
        # lacks (≤ C(df', 2) pairs per un-flipped shingle, df' <= m)
        cand_pairs = _rare_pair_counts(carriers, None).select(
            "id_a", "id_b"
        )
        lookup = cand_docs.select(
            "doc", F.struct(F.col("hashes").alias("hashes")).alias("x")
        )
        new_near = (
            _verify_pairs(cand_pairs, lookup)
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b")
        )
        # demotions: a hot doc stays hot iff it still carries a live
        # hot shingle; only carriers of un-flipped shingles can change
        still_hot = sorted(set(hot_list) - set(unflips))
        if still_hot:
            sh_df = spark.createDataFrame(
                [(h,) for h in still_hot], "sh_hash bigint"
            )
            still_hot_docs = (
                cand_docs.select(
                    "doc", F.explode("hashes").alias("sh_hash")
                )
                .join(F.broadcast(sh_df), "sh_hash", "left_semi")
                .select("doc")
                .distinct()
            )
            demoted = cand_docs.select("doc").join(
                still_hot_docs, "doc", "left_anti"
            )
        else:
            demoted = cand_docs.select("doc")
    else:
        completion = spark.createDataFrame([], postings_schema)
        new_near = spark.createDataFrame([], "id_a bigint, id_b bigint")
        demoted = spark.createDataFrame([], "doc bigint")

    # ---------------- graph rewrite
    graph_old = os.path.join(map_dir, entry["graph"])
    stored_near = spark.read.parquet(os.path.join(graph_old, "near"))
    stored_copy = spark.read.parquet(os.path.join(graph_old, "copy"))
    rid_a = rid.withColumnRenamed("doc", "id_a")
    rid_b = rid.withColumnRenamed("doc", "id_b")
    kept_near = stored_near.join(rid_a, "id_a", "left_anti").join(
        rid_b, "id_b", "left_anti"
    )
    near_u = _persist(kept_near.union(new_near).distinct())

    # exact-copy groups touched by a retired fingerprint re-star under
    # the next-min SURVIVOR (null-safe: NULL-text docs share one group)
    ret_fps = retired_docs.select(F.col("fp").alias("__rfp")).distinct()
    old_grp = _persist(
        docs_all.join(rid, "doc", "left_anti")
        .select("doc", "fp")
        .join(ret_fps, F.col("fp").eqNullSafe(F.col("__rfp")), "left_semi")
    )
    grp_rep = F.min("doc").over(Window.partitionBy("fp"))
    new_copy = (
        old_grp.select("doc", grp_rep.alias("rep_id"))
        .where(F.col("doc") != F.col("rep_id"))
        .select(F.col("rep_id").alias("id_a"), F.col("doc").alias("id_b"))
    )
    # a copy edge's id_a is its group's rep: touched groups' edges have
    # id_a among the group's survivors (regenerated below) or retired
    # (dropped); the id_b anti-join is belt-and-braces for the
    # retired-member case
    kept_copy = (
        stored_copy.join(
            old_grp.select(F.col("doc").alias("id_a")), "id_a", "left_anti"
        )
        .join(rid_a, "id_a", "left_anti")
        .join(rid_b, "id_b", "left_anti")
    )
    copy_u = _persist(kept_copy.union(new_copy))

    near_u.write.mode("errorifexists").parquet(
        os.path.join(graphdir, "near")
    )
    copy_u.write.mode("errorifexists").parquet(
        os.path.join(graphdir, "copy")
    )
    near_u_s = spark.read.parquet(os.path.join(graphdir, "near"))
    copy_u_s = spark.read.parquet(os.path.join(graphdir, "copy"))

    # ---------------- component relabel over the changed subgraph:
    # components holding a retired doc (their edges shrank — splits)
    # plus components touching a new un-flip edge (merges)
    members_now = _members_frame(spark, map_dir, entry, id_col)
    touched = (
        rpres.select(F.col("doc").alias(id_col))
        .union(new_near.select(F.col("id_a").alias(id_col)))
        .union(new_near.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    acid = _persist(
        members_now.join(touched, id_col).select("component_id").distinct()
    )
    sub_old = _persist(members_now.join(acid, "component_id"))
    rid_id = rid.withColumnRenamed("doc", id_col)
    sub_nodes = sub_old.select(id_col).join(rid_id, id_col, "left_anti")
    all_edges = near_u_s.union(copy_u_s).distinct()
    sub_edges = all_edges.join(
        sub_nodes.select(F.col(id_col).alias("id_a")), "id_a", "left_semi"
    )
    sub_cc = connected_components(sub_nodes, sub_edges, id_col)
    qual = sub_old.select(id_col, "quality").join(
        rid_id, id_col, "left_anti"
    )
    members_delta = sub_cc.join(qual, id_col)
    members_delta.write.mode("errorifexists").parquet(
        os.path.join(segdir, "members")
    )
    members_delta_s = spark.read.parquet(os.path.join(segdir, "members"))
    canon_delta = _canonical_select(
        members_delta_s.groupBy("component_id").agg(
            *_canonical_aggs(id_col)
        )
    )
    tombs = (
        acid.join(
            members_delta_s.select("component_id").distinct(),
            "component_id",
            "left_anti",
        )
        .select(
            "component_id",
            F.lit(None).cast("bigint").alias("best_doc_id"),
            F.lit(None).cast("double").alias("best_quality"),
            F.lit(0).cast("bigint").alias("n_members"),
        )
    )
    canon_delta.union(tombs).write.mode("errorifexists").parquet(
        os.path.join(segdir, "canonical")
    )

    # ---------------- retirement partials for the match artifacts
    spark.createDataFrame([], docs_schema).write.mode(
        "errorifexists"
    ).parquet(os.path.join(segdir, "docs"))
    _write_postings(completion, os.path.join(segdir, "postings"))
    dec.select(
        "sh_hash", (-F.col("dec")).cast("bigint").alias("df")
    ).write.mode("errorifexists").parquet(os.path.join(segdir, "dfs"))
    spark.createDataFrame([], "sh_hash bigint").write.mode(
        "errorifexists"
    ).parquet(os.path.join(segdir, "hot"))
    spark.createDataFrame(
        [(h,) for h in unflips], "sh_hash bigint"
    ).write.mode("errorifexists").parquet(os.path.join(segdir, "unhot"))
    spark.createDataFrame([], hot_sigs_schema).write.mode(
        "errorifexists"
    ).parquet(os.path.join(segdir, "hot_sigs"))
    rpres.write.mode("errorifexists").parquet(
        os.path.join(segdir, "retired")
    )
    demoted.write.mode("errorifexists").parquet(
        os.path.join(segdir, "unhot_docs")
    )

    coverage = len(entry["segments"])
    entry = dict(entry)
    entry["version"] = int(entry["version"]) + 1
    entry["segments"] = list(entry["segments"]) + [seg_name]
    old_graph = entry["graph"]
    entry["graph"] = graph_name
    entry["next_seg"] = int(entry["next_seg"]) + 1
    entry["next_graph"] = int(entry["next_graph"]) + 1
    entry["n_docs"] = int(entry["n_docs"]) - int(n_retired)
    entry["retirements"] = _retirements(entry) + [
        {"seg": seg_name, "coverage": coverage}
    ]
    manifest["current"] = entry
    manifest["next_version"] = int(entry["version"]) + 1
    _write_manifest(map_dir, manifest)
    _clear_dir(os.path.join(map_dir, old_graph))
    return ClusterMap(spark, map_dir)


def _members_frame(
    spark: SparkSession, map_dir: str, entry: dict, id_col: str
) -> DataFrame:
    """Latest-wins member labels across segments, with coverage-scoped
    retirement tombstones applied per segment (a retired doc's older
    member rows die; rows a later re-append wrote survive). A
    single-segment map (fresh build) is a plain artifact read — the
    q36-family serving plans stay scan-only; multi-segment maps pay
    one corpus-narrow winner-select shuffle until a rebuild/compaction
    folds them."""
    segs = entry["segments"]
    rets = _retirements(entry)
    if len(segs) == 1 and not rets:
        return spark.read.parquet(os.path.join(map_dir, segs[0], "members"))

    dead_frames = [
        (
            int(r["coverage"]),
            spark.read.parquet(
                os.path.join(map_dir, r["seg"], "retired")
            ).select(F.col("doc").alias(id_col)),
        )
        for r in rets
    ]

    def resolved(i: int, s: str) -> DataFrame:
        f = spark.read.parquet(os.path.join(map_dir, s, "members"))
        for cov, dead in dead_frames:
            if cov <= i:
                continue
            f = f.join(dead, id_col, "left_anti")
        return f

    parts = [
        resolved(i, s).withColumn("__ord", F.lit(i))
        for i, s in enumerate(segs)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct("component_id", "quality"), F.col("__ord")
            ).alias("w")
        )
        .select(id_col, "w.component_id", "w.quality")
    )


def load_cluster_map(
    spark: SparkSession, map_dir: str, expected_fingerprint: str | None = None
) -> "ClusterMap":
    m = _read_manifest(map_dir)
    entry = m.get("current")
    if not entry:
        raise FileNotFoundError(f"no cluster map at {map_dir}")
    if "segments" not in entry:
        # pre-append-era layout: unreadable by this code — treat as
        # stale so build_or_load rebuilds instead of serving garbage
        raise ValueError("stored cluster map has an obsolete layout")
    if (
        expected_fingerprint is not None
        and entry.get("fingerprint") != expected_fingerprint
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
    max_df: int | str = "auto",
) -> "ClusterMap":
    """Serve the stored map when fingerprint AND params match; rebuild
    otherwise — first run pays the clustering, every later session
    reads counter-width artifacts. ``max_df="auto"`` matches whatever
    cap the stored map froze (the cap is corpus-derived state, not a
    caller choice); an explicit int must match exactly."""
    try:
        cm = load_cluster_map(
            df.sparkSession, map_dir, expected_fingerprint=fingerprint
        )
        e = cm.entry
        if int(e["n"]) != int(n) or float(e["threshold"]) != float(threshold):
            raise ValueError("stored cluster map has different params")
        if max_df != "auto" and int(e["max_df"]) != int(max_df):
            raise ValueError("stored cluster map has a different max_df")
        return cm
    except (FileNotFoundError, ValueError):
        return build_cluster_map(
            df, text_col, id_col, map_dir,
            n=n, threshold=threshold, fingerprint=fingerprint, max_df=max_df,
        )


def compact_cluster_map(spark: SparkSession, map_dir: str) -> int:
    """Fold the delta segments back into ONE segment — serving returns
    to plain artifact reads (no winner-select shuffle) and the
    match-artifact scans appends pay stop re-reading superseded delta
    rows. A pure rewrite: members materialize the winner-select,
    canonical recomputes from them (identical to the winner-select —
    every delta wrote its affected components WHOLE), docs/postings/
    hot/hot_sigs resolve-then-union (postings drop now-hot rows:
    rare-at-every-write plus the retirement completion rows make the
    union complete for every live rare shingle), dfs sum (retirement
    decrements net out; fully-retired shingles drop at df <= 0).
    Retirement tombstones are applied PHYSICALLY here — the compacted
    segment carries no retired/demoted rows, so the manifest's
    retirement list clears. Returns how many segments were merged
    (0 = already compact). The ``Engine.maintain`` cluster branch runs
    this before clearing tokens — the index-compaction twin."""
    manifest = _read_manifest(map_dir)
    entry = manifest.get("current")
    if not entry or "segments" not in entry:
        raise FileNotFoundError(f"no appendable cluster map at {map_dir}")
    segs = entry["segments"]
    if len(segs) <= 1:
        return 0
    id_col = entry["id_col"]
    seg_name = f"seg_{int(entry['next_seg']):06d}"
    segdir = os.path.join(map_dir, seg_name)
    _clear_dir(segdir)

    members = _members_frame(spark, map_dir, entry, id_col)
    members.write.mode("errorifexists").parquet(
        os.path.join(segdir, "members")
    )
    stored_members = spark.read.parquet(os.path.join(segdir, "members"))
    _canonical_select(
        stored_members.groupBy("component_id").agg(*_canonical_aggs(id_col))
    ).write.mode("errorifexists").parquet(os.path.join(segdir, "canonical"))
    _doc_rows(spark, map_dir, entry, "docs").write.mode(
        "errorifexists"
    ).parquet(os.path.join(segdir, "docs"))
    hot_list = _resolve_hot(spark, map_dir, entry)
    hot = spark.createDataFrame(
        [(int(h),) for h in hot_list], "sh_hash bigint"
    )
    hot.write.mode("errorifexists").parquet(os.path.join(segdir, "hot"))
    _write_postings(
        _doc_rows(spark, map_dir, entry, "postings")
        .join(F.broadcast(hot), "sh_hash", "left_anti")
        .select("sh_hash", "doc", "n"),
        os.path.join(segdir, "postings"),
    )
    (
        spark.read.parquet(*[os.path.join(map_dir, s, "dfs") for s in segs])
        .groupBy("sh_hash")
        .agg(F.sum("df").cast("bigint").alias("df"))
        .where(F.col("df") > 0)
        .write.mode("errorifexists")
        .parquet(os.path.join(segdir, "dfs"))
    )
    _doc_rows(spark, map_dir, entry, "hot_sigs").write.mode(
        "errorifexists"
    ).parquet(os.path.join(segdir, "hot_sigs"))

    merged = len(segs)
    entry = dict(entry)
    entry["version"] = int(entry["version"]) + 1
    entry["segments"] = [seg_name]
    entry["next_seg"] = int(entry["next_seg"]) + 1
    entry["retirements"] = []
    manifest["current"] = entry
    manifest["next_version"] = int(entry["version"]) + 1
    _write_manifest(map_dir, manifest)
    for s in segs:
        _clear_dir(os.path.join(map_dir, s))
    return merged


def clear_applied_tokens(map_dir: str) -> int:
    """Drop the idempotency-token list — ONLY safe once the ledger has
    compacted (a post-compact replay re-screens to accepted=0, so the
    append never fires; the same argument as the index/sketch stores).
    Returns how many tokens were cleared."""
    manifest = _read_manifest(map_dir)
    entry = manifest.get("current")
    if not entry:
        return 0
    n = len(entry.get("applied_tokens") or [])
    if n:
        entry["applied_tokens"] = []
        manifest["current"] = entry
        _write_manifest(map_dir, manifest)
    return n


class ClusterMap:
    def __init__(self, spark: SparkSession, map_dir: str):
        self.spark = spark
        self.map_dir = map_dir
        self.manifest = _read_manifest(map_dir)
        self.entry = self.manifest["current"]

    def members(self) -> DataFrame:
        """(id, component_id, quality) — artifact read (winner-select
        across delta segments after appends)."""
        return _members_frame(
            self.spark, self.map_dir, self.entry, self.entry["id_col"]
        )

    def canonical(self) -> DataFrame:
        """(component_id, best_doc_id, best_quality, n_members)."""
        segs = self.entry["segments"]
        if len(segs) == 1:
            return self.spark.read.parquet(
                os.path.join(self.map_dir, segs[0], "canonical")
            )
        parts = [
            self.spark.read.parquet(
                os.path.join(self.map_dir, s, "canonical")
            ).withColumn("__ord", F.lit(i))
            for i, s in enumerate(segs)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return (
            u.groupBy("component_id")
            .agg(
                F.max_by(
                    F.struct("best_doc_id", "best_quality", "n_members"),
                    F.col("__ord"),
                ).alias("w")
            )
            .where(F.col("w.n_members") > 0)
            .select(
                "component_id",
                "w.best_doc_id",
                "w.best_quality",
                "w.n_members",
            )
        )

    def edges(self) -> DataFrame:
        """Normalized distinct dedup edges (a < b) — near-dup pairs ∪
        exact-copy edges, both emitted with id_a < id_b upstream."""
        return (
            self.near_pairs()
            .union(self.copy_edges())
            .select(
                F.least("id_a", "id_b").alias("a"),
                F.greatest("id_a", "id_b").alias("b"),
            )
            .distinct()
        )

    def near_pairs(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.map_dir, self.entry["graph"], "near")
        )

    def copy_edges(self) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self.map_dir, self.entry["graph"], "copy")
        )

    def describe(self) -> dict:
        return {
            "version": int(self.entry["version"]),
            "n": int(self.entry["n"]),
            "threshold": float(self.entry["threshold"]),
            "max_df": int(self.entry["max_df"]),
            "n_docs": int(self.entry["n_docs"]),
            "segments": len(self.entry["segments"]),
            "retirements": len(_retirements(self.entry)),
            "applied_tokens": len(self.entry.get("applied_tokens") or []),
        }
