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


def _lane_matches(sig_a, sig_b):
    """Number of agreeing MinHash lanes — integer, bit-portable."""
    return F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )


def _bands(sigs: DataFrame, id_name: str) -> DataFrame:
    """(id, band_id, band_sig) — same banding as dedup._band_pairs."""
    from queens_spark.operators.dedup import LSH_BANDS, LSH_ROWS

    return sigs.where(F.col("sig").isNotNull()).select(
        F.col(id_name),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(band).alias("band_id"),
                    F.concat_ws(
                        "_",
                        *[
                            F.col("sig")[band * LSH_ROWS + r]
                            for r in range(LSH_ROWS)
                        ],
                    ).alias("band_sig"),
                )
                for band in range(LSH_BANDS)
            ])
        ).alias("b"),
    ).select(id_name, "b.band_id", "b.band_sig")


def _manifest_path(ledger_dir: str) -> str:
    return os.path.join(ledger_dir, MANIFEST_NAME)


def _read_manifest(ledger_dir: str) -> dict:
    try:
        with open(_manifest_path(ledger_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"segments": []}


def _next_seg_id(manifest: dict) -> int:
    """Monotonic segment counter, persisted as ``next_seg``. Segment
    dir names must NEVER repeat: ``seg{len(segments)}`` collides after
    a compact→ingest→compact cycle (compacting 3 segments yields
    ``seg3__compacted``; two ingests later the next compact would
    derive ``seg3__compacted`` again and overwrite the path it is
    reading). Legacy manifests without the counter derive it from the
    max numeric suffix already on disk."""
    n = manifest.get("next_seg")
    if n is not None:
        return int(n)
    mx = -1
    for s in manifest.get("segments", []):
        num = os.path.basename(s)[3:].split("__")[0]
        if num.isdigit():
            mx = max(mx, int(num))
    return mx + 1


def _write_manifest(ledger_dir: str, manifest: dict) -> None:
    os.makedirs(ledger_dir, exist_ok=True)
    tmp = _manifest_path(ledger_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(ledger_dir))


def _ledger_id_col(spark: SparkSession, seg: str) -> str:
    """The canonical-id column of a ledger segment — whatever column
    is not the fingerprint or the MinHash signature (the id name is
    the caller's, recorded implicitly in the written schema)."""
    cols = [
        c for c in spark.read.parquet(seg).columns
        if c not in ("fingerprint", "sig")
    ]
    if len(cols) != 1:
        raise ValueError(f"cannot derive the ledger id column: {cols}")
    return cols[0]


def ledger_fingerprints(
    spark: SparkSession, ledger_dir: str
) -> DataFrame | None:
    """The accepted-content ledger as (fingerprint, id) — None when
    no batch has ever been accepted. Retired rows
    (:func:`delete_from_ledger`) are excluded via coverage-scoped
    tombstones, exactly like the index readers: each delete hides its
    ids only in the segments that existed when it was written, so
    re-accepting equivalent content later serves the NEW row. With no
    deletes (the common state between takedowns) this is ONE
    multi-path scan — no join added."""
    manifest = _read_manifest(ledger_dir)
    segs = manifest["segments"]
    if not segs:
        return None
    dels = manifest.get("deletes") or []
    if not dels:
        return spark.read.parquet(*segs)
    id_col = _ledger_id_col(spark, segs[0])
    out = None
    for i, seg in enumerate(segs):
        df = spark.read.parquet(seg)
        cov = [d["path"] for d in dels if int(d["covers"]) > i]
        if cov:
            df = df.join(
                spark.read.parquet(*cov).select(id_col),
                id_col, "left_anti",
            )
        out = df if out is None else out.unionByName(df)
    return out


def delete_from_ledger(
    spark: SparkSession, ledger_dir: str, ids: "list | DataFrame"
) -> int:
    """Retire accepted content from the ledger by canonical id — the
    ledger half of a document takedown (``Engine.retire_documents``
    composes it with the index tombstones): once retired, the content
    no longer blocks future ingests, so a legitimate re-crawl of
    equivalent text is accepted again and re-serves. NOTE the
    semantics: the ledger is an ACCEPTANCE record, not a ban list — a
    takedown that must STAY down needs an upstream blocklist.

    Tombstone mechanics mirror the index side: the doomed ids land as
    a narrow coverage-scoped segment (they hide rows only in segments
    that exist NOW, so a later re-acceptance of the same id serves),
    the manifest flips last, and :func:`compact_ledger` applies
    deletes physically. Returns how many ledger rows are retired."""
    manifest = _read_manifest(ledger_dir)
    segs = manifest["segments"]
    if not segs:
        return 0
    id_col = _ledger_id_col(spark, segs[0])
    if isinstance(ids, DataFrame):
        # takedown-artifact route: the doomed set stays a frame end to
        # end (a retention purge can be corpus-scale)
        doomed = ids.select(
            F.col(ids.columns[0]).cast("bigint").alias(id_col)
        ).distinct()
    else:
        if not list(ids):
            return 0
        doomed = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} bigint"
        ).distinct()
    live = ledger_fingerprints(spark, ledger_dir)
    hit = live.join(doomed, id_col, "semi").count()
    seg_id = int(manifest.get("next_delete_seg", 0))
    del_path = os.path.join(ledger_dir, f"deletes_seg{seg_id}")
    doomed.write.mode("overwrite").parquet(del_path)
    manifest["deletes"] = list(manifest.get("deletes") or []) + [
        {"path": del_path, "covers": len(segs)}
    ]
    manifest["next_delete_seg"] = seg_id + 1
    _write_manifest(ledger_dir, manifest)
    return int(hit)


def _blocked_entries(manifest: dict) -> list[dict]:
    """Normalized blocklist entries: plain path strings (exact-only)
    and dicts ({path, near, threshold}) read uniformly."""
    out = []
    for e in manifest.get("blocked") or []:
        if isinstance(e, str):
            out.append({"path": e, "near": False, "threshold": None})
        else:
            out.append(e)
    return out


def blocked_fingerprints(
    spark: SparkSession, ledger_dir: str
) -> DataFrame | None:
    """The ledger's BLOCKLIST as a (fingerprint) frame — None when
    empty. The blocklist is the other half of content governance the
    acceptance ledger cannot express: the ledger records what was
    accepted (retiring a row re-opens the door), the blocklist
    records what must NEVER be accepted (a takedown that stays
    down). Every ingest screen drops blocked fingerprints first and
    reports them separately from dupes. This frame is the EXACT tier;
    near-banned entries (``near=True``) additionally screen by
    MinHash band + lane agreement inside the ingest."""
    segs = [
        e["path"]
        for e in _blocked_entries(_read_manifest(ledger_dir))
    ]
    if not segs:
        return None
    return spark.read.parquet(*segs).select("fingerprint")


def _near_blocked_sigs(
    spark: SparkSession, manifest: dict
) -> list[tuple[float, DataFrame]]:
    """Near-ban segments grouped by confirmation threshold:
    [(threshold, (fingerprint, sig) frame)]."""
    by_t: dict[float, list[str]] = {}
    for e in _blocked_entries(manifest):
        if e.get("near"):
            by_t.setdefault(float(e["threshold"]), []).append(e["path"])
    return [
        (t, spark.read.parquet(*paths).where(F.col("sig").isNotNull()))
        for t, paths in sorted(by_t.items())
    ]


def add_to_blocklist(
    spark: SparkSession,
    ledger_dir: str,
    fingerprints: DataFrame,
    near_threshold: float | None = None,
) -> int:
    """Append a blocklist segment — written first, manifest flips
    last (the ledger's crash convention). Returns the number of
    fingerprints added. Idempotent in effect: a fingerprint blocked
    twice blocks once (the screen is a semi-join).

    With *near_threshold*, the segment also carries MinHash
    signatures (a ``sig`` column on the input frame, or computed from
    a ``__t`` text column) and the ingest screen ADDITIONALLY drops
    any batch doc whose lane agreement with a banned signature
    reaches ⌈k·threshold⌉ — the ban survives trivial edits (the
    watermark-stripping / whitespace-shuffling adversary). Docs too
    short to shingle carry NULL sigs and are banned exactly only."""
    manifest = _read_manifest(ledger_dir)
    seg_id = int(manifest.get("next_block_seg", 0))
    path = os.path.join(ledger_dir, f"blocked_seg{seg_id}")
    cols = ["fingerprint"] + (
        ["sig"]
        if near_threshold is not None and "sig" in fingerprints.columns
        else []
    )
    fp = fingerprints.select(*cols).distinct()
    fp.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    entry = {
        "path": path,
        "near": bool(near_threshold is not None and "sig" in cols),
        "threshold": (
            float(near_threshold) if near_threshold is not None else None
        ),
    }
    manifest["blocked"] = list(manifest.get("blocked") or []) + [entry]
    manifest["next_block_seg"] = seg_id + 1
    _write_manifest(ledger_dir, manifest)
    return n


def block_texts(
    spark: SparkSession,
    ledger_dir: str,
    texts: list[str],
    near_threshold: float | None = None,
) -> int:
    """Pre-emptively ban content by raw text: fingerprints computed
    with the SAME normalization the ingest screen uses
    (operators/text.py:doc_fingerprint), so any later batch carrying
    equivalent text is dropped with ``stats["blocked"]`` counted.
    With *near_threshold*, MinHash signatures ride along and
    NEAR-duplicates of the banned text are dropped too."""
    if not texts:
        return 0
    from queens_spark.operators.dedup import (
        minhash_signature,
        shingle_hashes,
    )

    df = spark.createDataFrame([(t,) for t in texts], ["__t"])
    cols = [doc_fingerprint("__t").alias("fingerprint")]
    if near_threshold is not None:
        cols.append(
            F.when(
                F.size(shingle_hashes("__t")) > 0,
                minhash_signature("__t"),
            ).alias("sig")
        )
    return add_to_blocklist(
        spark, ledger_dir, df.select(*cols),
        near_threshold=near_threshold,
    )


def ingest_deduped(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ledger_dir: str,
    near_dup_threshold: float | None = None,
    token: str | None = None,
) -> tuple[DataFrame, dict]:
    """Screen *df* against the ledger, accept what is new, record it.

    1. in-batch collapse: one row per distinct normalized-content
       fingerprint (md5 — operators/text.py:doc_fingerprint), keeping
       the min id as canonical;
    2. cross-run EXACT screen: LEFT ANTI join of those fingerprints
       against every prior segment;
    3. with *near_dup_threshold*, a FUZZY tier on top: MinHash
       signatures (operators/dedup.py banding constants) stored in
       the ledger; a batch doc is dropped when it shares an LSH band
       with an in-batch lower id or ANY ledger doc and the
       lane-agreement estimate ⌈k·t⌉ ≤ matches confirms (integer
       compare — bit-portable; the same estimator MinHash dedup runs
       on). In-batch near-dups resolve greedily by id: a doc drops if
       it confirms against any lower id, dropped or not —
       deterministic at any parallelism, the standard keep-lowest
       chain approximation. Docs too short to shingle carry a NULL
       signature and are screened exactly only.
    4. accept: survivors' (fingerprint, id[, sig]) rows are written
       as a new segment, THEN the manifest flips. Exact and fuzzy
       ledgers don't mix (the mode is recorded; mismatch raises).

    Returns ``(fresh_df, stats)``: *fresh_df* is *df* semi-joined on
    the written segment's ids (anchored on disk — stable however late
    it is evaluated); *stats* counts ``{"batch", "in_batch_dupes",
    "ledger_dupes", "accepted"}`` plus, in fuzzy mode,
    ``{"in_batch_near_dupes", "ledger_near_dupes"}``.

    Scale shape: exact screen = one narrow anti-join; fuzzy screen =
    band-keyed joins whose bucket sizes grow with true-duplicate
    density, verified on 16-lane signatures — the batch shuffles,
    the ledger side streams through its scan once per join.

    *token* makes the ingest IDEMPOTENT for redelivery (streaming
    foreachBatch, retried jobs): the manifest records which segment a
    token produced, and a re-ingest bearing a seen token SKIPS the
    screen-and-record entirely, returning the same fresh frame
    (anchored on that token's recorded segment) and its stats — the
    exactly-once anchor that lets downstream index appends compose
    (see streaming/corpus.py).
    """
    from queens_spark.operators.dedup import (
        MINHASH_K,
        minhash_signature,
        shingle_hashes,
    )

    spark = df.sparkSession
    manifest = _read_manifest(ledger_dir)
    if token is not None and token in manifest.get("tokens", {}):
        seg = manifest["tokens"][token]
        accepted = spark.read.parquet(seg)
        fresh = df.join(accepted.select(id_col), id_col, "semi")
        return fresh, {
            "batch": df.count(),
            "accepted": accepted.count(),
            "replayed": True,
        }
    mode = "minhash" if near_dup_threshold is not None else "exact"
    have = manifest.get("mode")
    if have is not None and have != mode:
        raise ValueError(
            f"ledger at {ledger_dir} is mode={have!r}; "
            f"requested {mode!r} — modes don't mix"
        )

    cols = [F.col(id_col), doc_fingerprint(text_col).alias("fingerprint")]
    if mode == "minhash":
        cols.append(
            F.when(
                F.size(shingle_hashes(text_col)) > 0,
                minhash_signature(text_col),
            ).alias("sig")
        )
    fp = df.select(*cols)
    canon = (
        fp.groupBy("fingerprint")
        .agg(F.min(F.struct(F.col(id_col), *(
            [F.col("sig")] if mode == "minhash" else []
        ))).alias("__c"))
        .select(
            F.col(f"__c.{id_col}").alias(id_col),
            "fingerprint",
            *([F.col("__c.sig").alias("sig")] if mode == "minhash" else []),
        )
    ).persist()
    try:
        n_batch = fp.count()
        n_unique = canon.count()
        # blocklist screen FIRST: banned content is neither a dupe nor
        # an acceptance candidate — it is reported as "blocked"
        blocked = blocked_fingerprints(spark, ledger_dir)
        n_blocked = 0
        if blocked is not None:
            n_blocked = canon.join(
                blocked, "fingerprint", "semi"
            ).count()
            canon_live = canon.join(blocked, "fingerprint", "left_anti")
        else:
            canon_live = canon
        # near-ban tier: LSH-band candidates against near=True block
        # segments, confirmed by lane agreement — banned content stays
        # banned under trivial edits. Exact-mode ledgers compute batch
        # sigs HERE, only when a near segment exists (never otherwise).
        near_blocks = _near_blocked_sigs(spark, manifest)
        if near_blocks:
            if mode == "minhash":
                bsig = canon_live.select(F.col(id_col), F.col("sig"))
            else:
                bsig = (
                    df.join(canon_live.select(id_col), id_col, "semi")
                    .select(
                        F.col(id_col),
                        F.when(
                            F.size(shingle_hashes(text_col)) > 0,
                            minhash_signature(text_col),
                        ).alias("sig"),
                    )
                )
            bb = _bands(bsig, id_col)
            dropped = None
            for t, seg in near_blocks:
                need = int(-(-MINHASH_K * t // 1))
                nb = _bands(
                    seg.select(F.col("fingerprint").alias("__bf"), "sig"),
                    "__bf",
                )
                nsig = seg.select(
                    F.col("fingerprint").alias("__bf"),
                    F.col("sig").alias("__sigb"),
                )
                hit = (
                    bb.join(nb, ["band_id", "band_sig"])
                    .select(id_col, "__bf")
                    .distinct()
                    .join(
                        bsig.select(
                            F.col(id_col), F.col("sig").alias("__siga")
                        ),
                        id_col,
                    )
                    .join(nsig, "__bf")
                    .where(
                        _lane_matches(F.col("__siga"), F.col("__sigb"))
                        >= F.lit(need)
                    )
                    .select(id_col)
                    .distinct()
                )
                dropped = (
                    hit if dropped is None
                    else dropped.unionByName(hit).distinct()
                )
            n_near = dropped.count()
            if n_near:
                canon_live = canon_live.join(dropped, id_col, "left_anti")
                n_blocked += n_near
        ledger = ledger_fingerprints(spark, ledger_dir)
        new = (
            canon_live
            if ledger is None
            else canon_live.join(
                ledger.select("fingerprint"), "fingerprint", "left_anti"
            )
        )
        n_in_batch_near = n_ledger_near = 0
        if mode == "minhash":
            need = int(-(-MINHASH_K * float(near_dup_threshold) // 1))
            sigs = new.select(id_col, "sig").persist()
            n_after_exact = sigs.count()
            bands = _bands(sigs, id_col)
            # in-batch: drop ids confirming against any lower id
            a = bands.select(
                F.col(id_col).alias("__a"), "band_id", "band_sig"
            )
            b = bands.select(
                F.col(id_col).alias("__b"), "band_id", "band_sig"
            )
            cand = (
                a.join(b, ["band_id", "band_sig"])
                .where(F.col("__a") < F.col("__b"))
                .select("__a", "__b")
                .distinct()
            )
            sa = sigs.select(
                F.col(id_col).alias("__a"), F.col("sig").alias("__siga")
            )
            sb = sigs.select(
                F.col(id_col).alias("__b"), F.col("sig").alias("__sigb")
            )
            drop_in = (
                cand.join(sa, "__a").join(sb, "__b")
                .where(
                    _lane_matches(F.col("__siga"), F.col("__sigb"))
                    >= F.lit(need)
                )
                .select(F.col("__b").alias(id_col))
                .distinct()
            )
            new = new.join(drop_in, id_col, "left_anti")
            if ledger is not None:
                lbands = _bands(
                    ledger.select(F.col(id_col).alias("__l"), "sig"),
                    "__l",
                )
                lsigs = ledger.select(
                    F.col(id_col).alias("__l"), F.col("sig").alias("__sigl")
                )
                cand_l = (
                    _bands(
                        new.select(id_col, "sig"), id_col
                    )
                    .join(lbands, ["band_id", "band_sig"])
                    .select(id_col, "__l")
                    .distinct()
                )
                drop_l = (
                    cand_l.join(sa.withColumnRenamed("__a", id_col), id_col)
                    .join(lsigs, "__l")
                    .where(
                        _lane_matches(F.col("__siga"), F.col("__sigl"))
                        >= F.lit(need)
                    )
                    .select(id_col)
                    .distinct()
                )
                new = new.join(drop_l, id_col, "left_anti")

        seg_id = _next_seg_id(manifest)
        manifest_seg = os.path.join(ledger_dir, f"seg{seg_id}")
        out_cols = ["fingerprint", id_col] + (
            ["sig"] if mode == "minhash" else []
        )
        new.select(*out_cols).write.mode("overwrite").parquet(manifest_seg)
        n_accepted = spark.read.parquet(manifest_seg).count()
        if mode == "minhash":
            n_in_batch_near = drop_in.count()
            # counted DIRECTLY, not derived by subtraction — a future
            # change to n_accepted's provenance must not skew this stat
            if ledger is not None:
                n_ledger_near = drop_l.count()
            sigs.unpersist()
            n_exact_ledger = n_unique - n_blocked - n_after_exact
        else:
            n_exact_ledger = n_unique - n_blocked - n_accepted
        manifest["segments"] = manifest["segments"] + [manifest_seg]
        manifest["mode"] = mode
        manifest["next_seg"] = seg_id + 1
        if token is not None:
            manifest.setdefault("tokens", {})[str(token)] = manifest_seg
        _write_manifest(ledger_dir, manifest)
    finally:
        canon.unpersist()
    fresh = df.join(
        spark.read.parquet(manifest_seg).select(id_col), id_col, "semi"
    )
    stats = {
        "batch": n_batch,
        "in_batch_dupes": n_batch - n_unique,
        "ledger_dupes": n_exact_ledger,
        "accepted": n_accepted,
    }
    if mode == "minhash":
        stats["in_batch_near_dupes"] = n_in_batch_near
        stats["ledger_near_dupes"] = n_ledger_near
    if blocked is not None or near_blocks:
        stats["blocked"] = n_blocked
    return fresh, stats


def pending_tokens(
    spark: SparkSession, ledger_dir: str, applied_tokens
) -> list[str]:
    """Ledger idempotency tokens whose accepted docs have NOT reached
    an index — *applied_tokens* is that index's manifest list
    (``entry["applied_tokens"]``). Zero-accept tokens never fire an
    index append (the batch handler skips them), so they are excluded
    (one driver-side row probe per unapplied token — ~none when the
    stream is caught up).

    Gate ledger compaction on this being EMPTY for every downstream
    index: compaction clears the token map, and a token recorded in
    the ledger but not yet applied to an index would otherwise
    resolve to accepted=0 on redelivery — the batch silently never
    indexed (permanent ledger/index divergence)."""
    manifest = _read_manifest(ledger_dir)
    applied = {str(t) for t in (applied_tokens or [])}
    out = []
    for tok, seg in sorted((manifest.get("tokens") or {}).items()):
        if tok in applied:
            continue
        if spark.read.parquet(seg).limit(1).count() == 0:
            continue
        out.append(tok)
    return out


def compact_ledger(
    spark: SparkSession,
    ledger_dir: str,
    require_applied=None,
) -> int:
    """Merge a many-segment ledger into one segment (content
    unchanged): new segment written first, manifest flips to it,
    superseded segment dirs removed after the flip. Returns the
    number of segments merged (0 = no-op).

    Compaction CLEARS the idempotency-token map (tokens point at
    per-batch segments, which no longer exist after the merge): run
    it only when the streaming pipeline feeding the ledger is caught
    up — a token replayed after compaction re-screens, and since
    everything it accepted is in the merged ledger, it re-accepts
    nothing; pair compaction with a caught-up index (no pending
    un-applied tokens) so that is a true no-op. *require_applied*
    ENFORCES that precondition: pass one applied-token collection per
    downstream index (each index manifest's ``applied_tokens``) and
    compaction refuses while any ledger token is still pending at any
    of them (:func:`pending_tokens`) — ``Engine.maintain`` wires this
    from the index registry."""
    manifest = _read_manifest(ledger_dir)
    if require_applied is not None:
        for applied in require_applied:
            pend = pending_tokens(spark, ledger_dir, applied)
            if pend:
                raise ValueError(
                    f"ledger at {ledger_dir} has tokens not yet applied "
                    f"to every downstream index: {pend[:5]} — the stream "
                    "is not caught up; drain it before compacting"
                )
    segs = manifest["segments"]
    dels = manifest.get("deletes") or []
    if len(segs) <= 1 and not dels:
        return 0
    seg_id = _next_seg_id(manifest)
    merged = os.path.join(ledger_dir, f"seg{seg_id}__compacted")
    # the counter guarantees this, but reading and overwriting the
    # same path would corrupt the ledger — fail loudly, never write
    if merged in segs:
        raise RuntimeError(
            f"compaction target {merged} is a live segment; "
            "ledger manifest counter is corrupt"
        )
    # the live view already excludes retired rows, so tombstones are
    # applied PHYSICALLY by the rewrite (and dropped below)
    ledger_fingerprints(spark, ledger_dir).write.mode(
        "overwrite"
    ).parquet(merged)
    # preserve every other manifest key (mode!) — replacing the whole
    # manifest would silently let exact ingests into a fuzzy ledger
    manifest["segments"] = [merged]
    manifest["next_seg"] = seg_id + 1
    manifest["deletes"] = None
    # token segments are gone after the merge — a dangling map would
    # make a replay read deleted paths; cleared = replay re-screens
    # (and re-accepts nothing: everything is in the merged ledger)
    manifest.pop("tokens", None)
    _write_manifest(ledger_dir, manifest)
    for s in segs:
        shutil.rmtree(s, ignore_errors=True)
    for d in dels:
        shutil.rmtree(d["path"], ignore_errors=True)
    return len(segs)
