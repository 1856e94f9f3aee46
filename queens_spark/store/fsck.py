"""fsck — the read-only consistency audit of the retrieval storage
tier, the diagnostic twin of ``Engine.maintain``'s repairs.

``maintain`` assumes the manifests tell the truth and acts on them;
``fsck`` asks whether they do: every artifact path a manifest serves
from must exist on disk, tombstone coverage must stay inside the
segment count it scopes, idempotency-token entries must point at
live segments, version directories must belong to the manifest, and
the registry must only name indexes that exist. All checks are pure
os/json walks — NO Spark jobs, so an operator can run it on a cold
warehouse (or in a cron) in milliseconds and trust that it never
mutates anything.

Findings are dicts ``{component, name, level, message}`` with level
``error`` (serving would fail or silently lie), ``warn`` (dead weight
or drift that the next maintain/GC should claim), or ``info``
(inventory facts an operator wants in the report). A healthy
warehouse returns zero errors and zero warns.

Crash-safety posture audited here, for reference: every store in this
tier writes artifacts FIRST and flips its manifest LAST (atomic
``os.replace``), so a crashed write leaves an ORPHAN (unreferenced
bytes — warn, GC-able), never a DANGLING reference (manifest pointing
at nothing — error, serving breaks). A dangling reference therefore
always means out-of-band damage (manual deletion, partial restore,
split-brain copy) — exactly what an operator needs to hear loudly.
"""

from __future__ import annotations

import os
import re

_V_DIR = re.compile(r"^v\d+$")


def _finding(component: str, name: str, level: str, message: str) -> dict:
    return {
        "component": component,
        "name": name,
        "level": level,
        "message": message,
    }


def _paths(entry_val) -> list[str]:
    if entry_val is None:
        return []
    return list(entry_val) if isinstance(entry_val, list) else [entry_val]


def _referenced_paths(entry: dict) -> list[str]:
    """Every on-disk artifact path a vector/text index manifest entry
    serves from."""
    out: list[str] = []
    for key in ("pq_codes_path", "int8_codes_path", "ivf_assign_path",
                "centroids_path"):
        out.extend(_paths(entry.get(key)))
    for seg in entry.get("segments") or []:
        if isinstance(seg, dict) and seg.get("path"):
            out.append(seg["path"])
        elif isinstance(seg, str):
            out.append(seg)
    for key in ("deletes_path", "deletes"):
        for d in entry.get(key) or []:
            if isinstance(d, dict) and d.get("path"):
                out.append(d["path"])
    return out


def _orphan_version_dirs(
    name_dir: str, referenced: list[str]
) -> list[str]:
    """v* directories under an index's name dir none of whose contents
    the manifest references — superseded versions awaiting GC or the
    leftovers of a crashed build."""
    if not os.path.isdir(name_dir):
        return []
    orphans = []
    for d in sorted(os.listdir(name_dir)):
        full = os.path.join(name_dir, d)
        if not (_V_DIR.match(d) and os.path.isdir(full)):
            continue
        base = os.path.abspath(full)
        if not any(
            os.path.abspath(p) == base
            or os.path.abspath(p).startswith(base + os.sep)
            for p in referenced
        ):
            orphans.append(full)
    return orphans


def _index_entry_findings(
    component: str, name: str, entry: dict, name_dir: str
) -> list[dict]:
    """Checks shared by both index kinds: dangling artifact paths,
    tombstone coverage bounds, counter monotonicity, orphan version
    dirs, token inventory."""
    f: list[dict] = []
    referenced = _referenced_paths(entry)
    for p in referenced:
        if not os.path.exists(p):
            f.append(_finding(
                component, name, "error",
                f"manifest references missing artifact: {p}",
            ))
    n_segs = max(
        len(_paths(entry.get("pq_codes_path"))),
        len(entry.get("segments") or []),
    )
    for key in ("deletes_path", "deletes"):
        for d in entry.get(key) or []:
            covers = int(d.get("covers", 0)) if isinstance(d, dict) else 0
            if covers > n_segs:
                f.append(_finding(
                    component, name, "error",
                    f"tombstone covers {covers} segments but only "
                    f"{n_segs} exist",
                ))
    n_dels = len(entry.get("deletes_path") or entry.get("deletes") or [])
    for counter_key in ("next_seg", "next_delete_seg"):
        nxt = entry.get(counter_key)
        if nxt is None:
            continue
        floor = n_dels if counter_key == "next_delete_seg" else n_segs
        if int(nxt) < floor:
            f.append(_finding(
                component, name, "error",
                f"{counter_key}={nxt} below live count {floor} — "
                f"future writes would collide",
            ))
    for orphan in _orphan_version_dirs(name_dir, referenced):
        f.append(_finding(
            component, name, "warn",
            f"orphan version dir (crashed build or superseded, "
            f"GC candidate): {orphan}",
        ))
    toks = entry.get("applied_tokens") or []
    if toks:
        f.append(_finding(
            component, name, "info",
            f"{len(toks)} applied idempotency tokens retained "
            f"(cleared by maintain once the stream is caught up)",
        ))
    return f


def fsck_vector_indexes(index_dir: str) -> list[dict]:
    from queens_spark.store.vector_index import _read_manifest

    out: list[dict] = []
    entries = _read_manifest(index_dir)
    for name, entry in sorted(entries.items()):
        out.extend(_index_entry_findings(
            "vector_index", name, entry, os.path.join(index_dir, name)
        ))
    return out


def fsck_text_indexes(index_dir: str) -> list[dict]:
    from queens_spark.store.text_index import _read_manifest

    out: list[dict] = []
    entries = _read_manifest(index_dir)
    for name, entry in sorted(entries.items()):
        out.extend(_index_entry_findings(
            "text_index", name, entry, os.path.join(index_dir, name)
        ))
    return out


def fsck_ledger(ledger_dir: str, name: str) -> list[dict]:
    from queens_spark.store.dedup_ledger import _read_manifest

    f: list[dict] = []
    manifest = _read_manifest(ledger_dir)
    segs = list(manifest.get("segments") or [])
    for p in segs:
        if not os.path.exists(p):
            f.append(_finding(
                "dedup_ledger", name, "error",
                f"manifest references missing segment: {p}",
            ))
    seg_set = {os.path.abspath(p) for p in segs}
    for tok, seg in sorted((manifest.get("tokens") or {}).items()):
        if os.path.abspath(seg) not in seg_set or not os.path.exists(seg):
            f.append(_finding(
                "dedup_ledger", name, "error",
                f"idempotency token {tok} points at a segment the "
                f"ledger no longer serves ({seg}) — a redelivery "
                f"would replay stale accepted-ids",
            ))
    n_segs = len(segs)
    for key in ("deletes", "blocked"):
        for d in manifest.get(key) or []:
            if not isinstance(d, dict):
                continue
            if d.get("path") and not os.path.exists(d["path"]):
                f.append(_finding(
                    "dedup_ledger", name, "error",
                    f"{key} entry references missing path: {d['path']}",
                ))
            if int(d.get("covers", 0)) > n_segs:
                f.append(_finding(
                    "dedup_ledger", name, "error",
                    f"{key} entry covers {d.get('covers')} segments "
                    f"but only {n_segs} exist",
                ))
    nxt = manifest.get("next_seg")
    if nxt is not None and int(nxt) < n_segs:
        f.append(_finding(
            "dedup_ledger", name, "error",
            f"next_seg={nxt} below live segment count {n_segs}",
        ))
    # orphan segment dirs: bytes under the ledger dir that nothing
    # references (crashed append before the manifest flip)
    if os.path.isdir(ledger_dir):
        referenced = seg_set | {
            os.path.abspath(d["path"])
            for key in ("deletes", "blocked")
            for d in (manifest.get(key) or [])
            if isinstance(d, dict) and d.get("path")
        }
        for d in sorted(os.listdir(ledger_dir)):
            full = os.path.abspath(os.path.join(ledger_dir, d))
            if not os.path.isdir(full):
                continue
            if full not in referenced:
                f.append(_finding(
                    "dedup_ledger", name, "warn",
                    f"orphan segment dir (crashed append, GC "
                    f"candidate): {full}",
                ))
    return f


def _fsck_flat_store(
    component: str, store_dir: str, entries: dict
) -> list[dict]:
    """Shared audit for single-artifact versioned stores (sketch,
    ecdf): manifest-referenced artifact must exist (error), non-live
    version dirs are crashed-write orphans (warn), retained tokens are
    inventory (info)."""
    f: list[dict] = []
    for name, entry in sorted(entries.items()):
        path = entry.get("path")
        if path and not os.path.exists(path):
            f.append(_finding(
                component, name, "error",
                f"manifest references missing artifact: {path}",
            ))
        base = os.path.join(store_dir, name)
        current = f"v{int(entry.get('version', 0))}"
        if os.path.isdir(base):
            for d in sorted(os.listdir(base)):
                full = os.path.join(base, d)
                if (_V_DIR.match(d) and os.path.isdir(full)
                        and d != current):
                    f.append(_finding(
                        component, name, "warn",
                        f"orphan version dir (crashed write, GC "
                        f"candidate): {full}",
                    ))
        toks = entry.get("applied_tokens") or []
        if toks:
            f.append(_finding(
                component, name, "info",
                f"{len(toks)} applied idempotency tokens retained",
            ))
    return f


def fsck_sketch_stores(store_dir: str) -> list[dict]:
    from queens_spark.store.sketch_store import _read_manifest

    return _fsck_flat_store(
        "sketch_store", store_dir, _read_manifest(store_dir)
    )


def fsck_ecdf_stores(store_dir: str) -> list[dict]:
    from queens_spark.store.ecdf_store import _read_manifest

    return _fsck_flat_store(
        "ecdf_store", store_dir, _read_manifest(store_dir)
    )


def _cluster_map_names(cluster_dir: str) -> set[str]:
    """Cluster maps live one-per-subdir, each with its own manifest."""
    from queens_spark.store.cluster_map import (
        MANIFEST_NAME as CM_MANIFEST,
    )

    if not os.path.isdir(cluster_dir):
        return set()
    return {
        d for d in os.listdir(cluster_dir)
        if os.path.exists(os.path.join(cluster_dir, d, CM_MANIFEST))
    }


def fsck_registry(
    registry_dir: str, vindex_dir: str, tindex_dir: str,
    sketch_dir: str | None = None, cluster_dir: str | None = None,
    ecdf_dir: str | None = None,
) -> list[dict]:
    from queens_spark.store.index_registry import _read
    from queens_spark.store.sketch_store import (
        _read_manifest as _read_sman,
    )
    from queens_spark.store.text_index import (
        _read_manifest as _read_tman,
    )
    from queens_spark.store.vector_index import (
        _read_manifest as _read_vman,
    )

    f: list[dict] = []
    by_kind = {
        "vector": set(_read_vman(vindex_dir)),
        "text": set(_read_tman(tindex_dir)),
    }
    if sketch_dir is not None:
        by_kind["sketch"] = set(_read_sman(sketch_dir))
    if cluster_dir is not None:
        by_kind["cluster"] = _cluster_map_names(cluster_dir)
    if ecdf_dir is not None:
        from queens_spark.store.ecdf_store import (
            _read_manifest as _read_eman,
        )

        by_kind["ecdf"] = set(_read_eman(ecdf_dir))
    for collection, rows in sorted(_read(registry_dir).items()):
        for row in rows:
            kind = row.get("kind")
            if kind not in by_kind:
                if kind in ("sketch", "cluster", "ecdf"):
                    # caller audited without that store's dir — cannot
                    # verify, but a healthy store must not read as a
                    # missing one
                    continue
                f.append(_finding(
                    "index_registry", collection, "error",
                    f"registered index {row.get('name')!r} has unknown "
                    f"kind {kind!r}",
                ))
                continue
            have = by_kind[kind]
            if row.get("name") not in have:
                f.append(_finding(
                    "index_registry", collection, "error",
                    f"registered {row.get('kind')} index "
                    f"{row.get('name')!r} does not exist — every "
                    f"ingest into {collection!r} will fail its "
                    f"auto-refresh",
                ))
    return f


def fsck_cluster_maps(cluster_dir: str) -> list[dict]:
    """Cluster-map audit: every manifest-referenced segment/graph dir
    (and each segment's seven sub-artifacts) must exist (error);
    unreferenced seg_/graph_/v dirs are crashed-write orphans (warn);
    the persisted counters must clear the highest referenced dir
    number (error — future writes would collide)."""
    from queens_spark.store.cluster_map import (
        _read_manifest as _read_cm,
    )

    SEG_PARTS = ("docs", "postings", "dfs", "hot", "hot_sigs",
                 "members", "canonical")
    f: list[dict] = []
    if not os.path.isdir(cluster_dir):
        return f
    for name in sorted(os.listdir(cluster_dir)):
        map_dir = os.path.join(cluster_dir, name)
        if not os.path.isdir(map_dir):
            continue
        if name.endswith(("__import_tmp", "__old")):
            # import_map staging trees: a crashed import's leftovers
            # are self-healing (the retry clears staging; __old is the
            # documented manual-recovery copy) — crash orphans warn,
            # never error (the house severity contract)
            f.append(_finding(
                "cluster_map", name, "warn",
                f"import staging tree left by a crashed import_map "
                f"(retry cleans it up): {map_dir}",
            ))
            continue
        entry = (_read_cm(map_dir) or {}).get("current")
        if not entry:
            continue
        if "segments" not in entry:
            f.append(_finding(
                "cluster_map", name, "warn",
                "pre-append-era layout — serving raises; rebuild to "
                "upgrade",
            ))
            continue
        referenced = set(entry["segments"]) | {entry["graph"]}
        retire_segs = {
            r.get("seg"): r for r in (entry.get("retirements") or [])
        }
        for seg in entry["segments"]:
            segdir = os.path.join(map_dir, seg)
            if not os.path.isdir(segdir):
                f.append(_finding(
                    "cluster_map", name, "error",
                    f"manifest references missing segment: {segdir}",
                ))
                continue
            for part in SEG_PARTS:
                if not os.path.exists(os.path.join(segdir, part)):
                    f.append(_finding(
                        "cluster_map", name, "error",
                        f"segment {seg} is missing artifact {part!r}",
                    ))
            if seg in retire_segs:
                # retirement segments additionally carry the tombstone
                # and un-flip artifacts serving reads are scoped by
                for part in ("retired", "unhot", "unhot_docs"):
                    if not os.path.exists(os.path.join(segdir, part)):
                        f.append(_finding(
                            "cluster_map", name, "error",
                            f"retirement segment {seg} is missing "
                            f"artifact {part!r}",
                        ))
            elif os.path.exists(os.path.join(segdir, "retired")):
                f.append(_finding(
                    "cluster_map", name, "error",
                    f"segment {seg} holds a 'retired' tombstone list "
                    "but is not in the manifest's retirement list — "
                    "coverage scoping cannot apply it",
                ))
        for rseg, r in retire_segs.items():
            if rseg not in set(entry["segments"]):
                f.append(_finding(
                    "cluster_map", name, "error",
                    f"retirement references a segment not in the "
                    f"manifest: {rseg}",
                ))
                continue
            idx = entry["segments"].index(rseg)
            cov = int(r.get("coverage", -1))
            # by construction coverage == the retirement segment's own
            # index (retire sets it to the pre-append segment count):
            # higher would hide rows written AFTER the retirement;
            # lower would silently resurrect retired docs in the
            # uncovered earlier segments
            if cov != idx:
                f.append(_finding(
                    "cluster_map", name, "error",
                    f"retirement {rseg} coverage {cov} != its segment "
                    f"index {idx} — tombstones would apply to the "
                    "wrong segments",
                ))
        for part in ("near", "copy"):
            p = os.path.join(map_dir, entry["graph"], part)
            if not os.path.exists(p):
                f.append(_finding(
                    "cluster_map", name, "error",
                    f"manifest references missing graph artifact: {p}",
                ))
        for counter, prefix in (("next_seg", "seg_"),
                                ("next_graph", "graph_")):
            used = [
                int(d[len(prefix):]) for d in referenced
                if d.startswith(prefix)
            ]
            if used and int(entry.get(counter, 0)) <= max(used):
                f.append(_finding(
                    "cluster_map", name, "error",
                    f"{counter}={entry.get(counter)} not above live "
                    f"max {max(used)} — future writes would collide",
                ))
        for d in sorted(os.listdir(map_dir)):
            full = os.path.join(map_dir, d)
            if (d.startswith(("seg_", "graph_", "v"))
                    and os.path.isdir(full) and d not in referenced):
                f.append(_finding(
                    "cluster_map", name, "warn",
                    f"orphan dir (crashed build/append, GC candidate): "
                    f"{full}",
                ))
        toks = entry.get("applied_tokens") or []
        if toks:
            f.append(_finding(
                "cluster_map", name, "info",
                f"{len(toks)} applied idempotency tokens retained",
            ))
    return f


def fsck_rollups(rollups_dir: str) -> list[dict]:
    """Rollup audit (os/json only — winner selection needs the ingest
    log, which is Spark territory; serving repairs missing segments
    lazily, so absence is not damage here): registry specs must be
    well-formed (error), a segment dir without its _SUCCESS sentinel
    is a crashed partial write (warn — the repair path rebuilds it),
    and segment dirs for unregistered rollup names are orphans (warn)."""
    import re as _re

    from queens_spark.store.rollup import REGISTRY_NAME, _read_registry

    f: list[dict] = []
    if not os.path.isdir(rollups_dir):
        return f
    for collection in sorted(os.listdir(rollups_dir)):
        cdir = os.path.join(rollups_dir, collection)
        if not os.path.isdir(cdir):
            continue
        reg = _read_registry(rollups_dir, collection)
        if not reg and os.path.exists(os.path.join(cdir, REGISTRY_NAME)):
            f.append(_finding(
                "rollup", collection, "error",
                "rollup registry exists but is unreadable/corrupt",
            ))
        for name, spec in sorted(reg.items()):
            if not spec.get("keys") or not spec.get("values"):
                f.append(_finding(
                    "rollup", f"{collection}/{name}", "error",
                    f"registered spec is malformed: {spec}",
                ))
            segs_root = os.path.join(cdir, name, "segments")
            if not os.path.isdir(segs_root):
                continue
            for d in sorted(os.listdir(segs_root)):
                full = os.path.join(segs_root, d)
                if not _re.fullmatch(r"ingest_\d+", d):
                    f.append(_finding(
                        "rollup", f"{collection}/{name}", "warn",
                        f"unrecognized entry in segments dir: {full}",
                    ))
                elif not os.path.exists(os.path.join(full, "_SUCCESS")):
                    f.append(_finding(
                        "rollup", f"{collection}/{name}", "warn",
                        f"segment without _SUCCESS (crashed partial "
                        f"write; serving repairs it lazily): {full}",
                    ))
        for d in sorted(os.listdir(cdir)):
            full = os.path.join(cdir, d)
            if os.path.isdir(full) and d not in reg:
                f.append(_finding(
                    "rollup", collection, "warn",
                    f"segment tree for unregistered rollup (orphan, GC "
                    f"candidate): {full}",
                ))
    return f


def fsck_training_runs(runs_dir: str) -> list[dict]:
    """Training-run/release-bundle audit: the manifest-referenced
    version dir, its data tree, every recorded shard partition, and
    every attached report table must exist (error); superseded v-dirs
    are orphans (warn); a manifest without a ``report`` key on a run
    whose verify-contract expects one is the documented
    detectable-incomplete state, so it is only surfaced as info.
    Checksum verification is Spark work — ``run.verify()`` — not
    fsck's."""
    from queens_spark.store.training_run import (
        _read_manifest as _read_tr,
    )

    f: list[dict] = []
    if not os.path.isdir(runs_dir):
        return f
    for name in sorted(os.listdir(runs_dir)):
        run_dir = os.path.join(runs_dir, name)
        if not os.path.isdir(run_dir):
            continue
        m = _read_tr(run_dir)
        entry = m.get("current")
        if not entry:
            continue
        vdir = os.path.join(run_dir, entry["dir"])
        data_dir = os.path.join(vdir, "data")
        if not os.path.isdir(vdir):
            f.append(_finding(
                "training_run", name, "error",
                f"manifest references missing version dir: {vdir}",
            ))
            continue
        if not os.path.isdir(data_dir):
            f.append(_finding(
                "training_run", name, "error",
                f"version dir has no data tree: {data_dir}",
            ))
        else:
            for shard in sorted(entry.get("shards") or {}):
                p = os.path.join(data_dir, f"shard={shard}")
                if not os.path.isdir(p):
                    f.append(_finding(
                        "training_run", name, "error",
                        f"manifest records shard {shard} but its "
                        f"partition dir is missing: {p}",
                    ))
        for table, meta in sorted((entry.get("report") or {}).items()):
            p = os.path.join(vdir, meta["path"])
            if not os.path.exists(p):
                f.append(_finding(
                    "training_run", name, "error",
                    f"attached report table {table!r} is missing: {p}",
                ))
        if int(m.get("next_version", 0)) <= int(entry["version"]):
            f.append(_finding(
                "training_run", name, "error",
                f"next_version={m.get('next_version')} not above live "
                f"version {entry['version']} — future builds collide",
            ))
        for d in sorted(os.listdir(run_dir)):
            full = os.path.join(run_dir, d)
            if (_V_DIR.match(d) and os.path.isdir(full)
                    and d != entry["dir"]):
                f.append(_finding(
                    "training_run", name, "warn",
                    f"orphan version dir (crashed build or superseded, "
                    f"GC candidate): {full}",
                ))
    return f


def fsck_corpus_profiles(profiles_dir: str) -> list[dict]:
    """Corpus-profile audit: a present-but-unreadable profile is
    damage (error — the drift gate would silently treat the corpus as
    empty); histogram values must be non-negative integers within the
    declared bucket domain (error); retained idempotency tokens are
    inventory (info)."""
    from queens_spark.store.corpus_profile import PROFILE_NAME, read_profile

    f: list[dict] = []
    if not os.path.isdir(profiles_dir):
        return f
    for name in sorted(os.listdir(profiles_dir)):
        pdir = os.path.join(profiles_dir, name)
        ppath = os.path.join(pdir, PROFILE_NAME)
        if not os.path.isdir(pdir) or not os.path.exists(ppath):
            continue
        profile = read_profile(profiles_dir, name)
        if not profile:
            f.append(_finding(
                "corpus_profile", name, "error",
                f"profile file exists but is unreadable/corrupt: {ppath}",
            ))
            continue
        n_buckets = int(profile.get("n_buckets", 0))
        for k, v in (profile.get("hist") or {}).items():
            try:
                bucket, count = int(k), int(v)
            except (TypeError, ValueError):
                f.append(_finding(
                    "corpus_profile", name, "error",
                    f"non-integer histogram entry {k!r}: {v!r}",
                ))
                continue
            # bucketize clamps to n_buckets-1, so the valid domain is
            # [0, n_buckets)
            if count < 0 or bucket < 0 or bucket >= n_buckets:
                f.append(_finding(
                    "corpus_profile", name, "error",
                    f"histogram entry out of contract (bucket={bucket}, "
                    f"count={count}, n_buckets={n_buckets})",
                ))
        toks = profile.get("applied_tokens") or {}
        if toks:
            f.append(_finding(
                "corpus_profile", name, "info",
                f"{len(toks)} applied idempotency tokens retained",
            ))
    return f


def fsck_takedowns(takedowns_dir: str) -> list[dict]:
    """Takedown-artifact audit (store/takedown.py): every manifest-
    referenced segment dir must exist with data files (error — the
    serving filter, the stage rewrite, AND the physical purge all
    consume it; a missing segment means retired rows would re-serve),
    a manifest with segments must record its id_col (error),
    unreferenced seg_* dirs are crashed-write or post-purge leftovers
    (warn — the manifest flips before the bytes are removed), and
    pending-purge segments are inventory (info)."""
    from queens_spark.store.takedown import read_manifest

    f: list[dict] = []
    if not os.path.isdir(takedowns_dir):
        return f
    for coll in sorted(os.listdir(takedowns_dir)):
        tdir = os.path.join(takedowns_dir, coll)
        if not os.path.isdir(tdir):
            continue
        manifest = read_manifest(tdir)
        segs = manifest.get("segments") or []
        if segs and not manifest.get("id_col"):
            f.append(_finding(
                "takedown", coll, "error",
                "manifest has segments but no id_col",
            ))
        referenced = set()
        for seg in segs:
            d = seg.get("dir")
            referenced.add(d)
            sdir = os.path.join(tdir, d or "")
            if not d or not os.path.isdir(sdir) or not any(
                fn.endswith(".parquet") for fn in os.listdir(sdir)
            ):
                f.append(_finding(
                    "takedown", coll, "error",
                    f"manifest references missing/empty segment {d!r} "
                    "— retired rows would re-serve",
                ))
        for entry in sorted(os.listdir(tdir)):
            if (
                entry.startswith("seg_")
                and os.path.isdir(os.path.join(tdir, entry))
                and entry not in referenced
            ):
                f.append(_finding(
                    "takedown", coll, "warn",
                    f"unreferenced segment dir {entry} (crashed write "
                    "or post-purge leftover — GC candidate)",
                ))
        if segs:
            f.append(_finding(
                "takedown", coll, "info",
                f"{len(segs)} segment(s) pending physical purge "
                f"({sum(int(s.get('n_ids') or 0) for s in segs)} ids)",
            ))
    return f


def fsck_registry_schemas(
    registry_dir: str,
    schema_cols: dict[str, list[str]],
    vindex_dir: str,
    tindex_dir: str,
    sketch_dir: str | None = None,
    cluster_dir: str | None = None,
    ecdf_dir: str | None = None,
) -> list[dict]:
    """The registry's SCHEMA audit: every registered index's ingest
    columns (id/text/vec/meta for indexes, group/key for sketch
    stores, id/text for cluster maps) must still exist in the
    collection's schema — a drifted collection otherwise fails at the
    NEXT ingest's auto-refresh; fail it at fsck time instead.
    *schema_cols* maps collection → its column names (the caller owns
    the schema registry; fsck stays os/json)."""
    from queens_spark.store.index_registry import _read
    from queens_spark.store.sketch_store import (
        _read_manifest as _read_sman,
    )
    from queens_spark.store.text_index import (
        _read_manifest as _read_tman,
    )
    from queens_spark.store.vector_index import (
        _read_manifest as _read_vman,
    )

    def _needed(kind: str, name: str) -> list[str]:
        if kind == "text":
            e = _read_tman(tindex_dir).get(name) or {}
            return [e.get("id_col"), e.get("text_col"),
                    *(e.get("meta_cols") or [])]
        if kind == "vector":
            e = _read_vman(vindex_dir).get(name) or {}
            return [e.get("id_col"), e.get("vec_col"),
                    *(e.get("meta_cols") or [])]
        if kind == "sketch" and sketch_dir is not None:
            e = _read_sman(sketch_dir).get(name) or {}
            return [e.get("group_col"), e.get("key_col")]
        if kind == "cluster" and cluster_dir is not None:
            from queens_spark.store.cluster_map import (
                _read_manifest as _read_cm,
            )

            e = (_read_cm(os.path.join(cluster_dir, name)) or {}).get(
                "current"
            ) or {}
            return [e.get("id_col"), e.get("text_col")]
        if kind == "ecdf" and ecdf_dir is not None:
            from queens_spark.store.ecdf_store import (
                _read_manifest as _read_em,
            )

            e = _read_em(ecdf_dir).get(name) or {}
            # value_sql's column references are validated by the
            # ingest itself (expression resolution); the group column
            # is the schema-auditable part
            return [e.get("group_col")]
        return []

    f: list[dict] = []
    for collection, rows in sorted(_read(registry_dir).items()):
        cols = schema_cols.get(collection)
        if cols is None:
            continue  # unknown collection: existence audit's business
        have = set(cols)
        for row in rows:
            missing = sorted(
                c for c in _needed(row.get("kind"), row.get("name"))
                if c is not None and c not in have
            )
            if missing:
                f.append(_finding(
                    "index_registry", collection, "error",
                    f"registered {row.get('kind')} index "
                    f"{row.get('name')!r} needs column(s) {missing} "
                    f"that {collection!r}'s schema no longer has — "
                    f"every ingest's auto-refresh will fail",
                ))
    return f


def summarize(findings: list[dict]) -> dict:
    by = {"error": 0, "warn": 0, "info": 0}
    for x in findings:
        by[x["level"]] = by.get(x["level"], 0) + 1
    return {"healthy": by["error"] == 0, **by}
