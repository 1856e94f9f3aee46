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


def fsck_sketch_stores(store_dir: str) -> list[dict]:
    from queens_spark.store.sketch_store import _read_manifest

    f: list[dict] = []
    entries = _read_manifest(store_dir)
    for name, entry in sorted(entries.items()):
        path = entry.get("path")
        if path and not os.path.exists(path):
            f.append(_finding(
                "sketch_store", name, "error",
                f"manifest references missing sketch artifact: {path}",
            ))
        base = os.path.join(store_dir, name)
        current = f"v{int(entry.get('version', 0))}"
        if os.path.isdir(base):
            for d in sorted(os.listdir(base)):
                full = os.path.join(base, d)
                if (_V_DIR.match(d) and os.path.isdir(full)
                        and d != current):
                    f.append(_finding(
                        "sketch_store", name, "warn",
                        f"orphan version dir (crashed write, GC "
                        f"candidate): {full}",
                    ))
        toks = entry.get("applied_tokens") or []
        if toks:
            f.append(_finding(
                "sketch_store", name, "info",
                f"{len(toks)} applied idempotency tokens retained",
            ))
    return f


def fsck_registry(
    registry_dir: str, vindex_dir: str, tindex_dir: str,
    sketch_dir: str | None = None,
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
    for collection, rows in sorted(_read(registry_dir).items()):
        for row in rows:
            kind = row.get("kind")
            if kind not in by_kind:
                if kind == "sketch":
                    # caller audited without a sketch dir — cannot
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


def summarize(findings: list[dict]) -> dict:
    by = {"error": 0, "warn": 0, "info": 0}
    for x in findings:
        by[x["level"]] = by.get(x["level"], 0) + 1
    return {"healthy": by["error"] == 0, **by}
