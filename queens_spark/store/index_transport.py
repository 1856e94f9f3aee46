"""Index transport: export a stored index as a self-contained
directory, import it into another warehouse.

The promote/backup flow a production index needs: build and validate
an index in a staging warehouse, then ship the ARTIFACTS (not the
corpus, not a rebuild) to production — or snapshot one before a risky
maintenance sweep. Both index kinds already keep everything under
``<index_dir>/<name>/`` behind a manifest entry whose artifact paths
are absolute; transport is therefore a directory copy plus a path
rebase:

- :func:`export_index` copies the index's directory tree to *dest*
  and writes the manifest entry beside it with every artifact path
  RELATIVE to the export root (a self-contained, relocatable bundle);
- :func:`import_index` copies a bundle into a warehouse's index dir
  under a chosen name, re-absolutizes the paths, and flips the target
  manifest LAST (the house crash convention: a half-copied bundle is
  an invisible orphan).

Idempotency-token lists do NOT travel (they are meaningful only
against the source warehouse's ledger); fingerprints do (staleness
detection still works when the destination sees the same corpus).

Release bundles travel the same way: :func:`export_run` /
:func:`import_run` ship a training run (packed shards + attached
release report + recorded checksums, store/training_run.py) between
warehouses as one verb — the run manifest's paths are already
version-dir-relative, so the bundle is a copy of the live version dir
plus its manifest entry, and ``run.verify()`` holds on the imported
side because the checksums describe the shipped bytes.
"""

from __future__ import annotations

import json
import os
import shutil


def _rebase(obj, old_prefix: str, new_prefix: str):
    """Recursively rewrite path strings under *old_prefix*."""
    if isinstance(obj, str):
        if obj.startswith(old_prefix):
            return new_prefix + obj[len(old_prefix):]
        return obj
    if isinstance(obj, list):
        return [_rebase(v, old_prefix, new_prefix) for v in obj]
    if isinstance(obj, dict):
        return {k: _rebase(v, old_prefix, new_prefix)
                for k, v in obj.items()}
    return obj


def _manifest_io(kind: str):
    if kind == "text":
        from queens_spark.store import text_index as m
    elif kind == "vector":
        from queens_spark.store import vector_index as m
    elif kind == "sketch":
        from queens_spark.store import sketch_store as m
    elif kind == "ecdf":
        from queens_spark.store import ecdf_store as m
    else:
        raise ValueError(
            f"kind must be one of 'text', 'vector', 'sketch', 'ecdf'; "
            f"got {kind!r}"
        )
    return m


def export_index(
    index_dir: str, name: str, dest: str, kind: str = "text"
) -> str:
    """Copy the named index's artifact tree to *dest* (created; must
    not already contain a bundle) together with a relocatable
    ``bundle.json`` (manifest entry with export-root-relative paths +
    the kind). Returns *dest*."""
    m = _manifest_io(kind)
    entries = m._read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no {kind} index {name!r} in {index_dir}; "
            f"built: {sorted(entries)}"
        )
    entry = dict(entries[name])
    entry.pop("applied_tokens", None)
    src_tree = os.path.join(index_dir, name)
    if os.path.exists(os.path.join(dest, "bundle.json")):
        raise ValueError(f"{dest} already holds an index bundle")
    os.makedirs(dest, exist_ok=True)
    shutil.copytree(
        src_tree, os.path.join(dest, "tree"), dirs_exist_ok=True
    )
    rel = _rebase(entry, src_tree + os.sep, "tree" + os.sep)
    tmp = os.path.join(dest, "bundle.json__tmp")
    with open(tmp, "w") as fh:
        json.dump({"kind": kind, "entry": rel, "name": name}, fh,
                  sort_keys=True)
    os.replace(tmp, os.path.join(dest, "bundle.json"))
    return dest


def export_map(cluster_dir: str, name: str, dest: str) -> str:
    """Ship a cluster map: its manifest references segment/graph dirs
    by NAME (relative to the map dir), so the bundle is the map tree
    as-is — only the idempotency tokens are stripped (meaningful only
    against the source warehouse's ledger)."""
    from queens_spark.store.cluster_map import (
        MANIFEST_NAME as CM_MANIFEST,
        _read_manifest as _read_cm,
    )

    src_tree = os.path.join(cluster_dir, name)
    manifest = _read_cm(src_tree)
    if not manifest.get("current"):
        raise FileNotFoundError(f"no cluster map {name!r} in {cluster_dir}")
    if os.path.exists(os.path.join(dest, "bundle.json")):
        raise ValueError(f"{dest} already holds a bundle")
    os.makedirs(dest, exist_ok=True)
    shutil.copytree(
        src_tree, os.path.join(dest, "tree"), dirs_exist_ok=True
    )
    manifest = dict(manifest)
    manifest["current"] = dict(manifest["current"])
    manifest["current"]["applied_tokens"] = []
    tmp = os.path.join(dest, "tree", CM_MANIFEST + "__tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, os.path.join(dest, "tree", CM_MANIFEST))
    tmp = os.path.join(dest, "bundle.json__tmp")
    with open(tmp, "w") as fh:
        json.dump({"kind": "cluster_map", "name": name}, fh, sort_keys=True)
    os.replace(tmp, os.path.join(dest, "bundle.json"))
    return dest


def import_map(cluster_dir: str, src: str, name: str | None = None) -> str:
    """Install an exported cluster-map bundle under *name*. The copy
    lands in a staging dir first; the install is two renames (previous
    map aside, staging in). A crash between the renames leaves the
    previous map intact under ``<name>__old`` for manual recovery —
    the only non-atomic window in the transport tier, noted here
    because the map's manifest lives INSIDE its directory."""
    with open(os.path.join(src, "bundle.json")) as fh:
        bundle = json.load(fh)
    if bundle.get("kind") != "cluster_map":
        raise ValueError(
            f"not a cluster-map bundle: kind={bundle.get('kind')!r}"
        )
    name = name or bundle["name"]
    dst = os.path.join(cluster_dir, name)
    staging = dst + "__import_tmp"
    old = dst + "__old"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.copytree(os.path.join(src, "tree"), staging)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dst):
        os.replace(dst, old)
    os.replace(staging, dst)
    shutil.rmtree(old, ignore_errors=True)
    return name


def export_run(
    runs_dir: str, name: str, dest: str
) -> str:
    """Copy the named training run's LIVE version dir to *dest* with a
    relocatable ``bundle.json`` (the manifest entry — its data/report
    paths are already relative to the version dir). Returns *dest*."""
    from queens_spark.store.training_run import run_manifest

    entry = dict(run_manifest(os.path.join(runs_dir, name))["current"])
    src_tree = os.path.join(runs_dir, name, entry["dir"])
    if os.path.exists(os.path.join(dest, "bundle.json")):
        raise ValueError(f"{dest} already holds a bundle")
    os.makedirs(dest, exist_ok=True)
    shutil.copytree(
        src_tree, os.path.join(dest, "tree"), dirs_exist_ok=True
    )
    tmp = os.path.join(dest, "bundle.json__tmp")
    with open(tmp, "w") as fh:
        json.dump({"kind": "training_run", "entry": entry, "name": name},
                  fh, sort_keys=True)
    os.replace(tmp, os.path.join(dest, "bundle.json"))
    return dest


def import_run(
    runs_dir: str, src: str, name: str | None = None
) -> str:
    """Install an exported run bundle under *name* (default: the
    exported name). Tree copies FIRST, manifest flips LAST; version
    numbers come from the DESTINATION's counter. An existing run of
    that name is superseded (its old version dir GC'd post-flip).
    Returns the installed name — load with ``Engine.training_run``;
    ``verify()`` re-checks the shipped bytes against the traveled
    checksums."""
    from queens_spark.store.training_run import (
        _read_manifest,
        _write_manifest,
    )

    with open(os.path.join(src, "bundle.json")) as fh:
        bundle = json.load(fh)
    if bundle.get("kind") != "training_run":
        raise ValueError(
            f"not a training-run bundle: kind={bundle.get('kind')!r}"
        )
    name = name or bundle["name"]
    run_dir = os.path.join(runs_dir, name)
    manifest = _read_manifest(run_dir)
    version = int(manifest.get("next_version", 1))
    new_dir = f"v{version:06d}"
    dst_tree = os.path.join(run_dir, new_dir)
    if os.path.exists(dst_tree):
        shutil.rmtree(dst_tree, ignore_errors=True)  # crashed retry
    shutil.copytree(os.path.join(src, "tree"), dst_tree)
    entry = dict(bundle["entry"])
    entry["version"] = version
    entry["dir"] = new_dir
    manifest.update(
        {"current": entry, "next_version": version + 1, "name": name}
    )
    _write_manifest(run_dir, manifest)
    for d in os.listdir(run_dir):
        full = os.path.join(run_dir, d)
        if d.startswith("v") and d != new_dir and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
    return name


def import_index(
    index_dir: str, src: str, name: str | None = None
):
    """Install an exported bundle into *index_dir* under *name*
    (default: the exported name). The artifact tree copies FIRST,
    the manifest flips LAST; an existing index of that name is
    superseded (its version dirs GC like a rebuild). Returns the
    loaded index handle is the caller's job (load_*_index) — this
    only installs."""
    with open(os.path.join(src, "bundle.json")) as fh:
        bundle = json.load(fh)
    kind = bundle["kind"]
    name = name or bundle["name"]
    m = _manifest_io(kind)
    entries = m._read_manifest(index_dir)
    version = int(entries.get(name, {}).get("version", 0)) + 1
    # the dir name keeps the v-prefix convention so the build/compact
    # GC loops (which sweep `v*` dirs other than the live version)
    # reclaim a superseded import like any other stale version
    dst_tree = os.path.join(index_dir, name, f"v{version}__import")
    # dirs_exist_ok: a crash between copy and manifest flip leaves an
    # orphan dir; the retry overwrites it and flips normally
    shutil.copytree(os.path.join(src, "tree"), dst_tree,
                    dirs_exist_ok=True)
    entry = _rebase(bundle["entry"], "tree" + os.sep, dst_tree + os.sep)
    # the imported tree carries its own version subdirs; the manifest
    # version namespace is the DESTINATION's (no collision with any
    # pre-existing index of this name)
    entry["version"] = version
    entries[name] = entry
    m._write_manifest(index_dir, entries)
    base = os.path.join(index_dir, name)
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{version}__import":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return name
