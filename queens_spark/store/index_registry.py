"""Index registry: which stored indexes a collection's ingests must
keep fresh.

Round-9 left index maintenance BESIDE the ingest: `Engine.ingest`
screens a batch through the dedup ledger, but the caller still had to
remember `append_text_index` / `append_vector_index` after every
ingest — forget one and that index silently serves a stale corpus
until its fingerprint check fires. The reference's posture is the
opposite: derived state refreshes INSIDE the write path (metadata is
rebuilt inside staging, not by a separate call —
queens/core/read_write.py:464-531). This module gives the index tier
the same posture:

- :func:`register_index` persists ``collection → [(kind, name)]`` in
  a warehouse manifest (the :mod:`queens_spark.store.bucketed`
  restore pattern: JSON beside the data, atomic replace, restored by
  any later session with no Spark job);
- ``Engine.ingest`` (dedup path) and ``Engine.stream_ingest_corpus``
  read the registry and append the screened survivors to EVERY
  registered index under the batch's idempotency token, so one verb
  keeps the ledger, the warehouse, and all serving indexes in sync —
  and a crash between the ledger flip and the Nth index's flip
  resolves exactly-once for all of them on redelivery (each append
  is individually token-idempotent).

The registry stores only (kind, name): each index's own manifest
already knows its id/text/vec columns (a "sketch" entry likewise
knows its group/key columns — the ingested frame must carry them), so
appends need no extra configuration — registering is a one-liner, and an index can serve
many collections without copying its params anywhere.
"""

from __future__ import annotations

import json
import os

MANIFEST_NAME = "index_registry.json"

KINDS = ("text", "vector", "sketch", "cluster", "ecdf")


def _manifest_path(manifest_dir: str) -> str:
    return os.path.join(manifest_dir, MANIFEST_NAME)


def _read(manifest_dir: str) -> dict:
    try:
        with open(_manifest_path(manifest_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write(manifest_dir: str, entries: dict) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    tmp = _manifest_path(manifest_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(manifest_dir))


def register_index(
    manifest_dir: str, collection: str, kind: str, name: str
) -> None:
    """Record that *collection*'s ingests must keep the *kind* index
    *name* fresh. Idempotent (re-registering is a no-op); the index
    itself must already be built — callers validate existence (the
    Engine wrapper loads it first) so a typo fails at registration,
    not silently at every ingest."""
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}, got {kind!r}")
    entries = _read(manifest_dir)
    row = {"kind": kind, "name": str(name)}
    coll = [e for e in entries.get(collection, [])]
    if row not in coll:
        coll.append(row)
        entries[collection] = sorted(
            coll, key=lambda e: (e["kind"], e["name"])
        )
        _write(manifest_dir, entries)


def unregister_index(
    manifest_dir: str, collection: str, kind: str, name: str
) -> bool:
    """Stop auto-refreshing the index on *collection*'s ingests (the
    index itself is untouched). Returns whether it was registered."""
    entries = _read(manifest_dir)
    row = {"kind": kind, "name": str(name)}
    coll = entries.get(collection, [])
    if row not in coll:
        return False
    entries[collection] = [e for e in coll if e != row]
    if not entries[collection]:
        del entries[collection]
    _write(manifest_dir, entries)
    return True


def registered_indexes(manifest_dir: str, collection: str) -> list[dict]:
    """``[{"kind": "text"|"vector", "name": ...}]`` registered for
    *collection* — deterministic order (kind, name), so multi-index
    append sequences are reproducible across sessions."""
    return list(_read(manifest_dir).get(collection, []))
