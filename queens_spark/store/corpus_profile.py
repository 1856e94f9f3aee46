"""Persisted corpus profile: a counter histogram of the corpus's
token-length distribution, maintained O(batch) inside ingest, so every
accepted batch gets an exact drift score against the corpus AS IT WAS
before that batch — the admission-monitoring half of
operators/drift.py.

Lifecycle posture matches the other warehouse artifacts
(store/dedup_ledger.py, store/text_index.py):

- the profile is a single JSON counter file (≤ n_buckets entries —
  histogram addition is associative, so maintaining it is one
  counter-width aggregation of the batch, never a corpus re-scan),
- updates are atomic (tmp + ``os.replace``); a crashed update leaves
  the previous profile intact,
- *token* makes updates idempotent for redelivered batches: a seen
  token replays its recorded drift without re-adding the histogram
  (the streaming/corpus.py exactly-once contract). Like the index
  manifests, the token map clears on :func:`clear_applied_tokens` —
  call it only when the stream is caught up (the compact_ledger
  contract).

The reference (alebgz-91/queens) profiles per-version column min/max/
count at staging (queens/core/read_write.py metadata refresh); this
extends that posture to distribution SHAPE, scored exactly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from queens_spark.operators.drift import drift_from_counters, hist_counts

PROFILE_NAME = "corpus_profile.json"

__all__ = [
    "update_profile",
    "read_profile",
    "retire_from_profile",
    "clear_applied_tokens",
]


def _path(profiles_dir: str, name: str) -> str:
    return os.path.join(profiles_dir, name, PROFILE_NAME)


def read_profile(profiles_dir: str, name: str) -> dict:
    try:
        with open(_path(profiles_dir, name)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write(profiles_dir: str, name: str, profile: dict) -> None:
    d = os.path.join(profiles_dir, name)
    os.makedirs(d, exist_ok=True)
    tmp = _path(profiles_dir, name) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(profile, fh, sort_keys=True)
    os.replace(tmp, _path(profiles_dir, name))


def update_profile(
    df: DataFrame,
    value_col,
    profiles_dir: str,
    name: str,
    width: int = 50,
    n_buckets: int = 20,
    token: str | None = None,
    text_col: str | None = None,
) -> dict:
    """Fold *df*'s histogram into the stored profile and return the
    batch's drift stats vs the PRE-batch corpus:

    ``{"drift": int, "batch_rows": int, "corpus_rows": int}``

    drift is 0 for the first batch (nothing to compare against) and
    for an empty batch. One counter-width aggregation of the batch is
    the only Spark work; the stored histogram is bounded at
    *n_buckets* entries at any corpus size.
    """
    profile = read_profile(profiles_dir, name)
    if profile and (
        profile.get("width") != width or profile.get("n_buckets") != n_buckets
    ):
        raise ValueError(
            f"profile {name} was built with width={profile.get('width')} "
            f"n_buckets={profile.get('n_buckets')}; refusing mismatched "
            f"update (width={width}, n_buckets={n_buckets})"
        )
    applied = profile.get("applied_tokens", {})
    if token is not None and token in applied:
        return dict(applied[token])

    batch, stored, stats = _batch_stats(
        df, value_col, profile, width, n_buckets
    )
    merged = dict(stored)
    for b, n in batch.items():
        merged[b] = merged.get(b, 0) + n
    profile.update(
        {
            "hist": {str(k): v for k, v in sorted(merged.items())},
            "width": width,
            "n_buckets": n_buckets,
        }
    )
    if text_col is not None:
        # remembered so a takedown can re-derive the SAME value from
        # the doomed rows (retire_from_profile) with no caller config
        profile["text_col"] = str(text_col)
    if token is not None:
        applied[token] = stats
        profile["applied_tokens"] = applied
    _write(profiles_dir, name, profile)
    return stats


def retire_from_profile(
    df_doomed: DataFrame,
    value_col,
    profiles_dir: str,
    name: str,
) -> dict:
    """EXACT decremental takedown for the admission histogram: the
    doomed rows' counters SUBTRACT from the stored profile — histogram
    addition over exact integers is invertible, so when the doomed
    rows are exactly rows previously folded in (the
    ``Engine.retire_documents`` path reads them back from the
    warehouse's accepted batches at the profile's own geometry), the
    result equals a rebuild on the survivors. Zeroed buckets drop (a
    rebuild never writes them). One counter-width aggregation of the
    doomed rows; no token bookkeeping — a takedown is not a batch
    redelivery. Returns ``{"decremented_rows": int}``; a missing
    profile is a clean no-op."""
    profile = read_profile(profiles_dir, name)
    if not profile.get("hist"):
        return {"decremented_rows": 0}
    width = int(profile.get("width", 50))
    n_buckets = int(profile.get("n_buckets", 20))
    batch, stored, _ = _batch_stats(
        df_doomed, value_col, profile, width, n_buckets
    )
    merged = dict(stored)
    for b, n in batch.items():
        merged[b] = merged.get(b, 0) - n
    profile["hist"] = {
        str(k): v for k, v in sorted(merged.items()) if v != 0
    }
    _write(profiles_dir, name, profile)
    return {"decremented_rows": sum(batch.values())}


def _batch_stats(
    df: DataFrame, value_col, profile: dict, width: int, n_buckets: int
) -> tuple[dict, dict, dict]:
    """Shared histogram-collect + drift-stats core of update_profile
    and peek_drift: (batch_hist, stored_hist, stats)."""
    rows = hist_counts(df, value_col, width, n_buckets).collect()
    batch = {int(r["bucket"]): int(r["n"]) for r in rows}
    stored = {int(k): int(v) for k, v in profile.get("hist", {}).items()}
    stats = {
        "drift": drift_from_counters(batch, stored),
        "batch_rows": sum(batch.values()),
        "corpus_rows": sum(stored.values()),
    }
    return batch, stored, stats


def peek_drift(
    df: DataFrame,
    value_col,
    profiles_dir: str,
    name: str,
    width: int | None = None,
    n_buckets: int | None = None,
) -> dict:
    """Read-only drift of *df* vs the stored profile — the admission
    gate's probe: NO side effects (nothing folds into the profile, no
    token bookkeeping), so a rejected batch leaves every artifact
    untouched. The bucket geometry defaults to the STORED profile's
    own (width, n_buckets) so the probe can never score against an
    incompatibly-bucketed histogram; explicit values only matter when
    no profile exists yet (first batch — drift is 0 regardless)."""
    profile = read_profile(profiles_dir, name)
    width = int(width if width is not None else profile.get("width", 50))
    n_buckets = int(
        n_buckets if n_buckets is not None else profile.get("n_buckets", 20)
    )
    if profile and (
        profile.get("width") != width or profile.get("n_buckets") != n_buckets
    ):
        raise ValueError(
            f"profile {name} was built with width={profile.get('width')} "
            f"n_buckets={profile.get('n_buckets')}; refusing a probe at "
            f"(width={width}, n_buckets={n_buckets})"
        )
    _, _, stats = _batch_stats(df, value_col, profile, width, n_buckets)
    return stats


def clear_applied_tokens(
    profiles_dir: str, name: str, keep: set[str] | None = None
) -> int:
    """Drop idempotency tokens the LEDGER no longer remembers.

    The safety coupling is exact: a profile update fires only when the
    ledger screen accepts rows, and a replayed token is re-accepted
    only while the ledger's own token map still holds it. So a profile
    token whose ledger twin is gone can never replay through ingest —
    dead weight, safe to drop — while dropping one the ledger STILL
    holds would double-add its histogram on redelivery (the ledger
    replays acceptance, the profile no longer recognizes the token).
    Pass *keep* = the ledger manifest's surviving token set;
    ``Engine.maintain`` wires this after ``compact_ledger``. Returns
    the number of tokens cleared."""
    keep = keep or set()
    profile = read_profile(profiles_dir, name)
    applied = profile.get("applied_tokens", {})
    survivors = {t: s for t, s in applied.items() if t in keep}
    n = len(applied) - len(survivors)
    if n:
        profile["applied_tokens"] = survivors
        _write(profiles_dir, name, profile)
    return n
