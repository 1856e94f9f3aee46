"""Streaming corpus builder: continuous ledger-screened ingestion
with exactly-once index refresh.

A production training-data pipeline does not ingest in batches on a
cron — documents arrive continuously, and each micro-batch must be
(1) deduplicated against EVERYTHING ever accepted and (2) reflected
in the serving indexes, without dropping or double-indexing a batch
when the stream restarts. This module composes the ledger and index
tiers into that shape:

    stream ──foreachBatch──▶ ledger screen ──▶ text-index append
                               (token=batch)  ─▶ vector-index append
                                                 (token=batch)

Exactly-once comes from IDEMPOTENCY TOKENS, not distributed
transactions: Structured Streaming's checkpoint redelivers a failed
micro-batch with the SAME batch_id and content, and every sink treats
the batch_id as a dedupe token —

- :func:`~queens_spark.store.dedup_ledger.ingest_deduped` records
  which segment each token produced; a redelivered token SKIPS the
  screen and returns the same accepted-docs frame (anchored on that
  segment), so a crash after the ledger flip cannot make the retry
  screen the batch's own docs away from the indexes;
- :func:`~queens_spark.store.text_index.append_text_index` and
  :func:`~queens_spark.store.vector_index.append_vector_index` record
  applied tokens; a redelivered token is a no-op on each, so a crash
  after any index flip cannot double-index that index while the
  others still apply the batch once.

Every crash point is therefore safe: before the ledger flip → full
redo; between the ledger flip and the Nth index's flip → the ledger
replays its recorded acceptance and each index applies it at most
once (already-flipped indexes no-op, the rest apply); after all
flips → everything no-ops.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def make_corpus_batch_handler(
    text_col: str,
    id_col: str,
    ledger_dir: str,
    appends: list[Callable[[DataFrame, str], None]],
    near_dup_threshold: float | None = None,
    query_name: str = "qs_corpus_ingest",
    quality_filter=None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body shared by every corpus-ingest stream:
    (optionally) quality-gate the micro-batch, ledger-screen the
    survivors under its idempotency token, then run each *appends*
    callable on ``(survivors, token)``. Append callables MUST be
    individually token-idempotent (the index append functions are) —
    that is what makes a crash between the ledger flip and the Nth
    append resolve exactly-once for ALL of them on redelivery.

    *quality_filter* is a Column or SQL-string predicate (e.g.
    ``filter_verdict(text_col) == 'keep'`` — the FineWeb cascade as a
    streaming admission gate) applied BEFORE the ledger, so rejected
    documents never consume ledger segments or index bytes. It is a
    pure function of the batch rows, so a redelivered batch filters
    to the same survivors and the token contract is unchanged."""
    from pyspark.sql import functions as F

    from queens_spark.store.dedup_ledger import ingest_deduped

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        token = f"stream_{query_name}_{batch_id}"
        if quality_filter is not None:
            batch = batch_df.where(
                F.expr(quality_filter)
                if isinstance(quality_filter, str)
                else quality_filter
            )
        else:
            batch = batch_df
        fresh, stats = ingest_deduped(
            batch, text_col, id_col, ledger_dir,
            near_dup_threshold=near_dup_threshold,
            token=token,
        )
        if stats["accepted"]:
            for append in appends:
                append(fresh, token)

    return handle


def stream_ingest_corpus(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    ledger_dir: str,
    index_dir: str,
    index_name: str,
    checkpoint: str,
    near_dup_threshold: float | None = None,
    query_name: str = "qs_corpus_ingest",
    vector_index_dir: str | None = None,
    vector_index_name: str | None = None,
    quality_filter=None,
):
    """Start the checkpointed corpus-ingest stream: every micro-batch
    is ledger-screened (cross-run exact — or MinHash-fuzzy with
    *near_dup_threshold* — dedup) and its survivors appended to the
    named text index, both under the batch's idempotency token. The
    index must already exist (build_text_index on the first corpus
    slice); each append is O(batch) — one tokenize of the survivors,
    never a corpus pass.

    With *vector_index_name* (+ *vector_index_dir*), the survivors
    ALSO append to that stored ANN index under the same token — the
    hybrid-retrieval freshness story: one screened batch lands in
    BOTH serving indexes exactly-once, so a post-restart
    ``hybrid_search`` sees every accepted doc on both the lexical and
    the vector side. The batch frame must then carry the index's
    ``vec_col`` (the stored manifest knows which); encoding uses the
    STORED codebook/quantizers — O(batch), no corpus pass, appended
    codes bit-identical to a rebuild.

    *quality_filter* (Column or SQL string) is the streaming
    ADMISSION GATE: documents failing it are dropped before the
    ledger ever sees them (compose with
    operators/text.py:filter_verdict for the FineWeb-cascade gate) —
    curation, dedup, and serving-index freshness in ONE stream.

    Returns the StreamingQuery; callers drive it with
    ``availableNow``-style triggers or leave it running. Restart with
    the same *checkpoint* resumes exactly-once."""
    from queens_spark.store.text_index import append_text_index

    if (vector_index_name is None) != (vector_index_dir is None):
        raise ValueError(
            "vector_index_name and vector_index_dir go together"
        )
    appends: list[Callable[[DataFrame, str], None]] = [
        lambda fresh, token: append_text_index(
            fresh, index_name, index_dir, token=token
        )
    ]
    if vector_index_name is not None:
        from queens_spark.store.vector_index import append_vector_index

        appends.append(
            lambda fresh, token: append_vector_index(
                fresh, vector_index_name, vector_index_dir, token=token
            )
        )
    handle = make_corpus_batch_handler(
        text_col, id_col, ledger_dir, appends,
        near_dup_threshold=near_dup_threshold,
        query_name=query_name,
        quality_filter=quality_filter,
    )
    return (
        stream_df.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
