"""Streaming corpus builder: continuous ledger-screened ingestion
with exactly-once index refresh.

A production training-data pipeline does not ingest in batches on a
cron — documents arrive continuously, and each micro-batch must be
(1) deduplicated against EVERYTHING ever accepted and (2) reflected
in the serving indexes, without dropping or double-indexing a batch
when the stream restarts. This module composes the round-9 tiers into
that shape:

    stream ──foreachBatch──▶ ledger screen ──▶ text-index append
                               (token=batch)     (token=batch)

Exactly-once comes from IDEMPOTENCY TOKENS, not distributed
transactions: Structured Streaming's checkpoint redelivers a failed
micro-batch with the SAME batch_id and content, and both sinks treat
the batch_id as a dedupe token —

- :func:`~queens_spark.store.dedup_ledger.ingest_deduped` records
  which segment each token produced; a redelivered token SKIPS the
  screen and returns the same accepted-docs frame (anchored on that
  segment), so a crash after the ledger flip cannot make the retry
  screen the batch's own docs away from the index;
- :func:`~queens_spark.store.text_index.append_text_index` records
  applied tokens; a redelivered token is a no-op, so a crash after
  the index flip cannot double-index.

Every crash point is therefore safe: before the ledger flip → full
redo; between the flips → ledger replays its recorded acceptance and
the index applies it once; after both → both no-op. (The same
contract exists on :func:`append_vector_index` for pipelines that
also maintain an ANN index from the batch.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
):
    """Start the checkpointed corpus-ingest stream: every micro-batch
    is ledger-screened (cross-run exact — or MinHash-fuzzy with
    *near_dup_threshold* — dedup) and its survivors appended to the
    named text index, both under the batch's idempotency token. The
    index must already exist (build_text_index on the first corpus
    slice); each append is O(batch) — one tokenize of the survivors,
    never a corpus pass.

    Returns the StreamingQuery; callers drive it with
    ``availableNow``-style triggers or leave it running. Restart with
    the same *checkpoint* resumes exactly-once."""
    from queens_spark.store.dedup_ledger import ingest_deduped
    from queens_spark.store.text_index import append_text_index

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        token = f"stream_{query_name}_{batch_id}"
        fresh, stats = ingest_deduped(
            batch_df, text_col, id_col, ledger_dir,
            near_dup_threshold=near_dup_threshold,
            token=token,
        )
        if stats["accepted"]:
            append_text_index(fresh, index_name, index_dir, token=token)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
