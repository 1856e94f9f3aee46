"""Training-run assembly: pack documents into fixed-length token
sequences, assign sequences to balanced shards, and order runs with a
deterministic portable shuffle.

This is the export half of an LLM data pipeline: after screening
(dedup ledger), filtering (filter cascade) and tokenization, a
training run is the corpus re-cut into fixed ``seq_len`` windows —
documents concatenated back-to-back within a stratum, a document
spanning a window boundary continuing into the next sequence (the
GPT-style pretraining pack), every sequence except the stratum's last
exactly full. Sequences round-robin onto shards so shard sizes differ
by at most one sequence.

Scale design (the part that must survive 100 TB):

- the only per-token data movement is the one groupBy-sequence shuffle
  that physically assembles output rows — the same volume the
  training file itself has. Everything else (offsets, spans, stats)
  moves counter-width rows.
- prefix sums are TWO-PHASE (see store/warehouse.with_row_uid): a
  cumulative window partitioned by stratum would serialize each
  stratum through one task — fatal when a stratum is "all of English".
  Instead: range-partition on (stratum, order), local cumsum per
  (physical partition, stratum) chunk, broadcast chunk offsets.
- a document explodes only to the sequences it SPANS (≤ n_tokens/L +
  1 rows, arrays sliced JVM-side) — never one row per token.

The reference (alebgz-91/queens) has no training-export tier; this
extends the engine toward the LLM-pipeline north star alongside
operators/dedup.py and operators/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from queens_spark.operators.text import (
    HASH_MOD,
    char_poly_hash,
    duckdb_char_poly_hash,
    tokens,
)

__all__ = [
    "stream_offsets",
    "sequence_spans",
    "sequence_stats",
    "pack_sequences",
    "assign_shards",
    "shard_stats",
    "training_order",
    "duckdb_sequence_stats_ctes",
]


# ------------------------------------------------- two-phase offsets

def stream_offsets(
    df: DataFrame,
    n_col: str,
    stratum_col: str,
    order_col: str,
) -> DataFrame:
    """Exclusive prefix sum of *n_col* within each stratum, following
    the total order of *order_col* — each row's ``start`` is the
    token offset where that document begins in its stratum's
    concatenated stream.

    Two-phase (the with_row_uid shape, generalized from counting to
    summing): range-partition on (stratum, order) so each physical
    partition holds a contiguous slice of the sort order; local
    cumsum per (partition, stratum) chunk; broadcast-join the chunk
    subtotal prefix. Parallelism is the number of chunks, never the
    number of strata.
    """
    sort_exprs = [F.col(stratum_col).asc(), F.col(order_col).asc()]
    ranged = df.repartitionByRange(*sort_exprs)
    part = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", stratum_col).orderBy(
        F.col(order_col).asc()
    )
    local = part.withColumn(
        "__cum",
        F.sum(n_col)
        .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    subtotals = local.groupBy("__pid", stratum_col).agg(
        F.sum(n_col).cast("bigint").alias("__tot")
    )
    w_off = (
        Window.partitionBy(stratum_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subtotals.select(
        "__pid",
        stratum_col,
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), ["__pid", stratum_col])
        .withColumn(
            "start", (F.col("__off") + F.col("__cum") - F.col(n_col)).cast("bigint")
        )
        .drop("__pid", "__cum", "__off")
    )


# ----------------------------------------------------- span explode

def sequence_spans(
    offsets: DataFrame,
    seq_len: int,
    n_col: str = "n_tokens",
) -> DataFrame:
    """Explode each document onto the sequences it spans. Input needs
    ``start`` (from :func:`stream_offsets`) and *n_col*; empty
    documents (n=0) occupy no tokens and are dropped.

    Output adds, per (document, sequence) span:

    - ``seq_id``      — floor(global_pos / seq_len), per stratum
    - ``span_off``    — 0-based offset of the span inside the document
    - ``span_pos``    — 0-based offset of the span inside the sequence
    - ``span_len``    — tokens this document contributes to this seq
    - ``starts_here`` — 1 if the document's first token is in this seq
    """
    L = F.lit(int(seq_len)).cast("bigint")
    nz = offsets.filter(F.col(n_col) > 0)
    first = F.expr(f"start div {int(seq_len)}")
    last = F.expr(f"(start + {n_col} - 1) div {int(seq_len)}")
    spans = nz.withColumn("seq_id", F.explode(F.sequence(first, last)))
    g0 = F.greatest(F.col("start"), F.col("seq_id") * L)
    g1 = F.least(F.col("start") + F.col(n_col), (F.col("seq_id") + F.lit(1)) * L)
    return (
        spans.withColumn("span_off", (g0 - F.col("start")).cast("bigint"))
        .withColumn("span_pos", (g0 - F.col("seq_id") * L).cast("bigint"))
        .withColumn("span_len", (g1 - g0).cast("bigint"))
        .withColumn(
            "starts_here",
            (F.col("start") >= F.col("seq_id") * L).cast("int"),
        )
    )


def sequence_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int,
    stratum_col: str,
) -> DataFrame:
    """Per-sequence composition WITHOUT materializing token arrays —
    the audit view of a pack (how many documents per window, how full
    the windows run, where boundaries land). Counter-width output:
    one row per sequence."""
    base = df.select(
        F.col(id_col),
        F.col(stratum_col),
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    offs = stream_offsets(base, "n_tokens", stratum_col, id_col)
    spans = sequence_spans(offs, seq_len)
    return spans.groupBy(stratum_col, "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("starts_here").cast("bigint").alias("n_starts"),
        F.sum("span_len").cast("bigint").alias("seq_tokens"),
    )


def duckdb_sequence_stats_ctes(
    seq_len: int,
    toks_expr: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB CTE chain mirroring stream_offsets → sequence_spans
    (used by the q162/q163 oracles): exposes ``spans(stratum, seq_id,
    doc_id, start, n_tokens, span_len, starts_here)``."""
    L = int(seq_len)
    return f"""
    toks AS (
      SELECT {id_col}, {stratum_col},
             CAST(len({toks_expr}) AS BIGINT) AS n_tokens
      FROM {table}
    ), offs AS (
      SELECT {id_col}, {stratum_col}, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY {stratum_col}
                                      ORDER BY {id_col}
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start
      FROM toks WHERE n_tokens > 0
    ), spans AS (
      SELECT {stratum_col}, {id_col}, start, n_tokens,
             unnest(range(start // {L}, (start + n_tokens - 1) // {L} + 1))
               AS seq_id
      FROM offs
    ), sized AS (
      SELECT {stratum_col}, {id_col}, seq_id, start, n_tokens,
             LEAST(start + n_tokens, (seq_id + 1) * {L})
               - GREATEST(start, seq_id * {L}) AS span_len,
             CASE WHEN start >= seq_id * {L} THEN 1 ELSE 0 END AS starts_here
      FROM spans
    )"""


# -------------------------------------------------- physical assembly

def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int,
    stratum_col: str,
    tokens_col: Column | None = None,
) -> DataFrame:
    """Physically assemble packed training sequences: one output row
    per sequence with the concatenated token window and the document
    spans that compose it (the attention-reset boundaries a trainer
    needs).

    Output: (stratum, seq_id, toks array<string> — length seq_len
    except each stratum's final sequence — and doc_spans
    array<struct<id, pos, len>> sorted by in-sequence position).

    Pass *tokens_col* to pack a custom tokenization (e.g. the BPE
    encoder from operators/corpus.py); default is whitespace tokens.
    The per-token shuffle here is the output volume itself — the one
    unavoidable data movement of a pack — and arrays move as slices,
    never as per-token rows.
    """
    tok = tokens_col if tokens_col is not None else tokens(text_col)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(stratum_col).alias("__stratum"),
        tok.alias("__toks"),
    ).withColumn("n_tokens", F.size("__toks").cast("bigint"))
    offs = stream_offsets(base, "n_tokens", "__stratum", "__id")
    spans = sequence_spans(offs, seq_len)
    sliced = spans.select(
        "__stratum",
        "seq_id",
        "span_pos",
        F.slice(
            F.col("__toks"), (F.col("span_off") + 1).cast("int"), F.col("span_len").cast("int")
        ).alias("piece"),
        F.struct(
            F.col("span_pos").alias("pos"),
            F.col("__id").alias("id"),
            F.col("span_len").alias("len"),
        ).alias("span"),
    )
    assembled = sliced.groupBy("__stratum", "seq_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("span_pos"), F.col("piece")))
        ).alias("__pieces"),
        F.array_sort(F.collect_list("span")).alias("doc_spans"),
    )
    return assembled.select(
        F.col("__stratum").alias(stratum_col),
        "seq_id",
        F.flatten("__pieces.piece").alias("toks"),
        "doc_spans",
    )


# ------------------------------------------------------------ shards

def assign_shards(seqs: DataFrame, n_shards: int) -> DataFrame:
    """Round-robin sequences onto shards within each stratum:
    ``shard = seq_id % n_shards``. Deterministic, join-free, and
    balanced by construction — per stratum, shard sizes differ by at
    most one sequence, so no shard becomes the straggler that gates a
    training epoch."""
    return seqs.withColumn(
        "shard", (F.col("seq_id") % F.lit(int(n_shards))).cast("int")
    )


def shard_stats(sharded: DataFrame, stratum_col: str) -> DataFrame:
    """Per-shard manifest rollup (counter-width)."""
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
        F.sum("seq_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct(stratum_col).cast("bigint").alias("n_strata"),
    )


# -------------------------------------------------- deterministic order

def order_hash_col(key: Column, seed: str) -> Column:
    """Portable epoch-permutation key: the polynomial hash of
    ``seed || ':' || key``."""
    return char_poly_hash(
        F.concat(F.lit(str(seed)), F.lit(":"), key.cast("string")), HASH_MOD
    )


def training_order(
    df: DataFrame, id_col: str, seed: str, out_col: str = "order_hash"
) -> DataFrame:
    """Deterministic global shuffle for training: order by the
    portable polynomial hash of ``seed || ':' || id``. Re-running
    with the same seed reproduces the epoch order bit-for-bit on any
    engine; changing the seed is a fresh permutation. Ordering by a
    hash column is a sort, not a shuffle-by-key — no skew, and ties
    (hash collisions) break on the id itself."""
    return df.withColumn(out_col, order_hash_col(F.col(id_col), seed))


def duckdb_training_order(seed: str, id_expr: str) -> str:
    """DuckDB twin of :func:`training_order`'s hash expression."""
    return duckdb_char_poly_hash(f"('{seed}' || ':' || CAST({id_expr} AS VARCHAR))", HASH_MOD)
