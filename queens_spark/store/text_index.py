"""Warehouse-persisted lexical (postings) index: tokenize once on
ingest, serve every BM25 query from the stored frames.

:func:`~queens_spark.operators.corpus.bm25_topk` is a pure function —
it re-runs ``term_frequencies(df)`` (a full-corpus tokenize + wordcount
shuffle) inside every call. Right for oracle-checked catalog queries,
wrong for deployment: at 100 TB every lexical query would pay a
full-corpus pass. This module is the lexical twin of the vector side's
stored-artifact lifecycle (store/vector_index.py — same manifest
treatment, same atomic-flip crash safety, same reference analog: the
stage-once/read-snapshot pattern, queens/core/read_write.py:340-404):

- :func:`build_text_index` runs ONE tokenize pass and persists, under
  a versioned directory::

      postings/   parquet (id, token, tf, dl), disk-partitioned by
                  tok_bucket = crc32(token) % n_buckets

  The document length ``dl`` is DENORMALIZED onto every posting row,
  so serving a query needs no doc-length join: a search is one
  bucket-pruned scan of the postings (PartitionFilters on the query
  terms' buckets + a token row-group filter), a counter-width df
  aggregation over those rows only, and a TakeOrdered finish. Corpus
  stats (N docs, T total tokens, max dl) live in the manifest per
  SEGMENT and merge by sum/max at serve time — no stats pass either.
  With ``meta_cols`` document metadata denormalizes onto the postings
  too (filtered search with no documents join), and ``positions=True``
  stores each token's sorted occurrence positions (phrase + proximity
  search; tf = size(positions), so BM25 is unchanged).
- :func:`append_text_index` tokenizes ONLY the new batch and adds it
  as a new segment (O(new-data) per ingest); the manifest flips after
  the segment lands, so a crash mid-append leaves an invisible orphan.
  The caller owns doc novelty for live ids (appending an already-
  indexed doc would double-count it — same convention as the vector
  index and as double-ingesting a row); an idempotency ``token``
  makes redelivered appends no-ops (streaming/corpus.py).
- :func:`delete_from_text_index` retires documents via coverage-scoped
  tombstones with EXACT stats deltas — served scores equal a rebuild
  on the survivors, and re-appending a retired id serves the new row.
- :func:`compact_text_index` merges a long append history back into
  one segment and applies tombstones physically (stats recomputed
  from the written rows).
- :func:`load_text_index` restores the index in ANY later session from
  the manifest alone; an expected fingerprint turns a stale index into
  a rebuild signal instead of silently serving pre-re-ingest postings.

Serving: :meth:`TextIndex.bm25_topk` (OR/AND), :meth:`batch_bm25_topk`
(one scan per query table), :meth:`phrase_topk`, :meth:`proximity_topk`,
:meth:`rarest_terms` (more-like-this term selection) — every one a
bucket-pruned postings plan with no tokenize stage.

Served scores are BIT-IDENTICAL to :func:`bm25_topk` on the same
corpus: the postings hold the same integer (tf, dl) the inline path
derives, and the manifest stats are the same (N, T, maxdl), so the
exact rational-idf arithmetic — and therefore the q110/q111 DuckDB
oracles — is unchanged.

Scale shape: the bucket count bounds the served scan at
|query-term buckets|/n_buckets of the postings bytes (the lexical
analog of IVF's n_probe/n_cells pruned scan); postings within a file
are sorted by token so parquet min/max stats skip row groups inside a
bucket. crc32 is used for bucketing because Spark's ``crc32`` and
Python's ``zlib.crc32`` agree byte-for-byte, letting the driver compute
a query term's bucket without touching the cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from queens_spark.operators.corpus import BM25_SCALE

MANIFEST_NAME = "text_index_manifest.json"

#: Default token-hash bucket count: a query's scan is bounded by
#: |distinct term buckets|/n_buckets of the postings. Raise at scale
#: (more, smaller pruned units); lower for tiny corpora (fewer dirs).
N_BUCKETS = 64

#: Collect cap for batch_more_like_this's distinct candidate-term set
#: (driver-side strings feeding a bucket-pruned df scan). ~100k short
#: tokens is a few MB — far past what a MAX_BATCH_QUERIES-capped block
#: produces; beyond it the df stage falls back to a distributed join.
MAX_MLT_TERMS = 100_000


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def _read_manifest(index_dir: str) -> dict:
    try:
        with open(_manifest_path(index_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_manifest(index_dir: str, entries: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = _manifest_path(index_dir) + "__tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh, sort_keys=True)
    os.replace(tmp, _manifest_path(index_dir))


def token_bucket(token: str, n_buckets: int) -> int:
    """Driver-side twin of the stored ``tok_bucket`` column:
    crc32(utf-8 bytes) mod n_buckets — byte-identical to Spark's
    ``crc32(encode(token, 'utf-8')) % n_buckets``."""
    return zlib.crc32(token.encode("utf-8")) % n_buckets


def _postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    meta_cols: list[str] | None = None,
    positions: bool = False,
) -> DataFrame:
    """(id[, meta...], token, tf[, positions], dl, tok_bucket) — ONE
    tokenize pass. tf and dl are exactly term_frequencies' integers
    (dl = Σ tf per doc via a doc-partitioned window over the tf frame
    — no second tokenize), so served scores match the inline scorer
    bit-for-bit. *meta_cols* denormalize document metadata onto every
    posting row (like dl), so filtered searches need no documents
    join — the predicate lands on the pruned postings scan. With
    *positions*, each row also carries the token's sorted 0-based
    occurrence positions (posexplode), enabling exact phrase search;
    tf = size(positions) by construction, so scores are unchanged."""
    from pyspark.sql import Window

    from queens_spark.operators.text import tokens

    meta = list(meta_cols or [])
    if positions:
        tf = (
            df.select(
                F.col(id_col).alias("doc"),
                *[F.col(c) for c in meta],
                F.posexplode(tokens(text_col)).alias("__pos", "token"),
            )
            .groupBy("doc", "token", *meta)
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list("__pos")).alias("positions"),
            )
        )
    else:
        tf = (
            df.select(
                F.col(id_col).alias("doc"),
                *[F.col(c) for c in meta],
                F.explode(tokens(text_col)).alias("token"),
            )
            # meta is functionally dependent on doc: same groups,
            # wider key
            .groupBy("doc", "token", *meta)
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    w = Window.partitionBy("doc")
    return tf.select(
        F.col("doc").alias(id_col),
        *meta,
        "token",
        "tf",
        *(["positions"] if positions else []),
        F.sum("tf").over(w).alias("dl"),
        (F.crc32(F.encode(F.col("token"), "utf-8")) % n_buckets)
        .cast("int")
        .alias("tok_bucket"),
    )


def _seg_stats(spark: SparkSession, postings_path: str, id_col: str) -> dict:
    """Per-segment corpus stats from the WRITTEN postings (anchored on
    disk, like the ledger's accepted count): distinct docs, total
    tokens, max doc length. One counter-width aggregation, keyed on
    the EXPLICIT id column — positional (`columns[0]`) keying would
    silently aggregate over the wrong key if the write order changed."""
    p = spark.read.parquet(postings_path)
    row = (
        p.groupBy(id_col)
        .agg(F.sum("tf").alias("__dl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__dl").alias("t"),
            F.max("__dl").alias("maxdl"),
        )
        .collect()[0]
    )
    return {
        "n_docs": int(row["n"] or 0),
        "total_tokens": int(row["t"] or 0),
        "maxdl": int(row["maxdl"] or 0),
    }


class TextIndex:
    """A loaded postings index: BM25 serving over the STORED frames.

    Construct via :func:`build_text_index` / :func:`load_text_index`;
    the instance holds only the manifest entry (segment paths + their
    stats) — every search is a plan over the postings parquet, never
    the raw documents, with no tokenize stage anywhere.
    """

    def __init__(self, spark: SparkSession, name: str, entry: dict):
        self.spark = spark
        self.name = name
        self.entry = entry
        self.id_col = entry["id_col"]
        self.n_buckets = int(entry["n_buckets"])
        self.fingerprint = entry.get("fingerprint")

    # ------------------------------------------------------ artifacts

    def _tombstones_covering(self, seg_idx: int) -> DataFrame | None:
        """Deleted doc ids applying to postings segment *seg_idx* —
        coverage-scoped exactly like the vector index's
        (store/vector_index.py): each delete records how many
        segments existed when it was written and hides its ids only
        in those, so re-appending a retired doc serves the NEW
        segment's postings while the old rows stay hidden. None when
        no delete covers the segment (no join added)."""
        dels = [
            d for d in (self.entry.get("deletes") or [])
            if int(d["covers"]) > seg_idx
        ]
        if not dels:
            return None
        return self.spark.read.parquet(
            *[d["path"] for d in dels]
        ).select(self.id_col)

    def postings(self) -> DataFrame:
        """All segments unioned, minus covering tombstones. Each
        segment is its own tok_bucket-partitioned root, so segments
        read separately (multi-root partition discovery conflicts)
        and union — a bucket predicate partition-prunes inside EVERY
        segment scan, and union adds no exchange; the tombstone
        anti-join (deletes-sized right side) appears only on covered
        segments."""
        out = None
        for i, s in enumerate(self.entry["segments"]):
            df = self.spark.read.parquet(s["path"])
            t = self._tombstones_covering(i)
            if t is not None:
                df = df.join(t, self.id_col, "left_anti")
            out = df if out is None else out.unionByName(df)
        return out

    def stats(self) -> tuple[int, int, int]:
        """(N docs, T total tokens, max dl) merged across segments —
        manifest-only, no corpus or postings pass. Deletes subtract
        their EXACT per-delete (docs, tokens) deltas (computed from
        the covered postings when the tombstone was written), so N
        and T — the quantities in the BM25 score — equal a rebuild on
        the survivors bit-for-bit. maxdl stays the segment max (an
        upper bound after deletes: it only feeds the int64 envelope
        guard, where an over-estimate is conservative). Correct as
        long as the caller kept segments doc-disjoint for LIVE ids
        (the append contract)."""
        segs = self.entry["segments"]
        dels = self.entry.get("deletes") or []
        return (
            sum(int(s["n_docs"]) for s in segs)
            - sum(int(d["n_docs"]) for d in dels),
            sum(int(s["total_tokens"]) for s in segs)
            - sum(int(d["tokens"]) for d in dels),
            max(int(s["maxdl"]) for s in segs),
        )

    def describe(self) -> dict:
        n, t, maxdl = self.stats()
        return {
            "name": self.name,
            "version": int(self.entry["version"]),
            "id_col": self.id_col,
            "n_buckets": self.n_buckets,
            "segments": len(self.entry["segments"]),
            "tombstone_segments": len(self.entry.get("deletes") or []),
            "positions": bool(self.entry.get("positions")),
            "n_docs": n,
            "total_tokens": t,
            "maxdl": maxdl,
            "fingerprint": self.fingerprint,
        }

    # ------------------------------------------------------- serving

    def _filtered(self, df: DataFrame, predicate) -> DataFrame:
        """Apply a metadata *predicate* (Column or SQL string) to a
        postings scan. The index must have been built with
        ``meta_cols`` carrying the referenced columns — denormalized
        onto the postings like dl, so the predicate PUSHES DOWN into
        the pruned scan (no documents join): restrict-then-rank, the
        q109 filtered-search shape on the lexical side."""
        if predicate is None:
            return df
        if not self.entry.get("meta_cols"):
            raise ValueError(
                f"text index {self.name!r} was built without meta_cols; "
                "rebuild with meta_cols=[...] to filter searches"
            )
        return df.where(
            F.expr(predicate) if isinstance(predicate, str) else predicate
        )

    def query_postings(self, query_terms: list[str]) -> DataFrame:
        """The query terms' posting rows via a BUCKET-PRUNED scan:
        the terms' crc32 buckets (computed driver-side) become a
        partition filter, the token IN (...) predicate skips row
        groups inside the surviving buckets. The fraction of postings
        bytes read is bounded by |buckets|/n_buckets."""
        terms = sorted(set(query_terms))
        if not terms:
            raise ValueError("query_terms must be non-empty")
        buckets = sorted({token_bucket(t, self.n_buckets) for t in terms})
        return self.postings().where(
            F.col("tok_bucket").isin(buckets) & F.col("token").isin(terms)
        )

    def bm25_topk(
        self,
        query_terms: list[str],
        k: int = 10,
        scale: int = BM25_SCALE,
        predicate=None,
        require_all: bool = False,
    ) -> DataFrame:
        """Okapi BM25 top-*k* served from the stored postings —
        bit-identical to
        :func:`~queens_spark.operators.corpus.bm25_topk` on the
        indexed corpus (same integer tf/dl/df/N/T, same exact
        rational-idf arithmetic, same (score desc, doc asc)
        tie-break), with NO tokenize stage and NO corpus stats pass in
        the plan: one bucket-pruned postings scan, a counter-width df
        aggregation over query-term rows only (broadcast back), a
        per-doc sum, TakeOrdered. The int64 envelope guard runs on
        manifest stats alone. *predicate* (over ``meta_cols``)
        restricts the CANDIDATE pool scan-side; scores stay the
        documents' global BM25 (df/N/T corpus-wide — the q109
        restrict-then-rank convention: the filter narrows the pool,
        it does not redefine the score). *require_all* keeps only
        documents matching EVERY query term (conjunctive / AND
        retrieval — web-search default semantics): a post-aggregation
        filter on the matched-term count, so scores are unchanged and
        no extra pass runs."""
        n_docs, total, maxdl = self.stats()
        if n_docs == 0:
            raise ValueError(f"text index {self.name!r} is empty")
        if scale * (2 * n_docs + 1) * 44 * maxdl * total >= 2**63:
            raise ValueError(
                f"bm25 int64 envelope exceeded (N={n_docs}, T={total}, "
                f"maxdl={maxdl}, scale={scale}); lower scale or shard"
            )
        qtf = self.query_postings(query_terms).withColumnRenamed(
            self.id_col, "doc"
        )
        # df is GLOBAL (pre-filter): the predicate narrows candidates,
        # not the corpus statistics
        dfc = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
        num = f"{scale} * (2*{n_docs} - 2*df_docs + 1) * 44 * tf * {total}"
        den = (
            f"(2*df_docs + 1) * (20*tf*{total} + 6*{total} + "
            f"18*dl*{n_docs})"
        )
        scored = (
            self._filtered(qtf, predicate)
            .join(F.broadcast(dfc), "token")
            .groupBy("doc")
            .agg(
                F.expr(f"sum(({num}) div ({den}))").alias("bm25_e5"),
                F.count(F.lit(1)).alias("n_terms"),
            )
        )
        if require_all:
            scored = scored.where(
                F.col("n_terms") == len(set(query_terms))
            )
        return scored.orderBy(F.desc("bm25_e5"), F.asc("doc")).limit(k)

    def facet_counts(
        self,
        query_terms: list[str],
        facet_col: str,
        predicate=None,
        require_all: bool = False,
    ) -> DataFrame:
        """Facet histogram over the MATCHING-document pool — the
        search-UI sidebar ("results by source: src3 (41), src1
        (38)…") and the result-set composition audit: for the query
        terms, count matching documents per *facet_col* value.
        Facets count the WHOLE candidate pool, not the top-k page —
        standard facet semantics. Matching = any query term
        (*require_all* switches to conjunctive), optionally
        *predicate*-restricted like every other serving path.

        Serving shape: the SAME bucket-pruned postings scan as
        :meth:`bm25_topk` (the facet column rides the postings via
        ``meta_cols`` — no documents join), a per-(doc, facet)
        collapse of multi-term matches, then a facet-width counter
        aggregation. Zero corpus touch; output cardinality is the
        facet's value domain.
        """
        if facet_col not in (self.entry.get("meta_cols") or []):
            raise ValueError(
                f"facet column {facet_col!r} is not in this index's "
                f"meta_cols {self.entry.get('meta_cols')}; rebuild with "
                "meta_cols=[...] to facet on it"
            )
        qtf = self.query_postings(query_terms).withColumnRenamed(
            self.id_col, "doc"
        )
        cand = (
            self._filtered(qtf, predicate)
            .groupBy("doc", facet_col)
            .agg(F.count(F.lit(1)).alias("n_terms"))
        )
        if require_all:
            cand = cand.where(F.col("n_terms") == len(set(query_terms)))
        return (
            cand.groupBy(facet_col)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc(facet_col))
        )

    def vocabulary(self, top: int = 100) -> DataFrame:
        """Global top-*top* vocabulary SERVED from the postings: the
        tokenizer-training / frequency-pruning primitive of
        :func:`~queens_spark.operators.corpus.vocabulary`, with no
        tokenize pass — one counter-width aggregation over the stored
        (doc, token, tf) rows ((doc, token) is unique, so COUNT per
        token IS the document frequency), a TakeOrdered head, a rank
        window over *top* rows. Bit-identical to the inline operator
        on the indexed corpus; tombstoned docs excluded."""
        from pyspark.sql import Window

        agg = self.postings().groupBy("token").agg(
            F.sum("tf").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        head = agg.orderBy(
            F.desc("n_occurrences"), F.asc("token")
        ).limit(int(top))
        w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
        return head.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )

    def token_stats(self, top: int = 20) -> DataFrame:
        """Hot-token audit — the lexical twin of the vector side's
        :meth:`~queens_spark.store.vector_index.VectorIndex.cell_stats`:
        the *top* tokens by document frequency, with their occurrence
        mass and crc32 bucket. One counter-width aggregation over the
        stored (doc, token, tf) rows ((doc, token) is unique, so COUNT
        per token IS the df), a TakeOrdered head, a rank window over
        *top* rows — no tokenize, no corpus touch. A stop-word-heavy
        corpus shows df_docs ≈ N rows here; their buckets hold a
        disproportionate share of the postings bytes, so any query
        containing one common term scans a hot bucket — the fix is a
        ``max_df_ratio`` build (the df-capped contract, the retrain
        of the lexical side)."""
        from pyspark.sql import Window

        agg = self.postings().groupBy("token").agg(
            F.count(F.lit(1)).alias("df_docs"),
            F.sum("tf").alias("occurrences"),
            F.max(F.col("tok_bucket").cast("int")).alias("tok_bucket"),
        )
        head = agg.orderBy(F.desc("df_docs"), F.asc("token")).limit(
            int(top)
        )
        w = Window.orderBy(F.desc("df_docs"), F.asc("token"))
        return head.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )

    def bucket_stats(self) -> DataFrame:
        """(tok_bucket, n_postings, n_tokens) — the bucket-skew audit
        behind :meth:`token_stats`: a bucket holding k× the median
        postings rows makes every query touching it scan ~k× its fair
        share. One counter-width aggregation over the postings."""
        return (
            self.postings()
            .groupBy(F.col("tok_bucket").cast("int").alias("tok_bucket"))
            .agg(
                F.count(F.lit(1)).alias("n_postings"),
                F.count_distinct("token").alias("n_tokens"),
            )
        )

    def rarest_terms(self, terms: list[str], n: int) -> list[str]:
        """The *n* rarest of *terms* by document frequency (df ASC,
        token ASC ties) — the characteristic-term selection step of a
        more-like-this query: a document's rare terms identify it,
        its common ones don't. One bucket-pruned scan + a
        counter-width df aggregation over the candidate terms only;
        terms absent from the corpus rank rarest of all (df 0).
        Deterministic, so a SQL twin reproduces the selection."""
        terms = sorted(set(terms))
        if not terms:
            raise ValueError("terms must be non-empty")
        dfs = {
            r["token"]: int(r["n"])
            for r in self.query_postings(terms)
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        ranked = sorted(terms, key=lambda t: (dfs.get(t, 0), t))
        return ranked[: int(n)]

    def batch_more_like_this(
        self,
        docs_df: DataFrame,
        text_col: str,
        query_ids: list[int],
        n_terms: int = 5,
        k: int = 10,
    ) -> DataFrame:
        """More-like-this for a BLOCK of query documents — the
        hard-negative-mining / near-dup-triage shape, fully
        distributed: find each query doc's *n_terms* rarest terms and
        retrieve its top-*k* most similar documents, in ONE postings
        pass for the whole block.

        Plan: the query docs' rows read via an id-pushdown filter of
        *docs_df* (the only corpus touch — |queries| rows tokenized);
        the block's distinct candidate terms are collected (bounded —
        the block itself is capped at MAX_BATCH_QUERIES downstream)
        so their document frequencies come from the same BUCKET-PRUNED
        postings scan every other serving path uses
        (:meth:`query_postings` — never a full postings pass; a block
        whose term set exceeds the collect cap falls back to the
        distributed token-keyed join); a per-query
        window picks the df-ascending rarest terms (token ties ASC,
        deterministic); scoring runs through :meth:`batch_bm25_topk`
        (broadcast pairs, global df computed once, only query-term
        hits shuffle). Each query doc is excluded from its own
        results — fetch k+1 then drop-self, order-equivalent to
        excluding before ranking. Terms absent from the indexed
        corpus are dropped from the budget (they cannot retrieve
        anything; spending rarity slots on them starves the query).

        Returns (query_id, doc, bm25_e5, n_terms) top-k per query."""
        from pyspark.sql import Window

        from queens_spark.operators.text import tokens

        qids = [int(q) for q in query_ids]
        if not qids:
            raise ValueError("query_ids must be non-empty")
        qt = (
            docs_df.where(F.col(self.id_col).isin(qids))
            .select(
                F.col(self.id_col).alias("query_id"),
                F.explode(tokens(text_col)).alias("token"),
            )
            .distinct()
        )
        # df stage over the candidate terms: collect the block's
        # distinct terms (one tokenize of |queries| docs) and reuse
        # the bucket-pruned scan — the full-postings join is only the
        # fallback for a term set too large to collect, which the
        # MAX_BATCH_QUERIES cap downstream makes effectively unreachable
        term_rows = (
            qt.select("token").distinct()
            .limit(MAX_MLT_TERMS + 1).collect()
        )
        if not term_rows:
            raise ValueError(
                "query documents produced no tokens; check query_ids "
                "against docs_df"
            )
        if len(term_rows) <= MAX_MLT_TERMS:
            cand = self.query_postings([r["token"] for r in term_rows])
        else:
            cand = self.postings().join(
                qt.select("token").distinct(), "token"
            )
        dfs = cand.groupBy("token").agg(
            F.count(F.lit(1)).alias("__df")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("__df"), F.asc("token")
        )
        sel = (
            qt.join(dfs, "token")
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= int(n_terms))
        )
        qdf = sel.groupBy("query_id").agg(
            F.collect_list("token").alias("terms")
        )
        out = self.batch_bm25_topk(qdf, k=k + 1)
        w2 = Window.partitionBy("query_id").orderBy(
            F.desc("bm25_e5"), F.asc("doc")
        )
        return (
            out.where(F.col("doc") != F.col("query_id"))
            .withColumn("__rk", F.row_number().over(w2))
            .where(F.col("__rk") <= k)
            .select("query_id", "doc", "bm25_e5", "n_terms")
        )

    def phrase_topk(
        self,
        phrase_terms: list[str],
        k: int = 10,
        predicate=None,
    ) -> DataFrame:
        """EXACT phrase search over positional postings — the
        retrieval primitive Spark has no native operator for: find
        documents containing *phrase_terms* as CONSECUTIVE tokens and
        rank by occurrence count. Requires an index built with
        ``positions=True`` (each posting row carries the token's
        sorted 0-based positions).

        Plan shape: the phrase's distinct terms drive the same
        bucket-pruned postings scan as BM25 (|distinct terms| buckets
        of |postings| bytes); per candidate document a token→positions
        map assembles in one aggregation (map size = phrase length),
        and the occurrence count is a pure JVM higher-order-function
        fold — a start position p counts when every term i sits at
        p+i. No tokenize stage, no corpus touch, no UDF; docs missing
        any phrase term never reach the fold (an all-terms-present
        filter runs first). Duplicate terms in the phrase ("the x
        the") are handled naturally — the map lookup hits the same
        positions array at two offsets.

        Returns (doc, n_occurrences), occurrences DESC with doc ASC
        tie-break, phrase-free docs excluded."""
        terms = [str(t) for t in phrase_terms]
        if not terms:
            raise ValueError("phrase_terms must be non-empty")
        if not self.entry.get("positions"):
            raise ValueError(
                f"text index {self.name!r} was built without positional "
                "postings; rebuild with positions=True to phrase-search"
            )
        distinct = sorted(set(terms))
        cand = self._filtered(
            self.query_postings(distinct), predicate
        ).withColumnRenamed(self.id_col, "doc")
        pm = (
            cand.groupBy("doc")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("token", "positions"))
                ).alias("pm"),
                F.count(F.lit(1)).alias("__nt"),
            )
            # every distinct phrase term must appear in the doc
            .where(F.col("__nt") == len(distinct))
        )
        base = F.element_at(F.col("pm"), F.lit(terms[0]))
        offsets = list(enumerate(terms[1:], start=1))

        # single-parameter signature: pyspark derives HOF lambda arity
        # from the Python signature, so the composition must not add
        # parameters
        def _consecutive(p):
            cond = None
            for i, t in offsets:
                c = F.array_contains(
                    F.element_at(F.col("pm"), F.lit(t)), p + i
                )
                cond = c if cond is None else (cond & c)
            return cond

        starts = base if not offsets else F.filter(base, _consecutive)
        return (
            pm.select(
                "doc",
                F.size(starts).cast("bigint").alias("n_occurrences"),
            )
            .where(F.col("n_occurrences") > 0)
            .orderBy(F.desc("n_occurrences"), F.asc("doc"))
            .limit(k)
        )

    def proximity_topk(
        self,
        query_terms: list[str],
        window: int = 5,
        k: int = 10,
        predicate=None,
    ) -> DataFrame:
        """Unordered PROXIMITY search over positional postings: rank
        documents by how often ALL query terms co-occur within a
        ±*window*-token neighborhood — the relevance middle ground
        between bag-of-words BM25 (no position signal) and
        :meth:`phrase_topk` (exact adjacency). The count is the number
        of positions p of the first term such that every other term
        has an occurrence q with \\|q − p\\| ≤ window — integers end
        to end, twin-reproducible.

        Same plan family as the phrase search: bucket-pruned scan of
        the distinct terms' postings, all-terms-present filter, one
        token→positions map per candidate, a JVM exists-within-window
        fold. Docs missing any term never reach the fold."""
        terms = [str(t) for t in query_terms]
        if not terms:
            raise ValueError("query_terms must be non-empty")
        if int(window) < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if not self.entry.get("positions"):
            raise ValueError(
                f"text index {self.name!r} was built without positional "
                "postings; rebuild with positions=True"
            )
        distinct = sorted(set(terms))
        cand = self._filtered(
            self.query_postings(distinct), predicate
        ).withColumnRenamed(self.id_col, "doc")
        pm = (
            cand.groupBy("doc")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("token", "positions"))
                ).alias("pm"),
                F.count(F.lit(1)).alias("__nt"),
            )
            .where(F.col("__nt") == len(distinct))
        )
        others = [t for t in distinct if t != terms[0]]
        w = int(window)

        def _near_all(p):
            cond = None
            for t in others:
                c = F.exists(
                    F.element_at(F.col("pm"), F.lit(t)),
                    lambda q: F.abs(q - p) <= w,
                )
                cond = c if cond is None else (cond & c)
            return F.lit(True) if cond is None else cond

        base = F.element_at(F.col("pm"), F.lit(terms[0]))
        starts = F.filter(base, _near_all) if others else base
        return (
            pm.select(
                "doc",
                F.size(starts).cast("bigint").alias("n_windows"),
            )
            .where(F.col("n_windows") > 0)
            .orderBy(F.desc("n_windows"), F.asc("doc"))
            .limit(k)
        )

    def resolve_terms(
        self, query_terms: list[str], max_dist: int = 1
    ) -> dict:
        """Typo-tolerant query-term resolution against the INDEX
        vocabulary — the did-you-mean primitive: terms the index
        already serves resolve to themselves (one bucket-pruned
        probe); unknown terms resolve to their best vocabulary
        candidate within Levenshtein *max_dist* — ties (distance ASC,
        document frequency DESC, token ASC), so the choice is
        deterministic and twin-reproducible — or to None when nothing
        is close enough.

        Plan shape: the correction pass is ONE aggregation over the
        postings to (token, df) — vocabulary-scale, not corpus-scale
        — length-banded before the edit-distance compare (levenshtein
        ≥ |length difference|, so the band is lossless) and joined
        against the broadcast missing-term list. At 100 TB keep a
        vocabulary artifact (:meth:`vocabulary`) if corrections are
        hot. NOTE: Spark's levenshtein counts CHARACTERS while
        DuckDB's counts BYTES — identical on ASCII (the catalog
        corpus), divergent on multi-byte text.

        Returns {input_term: resolved_term_or_None}."""
        terms = sorted({str(t) for t in query_terms})
        if not terms:
            raise ValueError("query_terms must be non-empty")
        if int(max_dist) < 1:
            raise ValueError(f"max_dist must be >= 1, got {max_dist}")
        present = {
            r["token"]
            for r in self.query_postings(terms)
            .select("token").distinct().collect()
        }
        out = {t: (t if t in present else None) for t in terms}
        missing = [t for t in terms if t not in present]
        if not missing:
            return out
        from pyspark.sql import Window

        vocab = self.postings().groupBy("token").agg(
            F.count(F.lit(1)).alias("__df")
        )
        m = self.spark.createDataFrame([(t,) for t in missing], ["__q"])
        d = int(max_dist)
        cand = vocab.join(
            F.broadcast(m),
            (
                F.abs(F.length("token") - F.length("__q")) <= d
            ) & (F.levenshtein("__q", "token") <= d),
        )
        w = Window.partitionBy("__q").orderBy(
            F.levenshtein("__q", "token").asc(),
            F.desc("__df"),
            F.asc("token"),
        )
        for r in (
            cand.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select("__q", "token")
            .collect()
        ):
            out[r["__q"]] = r["token"]
        return out

    def corrected_bm25_topk(
        self,
        query_terms: list[str],
        k: int = 10,
        max_dist: int = 1,
        scale: int = BM25_SCALE,
        predicate=None,
        require_all: bool = False,
    ) -> DataFrame:
        """Typo-tolerant BM25: :meth:`resolve_terms` then
        :meth:`bm25_topk` over the resolved set — a misspelled query
        term retrieves what its vocabulary-nearest indexed term would
        (unresolvable terms drop from the query; an all-unresolvable
        query raises). Same output shape and exact integer scores as
        the plain scorer on the corrected query."""
        res = self.resolve_terms(query_terms, max_dist=max_dist)
        resolved = sorted({t for t in res.values() if t is not None})
        if not resolved:
            raise ValueError(
                f"no query terms resolve against the index vocabulary "
                f"within distance {max_dist}: {sorted(res)}"
            )
        return self.bm25_topk(
            resolved, k=k, scale=scale, predicate=predicate,
            require_all=require_all,
        )

    def boosted_bm25_topk(
        self,
        query_terms: list[str],
        boost_col: str,
        boosts: dict,
        k: int = 10,
        scale: int = BM25_SCALE,
        default_boost: int = 1,
        predicate=None,
    ) -> DataFrame:
        """BM25 with DOCUMENT-PRIOR boosting — the simplest
        learning-to-rank tier: multiply each document's exact integer
        BM25 by an integer weight keyed on one of its ``meta_cols``
        (source quality priors: curated wiki over raw crawl, en over
        mixed). Integer × integer keeps the ranking bit-portable.

        Because the boost column is DENORMALIZED onto the postings
        (like dl), the whole ranking serves from the same bucket-pruned
        scan as :meth:`bm25_topk` — no documents join anywhere. Values
        absent from *boosts* take *default_boost*; weights must be
        positive ints (a zero weight would silently disappear docs —
        use a predicate to exclude instead).

        Returns (doc, boosted_e5, bm25_e5, n_terms), boosted DESC with
        doc ASC ties."""
        bad = {
            v: w for v, w in boosts.items()
            if int(w) != w or int(w) < 1
        }
        if bad or int(default_boost) < 1:
            raise ValueError(
                f"boosts must be positive integers, got {bad or default_boost}"
            )
        if not self.entry.get("meta_cols") or boost_col not in (
            self.entry.get("meta_cols") or []
        ):
            raise ValueError(
                f"text index {self.name!r} does not carry {boost_col!r} "
                "in meta_cols; rebuild with meta_cols=[...]"
            )
        n_docs, total, maxdl = self.stats()
        if n_docs == 0:
            raise ValueError(f"text index {self.name!r} is empty")
        wmax = max([int(w) for w in boosts.values()] + [int(default_boost)])
        if wmax * scale * (2 * n_docs + 1) * 44 * maxdl * total >= 2**63:
            raise ValueError(
                f"boosted bm25 int64 envelope exceeded (N={n_docs}, "
                f"T={total}, maxdl={maxdl}, scale={scale}, wmax={wmax})"
            )
        qtf = self._filtered(
            self.query_postings(query_terms), predicate
        ).withColumnRenamed(self.id_col, "doc")
        dfc = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
        num = f"{scale} * (2*{n_docs} - 2*df_docs + 1) * 44 * tf * {total}"
        den = (
            f"(2*df_docs + 1) * (20*tf*{total} + 6*{total} + "
            f"18*dl*{n_docs})"
        )
        w = F.lit(int(default_boost))
        for v, wt in sorted(boosts.items()):
            w = F.when(F.col("__bc") == v, F.lit(int(wt))).otherwise(w)
        return (
            qtf.join(F.broadcast(dfc), "token")
            .groupBy("doc")
            .agg(
                F.expr(f"sum(({num}) div ({den}))").alias("bm25_e5"),
                F.count(F.lit(1)).alias("n_terms"),
                # boost_col is functionally dependent on doc
                F.first(boost_col).alias("__bc"),
            )
            .select(
                "doc",
                (F.col("bm25_e5") * w).alias("boosted_e5"),
                "bm25_e5",
                "n_terms",
            )
            .orderBy(F.desc("boosted_e5"), F.asc("doc"))
            .limit(int(k))
        )

    def snippet_topk(
        self,
        query_terms: list[str],
        k: int = 10,
        window: int = 10,
        predicate=None,
        doc_ids: list | None = None,
    ) -> DataFrame:
        """Best-window SNIPPET selection over positional postings —
        the highlight/preview primitive a search result page needs:
        for each candidate document, find the *window*-token span
        ``[start, start+window)`` containing the most query-term
        occurrences, rank documents by that hit count. Needs a
        ``positions=True`` index.

        Plan family of :meth:`phrase_topk`: one bucket-pruned scan of
        the distinct terms' postings, a per-doc sorted flatten of the
        matched positions (every position belongs to one token, so
        the flattened array is duplicate-free), and a pure JVM nested
        HOF — for each matched position p, count matched positions in
        [p, p+window) — then array_max + first-attaining position.
        No tokenize, no corpus touch, no UDF; the snippet text itself
        is a downstream id-pushdown lookup of the document (never done
        here — this ranks and locates, corpus-free).

        Returns (doc, window_start, n_hits): hit count DESC, doc ASC;
        window_start is the SMALLEST start achieving the max (both
        engines take the first index of the max, so the twin
        reproduces it). *doc_ids* restricts the candidates to a known
        page of documents (Engine.search_page attaches windows to a
        fused result page this way — the id list is page-sized by
        construction and pushes into the pruned scan)."""
        terms = sorted({str(t) for t in query_terms})
        if not terms:
            raise ValueError("query_terms must be non-empty")
        if int(window) < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if not self.entry.get("positions"):
            raise ValueError(
                f"text index {self.name!r} was built without positional "
                "postings; rebuild with positions=True"
            )
        cand = self._filtered(
            self.query_postings(terms), predicate
        )
        if doc_ids is not None:
            cand = cand.where(
                F.col(self.id_col).isin([int(i) for i in doc_ids])
            )
        cand = cand.withColumnRenamed(self.id_col, "doc")
        pm = cand.groupBy("doc").agg(
            F.sort_array(
                F.flatten(F.collect_list("positions"))
            ).alias("pos")
        )
        w = int(window)
        hits = F.transform(
            F.col("pos"),
            lambda p: F.size(
                F.filter(F.col("pos"), lambda x: (x >= p) & (x < p + w))
            ),
        )
        return (
            pm.withColumn("__h", hits)
            .select(
                "doc",
                F.element_at(
                    F.col("pos"),
                    F.array_position(
                        F.col("__h"), F.array_max(F.col("__h"))
                    ).cast("int"),
                ).cast("bigint").alias("window_start"),
                F.array_max(F.col("__h")).cast("bigint").alias("n_hits"),
            )
            .orderBy(F.desc("n_hits"), F.asc("doc"))
            .limit(int(k))
        )

    def batch_bm25_topk(
        self,
        queries_df: DataFrame,
        query_id_col: str = "query_id",
        terms_col: str = "terms",
        k: int = 10,
        scale: int = BM25_SCALE,
        predicate=None,
    ) -> DataFrame:
        """TABLE-driven BM25: score a whole query block against the
        stored postings in ONE bucket-pruned scan — the lexical twin
        of the vector side's
        :meth:`~queens_spark.store.vector_index.VectorIndex.batch_adc_topk`
        (offline eval, hard-negative mining, routing — shapes where a
        per-query plan would scan the postings |queries| times).

        *queries_df* carries (*query_id_col* bigint, *terms_col*
        array<string>); the block is collected driver-side (bounded by
        the broadcast cap) and its (query_id, token) pairs broadcast.
        The plan: one postings scan pruned to the UNION of all query
        terms' buckets, a counter-width GLOBAL df aggregation over
        those rows (df is per token — shared across queries, computed
        once), two broadcast joins, a (query_id, doc) score
        aggregation and a per-query window rank. Only matching
        postings rows shuffle — bounded by query-term hits, never the
        corpus. Scores are the same exact integers as
        :meth:`bm25_topk` per query (tested).

        Returns (query_id, doc, bm25_e5, n_terms), top-k per query
        with the (score desc, doc asc) tie-break."""
        from queens_spark.operators.similarity import MAX_BATCH_QUERIES
        from pyspark.sql import Window

        rows = queries_df.select(
            F.col(query_id_col).alias("qid"),
            F.col(terms_col).alias("terms"),
        ).limit(MAX_BATCH_QUERIES + 1).collect()
        if len(rows) > MAX_BATCH_QUERIES:
            raise ValueError(
                f"query table exceeds the broadcast cap "
                f"({MAX_BATCH_QUERIES}); shard the query table"
            )
        pairs = sorted({
            (int(r["qid"]), t) for r in rows for t in (r["terms"] or [])
        })
        if not pairs:
            raise ValueError("query table has no terms")
        n_docs, total, maxdl = self.stats()
        if n_docs == 0:
            raise ValueError(f"text index {self.name!r} is empty")
        if scale * (2 * n_docs + 1) * 44 * maxdl * total >= 2**63:
            raise ValueError(
                f"bm25 int64 envelope exceeded (N={n_docs}, T={total}, "
                f"maxdl={maxdl}, scale={scale}); lower scale or shard"
            )
        all_terms = sorted({t for _, t in pairs})
        # the hits frame feeds BOTH the global df aggregation and the
        # scoring join — persist it (bounded by query-term postings
        # rows, never the corpus) so the bucket-pruned postings scan
        # runs once, not once per consumer (the CLAUDE.md
        # multi-reference rule; guide §1.1)
        from queens_spark.operators.dedup import _persist

        qtf = _persist(
            self.query_postings(all_terms).withColumnRenamed(
                self.id_col, "doc"
            )
        )
        dfc = qtf.groupBy("token").agg(
            F.count(F.lit(1)).alias("df_docs")
        )
        qt = self.spark.createDataFrame(
            pairs, "query_id bigint, token string"
        )
        num = f"{scale} * (2*{n_docs} - 2*df_docs + 1) * 44 * tf * {total}"
        den = (
            f"(2*df_docs + 1) * (20*tf*{total} + 6*{total} + "
            f"18*dl*{n_docs})"
        )
        scored = (
            self._filtered(qtf, predicate)
            .join(F.broadcast(dfc), "token")
            .join(F.broadcast(qt), "token")
            .groupBy("query_id", "doc")
            .agg(
                F.expr(f"sum(({num}) div ({den}))").alias("bm25_e5"),
                F.count(F.lit(1)).alias("n_terms"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("bm25_e5"), F.asc("doc")
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select("query_id", "doc", "bm25_e5", "n_terms")
        )


def _write_postings_segment(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    path: str,
    meta_cols: list[str] | None = None,
    positions: bool = False,
    max_df_ratio: float | None = None,
) -> tuple[int, dict | None]:
    """One tokenize pass → bucket-partitioned, token-sorted postings.
    repartition on tok_bucket co-locates each bucket in one task
    (small file count at local scale; pass a larger shuffle-partition
    conf on a real cluster for more write parallelism), and the
    within-file token sort gives parquet min/max stats that skip row
    groups under a token IN (...) predicate.

    *max_df_ratio* is the df-capped stopword contract (the fix
    :meth:`TextIndex.token_stats` points at): tokens appearing in
    more than ``ratio × n_docs`` of THIS segment's documents are not
    written — they contribute ≈0 BM25 via the rational idf while
    their postings dominate the hot buckets. Segment stats (N, T,
    maxdl — the quantities in the BM25 score) are computed on the
    PRE-cap frame, so surviving terms score EXACTLY as they would in
    an uncapped index (their tf/dl/df rows are untouched); only
    capped-out terms stop retrieving. The cap is segment-scoped (each
    build/append batch applies it to its own slice) — deterministic
    and twin-reproducible per segment; a true stopword is frequent in
    every batch and drops everywhere.

    Returns ``(written_rows, precap_stats)`` where precap_stats is
    None for uncapped writes (callers then read stats from disk via
    :func:`_seg_stats` — anchored on the written bytes) and the
    pre-cap ``{n_docs, total_tokens, maxdl}`` dict for capped ones.
    A zero-row write leaves NOTHING on disk (an empty partitioned
    parquet dir cannot be read back), so callers must skip empty
    segments; the persist makes the probes and the write share one
    tokenize pass."""
    p = _postings(
        df, text_col, id_col, n_buckets, meta_cols, positions
    ).persist()
    try:
        stats = None
        out = p
        if max_df_ratio is not None:
            row = (
                p.groupBy(id_col)
                .agg(F.first("dl").alias("__dl"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("__dl").alias("t"),
                    F.max("__dl").alias("maxdl"),
                )
                .collect()[0]
            )
            stats = {
                "n_docs": int(row["n"] or 0),
                "total_tokens": int(row["t"] or 0),
                "maxdl": int(row["maxdl"] or 0),
            }
            cap = float(max_df_ratio) * stats["n_docs"]
            keep = (
                p.groupBy("token")
                .agg(F.count(F.lit(1)).alias("__df"))
                .where(F.col("__df") <= cap)
                .select("token")
            )
            out = p.join(F.broadcast(keep), "token").select(*p.columns)
        n = out.count()
        if n:
            (
                out.repartition("tok_bucket")
                .sortWithinPartitions("token")
                .write.mode("overwrite")
                .partitionBy("tok_bucket")
                .parquet(path)
            )
        return n, stats
    finally:
        p.unpersist()


def build_text_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    index_dir: str,
    n_buckets: int = N_BUCKETS,
    fingerprint: str | None = None,
    meta_cols: list[str] | None = None,
    positions: bool = False,
    max_df_ratio: float | None = None,
) -> TextIndex:
    """ONE corpus tokenize pass, then the manifest flip. Versioned
    directory + atomic manifest replace (the vector-index convention):
    a crash mid-build leaves the previous version live; stale version
    dirs GC on the next successful build. *max_df_ratio* builds a
    df-CAPPED index (see :func:`_write_postings_segment` for the
    exactness contract); the ratio persists in the manifest and every
    later append applies it to its own batch."""
    entries = _read_manifest(index_dir)
    version = int(entries.get(name, {}).get("version", 0)) + 1
    vdir = os.path.join(index_dir, name, f"v{version}")
    postings_path = os.path.join(vdir, "postings_seg0")
    n_written, precap = _write_postings_segment(
        df, text_col, id_col, n_buckets, postings_path,
        meta_cols=meta_cols, positions=positions,
        max_df_ratio=max_df_ratio,
    )
    if not n_written:
        raise ValueError(
            "cannot build a text index over an empty corpus "
            "(no documents, no tokens, or every token df-capped away)"
        )
    seg = {"path": postings_path}
    seg.update(
        precap
        if precap is not None
        else _seg_stats(df.sparkSession, postings_path, id_col)
    )
    entry = {
        "version": version,
        "id_col": id_col,
        "text_col": text_col,
        "n_buckets": int(n_buckets),
        "segments": [seg],
        "next_seg": 1,
        "meta_cols": list(meta_cols) if meta_cols else None,
        "positions": bool(positions),
        "max_df_ratio": max_df_ratio,
        "fingerprint": fingerprint,
    }
    entries[name] = entry
    _write_manifest(index_dir, entries)
    base = os.path.join(index_dir, name)
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{version}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return TextIndex(df.sparkSession, name, entry)


def append_text_index(
    df_new: DataFrame,
    name: str,
    index_dir: str,
    fingerprint: str | None = None,
    token: str | None = None,
) -> TextIndex:
    """O(new-data) refresh: tokenize ONLY *df_new* and add it as a new
    postings segment; manifest (segment list + per-segment stats)
    flips LAST, so a crash mid-append leaves an invisible orphan dir.
    Serving stats merge by sum/max, so searches over the grown corpus
    are bit-identical to a full rebuild on (old ∪ new) — provided the
    caller kept the batch doc-disjoint from what is indexed (the same
    id-novelty contract as append_vector_index).

    *token* makes the append IDEMPOTENT for redelivery: a token the
    manifest has already applied turns the call into a no-op — the
    exactly-once half that pairs with the ledger's token replay
    (streaming/corpus.py composes both)."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(f"no text index {name!r} in {index_dir}; build first")
    entry = dict(entries[name])
    if token is not None and str(token) in (
        entry.get("applied_tokens") or []
    ):
        return TextIndex(df_new.sparkSession, name, entry)
    vdir = os.path.join(index_dir, name, f"v{entry['version']}")
    seg_id = int(entry.get("next_seg", len(entry["segments"])))
    postings_path = os.path.join(vdir, f"postings_seg{seg_id}")
    n_written, precap = _write_postings_segment(
        df_new, entry["text_col"], entry["id_col"],
        int(entry["n_buckets"]), postings_path,
        meta_cols=entry.get("meta_cols"),
        positions=bool(entry.get("positions")),
        max_df_ratio=entry.get("max_df_ratio"),
    )
    if not n_written:
        # empty batch: no segment to add — still record the new source
        # fingerprint and the idempotency token (the append SAW this
        # batch; recording keeps pending-token accounting exact) and flip
        if token is not None:
            entry["applied_tokens"] = list(
                entry.get("applied_tokens") or []
            ) + [str(token)]
        if fingerprint is not None:
            entry["fingerprint"] = fingerprint
        if token is not None or fingerprint is not None:
            entries[name] = entry
            _write_manifest(index_dir, entries)
        return TextIndex(df_new.sparkSession, name, entry)
    seg = {"path": postings_path}
    seg.update(
        precap
        if precap is not None
        else _seg_stats(
            df_new.sparkSession, postings_path, entry["id_col"]
        )
    )
    entry["segments"] = list(entry["segments"]) + [seg]
    entry["next_seg"] = seg_id + 1
    if token is not None:
        entry["applied_tokens"] = list(
            entry.get("applied_tokens") or []
        ) + [str(token)]
    if fingerprint is not None:
        entry["fingerprint"] = fingerprint
    entries[name] = entry
    _write_manifest(index_dir, entries)
    return TextIndex(df_new.sparkSession, name, entry)


def delete_from_text_index(
    spark: SparkSession,
    index_dir: str,
    name: str,
    ids: list | DataFrame | None = None,
    predicate=None,
) -> TextIndex:
    """Tombstone documents out of the postings index — the lexical
    twin of :func:`~queens_spark.store.vector_index.delete_from_vector_index`:
    a corpus that retires documents (dedup verdicts, takedowns,
    re-ingests) must drop them from BM25 serving without a rebuild.

    The doomed ids land as a narrow tombstone segment together with
    their EXACT stats delta (how many of them are actually indexed in
    the covered segments, and their total token mass — one
    deletes-keyed probe of the postings, never a full tokenize), so
    served scores equal a rebuild on the survivors bit-for-bit
    (tested). Coverage-scoped like the vector side: re-appending a
    retired doc id serves the new segment's postings. Physical rows
    disappear at :func:`compact_text_index`, which also folds the
    stats deltas back into real segment stats. Crash safety: segment
    first, manifest flip last. *ids* is an explicit list; *predicate*
    (Column or SQL string over ``meta_cols``) deletes by metadata —
    resolved against the served postings, no corpus touch (the
    vector side's delete-by-predicate, lexical twin). *ids* may also
    be a single-column DataFrame (the takedown-artifact route,
    store/takedown.py): the doomed set then stays a frame end to end
    — a retention purge can be corpus-scale, so nothing collects it
    to the driver."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(f"no text index {name!r} in {index_dir}; build first")
    entry = dict(entries[name])
    id_col = entry["id_col"]
    idx = TextIndex(spark, name, entry)
    if (ids is None) == (predicate is None):
        raise ValueError("pass exactly one of ids= or predicate=")
    if isinstance(ids, DataFrame):
        doomed = ids.select(
            F.col(ids.columns[0]).cast("bigint").alias(id_col)
        ).distinct()
    elif ids is not None:
        if not list(ids):
            return idx
        doomed = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} bigint"
        ).distinct()
    else:
        doomed = idx._filtered(
            idx.postings(), predicate
        ).select(id_col).distinct()
    # exact delta over what is CURRENTLY served: one row per (doc)
    # suffices because dl is denormalized onto every posting row
    hit = (
        idx.postings()
        .join(doomed, id_col, "semi")
        .groupBy(id_col)
        .agg(F.first("dl").alias("__dl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__dl").alias("t"),
        )
        .collect()[0]
    )
    vdir = os.path.join(index_dir, name, f"v{entry['version']}")
    seg_id = int(entry.get("next_delete_seg", len(entry.get("deletes") or [])))
    del_path = os.path.join(vdir, f"deletes_seg{seg_id}")
    doomed.write.mode("overwrite").parquet(del_path)
    entry["deletes"] = list(entry.get("deletes") or []) + [
        {
            "path": del_path,
            "covers": len(entry["segments"]),
            "n_docs": int(hit["n"] or 0),
            "tokens": int(hit["t"] or 0),
        }
    ]
    entry["next_delete_seg"] = seg_id + 1
    entries[name] = entry
    _write_manifest(index_dir, entries)
    return TextIndex(spark, name, entry)


def compact_text_index(
    spark: SparkSession,
    index_dir: str,
    name: str,
    clear_applied_tokens: bool = False,
) -> TextIndex:
    """Merge a many-segment postings history into one segment under a
    new version dir — pure rewrite of the STORED rows (no tokenize, no
    corpus touch). Tombstoned docs are applied PHYSICALLY (the reader
    below already excludes them) and the stats recompute from the
    WRITTEN rows, so the post-compact manifest is exact with no
    deltas; every search is unchanged. Manifest flips after the
    write; superseded versions GC after the flip.

    *clear_applied_tokens* drops the idempotency-token list (it grows
    one entry per streaming micro-batch forever otherwise — unbounded
    manifest I/O for long-lived streams). ONLY safe in tandem with —
    strictly AFTER — :func:`~queens_spark.store.dedup_ledger.compact_ledger`
    cleared the ledger's token map: a redelivered token then
    re-screens at the ledger to accepted=0 and the index append never
    fires; clearing while the ledger still replays the token would
    double-index the batch. ``Engine.maintain`` sequences both."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(f"no text index {name!r} in {index_dir}; build first")
    entry = dict(entries[name])
    segs = entry["segments"]
    if len(segs) <= 1 and not entry.get("deletes"):
        if clear_applied_tokens and entry.get("applied_tokens"):
            entry.pop("applied_tokens", None)
            entries[name] = entry
            _write_manifest(index_dir, entries)
        return TextIndex(spark, name, entry)
    version = int(entry["version"]) + 1
    vdir = os.path.join(index_dir, name, f"v{version}")
    postings_path = os.path.join(vdir, "postings_seg0")
    idx = TextIndex(spark, name, entry)
    live = idx.postings().persist()
    try:
        if live.count() == 0:
            # everything tombstoned: an empty partitioned dir cannot
            # be read back — refuse rather than flip to a broken state
            raise ValueError(
                f"compacting text index {name!r} would empty it "
                "(every document is deleted); rebuild instead"
            )
        (
            live
            # tok_bucket reads back as a STRING partition column
            # (type-inference off session-wide); restore the written
            # int layout, re-sorted for row-group stats
            .withColumn("tok_bucket", F.col("tok_bucket").cast("int"))
            .repartition("tok_bucket")
            .sortWithinPartitions("token")
            .write.mode("overwrite")
            .partitionBy("tok_bucket")
            .parquet(postings_path)
        )
    finally:
        live.unpersist()
    # stats from the WRITTEN rows: after tombstones are applied
    # physically the deltas fold away and maxdl tightens back to the
    # true survivor maximum. A df-CAPPED index keeps the manifest-
    # folded stats instead: its N/T deliberately count docs whose
    # postings were capped away, and the written rows cannot recover
    # that (the exactness contract of _write_postings_segment)
    merged = {"path": postings_path}
    if entry.get("max_df_ratio") is not None:
        n, t, maxdl = idx.stats()
        merged.update(
            {"n_docs": n, "total_tokens": t, "maxdl": maxdl}
        )
    else:
        merged.update(_seg_stats(spark, postings_path, entry["id_col"]))
    entry["segments"] = [merged]
    entry["deletes"] = None
    entry["version"] = version
    entry["next_seg"] = 1
    entry["next_delete_seg"] = 0
    if clear_applied_tokens:
        entry.pop("applied_tokens", None)
    entries[name] = entry
    _write_manifest(index_dir, entries)
    base = os.path.join(index_dir, name)
    for d in os.listdir(base):
        if d.startswith("v") and d != f"v{version}":
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return TextIndex(spark, name, entry)


def load_text_index(
    spark: SparkSession,
    index_dir: str,
    name: str,
    expected_fingerprint: str | None = None,
) -> TextIndex:
    """Restore a built index from the manifest — no corpus touch, no
    tokenize stage in any subsequent search plan. KeyError if never
    built; ValueError if *expected_fingerprint* says the source moved
    since the build (serve-stale would silently drop re-ingested docs
    from every lexical query)."""
    entries = _read_manifest(index_dir)
    if name not in entries:
        raise KeyError(
            f"no text index {name!r} in {index_dir}; built: {sorted(entries)}"
        )
    entry = entries[name]
    if (
        expected_fingerprint is not None
        and entry.get("fingerprint") != expected_fingerprint
    ):
        raise ValueError(
            f"text index {name!r} is stale (source fingerprint changed "
            "since build); rebuild with build_text_index"
        )
    return TextIndex(spark, name, entry)


def build_or_load_text_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    index_dir: str,
    fingerprint: str | None = None,
    spark: SparkSession | None = None,
    **build_kwargs,
) -> TextIndex:
    """The ingest-hook composition: serve the stored postings when the
    fingerprint still matches the source, rebuild otherwise — first
    run pays the tokenize, every later session gets pure index
    reads. Requesting ``meta_cols`` the stored index lacks also
    rebuilds (an index without the columns cannot serve filtered
    searches); omitting them means "whatever is stored is fine".
    *df* may be a zero-arg callable returning the source frame (pass
    *spark* alongside): the warm-serve path then skips constructing
    the corpus plan entirely."""
    if callable(df) and spark is None:
        df = df()
    if not callable(df):
        spark = df.sparkSession
    try:
        idx = load_text_index(
            spark, index_dir, name,
            expected_fingerprint=fingerprint,
        )
        want_meta = build_kwargs.get("meta_cols")
        if want_meta is not None and not set(want_meta) <= set(
            idx.entry.get("meta_cols") or []
        ):
            raise ValueError("stored index lacks the requested meta_cols")
        if build_kwargs.get("positions") and not idx.entry.get(
            "positions"
        ):
            raise ValueError("stored index lacks positional postings")
        if "max_df_ratio" in build_kwargs and build_kwargs[
            "max_df_ratio"
        ] != idx.entry.get("max_df_ratio"):
            raise ValueError("stored index has a different df cap")
        return idx
    except (KeyError, ValueError):
        return build_text_index(
            df() if callable(df) else df, text_col, id_col, name,
            index_dir, fingerprint=fingerprint, **build_kwargs,
        )
