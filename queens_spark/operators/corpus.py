"""Corpus-level statistics operators: term/document frequencies,
TF-IDF keyword extraction, vocabulary building.

These are the two-pass corpus operators every training-data pipeline
needs (unlike operators/text.py, whose metrics are per-document and
zero-shuffle, these genuinely require corpus-wide aggregation):

- **term_frequencies**: the wordcount shuffle — explode tokens,
  hash-aggregate on (doc, token). Map-side partial aggregation
  collapses each document's repeats before the shuffle, so shuffle
  width is distinct-(doc,token) pairs, not corpus tokens.
- **document_frequencies**: one more counter-width aggregation over
  the tf frame ((doc, token) is unique there, so COUNT(*) per token
  IS the document frequency — no countDistinct pass).
- **tfidf_topk**: rank terms per document by tf/df. The score is the
  scaled-integer ``tf * 1_000_000 div df`` — integer division is
  bit-identical across engines, unlike ln()-based idf whose last-ulp
  rounding differs (the same portability rule queries.py applies to
  money aggregates). Ranking by tf/df is order-equivalent to the
  classic tf·log(N/df) for a fixed corpus whenever df ties break the
  same way, and ties break deterministically on the token.
- **vocabulary**: global top-k tokens. The global sort runs on the
  AGGREGATED vocabulary (distinct tokens, not corpus tokens) and
  LIMIT pushes it down to TakeOrderedAndProject — no single-task
  full sort of the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from queens_spark.operators.text import tokens

#: Fixed-point scale for the tf/df keyword score.
TFIDF_SCALE = 1_000_000


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, token, tf) — the wordcount aggregation."""
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("token"))
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(token, df_docs) from a term-frequency frame. (doc, token) is
    unique after the tf groupBy, so a plain COUNT per token is the
    document frequency — no expensive distinct aggregation."""
    return tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))


def tfidf_topk(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by the scaled-integer
    tf/df score; deterministic (score DESC, token) tie-break.

    Scale shape: tf shuffle on (doc, token); df is a counter-width
    aggregate joined back on the token key (a shuffled join — the
    vocabulary of a 100 TB corpus is too big to broadcast, and AQE
    will broadcast it automatically when it isn't); the final window
    partitions by document, whose group size is bounded by document
    vocabulary, never corpus size.
    """
    tf = term_frequencies(df, text_col, id_col)
    scored = (
        tf.join(document_frequencies(tf), "token")
        .withColumn("score_e6", F.expr(f"tf * {TFIDF_SCALE} div df_docs"))
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("score_e6").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("doc"), "token", "tf", "df_docs", "score_e6",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def vocabulary(df: DataFrame, text_col: str, id_col: str, top: int = 100) -> DataFrame:
    """Global top-*top* vocabulary: (token, n_occurrences, n_docs,
    rank) ordered by total occurrences, token-tie-broken.

    n_docs reuses the tf frame's (doc, token) uniqueness — the whole
    operator is two counter-width aggregations plus a TakeOrdered of
    the top rows; the corpus itself never sorts.
    """
    tf = term_frequencies(df, text_col, id_col)
    agg = tf.groupBy("token").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    head = agg.orderBy(F.col("n_occurrences").desc(), F.col("token")).limit(top)
    # rank the (tiny) head frame; the window runs over `top` rows only
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return head.withColumn("rank", F.row_number().over(w).cast("bigint"))


def _bigram_positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, w1, w2) — one row per bigram POSITION. The single corpus
    tokenize/explode pass every bigram operator derives from."""
    from queens_spark.operators.text import word_ngrams

    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(word_ngrams(text_col, 2)).alias("bg"),
        )
        .select(
            "doc",
            F.split(F.col("bg"), " ")[0].alias("w1"),
            F.split(F.col("bg"), " ")[1].alias("w2"),
        )
    )


def _lm_from_positions(pos: DataFrame) -> DataFrame:
    c2 = pos.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return c2.join(c1, "w1").select(
        "w1", "w2", "c2", "c1",
        F.expr("c2 * 1000000 div c1").alias("p_e6"),
    )


def bigram_lm(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Maximum-likelihood bigram model: (w1, w2, c2, c1, p_e6) with
    p_e6 = ⌊c2·1e6 / c1⌋ — the conditional probability P(w2|w1) in
    exact fixed point (integer division is bit-portable where a float
    ratio's last ulp is not). One explode + two counter-width
    aggregations (map-side combined — the shuffle carries distinct
    bigrams, not corpus positions) and a w1-key join."""
    return _lm_from_positions(_bigram_positions(df, text_col, id_col))


def lm_doc_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document fluency proxy under the corpus's own bigram LM:
    (doc, n_bigrams, avg_p_e6) where avg_p_e6 = ⌊Σ p_e6 / n⌋ over the
    document's bigram positions. Templated/repetitive text scores
    high, random word salad scores low — a deterministic stand-in for
    perplexity filtering (log-probabilities are not bit-portable;
    the mean conditional probability is, and ranks similarly for
    screening). Docs with < 2 tokens are absent (no bigram evidence).

    Scale: one persisted (doc, w1, w2) positions projection feeds
    both LM training and scoring; the LM table shuffles on (w1, w2)
    once at train time; the scoring join is a hash join on the same
    key (AQE broadcasts small LMs), then a per-doc counter
    aggregation."""
    from queens_spark.operators.dedup import _persist

    # ONE persisted positions projection feeds both the LM training
    # aggregation and the scoring join — the corpus tokenize/explode
    # (the dominant cost) runs once, not twice
    pos = _persist(_bigram_positions(df, text_col, id_col))
    lm = _lm_from_positions(pos).select("w1", "w2", "p_e6")
    return (
        pos.join(lm, ["w1", "w2"])
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(p_e6) div count(1)").alias("avg_p_e6"),
        )
    )


#: Fixed-point scale for BM25 scores (1e5: headroom for the int64
#: envelope below at the same time as 5 decimal digits of score).
BM25_SCALE = 100_000


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    scale: int = BM25_SCALE,
) -> DataFrame:
    """Okapi BM25 top-*k* lexical retrieval (k1=1.2, b=0.75) in EXACT
    integer arithmetic — the keyword side of a production RAG /
    curation retrieval stack, bit-identical across engines.

    With k1=6/5 and b=3/4 every BM25 quantity is rational; over
    integers tf, df, dl (doc length), N (docs) and T (total tokens,
    so avgdl = T/N exactly) the per-term score is

        scale * (2N-2df+1) * 44*tf*T
        ------------------------------------------  (floored)
        (2df+1) * (20*tf*T + 6*T + 18*dl*N)

    where (2N-2df+1)/(2df+1) is the RATIONAL idf (N-df+0.5)/(df+0.5)
    — kept unlogged because ln() is not bit-portable (the same rule
    as tfidf_topk); it is monotone in df so rare terms still dominate
    — and 44·tf·T/(20·tf·T+6·T+18·dl·N) is tf·(k1+1)/(tf +
    k1·(1-b+b·dl/avgdl)) over the common denominator 20T. Per-term
    floors sum per document (commutative: order-independent at any
    parallelism).

    Scale shape: ONE wordcount shuffle (term_frequencies); doc
    lengths derive from the tf frame (exchange reuse, no second
    tokenize pass); the df aggregation runs on the query-term subset
    only (counter-width, broadcast back); docs without any query term
    never leave the map side. TakeOrdered finishes — the corpus never
    sorts. A guard raises BEFORE any join if the int64 envelope
    scale·(2N+1)·44·maxdl·T ≥ 2^63 would overflow (rescale down, or
    shard the corpus and merge per-shard top-k)."""
    from queens_spark.operators.dedup import _persist

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tf = _persist(term_frequencies(df, text_col, id_col))
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("t"),
        F.max("dl").alias("maxdl"),
    ).collect()[0]
    n_docs, total, maxdl = int(stats["n"]), int(stats["t"]), int(stats["maxdl"])
    if scale * (2 * n_docs + 1) * 44 * maxdl * total >= 2**63:
        raise ValueError(
            f"bm25 int64 envelope exceeded (N={n_docs}, T={total}, "
            f"maxdl={maxdl}, scale={scale}); lower scale or shard"
        )
    qtf = tf.where(F.col("token").isin(terms))
    dfc = qtf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    num = f"{scale} * (2*{n_docs} - 2*df_docs + 1) * 44 * tf * {total}"
    den = f"(2*df_docs + 1) * (20*tf*{total} + 6*{total} + 18*dl*{n_docs})"
    return (
        qtf.join(F.broadcast(dfc), "token")
        .join(dl, "doc")
        .groupBy("doc")
        .agg(
            F.expr(f"sum(({num}) div ({den}))").alias("bm25_e5"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.desc("bm25_e5"), F.asc("doc"))
        .limit(k)
    )


# ----------------------------------------------------- BPE training

#: learn_bpe refuses to collect a vocabulary larger than this: the
#: driver-side merge loop is justified ONLY because the (word, count)
#: vocabulary is bounded (Heaps' law: ~millions of types for a 100 TB
#: corpus — dimension-table sized), never corpus-sized.
MAX_BPE_VOCAB = 5_000_000


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(w, c) corpus word counts — the one corpus-scale pass BPE
    training needs; everything after operates on the vocabulary."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str, top: int = 50) -> DataFrame:
    """Adjacent character-pair counts weighted by word frequency —
    BPE training's FIRST merge-selection step (later steps operate on
    merged symbols, which is inherently iterative: see
    :func:`learn_bpe`), and the SQL-expressible one the correctness
    gate checks. Returns the *top* pairs as (left_sym, right_sym,
    pair_count), ties broken lexicographically.

    Scale shape: one wordcount shuffle (map-side combine collapses
    repeats), then pairs explode from the VOCABULARY (distinct words),
    not the corpus — a second counter-width aggregation over at most
    (avg word length × vocab) rows, finished by TakeOrdered. The
    corpus is read once and never re-shuffled.
    """
    from queens_spark.operators.text import let_bound

    words = word_frequencies(df, text_col).where(F.length("w") >= 2)
    pairs = words.select(
        "c",
        F.explode(
            let_bound(
                F.split("w", ""),
                lambda ch: F.transform(
                    F.sequence(F.lit(1), F.size(ch) - 1),
                    lambda i: F.struct(
                        F.element_at(ch, i).alias("l"),
                        F.element_at(ch, i + 1).alias("r"),
                    ),
                ),
            )
        ).alias("u"),
    )
    return (
        pairs.groupBy(
            F.col("u.l").alias("left_sym"), F.col("u.r").alias("right_sym")
        )
        .agg(F.sum("c").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(top)
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    max_vocab: int = MAX_BPE_VOCAB,
) -> list[tuple[str, str]]:
    """Learn *n_merges* BPE merges from the corpus — the
    HuggingFace-trainer shape: ONE distributed wordcount pass, then
    the merge loop runs driver-side over the collected (word, count)
    VOCABULARY (bounded by Heaps' law; guarded by *max_vocab* — this
    is the one deliberate driver-side loop in the corpus tier, and it
    is vocabulary-scale, never corpus-scale).

    Merge selection per step: highest total pair count, ties broken
    on the lexicographically smallest (left, right) — deterministic,
    so re-training the same corpus yields identical merges. Stops
    early when the best pair's count drops below *min_count*.
    """
    wf = word_frequencies(df, text_col)
    n_types = wf.count()
    if n_types > max_vocab:
        raise ValueError(
            f"vocabulary has {n_types} types > max_vocab={max_vocab}; "
            "learn_bpe's driver loop is vocabulary-bounded by contract"
        )
    vocab: dict[tuple[str, ...], int] = {}
    for r in wf.collect():
        if len(r["w"]) >= 2:
            vocab[tuple(r["w"])] = vocab.get(tuple(r["w"]), 0) + int(r["c"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (la, rb), _cnt = best
        merged = la + rb
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        vocab = nxt
        merges.append((la, rb))
    return merges


def bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with learned merges, lowest rank first — the
    canonical GPT-2 apply loop. Pure Python: shared by the encode UDF
    and the tests' reference segmentation."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_i, best_rank = i, rk
        if best_rank is None:
            break
        # merge EVERY occurrence of that pair (left-to-right), the
        # same replacement order learn_bpe's training loop applies
        la, rb = syms[best_i], syms[best_i + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                out.append(la + rb)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize *text_col* with learned BPE merges → array<string>
    column *out_col*. Iterative per-word merging is genuinely
    inexpressible in Spark's built-in functions (each merge step
    rewrites the symbol sequence the next step scans), so this is the
    sanctioned slow path: ONE Arrow-batched pandas UDF, with the
    merge table broadcast in the closure and a per-batch word cache
    (word-salad corpora re-segment each type once per batch, not once
    per occurrence). Zero shuffle; scales embarrassingly with corpus
    partitions.
    """
    # module-level pandas import: the UDF's 'pd.Series' type hints are
    # strings under `from __future__ import annotations`, and pyspark
    # resolves them against the function's MODULE globals
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def enc(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(text: str | None) -> list[str]:
            out: list[str] = []
            for w in (text or "").split():
                seg = cache.get(w)
                if seg is None:
                    seg = bpe_word(w, ranks)
                    cache[w] = seg
                out.extend(seg)
            return out

        return s.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))


def lm_quality_buckets(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document under
    the corpus's own bigram LM (:func:`lm_doc_scores` — exact
    fixed-point mean conditional probability, the bit-portable
    perplexity stand-in), then split the corpus into head / middle /
    tail QUALITY buckets at one-third and two-thirds of cumulative
    bigram mass, most-fluent first. All docs sharing a score value
    land in the same bucket (boundaries are score-value thresholds),
    so assignment is deterministic and join-reproducible.

    Scale shape — the part that survives 100×: a naive cumulative sum
    needs a GLOBAL-order window over the corpus (one task). Instead
    the running mass is computed over the (score → mass) aggregation,
    whose cardinality is bounded by the score's fixed-point domain
    (≤ 1e6+1 distinct values REGARDLESS of corpus size); the bounded
    bucket map then joins back on the score value (AQE broadcasts
    it). The corpus itself never sorts.
    """
    from queens_spark.operators.dedup import _persist

    # persist barrier: the scores frame feeds BOTH the mass
    # aggregation and the final bucket join — without it the whole
    # LM-score pipeline (tokenize + LM join) runs once per branch
    scores = _persist(lm_doc_scores(df, text_col, id_col))
    mass = scores.groupBy("avg_p_e6").agg(
        F.sum("n_bigrams").alias("mass")
    )
    w_cum = Window.orderBy(F.desc("avg_p_e6")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    buckets = (
        mass.withColumn("cum", F.sum("mass").over(w_cum))
        .withColumn("t", F.sum("mass").over(w_all))
        .select(
            "avg_p_e6",
            F.when(F.col("cum") * 3 <= F.col("t"), F.lit("head"))
            .when(F.col("cum") * 3 <= 2 * F.col("t"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
    return scores.join(buckets, "avg_p_e6").select(
        "doc", "n_bigrams", "avg_p_e6", "bucket"
    )


#: Fixed-point scale for hashed-feature probabilities.
ALIGN_SCALE = 1_000_000_000


def hashed_alignment_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_predicate,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-inspired data selection: score every document by how much
    better its hashed unigram features fit a TARGET subcorpus than the
    raw corpus (Xie et al. 2023's hashed-n-gram importance estimators;
    the scoring form here is the bit-portable linear difference of
    smoothed fixed-point probabilities rather than the log-ratio —
    exact integers, so both engines reproduce it bit-for-bit, and it
    ranks documents by the same "more target-like than corpus-like"
    signal). Returns (doc, n_tokens, align_e9): positive = closer to
    the target distribution, feed into weighted/threshold resampling
    (e.g. :func:`~queens_spark.operators.sampling.hash_sample` after
    a score cut).

    score(doc) = Σ_b cnt_doc(b) · (p̂_target_e9(b) − p̂_corpus_e9(b)),
    p̂ = Laplace-smoothed ⌊(cnt+1)·1e9 / (total+n_buckets)⌋.

    Scale shape: tokens hash (char-once polynomial) into *n_buckets*
    features, so BOTH distribution tables are bounded at n_buckets
    counter rows (broadcastable at any corpus size); the corpus makes
    ONE explode pass feeding the per-doc, corpus, and target
    aggregations; the per-doc finish joins doc-bucket counts against
    the broadcast tables and sums exact int64 terms (the 1e9 scale ×
    doc tokens stays far inside the envelope).
    """
    from queens_spark.operators.dedup import _persist
    from queens_spark.operators.text import char_poly_hash

    pred = (
        F.expr(target_predicate)
        if isinstance(target_predicate, str)
        else target_predicate
    )
    feats = _persist(
        df.select(
            F.col(id_col).alias("doc"),
            pred.alias("is_t"),
            F.explode(tokens(text_col)).alias("tok"),
        ).select(
            "doc",
            "is_t",
            (char_poly_hash(F.col("tok")) % n_buckets).alias("b"),
        )
    )
    doc_b = feats.groupBy("doc", "b").agg(F.count(F.lit(1)).alias("cnt"))
    s_b = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cs"))
    t_b = (
        feats.where("is_t").groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = feats.agg(
        F.count(F.lit(1)).alias("ts"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("tt"),
    )
    scored = (
        doc_b.join(F.broadcast(s_b), "b")
        .join(F.broadcast(t_b), "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc",
            "cnt",
            F.expr(
                f"cnt * ((coalesce(ct, 0) + 1) * {ALIGN_SCALE} "
                f"div (tt + {n_buckets}) "
                f"- (cs + 1) * {ALIGN_SCALE} div (ts + {n_buckets}))"
            ).alias("term"),
        )
    )
    return scored.groupBy("doc").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.sum("term").cast("bigint").alias("align_e9"),
    )


#: Fixed-point scale for the PMI-proxy co-occurrence score.
PMI_SCALE = 1_000_000


def related_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seed_term: str,
    k: int = 20,
    min_co: int = 2,
) -> DataFrame:
    """Query-expansion mining — "related searches": the top-*k* terms
    most associated with *seed_term* by document co-occurrence,
    ranked by the exact-integer PMI proxy
    ``score_e6 = ⌊co_df·N·1e6 / (df_seed·df_term)⌋`` (monotone in PMI
    for a fixed seed — log is not bit-portable, the ratio is), with
    *min_co* suppressing one-off co-occurrences. Returns (token,
    co_df, df_docs, score_e6), ties on the token.

    Scale shape: ONE persisted distinct-(doc, token) projection feeds
    the seed-doc set, the co-occurrence count, and the df table; the
    semi-join against the seed docs shuffles on the doc key (AQE
    broadcasts small seeds); both finishing joins are token-keyed
    counter tables; TakeOrdered head. int64 envelope: co_df·N·1e6
    must stay below 2⁶³ — at 10⁹ docs co_df caps at ~9·10³ before
    sharding, so shard the co count per term block beyond that.
    """
    from queens_spark.operators.dedup import _persist

    tf = _persist(
        term_frequencies(df, text_col, id_col).select("doc", "token")
    )
    seed = tf.where(F.col("token") == seed_term).select("doc")
    n_docs = tf.agg(F.count_distinct("doc").alias("n"))
    df_seed = seed.agg(F.count(F.lit(1)).alias("df_s"))
    co = (
        tf.join(seed, "doc", "left_semi")
        .where(F.col("token") != seed_term)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("co_df"))
        .where(F.col("co_df") >= min_co)
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    return (
        co.join(dft, "token")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(df_seed))
        .select(
            "token",
            "co_df",
            "df_docs",
            F.expr(f"co_df * n * {PMI_SCALE} div (df_s * df_docs)")
            .alias("score_e6"),
        )
        .orderBy(F.desc("score_e6"), F.asc("token"))
        .limit(k)
    )


def collocations(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Collocation / phrase mining — the new-vocabulary-induction
    primitive ("machine learning" is a unit, "the learning" is not):
    top-*k* bigrams by pointwise mutual information, PMI's monotone
    ratio computed as the FIXED-ORDER double expression
    ``c2/NB · NT/u1 · NT/u2`` (identical IEEE operation sequence on
    both engines — exact-integer scaling would overflow int64 at
    corpus scale, and log is not bit-portable; the fixed-order ratio
    is both). *min_count* suppresses the unstable low-count tail PMI
    is notorious for. Returns (w1, w2, c2, u1, u2, pmi_ratio), ties
    on (w1, w2).

    Scale shape: ONE persisted (doc, w1, w2) positions pass feeds the
    bigram counts; unigram counts reuse the same frame (left word of
    every position + each doc's last token via the token pass — here
    the standard wordcount); the scalar totals ride a broadcast
    single-row frame; TakeOrdered head.
    """
    from queens_spark.operators.dedup import _persist

    pos = _persist(_bigram_positions(df, text_col, id_col))
    c2 = (
        pos.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .where(F.col("c2") >= min_count)
    )
    uni = word_frequencies(df, text_col).select(
        F.col("w"), F.col("c").alias("u")
    )
    totals = pos.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
        df.select(F.explode(tokens(text_col)).alias("t")).agg(
            F.count(F.lit(1)).alias("nt")
        )
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("u").alias("u1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("u").alias("u2"))
    return (
        c2.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "c2", "u1", "u2",
            (
                F.col("c2").cast("double") / F.col("nb").cast("double")
                * F.col("nt").cast("double") / F.col("u1").cast("double")
                * F.col("nt").cast("double") / F.col("u2").cast("double")
            ).alias("pmi_ratio"),
        )
        .orderBy(F.desc("pmi_ratio"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


#: Fixed-point scale for Kneser-Ney probabilities.
KN_SCALE = 1_000_000_000


def kneser_ney_bigram_lm(
    df: DataFrame, text_col: str, id_col: str, scale: int = KN_SCALE
) -> DataFrame:
    """Kneser-Ney smoothed bigram LM (absolute discount d = 3/4) in
    EXACT integer arithmetic — the state-of-the-art n-gram smoothing
    (Kneser & Ney 1995), bit-portable where its floating form is not:

        P_KN(w2|w1) = (max(c2−d, 0) + d·N1+(w1,·)·P_cont(w2)) / c1
        P_cont(w2)  = |{w1 : c(w1,w2) > 0}| / |distinct bigrams|

    With d = 3/4 everything is rational over the common denominator
    4·c1·D, so the scaled probability is ONE integer expression:
    p_kn_e9 = ⌊(max(4c2−3, 0)·D + 3·N1+(w1)·cont(w2))·scale/(4·c1·D)⌋.

    Returns (w1, w2, c2, c1, n1p, cont, p_kn_e9). Scale shape: one
    persisted bigram-positions pass; c1/N1+/cont are counter-width
    aggregations of the c2 frame joined back on their keys; D is a
    driver scalar (one count of the aggregated frame — vocabulary²
    bounded, the BM25-stats convention). int64 envelope guarded:
    (4·max(c2)·D + 3·max(N1+)·max(cont)) · scale must stay < 2⁶³ —
    raise before any join rather than overflow silently.
    """
    from queens_spark.operators.dedup import _persist

    # positions feed ONLY the c2 aggregation here (unlike
    # lm_doc_scores, where they also join back for scoring) — caching
    # them would build a corpus-width cache for a single consumer
    pos = _bigram_positions(df, text_col, id_col)
    c2 = _persist(
        pos.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    )
    c1 = _persist(c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p")
    ))
    cont = _persist(c2.groupBy("w2").agg(F.count(F.lit(1)).alias("cont")))
    head = (
        c2.agg(
            F.count(F.lit(1)).alias("d_"), F.max("c2").alias("m2")
        )
        .crossJoin(c1.agg(F.max("n1p").alias("mn")))
        .crossJoin(cont.agg(F.max("cont").alias("mc")))
        .collect()[0]
    )
    D, m2 = int(head["d_"] or 0), int(head["m2"] or 0)
    if D == 0:
        raise ValueError("empty corpus: no bigrams")
    if (4 * m2 * D + 3 * int(head["mn"]) * int(head["mc"])) * scale >= 2**63:
        raise ValueError(
            f"kneser-ney int64 envelope exceeded (max c2={m2}, D={D}, "
            f"scale={scale}); lower scale or shard the LM"
        )
    return (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .select(
            "w1", "w2", "c2",
            F.col("c1").cast("bigint").alias("c1"),
            F.col("n1p").cast("bigint").alias("n1p"),
            F.col("cont").cast("bigint").alias("cont"),
            F.expr(
                f"(greatest(4 * c2 - 3, 0) * {D} + 3 * n1p * cont) "
                f"* {scale} div (4 * c1 * {D})"
            ).alias("p_kn_e9"),
        )
    )
