"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting.

Everything here is a pyspark ``Column`` expression builder using
built-in higher-order functions (transform/aggregate/filter) — the
whole pipeline stays JVM-side inside whole-stage codegen, no Python
UDFs, no shuffles: per-document scoring is embarrassingly parallel
and scales linearly with executors at 100 TB.

Cross-engine determinism: the polynomial rolling hash uses only
integer arithmetic (fold of ``h*31 + codepoint mod p``), so a SQL
engine (the DuckDB oracle) reproduces values bit-for-bit.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import Column, functions as F

HASH_MOD = 1_000_000_007


def column_memo(fn):
    """Memoize CONSTRUCTION of constant-shaped Column expressions.

    Building a wide expression tree costs two py4j round trips per
    node, so the big per-row builders (shingling, MinHash lanes, the
    quality score) spend 0.1–0.5 s of DRIVER time per query re-creating
    the same unresolved tree. Column objects are immutable wrappers
    over unresolved expressions — the same object can appear in any
    number of plans — so when every argument is a plain hashable value
    (a column NAME, an int, ...) the built tree is cached per argument
    tuple and reused for the life of the process. Any Column/DataFrame
    or otherwise unhashable argument bypasses the cache, and nothing
    about WHAT is computed changes — this is expression construction,
    not results."""
    cache: dict = {}

    def _plain(v) -> bool:
        return isinstance(v, (str, int, float, bool, tuple, type(None)))

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if not (
            all(_plain(a) for a in args)
            and all(_plain(v) for v in kwargs.values())
        ):
            return fn(*args, **kwargs)
        key = (args, tuple(sorted(kwargs.items())))
        if key not in cache:
            cache[key] = fn(*args, **kwargs)
        return cache[key]

    return wrapped

#: Tiny marker-word lists for the language-ID heuristic. Deliberately
#: small and deterministic — the operator contract is "argmax marker
#: fraction with alphabetical tie-break", not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "los", "las", "y", "es", "una"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}


@column_memo
def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty strings filtered so empty/blank
    text yields an empty array (not [''])."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


@column_memo
def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


@column_memo
def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c).cast("bigint")


#: BPE-ish pre-tokenization pattern (GPT-2 style, simplified to the
#: subset whose semantics are identical in Java and DuckDB regex):
#: a token is a letter run, a digit run, or a punctuation run, each
#: with an optional leading space folded in; whitespace itself is not
#: a token. Gives the subword-merge input count, a better proxy for
#: LLM token budgets than whitespace splitting.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


@column_memo
def bpe_ish_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("bigint")


def duckdb_bpe_ish_token_count(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, '{BPE_ISH_PATTERN}')) AS BIGINT)"
    )


@column_memo
def type_token_ratio(text: Column | str) -> Column:
    """Distinct-token / token ratio — a lexical-diversity signal."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n > 0,
                  F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    stop = F.array(*[F.lit(s) for s in (stopwords or LANG_MARKERS["en"])])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


@column_memo
def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    n_alpha_sp = F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    return F.when(n > 0,
                  (n - n_alpha_sp).cast("double") / n.cast("double")
                  ).otherwise(F.lit(0.0))


@column_memo
def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic:
    0.4·length-score + 0.3·(1-punct_ratio) + 0.3·diversity.
    Uses only +,-,*,/ on doubles so any engine reproduces it exactly.
    """
    n_tok = token_count(text).cast("double")
    length_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * type_token_ratio(text)
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-word fraction."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    n = F.size(toks)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        out[lang] = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return out


@column_memo
def lang_id(text: Column | str) -> Column:
    """Argmax of the marker fractions; 'und' (undetermined) when all
    scores are zero; alphabetical-first tie-break (deterministic)."""
    scores = lang_scores(text)
    pairs = F.array(*[
        F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ])
    # sort by (-score, lang): array_sort on struct sorts field-order;
    # negate score so max comes first, lang breaks ties alphabetically.
    best = F.array_sort(
        F.transform(pairs, lambda p: F.struct(
            (-p["score"]).alias("neg"), p["lang"].alias("lang")))
    )[0]
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


# -------------------------------------------- repetition / Gopher rules

def let_bound(bound: Column, body) -> Column:
    """Evaluate *bound* ONCE per row and reference it many times:
    Spark has no `let`, and CollapseProject re-evaluates a
    withColumn-ed subexpression per reference; binding through a
    1-element-array ``transform`` lambda makes Catalyst evaluate it
    exactly once. (Re-exported by operators/dedup.py, whose MinHash
    lanes were the original motivating case.)"""
    return F.transform(F.array(bound), body)[0]


@column_memo
def doc_lines(text: Column | str) -> Column:
    """Non-empty trimmed lines (split on newline)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )


@column_memo
def word_ngrams(text: Column | str, n: int) -> Column:
    """Word n-grams WITH duplicates (space-joined) — repetition
    counting needs multiplicities, unlike the distinct shingles the
    dedup index uses. Fewer than n tokens → empty array."""
    return let_bound(
        tokens(text),
        lambda tk: F.when(
            F.size(tk) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
            )
        ),
    )


def max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element in *arr* (0 for empty).


    Sort + run-length fold: O(k log k) per row instead of the naive
    count-per-distinct-element O(k·distinct) — the difference between
    linear-ish and quadratic per document, which matters for 100k-token
    documents at corpus scale. Zero shuffle; the equivalent
    explode→groupBy→max would shuffle every n-gram occurrence."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(F.array_sort(arr), zero, step, lambda acc: acc["best"])


#: Line-terminal punctuation for the "fraction of lines ending in
#: punctuation" quality rule. Identical semantics in Java regex and RE2.
LINE_END_PUNCT_PATTERN = r"[.!?]$"


def _ratio(num: Column, den: Column) -> Column:
    return F.when(
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))


def dup_line_frac(text: Column | str) -> Column:
    """Fraction of lines that are repeats of an earlier line."""
    return let_bound(
        doc_lines(text),
        lambda ls: _ratio(F.size(ls) - F.size(F.array_distinct(ls)), F.size(ls)),
    )


def dup_line_char_frac(text: Column | str) -> Column:
    """Fraction of line characters inside repeated lines (occurrences
    beyond the first) — the Gopher `duplicate_line_character_fraction`
    rule. total_chars − distinct_chars needs no per-line counting."""
    def char_sum(ls: Column) -> Column:
        return F.aggregate(
            ls, F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.length(x).cast("bigint"),
        )

    return let_bound(
        doc_lines(text),
        lambda ls: _ratio(
            char_sum(ls) - char_sum(F.array_distinct(ls)), char_sum(ls)
        ),
    )


def frac_lines_end_punct(text: Column | str) -> Column:
    """Fraction of lines ending in terminal punctuation — low values
    flag boilerplate/navigation text."""
    return let_bound(
        doc_lines(text),
        lambda ls: _ratio(
            F.size(F.filter(ls, lambda x: x.rlike(LINE_END_PUNCT_PATTERN))),
            F.size(ls),
        ),
    )


def top_ngram_frac(text: Column | str, n: int = 2) -> Column:
    """Fraction of n-gram positions covered by the single most frequent
    n-gram — high values flag templated/repetitive text (the Gopher
    `top_2gram_fraction` family)."""
    return let_bound(
        word_ngrams(text, n),
        lambda ng: _ratio(max_multiplicity(ng), F.size(ng)),
    )


def dup_ngram_frac(text: Column | str, n: int = 3) -> Column:
    """Fraction of n-gram positions that are repeats of an earlier
    occurrence (the `duplicate_3gram_fraction` family)."""
    return let_bound(
        word_ngrams(text, n),
        lambda ng: _ratio(F.size(ng) - F.size(F.array_distinct(ng)), F.size(ng)),
    )


def symbol_word_ratio(text: Column | str) -> Column:
    """(# of '#' characters + # of '...' runs) per token — the Gopher
    symbol-to-word screen."""
    c = F.col(text) if isinstance(text, str) else text
    n_hash = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    n_ellipsis = F.regexp_count(c, F.lit(r"\.\.\."))
    return let_bound(
        F.size(tokens(text)),
        lambda nt: F.when(
            nt > 0,
            (n_hash + n_ellipsis).cast("double") / nt.cast("double"),
        ).otherwise(F.lit(0.0)),
    )


# ------------------------------------------------------------- hashing

def sha_const(tag: str, i: int, mod: int) -> int:
    """Deterministic SHA-256-derived parameter constant — the shared
    generator behind the MinHash lanes and count-min salts (both
    engines bake the resulting Python ints into their expressions, so
    any deterministic generator keeps them in lockstep; SHA-derived
    values avoid the structured-multiplier correlations documented in
    operators/dedup.py)."""
    import hashlib

    return int.from_bytes(
        hashlib.sha256(f"queens-{tag}-{i}".encode()).digest()[:8], "big"
    ) % mod



def char_poly_hash(s: Column, p: int = HASH_MOD) -> Column:
    """Portable rolling hash: fold (h*31 + codepoint) mod p over the
    characters, init 0. Empty string → 0.

    Characters come from one ``split(s, '')`` pass rather than a
    substr-per-position transform: substr is O(position), so the
    per-position form is O(len²) per string — measurably slower on
    shingle-hashing paths (q27/q28). ``split('', '')`` yields
    ``['']`` whose ``ascii`` is 0, so the empty-string hash stays 0.
    """
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch).cast("bigint")) % F.lit(p),
    )

def token_chunks(
    text: Column | str, chunk_tokens: int = 100, stride: int = 80
) -> Column:
    """Array of overlapping token-window chunks — the standard
    long-document → training-sample splitter. Chunk i covers tokens
    [i·stride, i·stride + chunk_tokens); the last chunk may be short;
    empty docs yield no chunks. Pure per-row array expressions: zero
    shuffle, embarrassingly parallel, and the chunk count per doc is
    ceil(max(n - chunk_tokens, 0) / stride) + 1 — linear in document
    length, so exploding the result scales with corpus tokens.

    With stride < chunk_tokens consecutive chunks overlap by
    chunk_tokens - stride tokens (context continuity across samples).
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = tokens(text)
    return F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(
                F.lit(0),
                F.floor(
                    (F.greatest(F.size(toks) - chunk_tokens, F.lit(0))
                     + F.lit(stride - 1)) / F.lit(stride)
                ).cast("int"),
            ),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens)
            ),
        )
    )


def duckdb_token_chunks(
    expr: str, chunk_tokens: int = 100, stride: int = 80
) -> str:
    """DuckDB twin of :func:`token_chunks`."""
    toks = f"list_filter(string_split_regex({expr}, '\\s+'), x -> x <> '')"
    return (
        f"(SELECT CASE WHEN len(__tk) = 0 THEN [] "
        f"ELSE list_transform("
        f"range(0, 1 + CAST(floor((greatest(len(__tk) - {chunk_tokens}, 0) "
        f"+ {stride - 1}) / {stride}) AS BIGINT)), "
        f"i -> array_to_string(list_slice(__tk, i * {stride} + 1, "
        f"i * {stride} + {chunk_tokens}), ' ')) END "
        f"FROM (SELECT {toks} AS __tk) __tc)"
    )


#: Masking patterns chosen for identical semantics in Java regex and
#: DuckDB's RE2: no backrefs, no lookaround.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"


def mask_pii(text: Column | str) -> Column:
    """Mask emails then URLs with fixed placeholder tokens — the
    standard pre-training redaction pass. Two JVM regexp_replace
    calls, zero shuffle; order matters (emails first, so an address
    inside a URL query string is already masked)."""
    c = F.col(text) if isinstance(text, str) else text
    masked = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(masked, URL_PATTERN, "<URL>")


def normalize_text(text: Column | str) -> Column:
    """Whitespace-collapse + trim (the same normalization the
    fingerprint uses, minus lowercasing — casing is signal for
    training data)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def doc_fingerprint(text: Column | str) -> Column:
    """md5 of the normalized text (lowercased, whitespace collapsed) —
    the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def rolling_token_hash(text: Column | str, p: int = HASH_MOD) -> Column:
    """Order-sensitive document fingerprint: fold the per-token
    polynomial hashes through a second polynomial (mod p)."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 131 + char_poly_hash(t, p)) % F.lit(p),
    )


def duckdb_char_poly_hash(expr: str, p: int = HASH_MOD) -> str:
    """The DuckDB-SQL twin of :func:`char_poly_hash` (used to build
    oracle queries — list_reduce needs the 0 prepended to match the
    fold-with-init semantics)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({expr})+1), "
        f"i -> CAST(ascii(substring({expr}, i, 1)) AS BIGINT))), "
        f"(a, b) -> (a*31 + b) % {p})"
    )


# ------------------------------------------------- filter cascade

def filter_verdict(
    text: Column | str,
    min_tokens: int = 15,
    lang: str = "en",
    max_dup_line_frac: float = 0.3,
    max_symbol_ratio: float = 0.1,
    min_quality: float = 0.5,
) -> Column:
    """FineWeb/Gopher-style filter CASCADE verdict: the first failing
    rule labels the document (cheap structural screens before
    statistical ones — the order real pipelines use so the audit
    funnel reads as a narrowing sequence), 'keep' if all pass:

    too_short → language → repetition → symbols → low_quality → keep

    Every signal is one of this module's bit-portable per-document
    screens (pure array expressions, zero shuffle, linear scan);
    thresholds compare identically-computed IEEE doubles, so the
    verdict itself is engine-portable.
    """
    return (
        F.when(token_count(text) < min_tokens, F.lit("too_short"))
        .when(lang_id(text) != lang, F.lit("language"))
        .when(dup_line_frac(text) > max_dup_line_frac, F.lit("repetition"))
        .when(symbol_word_ratio(text) > max_symbol_ratio, F.lit("symbols"))
        .when(quality_score(text) < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )


def filter_funnel(
    df, text_col: str, id_col: str, **thresholds
) -> "DataFrame":
    """The curation audit report: per cascade verdict, how many docs
    and tokens land there and the exact basis-point share of the
    corpus — what a data team ships with every corpus release. One
    linear scan + a verdict-keyed counter aggregation (≤ 6 groups);
    the share divides by a whole-frame window total over that
    6-row frame, never a second corpus pass."""
    from pyspark.sql import Window

    per_doc = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        filter_verdict(text_col, **thresholds).alias("verdict"),
    )
    agg = per_doc.groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    return agg.select(
        "verdict",
        "n_docs",
        "n_tokens",
        F.expr("n_docs * 10000").cast("bigint").alias("_num"),
        F.sum("n_docs").over(w_all).alias("_tot"),
    ).select(
        "verdict",
        "n_docs",
        "n_tokens",
        F.expr("_num div _tot").alias("doc_share_bp"),
    )


def readability_stats(text: Column | str):
    """Flesch reading-ease inputs + score — the classic readability
    screen (word/sentence length and the vowel-group syllable
    heuristic; deterministic, so engine-portable where dictionary
    syllabifiers are not). Returns a struct (n_words, n_sentences,
    n_syllables, flesch); flesch = 206.835 − 1.015·(W/S) −
    84.6·(SY/W) in FIXED evaluation order, 0.0 for empty docs.
    Pure per-row array expressions, zero shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(F.lower(c))
    n_words = F.size(toks)
    n_syl = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.greatest(
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
            F.lit(1),
        ).cast("bigint"),
    )
    n_sent = F.greatest(
        F.size(
            F.filter(
                F.transform(F.split(c, r"[.!?]+"), lambda x: F.trim(x)),
                lambda x: x != "",
            )
        ),
        F.lit(1),
    )
    flesch = F.when(n_words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syl.cast("double") / n_words.cast("double")),
    ).otherwise(F.lit(0.0))
    return F.struct(
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_syl.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def compression_ratios(df, text_col: str, id_col: str) -> "DataFrame":
    """zlib compression-ratio quality screen — the Dolma/FineWeb-2
    signal the pure-expression repetition stats (q62) approximate:
    highly repetitive or templated text compresses far below natural
    prose, and near-random noise barely compresses at all. Returns
    (doc, n_bytes, n_compressed, ratio_bp) with ratio_bp =
    ⌊compressed·10⁴/raw⌋ (low = repetitive, ~10⁴ = incompressible).

    zlib level 6 is deterministic for a given input, but no SQL
    engine exposes it — so this is a pytest-verified operator (like
    the Excel reader), implemented as the sanctioned Python path: one
    Arrow-batched pandas UDF over UTF-8 bytes, zero shuffle.
    """
    import zlib

    # pandas is imported at module level: the UDF's 'pd.Series' type
    # hints are strings under `from __future__ import annotations`,
    # resolved against the function's MODULE globals
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def comp(s: pd.Series) -> pd.Series:
        def one(t):
            raw = (t or "").encode("utf-8")
            if not raw:
                return [0, 0, 10000]
            comp_n = len(zlib.compress(raw, 6))
            return [len(raw), comp_n, comp_n * 10000 // len(raw)]

        return s.map(one)

    return df.select(
        F.col(id_col).alias("doc"), comp(F.col(text_col)).alias("c")
    ).select(
        "doc",
        F.col("c")[0].alias("n_bytes"),
        F.col("c")[1].alias("n_compressed"),
        F.col("c")[2].alias("ratio_bp"),
    )
