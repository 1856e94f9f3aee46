"""Deterministic sampling for training-data pipelines.

``df.sample()`` draws from a per-task RNG: reruns, retries, and
repartitions change the selected rows, which breaks reproducibility
and any join against a previous run's sample. Hash sampling decides
per KEY — the same key is always in or out, on any engine, at any
parallelism — so samples are stable, joinable, and auditable.

The bucket arithmetic is pure int64 modular math (multiplicative
hashing mod a prime), identical in Spark and the DuckDB oracle; no
overflow at any id scale because the key is reduced mod p first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

HASH_P = 1_000_000_007
HASH_A = 2_654_435_761  # Knuth's multiplicative constant
BUCKETS = 10_000        # sampling resolution: basis points


def hash_bucket(key: Column | str, salt: int = 0) -> Column:
    """Stable per-key bucket in [0, BUCKETS): ((key mod p)·A + salt)
    mod p mod BUCKETS."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        (c.cast("bigint") % HASH_P * (HASH_A % HASH_P) + F.lit(salt)) % HASH_P
    ) % BUCKETS


def duckdb_hash_bucket(expr: str, salt: int = 0) -> str:
    return (
        f"((CAST({expr} AS BIGINT) % {HASH_P}) * {HASH_A % HASH_P} + {salt}) "
        f"% {HASH_P} % {BUCKETS}"
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction_bp: int, salt: int = 0
) -> DataFrame:
    """Keep rows whose key hashes below *fraction_bp* basis points
    (2000 → a stable 20% sample)."""
    return df.where(hash_bucket(key_col, salt) < fraction_bp)


def hash_split(
    key: Column | str,
    splits: dict[str, int],
    salt: int = 0,
) -> Column:
    """Deterministic dataset-split assignment: *splits* maps split
    name → basis points (must sum to ≤ BUCKETS; any remainder gets
    NULL, i.e. held out). The same key always lands in the same split
    — across reruns, engines, and parallelism — so train/val/test
    membership is stable and leak-free by construction, and a JOIN
    against any prior run's split agrees row-for-row.

    Names are assigned in sorted order over contiguous bucket ranges,
    so the mapping is reproducible from the dict alone."""
    total = sum(splits.values())
    if total > BUCKETS:
        raise ValueError(f"split fractions sum to {total} > {BUCKETS} bp")
    b = hash_bucket(key, salt)
    expr = F.lit(None).cast("string")
    hi = 0
    for name, bp in sorted(splits.items()):
        lo, hi = hi, hi + bp
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return expr


def duckdb_hash_split(expr: str, splits: dict[str, int], salt: int = 0) -> str:
    b = duckdb_hash_bucket(expr, salt)
    cases, hi = [], 0
    for name, bp in sorted(splits.items()):
        lo, hi = hi, hi + bp
        cases.append(f"WHEN __b >= {lo} AND __b < {hi} THEN '{name}'")
    return (
        "(SELECT CASE " + " ".join(cases) + " ELSE NULL END "
        f"FROM (SELECT {b} AS __b) __hs)"
    )


#: Fixed-point scale for mixture weights (parts per million).
PPM = 1_000_000


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights_ppm: dict[str, int],
    salt: int = 0,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Max-feasible deterministic mixture: sample each stratum so the
    OUTPUT composition matches *weights_ppm* (parts-per-million shares,
    summing to ≤ 1e6) at the largest total the data supports — the
    training-mixture construction step ("50% en, 25% de, …").

    T = min_s ⌊count_s · 1e6 / w_s⌋ is the largest total for which no
    stratum is oversubscribed; each stratum then accepts
    ⌊w_s·T/1e6⌋ · BUCKETS ÷ count_s basis points of its keys via the
    stable per-key hash (same decision on any engine at any
    parallelism). All integer arithmetic — the DuckDB oracle
    reproduces the rates and the membership bit-for-bit. Strata
    without a weight are dropped.

    Scale shape: one counter-width groupBy-count (collected — it has
    |strata| rows), then a map-side CASE filter; the corpus itself
    never shuffles. Hash granularity is 1 basis point, so realized
    shares track targets to ~1e-4, limited by per-bucket key
    clustering, not by corpus size.
    """
    if not weights_ppm:
        raise ValueError("weights_ppm must be non-empty")
    if any(w <= 0 for w in weights_ppm.values()):
        raise ValueError("mixture weights must be positive")
    if sum(weights_ppm.values()) > PPM:
        raise ValueError(
            f"mixture weights sum to {sum(weights_ppm.values())} > {PPM} ppm"
        )
    # *counts* lets callers that already collected the per-stratum
    # counts (temperature_mixture derives its weights from them) skip
    # a second full-scan count job over the same frame
    counts = {
        s: int(n)
        for s, n in (
            counts.items() if counts is not None
            else ((r[0], r[1]) for r in df.groupBy(strata_col).count().collect())
        )
        if s in weights_ppm
    }
    missing = sorted(s for s in weights_ppm if s not in counts)
    if missing:
        # a weighted stratum absent from the data zeroes the feasible
        # total and silently empties EVERY stratum's sample — almost
        # always a misspelled stratum name, so say so loudly (the
        # DuckDB twin mirrors the empty result, so behavior stays
        # oracle-consistent; only the warning is added)
        import warnings

        warnings.warn(
            f"mixture_sample: weighted strata {missing} have no rows — "
            "the whole mixture is empty",
            stacklevel=2,
        )
    feasible_total = min(
        (counts.get(s, 0) * PPM) // w for s, w in weights_ppm.items()
    )
    threshold = F.lit(-1).cast("bigint")  # unweighted strata: drop
    for s, w in sorted(weights_ppm.items()):
        n = counts.get(s, 0)
        needed = (w * feasible_total) // PPM
        tau_bp = (needed * BUCKETS) // n if n else 0
        threshold = F.when(F.col(strata_col) == s, F.lit(tau_bp)).otherwise(
            threshold
        )
    return df.where(hash_bucket(key_col, salt) < threshold)


def duckdb_mixture_sample_cte(
    table: str,
    key_expr: str,
    strata_col: str,
    weights_ppm: dict[str, int],
    salt: int = 0,
) -> str:
    """DuckDB twin of :func:`mixture_sample`: computes the same
    feasible total and per-stratum thresholds IN SQL (exact integer
    arithmetic), then filters by the shared hash bucket. Returns a
    complete SELECT of the sampled rows of *table*."""
    values = ", ".join(
        f"('{s}', {w})" for s, w in sorted(weights_ppm.items())
    )
    return f"""
    WITH w({strata_col}, wppm) AS (VALUES {values}),
    c AS (
      SELECT w.{strata_col}, wppm, coalesce(n, 0) AS n
      FROM w LEFT JOIN (
        SELECT {strata_col}, count(*) AS n FROM {table} GROUP BY {strata_col}
      ) g ON g.{strata_col} = w.{strata_col}
    ),
    t AS (SELECT min(n * {PPM} // wppm) AS feasible FROM c),
    tau AS (
      SELECT {strata_col},
             CASE WHEN n > 0
                  THEN ((wppm * (SELECT feasible FROM t) // {PPM}) * {BUCKETS}) // n
                  ELSE 0 END AS tau_bp
      FROM c
    )
    SELECT d.* FROM {table} d
    JOIN tau ON d.{strata_col} = tau.{strata_col}
    WHERE {duckdb_hash_bucket(key_expr, salt)} < tau_bp
    """


def _exact_isqrt_from_float(n: int) -> int:
    """floor(√n) computed the way an engine without integer sqrt can:
    IEEE double sqrt, floored, then corrected down if the rounding
    crossed an integer (w² > n). Correctly-rounded sqrt is within
    0.5 ulp, so the floor is off by AT MOST +1 — the single correction
    makes this exactly ⌊√n⌋ for every n < 2⁵³, and the DuckDB twin
    applies the identical correction, so both engines agree even on
    the k²−1 boundary values where bare floor(sqrt(…)) rounds up."""
    import math

    w = int(math.floor(math.sqrt(float(n))))
    return w - 1 if w * w > n else w


def temperature_weights_ppm(
    df: DataFrame, strata_col: str,
    counts: dict[str, int] | None = None,
) -> dict[str, int]:
    """Temperature-smoothed (α = ½) mixture weights from the corpus's
    own composition — the multilingual-pretraining resampling rule
    (sample p_s ∝ share_s^α with α < 1): big sources get down-weighted,
    small sources up-weighted, so the head stops drowning the tail
    without hand-tuning per-source weights. w_s = ⌊√n_s⌋ normalized to
    parts-per-million with floor division; strata whose normalized
    weight floors to 0 are dropped (they would zero the feasible
    total). Exact integer arithmetic end-to-end (the corrected
    floor-sqrt above), so the DuckDB twin reproduces the weights, the
    feasible total, and the membership bit-for-bit.

    One counter-width groupBy-count collect (|strata| rows — the
    model-scale pattern); compose with :func:`mixture_sample`, which
    adds the map-side hash filter and never shuffles the corpus."""
    if counts is None:
        counts = {
            r[0]: int(r[1])
            for r in df.groupBy(strata_col).count().collect()
            if r[0] is not None
        }
    if not counts:
        raise ValueError("temperature_weights_ppm: no strata in the data")
    raw = {s: _exact_isqrt_from_float(n) for s, n in counts.items()}
    wsum = sum(raw.values())
    weights = {
        s: (w * PPM) // wsum for s, w in raw.items() if (w * PPM) // wsum > 0
    }
    if not weights:
        # degenerate composition: every stratum's normalized weight
        # floors to 0 ppm (> 10⁶ strata of near-equal mass). Loud, like
        # the no-strata guard above — silently returning {} would make
        # mixture_sample fail later with a less actionable message (and
        # diverge from the DuckDB twin, which yields zero rows here)
        raise ValueError(
            "temperature_weights_ppm: every stratum's weight floors to "
            f"0 ppm ({len(raw)} strata) — too many near-equal strata "
            "for ppm resolution; coarsen the strata column"
        )
    return weights


def temperature_mixture(
    df: DataFrame, key_col: str, strata_col: str, salt: int = 0
) -> DataFrame:
    """α = ½ temperature-resampled training mixture: smoothed weights
    from :func:`temperature_weights_ppm` fed through
    :func:`mixture_sample`'s max-feasible deterministic sampler. The
    per-stratum counts are collected ONCE and shared by both stages —
    no second corpus-count job."""
    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(strata_col).count().collect()
        if r[0] is not None
    }
    return mixture_sample(
        df, key_col, strata_col,
        temperature_weights_ppm(df, strata_col, counts=counts),
        salt=salt, counts=counts,
    )


def duckdb_temperature_mixture_cte(
    table: str, key_expr: str, strata_col: str, salt: int = 0
) -> str:
    """DuckDB twin of :func:`temperature_mixture`: recomputes the
    corrected floor-sqrt weights, the ppm normalization (dropping
    zero-weight strata), the feasible total, and the per-stratum
    thresholds in exact integer SQL, then filters by the shared hash
    bucket."""
    return f"""
    WITH cnt AS (
      SELECT {strata_col}, CAST(count(*) AS BIGINT) AS n
      FROM {table} WHERE {strata_col} IS NOT NULL GROUP BY 1
    ),
    w0 AS (
      SELECT {strata_col}, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wr0
      FROM cnt
    ),
    wr AS (
      SELECT {strata_col}, n,
             CASE WHEN wr0 * wr0 > n THEN wr0 - 1 ELSE wr0 END AS wr
      FROM w0
    ),
    wp AS (
      SELECT {strata_col}, n,
             wr * {PPM} // (SELECT SUM(wr) FROM wr) AS wppm
      FROM wr
    ),
    live AS (SELECT * FROM wp WHERE wppm > 0),
    t AS (SELECT min(n * {PPM} // wppm) AS feasible FROM live),
    tau AS (
      SELECT {strata_col},
             ((wppm * (SELECT feasible FROM t) // {PPM}) * {BUCKETS}) // n
               AS tau_bp
      FROM live
    )
    SELECT d.* FROM {table} d
    JOIN tau ON d.{strata_col} = tau.{strata_col}
    WHERE {duckdb_hash_bucket(key_expr, salt)} < tau_bp
    """


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_bp: Column,
    salt: int = 0,
) -> DataFrame:
    """Per-row weighted Bernoulli sampling with the stable hash:
    keep a row iff hash_bucket(key) < *weight_bp* (a Column in basis
    points, e.g. ``floor(quality * 10000)``) — the quality-weighted
    downsampling move ("keep good documents proportionally more"),
    deterministic per key on any engine at any parallelism.

    Map-side filter; the corpus never shuffles. The acceptance
    probability is weight_bp/10000 quantized to 1 bp — derive the
    weight column with integer/portable arithmetic when the sample
    must be reproducible cross-engine."""
    return df.where(hash_bucket(key_col, salt) < weight_bp)


def per_group_k_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic uniform k-sample PER GROUP: rank keys by
    (hash_bucket, key) inside each stratum and keep the first k — the
    "k documents per domain" cap. Unlike limit/sample, membership is a
    pure function of the keys present, so reruns and engines agree.

    One shuffle on the stratum key; per-group state is the rank
    window's sort of that group only. For heavily skewed groups at
    100 TB, pre-filter with ``hash_sample`` at a generous multiple of
    k/|group| first so the window sorts a bounded candidate set."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_bp: dict[str, int],
    default_bp: int = 0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum sampling rates (the data-mixing primitive: e.g.
    keep 50% of English, 25% of German, drop the rest) with the same
    stable per-key decision."""
    threshold = F.lit(default_bp)
    for value, bp in sorted(fractions_bp.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(bp)).otherwise(
            threshold
        )
    return df.where(hash_bucket(key_col, salt) < threshold)


def token_budget_plan(
    df: DataFrame,
    text_col: str,
    source_col: str,
    budget_denom: int = 3,
) -> DataFrame:
    """Water-filling mixture plan: allocate a global token budget
    across sources in descending data-quality order.

    The training-mix question ("I can afford B tokens — which sources
    fill them?") answered deterministically: sources rank by their
    exact keep-rate under the filter cascade (keeps·10000 div docs —
    integer basis points, bit-portable; ties break on the source
    name), and the budget B = total_tokens div *budget_denom* pours
    down the ranking — each source gets
    ``clamp(B − tokens_above_it, 0, its_tokens)``, so the best
    sources are taken whole, exactly one source is split, and the
    tail gets zero.

    One corpus scan computes (tokens, verdict) per row; everything
    after aggregates to one row PER SOURCE, so the ranking window's
    single task holds a source-count-sized frame (the q138 funnel
    argument), never corpus rows. Output: (source, n_docs,
    src_tokens, keep_bp, rk, alloc_tokens).
    """
    from queens_spark.operators.text import filter_verdict, token_count

    per = df.select(
        F.col(source_col),
        token_count(text_col).alias("n_tokens"),
        (filter_verdict(text_col) == "keep").cast("int").alias("keep"),
    )
    s = per.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("src_tokens"),
        F.sum("keep").cast("bigint").alias("keeps"),
    ).withColumn("keep_bp", F.expr("keeps * 10000 div n_docs")).drop("keeps")
    tot = s.agg(
        F.expr(f"sum(src_tokens) div {int(budget_denom)}")
        .cast("bigint")
        .alias("budget")
    )
    w = Window.orderBy(F.desc("keep_bp"), F.asc(source_col))
    ranked = (
        s.crossJoin(F.broadcast(tot))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("src_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
    )
    return ranked.select(
        source_col,
        "n_docs",
        "src_tokens",
        "keep_bp",
        "rk",
        F.least(
            F.greatest(F.col("budget") - F.col("cum_before"), F.lit(0)),
            F.col("src_tokens"),
        ).cast("bigint").alias("alloc_tokens"),
    )


def budget_sample(
    df: DataFrame,
    text_col: str,
    source_col: str,
    id_col: str,
    budget_denom: int = 3,
    salt: int = 0,
) -> DataFrame:
    """Execute the water-filling plan: convert each source's
    :func:`token_budget_plan` allocation into a deterministic hash
    sampling rate (``alloc·10⁴ div src_tokens`` basis points — whole
    sources sail through at 10000, the split source gets its exact
    fraction, the tail gets 0) and keep the documents whose stable
    per-id bucket clears it. The plan is a source-count-sized
    broadcast; the corpus is read once and never shuffles — the same
    key-hash determinism contract as :func:`hash_sample`, so reruns,
    retries and engines agree on the exact document set."""
    plan = token_budget_plan(df, text_col, source_col, budget_denom)
    # ANSI mode: div by zero raises even on ints — an all-empty-docs
    # source has src_tokens = 0 and gets rate 0 (the CLAUDE.md guard,
    # mirrored in the q170 oracle)
    rates = plan.select(
        source_col,
        F.expr(
            "CAST(CASE WHEN src_tokens = 0 THEN 0 ELSE "
            "least(alloc_tokens * 10000 div src_tokens, 10000) END "
            "AS BIGINT)"
        ).alias("rate_bp"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .where(hash_bucket(id_col, salt=salt) < F.col("rate_bp"))
    )
