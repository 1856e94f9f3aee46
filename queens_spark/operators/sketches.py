"""Portable cardinality sketches (HyperLogLog-style).

Spark's built-in ``approx_count_distinct`` is the production answer,
but its HLL++ register hashing is JVM-private, so no external engine
can reproduce its estimate — it cannot be oracle-graded, and two
engines in one pipeline (Spark + anything else) would disagree. This
module implements a deterministic HLL whose every step is portable
integer/IEEE-double arithmetic, so the DuckDB oracle reproduces the
estimate BIT-FOR-BIT:

- 62-bit key hash from two 31-bit quadratic-round lanes (products
  stay < 2^63, so no engine-dependent overflow semantics are ever
  invoked — DuckDB errors on BIGINT overflow where non-ANSI Spark
  wraps, so staying in range is correctness, not style);
- register index = low 6 bits, rank = leading-zero count of the
  56-bit remainder via an exact CASE ladder (floating log2 would be
  off-by-one at powers of two);
- harmonic sum as Σ 2^(47-ρ) in exact int64 (ranks capped at 47 so
  the sum ≤ 64·2^47 = 2^53 — exact in int64 AND in double, making
  the final bigint→double cast lossless);
- estimate = (0.709·2^59) / S where both factors parse/compute to
  identical doubles in Java and DuckDB (decimal-literal parsing is
  correctly rounded in both) and the single division is IEEE-exact.

Scale shape: the sketch is the classic mergeable aggregate — the
shuffle carries (group, register, rank) counters, never keys. At
100 TB a COUNT(DISTINCT) shuffles every distinct key; this shuffles
at most 64 rows per group per partition. No small-range (linear
counting) correction: it needs ln(), which is not bit-portable — the
raw estimator is used and documented (accuracy ~1.04/√64 ≈ 13% once
n ≳ 2.5·m; below that it reads high).

Also here: a portable COUNT-MIN sketch (fixed-memory frequency
estimation, merge-by-addition) with the same cross-engine guarantee.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

P1 = 2_147_483_647          # 2^31 - 1 (Mersenne prime)
A1 = 2_654_435_761 % P1     # Knuth multiplicative constant
B1 = 1_013_904_223          # Numerical Recipes LCG increment
P2 = 2_147_483_629          # largest prime < P1
A2 = 1_779_033_703 % P2     # SHA-256 IV word
B2 = 1_640_531_527          # 2^32/φ, truncated
M_REGS = 64                 # 2^6 registers: σ = 1.04/√64 ≈ 13%
REG_BITS = 6
W_BITS = 56                 # remainder width: 62-bit hash - 6
RHO_CAP = 47                # cap so Σ 2^(47-ρ) ≤ 64·2^47 = 2^53 stays exact
#: α_64 · m² · 2^47 = 0.709·2^59, spelled so every engine computes the
#: IDENTICAL double: 709·2^59 is exact in double (10 significant
#: bits), the single /1000 is correctly rounded — no decimal-literal
#: typing rules (Spark and DuckDB both type bare `0.709` as DECIMAL,
#: whose →double conversion path is engine-specific) ever engage.
ALPHA_TIMES_M2_SCALED = (
    "(CAST(709 AS DOUBLE) * CAST(576460752303423488 AS DOUBLE)"
    " / CAST(1000 AS DOUBLE))"
)


def _mix31(k: Column, p: int, a: int, b: int) -> Column:
    """One 31-bit hash lane: affine load + TWO quadratic rounds. The
    squaring is the point — an affine-only hash maps arithmetic
    progressions (sequential user ids!) onto arithmetic progressions
    mod p, whose leading-zero ranks are structured (measured ≈+50%
    estimate bias on sequential keys); x → x²+c breaks the linearity
    and restores the geometric rank distribution (measured within ±σ
    on sequential, even-only, and random key sets). Every product is
    < p² < 2^62, so no engine-dependent overflow semantics engage
    (DuckDB errors on BIGINT overflow where non-ANSI Spark wraps)."""
    h = (k % p * a + b) % p
    h = (h * h + a) % p
    h = (h * h + b) % p
    return h


def hll_hash(key: Column | str) -> Column:
    """62-bit portable hash: v = lane1·P2 + lane2 over two independent
    quadratic-round 31-bit lanes."""
    c = F.col(key) if isinstance(key, str) else key
    k = c.cast("bigint")
    return _mix31(k, P1, A1, B1) * P2 + _mix31(k, P2, A2, B2)


def duckdb_hll_hash_ctes(table: str, key_expr: str, group_col: str) -> str:
    """CTE chain for the hash (ends in ``hv(group, v)``), binding each
    mix round's value once — the squaring reads its input twice, so
    inline expansion would double the expression per round."""
    return f"""h0 AS (
        SELECT {group_col},
               (CAST({key_expr} AS BIGINT) % {P1} * {A1} + {B1}) % {P1} AS x1,
               (CAST({key_expr} AS BIGINT) % {P2} * {A2} + {B2}) % {P2} AS x2
        FROM {table}
      ), h1 AS (
        SELECT {group_col}, (x1 * x1 + {A1}) % {P1} AS x1,
               (x2 * x2 + {A2}) % {P2} AS x2 FROM h0
      ), hv AS (
        SELECT {group_col},
               ((x1 * x1 + {B1}) % {P1}) * {P2} + ((x2 * x2 + {B2}) % {P2}) AS v
        FROM h1
      )"""


def _floor_log2_case(w: Column) -> Column:
    """Exact floor(log2(w)) for 1 ≤ w < 2^W_BITS via a CASE ladder."""
    expr = F.lit(0)
    for b in range(1, W_BITS + 1):
        expr = F.when(w >= F.lit(1 << b).cast("bigint"), F.lit(b)).otherwise(expr)
    return expr


def duckdb_floor_log2_case(expr: str) -> str:
    whens = " ".join(
        f"WHEN {expr} >= {1 << b} THEN {b}" for b in range(W_BITS, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def hll_rho(w: Column) -> Column:
    """Leading-zero rank of the W_BITS-wide remainder, capped."""
    raw = F.when(w > 0, F.lit(W_BITS) - _floor_log2_case(w)).otherwise(
        F.lit(W_BITS + 1)
    )
    return F.least(raw, F.lit(RHO_CAP)).cast("int")


def duckdb_hll_rho(expr: str) -> str:
    return (
        f"least(CASE WHEN {expr} > 0 "
        f"THEN {W_BITS} - {duckdb_floor_log2_case(expr)} "
        f"ELSE {W_BITS + 1} END, {RHO_CAP})"
    )


def _require_integral_key(df: DataFrame, key_col: str) -> None:
    """The sketch hash is defined over int64 keys. A silent
    cast('bigint') of a string column yields NULL for every row —
    one garbage register and a fixed wrong estimate — while the
    DuckDB twin ERRORS on the same cast; fail loudly instead. Hash
    string keys first (e.g. text.char_poly_hash / xxhash is NOT
    portable) and feed the integer."""
    # resolve through Spark's own analyzer (case-insensitive names,
    # nested fields) instead of an exact dict lookup on top-level names
    dtype = df.select(key_col).schema[0].dataType.simpleString()
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"hll sketch key {key_col!r} must be an integral column, "
            f"got {dtype!r} — hash strings to int64 first"
        )


def hll_registers(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group HLL register state: (group…, reg, rho) with rho
    maxed. This is the MERGEABLE sketch — union two register frames
    and re-aggregate max(rho) to merge corpora without re-reading
    keys (the cross-partition / cross-day rollup move)."""
    from queens_spark.operators.text import let_bound

    _require_integral_key(df, key_col)

    v = let_bound(
        hll_hash(key_col),
        lambda h: F.struct(
            (h % M_REGS).alias("reg"),
            hll_rho(F.shiftright(h, REG_BITS)).alias("rho"),
        ),
    )
    return (
        df.select(*group_cols, v.alias("x"))
        .groupBy(*group_cols, F.col("x.reg").alias("reg"))
        .agg(F.max("x.rho").alias("rho"))
    )


def hll_merge(reg_frames: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge INDEPENDENTLY-built register frames into one: union +
    per-(group, reg) max(rho). This is the whole point of the sketch
    at 100 TB — per-shard/per-day register frames (64 rows per group
    each) roll up without re-reading any keys, and because max is
    associative + commutative the merged frame is row-identical to a
    single pass over the union of the inputs, so the estimate is too
    (exercised end-to-end by q84 and tests/test_sketches.py)."""
    if not reg_frames:
        raise ValueError("hll_merge needs at least one register frame")
    merged = reduce(DataFrame.unionByName, reg_frames)
    return merged.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finish a register frame into per-group ``hll_est``."""
    per_group = regs.groupBy(*group_cols).agg(
        # pyspark's shiftleft() only takes a literal shift width, so
        # the per-row width goes through expr()
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_CAP} - rho AS INT))"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(M_REGS) - F.col("n_regs")).cast("bigint")
        * F.lit(1 << RHO_CAP).cast("bigint")
    )
    return per_group.select(
        *group_cols,
        (F.expr(ALPHA_TIMES_M2_SCALED) / s_total.cast("double")).alias("hll_est"),
    )


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group distinct-count estimate ``hll_est`` (double,
    bit-portable). Two counter-width aggregations; keys never shuffle
    beyond their (group, register) counter row."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)


def duckdb_hll_distinct_cte(table: str, key_expr: str, group_col: str) -> str:
    """DuckDB twin of :func:`hll_distinct` — returns a full SELECT of
    (group_col, hll_est)."""
    return f"""
    WITH {duckdb_hll_hash_ctes(table, key_expr, group_col)}, regs AS (
      SELECT {group_col}, v % {M_REGS} AS reg,
             max({duckdb_hll_rho(f"v // {M_REGS}")}) AS rho
      FROM hv GROUP BY {group_col}, v % {M_REGS}
    ), s AS (
      SELECT {group_col},
             CAST(SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - rho)) AS BIGINT)
               + ({M_REGS} - count(*)) * (CAST(1 AS BIGINT) << {RHO_CAP}) AS s_total
      FROM regs GROUP BY {group_col}
    )
    SELECT {group_col}, {ALPHA_TIMES_M2_SCALED} / CAST(s_total AS DOUBLE) AS hll_est
    FROM s
    """


# ----------------------------------------------- count-min sketch

#: Count-min geometry: d pairwise-independent affine hash rows over a
#: power-of-two bucket count. Error bound: est ≤ true + 2N/w with
#: probability 1 − (1/2)^d over the salt choice (N = total tokens).
CMS_D = 4
CMS_W = 1024
CMS_P = 1_000_000_007  # = operators.text.HASH_MOD — the token-hash field


def _cms_const(tag: str, j: int, mod: int) -> int:
    from queens_spark.operators.text import sha_const

    return sha_const(f"cms-{tag}", j, mod)


CMS_A = [_cms_const("a", j, CMS_P - 1) | 1 for j in range(CMS_D)]
CMS_B = [_cms_const("b", j, CMS_P) for j in range(CMS_D)]


def cms_bucket_expr(h: Column, j: int) -> Column:
    """Row-j bucket for a token hash h < CMS_P (affine over the prime
    field — pairwise independent, and h·a < 1e18 stays in int64)."""
    return (h * CMS_A[j] + CMS_B[j]) % CMS_P % CMS_W


def _cms_buckets(token_col: str) -> Column:
    """Array of the d (cms_row, bucket) codes for one token — ONE
    shared builder for the build and probe sides, so the two can
    never disagree on the hashing (the classic sketch bug class)."""
    from queens_spark.operators.text import char_poly_hash, let_bound

    return let_bound(
        char_poly_hash(F.col(token_col)),
        lambda h: F.array(*[
            F.struct(
                F.lit(j).alias("cms_row"),
                cms_bucket_expr(h, j).alias("bucket"),
            )
            for j in range(CMS_D)
        ]),
    )


def cms_build(tokens_df: DataFrame, token_col: str = "token") -> DataFrame:
    """Count-min sketch of a token stream: (cms_row, bucket, cnt) —
    d·w = 4096 counters regardless of vocabulary or corpus size.

    This is the fixed-memory frequency summary: exact per-token counts
    need a vocabulary-sized aggregation; the sketch needs 4096
    counters that MERGE BY ADDITION (sum two sketches counter-wise),
    so per-shard/per-day sketches roll up without re-reading tokens.
    Map-side partial aggregation shrinks the shuffle to ≤ d·w rows per
    partition."""
    return (
        tokens_df.select(F.explode(_cms_buckets(token_col)).alias("b"))
        .groupBy(F.col("b.cms_row").alias("cms_row"), F.col("b.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge independently-built count-min sketches BY ADDITION:
    counter-wise sum over (cms_row, bucket). Addition is associative,
    so per-shard sketches sum to exactly the whole-corpus sketch —
    the fixed-memory rollup shape (4096 counters per shard, ever)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    merged = reduce(DataFrame.unionByName, sketches)
    return merged.groupBy("cms_row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_probe(sketch: DataFrame, probes: DataFrame, token_col: str = "token") -> DataFrame:
    """Frequency estimates for the probe tokens: min over the d rows
    of each token's counter. The sketch is 4096 rows, so Catalyst
    broadcasts it and the probe never shuffles the sketch side;
    estimates only ever OVER-count (collisions add, never subtract)."""
    exploded = probes.select(
        F.col(token_col), F.explode(_cms_buckets(token_col)).alias("b")
    ).select(token_col, F.col("b.cms_row").alias("cms_row"), F.col("b.bucket").alias("bucket"))
    return (
        exploded.join(F.broadcast(sketch), ["cms_row", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def duckdb_cms_cte(tokens_select: str, token_col: str = "token") -> str:
    """DuckDB twin of :func:`cms_build` as a CTE body ``cms(cms_row,
    bucket, cnt)``; *tokens_select* yields one row per token
    occurrence."""
    from queens_spark.operators.text import duckdb_char_poly_hash

    h = duckdb_char_poly_hash(token_col)
    rows = " UNION ALL ".join(
        f"SELECT {j} AS cms_row, (__h * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P} % {CMS_W} AS bucket "
        f"FROM th"
        for j in range(CMS_D)
    )
    return f"""th AS (
      SELECT {h} AS __h FROM ({tokens_select})
    ), cms AS (
      SELECT cms_row, bucket, count(*) AS cnt FROM ({rows}) GROUP BY cms_row, bucket
    )"""


def duckdb_cms_probe_expr(token_expr: str) -> str:
    """Scalar DuckDB expression: count-min estimate for *token_expr*
    against the ``cms`` CTE."""
    from queens_spark.operators.text import duckdb_char_poly_hash

    h = duckdb_char_poly_hash(token_expr)
    mins = ", ".join(
        f"coalesce((SELECT cnt FROM cms WHERE cms_row = {j} "
        f"AND bucket = (__ph * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P} % {CMS_W}), 0)"
        for j in range(CMS_D)
    )
    return f"(SELECT least({mins}) FROM (SELECT {h} AS __ph) __pr)"


# ------------------------------------------- sampled quantile sketch

def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    rate_bp: int,
    quantiles: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """Mergeable quantile ESTIMATION: exact linear-interpolation
    quantiles of a deterministic hash sample (keep keys whose portable
    bucket < *rate_bp* basis points), plus ``n_sample`` so consumers
    can reason about resolution (sample order statistics estimate
    population quantiles to ±O(1/√n_sample) in rank space).

    Why this shape at 100 TB: an exact grouped quantile pass sorts the
    full corpus (operators/quantiles.py — right when required); this
    sketch pays that only on the sample, and its STATE — the sampled
    rows themselves — is mergeable the way HLL registers are: the
    per-key filter commutes with union, so per-shard/per-day samples
    union into exactly the whole-corpus sample (tested), then
    re-finish. KLL/t-digest compact more aggressively but their merge
    is order-dependent — not reproducible cross-engine, so not
    oracle-gradeable; the hash sample trades memory for determinism.

    The sample filter is map-side (pushed into the scan); the finish
    runs the two-phase rank machinery on sample-sized data only.
    """
    from queens_spark.operators.quantiles import exact_group_quantiles
    from queens_spark.operators.sampling import hash_sample

    if not 0 < rate_bp <= 10_000:
        raise ValueError(f"rate_bp must be in (0, 10000], got {rate_bp}")
    sample = hash_sample(df, key_col, rate_bp, salt)
    est = exact_group_quantiles(sample, group_col, value_col, quantiles)
    n = (
        sample.groupBy(group_col)
        .agg(F.count(F.col(value_col)).alias("n_sample"))
    )
    # LEFT: a group whose sampled values are all NULL has n_sample=0
    # and no order statistics — the SQL twin emits it with NULL
    # quantiles, so dropping it here would diverge
    return n.join(est, group_col, "left")


def duckdb_sampled_quantiles(
    table: str,
    group_col: str,
    value_col: str,
    key_col: str,
    rate_bp: int,
    quantiles: dict[str, float],
    salt: int = 0,
) -> str:
    """DuckDB twin of :func:`sampled_quantiles` — same hash filter,
    ``quantile_cont`` finish (bit-identical to the two-phase
    interpolation, proven by q47 vs q58)."""
    from queens_spark.operators.sampling import duckdb_hash_bucket

    qcols = ", ".join(
        f"quantile_cont({value_col}, {p}) AS {name}"
        for name, p in quantiles.items()
    )
    return f"""
    SELECT {group_col}, count({value_col}) AS n_sample, {qcols}
    FROM {table}
    WHERE {duckdb_hash_bucket(key_col, salt)} < {rate_bp}
    GROUP BY {group_col}
    """
