"""Distribution-drift monitoring: an exact, portable, scale-safe
chi-square-style statistic between bucketed histograms.

The pipeline question this answers: "does the batch I'm about to
accept look like the corpus I already have?" — a crawler that starts
returning listings pages, a source that switches language, a
tokenizer change upstream all show up as a shifted length/quality
distribution long before they show up in eval loss.

Statistic: both distributions are reduced to parts-per-million bucket
shares (integer division), and the score is

    drift = Σ_buckets (a_ppm − r_ppm)² div (r_ppm + 1)

— the Pearson chi-square shape on NORMALIZED shares. Properties that
matter here:

- exact integer arithmetic end to end (portable across engines — the
  DuckDB twin hash-matches, no IEEE ordering concerns);
- the ppm normalization bounds every intermediate at 1e12·n_buckets
  REGARDLESS of corpus size — raw-count chi-square overflows int64
  once o·T crosses 9.2e18, which a 1e10-document corpus reaches;
- scale-free: a batch 1000× smaller than the corpus compares shares,
  not counts, so the score reads the same at any batch size (the +1
  in the denominator guards empty reference buckets exactly, not
  approximately).

The reference (alebgz-91/queens) has no drift tier; its closest
behavior is per-version metadata profiling (min/max/count per column
at staging), which this extends to distribution shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PPM = 1_000_000

__all__ = [
    "bucketize",
    "group_drift_scores",
    "group_drift_from_buckets",
    "drift_from_count_frame",
    "hist_counts",
    "drift_from_counters",
    "duckdb_group_drift_sql",
    "duckdb_group_drift_from_bucket_sql",
    "duckdb_drift_from_counts_sql",
]


def bucketize(value: Column, width: int, n_buckets: int) -> Column:
    """Fixed-width bucket id for a non-negative integer feature:
    ``least(value div width, n_buckets-1)`` — the overflow bucket
    absorbs the tail, so the bucket domain is bounded at *n_buckets*
    rows of counters at any corpus size. Exactness at ANY value
    magnitude: the value is clamped to ``width·(n_buckets-1)`` BEFORE
    the (double-typed) division — clamping commutes with the floor
    division, and the clamped domain is small enough that the bigint→
    double round-trip is lossless (a raw ``v/w`` on a 2⁶⁰-scale value
    would round at the cast and drift from the integer ``//`` twin)."""
    v = value.cast("bigint")
    w = F.lit(int(width)).cast("bigint")
    cap = F.lit(int(width) * (int(n_buckets) - 1)).cast("bigint")
    vc = F.least(v, cap)
    return ((vc - (vc % w)) / w).cast("bigint")


def hist_counts(
    df: DataFrame, value: Column, width: int, n_buckets: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., bucket, n) counter histogram — one partial-agg pass,
    output bounded by groups × n_buckets."""
    keys = list(group_cols or [])
    b = bucketize(value, width, n_buckets).alias("bucket")
    return df.select(*keys, b).groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def drift_from_counters(
    batch: dict[int, int], reference: dict[int, int]
) -> int:
    """Driver-side twin over counter dicts (used by the ingest-time
    corpus profile, where both histograms are ≤ n_buckets entries):
    identical arithmetic to the distributed/SQL forms."""
    bt = sum(batch.values())
    rt = sum(reference.values())
    if bt == 0 or rt == 0:
        return 0
    score = 0
    for b in set(batch) | set(reference):
        a_ppm = batch.get(b, 0) * PPM // bt
        r_ppm = reference.get(b, 0) * PPM // rt
        score += (a_ppm - r_ppm) ** 2 // (r_ppm + 1)
    return score


def group_drift_scores(
    df: DataFrame,
    value: Column,
    group_col: str,
    width: int,
    n_buckets: int,
) -> DataFrame:
    """Per-group drift vs the whole-corpus distribution: one histogram
    pass (counter-width), then joins over the groups × buckets grid —
    never a second corpus scan. Output: (group, n_rows, drift_score).
    """
    return group_drift_from_buckets(
        df, bucketize(value, width, n_buckets), group_col
    )


def group_drift_from_buckets(
    df: DataFrame, bucket: Column, group_col: str
) -> DataFrame:
    """The same statistic over a caller-supplied bucket column —
    categorical features drift too (hash the category into a bounded
    bucket domain), and time-windowed monitoring passes the window as
    the group."""
    counts = (
        df.select(F.col(group_col), bucket.alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return drift_from_count_frame(counts, group_col)


def drift_from_count_frame(counts: DataFrame, group_col: str) -> DataFrame:
    """Per-group drift-vs-pooled-profile from an ALREADY-AGGREGATED
    (group, bucket, n) counter frame — the composition point for
    monitors whose counters arrive pre-reduced, e.g. a Structured
    Streaming windowed aggregation's sink (the stream cannot chain a
    second aggregation; the drift finish runs batch-side on the
    counter-width output). Input must be one row per (group, bucket)."""
    from queens_spark.operators.dedup import _persist

    # counter-width frame feeding three consumers — persist so the
    # upstream (possibly corpus-scale) histogram pass runs once, and
    # so the grid re-join below never trips self-join lineage
    # ambiguity on an unbroken counts lineage
    counts = _persist(counts)
    glob = counts.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("gn"))
    gtot = glob.agg(F.sum("gn").cast("bigint").alias("t"))
    gppm = glob.crossJoin(F.broadcast(gtot)).select(
        "bucket",
        (F.col("gn") * PPM).cast("bigint").alias("__num"),
        "t",
    ).select(
        "bucket", F.expr("__num div t").cast("bigint").alias("g_ppm")
    )
    return _score_counts_vs_gppm(counts, group_col, gppm)


def drift_from_count_frame_vs_reference(
    counts: DataFrame, group_col: str, reference: dict[int, int]
) -> DataFrame:
    """Per-group drift vs a FIXED stored baseline — identical exact
    ppm chi-square to :func:`drift_from_count_frame`, but the
    reference shares come from a persisted counter dict (e.g. an
    ``EcdfStore``'s pooled grid) instead of the pooled input, so a
    STREAMING monitor and the batch drift matrix gate against the
    SAME artifact. *reference* is counter-width (≤ n_buckets entries)
    by construction and rides into the plan as a broadcast literal
    frame — never a corpus recompute. A batch bucket the reference
    has never seen drifts at full weight (reference share 0), the
    same treatment the pooled form gives a vanished bucket."""
    from queens_spark.operators.dedup import _persist

    counts = _persist(counts)
    rt = sum(int(n) for n in reference.values())
    if rt <= 0:
        raise ValueError(
            "drift_from_count_frame_vs_reference: empty reference"
        )
    spark = counts.sparkSession
    ref = spark.createDataFrame(
        [
            (int(b), int(n) * PPM // rt)
            for b, n in sorted(reference.items())
        ],
        "bucket bigint, g_ppm bigint",
    )
    # bucket domain = reference ∪ batch (missing either way scores)
    buckets = (
        ref.select("bucket")
        .union(counts.select(F.col("bucket").cast("bigint")))
        .distinct()
    )
    gppm = buckets.join(ref, "bucket", "left").select(
        "bucket",
        F.coalesce("g_ppm", F.lit(0)).cast("bigint").alias("g_ppm"),
    )
    return _score_counts_vs_gppm(counts, group_col, gppm)


def _score_counts_vs_gppm(
    counts: DataFrame, group_col: str, gppm: DataFrame
) -> DataFrame:
    """Shared scoring tail: expand (group × bucket) over the supplied
    per-bucket reference shares and sum the exact integer chi-square.
    *counts* must already be persisted (both callers do)."""
    totals = counts.groupBy(group_col).agg(
        F.sum("n").cast("bigint").alias("n_rows")
    )
    grid = totals.crossJoin(F.broadcast(gppm))
    # fresh attribute ids on the re-joined side: totals/gppm/counts all
    # descend from one plan (e.g. a memory-sink view), and a three-way
    # reuse of the same attributes trips Catalyst's conflicting-
    # reference resolution in the self-join
    cjoin = counts.select(
        F.col(group_col).alias("__cg"),
        F.col("bucket").alias("__cb"),
        F.col("n").alias("__cn"),
    )
    joined = grid.join(
        cjoin,
        (grid[group_col] == cjoin["__cg"]) & (grid["bucket"] == cjoin["__cb"]),
        "left",
    ).select(
        group_col,
        "n_rows",
        "g_ppm",
        F.expr(f"coalesce(__cn, 0) * {PPM} div n_rows")
        .cast("bigint")
        .alias("a_ppm"),
    )
    return joined.groupBy(group_col, "n_rows").agg(
        F.sum(
            F.expr("(a_ppm - g_ppm) * (a_ppm - g_ppm) div (g_ppm + 1)")
        )
        .cast("bigint")
        .alias("drift_score")
    )


def duckdb_group_drift_sql(
    value_expr: str,
    group_col: str,
    width: int,
    n_buckets: int,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`group_drift_scores` (oracle builder)."""
    return duckdb_group_drift_from_bucket_sql(
        f"LEAST(CAST(({value_expr}) AS BIGINT) // {int(width)}, "
        f"{int(n_buckets) - 1})",
        group_col,
        table,
    )


def duckdb_group_drift_from_bucket_sql(
    bucket_expr: str, group_col: str, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`group_drift_from_buckets`."""
    return duckdb_drift_from_counts_sql(
        f"""SELECT {group_col}, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT {group_col}, {bucket_expr} AS bucket FROM {table})
      GROUP BY 1, 2""",
        group_col,
    )


def duckdb_drift_from_counts_sql(counts_sql: str, group_col: str) -> str:
    """DuckDB twin of :func:`drift_from_count_frame` — *counts_sql*
    must yield one ({group_col}, bucket, n) row per pair."""
    return f"""
    WITH counts AS (
      {counts_sql}
    ), totals AS (
      SELECT {group_col}, CAST(SUM(n) AS BIGINT) AS n_rows
      FROM counts GROUP BY 1
    ), gall AS (
      SELECT bucket, CAST(SUM(n) AS BIGINT) AS gn FROM counts GROUP BY 1
    ), gtot AS (
      SELECT CAST(SUM(gn) AS BIGINT) AS tt FROM gall
    ), gppm AS (
      SELECT bucket, CAST(gn * {PPM} // tt AS BIGINT) AS g_ppm
      FROM gall, gtot
    ), grid AS (
      SELECT totals.{group_col}, totals.n_rows, gppm.bucket, gppm.g_ppm
      FROM totals, gppm
    ), appm AS (
      SELECT grid.{group_col}, grid.n_rows, grid.g_ppm,
             CAST(COALESCE(counts.n, 0) * {PPM} // grid.n_rows AS BIGINT)
               AS a_ppm
      FROM grid LEFT JOIN counts
        ON grid.{group_col} = counts.{group_col}
       AND grid.bucket = counts.bucket
    )
    SELECT {group_col}, n_rows,
           CAST(SUM((a_ppm - g_ppm) * (a_ppm - g_ppm) // (g_ppm + 1))
                AS BIGINT) AS drift_score
    FROM appm GROUP BY 1, 2
    """
