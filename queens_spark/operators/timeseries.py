"""Temporal/interval join operators (beyond the reference's surface;
the reference has no temporal joins — SURVEY.md §2.3).

The as-of join is THE missing Spark primitive for event/feature
alignment ("attach the latest right-side row at or before each left
timestamp"). The naive theta-join (l.key = r.key AND r.ts <= l.ts plus
a max-per-row dedup) explodes quadratically per key; the scalable plan
used here is the union-marker pattern:

    union both sides → one shuffle on the key → per-key window sorted
    by (ts, side, tiebreak) → last(right_payload, ignorenulls) over
    preceding rows → keep left rows.

One shuffle total, state bounded by the window (nothing quadratic);
per-key skew behaves like any windowed aggregation (AQE handles it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "ts"),
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every *left* row gains ``prefix+c`` for each
    *right_cols* entry, taken from the latest right row of the same key
    with ``right_ts <= left_ts`` (nulls when no such row — ASOF LEFT
    JOIN semantics).

    Ties: right rows sharing a timestamp are resolved by the ordering
    of *right_cols* (last one wins), so results are deterministic.
    """
    key_cols = list(key_cols)
    lpay = F.struct(*[F.col(c) for c in left.columns])
    rpay = F.struct(*[F.col(c) for c in right_cols])

    lu = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        lpay.alias("__lrow"),
        F.lit(None).cast(
            right.select(rpay.alias("x")).schema["x"].dataType
        ).alias("__rpay"),
    )
    ru = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(lpay.alias("x")).schema["x"].dataType
        ).alias("__lrow"),
        rpay.alias("__rpay"),
    )
    # total order: ts, then right-before-left at equal ts (<= semantics),
    # then the right payload itself so equal-ts right rows resolve
    # deterministically; explicit ROWS frame — a RANGE frame would pull
    # in peers and break the tie-break.
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__rpay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lu.unionByName(ru).withColumn(
        "__last_r", F.last("__rpay", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"__last_r.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return filled.where(F.col("__side") == 1).select(*out_left, *out_right)


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 10.0,
) -> DataFrame:
    """Interval join: every point row matched with every range row
    whose half-open interval ``[lo, hi)`` contains the point value.

    The naive plan is a cross/nested-loop join with an inequality
    filter — O(points × ranges). Binning turns it into an EQUI join:
    each range explodes to the fixed-width bins it covers, each point
    hashes to its bin, the join key is the bin id, and the exact
    interval predicate filters residual edge rows. Bin width trades
    range-side duplication (hi-lo)/width against per-bin fan-in; with
    a small ranges side Catalyst broadcasts and there is no shuffle at
    all.
    """
    w = float(bin_width)
    r = ranges.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    p = points.withColumn("__bin", F.floor(F.col(point_col) / w).cast("long"))
    return (
        p.join(r, "__bin")
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bin")
    )


#: Dense-grid safety cap for :func:`resample_gap_fill`: one key
#: spanning this many buckets at the chosen unit is almost certainly a
#: unit mistake (3 years of minutes ≈ 1.6M rows PER KEY) — raise
#: before the explode instead of silently generating it.
MAX_GRID_ROWS_PER_KEY = 2_000_000


def resample_gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    max_grid_rows_per_key: int = MAX_GRID_ROWS_PER_KEY,
) -> DataFrame:
    """Regularize an event stream onto a dense per-key time grid —
    the resample/gap-fill step every time-series feature pipeline
    needs before windowed models (missing buckets are *data*, and
    downstream lag/rolling features silently skip them unless the
    grid is dense).

    Emits one row per (key, bucket) across EACH KEY's [first, last]
    observed bucket span at *unit* granularity:

    - ``n_events`` / ``sum_cents``: zero-filled aggregates (exact
      cents: ⌊value·100⌋ summed as BIGINT — the house integer-money
      rule, bit-portable);
    - ``carry_cents``: the last OBSERVED bucket sum carried forward
      (classic ffill; never null because each key's span starts at an
      observed bucket).

    Scale shape: one (key, bucket) aggregation shuffle; the span
    aggregation is counter-width per key; the dense grid is generated
    DISTRIBUTED via per-key sequence+explode (grid size = span/unit
    per key — guard your unit against multi-year spans); the
    grid-to-aggregate join is key+bucket-hashed and AQE broadcasts
    whichever side is small; the carry window partitions by key,
    bounded by span length. Nothing corpus-sized sorts globally.

    Guard: the grid explodes span/unit rows PER KEY, so a multi-year
    span at a fine *unit* silently generates millions of rows per key.
    The span aggregate (already computed, counter-width per key) is
    checked BEFORE the explode; any key whose grid would exceed
    *max_grid_rows_per_key* raises a ValueError naming it — the house
    rule for documented failure modes (cf. bm25's int64 envelope
    guard, strip_common_lines' cap)."""
    b = F.date_trunc(unit, F.col(ts_col))
    per = (
        df.select(
            F.col(key_col),
            b.alias("bucket"),
            F.floor(F.col(value_col).cast("double") * 100)
            .cast("bigint")
            .alias("__cents"),
        )
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__cents").alias("__s"),
        )
    )
    from queens_spark.operators.dedup import _persist

    # persisted: the guard probe below and the grid both read it, and
    # it is tiny (one row per key) — the (key, bucket) aggregation
    # upstream runs once, not twice
    span = _persist(
        per.groupBy(key_col).agg(
            F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx")
        )
    )
    worst = (
        span.select(
            F.col(key_col),
            (F.expr(f"timestampdiff({unit}, __mn, __mx)") + 1).alias(
                "__rows"
            ),
        )
        .orderBy(F.desc("__rows"))
        .limit(1)
        .collect()
    )
    if worst and int(worst[0]["__rows"]) > int(max_grid_rows_per_key):
        raise ValueError(
            f"resample_gap_fill: key {worst[0][key_col]!r} spans "
            f"{int(worst[0]['__rows'])} {unit} buckets, over the "
            f"{int(max_grid_rows_per_key)}-row-per-key grid cap; "
            "coarsen unit or raise max_grid_rows_per_key"
        )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.expr(f"sequence(__mn, __mx, interval 1 {unit})")
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per, [key_col, "bucket"], "left")
        .select(
            F.col(key_col),
            F.col("bucket"),
            F.coalesce("__n", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce("__s", F.lit(0)).cast("bigint").alias("sum_cents"),
            F.last("__s", ignorenulls=True).over(w).alias("carry_cents"),
        )
    )
