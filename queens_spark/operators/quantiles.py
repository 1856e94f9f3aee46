"""Distributed EXACT grouped quantiles — the scale path.

Spark's ``percentile()`` (and DuckDB's ``quantile_cont``) buffer every
group value inside one aggregation buffer: exact, but a
billion-row group is an OOM, and the sort is per-group single-threaded.
This module computes the same linear-interpolation quantiles from
order statistics instead:

1. range-partition on (group, value) and rank two-phase (chunk-local
   row_number + broadcast chunk offsets — the same pattern as
   ``store.warehouse.with_row_uid``), so every group's sort runs at
   full cluster width with sort-spill semantics;
2. per-group counts (tiny) turn each requested quantile into the two
   straddling ranks ``lo = floor(p·(n-1)+1)`` / ``hi = ceil(...)``;
3. ONE broadcast equi-join on (group, rank) fetches just those rows,
   and ``v_lo + (v_hi - v_lo)·frac`` interpolates.

Nothing is ever held per-group in memory; the shuffles are the range
sort (spillable) and counter-sized aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _offsets_join_side(offsets: DataFrame, broadcast_offsets: bool):
    """The offsets frame is chunks×groups COUNTER rows. Broadcasting
    it (the default) keeps the rank join shuffle-free, which is right
    for the bounded-cardinality group columns every catalog query
    uses — but the broadcast grows with |groups|, so a caller ranking
    by a HIGH-cardinality group column must pass
    ``broadcast_offsets=False``: the join then falls back to a plain
    equi-join that AQE sizes (shuffled or broadcast by its own
    estimate). Results are identical either way (pinned by
    tests/test_quantiles.py); only the join strategy changes."""
    return F.broadcast(offsets) if broadcast_offsets else offsets


def grouped_ordinal(
    df: DataFrame,
    group_col: str,
    value_col: str,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """1..N rank of *value_col* within *group_col* without a
    single-task-per-group window (two-phase, see module docstring).
    Output columns: group_col, ``__v`` (value), ``__rk``.
    *broadcast_offsets*: see :func:`_offsets_join_side`."""
    base = df.select(
        F.col(group_col), F.col(value_col).cast("double").alias("__v")
    ).where(F.col(value_col).isNotNull())
    ranged = base.repartitionByRange(F.col(group_col).asc(), F.col("__v").asc())
    part = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", group_col).orderBy(F.col("__v").asc())
    local = part.withColumn("__rn", F.row_number().over(w_local))
    # chunk counts come from PART (pre-window): per-(chunk, group) row
    # counts don't depend on rank, and taking them from `local` would
    # re-execute the corpus-wide Sort+Window in the offsets branch
    # (operators above the reused exchange run once per consumer)
    counts = part.groupBy("__pid", group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(
            _offsets_join_side(offsets, broadcast_offsets),
            ["__pid", group_col],
        )
        .withColumn("__rk", F.col("__off") + F.col("__rn"))
        .select(group_col, "__v", "__rk")
    )


def grouped_rank(
    df: DataFrame,
    group_col: str,
    value_col: str,
    carry_cols: tuple[str, ...] = (),
    broadcast_offsets: bool = True,
) -> DataFrame:
    """RANK() semantics (min ordinal over ties) of *value_col* within
    *group_col*, two-phase like :func:`grouped_ordinal`, carrying
    *carry_cols* payload columns through so no join back against the
    source frame is ever needed. Output: carry_cols + group_col +
    ``__v`` (value), ``__rk`` (1..N rank, ties share the min), ``__n``
    (group size).

    Correctness of the per-chunk rank: ``repartitionByRange`` assigns
    equal (group, value) keys to ONE partition (rows compare equal, so
    they cannot straddle a range boundary), hence the local
    ``F.rank()`` sees every tie of its value and the global rank is
    exactly chunk offset + local rank. One corpus pass, one range
    shuffle; offsets and group sizes ride a broadcast of the
    chunks×groups counter table.
    """
    base = df.select(
        *carry_cols,
        F.col(group_col),
        F.col(value_col).cast("double").alias("__v"),
    ).where(F.col(value_col).isNotNull())
    ranged = base.repartitionByRange(F.col(group_col).asc(), F.col("__v").asc())
    part = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", group_col).orderBy(F.col("__v").asc())
    local = part.withColumn("__lrk", F.rank().over(w_local))
    # from PART, not `local`: see grouped_ordinal — the offsets branch
    # must not re-execute the corpus Sort+Window above the exchange
    counts = part.groupBy("__pid", group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(group_col)
    offsets = counts.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_all).alias("__n"),
    )
    return (
        local.join(
            _offsets_join_side(offsets, broadcast_offsets),
            ["__pid", group_col],
        )
        .withColumn("__rk", F.col("__off") + F.col("__lrk"))
        .select(*carry_cols, group_col, "__v", "__rk", "__n")
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: dict[str, float],
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Exact linear-interpolation quantiles per group, one output
    column per entry of *quantiles* (name → fraction). Matches
    ``percentile()``/``quantile_cont`` semantics bit-for-bit while
    scaling to arbitrarily large groups (see module docstring).

    Single-scan: the two-phase rank machinery's own chunk-counts
    table already knows every group's size (Σ chunk counts), so the
    group totals ride the same broadcast as the chunk offsets instead
    of a second aggregation pass over the source — one corpus scan,
    one range shuffle, no extra exchange."""
    base = df.select(
        F.col(group_col), F.col(value_col).cast("double").alias("__v")
    ).where(F.col(value_col).isNotNull())
    ranged = base.repartitionByRange(
        F.col(group_col).asc(), F.col("__v").asc()
    )
    part = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid", group_col).orderBy(
        F.col("__v").asc()
    )
    local = part.withColumn("__rn", F.row_number().over(w_local))
    # from PART, not `local`: see grouped_ordinal — the offsets/totals
    # branches must not re-execute the corpus Sort+Window
    chunk = part.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(group_col)
    # NOT persisted: offsets' chunk ids/counts must come from the SAME
    # range-exchange execution the rank join reads (range boundaries
    # are sampled per execution — a cached offsets frame can disagree
    # with a re-executed exchange and silently corrupt ranks; bit us
    # at sf0.1). Both consumers share the one exchange via Spark's
    # exchange reuse, exactly as grouped_ordinal always has.
    offsets = chunk.select(
        "__pid",
        group_col,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_all).alias("__n"),
    )
    ranked = (
        local.join(
            _offsets_join_side(offsets, broadcast_offsets),
            ["__pid", group_col],
        )
        .withColumn("__rk", F.col("__off") + F.col("__rn"))
        .select(group_col, "__v", "__rk")
    )
    totals = offsets.select(group_col, "__n").distinct()
    qarr = F.array(*[
        F.struct(F.lit(name).alias("qname"), F.lit(float(p)).alias("p"))
        for name, p in quantiles.items()
    ])
    # rn = p·(n−1); ranks are floor(rn)+1 / ceil(rn)+1. The finish is
    # the weighted TWO-PRODUCT form (crn−rn)·vlo + (rn−frn)·vhi —
    # DuckDB's quantile_cont sequence bit-for-bit (the algebraically
    # equal vlo + (vhi−vlo)·frac, and computing frac from rn+1, each
    # diverge in the last ulp on general doubles; bit us on q99).
    targets = (
        totals.select(F.col(group_col), F.explode(qarr).alias("t"), "__n")
        .select(
            group_col,
            F.col("t.qname").alias("qname"),
            (F.col("t.p") * (F.col("__n") - 1)).alias("rn"),
        )
        .withColumn("lo", (F.floor("rn") + 1).cast("long"))
        .withColumn("hi", (F.ceil("rn") + 1).cast("long"))
    )
    need = targets.select(
        group_col, "qname", "rn", "lo",
        F.explode(F.array_distinct(F.array("lo", "hi"))).alias("__rk"),
    )
    joined = ranked.join(F.broadcast(need), [group_col, "__rk"])
    per_q = joined.groupBy(group_col, "qname", "rn", "lo").agg(
        F.min(F.when(F.col("__rk") == F.col("lo"), F.col("__v"))).alias("vlo"),
        F.min(F.when(F.col("__rk") != F.col("lo"), F.col("__v"))).alias("vhi"),
    )
    frn = F.floor("rn").cast("double")
    crn = F.ceil("rn").cast("double")
    val = F.when(F.col("vhi").isNull(), F.col("vlo")).otherwise(
        (crn - F.col("rn")) * F.col("vlo")
        + (F.col("rn") - frn) * F.col("vhi")
    )
    vals = per_q.select(group_col, "qname", val.alias("val"))
    return vals.groupBy(group_col).agg(*[
        F.min(F.when(F.col("qname") == name, F.col("val"))).alias(name)
        for name in quantiles
    ])
