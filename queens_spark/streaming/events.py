"""Structured Streaming over the events table shape.

The reference has no streaming surface (SURVEY.md §2.10); this module
is part of the scale extensions: the same event analytics offered in
batch (queries q02/q09/q34) expressed as incremental streaming plans
with watermarks, so late data is handled and state is bounded.

Design: every builder takes a *streaming* DataFrame and returns a
transformed streaming DataFrame — source/sink wiring stays at the
edges (file source with ``maxFilesPerTrigger`` in production,
``Trigger.AvailableNow`` for backfills/tests). State sizing at scale:
watermarks bound the window state to |keys| × (watermark / slide)
entries; session state is bounded by active sessions only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

#: Parquet stream sources need an explicit schema; ts has shipped as
#: either raw nanos (INT64 — older generators, see queries.load) or a
#: plain parquet TIMESTAMP. The schema is probed from the existing
#: files and ts normalized to a microsecond event_time either way.
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _source_fan_out(spark: SparkSession, path: str) -> int:
    """Round-robin width for streams whose per-row map work is heavy
    (sketch hashing): a tiny-file availableNow backfill scans as ~1
    split, serializing that work on one core, and a streaming frame's
    partitioning cannot be probed the way ``session.
    ensure_min_partitions`` probes a batch frame — so the split count
    is estimated from the source bytes. Returns 0 (no repartition)
    when the source already yields at least cluster-parallelism
    splits, so no shuffle is ever added to a corpus-scale stream."""
    import os

    total = 0
    if os.path.isfile(path):
        total = os.path.getsize(path)
    elif os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith((".", "_"))
            )
    max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    splits = max(1, (total + max_pb - 1) // max_pb)
    par = spark.sparkContext.defaultParallelism
    return par if splits < par else 0


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    fan_out: bool = False,
) -> DataFrame:
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(path).schema
    except Exception:  # no files yet — fall back to the legacy schema
        schema = EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # The file-stream source only accepts directories. For a
        # single-file input (e.g. the shared read-only testdata),
        # stream a temp directory holding a symlink to it.
        import tempfile

        d = tempfile.mkdtemp(prefix="qs_stream_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    df = reader.parquet(path)
    if fan_out:
        n = _source_fan_out(spark, path)
        if n:
            df = df.repartition(n)
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        event_time = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        event_time = F.col("ts").cast("timestamp")
    return df.withColumn("event_time", event_time)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: Column | str = "value",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    watermark for late data. Streaming state: |event_types| × live
    windows. Pass a decimal-cast *value_col* when the sum must be
    order-independent (oracle comparison)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: Column | str = "value",
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming twin of
    batch q34_sessionize. Native ``session_window`` keeps state only
    for open sessions. Pass a decimal-cast *value_col* when the sum
    must be order-independent (oracle comparison)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.session_window("event_time", gap).alias("s"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            F.col("user_id"),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events", "session_value",
        )
    )


def first_seen(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    payload_cols: tuple[str, ...] = ("event_id", "ts"),
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming first-seen dedup — the custom stateful operator built
    on ``applyInPandasWithState`` (the streaming twin of batch exact
    dedup): the first event per *key_cols* group is emitted, every
    later one is dropped.

    Not expressible with built-in streaming aggregates: append-mode
    aggregation only emits on watermark close, while dedup must emit
    the FIRST row immediately and remember the key forever (or for a
    TTL). State per key is a single boolean-sized record; with
    ``state_ttl_minutes`` set, a processing-time timeout evicts idle
    keys so state is bounded for unbounded key spaces (at 100 TB/day
    of events this is the difference between a working pipeline and an
    OOM).

    Within one micro-batch, rows are ordered by *order_cols* so the
    winner is deterministic; across micro-batches the semantics are
    first-PROCESSED-wins (late data loses — inherent to streaming
    dedup).
    """
    import pandas as pd

    key_cols = list(key_cols)
    payload_cols = [c for c in payload_cols if c not in key_cols]
    out_fields = [f for f in events.schema.fields
                  if f.name in key_cols + payload_cols]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    out_cols = [f.name for f in out_fields]

    def dedup(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            first = None
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                cand = pdf.sort_values(list(order_cols)).iloc[0]
                if first is None or tuple(cand[c] for c in order_cols) < tuple(
                    first[c] for c in order_cols
                ):
                    first = cand
            if first is not None:
                state.update((True,))
                yield pd.DataFrame([{c: first[c] for c in out_cols}])
        else:
            for _ in pdf_iter:  # drain: key already emitted
                pass
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)

    timeout = "ProcessingTimeTimeout" if state_ttl_minutes else "NoTimeout"
    return events.groupBy(*key_cols).applyInPandasWithState(
        dedup, out_schema, state_schema, "append", timeout
    )


def funnel_progress(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    window_hours: int = 24,
    type_col: str = "event_type",
    time_col: str = "event_time",
    order_cols: tuple[str, ...] = ("event_time", "event_id"),
    state_ttl_minutes: int | None = None,
    watermark_eviction: bool = False,
) -> DataFrame:
    """Streaming CONVERSION-WINDOW funnel — the watermark-era twin of
    batch q201_funnel_windowed, the way session_aggregates twins
    q200: a user advances to step k only on an event of the k-th type
    strictly after their step-(k−1) completion and within
    *window_hours* of it; each completion emits ONE row
    ``(user_id, step, event_type, ts)`` immediately.

    Built on ``applyInPandasWithState`` because append-mode
    aggregation cannot express it: a funnel must emit the moment a
    step completes (not at watermark close) and remember per-user
    progression across micro-batches. State per user is just the
    per-step first-completion times (``len(steps)`` timestamps — no
    event buffering; a user who never anchors step 1 stores NOTHING),
    REMOVED the moment the funnel completes. Two eviction modes bound
    state for unbounded user spaces:

    - *state_ttl_minutes*: processing-time TTL (idle keys age out);
    - *watermark_eviction*: event-time timeout at the user's OWN
      conversion horizon (anchor + window) — once the watermark (the
      caller sets it with ``withWatermark``) passes the horizon the
      user can never legally advance, so eviction cannot change any
      output: it is purely the state bound, gated by the same
      watermark that gates the windowed aggregations. An arriving
      batch whose horizon is already behind the watermark drops state
      immediately.

    Within a micro-batch rows process in *order_cols* order, so
    single-batch results equal the batch funnel; across batches the
    semantics are first-PROCESSED-wins (a late-arriving EARLIER
    step-1 event cannot retroactively re-anchor the window — the
    documented best-effort posture of this build's streaming tier).
    """
    import pandas as pd

    steps = list(steps)
    if state_ttl_minutes is None:
        # Only step-type events can read or write funnel state, so
        # dropping the rest BEFORE the shuffle + Python boundary cuts
        # both without changing a single emitted row. Skipped under a
        # processing-time TTL: there an idle user's non-step traffic
        # refreshes the timeout, and filtering would change when idle
        # state ages out.
        events = events.where(F.col(type_col).isin(steps))
    win = pd.Timedelta(hours=window_hours)
    win_ms = window_hours * 3600 * 1000
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField(f"t{i}", T.TimestampType()) for i in range(len(steps))
    ])

    def advance(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        times = list(state.get) if state.exists else [None] * len(steps)
        pdfs = [p for p in pdf_iter if len(p)]
        rows = (
            pd.concat(pdfs, ignore_index=True).sort_values(list(order_cols))
            if pdfs else pd.DataFrame(columns=[type_col, time_col])
        )
        emitted = []
        # column lists, not iterrows(): building a Series per row costs
        # ~10× the state-machine work itself
        for ev_type, ts in zip(
            rows[type_col].tolist(), rows[time_col].tolist()
        ):
            nxt = next(
                (i for i, t in enumerate(times) if t is None), None
            )
            if nxt is None:
                break
            if ev_type != steps[nxt]:
                continue
            if nxt > 0:
                prev = times[nxt - 1]
                if not (prev < ts <= prev + win):
                    continue
            times[nxt] = ts
            emitted.append({
                "user_id": key[0], "step": nxt + 1,
                "event_type": steps[nxt], "ts": ts,
            })
        if times[-1] is not None or times[0] is None:
            # funnel complete, or never anchored: store nothing
            if state.exists:
                state.remove()
        else:
            # restored state yields datetimes, fresh batch rows yield
            # pandas Timestamps — normalize before epoch math
            anchor = pd.Timestamp(max(t for t in times if t is not None))
            horizon_ms = anchor.value // 10**6 + win_ms
            if (
                watermark_eviction
                and horizon_ms <= state.getCurrentWatermarkMs()
            ):
                # the watermark already passed this user's horizon —
                # no event the watermark admits can advance them
                if state.exists:
                    state.remove()
            else:
                state.update(tuple(times))
                if watermark_eviction:
                    state.setTimeoutTimestamp(horizon_ms)
                elif state_ttl_minutes is not None:
                    state.setTimeoutDuration(
                        state_ttl_minutes * 60 * 1000
                    )
        if emitted:
            yield pd.DataFrame(emitted)

    timeout = (
        "EventTimeTimeout" if watermark_eviction
        else "ProcessingTimeTimeout" if state_ttl_minutes
        else "NoTimeout"
    )
    return events.groupBy("user_id").applyInPandasWithState(
        advance, out_schema, state_schema, "append", timeout
    )


#: shuffle/state partition count for STREAMING execution only. Every
#: stateful operator instantiates one state store PER shuffle
#: partition; at local scale 32 stores dominate wall time (measured:
#: q96 6.5 s → 2.7 s at 8). On a cluster, size to key cardinality via
#: the env override.
STREAM_SHUFFLE_PARTITIONS = int(
    __import__("os").environ.get("QS_STREAM_SHUFFLE_PARTITIONS", "8")
)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str | None = None,
    stream_partitions: int | None = STREAM_SHUFFLE_PARTITIONS,
) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (backfill/test mode) into an in-memory sink; returns the result
    as a batch DataFrame. Aggregation plans default to ``complete``;
    append-mode plans (e.g. :func:`first_seen`) pass
    ``output_mode="append"``.

    The shuffle-partition count is dropped to *stream_partitions*
    (default :data:`STREAM_SHUFFLE_PARTITIONS`) for the stream's
    execution and restored after — streaming picks the conf up once at
    start, so the scope is exactly this query; results are
    partition-count-invariant (hash aggregation by key). Pass ``None``
    to keep the session setting: ops whose per-partition work is a
    PYTHON worker (applyInPandasWithState — q54) want full
    parallelism, it's only the per-partition JVM state stores that
    dominate at low key counts (measured: q96 6.5 s → 2.7 s at 8;
    q54 2.3 s → 4.9 s at 8)."""
    import os
    import shutil

    if output_mode is None:
        output_mode = "complete" if stream_df.isStreaming else "append"
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if stream_partitions:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(stream_partitions)
        )
    ckpt = None
    try:
        writer = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        # This runner's checkpoint is EPHEMERAL by contract (memory
        # sink, deleted on stop) — durability belongs to run_to_table.
        # Every micro-batch still fsyncs its offset/commit logs and
        # state-store files into it, so put it on tmpfs when the host
        # has one: the fsyncs become memory writes. Never do this for
        # a restartable checkpoint.
        if os.path.isdir("/dev/shm"):
            import tempfile as _tf

            ckpt = _tf.mkdtemp(prefix="qs_ckpt_", dir="/dev/shm")
            writer = writer.option("checkpointLocation", ckpt)
        q = writer.start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if ckpt is not None:
            shutil.rmtree(ckpt, ignore_errors=True)
    # Hygiene for long-lived many-query sessions (guide §5 — the
    # driver must not hoard).
    #
    # 1. The checkpoint above is ephemeral (fresh mkdtemp per call),
    #    so the state-store providers this run loaded can never be
    #    reused — unload them now instead of holding full state maps
    #    in executor memory until the background maintenance task
    #    notices the query is gone. No-op when nothing is loaded;
    #    batch queries never touch the StateStore.
    try:
        getattr(
            getattr(
                spark._jvm,
                "org.apache.spark.sql.execution.streaming.state.StateStore$",
            ),
            "MODULE$",
        ).unloadAll()
    except Exception:
        pass  # hygiene-only hook; never fail the query over it
    # 2. The memory sink holds its FULL result in the driver under
    #    `query_name`. Re-running the same name REPLACES the view (the
    #    old sink becomes unreachable), so accumulation is bounded at
    #    one live result per distinct query name — but a serving
    #    process that cycles through MANY named queries should still
    #    call :func:`drop_memory_sinks` once each result is consumed.
    _MEMORY_SINKS.add(query_name)
    return spark.table(query_name)


#: names of live memory-sink tables registered by run_available_now
_MEMORY_SINKS: set[str] = set()


def drop_memory_sinks(spark) -> None:
    """Drop every memory-sink table registered by
    :func:`run_available_now` whose result has been consumed — frees
    the driver-resident sink rows in long-lived sessions. Safe only
    AFTER the returned frames are materialized (they lazily read the
    sink)."""
    while _MEMORY_SINKS:
        spark.catalog.dropTempView(_MEMORY_SINKS.pop())


def run_to_table(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str = "qs_to_table",
    stream_partitions: int | None = STREAM_SHUFFLE_PARTITIONS,
) -> None:
    """PRODUCTION runner: execute the streaming plan over all
    currently-available input into a CHECKPOINTED parquet sink, then
    return. This is the restartable form of :func:`run_available_now`
    (which serves tests/oracles through a memory sink): the
    checkpoint directory persists the source file log, the watermark,
    and every stateful operator's state store, so a later call with
    the SAME checkpoint resumes exactly — already-processed files are
    never re-read (no duplicate emission into the sink), and state
    that spans the restart (an open window with events on both sides
    of the stop, a first-seen key set) is restored from the HDFS-
    backed store, not recomputed. Kill-and-resume safety is the
    file-sink commit log: a batch's files land atomically or the
    restart rewrites them.

    File sinks are append-only by contract, so aggregation plans emit
    a window exactly once — when the watermark passes its end; rows
    still in state at stream end surface on the run AFTER input
    advances the watermark past them (the standard production
    cadence: each micro-run flushes what the new data closed).

    At 100 TB: one long-running query (or a cron of availableNow
    micro-runs — this function) per pipeline, checkpoint on shared
    storage, sink partitioned however downstream reads it. The
    shuffle-partition scoping matches :func:`run_available_now`; the
    state-store count follows it, so keep it consistent across
    restarts of the same checkpoint.
    """
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if stream_partitions:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(stream_partitions)
        )
    try:
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def interval_self_join(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM event-time interval join: every *right_type*
    event matched to every *left_type* event of the same user within
    [0, max_lag] before it — the incremental form of the attribution
    join (batch twin: q75's funnel predicate).

    This is the stateful-join tier of Structured Streaming: each side
    buffers rows only until the other side's watermark passes the
    join-condition's time bound, so state is bounded by
    watermark + max_lag of traffic — an unconstrained stream-stream
    join would buffer forever. Inner join, so availableNow backfill
    reproduces the batch join exactly (watermarks bound STATE, not
    results, in backfill). Both sides come from ONE source stream
    (supported self-join); the right side's columns are renamed since
    a self-join shares the input's attribute ids."""
    views = events.where(F.col("event_type") == left_type).select(
        "user_id",
        F.col("event_time").alias("l_time"),
        F.col("event_id").alias("l_id"),
    )
    buys = events.where(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_time").alias("r_time"),
        F.col("event_id").alias("r_id"),
    )
    return (
        views.withWatermark("l_time", watermark)
        .join(
            buys.withWatermark("r_time", watermark),
            F.expr(
                f"user_id = r_user AND r_time >= l_time "
                f"AND r_time <= l_time + INTERVAL {max_lag}"
            ),
            "inner",
        )
        .select("user_id", "l_id", "r_id", "l_time", "r_time")
    )


def windowed_cms_counters(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming COUNT-MIN sketch state: counters per (window, cms_row,
    bucket) — rows (window_start, window_end, cms_row, bucket, cnt).

    The streaming frequency-tracking analogue of
    :func:`windowed_hll_registers`: an exact per-key count keeps one
    state row per key (unbounded under key churn); the sketch keeps at
    most d·w = 4096 counter rows per window regardless of traffic, and
    the counters MERGE BY ADDITION (backfill + live, or two clusters,
    sum counter-wise). Same shared bucket hasher as the batch sketch
    (operators/sketches.py), so streaming counters equal batch counters
    exactly; probe read-side with the min-over-rows rule (see q87)."""
    from queens_spark.operators.sketches import _cms_buckets

    toks = events.select(
        "event_time", F.col(key_col).cast("string").alias("__tok")
    )
    return (
        toks.withWatermark("event_time", watermark)
        .select("event_time", F.explode(_cms_buckets("__tok")).alias("b"))
        .groupBy(
            F.window("event_time", window).alias("w"),
            F.col("b.cms_row").alias("cms_row"),
            F.col("b.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cms_row", "bucket", "cnt",
        )
    )


def windowed_hll_registers(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming distinct-count sketch state: HLL registers per
    (window, event_type) — rows (window_start, window_end, event_type,
    reg, rho).

    Streaming COUNT(DISTINCT) is unsupported because its state is
    unbounded (every key must be remembered); the sketch replaces it
    with a BOUNDED windowed aggregate — at most 64 register rows per
    (window, type) regardless of traffic — using the same portable
    hash/rank as the batch sketch (operators/sketches.py), so batch
    and streaming estimates agree exactly. Register frames MERGE by
    max(rho): a backfill and a live stream, or two clusters, combine
    without re-reading keys. Finish with
    ``sketches.hll_estimate(regs, ["window_start", "window_end",
    "event_type"])`` on the sink output — the split production wants,
    since finishing is a read-side scalar pass."""
    from queens_spark.operators.sketches import (
        M_REGS,
        REG_BITS,
        _require_integral_key,
        hll_hash,
        hll_rho,
    )
    from queens_spark.operators.text import let_bound

    _require_integral_key(events, key_col)
    x = let_bound(
        hll_hash(key_col),
        lambda h: F.struct(
            (h % M_REGS).alias("reg"),
            hll_rho(F.shiftright(h, REG_BITS)).alias("rho"),
        ),
    )
    return (
        events.withWatermark("event_time", watermark)
        .select("event_time", "event_type", x.alias("x"))
        .groupBy(
            F.window("event_time", window).alias("w"),
            F.col("event_type"),
            F.col("x.reg").alias("reg"),
        )
        .agg(F.max("x.rho").alias("rho"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "reg", "rho",
        )
    )


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the documents table (schema probed from
    the existing parquet; single-file inputs get the symlink-dir
    wrapping, as :func:`read_events_stream`)."""
    import os

    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        import tempfile

        d = tempfile.mkdtemp(prefix="qs_stream_")
        os.symlink(
            os.path.abspath(path), os.path.join(d, os.path.basename(path))
        )
        path = d
    return spark.readStream.schema(schema).parquet(path)


def novelty_filter(
    stream_docs: DataFrame,
    history_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming novelty gate: emit only incoming documents whose
    normalized content fingerprint has NEVER been seen in the static
    historical corpus — the ingest-time exact-dedup of a continuously
    fed training pipeline, as a stream-static LEFT ANTI join (append
    mode, no state: the static side carries the history).

    Scale shape: the static side is reduced to DISTINCT fingerprints
    (16 bytes/doc). Structured Streaming re-plans the static side per
    micro-batch, so at 100 TB of history you'd pin it with a persisted
    fingerprint table (or put operators/dedup.py's Bloom prefilter in
    front, exactly as decontaminate does); the join itself stays the
    same plan. Duplicates WITHIN one stream are intentionally both
    emitted — novelty is defined against history, and the batch twin
    (NOT EXISTS) agrees.
    """
    from queens_spark.operators.text import doc_fingerprint

    hist = (
        history_docs.select(
            doc_fingerprint(text_col).alias("fingerprint")
        ).distinct()
    )
    return (
        stream_docs.select(
            F.col(id_col), doc_fingerprint(text_col).alias("fingerprint")
        ).join(hist, "fingerprint", "left_anti")
    )
