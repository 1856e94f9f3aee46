"""Checkpointed-sink restart recovery: process half the input, stop,
resume with the same checkpoint, and prove (a) no re-emission of
already-sunk rows, (b) state spanning the stop (open windows,
first-seen keys) is RESTORED, not recomputed — the final table equals
the batch twin over the full input."""

from datetime import datetime

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.streaming.events import (
    first_seen,
    novelty_filter,
    run_to_table,
    windowed_counts,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=float(v))
         for i, ts, u, t, v in rows]
    ).write.mode("append").parquet(path)


def _stream(spark, path):
    df = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .parquet(path)
    )
    return df.withColumn("event_time", F.col("ts"))


def test_windowed_counts_restart_recovers_open_window(spark, tmp_path):
    """The 10:00-11:00 window has events in BOTH halves: run 1 leaves
    it open in state; run 2 must restore that state and emit the
    MERGED count — a recompute-from-scratch or lost-state resume
    would double-count or undercount it."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    h = lambda hh, mm: datetime(2024, 1, 1, hh, mm)
    half1 = [
        (1, h(9, 15), 1, "view", 1.0),
        (2, h(9, 45), 2, "view", 2.0),
        (3, h(10, 10), 1, "click", 3.0),   # window 10-11, first half
    ]
    half2 = [
        (4, h(10, 50), 2, "click", 4.0),   # window 10-11, second half
        (5, h(11, 20), 1, "view", 5.0),
        # sentinel far past every real window + watermark: advances
        # the final watermark so all real windows flush to the sink
        (6, h(23, 0), 9, "__flush", 0.0),
    ]

    _write_events(spark, src, half1)
    wc = lambda: windowed_counts(
        _stream(spark, src), window="1 hour", watermark="30 minutes",
        value_col=F.col("value").cast("decimal(20,2)"),
    )
    run_to_table(wc(), out, ckpt, query_name="wc_r1")
    mid = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in spark.read.parquet(out).collect()}
    # 10-11 is still open (watermark = 10:10 - 30m) — not yet emitted
    assert (h(10, 0), "click") not in mid

    _write_events(spark, src, half2)
    run_to_table(wc(), out, ckpt, query_name="wc_r2")

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"],
                                               r["total_value"])
        for r in spark.read.parquet(out)
        .where(F.col("event_type") != "__flush").collect()
    }
    batch = spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=t, value=float(v))
         for i, ts, u, t, v in half1 + half2]
    ).where(F.col("event_type") != "__flush")
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["tv"])
        for r in batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)")).alias("tv"),
        ).collect()
    }
    assert got == want
    # the spanning window merged across the restart: 2 clicks
    assert got[(h(10, 0), "click")][0] == 2


def test_windowed_counts_restart_does_not_reemit(spark, tmp_path):
    """Resuming with the same checkpoint must not re-read processed
    files: every (window, type) appears in the sink exactly once."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    h = lambda hh, mm: datetime(2024, 1, 1, hh, mm)
    _write_events(spark, src, [
        (1, h(9, 15), 1, "view", 1.0), (2, h(12, 0), 2, "view", 2.0)])
    wc = lambda: windowed_counts(
        _stream(spark, src), window="1 hour", watermark="30 minutes",
        value_col=F.col("value").cast("decimal(20,2)"),
    )
    run_to_table(wc(), out, ckpt, query_name="re_r1")
    _write_events(spark, src, [(3, h(23, 0), 9, "__flush", 0.0)])
    run_to_table(wc(), out, ckpt, query_name="re_r2")
    rows = spark.read.parquet(out).where(
        F.col("event_type") != "__flush").collect()
    keys = [(r["window_start"], r["event_type"]) for r in rows]
    assert sorted(keys) == sorted(set(keys))
    assert (h(9, 0), "view") in keys and (h(12, 0), "view") in keys


def test_first_seen_restart_restores_key_state(spark, tmp_path):
    """applyInPandasWithState recovery: keys emitted in run 1 must
    stay suppressed in run 2 (state store restored), new keys emit —
    final sink equals the batch first-occurrence twin."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    h = lambda hh, mm: datetime(2024, 1, 1, hh, mm)
    half1 = [(1, h(9, 0), 1, "view", 0.0), (2, h(9, 5), 2, "view", 0.0)]
    half2 = [
        (3, h(10, 0), 1, "view", 0.0),   # dup of run-1 key: suppressed
        (4, h(10, 5), 1, "click", 0.0),  # new key: emitted
    ]
    _write_events(spark, src, half1)
    fs = lambda: first_seen(
        _stream(spark, src).select("user_id", "event_type", "event_id",
                                   "ts"))
    run_to_table(fs(), out, ckpt, query_name="fs_r1")
    assert spark.read.parquet(out).count() == 2
    _write_events(spark, src, half2)
    run_to_table(fs(), out, ckpt, query_name="fs_r2")
    got = {(r["user_id"], r["event_type"]): r["event_id"]
           for r in spark.read.parquet(out).collect()}
    assert got == {(1, "view"): 1, (2, "view"): 2, (1, "click"): 4}


def test_novelty_gate_restart_exactly_once(spark, tmp_path):
    """Stream-static anti join under restart: the checkpointed source
    log guarantees half-1 docs are not re-emitted on resume; the
    final sink equals the batch NOT-EXISTS twin over the full
    stream."""
    from queens_spark.operators.text import doc_fingerprint

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "docs_ckpt")
    hist = spark.createDataFrame(
        [Row(doc_id=100, text="seen before"),
         Row(doc_id=101, text="also seen")])

    def write_docs(rows):
        spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in rows]
        ).write.mode("append").parquet(src)

    write_docs([(1, "novel one"), (2, "seen before")])
    stream = lambda: (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    nf = lambda: novelty_filter(stream(), hist)
    run_to_table(nf(), out, ckpt, query_name="nv_r1")
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1}
    write_docs([(3, "also seen"), (4, "novel two")])
    run_to_table(nf(), out, ckpt, query_name="nv_r2")
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    all_docs = spark.read.parquet(src)
    want = sorted(
        r["doc_id"] for r in all_docs.select(
            "doc_id", doc_fingerprint("text").alias("fp")
        ).join(
            hist.select(doc_fingerprint("text").alias("fp")).distinct(),
            "fp", "left_anti",
        ).collect()
    )
    assert got == want == [1, 4]


def test_funnel_progress_windowed_and_strict_order(spark, tmp_path):
    """Streaming funnel (the q201 twin): a user advances only on the
    NEXT step's type, strictly after the previous completion and
    within the conversion window; each completion emits exactly one
    row."""
    from queens_spark.streaming.events import funnel_progress

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    h = lambda dd, hh: datetime(2024, 1, dd, hh, 0)
    rows = [
        # user 1 converts fully inside the window
        (1, h(1, 9), 1, "view", 0.0),
        (2, h(1, 10), 1, "click", 0.0),
        (3, h(1, 11), 1, "purchase", 0.0),
        # user 2: click arrives 30 h after the first view — outside
        # the 24 h horizon, never advances past step 1
        (4, h(1, 9), 2, "view", 0.0),
        (5, h(2, 15), 2, "click", 0.0),
        # user 3: click BEFORE any view (strict order) — only the
        # later view counts, as step 1
        (6, h(1, 8), 3, "click", 0.0),
        (7, h(1, 9), 3, "view", 0.0),
        # user 1 duplicate purchase after completion: no re-emit
        (8, h(1, 12), 1, "purchase", 0.0),
    ]
    _write_events(spark, src, rows)
    fp = funnel_progress(
        _stream(spark, src).select(
            "user_id", "event_type", "event_id", "event_time"
        ),
        window_hours=24,
    )
    run_to_table(fp, out, ckpt, query_name="funnel1")
    got = sorted(
        (r["user_id"], r["step"], r["event_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"),
        (3, 1, "view"),
    ]


def test_funnel_progress_restart_restores_progression(spark, tmp_path):
    """Restart recovery: run 1 anchors user 1 at step 1; run 2
    delivers the click — the restored state advances to step 2 with
    the run-1 anchor's window still in force, and the completed
    user's extra events emit nothing."""
    from queens_spark.streaming.events import funnel_progress

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    h = lambda dd, hh: datetime(2024, 1, dd, hh, 0)
    _write_events(spark, src, [
        (1, h(1, 9), 1, "view", 0.0),
        (2, h(1, 9), 2, "view", 0.0),
    ])
    fp = lambda: funnel_progress(
        _stream(spark, src).select(
            "user_id", "event_type", "event_id", "event_time"
        ),
        window_hours=24,
    )
    run_to_table(fp(), out, ckpt, query_name="funnel_r1")
    assert spark.read.parquet(out).count() == 2
    _write_events(spark, src, [
        (3, h(1, 12), 1, "click", 0.0),      # inside user 1's window
        (4, h(2, 15), 2, "click", 0.0),      # outside user 2's window
        (5, h(1, 9), 1, "view", 0.0),        # replayed anchor: no-op
    ])
    run_to_table(fp(), out, ckpt, query_name="funnel_r2")
    got = sorted(
        (r["user_id"], r["step"], r["event_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, 1, "view"), (1, 2, "click"), (2, 1, "view")]


def test_funnel_watermark_eviction_bounds_state(spark, tmp_path):
    """watermark_eviction=True: once the watermark passes a user's
    conversion horizon (anchor + window), their state is evicted via
    the event-time timeout — a later LATE click (behind the
    watermark) finds no anchor and cannot advance, while watermark-
    admitted traffic is unaffected. This is the state bound that
    makes the operator deployable: open-funnel state lives exactly as
    long as the windowed aggregations' watermark says it can
    matter."""
    from queens_spark.streaming.events import funnel_progress

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    h = lambda dd, hh: datetime(2024, 1, dd, hh, 0)
    fp = lambda: funnel_progress(
        _stream(spark, src)
        .withWatermark("event_time", "1 hour")
        .select("user_id", "event_type", "event_id", "event_time"),
        window_hours=24,
        watermark_eviction=True,
    )
    # run 1: user 1 anchors step 1 (horizon = day1 09:00 + 24 h)
    _write_events(spark, src, [(1, h(1, 9), 1, "view", 0.0)])
    run_to_table(fp(), out, ckpt, query_name="fwm1")
    # run 2: far-future traffic pushes the watermark past the horizon
    _write_events(spark, src, [(2, h(10, 0), 99, "view", 0.0)])
    run_to_table(fp(), out, ckpt, query_name="fwm2")
    # run 3: no data for user 1 -> their expired state times out
    _write_events(spark, src, [(3, h(10, 1), 99, "click", 0.0)])
    run_to_table(fp(), out, ckpt, query_name="fwm3")
    # run 4: a LATE click inside user 1's original window arrives —
    # the anchor is gone, so it cannot advance the funnel
    _write_events(spark, src, [(4, h(1, 10), 1, "click", 0.0)])
    run_to_table(fp(), out, ckpt, query_name="fwm4")
    got = sorted(
        (r["user_id"], r["step"], r["event_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, 1, "view"),
        (99, 1, "view"), (99, 2, "click"),
    ]
