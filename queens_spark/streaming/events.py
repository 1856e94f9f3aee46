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

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: Parquet stream sources need an explicit schema; ts arrives as raw
#: nanos (see queries.load) and is converted to a microsecond
#: timestamp in event_time.
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a
    watermark for late data. Streaming state: |event_types| × live
    windows."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
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
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming twin of
    batch q34_sessionize. Native ``session_window`` keeps state only
    for open sessions."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.session_window("event_time", gap).alias("s"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("user_id"),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events", "session_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (backfill/test mode) into an in-memory sink; returns the result
    as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
