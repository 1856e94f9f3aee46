"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the same settings are the ones we
would ship to a real cluster (AQE, skew-join handling, partition-size
targets). Nothing here is local-mode-specific except the master URL,
which is taken from the environment so a cluster deployment overrides
it without code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale: AQE re-plans at runtime (coalesces tiny
# shuffle partitions, splits skewed ones, converts sort-merge joins to
# broadcast when the built side turns out small); 128 MiB scan
# partitions keep task counts proportional to data volume.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let the planner pick a shuffled-hash join when its size
    # conditions are met (guide §3.1/§9): both sides shuffle either
    # way, but building a hash table per partition skips the
    # sort-merge's two sorts. Size gating is the planner's (and at
    # runtime AQE's) — a build side too big for one partition keeps
    # sort-merge, so this is scale-safe, not a local[32] tune.
    # Measured head-to-head (alternating in one session, best-of-8):
    # q85 1.95->1.31s, q63 1.62->1.27s, q61 0.95->0.83s,
    # q135 1.79->1.59s, q07 1.71->1.62s, q39/q93 neutral.
    "spark.sql.join.preferSortMergeJoin": "false",
    # The AQE complement (guide §3.1): convert a planned sort-merge
    # join to shuffled-hash AT RUNTIME when every post-shuffle
    # partition's build side is under this bound — gated on ACTUAL
    # sizes, so it is safe at any scale (default 0 = never). 64 MiB
    # matches the autoBroadcastJoinThreshold above. Measured
    # alternating best-of-4: q27 1.99->1.25s, q63 1.20->0.91s,
    # q95 2.26->1.75s, q85 1.15->0.93s, q61 0.84->0.71s,
    # q135 1.36->1.15s, q07 1.35->1.22s.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(
        64 * 1024 * 1024
    ),
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Partitioned-parquet writes from staging overwrite only the
    # partitions present in the incoming frame.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Logical-table names like "1.1" must stay strings when read back
    # from partition directories, not be inferred as doubles.
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    # Driver bookkeeping is bounded (guide §5: the driver should do no
    # data work — that includes not hoarding metadata). The defaults
    # retain 1000 SQL executions' full plan graphs plus 1000 jobs /
    # 1000 stages / 100k tasks of UI state in the driver heap; a
    # many-query session (the 206-query catalog sweep, long-lived
    # services) accumulates hundreds of MB of old-gen garbage, and GC
    # pauses grow over the session's life. Observability at scale
    # belongs to the event log / history server, not unbounded
    # in-driver retention.
    "spark.sql.ui.retainedExecutions": "32",
    "spark.ui.retainedJobs": "200",
    "spark.ui.retainedStages": "200",
    "spark.ui.retainedTasks": "5000",
    "spark.ui.retainedDeadExecutors": "5",
    # The ContextCleaner only reclaims broadcast blocks / accumulators
    # after a driver GC notices they are unreachable; the default
    # periodic-GC interval (30 min) lets a query-dense session pile up
    # shuffle and broadcast state for its whole life. 5 min bounds the
    # pile without measurable pause cost.
    "spark.cleaner.periodicGC.interval": "5min",
}


def ensure_min_partitions(df, target: int | None = None):
    """Spread *df* over at least ``target`` partitions (default: the
    cluster's default parallelism) — a guard for per-row-heavy
    operators (shingling, hashing, vector math).

    Small single-row-group parquet files scan as ONE partition, which
    would serialize the whole compute on one core; a round-robin
    repartition of a small input is far cheaper than that. At real
    scale the scan already yields >= target partitions and this is a
    no-op, so no shuffle is ever added to a 100 TB input.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(app_name: str = "queens_spark", **overrides: str) -> SparkSession:
    """Return (or create) the singleton SparkSession.

    Master resolution order: explicit ``overrides['spark.master']``,
    ``$SPARK_GRAFT_MASTER``, then ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
