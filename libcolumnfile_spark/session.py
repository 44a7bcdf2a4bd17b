"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration scales to a real cluster because every knob here is about the
*plan* (AQE, broadcast threshold, shuffle partitions), not local mode.

Scale design notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace hand-tuned partition counts.
- Broadcast threshold 64 MB: the dimension tables of a star schema
  (region/nation/customer at any realistic SF for the dim side) broadcast
  instead of shuffling the 100 TB fact table.
- Arrow enabled: every Python<->JVM crossing (pandas UDFs, toPandas,
  Python DataSource) is Arrow-batched, never per-row pickled.
- Session timezone UTC: deterministic date/window semantics across
  engines and executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "libcolumnfile-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def configure(builder: SparkSession.Builder, shuffle_partitions: int | None = None) -> SparkSession.Builder:
    """Apply engine configuration to an existing builder."""
    cpus = default_parallelism()
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Byte-based reduce-stage coalescing (parallelismFirst=false +
        # 8 MB advisory). History: round 3 kept parallelismFirst=true
        # because `false` + 64 MB starved compute-dense token stages
        # (q_tfidf x10 1.8->4+) — but that was measured when every scan
        # entered through spread()'s round-robin exchange. With the
        # round-4 split-layout cache the MAP side is natively parallel
        # and unaffected by reduce coalescing; `false` + the small 8 MB
        # advisory coalesces only micro reduce stages (a 3 MB window
        # sort doesn't need 32 tasks). 8 MB measured ~8% off the mixed
        # bench subset but pushed q_gap_fill's x10 ratio 3.1->5.2 (its
        # 36 MB x10 grid join coalesced to ~5 tasks); 4 MB keeps every
        # x10 contract green (gap_fill 3.0) with most of the win. At
        # real scale reduce stages exceed the advisory and keep width.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(4 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized parquet
        # reader rejects; read as int64 nanos and convert in tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )


def get_spark(app_name: str = DEFAULT_APP_NAME, master: str | None = None) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; on a cluster pass
    ``None`` after setting spark.master externally, or an explicit URL.
    """
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{default_parallelism()}]")
    # local mode: the driver JVM IS the executor; the 1g default heap is
    # undersized for 32 task threads (GC thrash — full bench 37s vs 28s —
    # and broadcast-build OOMs: a 10x-documents LSH verify join failed
    # outright). 4g measured best; much larger heaps (8-32g) regressed
    # small queries (G1 region-size ergonomics). Only effective before
    # the JVM starts — a cluster deployment sets executor/driver memory
    # in spark-submit instead.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
    )
    # This engine's surface is ~70 distinct query shapes × several codegen
    # stages each; the default generated-class cache (100 entries,
    # spark.sql.codegen.cache.maxEntries — a STATIC conf, so it must be set
    # before the JVM session exists) evicts mid-suite and forces janino
    # recompilation of hot plans, and the JIT code cache fills with the
    # churned classes. Both showed up as run-over-run degradation in
    # bench.py (q_cube 1.9s -> 10.4s median on a later pass).
    builder = builder.config("spark.sql.codegen.cache.maxEntries", "5000")
    builder = builder.config(
        "spark.driver.extraJavaOptions",
        "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
    )
    builder = configure(builder)
    return builder.getOrCreate()


def release_checkpoint(df) -> None:
    """Release a SUPERSEDED localCheckpoint's storage blocks NOW.

    Dataset.unpersist() is a no-op for checkpoint blocks: it only drops
    CacheManager entries, and a localCheckpointed Dataset's blocks live
    on the internal RDD, not in the CacheManager (verified on PySpark
    4.1.2: the RDD stays in ``getPersistentRDDs`` after a blocking
    ``df.unpersist()``). The real handle is the LogicalRDD plan node's
    RDD — reach it through the JVM plan and unpersist THAT. After this
    call the DataFrame is unusable (lineage was truncated at checkpoint
    time), so only ever call it on a checkpoint no future plan reads —
    e.g. iteration t's state once iteration t+1's checkpoint has
    materialized.

    Best-effort: LogicalRDD's accessor is not a public API, so any py4j
    surprise degrades to leaving the blocks for the ContextCleaner (the
    pre-round-9 behavior) rather than failing the query.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover - defensive against API drift
        df.unpersist(blocking=False)
