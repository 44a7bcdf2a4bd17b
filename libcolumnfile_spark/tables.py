"""Table registry over the driver fixtures (TESTDATA.md).

Tables are one parquet file each under an sf dir. At 100 TB each "table"
would be a partitioned parquet/columnfile dataset; nothing here assumes a
single file — ``spark.read.parquet`` takes directories and globs equally.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables that are always small relative to the fact tables and
# should be broadcast in joins (the star-schema dim side).
BROADCAST_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on, set defensively because the
    caller (e.g. the verification driver) may pass a vanilla session:
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
      parquet reader otherwise rejects outright;
    - UTC session timezone: deterministic date/window semantics matching
      the DuckDB oracle's naive timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Parquet TIMESTAMP(NANOS) columns surface as int64 under
    # spark.sql.legacy.parquet.nanosAsLong (session.py); convert to
    # microsecond timestamps (DuckDB's TIMESTAMP precision) here so every
    # consumer sees proper TimestampType.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    ts_cols = {"events": ["ts"], "orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}
    for c in ts_cols.get(name, []):
        if isinstance(df.schema[c].dataType, LongType):
            # integer DIV: float division would lose precision above 2^53 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df


# Spark's file-split planner floors split size at openCostInBytes (4 MB
# default) — the same constant estimates planned scan parallelism below.
_OPEN_COST_BYTES = 4 * 1024 * 1024


def spread(df: DataFrame) -> DataFrame:
    """Repartition iff the input plans fewer scan partitions than cores.

    Few-split inputs (one file with one parquet row group — the bench
    fixtures; also any small-files corner at real scale) starve the map
    stage: every downstream map-side operator (broadcast-join probes,
    signature kernels, partial aggregates) runs on a handful of tasks.
    One round-robin exchange buys a fully parallel map stage. At 100 TB
    the file-split planner already provides >= cores partitions and this
    is a no-op — the guard makes it safe to apply unconditionally to any
    compute-heavy map stage.

    The partition estimate comes from input file sizes (the same
    bytes/openCost split formula the planner uses), NOT from
    ``df.rdd.getNumPartitions()`` — converting the plan to an RDD costs
    ~80 ms per fresh DataFrame plus a ~1 s first-call hit, which taxed
    every operator invocation; ``inputFiles()`` only needs analysis
    (~30 ms). Non-file inputs fall back to the RDD check.
    """
    from libcolumnfile_spark.session import default_parallelism

    n = default_parallelism()
    try:
        files = df.inputFiles()
        if not files:
            raise ValueError("no input files")
        total = 0
        for f in files:
            p = urlparse(f)
            if p.scheme in ("file", ""):
                total += os.path.getsize(unquote(p.path))
            else:
                # remote scheme: size via the fs layer (pyarrow-native),
                # keeping the cheap inputFiles() estimate instead of the
                # ~1 s df.rdd fallback exactly where remote FS matters
                from libcolumnfile_spark.sources.columnfile.fs import fs_size

                total += fs_size(f)
        est = max(len(files), total // _OPEN_COST_BYTES + 1)
    except Exception:
        est = df.rdd.getNumPartitions()
    return df.repartition(n) if est < n else df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast hint iff the frame's input files total under the
    session's autoBroadcastJoinThreshold — size-measured, never assumed.

    Why it exists: deep join chains lose static size estimates (the
    planner can't see through an upstream join), so an unhinted small
    dim falls to sort-merge until AQE converts it — after the fact
    side's shuffle write has already been paid. A FORCED hint is worse:
    it OOMs when the side scales (the x100 probe caught exactly that).
    This helper hints from the measured file size: small dim -> static
    broadcast plan; big dim (or un-sizable derived input) -> no hint,
    the size-based planner + AQE decide.

    PRECONDITION: the frame must be non-amplifying over its one input
    (scan + filter/project/aggregate) — only then do the leaf file bytes
    upper-bound the broadcast size. Row-amplifying plans (joins, explode
    /Generate, grouping-set Expand, unions) would be under-estimated, so
    the guard below detects them (multi-leaf plan, or Generate/Expand in
    a single-leaf plan) and returns the frame unhinted.
    """
    from pyspark.sql import functions as F

    try:
        threshold = int(df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
        if threshold <= 0:
            return df
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.collectLeaves().size() > 1:
            return df  # join/union: file bytes no longer bound the output
        files = df.inputFiles()
        if not files:
            return df
        # single-leaf plans are a handful of nodes; the render is cheap
        tree = analyzed.treeString()
        if "Generate " in tree or "Expand " in tree:
            return df  # explode / grouping-sets amplify rows past the bound
        total = 0
        for f in files:
            p = urlparse(f)
            if p.scheme in ("file", ""):
                total += os.path.getsize(unquote(p.path))
            else:
                from libcolumnfile_spark.sources.columnfile.fs import fs_size

                total += fs_size(f)
        # parquet decompresses 2-5x, and the hash-relation build adds
        # overhead on top — require 8x headroom so only genuinely
        # dim-sized inputs hint (at sf0.1: orders 2.7 MB and below hint,
        # the 10.8 MB lineitem fact does not)
        if 0 < total * 8 <= threshold:
            return F.broadcast(df)
    except Exception:
        pass
    return df
