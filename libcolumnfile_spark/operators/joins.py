"""Extended join operators beyond plain equi-joins: as-of joins and
range (interval) joins — the time-series surface a training-data /
telemetry pipeline needs (absent in the reference, which has no joins
at all; standard-engine extension per SURVEY.md §2.2).

Scale design:
- as-of join via union + carry-forward window: ONE shuffle on the key,
  no point-in-time self-join explosion. This is the classic distributed
  as-of formulation (a sort-merge within each key partition); at 100 TB
  it scales exactly like any windowed aggregation. The naive
  alternative (theta self-join ts_r <= ts_l) is quadratic per key.
- range join via equi-key + bounded interval predicate: Catalyst plans
  the user_id equality as the shuffle key and evaluates the interval
  as a join residual — candidate pairs are bounded per key, never a
  cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts (direction='backward'), per key.

    Implementation: tag both sides, union, and carry the right side's
    values forward with a last(ignorenulls) window ordered by
    (ts, side) — right rows at an equal timestamp sort before left
    rows, so ties are INCLUSIVE (matches ASOF JOIN ... ON l.ts >= r.ts).
    One shuffle on the key; no self-join.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    lcols = left.columns

    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            tagged_left.schema["__row"].dataType
        ).alias("__row"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__row",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def range_join_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_minutes: int = 5,
) -> DataFrame:
    """Pairs of rows with the same key whose timestamps fall within
    ``max_gap_minutes`` (a < b). Equi-join on the key carries the
    shuffle; the interval predicate is the join residual."""
    a = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_a"),
        F.col(ts_col).alias("ts_a"),
    )
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("id_b"),
        F.col(ts_col).alias("ts_b"),
    )
    from libcolumnfile_spark.tables import spread

    # the probe side evaluates the interval residual against every
    # same-key row (~|key group| probes per row) — rebalance single-split
    # inputs so that map stage parallelizes (no-op at scale)
    a = spread(a)
    gap = F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
    return (
        a.join(
            b,
            (a.k == b.k)
            & (F.col("id_a") < F.col("id_b"))
            & (F.col("ts_b") >= F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + gap),
        )
        .select(a.k.alias(key_col), "id_a", "id_b")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side's hot keys are split
    across ``n_salts`` shuffle partitions; the dim side is replicated
    once per salt so every (key, salt) bucket still finds its match.

    Result is row-identical to ``fact.join(dim, fact[k]==dim[k], how)``
    — salting only changes the partitioning, never the semantics.

    When to use: a shuffle join where one fact key dominates (power-law
    user/item ids) and a single reducer would own the hot key. AQE's
    skewJoin handles the sort-merge case automatically at runtime;
    explicit salting is for when the skew is known ahead of time, the
    join is shuffle-hash, or AQE splitting is unavailable (e.g. inside
    a streaming micro-batch). Cost: dim shuffle volume × n_salts —
    keep the salted side the small one.

    Supported ``how``: inner / left (dim-preserving variants would need
    the salt on the other side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # deterministic salt from the full fact row is not needed — any
    # spread works; hash the key with a per-row disambiguator when one
    # exists, else a round-robin on monotonically_increasing_id would
    # do. xxhash64 of all fact columns keeps it deterministic.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint"))
        ),
    )
    out = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
        how,
    )
    return out.drop("__salt")


# ---------------------------------------------------------------------------
# Bucketed (pre-partitioned) co-located joins
# ---------------------------------------------------------------------------




def ensure_bucketed(
    spark,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> str:
    """Idempotent bucketed copy of a fixture table; returns the catalog
    table name.

    Storage-level bucketing is the pre-partitioning strategy for joins
    that repeat on the same key: both sides are written hash-clustered
    (and sorted) by the key, so every future sort-merge join on it reads
    co-located buckets with NO exchange on either side — at 100 TB that
    is the difference between re-shuffling the fact table on every query
    and shuffling it once at write time. (Spark still plans a
    per-partition Sort node, but over the presorted single-file-per-
    bucket runs it streams; the shuffle is the cost that matters.) The
    repartition before write yields exactly one file per bucket.

    Files are cached under SPARK_GRAFT_CACHE_DIR keyed by sf_dir (same
    convention as sources/stock.py); the in-memory catalog entry is
    recreated per session via CREATE TABLE ... CLUSTERED BY ... LOCATION.
    """
    import hashlib

    from libcolumnfile_spark.cache import cache_has, cache_path
    from libcolumnfile_spark.tables import load_table

    sfkey = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    tbl = f"bkt_{table}_{sfkey}"
    if spark.catalog.tableExists(tbl):
        return tbl
    path = cache_path("bucketed", sfkey, table)
    src = load_table(spark, sf_dir, table)
    if cache_has("bucketed", sfkey, table, "_SUCCESS"):
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
        )
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
    else:
        (
            src.repartition(n_buckets, F.col(key))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(tbl)
        )
    return tbl
