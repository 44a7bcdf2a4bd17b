"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

A table sorted on ONE key gives tight min/max bounds — and segment/
row-group skipping — for that key only; predicates on a second column
scan everything. Interleaving the bits of two keys (Morton / Z-order
curve) gives every segment a small rectangle in (c1, c2) space, so
min/max stats prune segments for predicates on EITHER or BOTH columns.
This is the standard lakehouse layout technique (Delta/Iceberg
`ZORDER BY`) re-expressed as a plain sort expression — it composes with
any min/max-stats format: our columnfile sidecar (stats.py), parquet
row groups, ORC stripes.

Scale notes: the z-value is a pure map expression; the clustered write
is `repartitionByRange(z) + sortWithinPartitions(z)` — a single range
shuffle, no global sort materialization. The declared query's result is
layout-INVARIANT (same rows any order) — the oracle checks correctness
while the layout effect is pinned by tests/test_layout.py, which counts
skippable segments from the stats sidecar: z-ordered segments prune on
both dimensions, linear order only on the leading key.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import T, query


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.
    A static shift/mask expression tree (2*bits terms) — whole-stage
    codegens, no UDF.

    DOMAIN LIMIT: keys >= 2**bits alias onto the same interleaved range
    (high bits are dropped), which silently degrades clustering quality
    — correctness is unaffected (results are layout-invariant) but
    pruning collapses. ``zorder_by(bits=None)`` derives ``bits`` from
    the observed column max at write time to avoid this."""
    a = a.cast("bigint")
    b = b.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_by(df: DataFrame, c1: str, c2: str, bits: int | None = 16) -> DataFrame:
    """Cluster ``df`` along the Z-curve of (c1, c2): one range shuffle +
    in-partition sort (no single-node global sort).

    ``bits=None`` sizes the interleave from the observed column maxima
    (one cheap min/max-only agg at write time — layout writes are
    one-offs) so large key domains don't silently alias past the
    morton_code 2**bits limit."""
    if bits is None:
        mx = df.agg(
            F.max(F.col(c1).cast("bigint")).alias("m1"),
            F.max(F.col(c2).cast("bigint")).alias("m2"),
        ).first()
        top = max(mx["m1"] or 0, mx["m2"] or 0, 1)
        # cap at 31: with bits=32 the second key's bit 31 would land on
        # bigint bit 63 (the sign bit), making large-domain z-codes
        # negative and sorting them BEFORE small ones — clustering
        # quality loss, though results stay layout-invariant
        bits = min(31, max(1, int(top).bit_length()))
    z = morton_code(F.col(c1), F.col(c2), bits).alias("__z")
    from libcolumnfile_spark.session import default_parallelism

    return (
        df.withColumn("__z", z)
        .repartitionByRange(default_parallelism(), "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


@query(
    "q_zorder_filter",
    oracle=(
        "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem "
        "WHERE l_partkey BETWEEN 20 AND 79 AND l_suppkey BETWEEN 2 AND 5"
    ),
    doc=(
        "2-D predicate over a Z-ordered columnfile dataset: lineitem is "
        "clustered along the Morton curve of (l_partkey, l_suppkey) at "
        "write time (cached fixture), so the rectangle predicate prunes "
        "most segments via the min/max sidecar on BOTH columns. The "
        "result is layout-invariant (oracle = plain filter on the "
        "original parquet); the pruning advantage itself is pinned by "
        "tests/test_layout.py."
    ),
    tags=("columnfile", "layout", "pushdown"),
)
def q_zorder_filter(spark, sf_dir):
    df = zorder_table(spark, sf_dir, "lineitem", "l_partkey", "l_suppkey")
    return df.filter(
        F.col("l_partkey").between(20, 79) & F.col("l_suppkey").between(2, 5)
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")


def zorder_table(
    spark,
    sf_dir: str,
    name: str,
    c1: str,
    c2: str,
    segment_bytes: int = 256 * 1024,
) -> DataFrame:
    """Columnfile dataset of a fixture table clustered by morton(c1,c2),
    converted once and cached (same contract as columnfile_table)."""
    import hashlib

    from libcolumnfile_spark.cache import cache_path
    from libcolumnfile_spark.sources.columnfile.datasource import (
        MANIFEST_FILE,
        register,
    )
    from libcolumnfile_spark.sources.columnfile.fs import fs_exists, fs_join
    from libcolumnfile_spark.sources.columnfile.queries import (
        _parallel_partition_bytes,
    )
    from libcolumnfile_spark.tables import load_table

    register(spark)
    key = hashlib.sha1(f"{sf_dir}|z|{name}|{c1}|{c2}".encode()).hexdigest()[:12]
    path = cache_path("colcache", key, f"{name}_zorder")
    if not fs_exists(fs_join(path, MANIFEST_FILE)):
        zorder_by(load_table(spark, sf_dir, name), c1, c2).write.format(
            "columnfile"
        ).option("segment_bytes", str(segment_bytes)).mode("overwrite").save(path)
    return (
        spark.read.format("columnfile")
        .option("partition_bytes", str(_parallel_partition_bytes(path)))
        .load(path)
    )
