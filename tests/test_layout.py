"""Z-order layout contract: the whole point of Morton clustering is
that min/max segment stats prune on BOTH dimensions. Write the same
table twice (linear orderkey-sorted vs z-ordered), read the stats
sidecars, and count segments a 2-D rectangle predicate can skip —
z-order must skip strictly more.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.operators.layout import morton_code, zorder_by

SF = "/root/testdata/sf0.01"
SEG_BYTES = 64 * 1024
P_LO, P_HI, S_LO, S_HI = 200, 599, 20, 49


def _write(spark, df, path):
    from libcolumnfile_spark.sources.columnfile.datasource import register

    register(spark)
    df.write.format("columnfile").option("segment_bytes", str(SEG_BYTES)).mode(
        "overwrite"
    ).save(path)


def _skippable(path) -> tuple[int, int]:
    total = skip = 0
    for sidecar in glob.glob(os.path.join(path, "*.col.stats.json")):
        for seg in json.load(open(sidecar))["segments"]:
            total += 1
            cols = seg["columns"]
            pk, sk = cols["l_partkey"], cols["l_suppkey"]
            if (
                pk["min"] > P_HI
                or pk["max"] < P_LO
                or sk["min"] > S_HI
                or sk["max"] < S_LO
            ):
                skip += 1
    return total, skip


@pytest.fixture(scope="module")
def datasets(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from libcolumnfile_spark.tables import load_table

    d = tmp_path_factory.mktemp("layout")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    linear = str(d / "linear")
    zord = str(d / "zorder")
    # single writer task each so segments reflect the global order
    _write(spark, li.orderBy("l_orderkey").coalesce(1), linear)
    _write(
        spark,
        li.withColumn("__z", morton_code(F.col("l_partkey"), F.col("l_suppkey")))
        .orderBy("__z")
        .drop("__z")
        .coalesce(1),
        zord,
    )
    return linear, zord


def test_zorder_prunes_more_segments(datasets):
    linear, zord = datasets
    lt, ls = _skippable(linear)
    zt, zs = _skippable(zord)
    assert lt > 4 and zt > 4, f"need multi-segment files (got {lt}, {zt})"
    # linear orderkey order is uncorrelated with (partkey, suppkey):
    # essentially nothing prunes; the z-curve gives each segment a small
    # rectangle so most segments fall outside the query box
    assert zs / zt >= 0.5, f"z-order skipped only {zs}/{zt}"
    assert zs / zt > ls / lt + 0.3, (
        f"z-order must out-prune linear: z {zs}/{zt} vs linear {ls}/{lt}"
    )


def test_morton_code_interleaves():
    # bit-level unit check via a tiny dataframe
    import pyspark.sql.functions as F

    from libcolumnfile_spark.session import get_spark

    spark = get_spark("layout-test")
    rows = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (1, 1, 3), (2, 3, 0b1110), (5, 0, 0b010001)]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], "a bigint, b bigint"
    ).withColumn("z", morton_code(F.col("a"), F.col("b")))
    got = [r["z"] for r in df.collect()]
    assert got == [z for _, _, z in rows]


def test_zorder_by_preserves_rows(spark):
    from libcolumnfile_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    z = zorder_by(li, "l_partkey", "l_suppkey")
    assert z.count() == li.count()
    assert sorted(z.columns) == sorted(li.columns)
