"""Reference list-shredding (capnp) layout compatibility.

The reference stores List(T) as a u64-LE count column followed by
element values as EXTRA ROWS in the child columns, breadth-first
(src/columnfile-capnp.cc:76-92). These tests synthesize files in that
convention BY HAND (independent of our capnp writer) and check the
DataSource reassembles them; plus full Spark write/read roundtrips in
capnp mode, nested lists, and empty/null edge cases.
"""

from __future__ import annotations

import struct
import sys
import tempfile
import os

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from libcolumnfile_spark.sources.columnfile import register
from libcolumnfile_spark.sources.columnfile.capnp import (
    field_count,
    flatten_schema_capnp,
    write_rows_capnp,
)
from libcolumnfile_spark.sources.columnfile.format import ColumnFileWriter


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField(
            "tags",
            ArrayType(
                StructType(
                    [StructField("k", StringType()), StructField("v", IntegerType())]
                )
            ),
        ),
    ]
)


def test_field_count_matches_reference_semantics():
    # id -> 1; tags -> count col + (k, v) = 3
    assert field_count(SCHEMA) == 4
    leaves = [n for n, _ in flatten_schema_capnp(SCHEMA)]
    assert leaves == ["id", "tags#count", "tags#elem.k", "tags#elem.v"]


def _write_reference_convention_file(path: str) -> list[tuple]:
    """Hand-written Put() sequence exactly as the reference's
    WriteMessageToColumnFile would emit for three messages — independent
    of capnp.write_rows_capnp, so the test pins the CONVENTION."""
    u64 = struct.Struct("<Q").pack
    i32 = struct.Struct("<i").pack
    w = ColumnFileWriter(path, compression="lz4")
    rows = [
        (1, [("a", 10), ("b", 20)]),
        (2, []),
        (3, [("c", 30)]),
    ]
    for rid, tags in rows:
        w.put(0, i32(rid))           # scalar field, column 0
        w.put(1, u64(len(tags)))     # list size, column 1 (u64 LE)
        for k, v in tags:            # elements as extra rows in cols 2,3
            w.put(2, k.encode())
            w.put(3, i32(v))
        w.add_rows(1)
    w.flush()
    w.finalize()
    return [(rid, [{"k": k, "v": v} for k, v in tags]) for rid, tags in rows]


def test_read_reference_convention_file(spark, tmp_path):
    f = str(tmp_path / "ref.col")
    expected = _write_reference_convention_file(f)
    df = (
        spark.read.format("columnfile")
        .schema(SCHEMA)
        .option("list_layout", "capnp")
        .load(f)
    )
    got = sorted(
        (r.id, [{"k": t.k, "v": t.v} for t in r.tags]) for r in df.collect()
    )
    assert got == sorted(expected)


def test_capnp_roundtrip_via_spark(spark, tmp_path):
    path = str(tmp_path / "ds")
    src = spark.createDataFrame(
        [
            (1, [{"k": "a", "v": 10}, {"k": "b", "v": 20}]),
            (2, []),
            (3, None),
            # NOTE an element with ALL fields null would reassemble as a
            # null struct — the same shredding ambiguity the reference
            # has (columnfile-capnp.cc:157-256) and the cell layout keeps
            (4, [{"k": None, "v": 40}]),
        ],
        SCHEMA,
    )
    src.write.format("columnfile").option("list_layout", "capnp").mode(
        "overwrite"
    ).save(path)
    # sidecar records the layout: no option needed on read
    back = spark.read.format("columnfile").load(path)
    assert back.schema == src.schema
    key = lambda r: r[0]
    assert sorted((tuple(r) for r in back.collect()), key=key) == sorted(
        (tuple(r) for r in src.collect()), key=key
    )


def test_capnp_scalar_list_extension(spark, tmp_path):
    # the reference rejects scalar-element lists; we support them
    path = str(tmp_path / "scal")
    schema = StructType(
        [StructField("id", LongType()), StructField("xs", ArrayType(LongType()))]
    )
    src = spark.createDataFrame([(1, [7, 8, 9]), (2, []), (3, [5])], schema)
    src.write.format("columnfile").option("list_layout", "capnp").mode(
        "overwrite"
    ).save(path)
    back = spark.read.format("columnfile").load(path)
    assert sorted((r.id, list(r.xs)) for r in back.collect()) == [
        (1, [7, 8, 9]),
        (2, []),
        (3, [5]),
    ]


def test_capnp_nested_list_of_list(spark, tmp_path):
    path = str(tmp_path / "nest")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("m", ArrayType(ArrayType(LongType()))),
        ]
    )
    data = [(1, [[1, 2], [3]]), (2, [[]]), (3, [])]
    src = spark.createDataFrame(data, schema)
    src.write.format("columnfile").option("list_layout", "capnp").mode(
        "overwrite"
    ).save(path)
    back = spark.read.format("columnfile").load(path)
    got = sorted((r.id, [list(x) for x in r.m]) for r in back.collect())
    assert got == [(1, [[1, 2], [3]]), (2, [[]]), (3, [])]


def test_capnp_column_pruning(spark, tmp_path):
    """Projecting only the scalar column must not decode element leaves."""
    path = str(tmp_path / "prune")
    src = spark.createDataFrame(
        [(1, [{"k": "a", "v": 10}]), (2, [{"k": "b", "v": 20}])], SCHEMA
    )
    src.write.format("columnfile").option("list_layout", "capnp").mode(
        "overwrite"
    ).save(path)
    got = spark.read.format("columnfile").load(path).select("id").collect()
    assert sorted(r.id for r in got) == [1, 2]


def test_write_rows_capnp_breadth_first_matches_hand_layout(tmp_path):
    """Our capnp writer must emit the exact same byte layout as the
    hand-written reference convention."""
    a, b = str(tmp_path / "a.col"), str(tmp_path / "b.col")
    _write_reference_convention_file(a)
    w = ColumnFileWriter(b, compression="lz4")
    write_rows_capnp(
        w,
        SCHEMA,
        [
            {"id": 1, "tags": [{"k": "a", "v": 10}, {"k": "b", "v": 20}]},
            {"id": 2, "tags": []},
            {"id": 3, "tags": [{"k": "c", "v": 30}]},
        ],
    )
    w.flush()
    w.finalize()
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
