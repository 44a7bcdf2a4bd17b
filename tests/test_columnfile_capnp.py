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


# ---------------------------------------------------------------------------
# Unions (BEYOND reference parity — the reference leaves them as a TODO,
# columnfile-capnp.cc:96,205): u16-LE discriminant column + per-arm
# columns, inactive arms NULL. See capnp.py module docstring.
# ---------------------------------------------------------------------------

from libcolumnfile_spark.sources.columnfile.capnp import (  # noqa: E402
    union_field,
)
from libcolumnfile_spark.sources.columnfile.codec import (  # noqa: E402
    ColumnFileFormatError,
)

UNION_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        union_field(
            "contact",
            [
                StructField("phone", StringType(), True),
                StructField("email", StringType(), True),
            ],
        ),
    ]
)

UNION_ROWS = [
    {"id": 1, "contact": {"tag": 0, "phone": "555-1234", "email": None}},
    {"id": 2, "contact": {"tag": 1, "phone": None, "email": "a@b.c"}},
    {"id": 3, "contact": None},  # whole union unset
    {"id": 4, "contact": {"tag": 0, "phone": None, "email": None}},  # Void-ish arm
]


def test_capnp_union_layout_pinned(tmp_path):
    """write_rows_capnp must emit EXACTLY the documented convention:
    col0=id (i64-LE), col1=discriminant (u16-LE / null), col2=phone,
    col3=email, inactive arms null."""
    a, b = str(tmp_path / "a.col"), str(tmp_path / "b.col")

    w = ColumnFileWriter(a, compression="none")
    i64 = struct.Struct("<q").pack
    u16 = struct.Struct("<h").pack
    # row 1: phone arm
    w.put(0, i64(1)); w.put(1, u16(0)); w.put(2, b"555-1234"); w.put_null(3)
    # row 2: email arm
    w.put(0, i64(2)); w.put(1, u16(1)); w.put_null(2); w.put(3, b"a@b.c")
    # row 3: unset union -> discriminant and all arms null
    w.put(0, i64(3)); w.put_null(1); w.put_null(2); w.put_null(3)
    # row 4: phone arm active but value null
    w.put(0, i64(4)); w.put(1, u16(0)); w.put_null(2); w.put_null(3)
    w.add_rows(4)
    w.flush()
    w.finalize()

    wb = ColumnFileWriter(b, compression="none")
    write_rows_capnp(wb, UNION_SCHEMA, UNION_ROWS)
    wb.flush()
    wb.finalize()

    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_capnp_union_roundtrip_via_spark(spark, tmp_path):
    path = str(tmp_path / "uds")
    rows = [
        (1, (0, "555-1234", None)),
        (2, (1, None, "a@b.c")),
        (3, None),
        (4, (0, None, None)),
    ]
    src = spark.createDataFrame(rows, UNION_SCHEMA)
    src.write.format("columnfile").option("list_layout", "capnp").mode(
        "overwrite"
    ).save(path)
    back = spark.read.format("columnfile").load(path)
    key = lambda r: r[0]
    assert sorted((tuple(r) for r in back.collect()), key=key) == sorted(
        (tuple(r) for r in src.collect()), key=key
    )


@pytest.mark.parametrize(
    "bad,msg",
    [
        ({"id": 9, "contact": {"tag": 2, "phone": None, "email": None}},
         "out of range"),
        ({"id": 9, "contact": {"tag": 0, "phone": None, "email": "x@y"}},
         "inactive arm"),
        ({"id": 9, "contact": {"tag": None, "phone": "555", "email": None}},
         "tag is null"),
    ],
)
def test_capnp_union_writer_validates(tmp_path, bad, msg):
    w = ColumnFileWriter(str(tmp_path / "v.col"), compression="none")
    with pytest.raises(ColumnFileFormatError, match=msg):
        write_rows_capnp(w, UNION_SCHEMA, [bad])
