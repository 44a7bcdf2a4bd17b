"""Reference list-shredding layout (Cap'n Proto record shredding).

Reference convention (src/columnfile-capnp.cc:76-92, breadth-first
queue): a ``List`` field at column ``c`` writes ``Put(c, u64-LE element
count)`` and appends its elements as EXTRA ROWS in columns
``c+1 .. c+FieldCount(element)``; nested structs flatten to consecutive
columns (:94-149). Because the writer only flushes between messages,
every message's shredded values land in one segment — segments stay
self-contained, so reassembly is strictly per-segment and cumulative
counts give each row its element slice. That per-segment property is
what lets this layout ride the same InputPartition splitting as the
rectangular one.

Our native layout packs arrays in-cell instead (typed._array_encoder —
segments stay rectangular and cheaper to split; divergence documented
there). This module provides read AND write support for the reference
convention so reference-written nested files reassemble, selected with
``.option("list_layout", "capnp")`` on the columnfile format (the
sidecar records the layout, so reading back our own capnp-mode output
needs no option).

Notes vs the reference:
- the reference rejects lists of scalars ("missing implementation",
  columnfile-capnp.cc:86-90); we support them (count column + one
  element column) as the natural extension.
- capnp unions are a TODO in the reference itself (:96,205 — it only
  iterates getNonUnionFields), so the convention below is BEYOND
  REFERENCE PARITY, designed as the natural extension of the same
  shredding rules: a union field occupies a 16-bit-LE DISCRIMINANT
  column (capnp's own discriminant width) followed by each arm's
  columns in declaration order; per row, the discriminant holds the
  active arm's 0-based index and every inactive arm's leaf columns hold
  NULL (prefix-free with list/struct shredding, and rectangular — one
  value per row per column). An unset union writes NULL to the
  discriminant and all arm columns. Spark-side, a union is a StructType
  field carrying metadata {"capnp_union": true} whose FIRST field is
  ``tag`` (ShortType) and remaining fields are the arms — see
  union_field(). The writer enforces the exactly-one-active-arm
  invariant; the reader is the plain struct reassembly (the layout is
  self-aligned by construction). Byte layout pinned in
  tests/test_columnfile_capnp.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql.types import (
    ArrayType,
    DataType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

from libcolumnfile_spark.sources.columnfile.codec import ColumnFileFormatError
from libcolumnfile_spark.sources.columnfile.typed import (
    _kind_of,
    encoder_for,
)

_COUNT_DT = LongType()  # u64 LE on disk; i64 view is safe for sane counts

UNION_METADATA_KEY = "capnp_union"
_TAG_FIELD = "tag"  # first field of a union struct; ShortType = u16-LE
                    # on disk for the 0..32767 tag range capnp allows


def union_field(name: str, arms: list[StructField]) -> StructField:
    """Declare a capnp-style union field: struct<tag:smallint, arms...>
    tagged with the union metadata the writer validates against."""
    return StructField(
        name,
        StructType([StructField(_TAG_FIELD, ShortType(), True)] + list(arms)),
        True,
        metadata={UNION_METADATA_KEY: True},
    )


def is_union_field(f: StructField) -> bool:
    try:
        if not f.metadata.get(UNION_METADATA_KEY):
            return False
    except Exception:
        return False
    dt = f.dataType
    if not isinstance(dt, StructType) or len(dt.fields) < 2:
        raise ColumnFileFormatError(
            f"union field {f.name!r} must be struct<tag:smallint, arms...>"
        )
    t = dt.fields[0]
    if t.name != _TAG_FIELD or not isinstance(t.dataType, ShortType):
        raise ColumnFileFormatError(
            f"union field {f.name!r}: first field must be {_TAG_FIELD}:smallint"
        )
    return True


def _normalize_union_value(f: StructField, value):
    """Validate + normalize one union cell: returns a list of child
    values [tag, arm0, arm1, ...] with inactive arms forced to None.
    Enforces the exactly-one-active-arm invariant at WRITE time so the
    on-disk layout is canonical (readers may trust discriminants)."""
    dt: StructType = f.dataType
    n_arms = len(dt.fields) - 1
    if value is None:
        return None
    if isinstance(value, dict):
        vals = [value.get(x.name) for x in dt.fields]
    else:
        vals = list(value)
    tag = vals[0]
    if tag is None:
        if any(v is not None for v in vals[1:]):
            raise ColumnFileFormatError(
                f"union {f.name!r}: arm set but {_TAG_FIELD} is null"
            )
        return None
    tag = int(tag)
    if not (0 <= tag < n_arms):
        raise ColumnFileFormatError(
            f"union {f.name!r}: {_TAG_FIELD} {tag} out of range 0..{n_arms - 1}"
        )
    for i, v in enumerate(vals[1:]):
        if i != tag and v is not None:
            raise ColumnFileFormatError(
                f"union {f.name!r}: inactive arm {dt.fields[1 + i].name!r} "
                f"is set while {_TAG_FIELD}={tag}"
            )
    return vals


def field_count(dt: DataType) -> int:
    """On-disk columns a type occupies (reference FieldCount)."""
    if isinstance(dt, StructType):
        return sum(field_count(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return 1 + field_count(dt.elementType)
    return 1


def flatten_schema_capnp(schema: StructType) -> list[tuple[str, DataType]]:
    """Leaf (name, dtype) pairs in reference column order. Array fields
    contribute a ``<name>#count`` LongType leaf followed by the flattened
    element leaves (which hold one row PER ELEMENT, not per record)."""
    out: list[tuple[str, DataType]] = []

    def walk(prefix: str, dt: DataType) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(f"{prefix}.{f.name}" if prefix else f.name, f.dataType)
        elif isinstance(dt, ArrayType):
            out.append((f"{prefix}#count", _COUNT_DT))
            walk(f"{prefix}#elem", dt.elementType)
        else:
            _kind_of(dt)  # validate leaf support early
            out.append((prefix, dt))

    for f in schema.fields:
        walk(f.name, f.dataType)
    return out


def rebuild_column_capnp(dt: DataType, leaves: list[pa.Array]) -> pa.Array:
    """Reassemble one (possibly nested) column from capnp-layout leaf
    arrays, consuming them in flatten_schema_capnp order. List rebuild is
    the reference's read path (columnfile-capnp.cc:186-204) expressed as
    offsets: level-(k+1) leaf rows are the in-order concatenation of
    level-k lists' elements, so cumulative counts are the list offsets.
    """
    import pyarrow.compute as pc

    pos = 0

    def walk(dt: DataType) -> pa.Array:
        nonlocal pos
        if isinstance(dt, StructType):
            children = [walk(f.dataType) for f in dt.fields]
            all_null = None
            for c in children:
                isnull = pc.is_null(c)
                all_null = isnull if all_null is None else pc.and_(all_null, isnull)
            return pa.StructArray.from_arrays(
                children, names=[f.name for f in dt.fields], mask=all_null
            )
        if isinstance(dt, ArrayType):
            counts = leaves[pos]
            pos += 1
            values = walk(dt.elementType)
            cnp = counts.to_numpy(zero_copy_only=False)
            null_mask = np.asarray(pc.is_null(counts))
            cnp = np.where(null_mask, 0, cnp).astype(np.int64)
            if int(cnp.sum()) != len(values):
                raise ColumnFileFormatError(
                    f"capnp list reassembly: counts sum {int(cnp.sum())} != "
                    f"{len(values)} element rows"
                )
            offsets = pa.array(
                np.concatenate(([0], np.cumsum(cnp))).astype(np.int32)
            )
            lst = pa.ListArray.from_arrays(offsets, values)
            if null_mask.any():
                # null count cell -> null list (superset of the reference,
                # which never writes null lists — unset reads as empty)
                indices = pa.array(
                    np.arange(len(lst), dtype=np.int32), mask=null_mask
                )
                lst = lst.take(indices)
            return lst
        arr = leaves[pos]
        pos += 1
        return arr

    out = walk(dt)
    if pos != len(leaves):
        raise ColumnFileFormatError("capnp reassembly consumed wrong leaf count")
    return out


def write_rows_capnp(writer, schema: StructType, rows, segment_bytes: int = 0) -> int:
    """Shred python rows (dicts or sequences matching ``schema``) into a
    ColumnFileWriter using the reference convention: one breadth-first
    queue per message (columnfile-capnp.cc:66-149). Returns rows written.
    When ``segment_bytes`` > 0, flushes BETWEEN messages once the pending
    size crosses it (the reference's kFlushLimit pattern) — never inside
    a message, which is what keeps segments self-contained.

    Row-at-a-time by design — this is the interop/egress surface, not
    the hot path (the rectangular in-cell layout is)."""
    leaf_encoders: dict[int, object] = {}

    def encoders_for(dt: DataType, col: int) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                encoders_for(f.dataType, col)
                col += field_count(f.dataType)
        elif isinstance(dt, ArrayType):
            leaf_encoders[col] = encoder_for(_COUNT_DT)
            encoders_for(dt.elementType, col + 1)
        else:
            leaf_encoders[col] = encoder_for(dt)

    encoders_for(schema, 0)

    n = 0
    for row in rows:
        queue: list[tuple[object, DataType, int]] = [(row, schema, 0)]
        while queue:
            value, dt, col = queue.pop(0)
            if isinstance(dt, StructType):
                if value is None:
                    vals = [None] * len(dt.fields)
                elif isinstance(value, dict):
                    vals = [value.get(f.name) for f in dt.fields]
                else:
                    vals = list(value)
                for f, v in zip(dt.fields, vals):
                    fc = field_count(f.dataType)
                    if is_union_field(f):
                        # canonicalize: exactly-one-active-arm enforced,
                        # inactive arms forced to NULL (module docstring)
                        v = _normalize_union_value(f, v)
                    if isinstance(f.dataType, (StructType, ArrayType)):
                        queue.append((v, f.dataType, col))
                    elif v is None:
                        writer.put_null(col)
                    else:
                        writer.put(col, leaf_encoders[col](v))
                    col += fc
            elif isinstance(dt, ArrayType):
                if value is None:
                    writer.put_null(col)
                else:
                    writer.put(col, leaf_encoders[col](len(value)))
                    for elem in value:
                        if isinstance(dt.elementType, (StructType, ArrayType)):
                            queue.append((elem, dt.elementType, col + 1))
                        elif elem is None:
                            writer.put_null(col + 1)
                        else:
                            writer.put(col + 1, leaf_encoders[col + 1](elem))
            else:
                if value is None:
                    writer.put_null(col)
                else:
                    writer.put(col, leaf_encoders[col](value))
        writer.add_rows(1)
        n += 1
        if segment_bytes and writer.pending_size >= segment_bytes:
            writer.flush()
    return n
