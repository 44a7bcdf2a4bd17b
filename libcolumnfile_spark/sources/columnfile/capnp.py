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
- capnp unions are a TODO in the reference itself (:96,205); nothing to
  match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql.types import ArrayType, DataType, LongType, StructType

from libcolumnfile_spark.sources.columnfile.codec import ColumnFileFormatError
from libcolumnfile_spark.sources.columnfile.typed import (
    _kind_of,
    encoder_for,
)

_COUNT_DT = LongType()  # u64 LE on disk; i64 view is safe for sane counts


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
