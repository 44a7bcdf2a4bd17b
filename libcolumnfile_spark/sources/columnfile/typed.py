"""Typed views over typeless columnfile cells.

The on-disk format stores untyped byte strings (reference
src/columnfile.h:63); interpretation is caller convention. The reference
ships a little-endian fixed-width convention in columnfile-cat's
``--format`` codes (tools/columnfile-cat.cc:285-320: H/I/Q u16/u32/u64,
h/i/q i16/i32/i64, f/d float/double, s text). This module maps a Spark
StructType onto that convention — schema position i = column index i —
and adds the obvious extensions the reference leaves to the caller
(bool as 1 byte, date as i32 days, timestamp as i64 micros, decimal as
text).

Decode is vectorized: fixed-width columns go through numpy
(frombuffer + repeat over the RLE runs — the run structure survives all
the way into the array build), and everything lands in pyarrow arrays
for zero-copy handoff to Spark.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone
from decimal import Decimal

import numpy as np
import pyarrow as pa

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
    TimestampNTZType,
)

from libcolumnfile_spark.sources.columnfile.codec import ColumnFileFormatError

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_TS = datetime(1970, 1, 1, tzinfo=timezone.utc)

# (struct fmt, numpy dtype, arrow type) for fixed-width kinds
_FIXED = {
    "int8": ("<b", np.int8, pa.int8()),
    "int16": ("<h", np.int16, pa.int16()),
    "int32": ("<i", np.int32, pa.int32()),
    "int64": ("<q", np.int64, pa.int64()),
    "float32": ("<f", np.float32, pa.float32()),
    "float64": ("<d", np.float64, pa.float64()),
}


def _kind_of(dt: DataType) -> str:
    if isinstance(dt, ByteType):
        return "int8"
    if isinstance(dt, ShortType):
        return "int16"
    if isinstance(dt, IntegerType):
        return "int32"
    if isinstance(dt, LongType):
        return "int64"
    if isinstance(dt, FloatType):
        return "float32"
    if isinstance(dt, DoubleType):
        return "float64"
    if isinstance(dt, BooleanType):
        return "bool"
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, BinaryType):
        return "binary"
    if isinstance(dt, DateType):
        return "date"
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, DecimalType):
        return "decimal"
    raise ColumnFileFormatError(
        f"unsupported columnfile type {dt.simpleString()}; supported: "
        "byte/short/int/long/float/double/boolean/string/binary/date/"
        "timestamp/decimal"
    )


# ---------------------------------------------------------------------------
# Encode (python cell -> bytes)
# ---------------------------------------------------------------------------


def encoder_for(dt: DataType):
    """Returns fn(value) -> bytes for one Spark type."""
    kind = _kind_of(dt)
    if kind in _FIXED:
        fmt = _FIXED[kind][0]
        pack = struct.Struct(fmt).pack
        if kind in ("float32", "float64"):
            return lambda v: pack(float(v))
        return lambda v: pack(int(v))
    if kind == "bool":
        return lambda v: b"\x01" if v else b"\x00"
    if kind == "string":
        return lambda v: v.encode("utf-8") if isinstance(v, str) else bytes(v)
    if kind == "binary":
        return lambda v: bytes(v)
    if kind == "date":
        pack = struct.Struct("<i").pack
        return lambda v: pack((v - _EPOCH_DATE).days if isinstance(v, date) else int(v))
    if kind == "timestamp":
        pack = struct.Struct("<q").pack

        def enc_ts(v):
            if isinstance(v, datetime):
                if v.tzinfo is None:
                    v = v.replace(tzinfo=timezone.utc)
                return pack(int((v - _EPOCH_TS).total_seconds() * 1_000_000))
            return pack(int(v))

        return enc_ts
    if kind == "decimal":
        return lambda v: str(v).encode("ascii")
    raise AssertionError(kind)


# ---------------------------------------------------------------------------
# Decode (RLE runs -> pyarrow array), vectorized per kind
# ---------------------------------------------------------------------------


def _runs_to_reps_and_values(runs):
    reps = np.fromiter((r for _, r in runs), dtype=np.int64, count=len(runs))
    return reps


def decode_runs_to_arrow(runs, dt: DataType) -> pa.Array:
    """[(bytes|None, repeat)] -> pyarrow array of the Spark type.

    The RLE structure is exploited: each distinct run value is decoded
    once, then np.repeat / list-multiply expands — decode cost is
    O(distinct runs), not O(rows).
    """
    kind = _kind_of(dt)
    if not runs:
        return pa.array([], type=_arrow_type(kind, dt))
    reps = _runs_to_reps_and_values(runs)
    null_mask_runs = np.fromiter((v is None for v, _ in runs), dtype=bool, count=len(runs))
    mask = np.repeat(null_mask_runs, reps)

    if kind in _FIXED:
        fmt, npdt, patype = _FIXED[kind]
        width = struct.calcsize(fmt)
        buf = b"".join(v if v is not None else b"\x00" * width for v, _ in runs)
        if len(buf) != width * len(runs):
            raise ColumnFileFormatError(
                f"fixed-width column: expected {width}-byte cells"
            )
        run_vals = np.frombuffer(buf, dtype=npdt)
        values = np.repeat(run_vals, reps)
        return pa.array(values, type=patype, mask=mask)

    if kind == "bool":
        run_vals = np.fromiter(
            ((v != b"\x00" and v != b"") if v is not None else False for v, _ in runs),
            dtype=bool,
            count=len(runs),
        )
        return pa.array(np.repeat(run_vals, reps), type=pa.bool_(), mask=mask)

    if kind == "date":
        width = 4
        buf = b"".join(v if v is not None else b"\x00" * width for v, _ in runs)
        if len(buf) != width * len(runs):
            raise ColumnFileFormatError("date column: expected 4-byte cells")
        run_vals = np.frombuffer(buf, dtype=np.int32)
        return pa.array(np.repeat(run_vals, reps), type=pa.date32(), mask=mask)

    if kind == "timestamp":
        width = 8
        buf = b"".join(v if v is not None else b"\x00" * width for v, _ in runs)
        if len(buf) != width * len(runs):
            raise ColumnFileFormatError("timestamp column: expected 8-byte cells")
        run_vals = np.frombuffer(buf, dtype=np.int64)
        return pa.array(np.repeat(run_vals, reps), type=pa.timestamp("us"), mask=mask)

    # variable-width kinds: python-level expansion
    out: list = []
    if kind == "string":
        for v, r in runs:
            out.extend([None if v is None else v.decode("utf-8")] * r)
        return pa.array(out, type=pa.string())
    if kind == "binary":
        for v, r in runs:
            out.extend([None if v is None else v] * r)
        return pa.array(out, type=pa.binary())
    if kind == "decimal":
        assert isinstance(dt, DecimalType)
        for v, r in runs:
            out.extend([None if v is None else Decimal(v.decode("ascii"))] * r)
        return pa.array(out, type=pa.decimal128(dt.precision, dt.scale))
    raise AssertionError(kind)


def _arrow_type(kind: str, dt: DataType):
    if kind in _FIXED:
        return _FIXED[kind][2]
    return {
        "bool": pa.bool_(),
        "string": pa.string(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
    }.get(kind) or pa.decimal128(dt.precision, dt.scale)  # type: ignore[union-attr]


def arrow_schema_for(schema: StructType) -> pa.Schema:
    return pa.schema(
        [
            pa.field(f.name, _arrow_type(_kind_of(f.dataType), f.dataType), nullable=True)
            for f in schema.fields
        ]
    )


# ---------------------------------------------------------------------------
# Stats support: decode a single cell for min/max comparisons
# ---------------------------------------------------------------------------


def decode_cell(value: bytes | None, dt: DataType):
    """One cell -> python value (used for segment stats, not row paths)."""
    if value is None:
        return None
    kind = _kind_of(dt)
    if kind in _FIXED:
        return struct.unpack(_FIXED[kind][0], value)[0]
    if kind == "bool":
        return value not in (b"\x00", b"")
    if kind == "string":
        return value.decode("utf-8")
    if kind == "binary":
        return value
    if kind == "date":
        return struct.unpack("<i", value)[0]  # days since epoch
    if kind == "timestamp":
        return struct.unpack("<q", value)[0]  # micros since epoch
    if kind == "decimal":
        return Decimal(value.decode("ascii"))
    raise AssertionError(kind)


def is_orderable_for_stats(dt: DataType) -> bool:
    """Types whose min/max we track in the segment-stats sidecar."""
    kind = _kind_of(dt)
    return kind in (*_FIXED, "date", "timestamp", "string")
