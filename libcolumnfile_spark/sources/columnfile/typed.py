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
    ArrayType,
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

from libcolumnfile_spark.sources.columnfile.codec import (
    ColumnFileFormatError,
    decode_fixed_fast,
    decode_runs,
    decode_var_fast,
    decode_var_runs_arrays,
)

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
    if isinstance(dt, ArrayType):
        return "array"
    raise ColumnFileFormatError(
        f"unsupported columnfile type {dt.simpleString()}; supported: "
        "byte/short/int/long/float/double/boolean/string/binary/date/"
        "timestamp/decimal/array (structs flatten to columns at the "
        "datasource layer)"
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
    if kind == "array":
        return _array_encoder(dt)
    raise AssertionError(kind)


def _array_encoder(dt: ArrayType):
    """array<T> cell = u64 LE element count + packed elements.

    The reference's list convention (columnfile-capnp.cc:76-92) also
    leads with a little-endian u64 count, but appends elements as EXTRA
    ROWS in the child columns — which makes segments non-rectangular and
    unsplittable without reassembly state. We keep the count prefix and
    pack the elements into the same cell instead: segments stay
    rectangular (any segment range is independently decodable), which is
    what lets a distributed scanner split files. Elements: fixed-width
    types packed back-to-back; strings/binary each u32-length-prefixed.
    """
    ekind = _kind_of(dt.elementType)
    cnt = struct.Struct("<Q").pack
    if ekind in _FIXED:
        npdt = _FIXED[ekind][1]

        def enc_fixed(v):
            arr = np.asarray(list(v), dtype=npdt)
            return cnt(len(arr)) + arr.tobytes()

        return enc_fixed
    if ekind in ("string", "binary"):
        lp = struct.Struct("<I").pack

        def enc_var(v):
            parts = [cnt(len(v))]
            for e in v:
                b = e.encode("utf-8") if isinstance(e, str) else bytes(e)
                parts.append(lp(len(b)))
                parts.append(b)
            return b"".join(parts)

        return enc_var
    raise ColumnFileFormatError(
        f"unsupported array element type {dt.elementType.simpleString()}"
    )


def _array_decoder(dt: ArrayType):
    ekind = _kind_of(dt.elementType)
    if ekind in _FIXED:
        npdt = _FIXED[ekind][1]

        def dec_fixed(v: bytes):
            n = struct.unpack_from("<Q", v)[0]
            arr = np.frombuffer(v, dtype=npdt, count=n, offset=8)
            return arr
        return dec_fixed
    if ekind in ("string", "binary"):
        as_str = ekind == "string"

        def dec_var(v: bytes):
            n = struct.unpack_from("<Q", v)[0]
            out = []
            pos = 8
            for _ in range(n):
                (ln,) = struct.unpack_from("<I", v, pos)
                pos += 4
                e = v[pos : pos + ln]
                pos += ln
                out.append(e.decode("utf-8") if as_str else e)
            return out

        return dec_var
    raise ColumnFileFormatError(
        f"unsupported array element type {dt.elementType.simpleString()}"
    )


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

    if kind == "array":
        dec = _array_decoder(dt)
        vals: list = []
        for v, r in runs:
            e = None if v is None else dec(v)
            vals.extend([e] * r)
        etype = _arrow_type(_kind_of(dt.elementType), dt.elementType)
        return pa.array(vals, type=pa.list_(etype))

    # variable-width kinds: build the run-values array straight from an
    # (offsets, data) buffer pair — no per-value Python str/bytes objects
    # — then expand via a dictionary array (np.repeat'd indices) and
    # flatten C++-side. Per-row Python never runs; per-RUN Python is one
    # list-comprehension feeding b"".join. Arrow's vectorized UTF-8
    # validation replaces the old per-value str.decode (same clean error
    # for corrupt text cells, ~60x less per-string overhead).
    if kind in ("string", "binary"):
        lens = np.fromiter(
            (0 if v is None else len(v) for v, _ in runs),
            dtype=np.int64,
            count=len(runs),
        )
        offsets = np.zeros(len(runs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        data = b"".join(v for v, _ in runs if v is not None)
        return _expand_var_runs(data, offsets, reps, null_mask_runs, kind == "string")
    out: list = []
    if kind == "decimal":
        assert isinstance(dt, DecimalType)
        for v, r in runs:
            out.extend([None if v is None else Decimal(v.decode("ascii"))] * r)
        return pa.array(out, type=pa.decimal128(dt.precision, dt.scale))
    raise AssertionError(kind)


def _arrow_type(kind: str, dt: DataType):
    if kind in _FIXED:
        return _FIXED[kind][2]
    if kind == "array":
        assert isinstance(dt, ArrayType)
        return pa.list_(_arrow_type(_kind_of(dt.elementType), dt.elementType))
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
# Struct shredding: nested schema <-> flat leaf columns
# ---------------------------------------------------------------------------


def flatten_schema(schema: StructType) -> list[tuple[str, DataType]]:
    """Depth-first flattening of structs into consecutive leaf columns
    (the reference's record shredding: nested structs flatten to
    consecutive column indexes, columnfile-capnp.cc:94-149). Leaf names
    are dotted paths; the leaf's position IS its on-disk column index.
    """
    out: list[tuple[str, DataType]] = []

    def walk(prefix: str, dt: DataType) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(f"{prefix}.{f.name}" if prefix else f.name, f.dataType)
        else:
            _kind_of(dt)  # validate leaf support early
            out.append((prefix, dt))

    for f in schema.fields:
        walk(f.name, f.dataType)
    return out


def flatten_batch_arrays(batch: pa.RecordBatch, schema: StructType) -> list[pa.Array]:
    """Arrow batch -> leaf arrays in flatten_schema order, with parent
    struct nulls propagated into children."""
    import pyarrow.compute as pc

    out: list[pa.Array] = []

    def walk(arr: pa.Array, dt: DataType) -> None:
        if isinstance(dt, StructType):
            valid = pc.is_valid(arr) if arr.null_count else None
            for i, f in enumerate(dt.fields):
                child = arr.field(i) if isinstance(arr, pa.StructArray) else arr.field(f.name)
                if valid is not None:
                    child = pc.if_else(valid, child, pa.scalar(None, type=child.type))
                walk(child, f.dataType)
        else:
            out.append(arr)

    for i, f in enumerate(schema.fields):
        walk(batch.column(i), f.dataType)
    return out


def rebuild_column(dt: DataType, leaves: list[pa.Array]) -> pa.Array:
    """Inverse of flattening: consume leaf arrays (in order) and rebuild
    the (possibly nested) column. A struct row is NULL iff every leaf
    under it is null — the same ambiguity the reference's record
    assembly has (NULL fields are skipped on rebuild,
    columnfile-capnp.cc:157-256)."""
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
                children,
                names=[f.name for f in dt.fields],
                mask=all_null,
            )
        arr = leaves[pos]
        pos += 1
        return arr

    return walk(dt)


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


_FAST_WIDTHS = {
    "int8": (1, np.int8, pa.int8()),
    "int16": (2, np.int16, pa.int16()),
    "int32": (4, np.int32, pa.int32()),
    "int64": (8, np.int64, pa.int64()),
    "float32": (4, np.float32, pa.float32()),
    "float64": (8, np.float64, pa.float64()),
    "date": (4, np.int32, pa.date32()),
    "timestamp": (8, np.int64, pa.timestamp("us")),
}


def _expand_var_runs(
    data: bytes,
    offsets: np.ndarray,
    reps: np.ndarray,
    null_runs: np.ndarray,
    as_str: bool,
) -> pa.Array:
    """(run value buffer, int64 offsets, repeats, null-run mask) ->
    expanded utf8/binary Arrow array. Shared tail of the string decode
    paths: run values wrap as ONE (offsets, data) Arrow array (no
    per-value Python objects), then a dictionary expansion flattens the
    RLE C++-side; Arrow's vectorized UTF-8 validation replaces per-value
    str.decode with the same clean error for corrupt text."""
    n_runs = len(reps)
    if offsets[-1] > np.iinfo(np.int32).max:
        raise ColumnFileFormatError("column segment exceeds 2 GiB of text")
    patype = pa.utf8() if as_str else pa.binary()
    run_vals = pa.Array.from_buffers(
        patype,
        n_runs,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data)],
    )
    if as_str:
        try:
            run_vals.validate(full=True)
        except pa.ArrowInvalid as e:
            raise ColumnFileFormatError(
                f"invalid UTF-8 in string column: {e}"
            ) from None
    has_nulls = bool(null_runs.any())
    if not has_nulls and bool((reps == 1).all()):
        return run_vals  # every run one row, no nulls: already final
    mask = np.repeat(null_runs, reps)
    idx = np.repeat(np.arange(n_runs, dtype=np.int32), reps)
    if has_nulls:
        # masked pa.array() takes a slow per-element path; a packed
        # validity bitmap keeps index construction zero-copy
        validity = np.packbits(~mask, bitorder="little")
        indices = pa.Array.from_buffers(
            pa.int32(),
            len(idx),
            [pa.py_buffer(validity.tobytes()), pa.py_buffer(idx.tobytes())],
            null_count=int(mask.sum()),
        )
    else:
        indices = pa.array(idx)
    return pa.DictionaryArray.from_arrays(indices, run_vals).dictionary_decode()


def decode_buf_to_arrow(buf: bytes, dt: DataType) -> pa.Array:
    """Decode a decompressed column buffer to a pyarrow array, taking the
    vectorized fast paths when they match and falling back to the general
    run decoder otherwise. Fixed-width: non-null single-byte-varint runs
    decode as one strided numpy view (codec.decode_fixed_fast, ~5x).
    String/binary: codec.decode_var_runs_arrays parses the run grammar in
    ONE buffer-to-buffer pass (no per-run tuples/bytes objects, no
    repeated generator passes) — measured 1.9x on the 11-column lineitem
    decode. Byte-identical results on every path (roundtrip + fuzz
    suites cover all of them)."""
    kind = _kind_of(dt)
    fast = _FAST_WIDTHS.get(kind)
    if fast is not None:
        width, npdt, patype = fast
        got = decode_fixed_fast(buf, width)
        if got is not None:
            raw, reps = got
            vals = raw.reshape(-1).view(npdt)
            if not bool((reps == 1).all()):
                vals = np.repeat(vals, reps)
            return pa.array(vals, type=patype)
    elif kind in ("string", "binary"):
        vf = decode_var_fast(buf)
        if vf is not None:
            data, offsets, reps = vf
            if len(reps) == 0:
                return pa.array(
                    [], type=pa.utf8() if kind == "string" else pa.binary()
                )
            return _expand_var_runs(
                data, offsets, reps, np.zeros(len(reps), dtype=bool), kind == "string"
            )
        data, ends, reps, nulls = decode_var_runs_arrays(buf)
        n_runs = len(reps)
        if n_runs == 0:
            return pa.array([], type=pa.utf8() if kind == "string" else pa.binary())
        offsets = np.zeros(n_runs + 1, dtype=np.int64)
        offsets[1:] = np.frombuffer(ends, dtype=np.int64)
        return _expand_var_runs(
            bytes(data),
            offsets,
            np.frombuffer(reps, dtype=np.int64),
            np.frombuffer(nulls, dtype=np.int8).astype(bool),
            kind == "string",
        )
    return decode_runs_to_arrow(decode_runs(buf), dt)


def encode_fixed_fast(arr: pa.Array, dt: DataType):
    """Vectorized run-encode of a non-null fixed-width Arrow array:
    numpy RLE (change-point detection) + one uniform (3+W)-stride byte
    matrix — ``varint(repeat<128) varint(0) varint(W) value[W]`` per run,
    the exact layout decode_fixed_fast reads back. Runs longer than 127
    split into multiple runs (legal per the format; repeats stay
    single-byte so the whole emission is one reshape).

    Returns (encoded_bytes, n_values, min_val, max_val) or None when the
    array has nulls or the type isn't fixed-width (caller falls back to
    the per-cell RunEncoder). Prefix coding is intentionally not
    attempted: little-endian fixed-width values rarely share leading
    bytes, and the general encoder still covers types that benefit.
    """
    kind = _kind_of(dt)
    fast = _FAST_WIDTHS.get(kind)
    if fast is None or arr.null_count or len(arr) == 0:
        return None
    width, npdt, _patype = fast
    if kind == "timestamp":
        vals = arr.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False).astype(np.int64)
    elif kind == "date":
        vals = arr.cast(pa.date32()).to_numpy(zero_copy_only=False)
        if vals.dtype != np.int32:
            vals = (vals.astype("datetime64[D]").view("int64")).astype(np.int32)
    else:
        vals = arr.to_numpy(zero_copy_only=False).astype(npdt, copy=False)
    cells = np.ascontiguousarray(vals).view(np.uint8).reshape(len(vals), width)
    # run starts: first row + every row that differs from its predecessor
    change = np.empty(len(vals), dtype=bool)
    change[0] = True
    np.any(cells[1:] != cells[:-1], axis=1, out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, len(vals)))
    if lengths.max(initial=0) > 127:
        # split long runs into <=127 chunks so repeats stay single-byte
        rep_starts = []
        rep_lens = []
        for st, ln in zip(starts.tolist(), lengths.tolist()):
            while ln > 127:
                rep_starts.append(st)
                rep_lens.append(127)
                ln -= 127
            rep_starts.append(st)
            rep_lens.append(ln)
        starts = np.asarray(rep_starts, dtype=np.int64)
        lengths = np.asarray(rep_lens, dtype=np.int64)
    out = np.empty((len(starts), 3 + width), dtype=np.uint8)
    out[:, 0] = lengths
    out[:, 1] = 0
    out[:, 2] = width
    out[:, 3:] = cells[starts]
    return out.tobytes(), len(vals), vals.min(), vals.max()


def encode_var_fast(arr: pa.Array, dt: DataType):
    """Vectorized run-encode of a string/binary Arrow array: each cell
    emits ``varint(1) varint(0) varint(len) bytes`` with repeat fixed at
    1 — no RLE/prefix attempted (block compression recovers cross-cell
    redundancy; the encoding is still fully legal format). NULL cells
    emit the 3-byte NULL run ``varint(1) varint(0) 0xFF``. Length
    varints up to 3 bytes (values < 1 MiB) are emitted with masked
    scatter writes; everything is numpy scatter/gather over the Arrow
    offsets — no per-cell Python.

    Returns (encoded_bytes, n_values) or None on >=1 MiB values /
    non-var types / null slots with nonzero offset extents (caller
    falls back to the per-cell RunEncoder).
    """
    kind = _kind_of(dt)
    if kind not in ("string", "binary") or len(arr) == 0:
        return None
    a = arr.cast(pa.binary()) if kind == "string" else arr
    combined = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    bufs = combined.buffers()
    # binary layout: [validity, int32 offsets, data]
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(combined) + 1,
                            offset=combined.offset * 4)
    valbuf = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, dtype=np.uint8)
    lens = np.diff(offsets).astype(np.int64)
    if lens.size == 0 or lens.max(initial=0) >= (1 << 20):
        return None
    n = len(lens)
    nulls = None
    if combined.null_count:
        import pyarrow.compute as pc

        nulls = np.asarray(pc.is_null(combined))
        # Arrow permits null slots with nonzero offset extents; the
        # in-order data copy below assumes every emitted byte is a kept
        # byte, so bail to the per-cell encoder for that (rare) shape
        if lens[nulls].any():
            return None
    # 6+7-bit varint length: 1 byte < 2^7, 2 bytes < 2^13, 3 bytes < 2^20
    vlen = np.ones(n, dtype=np.int64)
    vlen[lens >= (1 << 7)] = 2
    vlen[lens >= (1 << 13)] = 3
    if nulls is not None:
        vlen[nulls] = 1  # the 0xFF NULL control byte, no length/value
    strides = 2 + vlen + lens
    dst_starts = np.concatenate(([0], np.cumsum(strides)[:-1]))
    total = int(strides.sum())
    out = np.zeros(total, dtype=np.uint8)
    # mark header bytes; data bytes are everything else, and they appear
    # in source order — so the whole data payload lands with ONE
    # boolean-mask assignment (no per-byte index arrays, which made an
    # np.repeat-based gather slower than the Python loop it replaced)
    hdr = np.zeros(total, dtype=bool)
    hdr[dst_starts] = True
    hdr[dst_starts + 1] = True
    hdr[dst_starts + 2] = True
    out[dst_starts] = 1          # repeat
    # dst_starts + 1 is already 0 (reserved)
    m1 = vlen == 1
    out[dst_starts[m1] + 2] = lens[m1]
    m2 = vlen == 2
    if m2.any():
        out[dst_starts[m2] + 2] = (lens[m2] & 0x3F) | 0x80
        out[dst_starts[m2] + 3] = lens[m2] >> 6
        hdr[dst_starts[m2] + 3] = True
    m3 = vlen == 3
    if m3.any():
        out[dst_starts[m3] + 2] = (lens[m3] & 0x3F) | 0x80
        out[dst_starts[m3] + 3] = ((lens[m3] >> 6) & 0x7F) | 0x80
        out[dst_starts[m3] + 4] = lens[m3] >> 13
        hdr[dst_starts[m3] + 3] = True
        hdr[dst_starts[m3] + 4] = True
    if nulls is not None:
        out[dst_starts[nulls] + 2] = 0xFF  # CODE_NULL control byte
    out[~hdr] = valbuf[offsets[0] : offsets[-1]]
    return out.tobytes(), n
