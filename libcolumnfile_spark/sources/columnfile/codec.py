"""Low-level codecs for the columnfile on-disk format.

Re-implements, from the published format description, the reference's
variable-length integer (reference src/columnfile.h:15-26, encoder
src/columnfile-internal.h:59-81, decoder :28-52), zigzag signed form
(:54-57, :83-87), the per-run value encoding (src/columnfile.h:28-56;
writer src/columnfile-writer.cc:259-318; reader
src/columnfile-reader.cc:573-614), and the five per-column block
compressions (src/columnfile-writer.cc:320-397, reader :471-567).

Varint layout: the number is split into a 6-bit first chunk and 7-bit
continuation chunks; every byte except the last has its most significant
bit set, and the first byte's bit 6 is always 0 — so a varint's first
byte is always < 0xc0 and can never collide with the 0xc0..0xff control
range used by the value encoding.

Run layout (one run = one value repeated N times):
  varint  repeat count
  varint  reserved (must be 0)
  byte    control: 0xff = NULL; 0xc0..0xfe = copy (control - 0xbe)
          prefix bytes from the previous value, then varint suffix
          length + suffix bytes; 0x00..0xbf = the byte is the first
          byte of the varint value length, followed by the bytes.
"""

from __future__ import annotations

import lzma
import zlib

import numpy as np

try:
    import pyarrow as _pa

    _SNAPPY = _pa.Codec("snappy")
    _LZ4_RAW = _pa.Codec("lz4_raw")
except Exception:  # pragma: no cover - pyarrow is baked into the env
    _pa = None
    _SNAPPY = None
    _LZ4_RAW = None

MAGIC = b'\n\t"\x00'  # breaks CSV parsers by design (columnfile-internal.h:21-22)

COMPRESSION_NONE = 0
COMPRESSION_SNAPPY = 1
COMPRESSION_LZ4 = 2
COMPRESSION_LZMA = 3
COMPRESSION_ZLIB = 4
COMPRESSION_DEFAULT = COMPRESSION_LZ4

COMPRESSION_NAMES = {
    "none": COMPRESSION_NONE,
    "snappy": COMPRESSION_SNAPPY,
    "lz4": COMPRESSION_LZ4,
    "lzma": COMPRESSION_LZMA,
    "zlib": COMPRESSION_ZLIB,
}

CODE_NULL = 0xFF

# Corrupt-input guards (the reference trusts sizes and lets huge repeats
# spin; a Python reader must bound allocations to replay the fuzz corpus
# safely).
MAX_DECOMPRESSED_BYTES = 1 << 30
MAX_ROWS_PER_COLUMN_SEGMENT = 1 << 27


class ColumnFileFormatError(Exception):
    """Clean parse error for corrupt or unsupported input (the analog of
    the reference's ColumnFileException)."""


# ---------------------------------------------------------------------------
# Varint / zigzag
# ---------------------------------------------------------------------------


def put_uint(out: bytearray, value: int) -> None:
    """Append the 6+7-bit varint encoding of a uint32."""
    if value < 0 or value > 0xFFFFFFFF:
        raise ValueError(f"uint32 out of range: {value}")
    if value < 1 << 7:
        out.append(value)
    elif value < 1 << 13:
        out.append((value & 0x3F) | 0x80)
        out.append(value >> 6)
    elif value < 1 << 20:
        out.append((value & 0x3F) | 0x80)
        out.append(((value >> 6) & 0x7F) | 0x80)
        out.append(value >> 13)
    elif value < 1 << 27:
        out.append((value & 0x3F) | 0x80)
        out.append(((value >> 6) & 0x7F) | 0x80)
        out.append(((value >> 13) & 0x7F) | 0x80)
        out.append(value >> 20)
    else:
        out.append((value & 0x3F) | 0x80)
        out.append(((value >> 6) & 0x7F) | 0x80)
        out.append(((value >> 13) & 0x7F) | 0x80)
        out.append(((value >> 20) & 0x7F) | 0x80)
        out.append(value >> 27)  # <= 0x1f for any uint32


def get_uint(data: bytes, pos: int) -> tuple[int, int]:
    """Decode one varint at ``pos``; returns (value, new_pos).

    Mirrors the reference decoder exactly, including the out-of-range
    check on the fifth byte.
    """
    try:
        b = data[pos]
        pos += 1
        result = b & 127
        if b >= 0x80:
            b = data[pos]
            pos += 1
            result |= (b & 127) << 6
            if b >= 0x80:
                b = data[pos]
                pos += 1
                result |= (b & 127) << 13
                if b >= 0x80:
                    b = data[pos]
                    pos += 1
                    result |= (b & 127) << 20
                    if b >= 0x80:
                        b = data[pos]
                        pos += 1
                        if b > 0x1F:
                            raise ColumnFileFormatError(
                                "corrupt input: integer out of range"
                            )
                        result |= b << 27
    except IndexError:
        raise ColumnFileFormatError("corrupt input: truncated varint") from None
    return result, pos


def zigzag_encode(value: int) -> int:
    """int32 -> uint32 zigzag."""
    if value < -(1 << 31) or value >= 1 << 31:
        raise ValueError(f"int32 out of range: {value}")
    return ((value << 1) ^ (value >> 31)) & 0xFFFFFFFF


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def put_int(out: bytearray, value: int) -> None:
    put_uint(out, zigzag_encode(value))


def get_int(data: bytes, pos: int) -> tuple[int, int]:
    u, pos = get_uint(data, pos)
    return zigzag_decode(u), pos


# ---------------------------------------------------------------------------
# Block compression (per column, per segment)
# ---------------------------------------------------------------------------


def _require_codec(codec, name: str):
    if codec is None:
        raise ColumnFileFormatError(f"{name} codec unavailable (pyarrow missing)")
    return codec


def _snappy_uncompressed_length(blob: bytes) -> int:
    """Snappy raw streams embed their uncompressed length as a standard
    7-bit LEB128 preamble; pyarrow needs it passed explicitly."""
    result = 0
    shift = 0
    for i in range(min(len(blob), 5)):
        b = blob[i]
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result
        shift += 7
    raise ColumnFileFormatError("corrupt input: bad snappy preamble")


def compress_block(data: bytes, compression: int) -> bytes:
    """Encoded column buffer -> stored blob (with the varint uncompressed
    size prefix for lz4/lzma/zlib; snappy self-describes)."""
    if compression == COMPRESSION_NONE:
        return bytes(data)
    if compression == COMPRESSION_SNAPPY:
        return _require_codec(_SNAPPY, "snappy").compress(data, asbytes=True)
    out = bytearray()
    put_uint(out, len(data))
    if compression == COMPRESSION_LZ4:
        out += _require_codec(_LZ4_RAW, "lz4").compress(data, asbytes=True)
    elif compression == COMPRESSION_LZMA:
        out += lzma.compress(bytes(data), format=lzma.FORMAT_XZ, preset=1, check=lzma.CHECK_CRC32)
    elif compression == COMPRESSION_ZLIB:
        out += zlib.compress(bytes(data), 6)
    else:
        raise ColumnFileFormatError(f"unknown compression scheme {compression}")
    return bytes(out)


def decompress_block(blob: bytes, compression: int) -> bytes:
    if compression == COMPRESSION_NONE:
        return blob
    if compression == COMPRESSION_SNAPPY:
        n = _snappy_uncompressed_length(blob)
        if n > MAX_DECOMPRESSED_BYTES:
            raise ColumnFileFormatError("corrupt input: decompressed size too large")
        try:
            return _require_codec(_SNAPPY, "snappy").decompress(
                blob, decompressed_size=n, asbytes=True
            )
        except Exception as e:
            raise ColumnFileFormatError(f"snappy decompression failed: {e}") from None
    n, pos = get_uint(blob, 0)
    if n > MAX_DECOMPRESSED_BYTES:
        raise ColumnFileFormatError("corrupt input: decompressed size too large")
    body = blob[pos:]
    try:
        if compression == COMPRESSION_LZ4:
            out = _require_codec(_LZ4_RAW, "lz4").decompress(
                body, decompressed_size=n, asbytes=True
            )
        elif compression == COMPRESSION_LZMA:
            out = lzma.decompress(body)
        elif compression == COMPRESSION_ZLIB:
            out = zlib.decompress(body)
        else:
            raise ColumnFileFormatError(f"unknown compression scheme {compression}")
    except ColumnFileFormatError:
        raise
    except Exception as e:
        raise ColumnFileFormatError(f"decompression failed: {e}") from None
    if len(out) != n:
        raise ColumnFileFormatError("decompressed length mismatch")
    return out


# ---------------------------------------------------------------------------
# Run (value) codec
# ---------------------------------------------------------------------------


class RunEncoder:
    """Per-column run encoder: RLE + shared-prefix elision.

    State machine identical to the reference FieldWriter
    (src/columnfile-writer.cc:259-318): a pending (value, repeat) run is
    flushed when a different value (or a null/non-null flip) arrives; the
    control byte records up to 0x40 bytes of prefix shared with the
    previous run's value (only when the shared prefix exceeds 2 bytes).
    """

    __slots__ = ("data", "_value", "_is_null", "_repeat", "_shared_prefix")

    def __init__(self) -> None:
        self.data = bytearray()
        self._value = b""
        self._is_null = True
        self._repeat = 0
        self._shared_prefix = 0

    def put(self, value: bytes) -> None:
        if self._is_null:
            mismatch = True
            shared = 0
        elif value == self._value:
            self._repeat += 1
            return
        else:
            n = min(len(value), len(self._value))
            shared = 0
            while shared < n and value[shared] == self._value[shared]:
                shared += 1
            mismatch = True
        if mismatch:
            self.flush_run()
            self._value = bytes(value)
            self._is_null = False
            self._shared_prefix = shared
        self._repeat += 1

    def put_null(self) -> None:
        if not self._is_null:
            self.flush_run()
            self._is_null = True
        self._repeat += 1

    def flush_run(self) -> None:
        if not self._repeat:
            return
        put_uint(self.data, self._repeat)
        put_uint(self.data, 0)  # reserved
        if self._is_null:
            self.data.append(CODE_NULL)
        else:
            sp = self._shared_prefix
            if sp > 2:
                # never emit 0xff (that means NULL); cap at 0x40
                if sp > 0x40:
                    sp = 0x40
                self.data.append(0xC0 | (sp - 2))
                put_uint(self.data, len(self._value) - sp)
                self.data += self._value[sp:]
            else:
                put_uint(self.data, len(self._value))
                self.data += self._value
        self._repeat = 0
        self._is_null = True

    def finalize(self, compression: int) -> bytes:
        self.flush_run()
        return compress_block(bytes(self.data), compression)


def decode_runs(buf: bytes) -> list[tuple[bytes | None, int]]:
    """Decode a (decompressed) column buffer into [(value|None, repeat)].

    Mirrors the reference FieldReader::Fill loop
    (src/columnfile-reader.cc:573-614), keeping an explicit previous-value
    copy instead of the memmove aliasing trick.
    """
    runs: list[tuple[bytes | None, int]] = []
    append = runs.append
    pos = 0
    n = len(buf)
    value = b""
    total_rows = 0
    # Hot loop: the overwhelmingly common layout is single-byte varints
    # (repeat < 128, reserved == 0, length < 128) — read those inline and
    # fall back to get_uint only for continuation bytes. IndexError from
    # a truncated read maps to the same clean error get_uint raises.
    try:
        while pos < n:
            b = buf[pos]
            if b < 0x80:
                repeat = b
                pos += 1
            else:
                repeat, pos = get_uint(buf, pos)
            b = buf[pos]
            if b == 0:
                pos += 1
            else:
                reserved, pos = get_uint(buf, pos)
                if reserved != 0:
                    raise ColumnFileFormatError(
                        "incompatible format: reserved value not zero"
                    )
            total_rows += repeat
            if total_rows > MAX_ROWS_PER_COLUMN_SEGMENT:
                raise ColumnFileFormatError("corrupt input: implausible repeat count")
            if pos >= n:
                raise ColumnFileFormatError("corrupt input: truncated run")
            b0 = buf[pos]
            if (b0 & 0xC0) == 0xC0:
                pos += 1
                if b0 == CODE_NULL:
                    append((None, repeat))
                    continue
                shared_prefix = (b0 & 0x3F) + 2
                suffix_length, pos = get_uint(buf, pos)
                if shared_prefix > len(value):
                    raise ColumnFileFormatError(
                        "corrupt input: shared prefix longer than previous value"
                    )
                if pos + suffix_length > n:
                    raise ColumnFileFormatError("corrupt input: truncated value")
                value = value[:shared_prefix] + buf[pos : pos + suffix_length]
                pos += suffix_length
            else:
                if b0 < 0x80:
                    size = b0
                    pos += 1
                else:
                    size, pos = get_uint(buf, pos)
                if pos + size > n:
                    raise ColumnFileFormatError("corrupt input: truncated value")
                value = buf[pos : pos + size]
                pos += size
            append((value, repeat))
    except IndexError:
        raise ColumnFileFormatError("corrupt input: truncated varint") from None
    return runs


def run_count(runs: list[tuple[bytes | None, int]]) -> int:
    return sum(r for _, r in runs)


def decode_var_fast(buf: bytes):
    """Vectorized decode of a variable-width column buffer whose every
    run is ``varint(repeat<0x80) varint(0) varint(len<0x80) value[len]``
    — the layout our writer emits for non-null string/binary columns
    with short cells (no prefix coding, single-byte varints). Returns
    ``(data_bytes, offsets_int64, reps_int64)`` or None when the buffer
    doesn't match — caller falls back to decode_var_runs_arrays.

    Strategy: hop the run chain with a 2-ops-per-run Python loop
    (``p += 3 + buf[p+2]``), then validate EVERY recovered boundary in
    numpy. The validation makes the speculation exact, not heuristic:
    if at every boundary B the three header bytes satisfy a[B] < 0x80
    (single-byte repeat), a[B+1] == 0 (reserved), a[B+2] < 0x80
    (single-byte literal length — also excludes the 0xC0 control range
    and 0xFF NULL), and the chain terminates at exactly len(buf), then
    by induction the sequential parser would take precisely these
    boundaries and produce the same runs — so there is no input this
    path accepts with a different result than decode_runs. Any NULL,
    prefix-coded run, or multi-byte varint fails a check and falls back.
    """
    n = len(buf)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64), np.zeros(0, dtype=np.int64)
    from array import array

    starts = array("q")
    sa = starts.append
    p = 0
    try:
        while p < n:
            sa(p)
            p += 3 + buf[p + 2]
    except IndexError:
        return None
    if p != n:
        return None
    B = np.frombuffer(starts, dtype=np.int64)
    a = np.frombuffer(buf, dtype=np.uint8)
    h0, h2 = a[B], a[B + 2]
    if not (
        bool((h0 < 0x80).all())
        and bool((a[B + 1] == 0).all())
        and bool((h2 < 0x80).all())
    ):
        return None
    reps = h0.astype(np.int64)
    if int(reps.sum()) > MAX_ROWS_PER_COLUMN_SEGMENT:
        raise ColumnFileFormatError("corrupt input: implausible repeat count")
    lens = h2.astype(np.int64)
    offsets = np.zeros(len(B) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    # ragged gather: every value byte's source position, one fancy index
    idx = np.repeat(B + 3, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    )
    data = a[idx].tobytes()
    return data, offsets, reps


def decode_var_runs_arrays(buf: bytes):
    """One-pass parse of a variable-width (string/binary) column buffer
    into COLUMNAR run arrays, ready to wrap as Arrow buffers:

        (data, ends, reps, nulls)

    - ``data``: bytearray of every non-null run value, concatenated
    - ``ends``: array('q'), cumulative end offset of run i's value in
      ``data`` (a null run repeats the previous end -> zero length)
    - ``reps``: array('q'), run repeat counts
    - ``nulls``: array('b'), 1 where run i is a NULL run

    Same grammar as decode_runs (reference FieldReader::Fill,
    src/columnfile-reader.cc:573-614) including prefix-coded runs and
    multi-byte varints — but it never materializes a per-run Python
    tuple or bytes object for the common literal case (values are
    copied buffer-to-buffer), which is where decode_runs +
    decode_runs_to_arrow spent ~80%% of the 11-column lineitem decode
    (profiled: 4 full generator passes over 600k run tuples). Prefix
    reconstruction reads the previous value back out of ``data``.
    """
    from array import array

    data = bytearray()
    ends = array("q")
    reps = array("q")
    nulls = array("b")
    pos = 0
    n = len(buf)
    total_rows = 0
    prev_off = 0  # previous non-null value's [prev_off, end) within data
    end = 0
    mv = memoryview(buf)
    try:
        while pos < n:
            b = buf[pos]
            if b < 0x80:
                repeat = b
                pos += 1
            else:
                repeat, pos = get_uint(buf, pos)
            b = buf[pos]
            if b == 0:
                pos += 1
            else:
                reserved, pos = get_uint(buf, pos)
                if reserved != 0:
                    raise ColumnFileFormatError(
                        "incompatible format: reserved value not zero"
                    )
            total_rows += repeat
            if total_rows > MAX_ROWS_PER_COLUMN_SEGMENT:
                raise ColumnFileFormatError(
                    "corrupt input: implausible repeat count"
                )
            if pos >= n:
                raise ColumnFileFormatError("corrupt input: truncated run")
            b0 = buf[pos]
            if (b0 & 0xC0) == 0xC0:
                pos += 1
                if b0 == CODE_NULL:
                    reps.append(repeat)
                    nulls.append(1)
                    ends.append(end)
                    continue
                shared_prefix = (b0 & 0x3F) + 2
                suffix_length, pos = get_uint(buf, pos)
                if shared_prefix > end - prev_off:
                    raise ColumnFileFormatError(
                        "corrupt input: shared prefix longer than previous value"
                    )
                if pos + suffix_length > n:
                    raise ColumnFileFormatError("corrupt input: truncated value")
                new_off = end
                data += data[prev_off : prev_off + shared_prefix]
                data += mv[pos : pos + suffix_length]
                pos += suffix_length
                prev_off = new_off
                end = len(data)
            else:
                if b0 < 0x80:
                    size = b0
                    pos += 1
                else:
                    size, pos = get_uint(buf, pos)
                if pos + size > n:
                    raise ColumnFileFormatError("corrupt input: truncated value")
                prev_off = end
                data += mv[pos : pos + size]
                end = len(data)
                pos += size
            reps.append(repeat)
            nulls.append(0)
            ends.append(end)
    except IndexError:
        raise ColumnFileFormatError("corrupt input: truncated varint") from None
    return data, ends, reps, nulls


def decode_fixed_fast(buf: bytes, width: int):
    """Vectorized decode of a column buffer whose every run is
    ``varint(repeat<0x80) varint(0) varint(width) value[width]`` — the
    layout our writer emits for non-null fixed-width columns whenever
    run repeats stay below 128 (single-byte varints). Returns
    ``(values_u8_matrix, repeats)`` as numpy arrays, or None when the
    buffer doesn't match (NULL runs, prefix coding, multi-byte varints,
    variable sizes) — caller falls back to decode_runs.

    This replaces ~1 Python iteration per ROW with a handful of numpy
    passes; measured ~5x on int64/double columns.
    """
    import numpy as np

    stride = 3 + width
    n = len(buf)
    if n == 0 or n % stride:
        return None
    m = np.frombuffer(buf, dtype=np.uint8).reshape(-1, stride)
    # byte0: single-byte repeat varint (not continuation, not control);
    # byte1: reserved == 0; byte2: literal length == width (width < 0x40
    # for every fixed type, so it can't collide with the control range)
    ok = (m[:, 0] < 0x80) & (m[:, 1] == 0) & (m[:, 2] == width)
    if not bool(ok.all()):
        return None
    return np.ascontiguousarray(m[:, 3:]), m[:, 0].astype(np.int64)
