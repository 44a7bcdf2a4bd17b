"""Columnfile container framing: magic + self-contained segments.

File layout (reference write path src/columnfile-writer.cc:55-111, read
path src/columnfile-reader.cc:115-234):

    magic (4 bytes: \\n \\t " \\0)
    repeat:
        uint32 big-endian   header size (excluding these 4 bytes)
        varint              compression
        varint              field count
        field count x (varint column index, varint compressed size)
        per-column blobs, back to back, in header order

Segments are self-contained (each re-declares its column set and
compression), which is what makes the format appendable/tail-able and
lets a distributed reader split a file at segment boundaries: any
(offset, length) range of whole segments is independently decodable —
that property is what our Spark DataSource partitions on.
"""

from __future__ import annotations

import io
import os
from dataclasses import dataclass, field

from libcolumnfile_spark.sources.columnfile.fs import (
    fs_open_input,
    fs_open_output,
    fs_size,
)
from libcolumnfile_spark.sources.columnfile.codec import (
    COMPRESSION_DEFAULT,
    COMPRESSION_NAMES,
    MAGIC,
    ColumnFileFormatError,
    RunEncoder,
    decode_runs,
    decompress_block,
    get_uint,
    put_uint,
    run_count,
)


@dataclass
class SegmentMeta:
    """Parsed segment header + where its blobs live in the file."""

    offset: int  # file offset of the 4-byte header-size word
    compression: int
    fields: list[tuple[int, int]]  # (column index, blob size) in file order
    data_offset: int  # file offset of the first blob
    data_size: int  # total blob bytes

    @property
    def end_offset(self) -> int:
        return self.data_offset + self.data_size


def parse_segment_header(
    header: bytes, offset: int, data_offset: int
) -> SegmentMeta:
    compression, pos = get_uint(header, 0)
    field_count, pos = get_uint(header, pos)
    # each field meta is >= 2 bytes; reject absurd counts before allocating
    if field_count > max(0, len(header) - pos) // 2 + 1:
        raise ColumnFileFormatError("corrupt input: field count exceeds header")
    fields = []
    total = 0
    for _ in range(field_count):
        idx, pos = get_uint(header, pos)
        size, pos = get_uint(header, pos)
        fields.append((idx, size))
        total += size
    return SegmentMeta(
        offset=offset,
        compression=compression,
        fields=fields,
        data_offset=data_offset,
        data_size=total,
    )


def scan_segments(path: str, partial_ok: bool = False) -> list[SegmentMeta]:
    """Walk a file's segment headers without touching blob data (the
    header tells us each blob's size, so we seek past — the same
    coalesced-seek trick as the reference's column skip,
    src/columnfile-reader.cc:156-196, applied at whole-segment scale).

    ``partial_ok=True`` is the STREAMING-tail contract (reference O23:
    the writer appends a whole segment then pubsyncs, so a reader
    racing an in-flight append sees a complete-segment prefix plus a
    torn tail): any malformed data at the CURRENT scan position stops
    the walk and returns the complete prefix instead of raising — the
    tail is in-flight, not corrupt, and re-scanning after the writer's
    next sync picks it up. Batch readers keep the strict default
    (``partial_ok=False``): a torn tail there IS corruption and must
    raise (O26 fuzz-safety pins that). A magic-header mismatch raises
    in both modes — the file is fundamentally not a columnfile."""
    out: list[SegmentMeta] = []
    file_size = fs_size(path)
    with fs_open_input(path) as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ColumnFileFormatError("magic header mismatch")
        pos = 4
        while pos < file_size:
            try:
                f.seek(pos)
                word = f.read(4)
                if len(word) == 0:
                    break
                if len(word) < 4:
                    raise ColumnFileFormatError("short read")
                header_size = int.from_bytes(word, "big")
                if pos + 4 + header_size > file_size:
                    raise ColumnFileFormatError(
                        "corrupt input: header exceeds file"
                    )
                header = f.read(header_size)
                if len(header) != header_size:
                    raise ColumnFileFormatError("short read")
                seg = parse_segment_header(header, pos, pos + 4 + header_size)
                if seg.end_offset > file_size:
                    raise ColumnFileFormatError(
                        "corrupt input: segment exceeds file"
                    )
            except ColumnFileFormatError:
                if partial_ok:
                    break  # in-flight tail: the complete prefix stands
                raise
            out.append(seg)
            pos = seg.end_offset
    return out


def read_segment_columns(
    f, seg: SegmentMeta, columns: set[int] | None = None
) -> dict[int, list[tuple[bytes | None, int]]]:
    """Read + decompress + run-decode the requested columns of one
    segment. Unrequested blobs are seeked past, never read (reference
    SetColumnFilter semantics, src/columnfile.h:231-238)."""
    out: dict[int, list[tuple[bytes | None, int]]] = {}
    pos = seg.data_offset
    for idx, size in seg.fields:
        if columns is None or idx in columns:
            f.seek(pos)
            blob = f.read(size)
            if len(blob) != size:
                raise ColumnFileFormatError("short read")
            out[idx] = decode_runs(decompress_block(blob, seg.compression))
        pos += size
    return out


def expand_runs(runs: list[tuple[bytes | None, int]]) -> list[bytes | None]:
    out: list[bytes | None] = []
    for value, repeat in runs:
        out.extend([value] * repeat)
    return out


class ColumnFileWriter:
    """Row-at-a-time columnfile writer (reference ColumnFileWriter,
    src/columnfile.h:110-152).

    ``put(column, bytes)`` / ``put_null(column)`` buffer into per-column
    run encoders; ``flush()`` emits one segment; ``pending_size`` drives
    the caller's segment-size policy (the reference's PendingSize +
    16 MiB kFlushLimit pattern, tools/columnfile-cat.cc:49,339).
    """

    def __init__(self, sink, compression: int | str = COMPRESSION_DEFAULT):
        if isinstance(sink, (str, os.PathLike)):
            self._f = fs_open_output(os.fspath(sink))
            self._owns = True
        else:
            self._f = sink
            self._owns = False
        if isinstance(compression, str):
            try:
                compression = COMPRESSION_NAMES[compression]
            except KeyError:
                raise ColumnFileFormatError(
                    f"unsupported compression algorithm {compression!r}"
                ) from None
        self.compression = compression
        self._fields: dict[int, RunEncoder] = {}
        self.pending_size = 0
        self.segment_offsets: list[int] = []
        self.segment_rows: list[int] = []
        self._pending_rows = 0
        self._f.write(MAGIC)
        self._pos = 4
        self._finalized = False

    def put(self, column: int, value: bytes) -> None:
        enc = self._fields.get(column)
        if enc is None:
            enc = self._fields[column] = RunEncoder()
        enc.put(value)
        self.pending_size += len(value)

    def put_null(self, column: int) -> None:
        enc = self._fields.get(column)
        if enc is None:
            enc = self._fields[column] = RunEncoder()
        enc.put_null()
        self.pending_size += 1

    def put_raw_runs(self, column: int, encoded: bytes) -> None:
        """Append pre-encoded run bytes (e.g. the vectorized fixed-width
        encoder's output) to a column. Any pending run is flushed first
        and the prefix-coding state reset, so a later put() never emits a
        prefix run referencing a value inside the raw block."""
        enc = self._fields.get(column)
        if enc is None:
            enc = self._fields[column] = RunEncoder()
        enc.flush_run()
        enc.data += encoded
        enc._value = b""
        enc._is_null = True
        enc._shared_prefix = 0
        self.pending_size += len(encoded)

    def put_row(self, row) -> None:
        """row: iterable of (column, bytes | None), column-sorted."""
        for column, value in row:
            if value is None:
                self.put_null(column)
            else:
                self.put(column, value)
        self._pending_rows += 1

    def add_rows(self, n: int) -> None:
        """Row accounting for callers that use put()/put_null() directly
        (column-at-a-time writers like the DataSource batch path)."""
        self._pending_rows += n

    def flush(self) -> tuple[int, int, int] | None:
        """Emit one segment; returns (offset, length, rows) or None if
        nothing was buffered."""
        if not self._fields:
            return None
        blobs = []
        header = bytearray()
        put_uint(header, self.compression)
        put_uint(header, len(self._fields))
        for column in sorted(self._fields):
            blob = self._fields[column].finalize(self.compression)
            put_uint(header, column)
            put_uint(header, len(blob))
            blobs.append(blob)
        offset = self._pos
        rows = self._pending_rows
        self.segment_offsets.append(offset)
        self.segment_rows.append(rows)
        self._f.write(len(header).to_bytes(4, "big"))
        self._f.write(header)
        self._pos += 4 + len(header)
        for blob in blobs:
            self._f.write(blob)
            self._pos += len(blob)
        self._f.flush()
        self._fields.clear()
        self.pending_size = 0
        self._pending_rows = 0
        return (offset, self._pos - offset, rows)

    def finalize(self) -> None:
        if self._finalized:
            return
        self.flush()
        self._finalized = True
        if self._owns:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finalize()


class ColumnFileReader:
    """Row-at-a-time columnfile reader (reference ColumnFileReader,
    src/columnfile.h:210-268). Accepts a path or bytes.

    Iteration matches the reference's union semantics: each segment
    declares its own column set; ``rows()`` yields dicts whose keys are
    whatever columns still have values (exhausted columns drop out,
    src/columnfile-reader.cc:381-388).
    """

    def __init__(self, source, column_filter: set[int] | None = None):
        if isinstance(source, (bytes, bytearray, memoryview)):
            self._f = io.BytesIO(bytes(source))
            self._path = None
            magic = self._f.read(4)
            if magic != MAGIC:
                raise ColumnFileFormatError("magic header mismatch")
            self._size = len(source)
        else:
            self._path = os.fspath(source)
            self._f = fs_open_input(self._path)
            magic = self._f.read(4)
            if magic != MAGIC:
                raise ColumnFileFormatError("magic header mismatch")
            self._size = fs_size(self._path)
        self.column_filter = column_filter

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def segments(self):
        """Yield SegmentMeta one at a time (streaming; tolerates a file
        that is still being appended past the last complete segment)."""
        pos = 4
        f = self._f
        while pos < self._size:
            f.seek(pos)
            word = f.read(4)
            if len(word) == 0:
                return
            if len(word) < 4:
                raise ColumnFileFormatError("short read")
            header_size = int.from_bytes(word, "big")
            if pos + 4 + header_size > self._size:
                raise ColumnFileFormatError("corrupt input: header exceeds file")
            header = f.read(header_size)
            if len(header) != header_size:
                raise ColumnFileFormatError("short read")
            seg = parse_segment_header(header, pos, pos + 4 + header_size)
            if seg.end_offset > self._size:
                raise ColumnFileFormatError("corrupt input: segment exceeds file")
            yield seg
            pos = seg.end_offset

    def segment_columns(self, seg: SegmentMeta):
        cols = self.column_filter
        return read_segment_columns(self._f, seg, cols)

    def rows(self):
        """Yield rows as dict[column -> bytes|None], reference GetRow
        semantics (columns with fewer values drop out of later rows)."""
        for seg in self.segments():
            columns = {
                idx: expand_runs(runs)
                for idx, runs in self.segment_columns(seg).items()
            }
            if not columns:
                continue
            n = max(len(v) for v in columns.values())
            for i in range(n):
                yield {
                    idx: values[i]
                    for idx, values in columns.items()
                    if i < len(values)
                }


def read_segment_raw(
    f, seg: SegmentMeta, columns: set[int] | None = None
) -> dict[int, bytes]:
    """Like read_segment_columns but stops after decompression — the
    caller picks the decode strategy (vectorized fixed-width fast path
    vs the general run decoder)."""
    out: dict[int, bytes] = {}
    pos = seg.data_offset
    for idx, size in seg.fields:
        if columns is None or idx in columns:
            f.seek(pos)
            blob = f.read(size)
            if len(blob) != size:
                raise ColumnFileFormatError("short read")
            out[idx] = decompress_block(blob, seg.compression)
        pos += size
    return out
