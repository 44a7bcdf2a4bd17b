#!/usr/bin/env python
"""columnfile-cat: scan/project/filter/recompress columnfile data.

Python port of the reference CLI (reference tools/columnfile-cat.cc):

    python tools/columnfile_cat.py [OPTION]... [FILE]...

      --compression=METHOD   output compression (none/snappy/lz4/lzma/zlib)
      --format=FORMAT        column format characters (columnfile-cat.cc:
                             285-320): H/I/Q u16/u32/u64, h/i/q i16/i32/i64,
                             f/d float/double, s text, x hex, _ skip column
      --filter=COL:PATTERN   keep rows whose column COL contains PATTERN
                             (byte substring, columnfile-cat.cc:136-141)
      --output-format=TYPE   text (TSV, default) or columnfile (recompress)

With no FILE, or when FILE is -, read standard input. Multiple FILEs
concatenate (reference O10). FILE may also be a content-addressed
``urn:ca-cas-table:<key>`` handle (reference columnfile-cat.cc:47,
197-209), resolved through the fs layer's CAS root. Unlike the Spark
DataSource, this tool is single-process by design — it mirrors the
reference's operational surface for quick inspection and recompression.
"""

from __future__ import annotations

import argparse
import io
import struct
import sys

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.sources.columnfile.codec import (
    COMPRESSION_NAMES,
    ColumnFileFormatError,
)
from libcolumnfile_spark.sources.columnfile.format import (
    ColumnFileReader,
    ColumnFileWriter,
)

FLUSH_LIMIT = 16 << 20  # reference kFlushLimit, columnfile-cat.cc:49

_STRUCT_CODES = {
    "H": "<H",
    "I": "<I",
    "Q": "<Q",
    "h": "<h",
    "i": "<i",
    "q": "<q",
    "f": "<f",
    "d": "<d",
}


def format_cell(value: bytes, code: str) -> str:
    if code in _STRUCT_CODES:
        fmt = _STRUCT_CODES[code]
        size = struct.calcsize(fmt)
        if len(value) < size:
            raise ColumnFileFormatError(
                f"cell too short for format {code!r}: {len(value)} bytes"
            )
        v = struct.unpack(fmt, value[:size])[0]
        if code == "f":
            return f"{v:g}"
        if code == "d":
            return f"{v:g}"
        return str(v)
    if code == "s":
        return value.decode("utf-8", errors="replace")
    if code == "x":
        return value.hex()
    raise ColumnFileFormatError(f"unknown format character {code!r}")


def _open_reader(path: str, column_filter=None) -> ColumnFileReader:
    if path == "-":
        return ColumnFileReader(sys.stdin.buffer.read(), column_filter=column_filter)
    return ColumnFileReader(path, column_filter=column_filter)


def run(argv: list[str] | None = None, stdout=None) -> int:
    ap = argparse.ArgumentParser(add_help=True)
    ap.add_argument("--compression", default="lz4", choices=sorted(COMPRESSION_NAMES))
    ap.add_argument("--format", default="")
    ap.add_argument("--filter", action="append", default=[])
    ap.add_argument("--output-format", default="text", choices=["text", "columnfile"])
    ap.add_argument("files", nargs="*", default=["-"])
    args = ap.parse_args(argv)
    if not args.files:
        args.files = ["-"]
    out = stdout if stdout is not None else sys.stdout.buffer

    filters: list[tuple[int, bytes]] = []
    for spec in args.filter:
        col, _, pattern = spec.partition(":")
        filters.append((int(col), pattern.encode()))
    filters.sort()

    selected: set[int] | None = None
    if args.format:
        selected = {i for i, ch in enumerate(args.format) if ch != "_"}
        selected.update(col for col, _ in filters)

    def row_passes(row: dict[int, bytes | None]) -> bool:
        for col, pattern in filters:
            v = row.get(col)
            if v is None or pattern not in v:
                return False
        return True

    if args.output_format == "text":
        text_out = io.TextIOWrapper(out, encoding="utf-8", newline="\n")
        for path in args.files:
            with _open_reader(path, column_filter=selected) as reader:
                for row in reader.rows():
                    if filters and not row_passes(row):
                        continue
                    cells = []
                    for col in sorted(row):
                        code = "s"
                        if args.format:
                            if col >= len(args.format):
                                break
                            code = args.format[col]
                        if code == "_":
                            continue
                        v = row[col]
                        cells.append("" if v is None else format_cell(v, code))
                    text_out.write("\t".join(cells))
                    text_out.write("\n")
        text_out.flush()
        text_out.detach()
    else:  # columnfile: concatenate + recompress (reference O11)
        writer = ColumnFileWriter(out, compression=args.compression)
        for path in args.files:
            with _open_reader(path, column_filter=selected) as reader:
                for row in reader.rows():
                    if filters and not row_passes(row):
                        continue
                    writer.put_row(sorted(row.items()))
                    if writer.pending_size > FLUSH_LIMIT:
                        writer.flush()
        writer.finalize()
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(run())
    except ColumnFileFormatError as e:
        print(f"columnfile-cat: {e}", file=sys.stderr)
        raise SystemExit(1) from None
