#!/usr/bin/env python
"""columnfile-sort: external sort / merge of columnfile data.

Python port of the reference CLI (reference tools/columnfile-sort.cc):

    python tools/columnfile_sort.py [OPTION]... [FILE]...

      --buffer-size=MB   in-memory run size before spilling (default 1024,
                         columnfile-sort.cc:252)
      --merge            inputs are already sorted; heap-merge only
                         (columnfile-sort.cc:232-245)

FILE may be a content-addressed ``urn:ca-cas-table:<key>`` handle
(reference columnfile-sort.cc:247,309-318), resolved through the fs
layer's CAS root.

Rows sort lexicographically by the full row — (column id, then value
bytes), NULL before any value — matching std::sort over
vector<pair<uint32, optional<string_view>>> (columnfile-sort.cc:112).
Run generation spills sorted runs to temp columnfiles; runs heap-merge
into the output (columnfile-sort.cc:151-230; Python's heapq.merge is
the lazy k-way heap). Output is a columnfile on stdout.

The Spark-native equivalent of this whole tool is ``df.orderBy(...)``
(range-partitioned shuffle + per-partition spill sort, SURVEY.md O12);
this CLI mirrors the reference's single-node operational surface.
"""

from __future__ import annotations

import argparse
import heapq
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.sources.columnfile.codec import ColumnFileFormatError
from libcolumnfile_spark.sources.columnfile.format import (
    ColumnFileReader,
    ColumnFileWriter,
)

FLUSH_LIMIT = 128 << 20  # reference kFlushLimit, columnfile-sort.cc:34
MERGE_BATCH = 8  # reference kBatchSize, columnfile-sort.cc:374


def row_key(row_items: list[tuple[int, bytes | None]]):
    """Sort key matching the reference's optional<> ordering:
    NULL (disengaged optional) sorts before any value."""
    return [(col, v is not None, b"" if v is None else v) for col, v in row_items]


def _spill_run(rows: list[list[tuple[int, bytes | None]]]) -> str:
    rows.sort(key=row_key)
    f = tempfile.NamedTemporaryFile(
        prefix="colsort-", suffix=".col", delete=False
    )
    writer = ColumnFileWriter(f, compression="lz4")
    for row in rows:
        writer.put_row(row)
        if writer.pending_size > FLUSH_LIMIT:
            writer.flush()
    writer.finalize()
    f.close()
    return f.name


def _iter_sorted(path: str):
    with ColumnFileReader(path) as r:
        for row in r.rows():
            yield sorted(row.items())


def _merge_to(sources: list, writer: ColumnFileWriter) -> None:
    for row in heapq.merge(*sources, key=row_key):
        writer.put_row(row)
        if writer.pending_size > FLUSH_LIMIT:
            writer.flush()


def _merge_to_temp(sources: list) -> str:
    f = tempfile.NamedTemporaryFile(prefix="colmerge-", suffix=".col", delete=False)
    writer = ColumnFileWriter(f, compression="lz4")
    _merge_to(sources, writer)
    writer.finalize()
    f.close()
    return f.name


def run(argv: list[str] | None = None, stdout=None) -> int:
    ap = argparse.ArgumentParser(add_help=True)
    ap.add_argument("--buffer-size", type=int, default=1024, metavar="MB")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("files", nargs="*", default=["-"])
    args = ap.parse_args(argv)
    if not args.files:
        args.files = ["-"]
    out = stdout if stdout is not None else sys.stdout.buffer
    writer = ColumnFileWriter(out, compression="lz4")

    def open_rows(path: str):
        if path == "-":
            return ColumnFileReader(sys.stdin.buffer.read())
        return ColumnFileReader(path)

    if args.merge:
        # pre-sorted inputs: single k-way heap merge
        readers = [open_rows(p) for p in args.files]
        try:
            _merge_to(
                [(sorted(row.items()) for row in r.rows()) for r in readers], writer
            )
        finally:
            for r in readers:
                r.close()
        writer.finalize()
        return 0

    # run generation: buffer rows up to --buffer-size MB, spill sorted runs
    buffer_limit = args.buffer_size * (1 << 20)
    runs: list[str] = []
    rows: list[list[tuple[int, bytes | None]]] = []
    fill = 0
    for path in args.files:
        with open_rows(path) as reader:
            for row in reader.rows():
                items = sorted(row.items())
                rows.append(items)
                fill += sum(len(v) for _, v in items if v is not None) + 48 * len(items)
                if fill >= buffer_limit:
                    runs.append(_spill_run(rows))
                    rows, fill = [], 0

    if not runs:  # everything fit in memory: sort + emit directly
        rows.sort(key=row_key)
        for row in rows:
            writer.put_row(row)
            if writer.pending_size > FLUSH_LIMIT:
                writer.flush()
        writer.finalize()
        return 0

    if rows:
        runs.append(_spill_run(rows))
        rows = []

    # merge runs in batches of MERGE_BATCH until one remains
    # (reference columnfile-sort.cc:374-387)
    while len(runs) > MERGE_BATCH:
        batch, runs = runs[:MERGE_BATCH], runs[MERGE_BATCH:]
        runs.append(_merge_to_temp([_iter_sorted(p) for p in batch]))
    _merge_to([_iter_sorted(p) for p in runs], writer)
    writer.finalize()
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(run())
    except ColumnFileFormatError as e:
        print(f"columnfile-sort: {e}", file=sys.stderr)
        raise SystemExit(1) from None
