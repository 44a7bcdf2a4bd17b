"""Streaming read/write for the columnfile format.

The reference's streaming story (O23) is structural: segments are
self-contained and appended atomically (writer pubsync per segment,
src/columnfile-writer.cc:84), so a directory of ``.col`` files is
tail-able. This module turns that into Structured Streaming sources and
sinks:

- ``ColumnFileStreamReader``: offsets are ``{file -> end byte of last
  complete segment}``; each micro-batch reads exactly the segments that
  appeared since the previous offset — new files AND segments appended
  to existing files. Segment discovery touches only headers (4-byte
  size + header bytes, blobs seeked past), so ``latestOffset`` is cheap
  even on large files.
- ``ColumnFileStreamWriter``: each micro-batch commit appends its part
  files to the manifest (exactly-once via Spark's checkpointed batch
  ids: an already-committed batchId is skipped).
"""

from __future__ import annotations

import fnmatch
import json
import os
import posixpath
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from libcolumnfile_spark.sources.columnfile.fs import (
    fs_exists,
    fs_isdir,
    fs_isfile,
    fs_join,
    fs_listdir,
    fs_makedirs,
    fs_read_text,
    fs_write_text,
)
from libcolumnfile_spark.sources.columnfile.format import scan_segments


@dataclass
class ColumnFileStreamPartition(InputPartition):
    file: str
    segments: list[tuple[int, int]]  # (offset, rows_hint)


def _complete_files(path: str) -> list[str]:
    if fs_isfile(path):
        return [path]
    if not fs_isdir(path):
        return []
    return sorted(
        fs_join(path, n)
        for n in fs_listdir(path)
        if fnmatch.fnmatch(n, "*.col")
    )


class ColumnFileStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        from libcolumnfile_spark.sources.columnfile.datasource import (
            ColumnFileReader as _BatchReader,
        )

        self.options = options
        self.schema = schema
        self.path = options.get("path")
        # reuse the batch reader for schema->column-index mapping + read()
        self._batch = _BatchReader(options, schema)

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        files = {}
        for f in _complete_files(self.path):
            try:
                # partial_ok: a writer's in-flight append leaves a torn
                # tail; the COMPLETE-segment prefix is still consumable
                # now (skipping the whole file would starve a file whose
                # writer always has a segment in flight). The torn tail
                # is picked up once the writer's next sync completes it.
                segs = scan_segments(f, partial_ok=True)
            except Exception:
                continue  # not a columnfile yet (mid-create): next batch
            if segs:
                files[posixpath.basename(f) if "://" in f else os.path.basename(f)] = segs[-1].end_offset
        return {"files": files}

    def partitions(self, start: dict, end: dict):
        start_files = start.get("files", {})
        parts = []
        for name, end_byte in end.get("files", {}).items():
            full = self.path if fs_isfile(self.path) else fs_join(self.path, name)
            from_byte = start_files.get(name, 0)
            if end_byte <= from_byte:
                continue
            # partial_ok here too: the file can grow (and tear) between
            # latestOffset and this call; the <= end_byte filter already
            # pins exactly-once, the tolerant scan just keeps a racing
            # append from failing the batch
            segs = [
                (s.offset, -1)
                for s in scan_segments(full, partial_ok=True)
                if s.offset >= max(from_byte, 4) and s.end_offset <= end_byte
            ]
            if segs:
                parts.append(ColumnFileStreamPartition(full, segs))
        if not parts:
            parts.append(ColumnFileStreamPartition("", []))
        return parts

    def read(self, partition: ColumnFileStreamPartition):
        from libcolumnfile_spark.sources.columnfile.datasource import (
            ColumnFilePartition,
        )

        yield from self._batch.read(
            ColumnFilePartition(partition.file, partition.segments)
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are derived from the files themselves


class ColumnFileStreamWriter:
    """DataSourceStreamWriter facade over the batch Arrow writer.

    Implemented lazily (class created at call time) because the base
    class for streaming writers shares the batch writer's write()
    semantics; only commit carries a batchId.
    """

    def __new__(cls, options, schema):
        from pyspark.sql.datasource import DataSourceStreamWriter

        from libcolumnfile_spark.sources.columnfile.datasource import (
            MANIFEST_FILE,
            SCHEMA_FILE,
            ColumnFileArrowWriter,
        )

        class _Writer(DataSourceStreamWriter):
            def __init__(self, options, schema):
                self._delegate = ColumnFileArrowWriter(options, schema)
                self.path = self._delegate.path

            def write(self, iterator):
                import pyarrow as pa

                # streaming writers receive Rows; convert to one batch
                rows = list(iterator)
                if not rows:
                    from libcolumnfile_spark.sources.columnfile.datasource import (
                        ColumnFileCommitMessage,
                    )

                    return ColumnFileCommitMessage("", [], 0)
                names = schema.fieldNames()
                cols = {n: [getattr(r, n) for r in rows] for n in names}
                from libcolumnfile_spark.sources.columnfile.typed import (
                    arrow_schema_for,
                )

                batch = pa.RecordBatch.from_pydict(
                    cols, schema=arrow_schema_for(schema)
                )
                return self._delegate.write(iter([batch]))

            def commit(self, messages, batchId: int) -> None:
                ledger = fs_join(self.path, "_batches.json")
                seen = []
                if fs_exists(ledger):
                    seen = json.loads(fs_read_text(ledger))["batches"]
                if batchId in seen:
                    return  # replayed micro-batch: drop for exactly-once
                self._delegate.commit(messages)
                fs_write_text(ledger, json.dumps({"batches": seen + [batchId]}))

            def abort(self, messages, batchId: int) -> None:
                self._delegate.abort(messages)

        fs_makedirs(options.get("path"))
        return _Writer(options, schema)
