"""Spark Python DataSource for the columnfile format.

Usage:
    from libcolumnfile_spark.sources.columnfile import register
    register(spark)
    df.write.format("columnfile").option("compression", "lz4").save(path)
    spark.read.format("columnfile").load(path)          # schema from sidecar
    spark.read.format("columnfile").schema(ddl).load(p) # explicit schema

Layout: ``path`` is a directory of ``part-*.col`` files (bit-compatible
with the reference format — each is magic + self-contained segments,
reference src/columnfile-writer.cc:55-111), plus sidecars that the
reference leaves to caller convention:

- ``_schema.json``: the Spark schema; field position i = column index i
  (the format itself is typeless, src/columnfile.h:63).
- ``part-*.col.stats.json``: per-segment row counts + min/max/nulls for
  planner-side segment skipping (see stats.py).
- ``_manifest.json``: committed part files (makes task retries safe:
  uncommitted stragglers are ignored by readers).

A bare ``.col`` file path (e.g. written by the reference
implementation) is also readable — pass an explicit schema; field i
maps to column index i.

Scale design:
- one InputPartition per ~``partition_bytes`` of consecutive segments,
  so a large file fans out across executors exactly like Parquet
  row-group splits;
- pushed filters prune whole segments via sidecar stats before any I/O
  (planner-side analog of the reference's ColumnFileSelect chunk skip,
  src/columnfile-select.cc:172-176); all filters are also returned to
  Spark as unsupported so FilterExec re-applies them — pruning is an
  optimization, never a correctness dependency;
- data crosses into the JVM as Arrow RecordBatches (one per segment).
"""

from __future__ import annotations

import fnmatch
import json
import os
import uuid
from dataclasses import dataclass

from libcolumnfile_spark.sources.columnfile.fs import (
    fs_dirname,
    fs_exists,
    fs_isdir,
    fs_isfile,
    fs_join,
    fs_listdir,
    fs_makedirs,
    fs_open_input,
    fs_read_text,
    fs_remove,
    fs_write_text,
)

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    Filter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from libcolumnfile_spark.sources.columnfile.codec import (
    COMPRESSION_NAMES,
    ColumnFileFormatError,
)
from libcolumnfile_spark.sources.columnfile.format import (
    ColumnFileWriter,
    read_segment_columns,
    read_segment_raw,
    scan_segments,
)
from libcolumnfile_spark.sources.columnfile.stats import (
    ColumnStats,
    read_stats,
    segment_can_be_skipped,
    segment_stats_entry,
    write_stats,
    _to_stats_value,
)
from libcolumnfile_spark.sources.columnfile.capnp import (
    flatten_schema_capnp,
    rebuild_column_capnp,
)
from libcolumnfile_spark.sources.columnfile.typed import (
    decode_buf_to_arrow,
    decode_runs_to_arrow,
    encode_fixed_fast,
    encode_var_fast,
    encoder_for,
    flatten_batch_arrays,
    flatten_schema,
    rebuild_column,
)

SCHEMA_FILE = "_schema.json"
MANIFEST_FILE = "_manifest.json"


# ---------------------------------------------------------------------------
# In-scan filter evaluation (reference ColumnFileSelect two-phase scan,
# src/columnfile-select.cc:79-211): filter columns decode FIRST; when no
# row of a segment survives, the remaining columns are never
# decompressed. Only VALUE predicates are evaluated (null never passes),
# which is what makes the all-false segment skip safe even when other
# columns of the segment carry more rows (their filter value would be
# null). Every filter is still reported unsupported to Spark, so
# FilterExec re-applies them — in-scan evaluation is an optimization,
# never a correctness dependency.
# ---------------------------------------------------------------------------


def _value_filter_mask(f: Filter, arr: pa.Array):
    """pyarrow boolean mask for one value predicate (nulls -> False)."""
    import pyarrow.compute as pc
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
        StringContains,
        StringEndsWith,
        StringStartsWith,
    )

    t = type(f)
    if t is EqualTo:
        m = pc.equal(arr, f.value)
    elif t is GreaterThan:
        m = pc.greater(arr, f.value)
    elif t is GreaterThanOrEqual:
        m = pc.greater_equal(arr, f.value)
    elif t is LessThan:
        m = pc.less(arr, f.value)
    elif t is LessThanOrEqual:
        m = pc.less_equal(arr, f.value)
    elif t is In:
        m = pc.is_in(arr, value_set=pa.array(list(f.value), type=arr.type))
    elif t is StringContains:
        m = pc.match_substring(arr, f.value)
    elif t is StringStartsWith:
        m = pc.starts_with(arr, f.value)
    elif t is StringEndsWith:
        m = pc.ends_with(arr, f.value)
    else:
        return None
    return pc.fill_null(m, False)


_VALUE_FILTER_TYPES = (
    "EqualTo", "GreaterThan", "GreaterThanOrEqual", "LessThan",
    "LessThanOrEqual", "In", "StringContains", "StringStartsWith",
    "StringEndsWith",
)
DEFAULT_SEGMENT_BYTES = 16 << 20  # reference kFlushLimit, columnfile-cat.cc:49
DEFAULT_PARTITION_BYTES = 128 << 20
DEFAULT_BATCH_ROWS = 1 << 16


def _is_col_file(path: str) -> bool:
    return path.endswith(".col")


def _data_files(path: str) -> list[str]:
    """Resolve the part files for a dataset path (manifest-aware).

    All lookups route through the fs layer, so ``path`` may live on any
    supported filesystem (reference O25 pluggable storage backends,
    src/columnfile.h:91-108; tools/columnfile-cat.cc:199-209).
    """
    if fs_isfile(path):
        return [path]
    if not fs_isdir(path):
        raise ColumnFileFormatError(f"no such columnfile dataset: {path}")
    manifest = fs_join(path, MANIFEST_FILE)
    if fs_exists(manifest):
        names = json.loads(fs_read_text(manifest))["files"]
        return [fs_join(path, n) for n in names]
    return sorted(
        fs_join(path, n)
        for n in fs_listdir(path)
        if fnmatch.fnmatch(n, "*.col")
    )


def _load_sidecar(path: str) -> dict | None:
    base = path if fs_isdir(path) else fs_dirname(path)
    sidecar = fs_join(base, SCHEMA_FILE)
    if not fs_exists(sidecar):
        return None
    return json.loads(fs_read_text(sidecar))


def _load_sidecar_schema(path: str) -> StructType | None:
    doc = _load_sidecar(path)
    return None if doc is None else StructType.fromJson(doc["schema"])


@dataclass
class ColumnFilePartition(InputPartition):
    file: str
    # (offset, rows_hint) per segment; rows_hint -1 when unknown
    segments: list[tuple[int, int]]


@dataclass
class ColumnFileCommitMessage(WriterCommitMessage):
    file_name: str
    stats_entries: list[dict]
    rows: int


class ColumnFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "columnfile"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ColumnFileFormatError("columnfile: 'path' option is required")
        schema = _load_sidecar_schema(path)
        if schema is None:
            raise ColumnFileFormatError(
                "columnfile: no _schema.json sidecar; pass an explicit "
                ".schema(...) (field position i = column index i)"
            )
        return schema

    def reader(self, schema: StructType) -> "ColumnFileReader":
        return ColumnFileReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "ColumnFileArrowWriter":
        path = self.options.get("path")
        if not path:
            raise ColumnFileFormatError("columnfile: 'path' option is required")
        fs_makedirs(path)
        if overwrite:
            for n in fs_listdir(path):
                if n.endswith(".col") or n.endswith(".json"):
                    fs_remove(fs_join(path, n))
        return ColumnFileArrowWriter(self.options, schema)

    def streamReader(self, schema: StructType):
        from libcolumnfile_spark.sources.columnfile.stream import (
            ColumnFileStreamReader,
        )

        return ColumnFileStreamReader(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        from libcolumnfile_spark.sources.columnfile.stream import (
            ColumnFileStreamWriter,
        )

        return ColumnFileStreamWriter(self.options, schema)


class ColumnFileReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.options = options
        self.read_schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ColumnFileFormatError("columnfile: 'path' option is required")
        self.partition_bytes = int(
            options.get("partition_bytes", DEFAULT_PARTITION_BYTES)
        )
        self._filters: list[Filter] = []
        self._eval_filters: list[Filter] = []
        # Map each top-level read-schema field to its on-disk leaf column
        # indexes (a struct spans several consecutive leaves — reference
        # record shredding, columnfile-capnp.cc:94-149). Mapping comes
        # from the stored schema when present (supports subset reads),
        # else it's positional over the read schema's own flattening.
        # The list layout (in-cell vs reference count-column shredding,
        # capnp.py) comes from the option, else the sidecar, else "cell".
        doc = _load_sidecar(self.path)
        stored = None if doc is None else StructType.fromJson(doc["schema"])
        self.list_layout = options.get(
            "list_layout", (doc or {}).get("list_layout", "cell")
        )
        if self.list_layout not in ("cell", "capnp"):
            raise ColumnFileFormatError(
                f"columnfile: unknown list_layout {self.list_layout!r}"
            )
        _flatten = flatten_schema_capnp if self.list_layout == "capnp" else flatten_schema
        base = stored if stored is not None else schema
        stored_leaves = _flatten(base)
        by_field: dict[str, list[int]] = {}
        for i, (name, _dt) in enumerate(stored_leaves):
            by_field.setdefault(name.split(".", 1)[0].split("#", 1)[0], []).append(i)
        self.field_leaves: list[tuple[list[int], list]] = []
        for f in schema.fields:
            if f.name not in by_field:
                raise ColumnFileFormatError(
                    f"columnfile: column {f.name!r} not in stored schema"
                )
            idxs = by_field[f.name]
            # leaf dtypes come from the READ schema (flattened the same
            # way), so casts the user requests are honored per leaf
            leaf_dts = [dt for _, dt in _flatten(StructType([f]))]
            if len(leaf_dts) != len(idxs):
                raise ColumnFileFormatError(
                    f"columnfile: column {f.name!r} shape mismatch vs stored schema"
                )
            self.field_leaves.append((idxs, leaf_dts))

    def pushFilters(self, filters: list[Filter]):
        # Keep every filter for stats-based segment pruning, but report
        # all of them unsupported: Spark re-evaluates, so pruning can
        # never break correctness (exactly Parquet's row-group model).
        self._filters = list(filters)
        # Value predicates on single-leaf top-level columns are ALSO
        # evaluated inside the scan (two-phase segment read; see module
        # comment): pick them out once, driver-side.
        single_leaf = {
            f.name: i
            for f, (idxs, _dts) in zip(self.read_schema.fields, self.field_leaves)
            if len(idxs) == 1
            for i in idxs
        }
        self._eval_filters = [
            f
            for f in filters
            if type(f).__name__ in _VALUE_FILTER_TYPES
            and len(f.attribute) == 1
            and f.attribute[0] in single_leaf
        ] if self.list_layout == "cell" else []
        return filters

    def partitions(self):
        parts: list[ColumnFilePartition] = []
        for file in _data_files(self.path):
            entries = read_stats(file)
            if entries is None:
                entries = [
                    {"offset": s.offset, "length": s.end_offset - s.offset, "rows": -1}
                    for s in scan_segments(file)
                ]
            current: list[tuple[int, int]] = []
            current_bytes = 0
            for e in entries:
                if self._filters and segment_can_be_skipped(e, self._filters):
                    continue
                current.append((e["offset"], e.get("rows", -1)))
                current_bytes += e.get("length") or 0
                if current_bytes >= self.partition_bytes:
                    parts.append(ColumnFilePartition(file, current))
                    current, current_bytes = [], 0
            if current:
                parts.append(ColumnFilePartition(file, current))
        # zero matching segments: one empty partition keeps Spark happy
        if not parts:
            parts.append(ColumnFilePartition("", []))
        return parts

    def read(self, partition: ColumnFilePartition):
        if not partition.file:
            return
        fields = self.read_schema.fields
        wanted = {i for idxs, _ in self.field_leaves for i in idxs}
        want_offsets = {off for off, _ in partition.segments}
        capnp_mode = self.list_layout == "capnp"
        # two-phase scan setup: leaf index + read dtype per evaluable
        # filter column (single-leaf by construction, see pushFilters)
        leaf_of = {
            fld.name: (idxs[0], dts[0])
            for fld, (idxs, dts) in zip(fields, self.field_leaves)
            if len(idxs) == 1
        }
        eval_filters = [] if capnp_mode else self._eval_filters
        filter_idxs = {leaf_of[f.attribute[0]][0] for f in eval_filters}
        with fs_open_input(partition.file) as f:
            # segment headers must be parsed in file order (cheap: header
            # bytes only); blobs of unselected segments are seeked past.
            for seg in scan_segments(partition.file):
                if seg.offset not in want_offsets:
                    continue
                mask = None
                decoded: dict[int, pa.Array] = {}
                if eval_filters:
                    # phase 1: decompress + decode ONLY the filter
                    # columns; all-false => the segment's remaining
                    # columns are never decompressed (reference
                    # columnfile-select.cc:172-176)
                    fbufs = read_segment_raw(f, seg, filter_idxs)
                    # decode OUTSIDE the try: corrupt input must raise
                    # the clean format error, not silently drop a column
                    for name, (idx, dt) in leaf_of.items():
                        if idx in filter_idxs:
                            decoded[idx] = decode_buf_to_arrow(
                                fbufs.get(idx, b""), dt
                            )
                    try:
                        import pyarrow.compute as pc

                        lengths = {len(decoded[i]) for i in filter_idxs}
                        if len(lengths) == 1:
                            for flt in eval_filters:
                                arr = decoded[leaf_of[flt.attribute[0]][0]]
                                m = _value_filter_mask(flt, arr)
                                if m is None:
                                    continue
                                mask = m if mask is None else pc.and_(mask, m)
                            if mask is not None and not pc.any(mask).as_py():
                                continue  # segment skipped, phase 2 never runs
                    except Exception:
                        # evaluation is best-effort; Spark re-applies
                        # every filter anyway
                        mask = None
                bufs_by_idx = read_segment_raw(f, seg, wanted - filter_idxs)
                for idx in filter_idxs:
                    bufs_by_idx[idx] = b""  # already decoded into `decoded`
                if capnp_mode:
                    # element leaves are RAGGED (rows per element, not per
                    # record) — no padding; reassembly is per segment
                    # (capnp.py module docstring)
                    arrays = [
                        rebuild_column_capnp(
                            field.dataType,
                            [
                                decode_buf_to_arrow(bufs_by_idx.get(i, b""), dt)
                                for i, dt in zip(idxs, leaf_dts)
                            ],
                        )
                        for field, (idxs, leaf_dts) in zip(fields, self.field_leaves)
                    ]
                    if not arrays or len(arrays[0]) == 0:
                        continue
                    yield pa.RecordBatch.from_arrays(
                        arrays, names=[fl.name for fl in fields]
                    )
                    continue
                # decode every wanted leaf, tracking the segment row count
                # (filter leaves were decoded in phase 1 and are reused)
                leaf_arrays: dict[int, pa.Array] = {}
                n_rows = 0
                for (idxs, leaf_dts) in self.field_leaves:
                    for idx, dt in zip(idxs, leaf_dts):
                        arr = decoded.get(idx)
                        if arr is None:
                            arr = decode_buf_to_arrow(bufs_by_idx.get(idx, b""), dt)
                        leaf_arrays[idx] = arr
                        n_rows = max(n_rows, len(arr))
                if n_rows == 0:
                    continue
                # dynamic column sets: null-fill short leaves (reference
                # reader just drops exhausted fields,
                # src/columnfile-reader.cc:381-388; a rectangular engine
                # pads instead)
                for idx, arr in leaf_arrays.items():
                    if len(arr) < n_rows:
                        leaf_arrays[idx] = pa.concat_arrays(
                            [arr, pa.nulls(n_rows - len(arr), type=arr.type)]
                        )
                arrays = [
                    rebuild_column(field.dataType, [leaf_arrays[i] for i in idxs])
                    for field, (idxs, _) in zip(fields, self.field_leaves)
                ]
                if mask is not None:
                    # rows beyond the filter column's length carry null
                    # filter values: value predicates fail them
                    if len(mask) < n_rows:
                        mask = pa.concat_arrays(
                            [
                                mask.cast(pa.bool_()),
                                pa.array([False] * (n_rows - len(mask)), type=pa.bool_()),
                            ]
                        )
                    arrays = [arr.filter(mask) for arr in arrays]
                    if len(arrays[0]) == 0:
                        continue
                yield pa.RecordBatch.from_arrays(
                    arrays, names=[f.name for f in fields]
                )


class ColumnFileArrowWriter(DataSourceArrowWriter):
    def __init__(self, options, schema: StructType):
        self.options = options
        self.schema = schema
        self.path = options.get("path")
        self.compression = options.get("compression", "lz4")
        if self.compression not in COMPRESSION_NAMES:
            raise ColumnFileFormatError(
                f"unsupported compression algorithm {self.compression!r}"
            )
        self.segment_bytes = int(options.get("segment_bytes", DEFAULT_SEGMENT_BYTES))
        self.list_layout = options.get("list_layout", "cell")
        if self.list_layout not in ("cell", "capnp"):
            raise ColumnFileFormatError(
                f"columnfile: unknown list_layout {self.list_layout!r}"
            )

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.col"
        full = fs_join(self.path, name)
        if self.list_layout == "capnp":
            return self._write_capnp(iterator, name, full)
        # structs shred into consecutive leaf columns; leaf position =
        # on-disk column index (reference columnfile-capnp.cc:94-149)
        leaves = flatten_schema(self.schema)
        encoders = [encoder_for(dt) for _, dt in leaves]
        stats_entries: list[dict] = []
        seg_stats = {name: ColumnStats() for name, _ in leaves}
        total_rows = 0

        writer = ColumnFileWriter(full, compression=self.compression)
        # slice incoming Arrow batches so the segment-size policy can
        # trigger mid-batch (Spark may deliver one huge batch per task);
        # slice granularity scales with the target segment size
        slice_rows = min(4096, max(64, self.segment_bytes // 256))
        try:
            for batch in iterator:
                for start in range(0, batch.num_rows, slice_rows):
                    part = batch.slice(start, slice_rows)
                    leaf_arrays = flatten_batch_arrays(part, self.schema)
                    for i, ((lname, _dt), enc) in enumerate(zip(leaves, encoders)):
                        cs = seg_stats[lname]
                        # vectorized fixed-width path: numpy RLE + one
                        # uniform-stride emission (mirror of the read
                        # fast path); per-cell encoder is the fallback
                        fast = encode_fixed_fast(leaf_arrays[i], _dt)
                        if fast is not None:
                            encoded, _n, lo, hi = fast
                            writer.put_raw_runs(i, encoded)
                            cs.update(lo.item())
                            cs.update(hi.item())
                            continue
                        vfast = encode_var_fast(leaf_arrays[i], _dt)
                        if vfast is not None:
                            encoded, _n = vfast
                            writer.put_raw_runs(i, encoded)
                            # null COUNT must reach the stats sidecar —
                            # IsNull/IsNotNull segment pruning reads it
                            cs.nulls += leaf_arrays[i].null_count
                            if pa.types.is_string(leaf_arrays[i].type):
                                import pyarrow.compute as pc

                                mm = pc.min_max(leaf_arrays[i])
                                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                                # all-null slice: min/max are None, and
                                # update(None) would double-count nulls
                                if mn is not None:
                                    cs.update(mn)
                                    cs.update(mx)
                            continue
                        for v in leaf_arrays[i].to_pylist():
                            if v is None:
                                writer.put_null(i)
                                cs.update(None)
                            else:
                                writer.put(i, enc(v))
                                cs.update(_to_stats_value(v))
                    writer.add_rows(part.num_rows)
                    total_rows += part.num_rows
                    if writer.pending_size >= self.segment_bytes:
                        flushed = writer.flush()
                        if flushed:
                            off, length, rows = flushed
                            entry = segment_stats_entry(off, rows, seg_stats)
                            entry["length"] = length
                            stats_entries.append(entry)
                        seg_stats = {n: ColumnStats() for n, _ in leaves}
            flushed = writer.flush()
            if flushed:
                off, length, rows = flushed
                entry = segment_stats_entry(off, rows, seg_stats)
                entry["length"] = length
                stats_entries.append(entry)
            writer.finalize()
        except BaseException:
            writer.finalize()
            if fs_exists(full):
                fs_remove(full)
            raise
        if total_rows == 0:
            fs_remove(full)
            return ColumnFileCommitMessage(file_name="", stats_entries=[], rows=0)
        write_stats(full, stats_entries)
        return ColumnFileCommitMessage(
            file_name=name, stats_entries=stats_entries, rows=total_rows
        )

    def _write_capnp(self, iterator, name: str, full: str):
        """Reference count-column list shredding (capnp.write_rows_capnp).
        Interop/egress surface: row-at-a-time by design, no stats sidecar
        (readers fall back to header scans)."""
        from libcolumnfile_spark.sources.columnfile.capnp import write_rows_capnp

        writer = ColumnFileWriter(full, compression=self.compression)
        total_rows = 0
        try:
            for batch in iterator:
                total_rows += write_rows_capnp(
                    writer, self.schema, batch.to_pylist(), self.segment_bytes
                )
            writer.flush()
            writer.finalize()
        except BaseException:
            writer.finalize()
            if fs_exists(full):
                fs_remove(full)
            raise
        if total_rows == 0:
            fs_remove(full)
            return ColumnFileCommitMessage(file_name="", stats_entries=[], rows=0)
        return ColumnFileCommitMessage(
            file_name=name, stats_entries=[], rows=total_rows
        )

    def commit(self, messages):
        files = [m.file_name for m in messages if m and m.file_name]
        existing: list[str] = []
        manifest = fs_join(self.path, MANIFEST_FILE)
        if fs_exists(manifest):
            existing = json.loads(fs_read_text(manifest))["files"]
        fs_write_text(
            fs_join(self.path, SCHEMA_FILE),
            json.dumps(
                {
                    "version": 1,
                    "schema": self.schema.jsonValue(),
                    "list_layout": self.list_layout,
                }
            ),
        )
        fs_write_text(manifest, json.dumps({"version": 1, "files": existing + files}))

    def abort(self, messages):
        for m in messages:
            if m and m.file_name:
                for p in (
                    fs_join(self.path, m.file_name),
                    fs_join(self.path, m.file_name + ".stats.json"),
                ):
                    if fs_exists(p):
                        fs_remove(p)


def register(spark) -> None:
    """Register the 'columnfile' format on a SparkSession (idempotent).

    Also enables Python-DataSource filter pushdown (off by default in
    Spark 4.1; runtime-settable), which our reader requires for its
    stats-based segment pruning."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ColumnFileDataSource)
