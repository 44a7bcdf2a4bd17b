"""Per-segment min/max/null-count statistics sidecar.

The reference achieves chunk skipping dynamically: ColumnFileSelect
decodes the filter column first and never touches the other columns of a
segment with no surviving rows (src/columnfile-select.cc:172-176). A
distributed scanner can't afford that multi-pass re-read, so we bank the
same information at WRITE time: a JSON sidecar `<part>.col.stats.json`
records, per segment, the row count and per-column min/max/null-count.
The Spark DataSource consults it in ``partitions()`` to drop whole
segments before any I/O — the planner-side analog of Parquet row-group
stats, and strictly cheaper than the reference's read-time approach
(zero passes instead of one per filter column).

Encoding of bounds: numerics as JSON numbers; date as days-since-epoch,
timestamp as micros-since-epoch (ints); strings stored only when short
(min may be truncated — a truncated min is still a valid lower bound;
a truncated max would NOT be a valid upper bound, so long maxes are
dropped instead).
"""

from __future__ import annotations

import json

from libcolumnfile_spark.sources.columnfile.fs import (
    fs_exists,
    fs_read_text,
    fs_write_text,
)
import math
import os
from dataclasses import dataclass
from datetime import date, datetime, timezone

STATS_SUFFIX = ".stats.json"
_MAX_STR_BOUND = 256


@dataclass
class ColumnStats:
    nulls: int = 0
    min: object = None
    max: object = None

    def update(self, value) -> None:
        if value is None:
            self.nulls += 1
            return
        if not isinstance(value, (int, float, str)):
            return  # arrays/binary: no bounds tracked
        if isinstance(value, float) and math.isnan(value):
            return  # NaN never participates in bounds
        if self.min is None or value < self.min:
            self.min = value
        if self.max is None or value > self.max:
            self.max = value


def _json_bound(v, is_min: bool):
    if v is None:
        return None
    if isinstance(v, str):
        if len(v) <= _MAX_STR_BOUND:
            return v
        return v[:_MAX_STR_BOUND] if is_min else None
    if isinstance(v, (int, float)):
        return v
    return None


def segment_stats_entry(offset: int, rows: int, per_column: dict[str, ColumnStats]) -> dict:
    return {
        "offset": offset,
        "rows": rows,
        "columns": {
            name: {
                "nulls": cs.nulls,
                "min": _json_bound(cs.min, True),
                "max": _json_bound(cs.max, False),
            }
            for name, cs in per_column.items()
        },
    }


def write_stats(path: str, segments: list[dict]) -> None:
    fs_write_text(path + STATS_SUFFIX, json.dumps({"version": 1, "segments": segments}))


def read_stats(path: str) -> list[dict] | None:
    sidecar = path + STATS_SUFFIX
    if not fs_exists(sidecar):
        return None
    try:
        doc = json.loads(fs_read_text(sidecar))
        return doc.get("segments")
    except (OSError, ValueError):
        return None


# ---------------------------------------------------------------------------
# Filter-vs-stats pruning
# ---------------------------------------------------------------------------


def _to_stats_value(v):
    """Convert a Spark filter literal to the sidecar's bound encoding."""
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, date):
        return (v - date(1970, 1, 1)).days
    return v


def _comparable(a, b) -> bool:
    if isinstance(a, str) != isinstance(b, str):
        return False
    return isinstance(a, (int, float, str)) and isinstance(b, (int, float, str))


def segment_can_be_skipped(seg_entry: dict, filters: list) -> bool:
    """True iff some pushed filter is provably false for every row of the
    segment. Conservative: unknown stats or types -> keep the segment.

    ``filters`` are pyspark.sql.datasource Filter dataclasses; only
    top-level-column filters participate.
    """
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
    )

    rows = seg_entry.get("rows")
    columns = seg_entry.get("columns", {})
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        cs = columns.get(attr[0])
        if cs is None:
            continue
        nulls, lo, hi = cs.get("nulls"), cs.get("min"), cs.get("max")
        all_null = rows is not None and nulls == rows
        if isinstance(f, IsNull):
            if nulls == 0:
                return True
            continue
        if isinstance(f, IsNotNull):
            if all_null:
                return True
            continue
        # all remaining are value comparisons: null rows never match,
        # so an all-null segment is skippable for any of them
        if all_null:
            return True
        if isinstance(f, In):
            vals = [_to_stats_value(v) for v in f.value]
            if (
                lo is not None
                and hi is not None
                and vals
                and all(_comparable(v, lo) for v in vals)
                and all(v < lo or v > hi for v in vals)
            ):
                return True
            continue
        v = _to_stats_value(getattr(f, "value", None))
        if v is None:
            continue
        if isinstance(f, EqualTo):
            if (lo is not None and _comparable(v, lo) and v < lo) or (
                hi is not None and _comparable(v, hi) and v > hi
            ):
                return True
        elif isinstance(f, GreaterThan):
            if hi is not None and _comparable(v, hi) and hi <= v:
                return True
        elif isinstance(f, GreaterThanOrEqual):
            if hi is not None and _comparable(v, hi) and hi < v:
                return True
        elif isinstance(f, LessThan):
            if lo is not None and _comparable(v, lo) and lo >= v:
                return True
        elif isinstance(f, LessThanOrEqual):
            if lo is not None and _comparable(v, lo) and lo > v:
                return True
    return False
