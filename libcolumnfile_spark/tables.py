"""Table registry over the driver fixtures (TESTDATA.md).

Tables are one parquet file each under an sf dir. At 100 TB each "table"
would be a partitioned parquet/columnfile dataset; nothing here assumes a
single file — ``spark.read.parquet`` takes directories and globs equally.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables that are always small relative to the fact tables and
# should be broadcast in joins (the star-schema dim side).
BROADCAST_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine depends on, set defensively because the
    caller (e.g. the verification driver) may pass a vanilla session:
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
      parquet reader otherwise rejects outright;
    - UTC session timezone: deterministic date/window semantics matching
      the DuckDB oracle's naive timestamps.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# Memoized table DataFrames. spark.read.parquet costs ~80 ms per call
# (footer fetch + schema analysis RPCs) — the single largest slice of the
# per-query constant, paid up to 7x per TPC-H query and again per bench
# rep. DataFrames are immutable lazy plans, so reuse is free; the cache
# key includes the parquet file's (mtime, size) so a rewritten fixture
# (tests writing into tmp sf dirs) never serves a stale plan, and the
# session is held weakly so a stopped session's plans are collectable.
import weakref

_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()
_CONF_DONE: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


# --- ingest-time layout normalization -------------------------------------
# The bench fixtures are ONE parquet file with ONE row group per table, so
# Spark's file-split planner can never give a scan more than one task; the
# old workaround (spread(): a round-robin exchange up to core count) costs
# a measured ~0.45 s full-row shuffle per fact query at sf0.1. Instead,
# normalize the layout ONCE at first read: rewrite the table as
# default_parallelism() order-preserving parquet slices (pure pyarrow, no
# Spark job), cached under .table_cache/ keyed by the source file's
# identity. Every scan is then natively parallel and spread() becomes a
# no-op. At 100 TB this is a no-op by construction: real datasets arrive
# as many files / many row groups, and the gate below skips anything that
# already splits or is too small to matter.

_LAYOUT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".table_cache"
)
_LAYOUT_MIN_ROWS = 2000  # below this a single scan task is already fine
# layout dirs served in THIS process: exempt from the stale-sibling GC
# sweep (live DataFrames may still hold their file listings)
_SERVED_LAYOUT_DIRS: set[str] = set()

# Slice count is sized by BYTES, not row count, and there are TWO
# layouts because one floor cannot serve both consumers (measured,
# tools/layout_ab.py + 26-query floor sweeps, r5):
# - CATALYST queries (windows, joins, streams over events/orders) pay
#   per-slice task overhead against microsecond per-row work: 31-slice
#   events cost them +0.15-0.45 s each; a 512 KB floor wins.
# - PYTHON-KERNEL operators (LSH signatures, PII regex, lang-id) need
#   a parallel scan: a single-slice table serializes the decode and
#   then pays spread()'s exchange (+0.2-0.4 s each); a fine floor wins.
# So load_table serves the COARSE layout, and spread() — which only
# kernel operators call — re-routes bare table scans to a FINE-sliced
# copy instead of repartitioning (no exchange, parallel from the scan).
_SLICE_MIN_BYTES = int(os.environ.get("SPARK_GRAFT_SLICE_MIN_BYTES", 512 * 1024))
_FINE_SLICE_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_FINE_SLICE_MIN_BYTES", 16 * 1024)
)


def _split_layout(
    path: str, st: os.stat_result, name: str, min_bytes: int | None = None,
    tag: str = "",
) -> str | None:
    """Return the split-copy directory for ``path``, creating it on first
    use. None => use the original file (already parallel, or too small,
    or anything fails — this is an optimization, never a requirement).
    ``tag`` namespaces independent layouts of the same table (coarse vs
    fine) so their GC sweeps don't delete each other."""
    if os.environ.get("SPARK_GRAFT_NO_SPLIT_LAYOUT"):
        return None  # kill switch: A/B measurement + user escape hatch
    try:
        import pyarrow.parquet as pq

        from libcolumnfile_spark.session import default_parallelism

        floor = min_bytes or _SLICE_MIN_BYTES
        n = min(default_parallelism(), max(1, st.st_size // floor))
        if n < 2:
            return None  # too small for slicing to pay for itself
        # family is namespaced by SOURCE path, not just table name: two
        # fixtures both called "lineitem" (an sf dir, a tmp test dir, an
        # x10 replica) must never GC each other's layout dirs — live
        # session plans hold file listings into them
        import hashlib

        src_ns = hashlib.sha1(
            os.path.dirname(os.path.abspath(path)).encode()
        ).hexdigest()[:8]
        family = f"{tag}-{name}-{src_ns}" if tag else f"{name}-{src_ns}"
        digest = f"{st.st_mtime_ns:x}-{st.st_size:x}-{n}"
        dest = os.path.join(_LAYOUT_CACHE_DIR, f"{family}-{digest}")
        marker = os.path.join(dest, "_SUCCESS")
        if os.path.exists(marker):
            _SERVED_LAYOUT_DIRS.add(dest)
            return dest
        # GC stale siblings for this layout family (old mtime/size/
        # parallelism digests, abandoned __tmp dirs): each is a full
        # table copy, and without this every rewritten fixture or
        # tmp-dir test table leaves a permanent copy — unbounded disk
        # growth across test runs. The untagged (coarse) sweep must not
        # match tagged families, hence the tag prefix. Dirs SERVED in
        # this process are exempt: a live DataFrame may still hold their
        # file listing (same source rewritten mid-session), and deleting
        # under it turns a disk leak into FileNotFoundException — the
        # next process sweeps them instead.
        try:
            import shutil

            prefix = f"{family}-"
            for entry in os.listdir(_LAYOUT_CACHE_DIR):
                full = os.path.join(_LAYOUT_CACHE_DIR, entry)
                if (
                    entry.startswith(prefix)
                    and entry != os.path.basename(dest)
                    and full not in _SERVED_LAYOUT_DIRS
                ):
                    shutil.rmtree(full, ignore_errors=True)
        except OSError:
            pass
        pf = pq.ParquetFile(path)
        rows = pf.metadata.num_rows
        # row gate is COARSE-only: a fine (spread-requested) layout
        # exists precisely because per-row compute is heavy, where even
        # a few hundred rows are worth fanning out without an exchange
        if (min_bytes is None and rows < _LAYOUT_MIN_ROWS) or pf.metadata.num_row_groups > 1:
            return None  # tiny, or the source already splits
        table = pf.read()
        chunk = -(-rows // n)
        tmp = f"{dest}.__tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        # contiguous slices: row order is preserved end-to-end (part-00000
        # holds rows [0, chunk), etc. — Spark lists part files in order)
        for i in range(n):
            sl = table.slice(i * chunk, chunk)
            if sl.num_rows == 0:
                break
            # version 2.6 keeps TIMESTAMP(NANOS) as nanos, bit-identical
            # to the source fixture (events.ts)
            pq.write_table(
                sl, os.path.join(tmp, f"part-{i:05d}.parquet"),
                version="2.6", compression="snappy",
            )
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        try:
            os.replace(tmp, dest)  # atomic: concurrent builders converge
        except OSError:
            import shutil

            if os.path.exists(marker):  # another process won the race
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise
        _SERVED_LAYOUT_DIRS.add(dest)
        return dest
    except Exception:
        return None


def _apply_ts_conversion(df: DataFrame, name: str) -> DataFrame:
    # Parquet TIMESTAMP(NANOS) columns surface as int64 under
    # spark.sql.legacy.parquet.nanosAsLong (session.py); convert to
    # microsecond timestamps (DuckDB's TIMESTAMP precision) here so every
    # consumer sees proper TimestampType.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    ts_cols = {"events": ["ts"], "orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}
    for c in ts_cols.get(name, []):
        if isinstance(df.schema[c].dataType, LongType):
            # integer DIV: float division would lose precision above 2^53 ns
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if spark not in _CONF_DONE:
        _ensure_session_confs(spark)
        _CONF_DONE.add(spark)
    src_path = os.path.join(sf_dir, f"{name}.parquet")
    path = src_path
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        st = None
        key = None  # remote path: no cheap staleness check, skip cache
    per_session = None
    if key is not None:
        per_session = _TABLE_CACHE.setdefault(spark, {})
        hit = per_session.get(key)
        if hit is not None:
            return hit
        split = _split_layout(path, st, name)
        if split is not None:
            path = split
    df = _apply_ts_conversion(spark.read.parquet(path), name)
    if key is not None:
        # spread() re-routes kernel operators to a FINE-sliced copy via
        # this hook (built + memoized lazily): parallel scans without an
        # exchange, while plain consumers keep the coarse layout above
        def _refine(
            _spark=spark, _path=src_path, _st=st, _name=name,
            _per=per_session, _key=key,
        ):
            hit = _per.get(_key + ("fine",))
            if hit is not None:
                return hit
            fine = _split_layout(
                _path, _st, _name, min_bytes=_FINE_SLICE_MIN_BYTES, tag="fine"
            )
            if fine is None:
                return None
            fdf = _apply_ts_conversion(_spark.read.parquet(fine), _name)
            _per[_key + ("fine",)] = fdf
            return fdf

        try:
            df._lcf_refine = _refine
        except Exception:
            pass
        per_session[key] = df
    return df


# Spark's file-split planner floors split size at openCostInBytes (4 MB
# default) — the same constant estimates planned scan parallelism below.
_OPEN_COST_BYTES = 4 * 1024 * 1024


def spread(df: DataFrame) -> DataFrame:
    """Repartition iff the input plans fewer scan partitions than cores.

    Few-split inputs (one file with one parquet row group — the bench
    fixtures; also any small-files corner at real scale) starve the map
    stage: every downstream map-side operator (broadcast-join probes,
    signature kernels, partial aggregates) runs on a handful of tasks.
    One round-robin exchange buys a fully parallel map stage. At 100 TB
    the file-split planner already provides >= cores partitions and this
    is a no-op — the guard makes it safe to apply unconditionally to any
    compute-heavy map stage.

    The partition estimate comes from input file sizes (the same
    bytes/openCost split formula the planner uses), NOT from
    ``df.rdd.getNumPartitions()`` — converting the plan to an RDD costs
    ~80 ms per fresh DataFrame plus a ~1 s first-call hit, which taxed
    every operator invocation; ``inputFiles()`` only needs analysis
    (~30 ms). Non-file inputs fall back to the RDD check.
    """
    from libcolumnfile_spark.session import default_parallelism

    n = default_parallelism()
    # memoized table frames (load_table) flow through here once per
    # query; the inputFiles() analysis RPC (~30 ms) is worth caching on
    # the frame object itself (immutable plan -> stable answer)
    cached = getattr(df, "_spread_result", None)
    if cached is not None:
        return cached
    try:
        files = df.inputFiles()
        if not files:
            raise ValueError("no input files")
        total = 0
        for f in files:
            p = urlparse(f)
            if p.scheme in ("file", ""):
                total += os.path.getsize(unquote(p.path))
            else:
                # remote scheme: size via the fs layer (pyarrow-native),
                # keeping the cheap inputFiles() estimate instead of the
                # ~1 s df.rdd fallback exactly where remote FS matters
                from libcolumnfile_spark.sources.columnfile.fs import fs_size

                total += fs_size(f)
        est = max(len(files), total // _OPEN_COST_BYTES + 1)
    except Exception:
        est = df.rdd.getNumPartitions()
    if est < n:
        # base-table frames carry a refine hook: serve the FINE-sliced
        # layout (parallel from the scan, no exchange) instead of paying
        # a full-row repartition shuffle
        refine = getattr(df, "_lcf_refine", None)
        out = refine() if refine is not None else None
        if out is None:
            out = df.repartition(n)
    else:
        out = df
    try:
        df._spread_result = out
    except Exception:
        pass
    return out


# Plan-keyed metadata memo: operators pay small probe ACTIONS (a
# first() for vector dim, a count() for corpus cardinality) to size
# their plans. Over immutable fixture files the answers never change,
# so memoize per (semantic plan, input files) — the semantic hash keys
# the exact computation (a filtered frame hashes differently), the
# input-file list keys the data identity (split-cache paths embed the
# source mtime/size digest). Falls back to computing when either key
# component is unavailable (non-file sources).
_META_MEMO: dict[tuple, object] = {}


def input_keyed_memo(df: DataFrame, tag: str, compute):
    try:
        files = sorted(df.inputFiles())
        if not files:  # no input files: in-memory source, don't memo
            return compute()
        # RAW-path inputs carry no freshness in their names (split-cache
        # paths embed the source mtime/size digest, raw fixture paths do
        # not) — stamp each local file's (mtime, size) into the key so
        # an in-place rewrite invalidates the memo instead of serving a
        # stale dim/count forever
        stamped = []
        for f in files:
            if f.startswith("file:"):
                # inputFiles() returns percent-encoded URIs: decode or a
                # path with a space/non-ASCII char stats the wrong name
                # and silently loses its freshness stamp
                from urllib.parse import unquote, urlparse

                local = unquote(urlparse(f).path)
            else:
                local = f
            try:
                fst = os.stat(local)
                stamped.append((f, fst.st_mtime_ns, fst.st_size))
            except OSError:
                stamped.append((f,))
        key = (tag, df.semanticHash()) + tuple(stamped)
    except Exception:
        return compute()
    if key not in _META_MEMO:
        _META_MEMO[key] = compute()
    return _META_MEMO[key]


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast hint iff the frame's input files total under the
    session's autoBroadcastJoinThreshold — size-measured, never assumed.

    Why it exists: deep join chains lose static size estimates (the
    planner can't see through an upstream join), so an unhinted small
    dim falls to sort-merge until AQE converts it — after the fact
    side's shuffle write has already been paid. A FORCED hint is worse:
    it OOMs when the side scales (the x100 probe caught exactly that).
    This helper hints from the measured file size: small dim -> static
    broadcast plan; big dim (or un-sizable derived input) -> no hint,
    the size-based planner + AQE decide.

    PRECONDITION: the frame must be non-amplifying over its one input
    (scan + filter/project/aggregate) — only then do the leaf file bytes
    upper-bound the broadcast size. Row-amplifying plans (joins, explode
    /Generate, grouping-set Expand, unions) would be under-estimated, so
    the guard below detects them (multi-leaf plan, or Generate/Expand in
    a single-leaf plan) and returns the frame unhinted.
    """
    from pyspark.sql import functions as F

    try:
        threshold = int(df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
        if threshold <= 0:
            return df
        # per-frame memo (keyed by threshold — tests vary the conf):
        # memoized table frames hit this once per query otherwise
        cached = getattr(df, "_mb_cache", None)
        if cached is not None and cached[0] == threshold:
            return cached[1]
        out = df
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.collectLeaves().size() > 1:
            pass  # join/union: file bytes no longer bound the output
        else:
            files = df.inputFiles()
            # single-leaf plans are a handful of nodes; render is cheap
            tree = analyzed.treeString() if files else ""
            if files and "Generate " not in tree and "Expand " not in tree:
                total = 0
                for f in files:
                    p = urlparse(f)
                    if p.scheme in ("file", ""):
                        total += os.path.getsize(unquote(p.path))
                    else:
                        from libcolumnfile_spark.sources.columnfile.fs import fs_size

                        total += fs_size(f)
                # parquet decompresses 2-5x, and the hash-relation build
                # adds overhead on top — require 8x headroom so only
                # genuinely dim-sized inputs hint (at sf0.1: orders
                # 2.7 MB and below hint, the 10.8 MB lineitem fact no)
                if 0 < total * 8 <= threshold:
                    out = F.broadcast(df)
        try:
            df._mb_cache = (threshold, out)
        except Exception:
            pass
        return out
    except Exception:
        pass
    return df
