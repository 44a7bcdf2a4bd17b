"""Declared query registry (SURVEY.md §2) — the correctness contract.

Every operator the engine claims is represented here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet fixtures. The driver hash-compares the two at sf0.01.

Parity rules (SURVEY.md §7 "oracle parity traps"):
- every computed column aliased identically on both sides;
- floating aggregates rounded (partial-aggregation order differs between
  engines, so raw double sums differ in the last ulp);
- explicit CASTs where default result types differ (DuckDB year() is
  BIGINT, Spark's is INT; DuckDB row_number() is BIGINT, Spark's INT);
- deterministic tie-breaks on every top-k / window ordering.

Scale notes are inline per query; the general rules (SURVEY.md §4):
aggregations are partial+final hash aggs, joins broadcast the dim side,
top-k plans as TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from libcolumnfile_spark.tables import load_table, maybe_broadcast as _mb


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

# Persisted intermediates pinned by the CURRENT query (see pin()). A
# query's pins must outlive its lazy result plan — the caller collects
# after the function returns — so they are released lazily, when the
# NEXT query is invoked. Bounds cached-partition accumulation across
# repeated bench/driver invocations to one query's worth.
_PINNED: list[DataFrame] = []
_QUERY_DEPTH = 0


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for release at the next query invocation."""
    df = df.persist()
    _PINNED.append(df)
    return df


def _release_pins() -> None:
    global _PINNED
    for df in _PINNED:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
    _PINNED = []


# ---------------------------------------------------------------------------
# Plan cache: building a complex DataFrame plan costs 0.1-0.25 s of
# Python->JVM expression chatter + analysis (measured: q_tpch_q21 0.24 s
# of its 1.0 s wall) — the prepared-statement cost a SQL engine pays
# once. Pure-plan queries (no inline driver actions, no pins, one-time
# manifest-guarded fixture conversions only) are memoized per
# (session, name, sf_dir, fixture version); re-invocations return the
# same immutable plan and every action re-executes it as usual.
# Training/probing queries (dedup, similarity, BPE, PQ, pipeline,
# streaming modules) are excluded — their inline work IS the operator —
# and a runtime guard refuses to memoize any invocation that created
# pins, so a misplaced annotation cannot freeze persisted state or skip
# a probe-dependent plan.
# ---------------------------------------------------------------------------

import os as _os
import weakref as _weakref

_PLAN_MEMO: "_weakref.WeakKeyDictionary[SparkSession, dict]" = _weakref.WeakKeyDictionary()

_PLAN_CACHE_MODULES = {
    "libcolumnfile_spark.queries",
    "libcolumnfile_spark.operators.tpch",
    "libcolumnfile_spark.operators.relational",
    "libcolumnfile_spark.operators.aggregates",
    "libcolumnfile_spark.operators.text",
    "libcolumnfile_spark.operators.udfs",
    "libcolumnfile_spark.operators.layout",
    "libcolumnfile_spark.operators.multimodal",
    "libcolumnfile_spark.sources.columnfile.queries",
    "libcolumnfile_spark.sources.stock",
}


def _sf_dir_version(sf_dir: str) -> int:
    """Cheap fixture-identity stamp: max mtime of the dir's parquet
    files, so a rewritten tmp fixture never serves a stale plan."""
    try:
        return max(
            (
                e.stat().st_mtime_ns
                for e in _os.scandir(sf_dir)
                if e.name.endswith(".parquet")
            ),
            default=0,
        )
    except OSError:
        return -1


# ---------------------------------------------------------------------------
# Cost-based degree of parallelism. A cost-based engine sizes its
# pipeline width from the data (DuckDB picks morsel counts from row
# counts; Spark's own AQE coalesces reduce partitions from runtime
# stats) — but AQE can only merge partitions AFTER a 32-way map stage
# has already written 32 shuffle files and the scheduler has paid for
# 32 tasks per stage. On a 17 MB fixture that scheduling floor IS the
# query (q_tpch_q11: 1.20 s at 32 initial partitions, 0.66 s at 8;
# DuckDB 0.04 s). So: size the INITIAL shuffle partition count from the
# query universe's input bytes, clamped at the session's configured
# value. The clamp makes this identity at scale — any input past
# ~2 MB x configured-parallelism (64 MB locally) keeps the configured
# width, so x10/x100 probes and a real cluster (where the cluster conf
# sets thousands of partitions) are untouched; only micro inputs stop
# paying scheduler tax they cannot amortize.
# ---------------------------------------------------------------------------

_DOP_TARGET_BYTES = 2 * 1024 * 1024
# per-session DOP-tuning state: {"base": (width:int, aqe:str) — the
# USER-configured values the clamp ceilings at; "last_set": (width:str,
# aqe:str) — what _tune_dop itself last wrote}. Comparing the live conf
# against last_set on every call distinguishes our own tuning from a
# user/test conf change made between queries: a changed conf is adopted
# as the NEW base instead of being clobbered by a stale ceiling.
_DOP_BASE: "_weakref.WeakKeyDictionary[SparkSession, dict]" = _weakref.WeakKeyDictionary()


def restore_session_conf(spark: SparkSession) -> None:
    """Reset shuffle width / AQE to their pre-tuning base values.

    _tune_dop deliberately leaves its per-query tuning in the session
    conf — Spark reads SQLConf at ACTION time, so restoring inside the
    query wrapper (try/finally) would undo the tuning before the
    returned lazy DataFrame ever executes. Non-query consumers sharing
    the session (direct operator calls, user code) can call this to shed
    inherited micro-input tuning; it is a no-op if no tuning happened.
    """
    st = _DOP_BASE.pop(spark, None)
    if st is None:
        return
    base, base_aqe = st["base"]
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(base))
        spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
    except Exception:
        pass


def _tune_dop(spark: SparkSession, sf_dir: str, keep_adaptive: bool = False) -> None:
    try:
        cur = spark.conf.get("spark.sql.shuffle.partitions")
        cur_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    except Exception:
        return
    st = _DOP_BASE.get(spark)
    if st is None:
        try:
            st = {"base": (int(cur), cur_aqe), "last_set": (cur, cur_aqe)}
        except ValueError:
            return
        _DOP_BASE[spark] = st
    else:
        # a conf changed under us since the last tuning (a user/test
        # spark.conf.set): the LIVE value is the intended base for THAT
        # field. Adoption is PER FIELD — when only AQE changed, the
        # width still reading our own micro-input tuning must NOT be
        # adopted as the user base (that would clamp every later query,
        # including x10/x100 inputs, to the stale tuned width; and
        # symmetrically a user width change must not pin our aqe=false)
        base_w, base_a = st["base"]
        last_w, last_a = st["last_set"]
        if cur != last_w:
            try:
                base_w = int(cur)
            except ValueError:
                return
        if cur_aqe != last_a:
            base_a = cur_aqe
        st["base"] = (base_w, base_a)
    base, base_aqe = st["base"]
    try:
        total = 0
        for e in _os.scandir(sf_dir):
            if not e.name.endswith(".parquet"):
                continue
            if e.is_dir():
                # Spark-written table: a directory of part files (the
                # x10/x100 replicas are laid out this way) — sum the
                # parts, or a 175 MB replica reads as a 4 KB dirent and
                # gets DOP 1
                total += sum(
                    f.stat().st_size for f in _os.scandir(e.path) if f.is_file()
                )
            else:
                total += e.stat().st_size
    except OSError:
        return
    if total <= 0:
        return
    dop = max(1, min(base, (total + _DOP_TARGET_BYTES - 1) // _DOP_TARGET_BYTES))
    set_width = str(dop)
    spark.conf.set("spark.sql.shuffle.partitions", set_width)
    # AQE's runtime re-planning (partition coalescing, skew splits, join
    # re-strategy) buys nothing once the static width already matches the
    # data, and each adaptive stage boundary costs a materialization +
    # scheduling break — measured -29% across a 15-query multi-stage
    # subset at sf0.1 (q_contamination 1.27->0.67, q_tpch_q21
    # 0.75->0.40). Gate on the SAME bytes condition as the width clamp:
    # any input big enough to hit the configured width gets the
    # configured AQE setting back, so x10/x100 probes and real deploys
    # keep adaptive execution.
    # ``keep_adaptive``: queries that declare adaptive=True (iterative
    # pipelines whose intermediate cardinalities are data-dependent —
    # e.g. SRP-pair -> connected-components clustering, where bucket
    # sizes and per-round edge sets are unknowable statically) retain
    # runtime adaptivity even on micro inputs (measured: q_dedup_embedding
    # +0.32 s with AQE forced off, while every static-shape query gains).
    set_aqe = base_aqe if (keep_adaptive or dop >= base) else "false"
    spark.conf.set("spark.sql.adaptive.enabled", set_aqe)
    st["last_set"] = (set_width, set_aqe)


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    plan_cache: bool | None = None,
    adaptive: bool = False,
):
    """Decorator registering a declared query. ``plan_cache`` defaults by
    module (see _PLAN_CACHE_MODULES); pass an explicit bool to override.
    ``adaptive=True`` keeps AQE enabled even on micro inputs (see
    _tune_dop) for iterative / data-dependent-cardinality pipelines."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        cacheable = (
            plan_cache
            if plan_cache is not None
            else fn.__module__ in _PLAN_CACHE_MODULES
        )

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # release the previous query's pins, but only at top level —
            # a query composed from another query must not drop its own
            global _QUERY_DEPTH
            if _QUERY_DEPTH == 0:
                _release_pins()
                _tune_dop(spark, sf_dir, keep_adaptive=adaptive)
            key = None
            if cacheable:
                key = (name, sf_dir, _sf_dir_version(sf_dir))
                per = _PLAN_MEMO.setdefault(spark, {})
                hit = per.get(key)
                if hit is not None:
                    return hit
            _QUERY_DEPTH += 1
            try:
                df = fn(spark, sf_dir)
            finally:
                _QUERY_DEPTH -= 1
            if key is not None and not _PINNED:
                per[key] = df
            return df

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = Query(name=name, spark_fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return wrapped

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / projection / filter  (reference O3-O9: ColumnFileReader GetRow,
# SetColumnFilter, ColumnFileSelect — src/columnfile-reader.cc:371-445,
# src/columnfile-select.cc:46-245)
# ---------------------------------------------------------------------------


@query(
    "q_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="Full sequential scan (reference O3, columnfile-reader.cc:371-445).",
    tags=("scan",),
)
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_project",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
    doc=(
        "Column projection pushdown (reference O4 SetColumnFilter, "
        "columnfile.h:231-238): ReadSchema in the parquet scan must contain "
        "only the two requested columns."
    ),
    tags=("scan", "pushdown"),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@query(
    "q_filter",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45.0"
    ),
    doc=(
        "Predicate pushdown scan (reference O5 ColumnFileSelect::AddFilter, "
        "columnfile-select.cc:46-245): PushedFilters must show GreaterThan."
    ),
    tags=("filter", "pushdown"),
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 45.0).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "q_filter_multi",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag "
        "FROM lineitem "
        "WHERE l_quantity > 40.0 AND l_discount < 0.05 AND l_returnflag = 'R'"
    ),
    doc=(
        "Conjunctive multi-column filter cascade (reference O6, "
        "columnfile-select.cc:69-173). Spark evaluates all conjuncts in one "
        "codegen'd pass over the pruned columns — no multi-pass re-read."
    ),
    tags=("filter", "pushdown"),
)
def q_filter_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 40.0) & (F.col("l_discount") < 0.05) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "q_filter_null",
    oracle=(
        "SELECT o_orderkey, o_orderstatus FROM orders "
        "WHERE nullif(o_orderstatus, 'F') IS NULL AND o_orderpriority IS NOT NULL"
    ),
    doc=(
        "NULL-aware predicates (reference O7, columnfile-select.cc:122-135: "
        "filter sees optional<>). Fixtures have no physical NULLs, so nullif "
        "synthesizes them; IS NULL / IS NOT NULL semantics are what's tested."
    ),
    tags=("filter", "null"),
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.filter(
        F.nullif(F.col("o_orderstatus"), F.lit("F")).isNull() & F.col("o_orderpriority").isNotNull()
    ).select("o_orderkey", "o_orderstatus")


@query(
    "q_filter_contains",
    oracle=(
        "SELECT doc_id, lang FROM documents WHERE text LIKE '%window%'"
    ),
    doc=(
        "Substring filter (reference O8 --filter COL:PATTERN via string::find, "
        "tools/columnfile-cat.cc:136-141). Pushed as StringContains."
    ),
    tags=("filter", "string"),
)
def q_filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.filter(F.col("text").contains("window")).select("doc_id", "lang")


@query(
    "q_cast",
    oracle=(
        "SELECT CAST(l_linenumber AS BIGINT) AS line_big, "
        "CAST(l_orderkey AS VARCHAR) AS okey_str, "
        "CAST(l_shipdate AS DATE) AS ship_date, "
        "CAST(floor(l_quantity) AS INTEGER) AS qty_int "
        "FROM lineitem WHERE l_orderkey % 100 = 0"
    ),
    doc=(
        "Typed projection / cast-on-read (reference O9 --format codes, "
        "tools/columnfile-cat.cc:285-320). floor-then-cast avoids the "
        "DuckDB-rounds vs Spark-truncates double->int difference."
    ),
    tags=("cast",),
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
    )


# ---------------------------------------------------------------------------
# Set operations (reference O10 multi-file concatenation,
# tools/columnfile-cat.cc:188-219; intersect is a standard-engine extension)
# ---------------------------------------------------------------------------


@query(
    "q_union_all",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 100000.0 "
        "UNION ALL "
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 100000.0"
    ),
    doc="Concatenation (reference O10 cat semantics). Bag union, no dedup.",
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lo = o.filter(F.col("o_totalprice") < 100000.0)
    hi = o.filter(F.col("o_totalprice") >= 100000.0)
    return lo.unionByName(hi)


@query(
    "q_intersect",
    oracle=(
        "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0 "
        "INTERSECT "
        "SELECT c_custkey AS custkey FROM customer"
    ),
    doc="Set intersection (standard-engine surface; absent in reference).",
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    big_buyers = (
        T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0).select(F.col("o_custkey").alias("custkey"))
    )
    custs = T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return big_buyers.intersect(custs)


# ---------------------------------------------------------------------------
# Sort / top-k (reference O12-O14: external sort + k-way merge,
# tools/columnfile-sort.cc. Spark's SortExec + UnsafeExternalSorter is the
# built-in equivalent: range-partition shuffle, per-partition spill sort.)
# ---------------------------------------------------------------------------


@query(
    "q_sort",
    oracle=(
        "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders "
        "ORDER BY o_orderdate, o_orderkey"
    ),
    doc=(
        "Global sort (reference O12 external sort, tools/columnfile-sort.cc:"
        "87-149). Spark: range-partitioned shuffle + per-partition spill "
        "sort; at 100 TB this is the same run-generation + merge the "
        "reference does, but distributed."
    ),
    tags=("sort",),
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderdate", "o_totalprice").orderBy("o_orderdate", "o_orderkey")


@query(
    "q_topk",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    doc=(
        "Top-k: Spark plans TakeOrderedAndProject — per-partition heap of k "
        "then driver merge, NO global sort. o_orderkey tie-break makes the "
        "boundary deterministic."
    ),
    tags=("sort", "topk"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)


@query(
    "q_sort_merge",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice, o_orderkey"
    ),
    doc=(
        "Merge of pre-sorted runs (reference O13/O14 k-way heap merge, "
        "tools/columnfile-sort.cc:151-245): two sorted halves unioned then "
        "globally ordered; Spark's sort shuffle does the merge."
    ),
    tags=("sort",),
)
def q_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lo = o.filter(F.col("o_totalprice") < 100000.0).orderBy("o_totalprice", "o_orderkey")
    hi = o.filter(F.col("o_totalprice") >= 100000.0).orderBy("o_totalprice", "o_orderkey")
    return lo.unionByName(hi).orderBy("o_totalprice", "o_orderkey")


# ---------------------------------------------------------------------------
# Aggregation (absent in reference; standard-engine surface, SURVEY §2.2)
# ---------------------------------------------------------------------------


@query(
    "q_group_agg",
    # Money columns are 2-decimal values: double sums hit round-half
    # boundaries where Spark (exact BigDecimal HALF_UP) and DuckDB
    # (scaled-double rounding) disagree. DECIMAL sums are exact and
    # order-independent on both engines; cast to DOUBLE at the end for a
    # common result type.
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price, "
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty, "
        "round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    doc=(
        "TPC-H Q1 shape: hash aggregate with partial (map-side) + final "
        "stages — the only shuffle carries one row per group per mapper. "
        "Scales to 100 TB because shuffle volume is O(groups), not O(rows)."
    ),
    tags=("agg",),
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(dec("l_quantity")).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum(dec("l_discount")).cast("double") / cnt, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="Distinct = hash aggregate without aggregates; partial+final.",
    tags=("agg",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q_approx_distinct",
    oracle=None,  # HLL estimate is engine-specific; rows-only check
    doc=(
        "approx_count_distinct (HyperLogLog++): constant-memory distinct "
        "estimation — at 100 TB an exact distinct on a high-cardinality key "
        "shuffles everything; HLL sketches merge in O(sketch)."
    ),
    tags=("agg", "sketch"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_rollup",
    oracle=(
        "SELECT l_returnflag, l_linestatus, count(*) AS count_order, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
    doc=(
        "ROLLUP grouping sets (standard-engine agg surface), via the "
        "two-level re-aggregation in operators/relational.py:qty_base — "
        "Expand replicates the tiny base aggregate, not the fact table."
    ),
    tags=("agg",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.operators.relational import _reagg, qty_base

    base = qty_base(T(spark, sf_dir, "lineitem"))
    return _reagg(base.rollup("l_returnflag", "l_linestatus"))


# ---------------------------------------------------------------------------
# Joins (absent in reference; standard-engine surface, SURVEY §2.2)
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle=(
        "SELECT o_orderkey, o_totalprice, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 150000.0"
    ),
    doc=(
        "Inner equi-join, dim side broadcast: customer is the small star dim "
        "— F.broadcast avoids shuffling the fact side entirely. At 100 TB "
        "the orders scan streams through map-side hash probes."
    ),
    tags=("join",),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    c = T(spark, sf_dir, "customer")
    return o.join(_mb(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_semi",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)"
    ),
    doc="Left-semi join (EXISTS/IN): emits each customer at most once.",
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)"
    ),
    doc="Left-anti join (NOT IN over a non-null key).",
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_agg",
    oracle=(
        "SELECT c_mktsegment, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue, "
        "count(*) AS n_items "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "GROUP BY c_mktsegment"
    ),
    doc=(
        "FLAGSHIP: 3-table star join + aggregate (scan->join->join->agg->"
        "exchange). lineitem|><|orders shuffles on orderkey (both huge at "
        "scale -> sort-merge w/ AQE); customer broadcasts; aggregation is "
        "partial+final so the last shuffle is O(segments)."
    ),
    tags=("join", "agg", "flagship"),
)
def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.tables import spread

    # the fact side's map stage carries two hash probes + a decimal
    # product; spread rebalances single-split inputs (no-op at scale)
    li = spread(T(spark, sf_dir, "lineitem"))
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    c = T(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * (1 - F.col("l_discount").cast("decimal(18,2)"))),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_join_q5",
    oracle=(
        "SELECT n_name, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'AMERICA' "
        "GROUP BY n_name"
    ),
    doc=(
        "TPC-H Q5 shape: 6-table join (fact lineitem |><| orders shuffles "
        "on orderkey; customer/supplier/nation/region all broadcast) with "
        "a compound supplier condition and region filter. Exercises "
        "Catalyst join ordering + multi-broadcast; the region predicate "
        "prunes before the expensive joins (PushDownPredicates through "
        "the join chain)."
    ),
    tags=("join", "agg"),
)
def q_join_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.tables import spread

    li = spread(T(spark, sf_dir, "lineitem"))
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .join(
            _mb(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_subquery",
    oracle=(
        "SELECT p_partkey, p_name, p_retailprice FROM part p "
        "WHERE p_retailprice > "
        "(SELECT 1.02 * avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand)"
    ),
    doc=(
        "Correlated scalar subquery (parts priced >2% above their "
        "brand's average): Catalyst decorrelates to an aggregate + "
        "equi-join — no per-row re-execution, one extra shuffle on the "
        "correlation key. The reference has no subquery surface at all."
    ),
    tags=("subquery", "optimizer"),
)
def q_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    T(spark, sf_dir, "part").createOrReplaceTempView("cf_part_sq")
    return spark.sql(
        "SELECT p_partkey, p_name, p_retailprice FROM cf_part_sq p "
        "WHERE p_retailprice > "
        "(SELECT 1.02 * avg(p2.p_retailprice) FROM cf_part_sq p2 WHERE p2.p_brand = p.p_brand)"
    )


# ---------------------------------------------------------------------------
# Window functions (absent in reference; standard-engine surface)
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
        "  SELECT o_custkey, o_orderkey, o_totalprice, "
        "  CAST(row_number() OVER (PARTITION BY o_custkey "
        "       ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn "
        "  FROM orders) t WHERE rn <= 3"
    ),
    doc=(
        "Top-N per group via row_number: one shuffle on the partition key, "
        "per-partition sort. Deterministic via o_orderkey tie-break."
    ),
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_running",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total "
        "FROM orders"
    ),
    doc=(
        "Running sum with explicit ROWS frame (RANGE-vs-ROWS defaults differ "
        "on ties; explicit frame + unique ordering keeps both engines "
        "summing in the same order -> bitwise-stable doubles)."
    ),
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_window_lag",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS price_delta "
        "FROM orders"
    ),
    doc="lag() with default — per-customer order-to-order price delta.",
    tags=("window",),
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w), 2).alias("price_delta"),
    )


# ---------------------------------------------------------------------------
# Scalar function surface (reference O8/O9 only; rest standard-engine)
# ---------------------------------------------------------------------------


@query(
    "q_scalar_str_date",
    oracle=(
        "SELECT o_orderkey, "
        "lower(o_orderpriority) AS prio_lower, "
        "substring(o_orderpriority, 1, 1) AS prio_code, "
        "concat(o_orderstatus, '-', o_orderpriority) AS status_prio, "
        "CAST(year(o_orderdate) AS INTEGER) AS order_year, "
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month, "
        "CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k, "
        "round(abs(o_totalprice - 100000.0), 2) AS price_dev, "
        "round(ln(o_totalprice), 6) AS log_price "
        "FROM orders WHERE o_orderkey % 10 = 0"
    ),
    doc="Mixed scalar expression surface: string/date/math in one plan.",
    tags=("scalar",),
)
def q_scalar_str_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("prio_lower"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).cast("int").alias("days_to_y2k"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("price_dev"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("log_price"),
    )


@query(
    "q_json_extract",
    oracle=(
        "SELECT event_id, "
        "json_extract_string(props, '$.k') AS k_str, "
        "CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int "
        "FROM events WHERE event_type = 'click'"
    ),
    doc="JSON path extraction over the events.props payload column.",
    tags=("scalar", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    k = F.get_json_object("props", "$.k")
    return e.select("event_id", k.alias("k_str"), k.cast("int").alias("k_int"))


@query(
    "q_map_funcs",
    oracle=(
        "SELECT event_id, "
        "array_to_string(list_sort(json_keys(props)), ',') AS keys, "
        "CAST(props->>'k' AS INTEGER) AS k_val, "
        "CAST(len(json_keys(props)) AS INTEGER) AS n_entries "
        "FROM events WHERE event_type = 'view'"
    ),
    doc=(
        "MapType surface: parse the JSON payload into map<string,int> "
        "(from_json), then map_keys / element_at / size — the dynamic-"
        "schema path for semi-structured payloads where get_json_object "
        "per known key (q_json_extract) doesn't apply. All map functions "
        "run inside codegen; at scale prefer parsing once per row into a "
        "map column over repeated per-key JSON path scans."
    ),
    tags=("scalar", "json", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_entries"),
    )


# ---------------------------------------------------------------------------
# Nested data (reference O21/O22 capnp record shredding/assembly,
# src/columnfile-capnp.cc — Spark/Parquet shred natively; the query surface
# is array/struct projection + explode)
# ---------------------------------------------------------------------------


@query(
    "q_nested_project",
    oracle=(
        "SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS emb_dim, "
        "round(CAST(embedding[1] AS DOUBLE), 6) AS e0 "
        "FROM embeddings"
    ),
    doc=(
        "Nested/array projection (reference O21 list shredding, "
        "columnfile-capnp.cc:76-92): element access + cardinality without "
        "exploding. DuckDB arrays are 1-based, Spark 0-based."
    ),
    tags=("nested",),
)
def q_nested_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("emb_dim"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("e0"),
    )


@query(
    "q_explode",
    oracle=(
        "SELECT vec_id, round(CAST(UNNEST(embedding) AS DOUBLE), 6) AS e "
        "FROM embeddings WHERE vec_id < 50"
    ),
    doc=(
        "Array explode (reference O21's list->rows direction): one output "
        "row per element; generator runs inside codegen, no shuffle."
    ),
    tags=("nested",),
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select("vec_id", F.explode("embedding").alias("e_raw")).select(
        "vec_id", F.round(F.col("e_raw").cast("double"), 6).alias("e")
    )


# ---------------------------------------------------------------------------
# Streaming batch-equivalent (reference O23 incremental segments; full
# Structured Streaming lives in libcolumnfile_spark.streaming — this query
# pins the tumbling-window semantics against the SQL oracle)
# ---------------------------------------------------------------------------


@query(
    "q_stream_tumbling",
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "count(*) AS n_events, round(sum(value), 2) AS total_value "
        "FROM events GROUP BY date_trunc('hour', ts), event_type"
    ),
    doc=(
        "Tumbling 1-hour window aggregate, batch-equivalent of the "
        "streaming query in libcolumnfile_spark.streaming (F.window on an "
        "hour boundary == date_trunc('hour'))."
    ),
    tags=("streaming", "window"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
