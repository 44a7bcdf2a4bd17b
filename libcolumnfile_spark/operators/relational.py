"""Relational surface extensions: cube, pivot, UDTF, as-of / range join
declared queries (standard-engine operators absent in the reference —
SURVEY.md §2.2; the reference's only extension hook is the AddFilter
lambda, src/columnfile.h:290-291).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from libcolumnfile_spark.operators.joins import asof_join, range_join_pairs
from libcolumnfile_spark.queries import T, query


# ---------------------------------------------------------------------------
# Grouping sets: CUBE / ROLLUP / GROUPING SETS via two-level re-aggregation
# ---------------------------------------------------------------------------


def qty_base(df: DataFrame) -> DataFrame:
    """Pre-aggregate lineitem to one row per FULL dim combination before
    any cube/rollup/grouping-sets expansion.

    Spark's Expand operator replicates every INPUT row once per grouping
    set; over the raw fact table that is O(rows x sets) work and (under
    whole-stage codegen) the dominant cost of the query. count and sum
    are re-aggregable (sum of partial counts/sums), so grouping sets can
    instead expand a base aggregate with one row per (returnflag,
    linestatus) — O(groups x sets). At 100 TB this is the difference
    between expanding 10^12 rows and expanding a few hundred: the only
    full-data pass is a plain partial+final hash aggregate whose shuffle
    carries one row per group per mapper.
    """
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__sq"),
    )


def _reagg(g) -> DataFrame:
    return g.agg(
        F.sum("__cnt").alias("count_order"),
        F.sum("__sq").cast("double").alias("sum_qty"),
    )


@query(
    "q_cube",
    oracle=(
        "SELECT l_returnflag, l_linestatus, count(*) AS count_order, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
    ),
    doc=(
        "CUBE grouping sets: all 4 grouping combinations from one scan, "
        "via two-level re-aggregation (see qty_base) — Expand runs over "
        "the tiny base aggregate, never the fact table."
    ),
    tags=("agg", "grouping"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = qty_base(T(spark, sf_dir, "lineitem"))
    return _reagg(base.cube("l_returnflag", "l_linestatus"))


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------


@query(
    "q_pivot",
    oracle=(
        "SELECT o_orderpriority, "
        "count(*) FILTER (o_orderstatus = 'F') AS cnt_f, "
        "count(*) FILTER (o_orderstatus = 'O') AS cnt_o, "
        "count(*) FILTER (o_orderstatus = 'P') AS cnt_p "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc=(
        "Pivot (rows -> columns) with explicit value list: explicit "
        "values keep it a single-pass aggregate (no values-discovery "
        "scan, which at 100 TB would double the I/O)."
    ),
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    p = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).agg(
        F.count(F.lit(1))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("cnt_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("cnt_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("cnt_p"),
    )


# ---------------------------------------------------------------------------
# As-of join
# ---------------------------------------------------------------------------


@query(
    "q_join_asof",
    oracle=(
        "WITH r AS (SELECT user_id, ts, max_by(value, event_id) AS value "
        "  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts), "
        "l AS (SELECT event_id, user_id, ts FROM events "
        "  WHERE event_type = 'click') "
        "SELECT l.event_id, l.user_id, r.value AS asof_value "
        "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts"
    ),
    doc=(
        "As-of join: each click gets the most recent preceding purchase "
        "value per user. Spark has no ASOF JOIN; ours is the union + "
        "carry-forward-window formulation — one shuffle on the key, no "
        "quadratic self-join (operators/joins.py). Right side pre-"
        "deduped per (user, ts) by max event_id for determinism."
    ),
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    out = asof_join(left, right, on="user_id", ts_col="ts", value_cols=["value"])
    return out.select("event_id", "user_id", F.col("asof_value"))


@query(
    "q_join_range",
    oracle=(
        "SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND a.event_id < b.event_id "
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE"
    ),
    doc=(
        "Range (interval) join: same-user event pairs within 5 minutes. "
        "The user_id equality is the shuffle key; the interval predicate "
        "is a join residual on already-co-located rows — never a cross "
        "product."
    ),
    tags=("join", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return range_join_pairs(T(spark, sf_dir, "events"), max_gap_minutes=5)


# ---------------------------------------------------------------------------
# Python UDTF (table function; Spark 4 surface)
# ---------------------------------------------------------------------------


class BigramsUDTF:
    """Yield (pos, bigram) for consecutive single-space-separated word
    pairs — a UDTF so one input row fans out to many output rows."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if not text:
            return
        tokens = text.split(" ")
        for i in range(len(tokens) - 1):
            yield doc_id, i + 1, tokens[i] + " " + tokens[i + 1]


def _register_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "cf_bigrams",
        udtf(BigramsUDTF, returnType="doc_id bigint, pos int, bigram string"),
    )


@query(
    "q_udtf",
    oracle=(
        "SELECT d.doc_id, CAST(g.i AS INTEGER) AS pos, "
        "d.tokens[g.i] || ' ' || d.tokens[g.i+1] AS bigram "
        "FROM (SELECT doc_id, string_split(text, ' ') AS tokens "
        "      FROM documents WHERE doc_id < 100) d, "
        "LATERAL (SELECT unnest(generate_series(1, len(d.tokens)-1)) AS i) g"
    ),
    doc=(
        "Python UDTF (one row -> many rows) via LATERAL table-function "
        "call: word bigrams with positions. Arrow-batched like any "
        "Python-source operator; prefer built-in explode when semantics "
        "allow (this exists to cover the UDTF API surface)."
    ),
    tags=("udf", "udtf"),
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_udtf(spark)
    view = "cf_docs_" + hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT b.doc_id, b.pos, b.bigram FROM {view} v, "
        "LATERAL cf_bigrams(v.doc_id, v.text) b"
    )


# ---------------------------------------------------------------------------
# Set difference, explicit grouping sets, exact percentiles, range frames
# ---------------------------------------------------------------------------


@query(
    "q_except",
    oracle=(
        "SELECT c_custkey FROM customer "
        "EXCEPT ALL "
        "SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000.0"
    ),
    doc=(
        "Set difference with multiplicity (exceptAll): customers minus "
        "custkeys with a high-value order. Plans as a single "
        "hash-partitioned exchange on the full row (like distinct); no "
        "driver involvement."
    ),
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    ords = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(ords)


@query(
    "q_grouping_sets",
    oracle=(
        "SELECT l_returnflag, l_linestatus, count(*) AS count_order, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))"
    ),
    doc=(
        "Explicit GROUPING SETS (the general form of rollup/cube): two "
        "chosen grouping combinations over ONE scan, expanded over the "
        "two-level base aggregate (see qty_base)."
    ),
    tags=("agg", "grouping"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = qty_base(T(spark, sf_dir, "lineitem"))
    return _reagg(
        base.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"]],
            "l_returnflag",
            "l_linestatus",
        )
    )


@query(
    "q_percentile",
    oracle=(
        "SELECT l_returnflag, "
        "round(quantile_cont(l_quantity, 0.5), 4) AS p50, "
        "round(quantile_cont(l_quantity, 0.95), 4) AS p95 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc=(
        "Exact percentiles (linear interpolation — Spark percentile() == "
        "DuckDB quantile_cont). Exact percentile holds per-group sorted "
        "buffers; at 100 TB prefer approx_percentile (t-digest sketch, "
        "mergeable map-side) — exact is the oracle-checkable surface."
    ),
    tags=("agg",),
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("l_quantity"), F.lit(0.95)), 4).alias("p95"),
    )


@query(
    "q_window_range",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice, "
        "CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS INT) AS n_similar "
        "FROM orders"
    ),
    doc=(
        "RANGE window frame (value-based, not row-based): per customer, "
        "how many of their orders fall within 10k below this order's "
        "price. One partitionBy shuffle; the frame is evaluated over the "
        "sorted run per partition."
    ),
    tags=("window",),
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL form: the DataFrame rangeBetween API only accepts long offsets,
    # but the frame bound here is a double (price)
    T(spark, sf_dir, "orders").createOrReplaceTempView("cf_orders_wr")
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice, "
        "CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS INT) AS n_similar "
        "FROM cf_orders_wr"
    )


@query(
    "q_join_outer",
    oracle=(
        "SELECT c_count, count(*) AS custdist FROM ("
        "  SELECT c_custkey, count(o_orderkey) AS c_count "
        "  FROM customer LEFT OUTER JOIN orders "
        "    ON c_custkey = o_custkey AND o_totalprice > 150000.0 "
        "  GROUP BY c_custkey) t "
        "GROUP BY c_count"
    ),
    doc=(
        "Left outer join + two-level aggregate (TPC-H Q13 shape): "
        "distribution of high-value-order counts per customer, "
        "INCLUDING zero-order customers — the null-extension semantics "
        "only an outer join provides. The orders-side predicate lives in "
        "the join condition (filtering before the join is equivalent and "
        "is what Spark plans); the second aggregate runs over one row "
        "per customer, so its shuffle is tiny."
    ),
    tags=("join", "outer", "agg"),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_unpivot",
    oracle=(
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, "
        "l_quantity AS val FROM lineitem "
        "UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'l_extendedprice', "
        "l_extendedprice FROM lineitem "
        "UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'l_discount', l_discount "
        "FROM lineitem"
    ),
    doc=(
        "Unpivot / melt (columns -> rows; inverse of q_pivot): three "
        "measure columns become (measure, val) pairs. Spark plans Expand "
        "— one scan, each input row replicated once per measure map-side; "
        "no shuffle at all (contrast the UNION ALL oracle formulation, "
        "which scans the table three times)."
    ),
    tags=("pivot",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


@query(
    "q_window_ntile",
    oracle=(
        "WITH t AS (SELECT o_orderpriority, "
        "  NTILE(4) OVER (PARTITION BY o_orderpriority "
        "    ORDER BY o_totalprice, o_orderkey) AS quartile, "
        "  o_totalprice FROM orders) "
        "SELECT o_orderpriority, CAST(quartile AS INT) AS quartile, "
        "count(*) AS n_orders, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price "
        "FROM t GROUP BY o_orderpriority, quartile"
    ),
    doc=(
        "NTILE bucketing (equi-depth quartiles of order value per "
        "priority class) + per-quartile rollup. Deterministic tie-break "
        "on o_orderkey; decimal sum for cross-engine exactness. One "
        "partitionBy shuffle shared by the window and the aggregate."
    ),
    tags=("window",),
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        T(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            "o_totalprice",
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q_time_rollup",
    oracle=(
        "SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, "
        "count(*) AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 2 "
        "UNION ALL "
        "SELECT 'day', date_trunc('day', ts), count(*), "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) "
        "FROM events GROUP BY 2"
    ),
    doc=(
        "Hypertable-style multi-resolution time rollup (continuous-"
        "aggregate shape): hourly buckets aggregated from the raw events, "
        "daily buckets re-aggregated FROM THE HOURLY PARTIALS — the raw "
        "table is scanned exactly once, and the coarser grain costs "
        "O(hours), not O(events). Decimal partial sums make the two-level "
        "re-aggregation bit-exact vs the oracle's direct daily group-by. "
        "At 100 TB this is the materialized-rollup pattern: each coarser "
        "resolution derives from the previous one."
    ),
    tags=("agg", "time"),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    hour = (
        T(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("__sv"),
        )
    )
    hourly = hour.select(
        F.lit("hour").alias("grain"),
        "bucket",
        "n_events",
        F.col("__sv").cast("double").alias("sum_value"),
    )
    daily = (
        hour.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("__sv").alias("__sv"))
        .select(
            F.lit("day").alias("grain"),
            "bucket",
            "n_events",
            F.col("__sv").cast("double").alias("sum_value"),
        )
    )
    return hourly.unionByName(daily)


@query(
    "q_join_salted",
    oracle=(
        "SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 100000.0"
    ),
    doc=(
        "Skew-salted equi-join (operators/joins.py:salted_join): fact keys "
        "spread over 8 salts, dim replicated per salt — row-identical to "
        "the plain join (the oracle IS the plain join), only the shuffle "
        "partitioning differs. The explicit-salting path for known skew; "
        "AQE skew-join covers the adaptive case."
    ),
    tags=("join", "skew"),
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.operators.joins import salted_join

    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    c = T(spark, sf_dir, "customer")
    return salted_join(o, c, "o_custkey", "c_custkey", n_salts=8).select(
        "o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_bucketed",
    oracle=(
        "SELECT o_orderpriority, count(*) AS n_items, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority"
    ),
    doc=(
        "Co-located sort-merge join over storage-bucketed tables "
        "(operators/joins.py:ensure_bucketed): orders and lineitem are "
        "written hash-clustered+sorted by orderkey into matching bucket "
        "counts, so the join plans with NO exchange on either side "
        "(asserted in tests/test_plans.py) — the fact-fact join "
        "shuffles once at write time instead of once per query. Result is "
        "row-identical to the plain join (the oracle IS the plain join)."
    ),
    tags=("join", "bucketed"),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.operators.joins import ensure_bucketed

    o = spark.table(ensure_bucketed(spark, sf_dir, "orders", "o_orderkey"))
    li = spark.table(ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey"))
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q_window_dist",
    # percent_rank = (rank-1)/(n-1) and cume_dist = rank_to_last/n are
    # exact integer-ratio doubles — identical IEEE results both engines.
    oracle=(
        "SELECT o_orderkey, o_orderpriority, "
        "round(percent_rank() OVER (PARTITION BY o_orderpriority "
        "  ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank, "
        "round(cume_dist() OVER (PARTITION BY o_orderpriority "
        "  ORDER BY o_totalprice, o_orderkey), 6) AS cume "
        "FROM orders"
    ),
    doc=(
        "Distribution window functions percent_rank/cume_dist: relative "
        "standing of each order's value within its priority class. One "
        "partitionBy shuffle serves both functions (same window spec)."
    ),
    tags=("window",),
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "q_null_safe_join",
    # A plain equi-join DROPS the NULL-key group; the null-safe variant
    # (Spark <=> / SQL IS NOT DISTINCT FROM) keeps it — that row's
    # presence is what this query pins down.
    oracle=(
        "WITH g AS (SELECT nullif(o_orderstatus, 'F') AS k, "
        "count(*) AS n FROM orders GROUP BY 1) "
        "SELECT a.k AS k, a.n AS n_left, b.n AS n_right "
        "FROM g a JOIN g b ON a.k IS NOT DISTINCT FROM b.k"
    ),
    doc=(
        "Null-safe equality join (eqNullSafe / IS NOT DISTINCT FROM): "
        "NULL keys match NULL keys instead of vanishing. Planned as a "
        "normal hash join — null-safe equality is still an equi-key, so "
        "it broadcasts/shuffles like any join (no nested-loop cliff)."
    ),
    tags=("join", "null"),
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        T(spark, sf_dir, "orders")
        .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = g.alias("a"), g.alias("b")
    return a.join(b, F.col("a.k").eqNullSafe(F.col("b.k"))).select(
        F.col("a.k").alias("k"),
        F.col("a.n").alias("n_left"),
        F.col("b.n").alias("n_right"),
    )


@query(
    "q_limit_offset",
    # pagination page 3 (rows 200..299) of a fully-ordered scan: the
    # total order (totalprice DESC, orderkey) makes the page deterministic
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100 OFFSET 200"
    ),
    doc=(
        "LIMIT/OFFSET pagination over a total order. Spark plans the "
        "sort+page as TakeOrderedAndProject with offset — each partition "
        "keeps a (limit+offset)-heap, the driver merges and drops the "
        "offset; no global sort materializes."
    ),
    tags=("sort", "limit"),
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(200)
        .limit(100)
    )


@query(
    "q_union_by_name",
    # schema evolution: two projections with different column sets,
    # missing columns NULL-filled by NAME (not position)
    oracle=(
        "SELECT p_partkey, p_name, p_brand, NULL AS p_retailprice FROM part "
        "UNION ALL BY NAME "
        "SELECT p_partkey, p_name, p_retailprice, NULL AS p_brand FROM part"
    ),
    doc=(
        "unionByName(allowMissingColumns=True): the schema-evolution "
        "union — columns align by NAME and absent ones NULL-fill, the "
        "append path when a table gains columns mid-stream (same "
        "semantics as the reference's per-segment dynamic column sets, "
        "src/columnfile-writer.cc:152-174)."
    ),
    tags=("setop", "schema"),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part")
    a = p.select("p_partkey", "p_name", "p_brand")
    b = p.select("p_partkey", "p_name", "p_retailprice")
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "q_try_cast",
    # try_cast returns NULL on malformed input instead of throwing
    # (Spark 4 runs ANSI mode, so plain CAST would fail the whole job on
    # one bad row — try_cast is the 100 TB-safe ingestion idiom)
    # The double path pre-extracts a numeric token with the SAME regex on
    # both engines: DuckDB's TRY_CAST accepts 'inf'/'nan' spellings that
    # Spark's rejects, so casting raw prefixes is an engine-divergent
    # comparison on adversarial fixtures (e.g. a doc starting "inf ").
    oracle=(
        "SELECT doc_id, "
        "TRY_CAST(split_part(text, ' ', 1) AS INTEGER) AS first_tok_int, "
        r"TRY_CAST(regexp_extract(substring(text, 1, 4), '^[+-]?[0-9]+(\.[0-9]*)?', 0) "
        "AS DOUBLE) AS prefix_num "
        "FROM documents"
    ),
    doc=(
        "try_cast ingestion safety: malformed cells become NULL instead "
        "of failing the job — per-row error containment for dirty "
        "corpora under ANSI semantics."
    ),
    tags=("scalar", "cast"),
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split_part(F.col("text"), F.lit(" "), F.lit(1))
        .try_cast("int")
        .alias("first_tok_int"),
        F.regexp_extract(
            F.substring(F.col("text"), 1, 4), r"^[+-]?[0-9]+(\.[0-9]*)?", 0
        )
        .try_cast("double")
        .alias("prefix_num"),
    )


@query(
    "q_levenshtein",
    # edit distance over the (constant-size) nation dimension: scalar
    # fuzzy-match surface; the blocked-pairs shape is the same candidate
    # pattern the dedup operators use at corpus scale
    oracle=(
        "SELECT a.n_name AS name_a, b.n_name AS name_b, "
        "levenshtein(a.n_name, b.n_name) AS dist "
        "FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey "
        "AND a.n_nationkey < b.n_nationkey "
        "WHERE levenshtein(a.n_name, b.n_name) <= 6"
    ),
    doc=(
        "Levenshtein edit distance (fuzzy string matching) over "
        "region-blocked nation pairs — the scalar building block of "
        "typo-tolerant entity matching; blocking bounds the quadratic "
        "exactly like the dedup operators."
    ),
    tags=("scalar", "string"),
)
def q_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            # bigint: Spark levenshtein is int32, DuckDB's is BIGINT, and
            # the driver hash is dtype-sensitive
            dist.cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= 6)
    )


# ---------------------------------------------------------------------------
# Batch sessionization: gap-based session assignment over an event log
# (the batch analog of the streaming session window, q_stream_session).
# ---------------------------------------------------------------------------


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "INTERVAL '30' MINUTE",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization: events more than ``gap`` apart start a
    new session. Classic two-window shape: lag() marks session starts,
    a running sum over the marks numbers sessions, then one group-by
    aggregates per session.

    ONE shuffle: all three steps partition by user, so Catalyst reuses a
    single Exchange(user) — the windows sort once per partition and the
    final hash agg sees co-partitioned input. Timestamp arithmetic stays
    in TimestampType (microsecond precision) on both engines; no
    unix-seconds truncation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    marked = df.withColumn(
        "__new_session",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (F.col(ts_col) - F.lag(ts_col).over(w) > F.expr(gap)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = marked.withColumn(
        "session_idx",
        F.sum("__new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return (
        numbered.groupBy(F.col(user_col).alias("user_id"), "session_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
        .select(
            "user_id", "session_idx", "n_events", "session_start",
            "session_end", "total_value",
        )
    )


_SESSIONIZE_ORACLE = (
    "WITH m AS (SELECT user_id, ts, value, "
    "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30' MINUTE "
    "THEN 1 ELSE 0 END AS new_session FROM events), "
    "n AS (SELECT user_id, ts, value, "
    "CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx "
    "FROM m) "
    "SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events, "
    "min(ts) AS session_start, max(ts) AS session_end, "
    "round(sum(value), 4) AS total_value "
    "FROM n GROUP BY user_id, session_idx"
)


@query(
    "q_sessionize",
    oracle=_SESSIONIZE_ORACLE,
    doc=(
        "Batch gap-based sessionization (30-minute gap): lag-mark + "
        "running-sum session numbering + per-session aggregate, all on "
        "one Exchange(user_id)."
    ),
    tags=("window", "agg", "pipeline"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(T(spark, sf_dir, "events"))


@query(
    "q_gap_fill",
    oracle=(
        "WITH span AS ("
        "SELECT user_id, date_trunc('hour', min(ts)) AS t0, "
        "date_trunc('hour', max(ts)) AS t1 FROM events GROUP BY user_id), "
        "grid AS (SELECT user_id, "
        "unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_ts FROM span), "
        "cnts AS (SELECT user_id, date_trunc('hour', ts) AS hour_ts, "
        "count(*) AS n FROM events GROUP BY user_id, date_trunc('hour', ts)) "
        "SELECT g.user_id, count(*) AS n_hours, "
        "CAST(sum(CASE WHEN c.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_gap_hours, "
        "CAST(sum(COALESCE(c.n, 0)) AS BIGINT) AS n_events "
        "FROM grid g LEFT JOIN cnts c "
        "ON g.user_id = c.user_id AND g.hour_ts = c.hour_ts "
        "GROUP BY g.user_id ORDER BY g.user_id"
    ),
    doc=(
        "Time-series gap filling (resample to an hourly grid): per user, "
        "generate the dense hour grid between first and last event "
        "(explode(sequence(t0, t1, 1 hour))), left-join the per-hour "
        "event counts, report grid size / gap hours / events per user. "
        "Scale shape: the grid explodes from ONE row per user (never "
        "from events), both aggregates are partial+final on narrow keys, "
        "and the grid-counts join co-partitions on user_id — at 100 TB "
        "the dense grid is O(users x hours), generated distributed, "
        "never materialized on the driver."
    ),
    tags=("window", "timeseries"),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.session import default_parallelism

    ev = T(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    # explicit repartition BEFORE the explode: the span aggregate is tiny
    # (one row per user) so AQE coalesces it to ~1 partition, and the
    # explode then amplifies ~#hours x on a single task (measured 7.5x
    # at x10 data). REPARTITION_BY_NUM is exempt from coalescing, so the
    # row generation fans out across cores; keying by user_id keeps a
    # user's grid together for the join behind it.
    grid = span.repartition(default_parallelism(), "user_id").select(
        "user_id",
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts"),
    )
    cnts = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    g, c = grid.alias("g"), cnts.alias("c")
    return (
        g.join(
            c,
            (F.col("g.user_id") == F.col("c.user_id"))
            & (F.col("g.hour_ts") == F.col("c.hour_ts")),
            "left",
        )
        .groupBy(F.col("g.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(F.col("c.n").isNull(), 1).otherwise(0)).alias("n_gap_hours"),
            F.sum(F.coalesce(F.col("c.n"), F.lit(0))).cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q_funnel",
    oracle=(
        "WITH v AS (SELECT user_id, min(ts) AS t_view FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e "
        "JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' "
        "AND e.ts > v.t_view AND e.ts <= v.t_view + INTERVAL 48 HOUR "
        "GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t_buy FROM events e "
        "JOIN c ON e.user_id = c.user_id WHERE e.event_type = 'purchase' "
        "AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 48 HOUR "
        "GROUP BY e.user_id) "
        "SELECT 'view' AS stage, count(*) AS n_users FROM v "
        "UNION ALL SELECT 'click', count(*) FROM c "
        "UNION ALL SELECT 'purchase', count(*) FROM p"
    ),
    doc=(
        "Conversion funnel (view -> click within 48h -> purchase within "
        "48h): per-user stage timestamps via three STACKED window minima "
        "over the same user partition — one shuffle of events, three "
        "window passes over the sorted partition (the oracle's 3-CTE "
        "join chain re-scans events per stage; the window form scans "
        "once). Stage counts unpivot via stack()."
    ),
    tags=("window", "funnel", "events"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    h48 = F.expr("INTERVAL 48 HOURS")
    t = F.col
    s = (
        ev.withColumn(
            "t_view", F.min(F.when(t("event_type") == "view", t("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (t("event_type") == "click")
                    & (t("ts") > t("t_view"))
                    & (t("ts") <= t("t_view") + h48),
                    t("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_buy",
            F.min(
                F.when(
                    (t("event_type") == "purchase")
                    & (t("ts") > t("t_click"))
                    & (t("ts") <= t("t_click") + h48),
                    t("ts"),
                )
            ).over(w),
        )
    )
    per_user = s.select("user_id", "t_view", "t_click", "t_buy").distinct()
    counts = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_buy").alias("n_buy"),
    )
    return counts.select(
        F.expr(
            "stack(3, 'view', n_view, 'click', n_click, 'purchase', n_buy) "
            "AS (stage, n_users)"
        )
    )


@query(
    "q_cohort_retention",
    oracle=(
        "WITH f AS (SELECT user_id, "
        "CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week "
        "FROM events GROUP BY user_id), "
        "j AS (SELECT e.user_id, f.cohort_week, "
        "CAST(date_diff('day', f.cohort_week, "
        "CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_offset "
        "FROM events e JOIN f ON e.user_id = f.user_id) "
        "SELECT cohort_week, week_offset, "
        "count(DISTINCT user_id) AS n_users "
        "FROM j GROUP BY 1, 2"
    ),
    doc=(
        "Weekly cohort retention: users grouped by first-activity week, "
        "distinct-user counts per (cohort, weeks-since-first) cell — the "
        "classic retention-triangle query. Two key-bounded shuffles "
        "(per-user first-activity, then the cohort-cell aggregate); the "
        "events-to-cohort join co-partitions on user_id with the "
        "first-activity aggregate, so no extra exchange at scale. Week "
        "truncation is ISO-Monday on both engines; offsets divide "
        "exactly by 7 because both endpoints are week starts."
    ),
    tags=("window", "events", "agg"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    joined = e.join(first, "user_id")
    off = (
        F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
        / 7
    ).cast("int")
    return (
        joined.select("user_id", "cohort_week", off.alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Event-stream analytics: recency-decayed activity scores, proportional
# time-range splits, transition matrices, robust outlier reports. All
# epoch arithmetic runs on unix MICROSECONDS (bigint, exact on both
# engines) — never float seconds.
# ---------------------------------------------------------------------------


def _epoch_us(c) -> Column:
    """Exact epoch microseconds of a timestamp column. events.ts arrives
    as TIMESTAMP_NTZ (nanos parquet via load_table); the session zone is
    pinned to UTC (tables.py:44), so the NTZ->TIMESTAMP cast is the
    identity and matches DuckDB's naive epoch_us()."""
    return F.unix_micros(F.col(c).cast("timestamp") if isinstance(c, str) else c.cast("timestamp"))


def decay_score(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: float = 7.0,
) -> DataFrame:
    """Per-user exponentially time-decayed activity score:
    score = sum(value * 2^(-age_days / half_life)), age measured from
    the corpus max timestamp. The recency-weighted user/domain activity
    prior of a pipeline (recent activity counts, stale activity decays)
    — the closed-form aggregate that replaces a sequential EWMA, which
    would need per-row recursion.

    One groupBy(user) aggregate; the global max(ts) arrives as a 1-row
    aggregate broadcast cross join (never a driver collect). Age deltas
    are integer microseconds; the only float step is the final exp.
    """
    tmax = df.agg(_epoch_us(F.max(ts_col)).alias("__tmax_us"))
    age_days = (F.col("__tmax_us") - _epoch_us(ts_col)) / (
        86400.0 * 1e6
    )
    decayed = F.col(value_col) * F.pow(F.lit(2.0), -age_days / half_life_days)
    return (
        df.crossJoin(F.broadcast(tmax))
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Tolerance argument for the hash oracle: sum(float) order
            # differs across Spark partitioning and vs DuckDB, so two
            # engines can disagree in the last ~ulp; round(4) absorbs
            # that UNLESS a per-user sum lands within ~1e-13 of a
            # 4-decimal rounding boundary (same latent-flake exposure as
            # chi2_uniform in q_class_balance — accepted: per-user sums
            # are O(100) terms of O(1) magnitude, boundary probability
            # ~1e-10 per row, and the full audit has never flaked on
            # it). If it ever does, canonicalize the fold order by
            # sorting terms per user before summing.
            F.round(F.sum(decayed), 4).alias("decay_score"),
            F.max(ts_col).alias("last_ts"),
        )
    )


@query(
    "q_decay_score",
    oracle=(
        "WITH m AS (SELECT epoch_us(max(ts)) AS tmax_us FROM events) "
        "SELECT user_id, count(*) AS n_events, "
        "round(sum(value * pow(2.0, -((tmax_us - epoch_us(ts)) / 86400000000.0) "
        "/ 7.0)), 4) AS decay_score, "
        "max(ts) AS last_ts "
        "FROM events CROSS JOIN m GROUP BY user_id"
    ),
    doc=(
        "Per-user exponentially time-decayed activity score (half-life "
        "7 days from the corpus max timestamp): one hash aggregate + a "
        "1-row broadcast; integer-microsecond age arithmetic."
    ),
    tags=("events", "agg", "pipeline"),
)
def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decay_score(T(spark, sf_dir, "events"))


def temporal_split(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bounds: tuple[int, int] = (8, 9),
) -> DataFrame:
    """Proportional time-range train/valid/test split: the time axis
    [min_ts, max_ts] divides at 80%/90% of its SPAN and every row is
    assigned by integer-microsecond comparison — the leakage-free
    temporal split of a training pipeline (future rows never land in
    train), as opposed to q_split_assign's hash split.

    All arithmetic is integer ((e - mn) * 10 < span * k), so the
    boundary is exact on both engines — no interpolated quantile, no
    float threshold, no global sort: a 1-row min/max broadcast plus a
    map-side CASE, then one tiny aggregate per split.
    """
    b1, b2 = bounds
    mm = df.agg(
        _epoch_us(F.min(ts_col)).alias("__mn"),
        _epoch_us(F.max(ts_col)).alias("__mx"),
    )
    e = _epoch_us(ts_col)
    rel10 = (e - F.col("__mn")) * 10
    span = F.col("__mx") - F.col("__mn")
    split = (
        F.when(rel10 < span * b1, F.lit("train"))
        .when(rel10 < span * b2, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        df.crossJoin(F.broadcast(mm))
        .groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(user_col).alias("n_users"),
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
        )
    )


@query(
    "q_temporal_split",
    oracle=(
        "WITH m AS (SELECT epoch_us(min(ts)) AS mn, epoch_us(max(ts)) AS mx "
        "FROM events) "
        "SELECT CASE WHEN (epoch_us(ts) - mn) * 10 < (mx - mn) * 8 THEN 'train' "
        "WHEN (epoch_us(ts) - mn) * 10 < (mx - mn) * 9 THEN 'valid' "
        "ELSE 'test' END AS split, "
        "count(*) AS n_events, count(DISTINCT user_id) AS n_users, "
        "min(ts) AS min_ts, max(ts) AS max_ts "
        "FROM events CROSS JOIN m GROUP BY 1"
    ),
    doc=(
        "Leakage-free temporal train/valid/test split at 80%/90% of the "
        "time span: integer-microsecond boundaries, 1-row min/max "
        "broadcast, map-side assignment."
    ),
    tags=("events", "pipeline"),
)
def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal_split(T(spark, sf_dir, "events"))


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count of (current -> next) event-type transitions and
    the conditional probability P(next | current). Clickstream /
    curriculum sequence statistics as one lag window + one hash
    aggregate; the transition matrix is event-type-cardinality-bounded
    (tiny), so the probability normalization is a window sum over it.

    The sequence order (ts, event_id) is a total order — lag is
    deterministic cross-engine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nxt = F.lead(type_col).over(w)
    tc = (
        df.select(F.col(type_col).alias("cur"), nxt.alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    total = F.sum("n_transitions").over(Window.partitionBy("cur"))
    return tc.select(
        "cur",
        "nxt",
        "n_transitions",
        F.round(F.col("n_transitions") / total, 6).alias("p_next"),
    )


@query(
    "q_event_transitions",
    oracle=(
        "WITH s AS (SELECT event_type AS cur, "
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS nxt FROM events), "
        "tc AS (SELECT cur, nxt, count(*) AS n_transitions FROM s "
        "WHERE nxt IS NOT NULL GROUP BY cur, nxt) "
        "SELECT cur, nxt, n_transitions, "
        "round(n_transitions / sum(n_transitions) OVER (PARTITION BY cur), 6) "
        "AS p_next FROM tc"
    ),
    doc=(
        "First-order Markov transition matrix over per-user event "
        "sequences (lag window on the (ts, event_id) total order + "
        "type-bounded aggregate)."
    ),
    tags=("events", "window", "pipeline"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transitions(T(spark, sf_dir, "events"))


def iqr_outlier_report(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-group Tukey-fence outlier report: quartiles, IQR fences at
    1.5x, and the count/rate of rows outside them — the numeric
    data-quality screen that runs before a metric column is trusted.

    Two passes: an exact-percentile aggregate builds the per-group
    fences (group-cardinality-bounded — construction-bounded, so
    broadcasting it back is repo-legal), then one map-side compare +
    hash aggregate counts violations. Exact percentile holds per-group
    sorted buffers; at 100 TB swap pass one for approx_percentile
    (t-digest) — same note as q_percentile.
    """
    fences = (
        df.groupBy(key_col)
        .agg(
            F.percentile(F.col(value_col), F.lit(0.25)).alias("q1"),
            F.percentile(F.col(value_col), F.lit(0.75)).alias("q3"),
        )
        .select(
            key_col,
            "q1",
            "q3",
            (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
            (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
        )
    )
    out = (
        df.select(key_col, value_col)
        .join(F.broadcast(fences), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(
                (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi"))
            ).alias("n_outliers"),
            F.round(F.min("lo"), 6).alias("lo_fence"),
            F.round(F.min("hi"), 6).alias("hi_fence"),
        )
        .select(
            key_col,
            "n_rows",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_rows"), 6).alias("outlier_rate"),
            "lo_fence",
            "hi_fence",
        )
    )
    return out


@query(
    "q_outlier_iqr",
    oracle=(
        "WITH f AS (SELECT event_type, "
        "quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 "
        "FROM events GROUP BY event_type), "
        "g AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo, "
        "q3 + 1.5 * (q3 - q1) AS hi FROM f) "
        "SELECT e.event_type, count(*) AS n_rows, "
        "count(*) FILTER (e.value < g.lo OR e.value > g.hi) AS n_outliers, "
        "round(count(*) FILTER (e.value < g.lo OR e.value > g.hi) "
        "/ CAST(count(*) AS DOUBLE), 6) AS outlier_rate, "
        "round(min(g.lo), 6) AS lo_fence, round(min(g.hi), 6) AS hi_fence "
        "FROM events e JOIN g USING (event_type) GROUP BY e.event_type"
    ),
    doc=(
        "Per-group Tukey-fence (1.5x IQR) outlier report over the metric "
        "column: exact-quartile fences broadcast back over one map-side "
        "compare; the pre-trust screen for numeric columns."
    ),
    tags=("events", "agg", "quality"),
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return iqr_outlier_report(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Last-touch attribution: credit each conversion event to the most
# recent preceding touch event (within a lookback horizon) in the
# user's stream — the standard marketing/product analytics operator,
# and the missing sibling of funnel (ordered-stage matching) and
# transitions (adjacent-pair statistics): attribution pairs each
# conversion with a NON-adjacent, type-filtered predecessor.
# ---------------------------------------------------------------------------


def attribution_last_touch(
    df: DataFrame,
    touch_types: tuple[str, ...] = ("click", "view"),
    conv_type: str = "purchase",
    lookback_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-channel conversion credit: for every ``conv_type`` event,
    the last preceding ``touch_types`` event in the same user's stream
    gets the credit iff it happened within ``lookback_days``; stale or
    absent touches fall into the 'none' bucket. Returns
    (channel, n_conversions, revenue).

    Scale design: ONE user-keyed window sort carries both running
    last-touch columns (type and timestamp share the frame, so
    Catalyst plans a single Window over one exchange), then a
    channel-keyed aggregate bounded by the touch-type cardinality.
    No self-join: the naive formulation (conversions x touches,
    filter to latest) shuffles a pair blowup; the running-window form
    is O(events log events/user) and the (ts, id) order is total, so
    the credited touch is deterministic cross-engine.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col(type_col).isin(*touch_types)
    lt_type = F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True).over(w)
    lt_ts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    conv = (
        df.select(
            F.col(type_col),
            F.col(ts_col),
            F.col(value_col),
            lt_type.alias("__lt_type"),
            lt_ts.alias("__lt_ts"),
        )
        .filter(F.col(type_col) == conv_type)
    )
    fresh = F.col("__lt_ts").isNotNull() & (
        F.col("__lt_ts")
        >= F.col(ts_col) - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
    )
    channel = F.when(fresh, F.col("__lt_type")).otherwise(F.lit("none"))
    return conv.groupBy(channel.alias("channel")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum(value_col), 4).alias("revenue"),
    )


@query(
    "q_attribution",
    oracle=(
        "WITH s AS (SELECT event_type, ts, value, "
        "last_value(CASE WHEN event_type IN ('click', 'view') "
        "THEN event_type END IGNORE NULLS) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt_type, "
        "last_value(CASE WHEN event_type IN ('click', 'view') "
        "THEN ts END IGNORE NULLS) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt_ts "
        "FROM events) "
        "SELECT CASE WHEN lt_ts IS NOT NULL "
        "AND lt_ts >= ts - INTERVAL 7 DAY THEN lt_type "
        "ELSE 'none' END AS channel, "
        "count(*) AS n_conversions, round(sum(value), 4) AS revenue "
        "FROM s WHERE event_type = 'purchase' GROUP BY 1"
    ),
    doc=(
        "Last-touch attribution: each purchase credited to the user's "
        "most recent click/view within 7 days (running ignore-nulls "
        "window, no conversion-x-touch self-join); per-channel "
        "conversion counts and revenue."
    ),
    tags=("events", "window", "pipeline"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attribution_last_touch(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily event volume: the time-series
# health signal behind "is traffic trending or mean-reverting?" and the
# sanity check before fitting any seasonal model. Everything after the
# first aggregate is bounded by the number of DAYS.
# ---------------------------------------------------------------------------


def daily_autocorr(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One row: (n_days, mean_daily, autocorr_1) — Pearson correlation
    of the daily event-count series with itself shifted by one day.

    Scale design: one day-keyed count aggregate (map-side partials; the
    exchange is day-cardinality-bounded), then a lag window + corr over
    the DAY table — thousands of rows even for a decade of data. The
    (date-ordered) window is a single tiny sorted run by construction.
    """
    from pyspark.sql import Window

    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "cnt", F.lag("cnt").over(w).alias("prev")
    )
    return lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("cnt"), 4).alias("mean_daily"),
        F.round(F.corr("cnt", "prev"), 4).alias("autocorr_1"),
    )


@query(
    "q_autocorr",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS cnt FROM events GROUP BY 1), "
        "l AS (SELECT cnt, lag(cnt) OVER (ORDER BY d) AS prev FROM daily) "
        "SELECT count(*) AS n_days, round(avg(cnt), 4) AS mean_daily, "
        "round(corr(cnt, prev), 4) AS autocorr_1 FROM l"
    ),
    doc=(
        "Lag-1 autocorrelation of daily event volume: one day-keyed "
        "count aggregate, then lag + corr over the day-cardinality-"
        "bounded series — trend/mean-reversion diagnostic."
    ),
    tags=("events", "stats", "window"),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_autocorr(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Deseasonalized volume anomaly: daily event counts z-scored against
# their own WEEKDAY's mean/stddev — the monitoring alarm that doesn't
# page every Saturday because weekends are quiet. Pairs with q_autocorr
# (trend) as the time-series health duo; everything past the first
# aggregate is day-cardinality-bounded.
# ---------------------------------------------------------------------------


def seasonal_anomaly(
    df: DataFrame, ts_col: str = "ts", z_thresh: float = 1.5
) -> DataFrame:
    """(d, dow, cnt, z): days whose event count deviates more than
    ``z_thresh`` sample standard deviations from their weekday's mean.

    Scale design: one day-keyed count aggregate (the only corpus-sized
    exchange, map-side partials), then mean/stddev per weekday over the
    DAY table (7 groups) broadcast back — all post-aggregate work is
    bounded by the number of days. Weekday is ISO (1=Mon..7=Sun):
    Spark weekday()+1 == DuckDB isodow() — NOT dayofweek, whose origin
    differs between the two dialects (caught by the SQL-surface parity
    test when the oracle also parsed on Spark SQL)."""
    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.withColumn("dow", (F.weekday("d") + 1).cast("int"))
    stats = daily.groupBy("dow").agg(
        F.avg("cnt").alias("mu"), F.stddev_samp("cnt").alias("sd")
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(stats), "dow")
        .filter(F.col("sd") > 0)
        .select("d", "dow", "cnt", F.round(z, 4).alias("z"))
        .filter(F.abs(F.col("z")) > z_thresh)
    )


@query(
    "q_seasonal_anomaly",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d, "
        "count(*) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT d, CAST(isodow(d) AS INT) AS dow, cnt "
        "FROM daily), "
        "st AS (SELECT dow, avg(cnt) AS mu, stddev_samp(cnt) AS sd "
        "FROM dd GROUP BY dow) "
        "SELECT d, dow, cnt, round((cnt - mu) / sd, 4) AS z "
        "FROM dd JOIN st USING (dow) WHERE sd > 0 "
        "AND abs((cnt - mu) / sd) > 1.5"
    ),
    doc=(
        "Weekday-deseasonalized daily-volume anomalies: day-keyed count "
        "+ 7-group weekday stats broadcast back, |z| > 1.5 flagged — "
        "the alarm that doesn't page every Saturday."
    ),
    tags=("events", "stats", "pipeline"),
)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_anomaly(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# CUSUM changepoint scan — the level-shift detector that complements
# q_seasonal_anomaly (single-day spikes) and q_autocorr (trend): the
# cumulative sum of deviations from the series mean peaks in magnitude
# exactly at the day the level changed ("the crawler config changed on
# the 14th"). Everything past the first aggregate is day-bounded.
# ---------------------------------------------------------------------------


def cusum_changepoint(
    df: DataFrame, ts_col: str = "ts", top_k: int = 5
) -> DataFrame:
    """Top-``top_k`` candidate changepoint days by |CUSUM|: (day, cnt,
    cusum) where cusum_d = sum_{e <= d} (cnt_e - mean).

    Scale design: ONE day-keyed count aggregate is the only corpus-
    sized exchange (map-side partials); the mean rides an empty-frame
    window over the DAY table and the cumulative sum is one day-bounded
    ordered window (thousands of rows per decade — the q_autocorr
    shape). Top-k by |cusum| with a day tie-break keeps the output
    deterministic.
    """
    from pyspark.sql.window import Window

    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scored = daily.select(
        "day",
        "cnt",
        F.round(
            F.sum("cnt").over(w_cum)
            - F.row_number().over(Window.orderBy("day"))
            * F.avg("cnt").over(w_all),
            4,
        ).alias("cusum"),
    )
    return scored.orderBy(F.abs(F.col("cusum")).desc(), "day").limit(top_k)


@query(
    "q_cusum",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "count(*) AS cnt FROM events GROUP BY 1), "
        "c AS (SELECT day, cnt, "
        "round(sum(cnt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) "
        "- row_number() OVER (ORDER BY day) * avg(cnt) OVER (), 4) "
        "AS cusum FROM daily) "
        "SELECT day, cnt, cusum FROM c "
        "ORDER BY abs(cusum) DESC, day LIMIT 5"
    ),
    doc=(
        "CUSUM changepoint scan over daily event volume: one day-keyed "
        "count exchange, mean + cumulative-deviation windows over the "
        "day-bounded series, top-5 |CUSUM| days with deterministic "
        "tie-break — locates level shifts the per-day z-score misses."
    ),
    tags=("events", "stats", "window"),
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_changepoint(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Event co-occurrence lift — market-basket association over per-user
# event baskets: which event types co-occur in the same user's history
# more (lift > 1) or less (lift < 1) than independence predicts. The
# association-rules primitive behind "users who X also Y", and the
# behavioral companion to q_cooc_pmi (which measures ADJACENT text
# bigrams, not set co-membership).
# ---------------------------------------------------------------------------


def event_lift(df: DataFrame, user_col: str = "user_id", type_col: str = "event_type") -> DataFrame:
    """(type_a, type_b, n_ab, lift) for every unordered event-type pair
    observed together in at least one user's basket.

    Scale design: the corpus reduces to ONE distinct (user, type) table
    (events collapse to baskets before anything pairs); the pair join
    is user-keyed and emits at most C(n_types, 2) rows per user — types
    are a bounded category set, so this is linear in users. Per-type
    user counts and the user total are derived from the SAME distinct
    table (no second corpus pass) and ride type-cardinality-bounded /
    1-row broadcasts.
    """
    baskets = df.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t")
    ).distinct()
    n_users = baskets.agg(F.countDistinct("u").alias("n"))
    per_type = baskets.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    x, y = baskets.alias("x"), baskets.alias("y").hint("shuffle_hash")
    pairs = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.t") < F.col("y.t")))
        .groupBy(F.col("x.t").alias("type_a"), F.col("y.t").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ca = per_type.select(F.col("t").alias("type_a"), F.col("c").alias("ca"))
    cb = per_type.select(F.col("t").alias("type_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.col("n_ab") * F.col("n") / (F.col("ca") * F.col("cb")), 4
            ).alias("lift"),
        )
    )


@query(
    "q_event_lift",
    oracle=(
        "WITH b AS (SELECT DISTINCT user_id AS u, event_type AS t "
        "FROM events), "
        "n AS (SELECT count(DISTINCT u) AS n FROM b), "
        "pt AS (SELECT t, count(*) AS c FROM b GROUP BY t), "
        "p AS (SELECT x.t AS type_a, y.t AS type_b, count(*) AS n_ab "
        "FROM b x JOIN b y ON x.u = y.u AND x.t < y.t GROUP BY 1, 2) "
        "SELECT type_a, type_b, n_ab, "
        "round(n_ab * n / CAST(ca.c * cb.c AS DOUBLE), 4) AS lift "
        "FROM p JOIN pt ca ON p.type_a = ca.t "
        "JOIN pt cb ON p.type_b = cb.t CROSS JOIN n"
    ),
    doc=(
        "Event-type co-occurrence lift over per-user baskets: one "
        "distinct (user, type) reduction, user-keyed pair join bounded "
        "C(types,2) per user, marginals derived from the same distinct "
        "table — the association-rules 'users who X also Y' primitive."
    ),
    tags=("events", "stats", "pipeline"),
)
def q_event_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_lift(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Rolling-window monitoring bands: 7-day trailing mean/stddev of daily
# volume plus the current day's z-score against its OWN trailing window
# — the ops-dashboard primitive between q_seasonal_anomaly (weekday
# z-score against the whole history) and q_cusum (global level-shift
# scan): it adapts to slow drift because the reference window moves.
# ---------------------------------------------------------------------------


def rolling_daily_stats(
    df: DataFrame, ts_col: str = "ts", window_days: int = 7
) -> DataFrame:
    """(day, cnt, mean_w, sd_w, z) per day with a FULL trailing window
    of ``window_days`` PRIOR CALENDAR days (the current day is scored
    against the preceding window, so a spike never suppresses its own
    alarm).

    The frame is a RANGE over the day NUMBER, not a ROWS frame: a
    zero-event day is simply absent from the daily aggregate, and a
    ROWS frame would silently reach past it into older history — the
    window would be "last 7 observed days", not "last 7 days". The
    n_win == window_days guard then also enforces calendar
    completeness: a gap anywhere in the trailing week drops the row
    rather than scoring it against the wrong baseline.

    Scale design: one day-keyed count aggregate is the only corpus-
    sized exchange; every window runs over the day-bounded series
    (the q_autocorr/q_cusum shape).
    """
    from pyspark.sql.window import Window

    daily = df.groupBy(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.withColumn(
        "day_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    w = Window.orderBy("day_num").rangeBetween(-window_days, -1)
    scored = daily.select(
        "day",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.avg("cnt").over(w).alias("mean_w"),
        F.stddev("cnt").over(w).alias("sd_w"),
    )
    return (
        scored.filter(F.col("n_win") == window_days)
        .filter(F.col("sd_w") > 0)
        .select(
            "day",
            "cnt",
            F.round("mean_w", 4).alias("mean_w"),
            F.round("sd_w", 4).alias("sd_w"),
            F.round((F.col("cnt") - F.col("mean_w")) / F.col("sd_w"), 4).alias("z"),
        )
    )


@query(
    "q_rolling_stats",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, "
        "count(*) AS cnt, "
        "datediff('day', DATE '1970-01-01', "
        "CAST(date_trunc('day', ts) AS DATE)) AS day_num "
        "FROM events GROUP BY 1, 3), "
        "s AS (SELECT day, cnt, "
        "count(*) OVER w AS n_win, avg(cnt) OVER w AS mean_w, "
        "stddev(cnt) OVER w AS sd_w FROM daily "
        "WINDOW w AS (ORDER BY day_num "
        "RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)) "
        "SELECT day, cnt, round(mean_w, 4) AS mean_w, "
        "round(sd_w, 4) AS sd_w, "
        "round((cnt - mean_w) / sd_w, 4) AS z "
        "FROM s WHERE n_win = 7 AND sd_w > 0"
    ),
    doc=(
        "7-day trailing monitoring bands over daily event volume: each "
        "day z-scored against its own PRIOR CALENDAR-day RANGE window "
        "(spikes can't suppress their own alarm; zero-event gaps drop "
        "the row instead of stretching the baseline); one day-keyed "
        "count exchange, all windows day-bounded — the drift-adaptive "
        "alarm between q_seasonal_anomaly and q_cusum."
    ),
    tags=("events", "stats", "window"),
)
def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_daily_stats(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Market-basket association rules over sessions — "users who error in a
# session also purchase in it?": support / confidence / lift for every
# ordered event-type pair co-occurring within a session. The classic
# frequent-itemset primitive at pair depth; baskets come from the same
# gap-sessionization machinery as q_sessionize.
# ---------------------------------------------------------------------------


def _session_baskets(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    gap: str = "INTERVAL '30' MINUTE",
) -> DataFrame:
    """Distinct (user_id, session_idx, item) triples: the basket/item
    incidence list. Same one-Exchange(user) two-window numbering as
    sessionize."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    marked = df.withColumn(
        "__new_session",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (F.col(ts_col) - F.lag(ts_col).over(w) > F.expr(gap)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        marked.withColumn(
            "session_idx",
            F.sum("__new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .select(
            F.col(user_col).alias("user_id"),
            "session_idx",
            F.col(item_col).alias("item"),
        )
        .distinct()
    )


def association_rules(baskets: DataFrame, min_both: int = 2) -> DataFrame:
    """(antecedent, consequent, n_both, support, confidence, lift) for
    every ordered item pair co-occurring in >= ``min_both`` baskets,
    rounded to 6.

    Scale design: pair generation is a self-join on the BASKET key, so
    fan-out is bounded by items-per-basket squared (the item VOCABULARY
    within one basket — the standard market-basket bound), never
    baskets x items. Pair counts and per-item basket counts are two
    key-bounded aggregates; the rule derivation joins the pair table
    against the item-count table twice (item-cardinality-bounded sides,
    shuffle-planned — nothing here is construction-bounded) plus one
    1-row total broadcast. Support arithmetic is exact integer counts
    until the final k-row division.
    """
    b = baskets.select("user_id", "session_idx", "item")
    # the basket incidence list grows with the corpus (NOT construction-
    # bounded): pin the self-join shuffle_hash so a size estimate can't
    # ride it onto the broadcast path at scale (repo broadcast policy)
    l, r = b.alias("l"), b.alias("r").hint("shuffle_hash")
    pairs = (
        l.join(
            r,
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.session_idx") == F.col("r.session_idx"))
            & (F.col("l.item") != F.col("r.item")),
        )
        .groupBy(
            F.col("l.item").alias("antecedent"),
            F.col("r.item").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_both)
    )
    item_n = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    total = b.agg(
        F.count_distinct(F.col("user_id"), F.col("session_idx")).alias("n_baskets")
    )
    out = (
        pairs.join(
            item_n.select(
                F.col("item").alias("antecedent"), F.col("n_item").alias("n_ant")
            ),
            "antecedent",
        )
        .join(
            item_n.select(
                F.col("item").alias("consequent"), F.col("n_item").alias("n_con")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(total))
    )
    return out.select(
        "antecedent",
        "consequent",
        "n_both",
        F.round(F.col("n_both") / F.col("n_baskets"), 6).alias("support"),
        F.round(F.col("n_both") / F.col("n_ant"), 6).alias("confidence"),
        F.round(
            F.col("n_both")
            * F.col("n_baskets")
            / (F.col("n_ant") * F.col("n_con")),
            6,
        ).alias("lift"),
    )


_BASKET_CTE = (
    "m AS (SELECT user_id, ts, event_type, "
    "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
    "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
    "> INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS new_session FROM events), "
    "n AS (SELECT user_id, event_type AS item, "
    "CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "AS session_idx FROM m), "
    "b AS (SELECT DISTINCT user_id, session_idx, item FROM n)"
)


@query(
    "q_assoc_rules",
    oracle=(
        f"WITH {_BASKET_CTE}, "
        "p AS (SELECT l.item AS antecedent, r.item AS consequent, "
        "count(*) AS n_both FROM b l JOIN b r "
        "ON l.user_id = r.user_id AND l.session_idx = r.session_idx "
        "AND l.item <> r.item GROUP BY 1, 2 HAVING count(*) >= 2), "
        "i AS (SELECT item, count(*) AS n_item FROM b GROUP BY 1), "
        "t AS (SELECT count(DISTINCT (user_id, session_idx)) AS n_baskets "
        "FROM b) "
        "SELECT antecedent, consequent, n_both, "
        "round(CAST(n_both AS DOUBLE) / n_baskets, 6) AS support, "
        "round(CAST(n_both AS DOUBLE) / ia.n_item, 6) AS confidence, "
        "round(CAST(n_both AS DOUBLE) * n_baskets "
        "/ (CAST(ia.n_item AS DOUBLE) * ic.n_item), 6) AS lift "
        "FROM p JOIN i ia ON p.antecedent = ia.item "
        "JOIN i ic ON p.consequent = ic.item CROSS JOIN t"
    ),
    doc=(
        "Session-basket association rules (support/confidence/lift per "
        "ordered event-type pair): basket-keyed self-join bounds pair "
        "fan-out at per-basket vocabulary squared, then two bounded "
        "count aggregates + a 1-row total broadcast; exact integer "
        "counts until the final k-row division."
    ),
    tags=("events", "window", "stats", "pipeline"),
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return association_rules(_session_baskets(T(spark, sf_dir, "events")))


# ---------------------------------------------------------------------------
# Interval-overlap join via chunk bucketing — "which user sessions were
# live during an error-burst hour?" An inequality (overlap) join has no
# equi-key, so the naive plan is a cross product with a range filter —
# the shape that dies first at scale. The standard fix: explode each
# interval into the fixed-width time chunks it covers and equi-join on
# the chunk, turning the range join into a hash join whose fan-out is
# bounded by interval length / chunk width.
# ---------------------------------------------------------------------------


def interval_overlap_join(
    sessions: DataFrame,
    incidents: DataFrame,
) -> DataFrame:
    """(win_start, n_err, n_sessions, n_users) per incident hour:
    sessions whose [session_start, session_end] span overlaps the
    incident's [win_start, win_start + 1h) window.

    Scale design: each session explodes into the HOUR CHUNKS it covers
    (``sequence`` of hour-truncated endpoints — fan-out bounded by
    session duration / 1h, small by the sessionization gap), incidents
    occupy exactly one chunk each, and the overlap join becomes an
    EQUI-join on the chunk key (hash-partitionable, AQE-skew-splittable)
    instead of a cross product with a range filter. Chunk granularity ==
    window granularity, so every overlapping (session, incident) pair
    matches on exactly one chunk — no post-join dedup. The final
    aggregate is incident-cardinality-bounded.
    """
    chunks = sessions.select(
        "user_id",
        "session_idx",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("session_start")),
                F.date_trunc("hour", F.col("session_end")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("win_start"),
    )
    return (
        chunks.join(incidents, "win_start")
        .groupBy("win_start")
        .agg(
            F.max("n_err").alias("n_err"),
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _error_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose error count exceeds 1.5x the mean hourly error rate:
    one hour-keyed count aggregate + a 1-row threshold broadcast (the
    adaptive cut keeps the incident set a strict minority at any SF)."""
    ev = T(spark, sf_dir, "events")
    hours = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("win_start"))
        .agg(F.count(F.lit(1)).alias("n_err"))
    )
    thr = hours.agg((F.avg("n_err") * 1.5).alias("thr"))
    return hours.crossJoin(F.broadcast(thr)).filter(
        F.col("n_err") > F.col("thr")
    ).select("win_start", "n_err")


@query(
    "q_join_interval",
    oracle=(
        "WITH m AS (SELECT user_id, ts, value, "
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
        "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
        "> INTERVAL '30' MINUTE THEN 1 ELSE 0 END AS new_session "
        "FROM events), "
        "n AS (SELECT user_id, ts, "
        "CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS session_idx FROM m), "
        "s AS (SELECT user_id, session_idx, min(ts) AS session_start, "
        "max(ts) AS session_end FROM n GROUP BY 1, 2), "
        "h AS (SELECT date_trunc('hour', ts) AS win_start, count(*) AS "
        "n_err FROM events WHERE event_type = 'error' GROUP BY 1), "
        "t AS (SELECT avg(n_err) * 1.5 AS thr FROM h), "
        "i AS (SELECT win_start, n_err FROM h CROSS JOIN t "
        "WHERE n_err > thr) "
        "SELECT i.win_start, CAST(max(i.n_err) AS BIGINT) AS n_err, "
        "count(*) AS n_sessions, count(DISTINCT s.user_id) AS n_users "
        "FROM i JOIN s ON s.session_start < i.win_start + INTERVAL 1 HOUR "
        "AND s.session_end >= i.win_start GROUP BY 1"
    ),
    doc=(
        "Interval-overlap join (sessions live during error-burst "
        "hours) rewritten as an equi-join: sessions explode into the "
        "hour chunks they cover (duration-bounded fan-out), incidents "
        "occupy one chunk, overlap matches on the chunk key — a hash "
        "join where the naive plan is a cross product with a range "
        "filter. The oracle runs the inequality join directly."
    ),
    tags=("events", "join", "window"),
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = sessionize(T(spark, sf_dir, "events"))
    return interval_overlap_join(sess, _error_incidents(spark, sf_dir))


# ---------------------------------------------------------------------------
# Sequential trigram mining — frequent length-3 event paths over the
# per-user timeline: the sequential-pattern depth above
# q_event_transitions' first-order pairs and the ORDERED counterpart of
# q_assoc_rules' unordered baskets ("view -> click -> purchase" is a
# funnel; {view, click, purchase} is just a busy session).
# ---------------------------------------------------------------------------


def sequence_trigrams(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    min_count: int = 10,
) -> DataFrame:
    """(e1, e2, e3, n, support) for every consecutive event-type triple
    occurring >= ``min_count`` times; support = n / total triples,
    rounded to 6.

    Scale design: two lead() offsets over ONE user-partitioned window
    (single Exchange(user), one sort per partition — Catalyst fuses
    both leads into one WindowExec), then one type^3-bounded count
    aggregate + a 1-row total broadcast. The per-user total order is
    (ts, event_id) so ties are engine-deterministic.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    t = df.select(
        F.col(type_col).alias("e1"),
        F.lead(type_col, 1).over(w).alias("e2"),
        F.lead(type_col, 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    cnt = t.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.agg(F.sum("n").alias("total"))
    return (
        cnt.filter(F.col("n") >= min_count)
        .crossJoin(F.broadcast(tot))
        .select(
            "e1", "e2", "e3", "n",
            F.round(F.col("n") / F.col("total"), 6).alias("support"),
        )
    )


@query(
    "q_seq_trigrams",
    oracle=(
        "WITH t AS (SELECT event_type AS e1, "
        "lead(event_type, 1) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS e2, "
        "lead(event_type, 2) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS e3 FROM events), "
        "c AS (SELECT e1, e2, e3, count(*) AS n FROM t "
        "WHERE e3 IS NOT NULL GROUP BY 1, 2, 3), "
        "s AS (SELECT sum(n) AS total FROM c) "
        "SELECT e1, e2, e3, n, round(CAST(n AS DOUBLE) / total, 6) "
        "AS support FROM c CROSS JOIN s WHERE n >= 10"
    ),
    doc=(
        "Frequent consecutive event-type trigrams per user timeline "
        "(sequential patterns above q_event_transitions' pairs, ordered "
        "dual of q_assoc_rules): two lead() offsets fused in ONE "
        "user-partitioned window + a type^3-bounded count aggregate + "
        "1-row total broadcast."
    ),
    tags=("events", "window", "stats", "pipeline"),
)
def q_seq_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequence_trigrams(T(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Inter-arrival gap percentiles — p50/p95/p99 of the per-user gap
# preceding each event, by event type: the operational latency/cadence
# profile ("how long does a user dwell before purchasing?") that sets
# sessionization gaps and streaming watermark delays from DATA instead
# of folklore.
# ---------------------------------------------------------------------------


def interarrival_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_type, n_gaps, p50_s, p95_s, p99_s) — exact percentiles of
    the seconds elapsed since the user's previous event, attributed to
    the LATER event's type; rounded to 4.

    Scale design: one lag() over the user-partitioned (ts, id) window
    (single Exchange(user)), gaps kept as exact integer microseconds,
    then one type-bounded exact-percentile aggregate — the percentile
    state is per-type (the q_percentile trade at 100 TB: pre-bucket
    gaps to fixed precision to bound the sorted structure).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    g = df.select(
        F.col(type_col).alias("event_type"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    pct = F.percentile(F.col("gap_us"), F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(pct[0] / 1e6, 4).alias("p50_s"),
        F.round(pct[1] / 1e6, 4).alias("p95_s"),
        F.round(pct[2] / 1e6, 4).alias("p99_s"),
    )


@query(
    "q_interarrival",
    oracle=(
        "WITH g AS (SELECT event_type, epoch_us(ts) - lag(epoch_us(ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us "
        "FROM events), "
        "q AS (SELECT event_type, count(*) AS n_gaps, "
        "quantile_cont(gap_us, [0.5, 0.95, 0.99]) AS p FROM g "
        "WHERE gap_us IS NOT NULL GROUP BY 1) "
        "SELECT event_type, n_gaps, round(p[1] / 1e6, 4) AS p50_s, "
        "round(p[2] / 1e6, 4) AS p95_s, round(p[3] / 1e6, 4) AS p99_s "
        "FROM q"
    ),
    doc=(
        "Per-type inter-arrival percentiles (p50/p95/p99 seconds since "
        "the user's previous event): one user-partitioned lag window + "
        "one type-bounded exact-percentile aggregate on integer "
        "microseconds — the data-driven source for sessionization gaps "
        "and watermark delays."
    ),
    tags=("events", "window", "stats"),
)
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interarrival_stats(T(spark, sf_dir, "events"))
