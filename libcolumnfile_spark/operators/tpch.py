"""Canonical TPC-H query shapes on the driver fixtures.

The fixtures are TPC-H-ish (TESTDATA.md): they carry most canonical
columns but not all (no partsupp table, no l_shipmode/l_commitdate/
l_receiptdate/c_phone). This pack covers ALL 22 canonical queries
under their canonical names (q_tpch_q1 .. q_tpch_q22; Q1/Q5/Q13 also
have reduced-shape siblings q_group_agg / q_join_q5 / q_join_outer
from round 1): queries whose column footprint exists run canonically;
the rest keep the canonical PLAN SHAPE with
documented stand-ins (partsupp -> DISTINCT lineitem part-supp pairs,
supply cost -> acctbal / retail-price fractions, commit/receipt-date
gaps -> ship-vs-order-date gaps, phone country code -> nationkey) —
noted per query.

Money arithmetic follows the repo-wide parity rule: sums run in
DECIMAL(18,2) (exact, order-independent), one round(2) + cast to double
at the output — identical expression trees on both engines
(SURVEY.md §7 oracle parity traps).

Scale notes: every query is fact-scan + size-chosen dim joins +
partial/final hash agg; top-k outputs plan as TakeOrderedAndProject.
Broadcast policy: forced hints ONLY on sides whose size is bounded by
construction — nation (25 rows), region (5), and one-row scalar
aggregates. Orders/customer/supplier/part and all derived qualifying
sets grow with SF, so their join strategy is left to the size-based
planner + AQE (a forced broadcast of filtered orders OOM'd the x100
probe — the probes exist to catch exactly that). At fixture scale the
stats-estimated sizes still pick broadcast, so plans are unchanged
where it matters; at 100 TB the same code degrades to shuffle joins
instead of flooding the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import T, pin, query
from libcolumnfile_spark.tables import maybe_broadcast as _mb
from libcolumnfile_spark.tables import spread as _spread

# decimal-exact revenue term (same tree as q_join_q5, matched since r1).
# Column expressions are built lazily: PySpark 4's F.col needs an active
# session, and this module imports at registry load time.
def _rev():
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount").cast("decimal(18,2)"))
    )


_REV_SQL = (
    "sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,2))))"
)


def _rev_out(alias: str = "revenue"):
    return F.round(_rev(), 2).cast("double").alias(alias)


def _rev_out_sql(alias: str = "revenue") -> str:
    return f"CAST(round({_REV_SQL}, 2) AS DOUBLE) AS {alias}"


@query(
    "q_tpch_q3",
    oracle=(
        "SELECT l_orderkey, "
        f"{_rev_out_sql()}, o_orderdate "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-03-15' "
        "AND l_shipdate > TIMESTAMP '1998-03-15' "
        "GROUP BY l_orderkey, o_orderdate "
        "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
    ),
    doc=(
        "TPC-H Q3 (shipping priority): unshipped high-value BUILDING "
        "orders — two broadcast dims into the fact scan, one group-by "
        "shuffle on orderkey, TakeOrderedAndProject top-10."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    li = _spread(T(spark, sf_dir, "lineitem")).filter(F.col("l_shipdate") > cutoff)
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(_mb(o), li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_rev_out())
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q6",
    oracle=(
        "SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    doc=(
        "TPC-H Q6 (forecast revenue change): pure filter + global "
        "aggregate — every predicate pushes to the scan; the agg is one "
        "partial/final pair with a single-row exchange."
    ),
    tags=("tpch", "filter", "agg"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_tpch_q7",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        "CAST(round(sum(volume), 2) AS DOUBLE) AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INT) AS l_year, "
        "CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') "
        "OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))"
        ") shipping GROUP BY supp_nation, cust_nation, l_year"
    ),
    doc=(
        "TPC-H Q7 (volume shipping): bidirectional two-nation trade by "
        "ship year — the nation pair predicate prunes via the broadcast "
        "dims before the fact rows are joined; year extraction is CAST "
        "to INT on both engines (DuckDB year() is BIGINT)."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(_mb(s), li.l_suppkey == s.s_suppkey)
        .join(_mb(o), li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_out())
    )


@query(
    "q_tpch_q10",
    oracle=(
        "SELECT c_custkey, c_name, "
        f"{_rev_out_sql()}, c_acctbal, n_name "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1997-10-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    doc=(
        "TPC-H Q10 (returned item reporting): lost revenue per customer "
        "for one quarter's returns — fact filter pushes returnflag + "
        "date, customer/nation broadcast, top-20 by revenue."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem")).filter(F.col("l_returnflag") == "R")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(_mb(o), li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_rev_out())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q14",
    # promo share: both DECIMAL sums are exact, the single double
    # division + round(2) is correctly rounded on both engines
    oracle=(
        "SELECT CAST(round(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO' "
        "THEN CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE) "
        "/ CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS DOUBLE) "
        "AS promo_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01' "
        "AND l_shipdate < TIMESTAMP '1997-10-01'"
    ),
    doc=(
        "TPC-H Q14 (promotion effect): PROMO revenue share for one "
        "month — broadcast part, conditional + total decimal sums in "
        "ONE aggregate pass. (Fixture p_type is a single word, so the "
        "canonical LIKE 'PROMO%' is equality here.)"
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    return (
        li.join(_mb(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(vol).cast("double"), 2
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q15",
    # the max-revenue comparison runs on the EXACT decimal totals (no
    # rounding before the equality), so the winner set is deterministic
    oracle=(
        "WITH revenue0 AS (SELECT l_suppkey AS supplier_no, "
        f"{_REV_SQL} AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, "
        "CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue "
        "FROM supplier JOIN revenue0 ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0) "
        "ORDER BY s_suppkey"
    ),
    doc=(
        "TPC-H Q15 (top supplier): quarter revenue per supplier, keep "
        "the max — the scalar-subquery max broadcasts back over the "
        "tiny per-supplier aggregate, not the fact table."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # persist the per-supplier aggregate (bounded by |supplier|): it
    # feeds both the max scalar and the winner join, and without the
    # pin each branch re-scans the fact (2 lineitem scans, plan-audited)
    rev0 = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev().alias("total_rev_exact"))
    )
    rev0 = pin(rev0)
    mx = rev0.agg(F.max("total_rev_exact").alias("mx"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev0.join(F.broadcast(mx), rev0.total_rev_exact == mx.mx)
        .join(_mb(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev_exact", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q18",
    # l_quantity is integral-valued double, so its sums are exact in
    # any order — no decimal cast needed
    oracle=(
        "SELECT c_name, c_custkey, o.o_orderkey, o_orderdate, o_totalprice, "
        "CAST(sum(l_quantity) AS DOUBLE) AS total_qty "
        "FROM customer JOIN orders o ON c_custkey = o_custkey "
        "JOIN lineitem ON o.o_orderkey = l_orderkey "
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING sum(l_quantity) > 300) "
        "GROUP BY c_name, c_custkey, o.o_orderkey, o_orderdate, o_totalprice "
        "ORDER BY o_totalprice DESC, o_orderdate, o.o_orderkey LIMIT 100"
    ),
    doc=(
        "TPC-H Q18 (large volume customers): orders above 300 total "
        "quantity — the outer per-order sum IS the HAVING aggregate, so "
        "one fact aggregate feeds both the filter and the output: one "
        "scan, one narrow shuffle, dims broadcast onto the small "
        "qualifying set."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the outer per-order sum IS the HAVING subquery's aggregate (the
    # outer group is one row per order): compute it once, filter >300,
    # and join the dims — one fact scan + one narrow shuffle, where the
    # literal SQL shape scans the fact twice and re-aggregates
    li = _spread(T(spark, sf_dir, "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        big.join(_mb(o), F.col("l_orderkey") == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("q").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q19",
    # Q19 shape minus the missing l_shipinstruct/l_shipmode legs: the
    # disjunction of brand x size x quantity windows is the point — the
    # whole OR-of-ANDs pushes below the broadcast join
    oracle=(
        f"SELECT {_rev_out_sql()} "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 "
        "AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 "
        "AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 20 AND 30)"
    ),
    doc=(
        "TPC-H Q19 (discounted revenue, disjunctive predicates): three "
        "brand/size/quantity windows OR-ed across the part join — "
        "exercises disjunction pushdown through a broadcast join."
    ),
    tags=("tpch", "join", "filter", "agg"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    p = T(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#13") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#23") & sz.between(1, 15) & q.between(20, 30))
    )
    return li.join(_mb(p), li.l_partkey == p.p_partkey).filter(cond).agg(
        _rev_out()
    )


@query(
    "q_tpch_q8",
    # share = CASE-sum / total-sum, both exact DECIMAL, ONE double
    # division + round(6); year() cast to INT on both engines
    oracle=(
        "SELECT o_year, CAST(round("
        "CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE) "
        "/ CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share FROM ("
        "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
        "CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume, "
        "n2.n_name AS nation "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'"
        ") all_nations GROUP BY o_year ORDER BY o_year"
    ),
    doc=(
        "TPC-H Q8 (national market share): one nation's share of a "
        "region's ECONOMY-part revenue per order year — seven-table "
        "join, every dim broadcast, share computed as conditional/total "
        "decimal sums in one aggregate."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(_mb(p), li.l_partkey == p.p_partkey)
        .join(_mb(s), li.l_suppkey == s.s_suppkey)
        .join(_mb(o), li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q17",
    # the correlated scalar avg runs over the FACT side (vs q_subquery's
    # dim-side correlation): Catalyst decorrelates to a per-partkey
    # aggregate joined back on the fact — avg of integral-valued
    # quantities is exact-sum / count, deterministic on both engines
    oracle=(
        "SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#1' AND l_quantity < ("
        "SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 "
        "WHERE l2.l_partkey = lineitem.l_partkey)"
    ),
    doc=(
        "TPC-H Q17 (small-quantity-order revenue): lineitems below 20% "
        "of their part's average quantity. Hand-decorrelated: partkey "
        "determines brand, so the correlated avg only matters for "
        "Brand#1 parts — the brand set semi-joins the fact down to ~4% "
        "of rows ONCE (persisted, 3 narrow columns), the per-partkey "
        "avg aggregates that subset, and the threshold joins back "
        "broadcast. Catalyst's own decorrelation of the SQL form scans "
        "the fact twice; this scans it once. avg(l_quantity) is exact "
        "on both engines (integral-valued doubles: ordered sums are "
        "identical, avg = exact sum / count)."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = (
        _spread(T(spark, sf_dir, "lineitem"))
        .join(_mb(p), F.col("l_partkey") == p.p_partkey, "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    li = pin(li)
    stats = li.groupBy(F.col("l_partkey").alias("sk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(_mb(stats), li.l_partkey == F.col("sk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Remaining canonical queries. The fixtures have no partsupp table and no
# l_commitdate/l_receiptdate/l_shipmode/c_phone columns, so these keep the
# canonical PLAN SHAPE (the point of the pack) with documented stand-ins:
#   partsupp           -> SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
#   ps_supplycost      -> 10% of p_retailprice per unit (deterministic)
#   commit/receipt gap -> l_shipdate vs o_orderdate + INTERVAL N DAYS
#   c_phone cntrycode  -> c_nationkey
# Each docstring notes its stand-ins.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q4",
    oracle=(
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    doc=(
        "TPC-H Q4 (order priority checking): orders in one quarter with at "
        "least one late line (late = shipped >30 days after order date; the "
        "fixture has no commit/receipt dates). A literal semi-join would "
        "build a hash table over the FACT side; instead the quarter-"
        "filtered orders (~3% of the dim) broadcast into one fact scan and "
        "EXISTS becomes distinct-orderkey — no shuffle touches lineitem."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _spread(T(spark, sf_dir, "lineitem")).select("l_orderkey", "l_shipdate")
    return (
        li.join(_mb(o), li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q9",
    # profit = revenue - supply cost, all-decimal until the final round;
    # supply cost proxied as 10% of p_retailprice per unit (no partsupp)
    oracle=(
        "SELECT nation, o_year, "
        "CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit FROM ("
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, "
        "CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2))) "
        "- CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(4,2)) "
        "* CAST(l_quantity AS DECIMAL(18,2)) AS amount "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%red%') profit "
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC"
    ),
    doc=(
        "TPC-H Q9 (product type profit): per supplier-nation per order-year "
        "profit on 'red' parts — part-name filter prunes via the broadcast "
        "part dim, profit stays DECIMAL-exact through the agg. Supply cost "
        "is proxied as 10% of retail price per unit (fixture has no "
        "partsupp); the join/agg shape is canonical."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    p = T(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.expr(
        "CAST(0.10 AS DECIMAL(4,2))"
    ) * F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.join(_mb(p), li.l_partkey == p.p_partkey)
        .join(_mb(s), li.l_suppkey == s.s_suppkey)
        .join(_mb(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q_tpch_q12",
    # line status stands in for the missing l_shipmode; "late" is the
    # ship-vs-order-date gap as in q4. Counts are BIGINT on both engines.
    oracle=(
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY "
        "AND l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    doc=(
        "TPC-H Q12 (shipping modes and priority): late lines in one year "
        "split into high/low-priority conditional counts per line status "
        "(stand-in for the missing l_shipmode). The year window pushes to "
        "the fact scan; the date-gap predicate rides the join."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(_mb(o), li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_tpch_q2",
    # the min() correlates over doubles but does NO arithmetic on them, so
    # cross-engine equality is exact
    oracle=(
        "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_name "
        "FROM part JOIN ps ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE p_size = 10 AND r_name = 'AMERICA' "
        "AND s_acctbal = (SELECT min(s2.s_acctbal) FROM ps ps2 "
        "JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey "
        "JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey "
        "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey "
        "WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'AMERICA') "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
    ),
    doc=(
        "TPC-H Q2 (minimum cost supplier): for size-10 parts, the AMERICA "
        "supplier with the minimum account balance among the part's "
        "suppliers (partsupp proxied by DISTINCT lineitem part-supp pairs; "
        "acctbal stands in for ps_supplycost). The correlated min only "
        "matters for size-10 parts, so that filter semi-joins below the "
        "pair-distinct (one fact scan over ~5% of rows); the min is a "
        "window over partkey — one shuffle, no recompute of the pair set."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    p = T(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    li = _spread(T(spark, sf_dir, "lineitem"))
    ps = (
        li.join(_mb(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    reg_pairs = (
        ps.join(_mb(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        reg_pairs.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(_mb(p), F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q11",
    # all-decimal value sums; the mean-relative threshold compares
    # val*cnt > total*2.5 entirely in DECIMAL — exact on both engines,
    # one rounded double at output
    oracle=(
        "WITH v AS (SELECT l_partkey, "
        "sum(CAST(l_quantity AS DECIMAL(18,2)) "
        "* CAST(l_extendedprice AS DECIMAL(18,2))) AS val "
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_3' GROUP BY l_partkey) "
        "SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS value "
        "FROM v WHERE val * (SELECT count(*) FROM v) "
        "> (SELECT sum(val) FROM v) * CAST(2.5 AS DECIMAL(2,1)) "
        "ORDER BY value DESC, l_partkey"
    ),
    doc=(
        "TPC-H Q11 (important stock identification): per-part shipped "
        "value from one nation's suppliers, keeping parts above 2.5x the "
        "mean per-part share (the canonical FRACTION scales as 0.0001/SF; "
        "a mean-relative threshold keeps one oracle valid at every SF; "
        "qty*price over lineitem stands in for availqty*supplycost over "
        "partsupp). The comparison runs as val*cnt > total*2.5 in DECIMAL "
        "— exact on both engines. The scalar-subquery totals reuse the "
        "SAME per-part aggregate and broadcast one row back."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    v = (
        li.join(_mb(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_quantity").cast("decimal(18,2)")
                * F.col("l_extendedprice").cast("decimal(18,2)")
            ).alias("val")
        )
        # persisted: feeds both the threshold scalar and the filter join;
        # bounded by |part| rows, and without the pin each branch
        # re-scans the fact (2 lineitem scans, plan-audited)
    )
    v = pin(v)
    total = v.agg(
        F.count("*").alias("n_parts"),
        (F.sum("val") * F.expr("CAST(2.5 AS DECIMAL(2,1))")).alias("threshold"),
    )
    return (
        v.join(F.broadcast(total), v.val * F.col("n_parts") > F.col("threshold"))
        .select("l_partkey", F.round("val", 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@query(
    "q_tpch_q16",
    oracle=(
        "WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
        "SELECT p_brand, p_type, p_size, "
        "count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM ps JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
        "AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35) "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
    doc=(
        "TPC-H Q16 (parts/supplier relationship): distinct supplier count "
        "per brand/type/size excluding negative-balance suppliers "
        "(stand-in for the complaints LIKE filter; partsupp proxied by "
        "DISTINCT lineitem pairs). The NOT IN plans as a broadcast "
        "anti-join; the part-attribute filter semi-joins BELOW the "
        "pair-distinct so the dedup shuffle only carries qualifying "
        "parts' rows; the distinct count is a two-phase partial/final agg."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = _spread(T(spark, sf_dir, "lineitem"))
    ps = (
        li.join(_mb(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        ps.join(_mb(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(_mb(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q20",
    # sums of integral-valued quantities are exact in any order
    oracle=(
        "SELECT s_name, s_acctbal FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_3' AND s_suppkey IN ("
        "SELECT l_suppkey FROM lineitem WHERE l_partkey IN ("
        "SELECT p_partkey FROM part WHERE p_name LIKE 'small%') "
        "AND l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_suppkey HAVING sum(l_quantity) > 100) "
        "ORDER BY s_name"
    ),
    doc=(
        "TPC-H Q20 (potential part promotion): one nation's suppliers who "
        "shipped >100 units of 'small' parts in 1997 (the availqty>half-"
        "of-shipped partsupp test becomes a shipped-quantity threshold). "
        "Nested IN chain: part-name set broadcasts into the fact scan as "
        "a semi-join, the per-supplier HAVING aggregate semi-joins into "
        "the supplier dim."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    small = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = _spread(T(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(_mb(small), li.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(_mb(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q21_BODY = (
    "SELECT s_name, count(*) AS numwait "
    "FROM {supplier} JOIN {lineitem} l1 ON s_suppkey = l1.l_suppkey "
    "JOIN {orders} o1 ON o1.o_orderkey = l1.l_orderkey "
    "JOIN {nation} ON s_nationkey = n_nationkey "
    "WHERE o1.o_orderstatus = 'F' AND n_name = 'NATION_3' "
    "AND l1.l_shipdate > o1.o_orderdate + INTERVAL 60 {day} "
    "AND EXISTS (SELECT 1 FROM {lineitem} l2 "
    "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM {lineitem} l3 "
    "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey "
    "AND l3.l_shipdate > o1.o_orderdate + INTERVAL 60 {day}) "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
)


@query(
    "q_tpch_q21",
    oracle=_Q21_BODY.format(
        supplier="supplier", lineitem="lineitem", orders="orders",
        nation="nation", day="DAY",
    ),
    doc=(
        "TPC-H Q21 (suppliers who kept orders waiting): one nation's "
        "suppliers whose line was the ONLY late one in a multi-supplier "
        "finished order (late = shipped >60 days after order date; the "
        "fixture has no commit/receipt dates). Catalyst would decorrelate "
        "the EXISTS / NOT EXISTS pair into three hash-join passes over the "
        "fact; this implementation decorrelates BY HAND into one "
        "aggregate plus one window — per (order, supplier) late-line "
        "counts, then per-order supplier/late-supplier counts windowed "
        "over the SAME aggregate (one lineage => exactly one fact scan, "
        "plan-audited) — shuffling twice on narrow key columns, with the "
        "only-late-supplier test a plain filter. "
        "Semantics proven equal to the EXISTS oracle: numwait sums "
        "late_cnt over orders with >1 supplier and exactly one of them "
        "late."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    from pyspark.sql.window import Window

    per_pair = (
        li.join(_mb(o), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("late_cnt"))
    )
    # per-order supplier/late-supplier counts as a WINDOW over the pair
    # aggregate (not a second groupBy branch): keeps one lineage — one
    # fact scan — where a dual-referenced aggregate would be recomputed
    # with different column pruning and scan the fact twice
    w = Window.partitionBy("l_orderkey")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        per_pair.withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_late_supp",
            F.sum(F.when(F.col("late_cnt") > 0, 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("late_cnt") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(_mb(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("late_cnt").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q_tpch_q22",
    # the above-average test runs as bal * n > total in DECIMAL — exact on
    # both engines (a double avg would differ in the last ulp by sum order)
    oracle=(
        "SELECT c_nationkey AS cntrycode, count(*) AS numcust, "
        "CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) "
        "AS totacctbal FROM customer "
        "WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6) "
        "AND CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT count(*) FROM customer c2 "
        "WHERE c2.c_acctbal > 0 AND c2.c_nationkey IN (0, 1, 2, 3, 4, 5, 6)) "
        "> (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c3 "
        "WHERE c3.c_acctbal > 0 AND c3.c_nationkey IN (0, 1, 2, 3, 4, 5, 6)) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '2000-01-01') "
        "GROUP BY cntrycode ORDER BY cntrycode"
    ),
    doc=(
        "TPC-H Q22 (global sales opportunity): above-average-balance "
        "customers in seven 'countries' (nationkey stands in for the "
        "missing phone country code) with no RECENT orders (every fixture "
        "customer has some order, so the canonical no-orders anti-join "
        "becomes no-orders-since-2000). The average test is computed as "
        "bal*n > total in DECIMAL so both engines compare exactly; the "
        "scalar pair broadcasts, the anti-join shuffles on custkey."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = [0, 1, 2, 3, 4, 5, 6]
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(codes))
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n_pos"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("total_pos"),
    )
    recent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(
            F.broadcast(stats),
            F.col("c_acctbal").cast("decimal(18,2)") * F.col("n_pos")
            > F.col("total_pos"),
        )
        .join(_mb(recent), c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q_tpch_q1",
    # every money sum in DECIMAL; averages as exact-sum / count with one
    # round at the output (a double avg would differ in the last ulp)
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l_discount AS DECIMAL(18,2))) "
        "* (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge, "
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty, "
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price, "
        "round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    ),
    doc=(
        "TPC-H Q1 (pricing summary report), full canonical column set "
        "including sum_charge and avg_price (q_group_agg carries the "
        "reduced set): ONE partial/final hash aggregate over the fact "
        "scan, 6 groups, shuffle volume O(groups x mappers)."
    ),
    tags=("tpch", "agg"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    cnt = F.count(F.lit(1))
    disc_price = dec("l_extendedprice") * (1 - dec("l_discount"))
    charge = disc_price * (1 + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(dec("l_quantity")).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double") / cnt, 4).alias("avg_price"),
            F.round(F.sum(dec("l_discount")).cast("double") / cnt, 6).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_tpch_q5",
    oracle=(
        "SELECT n_name, "
        f"{_rev_out_sql()} "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'AMERICA' "
        "AND o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY n_name ORDER BY revenue DESC"
    ),
    doc=(
        "TPC-H Q5 (local supplier volume), full canonical form with the "
        "order-year window (q_join_q5 is the windowless shape): the year "
        "filter prunes orders before the fact join, every dim broadcasts, "
        "the local-supplier condition (c_nationkey = s_nationkey) rides "
        "the supplier join."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    return (
        li.join(_mb(o), li.l_orderkey == o.o_orderkey)
        .join(_mb(c), o.o_custkey == c.c_custkey)
        .join(
            _mb(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev_out())
        .orderBy(F.desc("revenue"))
    )


@query(
    "q_tpch_q13",
    oracle=(
        "SELECT c_count, count(*) AS custdist FROM ("
        "SELECT c_custkey, count(o_orderkey) AS c_count "
        "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey) c_orders "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
    doc=(
        "TPC-H Q13 (customer distribution), canonical custdist histogram "
        "(the o_comment NOT-LIKE filter becomes a priority exclusion — "
        "the fixture has no comment column): left-outer join with the "
        "exclusion ON the join condition so no-order customers count 0, "
        "two stacked aggregates each O(customers)."
    ),
    tags=("tpch", "join", "agg"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
