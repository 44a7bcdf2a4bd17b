"""Canonical TPC-H query shapes on the driver fixtures.

The fixtures are TPC-H-ish (TESTDATA.md): they carry most canonical
columns but not all (no partsupp table, no l_shipmode/l_commitdate/
l_receiptdate/c_phone), so this pack implements the canonical queries
whose column footprint exists — adapted only where a missing column
forces it (noted per query). Shapes already covered elsewhere are not
duplicated (Q1 = q_group_agg, Q5 = q_join_q5, Q13 = q_join_outer).

Money arithmetic follows the repo-wide parity rule: sums run in
DECIMAL(18,2) (exact, order-independent), one round(2) + cast to double
at the output — identical expression trees on both engines
(SURVEY.md §7 oracle parity traps).

Scale notes: every query is fact-scan + broadcast dims + partial/final
hash agg; top-k outputs plan as TakeOrderedAndProject. The only
non-broadcast exchange in the pack is lineitem's spread() repartition
(single-row-group bench fixture) and the group-by shuffles, each keyed
on the canonical aggregation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libcolumnfile_spark.queries import T, query
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
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
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
    rev0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev().alias("total_rev_exact")
    )
    mx = rev0.agg(F.max("total_rev_exact").alias("mx"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev0.join(F.broadcast(mx), rev0.total_rev_exact == mx.mx)
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
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
        "quantity — the HAVING subquery aggregates the fact once into a "
        "small key set that semi-joins back (broadcast), then the outer "
        "aggregate runs only over qualifying orders."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _spread(T(spark, sf_dir, "lineitem"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(F.broadcast(o), F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
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
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(cond).agg(
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
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
        "of their part's average quantity — fact-side correlated scalar "
        "subquery, decorrelated to one per-partkey aggregate + join."
    ),
    tags=("tpch", "join", "agg", "subquery"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    _spread(T(spark, sf_dir, "lineitem")).createOrReplaceTempView("cf_li_q17")
    T(spark, sf_dir, "part").createOrReplaceTempView("cf_part_q17")
    return spark.sql(
        "SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly "
        "FROM cf_li_q17 JOIN cf_part_q17 ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#1' AND l_quantity < ("
        "SELECT 0.2 * avg(l2.l_quantity) FROM cf_li_q17 l2 "
        "WHERE l2.l_partkey = cf_li_q17.l_partkey)"
    )
