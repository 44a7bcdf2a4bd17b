"""Statistical / ordered / conditional aggregates and scalar-function
breadth queries (SURVEY.md §2.2 "Aggregations" + "Scalar functions").

The reference has no aggregation surface at all (no agg code anywhere in
/root/reference/src or /root/reference/tools); these are
standard-engine capabilities supplied by stock Spark built-ins — every
one is a partial+final hash aggregate or a codegen'd projection, no
Python in the hot path.

Scale notes:
- All grouped aggregates here are algebraic or 2-pass-free sketchable
  (stddev/var/corr/covar decompose into sum/sum²/sum-of-products → pure
  map-side partials; the final shuffle carries O(groups) rows).
- Ordered string_agg collects per-group lists: bounded by group size
  (5 nations/region); at 100 TB this pattern is only safe for bounded
  groups, which is exactly what the query demonstrates (the unbounded
  alternative is vocab-style top-k, q_vocab_topk).
- exact median holds per-group sorted runs; at scale swap for
  approx_percentile (t-digest) — same note as q_percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from libcolumnfile_spark.queries import T, pin, query


@query(
    "q_stats_agg",
    oracle=(
        "SELECT l_returnflag, "
        "round(stddev_samp(l_quantity), 4) AS sd_qty, "
        "round(var_samp(l_quantity), 4) AS var_qty, "
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, "
        "round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc, "
        "CAST(round(median(l_quantity), 4) AS DOUBLE) AS med_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc=(
        "Statistical aggregates (stddev/variance/correlation/covariance/"
        "median). All but median are algebraic — they partial-aggregate "
        "map-side into (n, Σx, Σx², Σxy) and merge, so the shuffle is "
        "O(groups). Median is exact (sorted per-group run); the 100 TB "
        "variant is approx_percentile's mergeable t-digest."
    ),
    tags=("agg", "stats"),
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("cov_qty_disc"),
        F.round(F.median("l_quantity"), 4).cast("double").alias("med_qty"),
    )


@query(
    "q_minmax_by",
    # Deterministic tie-break via STRUCT ordering (price, then orderkey):
    # lexicographic struct comparison is exact at every scale factor —
    # unlike an epsilon-perturbed double, which stops being "far below
    # the price quantum" once orderkeys reach ~1e7 (ADVICE round 1).
    # Both engines order structs/rows lexicographically, so max_by picks
    # the true price extreme with the LARGEST orderkey on ties, min_by
    # the SMALLEST.
    oracle=(
        # DuckDB's max_by/min_by only order on scalar types, so the
        # oracle expresses the identical (price, orderkey) lexicographic
        # pick via order-qualified first() — same semantics, exact ints.
        "SELECT o_orderpriority, "
        "first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS top_order, "
        "first(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS bottom_order, "
        "round(max(o_totalprice), 2) AS max_price "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc=(
        "Ordered-argument aggregates max_by/min_by (a.k.a. arg_max/"
        "arg_min): which order carries each priority class's extreme "
        "price. Algebraic — partials carry one (value, arg) pair per "
        "group per partition."
    ),
    tags=("agg",),
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    rank_val = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", rank_val).alias("top_order"),
        F.min_by("o_orderkey", rank_val).alias("bottom_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "q_string_agg",
    oracle=(
        "SELECT n_regionkey, "
        "string_agg(n_name, ',' ORDER BY n_name) AS nations, "
        "CAST(count(*) AS INT) AS n_nations "
        "FROM nation GROUP BY n_regionkey"
    ),
    doc=(
        "Ordered string aggregation (listagg): per region, the sorted "
        "comma-joined nation list. Spark = array_join(array_sort("
        "collect_list(...))) — collect_list partials merge map-side; "
        "the sort is per-group post-merge. Safe only for bounded groups "
        "(unbounded text concat at 100 TB is an anti-pattern — use "
        "q_vocab_topk's explode+topk shape instead)."
    ),
    tags=("agg", "string"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = T(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).cast("int").alias("n_nations"),
    )


@query(
    "q_conditional_agg",
    oracle=(
        "SELECT o_orderpriority, "
        "CAST(count(*) FILTER (WHERE o_totalprice > 150000.0) AS BIGINT) AS n_big, "
        "CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished, "
        "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) "
        "  FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE) AS open_total "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc=(
        "Conditional aggregation (FILTER clause / count_if): one scan, "
        "many differently-predicated aggregates — the idiomatic "
        "replacement for N self-joins. Pure map-side conditionals "
        "folded into the partial agg."
    ),
    tags=("agg",),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O",
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            ),
            2,
        )
        .cast("double")
        .alias("open_total"),
    )


@query(
    "q_array_funcs",
    oracle=(
        "SELECT vec_id, "
        "CAST(len(embedding) AS INT) AS n_dims, "
        "round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm, "
        "round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val, "
        "CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos "
        "FROM embeddings WHERE vec_id < 200"
    ),
    doc=(
        "Array higher-order functions (transform/aggregate/filter/"
        "array_max) over the embedding column — the JVM-side vector-"
        "math path (no Python, stays in whole-stage codegen). The same "
        "expressions power q_sim_topk's cosine."
    ),
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
    )


@query(
    "q_regex_extract",
    oracle=(
        "SELECT doc_id, "
        "regexp_extract(text, '([0-9]+)', 1) AS first_number, "
        "regexp_replace(text, '[aeiou]', '', 'g') AS devoweled_prefix "
        "FROM documents WHERE doc_id < 100"
    ),
    doc=(
        "Regex scalar functions (extract group 1 / global replace) over "
        "document text. Codegen'd JVM regex — the same dialect subset "
        "([0-9], character classes) evaluates identically in DuckDB's "
        "RE2. No-match extract yields '' in both engines."
    ),
    tags=("scalar", "string", "text"),
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_number"),
        F.regexp_replace("text", "[aeiou]", "").alias("devoweled_prefix"),
    )


@query(
    "q_exists_subquery",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "  AND o.o_orderpriority = '1-URGENT') "
        "AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey "
        "  AND o2.o_totalprice > 400000.0)"
    ),
    doc=(
        "Correlated EXISTS / NOT EXISTS: Catalyst rewrites both to "
        "left-semi and left-anti joins (RewritePredicateSubquery) — no "
        "per-row subquery execution, two key-shuffled joins."
    ),
    tags=("subquery", "join", "optimizer"),
)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    T(spark, sf_dir, "customer").createOrReplaceTempView("cf_cust_ex")
    T(spark, sf_dir, "orders").createOrReplaceTempView("cf_ord_ex")
    return spark.sql(
        "SELECT c_custkey, c_name FROM cf_cust_ex c "
        "WHERE EXISTS (SELECT 1 FROM cf_ord_ex o WHERE o.o_custkey = c.c_custkey "
        "  AND o.o_orderpriority = '1-URGENT') "
        "AND NOT EXISTS (SELECT 1 FROM cf_ord_ex o2 WHERE o2.o_custkey = c.c_custkey "
        "  AND o2.o_totalprice > 400000.0)"
    )


@query(
    "q_window_first_last",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        "first_value(o_totalprice) OVER w AS first_price, "
        "last_value(o_totalprice) OVER "
        "  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price, "
        "nth_value(o_totalprice, 2) OVER w AS second_price "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    ),
    doc=(
        "Navigation window functions first_value/last_value/nth_value "
        "with explicit ROWS frames (the default frame would make "
        "last_value ≡ current row). Deterministic ordering via the "
        "(date, key) compound sort. One partitionBy shuffle serves all "
        "three functions — same window spec reuses the sorted run."
    ),
    tags=("window",),
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_cur = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w_cur).alias("first_price"),
        F.last("o_totalprice").over(w_all).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_cur).alias("second_price"),
    )


@query(
    "q_cross_join",
    oracle=(
        "SELECT r_name, n_name FROM region CROSS JOIN nation"
    ),
    doc=(
        "Explicit cartesian product (region × nation, 5×25). Spark "
        "plans BroadcastNestedLoopJoin when one side is small — the "
        "only safe cartesian shape at scale (dim × dim); fact × fact "
        "cross joins are rejected unless spark.sql.crossJoin.enabled."
    ),
    tags=("join",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = T(spark, sf_dir, "region").select("r_name")
    n = T(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@query(
    "q_date_arith",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(datediff('day', TIMESTAMP '1996-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch96, "
        "CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end, "
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date, "
        "CAST(year(o_orderdate) AS INT) AS yr, "
        "CAST(quarter(o_orderdate) AS INT) AS qtr "
        "FROM orders WHERE o_orderkey < 500"
    ),
    doc=(
        "Date/time arithmetic breadth (datediff, last_day, interval "
        "add, year/quarter extract) — the reference stores dates as "
        "opaque text (columnfile_test.cc:72-92); typed date math is "
        "engine-supplied. All codegen'd projections, no shuffle."
    ),
    tags=("scalar", "date"),
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1996-01-01").cast("timestamp")).alias(
            "days_since_epoch96"
        ),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 30).alias("due_date"),
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@query(
    "q_histogram",
    oracle=(
        "SELECT least(CAST(floor(l_extendedprice / 5000.0) AS BIGINT), 19) AS bucket, "
        "count(*) AS n, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total "
        "FROM lineitem GROUP BY bucket ORDER BY bucket"
    ),
    doc=(
        "Fixed-width histogram (20 buckets of 5000, top bucket clamped): "
        "arithmetic binning instead of width_bucket so the bucket edge "
        "arithmetic is the identical double division on both engines. "
        "Map-side bucket + partial/final count-sum — shuffle volume is "
        "O(buckets), the cheapest possible distribution profile."
    ),
    tags=("agg", "histogram"),
)
def q_histogram(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint"), F.lit(19).cast("bigint")
    )
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (frequency estimation)
#
# Beyond-reference pipeline operator: single-pass bounded-memory token
# frequency estimation — the standard sketch for "how often does this
# n-gram / URL / token appear in a 100 TB corpus" when an exact groupBy
# over the full vocabulary is unwanted (e.g. as a pre-filter feeding a
# later exact pass, or when the sketch itself ships downstream).
# Cormode & Muthukrishnan, "An improved data stream summary: the
# count-min sketch and its applications", J. Algorithms 55(1), 2005.
#
# Distribution profile: building the sketch is ONE scan — each element
# maps to `depth` (row, bucket) cells via explode, and the groupBy
# count is partial-aggregated map-side, so the shuffle carries at most
# depth x width groups (the sketch size), never O(rows). Estimation
# joins items against the depth*width-row sketch (broadcast-sized by
# construction) and takes the per-item min over its depth cells.
#
# Hash family: md5-derived (the repo's engine-portable family, exactly
# the md5_gram_hash construction from operators/dedup.py) so a DuckDB
# oracle reproduces every cell and estimate bit-for-bit. A production
# deployment at 100 TB swaps hash_expr for xxhash64 (JVM-side, no md5
# cost) — the estimate guarantees are family-independent.
# ---------------------------------------------------------------------------


def _cms_cell(col, i: int, width: int):
    """Bucket of ``col`` in sketch row ``i``: md5-derived 60-bit hash of
    the salted value, mod width. Deterministic across engines."""
    h = F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{i}"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def count_min_sketch(
    items: DataFrame,
    col: str = "item",
    depth: int = 3,
    width: int = 128,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with up to depth*width rows.

    One scan over ``items``: explode each element to its ``depth``
    cells, then a partial+final count — shuffle bounded by the sketch
    dimensions. Absent cells are zero by convention.

    ``weight_col``: build from a pre-aggregated (item, weight) table —
    sum(weight) per cell is exactly count per cell of the un-aggregated
    stream (integer sum, associative), so a caller that already holds
    item counts never re-feeds the raw stream (q_sketch_freq builds from
    its vocabulary-bounded word counts instead of a second corpus pass).
    """
    cells = items.select(
        *( [F.col(weight_col).alias("__w")] if weight_col else [] ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_cell(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    )
    agg = F.sum("__w") if weight_col else F.count(F.lit(1))
    return cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")).agg(
        agg.alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, queries_df: DataFrame, col: str = "item",
    depth: int = 3, width: int = 128,
) -> DataFrame:
    """Point-query the sketch: est(x) = min over rows of cell(row, h_row(x)).

    The sketch side is depth*width rows — broadcast by construction;
    the join is map-side against the item stream. Guarantee: est >=
    true count always; est <= true + eps*N with prob 1-delta for
    width=ceil(e/eps), depth=ceil(ln 1/delta).
    """
    probes = queries_df.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_cell(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPK = 3, 128, 20


def _sketch_freq_oracle(depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH, k: int = _CMS_TOPK) -> str:
    cell = (
        "CAST(('0x' || substr(md5({v} || '#{i}'), 1, 15)) AS BIGINT) % " + str(width)
    )
    # cells must sketch the IDENTICAL token stream the Spark side feeds
    # count_min_sketch (q_sketch_freq filters tok != ''): trim() strips
    # only spaces in both engines, so text starting with a tab/newline
    # yields an empty token — unfiltered here it would inflate oracle
    # cells but not Spark's, diverging cms_est on any colliding bucket
    cells_union = " UNION ALL ".join(
        f"SELECT {i} AS row, " + cell.format(v="tok", i=i) + " AS bucket, "
        "count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY 2"
        for i in range(depth)
    )
    est_branches = " UNION ALL ".join(
        f"SELECT t.tok, c.cnt FROM top t JOIN cells c ON c.row = {i} "
        "AND c.bucket = " + cell.format(v="t.tok", i=i)
        for i in range(depth)
    )
    return (
        "WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok "
        "  FROM documents WHERE length(trim(text)) > 0), "
        "cnt AS (SELECT tok, count(*) AS exact_n FROM toks WHERE tok <> '' GROUP BY tok), "
        f"cells AS ({cells_union}), "
        f"top AS (SELECT tok, exact_n FROM cnt ORDER BY exact_n DESC, tok LIMIT {k}), "
        f"ests AS ({est_branches}) "
        "SELECT t.tok AS token, t.exact_n, min(e.cnt) AS cms_est "
        "FROM top t JOIN ests e ON e.tok = t.tok "
        "GROUP BY t.tok, t.exact_n"
    )


@query(
    "q_sketch_freq",
    oracle=_sketch_freq_oracle(),
    doc=(
        "Count-min sketch frequency estimation (Cormode-Muthukrishnan "
        "2005): single-pass depth=3 x width=128 sketch over the document "
        "token stream, point-queried for the exact top-20 tokens — "
        "output (token, exact_n, cms_est) makes the one-sided error "
        "visible (cms_est >= exact_n always). md5-derived hash family "
        "(dedup.py md5_gram_hash construction) so the DuckDB oracle "
        "reproduces every cell; production swaps in xxhash64. Scale: "
        "sketch build is one scan with a depth*width-bounded shuffle; "
        "estimation broadcasts the sketch."
    ),
    tags=("agg", "sketch", "llm-pipeline"),
)
def q_sketch_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    # ONE tokenize+explode pass: aggregate to vocabulary-bounded word
    # counts first, then derive BOTH the exact top-k and the sketch from
    # that table (sum of per-word counts per cell == count of tokens per
    # cell, integer-exact). The old shape ran the corpus scan+explode
    # twice — once per consumer — because caching the corpus-sized token
    # stream itself measured slower (0.78 s vs 1.24 s pinned at sf0.1);
    # the word-count table is the cheap-to-pin proxy (vocab-bounded at
    # any corpus size), and the sketch's partial aggregate now runs over
    # vocab rows instead of the full token stream.
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    wc = pin(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n")))
    sketch = count_min_sketch(wc, "tok", _CMS_DEPTH, _CMS_WIDTH, weight_col="exact_n")
    top = (
        wc.orderBy(F.col("exact_n").desc(), F.col("tok"))
        .limit(_CMS_TOPK)
    )
    est = cms_estimate(sketch, top.select("tok"), "tok", _CMS_DEPTH, _CMS_WIDTH)
    return top.join(est, "tok").select(
        F.col("tok").alias("token"), "exact_n", F.col("cms_est")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval: uncertainty quantification for
# a corpus-scale mean in ONE pass. Classical bootstrap (sample n rows
# with replacement, B times) is sequential; the Poisson approximation
# (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
# Google 2012) gives each row an independent Poisson(1) multiplicity
# per replicate, which distributes perfectly. Multiplicities here are
# DETERMINISTIC — inverse-CDF lookup on the engine-portable md5 ppm
# bucket of (row key, replicate index) — so Spark, DuckDB, and any
# future engine draw the SAME resamples forever, making the whole
# estimator oracle-checkable (the q_sample_hash reproducibility bar).
# ---------------------------------------------------------------------------

# floor(1e6 * P(Poisson(1) <= k)) for k = 0..7; u >= all => weight 8.
# The tail beyond 8 is P < 1.1e-8 — one ppm grain can't express it.
_POISSON1_CUM_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989)


def _poisson1_weight(u: Column) -> Column:
    w = F.lit(len(_POISSON1_CUM_PPM))
    for k in reversed(range(len(_POISSON1_CUM_PPM))):
        w = F.when(u < _POISSON1_CUM_PPM[k], F.lit(k)).otherwise(w)
    return w


def bootstrap_ci_mean(
    df: DataFrame,
    val_col: str,
    id_col: str,
    n_boot: int = 32,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """(n_boot, boot_mean, lo95, hi95): mean of ``val_col`` across
    ``n_boot`` deterministic Poisson-bootstrap replicates, with the
    (``lo``, ``hi``) percentile interval over the replicate means.

    Scale design: ONE scan, zero row fan-out — all B replicates ride as
    2B aggregate columns (sum of w*x and sum of w per replicate), each
    algebraic, so map-side partial aggregation collapses every task to
    one 2B-double row before the single 1-row exchange. The
    explode-by-replicate formulation (the SQL oracle's shape) multiplies
    the row stream B-fold; at 100 TB that is B extra scans' worth of
    exchange for the same 64 numbers. Percentiles run over B driver-side
    rows — bounded by construction.
    """
    key = F.col(id_col).cast("string")
    aggs = []
    # one md5 yields 32 hex chars = FOUR 8-hex ppm buckets: replicate b
    # reads lanes b%4 of digest b//4 — 8 digests/row instead of 32 (the
    # md5 is the per-row cost; measured 3.5 s -> 1.3 s at sf0.1)
    for g in range((n_boot + 3) // 4):
        digest = F.md5(F.concat(key, F.lit(f":{g}")))
        for j in range(min(4, n_boot - 4 * g)):
            b = 4 * g + j
            u = (
                F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("bigint")
                % 1_000_000
            )
            w = _poisson1_weight(u)
            aggs.append(F.sum(w * F.col(val_col)).alias(f"wx{b}"))
            aggs.append(F.sum(w).alias(f"w{b}"))
    row = df.agg(*aggs)
    means = row.select(
        F.explode(
            F.array(*[F.col(f"wx{b}") / F.col(f"w{b}") for b in range(n_boot)])
        ).alias("m")
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_boot"),
        F.round(F.avg("m"), 4).alias("boot_mean"),
        F.round(F.percentile(F.col("m"), F.lit(float(lo))), 4).alias("ci_lo"),
        F.round(F.percentile(F.col("m"), F.lit(float(hi))), 4).alias("ci_hi"),
    )


def _bootstrap_oracle(n_boot: int = 32) -> str:
    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POISSON1_CUM_PPM)
    )
    # same digest-lane scheme as bootstrap_ci_mean: replicate b = lane
    # b%4 (8 hex chars) of md5(key || ':' || b//4)
    u_sql = (
        "('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || ':' "
        "|| CAST(b // 4 AS VARCHAR)), 1 + 8 * (b % 4), 8))::BIGINT % 1000000"
    )
    return (
        f"WITH r AS (SELECT o_totalprice, b, {u_sql} AS u "
        f"FROM orders CROSS JOIN generate_series(0, {n_boot - 1}) t(b)), "
        f"w AS (SELECT b, o_totalprice, CASE {cases} ELSE 8 END AS wt FROM r), "
        "m AS (SELECT b, sum(wt * o_totalprice) / sum(wt) AS m FROM w "
        "GROUP BY b) "
        "SELECT count(*) AS n_boot, round(avg(m), 4) AS boot_mean, "
        "round(quantile_cont(m, 0.025), 4) AS ci_lo, "
        "round(quantile_cont(m, 0.975), 4) AS ci_hi FROM m"
    )


@query(
    "q_bootstrap_ci",
    oracle=_bootstrap_oracle(),
    doc=(
        "Deterministic Poisson-bootstrap 95% CI for mean(o_totalprice): "
        "32 replicates as 64 algebraic aggregate columns in ONE scan "
        "(no row fan-out — the oracle's explode-by-replicate shape "
        "costs B extra scans of exchange at scale); md5-ppm inverse-CDF "
        "Poisson(1) multiplicities make every resample engine-portable "
        "and reproducible."
    ),
    tags=("agg", "stats"),
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from libcolumnfile_spark.tables import spread

    # fine-sliced scan: the 8-md5-per-row replicate weighting is the
    # dominant map cost and orders' coarse layout plans ~5 scan tasks —
    # CPU-dense per-row work wants the full core count (guide §2.6/§6)
    o = spread(T(spark, sf_dir, "orders"))
    return bootstrap_ci_mean(o, "o_totalprice", "o_orderkey")


# ---------------------------------------------------------------------------
# Welch's t-test: the unequal-variance two-sample location test — the
# decision operator behind every A/B readout and every "did this
# pipeline change move the metric?" check. Pure algebraic aggregates
# (counts, means, sample variances), so it partial-aggregates map-side
# and the exchange is one row regardless of corpus size.
# ---------------------------------------------------------------------------


def welch_ttest(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One-row Welch t-test of ``val_col`` between two groups:
    (n_a, n_b, mean_a, mean_b, t_stat, df) with the Welch-Satterthwaite
    degrees of freedom. Floats rounded to 4 (the q_stats_agg precedent:
    var_samp's partial-merge fold order differs across engines in the
    last ulps).

    Scale design: six algebraic aggregates over one scan — conditional
    count/avg/var_samp per group — collapsed map-side; the t and df
    arithmetic is a 1-row projection. No shuffle carries data rows.
    """
    a = F.when(F.col(group_col) == group_a, F.col(val_col))
    b = F.when(F.col(group_col) == group_b, F.col(val_col))
    s = df.agg(
        F.count(a).alias("n_a"),
        F.count(b).alias("n_b"),
        F.avg(a).alias("mean_a"),
        F.avg(b).alias("mean_b"),
        F.var_samp(a).alias("var_a"),
        F.var_samp(b).alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    se2 = sa + sb
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)
    )
    return s.select(
        "n_a",
        "n_b",
        F.round("mean_a", 4).alias("mean_a"),
        F.round("mean_b", 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(dof, 4).alias("df"),
    )


@query(
    "q_ttest_welch",
    oracle=(
        "WITH s AS (SELECT "
        "count(*) FILTER (event_type = 'click') AS n_a, "
        "count(*) FILTER (event_type = 'view') AS n_b, "
        "avg(value) FILTER (event_type = 'click') AS mean_a, "
        "avg(value) FILTER (event_type = 'view') AS mean_b, "
        "var_samp(value) FILTER (event_type = 'click') AS var_a, "
        "var_samp(value) FILTER (event_type = 'view') AS var_b "
        "FROM events) "
        "SELECT n_a, n_b, round(mean_a, 4) AS mean_a, "
        "round(mean_b, 4) AS mean_b, "
        "round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 4) "
        "AS t_stat, "
        "round(pow(var_a / n_a + var_b / n_b, 2) / "
        "(pow(var_a / n_a, 2) / (n_a - 1) "
        "+ pow(var_b / n_b, 2) / (n_b - 1)), 4) AS df "
        "FROM s"
    ),
    doc=(
        "Welch's unequal-variance t-test of events.value between the "
        "click and view populations: six algebraic aggregates over one "
        "scan (map-side partials, 1-row exchange), Welch-Satterthwaite "
        "degrees of freedom in a 1-row projection."
    ),
    tags=("agg", "stats"),
)
def q_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return welch_ttest(T(spark, sf_dir, "events"), "event_type", "value", "click", "view")


# ---------------------------------------------------------------------------
# Mann-Whitney U: the nonparametric twin of q_ttest_welch — rank-based
# two-sample location test, robust to the heavy-tailed metric
# distributions real telemetry has. Computed WITHOUT ranking rows:
# U counts pairs (a > b) + half-ties, which collapses onto the DISTINCT-
# value table — one value-keyed count aggregate, then a running sum over
# distinct values only.
# ---------------------------------------------------------------------------


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One-row Mann-Whitney U of ``val_col`` between two groups:
    (n_a, n_b, u_stat, z) — U for group a with the normal approximation
    z including the tie correction. Rounded to 4 (the q_stats_agg
    precedent).

    Scale design: the pair count U = sum_v cnt_a(v) * (cum_b(<v) +
    cnt_b(v)/2) needs only per-DISTINCT-VALUE counts: one value-keyed
    aggregate (map-side partials over data rows), then one running-sum
    window over the distinct-value table. That window is a single
    sorted run — bounded by VALUE CARDINALITY, not row count (the
    q_percentile trade: exact stats hold a sorted structure; for
    continuous metrics at 100 TB, pre-bucket values to fixed precision
    to bound the cardinality, which perturbs U by at most the bucket
    width). No row-pair join anywhere: the naive formulation is
    O(n_a * n_b).
    """
    both = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(group_col).alias("g"), F.col(val_col).alias("v")
    )
    vt = both.groupBy("v").agg(
        F.count_if(F.col("g") == group_a).alias("ca"),
        F.count_if(F.col("g") == group_b).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    per_v = vt.select(
        "ca",
        "cb",
        (F.coalesce(F.sum("cb").over(w), F.lit(0))).alias("cum_b"),
        ((F.col("ca") + F.col("cb")) ** 3 - (F.col("ca") + F.col("cb"))).alias(
            "tie3"
        ),
    )
    s = per_v.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (F.col("cum_b") + F.col("cb") / F.lit(2.0))
        ).alias("u"),
        F.sum("tie3").alias("ties"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    mu = na * nb / F.lit(2.0)
    var = (na * nb / F.lit(12.0)) * (
        (n + 1) - F.col("ties") / (n * (n - 1))
    )
    return s.select(
        "n_a",
        "n_b",
        F.round("u", 4).alias("u_stat"),
        F.round((F.col("u") - mu) / F.sqrt(var), 4).alias("z"),
    )


@query(
    "q_mannwhitney",
    oracle=(
        "WITH b AS (SELECT event_type AS g, value AS v FROM events "
        "WHERE event_type IN ('click', 'view')), "
        "vt AS (SELECT v, count(*) FILTER (g = 'click') AS ca, "
        "count(*) FILTER (g = 'view') AS cb FROM b GROUP BY v), "
        "pv AS (SELECT ca, cb, "
        "coalesce(sum(cb) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_b, "
        "pow(ca + cb, 3) - (ca + cb) AS tie3 FROM vt), "
        "s AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, "
        "CAST(sum(cb) AS BIGINT) AS n_b, "
        "sum(ca * (cum_b + cb / 2.0)) AS u, sum(tie3) AS ties FROM pv) "
        "SELECT n_a, n_b, round(u, 4) AS u_stat, "
        "round((u - n_a * n_b / 2.0) / "
        "sqrt((n_a * n_b / 12.0) * ((n_a + n_b + 1) "
        "- ties / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 4) AS z "
        "FROM s"
    ),
    doc=(
        "Mann-Whitney U (rank-sum) test of events.value between the "
        "click and view populations, tie-corrected normal z — computed "
        "pair-free on the distinct-value count table: one value-keyed "
        "aggregate + one cardinality-bounded running-sum window."
    ),
    tags=("agg", "stats"),
)
def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mann_whitney_u(T(spark, sf_dir, "events"), "event_type", "value", "click", "view")


# ---------------------------------------------------------------------------
# Chi-square test of independence between two categorical columns — the
# "is language confounded with source?" diagnostic a mixing pipeline
# runs before treating per-source weights and per-language weights as
# separable knobs. All tables in play are category-cardinality-bounded.
# ---------------------------------------------------------------------------


def chi2_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row chi-square independence test: (n, dof, chi2) over the
    ``col_a`` x ``col_b`` contingency table.

    Scale design: ONE (a, b)-keyed count aggregate over the data (map-
    side partials; the exchange is contingency-sized), marginals and the
    grand total DERIVED from the contingency counts (never a second
    corpus pass). The chi2 sum runs over the FULL ka x kb marginal grid
    (a cross join of two bounded tables), not just observed cells —
    absent combinations contribute their whole expected count, and
    dropping them understates chi2 exactly when association is
    strongest.
    """
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    ra = cells.groupBy("a").agg(F.sum("o").alias("ta"))
    rb = cells.groupBy("b").agg(F.sum("o").alias("tb"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("a").alias("ka"),
        F.countDistinct("b").alias("kb"),
    )
    grid = ra.crossJoin(F.broadcast(rb))
    e = (
        grid.join(F.broadcast(cells), ["a", "b"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "ka",
            "kb",
            (
                (F.col("o") - F.col("ta") * F.col("tb") / F.col("n")) ** 2
                / (F.col("ta") * F.col("tb") / F.col("n"))
            ).alias("term"),
        )
    )
    return e.groupBy("n", "ka", "kb").agg(
        F.round(F.sum("term"), 4).alias("chi2")
    ).select(
        "n",
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("bigint").alias("dof"),
        "chi2",
    )


@query(
    "q_chi2_indep",
    oracle=(
        "WITH c AS (SELECT lang AS a, source AS b, count(*) AS o "
        "FROM documents GROUP BY 1, 2), "
        "ra AS (SELECT a, sum(o) AS ta FROM c GROUP BY a), "
        "rb AS (SELECT b, sum(o) AS tb FROM c GROUP BY b), "
        "t AS (SELECT CAST(sum(o) AS BIGINT) AS n, "
        "count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM c), "
        "g AS (SELECT a, ta, b, tb, "
        "coalesce(c.o, 0) AS o FROM ra CROSS JOIN rb "
        "LEFT JOIN c USING (a, b)) "
        "SELECT n, CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof, "
        "round(sum(pow(o - ta * tb / n, 2) / (ta * tb / n)), 4) AS chi2 "
        "FROM g CROSS JOIN t GROUP BY n, ka, kb"
    ),
    doc=(
        "Chi-square independence test of documents.lang vs source: one "
        "contingency-keyed count aggregate, marginals derived from the "
        "cell counts (no second corpus pass), bounded broadcast joins."
    ),
    tags=("agg", "stats", "pipeline"),
)
def q_chi2_indep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chi2_independence(T(spark, sf_dir, "documents"), "lang", "source")


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample test: the DISTRIBUTIONAL test next to
# the location tests (Welch, Mann-Whitney) — detects shape/spread/tail
# changes a mean test misses ("did the new crawl change the length
# distribution, not just its mean?"). Same pair-free machinery as
# mann_whitney_u: everything reduces to the distinct-value count table.
# ---------------------------------------------------------------------------


def ks_test(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One-row two-sample KS test: (n_a, n_b, ks_d, ks_stat) where
    ks_d = sup |ECDF_a - ECDF_b| and ks_stat = ks_d * sqrt(n_a*n_b/n).

    Scale design: one value-keyed count aggregate (map-side partials
    over data rows), one running-sum window over the DISTINCT-value
    table (the q_mannwhitney shape — bounded by value cardinality, not
    rows), and the supremum as an INTEGER max of
    |cum_a * n_b - cum_b * n_a| — exact integer arithmetic until the
    final division, so the supremum row is engine-exact, no float
    tie ambiguity.
    """
    both = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(group_col).alias("g"), F.col(val_col).alias("v")
    )
    vt = both.groupBy("v").agg(
        F.count_if(F.col("g") == group_a).alias("ca"),
        F.count_if(F.col("g") == group_b).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()  # totals ride the same sorted run
    per_v = vt.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wt).alias("ta"),
        F.sum("cb").over(wt).alias("tb"),
    )
    s = per_v.agg(
        F.max("ta").alias("n_a"),
        F.max("tb").alias("n_b"),
        F.max(
            F.abs(F.col("cum_a") * F.col("tb") - F.col("cum_b") * F.col("ta"))
        ).alias("num"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    d = F.col("num") / (na * nb)
    return s.select(
        "n_a",
        "n_b",
        F.round(d, 6).alias("ks_d"),
        F.round(d * F.sqrt(na * nb / (na + nb)), 4).alias("ks_stat"),
    )


@query(
    "q_ks_test",
    oracle=(
        "WITH b AS (SELECT event_type AS g, value AS v FROM events "
        "WHERE event_type IN ('click', 'view')), "
        "vt AS (SELECT v, count(*) FILTER (g = 'click') AS ca, "
        "count(*) FILTER (g = 'view') AS cb FROM b GROUP BY v), "
        "pv AS (SELECT ca, cb, "
        "sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS cum_a, "
        "sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS cum_b, "
        "sum(ca) OVER () AS ta, sum(cb) OVER () AS tb FROM vt), "
        "s AS (SELECT CAST(max(ta) AS BIGINT) AS n_a, "
        "CAST(max(tb) AS BIGINT) AS n_b, "
        "CAST(max(abs(cum_a * tb - cum_b * ta)) AS BIGINT) AS num FROM pv) "
        "SELECT n_a, n_b, "
        "round(num / (CAST(n_a AS DOUBLE) * n_b), 6) AS ks_d, "
        "round((num / (CAST(n_a AS DOUBLE) * n_b)) "
        "* sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 4) AS ks_stat "
        "FROM s"
    ),
    doc=(
        "Two-sample Kolmogorov-Smirnov test of events.value between the "
        "click and view populations — ECDF supremum as an exact integer "
        "max over the distinct-value count table (the q_mannwhitney "
        "pair-free shape); detects distribution-shape drift a mean test "
        "misses."
    ),
    tags=("agg", "stats"),
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_test(T(spark, sf_dir, "events"), "event_type", "value", "click", "view")


# ---------------------------------------------------------------------------
# Equi-depth histogram: percentile-boundary buckets with per-bucket
# stats — the distribution summary that stays informative under skew,
# where the fixed-width q_histogram collapses into two hot buckets.
# Also exactly the boundary computation a range-partitioner or a
# liquid-clustering layout job runs before writing.
# ---------------------------------------------------------------------------


def equidepth_histogram(
    df: DataFrame, val_col: str, n_buckets: int = 10
) -> DataFrame:
    """(bucket, n, lo, hi): ~equal-count buckets split at the exact
    interior percentiles of ``val_col``. Boundary ties go to the lower
    bucket (bucket = #cuts strictly below the value).

    Scale design: ONE exact-percentile aggregate produces all interior
    cuts as a 1-row array broadcast (the q_perplexity_split pattern);
    bucket assignment is a map-side array scan (n_buckets is small);
    the final aggregate exchanges n_buckets rows. Exact percentile
    holds a sorted structure — at 100 TB swap for approx_percentile's
    mergeable t-digest (the q_percentile note); the operator shape is
    unchanged.
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        F.percentile(F.col(val_col), F.lit(fracs)).alias("__cuts")
    )
    j = df.select(F.col(val_col).alias("__v")).crossJoin(F.broadcast(cuts))
    bucket = F.size(
        F.filter(F.col("__cuts"), lambda c: F.col("__v") > c)
    ).cast("int")
    return (
        j.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("__v"), 4).alias("lo"),
            F.round(F.max("__v"), 4).alias("hi"),
        )
    )


@query(
    "q_equidepth_hist",
    oracle=(
        "WITH c AS (SELECT quantile_cont(o_totalprice, "
        "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts "
        "FROM orders) "
        "SELECT CAST(len(list_filter(cuts, x -> o_totalprice > x)) AS INT) "
        "AS bucket, count(*) AS n, round(min(o_totalprice), 4) AS lo, "
        "round(max(o_totalprice), 4) AS hi "
        "FROM orders CROSS JOIN c GROUP BY 1"
    ),
    doc=(
        "Equi-depth 10-bucket histogram of o_totalprice: one exact-"
        "percentile aggregate broadcasts all interior cuts, bucket "
        "assignment is a map-side array scan, final exchange is "
        "n_buckets rows — the skew-robust dual of the fixed-width "
        "q_histogram and the boundary step of a range partitioner."
    ),
    tags=("agg", "stats", "layout"),
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return equidepth_histogram(T(spark, sf_dir, "orders"), "o_totalprice")


# ---------------------------------------------------------------------------
# Pearson correlation matrix over a set of numeric columns — the feature-
# redundancy profile a dataset card publishes and a feature-selection
# pass reads first ("extendedprice is 99% quantity x part price; drop
# one"). One algebraic aggregate carries every sum the whole matrix
# needs; the pair explosion happens on the single result row.
# ---------------------------------------------------------------------------


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_a, col_b, r) for every unordered column pair, Pearson r
    rounded to 4.

    Scale design: ONE algebraic aggregate computes n, per-column sums /
    sums-of-squares, and per-pair cross sums with map-side combine — the
    exchange is a single row of k + k + C(k,2) doubles regardless of
    corpus size. Correlations are derived arithmetic on that row, and
    the (col_a, col_b) unpivot explodes C(k,2) structs AFTER
    aggregation. The naive k^2 passes (one df.stat.corr per pair) scan
    the corpus C(k,2) times for the same answer.
    """
    # aliases are POSITIONAL (s_0, q_0, p_0_1): name-derived aliases like
    # p_{a}_{b} collide for underscore-bearing column names (p_x_y_z is
    # both (x, y_z) and (x_y, z)). Sums and cross-sums run in
    # decimal(18,2) — exact, partial-aggregation-order-independent on
    # both engines (the winsorize_stats discipline) — and cast to
    # double only for the final r derivation, so a correlation near a
    # 4th-decimal rounding boundary cannot flip the hash between
    # engines/runs.
    dec = {c: F.col(c).cast("decimal(18,2)") for c in cols}
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(dec[c]).cast("double").alias(f"s_{i}"))
        aggs.append(F.sum(dec[c] * dec[c]).cast("double").alias(f"q_{i}"))
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    for i, j in pairs:
        aggs.append(
            F.sum(dec[cols[i]] * dec[cols[j]])
            .cast("double")
            .alias(f"p_{i}_{j}")
        )
    s = df.agg(*aggs)
    n = F.col("n")
    structs = []
    for i, j in pairs:
        num = n * F.col(f"p_{i}_{j}") - F.col(f"s_{i}") * F.col(f"s_{j}")
        den = F.sqrt(
            (n * F.col(f"q_{i}") - F.col(f"s_{i}") * F.col(f"s_{i}"))
            * (n * F.col(f"q_{j}") - F.col(f"s_{j}") * F.col(f"s_{j}"))
        )
        structs.append(
            F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                F.round(num / den, 4).alias("r"),
            )
        )
    return s.select(F.explode(F.array(*structs)).alias("x")).select("x.*")


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_oracle() -> str:
    sums = ["count(*)::DOUBLE AS n"]
    for i, c in enumerate(_CORR_COLS):
        sums.append(f"sum(CAST({c} AS DECIMAL(18,2)))::DOUBLE AS s_{i}")
        sums.append(
            f"sum(CAST({c} AS DECIMAL(18,2)) * CAST({c} AS DECIMAL(18,2)))"
            f"::DOUBLE AS q_{i}"
        )
    pairs = [
        (i, j)
        for i in range(len(_CORR_COLS))
        for j in range(i + 1, len(_CORR_COLS))
    ]
    for i, j in pairs:
        sums.append(
            f"sum(CAST({_CORR_COLS[i]} AS DECIMAL(18,2)) * "
            f"CAST({_CORR_COLS[j]} AS DECIMAL(18,2)))::DOUBLE AS p_{i}_{j}"
        )
    rows = []
    for i, j in pairs:
        rows.append(
            f"SELECT '{_CORR_COLS[i]}' AS col_a, '{_CORR_COLS[j]}' AS col_b, "
            f"round((n * p_{i}_{j} - s_{i} * s_{j}) / "
            f"sqrt((n * q_{i} - s_{i} * s_{i}) * (n * q_{j} - s_{j} * s_{j})), 4) "
            "AS r FROM s"
        )
    return f"WITH s AS (SELECT {', '.join(sums)} FROM lineitem) " + " UNION ALL ".join(rows)


@query(
    "q_corr_matrix",
    oracle=_corr_matrix_oracle(),
    doc=(
        "Pearson correlation matrix of the four lineitem numeric "
        "columns from ONE algebraic aggregate (n + k sums + k sums-of-"
        "squares + C(k,2) cross sums in a single 1-row exchange); the "
        "pair unpivot explodes after aggregation. Both engines derive r "
        "from the identical sum arithmetic; round(4) absorbs partial-"
        "aggregation order (the q_decay_score tolerance argument)."
    ),
    tags=("agg", "stats"),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corr_matrix(T(spark, sf_dir, "lineitem"), _CORR_COLS)


# ---------------------------------------------------------------------------
# Spearman rank correlation — the monotone-association measure that
# survives outliers and nonlinearity (quality scores vs doc length is
# monotone but nothing like linear). Built pair-free on the two
# distinct-value count tables: average ranks are derived from counts,
# never from a row-level global sort.
# ---------------------------------------------------------------------------


def _avg_ranks(df: DataFrame, col: str) -> DataFrame:
    """(v, r) average-rank table for one column: tie-averaged rank =
    (#values below) + (count + 1) / 2, computed from the distinct-value
    count table with one cardinality-bounded running-sum window."""
    vt = df.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    return vt.select(
        "v",
        (
            F.coalesce(F.sum("c").over(w), F.lit(0))
            + (F.col("c") + 1) / F.lit(2.0)
        ).alias("r"),
    )


def spearman_rho(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """One row (n, rho): Spearman rank correlation of two numeric
    columns with tie-averaged ranks (= Pearson r over the rank pairs).

    Scale design: per-column distinct-value count aggregates (map-side
    partials), ONE cardinality-bounded window each for the average
    ranks (the q_mannwhitney shape), two value-keyed joins to carry the
    ranks back onto rows (shuffle_hash-pinned: a rank table is
    vocabulary-sized, not construction-bounded), then one algebraic
    1-row aggregate. No row-level global sort anywhere — the naive
    rank() over the full corpus is a single-reducer total order.
    Average ranks are exact multiples of 0.5, so the rank sums are
    order-independent until far past this fixture scale.
    """
    rx = _avg_ranks(df, col_x)
    ry = _avg_ranks(df, col_y)
    ranked = (
        df.select(F.col(col_x).alias("vx"), F.col(col_y).alias("vy"))
        .join(rx.withColumnRenamed("v", "vx").withColumnRenamed("r", "rx").hint("shuffle_hash"), "vx")
        .join(ry.withColumnRenamed("v", "vy").withColumnRenamed("r", "ry").hint("shuffle_hash"), "vy")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("qx"),
        F.sum(F.col("ry") * F.col("ry")).alias("qy"),
        F.sum(F.col("rx") * F.col("ry")).alias("p"),
    )
    n = F.col("n")
    num = n * F.col("p") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("qx") - F.col("sx") * F.col("sx"))
        * (n * F.col("qy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        n.cast("bigint").alias("n"), F.round(num / den, 4).alias("rho")
    )


@query(
    "q_spearman",
    oracle=(
        "WITH vx AS (SELECT l_quantity AS v, count(*) AS c FROM lineitem "
        "GROUP BY 1), "
        "rx AS (SELECT v, coalesce(sum(c) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "+ (c + 1) / 2.0 AS r FROM vx), "
        "vy AS (SELECT l_extendedprice AS v, count(*) AS c FROM lineitem "
        "GROUP BY 1), "
        "ry AS (SELECT v, coalesce(sum(c) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "+ (c + 1) / 2.0 AS r FROM vy), "
        "j AS (SELECT rx.r AS rxv, ry.r AS ryv FROM lineitem "
        "JOIN rx ON lineitem.l_quantity = rx.v "
        "JOIN ry ON lineitem.l_extendedprice = ry.v), "
        "s AS (SELECT count(*)::DOUBLE AS n, sum(rxv) AS sx, sum(ryv) AS sy, "
        "sum(rxv * rxv) AS qx, sum(ryv * ryv) AS qy, sum(rxv * ryv) AS p "
        "FROM j) "
        "SELECT CAST(n AS BIGINT) AS n, "
        "round((n * p - sx * sy) / "
        "sqrt((n * qx - sx * sx) * (n * qy - sy * sy)), 4) AS rho FROM s"
    ),
    doc=(
        "Spearman rank correlation of l_quantity vs l_extendedprice: "
        "tie-averaged ranks derived pair-free from the distinct-value "
        "count tables (cardinality-bounded windows), joined back by "
        "value (shuffle_hash), then one algebraic 1-row aggregate — no "
        "row-level global sort."
    ),
    tags=("agg", "stats"),
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spearman_rho(T(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# Benford first-digit conformance — the classic synthetic-data /
# fabrication smell test: organically-grown monetary amounts follow
# log10(1 + 1/d); generated or truncated data usually doesn't. Output
# is the 9-row digit table with observed share, expected share, and the
# per-digit chi-square contribution.
# ---------------------------------------------------------------------------


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """(digit, n_obs, obs_pct, exp_pct, chi2_term) for digits 1-9 of
    ``col`` (values >= 1; zero-count digits included).

    Scale design: the first digit is extracted with exact integer/string
    arithmetic — substring of the floor-cast bigint — never floor(log10)
    float probing (DuckDB CAST rounds where Spark truncates, so the
    floor() is load-bearing for parity). One 9-group count aggregate is
    the only exchange; the all-digits frame and the total ride 1-row /
    9-row broadcasts.
    """
    spark = df.sparkSession
    obs = (
        df.filter(F.col(col) >= 1)
        .select(
            F.substring(
                F.floor(F.col(col)).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    full = (
        digits.join(F.broadcast(obs), "digit", "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return full.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / F.col("n"), 6).alias("obs_pct"),
        F.round(exp_p, 6).alias("exp_pct"),
        F.round(
            (F.col("n_obs") - F.col("n") * exp_p) ** 2 / (F.col("n") * exp_p),
            4,
        ).alias("chi2_term"),
    ).orderBy("digit")


@query(
    "q_benford",
    oracle=(
        "WITH o AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) "
        "AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS n_obs "
        "FROM orders WHERE o_totalprice >= 1 GROUP BY 1), "
        "t AS (SELECT sum(n_obs) AS n FROM o), "
        "g AS (SELECT d.digit, coalesce(o.n_obs, 0) AS n_obs "
        "FROM (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit) d "
        "LEFT JOIN o USING (digit)) "
        "SELECT digit, CAST(n_obs AS BIGINT) AS n_obs, "
        "round(n_obs / CAST(n AS DOUBLE), 6) AS obs_pct, "
        "round(log10(1.0 + 1.0 / digit), 6) AS exp_pct, "
        "round(pow(n_obs - n * log10(1.0 + 1.0 / digit), 2) "
        "/ (n * log10(1.0 + 1.0 / digit)), 4) AS chi2_term "
        "FROM g CROSS JOIN t ORDER BY digit"
    ),
    doc=(
        "Benford first-digit conformance of o_totalprice: exact integer "
        "first-digit extraction (floor-cast + substring — no float log "
        "probing), one 9-group count exchange, expected shares and "
        "chi-square contributions derived per digit including "
        "zero-count digits."
    ),
    tags=("agg", "stats", "pipeline"),
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_digits(T(spark, sf_dir, "orders"), "o_totalprice")


# ---------------------------------------------------------------------------
# Winsorization — the FIX next to q_outlier_iqr's report: clip a numeric
# column at exact percentile fences and publish the robust mean. The
# standard pre-normalization step before any scale-sensitive model
# feature. The winsorized sum decomposes exactly (middle values exact
# DECIMAL + clip_count x fence), so the output carries no float-sum
# rounding class at all.
# ---------------------------------------------------------------------------


def winsorize_stats(
    df: DataFrame, col: str, lo_q: float = 0.05, hi_q: float = 0.95
) -> DataFrame:
    """One row: (n, n_low, n_high, lo, hi, mean_raw, mean_winsorized)
    for ``col`` clipped at the exact [lo_q, hi_q] percentile fences.

    Scale design: ONE exact-percentile aggregate broadcasts both fences
    (the q_equidepth_hist recipe — no global sort), then ONE algebraic
    aggregate computes every output: the middle-mass sum as EXACT
    DECIMAL(18,2), the clipped counts, and the winsorized sum derived
    as middle + n_low*lo + n_high*hi — pure arithmetic on engine-
    identical doubles, so nothing here needs round() (the q_rfm_segments
    money-rounding lesson).
    """
    fences = df.agg(
        F.percentile(col, F.array(F.lit(lo_q), F.lit(hi_q))).alias("f")
    ).select(F.col("f")[0].alias("lo"), F.col("f")[1].alias("hi"))
    v = F.col(col)
    s = df.crossJoin(F.broadcast(fences)).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(v < F.col("lo")).alias("n_low"),
        F.count_if(v > F.col("hi")).alias("n_high"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.sum(v.cast("decimal(18,2)")).alias("sum_raw"),
        F.sum(
            F.when((v >= F.col("lo")) & (v <= F.col("hi")), v.cast("decimal(18,2)"))
        ).alias("sum_mid"),
    )
    wsum = (
        F.col("sum_mid").cast("double")
        + F.col("n_low") * F.col("lo")
        + F.col("n_high") * F.col("hi")
    )
    return s.select(
        "n",
        "n_low",
        "n_high",
        "lo",
        "hi",
        (F.col("sum_raw").cast("double") / F.col("n")).alias("mean_raw"),
        (wsum / F.col("n")).alias("mean_winsorized"),
    )


@query(
    "q_winsorize",
    oracle=(
        "WITH f AS (SELECT quantile_cont(o_totalprice, [0.05, 0.95]) AS q "
        "FROM orders), "
        "g AS (SELECT q[1] AS lo, q[2] AS hi FROM f), "
        "s AS (SELECT count(*) AS n, "
        "count(*) FILTER (o_totalprice < lo) AS n_low, "
        "count(*) FILTER (o_totalprice > hi) AS n_high, "
        "max(lo) AS lo, max(hi) AS hi, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_raw, "
        "sum(CAST(o_totalprice AS DECIMAL(18,2))) "
        "FILTER (o_totalprice >= lo AND o_totalprice <= hi) AS sum_mid "
        "FROM orders CROSS JOIN g) "
        "SELECT CAST(n AS BIGINT) AS n, CAST(n_low AS BIGINT) AS n_low, "
        "CAST(n_high AS BIGINT) AS n_high, lo, hi, "
        "CAST(sum_raw AS DOUBLE) / n AS mean_raw, "
        "(CAST(sum_mid AS DOUBLE) + n_low * lo + n_high * hi) / n "
        "AS mean_winsorized FROM s"
    ),
    doc=(
        "Winsorized robust mean of o_totalprice at exact [p5, p95] "
        "fences: one percentile broadcast + ONE algebraic aggregate; "
        "the winsorized sum decomposes exactly (DECIMAL middle mass + "
        "count x fence), so no round() appears anywhere in the money "
        "path."
    ),
    tags=("agg", "stats", "pipeline"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorize_stats(T(spark, sf_dir, "orders"), "o_totalprice")


# ---------------------------------------------------------------------------
# ROC-AUC of a score against a binary label — the classifier-eval
# primitive every quality-filter pipeline runs before trusting a score
# as a gate ("does events.value actually separate purchases from the
# rest?"). AUC is the pair-win probability, so the naive form is an
# O(P*N) pair join; the rank identity AUC = U / (P*N) computes it
# pair-free on the distinct-value count table (the q_mannwhitney
# machinery, reframed as the eval metric with tie handling).
# ---------------------------------------------------------------------------


def auc_roc(
    df: DataFrame, score_col: str, pos_pred
) -> DataFrame:
    """One-row ROC-AUC of ``score_col`` for the positive class defined
    by the boolean column expression ``pos_pred``: (n_pos, n_neg, auc,
    gini) — ties counted half (the trapezoidal/Mann-Whitney AUC),
    gini = 2*auc - 1.

    Scale design: ONE score-keyed count aggregate over the data rows
    (map-side partials), then one running-sum window over the DISTINCT-
    score table — bounded by score cardinality, not row count (for
    continuous scores at 100 TB, pre-bucket to fixed precision, which
    perturbs AUC by at most one bucket of rank mass). The U sum and the
    final division are derived arithmetic on that bounded table; no
    pos x neg pair join anywhere.
    """
    vt = df.select(
        F.col(score_col).alias("v"),
        pos_pred.cast("int").alias("is_pos"),
    ).groupBy("v").agg(
        F.count_if(F.col("is_pos") == 1).alias("cp"),
        F.count_if(F.col("is_pos") == 0).alias("cn"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    per_v = vt.select(
        "cp",
        "cn",
        F.coalesce(F.sum("cn").over(w), F.lit(0)).alias("cum_n"),
    )
    s = per_v.agg(
        F.sum("cp").alias("n_pos"),
        F.sum("cn").alias("n_neg"),
        F.sum(F.col("cp") * (F.col("cum_n") + F.col("cn") / F.lit(2.0))).alias("u"),
    )
    auc = F.col("u") / (F.col("n_pos") * F.col("n_neg"))
    return s.select(
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini"),
    )


@query(
    "q_auc_roc",
    oracle=(
        "WITH vt AS (SELECT value AS v, "
        "count(*) FILTER (event_type = 'purchase') AS cp, "
        "count(*) FILTER (event_type <> 'purchase') AS cn "
        "FROM events GROUP BY v), "
        "pv AS (SELECT cp, cn, coalesce(sum(cn) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_n "
        "FROM vt), "
        "s AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos, "
        "CAST(sum(cn) AS BIGINT) AS n_neg, "
        "sum(cp * (cum_n + cn / 2.0)) AS u FROM pv) "
        "SELECT n_pos, n_neg, round(u / (n_pos * n_neg), 6) AS auc, "
        "round(2.0 * u / (n_pos * n_neg) - 1.0, 6) AS gini FROM s"
    ),
    doc=(
        "ROC-AUC (+ gini) of events.value as a purchase classifier, "
        "computed pair-free via the rank identity AUC = U/(P*N) on the "
        "distinct-score count table: one score-keyed aggregate + one "
        "cardinality-bounded running-sum window — never the O(P*N) "
        "pair join."
    ),
    tags=("agg", "stats", "eval"),
)
def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return auc_roc(ev, "value", F.col("event_type") == "purchase")


# ---------------------------------------------------------------------------
# Per-group OLS trend — slope / intercept / R^2 of a daily count series
# per event type, via the closed-form sum decomposition. The "is this
# source growing or dying?" monitor a corpus-ingest dashboard runs, and
# the one regression every analytics engine ships (DuckDB regr_slope,
# Spark regr_* in 3.4+) — implemented here on the sum identities so the
# arithmetic is engine-identical and the exchange stays bounded.
# ---------------------------------------------------------------------------


def trend_ols(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    epoch_date: str = "2024-01-01",
) -> DataFrame:
    """(group, n_days, slope, intercept, r2) per group: OLS of daily
    event count against day index (days since ``epoch_date``).

    Scale design: ONE (group, day)-keyed count aggregate over the data
    (map-side partials; exchange bounded by groups x days), then ONE
    group-keyed algebraic aggregate of the five OLS sums (sx, sy, sxx,
    sxy, syy) — all integer-valued, so every engine computes them
    EXACTLY regardless of partial-aggregation order; doubles appear
    only in the final slope/intercept/r2 derivation on the k-row
    result. Degenerate groups (single day: zero x-variance) emit NULL
    slope/r2 rather than a division blowup.
    """
    daily = (
        df.select(
            F.col(group_col).alias("grp"),
            F.datediff(F.to_date(ts_col), F.to_date(F.lit(epoch_date))).alias("x"),
        )
        .groupBy("grp", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(vx > 0, cov / vx)
    return s.select(
        "grp",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(
            F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy)), 6
        ).alias("r2"),
    )


@query(
    "q_trend_ols",
    oracle=(
        "WITH daily AS (SELECT event_type AS grp, "
        "date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x, "
        "count(*) AS y FROM events GROUP BY 1, 2), "
        "s AS (SELECT grp, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy, "
        "sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy "
        "FROM daily GROUP BY grp) "
        "SELECT grp, n_days, "
        "round(CASE WHEN n_days * sxx - sx * sx > 0 THEN "
        "(n_days * sxy - CAST(sx AS DOUBLE) * sy) / (n_days * sxx - sx * sx) "
        "END, 6) AS slope, "
        "round((sy - (CASE WHEN n_days * sxx - sx * sx > 0 THEN "
        "(n_days * sxy - CAST(sx AS DOUBLE) * sy) / (n_days * sxx - sx * sx) "
        "END) * sx) / n_days, 6) AS intercept, "
        "round(CASE WHEN n_days * sxx - sx * sx > 0 "
        "AND n_days * syy - sy * sy > 0 THEN "
        "(n_days * sxy - CAST(sx AS DOUBLE) * sy) "
        "* (n_days * sxy - CAST(sx AS DOUBLE) * sy) "
        "/ ((n_days * sxx - sx * sx) * CAST(n_days * syy - sy * sy AS DOUBLE)) "
        "END, 6) AS r2 FROM s"
    ),
    doc=(
        "Per-event-type OLS trend (slope/intercept/R^2) of the daily "
        "count series via the closed-form sum identities: one "
        "(type, day) count exchange + one type-keyed algebraic "
        "aggregate of integer OLS sums (exact under any partial-agg "
        "order); doubles only in the final k-row derivation."
    ),
    tags=("agg", "stats", "window"),
)
def q_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trend_ols(T(spark, sf_dir, "events"), "event_type", "ts")




# ---------------------------------------------------------------------------
# Kaplan-Meier time-to-conversion — the survival curve of "hours from a
# user's first event to their first purchase", right-censoring users
# who never convert at the end of the observation log. The product-
# limit estimator is a cumulative product over event times, which at
# engine scale is exp(running-sum(ln)) over the DISTINCT-duration
# table — never a per-user scan.
# ---------------------------------------------------------------------------


def kaplan_meier_conversion(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    convert_pred,
) -> DataFrame:
    """(t_hours, n_risk, d_events, surv) per distinct time-to-convert
    with observed conversions: the Kaplan-Meier product-limit estimate
    S(t), rounded to 6. t = whole hours from a subject's first event to
    its first event satisfying ``convert_pred``; subjects that never
    convert are right-censored at the global log horizon.

    Scale design: ONE subject-keyed aggregate (min ts, min converting
    ts — conditional min, no second pass), one 1-row horizon broadcast,
    then one duration-keyed count aggregate — every KM window after
    that runs on the DISTINCT-DURATION table, bounded by the
    observation window in hours, not subject count. The cumulative
    product is exp(running-sum(ln(1 - d/n))); a step that exhausts the
    risk set is carried through a running-max flag so survival pins to
    exactly 0.0 without ln(0) (Spark F.log returns NULL at 0, DuckDB
    -inf — the flag sidesteps both).
    """
    per = df.groupBy(id_col).agg(
        F.min(ts_col).alias("first_ts"),
        F.min(F.when(convert_pred, F.col(ts_col))).alias("conv_ts"),
    )
    horizon = df.agg(F.max(ts_col).alias("max_ts"))
    # exact epoch-microsecond arithmetic (bigint on both engines; the
    # relational._epoch_us idiom — NTZ must go through a timestamp cast)
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    end_us = _us(F.coalesce(F.col("conv_ts"), F.col("max_ts")))
    dt = end_us - _us(F.col("first_ts"))
    hour_us = F.lit(3_600_000_000)
    # exact bigint floor-division (a double quotient can truncate one
    # ulp under the true integer at exact-multiple boundaries)
    t = ((dt - dt % hour_us) / hour_us).cast("bigint")
    u = per.crossJoin(F.broadcast(horizon)).select(
        t.alias("t"),
        F.col("conv_ts").isNotNull().cast("int").alias("obs"),
    )
    vt = u.groupBy("t").agg(
        F.count_if(F.col("obs") == 1).alias("d"),
        F.count_if(F.col("obs") == 0).alias("c"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    at_risk = F.sum(F.col("d") + F.col("c")).over(w_all) - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
    )
    pv = vt.select("t", "d", at_risk.alias("n_risk"))
    lt = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(F.lit(1.0) - F.col("d") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    exhausted = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    surv = F.when(exhausted == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(lt).over(w_cum))
    )
    return (
        pv.select(
            F.col("t").alias("t_hours"),
            "n_risk",
            F.col("d").alias("d_events"),
            F.round(surv, 6).alias("surv"),
        )
        .filter(F.col("d_events") > 0)
    )


@query(
    "q_survival_km",
    oracle=(
        "WITH pu AS (SELECT user_id, min(ts) AS f, "
        "min(ts) FILTER (event_type = 'purchase') AS cv "
        "FROM events GROUP BY 1), "
        "mx AS (SELECT max(ts) AS m FROM events), "
        "u AS (SELECT CAST((epoch_us(coalesce(cv, m)) - epoch_us(f)) "
        "// 3600000000 AS BIGINT) AS t, "
        "CASE WHEN cv IS NOT NULL THEN 1 ELSE 0 END "
        "AS obs FROM pu CROSS JOIN mx), "
        "vt AS (SELECT t, count(*) FILTER (obs = 1) AS d, "
        "count(*) FILTER (obs = 0) AS c FROM u GROUP BY t), "
        "pv AS (SELECT t, d, sum(d + c) OVER () - coalesce(sum(d + c) "
        "OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
        "PRECEDING), 0) AS n_risk FROM vt), "
        "kv AS (SELECT t, d, n_risk, "
        "sum(CASE WHEN d > 0 AND d < n_risk THEN "
        "ln(1.0 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END) "
        "OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
        "ROW) AS cum_log, "
        "max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) "
        "OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
        "ROW) AS exhausted FROM pv) "
        "SELECT t AS t_hours, CAST(n_risk AS BIGINT) AS n_risk, "
        "CAST(d AS BIGINT) AS d_events, "
        "round(CASE WHEN exhausted = 1 THEN 0.0 ELSE exp(cum_log) END, 6) "
        "AS surv FROM kv WHERE d > 0"
    ),
    doc=(
        "Kaplan-Meier time-to-conversion curve (hours from first event "
        "to first purchase, never-converters right-censored at the log "
        "horizon): one subject-keyed conditional-min aggregate + a "
        "1-row horizon broadcast, then every KM window runs on the "
        "distinct-duration table (observation-window-bounded); the "
        "product-limit estimate is exp(running-sum(ln)) with an "
        "exhausted-risk-set flag instead of ln(0)."
    ),
    tags=("agg", "stats", "window", "pipeline"),
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kaplan_meier_conversion(
        T(spark, sf_dir, "events"),
        "user_id",
        "ts",
        F.col("event_type") == "purchase",
    )


# ---------------------------------------------------------------------------
# EWMA one-step forecast — exponentially weighted moving average of the
# daily volume series per event type, with the next-day forecast and
# the last-observation residual. The recursive EWMA S_t = a*y_t +
# (1-a)*S_{t-1} unrolls to a CLOSED-FORM weighted sum, so the
# "sequential" smoother is one rank window + one weighted aggregate
# over the day-bounded series — never a driver-side loop.
# ---------------------------------------------------------------------------


def ewma_forecast(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """(grp, n_days, last_y, ewma, resid) per group: the recursive
    EWMA of the daily count series unrolled as the exact weighted sum
    S_T = sum_t w_t * y_t with w_t = a*(1-a)^(T-t) for t > 1 and
    w_1 = (1-a)^(T-1) (the S_1 = y_1 convention), rounded to 6.
    ``ewma`` is the one-step-ahead forecast; ``resid`` = last_y - ewma
    of the PRIOR days (forecast error on the most recent observation).

    Scale design: one (group, day) count exchange, a group-partitioned
    rank window over the DAY-BOUNDED series, then one group-keyed
    weighted aggregate — weights are derived arithmetic from the rank,
    so the sequential recursion costs exactly one pass. Identical
    pow() expression trees on both engines.
    """
    from pyspark.sql.window import Window

    daily = (
        df.select(
            F.col(group_col).alias("grp"), F.to_date(ts_col).alias("d")
        )
        .groupBy("grp", "d")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("grp").orderBy("d")
    wa = Window.partitionBy("grp")
    r = daily.select(
        "grp",
        "y",
        F.row_number().over(w).alias("t"),
        F.count(F.lit(1)).over(wa).alias("tt"),
    )
    a = F.lit(float(alpha))
    weight = F.when(
        F.col("t") == 1, F.pow(1.0 - a, F.col("tt") - 1)
    ).otherwise(a * F.pow(1.0 - a, F.col("tt") - F.col("t")))
    # prior-EWMA weights (series without the last day) for the residual
    w_prior = F.when(F.col("t") == F.col("tt"), F.lit(0.0)).otherwise(
        F.when(F.col("t") == 1, F.pow(1.0 - a, F.col("tt") - 2)).otherwise(
            a * F.pow(1.0 - a, F.col("tt") - 1 - F.col("t"))
        )
    )
    s = r.groupBy("grp").agg(
        F.max("tt").alias("n_days"),
        F.sum(weight * F.col("y")).alias("ewma_raw"),
        F.sum(w_prior * F.col("y")).alias("prior_raw"),
        F.max(F.when(F.col("t") == F.col("tt"), F.col("y"))).alias("last_y"),
    )
    return s.select(
        "grp",
        "n_days",
        "last_y",
        F.round("ewma_raw", 6).alias("ewma"),
        F.round(F.col("last_y") - F.col("prior_raw"), 6).alias("resid"),
    )


@query(
    "q_ewma_forecast",
    oracle=(
        "WITH daily AS (SELECT event_type AS grp, CAST(ts AS DATE) AS d, "
        "count(*) AS y FROM events GROUP BY 1, 2), "
        "r AS (SELECT grp, y, "
        "row_number() OVER (PARTITION BY grp ORDER BY d) AS t, "
        "count(*) OVER (PARTITION BY grp) AS tt FROM daily), "
        "s AS (SELECT grp, max(tt) AS n_days, "
        "sum((CASE WHEN t = 1 THEN pow(1.0 - 0.3, tt - 1) "
        "ELSE 0.3 * pow(1.0 - 0.3, tt - t) END) * y) AS ewma_raw, "
        "sum((CASE WHEN t = tt THEN 0.0 "
        "WHEN t = 1 THEN pow(1.0 - 0.3, tt - 2) "
        "ELSE 0.3 * pow(1.0 - 0.3, tt - 1 - t) END) * y) AS prior_raw, "
        "max(CASE WHEN t = tt THEN y END) AS last_y FROM r GROUP BY grp) "
        "SELECT grp, CAST(n_days AS BIGINT) AS n_days, "
        "CAST(last_y AS BIGINT) AS last_y, round(ewma_raw, 6) AS ewma, "
        "round(last_y - prior_raw, 6) AS resid FROM s"
    ),
    doc=(
        "EWMA one-step volume forecast per event type (alpha=0.3): the "
        "sequential smoother unrolled to its closed-form weighted sum — "
        "one (group, day) count exchange, a day-bounded rank window, "
        "one weighted aggregate; residual vs the prior-days forecast "
        "comes from the same pass."
    ),
    tags=("agg", "stats", "window"),
)
def q_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ewma_forecast(T(spark, sf_dir, "events"), "event_type", "ts")


# ---------------------------------------------------------------------------
# Two-proportion z-test — the A/B readout for CONVERSION RATES, closing
# the test family triad: Welch t (means), Mann-Whitney U (ranks), this
# (proportions). Cohorts come from the engine-portable md5 user split
# (the q_sample_hash convention), so assignment is deterministic on
# both engines.
# ---------------------------------------------------------------------------


def two_proportion_ztest(
    df: DataFrame,
    id_col: str,
    success_pred,
    unit_pred,
) -> DataFrame:
    """One-row two-proportion z-test between the md5-even and md5-odd
    cohorts of ``id_col``: (n_a, x_a, n_b, x_b, p_a, p_b, z) — trial
    counts, success counts, rates (rounded 6), and the pooled-variance
    z statistic. ``unit_pred`` selects trial rows, ``success_pred``
    successes among them.

    Scale design: ONE conditional algebraic aggregate (six count_if
    columns, map-side combine, 1-row exchange) — counts stay exact
    integers until the final z derivation. The cohort split is a
    map-side md5 parity, no shuffle.
    """
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(2),
    )
    t = df.filter(unit_pred).select(
        b.alias("cohort"), success_pred.cast("int").alias("s")
    )
    agg = t.agg(
        F.count_if(F.col("cohort") == 0).alias("n_a"),
        F.count_if((F.col("cohort") == 0) & (F.col("s") == 1)).alias("x_a"),
        F.count_if(F.col("cohort") == 1).alias("n_b"),
        F.count_if((F.col("cohort") == 1) & (F.col("s") == 1)).alias("x_b"),
    )
    pa = F.col("x_a") / F.col("n_a")
    pb = F.col("x_b") / F.col("n_b")
    pp = (F.col("x_a") + F.col("x_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return agg.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round((pa - pb) / se, 6).alias("z"),
    )


@query(
    "q_prop_ztest",
    oracle=(
        "WITH t AS (SELECT "
        "(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT "
        "% 2) AS cohort, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s "
        "FROM events), "
        "a AS (SELECT count(*) FILTER (cohort = 0) AS n_a, "
        "count(*) FILTER (cohort = 0 AND s = 1) AS x_a, "
        "count(*) FILTER (cohort = 1) AS n_b, "
        "count(*) FILTER (cohort = 1 AND s = 1) AS x_b FROM t) "
        "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a, "
        "CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b, "
        "round(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a, "
        "round(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b, "
        "round((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b) "
        "/ sqrt(((x_a + x_b) / CAST(n_a + n_b AS DOUBLE)) "
        "* (1.0 - (x_a + x_b) / CAST(n_a + n_b AS DOUBLE)) "
        "* (1.0 / n_a + 1.0 / n_b)), 6) AS z FROM a"
    ),
    doc=(
        "Two-proportion z-test of purchase rate between md5-parity user "
        "cohorts — the conversion-rate A/B readout closing the triad "
        "with Welch-t (means) and Mann-Whitney (ranks): ONE conditional "
        "algebraic aggregate, exact integer counts to a 1-row exchange."
    ),
    tags=("agg", "stats", "eval"),
)
def q_prop_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return two_proportion_ztest(
        ev, "user_id", F.col("event_type") == "purchase", F.lit(True)
    )


# ---------------------------------------------------------------------------
# Seeded HyperLogLog with a FULL SQL oracle — the mergeable-sketch
# cardinality estimator (Flajolet et al. 2007) built on the engine-
# portable md5 hash family, so every register value and the final
# estimate are plain integer/double arithmetic a SQL oracle replicates
# (the q_sim_ivf_seeded recipe applied to approximate distinct counts;
# Spark's native approx_count_distinct stays the rows-only declared
# variant). Self-evaluating: the output row carries the exact distinct
# count and the relative error next to the estimate.
# ---------------------------------------------------------------------------

_HLL_M = 256  # registers; std err ~ 1.04/sqrt(m) = 6.5%


def hll_seeded(df: DataFrame, col: str, m: int = _HLL_M) -> DataFrame:
    """One-row (m, n_exact, v_empty, estimate, rel_err): HLL over the
    md5-derived 60-bit hash of ``col``, register = h mod m, rank =
    leading zeros of the remaining 52 bits + 1 computed EXACTLY via
    binary-string length (no float log probing), harmonic-mean estimate
    with the small-range linear-counting correction.

    Scale design: the register table is ONE m-row-bounded max
    aggregate with map-side combine — the sketch is mergeable by
    construction (max of maxes), which is the whole point at 100 TB:
    per-partition registers union for free in the combiner, the
    exchange is m rows total. The exact count (carried for self-eval)
    is the expensive arm — a real deployment drops it and keeps only
    the sketch. rho uses bin()-string length (identical unpadded
    semantics on both engines), so registers are engine-exact; only
    the final harmonic estimate is floats, rounded to 4.
    """
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    v = df.select(
        F.pmod(h, F.lit(m)).alias("reg"),
        # exact bigint floor-division: h is 60-bit positive, so the
        # subtraction form avoids any double-quotient truncation
        ((h - F.pmod(h, F.lit(m))) / F.lit(m)).cast("bigint").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(F.col("w")))
    )
    regs = v.select("reg", rho.alias("rho")).groupBy("reg").agg(
        F.max("rho").alias("mx")
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = regs.agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("ssum"),
    )
    exact = df.agg(F.count_distinct(F.col(col)).alias("n_exact"))
    j = s.crossJoin(F.broadcast(exact))
    vempty = F.lit(m) - F.col("occupied")
    raw = F.lit(alpha * m * m) / (F.col("ssum") + vempty)
    est = F.when(
        (raw <= 2.5 * m) & (vempty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / vempty),
    ).otherwise(raw)
    return j.select(
        F.lit(m).alias("m"),
        "n_exact",
        vempty.cast("bigint").alias("v_empty"),
        F.round(est, 4).alias("estimate"),
        F.round((est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


def _hll_oracle(col: str, table: str, m: int = _HLL_M) -> str:
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return (
        f"WITH v AS (SELECT ('0x' || substring(md5(CAST({col} AS VARCHAR)), "
        f"1, 15))::BIGINT AS h FROM {table}), "
        f"b AS (SELECT h % {m} AS reg, h // {m} AS w FROM v), "
        "r AS (SELECT reg, CASE WHEN w = 0 THEN 53 "
        "ELSE 53 - length(bin(w)) END AS rho FROM b), "
        "regs AS (SELECT reg, max(rho) AS mx FROM r GROUP BY 1), "
        "s AS (SELECT count(*) AS occupied, sum(pow(2.0, -mx)) AS ssum "
        "FROM regs), "
        f"e AS (SELECT count(DISTINCT {col}) AS n_exact FROM {table}), "
        f"j AS (SELECT occupied, ssum, n_exact, {m} - occupied AS v_empty, "
        f"CAST({alpha!r} AS DOUBLE) * {m} * {m} / (ssum + {m} - occupied) AS raw "
        "FROM s CROSS JOIN e), "
        "f AS (SELECT *, CASE WHEN raw <= 2.5 * "
        f"{m} AND v_empty > 0 THEN {float(m)!r} * ln({float(m)!r} / v_empty) "
        "ELSE raw END AS est FROM j) "
        f"SELECT {m} AS m, CAST(n_exact AS BIGINT) AS n_exact, "
        "CAST(v_empty AS BIGINT) AS v_empty, round(est, 4) AS estimate, "
        "round((est - n_exact) / n_exact, 4) AS rel_err FROM f"
    )


@query(
    "q_hll_seeded",
    oracle=_hll_oracle("l_orderkey", "lineitem"),
    doc=(
        "Oracle-verified HyperLogLog distinct-order estimate over "
        "lineitem (md5 hash family, 256 registers, exact bin()-string "
        "leading-zero ranks, linear-counting small-range correction): "
        "ONE m-row-bounded mergeable max aggregate — per-partition "
        "registers combine map-side, the exchange is m rows at any "
        "corpus size; carries exact count + rel_err for self-eval. "
        "The q_sim_ivf_seeded recipe applied to approx-distinct; "
        "Spark-native HLL stays the rows-only q_approx_distinct."
    ),
    tags=("agg", "sketch", "eval"),
)
def q_hll_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_seeded(T(spark, sf_dir, "lineitem"), "l_orderkey")


# ---------------------------------------------------------------------------
# Cumulative gains / lift curve — the targeting eval that answers "if I
# act on the top 20% of users by score, what share of converters do I
# capture?": users ranked by activity score, bucketed into deciles,
# per-decile capture and lift. Completes the classifier-eval set next
# to q_auc_roc (global ranking quality) and q_calibration_bins
# (probability reliability).
# ---------------------------------------------------------------------------


def gains_curve(
    df: DataFrame,
    id_col: str,
    score_expr,
    pos_pred,
    n_bins: int = 10,
) -> DataFrame:
    """(decile, n, n_pos, pos_rate, cum_capture, lift) per score decile
    (1 = highest-scored), rounded to 6.

    Scale design: one subject-keyed aggregate builds (score, label) per
    subject; the decile comes from ntile over the (score desc, id)
    total order — exact and tie-deterministic, one sorted run over the
    SUBJECT table (already aggregated, orders of magnitude under the
    event count; at extreme subject counts swap in broadcast
    equidepth-percentile cuts, the q_curriculum_order trade). All
    downstream windows run on the n_bins-row table; counts stay exact
    integers until the final division.
    """
    from pyspark.sql.window import Window

    per = df.groupBy(F.col(id_col).alias("sid")).agg(
        score_expr.alias("score"),
        F.max(pos_pred.cast("int")).alias("pos"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("sid").asc())
    d = per.select(
        F.ntile(n_bins).over(w).alias("decile"), "pos"
    )
    cells = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot_pos = F.sum("n_pos").over(wa)
    tot_n = F.sum("n").over(wa)
    return cells.select(
        "decile",
        "n",
        "n_pos",
        F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
        F.round(F.sum("n_pos").over(wc) / tot_pos, 6).alias("cum_capture"),
        F.round(
            (F.col("n_pos") / F.col("n")) / (tot_pos / tot_n), 6
        ).alias("lift"),
    )


@query(
    "q_gains_curve",
    oracle=(
        "WITH per AS (SELECT user_id AS sid, count(*) AS score, "
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos "
        "FROM events GROUP BY 1), "
        "d AS (SELECT ntile(10) OVER (ORDER BY score DESC, sid) AS decile, "
        "pos FROM per), "
        "cells AS (SELECT decile, count(*) AS n, sum(pos) AS n_pos "
        "FROM d GROUP BY 1), "
        "x AS (SELECT decile, n, n_pos, "
        "sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS cum_pos, "
        "sum(n_pos) OVER () AS tot_pos, sum(n) OVER () AS tot_n "
        "FROM cells) "
        "SELECT CAST(decile AS INT) AS decile, CAST(n AS BIGINT) AS n, "
        "CAST(n_pos AS BIGINT) AS n_pos, "
        "round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate, "
        "round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS cum_capture, "
        "round((CAST(n_pos AS DOUBLE) / n) "
        "/ (CAST(tot_pos AS DOUBLE) / tot_n), 6) AS lift FROM x"
    ),
    doc=(
        "Cumulative gains/lift curve of user activity targeting "
        "purchase conversion: one user-keyed aggregate, exact "
        "tie-deterministic ntile over the subject table, every curve "
        "window on the 10-row decile table — the 'act on the top X%' "
        "targeting eval completing AUC and calibration."
    ),
    tags=("agg", "stats", "eval", "window"),
)
def q_gains_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return gains_curve(
        ev,
        "user_id",
        F.count(F.lit(1)),
        F.col("event_type") == "purchase",
    )
