import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table, spread as _spread
from libcolumnfile_spark.operators import text as TX
from libcolumnfile_spark.queries import pin, _release_pins

spark = get_spark("ab-winnow")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
K, W, B, P = TX._WINNOW_K, TX._WINNOW_W, TX._WINNOW_B, TX._WINNOW_P

def old_kernel(k=K, w=W):
    coeff = np.array([B**j for j in range(k)], dtype=np.int64)
    @F.pandas_udf("array<bigint>")
    def kernel(texts: pd.Series) -> pd.Series:
        empty = np.empty(0, dtype=np.int64)
        out = []
        for s in texts:
            if s is None: out.append(empty); continue
            cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            n = cps.size - (k - 1)
            if n <= 0: out.append(empty); continue
            g = np.zeros(n, dtype=np.int64)
            for j in range(k):
                g += cps[j:j+n] * coeff[j]
            g %= P
            m = n - (w - 1)
            if m <= 0: out.append(empty); continue
            prints = g[:m]
            for j in range(1, w):
                prints = np.minimum(prints, g[j:j+m])
            out.append(np.unique(prints))
        return pd.Series(out)
    return kernel

def span_query(kernel_fn):
    from libcolumnfile_spark.operators.text import _SPAN_MAX_DF, _SPAN_MIN_COVERAGE
    d = _spread(load_table(spark, SF, "documents"))
    pr = d.select(F.col("doc_id"),
        kernel_fn()(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias("prints")
    ).filter(F.size("prints") > 0)
    e = pin(pr.select("doc_id", F.size("prints").cast("bigint").alias("n_prints"), F.explode("prints").alias("fp")))
    rare = e.groupBy("fp").agg(F.count(F.lit(1)).alias("df_")).filter(F.col("df_") <= _SPAN_MAX_DF)
    posts = e.join(rare.select("fp"), "fp")
    a = posts.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = posts.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    pairs = a.join(b, "fp").filter(F.col("doc_a") < F.col("doc_b")).groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_shared"))
    counts = e.select("doc_id", "n_prints").distinct()
    return (pairs.join(counts.withColumnRenamed("doc_id", "doc_a"), "doc_a").withColumnRenamed("n_prints", "na")
        .join(counts.withColumnRenamed("doc_id", "doc_b"), "doc_b").withColumnRenamed("n_prints", "nb")
        .withColumn("_cov_raw", F.col("n_shared") / F.least("na", "nb"))
        .filter(F.col("_cov_raw") >= _SPAN_MIN_COVERAGE)
        .withColumn("coverage", F.round(F.col("_cov_raw"), 6))
        .select("doc_a", "doc_b", "n_shared", "coverage"))

def winnow_query(kernel_fn):
    d = _spread(load_table(spark, SF, "documents"))
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    pr = d.select("doc_id", kernel_fn()(normalized).alias("prints"))
    xor_fold = F.aggregate(F.col("prints"), F.lit(0).cast("bigint"), lambda acc, x: acc.bitwiseXOR(x))
    return pr.select("doc_id", F.size("prints").cast("bigint").alias("n_prints"),
        F.array_min("prints").alias("min_print"), F.when(F.size("prints") > 0, xor_fold).alias("xor_print"))

new_kernel = TX.winnow_prints_kernel

def run(mk, kf):
    spark.catalog.clearCache(); _release_pins()
    mk(kf).write.mode("overwrite").format("noop").save()

# parity via collect
for mk in (winnow_query, span_query):
    ra = sorted(map(tuple, mk(old_kernel).collect())); _release_pins(); spark.catalog.clearCache()
    rb = sorted(map(tuple, mk(new_kernel).collect())); _release_pins(); spark.catalog.clearCache()
    print(mk.__name__, "EQUAL" if ra == rb else "DIFFER")

for mk in (winnow_query, span_query):
    run(mk, old_kernel); run(mk, new_kernel)
    olds, news = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(mk, old_kernel); olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(mk, new_kernel); news.append(time.perf_counter() - t0)
    print(f"{mk.__name__:14s} old min={min(olds):.3f} med={sorted(olds)[2]:.3f} | new min={min(news):.3f} med={sorted(news)[2]:.3f}")
spark.stop()
