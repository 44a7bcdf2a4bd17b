import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table
from libcolumnfile_spark.operators.dedup import containment_pairs, shingles_from_tokens, md5_gram_hash, _spread
from tools.scale_probe import BASE, ensure_scaled

spark = get_spark("prof-containment")
spark.sparkContext.setLogLevel("ERROR")
scaled = ensure_scaled(spark, 10)

def t(label, df):
    df.write.mode("overwrite").format("noop").save()  # warm
    ts = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts):.3f}")

for name, d in (("sf0.1", BASE), ("x10", scaled)):
    doc = load_table(spark, d, "documents")
    base = _spread(doc).select(F.col("doc_id").alias("id"), F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__toks"))
    g = base.select("id", shingles_from_tokens(F.col("__toks"), 3).alias("__grams")).filter(F.size("__grams") > 0)
    hs_only = g.select("id", F.size("__grams").cast("bigint").alias("n"), F.transform(F.col("__grams"), md5_gram_hash).alias("hs"))
    keyed = hs_only.withColumn("sig", F.md5(F.array_join(F.transform(F.array_sort("hs"), lambda h: h.cast("string")), ",")))
    t(f"[{name}] grams only", g.select(F.size("__grams")))
    t(f"[{name}] hs transform", hs_only.select("id", "n", F.size("hs")))
    t(f"[{name}] + sig", keyed.select("id", "n", "sig"))
    t(f"[{name}] full query", containment_pairs(doc))
spark.stop()
