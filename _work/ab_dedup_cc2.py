import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table
from libcolumnfile_spark.operators.pipeline import connected_components
from libcolumnfile_spark.queries import pin, _release_pins

spark = get_spark("ab-dedup-cc2")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def docs():
    return load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars",
        (F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1).alias("n_tokens"))

def se_join(df, gc):
    mins = df.groupBy(*gc).agg(F.min("doc_id").alias("__mn"))
    return df.join(mins, gc).filter(F.col("doc_id") != F.col("__mn")).select(F.col("doc_id").alias("src"), F.col("__mn").alias("dst"))

def se_win(df, gc):
    w = Window.partitionBy(*gc)
    return df.withColumn("__mn", F.min("doc_id").over(w)).filter(F.col("doc_id") != F.col("__mn")).select(F.col("doc_id").alias("src"), F.col("__mn").alias("dst"))

def old():
    d = pin(docs())
    cc = connected_components(se_join(d, ["lang", "n_chars"]).union(se_join(d, ["lang", "n_tokens"])), nodes=d.select("doc_id"))
    return cc.select(F.col("id").alias("doc_id"), "comp")

def new():
    d = docs()
    cc = connected_components(se_win(d, ["lang", "n_chars"]).union(se_win(d, ["lang", "n_tokens"])), nodes=d.select("doc_id"))
    return cc.select(F.col("id").alias("doc_id"), "comp")

def run(mk):
    spark.catalog.clearCache(); _release_pins()
    mk().write.mode("overwrite").format("noop").save()

run(old); run(new)
olds, news = [], []
for _ in range(6):
    t0 = time.perf_counter(); run(old); olds.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(new); news.append(time.perf_counter() - t0)
print(f"old(pin+join) min={min(olds):.3f} med={sorted(olds)[3]:.3f} | new(win,nopin) min={min(news):.3f} med={sorted(news)[3]:.3f}")
spark.stop()
