import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.operators.graph import (
    _doc_id_edges, modularity, _release_checkpoint,
)
from libcolumnfile_spark.queries import pin, _release_pins

spark = get_spark("ab-modularity3")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def lp_loop(e, n_iter=4):
    labels = (e.select(F.col("a").alias("node")).distinct()
              .withColumn("lbl", F.col("node")).localCheckpoint(eager=True))
    prev = labels
    for _ in range(n_iter):
        nb = e.join(labels.select(F.col("node").alias("b"), F.col("lbl").alias("nbl")).hint("shuffle_hash"), "b")
        new = (nb.groupBy(F.col("a").alias("node")).agg(F.min("nbl").alias("nbl"))
               .join(labels.hint("shuffle_hash"), "node")
               .select("node", F.least(F.col("lbl"), F.col("nbl")).alias("lbl")))
        labels = new.localCheckpoint(eager=True)
        _release_checkpoint(prev)
        prev = labels
    return labels.select("node", F.col("lbl").alias("community"))

def sym_old(edges):
    raw = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    return (raw.unionByName(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .filter(F.col("a") != F.col("b")).distinct())

def q_mod_old():
    edges = _doc_id_edges(spark, SF)
    e = sym_old(edges).persist()
    labels = lp_loop(e)
    out = modularity(edges, labels)  # own pin of canon
    return out

def q_mod_v3():
    edges = _doc_id_edges(spark, SF)
    e = pin(sym_old(edges))
    labels = lp_loop(e)
    return modularity(edges, labels, canonical=e.filter(F.col("a") < F.col("b")))

def run(mk):
    spark.catalog.clearCache(); _release_pins()
    mk().write.mode("overwrite").format("noop").save()

ref = sorted(map(tuple, q_mod_old().collect())); _release_pins(); spark.catalog.clearCache()
r = sorted(map(tuple, q_mod_v3().collect())); _release_pins(); spark.catalog.clearCache()
print("v3", "EQUAL" if r == ref else "DIFFER")
run(q_mod_old); run(q_mod_v3)
olds, news = [], []
for _ in range(6):
    t0 = time.perf_counter(); run(q_mod_old); olds.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(q_mod_v3); news.append(time.perf_counter() - t0)
print(f"old min={min(olds):.3f} med={sorted(olds)[3]:.3f} | v3 min={min(news):.3f} med={sorted(news)[3]:.3f}")
spark.stop()
