import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.operators.graph import (
    _doc_id_edges, _canonical_undirected, label_propagation, modularity,
    _release_checkpoint,
)
from libcolumnfile_spark.queries import pin, _release_pins

spark = get_spark("ab-modularity")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def label_prop_old(edges, n_iter=4):
    raw = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e = (raw.unionByName(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
         .filter(F.col("a") != F.col("b")).distinct().persist())
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
    e.unpersist(blocking=False)
    return labels.select("node", F.col("lbl").alias("community"))

def q_mod_old():
    edges = _doc_id_edges(spark, SF)
    return modularity(edges, label_prop_old(edges))  # modularity builds its own canon (canonical=None)

def q_mod_new():
    edges = _doc_id_edges(spark, SF)
    canon = _canonical_undirected(edges)
    return modularity(edges, label_propagation(edges, canonical=canon), canonical=canon)

def q_lp_old():
    return label_prop_old(_doc_id_edges(spark, SF))

def q_lp_new():
    return label_propagation(_doc_id_edges(spark, SF))

def run(mk):
    spark.catalog.clearCache()
    _release_pins()
    mk().write.mode("overwrite").format("noop").save()

# parity
for a, b in ((q_mod_old, q_mod_new), (q_lp_old, q_lp_new)):
    ra = sorted(map(tuple, a().collect())); _release_pins(); spark.catalog.clearCache()
    rb = sorted(map(tuple, b().collect())); _release_pins(); spark.catalog.clearCache()
    print(a.__name__, "vs", b.__name__, "EQUAL" if ra == rb else "DIFFER")

for pair in (("modularity", q_mod_old, q_mod_new), ("label_prop", q_lp_old, q_lp_new)):
    name, old, new = pair
    run(old); run(new)
    olds, news = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(old); olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(new); news.append(time.perf_counter() - t0)
    print(f"{name:12s} old min={min(olds):.3f} med={sorted(olds)[2]:.3f} | new min={min(news):.3f} med={sorted(news)[2]:.3f}")
spark.stop()
