import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.operators.graph import (
    _doc_id_edges, _canonical_undirected, label_propagation, modularity,
    _release_checkpoint,
)
from libcolumnfile_spark.queries import pin, _release_pins

spark = get_spark("ab-modularity2")
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

def canon_lazy(edges):
    return (edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct())

def sym_from(canon):
    return canon.unionByName(canon.select(F.col("b").alias("a"), F.col("a").alias("b")))

def lp_old(edges):
    e = sym_old(edges).persist()
    out = lp_loop(e)
    e.unpersist(blocking=False)
    return out

def lp_v2(edges):
    e = pin(sym_from(canon_lazy(edges)))
    return lp_loop(e)

def q_lp_old(): return lp_old(_doc_id_edges(spark, SF))
def q_lp_v2():  return lp_v2(_doc_id_edges(spark, SF))

def q_mod_old():
    edges = _doc_id_edges(spark, SF)
    return modularity(edges, lp_old(edges))  # canonical=None -> builds its own pin

def q_mod_v1():  # current HEAD: canon pinned, loop reads canon union swap
    edges = _doc_id_edges(spark, SF)
    canon = _canonical_undirected(edges)
    return modularity(edges, label_propagation(edges, canonical=canon), canonical=canon)

def q_mod_v2():  # sym pinned, canon derived map-side
    edges = _doc_id_edges(spark, SF)
    sym = pin(sym_from(canon_lazy(edges)))
    labels = lp_loop(sym)
    return modularity(edges, labels, canonical=sym.filter(F.col("a") < F.col("b")))

def run(mk):
    spark.catalog.clearCache()
    _release_pins()
    mk().write.mode("overwrite").format("noop").save()

ref = sorted(map(tuple, q_mod_old().collect())); _release_pins(); spark.catalog.clearCache()
for mk in (q_mod_v1, q_mod_v2):
    r = sorted(map(tuple, mk().collect())); _release_pins(); spark.catalog.clearCache()
    print(mk.__name__, "EQUAL" if r == ref else "DIFFER")
ref = sorted(map(tuple, q_lp_old().collect())); _release_pins(); spark.catalog.clearCache()
r = sorted(map(tuple, q_lp_v2().collect())); _release_pins(); spark.catalog.clearCache()
print("q_lp_v2", "EQUAL" if r == ref else "DIFFER")

groups = (("mod", (q_mod_old, q_mod_v1, q_mod_v2)), ("lp", (q_lp_old, q_lp_v2)))
for gname, fns in groups:
    for mk in fns: run(mk)
    res = {mk.__name__: [] for mk in fns}
    for _ in range(5):
        for mk in fns:
            t0 = time.perf_counter(); run(mk); res[mk.__name__].append(time.perf_counter() - t0)
    for n, ts in res.items():
        print(f"{n:12s} min={min(ts):.3f} med={sorted(ts)[2]:.3f}")
spark.stop()
