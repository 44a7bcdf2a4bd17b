import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.operators.graph import _doc_host_edges, hits, _release_checkpoint, _HITS_ITERS
from libcolumnfile_spark.queries import _release_pins

spark = get_spark("ab-hits-scalar")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
SF = "/root/testdata/sf0.1"
def njobs(): return sc._jsc.sc().dagScheduler().nextJobId()

def hits_scalar(edges, n_iter=_HITS_ITERS):
    e = edges.groupBy(F.col("src"), F.col("dst")).agg(F.sum("w").cast("double").alias("w")).persist()
    nodes = (e.select(F.col("src").alias("node")).union(e.select(F.col("dst").alias("node"))).distinct()
             .localCheckpoint(eager=True))
    nn = float(nodes.count())
    h = nodes.withColumn("h", F.lit(1.0 / nn))
    auth = None
    pending = []
    live_h = []
    for _ in range(n_iter):
        a_raw = (e.join(h.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum(F.col("h") * F.col("w")).alias("ar")).persist())
        pending.append(a_raw)
        am = a_raw.agg(F.sum("ar")).first()[0]
        auth = a_raw.select("node", (F.col("ar") / F.lit(am)).alias("a"))
        h_raw = (e.join(auth.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum(F.col("a") * F.col("w")).alias("hr")).persist())
        pending.append(h_raw)
        hm = h_raw.agg(F.sum("hr")).first()[0]
        h = (nodes.join(h_raw, "node", "left")
             .select("node", (F.coalesce(F.col("hr"), F.lit(0.0)) / F.lit(hm)).alias("h"))
             .localCheckpoint(eager=True))
        live_h.append(h)
        if len(live_h) > 2:
            _release_checkpoint(live_h.pop(0))
    out = (h.join(auth, "node", "left")
           .select("node", F.round("h", 6).alias("hub"),
                   F.round(F.coalesce(F.col("a"), F.lit(0.0)), 6).alias("auth"))
           .localCheckpoint(eager=True))
    for hh in live_h: _release_checkpoint(hh)
    for tmp in pending: tmp.unpersist(blocking=False)
    e.unpersist(blocking=False)
    _release_checkpoint(nodes)
    return out

def q_old(): return hits(_doc_host_edges(spark, SF))
def q_new(): return hits_scalar(_doc_host_edges(spark, SF))

ra = sorted(map(tuple, q_old().collect())); spark.catalog.clearCache(); _release_pins()
rb = sorted(map(tuple, q_new().collect())); spark.catalog.clearCache(); _release_pins()
print("hits", "EQUAL" if ra == rb else "DIFFER")

def run(mk):
    spark.catalog.clearCache(); _release_pins()
    mk().write.mode("overwrite").format("noop").save()

run(q_old)
j0 = njobs(); run(q_old); jold = njobs() - j0
j0 = njobs(); run(q_new); jnew = njobs() - j0
olds, news = [], []
for _ in range(6):
    t0 = time.perf_counter(); run(q_old); olds.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(q_new); news.append(time.perf_counter() - t0)
print(f"hits old jobs={jold} min={min(olds):.3f} med={sorted(olds)[3]:.3f} | new jobs={jnew} min={min(news):.3f} med={sorted(news)[3]:.3f}")
spark.stop()
