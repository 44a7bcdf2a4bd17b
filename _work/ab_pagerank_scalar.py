import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.operators.graph import (
    _doc_host_edges, _doc_id_edges, pagerank, _release_checkpoint, _PR_DAMPING, _PR_ITERS, _PR_HOIST_MIN_NODES
)
from libcolumnfile_spark.queries import _release_pins

spark = get_spark("ab-pr-scalar")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
SF = "/root/testdata/sf0.1"

def njobs(): return sc._jsc.sc().dagScheduler().nextJobId()

def pagerank_scalar(edges, damping=_PR_DAMPING, n_iter=_PR_ITERS, checkpoint_every=1):
    e = edges.groupBy("src", "dst").agg(F.sum("w").cast("double").alias("w")).persist()
    nodes = (e.select(F.col("src").alias("node")).union(e.select(F.col("dst").alias("node"))).distinct()
             .localCheckpoint(eager=True))
    nn = float(nodes.count())
    outd = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = e.join(outd, "src")
    ew_pinned = nn >= _PR_HOIST_MIN_NODES
    if ew_pinned: ew = ew.persist()
    ranks = nodes.withColumn("r", F.lit(1.0 / nn))
    prev = None
    pending = []
    for t in range(n_iter):
        contrib = (ew.join(ranks, ew["src"] == ranks["node"])
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("r") * F.col("w") / F.col("outw")).alias("contrib"))
                   .persist())
        pending.append(contrib)
        row = (ranks.agg(F.sum("r").alias("__rs")).crossJoin(
                contrib.agg(F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("__cs")))
               .select((F.col("__rs") - F.col("__cs")).alias("dm"))).first()
        dm = row["dm"]
        out = (nodes.join(contrib, "node", "left")
               .select("node", (F.lit((1.0 - damping) / nn) + F.lit(damping) *
                       (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dm) / nn)).alias("r")))
        ranks = out.localCheckpoint(eager=True)
        if prev is not None: _release_checkpoint(prev)
        prev = ranks
        for tmp in pending: tmp.unpersist(blocking=False)
        pending = []
    e.unpersist(blocking=False)
    if ew_pinned: ew.unpersist(blocking=False)
    _release_checkpoint(nodes)
    return ranks.select("node", F.round("r", 6).alias("rank"))

def q_old(edgef): return pagerank(edgef(spark, SF))
def q_new(edgef): return pagerank_scalar(edgef(spark, SF))

for edgef, label in ((_doc_host_edges, "host"), (_doc_id_edges, "docs")):
    ra = sorted(map(tuple, q_old(edgef).collect())); spark.catalog.clearCache(); _release_pins()
    rb = sorted(map(tuple, q_new(edgef).collect())); spark.catalog.clearCache(); _release_pins()
    print(label, "EQUAL" if ra == rb else "DIFFER")

def run(mk, edgef):
    spark.catalog.clearCache(); _release_pins()
    mk(edgef).write.mode("overwrite").format("noop").save()

for edgef, label in ((_doc_host_edges, "host"), (_doc_id_edges, "docs")):
    run(q_old, edgef)
    j0 = njobs(); run(q_old, edgef); jold = njobs() - j0
    j0 = njobs(); run(q_new, edgef); jnew = njobs() - j0
    olds, news = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(q_old, edgef); olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(q_new, edgef); news.append(time.perf_counter() - t0)
    print(f"pagerank[{label}] old jobs={jold} min={min(olds):.3f} med={sorted(olds)[2]:.3f} | new jobs={jnew} min={min(news):.3f} med={sorted(news)[2]:.3f}")
spark.stop()
