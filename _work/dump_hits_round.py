import sys
sys.path.insert(0, "/root/repo")
out = sys.argv[1]
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.operators.graph import _doc_host_edges
import inspect
from libcolumnfile_spark.operators import graph as G
spark = get_spark("dump-hits-round")
spark.sparkContext.setLogLevel("ERROR")
edges = _doc_host_edges(spark, "/root/testdata/sf0.1")
e = edges.groupBy(F.col("src"), F.col("dst")).agg(F.sum("w").cast("double").alias("w")).persist()
nodes = (e.select(F.col("src").alias("node")).union(e.select(F.col("dst").alias("node"))).distinct()
         .localCheckpoint(eager=True))
nn = float(nodes.count())
h = nodes.withColumn("h", F.lit(1.0 / nn))
src = inspect.getsource(G.hits)
if "F.broadcast(asum)" in src:
    # old form: ONE lazy plan carrying both half-steps + broadcasts
    a_raw = (e.join(h.withColumnRenamed("node", "src"), "src")
             .groupBy(F.col("dst").alias("node")).agg(F.sum(F.col("h") * F.col("w")).alias("ar")))
    asum = a_raw.agg(F.sum("ar").alias("am"))
    auth = a_raw.crossJoin(F.broadcast(asum)).select("node", (F.col("ar") / F.col("am")).alias("a"))
    h_raw = (e.join(auth.withColumnRenamed("node", "dst"), "dst")
             .groupBy(F.col("src").alias("node")).agg(F.sum(F.col("a") * F.col("w")).alias("hr")))
    hsum = h_raw.agg(F.sum("hr").alias("hm"))
    hub = (nodes.join(h_raw, "node", "left").crossJoin(F.broadcast(hsum))
           .select("node", (F.coalesce(F.col("hr"), F.lit(0.0)) / F.col("hm")).alias("h")))
    tag = "old (broadcast L1 masses; one lazy plan per round)"
else:
    a_raw = (e.join(h.withColumnRenamed("node", "src"), "src")
             .groupBy(F.col("dst").alias("node")).agg(F.sum(F.col("h") * F.col("w")).alias("ar")).persist())
    am = a_raw.agg(F.sum("ar")).first()[0]
    auth = a_raw.select("node", (F.col("ar") / F.lit(am)).alias("a"))
    h_raw = (e.join(auth.withColumnRenamed("node", "dst"), "dst")
             .groupBy(F.col("src").alias("node")).agg(F.sum(F.col("a") * F.col("w")).alias("hr")).persist())
    hm = h_raw.agg(F.sum("hr")).first()[0]
    hub = (nodes.join(h_raw, "node", "left")
           .select("node", (F.coalesce(F.col("hr"), F.lit(0.0)) / F.lit(hm)).alias("h")))
    tag = "new (persisted half-step raws; L1 masses inlined as scalars)"
with open(out, "w") as f:
    f.write(f"-- q_hits ONE-ROUND hub plan, {tag}\n")
    f.write(hub._sc._jvm.PythonSQLUtils.explainString(hub._jdf.queryExecution(), "formatted"))
spark.stop()
