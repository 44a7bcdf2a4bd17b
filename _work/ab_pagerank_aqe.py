import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.queries import _release_pins

spark = get_spark("ab-pr-aqe")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
SF = "/root/testdata/sf0.1"

def njobs():
    return sc._jsc.sc().dagScheduler().nextJobId()

def run(name, aqe):
    fn = REGISTRY[name].spark_fn
    spark.catalog.clearCache(); _release_pins()
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    try:
        fn(spark, SF).write.mode("overwrite").format("noop").save()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

for name in ("q_pagerank", "q_pagerank_docs", "q_hits"):
    run(name, True)  # warm
    j0 = njobs(); run(name, True); jon = njobs() - j0
    j0 = njobs(); run(name, False); joff = njobs() - j0
    on, off = [], []
    for _ in range(5):
        t0 = time.perf_counter(); run(name, True); on.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(name, False); off.append(time.perf_counter() - t0)
    print(f"{name:16s} AQE-on jobs={jon:3d} min={min(on):.3f} med={sorted(on)[2]:.3f} | AQE-off jobs={joff:3d} min={min(off):.3f} med={sorted(off)[2]:.3f}")
spark.stop()
