import sys
sys.path.insert(0, "/root/repo")
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.queries import _release_pins

spark = get_spark("job-count")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

def njobs():
    return sc._jsc.sc().dagScheduler().nextJobId()

for name in sys.argv[1:]:
    fn = REGISTRY[name].spark_fn
    # warm (fixture conversions etc.)
    fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache(); _release_pins()
    j0 = njobs()
    fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
    j1 = njobs()
    spark.catalog.clearCache(); _release_pins()
    print(f"{name:20s} jobs={j1 - j0}")
spark.stop()
