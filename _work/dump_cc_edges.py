import sys
sys.path.insert(0, "/root/repo")
out = sys.argv[1]
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table
from libcolumnfile_spark.operators.pipeline import star_edges
spark = get_spark("dump-cc-edges")
spark.sparkContext.setLogLevel("ERROR")
d = load_table(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "lang", "n_chars",
    (F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1).alias("n_tokens"))
e = star_edges(d, ["lang", "n_chars"]).union(star_edges(d, ["lang", "n_tokens"]))
with open(out, "w") as f:
    f.write("-- q_dedup_cc edge subplan (e1 union e2, the inline CC input)\n")
    f.write(e._sc._jvm.PythonSQLUtils.explainString(e._jdf.queryExecution(), "formatted"))
spark.stop()
