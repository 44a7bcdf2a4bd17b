import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table
from libcolumnfile_spark.operators import dedup as DD
from libcolumnfile_spark.operators.dedup import shingles_from_tokens, md5_gram_hash, _spread
from libcolumnfile_spark.queries import pin
from tools.scale_probe import ensure_scaled

spark = get_spark("prof-containment2")
spark.sparkContext.setLogLevel("ERROR")
scaled = ensure_scaled(spark, 10)
doc = load_table(spark, scaled, "documents")

base = _spread(doc).select(F.col("doc_id").alias("id"), F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__toks"))
g = base.select("id", shingles_from_tokens(F.col("__toks"), 3).alias("__grams")).filter(F.size("__grams") > 0)
keyed = pin(
    g.select("id", F.size("__grams").cast("bigint").alias("n"), F.transform(F.col("__grams"), md5_gram_hash).alias("hs"))
    .withColumn("sig", F.md5(F.array_join(F.transform(F.array_sort("hs"), lambda h: h.cast("string")), ",")))
)
members = keyed.select("sig", "id", "n")
reps = keyed.groupBy("sig").agg(F.min_by("n", "id").alias("n"), F.min_by("hs", "id").alias("hs"))
a = reps.select(F.col("sig").alias("sig_a"), F.col("na").alias("na") if False else F.col("n").alias("na"), F.array_min("hs").alias("__anchor"))
e = reps.select(F.col("sig").alias("sig_b"), F.col("n").alias("nb"), F.explode("hs").alias("__h"))
cand = a.hint("shuffle_hash").join(e.hint("shuffle_hash"), (F.col("__anchor") == F.col("__h")) & (F.col("sig_a") != F.col("sig_b")) & (F.col("nb").cast("double") >= F.lit(0.8) * F.col("na"))).select("sig_a", "sig_b", "na", "nb")
va = reps.select(F.col("sig").alias("sig_a"), F.col("hs").alias("__ha"))
vb = reps.select(F.col("sig").alias("sig_b"), F.col("hs").alias("__hb"))
inter = F.size(F.array_intersect("__ha", "__hb"))
rep_pairs = (cand.hint("shuffle_hash").join(va.hint("shuffle_hash"), "sig_a").join(vb.hint("shuffle_hash"), "sig_b")
    .select("sig_a", "sig_b", "na", "nb", F.round(inter.cast("double") / F.col("na"), 4).alias("containment"))
    .filter(F.col("containment") >= 0.8))
ma = members.select(F.col("sig").alias("sig_a"), F.col("id").alias("doc_a"))
mb = members.select(F.col("sig").alias("sig_b"), F.col("id").alias("doc_b"))
cross = rep_pairs.hint("shuffle_hash").join(ma.hint("shuffle_hash"), "sig_a").join(mb.hint("shuffle_hash"), "sig_b").select("doc_a", "doc_b", "na", "nb", "containment")
m1 = members.select("sig", F.col("id").alias("doc_a"), F.col("n").alias("na"))
m2 = members.select("sig", F.col("id").alias("doc_b"), F.col("n").alias("nb"))
same = m1.hint("shuffle_hash").join(m2.hint("shuffle_hash"), "sig").filter(F.col("doc_a") != F.col("doc_b")).select("doc_a", "doc_b", "na", "nb", F.lit(1.0).alias("containment"))

def t(label, df, reps_n=2):
    df.write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(reps_n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label:22s} {min(ts):.3f}")

# materialize pin once (not cleared between runs here — isolate arm costs beyond the kernel)
keyed.count()
for label, df in (("reps", reps), ("cand", cand), ("rep_pairs", rep_pairs), ("cross", cross), ("same", same)):
    t(label, df)
print("counts: members", members.count(), "reps", reps.count(), "cand", cand.count(), "rep_pairs", rep_pairs.count(), "same", same.count(), "cross", cross.count())
spark.stop()
