import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table
from libcolumnfile_spark.operators.dedup import containment_pairs, shingles_from_tokens, md5_gram_hash, _spread
from libcolumnfile_spark.queries import pin, _release_pins
from tools.scale_probe import BASE, ensure_scaled

def containment_old(df, shingle_n=3, threshold=0.8):
    base = _spread(df).select(F.col("doc_id").alias("id"), F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__toks"))
    g = base.select("id", shingles_from_tokens(F.col("__toks"), shingle_n).alias("__grams")).filter(F.size("__grams") > 0)
    keyed = pin(
        g.select("id", F.size("__grams").cast("bigint").alias("n"), F.transform(F.col("__grams"), md5_gram_hash).alias("hs"))
        .withColumn("sig", F.md5(F.array_join(F.transform(F.array_sort("hs"), lambda h: h.cast("string")), ",")))
    )
    members = keyed.select("sig", "id", "n")
    reps = keyed.groupBy("sig").agg(F.min_by("n", "id").alias("n"), F.min_by("hs", "id").alias("hs"))
    a = reps.select(F.col("sig").alias("sig_a"), F.col("n").alias("na"), F.array_min("hs").alias("__anchor"))
    e = reps.select(F.col("sig").alias("sig_b"), F.col("n").alias("nb"), F.explode("hs").alias("__h"))
    cand = a.hint("shuffle_hash").join(e.hint("shuffle_hash"), (F.col("__anchor") == F.col("__h")) & (F.col("sig_a") != F.col("sig_b")) & (F.col("nb").cast("double") >= F.lit(threshold) * F.col("na"))).select("sig_a", "sig_b", "na", "nb")
    va = reps.select(F.col("sig").alias("sig_a"), F.col("hs").alias("__ha"))
    vb = reps.select(F.col("sig").alias("sig_b"), F.col("hs").alias("__hb"))
    inter = F.size(F.array_intersect("__ha", "__hb"))
    rep_pairs = (cand.hint("shuffle_hash").join(va.hint("shuffle_hash"), "sig_a").join(vb.hint("shuffle_hash"), "sig_b")
        .select("sig_a", "sig_b", "na", "nb", F.round(inter.cast("double") / F.col("na"), 4).alias("containment"))
        .filter(F.col("containment") >= threshold))
    ma = members.select(F.col("sig").alias("sig_a"), F.col("id").alias("doc_a"))
    mb = members.select(F.col("sig").alias("sig_b"), F.col("id").alias("doc_b"))
    cross = rep_pairs.hint("shuffle_hash").join(ma.hint("shuffle_hash"), "sig_a").join(mb.hint("shuffle_hash"), "sig_b").select("doc_a", "doc_b", "na", "nb", "containment")
    m1 = members.select("sig", F.col("id").alias("doc_a"), F.col("n").alias("na"))
    m2 = members.select("sig", F.col("id").alias("doc_b"), F.col("n").alias("nb"))
    same = (m1.hint("shuffle_hash").join(m2.hint("shuffle_hash"), "sig").filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "na", "nb", F.lit(1.0).alias("containment")).filter(F.lit(1.0) >= F.lit(threshold)))
    return cross.unionByName(same)

spark = get_spark("ab-containment")
spark.sparkContext.setLogLevel("ERROR")
scaled = ensure_scaled(spark, 10)

def run(builder, d):
    spark.catalog.clearCache()
    _release_pins()
    builder(load_table(spark, d, "documents")).write.mode("overwrite").format("noop").save()

for dname, d in (("sf0.1", BASE), ("x10", scaled)):
    run(containment_old, d); run(containment_pairs, d)  # warm both
    olds, news = [], []
    for _ in range(4):
        t0 = time.perf_counter(); run(containment_old, d); olds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(containment_pairs, d); news.append(time.perf_counter() - t0)
    print(f"[{dname}] old min={min(olds):.3f} med={sorted(olds)[1]:.3f} | new min={min(news):.3f} med={sorted(news)[1]:.3f}")
spark.stop()
