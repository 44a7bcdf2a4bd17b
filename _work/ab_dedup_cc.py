import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table
from libcolumnfile_spark.operators.pipeline import star_edges, connected_components
from libcolumnfile_spark.queries import pin, _release_pins

spark = get_spark("ab-dedup-cc")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def docs():
    return load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars",
        (F.length("text") - F.length(F.translate(F.col("text"), " ", "")) + 1).alias("n_tokens"),
    )

def star_edges_window(df, group_cols, id_col="doc_id"):
    w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__mn", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("__mn"))
        .select(F.col(id_col).alias("src"), F.col("__mn").alias("dst"))
    )

def build(use_pin, star_fn):
    d = docs()
    if use_pin:
        d = pin(d)
    e1 = star_fn(d, ["lang", "n_chars"])
    e2 = star_fn(d, ["lang", "n_tokens"])
    cc = connected_components(e1.union(e2), nodes=d.select("doc_id"))
    return cc.select(F.col("id").alias("doc_id"), "comp")

VARIANTS = {
    "A pin+join": lambda: build(True, star_edges),
    "B nopin+join": lambda: build(False, star_edges),
    "C pin+window": lambda: build(True, star_edges_window),
    "D nopin+window": lambda: build(False, star_edges_window),
}

def run(mk):
    spark.catalog.clearCache()
    _release_pins()
    mk().write.mode("overwrite").format("noop").save()

# sanity: identical output
import hashlib
ref = None
for name, mk in VARIANTS.items():
    rows = sorted(map(tuple, mk().collect()))
    h = hashlib.md5(str(rows).encode()).hexdigest()
    _release_pins(); spark.catalog.clearCache()
    if ref is None:
        ref = h
    print(name, "hash", h, "MATCH" if h == ref else "MISMATCH")

for mk in VARIANTS.values():
    run(mk)  # warm all
res = {k: [] for k in VARIANTS}
for _ in range(5):
    for name, mk in VARIANTS.items():
        t0 = time.perf_counter(); run(mk); res[name].append(time.perf_counter() - t0)
for name, ts in res.items():
    print(f"{name:16s} min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f}")
spark.stop()
