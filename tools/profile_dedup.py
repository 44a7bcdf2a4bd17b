"""Ad-hoc stage profiler for the dedup pipelines at a given SF.
Usage: python tools/profile_dedup.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from libcolumnfile_spark.operators import dedup
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:40s} {time.perf_counter() - t0:7.3f}s  {out}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")
    print("docs:", d.count())

    for rep in range(2):
        print(f"--- pass {rep} (minhash stages) ---")
        spark.catalog.clearCache()
        spread = dedup._spread(d).filter(
            F.size(F.split(F.lower(F.col("text")), r"\s+")) >= 3
        )
        toks = spread.select(
            F.col("doc_id").alias("id"), dedup.token_hashes(F.col("text")).alias("th")
        ).persist()
        t("toks persist+count", lambda: toks.count())
        hashed = toks.select("id", dedup.hashed_grams(F.col("th"), 3).alias("hs"))
        t("hashed_grams", lambda: hashed.write.mode("overwrite").format("noop").save())
        sig = hashed.select(
            "id", dedup.minhash_signature_from_hashes(F.col("hs"), 16).alias("sig")
        )
        t("signature", lambda: sig.write.mode("overwrite").format("noop").save())
        banded = sig.select(
            "id", F.explode(dedup.lsh_band_keys(F.col("sig"), 8, 2)).alias("bk")
        ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        t("banded", lambda: banded.write.mode("overwrite").format("noop").save())
        buckets = (
            banded.groupBy("band", "key")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        t("buckets count", lambda: buckets.count())
        t("full minhash", lambda: dedup.minhash_lsh_dedup(d, threshold=0.2)
          .write.mode("overwrite").format("noop").save())

    for rep in range(2):
        print(f"--- pass {rep} (ngram stages) ---")
        spark.catalog.clearCache()
        df = dedup._spread(d)
        keys = df.select(
            F.col("doc_id").alias("id"),
            F.concat_ws("|", F.col("lang"),
                        (F.length(F.col("text")) / F.lit(64)).cast("int").cast("string")).alias("blk"),
            (F.size(F.split(F.lower(F.col("text")), r"\s+")) - 2).alias("nsh"),
        ).filter(F.col("nsh") > 0)
        a, b = keys.alias("a"), keys.alias("b")
        na, nb = F.col("a.nsh"), F.col("b.nsh")
        cands = a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
            & (na.cast("double") >= nb.cast("double") * 0.15)
            & (nb.cast("double") >= na.cast("double") * 0.15),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")).persist()
        t("ngram candidates count", lambda: cands.count())
        cand_ids = (cands.select(F.col("id_a").alias("id"))
                    .unionByName(cands.select(F.col("id_b").alias("id"))).distinct())
        t("cand ids count", lambda: cand_ids.count())
        cand_docs = df.join(F.broadcast(cand_ids), F.col("doc_id") == cand_ids.id, "left_semi") \
            .select(F.col("doc_id").alias("id"), dedup.shingles(F.col("text"), 3).alias("sh"))
        t("cand shingles", lambda: cand_docs.write.mode("overwrite").format("noop").save())
        t("full ngram", lambda: dedup.ngram_jaccard_pairs(d, block_col="lang", threshold=0.15)
          .write.mode("overwrite").format("noop").save())

    spark.stop()


if __name__ == "__main__":
    main()
