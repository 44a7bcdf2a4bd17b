"""Interleaved same-JVM A/B: md5 sig-key kernel inner loop.

A (current): per gram " ".join(slice) -> encode -> md5 -> hexdigest()[:15] -> int(,16)
B (candidate): tokens pre-encoded once per doc; per gram b" ".join(enc slice)
   -> md5(...).digest()[:8] big-endian >> 4  (same 60 bits, no hex round-trip)

Driven through the q_dedup_incremental pipeline shape (corpus_keys on the
full documents table -> noop) so the measurement is the real map stage.
Parity: collected sorted output hashes must be equal every round.
"""
import os, sys, time, statistics, hashlib

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.queries import T, pin
from libcolumnfile_spark.tables import spread as _spread
from libcolumnfile_spark.operators.dedup import (
    _MERSENNE_31,
    _hash_params,
    minhash_tokens,
    md5_sig_key_kernel,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-sig-kernel")
spark.sparkContext.setLogLevel("ERROR")


def make_new_kernel(n_hashes=4, shingle_n=3, seed=42):
    params = _hash_params(n_hashes, seed)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]
    n1 = shingle_n - 1

    @F.pandas_udf("string")
    def kernel(toks: pd.Series, id_strs: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        fb = int.from_bytes
        n = len(toks)
        out: list = [None] * n
        hash_rows: list = []
        for r in range(n):
            t = toks.iloc[r]
            if t is None or len(t) < shingle_n:
                sid = id_strs.iloc[r]
                if sid is None or pd.isna(sid):
                    joined = " ".join(t) if t is not None else ""
                    out[r] = "short:~" + md5(joined.encode("utf-8")).hexdigest()
                else:
                    out[r] = "short:" + sid
                continue
            enc = [w.encode("utf-8") for w in t]
            m = len(t) - n1
            hs = np.empty(m, dtype=np.int64)
            for i in range(m):
                hs[i] = (
                    fb(md5(b" ".join(enc[i : i + shingle_n])).digest()[:8], "big")
                    >> 4
                ) % _MERSENNE_31
            hash_rows.append(hs)
        if hash_rows:
            glens = np.fromiter((h.size for h in hash_rows), dtype=np.int64)
            starts = np.zeros(glens.size, dtype=np.int64)
            np.cumsum(glens[:-1], out=starts[1:])
            flat = np.concatenate(hash_rows)
            M = (flat[None, :] * A + B) % _MERSENNE_31
            mins = np.minimum.reduceat(M, starts, axis=1)
            j = 0
            for r in range(n):
                if out[r] is None:
                    out[r] = ",".join(str(int(mins[k, j])) for k in range(n_hashes))
                    j += 1
        return pd.Series(out, dtype="object")

    return kernel


old_kernel = md5_sig_key_kernel()
new_kernel = make_new_kernel()


def keyed(kernel):
    d = _spread(T(spark, SF_DIR, "documents"))
    toks = d.select(
        F.col("doc_id"),
        F.md5(F.col("text")).alias("content_hash"),
        minhash_tokens(F.col("text")).alias("__toks"),
    )
    return toks.select(
        "doc_id",
        "content_hash",
        kernel(F.col("__toks"), F.col("doc_id").cast("string")).alias("sig_key"),
    )


def run(kernel):
    keyed(kernel).write.format("noop").mode("overwrite").save()


# parity
pa = sorted(r.sig_key for r in keyed(old_kernel).collect())
pb = sorted(r.sig_key for r in keyed(new_kernel).collect())
assert pa == pb, "PARITY FAIL"
print(f"parity OK on {len(pa)} rows", flush=True)

run(old_kernel); run(new_kernel)  # warm
olds, news = [], []
for i in range(8):
    t0 = time.perf_counter(); run(old_kernel); olds.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(new_kernel); news.append(time.perf_counter() - t0)
    print(f"round {i}: old {olds[-1]:.3f} new {news[-1]:.3f}", flush=True)
print("old:", " ".join(f"{x:.3f}" for x in olds))
print("new:", " ".join(f"{x:.3f}" for x in news))
print(
    f"old min={min(olds):.3f} med={statistics.median(olds):.3f} | "
    f"new min={min(news):.3f} med={statistics.median(news):.3f}"
)
spark.stop()
