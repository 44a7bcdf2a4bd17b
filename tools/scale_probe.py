"""Scale-up probe: time declared queries at sf0.1 and on x10-replicated
fixtures (ids shifted per replica so keys stay unique). Near-flat wall
clock at 10x the data = the rows ride otherwise-idle cores — the
horizontal-scaling evidence BASELINE.md records per round.

Usage: python tools/scale_probe.py [query ...]   (default: corpus ops)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import load_table

from libcolumnfile_spark.cache import cache_path

BASE = "/root/testdata/sf0.1"
DEFAULT = [
    "q_fingerprint_winnow",
    "q_token_count",
    "q_dedup_embedding",
    "q_dedup_ngram",
    "q_dedup_exact",
    "q_dedup_cc",
]

# id column to shift per replica (keeps keys unique across copies).
# events shifts user_id (not event_id): replicas become 10x DISTINCT
# users, so per-user orderings (sessionization) stay deterministic —
# duplicating (user_id, ts) pairs would instead make lag() ordering
# ambiguous.
ID_COLS = {"documents": "doc_id", "embeddings": "vec_id", "events": "user_id"}

# TPC-H star: fact tables replicate with a SHARED orderkey shift (a
# lineitem row must still find its order), dim keys stay unchanged —
# each replica order belongs to the same customer/part/supplier. This
# matches how warehouses actually grow: facts 10x, dims much slower.
FACT_COLS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")


def ensure_scaled(spark, factor: int) -> str:
    """Replicated fixtures at ``factor`` x sf0.1, ids shifted per replica."""
    out_dir = cache_path(f"scale{factor}")

    def replicate(base, id_col, shift, out):
        copies = [
            base.withColumn(id_col, F.col(id_col) + F.lit(i * shift))
            for i in range(factor)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.repartition(32).write.mode("overwrite").parquet(out)

    for table, id_col in ID_COLS.items():
        out = f"{out_dir}/{table}.parquet"
        if os.path.exists(out):
            continue
        base = load_table(spark, BASE, table)
        n = base.agg(F.max(id_col)).first()[0] + 1
        replicate(base, id_col, n, out)

    # shared shift across both fact tables so the orderkey join survives
    fact_missing = [t for t in FACT_COLS if not os.path.exists(f"{out_dir}/{t}.parquet")]
    if fact_missing:
        shift = (
            load_table(spark, BASE, "orders").agg(F.max("o_orderkey")).first()[0] + 1
        )
        for table in fact_missing:
            replicate(
                load_table(spark, BASE, table),
                FACT_COLS[table],
                shift,
                f"{out_dir}/{table}.parquet",
            )
    for table in DIM_TABLES:
        out = f"{out_dir}/{table}.parquet"
        if not os.path.exists(out):
            load_table(spark, BASE, table).write.mode("overwrite").parquet(out)
    return out_dir


def ensure_x10(spark) -> str:
    return ensure_scaled(spark, 10)


def median3(fn) -> float:
    fn()  # warm: codegen + worker pool
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def best2(fn) -> float:
    """Warm + min of 2 timed runs — the cheap, contention-robust stat for
    CI ratio contracts (a ratio of two best-of-2 on the same host seconds
    apart cancels most noise; min is timeit's recommended statistic)."""
    fn()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    args = sys.argv[1:]
    factor = 10
    if args and args[0].startswith("--factor="):
        factor = int(args[0].split("=", 1)[1])
        args = args[1:]
    names = args or DEFAULT
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, factor)
    print(f"{'query':24s} {'sf0.1':>8s} {'x' + str(factor):>8s} {'ratio':>6s}")
    for name in names:
        fn = REGISTRY[name].spark_fn

        def run(d):
            spark.catalog.clearCache()
            fn(spark, d).write.mode("overwrite").format("noop").save()

        t1 = median3(lambda: run(BASE))
        tN = median3(lambda: run(scaled))
        print(f"{name:24s} {t1:8.2f} {tN:8.2f} {tN / t1:6.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
