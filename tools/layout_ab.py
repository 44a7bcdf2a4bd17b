"""A/B the split-layout cache (tables._split_layout) on the queries that
regressed r3->r4, in ONE process (same JVM, same host state): per mode,
clear the table-plan memo so every scan replans against the chosen
layout, warm once, then take 3-run medians.

Usage: python tools/layout_ab.py [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = sys.argv[1:] or [
    "q_snapshot_diff",
    "q_join_asof",
    "q_dedup_exact",
    "q_sort_merge",
    "q_funnel",
    "q_sort",
    "q_gap_fill",
]

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from libcolumnfile_spark import tables
    from libcolumnfile_spark.registry import REGISTRY
    from libcolumnfile_spark.session import get_spark

    spark = get_spark()
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    # alternate modes TWICE and keep each mode's best median: the first
    # sweep pays JVM/codegen warmup for whichever mode goes first, so a
    # single split-then-nosplit pass systematically flatters nosplit
    for mode in ("split", "nosplit", "split", "nosplit"):
        if mode == "nosplit":
            os.environ["SPARK_GRAFT_NO_SPLIT_LAYOUT"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_NO_SPLIT_LAYOUT", None)
        tables._TABLE_CACHE.clear()  # replan every table in this mode
        for q in QUERIES:
            fn = REGISTRY[q].spark_fn
            fn(spark, SF).write.mode("overwrite").format("noop").save()  # warm
            ts = []
            for _ in range(3):
                t0 = time.monotonic()
                fn(spark, SF).write.mode("overwrite").format("noop").save()
                ts.append(time.monotonic() - t0)
            med = statistics.median(ts)
            results[q][mode] = min(results[q].get(mode, med), med)
    os.environ.pop("SPARK_GRAFT_NO_SPLIT_LAYOUT", None)
    print(f"{'query':<22} {'split':>8} {'nosplit':>8} {'delta%':>8}")
    for q, r in results.items():
        d = 100.0 * (r["split"] - r["nosplit"]) / r["nosplit"]
        print(f"{q:<22} {r['split']:>8.3f} {r['nosplit']:>8.3f} {d:>+7.1f}%")


if __name__ == "__main__":
    main()
