"""Measure named queries' wall-clock at one SF in a FRESH process/JVM
and print a single JSON line {"timings": {name: sec, ...}, "sf_dir": ...}.

Why this exists: the round-8 driver bench recorded ~2x the committed
per-query values for the Arrow-kernel dedup family with zero code
change — ambient host load landing inside the shared-JVM sweep (the
judge re-measured the seven biggest "regressions" at committed values
the same day; VERDICT r8 item 1). bench.py now detects floor drift with
an interleaved probe and shells out HERE to re-measure the affected
queries in a clean session before emitting its JSON, instead of
publishing contaminated numbers. One subprocess re-measures ALL flagged
queries (JVM startup amortized), using bench.py's exact procedure:
untimed warm run, then median of N timed runs through the noop sink.

Usage: python tools/isolated_time.py [--sf-dir=DIR] [--runs=N] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        else:
            names.append(a)
    if not names:
        print("usage: isolated_time.py [--sf-dir=DIR] [--runs=N] q1 ...",
              file=sys.stderr)
        return 2
    spark = get_spark("isolated-time")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].spark_fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"timings": timings, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
