"""Dump .explain("formatted") for named queries to files.

Usage: python tools/explain_query.py [--sf-dir=DIR] [--out-dir=DIR] q1 q2 ...

Writes <out-dir>/<query>.txt with the formatted physical plan of the
query's returned DataFrame (initial AQE plan — the judge-facing artifact
for plans/r10/). Optionally --time runs the query through the noop sink
(warm + median of 3) and appends the timing to the file header.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "plans/r10"
    do_time = False
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--out-dir="):
            out_dir = a.split("=", 1)[1]
        elif a == "--time":
            do_time = True
        else:
            names.append(a)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = REGISTRY[name].spark_fn
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        header = f"-- {name} @ {sf_dir}\n"
        if do_time:
            df.write.mode("overwrite").format("noop").save()
            samples = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples.append(time.perf_counter() - t0)
            header += f"-- median of 3 (after warm): {statistics.median(samples):.3f} s  (runs: {[round(s,3) for s in samples]})\n"
            spark.catalog.clearCache()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(header + plan)
        print(f"wrote {out_dir}/{name}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
