"""Fill the BASELINE.md table: per-query median wall time for Spark
(queries(), noop sink) vs DuckDB (oracle_sql(), fetchall) on the same
sf parquet. Usage: python tools/bench_baseline.py [sf_dir] [runs]
Prints a markdown table and a JSON summary line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import TABLE_NAMES


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # warm both engines
    REGISTRY["q_join_agg"].spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    con.execute(REGISTRY["q_join_agg"].oracle).fetchall()

    rows = []
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        spark_times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            spark_times.append(time.perf_counter() - t0)
        s_med = statistics.median(spark_times)
        if q.oracle is not None:
            d_times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(q.oracle).fetchall()
                d_times.append(time.perf_counter() - t0)
            d_med = statistics.median(d_times)
            ratio = s_med / d_med if d_med > 0 else float("inf")
            rows.append((name, s_med, d_med, ratio))
        else:
            rows.append((name, s_med, None, None))

    print("| query | spark_s (median of %d) | duckdb_s | ratio | status |" % runs)
    print("|---|---|---|---|---|")
    for name, s, d, r in rows:
        if d is None:
            print(f"| {name} | {s:.3f} | — (rows-only) | — | n/a |")
        else:
            status = "ok" if r <= 2.0 else "over"
            print(f"| {name} | {s:.3f} | {d:.3f} | {r:.1f}x | {status} |")
    total_s = sum(s for _, s, _, _ in rows)
    total_d = sum(d for _, _, d, _ in rows if d is not None)
    print(
        json.dumps(
            {
                "spark_total_s": round(total_s, 3),
                "duckdb_total_s": round(total_d, 3),
                "total_ratio": round(total_s / total_d, 2) if total_d else None,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
