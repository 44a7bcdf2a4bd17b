"""Measure one query's sf0.1 -> x10 wall-clock ratio in a FRESH
process/JVM and print a single JSON line.

Why this exists: three scale contracts (containment, bloom screen,
inverted index) are load-sensitive — a 600-test pytest session carries
JVM GC debt and page-cache churn that inflates single wall-ratio
windows 2-5x with no code regression. Round 7 absorbed that by
loosening their in-suite bounds (up to 30x against a 5.6x isolated
measurement), which diluted the regression guard to uselessness. This
runner restores tight bounds by giving those contracts what the bound
was measured under: a clean session. test_scale_contract.py shells out
to it per query; everything here reuses tools/scale_probe.py's fixture
and timing conventions so isolated CI numbers and BASELINE.md probe
rows stay directly comparable.

Usage: python tools/isolated_ratio.py q_name [--factor=10]
Output: {"name": ..., "t1": ..., "tN": ..., "ratio": ..., "factor": N}
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark

from tools.scale_probe import BASE, ensure_scaled


def interleaved_legs(run, base: str, scaled: str, pairs: int = 3):
    """min-of-N per leg, legs INTERLEAVED (t1, tN, t1, tN, ...).

    The round-10 driver failure mode (ratio 34.09 on a host whose own
    bench probe drifted 11.9x; r11 reproduction on a loaded host: 4.86
    with loadavg ramping 0.9 -> 9.3 mid-run vs 1.61/1.78 minutes later,
    code identical): sequential legs measure the x10 leg entirely AFTER
    the sf0.1 leg, so time-correlated ambient load lands on the
    numerator only and the wall ratio explodes with no code change.
    Alternating the legs makes any load window tax both legs; the ratio
    of per-leg minima is unchanged on an idle host (min converges to the
    true time either way), so the contract bounds keep their meaning.
    """
    run(base)
    run(scaled)  # warm both legs: codegen + fixture caches for each plan
    t1s, tns = [], []
    for _ in range(pairs):
        t0 = time.perf_counter()
        run(base)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(scaled)
        tns.append(time.perf_counter() - t0)
    return min(t1s), min(tns)


def main() -> int:
    args = sys.argv[1:]
    factor = 10
    if args and args[0].startswith("--factor="):
        factor = int(args[0].split("=", 1)[1])
        args = args[1:]
    if len(args) != 1:
        print("usage: isolated_ratio.py [--factor=N] q_name", file=sys.stderr)
        return 2
    name = args[0]
    fn = REGISTRY[name].spark_fn
    spark = get_spark("isolated-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = ensure_scaled(spark, factor)

    def run(d):
        spark.catalog.clearCache()
        fn(spark, d).write.mode("overwrite").format("noop").save()

    t1, tn = interleaved_legs(run, BASE, scaled)
    print(
        json.dumps(
            {
                "name": name,
                "t1": round(t1, 3),
                "tN": round(tn, 3),
                "ratio": round(tn / t1, 3),
                "factor": factor,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
