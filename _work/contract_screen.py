"""Screen ALL scale contracts' x10 ratios on the current host in ONE JVM.

Why: the driver's pytest has failed on a DIFFERENT near-bound contract in
each of the last two full runs (q_corr_matrix -> recalibrated bc492af;
q_attribution 3.51 vs 3.0 in pytest_full_r11c.log). The anchors were
measured on a faster-per-core host class; on the r11 shared-VM class any
contract whose sf0.1 leg sits at the job floor can drift past its bound
with no code change. Rather than recalibrating one query per 15-minute
pytest run, measure every contract's ratio with the in-suite procedure
(best2 per leg, clearCache between runs) and report margin = bound/ratio
sorted ascending, so ALL thin-margin contracts get recalibrated at once
with committed evidence.

Usage: python _work/contract_screen.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark

from tools.scale_probe import BASE, best2, ensure_x10

from tests.test_scale_contract import CONTRACTS, ISOLATED_CONTRACTS


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "_work/contract_screen.json"
    spark = get_spark()
    x10 = ensure_x10(spark)

    all_contracts = dict(CONTRACTS)
    all_contracts.update(ISOLATED_CONTRACTS)

    rows = []
    t_start = time.time()
    for i, name in enumerate(sorted(all_contracts)):
        anchor, bound = all_contracts[name]
        fn = REGISTRY[name].spark_fn

        def run(d):
            spark.catalog.clearCache()
            fn(spark, d).write.mode("overwrite").format("noop").save()

        try:
            t1 = best2(lambda: run(BASE))
            t10 = best2(lambda: run(x10))
        except Exception as exc:  # keep screening; report the break
            rows.append({"name": name, "error": repr(exc)[:200]})
            continue
        ratio = t10 / t1
        rows.append(
            {
                "name": name,
                "t1": round(t1, 3),
                "t10": round(t10, 3),
                "ratio": round(ratio, 2),
                "anchor": anchor,
                "bound": bound,
                "margin": round(bound / ratio, 2),
                "isolated": name in ISOLATED_CONTRACTS,
            }
        )
        print(
            f"[{i + 1}/{len(all_contracts)}] {name}: ratio {ratio:.2f} "
            f"(bound {bound}, margin {bound / ratio:.2f}) "
            f"t1={t1:.2f} t10={t10:.2f}",
            flush=True,
        )

    rows.sort(key=lambda r: r.get("margin", 0.0))
    payload = {
        "elapsed_sec": round(time.time() - t_start, 1),
        "n": len(rows),
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print("WROTE", out_path)
    thin = [r for r in rows if "margin" in r and r["margin"] < 1.3]
    print(f"thin-margin (<1.3x): {len(thin)}")
    for r in thin:
        print(
            f"  {r['name']}: ratio {r['ratio']} vs bound {r['bound']} "
            f"(margin {r['margin']}) t1={r['t1']} t10={r['t10']}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
