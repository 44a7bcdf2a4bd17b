"""Whole-registry physical-plan audit (r11): dump every declared query's
formatted plan and flag the guide's scale-killer patterns:

- duplicated UDF evaluation (same udf in >1 EvalPython node, guide §4.4)
- row-at-a-time BatchEvalPython nodes (§4.1)
- CartesianProduct joins (§3)
- Exchange SinglePartition (accidental global serialization, §2.4)
- LIVE repeated parquet scans of the SAME table (§2.4 compute-once) —
  scans inside InMemoryRelation build plans are executed once and are
  counted separately (the pin() discipline prints them per reference)
- live HashAggregate without a codegen id (§1.2, the q_fisher_dims
  disease — interpreted row-path aggregation)

Usage: python tools/plan_sweep.py [--sf-dir=DIR] [--out-dir=DIR]
Prints one JSON object with the findings; plan dumps land in out-dir.
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcolumnfile_spark.queries import _release_pins
from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark


def _indent(ln: str) -> int:
    return len(ln) - len(ln.lstrip(" :+-*("))


def live_lines(phys: str, needle: str):
    """Yield plan-tree lines containing ``needle`` that are NOT inside an
    InMemoryRelation/InMemoryTableScan subtree (cache builds execute once;
    the formatted dump reprints them at every reference)."""
    lines = phys.splitlines()
    for i, ln in enumerate(lines):
        if needle not in ln:
            continue
        ind = _indent(ln)
        j = i - 1
        inside = False
        while j >= 0:
            lj = lines[j]
            ij = _indent(lj)
            if ij < ind and ("InMemoryRelation" in lj or "InMemoryTableScan" in lj):
                inside = True
                break
            if ij < ind and re.search(r"\w", lj):
                ind = ij
            j -= 1
        if not inside:
            yield ln


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "_work/plans_all"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--out-dir="):
            out_dir = a.split("=", 1)[1]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    findings: dict[str, list] = collections.defaultdict(list)
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            findings["build_error"].append([name, str(exc)[:160]])
            continue
        finally:
            spark.catalog.clearCache()
            _release_pins()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        phys = plan.split("\n\n", 1)[0]

        udf_nodes = re.findall(r"(?:Batch|Arrow)EvalPython \[([a-zA-Z_0-9]+)\(", plan)
        dups = [u for u, c in collections.Counter(udf_nodes).items() if c > 1]
        if dups:
            findings["udf_dup"].append([name, dups])
        if "BatchEvalPython" in plan:
            findings["batch_eval"].append([name, plan.count("BatchEvalPython")])
        if "CartesianProduct" in phys:
            findings["cartesian"].append([name, phys.count("CartesianProduct")])
        if "Exchange SinglePartition" in plan:
            findings["single_part"].append([name, plan.count("Exchange SinglePartition")])

        scan_ids = [
            m.group(1)
            for ln in live_lines(phys, "Scan parquet")
            if (m := re.search(r"\((\d+)\)", ln))
        ]
        id_table = {
            m.group(1): m.group(2)
            for m in re.finditer(
                r"\((\d+)\) Scan parquet[^\n]*\n(?:(?!\(\d+\) )[^\n]*\n)*?"
                r"[^\n]*Location[^\n]*/([a-z_0-9]+)\.parquet",
                plan,
            )
        }
        per_table = collections.Counter(id_table.get(i, "?") for i in scan_ids)
        rep = {t: c for t, c in per_table.items() if c >= 3}
        if rep:
            findings["repeated_live_scans"].append([name, rep])

        nocg = sum(
            1
            for ln in live_lines(phys, "HashAggregate")
            if "* HashAggregate" not in ln
        )
        if nocg >= 2:
            findings["agg_no_codegen"].append([name, nocg])

    spark.stop()
    print(json.dumps({k: sorted(v) for k, v in findings.items()}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
