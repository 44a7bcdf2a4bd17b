"""Generate OPERATORS.md — the full declared-query inventory — from the
live registry, so documentation can never drift from the contract.
Usage: python tools/gen_operators_md.py [--check]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY

HEADER = """# OPERATORS — declared query inventory

GENERATED from `libcolumnfile_spark.registry` by
`tools/gen_operators_md.py` — do not edit by hand
(`tests/test_operators_md.py` pins the sync). One row per declared
query: the name is the key in `__spark_entry__.queries()`; "oracle"
marks a full DuckDB value-hash oracle (vs rows-only); the summary is
the query's registered doc line.
"""


def render() -> str:
    lines = [HEADER]
    lines.append(f"\n{len(REGISTRY)} queries, "
                 f"{sum(1 for q in REGISTRY.values() if q.oracle)} with full oracles.\n")
    lines.append("| query | oracle | tags | summary |")
    lines.append("|---|---|---|---|")
    for name, q in REGISTRY.items():
        doc = " ".join((q.doc or "").split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        doc = doc.replace("|", "\\|")
        lines.append(
            f"| {name} | {'yes' if q.oracle else 'rows-only'} | "
            f"{', '.join(q.tags)} | {doc} |"
        )
    return "\n".join(lines) + "\n"


def main() -> int:
    out = render()
    path = "/root/repo/OPERATORS.md"
    if "--check" in sys.argv:
        current = open(path).read() if __import__("os").path.exists(path) else ""
        if current != out:
            print("OPERATORS.md is stale — run tools/gen_operators_md.py")
            return 1
        print("OPERATORS.md in sync")
        return 0
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
