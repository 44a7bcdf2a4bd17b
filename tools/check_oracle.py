"""Local replica of the driver's correctness gate: run every declared
query on Spark and its oracle on DuckDB, compare row counts + sorted
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.tables import TABLE_NAMES


def normalize(rows, colnames):
    """Sort columns by name, then rows; stringify values for comparison."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.spark_fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            res = con.execute(q.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            continue
        sn = normalize([tuple(r) for r in srows], scols)
        dn = normalize(drows, dcols)
        if len(sn) != len(dn):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(dn)}")
        elif sn != dn:
            failures.append(name)
            diff = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"   spark : {sn[i]}")
                print(f"   duckdb: {dn[i]}")
        else:
            print(f"ok   {name}: {len(sn)} rows match")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
