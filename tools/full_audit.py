"""Full-registry driver-equivalent correctness audit.

Replicates the verification driver's gate locally over the ENTIRE query
registry (the driver samples a 50-query window per round; this runs all
of them) and writes CORRECTNESS_FULL_LOCAL.json.

Per query it records, exactly like the driver:
- rows_spark / rows_oracle / rows_match
- schema_match   (sorted column names equal)
- hash_spark / hash_oracle / hash_match  (value hash over the pandas
  materialization, sorted columns then sorted rows)
- dtype_spark / dtype_oracle / dtype_match  (STRICTER than the driver:
  pandas dtypes of the two results — catches DuckDB HUGEINT / Spark
  BIGINT asymmetries that only show up as hash mismatches downstream)

The SparkSession is deliberately VANILLA (no session.py tuning confs)
because the driver passes its own session; the engine must be correct,
not just fast, on an untuned session.

Usage: python tools/full_audit.py [--sf SFDIR]... [--out FILE] [query ...]
Default sf dirs: /root/testdata/sf0.01 and /root/testdata/sf0.1.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.tables import TABLE_NAMES


def _norm_cell(v) -> str:
    """Serialize one value dtype-sensitively (int 5 != float 5.0)."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return f"{f:.6g}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, pd.Timestamp):
        # DATE columns come back as datetime64-midnight from DuckDB's
        # fetchdf but datetime.date from Spark's toPandas — same value
        if v == v.normalize():
            return v.date().isoformat()
        return v.isoformat()
    import datetime as _dt

    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, float):
        return f"{v:.6g}"
    # pandas NaT / NA
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _frame_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False, name=None):
        rows.append("\x1f".join(_norm_cell(v) for v in tup))
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogateescape"))
        h.update(b"\x1e")
    return h.hexdigest()


def _dtypes(df: pd.DataFrame) -> dict[str, str]:
    out = {}
    for c in sorted(df.columns):
        k = str(df[c].dtype)
        # timestamp unit (ns vs us) is a fetch-path detail, not a typing bug
        if k.startswith("datetime64"):
            k = "datetime64"
        if k == "object" and len(df):
            nn = df[c].dropna()
            if len(nn):
                k = f"object<{type(nn.iloc[0]).__name__}>"
        # DATE columns: Spark's toPandas yields datetime.date objects,
        # DuckDB's fetchdf yields datetime64-midnight — same logical
        # type, and the driver treats them as equal (q_cast is green)
        if k == "object<date>":
            k = "datetime64"
        out[c] = k
    return out


def audit_sf(spark, sf_dir: str, only: set[str]) -> dict:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    report: dict[str, dict] = {}
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        entry: dict = {}
        t0 = time.time()
        try:
            sdf = q.spark_fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": f"spark: {e}"}
            print(f"ERR  {name}: spark: {e}", flush=True)
            continue
        entry["rows_spark"] = len(spdf)
        entry["secs_spark"] = round(time.time() - t0, 3)
        if q.oracle is None:
            entry["oracle"] = "rows_only"
            report[name] = entry
            print(f"ok-  {name}: rows-only {len(spdf)}", flush=True)
            continue
        try:
            dpdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            entry["error"] = f"duckdb: {e}"
            report[name] = entry
            print(f"ERR  {name}: duckdb: {e}", flush=True)
            continue
        entry["rows_oracle"] = len(dpdf)
        entry["rows_match"] = len(spdf) == len(dpdf)
        entry["schema_match"] = sorted(spdf.columns) == sorted(dpdf.columns)
        sd, dd = _dtypes(spdf), _dtypes(dpdf)
        entry["dtype_match"] = sd == dd
        if sd != dd:
            entry["dtype_diff"] = {
                c: [sd.get(c), dd.get(c)]
                for c in set(sd) | set(dd)
                if sd.get(c) != dd.get(c)
            }
        hs, hd = _frame_hash(spdf), _frame_hash(dpdf)
        entry["hash_spark"], entry["hash_oracle"] = hs, hd
        entry["hash_match"] = hs == hd
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        flag = "ok  " if ok and entry["dtype_match"] else ("DTYP" if ok else "FAIL")
        print(
            f"{flag} {name}: {len(spdf)} rows, hash={'=' if hs == hd else 'X'},"
            f" dtype={'=' if entry['dtype_match'] else 'X'}",
            flush=True,
        )
        report[name] = entry
    con.close()
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", action="append", default=None)
    ap.add_argument("--out", default="/root/repo/CORRECTNESS_FULL_LOCAL.json")
    ap.add_argument("--vanilla", action="store_true", default=True)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    sf_dirs = args.sf or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    only = set(args.queries)

    # vanilla session: the driver passes its own; no engine tuning confs
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("full-audit")
        .master("local[32]")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    out: dict = {"generated": time.strftime("%Y-%m-%dT%H:%M:%S"), "session": "vanilla"}
    bad_total = 0
    for sf_dir in sf_dirs:
        rep = audit_sf(spark, sf_dir, only)
        out[sf_dir] = rep
        n_oracled = sum(1 for v in rep.values() if "hash_match" in v)
        n_green = sum(1 for v in rep.values() if v.get("hash_match"))
        n_dtype = sum(1 for v in rep.values() if v.get("dtype_match") is False)
        n_err = sum(1 for v in rep.values() if "error" in v)
        bad_total += (n_oracled - n_green) + n_err
        out[sf_dir + "/summary"] = {
            "queries": len(rep),
            "oracled": n_oracled,
            "hash_green": n_green,
            "dtype_mismatch": n_dtype,
            "errors": n_err,
        }
        print(f"== {sf_dir}: {n_green}/{n_oracled} hash-green, "
              f"{n_dtype} dtype-mismatch, {n_err} errors", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(f"wrote {args.out}")
    spark.stop()
    return 1 if bad_total else 0


if __name__ == "__main__":
    raise SystemExit(main())
