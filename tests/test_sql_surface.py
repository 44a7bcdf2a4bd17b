"""SQL-surface parity: for every declared query whose oracle SQL also
parses and runs on Spark SQL (over the same fixture temp views), the
SQL result must be row-identical to the DataFrame implementation.

This is an ENGINE-INTERNAL check, independent of the DuckDB oracle:
both sides run on Spark, so any difference is a real implementation
divergence (wrong join condition, wrong aggregate, dialect-semantics
drift), never engine float noise. Oracles using DuckDB-only syntax
(:: casts, list_* functions, unnest(generate_series), recursive CTEs)
are skipped dynamically — the point is breadth over the large ANSI
subset, with a floor asserting the check stays meaningful.
"""

from __future__ import annotations

import math
import sys

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.tables import load_tables

SF = "/root/testdata/sf0.001"


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def _run_results(spark):
    # computed once per session (module fixture): {name: (status, detail)}
    for name, df in load_tables(spark, SF).items():
        df.createOrReplaceTempView(name)
    results = {}
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        try:
            sdf = spark.sql(q.oracle)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # DuckDB-only syntax: skip
            results[name] = ("skip", str(e).splitlines()[0][:120])
            continue
        ddf = q.spark_fn(spark, SF)
        drows = [tuple(r) for r in ddf.collect()]
        if sorted(sdf.columns) != sorted(ddf.columns):
            results[name] = ("mismatch", f"columns {sdf.columns} vs {ddf.columns}")
        elif _norm(srows, sdf.columns) != _norm(drows, ddf.columns):
            results[name] = ("mismatch", f"{len(srows)} vs {len(drows)} rows or values differ")
        else:
            results[name] = ("ok", "")
    return results


@pytest.fixture(scope="module")
def sql_results(spark):
    return _run_results(spark)


def test_no_sql_dataframe_divergence(sql_results):
    bad = {n: d for n, (s, d) in sql_results.items() if s == "mismatch"}
    assert not bad, f"SQL-vs-DataFrame divergence: {bad}"


def test_sql_surface_breadth(sql_results):
    ok = sum(1 for s, _ in sql_results.values() if s == "ok")
    # the ANSI subset must stay broad — a parser regression or a mass of
    # DuckDB-only rewrites would erode the independent check
    assert ok >= 50, f"only {ok} oracles ran on Spark SQL"
