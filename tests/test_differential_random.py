"""Randomized differential testing: seeded random tables (NOT the
driver fixtures) pushed through core operator shapes on both Spark and
DuckDB. Guards against fixture-overfit — an operator that only works
because the fixtures lack NULLs, ties, empty groups, or negative
values fails here.

Tables are generated deterministically (seed in the name), written to
parquet once per session, and shared by both engines — identical bytes
in, value-compared out, same normalization as the oracle gate.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest


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


@pytest.fixture(scope="module")
def rnd_dir(spark, tmp_path_factory):
    """Two seeded random tables with hostile shapes: NULLs everywhere,
    duplicate keys, ties, empty-join keys, negative and zero values,
    unicode strings."""
    d = tmp_path_factory.mktemp("diffrand")
    rng = np.random.default_rng(20260814)
    n = 5000
    t1 = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n),
            "v": np.where(rng.random(n) < 0.15, np.nan, rng.normal(0, 100, n).round(2)),
            "s": rng.choice(["a", "b", "", "ü", "x y", "a"], n),
            "g": rng.integers(-5, 5, n),
        }
    )
    # force exact duplicate rows and tie values
    t1 = pd.concat([t1, t1.head(100)], ignore_index=True)
    t2 = pd.DataFrame(
        {
            "k": rng.integers(25, 75, 500),  # half-overlapping key range
            "w": rng.integers(-1000, 1000, 500),
        }
    )
    t1.to_parquet(d / "t1.parquet", index=False)
    t2.to_parquet(d / "t2.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def engines(spark, rnd_dir):
    for t in ("t1", "t2"):
        spark.read.parquet(f"{rnd_dir}/{t}.parquet").createOrReplaceTempView(f"rnd_{t}")
    con = duckdb.connect()
    for t in ("t1", "t2"):
        con.execute(f"CREATE VIEW rnd_{t} AS SELECT * FROM '{rnd_dir}/{t}.parquet'")
    return spark, con


# each case: SQL that is valid AND semantics-identical on both engines
CASES = {
    "filter_null_aware": (
        "SELECT k, v FROM rnd_t1 WHERE v > 10 OR v IS NULL"
    ),
    "group_agg_with_nulls": (
        "SELECT k, count(*) AS n, count(v) AS nv, "
        "CAST(round(sum(CAST(v AS DECIMAL(18,2))), 2) AS DOUBLE) AS sv "
        "FROM rnd_t1 GROUP BY k"
    ),
    "distinct_dup_rows": ("SELECT DISTINCT k, s FROM rnd_t1"),
    "join_half_overlap": (
        "SELECT rnd_t1.k, count(*) AS n, sum(w) AS sw "
        "FROM rnd_t1 JOIN rnd_t2 ON rnd_t1.k = rnd_t2.k GROUP BY rnd_t1.k"
    ),
    "left_anti_shape": (
        "SELECT k, count(*) AS n FROM rnd_t1 "
        "WHERE NOT EXISTS (SELECT 1 FROM rnd_t2 WHERE rnd_t2.k = rnd_t1.k) "
        "GROUP BY k"
    ),
    "window_rank_ties": (
        "SELECT k, g, CAST(rank() OVER (PARTITION BY g ORDER BY k) AS BIGINT) AS r "
        "FROM (SELECT DISTINCT k, g FROM rnd_t1) x"
    ),
    "string_groups": (
        "SELECT s, count(*) AS n, count(DISTINCT k) AS dk FROM rnd_t1 GROUP BY s"
    ),
    "conditional_agg": (
        "SELECT g, sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS nulls, "
        "sum(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS negs FROM rnd_t1 GROUP BY g"
    ),
    "except_shape": (
        "SELECT k FROM rnd_t1 EXCEPT SELECT k FROM rnd_t2"
    ),
    "union_distinct": (
        "SELECT k FROM rnd_t1 UNION SELECT k FROM rnd_t2"
    ),
    "window_rows_frame": (
        "SELECT k, g, CAST(sum(k) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s "
        "FROM (SELECT DISTINCT k, g FROM rnd_t1) x"
    ),
    "having_filter": (
        "SELECT k, count(*) AS n FROM rnd_t1 GROUP BY k HAVING count(*) > 120"
    ),
    "left_outer_nulls": (
        "SELECT rnd_t2.k, count(rnd_t1.k) AS matched FROM rnd_t2 "
        "LEFT JOIN rnd_t1 ON rnd_t1.k = rnd_t2.k GROUP BY rnd_t2.k"
    ),
    "scalar_funcs": (
        "SELECT k, abs(g) AS ag, coalesce(v, -1.0) AS cv, length(s) AS ls "
        "FROM rnd_t1 WHERE g <> 0"
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_differential(engines, case):
    spark, con = engines
    sql = CASES[case]
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _norm(srows, sdf.columns) == _norm(drows, dcols), f"{case} diverged"
