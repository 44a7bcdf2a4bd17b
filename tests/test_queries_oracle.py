"""Oracle-parity tests: every declared query with a SQL oracle is compared
against DuckDB at sf0.001 (fast); rows-only queries are smoke-checked.
Mirrors the driver's correctness gate (SURVEY.md §5 item 3).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.tables import TABLE_NAMES

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.spark_fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), f"{name}: column names differ"
    sn = _normalize(srows, sdf.columns)
    dn = _normalize(drows, dcols)
    assert len(sn) == len(dn), f"{name}: row count {len(sn)} vs {len(dn)}"
    assert sn == dn, f"{name}: values differ (first diff: "\
        f"{next(((a, b) for a, b in zip(sn, dn) if a != b), None)})"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_mktsegment", "revenue", "n_items"}


def test_contract_shape():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
    for sql in oracles.values():
        assert isinstance(sql, str) and sql.strip()
