"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query (q_join_agg) at
sf0.001; ``queries()``/``oracle_sql()`` expose every declared query from
SURVEY.md §2 via libcolumnfile_spark.registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q_join_agg: lineitem |><| orders |><| customer star join + group
    aggregate (scan -> broadcast/shuffle join -> partial+final agg).
    """
    return REGISTRY["q_join_agg"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted => rows-only check."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
