"""Plan-audit helpers: programmatic access to the physical plan for
asserting scale-critical plan shapes (pushdown reached the scan, the dim
side broadcast, top-k planned as TakeOrderedAndProject, no Python eval in
a Catalyst-only pipeline).

Used by tests/test_plans.py; exposed as a library so pipelines can gate
deploys on plan audits the same way.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "codegen_plan",
    "assert_pushed_filter",
    "assert_read_schema_only",
    "assert_no_python_eval",
    "assert_broadcast_join",
]


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (pre-execution, AQE not yet applied).

    Scan locations under the split-layout cache (tables.py
    ``.table_cache/<table>-<digest>``) are normalized back to
    ``<table>.parquet`` so plan contracts (single-fact-scan counts,
    scan-source asserts) are layout-independent."""
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return re.sub(r"\.table_cache/([a-z_]+)-[0-9a-f]+-[0-9a-f]+-\d+", r"\1.parquet", buf.getvalue())


def codegen_plan(df: DataFrame) -> str:
    """The whole-stage-codegen explain output (shows compiled subtrees)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a filter fragment (e.g. ``GreaterThan(l_quantity``) reached
    the scan's PushedFilters — i.e. rows are dropped before deserialization,
    not in a post-scan FilterExec."""
    plan = formatted_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(f"filter {fragment!r} not pushed to scan:\n{plan}")


def assert_read_schema_only(df: DataFrame, columns: list[str]) -> None:
    """Assert the scan's ReadSchema contains exactly these columns — a
    2-column projection must not read the whole table."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:")[1]
            got = [c.split(":")[0] for c in schema.strip().lstrip("struct<").rstrip(">").split(",") if c]
            if sorted(got) != sorted(columns):
                raise AssertionError(f"scan reads {got}, expected {columns}")
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_no_python_eval(df: DataFrame) -> None:
    """Assert a Catalyst-only pipeline has no Python evaluation node
    (BatchEvalPython / ArrowEvalPython) in its hot path."""
    plan = formatted_plan(df)
    if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
        raise AssertionError(f"unexpected Python eval node:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert the plan joins via broadcast (the dim side must not shuffle
    the fact table)."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan:
        raise AssertionError(f"no BroadcastHashJoin in plan:\n{plan}")
