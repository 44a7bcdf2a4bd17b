"""Physical-plan audits: the scale contract is not just "right rows" but
"right plan". These tests pin the plan features that make the declared
queries viable at 100 TB — filter pushdown reaching the scan, column
pruning in ReadSchema, broadcast joins for dims, TakeOrderedAndProject
for top-k, partial+final aggregation — so a regression that silently
degrades the plan (e.g. a lost pushdown after a refactor) fails CI, not
the cluster."""

from __future__ import annotations

import contextlib
import io
import sys

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_project_prunes_columns(spark):
    plan = plan_of(spark, "q_project")
    # the parquet scan must read ONLY the two projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>" in plan


def test_filter_pushed_to_scan(spark):
    plan = plan_of(spark, "q_filter")
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan


def test_filter_contains_pushed(spark):
    plan = plan_of(spark, "q_filter_contains")
    assert "StringContains(text,window)" in plan


def test_join_inner_broadcasts_dim(spark):
    plan = plan_of(spark, "q_join_inner")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dim side must not shuffle the fact


def test_join_agg_flagship_shape(spark):
    plan = plan_of(spark, "q_join_agg")
    # customer is broadcast; aggregation is partial+final (two
    # HashAggregate nodes around the exchange)
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_topk_plans_take_ordered(spark):
    plan = plan_of(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort materialization


def test_group_agg_partial_final(spark):
    plan = plan_of(spark, "q_group_agg")
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan  # shipdate predicate reaches the scan


def test_semi_join_stays_semi(spark):
    plan = plan_of(spark, "q_join_semi")
    assert "LeftSemi" in plan


def test_window_single_shuffle(spark):
    plan = plan_of(spark, "q_window_rank")
    assert "Window" in plan
    # exactly one exchange: the partitionBy shuffle (AQE may add reads
    # but not extra exchanges)
    assert plan.count("Exchange") <= 2


def test_whole_stage_codegen_active(spark):
    # formatted plans under AQE don't show codegen spans pre-execution;
    # the codegen explain mode lists the compiled subtrees directly
    df = REGISTRY["q_group_agg"].spark_fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    assert "WholeStageCodegen" in out


@pytest.mark.parametrize("name", ["q_dedup_exact", "q_text_stats", "q_fingerprint"])
def test_text_operators_no_python_in_plan(spark, name):
    """Pipeline text operators must be pure Catalyst — no Python UDF
    evaluation nodes in the hot path."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_media_frames_prunes_payload(spark):
    """Metadata-only media queries must never read the binary payload
    column — at 100 TB of media, this is the difference between scanning
    kilobytes of metadata and the whole corpus."""
    plan = plan_of(spark, "q_media_frames")
    assert "payload" not in plan
    # only the columns the derivation needs reach the parquet scan
    assert "text" not in plan.split("ReadSchema:")[1].splitlines()[0]
