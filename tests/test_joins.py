"""Unit tests for the as-of and range join operators on crafted data
(edge cases the fixture queries don't pin: exact-tie timestamps, keys
with no match, multiple value columns)."""

from __future__ import annotations

import sys
from datetime import datetime

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.operators.joins import asof_join, range_join_pairs


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 00:10:00")),
            (2, 10, ts("2024-01-01 00:20:00")),
            (3, 10, ts("2024-01-01 00:05:00")),  # before any right row
            (4, 11, ts("2024-01-01 00:30:00")),
            (5, 12, ts("2024-01-01 00:30:00")),  # key with no right rows
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01 00:10:00"), 100.0),  # exact tie with left 1
            (10, ts("2024-01-01 00:15:00"), 150.0),
            (11, ts("2024-01-01 00:25:00"), 250.0),
        ],
        "user_id bigint, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_semantics(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id", ts_col="ts", value_cols=["value"])
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    assert got[1] == 100.0  # exact tie is inclusive (l.ts >= r.ts)
    assert got[2] == 150.0  # most recent preceding, not first
    assert got[3] is None  # left row before any right row
    assert got[4] == 250.0
    assert got[5] is None  # key absent from right
    assert len(got) == 5  # left join: every left row survives


def test_asof_preserves_left_columns(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id", ts_col="ts", value_cols=["value"])
    assert set(out.columns) == {"event_id", "user_id", "ts", "asof_value"}


def test_range_pairs_window(spark):
    df = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 00:00:00")),
            (2, 10, ts("2024-01-01 00:03:00")),  # within 5 min of 1
            (3, 10, ts("2024-01-01 00:07:30")),  # within 5 min of 2 only
            (4, 11, ts("2024-01-01 00:01:00")),  # other key: no cross pairs
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    out = range_join_pairs(df, max_gap_minutes=5)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2), (2, 3)}


class TestSaltedJoin:
    def test_row_identical_to_plain_join(self, spark):
        from libcolumnfile_spark.operators.joins import salted_join

        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        plain = sorted(
            o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_custkey").collect()
        )
        salted = sorted(
            salted_join(o, c, "o_custkey", "c_custkey", n_salts=4)
            .select("o_orderkey", "c_custkey")
            .collect()
        )
        assert plain == salted

    def test_left_join_preserves_unmatched(self, spark):
        from libcolumnfile_spark.operators.joins import salted_join

        f = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], ["k", "v"])
        d = spark.createDataFrame([(1, "X"), (2, "Y")], ["dk", "w"])
        out = salted_join(f, d, "k", "dk", n_salts=3, how="left").select("k", "w").collect()
        got = {r["k"]: r["w"] for r in out}
        assert got == {1: "X", 2: "Y", 99: None}
        assert len(out) == 3  # no row duplication from dim replication
