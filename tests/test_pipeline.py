"""Tests for operators/pipeline.py: hash sampling, splits, PII redaction,
vocabulary, and connected components (validated against a pure-Python
union-find on random graphs)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from libcolumnfile_spark.operators.pipeline import (
    connected_components,
    hash_bucket,
    redact_pii,
    split_assign,
    star_edges,
    vocab_topk,
)
from tests.conftest import SF_CORRECT


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {x: find(x) for x in range(n_nodes)}


@pytest.mark.parametrize("seed", [0, 1, 2])
# threshold 0 forces the distributed alternating-star path; the default
# takes the driver union-find fast path — both must agree with the model
@pytest.mark.parametrize("threshold", [1_000_000, 0])
def test_connected_components_matches_union_find(spark, seed, threshold):
    rng = random.Random(seed)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    expected = _union_find_components(n, edges)
    edf = spark.createDataFrame(edges or [(0, 0)], "src: long, dst: long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id: long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(
            edf, nodes=ndf, driver_threshold=threshold
        ).collect()
    }
    assert got == expected


@pytest.mark.parametrize("threshold", [1_000_000, 0])
def test_connected_components_chain_and_singletons(spark, threshold):
    # path graph 0-1-2-3-4 plus isolated 10: one component + singleton
    edges = [(i, i + 1) for i in range(4)]
    edf = spark.createDataFrame(edges, "src: long, dst: long")
    ndf = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 10]], "id: long")
    got = dict(
        (r["id"], r["comp"])
        for r in connected_components(
            edf, nodes=ndf, driver_threshold=threshold
        ).collect()
    )
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10}


def test_connected_components_empty_edges(spark):
    edf = spark.createDataFrame([], "src: long, dst: long")
    ndf = spark.createDataFrame([(1,), (2,)], "id: long")
    got = dict(
        (r["id"], r["comp"]) for r in connected_components(edf, nodes=ndf).collect()
    )
    assert got == {1: 1, 2: 2}


def test_star_edges_links_to_group_min(spark):
    df = spark.createDataFrame(
        [(1, "a"), (5, "a"), (9, "a"), (7, "b")], "doc_id: long, k: string"
    )
    got = {(r["src"], r["dst"]) for r in star_edges(df, ["k"]).collect()}
    assert got == {(5, 1), (9, 1)}


def test_hash_bucket_deterministic_and_bounded(spark):
    df = spark.range(500).select(hash_bucket(F.col("id")).alias("b"))
    rows = [r["b"] for r in df.collect()]
    assert all(0 <= b < 100 for b in rows)
    again = [
        r["b"]
        for r in spark.range(500).select(hash_bucket(F.col("id")).alias("b")).collect()
    ]
    assert rows == again
    # roughly uniform: every decile bucket group non-empty over 500 keys
    assert len({b // 10 for b in rows}) == 10


def test_split_assign_partitions_everything(spark):
    df = spark.range(1000).select(split_assign(F.col("id")).alias("s"))
    counts = {r["s"]: r["cnt"] for r in df.groupBy("s").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["valid"]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [("write bob.smith+x@corp.example.org or call +44-201-5550123 now",)],
        "t: string",
    )
    out = df.select(redact_pii(F.col("t")).alias("t")).first()["t"]
    assert out == "write <EMAIL> or call <PHONE> now"


def test_vocab_topk_counts_and_cutoff(spark):
    df = spark.createDataFrame(
        [("a a b",), ("b a  c",)], "text: string"
    )
    got = [(r["token"], r["cnt"]) for r in vocab_topk(df, "text", 2).collect()]
    assert got == [("a", 3), ("b", 2)]


def test_q_dedup_cc_labels_are_component_minima(spark):
    from libcolumnfile_spark.registry import REGISTRY

    out = REGISTRY["q_dedup_cc"].spark_fn(spark, SF_CORRECT).collect()
    comp_of = {r["doc_id"]: r["comp"] for r in out}
    assert len(comp_of) == 500
    # every component label is itself a member and the minimum of its cluster
    for comp in set(comp_of.values()):
        members = [d for d, c in comp_of.items() if c == comp]
        assert comp == min(members)


class TestMixingAndVersioningProperties:
    """Structural invariants of the round-3 mixing/versioning/timeseries
    ops — properties the oracle's value-hash can't state directly."""

    SF = "/root/testdata/sf0.001"

    def test_upsert_merge_keys_unique_and_inserts_present(self, spark):
        from libcolumnfile_spark.registry import REGISTRY
        from libcolumnfile_spark.tables import load_table

        merged = REGISTRY["q_upsert_merge"].spark_fn(spark, self.SF)
        n = merged.count()
        assert merged.select("doc_id").distinct().count() == n  # keyed merge
        base = load_table(spark, self.SF, "documents")
        inserted = merged.filter("doc_id >= 1000000").count()
        assert inserted > 0 and n == base.count() + inserted

    def test_snapshot_diff_classes_partition_keyspace(self, spark):
        from libcolumnfile_spark.registry import REGISTRY

        rows = {
            r["change"]: r["n"]
            for r in REGISTRY["q_snapshot_diff"].spark_fn(spark, self.SF).collect()
        }
        assert set(rows) <= {"added", "removed", "changed", "unchanged"}
        assert rows.get("added", 0) > 0 and rows.get("removed", 0) > 0

    def test_gap_fill_accounting(self, spark):
        from libcolumnfile_spark.registry import REGISTRY
        from libcolumnfile_spark.tables import load_table

        out = REGISTRY["q_gap_fill"].spark_fn(spark, self.SF).collect()
        ev = load_table(spark, self.SF, "events")
        total_events = ev.count()
        assert sum(r["n_events"] for r in out) == total_events
        for r in out:
            assert 0 <= r["n_gap_hours"] < r["n_hours"]

    def test_mix_weighted_rates_and_determinism(self, spark):
        from libcolumnfile_spark.registry import REGISTRY
        from libcolumnfile_spark.tables import load_table

        fn = REGISTRY["q_mix_weighted"].spark_fn
        a = {r["source"]: r["n_sampled"] for r in fn(spark, self.SF).collect()}
        b = {r["source"]: r["n_sampled"] for r in fn(spark, self.SF).collect()}
        assert a == b  # reproducible row-by-row
        totals = {
            r["source"]: r["n"]
            for r in load_table(spark, self.SF, "documents")
            .groupBy("source").agg(__import__("pyspark").sql.functions.count(
                __import__("pyspark").sql.functions.lit(1)).alias("n")).collect()
        }
        assert all(a[s] <= totals[s] for s in a)

    def test_shuffle_order_positions_dense(self, spark):
        from libcolumnfile_spark.registry import REGISTRY

        rows = REGISTRY["q_shuffle_order"].spark_fn(spark, self.SF).collect()
        assert [r["position"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(set(r["doc_id"] for r in rows)) == len(rows)


class TestCompaction:
    def test_file_count_and_losslessness(self, spark, tmp_path):
        """64 small shards compact to ceil(bytes/target) files with every
        row intact — the two contracts a compaction pass must keep."""
        import os

        from libcolumnfile_spark.operators.pipeline import compact_parquet

        src = str(tmp_path / "frag")
        dst = str(tmp_path / "compact")
        df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
        df.repartition(64).write.parquet(src)
        n_in = sum(
            1 for root, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet")
        )
        assert n_in == 64
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _d, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        )
        target = max(1, total // 3)  # expect ~3-4 output files
        n_out = compact_parquet(spark, src, dst, target_bytes=target)
        assert n_out < n_in and n_out <= -(-total // target)
        back = spark.read.parquet(dst)
        assert back.count() == 10_000
        assert back.agg({"v": "sum"}).first()[0] == df.agg({"v": "sum"}).first()[0]

    def test_shuffle_mode_evens_output(self, spark, tmp_path):
        """shuffle=True round-robins rows: output files are near-equal
        in row count (coalesce gives no such guarantee)."""
        import os

        from libcolumnfile_spark.operators.pipeline import compact_parquet

        src = str(tmp_path / "frag2")
        dst = str(tmp_path / "compact2")
        spark.range(8_000).repartition(32).write.parquet(src)
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _d, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        )
        n_out = compact_parquet(spark, src, dst, target_bytes=total // 4 + 1, shuffle=True)
        assert n_out >= 2
        counts = [
            spark.read.parquet(os.path.join(root, f)).count()
            for root, _d, fs in os.walk(dst)
            for f in fs
            if f.endswith(".parquet")
        ]
        assert max(counts) - min(counts) <= max(counts) * 0.25

    def test_mock_scheme_sizing_plans_real_bytes(self, spark):
        """Compaction planning over a NON-local URI must see the real
        parquet bytes through the fs layer. The regression this pins:
        os.walk over a 'mock://...' (or s3://...) string yields nothing,
        total=0, and the whole table silently coalesced to ONE file."""
        import math
        import os
        import shutil
        import uuid

        from libcolumnfile_spark.operators.pipeline import plan_compaction
        from libcolumnfile_spark.sources.columnfile.fs import (
            _mock_local,
            fs_du_suffix,
        )

        mock_dir = f"mock://bucket/compact-{uuid.uuid4().hex[:8]}"
        local = _mock_local(mock_dir)
        try:
            spark.range(5_000).selectExpr("id", "id * 3 AS v").repartition(
                8
            ).write.parquet(local)
            total = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _d, fnames in os.walk(local)
                for f in fnames
                if f.endswith(".parquet")
            )
            got_total, got_n = fs_du_suffix(mock_dir, ".parquet")
            assert got_total == total and got_n == 8
            target = max(1, total // 3)
            assert plan_compaction(mock_dir, target) == math.ceil(total / target)
        finally:
            shutil.rmtree(local, ignore_errors=True)

    def test_zero_byte_source_raises_not_coalesce1(self, spark, tmp_path):
        """An unlistable/empty source must raise, never plan a silent
        1-file rewrite."""
        import pytest as _pytest

        from libcolumnfile_spark.operators.pipeline import compact_parquet

        empty = tmp_path / "empty"
        empty.mkdir()
        with _pytest.raises(ValueError, match="no parquet bytes"):
            compact_parquet(
                spark, str(empty), str(tmp_path / "out"), target_bytes=1024
            )


class TestDomainCap:
    def test_matches_single_phase_window(self, spark):
        from pyspark.sql import Window

        from libcolumnfile_spark.operators.pipeline import domain_cap, hash_order

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "source"
        )
        w = Window.partitionBy("source").orderBy(
            hash_order(F.col("doc_id")), "doc_id"
        )
        expected = {
            (r["doc_id"], r["source"], r["rn"])
            for r in d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .collect()
        }
        got = {
            (r["doc_id"], r["source"], r["rn"])
            for r in domain_cap(d, "source", "doc_id", cap=3).collect()
        }
        assert got == expected

    def test_cap_respected_and_deterministic_across_layout(self, spark):
        from libcolumnfile_spark.operators.pipeline import domain_cap

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "source"
        )
        a = domain_cap(d, "source", "doc_id", cap=5).collect()
        per = {}
        for r in a:
            per[r["source"]] = per.get(r["source"], 0) + 1
        assert all(v <= 5 for v in per.values())
        b = domain_cap(d.repartition(13), "source", "doc_id", cap=5).collect()
        assert {tuple(r) for r in a} == {tuple(r) for r in b}

    def test_salt_buckets_one_degenerates_to_exact(self, spark):
        from libcolumnfile_spark.operators.pipeline import domain_cap

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "source"
        )
        a = {tuple(r) for r in domain_cap(d, "source", "doc_id", cap=4, salt_buckets=1).collect()}
        b = {tuple(r) for r in domain_cap(d, "source", "doc_id", cap=4, salt_buckets=32).collect()}
        assert a == b

    def test_exact_under_hot_domain_skew(self, spark):
        """One domain holds 97% of rows: the two-phase result must still
        equal the single-phase window (exactness does not depend on the
        salt spreading evenly)."""
        from pyspark.sql import Window

        from libcolumnfile_spark.operators.pipeline import domain_cap, hash_order

        rows = [(i, "hot") for i in range(3000)] + [
            (10_000 + i, f"cold{i % 5}") for i in range(100)
        ]
        d = spark.createDataFrame(rows, "doc_id BIGINT, source STRING").repartition(16)
        w = Window.partitionBy("source").orderBy(hash_order(F.col("doc_id")), "doc_id")
        expected = {
            (r["doc_id"], r["source"], r["rn"])
            for r in d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 7)
            .collect()
        }
        got = {
            (r["doc_id"], r["source"], r["rn"])
            for r in domain_cap(d, "source", "doc_id", cap=7).collect()
        }
        assert got == expected

    def test_hypothesis_matches_python_brute_force(self, spark):
        """Randomized domains/ids/caps vs a pure-python evaluation of the
        md5-order cap rule (few examples — each runs a Spark job)."""
        import hashlib

        from hypothesis import given, settings, strategies as st

        from libcolumnfile_spark.operators.pipeline import domain_cap

        def h(i: int) -> int:
            return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

        @settings(max_examples=8, deadline=None)
        @given(
            st.lists(
                st.tuples(st.integers(0, 10_000), st.sampled_from("abcd")),
                min_size=1,
                max_size=60,
                unique_by=lambda t: t[0],
            ),
            st.integers(1, 5),
        )
        def check(rows, cap):
            expected = set()
            for dom in {d for _, d in rows}:
                members = sorted(
                    (i for i, d in rows if d == dom), key=lambda i: (h(i), i)
                )
                expected |= {
                    (i, dom, rank + 1) for rank, i in enumerate(members[:cap])
                }
            df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING")
            got = {
                (r["doc_id"], r["source"], r["rn"])
                for r in domain_cap(df, "source", "doc_id", cap=cap).collect()
            }
            assert got == expected

        check()


class TestTableServingRobustness:
    def test_memo_invalidated_by_inplace_rewrite(self, spark, tmp_path):
        from libcolumnfile_spark.tables import input_keyed_memo

        p = str(tmp_path / "t.parquet")
        spark.createDataFrame([(1,)], "x BIGINT").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        df1 = spark.read.parquet(p)
        n1 = input_keyed_memo(df1, "probe-count", df1.count)
        assert n1 == 1
        import time as _t

        _t.sleep(0.01)  # ensure a distinct mtime_ns
        spark.createDataFrame([(1,), (2,), (3,)], "x BIGINT").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        df2 = spark.read.parquet(p)
        n2 = input_keyed_memo(df2, "probe-count", df2.count)
        assert n2 == 3  # stale memo would return 1

    def test_gc_spares_layout_dirs_served_this_process(self, spark, tmp_path):
        import os
        import time as _t

        import pyarrow as pa
        import pyarrow.parquet as pq

        from libcolumnfile_spark import tables as TB

        p = str(tmp_path / "documents.parquet")

        def write(nrows, salt):
            import hashlib

            # per-row distinct hash text: incompressible, so the file
            # clears the byte gate of the slice planner
            t = pa.table(
                {
                    "doc_id": pa.array(range(nrows), pa.int64()),
                    "text": pa.array(
                        [
                            hashlib.sha256(f"{salt}{i}".encode()).hexdigest() * 56
                            for i in range(nrows)
                        ]
                    ),
                }
            )
            pq.write_table(t, p)  # one file, one row group -> splittable

        write(5000, "x")
        d1_dir = TB._split_layout(p, os.stat(p), "documents")
        assert d1_dir is not None and os.path.exists(
            os.path.join(d1_dir, "_SUCCESS")
        )
        _t.sleep(0.01)
        write(5000, "y")  # in-place rewrite: new mtime/size digest
        d2_dir = TB._split_layout(p, os.stat(p), "documents")
        assert d2_dir is not None and d2_dir != d1_dir
        # the first layout dir was SERVED this process: the sibling GC
        # must spare it (a live DataFrame may still hold its listing)
        assert os.path.exists(os.path.join(d1_dir, "_SUCCESS"))


def test_bloom_screen_no_false_negatives(spark):
    """The Bloom prefilter may admit extra candidate grams (false
    positives) but must never lose a true benchmark match: per doc,
    n_matched is IDENTICAL to the plain broadcast screen's, and every
    plain-screen row appears in the Bloom screen's output."""
    from libcolumnfile_spark.registry import REGISTRY

    plain = {
        r["doc_id"]: r["n_matched"]
        for r in REGISTRY["q_contamination"].spark_fn(spark, SF_CORRECT).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_matched"], r["n_candidates"])
        for r in REGISTRY["q_contamination_bloom"]
        .spark_fn(spark, SF_CORRECT)
        .collect()
    }
    assert set(plain) <= set(bloom)
    for doc_id, n_matched in plain.items():
        assert bloom[doc_id][0] == n_matched
    # candidates bound matches from above (the fp cost is visible)
    assert all(c >= m for m, c in bloom.values())
    # and at least one doc should exist where the Bloom admitted more
    # candidates than true matches OR the sets are equal — either way the
    # verify stage only ever sees candidate grams, so matched <= candidates
    assert any(c > 0 for _, c in bloom.values())


def test_weighted_sample_prefers_heavy_rows(spark):
    """Efraimidis-Spirakis property: inclusion probability rises with
    weight, so the k-of-n sample's mean weight exceeds the population's;
    and the draw is deterministic (same rows both runs)."""
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.pipeline import weighted_sample

    rows = [(i, 1 + (i % 10) * 100) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "w"])
    picked = weighted_sample(df, F.col("w"), F.col("id"), k=80).collect()
    assert len(picked) == 80
    pop_mean = sum(w for _, w in rows) / len(rows)
    samp_mean = sum(r.w for r in picked) / len(picked)
    assert samp_mean > pop_mean * 1.3
    again = weighted_sample(df, F.col("w"), F.col("id"), k=80).collect()
    assert sorted(r.id for r in picked) == sorted(r.id for r in again)


def test_weighted_sample_zero_weight_excluded(spark):
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame([(1, 0), (2, 5), (3, 0), (4, 7)], ["id", "w"])
    got = {r.id for r in weighted_sample(df, F.col("w"), F.col("id"), k=10).collect()}
    assert got == {2, 4}


def test_weighted_sample_matches_python_reference(spark):
    """Randomized weights/ids vs a pure-python evaluation of the A-Res
    rule (md5 uniforms, ln(u)/w priority) — the cross-engine determinism
    claim, verified against a third implementation."""
    import hashlib
    import math

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.pipeline import weighted_sample

    def uniform(i: int) -> float:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        return (h + 1.0) / ((1 << 48) + 1)

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 100_000), st.integers(0, 50)),
            min_size=1,
            max_size=50,
            unique_by=lambda t: t[0],
        ),
        st.integers(1, 12),
    )
    def check(rows, k):
        expected = [
            i
            for i, w in sorted(
                ((i, w) for i, w in rows if w > 0),
                key=lambda t: (-(math.log(uniform(t[0])) / t[1]), t[0]),
            )[:k]
        ]
        df = spark.createDataFrame(rows, "id BIGINT, w BIGINT")
        got = [
            r.id for r in weighted_sample(df, F.col("w"), F.col("id"), k=k).collect()
        ]
        assert got == expected

    check()


def test_mv_maintain_handles_group_disappearance(spark):
    """A group whose count reaches zero must drop from the view; pure
    inserts create new groups; mixed deltas land on the recompute."""
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.pipeline import mv_maintain

    base_state = spark.createDataFrame(
        [("en", 2, 100), ("de", 1, 40)],
        "lang STRING, n_docs BIGINT, n_chars_sum BIGINT",
    )
    changes = spark.createDataFrame(
        [
            ("de", -1, 40),   # removes the only de doc -> group vanishes
            ("en", -1, 60),   # one en doc out
            ("fr", 1, 25),    # brand-new group
        ],
        "lang STRING, mult INT, n_chars BIGINT",
    )
    got = {r.lang: (r.n_docs, r.n_chars_sum) for r in mv_maintain(base_state, changes).collect()}
    assert got == {"en": (1, 40), "fr": (1, 25)}


class TestSCD2Merge:
    def _merge(self, spark, dim_rows, delta_rows, ts=5):
        from libcolumnfile_spark.operators.pipeline import scd2_merge

        dim = spark.createDataFrame(
            dim_rows, "k bigint, v string, valid_from bigint, valid_to bigint"
        )
        delta = spark.createDataFrame(delta_rows, "k bigint, v string")
        out = scd2_merge(dim, delta, "k", ["v"], ts=ts).collect()
        return sorted(
            ((r.k, r.v, r.valid_from, r.valid_to) for r in out),
            key=lambda t: (t[0], t[1] or "", t[2]),
        )

    def test_change_closes_and_opens(self, spark):
        got = self._merge(spark, [(1, "a", 0, None)], [(1, "b")])
        assert got == [(1, "a", 0, 5), (1, "b", 5, None)]

    def test_noop_delivery_mints_no_version(self, spark):
        got = self._merge(spark, [(1, "a", 0, None)], [(1, "a")])
        assert got == [(1, "a", 0, None)]

    def test_untouched_key_passes_through(self, spark):
        got = self._merge(spark, [(1, "a", 0, None), (2, "x", 0, None)], [(1, "b")])
        assert got == [
            (1, "a", 0, 5),
            (1, "b", 5, None),
            (2, "x", 0, None),
        ]

    def test_history_rows_never_touched(self, spark):
        got = self._merge(
            spark,
            [(1, "old", -3, 0), (1, "a", 0, None)],
            [(1, "b")],
        )
        assert got == [
            (1, "a", 0, 5),
            (1, "b", 5, None),
            (1, "old", -3, 0),
        ]

    def test_null_safe_compare(self, spark):
        # NULL -> value IS a change; NULL -> NULL is a no-op
        got = self._merge(
            spark,
            [(1, None, 0, None), (2, None, 0, None)],
            [(1, "b"), (2, None)],
        )
        assert got == [
            (1, None, 0, 5),
            (1, "b", 5, None),
            (2, None, 0, None),
        ]


class TestDistributionMatch:
    def test_uniform_target_thresholds_and_counts(self, spark):
        """Scarcest group keeps 100% (thr = 1e6); a group with k x min
        count gets thr = 1e6/k; accepted counts match a driver-side
        replay of the same md5 bucketing."""
        from libcolumnfile_spark.operators.pipeline import distribution_match
        import hashlib

        rows = [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = {r["grp"]: r for r in distribution_match(df).collect()}
        assert out["a"]["thr_ppm"] == 1_000_000 and out["a"]["n_sampled"] == 10
        assert out["b"]["thr_ppm"] == 250_000

        def bucket(doc_id):
            return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 1_000_000

        want_b = sum(1 for i in range(40) if bucket(100 + i) < 250_000)
        assert out["b"]["n_sampled"] == want_b

    def test_empty_group_after_sampling_reports_zero(self, spark):
        from libcolumnfile_spark.operators.pipeline import distribution_match

        # one group so tiny its members may all be rejected in another
        # group's thinning — the LEFT join must still report it with 0
        rows = [(1, "a")] + [(10 + i, "b") for i in range(1000)]
        df = spark.createDataFrame(rows, ["doc_id", "lang"])
        out = {r["grp"]: r for r in distribution_match(df).collect()}
        assert set(out) == {"a", "b"}
        assert out["b"]["thr_ppm"] == 1_000
        assert out["b"]["n_sampled"] >= 0  # present even if zero
