"""Physical-plan audits: the scale contract is not just "right rows" but
"right plan". These tests pin the plan features that make the declared
queries viable at 100 TB — filter pushdown reaching the scan, column
pruning in ReadSchema, broadcast joins for dims, TakeOrderedAndProject
for top-k, partial+final aggregation — so a regression that silently
degrades the plan (e.g. a lost pushdown after a refactor) fails CI, not
the cluster. Assertions go through libcolumnfile_spark.plans, the
library form of these audits."""

from __future__ import annotations

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark import plans
from libcolumnfile_spark.registry import REGISTRY

SF = "/root/testdata/sf0.01"


def q(spark, name: str):
    return REGISTRY[name].spark_fn(spark, SF)


def plan_of(spark, name: str) -> str:
    return plans.formatted_plan(q(spark, name))


def test_project_prunes_columns(spark):
    # the parquet scan must read ONLY the two projected columns
    plans.assert_read_schema_only(q(spark, "q_project"), ["l_orderkey", "l_extendedprice"])


def test_filter_pushed_to_scan(spark):
    plans.assert_pushed_filter(q(spark, "q_filter"), "GreaterThan(l_quantity")


def test_filter_contains_pushed(spark):
    plans.assert_pushed_filter(q(spark, "q_filter_contains"), "StringContains(text,window)")


def test_join_inner_broadcasts_dim(spark):
    plans.assert_broadcast_join(q(spark, "q_join_inner"))
    # dim side must not shuffle the fact
    assert "SortMergeJoin" not in plan_of(spark, "q_join_inner")


def test_join_agg_flagship_shape(spark):
    # customer is broadcast; aggregation is partial+final (two
    # HashAggregate nodes around the exchange)
    plans.assert_broadcast_join(q(spark, "q_join_agg"))
    assert plan_of(spark, "q_join_agg").count("HashAggregate") >= 2


def test_topk_plans_take_ordered(spark):
    plan = plan_of(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort materialization


def test_group_agg_partial_final(spark):
    plan = plan_of(spark, "q_group_agg")
    assert plan.count("HashAggregate") >= 2
    plans.assert_pushed_filter(q(spark, "q_group_agg"), "l_shipdate")


def test_semi_join_stays_semi(spark):
    assert "LeftSemi" in plan_of(spark, "q_join_semi")


def test_window_single_shuffle(spark):
    plan = plan_of(spark, "q_window_rank")
    assert "Window" in plan
    # exactly one exchange: the partitionBy shuffle (AQE may add reads
    # but not extra exchanges)
    assert plan.count("Exchange") <= 2


def test_whole_stage_codegen_active(spark):
    # formatted plans under AQE don't show codegen spans pre-execution;
    # the codegen explain mode lists the compiled subtrees directly
    assert "WholeStageCodegen" in plans.codegen_plan(q(spark, "q_group_agg"))


@pytest.mark.parametrize("name", ["q_dedup_exact", "q_text_stats", "q_fingerprint"])
def test_text_operators_no_python_in_plan(spark, name):
    """Pipeline text operators must be pure Catalyst — no Python UDF
    evaluation nodes in the hot path."""
    plans.assert_no_python_eval(q(spark, name))


def test_media_frames_prunes_payload(spark):
    """Metadata-only media queries must never read the binary payload
    column — at 100 TB of media, this is the difference between scanning
    kilobytes of metadata and the whole corpus."""
    plan = plan_of(spark, "q_media_frames")
    assert "payload" not in plan
    # only the columns the derivation needs reach the parquet scan
    assert "text" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_functions_namespace_importable():
    from libcolumnfile_spark import functions as CF

    assert callable(CF.fingerprint) and callable(CF.simhash64) and callable(CF.dot)


def test_bucketed_join_no_join_exchange(spark):
    # both sides storage-bucketed on the join key: the sort-merge join
    # consumes co-located buckets directly — the only Exchange in the
    # plan is the (tiny) final aggregation shuffle
    plan = plan_of(spark, "q_join_bucketed")
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # formatted explain lists each node twice (tree line + detail
    # header) — count the detail headers
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_winnow_fingerprint_map_only(spark):
    # the winnowing fingerprint is a pure map pass: one ArrowEvalPython
    # (the numpy kernel) and NO exchange anywhere — at 100 TB this scans,
    # never shuffles
    plan = plan_of(spark, "q_fingerprint_winnow")
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_dedup_embedding_broadcasts_labels(spark):
    # the (tiny) component-label side of the final node join must
    # broadcast — shuffling the full id set for a label lookup would be
    # the classic small-side mistake at scale
    plans.assert_broadcast_join(q(spark, "q_dedup_embedding"))


def test_partition_pruning_static(spark):
    # the partition-column predicate must appear in PartitionFilters —
    # pruning at planning time, zero I/O for the other partitions
    plan = plan_of(spark, "q_partition_pruned")
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan


def test_partition_pruning_dynamic(spark):
    # the join-derived filter shows up as a runtime dynamicpruning
    # subquery on the fact scan
    plan = plan_of(spark, "q_partition_pruned_dynamic")
    assert "dynamicpruning" in plan.lower()


# ---------------------------------------------------------------------------
# TPC-H pack plan contracts (operators/tpch.py): the pack's scale story
# is "fact scans + broadcast dims + partial/final aggs + TakeOrdered
# top-k" — pin exactly that.
# ---------------------------------------------------------------------------


def test_tpch_q3_shape(spark):
    plan = plan_of(spark, "q_tpch_q3")
    plans.assert_broadcast_join(q(spark, "q_tpch_q3"))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial+final


def test_tpch_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "q_tpch_q6")
    # every Q6 predicate reaches the parquet scan
    for frag in ["GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity"]:
        assert frag in plan, f"missing pushed filter {frag}"
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning" not in plan.split("HashAggregate")[0]


def test_tpch_q4_no_fact_broadcast(spark):
    # the quarter-filtered ORDERS broadcast, never lineitem: the only
    # BroadcastExchange must hash o_orderkey-side rows (3 columns max)
    plan = plan_of(spark, "q_tpch_q4")
    plans.assert_broadcast_join(q(spark, "q_tpch_q4"))
    import re as _re

    bcasts = _re.findall(r"BroadcastExchange[\s\S]{0,400}?Input \[\d+\]: \[([^\]]+)\]", plan)
    assert bcasts, "no BroadcastExchange found"
    for cols in bcasts:
        assert "l_extendedprice" not in cols and "l_quantity" not in cols, (
            f"fact-side broadcast detected: {cols}"
        )


def _fact_scan_count(plan: str, table: str = "lineitem") -> int:
    """Count scans of the fact table by Location line: matches both the
    raw fixture (lineitem.parquet) and the split-layout cache copies
    (.table_cache/[fine-]lineitem-<digest>) the loader may serve."""
    import re

    return len(re.findall(r"location:.*(?:/|fine-)?%s[.-]" % table, plan.lower()))


def test_tpch_q18_single_agg_single_scan(spark):
    # the HAVING aggregate doubles as the output aggregate: one fact
    # scan, one 2-phase agg, top-k as TakeOrdered
    plan = plan_of(spark, "q_tpch_q18")
    assert "TakeOrderedAndProject" in plan
    assert _fact_scan_count(plan) == 1
    assert plan.count("HashAggregate") >= 2


def test_tpch_q21_single_fact_scan(spark):
    # hand-decorrelated: exactly one scan of lineitem, no self-join of
    # the raw fact (the EXISTS cascade would plan 3 lineitem scans)
    plan = plan_of(spark, "q_tpch_q21")
    assert _fact_scan_count(plan) == 1, (
        "q21 must scan the fact exactly once (got %d)"
        % _fact_scan_count(plan)
    )
    assert plan.count("HashAggregate") >= 2  # 2-phase pair agg
    assert "Window" in plan  # per-order counts ride a window, not a 2nd agg


def test_tpch_scalar_subquery_queries_scan_fact_once(spark):
    # q11/q15/q17 pin their dual-referenced aggregates (persist), so the
    # fact is scanned once — without the pin each branch re-scans it
    for name in ("q_tpch_q11", "q_tpch_q15", "q_tpch_q17"):
        plan = plan_of(spark, name)
        n = _fact_scan_count(plan)
        assert n == 1, f"{name}: expected 1 lineitem scan, got {n}"


def test_maybe_broadcast_is_size_gated(spark):
    # dim-sized inputs get the static hint; the fact table must NOT
    # (forced fact broadcasts OOM'd the x100 probe — the policy this
    # helper encodes)
    from libcolumnfile_spark.tables import load_table, maybe_broadcast

    sf = "/root/testdata/sf0.1"

    def hinted(df):
        return "hint" in df._jdf.queryExecution().logical().toString().lower()

    assert hinted(maybe_broadcast(load_table(spark, sf, "customer")))
    assert hinted(maybe_broadcast(load_table(spark, sf, "orders")))
    assert not hinted(maybe_broadcast(load_table(spark, sf, "lineitem")))


def test_tune_dop_adopts_user_conf_change_and_restore_helper(spark):
    """A spark.conf.set made BETWEEN queries must become the new tuning
    base (not be clobbered by a ceiling captured at first call), and
    restore_session_conf must hand non-query consumers the base back."""
    from libcolumnfile_spark import queries as Q

    orig_w = spark.conf.get("spark.sql.shuffle.partitions")
    orig_a = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        Q._tune_dop(spark, SF)  # leaves micro-input tuning in the conf
        # user changes the conf between queries
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        Q._tune_dop(spark, SF)
        assert Q._DOP_BASE[spark]["base"] == (7, "true")
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= 7
        # PARTIAL user change: changing only the width must adopt the new
        # width base while the AQE base stays the user's "true" — NOT the
        # tuner's own micro-input aqe=false (which would pin AQE off for
        # every later query; symmetric for a stale tuned width). Note a
        # user write that coincides with the tuner's last-set value is
        # indistinguishable from the tuner's own write and harmlessly
        # not adopted.
        spark.conf.set("spark.sql.shuffle.partitions", "9")
        Q._tune_dop(spark, SF)
        assert Q._DOP_BASE[spark]["base"] == (9, "true")
        Q.restore_session_conf(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "9"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    finally:
        Q._DOP_BASE.pop(spark, None)
        spark.conf.set("spark.sql.shuffle.partitions", orig_w)
        spark.conf.set("spark.sql.adaptive.enabled", orig_a)


def test_bm25_plan_is_map_side_takeordered(spark):
    """q_bm25_topk's contract plan: TakeOrderedAndProject top-k, ONE
    shuffle (the 1-row corpus-stats partial/final agg), stats broadcast
    back — no doc- or token-keyed exchange anywhere."""
    plan = plan_of(spark, "q_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan  # the 1-row stats cross join
    assert plan.count("Exchange (") - plan.count("BroadcastExchange (") <= 1, plan[:2000]


def test_dedup_ngram_keys_persisted_once(spark):
    """The anchored keys stage (md5 per gram) is persisted so the
    self-join reads it from cache on both sides instead of paying the
    map work twice."""
    plan = plan_of(spark, "q_dedup_ngram")
    assert "InMemoryTableScan" in plan


def test_sim_pairs_auto_uses_batched_kernel_at_bench_sf(spark):
    """At sf0.1 the adaptive SRP path must dispatch the scoring kernel
    via mapInPandas over key-sorted partitions (one Python call per
    Arrow batch), NOT per-group applyInPandas (FlatMapGroupsInPandas) —
    the round-5 x100 drift root cause."""
    df = REGISTRY["q_sim_pairs_auto"].spark_fn(spark, "/root/testdata/sf0.1")
    plan = plans.formatted_plan(df)
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_perplexity_split_quantile_plan_has_no_per_lang_sort(spark):
    """The quantile method's 100 TB claim, structurally: NO Window (and
    so no per-language global sort) anywhere in its plan — labeling is a
    broadcast-joined map-side CASE. The ntile anchor, by contrast, must
    carry the Window."""
    from libcolumnfile_spark.operators.text import perplexity_split

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    q_plan = plans.formatted_plan(perplexity_split(docs, method="quantile"))
    assert "Window" not in q_plan
    assert "BroadcastExchange" in q_plan  # two-number-per-lang cuts join
    a_plan = plans.formatted_plan(perplexity_split(docs, method="ntile"))
    assert "Window" in a_plan


def test_contamination_bloom_joins_split_bounded_vs_unbounded(spark):
    """The Bloom screen's 100 TB claim, structurally: the ONLY broadcast
    joins are the k bitset probes (bounded at n_words rows by
    construction); the exact verify against the bench gram set — the
    construction-UNBOUNDED side this operator exists for — and the
    doc_id counts join must be SHUFFLE joins, so a 10^9-gram benchmark
    registry can never ride a size estimate into a driver-OOM
    broadcast. Membership testing itself stays map-side (the corpus
    gram stream reaches a shuffle only as the ~fp-rate candidate
    fraction)."""
    plan = plan_of(spark, "q_contamination_bloom")
    assert "SortMergeJoin" not in plan
    # exactly the 2 bitset probes broadcast — 2 physical nodes since r10:
    # the flagged-gram subtree is materialized ONCE (the counts aggregate
    # carries the candidate hashes, so the verify arm replays from the
    # pinned doc-bounded aggregate instead of re-running the corpus map
    # pipeline). The bench verify must contribute zero BroadcastHashJoins.
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2
    # and the corpus gram pipeline must appear exactly once outside the
    # cache: its Generate/posexplode lives under an InMemoryRelation
    assert "InMemoryRelation" in plan
    # verify (on h, left_semi) + counts-matched rejoin (on doc_id)
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 2


def test_pagerank_dangling_mass_stays_in_plan(spark):
    """The dangling-mass scalar must flow back via a broadcast join of a
    1-row aggregate — never a driver collect (the per-ROUND plan, before
    the eager localCheckpoint hides it) — and the final rank vector must
    be checkpoint-backed (flat plan across rounds)."""
    from libcolumnfile_spark.operators import graph
    from pyspark.sql import functions as F

    edges = graph._doc_host_edges(spark, SF)
    e = edges.groupBy("src", "dst").agg(F.sum("w").cast("double").alias("w"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    outd = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = e.join(outd, "src")
    ranks = nodes.withColumn("r", F.lit(1.0 / 20.0))
    round_plan = plans.formatted_plan(
        graph.pagerank_round(nodes, ew, ranks, 0.85, 20.0)
    )
    assert "BroadcastExchange" in round_plan  # the 1-row dangling mass
    assert "CartesianProduct" not in round_plan
    # the committed query's final vector is checkpoint-backed
    assert "Scan ExistingRDD" in plan_of(spark, "q_pagerank")


def test_dedup_incremental_no_text_in_exchanges(spark):
    """Incremental dedup's exchanges must carry keys only: the raw text
    column may appear below the sig-kernel projection but never in a
    shuffle's output attributes."""
    plan = plan_of(spark, "q_dedup_incremental")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), m.group(0)


def test_dedup_incremental_store_never_broadcast(spark):
    """The docstring's 'the store is NEVER broadcast' claim, enforced:
    the store-side key sets are O(history keys) — construction-unbounded
    — so both history anti-joins must be shuffle joins regardless of
    what post-aggregate size estimates suggest at fixture scale."""
    plan = plan_of(spark, "q_dedup_incremental")
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("ShuffledHashJoin") >= 2  # sig_key + content_hash antis


def test_scd2_merge_is_one_shuffle_join(spark):
    """SCD2's 100 TB claim, structurally: the whole merge is ONE left
    shuffle join of the current slice against the delta (split three
    ways by the change flag) — the delta is a batch of arbitrary size,
    so it must never ride a size estimate into a broadcast, and closed
    history must pass through join-free. (The x10 fixture cannot probe
    this: dimension tables are scale-fixed by design, so the wall ratio
    is ~1 regardless of plan shape.)"""
    import re as _re

    plan = plan_of(spark, "q_scd2_merge")
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    n_shj = len(_re.findall(r"\(\d+\) ShuffledHashJoin", plan))
    # exactly ONE physical join since r10: the three output arms are
    # emitted from a single pass (per-row array + explode), so the
    # shuffle join no longer re-executes per consumer branch
    assert n_shj == 1


def test_vocab_coverage_vocab_is_broadcast(spark):
    """The coverage join's 100 TB claim: the vocabulary side is bounded
    at k rows BY CONSTRUCTION (the one case repo policy allows a forced
    broadcast), so membership testing must be a BroadcastHashJoin over
    the token stream — a shuffle there would key an exchange by token
    over the whole corpus."""
    plan = plan_of(spark, "q_vocab_coverage")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_sample_weighted_is_takeordered_no_exchange(spark):
    """Weighted sampling must plan as a pure map feeding
    TakeOrderedAndProject — zero exchanges at any scale."""
    plan = plan_of(spark, "q_sample_weighted")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange (") == 0


def test_triangle_count_joins_never_broadcast_unbounded_sides(spark):
    """Triangle census at 100 TB, structurally: every hash-join side is
    construction-UNBOUNDED (degree table O(|V|), oriented edge list
    O(m), wedge list O(m^1.5)), so ALL of them must be shuffle joins —
    the only broadcasts are the two 1-row stat aggregates (nested-loop
    cross joins). A size estimate riding any of these onto the
    broadcast path is the containment-style OOM at scale."""
    plan = plan_of(spark, "q_triangle_count")
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) == 4
    assert "BroadcastHashJoin" not in plan
    # exactly the two 1-row aggregates (n_edges, n_triangles) broadcast
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 2
    assert "CartesianProduct" not in plan


def test_kcore_round_semi_joins_shuffle(spark):
    """One k-core peel round (the lazy plan before kcore()'s eager
    localCheckpoint hides it): both alive-set semi-joins must shuffle —
    the alive set is O(|V|) and must never broadcast at scale."""
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.graph import _doc_succ_edges, kcore_round

    e = _doc_succ_edges(spark, SF)
    cur = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter("a <> b")
        .distinct()
    )
    plan = plans.formatted_plan(kcore_round(cur, 4))
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) == 2
    assert "BroadcastHashJoin" not in plan


def test_cdc_apply_single_aggregate_no_join(spark):
    """CDC apply must be ONE struct-max aggregate: no join operator
    anywhere (the max(seq)+join-back form re-shuffles the full log
    twice — measured x10 ratio 7.3 vs 2.4), and exactly one exchange
    pair (partial agg -> shuffle -> final agg) over the unioned log."""
    plan = plan_of(spark, "q_cdc_apply")
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_max" in plan or "HashAggregate" in plan


def test_label_prop_round_joins_shuffle(spark):
    """One label-propagation round (lazy form): the |V|-sized label
    vector joins edges and itself via SHUFFLED joins only — a
    stats-estimated broadcast of the label vector dies at scale."""
    from pyspark.sql import functions as F

    from libcolumnfile_spark.operators.graph import _doc_id_edges

    edges = _doc_id_edges(spark, SF)
    raw = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e = (
        raw.unionByName(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = e.select(F.col("a").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    nb = e.join(
        labels.select(F.col("node").alias("b"), F.col("lbl").alias("nbl")).hint(
            "shuffle_hash"
        ),
        "b",
    )
    new = (
        nb.select(F.col("a").alias("node"), "nbl")
        .join(labels.hint("shuffle_hash"), "node")
        .groupBy("node")
        .agg(F.min(F.least(F.col("lbl"), F.col("nbl"))).alias("lbl"))
    )
    plan = plans.formatted_plan(new)
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) == 2
    assert "BroadcastHashJoin" not in plan


def test_reciprocity_semi_join_never_broadcast(spark):
    """The |E|-vs-|E| reversed-edge semi-join must shuffle."""
    plan = plan_of(spark, "q_reciprocity")
    assert re.search(r"ShuffledHashJoin .*LeftSemi", plan)
    assert "BroadcastHashJoin" not in plan


def test_source_overlap_token_join_shuffles(spark):
    """The vocab-sized (source, token) self-join must shuffle; only the
    bounded size tables may broadcast."""
    plan = plan_of(spark, "q_source_overlap")
    assert re.search(r"ShuffledHashJoin", plan)


def test_adamic_adar_graph_joins_never_broadcast(spark):
    """Every graph-sized side in the AA wedge pipeline (adjacency,
    degree/center table, wedge-vs-edge anti-join) is shuffle_hash-
    pinned; nothing there is construction-bounded, so a broadcast is an
    estimate-riding OOM at scale."""
    plan = plan_of(spark, "q_adamic_adar")
    assert re.search(r"ShuffledHashJoin", plan)
    assert re.search(r"ShuffledHashJoin .*LeftAnti", plan)
    assert "BroadcastHashJoin" not in plan


def test_dsir_log_ratio_join_shuffles(spark):
    """The vocabulary-sized log-ratio table joins back to the token
    stream token-keyed (shuffle_hash); only the 1-row smoothing totals
    may broadcast."""
    plan = plan_of(spark, "q_dsir_weights")
    assert re.search(r"ShuffledHashJoin", plan)


def test_silhouette_single_bounded_exchange(spark):
    """The silhouette kernel is map-only: the ONLY exchanges in the
    plan are the k-row-bounded cluster aggregate's partial/final pair —
    no joins at all."""
    plan = plan_of(spark, "q_silhouette")
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan or "PythonUDF" in plan


def test_corr_matrix_single_row_exchange(spark):
    """The whole correlation matrix rides ONE algebraic aggregate: a
    single partial/final pair over a SinglePartition exchange, explode
    after aggregation, no joins."""
    plan = plan_of(spark, "q_corr_matrix")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg exchange (+AQE read)
    assert re.search(r"Generate .*explode", plan) or "Generate" in plan
