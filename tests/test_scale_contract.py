"""Scale-contract tests: wall-clock growth at x10 the data must stay
sub-linear for map-only operators (idle cores absorb rows) and well
under quadratic for pair-generating operators (blocking/banding bounds
the product). A superlinear regression — a lost broadcast, a filter no
longer pushed below a self-join, a bucket scheme silently degrading to
all-pairs — shows up here as a ratio blowout long before anyone points
the engine at real data.

Bounds are measured sf0.1->x10 ratios (BASELINE.md scale probes) plus
headroom for host noise; a true quadratic regression lands at ~10x+ the
bound, so flakiness and regressions are far apart. Ratios compare two
runs on the SAME host seconds apart, which cancels most contention.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from libcolumnfile_spark.registry import REGISTRY

from tools.scale_probe import BASE, best2, ensure_x10

# query -> (measured x10 ratio, contract bound)
# Re-measured 2026-08-14 after the split-layout cache landed (scans are
# natively parallel at BOTH scales now, so baselines dropped and the old
# spread-exchange constant no longer pads t1): most ratios fell well
# under 2. Bounds are the fresh measurements plus ~2x headroom. Queries
# whose sf0.1 base sits at the scheduling floor (<0.15 s) carry wider
# bounds — their ratio denominator is mostly fixed cost, so the ratio is
# noisy even when absolute x10 time is tiny.
CONTRACTS = {
    # map-only: rows ride otherwise-idle cores
    "q_fingerprint_winnow": (1.4, 3.0),
    "q_token_count": (6.1, 9.0),  # t1=0.11s floor; x10 absolute 0.7 s
    # pair-generating: blocking/banding bounds the quadratic term
    "q_dedup_ngram": (4.6, 7.0),
    "q_dedup_cc": (1.6, 3.5),
    "q_sim_pairs": (2.1, 4.5),
    # shuffle-bound round-3 operators: one or two hash/sort exchanges,
    # no pair generation — growth must stay near-linear
    "q_dedup_passage": (1.1, 2.5),
    "q_tfidf": (2.9, 4.0),        # t1 fell with bytes-keyed DOP (x10 absolute ~2.1 s, unchanged)
    "q_inverted_index": (2.4, 4.0),  # same denominator shift (x10 absolute ~1.4 s)
    "q_sim_knn": (1.2, 3.0),      # broadcast queries: corpus map-side
    "q_sessionize": (3.1, 4.5),   # x10 events = 10x distinct users; t1 fell with coarse layout + bytes-keyed DOP, lifting the measured ratio (x10 absolute ~1.0 s)
    # percent_rank partitions by language (5 values) — parallelism is
    # capped at n_langs, so x10 concentrates on 5 sorted runs; still
    # bounded-linear, just with a worse constant than hash-partitioned
    # shapes (at real scale: per-lang quantile THRESHOLD + filter is the
    # unbounded-cardinality variant)
    "q_quality_filter": (4.7, 7.0),
    # TPC-H pack representatives (facts replicate x10 with a shared
    # orderkey shift, dims fixed — tools/scale_probe.py FACT_COLS):
    # broadcast-dim star joins and stacked aggregates must stay flat
    "q_tpch_q1": (2.0, 3.5),    # one partial/final agg, 6 groups
    "q_tpch_q5": (1.5, 3.0),    # 6-table chain, size-measured dims
    "q_tpch_q13": (1.3, 3.0),   # outer join + stacked aggs on customer
    "q_histogram": (1.2, 2.5),  # map-side bucket, O(buckets) shuffle
    "q_tpch_q3": (3.3, 4.5),    # fact scan + 2 broadcast dims + group; t1 fell 0.45->0.28 with bytes-keyed DOP, x10 absolute unchanged (~0.9 s)
    "q_tpch_q2": (0.8, 2.5),    # semi-filtered pair-distinct + window
    "q_tpch_q21": (1.8, 3.5),   # two stacked aggs, 2 narrow shuffles
    "q_tpch_q16": (0.9, 2.5),   # pair-distinct + count_distinct
    # corpus mixing: pure map (+ tiny count shuffle)
    "q_mix_weighted": (1.1, 3.0),
    "q_upsample_repeat": (1.2, 3.5),  # t1=0.05s floor
    # event analytics + versioning + data quality
    "q_funnel": (1.0, 3.0),          # one event shuffle, 3 window passes
    "q_upsert_merge": (1.1, 3.0),    # anti-join on the key
    "q_snapshot_diff": (1.1, 3.0),   # one full-outer key join
    "q_profile_columns": (1.3, 3.0), # per-column partial/final aggs
    "q_dq_constraints": (2.4, 4.0),  # counts + anti-joins
    # round-4/5 operators
    "q_bpe_train": (0.9, 2.5),       # vocabulary-bounded: flat by design
    "q_bpe_segment": (1.2, 3.0),     # frozen merges, map-only encode
    "q_boilerplate": (2.3, 4.5),     # chunk df count + reassembly
    "q_gopher_rules": (1.1, 3.0),    # map-only Catalyst pass
    "q_sim_pq": (1.6, 3.0),          # Lloyd rounds bounded by m*ksub
    "q_media_decode": (2.9, 5.0),    # per-row codec work rides idle cores
    "q_media_resize_real": (1.9, 3.5),
    # gap_fill's OUTPUT grows with the data (x10 users => x10 dense grid
    # rows) — wall-clock tracks output size by construction; the contract
    # bounds per-output-row cost staying flat
    "q_gap_fill": (5.4, 8.0),  # t1 halved r4->r5 (layout+plan memo), so the output-bound growth reads as a higher ratio
}


@pytest.fixture(scope="module")
def x10(spark):
    return ensure_x10(spark)


@pytest.mark.parametrize("name", sorted(CONTRACTS))
def test_x10_ratio_contract(spark, x10, name):
    fn = REGISTRY[name].spark_fn

    def run(d):
        spark.catalog.clearCache()
        fn(spark, d).write.mode("overwrite").format("noop").save()

    t1 = best2(lambda: run(BASE))
    t10 = best2(lambda: run(x10))
    _measured, bound = CONTRACTS[name]
    ratio = t10 / t1
    assert ratio <= bound, (
        f"{name}: x10 wall-clock ratio {ratio:.2f} exceeds contract "
        f"{bound} (sf0.1 {t1:.2f}s -> x10 {t10:.2f}s) — superlinear "
        "regression (lost broadcast / degraded blocking / new shuffle?)"
    )
