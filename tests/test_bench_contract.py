"""Contract tests for bench.py's stdout line: the driver tail-captures
exactly the LAST 2000 chars of stdout (measured from BENCH_r01/r02) and
json-parses the final line, so the emitted line must stay under 1800
chars for ANY registry size. No Spark needed — pure formatting logic.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_payload, format_bench_line


def _fake_timings(n: int) -> dict[str, float]:
    return {f"q_some_longish_query_name_{i:03d}": round(0.1 + i * 0.01, 3) for i in range(n)}


def test_line_parses_and_fits_small():
    payload = bench_payload(_fake_timings(10), 0.1)
    line = format_bench_line(payload)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["metric"] == "total_declared_query_wall"
    assert d["sf"] == 0.1
    assert len(d["queries"]) == 10
    assert "queries_omitted" not in d


def test_line_fits_huge_registry():
    # 400 queries would blow the tail budget; the slowest must survive
    payload = bench_payload(_fake_timings(400), 0.1)
    line = format_bench_line(payload)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["queries_omitted"] > 0
    assert len(d["queries"]) + d["queries_omitted"] == 400
    # kept entries are the slowest ones (the signal, not the floor)
    kept_min = min(d["queries"].values())
    dropped = 400 - len(d["queries"])
    assert kept_min >= 0.1 + dropped * 0.01 - 1e-9
    # total still reflects ALL queries
    assert abs(d["value"] - round(sum(_fake_timings(400).values()), 3)) < 1e-6


def test_total_is_sum_of_all():
    t = _fake_timings(100)
    payload = bench_payload(t, 0.01)
    assert payload["value"] == round(sum(t.values()), 3)


def test_omitted_sec_accounts_for_total():
    payload = bench_payload(_fake_timings(400), 0.1)
    d = json.loads(format_bench_line(payload))
    assert abs(d["value"] - (sum(d["queries"].values()) + d["omitted_sec"])) < 0.01


def test_real_registry_size_fits_window():
    # 110 queries at realistic name lengths — the actual failure mode of
    # rounds 1 and 2 (104 queries -> >2000 chars)
    payload = bench_payload(_fake_timings(110), 0.1)
    line = format_bench_line(payload)
    assert len(line) <= 1800
    json.loads(line)


def test_cache_hygiene_detects_leaks(spark):
    """assert_cache_hygiene passes on a clean session, fails when a
    sweep accumulates un-released persists (the leak mode it guards)."""
    import pytest

    from bench import _HYGIENE_LIMIT, assert_cache_hygiene

    spark.catalog.clearCache()
    assert_cache_hygiene(spark, "clean")  # must not raise

    # distinct range lengths: identical-canonical plans would dedupe to
    # ONE CacheManager entry (renamed columns canonicalize away).
    # Referenced in `leaked`, these survive the guard's GC-retry — a
    # true leak, sized just past the residency allowance.
    leaked = [
        spark.range(100 + i).persist() for i in range(_HYGIENE_LIMIT + 4)
    ]
    for df in leaked:
        df.count()
    try:
        with pytest.raises(RuntimeError, match="cache hygiene"):
            assert_cache_hygiene(spark, "leaky")
    finally:
        for df in leaked:
            df.unpersist(blocking=True)
    spark.catalog.clearCache()
    assert_cache_hygiene(spark, "clean-again")


def test_probe_block_compacts_on_stdout():
    """The contention-probe series/suspect lists go to the file dump;
    stdout carries only the compact verdict (floor, drift, counts) so a
    long sweep's probe series can't blow the 1800-char tail budget."""
    payload = bench_payload(_fake_timings(10), 0.1)
    payload["probe"] = {
        "floor_sec": 0.08,
        "series": [round(0.08 + i * 0.001, 4) for i in range(40)],
        "max_drift": 1.49,
        "suspect": [f"q_some_longish_query_name_{i:03d}" for i in range(40)],
        "remeasured": ["q_some_longish_query_name_001"],
        "resweep": [f"q_some_longish_query_name_{i:03d}" for i in range(24)],
        "insweep": {f"q_some_longish_query_name_{i:03d}": 9.9 for i in range(24)},
        "clean": True,
    }
    line = format_bench_line(payload)
    assert len(line) <= 1800
    d = json.loads(line)
    assert d["probe"] == {
        "floor_sec": 0.08,
        "max_drift": 1.49,
        "clean": True,
        "suspect_n": 40,
        "remeasured_n": 1,
        "resweep_n": 24,
    }
    # original payload untouched (the file dump keeps the full series)
    assert len(payload["probe"]["series"]) == 40
    assert len(payload["probe"]["insweep"]) == 24


def test_resweep_candidates_head_and_top():
    """The end-of-sweep re-measure set: slowest TOP_K plus the first
    HEAD_N sweep positions (global JVM warm-up absorbers), >= MIN_SEC,
    deduplicated, slowest-first."""
    from bench import (
        _RESWEEP_HEAD_N,
        _RESWEEP_MIN_SEC,
        _RESWEEP_TOP_K,
        _resweep_candidates,
    )

    order = [f"q_{i:03d}" for i in range(60)]
    # fast head, one slow mid-sweep spike, gently rising tail
    timings = {n: 0.1 + i * 0.01 for i, n in enumerate(order)}
    timings["q_001"] = 3.0   # head position AND top-k (dedup check)
    timings["q_030"] = 9.0   # mid-sweep spike
    cands = _resweep_candidates(timings, order)
    assert cands[0] == "q_030"  # slowest first
    assert "q_001" in cands and cands.count("q_001") == 1
    assert len(cands) <= _RESWEEP_TOP_K + _RESWEEP_HEAD_N
    # nothing below the floor threshold
    assert all(timings[n] >= _RESWEEP_MIN_SEC for n in cands)
    # fast head positions (0.1-0.17 s) are NOT dragged in
    assert "q_000" not in cands


def test_stdout_tail_is_fixed_top_n():
    """r11 / VERDICT r10 item 6: the printed per-query set is the slowest
    _STDOUT_TOP_N with name tie-breaking — NOT 'whatever fits the char
    budget' — so a query that merely got faster relative to others cannot
    silently appear/disappear with the budget. Perturbing timings OUTSIDE
    the top-N must not change the printed set."""
    import json as _json

    from bench import _STDOUT_TOP_N, bench_payload, format_bench_line

    n = 278
    timings = {f"q_{i:03d}": 2.0 - i * 0.005 for i in range(n)}
    d1 = _json.loads(format_bench_line(bench_payload(timings, 0.1)))
    assert len(d1["queries"]) == _STDOUT_TOP_N
    assert d1["queries_omitted"] == n - _STDOUT_TOP_N
    # perturb entries far below the cutoff: printed set must be identical
    for i in range(200, 278):
        timings[f"q_{i:03d}"] *= 0.5
    d2 = _json.loads(format_bench_line(bench_payload(timings, 0.1)))
    assert set(d1["queries"]) == set(d2["queries"])
    # ties broken deterministically by name
    tied = {f"q_{i:03d}": 1.0 for i in range(n)}
    da = _json.loads(format_bench_line(bench_payload(tied, 0.1)))
    db = _json.loads(format_bench_line(bench_payload(dict(reversed(list(tied.items()))), 0.1)))
    assert list(da["queries"]) == list(db["queries"]) == sorted(tied)[:_STDOUT_TOP_N]


def test_value_insweep_restores_raw_total():
    """r11 / ADVICE r10: the raw in-sweep sum rides the payload as a
    first-class field; value (cleaned) <= value_insweep (raw) and the
    difference is exactly the insweep replacements."""
    # simulated: main() computes value_insweep from timings + insweep;
    # replicate its arithmetic here against bench_payload
    from bench import bench_payload

    timings = {"q_a": 1.0, "q_b": 2.0, "q_c": 0.5}
    insweep = {"q_b": 3.5}  # q_b was resweep-replaced from 3.5 -> 2.0
    payload = bench_payload(timings, 0.1)
    raw = dict(timings)
    raw.update(insweep)
    payload["value_insweep"] = round(sum(raw.values()), 3)
    assert payload["value"] == 3.5
    assert payload["value_insweep"] == 5.0
