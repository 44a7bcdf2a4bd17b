"""Isolated re-measure (fresh JVM per run, interleaved legs — the
arbiter regime) of the contracts the one-JVM screen flagged as over- or
near-bound, N reps each, loadavg recorded per rep. Output: JSON lines to
_work/contract_remeasure.jsonl.
"""
import json
import os
import subprocess
import sys
import time

QUERIES = [
    # watch-list pass (screen margin < 1.35, not yet isolated)
    "q_kcore", "q_ks_test", "q_bm25_topk", "q_bootstrap_ci",
    "q_reciprocity", "q_winsorize", "q_interarrival", "q_cohort_retention",
    "q_dedup_minhash_verified", "q_equidepth_hist", "q_token_entropy",
    "q_cooc_pmi", "q_negative_sample", "q_split_leakage", "q_source_overlap",
    "q_calibration_bins", "q_sparse_sim", "q_tokenizer_fertility",
] or [
    # screen failures (ratio > bound)
    "q_dedup_soft", "q_gains_curve", "q_ngram_novelty", "q_degree_dist",
    "q_seq_trigrams", "q_event_transitions", "q_kanonymity",
    "q_attribution", "q_mannwhitney", "q_decay_score", "q_auc_roc",
    "q_label_prop", "q_dup_cluster_stats",
    # near-bound (margin <= 1.11)
    "q_dedup_containment", "q_dedup_ngram", "q_record_linkage",
    "q_ewma_forecast", "q_corr_matrix", "q_trend_ols", "q_outlier_iqr",
    "q_inverted_index",
]
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2

out = open("_work/contract_remeasure.jsonl", "a")
for rep in range(REPS):
    for q in QUERIES:
        load0 = os.getloadavg()[0]
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "tools/isolated_ratio.py", q],
            cwd="/root/repo", capture_output=True, text=True, timeout=600,
        )
        rec = {"name": q, "rep": rep, "load_before": round(load0, 2),
               "load_after": round(os.getloadavg()[0], 2),
               "wall": round(time.time() - t0, 1)}
        if proc.returncode == 0:
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if line:
                rec.update(json.loads(line[-1]))
        else:
            rec["error"] = proc.stderr[-300:]
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(json.dumps(rec), flush=True)
print("DONE")
