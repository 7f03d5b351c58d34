#!/usr/bin/env python3
"""Round-19 optimization: final battery vs BASELINE.md quiet round-19 medians.

Usage: bench_compare_r19.py run1.json run2.json [run3.json ...]
Prints per-leg baseline median, battery median, battery min, and ratios.
"""
import json
import statistics
import sys

# BASELINE.md round-19 quiet-local medians (two in-band-sentinel runs,
# taken on this box one day before the optimization round).
BASELINE = {
    "ann_topk": 0.171, "asof_join": 0.338, "bm25_adhoc": 0.855,
    "bm25_indexed": 0.547, "bytebpe_tokcount": 3.159, "compaction": 1.036,
    "containment": 2.806, "drift_monitors": 2.760, "event_analytics": 1.202,
    "event_graph": 1.498, "events_window": 0.257, "insert": 1.083,
    "insert_bucketed": 1.836, "insert_domain": 4.069, "insert_super": 6.479,
    "jaccard_guarded": 2.729, "jaccard_neardup": 3.248, "kmeans_step": 0.480,
    "knn_delta": 0.587, "knn_graph": 2.274, "knn_query": 0.413,
    "minhash_guarded": 1.788, "minhash_lsh": 1.825, "phrase_indexed": 0.258,
    "rangeslice": 1.446, "rangeslice_super": 1.899, "read": 0.551,
    "read_bucketed": 0.887, "read_domain": 0.456,
    "read_domain_bucketed": 0.742, "read_gaussian": 0.595,
    "read_gaussian_cached": 0.379, "read_gaussian_deep": 0.657,
    "read_gaussian_deep_cached": 0.365, "read_sidecar": 0.317,
    "read_super": 0.936, "reconcile_scan": 1.153, "sessionize": 0.435,
    "sketches": 1.560, "window_join": 0.489, "window_join_keyed": 0.429,
    "window_join_rank": 0.963, "wordpiece_encode": 0.879,
    "wordpiece_segment": 0.542, "zorder_seek": 0.258,
}

def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f)["queries"])
    # intersect leg sets across runs (ADVICE r19: a later run missing a
    # leg present in run 1 raised KeyError), keep run-1 order
    common = set(runs[0])
    for r in runs[1:]:
        common &= set(r)
    legs = [l for l in runs[0] if l in common]
    print(f"{'leg':28s} {'base':>6s} {'med':>6s} {'min':>6s} {'med/b':>6s} {'min/b':>6s}")
    tot_b = tot_m = tot_n = 0.0
    for leg in legs:
        vals = [r[leg] for r in runs]
        med = statistics.median(vals)
        mn = min(vals)
        b = BASELINE.get(leg)
        if b is None:
            # not in BASELINE: shown, but excluded from EVERY total so the
            # 'TOTAL (common legs)' ratios stay like-for-like (ADVICE r19)
            print(f"{leg:28s} {'--':>6s} {med:6.3f} {mn:6.3f}")
            continue
        tot_m += med
        tot_n += mn
        tot_b += b
        print(f"{leg:28s} {b:6.3f} {med:6.3f} {mn:6.3f} {med/b:6.2f} {mn/b:6.2f}")
    print(f"{'TOTAL (common legs)':28s} {tot_b:6.2f} {tot_m:6.2f} {tot_n:6.2f} "
          f"{tot_m/tot_b:6.2f} {tot_n/tot_b:6.2f}")

if __name__ == "__main__":
    main(sys.argv[1:])
