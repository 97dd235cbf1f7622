#!/usr/bin/env python3
"""Compare two BENCH_LOCAL*.json snapshots on their shared per-query
MIN maps: geomean ratio (new/old), worst movers, and headline rows.

Usage: python3 tools/bench_compare.py NEW.json OLD.json [threshold]

Windows on this host drift uniformly 1.05-1.2x, so the geomean over all
shared keys is the window-drift estimate; per-query ratios are only
meaningful RELATIVE to it (see BENCH_AB_r0*.md for the interleaved A/B
method that settles absolute questions).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        doc = json.loads(f.readline())
    return doc


def main():
    new_doc = load(sys.argv[1])
    old_doc = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    # degrade, don't crash: a headline-only tail artifact has no
    # "queries" map, and two disjoint snapshots share no keys
    new_q, old_q = new_doc.get("queries", {}), old_doc.get("queries", {})
    shared = sorted(set(new_q) & set(old_q))
    ratios = {k: new_q[k] / old_q[k] for k in shared
              if old_q[k] > 0 and new_q[k] > 0}
    if ratios:
        geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
        print(f"shared mins: {len(ratios)}   geomean new/old: {geo:.3f}")
        print(f"\nper-query ratios above {thr} (raw, not drift-normalized):")
        for k, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
            if r > thr:
                print(f"  {k:28s} {r:.2f}  ({old_q[k]:.3f}s -> {new_q[k]:.3f}s)")
        print(f"\nbest improvements (< 1/{thr:.2f}):")
        for k, r in sorted(ratios.items(), key=lambda kv: kv[1]):
            if r < 1 / thr:
                print(f"  {k:28s} {r:.2f}  ({old_q[k]:.3f}s -> {new_q[k]:.3f}s)")
    else:
        print("no shared positive-min query keys between the two "
              "snapshots (headline-only artifact?) — headline rows only:")
    # headline rows may sit top-level (full artifact) or nested under
    # "headline" (driver tail capture of the final stdout line)
    new_h = {**new_doc.get("headline", {}), **new_doc}
    old_h = {**old_doc.get("headline", {}), **old_doc}
    for key in ("docs_per_sec", "docs_per_sec_80k_dict", "docs_per_sec_1m_dict",
                "docs_per_sec_5k_mixed", "docs_per_sec_80k_mixed",
                "docs_per_sec_4core", "stored_rdds", "suspect"):
        a, b = new_h.get(key), old_h.get(key)
        if a is not None or b is not None:
            print(f"{key:26s} new {a!s:>10}  old {b!s:>10}")


if __name__ == "__main__":
    main()
