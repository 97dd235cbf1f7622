#!/usr/bin/env python3
"""Compare two bench snapshots on their shared per-query MIN maps:
geomean ratio (new/old), worst movers, and headline rows.

Usage: python3 tools/bench_compare.py NEW.json OLD.json [threshold]

Accepts all three artifact shapes:
  - BENCH_LOCAL_r*.json        — one JSON doc, "queries" + "headline";
  - driver BENCH_r*.json       — pretty-printed doc with the headline
    under "parsed.headline" and the query-min map only inside the raw
    (possibly front-truncated) "tail" stdout string;
  - a bare tail capture        — first line is the {"queries": ...} doc.

Windows on this host drift uniformly 1.05-1.2x, so the geomean over all
shared keys is the window-drift estimate; per-query ratios are only
meaningful RELATIVE to it (see BENCH_AB_r0*.md for the interleaved A/B
method that settles absolute questions).
"""
import json
import math
import re
import sys


def load(path):
    # json.load, not readline(): driver BENCH_r*.json is pretty-printed
    # over many lines (ADVICE r13). Line-oriented fallback covers a raw
    # multi-line stdout tail whose FIRST line is the queries doc.
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
        raise SystemExit(f"{path}: no parseable JSON document found")


def query_mins(doc):
    """Per-query min map from any artifact shape."""
    for q in (doc.get("queries"),
              (doc.get("parsed") or {}).get("queries")):
        if q:
            return q
    # driver artifact: the min map lives inside the raw "tail" stdout
    # string, often truncated at the FRONT (capture window), so a plain
    # json parse of the queries line can't work — regex the pairs out,
    # after dropping the headline line (its q_*_min keys aren't mins of
    # queries named that way).
    tail = doc.get("tail", "")
    body = "\n".join(l for l in tail.splitlines()
                     if not l.lstrip().startswith('{"headline"'))
    # annotate_* rows are first-class members of the queries map — a
    # q-only pattern would silently change the geomean's composition
    # versus a parsed-artifact comparison of the same runs
    pairs = re.findall(r'"((?:q|annotate_)[0-9A-Za-z_]*)"\s*:\s*([0-9.]+)', body)
    return {k: float(v) for k, v in pairs}


def headline(doc):
    """Headline rows may sit top-level (full artifact), under
    "headline" (one-doc local artifact), or under "parsed.headline"
    (driver tail capture)."""
    return {**(doc.get("parsed") or {}).get("headline", {}),
            **doc.get("headline", {}),
            **doc}


def main():
    new_doc = load(sys.argv[1])
    old_doc = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    # degrade, don't crash: a headline-only tail artifact has no
    # query-min map, and two disjoint snapshots share no keys
    new_q, old_q = query_mins(new_doc), query_mins(old_doc)
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
    new_h, old_h = headline(new_doc), headline(old_doc)
    for key in ("docs_per_sec", "docs_per_sec_80k_dict", "docs_per_sec_1m_dict",
                "docs_per_sec_5k_mixed", "docs_per_sec_80k_mixed",
                "docs_per_sec_4core", "stored_rdds", "suspect"):
        a, b = new_h.get(key), old_h.get(key)
        if a is not None or b is not None:
            print(f"{key:26s} new {a!s:>10}  old {b!s:>10}")
    # self-adjudication detail (r14 artifacts): per-headline-row
    # median/min dispersion — >2 on any row sets suspect
    ns, os_ = new_h.get("samples", {}), old_h.get("samples", {})
    if ns or os_:
        print("\nheadline sample dispersion (med/min; >2 => suspect):")
        for row in sorted(set(ns) | set(os_)):
            a = ns.get(row, {}).get("disp")
            b = os_.get(row, {}).get("disp")
            print(f"  {row:24s} new {a!s:>6}  old {b!s:>6}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing the pipe is not an error
        pass
