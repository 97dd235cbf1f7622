#!/usr/bin/env python3
"""Rebuild BENCH_BANDS.json from a source-window list.

Band rule (reverse-derived from the committed r16 file and used since):
for every query key, band = [min, max] of the per-window MIN values
across the sources that carry the key; n = how many sources carry it.
Wrapper-shaped driver artifacts (BENCH_rN.json with a `tail`) contribute
via the min map recovered from the tail when parsable.

Usage: tools/update_bands.py <source.json> [<source.json> ...]
Writes BENCH_BANDS.json in place with the given sources (newest first,
as passed). Only non-suspect windows should be passed.
"""
import json
import re
import sys


def mins_of(path):
    with open(path) as f:
        doc = json.load(f)
    qs = doc.get("queries")
    if qs:
        out = dict(qs)
        # headline annotate/canary rows band too (suspect calibration);
        # annotate_4core is a different session config — never banded
        for k, v in (doc.get("headline", {}).get("samples") or {}).items():
            if k != "annotate_4core":
                out[k] = v["min"]
        return out
    tail = doc.get("tail")
    if tail:
        # recover whatever the truncated tail kept of the final min map;
        # require a terminator after the number so a float whose trailing
        # digits were cut off by the truncation can never band (it would
        # feed a silently-low min into the suspect rule)
        m = re.findall(r'"(q[\w]+|annotate_\w+|canary_cpu)":([0-9.]+)[,}]', tail)
        return {k: float(v) for k, v in m
                if k not in ("annotate_4core", "q_triplets_min")}
    return {}


def main(sources):
    if not sources:
        sys.exit("update_bands: no sources given — refusing to clobber "
                 "BENCH_BANDS.json (the op-row suspect rule would go blind)")
    bands = {}
    for p in sources:
        for k, v in mins_of(p).items():
            lo, hi, n = bands.get(k, (v, v, 0))
            bands[k] = (min(lo, v), max(hi, v), n + 1)
    if not bands:
        sys.exit("update_bands: sources yielded 0 bands — refusing to write "
                 "an empty BENCH_BANDS.json")
    doc = {
        "bands": {k: {"min": round(lo, 3), "max": round(hi, 3), "n": n}
                  for k, (lo, hi, n) in sorted(bands.items())},
        "sources": sources,
    }
    with open("BENCH_BANDS.json", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(bands)} bands from {len(sources)} sources")


if __name__ == "__main__":
    main(sys.argv[1:])
