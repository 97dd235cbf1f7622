#!/usr/bin/env python3
"""Compare bench snapshots on their shared per-query MIN maps:
geomean ratio (new/old), worst movers, and headline rows.

Usage:
  python3 tools/bench_compare.py NEW.json OLD.json [threshold]
  python3 tools/bench_compare.py NEW.json OLD1.json OLD2.json ... [slack]
      Band mode (>=2 olds): per-query (min-max) band over the old
      windows; a mover is flagged only when it falls OUTSIDE the band
      AND beyond what the window geomean (uniform drift) explains —
      the COVERAGE.md protocol step 2, as one command. The trailing
      number (default 1.2 — the same per-query noise threshold the
      two-way mode prints at; quiet-host mins jitter up to ~1.2x)
      widens the drift bound multiplicatively.
  python3 tools/bench_compare.py --write-bands BENCH_BANDS.json A.json B.json ...
      Regenerate the committed per-query band file from the listed
      clean windows (min/max over ALL listed artifacts).

Accepts all three artifact shapes:
  - BENCH_LOCAL_r*.json        — one JSON doc, "queries" + "headline";
  - driver BENCH_r*.json       — pretty-printed doc with the headline
    under "parsed.headline" and the query-min map only inside the raw
    (possibly front-truncated) "tail" stdout string;
  - a bare tail capture        — first line is the {"queries": ...} doc.

Windows on this host drift uniformly 1.05-1.2x, so the geomean over all
shared keys is the window-drift estimate; per-query ratios are only
meaningful RELATIVE to it (see BENCH_AB_r0*.md for the interleaved A/B
method that settles absolute questions). When both sides carry the
canary_cpu headline row (r15+ artifacts: a fixed-work, code-independent
CPU loop), its min ratio is pure host speed — the canary-normalized
geomean divides it out, so "1.1x slower everywhere INCL. the canary"
reads HOST at a glance (the dispersion detector is blind to uniform
contention).
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


# headline-only keys that must never be harvested as query mins: the
# headline object's q_triplets_min is not a min of a query named that
# way, and its samples sub-objects carry min/med/max floats keyed by
# annotate_* names (ADVICE r14: a tail window that begins MID-headline-
# line defeats a startswith() filter).
_HEADLINE_MARKERS = ('"q_triplets_min"', '"samples":', '"headline"')


def _tail_body(doc):
    """The raw stdout tail with headline lines dropped. A PARTIAL
    headline line (window begins mid-line) no longer startswith
    '{"headline"' — drop any line carrying a headline-only marker key
    instead (ADVICE r14)."""
    tail = doc.get("tail", "")
    return "\n".join(l for l in tail.splitlines()
                     if not any(m in l for m in _HEADLINE_MARKERS))


_PAIR_RE = r'"((?:q|annotate_)[0-9A-Za-z_]*)"\s*:\s*([0-9.]+)'


def query_mins(doc):
    """Per-query min map from any artifact shape."""
    for q in (doc.get("queries"),
              (doc.get("parsed") or {}).get("queries")):
        if q:
            return q
    # driver artifact: the min map lives inside the raw "tail" stdout
    # string, often truncated at the FRONT (capture window), so a plain
    # json parse of the queries line can't work — regex the pairs out.
    # The big line carries three per-query maps — queries_median,
    # queries_disp (r15+), and the MIN map "queries" LAST. When the min
    # map's opener survived the front-truncation, harvest only after it
    # so a cut INSIDE the min map can't fall back to median/disp values
    # for the missing keys (a disp ~1.0 reads as a plausible 1-second
    # min). Without the opener the surviving text IS the min-map tail.
    body = _tail_body(doc)
    idx = body.rfind('"queries":')
    if idx >= 0:
        body = body[idx:]
    # annotate_* rows are first-class members of the queries map — a
    # q-only pattern would silently change the geomean's composition
    # versus a parsed-artifact comparison of the same runs
    pairs = re.findall(_PAIR_RE, body)
    return {k: float(v) for k, v in pairs}


def query_disps(doc):
    """Per-query dispersion map (r15+ artifacts), {} when absent.
    Driver tail artifacts carry it only inside the raw tail text —
    harvest the span between its opener and the min map's opener, so
    the mover disp annotation works on exactly the artifact shape used
    for round adjudication."""
    parsed = (doc.get("queries_disp")
              or (doc.get("parsed") or {}).get("queries_disp"))
    if parsed:
        return parsed
    body = _tail_body(doc)
    i = body.find('"queries_disp":')
    if i < 0:
        return {}
    j = body.find('"queries":', i)
    seg = body[i:j if j >= 0 else len(body)]
    return {k: float(v) for k, v in re.findall(_PAIR_RE, seg)}


def headline(doc):
    """Headline rows may sit top-level (full artifact), under
    "headline" (one-doc local artifact), or under "parsed.headline"
    (driver tail capture)."""
    return {**(doc.get("parsed") or {}).get("headline", {}),
            **doc.get("headline", {}),
            **doc}


def canary_min(doc):
    s = headline(doc).get("samples", {})
    return (s.get("canary_cpu") or {}).get("min")


def committed_canary_band(path="BENCH_BANDS.json"):
    """The committed canary_cpu quiet band (r15 board #2: previously it
    lived only in BENCH_AB prose, so the first branch of every
    adjudication — "is the canary elevated?" — needed a human to recall
    the band). Looks next to the cwd first, then next to the repo root
    this tool lives in."""
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for p in (path, os.path.join(here, "..", path)):
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        band = (doc.get("bands") or {}).get("canary_cpu")
        if band:
            return band
    return None


def print_canary_vs_band(cn):
    """One line adjudicating the new window's canary against the
    COMMITTED quiet band — meaningful even when the old windows are
    themselves suspect (the r15 trap: 'vs old-window median' inherits
    the old windows' contamination)."""
    band = committed_canary_band()
    if cn is None or band is None:
        return
    lo, hi = band["min"], band["max"]
    if cn <= hi:
        verdict = "QUIET (host comparable to the committed clean windows)"
    elif cn <= hi * 1.4:
        # documented quiet-host canary jitter: BENCH_AB_r15 §1 observed
        # quiet readings up to ~1.4x the full-suite band (0.205 vs
        # 0.148 on short headline-only runs); the real burner landed at
        # 1.63x — the gray zone defers to the dispersion evidence
        verdict = (f"MILDLY ELEVATED {cn / hi:.2f}x over band-max — within "
                   "documented quiet-host jitter (<=1.4x); corroborate "
                   "with the dispersion rows before calling HOST")
    else:
        verdict = (f"ELEVATED {cn / hi:.2f}x over band-max — HOST load; "
                   "read the canary-normalized geomean, not raw ratios")
    print(f"canary min {cn:.3f} vs committed quiet band {lo:.3f}-{hi:.3f} "
          f"(n={band['n']}): {verdict}")


def geomean(ratios):
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def fmt_disp(d, key):
    v = d.get(key)
    return f"  disp {v:.2f}" if isinstance(v, (int, float)) and v > 0 else ""


def print_headlines(new_doc, old_doc):
    new_h, old_h = headline(new_doc), headline(old_doc)
    for key in ("docs_per_sec", "docs_per_sec_80k_dict", "docs_per_sec_1m_dict",
                "docs_per_sec_5k_mixed", "docs_per_sec_80k_mixed",
                "docs_per_sec_4core", "stored_rdds", "op_over_band", "suspect"):
        a, b = new_h.get(key), old_h.get(key)
        if a is not None or b is not None:
            print(f"{key:26s} new {a!s:>10}  old {b!s:>10}")
    # self-adjudication detail (r14 artifacts): per-headline-row
    # median/min dispersion — >2 on any annotate row sets suspect;
    # canary_cpu (r15) is the host-speed row, never consulted by suspect
    ns, os_ = new_h.get("samples", {}), old_h.get("samples", {})
    if ns or os_:
        print("\nheadline sample dispersion (med/min; >2 on an annotate "
              "row => suspect; canary_cpu min = host speed):")
        for row in sorted(set(ns) | set(os_)):
            a = ns.get(row, {}).get("disp")
            b = os_.get(row, {}).get("disp")
            print(f"  {row:24s} new {a!s:>6}  old {b!s:>6}")


def compare_two(new_doc, old_doc, thr):
    # degrade, don't crash: a headline-only tail artifact has no
    # query-min map, and two disjoint snapshots share no keys
    new_q, old_q = query_mins(new_doc), query_mins(old_doc)
    new_d = query_disps(new_doc)
    shared = sorted(set(new_q) & set(old_q))
    ratios = {k: new_q[k] / old_q[k] for k in shared
              if old_q[k] > 0 and new_q[k] > 0}
    if ratios:
        geo = geomean(ratios.values())
        print(f"shared mins: {len(ratios)}   geomean new/old: {geo:.3f}")
        cn, co = canary_min(new_doc), canary_min(old_doc)
        if cn and co:
            print(f"canary min new/old: {cn / co:.3f}   "
                  f"canary-normalized geomean: {geo / (cn / co):.3f}")
        print_canary_vs_band(cn)
        print(f"\nper-query ratios above {thr} (raw, not drift-normalized):")
        for k, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
            if r > thr:
                print(f"  {k:28s} {r:.2f}  ({old_q[k]:.3f}s -> "
                      f"{new_q[k]:.3f}s){fmt_disp(new_d, k)}")
        print(f"\nbest improvements (< 1/{thr:.2f}):")
        for k, r in sorted(ratios.items(), key=lambda kv: kv[1]):
            if r < 1 / thr:
                print(f"  {k:28s} {r:.2f}  ({old_q[k]:.3f}s -> "
                      f"{new_q[k]:.3f}s){fmt_disp(new_d, k)}")
    else:
        print("no shared positive-min query keys between the two "
              "snapshots (headline-only artifact?) — headline rows only:")
    print_headlines(new_doc, old_doc)


def band_over(docs):
    """Per-query (values list) over preloaded `(path, doc)` pairs,
    keyed over every query any of them carries."""
    vals = {}
    for _, doc in docs:
        for k, v in query_mins(doc).items():
            if v > 0:
                vals.setdefault(k, []).append(v)
    return vals


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def compare_band(new_doc, old_paths, slack):
    new_q = {k: v for k, v in query_mins(new_doc).items() if v > 0}
    new_d = query_disps(new_doc)
    old_docs = [(p, load(p)) for p in old_paths]
    vals = band_over(old_docs)
    band = {k: (min(v), max(v), len(v)) for k, v in vals.items()}
    shared = sorted(set(new_q) & set(band))
    if not shared:
        print("no shared query keys with any old window")
        return
    fresh = sorted(set(new_q) - set(band))
    if fresh:
        # no silent drops: a first-round row has no band to adjudicate
        # against — name it so the reader knows it was skipped, not clean
        print("new keys without a band (not adjudicated this window): " +
              ", ".join(f"{k} ({new_q[k]:.3f}s)" for k in fresh))
    # window drift estimate: geomean of new vs the per-query MEDIAN of
    # the olds' mins — the (min+max)/2 midpoint moves by half of any
    # single contaminated window's displacement, which is exactly the
    # episode this tool adjudicates; the median ignores one outlier
    # window entirely
    ratios = {k: new_q[k] / median(vals[k]) for k in shared}
    geo = geomean(ratios.values())
    print(f"band mode: {len(old_paths)} old windows, {len(shared)} shared keys"
          f"   geomean new/old-median: {geo:.3f}")
    cn = canary_min(new_doc)
    cos = [canary_min(d) for _, d in old_docs]
    cos = [c for c in cos if c]
    if cn and cos:
        cr = cn / median(cos)
        print(f"canary min new/old-median: {cr:.3f}   "
              f"canary-normalized geomean: {geo / cr:.3f}")
    print_canary_vs_band(cn)
    # a mover must be OUTSIDE the old band AND beyond what uniform
    # window drift (the geomean) explains — per-query blips inside the
    # historical band, or a uniformly slow/fast window, flag nothing.
    # slack (optional trailing arg, default 1.2 = the per-query noise
    # threshold) widens the drift bound: a lone min just past the band
    # edge is within what quiet-host jitter produces (r13 verdict:
    # movers vs an outlier-LOW old window are not regressions).
    up = max(geo, 1.0) * slack
    down = min(geo, 1.0) / slack
    regress = [(k, new_q[k] / band[k][1]) for k in shared
               if new_q[k] / band[k][1] > up]
    improve = [(k, new_q[k] / band[k][0]) for k in shared
               if new_q[k] / band[k][0] < down]
    print(f"\nregressions outside the band and beyond drift "
          f"(new/band-max > {up:.2f}):")
    for k, r in sorted(regress, key=lambda kv: -kv[1]):
        lo, hi, n = band[k]
        print(f"  {k:28s} {r:.2f} over band-max  "
              f"(band {lo:.3f}-{hi:.3f} over {n} -> {new_q[k]:.3f}s)"
              f"{fmt_disp(new_d, k)}")
    if not regress:
        print("  (none)")
    print(f"\nimprovements outside the band and beyond drift:")
    for k, r in sorted(improve, key=lambda kv: kv[1]):
        lo, hi, n = band[k]
        print(f"  {k:28s} {r:.2f} under band-min  "
              f"(band {lo:.3f}-{hi:.3f} over {n} -> {new_q[k]:.3f}s)")
    if not improve:
        print("  (none)")
    print(f"\nheadline table's old column = {old_paths[0]} (first old "
          "window); per-old suspect/canary:")
    for p, d in old_docs:
        h = headline(d)
        cm = canary_min(d)
        print(f"  {p:32s} suspect {h.get('suspect')!s:>5}  canary_min "
              f"{cm if cm is not None else '-'}")
    print_headlines(new_doc, old_docs[0][1])


def write_bands(out_path, paths):
    docs = [(p, load(p)) for p in paths]
    vals = band_over(docs)
    # the canary lives in the headline samples, not the query-min map —
    # harvest it separately so the committed file carries the quiet band
    # (r15 board #2); windows predating the canary (r14-) contribute
    # nothing, so n records how many windows actually back the band
    canaries = [c for c in (canary_min(d) for _, d in docs) if c]
    if canaries:
        vals["canary_cpu"] = canaries
    doc = {
        "sources": list(paths),
        "bands": {k: {"min": round(min(v), 3), "max": round(max(v), 3),
                      "n": len(v)}
                  for k, v in sorted(vals.items())},
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(vals)} query bands over {len(paths)} windows "
          f"to {out_path}")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--write-bands":
        if len(args) < 3:
            raise SystemExit("usage: --write-bands OUT.json A.json B.json ...")
        write_bands(args[1], args[2:])
        return
    trailing = None
    if args and re.fullmatch(r"[0-9.]+", args[-1]):
        trailing = float(args.pop())
    if len(args) < 2:
        raise SystemExit(__doc__)
    new_doc = load(args[0])
    if len(args) == 2:
        # trailing number = raw-ratio print threshold (default 1.2)
        compare_two(new_doc, load(args[1]), trailing or 1.2)
    else:
        # trailing number = drift-bound slack multiplier (default 1.2)
        compare_band(new_doc, args[1:], trailing or 1.2)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing the pipe is not an error
        pass
