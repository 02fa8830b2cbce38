#!/usr/bin/env python3
"""Round-over-round bench regression report.

Dev-only tool (python is driver-side). Compares two bench artifacts —
either full per-query maps (bench_full_r*.json, written by graft.Bench
via SPARK_GRAFT_BENCH_OUT) or the driver's truncated BENCH_r*.json
(whose "tail" field holds whatever per-query times survived the
2000-char cut). Usage:

    python3 tools/bench_diff.py [--min] <old.json> <new.json> [ratio]

Flags every common query whose time grew by more than `ratio`
(default 1.3×) and is above 0.2 s (micro-queries jitter), and prints
the total/streaming movement. Exit 1 if any regression is flagged, so
it can gate a round ritual.

Compares MEDIANS by default when both artifacts carry a
"queries_median" map (tools/bench_fold.py writes one) — the robust
center is the right default for regression flagging, since a single
lucky/unlucky sample moves a min much more than a median. Pass --min
to compare the minima (noise-floor) maps instead; artifacts without
medians fall back to minima automatically.
"""
import json
import re
import sys


def load(path, prefer_median):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        qs, total = d["queries"], d.get("value")
        if prefer_median and "queries_median" in d:
            qs, total = d["queries_median"], d.get("value_median")
        return qs, total, d.get("streaming_sec"), d.get("config")
    if "tail" in d:  # driver artifact: parse what survived truncation
        qs = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z]\d+_[a-z_0-9]+)":([\d.]+)', d["tail"])
        }
        return qs, None, None, None
    return d, None, None, None


def load_minima(path):
    """The noise-floor minima map, if the artifact carries one."""
    with open(path) as f:
        d = json.load(f)
    return d.get("queries") if isinstance(d, dict) else None


def main():
    args = [a for a in sys.argv[1:] if a != "--min"]
    use_median = "--min" not in sys.argv[1:]
    old_p, new_p = args[0], args[1]
    ratio = float(args[2]) if len(args) > 2 else 1.3
    # medians only when BOTH artifacts carry them — a median-vs-min
    # diff would flag phantom regressions (median ≥ min by construction)
    def has_median(p):
        with open(p) as f:
            return "queries_median" in json.load(f)
    if use_median and not (has_median(old_p) and has_median(new_p)):
        use_median = False
        print("note: comparing minima (at least one artifact has no "
              "queries_median map)")
    old_q, old_t, old_s, old_c = load(old_p, use_median)
    new_q, new_t, new_s, new_c = load(new_p, use_median)
    if use_median:
        print("comparing medians (pass --min for noise-floor minima)")
    # Refuse silent apples-to-oranges: the repo documents +/-50%
    # cross-host noise, so a diff across differing measurement configs
    # is only suggestive. sf_dir differences are outright meaningless.
    if old_c is None or new_c is None:
        print("WARNING: config metadata missing from "
              + ("both" if old_c is None and new_c is None
                 else (old_p if old_c is None else new_p))
              + " -- cannot check the runs are comparable")
    elif old_c != new_c:
        diffs = sorted(set(old_c) | set(new_c))
        for k in diffs:
            if old_c.get(k) != new_c.get(k):
                print(f"WARNING: config mismatch {k}: "
                      f"{old_c.get(k)!r} -> {new_c.get(k)!r}")
        print("WARNING: runs were measured under different configs; "
              "treat per-query deltas as suggestive only")
    common = sorted(set(old_q) & set(new_q))
    print(f"common queries: {len(common)} "
          f"(old-only {len(set(old_q) - set(new_q))}, "
          f"new-only {len(set(new_q) - set(old_q))})")
    if old_t and new_t:
        print(f"total: {old_t:.2f} -> {new_t:.2f} s")
    if old_s and new_s:
        print(f"streaming: {old_s:.2f} -> {new_s:.2f} s")
    flagged = []
    for k in common:
        if new_q[k] > old_q[k] * ratio and new_q[k] > 0.2:
            flagged.append((new_q[k] / old_q[k], k))
    # when a MEDIAN moves, show the MINIMA delta for the same query
    # alongside — the two views must never diverge silently (a median
    # shift with a flat minimum is host noise; both moving is real)
    old_m = load_minima(old_p) if use_median and flagged else None
    new_m = load_minima(new_p) if use_median and flagged else None
    for r, k in sorted(flagged, reverse=True):
        line = f"REGRESSION {k}: {old_q[k]:.2f} -> {new_q[k]:.2f} s ({r:.1f}x)"
        if old_m and new_m and k in old_m and k in new_m:
            line += f"  [minima: {old_m[k]:.2f} -> {new_m[k]:.2f} s]"
        print(line)
    if not flagged:
        print("no regressions flagged")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
