#!/usr/bin/env python3
"""Fold several bench invocations into one committed artifact.

Dev-only tool (python is driver-side). Each `graft.Bench` run writes a
full artifact (SPARK_GRAFT_BENCH_OUT) carrying per-query min-of-2
times in "queries" and the raw per-pass samples in "queries_runs".
This folds N such runs:

    python3 tools/bench_fold.py out.json run1.json run2.json [...]

and writes `out.json` with, per query:
  - "queries":        MIN across every sample (noise floor — additive
                      noise means min estimates true cost),
  - "queries_median": MEDIAN across every sample (robust center —
                      what a typical execution costs on this host),
  - "queries_n":      sample count folded in,
plus totals for both, streaming_sec (min-based, matching prior
rounds' artifacts) and streaming_sec_median, and the config block —
refusing to fold runs measured under different configs (the repo
documents ±50% cross-host noise; mixing configs silently would make
the artifact meaningless).

Older artifacts without "queries_runs" contribute their "queries" map
as one sample per query.
"""
import json
import statistics
import sys


def main():
    out_p, run_ps = sys.argv[1], sys.argv[2:]
    samples = {}  # name -> [sec, ...]
    config = None
    sf = None
    for p in run_ps:
        with open(p) as f:
            d = json.load(f)
        c = d.get("config")
        if config is None:
            config = c
        elif c != config:
            for k in sorted(set(config) | set(c or {})):
                if config.get(k) != (c or {}).get(k):
                    print(f"config mismatch {k}: "
                          f"{config.get(k)!r} vs {(c or {}).get(k)!r} in {p}")
            sys.exit(f"refusing to fold {p}: measured under a different "
                     "config than the first run")
        sf = sf or d.get("sf")
        runs = d.get("queries_runs")
        if runs:
            for k, ts in runs.items():
                samples.setdefault(k, []).extend(float(t) for t in ts)
        else:
            for k, t in d.get("queries", {}).items():
                samples.setdefault(k, []).append(float(t))
    # the artifact describes HEAD's query set = the LAST run's set;
    # earlier runs may predate newly added queries (their samples fold
    # in where names match) or carry since-removed ones (dropped, and
    # reported so the drop is never silent)
    with open(run_ps[-1]) as f:
        last_run = json.load(f)
    current = set(last_run["queries"])
    stream_names = set(last_run.get("streaming_names") or [])
    dropped = sorted(set(samples) - current)
    if dropped:
        print(f"dropping {len(dropped)} queries absent from {run_ps[-1]}: "
              + ", ".join(dropped))
    samples = {k: v for k, v in samples.items() if k in current}
    mins = {k: min(v) for k, v in sorted(samples.items())}
    meds = {k: statistics.median(v) for k, v in sorted(samples.items())}
    ns = {k: len(v) for k, v in sorted(samples.items())}

    # streaming split: prefer the authoritative list graft.Bench embeds
    # ("streaming_names", mirroring TierD.streamingNames); only
    # pre-round-10 artifacts without it fall back to the name heuristic.
    def is_stream(k):
        if stream_names:
            return k in stream_names
        return (k.startswith("d") and "_stream" in k) or \
            k == "d24_state_store_reader"
    stream_min = sum(t for k, t in mins.items() if is_stream(k))
    stream_med = sum(t for k, t in meds.items() if is_stream(k))
    artifact = {
        "metric": "total",
        "value": sum(mins.values()),
        "value_median": sum(meds.values()),
        "unit": "sec",
        "streaming_sec": stream_min,
        "streaming_sec_median": stream_med,
        "streaming_n": sum(1 for k in mins if is_stream(k)),
        "runs_folded": len(run_ps),
        "config": config,
        "queries": mins,
        "queries_median": meds,
        "queries_n": ns,
        "sf": sf,
    }
    with open(out_p, "w") as f:
        json.dump(artifact, f)
        f.write("\n")
    print(f"folded {len(run_ps)} runs, {len(mins)} queries -> {out_p}")
    print(f"total(min) {sum(mins.values()):.1f}s  "
          f"total(median) {sum(meds.values()):.1f}s  "
          f"streaming(min) {stream_min:.1f}s")


if __name__ == "__main__":
    main()
