#!/usr/bin/env python3
"""Certify a bench by per-query MIN across N independent sessions.

Why (round 18): the r17 verdict's five-session A/B showed the SAME
bytecode on the same idle host reading 19.3 s and 34.7 s on a 12-query
subset in back-to-back JVM sessions, with cpu_probe_ms / io_probe_ms
flat — the per-session floor (scheduler state, THP/NUMA layout,
hypervisor phase) drifts up to ~1.8x on streaming-heavy subsets and is
invisible to the existing probes. Under one-sided noise (a floor can
only ADD time), the per-query minimum across sessions is the honest
estimate of what the code costs; a single session's median certifies
only "what this session's floor happened to be".

Input: >=2 bench JSON files (same sf + force + harness — asserted).
Output: one merged bench-schema line (parsable by Bench's parsePriors:
"queries" + "sf" present) with:
  - queries: per-query min across sessions
  - value:   sum of the mins
  - retry_prior: per-query MEDIAN across sessions — what Bench's >2x
    load-retry compares against (a fresh session routinely exceeds 2x
    a cross-session MINIMUM when half the surface spreads >1.5x, so
    retrying against the mins fires mass false retries; r18 ADVICE)
  - sessions / session_values: provenance (each session's total)
  - canaries: each session's canary_start/canary_end pairs
  - spread:  per-query max/min ratio for queries whose sessions
             disagree >1.5x — the floor-noise victims, named
  - cpu_probe_ms / io_probe_ms: min across sessions (the machine's
    actual speed; the least-interrupted sample)
  - errors: only queries that failed in EVERY session; a query that
    errored in some sessions but succeeded in others keeps its
    successful reading in "queries" and is named in partial_queries
    (Bench's convention is errors excluded from queries/total — a
    query in both maps would make the artifact self-inconsistent)

Usage: bench_min_sessions.py out.json session1.json session2.json [...]
"""
import json
import sys


def main(argv):
    out_path = argv[1]
    sessions = [json.load(open(p)) for p in argv[2:]]
    assert len(sessions) >= 2, "min-of-sessions needs >=2 sessions"
    for k in ("sf", "force", "harness", "runs"):
        vals = {s.get(k) for s in sessions}
        assert len(vals) == 1, f"sessions disagree on {k}: {vals}"
    base = sessions[0]
    names = set()
    for s in sessions:
        names |= set(s["queries"])
    # a query missing from some session (errored there) is kept from the
    # sessions that have it, but named — a query that errors in SOME
    # sessions is itself a finding
    partial = sorted(n for n in names
                     if any(n not in s["queries"] for s in sessions))
    merged = {}
    retry_prior = {}
    spread = {}
    for n in sorted(names):
        ts = [s["queries"][n] for s in sessions if n in s["queries"]]
        merged[n] = min(ts)
        retry_prior[n] = sorted(ts)[len(ts) // 2]
        if merged[n] > 0 and max(ts) / merged[n] > 1.5:
            spread[n] = round(max(ts) / merged[n], 2)
    # only queries that failed in EVERY session belong in errors — a
    # partial failure keeps its successful reading in "queries" (and is
    # named in partial_queries); listing it in both maps would violate
    # Bench's errors-excluded-from-queries convention
    errors = {}
    for s in sessions:
        for k, v in s.get("errors", {}).items():
            if k not in names:
                errors[k] = v
    doc = {
        "metric": "total",
        "value": round(sum(merged.values()), 4),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in merged.items()},
        "retry_prior": {k: round(v, 4) for k, v in retry_prior.items()},
        "sf": base["sf"],
        "runs": base["runs"],
        "force": base["force"],
        "harness": base.get("harness"),
        "certification": "min-of-sessions",
        "sessions": len(sessions),
        "session_values": [round(s.get("value", -1), 4) for s in sessions],
        "cpu_probe_ms": min(s.get("cpu_probe_ms", 1e18) for s in sessions),
        "io_probe_ms": min(s.get("io_probe_ms", 1e18) for s in sessions),
        "canaries": [
            {"start": s.get("canary_start"), "end": s.get("canary_end")}
            for s in sessions
        ],
        "spread_gt_1.5x": spread,
        "partial_queries": partial,
        "errors": errors,
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(doc, separators=(",", ":")) + "\n")
    print(f"{len(merged)} queries, total(min) = {doc['value']}, "
          f"session totals = {doc['session_values']}, "
          f"{len(spread)} queries spread >1.5x"
          + (f", PARTIAL: {partial}" if partial else ""))
    if spread:
        worst = sorted(spread.items(), key=lambda kv: -kv[1])[:10]
        print("worst spreads:", ", ".join(f"{k}={v}x" for k, v in worst))


if __name__ == "__main__":
    main(sys.argv)
