#!/usr/bin/env python3
"""Assemble SCALE100_r{N}.json: per-query sf0.1 → 100x (sf10) ratios for the
key-strided headline sweep. Denominators come from the certified sf0.1
bench (bench.json) with any newer subset-run files overriding (the
analytics waves were measured idle at sf0.1 after the last certified run).

Usage: scale100_merge.py <bench_100x.json> <out.json> [--bench bench.json]
                         [--adj adj100.json] [--note text] [extra_sf01.json ...]
"""
import json
import sys


def main(argv):
    hundred = json.load(open(argv[1]))
    out_path = argv[2]
    args = argv[3:]
    bench_path = "bench.json"
    note_override = None
    adj = {}
    adj_runs = None
    extras = []
    i = 0
    while i < len(args):
        if args[i] == "--bench":
            bench_path = args[i + 1]
            i += 2
        elif args[i] == "--adj":
            j = json.load(open(args[i + 1]))
            adj = dict(j["queries"])
            adj_runs = j.get("runs")
            assert j.get("force") == hundred.get("force"), (
                f"force-mode mismatch: adj={j.get('force')} "
                f"100x={hundred.get('force')}")
            i += 2
        elif args[i] == "--note":
            note_override = args[i + 1]
            i += 2
        else:
            extras.append(args[i])
            i += 1
    base = json.load(open(bench_path))
    assert base.get("sf", "").endswith("sf0.1"), f"{bench_path} is not an sf0.1 run"
    # numerator and denominator MUST share a force mode: count-forcing lets
    # Catalyst prune projection-final work, so mixing modes corrupts ratios
    assert hundred.get("force") == base.get("force"), (
        f"force-mode mismatch: 100x={hundred.get('force')} "
        f"bench={base.get('force')}")
    denom = dict(base["queries"])
    for extra in extras:
        j = json.load(open(extra))
        if j.get("sf", "").endswith("sf0.1"):
            assert j.get("force") == hundred.get("force"), (
                f"force-mode mismatch: {extra}={j.get('force')} "
                f"100x={hundred.get('force')}")
            denom.update(j["queries"])
    # CPU-drift normalization (round 16): when both artifacts carry
    # cpu_probe_ms (Bench's fixed single-thread mix loop), their quotient
    # is the epochs' serial-speed ratio — uniform host drift divided out
    # of every ratio as ratio_cpuadj (see scale26_merge.py).
    cpu_drift = None
    sp, bp = hundred.get("cpu_probe_ms"), base.get("cpu_probe_ms")
    if isinstance(sp, (int, float)) and isinstance(bp, (int, float)) \
            and sp > 0 and bp > 0:
        cpu_drift = round(sp / bp, 4)
    rows = {}
    for q, t100 in sorted({**hundred["queries"], **adj}.items()):
        d = denom.get(q)
        # explicit None/zero split: a 0.0 denominator is a real (too-fast-
        # to-time) measurement, not a missing one — report it, and mark
        # the ratio unavailable rather than dividing by zero
        has_denom = d is not None
        rows[q] = {
            "sf01_sec": round(d, 4) if has_denom else None,
            "sf10_sec": round(t100, 4),
            "ratio_vs_100x_data": round(t100 / d, 2) if has_denom and d > 0 else None,
        }
        if cpu_drift and rows[q]["ratio_vs_100x_data"] is not None:
            rows[q]["ratio_cpuadj"] = round(t100 / d / cpu_drift, 2)
        if q in adj:
            rows[q]["note"] = f"re-measured at runs={adj_runs} (adjudication)"
    default_note = (
        "100x scale step. ratio_vs_100x_data is wall-clock at 100x rows "
        "over the certified sf0.1 wall-clock; 100.0 would be perfectly "
        "linear scaling with zero parallel headroom — values far below "
        "100 show the sf0.1 runs were dominated by fixed overhead and "
        "the 32-core box only saturates at the larger scale.")
    doc = {
        "note": note_override if note_override is not None else default_note,
        "dataset": hundred.get("sf"),
        "runs": hundred.get("runs"),
        "force": hundred.get("force"),
        "cpu_drift_vs_bench": cpu_drift,
        "errors": hundred.get("errors", {}),
        "queries": rows,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    rat = [r["ratio_vs_100x_data"] for r in rows.values()
           if r["ratio_vs_100x_data"] is not None]
    excluded = len(rows) - len(rat)
    if rat:
        print(f"{len(rows)} queries, ratio min/median/max = "
              f"{min(rat)}/{sorted(rat)[len(rat)//2]}/{max(rat)}"
              f" ({excluded} excluded: no sf0.1 denominator or denominator 0)")
    else:
        print(f"{len(rows)} queries, NO ratios computable (no sf0.1 "
              f"denominators — wrong --bench file?)")


if __name__ == "__main__":
    main(sys.argv)
