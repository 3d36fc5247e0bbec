#!/usr/bin/env python3
"""Assemble SCALE26_r{N}.json: per-query sf0.1 → 26x ratios for the
full-surface isomorphic-copy sweep (tools/make_scale10.py with 26 copies —
built with the non-degenerate permutation builders).

Denominators come from the certified sf0.1 bench (bench.json), with any
newer sf0.1 subset-run files overriding (new queries measured after the
last certified run). Adjudicated entries (runs=3 re-measurements) override
the sweep's runs=2 numbers and carry a note naming the adjudication.

Usage: scale26_merge.py <sweep26.json> <out.json> [--adj adj26.json]
                        [--bench bench.json] [extra_sf01.json ...]
"""
import json
import sys


def main(argv):
    sweep = json.load(open(argv[1]))
    out_path = argv[2]
    args = argv[3:]
    adj = {}
    adj_runs = None
    note_override = None  # --note: same override scale100_merge.py has
    extras = []
    bench_path = "bench.json"
    i = 0
    while i < len(args):
        if args[i] == "--adj":
            j = json.load(open(args[i + 1]))
            adj = dict(j["queries"])
            adj_runs = j.get("runs")
            # adjudication re-measurements feed the same ratio table as the
            # sweep — a different force mode would corrupt exactly the rows
            # that were singled out for scrutiny
            assert j.get("force") == sweep.get("force"), (
                f"force-mode mismatch: adj={j.get('force')} "
                f"sweep={sweep.get('force')}")
            i += 2
        elif args[i] == "--bench":
            bench_path = args[i + 1]
            i += 2
        elif args[i] == "--note":
            note_override = args[i + 1]
            i += 2
        else:
            extras.append(args[i])
            i += 1
    base = json.load(open(bench_path))
    assert base.get("sf", "").endswith("sf0.1"), f"{bench_path} is not an sf0.1 run"
    # numerator and denominator MUST be measured under the same forcing:
    # a count-forced denominator (Catalyst prunes projection-final work)
    # against a noop-forced numerator silently corrupts every ratio
    assert sweep.get("force") == base.get("force"), (
        f"force-mode mismatch: sweep={sweep.get('force')} "
        f"bench={base.get('force')}")
    denom = dict(base["queries"])
    for extra in extras:
        j = json.load(open(extra))
        if j.get("sf", "").endswith("sf0.1"):
            assert j.get("force") == sweep.get("force"), (
                f"force-mode mismatch: {extra}={j.get('force')} "
                f"sweep={sweep.get('force')}")
            denom.update(j["queries"])
    # CPU-drift normalization (round 16): when both the sweep and the
    # denominator bench carry cpu_probe_ms (the fixed single-thread mix
    # loop Bench records per run), their quotient is the epochs' serial
    # speed ratio — host drift that inflates/deflates every wall number
    # uniformly. ratio_cpuadj divides it out so cross-epoch ratios stop
    # being re-litigated by hand (NOTES rounds 14-15).
    cpu_drift = None
    sp, bp = sweep.get("cpu_probe_ms"), base.get("cpu_probe_ms")
    if isinstance(sp, (int, float)) and isinstance(bp, (int, float)) \
            and sp > 0 and bp > 0:
        cpu_drift = round(sp / bp, 4)
    rows = {}
    for q, t26 in sorted({**sweep["queries"], **adj}.items()):
        d = denom.get(q)
        has_denom = d is not None
        row = {
            "sf01_sec": round(d, 4) if has_denom else None,
            "sf26_sec": round(t26, 4),
            "ratio_vs_26x_data": round(t26 / d, 2) if has_denom and d > 0 else None,
        }
        if cpu_drift and row["ratio_vs_26x_data"] is not None:
            row["ratio_cpuadj"] = round(t26 / d / cpu_drift, 2)
        if q in adj:
            row["note"] = f"re-measured at runs={adj_runs} (adjudication)"
        rows[q] = row
    errors = dict(sweep.get("errors", {}))
    doc = {
        "note": note_override if note_override is not None else (
                 "Full-surface 26x scale step (26 isomorphic copies of ALL "
                 "tables via the non-degenerate letter-permutation / "
                 "signed-dimension-permutation builders, tools/make_scale10.py). "
                 "ratio_vs_26x_data = wall-clock at 26x rows over the "
                 "certified sf0.1 wall-clock; 26.0 = perfectly linear with "
                 "zero parallel headroom, values below show sf0.1 fixed "
                 "overhead amortizing. Sweep runs=2 round-robin; entries "
                 "with notes were re-measured at runs=3."),
        "dataset": sweep.get("sf"),
        "runs": sweep.get("runs"),
        "force": sweep.get("force"),
        "cpu_drift_vs_bench": cpu_drift,
        "errors": errors,
        "queries": rows,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    rat = [r["ratio_vs_26x_data"] for r in rows.values()
           if r["ratio_vs_26x_data"] is not None]
    excluded = len(rows) - len(rat)
    if rat:
        print(f"{len(rows)} queries, ratio min/median/max = "
              f"{min(rat)}/{sorted(rat)[len(rat)//2]}/{max(rat)}"
              f" ({excluded} excluded: no sf0.1 denominator or denominator 0); "
              f"errors: {list(errors) or 'none'}")
    else:
        print(f"{len(rows)} queries, NO ratios computable (no sf0.1 "
              f"denominators — wrong --bench file?); errors: "
              f"{list(errors) or 'none'}")


if __name__ == "__main__":
    main(sys.argv)
