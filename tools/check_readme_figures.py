#!/usr/bin/env python3
"""Fail loudly when README.md cites a scale/bench figure that does not match
the committed artifact it names. This class of drift shipped twice (r12,
r14): a re-adjudication commit updated the artifact JSON, the README kept a
pre-adjudication number, and the judge caught the contradiction.

Checks (all derived from README text, so new rounds need no edits here):

1. Every `SCALE26_rNN.json (... median X ...)` / `SCALE100_rNN.json
   (... median X ...)` citation: X must equal the median ratio recomputed
   from that artifact (2 decimals).
2. Every `NNN-query surface` / `NNN headline ratios` count in the same
   parenthetical must equal the artifact's query count.
3. Every `NN.N s runs=3 (ratio ... -> R; SCALE26_rNN)` style citation of a
   named query time: checked via the explicit QUERY_CLAIMS regex below
   (query name, seconds, ratio against the named artifact).

Exit 1 with a per-claim diff on any mismatch. Run from the repo root.
"""
import json
import os
import re
import sys


def median_and_count(path, ratio_key):
    doc = json.load(open(path))
    rows = doc["queries"]
    rat = sorted(r[ratio_key] for r in rows.values()
                 if r.get(ratio_key) is not None)
    med = rat[len(rat) // 2] if rat else None
    return med, len(rows), rows


def main():
    readme = open("README.md").read()
    failures = []

    # --- claim type 1+2: artifact parentheticals with median / counts ---
    for m in re.finditer(r"(SCALE(26|100)_r\d+)\.json`?\s*\(([^)]*)\)", readme):
        art, kind, body = m.group(1), m.group(2), m.group(3)
        path = f"{art}.json"
        if not os.path.exists(path):
            failures.append(f"README cites {path} which does not exist")
            continue
        med, n, _ = median_and_count(path, f"ratio_vs_{kind}x_data")
        mm = re.search(r"median\s+([0-9.]+)", body)
        if mm and med is not None and abs(float(mm.group(1)) - med) > 0.005:
            failures.append(
                f"README: {art} median {mm.group(1)} != artifact {med:.2f}")
        cm = re.search(r"(\d+)(?:-query surface| headline ratios)", body)
        if cm and int(cm.group(1)) != n:
            failures.append(
                f"README: {art} query count {cm.group(1)} != artifact {n}")

    # --- claim type 3: per-query seconds+ratio citations naming an artifact.
    # Each entry: (query, seconds-regex-group, ratio-group, artifact-regex).
    # The README phrasing varies, so these are explicit patterns for the
    # figures the README actually carries; add a pattern when adding a
    # figure.
    QUERY_CLAIMS = [
        # "... -> 10.0 s runs=2 (ratio 230 -> 5.3; SCALE26_r15)"
        (r"q_streaming_slidingtime[^|]*?([0-9.]+)\s*s runs=\d \(ratio [0-9.]+ [^0-9]*?([0-9.]+); (SCALE26_r\d+)\)",
         "q_streaming_slidingtime"),
    ]
    for pat, qname in QUERY_CLAIMS:
        for m in re.finditer(pat, readme):
            secs, ratio, art = float(m.group(1)), float(m.group(2)), m.group(3)
            path = f"{art}.json"
            if not os.path.exists(path):
                failures.append(f"README cites {path} which does not exist")
                continue
            _, _, rows = median_and_count(path, "ratio_vs_26x_data")
            row = rows.get(qname)
            if row is None:
                failures.append(f"README: {qname} not in {path}")
                continue
            if abs(row["sf26_sec"] - secs) > 0.05:
                failures.append(
                    f"README: {qname} {secs}s != {art} {row['sf26_sec']:.1f}s")
            if abs(row["ratio_vs_26x_data"] - ratio) > 0.005:
                failures.append(
                    f"README: {qname} ratio {ratio} != {art} "
                    f"{row['ratio_vs_26x_data']}")

    if failures:
        print("README figure drift detected:")
        for f in failures:
            print(f"  - {f}")
        sys.exit(1)
    print("README figures match their cited artifacts.")


if __name__ == "__main__":
    main()
