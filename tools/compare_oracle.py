#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and diff. Usage:
    python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got_s = got.reindex(sorted(got.columns), axis=1)
        exp_s = exp.reindex(sorted(exp.columns), axis=1)
        if list(got_s.columns) != list(exp_s.columns):
            print(f"FAIL {name}: columns {list(got_s.columns)} != {list(exp_s.columns)}")
            failures += 1
            continue
        if len(got_s) != len(exp_s):
            print(f"FAIL {name}: rows {len(got_s)} != {len(exp_s)}")
            failures += 1
            continue
        got_s = got_s.sort_values(by=list(got_s.columns), ignore_index=True)
        exp_s = exp_s.sort_values(by=list(exp_s.columns), ignore_index=True)
        mismatched = []
        for c in got_s.columns:
            a, b = got_s[c], exp_s[c]
            try:
                same = (a.astype(str) == b.astype(str)).all()
            except Exception:
                same = False
            if not same:
                mismatched.append(c)
        if mismatched:
            print(f"FAIL {name}: value mismatch in {mismatched}")
            for c in mismatched[:2]:
                neq = got_s[c].astype(str) != exp_s[c].astype(str)
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"    [{c}] row {i}: spark={got_s[c][i]!r} oracle={exp_s[c][i]!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got_s)} rows)")
    # rows-only queries (no oracle)
    import glob
    import os
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name not in oracles and os.path.isdir(d):
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            status = "OK  " if n > 0 else "WARN"
            print(f"{status} {name} rows-only ({n} rows)")
    print(f"\n{failures} failures / {len(oracles)} oracle-checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
