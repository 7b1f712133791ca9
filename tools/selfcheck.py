#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers the
sf parquet tables as DuckDB views, runs each oracle SQL, and compares
against <outDir>/<name>/ parquet: column names (sorted), row count, and
exact values (rows sorted by all columns).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
            act = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue

        ecols, acols = sorted(exp.columns), sorted(act.columns)
        if ecols != acols:
            print(f"FAIL {name}: columns differ\n  oracle: {ecols}\n  spark : {acols}")
            n_fail += 1
            continue
        dt_bad = [(c, str(exp[c].dtype), str(act[c].dtype)) for c in ecols
                  if str(exp[c].dtype) != str(act[c].dtype)]
        if dt_bad:
            print(f"WARN {name}: dtype mismatch {dt_bad}")
        if len(exp) != len(act):
            print(f"FAIL {name}: rows differ oracle={len(exp)} spark={len(act)}")
            n_fail += 1
            continue
        e = exp[ecols].copy()
        a = act[acols].copy()
        erows = sorted([tuple(norm(v) for v in r) for r in e.itertuples(index=False)],
                       key=repr)
        arows = sorted([tuple(norm(v) for v in r) for r in a.itertuples(index=False)],
                       key=repr)
        bad = [(x, y) for x, y in zip(erows, arows) if x != y]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; first:")
            print(f"  oracle: {bad[0][0]}")
            print(f"  spark : {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
