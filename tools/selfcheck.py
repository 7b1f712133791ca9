#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <outDir> [query ...]

Reads <outDir>/oracle_sql.json (written by graft.Verify), registers the
sf parquet tables as DuckDB views, runs each oracle SQL, and compares
against <outDir>/<name>/ parquet.

Replicates the driver's compare exactly (validated against
CORRECTNESS_r01.json): the Spark side is read with pandas/pyarrow, the
oracle side with duckdb .fetchdf(), columns sorted by name, rows sorted,
and each CELL compared via str(). Consequences:
  - DECIMAL output columns are unsafe: pandas yields decimal.Decimal
    ("123.40") while fetchdf yields float64 ("123.4"). Final projections
    must be DOUBLE on both sides (exact decimal math internally is fine).
  - NULL doubles are fine (both sides str() to "nan"); NULL in an
    object/str column is fine (both "None"/"NaT" consistently) only if
    the dtypes agree — keep output dtypes primitive.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def rows(df):
    cols = sorted(df.columns)
    r = [tuple(str(v) for v in t) for t in df[cols].itertuples(index=False)]
    r.sort()
    return r


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
            act = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue

        ecols, acols = sorted(exp.columns), sorted(act.columns)
        if ecols != acols:
            print(f"FAIL {name}: columns differ\n  oracle: {ecols}\n  spark : {acols}")
            n_fail += 1
            continue
        if len(exp) != len(act):
            print(f"FAIL {name}: rows differ oracle={len(exp)} spark={len(act)}")
            n_fail += 1
            continue
        erows, arows = rows(exp), rows(act)
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
