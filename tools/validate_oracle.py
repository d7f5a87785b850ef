#!/usr/bin/env python3
"""Dev-only validator (mimics the round driver's correctness gate).

Runs AFTER `run_graft.sh graft.Verify <sfDir> <outDir>`:
for each query, executes the dumped oracle SQL in DuckDB over the same
parquet tables and compares values column-name-sorted + row-sorted.

NOT part of the library (driver-side python tooling only).
Usage: python3 tools/validate_oracle.py <sfDir> <outDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    result_dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = [d.rstrip("/").split("/")[-1] for d in result_dirs]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        actual = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"{name:24s} rows-only: {len(actual)} rows "
                  f"{'OK' if len(actual) > 0 else 'EMPTY!'}")
            if len(actual) == 0:
                failures += 1
            continue
        try:
            expected = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        a, e = norm(actual), norm(expected)
        if list(a.columns) != list(e.columns):
            print(f"{name:24s} SCHEMA MISMATCH: {list(a.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        # dtype-strict: the driver's gate hashes value renderings, so int64 vs
        # float64 (e.g. an uncast DuckDB HUGEINT) fails there even when every
        # value is numerically equal — make the local gate predict that
        dtype_bad = [c for c in a.columns
                     if a[c].dtype.kind != e[c].dtype.kind]
        if dtype_bad:
            print(f"{name:24s} DTYPE MISMATCH: "
                  + ", ".join(f"{c}: {a[c].dtype} vs {e[c].dtype}" for c in dtype_bad))
            failures += 1
        elif len(a) != len(e):
            print(f"{name:24s} ROWCOUNT MISMATCH: {len(a)} vs {len(e)}")
            failures += 1
        else:
            try:
                pd.testing.assert_frame_equal(a, e, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                print(f"{name:24s} OK ({len(a)} rows)")
            except AssertionError as ex:
                print(f"{name:24s} VALUE MISMATCH: {str(ex).splitlines()[-1]}")
                failures += 1
    missing = set(oracle) - set(names)
    if missing:
        print(f"oracle entries with no result dir: {missing}")
        failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
