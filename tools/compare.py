#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers every parquet table in <sfDir> as a DuckDB view, runs each SQL
from <verifyOutDir>/oracle_sql.json, and compares with the Spark result
parquet in <verifyOutDir>/<name>/ — schema (column names), row count, and
value equality after sorting columns by name and rows by all columns.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps -> ns, categories -> str
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)

    n_pass = n_fail = 0
    results = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in results:
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in
             glob.glob(os.path.join(out_dir, name, "*.parquet"))],
            ignore_index=True)
        if name not in oracles:
            print(f"  ~ {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  ✗ {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"  ✗ {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        diffs = []
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                eq = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
            else:
                eq = (pd.Series(av).astype(object).where(pd.notna(av), None).tolist()
                      == pd.Series(bv).astype(object).where(pd.notna(bv), None).tolist())
            if not eq:
                diffs.append(c)
        if diffs:
            print(f"  ✗ {name}: value mismatch in columns {diffs}")
            for c in diffs[:2]:
                mask = ~(a[c].astype(str) == b[c].astype(str))
                print(f"      {c}: spark={a[c][mask].head(3).tolist()} duck={b[c][mask].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} matched, {n_fail} mismatched, "
          f"{len(results) - n_pass - n_fail} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
