#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Mimics the driver: for each query in oracle_sql.json, run the SQL in
DuckDB over views named after the testdata parquet tables, load the
Spark result parquet, sort columns by name and rows by value, then
compare schema + values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = 0
    for q, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, q)
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df())
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL  {q}: {e}")
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {q}: columns {list(got.columns)} vs {list(exp.columns)}")
            continue
        if got.shape != exp.shape:
            print(f"FAIL  {q}: shape {got.shape} vs {exp.shape}")
            continue
        dt_ok = all(str(a) == str(b) for a, b in zip(got.dtypes, exp.dtypes))
        if not got.equals(exp):
            diff = (got != exp) & ~(got.isna() & exp.isna())
            bad = diff.any(axis=1)
            print(f"FAIL  {q}: {int(bad.sum())}/{len(got)} rows differ; dtypes_match={dt_ok}")
            print("  spark:", got[bad].head(3).to_dict("records"))
            print("  duck :", exp[bad].head(3).to_dict("records"))
            continue
        n_ok += 1
        print(f"OK    {q}  rows={len(got)} dtypes_match={dt_ok}")
    print(f"{n_ok}/{len(oracle)} queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
