#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 dev/check.py <sfDir> <verifyOutDir> [query ...]

Reads each query's parquet dump, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the same testdata parquet tables, sorts
columns by name and rows by all columns, and hash-compares — the same
shape as the driver's CORRECTNESS check.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
from pandas.util import hash_pandas_object

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"{name:28s} NO_PARQUET")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracles:
            print(f"{name:28s} no_oracle rows={len(spark_df)}")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE_ERR {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns)
        try:
            ha = hash_pandas_object(a, index=False).sum()
            hb = hash_pandas_object(b, index=False).sum()
            hmatch = bool(rows and schema and ha == hb)
        except Exception as e:
            print(f"{name:28s} HASH_ERR {e}")
            n_fail += 1
            continue
        ok = rows and schema and hmatch
        n_pass += ok
        n_fail += not ok
        msg = "pass" if ok else f"FAIL rows={len(a)}/{len(b)} schema={schema} hash={hmatch}"
        if not ok and rows and schema:
            merged = a.compare(b) if a.shape == b.shape else None
            if merged is not None and not merged.empty:
                msg += f" first_diffs:\n{merged.head(5)}"
        print(f"{name:28s} {msg}")
    print(f"== {n_pass} pass, {n_fail} fail")


if __name__ == "__main__":
    main()
