#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir> [out.json]

Reads each <verify_out_dir>/<name>/*.parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet
(views named after the tables), sorts columns by name on both sides,
and compares row-by-row. Exit code != 0 if any query mismatches.

With a third argument, also writes a per-query JSON artifact in the
driver's CORRECTNESS_r{N}.json shape ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) so every round carries a
builder-committed correctness record even if the driver's own artifact
pipeline fails (round 5 shipped an empty file and two stale ones).
"""
import sys, os, glob, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(out_dir, sf_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    record = {}
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_tbl = pq.read_table(files[0]) if files else None
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output")
            record[name] = dict(rows_match=False, schema_match=None,
                                hash_match=None, spark_rows=None,
                                oracle_rows=None, err="no spark output")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={spark_tbl.num_rows})")
            record[name] = dict(rows_match=None, schema_match=None,
                                hash_match=None, spark_rows=spark_tbl.num_rows,
                                oracle_rows=None, err="no_oracle")
            n_noracle += 1
            continue
        try:
            duck = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record[name] = dict(rows_match=None, schema_match=None,
                                hash_match=None, spark_rows=spark_tbl.num_rows,
                                oracle_rows=None,
                                err=f"oracle SQL error: {e}"[:300])
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.schema.names)
        d_cols = sorted(duck.schema.names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
            record[name] = dict(rows_match=spark_tbl.num_rows == duck.num_rows,
                                schema_match=False, hash_match=False,
                                spark_rows=spark_tbl.num_rows,
                                oracle_rows=duck.num_rows, err=None)
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {duck.num_rows}")
            record[name] = dict(rows_match=False, schema_match=True,
                                hash_match=False,
                                spark_rows=spark_tbl.num_rows,
                                oracle_rows=duck.num_rows, err=None)
            n_fail += 1
            continue
        s_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = list(zip(*[duck.column(c).to_pylist() for c in s_cols]))
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            sv = tuple(norm(x) for x in sr)
            dv = tuple(norm(x) for x in dr)
            if sv != dv:
                bad = (i, sv, dv)
                break
        record[name] = dict(rows_match=True, schema_match=True,
                            hash_match=bad is None,
                            spark_rows=spark_tbl.num_rows,
                            oracle_rows=duck.num_rows, err=None)
        if bad:
            i, sv, dv = bad
            print(f"FAIL {name}: row {i} spark={sv} duck={dv} (cols={s_cols})")
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(record)} queries)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
