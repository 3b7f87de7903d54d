#!/usr/bin/env python3
"""Local differential check: replicate the driver's correctness gate.

Runs each SparkEntry query's verify-dump parquet against the DuckDB oracle
SQL on the same sf directory, compares schema (column names sorted) and
values. Dev-tool only — NOT part of the Spark library.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
(run `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` first)
"""
import json
import math
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(norm(v) for v in row) for row in
                        con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = [tuple(norm(v) for v in row) for row in
                        con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark result error: {e}")
            n_fail += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns {got_cols} != oracle {exp_cols}")
            n_fail += 1
            continue
        if exp_rows != got_rows:
            print(f"FAIL {name}: {len(got_rows)} rows vs {len(exp_rows)}")
            shown = 0
            for i, (e, g) in enumerate(zip(exp_rows, got_rows)):
                if e != g and shown < 3:
                    print(f"  row {i}: oracle={e}")
                    print(f"  row {i}:  spark={g}")
                    shown += 1
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    # queries with no oracle entry: rows-only smoke
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n} rows)")
            if n == 0:
                n_fail += 1
            else:
                n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
