#!/usr/bin/env python3
"""DuckDB side of the scaled JOB pairing (dev tool — pairs with
`sbt "runMain graft.BenchJob"`). The texts are verbatim shared-dialect
SQL, so this reads them straight from the reference query files.

Usage: python3 tools/bench_job_duckdb.py <scaled_dir> [job_NNx ...]
"""
import statistics
import sys
import time

import duckdb

TABLES = ["title", "movie_companies", "company_name", "company_type",
          "info_type", "movie_info_idx", "movie_info", "keyword",
          "movie_keyword", "cast_info", "name", "aka_name", "role_type",
          "char_name", "kind_type", "movie_link", "link_type",
          "person_info", "comp_cast_type", "complete_cast", "aka_title"]
QDIR = "/root/reference/benchmark/imdb_plan_cost/queries"


def default_names():
    """All fixture-eligible shapes (mirrors tools/gen_job_verbatim.py's
    FROM-anchored table detection + the original JobSlice dozen)."""
    import os
    import re
    out = []
    for f in sorted(os.listdir(QDIR)):
        sql = open(os.path.join(QDIR, f)).read()
        m = re.search(r"\bFROM\b(.*?)\bWHERE\b", sql, re.S | re.I)
        tabs = {t for t in re.findall(r"(\w+)\s+AS\s+\w+", m.group(1))}
        if tabs <= set(TABLES):
            out.append(f[:-4])
        else:
            print(f"SKIP {f[:-4]}: fixture lacks {sorted(tabs - set(TABLES))}")
    return out


def main():
    d = sys.argv[1]
    names = [n.replace("job_", "") for n in sys.argv[2:]] or default_names()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{d}/{t}.parquet/*.parquet')")
    for name in names:
        with open(f"{QDIR}/{name}.sql") as f:
            sql = f.read()
        for _ in range(2):
            con.execute(sql).fetchall()
        ts = []
        for _ in range(5):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append((time.time() - t0) * 1000)
        print(f"[jobduck] job_{name:<6s} median={statistics.median(ts):8.1f} ms  "
              f"runs={','.join(f'{t:.0f}' for t in ts)}")


if __name__ == "__main__":
    main()
