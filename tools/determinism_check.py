#!/usr/bin/env python3
"""Cross-JVM determinism check (dev tool): two independent fresh-JVM
`graft.Verify` dumps must value-compare IDENTICAL (values AND row order)
on every oracle-gated query — no merge-order- or scheduling-sensitive
result can flake the driver's hash gate.

Usage: python3 tools/determinism_check.py <dump_a> <dump_b>
(run `sbt "runMain graft.Verify <sf> <dump>"` twice, separate JVMs)

Queries without an oracle entry (approx/nondeterministic by nature) are
skipped, matching the r10 protocol. src_csv_filename is skipped too:
its output names a per-JVM fixture path (self-consistent per run).
"""
import json
import math
import sys

import duckdb

SKIP = {"src_csv_filename"}


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main():
    a, b = sys.argv[1], sys.argv[2]
    with open(f"{a}/oracle_sql.json") as f:
        gated = set(json.load(f))
    con = duckdb.connect()
    n_same = 0
    diffs = []
    for name in sorted(gated - SKIP):
        try:
            ra = [tuple(norm(v) for v in r) for r in con.sql(
                f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')").fetchall()]
            rb = [tuple(norm(v) for v in r) for r in con.sql(
                f"SELECT * FROM read_parquet('{b}/{name}/*.parquet')").fetchall()]
        except Exception as e:
            diffs.append((name, f"read error: {e}"))
            continue
        if ra == rb:
            n_same += 1
        else:
            diffs.append((name, f"{len(ra)} vs {len(rb)} rows, first diff at "
                          f"{next((i for i, (x, y) in enumerate(zip(ra, rb)) if x != y), 'len')}"))
    for name, msg in diffs:
        print(f"DIFF {name}: {msg}")
    print(f"== {n_same} identical, {len(diffs)} differ")
    sys.exit(1 if diffs else 0)


if __name__ == "__main__":
    main()
