#!/usr/bin/env python3
"""Driver-style typed-cell lint for new query pins.

tools/oracle_check.py value-compares through python objects, which is
LOOSER than the per-round driver gate: the driver's hash is sensitive to
the cell's *type and rendering*, and three rounds in a row shipped pins
that value-matched but hash-failed (r7 HUGEINT sums, r8 round-boundary
doubles, r8c DECIMAL/extreme-DATE cells). This lint flags every result
column/cell belonging to a known hash-unstable class (the exhaustive
list lives in queries/Q.scala's THIRD CONVENTION note):

  1. HUGEINT/INT128 oracle columns (DuckDB sum() widening).
  2. DECIMAL columns on either side whose values are not exactly
     double-representable (1.01, 2.35, ... — exactly the r8c reds).
  3. DATE cells outside [1900-01-01, 2100-12-31] (parquet rebase).
  4. Side-vs-side type-class mismatches (e.g. Spark BIGINT vs oracle
     DECIMAL / HUGEINT).

Usage: python3 tools/typed_hash_check.py <verify_out_dir> <sf_dir> [name ...]
(run `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` first; with
no names, lints every query that has an oracle entry)

Dev-tool only — NOT part of the Spark library.
"""
import datetime
import json
import os
import sys
from decimal import Decimal

import duckdb

DATE_LO = datetime.date(1900, 1, 1)
DATE_HI = datetime.date(2100, 12, 31)
STABLE = {"BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "FLOAT",
          "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP_NS",
          "TIMESTAMP WITH TIME ZONE", "BLOB", "INTERVAL"}


def type_class(t):
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    if t in ("HUGEINT", "INT128", "UHUGEINT"):
        return "HUGEINT"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "FLOAT"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    return t


def exact_double(v):
    try:
        return Decimal(float(v)) == v
    except Exception:
        return False


def lint_one(con, name, sql, out_dir):
    issues = []
    rel = con.sql(sql)
    o_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    o_rows = rel.fetchall()
    o_cols = rel.columns
    for c, t in o_types.items():
        if type_class(t) == "HUGEINT":
            issues.append(f"oracle col {c} is {t} (class 1: CAST AS BIGINT)")
    spark_p = os.path.join(out_dir, name)
    s_types = {}
    if os.path.isdir(spark_p):
        srel = con.sql(f"SELECT * FROM read_parquet('{spark_p}/*.parquet')")
        s_types = dict(zip(srel.columns, [str(t) for t in srel.types]))
        s_rows = srel.fetchall()
        s_cols = srel.columns
    else:
        issues.append("no spark verify dump (run graft.Verify first)")
        s_rows, s_cols = [], []
    for side, types, rows, cols in (("oracle", o_types, o_rows, o_cols),
                                    ("spark", s_types, s_rows, s_cols)):
        for i, c in enumerate(cols):
            tc = type_class(types[c])
            if tc == "DECIMAL":
                bad = [r[i] for r in rows
                       if r[i] is not None and not exact_double(r[i])]
                if bad:
                    issues.append(
                        f"{side} col {c} DECIMAL with non-double-exact "
                        f"values e.g. {bad[0]} (class 3: CAST AS DOUBLE/STRING)")
                else:
                    issues.append(
                        f"{side} col {c} is DECIMAL (class 3 risk even with "
                        f"double-exact values: prefer CAST AS DOUBLE)")
            if types[c].upper() == "DATE":
                bad = [r[i] for r in rows
                       if r[i] is not None and not (DATE_LO <= r[i] <= DATE_HI)]
                if bad:
                    issues.append(
                        f"{side} col {c} DATE outside 1900-2100 e.g. {bad[0]} "
                        f"(class 4: CAST AS STRING)")
    for c in set(o_types) & set(s_types):
        oc, sc = type_class(o_types[c]), type_class(s_types[c])
        if oc != sc and {oc, sc} != {"INT"}:
            issues.append(
                f"type-class mismatch on {c}: spark {s_types[c]} vs "
                f"oracle {o_types[c]}")
    return issues


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_flag = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            issues = lint_one(con, name, sql, out_dir)
        except Exception as e:
            issues = [f"lint error: {e}"]
        if issues:
            n_flag += 1
            print(f"FLAG {name}")
            for x in issues:
                print(f"  - {x}")
        else:
            print(f"OK   {name}")
    print(f"\n{n_flag} flagged")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
