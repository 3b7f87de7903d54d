#!/usr/bin/env python3
"""Generate src/main/scala/graft/queries/TpchVerbatim.scala from the
reference's verbatim TPC-H query texts (dev tool, run once per edit).

Same recipe as gen_tpcds_verbatim.py: texts embedded VERBATIM except a
short, documented patch list (trailing semicolons, an alias for q18's
unnamed output column — Spark can't write `sum(l_quantity)` to parquet —
and the Q.scala convention-1 integer-width normalizations: BIGINT casts
on extract(year ...) outputs and q12's integer CASE sums, where DuckDB
returns BIGINT/HUGEINT and Spark INT/BIGINT). Each patch keeps the
query's plan shape intact.
"""
import re

QDIR = "/root/reference/extension/tpch/dbgen/queries"
OUT = "/root/repo/src/main/scala/graft/queries/TpchVerbatim.scala"

TABLES = {
    1: ["lineitem"],
    2: ["part", "supplier", "partsupp", "nation", "region"],
    3: ["customer", "orders", "lineitem"],
    4: ["orders", "lineitem"],
    5: ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    6: ["lineitem"],
    7: ["supplier", "lineitem", "orders", "customer", "nation"],
    8: ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
    9: ["part", "supplier", "lineitem", "partsupp", "orders", "nation"],
    10: ["customer", "orders", "lineitem", "nation"],
    11: ["partsupp", "supplier", "nation"],
    12: ["orders", "lineitem"],
    13: ["customer", "orders"],
    14: ["lineitem", "part"],
    15: ["lineitem", "supplier"],
    16: ["partsupp", "part", "supplier"],
    17: ["lineitem", "part"],
    18: ["customer", "orders", "lineitem"],
    19: ["lineitem", "part"],
    20: ["supplier", "nation", "partsupp", "part", "lineitem"],
    21: ["supplier", "lineitem", "orders", "nation"],
    22: ["customer", "orders"],
}


def patch(n, sql):
    # strip trailing semicolon (Spark's parser rejects it)
    sql = re.sub(r";\s*$", "", sql.strip())
    # convention-1 integer-width normalization: extract(year ...) is INT
    # in Spark, BIGINT in DuckDB; the driver's hash is type-sensitive
    if n in (7, 8, 9):
        sql = sql.replace(
            "extract(year FROM l_shipdate) AS l_year",
            "CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year")
        sql = sql.replace(
            "extract(year FROM o_orderdate) AS o_year",
            "CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year")
    if n == 12:
        # integer CASE sums widen to HUGEINT in DuckDB (convention 1)
        for alias in ["high_line_count", "low_line_count"]:
            sql = re.sub(r"sum\(\s*CASE((?:(?!sum\().)*?)END\) AS " + alias,
                         r"CAST(sum(CASE\1END) AS BIGINT) AS " + alias,
                         sql, flags=re.S)
    if n == 18:
        # unnamed aggregate output column: Spark cannot write a parquet
        # field named `sum(l_quantity)` (parens are invalid characters)
        sql = sql.replace("    sum(l_quantity)\nFROM",
                          "    sum(l_quantity) AS sum_qty\nFROM")
    return sql


def main():
    entries = []
    tablerows = []
    for n in sorted(TABLES):
        with open(f"{QDIR}/q{n:02d}.sql") as f:
            sql = patch(n, f.read())
        assert '"""' not in sql and "$" not in sql
        entries.append(
            f'    // verbatim from {QDIR}/q{n:02d}.sql (see patch notes above)\n'
            f'    "thq{n:02d}" -> """{sql}""",\n')
        tablerows.append(
            f'    "thq{n:02d}" -> Seq({", ".join(repr(t) for t in TABLES[n])}),\n'
            .replace("'", '"'))
    scala = f'''package graft.queries

import graft.sources.TpchFixture

/** Verbatim TPC-H queries over a full dbgen-schema fixture — the
  * reference's PRIMARY golden suite. Query texts are the reference's own
  * validated set (/root/reference/extension/tpch/dbgen/queries/qNN.sql)
  * embedded VERBATIM; the only edits (applied by
  * tools/gen_tpch_verbatim.py, which regenerates this file) are:
  *  - trailing semicolons stripped (Spark parser),
  *  - q18's unnamed `sum(l_quantity)` aliased (Spark cannot write a
  *    parquet field whose name contains parentheses),
  *  - CAST(... AS BIGINT) on q7/q8/q9's extract(year ...) outputs and
  *    q12's integer CASE sums — DuckDB returns BIGINT/HUGEINT where
  *    Spark returns INT/BIGINT, and the driver's hash is type-sensitive
  *    (Q.scala convention 1).
  * Everything else — q2/q17/q20's correlated subquery towers, q11's
  * HAVING scalar subquery, q13's derived-table column aliases, q15's
  * CTE-reuse max, q21's EXISTS + NOT EXISTS self-joins, q22's
  * substring(FROM FOR) country codes — runs through both engines
  * untouched. Money columns in the fixture are integer-valued doubles
  * and discount/tax are 1/64-multiples, so the verbatim (round-free)
  * aggregates are exact in any accumulation order (see
  * [[graft.sources.TpchFixture]]).
  *
  * Both sides read the SAME parquet fixture: Spark through temp views,
  * DuckDB through a read_parquet CTE prefix spliced ahead of the
  * verbatim text (the CTE names shadow the oracle's driver-testdata
  * views of the same names by SQL scoping rules).
  */
object TpchVerbatim {{
  private val tablesFor: Map[String, Seq[String]] = Map(
{"".join(tablerows)}  )

  private[graft] val texts: Map[String, String] = Map(
{"".join(entries)}  )

  val queries: Map[String, Q.Fn] = texts.map {{ case (name, sql) =>
    val fn: Q.Fn = (s, d) => {{
      tablesFor(name).foreach(t => TpchFixture.view(s, t))
      s.sql(sql)
    }}
    name -> fn
  }}

  val oracle: Map[String, String] = texts.map {{ case (name, sql) =>
    val ctes = tablesFor(name).map(t =>
      s"$t AS (SELECT * FROM read_parquet('${{TpchFixture.dir}}/$t.parquet/*.parquet'))")
      .mkString(",\\n     ")
    val body = sql.trim
    val merged =
      if (body.toUpperCase.startsWith("WITH ")) s"WITH $ctes,\\n${{body.drop(5)}}"
      else s"WITH $ctes\\n$body"
    name -> merged
  }}
}}
'''
    with open(OUT, "w") as f:
        f.write(scala)
    print(f"wrote {OUT} with {len(TABLES)} queries")


if __name__ == "__main__":
    main()
