#!/usr/bin/env python3
"""Generate src/main/scala/graft/queries/TpcdsVerbatim.scala from the
reference's verbatim TPC-DS query texts (dev tool, run once per edit).

The texts are embedded VERBATIM except a short, documented patch list
(aliases for unnamed output columns, BIGINT casts on integer sums per the
Q.scala conventions, quoted-identifier aliases Spark can't parse, trailing
semicolons). Each patch keeps the query's plan shape intact.
"""
import re
import sys

QDIR = "/root/reference/extension/tpcds/dsdgen/queries"
OUT = "/root/repo/src/main/scala/graft/queries/TpcdsVerbatim.scala"

# query -> tables referenced (for the oracle's read_parquet CTE prefix)
TABLES = {
    1: ["store_returns", "date_dim", "store", "customer"],
    2: ["web_sales", "catalog_sales", "date_dim"],
    3: ["date_dim", "store_sales", "item"],
    4: ["customer", "store_sales", "catalog_sales", "web_sales", "date_dim"],
    6: ["customer_address", "customer", "store_sales", "date_dim", "item"],
    8: ["store_sales", "date_dim", "store", "customer_address", "customer"],
    11: ["customer", "store_sales", "web_sales", "date_dim"],
    12: ["web_sales", "item", "date_dim"],
    14: ["item", "store_sales", "catalog_sales", "web_sales", "date_dim"],
    15: ["catalog_sales", "customer", "customer_address", "date_dim"],
    19: ["date_dim", "store_sales", "item", "customer", "customer_address", "store"],
    20: ["catalog_sales", "item", "date_dim"],
    21: ["inventory", "warehouse", "item", "date_dim"],
    22: ["inventory", "date_dim", "item"],
    23: ["store_sales", "catalog_sales", "web_sales", "customer", "date_dim", "item"],
    24: ["store_sales", "store_returns", "store", "item", "customer", "customer_address"],
    25: ["store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item"],
    28: ["store_sales"],
    29: ["store_sales", "store_returns", "catalog_sales", "date_dim", "store", "item"],
    32: ["catalog_sales", "item", "date_dim"],
    33: ["store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item"],
    36: ["store_sales", "date_dim", "item", "store"],
    37: ["item", "inventory", "date_dim", "catalog_sales"],
    38: ["store_sales", "catalog_sales", "web_sales", "date_dim", "customer"],
    39: ["inventory", "item", "warehouse", "date_dim"],
    41: ["item"],
    42: ["date_dim", "store_sales", "item"],
    43: ["date_dim", "store_sales", "store"],
    44: ["store_sales", "item"],
    45: ["web_sales", "customer", "customer_address", "date_dim", "item"],
    47: ["item", "store_sales", "date_dim", "store"],
    50: ["store_sales", "store_returns", "store", "date_dim"],
    52: ["date_dim", "store_sales", "item"],
    53: ["item", "store_sales", "date_dim", "store"],
    54: ["catalog_sales", "web_sales", "item", "date_dim", "customer", "store_sales", "customer_address", "store"],
    55: ["date_dim", "store_sales", "item"],
    56: ["store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item"],
    58: ["store_sales", "catalog_sales", "web_sales", "item", "date_dim"],
    59: ["store_sales", "date_dim", "store"],
    60: ["store_sales", "catalog_sales", "web_sales", "date_dim", "customer_address", "item"],
    63: ["item", "store_sales", "date_dim", "store"],
    65: ["store", "item", "store_sales", "date_dim"],
    74: ["customer", "store_sales", "web_sales", "date_dim"],
    76: ["store_sales", "web_sales", "catalog_sales", "item", "date_dim"],
    82: ["item", "inventory", "date_dim", "store_sales"],
    89: ["item", "store_sales", "date_dim", "store"],
    86: ["web_sales", "date_dim", "item"],
    87: ["store_sales", "catalog_sales", "web_sales", "date_dim", "customer"],
    92: ["web_sales", "item", "date_dim"],
    97: ["store_sales", "catalog_sales", "date_dim"],
    98: ["date_dim", "store_sales", "item"],
}


def patch(n, sql):
    # strip trailing semicolon (Spark's parser rejects it)
    sql = re.sub(r";\s*$", "", sql.strip())
    if n == 2:
        # final select-list column is unnamed -> engines auto-name it
        # differently; alias r7 to match r1..r6
        sql = sql.replace("round(sat_sales1/sat_sales2, 2)\nFROM",
                          "round(sat_sales1/sat_sales2, 2) r7\nFROM")
    if n == 14:
        # sum over an integer count widens to HUGEINT in DuckDB
        # (Q.scala convention 1)
        sql = sql.replace("sum(number_sales) AS sum_number_sales",
                          "CAST(sum(number_sales) AS BIGINT) AS sum_number_sales")
    if n == 29:
        for col, alias in [("ss_quantity", "store_sales_quantity"),
                           ("sr_return_quantity", "store_returns_quantity"),
                           ("cs_quantity", "catalog_sales_quantity")]:
            sql = sql.replace(f"sum({col}) AS {alias}",
                              f"CAST(sum({col}) AS BIGINT) AS {alias}")
    if n == 32:
        # Spark has no double-quoted identifiers (spark.sql.ansi
        # doubleQuotedIdentifiers off): plain alias
        sql = sql.replace('AS "excess discount amount"',
                          "AS excess_discount_amt")
    if n == 92:
        sql = sql.replace('AS "Excess Discount Amount"',
                          "AS excess_discount_amt")
    if n == 38:
        sql = sql.replace("SELECT count(*)\n", "SELECT count(*) AS num_hot_cust\n", 1)
    if n == 87:
        sql = sql.replace("SELECT count(*)\n", "SELECT count(*) AS num_cool_cust\n", 1)
    if n == 8:
        sql = sql.replace("SELECT s_store_name,\n       sum(ss_net_profit)",
                          "SELECT s_store_name,\n       sum(ss_net_profit) AS net_profit")
    if n == 15:
        sql = sql.replace("SELECT ca_zip,\n       sum(cs_sales_price)",
                          "SELECT ca_zip,\n       sum(cs_sales_price) AS total_sales")
    if n == 45:
        sql = sql.replace("       sum(ws_sales_price)",
                          "       sum(ws_sales_price) AS total_sales")
    if n == 50:
        # quoted aliases -> plain; integer CASE sums widen to HUGEINT
        for quoted, plain in [("30 days", "d30"), ("31-60 days", "d31_60"),
                              ("61-90 days", "d61_90"), ("91-120 days", "d91_120"),
                              (">120 days", "d120_plus")]:
            sql = sql.replace(f'AS "{quoted}"', f"AS {plain}")
        for alias in ["d30", "d31_60", "d61_90", "d91_120", "d120_plus"]:
            sql = re.sub(r"sum\(CASE((?:(?!sum\().)*?)END\) AS " + alias,
                         r"CAST(sum(CASE\1END) AS BIGINT) AS " + alias,
                         sql, flags=re.S)
    if n == 42:
        # unnamed aggregate output column
        sql = sql.replace("sum(ss_ext_sales_price)\nFROM",
                          "sum(ss_ext_sales_price) AS total_sales\nFROM")
    if n == 97:
        # integer CASE sums widen to HUGEINT in DuckDB (convention 1)
        for alias in ["store_only", "catalog_only", "store_and_catalog"]:
            sql = re.sub(r"sum\(CASE((?:(?!sum\().)*?)END\) " + alias,
                         r"CAST(sum(CASE\1END) AS BIGINT) " + alias,
                         sql, flags=re.S)
    return sql


def main():
    entries = []
    tablerows = []
    for n in sorted(TABLES):
        with open(f"{QDIR}/{n:02d}.sql") as f:
            sql = patch(n, f.read())
        assert '"""' not in sql and "$" not in sql
        entries.append(
            f'    // verbatim from {QDIR}/{n:02d}.sql (see patch notes above)\n'
            f'    "dsq{n:02d}" -> """{sql}""",\n')
        tablerows.append(
            f'    "dsq{n:02d}" -> Seq({", ".join(repr(t) for t in TABLES[n])}),\n'
            .replace("'", '"'))
    scala = f'''package graft.queries

import graft.sources.TpcdsFixture

/** Verbatim TPC-DS queries over a dsdgen-schema fixture — the r9 verdict's
  * "real TPC-DS" track. Query texts are the reference's own validated set
  * (/root/reference/extension/tpcds/dsdgen/queries/NN.sql) embedded
  * VERBATIM; the only edits (applied by tools/gen_tpcds_verbatim.py, which
  * regenerates this file) are:
  *  - trailing semicolons stripped (Spark parser),
  *  - aliases added to UNNAMED output columns (q2 r7, q38/q87 count(*),
  *    q42) — the engines' auto-generated names differ and the driver
  *    compares sorted column names,
  *  - `AS "quoted identifier"` -> plain alias (q32/q92; Spark has no
  *    double-quoted identifiers),
  *  - CAST(... AS BIGINT) on integer-typed sums (q14 sum of counts, q97
  *    CASE sums) — DuckDB widens integer sum() to HUGEINT and the
  *    driver's hash is type-sensitive (Q.scala convention 1).
  * Everything else — including NULLS FIRST orderings, INTERSECT/EXCEPT,
  * ROLLUP, correlated subqueries, and the q23/q14/q4 CTE towers — runs
  * through both engines untouched. Money columns in the fixture are
  * integer-valued doubles so the verbatim (round-free) aggregates are
  * exact in any accumulation order (see [[graft.sources.TpcdsFixture]]).
  *
  * Both sides read the SAME parquet fixture: Spark through temp views,
  * DuckDB through a read_parquet CTE prefix spliced ahead of the verbatim
  * text (CTEs shadow nothing here — the DS table names don't collide with
  * the oracle's TPC-H views except `customer`/`item`, which the CTE
  * shadows by SQL scoping rules).
  */
object TpcdsVerbatim {{
  private val tablesFor: Map[String, Seq[String]] = Map(
{"".join(tablerows)}  )

  private val texts: Map[String, String] = Map(
{"".join(entries)}  )

  val queries: Map[String, Q.Fn] = texts.map {{ case (name, sql) =>
    val fn: Q.Fn = (s, d) => {{
      tablesFor(name).foreach(t => TpcdsFixture.view(s, t))
      s.sql(sql)
    }}
    name -> fn
  }}

  val oracle: Map[String, String] = texts.map {{ case (name, sql) =>
    val ctes = tablesFor(name).map(t =>
      s"$t AS (SELECT * FROM read_parquet('${{TpcdsFixture.dir}}/$t.parquet/*.parquet'))")
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
