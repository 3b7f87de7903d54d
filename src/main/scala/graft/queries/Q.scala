package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers for building `SparkEntry.queries` entries.
  *
  * REPO CONVENTION — normalize integer-aggregate result types. The driver's
  * oracle compare hashes the *rendered* values, and DuckDB widens integer
  * `sum(...)` to HUGEINT (int128) while Spark returns BIGINT, so a bare
  * `sum(CASE WHEN ... THEN 1 ELSE 0 END)` hash-mismatches even when every
  * value is equal. Every shape that returns an integer aggregate must wrap
  * it as `CAST(sum(...) AS BIGINT)` (or `CAST(... AS INT)` / `round(...)`)
  * on BOTH dialect sides.
  *
  * SECOND CONVENTION — beware `round(sum(double), 2)` boundary values. A
  * double sum's last ulp depends on accumulation order, and the engines'
  * round() implementations differ exactly at a .005 representation
  * boundary (observed: 60066.165 → 60066.16 in Spark, 60066.17 in
  * DuckDB on qds_quarter_deviation). When a query feeds a money sum into
  * round(), sum exact integer cents instead —
  * `CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT)` — or round to 1
  * decimal if the shape tolerates it. round(sum(..), 2) stays acceptable
  * for sums later divided/averaged across many rows (boundary collisions
  * there are measure-zero and caught by the per-round gate).
  *
  * THIRD CONVENTION — no DECIMAL or extreme-DATE cells in result schemas.
  * This failure class has now shipped three times (r7 HUGEINT sums, r8
  * round-boundary doubles, r8c decimal/extreme-date pins): the driver's
  * hash is type-sensitive even when every value compares equal. The
  * exhaustive list of known hash-unstable cell classes:
  *   1. HUGEINT-widened integer aggregates  → CAST(... AS BIGINT).
  *   2. round(sum(double), 2) at a .005 representation boundary
  *      → sum integer cents (see second convention).
  *   3. DECIMAL-typed cells of ANY precision/scale. The r8c empirical
  *      split (red: every query with a scale-0/2/4 DECIMAL column;
  *      green: scale-1/5-only queries) does not correspond to any
  *      value-level property we can rely on, so treat every DECIMAL
  *      result cell as unstable → keep the arithmetic in DECIMAL but
  *      render the final cell with CAST(... AS DOUBLE) on BOTH dialect
  *      sides (decimal→double is nearest-even in both engines), or
  *      CAST(... AS STRING) when digit-exact rendering is the thing
  *      under test (DuckDB 1.0 renders small decimals with the leading
  *      zero, verified).
  *   4. Pre-Gregorian / extreme DATE cells (year 1, 1754, 9999 — parquet
  *      date-rebase divergence in the driver's reader) → CAST(... AS
  *      STRING) for ISO rendering; DATEs within ~1900-2100 are safe.
  * Every new pin must pass BOTH tools/oracle_check.py AND
  * tools/typed_hash_check.py (the driver-style typed-cell lint) before
  * it ships — r8c's six reds were value-correct and still red.
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** A query whose SQL text is dialect-identical between Spark SQL and
    * DuckDB: register the named tables as temp views, run the same text
    * through `spark.sql`, and reuse it verbatim as the oracle. Exercises
    * the SQL entry point (SURVEY.md §3.1) on the Spark side.
    */
  def sharedSql(tables: Seq[String], text: String): (Fn, String) =
    ({ (s, d) =>
      tables.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
      s.sql(text)
    }, text)
}
