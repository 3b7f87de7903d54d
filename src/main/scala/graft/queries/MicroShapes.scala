package graft.queries

/** Stock-path micro anchors — the reference's benchmark/micro/
  * discipline (cast towers, wide CASE, large IN-lists, NLJ and heavy
  * window frames under benchmark/micro/cast/, case/, in/, join/,
  * window/) applied to the STOCK Catalyst surface the custom rule
  * stack sits on. The custom rules are regression-gated by their
  * on/off ratios in [[graft.BenchMicro]]; these shapes guard the
  * stock paths those ratios silently assume (a Catalyst upgrade or a
  * config drift that slows codegen'd CASE towers would be invisible
  * to every on/off pair). BenchMicro times each against
  * `micro_ref_scan` in the same JVM — the cross-shape ratio cancels
  * host phase drift the same way the on/off pairs do.
  *
  * All five are also ordinary oracle-gated queries (dialect-shared
  * text, deterministic outputs): integer-only cast chains and frame
  * aggregates keep the FP story trivial on both engines.
  */
object MicroShapes {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    // the normalizer: bare scan+consume envelope (count+sum over one
    // cached column). Stock shapes gate on (shape ms / this ms).
    "micro_ref_scan" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS s
        |FROM lineitem""".stripMargin),

    // cast tower: 4 integer/string casts per row (reference
    // benchmark/micro/cast/). Integral quantities make every hop exact.
    "micro_cast_tower" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(*) AS n,
        | CAST(sum(CAST(CAST(CAST(CAST(l_quantity AS INT) AS STRING) AS INT) AS SMALLINT)) AS BIGINT) AS s
        |FROM lineitem""".stripMargin),

    // wide CASE: 16-arm integer dispatch to string labels, grouped
    "micro_wide_case" -> Q.sharedSql(Seq("lineitem"),
      """SELECT CASE CAST(l_quantity AS INT) % 16
        |  WHEN 0 THEN 'b00' WHEN 1 THEN 'b01' WHEN 2 THEN 'b02'
        |  WHEN 3 THEN 'b03' WHEN 4 THEN 'b04' WHEN 5 THEN 'b05'
        |  WHEN 6 THEN 'b06' WHEN 7 THEN 'b07' WHEN 8 THEN 'b08'
        |  WHEN 9 THEN 'b09' WHEN 10 THEN 'b10' WHEN 11 THEN 'b11'
        |  WHEN 12 THEN 'b12' WHEN 13 THEN 'b13' WHEN 14 THEN 'b14'
        |  ELSE 'b15' END AS bucket, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin),

    // large IN-list: 48 integer members over a derived key
    "micro_in_list" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(*) AS n FROM lineitem
        |WHERE CAST(l_partkey % 199 AS INT) IN (
        |  2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
        |  59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
        |  127, 131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181,
        |  191, 193, 197, 198, 0, 1)""".stripMargin),

    // non-equi BNLJ microshape: 5 thresholds x full scan, no equi key
    // (VALUES, not range(): DuckDB names range()'s column `range`)
    "micro_bnlj" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(*) AS n
        |FROM lineitem JOIN (VALUES (CAST(10 AS DOUBLE)), (20), (30), (40), (50))
        |  AS thresholds(t)
        |ON l_quantity > t""".stripMargin),

    // integer arithmetic tower: 6 exact integral ops per row (reference
    // benchmark/micro/ arithmetic discipline); BIGINT end-to-end so both
    // engines fold identically
    "micro_arith_tower" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(*) AS n,
        | CAST(sum((CAST(l_quantity AS BIGINT) * 3 + l_linenumber * 7
        |   - l_suppkey % 13) * 2 + l_partkey % 5) AS BIGINT) AS s
        |FROM lineitem""".stripMargin),

    // LIKE family: leading-wildcard contains, anchored prefix/suffix,
    // and a single-char wildcard over the documents text column
    "micro_like_family" -> Q.sharedSql(Seq("documents"),
      """SELECT
        |  CAST(sum(CASE WHEN text LIKE '%data%' THEN 1 ELSE 0 END) AS BIGINT) AS c_contains,
        |  CAST(sum(CASE WHEN text LIKE 'The%' THEN 1 ELSE 0 END) AS BIGINT) AS c_prefix,
        |  CAST(sum(CASE WHEN text LIKE '%.' THEN 1 ELSE 0 END) AS BIGINT) AS c_suffix,
        |  CAST(sum(CASE WHEN text LIKE '%qu_ck%' THEN 1 ELSE 0 END) AS BIGINT) AS c_underscore
        |FROM documents""".stripMargin),

    // date-cast micro: timestamp -> DATE -> VARCHAR -> DATE round trip
    // per row, grouped by extracted year (ISO text form on both engines)
    "micro_date_cast" -> Q.sharedSql(Seq("lineitem"),
      """SELECT year(CAST(CAST(CAST(l_shipdate AS DATE) AS STRING) AS DATE)) AS y,
        | count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY y""".stripMargin),

    // large group-by: ~rows/1.07 distinct derived integer keys, outer
    // re-aggregation keeps the gated output tiny while the inner
    // hash-table build dominates
    "micro_large_groupby" -> Q.sharedSql(Seq("lineitem"),
      """SELECT count(*) AS groups, CAST(sum(c) AS BIGINT) AS total
        |FROM (SELECT l_orderkey * 8 + l_linenumber AS k, count(*) AS c
        |      FROM lineitem GROUP BY 1) t""".stripMargin),

    // join-key cast micro: both equi-join keys pass through an explicit
    // cast, so key-side expression eval sits on the join hot path
    "micro_join_key_cast" -> Q.sharedSql(Seq("lineitem", "orders"),
      """SELECT count(*) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
        |FROM lineitem JOIN orders
        |  ON CAST(l_orderkey AS INT) = CAST(o_orderkey AS INT)""".stripMargin),

    // heavy window frame: wide sliding RANGE frame per supplier. RANGE,
    // not ROWS: the testdata's (l_orderkey, l_linenumber) is NOT unique
    // (60k rows, 45.8k distinct pairs), so a ROWS frame over tied order
    // keys is engine-order-dependent — RANGE includes all peers and is
    // deterministic under ties. Integer measure keeps the sums exact.
    "micro_window_frame" -> Q.sharedSql(Seq("lineitem"),
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(avg(CAST(l_quantity AS INT)) OVER (
        |   PARTITION BY l_suppkey ORDER BY l_orderkey
        |   RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING), 4) AS mq
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, mq LIMIT 500""".stripMargin))

  val queries: Map[String, Q.Fn] = shared.map { case (k, (fn, _)) => k -> fn }
  val oracle: Map[String, String] = shared.map { case (k, (_, sql)) => k -> sql }
}
