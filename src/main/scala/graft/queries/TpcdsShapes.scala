package graft.queries

/** TPC-DS query SHAPES re-expressed over the TPC-H-ish fixtures.
  *
  * Full dsdgen is out of reach offline, but what distinguishes the DS
  * workload from TPC-H is structural, not schematic: multi-channel
  * UNION ALL report feeds, GROUPING SETS / ROLLUP over channel
  * hierarchies with GROUPING() disambiguation, windowed
  * rank-within-parent over rolled-up levels, year-over-year self-joins,
  * FILTER-bucketed single-scan reports, and cross-channel INTERSECT
  * audiences. Each query here re-expresses one of those shapes
  * (reference SQL: /root/reference/extension/tpcds/dsdgen/queries/NN.sql,
  * cited per query) against the driver fixtures with a DuckDB oracle.
  *
  * Scale posture: every shape is shuffle-keyed aggregation or
  * broadcast-joined dimension work — the UNION ALL feeds concatenate
  * scans (no extra shuffle), the rollups are one Expand + one
  * aggregation, the rank-within-parent windows partition by the rolled
  * level so the shuffle key matches the aggregation key.
  */
object TpcdsShapes {

  private val q: Seq[(String, Seq[String], String)] = Seq(

    // q05.sql: per-channel sales/returns report from UNION ALL-normalized
    // channel feeds, filtered to one date window
    ("qds_multichannel_report", Seq("orders", "lineitem"),
      """WITH chan AS (
        |  SELECT 'store' AS channel, o_orderdate AS d, o_totalprice AS sales,
        |         CAST(0.0 AS DOUBLE) AS returns_
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  UNION ALL
        |  SELECT 'web' AS channel, o_orderdate AS d, o_totalprice AS sales,
        |         CAST(0.0 AS DOUBLE) AS returns_
        |  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |  UNION ALL
        |  SELECT 'returns' AS channel, l_shipdate AS d, CAST(0.0 AS DOUBLE) AS sales,
        |         l_extendedprice AS returns_
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT channel, round(sum(sales), 2) AS total_sales,
        |       round(sum(returns_), 2) AS total_returns, count(*) AS n
        |FROM chan
        |WHERE d >= TIMESTAMP '1996-01-01' AND d < TIMESTAMP '1997-01-01'
        |GROUP BY channel
        |ORDER BY channel""".stripMargin),

    // q36.sql: rolled-up hierarchy (segment -> nation) with GROUPING()
    // level and rank-within-parent window over each level
    ("qds_rollup_rank_in_parent", Seq("orders", "customer", "nation"),
      """WITH base AS (
        |  SELECT c_mktsegment AS seg, n_name AS nat,
        |         CAST(grouping(c_mktsegment) AS INT) AS g_seg,
        |         CAST(grouping(n_name) AS INT) AS g_nat,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY ROLLUP(c_mktsegment, n_name))
        |SELECT seg, nat, rev, g_seg + g_nat AS lvl,
        |  CAST(rank() OVER (PARTITION BY g_seg + g_nat, seg
        |                    ORDER BY rev DESC, nat NULLS FIRST) AS INT) AS rank_in_parent
        |FROM base
        |ORDER BY lvl, seg NULLS FIRST, rank_in_parent, nat NULLS FIRST""".stripMargin),

    // q74.sql / q11.sql: per-customer year-over-year growth via yearly
    // CTE self-joined across two years with a ratio gate
    ("qds_year_over_year", Seq("orders"),
      """WITH yearly AS (
        |  SELECT o_custkey AS cust, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |         sum(o_totalprice) AS total
        |  FROM orders GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate))
        |SELECT t1.cust AS cust, round(t1.total, 2) AS total_1996,
        |       round(t2.total, 2) AS total_1997,
        |       round(t2.total / t1.total, 4) AS yoy
        |FROM yearly t1 JOIN yearly t2 ON t1.cust = t2.cust
        |WHERE t1.yr = 1996 AND t2.yr = 1997 AND t2.total / t1.total > 1.5
        |ORDER BY yoy DESC, cust
        |LIMIT 20""".stripMargin),

    // q77.sql / q80.sql: GROUPING SETS over (channel, mode), (channel), ()
    // — the DS cross-channel report lattice
    ("qds_channel_grouping_sets", Seq("lineitem"),
      """WITH chan AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 'returns' ELSE 'sales' END AS channel,
        |         l_linestatus AS status, l_extendedprice AS amt
        |  FROM lineitem)
        |SELECT channel, status, round(sum(amt), 2) AS total, count(*) AS n,
        |       CAST(grouping(channel) AS INT) AS g_c, CAST(grouping(status) AS INT) AS g_s
        |FROM chan
        |GROUP BY GROUPING SETS ((channel, status), (channel), ())
        |ORDER BY g_c, g_s, channel NULLS FIRST, status NULLS FIRST""".stripMargin),

    // q09.sql: bucketed report off ONE scan — FILTERed aggregates per
    // quantity band instead of five separate scans
    ("qds_filter_buckets", Seq("lineitem"),
      """SELECT
        |  count(*) FILTER (WHERE l_quantity BETWEEN 1 AND 20) AS n_b1,
        |  round(avg(l_extendedprice) FILTER (WHERE l_quantity BETWEEN 1 AND 20), 4) AS avg_b1,
        |  count(*) FILTER (WHERE l_quantity BETWEEN 21 AND 35) AS n_b2,
        |  round(avg(l_extendedprice) FILTER (WHERE l_quantity BETWEEN 21 AND 35), 4) AS avg_b2,
        |  count(*) FILTER (WHERE l_quantity > 35) AS n_b3,
        |  round(avg(l_extendedprice) FILTER (WHERE l_quantity > 35), 4) AS avg_b3
        |FROM lineitem""".stripMargin),

    // q38.sql / q87.sql: cross-channel audience via INTERSECT / EXCEPT
    ("qds_cross_channel_audience", Seq("orders"),
      """SELECT
        |  (SELECT count(*) FROM (
        |     SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     INTERSECT
        |     SELECT o_custkey FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) b)
        |    AS n_both,
        |  (SELECT count(*) FROM (
        |     SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     EXCEPT
        |     SELECT o_custkey FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) o)
        |    AS n_urgent_only""".stripMargin),

    // q67.sql: top-N within category — rank() over per-category revenue
    // with a QUALIFY-style outer filter
    ("qds_rank_within_brand", Seq("lineitem", "part"),
      """WITH pr AS (
        |  SELECT p_brand AS brand, l_partkey AS pk,
        |         -- the RANKING key must be an exact decimal: a double sum
        |         -- varies in the last ulp with partitioning (warm vs cold
        |         -- cache, cluster size), which can flip rank order at ties
        |         sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |             CAST(1 - l_discount AS DECIMAL(18,4))) AS xrev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, l_partkey)
        |SELECT brand, pk, round(CAST(xrev AS DOUBLE), 2) AS rev, CAST(rk AS INT) AS rk FROM (
        |  SELECT brand, pk, xrev,
        |         rank() OVER (PARTITION BY brand ORDER BY xrev DESC, pk) AS rk
        |  FROM pr) t
        |WHERE rk <= 3
        |ORDER BY brand, rk, pk""".stripMargin),

    // q06.sql: items priced above 1.2x their category average —
    // aggregate-then-join back on the category key
    ("qds_above_category_avg", Seq("part"),
      """WITH type_avg AS (
        |  SELECT p_type AS typ, avg(p_retailprice) AS ap FROM part GROUP BY p_type)
        |SELECT count(*) AS n_above
        |FROM part JOIN type_avg ON p_type = typ
        |WHERE p_retailprice > 1.2 * ap""".stripMargin),

    // q23.sql: frequent buyers (HAVING count gate) and their total spend
    ("qds_frequent_buyers", Seq("orders"),
      """WITH freq AS (
        |  SELECT o_custkey AS cust FROM orders
        |  GROUP BY o_custkey HAVING count(*) >= 8)
        |SELECT
        |  (SELECT count(*) FROM freq) AS n_frequent,
        |  (SELECT round(sum(o_totalprice), 2)
        |   FROM orders JOIN freq ON o_custkey = freq.cust) AS frequent_rev""".stripMargin),

    // q90.sql: am/pm activity ratio — two FILTERed counts off one scan
    ("qds_am_pm_ratio", Seq("events"),
      """SELECT round(CAST(am AS DOUBLE) / pm, 4) AS am_pm_ratio, am, pm FROM (
        |  SELECT count(*) FILTER (WHERE EXTRACT(HOUR FROM ts) < 12) AS am,
        |         count(*) FILTER (WHERE EXTRACT(HOUR FROM ts) >= 12) AS pm
        |  FROM events) t""".stripMargin),

    // q38/q87 shape: relational division — customers active in EVERY
    // order-priority channel (distinct-count equality against the
    // channel universe)
    ("qds_all_channel_customers", Seq("orders"),
      """WITH per AS (
        |  SELECT o_custkey AS cust,
        |         count(DISTINCT o_orderpriority) AS nch
        |  FROM orders GROUP BY o_custkey)
        |SELECT count(*) AS n_all_channel,
        |       (SELECT count(DISTINCT o_orderpriority) FROM orders) AS n_channels
        |FROM per
        |WHERE nch = (SELECT count(DISTINCT o_orderpriority) FROM orders)""".stripMargin),

    // q16/q69 shape: customers in one channel and provably NOT in the
    // other (correlated NOT EXISTS anti-join)
    ("qds_store_only_customers", Seq("orders"),
      """SELECT count(DISTINCT o_custkey) AS n_store_only
        |FROM orders o
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders w
        |    WHERE w.o_custkey = o.o_custkey
        |      AND w.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))""".stripMargin),

    // q47 shape: monthly revenue with a centered moving average window
    // over the month series
    ("qds_monthly_moving_avg", Seq("orders"),
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |         round(sum(o_totalprice), 2) AS sales
        |  FROM orders GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE))
        |SELECT mon, sales,
        |       round(avg(sales) OVER (
        |         ORDER BY mon ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS mavg
        |FROM m ORDER BY mon""".stripMargin),

    // q-style best sellers: top-3 customers per nation by revenue, ties
    // broken deterministically inside the rank
    ("qds_top_customers_per_nation", Seq("orders", "customer", "nation"),
      """WITH rev AS (
        |  SELECT c_nationkey AS nk, o_custkey AS cust,
        |         round(sum(o_totalprice), 2) AS r
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_nationkey, o_custkey),
        |ranked AS (
        |  SELECT nk, cust, r,
        |         rank() OVER (PARTITION BY nk ORDER BY r DESC, cust) AS rk
        |  FROM rev)
        |SELECT n_name, cust, r, rk
        |FROM ranked JOIN nation ON nk = n_nationkey
        |WHERE rk <= 3
        |ORDER BY n_name, rk, cust""".stripMargin)
  )

  val queries: Map[String, Q.Fn] =
    q.map { case (name, tables, sql) => name -> Q.sharedSql(tables, sql)._1 }.toMap

  val oracle: Map[String, String] =
    q.map { case (name, _, sql) => name -> sql }.toMap
}
