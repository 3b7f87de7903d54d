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
        |ORDER BY n_name, rk, cust""".stripMargin),

    // q34/q73: inner per-ticket count, outer join to customer with a
    // count-band filter — the "busy tickets" shape
    ("qds_tickets_per_customer", Seq("lineitem", "orders", "customer"),
      """WITH dn AS (
        |  SELECT l_orderkey AS ticket, o_custkey AS cust, count(*) AS cnt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  GROUP BY l_orderkey, o_custkey)
        |SELECT c_name, ticket, cnt
        |FROM dn JOIN customer ON cust = c_custkey
        |WHERE cnt BETWEEN 5 AND 7
        |ORDER BY c_name, ticket""".stripMargin),

    // q66: deep CASE pivot — one scan fanned into 12 monthly columns
    ("qds_deep_case_pivot", Seq("orders", "customer", "nation"),
      """SELECT n_name,
        | round(sum(CASE WHEN month(o_orderdate) = 1 THEN o_totalprice ELSE 0 END), 2) AS m01,
        | round(sum(CASE WHEN month(o_orderdate) = 2 THEN o_totalprice ELSE 0 END), 2) AS m02,
        | round(sum(CASE WHEN month(o_orderdate) = 3 THEN o_totalprice ELSE 0 END), 2) AS m03,
        | round(sum(CASE WHEN month(o_orderdate) = 4 THEN o_totalprice ELSE 0 END), 2) AS m04,
        | round(sum(CASE WHEN month(o_orderdate) = 5 THEN o_totalprice ELSE 0 END), 2) AS m05,
        | round(sum(CASE WHEN month(o_orderdate) = 6 THEN o_totalprice ELSE 0 END), 2) AS m06,
        | round(sum(CASE WHEN month(o_orderdate) = 7 THEN o_totalprice ELSE 0 END), 2) AS m07,
        | round(sum(CASE WHEN month(o_orderdate) = 8 THEN o_totalprice ELSE 0 END), 2) AS m08,
        | round(sum(CASE WHEN month(o_orderdate) = 9 THEN o_totalprice ELSE 0 END), 2) AS m09,
        | round(sum(CASE WHEN month(o_orderdate) = 10 THEN o_totalprice ELSE 0 END), 2) AS m10,
        | round(sum(CASE WHEN month(o_orderdate) = 11 THEN o_totalprice ELSE 0 END), 2) AS m11,
        | round(sum(CASE WHEN month(o_orderdate) = 12 THEN o_totalprice ELSE 0 END), 2) AS m12,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // q57: THREE windows over one grouped feed — per-year average,
    // lag/lead neighbors, rank — with an outlier filter on the deviation
    ("qds_multi_window_outlier", Seq("lineitem", "orders", "part"),
      """WITH v1 AS (
        |  SELECT p_brand AS brand, year(o_orderdate) AS yr,
        |         month(o_orderdate) AS moy,
        |         round(sum(l_extendedprice), 2) AS sum_sales
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
        |  GROUP BY p_brand, year(o_orderdate), month(o_orderdate)),
        |v2 AS (
        |  SELECT brand, yr, moy, sum_sales,
        |         round(avg(sum_sales) OVER (PARTITION BY brand, yr), 2) AS avg_monthly,
        |         lag(sum_sales) OVER (PARTITION BY brand ORDER BY yr, moy) AS psum,
        |         lead(sum_sales) OVER (PARTITION BY brand ORDER BY yr, moy) AS nsum,
        |         CAST(rank() OVER (PARTITION BY brand ORDER BY yr, moy) AS BIGINT) AS rn
        |  FROM v1)
        |SELECT brand, yr, moy, sum_sales, avg_monthly, psum, nsum, rn
        |FROM v2
        |WHERE yr = 1997 AND avg_monthly > 0
        |  AND abs(sum_sales - avg_monthly) / avg_monthly > 0.05
        |ORDER BY round(sum_sales - avg_monthly, 2), brand, yr, moy""".stripMargin),

    // q67: ROLLUP tower + rank-within-category top-k over the rolled rows
    ("qds_rollup_rank_topk", Seq("lineitem", "orders", "part"),
      """WITH dw1 AS (
        |  SELECT p_brand AS brand, year(o_orderdate) AS yr,
        |         quarter(o_orderdate) AS qoy,
        |         round(sum(coalesce(l_extendedprice * l_quantity, 0)), 2) AS sumsales
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY ROLLUP(p_brand, year(o_orderdate), quarter(o_orderdate)))
        |SELECT brand, yr, qoy, sumsales, rk FROM (
        |  SELECT brand, yr, qoy, sumsales,
        |         CAST(rank() OVER (PARTITION BY brand ORDER BY sumsales DESC) AS BIGINT) AS rk
        |  FROM dw1) dw2
        |WHERE rk <= 2
        |ORDER BY brand NULLS FIRST, yr NULLS FIRST, qoy NULLS FIRST, sumsales, rk
        |LIMIT 100""".stripMargin),

    // q17: wide star with the SAME dimension joined in two roles
    // (nation as customer-side d1 and supplier-side d2) + sampled-stddev
    // and coefficient-of-variation aggregates
    ("qds_star_stats_roles", Seq("lineitem", "orders", "part", "customer",
      "supplier", "nation"),
      """SELECT p_brand, count(*) AS n,
        |  round(avg(l_quantity), 4) AS q_avg,
        |  round(stddev_samp(l_quantity), 4) AS q_std,
        |  round(stddev_samp(l_extendedprice) / NULLIF(avg(l_extendedprice), 0), 6) AS price_cov
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND n1.n_name = n2.n_name
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // q11/q4: WITH tower of per-year totals, self-joined across years,
    // growth-ratio filter, top-N — the "growth accounts" shape
    ("qds_yearly_growth_tower", Seq("orders"),
      """WITH yearly AS (
        |  SELECT o_custkey AS cust, year(o_orderdate) AS yr,
        |         round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY o_custkey, year(o_orderdate)),
        |t1 AS (SELECT cust, total FROM yearly WHERE yr = 1996),
        |t2 AS (SELECT cust, total FROM yearly WHERE yr = 1997)
        |SELECT t1.cust AS cust, t1.total AS y1996, t2.total AS y1997,
        |       round(t2.total / NULLIF(t1.total, 0), 6) AS growth
        |FROM t1 JOIN t2 ON t1.cust = t2.cust
        |WHERE t1.total > 0 AND t2.total / NULLIF(t1.total, 0) > 1.5
        |ORDER BY growth DESC, cust LIMIT 50""".stripMargin),

    // ntile quartiles over customer revenue, re-aggregated per bucket
    ("qds_ntile_quartiles", Seq("orders"),
      """WITH r AS (
        |  SELECT o_custkey AS cust, round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY o_custkey),
        |b AS (SELECT cust, rev,
        |        ntile(4) OVER (ORDER BY rev DESC, cust) AS quartile FROM r)
        |SELECT quartile, count(*) AS n, round(sum(rev), 2) AS rev,
        |       round(avg(rev), 2) AS avg_rev
        |FROM b GROUP BY quartile ORDER BY quartile""".stripMargin),

    // q49: per-brand return ratio with rank + dense_rank over the ratio
    ("qds_returns_ratio_rank", Seq("lineitem", "part"),
      """WITH ratios AS (
        |  SELECT p_brand AS brand,
        |    round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2) AS ret_q,
        |    round(sum(l_quantity), 2) AS all_q,
        |    round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
        |      / NULLIF(sum(l_quantity), 0), 6) AS ratio
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand)
        |SELECT brand, ret_q, all_q, ratio,
        |       CAST(rank() OVER (ORDER BY ratio DESC, brand) AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER (ORDER BY ratio DESC, brand) AS BIGINT) AS drnk
        |FROM ratios
        |ORDER BY rnk, brand LIMIT 30""".stripMargin),

    // q38: triple-channel INTERSECT audience count
    ("qds_triple_intersect", Seq("orders"),
      """SELECT count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |  INTERSECT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) t""".stripMargin),

    // q25: dual time windows on independent date roles (order vs ship)
    ("qds_dual_date_windows", Seq("lineitem", "orders", "customer", "nation"),
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |       count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_shipdate >= TIMESTAMP '1996-02-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'
        |  AND l_shipdate > o_orderdate
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // first-purchase cohort analysis: min-year cohort joined back to
    // lifetime revenue
    ("qds_first_purchase_cohort", Seq("orders"),
      """WITH firstbuy AS (
        |  SELECT o_custkey AS cust, min(year(o_orderdate)) AS cohort
        |  FROM orders GROUP BY o_custkey),
        |rev AS (
        |  SELECT o_custkey AS cust2, round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY o_custkey)
        |SELECT cohort, count(*) AS customers, round(sum(total), 2) AS lifetime_rev
        |FROM firstbuy JOIN rev ON cust = cust2
        |GROUP BY cohort ORDER BY cohort""".stripMargin),

    // q48: OR'd quantity/discount band predicates folded into one scan
    ("qds_case_band_report", Seq("lineitem"),
      """SELECT
        | round(sum(CASE WHEN l_quantity BETWEEN 1 AND 15
        |   AND l_discount BETWEEN 0.00 AND 0.03 THEN l_extendedprice ELSE 0 END), 2) AS band1,
        | round(sum(CASE WHEN l_quantity BETWEEN 16 AND 30
        |   AND l_discount BETWEEN 0.03 AND 0.07 THEN l_extendedprice ELSE 0 END), 2) AS band2,
        | round(sum(CASE WHEN l_quantity BETWEEN 31 AND 50
        |   AND l_discount BETWEEN 0.07 AND 0.10 THEN l_extendedprice ELSE 0 END), 2) AS band3,
        | count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin),

    // q44: best/worst performers by the same metric, two opposite ranks
    // UNION ALL'd back together
    ("qds_best_worst_items", Seq("lineitem", "part"),
      """WITH perf AS (
        |  SELECT l_partkey AS pk,
        |         round(avg(l_extendedprice * (1 - l_discount)), 2) AS net
        |  FROM lineitem GROUP BY l_partkey),
        |best AS (SELECT pk, net,
        |  CAST(rank() OVER (ORDER BY net DESC, pk) AS BIGINT) AS rk FROM perf),
        |worst AS (SELECT pk, net,
        |  CAST(rank() OVER (ORDER BY net ASC, pk) AS BIGINT) AS rk FROM perf)
        |SELECT 'best' AS side, b.rk AS rk, p_name, b.net AS net
        |FROM best b JOIN part ON b.pk = p_partkey WHERE b.rk <= 10
        |UNION ALL
        |SELECT 'worst' AS side, w.rk AS rk, p_name, w.net AS net
        |FROM worst w JOIN part ON w.pk = p_partkey WHERE w.rk <= 10
        |ORDER BY side, rk""".stripMargin),

    // 8-relation chain with one dimension in two roles and a
    // cross-dimension predicate — the widest join tree in the suite
    ("qds_wide_chain_join", Seq("lineitem", "orders", "customer", "supplier",
      "part", "nation", "region"),
      """SELECT r_name, p_brand, round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |WHERE sn.n_regionkey = cn.n_regionkey
        |GROUP BY r_name, p_brand ORDER BY r_name, p_brand""".stripMargin),

    // correlated scalar subquery against the outer's nation — customers
    // spending above 1.3x their nation's average
    ("qds_above_nation_avg", Seq("orders", "customer", "nation"),
      """WITH spend AS (
        |  SELECT c_custkey AS cust, c_nationkey AS nk,
        |         round(sum(o_totalprice), 2) AS s
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey, c_nationkey)
        |SELECT n_name, count(*) AS big_spenders
        |FROM spend sp JOIN nation ON sp.nk = n_nationkey
        |WHERE sp.s > (SELECT 1.3 * avg(s2.s) FROM spend s2 WHERE s2.nk = sp.nk)
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // share-of-total report: per-segment revenue against unpartitioned
    // window totals
    ("qds_segment_share", Seq("orders", "customer"),
      """WITH seg AS (
        |  SELECT c_mktsegment AS seg, round(sum(o_totalprice), 2) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment)
        |SELECT seg, rev, round(rev / sum(rev) OVER (), 6) AS share,
        |       round(rev - avg(rev) OVER (), 2) AS vs_avg
        |FROM seg ORDER BY seg""".stripMargin),

    // q51.sql: two per-key CUMULATIVE revenue series from different
    // channel branches, FULL OUTER JOINed on (key, period), keeping
    // periods where one channel's running total overtakes the other —
    // the dual-window + full-outer + cross-series filter structure
    ("qds_dual_cumulative_cross", Seq("orders"),
      """WITH urgent AS (
        |  SELECT o_custkey AS k, date_trunc('month', o_orderdate) AS p,
        |         sum(sum(o_totalprice)) OVER (PARTITION BY o_custkey
        |           ORDER BY date_trunc('month', o_orderdate)
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    AND o_custkey < 200
        |  GROUP BY o_custkey, date_trunc('month', o_orderdate)),
        |relaxed AS (
        |  SELECT o_custkey AS k, date_trunc('month', o_orderdate) AS p,
        |         sum(sum(o_totalprice)) OVER (PARTITION BY o_custkey
        |           ORDER BY date_trunc('month', o_orderdate)
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    AND o_custkey < 200
        |  GROUP BY o_custkey, date_trunc('month', o_orderdate))
        |SELECT coalesce(u.k, r.k) AS k, CAST(coalesce(u.p, r.p) AS DATE) AS p,
        |       round(coalesce(u.cum, 0.0), 2) AS urgent_cum,
        |       round(coalesce(r.cum, 0.0), 2) AS relaxed_cum
        |FROM urgent u FULL OUTER JOIN relaxed r ON u.k = r.k AND u.p = r.p
        |WHERE coalesce(u.cum, 0.0) > coalesce(r.cum, 0.0)
        |ORDER BY k, p LIMIT 100""".stripMargin),

    // q88.sql: a grid of independent filtered scalar counts CROSS JOINed
    // into one row — eight time-band counts from one logical table, each
    // its own scalar subquery
    ("qds_scalar_count_grid", Seq("lineitem"),
      """SELECT * FROM
        |  (SELECT count(*) AS q1_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 1 AND 10 AND l_discount < 0.03) a,
        |  (SELECT count(*) AS q2_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 11 AND 20 AND l_discount < 0.03) b,
        |  (SELECT count(*) AS q3_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 21 AND 30 AND l_discount < 0.03) c,
        |  (SELECT count(*) AS q4_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 31 AND 40 AND l_discount < 0.03) d,
        |  (SELECT count(*) AS q5_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 1 AND 10 AND l_discount >= 0.07) e,
        |  (SELECT count(*) AS q6_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 11 AND 20 AND l_discount >= 0.07) f,
        |  (SELECT count(*) AS q7_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 21 AND 30 AND l_discount >= 0.07) g,
        |  (SELECT count(*) AS q8_cnt FROM lineitem
        |   WHERE l_quantity BETWEEN 31 AND 40 AND l_discount >= 0.07) h""".stripMargin)
  )

  val queries: Map[String, Q.Fn] =
    q.map { case (name, tables, sql) => name -> Q.sharedSql(tables, sql)._1 }.toMap

  val oracle: Map[String, String] =
    q.map { case (name, _, sql) => name -> sql }.toMap
}
