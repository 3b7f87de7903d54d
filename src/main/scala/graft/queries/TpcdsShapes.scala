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
        |   WHERE l_quantity BETWEEN 31 AND 40 AND l_discount >= 0.07) h""".stripMargin),

    // q17.sql: wide star — two fact roles of lineitem (sales + returns
    // lines of the same order/part) through orders/customer/nation/part
    // dims with two role-played date windows, count/avg/stddev stats.
    // avg/stddev are over small integer-quantity groups rounded at 4
    // decimals (tie-free for small-denominator rationals — see the
    // cb_filter_multi_agg post-mortem in OlapShapes)
    ("qds_star_quantity_stats", Seq("lineitem", "orders", "customer",
      "nation", "part"),
      """SELECT p_brand, n_name,
        | count(s.l_quantity) AS qty_cnt,
        | round(avg(s.l_quantity), 4) AS qty_avg,
        | round(stddev_samp(s.l_quantity), 4) AS qty_sd,
        | count(r.l_quantity) AS ret_cnt,
        | round(avg(r.l_quantity), 4) AS ret_avg
        |FROM lineitem s
        |JOIN orders ON s.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN part ON s.l_partkey = p_partkey
        |JOIN lineitem r ON r.l_orderkey = s.l_orderkey
        | AND r.l_partkey = s.l_partkey AND r.l_returnflag = 'R'
        | AND r.l_linenumber <> s.l_linenumber
        |WHERE s.l_returnflag <> 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND s.l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND s.l_shipdate < TIMESTAMP '1997-07-01'
        |GROUP BY p_brand, n_name
        |ORDER BY p_brand, n_name
        |LIMIT 100""".stripMargin),

    // q25.sql: same star graph, profit sums instead of stats, supplier
    // dim in place of customer
    ("qds_star_profit_sums", Seq("lineitem", "orders", "supplier",
      "nation", "part"),
      """SELECT p_brand, n_name,
        | round(sum(s.l_extendedprice * (1 - s.l_discount)), 2) AS net_sales,
        | round(sum(r.l_extendedprice), 2) AS returned_value,
        | count(*) AS pair_cnt
        |FROM lineitem s
        |JOIN orders ON s.l_orderkey = o_orderkey
        |JOIN supplier ON s.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN part ON s.l_partkey = p_partkey
        |JOIN lineitem r ON r.l_orderkey = s.l_orderkey
        | AND r.l_partkey = s.l_partkey AND r.l_returnflag = 'R'
        | AND r.l_linenumber <> s.l_linenumber
        |WHERE s.l_returnflag <> 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY p_brand, n_name
        |ORDER BY net_sales DESC, p_brand, n_name
        |LIMIT 100""".stripMargin),

    // q47.sql: monthly sums with an avg-over-year window and a
    // sequence rank, self-joined at rn±1 for prev/next month, filtered
    // to months deviating >5% from the yearly average (the windowed
    // average stays in the FILTER only — rounding an avg of money is
    // the .xx5-tie trap)
    ("qds_monthly_vs_avg_selfjoin", Seq("lineitem", "orders", "part"),
      """WITH v1 AS (
        |  SELECT p_brand AS brand,
        |         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |         CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS moy,
        |         round(sum(l_extendedprice), 2) AS sum_sales,
        |         avg(sum(l_extendedprice)) OVER (
        |           PARTITION BY p_brand, EXTRACT(YEAR FROM o_orderdate)) AS avg_monthly,
        |         CAST(rank() OVER (PARTITION BY p_brand
        |           ORDER BY EXTRACT(YEAR FROM o_orderdate),
        |                    EXTRACT(MONTH FROM o_orderdate)) AS INT) AS rn
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate),
        |           EXTRACT(MONTH FROM o_orderdate))
        |SELECT v.brand AS brand, v.yr AS yr, v.moy AS moy, v.sum_sales AS sum_sales,
        |       p.sum_sales AS psum, nx.sum_sales AS nsum
        |FROM v1 v JOIN v1 p  ON v.brand = p.brand  AND v.rn = p.rn + 1
        |          JOIN v1 nx ON v.brand = nx.brand AND v.rn = nx.rn - 1
        |WHERE v.yr = 1996 AND v.avg_monthly > 0
        |  AND abs(v.sum_sales - v.avg_monthly) / v.avg_monthly > 0.05
        |ORDER BY brand, yr, moy
        |LIMIT 100""".stripMargin),

    // q57.sql: the same structure as a pure window chain — lag/lead +
    // per-partition avg + rank in one SELECT over a monthly CTE
    ("qds_multi_window_chain", Seq("events"),
      """WITH m AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
        |         round(sum(value), 2) AS v
        |  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE))
        |SELECT event_type, d, v,
        |  lag(v) OVER (PARTITION BY event_type ORDER BY d) AS pv,
        |  lead(v) OVER (PARTITION BY event_type ORDER BY d) AS nv,
        |  CAST(rank() OVER (PARTITION BY event_type ORDER BY v DESC, d) AS INT) AS rk
        |FROM m
        |ORDER BY event_type, d""".stripMargin),

    // q67.sql: WITH-tower — ROLLUP over a 3-level hierarchy, then
    // rank-within-top-level over the rolled output, top-N per level
    ("qds_rollup_rank_tower", Seq("orders", "customer", "nation"),
      """SELECT * FROM (
        |  SELECT seg, nat, yr, sumsales,
        |         CAST(rank() OVER (PARTITION BY seg
        |           ORDER BY sumsales DESC, nat NULLS FIRST, yr NULLS FIRST) AS INT) AS rk
        |  FROM (
        |    SELECT c_mktsegment AS seg, n_name AS nat,
        |           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |           round(sum(o_totalprice), 2) AS sumsales
        |    FROM orders JOIN customer ON o_custkey = c_custkey
        |                JOIN nation ON c_nationkey = n_nationkey
        |    GROUP BY ROLLUP(c_mktsegment, n_name,
        |                    EXTRACT(YEAR FROM o_orderdate))) dw1) dw2
        |WHERE rk <= 10
        |ORDER BY seg NULLS FIRST, rk, nat NULLS FIRST, yr NULLS FIRST""".stripMargin),

    // q76.sql: per-channel null-column audit — UNION ALL of channel
    // feeds each filtered on an IS NULL predicate, grouped report
    ("qds_channel_union_audit", Seq("lineitem", "orders"),
      """SELECT channel, col_name, yr, count(*) AS sales_cnt,
        |       round(sum(amt), 2) AS sales_amt
        |FROM (
        | SELECT 'store' AS channel, 'return_flag' AS col_name,
        |        CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        |        l_extendedprice AS amt
        | FROM lineitem WHERE NULLIF(l_returnflag, 'N') IS NULL
        | UNION ALL
        | SELECT 'web' AS channel, 'order_status' AS col_name,
        |        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |        o_totalprice AS amt
        | FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL
        | UNION ALL
        | SELECT 'catalog' AS channel, 'priority' AS col_name,
        |        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |        o_totalprice AS amt
        | FROM orders WHERE NULLIF(o_orderpriority, '1-URGENT') IS NULL) foo
        |GROUP BY channel, col_name, yr
        |ORDER BY channel, col_name, yr""".stripMargin),

    // q71.sql: brand revenue by time-of-day across unioned channel
    // feeds, ordered by revenue
    ("qds_brand_time_report", Seq("events"),
      """SELECT event_type AS brand, CAST(EXTRACT(HOUR FROM ts) AS INT) AS hr,
        |       round(sum(value), 2) AS ext_price, count(*) AS n
        |FROM (SELECT ts, event_type, value FROM events WHERE user_id % 2 = 0
        |      UNION ALL
        |      SELECT ts, event_type, value FROM events WHERE user_id % 2 = 1) e
        |WHERE EXTRACT(HOUR FROM ts) IN (8, 9, 10, 17, 18, 19)
        |GROUP BY event_type, EXTRACT(HOUR FROM ts)
        |ORDER BY ext_price DESC, brand, hr
        |LIMIT 50""".stripMargin),

    // q34/q73.sql: dense-buyer detection — per-customer-year order
    // counts gated by HAVING BETWEEN, joined back to the dimension
    ("qds_dense_buyers", Seq("orders", "customer"),
      """WITH cnt AS (
        |  SELECT o_custkey AS cust,
        |         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |         count(*) AS n
        |  FROM orders
        |  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)
        |  HAVING count(*) BETWEEN 3 AND 10)
        |SELECT c_name, cnt.yr AS yr, cnt.n AS n
        |FROM cnt JOIN customer ON cnt.cust = c_custkey
        |ORDER BY n DESC, c_name, yr
        |LIMIT 50""".stripMargin),

    // q98/q12/q20.sql: revenue share within a category via a windowed
    // sum ratio over the grouped output
    ("qds_category_share", Seq("lineitem", "part"),
      """SELECT p_type, round(sum(l_extendedprice), 2) AS itemrevenue,
        |  round(sum(l_extendedprice) * 100.0 /
        |        sum(sum(l_extendedprice)) OVER (PARTITION BY substr(p_type, 1, 6)), 4)
        |    AS revenueratio
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-03-01'
        |GROUP BY p_type
        |ORDER BY substr(p_type, 1, 6), revenueratio DESC, p_type
        |LIMIT 100""".stripMargin),

    // q93.sql: returns-adjusted net position per customer (returned
    // lines flip sign), worst positions first
    ("qds_returns_net_effect", Seq("lineitem", "orders"),
      """SELECT o_custkey AS cust,
        | round(sum(CASE WHEN l_returnflag = 'R'
        |                THEN -(l_extendedprice * (1 - l_discount))
        |                ELSE l_extendedprice * (1 - l_discount) END), 2) AS net
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey
        |ORDER BY net, cust
        |LIMIT 50""".stripMargin),

    // q89.sql: brand-month quantity sums deviating from the brand's
    // average month (windowed avg kept unrounded, used in the filter
    // and reported as a rounded integral-quantity difference at 4dp)
    ("qds_monthly_deviation", Seq("lineitem", "part"),
      """SELECT brand, moy, s, round(s - avg_m, 4) AS dev FROM (
        |  SELECT p_brand AS brand,
        |         CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS moy,
        |         round(sum(l_quantity), 2) AS s,
        |         avg(sum(l_quantity)) OVER (PARTITION BY p_brand) AS avg_m
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY p_brand, EXTRACT(MONTH FROM l_shipdate)) t
        |WHERE abs(s - avg_m) > 5
        |ORDER BY dev, brand, moy
        |LIMIT 100""".stripMargin),

    // q31.sql: quarter-over-quarter growth chain — the quarterly CTE
    // joined to itself three times, one growth ratio per hop
    ("qds_quarterly_growth_chain", Seq("orders", "customer"),
      """WITH q AS (
        |  SELECT c_mktsegment AS seg,
        |         CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
        |         sum(o_totalprice) AS s
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY c_mktsegment, EXTRACT(QUARTER FROM o_orderdate))
        |SELECT q1.seg AS seg, round(q2.s / q1.s, 4) AS g12,
        |       round(q3.s / q2.s, 4) AS g23, round(q4.s / q3.s, 4) AS g34
        |FROM q q1 JOIN q q2 ON q1.seg = q2.seg AND q1.qtr = 1 AND q2.qtr = 2
        |          JOIN q q3 ON q2.seg = q3.seg AND q3.qtr = 3
        |          JOIN q q4 ON q3.seg = q4.seg AND q4.qtr = 4
        |ORDER BY seg""".stripMargin),

    // q65.sql: items whose revenue falls below half the brand average
    ("qds_low_revenue_items", Seq("lineitem", "part"),
      """WITH rev AS (
        |  SELECT p_brand AS brand, l_partkey AS pk, sum(l_extendedprice) AS r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, l_partkey),
        |ba AS (SELECT brand, avg(r) AS ar FROM rev GROUP BY brand)
        |SELECT rev.brand AS brand, pk, round(r, 2) AS revenue
        |FROM rev JOIN ba ON rev.brand = ba.brand
        |WHERE r <= 0.5 * ar
        |ORDER BY brand, pk
        |LIMIT 100""".stripMargin),

    // q59.sql shape: period-over-period ratio via self-join at a month
    // offset (weeks avoided — EXTRACT(WEEK) numbering differs between
    // dialects)
    ("qds_month_over_month", Seq("events"),
      """WITH m AS (
        |  SELECT event_type AS et, CAST(EXTRACT(MONTH FROM ts) AS INT) AS mo,
        |         sum(value) AS s
        |  FROM events GROUP BY event_type, EXTRACT(MONTH FROM ts))
        |SELECT a.et AS et, a.mo AS mo, round(b.s / a.s, 4) AS mom_ratio
        |FROM m a JOIN m b ON a.et = b.et AND b.mo = a.mo + 1
        |ORDER BY et, mo""".stripMargin),

    // q35/q10.sql: multi-EXISTS audience qualification + grouped stats
    ("qds_exists_audience", Seq("customer", "nation", "orders"),
      """SELECT c_mktsegment AS seg, n_name AS nat, count(*) AS cnt,
        |       round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |  AND (EXISTS (SELECT 1 FROM orders
        |               WHERE o_custkey = c_custkey
        |                 AND o_orderpriority = '1-URGENT')
        |       OR EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '5-LOW'))
        |GROUP BY c_mktsegment, n_name
        |ORDER BY seg, nat""".stripMargin),

    // q33/q60.sql: per-brand revenue assembled from three filtered
    // channel CTEs re-aggregated through a UNION ALL
    ("qds_brand_union_ctes", Seq("lineitem", "part"),
      """WITH s1 AS (SELECT p_brand AS b, sum(l_extendedprice) AS s
        |            FROM lineitem JOIN part ON l_partkey = p_partkey
        |            WHERE l_returnflag = 'N' GROUP BY p_brand),
        |s2 AS (SELECT p_brand AS b, sum(l_extendedprice) AS s
        |       FROM lineitem JOIN part ON l_partkey = p_partkey
        |       WHERE l_returnflag = 'R' GROUP BY p_brand),
        |s3 AS (SELECT p_brand AS b, sum(l_extendedprice) AS s
        |       FROM lineitem JOIN part ON l_partkey = p_partkey
        |       WHERE l_returnflag = 'A' GROUP BY p_brand)
        |SELECT b, round(sum(s), 2) AS total
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3) u
        |GROUP BY b
        |ORDER BY total DESC, b
        |LIMIT 50""".stripMargin),

    // q49.sql: worst return ratios ranked (integer-quantity ratio at
    // 4dp — decimal ties of small-denominator rationals are
    // binary-exact, so both dialects round them identically)
    ("qds_worst_return_ratio", Seq("lineitem"),
      """SELECT * FROM (
        |  SELECT pk, round(ret / qty, 4) AS ratio,
        |         CAST(rank() OVER (ORDER BY ret / qty DESC, pk) AS INT) AS rk
        |  FROM (SELECT l_partkey AS pk,
        |               sum(CASE WHEN l_returnflag = 'R' THEN l_quantity
        |                        ELSE 0.0 END) AS ret,
        |               sum(l_quantity) AS qty
        |        FROM lineitem GROUP BY l_partkey
        |        HAVING sum(l_quantity) > 0) r) t
        |WHERE rk <= 25
        |ORDER BY rk""".stripMargin),

    // q75.sql: year-over-year per-brand decline report (count and
    // amount deltas for shrinking brands)
    ("qds_yoy_brand_decline", Seq("lineitem", "part"),
      """WITH y AS (
        |  SELECT p_brand AS b, CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        |         count(*) AS cnt, sum(l_extendedprice) AS amt
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, EXTRACT(YEAR FROM l_shipdate))
        |SELECT c.b AS b, p.yr AS prev_yr, c.yr AS curr_yr,
        |       c.cnt - p.cnt AS cnt_diff, round(c.amt - p.amt, 2) AS amt_diff
        |FROM y c JOIN y p ON c.b = p.b AND c.yr = p.yr + 1
        |WHERE c.cnt < p.cnt
        |ORDER BY amt_diff, b, curr_yr
        |LIMIT 100""".stripMargin),

    // q54.sql: customer lifetime revenue bands
    ("qds_revenue_bands", Seq("orders"),
      """WITH spend AS (
        |  SELECT o_custkey AS cust, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY o_custkey)
        |SELECT CAST(floor(rev / 50000) AS BIGINT) AS band, count(*) AS custs
        |FROM spend
        |GROUP BY floor(rev / 50000)
        |ORDER BY band""".stripMargin),

    // q14.sql: cross-channel item INTERSECT drives the report filter, a
    // scalar avg CTE gates the HAVING — items sold in BOTH channels,
    // reported per channel, only above the global average revenue
    ("qds_cross_channel_items", Seq("lineitem"),
      """WITH cross_items AS (
        |  SELECT l_partkey AS item FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
        |avg_rev AS (SELECT avg(l_extendedprice) * 4 AS a FROM lineitem)
        |SELECT l_returnflag AS channel, l_partkey AS item,
        |       round(sum(l_extendedprice), 2) AS rev, count(*) AS n
        |FROM lineitem JOIN cross_items ON l_partkey = item
        |GROUP BY l_returnflag, l_partkey
        |HAVING sum(l_extendedprice) > (SELECT a FROM avg_rev)
        |ORDER BY channel, rev DESC, item LIMIT 50""".stripMargin),

    // q39.sql: coefficient-of-variation screen + consecutive-period
    // self-join — (supplier, month) quantity stats joined month to
    // month+1, both sides above the variability threshold
    ("qds_cov_selfjoin", Seq("lineitem"),
      """WITH inv AS (
        |  SELECT l_suppkey AS sk, CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS m,
        |         stddev_samp(l_quantity) AS sd, avg(l_quantity) AS mu, count(*) AS n
        |  FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
        |  GROUP BY l_suppkey, EXTRACT(MONTH FROM l_shipdate))
        |SELECT i1.sk AS sk, i1.m AS m1, round(i1.sd / i1.mu, 4) AS cov1,
        |       i2.m AS m2, round(i2.sd / i2.mu, 4) AS cov2
        |FROM inv i1 JOIN inv i2 ON i1.sk = i2.sk AND i2.m = i1.m + 1
        |WHERE i1.sd / i1.mu > 0.55 AND i2.sd / i2.mu > 0.55
        |  AND i1.n > 3 AND i2.n > 3
        |ORDER BY sk, m1 LIMIT 100""".stripMargin),

    // q95.sql: multi-supplier orders with returns — EXISTS self-join on
    // the order (another line from a DIFFERENT supplier) AND an EXISTS
    // returns probe, the web-sales "shipped from more than one
    // warehouse" shape
    ("qds_order_multi_supplier", Seq("lineitem"),
      """SELECT count(DISTINCT l1.l_orderkey) AS n_orders,
        |       round(sum(l1.l_extendedprice), 2) AS rev
        |FROM lineitem l1
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND EXISTS (SELECT 1 FROM lineitem l3
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_returnflag = 'R')""".stripMargin),

    // q94.sql: the NOT EXISTS complement — multi-supplier urgent orders
    // with NO returned line
    ("qds_order_no_returns", Seq("lineitem", "orders"),
      """SELECT count(DISTINCT l1.l_orderkey) AS n_orders,
        |       round(sum(l1.l_extendedprice), 2) AS rev
        |FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_returnflag = 'R')""".stripMargin),

    // q92.sql: "excess discount" — rows whose discount exceeds 1.3 × the
    // correlated per-part average (scalar correlated subquery over the
    // same fact, decorrelated by Catalyst)
    ("qds_excess_discount", Seq("lineitem"),
      """SELECT round(sum(l_extendedprice), 2) AS excess_rev, count(*) AS n
        |FROM lineitem l1
        |WHERE l_discount > (SELECT 1.3 * avg(l2.l_discount) FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin),

    // q21.sql: before/after-date quantity shift per (supplier, part)
    // with a ratio band filter — CASE-split sums from one scan
    ("qds_warehouse_shift", Seq("lineitem"),
      """WITH w AS (
        |  SELECT l_suppkey AS sk, l_partkey AS pk,
        |         sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01'
        |                  THEN l_quantity ELSE 0 END) AS before_q,
        |         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
        |                  THEN l_quantity ELSE 0 END) AS after_q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-06-01'
        |    AND l_shipdate < TIMESTAMP '1997-07-01'
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT sk, pk, CAST(before_q AS INT) AS bq, CAST(after_q AS INT) AS aq
        |FROM w
        |WHERE before_q > 0 AND after_q > 0
        |  AND after_q / before_q BETWEEN 0.667 AND 1.5
        |ORDER BY sk, pk LIMIT 100""".stripMargin),

    // q22.sql / q18.sql: multi-aggregate report over a 3-level ROLLUP
    // hierarchy with GROUPING() level tag (sums at native scale — the
    // cb_filter_multi_agg post-mortem rules out rounded doubles' avgs)
    ("qds_rollup_hierarchy", Seq("orders", "customer", "nation"),
      """SELECT n_name, c_mktsegment AS seg, o_orderpriority AS prio,
        |  CAST(grouping(n_name) + grouping(c_mktsegment)
        |       + grouping(o_orderpriority) AS INT) AS lvl,
        |  round(sum(o_totalprice), 2) AS rev, count(*) AS n
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment, o_orderpriority)
        |ORDER BY lvl, n_name NULLS FIRST, seg NULLS FIRST, prio NULLS FIRST
        |LIMIT 300""".stripMargin),

    // q58.sql: three-way per-item channel balance — each channel's
    // quantity within ±20% of the cross-channel mean (integer quantity
    // sums keep the band compare exact)
    ("qds_three_channel_balance", Seq("lineitem"),
      """WITH r AS (
        |  SELECT l_partkey AS item, l_returnflag AS ch,
        |         sum(l_quantity) AS qv
        |  FROM lineitem GROUP BY l_partkey, l_returnflag)
        |SELECT a.item AS item, CAST(a.qv AS INT) AS qty_a,
        |       CAST(n.qv AS INT) AS qty_n, CAST(rr.qv AS INT) AS qty_r
        |FROM r a JOIN r n ON a.item = n.item JOIN r rr ON a.item = rr.item
        |WHERE a.ch = 'A' AND n.ch = 'N' AND rr.ch = 'R'
        |  AND a.qv BETWEEN 0.8 * (a.qv + n.qv + rr.qv) / 3
        |             AND 1.2 * (a.qv + n.qv + rr.qv) / 3
        |  AND n.qv BETWEEN 0.8 * (a.qv + n.qv + rr.qv) / 3
        |             AND 1.2 * (a.qv + n.qv + rr.qv) / 3
        |  AND rr.qv BETWEEN 0.8 * (a.qv + n.qv + rr.qv) / 3
        |              AND 1.2 * (a.qv + n.qv + rr.qv) / 3
        |ORDER BY item LIMIT 100""".stripMargin),

    // q68.sql: per-(customer, order) report with CASE-split measure and
    // a cross-dimension inequality (customer nation <> supplier nation),
    // HAVING on the split measure, top-N by revenue
    ("qds_cross_nation_orders", Seq("lineitem", "orders", "customer",
      "supplier"),
      """SELECT c_name, o_orderkey, round(sum(l_extendedprice), 2) AS rev,
        |  round(sum(CASE WHEN l_returnflag = 'R'
        |                 THEN l_extendedprice ELSE 0 END), 2) AS ret_rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE c_nationkey <> s_nationkey
        |GROUP BY c_name, o_orderkey
        |HAVING sum(CASE WHEN l_returnflag = 'R'
        |               THEN l_extendedprice ELSE 0 END) > 0
        |ORDER BY rev DESC, o_orderkey LIMIT 50""".stripMargin),

    // q83.sql: per-item returned quantity across three consecutive
    // windows, joined on item, each window's share of the total
    ("qds_returns_window_share", Seq("lineitem"),
      """WITH w1 AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS q FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-05-01' GROUP BY l_partkey),
        |w2 AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS q FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-05-01'
        |    AND l_shipdate < TIMESTAMP '1996-09-01' GROUP BY l_partkey),
        |w3 AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS q FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01' GROUP BY l_partkey)
        |SELECT w1.item AS item,
        |  CAST(w1.q AS INT) AS q1, CAST(w2.q AS INT) AS q2,
        |  CAST(w3.q AS INT) AS q3,
        |  round(w1.q * 100.0 / (w1.q + w2.q + w3.q), 4) AS share1
        |FROM w1 JOIN w2 ON w1.item = w2.item JOIN w3 ON w2.item = w3.item
        |ORDER BY item LIMIT 100""".stripMargin),

    // q45.sql: disjunctive reach — an IN-list dimension predicate OR an
    // uncorrelated IN-subquery over the fact (the OR blocks a plain
    // semi-join conversion)
    ("qds_disjunctive_reach", Seq("orders", "customer", "lineitem"),
      """SELECT c_mktsegment AS seg, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey IN (1, 2, 3)
        |   OR o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     WHERE l_quantity >= 49)
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin),

    // q97.sql: channel-overlap audit — per-customer presence flags from
    // two channel CTEs joined FULL OUTER, counting both/left-only/
    // right-only buyers in one pass
    ("qds_channel_overlap", Seq("orders"),
      """WITH urgent AS (
        |  SELECT DISTINCT o_custkey AS cust FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |relaxed AS (
        |  SELECT DISTINCT o_custkey AS cust FROM orders
        |  WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW'))
        |SELECT
        |  CAST(sum(CASE WHEN u.cust IS NOT NULL AND r.cust IS NOT NULL
        |           THEN 1 ELSE 0 END) AS BIGINT) AS both_channels,
        |  CAST(sum(CASE WHEN u.cust IS NOT NULL AND r.cust IS NULL
        |           THEN 1 ELSE 0 END) AS BIGINT) AS urgent_only,
        |  CAST(sum(CASE WHEN u.cust IS NULL AND r.cust IS NOT NULL
        |           THEN 1 ELSE 0 END) AS BIGINT) AS relaxed_only
        |FROM urgent u FULL OUTER JOIN relaxed r ON u.cust = r.cust""".stripMargin),

    // q64.sql shape: a per-(item, year) stats CTE consumed TWICE — the
    // same derived table self-joined across consecutive years with a
    // price-movement condition
    ("qds_item_year_chain", Seq("lineitem"),
      """WITH iy AS (
        |  SELECT l_partkey AS item,
        |         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS yr,
        |         count(*) AS n, sum(l_extendedprice) AS rev,
        |         sum(l_quantity) AS qty
        |  FROM lineitem
        |  GROUP BY l_partkey, EXTRACT(YEAR FROM l_shipdate))
        |SELECT a.item AS item, a.yr AS y1, CAST(a.n AS INT) AS n1,
        |       round(a.rev, 2) AS rev1, b.yr AS y2, CAST(b.n AS INT) AS n2,
        |       round(b.rev, 2) AS rev2
        |FROM iy a JOIN iy b ON a.item = b.item AND b.yr = a.yr + 1
        |WHERE b.rev > 2 * a.rev AND a.n >= 2 AND b.n >= 2
        |ORDER BY item, y1 LIMIT 100""".stripMargin),

    // q78.sql shape: sales with returns netted out per item-year via a
    // LEFT JOIN on the returns slice, ratio-gated
    ("qds_net_of_returns", Seq("lineitem"),
      """WITH sales AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS sold
        |  FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey),
        |rets AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS returned
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
        |SELECT s.item AS item, CAST(s.sold AS INT) AS sold,
        |       CAST(coalesce(r.returned, 0) AS INT) AS returned
        |FROM sales s LEFT JOIN rets r ON s.item = r.item
        |WHERE coalesce(r.returned, 0) < s.sold * 0.2
        |ORDER BY s.sold DESC, s.item LIMIT 100""".stripMargin),

    // h2oai groupby q9 shape: squared correlation per key pair — the
    // moments/corr machinery under a grouped report
    ("qds_corr_by_key", Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus,
        |  round(pow(corr(l_quantity, l_extendedprice), 2), 4) AS r2,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // q70.sql: rank-window subquery SELECTS the report's dimension
    // members (top-5 nations by revenue), then a ROLLUP report over just
    // those members
    ("qds_top_nations_rollup", Seq("orders", "customer", "nation"),
      """WITH top_nat AS (
        |  SELECT nat FROM (
        |    SELECT n_name AS nat,
        |           rank() OVER (ORDER BY sum(o_totalprice) DESC) AS rnk
        |    FROM orders
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    GROUP BY n_name) t
        |  WHERE rnk <= 5)
        |SELECT n_name, c_mktsegment AS seg,
        |  CAST(grouping(n_name) + grouping(c_mktsegment) AS INT) AS lvl,
        |  round(sum(o_totalprice), 2) AS rev
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name IN (SELECT nat FROM top_nat)
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY lvl, n_name NULLS FIRST, seg NULLS FIRST""".stripMargin)
  )

  /** Shapes whose SQL cannot be dialect-shared (date arithmetic and
    * percentile spellings differ): (name, tables, Spark SQL, DuckDB SQL).
    * Semantics are hand-matched; both sides run live per round.
    */
  private val split: Seq[(String, Seq[String], String, String)] = Seq(

    // q62/q99 shape: shipping-lag CASE buckets — days between order and
    // ship date bucketed per return flag. Spark: datediff(end, start);
    // DuckDB: date subtraction yields integer days.
    ("qds_ship_lag_buckets", Seq("lineitem", "orders"),
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) <= 30
        |          THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        | CAST(sum(CASE WHEN datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))
        |            BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        | CAST(sum(CASE WHEN datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) > 60
        |          THEN 1 ELSE 0 END) AS BIGINT) AS dlate,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 30
        |          THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        | CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
        |            BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        | CAST(sum(CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 60
        |          THEN 1 ELSE 0 END) AS BIGINT) AS dlate,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // q49-family median report: exact interpolated median of integer
    // quantities per segment. Spark: percentile(); DuckDB:
    // quantile_cont() — both exact interpolation, halves are exact.
    ("qds_median_by_segment", Seq("lineitem", "orders", "customer"),
      """SELECT c_mktsegment AS seg,
        | round(percentile(l_quantity, 0.5), 1) AS med_qty,
        | round(percentile(l_quantity, 0.9), 1) AS p90_qty, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin,
      """SELECT c_mktsegment AS seg,
        | round(quantile_cont(l_quantity, 0.5), 1) AS med_qty,
        | round(quantile_cont(l_quantity, 0.9), 1) AS p90_qty, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin),

    // q43.sql: day-of-week pivot — per-nation revenue CASE-bucketed into
    // the seven weekdays off one scan. Spark numbers Sunday=1..Saturday=7
    // (dayofweek); DuckDB numbers Sunday=0..Saturday=6 — the bucket
    // constants shift by one between the dialects.
    ("qds_dow_pivot", Seq("orders", "customer", "nation"),
      """SELECT n_name,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 1
        |                THEN o_totalprice ELSE 0.0 END), 2) AS sun_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 2
        |                THEN o_totalprice ELSE 0.0 END), 2) AS mon_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 3
        |                THEN o_totalprice ELSE 0.0 END), 2) AS tue_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 4
        |                THEN o_totalprice ELSE 0.0 END), 2) AS wed_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 5
        |                THEN o_totalprice ELSE 0.0 END), 2) AS thu_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 6
        |                THEN o_totalprice ELSE 0.0 END), 2) AS fri_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 7
        |                THEN o_totalprice ELSE 0.0 END), 2) AS sat_sales
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
      """SELECT n_name,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 0
        |                THEN o_totalprice ELSE 0.0 END), 2) AS sun_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 1
        |                THEN o_totalprice ELSE 0.0 END), 2) AS mon_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 2
        |                THEN o_totalprice ELSE 0.0 END), 2) AS tue_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 3
        |                THEN o_totalprice ELSE 0.0 END), 2) AS wed_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 4
        |                THEN o_totalprice ELSE 0.0 END), 2) AS thu_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 5
        |                THEN o_totalprice ELSE 0.0 END), 2) AS fri_sales,
        | round(sum(CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) = 6
        |                THEN o_totalprice ELSE 0.0 END), 2) AS sat_sales
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Shared-dialect additions that pair with `split` (same round). */
  private val q2: Seq[(String, Seq[String], String)] = Seq(

    // q82/q37 shape: items in a price band with activity in a date
    // window — dimension band filter driving a fact semi-join report
    ("qds_price_band_items", Seq("lineitem", "part"),
      """SELECT p_brand, count(DISTINCT p_partkey) AS items,
        | round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_retailprice BETWEEN 920 AND 960
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // two-level aggregation (q34/q73 "lines per ticket" histogram):
    // aggregate per order, then a distribution over the aggregates
    ("qds_lines_per_order_hist", Seq("lineitem"),
      """WITH per_order AS (
        |  SELECT l_orderkey, count(*) AS lines FROM lineitem
        |  GROUP BY l_orderkey)
        |SELECT CAST(lines AS INT) AS lines, count(*) AS orders
        |FROM per_order
        |GROUP BY lines ORDER BY lines""".stripMargin),

    // NTILE decile profile over per-customer spend (q-family customer
    // value stratification): window bucketing feeding an aggregate
    ("qds_spend_decile_profile", Seq("orders"),
      """WITH spend AS (
        |  SELECT o_custkey, sum(o_totalprice) AS rev FROM orders
        |  GROUP BY o_custkey),
        |ranked AS (
        |  SELECT rev, CAST(ntile(10) OVER (ORDER BY rev, o_custkey) AS INT) AS decile
        |  FROM spend)
        |SELECT decile, count(*) AS custs, round(sum(rev), 2) AS rev
        |FROM ranked GROUP BY decile ORDER BY decile""".stripMargin))

  /** Round-8 additions: the multi-CTE towers, remaining correlated
    * families, share-of-parent windows, and report lattices the r7
    * verdict listed as the untouched frontier.
    */
  private val q3: Seq[(String, Seq[String], String)] = Seq(

    // q04.sql/q74.sql tower: the year_total CTE materialized once and
    // consumed FOUR times — per-customer-per-channel-per-year totals,
    // channels self-joined across consecutive years, emitting customers
    // whose urgent-channel growth outpaced the standard channel
    ("qds_year_total_tower", Seq("orders"),
      """WITH year_total AS (
        |  SELECT o_custkey AS cust,
        |         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |              THEN 'u' ELSE 's' END AS chan,
        |         sum(o_totalprice) AS total
        |  FROM orders
        |  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2, 3)
        |SELECT s1.cust AS cust,
        |       round(u2.total / u1.total, 4) AS urgent_growth,
        |       round(s2.total / s1.total, 4) AS std_growth
        |FROM year_total s1
        |JOIN year_total s2 ON s1.cust = s2.cust
        |JOIN year_total u1 ON s1.cust = u1.cust
        |JOIN year_total u2 ON s1.cust = u2.cust
        |WHERE s1.chan = 's' AND s2.chan = 's'
        |  AND u1.chan = 'u' AND u2.chan = 'u'
        |  AND s1.yr = 1996 AND s2.yr = 1997
        |  AND u1.yr = 1996 AND u2.yr = 1997
        |  AND s1.total > 0 AND u1.total > 0
        |  AND u2.total / u1.total > s2.total / s1.total
        |ORDER BY cust LIMIT 100""".stripMargin),

    // q02.sql tower: UNION ALL channel feed -> per-(year, month) totals
    // CTE -> year-over-year ratio self-join per month
    ("qds_monthly_channel_ratio", Seq("orders"),
      """WITH feed AS (
        |  SELECT o_orderdate AS d, o_totalprice AS price FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  UNION ALL
        |  SELECT o_orderdate AS d, o_totalprice AS price FROM orders
        |  WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')),
        |monthly AS (
        |  SELECT CAST(EXTRACT(YEAR FROM d) AS INT) AS yr,
        |         CAST(EXTRACT(MONTH FROM d) AS INT) AS mon,
        |         sum(price) AS s
        |  FROM feed GROUP BY 1, 2)
        |SELECT a.mon AS mon, round(a.s, 2) AS s1996, round(b.s, 2) AS s1997,
        |       round(a.s / b.s, 4) AS ratio
        |FROM monthly a JOIN monthly b ON a.mon = b.mon
        |WHERE a.yr = 1996 AND b.yr = 1997
        |ORDER BY mon""".stripMargin),

    // q01.sql: customer_total_return CTE consumed twice — outer report
    // rows kept only when above 1.2x the AVERAGE of their nation peer
    // group (correlated scalar subquery over the same CTE)
    ("qds_returns_above_nation_avg", Seq("lineitem", "orders", "customer"),
      """WITH ctr AS (
        |  SELECT o_custkey AS cust, c_nationkey AS nat,
        |         sum(l_extendedprice) AS ret
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey, c_nationkey)
        |SELECT c.c_name AS name, round(ctr1.ret, 2) AS ret
        |FROM ctr ctr1 JOIN customer c ON ctr1.cust = c.c_custkey
        |WHERE ctr1.nat IN (1, 2, 3)
        |  AND ctr1.ret > (SELECT avg(ctr2.ret) * 1.2 FROM ctr ctr2
        |                  WHERE ctr1.nat = ctr2.nat)
        |ORDER BY name LIMIT 100""".stripMargin),

    // q32.sql: "excess discount" within a DATE WINDOW — like q92's
    // correlated screen (qds_excess_discount) but the 1.3x per-item
    // average is computed over the same bounded window, behind a
    // dimension band filter
    ("qds_excess_discount_windowed", Seq("lineitem", "part"),
      """SELECT round(sum(l1.l_extendedprice * l1.l_discount), 2) AS excess,
        |       count(*) AS n
        |FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
        |WHERE p_size = 15
        |  AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l1.l_shipdate < TIMESTAMP '1996-07-01'
        |  AND l1.l_extendedprice * l1.l_discount >
        |    (SELECT 1.3 * avg(l2.l_extendedprice * l2.l_discount)
        |     FROM lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey
        |       AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
        |       AND l2.l_shipdate < TIMESTAMP '1996-07-01')""".stripMargin),

    // q44.sql: best/worst performers — the same per-item aggregate
    // ranked ascending AND descending, the two rank streams equi-joined
    // on rnk, item names resolved from the dimension twice
    ("qds_best_worst_rank", Seq("lineitem", "part"),
      """WITH perf AS (
        |  SELECT l_partkey AS item,
        |         avg(l_extendedprice * (1 - l_discount)) AS m
        |  FROM lineitem WHERE l_suppkey % 10 = 4
        |  GROUP BY l_partkey)
        |SELECT CAST(a.rnk AS INT) AS rnk, pa.p_name AS best, pb.p_name AS worst
        |FROM (SELECT item, rank() OVER (ORDER BY m DESC, item) AS rnk FROM perf) a
        |JOIN (SELECT item, rank() OVER (ORDER BY m ASC, item) AS rnk FROM perf) b
        |  ON a.rnk = b.rnk
        |JOIN part pa ON a.item = pa.p_partkey
        |JOIN part pb ON b.item = pb.p_partkey
        |WHERE a.rnk <= 10 ORDER BY rnk""".stripMargin),

    // q86.sql: ROLLUP hierarchy with share-of-parent — each row's revenue
    // as a percentage of its parent level via a window over the rolled-up
    // aggregate (q36 sibling: share instead of rank)
    ("qds_rollup_share_of_parent", Seq("orders", "customer", "nation"),
      """WITH base AS (
        |  SELECT n_name AS nat, c_mktsegment AS seg,
        |         CAST(grouping(n_name) AS INT) AS g_nat,
        |         CAST(grouping(c_mktsegment) AS INT) AS g_seg,
        |         sum(o_totalprice) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY ROLLUP(n_name, c_mktsegment))
        |SELECT nat, seg, g_nat + g_seg AS lvl, round(rev, 2) AS rev,
        |  round(rev * 100 / sum(rev) OVER (PARTITION BY g_nat + g_seg, nat), 4)
        |    AS share_of_parent
        |FROM base
        |ORDER BY lvl, nat NULLS FIRST, seg NULLS FIRST""".stripMargin),

    // q87.sql: EXCEPT-chained audiences — distinct (customer, day) pairs
    // in the urgent channel minus the low channel minus the medium
    // channel, counted
    ("qds_except_audience", Seq("orders"),
      """SELECT count(*) AS n FROM (
        |  (SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
        |   FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |  EXCEPT
        |  (SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
        |   FROM orders WHERE o_orderpriority = '5-LOW')
        |  EXCEPT
        |  (SELECT DISTINCT o_custkey AS cust, CAST(o_orderdate AS DATE) AS d
        |   FROM orders WHERE o_orderpriority = '3-MEDIUM')) t""".stripMargin),

    // q61.sql: promotional-vs-total ratio — two single-row aggregate
    // subqueries cross-joined into one percentage report
    ("qds_promo_ratio", Seq("orders", "customer"),
      """SELECT round(p.promo, 2) AS promo, round(t.total, 2) AS total,
        |       round(p.promo / t.total * 100, 4) AS pct
        |FROM (SELECT sum(o_totalprice) AS promo
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |      WHERE c_mktsegment = 'BUILDING'
        |        AND o_orderpriority IN ('1-URGENT', '2-HIGH')) p,
        |     (SELECT sum(o_totalprice) AS total
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |      WHERE c_mktsegment = 'BUILDING') t""".stripMargin),

    // q13.sql/q48.sql: OR-of-ANDs band predicates — three disjoint
    // (priority, quantity band, discount band) arms over the joined fact
    ("qds_or_of_ands_bands", Seq("lineitem", "orders"),
      """SELECT round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(sum(l_extendedprice), 2) AS rev, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE (o_orderpriority = '1-URGENT'
        |       AND l_quantity BETWEEN 1 AND 15
        |       AND l_discount BETWEEN 0.02 AND 0.04)
        |   OR (o_orderpriority = '3-MEDIUM'
        |       AND l_quantity BETWEEN 16 AND 35
        |       AND l_discount BETWEEN 0.04 AND 0.07)
        |   OR (o_orderpriority = '5-LOW'
        |       AND l_quantity BETWEEN 36 AND 50
        |       AND l_discount BETWEEN 0.00 AND 0.02)""".stripMargin),

    // q10.sql/q69.sql: multi-channel customer profile — EXISTS in the
    // urgent channel, IN the medium channel, NOT EXISTS in the low
    // channel, demographic counts per segment (conjunctive subqueries)
    ("qds_exists_profile", Seq("orders", "customer"),
      """SELECT c_mktsegment AS seg, count(*) AS cnt
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_orderpriority = '1-URGENT')
        |  AND c.c_custkey IN (SELECT o_custkey FROM orders
        |                      WHERE o_orderpriority = '3-MEDIUM')
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderpriority = '5-LOW')
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin),

    // q23.sql HAVING arm / q24.sql: grouped spend gated on a fraction of
    // an uncorrelated single-row total (HAVING vs scalar subquery)
    ("qds_having_vs_total", Seq("orders", "customer"),
      """SELECT c_name AS name, round(sum(o_totalprice), 2) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name
        |HAVING sum(o_totalprice) >
        |  (SELECT 0.0001 * sum(o_totalprice) FROM orders)
        |ORDER BY name LIMIT 100""".stripMargin),

    // q66.sql: wide monthly report — one row per supplier, revenue
    // CASE-bucketed into months off a single scan
    ("qds_monthly_wide_report", Seq("lineitem"),
      """SELECT l_suppkey,
        | round(sum(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 1
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS m1,
        | round(sum(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 2
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS m2,
        | round(sum(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 3
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS m3,
        | round(sum(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 4
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS m4,
        | round(sum(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 5
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS m5,
        | round(sum(CASE WHEN EXTRACT(MONTH FROM l_shipdate) = 6
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS m6,
        | round(sum(l_extendedprice), 2) AS total
        |FROM lineitem
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
        |  AND EXTRACT(MONTH FROM l_shipdate) <= 6
        |GROUP BY l_suppkey ORDER BY l_suppkey LIMIT 100""".stripMargin),

    // q53.sql/q63.sql: quarterly deviation screen — per-item quarterly
    // revenue vs its avg-over-year window, keeping quarters that deviate
    // more than 60%
    // Money is summed as exact integer cents: a double sum's last ulp is
    // accumulation-order-dependent, and round(x, 2) right at a .005
    // boundary then diverges between engines (observed: 60066.165)
    ("qds_quarter_deviation", Seq("lineitem"),
      """WITH qrev AS (
        |  SELECT l_partkey AS item,
        |         CAST(EXTRACT(QUARTER FROM l_shipdate) AS INT) AS qtr,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
        |  GROUP BY 1, 2)
        |SELECT item, qtr, rev_c, CAST(round(avg_c) AS BIGINT) AS avg_rev_c
        |FROM (SELECT item, qtr, rev_c,
        |             avg(rev_c) OVER (PARTITION BY item) AS avg_c
        |      FROM qrev) t
        |WHERE abs(rev_c - avg_c) / avg_c > 0.6
        |ORDER BY item, qtr LIMIT 100""".stripMargin),

    // q12.sql/q20.sql/q98.sql: revenue share within class — per-item
    // revenue as a ratio of its brand's total via a partitioned window
    ("qds_class_revenue_share", Seq("lineitem", "part"),
      """WITH rev AS (
        |  SELECT p_brand AS brand, l_partkey AS item,
        |         sum(l_extendedprice) AS r
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY p_brand, l_partkey)
        |SELECT brand, item, round(r, 2) AS rev,
        |       round(r * 100 / sum(r) OVER (PARTITION BY brand), 4) AS share
        |FROM rev ORDER BY brand, item LIMIT 100""".stripMargin),

    // q27.sql/q26.sql: multi-dimension star report — avg metrics per
    // (brand, nation) over a banded dimension filter
    ("qds_multidim_avg_report", Seq("lineitem", "part", "supplier", "nation"),
      """SELECT p_brand, n_name,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price, count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_size IN (5, 10, 15)
        |GROUP BY p_brand, n_name ORDER BY p_brand, n_name LIMIT 100""".stripMargin),

    // q40.sql: before/after split around an event date — per-item revenue
    // CASE-bucketed on the two sides of the boundary in one scan
    ("qds_before_after_split", Seq("lineitem"),
      """SELECT l_partkey AS item,
        | round(sum(CASE WHEN l_shipdate < TIMESTAMP '1996-07-01'
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS before_rev,
        | round(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-07-01'
        |                THEN l_extendedprice ELSE 0.0 END), 2) AS after_rev
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_partkey ORDER BY item LIMIT 100""".stripMargin),

    // q08.sql-form: banded-attribute customer slice report — revenue per
    // nation for the acctbal band the campaign targets
    ("qds_acctbal_band_report", Seq("orders", "customer", "nation"),
      """SELECT n_name, round(sum(o_totalprice), 2) AS rev, count(*) AS n
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal BETWEEN 1000 AND 5000
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // q28.sql: six-bucket profile — independent single-row aggregate
    // subqueries over disjoint value bands (avg + count + count DISTINCT
    // each), cross-joined into one report row
    ("qds_bucketed_distinct_profile", Seq("lineitem"),
      """SELECT round(b1.a, 4) AS a1, b1.n AS n1, b1.nd AS nd1,
        |       round(b2.a, 4) AS a2, b2.n AS n2, b2.nd AS nd2,
        |       round(b3.a, 4) AS a3, b3.n AS n3, b3.nd AS nd3
        |FROM
        | (SELECT avg(l_extendedprice) AS a, count(*) AS n,
        |         count(DISTINCT l_partkey) AS nd
        |  FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) b1,
        | (SELECT avg(l_extendedprice) AS a, count(*) AS n,
        |         count(DISTINCT l_partkey) AS nd
        |  FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) b2,
        | (SELECT avg(l_extendedprice) AS a, count(*) AS n,
        |         count(DISTINCT l_partkey) AS nd
        |  FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) b3""".stripMargin),

    // q19.sql: OR of conjunctive arms constraining BOTH the dimension
    // and the fact in each arm (brand × quantity band pairs)
    ("qds_multi_or_bands_join", Seq("lineitem", "part"),
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |       count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_size BETWEEN 6 AND 15 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_size BETWEEN 16 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // q29.sql/q25.sql: three-phase movement chain — sold, returned, and
    // open quantities per item from three filtered slices of the same
    // fact, inner-joined (items present in all three)
    ("qds_three_phase_chain", Seq("lineitem"),
      """WITH sold AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS q FROM lineitem
        |  WHERE l_returnflag = 'N' GROUP BY l_partkey),
        |returned AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS q FROM lineitem
        |  WHERE l_returnflag = 'R' GROUP BY l_partkey),
        |open_ AS (
        |  SELECT l_partkey AS item, sum(l_quantity) AS q FROM lineitem
        |  WHERE l_linestatus = 'O' GROUP BY l_partkey)
        |SELECT s.item AS item, CAST(s.q AS INT) AS sold_q,
        |       CAST(r.q AS INT) AS ret_q, CAST(o.q AS INT) AS open_q
        |FROM sold s JOIN returned r ON s.item = r.item
        |JOIN open_ o ON s.item = o.item
        |ORDER BY item LIMIT 100""".stripMargin),

    // q41.sql: correlated count over the DIMENSION itself — parts whose
    // brand carries at least 4 distinct types
    ("qds_dim_self_count", Seq("part"),
      """SELECT DISTINCT p_name AS name
        |FROM part p1
        |WHERE p_retailprice BETWEEN 900 AND 1100
        |  AND (SELECT count(DISTINCT p2.p_type) FROM part p2
        |       WHERE p2.p_brand = p1.p_brand) >= 4
        |ORDER BY name LIMIT 100""".stripMargin),

    // q46.sql/q79.sql: consecutive-order attribute change per customer —
    // lag window over the order stream, changes counted per segment
    ("qds_order_pair_change", Seq("orders", "customer"),
      """WITH seq AS (
        |  SELECT c_mktsegment AS seg, o_custkey,
        |         o_orderpriority AS prio,
        |         lag(o_orderpriority) OVER (
        |           PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev_prio
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT seg,
        |  CAST(sum(CASE WHEN prev_prio IS NOT NULL AND prio <> prev_prio
        |                THEN 1 ELSE 0 END) AS BIGINT) AS changes,
        |  CAST(sum(CASE WHEN prev_prio IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS pairs
        |FROM seq GROUP BY seg ORDER BY seg""".stripMargin),

    // q91.sql: returns-loss report over two dimensions with a HAVING
    // loss threshold
    ("qds_returns_loss_report", Seq("lineitem", "orders", "customer", "nation"),
      """SELECT n_name, c_mktsegment AS seg,
        |       round(sum(l_extendedprice), 2) AS loss, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY n_name, c_mktsegment
        |HAVING sum(l_extendedprice) > 100000
        |ORDER BY n_name, seg""".stripMargin),

    // q96.sql: narrow selective count through a dimension chain
    ("qds_narrow_count", Seq("orders", "customer", "nation"),
      """SELECT count(*) AS n
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderpriority = '1-URGENT'
        |  AND c_mktsegment = 'BUILDING'
        |  AND n_regionkey = 1""".stripMargin),

    // q18.sql: multi-measure average profile under ROLLUP with numeric
    // casts (the DS "catalog purchase profile" report)
    ("qds_avg_profile_rollup", Seq("lineitem", "orders", "customer"),
      """SELECT c_mktsegment AS seg, l_returnflag AS rf,
        |  CAST(grouping(c_mktsegment) + grouping(l_returnflag) AS INT) AS lvl,
        |  round(avg(CAST(l_quantity AS DOUBLE)), 4) AS aq,
        |  round(avg(CAST(l_extendedprice AS DOUBLE)), 4) AS ap,
        |  round(avg(CAST(l_discount AS DOUBLE)), 6) AS ad,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP(c_mktsegment, l_returnflag)
        |ORDER BY lvl, seg NULLS FIRST, rf NULLS FIRST""".stripMargin),

    // q56.sql/q60.sql: cross-channel item report — three channel CTEs of
    // per-item revenue UNION ALL'd, re-summed, top-N by total
    ("qds_union_topn_items", Seq("lineitem"),
      """WITH c1 AS (
        |  SELECT l_partkey AS item, sum(l_extendedprice) AS rev
        |  FROM lineitem WHERE l_linenumber = 1 GROUP BY l_partkey),
        |c2 AS (
        |  SELECT l_partkey AS item, sum(l_extendedprice) AS rev
        |  FROM lineitem WHERE l_linenumber = 2 GROUP BY l_partkey),
        |c3 AS (
        |  SELECT l_partkey AS item, sum(l_extendedprice) AS rev
        |  FROM lineitem WHERE l_linenumber >= 3 GROUP BY l_partkey)
        |SELECT item, round(sum(rev), 2) AS total
        |FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |      UNION ALL SELECT * FROM c3) u
        |GROUP BY item
        |ORDER BY total DESC, item LIMIT 100""".stripMargin))

  // Seq→toMap silently last-wins: a duplicated key would DROP an
  // existing green pin without any failure. Fail loudly at object init.
  require({
    val names = (q ++ q2 ++ q3).map(_._1) ++ split.map(_._1)
    names.distinct.size == names.size
  }, "duplicate TpcdsShapes query keys")

  val queries: Map[String, Q.Fn] =
    (q ++ q2 ++ q3).map { case (name, tables, sql) => name -> Q.sharedSql(tables, sql)._1 }.toMap ++
      split.map { case (name, tables, sparkSql, _) =>
        name -> (((s: org.apache.spark.sql.SparkSession, d: String) => {
          tables.foreach(t => graft.Tables(s, d, t).createOrReplaceTempView(t))
          s.sql(sparkSql)
        }): Q.Fn)
      }.toMap

  val oracle: Map[String, String] =
    (q ++ q2 ++ q3).map { case (name, _, sql) => name -> sql }.toMap ++
      split.map { case (name, _, _, duckSql) => name -> duckSql }.toMap
}
