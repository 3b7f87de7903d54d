package graft.queries

/** Adapted TPC-H suite — the reference validates against golden TPC-H
  * answers (/root/reference/extension/tpch/dbgen/queries/q01..q22.sql).
  * The driver's star schema is reduced (FIXTURES.md: no partsupp, no
  * comment/phone/shipmode/commitdate columns; synthetic nation names;
  * dates 1995-2001), so the queries whose column set survives are
  * adapted here with matching literals: q7, q8, q10, q14, q15, q18 —
  * plus q1/q3/q5/q6 in Headline. All dialect-shared SQL, value-matched.
  *
  * The remaining nine (q2/q4/q9/q11/q12/q16/q20/q21/q22) need columns
  * the fixtures drop (partsupp, commitdate/receiptdate, shipmode,
  * phone), so each is re-expressed to keep the reference query's PLAN
  * SHAPE — the operator composition the suite exists to exercise — on
  * the surviving columns: part-supplier pairs come from lineitem
  * (l_partkey, l_suppkey), ship lateness replaces the commit/receipt
  * comparison, and c_name digits replace the phone country code. Every
  * adaptation stays dialect-shared SQL and fully value-matched.
  */
object Tpch {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    "q7_volume_shipping" -> Q.sharedSql(Seq("supplier", "lineitem", "orders", "customer", "nation"),
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue FROM (
        | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  l_extendedprice * (1 - l_discount) AS volume
        | FROM supplier
        | JOIN lineitem ON s_suppkey = l_suppkey
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON c_custkey = o_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        | WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),

    "q8_market_share" -> Q.sharedSql(
      Seq("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
      """SELECT o_year,
        | round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
        |   / sum(volume), 6) AS mkt_share
        |FROM (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS supp_nation
        | FROM part
        | JOIN lineitem ON p_partkey = l_partkey
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        | WHERE r_name = 'AMERICA'
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |  AND p_type = 'ECONOMY') allnations
        |GROUP BY o_year ORDER BY o_year""".stripMargin),

    "q10_returned_items" -> Q.sharedSql(Seq("customer", "orders", "lineitem", "nation"),
      """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),

    "q14_promo_effect" -> Q.sharedSql(Seq("lineitem", "part"),
      """SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |   / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin),

    "q15_top_supplier" -> Q.sharedSql(Seq("supplier", "lineitem"),
      """WITH revenue0 AS (
        | SELECT l_suppkey AS supplier_no,
        |  sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)
        |ORDER BY s_suppkey""".stripMargin),

    "q13_customer_distribution" -> Q.sharedSql(Seq("customer", "orders"),
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),

    "q17_small_quantity" -> Q.sharedSql(Seq("lineitem", "part"),
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        | AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                   FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin),

    "q19_discounted_revenue" -> Q.sharedSql(Seq("lineitem", "part"),
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity >= 5 AND l_quantity <= 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity >= 10 AND l_quantity <= 50)""".stripMargin),

    "q18_large_volume" -> Q.sharedSql(Seq("customer", "orders", "lineitem"),
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | round(o_totalprice, 2) AS o_totalprice, round(sum(l_quantity), 2) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        | SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // q2 shape: correlated scalar-min subquery + 5-way join + region
    // filter (reference q02 over partsupp.ps_supplycost; here the
    // part-supplier offer is a lineitem and unit cost is price/qty)
    "q2_min_cost_supplier" -> Q.sharedSql(
      Seq("part", "supplier", "lineitem", "nation", "region"),
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        | AND p_size = 15 AND p_type = 'SMALL'
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'EUROPE'
        | AND l_extendedprice / l_quantity = (
        |  SELECT min(l2.l_extendedprice / l2.l_quantity)
        |  FROM lineitem l2, supplier s2, nation n2, region r2
        |  WHERE p_partkey = l2.l_partkey AND s2.s_suppkey = l2.l_suppkey
        |   AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |   AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin),

    // q4 shape: EXISTS semi-join + priority count (lateness vs
    // o_orderdate replaces the dropped commit/receipt comparison)
    "q4_order_priority" -> Q.sharedSql(Seq("orders", "lineitem"),
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        | AND o_orderdate < TIMESTAMP '1996-10-01'
        | AND EXISTS (SELECT * FROM lineitem
        |             WHERE l_orderkey = o_orderkey
        |              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // q9 shape: p_name LIKE scan + 5-way join + nation×year profit agg
    // (unit cost proxied by 10% of p_retailprice; no ps_supplycost)
    "q9_product_type_profit" -> Q.sharedSql(
      Seq("part", "lineitem", "supplier", "orders", "nation"),
      """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit FROM (
        | SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS amount
        | FROM part
        | JOIN lineitem ON p_partkey = l_partkey
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN nation ON s_nationkey = n_nationkey
        | WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin),

    // q11 shape: grouped value agg + scalar-subquery threshold in HAVING
    // (flow value from lineitem replaces partsupp stock value)
    "q11_important_flow" -> Q.sharedSql(Seq("lineitem", "supplier", "nation"),
      """SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |GROUP BY l_partkey
        |HAVING sum(l_extendedprice * l_quantity) > (
        | SELECT sum(l_extendedprice * l_quantity) * 0.001
        | FROM lineitem
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | WHERE n_name = 'NATION_7')
        |ORDER BY value DESC, l_partkey""".stripMargin),

    // q12 shape: join + dual conditional counts by a lineitem category
    // (l_returnflag stands in for the dropped l_shipmode; lateness vs
    // o_orderdate for the commit/receipt window)
    "q12_shipping_priority_class" -> Q.sharedSql(Seq("orders", "lineitem"),
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('A', 'N')
        | AND l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // q16 shape: NOT IN anti-subquery + count(DISTINCT supplier) by part
    // attrs (pairs from lineitem; negative balance flags the supplier
    // the way comment-matched complaints do in the reference)
    "q16_supplier_part_cnt" -> Q.sharedSql(Seq("lineitem", "part", "supplier"),
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PRO%'
        | AND p_size IN (1, 4, 7, 10, 13, 16, 19, 25)
        | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),

    // q20 shape: nested IN subqueries (part name scan feeding a grouped
    // HAVING over shipments) gating a nation-filtered supplier list
    "q20_excess_shipments" -> Q.sharedSql(
      Seq("supplier", "nation", "lineitem", "part"),
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        | AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |   AND l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey
        |  HAVING sum(l_quantity) > 30)
        |ORDER BY s_name""".stripMargin),

    // q21 shape: EXISTS + NOT EXISTS correlated self-joins on lineitem
    // (the only-late-supplier-in-a-multi-supplier-order pattern, with
    // ship lateness vs o_orderdate replacing receipt/commit)
    "q21_waiting_supplier" -> Q.sharedSql(
      Seq("supplier", "lineitem", "orders", "nation"),
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
        | AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        | AND EXISTS (SELECT * FROM lineitem l2
        |             WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT * FROM lineitem l3
        |                 WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey
        |                  AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),

    // q22 shape: substring-derived segment + scalar avg subquery +
    // NOT EXISTS anti-join (c_name digits replace the phone country
    // code; "no recent orders" replaces "no orders", which is empty on
    // the fixtures — every customer has at least one order)
    "q22_global_sales_opportunity" -> Q.sharedSql(Seq("customer", "orders"),
      """SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        |FROM (
        | SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
        | FROM customer
        | WHERE substring(c_name, 17, 2) IN ('13', '31', '23', '29', '30', '18', '17')
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.00)
        |) custsale
        |WHERE NOT EXISTS (SELECT * FROM orders
        |                  WHERE o_custkey = c_custkey
        |                   AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 }
  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 }
}
