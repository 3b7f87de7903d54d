package graft.queries

/** Adapted TPC-H suite — the reference validates against golden TPC-H
  * answers (/root/reference/extension/tpch/dbgen/queries/q01..q22.sql).
  * The driver's star schema is reduced (FIXTURES.md: no partsupp, no
  * comment/phone/shipmode/commitdate columns; synthetic nation names;
  * dates 1995-2001), so the queries whose column set survives are
  * adapted here with matching literals: q7, q8, q10, q14, q15, q18 —
  * plus q1/q3/q5/q6 in Headline. All dialect-shared SQL, value-matched.
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
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 }
  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 }
}
