package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, PositionalJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-type coverage — SURVEY.md §2.3.
  *
  * Join kinds in the reference enum
  * (/root/reference/src/include/duckdb/common/enums/join_type.hpp:18-33):
  * INNER (headline q3/q5), SEMI, ANTI, RIGHT, FULL OUTER, CROSS, MARK
  * (IN-subquery), SINGLE (scalar subquery), ASOF, POSITIONAL, plus
  * non-equi range joins (physical_piecewise_merge_join.cpp).
  */
object Joins {

  private val sharedSqlQueries: Map[String, (Q.Fn, String)] = Map(
    // MARK join: IN-subquery, planned by Catalyst as a semi join
    "join_in_subquery" -> Q.sharedSql(Seq("orders", "customer"),
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // SINGLE join: uncorrelated scalar subquery
    "join_scalar_subquery" -> Q.sharedSql(Seq("customer"),
      """SELECT c_custkey, c_acctbal,
        | (SELECT round(avg(c_acctbal),6) FROM customer) AS avg_bal
        |FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin),

    // correlated scalar subquery → Catalyst decorrelation
    // (reference: src/planner/subquery/flatten_dependent_join.cpp)
    "join_correlated_subquery" -> Q.sharedSql(Seq("orders"),
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT 2*avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey LIMIT 100""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = sharedSqlQueries.map { case (k, v) => k -> v._1 } ++ Map[String, Q.Fn](
    "join_semi" -> { (s, d) =>
      val big = Tables(s, d, "orders").filter(col("o_totalprice") > 400000)
      Tables(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")).limit(100)
    },

    "join_anti" -> { (s, d) =>
      val big = Tables(s, d, "orders").filter(col("o_totalprice") > 300000)
      Tables(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")).limit(100)
    },

    "join_right_outer" -> { (s, d) =>
      val parts = Tables(s, d, "part").filter(col("p_size") === 48)
      Tables(s, d, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"), "right")
        .groupBy(col("p_partkey"))
        .agg(count(col("l_orderkey")).as("n_li"))
        .orderBy(col("p_partkey")).limit(200)
    },

    "join_full_outer" -> { (s, d) =>
      val p = Tables(s, d, "part").filter(col("p_size") > 47)
        .select(col("p_partkey"), col("p_size"))
      val l = Tables(s, d, "lineitem").filter(col("l_quantity") >= 49)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_li"))
      p.join(l, col("p_partkey") === col("l_partkey"), "full_outer")
        .select(coalesce(col("p_partkey"), col("l_partkey")).as("partkey"),
          col("p_size"), col("n_li"))
        .orderBy(col("partkey")).limit(300)
    },

    "join_cross" -> { (s, d) =>
      Tables(s, d, "region").select(col("r_name"))
        .crossJoin(Tables(s, d, "nation").select(col("n_name")))
        .orderBy(col("r_name"), col("n_name")).limit(50)
    },

    // single range predicate pair → the reference plans a piecewise merge
    // join (plan_comparison_join.cpp:41-103). Spark's built-in plan is
    // BNLJ (quadratic for fact×fact); the engine instead runs the bucketed
    // band join (operators/RangeJoin.scala): equi-shuffle on value
    // buckets + exact filter. c_acctbal ∈ (s_acctbal-10, s_acctbal].
    "join_non_equi_range" -> { (s, d) =>
      val sup = Tables(s, d, "supplier")
      val cust = Tables(s, d, "customer")
      graft.operators.RangeJoin.band(sup, cust, "s_acctbal", "c_acctbal",
          lo = -10.0, hi = 0.0,
          cond = col("c_acctbal") > col("s_acctbal") - 10 && col("c_acctbal") <= col("s_acctbal"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("s_suppkey")).limit(100)
    },

    // TRUE 2-inequality IEJoin (operators/RangeJoin.ieJoin — reference
    // physical_iejoin.cpp): price-interval overlap between two order
    // slices, a.lo < b.hi AND a.hi > b.lo, planned as blocked sweeps
    // instead of the nested-loop join Spark would pick. The plain
    // inequality-join SQL is an exact oracle.
    "join_iejoin_overlap" -> { (s, d) =>
      val o = Tables(s, d, "orders")
      val a = o.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("a_id"), col("o_totalprice").as("a_lo"),
          (col("o_totalprice") + 5000.0).as("a_hi"))
      val b = o.filter(col("o_orderkey") % 89 === 0)
        .select(col("o_orderkey").as("b_id"), col("o_totalprice").as("b_lo"),
          (col("o_totalprice") + 5000.0).as("b_hi"))
      graft.operators.RangeJoin.ieJoin(a, b,
          "a_lo", "b_hi", strictX = true,
          "a_hi", "b_lo", strictY = true, blocks = 16)
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id")).limit(500)
    },

    // manual key-salting (operators/SkewJoin): the salt only routes rows
    // to reducers, so the joined RESULT is salt-invariant and the plain
    // equi-join SQL is an exact oracle — upgrading the skew path from
    // spec-only to value-gated
    "join_skew_salted" -> { (s, d) =>
      import graft.operators.SkewJoin
      val big = Tables(s, d, "orders")
      val small = Tables(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      SkewJoin.saltedJoin(big, small, "o_custkey", buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("c_mktsegment"))
    },

    // salted two-phase aggregation: per-salt partials then merge
    "agg_skew_salted" -> { (s, d) =>
      import graft.operators.SkewJoin
      SkewJoin.saltedSumCount(Tables(s, d, "lineitem"), "l_returnflag", "l_quantity",
          buckets = 8)
        .select(col("l_returnflag"), round(col("sum_l_quantity"), 2).as("sum_qty"),
          col("n"))
        .orderBy(col("l_returnflag"))
    },

    "join_asof" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("purchase_us"))
      AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_us"))
        .select(col("event_id"), col("user_id"), col("purchase_us"))
        .orderBy(col("event_id")).limit(500)
    },

    "join_asof_forward" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("next_purchase_us"))
      AsOfJoin.forward(clicks, purchases, Seq("user_id"), "ts", Seq("next_purchase_us"))
        .select(col("event_id"), col("user_id"), col("next_purchase_us"))
        .orderBy(col("event_id")).limit(500)
    },

    "join_positional" -> { (s, d) =>
      val nat = Tables(s, d, "nation").orderBy(col("n_nationkey")).select(col("n_name"))
      val reg = Tables(s, d, "region").orderBy(col("r_regionkey")).select(col("r_name"))
      PositionalJoin(nat, reg)
        .select(col("pos"), col("n_name"), col("r_name"))
        .orderBy(col("pos"))
    }
  )

  val oracle: Map[String, String] = sharedSqlQueries.map { case (k, v) => k -> v._2 } ++ Map(
    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_skew_salted" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey LIMIT 100""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey LIMIT 100""".stripMargin,

    "join_right_outer" ->
      """SELECT p_partkey, count(l_orderkey) AS n_li
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 48
        |GROUP BY p_partkey ORDER BY p_partkey LIMIT 200""".stripMargin,

    "join_full_outer" ->
      """SELECT coalesce(p.p_partkey, l.l_partkey) AS partkey, p.p_size, l.n_li
        |FROM (SELECT p_partkey, p_size FROM part WHERE p_size > 47) p
        |FULL JOIN (SELECT l_partkey, count(*) AS n_li FROM lineitem
        |           WHERE l_quantity >= 49 GROUP BY 1) l
        |  ON p.p_partkey = l.l_partkey
        |ORDER BY partkey LIMIT 300""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name LIMIT 50""".stripMargin,

    "join_non_equi_range" ->
      """SELECT s_suppkey, count(*) AS n_cust
        |FROM supplier JOIN customer
        |  ON c_acctbal > s_acctbal - 10 AND c_acctbal <= s_acctbal
        |GROUP BY s_suppkey ORDER BY s_suppkey LIMIT 100""".stripMargin,

    "join_iejoin_overlap" ->
      """WITH a AS (SELECT o_orderkey AS a_id, o_totalprice AS a_lo,
        |                  o_totalprice + 5000.0 AS a_hi
        |           FROM orders WHERE o_orderkey % 97 = 0),
        |     b AS (SELECT o_orderkey AS b_id, o_totalprice AS b_lo,
        |                  o_totalprice + 5000.0 AS b_hi
        |           FROM orders WHERE o_orderkey % 89 = 0)
        |SELECT a_id, b_id FROM a JOIN b
        |  ON a_lo < b_hi AND a_hi > b_lo
        |ORDER BY a_id, b_id LIMIT 500""".stripMargin,

    "join_asof" ->
      """SELECT c.event_id, c.user_id, epoch_us(p.ts) AS purchase_us
        |FROM (SELECT * FROM events WHERE event_type='click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id LIMIT 500""".stripMargin,

    "join_asof_forward" ->
      """SELECT c.event_id, c.user_id, epoch_us(p.ts) AS next_purchase_us
        |FROM (SELECT * FROM events WHERE event_type='click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id LIMIT 500""".stripMargin,

    "join_positional" ->
      """SELECT coalesce(n.pos, r.pos) AS pos, n.n_name, r.r_name
        |FROM (SELECT n_name, row_number() OVER (ORDER BY n_nationkey) AS pos FROM nation) n
        |FULL JOIN (SELECT r_name, row_number() OVER (ORDER BY r_regionkey) AS pos FROM region) r
        |  ON n.pos = r.pos
        |ORDER BY pos""".stripMargin
  )
}
