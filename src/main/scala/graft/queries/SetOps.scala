package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations + DISTINCT ON — SURVEY.md §2.7 / §2.6.
  *
  * The reference plans EXCEPT/INTERSECT as hash anti/semi joins and the
  * ALL variants via row_number on both sides
  * (/root/reference/src/execution/physical_plan/plan_set_operation.cpp:49-89);
  * Spark's except/intersect/exceptAll/intersectAll use the same join-based
  * planning.
  */
object SetOps {

  private val shared: Map[String, (Q.Fn, String)] = Map(
    "setop_union" -> Q.sharedSql(Seq("customer", "orders"),
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
        |ORDER BY c_custkey LIMIT 200""".stripMargin),

    "setop_union_all" -> Q.sharedSql(Seq("customer", "orders"),
      """SELECT count(*) AS n FROM (
        | SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        | UNION ALL
        | SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000) u""".stripMargin),

    "setop_intersect" -> Q.sharedSql(Seq("lineitem", "supplier"),
      """SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag='R'
        |INTERSECT
        |SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 5000
        |ORDER BY k LIMIT 200""".stripMargin),

    "setop_except_all" -> Q.sharedSql(Seq("lineitem"),
      """SELECT v, count(*) AS n FROM (
        | SELECT l_linenumber AS v FROM lineitem WHERE l_returnflag='R'
        | EXCEPT ALL
        | SELECT l_linenumber AS v FROM lineitem WHERE l_returnflag='A') e
        |GROUP BY v ORDER BY v""".stripMargin)
  )

  val queries: Map[String, Q.Fn] = shared.map { case (k, v) => k -> v._1 } ++ Map[String, Q.Fn](
    // DISTINCT ON (k) ... ORDER BY o ≙ row_number()=1 rewrite
    // (reference: src/execution/physical_plan/plan_distinct.cpp)
    "distinct_on" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_custkey")).limit(200)
    }
  )

  val oracle: Map[String, String] = shared.map { case (k, v) => k -> v._2 } ++ Map(
    "distinct_on" ->
      """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey LIMIT 200""".stripMargin
  )
}
