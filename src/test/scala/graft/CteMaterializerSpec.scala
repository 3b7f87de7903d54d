package graft

import graft.plans.CteMaterializer
import org.scalatest.funsuite.AnyFunSuite

/** plans/CteMaterializer: multi-referenced WITH subtrees materialize
  * once through the cache layer — results identical to the inlined
  * plan, every reference scans the single cached result, cache state is
  * restored afterwards, and single-ref / trivial / nested-ref defs are
  * left alone.
  */
class CteMaterializerSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val views: Unit = {
    Tables(spark, sf, "orders").createOrReplaceTempView("cte_orders")
    Tables(spark, sf, "lineitem").createOrReplaceTempView("cte_lineitem")
  }

  // the year_total tower shape: one aggregate CTE consumed twice under
  // different filters and self-joined
  private val towerSql =
    """WITH cust_total AS (
      |  SELECT o_custkey AS ck, o_orderstatus AS st,
      |         round(sum(o_totalprice), 2) AS total, count(*) AS n
      |  FROM cte_orders GROUP BY o_custkey, o_orderstatus)
      |SELECT a.ck, a.total AS total_o, b.total AS total_f
      |FROM cust_total a JOIN cust_total b ON a.ck = b.ck
      |WHERE a.st = 'O' AND b.st = 'F' AND a.total > b.total
      |ORDER BY a.ck""".stripMargin

  test("tower shape: def found, rows identical, cache restored") {
    views
    val expected = spark.sql(towerSql).collect().toSeq.map(_.toString)
    val defs = CteMaterializer.materializableDefs(
      spark.sql(towerSql).queryExecution.analyzed)
    assert(defs.length == 1, s"defs: $defs")
    def scans(p0: org.apache.spark.sql.execution.SparkPlan): Int = {
      val p = p0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      p.collect {
        case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => 1
      }.sum + p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
      }.map(scans).sum
    }
    val got = CteMaterializer.withMaterializedCtes(spark, towerSql) {
      val df = spark.sql(towerSql)
      df.collect()
      // both references must scan the materialized relation
      assert(scans(df.queryExecution.executedPlan) >= 2,
        df.queryExecution.executedPlan.toString.take(2000))
      df.collect().toSeq.map(_.toString)
    }
    assert(got == expected)
    // handle unpersisted: running again plans no cache scan
    val after = spark.sql(towerSql)
    after.collect()
    assert(scans(after.queryExecution.executedPlan) == 0)
  }

  test("single-reference and trivial defs are not materialized") {
    views
    val singleRef =
      """WITH t AS (SELECT o_custkey, sum(o_totalprice) s FROM cte_orders GROUP BY 1)
        |SELECT count(*) AS n FROM t""".stripMargin
    assert(CteMaterializer.materializableDefs(
      spark.sql(singleRef).queryExecution.analyzed).isEmpty)
    val trivial =
      """WITH t AS (SELECT o_custkey FROM cte_orders WHERE o_custkey > 5)
        |SELECT (SELECT count(*) FROM t) AS a, (SELECT max(o_custkey) FROM t) AS b""".stripMargin
    assert(CteMaterializer.materializableDefs(
      spark.sql(trivial).queryExecution.analyzed).isEmpty)
  }

  test("defs referencing other CTEs stay inlined (self-containment guard)") {
    views
    val nested =
      """WITH base AS (
      |  SELECT o_custkey AS ck, sum(o_totalprice) AS t FROM cte_orders GROUP BY 1),
      |derived AS (SELECT ck, t, t * 2 AS t2 FROM base)
      |SELECT a.ck FROM derived a JOIN derived b ON a.ck = b.ck AND a.t2 > b.t
      |ORDER BY a.ck LIMIT 10""".stripMargin
    val defs = CteMaterializer.materializableDefs(
      spark.sql(nested).queryExecution.analyzed)
    // `derived` refs `base` → excluded; `base` is single-ref after the
    // analyzer (derived refs it once) unless both derived refs keep it
    // multi-ref — either way no def containing a CTERelationRef appears
    assert(defs.forall(d => !d.child.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.CTERelationRef])))
    // and the rewrite stays correct end-to-end
    val expected = spark.sql(nested).collect().toSeq.map(_.toString)
    val got = CteMaterializer.withMaterializedCtes(spark, nested) {
      spark.sql(nested).collect().toSeq.map(_.toString)
    }
    assert(got == expected)
  }
}
