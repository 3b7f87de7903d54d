package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** User-facing EXPLAIN ANALYZE surface (reference:
  * src/main/query_profiler.cpp — per-operator timing/cardinality rows
  * behind `PRAGMA enable_profiling` / `EXPLAIN ANALYZE`).
  *
  * Spark already meters every physical operator (SQLMetrics on each
  * SparkPlan node); what the reference exposes and Spark doesn't is a
  * QUERYABLE relation of those numbers. `profile` executes the query
  * and relationalizes the executed plan's metric map: one row per
  * (operator, metric), pre-order operator ids so the tree order is
  * reconstructible. The metric VALUES (times, peak memory) are
  * host-dependent by nature — the stable surface is the shape:
  * operator names, metric names, and the deterministic cardinality
  * metrics (`numOutputRows`).
  *
  * Driver-side cost is one `count()`-strength action plus a walk of
  * the plan tree — metadata-sized at any data scale.
  */
object QueryProfile {

  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Execute THIS plan (df.count() would plan a different query and
    // leave these metrics empty): toRdd runs the physical plan
    // distributed with no driver-side materialization. Read
    // executedPlan after the action — under AQE it finalizes then.
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var id = 0
    def walk(node: SparkPlan): Unit = {
      val opId = id
      id += 1
      node.metrics.toSeq.sortBy(_._1).foreach { case (name, m) =>
        rows += ((opId, node.nodeName, name, m.value))
      }
      if (node.metrics.isEmpty)
        rows += ((opId, node.nodeName, "numOutputRows", -1L))
      // AQE wraps finalized subtrees in leaf nodes — descend through
      // them or the profile stops at the adaptive root.
      val kids = node match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      kids.foreach(walk)
    }
    walk(plan)
    import spark.implicits._
    rows.toSeq.toDF("op_id", "operator", "metric", "metric_value")
      .orderBy("op_id", "metric")
  }
}
