package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CTERelationDef, CTERelationRef, Join, LogicalPlan, WithCTE}

/** Materialize-once semantics for multi-referenced WITH subtrees — the
  * reference's CTE materialization (reference:
  * /root/reference/src/execution/operator/set/physical_cte.cpp computes
  * a multi-referenced CTE once into a column store and rescans it per
  * consumer). Spark's optimizer INLINES every CTE, so a four-fold
  * `year_total` tower (TPC-DS q4/q11/q14/q74) re-executes the defining
  * aggregate per reference unless AQE's exchange reuse happens to dedup
  * the repeated shuffles.
  *
  * Mechanism — expressed entirely through Spark's own cache layer, no
  * plan surgery: for every `WithCTE` definition that is (a) referenced
  * ≥ 2 times, (b) self-contained (no nested CTE refs), and (c) worth
  * computing once (contains an Aggregate or Join), persist a Dataset
  * over the definition's child plan and materialize it. Running the
  * query then substitutes every occurrence during
  * `QueryExecution.withCachedData` (the cached plan IS the def child, so
  * the canonical lookup always hits), the inliner copies the now-cheap
  * cached leaf into each reference, and analysis-time multi-instance
  * handling (`InMemoryRelation.newInstance`) keeps the copies
  * conflict-free — each one a scan of the single materialized result.
  *
  * Scale posture: the materialized CTE lives in the block manager
  * (memory-and-disk, spillable, partitioned) exactly like any cached
  * relation — the same trade the reference makes buffering its CTE into
  * a ColumnDataCollection. Cost accounting is the caller's: build runs
  * inside `body`'s first action, so a timed region that wraps
  * `withMaterializedCtes` pays materialization like the reference pays
  * its CTE sink.
  */
object CteMaterializer {

  /** Multi-referenced, self-contained, nontrivial CTE definitions of an
    * ANALYZED plan, in definition order.
    */
  private[graft] def materializableDefs(analyzed: LogicalPlan): Seq[CTERelationDef] = {
    val refCounts = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    val defs = scala.collection.mutable.ArrayBuffer.empty[CTERelationDef]
    // plan.foreach covers WithCTE defs (they are children) but NOT plans
    // inside subquery expressions — walk those explicitly
    def walk(p: LogicalPlan): Unit = {
      p.foreach {
        case w: WithCTE => defs ++= w.cteDefs
        case r: CTERelationRef => refCounts(r.cteId) += 1
        case _ => ()
      }
      p.subqueriesAll.foreach(walk)
    }
    walk(analyzed)
    defs.distinct.toSeq.filter { d =>
      refCounts(d.id) >= 2 &&
        !d.child.exists(_.isInstanceOf[CTERelationRef]) &&
        d.child.exists(p => p.isInstanceOf[Aggregate] || p.isInstanceOf[Join]) &&
        !d.child.exists(_.expressions.exists(!_.deterministic))
    }
  }

  /** Persist the materializable CTE defs of `sql`, run `body`, unpersist.
    * Returns `body`'s result. The DataFrame handed to `body` is built by
    * the caller (usually `spark.sql(sql)` again — substitution happens at
    * that dataset's own `withCachedData` step).
    */
  def withMaterializedCtes[A](spark: SparkSession, sql: String)(body: => A): A = {
    val analyzed = spark.sql(sql).queryExecution.analyzed
    val handles: Seq[DataFrame] = materializableDefs(analyzed).map { d =>
      val ds = org.apache.spark.sql.graft.bridge.ofRows(spark, d.child)
      ds.persist()
      ds.count() // materialize eagerly so every consumer scans, none computes
      ds
    }
    try body
    finally handles.foreach(_.unpersist(blocking = false))
  }
}
