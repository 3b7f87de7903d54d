package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.{ColumnarToRowExec, FilterExec, ProjectExec, SparkPlan, UnaryExecNode}

/** Cross-execution broadcast relation cache for dimension scans.
  *
  * Spark reuses a broadcast exchange only *within* one query
  * (`ReuseExchangeAndSubquery`); a fresh DataFrame for the same query
  * rebuilds every dimension broadcast — a scheduler round-trip per
  * dimension per execution. A warm engine keeps its (tiny, immutable)
  * dimension hash tables resident: the reference engine's buffer manager
  * keeps dimension tables pinned in memory and its hash build for them is
  * microseconds, while our equivalent rebuild is a full job dispatch.
  *
  * `CachedBroadcastExec` memoizes the built `Broadcast` keyed on the
  * exchange's canonicalized plan — the same identity `ReuseExchange` uses,
  * so two executions share a broadcast exactly when Spark itself would
  * have deduplicated them inside one plan. Eligibility is restricted to
  * deterministic Project/Filter chains over an in-memory table scan
  * (see [[CachedBroadcastExec.eligible]]): the skipped re-build is a
  * re-scan of cached dimension rows, never real query compute
  * (aggregates/joins below the exchange stay uncached).
  *
  * Enabled only in warm-engine mode ([[graft.Tables.cacheMode]]) with AQE
  * off — under AQE the exchange must stay a query-stage boundary.
  */
case class CachedBroadcastExec(inner: BroadcastExchangeExec) extends UnaryExecNode {
  override def child: SparkPlan = inner
  override def output: Seq[Attribute] = inner.output
  override def outputPartitioning: Partitioning = inner.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException("broadcast-only node")

  override def doExecuteBroadcast[T](): Broadcast[T] =
    CachedBroadcastExec.cache.getOrElseUpdate(inner.canonicalized, {
      inner.executeBroadcast[Any]()
    }).asInstanceOf[Broadcast[T]]

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(inner = newChild.asInstanceOf[BroadcastExchangeExec])
}

object CachedBroadcastExec {
  private[graft] val cache =
    scala.collection.concurrent.TrieMap.empty[SparkPlan, Broadcast[Any]]

  def clear(): Unit = cache.clear()

  /** Only memoize broadcasts whose build is a pure re-scan: deterministic
    * Project/Filter over an in-memory table scan. Anything else (joins,
    * aggregates, file scans that might see new files) rebuilds per query.
    */
  def eligible(plan: SparkPlan): Boolean = plan match {
    case _: InMemoryTableScanExec => true
    case ColumnarToRowExec(c) => eligible(c)
    case p: ProjectExec => p.projectList.forall(_.deterministic) && eligible(p.child)
    case f: FilterExec => f.condition.deterministic && eligible(f.child)
    case _ => false
  }
}
