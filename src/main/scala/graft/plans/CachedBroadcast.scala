package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.{ColumnarToRowExec, FilterExec, LeafExecNode, ProjectExec, SparkPlan}

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
  * Enabled only in warm-engine mode ([[graft.Tables.cacheMode]]). Non-AQE
  * sessions wrap in `InsertCacheColumnarToRow`; AQE sessions wrap via
  * [[CachedBroadcastPrep]] BEFORE stage carving, so the exchange never
  * becomes a broadcast query stage and the hit path launches no job.
  */
case class CachedBroadcastExec(inner: BroadcastExchangeExec) extends LeafExecNode {
  // DELIBERATELY a leaf: `SparkPlan.prepare()` walks `children` and
  // `BroadcastExchangeExec.doPrepare` eagerly materializes
  // `relationFuture` — with `inner` as a child, every execution launched
  // the build job and then discarded its result on a cache hit. Hiding
  // the exchange from the prepare walk is what makes the hit path
  // job-free; `innerChildren` keeps it visible in explain output.
  override def output: Seq[Attribute] = inner.output
  override def outputPartitioning: Partitioning = inner.outputPartitioning
  override def innerChildren: Seq[SparkPlan] = Seq(inner)

  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException("broadcast-only node")

  override def doExecuteBroadcast[T](): Broadcast[T] =
    CachedBroadcastExec.lookup(inner).asInstanceOf[Broadcast[T]]
}

object CachedBroadcastExec {
  /** Key = canonicalized exchange plan (the identity `ReuseExchange` uses)
    * + the identity of every cached-relation builder in the subtree. The
    * builder identity gives data-version invalidation: re-caching a table
    * through ANY path (`Tables.clearCache`, `spark.catalog.clearCache()`,
    * unpersist + re-read) creates a new `CachedRDDBuilder`, so the stale
    * broadcast can never be served for new data. Builders are numbered
    * from a monotonic counter (weakly keyed, so dropped builders don't
    * leak) rather than `identityHashCode`, which can collide between an
    * old and a re-created builder.
    */
  private type Key = (SparkPlan, Seq[Long])

  /** Bounded LRU (access-order): entries beyond MaxEntries drop their
    * Broadcast ref so ContextCleaner can reclaim the blocks — the cache
    * cannot grow unboundedly across distinct filters.
    */
  private val MaxEntries = 64
  private val cache = new java.util.LinkedHashMap[Key, Broadcast[Any]](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Key, Broadcast[Any]]): Boolean =
      this.size() > MaxEntries
  }

  // keyed on AnyRef: CachedRDDBuilder is private[sql]; WeakHashMap keys
  // on reference identity, which is exactly the builder identity we want
  private val builderIds = new java.util.WeakHashMap[AnyRef, java.lang.Long]()
  private val nextBuilderId = new java.util.concurrent.atomic.AtomicLong(0L)
  private def builderId(b: AnyRef): Long =
    builderIds.synchronized {
      val existing = builderIds.get(b)
      if (existing != null) existing.longValue()
      else { val id = nextBuilderId.incrementAndGet(); builderIds.put(b, id); id }
    }

  private def dataIdentity(plan: SparkPlan): Seq[Long] = plan.collect {
    case s: InMemoryTableScanExec => builderId(s.relation.cacheBuilder)
  }

  private[graft] def lookup(inner: BroadcastExchangeExec): Broadcast[Any] = {
    val key = (inner.canonicalized, dataIdentity(inner))
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      // build outside the lock (a build is a Spark job); worst case two
      // racing executions build the same broadcast once each, last wins
      val built = inner.executeBroadcast[Any]()
      cache.synchronized(cache.put(key, built))
      built
    }
  }

  def size: Int = cache.synchronized(cache.size())

  def clear(): Unit = cache.synchronized(cache.clear())

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

/** The AQE entry point for the broadcast cache: a query-stage-prep rule
  * replacing eligible broadcast exchanges BEFORE stages are carved, so
  * the exchange never becomes a BroadcastQueryStageExec and the hit path
  * launches no build job. The wrapped node is a leaf, so AQE simply
  * leaves it inside the consuming join's stage and the join's
  * `executeBroadcast` is served from the cross-execution cache (built
  * inline once on miss — the blocking build AQE would have run as a
  * stage anyway). Non-AQE sessions get the same wrap from
  * `InsertCacheColumnarToRow`; queryStagePrep rules only run under AQE,
  * so the two paths never double-wrap. Warm-engine mode only.
  */
object CachedBroadcastPrep extends org.apache.spark.sql.catalyst.rules.Rule[SparkPlan] {
  override def apply(plan: SparkPlan): SparkPlan =
    if (!graft.Tables.cacheMode) plan
    else plan.transformUp {
      case b: BroadcastExchangeExec if CachedBroadcastExec.eligible(b.child) =>
        val wrapped = CachedBroadcastExec(b)
        b.logicalLink.foreach(wrapped.setLogicalLink)
        wrapped
    }
}
