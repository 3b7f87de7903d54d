package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Partition-local top-K prune between a partial aggregate and its
  * shuffle — the exchange-shrinking half of the top-N-through-aggregate
  * pushdown ([[graft.rules.TopNThroughAgg]]).
  *
  * The child is a PARTIAL aggregate: each input row is one
  * (partition, group) fragment, and `sortOrder` is a TOTAL order on
  * groups (the query's ORDER BY prefix extended with the remaining
  * grouping columns, as the rule constructs it). Keeping each
  * partition's top-`limit` fragments by that order is a superset of
  * every group the refined global top-`limit` can emit: if a fragment
  * of group g is dropped here, this partition alone holds `limit`
  * DISTINCT groups strictly before g in the total order (retention is
  * by whole group, so duplicate fragments of one group never count
  * twice nor split), so g cannot reach the global top-`limit` — and since the rule makes the downstream
  * TakeOrderedAndProject sort by the same total order, g is never
  * emitted with a partially-merged aggregate.
  *
  * Scale posture: state is `limit` rows per task (the rule valves
  * `limit`), the shuffle shrinks from one row per (partition, group) to
  * at most `limit` per partition, and the reduce side merges
  * O(partitions × limit) fragments regardless of group cardinality.
  * Reference analog: order/physical_top_n.cpp's partition-local heaps —
  * here applied UNDER the aggregation's exchange, which a native
  * single-process engine has no equivalent of.
  */
final case class PartialTopNExec(
    limit: Int,
    sortOrder: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(c: SparkPlan): PartialTopNExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val (ord, n) = (sortOrder, limit)
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val cmp = new LazilyGeneratedOrdering(ord, childOutput)
      // bounded ordered map keyed by the group total order: `sortOrder`
      // extends the ORDER BY with the remaining grouping columns, so
      // compare==0 ⇔ same group. Retaining/evicting whole KEYS (not
      // single rows) keeps every fragment of a retained group together —
      // the superset argument then holds even if the partial aggregate
      // ever emits duplicate fragments per group (e.g. a passthrough /
      // partial-skip mode). Normal case is one fragment per group, so
      // state stays ≈ `limit` rows. Upstream row buffers are reused —
      // copy before retention.
      val groups = new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](cmp)
      while (it.hasNext) {
        val row = it.next()
        val existing = groups.get(row)
        if (existing != null) existing.add(row.copy())
        else if (groups.size < n ||
            cmp.compare(row, groups.lastKey()) < 0) {
          val key = row.copy()
          val list = new java.util.ArrayList[InternalRow](1)
          list.add(key)
          groups.put(key, list)
          if (groups.size > n) groups.pollLastEntry() // evict whole worst group
        }
      }
      // emission order is irrelevant — an exchange follows
      scala.collection.JavaConverters.asScalaIterator(groups.values().iterator())
        .flatMap(l => scala.collection.JavaConverters.asScalaIterator(l.iterator()))
    }, preservesPartitioning = true)
  }
}

/** Sorted-input group limit: keep each partition's rows for its first
  * `k` DISTINCT values of `prefix`, where the input is sorted by
  * `prefix` and partitioned so that groups are whole per partition —
  * the input-side cut for `GROUP BY ... ORDER BY <prefix>... LIMIT k`
  * over clustered storage ([[graft.rules.TopNThroughAgg]]'s sorted arm).
  *
  * Soundness: sorted input makes each prefix value's rows contiguous, so
  * the kept k prefix runs are COMPLETE; a dropped group's prefix has ≥ k
  * distinct prefix values before it in its own partition, each holding
  * ≥ 1 whole group that sorts strictly before it in the query's ORDER BY
  * (the prefix is a lexicographic prefix of that order), so the dropped
  * group can appear in NO valid top-k answer — ties included, because
  * tying groups share the prefix and whole prefix runs are kept.
  *
  * The iterator stops pulling at the (k+1)-th distinct prefix — with a
  * columnar scan below, unread batches are never decoded. Reference
  * analog: a native engine's ordered-scan limit; here it is the fully
  * streaming form of the same cut.
  */
final case class SortedPrefixLimitExec(
    k: Int,
    prefix: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(c: SparkPlan): SortedPrefixLimitExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val (cap, pfx) = (k, prefix)
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(pfx, childOutput)
      new Iterator[InternalRow] {
        private var prev: InternalRow = null
        private var seen = 0
        private var pending: InternalRow = null
        private var done = false
        // pull in hasNext and emit the SAME row object — upstream
        // iterators reuse their row buffer, so looking one row past the
        // delivered one would hand the consumer mutated bytes
        def hasNext: Boolean = {
          if (done) false
          else if (pending != null) true
          else if (!it.hasNext) { done = true; false }
          else {
            val row = it.next()
            val p = proj(row)
            if (prev == null || p != prev) {
              seen += 1
              if (seen > cap) { done = true; return false }
              prev = p.copy()
            }
            pending = row
            true
          }
        }
        def next(): InternalRow = { val r = pending; pending = null; r }
      }
    }, preservesPartitioning = true)
  }
}
