package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.window.WindowExec

/** Streaming evaluation of lag-only windows over pre-sorted input.
  *
  * Spark's `WindowExec` materializes every partition-key group into an
  * `ExternalAppendOnlyUnsafeRowArray` (a row copy per input row) before
  * evaluating any frame — necessary for running/unbounded frames, pure
  * overhead for frameless offset functions, which only ever look a fixed
  * k rows back. When every window function in the node is a
  * non-ignoreNulls `lag`, this operator evaluates the window in ONE
  * streaming pass with a k-deep ring of evaluated values: no group
  * buffering, no row copies beyond the ring's scalar values. The
  * reference's window dispatch makes the same specialization
  * (/root/reference/src/execution/operator/aggregate/physical_window.cpp
  * routes constant-offset LEAD/LAG to a streaming path). Sessionization
  * (`lag(ts) over (partition by entity order by time)`) is the shape
  * this exists for.
  *
  * Swapped in AFTER EnsureRequirements (via the injected columnar-rule
  * pass), so the child's clustering + ordering are already exactly what
  * `WindowExec` itself would have required — the streaming pass sees
  * partition-contiguous, fully-sorted rows by construction.
  */
case class StreamingLagWindowExec(
    windowExpression: Seq[NamedExpression],
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ windowExpression.map(_.toAttribute)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)

  private def lagOf(ne: NamedExpression): Lag = ne match {
    case Alias(WindowExpression(l: Lag, _), _) => l
    case other => throw new IllegalStateException(s"not a lag window: $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lags = windowExpression.map(lagOf)
    val offsets = lags.map(l => l.inputOffset.eval().asInstanceOf[Int])
    val maxK = math.max(1, offsets.max)
    val nLags = lags.length

    child.execute().mapPartitions { it =>
      val partProj = UnsafeProjection.create(partitionSpec, child.output)
      val boundInputs = lags.map(l => BindReferences.bindReference(l.input, child.output))
      val boundDefaults = lags.map(l => BindReferences.bindReference(l.default, child.output))

      new Iterator[InternalRow] {
        private val ring = Array.fill(maxK)(new Array[Any](nLags))
        private var pos = 0L            // rows seen in the CURRENT partition
        private var prevKey: UnsafeRow = null
        private val joined = new JoinedRow
        private val winRow = new GenericInternalRow(nLags)

        override def hasNext: Boolean = it.hasNext

        override def next(): InternalRow = {
          val row = it.next()
          val key = partProj(row)
          if (prevKey == null || key != prevKey) { // partition boundary
            prevKey = key.copy()
            pos = 0L
          }
          var j = 0
          while (j < nLags) {
            val k = offsets(j)
            winRow.update(j,
              if (k <= pos && k > 0) ring(((pos - k) % maxK).toInt)(j)
              else if (k == 0) boundInputs(j).eval(row)
              else boundDefaults(j).eval(row))
            j += 1
          }
          val slot = ring((pos % maxK).toInt)
          j = 0
          while (j < nLags) {
            slot(j) = InternalRow.copyValue(boundInputs(j).eval(row))
            j += 1
          }
          pos += 1L
          joined(row, winRow)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object StreamingLagWindowExec {
  /** Every window function must be a plain lag: non-negative foldable
    * offset, no IGNORE NULLS (that needs an unbounded backward scan).
    */
  def supports(w: WindowExec): Boolean =
    w.windowExpression.nonEmpty && w.windowExpression.forall {
      case Alias(WindowExpression(l: Lag, _), _) =>
        !l.ignoreNulls && l.inputOffset.foldable &&
          (l.inputOffset.eval() match {
            case k: java.lang.Integer => k >= 0
            case _ => false
          })
      case _ => false
    }
}
