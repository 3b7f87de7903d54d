package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BasePredicate, Expression, GenericInternalRow, Predicate, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.unsafe.types.UTF8String

/** Per-batch dictionary-or-fallback evaluator for a conjunction of
  * single-string-column predicates — the shared core of
  * [[CacheFilterExec]] and the selection-pushed batch loops
  * ([[SortedRunAggExec]]). Instantiate once per task, `reset` per
  * batch, then `passes(r)` per row.
  */
final class DictSelection(
    preds: Array[Expression],
    childOutput: Seq[Attribute]) {
  private val k = preds.length
  private val ordinals = preds.map { p =>
    val a = p.references.head
    childOutput.indexWhere(_.exprId == a.exprId)
  }
  private val single: Array[BasePredicate] =
    preds.zipWithIndex.map { case (p, i) =>
      Predicate.create(p, Seq(childOutput(ordinals(i))))
    }
  private val fallback: Array[BasePredicate] =
    preds.map(p => Predicate.create(p, childOutput))
  private val probe = new GenericInternalRow(1)

  private val idTables = new Array[Array[Boolean]](k) // null => row fallback
  private val nullPass = new Array[Boolean](k)
  private val idCols = new Array[Array[Int]](k)
  private val nullMasks = new Array[Array[Boolean]](k)
  private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _

  /** Classify each conjunct for this batch: dict-id table when the
    * column dict-encoded, row fallback otherwise. */
  def reset(b: org.apache.spark.sql.vectorized.ColumnarBatch): Unit = {
    batch = b
    var i = 0
    while (i < k) {
      idTables(i) = null
      b.column(ordinals(i)) match {
        case g: GraftColumnVector => g.store match {
          case d: GraftCacheSerializer.DictStore =>
            val entries = d.entries
            val ok = new Array[Boolean](entries)
            var e = 0
            while (e < entries) {
              probe.update(0, UTF8String.fromBytes(
                d.dict, d.dictOffsets(e), d.dictOffsets(e + 1) - d.dictOffsets(e)))
              ok(e) = single(i).eval(probe)
              e += 1
            }
            probe.update(0, null)
            nullPass(i) = single(i).eval(probe)
            idTables(i) = ok
            idCols(i) = d.ids
            nullMasks(i) = d.nulls
          case _ =>
        }
        case _ =>
      }
      i += 1
    }
  }

  def passes(r: Int): Boolean = {
    var pass = true
    var i = 0
    while (pass && i < k) {
      val tbl = idTables(i)
      if (tbl != null) {
        val nm = nullMasks(i)
        pass = if (nm != null && nm(r)) nullPass(i) else tbl(idCols(i)(r))
      } else pass = fallback(i).eval(batch.getRow(r))
      i += 1
    }
    pass
  }
}

/** Filter over the graft columnar cache that evaluates string predicates
  * per DICTIONARY ENTRY instead of per row.
  *
  * Created by [[graft.rules.DictFilterScan]] for `Filter` (optionally
  * under a pruning `Project`) directly over a columnar cache scan whose
  * conjuncts each reference exactly one string column. For every cached
  * batch whose column is a [[GraftCacheSerializer.DictStore]], the
  * conjunct runs once per distinct value (≤ MaxDictEntries, typically a
  * handful) to produce an id→boolean table; the 6M-row scan then checks
  * `ok(ids(row))` — an int load + array index — instead of materializing
  * and comparing a UTF8String per row. Batches whose column spilled to
  * the dense blob layout fall back to a compiled row predicate, so the
  * operator is never worse than the stock filter by more than an
  * iterator hop. This is the reference engine's dictionary filter
  * pushdown (reference: /root/reference/src/storage/compression/
  * dictionary/ + string filter pushdown in the table scan) re-expressed
  * over Spark's cached-batch serializer.
  *
  * Scale posture: purely partition-local — dictionaries are per batch,
  * no driver state, no shuffle change; the operator only shrinks the
  * rows flowing into the aggregation above it.
  */
final case class CacheFilterExec(
    output: Seq[Attribute],
    conjuncts: Seq[Expression],
    child: SparkPlan) extends UnaryExecNode {

  require(conjuncts.nonEmpty)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(c: SparkPlan): CacheFilterExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val preds = conjuncts.toArray
    val outExprs = output
    val numOut = longMetric("numOutputRows")
    child.executeColumnar().mapPartitions ({ batches =>
      val sel = new DictSelection(preds, childOutput)
      val proj = UnsafeProjection.create(outExprs, childOutput)
      batches.flatMap { batch =>
        val n = batch.numRows()
        sel.reset(batch)
        new Iterator[InternalRow] {
          private var r = 0
          private var ready = false
          private def advance(): Unit = {
            while (r < n && !ready) {
              if (sel.passes(r)) ready = true else r += 1
            }
          }
          def hasNext: Boolean = { if (!ready) advance(); ready }
          def next(): InternalRow = {
            if (!ready) advance()
            val row = proj(batch.getRow(r))
            numOut += 1
            r += 1; ready = false
            row
          }
        }
      }
    }, preservesPartitioning = true)
  }
}
