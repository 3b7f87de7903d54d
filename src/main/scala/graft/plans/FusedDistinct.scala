package graft.plans

import graft.functions.DistinctWithHll

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._

/** Columnar partial stage of the fused exact-distinct + HLL aggregation.
  *
  * The TypedImperativeAggregate path ([[graft.functions.DistinctWithHll]])
  * pays two structural costs at scale, both measured on the sf1 evidence
  * set (PERF.md):
  *
  *  1. per-ROW update dispatch: the aggregate sees one `InternalRow` at a
  *     time through the object-agg iterator (~150 ns/row vs ~30 ns for a
  *     batch loop over the columnar cache's long arrays);
  *  2. single-reducer merge: an ungrouped aggregate funnels every
  *     partial set through ONE final buffer (3.9M inserts at sf1 — wall
  *     time ~150 ms on one core while 31 idle).
  *
  * This operator fixes both with the shape a native engine uses
  * (reference: radix-partitioned distinct aggregation,
  * /root/reference/src/execution/operator/aggregate/
  * physical_hash_aggregate.cpp): the partial stage consumes COLUMNAR
  * BATCHES directly (zero-copy long-array reads from the cache) and
  * emits its per-partition set SPLIT BY KEY HASH into `buckets` disjoint
  * blobs. Downstream, an ordinary `groupBy(bucket)` merge is
  * embarrassingly parallel — each reducer unions blobs of a DISJOINT key
  * slice — and exact counts then ADD. HLL registers ride on the
  * bucket-0 row and max-union associatively. Same two-phase,
  * shuffle-light contract as the fused aggregate (state crosses the
  * exchange, never rows), but with a parallel merge and a vectorized
  * update loop.
  *
  * The row-fallback path (uncached input, non-columnar child) computes
  * identical results through bound-reference `getLong`s; a spec pins
  * byte-identical registers and equal counts across the three paths
  * (columnar, row, TypedImperativeAggregate).
  */
final case class FusedDistinctPartial(
    exact: Expression,
    approx: Expression,
    buckets: Int,
    child: LogicalPlan,
    // output ids must be STABLE across plan copies (transformations call
    // withNewChildInternal; regenerating exprIds would orphan parent
    // references) — so the attributes are a constructor field
    output: Seq[Attribute] = FusedDistinctPartial.freshOutput()) extends UnaryNode {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  // the output attributes are GENERATED here, not references to the child
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: LogicalPlan): FusedDistinctPartial =
    copy(child = c)
}

object FusedDistinctPartial {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("bucket", IntegerType, nullable = false)(),
    AttributeReference("set_blob", BinaryType, nullable = false)(),
    AttributeReference("hll", BinaryType, nullable = true)())
}

object FusedDistinctStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: FusedDistinctPartial =>
      FusedDistinctPartialExec(p.exact, p.approx, p.buckets, p.output,
        planLater(p.child), columnarChild = false) :: Nil
    case d: FusedDistinctDriver =>
      FusedDistinctDriverExec(d.output, planLater(d.child)) :: Nil
    case s: SingleDistinctPartial =>
      SingleDistinctPartialExec(s.distinct, s.piggyInputs, s.piggyKinds,
        s.buckets, s.output, planLater(s.child), columnarChild = false) :: Nil
    case c: SingleDistinctCombine =>
      SingleDistinctCombineExec(c.mergeOps, c.resultExprs, c.output,
        planLater(c.child)) :: Nil
    case _ => Nil
  }
}

final case class FusedDistinctPartialExec(
    exact: Expression,
    approx: Expression,
    buckets: Int,
    output: Seq[Attribute],
    child: SparkPlan,
    columnarChild: Boolean) extends UnaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: SparkPlan): FusedDistinctPartialExec =
    copy(child = c)

  /** Split the per-partition buffer into bucket rows. Bucket choice uses
    * the same 64-bit finalizer as the set's own probe hash — any
    * deterministic function works; what matters is that a key lands in
    * exactly one bucket on every partition.
    */
  private def emit(buf: DistinctWithHll.Buffer): Iterator[InternalRow] = {
    // word-aligned bitmap-chunk blobs, bucketed by WORD index — the same
    // exchange format as the single-distinct path (see
    // [[graft.functions.BitChunkCount]]): 16 bytes per populated 64-key
    // word instead of 8 per key, ~30x smaller on dense/clustered key
    // domains; all 64 keys of a word share a bucket so reducer slices
    // stay disjoint and counts still add
    val words = new DistinctWithHll.LongBitsMap(1 << 10)
    buf.set.foreach(v => words.or(v >> 6, 1L << (v & 63L).toInt))
    def bucketOf(w: Long): Int =
      math.floorMod(DistinctWithHll.scramble(w), buckets).toInt
    val counts = new Array[Int](buckets)
    words.foreachEntry((w, _) => counts(bucketOf(w)) += 1)
    val blobs = counts.map(n => java.nio.ByteBuffer.allocate(16 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN))
    words.foreachEntry { (w, bits) =>
      val bb = blobs(bucketOf(w)); bb.putLong(w); bb.putLong(bits)
    }
    val proj = UnsafeProjection.create(Array[DataType](
      IntegerType, BinaryType, BinaryType))
    val row = new GenericInternalRow(3)
    (0 until buckets).iterator.map { b =>
      row.update(0, b)
      row.update(1, blobs(b).array())
      row.update(2, if (b == 0) buf.hll else null)
      proj(row).copy()
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // widen-to-long is the only supported key domain (int32/int64 cover
    // every TPC-H-ish key); fail at PLAN time, not per row
    def widens(dt: DataType): Boolean = dt == LongType || dt == IntegerType
    require(widens(exact.dataType) && widens(approx.dataType),
      s"fused distinct keys must be int/long, got ${exact.dataType}/${approx.dataType}")
    val eLong = exact.dataType == LongType
    val aLong = approx.dataType == LongType
    if (columnarChild) {
      val eOrd = exact match {
        case a: Attribute => child.output.indexWhere(_.exprId == a.exprId)
        case _ => -1
      }
      val aOrd = approx match {
        case a: Attribute => child.output.indexWhere(_.exprId == a.exprId)
        case _ => -1
      }
      require(eOrd >= 0 && aOrd >= 0,
        "columnar fused distinct requires direct column children")
      child.executeColumnar().mapPartitions { batches =>
        val buf = new DistinctWithHll.Buffer(1 << 16)
        batches.foreach { batch =>
          val ve = batch.column(eOrd)
          val va = batch.column(aOrd)
          val n = batch.numRows()
          var i = 0
          while (i < n) {
            if (!ve.isNullAt(i))
              buf.set.add(if (eLong) ve.getLong(i) else ve.getInt(i).toLong)
            if (!va.isNullAt(i))
              buf.hllAdd(if (aLong) va.getLong(i) else va.getInt(i).toLong)
            i += 1
          }
        }
        emit(buf)
      }
    } else {
      val boundE = BindReferences.bindReference(exact, child.output)
      val boundA = BindReferences.bindReference(approx, child.output)
      child.execute().mapPartitions { rows =>
        val buf = new DistinctWithHll.Buffer(1 << 16)
        rows.foreach { r =>
          val e = boundE.eval(r)
          if (e != null) buf.set.add(e match {
            case l: java.lang.Long => l.longValue(); case i: java.lang.Integer => i.longValue()
          })
          val a = boundA.eval(r)
          if (a != null) buf.hllAdd(a match {
            case l: java.lang.Long => l.longValue(); case i: java.lang.Integer => i.longValue()
          })
        }
        emit(buf)
      }
    }
  }
}

/** Driver-merged final for the fused distinct — the small-input shape:
  * ONE job runs the per-partition partial (each task emits one packed
  * key blob + HLL register row), and the driver unions the handful of
  * blobs directly, skipping the exchange + final-aggregate stage the
  * TypedImperativeAggregate shape pays. Same coordinator-merge rationale
  * as [[graft.plans.DriverGroupAggExec]]; the payload is O(distinct keys)
  * per task, which is exactly why this shape is gated to SMALL inputs by
  * the size-based pick in DistinctWithHll.exactWithHll — at sf1+ the
  * parallel disjoint-bucket merge takes over.
  */
final case class FusedDistinctDriver(
    child: LogicalPlan,
    output: Seq[Attribute] = FusedDistinctDriver.freshOutput()) extends UnaryNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // the exec reads the partial's (bucket, set_blob, hll) POSITIONALLY but
  // carries no child-referencing expressions — without this, ColumnPruning
  // sees zero references and inserts an empty Project that strips all
  // three columns out from under the positional reads
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): FusedDistinctDriver =
    copy(child = c)
}

object FusedDistinctDriver {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("n_exact", LongType, nullable = false)(),
    AttributeReference("approx", LongType, nullable = false)())
}

final case class FusedDistinctDriverExec(
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {
  import graft.functions.DistinctWithHll

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: SparkPlan): FusedDistinctDriverExec =
    copy(child = c)

  private def finalRow(): Array[InternalRow] = {
    // one job: collect each task's (bucket, set_blob, hll) partial row
    val parts: Array[Array[(Array[Byte], Array[Byte])]] =
      sparkContext.runJob(child.execute(), (rows: Iterator[InternalRow]) =>
        rows.map(r => (r.getBinary(1),
          if (r.isNullAt(2)) null else r.getBinary(2))).toArray)
    val words = new DistinctWithHll.LongBitsMap(1 << 12)
    var regs: Array[Byte] = null // sized from the partials' register width
    parts.foreach(_.foreach { case (blob, hll) =>
      val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      val n = blob.length / 16
      while (i < n) { words.or(bb.getLong(16 * i), bb.getLong(16 * i + 8)); i += 1 }
      if (hll != null) {
        if (regs == null) regs = new Array[Byte](hll.length)
        var j = 0
        while (j < regs.length) {
          if (hll(j) > regs(j)) regs(j) = hll(j); j += 1
        }
      }
    })
    if (regs == null) regs = new Array[Byte](16384)
    val proj = UnsafeProjection.create(Array[DataType](LongType, LongType))
    val row = new GenericInternalRow(2)
    row.update(0, words.popCount)
    row.update(1, DistinctWithHll.estimateFrom(regs))
    Array(proj(row).copy())
  }

  override def executeCollect(): Array[InternalRow] = finalRow()

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(finalRow().toIndexedSeq, 1)
}
