package graft.plans

import graft.functions.DistinctWithHll

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Partial stage of the auto-routed single-distinct fused aggregate
  * (rewritten in by [[graft.rules.FuseSingleDistinct]]).
  *
  * The shape it replaces is Spark's two-level plan for
  * `SELECT count(DISTINCT k), sum(v), count(*) FROM t`: a groupBy(k)
  * de-dup (one shuffled row PER DISTINCT KEY) followed by an ungrouped
  * final that funnels everything through one reducer. A native engine
  * instead keeps ONE hash set per scan thread and merges sets, never
  * rows (reference: the distinct-data path of
  * /root/reference/src/execution/operator/aggregate/
  * distinct_aggregate_data.cpp feeding
  * physical_ungrouped_aggregate.cpp). This operator is that shape on
  * Spark: each task builds an open-addressing long set for the distinct
  * key and accumulates the non-distinct ("piggyback") aggregates in the
  * same pass, then emits the set packed into `buckets` disjoint
  * key-hash blobs. Downstream (built by the rule as ordinary
  * Aggregates) a groupBy(bucket) merge unions blobs of a DISJOINT key
  * slice per reducer — embarrassingly parallel, exact counts add — and
  * a final one-row aggregate combines bucket counts with the piggyback
  * partials that ride each task's bucket-0 row.
  *
  * Scale contract: state crossing the exchange is O(distinct keys)
  * packed bytes + one piggyback row per task, never input rows; reduce
  * parallelism is `buckets`; per-task memory is the partition's
  * distinct-key set — the same bound any exact distinct pays.
  *
  * Piggyback kinds cover the aggregates a summary query mixes with a
  * distinct count: count(*) / count(col) / sum / avg / min / max over
  * int, long, float, double. Long sums follow the session's ANSI mode
  * (wrap by default, error when ansi — same policy as [[RadixAgg]]).
  */
final case class SingleDistinctPartial(
    distinct: Expression,
    piggyInputs: Seq[Expression],
    piggyKinds: Seq[String],
    buckets: Int,
    child: LogicalPlan,
    // stable across plan copies — see FusedDistinctPartial
    output: Seq[Attribute]) extends UnaryNode {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")
  require(piggyInputs.length == piggyKinds.length)
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: LogicalPlan): SingleDistinctPartial =
    copy(child = c)
}

object SingleDistinctPartial {
  val KindCountStar = "count_star"
  val KindCount = "count"
  val KindSum = "sum"
  val KindAvg = "avg"
  val KindMin = "min"
  val KindMax = "max"

  /** Accumulator column type for a piggyback slot: integral inputs
    * accumulate in long, fractional in double (exact widenings); counts
    * carry no value column.
    */
  def valueType(kind: String, in: DataType): Option[DataType] = kind match {
    case KindCountStar | KindCount => None
    case _ => Some(in match {
      case ByteType | ShortType | IntegerType | LongType | DateType => LongType
      case FloatType | DoubleType => DoubleType
      case other => throw new IllegalArgumentException(s"unsupported piggy type $other")
    })
  }

  def freshOutput(piggyKinds: Seq[String], piggyTypes: Seq[DataType]): Seq[Attribute] = {
    val base = Seq(
      AttributeReference("bucket", IntegerType, nullable = false)(),
      AttributeReference("set_blob", BinaryType, nullable = false)())
    val piggy = piggyKinds.zip(piggyTypes).zipWithIndex.flatMap { case ((k, t), i) =>
      valueType(k, t).map(vt =>
        AttributeReference(s"p${i}_v", vt, nullable = true)()).toSeq :+
        AttributeReference(s"p${i}_c", LongType, nullable = true)()
    }
    base ++ piggy
  }
}

final case class SingleDistinctPartialExec(
    distinct: Expression,
    piggyInputs: Seq[Expression],
    piggyKinds: Seq[String],
    buckets: Int,
    output: Seq[Attribute],
    child: SparkPlan,
    columnarChild: Boolean) extends UnaryExecNode {
  import SingleDistinctPartial._

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: SparkPlan): SingleDistinctPartialExec =
    copy(child = c)

  /** Columnar fast path needs every read to be a direct column of the
    * batch schema (count(*) reads nothing).
    */
  def columnarEligible(c: SparkPlan): Boolean = {
    def direct(e: Expression): Boolean = e match {
      case a: Attribute => c.output.exists(_.exprId == a.exprId)
      case _ => false
    }
    val keyTypeOk = distinct.dataType match {
      case IntegerType | LongType | DateType => true
      case _ => false
    }
    keyTypeOk && direct(distinct) && piggyInputs.zip(piggyKinds).forall {
      case (_, KindCountStar) => true
      case (e, KindCount) => direct(e) // any type: null-check read only
      case (e, _) => direct(e) && (e.dataType match {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | DateType => true
        case _ => false
      })
    }
  }

  // ---- per-partition accumulator ---------------------------------------

  private val nP = piggyKinds.length

  private final class Acc(ansi: Boolean) {
    val set = new DistinctWithHll.LongSet(1 << 14)
    val sumL = new Array[Long](nP)
    val sumD = new Array[Double](nP)
    val cnt = new Array[Long](nP)
    // min/max start empty; cnt==0 means "no value yet"
    def addLong(i: Int, v: Long): Unit = piggyKinds(i) match {
      case KindSum | KindAvg =>
        sumL(i) = if (ansi) Math.addExact(sumL(i), v) else sumL(i) + v
        cnt(i) += 1
      case KindMin =>
        if (cnt(i) == 0 || v < sumL(i)) sumL(i) = v
        cnt(i) += 1
      case KindMax =>
        if (cnt(i) == 0 || v > sumL(i)) sumL(i) = v
        cnt(i) += 1
      case _ => cnt(i) += 1
    }
    def addDouble(i: Int, v: Double): Unit = piggyKinds(i) match {
      case KindSum | KindAvg => sumD(i) += v; cnt(i) += 1
      case KindMin =>
        if (cnt(i) == 0 || v < sumD(i)) sumD(i) = v
        cnt(i) += 1
      case KindMax =>
        if (cnt(i) == 0 || v > sumD(i)) sumD(i) = v
        cnt(i) += 1
      case _ => cnt(i) += 1
    }
  }

  /** Pack the set into per-bucket blobs; piggyback partials ride the
    * bucket-0 row (always emitted), other buckets only when non-empty.
    */
  private def emit(acc: Acc, piggyValueTypes: Seq[Option[DataType]])
      : Iterator[InternalRow] = {
    val counts = new Array[Int](buckets)
    acc.set.foreach(v =>
      counts(math.floorMod(DistinctWithHll.scramble(v), buckets).toInt) += 1)
    val blobs = counts.map(n => java.nio.ByteBuffer.allocate(8 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN))
    acc.set.foreach { v =>
      blobs(math.floorMod(DistinctWithHll.scramble(v), buckets).toInt).putLong(v)
    }
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val row = new GenericInternalRow(output.length)
    (0 until buckets).iterator.filter(b => b == 0 || counts(b) > 0).map { b =>
      row.update(0, b)
      row.update(1, blobs(b).array())
      var col = 2
      var i = 0
      while (i < nP) {
        piggyValueTypes(i).foreach { vt =>
          if (b == 0 && acc.cnt(i) > 0)
            row.update(col, if (vt == LongType) acc.sumL(i) else acc.sumD(i))
          else row.update(col, null)
          col += 1
        }
        row.update(col, if (b == 0) acc.cnt(i) else null)
        col += 1
        i += 1
      }
      proj(row).copy()
    }
  }

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case other => throw new IllegalStateException(s"non-integral distinct key $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val ansi = SQLConf.get.ansiEnabled
    val kinds = piggyKinds
    val inTypes = piggyInputs.map(_.dataType)
    val valueTypes = kinds.zip(inTypes).map { case (k, t) => valueType(k, t) }
    val nPiggy = nP
    if (columnarChild) {
      val dOrd = distinct match {
        case a: Attribute => child.output.indexWhere(_.exprId == a.exprId)
        case _ => -1
      }
      require(dOrd >= 0, "columnar single-distinct requires a direct key column")
      val dLong = distinct.dataType == LongType
      val pOrds = piggyInputs.zip(kinds).map {
        case (_, KindCountStar) => -1
        case (a: Attribute, _) => child.output.indexWhere(_.exprId == a.exprId)
        case _ => -1
      }
      child.executeColumnar().mapPartitions { batches =>
        val acc = new Acc(ansi)
        batches.foreach { batch =>
          val vd = batch.column(dOrd)
          val n = batch.numRows()
          var r = 0
          while (r < n) {
            if (!vd.isNullAt(r))
              acc.set.add(if (dLong) vd.getLong(r) else vd.getInt(r).toLong)
            r += 1
          }
          var i = 0
          while (i < nPiggy) {
            val ord = pOrds(i)
            if (ord < 0) { // count(*): every batch row counts
              acc.cnt(i) += n
            } else if (kinds(i) == KindCount) { // null-check only, any type
              val vc = batch.column(ord)
              var j = 0
              while (j < n) { if (!vc.isNullAt(j)) acc.cnt(i) += 1; j += 1 }
            } else {
              val vc = batch.column(ord)
              inTypes(i) match {
                case LongType =>
                  var j = 0
                  while (j < n) {
                    if (!vc.isNullAt(j)) acc.addLong(i, vc.getLong(j)); j += 1
                  }
                case IntegerType | DateType =>
                  var j = 0
                  while (j < n) {
                    if (!vc.isNullAt(j)) acc.addLong(i, vc.getInt(j).toLong); j += 1
                  }
                case DoubleType =>
                  var j = 0
                  while (j < n) {
                    if (!vc.isNullAt(j)) acc.addDouble(i, vc.getDouble(j)); j += 1
                  }
                case FloatType =>
                  var j = 0
                  while (j < n) {
                    if (!vc.isNullAt(j)) acc.addDouble(i, vc.getFloat(j).toDouble); j += 1
                  }
                case ShortType =>
                  var j = 0
                  while (j < n) {
                    if (!vc.isNullAt(j)) acc.addLong(i, vc.getShort(j).toLong); j += 1
                  }
                case ByteType =>
                  var j = 0
                  while (j < n) {
                    if (!vc.isNullAt(j)) acc.addLong(i, vc.getByte(j).toLong); j += 1
                  }
                case other => throw new IllegalStateException(s"piggy type $other")
              }
            }
            i += 1
          }
        }
        emit(acc, valueTypes)
      }
    } else {
      val boundD = BindReferences.bindReference(distinct, child.output)
      val boundP = piggyInputs.map(BindReferences.bindReference(_, child.output))
      // direct-column primitive reads where possible; boxed eval fallback
      val pOrd = boundP.map {
        case b: BoundReference => b.ordinal
        case _ => -1
      }
      child.execute().mapPartitions { rows =>
        val acc = new Acc(ansi)
        val dOrd = boundD match {
          case b: BoundReference if b.dataType == LongType || b.dataType == IntegerType =>
            b.ordinal
          case _ => -1
        }
        val dLong = boundD.dataType == LongType
        rows.foreach { r =>
          if (dOrd >= 0) {
            if (!r.isNullAt(dOrd))
              acc.set.add(if (dLong) r.getLong(dOrd) else r.getInt(dOrd).toLong)
          } else {
            val d = boundD.eval(r)
            if (d != null) acc.set.add(toLong(d))
          }
          var i = 0
          while (i < nPiggy) {
            if (kinds(i) == KindCountStar) acc.cnt(i) += 1
            else if (kinds(i) == KindCount) { // null-check only, any type
              if (pOrd(i) >= 0) { if (!r.isNullAt(pOrd(i))) acc.cnt(i) += 1 }
              else if (boundP(i).eval(r) != null) acc.cnt(i) += 1
            } else if (pOrd(i) >= 0) {
              val o = pOrd(i)
              if (!r.isNullAt(o)) inTypes(i) match {
                case LongType => acc.addLong(i, r.getLong(o))
                case IntegerType | DateType => acc.addLong(i, r.getInt(o).toLong)
                case DoubleType => acc.addDouble(i, r.getDouble(o))
                case FloatType => acc.addDouble(i, r.getFloat(o).toDouble)
                case ShortType => acc.addLong(i, r.getShort(o).toLong)
                case ByteType => acc.addLong(i, r.getByte(o).toLong)
                case other => throw new IllegalStateException(s"piggy type $other")
              }
            } else {
              val v = boundP(i).eval(r)
              if (v != null) inTypes(i) match {
                case FloatType | DoubleType =>
                  acc.addDouble(i, v match {
                    case d: java.lang.Double => d.doubleValue()
                    case f: java.lang.Float => f.doubleValue()
                  })
                case _ => acc.addLong(i, toLong(v))
              }
            }
            i += 1
          }
        }
        emit(acc, valueTypes)
      }
    }
  }
}
