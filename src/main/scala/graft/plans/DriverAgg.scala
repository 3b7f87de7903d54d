package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types._

/** Low-cardinality grouped aggregation finalized on the DRIVER — the
  * engine's analog of the reference's perfect-hash aggregate
  * (/root/reference/src/execution/operator/aggregate/
  * physical_perfecthash_aggregate.cpp): when the group domain is small
  * (pricing-summary flags, hour buckets × event types, nations), the
  * final merge is a few hundred rows of state, and routing it through a
  * shuffle exchange + second stage + separate sort job costs more than
  * the whole aggregation does.
  *
  * Shape: ONE distributed job computes per-partition partial states
  * (codegen'd key/value projections feeding a hash map); the task results
  * — O(groups) per task, the same payload a `collect()` of the shuffled
  * aggregate's output would move — merge on the driver, where the final
  * result expressions, sort and limit evaluate over the handful of
  * groups. This is the coordinator-merge every native engine performs for
  * low-cardinality aggregation; Spark's task-result path is its
  * transport, and the partial stage keeps ordinary map-side-combine
  * semantics (each input row read once, in parallel).
  *
  * Scale posture: driver state is O(tasks × groups). The `maxGroups`
  * valve (default 64k) aborts the coordinator-merge mid-flight if the
  * low-cardinality claim turns out false, and the exec then RE-RUNS the
  * retained ordinary shuffled plan (`groupBy → orderBy → limit`, kept
  * verbatim in [[DriverGroupAggPlan.fallback]]) — the right plan for
  * high-cardinality keys. A wrong cardinality guess costs one aborted
  * scan, never a wrong answer or a dead query.
  *
  * All unsupported surface (DISTINCT, FILTER, decimals, aggregates beyond
  * Sum/Count/Average/Min/Max) throws at PLAN time in [[DriverAgg.lowCard]];
  * the logical node itself carries only pre-compiled slot specs and
  * BoundReference-based final expressions, so nothing unresolvable ever
  * enters the plan tree.
  */
object DriverAgg {

  /** Raised when a partition or the merged state exceeds `maxGroups`;
    * [[DriverGroupAggExec]] catches it (also through Spark's task-failure
    * wrapping) and re-runs the retained shuffled plan.
    */
  final class GroupCardinalityExceeded(msg: String) extends RuntimeException(msg)

  /** True while the valve fallback re-plans its retained shuffled plan.
    * [[graft.rules.BoundedKeyDriverAgg]] checks it: re-routing the
    * fallback into another driver agg (same stats, same wrong proof)
    * would recurse forever.
    */
  private[graft] val replanning = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Per-aggregate accumulator layout. `li`/`di`/`fi` index into the
    * long/double/flag state arrays; `in` indexes the value projection.
    */
  sealed trait Slot extends Serializable
  final case class CountSlot(li: Int, nullChecked: Seq[Int]) extends Slot
  final case class SumLSlot(li: Int, fi: Int, in: Int) extends Slot
  final case class SumDSlot(di: Int, fi: Int, in: Int) extends Slot
  final case class AvgSlot(di: Int, li: Int, in: Int) extends Slot
  final case class MinMaxLSlot(li: Int, fi: Int, in: Int, isMin: Boolean) extends Slot
  final case class MinMaxDSlot(di: Int, fi: Int, in: Int, isMin: Boolean) extends Slot
  /** Exact per-group distinct set for `count(DISTINCT x)` over a child
    * whose value domain is statistics-bounded. OPT-IN via
    * `layout(allowDistinct = true)` — ONLY the driver-finalized exec can
    * carry it (set state has no radix columnar encoding); the radix and
    * sorted-run call sites keep the default and still reject DISTINCT.
    */
  final case class CountDistinctSlot(si: Int, in: Int) extends Slot
  /** min/max over strings — state is a detached UTF8String in the Acc's
    * object array (strings have no long/double encoding).
    */
  final case class MinMaxSSlot(oi: Int, in: Int, isMin: Boolean) extends Slot

  final case class Layout(slots: Seq[Slot], aggTypes: Seq[DataType],
                          inputs: Seq[Expression], nL: Int, nD: Int, nF: Int,
                          nS: Int = 0, nO: Int = 0)

  /** Mutable per-group state (serializable: it is the task-result payload). */
  final class Acc(val longs: Array[Long], val doubles: Array[Double],
                  val flags: Array[Boolean],
                  val sets: Array[java.util.HashSet[AnyRef]] = null,
                  val objs: Array[AnyRef] = null)
    extends Serializable

  /** Fresh distinct-set array for an Acc (null when the layout has none —
    * the common case pays nothing).
    */
  private[graft] def newSets(nS: Int): Array[java.util.HashSet[AnyRef]] =
    if (nS == 0) null else Array.fill(nS)(new java.util.HashSet[AnyRef]())

  private[graft] def newObjs(nO: Int): Array[AnyRef] =
    if (nO == 0) null else new Array[AnyRef](nO)

  /** Distinct sets are driver-merged task state: cap each one like the
    * group table so a false ndv bound aborts into the fallback, never
    * OOMs the driver.
    */
  private[plans] val maxDistinctCap = 1 << 16

  /** Dense direct-index partial for single calendar-bucket keys — the
    * perfect-hash aggregate proper (reference:
    * physical_perfecthash_aggregate.cpp direct-indexes group state by
    * the proven key range). Escape hatch for A/B + differential specs.
    */
  @volatile var denseCalendarEnabled: Boolean =
    !sys.env.get("GRAFT_NO_DENSE_CAL").contains("1")

  /** Dict-id group keys in the batch partial: when a string key column
    * is served dictionary-encoded by the cache, per-batch dictionary ids
    * remap to task-level intern ids once per batch and rows key by an
    * int-array read — the reference's DICTIONARY-vector aggregation
    * (reference: src/include/duckdb/common/enums/vector_type.hpp:15-21,
    * physical_hash_aggregate.cpp over dictionary vectors). Escape hatch
    * for A/B + differential specs.
    */
  /** Dense single-string-key grouping: index groups directly by intern id
    * (no per-row hash probe) — the perfect-hash group-by applied to the
    * interned string domain. Escape hatch: GRAFT_NO_DIRECT_STR_KEY=1.
    */
  @volatile var directStringArm: Boolean =
    !sys.env.get("GRAFT_NO_DIRECT_STR_KEY").contains("1")

  @volatile var dictKeysEnabled: Boolean =
    !sys.env.get("GRAFT_NO_DICT_KEYS").contains("1")

  /** Compiled double-expression aggregate inputs in the batch partial
    * (the q1 disc_price/charge shape): {col, lit, +, -, ×, cast-to-
    * double} trees evaluate straight off the vectors in the plan's
    * exact shape (bit-identical IEEE result), instead of routing EVERY
    * input through the per-row UnsafeProjection when any one input is
    * an expression. Escape hatch for A/B + differential specs.
    */
  @volatile var exprVecEnabled: Boolean =
    !sys.env.get("GRAFT_NO_EXPR_VEC").contains("1")

  /** Filter fold into the batch partial ([[graft.rules
    * .InsertCacheColumnarToRow]] replaces Filter-over-cache-scan children
    * with a per-batch [[DictSelection]] inside the partial loop — the
    * selection-pushed scan the reference's table scan performs).
    */
  @volatile var aggSelectionEnabled: Boolean =
    !sys.env.get("GRAFT_NO_AGG_SELECTION").contains("1")

  private def maxDistinctPerGroup = maxDistinctCap

  // ---- vector-direct aggregate-input plans ---------------------------
  /** Per-input access plan for the batch partial: DirectIn reads the
    * column; CompiledIn evaluates a compiled double tree over the
    * batch's vectors (null iff any referenced column is null — the
    * null semantics of +/-/× over nullable inputs).
    */
  private[plans] sealed trait InPlan extends Serializable
  private[plans] final case class DirectIn(ord: Int) extends InPlan
  private[plans] final case class CompiledIn(prog: DProg, ords: Array[Int]) extends InPlan

  /** Double-expression program node. Walked in the analyzed plan's
    * exact tree shape — same IEEE operation order as codegen, so
    * results are bit-identical. Doubles cannot overflow-throw, so ANSI
    * and legacy eval modes agree on every node compiled here.
    */
  private[plans] sealed trait DProg extends Serializable {
    def eval(cols: Array[org.apache.spark.sql.vectorized.ColumnVector], r: Int): Double
  }
  private[plans] final case class DCol(ord: Int, tc: Int) extends DProg {
    def eval(cols: Array[org.apache.spark.sql.vectorized.ColumnVector], r: Int): Double =
      tc match {
        case 0 => cols(ord).getByte(r).toDouble
        case 1 => cols(ord).getShort(r).toDouble
        case 2 => cols(ord).getInt(r).toDouble
        case 3 => cols(ord).getLong(r).toDouble
        case 4 => cols(ord).getFloat(r).toDouble
        case _ => cols(ord).getDouble(r)
      }
  }
  private[plans] final case class DLit(v: Double) extends DProg {
    def eval(cols: Array[org.apache.spark.sql.vectorized.ColumnVector], r: Int): Double = v
  }
  private[plans] final case class DAdd(l: DProg, rp: DProg) extends DProg {
    def eval(cols: Array[org.apache.spark.sql.vectorized.ColumnVector], r: Int): Double =
      l.eval(cols, r) + rp.eval(cols, r)
  }
  private[plans] final case class DSub(l: DProg, rp: DProg) extends DProg {
    def eval(cols: Array[org.apache.spark.sql.vectorized.ColumnVector], r: Int): Double =
      l.eval(cols, r) - rp.eval(cols, r)
  }
  private[plans] final case class DMul(l: DProg, rp: DProg) extends DProg {
    def eval(cols: Array[org.apache.spark.sql.vectorized.ColumnVector], r: Int): Double =
      l.eval(cols, r) * rp.eval(cols, r)
  }

  private def dTypeCode(dt: DataType): Int = dt match {
    case ByteType => 0
    case ShortType => 1
    case IntegerType => 2
    case LongType => 3
    case FloatType => 4
    case DoubleType => 5
    case _ => -1
  }

  /** Compile a DoubleType expression over direct columns, or None. Only
    * node kinds whose double semantics are mode-independent and
    * null-iff-any-input-null are admitted: attribute reads, non-null
    * literals, numeric→double casts of attributes, +, -, ×.
    */
  private[plans] def compileDouble(e: Expression,
      childOut: Seq[Attribute]): Option[CompiledIn] = {
    val ords = ArrayBuffer.empty[Int]
    def ordOf(a: Attribute): Option[Int] = {
      val i = childOut.indexWhere(_.exprId == a.exprId)
      if (i < 0) None else { if (!ords.contains(i)) ords += i; Some(i) }
    }
    def go(x: Expression): Option[DProg] = x match {
      case a: AttributeReference if a.dataType == DoubleType =>
        ordOf(a).map(DCol(_, 5))
      case c: Cast if c.dataType == DoubleType => c.child match {
        case a: AttributeReference if dTypeCode(a.dataType) >= 0 =>
          ordOf(a).map(DCol(_, dTypeCode(a.dataType)))
        case _ => None
      }
      case Literal(v: Double, DoubleType) => Some(DLit(v))
      case Literal(v: Float, FloatType) => Some(DLit(v.toDouble))
      case a: Add if a.dataType == DoubleType =>
        for (l <- go(a.left); r <- go(a.right)) yield DAdd(l, r)
      case s: Subtract if s.dataType == DoubleType =>
        for (l <- go(s.left); r <- go(s.right)) yield DSub(l, r)
      case m: Multiply if m.dataType == DoubleType =>
        for (l <- go(m.left); r <- go(m.right)) yield DMul(l, r)
      case _ => None
    }
    if (e.isInstanceOf[AttributeReference]) None // DirectIn handles those
    else go(e).map(p => CompiledIn(p, ords.toArray))
  }

  /** Long addition per the session's eval mode, decided at PLAN time:
    * ANSI throws on overflow (Math.addExact), default Spark wraps —
    * diverging from that would make a rewritten query fail where the
    * un-rewritten plan returns a (wrapped) result.
    */
  private[graft] def longAdd(ansi: Boolean): (Long, Long) => Long =
    if (ansi) Math.addExact else _ + _

  /** Compile slots to per-row updaters against the value-projection row.
    * Top-level (no plan capture): the returned closures ship in the task.
    */
  private[plans] def updaters(slots: Seq[Slot], iExprs: Seq[Expression],
      ansi: Boolean): Array[(UnsafeRow, Acc) => Unit] = {
    val addL = longAdd(ansi)
    def readL(i: Int): (UnsafeRow) => Long = iExprs(i).dataType match {
      case ByteType => r => r.getByte(i).toLong
      case ShortType => r => r.getShort(i).toLong
      case IntegerType | DateType => r => r.getInt(i).toLong
      case _ => r => r.getLong(i)
    }
    def readD(i: Int): (UnsafeRow) => Double = iExprs(i).dataType match {
      case ByteType => r => r.getByte(i).toDouble
      case ShortType => r => r.getShort(i).toDouble
      case IntegerType | DateType => r => r.getInt(i).toDouble
      case LongType | TimestampType | TimestampNTZType => r => r.getLong(i).toDouble
      case FloatType => r => r.getFloat(i).toDouble
      case _ => r => r.getDouble(i)
    }
    slots.map[(UnsafeRow, Acc) => Unit] {
      case CountSlot(li, checked) =>
        val ia = checked.toArray
        (v, acc) => {
          var ok = true; var j = 0
          while (j < ia.length) { if (v.isNullAt(ia(j))) ok = false; j += 1 }
          if (ok) acc.longs(li) += 1
        }
      case SumLSlot(li, fi, in) =>
        val rd = readL(in)
        (v, acc) => if (!v.isNullAt(in)) {
          acc.longs(li) =
            if (acc.flags(fi)) addL(acc.longs(li), rd(v)) else rd(v)
          acc.flags(fi) = true
        }
      case SumDSlot(di, fi, in) =>
        val rd = readD(in)
        (v, acc) => if (!v.isNullAt(in)) { acc.doubles(di) += rd(v); acc.flags(fi) = true }
      case AvgSlot(di, li, in) =>
        val rd = readD(in)
        (v, acc) => if (!v.isNullAt(in)) { acc.doubles(di) += rd(v); acc.longs(li) += 1 }
      case MinMaxLSlot(li, fi, in, isMin) =>
        val rd = readL(in)
        (v, acc) => if (!v.isNullAt(in)) {
          val x = rd(v)
          if (!acc.flags(fi) || (if (isMin) x < acc.longs(li) else x > acc.longs(li)))
            acc.longs(li) = x
          acc.flags(fi) = true
        }
      case MinMaxDSlot(di, fi, in, isMin) =>
        val rd = readD(in)
        (v, acc) => if (!v.isNullAt(in)) {
          val x = rd(v)
          val c = java.lang.Double.compare(x, acc.doubles(di))
          if (!acc.flags(fi) || (if (isMin) c < 0 else c > 0)) acc.doubles(di) = x
          acc.flags(fi) = true
        }
      case CountDistinctSlot(si, in) =>
        val rd = readBoxed(iExprs(in).dataType, in)
        (v, acc) => if (!v.isNullAt(in)) {
          val s = acc.sets(si)
          if (s.add(rd(v)) && s.size() > maxDistinctPerGroup)
            throw new GroupCardinalityExceeded(
              s"driver agg: distinct set exceeded $maxDistinctPerGroup in one " +
                "group — child is not low-cardinality; falling back")
        }
      case MinMaxSSlot(oi, in, isMin) =>
        (v, acc) => if (!v.isNullAt(in)) {
          val x = v.getUTF8String(in)
          val cur = acc.objs(oi).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          if (cur == null || (if (isMin) x.compareTo(cur) < 0 else x.compareTo(cur) > 0))
            acc.objs(oi) = x.clone()
        }
    }.toArray
  }

  /** Boxed (hashable, buffer-detached) read of column `i` for distinct
    * sets. UTF8String clones off the row buffer; primitives box.
    */
  private def readBoxed(dt: DataType, i: Int): UnsafeRow => AnyRef = dt match {
    case ByteType => r => java.lang.Long.valueOf(r.getByte(i).toLong)
    case ShortType => r => java.lang.Long.valueOf(r.getShort(i).toLong)
    case IntegerType | DateType => r => java.lang.Long.valueOf(r.getInt(i).toLong)
    case LongType | TimestampType | TimestampNTZType =>
      r => java.lang.Long.valueOf(r.getLong(i))
    case FloatType => r => java.lang.Double.valueOf(r.getFloat(i).toDouble)
    case DoubleType => r => java.lang.Double.valueOf(r.getDouble(i))
    case BooleanType => r => java.lang.Boolean.valueOf(r.getBoolean(i))
    case StringType => r => r.getUTF8String(i).clone()
    case other => throw new UnsupportedOperationException(
      s"driver agg: distinct over ${other.simpleString} unsupported")
  }

  /** Merge one partial state into an accumulator (shared by the
    * driver-merge exec and the radix shuffle aggregate's reducers).
    */
  def mergeAcc(slots: Seq[Slot], cur: Acc, in: Acc, ansi: Boolean): Unit = slots.foreach {
    case CountSlot(li, _) => cur.longs(li) += in.longs(li)
    case SumLSlot(li, fi, _) => if (in.flags(fi)) {
      cur.longs(li) =
        if (cur.flags(fi)) longAdd(ansi)(cur.longs(li), in.longs(li)) else in.longs(li)
      cur.flags(fi) = true
    }
    case SumDSlot(di, fi, _) => if (in.flags(fi)) {
      cur.doubles(di) += in.doubles(di); cur.flags(fi) = true
    }
    case AvgSlot(di, li, _) =>
      cur.doubles(di) += in.doubles(di); cur.longs(li) += in.longs(li)
    case MinMaxLSlot(li, fi, _, isMin) => if (in.flags(fi)) {
      if (!cur.flags(fi) ||
          (if (isMin) in.longs(li) < cur.longs(li) else in.longs(li) > cur.longs(li)))
        cur.longs(li) = in.longs(li)
      cur.flags(fi) = true
    }
    case MinMaxDSlot(di, fi, _, isMin) => if (in.flags(fi)) {
      val c = java.lang.Double.compare(in.doubles(di), cur.doubles(di))
      if (!cur.flags(fi) || (if (isMin) c < 0 else c > 0)) cur.doubles(di) = in.doubles(di)
      cur.flags(fi) = true
    }
    case CountDistinctSlot(si, _) =>
      val s = cur.sets(si)
      s.addAll(in.sets(si))
      if (s.size() > maxDistinctPerGroup) throw new GroupCardinalityExceeded(
        s"driver agg: merged distinct set exceeded $maxDistinctPerGroup — " +
          "child is not low-cardinality; falling back")
    case MinMaxSSlot(oi, _, isMin) =>
      val x = in.objs(oi).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val c0 = cur.objs(oi).asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      if (x != null &&
          (c0 == null || (if (isMin) x.compareTo(c0) < 0 else x.compareTo(c0) > 0)))
        cur.objs(oi) = x
  }

  /** Final value of aggregate `j` as a catalyst value of `aggTypes(j)`. */
  def finalValue(slots: Seq[Slot], aggTypes: Seq[DataType], j: Int, acc: Acc): Any =
    slots(j) match {
      case CountSlot(li, _) => acc.longs(li)
      case SumLSlot(li, fi, _) => if (acc.flags(fi)) acc.longs(li) else null
      case SumDSlot(di, fi, _) =>
        if (!acc.flags(fi)) null
        else if (aggTypes(j) == FloatType) acc.doubles(di).toFloat else acc.doubles(di)
      case AvgSlot(di, li, _) =>
        if (acc.longs(li) > 0) acc.doubles(di) / acc.longs(li) else null
      case MinMaxLSlot(li, fi, _, _) =>
        if (!acc.flags(fi)) null
        else aggTypes(j) match {
          case ByteType => acc.longs(li).toByte
          case ShortType => acc.longs(li).toShort
          case IntegerType | DateType => acc.longs(li).toInt
          case _ => acc.longs(li)
        }
      case MinMaxDSlot(di, fi, _, _) =>
        if (!acc.flags(fi)) null
        else if (aggTypes(j) == FloatType) acc.doubles(di).toFloat else acc.doubles(di)
      case CountDistinctSlot(si, _) => acc.sets(si).size().toLong
      case MinMaxSSlot(oi, _, _) => acc.objs(oi)
    }

  /** Dev escape hatch for the typed-drain A/B (graft.BenchABDrain): when
    * false, [[writeFinal]] routes through the boxed finalValue +
    * update(Any) path it replaced, so the allocation cut can be
    * attributed interleaved same-JVM per the PERF.md protocol.
    */
  @volatile var typedDrain = true

  /** Typed twin of [[finalValue]]: writes aggregate `j` straight into a
    * mutable row via primitive setters. With a SpecificInternalRow
    * target this is allocation-free — the sorted-run aggregate's drain
    * emits one row per GROUP, so the boxed `update(Any)` path costs a
    * Long/Double box per aggregate per group (tens of millions of
    * objects on groups≈rows shapes, pure GC churn).
    */
  def writeFinal(slots: Seq[Slot], aggTypes: Seq[DataType], j: Int, acc: Acc,
      row: org.apache.spark.sql.catalyst.InternalRow, pos: Int): Unit =
    if (!typedDrain) {
      val v = finalValue(slots, aggTypes, j, acc)
      if (v == null) row.setNullAt(pos) else row.update(pos, v)
    } else slots(j) match {
      case CountSlot(li, _) => row.setLong(pos, acc.longs(li))
      case SumLSlot(li, fi, _) =>
        if (acc.flags(fi)) row.setLong(pos, acc.longs(li)) else row.setNullAt(pos)
      case SumDSlot(di, fi, _) =>
        if (!acc.flags(fi)) row.setNullAt(pos)
        else if (aggTypes(j) == FloatType) row.setFloat(pos, acc.doubles(di).toFloat)
        else row.setDouble(pos, acc.doubles(di))
      case AvgSlot(di, li, _) =>
        if (acc.longs(li) > 0) row.setDouble(pos, acc.doubles(di) / acc.longs(li))
        else row.setNullAt(pos)
      case MinMaxLSlot(li, fi, _, _) =>
        if (!acc.flags(fi)) row.setNullAt(pos)
        else aggTypes(j) match {
          case ByteType => row.setByte(pos, acc.longs(li).toByte)
          case ShortType => row.setShort(pos, acc.longs(li).toShort)
          case IntegerType | DateType => row.setInt(pos, acc.longs(li).toInt)
          case _ => row.setLong(pos, acc.longs(li))
        }
      case MinMaxDSlot(di, fi, _, _) =>
        if (!acc.flags(fi)) row.setNullAt(pos)
        else if (aggTypes(j) == FloatType) row.setFloat(pos, acc.doubles(di).toFloat)
        else row.setDouble(pos, acc.doubles(di))
      case CountDistinctSlot(si, _) => row.setLong(pos, acc.sets(si).size().toLong)
      case MinMaxSSlot(oi, _, _) => row.update(pos, acc.objs(oi))
    }

  // ---- columnar key extraction --------------------------------------
  // The partial's row path pays ~250 ns/row at bench scale: a
  // column-to-row materialization, two UnsafeProjections, and an
  // UnsafeRow-keyed HashMap probe per input row. The gated shapes group
  // by at most two parts, each a plain column or an hour-bucket — the
  // reference's perfect-hash aggregate reads those straight off vectors
  // (physical_perfecthash_aggregate.cpp). These specs describe group
  // exprs a batch loop can evaluate without any row projection; string
  // parts intern to small task-local ids, so the per-row key is one or
  // two longs probed against an open-addressing table.
  sealed trait ColKeyPart extends Serializable { def ord: Int }
  final case class LongKeyPart(ord: Int, intWidth: Boolean, dt: DataType) extends ColKeyPart
  final case class TruncKeyPart(ord: Int, unit: Long) extends ColKeyPart
  final case class StringKeyPart(ord: Int) extends ColKeyPart
  /** Calendar (non-fixed-width) trunc of a micros column via the codegen
    * kernels; `asDate` additionally floors micros → epoch days (the
    * `CAST(date_trunc(..) AS DATE)` histogram shape).
    */
  final case class CalendarKeyPart(ord: Int, kernel: String, asDate: Boolean)
      extends ColKeyPart {
    @transient private lazy val fn: Long => Long = kernel match {
      case "truncWeek" => graft.functions.DateTruncKernel.truncWeek
      case "truncMonth" => graft.functions.DateTruncKernel.truncMonth
      case "truncQuarter" => graft.functions.DateTruncKernel.truncQuarter
      case "truncYear" => graft.functions.DateTruncKernel.truncYear
    }
    def eval(us: Long): Long = {
      val t = fn(us)
      if (asDate) Math.floorDiv(t, 86400000000L) else t
    }
  }

  /** Columnar-translatable group keys: direct int/long/date/timestamp or
    * string attributes, or the FastUtcDateTrunc arithmetic shape
    * (`micros_to_timestamp(micros - pmod(micros, unit))`) over a direct
    * timestamp column. At most 2 parts — the gated call sites' shapes.
    */
  private[plans] def colKeyParts(groupExprs: Seq[Expression],
      childOut: Seq[Attribute]): Option[Seq[ColKeyPart]] = {
    // UNGROUPED: trivially columnar-translatable (no key to extract) —
    // the batch partial runs its dedicated single-acc loop
    if (groupExprs.isEmpty) return Some(Nil)
    if (groupExprs.length > 2) return None
    def ordOf(a: Attribute): Int = childOut.indexWhere(_.exprId == a.exprId)
    // the micros source of a calendar trunc: a timestamp column, or an
    // NTZ column through the UTC reinterpret (both store micros longs in
    // the column vector)
    def calSrcAttr(src: Expression): Option[AttributeReference] = src match {
      case a: AttributeReference
          if a.dataType == TimestampType || a.dataType == TimestampNTZType => Some(a)
      case graft.functions.UtcNtzReinterpret(a: AttributeReference)
          if a.dataType == TimestampNTZType => Some(a)
      case _ => None
    }
    val parts: Seq[Option[ColKeyPart]] = groupExprs.map { g =>
      val e = g match { case a: Alias => a.child; case x => x }
      e match {
        case a: AttributeReference if ordOf(a) >= 0 => a.dataType match {
          case IntegerType | DateType =>
            Some(LongKeyPart(ordOf(a), intWidth = true, a.dataType))
          case LongType | TimestampType | TimestampNTZType =>
            Some(LongKeyPart(ordOf(a), intWidth = false, a.dataType))
          case StringType => Some(StringKeyPart(ordOf(a)))
          case _ => None
        }
        case graft.functions.UtcMicrosToDate(graft.functions.UtcCalendarTrunc(src, k)) =>
          calSrcAttr(src).filter(a => ordOf(a) >= 0)
            .map(a => CalendarKeyPart(ordOf(a), k, asDate = true))
        case graft.functions.UtcCalendarTrunc(src, k) =>
          calSrcAttr(src).filter(a => ordOf(a) >= 0)
            .map(a => CalendarKeyPart(ordOf(a), k, asDate = false))
        case MicrosToTimestamp(sub: Subtract) => (sub.left, sub.right) match {
          case (UnixMicros(a: AttributeReference), p: Pmod) =>
            (p.left, p.right) match {
              case (UnixMicros(a2: AttributeReference), Literal(u: Long, LongType))
                  if a.exprId == a2.exprId && ordOf(a) >= 0 && u > 0 =>
                Some(TruncKeyPart(ordOf(a), u))
              case _ => None
            }
          case _ => None
        }
        case _ => None
      }
    }
    if (parts.forall(_.isDefined)) Some(parts.map(_.get)) else None
  }

  private def isLongIsh(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }
  private def isDoubleIsh(dt: DataType): Boolean =
    dt == DoubleType || dt == FloatType

  /** Slot layout for the distinct AggregateExpressions in `resultExprs`
    * (in first-occurrence order), or throw for unsupported aggregates.
    */
  private[graft] def layout(aggs: Seq[AggregateExpression],
      allowDistinct: Boolean = false): Layout = {
    val inputs = ArrayBuffer.empty[Expression]
    def inputIdx(e: Expression): Int = {
      val i = inputs.indexWhere(_.semanticEquals(e))
      if (i >= 0) i else { inputs += e; inputs.length - 1 }
    }
    var nL = 0; var nD = 0; var nF = 0; var nS = 0; var nO = 0
    def longSlot(): Int = { nL += 1; nL - 1 }
    def dblSlot(): Int = { nD += 1; nD - 1 }
    def flag(): Int = { nF += 1; nF - 1 }
    def setSlot(): Int = { nS += 1; nS - 1 }
    def objSlot(): Int = { nO += 1; nO - 1 }
    val slots = aggs.map { ae =>
      require((allowDistinct || !ae.isDistinct) && ae.filter.isEmpty,
        s"driver agg: DISTINCT/FILTER unsupported in ${ae.sql}")
      if (ae.isDistinct) ae.aggregateFunction match {
        case Count(Seq(c)) => CountDistinctSlot(setSlot(), inputIdx(c))
        case other => throw new UnsupportedOperationException(
          s"driver agg: DISTINCT supported only for single-child count, got ${other.prettyName}")
      }
      else ae.aggregateFunction match {
        case Count(children) => CountSlot(longSlot(),
          children.filterNot(c => c.foldable && c.eval() != null).map(inputIdx))
        case Sum(c, _) if isLongIsh(c.dataType) => SumLSlot(longSlot(), flag(), inputIdx(c))
        case Sum(c, _) if isDoubleIsh(c.dataType) => SumDSlot(dblSlot(), flag(), inputIdx(c))
        case Average(c, _) if isLongIsh(c.dataType) || isDoubleIsh(c.dataType) =>
          AvgSlot(dblSlot(), longSlot(), inputIdx(c))
        case Min(c) if isLongIsh(c.dataType) =>
          MinMaxLSlot(longSlot(), flag(), inputIdx(c), isMin = true)
        case Max(c) if isLongIsh(c.dataType) =>
          MinMaxLSlot(longSlot(), flag(), inputIdx(c), isMin = false)
        case Min(c) if isDoubleIsh(c.dataType) =>
          MinMaxDSlot(dblSlot(), flag(), inputIdx(c), isMin = true)
        case Min(c) if c.dataType == StringType =>
          MinMaxSSlot(objSlot(), inputIdx(c), isMin = true)
        case Max(c) if c.dataType == StringType =>
          MinMaxSSlot(objSlot(), inputIdx(c), isMin = false)
        case Max(c) if isDoubleIsh(c.dataType) =>
          MinMaxDSlot(dblSlot(), flag(), inputIdx(c), isMin = false)
        case other => throw new UnsupportedOperationException(
          s"driver agg: unsupported aggregate ${other.prettyName} over " +
            s"${other.children.map(_.dataType.simpleString).mkString(", ")}")
      }
    }
    Layout(slots, aggs.map(_.dataType), inputs.toSeq, nL, nD, nF, nS, nO)
  }

  /** Rebuild `grouped` (which must be a plain `groupBy(...).agg(...)`
    * DataFrame) as a driver-finalized aggregate with the given total
    * order and optional limit. Result-identical to
    * `grouped.orderBy(sortCols: _*).limit(n)`; plans ONE job, no
    * exchange, no separate sort. Throws at plan time if the aggregate
    * uses anything outside the supported surface.
    */
  def lowCard(grouped: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
              limit: Int = -1, maxGroups: Int = 1 << 16): DataFrame = {
    val spark = grouped.sparkSession
    val agg = grouped.queryExecution.analyzed match {
      case a: Aggregate => a
      case other => throw new IllegalArgumentException(
        s"DriverAgg.lowCard needs a bare groupBy().agg() plan, got ${other.nodeName}")
    }
    // let the ANALYZER resolve the sort columns against the aggregate's
    // output (Spark 4 Columns are lazy ColumnNodes — manual resolution
    // would re-implement the analyzer); the analyzed Sort is thrown away,
    // only its resolved SortOrder list is kept
    val order: Seq[SortOrder] =
      if (sortCols.isEmpty) Nil
      else grouped.orderBy(sortCols: _*).queryExecution.analyzed match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order
        case other => throw new IllegalArgumentException(
          s"sort columns must resolve against the aggregate output alone, got ${other.nodeName}")
      }

    // the result-identical shuffled plan, retained verbatim: when the
    // low-cardinality claim fails at runtime the exec re-plans THIS
    // (fresh QueryExecution, ordinary partial→exchange→final aggregate)
    // instead of dying
    val fallbackDf = {
      val sorted = if (sortCols.isEmpty) grouped else grouped.orderBy(sortCols: _*)
      if (limit >= 0) sorted.limit(limit) else sorted
    }

    org.apache.spark.sql.graft.bridge.ofRows(spark,
      fromAggregate(agg, order, limit, maxGroups,
        fallbackDf.queryExecution.analyzed,
        spark.sessionState.conf.ansiEnabled))
  }

  /** Plan-level core of [[lowCard]]: convert an analyzed/optimized bare
    * Aggregate (plus a resolved total order and optional limit) into a
    * [[DriverGroupAggPlan]]. Throws for any aggregate outside the slot
    * surface (DISTINCT/FILTER/decimals/exotic functions) — callers that
    * must not fail (the auto-routing rule) wrap in Try.
    */
  private[graft] def fromAggregate(agg: Aggregate, order: Seq[SortOrder],
      limit: Int, maxGroups: Int, fallback: LogicalPlan,
      ansi: Boolean, allowDistinct: Boolean = false): DriverGroupAggPlan = {
    val groupExprs = agg.groupingExpressions
    val resultExprs = agg.aggregateExpressions
    val out = resultExprs.map(_.toAttribute)

    val aggs = ArrayBuffer.empty[AggregateExpression]
    resultExprs.foreach(_.foreach {
      case ae: AggregateExpression if !aggs.exists(_.semanticEquals(ae)) => aggs += ae
      case _ =>
    })
    val lay = layout(aggs.toSeq, allowDistinct)

    // rewrite the result expressions over the driver-side merged row
    // [key fields ++ final aggregate values] — after this, the plan holds
    // no AggregateExpression and no child references in the final stage
    val nKeys = groupExprs.length
    val strippedKeys = groupExprs.map { case a: Alias => a.child; case e => e }
    def rewrite(e: Expression): Expression = {
      val ki = strippedKeys.indexWhere(_.semanticEquals(e match {
        case a: Alias => a.child; case x => x
      }))
      e match {
        case a: Alias =>
          a.copy(child = rewrite(a.child))(a.exprId, a.qualifier, a.explicitMetadata,
            a.nonInheritableMetadataKeys)
        case _ if ki >= 0 => BoundReference(ki, e.dataType, e.nullable)
        case ae: AggregateExpression =>
          val ai = aggs.indexWhere(_.semanticEquals(ae))
          BoundReference(nKeys + ai, ae.dataType, nullable = true)
        case other => other.mapChildren(rewrite)
      }
    }
    val finalExprs: Seq[NamedExpression] = resultExprs.map { ne =>
      rewrite(ne) match {
        case n: NamedExpression => n
        case e => Alias(e, ne.name)(ne.exprId, ne.qualifier)
      }
    }

    DriverGroupAggPlan(groupExprs, lay.inputs, lay.slots, lay.aggTypes,
      finalExprs, order, limit, maxGroups,
      lay.nL, lay.nD, lay.nF, lay.nS, lay.nO, agg.child, out, fallback, ansi)
  }
}

final case class DriverGroupAggPlan(
    groupExprs: Seq[Expression],
    aggInputs: Seq[Expression],
    slots: Seq[DriverAgg.Slot],
    aggTypes: Seq[DataType],
    finalExprs: Seq[NamedExpression],
    sortOrder: Seq[SortOrder],
    limit: Int,
    maxGroups: Int,
    nL: Int, nD: Int, nF: Int, nS: Int, nO: Int,
    child: LogicalPlan,
    output: Seq[Attribute],
    // NOT a child: the analyzed shuffled groupBy→orderBy→limit plan the
    // exec re-runs (own QueryExecution) if maxGroups trips at runtime
    fallback: LogicalPlan,
    ansi: Boolean) extends UnaryNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // Only groupExprs/aggInputs evaluate against the child (finalExprs are
  // BoundReference-based, sortOrder binds to `output`). Pass-through group
  // keys share exprIds with `output`, so the default
  // expressions-minus-producedAttributes would hide them from
  // ColumnPruning and the child would lose its grouping columns.
  override def references: AttributeSet =
    AttributeSet((groupExprs ++ aggInputs).flatMap(_.references))
  override protected def withNewChildInternal(c: LogicalPlan): DriverGroupAggPlan =
    copy(child = c)
}

object DriverAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: DriverGroupAggPlan =>
      DriverGroupAggExec(p.groupExprs, p.aggInputs, p.slots, p.aggTypes,
        p.finalExprs, p.sortOrder, p.limit, p.maxGroups, p.nL, p.nD, p.nF, p.nS, p.nO,
        p.output, planLater(p.child), p.fallback, p.ansi) :: Nil
    case _ => Nil
  }
}

final case class DriverGroupAggExec(
    groupExprs: Seq[Expression],
    aggInputs: Seq[Expression],
    slots: Seq[DriverAgg.Slot],
    aggTypes: Seq[DataType],
    finalExprs: Seq[NamedExpression],
    sortOrder: Seq[SortOrder],
    limit: Int,
    maxGroups: Int,
    nL: Int, nD: Int, nF: Int, nS: Int, nO: Int,
    output: Seq[Attribute],
    child: SparkPlan,
    // driver-side only (the valve fallback). MUST be @transient: when
    // this exec runs inside a ScalarSubquery, the enclosing stage's
    // task closure serializes the subquery expression tree — and an
    // analyzed LogicalPlan holds non-serializable file indexes.
    @transient fallback: LogicalPlan,
    ansi: Boolean,
    // batch-direct partial (InsertCacheColumnarToRow peels the transition
    // when the keys columnar-translate — see DriverAgg.colKeyParts)
    columnarChild: Boolean = false,
    // filter conjuncts folded INTO the batch partial (the rule replaces a
    // Filter/CacheFilterExec child with this selection, evaluated per
    // batch by DictSelection's dict/prim/row tiers — the selection-pushed
    // scan). Only ever non-empty together with columnarChild.
    selection: Seq[Expression] = Nil) extends UnaryExecNode {

  require(selection.isEmpty || columnarChild,
    "selection fold requires the batch-direct partial")

  import DriverAgg._

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: SparkPlan): DriverGroupAggExec =
    copy(child = c)

  /** Batch-direct partial eligibility against a columnar child: every
    * group key columnar-translates and the value projection's inputs
    * resolve in the child's output (they always do — same attrs as the
    * peeled transition's).
    */
  def columnarEligible(c: SparkPlan): Boolean =
    DriverAgg.colKeyParts(groupExprs, c.output).isDefined &&
      aggInputs.forall(_.references.subsetOf(c.outputSet))

  private def newAcc() = new Acc(new Array[Long](nL), new Array[Double](nD),
    new Array[Boolean](nF), DriverAgg.newSets(nS), DriverAgg.newObjs(nO))

  private def mergeInto(cur: Acc, in: Acc): Unit =
    DriverAgg.mergeAcc(slots, cur, in, ansi)

  private def finalVal(j: Int, acc: Acc): Any =
    DriverAgg.finalValue(slots, aggTypes, j, acc)

  /** Input type → primitive read code (0 byte, 1 short, 2 int/date,
    * 3 long/ts/ntz, 4 float, 5 double; -1 = not dense-readable).
    */
  private def denseTypeCode(dt: DataType): Int = dt match {
    case ByteType => 0
    case ShortType => 1
    case IntegerType | DateType => 2
    case LongType | TimestampType | TimestampNTZType => 3
    case FloatType => 4
    case DoubleType => 5
    case _ => -1
  }

  /** Dense direct-index eligibility: ONE calendar-bucket key, every
    * aggregate input a direct primitive column, and only flat-array
    * slots (no distinct sets, no string min/max). The bucket domain is
    * the fixed 1900-2100 calendar window — out-of-window rows take a
    * per-row overflow map inside the arm, so eligibility never depends
    * on (possibly lying) statistics.
    */
  private def denseCalendarSpec: Option[(DriverAgg.CalendarKeyPart, Array[Int])] = {
    // a folded selection routes through the generic batch partial (whose
    // loop evaluates it); the dense arm stays filter-free
    if (!DriverAgg.denseCalendarEnabled || nS != 0 || nO != 0 ||
      selection.nonEmpty) return None
    DriverAgg.colKeyParts(groupExprs, child.output) match {
      case Some(Seq(c: DriverAgg.CalendarKeyPart)) =>
        val slotsOk = slots.forall {
          case DriverAgg.CountSlot(_, checked) => checked.size <= 1
          case _: DriverAgg.SumLSlot | _: DriverAgg.SumDSlot |
               _: DriverAgg.AvgSlot | _: DriverAgg.MinMaxLSlot |
               _: DriverAgg.MinMaxDSlot => true
          case _ => false
        }
        val inputsOk = aggInputs.forall {
          case a: AttributeReference =>
            denseTypeCode(a.dataType) >= 0 &&
              child.output.exists(_.exprId == a.exprId)
          case _ => false
        }
        if (slotsOk && inputsOk)
          Some((c, aggInputs.map(e => child.output.indexWhere(
            _.exprId == e.asInstanceOf[AttributeReference].exprId)).toArray))
        else None
      case _ => None
    }
  }

  /** Dense direct-index partial — the perfect-hash aggregate proper.
    * The generic batch loop below pays per-row ADT matches (key-part
    * extract, per-slot dispatch, per-input type dispatch) plus an
    * open-addressing probe; for a single calendar key all of that
    * resolves at plan time: the key is one LUT read off the micros
    * vector, group state is flat primitive arrays indexed by bucket
    * ordinal, and slot updates run through a compiled int-switch.
    * Out-of-window days (outside 1900-2100) fall into a per-row
    * overflow hash map — slower rows, never a wrong answer. Emits the
    * same (key-row bytes, Acc) payload, so the driver merge is shared.
    */
  private def runDenseCalendarPartials(
      key: DriverAgg.CalendarKeyPart,
      dirOrds: Array[Int]): Array[Array[(Array[Byte], Acc)]] = {
    import graft.functions.DateTruncKernel
    val kCode = DateTruncKernel.kernelCode(key.kernel)
    val nBuck = DateTruncKernel.denseBuckets(key.kernel) + 1 // 0 = NULL key
    val asDate = key.asDate
    val keyOrd = key.ord
    val keyTypes = groupExprs.map(_.dataType).toArray
    val (accL, accD, accF) = (nL, nD, nF)
    val ansiMode = ansi
    val theSlots = slots.toArray
    val iExprs = aggInputs
    val childOut = child.output
    val cap = maxGroups
    // opcode compile: 0 count(*), 1 count(col), 2 sumL, 3 sumD, 4 avg,
    // 5 minL, 6 maxL, 7 minD, 8 maxD — a1/a2 are acc offsets, vin the
    // input-vector index, tc the primitive read code
    val nOps = theSlots.length
    val op = new Array[Int](nOps); val a1 = new Array[Int](nOps)
    val a2 = new Array[Int](nOps); val vin = new Array[Int](nOps)
    val tc = new Array[Int](nOps)
    var j0 = 0
    while (j0 < nOps) {
      theSlots(j0) match {
        case DriverAgg.CountSlot(li, Seq()) => op(j0) = 0; a1(j0) = li
        case DriverAgg.CountSlot(li, Seq(in)) =>
          op(j0) = 1; a1(j0) = li; vin(j0) = in
        case DriverAgg.SumLSlot(li, fi, in) =>
          op(j0) = 2; a1(j0) = li; a2(j0) = fi; vin(j0) = in
          tc(j0) = denseTypeCode(iExprs(in).dataType)
        case DriverAgg.SumDSlot(di, fi, in) =>
          op(j0) = 3; a1(j0) = di; a2(j0) = fi; vin(j0) = in
          tc(j0) = denseTypeCode(iExprs(in).dataType)
        case DriverAgg.AvgSlot(di, li, in) =>
          op(j0) = 4; a1(j0) = di; a2(j0) = li; vin(j0) = in
          tc(j0) = denseTypeCode(iExprs(in).dataType)
        case DriverAgg.MinMaxLSlot(li, fi, in, isMin) =>
          op(j0) = if (isMin) 5 else 6; a1(j0) = li; a2(j0) = fi; vin(j0) = in
          tc(j0) = denseTypeCode(iExprs(in).dataType)
        case DriverAgg.MinMaxDSlot(di, fi, in, isMin) =>
          op(j0) = if (isMin) 7 else 8; a1(j0) = di; a2(j0) = fi; vin(j0) = in
          tc(j0) = denseTypeCode(iExprs(in).dataType)
        case other =>
          throw new IllegalStateException(s"dense arm on unsupported slot $other")
      }
      j0 += 1
    }
    sparkContext.runJob(child.executeColumnar(),
        (batches: Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]) => {
      val addL = DriverAgg.longAdd(ansiMode)
      val longsA = new Array[Long](nBuck * accL)
      val doublesA = new Array[Double](nBuck * accD)
      val flagsA = new Array[Boolean](nBuck * accF)
      val touched = new Array[Boolean](nBuck)
      // in-window dense buckets count toward maxGroups exactly like the
      // generic partial's per-partition group cap — without this, a
      // caller-supplied cap below the bucket count would silently pass
      // here while the generic arm throws GroupCardinalityExceeded
      var touchedCount = 0
      // out-of-window rows (truncated key value -> Acc), built lazily —
      // the generic row-projection updaters are correct and rare here
      var ovf: java.util.HashMap[java.lang.Long, Acc] = null
      lazy val valProj = UnsafeProjection.create(iExprs, childOut)
      lazy val ups = DriverAgg.updaters(theSlots.toSeq, iExprs, ansiMode)
      def readL(v: org.apache.spark.sql.vectorized.ColumnVector, r: Int, t: Int): Long =
        t match {
          case 0 => v.getByte(r).toLong
          case 1 => v.getShort(r).toLong
          case 2 => v.getInt(r).toLong
          case _ => v.getLong(r)
        }
      def readD(v: org.apache.spark.sql.vectorized.ColumnVector, r: Int, t: Int): Double =
        t match {
          case 0 => v.getByte(r).toDouble
          case 1 => v.getShort(r).toDouble
          case 2 => v.getInt(r).toDouble
          case 3 => v.getLong(r).toDouble
          case 4 => v.getFloat(r).toDouble
          case _ => v.getDouble(r)
        }
      batches.foreach { batch =>
        val v0 = batch.column(keyOrd)
        val inVecs = dirOrds.map(batch.column)
        val n = batch.numRows()
        var r = 0
        while (r < n) {
          var b = 0
          var inWindow = true
          if (!v0.isNullAt(r)) {
            val us = v0.getLong(r)
            val o = DateTruncKernel.denseOrd(kCode,
              Math.floorDiv(us, 86400000000L))
            if (o >= 0) b = o + 1
            else {
              inWindow = false
              if (ovf == null) ovf = new java.util.HashMap()
              val kv = java.lang.Long.valueOf(key.eval(us))
              var acc = ovf.get(kv)
              if (acc == null) {
                if (touchedCount + ovf.size() >= cap) throw new GroupCardinalityExceeded(
                  s"driver agg: dense overflow exceeded maxGroups=$cap")
                acc = new Acc(new Array[Long](accL), new Array[Double](accD),
                  new Array[Boolean](accF), null, null)
                ovf.put(kv, acc)
              }
              val vrow = valProj(batch.getRow(r))
              var ji = 0
              while (ji < ups.length) { ups(ji)(vrow, acc); ji += 1 }
            }
          }
          if (inWindow) {
            if (!touched(b)) {
              val ovfSize = if (ovf == null) 0 else ovf.size()
              if (touchedCount + ovfSize >= cap) throw new GroupCardinalityExceeded(
                s"driver agg: dense buckets exceeded maxGroups=$cap")
              touched(b) = true
              touchedCount += 1
            }
            val lb = b * accL; val db = b * accD; val fb = b * accF
            var j = 0
            while (j < nOps) {
              (op(j): @annotation.switch) match {
                case 0 => longsA(lb + a1(j)) += 1
                case 1 => if (!inVecs(vin(j)).isNullAt(r)) longsA(lb + a1(j)) += 1
                case 2 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    val x = readL(v, r, tc(j))
                    longsA(lb + a1(j)) =
                      if (flagsA(fb + a2(j))) addL(longsA(lb + a1(j)), x) else x
                    flagsA(fb + a2(j)) = true
                  }
                case 3 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    doublesA(db + a1(j)) += readD(v, r, tc(j))
                    flagsA(fb + a2(j)) = true
                  }
                case 4 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    doublesA(db + a1(j)) += readD(v, r, tc(j))
                    longsA(lb + a2(j)) += 1
                  }
                case 5 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    val x = readL(v, r, tc(j))
                    if (!flagsA(fb + a2(j)) || x < longsA(lb + a1(j)))
                      longsA(lb + a1(j)) = x
                    flagsA(fb + a2(j)) = true
                  }
                case 6 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    val x = readL(v, r, tc(j))
                    if (!flagsA(fb + a2(j)) || x > longsA(lb + a1(j)))
                      longsA(lb + a1(j)) = x
                    flagsA(fb + a2(j)) = true
                  }
                case 7 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    val x = readD(v, r, tc(j))
                    if (!flagsA(fb + a2(j)) ||
                        java.lang.Double.compare(x, doublesA(db + a1(j))) < 0)
                      doublesA(db + a1(j)) = x
                    flagsA(fb + a2(j)) = true
                  }
                case 8 =>
                  val v = inVecs(vin(j))
                  if (!v.isNullAt(r)) {
                    val x = readD(v, r, tc(j))
                    if (!flagsA(fb + a2(j)) ||
                        java.lang.Double.compare(x, doublesA(db + a1(j))) > 0)
                      doublesA(db + a1(j)) = x
                    flagsA(fb + a2(j)) = true
                  }
              }
              j += 1
            }
          }
          r += 1
        }
      }
      // same payload as the hashed path: exact-layout key rows + state
      val keyProj = UnsafeProjection.create(keyTypes)
      val krow = new GenericInternalRow(1)
      val out = new ArrayBuffer[(Array[Byte], Acc)]()
      var b = 0
      while (b < nBuck) {
        if (touched(b)) {
          if (b == 0) krow.update(0, null)
          else {
            val sd = DateTruncKernel.denseStartDay(kCode, b - 1)
            krow.update(0,
              if (asDate) sd.toInt else java.lang.Long.valueOf(sd * 86400000000L))
          }
          val acc = new Acc(
            java.util.Arrays.copyOfRange(longsA, b * accL, b * accL + accL),
            java.util.Arrays.copyOfRange(doublesA, b * accD, b * accD + accD),
            java.util.Arrays.copyOfRange(flagsA, b * accF, b * accF + accF),
            null, null)
          out += ((keyProj(krow).copy().getBytes, acc))
        }
        b += 1
      }
      if (ovf != null) {
        val it = ovf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          krow.update(0,
            if (asDate) e.getKey.longValue().toInt else e.getKey)
          out += ((keyProj(krow).copy().getBytes, e.getValue))
        }
      }
      out.toArray
    })
  }

  /** Batch-direct partial: specialized key extraction off column vectors
    * (long reads, hour-bucket arithmetic, string interning to task-local
    * ids) into an open-addressing composite-long table; aggregate inputs
    * evaluate through the ordinary value projection over the batch's row
    * VIEW (no column-to-row materialization). Emits the same
    * (key-row bytes, Acc) payload as the row path, so the driver merge
    * is shared. Measured ~250 → ~70 ns/row on the sf1 tumbling partial
    * (PERF.md r7).
    */
  private def runColumnarPartials(): Array[Array[(Array[Byte], Acc)]] = {
    val partsSpec = DriverAgg.colKeyParts(groupExprs, child.output).get.toArray
    val iExprs = aggInputs
    val theSlots = slots
    val childOut = child.output
    val cap = maxGroups
    val (accL, accD, accF, accS, accO) = (nL, nD, nF, nS, nO)
    val ansiMode = ansi
    val keyTypes = groupExprs.map(_.dataType).toArray
    val selPreds: Array[Expression] =
      if (selection.nonEmpty) selection.toArray else null
    val dictKeys = DriverAgg.dictKeysEnabled
    // per-input access plans: direct column, compiled double tree, or
    // null (projection row path). The vector arm engages only when every
    // input has a plan AND every slot's read kind is satisfiable: long/
    // string/boxed-exact reads need a direct column; double reads accept
    // a compiled tree.
    val inPlans: Array[DriverAgg.InPlan] = iExprs.map {
      case a: AttributeReference if childOut.exists(_.exprId == a.exprId) =>
        DriverAgg.DirectIn(childOut.indexWhere(_.exprId == a.exprId))
      case e if DriverAgg.exprVecEnabled =>
        DriverAgg.compileDouble(e, childOut).orNull
      case _ => null
    }.toArray
    def direct(in: Int): Boolean = inPlans(in).isInstanceOf[DriverAgg.DirectIn]
    val slotReadsOk = theSlots.forall {
      case DriverAgg.SumLSlot(_, _, in) => direct(in)
      case DriverAgg.MinMaxLSlot(_, _, in, _) => direct(in)
      case DriverAgg.MinMaxSSlot(_, in, _) => direct(in)
      case DriverAgg.CountDistinctSlot(_, in) => direct(in)
      case _ => true
    }
    val vectorArm = inPlans.forall(_ != null) && slotReadsOk
    // opcode-compile the slot program (the dense arm's int-switch,
    // generalized to hash-grouped state): the per-row cost drops from a
    // Seq index + ADT match + dataType match PER SLOT to one int switch.
    // Slots outside the opcode set (string min/max, distinct sets,
    // multi-checked count) keep the generic dispatch loop.
    // op: 0 count(*), 1 count(x), 2 sumL, 3 sumD, 4 avg, 5 minL, 6 maxL,
    // 7 minD, 8 maxD; -1 marks a non-opcode slot set
    val slotsArr = theSlots.toArray
    val nOps = slotsArr.length
    val opA = new Array[Int](nOps); val a1A = new Array[Int](nOps)
    val a2A = new Array[Int](nOps); val vinA = new Array[Int](nOps)
    var opcodeOk = vectorArm
    if (opcodeOk) {
      var j = 0
      while (j < nOps && opcodeOk) {
        slotsArr(j) match {
          case DriverAgg.CountSlot(li, Seq()) => opA(j) = 0; a1A(j) = li
          case DriverAgg.CountSlot(li, Seq(in)) => opA(j) = 1; a1A(j) = li; vinA(j) = in
          case DriverAgg.SumLSlot(li, fi, in) =>
            opA(j) = 2; a1A(j) = li; a2A(j) = fi; vinA(j) = in
          case DriverAgg.SumDSlot(di, fi, in) =>
            opA(j) = 3; a1A(j) = di; a2A(j) = fi; vinA(j) = in
          case DriverAgg.AvgSlot(di, li, in) =>
            opA(j) = 4; a1A(j) = di; a2A(j) = li; vinA(j) = in
          case DriverAgg.MinMaxLSlot(li, fi, in, isMin) =>
            opA(j) = if (isMin) 5 else 6; a1A(j) = li; a2A(j) = fi; vinA(j) = in
          case DriverAgg.MinMaxDSlot(di, fi, in, isMin) =>
            opA(j) = if (isMin) 7 else 8; a1A(j) = di; a2A(j) = fi; vinA(j) = in
          case _ => opcodeOk = false
        }
        j += 1
      }
    }
    // per-input static read metadata for the opcode loop
    val inProgs: Array[DriverAgg.DProg] = inPlans.map {
      case DriverAgg.CompiledIn(p, _) => p
      case _ => null
    }
    val inNullOrds: Array[Array[Int]] = inPlans.map {
      case DriverAgg.CompiledIn(_, ords) => ords
      case _ => null
    }
    val inTc: Array[Int] = iExprs.map(e => e.dataType match {
      case ByteType => 0
      case ShortType => 1
      case IntegerType | DateType => 2
      case LongType | TimestampType | TimestampNTZType => 3
      case FloatType => 4
      case DoubleType => 5
      case _ => -1
    }).toArray
    sparkContext.runJob(child.executeColumnar(),
        (batches: Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]) => {
      import graft.functions.DistinctWithHll.scramble
      val valProj = UnsafeProjection.create(iExprs, childOut)
      val ups = DriverAgg.updaters(theSlots, iExprs, ansiMode)
      def mkAcc() = new Acc(new Array[Long](accL), new Array[Double](accD),
        new Array[Boolean](accF), DriverAgg.newSets(accS), DriverAgg.newObjs(accO))
      val nParts = partsSpec.length
      val interns = new Array[java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, Integer]](nParts)
      val internVals = new Array[ArrayBuffer[
        org.apache.spark.unsafe.types.UTF8String]](nParts)
      var c0 = 0
      while (c0 < nParts) {
        if (partsSpec(c0).isInstanceOf[DriverAgg.StringKeyPart]) {
          interns(c0) = new java.util.HashMap()
          internVals(c0) = new ArrayBuffer()
        }
        c0 += 1
      }
      // (k1, k2, nullBits) -> dense group index, open addressing
      var mask = (1 << 10) - 1
      var table = Array.fill(mask + 1)(-1)
      var gk1 = new Array[Long](512)
      var gk2 = new Array[Long](512)
      var gnull = new Array[Byte](512)
      val accs = new ArrayBuffer[Acc]()
      def hashOf(k1: Long, k2: Long, nb: Int): Long =
        scramble(k1 ^ (k2 * 0x9E3779B97F4A7C15L) ^ nb.toLong)
      def growTable(): Unit = {
        mask = mask * 2 + 1
        table = Array.fill(mask + 1)(-1)
        var g = 0
        while (g < accs.length) {
          var p = (hashOf(gk1(g), gk2(g), gnull(g)) & mask).toInt
          while (table(p) != -1) p = (p + 1) & mask
          table(p) = g
          g += 1
        }
      }
      def newGroup(k1: Long, nb: Int, k2: Long = 0L): Int = {
        if (accs.length >= cap) throw new GroupCardinalityExceeded(
          s"driver agg: group count exceeded maxGroups=$cap in one partition — " +
            "key is not low-cardinality; falling back to the shuffled aggregate")
        val idx = accs.length
        if (idx >= gk1.length) {
          gk1 = java.util.Arrays.copyOf(gk1, gk1.length * 2)
          gk2 = java.util.Arrays.copyOf(gk2, gk2.length * 2)
          gnull = java.util.Arrays.copyOf(gnull, gnull.length * 2)
        }
        gk1(idx) = k1; gk2(idx) = k2; gnull(idx) = nb.toByte
        accs += mkAcc()
        idx
      }
      // dense single-string-key arm state (see the directArm loop below)
      val directArm = DriverAgg.directStringArm &&
        nParts == 1 && partsSpec(0).isInstanceOf[DriverAgg.StringKeyPart]
      var directIdx: Array[Int] = if (directArm) Array.fill(1 << 12)(-1) else null
      var nullGroup = -1
      // ungrouped arm state: the partition's single Acc
      var acc0: Acc = null
      def extract(spec: DriverAgg.ColKeyPart, ci: Int,
          vec: org.apache.spark.sql.vectorized.ColumnVector, r: Int): Long =
        spec match {
          case DriverAgg.LongKeyPart(_, true, _) => vec.getInt(r).toLong
          case DriverAgg.LongKeyPart(_, false, _) => vec.getLong(r)
          case DriverAgg.TruncKeyPart(_, u) =>
            val m = vec.getLong(r); m - Math.floorMod(m, u)
          case c: DriverAgg.CalendarKeyPart => c.eval(vec.getLong(r))
          case _: DriverAgg.StringKeyPart =>
            val s = vec.getUTF8String(r)
            val boxed = interns(ci).get(s)
            if (boxed != null) boxed.longValue()
            else {
              val copy = s.clone()
              val id = internVals(ci).length
              interns(ci).put(copy, Integer.valueOf(id))
              internVals(ci) += copy
              id.toLong
            }
        }
      // selection: the folded filter's conjuncts, classified per batch
      // into DictSelection's dict/prim/row tiers
      val sel = if (selPreds == null) null else new DictSelection(selPreds, childOut)
      // dict-id fast keys: per-batch dictionary ids remapped to task
      // intern ids once per batch (≤ entries probes), rows key by an
      // int-array read instead of a per-row UTF8String hash probe
      val dictIdArr = new Array[Array[Int]](nParts)
      val dictRemap = new Array[Array[Int]](nParts)
      def intern(ci: Int,
          s: org.apache.spark.unsafe.types.UTF8String): Int = {
        val boxed = interns(ci).get(s)
        if (boxed != null) boxed.intValue()
        else {
          val copy = s.clone()
          val id = internVals(ci).length
          interns(ci).put(copy, Integer.valueOf(id))
          internVals(ci) += copy
          id
        }
      }
      val addL = DriverAgg.longAdd(ansiMode)
      batches.foreach { batch =>
        val v0 = if (nParts == 0) null else batch.column(partsSpec(0).ord)
        val v1 = if (nParts > 1) batch.column(partsSpec(1).ord) else null
        var c1 = 0
        while (c1 < nParts) {
          dictIdArr(c1) = null
          if (dictKeys && partsSpec(c1).isInstanceOf[DriverAgg.StringKeyPart]) {
            (if (c1 == 0) v0 else v1) match {
              case g: GraftColumnVector => g.store match {
                case d: GraftCacheSerializer.DictStore =>
                  val remap = new Array[Int](d.entries)
                  var e = 0
                  while (e < d.entries) {
                    remap(e) = intern(c1, org.apache.spark.unsafe.types.UTF8String
                      .fromBytes(d.dict, d.dictOffsets(e),
                        d.dictOffsets(e + 1) - d.dictOffsets(e)))
                    e += 1
                  }
                  dictIdArr(c1) = d.ids
                  dictRemap(c1) = remap
                case _ =>
              }
              case _ =>
            }
          }
          c1 += 1
        }
        if (sel != null) sel.reset(batch)
        val inVecs: Array[org.apache.spark.sql.vectorized.ColumnVector] =
          if (!vectorArm) null
          else inPlans.map {
            case DriverAgg.DirectIn(o) => batch.column(o)
            case _ => null // compiled inputs read through allCols
          }
        val allCols: Array[org.apache.spark.sql.vectorized.ColumnVector] =
          if (vectorArm && inPlans.exists(_.isInstanceOf[DriverAgg.CompiledIn]))
            Array.tabulate(batch.numCols())(batch.column)
          else null
        def inNull(in: Int, r: Int): Boolean =
          if (inProgs(in) == null) inVecs(in).isNullAt(r)
          else {
            val ords = inNullOrds(in)
            var i = 0
            var nn = false
            while (i < ords.length && !nn) {
              if (allCols(ords(i)).isNullAt(r)) nn = true
              i += 1
            }
            nn
          }
        def readVL(in: Int, r: Int): Long = (inTc(in): @annotation.switch) match {
          case 0 => inVecs(in).getByte(r).toLong
          case 1 => inVecs(in).getShort(r).toLong
          case 2 => inVecs(in).getInt(r).toLong
          case _ => inVecs(in).getLong(r)
        }
        def readVD(in: Int, r: Int): Double =
          if (inProgs(in) != null) inProgs(in).eval(allCols, r)
          else (inTc(in): @annotation.switch) match {
            case 0 => inVecs(in).getByte(r).toDouble
            case 1 => inVecs(in).getShort(r).toDouble
            case 2 => inVecs(in).getInt(r).toDouble
            case 3 => inVecs(in).getLong(r).toDouble
            case 4 => inVecs(in).getFloat(r).toDouble
            case _ => inVecs(in).getDouble(r)
          }
        // int-switch slot program — no per-row ADT or dataType dispatch
        def opUpdate(r: Int, acc: Acc): Unit = {
          var j = 0
          while (j < nOps) {
            val in = vinA(j)
            (opA(j): @annotation.switch) match {
              case 0 => acc.longs(a1A(j)) += 1
              case 1 => if (!inNull(in, r)) acc.longs(a1A(j)) += 1
              case 2 => if (!inVecs(in).isNullAt(r)) {
                val x = readVL(in, r)
                acc.longs(a1A(j)) =
                  if (acc.flags(a2A(j))) addL(acc.longs(a1A(j)), x) else x
                acc.flags(a2A(j)) = true
              }
              case 3 => if (!inNull(in, r)) {
                acc.doubles(a1A(j)) += readVD(in, r); acc.flags(a2A(j)) = true
              }
              case 4 => if (!inNull(in, r)) {
                acc.doubles(a1A(j)) += readVD(in, r); acc.longs(a2A(j)) += 1
              }
              case 5 => if (!inVecs(in).isNullAt(r)) {
                val x = readVL(in, r)
                if (!acc.flags(a2A(j)) || x < acc.longs(a1A(j))) acc.longs(a1A(j)) = x
                acc.flags(a2A(j)) = true
              }
              case 6 => if (!inVecs(in).isNullAt(r)) {
                val x = readVL(in, r)
                if (!acc.flags(a2A(j)) || x > acc.longs(a1A(j))) acc.longs(a1A(j)) = x
                acc.flags(a2A(j)) = true
              }
              case 7 => if (!inNull(in, r)) {
                val x = readVD(in, r)
                if (!acc.flags(a2A(j)) ||
                    java.lang.Double.compare(x, acc.doubles(a1A(j))) < 0)
                  acc.doubles(a1A(j)) = x
                acc.flags(a2A(j)) = true
              }
              case 8 => if (!inNull(in, r)) {
                val x = readVD(in, r)
                if (!acc.flags(a2A(j)) ||
                    java.lang.Double.compare(x, acc.doubles(a1A(j))) > 0)
                  acc.doubles(a1A(j)) = x
                acc.flags(a2A(j)) = true
              }
            }
            j += 1
          }
        }
        def vecUpdate(r: Int, acc: Acc): Unit = {
          var j = 0
          while (j < nOps) {
            slotsArr(j) match {
              case CountSlot(li, checked) =>
                var ok = true
                checked.foreach(in => if (inNull(in, r)) ok = false)
                if (ok) acc.longs(li) += 1
              case SumLSlot(li, fi, in) => if (!inVecs(in).isNullAt(r)) {
                val x = readVL(in, r)
                acc.longs(li) = if (acc.flags(fi)) addL(acc.longs(li), x) else x
                acc.flags(fi) = true
              }
              case SumDSlot(di, fi, in) => if (!inNull(in, r)) {
                acc.doubles(di) += readVD(in, r); acc.flags(fi) = true
              }
              case AvgSlot(di, li, in) => if (!inNull(in, r)) {
                acc.doubles(di) += readVD(in, r); acc.longs(li) += 1
              }
              case MinMaxLSlot(li, fi, in, isMin) => if (!inVecs(in).isNullAt(r)) {
                val x = readVL(in, r)
                if (!acc.flags(fi) ||
                    (if (isMin) x < acc.longs(li) else x > acc.longs(li)))
                  acc.longs(li) = x
                acc.flags(fi) = true
              }
              case MinMaxDSlot(di, fi, in, isMin) => if (!inNull(in, r)) {
                val x = readVD(in, r)
                val cc = java.lang.Double.compare(x, acc.doubles(di))
                if (!acc.flags(fi) || (if (isMin) cc < 0 else cc > 0))
                  acc.doubles(di) = x
                acc.flags(fi) = true
              }
              case MinMaxSSlot(oi, in, isMin) => if (!inVecs(in).isNullAt(r)) {
                val x = inVecs(in).getUTF8String(r)
                val cur = acc.objs(oi)
                  .asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
                if (cur == null ||
                    (if (isMin) x.compareTo(cur) < 0 else x.compareTo(cur) > 0))
                  acc.objs(oi) = x.clone()
              }
              case CountDistinctSlot(si, in) => if (!inVecs(in).isNullAt(r)) {
                val boxed: AnyRef = iExprs(in).dataType match {
                  case StringType => inVecs(in).getUTF8String(r).clone()
                  case FloatType =>
                    java.lang.Double.valueOf(inVecs(in).getFloat(r).toDouble)
                  case DoubleType =>
                    java.lang.Double.valueOf(inVecs(in).getDouble(r))
                  case BooleanType =>
                    java.lang.Boolean.valueOf(inVecs(in).getBoolean(r))
                  case _ => java.lang.Long.valueOf(readVL(in, r))
                }
                val set = acc.sets(si)
                if (set.add(boxed) && set.size() > DriverAgg.maxDistinctCap)
                  throw new GroupCardinalityExceeded(
                    "driver agg: distinct set exceeded cap in one group — " +
                      "child is not low-cardinality; falling back")
              }
            }
            j += 1
          }
        }
        val n = batch.numRows()
        var r = 0
        if (nParts == 0) {
          // UNGROUPED: one Acc per partition and no key work at all —
          // the fused scan→ungrouped-aggregate (reference:
          // src/execution/operator/aggregate/
          // physical_ungrouped_aggregate.cpp). With direct vector
          // inputs and no selection the update runs COLUMN-MAJOR: one
          // sequential pass per slot over its vector (null-free vectors
          // skip the per-row check entirely); otherwise the row loop
          // keeps the opcode int-switch with the selection in front.
          if (acc0 == null) acc0 = accs(newGroup(0L, 0))
          val colMajor = opcodeOk && sel == null && inVecs != null &&
            inProgs.forall(_ == null)
          if (colMajor) {
            val acc = acc0
            var j = 0
            while (j < nOps) {
              val in = vinA(j)
              val vec = if (opA(j) == 0) null else inVecs(in)
              val noNulls = vec == null || !vec.hasNull
              (opA(j): @annotation.switch) match {
                case 0 => acc.longs(a1A(j)) += n
                case 1 =>
                  if (noNulls) acc.longs(a1A(j)) += n
                  else {
                    var c = 0L; var i = 0
                    while (i < n) { if (!vec.isNullAt(i)) c += 1; i += 1 }
                    acc.longs(a1A(j)) += c
                  }
                case 2 =>
                  var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) {
                      val x = readVL(in, i)
                      acc.longs(a1A(j)) =
                        if (acc.flags(a2A(j))) addL(acc.longs(a1A(j)), x) else x
                      acc.flags(a2A(j)) = true
                    }
                    i += 1
                  }
                // sum/avg seed the local from the acc so the FP addition
                // SEQUENCE matches the per-row += of the row arms exactly
                // (a batch-local subtotal would change the rounding tree)
                case 3 =>
                  var s = acc.doubles(a1A(j)); var any = false; var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) { s += readVD(in, i); any = true }
                    i += 1
                  }
                  acc.doubles(a1A(j)) = s
                  if (any) acc.flags(a2A(j)) = true
                case 4 =>
                  var s = acc.doubles(a1A(j)); var c = 0L; var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) { s += readVD(in, i); c += 1 }
                    i += 1
                  }
                  acc.doubles(a1A(j)) = s; acc.longs(a2A(j)) += c
                case 5 =>
                  var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) {
                      val x = readVL(in, i)
                      if (!acc.flags(a2A(j)) || x < acc.longs(a1A(j)))
                        acc.longs(a1A(j)) = x
                      acc.flags(a2A(j)) = true
                    }
                    i += 1
                  }
                case 6 =>
                  var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) {
                      val x = readVL(in, i)
                      if (!acc.flags(a2A(j)) || x > acc.longs(a1A(j)))
                        acc.longs(a1A(j)) = x
                      acc.flags(a2A(j)) = true
                    }
                    i += 1
                  }
                case 7 =>
                  var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) {
                      val x = readVD(in, i)
                      if (!acc.flags(a2A(j)) ||
                          java.lang.Double.compare(x, acc.doubles(a1A(j))) < 0)
                        acc.doubles(a1A(j)) = x
                      acc.flags(a2A(j)) = true
                    }
                    i += 1
                  }
                case 8 =>
                  var i = 0
                  while (i < n) {
                    if (noNulls || !vec.isNullAt(i)) {
                      val x = readVD(in, i)
                      if (!acc.flags(a2A(j)) ||
                          java.lang.Double.compare(x, acc.doubles(a1A(j))) > 0)
                        acc.doubles(a1A(j)) = x
                      acc.flags(a2A(j)) = true
                    }
                    i += 1
                  }
              }
              j += 1
            }
          } else {
            while (r < n) {
              if (sel == null || sel.passes(r)) {
                if (inVecs != null) {
                  if (opcodeOk) opUpdate(r, acc0) else vecUpdate(r, acc0)
                } else {
                  val v = valProj(batch.getRow(r))
                  var j = 0
                  while (j < ups.length) { ups(j)(v, acc0); j += 1 }
                }
              }
              r += 1
            }
          }
        } else if (directArm) {
          // dense single-string-key arm: the intern id IS dense (0..N in
          // first-intern order), so groups index DIRECTLY by it — no hash,
          // no probe loop, no key compare per row. This is the reference's
          // perfect-hash group-by over dictionary ids
          // (physical_perfect_hash_aggregate.cpp) applied to the interned
          // string domain.
          while (r < n) {
            if (sel != null && !sel.passes(r)) { r += 1 }
            else {
            var idx = -1
            if (v0.isNullAt(r)) {
              if (nullGroup == -1) nullGroup = newGroup(0L, 1)
              idx = nullGroup
            } else {
              val k1i = if (dictIdArr(0) != null) dictRemap(0)(dictIdArr(0)(r))
                else extract(partsSpec(0), 0, v0, r).toInt
              if (k1i >= directIdx.length) {
                val grown = new Array[Int](math.max(directIdx.length * 2, k1i + 1))
                java.util.Arrays.fill(grown, directIdx.length, grown.length, -1)
                System.arraycopy(directIdx, 0, grown, 0, directIdx.length)
                directIdx = grown
              }
              idx = directIdx(k1i)
              if (idx == -1) { idx = newGroup(k1i.toLong, 0); directIdx(k1i) = idx }
            }
            val acc = accs(idx)
            if (inVecs != null) {
              if (opcodeOk) opUpdate(r, acc) else vecUpdate(r, acc)
            } else {
              val v = valProj(batch.getRow(r))
              var j = 0
              while (j < ups.length) { ups(j)(v, acc); j += 1 }
            }
            r += 1
            }
          }
        } else {
        while (r < n) {
          if (sel != null && !sel.passes(r)) { r += 1 }
          else {
          var nb = 0
          var k1 = 0L
          var k2 = 0L
          if (v0.isNullAt(r)) nb |= 1
          else k1 = if (dictIdArr(0) != null) dictRemap(0)(dictIdArr(0)(r)).toLong
            else extract(partsSpec(0), 0, v0, r)
          if (v1 != null) {
            if (v1.isNullAt(r)) nb |= 2
            else k2 = if (dictIdArr(1) != null) dictRemap(1)(dictIdArr(1)(r)).toLong
              else extract(partsSpec(1), 1, v1, r)
          }
          var p = (hashOf(k1, k2, nb) & mask).toInt
          var idx = table(p)
          while (idx != -1 &&
              !(gk1(idx) == k1 && gk2(idx) == k2 && gnull(idx) == nb.toByte)) {
            p = (p + 1) & mask
            idx = table(p)
          }
          if (idx == -1) {
            idx = newGroup(k1, nb, k2)
            table(p) = idx
            if (accs.length * 2 > mask) growTable()
          }
          val acc = accs(idx)
          if (inVecs != null) {
            if (opcodeOk) opUpdate(r, acc) else vecUpdate(r, acc)
          } else {
            val v = valProj(batch.getRow(r))
            var j = 0
            while (j < ups.length) { ups(j)(v, acc); j += 1 }
          }
          r += 1
          }
        }
        }
      }
      // same payload as the row path: exact-layout key rows + state
      val keyProj = UnsafeProjection.create(keyTypes)
      val krow = new GenericInternalRow(nParts)
      val out = new Array[(Array[Byte], Acc)](accs.length)
      var g = 0
      while (g < accs.length) {
        var ci = 0
        while (ci < nParts) {
          val isNull = ((gnull(g) >> ci) & 1) == 1
          val kv = if (ci == 0) gk1(g) else gk2(g)
          krow.update(ci,
            if (isNull) null
            else partsSpec(ci) match {
              case DriverAgg.LongKeyPart(_, _, IntegerType | DateType) => kv.toInt
              case DriverAgg.CalendarKeyPart(_, _, true) => kv.toInt
              case _: DriverAgg.StringKeyPart => internVals(ci)(kv.toInt)
              case _ => kv
            })
          ci += 1
        }
        out(g) = (keyProj(krow).copy().getBytes, accs(g))
        g += 1
      }
      out
    })
  }

  /** The single distributed job + driver finalize. */
  private def finalRows(): Array[InternalRow] = {
    val gExprs = groupExprs
    val iExprs = aggInputs
    val theSlots = slots
    val childOut = child.output
    val cap = maxGroups
    val (accL, accD, accF, accS, accO) = (nL, nD, nF, nS, nO)
    val ansiMode = ansi

    val parts: Array[Array[(Array[Byte], Acc)]] =
      if (columnarChild) denseCalendarSpec match {
        case Some((key, dirOrds)) => runDenseCalendarPartials(key, dirOrds)
        case None => runColumnarPartials()
      }
      else sparkContext.runJob(child.execute(), (rows: Iterator[InternalRow]) => {
        val keyProj = UnsafeProjection.create(gExprs, childOut)
        val valProj = UnsafeProjection.create(iExprs, childOut)
        val ups = DriverAgg.updaters(theSlots, iExprs, ansiMode)
        def mkAcc() = new Acc(new Array[Long](accL), new Array[Double](accD),
          new Array[Boolean](accF), DriverAgg.newSets(accS), DriverAgg.newObjs(accO))
        val m = new java.util.HashMap[UnsafeRow, Acc]()
        while (rows.hasNext) {
          val row = rows.next()
          val k = keyProj(row)
          var acc = m.get(k)
          if (acc == null) {
            if (m.size() >= cap) throw new GroupCardinalityExceeded(
              s"driver agg: group count exceeded maxGroups=$cap in one partition — " +
                "key is not low-cardinality; falling back to the shuffled aggregate")
            acc = mkAcc()
            m.put(k.copy(), acc)
          }
          val v = valProj(row)
          var j = 0
          while (j < ups.length) { ups(j)(v, acc); j += 1 }
        }
        val out = new Array[(Array[Byte], Acc)](m.size())
        var i = 0
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next(); out(i) = (e.getKey.getBytes, e.getValue); i += 1
        }
        out
      })

    val nKeys = groupExprs.length
    val merged = new java.util.LinkedHashMap[UnsafeRow, Acc]()
    parts.foreach(_.foreach { case (bytes, acc) =>
      val k = new UnsafeRow(nKeys)
      k.pointTo(bytes, bytes.length)
      val cur = merged.get(k)
      if (cur == null) {
        if (merged.size() >= maxGroups) throw new GroupCardinalityExceeded(
          s"driver agg: merged group count exceeded maxGroups=$maxGroups")
        merged.put(k, acc)
      } else mergeInto(cur, acc)
    })
    // a GLOBAL aggregate over empty input still yields one (empty) group
    if (nKeys == 0 && merged.isEmpty)
      merged.put(UnsafeProjection.create(Seq.empty[Expression], Seq.empty)(
        InternalRow.empty).copy(), newAcc())

    val proj = UnsafeProjection.create(finalExprs)
    val evalRow = new GenericInternalRow(nKeys + slots.length)
    val keyTypes = groupExprs.map(_.dataType)
    val rows = new ArrayBuffer[InternalRow](merged.size())
    merged.forEach { (k, acc) =>
      var i = 0
      while (i < nKeys) { evalRow.update(i, k.get(i, keyTypes(i))); i += 1 }
      slots.indices.foreach(j => evalRow.update(nKeys + j, finalVal(j, acc)))
      rows += proj(evalRow).copy()
    }
    val sorted =
      if (sortOrder.isEmpty) rows
      else rows.sorted(RowOrdering.create(sortOrder.map(so => so.copy(child =
        BindReferences.bindReference(so.child, output))), Seq.empty))
    (if (limit >= 0) sorted.take(limit) else sorted).toArray
  }

  /** True when the failure (possibly wrapped by Spark's task-failure
    * reporting) is the maxGroups valve tripping.
    */
  private def cardinalityExceeded(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[DriverAgg.GroupCardinalityExceeded] ||
          (c.getMessage != null && c.getMessage.contains("exceeded maxGroups")))
        return true
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  /** Valve fallback: the low-cardinality claim failed at runtime, so run
    * the retained shuffled plan — a fresh QueryExecution plans the
    * ordinary partial→exchange→final aggregate + sort + limit. Costs one
    * aborted scan; never a wrong answer.
    */
  private def rowsWithFallback(): Array[InternalRow] =
    try {
      // finalExprs may hold ExecSubqueryExpressions (the thq15-class
      // scalar-subquery routing): executeCollect bypasses executeQuery's
      // wrapper, so materialize this node's subqueries explicitly before
      // any driver-side eval — ScalarSubquery.eval throws otherwise
      // (idempotent on the doExecute path, which already prepared)
      prepare()
      waitForSubqueries()
      finalRows()
    } catch {
      case t: Throwable if cardinalityExceeded(t) =>
        logWarning(s"DriverAgg maxGroups=$maxGroups exceeded; re-running the " +
          "retained shuffled aggregate plan")
        DriverAgg.replanning.set(java.lang.Boolean.TRUE)
        try org.apache.spark.sql.graft.bridge.ofRows(session, fallback)
          .queryExecution.executedPlan.executeCollect()
        finally DriverAgg.replanning.set(java.lang.Boolean.FALSE)
    }

  override def executeCollect(): Array[InternalRow] = rowsWithFallback()

  override protected def doExecute(): RDD[InternalRow] =
    sparkContext.parallelize(rowsWithFallback().toIndexedSeq, 1)
}
