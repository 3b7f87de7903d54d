package graft.plans

import graft.functions.DistinctWithHll

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnVector
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Multi-key packed-payload shuffle aggregation — [[RadixAgg]] generalized
  * to composite grouping keys over the long-widenable domain PLUS strings
  * (the ClickBench `GROUP BY UserID, SearchPhrase[, minute]` class, and
  * the inner dedup exchange of `count(DISTINCT string)` rewrites).
  *
  * Why a second operator: in the groups≈rows regime Spark's
  * partial→exchange→final serializes ONE UnsafeRow per (partition, group)
  * through the shuffle — for a 10M-group string-keyed aggregate that is
  * 10M rows of per-row shuffle-writer work on both sides of the wire.
  * The reference radix-partitions flat hash-table payloads instead
  * (/root/reference/src/execution/operator/aggregate/
  * radix_partitioned_hashtable.cpp): partials move as packed per-bucket
  * blocks, not rows. Here the map stage aggregates into an
  * open-addressing map with FLAT key/state arrays (string keys interned
  * into a per-map byte pool), then emits each key-hash bucket as ONE
  * binary row [n × (hash, nullmask, long keys, string lens), string
  * bytes, fixed-width state blocks]; the exchange moves
  * O(buckets × partitions) rows; reducers own disjoint hash slices and
  * merge blobs into a dense map.
  *
  * Scale posture: map memory is bounded by [[RadixAgg.FlushCap]] groups
  * and [[PackedAgg.PoolFlushBytes]] of interned string bytes — past
  * either, the map flushes as blobs and resets (blob merge is
  * associative). Reducer state is total-groups/buckets; `buckets`
  * derives from the replaced exchange's partition count so
  * `spark.sql.shuffle.partitions` stays the scaling knob. NULL key
  * components are inline (a per-group null mask), so no side channel.
  *
  * Routed by [[graft.rules.PackedShuffleAgg]] for the Final/Partial and
  * PartialMerge/Partial (distinct-rewrite inner dedup) pairs whose keys
  * fit the domain and whose aggregates compile to [[DriverAgg.layout]]
  * slots; single int/long-keyed shapes keep the earlier [[RadixAgg]]
  * route.
  */
object PackedAgg {

  /** Interned-string pool bytes per map before a flush-and-reset. */
  val PoolFlushBytes: Int = 64 << 20

  /** Test hook: when > 0, overrides the group-count flush threshold
    * ([[RadixAgg.FlushCap]]) so specs can exercise the multi-blob merge
    * path without 2M-group inputs.
    */
  @volatile var flushCapOverride: Int = 0

  private[plans] def flushCap: Int =
    if (flushCapOverride > 0) flushCapOverride else RadixAgg.FlushCap

  def supportedKey(dt: DataType): Boolean =
    RadixAgg.supportedKey(dt) || dt == StringType

  /** Key kinds: widened-to-long vs interned string. */
  final val KindLong = 0
  final val KindStr = 1

  def kindOf(dt: DataType): Int = if (dt == StringType) KindStr else KindLong

  private final val HashSeed = -7046029254386353131L
  private final val NullMix = -7046029254386353131L ^ 0x9E3779B97F4A7C15L

  /** Deterministic 64-bit mix (xxhash-style avalanche step) — identical
    * across JVMs, so partial-side bucketing and final-side probing agree
    * and the cross-JVM determinism check holds.
    */
  def mix(h: Long, v: Long): Long = {
    val x = (h ^ v) * -7070675565921424023L // 0x9E3779B185EBCA87
    java.lang.Long.rotateLeft(x, 31) * -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  }

  def mixNull(h: Long): Long = mix(h, NullMix)

  def hashStr(s: UTF8String): Long =
    Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong

  def hashSeed: Long = HashSeed

  private[plans] def bucketOf(h: Long, buckets: Int): Int =
    math.floorMod(DistinctWithHll.scramble(h), buckets).toInt

  /** Open-addressing composite-key→slot map with flat key/state arrays
    * and an interned-string byte pool. Callers stage the probe key in
    * `stageLongs`/`stageStrs`/`stageMask` and pass the precomputed
    * 64-bit hash; insertion copies staged strings into the pool (probe
    * strings may reference transient batch/row buffers — the map owns
    * its bytes). Zero-initialized state is the fresh accumulator.
    */
  final class MultiKeyMap(nLK: Int, nSK: Int, nL: Int, nD: Int, nF: Int,
      initCap: Int = 1 << 12) {
    private var cap = Integer.highestOneBit(math.max(initCap, 16))
    private var mask = cap - 1
    private var hashes = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var lkeys = new Array[Long](cap * nLK)
    private var soffs = new Array[Int](cap * nSK)
    private var slens = new Array[Int](cap * nSK)
    private var nullMasks = new Array[Long](cap)
    var size = 0
    var longs = new Array[Long](cap * nL)
    var doubles = new Array[Double](cap * nD)
    var flags = new Array[Boolean](cap * nF)
    private var pool = new Array[Byte](1 << 16)
    var poolLen = 0

    // probe staging (filled by the caller before slotOf)
    val stageLongs = new Array[Long](math.max(nLK, 1))
    val stageStrs = new Array[UTF8String](math.max(nSK, 1))
    var stageMask: Long = 0L

    private def keyEq(i: Int): Boolean = {
      if (nullMasks(i) != stageMask) return false
      var j = 0
      while (j < nLK) {
        if (lkeys(i * nLK + j) != stageLongs(j)) return false
        j += 1
      }
      j = 0
      while (j < nSK) {
        // a null staged string ⇔ stored null — the mask equality above
        // already decided it; only non-null values need a byte compare
        val s = stageStrs(j)
        if (s != null) {
          val len = slens(i * nSK + j)
          if (s.numBytes != len) return false
          if (!ByteArrayMethods.arrayEquals(s.getBaseObject, s.getBaseOffset,
            pool, Platform.BYTE_ARRAY_OFFSET + soffs(i * nSK + j), len.toLong))
            return false
        }
        j += 1
      }
      true
    }

    /** Slot of the staged key under hash `h`, inserting if absent. */
    def slotOf(h: Long): Int = {
      var i = (h & mask).toInt
      while (used(i) && (hashes(i) != h || !keyEq(i))) i = (i + 1) & mask
      if (!used(i)) {
        if (size >= cap - (cap >> 2)) { grow(); return slotOf(h) }
        used(i) = true
        hashes(i) = h
        nullMasks(i) = stageMask
        var j = 0
        while (j < nLK) { lkeys(i * nLK + j) = stageLongs(j); j += 1 }
        j = 0
        while (j < nSK) {
          val s = stageStrs(j)
          if (s == null) { soffs(i * nSK + j) = 0; slens(i * nSK + j) = 0 }
          else {
            val len = s.numBytes
            if (poolLen + len > pool.length) {
              val grown = new Array[Byte](math.max(pool.length * 2, poolLen + len))
              System.arraycopy(pool, 0, grown, 0, poolLen)
              pool = grown
            }
            s.writeToMemory(pool, Platform.BYTE_ARRAY_OFFSET + poolLen)
            soffs(i * nSK + j) = poolLen
            slens(i * nSK + j) = len
            poolLen += len
          }
          j += 1
        }
        size += 1
      }
      i
    }

    private def grow(): Unit = {
      val oc = cap
      val oh = hashes; val ou = used; val olk = lkeys
      val oso = soffs; val osl = slens; val onm = nullMasks
      val oL = longs; val oD = doubles; val oF = flags
      cap <<= 1; mask = cap - 1
      hashes = new Array[Long](cap); used = new Array[Boolean](cap)
      lkeys = new Array[Long](cap * nLK)
      soffs = new Array[Int](cap * nSK); slens = new Array[Int](cap * nSK)
      nullMasks = new Array[Long](cap)
      longs = new Array[Long](cap * nL)
      doubles = new Array[Double](cap * nD)
      flags = new Array[Boolean](cap * nF)
      var i = 0
      while (i < oc) {
        if (ou(i)) {
          var j = (oh(i) & mask).toInt
          while (used(j)) j = (j + 1) & mask
          used(j) = true; hashes(j) = oh(i); nullMasks(j) = onm(i)
          System.arraycopy(olk, i * nLK, lkeys, j * nLK, nLK)
          System.arraycopy(oso, i * nSK, soffs, j * nSK, nSK)
          System.arraycopy(osl, i * nSK, slens, j * nSK, nSK)
          System.arraycopy(oL, i * nL, longs, j * nL, nL)
          System.arraycopy(oD, i * nD, doubles, j * nD, nD)
          System.arraycopy(oF, i * nF, flags, j * nF, nF)
        }
        i += 1
      }
    }

    def hashAt(i: Int): Long = hashes(i)
    def maskAt(i: Int): Long = nullMasks(i)
    def longKeyAt(i: Int, j: Int): Long = lkeys(i * nLK + j)
    def strLenAt(i: Int, j: Int): Int = slens(i * nSK + j)
    def strOffAt(i: Int, j: Int): Int = soffs(i * nSK + j)
    def poolArray: Array[Byte] = pool

    def slotIterator: Iterator[Int] = new Iterator[Int] {
      private var i = 0
      private def advance(): Unit = { while (i < cap && !used(i)) i += 1 }
      advance()
      def hasNext: Boolean = i < cap
      def next(): Int = { val r = i; i += 1; advance(); r }
    }

    def foreachSlot(f: Int => Unit): Unit = {
      var i = 0
      while (i < cap) { if (used(i)) f(i); i += 1 }
    }

    /** Keep allocated capacity (incl. the pool array) across flushes. */
    def reset(): Unit = {
      java.util.Arrays.fill(used, false)
      java.util.Arrays.fill(longs, 0L)
      java.util.Arrays.fill(doubles, 0.0)
      java.util.Arrays.fill(flags, false)
      size = 0
      poolLen = 0
    }
  }

  /** Primitive-signature updater SAMs (scala.FunctionN past Function2
    * boxes every int — see RadixAgg's RowUp/ColUp rationale).
    */
  private[plans] trait MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit }
  private[plans] trait MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit }
  private[plans] trait MBlockMerge {
    def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit
  }

  import DriverAgg._

  private[plans] def rowUpdaters(slots: Seq[Slot], iExprs: Seq[Expression],
      nL: Int, nD: Int, nF: Int, ansi: Boolean): Array[MRowUp] = {
    val addL = DriverAgg.longAdd(ansi)
    def readL(i: Int): InternalRow => Long = iExprs(i).dataType match {
      case ByteType => r => r.getByte(i).toLong
      case ShortType => r => r.getShort(i).toLong
      case IntegerType | DateType => r => r.getInt(i).toLong
      case _ => r => r.getLong(i)
    }
    def readD(i: Int): InternalRow => Double = iExprs(i).dataType match {
      case ByteType => r => r.getByte(i).toDouble
      case ShortType => r => r.getShort(i).toDouble
      case IntegerType | DateType => r => r.getInt(i).toDouble
      case LongType | TimestampType | TimestampNTZType => r => r.getLong(i).toDouble
      case FloatType => r => r.getFloat(i).toDouble
      case _ => r => r.getDouble(i)
    }
    slots.map[MRowUp] {
      case CountSlot(li, checked) =>
        val ia = checked.toArray
        new MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit = {
          var ok = true; var j = 0
          while (j < ia.length) { if (v.isNullAt(ia(j))) ok = false; j += 1 }
          if (ok) m.longs(s * nL + li) += 1
        } }
      case SumLSlot(li, fi, in) =>
        val rd = readL(in)
        new MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit =
          if (!v.isNullAt(in)) {
            val o = s * nL + li; val fo = s * nF + fi
            m.longs(o) = if (m.flags(fo)) addL(m.longs(o), rd(v)) else rd(v)
            m.flags(fo) = true
          } }
      case SumDSlot(di, fi, in) =>
        val rd = readD(in)
        new MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit =
          if (!v.isNullAt(in)) {
            m.doubles(s * nD + di) += rd(v); m.flags(s * nF + fi) = true
          } }
      case AvgSlot(di, li, in) =>
        val rd = readD(in)
        new MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit =
          if (!v.isNullAt(in)) {
            m.doubles(s * nD + di) += rd(v); m.longs(s * nL + li) += 1
          } }
      case MinMaxLSlot(li, fi, in, isMin) =>
        val rd = readL(in)
        new MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit =
          if (!v.isNullAt(in)) {
            val o = s * nL + li; val fo = s * nF + fi
            val x = rd(v)
            if (!m.flags(fo) || (if (isMin) x < m.longs(o) else x > m.longs(o)))
              m.longs(o) = x
            m.flags(fo) = true
          } }
      case MinMaxDSlot(di, fi, in, isMin) =>
        val rd = readD(in)
        new MRowUp { def apply(m: MultiKeyMap, v: InternalRow, s: Int): Unit =
          if (!v.isNullAt(in)) {
            val o = s * nD + di; val fo = s * nF + fi
            val x = rd(v)
            val c = java.lang.Double.compare(x, m.doubles(o))
            if (!m.flags(fo) || (if (isMin) c < 0 else c > 0)) m.doubles(o) = x
            m.flags(fo) = true
          } }
      case other => throw new UnsupportedOperationException(
        s"packed agg: unsupported slot $other")
    }.toArray
  }

  private[plans] def colUpdaters(slots: Seq[Slot], dts: Array[DataType],
      vecs: Array[ColumnVector], nL: Int, nD: Int, nF: Int, ansi: Boolean)
      : Array[MColUp] = {
    val addL = DriverAgg.longAdd(ansi)
    def readL(i: Int): Int => Long = dts(i) match {
      case ByteType => r => vecs(i).getByte(r).toLong
      case ShortType => r => vecs(i).getShort(r).toLong
      case IntegerType | DateType => r => vecs(i).getInt(r).toLong
      case _ => r => vecs(i).getLong(r)
    }
    def readD(i: Int): Int => Double = dts(i) match {
      case ByteType => r => vecs(i).getByte(r).toDouble
      case ShortType => r => vecs(i).getShort(r).toDouble
      case IntegerType | DateType => r => vecs(i).getInt(r).toDouble
      case LongType | TimestampType | TimestampNTZType => r => vecs(i).getLong(r).toDouble
      case FloatType => r => vecs(i).getFloat(r).toDouble
      case _ => r => vecs(i).getDouble(r)
    }
    slots.map[MColUp] {
      case CountSlot(li, checked) =>
        val ia = checked.toArray
        new MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit = {
          var ok = true; var j = 0
          while (j < ia.length) { if (vecs(ia(j)).isNullAt(r)) ok = false; j += 1 }
          if (ok) m.longs(s * nL + li) += 1
        } }
      case SumLSlot(li, fi, in) =>
        val rd = readL(in)
        new MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit =
          if (!vecs(in).isNullAt(r)) {
            val o = s * nL + li; val fo = s * nF + fi
            m.longs(o) = if (m.flags(fo)) addL(m.longs(o), rd(r)) else rd(r)
            m.flags(fo) = true
          } }
      case SumDSlot(di, fi, in) =>
        val rd = readD(in)
        new MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit =
          if (!vecs(in).isNullAt(r)) {
            m.doubles(s * nD + di) += rd(r); m.flags(s * nF + fi) = true
          } }
      case AvgSlot(di, li, in) =>
        val rd = readD(in)
        new MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit =
          if (!vecs(in).isNullAt(r)) {
            m.doubles(s * nD + di) += rd(r); m.longs(s * nL + li) += 1
          } }
      case MinMaxLSlot(li, fi, in, isMin) =>
        val rd = readL(in)
        new MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit =
          if (!vecs(in).isNullAt(r)) {
            val o = s * nL + li; val fo = s * nF + fi
            val x = rd(r)
            if (!m.flags(fo) || (if (isMin) x < m.longs(o) else x > m.longs(o)))
              m.longs(o) = x
            m.flags(fo) = true
          } }
      case MinMaxDSlot(di, fi, in, isMin) =>
        val rd = readD(in)
        new MColUp { def apply(m: MultiKeyMap, r: Int, s: Int): Unit =
          if (!vecs(in).isNullAt(r)) {
            val o = s * nD + di; val fo = s * nF + fi
            val x = rd(r)
            val c = java.lang.Double.compare(x, m.doubles(o))
            if (!m.flags(fo) || (if (isMin) c < 0 else c > 0)) m.doubles(o) = x
            m.flags(fo) = true
          } }
      case other => throw new UnsupportedOperationException(
        s"packed agg: unsupported slot $other")
    }.toArray
  }

  /** Compiled per-slot blob mergers (state block layout identical to
    * RadixAgg: longs[nL] ++ doubles[nD] ++ flags[nF], LE at `off`).
    */
  private[plans] def blockMergers(slots: Seq[Slot], nL: Int, nD: Int, nF: Int,
      ansi: Boolean): Array[MBlockMerge] = {
    val addL = DriverAgg.longAdd(ansi)
    val dBase = 8 * nL
    val fBase = dBase + 8 * nD
    slots.map[MBlockMerge] {
      case CountSlot(li, _) =>
        new MBlockMerge { def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit =
          m.longs(s * nL + li) += bb.getLong(off + 8 * li) }
      case SumLSlot(li, fi, _) =>
        new MBlockMerge { def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit =
          if (bb.get(off + fBase + fi) != 0) {
            val o = s * nL + li; val fo = s * nF + fi
            val x = bb.getLong(off + 8 * li)
            m.longs(o) = if (m.flags(fo)) addL(m.longs(o), x) else x
            m.flags(fo) = true
          } }
      case SumDSlot(di, fi, _) =>
        new MBlockMerge { def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit =
          if (bb.get(off + fBase + fi) != 0) {
            m.doubles(s * nD + di) += bb.getDouble(off + dBase + 8 * di)
            m.flags(s * nF + fi) = true
          } }
      case AvgSlot(di, li, _) =>
        new MBlockMerge { def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit = {
          m.doubles(s * nD + di) += bb.getDouble(off + dBase + 8 * di)
          m.longs(s * nL + li) += bb.getLong(off + 8 * li)
        } }
      case MinMaxLSlot(li, fi, _, isMin) =>
        new MBlockMerge { def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit =
          if (bb.get(off + fBase + fi) != 0) {
            val o = s * nL + li; val fo = s * nF + fi
            val x = bb.getLong(off + 8 * li)
            if (!m.flags(fo) || (if (isMin) x < m.longs(o) else x > m.longs(o)))
              m.longs(o) = x
            m.flags(fo) = true
          } }
      case MinMaxDSlot(di, fi, _, isMin) =>
        new MBlockMerge { def apply(m: MultiKeyMap, s: Int, bb: ByteBuffer, off: Int): Unit =
          if (bb.get(off + fBase + fi) != 0) {
            val o = s * nD + di; val fo = s * nF + fi
            val x = bb.getDouble(off + dBase + 8 * di)
            val c = java.lang.Double.compare(x, m.doubles(o))
            if (!m.flags(fo) || (if (isMin) c < 0 else c > 0)) m.doubles(o) = x
            m.flags(fo) = true
          } }
      case other => throw new UnsupportedOperationException(
        s"packed agg: unsupported slot $other")
    }.toArray
  }
}

object PackedPartialAggExec {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("bucket", IntegerType, nullable = false)(),
    AttributeReference("keys", BinaryType, nullable = false)(),
    AttributeReference("state", BinaryType, nullable = false)())
}

/** Map stage: per-partition flat-state multi-key aggregation + bucketed
  * packed emit (see [[PackedAgg]]).
  *
  * Keys blob layout (LE): [n:int][per group: hash:long, nullmask:long,
  * longKeys:8×nLK, strLens:4×nSK][string bytes, group-major]. State blob:
  * n × (8·nL + 8·nD + nF) as in [[RadixAgg]].
  */
final case class PackedPartialAggExec(
    keyExprs: Seq[Expression],
    keyTypes: Seq[DataType],
    aggInputs: Seq[Expression],
    slots: Seq[DriverAgg.Slot],
    nL: Int, nD: Int, nF: Int,
    buckets: Int,
    output: Seq[Attribute],
    child: SparkPlan,
    columnarChild: Boolean,
    ansi: Boolean) extends UnaryExecNode {
  import PackedAgg._

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(c: SparkPlan): PackedPartialAggExec =
    copy(child = c)

  private val nKeys = keyExprs.length
  private val kinds: Array[Int] = keyTypes.map(kindOf).toArray
  // per-key index into the long-key block / string-key block
  private val subIdx: Array[Int] = {
    var li = 0; var si = 0
    kinds.map { k => if (k == KindLong) { li += 1; li - 1 } else { si += 1; si - 1 } }
  }
  private val nLK = kinds.count(_ == KindLong)
  private val nSK = kinds.count(_ == KindStr)
  private val blockBytes = 8 * nL + 8 * nD + nF
  private val recBytes = 16 + 8 * nLK + 4 * nSK

  /** All key exprs and agg inputs are direct columns of `scan` with
    * batch-readable types (int/long-width numerics, dates/timestamps,
    * strings) — the batch loop can run.
    */
  def columnarEligible(scan: SparkPlan): Boolean = {
    def direct(e: Expression): Boolean = e match {
      case a: Attribute => scan.output.exists(_.exprId == a.exprId)
      case _ => false
    }
    val typesOk = keyTypes.forall {
      case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
           StringType => true
      case _ => false
    }
    typesOk && keyExprs.forall(direct) && aggInputs.forall(direct)
  }

  /** Emit the map as packed bucket rows (one row per non-empty bucket). */
  private def emitRows(m: MultiKeyMap): Iterator[InternalRow] = {
    val nBuckets = buckets
    val counts = new Array[Int](nBuckets)
    val strBytes = new Array[Long](nBuckets)
    m.foreachSlot { s =>
      val b = bucketOf(m.hashAt(s), nBuckets)
      counts(b) += 1
      var j = 0
      while (j < nSK) { strBytes(b) += m.strLenAt(s, j); j += 1 }
    }
    val keyArrs = new Array[Array[Byte]](nBuckets)
    val stateArrs = new Array[Array[Byte]](nBuckets)
    val recPos = new Array[Int](nBuckets)   // next record write offset
    val bytePos = new Array[Int](nBuckets)  // next string-byte write offset
    val statePos = new Array[Int](nBuckets)
    var b = 0
    while (b < nBuckets) {
      if (counts(b) > 0) {
        keyArrs(b) = new Array[Byte](4 + counts(b) * recBytes + strBytes(b).toInt)
        stateArrs(b) = new Array[Byte](counts(b) * blockBytes)
        // record count header
        Platform.putInt(keyArrs(b), Platform.BYTE_ARRAY_OFFSET, counts(b))
        recPos(b) = 4
        bytePos(b) = 4 + counts(b) * recBytes
      }
      b += 1
    }
    val pool = m.poolArray
    m.foreachSlot { s =>
      val bk = bucketOf(m.hashAt(s), nBuckets)
      val arr = keyArrs(bk)
      var p = Platform.BYTE_ARRAY_OFFSET + recPos(bk)
      Platform.putLong(arr, p, m.hashAt(s)); p += 8
      Platform.putLong(arr, p, m.maskAt(s)); p += 8
      var j = 0
      while (j < nLK) { Platform.putLong(arr, p, m.longKeyAt(s, j)); p += 8; j += 1 }
      j = 0
      while (j < nSK) {
        val len = m.strLenAt(s, j)
        Platform.putInt(arr, p, len); p += 4
        System.arraycopy(pool, m.strOffAt(s, j), arr, bytePos(bk), len)
        bytePos(bk) += len
        j += 1
      }
      recPos(bk) += recBytes
      // state block
      val st = stateArrs(bk)
      var q = Platform.BYTE_ARRAY_OFFSET + statePos(bk)
      j = 0
      while (j < nL) { Platform.putLong(st, q, m.longs(s * nL + j)); q += 8; j += 1 }
      j = 0
      while (j < nD) { Platform.putDouble(st, q, m.doubles(s * nD + j)); q += 8; j += 1 }
      j = 0
      while (j < nF) {
        Platform.putByte(st, q, if (m.flags(s * nF + j)) 1.toByte else 0.toByte)
        q += 1; j += 1
      }
      statePos(bk) += blockBytes
    }
    val proj = UnsafeProjection.create(Array[DataType](IntegerType, BinaryType, BinaryType))
    val row = new GenericInternalRow(3)
    (0 until nBuckets).iterator.filter(b => keyArrs(b) != null).map { b =>
      row.update(0, b)
      row.update(1, keyArrs(b))
      row.update(2, stateArrs(b))
      proj(row).copy()
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val (kTypes, iExprs, theSlots) = (keyTypes, aggInputs, slots)
    val (aL, aD, aF) = (nL, nD, nF)
    val childOut = child.output
    val ansiMode = ansi
    val theKinds = kinds
    val theSub = subIdx
    val (kLK, kSK, kN) = (nLK, nSK, nKeys)
    if (columnarChild) {
      val kOrds = keyExprs.map { case a: Attribute =>
        childOut.indexWhere(_.exprId == a.exprId) }.toArray
      val ords = iExprs.map { case a: Attribute =>
        childOut.indexWhere(_.exprId == a.exprId) }.toArray
      val dts = iExprs.map(_.dataType).toArray
      val kLongRead: Array[Boolean] = kTypes.map {
        case LongType | TimestampType | TimestampNTZType => true
        case _ => false
      }.toArray
      child.executeColumnar().mapPartitions { batches =>
        val m = new MultiKeyMap(kLK, kSK, aL, aD, aF)
        val vecs = new Array[ColumnVector](ords.length)
        val kvecs = new Array[ColumnVector](kOrds.length)
        val ups = colUpdaters(theSlots, dts, vecs, aL, aD, aF, ansiMode)
        val flushed = ArrayBuffer.empty[InternalRow]
        batches.foreach { batch =>
          var i = 0
          while (i < ords.length) { vecs(i) = batch.column(ords(i)); i += 1 }
          i = 0
          while (i < kOrds.length) { kvecs(i) = batch.column(kOrds(i)); i += 1 }
          val n = batch.numRows()
          var r = 0
          while (r < n) {
            var h = hashSeed
            var msk = 0L
            var j = 0
            while (j < kN) {
              val v = kvecs(j)
              if (v.isNullAt(r)) {
                msk |= 1L << j; h = mixNull(h)
                // canonicalize the staged slot — stale values from the
                // previous row would otherwise split null-key groups
                if (theKinds(j) == KindStr) m.stageStrs(theSub(j)) = null
                else m.stageLongs(theSub(j)) = 0L
              } else if (theKinds(j) == KindLong) {
                val k = if (kLongRead(j)) v.getLong(r) else v.getInt(r).toLong
                m.stageLongs(theSub(j)) = k
                h = mix(h, k)
              } else {
                val s = v.getUTF8String(r)
                m.stageStrs(theSub(j)) = s
                h = mix(h, hashStr(s))
              }
              j += 1
            }
            m.stageMask = msk
            val s = m.slotOf(h)
            var u = 0
            while (u < ups.length) { ups(u)(m, r, s); u += 1 }
            r += 1
          }
          if (m.size >= flushCap || m.poolLen >= PoolFlushBytes) {
            flushed ++= emitRows(m); m.reset()
          }
        }
        (flushed.iterator ++ emitRows(m)).map { row => numOut.add(1); row }
      }
    } else {
      child.execute().mapPartitions { rows =>
        val keyProj = UnsafeProjection.create(keyExprs, childOut)
        val valProj = UnsafeProjection.create(iExprs, childOut)
        val ups = rowUpdaters(theSlots, iExprs, aL, aD, aF, ansiMode)
        val m = new MultiKeyMap(kLK, kSK, aL, aD, aF)
        val readLong: Array[InternalRow => Long] = kTypes.zipWithIndex.map {
          case (ByteType, i) => (r: InternalRow) => r.getByte(i).toLong
          case (ShortType, i) => (r: InternalRow) => r.getShort(i).toLong
          case (IntegerType | DateType, i) => (r: InternalRow) => r.getInt(i).toLong
          case (_, i) => (r: InternalRow) => r.getLong(i)
        }.toArray
        val flushed = ArrayBuffer.empty[InternalRow]
        while (rows.hasNext) {
          val row = rows.next()
          val kr = keyProj(row)
          val v = valProj(row)
          var h = hashSeed
          var msk = 0L
          var j = 0
          while (j < kN) {
            if (kr.isNullAt(j)) {
              msk |= 1L << j; h = mixNull(h)
              // canonicalize (see the columnar path note)
              if (theKinds(j) == KindStr) m.stageStrs(theSub(j)) = null
              else m.stageLongs(theSub(j)) = 0L
            } else if (theKinds(j) == KindLong) {
              val k = readLong(j)(kr)
              m.stageLongs(theSub(j)) = k
              h = mix(h, k)
            } else {
              val s = kr.getUTF8String(j)
              m.stageStrs(theSub(j)) = s
              h = mix(h, hashStr(s))
            }
            j += 1
          }
          m.stageMask = msk
          val s = m.slotOf(h)
          var u = 0
          while (u < ups.length) { ups(u)(m, v, s); u += 1 }
          if (m.size >= flushCap || m.poolLen >= PoolFlushBytes) {
            flushed ++= emitRows(m); m.reset()
          }
        }
        (flushed.iterator ++ emitRows(m)).map { row => numOut.add(1); row }
      }
    }
  }
}

/** Reduce stage: merge packed multi-key blobs into a dense map and
  * evaluate the replaced final aggregate's result expressions per group
  * (or, `bufferMode`, emit buffer rows for a replaced PartialMerge —
  * including the zero-aggregate pure-dedup form of the distinct rewrite).
  */
final case class PackedFinalAggExec(
    keyAttrs: Seq[Attribute],
    slots: Seq[DriverAgg.Slot],
    aggTypes: Seq[DataType],
    nL: Int, nD: Int, nF: Int,
    aggAttrs: Seq[Attribute],
    resultExprs: Seq[NamedExpression],
    output: Seq[Attribute],
    child: SparkPlan,
    bufferMode: Boolean = false,
    ansi: Boolean = false) extends UnaryExecNode {
  import PackedAgg._

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def producedAttributes: AttributeSet = AttributeSet(output)
  // resultExprs bind POSITIONALLY over (keys ++ agg values), not against
  // the child's packed-blob output
  override def references: AttributeSet = AttributeSet(child.output)
  override protected def withNewChildInternal(c: SparkPlan): PackedFinalAggExec =
    copy(child = c)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(child.output.head)) :: Nil

  private val nKeys = keyAttrs.length
  private val kinds: Array[Int] = keyAttrs.map(a => kindOf(a.dataType)).toArray
  private val subIdx: Array[Int] = {
    var li = 0; var si = 0
    kinds.map { k => if (k == KindLong) { li += 1; li - 1 } else { si += 1; si - 1 } }
  }
  private val nLK = kinds.count(_ == KindLong)
  private val nSK = kinds.count(_ == KindStr)
  private val blockBytes = 8 * nL + 8 * nD + nF
  private val recBytes = 16 + 8 * nLK + 4 * nSK

  override protected def doExecute(): RDD[InternalRow] = {
    val numOut = longMetric("numOutputRows")
    val (theSlots, types) = (slots, aggTypes)
    val (aL, aD, aF) = (nL, nD, nF)
    val keyDts = keyAttrs.map(_.dataType).toArray
    val evalSchema = keyAttrs ++ aggAttrs
    val exprs = resultExprs
    val ansiMode = ansi
    val theKinds = kinds
    val theSub = subIdx
    val (kLK, kSK, kN) = (nLK, nSK, nKeys)
    val (rec, block) = (recBytes, blockBytes)
    val buffered = bufferMode
    child.execute().mapPartitions { rows =>
      val m = new MultiKeyMap(kLK, kSK, aL, aD, aF)
      val mergers = blockMergers(theSlots, aL, aD, aF, ansiMode)
      rows.foreach { r =>
        val keys = r.getBinary(1)
        val state = r.getBinary(2)
        val sb = ByteBuffer.wrap(state).order(ByteOrder.LITTLE_ENDIAN)
        val n = Platform.getInt(keys, Platform.BYTE_ARRAY_OFFSET)
        var cursor = 4 + n * rec
        var g = 0
        while (g < n) {
          var p = Platform.BYTE_ARRAY_OFFSET + 4 + g * rec
          val h = Platform.getLong(keys, p); p += 8
          val msk = Platform.getLong(keys, p); p += 8
          var j = 0
          while (j < kLK) { m.stageLongs(j) = Platform.getLong(keys, p); p += 8; j += 1 }
          j = 0
          while (j < kSK) {
            val len = Platform.getInt(keys, p); p += 4
            // a zero-length slice is "" — the mask decides null below
            m.stageStrs(j) = UTF8String.fromBytes(keys, cursor, len)
            cursor += len
            j += 1
          }
          // null components: clear the staged string (mask carries null-ness)
          j = 0
          while (j < kN) {
            if ((msk & (1L << j)) != 0 && theKinds(j) == KindStr)
              m.stageStrs(theSub(j)) = null
            j += 1
          }
          m.stageMask = msk
          val s = m.slotOf(h)
          var u = 0
          while (u < mergers.length) { mergers(u)(m, s, sb, g * block); u += 1 }
          g += 1
        }
      }
      val proj = UnsafeProjection.create(exprs, evalSchema)
      val evalRow = new GenericInternalRow(evalSchema.length)
      val acc = new DriverAgg.Acc(new Array[Long](aL), new Array[Double](aD),
        new Array[Boolean](aF))
      def keyValue(j: Int, s: Int): Any = {
        if ((m.maskAt(s) & (1L << j)) != 0) null
        else if (theKinds(j) == KindLong) {
          val k = m.longKeyAt(s, theSub(j))
          keyDts(j) match {
            case ByteType => k.toByte
            case ShortType => k.toShort
            case IntegerType | DateType => k.toInt
            case _ => k
          }
        } else {
          val si = theSub(j)
          UTF8String.fromBytes(m.poolArray, m.strOffAt(s, si), m.strLenAt(s, si))
        }
      }
      def fillAggs(s: Int): Unit = {
        System.arraycopy(m.longs, s * aL, acc.longs, 0, aL)
        System.arraycopy(m.doubles, s * aD, acc.doubles, 0, aD)
        System.arraycopy(m.flags, s * aF, acc.flags, 0, aF)
        var c = kN
        var j = 0
        while (j < theSlots.length) {
          theSlots(j) match {
            case DriverAgg.AvgSlot(di, li, _) if buffered =>
              evalRow.update(c, acc.doubles(di))
              evalRow.update(c + 1, acc.longs(li))
              c += 2
            case _ =>
              evalRow.update(c, DriverAgg.finalValue(theSlots, types, j, acc))
              c += 1
          }
          j += 1
        }
      }
      // STREAM emission — the projection's output row is reused, as
      // Spark's own aggregate iterators do
      m.slotIterator.map { s =>
        var j = 0
        while (j < kN) { evalRow.update(j, keyValue(j, s)); j += 1 }
        fillAggs(s)
        numOut.add(1)
        proj(evalRow)
      }
    }
  }
}
