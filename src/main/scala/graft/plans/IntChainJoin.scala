package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** A CHAIN of consecutive single-int-key broadcast INNER hash joins
  * evaluated as one fused probe pass — the reference pipelines a morsel
  * through its whole probe chain without materializing between joins
  * (/root/reference/src/execution/operator/join/physical_hash_join.cpp
  * probe path; JOB plans chain 11-17 such joins over one fact scan).
  *
  * Stock Spark fuses consecutive BroadcastHashJoins into one codegen
  * stage, but each probe still pays UnsafeRow key construction, a
  * murmur hash, and a HashedRelation lookup through generated virtual
  * code — measured 50-90 ns/row across JOB's deep chains (PERF.md r14).
  * This exec probes flat long-keyed open-addressing tables (cached
  * hashes, chained duplicates) built once per executor per broadcast,
  * reads probe keys straight off the cache's int/long column stores,
  * and materializes ONE output row per surviving probe, not one per
  * join level.
  *
  * Join keys may come from the streamed base (the fact's FK columns) or
  * from a PRIOR link's matched build row (snowflake chains: fact→title,
  * title.kind_id→kind_type). Inner joins only; NULL keys match nothing;
  * duplicate build keys expand via per-link chain walks (backtracking
  * emission preserves the stock join's multiplicity).
  *
  * Scale posture: identical to stock BHJ chains — build sides are
  * broadcasts the planner already proved small; the probe pass is
  * embarrassingly parallel per batch/partition.
  *
  * Escape hatch: GRAFT_NO_INT_CHAIN_JOIN=1 (rules/IntChainJoinRule).
  */
final case class IntChainJoinExec(
    base: SparkPlan,
    // per link: broadcast child (IdentityBroadcastMode), key ordinal in
    // the build output, key source (>=0: base ordinal; <0: ~(encoded)
    // from an earlier link's build row — see IntChainJoin.Source)
    links: Seq[IntChainJoin.Link],
    output: Seq[Attribute],
    // per output attr: source (base ordinal or link build ordinal)
    outSources: Seq[IntChainJoin.Source],
    columnarChild: Boolean = false)
  extends SparkPlan {

  override def children: Seq[SparkPlan] = base +: links.map(_.bcast)
  override def outputPartitioning: Partitioning = base.outputPartitioning

  override protected def withNewChildrenInternal(
      ch: IndexedSeq[SparkPlan]): IntChainJoinExec =
    copy(base = ch.head,
      links = links.zip(ch.tail).map { case (l, b) => l.copy(bcast = b) })

  override protected def doExecute(): RDD[InternalRow] = {
    val bcasts = links.map(_.bcast.executeBroadcast[Array[InternalRow]]())
    val linkSpecs = links.toArray
    val srcs = outSources.toArray
    val outTypes = output.map(_.dataType).toArray
    val nLinks = links.length
    if (columnarChild) {
      base.executeColumnar().mapPartitions { batches =>
        val tables = IntChainJoin.tablesFor(bcasts, linkSpecs)
        val emitter = new IntChainJoin.Emitter(srcs, outTypes, linkSpecs, tables)
        batches.flatMap(b => new IntChainJoin.BatchProbe(b, linkSpecs, tables, emitter))
      }
    } else {
      base.execute().mapPartitions { rows =>
        val tables = IntChainJoin.tablesFor(bcasts, linkSpecs)
        val emitter = new IntChainJoin.Emitter(srcs, outTypes, linkSpecs, tables)
        new IntChainJoin.RowProbe(rows, linkSpecs, tables, emitter)
      }
    }
  }
}

object IntChainJoin {

  /** Value source: base column ordinal, or column `ord` of link
    * `link`'s matched build row.
    */
  final case class Source(link: Int, ord: Int) // link == -1 => base

  /** One chain link: the broadcast build side, its key ordinal, the
    * probe-key source, and whether key columns are 32-bit.
    */
  final case class Link(bcast: SparkPlan, buildKeyOrd: Int, keySrc: Source,
      keyIsInt: Boolean, buildKeyIsInt: Boolean)

  /** Flat long-keyed build table: open addressing, cached key longs,
    * `next` chains for duplicates.
    */
  final class Table(val keys: Array[Long], val rows: Array[InternalRow],
      val next: Array[Int], val slots: Array[Int], val mask: Int,
      val hasDups: Boolean) {
    def lookup(k: Long): Int = {
      var p = (hashLong(k) & mask).toInt
      var e = slots(p)
      while (e != -1) {
        if (keys(e) == k) return e
        p = (p + 1) & mask
        e = slots(p)
      }
      -1
    }
  }

  def hashLong(k: Long): Long = {
    // finalizer-style mix (splitmix64 tail): cheap, full avalanche
    var h = k * 0x9e3779b97f4a7c15L
    h ^= h >>> 32
    h & 0x7fffffffL
  }

  def build(rows: Array[InternalRow], keyOrd: Int, keyIsInt: Boolean): Table = {
    val n = rows.length
    val keep = new scala.collection.mutable.ArrayBuffer[InternalRow](n)
    val keys = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) {
      val r = rows(i)
      if (!r.isNullAt(keyOrd)) {
        keys += (if (keyIsInt) r.getInt(keyOrd).toLong else r.getLong(keyOrd))
        keep += (r match { case u: UnsafeRow => u.copy(); case o => o.copy() })
      }
      i += 1
    }
    val m = keep.length
    var cap = 16
    while (cap < m * 2) cap <<= 1
    val slots = new Array[Int](cap)
    java.util.Arrays.fill(slots, -1)
    val next = new Array[Int](m)
    java.util.Arrays.fill(next, -1)
    val mask = cap - 1
    val ks = keys.toArray
    var hasDups = false
    var e = 0
    while (e < m) {
      val k = ks(e)
      var p = (hashLong(k) & mask).toInt
      var cur = slots(p)
      var dup = -1
      while (cur != -1 && dup == -1) {
        if (ks(cur) == k) dup = cur
        else { p = (p + 1) & mask; cur = slots(p) }
      }
      if (dup == -1) slots(p) = e
      else {
        hasDups = true
        var t = dup
        while (next(t) != -1) t = next(t)
        next(t) = e
      }
      e += 1
    }
    new Table(ks, keep.toArray, next, slots, mask, hasDups)
  }

  // per-(broadcast, keyOrd) executor memoization — StringBcastJoin's
  // bounded-eviction discipline (tables immutable; never clear-all)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int), Table]()
  private val insertOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()

  def tableFor(bcast: Broadcast[Array[InternalRow]], keyOrd: Int,
      keyIsInt: Boolean): Table = {
    val k = (bcast.id, keyOrd)
    val cached = cache.get(k)
    if (cached != null) return cached
    val t = cache.computeIfAbsent(k, k2 => {
      insertOrder.add(k2)
      build(bcast.value, keyOrd, keyIsInt)
    })
    var evictAttempts = 64
    while (cache.size() > 48 && evictAttempts > 0) {
      evictAttempts -= 1
      val old = insertOrder.poll()
      if (old == null) evictAttempts = 0
      else if (old != k) cache.remove(old)
      else insertOrder.add(old)
    }
    t
  }

  def tablesFor(bcasts: Seq[Broadcast[Array[InternalRow]]],
      links: Array[Link]): Array[Table] =
    bcasts.zip(links).map { case (b, l) =>
      tableFor(b, l.buildKeyOrd, l.buildKeyIsInt)
    }.toArray

  /** Output-row assembly: fills a scratch row from (base row/batch +
    * matched build rows) and projects to unsafe output.
    */
  final class Emitter(srcs: Array[Source], outTypes: Array[DataType],
      links: Array[Link], tables: Array[Table]) {
    private[this] val scratch = new GenericInternalRow(srcs.length)
    private[this] val proj = UnsafeProjection.create(
      outTypes.zipWithIndex.map { case (dt, i) =>
        BoundReference(i, dt, nullable = true)
      })

    def emit(baseRow: InternalRow, entries: Array[Int]): InternalRow = {
      var i = 0
      while (i < srcs.length) {
        val s = srcs(i)
        val row = if (s.link < 0) baseRow else tables(s.link).rows(entries(s.link))
        scratch.update(i, if (row.isNullAt(s.ord)) null else row.get(s.ord, outTypes(i)))
        i += 1
      }
      proj(scratch)
    }
  }

  /** Probe-key read for link `j` given the base row and prior entries. */
  @inline private def keyOf(links: Array[Link], tables: Array[Table],
      j: Int, baseRow: InternalRow, entries: Array[Int]): Long = {
    val l = links(j)
    val s = l.keySrc
    val row = if (s.link < 0) baseRow else tables(s.link).rows(entries(s.link))
    if (row.isNullAt(s.ord)) Long.MinValue + 1 // sentinel: no match possible
    else if (l.keyIsInt) row.getInt(s.ord).toLong
    else row.getLong(s.ord)
  }

  /** Chain-combination enumerator (odometer over per-link duplicate
    * chains, lexicographic, exact stock-join multiplicity):
    *  - fill(start): probe links start..n-1 from their chain heads;
    *    a failed probe bumps the nearest earlier link and resumes.
    *  - bump(j0): advance the deepest link ≤ j0 with a remaining chain
    *    element; links after it re-fill from their heads.
    */
  sealed abstract class ProbeCore(links: Array[Link], tables: Array[Table]) {
    protected val n: Int = links.length
    val entries = new Array[Int](n)

    /** Key for link j against the current input (vector or row). */
    protected def keyAt(j: Int): Long

    private def bump(j0: Int): Int = {
      var j = j0
      while (j >= 0) {
        val nx = tables(j).next(entries(j))
        if (nx != -1) { entries(j) = nx; return j + 1 }
        j -= 1
      }
      -1
    }

    /** Fill links start..n-1; false when the input row is exhausted. */
    protected def fill(start: Int): Boolean = {
      var j = start
      while (j < n) {
        val k = keyAt(j)
        val e = if (k == Long.MinValue + 1) -1 else tables(j).lookup(k)
        if (e != -1) { entries(j) = e; j += 1 }
        else {
          j = bump(j - 1)
          if (j < 0) return false
        }
      }
      true
    }

    /** Next duplicate combination after an emitted one. */
    protected def nextCombo(): Boolean = {
      val r = bump(n - 1)
      r >= 0 && fill(r)
    }
  }

  /** Row-contract probe with duplicate-chain expansion. */
  final class RowProbe(rows: Iterator[InternalRow], links: Array[Link],
      tables: Array[Table], emitter: Emitter)
    extends ProbeCore(links, tables) with Iterator[InternalRow] {

    private[this] var cur: InternalRow = _
    private[this] var onMatch = false

    protected def keyAt(j: Int): Long = keyOf(links, tables, j, cur, entries)

    private def advance(): Boolean = {
      if (onMatch && nextCombo()) return true
      onMatch = false
      while (rows.hasNext) {
        cur = rows.next()
        if (fill(0)) return true
      }
      false
    }

    private[this] var ready = false
    override def hasNext: Boolean = {
      if (!ready) { ready = advance(); onMatch = ready }
      ready
    }
    override def next(): InternalRow = {
      if (!ready && !hasNext) throw new NoSuchElementException
      ready = false
      emitter.emit(cur, entries)
    }
  }

  /** Batch probe: base-sourced keys read straight off the batch's
    * column vectors (GraftColumnVector primitive stores or any other
    * vector — no row materialization until a match emits); keys sourced
    * from prior links' build rows share the row machinery.
    */
  final class BatchProbe(batch: ColumnarBatch, links: Array[Link],
      tables: Array[Table], emitter: Emitter)
    extends ProbeCore(links, tables) with Iterator[InternalRow] {

    private[this] val rowCount = batch.numRows()
    // direct vector access for base-sourced keys per link
    private[this] val baseVecs: Array[ColumnVector] = links.map { l =>
      if (l.keySrc.link < 0) batch.column(l.keySrc.ord) else null
    }.toArray
    private[this] var r = -1
    private[this] var curRow: InternalRow = _
    private[this] var onMatch = false

    protected def keyAt(j: Int): Long = {
      val v = baseVecs(j)
      if (v != null) {
        if (v.isNullAt(r)) Long.MinValue + 1
        else if (links(j).keyIsInt) v.getInt(r).toLong
        else v.getLong(r)
      } else {
        if (curRow == null) curRow = batch.getRow(r)
        keyOf(links, tables, j, curRow, entries)
      }
    }

    private def advance(): Boolean = {
      if (onMatch && nextCombo()) return true
      onMatch = false
      r += 1
      while (r < rowCount) {
        curRow = null
        if (fill(0)) {
          if (curRow == null) curRow = batch.getRow(r)
          return true
        }
        r += 1
      }
      false
    }

    private[this] var ready = false
    override def hasNext: Boolean = {
      if (!ready) { ready = advance(); onMatch = ready }
      ready
    }
    override def next(): InternalRow = {
      if (!ready && !hasNext) throw new NoSuchElementException
      ready = false
      emitter.emit(curRow, entries)
    }
  }
}
