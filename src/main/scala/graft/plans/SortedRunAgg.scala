package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.DataType

import scala.collection.mutable.ArrayBuffer

/** Streaming aggregation over RUN-clustered input — the sorted-storage
  * answer to the groups ≈ rows regime.
  *
  * When the child is sorted on a prefix of the grouping columns (graft's
  * clustered cache: lineitem sorted by l_orderkey) and partitioned so
  * groups are whole per partition, a Complete-mode hash aggregate
  * builds a map of EVERY group in the partition (millions of entries,
  * cache-hostile probes) even though all rows of a group arrive
  * contiguously. This operator keeps state for ONE prefix run at a
  * time: a tiny flat-state map over the (≤1) remaining grouping column,
  * reset at each prefix boundary, groups emitted as their run closes.
  * Per-row cost is an L1-resident small-map probe instead of a
  * giant-map probe; memory is O(groups per run) instead of O(groups per
  * partition).
  *
  * Equal-contiguity is all that is required — any sort direction (and
  * any null ordering) clusters equal prefix values, so the rule only
  * checks the ordering COLUMNS. Reference analog: sorted/partitioned
  * aggregation fast paths over ordered storage
  * (physical_hash_aggregate.cpp's non-repartitioning path +
  * physical_streaming_window.cpp's run detection shape).
  *
  * Created by [[graft.rules.SortedRunAggRule]] from a collapsed
  * Complete-mode HashAggregate; aggregates compile to
  * [[DriverAgg.layout]] slots, the remaining key widens losslessly to
  * long ([[RadixAgg.supportedKey]]), NULL run keys ride a side
  * accumulator per run.
  */
final case class SortedRunAggExec(
    prefix: Seq[Attribute],
    runKey: Option[Expression],
    runKeyType: DataType,
    aggInputs: Seq[Expression],
    slots: Seq[DriverAgg.Slot],
    nL: Int, nD: Int, nF: Int,
    aggTypes: Seq[DataType],
    aggAttrs: Seq[Attribute],
    resultExprs: Seq[NamedExpression],
    output: Seq[Attribute],
    child: SparkPlan,
    ansi: Boolean,
    // batch-direct loop over a columnar child (set by the cache-read
    // rewire in rules/VectorizedCacheRead, like the radix partial)
    columnarChild: Boolean = false,
    // selection pushed through from a folded CacheFilterExec: evaluated
    // per batch via dictionary-id tables (plans/DictFilter.DictSelection)
    // so filtered batch-direct aggregation never materializes rows
    selection: Seq[Expression] = Nil) extends UnaryExecNode {
  import RadixAgg._

  private def numericRead(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType |
         org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** Batch path needs every read to be a direct numeric column: prefix
    * cols int/long-read, run key supported, agg inputs plain columns.
    */
  def columnarEligible(scan: SparkPlan): Boolean = {
    def direct(e: Expression): Boolean = e match {
      case a: Attribute => scan.output.exists(_.exprId == a.exprId)
      case _ => false
    }
    prefix.forall(a => direct(a) && numericRead(a.dataType)) &&
      runKey.forall(e => direct(e) && numericRead(runKeyType)) &&
      aggInputs.forall(direct)
  }

  /** Row fallback with DIRECT ordinal reads — prefix and run key read
    * straight off the child row with a primitive boundary compare (no
    * per-row prefix/key projections). Lets the rewrite cover a filtered
    * child (codegen Filter over the columnar scan emits rows).
    */
  def rowDirectEligible: Boolean = {
    def ord(e: Expression): Boolean = e match {
      case a: Attribute => child.output.exists(_.exprId == a.exprId)
      case _ => false
    }
    prefix.forall(a => ord(a) && numericRead(a.dataType)) &&
      runKey.forall(e => ord(e) && numericRead(runKeyType))
  }

  override def producedAttributes: AttributeSet = AttributeSet(output)
  // resultExprs bind positionally over the (group cols ++ agg values)
  // eval schema, not against the child's columns
  override def references: AttributeSet = AttributeSet(child.output)
  override protected def withNewChildInternal(c: SparkPlan): SortedRunAggExec =
    copy(child = c)

  // one row per group: grouping-attr exprIds survive into `output`, so
  // the child's clustering/ordering claims remain valid when their
  // references do
  override def outputPartitioning: Partitioning = child.outputPartitioning match {
    case e: Expression if !e.references.subsetOf(outputSet) =>
      org.apache.spark.sql.catalyst.plans.physical
        .UnknownPartitioning(child.outputPartitioning.numPartitions)
    case p => p
  }
  override def outputOrdering: Seq[SortOrder] =
    child.outputOrdering.takeWhile(_.references.subsetOf(outputSet))

  private val evalSchema: Seq[Attribute] =
    prefix ++ runKey.toSeq.map(_ => keyAttr) ++ aggAttrs
  private lazy val keyAttr: Attribute = runKey.get match {
    case a: Attribute => a
    case e => AttributeReference("run_key", runKeyType)()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val (pfx, rk, iExprs, theSlots) = (prefix, runKey, aggInputs, slots)
    val (aL, aD, aF, types) = (nL, nD, nF, aggTypes)
    val (childOut, exprs, schema) = (child.output, resultExprs, evalSchema)
    val (kT, ansiMode) = (runKeyType, ansi)
    val pfxTypes = pfx.map(_.dataType)
    if (columnarChild) return runBatchDirect()
    if (rowDirectEligible) return runRowDirect()
    child.execute().mapPartitions { rows =>
      val prefixProj = UnsafeProjection.create(pfx, childOut)
      val keyProj = rk.map(e => UnsafeProjection.create(Seq(e), childOut))
      val valProj = UnsafeProjection.create(iExprs, childOut)
      val ups = rowUpdaters(theSlots, iExprs, aL, aD, aF, ansiMode)
      val m = new LongKeyMap(aL, aD, aF, 64, trackOccupied = true)
      val nullM = new LongKeyMap(aL, aD, aF, 16, trackOccupied = true)
      val readKey: InternalRow => Long = kT match {
        case org.apache.spark.sql.types.ByteType => r => r.getByte(0).toLong
        case org.apache.spark.sql.types.ShortType => r => r.getShort(0).toLong
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => r => r.getInt(0).toLong
        case _ => r => r.getLong(0)
      }
      def keyValue(k: Long): Any = kT match {
        case org.apache.spark.sql.types.ByteType => k.toByte
        case org.apache.spark.sql.types.ShortType => k.toShort
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => k.toInt
        case _ => k
      }
      val proj = UnsafeProjection.create(exprs, schema)
      val evalRow = new GenericInternalRow(schema.length)
      val acc = new DriverAgg.Acc(new Array[Long](aL), new Array[Double](aD),
        new Array[Boolean](aF))
      val keyPos = pfx.length
      val aggBase = pfx.length + (if (rk.isDefined) 1 else 0)
      var curPrefix: UnsafeRow = null
      var sawNull = false

      def load(src: LongKeyMap, s: Int): Unit = {
        System.arraycopy(src.longs, s * aL, acc.longs, 0, aL)
        System.arraycopy(src.doubles, s * aD, acc.doubles, 0, aD)
        System.arraycopy(src.flags, s * aF, acc.flags, 0, aF)
      }
      def fillAggs(): Unit = {
        var j = 0
        while (j < theSlots.length) {
          evalRow.update(aggBase + j, DriverAgg.finalValue(theSlots, types, j, acc))
          j += 1
        }
      }
      def drainRun(into: ArrayBuffer[InternalRow]): Unit = {
        var i = 0
        while (i < pfxTypes.length) {
          evalRow.update(i, curPrefix.get(i, pfxTypes(i))); i += 1
        }
        m.foreachOccupied { s =>
          load(m, s)
          if (rk.isDefined) evalRow.update(keyPos, keyValue(m.keyAt(s)))
          fillAggs()
          into += proj(evalRow).copy()
        }
        if (sawNull) {
          nullM.foreachOccupied { s =>
            load(nullM, s)
            evalRow.update(keyPos, null)
            fillAggs()
            into += proj(evalRow).copy()
          }
        }
        m.resetOccupied(); nullM.resetOccupied(); sawNull = false
      }
      def consume(row: InternalRow): Unit = {
        val dst = if (keyProj.isDefined) {
          val kr = keyProj.get.apply(row)
          if (kr.isNullAt(0)) { sawNull = true; nullM.slotOf(0L) | Int.MinValue }
          else m.slotOf(readKey(kr))
        } else m.slotOf(0L)
        val inNull = dst < 0
        val s = if (inNull) dst & Int.MaxValue else dst
        val tgt = if (inNull) nullM else m
        val v = valProj(row)
        var j = 0
        while (j < ups.length) { ups(j)(tgt, v, s); j += 1 }
      }

      new Iterator[InternalRow] {
        private val outBuf = ArrayBuffer.empty[InternalRow]
        private var outPos = 0
        private var exhausted = false
        def hasNext: Boolean = {
          if (outPos < outBuf.length) return true
          if (exhausted) return false
          outBuf.clear(); outPos = 0
          while (rows.hasNext && outBuf.isEmpty) {
            val row = rows.next()
            val p = prefixProj(row)
            if (curPrefix == null) curPrefix = p.copy()
            else if (p != curPrefix) {
              drainRun(outBuf)
              curPrefix = p.copy()
            }
            consume(row)
          }
          if (outBuf.isEmpty && !rows.hasNext) {
            exhausted = true
            if (curPrefix != null) drainRun(outBuf)
          }
          outPos < outBuf.length
        }
        def next(): InternalRow = { val r = outBuf(outPos); outPos += 1; r }
      }
    }
  }

  /** Direct-ordinal row loop (filtered children): prefix/key read off
    * the child row by ordinal with primitive boundary compares; only the
    * aggregate inputs go through a projection. Same run semantics and
    * emission as the batch loop.
    */
  private def runRowDirect(): RDD[InternalRow] = {
    val (pfx, rk, iExprs, theSlots) = (prefix, runKey, aggInputs, slots)
    val (aL, aD, aF, types) = (nL, nD, nF, aggTypes)
    val (childOut, exprs, schema) = (child.output, resultExprs, evalSchema)
    val (kT, ansiMode) = (runKeyType, ansi)
    val pfxTypes = pfx.map(_.dataType).toArray
    val pOrds = pfx.map(a => childOut.indexWhere(_.exprId == a.exprId)).toArray
    val pLong = pfxTypes.map {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    val kOrd = rk.map { case a: Attribute =>
      childOut.indexWhere(_.exprId == a.exprId) }.getOrElse(-1)
    val kLong = kT match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    child.execute().mapPartitions { rows =>
      val valProj = UnsafeProjection.create(iExprs, childOut)
      val ups = rowUpdaters(theSlots, iExprs, aL, aD, aF, ansiMode)
      val m = new LongKeyMap(aL, aD, aF, 64, trackOccupied = true)
      val nullM = new LongKeyMap(aL, aD, aF, 16, trackOccupied = true)
      val proj = UnsafeProjection.create(exprs, schema)
      val evalRow = new GenericInternalRow(schema.length)
      val acc = new DriverAgg.Acc(new Array[Long](aL), new Array[Double](aD),
        new Array[Boolean](aF))
      val keyPos = pfx.length
      val aggBase = pfx.length + (if (rk.isDefined) 1 else 0)
      val nP = pOrds.length
      val curP = new Array[Long](nP)
      val curNull = new Array[Boolean](nP)
      var curSet = false
      var sawNull = false

      def keyValue(k: Long): Any = kT match {
        case org.apache.spark.sql.types.ByteType => k.toByte
        case org.apache.spark.sql.types.ShortType => k.toShort
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => k.toInt
        case _ => k
      }
      def prefixValue(i: Int): Any =
        if (curNull(i)) null
        else pfxTypes(i) match {
          case org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.DateType => curP(i).toInt
          case _ => curP(i)
        }
      def load(src: LongKeyMap, s: Int): Unit = {
        System.arraycopy(src.longs, s * aL, acc.longs, 0, aL)
        System.arraycopy(src.doubles, s * aD, acc.doubles, 0, aD)
        System.arraycopy(src.flags, s * aF, acc.flags, 0, aF)
      }
      def fillAggs(): Unit = {
        var j = 0
        while (j < theSlots.length) {
          evalRow.update(aggBase + j, DriverAgg.finalValue(theSlots, types, j, acc))
          j += 1
        }
      }
      def drainRun(into: ArrayBuffer[InternalRow]): Unit = {
        var i = 0
        while (i < nP) { evalRow.update(i, prefixValue(i)); i += 1 }
        m.foreachOccupied { s =>
          load(m, s)
          if (rk.isDefined) evalRow.update(keyPos, keyValue(m.keyAt(s)))
          fillAggs()
          into += proj(evalRow).copy()
        }
        if (sawNull) {
          nullM.foreachOccupied { s =>
            load(nullM, s)
            evalRow.update(keyPos, null)
            fillAggs()
            into += proj(evalRow).copy()
          }
        }
        m.resetOccupied(); nullM.resetOccupied(); sawNull = false
      }
      def differs(row: InternalRow): Boolean = {
        var i = 0
        while (i < nP) {
          val nul = row.isNullAt(pOrds(i))
          if (nul != curNull(i)) return true
          if (!nul) {
            val v = if (pLong(i)) row.getLong(pOrds(i)) else row.getInt(pOrds(i)).toLong
            if (v != curP(i)) return true
          }
          i += 1
        }
        false
      }
      def updateCur(row: InternalRow): Unit = {
        var j = 0
        while (j < nP) {
          curNull(j) = row.isNullAt(pOrds(j))
          curP(j) = if (curNull(j)) 0L
            else if (pLong(j)) row.getLong(pOrds(j)) else row.getInt(pOrds(j)).toLong
          j += 1
        }
      }
      def consume(row: InternalRow): Unit = {
        val (tgt, s) =
          if (kOrd < 0) (m, m.slotOf(0L))
          else if (row.isNullAt(kOrd)) { sawNull = true; (nullM, nullM.slotOf(0L)) }
          else (m, m.slotOf(
            if (kLong) row.getLong(kOrd) else row.getInt(kOrd).toLong))
        val v = valProj(row)
        var j = 0
        while (j < ups.length) { ups(j)(tgt, v, s); j += 1 }
      }

      new Iterator[InternalRow] {
        private val outBuf = ArrayBuffer.empty[InternalRow]
        private var outPos = 0
        private var exhausted = false
        def hasNext: Boolean = {
          if (outPos < outBuf.length) return true
          if (exhausted) return false
          outBuf.clear(); outPos = 0
          while (rows.hasNext && outBuf.isEmpty) {
            val row = rows.next()
            if (!curSet) { updateCur(row); curSet = true }
            else if (differs(row)) { drainRun(outBuf); updateCur(row) }
            consume(row)
          }
          if (outBuf.isEmpty && !rows.hasNext) {
            exhausted = true
            if (curSet) drainRun(outBuf)
          }
          outPos < outBuf.length
        }
        def next(): InternalRow = { val r = outBuf(outPos); outPos += 1; r }
      }
    }
  }

  /** Batch-direct loop: prefix and run key read straight off column
    * vectors (int/long families), boundary compare is a primitive
    * compare per prefix column, agg slots update via the columnar
    * updaters. Same run semantics and emission as the row path.
    */
  private def runBatchDirect(): RDD[InternalRow] = {
    val (pfx, rk, iExprs, theSlots) = (prefix, runKey, aggInputs, slots)
    val (aL, aD, aF, types) = (nL, nD, nF, aggTypes)
    val (childOut, exprs, schema) = (child.output, resultExprs, evalSchema)
    val (kT, ansiMode) = (runKeyType, ansi)
    val pfxTypes = pfx.map(_.dataType).toArray
    val pOrds = pfx.map(a => childOut.indexWhere(_.exprId == a.exprId)).toArray
    val pLong = pfxTypes.map {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    val kOrd = rk.map { case a: Attribute =>
      childOut.indexWhere(_.exprId == a.exprId) }.getOrElse(-1)
    val kLong = kT match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }
    val ords = iExprs.map { case a: Attribute =>
      childOut.indexWhere(_.exprId == a.exprId) }.toArray
    val dts = iExprs.map(_.dataType).toArray
    val selPreds = selection.toArray
    child.executeColumnar().mapPartitions { batches =>
      val sel = if (selPreds.isEmpty) null else new DictSelection(selPreds, childOut)
      val vecs = new Array[org.apache.spark.sql.vectorized.ColumnVector](ords.length)
      val ups = colUpdaters(theSlots, dts, vecs, aL, aD, aF, ansiMode)
      val m = new LongKeyMap(aL, aD, aF, 64, trackOccupied = true)
      val nullM = new LongKeyMap(aL, aD, aF, 16, trackOccupied = true)
      val proj = UnsafeProjection.create(exprs, schema)
      val evalRow = new GenericInternalRow(schema.length)
      val acc = new DriverAgg.Acc(new Array[Long](aL), new Array[Double](aD),
        new Array[Boolean](aF))
      val keyPos = pfx.length
      val aggBase = pfx.length + (if (rk.isDefined) 1 else 0)
      val nP = pOrds.length
      val curP = new Array[Long](nP)
      val curNull = new Array[Boolean](nP)
      var curSet = false
      var sawNull = false

      def keyValue(k: Long): Any = kT match {
        case org.apache.spark.sql.types.ByteType => k.toByte
        case org.apache.spark.sql.types.ShortType => k.toShort
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => k.toInt
        case _ => k
      }
      def prefixValue(i: Int): Any =
        if (curNull(i)) null
        else pfxTypes(i) match {
          case org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.DateType => curP(i).toInt
          case _ => curP(i)
        }
      def load(src: LongKeyMap, s: Int): Unit = {
        System.arraycopy(src.longs, s * aL, acc.longs, 0, aL)
        System.arraycopy(src.doubles, s * aD, acc.doubles, 0, aD)
        System.arraycopy(src.flags, s * aF, acc.flags, 0, aF)
      }
      def fillAggs(): Unit = {
        var j = 0
        while (j < theSlots.length) {
          evalRow.update(aggBase + j, DriverAgg.finalValue(theSlots, types, j, acc))
          j += 1
        }
      }
      def drainRun(into: ArrayBuffer[InternalRow]): Unit = {
        var i = 0
        while (i < nP) { evalRow.update(i, prefixValue(i)); i += 1 }
        m.foreachOccupied { s =>
          load(m, s)
          if (rk.isDefined) evalRow.update(keyPos, keyValue(m.keyAt(s)))
          fillAggs()
          into += proj(evalRow).copy()
        }
        if (sawNull) {
          nullM.foreachOccupied { s =>
            load(nullM, s)
            evalRow.update(keyPos, null)
            fillAggs()
            into += proj(evalRow).copy()
          }
        }
        m.resetOccupied(); nullM.resetOccupied(); sawNull = false
      }

      new Iterator[InternalRow] {
        private val outBuf = ArrayBuffer.empty[InternalRow]
        private var outPos = 0
        private var exhausted = false
        private var pVecs: Array[org.apache.spark.sql.vectorized.ColumnVector] = null
        private var kVec: org.apache.spark.sql.vectorized.ColumnVector = null
        private var nRows = 0
        private var rIdx = 0
        private var haveBatch = false

        private def loadBatch(): Boolean = {
          if (!batches.hasNext) return false
          val b = batches.next()
          var i = 0
          while (i < ords.length) { vecs(i) = b.column(ords(i)); i += 1 }
          pVecs = pOrds.map(b.column)
          kVec = if (kOrd >= 0) b.column(kOrd) else null
          if (sel != null) sel.reset(b)
          nRows = b.numRows(); rIdx = 0; haveBatch = true
          true
        }

        // pure check: does row r start a NEW run? (cur untouched — the
        // finished run must be DRAINED under its own prefix first)
        private def differs(r: Int): Boolean = {
          var i = 0
          while (i < nP) {
            val nul = pVecs(i).isNullAt(r)
            if (nul != curNull(i)) return true
            if (!nul) {
              val v = if (pLong(i)) pVecs(i).getLong(r) else pVecs(i).getInt(r).toLong
              if (v != curP(i)) return true
            }
            i += 1
          }
          false
        }

        private def updateCur(r: Int): Unit = {
          var j = 0
          while (j < nP) {
            curNull(j) = pVecs(j).isNullAt(r)
            curP(j) = if (curNull(j)) 0L else if (pLong(j)) pVecs(j).getLong(r)
              else pVecs(j).getInt(r).toLong
            j += 1
          }
        }

        private def consume(r: Int): Unit = {
          val (tgt, s) =
            if (kVec == null) (m, m.slotOf(0L))
            else if (kVec.isNullAt(r)) { sawNull = true; (nullM, nullM.slotOf(0L)) }
            else (m, m.slotOf(if (kLong) kVec.getLong(r) else kVec.getInt(r).toLong))
          var j = 0
          while (j < ups.length) { ups(j)(tgt, r, s); j += 1 }
        }

        def hasNext: Boolean = {
          if (outPos < outBuf.length) return true
          if (exhausted) return false
          outBuf.clear(); outPos = 0
          while (outBuf.isEmpty) {
            if (!haveBatch || rIdx >= nRows) {
              if (!loadBatch()) {
                exhausted = true
                if (curSet) drainRun(outBuf)
                return outBuf.nonEmpty
              }
            }
            while (rIdx < nRows && outBuf.isEmpty) {
              val r = rIdx
              // selection first: filtered-out rows neither open nor close
              // a run (run boundaries are between PASSING rows only)
              if (sel == null || sel.passes(r)) {
                if (!curSet) { updateCur(r); curSet = true }
                else if (differs(r)) { drainRun(outBuf); updateCur(r) }
                consume(r)
              }
              rIdx += 1
            }
          }
          outPos < outBuf.length
        }
        def next(): InternalRow = { val r = outBuf(outPos); outPos += 1; r }
      }
    }
  }
}
