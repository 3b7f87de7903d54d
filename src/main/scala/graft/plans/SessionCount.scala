package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Fused sessionization counter — the lag-gap idiom collapsed to one
  * primitive loop.
  *
  * `count(*) of session starts per entity` is written declaratively as
  * lag(ts) OVER (PARTITION BY user ORDER BY ts, ...) → filter
  * (prev IS NULL OR ts - prev > gap) → groupBy(user).count(). Even with
  * the streaming window specialization that is three row-at-a-time
  * operators: the window's value evaluation + row concat, a codegen'd
  * filter projection, and a hash-aggregate probe — per input row. Over
  * run-clustered input (the warm cache is partitioned AND sorted by
  * (user, ts, tiebreak)) the whole pipeline is a per-partition scalar
  * recurrence: two ordinal reads per row, one comparison against the
  * previous timestamp, a counter bump on gap, one output row per entity
  * run. A hand-rolled floor measurement of exactly this loop ran ~2×
  * faster than the three-operator pipeline at sf0.1 (PERF.md r10) —
  * this exec IS that loop, planned by [[graft.rules.SessionCountRule]].
  *
  * Reference analog: sessionization rides the streaming-window fast
  * path and its consumers never materialize intermediate rows
  * (physical_window.cpp streaming dispatch; the fused filter+agg is the
  * same collapse the sorted-run aggregate applies to plain grouping).
  *
  * Semantics reproduced EXACTLY (pinned by `SessionCountSpec`):
  *  - lag is the previous ROW's ts VALUE within the (user) partition in
  *    (ts, tiebreak) order — a NULL-ts predecessor makes `isnull(prev)`
  *    true, so the row AFTER a NULL ts is a session start; a NULL
  *    CURRENT ts (non-first) makes the subtraction NULL → not a start;
  *  - the first row of each entity run has prev IS NULL → counted;
  *  - a NULL entity key is its own group (grouping equality);
  *  - gap comparison is strict `>` on microseconds.
  */
final case class SessionCountExec(
    part: Attribute,
    ts: Attribute,
    gapMicros: Long,
    output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)
  override def references: AttributeSet = AttributeSet(Seq(part, ts))
  override protected def withNewChildInternal(c: SparkPlan): SessionCountExec =
    copy(child = c)

  // one row per entity; the entity attr survives into output, so the
  // child's hash partitioning claim remains valid when its refs do
  override def outputPartitioning: Partitioning = child.outputPartitioning match {
    case e: Expression if !e.references.subsetOf(outputSet) =>
      org.apache.spark.sql.catalyst.plans.physical
        .UnknownPartitioning(child.outputPartitioning.numPartitions)
    case p => p
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val out = output
    val pOrd = childOut.indexWhere(_.exprId == part.exprId)
    val tOrd = childOut.indexWhere(_.exprId == ts.exprId)
    val pInt = part.dataType match {
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType => true
      case _ => false
    }
    // ts admits IntegerType in the rule's `longish` — physical rows store
    // it as a 4-byte slot, so getLong would read garbage (or throw on
    // non-Unsafe rows); widen explicitly
    val tInt = ts.dataType match {
      case org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    val gap = gapMicros
    child.execute().mapPartitions { rows =>
      val evalRow = new SpecificInternalRow(out.map(_.dataType))
      val proj = UnsafeProjection.create(out.map(a => a: Expression), out)
      var haveRun = false
      var curP = 0L; var curPNull = false
      var prevTs = 0L; var prevTsNull = false
      var cnt = 0L

      new Iterator[InternalRow] {
        private var emitReady = false
        // the boundary row's scalars, parked while its predecessor run
        // is emitted (scalars, not the row — child row buffers are reused)
        private var havePark = false
        private var parkP = 0L; private var parkPN = false
        private var parkT = 0L; private var parkTN = false

        private def openRun(p: Long, pn: Boolean, t: Long, tn: Boolean): Unit = {
          haveRun = true
          curP = p; curPNull = pn
          cnt = 1L // first row of the run: lag IS NULL → session start
          prevTs = t; prevTsNull = tn
        }

        def hasNext: Boolean = {
          if (emitReady) return true
          while (rows.hasNext) {
            val r = rows.next()
            val pn = r.isNullAt(pOrd)
            val p = if (pn) 0L else if (pInt) r.getInt(pOrd).toLong else r.getLong(pOrd)
            val tn = r.isNullAt(tOrd)
            val t = if (tn) 0L else if (tInt) r.getInt(tOrd).toLong else r.getLong(tOrd)
            if (!haveRun) openRun(p, pn, t, tn)
            else if (pn != curPNull || (!pn && p != curP)) {
              parkP = p; parkPN = pn; parkT = t; parkTN = tn; havePark = true
              emitReady = true
              return true
            } else {
              // isnull(prev) is true whenever the PREVIOUS row's ts is
              // NULL (lag carries the value, not just run position) →
              // session start; otherwise a NULL current ts makes the
              // subtraction NULL → not a start; else strict gap compare
              if (prevTsNull || (!tn && t - prevTs > gap)) cnt += 1
              prevTs = t; prevTsNull = tn
            }
          }
          if (haveRun) { emitReady = true; return true }
          false
        }

        def next(): InternalRow = {
          if (curPNull) evalRow.setNullAt(0)
          else if (pInt) evalRow.setInt(0, curP.toInt)
          else evalRow.setLong(0, curP)
          evalRow.setLong(1, cnt)
          emitReady = false
          haveRun = false
          val res = proj(evalRow)
          if (havePark) { openRun(parkP, parkPN, parkT, parkTN); havePark = false }
          res
        }
      }
    }
  }
}
