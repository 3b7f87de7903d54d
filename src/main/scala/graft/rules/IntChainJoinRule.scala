package graft.rules

import graft.plans.{IntChainJoin, IntChainJoinExec}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, IsNotNull}
import org.apache.spark.sql.catalyst.optimizer.BuildRight
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, HashedRelationBroadcastMode}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Fuse a chain of ≥2 consecutive single-int-key broadcast INNER hash
  * joins into [[IntChainJoinExec]] — one probe pass per input row
  * across all links, keys read off column vectors, one output row
  * materialization per surviving probe (see the exec's scaladoc; the
  * JOB suite chains 11-17 such joins over each fact scan).
  *
  * Matches bottom-up through the streamed side, folding away
  * attribute-only projections (pure pruning — the chain emits the TOP
  * join's output directly) and `IsNotNull(probe key)` filters (the
  * probe skips NULL keys itself). Build sides' HashedRelation
  * exchanges become identity broadcasts of the raw rows. Probe keys
  * may come from the base or from an earlier link's matched build row
  * (snowflake chains). Declines: outer joins, extra conditions,
  * multi-key or non-integral keys, BuildLeft.
  *
  * **OPT-IN (GRAFT_INT_CHAIN_JOIN=1) after a measured r15 negative
  * result.** Interleaved x100 A/B on the JOB deep families
  * (job_29a/26c/30b/17a, CBO+AQE protocol): 1.04-1.12× SLOWER with the
  * rule on. The executed plans show why: CBO emits the deep joins as
  * BuildLeft and as transitive-closure MULTI-key joins
  * ([movie_id×5]=[title.id×5]), which this matcher declines — the rule
  * only claims short 2-link segments, where breaking the codegen stage
  * with an interpreted emitter costs more than the flat-table probe
  * saves (stock int-key BHJ probing is already codegen-decent; the
  * string probe the r14 StringBcastJoin replaced was pathological).
  * The lever that WOULD move the 7× lane, per this evidence: BuildLeft
  * + multi-key support with codegen-competitive emission — recorded in
  * PERF.md r15 as named future work. GRAFT_INT_CHAIN_MIN sets the
  * minimum chain length (default 2).
  */
object IntChainJoinRule extends Rule[SparkPlan] {
  @volatile var enabled: Boolean =
    sys.env.get("GRAFT_INT_CHAIN_JOIN").contains("1")
  @volatile var minLinks: Int =
    sys.env.get("GRAFT_INT_CHAIN_MIN").map(_.toInt).getOrElse(2)

  private def intWidth(dt: DataType): Option[Boolean] = dt match {
    case IntegerType | DateType => Some(true)
    case LongType | TimestampType | TimestampNTZType => Some(false)
    case _ => None
  }

  private final case class RawLink(probeKey: AttributeReference,
      buildKey: AttributeReference, buildChild: SparkPlan)

  /** Descend the streamed spine, collecting links innermost-first. */
  private def collect(p: SparkPlan, chainKeys: Set[org.apache.spark.sql.catalyst.expressions.ExprId],
      acc: List[RawLink]): (SparkPlan, List[RawLink]) = p match {
    case BroadcastHashJoinExec(Seq(lk: AttributeReference),
        Seq(rk: AttributeReference), Inner, BuildRight, None, streamed,
        BroadcastExchangeExec(_: HashedRelationBroadcastMode, buildChild), false)
        if intWidth(lk.dataType).isDefined && lk.dataType == rk.dataType &&
          buildChild.output.exists(_.exprId == rk.exprId) =>
      collect(streamed, chainKeys + lk.exprId,
        RawLink(lk, rk, buildChild) :: acc)
    // pure pruning projections fold away — the chain emits the top
    // join's output directly off base columns + build rows
    case ProjectExec(exprs, child)
        if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      collect(child, chainKeys, acc)
    // IsNotNull conjunctions on chain probe keys are redundant (the
    // probe skips NULL keys); any other conjunct ends the chain here
    case FilterExec(cond, child)
        if splitAnd(cond).forall {
          case IsNotNull(a: AttributeReference) => chainKeys.contains(a.exprId)
          case _ => false
        } =>
      collect(child, chainKeys, acc)
    case other => (other, acc)
  }

  private def splitAnd(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitAnd(l) ++ splitAnd(r)
    case other => other :: Nil
  }

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!enabled) return plan
    // top-down: the TOPMOST join of a chain claims all its links; the
    // traversal then continues into the fused exec's children (build
    // sides may hold their own chains)
    plan.transformDown {
      case j: BroadcastHashJoinExec =>
        val (base, raw) = collect(j, Set.empty, Nil)
        if (raw.length < minLinks) j
        else {
          // key sources: base column or an earlier link's build column
          val baseOut = base.output
          val linksOpt: Option[Seq[IntChainJoin.Link]] = {
            val out = Seq.newBuilder[IntChainJoin.Link]
            var ok = true
            raw.zipWithIndex.foreach { case (l, i) =>
              if (ok) {
                val bOrd = baseOut.indexWhere(_.exprId == l.probeKey.exprId)
                val src =
                  if (bOrd >= 0) Some(IntChainJoin.Source(-1, bOrd))
                  else {
                    // search EARLIER links' build outputs
                    val hit = raw.take(i).zipWithIndex.reverse.collectFirst {
                      case (prev, pi)
                          if prev.buildChild.output.exists(_.exprId == l.probeKey.exprId) =>
                        IntChainJoin.Source(pi,
                          prev.buildChild.output.indexWhere(_.exprId == l.probeKey.exprId))
                    }
                    hit
                  }
                src match {
                  case Some(s) =>
                    out += IntChainJoin.Link(
                      BroadcastExchangeExec(
                        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode,
                        l.buildChild),
                      l.buildChild.output.indexWhere(_.exprId == l.buildKey.exprId),
                      s,
                      intWidth(l.probeKey.dataType).get,
                      intWidth(l.buildKey.dataType).get)
                  case None => ok = false
                }
              }
            }
            if (ok) Some(out.result()) else None
          }
          linksOpt match {
            case Some(links) =>
              // every output attr must trace to the base or a build row
              val srcOpt: Option[Seq[IntChainJoin.Source]] = {
                val srcs = j.output.map { a =>
                  val b = baseOut.indexWhere(_.exprId == a.exprId)
                  if (b >= 0) Some(IntChainJoin.Source(-1, b))
                  else raw.zipWithIndex.reverse.collectFirst {
                    case (l, i) if l.buildChild.output.exists(_.exprId == a.exprId) =>
                      IntChainJoin.Source(i,
                        l.buildChild.output.indexWhere(_.exprId == a.exprId))
                  }
                }
                if (srcs.forall(_.isDefined)) Some(srcs.flatten) else None
              }
              srcOpt match {
                case Some(srcs) =>
                  IntChainJoinExec(base, links, j.output, srcs)
                case None => j
              }
            case None => j
          }
        }
    }
  }
}
