package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Repair cached relations whose `outputOrdering` references stale
  * attribute ids.
  *
  * When the same cached table appears twice in one plan (CTE reuse,
  * self-join — e.g. TPC-H q15's revenue view used by both the join and
  * the scalar subquery), the second `InMemoryRelation` is deduplicated
  * via `newInstance()`, which re-ids the OUTPUT attributes but leaves
  * `outputOrdering` (our clustered cache's sort keys) pointing at the old
  * ids. Any later canonicalization of that relation — e.g.
  * SimplifyBinaryComparison canonicalizing a scalar-subquery comparison —
  * then dies in `withOutput`'s AttributeMap lookup
  * (NoSuchElementException), killing the whole query in warm mode.
  *
  * The repair rebinds ordering attributes to the relation's own output BY
  * NAME (column names are unique within one cached table); a suffix that
  * cannot be rebound is dropped from the first failure on (a sort prefix
  * is only meaningful left-to-right). Injected TWICE: as a
  * plan-normalization rule and as an optimizer rule (duplicates
  * `InlineCTE` creates mid-optimization run before the first
  * canonicalizing rule). Idempotent; a no-op on consistent relations.
  *
  * Scope note: graft's own warm tables serve relations with the logical
  * `outputOrdering` already STRIPPED (see `bridge.cachedRelationDf` —
  * canonicalization can also fire INSIDE the analyzer, e.g.
  * `ResolveAggregateFunctions`' semanticEquals on a HAVING subquery,
  * where no injectable rule can reach), so this rule now guards only
  * relations cached OUTSIDE the Tables layer (a user's own sorted
  * `.cache()` double-used in one query, duplicated post-analysis).
  */
object RepairCachedOrdering extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
    case rel: InMemoryRelation if stale(rel) => repair(rel)
  }

  private def stale(rel: InMemoryRelation): Boolean = {
    val valid = AttributeSet(rel.output)
    rel.outputOrdering.exists(!_.references.subsetOf(valid))
  }

  private def repair(rel: InMemoryRelation): InMemoryRelation = {
    val byName = rel.output.groupBy(_.name)
    def rebind(so: SortOrder): Option[SortOrder] =
      if (!so.references.forall(a => byName.get(a.name).exists(_.size == 1))) None
      else Some(so.transform {
        case a: Attribute => byName(a.name).head
      }.asInstanceOf[SortOrder])
    val fixed = rel.outputOrdering.map(rebind).takeWhile(_.isDefined).map(_.get)
    val repaired = rel.copy(outputOrdering = fixed)
    repaired.statsOfPlanToCache = rel.statsOfPlanToCache
    repaired
  }
}
