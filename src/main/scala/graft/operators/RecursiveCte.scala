package graft.operators

import org.apache.spark.sql.DataFrame

/** WITH RECURSIVE fixpoint evaluation — Spark has no builtin (SURVEY.md
  * §2.7); the reference executes an iterative fixpoint operator
  * (/root/reference/src/execution/operator/set/physical_recursive_cte.cpp).
  *
  * Driver-side loop, cluster-side work: each iteration runs the step as a
  * distributed job over the current frontier; `localCheckpoint`
  * truncates lineage so plans don't grow with iteration count (the
  * classic failure mode of iterative Spark). UNION semantics (dedup
  * against the accumulated set) via `except`; UNION ALL skips it.
  */
object RecursiveCte {

  def iterate(seed: DataFrame, step: DataFrame => DataFrame,
              distinct: Boolean = true, maxIterations: Int = 1000): DataFrame = {
    var acc = seed.localCheckpoint(true)
    var frontier = acc
    var i = 0
    var done = false
    while (!done && i < maxIterations) {
      val produced = step(frontier)
      val next = (if (distinct) produced.except(acc) else produced).localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        acc = acc.union(next).localCheckpoint(true)
        frontier = next
      }
      i += 1
    }
    if (!done) throw new IllegalStateException(
      s"recursive CTE did not converge within $maxIterations iterations")
    acc
  }
}
