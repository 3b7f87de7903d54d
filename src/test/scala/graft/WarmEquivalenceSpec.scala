package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide warm/cold equivalence: every ORACLE-GATED query (the
  * deterministic, totally-ordered subset of the contract) must return
  * byte-identical results with the warm layer active (clustered columnar
  * cache + graft serializer + vectorized cache reads + broadcast cache)
  * as with cold parquet scans. This turns the perf layer's
  * "correctness-neutral" claim into a checked invariant: the bench
  * configuration itself is oracle-equivalent, not just spec-pinned.
  * (Rows-only entries — sketches/samples — are engine-nondeterministic by
  * design and excluded.)
  */
class WarmEquivalenceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("all oracle-gated queries: warm (cacheMode) results == cold results") {
    val names = SparkEntry.oracleSql.keySet.toSeq.sorted
    Tables.cacheMode = false
    val cold = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
    }.toMap
    Tables.cacheMode = true
    try {
      val bad = names.flatMap { n =>
        try {
          val warm = SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
          if (warm == cold(n)) None
          else Some(s"$n: warm!=cold (first warm=${warm.headOption}, cold=${cold(n).headOption})")
        } catch {
          case e: Throwable => Some(s"$n: warm run THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      assert(bad.isEmpty, bad.mkString("\n"))
    } finally {
      Tables.cacheMode = false
      Tables.clearCache()
    }
  }
}
