package graft

import graft.functions.DistinctWithHll.distinct_with_hll
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultiDistinctSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fused aggregate: exact side matches countDistinct, approx within rsd") {
    import spark.implicits._
    // includes key 0 (sentinel path) and repeats; 8 partitions force merges
    val df = (0 until 50000).map(i => ((i % 7919).toLong, (i % 433).toLong))
      .toDF("a", "b").repartition(8)
    val truth = df.agg(countDistinct(col("a")), countDistinct(col("b"))).head()
    val got = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    assert(got.getLong(0) == truth.getLong(0)) // exact side is exact
    val trueB = truth.getLong(1).toDouble
    assert(math.abs(got.getLong(1) - trueB) / trueB < 0.15,
      s"approx ${got.getLong(1)} vs $trueB")
  }

  test("bucketed two-level shape equals the global aggregation exactly") {
    import graft.functions.DistinctWithHll.hll_union
    import spark.implicits._
    val df = (0 until 50000).map(i => ((i % 7919).toLong, (i % 433).toLong))
      .toDF("a", "b").repartition(8)
    val global = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    // hash-bucketing the EXACT key keeps bucket key-spaces disjoint, so
    // exact counts add; HLL registers union register-wise — the estimate
    // must be byte-identical, not merely close
    val bucketed = df
      .groupBy(pmod(hash(col("a")), lit(16)).as("bk"))
      .agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .agg(sum(col("d.n_exact")).as("n"), hll_union(col("d.hll")).as("approx"))
      .head()
    assert(bucketed.getLong(0) == global.getLong(0))
    assert(bucketed.getLong(1) == global.getLong(1))
  }

  test("null inputs are ignored on both sides") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), None), (None, Some(5L)), (Some(1L), Some(5L)), (Some(2L), Some(6L)))
      .toDF("a", "b")
    val got = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    assert(got.getLong(0) == 2)
    assert(got.getLong(1) == 2)
  }
}
