package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeriesSourceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def series(opts: (String, Any)*) = {
    val r = spark.read.format("graft.sources.SeriesSource")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v.toString) }.load()
  }

  test("generates the inclusive range across partitions") {
    val df = series("start" -> 1, "end" -> 1000, "numPartitions" -> 8)
    assert(df.rdd.getNumPartitions == 8)
    val r = df.agg(count(lit(1)), sum("value"), min("value"), max("value")).head()
    assert(r.getLong(0) == 1000 && r.getLong(1) == 500500L)
    assert(r.getLong(2) == 1 && r.getLong(3) == 1000)
  }

  test("range filters are pushed into the scan (pruned at generation)") {
    val df = series("start" -> 1, "end" -> 1000000)
      .filter(col("value") > 999990 && col("value") <= 999995)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("SeriesScan[999991..999995"), plan)
    assert(df.count() == 5)
  }

  test("pushdown preserves the step grid") {
    // start=0 step=5 → values 0,5,10,...; filter >=3 must yield 5, not 3
    val vals = series("start" -> 0, "end" -> 20, "step" -> 5)
      .filter(col("value") >= 3).collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == Seq(5L, 10L, 15L, 20L))
  }

  test("empty result when filters exclude the whole range") {
    assert(series("start" -> 1, "end" -> 10).filter(col("value") > 100).count() == 0)
  }
}
