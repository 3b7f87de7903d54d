package graft

import graft.rules.SumRewrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SumRewriteSpec extends AnyFunSuite {
  import SparkTestSession._

  test("sum(x + c) rewrites to sum(x) + c*count(x) with identical results") {
    val li = Tables(spark, sf, "lineitem")
    val build = () => li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity") + lit(5.0)).as("s"), sum(col("l_quantity")).as("plain"))
      .orderBy(col("l_returnflag"))
    val expected = build().collect()
    spark.experimental.extraOptimizations = Seq(SumRewrite)
    try {
      val df = build()
      val optimized = df.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("count("), optimized)
      assert(!optimized.matches("(?s).*sum\\(\\(l_quantity.* \\+ 5\\.0\\)\\).*"), optimized)
      val got = df.collect()
      expected.zip(got).foreach { case (e, g) =>
        assert(e.getString(0) == g.getString(0))
        assert(math.abs(e.getDouble(1) - g.getDouble(1)) < 1e-6)
        assert(e.getDouble(2) == g.getDouble(2))
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite skips nulls consistently with the original form") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("x")
    val expected = df.agg(sum($"x" + lit(2.0))).head().getDouble(0) // 1+2 + 3+2 = 8
    spark.experimental.extraOptimizations = Seq(SumRewrite)
    try {
      val got = df.agg(sum($"x" + lit(2.0))).head().getDouble(0)
      assert(got == expected && got == 8.0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("distinct and filtered sums are left untouched") {
    val li = Tables(spark, sf, "lineitem")
    spark.experimental.extraOptimizations = Seq(SumRewrite)
    try {
      val df = li.agg(sum_distinct(col("l_quantity") + lit(1.0)).as("sd"))
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("count("), plan)
      assert(df.head().getDouble(0) > 0)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
