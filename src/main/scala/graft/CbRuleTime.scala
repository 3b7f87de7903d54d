package graft

import org.apache.spark.sql.SparkSession

/** Dev: Catalyst rule-time breakdown for warm CB planning. */
object CbRuleTime {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]").config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.sources.HitsFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    Tables(spark, dir, "hits").createOrReplaceTempView("hits")
    spark.table("hits").count()
    val texts = queries.ClickBench.texts.toMap
    // warm the planner caches
    args.foreach(n => spark.sql(texts(n)).queryExecution.executedPlan)
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    (1 to 10).foreach(_ => args.foreach(n => spark.sql(texts(n)).queryExecution.executedPlan))
    val t1 = System.nanoTime()
    println(f"[ruletime] total plan wall for 10x${args.length} queries: ${(t1 - t0) / 1e6}%.1f ms")
    val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
    println(dump.split("\n").take(40).mkString("\n"))
    spark.stop()
  }
}
