package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: is the cross-execution broadcast cache hitting?
  * Prints cache size + per-execution job counts for q5/q3.
  */
object DebugBroadcast {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    })

    for (name <- Seq("q5_local_supplier", "q3_shipping_priority")) {
      val fn = Bench.headline.find(_._1 == name).get._2
      (1 to 3).foreach { i =>
        Thread.sleep(200); jobs = 0
        fn(spark, sfDir).collect()
        Thread.sleep(200)
        println(s"$name exec$i: jobs=$jobs cacheSize=${graft.plans.CachedBroadcastExec.size}")
      }
      // dump whether the plan even contains CachedBroadcastExec
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val nCached = plan.collect { case c: graft.plans.CachedBroadcastExec => c }.size
      val nPlain = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b }.size
      println(s"$name plan: CachedBroadcastExec=$nCached plainBroadcast=$nPlain")
    }
    spark.stop()
  }
}
