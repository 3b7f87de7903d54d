package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print the analyzed + physical plan of a named query
  * (AQE initial plan — the tree query-stage-prep rules see). Not part of
  * the driver protocol.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[8]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_CACHE=1: plan against the warm clustered cache (bench state)
    if (sys.env.get("GRAFT_CACHE").contains("1")) Tables.cacheMode = true
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      println(s"==== $name")
      println(df.queryExecution.executedPlan.toString)
      df.collect()
      println("---- after execution (final adaptive plan)")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
