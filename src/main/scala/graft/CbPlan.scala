package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: physical plans of ClickBench texts on the warm
  * clustered hits cache (the bench state). Not part of the driver
  * protocol.
  *
  * Usage: SPARK_GRAFT_HITS_FACTOR=20 sbt "runMain graft.CbPlan cb_q13"
  */
object CbPlan {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "20").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.sources.HitsFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    Tables(spark, dir, "hits").createOrReplaceTempView("hits")
    spark.table("hits").count()
    val texts = queries.ClickBench.texts.toMap
    args.foreach { name =>
      val df = spark.sql(texts(name))
      println(s"==== $name")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
