package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print the executed plan of h2o board queries under
  * the EXACT BenchH2o state (factor-scaled fixture, warm columnar
  * cache, AQE per SPARK_GRAFT_AQE). Not part of the driver protocol.
  *
  * Usage: SPARK_GRAFT_H2O_FACTOR=10 sbt "runMain graft.H2oPlan h2o_j04"
  */
object H2oPlan {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_H2O_FACTOR", "10").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_H2O_DIR",
      graft.sources.H2oFixture.ensureScaled(spark, factor))
    graft.sources.H2oFixture.tables.foreach { t =>
      val view = if (t == "x") "h2o_x" else t
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(view)
      if (!sys.env.get("GRAFT_DS_CACHE").contains("0")) {
        spark.catalog.cacheTable(view)
        spark.table(view).count()
      }
    }
    val textMap = queries.H2oBoard.texts.toMap
    args.foreach { name =>
      val df = spark.sql(textMap(name))
      println(s"==== $name")
      println(df.queryExecution.executedPlan.toString)
      df.queryExecution.toRdd.count()
      println("---- after execution (final adaptive plan)")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
