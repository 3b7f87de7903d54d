package graft

import org.apache.spark.sql.SparkSession

/** In-JVM grid over (cached-table partitions × shuffle partitions) for the
  * headline suite (dev only) — one JVM so machine drift cancels.
  */
object BenchGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }
    for (parts <- Seq(4, 8, 16); shuffle <- Seq(1, 2, 4, 8)) {
      Tables.clearCache()
      Tables.cacheParts = Some(parts)
      spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
      Bench.headline.foreach { case (_, fn) => fn(spark, sfDir).collect() } // cache build
      val per = Bench.headline.map { case (name, fn) =>
        (1 to 2).foreach(_ => timed(fn))
        val t = (1 to 5).map(_ => timed(fn)).sorted
        name -> t(2)
      }
      val tot = per.map(_._2).sum
      println(f"parts=$parts%2d shuffle=$shuffle%2d TOTAL=${tot}%7.1fms  " +
        per.map { case (n, v) => f"${n.take(10)}=${v}%.0f" }.mkString(" "))
    }
    spark.stop()
  }
}
