package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the bounded-key driver-agg auto-route (dev only):
  * alternates rules.BoundedKeyDriverAgg on/off within one JVM, so VM
  * phase drift cancels; reports per-query medians. AQE OFF to mirror the
  * pairing bench's dispatch conditions.
  */
object BenchABBounded {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
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
    val names = if (args.nonEmpty) args.toSeq
      else Seq("cb_date_histogram", "h2o_join_big", "h2o_range_agg")
    names.foreach { name =>
      val fn = queries.OlapShapes.queries.getOrElse(name, SparkEntry.queries(name))
      graft.rules.BoundedKeyDriverAgg.enabled = true
      (1 to 3).foreach(_ => timed(fn))
      graft.rules.BoundedKeyDriverAgg.enabled = false
      (1 to 3).foreach(_ => timed(fn))
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 9).foreach { _ =>
        graft.rules.BoundedKeyDriverAgg.enabled = true
        a += timed(fn)
        graft.rules.BoundedKeyDriverAgg.enabled = false
        b += timed(fn)
      }
      val am = a.sorted.apply(a.length / 2); val bm = b.sorted.apply(b.length / 2)
      println(f"$name%-24s bounded=${am}%7.1f ms  off=${bm}%7.1f ms  (${am / bm}%.2fx)")
    }
    graft.rules.BoundedKeyDriverAgg.enabled = true
    spark.stop()
  }
}
