package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the vectorized-cache-read rule (dev only): runs each
  * headline query alternating rule on/off within one JVM so machine drift
  * cancels; reports per-query medians for both arms.
  */
object BenchAB {
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
    var totA = 0.0; var totB = 0.0
    Bench.headline.foreach { case (name, fn) =>
      graft.rules.InsertCacheColumnarToRow.enabled = true
      (1 to 3).foreach(_ => timed(fn))
      graft.rules.InsertCacheColumnarToRow.enabled = false
      (1 to 3).foreach(_ => timed(fn))
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 9).foreach { i =>
        graft.rules.InsertCacheColumnarToRow.enabled = true
        a += timed(fn)
        graft.rules.InsertCacheColumnarToRow.enabled = false
        b += timed(fn)
      }
      val am = a.sorted.apply(a.length / 2); val bm = b.sorted.apply(b.length / 2)
      totA += am; totB += bm
      println(f"$name%-28s vecON=${am}%7.1fms vecOFF=${bm}%7.1fms")
    }
    println(f"TOTAL vecON=${totA}%7.1fms vecOFF=${totB}%7.1fms")
    spark.stop()
  }
}
