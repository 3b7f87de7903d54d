package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B (dev only): streaming window operator vs WindowExec
  * for the two window-bearing headline queries — same JVM so machine
  * drift cancels.
  */
object BenchABWindow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "2")
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
    for (name <- Seq("window_rank_running", "events_sessionize_lag")) {
      val fn = Bench.headline.find(_._1 == name).get._2
      val rule = graft.rules.InsertCacheColumnarToRow
      val sw = graft.plans.StreamingWindowExec
      (1 to 4).foreach { _ =>
        rule.streamWindowEnabled = true; timed(fn)
        rule.streamWindowEnabled = false; timed(fn)
      }
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      val c = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 11).foreach { _ =>
        rule.streamWindowEnabled = true; a += timed(fn)
        rule.streamWindowEnabled = false; b += timed(fn)
        // r3 emulation: no result projection (the ADVICE bug) — isolates
        // the projection cost the round-4 fix added
        rule.streamWindowEnabled = true; sw.emitRawJoinedRow = true
        c += timed(fn); sw.emitRawJoinedRow = false
      }
      rule.streamWindowEnabled = true
      println(f"$name%-24s stream=${a.sorted.apply(a.length / 2)}%6.1fms " +
        f"windowexec=${b.sorted.apply(b.length / 2)}%6.1fms " +
        f"rawjoin_r3=${c.sorted.apply(c.length / 2)}%6.1fms " +
        f"(min ${a.min}%6.1f / ${b.min}%6.1f / ${c.min}%6.1f)")
    }
    spark.stop()
  }
}
