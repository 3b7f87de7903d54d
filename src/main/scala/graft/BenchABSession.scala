package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the fused session count (dev only): the same JVM
  * alternates SessionCountRule.enabled per iteration so machine drift
  * cancels (the PERF.md attribution protocol). Runs the headline
  * events_sessionize_lag exactly as Bench does (warm clustered cache).
  */
object BenchABSession {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    val t0p = System.nanoTime()
    (1 to 20).foreach(_ => probe.count())
    println(f"probe_job_ms=${(System.nanoTime() - t0p) / 20 / 1e6}%.1f")

    val fn = SparkEntry.queries("events_sessionize_lag")
    def timed(): Double = {
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }
    graft.rules.SessionCountRule.enabled = true
    (1 to 3).foreach(_ => timed())
    graft.rules.SessionCountRule.enabled = false
    (1 to 3).foreach(_ => timed())
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to 9).foreach { _ =>
      graft.rules.SessionCountRule.enabled = true
      a += timed()
      graft.rules.SessionCountRule.enabled = false
      b += timed()
    }
    graft.rules.SessionCountRule.enabled = true
    val am = a.sorted.apply(a.length / 2); val bm = b.sorted.apply(b.length / 2)
    println(f"events_sessionize_lag fuseON=${am}%7.1fms fuseOFF=${bm}%7.1fms ratio=${am / bm}%.2f")
    spark.stop()
  }
}
