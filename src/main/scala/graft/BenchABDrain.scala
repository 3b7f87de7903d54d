package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the typed allocation-free drain (dev only):
  * alternates DriverAgg.typedDrain per iteration in the same JVM so
  * machine drift cancels (the PERF.md attribution protocol). Runs with
  * the top-n fuse DISABLED so every group is drained through
  * writeFinal — the fused heap would drain only winners and mask the
  * effect under test.
  */
object BenchABDrain {
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

    graft.rules.SortedRunAggRule.topNEnabled = false
    val names = if (args.nonEmpty) args.toSeq
      else Seq("cb_filter_multi_agg", "cb_top_groups")
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }
    names.foreach { name =>
      val fn = queries.OlapShapes.queries.getOrElse(name, SparkEntry.queries(name))
      graft.plans.DriverAgg.typedDrain = true
      (1 to 3).foreach(_ => timed(fn))
      graft.plans.DriverAgg.typedDrain = false
      (1 to 3).foreach(_ => timed(fn))
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 9).foreach { _ =>
        graft.plans.DriverAgg.typedDrain = true
        a += timed(fn)
        graft.plans.DriverAgg.typedDrain = false
        b += timed(fn)
      }
      graft.plans.DriverAgg.typedDrain = true
      val am = a.sorted.apply(a.length / 2); val bm = b.sorted.apply(b.length / 2)
      println(f"$name%-24s typedON=${am}%7.1fms typedOFF=${bm}%7.1fms ratio=${am / bm}%.2f")
    }
    graft.rules.SortedRunAggRule.topNEnabled = true
    spark.stop()
  }
}
