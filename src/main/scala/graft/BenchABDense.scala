package graft

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B of the dense calendar-bucket partial
  * (plans/DriverAgg runDenseCalendarPartials) against the generic
  * open-addressing partial, on the cb_date_histogram shape — dev
  * evidence for PERF.md. Protocol: warm cache + JIT, probe fingerprint,
  * then alternating on/off rounds so VM phase hits both arms equally;
  * fresh and pre-planned re-exec medians of 9 each.
  */
object BenchABDense {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val names = if (args.nonEmpty) args.toSeq else Seq("cb_date_histogram")
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
    def probeMs(): Double = {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => probe.count())
      (System.nanoTime() - t0) / 2e7
    }
    println(f"probe_job_ms_before=${probeMs()}%.1f")

    def withDense[A](on: Boolean)(f: => A): A = {
      val prev = graft.plans.DriverAgg.denseCalendarEnabled
      graft.plans.DriverAgg.denseCalendarEnabled = on
      try f finally graft.plans.DriverAgg.denseCalendarEnabled = prev
    }

    names.foreach { name =>
      val fn = queries.OlapShapes.queries(name)
      (1 to 3).foreach(_ => withDense(true) { fn(spark, sfDir).collect() })
      (1 to 3).foreach(_ => withDense(false) { fn(spark, sfDir).collect() })
      val prebuilt = fn(spark, sfDir)
      prebuilt.collect()
      def t(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      val reOn = collection.mutable.ArrayBuffer[Double]()
      val reOff = collection.mutable.ArrayBuffer[Double]()
      val frOn = collection.mutable.ArrayBuffer[Double]()
      val frOff = collection.mutable.ArrayBuffer[Double]()
      (1 to 9).foreach { _ =>
        reOn += withDense(true) { t(prebuilt.collect()) }
        reOff += withDense(false) { t(prebuilt.collect()) }
        frOn += withDense(true) { t(fn(spark, sfDir).collect()) }
        frOff += withDense(false) { t(fn(spark, sfDir).collect()) }
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[dense-ab] $name%-20s reexec on=${med(reOn.toSeq)}%6.1f ms " +
        f"off=${med(reOff.toSeq)}%6.1f ms (${med(reOn.toSeq) / med(reOff.toSeq)}%.2fx)  " +
        f"fresh on=${med(frOn.toSeq)}%6.1f ms off=${med(frOff.toSeq)}%6.1f ms " +
        f"(${med(frOn.toSeq) / med(frOff.toSeq)}%.2fx)")
    }
    println(f"probe_job_ms_after=${probeMs()}%.1f")
    spark.stop()
  }
}
