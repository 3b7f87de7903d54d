package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only bisect harness for the two drifted headline rows
  * (distinct_exact_vs_approx, topk_lineitem): replicates Bench's exact
  * state (warm cache, shuffle=2, AQE off) in ONE JVM, prints each
  * query's job count + per-stage run/cpu metrics, then interleaves every
  * r13-rule escape hatch on/off so a rule-interaction regression shows
  * as an on/off ratio while host drift cancels (the PERF.md attribution
  * protocol).
  */
object BenchABHeadline {
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
    spark.conf.set("spark.sql.ui.explainMode", "simple")
    val jobs = new AtomicInteger()
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val st = sc.stageInfo; val tm = st.taskMetrics
        stageLines.add(f"  [stage ${st.stageId}] tasks=${st.numTasks} " +
          f"run=${tm.executorRunTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
          f"shWrite=${tm.shuffleWriteMetrics.writeTime / 1000000}ms")
      }
    })
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    def probeMs(): Double = {
      val t = (1 to 40).map { _ =>
        val t0 = System.nanoTime(); probe.count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      t(t.length / 2)
    }

    val shapes = Bench.headline.filter { case (n, _) =>
      n == "distinct_exact_vs_approx" || n == "topk_lineitem" }
    (1 to 3).foreach(_ => shapes.foreach(_._2(spark, sfDir).collect()))
    println(f"probe_job_ms=${probeMs()}%.1f")

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    // 1. decomposition: job count + stage metrics of one execution
    shapes.foreach { case (name, fn) =>
      (1 to 3).foreach(_ => timed(fn))
      jobs.set(0); stageLines.clear()
      val w = timed(fn)
      Thread.sleep(300)
      println(f"==== $name wall=${w}%6.1f ms jobs=${jobs.get()}")
      stageLines.forEach(println(_))
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      println(plan.linesIterator.map(_.take(110)).take(14).mkString("\n"))
    }

    // 2. hatch bisect: every r13-introduced or shape-adjacent flag
    val hatches: Seq[(String, Boolean => Unit)] = Seq(
      ("fast_percentile", v => rules.FastPercentileRule.enabled = v),
      ("packed_selection", v => plans.PackedAgg.selectionFoldEnabled = v),
      ("dict_keys", v => plans.DriverAgg.dictKeysEnabled = v),
      ("direct_str_key", v => plans.DriverAgg.directStringArm = v),
      ("packed_agg", v => rules.PackedShuffleAgg.enabled = v),
      ("topn_through_agg", v => rules.TopNThroughAgg.enabled = v),
      ("single_phase", v => rules.SinglePhaseAgg.enabled = v))
    shapes.foreach { case (name, fn) =>
      hatches.foreach { case (hname, set) =>
        try {
          set(true); (1 to 2).foreach(_ => timed(fn))
          set(false); (1 to 2).foreach(_ => timed(fn))
          val a = scala.collection.mutable.ArrayBuffer.empty[Double]
          val b = scala.collection.mutable.ArrayBuffer.empty[Double]
          (1 to 7).foreach { _ =>
            set(true); a += timed(fn)
            set(false); b += timed(fn)
          }
          println(f"[ab] $name%-26s $hname%-18s on=${med(a.toSeq)}%6.1f " +
            f"off=${med(b.toSeq)}%6.1f ratio=${med(a.toSeq) / med(b.toSeq)}%.3f")
        } finally set(true)
      }
    }
    println(f"probe_job_ms_after=${probeMs()}%.1f")
    spark.stop()
  }
}
