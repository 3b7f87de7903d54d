package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the multi-key packed-payload aggregate (dev only):
  * alternates rules.PackedShuffleAgg on/off within one JVM over the
  * high-cardinality ClickBench aggregation shapes on a scaled hits
  * fixture, so VM phase drift cancels; reports per-query medians. With
  * the rule off, the prior stack (SinglePhaseAgg where stats prove
  * groups≈rows, else the stock two-phase HashAggregate) is the baseline.
  *
  * Usage: SPARK_GRAFT_HITS_FACTOR=100 sbt "runMain graft.BenchABPacked [cb_qNN ...]"
  */
object BenchABPacked {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    def probeMs(): Double = {
      val t = (1 to 40).map { _ =>
        val t0 = System.nanoTime(); probe.count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      t(t.length / 2)
    }

    // GRAFT_PROF=1: per-stage run/cpu/GC/shuffle attribution (same
    // listener as ProfOlap) to split map-side vs exchange vs merge
    if (sys.env.contains("GRAFT_PROF"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val st = s.stageInfo
          val tm = st.taskMetrics
          System.err.println(f"[stage ${st.stageId}] tasks=${st.numTasks} " +
            f"run=${tm.executorRunTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
            f"gc=${tm.jvmGCTime}ms " +
            f"shWriteMB=${tm.shuffleWriteMetrics.bytesWritten / 1048576} " +
            f"shWriteTime=${tm.shuffleWriteMetrics.writeTime / 1000000}ms " +
            f"shReadMB=${tm.shuffleReadMetrics.remoteBytesRead / 1048576 +
              tm.shuffleReadMetrics.localBytesRead / 1048576}")
        }
      })

    val dir = graft.sources.HitsFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    Tables(spark, dir, "hits").createOrReplaceTempView("hits")
    spark.table("hits").count()
    println(f"factor=$factor probe_before=${probeMs()}%.1f ms/job")

    def timed(sql: String): Double = {
      val df = spark.sql(sql)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("cb_q05", "cb_q06", "cb_q09", "cb_q10", "cb_q15", "cb_q17",
        "cb_q18", "cb_q19")
    val textMap = queries.ClickBench.texts.toMap
    names.foreach { name =>
      val sql = textMap(name)
      graft.rules.PackedShuffleAgg.enabled = true
      (1 to 3).foreach(_ => timed(sql))
      graft.rules.PackedShuffleAgg.enabled = false
      (1 to 3).foreach(_ => timed(sql))
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 7).foreach { _ =>
        graft.rules.PackedShuffleAgg.enabled = true
        a += timed(sql)
        graft.rules.PackedShuffleAgg.enabled = false
        b += timed(sql)
      }
      val am = a.sorted.apply(a.length / 2); val bm = b.sorted.apply(b.length / 2)
      println(f"$name%-8s packed=${am}%8.1f ms  off=${bm}%8.1f ms  (${am / bm}%.2fx)")
    }
    graft.rules.PackedShuffleAgg.enabled = true
    println(f"probe_after=${probeMs()}%.1f ms/job")
    spark.stop()
  }
}
