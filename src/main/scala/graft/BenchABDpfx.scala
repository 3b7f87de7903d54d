package graft

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for the grouped-distinct prefix re-key
  * (rules/DistinctByGroupPrefix — TPC-H q16's count(DISTINCT) tower).
  * Protocol: BenchTpchScale registration (warm clustered cache, AQE off,
  * 32 shuffle partitions, the tuned sort shuffle writer), per query 2
  * warmups per arm then alternating A/B, median of 7 per arm.
  *
  * Usage: SPARK_GRAFT_TPCH_FACTOR=100 sbt "runMain graft.BenchABDpfx [thqNN ...]"
  * GRAFT_PROF=1 prints per-stage metrics; GRAFT_EXPLAIN=1 the ON plan.
  */
object BenchABDpfx {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_TPCH_FACTOR", "100").toLong
    val names = if (args.nonEmpty) args.toSeq else Seq("thq16")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "32")
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

    Tables.cacheMode = true
    if (names.exists(_.startsWith("thq"))) {
      val dir = graft.sources.TpchFixture.ensureScaled(spark, factor)
      graft.sources.TpchFixture.tables.foreach { t =>
        Tables(spark, dir, t).createOrReplaceTempView(t)
      }
    }
    if (names.exists(_.startsWith("cb_"))) {
      val hitsFactor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "100").toLong
      val dir = graft.sources.HitsFixture.ensureScaled(spark, hitsFactor)
      Tables(spark, dir, "hits").createOrReplaceTempView("hits")
      spark.table("hits").count()
    }
    println(f"probe_before=${probeMs()}%.1f ms/job")

    if (sys.env.contains("GRAFT_PROF"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val st = s.stageInfo
          val tm = st.taskMetrics
          System.out.println(f"[stage ${st.stageId}] tasks=${st.numTasks} " +
            f"run=${tm.executorRunTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
            f"gc=${tm.jvmGCTime}ms shWrMB=${tm.shuffleWriteMetrics.bytesWritten / 1048576} " +
            f"shWrTime=${tm.shuffleWriteMetrics.writeTime / 1000000}ms " +
            f"shRdMB=${(tm.shuffleReadMetrics.remoteBytesRead +
              tm.shuffleReadMetrics.localBytesRead) / 1048576}")
        }
      })

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val texts = queries.TpchVerbatim.texts ++ queries.ClickBench.texts.toMap
    names.foreach { name =>
      val sql = texts(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }
      def setArm(on: Boolean): Unit =
        graft.rules.DistinctByGroupPrefix.enabled = on
      // warm-state differential: both arms must return identical rows
      setArm(true)
      val rowsOn = spark.sql(sql).collect().map(_.toString).sorted
      setArm(false)
      val rowsOff = spark.sql(sql).collect().map(_.toString).sorted
      require(rowsOn.sameElements(rowsOff),
        s"$name: arm results differ (${rowsOn.length} vs ${rowsOff.length} rows)")
      setArm(true); (1 to 2).foreach(_ => once())
      setArm(false); (1 to 2).foreach(_ => once())
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 7).foreach { _ =>
        setArm(true); on += once()
        setArm(false); off += once()
      }
      setArm(true)
      if (sys.env.contains("GRAFT_PROF")) {
        println(s"=== stages for $name (ON arm, one run) ===")
        once()
      }
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        val dfx = spark.sql(sql)
        dfx.collect()
        println(s"=== plan for $name (ON arm) ===")
        println(dfx.queryExecution.executedPlan.toString.take(8000))
      }
      println(f"[abdpfx] $name%-7s on=${med(on.toSeq)}%7.1f ms  off=${med(off.toSeq)}%7.1f ms  " +
        f"ratio=${med(on.toSeq) / med(off.toSeq)}%.3f  " +
        f"on_runs=${on.map(t => f"$t%.0f").mkString(",")}  " +
        f"off_runs=${off.map(t => f"$t%.0f").mkString(",")}")
    }
    println(f"probe_after=${probeMs()}%.1f ms/job")
    spark.stop()
  }
}
