package graft

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for the r15 TPC-H exchange-count levers:
  *   thq15 — ungrouped driver-merge above the grouped final
  *           (rules/BoundedKeyDriverAgg aggTopped + Subquery routing);
  *   thq11 — WinMagic HAVING-threshold rewrite
  *           (rules/ScalarAggToWindow).
  * Protocol: BenchTpchScale registration (warm clustered cache, AQE off,
  * 32 shuffle partitions), per query 2 warmups per arm then A/B
  * alternating, median of 7 per arm.
  *
  * Usage: SPARK_GRAFT_TPCH_FACTOR=100 sbt "runMain graft.BenchABThq [thqNN ...]"
  */
object BenchABThq {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_TPCH_FACTOR", "100").toLong
    val names = if (args.nonEmpty) args.toSeq else Seq("thq15", "thq11")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "32")
      // diagnostics for the per-segment shuffle write cost
      .config("spark.shuffle.compress",
        sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.checksum.enabled",
        sys.env.getOrElse("GRAFT_SHUFFLE_CHECKSUM", "true"))
      .config("spark.shuffle.sort.initialBufferSize",
        sys.env.getOrElse("GRAFT_SHUFFLE_INITBUF", "4096"))
      .config("spark.shuffle.file.buffer",
        sys.env.getOrElse("GRAFT_SHUFFLE_FILEBUF", "32k"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_SHUFFLE_BYPASS", "200"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())

    val dir = graft.sources.TpchFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    graft.sources.TpchFixture.tables.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }

    // GRAFT_AB_ONLY=scalar narrows the arm to ScalarAggToWindow alone
    // (attribution runs for a change to that one rule)
    val only = sys.env.get("GRAFT_AB_ONLY")
    def setArm(on: Boolean): Unit = {
      if (only.forall(_ == "driveragg"))
        graft.rules.BoundedKeyDriverAgg.ungroupedEnabled = on
      if (only.forall(_ == "scalar"))
        graft.rules.ScalarAggToWindow.enabled = on
      if (only.forall(_ == "semi"))
        graft.rules.SemiJoinThroughAgg.enabled = on
      if (only.contains("like"))
        graft.rules.FastLikeChain.enabled = on
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    // diagnostics: GRAFT_PROF=1 attaches a per-stage metrics listener,
    // GRAFT_EXPLAIN=1 prints the ON-arm executed plan after each A/B
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

    names.foreach { name =>
      val sql = queries.TpchVerbatim.texts(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }
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
      println(f"[abthq] $name%-7s on=${med(on.toSeq)}%7.1f ms  off=${med(off.toSeq)}%7.1f ms  " +
        f"ratio=${med(on.toSeq) / med(off.toSeq)}%.3f  " +
        f"on_runs=${on.map(t => f"$t%.0f").mkString(",")}  " +
        f"off_runs=${off.map(t => f"$t%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
