package graft
import org.apache.spark.sql.SparkSession
/** Dev: plan + stage metrics for JOB shapes on the analyzed catalog. */
object JobPlan {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_IMDB_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]").config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_jobplan_wh_${
          java.util.UUID.randomUUID().toString.take(8)}")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "ERROR"))
    // GRAFT_IMDB_DIR reuses an existing generated dir (cross-JVM pairing)
    val dir = sys.env.getOrElse("GRAFT_IMDB_DIR",
      graft.sources.ImdbFixture.ensureScaled(spark, factor))
    graft.sources.ImdbFixture.tables.foreach { t =>
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = st.stageInfo; val tm = si.taskMetrics
        if (sys.env.contains("GRAFT_JOB_STAGES"))
          System.err.println(f"[stage ${si.stageId}] tasks=${si.numTasks} " +
            f"run=${tm.executorRunTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
            f"shWrMB=${tm.shuffleWriteMetrics.bytesWritten / 1048576} " +
            f"shRec=${tm.shuffleWriteMetrics.recordsWritten}")
      }
    })
    val texts = queries.JobSlice.texts.toMap
    args.foreach { name =>
      val sql = texts(name)
      (1 to 2).foreach(_ => spark.sql(sql).collect())
      Thread.sleep(200)
      System.err.println(s"---- $name timed")
      val t0 = System.nanoTime()
      val df = spark.sql(sql)
      df.collect()
      println(f"==== $name wall=${(System.nanoTime() - t0) / 1e6}%.1f ms")
      // per-operator row metrics: where the rows actually flow
      val finalPlan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      finalPlan.foreach { n =>
        val rows = n.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
        if (rows >= 0)
          println(f"[rows] ${n.nodeName}%-28s $rows%12d")
      }
      println(df.queryExecution.executedPlan.toString.take(7000))
    }
    spark.stop()
  }
}
