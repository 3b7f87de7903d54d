package graft
import org.apache.spark.sql.SparkSession
/** Dev: physical plan of TPC-DS tower queries on the bench arm. */
object DsPlan {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_DS_FACTOR", "2").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]").config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.sources.TpcdsFixture.ensureScaled(spark, factor)
    graft.sources.TpcdsFixture.tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      spark.catalog.cacheTable(t); spark.table(t).count()
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = st.stageInfo; val tm = si.taskMetrics
        if (sys.env.contains("GRAFT_DS_STAGES"))
          System.err.println(f"[stage ${si.stageId}] tasks=${si.numTasks} " +
            f"run=${tm.executorRunTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
            f"gc=${tm.jvmGCTime}ms " +
            f"shWrMB=${tm.shuffleWriteMetrics.bytesWritten / 1048576} " +
            f"shWrT=${tm.shuffleWriteMetrics.writeTime / 1000000}ms " +
            f"shRdMB=${tm.shuffleReadMetrics.localBytesRead / 1048576}")
      }
    })
    args.foreach { name =>
      println(s"==== $name")
      val df = spark.sql(queries.TpcdsVerbatim.texts(name))
      if (!sys.env.contains("GRAFT_DS_STAGES"))
        println(df.queryExecution.executedPlan.toString.take(12000))
      else {
        (1 to 2).foreach(_ => spark.sql(queries.TpcdsVerbatim.texts(name)).collect())
        Thread.sleep(300)
        System.err.println(s"---- $name timed run follows")
        val t0 = System.nanoTime()
        spark.sql(queries.TpcdsVerbatim.texts(name)).collect()
        println(f"==== $name wall=${(System.nanoTime() - t0) / 1e6}%.1f ms")
        Thread.sleep(300)
      }
    }
    spark.stop()
  }
}
