package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler for the h2o board shapes at factor scale: per stage,
  * prints task count, run/cpu/GC time and shuffle volume+time, plus the
  * executed plan under GRAFT_EXPLAIN=1 — attributes wall-clock between
  * the aggregation/window loop, the exchange, and the dispatch floor for
  * the board's weak rows (g08 grouped top-2, g02/g09 string-key
  * exchanges). Not part of the driver protocol — a diagnostic main.
  *
  * Usage: GRAFT_H2O_DIR=... SPARK_GRAFT_H2O_FACTOR=100
  *        sbt "runMain graft.ProfH2o h2o_g08 ..."
  */
object ProfH2o {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_H2O_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())

    val dir = sys.env.getOrElse("GRAFT_H2O_DIR",
      graft.sources.H2oFixture.ensureScaled(spark, factor))
    println(s"scaled_dir=$dir factor=$factor")
    Tables.cacheMode = true
    graft.sources.H2oFixture.tables.foreach { t =>
      val view = if (t == "x") "h2o_x" else t
      Tables(spark, dir, t).createOrReplaceTempView(view)
    }

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
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

    // arbitrary runtime SQL confs for A/Bs: GRAFT_SQL_CONF="k=v;k=v"
    sys.env.get("GRAFT_SQL_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })

    val textMap = queries.H2oBoard.texts.toMap
    val names = if (args.nonEmpty) args.toSeq else Seq("h2o_g08")
    names.foreach { name =>
      val sql = textMap(name)
      def once(): Unit = { spark.sql(sql).queryExecution.toRdd.count(): Unit }
      (1 to 3).foreach(_ => once())
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        println(spark.sql(sql).queryExecution.executedPlan.toString.take(6000))
      }
      val t0 = System.nanoTime()
      once()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300)
      println(f"==== $name%-10s wall=${wall}%7.1f ms")
    }
    spark.stop()
  }
}
