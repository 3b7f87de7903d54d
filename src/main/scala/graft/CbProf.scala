package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler for ClickBench texts on the warm clustered hits cache:
  * per stage, prints task count, run/cpu/GC time and shuffle volume, to
  * attribute wall-clock between the scan/aggregate loop, exchanges, and
  * the dispatch floor. Not part of the driver protocol.
  *
  * Usage: SPARK_GRAFT_HITS_FACTOR=100 sbt "runMain graft.CbProf cb_q13"
  */
object CbProf {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "100").toLong
    val b0 = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
    // ad-hoc config experiments: GRAFT_EXTRA_CONF="k=v;k=v"
    val spark = sys.env.get("GRAFT_EXTRA_CONF").map(_.split(";"))
      .getOrElse(Array.empty[String])
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "ERROR"))
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    val dir = graft.sources.HitsFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    Tables(spark, dir, "hits").createOrReplaceTempView("hits")
    spark.table("hits").count()

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val st = s.stageInfo
        val tm = st.taskMetrics
        System.err.println(f"[stage ${st.stageId}] tasks=${st.numTasks} " +
          f"run=${tm.executorRunTime}ms cpu=${tm.executorCpuTime / 1000000}ms " +
          f"gc=${tm.jvmGCTime}ms deser=${tm.executorDeserializeTime}ms " +
          f"resSer=${tm.resultSerializationTime}ms " +
          f"shWriteMB=${tm.shuffleWriteMetrics.bytesWritten / 1048576} " +
          f"shWriteTime=${tm.shuffleWriteMetrics.writeTime / 1000000}ms " +
          f"shReadMB=${tm.shuffleReadMetrics.remoteBytesRead / 1048576 +
            tm.shuffleReadMetrics.localBytesRead / 1048576}")
      }
    })

    val texts = queries.ClickBench.texts.toMap
    args.foreach { name =>
      val sql = texts(name)
      (1 to 4).foreach(_ => spark.sql(sql).collect())
      Thread.sleep(300)
      System.err.println(s"---- $name timed run follows")
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300)
      println(f"==== $name%-10s wall=${wall}%7.1f ms")
    }
    spark.stop()
  }
}
