package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev profiler for the headline bench: per query, counts Spark jobs,
  * stages and tasks and sums task time, to attribute wall-clock between
  * data-path work and per-job dispatch floor (PERF.md). Not part of the
  * driver protocol — a diagnostic main.
  */
object BenchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) taskTimeMs += t.taskInfo.duration
      }
    }
    spark.sparkContext.addSparkListener(listener)

    Bench.headline.foreach { case (name, fn) =>
      (1 to 3).foreach(_ => fn(spark, sfDir).collect()) // warm
      Thread.sleep(300) // let the listener bus drain
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan
      df.collect()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let the listener bus drain
      println(f"$name%-28s wall=${wall}%7.1fms jobs=$jobs stages=$stages tasks=$tasks%3d taskTime=${taskTimeMs}%5dms")
    }
    spark.stop()
  }
}
