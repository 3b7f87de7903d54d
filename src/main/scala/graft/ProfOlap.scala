package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

object ProfOlap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
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

    val stageInfo = mutable.ArrayBuffer[(Int, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val st = s.stageInfo
        val tm = st.taskMetrics
        stageInfo += ((st.stageId, st.numTasks,
          tm.executorRunTime * 1000000 + 0)) // placeholder
        System.err.println(f"[stage ${st.stageId}] tasks=${st.numTasks} run=${tm.executorRunTime}ms " +
          f"cpu=${tm.executorCpuTime / 1000000}ms gc=${tm.jvmGCTime}ms " +
          f"deser=${tm.executorDeserializeTime}ms " +
          f"shWriteMB=${tm.shuffleWriteMetrics.bytesWritten / 1048576} " +
          f"shWriteTime=${tm.shuffleWriteMetrics.writeTime / 1000000}ms " +
          f"shReadMB=${tm.shuffleReadMetrics.remoteBytesRead / 1048576 + tm.shuffleReadMetrics.localBytesRead / 1048576}")
      }
    })

    for (name <- Seq("h2o_range_agg", "h2o_count_distinct")) {
      val fn = queries.OlapShapes.queries(name)
      (1 to 4).foreach(_ => fn(spark, sfDir).collect())
      stageInfo.clear()
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.collect()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300)
      println(f"==== $name%-22s wall=${wall}%7.1f ms")
      stageInfo.foreach { case (id, n, rt) =>
        println(f"  stage $id%4d tasks=$n%3d runTime=${rt}%6d ms")
      }
      val plan = df.queryExecution.executedPlan.toString
      println("  radixFinal=" + plan.contains("RadixFinalAgg") +
        " radixPartial=" + plan.contains("RadixPartialAgg") +
        " columnar=" + plan.linesIterator.find(_.contains("RadixPartialAgg")).getOrElse(""))
      plan.linesIterator.filter(l => l.contains("Radix") || l.contains("HashAggregate") ||
        l.contains("Exchange") || l.contains("InMemoryTableScan") || l.contains("ColumnarToRow"))
        .take(14).foreach(l => println("   " + l.take(160)))
    }
    spark.stop()
  }
}
