package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B (dev only): the fused distinct+HLL aggregate as ONE
  * ungrouped aggregation (global merge funnels through a single reducer)
  * vs the bucketed two-level shape (hash-bucket the exact key, fused
  * aggregate per bucket — each reducer merges a DISJOINT key slice in
  * parallel — then a tiny second level sums exact counts and
  * register-unions the HLLs). Same JVM, alternating runs, so machine
  * drift cancels. Run at sf0.1 and the sf1 evidence set: the single
  * reducer is PERF.md's flagged sf1 outlier.
  */
object BenchABDistinct {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "2"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    Tables.cacheMode = true

    import graft.functions.DistinctWithHll.{distinct_with_hll, hll_union}

    def fused(): DataFrame =
      Tables(spark, sfDir, "lineitem")
        .agg(distinct_with_hll(col("l_partkey"), col("l_suppkey")).as("d"))
        .select(col("d.n_exact").as("n_parts"), col("d.approx").as("approx_supps"))

    def bucketed(): DataFrame =
      Tables(spark, sfDir, "lineitem")
        .groupBy(pmod(hash(col("l_partkey")), lit(32)).as("b"))
        .agg(distinct_with_hll(col("l_partkey"), col("l_suppkey")).as("d"))
        .agg(sum(col("d.n_exact")).as("n_parts"),
          hll_union(col("d.hll")).as("approx_supps"))

    def time(fn: () => DataFrame): Double = {
      val df = fn()
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }


    // raw per-row floor: the same set+HLL updates over the cache's rows
    // via mapPartitions, partials merged driver-side — no aggregate
    // framework, no exchange. Isolates framework overhead per row.
    def rawLoop(): Long = {
      import graft.functions.DistinctWithHll
      val rdd = Tables(spark, sfDir, "lineitem")
        .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
        .queryExecution.toRdd
      val partials = rdd.mapPartitions { it =>
        val buf = new DistinctWithHll.Buffer(1 << 16)
        while (it.hasNext) {
          val r = it.next()
          if (!r.isNullAt(0)) buf.set.add(r.getLong(0))
          if (!r.isNullAt(1)) buf.hllAdd(r.getLong(1))
        }
        val out = new Array[Long](buf.set.size)
        var i = 0
        buf.set.foreach { v => out(i) = v; i += 1 }
        Iterator((out, buf.hll))
      }.collect()
      val all = new DistinctWithHll.LongSet(1 << 20)
      partials.foreach(_._1.foreach(all.add))
      all.size.toLong
    }

    // component probes: where does the fused wall-clock go?
    def floor(): DataFrame = // scan + ungrouped codegen agg, no sketch
      Tables(spark, sfDir, "lineitem").agg(count(lit(1)).as("n"))
    def hllOnly(): DataFrame = // Spark's codegen HLL++, same scan
      Tables(spark, sfDir, "lineitem")
        .agg(approx_count_distinct(col("l_suppkey"), 0.0040625).as("a"))
    def exactOnly(): DataFrame = // Catalyst 2-phase distinct aggregate
      Tables(spark, sfDir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n"))

    // columnar partial + parallel disjoint merge (plans/FusedDistinct)
    def columnar(): DataFrame =
      graft.functions.DistinctWithHll.exactWithHll(
        Tables(spark, sfDir, "lineitem"), "l_partkey", "l_suppkey", 32,
        mode = "columnar")

    // equality check first: every shape must produce identical output
    val a = fused().collect().head
    val b = bucketed().collect().head
    val c = columnar().collect().head
    println(s"fused=(${a.getLong(0)},${a.getLong(1)}) bucketed=(${b.getLong(0)},${b.getLong(1)})" +
      s" columnar=(${c.getLong(0)},${c.getLong(1)})" +
      s" equal=${a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) &&
        a.getLong(0) == c.getLong(0) && a.getLong(1) == c.getLong(1)}")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "fused" -> (() => fused()), "bucketed" -> (() => bucketed()),
      "columnar" -> (() => columnar()),
      "floor_count" -> (() => floor()), "hll_only" -> (() => hllOnly()),
      "exact_only" -> (() => exactOnly()))

    locally { // raw-loop floor, timed separately (returns a count, not a DF)
      (1 to 2).foreach(_ => rawLoop())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); rawLoop(); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"raw_maploop_median=${ts(ts.length / 2)}%.1fms (n=${rawLoop()})")
    }

    // shuffle.partitions is read at PLANNING time: re-time the exchange
    // variants with 32 reducers to size the parallel-merge win
    locally {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val vs: Seq[(String, () => DataFrame)] = Seq(
        "bucketed_32red" -> (() => bucketed()), "exact_only_32red" -> (() => exactOnly()))
      (1 to 3).foreach { _ => vs.foreach { case (_, f) => time(f) } }
      val ts = (1 to 9).map { _ => vs.map { case (n, f) => n -> time(f) } }
      val ms = vs.map { case (n, _) =>
        val s = ts.map(_.find(_._1 == n).get._2).sorted
        f"${n}=${s(s.length / 2)}%.1fms"
      }
      println(s"sf=$sfDir ${ms.mkString(" ")}")
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "2"))
    }
    (1 to 3).foreach { _ => variants.foreach { case (_, f) => time(f) } } // warm
    val times = (1 to 9).map { _ => variants.map { case (n, f) => n -> time(f) } }
    val medians = variants.map { case (n, _) =>
      val ts = times.map(_.find(_._1 == n).get._2).sorted
      f"${n}=${ts(ts.length / 2)}%.1fms"
    }
    println(s"sf=$sfDir ${medians.mkString(" ")}")

    // stage-level attribution for the two fused shapes: where does the
    // wall-clock sit — map-side update loop, exchange, or final merge?
    val stageInfo = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stageInfo.synchronized {
          stageInfo += ((s.stageInfo.stageId, s.stageInfo.numTasks,
            s.stageInfo.taskMetrics.executorRunTime,
            s.stageInfo.completionTime.getOrElse(0L) -
              s.stageInfo.submissionTime.getOrElse(0L)))
        }
    })
    Seq("fused" -> (() => fused()), "bucketed" -> (() => bucketed())).foreach {
      case (n, f) =>
        stageInfo.synchronized(stageInfo.clear())
        val df = f(); df.queryExecution.executedPlan
        df.collect()
        Thread.sleep(400)
        val lines = stageInfo.synchronized(stageInfo.toList).map {
          case (id, nt, run, wall) => s"stage$id tasks=$nt cpuSum=${run}ms wall=${wall}ms"
        }
        println(s"$n stages: ${lines.mkString(" | ")}")
    }
    spark.stop()
  }
}
