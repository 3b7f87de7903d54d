package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B (dev only) for the r14 levers over the h2o x-scale
  * fixture: the string-key broadcast join probe (StringBcastJoinRule)
  * on h2o_j04, and the ungrouped driver-finalized aggregate
  * (BoundedKeyDriverAgg.ungroupedEnabled) on the join summaries + the
  * bare count+sum scan-consume microshape. Same JVM, alternating
  * iterations — host drift cancels (PERF.md attribution protocol).
  *
  * Usage: GRAFT_H2O_DIR=... SPARK_GRAFT_H2O_FACTOR=100 \
  *   sbt "runMain graft.BenchABStrJoin"
  */
object BenchABStrJoin {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_H2O_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
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
    val dir = sys.env.getOrElse("GRAFT_H2O_DIR",
      graft.sources.H2oFixture.ensureScaled(spark, factor))
    println(s"dir=$dir")
    graft.sources.H2oFixture.tables.foreach { t =>
      val view = if (t == "x") "h2o_x" else t
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(view)
      if (!sys.env.get("GRAFT_DS_CACHE").contains("0")) {
        spark.catalog.cacheTable(view)
        spark.table(view).count()
      }
    }
    println(f"probe_job_ms=${probeMs()}%.1f")

    val texts = queries.H2oBoard.texts.toMap
    val shapes: Seq[(String, String)] = Seq(
      "j04" -> texts("h2o_j04"),
      "j02" -> texts("h2o_j02"),
      "scan_count_sum" ->
        "SELECT count(*) AS n, round(sum(v1) * 1000) / 1000 AS s FROM h2o_x")
    val toggles: Seq[(String, Boolean => Unit)] = Seq(
      "str_join" -> (v => rules.StringBcastJoinRule.enabled = v),
      "ungrouped" -> (v => rules.BoundedKeyDriverAgg.ungroupedEnabled = v))

    def timed(sql: String): Double = {
      val df = spark.sql(sql)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e6
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)

    shapes.foreach { case (sname, sql) =>
      toggles.foreach { case (tname, set) =>
        try {
          set(true); (1 to 2).foreach(_ => timed(sql))
          set(false); (1 to 2).foreach(_ => timed(sql))
          val a = scala.collection.mutable.ArrayBuffer.empty[Double]
          val b = scala.collection.mutable.ArrayBuffer.empty[Double]
          (1 to 5).foreach { _ =>
            set(true); a += timed(sql)
            set(false); b += timed(sql)
          }
          println(f"[ab] $sname%-16s $tname%-10s on=${med(a.toSeq)}%7.1f " +
            f"off=${med(b.toSeq)}%7.1f ratio=${med(a.toSeq) / med(b.toSeq)}%.3f")
        } finally set(true)
      }
    }
    println(f"probe_job_ms_after=${probeMs()}%.1f")
    spark.stop()
  }
}
