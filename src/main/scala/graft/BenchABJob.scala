package graft

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for the fused int-key join chain
  * (rules/IntChainJoinRule) over the JOB deep-join families.
  * BenchJob's environment (ANALYZE'd catalog tables, CBO join reorder,
  * AQE on, 10 MB broadcast threshold), per query 2 warmups per arm
  * then A/B alternating, median of 5 per arm.
  *
  * Usage: SPARK_GRAFT_IMDB_FACTOR=100 sbt "runMain graft.BenchABJob job_29a ..."
  */
object BenchABJob {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_IMDB_FACTOR", "100").toLong
    val names = if (args.nonEmpty) args.toSeq
      else Seq("job_29a", "job_26c", "job_30b")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_BROADCAST_THRESHOLD", (10L << 20).toString))
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_jobab_wh_${
          java.util.UUID.randomUUID().toString.take(8)}")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())

    val dir = graft.sources.ImdbFixture.ensureScaled(spark, factor)
    graft.sources.ImdbFixture.tables.foreach { t =>
      spark.sql(s"CREATE TABLE IF NOT EXISTS $t USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    }

    val textMap = queries.JobSlice.texts.toMap
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    names.foreach { name =>
      val sql = textMap(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }
      IntChainJoinRule_set(true); (1 to 2).foreach(_ => once())
      IntChainJoinRule_set(false); (1 to 2).foreach(_ => once())
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 5).foreach { _ =>
        IntChainJoinRule_set(true); on += once()
        IntChainJoinRule_set(false); off += once()
      }
      IntChainJoinRule_set(true)
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        val dfx = spark.sql(sql)
        dfx.collect()
        println(s"=== plan for $name (ON arm) ===")
        println(dfx.queryExecution.executedPlan.toString.take(9000))
      }
      println(f"[abjob] $name%-9s on=${med(on.toSeq)}%8.1f ms  off=${med(off.toSeq)}%8.1f ms  " +
        f"ratio=${med(on.toSeq) / med(off.toSeq)}%.3f  " +
        f"on_runs=${on.map(t => f"$t%.0f").mkString(",")}  " +
        f"off_runs=${off.map(t => f"$t%.0f").mkString(",")}")
    }
    spark.stop()
  }

  private def IntChainJoinRule_set(on: Boolean): Unit = {
    graft.rules.IntChainJoinRule.enabled = on
  }
}
