package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B over ClickBench texts on the warm clustered hits
  * cache (dev only): alternates ONE named runtime flag on/off within a
  * single JVM so VM phase drift cancels; reports per-query medians.
  *
  * Usage:
  *   SPARK_GRAFT_HITS_FACTOR=100 sbt "runMain graft.BenchABCb <flag> cb_qNN ..."
  * Flags: direct (DriverAgg.directStringArm), packeddict
  * (PackedAgg.dictKeysEnabled), packed (rules.PackedShuffleAgg.enabled),
  * bounded (rules.BoundedKeyDriverAgg.enabled).
  */
object BenchABCb {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "100").toLong
    val flagName = args.head
    val names = args.tail.toSeq
    val set: Boolean => Unit = flagName match {
      case "direct" => v => plans.DriverAgg.directStringArm = v
      case "packeddict" => v => plans.PackedAgg.dictKeysEnabled = v
      case "packedsel" => v => plans.PackedAgg.selectionFoldEnabled = v
      case "packed" => v => rules.PackedShuffleAgg.enabled = v
      case "bounded" => v => rules.BoundedKeyDriverAgg.enabled = v
      case "ungrouped" => v => rules.BoundedKeyDriverAgg.ungroupedEnabled = v
      case other => throw new IllegalArgumentException(s"unknown flag $other")
    }
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", "32")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    // GRAFT_HITS_DIR reuses an existing generated dir (cross-JVM pairing)
    val dir = sys.env.getOrElse("GRAFT_HITS_DIR",
      graft.sources.HitsFixture.ensureScaled(spark, factor))
    Tables.cacheMode = true
    Tables(spark, dir, "hits").createOrReplaceTempView("hits")
    spark.table("hits").count()
    val texts = queries.ClickBench.texts.toMap

    def timed(sql: String): Double = {
      val df = spark.sql(sql)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }
    names.foreach { name =>
      val sql = texts(name)
      set(true); (1 to 3).foreach(_ => timed(sql))
      set(false); (1 to 3).foreach(_ => timed(sql))
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 9).foreach { _ =>
        set(true); a += timed(sql)
        set(false); b += timed(sql)
      }
      val am = a.sorted.apply(a.length / 2); val bm = b.sorted.apply(b.length / 2)
      println(f"$name%-10s $flagName=on ${am}%7.1f ms  off ${bm}%7.1f ms  (${am / bm}%.2fx)")
    }
    set(true)
    spark.stop()
  }
}
