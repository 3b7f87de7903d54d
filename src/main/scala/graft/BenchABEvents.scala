package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B (dev only): events cached as ONE sorted partition vs
  * hash-clustered 4 partitions, for the tumbling + sessionize queries —
  * same JVM so machine drift cancels.
  */
object BenchABEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = false
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())

    val raw = Tables.normalizeEventsTs(spark.read.parquet(s"$sfDir/events.parquet"))
    val ev1 = raw.coalesce(1)
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id")).cache()
    ev1.count()
    val ev4 = raw.repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id")).cache()
    ev4.count()

    def tumbling(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
        .orderBy(col("bucket"), col("event_type"))
        .limit(50)

    // UTC hour-floor as pure micros arithmetic (identical result in a
    // UTC session; no per-row zone lookup)
    def tumblingArith(df: DataFrame): DataFrame =
      df.groupBy(expr(
            "timestamp_micros((unix_micros(ts) div 3600000000) * 3600000000)").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
        .orderBy(col("bucket"), col("event_type"))
        .limit(50)

    def sessionize(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      df.withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev"))) > 1800000000L, 1).otherwise(0))
        .filter(col("new_s") === 1)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("sessions"))
        .orderBy(col("sessions").desc, col("user_id"))
        .limit(10)
    }

    def timed(mk: => DataFrame): Double = {
      val df = mk
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }

    // per-query floor: a trivial single-task DataFrame collect (hot),
    // under each explain-string mode (the plan description is built
    // SYNCHRONOUSLY inside withNewExecutionId on every execution)
    for (mode <- Seq("formatted", "simple", "formatted")) {
      spark.conf.set("spark.sql.ui.explainMode", mode)
      val t = (1 to 15).map { _ =>
        timed(spark.range(0, 16, 1, 1).agg(sum(col("id")).as("s")))
      }.sorted
      val t2 = (1 to 15).map { _ => timed(ev1.groupBy().count()) }.sorted
      println(f"[$mode%9s] floor median=${t(7)}%6.1fms min=${t.head}%6.1f; " +
        f"ev1Count median=${t2(7)}%6.1fms min=${t2.head}%6.1f")
    }
    spark.conf.set("spark.sql.ui.explainMode", "simple")

    for ((qname, q) <- Seq[(String, DataFrame => DataFrame)](
        "tumbling" -> tumbling, "tumb_arith" -> tumblingArith,
        "sessionize" -> sessionize)) {
      (1 to 4).foreach { _ => timed(q(ev1)); timed(q(ev4)) }
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 11).foreach { _ => a += timed(q(ev1)); b += timed(q(ev4)) }
      println(f"$qname%-12s 1part=${a.sorted.apply(a.length / 2)}%6.1fms " +
        f"4part=${b.sorted.apply(b.length / 2)}%6.1fms " +
        f"(1p min=${a.min}%6.1f, 4p min=${b.min}%6.1f)")
    }
    // plan shape check: 1-partition variants must plan no Exchange
    for ((qname, q) <- Seq[(String, DataFrame => DataFrame)](
        "tumbling" -> tumbling, "sessionize" -> sessionize)) {
      val p = q(ev1).queryExecution.executedPlan.toString
      println(s"$qname 1part exchanges=${"Exchange".r.findAllIn(p).size} " +
        s"sorts=${"\\bSort\\b".r.findAllIn(p).size}")
    }
    spark.stop()
  }
}
