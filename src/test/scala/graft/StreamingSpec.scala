package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamingFacade
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming façade as a real Structured Streaming query
  * (file source → watermarked agg → memory sink) and cross-checks the
  * result against the identical batch aggregation.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def eventsStreamDir(): String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    Files.copy(Paths.get(s"$sf/events.parquet"), Paths.get(s"$dir/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming tumbling counts equal the batch result") {
    val dir = eventsStreamDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val toTs = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val stream = toTs(spark.readStream.schema(schema).parquet(dir))
    val q = StreamingFacade.tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_tumbling").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_tumbling")
        .orderBy("bucket", "event_type").collect()
      val batch = StreamingFacade.tumblingCounts(Tables(spark, sf, "events"))
        .orderBy("bucket", "event_type").collect()
      assert(streamed.length == batch.length && streamed.nonEmpty)
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user state in update mode") {
    val dir = eventsStreamDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingFacade.statefulUserCounts(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_stateful").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("graft_stateful")
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      val batch = Tables(spark, sf, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming session stats run with watermarked append state") {
    val dir = eventsStreamDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = StreamingFacade.sessionStats(stream)
      .select(col("user_id"), col("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sessions").start()
    try {
      q.processAllAvailable()
      // append mode only emits watermark-closed sessions; with a single
      // batch the watermark hasn't advanced past the last events, so just
      // assert the query ran and the plan is a valid streaming session agg
      assert(q.lastProgress != null)
    } finally q.stop()
  }
}
