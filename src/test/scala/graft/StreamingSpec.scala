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
    // the fixture stores ts as TIMESTAMP(MICROS, NTZ); read it as such
    // and normalize to the session-zoned type the facade expects
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val toTs = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("ts", col("ts").cast("timestamp"))

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
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
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

  test("watermark drops late data from append-mode finalized windows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_late").toString
    def write(name: String, rows: Seq[(Long, String, Long, Double)]): Unit =
      rows.toDF("event_id", "event_type", "tsm", "value")
        .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
          lit(1L).as("user_id"), col("event_type"), col("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/$name")

    val h = 3600000000L // one hour in micros
    // batch A: two events in the [10:00,11:00) window + one at 12:30 that
    // pushes the watermark (delay 10 min) past the window's end
    write("a", Seq((1L, "a", 10L * h, 1.0), (2L, "a", 10L * h + h / 2, 1.0),
      (3L, "a", 12L * h + h / 2, 1.0)))

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("recursiveFileLookup", "true")
      .parquet(dir)
    val q = StreamingFacade.tumblingCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_late").start()
    try {
      q.processAllAvailable()
      // batch B: one event at 10:30 — LATE, behind the 12:20 watermark —
      // plus a fresh far-ahead event so the [10,11) window finalizes
      write("b", Seq((4L, "a", 10L * h + h / 2, 99.0), (5L, "a", 20L * h, 1.0)))
      q.processAllAvailable()
      val ten = spark.table("graft_late")
        .filter(col("bucket") === timestamp_micros(lit(10L * h))).collect()
      assert(ten.length == 1, s"expected one finalized [10,11) row, got ${ten.toSeq}")
      // 2, not 3: the late event must not have re-entered the window
      assert(ten.head.getAs[Long]("n") == 2L, s"late event leaked in: ${ten.head}")
    } finally q.stop()
  }

  test("stateful sessionizer (flatMapGroupsWithState) matches batch lag-gap sessions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess").toString
    val h = 3600000000L
    // user 7: sessions [1:00..1:10] (3 events) and [3:00] (1 event);
    // user 8: one session [1:05..1:20] (2 events). The 9:00-10:00 events
    // arrive in batch B and push the watermark far enough that every
    // earlier session times out (end+gap << watermark).
    def write(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("event_id", "user_id", "tsm")
        .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
          col("user_id"), lit("a").as("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    write("a", Seq(
      (1L, 7L, 1L * h), (2L, 7L, 1L * h + 300000000L), (3L, 7L, 1L * h + 600000000L),
      (4L, 7L, 3L * h),
      (5L, 8L, 1L * h + 300000000L), (6L, 8L, 1L * h + 1200000000L)))

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("recursiveFileLookup", "true")
      .parquet(dir)
    val q = StreamingFacade.sessionizeWithState(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_state_sessions").start()
    try {
      q.processAllAvailable()
      write("b", Seq((7L, 9L, 9L * h), (8L, 9L, 10L * h)))
      q.processAllAvailable()
      // one more no-op-advancing batch so event-time timeouts fire for
      // every session that ended before the 9:50 watermark
      write("c", Seq((9L, 9L, 11L * h)))
      q.processAllAvailable()
      val got = spark.table("graft_state_sessions")
        .filter(col("user_id").isin(7L, 8L))
        .orderBy("user_id", "start_micros")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val expected = Seq(
        (7L, 1L * h, 1L * h + 600000000L, 3L),
        (7L, 3L * h, 3L * h, 1L),
        (8L, 1L * h + 300000000L, 1L * h + 1200000000L, 2L))
      assert(got.toSeq == expected,
        s"closed sessions mismatch:\n got=${got.toSeq}\n exp=$expected")
    } finally q.stop()
  }

  test("stateful sessionizer absorbs an out-of-order event before the open start") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ooo").toString
    val h = 3600000000L
    def write(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("event_id", "user_id", "tsm")
        .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
          col("user_id"), lit("a").as("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch A: user 7 at 2:00 (watermark after A = 1:50)
    write("a", Seq((1L, 7L, 2L * h)))

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("recursiveFileLookup", "true")
      .parquet(dir)
    val q = StreamingFacade.sessionizeWithState(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ooo_sessions").start()
    try {
      q.processAllAvailable()
      // batch B: user 7 at 1:52 — accepted (>= 1:50 watermark), BEFORE the
      // open session's start, within the 30-min gap: must extend start
      write("b", Seq((2L, 7L, 2L * h - 480000000L)))
      q.processAllAvailable()
      // advance the watermark far past end+gap so the session times out
      write("c", Seq((3L, 9L, 9L * h)))
      q.processAllAvailable()
      write("d", Seq((4L, 9L, 11L * h)))
      q.processAllAvailable()
      val got = spark.table("graft_ooo_sessions")
        .filter(col("user_id") === 7L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == Seq((7L, 2L * h - 480000000L, 2L * h, 2L)),
        s"out-of-order start not absorbed: ${got.toSeq}")
    } finally q.stop()
  }

  test("stateful sessionizer merges multiple stragglers into ONE earlier session") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ooo2").toString
    val h = 3600000000L
    val m = 60000000L
    def write(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("event_id", "user_id", "tsm")
        .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
          col("user_id"), lit("a").as("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$dir/$name")
    // one batch, delivered out of event-time order: 2:00 plus two events
    // at 0:30/0:31 — more than a gap earlier, 1 minute apart. They must
    // close as ONE 2-event session, not two singletons. (Cross-batch
    // stragglers this old are cut by Spark's late-row filter before the
    // operator, so the within-batch delivery is the reachable case.)
    write("a", Seq((1L, 7L, 2L * h), (2L, 7L, 30L * m), (3L, 7L, 31L * m)))

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").option("recursiveFileLookup", "true")
      .parquet(dir)
    val q = StreamingFacade.sessionizeWithState(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_ooo2_sessions").start()
    try {
      q.processAllAvailable()
      write("c", Seq((4L, 9L, 9L * h)))
      q.processAllAvailable()
      write("d", Seq((5L, 9L, 11L * h)))
      q.processAllAvailable()
      val got = spark.table("graft_ooo2_sessions")
        .filter(col("user_id") === 7L)
        .orderBy("start_micros")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == Seq((30L * m, 31L * m, 2L), (2L * h, 2L * h, 1L)),
        s"stragglers not merged: ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming session stats run with watermarked append state") {
    val dir = eventsStreamDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
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
