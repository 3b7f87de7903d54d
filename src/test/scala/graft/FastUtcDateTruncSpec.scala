package graft

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential check of the UTC date_trunc fold (rules/FastUtcDateTrunc):
  * the rewritten sub-day units must agree with java.time truncation for
  * every probe — including pre-epoch timestamps, where a naive `%` would
  * truncate toward zero instead of flooring — and the plan must show the
  * arithmetic form (no TruncTimestamp) for rewritten units while
  * calendar units keep the built-in path.
  */
class FastUtcDateTruncSpec extends AnyFunSuite {
  import SparkTestSession._

  private val probes = Seq(
    "1996-03-15 13:47:23.123456",
    "1970-01-01 00:00:00.000001",
    "1969-12-31 23:59:59.999999", // pre-epoch: floor, not trunc-toward-zero
    "1950-06-05 07:08:09.5",
    "2001-12-31 23:00:00.0")

  private def expected(s: String, unit: ChronoUnit): Instant =
    ZonedDateTime.of(java.time.LocalDateTime.parse(s.replace(' ', 'T')), ZoneOffset.UTC)
      .toInstant.truncatedTo(unit)

  test("sub-day date_trunc matches java.time truncation (incl. pre-epoch)") {
    import spark.implicits._
    val df = probes.toDF("s").select(col("s"), col("s").cast("timestamp").as("ts"))
    for ((unit, chrono) <- Seq(
        "second" -> ChronoUnit.SECONDS, "minute" -> ChronoUnit.MINUTES,
        "hour" -> ChronoUnit.HOURS, "day" -> ChronoUnit.DAYS)) {
      val got = df.select(col("s"), date_trunc(unit, col("ts")).as("t"))
        .collect().map(r => r.getString(0) -> r.getTimestamp(1).toInstant).toMap
      for (p <- probes)
        assert(got(p) == expected(p, chrono), s"unit=$unit probe=$p")
    }
  }

  test("rewritten units plan arithmetic; calendar units keep TruncTimestamp") {
    val ev = Tables(spark, sf, "events")
    val hourPlan = ev.select(date_trunc("hour", col("ts")).as("b"))
      .queryExecution.optimizedPlan.toString
    assert(hourPlan.contains("unix_micros") && hourPlan.contains("pmod"), hourPlan)
    val monthPlan = ev.select(date_trunc("month", col("ts")).as("b"))
      .queryExecution.optimizedPlan.toString
    assert(!monthPlan.contains("unix_micros") && monthPlan.contains("date_trunc"), monthPlan)
  }
}
