package graft

import graft.functions.Strftime
import org.scalatest.funsuite.AnyFunSuite

class StrftimeSpec extends AnyFunSuite {
  test("common directives translate") {
    assert(Strftime.toJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(Strftime.toJava("%a %d %b %Y") == "EEE dd MMM yyyy")
    assert(Strftime.toJava("%I:%M %p") == "hh:mm a")
    assert(Strftime.toJava("%Y%j") == "yyyyDDD")
  }
  test("literal letters are quoted") {
    assert(Strftime.toJava("%Yy") == "yyyy'y'")
    assert(Strftime.toJava("T%H") == "'T'HH")
  }
  test("percent escape and unknown directive") {
    assert(Strftime.toJava("%%d") == "%'d'")
    assert(Strftime.toJava("%%%d") == "%dd")
    intercept[IllegalArgumentException](Strftime.toJava("%Q"))
  }
  test("formats agree with reference semantics end to end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq("2024-03-05 07:08:09").toDF("s")
      .select(date_format(to_timestamp($"s"), Strftime.toJava("%Y-%m-%d %H:%M:%S")).as("f"),
        date_format(to_timestamp($"s"), Strftime.toJava("%a %b %d %p")).as("g"))
      .head()
    assert(got.getString(0) == "2024-03-05 07:08:09")
    assert(got.getString(1) == "Tue Mar 05 AM")
  }
}
