package graft

import graft.functions.ApproxTopKSketch.approx_top_k
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxTopKSpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact within capacity: matches the count+window rewrite") {
    import spark.implicits._
    val df = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d")
    val got = df.toDF("v").agg(approx_top_k(col("v"), 3)).head().getString(0)
    assert(got == "a:50,b:30,c:20")
  }

  test("heavy hitters survive eviction beyond sketch capacity") {
    import spark.implicits._
    // k=2 → capacity 8; 200 distinct light keys force constant eviction
    val heavy = Seq.fill(500)("HOT") ++ Seq.fill(300)("WARM")
    val noise = (1 to 200).flatMap(i => Seq.fill(2)(s"n$i"))
    val got = scala.util.Random.shuffle(heavy ++ noise).toDF("v")
      .coalesce(1) // single partition: deterministic single-sketch path
      .agg(approx_top_k(col("v"), 2)).head().getString(0)
    val top = got.split(",").map(_.split(":")(0)).toSeq
    assert(top.take(2).toSet == Set("HOT", "WARM"), got)
  }

  test("count ties on numeric children break in numeric order, not string order") {
    import spark.implicits._
    // counts tie at 1; lexicographic order of the rendered values would
    // put "10" before "2" — the child is numeric, so 2 must sort first
    val got = Seq(10, 2, 30).toDF("v")
      .coalesce(1)
      .agg(approx_top_k(col("v"), 3)).head().getString(0)
    assert(got == "2:1,10:1,30:1", got)
  }

  test("null inputs are skipped") {
    import spark.implicits._
    val got = Seq(Some("x"), None, Some("x"), Some("y"), None).toDF("v")
      .agg(approx_top_k(col("v"), 2)).head().getString(0)
    assert(got == "x:2,y:1")
  }
}
