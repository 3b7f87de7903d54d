package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of big-side rows share one key — classic skew
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 1L, i)).toDF("k", "v")
    val small = (1L to 2000L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val got = SkewJoin.saltedJoin(big, small, "k").agg(count(lit(1)), sum("v")).head()
    assert(got.getLong(0) == expected.getLong(0))
    assert(got.getLong(1) == expected.getLong(1))
  }

  test("salted aggregation equals plain aggregation") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 100 == 0) "rare" else "hot", i.toDouble)).toDF("k", "v")
    val expected = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = SkewJoin.saltedSumCount(df, "k", "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
  }

  test("salted join rejects join types that would duplicate outer rows") {
    import spark.implicits._
    val big = Seq((1L, 1)).toDF("k", "v")
    val small = Seq((1L, "d")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", joinType = "right_outer")
    }
    assert(e.getMessage.contains("saltedJoin"))
  }

  test("GraftExtensions applies its injections cleanly") {
    // a fresh in-process session would either reuse the suite session
    // (getOrCreate ignores new config) or stop the shared SparkContext on
    // cleanup, so apply the extension object directly and cross-check the
    // same builders through the session registry path
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT l2_distance(array(0.0D, 3.0D), array(4.0D, 0.0D)) d").head()
    assert(r.getDouble(0) == 5.0)
  }
}
