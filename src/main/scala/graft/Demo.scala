package graft

import graft.functions.{GraftFunctions, VectorFunctions}
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Minimal end-to-end usage sample of the public API — run with
  * `sbt "runMain graft.Demo"`. Doubles as a smoke check that the
  * library surface works outside the test harness.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._

    // salted skew join vs plain join
    val big = (1 to 1000).map(i => (if (i % 5 == 0) i.toLong else 7L, i)).toDF("k", "v")
    val small = (1L to 1000L).map(k => (k, s"d$k")).toDF("k", "name")
    println("salted rows = " + SkewJoin.saltedJoin(big, small, "k").count())
    println("plain rows  = " + big.join(small, Seq("k")).count())

    // extensions + SQL-registered parity functions
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    GraftFunctions.register(spark)
    println("sql l2 = " +
      spark.sql("SELECT l2_distance(array(3.0D,0.0D), array(0.0D,4.0D)) d").head.getDouble(0))

    // merge-into snapshot semantics
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val upd = Seq((2L, 99.0), (3L, 30.0)).toDF("k", "v")
    println("merged = " + graft.operators.MergeInto.upsert(base, upd, Seq("k"))
      .orderBy("k").collect().map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(","))

    // vector similarity over the embeddings table
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val top = e.crossJoin(broadcast(q))
      .select(col("vec_id"), VectorFunctions.cosine_similarity(col("embedding"), col("qv")).as("c"))
      .orderBy(col("c").desc).limit(3).collect()
    println("top3 = " + top.map(r => r.getLong(0)).mkString(","))
    spark.stop()
  }
}
