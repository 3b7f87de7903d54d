package graft

import org.apache.spark.sql.SparkSession

/** Micro A/B: multi-wildcard LIKE ('%a%b%') vs an equivalent indexOf
  * chain on the warm x100 orders fixture — sizes the thq13 lever
  * (Spark keeps '%a%b%' as a compiled java.util.regex match per row;
  * LikeSimplification only rewrites single-wildcard forms).
  *
  * Usage: SPARK_GRAFT_TPCH_FACTOR=100 sbt "runMain graft.BenchABLike"
  */
object BenchABLike {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_TPCH_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.sources.TpchFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    Tables(spark, dir, "orders").createOrReplaceTempView("orders")

    val like = "SELECT count(*) AS n FROM orders " +
      "WHERE o_comment NOT LIKE '%special%requests%'"
    // equivalent: 'special' occurs and 'requests' occurs after it
    val chain = "SELECT count(*) AS n FROM orders WHERE NOT (" +
      "instr(o_comment, 'special') > 0 AND " +
      "instr(substring(o_comment, instr(o_comment, 'special') + 7), 'requests') > 0)"
    def med(q: String): (Double, Long) = {
      var n = 0L
      (1 to 3).foreach(_ => n = spark.sql(q).collect()(0).getLong(0))
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(q).collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      (ts(ts.length / 2), n)
    }
    val (tl, nl) = med(like)
    val (tc, nc) = med(chain)
    require(nl == nc, s"count mismatch: $nl vs $nc")
    println(f"[ablike] like=$tl%.1f ms  chain=$tc%.1f ms  ratio=${tc / tl}%.3f  rows_kept=$nl")
    spark.stop()
  }
}
