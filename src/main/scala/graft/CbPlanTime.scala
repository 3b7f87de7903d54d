package graft

import org.apache.spark.sql.SparkSession

/** Dev: split wall into plan/execute for warm CB texts. */
object CbPlanTime {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_HITS_FACTOR", "100").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]").config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    val dir = graft.sources.HitsFixture.ensureScaled(spark, factor)
    Tables.cacheMode = true
    Tables(spark, dir, "hits").createOrReplaceTempView("hits")
    spark.table("hits").count()
    val texts = queries.ClickBench.texts.toMap
    args.foreach { name =>
      val sql = texts(name)
      (1 to 4).foreach(_ => spark.sql(sql).collect())
      (1 to 5).foreach { _ =>
        val t0 = System.nanoTime()
        val df = spark.sql(sql)
        val plan = df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        println(f"[plantime] $name plan=${(t1 - t0) / 1e6}%7.1f ms exec=${(t2 - t1) / 1e6}%7.1f ms")
      }
    }
    spark.stop()
  }
}
