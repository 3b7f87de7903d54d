package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual subtrees of the TPC-DS towers over the
  * scaled fixture under the bench arm (warm cache, AQE off) — used to
  * attribute tower wall time to specific CTE/channel fragments.
  * Usage: GRAFT_DS_CACHE=1 sbt "runMain graft.DsProbe" [reads the
  * `name :: sql` lines from /tmp/ds_probe.sql]
  */
object DsProbe {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_DS_FACTOR", "10").toLong
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.sources.TpcdsFixture.ensureScaled(spark, factor)
    graft.sources.TpcdsFixture.tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    if (sys.env.get("GRAFT_DS_CACHE").contains("1")) {
      graft.sources.TpcdsFixture.tables.foreach { t =>
        spark.catalog.cacheTable(t)
        spark.table(t).count()
      }
    }
    val file = if (args.nonEmpty) args(0) else "/tmp/ds_probe.sql"
    scala.io.Source.fromFile(file).getLines().filter(_.contains(" :: ")).foreach { line =>
      val Array(name, sql) = line.split(" :: ", 2)
      val df = spark.sql(sql)
      df.collect() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[dsprobe] $name%-24s median=${ts(1)}%8.1f ms  runs=${
        ts.map(t => f"$t%.0f").mkString(",")}")
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        println(df.queryExecution.executedPlan.toString.take(3000))
      }
    }
    spark.stop()
  }
}
