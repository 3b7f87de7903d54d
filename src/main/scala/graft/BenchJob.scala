package graft

import org.apache.spark.sql.SparkSession

/** JOB slice as a PERFORMANCE suite — the 12 verbatim join-order shapes
  * (queries/JobSlice.scala) over a factor-scaled ImdbFixture, paired
  * same-hour vs DuckDB (tools/bench_job_duckdb.py reads the dir this
  * main prints + tools/job_duck_texts.json from DumpJobTexts).
  *
  * Protocol matches BenchClickBench (probe gate, 2 warmups + median of
  * 5, warm cache ON by default; GRAFT_DS_CACHE=0 → cold parquet) with
  * ONE deliberate difference: AQE is ON here (SPARK_GRAFT_AQE=false
  * flips it off). JOB is the join-ordering benchmark — 5-9 table
  * star/snowflake joins whose static plans mis-order badly without
  * runtime stats (an AQE-off attempt wedged on job_13b's static order),
  * and runtime replanning is exactly the engine's answer to join
  * ordering (GraftSession.tune ships AQE on).
  *
  * Usage: SPARK_GRAFT_IMDB_FACTOR=20 sbt "runMain graft.BenchJob [job_NNx ...]"
  */
object BenchJob {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_IMDB_FACTOR", "20").toLong
    val names = if (args.nonEmpty) args.toSeq else queries.JobSlice.texts.map(_._1)
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    def probeMs(): Double = {
      val t = (1 to 40).map { _ =>
        val t0 = System.nanoTime(); probe.count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      t(t.length / 2)
    }
    val dir = graft.sources.ImdbFixture.ensureScaled(spark, factor)
    println(s"scaled_dir=$dir factor=$factor")
    graft.sources.ImdbFixture.tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
      if (!sys.env.get("GRAFT_DS_CACHE").contains("0")) {
        spark.catalog.cacheTable(t)
        spark.table(t).count()
      }
    }
    locally {
      val gate = sys.env.getOrElse("SPARK_GRAFT_PROBE_GATE_MS", "22").toDouble
      var tries = 0
      var p = probeMs()
      while (gate > 0 && p > gate && tries < 20) {
        println(f"[probe-gate] degraded phase: $p%.1f ms/job > $gate%.0f — waiting 30s")
        Thread.sleep(30000)
        tries += 1
        p = probeMs()
      }
      println(f"probe_job_ms_before=$p%.1f")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val textMap = queries.JobSlice.texts.toMap
    names.foreach { name =>
      val sql = textMap(name)
      (1 to 2).foreach(_ => spark.sql(sql).collect())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[jobbench] $name%-9s median=${med(ts)}%8.1f ms  runs=${
        ts.map(t => f"$t%.0f").mkString(",")}")
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        val dfx = spark.sql(sql)
        dfx.collect()
        println(dfx.queryExecution.executedPlan.toString.take(5000))
      }
    }
    println(f"probe_job_ms_after=${probeMs()}%.1f")
    spark.stop()
  }
}
