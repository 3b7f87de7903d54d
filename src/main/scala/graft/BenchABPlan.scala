package graft

import org.apache.spark.sql.SparkSession

/** A/B: how much of a shape's fresh-DataFrame wall time is Catalyst
  * analysis/optimization/physical planning vs actual execution (dev
  * evidence for PERF.md's floor decomposition — DuckDB re-plans per run
  * too, but its planner is ~1 ms, so on sub-200 ms shapes Spark's
  * planning cost is a visible share of the measured ratio while being
  * invariant at warehouse scale).
  *
  * Three timings per shape, interleaved same-JVM, median of 9:
  *   fresh  — build the DataFrame and collect (the BenchOlap protocol);
  *   plan   — build the DataFrame and force queryExecution.executedPlan
  *            only (no jobs run);
  *   reexec — collect() again on ONE pre-built DataFrame (planning done
  *            once; pure scheduling + execution).
  * fresh ≈ plan + reexec validates the decomposition.
  */
object BenchABPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("job_star_min", "h2o_join_small", "cb_date_histogram")
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
    Tables.cacheMode = true
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())

    def medianMs(n: Int)(body: => Unit): Double = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(n / 2)
    }

    // thqNN names decompose the verbatim TPC-H texts over the scaled
    // fixture (same registration as BenchTpchScale's warm arm)
    if (names.exists(_.startsWith("thq"))) {
      val factor = sys.env.getOrElse("SPARK_GRAFT_TPCH_FACTOR", "100").toLong
      val dir = graft.sources.TpchFixture.ensureScaled(spark, factor)
      graft.sources.TpchFixture.tables.foreach { t =>
        Tables(spark, dir, t).createOrReplaceTempView(t)
      }
    }

    names.foreach { name =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (name.startsWith("thq"))
          (s, _) => s.sql(queries.TpchVerbatim.texts(name))
        else queries.OlapShapes.queries(name)
      (1 to 4).foreach(_ => fn(spark, sfDir).collect()) // warm cache + JIT
      val prebuilt = fn(spark, sfDir)
      prebuilt.collect()
      val fresh = medianMs(9) { fn(spark, sfDir).collect() }
      val plan = medianMs(9) { fn(spark, sfDir).queryExecution.executedPlan }
      val reexec = medianMs(9) { prebuilt.collect() }
      println(f"[planshare] $name%-20s fresh=$fresh%7.1f ms  plan=$plan%7.1f ms" +
        f"  reexec=$reexec%7.1f ms  plan_share=${100 * plan / fresh}%4.1f%%")
    }
    spark.stop()
  }
}
