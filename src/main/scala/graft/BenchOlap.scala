package graft

import org.apache.spark.sql.SparkSession

/** Timings for the ClickBench / h2oai aggregation shapes (dev only —
  * pairs with `tools/bench_olap_duckdb.py`, which runs the identical
  * shared SQL through DuckDB on the same sf dir; both medians land in
  * PERF.md). Protocol mirrors Bench: warm passes, then median of 9
  * timed executions on a fresh DataFrame each run.
  */
object BenchOlap {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // NOT the headline bench's shuffle=2/AQE-off micro-tuning: these
    // shapes aggregate to tens of thousands..millions of groups, the
    // regime where reduce-side parallelism and AQE coalescing are the
    // correct posture (and what a warehouse runs) — shuffle width here
    // follows the tuned session defaults
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.cacheMode = true
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    // host-phase fingerprint, as in Bench: per-job scheduler latency
    // distinguishes a slow-phase run from a regression (PERF.md)
    def probeMs(): Double = {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => probe.count())
      (System.nanoTime() - t0) / 20e6
    }
    println(f"probe_job_ms_before=${probeMs()}%.1f")

    val names = Seq("cb_top_groups", "cb_filter_multi_agg", "cb_regex_key",
      "h2o_groupby_wide", "h2o_range_agg", "h2o_count_distinct",
      "cb_like_count", "cb_like_group_min", "cb_like_distinct", "job_star_min",
      "h2o_join_small", "h2o_join_medium", "h2o_join_left", "h2o_join_big",
      "cb_date_histogram")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    var tot = 0.0
    names.foreach { name =>
      val fn = queries.OlapShapes.queries(name)
      if (explain) {
        println(s"==== $name"); fn(spark, sfDir).explain("formatted")
      }
      (1 to 4).foreach(_ => fn(spark, sfDir).collect())
      val times = (1 to 9).map { _ =>
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val m = times(times.length / 2)
      tot += m
      println(f"$name%-24s ${m}%8.1f ms")
    }
    println(f"TOTAL ${tot}%8.1f ms")
    println(f"probe_job_ms_after=${probeMs()}%.1f")
    spark.stop()
  }
}
