package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B (dev only): the fused distinct+HLL aggregate as ONE
  * ungrouped aggregation (global merge funnels through a single reducer)
  * vs the bucketed two-level shape (hash-bucket the exact key, fused
  * aggregate per bucket — each reducer merges a DISJOINT key slice in
  * parallel — then a tiny second level sums exact counts and
  * register-unions the HLLs). Same JVM, alternating runs, so machine
  * drift cancels. Run at sf0.1 and the sf1 evidence set: the single
  * reducer is PERF.md's flagged sf1 outlier.
  */
object BenchABDistinct {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "2"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = spark.sparkContext.parallelize(1 to 32, 32)
    (1 to 120).foreach(_ => probe.count())
    Tables.cacheMode = true

    import graft.functions.DistinctWithHll.{distinct_with_hll, hll_union}

    def fused(): DataFrame =
      Tables(spark, sfDir, "lineitem")
        .agg(distinct_with_hll(col("l_partkey"), col("l_suppkey")).as("d"))
        .select(col("d.n_exact").as("n_parts"), col("d.approx").as("approx_supps"))

    def bucketed(): DataFrame =
      Tables(spark, sfDir, "lineitem")
        .groupBy(pmod(hash(col("l_partkey")), lit(32)).as("b"))
        .agg(distinct_with_hll(col("l_partkey"), col("l_suppkey")).as("d"))
        .agg(sum(col("d.n_exact")).as("n_parts"),
          hll_union(col("d.hll")).as("approx_supps"))

    def time(fn: () => DataFrame): Double = {
      val df = fn()
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e6
    }

    // equality check first: the bucketed shape must produce identical output
    val a = fused().collect().head
    val b = bucketed().collect().head
    println(s"fused=(${a.getLong(0)},${a.getLong(1)}) bucketed=(${b.getLong(0)},${b.getLong(1)})" +
      s" equal=${a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1)}")

    (1 to 3).foreach { _ => time(fused); time(bucketed) } // warm both
    val pairs = (1 to 9).map { _ => (time(fused), time(bucketed)) }
    val fs = pairs.map(_._1).sorted
    val bs = pairs.map(_._2).sorted
    println(f"sf=$sfDir fused_median=${fs(fs.length / 2)}%.1fms bucketed_median=${bs(bs.length / 2)}%.1fms")
    spark.stop()
  }
}
