package graft

import graft.functions.DistinctWithHll.distinct_with_hll
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultiDistinctSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fused aggregate: exact side matches countDistinct, approx within rsd") {
    import spark.implicits._
    // includes key 0 (sentinel path) and repeats; 8 partitions force merges
    val df = (0 until 50000).map(i => ((i % 7919).toLong, (i % 433).toLong))
      .toDF("a", "b").repartition(8)
    val truth = df.agg(countDistinct(col("a")), countDistinct(col("b"))).head()
    val got = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    assert(got.getLong(0) == truth.getLong(0)) // exact side is exact
    val trueB = truth.getLong(1).toDouble
    assert(math.abs(got.getLong(1) - trueB) / trueB < 0.15,
      s"approx ${got.getLong(1)} vs $trueB")
  }

  test("bucketed two-level shape equals the global aggregation exactly") {
    import graft.functions.DistinctWithHll.hll_union
    import spark.implicits._
    val df = (0 until 50000).map(i => ((i % 7919).toLong, (i % 433).toLong))
      .toDF("a", "b").repartition(8)
    val global = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    // hash-bucketing the EXACT key keeps bucket key-spaces disjoint, so
    // exact counts add; HLL registers union register-wise — the estimate
    // must be byte-identical, not merely close
    val bucketed = df
      .groupBy(pmod(hash(col("a")), lit(16)).as("bk"))
      .agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .agg(sum(col("d.n_exact")).as("n"), hll_union(col("d.hll")).as("approx"))
      .head()
    assert(bucketed.getLong(0) == global.getLong(0))
    assert(bucketed.getLong(1) == global.getLong(1))
  }

  test("columnar operator shape equals the fused aggregate on all three paths") {
    import graft.functions.DistinctWithHll.exactWithHll
    import spark.implicits._
    val df = (0 until 50000).map(i => ((i % 7919).toLong, (i % 433).toLong))
      .toDF("a", "b").repartition(8)
    val global = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    // path 1: row fallback (in-memory child is not columnar)
    val rowPath = exactWithHll(df, "a", "b", 16, mode = "columnar").head()
    assert(rowPath.getLong(0) == global.getLong(0))
    assert(rowPath.getLong(1) == global.getLong(1), "HLL estimate must be byte-identical")
    // path 2: columnar batches (parquet scan child, ColumnarToRow peeled)
    val dir = java.nio.file.Files.createTempDirectory("graft_fd_spec").toString
    try {
      df.write.mode("overwrite").parquet(dir)
      val pq = spark.read.parquet(dir)
      val colPath = exactWithHll(pq, "a", "b", 16, mode = "columnar").head()
      assert(colPath.getLong(0) == global.getLong(0))
      assert(colPath.getLong(1) == global.getLong(1))
      // the peel actually fired: partial exec consumes batches directly
      // (AQE wraps the tree in AdaptiveSparkPlanExec — pin with it off)
      val aqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val plan = exactWithHll(pq, "a", "b", 16, mode = "columnar").queryExecution.executedPlan
        val fused = plan.collect {
          case f: graft.plans.FusedDistinctPartialExec => f.columnarChild }
        assert(fused == Seq(true), s"expected a columnar-child partial exec in:\n$plan")
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    // path 3: single-bucket degenerate case still exact
    val one = exactWithHll(df, "a", "b", 1, mode = "columnar").head()
    assert(one.getLong(0) == global.getLong(0))
    assert(one.getLong(1) == global.getLong(1))
  }

  test("columnar operator widens int32 keys and skips nulls") {
    import graft.functions.DistinctWithHll.exactWithHll
    import spark.implicits._
    val df = Seq[(Option[Int], Option[Int])](
      (Some(1), None), (None, Some(5)), (Some(1), Some(5)), (Some(2), Some(6)))
      .toDF("a", "b")
    val got = exactWithHll(df, "a", "b", 4, mode = "columnar").head()
    assert(got.getLong(0) == 2)
    assert(got.getLong(1) == 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_fd_int").toString
    try {
      df.write.mode("overwrite").parquet(dir)
      val colGot = exactWithHll(spark.read.parquet(dir), "a", "b", 4, mode = "columnar").head()
      assert(colGot.getLong(0) == 2)
      assert(colGot.getLong(1) == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("auto mode picks the driver-merged shape for small inputs") {
    import graft.functions.DistinctWithHll.exactWithHll
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    val auto = exactWithHll(df, "a", "b")
    assert(auto.head().getLong(0) == 1000)
    // a 16 KB input sits far under ColumnarThresholdBytes → single-job
    // partial + coordinator merge, no exchange
    val plan = auto.queryExecution.executedPlan
    assert(plan.toString.contains("FusedDistinctDriver"),
      s"small input should take the driver-merged shape:\n$plan")
  }

  test("driver-merged shape equals the fused aggregate exactly") {
    import graft.functions.DistinctWithHll.exactWithHll
    import spark.implicits._
    val df = (0 until 5000).map(i => ((i % 700).toLong, (i % 90).toLong))
      .toDF("a", "b").repartition(7)
    val fused = exactWithHll(df, "a", "b", mode = "fused").head()
    val driver = exactWithHll(df, "a", "b", mode = "driver").head()
    assert(driver.getLong(0) == fused.getLong(0)) // exact side: identical
    assert(driver.getLong(1) == fused.getLong(1)) // HLL registers merge to same estimate
  }

  test("null inputs are ignored on both sides") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(1L), None), (None, Some(5L)), (Some(1L), Some(5L)), (Some(2L), Some(6L)))
      .toDF("a", "b")
    val got = df.agg(distinct_with_hll(col("a"), col("b")).as("d"))
      .select(col("d.n_exact"), col("d.approx")).head()
    assert(got.getLong(0) == 2)
    assert(got.getLong(1) == 2)
  }
}
