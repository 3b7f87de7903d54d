package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins — SURVEY §2.4 PARTITIONED_AGGREGATE /
  * §2.1 bucketing: tables bucketed on the join key join and aggregate
  * with ZERO shuffle exchanges. At 100 TB this is the difference between
  * re-shuffling the fact table per query and reading co-located buckets.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed tables join and aggregate without any shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Tables(spark, sf, "orders").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_b_orders")
      Tables(spark, sf, "lineitem").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_b_lineitem")
      val joined = spark.table("graft_b_lineitem")
        .join(spark.table("graft_b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), plan.take(1500))
      // and it computes the same result as the unbucketed plan
      val expected = Tables(spark, sf, "lineitem")
        .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
        .orderBy(col("o_orderkey")).collect()
      val got = joined.orderBy(col("o_orderkey")).collect()
      assert(got.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }
}
