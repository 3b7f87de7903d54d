package graft

import graft.rules.IntChainJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused int-key broadcast join chain (plans/IntChainJoin):
  * differential vs the stock BHJ chain — duplicate build keys (bag
  * multiplicity!), snowflake keys sourced from earlier build rows,
  * NULL probe keys, empty builds, cached-columnar and parquet arms —
  * plus the decline surface (single join, outer, extra condition).
  */
class IntChainJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  // the rule ships OPT-IN after the r15 negative result (see its
  // scaladoc); the spec exercises it explicitly
  private def withRule[A](body: => A): A = {
    val prev = IntChainJoinRule.enabled
    IntChainJoinRule.enabled = true
    try body finally IntChainJoinRule.enabled = prev
  }

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("IntChainJoin")

  // bags, not sets: duplicate build keys multiply rows
  private def bag(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  private def offBag(df: => DataFrame): Seq[String] = {
    val prev = IntChainJoinRule.enabled
    IntChainJoinRule.enabled = false
    try bag(df)
    finally IntChainJoinRule.enabled = prev
  }

  // fact: 40k rows; fk1 has NULLs and misses; fk2 dense
  private lazy val fact: DataFrame = spark.range(0, 40000).select(
    when(col("id") % 31 =!= 0, col("id") % 1200).as("fk1"), // 1200 > dim1's 1000: misses
    (col("id") % 500).as("fk2"),
    col("id").as("payload"))
  // dim1: unique int key + a snowflake key kid
  private lazy val dim1: DataFrame = spark.range(0, 1000).select(
    col("id").as("d1_id"), (col("id") % 40).as("kid"),
    concat(lit("n"), col("id")).as("d1_name"))
  // dim2: DUPLICATE keys — two rows for every third key
  private lazy val dim2: DataFrame = spark.range(0, 500)
    .select(col("id").as("d2_id"), lit("a").as("tag"))
    .unionAll(spark.range(0, 500).filter(col("id") % 3 === 0)
      .select(col("id").as("d2_id"), lit("b").as("tag")))
  // dim3: keyed by dim1's kid (snowflake)
  private lazy val dim3: DataFrame = spark.range(0, 40).select(
    col("id").as("d3_id"), concat(lit("k"), col("id")).as("kind"))

  private def chain(f: DataFrame): DataFrame =
    f.join(broadcast(dim1), f("fk1") === dim1("d1_id"), "inner")
      .join(broadcast(dim3), dim1("kid") === dim3("d3_id"), "inner")
      .join(broadcast(dim2), f("fk2") === dim2("d2_id"), "inner")
      .select(col("payload"), col("d1_name"), col("kind"), col("tag"))

  test("3-link chain with duplicates + snowflake key: exact bag, exec fires") {
    withRule {
    val fc = fact.cache(); fc.count()
    try {
      val df = chain(fc)
      assert(fired(df), df.queryExecution.executedPlan.toString)
      assert(bag(df) == offBag(chain(fc)))
    } finally fc.unpersist()
    }
  }

  test("parquet base (row arm): exact bag") {
    withRule {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_icj_${
      java.util.UUID.randomUUID().toString.take(8)}"
    fact.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    def df = chain(pq)
    assert(fired(df))
    assert(bag(df) == offBag(chain(pq)))
    }
  }

  test("empty build side drains the chain: zero rows") {
    withRule {
    val fc = fact.cache(); fc.count()
    try {
      val none = dim2.filter(col("d2_id") < 0)
      val df = fact.join(broadcast(dim1), col("fk1") === col("d1_id"), "inner")
        .join(broadcast(none), col("fk2") === col("d2_id"), "inner")
        .select(col("payload"), col("tag"))
      assert(fired(df))
      assert(df.count() == 0)
    } finally fc.unpersist()
    }
  }

  test("aggregate over the chain: exact result") {
    withRule {
    // the JOB consumption shape: min/count over the chain output
    def df = chain(fact).agg(
      count(lit(1)).as("n"), min(col("d1_name")).as("mn"),
      max(col("kind")).as("mk"))
    assert(fired(df))
    assert(bag(df) == offBag(df))
    }
  }

  test("declines: single join, left outer, extra condition") {
    withRule {
    val single = fact.join(broadcast(dim1), col("fk1") === col("d1_id"), "inner")
      .select(col("payload"), col("d1_name"))
    assert(!fired(single))
    val outer = fact
      .join(broadcast(dim1), col("fk1") === col("d1_id"), "left")
      .join(broadcast(dim2), col("fk2") === col("d2_id"), "inner")
      .select(col("payload"), col("tag"))
    assert(bag(outer) == offBag(fact
      .join(broadcast(dim1), col("fk1") === col("d1_id"), "left")
      .join(broadcast(dim2), col("fk2") === col("d2_id"), "inner")
      .select(col("payload"), col("tag"))))
    val extra = fact
      .join(broadcast(dim1),
        col("fk1") === col("d1_id") && col("payload") > col("kid"), "inner")
      .join(broadcast(dim2), col("fk2") === col("d2_id"), "inner")
      .select(col("payload"), col("tag"))
    assert(bag(extra) == offBag(fact
      .join(broadcast(dim1),
        col("fk1") === col("d1_id") && col("payload") > col("kid"), "inner")
      .join(broadcast(dim2), col("fk2") === col("d2_id"), "inner")
      .select(col("payload"), col("tag"))))
    }
  }
}
