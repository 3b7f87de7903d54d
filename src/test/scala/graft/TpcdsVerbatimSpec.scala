package graft

import org.scalatest.funsuite.AnyFunSuite

/** sources/TpcdsFixture + queries/TpcdsVerbatim: the fixture invariants
  * each verbatim query's selectivity depends on, pinned so a generator
  * edit can't silently empty a query. The decoupling pins encode two
  * real aliasing bugs caught in round 10: a shared hash multiplier made
  * every manager-1 item land in ONE category, and a too-small multiplier
  * (no wraps of the prime for item-sized ids) made `pmod(h, 100) = 0`
  * unreachable, emptying q21/q37's price band.
  */
class TpcdsVerbatimSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.sources.TpcdsFixture

  private def table(name: String) = {
    TpcdsFixture.ensure(spark)
    spark.read.parquet(s"${TpcdsFixture.dir}/$name.parquet")
  }

  test("item attribute draws are decoupled (no shared-multiplier aliasing)") {
    val item = table("item").cache()
    import org.apache.spark.sql.functions._
    // manager-1 items must spread across categories, not collapse to one
    val cats = item.filter(col("i_manager_id") === 1)
      .select(countDistinct(col("i_category_id"))).head.getLong(0)
    assert(cats >= 5, s"manager-1 items span only $cats categories")
    // the q21 price band (price = 0.99 exactly) must be reachable
    val band = item.filter(col("i_current_price").between(0.99, 1.49)).count()
    assert(band >= 20, s"only $band items in the q21 price band")
    // q3/q32/q37/q82 filter specific manufact ids — full domain coverage
    val manufacts = item.select(countDistinct(col("i_manufact_id"))).head.getLong(0)
    assert(manufacts == 1000, s"manufact domain collapsed to $manufacts")
    item.unpersist()
  }

  test("hot (item, day) cells clear q23's count(*) > 4 threshold") {
    import org.apache.spark.sql.functions._
    val hot = table("store_sales")
      .groupBy(col("ss_item_sk"), col("ss_sold_date_sk"))
      .count().filter(col("count") > 4).count()
    assert(hot > 100, s"only $hot frequent (item, day) cells")
  }

  test("planted q41 combo items survive and dsq41 returns them") {
    val rows = queries.TpcdsVerbatim.queries("dsq41")(spark, sf).count()
    assert(rows >= 16, s"dsq41 returned $rows rows (16 planted)")
  }

  test("the sparse-selectivity verbatim queries stay non-empty") {
    for (name <- Seq("dsq01", "dsq03", "dsq08", "dsq21", "dsq24", "dsq37", "dsq39", "dsq44",
      "dsq34", "dsq46", "dsq50", "dsq53", "dsq55", "dsq56", "dsq58", "dsq63",
      "dsq65", "dsq73", "dsq76", "dsq82", "dsq88", "dsq89", "dsq96",
      // round-10b: the returns-schema wave's thin-selectivity towers,
      // including the planted ones (q85 cdemo/addr 1 plant, q91
      // customer-1 plant, q84 Edgewood, q64 color+price band)
      "dsq05", "dsq16", "dsq17", "dsq18", "dsq30", "dsq35", "dsq40",
      "dsq49", "dsq57", "dsq61", "dsq64", "dsq72", "dsq75", "dsq81",
      "dsq83", "dsq84", "dsq85", "dsq90", "dsq91", "dsq93", "dsq94",
      "dsq95")) {
      val n = queries.TpcdsVerbatim.queries(name)(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every verbatim query has an oracle and every oracle a query") {
    assert(queries.TpcdsVerbatim.queries.keySet ==
      queries.TpcdsVerbatim.oracle.keySet)
    assert(queries.TpcdsVerbatim.queries.size == 99)
  }
}
