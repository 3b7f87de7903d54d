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

  // dsq17 outputs RAW stddev_samp cells. Those hash-compare clean against
  // DuckDB only while every matched group has n <= 2: n=1 is NULL on both
  // sides and n=2 reduces to sqrt(delta^2/2) — exact in IEEE under ANY
  // accumulation/merge order. At n >= 3 Spark's partial-state merges
  // round in shuffle-arrival order and the hash would go FLAKY, so the
  // bound is pinned against fixture edits.
  test("dsq17 stddev groups stay at n <= 2 (merge-order exactness bound)") {
    for (t <- Seq("store_sales", "store_returns", "catalog_sales",
        "date_dim", "store", "item")) TpcdsFixture.view(spark, t)
    val mx = spark.sql(
      """SELECT max(cnt) FROM (
        |  SELECT count(ss_quantity) AS cnt
        |  FROM store_sales, store_returns, catalog_sales,
        |       date_dim d1, date_dim d2, date_dim d3, store, item
        |  WHERE d1.d_quarter_name = '2001Q1' AND d1.d_date_sk = ss_sold_date_sk
        |    AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
        |    AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
        |    AND ss_ticket_number = sr_ticket_number
        |    AND sr_returned_date_sk = d2.d_date_sk
        |    AND d2.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
        |    AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
        |    AND cs_sold_date_sk = d3.d_date_sk
        |    AND d3.d_quarter_name IN ('2001Q1', '2001Q2', '2001Q3')
        |  GROUP BY i_item_id, i_item_desc, s_state)""".stripMargin)
      .head.getLong(0)
    assert(mx <= 2, s"a dsq17 group reached n=$mx: raw stddev_samp is no " +
      "longer merge-order exact — shrink the overlap or round the pin")
  }

  test("planted rows hold (q85/q91 demo-addr blocks, q49 spikes, q69 store-only band)") {
    import org.apache.spark.sql.functions._
    val cd = table("customer_demographics")
      .filter(col("cd_demo_sk").isin(1, 2))
      .select("cd_demo_sk", "cd_marital_status", "cd_education_status")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    assert(cd.toSeq == Seq((1, "M", "Advanced Degree"), (2, "M", "Unknown")))
    val ca = table("customer_address").filter(col("ca_address_sk").isin(1, 2))
      .select("ca_address_sk", "ca_state", "ca_country", "ca_gmt_offset")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(ca(0) == ((1, "IN", "United States", -5.0)) || ca(0)._2 == "IN",
      s"q85 plant address drifted: ${ca(0)}")
    assert(ca(1)._4 == -7.0, s"q91 plant address gmt drifted: ${ca(1)}")
    val hd1 = table("household_demographics")
      .filter(col("hd_demo_sk") === 1).select("hd_buy_potential").head.getString(0)
    assert(hd1 == "Unknown")
    val c1 = table("customer").filter(col("c_customer_sk") === 1)
      .select("c_current_cdemo_sk", "c_current_hdemo_sk", "c_current_addr_sk")
      .head
    assert((c1.getInt(0), c1.getInt(1), c1.getInt(2)) == ((2, 1, 2)))
    // q49's `> 10000` return-amount filters need spiked rows in BOTH
    // returns channels
    assert(table("web_returns").filter(col("wr_return_amt") > 10000).count() > 50)
    assert(table("catalog_returns").filter(col("cr_return_amount") > 10000).count() > 50)
    // customers 1..300 are store-only (q69's NOT EXISTS arms); the one
    // exception is the planted q91 catalog block billed to customer 1
    assert(table("web_sales").filter(col("ws_bill_customer_sk") <= 300).count() == 0)
    assert(table("catalog_sales")
      .filter(col("cs_bill_customer_sk") <= 300 && col("cs_bill_customer_sk") =!= 1)
      .count() == 0)
    // 'Edgewood' addresses exist (q84) and the county pool spans 10 (q31)
    assert(table("customer_address").filter(col("ca_city") === "Edgewood").count() > 0)
    assert(table("customer_address").select(countDistinct(col("ca_county")))
      .head.getLong(0) == 10)
  }

  // The whole verbatim track's bit-exactness rests on money staying
  // INTEGER-VALUED doubles with sums far below 2^53 (round-free verbatim
  // aggregates are then exact in any accumulation order). A fixture edit
  // that breaks this would land as a driver hash-red — pin it here.
  test("money columns stay integer-valued doubles with 2^53 sum headroom") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    // (item.i_current_price is deliberately x+0.99 — filtered, never
    // summed — so item is not in this list)
    for (t <- Seq("store_sales", "catalog_sales", "web_sales",
        "store_returns", "catalog_returns", "web_returns")) {
      val df = table(t).cache()
      val moneyCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType => f.name
      }
      for (c <- moneyCols) {
        val frac = df.filter(col(c) =!= floor(col(c))).count()
        assert(frac == 0, s"$t.$c has $frac non-integer values")
        val s = df.select(sum(abs(col(c)))).head.getDouble(0)
        assert(s < math.pow(2, 50), f"$t.$c sum magnitude $s%.0f too close to 2^53")
      }
      df.unpersist()
    }
  }
}
