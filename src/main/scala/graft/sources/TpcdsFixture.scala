package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic TPC-DS-schema fixture for the verbatim-query track
  * (`queries/TpcdsVerbatim.scala`).
  *
  * The reference validates the verbatim 99 TPC-DS queries
  * (/root/reference/extension/tpcds/dsdgen/queries/NN.sql) against dsdgen
  * data; this container has no dsdgen, so the tables are generated here
  * as pure hash functions of the row id — the SAME bytes on every run,
  * so the DuckDB oracle (reading the parquet this object writes) and any
  * later driver run see identical data.
  *
  * Every derived column goes through `h(salt) = (id*1103515245 + salt)
  * mod 2^31-1` BEFORE the small range modulus. A first draft used bare
  * `pmod(id*k, range)` chains and hit systematic aliasing three separate
  * ways (a hot-arm selector mod 5 excluding every item sku ≡ 4 mod 5, an
  * inventory date stride ≡ 0 mod the base-quantity modulus making every
  * snapshot pair identical, parity coupling between cycles with even
  * moduli); hashing through a large prime removes the entire class — no
  * small modulus can divide a stride of the prime-mod sequence.
  *
  * Design constraints, so the verbatim texts hash-compare clean and
  * return non-empty results:
  *  - Every money/measure column is an INTEGER-VALUED DOUBLE: sums of
  *    integer-valued doubles below 2^53 are exact in ANY accumulation
  *    order, so Spark and DuckDB agree bit-for-bit without round() and
  *    the queries can stay verbatim (Q.scala conventions 1-2 handled at
  *    the source instead of the text).
  *  - ~20% of store/catalog/web sales rows are HOT: clustered on 40 hot
  *    items and a 25-30 day hot window (Nov 2000 for store, Feb 2000 for
  *    catalog/web) so q23's `HAVING count(*) > 4` per (item, day) and
  *    the q14 cross-channel INTERSECT are non-empty.
  *  - inventory quantities are small bases with occasional +400 spikes:
  *    q39's stdev/mean > 1 selects spike groups, q37/q82's
  *    `inv_quantity_on_hand BETWEEN 100 AND 500` selects spike rows.
  *  - d_month_seq = (year-1900)*12 + month-1, so the queries' literal
  *    `BETWEEN 1200 AND 1211` window is exactly year 2000.
  */
object TpcdsFixture {
  val tables: Seq[String] = Seq("date_dim", "item", "customer", "warehouse",
    "store", "customer_address", "store_sales", "catalog_sales", "web_sales",
    "inventory", "store_returns")

  /** Stable per-JVM output dir (same convention as Sources.csvFixture:
    * written once, referenced by absolute path from the oracle SQL).
    */
  val dir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_tpcds_${
      java.util.UUID.randomUUID().toString.take(8)}"

  // julian day number of 1998-01-01, like real dsdgen date_sk values
  private val DskBase = 2450815
  private val NDays = 1826 // 1998-01-01 .. 2002-12-31
  private val NItem = 4000L
  private val NCust = 1500L
  // day indexes of the hot windows (datediff from 1998-01-01)
  private val HotStoreDay = 1035 // 2000-11-01 (+0..29)
  private val HotCatalogDay = 761 // 2000-02-01 (+0..24)

  /** Salted hash of the row id through a large prime — aliasing-free
    * source for every small-range draw below. The MULTIPLIER varies with
    * the salt, not just the offset: with a shared multiplier, two draws
    * differ by a constant before the outer modulus, so `(h+c) mod 10` is
    * a pure function of `h mod 100` and columns couple (observed: every
    * manager-1 item landing in one category). Distinct multipliers make
    * the draws independent linear maps mod the prime.
    */
  private def h(salt: Int): String =
    s"pmod(id * ${1103515245L + salt * 12820163L} + $salt, 2147483647)"
  private def hm(salt: Int, range: Long): String = s"pmod(${h(salt)}, $range)"

  @volatile private var written = false

  def ensure(spark: SparkSession): Unit = {
    if (written) return
    synchronized {
      if (written) return
      generate(spark)
      written = true
    }
  }

  def view(spark: SparkSession, table: String): Unit = {
    ensure(spark)
    spark.read.parquet(s"$dir/$table.parquet").createOrReplaceTempView(table)
  }

  private def generate(spark: SparkSession): Unit = {
    def write(name: String, df: DataFrame): Unit =
      df.coalesce(2).write.mode("overwrite").parquet(s"$dir/$name.parquet")

    write("date_dim", spark.range(NDays.toLong).selectExpr(
      s"CAST($DskBase + id AS INT) AS d_date_sk",
      "date_add(DATE '1998-01-01', CAST(id AS INT)) AS d_date",
      // 1998-01-01 was a Thursday; weeks turn on Sunday
      """element_at(array('Thursday','Friday','Saturday','Sunday',
        |  'Monday','Tuesday','Wednesday'), CAST(id % 7 AS INT) + 1)
        |  AS d_day_name""".stripMargin,
      "CAST(5000 + (id + 4) DIV 7 AS INT) AS d_week_seq",
      """CAST((year(date_add(DATE '1998-01-01', CAST(id AS INT))) - 1900) * 12
        | + month(date_add(DATE '1998-01-01', CAST(id AS INT))) - 1 AS INT)
        | AS d_month_seq""".stripMargin,
      "CAST(month(date_add(DATE '1998-01-01', CAST(id AS INT))) AS INT) AS d_moy",
      "CAST(quarter(date_add(DATE '1998-01-01', CAST(id AS INT))) AS INT) AS d_qoy",
      "CAST(year(date_add(DATE '1998-01-01', CAST(id AS INT))) AS INT) AS d_year"))

    // items 3901..3916 are PLANTED q41 combos (one per OR-arm, two
    // tuples each) with manufact ids 738..753 — q41's conjunction of
    // (category, color, units, size) pairs inside a manufact range is
    // otherwise a coin-flip at this item count
    val plantedCat = "array('Women','Women','Women','Women','Men','Men','Men','Men'," +
      "'Women','Women','Women','Women','Men','Men','Men','Men')"
    val plantedCatId = "array(7,7,7,7,6,6,6,6,7,7,7,7,6,6,6,6)"
    val plantedColor = "array('powder','khaki','brown','honeydew','floral','deep'," +
      "'light','cornflower','midnight','snow','cyan','papaya','orange','frosted','forest','ghost')"
    val plantedUnits = "array('Ounce','Oz','Bunch','Ton','N/A','Dozen','Box'," +
      "'Pound','Pallet','Gross','Cup','Dram','Each','Tbl','Lb','Bundle')"
    val plantedSize = "array('medium','extra large','N/A','small','petite','petite'," +
      "'medium','extra large','medium','extra large','N/A','small','petite','petite','medium','extra large')"
    def planted(arr: String, other: String): String =
      s"CASE WHEN id BETWEEN 3901 AND 3916 THEN element_at($arr, CAST(id - 3900 AS INT)) ELSE $other END"
    write("item", spark.range(1, NItem + 1).selectExpr(
      "CAST(id AS INT) AS i_item_sk",
      "concat('ITEM', lpad(CAST(id AS STRING), 12, '0')) AS i_item_id",
      "concat('description of item ', id, ' with some padding text for substrings') AS i_item_desc",
      s"CAST(CASE WHEN id BETWEEN 3901 AND 3916 THEN 738 + id - 3901 ELSE ${hm(101, 1000)} END AS INT) AS i_manufact_id",
      s"concat('manu#', CASE WHEN id BETWEEN 3901 AND 3916 THEN 738 + id - 3901 ELSE ${hm(101, 1000)} END) AS i_manufact",
      s"CAST(${hm(103, 100)} AS INT) AS i_manager_id",
      s"CAST(1 + ${hm(105, 50)} AS INT) AS i_brand_id",
      s"""CASE CAST(1 + ${hm(105, 50)} AS INT)
        |  WHEN 1 THEN 'scholaramalgamalg #14' WHEN 2 THEN 'scholaramalgamalg #7'
        |  WHEN 3 THEN 'exportiunivamalg #9' WHEN 4 THEN 'scholaramalgamalg #9'
        |  WHEN 5 THEN 'amalgimporto #1' WHEN 6 THEN 'edu packscholar #1'
        |  WHEN 7 THEN 'exportiimporto #1' WHEN 8 THEN 'importoamalg #1'
        |  ELSE concat('Brand#', 1 + ${hm(105, 50)}) END AS i_brand""".stripMargin,
      s"CAST(1 + ${hm(107, 16)} AS INT) AS i_class_id",
      s"""element_at(array('personal','portable','reference','self-help',
        |  'accessories','classical','fragrances','pants','computers','stereo',
        |  'football','shirts','birdal','dresses','maternity','bedding'),
        |  CAST(1 + ${hm(107, 16)} AS INT)) AS i_class""".stripMargin,
      s"CAST(${planted(plantedCatId, s"1 + ${hm(109, 10)}")} AS INT) AS i_category_id",
      planted(plantedCat,
        s"""element_at(array('Sports','Books','Home','Electronics','Jewelry',
          |  'Men','Women','Music','Shoes','Children'),
          |  CAST(1 + ${hm(109, 10)} AS INT))""".stripMargin) + " AS i_category",
      s"CAST(${hm(111, 100)} AS DOUBLE) + 0.99 AS i_current_price",
      planted(plantedColor,
        s"""element_at(array('powder','khaki','brown','honeydew','floral','deep',
          |  'light','cornflower','midnight','snow','cyan','papaya','orange',
          |  'frosted','forest','ghost','peach','linen','plum','slate',
          |  'blanched','burnished'),
          |  CAST(1 + ${hm(113, 22)} AS INT))""".stripMargin) + " AS i_color",
      planted(plantedUnits,
        s"""element_at(array('Ounce','Oz','Bunch','Ton','N/A','Dozen','Box',
          |  'Pound','Pallet','Gross','Cup','Dram','Each','Tbl','Lb','Bundle'),
          |  CAST(1 + ${hm(115, 16)} AS INT))""".stripMargin) + " AS i_units",
      planted(plantedSize,
        s"""element_at(array('medium','extra large','N/A','small','petite',
          |  'large','economy'), CAST(1 + ${hm(117, 7)} AS INT))""".stripMargin) + " AS i_size",
      s"CAST(1 + ${hm(119, 100)} AS DOUBLE) AS i_wholesale_cost",
      "concat('product', id) AS i_product_name"))

    write("customer", spark.range(1, NCust + 1).selectExpr(
      "CAST(id AS INT) AS c_customer_sk",
      "concat('CUST', lpad(CAST(id AS STRING), 12, '0')) AS c_customer_id",
      s"CASE WHEN ${hm(201, 37)} = 0 THEN NULL ELSE concat('First', ${hm(203, 200)}) END AS c_first_name",
      s"CASE WHEN ${hm(205, 41)} = 0 THEN NULL ELSE concat('Last', ${hm(207, 300)}) END AS c_last_name",
      s"CASE ${hm(209, 3)} WHEN 0 THEN 'Y' WHEN 1 THEN 'N' ELSE NULL END AS c_preferred_cust_flag",
      s"""element_at(array('UNITED STATES','CANADA','MEXICO','BRAZIL','FRANCE',
        |  'GERMANY','ITALY','SPAIN','JAPAN','CHINA','INDIA','AUSTRALIA',
        |  'EGYPT','KENYA','PERU','CHILE','NORWAY','POLAND','GREECE','TURKEY'),
        |  CAST(1 + ${hm(211, 20)} AS INT)) AS c_birth_country""".stripMargin,
      s"CASE WHEN ${hm(213, 5)} = 0 THEN NULL ELSE concat('login', id) END AS c_login",
      s"CAST(1 + ${hm(215, 800)} AS INT) AS c_current_addr_sk",
      "concat('user', id, '@example.com') AS c_email_address"))

    write("warehouse", spark.range(1, 6).selectExpr(
      "CAST(id AS INT) AS w_warehouse_sk",
      "concat('Warehouse ', id) AS w_warehouse_name"))

    // a SHARED zip pool: 15 zips from q8's literal IN-list + q15/q45's
    // nine + 16 generic — q8 needs >10 preferred customers per listed
    // zip prefix, q24 needs s_zip = ca_zip matches, q19 needs most
    // (store, address) pairs to differ. Stores and addresses draw from
    // the same pool.
    val zipPool = "array(" + Seq(
      "24128", "76232", "65084", "87816", "83926", "77556", "20548",
      "26231", "43848", "15126", "91137", "61265", "98294", "25782",
      "17920", "85669", "86197", "88274", "83405", "86475", "85392",
      "85460", "80348", "81792", "10001", "20002", "30003", "40004",
      "50005", "60006", "70007", "80008", "90009", "11010", "12011",
      "13012", "14013", "15014", "16015", "17016")
      .map("'" + _ + "'").mkString(",") + ")"

    // 12 stores (ss_store_sk is 1..12): three in TN (q1/q36 filter),
    // every store at gmt_offset -5 (q43), market ids cover 8 (q24)
    write("store", spark.range(1, 13).selectExpr(
      "CAST(id AS INT) AS s_store_sk",
      "concat('STORE', lpad(CAST(id AS STRING), 8, '0')) AS s_store_id",
      "concat('Store ', id) AS s_store_name",
      """element_at(array('TN','TN','TN','CA','WA','GA','NY','TX','FL',
        |  'OH','MI','IL'), CAST(id AS INT)) AS s_state""".stripMargin,
      "concat('City', 1 + pmod(id, 6)) AS s_city",
      "concat('County', 1 + pmod(id, 5)) AS s_county",
      s"element_at($zipPool, CAST(1 + ${hm(233, 40)} AS INT)) AS s_zip",
      "CAST(1 + pmod(id, 3) AS INT) AS s_company_id",
      "concat('Company ', 1 + pmod(id, 3)) AS s_company_name",
      // store 5 pinned to market 8: q24 filters s_market_id = 8 and a
      // 12-store hash draw misses the value ~28% of the time (observed)
      s"CAST(CASE WHEN id = 5 THEN 8 ELSE 1 + ${hm(235, 10)} END AS INT) AS s_market_id",
      "CAST(-5.0 AS DOUBLE) AS s_gmt_offset",
      "CAST(100 + id AS STRING) AS s_street_number",
      "concat('Street', 1 + pmod(id, 4)) AS s_street_name",
      "element_at(array('St','Ave','Blvd','Ln'), CAST(1 + pmod(id, 4) AS INT)) AS s_street_type",
      "concat('Suite ', id) AS s_suite_number"))

    write("customer_address", spark.range(1, 801).selectExpr(
      "CAST(id AS INT) AS ca_address_sk",
      s"element_at($zipPool, CAST(1 + ${hm(221, 40)} AS INT)) AS ca_zip",
      s"""element_at(array('TN','CA','WA','GA','NY','TX','FL','OH','MI',
        |  'IL','PA','AZ','CO','OR','NV','UT','KS','IA','MN','WI'),
        |  CAST(1 + ${hm(223, 20)} AS INT)) AS ca_state""".stripMargin,
      s"concat('City', 1 + ${hm(225, 60)}) AS ca_city",
      s"CASE WHEN ${hm(227, 10)} = 0 THEN 'Canada' ELSE 'United States' END AS ca_country",
      s"concat('County', 1 + ${hm(229, 5)}) AS ca_county",
      "CAST(-5.0 AS DOUBLE) AS ca_gmt_offset"))

    // hot arms: ~1/5 of rows hit the 40 hot items and ~1/3 the hot day
    // window — their overlap concentrates (item, day) cells past q23's
    // count(*) > 4. Rows 1000..1019 of EVERY sales channel are the q58
    // plant: same day (2000-01-03's week), same item (101..120), same
    // ext_sales_price per id — cross-channel per-item revenues agree
    // exactly, satisfying q58's mutual ±10% bands. ~1/19 of ss_addr_sk
    // is NULL (q44's baseline subquery averages the NULL-addr slice).
    val q58day = 732 // datediff('2000-01-03', '1998-01-01')
    def q58(col: String, other: String): String =
      s"CASE WHEN id BETWEEN 1000 AND 1019 THEN $col ELSE $other END"
    write("store_sales", spark.range(300000).selectExpr(
      s"""CAST($DskBase + ${q58(q58day.toString,
           s"""CASE WHEN ${hm(301, 3)} = 0
         |  THEN $HotStoreDay + ${hm(303, 30)}
         |  ELSE ${hm(305, NDays)} END""".stripMargin)} AS INT) AS ss_sold_date_sk""",
      s"""CAST(${q58("101 + id - 1000",
           s"""CASE WHEN ${hm(307, 5)} = 0 THEN 1 + ${hm(309, 40)}
         |  ELSE 1 + ${hm(311, NItem)} END""".stripMargin)} AS INT) AS ss_item_sk""",
      s"CASE WHEN ${hm(313, 97)} = 0 THEN NULL ELSE CAST(1 + ${hm(315, NCust)} AS INT) END AS ss_customer_sk",
      s"CASE WHEN ${hm(339, 53)} = 0 THEN NULL ELSE CAST(1 + ${hm(317, 12)} AS INT) END AS ss_store_sk",
      "id AS ss_ticket_number",
      s"CASE WHEN ${hm(337, 19)} = 0 THEN NULL ELSE CAST(1 + ${hm(319, 800)} AS INT) END AS ss_addr_sk",
      s"CAST(1 + ${hm(321, 100)} AS INT) AS ss_quantity",
      s"CAST(1 + ${hm(323, 200)} AS DOUBLE) AS ss_list_price",
      s"CAST(1 + ${hm(325, 150)} AS DOUBLE) AS ss_sales_price",
      s"CAST(${q58("500 + (id - 1000) * 7",
        s"(1 + ${hm(325, 150)}) * (1 + ${hm(321, 100)})")} AS DOUBLE) AS ss_ext_sales_price",
      s"CAST((1 + ${hm(323, 200)}) * (1 + ${hm(321, 100)}) AS DOUBLE) AS ss_ext_list_price",
      s"CAST(1 + ${hm(327, 90)} AS DOUBLE) AS ss_wholesale_cost",
      s"CAST((1 + ${hm(327, 90)}) * (1 + ${hm(321, 100)}) AS DOUBLE) AS ss_ext_wholesale_cost",
      s"CAST(${hm(329, 250)} AS DOUBLE) AS ss_ext_discount_amt",
      s"CAST(${hm(331, 1500)} AS DOUBLE) AS ss_coupon_amt",
      s"CAST(${hm(333, 2000)} AS DOUBLE) AS ss_net_paid",
      // wide range: q44 ranks items by avg(ss_net_profit) and joins the
      // asc/desc ranks — an exact avg TIE makes rank() pairs ambiguous
      // between engines (observed at range 1000), so collisions must be
      // improbable at ~25-row per-item samples
      s"CAST(${hm(335, 100000)} - 20000 AS DOUBLE) AS ss_net_profit"))

    write("catalog_sales", spark.range(150000).selectExpr(
      s"""CAST($DskBase + ${q58(q58day.toString,
           s"""CASE WHEN ${hm(401, 3)} = 0
         |  THEN $HotCatalogDay + ${hm(403, 25)}
         |  ELSE ${hm(405, NDays)} END""".stripMargin)} AS INT) AS cs_sold_date_sk""",
      s"""CAST(${q58("101 + id - 1000",
           s"""CASE WHEN ${hm(407, 5)} = 0 THEN 1 + ${hm(409, 40)}
         |  ELSE 1 + ${hm(411, NItem)} END""".stripMargin)} AS INT) AS cs_item_sk""",
      s"CAST(1 + ${hm(413, NCust)} AS INT) AS cs_bill_customer_sk",
      s"CAST(1 + ${hm(415, 100)} AS INT) AS cs_quantity",
      s"CAST(1 + ${hm(417, 190)} AS DOUBLE) AS cs_list_price",
      s"CAST(1 + ${hm(425, 600)} AS DOUBLE) AS cs_sales_price",
      s"CAST(${q58("500 + (id - 1000) * 7",
        s"(1 + ${hm(419, 140)}) * (1 + ${hm(415, 100)})")} AS DOUBLE) AS cs_ext_sales_price",
      s"CAST((1 + ${hm(417, 190)}) * (1 + ${hm(415, 100)}) AS DOUBLE) AS cs_ext_list_price",
      s"CAST((1 + ${hm(421, 85)}) * (1 + ${hm(415, 100)}) AS DOUBLE) AS cs_ext_wholesale_cost",
      s"CAST(${hm(423, 600)} AS DOUBLE) AS cs_ext_discount_amt",
      s"CAST(${hm(427, 1200)} - 300 AS DOUBLE) AS cs_net_profit",
      s"CAST(1 + ${hm(429, 800)} AS INT) AS cs_bill_addr_sk",
      s"CASE WHEN ${hm(431, 47)} = 0 THEN NULL ELSE CAST(1 + ${hm(433, 800)} AS INT) END AS cs_ship_addr_sk"))

    write("web_sales", spark.range(150000).selectExpr(
      s"""CAST($DskBase + ${q58(q58day.toString,
           s"""CASE WHEN ${hm(501, 3)} = 0
         |  THEN $HotCatalogDay + ${hm(503, 25)}
         |  ELSE ${hm(505, NDays)} END""".stripMargin)} AS INT) AS ws_sold_date_sk""",
      s"""CAST(${q58("101 + id - 1000",
           s"""CASE WHEN ${hm(507, 5)} = 0 THEN 1 + ${hm(509, 40)}
         |  ELSE 1 + ${hm(511, NItem)} END""".stripMargin)} AS INT) AS ws_item_sk""",
      s"CAST(1 + ${hm(513, NCust)} AS INT) AS ws_bill_customer_sk",
      s"CAST(1 + ${hm(515, 100)} AS INT) AS ws_quantity",
      s"CAST(1 + ${hm(517, 185)} AS DOUBLE) AS ws_list_price",
      s"CAST(1 + ${hm(527, 600)} AS DOUBLE) AS ws_sales_price",
      s"CAST(${q58("500 + (id - 1000) * 7",
        s"(1 + ${hm(519, 145)}) * (1 + ${hm(515, 100)})")} AS DOUBLE) AS ws_ext_sales_price",
      s"CAST((1 + ${hm(517, 185)}) * (1 + ${hm(515, 100)}) AS DOUBLE) AS ws_ext_list_price",
      s"CAST((1 + ${hm(521, 80)}) * (1 + ${hm(515, 100)}) AS DOUBLE) AS ws_ext_wholesale_cost",
      s"CAST(${hm(523, 550)} AS DOUBLE) AS ws_ext_discount_amt",
      s"CAST(${hm(525, 1900)} AS DOUBLE) AS ws_net_paid",
      s"CAST(1 + ${hm(529, 800)} AS INT) AS ws_bill_addr_sk",
      s"CASE WHEN ${hm(531, 47)} = 0 THEN NULL ELSE CAST(1 + ${hm(533, 1500)} AS INT) END AS ws_ship_customer_sk"))

    // full item coverage (q37/q82 filter arbitrary manufact ids),
    // 2 warehouses, biweekly snapshots: 4000 * 2 * 131 rows. Quantities
    // are small bases with a +400 spike every ~11th row: spike groups
    // have stdev/mean > 1 (q39), spike rows land in 100..500 (q37/q82).
    write("inventory", spark.range(NItem * 2 * 131).selectExpr(
      s"CAST($DskBase + (id DIV ${NItem * 2}) * 14 AS INT) AS inv_date_sk",
      s"CAST(1 + pmod(id, $NItem) AS INT) AS inv_item_sk",
      s"CAST(1 + pmod(id DIV $NItem, 2) AS INT) AS inv_warehouse_sk",
      s"""CAST(${hm(601, 20)}
        | + CASE WHEN ${hm(603, 11)} = 0 THEN 400 ELSE 0 END
        | AS DOUBLE) AS inv_quantity_on_hand""".stripMargin))

    // returns derive FROM the written store_sales rows, so every join
    // column (ticket, item, customer, store) is consistent by
    // construction: every 3rd ticket returns, 1..140 days after the
    // sale (q50's day buckets and q1's d_year=2000 both populated;
    // returns past 2002-12-31 simply find no date_dim row)
    write("store_returns", spark.read.parquet(s"$dir/store_sales.parquet")
      .where("pmod(ss_ticket_number, 3) = 0")
      .selectExpr(
        """CAST(ss_sold_date_sk + 1
          | + pmod(pmod(ss_ticket_number * 2654435761 + 17, 2147483647), 140)
          | AS INT) AS sr_returned_date_sk""".stripMargin,
        "ss_item_sk AS sr_item_sk",
        "ss_customer_sk AS sr_customer_sk",
        "ss_store_sk AS sr_store_sk",
        "ss_ticket_number AS sr_ticket_number",
        """CAST(1 + pmod(pmod(ss_ticket_number * 1103548271 + 5, 2147483647), 300)
          | AS DOUBLE) AS sr_return_amt""".stripMargin,
        """CAST(1 + pmod(pmod(ss_ticket_number * 1103548301 + 9, 2147483647), 400)
          | AS DOUBLE) AS sr_net_loss""".stripMargin,
        """CAST(1 + pmod(pmod(ss_ticket_number * 1103548351 + 13, 2147483647), 40)
          | AS INT) AS sr_return_quantity""".stripMargin))
  }
}
