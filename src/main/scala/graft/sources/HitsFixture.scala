package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic web-analytics `hits` fixture for the ClickBench track
  * (reference: /root/reference/benchmark/clickbench/queries/q01-q43.sql
  * — 43 single-table scan/filter/aggregate shapes over the ClickHouse
  * hits schema). Only the columns the 43 queries touch are generated.
  *
  * Generation follows the aliasing-free TpcdsFixture recipe: every draw
  * goes through a salted per-column multiplier into mod 2^31-1 before
  * the small range modulus, so no derived column couples with another.
  *
  * Hash-exactness design (the oracle compare is value- and
  * type-sensitive):
  *  - UserID stays ≤ 1e9 so AVG(UserID)'s double accumulation is exact
  *    (every partial sum < 2^53 up to ~9e6 rows = factor 90); the
  *    ClickBench q20 magic id is re-planted as 888888888 within that
  *    domain (documented textual patch).
  *  - all averaged columns are small integers (exact double sums), so
  *    no round() patches are needed;
  *  - selective literals (CounterID 62, URLHash/RefererHash magic
  *    values) are planted at densities that keep every filter+OFFSET
  *    query non-empty at the 100k-row gate fixture.
  */
object HitsFixture {

  private val scaledDirs =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  /** Planted q20 user id (fixture-domain replacement for ClickBench's
    * 435090932899640449 — kept ≤ 1e9 for AVG exactness).
    */
  val MagicUser = 888888888L
  val MagicUrlHash = 2868770270353813622L
  val MagicRefererHash = 3594120000172545465L

  def ensureScaled(spark: SparkSession, factor: Long): String =
    scaledDirs.getOrElseUpdate(factor, {
      val d = s"${System.getProperty("java.io.tmpdir")}/graft_hits_x${factor}_${
        java.util.UUID.randomUUID().toString.take(8)}"
      generate(spark, d, factor)
      d
    })

  /** Generate into a caller-fixed dir (the gate fixture pins its path
    * before generation so oracle SQL can interpolate it at map build).
    */
  def generateInto(spark: SparkSession, dir: String, factor: Long): Unit =
    generate(spark, dir, factor)

  private def kh(salt: Int): String =
    s"pmod(id * ${1103515245L + salt * 12820163L} + $salt, 2147483647)"
  private def hm(salt: Int, range: Long): String =
    s"pmod(${kh(salt)}, $range)"

  private def generate(spark: SparkSession, dir: String, factor: Long): Unit = {
    val n = 100000L * factor
    val base = spark.range(n).selectExpr(
      s"CAST(${kh(1)} * 4099 + id AS BIGINT) AS WatchID",
      // ~8% of titles mention Google (q23's Title LIKE '%Google%')
      s"""CASE WHEN ${hm(2, 12)} = 0
         |  THEN concat('Google search result ', ${hm(3, 500)})
         |  ELSE concat('Page title ', ${hm(3, 500)}) END AS Title""".stripMargin,
      // July 2013, second granularity (the q37-43 date window)
      s"""CAST(timestamp'2013-07-01 00:00:00' +
         |  make_interval(0, 0, 0, 0, 0, 0, ${hm(4, 31L * 24 * 3600)})
         |  AS TIMESTAMP) AS EventTime""".stripMargin,
      s"CASE WHEN ${hm(5, 10)} = 0 THEN 62 ELSE CAST(${hm(6, 150)} AS INT) END AS CounterID",
      s"CAST(${hm(7, 3000)} AS INT) AS ClientIP",
      s"CAST(${hm(8, 150)} AS INT) AS RegionID",
      // ≤ 1e9 (AVG exactness); one user in ~5000 rows is the q20 plant
      s"""CASE WHEN ${hm(9, 5000)} = 0 THEN ${MagicUser}L
         |  ELSE CAST(1 + ${hm(10, 1000000000L)} AS BIGINT) END AS UserID""".stripMargin,
      s"CASE WHEN ${hm(11, 5)} = 0 THEN CAST(1 + ${hm(12, 17)} AS INT) ELSE 0 END AS AdvEngineID",
      s"CAST(${hm(13, 8)} AS INT) AS MobilePhone",
      s"""CASE WHEN ${hm(14, 10)} < 7 THEN ''
         |  ELSE concat('model-', ${hm(15, 40)}) END AS MobilePhoneModel""".stripMargin,
      s"""CASE WHEN ${hm(16, 5)} < 3 THEN ''
         |  ELSE concat('phrase ', ${hm(17, 2000)}) END AS SearchPhrase""".stripMargin,
      s"CAST(${hm(18, 15)} AS INT) AS SearchEngineID",
      s"CAST(800 + ${hm(19, 1200)} AS INT) AS ResolutionWidth",
      // three URL arms: .google. host, google-but-not-.google., plain
      s"""CASE WHEN ${hm(20, 20)} = 0
         |  THEN concat('http://www.google.com/search?q=', ${hm(21, 300)})
         |  WHEN ${hm(20, 20)} = 1
         |  THEN concat('http://googleapis.example.com/v', ${hm(21, 300)})
         |  ELSE concat('http://example.com/page/', ${hm(22, 2000)}) END AS URL""".stripMargin,
      s"""CASE WHEN ${hm(23, 10)} < 3 THEN ''
         |  ELSE concat('https://www.site', ${hm(24, 30)}, '.com/ref/', ${hm(25, 200)})
         |  END AS Referer""".stripMargin,
      s"CAST(CASE WHEN ${hm(26, 10)} = 0 THEN 1 ELSE 0 END AS INT) AS IsRefresh",
      s"CAST(CASE WHEN ${hm(27, 7)} = 0 THEN 1 ELSE 0 END AS INT) AS IsLink",
      s"CAST(CASE WHEN ${hm(28, 13)} = 0 THEN 1 ELSE 0 END AS INT) AS IsDownload",
      s"CAST(CASE WHEN ${hm(29, 11)} = 0 THEN 1 ELSE 0 END AS INT) AS DontCountHits",
      s"CAST(${hm(30, 8)} - 1 AS INT) AS TraficSourceID", // -1..6 (q41's IN (-1, 6))
      s"""CASE WHEN ${hm(31, 10)} = 0 THEN ${MagicUrlHash}L
         |  ELSE CAST(${kh(32)} * 2654435761L + id AS BIGINT) END AS URLHash""".stripMargin,
      s"""CASE WHEN ${hm(33, 8)} = 0 THEN ${MagicRefererHash}L
         |  ELSE CAST(${kh(34)} * 40503 + id AS BIGINT) END AS RefererHash""".stripMargin,
      s"CAST(640 + ${hm(35, 1280)} AS INT) AS WindowClientWidth",
      s"CAST(480 + ${hm(36, 800)} AS INT) AS WindowClientHeight")
      .selectExpr("*", "CAST(EventTime AS DATE) AS EventDate")
    // repartition (even layout; coalesce skews unions) — cap stays 16:
    // the r14 32-file experiment measured JOB 15% worse at median
    // (task-dispatch overhead beats scan width at these walls; PERF r14)
    base.repartition(math.max(2, (2 * factor).toInt min 16))
      .write.mode("overwrite").parquet(s"$dir/hits.parquet")
  }
}
