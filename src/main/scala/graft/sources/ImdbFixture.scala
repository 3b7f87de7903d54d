package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic IMDB-shaped fixture for the JOB (join-order-benchmark)
  * slice (reference: /root/reference/benchmark/imdb/ (113 .benchmark files) — 113
  * star/snowflake join queries over the IMDB schema,
  * imdb_plan_cost/init/schema.sql). Carries the 15 tables (and only the
  * columns) the gated slice touches.
  *
  * Generation uses the aliasing-free salted-multiplier recipe
  * (TpcdsFixture scaladoc). JOB queries are MIN()-aggregates over
  * multi-way joins with correlated string filters — statistically
  * independent draws would make most filter CONJUNCTIONS empty, so the
  * fixture plants a deterministic movie block (ids 100-199, year 2012,
  * kind 'movie') whose movie_companies / movie_keyword / movie_info /
  * movie_info_idx / cast_info rows are constructed to satisfy each
  * gated query's full conjunction (the planted-rows recipe that made
  * the TPC-DS selectivity cliffs work):
  *   100-119 marvel-keyword movies, 120-139 character-name-in-title
  *   (+US companies, Downey cast, aka names), 140-159 sequel keyword +
  *   German country + Champion titles + US companies, 160-179 murder
  *   keyword + Horror genre + writer cast, 180-199 blood keyword;
  *   100-149 German co-productions, 150-199 Japanese '(presents)'
  *   companies with English-voice actress cast, 160-199 Russian
  *   companies with uncredited voice actors.
  * MIN() outputs are order-insensitive and exactly typed, so the texts
  * gate verbatim with no patch classes at all.
  */
object ImdbFixture {

  val tables: Seq[String] = Seq(
    "title", "movie_companies", "company_name", "company_type",
    "info_type", "movie_info_idx", "movie_info", "keyword",
    "movie_keyword", "cast_info", "name", "aka_name", "role_type",
    "char_name", "kind_type")

  private val scaledDirs =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  /** Gate fixture dir: fixed before generation so oracle SQL can
    * interpolate it at map-build time (ClickBench convention).
    */
  val gateDir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_imdb_gate_${
      java.util.UUID.randomUUID().toString.take(8)}"

  private val gateDone = new java.util.concurrent.atomic.AtomicBoolean(false)

  def ensureGate(spark: SparkSession): Unit =
    if (gateDone.compareAndSet(false, true)) generate(spark, gateDir, 1L)

  def ensureScaled(spark: SparkSession, factor: Long): String =
    scaledDirs.getOrElseUpdate(factor, {
      val d = s"${System.getProperty("java.io.tmpdir")}/graft_imdb_x${factor}_${
        java.util.UUID.randomUUID().toString.take(8)}"
      generate(spark, d, factor)
      d
    })

  private def kh(salt: Int): String =
    s"pmod(id * ${1103515245L + salt * 12820163L} + $salt, 2147483647)"
  private def hm(salt: Int, range: Long): String =
    s"pmod(${kh(salt)}, $range)"

  private def generate(spark: SparkSession, dir: String, factor: Long): Unit = {
    val nTitle = 20000L * factor
    val nName = 20000L * factor
    val nComp = 2000L * factor
    val nKw = 5000L * factor
    val nChar = 10000L * factor
    // repartition, NOT coalesce: the bulk∪plant unions coalesce into 2-3
    // fat files (6M cast_info rows landed in 3 of 16 files), capping
    // scan parallelism at 3 tasks — a fixture artifact, not a plan
    // property. An even repartition restores full-width scans.
    def write(name: String, df: DataFrame): Unit =
      df.repartition(math.max(2, (2 * factor).toInt min 16))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")

    write("kind_type", spark.range(7).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """element_at(array('movie','tv series','tv movie','video movie',
        |  'tv mini series','video game','episode'), CAST(id + 1 AS INT)) AS kind""".stripMargin))

    write("company_type", spark.range(4).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """element_at(array('production companies','special effects companies',
        |  'distributors','miscellaneous companies'), CAST(id + 1 AS INT)) AS kind""".stripMargin))

    write("role_type", spark.range(12).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE CAST(id + 1 AS INT) WHEN 1 THEN 'actor' WHEN 2 THEN 'actress'
        |  WHEN 3 THEN 'producer' WHEN 4 THEN 'writer' WHEN 5 THEN 'cinematographer'
        |  WHEN 6 THEN 'composer' WHEN 7 THEN 'costume designer' WHEN 8 THEN 'director'
        |  WHEN 9 THEN 'editor' WHEN 10 THEN 'miscellaneous crew'
        |  WHEN 11 THEN 'production designer' ELSE 'guest' END AS role""".stripMargin))

    write("info_type", spark.range(110).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE CAST(id + 1 AS INT) WHEN 1 THEN 'top 250 rank' WHEN 2 THEN 'rating'
        |  WHEN 3 THEN 'release dates' WHEN 4 THEN 'countries' WHEN 5 THEN 'genres'
        |  WHEN 6 THEN 'votes' ELSE concat('info-', id + 1) END AS info""".stripMargin))

    write("keyword", spark.range(nKw).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE CAST(id + 1 AS INT) WHEN 1 THEN 'character-name-in-title'
        |  WHEN 2 THEN 'the-sequel' WHEN 3 THEN 'murder' WHEN 4 THEN 'blood'
        |  WHEN 5 THEN 'violence' WHEN 21 THEN 'marvel-cinematic-universe'
        |  ELSE concat('keyword-', id + 1) END AS keyword""".stripMargin))

    write("company_name", spark.range(nComp).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      "concat('Company ', id + 1) AS name",
      s"""CASE WHEN id + 1 <= 10 THEN '[de]' WHEN id + 1 <= 20 THEN '[jp]'
         |  WHEN id + 1 <= 30 THEN '[us]' WHEN id + 1 <= 40 THEN '[ru]'
         |  ELSE element_at(array('[us]','[gb]','[fr]','[in]','[it]','[ca]'),
         |    CAST(1 + ${hm(1, 6)} AS INT)) END AS country_code""".stripMargin))

    write("char_name", spark.range(nChar).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      "concat('Character ', id + 1) AS name"))

    write("name", spark.range(nName).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE WHEN id + 1 <= 40 THEN concat('Downey, Robert ', id + 1)
        |  WHEN id + 1 <= 50 THEN concat('Barrymore, Actor ', id + 1)
        |  WHEN id + 1 BETWEEN 60 AND 80 THEN concat('Yoko Actress ', id + 1)
        |  WHEN id + 1 BETWEEN 90 AND 110 THEN concat('Voice Actor ', id + 1)
        |  WHEN id + 1 BETWEEN 120 AND 140 THEN concat('Male Writer ', id + 1)
        |  ELSE concat('Person ', id + 1) END AS name""".stripMargin,
      // writers 120-140 pinned male (25c's n.gender = 'm' conjunction)
      s"""CASE WHEN id + 1 BETWEEN 120 AND 140 THEN 'm'
         |  WHEN ${hm(2, 2)} = 0 THEN 'm' ELSE 'f' END AS gender""".stripMargin))

    write("aka_name", spark.range(10000L * factor).selectExpr(
      // persons 1-80 each get a pseudonym (the 08a/16b aka joins);
      // the rest spread over the person domain
      s"""CAST(CASE WHEN id < 80 THEN id + 1
         |  ELSE 1 + ${hm(3, nName)} END AS INT) AS person_id""".stripMargin,
      "concat('aka-', id) AS name"))

    write("title", spark.range(nTitle).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE WHEN id + 1 BETWEEN 150 AND 159 THEN concat('Champion Story ', id + 1)
        |  ELSE concat('Movie Title ', id + 1) END AS title""".stripMargin,
      s"""CAST(CASE WHEN id + 1 BETWEEN 100 AND 199 THEN 1
         |  ELSE 1 + ${hm(4, 7)} END AS INT) AS kind_id""".stripMargin,
      s"""CAST(CASE WHEN id + 1 BETWEEN 100 AND 199 THEN 2012
         |  ELSE 1950 + ${hm(5, 66)} END AS INT) AS production_year""".stripMargin,
      // episode number: NULL for non-episodes, small ints otherwise
      // (title.episode_nr — the 16a/c/d variants band-filter on it)
      s"""CAST(CASE WHEN ${hm(40, 3)} = 0 THEN NULL
         |  ELSE ${hm(41, 200)} END AS INT) AS episode_nr""".stripMargin))

    // movie_companies: bulk rows + the plant block's constructed rows
    val mcBulk = spark.range(50000L * factor).selectExpr(
      s"CAST(1 + ${hm(6, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(7, nComp)} AS INT) AS company_id",
      s"CAST(1 + ${hm(8, 4)} AS INT) AS company_type_id",
      s"""CASE ${hm(9, 10)} WHEN 0 THEN '(co-production)'
         |  WHEN 1 THEN '(presents)' WHEN 2 THEN '(as Metro-Goldwyn-Mayer Pictures)'
         |  WHEN 3 THEN '(Japan)' WHEN 4 THEN '(USA)' WHEN 5 THEN NULL
         |  ELSE concat('(note ', id, ')') END AS note""".stripMargin)
    val mcPlant = spark.range(100).selectExpr("CAST(id + 100 AS INT) AS m")
      .selectExpr(
        "m AS movie_id",
        // 100-149: German co-productions; 150-199: Japanese presents
        """CAST(CASE WHEN m < 150 THEN 1 + pmod(m, 10)
          |  ELSE 11 + pmod(m, 10) END AS INT) AS company_id""".stripMargin,
        "CAST(1 AS INT) AS company_type_id",
        """CASE WHEN m < 150 THEN '(co-production)'
          |  ELSE '(presents) (Japan)' END AS note""".stripMargin)
    val mcPlantUs = spark.range(50).selectExpr("CAST(id + 120 AS INT) AS m")
      .filter("m BETWEEN 120 AND 139 OR m BETWEEN 150 AND 159")
      .selectExpr("m AS movie_id",
        "CAST(21 + pmod(m, 10) AS INT) AS company_id",
        "CAST(1 AS INT) AS company_type_id", "'(presents)' AS note")
    val mcPlantRu = spark.range(40).selectExpr("CAST(id + 160 AS INT) AS m")
      .selectExpr("m AS movie_id",
        "CAST(31 + pmod(m, 10) AS INT) AS company_id",
        "CAST(1 AS INT) AS company_type_id", "'(x)' AS note")
    write("movie_companies", mcBulk.unionByName(mcPlant)
      .unionByName(mcPlantUs).unionByName(mcPlantRu))

    // movie_info_idx: every plant movie gets top250 + rating + votes
    val miiBulk = spark.range(40000L * factor).selectExpr(
      s"CAST(1 + ${hm(10, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(11, 110)} AS INT) AS info_type_id",
      s"concat(1 + ${hm(12, 9)}, '.', ${hm(13, 10)}) AS info")
    val miiPlant = spark.range(100).selectExpr("CAST(id + 100 AS INT) AS m")
      .selectExpr("m", "explode(array(1, 2, 6)) AS it")
      .selectExpr("m AS movie_id", "CAST(it AS INT) AS info_type_id",
        """CASE it WHEN 1 THEN '9.0' WHEN 2 THEN concat('6.', pmod(m, 10))
          |  ELSE '1000' END AS info""".stripMargin)
    write("movie_info_idx", miiBulk.unionByName(miiPlant))

    // movie_info: plant movies get release-date + country + genre rows
    val miBulk = spark.range(60000L * factor).selectExpr(
      s"CAST(1 + ${hm(14, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(15, 110)} AS INT) AS info_type_id",
      s"""element_at(array('Sweden','Norway','Germany','Denmark','USA',
         |  'Horror','Action','Drama','Comedy','2010-01-01','other info'),
         |  CAST(1 + ${hm(16, 11)} AS INT)) AS info""".stripMargin,
      // movie_info.note: mostly NULL, occasional internet/literal notes
      // (18b filters `mi.note IS NULL`)
      s"""CASE WHEN ${hm(42, 4)} = 0 THEN concat('(note ', id, ')')
         |  ELSE NULL END AS note""".stripMargin)
    val miPlant = spark.range(100).selectExpr("CAST(id + 100 AS INT) AS m")
      .selectExpr("m", "explode(array(3, 4, 5)) AS it")
      .selectExpr("m AS movie_id", "CAST(it AS INT) AS info_type_id",
        """CASE it WHEN 3 THEN '2012-05-04'
          |  WHEN 4 THEN (CASE WHEN m BETWEEN 140 AND 179 THEN 'Germany' ELSE 'USA' END)
          |  ELSE (CASE WHEN m BETWEEN 160 AND 179 THEN 'Horror' ELSE 'Drama' END)
          |END AS info""".stripMargin,
        "CAST(NULL AS STRING) AS note")
    write("movie_info", miBulk.unionByName(miPlant))

    // movie_keyword: plant blocks wire each query's keyword
    val mkBulk = spark.range(50000L * factor).selectExpr(
      s"CAST(1 + ${hm(17, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(18, nKw)} AS INT) AS keyword_id")
    val mkPlant = spark.range(100).selectExpr("CAST(id + 100 AS INT) AS m")
      .selectExpr("m AS movie_id",
        """CAST(CASE WHEN m < 120 THEN 21 WHEN m < 140 THEN 1
          |  WHEN m < 160 THEN 2 WHEN m < 180 THEN 3 ELSE 4 END AS INT)
          |  AS keyword_id""".stripMargin)
    write("movie_keyword", mkBulk.unionByName(mkPlant))

    // cast_info: four planted casts + bulk
    val ciBulk = spark.range(60000L * factor).selectExpr(
      s"CAST(1 + ${hm(19, nName)} AS INT) AS person_id",
      s"CAST(1 + ${hm(20, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(21, nChar)} AS INT) AS person_role_id",
      s"""CASE ${hm(22, 8)} WHEN 0 THEN '(voice)' WHEN 1 THEN '(uncredited)'
         |  WHEN 2 THEN '(writer)' WHEN 3 THEN NULL
         |  ELSE concat('(role ', id, ')') END AS note""".stripMargin,
      s"CAST(1 + ${hm(23, 12)} AS INT) AS role_id")
    val ciDowney = spark.range(40).selectExpr("CAST(id + 100 AS INT) AS m")
      .selectExpr("CAST(1 + pmod(m, 50) AS INT) AS person_id",
        "m AS movie_id", "CAST(1 AS INT) AS person_role_id",
        "'(as himself)' AS note", "CAST(1 AS INT) AS role_id")
    val ciVoiceJp = spark.range(50).selectExpr("CAST(id + 150 AS INT) AS m")
      .selectExpr("CAST(60 + pmod(m, 21) AS INT) AS person_id",
        "m AS movie_id", "CAST(2 AS INT) AS person_role_id",
        "'(voice: English version)' AS note", "CAST(2 AS INT) AS role_id")
    val ciVoiceRu = spark.range(40).selectExpr("CAST(id + 160 AS INT) AS m")
      .selectExpr("CAST(90 + pmod(m, 21) AS INT) AS person_id",
        "m AS movie_id", "CAST(1 + pmod(m, 1000) AS INT) AS person_role_id",
        "'(voice) (uncredited)' AS note", "CAST(1 AS INT) AS role_id")
    val ciWriter = spark.range(20).selectExpr("CAST(id + 160 AS INT) AS m")
      .selectExpr("CAST(120 + pmod(m, 21) AS INT) AS person_id",
        "m AS movie_id", "CAST(3 AS INT) AS person_role_id",
        "'(writer)' AS note", "CAST(4 AS INT) AS role_id")
    // 17a: B-named cast members on the character-name-in-title movies
    val ciB = spark.range(20).selectExpr("CAST(id + 120 AS INT) AS m")
      .selectExpr("CAST(41 + pmod(m, 10) AS INT) AS person_id",
        "m AS movie_id", "CAST(4 AS INT) AS person_role_id",
        "'(credited)' AS note", "CAST(1 AS INT) AS role_id")
    write("cast_info", ciBulk.unionByName(ciDowney).unionByName(ciVoiceJp)
      .unionByName(ciVoiceRu).unionByName(ciWriter).unionByName(ciB))
  }
}
