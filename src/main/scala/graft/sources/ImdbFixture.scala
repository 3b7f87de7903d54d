package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic IMDB-shaped fixture for the JOB (join-order-benchmark)
  * slice (reference: /root/reference/benchmark/imdb/ (113 .benchmark files) — 113
  * star/snowflake join queries over the IMDB schema,
  * imdb_plan_cost/init/schema.sql). Carries all 21 tables (and only the
  * columns) the 113 gated queries touch.
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
  * The r14 extension plants movies 200-315 for the 40 deep-join
  * families the first 15 tables could not serve:
  *   200-219 'features'-linked 1982 biography movies whose cast have
  *   'Volker Boehm'-noted mini biographies (07a-c); 220-239 sequel
  *   movies with 'follows' links, Warner-Film production companies and
  *   a Fox non-production row (11/21/27; 220-229 are 1998 'Money
  *   Train' titles); 240-259 US 2007 internet-release movies with
  *   aka_title rows and a worldwide-noted YouTube company (15/23);
  *   260-279 superhero movies with Tony-Stark casts, 8.5 ratings and
  *   complete+verified casts (20/26); 280-299 euro dark movies — crew
  *   complete_cast, German country, 7.0 rating (28); 300 'Shrek 2'
  *   voiced by trivia-carrying 'An'-named actresses as 'Queen' (29);
  *   160-179 gain complete+verified rows + Freddy titles (30); 310-311
  *   a 10,000-mile-club link pair (32); 312-315 linked tv-series pairs
  *   with [us]/[nl] companies and a sub-3.0 rating (33).
  * MIN() outputs are order-insensitive and exactly typed, so the texts
  * gate verbatim with no patch classes at all.
  */
object ImdbFixture {

  val tables: Seq[String] = Seq(
    "title", "movie_companies", "company_name", "company_type",
    "info_type", "movie_info_idx", "movie_info", "keyword",
    "movie_keyword", "cast_info", "name", "aka_name", "role_type",
    "char_name", "kind_type", "movie_link", "link_type", "person_info",
    "comp_cast_type", "complete_cast", "aka_title")

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
    // property. An even repartition restores full-width scans. The r14
    // 32-file experiment is reverted: it measured 15% WORSE at median
    // over the 113 shapes (task dispatch on 40-90 ms walls outweighs
    // scan width; PERF.md r14).
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
        |  WHEN 6 THEN 'votes' WHEN 7 THEN 'mini biography' WHEN 8 THEN 'trivia'
        |  WHEN 9 THEN 'height' ELSE concat('info-', id + 1) END AS info""".stripMargin))

    write("keyword", spark.range(nKw).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE CAST(id + 1 AS INT) WHEN 1 THEN 'character-name-in-title'
        |  WHEN 2 THEN 'sequel' WHEN 3 THEN 'murder' WHEN 4 THEN 'blood'
        |  WHEN 5 THEN 'violence' WHEN 6 THEN 'nerd' WHEN 7 THEN 'superhero'
        |  WHEN 8 THEN 'computer-animation' WHEN 9 THEN '10,000-mile-club'
        |  WHEN 21 THEN 'marvel-cinematic-universe'
        |  ELSE concat('keyword-', id + 1) END AS keyword""".stripMargin))

    // the reference's 18 movie-link kinds (schema.sql link_type); only
    // the first seven carry query predicates
    write("link_type", spark.range(18).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE CAST(id + 1 AS INT) WHEN 1 THEN 'sequel' WHEN 2 THEN 'follows'
        |  WHEN 3 THEN 'followed by' WHEN 4 THEN 'features'
        |  WHEN 5 THEN 'featured in' WHEN 6 THEN 'references'
        |  WHEN 7 THEN 'referenced in' WHEN 8 THEN 'remake of'
        |  WHEN 9 THEN 'spin off' ELSE concat('link-', id + 1) END AS link""".stripMargin))

    write("comp_cast_type", spark.range(4).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """element_at(array('cast','crew','complete','complete+verified'),
        |  CAST(id + 1 AS INT)) AS kind""".stripMargin))

    write("company_name", spark.range(nComp).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      // 46-50 Warner-Film names (11/21/27's %Film%/%Warner% disjunction),
      // 51 the Fox prefix (11c), 52 YouTube (15b)
      """CASE WHEN id + 1 BETWEEN 46 AND 50 THEN concat('Warner Film Studio ', id + 1)
        |  WHEN id + 1 = 51 THEN '20th Century Fox Europe'
        |  WHEN id + 1 = 52 THEN 'YouTube'
        |  ELSE concat('Company ', id + 1) END AS name""".stripMargin,
      s"""CASE WHEN id + 1 <= 10 THEN '[de]' WHEN id + 1 <= 20 THEN '[jp]'
         |  WHEN id + 1 <= 30 THEN '[us]' WHEN id + 1 <= 40 THEN '[ru]'
         |  WHEN id + 1 <= 45 THEN '[nl]' WHEN id + 1 <= 51 THEN '[de]'
         |  WHEN id + 1 = 52 THEN '[us]'
         |  ELSE element_at(array('[us]','[gb]','[fr]','[in]','[it]','[ca]'),
         |    CAST(1 + ${hm(1, 6)} AS INT)) END AS country_code""".stripMargin))

    write("char_name", spark.range(nChar).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      // 30-49: the 20/26 hero characters; 50: 29's 'Queen'
      """CASE WHEN id + 1 BETWEEN 30 AND 49 THEN concat('Tony Stark Iron Man ', id + 1)
        |  WHEN id + 1 = 50 THEN 'Queen'
        |  ELSE concat('Character ', id + 1) END AS name""".stripMargin))

    write("name", spark.range(nName).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE WHEN id + 1 <= 40 THEN concat('Downey, Robert ', id + 1)
        |  WHEN id + 1 <= 50 THEN concat('Barrymore, Actor ', id + 1)
        |  WHEN id + 1 BETWEEN 60 AND 80 THEN concat('Yoko Actress ', id + 1)
        |  WHEN id + 1 BETWEEN 85 AND 89 THEN concat('Anderson, Anna ', id + 1)
        |  WHEN id + 1 BETWEEN 90 AND 110 THEN concat('Voice Actor ', id + 1)
        |  WHEN id + 1 BETWEEN 120 AND 140 THEN concat('Male Writer ', id + 1)
        |  ELSE concat('Person ', id + 1) END AS name""".stripMargin,
      // writers 120-140 pinned male (25c's n.gender = 'm'); 85-89 the
      // female 'An' voices (29); 200-219 the male biography cast (07)
      s"""CASE WHEN id + 1 BETWEEN 120 AND 140 THEN 'm'
         |  WHEN id + 1 BETWEEN 85 AND 89 THEN 'f'
         |  WHEN id + 1 BETWEEN 200 AND 219 THEN 'm'
         |  WHEN ${hm(2, 2)} = 0 THEN 'm' ELSE 'f' END AS gender""".stripMargin,
      // name_pcode_cf (07's soundex band filters): 200-219 pinned 'D3',
      // the rest an even letter spread so BETWEEN bands stay selective
      s"""CASE WHEN id + 1 BETWEEN 200 AND 219 THEN 'D3'
         |  ELSE concat(char(65 + ${hm(31, 26)}), '234') END AS name_pcode_cf""".stripMargin))

    write("aka_name", spark.range(10000L * factor).selectExpr(
      // persons 1-90 each get a pseudonym (the 08a/16b/29 aka joins),
      // 200-219 the biography cast (07); the rest spread over the domain
      s"""CAST(CASE WHEN id < 90 THEN id + 1
         |  WHEN id BETWEEN 90 AND 109 THEN id + 110
         |  ELSE 1 + ${hm(3, nName)} END AS INT) AS person_id""".stripMargin,
      "concat('aka-', id) AS name"))

    write("title", spark.range(nTitle).selectExpr(
      "CAST(id + 1 AS INT) AS id",
      """CASE WHEN id + 1 BETWEEN 150 AND 159 THEN concat('Champion Story ', id + 1)
        |  WHEN id + 1 BETWEEN 160 AND 164 THEN concat('Freddy Horror Show ', id + 1)
        |  WHEN id + 1 BETWEEN 220 AND 229 THEN concat('Money Train ', id + 1)
        |  WHEN id + 1 = 300 THEN 'Shrek 2'
        |  ELSE concat('Movie Title ', id + 1) END AS title""".stripMargin,
      s"""CAST(CASE WHEN id + 1 BETWEEN 100 AND 311 THEN 1
         |  WHEN id + 1 BETWEEN 312 AND 315 THEN 2
         |  ELSE 1 + ${hm(4, 7)} END AS INT) AS kind_id""".stripMargin,
      s"""CAST(CASE WHEN id + 1 BETWEEN 100 AND 199 THEN 2012
         |  WHEN id + 1 BETWEEN 200 AND 219 THEN 1982
         |  WHEN id + 1 BETWEEN 220 AND 229 THEN 1998
         |  WHEN id + 1 BETWEEN 230 AND 239 THEN 2005
         |  WHEN id + 1 BETWEEN 240 AND 259 THEN 2007
         |  WHEN id + 1 BETWEEN 260 AND 299 THEN 2010
         |  WHEN id + 1 = 300 THEN 2004
         |  WHEN id + 1 BETWEEN 301 AND 313 THEN 1995
         |  WHEN id + 1 BETWEEN 314 AND 315 THEN 2007
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
    // r14 blocks: 220-239 Warner-Film production rows + one Fox
    // non-production row (11/21/27); 240-259 YouTube worldwide (15/23);
    // 280-299 German '(200x)' rows (28); 300 a US company (29);
    // 312-315 the 33-family [us]+[nl]/plain pairs
    val mcSeq = spark.range(20).selectExpr("CAST(id + 220 AS INT) AS m")
      .selectExpr("m AS movie_id", "CAST(46 + pmod(m, 5) AS INT) AS company_id",
        "CAST(1 AS INT) AS company_type_id", "CAST(NULL AS STRING) AS note")
    val mcFox = spark.range(20).selectExpr("CAST(id + 220 AS INT) AS m")
      .selectExpr("m AS movie_id", "CAST(51 AS INT) AS company_id",
        "CAST(2 AS INT) AS company_type_id", "'(theatrical)' AS note")
    val mcTube = spark.range(20).selectExpr("CAST(id + 240 AS INT) AS m")
      .selectExpr("m AS movie_id", "CAST(52 AS INT) AS company_id",
        "CAST(1 AS INT) AS company_type_id", "'(2006) (worldwide)' AS note")
    val mcDark = spark.range(20).selectExpr("CAST(id + 280 AS INT) AS m")
      .selectExpr("m AS movie_id", "CAST(1 + pmod(m, 10) AS INT) AS company_id",
        "CAST(1 AS INT) AS company_type_id", "'(2006) (Germany)' AS note")
    val mc33 = spark.range(2).selectExpr("CAST(id + 312 AS INT) AS m")
      .selectExpr("m AS movie_id", "explode(array(21, 41)) AS c",
        "CAST(1 AS INT) AS company_type_id", "CAST(NULL AS STRING) AS note")
      .selectExpr("movie_id", "CAST(c AS INT) AS company_id",
        "company_type_id", "note")
      .unionByName(spark.range(2).selectExpr("CAST(id + 314 AS INT) AS m")
        .selectExpr("m AS movie_id", "CAST(1 AS INT) AS company_id",
          "CAST(1 AS INT) AS company_type_id", "CAST(NULL AS STRING) AS note"))
    val mcShrek = spark.sql(
      """SELECT CAST(300 AS INT) AS movie_id, CAST(21 AS INT) AS company_id,
        |  CAST(1 AS INT) AS company_type_id, CAST(NULL AS STRING) AS note""".stripMargin)
    write("movie_companies", mcBulk.unionByName(mcPlant)
      .unionByName(mcPlantUs).unionByName(mcPlantRu).unionByName(mcSeq)
      .unionByName(mcFox).unionByName(mcTube).unionByName(mcDark)
      .unionByName(mc33).unionByName(mcShrek))

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
    // r14 ratings: 260-279 high (26's > '7.0'/'8.0'), 280-299 mid (28's
    // 6.5 < r < 8.5 band), 312-313 plain, 314-315 low (33's < '3.0')
    val miiR14 = spark.range(40).selectExpr("CAST(id + 260 AS INT) AS m")
      .selectExpr("m AS movie_id", "CAST(2 AS INT) AS info_type_id",
        "CASE WHEN m < 280 THEN '8.5' ELSE '7.0' END AS info")
      .unionByName(spark.range(4).selectExpr("CAST(id + 312 AS INT) AS m")
        .selectExpr("m AS movie_id", "CAST(2 AS INT) AS info_type_id",
          "CASE WHEN m <= 313 THEN '6.5' ELSE '2.5' END AS info"))
    write("movie_info_idx", miiBulk.unionByName(miiPlant).unionByName(miiR14))

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
    // r14 info rows: 220-239 + 280-299 German country (21/27/28's
    // IN-lists), 240-259 internet-noted US release dates (15/23), 300
    // a 200x US release date (29's 'USA:%200%')
    val miR14 = spark.range(20).selectExpr("CAST(id + 220 AS INT) AS m")
      .unionByName(spark.range(20).selectExpr("CAST(id + 280 AS INT) AS m"))
      .selectExpr("m AS movie_id", "CAST(4 AS INT) AS info_type_id",
        "'Germany' AS info", "CAST(NULL AS STRING) AS note")
      .unionByName(spark.range(20).selectExpr("CAST(id + 240 AS INT) AS m")
        .selectExpr("m AS movie_id", "CAST(3 AS INT) AS info_type_id",
          "'USA: 4 May 2007' AS info", "'(internet)' AS note"))
      .unionByName(spark.sql(
        """SELECT CAST(300 AS INT) AS movie_id, CAST(3 AS INT) AS info_type_id,
          |  'USA: 19 May 2004' AS info, CAST(NULL AS STRING) AS note""".stripMargin))
    write("movie_info", miBulk.unionByName(miPlant).unionByName(miR14))

    // movie_keyword: plant blocks wire each query's keyword
    val mkBulk = spark.range(50000L * factor).selectExpr(
      s"CAST(1 + ${hm(17, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(18, nKw)} AS INT) AS keyword_id")
    val mkPlant = spark.range(100).selectExpr("CAST(id + 100 AS INT) AS m")
      .selectExpr("m AS movie_id",
        """CAST(CASE WHEN m < 120 THEN 21 WHEN m < 140 THEN 1
          |  WHEN m < 160 THEN 2 WHEN m < 180 THEN 3 ELSE 4 END AS INT)
          |  AS keyword_id""".stripMargin)
    // r14 keyword wiring: sequel (11/21/27), nerd (23b), superhero
    // (20/26), murder (28), computer-animation (29), 10,000-mile-club (32a)
    val mkR14 = spark.range(116).selectExpr("CAST(id + 200 AS INT) AS m")
      .filter("m BETWEEN 220 AND 311")
      .selectExpr("m AS movie_id",
        """CAST(CASE WHEN m < 240 THEN 2 WHEN m < 260 THEN 6
          |  WHEN m < 280 THEN 7 WHEN m < 300 THEN 3
          |  WHEN m = 300 THEN 8 ELSE 9 END AS INT) AS keyword_id""".stripMargin)
    write("movie_keyword", mkBulk.unionByName(mkPlant).unionByName(mkR14))

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
    // r14 casts: biography persons on their 1982 movies (07), Downey
    // actors as Tony-Stark heroes (20/26), Anna actresses voicing
    // 'Queen' in Shrek 2 (29)
    val ciBio = spark.range(20).selectExpr("CAST(id + 200 AS INT) AS m")
      .selectExpr("m AS person_id", "m AS movie_id",
        "CAST(1 AS INT) AS person_role_id", "CAST(NULL AS STRING) AS note",
        "CAST(1 AS INT) AS role_id")
    val ciStark = spark.range(20).selectExpr("CAST(id + 260 AS INT) AS m")
      .selectExpr("CAST(1 + pmod(m, 40) AS INT) AS person_id", "m AS movie_id",
        "CAST(30 + pmod(m, 20) AS INT) AS person_role_id",
        "'(credited)' AS note", "CAST(1 AS INT) AS role_id")
    val ciShrek = spark.range(5).selectExpr(
      "CAST(85 + id AS INT) AS person_id", "CAST(300 AS INT) AS movie_id",
      "CAST(50 AS INT) AS person_role_id", "'(voice)' AS note",
      "CAST(2 AS INT) AS role_id")
    write("cast_info", ciBulk.unionByName(ciDowney).unionByName(ciVoiceJp)
      .unionByName(ciVoiceRu).unionByName(ciWriter).unionByName(ciB)
      .unionByName(ciBio).unionByName(ciStark).unionByName(ciShrek))

    // movie_link: bulk links over the full title domain + the planted
    // link spine — 'features' into the biography block (07), 'follows'
    // out of the sequel block (11/21/27), the 32a pair, the 32b
    // character-name movies, the 33 tv-series pairs
    val mlBulk = spark.range(10000L * factor).selectExpr(
      s"CAST(1 + ${hm(32, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(33, nTitle)} AS INT) AS linked_movie_id",
      s"CAST(1 + ${hm(34, 18)} AS INT) AS link_type_id")
    val mlPlant = spark.range(20).selectExpr(
      "CAST(1 + id AS INT) AS movie_id", "CAST(200 + id AS INT) AS linked_movie_id",
      "CAST(4 AS INT) AS link_type_id")
      .unionByName(spark.range(20).selectExpr(
        "CAST(220 + id AS INT) AS movie_id", "CAST(100 + id AS INT) AS linked_movie_id",
        "CAST(2 AS INT) AS link_type_id"))
      .unionByName(spark.range(20).selectExpr(
        "CAST(120 + id AS INT) AS movie_id", "CAST(140 + id AS INT) AS linked_movie_id",
        "CAST(5 AS INT) AS link_type_id"))
      .unionByName(spark.sql(
        """SELECT CAST(310 AS INT) AS movie_id, CAST(311 AS INT) AS linked_movie_id,
          |  CAST(1 AS INT) AS link_type_id""".stripMargin))
      .unionByName(spark.range(2).selectExpr(
        "CAST(312 + id AS INT) AS movie_id", "CAST(314 + id AS INT) AS linked_movie_id",
        "CAST(2 AS INT) AS link_type_id"))
    write("movie_link", mlBulk.unionByName(mlPlant))

    // person_info: bulk spread + mini biographies for the 07 cast
    // (note pinned 'Volker Boehm') + trivia/height rows for the Shrek
    // actresses (29)
    val piBulk = spark.range(30000L * factor).selectExpr(
      s"CAST(1 + ${hm(35, nName)} AS INT) AS person_id",
      s"CAST(1 + ${hm(36, 110)} AS INT) AS info_type_id",
      "concat('pinfo-', id) AS info",
      s"""CASE WHEN ${hm(37, 4)} = 0 THEN concat('(pi-note ', id, ')')
         |  ELSE NULL END AS note""".stripMargin)
    val piBio = spark.range(20).selectExpr(
      "CAST(200 + id AS INT) AS person_id", "CAST(7 AS INT) AS info_type_id",
      "concat('Mini Biography ', 200 + id) AS info", "'Volker Boehm' AS note")
    val piAnna = spark.range(5).selectExpr("CAST(85 + id AS INT) AS p")
      .selectExpr("p", "explode(array(8, 9)) AS it")
      .selectExpr("p AS person_id", "CAST(it AS INT) AS info_type_id",
        "CASE it WHEN 8 THEN concat('Voiced Queen ', p) ELSE '168 cm' END AS info",
        "'(biography note)' AS note")
    write("person_info", piBulk.unionByName(piBio).unionByName(piAnna))

    // complete_cast: bulk + the per-family subject/status pins —
    // (cast, complete+verified) for 20/23/26/29/30 blocks,
    // (cast, complete) for 27, (crew, complete)+(cast, complete) for 28
    val ccBulk = spark.range(10000L * factor).selectExpr(
      s"CAST(1 + ${hm(38, nTitle)} AS INT) AS movie_id",
      s"CAST(1 + ${hm(39, 2)} AS INT) AS subject_id",
      s"CAST(3 + ${hm(43, 2)} AS INT) AS status_id")
    val ccVerified = spark.range(20).selectExpr("CAST(160 + id AS INT) AS m")
      .unionByName(spark.range(20).selectExpr("CAST(240 + id AS INT) AS m"))
      .unionByName(spark.range(20).selectExpr("CAST(260 + id AS INT) AS m"))
      .unionByName(spark.range(1).selectExpr("CAST(300 AS INT) AS m"))
      .selectExpr("m AS movie_id", "CAST(1 AS INT) AS subject_id",
        "CAST(4 AS INT) AS status_id")
    val ccComplete = spark.range(20).selectExpr("CAST(220 + id AS INT) AS m")
      .selectExpr("m AS movie_id", "CAST(1 AS INT) AS subject_id",
        "CAST(3 AS INT) AS status_id")
    val ccDark = spark.range(20).selectExpr("CAST(280 + id AS INT) AS m")
      .selectExpr("m AS movie_id", "explode(array(1, 2)) AS s")
      .selectExpr("movie_id", "CAST(s AS INT) AS subject_id",
        "CAST(3 AS INT) AS status_id")
    write("complete_cast", ccBulk.unionByName(ccVerified)
      .unionByName(ccComplete).unionByName(ccDark))

    // aka_title: bulk alternates + guaranteed rows for the 15-family's
    // internet block (the family only joins at.movie_id)
    val atBulk = spark.range(10000L * factor).selectExpr(
      s"CAST(1 + ${hm(44, nTitle)} AS INT) AS movie_id",
      "concat('aka-title-', id) AS title")
    val atPlant = spark.range(20).selectExpr(
      "CAST(240 + id AS INT) AS movie_id",
      "concat('Internet Movie aka ', 240 + id) AS title")
    write("aka_title", atBulk.unionByName(atPlant))
  }
}
