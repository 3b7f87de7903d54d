package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic h2oai db-benchmark fixture — the G1 groupby table and
  * J1 join tables the reference's h2oai benchmark loads
  * (/root/reference/benchmark/h2oai/group/queries/load.sql: G1_1e7_1e2
  * with id1/id2 'id###' strings of K=100 domain, id3 'id######' of
  * N/K, id4/id5 ints of K, id6 int of N/K, v1 1..5, v2 1..15, v3
  * uniform double; join/queries/load.sql: x (N rows), small (N/1e4 at
  * this scale), medium (N/1e3), big (N) keyed id1/id2/id3 int +
  * id4/id5/id6 string twins).
  *
  * Generation uses the salted-multiplier recipe (TpcdsFixture): every
  * column draws through an independent affine map mod 2^31-1, so no
  * column couples with another. v3 is a SMALL-grid double (k/64 with
  * k < 2^13) so sums/stddevs are exact in double and the oracle hash
  * compare needs only the documented round() patches.
  */
object H2oFixture {

  val gateDir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_h2o_gate_${
      java.util.UUID.randomUUID().toString.take(8)}"

  private val gateDone = new java.util.concurrent.atomic.AtomicBoolean(false)

  def ensureGate(spark: SparkSession): Unit =
    if (gateDone.compareAndSet(false, true)) generate(spark, gateDir, 1L)

  private val scaledDirs =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  def ensureScaled(spark: SparkSession, factor: Long): String =
    scaledDirs.getOrElseUpdate(factor, {
      val d = s"${System.getProperty("java.io.tmpdir")}/graft_h2o_x${factor}_${
        java.util.UUID.randomUUID().toString.take(8)}"
      generate(spark, d, factor)
      d
    })

  val tables: Seq[String] = Seq("x_group", "x", "small", "medium", "big")

  private def kh(salt: Int): String =
    s"pmod(id * ${1103515245L + salt * 12820163L} + $salt, 2147483647)"
  private def hm(salt: Int, range: Long): String =
    s"pmod(${kh(salt)}, $range)"

  private def generate(spark: SparkSession, dir: String, factor: Long): Unit = {
    val n = 100000L * factor
    val k = 100L // the 1e2 of G1_1e7_1e2, constant across scales
    // repartition, not coalesce (the r13 lesson: coalesce skews union
    // pipelines into few fat files). File cap stays 16 at x100: the r14
    // 32-file experiment measured h2o as a wash and JOB 15% WORSE at
    // median (80/113 queries regressed) — per-task dispatch/shuffle-file
    // overhead on 40-90 ms walls outweighs the extra scan width; only
    // the compute-heavy deep joins gained 12-18% (PERF.md r14)
    def write(name: String, df: DataFrame): Unit =
      df.repartition(math.max(2, (2 * factor).toInt min 16))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")

    // ~2% NULLs in the measure columns exercise null-skipping aggs the
    // same way the benchmark's _5-NA variants do
    write("x_group", spark.range(n).selectExpr(
      s"concat('id', 1 + ${hm(1, k)}) AS id1",
      s"concat('id', 1 + ${hm(2, k)}) AS id2",
      s"concat('id', 1 + ${hm(3, n / k)}) AS id3",
      s"CAST(1 + ${hm(4, k)} AS INT) AS id4",
      s"CAST(1 + ${hm(5, k)} AS INT) AS id5",
      s"CAST(1 + ${hm(6, n / k)} AS INT) AS id6",
      s"CAST(CASE WHEN ${hm(7, 50)} = 0 THEN NULL ELSE 1 + ${hm(8, 5)} END AS INT) AS v1",
      s"CAST(CASE WHEN ${hm(9, 50)} = 0 THEN NULL ELSE 1 + ${hm(10, 15)} END AS INT) AS v2",
      // prime denominator: avoids the dyadic-grid rounding ties a /64
      // grid produced at the oracle's 6-decimal round boundary
      s"CASE WHEN ${hm(11, 50)} = 0 THEN CAST(NULL AS DOUBLE) " +
        s"ELSE ${hm(12, 1000000)} / 10007.0 END AS v3"))

    val nSmall = math.max(10L, n / 10000L)
    val nMedium = math.max(100L, n / 1000L)
    write("x", spark.range(n).selectExpr(
      s"CAST(1 + ${hm(21, nSmall)} AS INT) AS id1",
      s"CAST(1 + ${hm(22, nMedium)} AS INT) AS id2",
      s"CAST(1 + ${hm(23, n)} AS INT) AS id3",
      s"concat('id', 1 + ${hm(21, nSmall)}) AS id4",
      s"concat('id', 1 + ${hm(22, nMedium)}) AS id5",
      s"concat('id', 1 + ${hm(23, n)}) AS id6",
      s"CAST(${hm(24, 6400)} / 64.0 AS DOUBLE) AS v1"))
    write("small", spark.range(nSmall).selectExpr(
      "CAST(1 + id AS INT) AS id1",
      "concat('id', 1 + id) AS id4",
      s"CAST(${hm(25, 6400)} / 64.0 AS DOUBLE) AS v2"))
    write("medium", spark.range(nMedium).selectExpr(
      s"CAST(1 + ${hm(26, nSmall)} AS INT) AS id1",
      "CAST(1 + id AS INT) AS id2",
      s"concat('id', 1 + ${hm(26, nSmall)}) AS id4",
      "concat('id', 1 + id) AS id5",
      s"CAST(${hm(27, 6400)} / 64.0 AS DOUBLE) AS v2"))
    write("big", spark.range(n).selectExpr(
      s"CAST(1 + ${hm(28, nSmall)} AS INT) AS id1",
      s"CAST(1 + ${hm(29, nMedium)} AS INT) AS id2",
      "CAST(1 + id AS INT) AS id3",
      s"concat('id', 1 + ${hm(28, nSmall)}) AS id4",
      s"concat('id', 1 + ${hm(29, nMedium)}) AS id5",
      "concat('id', 1 + id) AS id6",
      s"CAST(${hm(30, 6400)} / 64.0 AS DOUBLE) AS v2"))
  }
}
