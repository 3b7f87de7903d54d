package graft.sources

import org.apache.spark.sql.SparkSession

/** Deterministic HEP events fixture — the realnest benchmark's
  * Run2012B_SingleMu shape (/root/reference/benchmark/realnest/hep/
  * load.sql reads it from S3; this container has no egress, so the
  * fixture synthesizes the QUERIED structure): first-level STRUCT
  * columns (MET{pt,phi,sumet}, PV{npvs,x,y,z}) and LIST<STRUCT>
  * particle collections (Jet{pt,eta,phi}, Muon{pt,eta,phi,mass,
  * charge}) with 0-8 elements per event — the deeply-nested layout the
  * hep/micro suites aggregate, unnest, and lambda over. All doubles on
  * the 1/64 grid so histogram bucket edges and sums are exact.
  */
object HepFixture {

  val gateDir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_hep_gate_${
      java.util.UUID.randomUUID().toString.take(8)}"

  private val gateDone = new java.util.concurrent.atomic.AtomicBoolean(false)

  def ensureGate(spark: SparkSession): Unit =
    if (gateDone.compareAndSet(false, true)) generate(spark, gateDir, 1L)

  private val scaledDirs =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  def ensureScaled(spark: SparkSession, factor: Long): String =
    scaledDirs.getOrElseUpdate(factor, {
      val d = s"${System.getProperty("java.io.tmpdir")}/graft_hep_x${factor}_${
        java.util.UUID.randomUUID().toString.take(8)}"
      generate(spark, d, factor)
      d
    })

  val tables: Seq[String] = Seq("hep_singleMu")

  private def kh(salt: Int, of: String = "id"): String =
    s"pmod($of * ${1103515245L + salt * 12820163L} + $salt, 2147483647)"
  private def hm(salt: Int, range: Long, of: String = "id"): String =
    s"pmod(${kh(salt, of)}, $range)"

  private def generate(spark: SparkSession, dir: String, factor: Long): Unit = {
    val n = 50000L * factor
    // per-element draws couple the event id with the element index
    // through one affine map, staying exact on the 1/64 grid. The inner
    // pmod keeps the multiplicand < 2^31 so the ANSI-mode product stays
    // inside Long.
    def el(salt: Int, range: Long): String =
      s"pmod(pmod(id + i * 2654435761, 2147483647) * " +
        s"${1103515245L + salt * 12820163L} + $salt, $range)"
    spark.range(n).selectExpr(
      "id AS event",
      s"""named_struct(
         |  'pt', CAST(${hm(1, 140000)} AS DOUBLE) / 64.0,
         |  'phi', CAST(${hm(2, 402)} - 201 AS DOUBLE) / 64.0,
         |  'sumet', CAST(${hm(3, 640000)} AS DOUBLE) / 64.0) AS MET""".stripMargin,
      s"""named_struct(
         |  'npvs', CAST(${hm(4, 50)} AS INT),
         |  'x', CAST(${hm(5, 128)} - 64 AS DOUBLE) / 64.0,
         |  'y', CAST(${hm(6, 128)} - 64 AS DOUBLE) / 64.0,
         |  'z', CAST(${hm(7, 2560)} - 1280 AS DOUBLE) / 64.0) AS PV""".stripMargin,
      // slice(seq, 1, 0) = empty list — sequence(1, 0) alone would
      // produce a DESCENDING two-element array
      s"""transform(slice(sequence(1, 8), 1, CAST(${hm(8, 9)} AS INT)),
         |  i -> named_struct(
         |    'pt', CAST(${el(9, 6400)} AS DOUBLE) / 64.0,
         |    'eta', CAST(${el(10, 640)} - 320 AS DOUBLE) / 64.0,
         |    'phi', CAST(${el(11, 402)} - 201 AS DOUBLE) / 64.0)) AS Jet""".stripMargin,
      s"""transform(slice(sequence(1, 4), 1, CAST(${hm(12, 5)} AS INT)),
         |  i -> named_struct(
         |    'pt', CAST(${el(13, 6400)} AS DOUBLE) / 64.0,
         |    'eta', CAST(${el(14, 640)} - 320 AS DOUBLE) / 64.0,
         |    'phi', CAST(${el(15, 402)} - 201 AS DOUBLE) / 64.0,
         |    'mass', CAST(${el(16, 64)} AS DOUBLE) / 64.0,
         |    'charge', CAST(${el(17, 2)} * 2 - 1 AS INT))) AS Muon""".stripMargin)
      .repartition(math.max(2, (2 * factor).toInt min 16))
      .write.mode("overwrite").parquet(s"$dir/hep_singleMu.parquet")
  }
}
