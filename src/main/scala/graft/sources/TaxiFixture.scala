package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic NYC-taxi fixture — the `trips` table the reference's
  * taxi benchmark loads (/root/reference/benchmark/taxi/load.sql: the
  * 51-column BIGINT/VARCHAR/TIMESTAMP/DOUBLE trips schema; its data
  * ships via download.sh, so the fixture synthesizes the QUERIED
  * columns deterministically at matching types plus a few carried
  * extras). Money/distance values sit on the 1/64 grid so sums and
  * averages are exact in double, and trip_distance never lands on a
  * .5 rounding boundary (Spark HALF_UP vs DuckDB away-from-zero would
  * otherwise split q04's ROUND buckets).
  */
object TaxiFixture {

  val gateDir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_taxi_gate_${
      java.util.UUID.randomUUID().toString.take(8)}"

  private val gateDone = new java.util.concurrent.atomic.AtomicBoolean(false)

  def ensureGate(spark: SparkSession): Unit =
    if (gateDone.compareAndSet(false, true)) generate(spark, gateDir, 1L)

  private val scaledDirs =
    scala.collection.concurrent.TrieMap.empty[Long, String]

  def ensureScaled(spark: SparkSession, factor: Long): String =
    scaledDirs.getOrElseUpdate(factor, {
      val d = s"${System.getProperty("java.io.tmpdir")}/graft_taxi_x${factor}_${
        java.util.UUID.randomUUID().toString.take(8)}"
      generate(spark, d, factor)
      d
    })

  val tables: Seq[String] = Seq("trips")

  private def kh(salt: Int): String =
    s"pmod(id * ${1103515245L + salt * 12820163L} + $salt, 2147483647)"
  private def hm(salt: Int, range: Long): String =
    s"pmod(${kh(salt)}, $range)"

  private def generate(spark: SparkSession, dir: String, factor: Long): Unit = {
    val n = 100000L * factor
    spark.range(n).selectExpr(
      "id AS trip_id",
      s"concat('V', 1 + ${hm(1, 3)}) AS vendor_id",
      // 2013-2015 pickups on a second grid; dropoff 1-120 min later
      s"timestamp_seconds(1356998400 + ${hm(2, 94608000L)}) AS pickup_datetime",
      s"timestamp_seconds(1356998400 + ${hm(2, 94608000L)} + 60 + ${hm(3, 7140)}) AS dropoff_datetime",
      s"CAST(1 + ${hm(4, 6)} AS BIGINT) AS rate_code_id",
      s"CAST(${hm(5, 7)} AS BIGINT) AS passenger_count",
      // 1/64 grid, and (64k+8)/64 never rounds at .5
      s"CAST((${hm(6, 2000)} * 64 + 8) AS DOUBLE) / 64.0 AS trip_distance",
      s"CAST(${hm(7, 9600)} AS DOUBLE) / 64.0 AS fare_amount",
      s"CAST(${hm(8, 640)} AS DOUBLE) / 64.0 AS tip_amount",
      s"CAST(${hm(9, 320)} AS DOUBLE) / 64.0 AS tolls_amount",
      s"CAST(${hm(7, 9600)} + ${hm(8, 640)} + ${hm(9, 320)} AS DOUBLE) / 64.0 AS total_amount",
      s"element_at(array('CSH', 'CRD', 'NOC', 'DIS'), CAST(1 + ${hm(10, 4)} AS INT)) AS payment_type",
      s"CASE WHEN ${hm(11, 5)} = 0 THEN 'green' ELSE 'yellow' END AS cab_type")
      .repartition(math.max(2, (2 * factor).toInt min 16))
      .write.mode("overwrite").parquet(s"$dir/trips.parquet")
  }
}
