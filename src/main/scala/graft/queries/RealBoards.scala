package graft.queries

import graft.sources.{HepFixture, TaxiFixture}
import org.apache.spark.sql.SparkSession

/** The reference's two remaining unpaired benchmark suites as gated
  * slices (r14 verdict "What's missing" #3):
  *
  *  - **taxi** (/root/reference/benchmark/taxi/q01-q04.benchmark): the
  *    4 wide-scan aggregation queries over `trips`, texts re-expressed
  *    with the repo's oracle conventions (aliased aggregates, rounded
  *    double outputs, total ORDER BY);
  *  - **realnest hep/micro** (/root/reference/benchmark/realnest/):
  *    deeply-nested list analytics over struct arrays — the MET
  *    histogram (hep q01), the unnested-Jet histograms with and
  *    without an eta cut (hep q02/q03 — `CROSS JOIN UNNEST` spelled as
  *    Spark's LATERAL VIEW explode), first-level struct-member
  *    aggregation with HAVING (micro 01), and a list lambda transform/
  *    aggregate shape (micro 04: per-event list_transform +
  *    list_aggregate as Spark transform + aggregate).
  *
  * Both run on deterministic synthetic fixtures (TaxiFixture /
  * HepFixture — the reference downloads its data; this container has
  * no egress) with every value on the 1/64 double grid, so the DuckDB
  * oracle comparison is exact under the documented round() patches.
  */
object RealBoards {

  // ---------------------------------------------------------------- //
  // taxi
  // ---------------------------------------------------------------- //

  /** (name, spark text, duck text or null=same) over view `trips`. */
  private val taxiDefs: Seq[(String, String, String)] = Seq(
    ("taxi_q01",
      "SELECT cab_type, count(*) AS n FROM trips GROUP BY cab_type ORDER BY ALL",
      null),
    ("taxi_q02",
      """SELECT passenger_count,
        |  round(avg(total_amount) * 1000000) / 1000000 AS avg_total_amount
        |FROM trips GROUP BY passenger_count
        |ORDER BY passenger_count, avg_total_amount""".stripMargin, null),
    ("taxi_q03",
      """SELECT passenger_count, year(pickup_datetime) AS yr, count(*) AS n
        |FROM trips GROUP BY passenger_count, year(pickup_datetime)
        |ORDER BY passenger_count, yr""".stripMargin,
      """SELECT passenger_count, CAST(DATE_PART('year', pickup_datetime) AS INT) AS yr,
        |  count(*) AS n
        |FROM trips GROUP BY passenger_count, yr
        |ORDER BY passenger_count, yr""".stripMargin),
    ("taxi_q04",
      """SELECT passenger_count, year(pickup_datetime) AS yr,
        |  round(trip_distance) AS distance, count(*) AS n
        |FROM trips GROUP BY passenger_count, year(pickup_datetime), round(trip_distance)
        |ORDER BY ALL""".stripMargin,
      """SELECT passenger_count, CAST(DATE_PART('year', pickup_datetime) AS INT) AS yr,
        |  round(trip_distance) AS distance, count(*) AS n
        |FROM trips GROUP BY passenger_count, yr, distance
        |ORDER BY ALL""".stripMargin))

  // ---------------------------------------------------------------- //
  // realnest (hep + micro)
  // ---------------------------------------------------------------- //

  private val metBucket =
    """FLOOR((CASE WHEN MET.pt < 0 THEN -1
      |  WHEN MET.pt > 2000 THEN 2001 ELSE MET.pt END) / 20) * 20 + 10""".stripMargin

  // CAST the FLOOR back to DOUBLE: Spark's FLOOR(double) yields BIGINT
  // and BIGINT * 0.45 promotes to DECIMAL (the DECIMAL-lane lesson);
  // DuckDB's FLOOR stays double so the cast is a no-op there.
  private def jetBucket(j: String) =
    s"""CAST(FLOOR((CASE WHEN $j.pt < 15 THEN 14.99
       |  WHEN $j.pt > 60 THEN 60.01 ELSE $j.pt END - 0.15) / 0.45) AS DOUBLE)
       |  * 0.45 + 0.375""".stripMargin

  private val hepDefs: Seq[(String, String, String)] = Seq(
    // hep q01: MET.pt histogram — first-level struct member aggregation
    ("hep_q01",
      s"""SELECT round(($metBucket) * 100) / 100 AS x, count(*) AS y
         |FROM hep_singleMu GROUP BY 1 ORDER BY x""".stripMargin, null),
    // hep q02: histogram over the UNNESTED Jet collection
    ("hep_q02",
      s"""SELECT round((${jetBucket("j")}) * 10000) / 10000 AS x, count(*) AS y
         |FROM hep_singleMu LATERAL VIEW explode(Jet) _j AS j
         |GROUP BY 1 ORDER BY x""".stripMargin,
      s"""SELECT round((${jetBucket("j")}) * 10000) / 10000 AS x, count(*) AS y
         |FROM hep_singleMu CROSS JOIN UNNEST(Jet) AS _j(j)
         |GROUP BY 1 ORDER BY x""".stripMargin),
    // hep q03: the same with a per-element eta cut
    ("hep_q03",
      s"""SELECT round((${jetBucket("j")}) * 10000) / 10000 AS x, count(*) AS y
         |FROM hep_singleMu LATERAL VIEW explode(Jet) _j AS j
         |WHERE abs(j.eta) < 1 GROUP BY 1 ORDER BY x""".stripMargin,
      s"""SELECT round((${jetBucket("j")}) * 10000) / 10000 AS x, count(*) AS y
         |FROM hep_singleMu CROSS JOIN UNNEST(Jet) AS _j(j)
         |WHERE abs(j.eta) < 1 GROUP BY 1 ORDER BY x""".stripMargin),
    // realnest micro 01: aggregate first-level struct members + HAVING
    ("hep_micro_struct_agg",
      """SELECT PV.npvs AS npvs,
        |  round(sum(PV.x) * 1000000) / 1000000 AS sum_x,
        |  round(sum(PV.y) * 1000000) / 1000000 AS sum_y,
        |  round(avg(MET.pt) * 1000000) / 1000000 AS avg_pt,
        |  round(min(MET.phi) * 1000000) / 1000000 AS min_phi,
        |  round(max(MET.sumet) * 1000000) / 1000000 AS max_sumet
        |FROM hep_singleMu GROUP BY PV.npvs
        |HAVING sum(PV.x) > 1 ORDER BY npvs""".stripMargin,
      """SELECT PV.npvs AS npvs,
        |  round(sum(PV.x) * 1000000) / 1000000 AS sum_x,
        |  round(sum(PV.y) * 1000000) / 1000000 AS sum_y,
        |  round(avg(MET.pt) * 1000000) / 1000000 AS avg_pt,
        |  round(min(MET.phi) * 1000000) / 1000000 AS min_phi,
        |  round(max(MET.sumet) * 1000000) / 1000000 AS max_sumet
        |FROM hep_singleMu GROUP BY PV.npvs
        |HAVING sum(PV.x) > 1 ORDER BY npvs""".stripMargin),
    // realnest micro 04 shape: list_transform + list_aggregate per event
    ("hep_micro_list_lambda",
      """SELECT event,
        |  round(aggregate(transform(Muon, m -> m.pt * m.mass),
        |    CAST(0.0 AS DOUBLE), (a, x) -> a + x) * 1000000) / 1000000 AS wsum,
        |  size(Jet) AS njet
        |FROM hep_singleMu WHERE event < 2000 ORDER BY event""".stripMargin,
      """SELECT event,
        |  round(coalesce(list_aggregate(list_transform(Muon, m -> m.pt * m.mass),
        |    'sum'), 0.0) * 1000000) / 1000000 AS wsum,
        |  len(Jet) AS njet
        |FROM hep_singleMu WHERE event < 2000 ORDER BY event""".stripMargin))

  private val micro05: Seq[(String, String, String)] = Seq(
    // realnest micro 05 shape: per-element lambda filters summed over
    // the whole collection
    ("hep_micro_list_filter",
      """SELECT
        |  sum(size(filter(Muon, m -> m.charge = 1))) AS pos,
        |  sum(size(filter(Muon, m -> m.mass > m.pt / 100))) AS heavy,
        |  sum(size(filter(Jet, j -> abs(j.eta) < 2))) AS central
        |FROM hep_singleMu""".stripMargin,
      """SELECT
        |  sum(len(list_filter(Muon, m -> m.charge = 1))) AS pos,
        |  sum(len(list_filter(Muon, m -> m.mass > m.pt / 100))) AS heavy,
        |  sum(len(list_filter(Jet, j -> abs(j.eta) < 2))) AS central
        |FROM hep_singleMu""".stripMargin))

  private val defs = taxiDefs ++ hepDefs ++ micro05
  require(defs.map(_._1).distinct.size == defs.size, "duplicate board keys")

  private val gateReady = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def ensureGate(s: SparkSession): Unit = {
    TaxiFixture.ensureGate(s)
    HepFixture.ensureGate(s)
    if (gateReady.compareAndSet(false, true) ||
        s.catalog.tableExists("trips") == false) {
      s.read.parquet(s"${TaxiFixture.gateDir}/trips.parquet")
        .createOrReplaceTempView("trips")
      s.read.parquet(s"${HepFixture.gateDir}/hep_singleMu.parquet")
        .createOrReplaceTempView("hep_singleMu")
    }
  }

  val queries: Map[String, Q.Fn] = defs.map { case (name, sql, _) =>
    name -> { (s: SparkSession, _: String) =>
      ensureGate(s)
      s.sql(sql)
    }
  }.toMap

  private def toOracle(sql: String): String = sql
    .replaceAll("\\b(FROM|JOIN) trips\\b",
      s"$$1 read_parquet('${TaxiFixture.gateDir}/trips.parquet/*.parquet') AS trips")
    .replaceAll("\\b(FROM|JOIN) hep_singleMu\\b",
      s"$$1 read_parquet('${HepFixture.gateDir}/hep_singleMu.parquet/*.parquet') AS hep_singleMu")

  val oracle: Map[String, String] = defs.map { case (name, sql, duck) =>
    name -> toOracle(Option(duck).getOrElse(sql))
  }.toMap
}
