package graft

import org.scalatest.funsuite.AnyFunSuite

/** SparkEntry contract guards: query names must be unique ACROSS the
  * family maps (`++` silently last-wins, so a cross-family collision
  * would drop a gated query without any failure — a duplicated
  * `src_copy_overwrite` nearly shipped exactly that way), and every
  * oracle entry must refer to an existing query.
  */
class EntryContractSpec extends AnyFunSuite {
  import graft.queries._

  private val families: Seq[(String, Map[String, _])] = Seq(
    "Headline" -> Headline.queries, "Joins" -> Joins.queries,
    "Aggregates" -> Aggregates.queries, "SetOps" -> SetOps.queries,
    "Windows" -> Windows.queries, "Functions" -> Functions.queries,
    "Extensions" -> Extensions.queries, "Pipeline" -> Pipeline.queries,
    "Shaping" -> Shaping.queries, "Sources" -> Sources.queries,
    "Tpch" -> Tpch.queries, "SltSlice" -> SltSlice.queries,
    "TpcdsShapes" -> TpcdsShapes.queries, "TpcdsVerbatim" -> TpcdsVerbatim.queries, "TpchVerbatim" -> TpchVerbatim.queries,
    "NestedSlice" -> NestedSlice.queries, "OlapShapes" -> OlapShapes.queries,
    "ClickBench" -> ClickBench.queries, "JobSlice" -> JobSlice.queries,
    "H2oBoard" -> H2oBoard.queries, "MicroShapes" -> MicroShapes.queries,
    "RealBoards" -> RealBoards.queries)

  test("query names are unique across families") {
    val all = families.flatMap { case (fam, m) => m.keys.map(_ -> fam) }
    val dupes = all.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    assert(dupes.isEmpty, s"duplicated across families: ${
      dupes.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(families.map(_._2.size).sum == SparkEntry.queries.size)
  }

  test("every oracle refers to an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, orphans.toSeq.sorted.mkString(", "))
  }
}
