package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Headline.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Headline.queries ++ Joins.queries ++ Aggregates.queries ++ SetOps.queries ++
      Windows.queries ++ Functions.queries ++ Extensions.queries ++ Pipeline.queries ++ Shaping.queries ++ Sources.queries ++ Tpch.queries ++ SltSlice.queries ++ TpcdsShapes.queries ++ TpcdsVerbatim.queries ++ TpchVerbatim.queries ++ NestedSlice.queries ++ OlapShapes.queries ++ ClickBench.queries ++ JobSlice.queries ++ H2oBoard.queries ++ MicroShapes.queries ++ RealBoards.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Headline.oracle ++ Joins.oracle ++ Aggregates.oracle ++ SetOps.oracle ++
      Windows.oracle ++ Functions.oracle ++ Extensions.oracle ++ Pipeline.oracle ++ Shaping.oracle ++ Sources.oracle ++ Tpch.oracle ++ SltSlice.oracle ++ TpcdsShapes.oracle ++ TpcdsVerbatim.oracle ++ TpchVerbatim.oracle ++ NestedSlice.oracle ++ OlapShapes.oracle ++ ClickBench.oracle ++ JobSlice.oracle ++ H2oBoard.oracle ++ MicroShapes.oracle ++ RealBoards.oracle
}
