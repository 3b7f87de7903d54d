package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe: run `name :: sql` lines from a file and print
  * each result row — used to pairwise-check candidate shared-dialect SQL
  * against the same probes run in DuckDB before pinning them in
  * SltSlice (keeps the Verify/oracle iteration loop short).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[4]").config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    scala.io.Source.fromFile(args(0)).getLines().foreach { line =>
      val Array(name, sql) = line.split(" :: ", 2)
      try println(s"$name -> ${spark.sql(sql).collect().toSeq}")
      catch { case e: Throwable =>
        println(s"$name ERROR: ${e.getMessage.linesIterator.next().take(140)}")
      }
    }
    spark.stop()
  }
}
